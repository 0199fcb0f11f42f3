"""Declarative config-driven transformation (SURVEY.md §2.2 + §2.4).

Compiles the reference's YAML/JSON op vocabulary
(src/pipeline/transformation/config_transformer.py:149-350) into Spark
Column expressions. Ops apply in the reference's fixed order
(config_transformer.py:160-183):

    select -> rename -> filter -> add_columns -> drop_columns
           -> transformations -> aggregations

Quirks preserved deliberately (SURVEY.md §7 "what's hard" #2):
- ``select`` silently drops names not present (warn)   (:191-198)
- filters AND-compose across keys; no OR vocabulary     (:204-242)
- ``contains`` is a literal substring test, nulls fail  (:232-233)
- ``add_columns`` tries an expression, falls back to a
  literal on parse failure; non-strings are literals    (:244-261)
- ``map`` recodes send unmapped values to NULL
  (pandas ``.map`` semantics)                           (:276-281)
- agg output columns named ``{col}_{func}``             (:344-346)
- no group_by => only COUNT(*) global agg supported     (:303-316)
- unparsable agg spec => group sizes as ``count``       (:347-348)

Divergence (documented): the reference short-circuits empty input to empty
output (:151-153) — an eager emptiness check. Checking emptiness in Spark
forces an action mid-plan, so we rely on the fact that every compiled op
maps empty input to empty output lazily; only the output *schema* of a
pathological config could differ.
"""

from __future__ import annotations

import json
import logging
import re
from typing import Any, Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_platform_spark.operators.versioning import VersionRegistry

logger = logging.getLogger(__name__)

_AGG_RE = re.compile(r"^\s*([A-Za-z_]+)\s*\(\s*(\*|[\w.]+)\s*\)\s*$")

# config function name -> (spark fn, canonical suffix used in output naming)
_AGG_FUNCS = {
    "sum": (F.sum, "sum"),
    "avg": (F.avg, "avg"),
    "average": (F.avg, "avg"),
    "mean": (F.avg, "avg"),
    "count": (F.count, "count"),
    "min": (F.min, "min"),
    "max": (F.max, "max"),
}

_APPLY_FUNCS = {
    "upper": F.upper,
    "lower": F.lower,
    "strip": F.trim,
}


class ConfigTransformer:
    """Apply a declarative config dict to a DataFrame, lazily."""

    def __init__(self):
        self.registry = VersionRegistry()

    # -- config loading (reference config_transformer.py:44-70) ----------
    @staticmethod
    def load_config(path: str) -> Dict[str, Any]:
        """Load a JSON or YAML config file by extension."""
        if path.endswith((".yaml", ".yml")):
            import yaml

            with open(path) as f:
                return yaml.safe_load(f)
        with open(path) as f:
            return json.load(f)

    # -- main entry (reference config_transformer.py:149-189) ------------
    def transform(
        self,
        data: DataFrame,
        config: Dict[str, Any],
        transformation_id: Optional[str] = None,
        version: Optional[int] = None,
        input_schema=None,
        output_schema=None,
        evolve_schema: bool = False,
    ) -> DataFrame:
        if input_schema is not None:
            from data_pipeline_platform_spark.operators.schema import SchemaValidator

            data = SchemaValidator().validate(data, input_schema, evolve=evolve_schema)

        df = data
        if "select" in config:
            df = self._apply_select(df, config["select"])
        if "rename" in config:
            df = self._apply_rename(df, config["rename"])
        if "filter" in config:
            df = self._apply_filter(df, config["filter"])
        if "add_columns" in config:
            df = self._apply_add_columns(df, config["add_columns"])
        if "drop_columns" in config:
            df = self._apply_drop_columns(df, config["drop_columns"])
        if "transformations" in config:
            df = self._apply_transformations(df, config["transformations"])
        if "aggregations" in config:
            df = self._apply_aggregations(df, config["aggregations"])

        if output_schema is not None:
            from data_pipeline_platform_spark.operators.schema import SchemaValidator

            df = SchemaValidator().validate(df, output_schema)

        if transformation_id:
            self.registry.track_execution(transformation_id, version, {"config": config})
        return df

    # -- P1 select (:191-198) --------------------------------------------
    @staticmethod
    def _apply_select(df: DataFrame, cols: List[str]) -> DataFrame:
        present = [c for c in cols if c in df.columns]
        missing = [c for c in cols if c not in df.columns]
        if missing:
            logger.warning("select: dropping missing columns %s", missing)
        return df.select(*present)

    # -- P2 rename (:200-202) --------------------------------------------
    @staticmethod
    def _apply_rename(df: DataFrame, mapping: Dict[str, str]) -> DataFrame:
        return df.withColumnsRenamed(mapping)

    # -- P3-P7 filters (:204-242) ----------------------------------------
    @classmethod
    def _compile_condition(cls, col: str, spec: Any) -> Column:
        c = F.col(col)
        if not isinstance(spec, dict):
            return c == F.lit(spec)  # P3 bare equality
        conds: List[Column] = []
        for op, val in spec.items():
            if op == ">":
                conds.append(c > F.lit(val))
            elif op == ">=":
                conds.append(c >= F.lit(val))
            elif op == "<":
                conds.append(c < F.lit(val))
            elif op == "<=":
                conds.append(c <= F.lit(val))
            elif op in ("==", "equals"):
                conds.append(c == F.lit(val))
            elif op in ("!=", "not_equals"):
                conds.append(c != F.lit(val))
            elif op == "in":
                conds.append(c.isin(list(val)))
            elif op == "not_in":
                conds.append(~c.isin(list(val)))
            elif op == "contains":
                # literal substring; NULL text fails the filter (pandas
                # str.contains(na=False) parity — nulls are filtered out
                # because a NULL predicate is not true)
                conds.append(c.contains(str(val)))
            elif op == "is_null":
                conds.append(c.isNull() if val else c.isNotNull())
            elif op == "is_not_null":
                conds.append(c.isNotNull() if val else c.isNull())
            else:
                raise ValueError(f"unsupported filter op: {op!r} on column {col!r}")
        out = conds[0]
        for extra in conds[1:]:
            out = out & extra
        return out

    @classmethod
    def _apply_filter(cls, df: DataFrame, filters: Dict[str, Any]) -> DataFrame:
        for col, spec in filters.items():  # AND across keys (:204-212)
            df = df.filter(cls._compile_condition(col, spec))
        return df

    # -- P8 add_columns (:244-261) ---------------------------------------
    @staticmethod
    def _apply_add_columns(df: DataFrame, cols: Dict[str, Any]) -> DataFrame:
        for name, expr in cols.items():
            if isinstance(expr, str):
                try:
                    compiled = F.expr(expr)
                    # force analysis now so bad expressions fall back to
                    # literal here, not at action time
                    df.select(compiled)
                    df = df.withColumn(name, compiled)
                except Exception:
                    df = df.withColumn(name, F.lit(expr))
            else:
                df = df.withColumn(name, F.lit(expr))
        return df

    # -- P9 drop_columns (:263-266) --------------------------------------
    @staticmethod
    def _apply_drop_columns(df: DataFrame, cols: List[str]) -> DataFrame:
        return df.drop(*cols)  # Spark drop already ignores missing names

    # -- P10/P11 transformations (:268-293) ------------------------------
    @staticmethod
    def _apply_transformations(df: DataFrame, transforms: List[Dict[str, Any]]) -> DataFrame:
        for t in transforms:
            ttype = t.get("type")
            col = t.get("column")
            if ttype == "map":
                mapping = t.get("mapping", {})
                # chained WHEN ending in otherwise(NULL): unmapped -> NULL,
                # exactly pandas .map semantics (:276-281)
                expr: Column = F.lit(None)
                for k, v in mapping.items():
                    expr = F.when(F.col(col) == F.lit(k), F.lit(v)).otherwise(expr)
                df = df.withColumn(col, expr)
            elif ttype == "apply":
                fn_name = t.get("function")
                fn = _APPLY_FUNCS.get(fn_name)
                if fn is None:
                    raise ValueError(
                        f"unsupported apply function {fn_name!r}; allowed: {sorted(_APPLY_FUNCS)}"
                    )
                df = df.withColumn(col, fn(F.col(col)))
            else:
                raise ValueError(f"unsupported transformation type: {ttype!r}")
        return df

    # -- A1-A3 aggregations (:296-350) -----------------------------------
    @classmethod
    def _apply_aggregations(cls, df: DataFrame, agg_config: Dict[str, Any]) -> DataFrame:
        group_by = agg_config.get("group_by", [])
        aggs = agg_config.get("aggregations", {})

        parsed = []  # (out_name_from_config, spark_fn, col, suffix_name)
        for out_name, spec in aggs.items():
            if not isinstance(spec, str):
                continue
            m = _AGG_RE.match(spec)
            if not m:
                continue
            fn_name, col = m.group(1).lower(), m.group(2)
            if fn_name == "count" and col == "*":
                parsed.append((out_name, None, "*", "count"))
                continue
            if fn_name in _AGG_FUNCS and col != "*":
                fn, suffix = _AGG_FUNCS[fn_name]
                parsed.append((out_name, fn, col, suffix))

        if not group_by:
            # global: only COUNT(*) supported (:303-316); others warned off
            exprs = []
            for out_name, fn, col, _ in parsed:
                if fn is None and col == "*":
                    exprs.append(F.count(F.lit(1)).alias(out_name))
                else:
                    logger.warning(
                        "global aggregation %r unsupported without group_by; skipped", out_name
                    )
            if not exprs:
                raise ValueError("aggregations without group_by support only COUNT(*)")
            return df.agg(*exprs)

        if not parsed:
            # size fallback (:347-348)
            return df.groupBy(*group_by).count()

        exprs = []
        for _out, fn, col, suffix in parsed:
            if fn is None and col == "*":
                exprs.append(F.count(F.lit(1)).alias("count"))
            else:
                # reference names outputs {col}_{func} regardless of the
                # config key (:344-346)
                exprs.append(fn(col).alias(f"{col}_{suffix}"))
        return df.groupBy(*group_by).agg(*exprs)

    # -- versioning (§2.10; reference :352-530) --------------------------
    def register_config_version(
        self, transformation_id: str, version: int, config: Dict[str, Any], description: str = ""
    ) -> None:
        self.registry.register(transformation_id, version, config, description)

    def get_config_version(self, transformation_id: str, version: Optional[int] = None):
        return self.registry.get(transformation_id, version)

    def get_version_history(self, transformation_id: str):
        return self.registry.history(transformation_id)

    def transform_with_version(
        self,
        data: DataFrame,
        transformation_id: str,
        version: Optional[int] = None,
        **kwargs,
    ) -> DataFrame:
        config = self.registry.get(transformation_id, version)
        resolved = version if version is not None else self.registry.latest_version(transformation_id)
        kwargs.setdefault("evolve_schema", True)
        return self.transform(
            data, config, transformation_id=transformation_id, version=resolved, **kwargs
        )

    def migrate_config(
        self,
        data: DataFrame,
        transformation_id: str,
        from_version: int,
        to_version: int,
    ) -> DataFrame:
        """Apply the old config then the new one (reference :484-510)."""
        old = self.registry.get(transformation_id, from_version)
        new = self.registry.get(transformation_id, to_version)
        return self.transform(self.transform(data, old), new)
