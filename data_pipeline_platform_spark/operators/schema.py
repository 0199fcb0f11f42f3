"""Schema definition, validation, evolution, and registry (SURVEY.md §1.4/§2).

Reference: src/pipeline/transformation/schema_validator.py. The reference
validates pandas DataFrames eagerly; here validation compiles to a pure
``DataFrame -> DataFrame`` rewrite (select + cast + coalesce) that stays
inside the lazy plan — Catalyst folds the casts into the scan where
possible, so validation is free at scale.

Validation semantics in order (schema_validator.py:98-257):
  1. missing columns -> added with default (or NULL) in non-strict mode;
     error in strict                                   (:165-176)
  2. extra columns  -> kept if allow_extra_columns, else dropped (:178-184)
  3. column reorder to schema order, extras appended   (:187-190)
  4. type coercion, coerce-to-null on failure in non-strict (:192-237)
     (Spark CAST with ANSI off == pd.to_numeric(errors="coerce"))
  5. defaults fill NULLs where default is not None     (:239-257)
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional

from pydantic import BaseModel, Field, field_validator
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# user-facing dtype name -> Spark type (reference schema_validator.py:30-46
# maps to pandas dtypes; extended here with native Spark type names)
_DTYPE_MAP: Dict[str, T.DataType] = {
    "string": T.StringType(),
    "str": T.StringType(),
    "object": T.StringType(),
    "int": T.LongType(),
    "integer": T.LongType(),
    "int64": T.LongType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "int32": T.IntegerType(),
    "float": T.DoubleType(),
    "double": T.DoubleType(),
    "float64": T.DoubleType(),
    "float32": T.FloatType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "datetime64[ns]": T.TimestampType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
}


def normalize_dtype(name: str) -> T.DataType:
    """Resolve a dtype name; unknown names raise (the reference passes
    unknown names through verbatim to pandas, which then raises on use —
    failing here is the same contract, earlier)."""
    key = name.strip().lower()
    if key in _DTYPE_MAP:
        return _DTYPE_MAP[key]
    # allow any Spark DDL type string, e.g. "array<float>", "decimal(18,2)"
    try:
        return T._parse_datatype_string(name)
    except Exception as exc:
        raise ValueError(f"unknown dtype: {name!r}") from exc


class ColumnSchema(BaseModel):
    """One column (reference schema_validator.py:19-46)."""

    name: str
    dtype: str = "string"
    nullable: bool = True
    default: Any = None
    description: str = ""

    @field_validator("dtype")
    @classmethod
    def _check_dtype(cls, v: str) -> str:
        normalize_dtype(v)  # raise early on nonsense
        return v

    @property
    def spark_type(self) -> T.DataType:
        return normalize_dtype(self.dtype)


class SchemaDefinition(BaseModel):
    """Versioned list of columns (reference schema_validator.py:49-66)."""

    name: str
    version: int = 1
    columns: List[ColumnSchema] = Field(default_factory=list)
    description: str = ""

    def to_struct_type(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(
                    c.name,
                    c.spark_type,
                    c.nullable,
                    metadata={"default": c.default, "description": c.description},
                )
                for c in self.columns
            ]
        )

    def column(self, name: str) -> Optional[ColumnSchema]:
        for c in self.columns:
            if c.name == name:
                return c
        return None


class SchemaValidationError(ValueError):
    pass


class SchemaValidator:
    """Compile schema validation into a lazy DataFrame rewrite."""

    def validate(
        self,
        df: DataFrame,
        schema: SchemaDefinition,
        strict: bool = False,
        allow_extra_columns: bool = False,
        evolve: bool = False,
    ) -> DataFrame:
        """Apply steps 1-5 (module docstring). ``evolve`` mirrors the
        transformers' evolve_schema=True path (add-missing, keep going)."""
        if evolve:
            strict = False
        existing = set(df.columns)
        declared = [c.name for c in schema.columns]

        missing = [c for c in schema.columns if c.name not in existing]
        if missing and strict:
            raise SchemaValidationError(
                f"missing columns: {[c.name for c in missing]} (strict mode)"
            )

        cols = []
        for c in schema.columns:
            if c.name in existing:
                # step 4: cast; ANSI off => unparseable -> NULL, matching
                # pd.to_numeric(errors='coerce')
                col = F.col(c.name).cast(c.spark_type)
            else:
                # step 1: missing -> default or NULL
                col = F.lit(c.default).cast(c.spark_type)
            # step 5: defaults fill nulls
            if c.default is not None:
                col = F.coalesce(col, F.lit(c.default).cast(c.spark_type))
            cols.append(col.alias(c.name))

        extras = [c for c in df.columns if c not in declared]
        if extras and strict and not allow_extra_columns:
            raise SchemaValidationError(f"unexpected extra columns: {extras} (strict mode)")
        if allow_extra_columns:
            # step 3: schema order first, extras appended
            cols.extend(F.col(c) for c in extras)

        return df.select(*cols)

    # -- evolution (reference schema_validator.py:391-444) ---------------
    def evolve_schema(
        self,
        df: DataFrame,
        new_schema: SchemaDefinition,
        deprecated_columns: Optional[List[str]] = None,
    ) -> DataFrame:
        """Add new columns with defaults, drop deprecated, validate with
        allow_extra_columns=False."""
        if deprecated_columns:
            df = df.drop(*deprecated_columns)
        return self.validate(df, new_schema, allow_extra_columns=False)

    # -- comparison (reference schema_validator.py:477-547) --------------
    @staticmethod
    def compare_schemas(old: SchemaDefinition, new: SchemaDefinition) -> Dict[str, Any]:
        old_cols = {c.name: c for c in old.columns}
        new_cols = {c.name: c for c in new.columns}
        added = sorted(set(new_cols) - set(old_cols))
        removed = sorted(set(old_cols) - set(new_cols))
        type_changes = {}
        nullable_changes = {}
        for name in set(old_cols) & set(new_cols):
            if old_cols[name].dtype != new_cols[name].dtype:
                type_changes[name] = {"from": old_cols[name].dtype, "to": new_cols[name].dtype}
            if old_cols[name].nullable != new_cols[name].nullable:
                nullable_changes[name] = {
                    "from": old_cols[name].nullable,
                    "to": new_cols[name].nullable,
                }
        return {
            "added_columns": added,
            "removed_columns": removed,
            "type_changes": type_changes,
            "nullable_changes": nullable_changes,
            "compatible": not removed and not type_changes,
        }


class SchemaRegistry:
    """Durable versioned schema store (reference schema_validator.py:291-375).

    The reference uses a ``schema_versions`` DB table with ON CONFLICT
    upsert + in-memory cache + last-10 history. Here: a JSON directory
    (one file per schema name holding all versions) — same upsert-latest
    semantics, no DB dependency. ``AcidSchemaRegistry`` below is the
    deployment-grade backend on the repo's own ACID table format; this
    JSON backend stays as the zero-Spark fallback (CLI contexts where no
    session exists yet).
    """

    HISTORY_LIMIT = 10

    def __init__(self, path: str = "/tmp/dpps-schema-registry"):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._cache: Dict[str, SchemaDefinition] = {}

    def _file(self, name: str) -> str:
        return os.path.join(self.path, f"{name}.json")

    def register(self, schema: SchemaDefinition) -> None:
        """Upsert (name, version); keeps last HISTORY_LIMIT versions."""
        entries = self._load_all(schema.name)
        entries = [e for e in entries if e["version"] != schema.version]
        entries.append(
            {
                "version": schema.version,
                "schema": schema.model_dump(),
                "registered_at": time.time(),
            }
        )
        entries.sort(key=lambda e: e["version"])
        entries = entries[-self.HISTORY_LIMIT :]
        with open(self._file(schema.name), "w") as f:
            json.dump(entries, f)
        self._cache[f"{schema.name}@{schema.version}"] = schema

    def load(self, name: str, version: Optional[int] = None) -> SchemaDefinition:
        """Load by name; no version => latest (ORDER BY version DESC LIMIT 1
        parity, reference :370-375)."""
        if version is not None and f"{name}@{version}" in self._cache:
            return self._cache[f"{name}@{version}"]
        entries = self._load_all(name)
        if not entries:
            raise KeyError(f"unknown schema: {name}")
        if version is None:
            entry = entries[-1]
        else:
            match = [e for e in entries if e["version"] == version]
            if not match:
                raise KeyError(f"unknown version {version} for schema {name}")
            entry = match[0]
        schema = SchemaDefinition(**entry["schema"])
        self._cache[f"{name}@{schema.version}"] = schema
        return schema

    def history(self, name: str) -> List[Dict[str, Any]]:
        return [
            {"version": e["version"], "registered_at": e.get("registered_at")}
            for e in self._load_all(name)
        ]

    def _load_all(self, name: str) -> List[Dict[str, Any]]:
        try:
            with open(self._file(name)) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return []


class AcidSchemaRegistry:
    """Schema registry on the ACID lake layer (sinks/acid.py): versions
    are ROWS in an AcidTable keyed (name, version), and ``register`` is
    one MERGE commit — so schema history gets the same atomicity, audit
    trail, and time travel as the data it describes.

    Semantics preserved from the reference's DB-backed registry
    (schema_validator.py:291-375): re-registering an existing (name,
    version) upserts it (ON CONFLICT DO UPDATE == AcidTable.merge),
    ``load`` with no version returns the latest (ORDER BY version DESC
    LIMIT 1), and loads cache. Beyond the reference: ``history`` is the
    FULL version list (the JSON backend's last-10 trim was a file-size
    bound that no longer applies), and ``table_version=`` time-travels
    the whole registry to any past commit — "what did this schema say
    when batch N loaded?" is one read, no log archaeology.

    Scale: the registry is metadata-sized (|schemas| x |versions| rows);
    merge's footer stats prune on (name, version) like any dimension.
    """

    _DDL = "name string, version bigint, schema_json string, registered_at double"

    def __init__(self, spark, path: str):
        from data_pipeline_platform_spark.sinks.acid import AcidTable

        self.spark = spark
        self.acid = AcidTable(spark, path)
        self._cache: Dict[str, SchemaDefinition] = {}

    def register(self, schema: SchemaDefinition) -> None:
        """Upsert (name, version) in one atomic MERGE commit."""
        src = self.spark.createDataFrame(
            [
                (
                    schema.name,
                    int(schema.version),
                    json.dumps(schema.model_dump()),
                    time.time(),
                )
            ],
            self._DDL,
        )
        if not self.acid.exists():
            self.acid.write(src, stats_cols=["name", "version"])
        else:
            self.acid.merge(src, keys=["name", "version"])
        self._cache[f"{schema.name}@{schema.version}"] = schema

    def load(
        self,
        name: str,
        version: Optional[int] = None,
        table_version: Optional[int] = None,
    ) -> SchemaDefinition:
        """Load by name; no ``version`` => latest. ``table_version``
        time-travels the registry itself (cache bypassed — the cache
        only ever answers for the current snapshot)."""
        key = f"{name}@{version}"
        if version is not None and table_version is None and key in self._cache:
            return self._cache[key]
        try:
            df = self.acid.read(version=table_version).filter(F.col("name") == name)
        except FileNotFoundError:
            raise KeyError(f"unknown schema: {name}") from None
        if version is None:
            rows = df.orderBy(F.col("version").desc()).limit(1).collect()
        else:
            rows = df.filter(F.col("version") == int(version)).limit(1).collect()
        if not rows:
            raise KeyError(
                f"unknown schema: {name}"
                if version is None
                else f"unknown version {version} for schema {name}"
            )
        schema = SchemaDefinition(**json.loads(rows[0]["schema_json"]))
        if table_version is None:
            self._cache[f"{name}@{schema.version}"] = schema
        return schema

    def history(self, name: str) -> List[Dict[str, Any]]:
        try:
            df = self.acid.read().filter(F.col("name") == name)
        except FileNotFoundError:
            return []
        return [
            {"version": r["version"], "registered_at": r["registered_at"]}
            for r in df.orderBy("version").collect()
        ]

    def table_history(self) -> List[Dict[str, Any]]:
        """The registry's own commit log (who changed what, when)."""
        return self.acid.history()
