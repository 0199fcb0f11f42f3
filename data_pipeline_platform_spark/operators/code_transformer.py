"""Code transformation — arbitrary Python callables over DataFrames.

Reference (src/pipeline/transformation/code_transformer.py:44-306, SURVEY.md
§2.9): the "UDF" unit is a whole-DataFrame function ``df -> df``. Here the
preferred carrier is a plan-composing function ``SparkDF -> SparkDF`` (zero
overhead — it just extends the lazy plan). For genuinely pandas-native user
functions, ``transform_pandas`` wraps them in Arrow-batched
``mapInPandas`` / ``applyInPandas`` (the 10-100x-faster-than-row-UDF path).

Loading conventions preserved:
- U2 ``"path/to/file.py:function_name"``  (code_transformer.py:138-207)
- U3 ``"pkg.module"`` -> its ``transform`` attribute (:209-234)
- U4 ``"module:ClassName"`` class transforms (:236-306)
- U5 ``safe_mode`` flag stored but advisory (never enforced in the
  reference either, :26-42)
"""

from __future__ import annotations

import importlib
import importlib.util
from typing import Any, Callable, Dict, Iterator, Optional, Union

import pandas as pd
from pyspark.sql import DataFrame

from data_pipeline_platform_spark.operators.versioning import VersionRegistry

TransformFunc = Callable[..., DataFrame]


class CodeTransformer:
    """Apply Python callables / classes to DataFrames, with versioning."""

    def __init__(self, safe_mode: bool = True):
        self.safe_mode = safe_mode  # advisory (reference parity)
        self.registry = VersionRegistry()
        self._module_cache: Dict[str, Any] = {}

    # -- U1 (reference :44-136) ------------------------------------------
    def transform(
        self,
        data: DataFrame,
        transform_func: Union[TransformFunc, str],
        transformation_id: Optional[str] = None,
        version: Optional[int] = None,
        input_schema=None,
        output_schema=None,
        evolve_schema: bool = False,
        **kwargs,
    ) -> DataFrame:
        if input_schema is not None:
            from data_pipeline_platform_spark.operators.schema import SchemaValidator

            data = SchemaValidator().validate(data, input_schema, evolve=evolve_schema)

        func = self._get_transform_function(transform_func)
        result = func(data, **kwargs)
        if not isinstance(result, DataFrame):
            raise TypeError(
                f"transform function must return a pyspark DataFrame, got {type(result).__name__}"
            )

        if output_schema is not None:
            from data_pipeline_platform_spark.operators.schema import SchemaValidator

            result = SchemaValidator().validate(result, output_schema)
        if transformation_id:
            self.registry.track_execution(transformation_id, version, {"func": repr(transform_func)})
        return result

    # -- pandas-native user functions ------------------------------------
    @staticmethod
    def transform_pandas(
        data: DataFrame,
        pandas_func: Callable[[pd.DataFrame], pd.DataFrame],
        schema: Union[str, Any],
        group_by: Optional[list] = None,
    ) -> DataFrame:
        """Run a pandas ``df -> df`` function distributed.

        - no ``group_by``: ``mapInPandas`` — the function sees Arrow
          batches per partition (never the whole dataset: it must be
          row-local or partition-local logic);
        - with ``group_by``: ``applyInPandas`` — the function sees one
          whole group per call (shuffles by the keys first).
        """
        if group_by:
            return data.groupBy(*group_by).applyInPandas(pandas_func, schema=schema)

        def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for batch in batches:
                yield pandas_func(batch)

        return data.mapInPandas(_map, schema=schema)

    # -- U4 class transforms (reference :236-306) ------------------------
    def transform_with_class(
        self,
        data: DataFrame,
        transform_class: Union[type, str],
        transformation_id: Optional[str] = None,
        version: Optional[int] = None,
        **init_kwargs,
    ) -> DataFrame:
        cls = transform_class
        if isinstance(cls, str):
            cls = self._load_attr_from_spec(cls)
        instance = cls(**init_kwargs)
        if not hasattr(instance, "transform"):
            raise TypeError(f"{cls!r} has no .transform method")
        result = instance.transform(data)
        if not isinstance(result, DataFrame):
            raise TypeError(
                f"class transform must return a pyspark DataFrame, got {type(result).__name__}"
            )
        if transformation_id:
            self.registry.track_execution(transformation_id, version, {"class": repr(transform_class)})
        return result

    # -- U2/U3 loading (reference :138-234) ------------------------------
    def _get_transform_function(self, spec: Union[TransformFunc, str]) -> TransformFunc:
        if callable(spec):
            return spec
        if not isinstance(spec, str):
            raise TypeError(f"transform_func must be callable or str, got {type(spec).__name__}")
        if ".py:" in spec:
            return self._load_attr_from_file(spec)
        if ":" in spec:
            return self._load_attr_from_spec(spec)
        # bare module path -> its `transform` attribute
        module = importlib.import_module(spec)
        func = getattr(module, "transform", None)
        if func is None:
            raise AttributeError(f"module {spec!r} has no 'transform' attribute")
        return func

    def _load_attr_from_file(self, spec: str) -> Any:
        """``path/to/file.py:attr`` with module caching (reference :138-207)."""
        path, attr = spec.rsplit(":", 1)
        if path in self._module_cache:
            module = self._module_cache[path]
        else:
            module_spec = importlib.util.spec_from_file_location("dpps_user_transform", path)
            if module_spec is None or module_spec.loader is None:
                raise ImportError(f"cannot load module from {path!r}")
            module = importlib.util.module_from_spec(module_spec)
            module_spec.loader.exec_module(module)
            self._module_cache[path] = module
        if not hasattr(module, attr):
            raise AttributeError(f"{path!r} has no attribute {attr!r}")
        return getattr(module, attr)

    @staticmethod
    def _load_attr_from_spec(spec: str) -> Any:
        """``pkg.module:attr``."""
        module_path, attr = spec.rsplit(":", 1)
        module = importlib.import_module(module_path)
        if not hasattr(module, attr):
            raise AttributeError(f"module {module_path!r} has no attribute {attr!r}")
        return getattr(module, attr)

    # -- versioning (§2.10; reference :308-428) --------------------------
    def register_function_version(
        self, transformation_id: str, version: int, func: Union[TransformFunc, str], description: str = ""
    ) -> None:
        self.registry.register(transformation_id, version, func, description)

    def get_function_version(self, transformation_id: str, version: Optional[int] = None):
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
        func = self.registry.get(transformation_id, version)
        resolved = version if version is not None else self.registry.latest_version(transformation_id)
        kwargs.setdefault("evolve_schema", True)
        return self.transform(
            data, func, transformation_id=transformation_id, version=resolved, **kwargs
        )
