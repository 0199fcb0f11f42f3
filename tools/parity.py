#!/usr/bin/env python
"""Local oracle-parity harness mimicking the driver's correctness check.

For every entry in __spark_entry__.queries(): run the Spark query and the
DuckDB oracle on the same sf dir, then compare row count, sorted column
names, and values (rows sorted by all columns, compared exactly; floats
must match to the last bit — the queries are designed for bitwise parity
via exact decimal arithmetic).

Usage: python tools/parity.py [--json out.json] [sf_dir] [query_name ...]
       DPPS_VANILLA=1 python tools/parity.py ...   # driver-simulation
                                                   # session (default
                                                   # confs, ANSI on)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.map(lambda v: None if v is None else str(v))
        elif str(s.dtype).startswith("datetime"):
            df[c] = s.astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count {len(spark_pdf)} != oracle {len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns {sc} != oracle {oc}")
        return problems
    a, b = canon(spark_pdf), canon(oracle_pdf)
    if len(a) == len(b):
        for col in a.columns:
            av, bv = a[col].tolist(), b[col].tolist()
            bad = [
                (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not values_equal(x, y)
            ]
            if bad:
                i, x, y = bad[0]
                problems.append(
                    f"col {col!r}: {len(bad)} mismatched values; first at row {i}: "
                    f"spark={x!r} oracle={y!r} (dtypes {spark_pdf[col].dtype}/{oracle_pdf[col].dtype})"
                )
    return problems


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: parity.py [--json OUT.json] [SF_DIR] [QUERY ...]")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    import __spark_entry__ as se

    if os.environ.get("DPPS_VANILLA"):
        # simulate the grading driver: default confs (ANSI on in Spark 4),
        # no factory help
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]").appName("parity-vanilla").getOrCreate()
        )
    else:
        from data_pipeline_platform_spark.session import get_spark

        spark = get_spark("parity")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)

    qs = se.queries()
    oracles = se.oracle_sql()
    passed = failed = no_oracle = 0
    results = {}
    from data_pipeline_platform_spark.utils.cache import release_tracked

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {type(exc).__name__}: {exc}")
            results[name] = {"status": "fail", "error": f"spark: {type(exc).__name__}: {str(exc)[:300]}"}
            failed += 1
            continue
        finally:
            release_tracked()  # free operator-internal caches per query
        if name not in oracles:
            print(f"ROWS  {name}: {len(spark_pdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            results[name] = {"status": "rows_only", "rows": len(spark_pdf), "secs": round(time.time() - t0, 2)}
            no_oracle += 1
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL  {name}: oracle error: {type(exc).__name__}: {exc}")
            results[name] = {"status": "fail", "error": f"oracle: {type(exc).__name__}: {str(exc)[:300]}"}
            failed += 1
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            results[name] = {"status": "fail", "rows": len(spark_pdf), "problems": problems}
            failed += 1
        else:
            print(f"OK    {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s]")
            results[name] = {"status": "ok", "rows": len(spark_pdf), "secs": round(time.time() - t0, 2)}
            passed += 1
    print(f"\n{passed} passed, {failed} failed, {no_oracle} rows-only")
    if json_out:
        import json as _json

        payload = {
            "sf_dir": sf_dir,
            "summary": {"passed": passed, "failed": failed, "rows_only": no_oracle},
            "queries": results,
        }
        with open(json_out, "w") as f:
            _json.dump(payload, f, indent=1, sort_keys=True)
            f.write("\n")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
