"""r8d wave: FK orphan profile, join-skew profile, PR curve, mutual
information (functions/profile.py, ranktests.py, quality.py)."""

import math

from pyspark.sql import functions as F


def _write(spark, path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(path / f"{name}.parquet")
    )


def _full_schema_fixture(spark, tmp_path, *, orphan_custkey=False, null_custkey=False):
    """Minimal 10-table surface for the FK walk."""
    custkeys = [(99, 0)] if orphan_custkey else [(1, 0)]
    ck = None if null_custkey else 1
    _write(spark, tmp_path, "orders", [(10, ck if not orphan_custkey else 99)],
           "o_orderkey long, o_custkey long")
    _write(spark, tmp_path, "customer", [(1, 0)], "c_custkey long, c_nationkey int")
    _write(spark, tmp_path, "lineitem", [(10, 1, 1)],
           "l_orderkey long, l_partkey long, l_suppkey long")
    _write(spark, tmp_path, "part", [(1,)], "p_partkey long")
    _write(spark, tmp_path, "supplier", [(1, 0)], "s_suppkey long, s_nationkey int")
    _write(spark, tmp_path, "nation", [(0, 0)], "n_nationkey int, n_regionkey int")
    _write(spark, tmp_path, "region", [(0,)], "r_regionkey int")


def test_fk_profile_clean_schema_has_no_orphans(spark, tmp_path):
    from data_pipeline_platform_spark.functions.profile import q_fk_orphan_profile

    _full_schema_fixture(spark, tmp_path)
    rows = {r["edge"]: r for r in q_fk_orphan_profile(spark, str(tmp_path)).collect()}
    assert len(rows) == 7
    assert all(r["n_orphan_keys"] == 0 and r["n_orphan_rows"] == 0 for r in rows.values())


def test_fk_profile_counts_orphans_and_nulls(spark, tmp_path):
    from data_pipeline_platform_spark.functions.profile import q_fk_orphan_profile

    _full_schema_fixture(spark, tmp_path)
    # two orders rows point at a missing customer, one has a NULL key
    _write(
        spark, tmp_path, "orders",
        [(10, 77), (11, 77), (12, None), (13, 1)],
        "o_orderkey long, o_custkey long",
    )
    # lineitem must still reference existing orders
    _write(spark, tmp_path, "lineitem", [(10, 1, 1)],
           "l_orderkey long, l_partkey long, l_suppkey long")
    rows = {r["edge"]: r for r in q_fk_orphan_profile(spark, str(tmp_path)).collect()}
    e = rows["orders.o_custkey->customer"]
    assert e["n_child_rows"] == 4
    assert e["n_null_keys"] == 1
    assert e["n_child_keys"] == 2  # 77 and 1 (NULL not counted)
    assert e["n_orphan_keys"] == 1
    assert e["n_orphan_rows"] == 2


def test_skew_profile_hand_computed(spark, tmp_path):
    from data_pipeline_platform_spark.functions.profile import q_join_skew_profile

    # o_custkey sizes: key1 -> 4 rows, key2 -> 1, key3 -> 1
    _write(
        spark, tmp_path, "orders",
        [(i, 1) for i in range(4)] + [(10, 2), (11, 3)],
        "o_orderkey long, o_custkey long",
    )
    _write(spark, tmp_path, "lineitem", [(1, 5, 6)],
           "l_orderkey long, l_partkey long, l_suppkey long")
    _write(spark, tmp_path, "events", [(1, 100), (2, 100)],
           "event_id long, user_id long")
    rows = {
        r["key_name"]: r for r in q_join_skew_profile(spark, str(tmp_path)).collect()
    }
    o = rows["orders.o_custkey"]
    assert (o["n_rows"], o["n_keys"], o["max_sz"]) == (6, 3, 4)
    assert o["p50_sz"] == 1.0  # sizes [1, 1, 4]
    assert o["top_key"] == 1
    assert o["skew_ratio"] == 4.0
    ev = rows["events.user_id"]
    assert (ev["n_keys"], ev["max_sz"], ev["top_key"]) == (1, 2, 100)


def test_skew_profile_top_key_tie_is_deterministic(spark, tmp_path):
    from data_pipeline_platform_spark.functions.profile import q_join_skew_profile

    # two keys tie at size 2: the larger key id must win
    _write(
        spark, tmp_path, "orders",
        [(1, 5), (2, 5), (3, 9), (4, 9)],
        "o_orderkey long, o_custkey long",
    )
    _write(spark, tmp_path, "lineitem", [(1, 1, 1)],
           "l_orderkey long, l_partkey long, l_suppkey long")
    _write(spark, tmp_path, "events", [(1, 1)], "event_id long, user_id long")
    rows = {
        r["key_name"]: r for r in q_join_skew_profile(spark, str(tmp_path)).collect()
    }
    assert rows["orders.o_custkey"]["top_key"] == 9


def test_pr_curve_endpoints(spark, tmp_path):
    """Lowest threshold bucket: recall == 1 (everything predicted
    positive); tp+fp == all rows. Monotone: recall non-increasing as
    bucket rises."""
    from data_pipeline_platform_spark.functions.ranktests import q_pr_curve_returns

    rows = [
        ("O", 150_00 / 100, "R"),   # bucket 1
        ("O", 250_00 / 100, "R"),   # bucket 2
        ("O", 50_00 / 100, "N"),    # bucket 0
        ("O", 150_50 / 100, "N"),   # bucket 1
    ]
    _write(
        spark, tmp_path, "lineitem", rows,
        "l_linestatus string, l_extendedprice double, l_returnflag string",
    )
    out = sorted(
        q_pr_curve_returns(spark, str(tmp_path)).collect(), key=lambda r: r["bucket"]
    )
    assert [r["bucket"] for r in out] == [0, 1, 2]
    b0, b1, b2 = out
    assert (b0["tp"], b0["fp"], b0["fn"]) == (2, 2, 0)
    assert b0["recall"] == 1.0 and b0["precision"] == 0.5
    assert (b1["tp"], b1["fp"]) == (2, 1)
    assert (b2["tp"], b2["fp"], b2["fn"]) == (1, 0, 1)
    assert b2["precision"] == 1.0 and b2["recall"] == 0.5


def test_mutual_information_independent_and_dependent(spark, tmp_path):
    from data_pipeline_platform_spark.functions.quality import (
        _MI_SCALE,
        q_mutual_information_pairs,
    )

    # orders: perfectly dependent (priority determines status);
    # MI = H = ln(2) for a 50/50 split
    _write(
        spark, tmp_path, "orders",
        [(i, "A", "X") for i in range(4)] + [(4 + i, "B", "Y") for i in range(4)],
        "o_orderkey long, o_orderpriority string, o_orderstatus string",
    )
    # lineitem: independent 2x2 uniform -> MI == 0
    _write(
        spark, tmp_path, "lineitem",
        [("R", "O"), ("R", "F"), ("N", "O"), ("N", "F")],
        "l_returnflag string, l_linestatus string",
    )
    _write(spark, tmp_path, "customer", [(1, "S", 0)],
           "c_custkey long, c_mktsegment string, c_nationkey int")
    rows = {r["pair"]: r for r in q_mutual_information_pairs(spark, str(tmp_path)).collect()}
    dep = rows["orders.priority~status"]
    # fixed-point replay: per-cell term ln(2) rounded to the 1e-6 grid
    want_fp = round(math.log(2) * _MI_SCALE) * 8
    assert dep["mi_fp"] == want_fp
    assert abs(dep["mi_nats"] - math.log(2)) < 1e-5
    assert abs(dep["nmi"] - 1.0) < 1e-9
    ind = rows["lineitem.returnflag~linestatus"]
    assert ind["mi_fp"] == 0 and ind["mi_nats"] == 0.0
