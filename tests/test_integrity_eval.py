"""r8c wave: exact ROC-AUC, NDCG@10, weighted shortest path, and the
order-independent table fingerprint (functions/ranktests.py,
retrieval.py, graph.py, integrity.py)."""

import datetime

from pyspark.sql import functions as F


def test_roc_auc_hand_computed(spark, tmp_path):
    """pos scores [3.00, 2.00] vs neg [1.00, 2.00]: pairwise wins
    3 + one tie -> U = 3.5, AUC = 3.5/4 = 0.875, u2 = 7."""
    from data_pipeline_platform_spark.functions.ranktests import q_roc_auc_returns

    rows = [
        ("O", 3.00, "R"),
        ("O", 2.00, "R"),
        ("O", 1.00, "N"),
        ("O", 2.00, "A"),
    ]
    spark.createDataFrame(
        rows, "l_linestatus string, l_extendedprice double, l_returnflag string"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    [r] = q_roc_auc_returns(spark, str(tmp_path)).collect()
    assert (r["grp"], r["n_pos"], r["n_neg"]) == ("O", 2, 2)
    assert r["u2_pos"] == 7
    assert r["roc_auc"] == 0.875
    assert r["gini_coef"] == 2 * 0.875 - 1


def test_roc_auc_perfect_separation(spark, tmp_path):
    from data_pipeline_platform_spark.functions.ranktests import q_roc_auc_returns

    rows = [("F", 10.0 + i, "R") for i in range(3)] + [
        ("F", 1.0 + i, "N") for i in range(3)
    ]
    spark.createDataFrame(
        rows, "l_linestatus string, l_extendedprice double, l_returnflag string"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    [r] = q_roc_auc_returns(spark, str(tmp_path)).collect()
    assert r["roc_auc"] == 1.0 and r["gini_coef"] == 1.0


def test_ndcg_perfect_and_zero(spark, tmp_path):
    """Probe 0 (label 1): both relevant docs rank 1-2 of a 5-doc corpus
    -> dcg == idcg == W1+W2 -> ndcg10 == 1.0. Probe 5 (label 3, unique)
    has zero relevant -> ndcg NULL (no idcg) is avoided by n_label-1=0
    -> CASE misses -> NULL; assert dcg_num == 0."""
    from data_pipeline_platform_spark.functions.retrieval import (
        _NDCG_PREFIX,
        q_ndcg_retrieval,
    )

    rows = [
        (0, [0.0, 0.0], 1),   # probe
        (1, [0.1, 0.0], 1),   # relevant, rank 1
        (2, [0.2, 0.0], 1),   # relevant, rank 2
        (3, [3.0, 0.0], 2),   # irrelevant, farther
        (4, [4.0, 0.0], 2),
        (5, [9.0, 0.0], 3),   # unique-label probe: zero relevant
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {r["probe_id"]: r for r in q_ndcg_retrieval(spark, str(tmp_path)).collect()}
    p0 = out[0]
    assert p0["n_rel_top10"] == 2
    assert p0["dcg_num"] == p0["idcg_num"] == _NDCG_PREFIX[1]
    assert p0["ndcg10"] == 1.0
    p5 = out[5]
    assert p5["n_rel_top10"] == 0 and p5["dcg_num"] == 0
    assert p5["idcg_num"] is None and p5["ndcg10"] is None


def test_ndcg_rank_position_matters(spark, tmp_path):
    """One relevant doc at rank 2 (of >=2 candidates): dcg = W2,
    idcg = W1 -> ndcg = W2/W1 < 1."""
    from data_pipeline_platform_spark.functions.retrieval import (
        _NDCG_W,
        q_ndcg_retrieval,
    )

    rows = [
        (0, [0.0, 0.0], 1),
        (1, [0.1, 0.0], 2),   # rank 1, irrelevant
        (2, [0.2, 0.0], 1),   # rank 2, the only relevant
        (3, [0.3, 0.0], 2),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {r["probe_id"]: r for r in q_ndcg_retrieval(spark, str(tmp_path)).collect()}
    p0 = out[0]
    assert p0["dcg_num"] == _NDCG_W[1]
    assert p0["idcg_num"] == _NDCG_W[0]
    assert p0["ndcg10"] == _NDCG_W[1] / _NDCG_W[0]


def _write_trade(spark, tmp_path, trades):
    """trades: list of (sup_nation, cust_nation, price_dollars). Builds
    the 4-table join surface with one order+lineitem per trade."""
    orders, lineitem, customers, suppliers = [], [], [], []
    for i, (sn, cn, price) in enumerate(trades):
        ok, ck, sk = 1000 + i, 2000 + i, 3000 + i
        orders.append((ok, ck))
        customers.append((ck, cn))
        suppliers.append((sk, sn))
        lineitem.append((ok, sk, price, 0.0))
    spark.createDataFrame(orders, "o_orderkey long, o_custkey long").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(customers, "c_custkey long, c_nationkey int").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(suppliers, "s_suppkey long, s_nationkey int").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "supplier.parquet"))
    spark.createDataFrame(
        lineitem,
        "l_orderkey long, l_suppkey long, l_extendedprice double, l_discount double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))


def test_shortest_path_two_hop_beats_direct(spark, tmp_path):
    """Chain 0-1 (1.00) and 1-2 (2.00) plus a direct 0-2 edge at
    10.00: the 2-hop path (300c) must beat the direct edge (1000c)."""
    from data_pipeline_platform_spark.functions.graph import q_nation_shortest_path

    _write_trade(
        spark,
        tmp_path,
        [(0, 1, 1.00), (1, 2, 2.00), (0, 2, 10.00)],
    )
    got = {
        r["node"]: r["dist_c"]
        for r in q_nation_shortest_path(spark, str(tmp_path)).collect()
    }
    assert got == {0: 0, 1: 100, 2: 300}


def test_shortest_path_undirected_min_weight(spark, tmp_path):
    """Reverse-direction trades fold into ONE undirected edge at the
    cheaper weight; unreachable-within-rounds nodes are absent."""
    from data_pipeline_platform_spark.functions.graph import (
        SP_ROUNDS,
        q_nation_shortest_path,
    )

    # 0<->1 in both directions (min 50c); isolated pair 8-9 is a
    # separate component: never reached from source 0
    _write_trade(
        spark,
        tmp_path,
        [(0, 1, 2.00), (1, 0, 0.50), (8, 9, 1.00)],
    )
    got = {
        r["node"]: r["dist_c"]
        for r in q_nation_shortest_path(spark, str(tmp_path)).collect()
    }
    assert got == {0: 0, 1: 50}
    assert SP_ROUNDS >= 2


def _write_fp_tables(spark, path, *, orders_rows, shuffle=False):
    odf = spark.createDataFrame(
        orders_rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    if shuffle:
        odf = odf.repartition(7)
    odf.write.mode("overwrite").parquet(str(path / "orders.parquet"))
    spark.createDataFrame(
        [(1, "c", 0, 1.0, "SEG")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(str(path / "customer.parquet"))
    spark.createDataFrame(
        [(1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", datetime.datetime(1995, 1, 1))],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(path / "lineitem.parquet"))


def test_fingerprint_order_invariant_and_value_sensitive(spark, tmp_path):
    from data_pipeline_platform_spark.functions.integrity import q_table_fingerprint

    base = [
        (i, i * 10, "O", 100.0 + i, datetime.datetime(1995, 1, 1 + i), "1-URGENT")
        for i in range(6)
    ]
    a = tmp_path / "a"
    b = tmp_path / "b"
    c = tmp_path / "c"
    for p in (a, b, c):
        p.mkdir()
    _write_fp_tables(spark, a, orders_rows=base)
    _write_fp_tables(spark, b, orders_rows=list(reversed(base)), shuffle=True)
    # one cent of drift in one row
    drift = [base[0][:3] + (base[0][3] + 0.01,) + base[0][4:]] + base[1:]
    _write_fp_tables(spark, c, orders_rows=drift)

    def fp(path):
        return {
            r["table_name"]: (r["n_rows"], r["fp_sum"], r["fp_xor"])
            for r in q_table_fingerprint(spark, str(path)).collect()
        }

    fa, fb, fc = fp(a), fp(b), fp(c)
    assert fa == fb  # row order / partitioning never matters
    assert fa["customer"] == fc["customer"] and fa["lineitem"] == fc["lineitem"]
    assert fa["orders"][0] == fc["orders"][0]  # same row count
    assert fa["orders"][1] != fc["orders"][1]  # but the cent shows up
    assert fa["orders"][2] != fc["orders"][2]


def test_fingerprint_null_vs_empty_string_distinct(spark, tmp_path):
    from data_pipeline_platform_spark.functions.integrity import q_table_fingerprint

    r = (1, 1, None, 1.0, datetime.datetime(1995, 1, 1), "P")
    r_empty = (1, 1, "", 1.0, datetime.datetime(1995, 1, 1), "P")
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir(), b.mkdir()
    _write_fp_tables(spark, a, orders_rows=[r])
    _write_fp_tables(spark, b, orders_rows=[r_empty])
    from_a = {
        x["table_name"]: x["fp_xor"]
        for x in q_table_fingerprint(spark, str(a)).collect()
    }
    from_b = {
        x["table_name"]: x["fp_xor"]
        for x in q_table_fingerprint(spark, str(b)).collect()
    }
    assert from_a["orders"] != from_b["orders"]
