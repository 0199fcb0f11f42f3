"""Edge cases: empty inputs, unicode, nulls in group keys, extreme
values — the places lenient-semantics engines usually diverge."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.operators.config_transformer import ConfigTransformer
from data_pipeline_platform_spark.operators.sql_transformer import SQLTransformer


def _empty(spark):
    return spark.createDataFrame([], "id long, name string, v double")


def test_config_ops_on_empty_input(spark):
    t = ConfigTransformer()
    cfg = {
        "select": ["id", "name"],
        "filter": {"id": {">": 0}},
        "add_columns": {"v2": "id * 2"},
        "rename": {"name": "n"},
    }
    out = t.transform(_empty(spark), cfg)
    assert out.count() == 0
    assert out.columns == ["id", "n", "v2"]


def test_sql_transform_on_empty_input(spark):
    t = SQLTransformer(spark)
    out = t.transform(_empty(spark), "SELECT id, UPPER(name) AS nm FROM input_data")
    assert out.count() == 0 and out.columns == ["id", "nm"]


def test_group_agg_on_empty_input(spark):
    t = ConfigTransformer()
    out = t.transform(
        _empty(spark),
        {"aggregations": {"group_by": ["name"], "aggregations": {"s": "SUM(v)"}}},
    )
    assert out.count() == 0


def test_global_count_on_empty_is_zero(spark):
    t = ConfigTransformer()
    out = t.transform(_empty(spark), {"aggregations": {"aggregations": {"n": "COUNT(*)"}}})
    assert out.collect()[0]["n"] == 0


def test_unicode_strings_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "héllo wörld"), (2, "日本語テキスト"), (3, "emoji 🎉 test"), (4, "Ω≈ç√∫")],
        "id long, text string",
    )
    t = ConfigTransformer()
    out = t.transform(
        df,
        {"transformations": [{"type": "apply", "column": "text", "function": "upper"}]},
    )
    vals = {r["id"]: r["text"] for r in out.collect()}
    assert vals[1] == "HÉLLO WÖRLD"
    assert vals[2] == "日本語テキスト"  # no-case script unchanged
    assert "🎉" in vals[3]
    # contains with unicode needle
    assert t.transform(df, {"filter": {"text": {"contains": "日本"}}}).count() == 1


def test_nulls_in_group_keys(spark):
    df = spark.createDataFrame(
        [(None, 1.0), ("a", 2.0), (None, 3.0), ("b", 4.0)], "k string, v double"
    )
    out = {
        r["k"]: r["v_sum"]
        for r in ConfigTransformer()
        .transform(df, {"aggregations": {"group_by": ["k"], "aggregations": {"s": "SUM(v)"}}})
        .collect()
    }
    assert out[None] == 4.0  # NULL is one group (SQL semantics)
    assert out["a"] == 2.0 and out["b"] == 4.0


def test_filter_on_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, s string")
    t = ConfigTransformer()
    assert t.transform(df, {"filter": {"s": {"contains": "x"}}}).count() == 0
    assert t.transform(df, {"filter": {"s": {"is_null": True}}}).count() == 2


def test_extreme_numeric_values(spark):
    df = spark.createDataFrame(
        [(1, 2**62), (2, -(2**62)), (3, 0)], "id long, big long"
    )
    out = df.agg(F.sum("big").alias("s")).collect()[0]["s"]
    assert out == 0


def test_map_recode_with_non_string_values(spark):
    df = spark.createDataFrame([(1, "A"), (2, "B")], "id long, s string")
    out = ConfigTransformer().transform(
        df,
        {"transformations": [{"type": "map", "column": "s", "mapping": {"A": 10, "B": 20}}]},
    )
    assert {r["s"] for r in out.collect()} == {10, 20}


def test_upsert_on_empty_target_dir(spark, tmp_path):
    from data_pipeline_platform_spark.sinks.writers import BatchWriter, WriteStrategy

    writer = BatchWriter(spark, base_path=str(tmp_path))
    df = spark.createDataFrame([(1, "x")], "k long, v string")
    stat = writer.write(df, "fresh", WriteStrategy.UPSERT, upsert_keys=["k"])
    assert stat["rows_written"] == 1
    assert writer.read_table("fresh").count() == 1


def _empty_corpus_dir(spark, tmp_path):
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    spark.createDataFrame([], schema).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


def test_dup_span_fraction_on_empty_corpus(spark, tmp_path):
    from data_pipeline_platform_spark.functions.substring import (
        q_dup_span_fraction,
    )

    assert q_dup_span_fraction(spark, _empty_corpus_dir(spark, tmp_path)).count() == 0


def test_cms_heavy_hitters_on_empty_corpus(spark, tmp_path):
    from data_pipeline_platform_spark.functions.sketches import (
        q_cms_heavy_hitters,
    )

    assert q_cms_heavy_hitters(spark, _empty_corpus_dir(spark, tmp_path)).count() == 0


def test_dsir_on_corpus_without_target_language(spark, tmp_path):
    """No en docs at all: target census is empty, Laplace smoothing
    keeps every ratio finite, and every doc still gets a weight."""
    import math

    from data_pipeline_platform_spark.functions.dsir import (
        q_dsir_importance_weights,
    )

    df = spark.createDataFrame(
        [(i, "wort eins zwei drei", "de", "s", 19) for i in range(6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = q_dsir_importance_weights(spark, str(tmp_path)).collect()
    assert len(rows) == 6
    assert all(math.isfinite(r["avg_logweight"]) for r in rows)


def test_bloom_prune_with_no_qualifying_keys(spark):
    """An all-zero filter must prune EVERYTHING (no bits set -> no row
    can pass), mirroring the empty plain-join result."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.functions.scale import (
        bloom_prune,
        build_bloom,
    )
    from data_pipeline_platform_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    empty_keys = (
        load_table(spark, sf, "orders")
        .filter(F.lit(False))
        .select("o_orderkey")
    )
    li = load_table(spark, sf, "lineitem")
    bloom = build_bloom(empty_keys, "o_orderkey")
    assert bloom_prune(li, "l_orderkey", bloom).count() == 0


def test_quantize_constant_and_zero_vectors(spark, tmp_path):
    """The all-zero vector must survive (scale floor), and a constant
    vector reconstructs exactly (cos 1.0, zero error)."""
    from data_pipeline_platform_spark.functions.similarity import (
        q_quantize_embeddings,
    )

    df = spark.createDataFrame(
        [
            (0, [0.0] * 64, 0),
            (1, [0.5] * 64, 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    rows = {r["vec_id"]: r for r in q_quantize_embeddings(spark, str(tmp_path)).collect()}
    assert rows[0]["q_checksum"] == 0  # zero vector -> zero codes
    assert rows[1]["cos_recon"] == 1.0
    assert rows[1]["l2_rel_err"] == 0.0


def test_r6_corpus_ops_on_empty_corpus(spark, tmp_path):
    """The r6 text/corpus ops must return empty frames, not crash, on
    a zero-row documents table."""
    from data_pipeline_platform_spark.functions.overlap import q_source_overlap
    from data_pipeline_platform_spark.functions.pmi import q_pmi_cooccurrence
    from data_pipeline_platform_spark.functions.substring import q_dedup_span_clean
    from data_pipeline_platform_spark.functions.text import q_char_entropy
    from data_pipeline_platform_spark.functions.vocab import q_vocab_growth
    from data_pipeline_platform_spark.functions.dedup import q_dedup_containment

    d = _empty_corpus_dir(spark, tmp_path)
    for fn in (
        q_source_overlap,
        q_pmi_cooccurrence,
        q_dedup_span_clean,
        q_char_entropy,
        q_vocab_growth,
        q_dedup_containment,
    ):
        assert fn(spark, d).count() == 0, fn.__name__


def test_cusum_single_hour_series_is_flat(spark, tmp_path):
    """One hour of data: the deviation is zero by construction, so the
    CUSUM must be exactly 0 and nothing may flag."""
    import datetime

    from data_pipeline_platform_spark.functions.changepoint import (
        q_cusum_changepoints,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 30)
    df = spark.createDataFrame(
        [(i, t0, 1, "only", 1.0, "{}") for i in range(5)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    rows = q_cusum_changepoints(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["cusum_scaled"] == 0 and rows[0]["drifting"] is False


def test_knn_classify_singleton_cells_emit_nothing_for_lonely_vectors(spark, tmp_path):
    """A vector alone in its cell has no neighbors — it must simply be
    absent from the output rather than erroring."""
    from data_pipeline_platform_spark.functions.similarity import q_knn_classify

    # two tight clusters -> two cells; a third lone vector far away
    rows = [(i, [1.0 + 0.001 * i] * 8, 0) for i in range(8)]
    rows += [(10 + i, [-1.0 - 0.001 * i] * 8, 1) for i in range(8)]
    rows.append((99, [50.0] * 8, 2))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = {r["vec_id"] for r in q_knn_classify(spark, str(tmp_path)).collect()}
    assert out  # the clustered vectors classify
    # every emitted vector had at least one in-cell neighbor; the lone
    # vector may or may not share a cell depending on seeding — the
    # contract is simply: no crash, no spurious self-votes
    assert all(isinstance(v, int) for v in out)


def test_important_parts_threshold_exact_past_int64(spark):
    """The Q11-style threshold (value_c * n_li > total_c * 60) multiplies
    two cents-squared BIGINT sums — near sf100 both products pass 2^63,
    where BIGINT arithmetic wraps silently (ANSI off) while the DuckDB
    oracle promotes to HUGEINT. The query compares in decimal(38,0); this
    pins that the decimal form stays mathematically exact with operands
    near and beyond 2^63 in both directions, including the strict->
    boundary."""
    from pyspark.sql import functions as F

    int64_max = (1 << 63) - 1
    rows = [
        # value_c ~0.6*2^63, n_li 1000 -> product 5.5e21, far past 2^63;
        # total_c*60 = 3.6e20 -> mathematically kept
        (1, 5_500_000_000_000_000_000, 6_000_000_000_000_000_000, 1000, True),
        # product mathematically below threshold -> dropped
        (2, 1_000_000_000_000_000, 6_000_000_000_000_000_000, 1000, False),
        # exactly equal products (value_c*60 == total_c*60, n_li=60): the
        # comparison is strict > -> dropped
        (3, 6_000_000_000_000_000_000, 6_000_000_000_000_000_000, 60, False),
        # operand itself at int64 max, small multiplier
        (4, int64_max, int64_max, 61, True),
    ]
    df = spark.createDataFrame(
        [(k, v, t, n) for k, v, t, n, _ in rows],
        "k long, value_c long, total_c long, n_li long",
    )
    kept = {
        r["k"]
        for r in df.filter(
            F.col("value_c").cast("decimal(38,0)") * F.col("n_li")
            > F.col("total_c").cast("decimal(38,0)") * 60
        ).collect()
    }
    expected = {k for k, v, t, n, keep in rows if keep}
    # cross-check expected against exact Python integer arithmetic
    assert expected == {k for k, v, t, n, _ in rows if v * n > t * 60}
    assert kept == expected
