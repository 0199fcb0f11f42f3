"""Data-quality expectations: one-pass rule evaluation, null handling,
referential orphans."""

from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions.quality import (
    check_expectations,
    orphan_count,
)


def test_check_expectations_counts_and_null_policy(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0), (4, 200.0)], "id long, v double"
    )
    report = check_expectations(
        df,
        [
            ("v_positive", F.col("v") > 0),          # null v -> violation
            ("v_under_100", F.col("v") < 100),        # null v -> violation
            ("id_not_null", F.col("id").isNotNull()),
        ],
    )
    got = {r["rule"]: (r["checked"], r["violations"]) for r in report.collect()}
    assert got == {
        "v_positive": (4, 2),   # None and -5.0
        "v_under_100": (4, 2),  # None and 200.0
        "id_not_null": (4, 0),
    }


def test_orphan_count(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (9,)], "k long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    row = orphan_count(child, parent, ["k"], "fk").collect()[0]
    assert (row["rule"], row["checked"], row["violations"]) == ("fk", 4, 2)


def test_quality_report_single_scan(spark):
    """All row-level rules must evaluate in ONE pass over lineitem (the
    FK check adds its own pruned anti-join branch)."""
    from data_pipeline_platform_spark.functions.quality import q_data_quality_report

    df = q_data_quality_report(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # row-level branch + FK checked-count + FK orphan side = 3 scans max
    assert plan.count("lineitem.parquet") <= 3
    assert "EvalPython" not in plan
    # rule evaluation is partially aggregated before any exchange
    assert "partial_count" in plan or "partial_sum" in plan


def test_winnowing_guarantee_shared_substring(spark):
    """Winnowing contract: two docs sharing a substring of length
    >= k + w - 1 share at least one fingerprint; disjoint docs with no
    common k-gram share none."""
    from pyspark.sql import functions as F
    from data_pipeline_platform_spark.functions.text import (
        WINNOW_K,
        WINNOW_MOD,
        WINNOW_BASE,
        WINNOW_W,
    )

    shared = "zq" * ((WINNOW_K + WINNOW_W - 1 + 1) // 2)  # >= k+w-1 chars
    df = spark.createDataFrame(
        [
            (1, "aaaa bbbb cccc " + shared + " dddd eeee"),
            (2, "ffff gggg " + shared + " hhhh iiii jjjj"),
            (3, "kkkk llll mmmm nnnn oooo pppp qqqq rrrr"),
        ],
        "doc_id long, text string",
    )
    hashes = (
        f"transform(sequence(1, greatest(0, length(text) - {WINNOW_K} + 1)), "
        f"i -> aggregate(transform(sequence(0, {WINNOW_K - 1}), "
        f"c -> ascii(substring(text, i + c, 1))), CAST(0 AS BIGINT), "
        f"(acc, ch) -> (acc * {WINNOW_BASE} + ch) % {WINNOW_MOD}))"
    )
    fps = {
        r["doc_id"]: set(r["fps"])
        for r in df.withColumn("__h", F.expr(hashes))
        .withColumn(
            "fps",
            F.expr(
                f"array_distinct(transform(sequence(1, greatest(0, size(__h) - {WINNOW_W} + 1)), "
                f"j -> array_min(slice(__h, j, {WINNOW_W}))))"
            ),
        )
        .collect()
    }
    assert fps[1] & fps[2], "shared long substring must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_winnow_short_docs_no_crash_and_oracle_agreement(spark, tmp_path):
    """Docs shorter than k + w - 1 = 11 chars must yield (0 grams,
    0 fingerprints, checksum 0) — not crash. Regression: Spark's
    sequence(1, 0) is [1, 0] (descending, NOT empty), so the old
    greatest(0, ...) bound fed slice() start=0 and raised
    INVALID_PARAMETER_VALUE.START; DuckDB's generate_series(1, 0) IS
    empty, so the engines also disagreed semantically. Both engines run
    on the same parquet here and must agree row-for-row."""
    import duckdb
    import pandas as pd

    from data_pipeline_platform_spark.functions.text import (
        ORACLE_WINNOW_FINGERPRINTS,
        q_winnow_fingerprints,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            # 5 chars (< k), exactly k=8 (1 gram < w), k+w-2=10 (3 grams
            # < w windows), empty, and one comfortably long control doc
            "text": ["hello", "exactly8", "ten chars!", "", "a long enough document to fingerprint normally"],
        }
    )
    docs["lang"] = "en"
    docs["source"] = "unit"
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    docs.to_parquet(tmp_path / "documents.parquet", index=False)

    got = {
        r["doc_id"]: (r["n_grams"], r["n_fingerprints"], r["fp_checksum"])
        for r in q_winnow_fingerprints(spark, str(tmp_path)).collect()
    }
    assert got[1] == (0, 0, 0)
    assert got[4] == (0, 0, 0)
    assert got[2] == (1, 0, 0)  # one gram, no full w-window
    assert got[3] == (3, 0, 0)
    assert got[5][0] > 0 and got[5][1] > 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    oracle = {
        int(r[0]): (int(r[1]), int(r[2]), int(r[3]))
        for r in con.execute(ORACLE_WINNOW_FINGERPRINTS).fetchall()
    }
    assert oracle == got
