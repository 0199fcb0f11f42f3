"""Declarative data-quality engine (functions/dq.py): single-pass
compiled constraint checks, foreign-key anti-join rules, the one-pass
column profiler, and Deequ-style rule suggestion."""

import pytest

from data_pipeline_platform_spark.functions.dq import (
    profile,
    run_checks,
    suggest_rules,
)


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [
            (1, "ann", 34, "US"),
            (2, "bob", 17, "DE"),
            (3, None, 210, "FR"),
            (4, "dan", 51, "XX"),
            (4, "dup", 28, "US"),
            (5, "eve", None, None),
        ],
        "id long, name string, age long, country string",
    )


def _by_rule(rows):
    return {(r["rule"], r["col_name"]): r for r in rows}


def test_row_rules_single_pass_counts(spark, people):
    out = run_checks(
        people,
        [
            {"rule": "not_null", "column": "name"},
            {"rule": "unique", "column": "id"},
            {"rule": "in_range", "column": "age", "min": 0, "max": 120},
            {"rule": "in_set", "column": "country", "values": ["US", "DE", "FR"]},
            {"rule": "matches", "column": "name", "pattern": "^[a-z]+$"},
            {"rule": "expr", "expr": "age IS NULL OR age >= 18"},
        ],
    ).collect()
    got = _by_rule(out)
    assert got[("not_null", "name")]["violations"] == 1
    # id=4 appears twice -> one surplus duplicate
    assert got[("unique", "id")]["violations"] == 1
    # 210 out of range; NULL age does NOT violate a content rule
    assert got[("in_range", "age")]["violations"] == 1
    # XX not in set; NULL country passes (not_null's job)
    assert got[("in_set", "country")]["violations"] == 1
    assert got[("matches", "name")]["violations"] == 0
    # expr: rows where predicate is not TRUE violate -> age=17
    assert got[("expr", "age IS NULL OR age >= 18")]["violations"] == 1
    assert not got[("unique", "id")]["passed"]
    assert got[("matches", "name")]["passed"]


def test_foreign_key_rule_counts_orphans(spark, people):
    countries = spark.createDataFrame([("US",), ("DE",), ("FR",)], "code string")
    out = run_checks(
        people,
        [
            {"rule": "not_null", "column": "id"},
            {
                "rule": "foreign_key",
                "column": "country",
                "ref": "countries",
                "ref_column": "code",
            },
        ],
        refs={"countries": countries},
    ).collect()
    got = _by_rule(out)
    # XX is an orphan; the NULL country row is skipped (FK on NULL is
    # vacuously satisfied, SQL semantics)
    assert got[("foreign_key", "country")]["violations"] == 1
    assert got[("not_null", "id")]["violations"] == 0


def test_unknown_rule_and_empty_rules_raise(spark, people):
    with pytest.raises(ValueError, match="unknown rule"):
        run_checks(people, [{"rule": "frobnicate", "column": "id"}])
    with pytest.raises(ValueError, match="no rules"):
        run_checks(people, [])


def test_expr_null_predicate_is_violation(spark):
    df = spark.createDataFrame([(1,), (None,)], "x long")
    out = run_checks(df, [{"rule": "expr", "expr": "x > 0"}]).collect()
    # x=NULL -> predicate NULL -> not TRUE -> violation
    assert out[0]["violations"] == 1


def test_profile_exact_stats(spark, people):
    rows = {r["col_name"]: r for r in profile(people).collect()}
    assert rows["id"]["n_rows"] == 6
    assert rows["id"]["n_nulls"] == 0
    assert rows["id"]["n_distinct"] == 5
    # numeric min/max computed natively, THEN cast (not lexicographic)
    assert rows["age"]["min_s"] == "17" and rows["age"]["max_s"] == "210"
    assert rows["age"]["n_nulls"] == 1
    assert rows["name"]["len_sum"] == 3 * 5  # five 3-char names
    assert rows["id"]["len_sum"] is None  # non-string column


def test_profile_approx_swaps_distinct_only(spark, people):
    exact = {r["col_name"]: r for r in profile(people).collect()}
    approx = {r["col_name"]: r for r in profile(people, approx=True).collect()}
    for c in exact:
        assert approx[c]["n_rows"] == exact[c]["n_rows"]
        assert approx[c]["n_nulls"] == exact[c]["n_nulls"]
        # HLL at this cardinality is exact in practice, but only bound it
        assert abs(approx[c]["n_distinct"] - exact[c]["n_distinct"]) <= 1


def test_suggest_rules_roundtrip(spark, people):
    rules = suggest_rules([r.asDict() for r in profile(people).collect()])
    kinds = {(r["rule"], r["column"]) for r in rules}
    assert ("not_null", "id") in kinds
    assert ("unique", "name") in kinds  # 5 distinct non-null of 5 non-null
    assert ("unique", "id") not in kinds  # duplicate id=4
    # suggested rules must run cleanly through the engine
    out = run_checks(people, rules).collect()
    assert all(r["violations"] >= 0 for r in out)
