"""Property-based tests (hypothesis): the config-op compiler, schema
coercion, and upsert semantics checked against independent Python-side
models on randomized inputs. Beyond the reference's test strategy
(SURVEY.md §5 notes it has no property tests) — guards the quirk
semantics we promised to preserve."""

import math

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from tests.prop_profile import prop_examples

from data_pipeline_platform_spark.operators.config_transformer import ConfigTransformer

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-1000, max_value=1000),
        st.one_of(st.none(), st.text(alphabet="abcXYZ ", max_size=8)),
        st.one_of(st.none(), st.integers(min_value=0, max_value=100)),
    ),
    min_size=0,
    max_size=30,
)

SETTINGS = settings(
    max_examples=prop_examples(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, s string, v long")


@given(rows=ROWS, threshold=st.integers(min_value=-5, max_value=105))
@SETTINGS
def test_filter_gt_matches_python(spark, rows, threshold):
    out = ConfigTransformer().transform(
        _df(spark, rows), {"filter": {"v": {">": threshold}}}
    )
    expected = [r for r in rows if r[2] is not None and r[2] > threshold]
    assert out.count() == len(expected)


@given(rows=ROWS, needle=st.text(alphabet="abcXYZ", min_size=1, max_size=3))
@SETTINGS
def test_filter_contains_matches_python(spark, rows, needle):
    """contains: literal substring, NULLs fail the filter (pandas
    str.contains(na=False) parity)."""
    out = ConfigTransformer().transform(
        _df(spark, rows), {"filter": {"s": {"contains": needle}}}
    )
    expected = [r for r in rows if r[1] is not None and needle in r[1]]
    assert out.count() == len(expected)


@given(rows=ROWS, vals=st.lists(st.integers(-1000, 1000), max_size=4))
@SETTINGS
def test_filter_in_matches_python(spark, rows, vals):
    out = ConfigTransformer().transform(
        _df(spark, rows), {"filter": {"id": {"in": vals}}}
    )
    expected = [r for r in rows if r[0] in vals]
    assert out.count() == len(expected)


@given(rows=ROWS)
@SETTINGS
def test_map_recode_unmapped_null(spark, rows):
    mapping = {"abc": "M1", "XYZ": "M2"}
    out = ConfigTransformer().transform(
        _df(spark, rows),
        {"transformations": [{"type": "map", "column": "s", "mapping": mapping}]},
    )
    got = [r["s"] for r in out.orderBy("id", "v").collect()]
    expected = [
        mapping.get(r[1]) for r in sorted(rows, key=lambda r: (r[0], r[2] if r[2] is not None else -1))
    ]
    assert sorted(x or "" for x in got) == sorted(x or "" for x in expected)


@given(
    texts=st.lists(
        st.one_of(st.none(), st.text(alphabet="0123456789abc.-", max_size=8)),
        min_size=0,
        max_size=25,
    )
)
@SETTINGS
def test_schema_coercion_matches_python_float_parse(spark, texts):
    """CAST string->double with ANSI off == lenient float parse."""
    from data_pipeline_platform_spark.operators.schema import (
        ColumnSchema,
        SchemaDefinition,
        SchemaValidator,
    )

    df = spark.createDataFrame([(t,) for t in texts], "x string")
    schema = SchemaDefinition(
        name="s", columns=[ColumnSchema(name="x", dtype="double")]
    )
    got = [r["x"] for r in SchemaValidator().validate(df, schema).collect()]

    def pyparse(t):
        if t is None:
            return None
        try:
            v = float(t)
            return None if math.isinf(v) or math.isnan(v) else v
        except ValueError:
            return None

    expected = [pyparse(t) for t in texts]
    assert sorted((x is None, x) for x in got) == sorted((x is None, x) for x in expected)


@given(
    base=st.lists(st.tuples(st.integers(0, 8), st.integers(0, 100)), max_size=15),
    updates=st.lists(st.tuples(st.integers(0, 8), st.integers(0, 100)), min_size=1, max_size=15),
)
@SETTINGS
def test_upsert_matches_dict_replay(spark, tmp_path_factory, base, updates):
    """Join-rewrite UPSERT == sequential dict replay (last wins)."""
    from data_pipeline_platform_spark.sinks.writers import BatchWriter, WriteStrategy

    wh = str(tmp_path_factory.mktemp("wh"))
    writer = BatchWriter(spark, base_path=wh)
    base_unique = {}
    for k, v in base:
        base_unique[k] = v
    model = dict(base_unique)
    for k, v in updates:
        model[k] = v

    if base_unique:
        writer.write(
            spark.createDataFrame(list(base_unique.items()), "k long, v long"),
            "t",
            WriteStrategy.REPLACE,
        )
    writer.write(
        spark.createDataFrame(updates, "k long, v long"),
        "t",
        WriteStrategy.UPSERT,
        upsert_keys=["k"],
    )
    got = {r["k"]: r["v"] for r in writer.read_table("t").collect()}
    assert got == model


@given(
    lengths=st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=8)
)
@SETTINGS
def test_chunk_documents_invariants(spark, lengths):
    """For any token count: chunks cover every token exactly (no loss,
    no phantom), consecutive chunks overlap by exactly CHUNK_OVERLAP
    (when a successor exists), chunk ids are gapless from 0, and
    re-concatenating first chunk + post-overlap suffixes rebuilds the
    doc — checked against a pure-Python model of the window math."""
    from data_pipeline_platform_spark.functions.corpus import (
        CHUNK_OVERLAP,
        CHUNK_SIZE,
        CHUNK_STRIDE,
        chunk_documents,
    )

    rows = [
        (i, " ".join(f"d{i}t{j}" for j in range(1, n + 1)))
        for i, n in enumerate(lengths)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in chunk_documents(df).collect():
        got.setdefault(r["doc_id"], []).append(r)

    for doc_id, n in enumerate(lengths):
        toks = rows[doc_id][1].split(" ") if n else []
        # python model: starts 1, 1+stride, ... kept while first or
        # adding tokens beyond the previous chunk's overlap
        starts = [
            s
            for s in range(1, n + 1, CHUNK_STRIDE)
            if s == 1 or s + CHUNK_OVERLAP <= n
        ] if n else []
        chunks = sorted(got.get(doc_id, []), key=lambda r: r["chunk_id"])
        assert [c["chunk_id"] for c in chunks] == list(range(len(starts)))
        rebuilt = []
        for c, s in zip(chunks, starts):
            text_toks = c["chunk_text"].split(" ")
            assert text_toks == toks[s - 1 : s - 1 + CHUNK_SIZE]
            assert c["n_tokens"] == len(text_toks)
            rebuilt.extend(text_toks if not rebuilt else text_toks[CHUNK_OVERLAP:])
        assert rebuilt == toks[: len(rebuilt)]
        # total coverage: the union of chunk spans is exactly 1..n
        covered = set()
        for c, s in zip(chunks, starts):
            covered.update(range(s, s + c["n_tokens"]))
        assert covered == set(range(1, n + 1)) if n else not covered


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "dd", "eee"]), min_size=1, max_size=12),
        min_size=1,
        max_size=8,
    )
)
@SETTINGS
def test_repetition_fracs_match_python(spark, docs):
    """top_word_frac and dup_bigram_frac must equal a Python-side
    recomputation for arbitrary token sequences (including the
    single-token guard path)."""
    from collections import Counter

    from data_pipeline_platform_spark.functions.repetition import _with_repetition

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    out = {
        r["doc_id"]: r
        for r in _with_repetition(
            spark.createDataFrame(rows, "doc_id int, text string")
        ).collect()
    }
    for i, toks in enumerate(docs):
        r = out[i]
        c = Counter(toks)
        assert r["token_count"] == len(toks)
        assert r["top_word_count"] == max(c.values())
        assert r["top_word_frac"] == max(c.values()) / len(toks)
        if len(toks) >= 2:
            bi = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            assert r["dup_bigram_frac"] == (len(bi) - len(set(bi))) / len(bi)
        else:
            assert r["dup_bigram_frac"] == 0.0


@given(
    syms=st.lists(st.sampled_from(["a", "b", "ab", "x"]), min_size=1, max_size=10),
    pair=st.sampled_from([("a", "b"), ("a", "a"), ("b", "a"), ("x", "x")]),
)
@SETTINGS
def test_bpe_fold_matches_python_greedy(spark, syms, pair):
    """The Spark aggregate fold must equal the canonical greedy
    left-to-right BPE merge on arbitrary symbol sequences."""
    from data_pipeline_platform_spark.functions.bpe import _merge_fold_sql

    left, right = pair
    expected = []
    for s in syms:
        if expected and expected[-1] == left and s == right:
            expected[-1] = left + right
        else:
            expected.append(s)
    got = (
        spark.createDataFrame([(syms,)], "syms array<string>")
        .selectExpr(_merge_fold_sql(left, right) + " AS m")
        .collect()[0]["m"]
    )
    assert got == expected


@given(
    values=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=20,
    )
)
@SETTINGS
def test_ewma_halving_fold_is_exact(spark, values):
    """(v + acc) / 2 folds must be bit-identical to the python
    recurrence — division by two never rounds."""
    rows = [(i, float(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "i int, v double")
    got = (
        df.groupBy()
        .agg(
            # same shape as events_ewma: ordered struct array fold
            __import__("pyspark.sql.functions", fromlist=["expr"]).expr(
                "aggregate(slice(array_sort(collect_list(named_struct('i', i, 'v', v))), "
                "2, size(collect_list(v)) - 1), "
                "element_at(array_sort(collect_list(named_struct('i', i, 'v', v))), 1).v, "
                "(acc, e) -> (e.v + acc) / 2)"
            ).alias("ewma")
        )
        .collect()[0]["ewma"]
    )
    s = values[0]
    for v in values[1:]:
        s = (v + s) / 2
    assert got == s


@SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from("ab cd ef gh ij".split()), min_size=1, max_size=12),
        min_size=2,
        max_size=8,
    )
)
def test_dup_span_fraction_matches_bruteforce(spark, docs, tmp_path_factory):
    """dup_span_fraction vs a direct Python recomputation: mark every
    k-gram occurring >1 time corpus-wide, union its [s, s+K-1] token
    intervals per doc, compare counts exactly."""
    from data_pipeline_platform_spark.functions.substring import (
        DUP_K,
        q_dup_span_fraction,
    )

    tmp = tmp_path_factory.mktemp("dupspan")
    df = spark.createDataFrame(
        [(i, " ".join(toks), "en", "s", 1) for i, toks in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
        for r in q_dup_span_fraction(spark, str(tmp)).collect()
    }

    # brute force
    from collections import Counter

    grams = Counter()
    for toks in docs:
        for s in range(len(toks) - DUP_K + 1):
            grams[tuple(toks[s : s + DUP_K])] += 1
    for i, toks in enumerate(docs):
        covered = set()
        for s in range(len(toks) - DUP_K + 1):
            if grams[tuple(toks[s : s + DUP_K])] > 1:
                covered.update(range(s, s + DUP_K))
        assert got[i] == (len(toks), len(covered)), (i, toks)


@given(
    counts=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=48),
)
@SETTINGS
def test_cusum_closed_form_equals_textbook_recursion(spark, counts):
    """For ANY hourly count series, the window-algebra closed form
    P_t - min(min_prefix, 0) must equal the sequential recursion
    S_t = max(0, S_{t-1} + n*x_t - T)."""
    import datetime
    import tempfile

    from data_pipeline_platform_spark.functions.changepoint import (
        q_cusum_changepoints,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, t0 + datetime.timedelta(hours=h, minutes=1), 1, "t", 1.0, "{}"))
            eid += 1
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = sorted(
            q_cusum_changepoints(spark, d).collect(), key=lambda r: r["hour_start"]
        )
    nonzero = [c for c in counts if c > 0]
    n, total = len(nonzero), sum(nonzero)
    s = 0
    for r, c in zip(out, nonzero):
        s = max(0, s + n * c - total)
        assert r["cusum_scaled"] == s


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=6
    )
)
@SETTINGS
def test_char_entropy_bounds(spark, texts):
    """0 <= H <= log2(|alphabet|) + fixed-point slack, and H == 0 iff
    the text has at most one distinct character."""
    import tempfile

    from data_pipeline_platform_spark.functions.text import q_char_entropy

    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r["entropy_bits"] for r in q_char_entropy(spark, d).collect()}
    for i, t in enumerate(texts):
        h = out[i]
        assert -1e-6 <= h <= math.log2(3) + 1e-3
        if len(set(t)) <= 1:
            assert h == 0.0
        if len(set(t)) > 1:
            assert h > 0.0


@given(
    vals=st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=32),
        min_size=4,
        max_size=40,
    )
)
@SETTINGS
def test_winsorize_is_monotone_and_bounded(spark, vals):
    """The transform is monotone (order of values preserved), interior
    points pass through unchanged, and clipped points land exactly on
    a boundary shared with some interior value range. (NOT idempotence:
    re-winsorizing re-estimates tighter bounds by design.)"""
    import datetime
    import tempfile

    from data_pipeline_platform_spark.functions.changepoint import (
        q_winsorize_events,
    )

    t0 = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, t0, 1, "t", float(v), "{}") for i, v in enumerate(vals)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = sorted(q_winsorize_events(spark, d).collect(), key=lambda r: r["event_id"])
    # interior identity
    for r in out:
        if not r["clipped_low"] and not r["clipped_high"]:
            assert abs(r["winsorized"] - round(r["value"], 6)) < 2e-6
    # monotone in the original value
    by_val = sorted(zip([r["value"] for r in out], [r["winsorized"] for r in out]))
    for (v1, w1), (v2, w2) in zip(by_val, by_val[1:]):
        assert w1 <= w2 + 1e-9
    # all clipped-low rows share one boundary; same for clipped-high
    lows = {r["winsorized"] for r in out if r["clipped_low"]}
    highs = {r["winsorized"] for r in out if r["clipped_high"]}
    assert len(lows) <= 1 and len(highs) <= 1


BATCHES = st.lists(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d"]),
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=1,
        max_size=8,
    ),
    min_size=1,
    max_size=4,
)


@given(batches=BATCHES)
@settings(
    max_examples=prop_examples(8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_matview_fold_matches_one_shot(spark, tmp_path_factory, batches):
    """Incremental additive folds over ANY batch sequence equal the
    one-shot groupBy of the concatenation (count/sum/min/max)."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.sinks.matview import MaterializedAgg

    view = MaterializedAgg(
        spark,
        str(tmp_path_factory.mktemp("mv") / "t"),
        keys=["g"],
        aggs=[
            ("n", "count", ""),
            ("s", "sum", "x"),
            ("lo", "min", "x"),
            ("hi", "max", "x"),
        ],
    )
    for b in batches:
        view.update(spark.createDataFrame(b, "g string, x long"))
    got = {
        r["g"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in view.read().collect()
    }
    allrows = [r for b in batches for r in b]
    want = {}
    for g, x in allrows:
        n, s, lo, hi = want.get(g, (0, 0, None, None))
        want[g] = (
            n + 1,
            s + x,
            x if lo is None else min(lo, x),
            x if hi is None else max(hi, x),
        )
    assert got == want


DQ_ROWS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        st.one_of(st.none(), st.sampled_from(["US", "DE", "FR", "XX", "zz"])),
    ),
    min_size=0,
    max_size=25,
)


@given(rows=DQ_ROWS, lo=st.integers(-20, 0), hi=st.integers(1, 30))
@settings(
    max_examples=prop_examples(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dq_violation_counts_match_python(spark, rows, lo, hi):
    """run_checks violation counts equal an independent Python replay of
    the documented NULL semantics (content rules skip NULLs; expr counts
    not-TRUE; unique counts surplus non-null dupes)."""
    from data_pipeline_platform_spark.functions.dq import run_checks

    df = spark.createDataFrame(rows, "v long, c string")
    out = {
        (r["rule"], r["col_name"]): r["violations"]
        for r in run_checks(
            df,
            [
                {"rule": "not_null", "column": "v"},
                {"rule": "unique", "column": "v"},
                {"rule": "in_range", "column": "v", "min": lo, "max": hi},
                {"rule": "in_set", "column": "c", "values": ["US", "DE", "FR"]},
                {"rule": "expr", "expr": "v > 0"},
            ],
        ).collect()
    }
    vs = [v for v, _ in rows]
    cs = [c for _, c in rows]
    nn = [v for v in vs if v is not None]
    assert out[("not_null", "v")] == sum(1 for v in vs if v is None)
    assert out[("unique", "v")] == len(nn) - len(set(nn))
    assert out[("in_range", "v")] == sum(1 for v in nn if not (lo <= v <= hi))
    assert out[("in_set", "c")] == sum(
        1 for c in cs if c is not None and c not in ("US", "DE", "FR")
    )
    assert out[("expr", "v > 0")] == sum(1 for v in vs if not (v is not None and v > 0))


# --- r8: skyline / islands / interval-left vs python models ----------------

SKY_ROWS = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=1,
    max_size=25,
)


@given(pts=SKY_ROWS)
@SETTINGS
def test_skyline_census_matches_bruteforce_model(spark, pts):
    """The census-shaped skyline equals brute-force dominance for ANY
    point multiset (ties, duplicates, collinear runs included)."""
    from data_pipeline_platform_spark.functions.robust import q_skyline_parts

    rows = [(i, p / 100.0, s) for i, (p, s) in enumerate(pts)]
    import tempfile

    d = tempfile.mkdtemp(prefix="sky_prop_")
    spark.createDataFrame(
        rows, "p_partkey long, p_retailprice double, p_size int"
    ).write.mode("overwrite").parquet(f"{d}/part.parquet")
    got = {r["p_partkey"] for r in q_skyline_parts(spark, d).collect()}
    want = {
        i
        for i, (p, s) in enumerate(pts)
        if not any(
            q <= p and t <= s and (q < p or t < s) for (q, t) in pts
        )
    }
    assert got == want


@given(
    days=st.lists(st.integers(0, 20), min_size=1, max_size=15),
)
@SETTINGS
def test_gap_islands_match_python_model(spark, days):
    from data_pipeline_platform_spark.functions.robust import q_order_gap_islands

    import datetime
    import tempfile

    rows = [
        (1, datetime.datetime(1970, 1, 1) + datetime.timedelta(days=x))
        for x in days
    ]
    d = tempfile.mkdtemp(prefix="isl_prop_")
    spark.createDataFrame(rows, "o_custkey long, o_orderdate timestamp").write.mode(
        "overwrite"
    ).parquet(f"{d}/orders.parquet")
    uniq = sorted(set(days))
    islands = []
    run = [uniq[0]]
    for x in uniq[1:]:
        if x == run[-1] + 1:
            run.append(x)
        else:
            islands.append(run)
            run = [x]
    islands.append(run)
    longest = max(len(r) for r in islands)
    out = q_order_gap_islands(spark, d).collect()
    if longest < 2:
        assert out == []
    else:
        r = out[0]
        assert (r["n_islands"], r["longest_streak"], r["active_days"]) == (
            len(islands), longest, len(uniq),
        )


@given(
    points=st.lists(st.integers(0, 30), min_size=1, max_size=12),
    ivs=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 10)), max_size=8
    ),
    bin_size=st.integers(1, 7),
)
@SETTINGS
def test_interval_join_left_matches_nested_loop_model(spark, points, ivs, bin_size):
    from data_pipeline_platform_spark.functions.intervals import interval_join

    pts = spark.createDataFrame([(p,) for p in points], "p long")
    intervals = spark.createDataFrame(
        [(s, s + w, i) for i, (s, w) in enumerate(ivs)],
        "s long, e long, iv long",
    )
    out = interval_join(pts, intervals, "p", "s", "e", bin_size, how="left")
    got = sorted((r["p"], r["iv"]) for r in out.collect())
    want = []
    for p in points:
        hits = [i for i, (s, w) in enumerate(ivs) if s <= p <= s + w]
        want += [(p, i) for i in hits] or [(p, None)]
    assert got == sorted(want, key=lambda t: (t[0], t[1] if t[1] is not None else -1))


# --------------------------------------------------------------------------
# fold algebra under RANDOM operation sequences: after every bronze
# commit + fold, the count/sum/min/max silver state must equal the
# one-shot groupBy over the live bronze snapshot — the invariant the
# medallion graded queries check on one fixed script, here checked on
# hypothesis-generated scripts (updates that move extremes, deletes of
# extreme holders, inserts, no-op deletes, repeated keys).
_CDF_ROW = st.tuples(
    st.integers(min_value=1, max_value=9),            # key
    st.sampled_from(["a", "b", None]),                # group (incl. NULL)
    st.integers(min_value=-40, max_value=40),         # value
)
_CDF_OP = st.tuples(
    st.sampled_from(["upsert", "delete"]),
    st.lists(_CDF_ROW, min_size=1, max_size=4, unique_by=lambda r: r[0]),
)


@given(
    base=st.lists(_CDF_ROW, min_size=1, max_size=6, unique_by=lambda r: r[0]),
    ops=st.lists(_CDF_OP, min_size=1, max_size=3),
)
@settings(
    max_examples=prop_examples(6),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_minmax_cdf_fold_matches_oneshot_under_random_ops(
    spark, tmp_path_factory, base, ops
):
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.sinks.acid import AcidTable
    from data_pipeline_platform_spark.sinks.matview import MaterializedAgg
    from data_pipeline_platform_spark.streaming.cdf import ChangeFeedConsumer

    tmp = tmp_path_factory.mktemp("cdfprop")
    bronze = AcidTable(spark, str(tmp / "b"))
    view = MaterializedAgg(
        spark, str(tmp / "s"), keys=["g"],
        aggs=[("n", "count", ""), ("s", "sum", "x"),
              ("lo", "min", "x"), ("hi", "max", "x")],
    )
    consumer = ChangeFeedConsumer(bronze, ["k"], view, count_col="n")

    def frame(rows):
        return spark.createDataFrame(rows, "k long, g string, x long")

    def check():
        got = {
            r["g"]: (r["n"], r["s"], r["lo"], r["hi"])
            for r in consumer.state().collect()
        }
        try:
            snap = bronze.read()
        except FileNotFoundError:
            snap = None  # every row deleted: one-shot is the empty dict
        want = {} if snap is None else {
            r["g"]: (r["n"], r["s"], r["lo"], r["hi"])
            for r in snap.groupBy("g").agg(
                F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"),
                F.min("x").alias("lo"), F.max("x").alias("hi"),
            ).collect()
        }
        assert got == want

    bronze.write(frame(base), stats_cols=["k"])
    consumer.process_available()
    check()
    for kind, rows in ops:
        bronze.merge(frame(rows), keys=["k"], delete_matched=(kind == "delete"))
        out = consumer.process_available()
        if not out.get("metadata_only"):  # delete matching nothing
            check()
    check()


# --------------------------------------------------------------------------
# join-view maintenance under RANDOM scripts: bronze upserts/deletes
# and dimension renames/deletes/re-inserts interleave; after every
# fold the LEFT join view must equal the one-shot bronze ⋈ dim of the
# LIVE snapshots.
_JV_FACT = st.tuples(
    st.integers(min_value=1, max_value=8),   # row key
    st.integers(min_value=1, max_value=5),   # join key (dim has 1..3)
    st.integers(min_value=0, max_value=99),  # payload
)
_JV_OP = st.one_of(
    st.tuples(st.just("fact_upsert"),
              st.lists(_JV_FACT, min_size=1, max_size=3, unique_by=lambda r: r[0])),
    st.tuples(st.just("fact_delete"),
              st.lists(_JV_FACT, min_size=1, max_size=2, unique_by=lambda r: r[0])),
    st.tuples(st.just("dim_upsert"),
              st.lists(st.tuples(st.integers(1, 5), st.sampled_from(["X", "Y", "Z"])),
                       min_size=1, max_size=2, unique_by=lambda r: r[0])),
    st.tuples(st.just("dim_delete"),
              st.lists(st.tuples(st.integers(1, 5), st.just("_")),
                       min_size=1, max_size=2, unique_by=lambda r: r[0])),
)


@given(
    base=st.lists(_JV_FACT, min_size=1, max_size=5, unique_by=lambda r: r[0]),
    ops=st.lists(_JV_OP, min_size=1, max_size=3),
)
@settings(
    max_examples=prop_examples(6),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_join_view_matches_oneshot_under_random_churn(
    spark, tmp_path_factory, base, ops
):
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.sinks.acid import AcidTable
    from data_pipeline_platform_spark.sinks.joinview import MaterializedJoin
    from data_pipeline_platform_spark.streaming.cdf import ChangeFeedConsumer

    tmp = tmp_path_factory.mktemp("jvprop")
    bronze = AcidTable(spark, str(tmp / "b"))
    dim = AcidTable(spark, str(tmp / "d"))
    dim.write(
        spark.createDataFrame([(1, "A"), (2, "B"), (3, "C")], "c_id long, seg string"),
        stats_cols=["c_id"],
    )
    view = MaterializedJoin(
        spark, str(tmp / "v"), row_keys=["k"],
        dim=lambda: dim.read(), on=[("cust", "c_id")], how="left",
    )
    rows_c = ChangeFeedConsumer(bronze, ["k"], view)
    dim_c = ChangeFeedConsumer(dim, ["c_id"], view, dim_side=True)

    def facts(rows):
        return spark.createDataFrame(rows, "k long, cust long, x long")

    def dims(rows):
        return spark.createDataFrame(rows, "c_id long, seg string")

    def check():
        got = {
            r["k"]: (r["cust"], r["x"], r["seg"])
            for r in view.read().collect()
        }
        try:
            snap = bronze.read()
        except FileNotFoundError:
            assert got == {}
            return
        try:
            d = dim.read()
        except FileNotFoundError:
            d = dims([]).limit(0)
        want = {
            r["k"]: (r["cust"], r["x"], r["seg"])
            for r in snap.join(d, F.col("cust") == F.col("c_id"), "left").collect()
        }
        assert got == want

    bronze.write(facts(base), stats_cols=["k"])
    rows_c.process_available()
    # dim consumer baseline: the view already reflects dim v1
    view.acid._commit(
        view.acid.latest_version(), "DIM_BASELINE", [], [],
        meta={"stream_id": dim_c.stream_id, "batch_id": dim.latest_version()},
    )
    check()
    for kind, rows in ops:
        if kind == "fact_upsert":
            bronze.merge(facts(rows), keys=["k"])
        elif kind == "fact_delete":
            bronze.merge(facts(rows), keys=["k"], delete_matched=True)
        elif kind == "dim_upsert":
            dim.merge(dims(rows), keys=["c_id"])
        else:
            dim.merge(dims(rows), keys=["c_id"], delete_matched=True)
        rows_c.process_available()
        dim_c.process_available()
        check()


# --------------------------------------------------------------------------
# incremental-index batching invariance: for ANY partition of the
# corpus into ingestion batches, the accumulated near-dup pair set
# equals single-batch ingestion — the property that makes the
# persisted index trustworthy for daily feeds.
_DOC_WORDS = ["red", "blue", "fox", "dog", "run", "sky"]
_DOC = st.lists(st.sampled_from(_DOC_WORDS), min_size=3, max_size=8).map(" ".join)


@given(
    texts=st.lists(_DOC, min_size=2, max_size=10),
    assign=st.lists(st.integers(0, 2), min_size=10, max_size=10),
)
@settings(
    max_examples=prop_examples(6),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lsh_index_batching_invariance(spark, tmp_path_factory, texts, assign):
    from data_pipeline_platform_spark.functions.dedup_index import (
        IncrementalLshIndex,
    )

    tmp = tmp_path_factory.mktemp("lshprop")
    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    one = IncrementalLshIndex(spark, str(tmp / "i1"), str(tmp / "p1"))
    one.add_batch(df, batch_id=0)
    want = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in one.all_pairs().collect()
    }

    many = IncrementalLshIndex(spark, str(tmp / "i2"), str(tmp / "p2"))
    batches = [
        [d for i, d in enumerate(docs) if assign[i % len(assign)] == b]
        for b in range(3)
    ]
    bid = 0
    for rows in batches:
        if rows:
            many.add_batch(
                spark.createDataFrame(rows, "doc_id long, text string"), bid
            )
            bid += 1
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in many.all_pairs().collect()
    } if bid else {}
    assert got == want


# --------------------------------------------------------------------------
# fold algebra ACROSS A SCHEMA EVOLUTION: a random op prefix runs on the
# narrow schema, bronze then widens mid-script (merge_schema append of a
# new column y), and a random suffix churns the evolved table. After
# every fold the silver state — count/sum-x/sum-y/EXACT count-distinct-x
# — must equal the one-shot groupBy over the live bronze snapshot read
# at the evolved schema (pre-evolution rows surface y as NULL; SUM
# ignores them in both engines).
_EVO_ROW = st.tuples(
    st.integers(min_value=1, max_value=9),     # key (narrow era)
    st.sampled_from(["a", "b", None]),         # group (incl. NULL)
    st.integers(min_value=-9, max_value=9),    # x
)
_EVO_WIDE_ROW = st.tuples(
    st.integers(min_value=1, max_value=15),    # key (may collide or extend)
    st.sampled_from(["a", "b", None]),
    st.integers(min_value=-9, max_value=9),    # x
    st.integers(min_value=0, max_value=5),     # y (the evolved column)
)
_EVO_OP = st.tuples(
    st.sampled_from(["upsert", "delete"]),
    st.lists(_EVO_WIDE_ROW, min_size=1, max_size=3, unique_by=lambda r: r[0]),
)


@given(
    base=st.lists(_EVO_ROW, min_size=1, max_size=5, unique_by=lambda r: r[0]),
    widen=st.lists(
        _EVO_WIDE_ROW, min_size=1, max_size=3, unique_by=lambda r: r[0]
    ).map(lambda rows: [(k + 20, g, x, y) for k, g, x, y in rows]),
    ops=st.lists(_EVO_OP, min_size=1, max_size=3),
)
# the r9 falsifying example (nullable-SUM retraction): group 'a' has
# only NULL y (pre-evolution rows), an upsert gives it one non-NULL
# y=0, and the delete retracts it — the additive state reads 0 where
# SQL SUM over the remaining all-NULL group is NULL. Pinned forever.
@example(
    base=[(7, "b", -5), (1, "a", -9), (5, "a", -2), (2, "a", -2)],
    widen=[(21, None, 0, 0), (22, None, 0, 0), (23, None, 0, 0)],
    ops=[("upsert", [(6, "a", 0, 0)]), ("delete", [(6, "a", 0, 0)])],
)
@settings(
    # 24 (default-scaled to 8) rather than 50: at ~12.5s per example —
    # each example drives real multi-fold ACID churn through the
    # count_distinct recompute path — this single property was ~10% of
    # the whole suite's wall time (r14; the driver's verify window cut
    # off at ~63% in r13). DPPS_PROPERTY_FULL=1 restores depth locally.
    max_examples=prop_examples(24),
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fold_matches_oneshot_across_schema_evolution(
    spark, tmp_path_factory, base, widen, ops
):
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.sinks.acid import AcidTable
    from data_pipeline_platform_spark.sinks.matview import MaterializedAgg
    from data_pipeline_platform_spark.streaming.cdf import ChangeFeedConsumer

    tmp = tmp_path_factory.mktemp("evoprop")
    bronze = AcidTable(spark, str(tmp / "b"))
    view = MaterializedAgg(
        spark, str(tmp / "s"), keys=["g"],
        aggs=[("n", "count", ""), ("sx", "sum", "x"),
              ("sy", "sum", "y"), ("cd", "count_distinct", "x")],
    )

    def norm(df):
        if "y" not in df.columns:
            df = df.withColumn("y", F.lit(None).cast("long"))
        return df

    consumer = ChangeFeedConsumer(
        bronze, ["k"], view, count_col="n", feed_transform=norm
    )

    def check():
        got = {
            r["g"]: (r["n"], r["sx"], r["sy"], r["cd"])
            for r in consumer.state().collect()
        }
        try:
            snap = norm(bronze.read())
        except FileNotFoundError:
            snap = None
        want = {} if snap is None else {
            r["g"]: (r["n"], r["sx"], r["sy"], r["cd"])
            for r in snap.groupBy("g").agg(
                F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"),
                F.sum("y").alias("sy"),
                F.count_distinct("x").cast("bigint").alias("cd"),
            ).collect()
        }
        assert got == want

    bronze.write(
        spark.createDataFrame(base, "k long, g string, x long"),
        stats_cols=["k"],
    )
    consumer.process_available()
    check()
    bronze.write(
        spark.createDataFrame(widen, "k long, g string, x long, y long"),
        mode="append",
        merge_schema=True,
    )
    consumer.process_available()
    check()
    for kind, rows in ops:
        bronze.merge(
            spark.createDataFrame(rows, "k long, g string, x long, y long"),
            keys=["k"],
            delete_matched=(kind == "delete"),
        )
        out = consumer.process_available()
        if not out.get("metadata_only"):
            check()
    check()


# --------------------------------------------------------------------------
# multi-table txn under RANDOM interleavings: stages across two tables
# with randomly interleaved commit/abort/crash-recover decisions. The
# invariant: each table's visible state equals the replay of exactly
# the COMMITTED transactions' batches, in stage order — aborted and
# crashed-then-recovered txns contribute nothing, and the two tables
# always agree on which txns happened.
_TXN_SCRIPT = st.lists(
    st.tuples(
        st.sampled_from(["commit", "abort", "crash"]),  # decision
        st.integers(min_value=0, max_value=99),         # payload seed
        st.booleans(),                                  # stage into A?
        st.booleans(),                                  # stage into B?
    ),
    min_size=1,
    max_size=4,
)


@given(script=_TXN_SCRIPT)
@settings(
    max_examples=prop_examples(8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_txn_visible_state_equals_committed_replay(
    spark, tmp_path_factory, script
):
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.sinks.acid import AcidTable
    from data_pipeline_platform_spark.sinks.txn import MultiTableTxn

    tmp = tmp_path_factory.mktemp("txnprop")
    a = AcidTable(spark, str(tmp / "a"))
    b = AcidTable(spark, str(tmp / "b"))
    coord = str(tmp / "_txns")
    a.write(spark.createDataFrame([(0, -1)], "seq long, payload long"))
    b.write(spark.createDataFrame([(0, -1)], "seq long, payload long"))
    want_a, want_b = {0: -1}, {0: -1}
    for i, (decision, payload, into_a, into_b) in enumerate(script, start=1):
        if not (into_a or into_b):
            into_a = True  # empty txns are uninteresting
        MultiTableTxn.recover(coord, [a, b])  # heal any prior crash
        txn = MultiTableTxn(coord)
        row = [(i, payload)]
        if into_a:
            txn.stage_write(
                a,
                spark.createDataFrame(row, "seq long, payload long"),
                mode="append",
            )
        if into_b:
            txn.stage_write(
                b,
                spark.createDataFrame(row, "seq long, payload long"),
                mode="append",
            )
        if decision == "commit":
            txn.commit()
            if into_a:
                want_a[i] = payload
            if into_b:
                want_b[i] = payload
        elif decision == "abort":
            txn.abort()
        # "crash": leave undecided — the NEXT iteration's recover()
        # presumed-aborts it
    MultiTableTxn.recover(coord, [a, b])
    got_a = {r["seq"]: r["payload"] for r in a.read().collect()}
    got_b = {r["seq"]: r["payload"] for r in b.read().collect()}
    assert got_a == want_a
    assert got_b == want_b


# --------------------------------------------------------------------------
# Z-order compaction on RANDOM tables: content is bit-identical before
# and after, and footer stats cover every cluster column.
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),
            st.integers(min_value=-500, max_value=500),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=60,
    ),
    nfiles=st.integers(min_value=1, max_value=6),
)
@settings(
    max_examples=prop_examples(6),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_zorder_compaction_preserves_content(
    spark, tmp_path_factory, rows, nfiles
):
    from collections import Counter

    from data_pipeline_platform_spark.sinks.acid import AcidTable

    tmp = tmp_path_factory.mktemp("zprop")
    t = AcidTable(spark, str(tmp / "t"))
    t.write(
        spark.createDataFrame(rows, "a long, b long, v long").repartition(3),
        stats_cols=["a", "b"],
    )
    before = Counter(tuple(r) for r in t.read().collect())
    t.compact(target_files=nfiles, cluster_by=["a", "b"], zorder=True)
    after = Counter(tuple(r) for r in t.read().collect())
    assert after == before
    for action in t.snapshot_files():
        stats = action.get("stats") or {}
        assert "a" in stats and "b" in stats  # both dims prune-able


# --------------------------------------------------------------------------
# consistent-cut repair under RANDOM txn histories and RANDOM proposed
# cuts: the repaired cut (a) never tears a committed txn, (b) never
# exceeds the proposal, (c) is idempotent (repairing a repaired cut is
# a no-op).
@given(
    script=st.lists(
        st.tuples(
            st.booleans(),   # commit (True) or abort
            st.booleans(),   # stage into A
            st.booleans(),   # stage into B
        ),
        min_size=1,
        max_size=4,
    ),
    prop_seed=st.tuples(
        st.integers(min_value=0, max_value=10),
        st.integers(min_value=0, max_value=10),
    ),
)
@settings(
    max_examples=prop_examples(8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_consistent_cut_never_tears_and_is_idempotent(
    spark, tmp_path_factory, script, prop_seed
):
    import json as _json
    import os

    from data_pipeline_platform_spark.sinks.acid import AcidTable
    from data_pipeline_platform_spark.sinks.txn import MultiTableTxn

    tmp = tmp_path_factory.mktemp("cutprop")
    a = AcidTable(spark, str(tmp / "a"))
    b = AcidTable(spark, str(tmp / "b"))
    coord = str(tmp / "_txns")
    a.write(spark.createDataFrame([(0,)], "seq long"))
    b.write(spark.createDataFrame([(0,)], "seq long"))
    committed_txns = []
    for i, (commit, into_a, into_b) in enumerate(script, start=1):
        if not (into_a or into_b):
            into_a = True
        txn = MultiTableTxn(coord)
        if into_a:
            txn.stage_write(
                a, spark.createDataFrame([(i,)], "seq long"), mode="append"
            )
        if into_b:
            txn.stage_write(
                b, spark.createDataFrame([(i,)], "seq long"), mode="append"
            )
        if commit:
            txn.commit()
            committed_txns.append(txn.id)
        else:
            txn.abort()
    proposal = {
        a.path: min(prop_seed[0], a.latest_version()),
        b.path: min(prop_seed[1], b.latest_version()),
    }
    cut = MultiTableTxn.consistent_cut(coord, [a, b], at=dict(proposal))
    # (b) never exceeds the proposal
    assert all(cut[p] <= proposal[p] for p in cut)
    # (a) no committed txn is torn by the cut
    for txn_id in committed_txns:
        with open(os.path.join(coord, f"{txn_id}.committed")) as f:
            staged = _json.load(f)["staged"]
        states = [s["version"] <= cut[s["table"]] for s in staged]
        assert all(states) or not any(states), (cut, staged)
    # (c) idempotent
    assert MultiTableTxn.consistent_cut(coord, [a, b], at=dict(cut)) == cut


# --------------------------------------------------------------------------
# census derives vs DuckDB: the percentile_disc rank formula
# (max(1, ceil(p*n))) and the mode tie-break (smallest value among max
# counts) were pinned to DuckDB empirically (sinks/census.py) — this
# property test keeps them pinned across random censuses and random p,
# including the fp-fragile exact-boundary ranks (p*n integral).
_CENSUS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),                 # group
        st.integers(min_value=-5, max_value=5),      # value
        st.integers(min_value=1, max_value=4),       # multiplicity
    ),
    min_size=1,
    max_size=12,
)
_PS = st.sampled_from([0.0, 0.1, 0.25, 0.3, 0.5, 0.75, 0.9, 1.0])


@given(cells=_CENSUS, p=_PS)
@settings(
    max_examples=prop_examples(25),
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_census_derives_match_duckdb(spark, cells, p):
    import duckdb

    from data_pipeline_platform_spark.sinks.census import (
        census_median,
        census_mode,
        census_percentile,
    )

    # collapse duplicate (group, value) cells like a real census would
    agg: dict = {}
    for g, v, c in cells:
        agg[(g, v)] = agg.get((g, v), 0) + c
    rows = [(g, v, c) for (g, v), c in agg.items()]
    cen = spark.createDataFrame(rows, "g string, v long, n long")

    got_p = {
        r["g"]: (r["n"], r["pq"])
        for r in census_percentile(cen, p, out="pq").collect()
    }
    got_m = {
        r["g"]: r["med"] for r in census_median(cen, out="med").collect()
    }
    got_mode = {
        r["g"]: r["mo"] for r in census_mode(cen, out="mo").collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE expanded AS SELECT * FROM (VALUES "
        + ", ".join(f"('{g}', {v})" for g, v, c in rows for _ in range(c))
        + ") t(g, v)"
    )
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            f"""SELECT g, CAST(COUNT(*) AS BIGINT), quantile_disc(v, {p}),
                       median(v), mode(v ORDER BY v)
                FROM expanded GROUP BY g"""
        ).fetchall()
    }
    assert set(got_p) == set(want)
    for g, (n, qd, med, mo) in want.items():
        assert got_p[g] == (n, qd), (g, p, got_p[g], (n, qd))
        assert float(got_m[g]) == float(med), (g, got_m[g], med)
        assert got_mode[g] == mo, (g, got_mode[g], mo)
