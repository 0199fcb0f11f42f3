"""Property tests for the merge-on-read and CDC layers: random
delete/merge/compact scripts keep the DV-aware snapshot equal to a
pure-Python dict replay (and every CDF span equal to the dict diff);
random CDC event streams under random batching keep the tombstone
apply equal to per-key argmax and the physical apply equal to the
sequential fold model."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.prop_profile import prop_examples
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.acid import AcidTable
from data_pipeline_platform_spark.sinks.cdc import apply_changes, read_current

SETTINGS = settings(
    max_examples=prop_examples(8),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# a DV/merge script: each step is one of
#   ("dv", m, r)      delete k % m == r, mode=dv
#   ("cow", m, r)     delete k % m == r, mode=cow
#   ("merge", [(k, v)])  upsert wave
#   ("compact",)      compact_small over everything
STEP = st.one_of(
    st.tuples(st.just("dv"), st.integers(2, 5), st.integers(0, 4)),
    st.tuples(st.just("cow"), st.integers(2, 5), st.integers(0, 4)),
    st.tuples(
        st.just("merge"),
        st.lists(
            st.tuples(st.integers(1, 40), st.integers(-99, 99)),
            min_size=1, max_size=5, unique_by=lambda t: t[0],
        ),
    ),
    st.tuples(st.just("compact")),
)


@pytest.mark.usefixtures("spark")
@given(script=st.lists(STEP, min_size=1, max_size=5))
@SETTINGS
def test_dv_scripts_match_dict_replay(spark, tmp_path_factory, script):
    tmp = tmp_path_factory.mktemp("dvprop")
    table = AcidTable(spark, str(tmp / "t"))
    df = spark.range(1, 31).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    table.write(df.repartition(3, "k"), stats_cols=["k"], binpack=False)
    state = {k: k * 3 for k in range(1, 31)}
    prev_state = dict(state)
    for step in script:
        v_before = table.latest_version()
        if step[0] == "dv":
            _, m, r = step
            table.delete(f"k % {m} = {r % m}", mode="dv")
            state = {k: v for k, v in state.items() if k % m != r % m}
        elif step[0] == "cow":
            _, m, r = step
            table.delete(f"k % {m} = {r % m}")
            state = {k: v for k, v in state.items() if k % m != r % m}
        elif step[0] == "merge":
            wave = step[1]
            table.merge(
                spark.createDataFrame(wave, "k long, v long"), keys=["k"]
            )
            state.update(dict(wave))
        else:
            table.compact_small(small_bytes=1 << 30)
        got = {r2["k"]: r2["v"] for r2 in table.read().collect()}
        assert got == state, f"after {step}"
        # the CDF span over this step equals the dict diff
        v_after = table.latest_version()
        if v_after > v_before and (state != prev_state):
            feed = table.changes(["k"], v_from=v_before, v_to=v_after)
            dels = {r2["k"] for r2 in feed.collect()
                    if r2["change_type"] == "delete"}
            ins = {r2["k"] for r2 in feed.collect()
                    if r2["change_type"] == "insert"}
            assert dels == set(prev_state) - set(state)
            assert ins == set(state) - set(prev_state)
        prev_state = dict(state)


EVENTS = st.lists(
    st.tuples(
        st.integers(1, 6),            # key
        st.integers(1, 12),           # seq
        st.sampled_from(["U", "D"]),  # op
        st.integers(-50, 50),         # payload
    ),
    min_size=1,
    max_size=14,
    unique_by=lambda e: (e[0], e[1], e[2]),
)


def _winner(events):
    """Per-key argmax by (seq, delete-beats-upsert); None = absent."""
    best = {}
    for k, seq, op, v in events:
        cur = best.get(k)
        cand = (seq, 1 if op == "D" else 0, op, v)
        if cur is None or cand[:2] > cur[:2]:
            best[k] = cand
    return {
        k: (seq, op, v)
        for k, (seq, _, op, v) in best.items()
        if op != "D"
    }


@pytest.mark.usefixtures("spark")
@given(events=EVENTS, cuts=st.lists(st.integers(1, 13), max_size=3))
@SETTINGS
def test_cdc_tombstones_equal_argmax_under_any_batching(
    spark, tmp_path_factory, events, cuts
):
    # same-key same-seq U+D pairs are legal (delete wins the tie); but
    # drop payload-ambiguous duplicates the strict check would refuse
    tmp = tmp_path_factory.mktemp("cdcprop")
    table = AcidTable(spark, str(tmp / "t"))
    bounds = sorted({0, len(events)} | {min(c, len(events)) for c in cuts})
    batches = [
        events[a:b] for a, b in zip(bounds, bounds[1:]) if events[a:b]
    ]
    for batch in batches:
        apply_changes(
            table,
            spark.createDataFrame(
                batch, "k long, seq long, op string, v long"
            ),
            keys=["k"], sequence_by="seq", tombstones=True,
        )
    got = {
        r["k"]: (r["seq"], r["op"], r["v"])
        for r in read_current(table).collect()
    }
    assert got == _winner(events)


def _physical_fold(batches):
    """Sequential model of physical-delete apply_changes."""
    state = {}
    for batch in batches:
        winners = {}
        for k, seq, op, v in batch:
            cur = winners.get(k)
            cand = (seq, 1 if op == "D" else 0, op, v)
            if cur is None or cand[:2] > cur[:2]:
                winners[k] = cand
        for k, (seq, _, op, v) in winners.items():
            if k in state:
                if seq >= state[k][0]:
                    if op == "D":
                        state.pop(k)
                    else:
                        state[k] = (seq, op, v)
            elif op != "D":
                state[k] = (seq, op, v)
    return state


@pytest.mark.usefixtures("spark")
@given(events=EVENTS, cuts=st.lists(st.integers(1, 13), max_size=3))
@SETTINGS
def test_cdc_physical_equals_sequential_fold_model(
    spark, tmp_path_factory, events, cuts
):
    tmp = tmp_path_factory.mktemp("cdcphys")
    table = AcidTable(spark, str(tmp / "t"))
    bounds = sorted({0, len(events)} | {min(c, len(events)) for c in cuts})
    batches = [
        events[a:b] for a, b in zip(bounds, bounds[1:]) if events[a:b]
    ]
    applied = []
    for batch in batches:
        applied.append(batch)
        apply_changes(
            table,
            spark.createDataFrame(
                batch, "k long, seq long, op string, v long"
            ),
            keys=["k"], sequence_by="seq",
        )
    want = _physical_fold(applied)
    try:
        got = {
            r["k"]: (r["seq"], r["op"], r["v"])
            for r in table.read().collect()
        }
    except FileNotFoundError:
        got = {}
    assert got == want
