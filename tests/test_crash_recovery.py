"""Crash-recovery property suite for the exactly-once family (r11
verdict #4): kill the writer at scheduled points around the
data-write/commit boundary, restart with fresh objects against the same
paths, re-deliver under hypothesis-chosen duplicate schedules, and
assert the final state equals the one-shot oracle.

The marker rides INSIDE the data commit (atomic together), so the crash
windows that matter are:
  pre_write    — nothing hit disk; redelivery must apply cleanly.
  mid_write    — data files staged, commit NOT published; the orphan
                 parquet files must stay invisible and redelivery must
                 apply cleanly (staging different file names).
  stage_leak   — the commit record was staged but the atomic link never
                 happened; the leaked .stage-* file must be inert.
  post_commit  — the commit published but the caller never learned
                 (process died before the ack); redelivery must SKIP
                 via the marker.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.prop_profile import prop_examples

from pyspark.sql import functions as F

CRASH_MODES = ("pre_write", "mid_write", "stage_leak", "post_commit")


def _boom(*a, **k):
    raise RuntimeError("simulated crash")


def _inject(table, mode):
    """Arm one crash on an AcidTable instance (the 'process' about to
    die); the caller restarts with a FRESH instance afterwards."""
    if mode == "pre_write":
        table.write = _boom
        table.merge = _boom
    elif mode == "mid_write":
        # write()/merge() stage data files first, then call _commit —
        # raising here models dying after the parquet hit disk but
        # before the version file published
        table._commit = _boom
    elif mode == "stage_leak":
        def leak(*a, **k):
            v = table.latest_version() + 1
            os.makedirs(table.log_dir, exist_ok=True)
            with open(table._version_file(v) + ".stage-crash", "w") as f:
                f.write('{"version":')  # torn stage, never linked
            raise RuntimeError("simulated crash")

        table._commit = leak
    elif mode == "post_commit":
        for name in ("write", "merge"):
            orig = getattr(table, name)

            def wrapped(*a, __orig=orig, **k):
                __orig(*a, **k)
                raise RuntimeError("simulated crash")

            setattr(table, name, wrapped)
    else:  # pragma: no cover
        raise ValueError(mode)


# ---------------------------------------------------------------------------
# IncrementalPacker
# ---------------------------------------------------------------------------

_DOCS = [(i, 1 + (i * 5) % 9) for i in range(9)]  # (doc_id, n_tokens)
_CAP = 7  # deliberately NOT a power of two (exercises the DIV fix)


def _docs_df(spark, lo, hi):
    rows = [r for r in _DOCS if lo <= r[0] < hi]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def _packer(spark, path):
    from data_pipeline_platform_spark.functions.packing import (
        IncrementalPacker,
    )

    return IncrementalPacker(spark, path, capacity=_CAP)


def _manifest_rows(spark, path):
    df = _packer(spark, path).manifest()
    return sorted(
        (r["doc_id"], r["global_offset"], r["first_bin"], r["last_bin"],
         r["n_bins"])
        for r in df.collect()
    )


@st.composite
def _pack_schedules(draw):
    # per batch: crash modes attempted before the clean delivery, then
    # duplicate redeliveries of any already-delivered batch
    return [
        (
            draw(st.lists(st.sampled_from(CRASH_MODES), max_size=2)),
            draw(st.lists(st.integers(0, b), max_size=2)),
        )
        for b in range(3)
    ]


@settings(
    max_examples=prop_examples(6),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sched=_pack_schedules())
def test_packer_crash_schedule_equals_one_shot(spark, sched):
    base = tempfile.mkdtemp(prefix="crashpack_")
    path = os.path.join(base, "manifest")
    for b, (crashes, dups) in enumerate(sched):
        lo, hi = 3 * b, 3 * b + 3
        committed = False
        for mode in crashes:
            p = _packer(spark, path)  # fresh 'process'
            _inject(p.table, mode)
            if committed:
                # marker short-circuits BEFORE the armed crash point:
                # the delivery is a replay no-op, nothing raises
                assert p.pack_batch(
                    _docs_df(spark, lo, hi), batch_id=b
                ) == {"batch_id": b, "replay": 1, "added": 0}
                continue
            with pytest.raises(RuntimeError):
                p.pack_batch(_docs_df(spark, lo, hi), batch_id=b)
            if mode == "post_commit":
                committed = True
        # restart + (re)deliver the batch for real
        stats = _packer(spark, path).pack_batch(
            _docs_df(spark, lo, hi), batch_id=b
        )
        if committed:
            assert stats == {"batch_id": b, "replay": 1, "added": 0}
        else:
            assert stats["added"] == 3 and stats["replay"] == 0
        for d in dups:  # duplicate redeliveries are always no-ops
            lo_d, hi_d = 3 * d, 3 * d + 3
            assert _packer(spark, path).pack_batch(
                _docs_df(spark, lo_d, hi_d), batch_id=d
            ) == {"batch_id": d, "replay": 1, "added": 0}

    oracle_path = os.path.join(base, "oneshot")
    _packer(spark, oracle_path).pack_batch(_docs_df(spark, 0, 9), batch_id=0)
    assert _manifest_rows(spark, path) == _manifest_rows(spark, oracle_path)


# ---------------------------------------------------------------------------
# CDC apply_changes (physical-delete mode — the marker-critical one)
# ---------------------------------------------------------------------------

_CDC_BATCHES = [
    [(1, 10, "U", "a"), (2, 11, "U", "b"), (3, 12, "U", "c")],
    [(2, 20, "D", None), (4, 21, "U", "d"), (1, 5, "U", "stale")],
    [(2, 30, "U", "reborn"), (3, 31, "D", None), (5, 32, "U", "e")],
]


def _cdc_df(spark, rows):
    return spark.createDataFrame(
        rows, "k long, seq long, op string, val string"
    )


def _apply(spark, path, batch_rows, batch_id, crash_mode=None):
    from data_pipeline_platform_spark.sinks.acid import AcidTable
    from data_pipeline_platform_spark.streaming.cdc_apply import (
        apply_cdc_batch,
    )

    table = AcidTable(spark, path)
    if crash_mode:
        _inject(table, crash_mode)
    return apply_cdc_batch(
        table, "crash-suite", _cdc_df(spark, batch_rows), batch_id,
        keys=["k"], sequence_by="seq",
    )


def _cdc_rows(spark, path):
    from data_pipeline_platform_spark.sinks.acid import AcidTable

    df = AcidTable(spark, path).read()
    return sorted(
        (r["k"], r["seq"], r["op"], r["val"]) for r in df.collect()
    )


@st.composite
def _cdc_schedules(draw):
    return [
        (
            draw(st.lists(st.sampled_from(CRASH_MODES), max_size=2)),
            draw(st.lists(st.integers(0, b), max_size=2)),
        )
        for b in range(len(_CDC_BATCHES))
    ]


@settings(
    max_examples=prop_examples(6),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sched=_cdc_schedules())
def test_cdc_apply_crash_schedule_equals_one_shot(spark, sched):
    base = tempfile.mkdtemp(prefix="crashcdc_")
    path = os.path.join(base, "t")
    for b, (crashes, dups) in enumerate(sched):
        committed = False
        for mode in crashes:
            if committed:
                # marker short-circuits before the armed crash point
                assert _apply(
                    spark, path, _CDC_BATCHES[b], b, crash_mode=mode
                ) is False
                continue
            with pytest.raises(RuntimeError):
                _apply(spark, path, _CDC_BATCHES[b], b, crash_mode=mode)
            if mode == "post_commit":
                committed = True
        applied = _apply(spark, path, _CDC_BATCHES[b], b)
        # post_commit crash already folded the batch -> replay skips
        assert applied == (not committed)
        for d in dups:
            assert _apply(spark, path, _CDC_BATCHES[d], d) is False

    oracle_path = os.path.join(base, "oneshot")
    for b, rows in enumerate(_CDC_BATCHES):
        assert _apply(spark, oracle_path, rows, b) is True
    assert _cdc_rows(spark, path) == _cdc_rows(spark, oracle_path)


# ---------------------------------------------------------------------------
# deterministic: leaked stage files are inert
# ---------------------------------------------------------------------------

def test_leaked_stage_file_is_inert(spark, tmp_path):
    """A crash between commit staging and the atomic link leaves a
    .stage-* file next to the log; it must affect neither
    latest_version nor reads nor the next commit."""
    from data_pipeline_platform_spark.sinks.acid import AcidTable

    t = AcidTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, "a")], "id long, v string"))
    stray = t._version_file(t.latest_version() + 1) + ".stage-crash"
    with open(stray, "w") as f:
        f.write('{"version":')  # torn JSON
    assert t.latest_version() == 1
    assert t.read().count() == 1
    t.write(
        spark.createDataFrame([(2, "b")], "id long, v string"),
        mode="append",
    )
    assert t.latest_version() == 2
    assert t.read().count() == 2


# ---------------------------------------------------------------------------
# IncrementalLineCleaner (two stores: lines AcidTable + census fold)
# ---------------------------------------------------------------------------

_LINE_DOCS = 9  # 3 batches of 3 docs; boilerplate spans all batches


def _cleaner(spark, base):
    from data_pipeline_platform_spark.streaming.corpus import (
        IncrementalLineCleaner,
    )

    return IncrementalLineCleaner(
        spark, os.path.join(base, "lines"), os.path.join(base, "census")
    )


def _line_rows(spark, lo, hi):
    rows = []
    for d in range(lo, hi):
        rows.append(
            (d, 0, "shared boilerplate sentence appearing in every doc.")
        )
        rows.append(
            (d, 1, f"unique content line {d} with several words in it.")
        )
    return spark.createDataFrame(rows, "doc_id long, line_no int, line string")


def _cleaner_state(spark, base):
    c = _cleaner(spark, base)
    return sorted(
        tuple(r) for r in c.summaries().select(
            "doc_id", "n_lines", "n_kept", "n_dropped_rules",
            "n_dropped_dup", "clean_text",
        ).collect()
    )


@st.composite
def _cleaner_schedules(draw):
    # per batch: (target store, crash mode) attempts before the clean
    # delivery, then duplicate redeliveries of already-delivered batches
    return [
        (
            draw(st.lists(
                st.tuples(st.sampled_from(("lines", "census")),
                          st.sampled_from(CRASH_MODES)),
                max_size=2,
            )),
            draw(st.lists(st.integers(0, b), max_size=1)),
        )
        for b in range(3)
    ]


@settings(
    max_examples=prop_examples(5),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sched=_cleaner_schedules())
def test_line_cleaner_crash_schedule_equals_one_shot(spark, sched):
    """The cleaner's two commits (lines append, census fold) are
    marker-guarded independently: any crash schedule over either store,
    followed by restarts and duplicate redeliveries, must converge to
    the one-shot clean_lines_c4 summary."""
    base = tempfile.mkdtemp(prefix="crashclean_")
    for b, (crashes, dups) in enumerate(sched):
        lo, hi = 3 * b, 3 * b + 3
        lines_done = census_done = False
        for target, mode in crashes:
            c = _cleaner(spark, base)  # fresh 'process'
            table = c.lines if target == "lines" else c.census.acid
            _inject(table, mode)
            # the armed commit is reached unless its marker already
            # skips it (census pre_write patches acid.write/.merge,
            # which MaterializedAgg.update calls — still reachable)
            armed_reachable = (
                (target == "lines" and not lines_done)
                or (target == "census" and not census_done)
            )
            if not armed_reachable:
                # the armed commit already happened: marker skips it
                # BEFORE the crash point; the OTHER store may complete
                stats = c.process_batch(_line_rows(spark, lo, hi), b)
                lines_done = lines_done or stats["appended"]
                census_done = census_done or stats["folded"]
                continue
            with pytest.raises(RuntimeError):
                c.process_batch(_line_rows(spark, lo, hi), b)
            if target == "lines":
                # census fold never ran (exception before it)
                lines_done = mode == "post_commit"
            else:
                # lines commit precedes the census fold: it completed
                # unless it was already done
                lines_done = True
                census_done = mode == "post_commit"
        # restart + clean delivery
        stats = _cleaner(spark, base).process_batch(
            _line_rows(spark, lo, hi), b
        )
        assert stats["appended"] == (not lines_done)
        assert stats["folded"] == (not census_done)
        for d in dups:
            s = _cleaner(spark, base).process_batch(
                _line_rows(spark, 3 * d, 3 * d + 3), d
            )
            assert not s["appended"] and not s["folded"]

    oracle_base = tempfile.mkdtemp(prefix="crashclean_oracle_")
    _cleaner(spark, oracle_base).process_batch(
        _line_rows(spark, 0, _LINE_DOCS), 0
    )
    assert _cleaner_state(spark, base) == _cleaner_state(spark, oracle_base)
