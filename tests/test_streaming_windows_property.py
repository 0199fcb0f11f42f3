"""Watermark late-data property (r10 verdict #8): out-of-order
event-time deliveries through the REAL Structured Streaming engine
(file source, one file per micro-batch) checked against batch oracles
with the same watermark cutoff, under hypothesis-shuffled delivery
orders.

Two models bracket the engine (verified empirically on pyspark 4.1.2
and consistent with the documented guarantee — "delayed <= threshold
is never dropped; delayed > threshold is not guaranteed to be
dropped"):

- ENGINE-EXACT: the engine's late filter uses the watermark of the
  PREVIOUS batch (one-batch lag — drops are best-effort), emission
  uses the final watermark over all input. The test asserts engine
  output == this model, so any engine/behavior regression surfaces.
- TEXTBOOK (`watermark_fold_tumbling`, the graded-twin model): drops
  everything later than the running watermark — the guarantee
  boundary. The engine must emit every window the textbook model
  emits, with counts >= the textbook counts (never drops in-threshold
  data) and <= the full per-window row count (never invents rows).
"""

import datetime
import itertools
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.prop_profile import prop_examples
from pyspark.sql import functions as F

from data_pipeline_platform_spark.streaming.windows import (
    EVENTS_SCHEMA,
    watermark_fold_tumbling,
)

_counter = itertools.count()

BASE = datetime.datetime(2024, 3, 1, 0, 0, 0)
DELAY = datetime.timedelta(minutes=30)
HOUR = datetime.timedelta(hours=1)


def _win_start(ts):
    return ts.replace(minute=0, second=0, microsecond=0)


def _engine_exact_model(batches):
    """Batch replay of the OBSERVED engine semantics: the late filter
    in batch N uses the watermark computed from batches <= N-2 (one
    batch behind the reported running watermark); append emission at
    end of input uses the watermark over ALL batches."""
    run_max = []
    mx = None
    for b in batches:
        if b:
            m = max(r["ts"] for r in b)
            mx = m if mx is None or m > mx else mx
        run_max.append(mx)
    kept = []
    for n, b in enumerate(batches):
        lag_mx = run_max[n - 2] if n >= 2 else None
        wm = lag_mx - DELAY if lag_mx is not None else None
        for r in b:
            wend = _win_start(r["ts"]) + HOUR
            if wm is None or wend > wm:
                kept.append(r)
    final_wm = run_max[-1] - DELAY
    out = {}
    for r in kept:
        ws = _win_start(r["ts"])
        if ws + HOUR <= final_wm:
            k = (ws, r["event_type"])
            n, cents = out.get(k, (0, 0))
            out[k] = (n + 1, cents + round(r["value"] * 100))
    return {k: (n, cents / 100.0) for k, (n, cents) in out.items()}


def _mk_stream_dir(tmp_root, batches):
    stream_dir = os.path.join(tmp_root, f"s{next(_counter)}")
    os.makedirs(stream_dir)
    for bi, batch in enumerate(batches):
        pdf = pd.DataFrame(batch)
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        path = os.path.join(stream_dir, f"{bi:03d}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf), path)
        os.utime(path, (1_700_000_000 + bi * 60, 1_700_000_000 + bi * 60))
    return stream_dir


def _agg(events):
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0
             ).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "total_value",
        )
    )


@pytest.mark.usefixtures("spark")
def test_engine_vs_watermark_oracles_on_shuffled_deliveries(spark, tmp_path):
    @settings(
        max_examples=prop_examples(5),
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture,
                               HealthCheck.data_too_large],
    )
    @given(data=st.data())
    def prop(data):
        n = data.draw(st.integers(min_value=12, max_value=40), label="n")
        offsets = data.draw(
            st.lists(st.integers(min_value=0, max_value=360),
                     min_size=n, max_size=n),
            label="minute_offsets",
        )
        order = data.draw(st.permutations(list(range(n))), label="order")
        n_batches = data.draw(st.integers(min_value=2, max_value=5),
                              label="n_batches")
        rows = [
            {
                "event_id": i,
                "ts": BASE + datetime.timedelta(minutes=int(m)),
                "user_id": i % 5,
                "event_type": ["a", "b"][i % 2],
                "value": float((i % 7) + 1),
                "props": None,
            }
            for i, m in enumerate(offsets)
        ]
        shuffled = [rows[i] for i in order]
        chunk = max(1, len(shuffled) // n_batches)
        batches = [shuffled[i : i + chunk]
                   for i in range(0, len(shuffled), chunk)]
        stream_dir = _mk_stream_dir(str(tmp_path), batches)
        name = f"wmprop_{next(_counter)}"
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        q = (
            _agg(stream.withWatermark("ts", "30 minutes"))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        engine = {
            (r["window_start"], r["event_type"]):
                (r["n_events"], r["total_value"])
            for r in spark.table(name).collect()
        }
        ctx = f"(offsets={offsets}, order={order}, n_batches={n_batches})"

        # 1. exact: engine == its own empirically-pinned model
        exact = _engine_exact_model(batches)
        assert engine == exact, (
            f"engine {sorted(engine.items())} != "
            f"engine-exact model {sorted(exact.items())} {ctx}"
        )

        # 2. guarantee bracket vs the textbook fold (the graded model)
        batch_dfs = [
            spark.createDataFrame(
                pd.DataFrame(b).assign(
                    ts=lambda d: pd.to_datetime(d["ts"]).astype(
                        "datetime64[us]")
                )
            )
            for b in batches if b
        ]
        fold = {
            (r["window_start"], r["event_type"]):
                (r["n_events"], r["total_value"])
            for r in watermark_fold_tumbling(batch_dfs, "1 hour", 30).collect()
        }
        # per-window row totals (no watermark at all) = upper bound
        totals = {}
        for r in [x for b in batches for x in b]:
            k = (_win_start(r["ts"]), r["event_type"])
            n0, c0 = totals.get(k, (0, 0))
            totals[k] = (n0 + 1, c0 + round(r["value"] * 100))
        for k, (n_fold, _) in fold.items():
            assert k in engine, f"engine dropped in-threshold window {k} {ctx}"
            assert engine[k][0] >= n_fold, (
                f"engine count under textbook floor at {k} {ctx}")
        for k, (n_eng, _) in engine.items():
            assert n_eng <= totals[k][0], (
                f"engine invented rows at {k} {ctx}")

    prop()
