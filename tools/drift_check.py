#!/usr/bin/env python
"""Testdata drift preflight: compare every table's parquet schema (and
key row counts) against the FIXTURES.md contract WITHOUT starting Spark.

Why this exists: the driver-regenerated testdata has shipped the same
logical columns under different parquet encodings across rounds
(events.ts: nanos-as-long -> TIMESTAMP_NTZ; the undetected switch
crashed an entire bench round). `load_table` absorbs known drifts; this
tool is the early-warning for NEW ones — run it first thing each round:

    python tools/drift_check.py            # all three SFs
    python tools/drift_check.py sf0.01     # one SF

Exit 0 = contract holds (possibly via a known, absorbed encoding);
exit 1 = a table/column diverges in a way load_table may not handle.
"""

from __future__ import annotations

import sys

import pyarrow.parquet as pq

# column -> acceptable parquet arrow types (str prefixes). Timestamp
# columns accept every encoding load_table normalizes: readers.py
# _TS_CONTRACT lists exactly the columns below (events.ts,
# orders.o_orderdate, lineitem.l_shipdate), and for each of them
# load_table sets nanosAsLong + _normalize_contract folds long-nanos /
# NTZ back to a microsecond timestamp — so accepting ns/int64 here is
# backed by real normalization for every TS column, not just events.ts
# (r6, closing the ADVICE gap where a nanos orders refresh would pass
# this preflight yet crash at read time).
TS = ("timestamp[us]", "timestamp[ns]", "timestamp[ms]", "int64")
CONTRACT = {
    "region": {"r_regionkey": ("int32", "int64"), "r_name": ("string",)},
    "nation": {"n_nationkey": ("int32", "int64"), "n_name": ("string",)},
    "customer": {"c_custkey": ("int64",), "c_acctbal": ("double",), "c_mktsegment": ("string",)},
    "supplier": {"s_suppkey": ("int64",), "s_acctbal": ("double",)},
    "part": {"p_partkey": ("int64",), "p_retailprice": ("double",), "p_size": ("int32", "int64")},
    "orders": {"o_orderkey": ("int64",), "o_totalprice": ("double",), "o_orderdate": TS},
    "lineitem": {
        "l_orderkey": ("int64",),
        "l_quantity": ("double",),
        "l_extendedprice": ("double",),
        "l_shipdate": TS,
    },
    "events": {"event_id": ("int64",), "ts": TS, "value": ("double",), "props": ("string",)},
    "documents": {"doc_id": ("int64",), "text": ("string",), "n_chars": ("int64",)},
    "embeddings": {"vec_id": ("int64",), "embedding": ("list",), "label": ("int32", "int64")},
}


def check_sf(sf_dir: str) -> int:
    bad = 0
    for table, cols in CONTRACT.items():
        try:
            schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
        except Exception as exc:  # noqa: BLE001
            print(f"DRIFT {sf_dir}/{table}: unreadable ({exc})")
            bad += 1
            continue
        fields = {f.name: str(f.type) for f in schema}
        for col, accepted in cols.items():
            got = fields.get(col)
            if got is None:
                print(f"DRIFT {sf_dir}/{table}.{col}: column missing (have {sorted(fields)})")
                bad += 1
            elif not any(got.startswith(a) for a in accepted):
                print(f"DRIFT {sf_dir}/{table}.{col}: {got} not in {accepted}")
                bad += 1
    return bad


def main() -> int:
    sfs = sys.argv[1:] or ["sf0.001", "sf0.01", "sf0.1"]
    bad = 0
    for sf in sfs:
        d = sf if "/" in sf else f"/root/testdata/{sf}"
        n = check_sf(d)
        print(f"{d}: {'OK' if n == 0 else f'{n} drift(s)'}")
        bad += n
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
