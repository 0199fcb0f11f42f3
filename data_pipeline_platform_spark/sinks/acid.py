"""ACID lake-table layer: a Delta-style transaction log over parquet.

Closes SURVEY.md §7/M4's "lake-format MERGE" gap (reference UPSERT
semantics: src/pipeline/persistence/batch_writer.py:230-276 — INSERT ..
ON CONFLICT DO UPDATE: matched rows take every non-key column from the
source, unmatched rows insert). The staged-swap upsert in
``sinks/writers.py`` rewrites the WHOLE table per batch; at 100 TB the
deployment-grade carrier is a transaction log + copy-on-write MERGE
that rewrites only the data files the batch actually touches. Delta
Lake itself is not in this container, so the layer implements the same
publicly documented protocol shape (Armbrust et al., "Delta Lake:
High-Performance ACID Table Storage over Cloud Object Stores",
VLDB 2020) natively on PySpark + JSON commits:

Layout::

    table_dir/
      _log/00000000000000000001.json   one file per committed version
      part-<uuid>-<n>.parquet          immutable data files

Each commit file holds the full action list for that version:
``{"op": ..., "add": [{path, rows, stats}], "remove": [path, ...]}``.
A snapshot at version V = replay add/remove for versions 1..V; reads
never list the data directory (object-store LIST is not atomic — the
log is the source of truth). Time travel = replay to an older V.

ATOMICITY & ISOLATION: data files are written first (invisible until
referenced); the commit publishes by ``open(version_path, "x")`` — an
atomic create-if-absent, so exactly ONE writer wins a version; losers
re-read the new snapshot and retry (optimistic concurrency). Readers
always see a complete committed version or the previous one, never a
partial write. A crash between data-file write and commit leaves
orphan files that no snapshot references; ``vacuum`` removes them.

SCALE: MERGE prunes untouched files with parquet-footer min/max key
stats recorded in each add action (footer metadata only — no data
scan), joins the source only against rows of candidate files
(``_metadata.file_path`` maps rows to files), and rewrites just the
touched files. A 100-row merge into a 100 TB table rewrites a handful
of files, not the table.
"""

from __future__ import annotations

import errno
import json
import os
import time
import uuid
from typing import Any, Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG_DIR = "_log"
_DV_DIR = "_dv"
_VERSION_DIGITS = 20
#: write a full-state checkpoint every N commits so snapshot reads replay
#: O(interval) commits from the newest checkpoint instead of O(versions)
#: from genesis — the Delta checkpoint-parquet pattern (JSON here; the
#: content is the same live add-action set)
_CHECKPOINT_INTERVAL = 10


#: errnos meaning "this filesystem cannot hard-link" (FUSE/object-store
#: mounts) — anything else from os.link is a real error and propagates
_LINK_UNSUPPORTED_ERRNOS = frozenset(
    x for x in (
        errno.EPERM,
        errno.ENOSYS,
        errno.EXDEV,
        getattr(errno, "EOPNOTSUPP", None),
        getattr(errno, "ENOTSUP", None),
    ) if x is not None
)


def _fsync_dir(path: str) -> None:
    """Best-effort fsync of a DIRECTORY so a just-published entry name
    survives power failure. Some platforms/filesystems reject opening
    or fsyncing a directory — degrade silently (the entry bytes are
    already fsynced; only the name's durability window widens)."""
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    except OSError:
        pass
    finally:
        os.close(fd)


#: per-file bloom index geometry: 8192 bits = 1 KB hex in the JSON log
#: per (file, column); with k=3 and <=800 distinct values per file the
#: false-positive rate is ~1e-3 (false positives only COST a file scan,
#: they never change results)
_BLOOM_BITS = 8192
_BLOOM_K = 3


def _bloom_canonical(value) -> Optional[str]:
    """TYPE-STABLE canonical form hashed on both sides of the bloom.
    SQL `isin` matches 7 == 7.0 numerically, so an int probe against a
    DOUBLE column (or vice versa) must hash identically — integral
    floats collapse to the integer form. Returns None for types with
    no safe canonicalization (Decimal, bytes, dates...): the build side
    then records NO bloom for that file and the probe side never
    prunes — conservative in both directions, a wrong skip is
    impossible."""
    if isinstance(value, bool):
        return f"b:{value}"
    if isinstance(value, int):
        return f"n:{value}"
    if isinstance(value, float):
        if value == int(value) and abs(value) < 2**53:
            return f"n:{int(value)}"
        return f"f:{value!r}"
    if isinstance(value, str):
        return f"s:{value}"
    return None


def _bloom_positions(canon: str, m: int, k: int):
    """Deterministic double-hashed bit positions for a canonical form."""
    import hashlib

    h = hashlib.md5(canon.encode()).hexdigest()
    h1 = int(h[:16], 16)
    h2 = int(h[16:], 16) | 1
    return [(h1 + i * h2) % m for i in range(k)]


def _build_bloom(values, m: int = _BLOOM_BITS, k: int = _BLOOM_K):
    """Bloom dict {m, k, bits(hex)} over ``values``, or None when empty,
    SATURATED (set bits would exceed m/2 — a saturated filter passes
    everything, so recording it would be log bytes for zero pruning),
    or ANY value has no canonical form (a partial bloom would wrongly
    skip probes of the uncanonicalizable values)."""
    if not values or len(values) * k > m // 2:
        return None
    canons = [_bloom_canonical(v) for v in values]
    if any(c is None for c in canons):
        return None
    bits = bytearray(m // 8)
    for c in canons:
        for pos in _bloom_positions(c, m, k):
            bits[pos >> 3] |= 1 << (pos & 7)
    return {"m": m, "k": k, "bits": bits.hex()}


def _bloom_might_contain(bloom: Dict[str, Any], value) -> bool:
    canon = _bloom_canonical(value)
    if canon is None:
        return True  # unprobeable type: never prune on it
    bits = bytes.fromhex(bloom["bits"])
    for pos in _bloom_positions(canon, bloom["m"], bloom["k"]):
        if not bits[pos >> 3] & (1 << (pos & 7)):
            return False
    return True


class CommitConflictError(RuntimeError):
    """Another writer committed this version first (caller may retry on
    a fresh snapshot)."""


class CommitGuardFailed(RuntimeError):
    """A ``commit_guard`` precondition no longer holds — the write was
    NOT committed. Used for exactly-once idempotence under CONCURRENT
    duplicate deliveries (streaming/matview.py): the guard re-checks
    the progress marker inside the OCC retry loop, where a competing
    fold of the same batch surfaces as a conflict-then-recheck instead
    of a double-count."""


class ConstraintViolationError(ValueError):
    """An incoming batch (or, at ADD CONSTRAINT time, the existing
    snapshot) violates a table CHECK constraint."""


class SchemaMismatchError(ValueError):
    """An incoming batch's schema is incompatible with the table schema
    (type conflict, or new columns without ``merge_schema=True``)."""


class TxnPendingError(RuntimeError):
    """The table's newest commit belongs to an unresolved multi-table
    transaction; no commit can land on top until the coordinator
    resolves it (commit/abort/recover)."""


class AcidTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        self.log_dir = os.path.join(self.path, _LOG_DIR)

    # ------------------------------------------------------------------
    # log primitives
    # ------------------------------------------------------------------
    def _version_file(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:0{_VERSION_DIGITS}d}.json")

    def latest_version(self) -> int:
        if not os.path.isdir(self.log_dir):
            return 0
        versions = [
            int(f[:-5])
            for f in os.listdir(self.log_dir)
            if f.endswith(".json") and f[:-5].isdigit()
        ]
        return max(versions, default=0)

    def exists(self) -> bool:
        return self.latest_version() > 0

    def _read_commit(self, version: int) -> Dict[str, Any]:
        with open(self._version_file(version)) as f:
            return json.load(f)

    def _commit(
        self,
        expected_base: int,
        op: str,
        add: Sequence[Dict[str, Any]],
        remove: Sequence[str],
        meta: Optional[Dict[str, Any]] = None,
        schema=None,
        txn: Optional[Dict[str, str]] = None,
    ) -> int:
        """Atomically publish version expected_base+1. Raises
        CommitConflictError if someone else won the version slot.
        ``schema`` (a StructType) records the table schema AS OF this
        version in the log itself (the Delta metaData-action role):
        readers pin scans to it, so files written before a column was
        added surface the column as NULL instead of the first-file
        schema winning silently.
        ``txn`` ({id, status_dir}): this commit belongs to a multi-table
        transaction — it reserves the version slot but stays INVISIBLE
        to every read until the coordinator's committed marker exists
        (sinks/txn.py). An unresolved txn commit blocks successors, so
        a later-resolved txn can never retroactively change a snapshot
        another writer already built on."""
        os.makedirs(self.log_dir, exist_ok=True)
        version = expected_base + 1
        if expected_base > 0:
            prev = self._read_commit(expected_base)
            if self._txn_state(prev) == "pending":
                raise TxnPendingError(
                    f"version {expected_base} at {self.path} belongs to "
                    f"unresolved txn {prev['txn']['id']}; resolve it "
                    "(commit/abort/recover) before writing"
                )
        payload = {
            "version": version,
            "op": op,
            "ts": time.time(),
            "add": list(add),
            "remove": list(remove),
            "meta": meta or {},
        }
        if schema is not None:
            payload["schema"] = schema.jsonValue()
        if txn is not None:
            payload["txn"] = {"id": txn["id"], "status_dir": txn["status_dir"]}
        # Stage the full record first, then publish it with one atomic
        # link: the version file either exists COMPLETE or not at all.
        # (The old single open(..., "x") + json.dump had a torn-write
        # window — a crash mid-dump left a truncated N.json that broke
        # every subsequent read of the table. On an object store the
        # whole operation is one put-if-absent — S3 conditional put /
        # GCS precondition — which is torn-proof by construction; link
        # is the local-FS mapping of that primitive, preserving both
        # the atomicity AND the exactly-one-winner conflict check.)
        tmp = self._version_file(version) + f".stage-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())  # durable before it becomes visible
        try:
            os.link(tmp, self._version_file(version))
        except FileExistsError:
            raise CommitConflictError(
                f"version {version} already committed at {self.path}"
            ) from None
        except OSError as e:
            # Filesystems without hard-link support (some FUSE /
            # object-store mounts — r12 advisor): fall back to an
            # exclusive-create write. One-winner is preserved (O_EXCL);
            # the complete-or-absent publish is NOT — a crash mid-write
            # can leave a torn version file on such mounts, the
            # documented trade against failing every commit outright.
            if e.errno not in _LINK_UNSUPPORTED_ERRNOS:
                raise
            try:
                fd = os.open(
                    self._version_file(version),
                    os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                    0o644,
                )
            except FileExistsError:
                raise CommitConflictError(
                    f"version {version} already committed at {self.path}"
                ) from None
            with os.fdopen(fd, "w") as out:
                json.dump(payload, out)
                out.flush()
                os.fsync(out.fileno())
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass  # a leaked stage file is inert (never read back)
        # fsync the log DIRECTORY too: the staged bytes were fsynced,
        # but the published NAME lives in the directory — without this
        # a power failure can forget the link itself (r12 advisor)
        _fsync_dir(self.log_dir)
        # never checkpoint a txn commit: its files are unresolved at
        # write time, and a checkpoint must bake in only settled state
        if version % _CHECKPOINT_INTERVAL == 0 and txn is None:
            self._write_checkpoint(version)
        return version

    @staticmethod
    def _txn_state(commit: Dict[str, Any]) -> str:
        """Resolution of a commit's transaction: none (not a txn
        commit), committed, aborted, or pending. Markers are immutable
        and mutually exclusive, so committed/aborted answers are final
        (safe to bake into checkpoints); pending is re-checked on every
        read."""
        t = commit.get("txn")
        if not t:
            return "none"
        base = os.path.join(t["status_dir"], t["id"])
        # the .decided file is THE atomic decide point (sinks/txn.py:
        # one exclusive create of one name, so exactly one outcome can
        # ever exist); the outcome-named markers are convenience copies
        # materialized after it, kept as a fallback for coordinator
        # dirs written before the decided-file era
        try:
            with open(base + ".decided") as f:
                return json.load(f).get("outcome", "pending")
        except FileNotFoundError:
            pass
        except (OSError, ValueError):
            return "pending"  # unreadable record: treat as undecided
        if os.path.exists(base + ".committed"):
            return "committed"
        if os.path.exists(base + ".aborted"):
            return "aborted"
        return "pending"

    def _checkpoint_file(self, version: int) -> str:
        return os.path.join(
            self.log_dir, f"{version:0{_VERSION_DIGITS}d}.checkpoint.json"
        )

    def _write_checkpoint(self, version: int) -> None:
        """Best-effort full-state checkpoint (atomic create; a loser or
        a crash mid-write leaves replay-from-log correct)."""
        live = self.snapshot_files(version)
        tmp = self._checkpoint_file(version) + f".tmp-{uuid.uuid4().hex}"
        try:
            with open(tmp, "w") as f:
                json.dump(live, f)
            os.rename(tmp, self._checkpoint_file(version))
        except OSError:
            pass  # checkpoints are an optimization, never a correctness need

    def _latest_checkpoint_at_or_before(self, version: int) -> int:
        if not os.path.isdir(self.log_dir):
            return 0
        cands = [
            int(f.split(".")[0])
            for f in os.listdir(self.log_dir)
            if f.endswith(".checkpoint.json") and f.split(".")[0].isdigit()
        ]
        cands = [v for v in cands if v <= version]
        return max(cands, default=0)

    def snapshot_files(self, version: Optional[int] = None) -> List[Dict[str, Any]]:
        """Live add-actions (with stats) at a version: start from the
        newest checkpoint at-or-before it, replay only the commits
        after — O(checkpoint interval) work regardless of table age."""
        upto = self.latest_version() if version is None else version
        live: Dict[str, Dict[str, Any]] = {}
        start = 1
        ckpt = self._latest_checkpoint_at_or_before(upto)
        if ckpt:
            try:
                with open(self._checkpoint_file(ckpt)) as f:
                    live = {a["path"]: a for a in json.load(f)}
                start = ckpt + 1
            except (OSError, json.JSONDecodeError):
                live, start = {}, 1  # corrupt checkpoint: fall back to full replay
        for v in range(start, upto + 1):
            commit = self._read_commit(v)
            if self._txn_state(commit) in ("pending", "aborted"):
                continue  # invisible: the txn never (yet) happened
            for path in commit["remove"]:
                live.pop(path, None)
            for action in commit["add"]:
                live[action["path"]] = action
        return list(live.values())

    # ------------------------------------------------------------------
    # deletion vectors (merge-on-read deletes: Delta DV / Iceberg
    # position-delete shape). A selective DELETE writes a tiny sidecar
    # of dead row POSITIONS instead of rewriting the data file — at
    # 100 TB a 100-row GDPR delete costs one footer-sized metadata file,
    # not a rewrite of every touched 128 MiB file. The add-action grows
    # an optional ``dv`` field: {"path": sidecar, "dead": n}; the data
    # file itself stays byte-identical and shared across versions/
    # clones. Readers subtract positions via ONE broadcast anti-join on
    # (file, _metadata.row_index); any REWRITE of the file (merge,
    # compact, COW delete) purges its DV. Sidecars here are JSON
    # position lists; the production form is a roaring bitmap — the
    # protocol shape is identical.
    # ------------------------------------------------------------------
    @staticmethod
    def _action_ident(action: Dict[str, Any]):
        """Identity of a file VERSION in a snapshot: the data path plus
        its deletion-vector path (a DV delete re-publishes the same data
        path under a new sidecar, so path alone no longer identifies the
        visible content — changes()/restore() diff on this)."""
        return (action["path"], (action.get("dv") or {}).get("path"))

    def _load_dv(self, dv_path: str) -> List[int]:
        with open(dv_path) as f:
            return json.load(f)["positions"]

    def _write_dv(self, data_path: str, positions: Sequence[int]) -> str:
        dv_dir = os.path.join(self.path, _DV_DIR)
        os.makedirs(dv_dir, exist_ok=True)
        dv_path = os.path.join(dv_dir, f"dv-{uuid.uuid4().hex}.json")
        with open(dv_path, "x") as f:
            json.dump(
                {
                    "file": os.path.basename(data_path),
                    "positions": sorted(int(p) for p in positions),
                },
                f,
            )
        return dv_path

    def _scan(
        self,
        actions: Sequence[Dict[str, Any]],
        schema=None,
        keep_file_col: Optional[str] = None,
        keep_pos_col: Optional[str] = None,
    ) -> DataFrame:
        """DV-aware scan of a set of add-actions: read the data files
        (schema-pinned when given) and subtract each file's deletion-
        vector positions via one broadcast anti-join on
        (file basename, _metadata.row_index). With no DVs in the set
        this is a plain parquet scan — zero overhead on the common
        path. ``keep_file_col`` / ``keep_pos_col``: also surface the
        row's file basename / physical row index under those names
        (merge/delete touched-file and position resolution)."""
        paths = [a["path"] for a in actions]
        reader = (
            self.spark.read.schema(schema)
            if schema is not None
            else self.spark.read
        )
        df = reader.parquet(*paths)
        cols = df.columns
        dv_pairs: List[Any] = []
        for a in actions:
            dv = a.get("dv")
            if dv:
                base = os.path.basename(a["path"])
                dv_pairs.extend(
                    (base, int(p)) for p in self._load_dv(dv["path"])
                )
        if not dv_pairs and keep_file_col is None and keep_pos_col is None:
            return df
        fname = F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1)
        file_col = keep_file_col or "__dv_file"
        pos_col = keep_pos_col or "__dv_pos"
        df = df.select(
            fname.alias(file_col),
            F.col("_metadata.row_index").alias(pos_col),
            *cols,
        )
        if dv_pairs:
            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
                StructType,
            )

            dv_df = self.spark.createDataFrame(
                dv_pairs,
                StructType(
                    [
                        StructField(file_col, StringType(), False),
                        StructField(pos_col, LongType(), False),
                    ]
                ),
            )
            df = df.join(F.broadcast(dv_df), [file_col, pos_col], "left_anti")
        out = [c for c in (keep_file_col, keep_pos_col) if c is not None]
        return df.select(*out, *cols)

    # ------------------------------------------------------------------
    # schema tracking (the Delta metaData-action pattern: the log, not
    # the data files, is the source of truth for the table schema)
    # ------------------------------------------------------------------
    def table_schema(self, version: Optional[int] = None):
        """StructType AS OF ``version`` (latest by default): the newest
        commit at or before it that recorded a schema. None for tables
        whose commits all predate schema tracking — readers then fall
        back to parquet self-description (the legacy behavior)."""
        from pyspark.sql.types import StructType

        upto = self.latest_version() if version is None else version
        # incremental per-handle cache (same discipline as
        # constraints()): walk only commits NEWER than the last scan —
        # commits are immutable, so on a monotone version sequence
        # (every fold of a long-lived view) the amortized cost is O(1)
        # commit reads per call instead of O(versions)
        checked, found_at, found = getattr(
            self, "_schema_scan", (0, 0, None)
        )
        if upto < checked:
            # historical ask (time travel): replay from genesis, don't
            # disturb the monotone cache
            return self._schema_walk(upto)
        cacheable = True
        newer = None
        for v in range(upto, checked, -1):
            commit = self._read_commit(v)
            state = self._txn_state(commit)
            if state in ("pending", "aborted"):
                if state == "pending":
                    cacheable = False  # may resolve later; don't bake in
                continue
            sj = commit.get("schema")
            if sj is not None:
                newer = (v, StructType.fromJson(sj))
                break
        if newer is not None:
            found_at, found = newer
        if cacheable:
            self._schema_scan = (upto, found_at, found)
        return found

    def _schema_walk(self, upto: int):
        """Uncached from-scratch walk for historical (time-travel)
        schema asks."""
        from pyspark.sql.types import StructType

        for v in range(upto, 0, -1):
            commit = self._read_commit(v)
            if self._txn_state(commit) in ("pending", "aborted"):
                continue
            sj = commit.get("schema")
            if sj is not None:
                return StructType.fromJson(sj)
        return None

    def _align_to_schema(
        self, df: DataFrame, target, merge_schema: bool, op: str
    ):
        """Validate df against the table schema ``target`` and return
        (aligned_df, schema_to_record).

        - shared columns must match the logged type EXACTLY (a type
          conflict is corruption-in-waiting — refused loudly; evolve by
          adding a new column instead);
        - columns the table has but df lacks are filled with typed
          NULLs (the nullable-column append contract);
        - columns df has but the table lacks require
          ``merge_schema=True`` and widen the table schema — appended
          after the existing columns, forced nullable because every
          pre-evolution file reads as NULL for them.
        """
        from pyspark.sql.types import StructField, StructType

        src_fields = {f.name: f for f in df.schema.fields}
        tgt_fields = {f.name: f for f in target.fields}
        for name, f in src_fields.items():
            t = tgt_fields.get(name)
            # simpleString: nullability-INSENSITIVE type compare. The
            # parquet reader forces containsNull=True on read-back, so
            # an array column written non-null and merged from a frame
            # derived from the table itself (erasure, snapshot-sourced
            # deletes) differs ONLY in nested nullability — a shape
            # conflict is corruption, a nullability delta is not.
            if t is not None and (
                f.dataType.simpleString() != t.dataType.simpleString()
            ):
                raise SchemaMismatchError(
                    f"{op}: column {name!r} is {f.dataType.simpleString()} "
                    f"in the batch but {t.dataType.simpleString()} in the "
                    f"table log; type changes are refused — add a new "
                    "column instead"
                )
        new_cols = [f for f in df.schema.fields if f.name not in tgt_fields]
        if new_cols and not merge_schema:
            raise SchemaMismatchError(
                f"{op}: batch adds column(s) "
                f"{[f.name for f in new_cols]} not in the table schema; "
                "pass merge_schema=True to widen the table"
            )
        out_fields = list(target.fields) + [
            StructField(f.name, f.dataType, True) for f in new_cols
        ]
        out_schema = StructType(out_fields)
        aligned = df.select(
            *[
                F.col(f.name)
                if f.name in src_fields
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in out_fields
            ]
        )
        return aligned, out_schema

    # ------------------------------------------------------------------
    # CHECK constraints (the Delta table-constraint pattern: stored in
    # the commit log, enforced on every data-adding write)
    # ------------------------------------------------------------------
    def constraints(self, version: Optional[int] = None) -> Dict[str, str]:
        """name -> SQL predicate, from replaying SET/DROP_CONSTRAINT
        commits (metadata-only; a production variant folds these into
        the checkpoint like Delta's protocol state). Incremental per
        handle: only commits newer than the last scan are read —
        commits are immutable, so the cache can never be stale."""
        upto = self.latest_version() if version is None else version
        cached_v, cached = getattr(self, "_constraint_cache", (0, {}))
        if version is not None and upto < cached_v:
            cached_v, cached = 0, {}  # historical ask: replay from genesis
        out = dict(cached)
        for v in range(cached_v + 1, upto + 1):
            commit = self._read_commit(v)
            meta = commit.get("meta") or {}
            if commit["op"] == "SET_CONSTRAINT":
                out[meta["name"]] = meta["expr"]
            elif commit["op"] == "DROP_CONSTRAINT":
                out.pop(meta["name"], None)
        if version is None:
            self._constraint_cache = (upto, dict(out))
        return out

    def add_constraint(
        self, name: str, expr: str, validate_existing: bool = True
    ) -> int:
        """Publish a CHECK constraint (SQL predicate over the table's
        columns; NULL predicates pass, per SQL CHECK semantics). With
        ``validate_existing`` the CURRENT snapshot is scanned first and
        the constraint is refused if any row violates it — otherwise
        later writers would be blamed for historic rows."""
        if validate_existing and self.exists():
            bad = self.read().filter(f"NOT ({expr})").limit(1).count()
            if bad:
                raise ConstraintViolationError(
                    f"existing rows violate CHECK {name!r} ({expr}); "
                    "clean the data or pass validate_existing=False"
                )
        return self._commit(
            self.latest_version(), "SET_CONSTRAINT", [], [],
            meta={"name": name, "expr": expr},
        )

    def drop_constraint(self, name: str) -> int:
        return self._commit(
            self.latest_version(), "DROP_CONSTRAINT", [], [],
            meta={"name": name},
        )

    def bloom_columns(self, version: Optional[int] = None):
        """Columns under a table-level BLOOM INDEX property (the Delta
        bloom-index model): every data-adding write path — write, MERGE
        rewrites and inserts, DELETE keeps, compaction — records
        per-file blooms for them, so point-lookup pruning survives
        rewrites. Same incremental replay discipline as constraints()."""
        upto = self.latest_version() if version is None else version
        cached_v, cached = getattr(self, "_bloom_cache", (0, set()))
        if version is not None and upto < cached_v:
            cached_v, cached = 0, set()
        out = set(cached)
        for v in range(cached_v + 1, upto + 1):
            commit = self._read_commit(v)
            meta = commit.get("meta") or {}
            if commit["op"] == "SET_BLOOM_INDEX":
                out.update(meta["columns"])
            elif commit["op"] == "DROP_BLOOM_INDEX":
                out.difference_update(meta["columns"])
        if version is None:
            self._bloom_cache = (upto, set(out))
        return out

    def set_bloom_index(self, columns: Sequence[str]) -> int:
        """Register the columns for automatic per-file bloom recording
        on every future data-adding commit (metadata-only; existing
        files keep only their current stats — they are scanned, never
        wrongly skipped, until a rewrite/compaction refreshes them)."""
        return self._commit(
            self.latest_version(), "SET_BLOOM_INDEX", [], [],
            meta={"columns": sorted(columns)},
        )

    def drop_bloom_index(self, columns: Sequence[str]) -> int:
        return self._commit(
            self.latest_version(), "DROP_BLOOM_INDEX", [], [],
            meta={"columns": sorted(columns)},
        )

    def _validate_constraints(self, df: DataFrame) -> None:
        """One batch-sized violation probe per active constraint —
        write-time enforcement, so readers never need to re-check."""
        for name, expr in self.constraints().items():
            if df.filter(f"NOT ({expr})").limit(1).count():
                raise ConstraintViolationError(
                    f"incoming batch violates CHECK {name!r} ({expr})"
                )
        self._validate_fks(df)

    # ------------------------------------------------------------------
    # FOREIGN KEY constraints: write-time referential enforcement.
    # Neither Delta nor Iceberg enforces FKs (they parse but ignore
    # them); warehouses that do enforce pay this exact shape — a
    # batch-keys anti-join against the referenced snapshot. This is the
    # PREVENTIVE complement to the post-hoc fk_orphan_profile audit
    # (functions/profile.py).
    # ------------------------------------------------------------------
    def fk_constraints(self, version: Optional[int] = None) -> Dict[str, Dict]:
        """name -> {cols, ref_path, ref_cols}, from replaying
        SET_FK/DROP_FK commits (incremental per-handle cache, same
        discipline as constraints(): commits are immutable, so only
        commits newer than the last scan are read)."""
        upto = self.latest_version() if version is None else version
        cached_v, cached = getattr(self, "_fk_cache", (0, {}))
        if version is not None and upto < cached_v:
            cached_v, cached = 0, {}  # historical ask: replay from genesis
        out = dict(cached)
        for v in range(cached_v + 1, upto + 1):
            commit = self._read_commit(v)
            meta = commit.get("meta") or {}
            if commit["op"] == "SET_FK":
                out[meta["name"]] = {
                    "cols": meta["cols"],
                    "ref_path": meta["ref_path"],
                    "ref_cols": meta["ref_cols"],
                }
            elif commit["op"] == "DROP_FK":
                out.pop(meta["name"], None)
        if version is None:
            self._fk_cache = (upto, dict(out))
        return out

    def add_fk_constraint(
        self,
        name: str,
        cols: Sequence[str],
        ref_table: "AcidTable",
        ref_cols: Sequence[str],
        validate_existing: bool = True,
    ) -> int:
        """Publish a FOREIGN KEY: every non-NULL (cols) tuple written to
        this table must exist as a (ref_cols) tuple in ``ref_table`` at
        write time. NULL in any FK column passes (SQL MATCH SIMPLE).
        The referenced table is recorded BY PATH and re-resolved at
        every validation, so the probe always sees its latest snapshot.
        Caveat (same as every write-time-only enforcer): a later DELETE
        in the referenced table can orphan existing rows — there are no
        cascades; run fk_orphan_profile as the post-hoc audit."""
        cols, ref_cols = list(cols), list(ref_cols)
        if len(cols) != len(ref_cols):
            raise ValueError("cols and ref_cols must pair up")
        if validate_existing and self.exists():
            bad = self._fk_orphans(
                self.read(), cols, ref_table.path, ref_cols
            )
            if bad:
                raise ConstraintViolationError(
                    f"existing rows violate FK {name!r}: e.g. {bad}; clean "
                    "the data or pass validate_existing=False"
                )
        return self._commit(
            self.latest_version(),
            "SET_FK",
            [],
            [],
            meta={
                "name": name,
                "cols": cols,
                "ref_path": ref_table.path,
                "ref_cols": ref_cols,
            },
        )

    def drop_fk_constraint(self, name: str) -> int:
        return self._commit(
            self.latest_version(), "DROP_FK", [], [], meta={"name": name}
        )

    def _fk_orphans(
        self, df: DataFrame, cols: List[str], ref_path: str, ref_cols: List[str]
    ):
        """First orphan tuple in df (None if referentially clean): the
        batch's distinct non-NULL key tuples anti-joined against the
        referenced table's distinct keys — batch-sized work on the left,
        column-pruned distinct on the right."""
        ref = AcidTable(self.spark, ref_path).read().select(
            *[F.col(rc).alias(f"__ref_{i}") for i, rc in enumerate(ref_cols)]
        ).distinct()
        probe = df.select(*cols).na.drop("any").distinct()
        cond = F.lit(True)
        for i, c in enumerate(cols):
            cond = cond & (F.col(c) == F.col(f"__ref_{i}"))
        orphan = probe.join(ref, cond, "left_anti").limit(1).collect()
        return tuple(orphan[0]) if orphan else None

    def _validate_fks(self, df: DataFrame) -> None:
        for name, fk in self.fk_constraints().items():
            bad = self._fk_orphans(df, fk["cols"], fk["ref_path"], fk["ref_cols"])
            if bad is not None:
                raise ConstraintViolationError(
                    f"incoming batch violates FK {name!r}: {bad} not in "
                    f"{fk['ref_path']}({', '.join(fk['ref_cols'])})"
                )

    # ------------------------------------------------------------------
    # shallow clone
    # ------------------------------------------------------------------
    def version_as_of(self, ts: float) -> int:
        """Newest RESOLVED version whose commit timestamp is <= ts (the
        Delta TIMESTAMP AS OF contract). Raises if the table's first
        commit is later than ts."""
        best = 0
        for v in range(1, self.latest_version() + 1):
            commit = self._read_commit(v)
            if self._txn_state(commit) in ("pending", "aborted"):
                continue
            if commit["ts"] <= ts:
                best = v
        if best == 0:
            raise ValueError(
                f"no committed version at or before ts={ts} at {self.path}"
            )
        return best

    def read_as_of(self, ts: float) -> DataFrame:
        """Time travel by wall-clock timestamp (`read` by version is the
        deterministic primary; this is the operator-convenience form)."""
        return self.read(version=self.version_as_of(ts))

    def deep_clone(self, dest_path: str) -> "AcidTable":
        """Delta DEEP CLONE: physically COPY the current snapshot's data
        files (and deletion-vector sidecars) into an independent table
        with a fresh single-commit log. Unlike the zero-copy shallow
        ``clone``, the result shares NOTHING with the source — vacuum
        either side freely; this is the disaster-recovery / cross-
        region replication primitive (at scale the file copy is the
        object-store server-side copy, one request per file).
        Constraints and FKs carry over; history does not (the clone's
        v1 IS its genesis — by design, a DR copy of state not
        lineage)."""
        import shutil

        dest = AcidTable(self.spark, dest_path)
        if dest.exists():
            raise FileExistsError(f"clone target {dest.path} is not empty")
        os.makedirs(dest.path, exist_ok=True)
        add = []
        for a in self.snapshot_files():
            new_path = os.path.join(dest.path, os.path.basename(a["path"]))
            shutil.copy2(a["path"], new_path)
            action = dict(a)
            action["path"] = new_path
            dv = a.get("dv")
            if dv:
                dv_dir = os.path.join(dest.path, _DV_DIR)
                os.makedirs(dv_dir, exist_ok=True)
                new_dv = os.path.join(dv_dir, os.path.basename(dv["path"]))
                shutil.copy2(dv["path"], new_dv)
                action["dv"] = dict(dv) | {"path": new_dv}
            add.append(action)
        dest._commit(0, "DEEP_CLONE", add, [],
                     meta={"source": self.path,
                           "source_version": self.latest_version()},
                     schema=self.table_schema())
        for name, expr in self.constraints().items():
            dest._commit(dest.latest_version(), "SET_CONSTRAINT", [], [],
                         meta={"name": name, "expr": expr})
        for name, fk in self.fk_constraints().items():
            dest._commit(dest.latest_version(), "SET_FK", [], [],
                         meta={"name": name, **fk})
        return dest

    def clone(self, dest_path: str) -> "AcidTable":
        """Zero-copy snapshot clone (Delta SHALLOW CLONE): the clone's
        v1 REFERENCES this table's current live data files, so cloning
        a 100 TB table is one metadata commit. The clone's own COW
        rewrites land under its own directory, and its ``vacuum`` only
        scans its own directory — it can never delete source files.
        Caveat (same as Delta shallow clones): ``vacuum`` on the SOURCE
        does not know about clones; run it only after clones are
        rewritten or dropped. Active CHECK constraints carry over."""
        dest = AcidTable(self.spark, dest_path)
        if dest.exists():
            raise FileExistsError(f"clone target {dest.path} is not empty")
        dest._commit(0, "CLONE", self.snapshot_files(), [],
                     meta={"source": self.path,
                           "source_version": self.latest_version()},
                     schema=self.table_schema())
        for name, expr in self.constraints().items():
            dest._commit(dest.latest_version(), "SET_CONSTRAINT", [], [],
                         meta={"name": name, "expr": expr})
        for name, fk in self.fk_constraints().items():
            dest._commit(dest.latest_version(), "SET_FK", [], [],
                         meta={"name": name, **fk})
        return dest

    # ------------------------------------------------------------------
    # reads
    # ------------------------------------------------------------------
    def read(self, version: Optional[int] = None) -> DataFrame:
        files = self.snapshot_files(version)
        upto = self.latest_version() if version is None else version
        schema = self.table_schema(upto) if upto > 0 else None
        if not files:
            if upto > 0:
                # the table EXISTS but this snapshot holds no rows
                # (e.g. every row deleted): read as an EMPTY frame with
                # the logged schema (or, pre-schema-tracking, one
                # recovered from any historical data file still on
                # disk — COW keeps removed files until vacuum)
                if schema is not None:
                    return self.spark.createDataFrame([], schema)
                empty = self._empty_frame(upto)
                if empty is not None:
                    return empty
            raise FileNotFoundError(
                f"AcidTable at {self.path} has no committed data"
                + (f" at version {version}" if version else "")
            )
        # schema-pinned (files written before a column was added surface
        # it as NULL; column order stable across mixed-file snapshots)
        # and DV-aware (merge-on-read deletes subtracted)
        return self._scan(files, schema)

    def _empty_frame(self, upto: int) -> Optional[DataFrame]:
        for v in range(upto, 0, -1):
            commit = self._read_commit(v)
            paths = [a["path"] for a in commit["add"]] + list(commit["remove"])
            for p in paths:
                if os.path.exists(p):
                    return self.spark.read.parquet(p).limit(0)
        return None  # fully vacuumed history: schema unrecoverable

    def history(self) -> List[Dict[str, Any]]:
        return [
            {
                k: commit[k]
                for k in ("version", "op", "ts", "meta")
            }
            | {"n_add": len(commit["add"]), "n_remove": len(commit["remove"])}
            for commit in (
                self._read_commit(v) for v in range(1, self.latest_version() + 1)
            )
        ]

    def changes(
        self,
        keys: Sequence[str],
        v_from: int,
        v_to: Optional[int] = None,
        check_unique: bool = True,
    ) -> DataFrame:
        """Row-level change feed between two versions (Delta CDF shape):
        one row per changed row tagged ``change_type`` in (insert,
        delete, update_preimage, update_postimage).

        Reads ONLY the data files that entered or left the snapshot
        between the versions — copy-on-write guarantees a key's row
        lives in exactly one file, so rows in untouched files cannot
        have changed and are never scanned.  The diff is one full outer
        join of removed-file rows vs added-file rows on the keys;
        rewritten-but-identical survivor rows (COW copies) fall out via
        the value comparison.  Cost scales with the size of the touched
        files, not the table.

        PRECONDITION: ``keys`` uniquely identify a row on each side of
        the diff — ``write(mode='append')`` enforces no uniqueness, and
        a duplicate key would fan the diff join out into fabricated
        update pairs.  With ``check_unique`` (default) each side carries
        an in-plan per-key row count (a window sharing the diff join's
        own exchange) and every emitted change row raises loudly if its
        key was duplicated — zero extra jobs or scans, with the error
        surfacing when the feed materializes rather than inside this
        call (r14; the former eager pre-check was a dedicated
        scan+shuffle+collect over both sides per feed).
        """
        v_to = self.latest_version() if v_to is None else v_to
        # diff on (path, dv) IDENTITY, not path alone: a merge-on-read
        # delete re-publishes the same data path under a new deletion
        # vector, so the file's VISIBLE content changed even though its
        # path did not — both sides then read the same physical file
        # with their own DV applied and the dead rows fall out as
        # 'delete' rows of the diff
        from_map = {
            self._action_ident(a): a for a in self.snapshot_files(v_from)
        }
        to_map = {self._action_ident(a): a for a in self.snapshot_files(v_to)}
        removed = [a for i, a in sorted(from_map.items()) if i not in to_map]
        added = [a for i, a in sorted(to_map.items()) if i not in from_map]
        key_list = list(keys)
        # both sides of the diff read at the DESTINATION version's
        # schema: when the span crosses a column addition, preimage
        # rows surface the new column as NULL — one consistent frame,
        # so downstream folds never see mixed shapes
        span_schema = self.table_schema(v_to)

        def _read(actions: List[Dict[str, Any]]) -> Optional[DataFrame]:
            if not actions:
                return None
            return self._scan(actions, span_schema)

        old, new = _read(removed), _read(added)
        if old is None and new is None:
            raise ValueError(
                f"no data files changed between v{v_from} and v{v_to}"
            )
        template = old if old is not None else new
        cols = template.columns
        val_cols = [c for c in cols if c not in key_list]

        def _tag(df: DataFrame, tag: str) -> DataFrame:
            return df.select(F.lit(tag).alias("change_type"), *cols)

        if old is None:
            return _tag(new, "insert")
        if new is None:
            return _tag(old, "delete")
        if check_unique:
            # IN-PLAN guard instead of an eager pre-check job (r14,
            # guide §1.2/§5: the old shape ran a dedicated
            # scan+shuffle+collect over both touched sides BEFORE the
            # diff join re-scanned the same files — one full extra pass
            # per change feed). Each side carries its per-key row count
            # from a window keyed exactly like the join, so the count
            # shares the join's exchange, and every emitted change row
            # re-raises the old error through raise_error(). A
            # duplicate that fans the join out always emits rows (the
            # fabricated pairs ARE rows), so every fold-corrupting case
            # still fails loudly; the one silent corner — bit-identical
            # duplicate rows present on BOTH sides, whose diff is empty
            # and whose fold effect is zero — required an earlier
            # check_unique=False to create in the first place. The
            # error now surfaces at materialization (Spark wraps it in
            # its runtime-exception chain) rather than inside the
            # changes() call itself.
            from pyspark.sql.window import Window

            w = Window.partitionBy(*key_list)
            old = old.withColumn("__n_pre", F.count(F.lit(1)).over(w))
            new = new.withColumn("__n_post", F.count(F.lit(1)).over(w))

        # presence markers, not key-null tests: a NULL business key must
        # not make a row invisible to the classifier
        o = old.withColumn("__in_old", F.lit(True)).alias("o")
        n = new.withColumn("__in_new", F.lit(True)).alias("n")
        cond = F.lit(True)
        for k in key_list:
            cond = cond & F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        j = o.join(n, cond, "full_outer")
        if check_unique:
            # FILTER guard (not a projected column, which count()-style
            # consumers would let Catalyst prune away): any feed row
            # whose key was duplicated on either side raises at
            # materialization
            def _raise(side: str) -> F.Column:
                return F.raise_error(F.lit(
                    f"changes() requires unique keys {key_list}; the "
                    f"{side}-image files between v{v_from} and v{v_to} "
                    "contain duplicates (pass check_unique=False only "
                    "if fan-out is acceptable)"
                )).cast("boolean")

            j = j.filter(
                F.when(
                    F.coalesce(F.col("o.__n_pre"), F.lit(1)) > 1,
                    _raise("pre"),
                )
                .when(
                    F.coalesce(F.col("n.__n_post"), F.lit(1)) > 1,
                    _raise("post"),
                )
                .otherwise(F.lit(True))
            )
        in_old = F.col("o.__in_old").isNotNull()
        in_new = F.col("n.__in_new").isNotNull()
        same = F.lit(True)
        for c in val_cols:
            same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        inserts = j.filter(~in_old).select(
            F.lit("insert").alias("change_type"),
            *[F.col(f"n.{c}").alias(c) for c in cols],
        )
        deletes = j.filter(~in_new).select(
            F.lit("delete").alias("change_type"),
            *[F.col(f"o.{c}").alias(c) for c in cols],
        )
        updated = j.filter(in_old & in_new & ~same)
        pre = updated.select(
            F.lit("update_preimage").alias("change_type"),
            *[F.col(f"o.{c}").alias(c) for c in cols],
        )
        post = updated.select(
            F.lit("update_postimage").alias("change_type"),
            *[F.col(f"n.{c}").alias(c) for c in cols],
        )
        return inserts.unionByName(deletes).unionByName(pre).unionByName(post)

    # ------------------------------------------------------------------
    # writes
    # ------------------------------------------------------------------
    # target on-disk size per published file. Real lakes aim for
    # 128 MiB-1 GiB; the policy below only LOWERS file count, so the
    # constant trades per-file overhead (commit log entries, footer
    # reads, task scheduling) against write parallelism.
    TARGET_FILE_BYTES = 128 * 1024 * 1024
    # below this total, packing happens driver-side via pyarrow row-group
    # concat — zero Spark jobs; above it, a coalesce job (which at real
    # scale rarely triggers because files approach the target size)
    DRIVER_PACK_BYTES = 64 * 1024 * 1024

    def _binpack_staging(self, staging: str) -> str:
        """Collapse a fragmented staged write (small-file problem: a
        32-partition shuffle publishing 32 tiny files per version makes
        every later snapshot read, merge candidate scan, and footer
        pass pay 32x overhead). If the staged bytes justify fewer than
        half the staged files, rewrite at ceil(bytes/target) files.
        At scale files approach the target size and this pass is a
        no-op — the rewrite only triggers exactly when it is cheap."""
        import glob
        import math
        import shutil

        import pyarrow.parquet as pq

        files = sorted(glob.glob(os.path.join(staging, "*.parquet")))
        if len(files) <= 1:
            return staging
        total = sum(os.path.getsize(f) for f in files)
        packed = staging + "-packed"
        if total <= self.DRIVER_PACK_BYTES:
            # tiny version: concat row groups driver-side — zero Spark
            # jobs, the common case for dimension batches and tests
            os.makedirs(packed, exist_ok=True)
            out = os.path.join(packed, "part-00000.parquet")
            schema = pq.read_schema(files[0])
            with pq.ParquetWriter(out, schema) as w:
                for f in files:
                    t = pq.read_table(f)
                    if t.num_rows:
                        w.write_table(t.cast(schema))
            shutil.rmtree(staging, ignore_errors=True)
            return packed
        n_target = max(1, math.ceil(total / self.TARGET_FILE_BYTES))
        if n_target * 2 > len(files):
            return staging
        self.spark.read.parquet(staging).coalesce(n_target).write.mode(
            "overwrite"
        ).parquet(packed)
        shutil.rmtree(staging, ignore_errors=True)
        return packed

    def _write_data_files(
        self,
        df: DataFrame,
        stats_cols: Sequence[str] = (),
        binpack: bool = True,
        bloom_cols: Sequence[str] = (),
    ) -> List[Dict[str, Any]]:
        """Write df as parquet into the table dir (one Spark job, files
        named under a fresh uuid prefix so concurrent writers never
        collide) and return add-actions with footer-derived stats.

        ``bloom_cols``: also record a per-file BLOOM FILTER for these
        columns in the add-action (the Delta bloom-index role): point
        lookups on a non-clustered key then skip files whose bloom
        excludes the value — min/max footer ranges cannot prune a key
        that interleaves across files, a bloom can. The filter is
        conservative (false positives only ADD files; a miss is
        definitive), so pruning never changes results. Computed here in
        the same driver-side per-file pass that already reads the
        parquet footers; a multi-node deployment moves the identical
        math into the write task that owns the file."""
        import glob
        import shutil

        import pyarrow.parquet as pq

        bloom_cols = set(bloom_cols) | self.bloom_columns()
        staging = os.path.join(self.path, f"_staging-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(staging)
        if binpack:
            staging = self._binpack_staging(staging)
        actions = []
        for i, src in enumerate(sorted(glob.glob(os.path.join(staging, "*.parquet")))):
            meta = pq.read_metadata(src)
            if meta.num_rows == 0:
                continue  # empty shuffle partitions produce 0-row files
            dest = os.path.join(
                self.path, f"part-{uuid.uuid4().hex}-{i:05d}.parquet"
            )
            shutil.move(src, dest)
            stats: Dict[str, Any] = {}
            names = list(meta.schema.names)
            for col in stats_cols:
                if col not in names:
                    continue
                j = names.index(col)
                mins, maxs = [], []
                for rg in range(meta.num_row_groups):
                    st = meta.row_group(rg).column(j).statistics
                    if st is None or not st.has_min_max:
                        mins, maxs = [], []
                        break
                    mins.append(st.min)
                    maxs.append(st.max)
                if mins and all(
                    isinstance(v, (int, float, str, bool))
                    for v in (min(mins), max(maxs))
                ):
                    # JSON-serializable types only (dates/binary footers
                    # can't round-trip the log; those columns simply
                    # don't prune)
                    stats[col] = {"min": min(mins), "max": max(maxs)}
            for col in bloom_cols:
                if col not in names:
                    continue
                vals = pq.read_table(dest, columns=[col]).column(col)
                bloom = _build_bloom(set(vals.to_pylist()) - {None})
                if bloom is not None:
                    stats.setdefault(col, {})["bloom"] = bloom
            actions.append(
                {"path": dest, "rows": meta.num_rows, "stats": stats}
            )
        shutil.rmtree(staging, ignore_errors=True)
        return actions

    def write(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        stats_cols: Sequence[str] = (),
        max_retries: int = 3,
        binpack: bool = True,
        extra_meta: Optional[Dict[str, Any]] = None,
        merge_schema: bool = False,
        txn: Optional[Dict[str, str]] = None,
        commit_guard=None,
        bloom_cols: Sequence[str] = (),
    ) -> int:
        """Commit df as a new version. mode: overwrite | append.
        ``commit_guard``: zero-arg callable re-checked inside every OCC
        attempt (after the base version is read); returning False raises
        ``CommitGuardFailed`` WITHOUT committing — the race-free seat of
        check-then-commit preconditions like streaming replay markers.
        ``bloom_cols``: record per-file bloom filters for point-lookup
        file skipping (see ``point_lookup``); a write-path option — a
        later MERGE's rewritten files carry range stats only, which
        stays correct (missing bloom = no pruning, never a wrong skip).
        ``binpack=False`` publishes df's partitioning verbatim — for
        deliberately clustered layouts (range-partitioned key files)
        whose file boundaries ARE the pruning structure.
        ``extra_meta`` rides inside the commit record itself — the
        transactional carrier for application markers (e.g. streaming
        batch ids): they publish atomically WITH the data or not at all
        (the Delta txn-action pattern).

        APPEND validates the batch against the logged table schema:
        type conflicts are refused, columns the batch lacks fill with
        NULL, and NEW columns require ``merge_schema=True`` — which
        widens the table schema in this commit; every pre-evolution
        file then reads as NULL for the new column (schema evolution,
        the Delta mergeSchema contract). OVERWRITE replaces the schema
        outright (the whole table is this batch)."""
        self._validate_constraints(df)
        schema_out = df.schema
        if mode == "append" and self.exists():
            current = self.table_schema()
            if current is not None:
                df, schema_out = self._align_to_schema(
                    df, current, merge_schema, "append"
                )
        add = self._write_data_files(
            df, stats_cols, binpack=binpack, bloom_cols=bloom_cols
        )
        for _ in range(max_retries):
            base = self.latest_version()
            # guard AFTER reading base: a commit that lands between this
            # check and ours conflicts on the version slot, so we loop
            # back here and re-check — no window for a stale precondition
            if commit_guard is not None and not commit_guard():
                raise CommitGuardFailed(
                    f"write precondition failed at {self.path} (base {base})"
                )
            remove = (
                [f["path"] for f in self.snapshot_files(base)]
                if mode == "overwrite"
                else []
            )
            record = schema_out
            if mode == "append":
                # re-resolve against the CURRENT log so a retried append
                # can never regress a schema someone widened meanwhile:
                # record only when this commit itself changes the schema
                # (the per-version schema cache never goes stale:
                # commits are immutable, table_schema(v) is pure)
                cur_now = self.table_schema(base) if base > 0 else None
                if cur_now is not None:
                    if schema_out == cur_now:
                        record = None  # no schema change: inherit by walk-back
                    elif not set(cur_now.names) <= set(schema_out.names):
                        raise CommitConflictError(
                            "table schema changed concurrently during "
                            "append; re-run write() against the new schema"
                        )
            try:
                return self._commit(
                    base,
                    mode.upper(),
                    add,
                    remove,
                    meta=dict(extra_meta or {}),
                    schema=record,
                    txn=txn,
                )
            except CommitConflictError:
                continue  # blind write/append: safe to retry on new base
        raise CommitConflictError(f"gave up after {max_retries} retries")

    # ------------------------------------------------------------------
    # MERGE (copy-on-write)
    # ------------------------------------------------------------------
    def merge(
        self,
        source: DataFrame,
        keys: Sequence[str],
        delete_matched: bool = False,
        extra_meta: Optional[Dict[str, Any]] = None,
        delete_keys: Optional[DataFrame] = None,
        max_retries: int = 3,
        merge_schema: bool = False,
        txn: Optional[Dict[str, str]] = None,
        commit_guard=None,
        assume_unique: bool = False,
    ) -> Dict[str, int]:
        """MERGE INTO this table USING source ON keys, with optimistic
        concurrency: a losing writer re-reads the NEW snapshot and
        re-runs the whole candidate/touched/rewrite resolution against
        it (the Delta OCC loop — same discipline as ``write``; data
        files staged by a lost attempt become unreferenced orphans that
        ``vacuum`` removes). Raises CommitConflictError only after
        ``max_retries`` consecutive losses.

        Matched target rows take every non-key column from the source
        (reference ON CONFLICT DO UPDATE contract) — or are deleted when
        ``delete_matched``; unmatched source rows insert (skipped when
        deleting). In-batch duplicates collapse last-wins by key like
        writers._write_upsert. Only data files whose key range
        intersects the source's keys are rewritten.

        ``delete_keys`` (a frame of the key columns): rows matching
        these keys are REMOVED in the SAME commit the source upserts
        publish in — the one-atomic-commit shape incremental view
        maintenance needs (a change-feed batch nets each key to either
        an upsert or a delete; applying them in two commits would open
        a crash window between them). A key in both ``source`` and
        ``delete_keys`` resolves to the source row (delete-then-upsert
        order). Mutually exclusive with ``delete_matched``.

        NULL keys match null-safely (like ``groupBy``, ``_fold`` and
        ``changes()``): a source row whose key is NULL updates the
        existing NULL-key target row instead of inserting a duplicate —
        the matview/SCD2 "state equals one-shot groupBy" invariant
        depends on this. Since parquet footer min/max stats do not
        describe NULLs, a NULL-keyed source row conservatively treats
        every file as a candidate.
        """
        if delete_matched and delete_keys is not None:
            raise ValueError("delete_matched and delete_keys are exclusive")
        if not delete_matched:
            self._validate_constraints(source)
        current = self.table_schema()
        target_schema = current
        record_schema = None
        if current is not None and not delete_matched:
            # MERGE source must carry every existing column — matched
            # rows take EVERY non-key column from the source, so a
            # missing column would silently null out live values
            missing = [n for n in current.names if n not in source.columns]
            if missing:
                raise SchemaMismatchError(
                    f"merge: source lacks table column(s) {missing}; "
                    "MERGE replaces whole rows — provide every column"
                )
            source, aligned_schema = self._align_to_schema(
                source, current, merge_schema, "merge"
            )
            target_schema = aligned_schema
            if aligned_schema != current:
                record_schema = aligned_schema  # this commit widens
        # Materialize the deduped source ONCE for every attempt: the
        # resolution re-reads it >= 3 times (file-range probe, touched-
        # file semi-join, survivor rewrite), and an uncached source plan
        # (often itself a join against the snapshot, e.g.
        # merge_conditional's clause resolution) would re-execute per
        # use — and per OCC retry. Batch-sized state, standard delta-
        # caching posture; also pins ONE in-batch last-wins choice so
        # every phase of the resolution sees the same row per key.
        # ``assume_unique``: the caller guarantees source is already
        # unique on ``keys`` (e.g. it IS a groupBy output on exactly
        # those keys — the matview fold frames), so the last-wins
        # dedup would be an identity computed through a full extra
        # shuffle + aggregate before the persist (r14, guide §1.2:
        # don't compute what you throw away).
        key_list = list(keys)
        src_cached = (
            source if assume_unique else source.dropDuplicates(key_list)
        ).persist()
        dk_cached = (
            delete_keys.select(*key_list).dropDuplicates(key_list).persist()
            if delete_keys is not None
            else None
        )
        try:
            for attempt in range(max_retries):
                try:
                    return self._merge_attempt(
                        src_cached,
                        keys,
                        delete_matched,
                        extra_meta,
                        dk_cached,
                        target_schema,
                        record_schema,
                        txn,
                        commit_guard,
                    )
                except CommitConflictError:
                    if attempt == max_retries - 1:
                        raise
            raise CommitConflictError(f"gave up after {max_retries} retries")
        finally:
            src_cached.unpersist(blocking=False)
            if dk_cached is not None:
                dk_cached.unpersist(blocking=False)

    def _merge_attempt(
        self,
        source: DataFrame,
        keys: Sequence[str],
        delete_matched: bool,
        extra_meta: Optional[Dict[str, Any]],
        delete_keys: Optional[DataFrame],
        target_schema=None,
        record_schema=None,
        txn: Optional[Dict[str, str]] = None,
        commit_guard=None,
    ) -> Dict[str, int]:
        base = self.latest_version()
        # see write(): checked after the base read, so a competing commit
        # conflicts on the slot and the retry re-evaluates the guard
        if commit_guard is not None and not commit_guard():
            raise CommitGuardFailed(
                f"merge precondition failed at {self.path} (base {base})"
            )

        files = self.snapshot_files(base)
        if not files and base == 0:
            raise FileNotFoundError(f"merge target {self.path} is empty")
        key_list = list(keys)

        # merge() hands us the source already key-deduped AND persisted
        # (in-batch last-wins proxy, materialized once for the whole
        # resolution — see merge())
        src = source
        if not files:
            # the table EXISTS but its current snapshot holds no rows
            # (e.g. every row was deleted): MERGE degenerates to pure
            # insert, delete_matched to an audit no-op commit
            add = (
                []
                if delete_matched
                else self._write_data_files(src, key_list)
            )
            v = self._commit(
                base,
                "MERGE" if not delete_matched else "MERGE_DELETE",
                add,
                [],
                meta=dict(extra_meta or {})
                | {"keys": key_list, "files_scanned": 0,
                   "files_pruned": 0, "files_rewritten": 0},
                schema=record_schema,
                txn=txn,
            )
            return {"files_scanned": 0, "files_pruned": 0,
                    "files_rewritten": 0, "version": v}
        # keys whose target rows leave the snapshot OR take new values —
        # the probe that decides which files are candidates/touched
        probe = src.select(*key_list)
        if delete_keys is not None:
            # delete_keys arrives key-projected + deduped (see merge());
            # the cross-frame dedup (a key in both resolves to the
            # source row) still needs one pass over the union
            probe = probe.unionByName(delete_keys).dropDuplicates(key_list)

        # 1. file skipping: a file can contain matches only if SOME
        # source row falls inside its footer [min, max] on EVERY key
        # column — tested per file (not via a global source envelope,
        # which one outlier key would defeat) with a broadcast non-equi
        # join: |files| range rows against one scan of the source.
        from pyspark.sql.types import StringType, StructField, StructType

        src_schema = {f.name: f.dataType for f in src.schema.fields}
        range_fields = [StructField("__path", StringType(), False)]
        for k in key_list:
            range_fields.append(StructField(f"__min_{k}", src_schema[k], True))
            range_fields.append(StructField(f"__max_{k}", src_schema[k], True))
        range_rows = []
        for action in files:
            row: List[Any] = [action["path"]]
            for k in key_list:
                st = (action.get("stats") or {}).get(k)
                row += [st["min"], st["max"]] if st else [None, None]
            range_rows.append(tuple(row))
        ranges = self.spark.createDataFrame(
            range_rows, StructType(range_fields)
        )
        cond = F.lit(True)
        for k in key_list:
            # NULL source key: footer stats say nothing about NULLs, so
            # the row may match any file — keep every candidate
            cond = cond & (
                probe[k].isNull()
                | (
                    (F.col(f"__min_{k}").isNull() | (probe[k] >= F.col(f"__min_{k}")))
                    & (F.col(f"__max_{k}").isNull() | (probe[k] <= F.col(f"__max_{k}")))
                )
            )
        hit_paths = {
            r["__path"]
            for r in probe.join(F.broadcast(ranges), cond)
            .select("__path")
            .distinct()
            .collect()
        }
        candidates = [a for a in files if a["path"] in hit_paths]
        untouched = [a for a in files if a["path"] not in hit_paths]

        stats_cols = sorted(
            set(key_list)
            | {c for a in files for c in (a.get("stats") or {})}
        )
        n_rewritten = 0
        add: List[Dict[str, Any]] = []
        remove: List[str] = []
        touched: List[Dict[str, Any]] = []
        def _null_safe_key_cond(left: str, right: str) -> F.Column:
            c = F.lit(True)
            for k in key_list:
                c = c & F.col(f"{left}.{k}").eqNullSafe(F.col(f"{right}.{k}"))
            return c

        if candidates:
            # 2. touched files = candidate files holding >= 1 key match
            # (the row's file basename maps it to its data file; the
            # DV-aware scan means a merge-on-read-deleted row can never
            # mark its file touched — or resurrect as a survivor);
            # eqNullSafe so NULL-key source rows find NULL-key targets
            cand_df = self._scan(candidates, target_schema, keep_file_col="__f")
            touched_names = {
                r["__f"]
                for r in cand_df.select("__f", *key_list)
                .alias("t")
                .join(
                    F.broadcast(probe.alias("s")),
                    _null_safe_key_cond("t", "s"),
                    "left_semi",
                )
                .select("__f")
                .distinct()
                .collect()
            }
            touched = [
                a
                for a in candidates
                if os.path.basename(a["path"]) in touched_names
            ]
        if touched:
            tgt = self._scan(touched, target_schema)
            survivors = tgt.alias("t").join(
                F.broadcast(probe.alias("s")),
                _null_safe_key_cond("t", "s"),
                "left_anti",
            )
            rewritten = (
                survivors
                if delete_matched
                else survivors.unionByName(src.select(*tgt.columns))
            )
            add = self._write_data_files(rewritten, stats_cols)
            remove = [a["path"] for a in touched]
            n_rewritten = len(touched)
        elif not delete_matched:
            # no key matches anywhere: pure insert, nothing rewritten
            # (delete_keys that match nothing are a no-op by definition)
            sample_cols = (
                list(target_schema.names)
                if target_schema is not None
                else self.spark.read.parquet(files[0]["path"]).columns
            )
            insert_src = src.select(*sample_cols)
            if delete_keys is None or not insert_src.isEmpty():
                add = self._write_data_files(insert_src, stats_cols)
        # else: deleting keys that match nothing -> empty commit (audit)

        self._commit(
            base,
            "MERGE" if not delete_matched else "MERGE_DELETE",
            add,
            remove,
            meta=dict(extra_meta or {})
            | {
                "keys": key_list,
                "files_scanned": len(candidates),
                "files_pruned": len(untouched),
                "files_rewritten": n_rewritten,
            },
            schema=record_schema,
            txn=txn,
        )
        return {
            "files_scanned": len(candidates),
            "files_pruned": len(untouched),
            "files_rewritten": n_rewritten,
            "version": base + 1,
        }

    def lookup_files(
        self, col: str, values: Sequence[Any], version: Optional[int] = None
    ):
        """(candidate add-actions, n_pruned) for a point lookup: a file
        survives only if its footer [min, max] range could contain SOME
        value AND (it has no bloom OR the bloom might contain some
        value). Driver-side metadata only — no data is read."""
        files = self.snapshot_files(version)
        keep = []
        for a in files:
            st = (a.get("stats") or {}).get(col) or {}
            mn, mx = st.get("min"), st.get("max")
            vals = list(values)
            if mn is not None and mx is not None:
                try:
                    vals = [v for v in vals if mn <= v <= mx]
                except TypeError:
                    pass  # incomparable types: the range cannot prune
            if not vals:
                continue
            bloom = st.get("bloom")
            if bloom is not None and not any(
                _bloom_might_contain(bloom, v) for v in vals
            ):
                continue
            keep.append(a)
        return keep, len(files) - len(keep)

    def point_lookup(
        self, col: str, values: Sequence[Any], version: Optional[int] = None
    ) -> DataFrame:
        """Rows where ``col`` IN ``values``, scanning only the files
        ``lookup_files`` keeps (footer ranges + bloom index). The skip
        is conservative — bloom false positives add file scans, never
        wrong answers; files without blooms are always scanned.

        100 TB posture: the needle-in-haystack read path — a key that
        interleaves across files defeats min/max pruning, and without a
        bloom a single-row lookup scans the table. With blooms the scan
        set is |files truly containing the value| + fpp x |files|."""
        keep, _ = self.lookup_files(col, values, version)
        schema = self.table_schema(version)
        if not keep:
            if schema is not None:
                return self.spark.createDataFrame([], schema)
            return self.read(version=version).filter(F.lit(False))
        # DV-aware: a merge-on-read-deleted row must not surface in a
        # point lookup (its value may still pass the file's bloom —
        # blooms stay conservative under DVs, adding scans never rows)
        df = self._scan(keep, schema)
        return df.filter(F.col(col).isin(list(values)))

    def merge_update_set(
        self,
        source: DataFrame,
        keys: Sequence[str],
        set_exprs: Dict[str, str],
        insert_defaults: Optional[Dict[str, str]] = None,
        extra_meta: Optional[Dict[str, Any]] = None,
        txn: Optional[Dict[str, str]] = None,
    ) -> Dict[str, int]:
        """MERGE ... WHEN MATCHED THEN UPDATE SET col = expr — PARTIAL
        column updates computed from BOTH rows (aliases ``s`` = source,
        ``t`` = matched target), e.g. ``{"balance_c": "t.balance_c +
        s.delta_c"}``; unlisted target columns KEEP their values (plain
        ``merge`` replaces whole rows — the reference ON CONFLICT
        contract; this is the Delta UPDATE SET refinement). Unmatched
        source rows insert: ``insert_defaults`` (exprs over ``s``
        alone) decide listed columns, otherwise same-named source
        columns, otherwise typed NULL (a ``t``-referencing set expr has
        no target row to read on the insert side, so it never applies
        there).

        Resolution mirrors merge_conditional: ONE snapshot read
        restricted to candidate rows by a broadcast semi-join on the
        batch's keys, then ONE atomic file-pruned ``merge``."""
        key_list = list(keys)
        current = self.table_schema()
        if current is None:
            raise FileNotFoundError(
                f"merge_update_set target {self.path} has no schema; "
                "create the table first"
            )
        tgt_cols = [f.name for f in current.fields]
        src = source.dropDuplicates(key_list).alias("s")
        target = self.read().alias("t")
        probe = src.select(*[F.col(f"s.{k}").alias(k) for k in key_list])
        tcond = F.lit(True)
        for k in key_list:
            tcond = tcond & F.col(f"t.{k}").eqNullSafe(F.col(f"p.{k}"))
        touched = target.join(
            F.broadcast(probe).alias("p"), tcond, "left_semi"
        ).alias("t")
        cond = F.lit(True)
        for k in key_list:
            cond = cond & F.col(f"s.{k}").eqNullSafe(F.col(f"t.{k}"))
        matched = src.join(touched, cond, "inner")

        def _updated(c: str) -> F.Column:
            if c in set_exprs:
                return F.expr(set_exprs[c]).alias(c)
            return F.col(f"t.{c}").alias(c)

        upserts = matched.select(*[_updated(c) for c in tgt_cols])
        src_cols = set(source.columns)
        defaults = insert_defaults or {}

        tgt_types = {f.name: f.dataType for f in current.fields}

        def _inserted(c: str) -> F.Column:
            if c in defaults:
                return F.expr(defaults[c]).alias(c)
            if c in src_cols:
                return F.col(f"s.{c}").alias(c)
            return F.lit(None).cast(tgt_types[c]).alias(c)

        inserts = (
            src.join(touched, cond, "left_anti")
            .alias("s")
            .select(*[_inserted(c) for c in tgt_cols])
        )
        return self.merge(
            upserts.unionByName(inserts),
            keys=key_list,
            extra_meta=dict(extra_meta or {})
            | {"merge_update_set": dict(set_exprs)},
            txn=txn,
        )

    def merge_conditional(
        self,
        source: DataFrame,
        keys: Sequence[str],
        update_when: Optional[str] = None,
        delete_when: Optional[str] = None,
        insert_when: Optional[str] = None,
        extra_meta: Optional[Dict[str, Any]] = None,
        txn: Optional[Dict[str, str]] = None,
        commit_guard=None,
        not_matched_by_source_delete_when: Optional[str] = None,
    ) -> Dict[str, int]:
        """The full Delta/SQL:2003 conditional MERGE clause set —
        ``WHEN MATCHED AND <update_when> THEN UPDATE``, ``WHEN MATCHED
        AND <delete_when> THEN DELETE``, ``WHEN NOT MATCHED AND
        <insert_when> THEN INSERT`` — publishing in ONE atomic commit.

        ``not_matched_by_source_delete_when``: the Delta ``WHEN NOT
        MATCHED BY SOURCE THEN DELETE`` clause — TARGET rows whose key
        does not appear in the batch and that satisfy the condition
        (over the target row, alias ``t``; pass ``"TRUE"`` for
        unconditional) are deleted in the same commit. This is the
        full-sync/mirror shape: ``merge_conditional(src, keys,
        not_matched_by_source_delete_when="TRUE")`` makes the table
        equal the source. COST CAVEAT, same as Delta's: resolving
        "absent from the source" requires scanning every target row —
        this clause is inherently un-prunable (the rewrite still only
        touches files holding changed rows); scope it with a condition
        on a clustered column when the sync window is known.

        Conditions are SQL boolean expressions over the source row
        (alias ``s``) and the matched target row (alias ``t``), e.g.
        ``"s.price_c > t.price_c"``; a None condition means the clause
        always fires (update_when=None degenerates to plain ``merge``);
        a clause whose condition is None-AND-unfired is simply absent.
        Precedence on a matched row: ``update_when`` first, then
        ``delete_when``, else the target row is KEPT unchanged (plain
        merge replaces it unconditionally — the semantic this method
        exists to refine).

        Implementation: the clause set resolves against the CURRENT
        snapshot into (upserts, delete_keys) and delegates to ``merge``
        — one commit, the same file pruning, footer stats, constraints,
        schema pinning and OCC machinery. The resolution reads the
        snapshot once, restricted to candidate rows by a broadcast
        semi-join on the batch's keys (batch-sized probe, never a fact
        scan). Single-writer note: the resolution pins to the snapshot
        read HERE; a concurrent commit makes merge retry its file
        resolution but not this clause resolution — under multi-writer
        contention wrap the call in the OCC loop yourself or stage it
        under a MultiTableTxn.

        Reference analog: the reference's ON CONFLICT DO UPDATE
        (src/pipeline/persistence/batch_writer.py) is the
        unconditional special case."""
        key_list = list(keys)
        src = source.dropDuplicates(key_list).alias("s")
        target = self.read().alias("t")
        cond = F.lit(True)
        for k in key_list:
            cond = cond & F.col(f"s.{k}").eqNullSafe(F.col(f"t.{k}"))
        # candidate restriction: only target rows whose key appears in
        # the batch participate in clause resolution
        probe = src.select(*[F.col(f"s.{k}").alias(k) for k in key_list])
        tcond = F.lit(True)
        for k in key_list:
            tcond = tcond & F.col(f"t.{k}").eqNullSafe(F.col(f"p.{k}"))
        touched = target.join(
            F.broadcast(probe).alias("p"), tcond, "left_semi"
        ).alias("t")
        matched = src.join(touched, cond, "inner")
        src_cols = [F.col(f"s.{c}").alias(c) for c in source.columns]
        upd = F.expr(update_when) if update_when is not None else F.lit(True)
        del_ = F.expr(delete_when) if delete_when is not None else F.lit(True)
        ins = F.expr(insert_when) if insert_when is not None else F.lit(True)
        upserts = matched.filter(upd).select(*src_cols)
        deletes = (
            matched.filter(~F.coalesce(upd, F.lit(False)))
            .filter(del_)
            .select(*[F.col(f"s.{k}").alias(k) for k in key_list])
        )
        inserts = (
            src.join(touched, cond, "left_anti").filter(ins).select(*src_cols)
        )
        if not_matched_by_source_delete_when is not None:
            # target rows with no batch counterpart: full target anti-
            # join (un-prunable by definition — see docstring), then the
            # caller's condition over the target row
            orphan_keys = (
                target.join(F.broadcast(probe).alias("p"), tcond, "left_anti")
                .filter(F.expr(not_matched_by_source_delete_when))
                .select(*[F.col(f"t.{k}").alias(k) for k in key_list])
            )
            deletes = deletes.unionByName(orphan_keys)
        return self.merge(
            upserts.unionByName(inserts),
            keys=key_list,
            delete_keys=deletes,
            extra_meta=dict(extra_meta or {})
            | {
                "merge_clauses": {
                    "update_when": update_when,
                    "delete_when": delete_when,
                    "insert_when": insert_when,
                    "not_matched_by_source_delete_when": (
                        not_matched_by_source_delete_when
                    ),
                }
            },
            txn=txn,
            commit_guard=commit_guard,
        )

    # ------------------------------------------------------------------
    # delete / compact / vacuum
    # ------------------------------------------------------------------
    def delete(
        self,
        predicate: str,
        mode: str = "cow",
        dv_max_fraction: float = 0.5,
    ) -> Dict[str, int]:
        """Delete rows matching a SQL predicate.

        ``mode='cow'`` (default, the original path): rewrite only the
        files that contain at least one matching row.

        ``mode='dv'`` (merge-on-read, the Delta deletion-vector /
        Iceberg position-delete shape): instead of rewriting, publish a
        position sidecar per touched file and re-add the SAME data file
        under it — the delete costs O(matched rows) of metadata, not a
        rewrite of every touched file. THE selective-delete path at
        100 TB: a 100-row GDPR erasure against 1000 × 128 MiB files is
        1000 tiny sidecars (usually far fewer), zero data rewritten.
        Hybrid fallback, per file (the production heuristic): when the
        ACCUMULATED dead fraction would exceed ``dv_max_fraction`` the
        file is rewritten instead (a mostly-dead file makes every later
        scan pay for rows it filters back out) — and a fully-dead file
        is simply removed. Footer min/max stats of a DV'd file stay
        recorded: they remain CONSERVATIVE bounds (removing rows only
        shrinks the true range), so pruning stays correct; exact
        metadata-only min/max is forfeited for DV'd files (the ``dv``
        marker on the action tells stats readers to rescan).
        The add-action ``rows`` field stays EXACT (live rows)."""
        if mode not in ("cow", "dv"):
            raise ValueError(f"delete mode must be 'cow' or 'dv', got {mode!r}")
        base = self.latest_version()
        files = self.snapshot_files(base)
        schema = self.table_schema(base)
        # Uniform delete semantics, both modes: a row dies iff the
        # predicate evaluates to TRUE on it; FALSE and NULL both
        # survive (ANSI DELETE three-valued logic). survivors keeps
        # NULL rows — plain NOT(predicate) would silently drop them.
        dead_pred = F.expr(predicate).eqNullSafe(F.lit(True))
        survives = ~dead_pred
        if mode == "cow":
            df = self._scan(files, schema, keep_file_col="__f")
            touched = {
                r["__f"]
                for r in df.filter(dead_pred).select("__f").distinct().collect()
            }
            hit = [a for a in files if os.path.basename(a["path"]) in touched]
            if not hit:
                return {"files_rewritten": 0}
            kept = self._scan(hit, schema).filter(survives)
            stats_cols = sorted({c for a in hit for c in (a.get("stats") or {})})
            add = self._write_data_files(kept, stats_cols)
            self._commit(base, "DELETE", add, [a["path"] for a in hit],
                         meta={"predicate": predicate})
            return {"files_rewritten": len(hit)}
        # merge-on-read, two phases. Phase 1: per-file matched-row
        # COUNTS only — O(#touched files) on the driver no matter how
        # broad the predicate is, so a 40%-of-the-table delete never
        # materializes its positions driver-side. _scan hides rows
        # already dead under an existing DV, so new matches are
        # disjoint from old positions and the accumulated dead size is
        # exactly old_dead + matched.
        counts = (
            self._scan(files, schema, keep_file_col="__f")
            .filter(dead_pred)
            .groupBy("__f")
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        if not counts:
            return {"files_rewritten": 0, "files_dv": 0, "files_dropped": 0}
        n_by_file = {r["__f"]: r["__n"] for r in counts}
        add: List[Dict[str, Any]] = []
        remove: List[str] = []
        rewrite_actions: List[Dict[str, Any]] = []
        dv_actions: List[Dict[str, Any]] = []
        n_dv = n_drop = 0
        for a in files:
            name = os.path.basename(a["path"])
            if name not in n_by_file:
                continue
            old_dv = a.get("dv")
            old_dead = old_dv["dead"] if old_dv else 0
            phys = a["rows"] + old_dead
            union_size = old_dead + n_by_file[name]
            remove.append(a["path"])
            if union_size >= phys:
                n_drop += 1  # fully dead: drop the file outright
                continue
            if union_size >= dv_max_fraction * phys:
                rewrite_actions.append(a)
                continue
            dv_actions.append(a)
            n_dv += 1
        if dv_actions:
            # Phase 2: collect positions ONLY for under-threshold files
            # — per file the pre-check bounds the list at
            # dv_max_fraction * rows, so the driver-side footprint is
            # metadata-sized by construction, not by hope.
            dead = (
                self._scan(
                    dv_actions, schema, keep_file_col="__f", keep_pos_col="__p"
                )
                .filter(dead_pred)
                .groupBy("__f")
                .agg(F.collect_list("__p").alias("__pos"))
                .collect()
            )
            by_file = {r["__f"]: sorted(r["__pos"]) for r in dead}
            for a in dv_actions:
                name = os.path.basename(a["path"])
                old_dv = a.get("dv")
                old_positions = self._load_dv(old_dv["path"]) if old_dv else []
                union = sorted(set(old_positions) | set(by_file[name]))
                phys = a["rows"] + (old_dv["dead"] if old_dv else 0)
                dv_path = self._write_dv(a["path"], union)
                new_action = dict(a)
                new_action["rows"] = phys - len(union)
                new_action["dv"] = {"path": dv_path, "dead": len(union)}
                add.append(new_action)
        if rewrite_actions:
            # over-threshold files: COW-rewrite the survivors. _scan
            # already drops previously-DV'd positions and `survives`
            # keeps predicate-NULL rows — the same rows the DV branch
            # would keep alive, so survival never depends on which
            # branch a file took: exactly phys - old_dead - matched
            # rows per file.
            kept = self._scan(rewrite_actions, schema).filter(survives)
            stats_cols = sorted(
                {c for a in rewrite_actions for c in (a.get("stats") or {})}
            )
            add.extend(self._write_data_files(kept, stats_cols))
        self._commit(
            base,
            "DELETE",
            add,
            remove,
            meta={
                "predicate": predicate,
                "mode": "dv",
                "files_dv": n_dv,
                "files_rewritten": len(rewrite_actions),
                "files_dropped": n_drop,
            },
        )
        return {
            "files_rewritten": len(rewrite_actions),
            "files_dv": n_dv,
            "files_dropped": n_drop,
        }

    def compact(
        self,
        target_files: int = 1,
        cluster_by: Optional[Sequence[str]] = None,
        zorder: bool = False,
    ) -> int:
        """Bin-pack the current snapshot into target_files files.
        ``cluster_by``: range-partition + sort the rewrite on those
        columns so each published file holds a disjoint key range —
        footer min/max stats then prune maximally on later MERGEs
        (the OPTIMIZE ... ZORDER role for the 1-D common case).
        ``zorder=True`` with 2+ numeric cluster columns interleaves
        them on a space-filling Z-curve instead of lexicographic range:
        each column is min/max-scaled to 16 bits (one 1-row broadcast
        agg, never a rank window over the table) and the bits
        interleaved into one BIGINT the rewrite range-partitions and
        sorts on — so EVERY cluster column's footer min/max stays tight
        per file and a MERGE keyed on ANY of them prunes, instead of
        only the leading lexicographic column (the multi-column
        OPTIMIZE ZORDER contract)."""
        base = self.latest_version()
        files = self.snapshot_files(base)
        schema = self.table_schema(base)
        # DV-aware: the rewrite PURGES deletion vectors (the Delta
        # OPTIMIZE contract — compacted files carry no DVs)
        df = self._scan(files, schema)
        stats_cols = sorted({c for a in files for c in (a.get("stats") or {})})
        if cluster_by:
            cluster = [str(c) for c in cluster_by]
            stats_cols = sorted(set(stats_cols) | set(cluster))
            if zorder and len(cluster) >= 2:
                n = len(cluster)
                bits = min(16, 63 // n)
                # min/max scale each column to [0, 2^bits): one tiny agg,
                # broadcast as a 1-row frame (no window over the table)
                ranges = df.agg(
                    *[
                        f
                        for c in cluster
                        for f in (
                            F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                            F.max(F.col(c).cast("double")).alias(f"__hi_{c}"),
                        )
                    ]
                )
                df = df.crossJoin(F.broadcast(ranges))
                scaled = []
                for c in cluster:
                    lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
                    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
                    scaled.append(
                        F.least(
                            F.lit((1 << bits) - 1),
                            F.floor(
                                (F.col(c).cast("double") - lo)
                                / span
                                * ((1 << bits) - 1)
                                + 0.5
                            ),
                        ).cast("bigint")
                    )
                # interleave: bit b of column i lands at position b*n+i
                zval = F.lit(0).cast("bigint")
                for b in range(bits):
                    for i, s in enumerate(scaled):
                        zval = zval + F.shiftleft(
                            F.shiftright(s, b).bitwiseAND(F.lit(1)), b * n + i
                        )
                df = (
                    df.withColumn("__zval", zval)
                    .repartitionByRange(target_files, "__zval")
                    .sortWithinPartitions("__zval")
                    .drop("__zval", *[f"__lo_{c}" for c in cluster],
                          *[f"__hi_{c}" for c in cluster])
                )
            else:
                df = df.repartitionByRange(
                    target_files, *cluster
                ).sortWithinPartitions(*cluster)
            # binpack=False: the clustered layout IS the pruning structure
            add = self._write_data_files(df, stats_cols, binpack=False)
        else:
            add = self._write_data_files(df.coalesce(target_files), stats_cols)
        return self._commit(
            base,
            "COMPACT",
            add,
            [a["path"] for a in files],
            meta={"cluster_by": list(cluster_by or []), "zorder": bool(zorder)},
        )

    def compact_small(
        self,
        small_bytes: int = 32 * 1024 * 1024,
        target_files: int = 1,
    ) -> Dict[str, int]:
        """Incremental OPTIMIZE (the Delta small-file compaction
        policy): bin-pack ONLY the live files smaller than
        ``small_bytes``, leaving right-sized files untouched — on a
        100 TB table that accreted a tail of per-batch dimension files,
        this rewrites the tail, not the table. File selection is
        driver-side metadata (one size stat per live file); the rewrite
        is DV-aware, so deletion vectors on the small files are purged
        (big files keep theirs — compact() purges everything). Fewer
        than two small files is a no-op (nothing to pack)."""
        base = self.latest_version()
        files = self.snapshot_files(base)
        small = [
            a for a in files if os.path.getsize(a["path"]) < small_bytes
        ]
        if len(small) < 2:
            return {"files_compacted": 0, "files_kept": len(files)}
        schema = self.table_schema(base)
        df = self._scan(small, schema)
        stats_cols = sorted({c for a in small for c in (a.get("stats") or {})})
        add = self._write_data_files(df.coalesce(target_files), stats_cols)
        self._commit(
            base,
            "COMPACT_SMALL",
            add,
            [a["path"] for a in small],
            meta={"small_bytes": small_bytes, "files_compacted": len(small)},
        )
        return {
            "files_compacted": len(small),
            "files_kept": len(files) - len(small),
        }

    def restore(self, version: int) -> int:
        """Delta-style RESTORE: publish a NEW commit whose live file set
        equals the target version's — history stays intact (the restore
        is itself a version; time travel still reaches everything).
        Raises if the target's data files were already vacuumed."""
        base = self.latest_version()
        if not 1 <= version <= base:
            raise ValueError(f"cannot restore to v{version} (latest is v{base})")
        target = self.snapshot_files(version)
        missing = [a["path"] for a in target if not os.path.exists(a["path"])]
        missing += [
            a["dv"]["path"]
            for a in target
            if a.get("dv") and not os.path.exists(a["dv"]["path"])
        ]
        if missing:
            raise FileNotFoundError(
                f"restore to v{version} impossible: {len(missing)} data "
                f"file(s) vacuumed, e.g. {missing[0]}"
            )
        # identity includes the deletion vector: restoring across a DV
        # delete must re-publish the path under its OLD (or no) DV,
        # which a path-only diff would silently skip
        current = self.snapshot_files(base)
        t_ids = {self._action_ident(a) for a in target}
        c_ids = {self._action_ident(a) for a in current}
        add = [a for a in target if self._action_ident(a) not in c_ids]
        remove = sorted(
            a["path"] for a in current if self._action_ident(a) not in t_ids
        )
        restored_schema = self.table_schema(version)
        if restored_schema == self.table_schema(base):
            restored_schema = None  # unchanged: inherit by walk-back
        return self._commit(
            base,
            "RESTORE",
            add,
            remove,
            meta={"restored_to": version},
            schema=restored_schema,
        )

    def fsck(self) -> Dict[str, Any]:
        """Log/file integrity audit (the Delta FSCK role) — metadata
        only, no data scan. Checks, across the whole commit history:

        - every LIVE add-action's data file exists on disk (a missing
          live file = unreadable snapshot: reported as ``missing``);
        - no version gaps in the commit sequence;
        - every remove references a path some earlier commit added;
        - no path is added twice while live (double-add would make
          replay order-dependent);
        - unresolved txn commits are surfaced (they block writers).

        Returns a report dict; ``ok`` is True when nothing is broken.
        Historical (non-live) adds whose files were vacuumed are NORMAL
        and only counted (``vacuumed_history``)."""
        latest = self.latest_version()
        report: Dict[str, Any] = {
            "versions": latest,
            "missing": [],
            "gaps": [],
            "orphan_removes": [],
            "double_adds": [],
            "pending_txns": [],
            "vacuumed_history": 0,
        }
        ever_added: set = set()
        live: Dict[str, Dict[str, Any]] = {}
        for v in range(1, latest + 1):
            try:
                commit = self._read_commit(v)
            except FileNotFoundError:
                report["gaps"].append(v)
                continue
            state = self._txn_state(commit)
            if state == "pending":
                report["pending_txns"].append(
                    {"version": v, "txn_id": commit["txn"]["id"]}
                )
            if state in ("pending", "aborted"):
                continue
            for path in commit["remove"]:
                if path not in ever_added:
                    report["orphan_removes"].append(
                        {"version": v, "path": path}
                    )
                live.pop(path, None)
            for action in commit["add"]:
                p = action["path"]
                if p in live:
                    report["double_adds"].append({"version": v, "path": p})
                ever_added.add(p)
                live[p] = action
        for p in sorted(live):
            if not os.path.exists(p):
                report["missing"].append(p)
            dv = live[p].get("dv")
            if dv and not os.path.exists(dv["path"]):
                # a missing live deletion vector is as fatal as a
                # missing data file: deleted rows would resurrect
                report["missing"].append(dv["path"])
        report["vacuumed_history"] = sum(
            1
            for p in ever_added - set(live)
            if not os.path.exists(p)
        )
        report["live_files"] = len(live)
        report["ok"] = not (
            report["missing"]
            or report["gaps"]
            or report["orphan_removes"]
            or report["double_adds"]
        )
        return report

    def vacuum(
        self, retain_versions: int = 0, dry_run: bool = False
    ) -> List[str]:
        """Remove data files unreferenced by the newest
        ``retain_versions + 1`` snapshots. The default (0) keeps only
        the latest — Delta's aggressive vacuum; a retention window
        keeps time travel (and RESTORE) to the retained versions
        intact, the Delta retention-hours contract expressed in
        versions (deterministic — this engine has no wall-clock
        dependence anywhere). ``dry_run``: report what WOULD be removed
        without touching anything (the Delta VACUUM DRY RUN contract —
        run it before an aggressive vacuum on a table with clones)."""
        latest = self.latest_version()
        live: set = set()
        live_dv: set = set()
        for v in range(max(1, latest - retain_versions), latest + 1):
            snap = self.snapshot_files(v)
            live |= {a["path"] for a in snap}
            live_dv |= {a["dv"]["path"] for a in snap if a.get("dv")}
        # Files staged by an UNRESOLVED multi-table txn are in no
        # snapshot yet (snapshot_files skips pending commits), but
        # deleting them would corrupt the table the moment the
        # coordinator's committed marker lands — the commit becomes
        # visible and references vanished files (permanent data loss).
        # A pending commit blocks successors (TxnPendingError), so it
        # can only ever be the tip: protect the tip's add-actions while
        # its txn is undecided. Aborted txns' files stay collectable.
        if latest > 0:
            tip = self._read_commit(latest)
            if self._txn_state(tip) == "pending":
                live |= {a["path"] for a in tip["add"]}
                live_dv |= {
                    a["dv"]["path"] for a in tip["add"] if a.get("dv")
                }
        removed = []
        for name in os.listdir(self.path):
            full = os.path.join(self.path, name)
            if name.endswith(".parquet") and full not in live:
                if not dry_run:
                    os.remove(full)
                removed.append(full)
        # deletion-vector sidecars: orphaned when their file version
        # left the retained snapshots (rewrite/compact/restore/newer DV)
        dv_dir = os.path.join(self.path, _DV_DIR)
        if os.path.isdir(dv_dir):
            for name in os.listdir(dv_dir):
                full = os.path.join(dv_dir, name)
                if name.endswith(".json") and full not in live_dv:
                    if not dry_run:
                        os.remove(full)
                    removed.append(full)
        return removed
