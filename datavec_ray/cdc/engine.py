"""Hash-partitioned LWW upsert engine with exactly-once Parquet lake sink.

The north-star design (BASELINE.json north_star, SURVEY.md §7):

    binlog segments (LSN ranges)
      → stateless transform steps (fused map_batches, zero-copy Arrow)
      → schema normalization against a SchemaRegistry actor
        (pa.unify_schemas: additive columns e.g. `tool`, int widening)
      → Router map_batches tasks hash events on (conv_id [, salted
        turn_idx]) and fan sub-batches out to P UpsertShard actors
      → each shard holds last-writer-wins state keyed (conv_id,
        turn_idx), value (ts, lsn): an event wins iff its (ts, lsn) is
        strictly greater; "D" stores a tombstone (must survive to
        commit so late stale updates stay dead)
      → checkpoint: per-shard state snapshot parquet + manifest entry
        with the segment's LSN watermark; resume = load snapshots +
        replay only lsn > watermark
      → commit: per-partition lake files written to temp + atomic
        rename, then a manifest commit entry per partition with lineage
        {partition, lsn_lo, lsn_hi, rows_applied, stale_dropped
        (dedup), deletes, rows}

Correctness under retries: the LWW merge is idempotent and commutative
((ts, lsn)-argmax per key), so Ray task retries / duplicate delivery
cannot change the final state — exactly-once at the SINK is provided by
idempotent file names + the atomic manifest, not by fragile
exactly-once delivery. This is the standard lake-upsert recipe; the
reference has no streaming/CDC machinery at all (SURVEY.md §2.18), its
transform semantics apply in the stateless step stage.

Scale notes: per-shard state is a Python dict of small tuples —
per-partition point updates after a VECTORIZED per-batch pre-compaction
(sort + run-boundary argmax) that collapses each batch to one winner
per key, so dict traffic is per-key, not per-event. At 10^10 events the
same layout shards across nodes by raising num_partitions (state is
per-actor and never crosses the driver); hot conversations are salted
across sub-partitions via `salt_turns` (partition key includes
turn_idx % salt for hot conv_ids, deterministic per row key).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from datavec_ray.cdc.binlog import BINLOG_SCHEMA, TRANSCRIPT_SCHEMA
from datavec_ray.hll import hash64

PAYLOAD_COLS = ["role", "text", "tool"]


# ---------------------------------------------------------------------------
# Vectorized LWW compaction of one table (the hot kernel)
# ---------------------------------------------------------------------------

def lww_compact_table(tbl: pa.Table, drop_tombstones: bool,
                      carry_watermark: bool = False) -> pa.Table:
    """Keep only the (ts, lsn)-argmax event per (conv_id, turn_idx).

    Vectorized argmax WITHOUT a string sort: dictionary-encode conv_id to
    integer codes (grouping does not need lexicographic order), then one
    ``np.lexsort`` over four int64 key arrays and a run-boundary mask.
    Int sorts are ~5× faster than Arrow string sorts on wide tables —
    this is the hot kernel of the whole upsert path. Output rows are
    compacted but NOT conv_id-sorted (callers that need order — flush,
    final comparisons — sort once at the end).

    ``carry_watermark=True`` appends/propagates a ``__wm`` int64 column:
    the max LSN EVER SEEN per key, which can exceed the surviving row's
    lsn (an event with the highest lsn may lose LWW to a later-ts event).
    The replay path uses it so checkpoint watermarks reflect every
    delivered event, not just the winners.
    """
    n = tbl.num_rows
    if n == 0:
        return tbl
    conv = tbl["conv_id"].combine_chunks()
    codes = pc.dictionary_encode(conv).indices.to_numpy(
        zero_copy_only=False).astype(np.int64)
    turn = tbl["turn_idx"].combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    ts_col = tbl["ts"].combine_chunks()
    if pa.types.is_timestamp(ts_col.type):
        ts_col = ts_col.cast(pa.int64())
    ts = pc.fill_null(ts_col, 0).to_numpy(zero_copy_only=False)
    lsn = pc.fill_null(tbl["lsn"].combine_chunks(), 0).to_numpy(
        zero_copy_only=False)
    order = np.lexsort((lsn, ts, turn, codes))
    k1, k2 = codes[order], turn[order]
    last = np.ones(n, dtype=bool)
    if n > 1:
        last[:-1] = (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])
    out = tbl.take(pa.array(order[last], type=pa.int64()))
    if carry_watermark:
        seen = lsn
        if "__wm" in tbl.column_names:  # re-compaction of pre-compacted data
            wm_in = pc.fill_null(tbl["__wm"].combine_chunks(), 0).to_numpy(
                zero_copy_only=False)
            seen = np.maximum(seen, wm_in)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])
        run_max = np.maximum.reduceat(seen[order], np.flatnonzero(first)) \
            if n else np.array([], dtype=np.int64)
        if "__wm" in out.column_names:
            out = out.drop_columns(["__wm"])
        out = out.append_column(pa.field("__wm", pa.int64()),
                                pa.array(run_max, type=pa.int64()))
    if drop_tombstones:
        out = out.filter(pc.not_equal(out["op"], "D"))
    return out


def sort_conv_turn(tbl: pa.Table) -> pa.Table:
    """Sort by (conv_id asc, turn_idx asc) without a row-level string
    sort: dictionary-encode conv_id (distinct convs are ~100-1000x fewer
    than rows), lexicographically rank the SMALL dictionary, then one
    int64 np.lexsort over (rank, turn) and a single take. Same output
    order as Table.sort_by, ~3-5x faster on string-heavy tables."""
    n = tbl.num_rows
    if n <= 1:
        return tbl
    d = pc.dictionary_encode(tbl["conv_id"].combine_chunks())
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dict_vals = d.dictionary.to_numpy(zero_copy_only=False)
    rank_of_code = np.empty(len(dict_vals), dtype=np.int64)
    rank_of_code[np.argsort(dict_vals, kind="stable")] = \
        np.arange(len(dict_vals))
    turn = tbl["turn_idx"].combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    order = np.lexsort((turn, rank_of_code[codes]))
    return tbl.take(pa.array(order, type=pa.int64()))


def normalize_to_schema(tbl: pa.Table, schema: pa.Schema) -> pa.Table:
    """Schema evolution at the batch level: add missing columns as nulls,
    cast widened columns, order columns canonically (pa.unify_schemas
    decides the canonical schema in the SchemaRegistry)."""
    arrays = []
    for field in schema:
        if field.name in tbl.column_names:
            col = tbl[field.name]
            if col.type != field.type:
                col = col.cast(field.type)
            arrays.append(col)
        else:
            arrays.append(pa.nulls(tbl.num_rows, type=field.type))
    return pa.table(arrays, schema=schema)


def assign_partitions(conv_id: pa.ChunkedArray | pa.Array,
                      turn_idx: pa.ChunkedArray | pa.Array,
                      num_partitions: int, salt_turns: int = 1,
                      hot_convs: Optional[frozenset] = None) -> np.ndarray:
    """Deterministic partition per row key. Hot conversations are salted:
    their partition also depends on turn_idx % salt_turns, spreading one
    hot conv over `salt_turns` partitions while keeping each (conv_id,
    turn_idx) key on exactly one partition (required for LWW ownership)."""
    conv_arr = (conv_id.combine_chunks() if isinstance(conv_id, pa.ChunkedArray)
                else conv_id)
    h = hash64(conv_arr)  # vectorized string hash (polars fast path)
    if salt_turns > 1 and hot_convs:
        conv_np = conv_arr.to_numpy(zero_copy_only=False)
        turn_np = (turn_idx.combine_chunks() if isinstance(turn_idx, pa.ChunkedArray)
                   else turn_idx).to_numpy(zero_copy_only=False).astype(np.int64)
        is_hot = np.isin(conv_np, list(hot_convs))
        h = np.where(is_hot, h + (turn_np % salt_turns).astype(np.uint64) *
                     np.uint64(0x9E3779B97F4A7C15), h)
    return (h % np.uint64(num_partitions)).astype(np.int64)


# ---------------------------------------------------------------------------
# Actors
# ---------------------------------------------------------------------------

def _shard_cls():
    import ray

    @ray.remote
    class UpsertShard:
        """One logical partition of LWW state — COLUMNAR.

        State is a list of Arrow segments (lsn, op, conv_id,
        turn_idx:int64, role, text, tool, ts:int64-ms); apply() only
        appends, and a vectorized LWW compaction (sort + run-boundary
        argmax, lww_compact_table) runs whenever the uncompacted tail
        outgrows the compacted base — an LSM-style merge with zero
        Python-per-row work. Tombstones ("D" rows) survive compaction
        until commit so stale late updates cannot resurrect deleted keys.
        """

        _COLS = ["lsn", "op", "conv_id", "turn_idx", "role", "text",
                 "tool", "ts"]

        def __init__(self, pid: int, spill_dir: Optional[str] = None,
                     spill_threshold_rows: int = 5_000_000):
            self.pid = pid
            self.segments: list[pa.Table] = []
            self.pending = 0          # rows appended since last compaction
            self.base = 0             # rows in the compacted base
            self.applied = 0          # events routed here (incl. replays)
            self.msgs = 0             # apply() calls processed (barrier)
            self.stale = 0            # events superseded by LWW (dedup count)
            self.lsn_lo: Optional[int] = None
            self.lsn_hi: Optional[int] = None
            # L1 spill level: when the compacted in-memory base outgrows
            # spill_threshold_rows, it is written to an immutable parquet
            # run and dropped from the heap — actor memory stays bounded
            # by the hot tail at 10^10-event scale; runs re-merge
            # (leveled) when too many accumulate, and every read path
            # (flush/snapshot) compacts disk runs + memory together.
            self.spill_dir = spill_dir
            self.spill_threshold_rows = spill_threshold_rows
            self.spill_runs: list[str] = []
            self.spilled_rows = 0
            self._spill_seq = 0

        def _norm(self, tbl: pa.Table) -> pa.Table:
            """Canonical internal layout: turn_idx int64, ts int64 (ms).
            Missing payload columns (pre-evolution segments) become null."""
            n = tbl.num_rows
            arrays, fields = [], []
            for c in self._COLS:
                if c in tbl.column_names:
                    col = tbl[c]
                    if c == "turn_idx":
                        col = col.cast(pa.int64())
                    elif c == "ts":
                        unit = col.type.unit if pa.types.is_timestamp(col.type) else "ms"
                        col = col.cast(pa.int64())
                        scale = {"s": 1000, "ms": 1, "us": 1, "ns": 1}[unit]
                        if unit == "us":
                            col = pc.divide(col, 1000)
                        elif unit == "ns":
                            col = pc.divide(col, 1_000_000)
                        elif unit == "s":
                            col = pc.multiply(col, 1000)
                else:
                    col = pa.nulls(n, pa.string())
                arrays.append(col)
                fields.append(pa.field(c, arrays[-1].type if not isinstance(
                    arrays[-1], pa.ChunkedArray) else arrays[-1].type))
            return pa.table(arrays, names=self._COLS)

        def _compact(self) -> pa.Table:
            if len(self.segments) == 1 and self.pending == 0:
                return self.segments[0]
            merged = pa.concat_tables(self.segments, promote_options="permissive") \
                if len(self.segments) > 1 else (self.segments[0] if self.segments
                                                else None)
            if merged is None:
                empty = pa.table({c: pa.array([], pa.string()) for c in self._COLS})
                return empty
            before = merged.num_rows
            out = lww_compact_table(merged, drop_tombstones=False)
            self.stale += before - out.num_rows
            self.segments = [out]
            self.pending = 0
            self.base = out.num_rows
            return out

        def apply(self, tbl: pa.Table) -> int:
            self.msgs += 1
            n_in = tbl.num_rows
            if n_in == 0:
                return 0
            self.applied += n_in
            lo = pc.min(tbl["lsn"]).as_py()
            hi = pc.max(tbl["lsn"]).as_py()
            self.lsn_lo = lo if self.lsn_lo is None else min(self.lsn_lo, lo)
            self.lsn_hi = hi if self.lsn_hi is None else max(self.lsn_hi, hi)
            self.segments.append(self._norm(tbl))
            self.pending += n_in
            # LSM-ish trigger: compact when the tail clearly outgrows the
            # base (large floor — mid-ingest compactions stall every router
            # waiting on this shard; checkpoint/flush compact anyway)
            if self.pending > max(2_000_000, 2 * self.base):
                self._compact()
                self._maybe_spill()
            return n_in

        # -- L1 spill level ---------------------------------------------
        def _maybe_spill(self) -> None:
            if not self.spill_dir or self.base <= self.spill_threshold_rows:
                return
            os.makedirs(self.spill_dir, exist_ok=True)
            path = os.path.join(
                self.spill_dir, f"run-{self.pid:04d}-{self._spill_seq:06d}.parquet")
            self._spill_seq += 1
            tmp = path + ".tmp"
            pq.write_table(self.segments[0], tmp)
            os.replace(tmp, path)
            self.spill_runs.append(path)
            self.spilled_rows += self.base
            self.segments, self.pending, self.base = [], 0, 0
            if len(self.spill_runs) > 8:   # leveled re-merge
                merged = lww_compact_table(
                    pa.concat_tables([pq.read_table(p)
                                      for p in self.spill_runs],
                                     promote_options="permissive"),
                    drop_tombstones=False)
                path = os.path.join(
                    self.spill_dir,
                    f"run-{self.pid:04d}-{self._spill_seq:06d}.parquet")
                self._spill_seq += 1
                tmp = path + ".tmp"
                pq.write_table(merged, tmp)
                os.replace(tmp, path)
                for p in self.spill_runs:
                    try:
                        os.remove(p)
                    except OSError:
                        pass
                self.spill_runs = [path]
                self.spilled_rows = merged.num_rows

        def _full_state(self) -> pa.Table:
            """Disk runs + memory, LWW-compacted (tombstones kept)."""
            mem = self._compact()
            if not self.spill_runs:
                return mem
            parts = [self._norm(pq.read_table(p)) for p in self.spill_runs]
            if mem.num_rows:
                parts.append(mem)
            before = sum(p.num_rows for p in parts)
            out = lww_compact_table(
                pa.concat_tables(parts, promote_options="permissive"),
                drop_tombstones=False)
            self.stale += before - out.num_rows
            return out

        # -- state serde ------------------------------------------------
        def snapshot(self, path: str) -> dict:
            state = self._full_state()
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            pq.write_table(state, tmp)
            os.replace(tmp, path)
            return {"partition": self.pid, "keys": state.num_rows,
                    "lsn_hi": self.lsn_hi}

        def load_snapshot(self, path: str) -> int:
            # handles both legacy full snapshots and sidecar checkpoints
            d, base = os.path.split(path)
            pid = int(base.split("-")[1].split(".")[0])
            tbl = read_checkpoint_partition(d, pid)
            if tbl is None:
                return 0
            self.segments.append(self._norm(tbl))
            self.pending += tbl.num_rows
            if tbl.num_rows:
                # restore LSN watermarks so a post-resume commit() can
                # tell whether this partition has new data vs its last
                # committed lsn_hi
                lo = pc.min(tbl["lsn"]).as_py()
                hi = pc.max(tbl["lsn"]).as_py()
                self.lsn_lo = lo if self.lsn_lo is None else min(self.lsn_lo, lo)
                self.lsn_hi = hi if self.lsn_hi is None else max(self.lsn_hi, hi)
            return tbl.num_rows

        def flush(self, path: str, turn_idx_type: str = "int32") -> dict:
            """Write this partition's live rows (idempotent: temp + atomic
            rename), sorted by (conv_id, turn_idx). Returns lineage."""
            state = self._full_state()
            deletes = int(pc.sum(pc.cast(pc.equal(state["op"], "D"),
                                         pa.int64())).as_py() or 0)
            live = state.filter(pc.not_equal(state["op"], "D"))
            live = sort_conv_turn(live)
            t_turn = pa.int64() if turn_idx_type == "int64" else pa.int32()
            tbl = pa.table({
                "conv_id": live["conv_id"],
                "turn_idx": live["turn_idx"].cast(t_turn),
                "role": live["role"],
                "text": live["text"],
                "tool": live["tool"],
                "ts": live["ts"].cast(pa.timestamp("ms")),
            })
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            pq.write_table(tbl, tmp)
            os.replace(tmp, path)
            return {"partition": self.pid, "file": os.path.basename(path),
                    "rows": tbl.num_rows, "events_applied": self.applied,
                    "stale_dropped": self.stale, "deletes": deletes,
                    "lsn_lo": self.lsn_lo, "lsn_hi": self.lsn_hi}

        def stats(self) -> dict:
            return {"partition": self.pid, "keys": self.base,
                    "applied": self.applied, "stale": self.stale,
                    "lsn_hi": self.lsn_hi,
                    "spill_runs": len(self.spill_runs),
                    "spilled_rows": self.spilled_rows}

        def ack_counter(self) -> int:
            """Number of apply() calls processed — the router-mode
            delivery barrier (`CdcIngestEngine._router_barrier`)."""
            return self.msgs

        def watermark(self) -> Optional[int]:
            return self.lsn_hi

    return UpsertShard


def _registry_cls():
    import ray

    @ray.remote(num_cpus=0)
    class SchemaRegistry:
        """Arrow-schema-unification actor: holds the canonical schema,
        evolves it additively / by widening via pa.unify_schemas.
        With ``compat_mode`` set (backward/forward/full), an evolution
        whose UNIFIED schema would break that compatibility vs the
        current canonical is rejected BEFORE any lake write
        (``cdc/compat.py``)."""

        def __init__(self, initial: Optional[bytes] = None,
                     compat_mode: Optional[str] = None):
            self.schema: Optional[pa.Schema] = (
                pa.ipc.read_schema(pa.BufferReader(initial)) if initial else None)
            self.compat_mode = compat_mode

        def evolve(self, schema_bytes: bytes) -> bytes:
            incoming = pa.ipc.read_schema(pa.BufferReader(schema_bytes))
            if self.schema is None:
                self.schema = incoming
            else:
                unified = pa.unify_schemas([self.schema, incoming],
                                           promote_options="permissive")
                if self.compat_mode and not unified.equals(self.schema):
                    from datavec_ray.cdc.compat import (SchemaCompatError,
                                                        check_compatibility)
                    probs = check_compatibility(self.schema, unified,
                                                self.compat_mode)
                    if probs:
                        raise SchemaCompatError(
                            f"segment schema evolution violates "
                            f"{self.compat_mode} compatibility: "
                            + "; ".join(probs))
                self.schema = unified
            return self.schema.serialize().to_pybytes()

        def current(self) -> Optional[bytes]:
            return self.schema.serialize().to_pybytes() if self.schema else None

    return SchemaRegistry


# ---------------------------------------------------------------------------
# Manifest (commit log)
# ---------------------------------------------------------------------------

class WriterFencedError(RuntimeError):
    """A newer writer epoch opened this lake — this engine instance is
    a zombie (e.g. a resumed job while the crashed one's process still
    lives) and must not commit."""

class Manifest:
    """Append-only JSON-lines commit log, atomically rewritten
    (tmp + rename) on every append — the single-committer invariant is
    held by the driver, which is the only writer."""

    def __init__(self, path: str):
        self.path = path
        self.entries: list[dict] = []
        self.reload()

    def reload(self) -> None:
        """Re-read the manifest file (cross-process readers — e.g. a
        replication follower polling another writer's lake). The file
        is the source of truth: every append is durably written."""
        entries: list[dict] = []
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        entries.append(json.loads(line))
                    except json.JSONDecodeError:
                        # torn write from a crash mid-append — the entry
                        # never durably committed (fsync hadn't returned),
                        # so dropping it is the correct recovery; append()
                        # newline-guards so later entries stay parseable
                        continue
        self.entries = entries

    def append(self, entry: dict) -> None:
        """O(1) durable append (write one line + fsync) — the manifest
        is the per-commit hot path of a 10^10-event run, so it must not
        rewrite its whole history each time. A crash mid-append leaves
        at most one torn line, which load skips; before appending after
        such a crash the file is re-terminated with a newline so the
        new entry starts on its own line."""
        self.entries.append(entry)
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        needs_nl = False
        try:
            if os.path.getsize(self.path) > 0:
                with open(self.path, "rb") as rf:
                    rf.seek(-1, os.SEEK_END)
                    needs_nl = rf.read(1) != b"\n"
        except OSError:
            pass
        with open(self.path, "a") as f:
            if needs_nl:
                f.write("\n")
            f.write(json.dumps(entry) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def max_epoch(self) -> int:
        """Highest writer epoch ever opened on this lake (0 if none)."""
        return max((e.get("epoch", 0) for e in self.entries
                    if e.get("type") == "writer_open"), default=0)

    def reload_max_epoch(self) -> int:
        """Re-read the manifest FILE for the highest writer epoch —
        detects another process having taken over since we loaded."""
        try:
            mx = 0
            with open(self.path) as f:
                for line in f:
                    if line.strip():
                        e = json.loads(line)
                        if e.get("type") == "writer_open":
                            mx = max(mx, e.get("epoch", 0))
            return mx
        except FileNotFoundError:
            return 0

    def watermark(self) -> int:
        """Highest LSN through which state is durably checkpointed."""
        wm = 0
        for e in self.entries:
            if e.get("type") in ("checkpoint", "commit"):
                wm = max(wm, e.get("lsn_hi") or 0)
        return wm

    def committed_partitions(self) -> set[int]:
        return {e["partition"] for e in self.entries if e.get("type") == "commit"}

    def committed_watermarks(self) -> dict[int, Optional[int]]:
        """partition → lsn_hi of its LAST commit entry (later entries win)."""
        out: dict[int, Optional[int]] = {}
        for e in self.entries:
            if e.get("type") == "commit":
                out[e["partition"]] = e.get("lsn_hi")
        return out

    def last_checkpoint(self) -> Optional[dict]:
        cps = [e for e in self.entries if e.get("type") == "checkpoint"]
        return cps[-1] if cps else None


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

class _Router:
    """map_batches body: normalize schema, pre-compact, hash-partition and
    fan out to the shard actors. Applies are FIRE-AND-FORGET behind a
    bounded in-flight window (``ray.wait`` drains above ``window``
    outstanding acks), so one hot shard mid-compaction no longer stalls
    every router slot — the router keeps routing while the hot shard
    catches up, and backpressure engages only when the window fills.
    Returns a tiny ack table of (pid, msgs, rows) SUBMISSION counts; the
    engine barriers on actual delivery by polling each shard's
    ``ack_counter`` (``_router_barrier``) before returning from ingest,
    so checkpoint/commit never run ahead of an in-flight apply."""

    def __init__(self, handles, num_partitions: int, schema: pa.Schema,
                 salt_turns: int, hot_convs: Optional[frozenset],
                 min_lsn_exclusive: int, window: int = 0,
                 dlq_dir: Optional[str] = None, expectations=None):
        self.handles = handles
        self.num_partitions = num_partitions
        self.schema = schema
        self.salt_turns = salt_turns
        self.hot_convs = hot_convs
        self.min_lsn = min_lsn_exclusive
        self.window = window or max(8, 4 * num_partitions)
        self.dlq_dir = dlq_dir
        self.expectations = expectations
        self.pending: list = []

    _ACK_SCHEMA = pa.schema([("pid", pa.int32()), ("msgs", pa.int64()),
                             ("rows", pa.int64())])

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray
        if self.min_lsn:
            batch = batch.filter(pc.greater(batch["lsn"], self.min_lsn))
        if self.dlq_dir is not None:
            batch, bad = split_invalid_events(batch, self.expectations)
            if bad.num_rows:
                _write_dlq(bad, self.dlq_dir)
        batch = normalize_to_schema(batch, self.schema)
        batch = lww_compact_table(batch, drop_tombstones=False)
        if batch.num_rows == 0:
            return self._ACK_SCHEMA.empty_table()
        parts = assign_partitions(batch["conv_id"], batch["turn_idx"],
                                  self.num_partitions, self.salt_turns,
                                  self.hot_convs)
        pids, rows = [], []
        for pid in np.unique(parts):
            sub = batch.filter(pa.array(parts == pid))
            self.pending.append(self.handles[int(pid)].apply.remote(sub))
            pids.append(int(pid))
            rows.append(sub.num_rows)
        if len(self.pending) > self.window:
            _, rest = ray.wait(self.pending,
                               num_returns=len(self.pending) - self.window)
            self.pending = list(rest)
        return pa.table({"pid": pa.array(pids, pa.int32()),
                         "msgs": pa.array(np.ones(len(pids), np.int64)),
                         "rows": pa.array(rows, pa.int64())})


def detect_hot_convs(ds, sample_frac: Optional[float] = 0.02,
                     hot_multiple: float = 20.0, max_hot: int = 64,
                     seed: int = 7) -> list[str]:
    """Sample-based hot-conversation detection for salting (the skew
    handling the north rule requires explicitly): sample the binlog,
    count events per conv_id, return convs whose sampled share exceeds
    ``hot_multiple``x the mean — candidates for `salt_turns` spreading.
    One cheap pass over a sample; no full shuffle. ``sample_frac=None``
    picks the fraction adaptively so at least ~50k rows (or the whole
    segment, if smaller) are sampled — a 2% sample of a small segment
    is too noisy for the 20x threshold."""
    import pyarrow as pa

    from datavec_ray.util import dataset_to_table

    if sample_frac is None:
        n = ds.count()
        sample_frac = min(1.0, max(0.02, 50_000 / max(1, n)))
    sampled = dataset_to_table(
        ds.select_columns(["conv_id"]).random_sample(sample_frac, seed=seed))
    if sampled.num_rows == 0:
        return []
    counts = sampled.group_by("conv_id").aggregate([("conv_id", "count")])
    n = counts.num_rows
    mean = sampled.num_rows / max(1, n)
    mask = pc.greater(counts["conv_id_count"], mean * hot_multiple)
    hot = counts.filter(mask)
    hot = hot.sort_by([("conv_id_count", "descending")]).slice(0, max_hot)
    return hot["conv_id"].to_pylist()


_VALID_OPS = pa.array(["I", "U", "D"])


def _expectation_masks(batch: pa.Table, expectations) -> list[tuple]:
    """Row-level violation masks for ingest-time expectations (the
    Delta-Live-Tables "expect or quarantine" gate). Rule schema matches
    datavec_ray.expect's inline checks — not_null / min_ge / max_le /
    between / in_set — evaluated vectorized per batch; value checks
    skip nulls (add an explicit not_null rule to reject them), matching
    expect()'s suite semantics. Reasons are ``expect:<check>:<column>``.
    Rules on columns an event doesn't carry yet (pre-evolution) pass."""
    out = []
    for r in expectations:
        col_name, check = r["column"], r["check"]
        if col_name not in batch.column_names:
            continue
        col = batch[col_name]
        if check == "not_null":
            m = pc.is_null(col)
        elif check == "min_ge":
            m = pc.fill_null(pc.less(col, r["value"]), False)
        elif check == "max_le":
            m = pc.fill_null(pc.greater(col, r["value"]), False)
        elif check == "between":
            m = pc.fill_null(pc.or_(pc.less(col, r["lo"]),
                                    pc.greater(col, r["hi"])), False)
        elif check == "in_set":
            m = pc.and_(pc.is_valid(col), pc.invert(pc.fill_null(
                pc.is_in(col, value_set=pa.array(r["value"])), False)))
        else:
            raise ValueError(
                f"unsupported ingest expectation check {check!r} "
                "(row-level checks: not_null, min_ge, max_le, between, "
                "in_set; suite-level checks belong in expect())")
        out.append((f"expect:{check}:{col_name}", m))
    return out


def split_invalid_events(batch: pa.Table,
                         expectations=None) -> tuple[pa.Table, pa.Table]:
    """(valid rows, invalid rows + ``reason``). An event is invalid when
    any of lsn / conv_id / turn_idx / ts is null or op is not I/U/D —
    such rows route fine but the LWW state could never resolve them;
    shipping them silently poisons merges. ``expectations`` adds
    user-declared row-level rules (see _expectation_masks) evaluated in
    the same vectorized pass, quarantining semantic garbage alongside
    structural garbage. The reason records the FIRST failing rule."""
    import numpy as np
    n = batch.num_rows
    rules = [("null_lsn", pc.is_null(batch["lsn"])),
             ("null_conv_id", pc.is_null(batch["conv_id"])),
             ("null_turn_idx", pc.is_null(batch["turn_idx"])),
             ("null_ts", pc.is_null(batch["ts"])),
             ("bad_op", pc.invert(pc.fill_null(
                 pc.is_in(batch["op"], value_set=_VALID_OPS), False)))]
    if expectations:
        rules += _expectation_masks(batch, expectations)
    masks = [r.to_numpy(zero_copy_only=False) for _, r in rules]
    bad = np.logical_or.reduce(masks)
    if not bad.any():
        return batch, batch.slice(0, 0).append_column(
            pa.field("reason", pa.string()), pa.array([], pa.string()))
    reason = np.select(masks, [name for name, _ in rules],
                       default="").astype(object)
    bad_rows = batch.filter(pa.array(bad)).append_column(
        pa.field("reason", pa.string()),
        pa.array(reason[bad], pa.string()))
    return batch.filter(pa.array(~bad)), bad_rows


def _write_dlq(bad: pa.Table, dlq_dir: str) -> None:
    """Idempotent dead-letter write: the file name is a content hash,
    so re-running the same segment overwrites the same file instead of
    duplicating entries."""
    import hashlib
    os.makedirs(dlq_dir, exist_ok=True)
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, bad.schema) as w:
        w.write_table(bad)
    digest = hashlib.blake2b(sink.getvalue().to_pybytes(),
                             digest_size=8).hexdigest()
    path = os.path.join(dlq_dir, f"dlq-{digest}.parquet")
    tmp = path + ".tmp"
    pq.write_table(bad, tmp)
    os.replace(tmp, path)


class _PrepareShuffle:
    """map_batches body for shuffle-mode ingest: filter watermark,
    normalize schema, per-batch LWW pre-compaction, assign partition.
    With ``dlq_dir`` set, malformed events are split out and written to
    the dead-letter queue instead of entering the exchange."""

    def __init__(self, num_partitions: int, schema: pa.Schema, salt_turns: int,
                 hot_convs: Optional[frozenset], min_lsn_exclusive: int,
                 carry_watermark: bool = False,
                 dlq_dir: Optional[str] = None, expectations=None):
        self.num_partitions = num_partitions
        self.schema = schema
        self.salt_turns = salt_turns
        self.hot_convs = hot_convs
        self.min_lsn = min_lsn_exclusive
        self.carry_watermark = carry_watermark
        self.dlq_dir = dlq_dir
        self.expectations = expectations

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.min_lsn:
            batch = batch.filter(pc.greater(batch["lsn"], self.min_lsn))
        if self.dlq_dir is not None:
            batch, bad = split_invalid_events(batch, self.expectations)
            if bad.num_rows:
                _write_dlq(bad, self.dlq_dir)
        batch = normalize_to_schema(batch, self.schema)
        batch = lww_compact_table(batch, drop_tombstones=False,
                                  carry_watermark=self.carry_watermark)
        parts = assign_partitions(batch["conv_id"], batch["turn_idx"],
                                  self.num_partitions, self.salt_turns,
                                  self.hot_convs)
        return batch.append_column(pa.field("__part", pa.int64()),
                                   pa.array(parts))


class _Deliver:
    """map_groups body: one pre-merged delta per partition → its shard."""

    def __init__(self, handles):
        self.handles = handles
        self.__name__ = "deliver_partition_delta"

    def __call__(self, group: pa.Table) -> pa.Table:
        import ray
        if group.num_rows == 0:
            return pa.table({"routed": pa.array([0], pa.int64())})
        pid = int(group["__part"][0].as_py())
        delta = lww_compact_table(group.drop_columns(["__part"]),
                                  drop_tombstones=False)
        # events counted = pre-compaction rows of this partition
        routed = ray.get(self.handles[pid].apply.remote(delta))
        return pa.table({"routed": pa.array([group.num_rows], pa.int64())})


def _delta_segment_files(dir_: str, pid: int) -> list[str]:
    """Ordered [base?, delta...] merge-on-read segment files for one
    partition of a delta-mode lake or checkpoint directory. Delta file
    order does not affect correctness (LWW is order-independent); the
    sort just makes listings deterministic."""
    if not os.path.isdir(dir_):
        return []
    base = os.path.join(dir_, f"part-{pid:04d}.base.parquet")
    out = [base] if os.path.exists(base) else []
    pre = f"part-{pid:04d}.delta-"
    out += sorted(os.path.join(dir_, f) for f in os.listdir(dir_)
                  if f.startswith(pre) and f.endswith(".parquet"))
    return out


def merge_segments(files: Sequence[str], drop_tombstones: bool,
                   columns: Optional[list[str]] = None,
                   filters=None) -> pa.Table:
    """Merge-on-read over LSM segment files: concat + one LWW
    compaction. Segments carry full state rows (payload + ts + lsn +
    op), so the (ts, lsn)-argmax across segments IS the live state —
    no segment ordering or level metadata needed. ``filters`` may
    restrict rows per segment BEFORE the merge only when they are on
    the LWW key itself (e.g. conv_id IN (...)): key-filtering keeps
    every version of a surviving key, so the argmax is unchanged."""
    tabs = [pq.read_table(f, columns=columns, filters=filters)
            for f in files]
    t = pa.concat_tables(tabs, promote_options="permissive")
    if t.num_rows == 0:
        return t
    return lww_compact_table(t, drop_tombstones=drop_tombstones)


_FOOTER_STAT_TYPES = (pa.types.is_integer, pa.types.is_floating,
                      pa.types.is_boolean, pa.types.is_temporal,
                      pa.types.is_decimal)


def _footer_stats(paths: Sequence[str], cols: Sequence[str]) -> dict:
    """Exact statistics for a batch of rewrite-mode lake files from
    parquet FOOTERS only — zero data pages read. min/max is trusted
    only for numeric/temporal/boolean/decimal columns (parquet may
    TRUNCATE string min/max, which would be silently wrong); columns
    whose footer stats are absent or untrustworthy are reported in
    ``fallback`` and recomputed by the caller with a pruned scan."""
    out = {"rows": 0, "bytes": 0, "files": len(paths),
           "cols": {c: {"min": None, "max": None, "null_count": 0}
                    for c in cols},
           "fallback": set()}
    for p in paths:
        md = pq.ParquetFile(p).metadata
        out["rows"] += md.num_rows
        out["bytes"] += os.path.getsize(p)
        if not cols:
            continue
        sch = md.schema.to_arrow_schema()
        # parquet row-group column chunks are indexed by LEAF position
        # (path_in_schema), which diverges from the Arrow field index
        # once any nested column exists — resolve by path, and send
        # nested/absent columns to the exact scan fallback
        leaf_idx = {md.schema.column(i).path: i
                    for i in range(md.num_columns)}
        for c in cols:
            if c not in leaf_idx:
                if sch.get_field_index(c) < 0:
                    raise KeyError(f"column {c!r} not in lake file {p}")
                out["fallback"].add(c)      # nested column: scan it
                continue
            idx = leaf_idx[c]
            acc = out["cols"][c]
            trusted = any(f(sch.field(c).type)
                          for f in _FOOTER_STAT_TYPES)
            for rg in range(md.num_row_groups):
                cc = md.row_group(rg).column(idx)
                st = cc.statistics
                if st is None or st.null_count is None:
                    out["fallback"].add(c)
                    continue
                acc["null_count"] += st.null_count
                if st.has_min_max:
                    if not trusted:
                        out["fallback"].add(c)
                        continue
                    lo, hi = st.min, st.max
                    acc["min"] = lo if acc["min"] is None \
                        else min(acc["min"], lo)
                    acc["max"] = hi if acc["max"] is None \
                        else max(acc["max"], hi)
                elif st.num_values:
                    # non-null values exist but no min/max recorded
                    out["fallback"].add(c)
    return out


def _delta_stats(lake_dir: str, pid: int, cols: Sequence[str]) -> dict:
    """Exact statistics for one DELTA-mode partition: merge-on-read
    (column-pruned to the LWW key set + requested columns), then
    direct min/max/null_count — footer stats cannot be trusted here
    because base/delta rows overlap and tombstones hide rows."""
    lww = ["conv_id", "turn_idx", "ts", "lsn", "op"]
    seg_cols = lww + [c for c in cols if c not in lww]
    segs = _delta_segment_files(lake_dir, pid)
    t = merge_segments(segs, drop_tombstones=True, columns=seg_cols)
    # bytes = on-disk size of the partition's segment files; files
    # stays 0 as the delta-partition marker (rewrite partitions
    # count their parquet files there)
    nbytes = sum(os.path.getsize(f) for f in segs if os.path.exists(f))
    out = {"rows": t.num_rows, "bytes": nbytes, "files": 0,
           "cols": {}, "fallback": set()}
    for c in cols:
        col = t[c]
        mm = pc.min_max(col)
        out["cols"][c] = {"min": mm["min"].as_py(),
                          "max": mm["max"].as_py(),
                          "null_count": col.null_count}
    return out


def _merge_stats(parts: Sequence[dict], cols: Sequence[str]) -> dict:
    total = {"rows": 0, "bytes": 0, "files": 0,
             "cols": {c: {"min": None, "max": None, "null_count": 0}
                      for c in cols},
             "fallback": set()}
    for p in parts:
        total["rows"] += p["rows"]
        total["bytes"] += p["bytes"]
        total["files"] += p["files"]
        total["fallback"] |= set(p["fallback"])
        for c, acc in p["cols"].items():
            t = total["cols"][c]
            t["null_count"] += acc["null_count"]
            for k, f in (("min", min), ("max", max)):
                if acc[k] is not None:
                    t[k] = acc[k] if t[k] is None else f(t[k], acc[k])
    return total


def _compact_partition(lake_dir: str, pid: int) -> Optional[dict]:
    """Fold one partition's LSM segments into a single base segment.
    Tombstones are RETAINED (narrow null-payload rows): the NEXT
    checkpoint hardlinks the compacted base, so dropping them here
    would erase them from the checkpoint chain and let a later stale
    (older-ts) event resurrect a deleted key — the bug the
    late-event test guards. This mirrors rewrite mode, whose sidecar
    checkpoints also retain tombstones forever; live reads filter
    ``op <> 'D'`` either way. Crash-safe: the base write is atomic,
    and re-merging the new base with a leftover not-yet-unlinked
    delta is idempotent (duplicate winners tie to identical rows)."""
    segs = _delta_segment_files(lake_dir, pid)
    if len(segs) <= 1:
        return None
    state = sort_conv_turn(merge_segments(segs, drop_tombstones=False))
    base = os.path.join(lake_dir, f"part-{pid:04d}.base.parquet")
    tmp = f"{base}.tmp.{os.getpid()}"
    pq.write_table(state, tmp)
    os.replace(tmp, base)
    for f in segs:
        if not f.endswith(".base.parquet"):
            try:
                os.remove(f)
            except FileNotFoundError:
                pass
    return {"partition": pid, "segments_merged": len(segs),
            "rows": state.num_rows}


def _filter_table(tbl: pa.Table, filters) -> pa.Table:
    """Exact conjunctive row filter for scan_where's merge-on-read path
    (same (col, op, value) spec the zonemap skipping consumes); null
    comparisons are false, matching SQL WHERE."""
    mask = None
    for col, op, val in filters:
        c = tbl[col]
        if op in ("==", "="):
            m = pc.equal(c, val)
        elif op == "<":
            m = pc.less(c, val)
        elif op == "<=":
            m = pc.less_equal(c, val)
        elif op == ">":
            m = pc.greater(c, val)
        elif op == ">=":
            m = pc.greater_equal(c, val)
        elif op == "between":
            m = pc.and_kleene(pc.greater_equal(c, val[0]),
                              pc.less_equal(c, val[1]))
        elif op == "in":
            m = pc.is_in(c, value_set=pa.array(list(val)))
        else:
            raise ValueError(f"unknown filter op {op!r}")
        mask = m if mask is None else pc.and_kleene(mask, m)
    return tbl.filter(pc.fill_null(mask, False))


def _zorder_take(state: pa.Table, cluster_by: list[str]) -> pa.Table:
    """Reorder rows along a Z-order (Morton) curve over ``cluster_by``:
    each column is RANK-quantized to 16 bits within this partition
    (exact values don't matter — layout only; rank quantization is
    distribution-proof, no global coordination, no overflow), bits are
    interleaved, rows take()n in curve order. Nulls sort to the end.
    Row-group min/max then bound every listed dimension, so zonemaps
    prune MULTI-column range predicates — the OPTIMIZE ZORDER layout
    (cf. misc.zorder_key for the exact SQL-mirrorable key operator)."""
    n = state.num_rows
    code = np.zeros(n, dtype=np.uint64)
    null_any = np.zeros(n, dtype=bool)
    k = len(cluster_by)
    for i, c in enumerate(cluster_by):
        col = state[c].combine_chunks()
        if pa.types.is_timestamp(col.type) or pa.types.is_date(col.type):
            col = col.cast(pa.int64())
        null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
        vals = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
        _, inv = np.unique(vals, return_inverse=True)
        # scale ranks into 16 bits
        hi = max(int(inv.max()), 1)
        q = (inv.astype(np.uint64) * 65535 // hi).astype(np.uint64)
        spread = np.zeros(n, dtype=np.uint64)
        for b in range(16):
            spread |= ((q >> np.uint64(b)) & np.uint64(1)) << \
                np.uint64(b * k)
        code |= spread << np.uint64(i)
        null_any |= null_mask
    order = np.lexsort((code, null_any))
    return state.take(pa.array(order, pa.int64()))


def _optimize_partition(lake_dir: str, pid: int, cluster_by: list[str],
                        row_group_rows: int,
                        zorder: bool = False) -> Optional[dict]:
    """Rewrite one partition clustered by ``cluster_by`` (see
    CdcIngestEngine.optimize). Rewrite-mode: re-sort the single live
    file. Delta-mode: compact-with-sort (tombstones RETAINED, same
    contract as _compact_partition — arrow sort_by puts their null
    payloads wherever the cluster column says; they carry real
    ts/turn_idx so clustering still applies)."""
    segs = _delta_segment_files(lake_dir, pid)
    plain = os.path.join(lake_dir, f"part-{pid:04d}.parquet")
    if segs:
        state = merge_segments(segs, drop_tombstones=False)
        target = os.path.join(lake_dir, f"part-{pid:04d}.base.parquet")
    elif os.path.exists(plain):
        state = pq.read_table(plain)
        target = plain
    else:
        return None
    if zorder and len(cluster_by) >= 2:
        state = _zorder_take(state, cluster_by)
    else:
        keys = [(c, "ascending") for c in cluster_by] + \
            [(c, "ascending") for c in ("conv_id", "turn_idx")
             if c not in cluster_by and c in state.column_names]
        state = state.sort_by(keys)
    tmp = f"{target}.tmp.{os.getpid()}"
    pq.write_table(state, tmp, row_group_size=row_group_rows)
    os.replace(tmp, target)
    for f in segs:
        if not f.endswith(".base.parquet"):
            try:
                os.remove(f)
            except FileNotFoundError:
                pass
    return {"partition": pid, "rows": state.num_rows,
            "segments_merged": max(len(segs), 1)}


def read_checkpoint_partition(ckpt_dir: str, pid: int) -> Optional[pa.Table]:
    """Load one partition's checkpointed LWW state.

    Three on-disk formats; the third is the delta (merge-on-read)
    layout — hardlinks of every lake segment current at checkpoint
    time (``part-XXXX.base.parquet`` + ``part-XXXX.delta-*.parquet``),
    merged here with tombstones RETAINED (a checkpointed tombstone
    must keep beating late out-of-order events in future merges).

    The other two formats:
    - legacy full snapshot: one parquet with every state column;
    - sidecar (current): ``part-XXXX.parquet`` holds only the narrow
      key/meta columns (lsn, op, conv_id, turn_idx, ts) ordered
      [live rows in lake order, then tombstones], and
      ``part-XXXX.payload.parquet`` is a HARDLINK to the lake file
      written by the same commit (immutable inode: a later commit
      os.replace()s the lake name but this link keeps the old payload).
      Reconstruction zips the live prefix with the payload rows and
      gives tombstones null payload (deletes carry none by contract).
    """
    segs = _delta_segment_files(ckpt_dir, pid)
    if segs:
        return merge_segments(segs, drop_tombstones=False)
    path = os.path.join(ckpt_dir, f"part-{pid:04d}.parquet")
    if not os.path.exists(path):
        return None
    t = pq.read_table(path)
    if "text" in t.column_names:  # legacy full snapshot
        return t
    pay_path = os.path.join(ckpt_dir, f"part-{pid:04d}.payload.parquet")
    pay = (pq.read_table(pay_path, columns=PAYLOAD_COLS)
           if os.path.exists(pay_path)
           else pa.table({c: pa.array([], pa.string()) for c in PAYLOAD_COLS}))
    n, n_live = t.num_rows, pay.num_rows
    if n_live > n:
        raise ValueError(f"checkpoint {path}: payload has {n_live} rows "
                         f"but sidecar only {n}")
    cols = {name: t[name] for name in t.column_names}
    for c in PAYLOAD_COLS:
        col = pay[c].combine_chunks() if n_live else pa.array([], pa.string())
        if n > n_live:
            col = pa.concat_arrays(
                (col.chunks if isinstance(col, pa.ChunkedArray) else [col])
                + [pa.nulls(n - n_live, pa.string())])
        cols[c] = col
    return pa.table(cols)


def detect_num_partitions(lake_dir: str) -> int:
    """Partition count of an existing lake — size an engine that
    reopens a possibly-repartitioned lake:
    ``CdcIngestEngine(lake, num_partitions=detect_num_partitions(lake))``.
    Prefers the manifest's recorded layout (exact even when the highest
    partitions happen to be empty); falls back to counting lake files."""
    mpath = os.path.join(lake_dir, "_manifest.jsonl")
    if os.path.exists(mpath):
        for e in reversed(Manifest(mpath).entries):
            if e.get("layout"):
                return int(e["layout"])
    pids = [int(f[len("part-"):].split(".")[0])
            for f in os.listdir(lake_dir)
            if f.startswith("part-") and f.endswith(".parquet")]
    if not pids:
        raise FileNotFoundError(f"no lake partition files in {lake_dir}")
    return max(pids) + 1


class _ReplayCompactCommit:
    """Reduce-side body for the batch-replay fast path: final LWW
    compaction of ONE hash partition (merged with the partition's prior
    checkpoint state, if any), then idempotent (temp + atomic rename)
    writes of the new checkpoint and the lake file. Returns one
    lineage row per partition.

    This stage runs as ordinary Ray tasks scheduled across ALL cluster
    CPUs — unlike the shard-actor path, its parallelism is not pinned to
    a fixed actor pool, so replay throughput scales with cluster size
    while the partition LAYOUT (num_partitions) stays fixed."""

    def __init__(self, lake_dir: str, ckpt_dir: str,
                 prior_ckpt_dir: Optional[str], turn_idx_type: str,
                 delta_mode: bool = False, seg_label: str = "seg"):
        self.lake_dir = lake_dir
        self.ckpt_dir = ckpt_dir
        self.prior_ckpt_dir = prior_ckpt_dir
        self.turn_idx_type = turn_idx_type
        self.delta_mode = delta_mode
        # delta segment name carries the checkpoint name, so a crashed
        # replay's RERUN atomically overwrites the same file instead of
        # stacking a second delta (idempotence by naming)
        self.seg_label = "".join(
            c if c.isalnum() or c in "-_" else "_" for c in seg_label)
        self.__name__ = "replay_compact_commit"

    @staticmethod
    def _write_atomic(tbl: pa.Table, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)

    LINEAGE_SCHEMA = pa.schema([
        ("partition", pa.int64()), ("file", pa.string()),
        ("rows", pa.int64()), ("events_applied", pa.int64()),
        ("stale_dropped", pa.int64()), ("deletes", pa.int64()),
        ("lsn_lo", pa.int64()), ("lsn_hi", pa.int64()),
        ("delta_rows", pa.int64())])

    def carry_forward(self, pid: int) -> Optional[dict]:
        """No new events for this partition: the prior checkpoint state
        (if any) must still appear in the NEW checkpoint dir, else a later
        replay that merges from this checkpoint would silently lose the
        partition. Hardlink (fallback copy) the immutable prior snapshot
        into the new checkpoint; the lake file is untouched."""
        if not self.prior_ckpt_dir:
            return None
        prior_segs = _delta_segment_files(self.prior_ckpt_dir, pid)
        if prior_segs:  # delta layout: hardlink every segment forward
            os.makedirs(self.ckpt_dir, exist_ok=True)
            for src in prior_segs:
                self._link_or_copy(src, os.path.join(
                    self.ckpt_dir, os.path.basename(src)))
            state_rows = merge_segments(
                prior_segs, drop_tombstones=False,
                columns=["conv_id", "turn_idx", "ts", "lsn", "op"]).num_rows
            return {"partition": pid, "file": f"part-{pid:04d}.base.parquet",
                    "rows": -1, "events_applied": 0, "stale_dropped": 0,
                    "deletes": 0, "lsn_lo": 0, "lsn_hi": 0,
                    "carried_forward": True, "state_rows": state_rows}
        prior_path = os.path.join(self.prior_ckpt_dir,
                                  f"part-{pid:04d}.parquet")
        if not os.path.exists(prior_path):
            return None
        os.makedirs(self.ckpt_dir, exist_ok=True)
        for suffix in (".parquet", ".payload.parquet"):
            src = os.path.join(self.prior_ckpt_dir, f"part-{pid:04d}{suffix}")
            dst = os.path.join(self.ckpt_dir, f"part-{pid:04d}{suffix}")
            if not os.path.exists(src) or os.path.exists(dst):
                continue
            self._link_or_copy(src, dst, overwrite=False)
        md = pq.read_metadata(prior_path)
        return {"partition": pid, "file": f"part-{pid:04d}.parquet",
                "rows": -1, "events_applied": 0, "stale_dropped": 0,
                "deletes": 0, "lsn_lo": 0, "lsn_hi": 0,
                "carried_forward": True, "state_rows": md.num_rows}

    @staticmethod
    def _link_or_copy(src: str, dst: str, overwrite: bool = True) -> None:
        if os.path.exists(dst):
            if not overwrite:
                return
            os.remove(dst)
        try:
            os.link(src, dst)
        except OSError:
            tmp = f"{dst}.tmp.{os.getpid()}"
            import shutil
            shutil.copyfile(src, tmp)
            os.replace(tmp, dst)

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return self.LINEAGE_SCHEMA.empty_table()
        pid = int(group["__part"][0].as_py())
        row = self.commit_partition(pid, group.drop_columns(["__part"]))
        return pa.Table.from_pylist([row], schema=self.LINEAGE_SCHEMA)

    def commit_partition(self, pid: int, tbl: pa.Table) -> dict:
        """Final LWW compaction of one partition's delta (merged with the
        prior checkpoint), then idempotent checkpoint + lake writes.
        Returns the lineage row as a plain dict.

        Fused gather: the LWW argmax AND the (conv, turn) lake sort are
        computed on narrow int key arrays first (one np.lexsort each),
        then the wide payload is gathered ONCE with the composed final
        index — vs compact-take → filter → sort-take this removes two
        full-width copies, the dominant memory traffic of the commit
        stage. The checkpoint is a narrow sidecar + a hardlink to the
        lake file (see read_checkpoint_partition) instead of a second
        full payload write."""
        events = tbl.num_rows
        lsn_lo = int(pc.min(tbl["lsn"]).as_py())
        lsn_hi = int(pc.max(tbl["lsn"]).as_py())
        if "__wm" in tbl.column_names:
            # watermark = max lsn ever DELIVERED (pre-compaction), which
            # can exceed the max surviving lsn
            lsn_hi = max(lsn_hi, int(pc.max(tbl["__wm"]).as_py()))
            tbl = tbl.drop_columns(["__wm"])
        n_prior = 0
        if self.prior_ckpt_dir:
            prior = read_checkpoint_partition(self.prior_ckpt_dir, pid)
            if prior is not None:
                prior = normalize_to_schema(prior, tbl.schema)
                if prior.num_rows:
                    lsn_lo = min(lsn_lo, int(pc.min(prior["lsn"]).as_py()))
                    lsn_hi = max(lsn_hi, int(pc.max(prior["lsn"]).as_py()))
                n_prior = prior.num_rows
                tbl = pa.concat_tables([prior, tbl])
        n = tbl.num_rows
        # -- LWW argmax on key arrays (same order as lww_compact_table) --
        conv = tbl["conv_id"].combine_chunks()
        d = pc.dictionary_encode(conv)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        turn = tbl["turn_idx"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ts_col = tbl["ts"].combine_chunks()
        if pa.types.is_timestamp(ts_col.type):
            ts_col = ts_col.cast(pa.int64())
        ts = pc.fill_null(ts_col, 0).to_numpy(zero_copy_only=False)
        lsn = pc.fill_null(tbl["lsn"].combine_chunks(), 0).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((lsn, ts, turn, codes))
        k1, k2 = codes[order], turn[order]
        last = np.ones(n, dtype=bool)
        if n > 1:
            last[:-1] = (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])
        surv = order[last]            # winners, sorted by (code, turn)
        stale = n - len(surv)
        # -- lake order: lexicographic conv rank, then turn --------------
        dict_vals = d.dictionary.to_numpy(zero_copy_only=False)
        rank_of_code = np.empty(len(dict_vals), dtype=np.int64)
        rank_of_code[np.argsort(dict_vals, kind="stable")] = \
            np.arange(len(dict_vals))
        final = surv[np.lexsort((turn[surv], rank_of_code[codes[surv]]))]
        op_final = pc.take(tbl["op"].combine_chunks(),
                           pa.array(final, type=pa.int64()))
        live_mask = pc.fill_null(pc.not_equal(op_final, "D"), True) \
            .to_numpy(zero_copy_only=False)
        final_live = final[live_mask]
        deletes = len(final) - len(final_live)
        if self.delta_mode:
            return self._commit_delta(pid, tbl, final, live_mask, n_prior,
                                      events, stale, lsn_lo, lsn_hi)
        # -- sidecar checkpoint: narrow columns, [live..., tombstones...] -
        sidecar_idx = np.concatenate([final_live, final[~live_mask]])
        sidecar = tbl.select(["lsn", "op", "conv_id", "turn_idx", "ts"]) \
            .take(pa.array(sidecar_idx, type=pa.int64()))
        for c in ("op", "conv_id"):  # dict -> plain string on disk
            if pa.types.is_dictionary(sidecar.schema.field(c).type):
                sidecar = sidecar.set_column(
                    sidecar.schema.get_field_index(c), c,
                    sidecar[c].cast(pa.string()))
        # -- ONE wide gather for the lake ---------------------------------
        live = tbl.select(["conv_id", "turn_idx"] + PAYLOAD_COLS + ["ts"]) \
            .take(pa.array(final_live, type=pa.int64()))

        def _plain(col):  # dict -> plain string for the lake contract
            return (col.cast(pa.string())
                    if pa.types.is_dictionary(col.type) else col)

        t_turn = pa.int64() if self.turn_idx_type == "int64" else pa.int32()
        out = pa.table({
            "conv_id": _plain(live["conv_id"]),
            "turn_idx": live["turn_idx"].cast(t_turn),
            "role": _plain(live["role"]),
            "text": live["text"],
            "tool": _plain(live["tool"]),
            "ts": live["ts"].cast(pa.timestamp("ms")),
        })
        fname = f"part-{pid:04d}.parquet"
        lake_path = os.path.join(self.lake_dir, fname)
        self._write_atomic(out, lake_path)
        self._write_atomic(sidecar, os.path.join(self.ckpt_dir, fname))
        # checkpoint payload = hardlink to the lake file's inode (survives
        # a later commit's os.replace of the lake NAME)
        pay_link = os.path.join(self.ckpt_dir,
                                f"part-{pid:04d}.payload.parquet")
        if os.path.exists(pay_link):
            os.remove(pay_link)
        try:
            os.link(lake_path, pay_link)
        except OSError:
            import shutil
            tmp = f"{pay_link}.tmp.{os.getpid()}"
            shutil.copyfile(lake_path, tmp)
            os.replace(tmp, pay_link)
        return {"partition": pid, "file": fname, "rows": out.num_rows,
                "events_applied": events, "stale_dropped": stale,
                "deletes": deletes, "lsn_lo": lsn_lo, "lsn_hi": lsn_hi}

    def _commit_delta(self, pid: int, tbl: pa.Table, final, live_mask,
                      n_prior: int, events: int, stale: int,
                      lsn_lo: int, lsn_hi: int) -> dict:
        """LSM commit: instead of rewriting the partition's full lake
        file, append ONE delta segment holding only the winners this
        commit CHANGED (new inserts/updates and fresh tombstones) —
        write volume is proportional to the delta, not the state, which
        is what keeps a 100 TB lake's incremental refresh cheap. The
        first commit of a partition (no segments yet) writes the full
        state as the ``.base`` segment, which also bootstraps a legacy
        rewrite-mode lake into delta mode. Readers merge-on-read
        (merge_segments); CdcIngestEngine.compact() folds deltas back
        into the base. The checkpoint is hardlinks of every CURRENT
        segment (immutable inodes — a later compact() replaces lake
        NAMES, never these links), so resume / time travel / change
        feeds read the same state through read_checkpoint_partition
        with no format-specific code."""
        t_turn = pa.int64() if self.turn_idx_type == "int64" else pa.int32()
        segs = _delta_segment_files(self.lake_dir, pid)
        # prior-state rows sit at indices [0, n_prior): winners at or
        # above that mark originate from THIS commit's events
        sel = final if not segs else final[final >= n_prior]
        rows = tbl.select(["conv_id", "turn_idx"] + PAYLOAD_COLS
                          + ["ts", "lsn", "op"]) \
            .take(pa.array(sel, type=pa.int64()))

        def _plain(col):
            return (col.cast(pa.string())
                    if pa.types.is_dictionary(col.type) else col)

        out = pa.table({
            "conv_id": _plain(rows["conv_id"]),
            "turn_idx": rows["turn_idx"].cast(t_turn),
            "role": _plain(rows["role"]),
            "text": rows["text"],
            "tool": _plain(rows["tool"]),
            "ts": rows["ts"].cast(pa.timestamp("ms")),
            "lsn": rows["lsn"].cast(pa.int64()),
            "op": _plain(rows["op"]),
        })
        if segs and out.num_rows == 0:      # all-stale commit: no segment
            fname = os.path.basename(segs[-1])
        else:
            fname = (f"part-{pid:04d}.base.parquet" if not segs
                     else f"part-{pid:04d}.delta-{self.seg_label}.parquet")
            path = os.path.join(self.lake_dir, fname)
            self._write_atomic(out, path)
            if not segs:
                # a legacy rewrite-mode lake file is subsumed by the
                # base (prior checkpoints keep hardlinks to its inode)
                legacy = os.path.join(self.lake_dir,
                                      f"part-{pid:04d}.parquet")
                if os.path.exists(legacy):
                    os.remove(legacy)
            segs = segs + [path]
        os.makedirs(self.ckpt_dir, exist_ok=True)
        for src in segs:
            self._link_or_copy(src, os.path.join(
                self.ckpt_dir, os.path.basename(src)))
        n_live = int(live_mask.sum())
        return {"partition": pid, "file": fname, "rows": n_live,
                "events_applied": events, "stale_dropped": stale,
                "deletes": len(final) - n_live,
                "delta_rows": out.num_rows,
                "lsn_lo": lsn_lo, "lsn_hi": lsn_hi}


# ---------------------------------------------------------------------------
# Raw two-stage hash exchange for replay()
#
# Why not Dataset.groupby(__part).map_groups(...): Ray Data's groupby is a
# SORT-based shuffle — at 48M events its SortReduce suboperator burned
# 634 CPU-seconds merging runs into an order the upsert never needs (we
# want hash CO-LOCATION, not sorted groups), going super-linear with input
# size. A classic two-stage map/reduce exchange over plain Ray tasks does
# the same data movement with zero sorting: M split tasks each return P
# per-partition shards (num_returns=P, so a reduce fetches only its own
# shards), P commit tasks gather M shards each. Both stages are ordinary
# tasks scheduled across every cluster CPU; the object store provides the
# spill-to-disk path for out-of-core inputs, exactly like any external
# shuffle. Measured at 48M events / 32 CPUs: 40s (sort shuffle) → ~10s.
# ---------------------------------------------------------------------------

def _cap_arrow_threads(n: int = 2) -> None:
    """Cap Arrow's internal pools inside task workers. Ray exports
    OMP_NUM_THREADS=1 but Arrow sizes its CPU/IO pools from the machine:
    32 concurrent tasks x 32 Arrow threads = ~1000 runnable threads whose
    futex handoffs put every core ~99% in SYSTEM time (measured via
    vmstat + /proc/<pid>/stack on sort_by/write_table). Two threads keeps
    a little intra-kernel parallelism without the stampede."""
    if pa.cpu_count() > n:
        pa.set_cpu_count(n)
    if pa.io_thread_count() > n:
        pa.set_io_thread_count(n)


_WORKER_WARMED = False


def warm_worker(heap_bytes: Optional[int] = None) -> int:
    """One-time per-worker-process warmup; returns the worker PID.

    Always: cap Arrow thread pools (see _cap_arrow_threads). When
    ``heap_bytes`` (or $DATAVEC_WORKER_WARM_BYTES) is positive, also
    pre-fault that much allocator arena: disable jemalloc's dirty-page
    decay so freed pages are RETAINED, then allocate + touch one big
    Arrow buffer and release it. Subsequent Arrow allocations reuse the
    already-faulted pages instead of minor-faulting fresh ones — on
    virtualized hosts (this sandbox: Firecracker) concurrent first-touch
    faults from 32 workers serialize in the host kernel and can slow
    memory-heavy stages ~10x. Long-lived production workers reach this
    warm state naturally after their first few tasks; benchmarks call
    this from a fleet of setup tasks so measured runs reflect the warm
    steady state. Idempotent per process."""
    global _WORKER_WARMED
    if _WORKER_WARMED:
        return os.getpid()
    _cap_arrow_threads()
    if heap_bytes is None:
        heap_bytes = int(os.environ.get("DATAVEC_WORKER_WARM_BYTES", "0"))
    if heap_bytes > 0:
        try:
            pa.jemalloc_set_decay_ms(-1)
        except Exception:
            pass
        buf = pa.allocate_buffer(heap_bytes)
        np.frombuffer(memoryview(buf), dtype=np.int64)[::512] = 1
        del buf  # pages stay in the (no-decay) jemalloc arena
        # numpy/glibc heap: keep big blocks off mmap so they are reused
        # (M_MMAP_THRESHOLD can't move post-start; a touched-and-freed
        # glibc arena still avoids refaults for <threshold allocations)
        a = np.ones(heap_bytes // 32, dtype=np.int64)
        a[::512] = 2
        del a
    _WORKER_WARMED = True
    return os.getpid()


def _replay_split(prep: "_PrepareShuffle", num_parts: int, *blocks):
    """Map side: normalize + watermark-filter + per-batch LWW pre-compact
    (the combiner), then hash-split into one shard table per partition.
    Returns P tables (+ one trailing row-count), so Ray stores each shard
    as its own object and each reduce fetches only its partition."""
    from ray.data.block import BlockAccessor
    warm_worker()
    tables = []
    for b in blocks:
        t = b if isinstance(b, pa.Table) else BlockAccessor.for_block(b).to_arrow()
        tables.append(normalize_to_schema(t, prep.schema))
    tbl = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    tbl = prep(tbl)  # filter + compact + __part (normalize is a no-op now)
    # Dictionary-encode the low-cardinality strings BEFORE the exchange:
    # conv_id (~17B -> 4B+dict), role/tool/op (~5-10B -> 1-4B) cut the
    # shuffled payload ~30%; commit gathers work on int indices and the
    # lake write casts back to plain strings.
    for c in ("conv_id", "role", "tool", "op"):
        if c in tbl.column_names and not pa.types.is_dictionary(
                tbl.schema.field(c).type):
            idx = tbl.schema.get_field_index(c)
            tbl = tbl.set_column(
                idx, c, pc.dictionary_encode(tbl[c].combine_chunks()))
    parts = tbl["__part"].to_numpy(zero_copy_only=False)
    tbl = tbl.drop_columns(["__part"])
    order = np.argsort(parts, kind="stable")
    gathered = tbl.take(pa.array(order, type=pa.int64()))
    bounds = np.searchsorted(parts[order], np.arange(num_parts + 1))
    shards = tuple(gathered.slice(bounds[i], bounds[i + 1] - bounds[i])
                   for i in range(num_parts))
    if getattr(prep, "exchange_lz4", False):
        # trade cheap LZ4 CPU for scarce plasma/memory bandwidth: each
        # shard crosses the exchange as one compressed IPC buffer
        # instead of a raw-width plasma copy. Opt-in
        # (DATAVEC_EXCHANGE_LZ4=1, captured driver-side in replay()):
        # measured SLOWER on the high-entropy synthetic text; wins only
        # when the payload actually compresses (real transcripts).
        opts = pa.ipc.IpcWriteOptions(compression="lz4")
        packed = []
        for s in shards:
            if s.num_rows == 0:
                packed.append(s)
                continue
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, s.schema, options=opts) as w:
                w.write_table(s)
            packed.append(sink.getvalue())
        shards = tuple(packed)
    return shards + (tbl.num_rows,)


def _replay_commit(commit_fn: "_ReplayCompactCommit", pid: int, *shards):
    """Reduce side: gather this partition's shards from every split task,
    compact against the prior checkpoint and commit. combine_chunks()
    first: it copies the scattered plasma-backed chunks into private
    memory SEQUENTIALLY, so the subsequent sort/take gather does not
    random-access hundreds of mmap'd shard objects."""
    warm_worker()
    shards = [pa.ipc.open_stream(s).read_all() if isinstance(s, pa.Buffer)
              else s for s in shards]
    shards = [s for s in shards if s.num_rows]
    if not shards:
        return commit_fn.carry_forward(pid)
    tbl = pa.concat_tables(shards, promote_options="permissive")
    tbl = tbl.combine_chunks()
    return commit_fn.commit_partition(pid, tbl)


def _segment_max_lsn(path: str, default: int = 0) -> int:
    """Max LSN of a binlog segment from parquet ROW-GROUP STATISTICS —
    no data pages are read. Falls back to a single-column read only when
    a writer omitted statistics."""
    md = pq.read_metadata(path)
    if md.num_rows == 0:
        return default
    names = md.schema.names
    try:
        col_idx = names.index("lsn")
    except ValueError:
        return default
    maxes = []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(col_idx).statistics
        if st is None or not st.has_min_max:
            maxes = None
            break
        maxes.append(st.max)
    if maxes:
        return int(max(maxes))
    return int(pc.max(pq.read_table(path, columns=["lsn"])["lsn"]).as_py())


class CdcIngestEngine:
    """Driver-side orchestrator of the shard actor pool + manifest."""

    # router mode: each map task synchronously awaits its shard acks, so
    # one hot shard can stall every router slot. Below this partition
    # count the fan-out is narrow and latency low (fine); at or above it
    # 'auto' switches to shuffle mode, whose all-to-all is Ray Data's own
    # pipelined exchange with exactly ONE delivery per partition.
    AUTO_SHUFFLE_PARTITIONS = 32

    def __init__(self, lake_dir: str, num_partitions: int = 16,
                 salt_turns: int = 1, hot_convs: Optional[Sequence[str]] = None,
                 router_concurrency: Optional[int] = None,
                 shard_num_cpus: float = 0.5,
                 router_batch_size: int = 65536,
                 ingest_mode: str = "auto",
                 shard_spill: bool = True,
                 shard_spill_threshold_rows: int = 5_000_000,
                 dlq: bool = False,
                 expectations: Optional[Sequence[dict]] = None,
                 compat_mode: Optional[str] = None,
                 fence_writer: bool = True,
                 commit_mode: str = "rewrite",
                 auto_compact_segments: int = 0,
                 auto_salt: bool = False):
        if ingest_mode not in ("shuffle", "router", "auto"):
            raise ValueError("ingest_mode must be 'shuffle', 'router' or 'auto'")
        if commit_mode not in ("rewrite", "delta"):
            raise ValueError("commit_mode must be 'rewrite' (one full lake "
                             "file per partition per commit) or 'delta' "
                             "(LSM merge-on-read segments + compact())")
        self.commit_mode = commit_mode
        # delta mode: compact a partition automatically once it
        # accumulates this many segments (0 = manual compact() only) —
        # the classic LSM read-amplification cap for long tail runs
        self.auto_compact_segments = auto_compact_segments
        if ingest_mode == "auto":
            ingest_mode = ("shuffle" if num_partitions >= self.AUTO_SHUFFLE_PARTITIONS
                           else "router")
        # dead-letter queue: malformed events (null keys / bad op) are
        # split out in the split/prepare stage and written idempotently
        # under <lake>/_dlq instead of poisoning LWW state
        # ingest-time expectations quarantine rows to the DLQ, so
        # declaring any implies dlq=True
        self.expectations = list(expectations) if expectations else None
        self.dlq_dir = (os.path.join(lake_dir, "_dlq")
                        if (dlq or self.expectations) else None)
        self.lake_dir = lake_dir
        self.num_partitions = num_partitions
        self.salt_turns = salt_turns
        self.hot_convs = frozenset(hot_convs) if hot_convs else None
        self.router_concurrency = router_concurrency
        self.router_batch_size = router_batch_size
        self.ingest_mode = ingest_mode
        self.manifest = Manifest(os.path.join(lake_dir, "_manifest.jsonl"))
        # Salting is part of the lake's PHYSICAL LAYOUT: a key's owning
        # partition depends on the hot set, so the set must be identical
        # across every replay/ingest/lookup for the lake's lifetime (a
        # moved key would leave its stale prior version in the old
        # partition). The manifest's last `salt` entry is therefore the
        # source of truth; ctor args only apply to a lake with no
        # recorded salt config. auto_salt=True detects hot conversations
        # from the FIRST replayed segment and records them durably;
        # changing the set later requires resalt() (a layout migration).
        self.auto_salt = auto_salt
        salt_cfg = next((e for e in reversed(self.manifest.entries)
                         if e.get("type") == "salt"), None)
        if salt_cfg is not None:
            self.salt_turns = int(salt_cfg["salt_turns"])
            self.hot_convs = (frozenset(salt_cfg["hot_convs"])
                              if salt_cfg["hot_convs"] else None)
        # writer-epoch fencing: each engine OPEN takes epoch = max+1 and
        # records it; every state-mutating manifest append first
        # re-reads the file and refuses (WriterFencedError) if a newer
        # epoch opened the lake — a zombie writer (crashed job's
        # process still alive after a new one resumed) can waste work
        # but can never commit. Byte-level protection for concurrent
        # lake-file writes would additionally need manifest-named data
        # files; the manifest is the read-path source of truth.
        self.fence_writer = fence_writer
        self.writer_epoch = self.manifest.max_epoch() + 1
        if fence_writer:
            self.manifest.append({"type": "writer_open",
                                  "epoch": self.writer_epoch,
                                  "os_pid": os.getpid()})
        self.ckpt_dir = os.path.join(lake_dir, "_checkpoints")
        self.shard_spill_dir = (os.path.join(lake_dir, "_spill")
                                if shard_spill else None)
        self.shard_spill_threshold_rows = shard_spill_threshold_rows
        self.shard_num_cpus = shard_num_cpus
        # Shard actors are created lazily: the batch replay() path never
        # needs them (its state lives in checkpoint files, its tasks
        # schedule on the whole cluster).
        self._shards: Optional[list] = None
        if compat_mode is not None:
            from datavec_ray.cdc.compat import MODES
            if compat_mode not in MODES:
                raise ValueError(f"compat_mode must be one of {MODES}")
        Registry = _registry_cls()
        self.registry = Registry.remote(compat_mode=compat_mode)
        # router-mode delivery barrier: cumulative apply() calls
        # submitted per shard (compared against each shard's ack_counter)
        self._expected_msgs: dict[int, int] = {}
        self._canonical: Optional[pa.Schema] = None
        self.events_seen = 0

    @property
    def shards(self) -> list:
        if self._shards is None:
            # Shards reserve fractional CPUs: they are I/O-ish point-update
            # workers fed by router tasks; reserving a full CPU each would
            # starve the map stage on small nodes (deadlock in local mode).
            Shard = _shard_cls()
            self._shards = [
                Shard.options(num_cpus=self.shard_num_cpus).remote(
                    i, self.shard_spill_dir, self.shard_spill_threshold_rows)
                for i in range(self.num_partitions)]
        return self._shards

    @shards.setter
    def shards(self, value) -> None:
        self._shards = value
        self._expected_msgs = {}   # fresh actors → fresh ack counters

    def _router_barrier(self, submitted: dict[int, int]) -> None:
        """Block until every shard has PROCESSED all apply() calls ever
        submitted to it by router tasks (counting barrier: router acks
        are fire-and-forget, so submission != delivery). Cheap
        exponential-backoff polling of a trivial actor method; in the
        common case the window already drained and one poll suffices."""
        import time

        import ray
        for pid, m in submitted.items():
            self._expected_msgs[pid] = self._expected_msgs.get(pid, 0) + m
        delay = 0.005
        lagging = sorted(self._expected_msgs)
        while lagging:
            got = ray.get([self.shards[pid].ack_counter.remote()
                           for pid in lagging])
            lagging = [pid for pid, g in zip(lagging, got)
                       if g < self._expected_msgs[pid]]
            if lagging:
                time.sleep(delay)
                delay = min(delay * 2, 0.25)

    # -- batch replay (two-stage task-exchange fast path) -----------------
    # Target rows per split task: big enough to amortize task overhead
    # and give the per-batch combiner real runs, small enough for ~4+
    # map waves per CPU at bench scale.
    REPLAY_SPLIT_ROWS = 500_000

    def _evolve_canonical(self, seg_schema: pa.Schema) -> pa.Schema:
        """Registry-evolve an incoming segment schema, then guarantee the
        lake contract: the core transcript payload columns always exist
        in committed state — an early segment missing e.g. `tool` is
        null-backfilled (matching the shard-actor path's transcript
        normalize), so the commit stage can rely on PAYLOAD_COLS
        unconditionally."""
        import ray
        evolved = ray.get(self.registry.evolve.remote(
            seg_schema.serialize().to_pybytes()))
        canon = pa.ipc.read_schema(pa.BufferReader(evolved))
        missing = [f for f in BINLOG_SCHEMA if f.name not in canon.names]
        if missing:
            evolved = ray.get(self.registry.evolve.remote(pa.schema(
                list(canon) + missing).serialize().to_pybytes()))
            canon = pa.ipc.read_schema(pa.BufferReader(evolved))
        return canon

    def replay(self, ds, checkpoint_name: str = "replay",
               min_lsn_exclusive: Optional[int] = None,
               merge_prior: bool = True,
               watermark_floor: Optional[int] = None) -> list[dict]:
        """Replay a binlog Dataset straight to a committed lake — the
        bulk/backfill fast path (``ingest()`` + shard actors remain the
        low-latency incremental path):

            split tasks: watermark filter + schema normalize + per-batch
                LWW pre-compaction (combiner) + hash-split → P shards
            commit tasks (one per partition): gather its shards from every
                split, merge prior checkpoint state, final LWW compaction,
                write checkpoint snapshot + lake file (idempotent)

        The exchange is a raw two-stage task shuffle (see _replay_split):
        hash co-location without Ray Data's sort-based groupby, whose
        SortReduce goes super-linear at tens of millions of rows. Every
        stage runs as tasks across all cluster CPUs, so throughput scales
        with nodes while the partition LAYOUT (num_partitions) stays
        fixed. Partitions with no new events carry their prior checkpoint
        state forward (hardlink), so every checkpoint is a COMPLETE state
        set — merging from the latest checkpoint can never drop a
        partition that happened to be quiet in one segment.

        Exactly-once: same mechanism as ingest+commit — idempotent
        per-partition files, atomic manifest append; a crashed replay()
        rerun rewrites the same files and re-merges from the LAST
        completed checkpoint (LWW merge is idempotent). Returns the
        lineage entries.
        """
        import ray
        import ray.data as rd
        if isinstance(ds, pa.Table):
            ds = rd.from_arrow(ds)
        seg_schema = ds.schema().base_schema
        self._canonical = self._evolve_canonical(seg_schema)
        cp = self.manifest.last_checkpoint()
        if self.auto_salt and not self.hot_convs and cp is None:
            # first segment of a fresh lake: detect hot conversations by
            # one cheap sampled pass and durably record the salt layout
            # (it must stay identical for the lake's lifetime)
            hot = detect_hot_convs(ds, sample_frac=None)
            if hot:
                if self.salt_turns <= 1:
                    self.salt_turns = min(3, self.num_partitions)
                self.hot_convs = frozenset(hot)
            self._fenced_append({
                "type": "salt", "salt_turns": self.salt_turns,
                "hot_convs": sorted(self.hot_convs or []),
                "auto": True})
        if min_lsn_exclusive is None:
            min_lsn_exclusive = (cp.get("lsn_hi") or 0) if cp else 0
        prior_dir = os.path.join(self.ckpt_dir, cp["name"]) \
            if (cp and merge_prior) else None
        prep = _PrepareShuffle(self.num_partitions, self._canonical,
                               self.salt_turns, self.hot_convs,
                               min_lsn_exclusive, carry_watermark=True,
                               dlq_dir=self.dlq_dir,
                               expectations=self.expectations)
        # captured HERE (driver) so workers see it via the serialized prep
        prep.exchange_lz4 = os.environ.get("DATAVEC_EXCHANGE_LZ4") == "1"
        turn_t = ("int64" if pa.types.is_int64(
            self._canonical.field("turn_idx").type) else "int32")
        commit_fn = _ReplayCompactCommit(
            self.lake_dir, os.path.join(self.ckpt_dir, checkpoint_name),
            prior_dir, turn_t,
            delta_mode=self.commit_mode == "delta",
            seg_label=checkpoint_name)
        P = self.num_partitions
        split_task = ray.remote(_replay_split).options(num_returns=P + 1)
        commit_task = ray.remote(_replay_commit)
        # Stream the upstream dataset's blocks out and launch split tasks
        # as bundles arrive; group small blocks so each split task sees
        # ~REPLAY_SPLIT_ROWS rows.
        split_refs: list = []
        pending: list = []
        pending_rows = 0

        def _flush_pending():
            nonlocal pending, pending_rows
            if pending:
                split_refs.append(split_task.remote(prep, P, *pending))
                pending, pending_rows = [], 0

        timing = os.environ.get("DATAVEC_REPLAY_TIMING") == "1"
        t0 = time.time() if timing else 0.0
        for bundle in ds.iter_internal_ref_bundles():
            for bref, meta in bundle.blocks:
                pending.append(bref)
                pending_rows += meta.num_rows or 0
                if pending_rows >= self.REPLAY_SPLIT_ROWS:
                    _flush_pending()
        _flush_pending()
        if timing:
            import sys
            print(f"[replay] stream+launch {time.time()-t0:.2f}s "
                  f"({len(split_refs)} splits)", file=sys.stderr)
            ray.wait([sr[P] for sr in split_refs],
                     num_returns=len(split_refs))
            print(f"[replay] splits done {time.time()-t0:.2f}s",
                  file=sys.stderr)
        lineage_refs = [
            commit_task.remote(commit_fn, pid,
                               *[sr[pid] for sr in split_refs])
            for pid in range(P)]
        del split_refs
        results = [l for l in ray.get(lineage_refs) if l is not None]
        if timing:
            import sys
            print(f"[replay] commits done {time.time()-t0:.2f}s",
                  file=sys.stderr)
        carried = [l for l in results if l.pop("carried_forward", False)]
        lineages = [l for l in results if "state_rows" not in l]
        # watermark can never move backwards even if a segment was empty
        lsn_hi = max((l["lsn_hi"] for l in lineages),
                     default=min_lsn_exclusive)
        if watermark_floor is not None:
            lsn_hi = max(lsn_hi, watermark_floor)
        self._fenced_append({
            "type": "checkpoint", "name": checkpoint_name, "lsn_hi": lsn_hi,
            "layout": P,
            "partitions": len(lineages) + len(carried),
            "keys": (sum(l["rows"] + l["deletes"] for l in lineages)
                     + sum(l["state_rows"] for l in carried)),
            "schema": self._canonical.serialize().to_pybytes().hex()})
        committed = self.manifest.committed_watermarks()
        for l in lineages:
            l["type"] = "commit"
            if committed.get(l["partition"]) == l["lsn_hi"]:
                continue  # crash-rerun of an already-committed partition
            self._fenced_append(l)
        self.events_seen += sum(l["events_applied"] for l in lineages)
        if self.commit_mode == "delta" and self.auto_compact_segments:
            over = [pid for pid in range(P)
                    if len(_delta_segment_files(self.lake_dir, pid))
                    >= self.auto_compact_segments]
            if over:
                self.compact(over)
        return lineages

    # -- layout evolution -------------------------------------------------
    def repartition(self, new_num_partitions: int,
                    checkpoint_name: str = "repartition") -> list[dict]:
        """Change the lake's partition LAYOUT (split when partitions
        outgrow a node, merge when over-sharded) — the scale knob a
        long-lived 100 TB lake eventually needs, since `num_partitions`
        is otherwise fixed at creation.

        Mechanism: the latest checkpoint's FULL state (live rows +
        tombstones, read per old partition) is already binlog-shaped
        (lsn/op/key/payload/ts), so it replays through the ordinary
        two-stage exchange at the NEW partition count with prior-state
        merging disabled (the old layout's partition files must not
        merge positionally into the new layout) and the LSN watermark
        floored at the manifest's current value (events beyond the max
        surviving row's lsn were already applied; the watermark must
        not regress). Exactly-once exactly as replay(): idempotent
        per-partition files + atomic manifest append — a crashed
        repartition rerun rewrites the same files.

        After the commit, stale lake files beyond the new count are
        removed (shrink case) and a `repartition` audit entry records
        the layout change. Checkpoint segments BEFORE the boundary keep
        the old layout — time travel reads still work, but change/
        retract feeds cannot cross a layout boundary (partition-aligned
        diff; TimeTravel raises). Shard actors are reset; the next
        ingest() builds the new pool. When reopening a lake later, size
        the engine with ``detect_num_partitions(lake_dir)``.
        """
        import ray
        import ray.data as rd
        if new_num_partitions < 1:
            raise ValueError("new_num_partitions must be >= 1")
        cp = self.manifest.last_checkpoint()
        if not cp:
            raise RuntimeError("nothing to repartition: no checkpoint yet")
        prior_dir = os.path.join(self.ckpt_dir, cp["name"])
        old_pids = sorted(
            int(f[len("part-"):-len(".parquet")])
            for f in os.listdir(prior_dir)
            if f.startswith("part-") and f.endswith(".parquet")
            and ".payload." not in f)
        old_p = self.num_partitions
        wm = self.manifest.watermark()
        task = ray.remote(read_checkpoint_partition)
        refs = [task.remote(prior_dir, pid) for pid in old_pids]
        state_ds = rd.from_arrow_refs(refs)
        self.num_partitions = int(new_num_partitions)
        self.shards = None                      # new layout → new pool
        if self.ingest_mode in ("router", "shuffle"):
            self.ingest_mode = (
                "shuffle"
                if self.num_partitions >= self.AUTO_SHUFFLE_PARTITIONS
                else "router")
        lineages = self.replay(state_ds, checkpoint_name=checkpoint_name,
                               min_lsn_exclusive=0, merge_prior=False,
                               watermark_floor=wm)
        # shrink: drop lake files the new layout no longer writes
        for pid in old_pids:
            if pid >= self.num_partitions:
                stale = os.path.join(self.lake_dir,
                                     f"part-{pid:04d}.parquet")
                if os.path.exists(stale):
                    os.remove(stale)
        self._fenced_append({"type": "repartition", "from": old_p,
                              "to": self.num_partitions,
                              "name": checkpoint_name, "lsn_hi": wm})
        return lineages

    def resalt(self, hot_convs: Optional[Sequence[str]],
               salt_turns: int = 3,
               checkpoint_name: str = "resalt") -> list[dict]:
        """Change the lake's hot-conversation salting — a PHYSICAL
        layout migration, because a key's owning partition depends on
        the hot set (see the ctor comment). Same mechanism as
        ``repartition()``: the latest checkpoint's full state replays
        through the ordinary exchange under the NEW salt config with
        prior-state merging disabled and the watermark floored, then a
        durable ``salt`` manifest entry records the new layout for
        every future writer/reader of this lake."""
        import ray
        import ray.data as rd
        new_hot = frozenset(hot_convs) if hot_convs else None
        cp = self.manifest.last_checkpoint()
        if cp is None:                    # empty lake: config-only change
            self.hot_convs = new_hot
            self.salt_turns = int(salt_turns) if new_hot else 1
            self._fenced_append({
                "type": "salt", "salt_turns": self.salt_turns,
                "hot_convs": sorted(self.hot_convs or []), "auto": False})
            return []
        prior_dir = os.path.join(self.ckpt_dir, cp["name"])
        old_pids = sorted(
            int(f[len("part-"):-len(".parquet")])
            for f in os.listdir(prior_dir)
            if f.startswith("part-") and f.endswith(".parquet")
            and ".payload." not in f)
        wm = self.manifest.watermark()
        task = ray.remote(read_checkpoint_partition)
        refs = [task.remote(prior_dir, pid) for pid in old_pids]
        state_ds = rd.from_arrow_refs(refs)
        self.hot_convs = new_hot
        self.salt_turns = int(salt_turns) if new_hot else 1
        self.shards = None                # new routing → new pool
        lineages = self.replay(state_ds, checkpoint_name=checkpoint_name,
                               min_lsn_exclusive=0, merge_prior=False,
                               watermark_floor=wm)
        self._fenced_append({
            "type": "salt", "salt_turns": self.salt_turns,
            "hot_convs": sorted(self.hot_convs or []), "auto": False,
            "name": checkpoint_name, "lsn_hi": wm})
        return lineages

    # -- resume ---------------------------------------------------------
    def resume_from_checkpoint(self) -> int:
        """Load the latest snapshot set; returns the LSN watermark (events
        with lsn <= watermark are already reflected in state)."""
        import ray
        cp = self.manifest.last_checkpoint()
        if not cp:
            return 0
        loads = []
        for pid in range(self.num_partitions):
            path = os.path.join(self.ckpt_dir, cp["name"], f"part-{pid:04d}.parquet")
            if os.path.exists(path):
                loads.append(self.shards[pid].load_snapshot.remote(path))
        ray.get(loads)
        if cp.get("schema"):
            self._canonical = pa.ipc.read_schema(
                pa.BufferReader(bytes.fromhex(cp["schema"])))
            ray.get(self.registry.evolve.remote(self._canonical.serialize().to_pybytes()))
        return cp.get("lsn_hi") or 0

    # -- ingest ----------------------------------------------------------
    def ingest(self, ds, min_lsn_exclusive: int = 0) -> int:
        """Stream a binlog segment (ray Dataset or pa.Table) through the
        router into the shards. Returns events routed."""
        import ray
        import ray.data as rd
        if self.commit_mode == "delta":
            raise NotImplementedError(
                "commit_mode='delta' supports the batch replay() path "
                "(the shard-actor ingest path flushes full snapshots); "
                "use replay(), or open the engine with "
                "commit_mode='rewrite' for low-latency actor ingest")
        if isinstance(ds, pa.Table):
            ds = rd.from_arrow(ds)
        seg_schema = ds.schema().base_schema
        self._canonical = self._evolve_canonical(seg_schema)
        if self.ingest_mode == "router":
            router = _Router(self.shards, self.num_partitions, self._canonical,
                             self.salt_turns, self.hot_convs, min_lsn_exclusive,
                             dlq_dir=self.dlq_dir,
                             expectations=self.expectations)
            # large batches: the router pre-compacts vectorized and fans
            # out, so per-call overhead (actor RPC per partition) must be
            # amortized
            kwargs: dict[str, Any] = {"batch_format": "pyarrow",
                                      "batch_size": self.router_batch_size}
            if self.router_concurrency:
                kwargs["concurrency"] = self.router_concurrency
            acks = ds.map_batches(router, **kwargs)
            submitted: dict[int, int] = {}
            routed = 0
            for b in acks.iter_batches(batch_format="pyarrow"):
                for pid, m, r in zip(b["pid"].to_pylist(),
                                     b["msgs"].to_pylist(),
                                     b["rows"].to_pylist()):
                    submitted[pid] = submitted.get(pid, 0) + m
                    routed += r
            # applies are fire-and-forget behind the router's window:
            # barrier on DELIVERY before anyone can checkpoint/commit
            self._router_barrier(submitted)
            self.events_seen += routed
            return routed
        else:
            # shuffle mode: Ray-native hash shuffle (map-side LWW
            # pre-compaction → groupby(__part)) then EXACTLY ONE apply per
            # partition per segment carrying the fully pre-merged delta —
            # actor RPCs are O(P), and the all-to-all is Ray Data's own
            # (pipelined, spillable), mirroring aggregateByKey partial/final
            # (SparkTransformExecutor.java:252-290).
            prep = _PrepareShuffle(self.num_partitions, self._canonical,
                                   self.salt_turns, self.hot_convs,
                                   min_lsn_exclusive, dlq_dir=self.dlq_dir,
                                   expectations=self.expectations)
            deliver = _Deliver(self.shards)
            acks = (ds.map_batches(prep, batch_format="pyarrow",
                                   batch_size=self.router_batch_size)
                    .groupby("__part")
                    .map_groups(deliver, batch_format="pyarrow"))
        routed = int(sum(b["routed"][0].as_py()
                         for b in acks.iter_batches(batch_format="pyarrow")))
        self.events_seen += routed
        return routed

    # -- checkpoint -------------------------------------------------------
    def checkpoint(self, name: str, lsn_hi: int) -> dict:
        import ray
        d = os.path.join(self.ckpt_dir, name)
        infos = ray.get([s.snapshot.remote(os.path.join(d, f"part-{p:04d}.parquet"))
                         for p, s in enumerate(self.shards)])
        entry = {"type": "checkpoint", "name": name, "lsn_hi": lsn_hi,
                 "layout": self.num_partitions,
                 "partitions": len(infos),
                 "keys": sum(i["keys"] for i in infos),
                 "schema": (self._canonical.serialize().to_pybytes().hex()
                            if self._canonical else None)}
        self._fenced_append(entry)
        return entry

    # -- commit -----------------------------------------------------------
    def commit(self) -> list[dict]:
        """Write the lake (idempotent per-partition files + manifest
        lineage entries). A partition is skipped ONLY when its last
        commit entry's lsn_hi equals the shard's current lsn_hi —
        an ingest→commit→ingest→commit sequence re-flushes (resume-safe
        AND freshness-safe)."""
        import ray
        turn_t = "int64" if (self._canonical is not None and
                             pa.types.is_int64(self._canonical.field("turn_idx").type)) \
            else "int32"
        committed = self.manifest.committed_watermarks()
        current = ray.get([s.watermark.remote() for s in self.shards])
        lineages = []
        refs = {}
        for pid, s in enumerate(self.shards):
            if pid in committed and committed[pid] == current[pid]:
                continue
            path = os.path.join(self.lake_dir, f"part-{pid:04d}.parquet")
            refs[pid] = s.flush.remote(path, turn_t)
        for pid, ref in refs.items():
            lineage = ray.get(ref)
            lineage["type"] = "commit"
            self._fenced_append(lineage)
            lineages.append(lineage)
        return lineages

    def tail(self, wal_dir: str, poll_interval: float = 0.5,
             idle_rounds: int = 3, checkpoint_every: int = 1) -> dict:
        """Tail a WAL directory: ingest new segment parquet files as they
        appear (lexicographic order = LSN order by convention), resuming
        from the manifest's watermark. Stops after `idle_rounds` polls
        with no new files (a real deployment would run forever). Returns
        {segments, events, watermark}.

        Exactly-once across restarts: a segment seen again after a crash
        is re-ingested but the LSN watermark filter + idempotent LWW
        merge make the replay harmless; the manifest records per-segment
        checkpoints. Producers must place segment files ATOMICALLY
        (write temp + rename) — the tail reads any .parquet it lists."""
        import ray.data as rd

        wm = self.resume_from_checkpoint()
        done = {e.get("segment") for e in self.manifest.entries
                if e.get("type") in ("checkpoint", "tail-progress")
                and e.get("segment")}
        idle = 0
        n_segments = 0
        n_events = 0
        since_ckpt = 0
        while idle < idle_rounds:
            files = sorted(f for f in os.listdir(wal_dir)
                           if f.endswith(".parquet"))
            new = [f for f in files if f not in done]
            if not new:
                idle += 1
                time.sleep(poll_interval)
                continue
            idle = 0
            for f in new:
                path = os.path.join(wal_dir, f)
                if self.commit_mode == "delta":
                    # the LSM path IS the tailing path: each WAL segment
                    # commits one small delta per touched partition
                    # (replay checkpoints + commits itself), instead of
                    # rewriting every partition file per segment
                    lin = self.replay(rd.read_parquet(path),
                                      checkpoint_name=f"tail-{f}",
                                      min_lsn_exclusive=wm)
                    n = sum(l["events_applied"] for l in lin)
                    wm = max(wm, _segment_max_lsn(path, default=wm))
                    done.add(f)
                    n_segments += 1
                    n_events += n
                    for e in reversed(self.manifest.entries):
                        if e.get("type") == "checkpoint" \
                                and e.get("name") == f"tail-{f}":
                            e["segment"] = f
                            break
                    self._fenced_append({"type": "tail-progress",
                                         "segment": f, "lsn_hi": wm})
                    continue
                n = self.ingest(rd.read_parquet(path), min_lsn_exclusive=wm)
                wm = max(wm, _segment_max_lsn(path, default=wm))
                done.add(f)
                n_segments += 1
                n_events += n
                since_ckpt += 1
                if since_ckpt >= checkpoint_every:
                    entry = self.checkpoint(f"tail-{f}", wm)
                    entry["segment"] = f
                    # rewrite the last manifest entry with the segment tag
                    self.manifest.entries[-1]["segment"] = f
                    self._fenced_append({"type": "tail-progress",
                                          "segment": f, "lsn_hi": wm})
                    since_ckpt = 0
        return {"segments": n_segments, "events": n_events, "watermark": wm}

    def bootstrap(self, ds, base_lsn: int = 0,
                  checkpoint_name: str = "bootstrap") -> list[dict]:
        """Initial-snapshot bootstrap — the 'snapshot then stream'
        pattern of production CDC connectors: seed the lake from an
        EXISTING plain transcript table (TRANSCRIPT_SCHEMA shape, no
        binlog columns) by framing every row as an insert ("I") change
        event at ``base_lsn``, then running the exactly-once bulk
        ``replay``. Continue with ``tail()`` afterwards (it resumes from
        the bootstrap checkpoint itself), or hydrate the shard actors
        with ``resume_from_checkpoint()`` before incremental
        ``ingest()`` — the same contract as crash-resume. WAL events
        carry lsn > base_lsn, so on any (conv_id, turn_idx) ts tie the
        monotonic-LSN tiebreaker makes the stream win over the
        snapshot — a snapshot taken while the WAL is already live
        converges to the same final state as a full-history replay."""
        import ray.data as rd
        if isinstance(ds, pa.Table):
            ds = rd.from_arrow(ds)

        def frame(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            out = pa.table({
                "lsn": pa.nulls(n, pa.int64()).fill_null(base_lsn),
                "op": pa.nulls(n, pa.string()).fill_null("I"),
            })
            for name in batch.column_names:
                out = out.append_column(batch.field(name), batch[name])
            return out

        return self.replay(ds.map_batches(frame, batch_format="pyarrow"),
                           checkpoint_name=checkpoint_name,
                           min_lsn_exclusive=-1)

    def shutdown(self, gc_spill: bool = True) -> None:
        """Kill shard/registry actors (bench + batch jobs that create
        several engines per process; otherwise dead handles linger until
        GC and their worker processes pile up).

        Also sweeps the shard L1 spill directory: spill runs are an
        actor-local cache that every checkpoint/flush folds back into the
        durable state (``_full_state``), so once the actors are dead the
        runs — including orphans left by a crashed actor — are garbage.
        """
        import ray
        for s in (self._shards or []):
            ray.kill(s)
        ray.kill(self.registry)
        self._shards = None
        if gc_spill and self.shard_spill_dir and os.path.isdir(self.shard_spill_dir):
            import shutil
            shutil.rmtree(self.shard_spill_dir, ignore_errors=True)

    # -- read back --------------------------------------------------------
    def read_lake_dataset(self, columns: Optional[list[str]] = None):
        """The production way to read the lake: a streaming
        ``ray.data.read_parquet`` Dataset over the committed partition
        files — no driver materialization, no global sort. Partitions
        are internally sorted by (conv_id, turn_idx) at flush time.

        ``columns`` prunes the scan: rewrite-mode files read only
        those columns off disk (parquet column pruning); delta-mode
        merge tasks read the requested columns plus the LWW
        resolution set (conv_id, turn_idx, ts, lsn, op) — a 2-column
        analytics pass over a wide lake never ships the wide payload.

        Delta-mode (merge-on-read) partitions get ONE merge task each —
        parallelism is the partition layout, exactly like the commit
        stage — while rewrite-mode files stream through a plain parquet
        read; a half-migrated lake unions both."""
        import ray.data as rd
        names = [f for f in os.listdir(self.lake_dir)
                 if f.endswith(".parquet")]
        seg_pids = sorted({int(f[len("part-"):].split(".")[0])
                           for f in names
                           if ".base." in f or ".delta-" in f})
        plain = sorted(os.path.join(self.lake_dir, f) for f in names
                       if ".base." not in f and ".delta-" not in f)
        parts = []
        if plain:
            parts.append(rd.read_parquet(plain, columns=columns))
        if seg_pids:
            lake_dir = self.lake_dir
            lww_cols = ["conv_id", "turn_idx", "ts", "lsn", "op"]
            seg_cols = (lww_cols + [c for c in columns
                                    if c not in lww_cols]
                        if columns is not None else None)
            out_cols = columns

            def merge_read(batch: pa.Table) -> pa.Table:
                tabs = []
                for pid in batch["pid"].to_pylist():
                    st = merge_segments(
                        _delta_segment_files(lake_dir, pid),
                        drop_tombstones=True, columns=seg_cols)
                    if st.num_rows:
                        st = sort_conv_turn(st).drop_columns(["lsn", "op"])
                        if out_cols is not None:
                            st = st.select(out_cols)
                        tabs.append(st)
                if not tabs:
                    empty = TRANSCRIPT_SCHEMA.empty_table()
                    return empty.select(out_cols) if out_cols is not None \
                        else empty
                return pa.concat_tables(tabs, promote_options="permissive")

            merge_read.__name__ = "lake_merge_read"
            parts.append(
                rd.from_arrow(pa.table({"pid": pa.array(seg_pids,
                                                        pa.int64())}))
                .repartition(len(seg_pids))
                .map_batches(merge_read, batch_format="pyarrow"))
        if not parts:
            empty = TRANSCRIPT_SCHEMA.empty_table()
            return rd.from_arrow(empty.select(columns)
                                 if columns is not None else empty)
        return parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])

    def sql(self, statement: str,
            columns: Optional[Sequence[str]] = None,
            tables: Optional[dict] = None):
        """Query the lake through the SQL frontend: the live LWW state
        is registered as table ``lake`` (column-pruned via
        ``columns`` — pass the referenced columns so rewrite-mode
        partitions read only those off disk), plus any extra
        ``tables``. Returns the planned ``ray.data.Dataset``."""
        from datavec_ray.sql import sql as _sql
        t = {"lake": self.read_lake_dataset(
            list(columns) if columns is not None else None)}
        if tables:
            t.update(tables)
        return _sql(statement, t)

    def table_stats(self, columns: Optional[Sequence[str]] = None,
                    files_per_task: int = 64) -> dict:
        """Exact table statistics — row count and per-column
        min/max/null_count — computed from parquet FOOTERS only for
        rewrite-mode partitions: ``count(*)`` / ``min`` / ``max`` over
        a 100 TB lake answers in seconds because only metadata leaves
        storage. Sound because a committed rewrite-mode partition file
        IS the live state (tombstones physically dropped at commit,
        ``commit_partition``).

        Three escape hatches keep the answer EXACT, never approximate:
        delta-mode partitions (base/delta rows overlap, tombstones
        hide rows) take a column-pruned merge-on-read task each;
        string/binary columns fall back to a pruned scan (parquet may
        truncate string min/max in footers); and any row group with
        missing statistics triggers the same scan fallback. The
        ``footer_only`` flag in the result reports whether any data
        pages were read.

        Footer reads fan out as Ray tasks (``files_per_task`` footers
        per task) so a 64k-file lake scans its metadata in parallel.
        """
        import ray

        cols = list(columns or [])
        names = [f for f in os.listdir(self.lake_dir)
                 if f.endswith(".parquet") and f.startswith("part-")]
        plain = sorted(os.path.join(self.lake_dir, f) for f in names
                       if ".base." not in f and ".delta-" not in f)
        seg_pids = sorted({int(f[len("part-"):].split(".")[0])
                           for f in names
                           if ".base." in f or ".delta-" in f})
        parts: list[dict] = []
        tasks = []
        if plain:
            foot = ray.remote(_footer_stats)
            tasks += [foot.remote(plain[i:i + files_per_task], cols)
                      for i in range(0, len(plain), files_per_task)]
        if seg_pids:
            delta = ray.remote(_delta_stats)
            tasks += [delta.remote(self.lake_dir, pid, cols)
                      for pid in seg_pids]
        if tasks:
            parts = ray.get(tasks)
        total = _merge_stats(parts, cols)
        fallback = sorted(total.pop("fallback"))
        if fallback and plain:
            # pruned re-scan of ONLY the untrusted columns over ONLY
            # the rewrite-mode files; per-batch partials, driver merge
            import ray.data as rd

            def _partial(t: pa.Table) -> pa.Table:
                row = {}
                for c in fallback:
                    mm = pc.min_max(t[c])
                    row[f"{c}__min"] = [mm["min"].as_py()]
                    row[f"{c}__max"] = [mm["max"].as_py()]
                    row[f"{c}__nulls"] = [t[c].null_count]
                return pa.table(row)
            _partial.__name__ = "stats_fallback_partial"
            small = rd.read_parquet(plain, columns=fallback).map_batches(
                _partial, batch_format="pyarrow").take_all()
            for c in fallback:
                acc = {"min": None, "max": None, "null_count": 0}
                for r in small:
                    acc["null_count"] += r[f"{c}__nulls"]
                    for k, f in (("min", min), ("max", max)):
                        v = r[f"{c}__{k}"]
                        if v is not None:
                            acc[k] = v if acc[k] is None else f(acc[k], v)
                # delta partitions already contributed exact values
                d = total["cols"][c]
                acc["null_count"] += sum(
                    p["cols"][c]["null_count"] for p in parts
                    if c not in p["fallback"] and p["files"] == 0)
                for k, f in (("min", min), ("max", max)):
                    dv = None
                    for p in parts:
                        if p["files"] == 0 and p["cols"][c][k] is not None:
                            pv = p["cols"][c][k]
                            dv = pv if dv is None else f(dv, pv)
                    if dv is not None:
                        acc[k] = dv if acc[k] is None else f(acc[k], dv)
                total["cols"][c] = acc
        return {"rows": total["rows"], "files": total["files"],
                "bytes": total["bytes"],
                "footer_only": not fallback and not seg_pids,
                "columns": total["cols"]}

    def compact(self, partitions: Optional[Sequence[int]] = None) -> list[dict]:
        """Fold every delta segment back into its partition's base
        segment (delta/LSM lakes; rewrite-mode partitions are already
        one file). One Ray task per partition — same parallelism unit
        as the commit stage, so a 256-node cluster compacts 256
        partitions at once. Returns one summary dict per partition
        that actually had deltas to fold, and appends a ``compact``
        manifest entry for each (the manifest stays the audit trail of
        every lake mutation). Run it on whatever cadence read
        amplification warrants — reads stay correct at any point
        (merge-on-read), compaction only makes them cheaper."""
        import ray
        pids = (list(partitions) if partitions is not None
                else list(range(self.num_partitions)))
        task = ray.remote(_compact_partition)
        results = [r for r in ray.get(
            [task.remote(self.lake_dir, pid) for pid in pids])
            if r is not None]
        for r in results:
            self._fenced_append(dict(r, type="compact"))
        return results

    def vacuum(self, prune_keep_last: Optional[int] = None,
               gc_spill: bool = True,
               drop_stages: bool = False) -> dict:
        """Lake housekeeping. Removes crash-orphaned atomic-write temp
        files (``*.tmp*`` left by a writer killed between write and
        rename — every committed file is written tmp-then-rename, so a
        surviving tmp is garbage by construction), optionally prunes
        old checkpoint versions (``TimeTravel.prune_versions``), and
        clears shard spill files. Never touches committed data: those
        are manifest-governed, idempotently named, and never carry a
        tmp suffix. Run from the CURRENT fenced writer only — any
        other writer's in-flight tmp files belong to a zombie this
        writer has already fenced out. Returns
        {tmp_removed, versions_pruned, spill_files_removed}."""
        if self.fence_writer and \
                self.manifest.reload_max_epoch() > self.writer_epoch:
            raise WriterFencedError(
                f"writer epoch {self.writer_epoch} fenced: refusing to "
                "vacuum a lake a newer writer owns")
        tmp_removed = 0
        for root in (self.lake_dir, self.ckpt_dir):
            if not os.path.isdir(root):
                continue
            for dirpath, _dirs, files in os.walk(root):
                if self.shard_spill_dir and \
                        os.path.abspath(dirpath).startswith(
                            os.path.abspath(self.shard_spill_dir)):
                    continue  # spill handled separately below
                for f in files:
                    if ".tmp" in f:
                        try:
                            os.remove(os.path.join(dirpath, f))
                            tmp_removed += 1
                        except FileNotFoundError:
                            pass
        pruned: list[str] = []
        if prune_keep_last is not None:
            pruned = self.time_travel().prune_versions(prune_keep_last)
        spill_removed = 0
        # spill files back LIVE shard-actor state — only collectible
        # when this engine never instantiated its shard pool (replay-
        # only lakes) ; live pools clean up in shutdown(gc_spill=True)
        if gc_spill and self._shards is None and self.shard_spill_dir \
                and os.path.isdir(self.shard_spill_dir):
            for dirpath, _dirs, files in os.walk(self.shard_spill_dir):
                for f in files:
                    try:
                        os.remove(os.path.join(dirpath, f))
                        spill_removed += 1
                    except FileNotFoundError:
                        pass
        stages_removed: list[str] = []
        if drop_stages:
            # abandoned WAP staging areas. Safe by the WAP ordering:
            # anything a publish durably committed already lives in the
            # main lake + manifest (a published stage's leftover dir is
            # pure garbage from a crash before cleanup); an unpublished
            # stage is by definition not reader-visible, so dropping it
            # discards only staged-but-never-published work. Opt-in
            # because a LIVE producer may still intend to publish.
            if os.path.isdir(self.lake_dir):
                for d in sorted(os.listdir(self.lake_dir)):
                    if not d.startswith("_stage_"):
                        continue
                    full = os.path.join(self.lake_dir, d)
                    if os.path.isdir(full):
                        import shutil
                        shutil.rmtree(full, ignore_errors=True)
                        stages_removed.append(d[len("_stage_"):])
        return {"tmp_removed": tmp_removed, "versions_pruned": pruned,
                "spill_files_removed": spill_removed,
                "stages_removed": stages_removed}

    def lookup(self, conv_ids) -> pa.Table:
        """Serving-style POINT READS: hash each requested conv_id to its
        owning lake partition (the same ``assign_partitions`` routing
        ingest uses) and read ONLY those partition files, with a
        conv_id row filter pushed into the parquet read — work is
        O(#owning partitions), never a lake scan. Salted hot
        conversations are resolved by probing every salt variant.
        Returns live rows sorted by (conv_id, turn_idx). High-QPS
        serving would wrap this in a read actor per partition; the
        routing math is identical."""
        ids = sorted({str(c) for c in conv_ids})
        if not ids:
            return TRANSCRIPT_SCHEMA.empty_table()
        arr = pa.array(ids, pa.string())
        h = hash64(arr).astype(np.uint64)
        P = np.uint64(self.num_partitions)
        pids = set((h % P).astype(int).tolist())
        if self.salt_turns > 1 and self.hot_convs:
            gold = np.uint64(0x9E3779B97F4A7C15)
            # uint64 wraparound is the salt-probe hash's intent — keep
            # numpy from warning about it (same as assign_partitions)
            with np.errstate(over="ignore"):
                for cid, hh in zip(ids, h):
                    if cid in self.hot_convs:
                        for s in range(self.salt_turns):
                            pids.add(int((hh + np.uint64(s) * gold) % P))
        tables = []
        for pid in sorted(pids):
            segs = _delta_segment_files(self.lake_dir, pid)
            if segs:
                # key filter pushed into EVERY segment read is LWW-safe
                # (filtering on the key keeps all versions of a key)
                t = merge_segments(segs, drop_tombstones=True,
                                   filters=[("conv_id", "in", ids)])
                if t.num_rows:
                    tables.append(t.drop_columns(["lsn", "op"]))
                continue
            path = os.path.join(self.lake_dir, f"part-{pid:04d}.parquet")
            if os.path.exists(path):
                t = pq.read_table(path, filters=[("conv_id", "in", ids)])
                if t.num_rows:
                    tables.append(t)
        if not tables:
            return TRANSCRIPT_SCHEMA.empty_table()
        out = pa.concat_tables(tables, promote_options="permissive")
        return out.sort_by([("conv_id", "ascending"),
                            ("turn_idx", "ascending")])

    def read_dlq(self) -> pa.Table:
        """All dead-lettered events (original columns + ``reason``).
        Empty table when the DLQ is disabled or clean."""
        if self.dlq_dir is None or not os.path.isdir(self.dlq_dir):
            return pa.table({"reason": pa.array([], pa.string())})
        files = sorted(os.path.join(self.dlq_dir, f)
                       for f in os.listdir(self.dlq_dir)
                       if f.endswith(".parquet"))
        if not files:
            return pa.table({"reason": pa.array([], pa.string())})
        return pa.concat_tables([pq.read_table(f) for f in files],
                                promote_options="permissive")

    def _fenced_append(self, entry: dict) -> None:
        """Manifest append guarded by the writer epoch (no-op guard
        when fencing is off)."""
        if self.fence_writer and \
                self.manifest.reload_max_epoch() > self.writer_epoch:
            raise WriterFencedError(
                f"writer epoch {self.writer_epoch} fenced: a newer "
                f"writer opened this lake")
        self.manifest.append(entry)

    def metrics(self) -> dict:
        """Operational rollup of the manifest's lineage: totals across
        every commit (events applied, lake rows, stale/dedup drops,
        deletes), per-partition LSN watermarks (min/max spread shows
        partition lag), and snapshot/commit counts. Pure manifest read —
        no state or lake access."""
        commits = [e for e in self.manifest.entries
                   if e.get("type") == "commit"]
        ckpts = [e for e in self.manifest.entries
                 if e.get("type") == "checkpoint"]
        wms = self.manifest.committed_watermarks()
        vals = [w for w in wms.values() if w is not None]
        return {
            "commits": len(commits),
            "checkpoints": len(ckpts),
            "events_applied": sum(e.get("events_applied", 0) for e in commits),
            "rows_live": sum(e.get("rows", 0) for e in commits),
            "stale_dropped": sum(e.get("stale_dropped", 0) for e in commits),
            "deletes": sum(e.get("deletes", 0) for e in commits),
            "partitions_committed": len(wms),
            "dlq_rows": (self.read_dlq().num_rows
                         if self.dlq_dir is not None else 0),
            "watermark": self.manifest.watermark(),
            "partition_watermark_min": min(vals) if vals else None,
            "partition_watermark_max": max(vals) if vals else None,
            "compactions": sum(1 for e in self.manifest.entries
                               if e.get("type") == "compact"),
            "lake_segments": sum(
                1 for f in os.listdir(self.lake_dir)
                if f.endswith(".parquet")) if os.path.isdir(self.lake_dir)
            else 0,
        }

    def delete_where(self, predicate, checkpoint_name: str = "delete") -> dict:
        """Bulk predicate delete (GDPR/retention erasure) as FIRST-CLASS
        CDC tombstones: scan the live lake with a column-pruned read,
        keep the keys ``predicate(table) -> bool mask`` selects, emit D
        events at fresh LSNs (watermark+1...) and replay them through
        the normal exactly-once commit path — so the deletion is
        crash-resumable, shows up in time travel / change feeds /
        retract streams and incremental views like any other change,
        and the lineage records how many rows it erased.

        ``predicate`` receives each lake batch as a pa.Table (all
        columns) and returns a boolean numpy/pyarrow mask. Returns a
        summary dict. O(lake scan) + one replay of only the matched
        keys."""
        import ray

        import pyarrow.compute as _pc

        names = [f for f in os.listdir(self.lake_dir)
                 if f.startswith("part-") and f.endswith(".parquet")]
        plain = sorted(os.path.join(self.lake_dir, f) for f in names
                       if ".base." not in f and ".delta-" not in f)
        seg_pids = sorted({int(f[len("part-"):].split(".")[0])
                           for f in names
                           if ".base." in f or ".delta-" in f})
        wm = self.manifest.watermark()

        def _mask_keys(t: pa.Table):
            mask = predicate(t)
            if not isinstance(mask, pa.Array):
                mask = pa.array(np.asarray(mask, dtype=bool))
            return t.select(["conv_id", "turn_idx", "ts"]).filter(mask)

        @ray.remote
        def _matched_keys(path: str):
            return _mask_keys(pq.read_table(path))

        @ray.remote
        def _matched_keys_merged(lake_dir: str, pid: int):
            # delta lake: the predicate must see the LIVE state, not
            # raw segments (superseded versions / tombstones would
            # match stale payloads)
            t = merge_segments(_delta_segment_files(lake_dir, pid),
                               drop_tombstones=True)
            return _mask_keys(t.drop_columns(["lsn", "op"]))

        # one task per partition — only the narrow matched KEYS
        # return to the driver (bounded by the erasure size, never the
        # lake), same per-file unit as the index builder
        refs = [_matched_keys.remote(p) for p in plain] + \
            [_matched_keys_merged.remote(self.lake_dir, pid)
             for pid in seg_pids]
        keys = [t for t in ray.get(refs) if t.num_rows]
        if not keys:
            return {"deleted": 0, "watermark": wm}
        sel = pa.concat_tables(keys)
        n = sel.num_rows
        tomb = pa.table({
            "lsn": pa.array(np.arange(wm + 1, wm + 1 + n), pa.int64()),
            "op": pa.array(["D"] * n, pa.string()),
            "conv_id": sel["conv_id"],
            "turn_idx": _pc.cast(sel["turn_idx"], pa.int32()),
            "role": pa.array([None] * n, pa.string()),
            "text": pa.array([None] * n, pa.string()),
            "tool": pa.array([None] * n, pa.string()),
            "ts": _pc.cast(sel["ts"], pa.timestamp("ms")),
        })
        self.replay(tomb, checkpoint_name=checkpoint_name)
        return {"deleted": n, "watermark": self.manifest.watermark()}

    def merge_into(self, source, when_matched_update=True,
                   when_matched_delete=None,
                   when_not_matched_insert=True,
                   checkpoint_name: str = "merge") -> dict:
        """ANSI-``MERGE``-shaped conditional upsert of a source
        changeset into the lake (reference parity: DataVec has no MERGE;
        this is the CDC-lake generalization of its conditional
        replace/filter steps, `transform/condition/*` — the SQL MERGE
        semantics over last-writer-wins state):

            WHEN MATCHED [AND when_matched_delete]  THEN DELETE
            WHEN MATCHED [AND when_matched_update]  THEN UPDATE (full
                payload from the source row)
            WHEN NOT MATCHED [AND when_not_matched_insert] THEN INSERT

        Each clause is ``None``/``False`` (absent), ``True``
        (unconditional), or a vectorized predicate: matched clauses get
        ``fn(src: pa.Table, tgt: pa.Table) -> bool mask`` over
        row-ALIGNED matched pairs (tgt = the live lake row), the insert
        clause gets ``fn(src)``. DELETE is evaluated before UPDATE
        (fixed clause order, as in SQL MERGE). Source rows whose key
        matches no clause are no-ops.

        Plan: ONE hash exchange routes source rows with the engine's
        own partitioner (salt-aware); one task per touched partition
        reads that partition's LIVE state (merge-on-read for LSM
        layouts), left-joins source→target on (conv_id, turn_idx),
        evaluates the clauses vectorized, and emits D / U / I change
        events with collision-free strided LSNs
        (``watermark + 1 + i*P + pid`` — unique across partitions with
        no coordination). The events then REPLAY through the normal
        exactly-once commit path, so a merge is crash-resumable and
        visible to time travel / change feeds / incremental views like
        any other change batch. Work and memory are bounded by the
        CHANGESET size, never the lake. Duplicate source keys resolve
        through replay's LWW (ts, then lsn). Returns
        {updated, deleted, inserted, watermark}."""
        import ray.data as rd

        if isinstance(source, pa.Table):
            source = rd.from_arrow(source)
        wm = self.manifest.watermark()
        P = self.num_partitions
        lake_dir = self.lake_dir
        salt_turns = self.salt_turns
        hot = frozenset(self.hot_convs) if getattr(self, "hot_convs", None) \
            else None
        upd, dele, ins = when_matched_update, when_matched_delete, \
            when_not_matched_insert

        def _tag(batch: pa.Table) -> pa.Table:
            pid = assign_partitions(batch["conv_id"], batch["turn_idx"],
                                    P, salt_turns, hot)
            return batch.replace_schema_metadata(None).append_column(
                pa.field("__pid", pa.int64()), pa.array(pid))

        def _events(src_pd, op: str, lsn: np.ndarray) -> pa.Table:
            n = len(src_pd)
            none = pa.nulls(n, pa.string())
            payload = (lambda c: pa.array(src_pd[c], pa.string(),
                                          from_pandas=True))
            return pa.table({
                "lsn": pa.array(lsn, pa.int64()),
                "op": pa.array([op] * n, pa.string()),
                "conv_id": pa.array(src_pd["conv_id"], pa.string(),
                                    from_pandas=True),
                "turn_idx": pa.array(src_pd["turn_idx"], pa.int32(),
                                     from_pandas=True),
                "role": none if op == "D" else payload("role"),
                "text": none if op == "D" else payload("text"),
                "tool": none if op == "D" else payload("tool"),
                "ts": pa.array(src_pd["ts"], pa.timestamp("ms"),
                               from_pandas=True),
            })

        def _empty_events() -> pa.Table:
            return _events(__import__("pandas").DataFrame(
                {c: [] for c in ("conv_id", "turn_idx", "role", "text",
                                 "tool", "ts")}), "U",
                np.zeros(0, np.int64))

        def _mask(clause, *tabs) -> np.ndarray:
            n = tabs[0].num_rows
            if clause is True:
                return np.ones(n, dtype=bool)
            if not clause:
                return np.zeros(n, dtype=bool)
            m = clause(*tabs)
            if isinstance(m, (pa.Array, pa.ChunkedArray)):
                m = pc.fill_null(m, False).to_numpy(zero_copy_only=False)
            return np.asarray(m, dtype=bool)

        def merge_group(group: pa.Table) -> pa.Table:
            import pandas as pd
            if group.num_rows == 0:
                return _empty_events()
            pid = int(group["__pid"][0].as_py())
            src = group.drop_columns(["__pid"]).sort_by(
                [("conv_id", "ascending"), ("turn_idx", "ascending"),
                 ("ts", "ascending")])
            live = _read_lake_partition(lake_dir, pid)
            sp = src.to_pandas()
            lp = live.select(
                ["conv_id", "turn_idx", "role", "text", "tool", "ts"]) \
                .to_pandas()
            j = sp.merge(lp, on=["conv_id", "turn_idx"], how="left",
                         suffixes=("", "__t"), indicator=True)
            matched = (j["_merge"] == "both").to_numpy()
            src_cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            jm = j[matched]
            src_m = pa.Table.from_pandas(jm[src_cols],
                                         preserve_index=False)
            tgt_m = pa.Table.from_pandas(
                jm[["conv_id", "turn_idx"]].join(
                    jm[[c + "__t" for c in src_cols[2:]]].rename(
                        columns=lambda c: c[:-3])),
                preserve_index=False)
            del_m = _mask(dele, src_m, tgt_m)
            upd_m = _mask(upd, src_m, tgt_m) & ~del_m
            ju = j[~matched]
            src_u = pa.Table.from_pandas(ju[src_cols],
                                         preserve_index=False)
            ins_m = _mask(ins, src_u)
            parts, n_out = [], 0
            for frame, op in ((jm[del_m], "D"), (jm[upd_m], "U"),
                              (ju[ins_m], "I")):
                if len(frame) == 0:
                    continue
                lsn = wm + 1 + (n_out + np.arange(len(frame),
                                                  dtype=np.int64)) * P + pid
                parts.append(_events(frame, op, lsn))
                n_out += len(frame)
            return pa.concat_tables(parts) if parts else _empty_events()

        merge_group.__name__ = "merge_into"
        events = source.map_batches(_tag, batch_format="pyarrow") \
            .groupby("__pid") \
            .map_groups(merge_group, batch_format="pyarrow") \
            .materialize()      # bounded by the changeset; executed ONCE
        from datavec_ray.util import dataset_to_table
        ops = dataset_to_table(events.groupby("op").count())
        cnt = dict(zip(ops["op"].to_pylist(),
                       ops["count()"].to_pylist())) if ops.num_rows else {}
        if events.count():
            self.replay(events, checkpoint_name=checkpoint_name)
        return {"updated": cnt.get("U", 0), "deleted": cnt.get("D", 0),
                "inserted": cnt.get("I", 0),
                "watermark": self.manifest.watermark()}

    def mirror_to_jdbc(self, connection_factory, table: str,
                       upto: Optional[str] = None,
                       upsert_sql: Optional[str] = None) -> dict:
        """Incrementally materialize the lake into an external DB-API
        table via the change feed (idempotent key upserts/deletes; the
        mirror position lives in the target DB). See
        :func:`datavec_ray.cdc.jdbc_mirror.mirror_to_jdbc`."""
        from datavec_ray.cdc.jdbc_mirror import mirror_to_jdbc
        return mirror_to_jdbc(self, connection_factory, table,
                              upto=upto, upsert_sql=upsert_sql)

    def stage(self, name: str):
        """Open a write-audit-publish staged commit: replay into an
        isolated staging area seeded (by hardlink) with this lake's
        current state, validate the staged table, then ``publish()``
        atomically or ``abort()`` without ever mutating the live lake.
        See :class:`datavec_ray.cdc.wap.StagedCommit`."""
        from datavec_ray.cdc.wap import StagedCommit
        return StagedCommit(self, name)

    @staticmethod
    def replay_tables(base_dir: str, tables: dict, **kw) -> dict:
        """Atomic MULTI-TABLE transactional replay: one engine + lake
        per table under ``base_dir``, a shared committed-txn gate
        (``txn_col=...``), WAP-staged writes and a coordinator journal
        so a crash between tables leaves either ALL tables advanced or
        NONE visible. See :mod:`datavec_ray.cdc.multitable`."""
        from datavec_ray.cdc.multitable import replay_tables
        return replay_tables(base_dir, tables, **kw)

    def replicate_to(self, target: "CdcIngestEngine",
                     upto: Optional[str] = None,
                     checkpoint_prefix: str = "repl") -> dict:
        """Incremental lake→lake replication (CDC fan-out): ship the
        row-level change feed between the mirror's last-replicated
        source snapshot and the newest (or ``upto``) source snapshot
        into a DOWNSTREAM mirror lake, through the mirror's normal
        exactly-once replay path.

        The mirror records its replication position as a
        ``{"type": "replication", "source": ..., "snapshot": ...}``
        manifest entry, so catch-up is resumable: re-running after a
        crash between the mirror's commit and the position append
        replays the same feed, whose LSNs are all <= the mirror's
        watermark, so the replay is a filtered no-op (idempotent).
        Change-feed LSNs are the SOURCE's, so the mirror's watermark
        tracks source progress directly; the mirror must be dedicated
        to this source (no interleaved direct ingest with its own LSN
        space). Source and mirror may use DIFFERENT partition layouts
        — events re-route through the mirror's own partitioner.

        Cost is proportional to the CHANGESET (one aligned
        partition-diff task per source partition, then one replay of
        the delta), never the lake. Snapshots consumed by a mirror
        must not be pruned on the source until replicated past
        (``ValueError`` otherwise — rebuild the mirror from scratch).
        Returns {from, to, events, watermark, noop}."""
        tt = self.time_travel()
        vs = [v for v in tt.versions() if v["available"]]
        if not vs:
            raise ValueError("source lake has no committed snapshots")
        names = [v["name"] for v in vs]
        to_name = names[-1] if upto is None else upto
        if to_name not in names:
            raise ValueError(f"snapshot {to_name!r} not available on source")
        src_id = os.path.abspath(self.lake_dir)
        last = None
        for e in target.manifest.entries:
            if e.get("type") == "replication" and e.get("source") == src_id:
                last = e
        from_name = last["snapshot"] if last else None
        if from_name == to_name:
            return {"from": from_name, "to": to_name, "events": 0,
                    "noop": True,
                    "watermark": target.manifest.watermark()}
        if from_name is not None:
            if from_name not in names:
                raise ValueError(
                    f"last replicated snapshot {from_name!r} was pruned "
                    "on the source; rebuild the mirror from scratch")
            if names.index(from_name) > names.index(to_name):
                raise ValueError(
                    f"upto={to_name!r} is older than the mirror's "
                    f"replicated position {from_name!r}")
        # lake contract turn type from the target segment's state files
        # (footer read only) — the feed widens turn_idx to int64
        seg_dir = os.path.join(self.ckpt_dir, to_name)
        state_files = sorted(f for f in os.listdir(seg_dir)
                             if f.endswith(".parquet"))
        turn_t = pq.read_schema(
            os.path.join(seg_dir, state_files[0])).field("turn_idx").type \
            if state_files else pa.int32()

        def to_binlog(b: pa.Table) -> pa.Table:
            ct = b["change_type"]
            op = pc.if_else(pc.equal(ct, "delete"), "D",
                            pc.if_else(pc.equal(ct, "update"), "U", "I"))
            return pa.table({
                "lsn": b["lsn"], "op": op, "conv_id": b["conv_id"],
                "turn_idx": b["turn_idx"].cast(turn_t),
                "role": b["role"], "text": b["text"], "tool": b["tool"],
                "ts": b["ts"]})

        feed = tt.change_feed(from_name, to_name) \
            .map_batches(to_binlog, batch_format="pyarrow")
        lineage = target.replay(
            feed, checkpoint_name=f"{checkpoint_prefix}-{to_name}")
        n = sum(e.get("events_applied", 0) for e in lineage)
        target._fenced_append({
            "type": "replication", "source": src_id, "snapshot": to_name,
            "from": from_name, "events_applied": n,
            "lsn_hi": target.manifest.watermark()})
        return {"from": from_name, "to": to_name, "events": n,
                "noop": False, "watermark": target.manifest.watermark()}

    def follow_into(self, target: "CdcIngestEngine",
                    poll_interval: float = 0.5,
                    idle_rounds: int = 3) -> dict:
        """Continuous replication: poll this lake for new committed
        snapshots and ``replicate_to`` each into the mirror, until
        ``idle_rounds`` consecutive polls find nothing new (mirrors
        ``tail``'s idle contract). Each hop is the same exactly-once
        catch-up as a manual replicate_to, so a killed follower
        resumes from the mirror's recorded position. Returns
        {hops, events, watermark}."""
        idle = hops = events = 0
        while idle < idle_rounds:
            # the follower may run in a different process than the
            # source's writer — the manifest FILE is the source of truth
            self.manifest.reload()
            try:
                r = self.replicate_to(target)
            except ValueError:
                # no committed snapshots yet — keep polling
                time.sleep(poll_interval)
                idle += 1
                continue
            if r["noop"]:
                idle += 1
                time.sleep(poll_interval)
            else:
                idle = 0
                hops += 1
                events += r["events"]
        return {"hops": hops, "events": events,
                "watermark": target.manifest.watermark()}

    def secondary_index(self, columns, fp: float = 0.01):
        """Bloom-sidecar lookup index for NON-key columns (role, tool,
        ...) — see ``datavec_ray.cdc.index.SecondaryIndex``. Build is
        one column-pruned task per partition file; lookups read only
        Bloom-candidate partitions."""
        from datavec_ray.cdc.index import SecondaryIndex
        return SecondaryIndex(self, columns, fp=fp)

    def zonemaps(self, columns) -> "ZoneMapIndex":
        """Min/max (zonemap) statistics sidecar over the lake's data
        files — footer-only build, per-file freshness signatures. See
        ``datavec_ray.cdc.index.ZoneMapIndex`` and ``scan_where``.
        Instances are cached per column set."""
        from datavec_ray.cdc.index import ZoneMapIndex
        key = tuple(sorted(columns))
        cache = getattr(self, "_zonemap_cache", None)
        if cache is None:
            cache = self._zonemap_cache = {}
        if key not in cache:
            cache[key] = ZoneMapIndex(self, sorted(columns))
        return cache[key]

    def scan_where(self, filters, columns: Optional[list[str]] = None,
                   check_fresh: bool = True):
        """Data-skipping range scan of the live lake: a streaming
        Dataset of the rows matching ``filters`` (a conjunction of
        ``(col, op, value)`` with op in ==/=/</<=/>/>=/between/in),
        reading ONLY files whose zonemap stats intersect the predicate.
        After ``optimize(cluster_by=[col])`` the stats are tight on
        that column and a narrow range touches a small fraction of
        row groups; the exact filter is always applied to every row
        read, so results are identical to a full scan either way.
        The skipping decision is recorded in ``self.last_scan_report``.

        Rewrite-mode candidate files stream through one
        ``read_parquet`` with the predicate pushed into the fragment
        scan (row-group pruning + row filtering inside the read);
        delta-mode candidate partitions get one merge-on-read task
        each, filtered post-merge (an LWW winner's stats live in SOME
        segment, so non-candidate partitions are provably empty for
        the predicate)."""
        import ray.data as rd

        zm = self.zonemaps([c for c, _, _ in filters])
        if check_fresh or not zm._files:
            zm.refresh()
        cand = zm.candidates(filters)
        self.last_scan_report = cand["report"]
        parts = []
        if cand["plain"]:
            import pyarrow.dataset as pads
            expr = None
            for col, op, val in filters:
                f = pads.field(col)
                e = {"==": lambda: f == val, "=": lambda: f == val,
                     "<": lambda: f < val, "<=": lambda: f <= val,
                     ">": lambda: f > val, ">=": lambda: f >= val,
                     "between": lambda: (f >= val[0]) & (f <= val[1]),
                     "in": lambda: f.isin(list(val))}[op]()
                expr = e if expr is None else expr & e
            paths = [os.path.join(self.lake_dir, f)
                     for f in sorted(cand["plain"])]
            ds = rd.read_parquet(paths, columns=columns, filter=expr)
            parts.append(ds)
        if cand["delta_pids"]:
            lake_dir = self.lake_dir
            lww_cols = ["conv_id", "turn_idx", "ts", "lsn", "op"]
            seg_cols = (lww_cols + [c for c in (columns or [])
                                    if c not in lww_cols]
                        + [c for c, _, _ in filters
                           if c not in lww_cols and c not in (columns or [])]
                        if columns is not None else None)
            out_cols = columns
            flts = list(filters)

            def merge_scan(batch: pa.Table) -> pa.Table:
                tabs = []
                for pid in batch["pid"].to_pylist():
                    st = merge_segments(
                        _delta_segment_files(lake_dir, pid),
                        drop_tombstones=True, columns=seg_cols)
                    if st.num_rows:
                        st = _filter_table(st, flts)
                    if st.num_rows:
                        st = sort_conv_turn(st).drop_columns(["lsn", "op"])
                        if out_cols is not None:
                            st = st.select(out_cols)
                        tabs.append(st)
                if not tabs:
                    empty = TRANSCRIPT_SCHEMA.empty_table()
                    return empty.select(out_cols) if out_cols is not None \
                        else empty
                return pa.concat_tables(tabs, promote_options="permissive")

            merge_scan.__name__ = "lake_merge_scan"
            pids = cand["delta_pids"]
            parts.append(
                rd.from_arrow(pa.table({"pid": pa.array(pids, pa.int64())}))
                .repartition(len(pids))
                .map_batches(merge_scan, batch_format="pyarrow"))
        if not parts:
            empty = TRANSCRIPT_SCHEMA.empty_table()
            return rd.from_arrow(empty.select(columns)
                                 if columns is not None else empty)
        return parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])

    def optimize(self, cluster_by, partitions: Optional[Sequence[int]] = None,
                 row_group_rows: int = 131_072,
                 zorder: bool = False) -> list[dict]:
        """OPTIMIZE: re-cluster each partition's data file(s) sorted by
        ``cluster_by`` (ties broken by (conv_id, turn_idx)) and written
        with ``row_group_rows``-row row groups, so zonemap / parquet
        statistics on those columns become tight per row group and
        range scans (``scan_where``) skip most of the lake. Delta-mode
        partitions are compacted into one clustered base in the same
        pass. Row CONTENT is untouched (reads are order-insensitive:
        every consumer re-sorts or hash-joins), writes are atomic
        tmp-then-rename (new inode — checkpoint hardlinks keep their
        old payloads), and each rewritten partition appends an
        ``optimize`` manifest audit entry. One Ray task per partition,
        the lake's usual parallelism unit. Multi-column clustering is
        lexicographic by default; ``zorder=True`` lays rows along a
        Morton curve over ALL listed columns (rank-quantized to 16 bits
        per dimension, layout-only) so zonemaps prune MULTI-column
        range predicates — the OPTIMIZE ZORDER trade: slightly looser
        stats on the first column, bounded stats on every column."""
        import ray
        if self.fence_writer and \
                self.manifest.reload_max_epoch() > self.writer_epoch:
            raise WriterFencedError(
                f"writer epoch {self.writer_epoch} fenced: refusing to "
                "optimize a lake a newer writer owns")
        cluster_by = list(cluster_by)
        pids = (list(partitions) if partitions is not None
                else list(range(self.num_partitions)))
        task = ray.remote(_optimize_partition)
        results = [r for r in ray.get(
            [task.remote(self.lake_dir, pid, cluster_by, row_group_rows,
                         zorder) for pid in pids]) if r is not None]
        for r in results:
            self._fenced_append(dict(r, type="optimize",
                                     cluster_by=",".join(cluster_by)))
        return results

    def time_travel(self):
        """Snapshot history / as-of reads / change feed over the retained
        checkpoint chain — see ``datavec_ray.cdc.timetravel``."""
        from datavec_ray.cdc.timetravel import TimeTravel
        bits = 64 if (self._canonical is not None and pa.types.is_int64(
            self._canonical.field("turn_idx").type)) else 32
        return TimeTravel(self.ckpt_dir, self.manifest, turn_idx_bits=bits)

    def read_lake(self) -> pa.Table:
        """TEST/ORACLE convenience ONLY — materializes + globally sorts the
        whole lake on the driver. Production readers use
        ``read_lake_dataset()``."""
        names = sorted(f for f in os.listdir(self.lake_dir)
                       if f.endswith(".parquet"))
        tables = [pq.read_table(os.path.join(self.lake_dir, f))
                  for f in names if ".base." not in f and ".delta-" not in f]
        seg_pids = sorted({int(f[len("part-"):].split(".")[0])
                           for f in names
                           if ".base." in f or ".delta-" in f})
        for pid in seg_pids:
            st = merge_segments(_delta_segment_files(self.lake_dir, pid),
                                drop_tombstones=True)
            if st.num_rows:
                tables.append(st.drop_columns(["lsn", "op"]))
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return TRANSCRIPT_SCHEMA.empty_table()
        out = pa.concat_tables(tables, promote_options="permissive")
        return out.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


# ---------------------------------------------------------------------------
# Pure-Dataset LWW compaction (no actor state) — the replay-query path
# ---------------------------------------------------------------------------

class _PartialCompact:
    """Per-batch pre-compaction + partition assignment (combiner)."""

    def __init__(self, num_partitions: int):
        self.num_partitions = num_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = lww_compact_table(batch, drop_tombstones=False)
        parts = assign_partitions(batch["conv_id"], batch["turn_idx"],
                                  self.num_partitions)
        return batch.append_column(pa.field("__part", pa.int64()),
                                   pa.array(parts))


class _FinalCompact:
    def __init__(self, out_schema: pa.Schema):
        self.out_schema = out_schema
        self.__name__ = "lww_final_compact"

    def __call__(self, group: pa.Table) -> pa.Table:
        out = lww_compact_table(group, drop_tombstones=True)
        out = out.drop_columns([c for c in ("__part", "op", "lsn")
                                if c in out.column_names])
        return normalize_to_schema(out, self.out_schema)


def lww_compact_dataset(ds, num_partitions: int = 32,
                        out_schema: pa.Schema = TRANSCRIPT_SCHEMA):
    """binlog Dataset → final transcript state, as a pure Dataset pipeline:

        map_batches(per-batch LWW pre-compaction + hash partition column)
          → groupby(__part)               # ONE shuffle, P partitions
          → map_groups(vectorized final LWW compaction, drop tombstones)

    The per-batch combiner collapses every batch to one winner per key
    first, so the shuffle moves at most |distinct keys per batch| rows —
    the aggregateByKey partial/final split from the reference
    (``SparkTransformExecutor.java:252-290``) applied to upsert.
    """
    return (ds.map_batches(_PartialCompact(num_partitions), batch_format="pyarrow")
            .groupby("__part")
            .map_groups(_FinalCompact(out_schema), batch_format="pyarrow"))


def _read_lake_partition(lake_dir: str, pid: int) -> pa.Table:
    """One partition's LIVE state (tombstones dropped), whichever
    commit mode wrote it: LSM segments merge-on-read, a rewrite-mode
    plain file reads directly."""
    segs = _delta_segment_files(lake_dir, pid)
    if segs:
        return sort_conv_turn(
            merge_segments(segs, drop_tombstones=True)
            .drop_columns(["lsn", "op"]))
    plain = os.path.join(lake_dir, f"part-{pid:04d}.parquet")
    if os.path.exists(plain):
        return pq.read_table(plain)
    return TRANSCRIPT_SCHEMA.empty_table()


def copartitioned_lake_join(eng_a: "CdcIngestEngine",
                            eng_b: "CdcIngestEngine",
                            on: Sequence[str] = ("conv_id", "turn_idx"),
                            join_type: str = "inner",
                            right_suffix: str = "_r"):
    """SHUFFLE-FREE equi-join of two CDC lakes that share the
    partitioner: both lakes route keys with the same
    ``assign_partitions`` hash, so rows of any conv_id live in
    partition file ``hash(conv) % P`` on BOTH sides — partition i of A
    joins only partition i of B. One Ray task per partition reads the
    two aligned files (merge-on-read for LSM partitions) and joins
    locally: ZERO exchange, parallelism = the partition layout — on a
    256-node cluster a 100 TB ⋈ 100 TB lake join moves no data at all
    beyond the reads. This is the payoff of the engine-wide "pick ONE
    partitioning key and reuse it" discipline (state enrichment,
    snapshot diffing, current-vs-backfill reconciliation).

    Requires identical ``num_partitions`` and that neither lake salted
    hot conversations (salting spreads a conv over sub-partitions, so
    per-partition alignment on conv_id alone no longer holds); raises
    otherwise. ``on`` must start with ``conv_id`` (the routing key).
    """
    import ray.data as rd

    if eng_a.num_partitions != eng_b.num_partitions:
        raise ValueError(
            f"lakes are not co-partitioned: {eng_a.num_partitions} != "
            f"{eng_b.num_partitions} partitions")
    for eng in (eng_a, eng_b):
        if getattr(eng, "salt_turns", 1) > 1 and getattr(
                eng, "hot_convs", None):
            raise ValueError(
                "co-partitioned join requires unsalted lakes (salted "
                "hot convs span sub-partitions); compact/repartition "
                "without salting first")
    on = list(on)
    if not on or on[0] != "conv_id":
        raise ValueError("join keys must start with the routing key "
                         "conv_id")
    dir_a, dir_b = eng_a.lake_dir, eng_b.lake_dir
    P = eng_a.num_partitions
    how = {"inner": "inner", "left": "left outer",
           "right": "right outer", "full": "full outer"}[join_type]

    def _join_pid(batch: pa.Table) -> pa.Table:
        outs = []
        for pid in batch["pid"].to_pylist():
            ta = _read_lake_partition(dir_a, pid)
            tb = _read_lake_partition(dir_b, pid)
            j = ta.join(tb, keys=on, join_type=how,
                        right_suffix=right_suffix)
            if j.num_rows:
                outs.append(j)
        if not outs:
            # typed empty: join the two empty partition schemas
            return _read_lake_partition(dir_a, 0).slice(0, 0).join(
                _read_lake_partition(dir_b, 0).slice(0, 0), keys=on,
                join_type=how, right_suffix=right_suffix)
        return pa.concat_tables(outs, promote_options="permissive")

    _join_pid.__name__ = "copartitioned_lake_join"
    return rd.from_arrow(pa.table({"pid": pa.array(range(P), pa.int64())})) \
        .repartition(P).map_batches(_join_pid, batch_format="pyarrow")
