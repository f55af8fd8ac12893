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

        def __init__(self, pid: int):
            self.pid = pid
            self.segments: list[pa.Table] = []
            self.pending = 0          # rows appended since last compaction
            self.base = 0             # rows in the compacted base
            self.applied = 0          # events routed here (incl. replays)
            self.stale = 0            # events superseded by LWW (dedup count)
            self.lsn_lo: Optional[int] = None
            self.lsn_hi: Optional[int] = None

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
            return n_in

        # -- state serde ------------------------------------------------
        def snapshot(self, path: str) -> dict:
            state = self._compact()
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            pq.write_table(state, tmp)
            os.replace(tmp, path)
            return {"partition": self.pid, "keys": state.num_rows,
                    "lsn_hi": self.lsn_hi}

        def load_snapshot(self, path: str) -> int:
            tbl = pq.read_table(path)
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
            state = self._compact()
            deletes = int(pc.sum(pc.cast(pc.equal(state["op"], "D"),
                                         pa.int64())).as_py() or 0)
            live = state.filter(pc.not_equal(state["op"], "D"))
            live = live.sort_by([("conv_id", "ascending"),
                                 ("turn_idx", "ascending")])
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
                    "lsn_hi": self.lsn_hi}

        def watermark(self) -> Optional[int]:
            return self.lsn_hi

    return UpsertShard


def _registry_cls():
    import ray

    @ray.remote(num_cpus=0)
    class SchemaRegistry:
        """Arrow-schema-unification actor: holds the canonical schema,
        evolves it additively / by widening via pa.unify_schemas."""

        def __init__(self, initial: Optional[bytes] = None):
            self.schema: Optional[pa.Schema] = (
                pa.ipc.read_schema(pa.BufferReader(initial)) if initial else None)

        def evolve(self, schema_bytes: bytes) -> bytes:
            incoming = pa.ipc.read_schema(pa.BufferReader(schema_bytes))
            if self.schema is None:
                self.schema = incoming
            else:
                self.schema = pa.unify_schemas([self.schema, incoming],
                                               promote_options="permissive")
            return self.schema.serialize().to_pybytes()

        def current(self) -> Optional[bytes]:
            return self.schema.serialize().to_pybytes() if self.schema else None

    return SchemaRegistry


# ---------------------------------------------------------------------------
# Manifest (commit log)
# ---------------------------------------------------------------------------

class Manifest:
    """Append-only JSON-lines commit log, atomically rewritten
    (tmp + rename) on every append — the single-committer invariant is
    held by the driver, which is the only writer."""

    def __init__(self, path: str):
        self.path = path
        self.entries: list[dict] = []
        if os.path.exists(path):
            with open(path) as f:
                self.entries = [json.loads(line) for line in f if line.strip()]

    def append(self, entry: dict) -> None:
        self.entries.append(entry)
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(tmp, "w") as f:
            for e in self.entries:
                f.write(json.dumps(e) + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)

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
    fan out to the shard actors. Returns a tiny ack table (counts)."""

    def __init__(self, handles, num_partitions: int, schema: pa.Schema,
                 salt_turns: int, hot_convs: Optional[frozenset],
                 min_lsn_exclusive: int):
        self.handles = handles
        self.num_partitions = num_partitions
        self.schema = schema
        self.salt_turns = salt_turns
        self.hot_convs = hot_convs
        self.min_lsn = min_lsn_exclusive

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray
        if self.min_lsn:
            batch = batch.filter(pc.greater(batch["lsn"], self.min_lsn))
        batch = normalize_to_schema(batch, self.schema)
        batch = lww_compact_table(batch, drop_tombstones=False)
        if batch.num_rows == 0:
            return pa.table({"routed": pa.array([0], pa.int64())})
        parts = assign_partitions(batch["conv_id"], batch["turn_idx"],
                                  self.num_partitions, self.salt_turns,
                                  self.hot_convs)
        refs = []
        for pid in np.unique(parts):
            sub = batch.filter(pa.array(parts == pid))
            refs.append(self.handles[int(pid)].apply.remote(sub))
        routed = sum(ray.get(refs))
        return pa.table({"routed": pa.array([routed], pa.int64())})


def detect_hot_convs(ds, sample_frac: float = 0.02,
                     hot_multiple: float = 20.0, max_hot: int = 64,
                     seed: int = 7) -> list[str]:
    """Sample-based hot-conversation detection for salting (the skew
    handling the north rule requires explicitly): sample the binlog,
    count events per conv_id, return convs whose sampled share exceeds
    ``hot_multiple``x the mean — candidates for `salt_turns` spreading.
    One cheap pass over a sample; no full shuffle."""
    import pyarrow as pa

    from datavec_ray.util import dataset_to_table

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


class _PrepareShuffle:
    """map_batches body for shuffle-mode ingest: filter watermark,
    normalize schema, per-batch LWW pre-compaction, assign partition."""

    def __init__(self, num_partitions: int, schema: pa.Schema, salt_turns: int,
                 hot_convs: Optional[frozenset], min_lsn_exclusive: int,
                 carry_watermark: bool = False):
        self.num_partitions = num_partitions
        self.schema = schema
        self.salt_turns = salt_turns
        self.hot_convs = hot_convs
        self.min_lsn = min_lsn_exclusive
        self.carry_watermark = carry_watermark

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.min_lsn:
            batch = batch.filter(pc.greater(batch["lsn"], self.min_lsn))
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


class _ReplayCompactCommit:
    """map_groups body for the batch-replay fast path: final LWW
    compaction of ONE hash partition (merged with the partition's prior
    checkpoint state, if any), then idempotent (temp + atomic rename)
    writes of the new checkpoint snapshot and the lake file. Returns one
    lineage row per partition.

    This stage runs as ordinary Ray tasks scheduled across ALL cluster
    CPUs — unlike the shard-actor path, its parallelism is not pinned to
    a fixed actor pool, so replay throughput scales with cluster size
    while the partition LAYOUT (num_partitions) stays fixed."""

    def __init__(self, lake_dir: str, ckpt_dir: str,
                 prior_ckpt_dir: Optional[str], turn_idx_type: str):
        self.lake_dir = lake_dir
        self.ckpt_dir = ckpt_dir
        self.prior_ckpt_dir = prior_ckpt_dir
        self.turn_idx_type = turn_idx_type
        self.__name__ = "replay_compact_commit"

    @staticmethod
    def _write_atomic(tbl: pa.Table, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)

    def __call__(self, group: pa.Table) -> pa.Table:
        lineage_schema = pa.schema([
            ("partition", pa.int64()), ("file", pa.string()),
            ("rows", pa.int64()), ("events_applied", pa.int64()),
            ("stale_dropped", pa.int64()), ("deletes", pa.int64()),
            ("lsn_lo", pa.int64()), ("lsn_hi", pa.int64())])
        if group.num_rows == 0:
            return lineage_schema.empty_table()
        pid = int(group["__part"][0].as_py())
        tbl = group.drop_columns(["__part"])
        events = tbl.num_rows
        lsn_lo = int(pc.min(tbl["lsn"]).as_py())
        lsn_hi = int(pc.max(tbl["lsn"]).as_py())
        if "__wm" in tbl.column_names:
            # watermark = max lsn ever DELIVERED (pre-compaction), which
            # can exceed the max surviving lsn
            lsn_hi = max(lsn_hi, int(pc.max(tbl["__wm"]).as_py()))
            tbl = tbl.drop_columns(["__wm"])
        if self.prior_ckpt_dir:
            prior_path = os.path.join(self.prior_ckpt_dir,
                                      f"part-{pid:04d}.parquet")
            if os.path.exists(prior_path):
                prior = normalize_to_schema(pq.read_table(prior_path),
                                            tbl.schema)
                if prior.num_rows:
                    lsn_lo = min(lsn_lo, int(pc.min(prior["lsn"]).as_py()))
                    lsn_hi = max(lsn_hi, int(pc.max(prior["lsn"]).as_py()))
                tbl = pa.concat_tables([prior, tbl])
        before = tbl.num_rows
        state = lww_compact_table(tbl, drop_tombstones=False)
        stale = before - state.num_rows
        self._write_atomic(state, os.path.join(self.ckpt_dir,
                                               f"part-{pid:04d}.parquet"))
        deletes = int(pc.sum(pc.cast(pc.equal(state["op"], "D"),
                                     pa.int64())).as_py() or 0)
        live = state.filter(pc.not_equal(state["op"], "D"))
        live = live.sort_by([("conv_id", "ascending"),
                             ("turn_idx", "ascending")])
        t_turn = pa.int64() if self.turn_idx_type == "int64" else pa.int32()
        out = pa.table({
            "conv_id": live["conv_id"],
            "turn_idx": live["turn_idx"].cast(t_turn),
            "role": live["role"],
            "text": live["text"],
            "tool": live["tool"],
            "ts": live["ts"].cast(pa.timestamp("ms")),
        })
        fname = f"part-{pid:04d}.parquet"
        self._write_atomic(out, os.path.join(self.lake_dir, fname))
        return pa.table({
            "partition": pa.array([pid], pa.int64()),
            "file": pa.array([fname], pa.string()),
            "rows": pa.array([out.num_rows], pa.int64()),
            "events_applied": pa.array([events], pa.int64()),
            "stale_dropped": pa.array([stale], pa.int64()),
            "deletes": pa.array([deletes], pa.int64()),
            "lsn_lo": pa.array([lsn_lo], pa.int64()),
            "lsn_hi": pa.array([lsn_hi], pa.int64()),
        }, schema=lineage_schema)


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
                 ingest_mode: str = "auto"):
        if ingest_mode not in ("shuffle", "router", "auto"):
            raise ValueError("ingest_mode must be 'shuffle', 'router' or 'auto'")
        if ingest_mode == "auto":
            ingest_mode = ("shuffle" if num_partitions >= self.AUTO_SHUFFLE_PARTITIONS
                           else "router")
        self.lake_dir = lake_dir
        self.num_partitions = num_partitions
        self.salt_turns = salt_turns
        self.hot_convs = frozenset(hot_convs) if hot_convs else None
        self.router_concurrency = router_concurrency
        self.router_batch_size = router_batch_size
        self.ingest_mode = ingest_mode
        self.manifest = Manifest(os.path.join(lake_dir, "_manifest.jsonl"))
        self.ckpt_dir = os.path.join(lake_dir, "_checkpoints")
        self.shard_num_cpus = shard_num_cpus
        # Shard actors are created lazily: the batch replay() path never
        # needs them (its state lives in checkpoint files, its tasks
        # schedule on the whole cluster).
        self._shards: Optional[list] = None
        Registry = _registry_cls()
        self.registry = Registry.remote()
        self._canonical: Optional[pa.Schema] = None
        self.events_seen = 0

    @property
    def shards(self) -> list:
        if self._shards is None:
            # Shards reserve fractional CPUs: they are I/O-ish point-update
            # workers fed by router tasks; reserving a full CPU each would
            # starve the map stage on small nodes (deadlock in local mode).
            Shard = _shard_cls()
            self._shards = [Shard.options(num_cpus=self.shard_num_cpus).remote(i)
                            for i in range(self.num_partitions)]
        return self._shards

    @shards.setter
    def shards(self, value) -> None:
        self._shards = value

    # -- batch replay (Dataset-native fast path) --------------------------
    # replay map batches are 4× the router's: no actor-RPC amortization
    # concern here, and larger batches mean fewer shuffle map tasks +
    # better per-batch combine (measured: 262144 beats 65536 by ~25% at
    # 32 CPUs and still leaves ~1.5 map tasks per core at sf0.1)
    REPLAY_BATCH_SIZE = 262_144

    def replay(self, ds, checkpoint_name: str = "replay",
               min_lsn_exclusive: Optional[int] = None) -> list[dict]:
        """Replay a binlog Dataset straight to a committed lake in ONE
        Dataset pipeline — the bulk/backfill fast path (``ingest()`` +
        shard actors remain the low-latency incremental path):

            map_batches(watermark filter + schema normalize + per-batch
                        LWW pre-compaction + hash partition)   # combiner
              → groupby(__part)         # ONE Ray-native shuffle
              → map_groups(_ReplayCompactCommit)
                  merge prior checkpoint state → final LWW compaction →
                  write checkpoint snapshot + lake file (idempotent)

        vs the shard-actor path this removes the per-sub-batch actor RPCs
        (~P per router batch) and the fixed P-actor parallelism ceiling:
        every stage runs as tasks across all cluster CPUs, so throughput
        scales with nodes while the partition layout stays fixed.

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
        evolved = ray.get(self.registry.evolve.remote(
            seg_schema.serialize().to_pybytes()))
        self._canonical = pa.ipc.read_schema(pa.BufferReader(evolved))
        cp = self.manifest.last_checkpoint()
        if min_lsn_exclusive is None:
            min_lsn_exclusive = (cp.get("lsn_hi") or 0) if cp else 0
        prior_dir = os.path.join(self.ckpt_dir, cp["name"]) if cp else None
        prep = _PrepareShuffle(self.num_partitions, self._canonical,
                               self.salt_turns, self.hot_convs,
                               min_lsn_exclusive, carry_watermark=True)
        turn_t = ("int64" if pa.types.is_int64(
            self._canonical.field("turn_idx").type) else "int32")
        commit_fn = _ReplayCompactCommit(
            self.lake_dir, os.path.join(self.ckpt_dir, checkpoint_name),
            prior_dir, turn_t)
        res = (ds.map_batches(prep, batch_format="pyarrow",
                              batch_size=self.REPLAY_BATCH_SIZE)
               .groupby("__part")
               .map_groups(commit_fn, batch_format="pyarrow"))
        batches = list(res.iter_batches(batch_format="pyarrow"))
        lineages = (pa.concat_tables(batches, promote_options="permissive")
                    .to_pylist() if batches else [])
        lsn_hi = max((l["lsn_hi"] for l in lineages), default=0)
        self.manifest.append({
            "type": "checkpoint", "name": checkpoint_name, "lsn_hi": lsn_hi,
            "partitions": len(lineages),
            "keys": sum(l["rows"] + l["deletes"] for l in lineages),
            "schema": self._canonical.serialize().to_pybytes().hex()})
        committed = self.manifest.committed_watermarks()
        for l in lineages:
            l["type"] = "commit"
            if committed.get(l["partition"]) == l["lsn_hi"]:
                continue  # crash-rerun of an already-committed partition
            self.manifest.append(l)
        self.events_seen += sum(l["events_applied"] for l in lineages)
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
        if isinstance(ds, pa.Table):
            ds = rd.from_arrow(ds)
        seg_schema = ds.schema().base_schema
        evolved = ray.get(self.registry.evolve.remote(
            seg_schema.serialize().to_pybytes()))
        self._canonical = pa.ipc.read_schema(pa.BufferReader(evolved))
        if self.ingest_mode == "router":
            router = _Router(self.shards, self.num_partitions, self._canonical,
                             self.salt_turns, self.hot_convs, min_lsn_exclusive)
            # large batches: the router pre-compacts vectorized and fans
            # out, so per-call overhead (actor RPC per partition) must be
            # amortized
            kwargs: dict[str, Any] = {"batch_format": "pyarrow",
                                      "batch_size": self.router_batch_size}
            if self.router_concurrency:
                kwargs["concurrency"] = self.router_concurrency
            acks = ds.map_batches(router, **kwargs)
        else:
            # shuffle mode: Ray-native hash shuffle (map-side LWW
            # pre-compaction → groupby(__part)) then EXACTLY ONE apply per
            # partition per segment carrying the fully pre-merged delta —
            # actor RPCs are O(P), and the all-to-all is Ray Data's own
            # (pipelined, spillable), mirroring aggregateByKey partial/final
            # (SparkTransformExecutor.java:252-290).
            prep = _PrepareShuffle(self.num_partitions, self._canonical,
                                   self.salt_turns, self.hot_convs,
                                   min_lsn_exclusive)
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
                 "partitions": len(infos),
                 "keys": sum(i["keys"] for i in infos),
                 "schema": (self._canonical.serialize().to_pybytes().hex()
                            if self._canonical else None)}
        self.manifest.append(entry)
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
            self.manifest.append(lineage)
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
                if e.get("type") == "checkpoint" and e.get("segment")}
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
                    self.manifest.append({"type": "tail-progress",
                                          "segment": f, "lsn_hi": wm})
                    since_ckpt = 0
        return {"segments": n_segments, "events": n_events, "watermark": wm}

    def shutdown(self) -> None:
        """Kill shard/registry actors (bench + batch jobs that create
        several engines per process; otherwise dead handles linger until
        GC and their worker processes pile up)."""
        import ray
        for s in (self._shards or []):
            ray.kill(s)
        ray.kill(self.registry)
        self._shards = None

    # -- read back --------------------------------------------------------
    def read_lake_dataset(self):
        """The production way to read the lake: a streaming
        ``ray.data.read_parquet`` Dataset over the committed partition
        files — no driver materialization, no global sort. Partitions
        are internally sorted by (conv_id, turn_idx) at flush time."""
        import ray.data as rd
        files = sorted(os.path.join(self.lake_dir, f)
                       for f in os.listdir(self.lake_dir)
                       if f.endswith(".parquet"))
        if not files:
            return rd.from_arrow(TRANSCRIPT_SCHEMA.empty_table())
        return rd.read_parquet(files)

    def read_lake(self) -> pa.Table:
        """TEST/ORACLE convenience ONLY — materializes + globally sorts the
        whole lake on the driver. Production readers use
        ``read_lake_dataset()``."""
        files = sorted(f for f in os.listdir(self.lake_dir)
                       if f.endswith(".parquet"))
        tables = [pq.read_table(os.path.join(self.lake_dir, f)) for f in files]
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
