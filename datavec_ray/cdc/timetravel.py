"""Time travel and change-data-feed over the CDC lake's checkpoint chain.

Every ``replay(..., checkpoint_name=...)`` / ``checkpoint(name, ...)``
leaves a COMPLETE per-partition state set under
``<lake>/_checkpoints/<name>/`` (quiet partitions are hardlinked
forward, payloads are hardlinks to immutable lake inodes — see
``read_checkpoint_partition``), and the manifest records each segment's
LSN watermark. That makes the checkpoint chain a version history for
free — the same mechanism Delta Lake / Iceberg snapshots provide:

- ``versions()``        — the committed snapshots (name, lsn_hi, keys).
- ``read_state_at``     — the lake AS OF a named snapshot, as a
  streaming Dataset (one read task per partition file, no driver
  materialization).
- ``read_state_as_of``  — the latest snapshot with watermark <= lsn.
- ``change_feed``       — the row-level delta BETWEEN two snapshots
  (insert / update / delete per (conv_id, turn_idx)), computed by a
  vectorized per-partition sidecar join: partitions align across
  segments (fixed partition count), so the diff never shuffles — it is
  P independent tasks each joining two narrow key/meta files.

On a multi-node cluster the checkpoint directory must be on shared
storage (as any checkpoint dir must be for resume); tasks read only
their own partition's files.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_KEY = ["conv_id", "turn_idx"]
_PAYLOAD = ["role", "text", "tool"]

CHANGE_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int64()),
    ("change_type", pa.string()),       # insert | update | delete
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("ms")),
    ("lsn", pa.int64()),
])

# retract stream: every change as +1/-1 FULL row images (an update is a
# -1 old image followed by a +1 new image) — the form downstream
# incremental operators consume (Flink/differential-dataflow convention)
RETRACT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int64()),
    ("sign", pa.int8()),                # +1 add | -1 retract
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("ms")),
    ("lsn", pa.int64()),
])


def _segment_dir(ckpt_dir: str, name: str) -> str:
    d = os.path.join(ckpt_dir, name)
    if not os.path.isdir(d):
        have = sorted(x for x in os.listdir(ckpt_dir)
                      if os.path.isdir(os.path.join(ckpt_dir, x))) \
            if os.path.isdir(ckpt_dir) else []
        raise FileNotFoundError(
            f"no checkpoint segment {name!r} under {ckpt_dir}; have {have}")
    return d


def _partition_ids(seg_dir: str) -> list[int]:
    # handles both checkpoint layouts: rewrite-mode sidecars
    # (part-XXXX.parquet) and delta-mode segment hardlinks
    # (part-XXXX.base.parquet / part-XXXX.delta-*.parquet)
    return sorted({int(f[len("part-"):].split(".")[0])
                   for f in os.listdir(seg_dir)
                   if f.startswith("part-") and f.endswith(".parquet")
                   and ".payload." not in f})


def _normalize_state(t: Optional[pa.Table]) -> pa.Table:
    """Checkpoint partition table → uniform (key, meta, payload) types."""
    if t is None:
        return CHANGE_SCHEMA.empty_table().drop_columns(["change_type"]) \
            .append_column("op", pa.array([], pa.string()))
    cols = {
        "conv_id": t["conv_id"].cast(pa.string()),
        "turn_idx": t["turn_idx"].cast(pa.int64()),
    }
    for c in _PAYLOAD:
        cols[c] = (t[c].cast(pa.string()) if c in t.column_names
                   else pa.nulls(t.num_rows, pa.string()))
    ts = t["ts"]
    if not pa.types.is_timestamp(ts.type):
        ts = ts.cast(pa.int64()).cast(pa.timestamp("ms"))
    else:
        ts = ts.cast(pa.timestamp("ms"))
    cols["ts"] = ts
    cols["lsn"] = t["lsn"].cast(pa.int64())
    cols["op"] = t["op"].cast(pa.string())
    return pa.table(cols)


def _live_lake_rows(state: pa.Table, turn_idx_type: pa.DataType) -> pa.Table:
    live = state.filter(pc.fill_null(pc.not_equal(state["op"], "D"), True))
    return pa.table({
        "conv_id": live["conv_id"],
        "turn_idx": live["turn_idx"].cast(turn_idx_type),
        "role": live["role"],
        "text": live["text"],
        "tool": live["tool"],
        "ts": live["ts"],
    }).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def _read_partition_live(seg_dir: str, pid: int,
                         turn_idx_bits: int) -> pa.Table:
    from datavec_ray.cdc.engine import read_checkpoint_partition
    state = _normalize_state(read_checkpoint_partition(seg_dir, pid))
    t_turn = pa.int64() if turn_idx_bits == 64 else pa.int32()
    return _live_lake_rows(state, t_turn)


def _diff_partition(old_dir: Optional[str], new_dir: str,
                    pid: int) -> pa.Table:
    """Row-level changes new-vs-old for ONE partition (no shuffle:
    partitions align across segments)."""
    from datavec_ray.cdc.engine import read_checkpoint_partition
    old = _normalize_state(
        read_checkpoint_partition(old_dir, pid) if old_dir else None)
    new = _normalize_state(read_checkpoint_partition(new_dir, pid))
    old_k = pa.table({
        "conv_id": old["conv_id"], "turn_idx": old["turn_idx"],
        "__old_lsn": old["lsn"], "__old_op": old["op"]})
    j = new.join(old_k, keys=_KEY, join_type="left outer")
    new_del = pc.fill_null(pc.equal(j["op"], "D"), False)
    had_old = pc.is_valid(j["__old_lsn"])
    old_live = pc.and_(had_old,
                       pc.fill_null(pc.not_equal(j["__old_op"], "D"), True))
    changed = pc.or_(pc.invert(had_old),
                     pc.not_equal(j["lsn"], pc.fill_null(j["__old_lsn"], -1)))
    # tombstone that never deleted a live row is not an observable change
    effective = pc.and_(changed, pc.or_(pc.invert(new_del), old_live))
    j = j.filter(pc.fill_null(effective, False))
    is_del = pc.fill_null(pc.equal(j["op"], "D"), False)
    was_live = pc.and_(pc.is_valid(j["__old_lsn"]),
                       pc.fill_null(pc.not_equal(j["__old_op"], "D"), True))
    ctype = pc.if_else(
        is_del, "delete", pc.if_else(was_live, "update", "insert"))
    out = pa.table({
        "conv_id": j["conv_id"], "turn_idx": j["turn_idx"],
        "change_type": ctype,
        "role": j["role"], "text": j["text"], "tool": j["tool"],
        "ts": j["ts"], "lsn": j["lsn"]})
    return out.cast(CHANGE_SCHEMA).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])


def _live_state(t: pa.Table) -> pa.Table:
    return t.filter(pc.fill_null(pc.not_equal(t["op"], "D"), True))


def _retract_rows(t: pa.Table, mask, sign: int) -> pa.Table:
    sel = t.filter(mask)
    return pa.table({
        "conv_id": sel["conv_id"], "turn_idx": sel["turn_idx"],
        "sign": pa.array(np.full(sel.num_rows, sign, np.int8)),
        "role": sel["role"], "text": sel["text"], "tool": sel["tool"],
        "ts": sel["ts"], "lsn": sel["lsn"]}).cast(RETRACT_SCHEMA)


def _diff_partition_retract(old_dir: Optional[str], new_dir: str,
                            pid: int) -> pa.Table:
    """Retract-stream delta new-vs-old for ONE partition: -1 rows carry
    the OLD image of every replaced/deleted live row, +1 rows the NEW
    image of every added/replacing live row. Applying the stream to the
    old live set as a multiset yields exactly the new live set. No
    shuffle — partitions align across segments."""
    from datavec_ray.cdc.engine import read_checkpoint_partition
    old = _live_state(_normalize_state(
        read_checkpoint_partition(old_dir, pid) if old_dir else None))
    new = _live_state(_normalize_state(
        read_checkpoint_partition(new_dir, pid)))
    old_k = pa.table({"conv_id": old["conv_id"],
                      "turn_idx": old["turn_idx"],
                      "__o": old["lsn"]})
    new_k = pa.table({"conv_id": new["conv_id"],
                      "turn_idx": new["turn_idx"],
                      "__n": new["lsn"]})
    # old live rows no longer current (key gone live or lsn moved)
    oj = old.join(new_k, keys=_KEY, join_type="left outer")
    gone = pc.or_(pc.invert(pc.is_valid(oj["__n"])),
                  pc.not_equal(oj["lsn"], pc.fill_null(oj["__n"], -1)))
    # new live rows not current before
    nj = new.join(old_k, keys=_KEY, join_type="left outer")
    fresh = pc.or_(pc.invert(pc.is_valid(nj["__o"])),
                   pc.not_equal(nj["lsn"], pc.fill_null(nj["__o"], -1)))
    out = pa.concat_tables([
        _retract_rows(oj, pc.fill_null(gone, True), -1),
        _retract_rows(nj, pc.fill_null(fresh, True), +1)])
    return out.sort_by([("conv_id", "ascending"),
                        ("turn_idx", "ascending"), ("sign", "ascending")])


class TimeTravel:
    """Bound to one engine/lake; see module docstring."""

    def __init__(self, ckpt_dir: str, manifest, turn_idx_bits: int = 32):
        self.ckpt_dir = ckpt_dir
        self.manifest = manifest
        self.turn_idx_bits = turn_idx_bits

    def versions(self) -> list[dict]:
        """Committed snapshots, oldest first: {name, lsn_hi, keys,
        partitions, available}. A re-used checkpoint name keeps its LAST
        entry; ``available`` is False for segments whose files were
        pruned (the manifest keeps the full history as an audit log)."""
        out: dict[str, dict] = {}
        for e in self.manifest.entries:
            if e.get("type") == "checkpoint":
                out[e["name"]] = {k: e.get(k) for k in
                                  ("name", "lsn_hi", "keys", "partitions")}
        vs = list(out.values())
        for v in vs:
            v["available"] = os.path.isdir(
                os.path.join(self.ckpt_dir, v["name"]))
        return vs

    def resolve_as_of(self, lsn: int) -> Optional[str]:
        """Name of the latest still-available snapshot with watermark
        <= lsn."""
        best = None
        for v in self.versions():
            if v["available"] and (v["lsn_hi"] or 0) <= lsn:
                best = v["name"]
        return best

    def prune_versions(self, keep_last: int) -> list[str]:
        """Retention policy: delete the on-disk files of all but the
        newest ``keep_last`` snapshots (payloads are hardlinks to lake
        inodes, so old segments are cheap — but sidecars and directory
        entries still accumulate at one set per replay). The latest
        segment is never pruned (resume merges from it); the manifest
        history is kept. Returns the pruned names."""
        import shutil
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = [v for v in self.versions() if v["available"]]
        pruned = []
        for v in vs[:-keep_last] if len(vs) > keep_last else []:
            shutil.rmtree(os.path.join(self.ckpt_dir, v["name"]))
            pruned.append(v["name"])
        return pruned

    def read_state_at(self, name: str):
        """The lake AS OF snapshot ``name`` — a streaming Dataset (one
        task per partition)."""
        import ray
        import ray.data as rd
        seg = _segment_dir(self.ckpt_dir, name)
        pids = _partition_ids(seg)
        if not pids:
            from datavec_ray.cdc.binlog import TRANSCRIPT_SCHEMA
            return rd.from_arrow(TRANSCRIPT_SCHEMA.empty_table())
        task = ray.remote(_read_partition_live)
        refs = [task.remote(seg, pid, self.turn_idx_bits) for pid in pids]
        return rd.from_arrow_refs(refs)

    def read_state_as_of(self, lsn: int):
        """The lake as of LSN watermark ``lsn`` (latest snapshot at or
        before it; empty Dataset when none)."""
        import ray.data as rd
        name = self.resolve_as_of(lsn)
        if name is None:
            from datavec_ray.cdc.binlog import TRANSCRIPT_SCHEMA
            return rd.from_arrow(TRANSCRIPT_SCHEMA.empty_table())
        return self.read_state_at(name)

    def _check_same_layout(self, from_name: Optional[str],
                           to_name: str) -> None:
        """Feeds diff partitions POSITIONALLY (pid k vs pid k), which is
        only meaningful while both snapshots share the hash layout. A
        `repartition` boundary between them (or differing recorded
        layouts) makes the positional diff wrong — refuse and point at
        the recompute path."""
        if from_name is None:       # diff-from-empty: layout-independent
            return
        layout = {}
        crossed = False
        seen_from = False
        for e in self.manifest.entries:
            t = e.get("type")
            if t == "checkpoint":
                layout[e["name"]] = e.get("layout")
                if e["name"] == from_name:
                    seen_from, crossed = True, False
                elif e["name"] == to_name and seen_from:
                    break
            elif t == "repartition" and seen_from:
                crossed = True
        lf, lt = layout.get(from_name), layout.get(to_name)
        if crossed or (lf and lt and lf != lt):
            raise ValueError(
                f"snapshots {from_name!r} -> {to_name!r} span a "
                "repartition boundary; positional partition diffs are "
                "undefined across layouts. Rebuild downstream views from "
                "read_state_at(to) instead.")

    def change_feed(self, from_name: Optional[str], to_name: str):
        """Row-level delta between two snapshots as a Dataset of
        (conv_id, turn_idx, change_type, payload..., ts, lsn).
        ``from_name=None`` means "from empty" (everything is an
        insert)."""
        import ray
        import ray.data as rd
        self._check_same_layout(from_name, to_name)
        new_seg = _segment_dir(self.ckpt_dir, to_name)
        old_seg = _segment_dir(self.ckpt_dir, from_name) if from_name \
            else None
        pids = _partition_ids(new_seg)
        if not pids:
            return rd.from_arrow(CHANGE_SCHEMA.empty_table())
        task = ray.remote(_diff_partition)
        refs = [task.remote(old_seg, new_seg, pid) for pid in pids]
        return rd.from_arrow_refs(refs)

    def retract_feed(self, from_name: Optional[str], to_name: str):
        """The delta between two snapshots as a RETRACT stream Dataset
        (RETRACT_SCHEMA): -1 rows carry old images, +1 rows new images;
        an update is a -1/+1 pair. This is the input incremental
        operators (``cdc.aggview.AggView``) consume — applying it to
        the old live set yields the new live set exactly.
        ``from_name=None`` means "from empty"."""
        import ray
        import ray.data as rd
        self._check_same_layout(from_name, to_name)
        new_seg = _segment_dir(self.ckpt_dir, to_name)
        old_seg = _segment_dir(self.ckpt_dir, from_name) if from_name \
            else None
        pids = _partition_ids(new_seg)
        if not pids:
            return rd.from_arrow(RETRACT_SCHEMA.empty_table())
        task = ray.remote(_diff_partition_retract)
        refs = [task.remote(old_seg, new_seg, pid) for pid in pids]
        return rd.from_arrow_refs(refs)
