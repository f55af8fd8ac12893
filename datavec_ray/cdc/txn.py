"""Transactional atomicity for CDC ingest: only COMMITTED
transactions become visible.

A binlog produced by a transactional source groups change events into
transactions (``txn_id``) terminated by a commit marker; a replica
must never expose a transaction's events until its commit record has
arrived (atomic visibility — the standard logical-replication
contract, e.g. MySQL binlog XID events / Postgres logical decoding
commit records; public semantics, no reference counterpart — the
reference has no streaming layer).

``txn_split`` partitions a (possibly tail-truncated) binlog segment
stream into APPLY (events of committed transactions) and PENDING
(events whose commit marker has not arrived yet). Pending events are
carried by the caller into the next poll — composition with
``CdcIngestEngine.replay``/``ingest`` gives transactional exactly-once:
the engine's LSN watermark + idempotent commits dedup any replayed
prefix, and atomicity holds across crash/resume because an
uncommitted transaction is simply re-presented later in full.

Scale shape: commit markers are a tiny fraction of the stream — ONE
column-pruned pass collects the distinct committed txn_ids (per-batch
distinct combiner), which broadcast via ``ray.put`` into a map-side
membership filter; the event stream itself never shuffles. Above
``broadcast_limit`` distinct ids, falls back to the Bloom-prefiltered
hash-partition semi-join (``join.semi_join``) instead of a broadcast.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def committed_txns(ds, txn_col: str = "txn_id",
                   op_col: str = "op", commit_op: str = "C") -> pa.Array:
    """Distinct txn ids that have a commit marker: per-batch prune to
    marker rows + distinct combiner, tiny take_all."""
    def mark(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.equal(batch[op_col], commit_op))
        return pa.table({txn_col: sub[txn_col]}).group_by(
            [txn_col], use_threads=False).aggregate([])

    parts = ds.map_batches(mark, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    if not parts:
        return pa.array([], pa.int64())
    vals = pa.array(sorted({r[txn_col] for r in parts}))
    return vals


class _TxnFilter:
    """Map-side membership split against a broadcast committed-id set."""

    def __init__(self, ids_ref, txn_col: str, keep_committed: bool,
                 drop_markers: bool, op_col: str, commit_op: str):
        self.ids_ref, self.txn_col = ids_ref, txn_col
        self.keep_committed = keep_committed
        self.drop_markers = drop_markers
        self.op_col, self.commit_op = op_col, commit_op
        self._ids = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._ids is None:
            import ray
            self._ids = ray.get(self.ids_ref)  # once per task/actor
        m = pc.is_in(batch[self.txn_col], value_set=self._ids)
        if not self.keep_committed:
            m = pc.invert(m)
        if self.drop_markers:
            # null op != marker (a null never IS the commit marker)
            neq = pc.fill_null(
                pc.not_equal(batch[self.op_col], self.commit_op), True)
            m = pc.and_(m, neq)
        return batch.filter(m)


def txn_split(ds, txn_col: str = "txn_id", op_col: str = "op",
              commit_op: str = "C", broadcast_limit: int = 5_000_000,
              drop_markers: bool = True):
    """(apply, pending, n_committed): events of committed transactions
    vs events still awaiting their commit marker. Commit marker rows
    themselves are dropped from ``apply`` when ``drop_markers`` (they
    carry no payload)."""
    import ray

    ids = committed_txns(ds, txn_col, op_col, commit_op)
    n_committed = len(ids)
    if n_committed > broadcast_limit:
        from datavec_ray.join import anti_join, semi_join
        right = ray.data.from_arrow(pa.table({txn_col: ids}))
        ev = ds.filter(expr=f"{op_col} != '{commit_op}'") \
            if drop_markers else ds
        return (semi_join(ev, right, [txn_col]),
                anti_join(ev, right, [txn_col]), n_committed)
    ref = ray.put(ids)
    apply_ds = ds.map_batches(
        _TxnFilter(ref, txn_col, True, drop_markers, op_col, commit_op),
        batch_format="pyarrow", zero_copy_batch=True)
    pending = ds.map_batches(
        _TxnFilter(ref, txn_col, False, True, op_col, commit_op),
        batch_format="pyarrow", zero_copy_batch=True)
    return apply_ds, pending, n_committed


def synth_txn_binlog(num_events: int, seed: int = 42,
                     txn_size: int = 6,
                     uncommitted_frac: float = 0.1) -> pa.Table:
    """Wrap ``synth_binlog`` into transactions: consecutive LSN runs of
    ``txn_size`` events share a txn_id; each committed txn appends a
    commit-marker row (op='C', null payload) right after its last
    event; a deterministic ``uncommitted_frac`` of txns lack the
    marker. LSNs are re-issued to stay strictly monotone."""
    from datavec_ray.cdc.binlog import BINLOG_SCHEMA, synth_binlog
    from datavec_ray.hll import hash64

    base = synth_binlog(num_events, seed=seed)
    n = base.num_rows
    txn = np.arange(n, dtype=np.int64) // txn_size
    n_txn = int(txn[-1]) + 1 if n else 0
    h = hash64(np.arange(n_txn, dtype=np.uint64) + np.uint64(seed * 1315423911 + 7))
    committed = (h % np.uint64(1000)) >= np.uint64(int(uncommitted_frac * 1000))
    tbl = base.append_column("txn_id", pa.array(txn, pa.int64()))
    # build marker rows for committed txns
    mark_txn = np.flatnonzero(committed)
    markers = pa.table({
        "lsn": pa.array(np.zeros(len(mark_txn), np.int64)),
        "op": pa.array(["C"] * len(mark_txn)),
        "conv_id": pa.array([None] * len(mark_txn), pa.string()),
        "turn_idx": pa.array([None] * len(mark_txn), pa.int32()),
        "role": pa.array([None] * len(mark_txn), pa.string()),
        "text": pa.array([None] * len(mark_txn), pa.string()),
        "tool": pa.array([None] * len(mark_txn), pa.string()),
        "ts": pa.array([None] * len(mark_txn), pa.timestamp("ms")),
        "txn_id": pa.array(mark_txn, pa.int64()),
    })
    both = pa.concat_tables([tbl, markers])
    # order: events by original lsn, each marker right after its txn's
    # last event -> sort by (txn_id, is_marker, lsn), then re-issue lsn
    is_marker = np.concatenate([np.zeros(n, np.int8),
                                np.ones(len(mark_txn), np.int8)])
    both = both.append_column("__m", pa.array(is_marker))
    both = both.sort_by([("txn_id", "ascending"), ("__m", "ascending"),
                         ("lsn", "ascending")])
    both = both.drop_columns(["__m", "lsn"])
    both = both.append_column(
        "lsn", pa.array(np.arange(1, both.num_rows + 1, dtype=np.int64)))
    names = ["lsn", "op"] + [f.name for f in BINLOG_SCHEMA
                             if f.name not in ("lsn", "op")] + ["txn_id"]
    return both.select(names)
