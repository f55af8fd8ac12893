"""Incrementally-maintained materialized JOIN views over CDC snapshots.

``JoinView`` materializes V = L ⋈ R (equi-join on shared key columns)
and maintains it under change by AFFECTED-KEY recompute — the same
discipline as ``cdc.aggview.RecomputeAggView``:

- ``build(left_ds, right_ds)`` — the initial view from two side
  datasets (each typically derived from a ``TimeTravel.read_state_at``
  snapshot by a column-pruned ``map_batches``), joined with the
  engine's distributed ``JoinStep`` (auto-broadcast / shuffle).
- ``advance(view, feeds, left_new_ds, right_new_ds)`` — re-derives
  ONLY the join keys named in either side's delta: the feeds' key
  hashes are collected (delta-sized), broadcast once with ``ray.put``,
  both NEW side snapshots are filtered to affected keys map-side
  (column-pruned scan, delta-proportional rows move), the small
  affected slice is re-joined locally, and every other view row is
  carried forward untouched.

Why recompute instead of the classic ΔV = ΔL⋈R ∪ L⋈ΔR delta-join:
the delta-join needs BOTH full sides as random-access join state
(unbounded driver/actor memory at lake scale), while affected-key
recompute needs only the snapshot scan the lake already provides —
and the rows that cross the wire are bounded by the delta's key
population either way. Correct for inner and all outer joins because
both sides are filtered to the SAME affected-key set, so re-derived
unmatched rows (null-padded outer rows) are recomputed exactly.

Key-hash collisions (FNV fold over per-column hash64) only cost a
spurious recompute of the colliding key — never a wrong result — the
view splice and the snapshot filters use the same hash both times.

The materialized view is held as one Arrow table (sorted by key then
by all remaining columns, so equal states are byte-equal); for views
rivaling the corpus itself, shard it with ``misc._group_partition``
and splice per shard — ``advance`` only touches affected keys either
way.

No reference counterpart (DataVec has no materialized views); this is
the streaming-materialized-view convention (Flink / differential
dataflow retract semantics) applied to the lake's snapshot chain.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from datavec_ray.cdc.aggview import _key_hashes

_HOW = {"inner": "Inner", "left": "LeftOuter",
        "right": "RightOuter", "full": "FullOuter"}
_HOW_PA = {"inner": "inner", "left": "left outer",
           "right": "right outer", "full": "full outer"}


class JoinView:
    def __init__(self, on: Sequence[str], how: str = "inner",
                 num_partitions: int = 32):
        if how not in _HOW:
            raise ValueError(f"how must be one of {sorted(_HOW)}")
        self.on = list(on)
        self.how = how
        self.num_partitions = num_partitions

    # -- helpers ---------------------------------------------------------------
    def _check_sides(self, l_names: Sequence[str],
                     r_names: Sequence[str]) -> None:
        for k in self.on:
            if k not in l_names or k not in r_names:
                raise ValueError(f"join key {k!r} missing from a side "
                                 f"({list(l_names)} / {list(r_names)})")
        clash = (set(l_names) & set(r_names)) - set(self.on)
        if clash:
            raise ValueError(
                f"non-key columns {sorted(clash)} appear on both sides; "
                "rename in the side derivations (the view schema must be "
                "deterministic for the splice)")

    def _canonical(self, view: pa.Table) -> pa.Table:
        order = self.on + [c for c in view.column_names if c not in self.on]
        return view.sort_by([(c, "ascending") for c in order])

    def _join_tables(self, left: pa.Table, right: pa.Table) -> pa.Table:
        return left.join(right, keys=self.on, join_type=_HOW_PA[self.how])

    # -- public API ------------------------------------------------------------
    def build(self, left_ds, right_ds) -> pa.Table:
        """Initial view from two side datasets; ONE distributed join
        (auto-broadcast below ``JoinStep.AUTO_BROADCAST_ROWS``, else
        shuffle), then canonical sort."""
        from datavec_ray.join import JoinStep
        from datavec_ray.util import dataset_to_table

        l_names = [f.name for f in left_ds.schema().base_schema]
        r_names = [f.name for f in right_ds.schema().base_schema]
        self._check_sides(l_names, r_names)
        step = JoinStep(right_ds, keys=self.on, join_type=_HOW[self.how],
                        num_partitions=self.num_partitions)
        return self._canonical(dataset_to_table(step.apply_dataset(left_ds)))

    def affected_keys(self, feeds: Sequence) -> Optional[np.ndarray]:
        """Sorted unique uint64 key hashes named by the delta datasets.
        Each feed must carry the view's key columns (map the engine's
        ``retract_feed`` through the same key derivation as the sides).
        Returns None for an all-empty delta."""
        from datavec_ray.util import dataset_to_table

        keys = list(self.on)

        def _feed_keys(b: pa.Table) -> pa.Table:
            return pa.table({"__h": pa.array(np.unique(
                _key_hashes(b.combine_chunks(), keys)))})

        _feed_keys.__name__ = "joinview_feed_keys"
        hs: list[np.ndarray] = []
        for f in feeds:
            t = dataset_to_table(
                f.map_batches(_feed_keys, batch_format="pyarrow"))
            if t.num_rows and "__h" in t.column_names:
                hs.append(t["__h"].to_numpy(
                    zero_copy_only=False).astype(np.uint64))
        if not hs:
            return None
        out = np.unique(np.concatenate(hs))
        return out if len(out) else None

    def advance(self, view: pa.Table, feeds: Sequence,
                left_new_ds, right_new_ds) -> pa.Table:
        """Splice the view forward: recompute affected keys from the NEW
        snapshots, carry everything else. ``feeds`` is one or more delta
        datasets carrying the key columns (one shared retract feed is
        fine when both sides derive from the same lake)."""
        import ray
        from datavec_ray.util import dataset_to_table

        affected = self.affected_keys(feeds)
        if affected is None:
            return view                              # empty delta: no-op
        keys = list(self.on)
        ref = ray.put(affected)          # broadcast once, read per task

        def _only_affected(b: pa.Table) -> pa.Table:
            b = b.combine_chunks()
            aff = ray.get(ref)
            h = _key_hashes(b, keys)
            idx = np.searchsorted(aff, h)
            idx[idx == len(aff)] = 0
            return b.filter(pa.array(aff[idx] == h))

        _only_affected.__name__ = "joinview_affected_filter"
        lt = dataset_to_table(left_new_ds.map_batches(
            _only_affected, batch_format="pyarrow"))
        rt = dataset_to_table(right_new_ds.map_batches(
            _only_affected, batch_format="pyarrow"))
        self._check_sides(lt.column_names, rt.column_names)
        recomputed = self._join_tables(lt.combine_chunks(),
                                       rt.combine_chunks())
        vh = _key_hashes(view.combine_chunks(), keys)
        idx = np.searchsorted(affected, vh)
        idx[idx == len(affected)] = 0
        keep = view.filter(pa.array(affected[idx] != vh))
        out = pa.concat_tables([keep, recomputed.cast(keep.schema)])
        return self._canonical(out)
