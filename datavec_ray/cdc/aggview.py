"""Incrementally-maintained grouped aggregates over the CDC lake.

``AggView`` keeps a compact per-group partial state (sign-weighted sums
and counts) for a Reducer-style spec restricted to the INVERTIBLE ops
Sum / Count / Mean — the ones a retraction can undo exactly.

- ``build(live_ds)``   — state from a full snapshot, computed with the
  combiner discipline (per-block Acero partials, ONE partial-row
  shuffle; the raw rows never move).
- ``advance(state, retract_ds)`` — apply a retract stream
  (``TimeTravel.retract_feed``): -1 rows subtract their old image,
  +1 rows add their new image. Work is proportional to the DELTA —
  the lake is never rescanned. Groups whose live row count reaches 0
  disappear from the view, exactly as a recompute would drop them.
- ``finalize(state)``  — the user-facing view table.

Maintaining a materialized aggregate this way is the
streaming-materialized-view convention (retract streams as in
Flink/differential dataflow); the reference has no counterpart — this
is CDC-native functionality the lake's snapshot chain enables.

Non-invertible ops (Min/Max/CountUnique/...) cannot subtract a
retraction; ``RecomputeAggView`` maintains those by recomputing ONLY
the groups named in the retract feed from the new snapshot (broadcast
hash-set filter map-side) and carrying every other view row forward.

State size is one row per group: compact for analytic keys (role,
tool, day buckets). For key spaces rivaling the corpus itself, shard
the state with ``misc._group_partition`` instead of holding one Table —
``advance`` only touches groups named in the delta either way.

Schema-evolution boundary: retract feeds carry the CORE transcript
columns (conv_id, turn_idx, role, text, tool, ts, lsn). A view keyed
on or aggregating an EVOLVED payload column cannot be advanced from
the feed — rebuild it from a snapshot (``build``) after evolution, or
derive the column from core fields map-side (as the windowed-view
test does with ts buckets).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_INVERTIBLE = {"Sum", "Count", "Mean"}


def _key_hashes(tbl: pa.Table, keys: Sequence[str]) -> np.ndarray:
    """Combined uint64 hash of the key columns per row (FNV-style fold
    over per-column hash64; nulls hash to a fixed sentinel). Collisions
    only cost a spurious group recompute — never wrong results."""
    from datavec_ray.reduce import _hash_column
    from datavec_ray.steps.base import combine
    h = None
    for k in keys:
        col = pc.fill_null(_hash_column(combine(tbl[k])),
                           np.uint64(0x9E3779B97F4A7C15))
        hk = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        h = hk if h is None else (h * np.uint64(0x100000001B3)) ^ hk
    return h


class RecomputeAggView:
    """Materialized grouped aggregate for ANY Reducer op (Min / Max /
    CountUnique / variance / UDAFs ...), maintained by AFFECTED-GROUP
    recompute: ``advance`` recomputes only the groups named in the
    retract feed from the new snapshot and carries every other view row
    forward untouched. Non-invertible aggregates cannot subtract a
    retraction, so per-group recompute is the exact-answer floor — the
    shuffle moves only delta rows + affected-group rows (unaffected
    lake rows are dropped map-side by a broadcast hash-set filter; the
    snapshot scan itself remains, which is why the invertible ``AggView``
    is preferred when the ops allow it)."""

    def __init__(self, keys: Sequence[str],
                 specs: Sequence[Sequence[str]],
                 num_partitions: int = 32):
        self.keys = list(keys)
        self.specs = [tuple(s) for s in specs]
        self.num_partitions = num_partitions

    def _reducer(self):
        from datavec_ray.reduce import Reducer
        return Reducer(self.keys, [list(s) for s in self.specs],
                       num_partitions=self.num_partitions)

    def _compute(self, ds) -> pa.Table:
        """The per-key view computation (subclasses override: any
        function of a key group works with the same affected-group
        advance, as long as a group's rows determine its view rows)."""
        from datavec_ray.util import dataset_to_table
        return dataset_to_table(self._reducer().apply_dataset(ds))

    def _sort(self, tbl: pa.Table) -> pa.Table:
        return tbl.sort_by([(k, "ascending") for k in self.keys])

    def build(self, live_ds) -> pa.Table:
        return self._sort(self._compute(live_ds))

    def advance(self, view: pa.Table, retract_ds, live_ds) -> pa.Table:
        """``live_ds`` must be the NEW snapshot (the retract feed's
        ``to`` side, e.g. ``TimeTravel.read_state_at(to_name)``)."""
        import ray
        from datavec_ray.util import dataset_to_table

        keys = list(self.keys)

        def _feed_keys(b: pa.Table) -> pa.Table:
            return pa.table({"__h": pa.array(np.unique(
                _key_hashes(b.combine_chunks(), keys)))})

        touched = dataset_to_table(
            retract_ds.map_batches(_feed_keys, batch_format="pyarrow"))
        if touched.num_rows == 0 or "__h" not in touched.column_names:
            return view                         # empty delta: no-op
        affected = np.unique(touched["__h"].to_numpy(
            zero_copy_only=False).astype(np.uint64))
        if len(affected) == 0:
            return view
        ref = ray.put(affected)          # broadcast once, read per task

        def _only_affected(b: pa.Table) -> pa.Table:
            b = b.combine_chunks()
            aff = ray.get(ref)
            h = _key_hashes(b, keys)
            idx = np.searchsorted(aff, h)
            idx[idx == len(aff)] = 0
            return b.filter(pa.array(aff[idx] == h))

        _only_affected.__name__ = "aggview_affected_filter"
        recomputed = self._compute(
            live_ds.map_batches(_only_affected, batch_format="pyarrow"))
        vh = _key_hashes(view.combine_chunks(), keys)
        idx = np.searchsorted(affected, vh)
        idx[idx == len(affected)] = 0
        keep = view.filter(pa.array(affected[idx] != vh))
        return self._sort(pa.concat_tables(
            [keep, recomputed.cast(keep.schema)]))


class TopNView(RecomputeAggView):
    """Incrementally maintained per-key top-n ROWS view — a
    materialized leaderboard (the n most recent / highest-scoring turns
    per conversation) kept current over the CDC lake. Rides the
    affected-group-recompute machinery: ``advance`` recomputes only the
    keys named in the retract feed and carries every other key's rows
    forward; like all view rows here, a key's leaderboard is a pure
    function of its own live rows, so the splice is exact."""

    def __init__(self, keys: Sequence[str], order_col: str, n: int,
                 descending: bool = True,
                 tiebreak: Sequence[str] = (),
                 num_partitions: int = 32):
        super().__init__(keys, specs=[], num_partitions=num_partitions)
        self.order_col, self.n = order_col, int(n)
        self.descending = descending
        self.tiebreak = list(tiebreak)

    def _compute(self, ds) -> pa.Table:
        from datavec_ray.misc import grouped_topn
        from datavec_ray.util import dataset_to_table
        return dataset_to_table(grouped_topn(
            ds, self.keys, self.order_col, self.n,
            descending=self.descending, tiebreak=self.tiebreak,
            num_partitions=self.num_partitions))

    def _sort(self, tbl: pa.Table) -> pa.Table:
        order = "descending" if self.descending else "ascending"
        return tbl.sort_by(
            [(k, "ascending") for k in self.keys]
            + [(self.order_col, order)]
            + [(c, "ascending") for c in self.tiebreak])


class AggView:
    def __init__(self, keys: Sequence[str],
                 specs: Sequence[Sequence[str]],
                 num_partitions: int = 32):
        self.keys = list(keys)
        self.specs = [tuple(s) for s in specs]
        self.num_partitions = num_partitions
        bad = [op for _, op, _ in self.specs if op not in _INVERTIBLE]
        if bad:
            raise ValueError(
                f"AggView supports invertible ops {sorted(_INVERTIBLE)}; "
                f"got {bad}. Use Reducer over read_state_at for the rest.")
        # value columns needing (sum, valid-count) partials
        self.val_cols = sorted({c for c, op, _ in self.specs
                                if op in ("Sum", "Mean")})

    # -- internal partial layout ---------------------------------------------
    def _partial_names(self):
        names = ["__vn"]
        for c in self.val_cols:
            names += [f"__s_{c}", f"__c_{c}"]
        return names

    def _partial_fn(self, signed: bool):
        keys, vcols = list(self.keys), list(self.val_cols)

        def _partial(batch: pa.Table) -> pa.Table:
            batch = batch.combine_chunks()
            n = len(batch)
            if signed:
                sign = batch["sign"].cast(pa.int64())
            else:
                sign = pa.chunked_array([pa.array(np.ones(n, np.int64))])
            aggs = [("__rw", "sum")]
            batch = batch.append_column(pa.field("__rw", pa.int64()), sign)
            for c in vcols:
                v = batch[c]
                if pa.types.is_timestamp(v.type):
                    v = v.cast(pa.int64())
                elif pa.types.is_integer(v.type):
                    v = v.cast(pa.int64())
                else:
                    v = v.cast(pa.float64())
                sv = pc.multiply_checked(v, sign) if signed else v
                cv = pc.if_else(v.is_valid() if isinstance(v, pa.Array)
                                else v.combine_chunks().is_valid(),
                                sign, pa.scalar(None, pa.int64()))
                batch = batch.append_column(
                    pa.field(f"__sv_{c}", sv.type), sv)
                batch = batch.append_column(
                    pa.field(f"__cv_{c}", pa.int64()), cv)
                aggs += [(f"__sv_{c}", "sum"), (f"__cv_{c}", "sum")]
            g = batch.group_by(keys, use_threads=False).aggregate(aggs)
            cols = {k: g[k] for k in keys}
            cols["__vn"] = pc.fill_null(g["__rw_sum"], 0)
            for c in vcols:
                cols[f"__s_{c}"] = g[f"__sv_{c}_sum"]
                cols[f"__c_{c}"] = pc.fill_null(g[f"__cv_{c}_sum"], 0)
            return pa.table(cols)

        _partial.__name__ = "aggview_partial"
        return _partial

    def _merge_partials(self, partials_ds) -> pa.Table:
        """ONE hash-partition shuffle of partial rows, segmented-sum
        merge per partition, dropped-group filter, collected to a
        compact state Table."""
        from datavec_ray.misc import (_GPART, _group_partition,
                                      _key_run_starts)
        from datavec_ray.steps.base import combine
        from datavec_ray.util import dataset_to_table

        keys, pnames = list(self.keys), self._partial_names()

        def _merge(group: pa.Table) -> pa.Table:
            g = group.drop_columns([_GPART]).sort_by(
                [(k, "ascending") for k in keys])
            if g.num_rows == 0:
                return g
            g = g.combine_chunks()
            starts = np.flatnonzero(_key_run_starts(g, keys))
            take = pa.array(starts, pa.int64())
            cols = {k: combine(g[k]).take(take) for k in keys}
            valid_cnt = {}
            for nm in pnames:
                arr = combine(g[nm])
                vals = pc.fill_null(arr, 0).to_numpy(zero_copy_only=False)
                red = np.add.reduceat(vals, starts)
                if nm.startswith("__c_") or nm == "__vn":
                    valid_cnt[nm] = red
                cols[nm] = pa.array(red).cast(arr.type)
            # a sum over 0 valid values is the monoid zero, but after a
            # retraction it must become NULL-equivalent state: zero it
            # so +x followed by -x leaves no residue (exact for ints;
            # float residue is zeroed with the count)
            for c in self.val_cols:
                cnt = valid_cnt[f"__c_{c}"]
                s = cols[f"__s_{c}"]
                if (cnt == 0).any():
                    cols[f"__s_{c}"] = pc.if_else(
                        pa.array(cnt == 0), pa.scalar(0).cast(s.type), s)
            out = pa.table(cols)
            return out.filter(pa.array(valid_cnt["__vn"] != 0))

        _merge.__name__ = "aggview_merge"
        merged = _group_partition(partials_ds, keys,
                                  self.num_partitions) \
            .groupby(_GPART).map_groups(_merge, batch_format="pyarrow")
        return dataset_to_table(merged)

    # -- public API ------------------------------------------------------------
    def build(self, live_ds) -> pa.Table:
        """Initial state from a snapshot of live rows (e.g.
        ``TimeTravel.read_state_at(name)``)."""
        parts = live_ds.map_batches(self._partial_fn(signed=False),
                                    batch_format="pyarrow")
        return self._merge_partials(parts)

    def advance(self, state: pa.Table, retract_ds) -> pa.Table:
        """Apply a retract stream to the state — delta-sized work."""
        import ray.data as rd
        parts = retract_ds.map_batches(self._partial_fn(signed=True),
                                       batch_format="pyarrow")
        if state.num_rows:
            parts = parts.union(rd.from_arrow(state))
        return self._merge_partials(parts)

    def finalize(self, state: pa.Table) -> pa.Table:
        """Render the user-facing view from the partial state."""
        cols = {k: state[k] for k in self.keys}
        for col, op, out in self.specs:
            if op == "Count":
                cols[out] = state["__vn"]
            elif op == "Sum":
                cols[out] = state[f"__s_{col}"]
            else:  # Mean
                # unchecked cast: an int64 sum of epoch-ms timestamps
                # legitimately exceeds float64's exact-integer range;
                # Mean is a float result, sub-ulp loss is expected
                s = pc.cast(state[f"__s_{col}"], pa.float64(), safe=False)
                c = state[f"__c_{col}"]
                cols[out] = pc.if_else(
                    pc.equal(c, 0), pa.scalar(None, pa.float64()),
                    pc.divide(s, c.cast(pa.float64())))
        return pa.table(cols).sort_by(
            [(k, "ascending") for k in self.keys])


class RenderView(RecomputeAggView):
    """Incrementally maintained SFT RENDER export — the materialized
    "one training text per conversation" table (misc.render_conversations
    format) kept current over the CDC lake: ``advance`` re-renders ONLY
    conversations named in the retract feed and carries every other
    rendered row forward untouched. This closes the loop the north
    star implies: transcript edits flow binlog → lake → re-rendered
    training rows with work proportional to the delta, not the corpus
    (a full re-render of a 100 TB lake per refresh is exactly the job
    this avoids). A conversation's rendered text is a pure function of
    its own live rows, so the affected-group splice is exact."""

    def __init__(self, key: str = "conv_id",
                 order_cols: Sequence[str] = ("turn_idx",),
                 role_col: str = "role", text_col: str = "text",
                 role_sep: str = ": ", turn_sep: str = "\n",
                 num_partitions: int = 32):
        super().__init__([key], specs=[], num_partitions=num_partitions)
        self.order_cols = list(order_cols)
        self.role_col, self.text_col = role_col, text_col
        self.role_sep, self.turn_sep = role_sep, turn_sep

    def _compute(self, ds) -> pa.Table:
        from datavec_ray.misc import render_conversations
        from datavec_ray.util import dataset_to_table

        return dataset_to_table(render_conversations(
            ds, self.keys[0], self.order_cols, self.role_col,
            self.text_col, self.role_sep, self.turn_sep,
            num_partitions=self.num_partitions))
