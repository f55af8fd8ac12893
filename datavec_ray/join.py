"""Equi-join. SURVEY.md §2.12.

Parity target: ``transform/join/Join.java:47-49`` — Inner / LeftOuter /
RightOuter / FullOuter multi-column equi-join; output schema = left
columns + right-minus-key columns; the missing side null-filled with
keys recovered from the present side (``Join.java:181-265``). Spark
executes it as a cogroup shuffle + per-key cartesian emit
(``SparkTransformExecutor.java:332-354``).

Ray-Data-first execution:
- both sides large → ``Dataset.join`` (Ray's hash-partitioned shuffle
  join, the cogroup equivalent), ``num_partitions`` sized to the input;
- small right side (dimension table) → broadcast hash join: the right
  table is ``ray.put`` once and each map task merges per batch — no
  shuffle at all (preferred at 100 TB for dim tables).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import pyarrow as pa

from datavec_ray.registry import register
from datavec_ray.schema import Schema
from datavec_ray.steps.base import WideStep

JOIN_TYPES = {"Inner": "inner", "LeftOuter": "left_outer",
              "RightOuter": "right_outer", "FullOuter": "full_outer"}


def _join_local(left: pa.Table, right: pa.Table, keys: list[str],
                right_keys: list[str], how: str) -> pa.Table:
    how_pa = {"Inner": "inner", "LeftOuter": "left outer",
              "RightOuter": "right outer", "FullOuter": "full outer"}[how]
    if right_keys != keys:
        # rename right keys to the LEFT key names so outer joins emit
        # ONE coalesced key column under the left name — the
        # output_schema contract (left columns + right-minus-key);
        # pyarrow would otherwise keep the right key name for
        # right/full outer rows
        right = right.rename_columns(
            [keys[right_keys.index(n)] if n in right_keys else n
             for n in right.column_names])
    out = left.join(right, keys=keys, join_type=how_pa)
    return out


@register("step")
class JoinStep(WideStep):
    """Join the pipeline's dataset (left) with another dataset (right).

    ``right`` is bound at construction (a pyarrow Table, a ray Dataset, or
    a callable returning either). ``broadcast=True`` uses the broadcast
    hash join (right side must fit in worker memory).
    """

    # below this many right-side rows, a broadcast hash join beats the
    # shuffle join's fixed per-partition cost (measured: Dataset.join has
    # a 2-5 s floor at any size on this Ray version)
    AUTO_BROADCAST_ROWS = 2_000_000

    def __init__(self, right, keys: Sequence[str],
                 right_keys: Optional[Sequence[str]] = None,
                 join_type: str = "Inner",
                 broadcast: Optional[bool] = None,
                 num_partitions: int = 32,
                 strategy: str = "ray",
                 keep_right_keys: bool = False):
        if join_type not in JOIN_TYPES:
            raise ValueError(f"join_type must be one of {sorted(JOIN_TYPES)}")
        if strategy not in ("bucket", "ray"):
            raise ValueError("strategy must be 'bucket' or 'ray'")
        if keep_right_keys:
            # exact ANSI outer-join key semantics: right keys survive
            # as their own columns (left key NULL on right-only rows,
            # right key NULL on left-only rows) — only the bucket path
            # can express this (pyarrow coalesce_keys=False per bucket)
            if strategy != "bucket":
                raise ValueError("keep_right_keys requires strategy='bucket'")
            clash = [rk for lk, rk in zip(keys, right_keys or keys)
                     if rk == lk]
            if clash:
                raise ValueError(
                    f"keep_right_keys needs distinct key names, got {clash} "
                    "on both sides (rename one side first)")
        self.right = right
        self.keys = list(keys)
        self.right_keys = list(right_keys) if right_keys else list(keys)
        self.join_type = join_type
        self.broadcast = broadcast
        self.num_partitions = num_partitions
        self.strategy = strategy
        self.keep_right_keys = keep_right_keys

    # -- helpers -------------------------------------------------------------
    def _resolved_right(self):
        """Resolve the right side exactly once per JoinStep instance.

        A callable right side is invoked once; a Ray Dataset is
        materialized once (spill-safe: blocks pin in the object store)
        so that count / table conversion / join never re-execute it.
        """
        r = getattr(self, "_right_cache", None)
        if r is None:
            r = self.right() if callable(self.right) else self.right
            if not isinstance(r, pa.Table):
                r = r.materialize()
            self._right_cache = r
        return r

    def _right_table(self) -> pa.Table:
        r = self._resolved_right()
        if isinstance(r, pa.Table):
            return r
        from datavec_ray.util import dataset_to_table
        return dataset_to_table(r)  # ray Dataset → Table (small side only)

    def _right_dataset(self):
        import ray.data as rd
        r = self._resolved_right()
        if isinstance(r, pa.Table):
            return rd.from_arrow(r)
        return r

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(*self.keys)
        r = self.right() if callable(self.right) else self.right
        r_schema = Schema(r.schema if isinstance(r, pa.Table)
                          else r.schema().base_schema)
        r_schema.require(*self.right_keys)
        out = schema
        for n in r_schema.names:
            if n in self.right_keys:
                continue
            name = n if not out.has(n) else f"{n}_r"
            out = out.with_column(name, r_schema.type_of(n), r_schema.meta_of(n))
        return out

    # -- execution -----------------------------------------------------------
    def _should_broadcast(self) -> bool:
        if self.broadcast is not None:
            return self.broadcast
        if self.join_type not in ("Inner", "LeftOuter"):
            return False  # right/full outer need the shuffle join
        r = self._resolved_right()
        try:
            n = r.num_rows if isinstance(r, pa.Table) else r.count()
        except Exception:  # noqa: BLE001
            return False
        return n <= self.AUTO_BROADCAST_ROWS

    def apply_dataset(self, ds):
        if self._should_broadcast():
            return self._broadcast_join(ds)
        if self.strategy == "bucket":
            out = self._bucket_shuffle_join(ds)
            if out is not None:
                return out
            if self.keep_right_keys:
                raise ValueError(
                    "keep_right_keys join needs a statically known left "
                    "schema (Dataset.join would coalesce the keys away)")
        right_ds = self._right_dataset()
        # Dataset.join runs a pool of hash-shuffle aggregator actors
        # sized by num_partitions; on a session with fewer CPUs than
        # the configured partition count the pool oversubscribes badly
        # (observed: a 4-CPU test session crawling on a 32-partition
        # join of 2k rows), so cap partitions at the cluster's CPUs
        import ray

        from datavec_ray.config import partitions_override
        nparts = partitions_override(self.num_partitions)
        if nparts == 32:       # library default: size to the session
            cpus = int(ray.cluster_resources().get("CPU", 0)) or 8
            nparts = max(2, min(32, cpus))
        return ds.join(right_ds, join_type=JOIN_TYPES[self.join_type],
                       num_partitions=nparts,
                       on=tuple(self.keys), right_on=tuple(self.right_keys),
                       right_suffix="_r")

    def _bucket_shuffle_join(self, ds):
        """Shuffle equi-join as ONE hash-bucket co-partitioning of the
        tagged (left ∪ right) union + a per-bucket vectorized pyarrow
        join — the same shape as `SemiJoinStep._shuffle_semi` and the
        inequality joins, with pyarrow null-fill/key-recovery
        semantics. Measured comparable to (sf0.1) or slightly slower
        than (sf0.01) `Dataset.join` on this Ray version, so it is the
        NON-default strategy — kept selectable because it shares the
        engine-wide bucket discipline (hot-key salting, per-bucket
        memory bounds via `num_partitions`) and is independent of
        `Dataset.join`'s implementation details. Returns None (→ caller
        falls back to `Dataset.join`) when the left schema is
        unavailable.
        """
        from datavec_ray.ops.bloom import key_hash64

        schema = self._input_arrow_schema(ds)
        if schema is None:
            return None
        keys, right_keys = self.keys, self.right_keys
        from datavec_ray.config import partitions_override
        nb = partitions_override(self.num_partitions)
        how_pa = {"Inner": "inner", "LeftOuter": "left outer",
                  "RightOuter": "right outer",
                  "FullOuter": "full outer"}[self.join_type]
        left_fields = list(schema)
        left_names = [f.name for f in left_fields]
        key_types = {k: schema.field(k).type for k in keys}
        right_ds = self._right_dataset()
        rsch = right_ds.schema().base_schema
        val_renames = {n: (f"{n}_r" if n in left_names else n)
                       for n in rsch.names if n not in right_keys}
        right_val_fields = [pa.field(val_renames[n], rsch.field(n).type)
                            for n in rsch.names if n not in right_keys]
        union_schema = pa.schema(left_fields + right_val_fields
                                 + [pa.field("__side", pa.int8())])

        def _pad(t: pa.Table, side: int) -> pa.Table:
            n = t.num_rows
            cols = {}
            for f in union_schema:
                if f.name == "__side":
                    cols[f.name] = pa.nulls(n, f.type).fill_null(side)
                elif f.name in t.column_names:
                    cols[f.name] = t[f.name].cast(f.type)
                else:
                    cols[f.name] = pa.nulls(n, f.type)
            out = pa.table(cols, schema=union_schema)
            bucket = key_hash64(out, keys) % np.uint64(nb) \
                if n else np.zeros(0, dtype=np.uint64)
            return out.append_column(pa.field("__bucket", pa.int32()),
                                     pa.array(bucket.astype(np.int32)))

        def _tag_left(batch: pa.Table) -> pa.Table:
            return _pad(batch, 0)

        def _tag_right(batch: pa.Table) -> pa.Table:
            # right keys ride under the LEFT key names, cast to the left
            # key types so equal values hash identically on both sides
            b = batch.rename_columns(
                [keys[right_keys.index(n)] if n in right_keys
                 else val_renames[n] for n in batch.column_names])
            for k in keys:
                i = b.schema.get_field_index(k)
                b = b.set_column(i, pa.field(k, key_types[k]),
                                 b[k].cast(key_types[k]))
            return _pad(b, 1)

        rv_names = [f.name for f in right_val_fields]

        keep = self.keep_right_keys
        rks = list(self.right_keys)

        def _bucket_join(group: pa.Table) -> pa.Table:
            side = group["__side"].to_numpy(zero_copy_only=False)
            l = group.filter(pa.array(side == 0)).select(left_names)
            r = group.filter(pa.array(side == 1)).select(keys + rv_names)
            if not keep:
                return l.join(r, keys=keys, join_type=how_pa)
            # ANSI key semantics: keep both sides' keys; the right
            # keys come back suffixed and are renamed to their
            # original right-side names
            out = l.join(r, keys=keys, join_type=how_pa,
                         coalesce_keys=False, right_suffix="__rk")
            ren = {f"{lk}__rk": rk for lk, rk in zip(keys, rks)}
            return out.rename_columns(
                [ren.get(n, n) for n in out.column_names])

        _bucket_join.__name__ = "equi_bucket_join"
        union = ds.map_batches(_tag_left, batch_format="pyarrow").union(
            right_ds.map_batches(_tag_right, batch_format="pyarrow"))
        return union.groupby("__bucket").map_groups(
            _bucket_join, batch_format="pyarrow")

    def _suffixed_right(self, left_names) -> pa.Table:
        """Right table with colliding non-key columns renamed to ``{n}_r``,
        matching output_schema's contract and the shuffle path's
        ``right_suffix='_r'``."""
        right = self._right_table()
        renames = {}
        for n in right.column_names:
            if n not in self.right_keys and n in left_names:
                renames[n] = f"{n}_r"
        if renames:
            right = right.rename_columns(
                [renames.get(n, n) for n in right.column_names])
        return right

    def _broadcast_join(self, ds):
        """ray.put the right table once; pyarrow hash-join per batch in map
        tasks. Only Inner / LeftOuter make sense broadcast-side-right."""
        import ray
        if self.join_type not in ("Inner", "LeftOuter"):
            raise ValueError("broadcast join supports Inner/LeftOuter only")
        left_schema = self._input_arrow_schema(ds)
        if left_schema is None:
            # fully-empty upstream (e.g. every group filtered out): an
            # Inner/LeftOuter join of nothing is nothing — pass through
            return ds
        left_names = [f.name for f in left_schema]
        right_ref = ray.put(self._suffixed_right(left_names))
        keys, right_keys, how = self.keys, self.right_keys, self.join_type

        class _BcastJoin:
            def __init__(self):
                self.right = ray.get(right_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                return _join_local(batch, self.right, keys, right_keys, how)

        # max_restarts=0: the constructor closure carries the broadcast
        # right-side ObjectRef — a restart after that ref is lost would
        # fail anyway (ray#53727); task-level retry resubmits cleanly
        return ds.map_batches(_BcastJoin, batch_format="pyarrow",
                              concurrency=(1, 8), max_restarts=0)

    def apply_local(self, table: pa.Table) -> pa.Table:
        right = self._suffixed_right(table.column_names)
        return _join_local(table, right, self.keys, self.right_keys, self.join_type)

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "JoinStep", "keys": self.keys, "right_keys": self.right_keys,
                "join_type": self.join_type, "broadcast": self.broadcast,
                "num_partitions": self.num_partitions,
                "strategy": self.strategy,
                "keep_right_keys": self.keep_right_keys}


@register("step")
class SemiJoinStep(WideStep):
    """Semi / anti equi-join: keep left rows WITH (semi) or WITHOUT
    (anti) at least one key match on the right — SQL EXISTS /
    NOT EXISTS. Output schema = left columns unchanged (never
    duplicates left rows, regardless of right-side multiplicity).

    The reference has no dedicated semi/anti join (its Join.java offers
    Inner/Left/Right/Full only), but blocklist filtering ("drop every
    document whose id appears in this table") is a core curation step,
    so it is provided as a first-class operator.

    Execution paths:
    - small right side → broadcast: DISTINCT right keys ``ray.put``
      once, one vectorized pyarrow ``left semi``/``left anti`` join per
      batch — no shuffle at all;
    - large right side → ONE hash-bucket co-partitioning shuffle of
      (left rows ∪ per-batch-distinct right keys) + a per-bucket
      pyarrow semi/anti join (right duplicates are combined away
      map-side, so the shuffle moves at most |distinct keys per batch|
      right rows);
    - ``bloom=True`` (shuffle path) additionally builds a Bloom filter
      over the right keys in one aggregate pass and consults it per
      left batch BEFORE the shuffle: semi drops definite non-matches
      early; anti emits definite non-matches directly and shuffles only
      the possible matches. Results stay exact — the filter only
      prunes; survivors are confirmed by the real join.
    """

    AUTO_BROADCAST_ROWS = JoinStep.AUTO_BROADCAST_ROWS

    def __init__(self, right, keys: Sequence[str],
                 right_keys: Optional[Sequence[str]] = None,
                 anti: bool = False, broadcast: Optional[bool] = None,
                 num_buckets: int = 64, bloom: bool = False,
                 bloom_fp: float = 0.01):
        self.right = right
        self.keys = list(keys)
        self.right_keys = list(right_keys) if right_keys else list(keys)
        self.anti = anti
        self.broadcast = broadcast
        self.num_buckets = num_buckets
        self.bloom = bloom
        self.bloom_fp = bloom_fp

    _resolved_right = JoinStep._resolved_right
    _right_table = JoinStep._right_table
    _right_dataset = JoinStep._right_dataset

    def _right_dataset_lazy(self):
        """Right side as a STREAMING Dataset, no materialization — for
        paths that consume it exactly once (shuffle semi without
        bloom). Falls back to any already-cached materialization."""
        import ray.data as rd
        r = getattr(self, "_right_cache", None)
        if r is None:
            r = self.right() if callable(self.right) else self.right
        return rd.from_arrow(r) if isinstance(r, pa.Table) else r

    @property
    def _how_pa(self) -> str:
        return "left anti" if self.anti else "left semi"

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(*self.keys)
        r = self.right() if callable(self.right) else self.right
        r_schema = Schema(r.schema if isinstance(r, pa.Table)
                          else r.schema().base_schema)
        r_schema.require(*self.right_keys)
        return schema  # left columns pass through unchanged

    def _distinct_right_keys(self) -> pa.Table:
        return (self._right_table().select(self.right_keys)
                .group_by(self.right_keys).aggregate([]))

    def _should_broadcast(self) -> bool:
        if self.broadcast is not None:
            return self.broadcast
        r = self._resolved_right()
        try:
            n = r.num_rows if isinstance(r, pa.Table) else r.count()
        except Exception:  # noqa: BLE001
            return False
        return n <= self.AUTO_BROADCAST_ROWS

    def apply_dataset(self, ds):
        import ray
        if self._should_broadcast():
            rk_ref = ray.put(self._distinct_right_keys())
            keys, right_keys, how = self.keys, self.right_keys, self._how_pa

            class _BcastSemi:
                def __init__(self):
                    self.rk = ray.get(rk_ref)
                    self._aligned = False
                    self._left_casts: dict[str, pa.DataType] = {}

                def _align(self, batch: pa.Table) -> None:
                    """Key types may legitimately differ (SQL compares
                    int/float numerically — e.g. a NaN-nullable float64
                    probe against an int64 set). Cast the small right
                    side to the left types when lossless; otherwise
                    cast the left key per batch (int → float64)."""
                    rk = self.rk
                    for lk, rkname in zip(keys, right_keys):
                        lt = batch.schema.field(lk).type
                        i = rk.schema.get_field_index(rkname)
                        rt = rk.schema.field(i).type
                        if lt.equals(rt):
                            continue
                        try:
                            rk = rk.set_column(
                                i, pa.field(rkname, lt),
                                rk[rkname].cast(lt))
                        except (pa.ArrowInvalid,
                                pa.ArrowNotImplementedError):
                            self._left_casts[lk] = rt
                    self.rk = rk
                    self._aligned = True

                def __call__(self, batch: pa.Table) -> pa.Table:
                    if not self._aligned:
                        self._align(batch)
                    for lk, rt in self._left_casts.items():
                        i = batch.schema.get_field_index(lk)
                        batch = batch.set_column(
                            i, pa.field(lk, rt), batch[lk].cast(rt))
                    return batch.join(self.rk, keys=keys,
                                      right_keys=right_keys, join_type=how)

            # max_restarts=0: the closure carries an ObjectRef (the
            # broadcast key set) in the object store — a restart after
            # that ref is lost would fail anyway (ray#53727); let the
            # stage's task-level retry resubmit instead
            return ds.map_batches(_BcastSemi, batch_format="pyarrow",
                                  concurrency=(1, 8), max_restarts=0)
        return self._shuffle_semi(ds)

    def _shuffle_semi(self, ds):
        import ray

        from datavec_ray.ops.bloom import bloom_from_dataset, key_hash64

        keys, right_keys = self.keys, self.right_keys
        anti, nb = self.anti, self.num_buckets
        schema = ds.schema()
        if schema is None:
            return ds
        left_fields = list(schema.base_schema)
        union_schema = pa.schema(left_fields + [pa.field("__side", pa.int8())])

        prefiltered = ds
        passthrough = None
        if self.bloom:
            if self.anti:
                # anti+bloom forks the LEFT side into two consumers
                # (possible-match shuffle + definite-non-match bypass);
                # without pinning, each branch re-executes the whole
                # upstream plan (scan + fingerprint twice — measured on
                # dedup_against). Materialize once: blocks pin in the
                # object store and spill to disk, both branches read refs.
                ds = ds.materialize()
            bf = bloom_from_dataset(self._right_dataset(), right_keys,
                                    fp=self.bloom_fp)
            bf_ref = ray.put(bf)

            class _BloomSplit:
                """Keep rows whose keys the filter admits (possible
                matches); ``want`` selects which half survives."""

                def __init__(self, want_hit: bool):
                    self.want = want_hit
                    self.bf = None

                def __call__(self, batch: pa.Table) -> pa.Table:
                    if self.bf is None:
                        self.bf = ray.get(bf_ref)
                    m = self.bf.contains_table(batch, keys)
                    return batch.filter(pa.array(m if self.want else ~m))

            prefiltered = ds.map_batches(_BloomSplit(True),
                                         batch_format="pyarrow")
            if anti:
                # definite non-matches bypass the shuffle entirely
                passthrough = ds.map_batches(_BloomSplit(False),
                                             batch_format="pyarrow")

        def _tag_left(batch: pa.Table) -> pa.Table:
            cols = {f.name: batch[f.name] for f in left_fields}
            cols["__side"] = pa.nulls(batch.num_rows, pa.int8()).fill_null(0)
            t = pa.table(cols, schema=union_schema)
            bucket = key_hash64(batch, keys) % np.uint64(nb) \
                if batch.num_rows else np.zeros(0, dtype=np.uint64)
            return t.append_column(pa.field("__bucket", pa.int32()),
                                   pa.array(bucket.astype(np.int32)))

        def _tag_right(batch: pa.Table) -> pa.Table:
            # map-side combine: distinct keys per batch, renamed to the
            # left key names, other left columns typed-null-padded
            rk = (batch.select(right_keys).group_by(right_keys)
                  .aggregate([]).rename_columns(keys))
            n = rk.num_rows
            cols = {}
            for f in left_fields:
                cols[f.name] = (rk[f.name].cast(f.type)
                                if f.name in keys else pa.nulls(n, f.type))
            cols["__side"] = pa.nulls(n, pa.int8()).fill_null(1)
            t = pa.table(cols, schema=union_schema)
            bucket = key_hash64(rk, keys) % np.uint64(nb) \
                if n else np.zeros(0, dtype=np.uint64)
            return t.append_column(pa.field("__bucket", pa.int32()),
                                   pa.array(bucket.astype(np.int32)))

        how = self._how_pa
        left_names = [f.name for f in left_fields]

        def _bucket_join(group: pa.Table) -> pa.Table:
            side = group["__side"].to_numpy(zero_copy_only=False)
            l = group.filter(pa.array(side == 0)).select(left_names)
            rk = (group.filter(pa.array(side == 1)).select(keys)
                  .group_by(keys).aggregate([]))
            return l.join(rk, keys=keys, join_type=how)

        _bucket_join.__name__ = "semi_anti_bucket_join"
        # bloom already consumed (and thus cached) the right side once;
        # without bloom the right streams straight into the union
        right_ds = (self._right_dataset() if self.bloom
                    else self._right_dataset_lazy())
        union = prefiltered.map_batches(_tag_left, batch_format="pyarrow") \
            .union(right_ds.map_batches(_tag_right, batch_format="pyarrow"))
        out = union.groupby("__bucket").map_groups(
            _bucket_join, batch_format="pyarrow")
        return out.union(passthrough) if passthrough is not None else out

    def apply_local(self, table: pa.Table) -> pa.Table:
        return table.join(self._distinct_right_keys(), keys=self.keys,
                          right_keys=self.right_keys, join_type=self._how_pa)

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "SemiJoinStep", "keys": self.keys,
                "right_keys": self.right_keys, "anti": self.anti,
                "broadcast": self.broadcast,
                "num_buckets": self.num_buckets, "bloom": self.bloom,
                "bloom_fp": self.bloom_fp}


def semi_join(left, right, keys, right_keys=None, **kw):
    """left rows with at least one right key match (SQL EXISTS)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return SemiJoinStep(right, keys, right_keys=right_keys,
                        anti=False, **kw).apply_dataset(left)


def anti_join(left, right, keys, right_keys=None, **kw):
    """left rows with NO right key match (SQL NOT EXISTS)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return SemiJoinStep(right, keys, right_keys=right_keys,
                        anti=True, **kw).apply_dataset(left)


# ---------------------------------------------------------------------------
# inequality joins: as-of (point-in-time) and banded range join.
# Ray Data has no inequality join, so both are the documented
# composition: tag the two sides, hash-bucket on the key (ONE shuffle
# co-partitioning left+right), merge each bucket with a vectorized
# kernel. `num_buckets` bounds per-task memory: size it so the largest
# bucket (~K/num_buckets keys' rows) fits a worker heap; salt hot keys
# upstream if one key dominates.
# ---------------------------------------------------------------------------

_INT_PD = {pa.int8(): "Int8", pa.int16(): "Int16", pa.int32(): "Int32",
           pa.int64(): "Int64", pa.uint8(): "UInt8", pa.uint16(): "UInt16",
           pa.uint32(): "UInt32", pa.uint64(): "UInt64",
           pa.bool_(): "boolean"}


def _tagged_union(left, right, on, by_list, right_cols, suffix, num_buckets):
    """Tag left (side 0) and right (side 1) into one dataset under a
    unioned schema (missing columns typed-null-padded), with a __bucket
    column hashed from the `by` key — the single shuffle key. Right
    value columns are pre-renamed `{col}{suffix}`; right's `on` rides
    under both `on` (for the merge) and `{on}{suffix}` (for output).
    Returns (union_ds, left_cols, out_rcols, restore) where `restore`
    maps int/bool columns to pandas nullable dtypes (null padding turns
    them float64 in pandas otherwise)."""
    import numpy as np

    def _pa_schema(ds):
        s = ds.schema()
        return s.base_schema if hasattr(s, "base_schema") else s

    lsch, rsch = _pa_schema(left), _pa_schema(right)
    if right_cols is None:
        right_cols = [n for n in rsch.names if n not in by_list and n != on]
    out_rcols = [f"{c}{suffix}" for c in right_cols] + [f"{on}{suffix}"]
    left_cols = list(lsch.names)

    union_fields = ([lsch.field(n) for n in left_cols]
                    + [pa.field(f"{c}{suffix}", rsch.field(c).type)
                       for c in right_cols]
                    + [pa.field(f"{on}{suffix}", rsch.field(on).type),
                       pa.field("__side", pa.int8())])
    union_schema = pa.schema(union_fields)

    def _pad(batch: pa.Table, side: int) -> pa.Table:
        n = batch.num_rows
        cols = {}
        for f in union_schema:
            if f.name == "__side":
                cols[f.name] = pa.nulls(n, f.type).fill_null(side)
            elif f.name in batch.column_names:
                cols[f.name] = batch[f.name]
            else:
                cols[f.name] = pa.nulls(n, f.type)
        t = pa.table(cols, schema=union_schema)
        from datavec_ray.hll import hash64
        from datavec_ray.steps.base import combine
        h = hash64(combine(batch[by_list[0]]))
        for k in by_list[1:]:
            h = h * np.uint64(1000003) + hash64(combine(batch[k]))
        bucket = (h % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column(pa.field("__bucket", pa.int32()),
                               pa.array(bucket))

    def _pad_left(b):
        return _pad(b, 0)

    def _pad_right(b):
        b = b.select(by_list + [on] + list(right_cols))
        for c in list(right_cols):
            b = b.rename_columns(
                [f"{n}{suffix}" if n == c else n for n in b.column_names])
        b = b.append_column(pa.field(f"{on}{suffix}", b[on].type), b[on])
        return _pad(b, 1)

    restore = {f.name: _INT_PD[f.type] for f in union_fields
               if f.type in _INT_PD and f.name != "__side"}
    union = left.map_batches(_pad_left, batch_format="pyarrow").union(
        right.map_batches(_pad_right, batch_format="pyarrow"))
    return union, left_cols, out_rcols, restore


class _AsofMerge:
    """Per-bucket vectorized as-of merge: ONE pandas merge_asof(by=...)
    call handles every key in the bucket (C kernel, no per-key loop)."""

    def __init__(self, on, by, direction, left_cols, right_cols, restore):
        self.on, self.by, self.direction = on, by, direction
        self.left_cols, self.right_cols = left_cols, right_cols
        self.restore = restore
        self.__name__ = "asof_merge"

    def __call__(self, df):
        import pandas as pd
        l = df[df["__side"] == 0][self.left_cols] \
            .sort_values(self.on, kind="mergesort")
        r = df[df["__side"] == 1][self.by + [self.on] + self.right_cols] \
            .sort_values(self.on, kind="mergesort")
        if not len(l):
            out = l.copy()
            for c in self.right_cols:
                out[c] = r[c][:0]
        elif not len(r):
            out = l.copy()
            for c in self.right_cols:
                out[c] = df[c][:0].reindex(out.index)
        else:
            out = pd.merge_asof(l, r, on=self.on, by=self.by,
                                direction=self.direction)
        return out.astype({c: t for c, t in self.restore.items()
                           if c in out.columns})


def asof_join(left, right, on: str, by, right_cols=None,
              direction: str = "backward", suffix: str = "_r",
              num_buckets: int = 64):
    """Left as-of join: for each left row, attach the right row with the
    same `by` key whose `on` value is the closest at-or-before it
    (direction='backward'; 'forward'/'nearest' as in pandas).

    One shuffle (hash-bucket co-partition of both sides on `by`), then
    one vectorized ``pd.merge_asof(by=...)`` per bucket. Right value
    columns are emitted as ``{col}{suffix}`` plus ``{on}{suffix}`` (the
    matched right timestamp). Pandas limitation: nullable float stays
    float64; int/bool columns are restored to pandas nullable ints.
    """
    by_list = [by] if isinstance(by, str) else list(by)
    union, left_cols, out_rcols, restore = _tagged_union(
        left, right, on, by_list, right_cols, suffix, num_buckets)
    return union.groupby("__bucket").map_groups(
        _AsofMerge(on, by_list, direction, left_cols, out_rcols, restore),
        batch_format="pandas")


class _RangeMerge:
    """Per-bucket vectorized banded range join.

    Rows of both sides are lexsorted by (key codes, on); per-left-row
    right match ranges are found with TWO np.searchsorted calls over a
    composite (key, on) int64 ordinate, and pairs are emitted with one
    np.repeat + arange-difference expansion — no per-row loop. If the
    composite would overflow int64 (astronomical key count x on-span),
    falls back to a per-key segment loop (vectorized within key).
    """

    def __init__(self, on, by, lower, upper, left_cols, right_cols, restore):
        self.on, self.by = on, by
        self.lower, self.upper = lower, upper
        self.left_cols, self.right_cols = left_cols, right_cols
        self.restore = restore
        self.__name__ = "range_merge"

    def __call__(self, df):
        import numpy as np
        import pandas as pd

        lmask = df["__side"].to_numpy() == 0
        l = df[lmask]
        r = df[~lmask]
        if not len(l) or not len(r):
            out = l[self.left_cols][:0].copy()
            for c in self.right_cols:
                out[c] = df[c][:0]
            out = out.astype({c: t for c, t in self.restore.items()
                              if c in out.columns})
            return self._typed_empty(out)

        # shared key codes across both sides (vectorized multi-key combine)
        codes = None
        for k in self.by:
            c, u = pd.factorize(df[k], sort=False)
            codes = c.astype(np.int64) if codes is None \
                else codes * len(u) + c
        lc, rc = codes[lmask], codes[~lmask]
        lt = self._ordinal(l[self.on])
        rt = self._ordinal(r[self.on])

        rs = np.lexsort((rt, rc))
        rc_s, rt_s = rc[rs], rt[rs]

        base = int(rt_s.min())
        span = int(rt_s.max()) - base + 2  # queries are clamped into range
        nkeys = int(codes.max()) + 1
        if span > 0 and nkeys < (2**62) // span:    # composite fits int64
            comp_r = rc_s.astype(np.int64) * span + (rt_s - base)
            lo = np.searchsorted(
                comp_r, lc.astype(np.int64) * span
                + np.maximum(lt + self.lower - base, 0), side="left")
            hi = np.searchsorted(
                comp_r, lc.astype(np.int64) * span
                + np.minimum(np.maximum(lt + self.upper - base + 1, 0),
                             span - 1), side="left")
        else:                                        # rare: per-key segments
            ks = np.searchsorted(rc_s, lc, side="left")
            ke = np.searchsorted(rc_s, lc, side="right")
            lo = np.empty(len(lt), dtype=np.int64)
            hi = np.empty(len(lt), dtype=np.int64)
            for i in range(len(lt)):
                seg = rt_s[ks[i]:ke[i]]
                lo[i] = ks[i] + np.searchsorted(seg, lt[i] + self.lower, "left")
                hi[i] = ks[i] + np.searchsorted(seg, lt[i] + self.upper, "right")
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        lidx = np.repeat(np.arange(len(lt)), counts)
        starts = np.zeros(len(lt), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        ridx = lo.repeat(counts) + (np.arange(total) - starts.repeat(counts))

        out = l[self.left_cols].iloc[lidx].reset_index(drop=True)
        rsel = r.iloc[rs[ridx]].reset_index(drop=True)
        for c in self.right_cols:
            out[c] = rsel[c]
        out = out.astype({c: t for c, t in self.restore.items()
                          if c in out.columns})
        if not len(out):        # non-empty sides but zero matches
            return self._typed_empty(out)
        return out

    @staticmethod
    def _typed_empty(out):
        # empty pandas blocks with object columns trip Ray's size
        # estimator (np.vectorize on 0 rows) — emit a TYPED empty
        # Arrow table instead (object columns are strings here: the
        # tagged union only carries key/on/value cols)
        fields = []
        for c in out.columns:
            dt = out[c].dtype
            if dt == object:
                fields.append(pa.field(c, pa.string()))
                continue
            try:
                typ = pa.from_numpy_dtype(dt)
            except TypeError:
                # pandas extension dtype (e.g. nullable Int64 from the
                # restore map) — infer from an empty typed array
                typ = pa.Array.from_pandas(out[c].head(0)).type
            fields.append(pa.field(c, typ))
        return pa.schema(fields).empty_table()

    @staticmethod
    def _ordinal(s):
        import numpy as np
        v = s.to_numpy()
        if v.dtype.kind == "M":
            return v.astype("datetime64[us]").astype(np.int64)
        return v.astype(np.int64)


def range_join(left, right, on: str, by, lower, upper, right_cols=None,
               suffix: str = "_r", num_buckets: int = 64):
    """Banded inner range join: emit (left row, right row) for every
    right row of the same `by` key with ``on`` in
    ``[left.on + lower, left.on + upper]`` (bounds inclusive; for
    timestamps pass `lower`/`upper` as integer microseconds or
    np.timedelta64 converted by the caller).

    Same shuffle discipline as ``asof_join``; the per-bucket kernel is
    two searchsorted passes + one repeat/arange expansion. Output size
    is data-dependent (a band that matches everything is a cross
    product — pick bands that bound fan-out)."""
    by_list = [by] if isinstance(by, str) else list(by)
    lower = int(lower.astype("timedelta64[us]").astype("int64")) \
        if hasattr(lower, "astype") else int(lower)
    upper = int(upper.astype("timedelta64[us]").astype("int64")) \
        if hasattr(upper, "astype") else int(upper)
    union, left_cols, out_rcols, restore = _tagged_union(
        left, right, on, by_list, right_cols, suffix, num_buckets)
    return union.groupby("__bucket").map_groups(
        _RangeMerge(on, by_list, lower, upper, left_cols, out_rcols, restore),
        batch_format="pandas")


def skew_join(ds, right, keys: Sequence[str],
              join_type: str = "Inner",
              hot_share: float = 0.005, top_k: int = 64,
              num_partitions: int = 32):
    """Skew-aware equi-join: the HOTTEST left keys bypass the shuffle.

    A hash-partitioned shuffle join puts every row of a hot key in ONE
    partition — a single Zipf-head key holding 5% of a 100 TB left side
    stalls the whole exchange behind one straggler task. skew_join
    splits by the measured key histogram instead:

    1. the exact heavy-hitter combiner (``ops.analytics.key_skew``)
       finds the top-``top_k`` left keys; those with share ≥
       ``hot_share`` form the hot set (deterministic — exact counts,
       not a sample),
    2. right rows for hot keys (few KEYS by construction, so a bounded
       slice even when the left side is skewed) broadcast once via
       ``ray.put``; hot left rows join map-side — no shuffle, perfectly
       parallel across whatever partitions the hot rows already occupy,
    3. cold rows take the ordinary shuffle join (now free of
       stragglers), and the two streams union.

    Inner and LeftOuter only: a RightOuter/Full unmatched right-hot row
    cannot be detected map-side. The result set is EXACTLY the plain
    join (the split is by key, and both sides split identically), so
    the SQL oracle is the plain JOIN.

    Cost note: vs a plain shuffle join this spends one extra
    column-pruned heavy-hitter pass plus a re-read of each side per
    branch (hot/cold filters) — materialize a computed left side
    upstream if its recompute is expensive; the payoff is an exchange
    with no straggler partition."""
    import pyarrow.compute as pc
    import ray.data as rd

    from datavec_ray.ops.analytics import key_skew

    if join_type not in ("Inner", "LeftOuter"):
        raise ValueError("skew_join supports Inner/LeftOuter "
                         "(outer-right rows cannot resolve map-side)")
    keys = list(keys)
    if len(keys) != 1:
        raise ValueError("skew_join currently takes exactly one key "
                         "column (salt composite keys upstream)")
    key = keys[0]

    hot_tbl = key_skew(ds, key, k=top_k)
    hot_vals = [v for v, s in zip(hot_tbl["value"].to_pylist(),
                                  hot_tbl["share"].to_pylist())
                if s >= hot_share]
    if not hot_vals:
        return JoinStep(right, keys, join_type=join_type,
                        num_partitions=num_partitions).apply_dataset(ds)
    # key_skew renders values as strings for the report; recover the
    # key's native type from the left schema
    ktype = ds.schema().base_schema.field(key).type
    hot_arr = pc.cast(pa.array(hot_vals, pa.string()), ktype)

    right_ds = right if not isinstance(right, pa.Table) \
        else rd.from_arrow(right)

    def _split(hot: bool):
        def f(b: pa.Table) -> pa.Table:
            m = pc.is_in(b[key], value_set=hot_arr)
            return b.filter(m if hot else pc.invert(m))
        f.__name__ = "hot_rows" if hot else "cold_rows"
        return f

    right_hot = right_ds.map_batches(_split(True), batch_format="pyarrow")
    hot_join = JoinStep(right_hot, keys, join_type=join_type,
                        broadcast=True).apply_dataset(
        ds.map_batches(_split(True), batch_format="pyarrow"))
    cold_join = JoinStep(
        right_ds.map_batches(_split(False), batch_format="pyarrow"),
        keys, join_type=join_type,
        num_partitions=num_partitions).apply_dataset(
        ds.map_batches(_split(False), batch_format="pyarrow"))
    return hot_join.union(cold_join)


def cross_join(ds, right, max_right_rows: int = 100_000,
               right_suffix: str = "_r"):
    """Cartesian product — the grid-expansion join (parameter sweeps,
    date scaffolds, small-dimension crosses). The right side is
    broadcast once via ``ray.put`` and each left batch emits
    ``batch × right`` rows map-side — no shuffle; output size is
    ``|left| · |right|``, so the right side is hard-capped at
    ``max_right_rows`` (a Cartesian with a BIG right side is a design
    error at any scale, not a tuning problem). Column collisions on
    the right take ``right_suffix``."""
    import ray

    from datavec_ray.util import dataset_to_table

    r = right if isinstance(right, pa.Table) else dataset_to_table(right)
    if r.num_rows > max_right_rows:
        raise ValueError(
            f"cross_join right side has {r.num_rows} rows "
            f"(max_right_rows={max_right_rows}); a large Cartesian "
            "side should be an equi/range join instead")
    ref = ray.put(r)

    class _Cross:
        def __init__(self):
            self.right = ray.get(ref)
            self.__name__ = "cross_join"

        def __call__(self, batch: pa.Table) -> pa.Table:
            n, m = batch.num_rows, self.right.num_rows
            if n == 0 or m == 0:
                cols = {c: batch[c].slice(0, 0)
                        for c in batch.column_names}
                for c in self.right.column_names:
                    name = c if c not in batch.column_names \
                        else c + right_suffix
                    cols[name] = self.right[c].slice(0, 0)
                return pa.table(cols)
            left_idx = np.repeat(np.arange(n, dtype=np.int64), m)
            right_idx = np.tile(np.arange(m, dtype=np.int64), n)
            out = batch.take(pa.array(left_idx))
            r_taken = self.right.take(pa.array(right_idx))
            for c in self.right.column_names:
                name = c if c not in batch.column_names \
                    else c + right_suffix
                out = out.append_column(
                    pa.field(name, r_taken.schema.field(c).type),
                    r_taken[c])
            return out

    return ds.map_batches(_Cross, batch_format="pyarrow",
                          concurrency=(1, 8), batch_size=8192)
