"""Grouped reduce — the Reducer / ReduceOp monoid set. SURVEY.md §2.11.

Parity targets:
- ``transform/ReduceOp.java:42-51`` — Prod, Min, Max, Range, Append,
  Prepend, Sum, Mean, Stdev (Bessel-corrected), UncorrectedStdDev,
  Variance, PopulationVariance, Count, CountUnique, TakeFirst, TakeLast.
- ``transform/reduce/Reducer.java:54-274`` — key columns kept, per-column
  op map, conditional reductions (rows failing a Condition are excluded
  from that column's accumulator), custom reductions.
- ``transform/ops/AggregatorImpls.java:15-516`` — the accumulator
  implementations, incl. HyperLogLogPlus CountUnique (:472-516).
- Spark execution: ``mapToPair → aggregateByKey(seqOp, combOp)``
  (``SparkTransformExecutor.java:252-290``) — partial (map-side) +
  final aggregation.

Ray-Data-first execution: every op is a commutative-monoid
``AggregateFn`` (init / accumulate_block / merge / finalize) so Ray Data
performs the same partial+final aggregation with vectorized
pyarrow.compute kernels per block — one all-to-all of SMALL partial
states, never of raw rows. Variance merges use the numerically-stable
pairwise (Chan et al.) formula; CountUnique ships mergeable HLL
registers (datavec_ray.hll).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.conditions import Condition, condition_from_dict
from datavec_ray.hll import HyperLogLog, hash64
from datavec_ray.registry import register
from datavec_ray.schema import ColumnMeta, Schema
from datavec_ray.steps.base import WideStep

REDUCE_OPS = ("Sum", "Mean", "Min", "Max", "Range", "Prod", "Count",
              "CountUnique", "CountUniqueExact", "Stdev", "UncorrectedStdDev",
              "Variance", "PopulationVariance", "TakeFirst", "TakeLast",
              "Append", "Prepend")

# user-defined reductions (parity: AggregableColumnReduction /
# ColumnReduction, reduce/AggregableColumnReduction.java:33 — the UDAF
# plugin surface). Each entry: dict(zero=fn(), accumulate=fn(state, pa
# column)->state, merge=fn(a,b)->state, finalize=fn(state)->value,
# out_type=pa.DataType).
_CUSTOM_OPS: dict[str, dict] = {}


def register_reduce_op(name: str, *, zero, accumulate, merge, finalize,
                       out_type) -> None:
    if name in REDUCE_OPS:
        raise ValueError(f"{name!r} is a builtin ReduceOp")
    _CUSTOM_OPS[name] = {"zero": zero, "accumulate": accumulate,
                         "merge": merge, "finalize": finalize,
                         "out_type": out_type}

_NUMERIC_OUT = {"Sum", "Mean", "Min", "Max", "Range", "Prod", "Stdev",
                "UncorrectedStdDev", "Variance", "PopulationVariance"}


# ---------------------------------------------------------------------------
# Accumulator states (monoid contract: zero / accumulate(block) / merge)
# ---------------------------------------------------------------------------

class _Acc:
    """One column-op accumulator. State must be picklable and small."""

    op: str

    def __init__(self, op: str):
        self.op = op
        # capture the custom-op spec NOW: the registry lives in the driver
        # process; the spec must ship inside this (cloudpickled) instance
        self._custom = _CUSTOM_OPS.get(op)

    def zero(self) -> Any:
        o = self.op
        if self._custom is not None:
            return self._custom["zero"]()
        if o in ("Sum", "Count"):
            return 0
        if o == "CountUniqueExact":
            return b""  # sorted unique uint64 hashes, little-endian
        if o == "Prod":
            return 1.0
        if o == "Min":
            return None
        if o == "Max":
            return None
        if o == "Range":
            return (None, None)
        if o == "Mean":
            return (0.0, 0)          # (sum, n)
        if o in ("Stdev", "UncorrectedStdDev", "Variance", "PopulationVariance"):
            return (0, 0.0, 0.0)     # (n, mean, M2)
        if o == "CountUnique":
            return HyperLogLog().to_bytes()
        if o in ("TakeFirst", "TakeLast"):
            import pickle
            return pickle.dumps((False, None))  # bytes: Arrow-safe shuffle state
        if o in ("Append", "Prepend"):
            return []
        raise ValueError(o)

    def accumulate(self, state: Any, col: pa.ChunkedArray | pa.Array) -> Any:
        o = self.op
        if self._custom is not None:
            return self._custom["accumulate"](state, col)
        if o == "Count":
            return state + len(col)
        if o == "Sum":
            s = pc.sum(col)
            return state + (s.as_py() or 0)
        if o == "Prod":
            # accumulate in float64: np.prod on an int array wraps mod
            # 2^64 before the float conversion (Prod's declared output
            # is Double)
            arr = _valid_numpy(col)
            return (state * float(np.prod(arr, dtype=np.float64))
                    if len(arr) else state)
        if o == "Min":
            v = pc.min(col).as_py()
            if v is None:
                return state
            return v if state is None else min(state, v)
        if o == "Max":
            v = pc.max(col).as_py()
            if v is None:
                return state
            return v if state is None else max(state, v)
        if o == "Range":
            mn, mx = state
            bmn, bmx = pc.min(col).as_py(), pc.max(col).as_py()
            if bmn is not None:
                mn = bmn if mn is None else min(mn, bmn)
            if bmx is not None:
                mx = bmx if mx is None else max(mx, bmx)
            return (mn, mx)
        if o == "Mean":
            s, n = state
            bs = pc.sum(col).as_py() or 0
            bn = len(col) - pc.count(col, mode="only_null").as_py()
            return (s + bs, n + bn)
        if o in ("Stdev", "UncorrectedStdDev", "Variance", "PopulationVariance"):
            arr = _valid_numpy(col)
            if len(arr) == 0:
                return state
            bn = len(arr)
            bmean = float(arr.mean())
            bM2 = float(((arr - bmean) ** 2).sum())
            return _merge_var(state, (bn, bmean, bM2))
        if o == "CountUnique":
            hll = HyperLogLog.from_bytes(state)
            hll.add_hashes(_hashes_of_valid(col))
            return hll.to_bytes()
        if o == "CountUniqueExact":
            # exact distinct via mergeable sorted-hash-set bytes (Arrow-safe
            # state for shipping between partial and final aggregation)
            prev = np.frombuffer(state, dtype=np.uint64)
            return np.union1d(prev, _hashes_of_valid(col)).tobytes()
        if o == "TakeFirst":
            import pickle
            seen, v = pickle.loads(state)
            if seen or len(col) == 0:
                return state
            return pickle.dumps((True, col[0].as_py()))
        if o == "TakeLast":
            import pickle
            if len(col) == 0:
                return state
            return pickle.dumps((True, col[len(col) - 1].as_py()))
        if o in ("Append", "Prepend"):
            vals = [v for v in col.to_pylist() if v is not None]
            return state + vals
        raise ValueError(o)

    def merge(self, a: Any, b: Any) -> Any:
        o = self.op
        if self._custom is not None:
            return self._custom["merge"](a, b)
        if o in ("Sum", "Count"):
            return a + b
        if o == "Prod":
            return a * b
        if o == "Min":
            return b if a is None else (a if b is None else min(a, b))
        if o == "Max":
            return b if a is None else (a if b is None else max(a, b))
        if o == "Range":
            mn = self._m(min, a[0], b[0])
            mx = self._m(max, a[1], b[1])
            return (mn, mx)
        if o == "Mean":
            return (a[0] + b[0], a[1] + b[1])
        if o in ("Stdev", "UncorrectedStdDev", "Variance", "PopulationVariance"):
            return _merge_var(a, b)
        if o == "CountUnique":
            return HyperLogLog.from_bytes(a).merge(HyperLogLog.from_bytes(b)).to_bytes()
        if o == "CountUniqueExact":
            return np.union1d(np.frombuffer(a, dtype=np.uint64),
                              np.frombuffer(b, dtype=np.uint64)).tobytes()
        if o == "TakeFirst":
            import pickle
            return a if pickle.loads(a)[0] else b
        if o == "TakeLast":
            import pickle
            return b if pickle.loads(b)[0] else a
        if o == "Append":
            return a + b
        if o == "Prepend":
            return a + b  # ordering finalized below
        raise ValueError(o)

    @staticmethod
    def _m(fn, x, y):
        if x is None:
            return y
        if y is None:
            return x
        return fn(x, y)

    def finalize(self, state: Any, delimiter: str = ",") -> Any:
        o = self.op
        if self._custom is not None:
            return self._custom["finalize"](state)
        if o in ("Sum", "Count", "Prod", "Min", "Max"):
            return state
        if o == "Range":
            mn, mx = state
            return None if mn is None else mx - mn
        if o == "Mean":
            s, n = state
            return s / n if n else None
        if o in ("Stdev", "Variance", "UncorrectedStdDev", "PopulationVariance"):
            n, mean, M2 = state
            if n == 0:
                return None
            if o == "Stdev":
                return float(np.sqrt(M2 / (n - 1))) if n > 1 else 0.0
            if o == "Variance":
                return M2 / (n - 1) if n > 1 else 0.0
            if o == "UncorrectedStdDev":
                return float(np.sqrt(M2 / n))
            return M2 / n
        if o == "CountUnique":
            return float(HyperLogLog.from_bytes(state).cardinality())
        if o == "CountUniqueExact":
            return len(state) // 8
        if o in ("TakeFirst", "TakeLast"):
            import pickle
            return pickle.loads(state)[1]
        if o == "Append":
            return delimiter.join(str(v) for v in state)
        if o == "Prepend":
            return delimiter.join(str(v) for v in reversed(state))
        raise ValueError(o)


def _valid_numpy(col, allow_object: bool = False) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.drop_null()
    return col.to_numpy(zero_copy_only=False)


def _merge_var(a, b):
    """Chan et al. parallel variance merge of (n, mean, M2) states."""
    na, ma, M2a = a
    nb, mb, M2b = b
    if na == 0:
        return b
    if nb == 0:
        return a
    n = na + nb
    delta = mb - ma
    mean = ma + delta * nb / n
    M2 = M2a + M2b + delta * delta * na * nb / n
    return (n, mean, M2)


def _hash_column(arr: pa.Array) -> pa.Array:
    """uint64 hash64 of a column, nulls preserved as nulls. The ONE
    value→hash mapping per dtype family shared by _Acc's CountUnique /
    CountUniqueExact and the combiner's hash shadows, so distinct-hash
    sets (and therefore HLL register states) are identical between the
    combiner and AggregateFn paths."""
    t = arr.type
    if (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t)):
        h = hash64(arr)
    elif (pa.types.is_integer(t) or pa.types.is_temporal(t)
            or pa.types.is_boolean(t)):
        base = pc.fill_null(arr, 0)
        if pa.types.is_temporal(t):
            base = base.cast(pa.int64() if t.bit_width == 64 else pa.int32())
        h = hash64(base.cast(pa.int64()).to_numpy(zero_copy_only=False))
    elif pa.types.is_floating(t):
        # +0.0 canonicalizes -0.0 (they compare equal, so they must
        # hash equal for distinct counts to match SQL semantics)
        h = hash64(pc.fill_null(arr, 0.0)
                   .to_numpy(zero_copy_only=False) + 0.0)
    else:  # decimals, dictionaries, ... — per-value blake2b slow path
        h = hash64(arr.to_numpy(zero_copy_only=False))
    out = pa.array(h, pa.uint64())
    return pc.if_else(arr.is_valid(), out, pa.nulls(len(arr), pa.uint64()))


def _hashes_of_valid(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """uint64 hashes of the non-null values of a column (via
    _hash_column — the shared mapping)."""
    c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    c = c.drop_null()
    if len(c) == 0:
        return np.empty(0, np.uint64)
    return _hash_column(c).to_numpy(zero_copy_only=False).astype(np.uint64)


def _hll_fold(gid: np.ndarray, h: np.ndarray, n_groups: int,
              p: int = 9) -> np.ndarray:
    """Scatter-max a batch of hashes into per-group HLL registers —
    (n_groups, 2^p) uint8, the grouped form of HyperLogLog.add_hashes."""
    from datavec_ray.hll import register_updates
    m = 1 << p
    regs = np.zeros((n_groups, m), np.uint8)
    if len(h):
        idx, rank = register_updates(h, p)
        np.maximum.at(regs, (gid, idx), rank)
    return regs


def _hll_cardinality(regs: np.ndarray) -> np.ndarray:
    """Row-wise HyperLogLog.cardinality (same estimator + linear-counting
    small-range correction) over an (n_groups, m) register matrix."""
    from datavec_ray.hll import _alpha
    m = regs.shape[1]
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)),
                                     axis=1)
    zeros = np.count_nonzero(regs == 0, axis=1)
    lc = m * np.log(m / np.maximum(zeros, 1))
    return np.where((est <= 2.5 * m) & (zeros > 0), lc, est)


def _minmax_mergeable(t: pa.DataType) -> bool:
    return (pa.types.is_integer(t) or pa.types.is_floating(t)
            or pa.types.is_boolean(t) or pa.types.is_temporal(t))


def _minmax_reduceat(arr: pa.Array, starts: np.ndarray, fn: str) -> pa.Array:
    """Segmented min/max over a partials column: nulls → sentinel, one
    ``np.minimum/maximum.reduceat``, cast back. Strings/binary use an
    Acero groupby over integer SEGMENT ids (never-null keys, so the
    null-key grouping caveat doesn't apply; Acero min/max skips null
    values). Caller masks all-null groups to NULL via the companion
    count column."""
    orig = arr.type
    if (pa.types.is_string(orig) or pa.types.is_large_string(orig)
            or pa.types.is_binary(orig)):
        seg_len = np.diff(np.append(starts, len(arr)))
        gid = np.repeat(np.arange(len(starts)), seg_len)
        gt = pa.table({"s": pa.array(gid), "v": arr}) \
            .group_by(["s"], use_threads=False).aggregate([("v", fn)]) \
            .sort_by([("s", "ascending")])   # one group per segment
        return gt[f"v_{fn}"].combine_chunks().cast(orig)
    if pa.types.is_boolean(orig):
        arr = arr.cast(pa.int8())
    elif pa.types.is_temporal(orig):
        arr = arr.cast(pa.int64() if orig.bit_width == 64 else pa.int32())
    np_dtype = np.dtype(arr.type.to_pandas_dtype())
    if np.issubdtype(np_dtype, np.integer):
        info = np.iinfo(np_dtype)
        sent = info.max if fn == "min" else info.min
    else:
        sent = np.inf if fn == "min" else -np.inf
    vals = pc.fill_null(arr, sent).to_numpy(zero_copy_only=False)
    red = np.minimum if fn == "min" else np.maximum
    out = pa.array(red.reduceat(vals, starts)).cast(arr.type)
    return out if out.type == orig else out.cast(orig)


def _out_type(op: str, in_type: pa.DataType) -> pa.DataType:
    if op in _CUSTOM_OPS:
        return _CUSTOM_OPS[op]["out_type"]
    if op in ("Count", "CountUniqueExact"):
        return pa.int64()
    if op == "CountUnique":
        return pa.float64()
    if op in ("Mean", "Stdev", "UncorrectedStdDev", "Variance",
              "PopulationVariance", "Prod"):
        return pa.float64()
    if op in ("Append", "Prepend"):
        return pa.string()
    if op == "Sum":
        if pa.types.is_integer(in_type):
            return pa.int64()
        return pa.float64()
    if op == "Range":
        if pa.types.is_timestamp(in_type):
            return pa.int64()
        return in_type
    return in_type  # Min/Max/TakeFirst/TakeLast keep type


# ---------------------------------------------------------------------------
# Reducer (wide step)
# ---------------------------------------------------------------------------

@register("step")
class Reducer(WideStep):
    """groupby(keys) + per-column reductions.

    ``specs``: list of [column, op, output_name] (output_name optional →
    defaults to ``op.lower()(column)`` like the reference's naming).
    ``condition``: optional Condition — rows failing it are excluded from
    ALL value accumulators (the reference's conditional reduction,
    ``Reducer.java:54-274``); key rows always count toward grouping.
    """

    def __init__(self, keys: Sequence[str], specs: Sequence[Sequence[Any]],
                 condition: Optional[Condition | dict] = None,
                 append_delimiter: str = ",", num_partitions: Optional[int] = None):
        self.keys = list(keys)
        self.specs = []
        for s in specs:
            col, op = s[0], s[1]
            if op not in REDUCE_OPS and op not in _CUSTOM_OPS:
                raise ValueError(f"unknown ReduceOp {op!r}")
            out = s[2] if len(s) > 2 and s[2] else f"{op.lower()}({col})"
            self.specs.append([col, op, out])
        self.condition = condition_from_dict(condition) if isinstance(condition, dict) \
            else condition
        self.append_delimiter = append_delimiter
        self.num_partitions = num_partitions

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(*self.keys)
        fields = [(k, schema.type_of(k)) for k in self.keys]
        meta = {k: schema.meta_of(k) for k in self.keys}
        for col, op, out in self.specs:
            if op != "Count" or col:
                schema.require(col)
            t = _out_type(op, schema.type_of(col))
            fields.append((out, t))
        if self.condition is not None:
            self.condition.validate(schema)
        return Schema(fields, meta)

    # -- distributed ---------------------------------------------------------
    _BUILTIN = {"Sum", "Mean", "Min", "Max", "Count"}
    # ops whose per-key state is a fixed-size numeric partial an Acero
    # per-block group_by can produce and numpy can segment-merge
    _COMBINABLE = _BUILTIN | {"Range", "Prod", "Stdev", "UncorrectedStdDev",
                              "Variance", "PopulationVariance",
                              "CountUniqueExact", "CountUnique",
                              "TakeFirst", "TakeLast", "Append", "Prepend"}

    def apply_dataset(self, ds):
        from ray.data.aggregate import AggregateFn

        # fast path: map-side combiner + ONE hash-partition shuffle of
        # PARTIAL rows when every op is a mergeable monoid (conditional
        # gates are handled by null-masking gated-out values per block);
        # falls back to Ray's builtin aggregations (or the general
        # AggregateFn path) for unsupported input types
        if all(op in self._COMBINABLE for _, op, _ in self.specs):
            out = self._combiner_groupby(ds)
            if out is not None:
                return out
        if (self.condition is None
                and all(op in self._BUILTIN for _, op, _ in self.specs)):
            from ray.data.aggregate import Count, Max, Mean, Min, Sum
            mk = {"Sum": Sum, "Mean": Mean, "Min": Min, "Max": Max}
            aggs = []
            for col, op, out in self.specs:
                if op == "Count":
                    aggs.append(Count(alias_name=out))
                else:
                    aggs.append(mk[op](col, alias_name=out))
            # builtin output types match the declared _out_type mapping
            # (Sum int->int64, Sum float->float64, Mean->float64,
            # Min/Max->input, Count->int64)
            return ds.groupby(self.keys).aggregate(*aggs)

        import os
        if os.environ.get("DATAVEC_REDUCE_GENERAL", "partition") == "aggfn":
            # legacy general path: Ray AggregateFn over a sort-based
            # groupby. Kept selectable for cross-path parity testing;
            # raises on NULL keys (Ray's sort can't order them).
            cond = self.condition
            delim = self.append_delimiter
            aggs = []
            for col, op, out in self.specs:
                acc = _Acc(op)

                def make(acc=acc, col=col):
                    def accumulate_block(state, block: pa.Table):
                        c = block[col]
                        if cond is not None:
                            c = c.filter(cond.mask(block))
                        return acc.accumulate(state, c)
                    return accumulate_block

                aggs.append(AggregateFn(
                    init=lambda k, acc=acc: acc.zero(),
                    merge=lambda a, b, acc=acc: acc.merge(a, b),
                    accumulate_block=make(),
                    finalize=lambda s, acc=acc: acc.finalize(s, delim),
                    name=out,
                ))
            return ds.groupby(self.keys).aggregate(*aggs)
        return self._acc_groupby(ds)

    def _acc_groupby(self, ds):
        """General fallback (UDAFs, gated TakeFirst/TakeLast): ONE hash
        partition on the keys, then per-partition _Acc accumulation over
        key runs (sort + run detection, the combiner's merge idiom).
        Unlike Ray's sort-based ``groupby().aggregate()`` this tolerates
        NULL keys and moves each row through exactly one exchange with
        no global sort. Per-group work is a Python _Acc call — the same
        cost profile as the AggregateFn path it replaces."""
        from datavec_ray.misc import (_GPART, _group_partition,
                                      _key_run_starts)
        from datavec_ray.steps.base import combine

        cond = self.condition
        delim = self.append_delimiter
        keys = list(self.keys)
        specs = [tuple(s) for s in self.specs]
        accs = [_Acc(op) for _, op, _ in specs]   # captures UDAF registry
        schema = self._input_arrow_schema(ds)
        out_types = {out: _out_type(op, schema.field(col).type)
                     for col, op, out in specs}
        key_types = {k: schema.field(k).type for k in keys}
        from datavec_ray.config import partitions_default
        P = self.num_partitions or partitions_default()

        def _grp(group: pa.Table) -> pa.Table:
            g = group.drop_columns([_GPART]).sort_by(
                [(k, "ascending") for k in keys])
            if g.num_rows == 0:
                return pa.table(
                    {**{k: pa.array([], key_types[k]) for k in keys},
                     **{out: pa.array([], out_types[out])
                        for _, _, out in specs}})
            g = g.combine_chunks()
            starts = np.flatnonzero(_key_run_starts(g, keys))
            seg_len = np.diff(np.append(starts, g.num_rows))
            take = pa.array(starts, pa.int64())
            cols = {k: combine(g[k]).take(take) for k in keys}
            mask = cond.mask(g) if cond is not None else None
            if isinstance(mask, pa.ChunkedArray):
                mask = mask.combine_chunks()
            for (col, op, out), acc in zip(specs, accs):
                full = combine(g[col])
                vals = []
                for s, ln in zip(starts, seg_len):
                    c = full.slice(s, ln)
                    if mask is not None:
                        c = c.filter(mask.slice(s, ln))
                    vals.append(acc.finalize(
                        acc.accumulate(acc.zero(), c), delim))
                cols[out] = pa.array(vals, out_types[out])
            return pa.table(cols)

        _grp.__name__ = "reduce_general"
        return _group_partition(ds, keys, P) \
            .groupby(_GPART).map_groups(_grp, batch_format="pyarrow")

    def _combiner_groupby(self, ds):
        """Map-side pre-aggregation (combiner) + ONE hash-partition
        shuffle of partial rows — the reference's ``aggregateByKey(seqOp,
        combOp)`` discipline (AnalyzeSpark/Reducer execution).

        Ray's builtin ``groupby().aggregate()`` is a sort-based shuffle
        that moves EVERY raw row to the reduce side — at 100 TB that is
        the whole corpus through the object store. Here each input block
        is first collapsed to one partial row per (block, key) by a
        vectorized Acero ``group_by`` (sum/count/min/max; Mean travels as
        sum+count), so the shuffle moves at most blocks x per-block-
        distinct-keys rows. Partials are merged per partition with the
        layout-independent sort + key-run-detection idiom (see
        misc.rollup_agg — Acero hash grouping was observed to split
        null-keyed groups on exotic post-shuffle chunk layouts).

        Covered ops: Sum/Mean/Min/Max/Count plus Range (min+max
        partials), Prod (product partials), the variance family
        (count+mean+population-variance partials; merged with the
        cancellation-free form of the Chan et al. update:
        M2 = sum(M2_i) + sum(n_i*(mean_i - mu)^2), every term a
        segmented reduceat — no subtraction of near-equal squares),
        CountUniqueExact (distinct uint64-hash lists) and CountUnique
        (fixed 513-byte HLL register blobs per (block, key) — the
        partial stays 0.5 KB regardless of cardinality).

        A conditional gate (``iff``) is applied map-side by replacing
        gated-out values with NULL in per-column shadows (every partial
        fn skips nulls), so group membership still comes from ALL rows —
        a fully-gated group survives with count 0, matching the
        AggregateFn path.

        Returns None (caller falls back to the Ray builtin path or the
        general AggregateFn path) for non-numeric inputs, or when
        DATAVEC_REDUCE_COMBINER=0. High-cardinality keys degrade
        gracefully: partials approach input rows and the shuffle matches
        the sort-based plan, paying only the per-batch group_by.
        """
        import os
        if os.environ.get("DATAVEC_REDUCE_COMBINER", "1") == "0":
            return None
        from datavec_ray.misc import (_GPART, _group_partition,
                                      _key_run_starts)
        from datavec_ray.steps.base import combine

        schema = self._input_arrow_schema(ds)
        in_types = {c: schema.field(c).type for c in schema.names}
        plan: dict = {}               # (src col, partial fn) -> partial name
        float_shadows: set = set()    # int cols needing a float64 copy
        hash_shadows: set = set()     # cols needing a uint64 hash copy
        need_count_all = False
        cond = self.condition
        delim = self.append_delimiter
        gated = cond is not None
        # with a gate, every reduced column reads through a null-masked
        # shadow __g_{col} (never mutate the original: it may be a key)
        base = {c: (f"__g_{c}" if gated else c) for c, _, _ in self.specs}
        _VAR_OPS = ("Stdev", "UncorrectedStdDev", "Variance",
                    "PopulationVariance")
        _NUM_ONLY = ("Sum", "Mean", "Range", "Prod") + _VAR_OPS
        _STRINGY = (pa.types.is_string, pa.types.is_large_string,
                    pa.types.is_binary)
        for col, op, _ in self.specs:
            if op == "Count":
                need_count_all = True
                continue
            t = in_types[col]
            if op in _NUM_ONLY:
                if not (pa.types.is_integer(t) or pa.types.is_floating(t)):
                    return None
            elif op in ("CountUniqueExact", "CountUnique"):
                if pa.types.is_nested(t):
                    return None
            elif op in ("TakeFirst", "TakeLast"):
                # a gated first/last can't tell "gated out" from a
                # genuine null value in the null-masked shadow
                if gated or pa.types.is_nested(t):
                    return None
            elif op in ("Append", "Prepend"):
                if pa.types.is_nested(t):
                    return None
            elif not (_minmax_mergeable(t) or any(p(t) for p in _STRINGY)):
                return None
            fns = {"Sum": ["sum"], "Mean": ["sum"], "Min": ["min"],
                   "Max": ["max"], "Range": ["min", "max"],
                   "Prod": ["product"],
                   "CountUniqueExact": ["distinct"],
                   "CountUnique": ["hll"],
                   "TakeFirst": ["first"], "TakeLast": ["last"],
                   "Append": ["agglist"], "Prepend": ["agglist"]}.get(
                       op, ["mean", "variance"])
            for fn in ["count"] + fns:
                src = base[col]
                if fn == "product" and pa.types.is_integer(t):
                    # int products wrap mod 2^64 inside Acero; Prod's
                    # declared output is Double — aggregate a float64
                    # shadow column instead
                    src = f"__f_{col}"
                    float_shadows.add(col)
                elif fn in ("distinct", "hll"):
                    # Acero hash_distinct emits corrupt list offsets for
                    # string inputs (observed pyarrow bug); aggregate
                    # distinct over a uint64 hash64 shadow instead —
                    # the same value→hash mapping _Acc counts
                    src = f"__h_{col}"
                    hash_shadows.add(col)
                plan.setdefault((src, fn), f"__pa{len(plan)}")
        gate_cols = sorted({c for c, op, _ in self.specs
                            if op != "Count"}) if gated else []
        keys = list(self.keys)
        plist = list(plan.items())
        specs = [tuple(s) for s in self.specs]
        out_types = {out: _out_type(op, in_types[col] if col else pa.int64())
                     for col, op, out in specs}
        from datavec_ray.config import partitions_default
        P = self.num_partitions or partitions_default()

        def _partial(batch: pa.Table) -> pa.Table:
            batch = batch.combine_chunks()
            if gated:
                msk = cond.mask(batch)
                if isinstance(msk, pa.ChunkedArray):
                    msk = msk.combine_chunks()
                for c in gate_cols:
                    t = batch.schema.field(c).type
                    batch = batch.append_column(
                        pa.field(f"__g_{c}", t),
                        pc.if_else(msk, batch[c], pa.nulls(len(batch), t)))
                if need_count_all:
                    # Count counts gated ROWS (null values included):
                    # count of non-null entries in a mask-shaped shadow
                    batch = batch.append_column(
                        pa.field("__cg", pa.bool_()),
                        pc.if_else(msk, pa.scalar(True),
                                   pa.scalar(None, pa.bool_())))
            for c in float_shadows:
                batch = batch.append_column(
                    pa.field(f"__f_{c}", pa.float64()),
                    batch[base[c]].cast(pa.float64()))
            for c in hash_shadows:
                src = batch[base[c]]
                batch = batch.append_column(
                    pa.field(f"__h_{c}", pa.uint64()),
                    _hash_column(src.combine_chunks()
                                 if isinstance(src, pa.ChunkedArray)
                                 else src))
            aggs, seen = [], set()
            for (c, f), _ in plist:
                fa = {"hll": "distinct", "agglist": "list"}.get(f, f)
                if (c, fa) in seen:
                    continue
                seen.add((c, fa))
                if fa in ("first", "last"):
                    # keep a genuinely-null first/last value (matches
                    # _Acc's TakeFirst/TakeLast arrival semantics)
                    aggs.append((c, fa, pc.ScalarAggregateOptions(
                        skip_nulls=False)))
                else:
                    aggs.append((c, fa))
            if need_count_all:
                aggs.append(("__cg", "count") if gated
                            else ([], "count_all"))
            g = batch.group_by(keys, use_threads=False).aggregate(aggs)
            cols = {k: g[k] for k in keys}
            for (c, f), nm in plist:
                if f == "hll":
                    # fold each group's distinct-hash list into a fixed
                    # 512-byte HLL register blob: the partial stays 0.5 KB
                    # per (block, key) regardless of cardinality
                    lists = g[f"{c}_distinct"]
                    if isinstance(lists, pa.ChunkedArray):
                        lists = lists.combine_chunks()
                    lens = pc.fill_null(pc.list_value_length(lists), 0) \
                        .to_numpy(zero_copy_only=False).astype(np.int64)
                    gid = np.repeat(np.arange(g.num_rows), lens)
                    flat = lists.flatten()
                    ok = flat.is_valid().to_numpy(zero_copy_only=False)
                    h = pc.fill_null(flat, 0) \
                        .to_numpy(zero_copy_only=False).astype(np.uint64)
                    regs = _hll_fold(gid[ok], h[ok], g.num_rows)
                    cols[nm] = pa.Array.from_buffers(
                        pa.binary(regs.shape[1]), g.num_rows,
                        [None, pa.py_buffer(regs.tobytes())])
                elif f == "agglist":
                    cols[nm] = g[f"{c}_list"]
                else:
                    cols[nm] = g[f"{c}_{f}"]
            if need_count_all:
                cols["__pca"] = g["__cg_count" if gated else "count_all"]
            return pa.table(cols)

        def _merge(group: pa.Table) -> pa.Table:
            g = group.drop_columns([_GPART]).sort_by(
                [(k, "ascending") for k in keys])
            if g.num_rows == 0:
                fields = ([(k, g.schema.field(k).type) for k in keys]
                          + [(out, out_types[out]) for _, _, out in specs])
                return pa.table({n: pa.array([], type=t) for n, t in fields})
            starts = np.flatnonzero(_key_run_starts(g, keys))
            take = pa.array(starts, pa.int64())
            cols = {k: combine(g[k]).take(take) for k in keys}
            merged: dict = {}
            raw: dict = {}      # per-partial arrays for mean/variance/product
            for (c, f), nm in plist:
                arr = combine(g[nm])
                if f in ("sum", "count"):
                    vals = pc.fill_null(arr, 0).to_numpy(zero_copy_only=False)
                    merged[(c, f)] = pa.array(
                        np.add.reduceat(vals, starts)).cast(arr.type)
                    if f == "count":
                        raw[(c, f)] = vals
                elif f in ("mean", "variance", "product"):
                    fill = 1 if f == "product" else 0
                    raw[(c, f)] = pc.fill_null(arr, fill) \
                        .to_numpy(zero_copy_only=False).astype(np.float64)
                elif f in ("distinct", "hll", "agglist", "first", "last"):
                    raw[(c, f)] = arr   # merged per-op below
                else:
                    merged[(c, f)] = _minmax_reduceat(arr, starts, f)
            if need_count_all:
                vals = pc.fill_null(combine(g["__pca"]), 0) \
                    .to_numpy(zero_copy_only=False)
                count_all = pa.array(np.add.reduceat(vals, starts),
                                     pa.int64())
            seg_len = np.diff(np.append(starts, g.num_rows))
            for col, op, out in specs:
                if op == "Count":
                    cols[out] = count_all
                    continue
                bc = base[col]
                cnt = merged[(bc, "count")].to_numpy(zero_copy_only=False)
                n = np.maximum(cnt, 1)
                if op == "Mean":
                    s = merged[(bc, "sum")].to_numpy(zero_copy_only=False) \
                        .astype(np.float64)
                    res = pa.array(s / n)
                elif op == "Sum":
                    res = merged[(bc, "sum")]
                elif op in ("Min", "Max"):
                    res = merged[(bc, "min" if op == "Min" else "max")]
                elif op == "Range":
                    lo = merged[(bc, "min")].to_numpy(zero_copy_only=False)
                    hi = merged[(bc, "max")].to_numpy(zero_copy_only=False)
                    # zero out all-null groups (sentinel-filled lo/hi
                    # would overflow the subtraction); masked NULL below
                    lo = np.where(cnt == 0, 0, lo)
                    hi = np.where(cnt == 0, 0, hi)
                    res = pa.array(hi - lo)
                elif op == "Prod":
                    src = f"__f_{col}" if col in float_shadows else bc
                    res = pa.array(np.multiply.reduceat(
                        raw[(src, "product")], starts))
                elif op in ("TakeFirst", "TakeLast"):
                    # every partial row covers >=1 input row, so the
                    # first/last partial IN MERGE ORDER carries the
                    # group's value — same arrival-order-dependent
                    # semantics as _Acc's merge
                    a = raw[(bc, "first" if op == "TakeFirst" else "last")]
                    pos = starts if op == "TakeFirst" \
                        else starts + seg_len - 1
                    res = a.take(pa.array(pos, pa.int64()))
                elif op in ("Append", "Prepend"):
                    lists = raw[(bc, "agglist")]
                    lens = pc.fill_null(pc.list_value_length(lists), 0) \
                        .to_numpy(zero_copy_only=False).astype(np.int64)
                    pyvals = lists.flatten().to_pylist()
                    cum = np.concatenate(([0], np.cumsum(lens)))
                    seg_end = cum[starts + seg_len]
                    seg_beg = cum[starts]
                    strs = []
                    for s, e in zip(seg_beg, seg_end):
                        vs = [str(v) for v in pyvals[s:e] if v is not None]
                        if op == "Prepend":
                            vs.reverse()
                        strs.append(delim.join(vs))
                    res = pa.array(strs, pa.string())
                elif op == "CountUnique":
                    # elementwise-max merge of fixed-size HLL register
                    # blobs, then the row-wise HLL estimator
                    a = raw[(f"__h_{col}", "hll")]
                    m = len(a[0].as_py()) if len(a) else 512
                    buf = a.buffers()[1]
                    regs = np.frombuffer(buf, np.uint8)[
                        a.offset * m:(a.offset + len(a)) * m].reshape(-1, m)
                    res = pa.array(_hll_cardinality(
                        np.maximum.reduceat(regs, starts, axis=0)))
                elif op == "CountUniqueExact":
                    # flatten per-partial distinct-hash lists, tag each
                    # value with its group index, distinct-count per group
                    lists = raw[(f"__h_{col}", "distinct")]
                    gid = np.zeros(g.num_rows, np.int64)
                    gid[starts] = 1
                    gid = np.cumsum(gid) - 1
                    lens = pc.list_value_length(lists) \
                        .to_numpy(zero_copy_only=False)
                    lens = np.nan_to_num(lens.astype(np.float64)) \
                        .astype(np.int64)
                    seg = np.repeat(gid, lens)
                    flat = lists.flatten()
                    dtab = pa.table({"s": pa.array(seg), "v": flat}) \
                        .combine_chunks() \
                        .group_by(["s"], use_threads=False) \
                        .aggregate([("v", "count_distinct")])
                    uniq = np.zeros(len(starts), np.int64)
                    uniq[dtab["s"].to_numpy(zero_copy_only=False)] = \
                        dtab["v_count_distinct"] \
                        .to_numpy(zero_copy_only=False)
                    res = pa.array(uniq)
                else:  # variance family: segmented Chan merge
                    c_i = raw[(bc, "count")].astype(np.float64)
                    m_i = raw[(bc, "mean")]
                    M2_i = raw[(bc, "variance")] * c_i   # population var*n
                    mu = np.add.reduceat(c_i * m_i, starts) / n
                    mu_rep = np.repeat(mu, seg_len)
                    M2 = (np.add.reduceat(M2_i, starts)
                          + np.add.reduceat(c_i * (m_i - mu_rep) ** 2,
                                            starts))
                    if op == "Stdev":
                        v = np.where(cnt > 1, np.sqrt(M2 / np.maximum(
                            cnt - 1, 1)), 0.0)
                    elif op == "Variance":
                        v = np.where(cnt > 1, M2 / np.maximum(cnt - 1, 1),
                                     0.0)
                    elif op == "UncorrectedStdDev":
                        v = np.sqrt(M2 / n)
                    else:  # PopulationVariance
                        v = M2 / n
                    res = pa.array(v)
                res = res.cast(out_types[out])
                # all-null group: NULL for everything except Sum (monoid
                # zero 0), Prod (monoid one 1.0), CountUniqueExact (0)
                # and CountUnique (empty-HLL estimate 0.0) — matches
                # _Acc semantics in apply_local / the AggregateFn path
                if (op not in ("Sum", "Prod", "CountUniqueExact",
                               "CountUnique", "Append", "Prepend")
                        and (cnt == 0).any()):
                    res = pc.if_else(pa.array(cnt == 0),
                                     pa.nulls(len(starts), res.type), res)
                cols[out] = res
            return pa.table(cols)

        _merge.__name__ = "reduce_merge"
        partials = ds.map_batches(_partial, batch_format="pyarrow")
        return _group_partition(partials, keys, P) \
            .groupby(_GPART).map_groups(_merge, batch_format="pyarrow")

    # -- local oracle --------------------------------------------------------
    def apply_local(self, table: pa.Table) -> pa.Table:
        out_schema = self.output_schema(Schema(table.schema))
        # group indices via arrow dictionary encode on a combined key
        import pandas as pd
        df_keys = table.select(self.keys).to_pandas()
        codes, uniques = pd.factorize(
            pd.MultiIndex.from_frame(df_keys) if len(self.keys) > 1
            else df_keys[self.keys[0]], use_na_sentinel=False)
        n_groups = len(uniques)
        rows: dict[str, list] = {k: [] for k in self.keys}
        _na = lambda v: None if (v is None or (isinstance(v, float) and v != v)
                                 or v is pd.NaT) else v
        if len(self.keys) > 1:
            for u in uniques:
                for k, v in zip(self.keys, u):
                    rows[k].append(_na(v))
        else:
            rows[self.keys[0]] = [_na(v) for v in uniques]
        for col, op, out in self.specs:
            acc = _Acc(op)
            vals = []
            for g in range(n_groups):
                idx = np.nonzero(codes == g)[0]
                sub = table.take(pa.array(idx))
                c = sub[col]
                if self.condition is not None:
                    c = c.filter(self.condition.mask(sub))
                state = acc.accumulate(acc.zero(), c)
                vals.append(acc.finalize(state, self.append_delimiter))
            rows[out] = vals
        arrays = []
        for name, typ in zip(out_schema.names, [out_schema.type_of(n) for n in out_schema.names]):
            arrays.append(pa.array(rows[name], type=typ))
        return pa.table(arrays, schema=out_schema.arrow())

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "Reducer", "keys": self.keys, "specs": self.specs,
                "condition": self.condition.to_dict() if self.condition else None,
                "append_delimiter": self.append_delimiter,
                "num_partitions": self.num_partitions}

    @classmethod
    def from_dict(cls, d):
        return cls(d["keys"], d["specs"], d.get("condition"),
                   d.get("append_delimiter", ","), d.get("num_partitions"))
