"""Sampling, set ops, splits, sequence merge. SURVEY.md §2.13 / §2.8.

Parity targets:
- ``AnalyzeSpark.sampleFromColumn / sample`` (AnalyzeSpark.java:270-348)
  → sample / sample_column.
- ``AnalyzeSpark.getUnique`` (:311-325) → unique_values.
- ``RandomSplit`` / ``SparkUtils.splitData`` (transform/split/RandomSplit.java:31)
  → random_split (hash-deterministic, not row-order-dependent — each row's
  assignment is a pure function of a row hash + seed, so splits are
  reproducible under any partitioning).
- ``SequenceMerge`` (sequence/merge/SequenceMerge.java:34) — merge several
  datasets' sequences sharing a key, re-sorted by the comparator: here a
  union + one GroupedSequence stage.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.hll import hash64
from datavec_ray.sequence import GroupedSequence, SequenceOp
from datavec_ray.steps.base import combine


def sample(ds, fraction: float, seed: int = 42):
    """Uniform random sample of rows."""
    return ds.random_sample(fraction, seed=seed)


def sample_column(ds, column: str, n: int, seed: int = 42) -> list:
    """~n sampled values of one column (sampleFromColumn)."""
    est = ds.count()
    frac = min(1.0, (n * 1.5) / max(1, est))
    vals = (ds.select_columns([column]).random_sample(frac, seed=seed)
            .take(n))
    return [v[column] for v in vals]


def unique_values(ds, column: str):
    """Distinct values of a column (getUnique) — a shuffle."""
    return ds.unique(column)


def random_split(ds, fractions: Sequence[float], seed: int = 42,
                 salt_column: Optional[str] = None) -> list:
    """Split into len(fractions) datasets by deterministic per-row hash.

    Unlike Dataset.split_proportionately (positional), assignment here is
    content-deterministic: rows keep their split across reruns and
    repartitioning — required for reproducible train/test splits at scale.
    ``salt_column``: column whose hash drives assignment (default: a
    whole-row fingerprint of the first column).
    """
    fr = list(fractions)
    if abs(sum(fr) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    bounds = np.cumsum(fr)

    schema = ds.schema().base_schema
    col = salt_column or schema.names[0]

    def assign(batch: pa.Table) -> pa.Table:
        h = hash64(batch[col].combine_chunks())
        u = ((h ^ np.uint64(seed * 0x9E3779B97F4A7C15)) %
             np.uint64(1 << 53)).astype(np.float64) / float(1 << 53)
        part = np.searchsorted(bounds, u, side="right").clip(0, len(fr) - 1)
        return batch.append_column(pa.field("__split", pa.int64()),
                                   pa.array(part.astype(np.int64)))

    tagged = ds.map_batches(assign, batch_format="pyarrow")
    outs = []
    for i in range(len(fr)):
        outs.append(tagged.filter(expr=f"__split == {i}")
                    .drop_columns(["__split"]))
    return outs


def hash_sample(ds, column: str, rate: float, seed: int = 0):
    """Deterministic content-hash sampling: keep a row iff
    ``splitmix64(column) XOR seed_mix`` lands under ``rate`` (per-mille
    resolution 1/10000). Unlike ``sample()`` the kept set is a pure
    function of the data — reproducible across reruns, repartitioning
    and engines (the driver oracle reproduces splitmix64 in SQL), which
    is what a resumable 100 TB curation pipeline needs.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    thresh = np.uint64(int(round(rate * 10000)))
    seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))

    def keep(batch: pa.Table) -> pa.Table:
        h = hash64(batch[column].combine_chunks()) ^ seed_mix
        return batch.filter(pa.array((h % np.uint64(10000)) < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_stratified(ds, keys: Sequence[str], id_col: str, n: int,
                      seed: int = 0):
    """Deterministic stratified sample: exactly min(n, group size) rows
    per key group, chosen by rank of ``splitmix64(id) XOR seed_mix`` —
    a pure function of the data (reproducible across reruns,
    repartitioning and engines; the oracle mirrors splitmix64 in SQL).
    The standard "n examples per language/domain/source" curation step.

    Scale shape: composes :func:`grouped_topn`, so a per-batch combiner
    keeps only each batch's n best rows per group before the ONE groupby
    shuffle."""
    seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))

    def add_rank(batch: pa.Table) -> pa.Table:
        h = hash64(combine(batch[id_col])) ^ seed_mix
        return batch.append_column(pa.field("__srank", pa.uint64()),
                                   pa.array(h))

    ranked = ds.map_batches(add_rank, batch_format="pyarrow")
    out = grouped_topn(ranked, keys, "__srank", n,
                       descending=False, tiebreak=[id_col])
    return out.drop_columns(["__srank"])


_GPART = "__gpart"


def _group_partition(ds, keys: Sequence[str], num_partitions: int):
    """Tag rows with ``hash(keys) % P`` so ONE ``groupby(_GPART)`` both
    co-locates whole key groups AND calls the per-group logic once per
    PARTITION (P calls total), never once per key — at 100 TB a per-key
    ``map_groups`` is millions of Python invocations; the partition form
    is the engine-wide discipline (see exact_dedup, setops).

    ``DATAVEC_NUM_PARTITIONS`` replaces the library-default partition
    count here (the shared chokepoint of every hash-partition groupby)
    for cluster-scale runs; see ``datavec_ray.config``."""
    from datavec_ray.config import partitions_override
    from datavec_ray.ops.setops import _row_hash
    num_partitions = partitions_override(num_partitions)

    keys = list(keys)

    def tag(batch: pa.Table) -> pa.Table:
        h = _row_hash(batch, keys) % np.uint64(num_partitions)
        # drop parquet pandas-metadata dicts: they make the schema
        # unhashable, and Ray's sort stage then logs a "Failed to hash
        # the schemas" warning per reduce task
        return batch.replace_schema_metadata(None) \
            .append_column(pa.field(_GPART, pa.int64()),
                           pa.array(h.astype(np.int64)))

    return ds.map_batches(tag, batch_format="pyarrow")


def _key_run_starts(tbl: pa.Table, keys: Sequence[str]) -> np.ndarray:
    """Boolean mask marking the first row of each key run (tbl sorted by
    keys); nulls compare equal."""
    n = tbl.num_rows
    first = np.ones(n, dtype=bool)
    if n <= 1:
        return first
    same = np.ones(n - 1, dtype=bool)
    for k in keys:
        col = combine(tbl[k])
        a, b = col.slice(0, n - 1), col.slice(1)
        eq = pc.fill_null(pc.equal(a, b), False)
        both = pc.and_(pc.is_null(a), pc.is_null(b))
        same &= pc.or_(eq, both).to_numpy(zero_copy_only=False)
    first[1:] = ~same
    return first


def grouped_quantile(ds, keys: Sequence[str], column: str,
                     qs: Sequence[float], names: Optional[Sequence[str]] = None,
                     num_partitions: int = 32,
                     interpolation: str = "lower"):
    """Exact per-group quantiles. ``interpolation="lower"`` is discrete
    inverted-CDF element selection (DuckDB ``quantile_disc`` semantics —
    bit-exact vs SQL); ``"linear"`` interpolates between the two
    bracketing elements at rank q*(m-1) (DuckDB ``quantile_cont``).
    ONE hash-partition shuffle (P groups, not one per key); within a
    partition every group is resolved by one vectorized sort + segment
    index arithmetic. Output: one row per key with float64 quantile
    columns named ``names`` (default ``p{q*100}``); all-null groups
    yield NULL."""
    if interpolation not in ("lower", "linear"):
        raise ValueError("interpolation must be 'lower' or 'linear'")
    qs = list(qs)
    names = list(names) if names else [f"p{int(round(q * 100))}" for q in qs]
    keys = list(keys)
    linear = interpolation == "linear"

    def gq(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(k, "ascending") for k in keys] + [(column, "ascending")])
        n = g.num_rows
        starts = np.flatnonzero(_key_run_starts(g, keys))
        vals = combine(g[column]).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        valid = (~np.isnan(vals)).astype(np.int64)
        m = np.add.reduceat(valid, starts) if len(starts) else \
            np.zeros(0, dtype=np.int64)
        cols: dict = {k: combine(g[k]).take(pa.array(starts, pa.int64()))
                      for k in keys}
        for q, nm in zip(qs, names):
            if linear:
                # rank q*(m-1), linear between bracketing elements
                h = q * np.maximum(m - 1, 0)
                lo = np.floor(h).astype(np.int64)
                frac = h - lo
                hi = np.minimum(lo + 1, np.maximum(m - 1, 0))
                out = (vals[starts + lo] * (1.0 - frac)
                       + vals[starts + hi] * frac)
            else:
                # inverted CDF: smallest element with CDF >= q
                idx = starts + np.clip(np.ceil(q * m).astype(np.int64) - 1,
                                       0, np.maximum(m - 1, 0))
                out = vals[idx]
            out[m == 0] = np.nan
            cols[nm] = pa.array(out, pa.float64(), from_pandas=True)
        return pa.table(cols)

    gq.__name__ = "grouped_quantile"
    return _group_partition(ds, keys, num_partitions) \
        .groupby(_GPART).map_groups(gq, batch_format="pyarrow")


def grouped_quantile_hist(ds, keys: Sequence[str], column: str,
                          qs: Sequence[float],
                          names: Optional[Sequence[str]] = None,
                          bins: int = 2048, num_partitions: int = 32):
    """Approximate per-group quantiles with a BOUNDED shuffle: unlike
    ``grouped_quantile`` (exact, but every raw row crosses the
    exchange), this ships at most ``groups x bins`` histogram rows.

    Pass 1 — grouped min/max through the Reducer combiner (partial rows
    only); the compact (key, lo, hi) table is broadcast once.
    Pass 2 — each block bins its rows against its group's [lo, hi]
    (fixed ``bins`` buckets), counts per (key, bin) with one Acero
    group_by, and ships those partial histogram rows through ONE hash
    partition; per partition the histograms merge by segmented sum and
    the q-th value is estimated as the MIDPOINT of the first bin whose
    cumulative count reaches ceil(q*m) (inverted CDF on the histogram).

    Error is bounded by (hi-lo)/bins per group. The estimate is a
    DETERMINISTIC function of the data (no sampling), and every float
    expression mirrors an ANSI-SQL formulation term for term, so the
    result is oracle-checkable despite being approximate. Groups whose
    values are all null are dropped (as SQL's join-based formulation
    does). Broadcast lookups key on the shared 64-bit row hash —
    a collision merely merges two groups' ranges (wider bins, still
    deterministic), with probability ~(groups^2)/2^64."""
    import ray

    from datavec_ray.reduce import Reducer
    from datavec_ray.util import dataset_to_table

    qs = list(qs)
    names = list(names) if names else [f"p{int(round(q * 100))}" for q in qs]
    keys = list(keys)
    B = int(bins)

    rng = dataset_to_table(
        Reducer(keys, [[column, "Min", "__lo"], [column, "Max", "__hi"]],
                num_partitions=num_partitions).apply_dataset(ds))
    rng = rng.filter(pc.is_valid(rng["__lo"]))     # all-null groups out
    from datavec_ray.ops.setops import _row_hash
    kh = _row_hash(rng, keys)
    order = np.argsort(kh)
    ref = ray.put((kh[order],
                   rng["__lo"].to_numpy(zero_copy_only=False)
                   .astype(np.float64)[order],
                   rng["__hi"].to_numpy(zero_copy_only=False)
                   .astype(np.float64)[order]))

    def _hist(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        valid = pc.is_valid(batch[column])
        batch = batch.filter(valid)
        if batch.num_rows == 0:
            return pa.table({**{k: pa.array([], batch.schema.field(k).type)
                                for k in keys},
                             "__bin": pa.array([], pa.int64()),
                             "__c": pa.array([], pa.int64())})
        khs, lo, hi = ray.get(ref)
        h = _row_hash(batch, keys)
        pos = np.searchsorted(khs, h)
        pos[pos == len(khs)] = 0       # unseen key: impossible, guard
        glo, ghi = lo[pos], hi[pos]
        v = combine(batch[column]).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        span = ghi - glo
        with np.errstate(invalid="ignore", divide="ignore"):
            b = np.where(span > 0,
                         np.minimum(np.floor((v - glo) / span * B), B - 1),
                         0.0).astype(np.int64)
        tagged = batch.select(keys).append_column(
            pa.field("__bin", pa.int64()), pa.array(b))
        g = tagged.group_by(keys + ["__bin"], use_threads=False) \
            .aggregate([([], "count_all")])
        cols = {k: g[k] for k in keys}
        cols["__bin"] = g["__bin"]
        cols["__c"] = g["count_all"].cast(pa.int64())
        return pa.table(cols)

    def _final(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(k, "ascending") for k in keys] + [("__bin", "ascending")])
        if g.num_rows == 0:
            return pa.table({**{k: pa.array([], g.schema.field(k).type)
                                for k in keys},
                             **{nm: pa.array([], pa.float64())
                                for nm in names}})
        g = g.combine_chunks()
        starts = np.flatnonzero(_key_run_starts(g, keys))
        seg_len = np.diff(np.append(starts, g.num_rows))
        c = g["__c"].to_numpy(zero_copy_only=False)
        bn = g["__bin"].to_numpy(zero_copy_only=False)
        cumg = np.cumsum(c)
        base = np.repeat(cumg[starts] - c[starts], seg_len)
        local = cumg - base
        m = np.add.reduceat(c, starts)
        khs, lo, hi = ray.get(ref)
        kh_g = _row_hash(g.take(pa.array(starts, pa.int64())), keys)
        pos = np.searchsorted(khs, kh_g)
        pos[pos == len(khs)] = 0
        glo, ghi = lo[pos], hi[pos]
        idxs = np.arange(g.num_rows)
        cols = {k: combine(g[k]).take(pa.array(starts, pa.int64()))
                for k in keys}
        big = g.num_rows
        for q, nm in zip(qs, names):
            target = np.repeat(np.ceil(q * m), seg_len)
            hit = np.where(local >= target, idxs, big)
            first = np.minimum.reduceat(hit, starts)
            first = np.minimum(first, big - 1)   # numeric-safety clamp
            sel_bin = bn[first].astype(np.float64)
            cols[nm] = pa.array(glo + (sel_bin + 0.5) / B * (ghi - glo))
        return pa.table(cols)

    _final.__name__ = "grouped_quantile_hist"
    partials = ds.map_batches(_hist, batch_format="pyarrow")
    return _group_partition(partials, keys, num_partitions) \
        .groupby(_GPART).map_groups(_final, batch_format="pyarrow")


def grouped_topn(ds, keys: Sequence[str], order_col: str, n: int,
                 descending: bool = True,
                 tiebreak: Optional[Sequence[str]] = None,
                 num_partitions: int = 32):
    """Top-n rows per group by ``order_col`` (SQL ``QUALIFY
    row_number() OVER (PARTITION BY keys ORDER BY ...) <= n``), exact
    and deterministic: ties broken by ``tiebreak`` columns ascending.

    Scale shape: a map-side combiner first takes the per-batch top-n of
    every group (no batch can contribute more than its own winners), so
    the ONE hash-partition shuffle moves at most n·groups·batches rows —
    at 100 TB with n=5 that is a rounding error of the input. The final
    selection runs once per PARTITION (one pandas sort + groupby-head
    over all of its keys), never once per key."""
    keys = list(keys)
    tiebreak = list(tiebreak) if tiebreak else []
    by = keys + [order_col] + tiebreak
    asc = [True] * len(keys) + [not descending] + [True] * len(tiebreak)

    def _partial(df):
        return (df.sort_values(by, ascending=asc, kind="mergesort")
                .groupby(keys, sort=False, dropna=False).head(n))

    _partial.__name__ = "topn_partial"

    def _final(df):
        df = df.drop(columns=[_GPART])
        return (df.sort_values(by, ascending=asc, kind="mergesort")
                .groupby(keys, sort=False, dropna=False).head(n))

    _final.__name__ = "topn_final"
    combined = ds.map_batches(_partial, batch_format="pandas")
    return _group_partition(combined, keys, num_partitions) \
        .groupby(_GPART).map_groups(_final, batch_format="pandas")


def weighted_sample(ds, column: str, weight_col: str, denom: int = 100,
                    seed: int = 0):
    """Deterministic weighted sampling: keep a row iff
    ``splitmix64(column) XOR seed_mix`` mod ``denom`` is below the row's
    integer weight — i.e. each row survives with probability
    ``weight/denom``, as a pure function of the data (reproducible
    across reruns/repartitioning/engines; the oracle mirrors the hash in
    SQL). Integer weights only: no float rounding to diverge between
    engines. The standard importance-sampling step (e.g. keep long
    documents proportionally more often)."""
    seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))

    def keep(batch: pa.Table) -> pa.Table:
        h = (hash64(combine(batch[column])) ^ seed_mix) % np.uint64(denom)
        w = combine(batch[weight_col]).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return batch.filter(pa.array(h.astype(np.int64) < w))

    return ds.map_batches(keep, batch_format="pyarrow")


def interleave_corpora(sources: Sequence, rates: Sequence[float],
                       column: str, seed: int = 0):
    """Deterministic corpus mixing: sample source i at ``rates[i]`` by
    content hash (``hash_sample`` with per-source seed ``seed + i``),
    then union — the standard "mix domains/sources at fixed ratios"
    curation step. The kept set is a pure function of the data, so a
    resumed 100 TB run reproduces the same mixture; per-source seeds
    decorrelate the keep decisions of a document present in several
    sources. Union is a metadata-only concatenation (no shuffle)."""
    sources, rates = list(sources), list(rates)
    if len(sources) != len(rates):
        raise ValueError("one rate per source required")
    outs = [ds if r >= 1.0 else hash_sample(ds, column, r, seed=seed + i)
            for i, (ds, r) in enumerate(zip(sources, rates))]
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


_PIVOT_AGGS = ("sum", "min", "max", "count", "mean")


def pivot_table(ds, keys: Sequence[str], pivot_col: str, value_col: str,
                agg: str = "sum", states: Optional[Sequence[str]] = None):
    """Aggregating pivot (SQL ``PIVOT t ON pivot_col USING agg(value)
    GROUP BY keys``): one output row per key combination, one column per
    pivot state (named by the state value), missing combinations NULL.
    The inverse of ``steps.Melt``; the reference's ``PivotTransform`` is
    per-row with no aggregation — this is the grouped form every
    reporting stage actually needs.

    Scale shape: a per-batch pandas partial aggregation first collapses
    each batch to (keys × states) partial rows, so the ONE groupby
    shuffle moves pre-aggregated cells, not input rows. ``states`` must
    enumerate the pivot values for a stable schema (computed with one
    ``ds.unique`` pass when omitted — pass it explicitly in pipelines).
    """
    if agg not in _PIVOT_AGGS:
        raise ValueError(f"agg must be one of {_PIVOT_AGGS}")
    keys = list(keys)
    if states is None:
        states = sorted(ds.unique(pivot_col))
    states = [str(s) for s in states]

    gcols = keys + [pivot_col]
    part_agg = {"mean": "sum"}.get(agg, agg)

    def _partial(df):
        g = df.groupby(gcols, sort=False, dropna=False)[value_col]
        out = g.agg(part_agg).rename("__s").reset_index()
        if agg == "mean":
            out["__c"] = g.count().reset_index(drop=True)
        return out

    _partial.__name__ = "pivot_partial"

    def _final(df):
        # one pandas groupby + unstack resolves EVERY key in the
        # partition at once (P partition calls total, never per-key)
        df = df.drop(columns=[_GPART])
        df[pivot_col] = df[pivot_col].astype(str)
        g = df.groupby(keys + [pivot_col], sort=False, dropna=False)
        if agg in ("sum", "count"):
            cells = g["__s"].sum()
        elif agg == "min":
            cells = g["__s"].min()
        elif agg == "max":
            cells = g["__s"].max()
        else:                       # mean
            cells = g["__s"].sum() / g["__c"].sum()
        wide = cells.unstack(pivot_col).reindex(columns=states)
        wide.columns.name = None
        return wide.reset_index()

    _final.__name__ = "pivot_final"
    combined = ds.map_batches(_partial, batch_format="pandas")
    return _group_partition(combined, keys, 32) \
        .groupby(_GPART).map_groups(_final, batch_format="pandas")


_RANK_METHODS = ("rank", "dense_rank", "row_number", "percent_rank",
                 "cume_dist", "ntile")


def _range_minmax(arr: np.ndarray, lo: np.ndarray, hi: np.ndarray, f):
    """Vectorized range min/max: a sparse table (doubling windows) over
    ``arr``, queried at inclusive in-range bounds ``[lo, hi]`` with
    ``lo <= hi``. Exact for any dtype ``f`` supports (incl. int64).
    Memory is O(n · log(max window)) — bounded spans build only as
    many levels as the widest frame needs."""
    length = hi - lo + 1
    # floor(log2(length)) without float-rounding hazards at powers of 2
    kq = np.log2(length + 0.5).astype(np.int64)
    st = [arr]
    for j in range(1, int(kq.max()) + 1):
        h = 1 << (j - 1)
        prev = st[-1]
        st.append(f(prev[:len(prev) - h], prev[h:]))
    out = np.empty(len(lo), dtype=arr.dtype)
    for j in np.unique(kq):
        m = kq == j
        w = 1 << int(j)
        out[m] = f(st[int(j)][lo[m]], st[int(j)][hi[m] - w + 1])
    return out


def window_rank(ds, keys: Sequence[str], order_col: str,
                rank_col: str = "rank", method: str = "rank",
                descending: bool = False,
                tiebreak: Optional[Sequence[str]] = None,
                num_partitions: int = 32,
                specs: Optional[dict] = None, ntile_buckets: int = 4):
    """Per-group window-function column(s) — SQL ``rank() /
    dense_rank() / row_number() / percent_rank() / cume_dist() /
    ntile(b) OVER (PARTITION BY keys ORDER BY order_col)``.

    ``specs={out_col: method, ...}`` computes several functions in ONE
    shuffle+sort (the common "rank + percentile + bucket" trio);
    otherwise the single ``rank_col``/``method`` pair is used.
    Value-tied methods (rank/dense_rank/percent_rank/cume_dist) are
    deterministic without a tiebreak; positional ones
    (row_number/ntile) need ``tiebreak`` columns for a total order.
    ONE hash-partition shuffle (P groups, never one per key); within a
    partition one sort + numpy run-boundary scan ranks every group at
    once."""
    specs = dict(specs) if specs else {rank_col: method}
    for m in specs.values():
        if isinstance(m, tuple):
            # ("lag"|"lead", src_col, offset) positional shift, or
            # ("wtotal"|"wrun"|"wrange", op, src_col|"*") windowed
            # aggregate (totals / running ROWS frame / running RANGE
            # frame incl. value peers), or ("wrows", op, src, k) —
            # bounded sliding ROWS k PRECEDING .. CURRENT ROW frame
            ops = ("Sum", "Mean", "Min", "Max", "Count")
            if m[0] in ("lag", "lead"):
                if len(m) != 3 or not isinstance(m[2], int) or m[2] < 0:
                    raise ValueError(f"bad lag/lead spec {m!r}")
            elif m[0] in ("wtotal", "wrun", "wrange"):
                if len(m) != 3 or m[1] not in ops:
                    raise ValueError(f"bad window-aggregate spec {m!r}")
            elif m[0] == "wrows":
                if (len(m) != 4 or m[1] not in ops
                        or not isinstance(m[3], int) or m[3] < 0):
                    raise ValueError(f"bad sliding-window spec {m!r}")
            elif m[0] == "wspan":
                # ("wspan", op, src, lo_off|None, hi_off|None): general
                # ROWS frame with FOLLOWING bounds (offsets relative to
                # the row, negative = preceding; None = unbounded).
                # Sum/Mean/Count run on prefix-sum differences; Min/Max
                # on the exact sparse-table range kernel.
                if (len(m) != 5 or m[1] not in ops
                        or not all(x is None or isinstance(x, int)
                                   for x in m[3:5])):
                    raise ValueError(f"bad frame-span spec {m!r}")
            else:
                raise ValueError(f"unknown window spec {m!r}")
        elif m not in _RANK_METHODS:
            raise ValueError(f"unknown rank method {m!r}")
    keys = list(keys)
    tiebreak = list(tiebreak) if tiebreak else []
    # wrange is deliberately absent: the RANGE-peers frame is
    # deterministic without a total order (peers share one value)
    _needs_order = ("lag", "lead", "wrun", "wrows", "wspan")
    if any((isinstance(m, tuple) and m[0] in _needs_order)
           or m in ("row_number", "ntile")
           for m in specs.values()) and not tiebreak:
        raise ValueError("row_number/ntile/lag/lead/running aggregates "
                         "need tiebreak columns to be deterministic")

    def _rank(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(k, "ascending") for k in keys]
            + [(order_col, "descending" if descending else "ascending")]
            + [(c, "ascending") for c in tiebreak])
        n = g.num_rows
        pos = np.arange(n, dtype=np.int64)
        new_grp = _key_run_starts(g, keys)
        grp_start = np.maximum.accumulate(np.where(new_grp, pos, 0))
        starts = np.flatnonzero(new_grp)
        sizes = np.diff(np.append(starts, n))
        grp_n = np.repeat(sizes, sizes) if n else pos  # group size per row
        new_val = None

        def value_runs():
            nonlocal new_val
            if new_val is None:
                v = combine(g[order_col])
                new_val = new_grp.copy()
                if n > 1:
                    eq = pc.fill_null(pc.equal(v.slice(0, n - 1),
                                               v.slice(1)), False)
                    both_null = pc.and_(pc.is_null(v.slice(0, n - 1)),
                                        pc.is_null(v.slice(1)))
                    new_val[1:] |= ~pc.or_(eq, both_null).to_numpy(
                        zero_copy_only=False)
            return new_val

        for col, m in specs.items():
            if isinstance(m, tuple) and m[0] in ("wtotal", "wrun",
                                                 "wrange", "wrows",
                                                 "wspan"):
                # windowed aggregate: per-segment reduceat (totals),
                # segment-reset cumulative scan (running ROWS frame),
                # peer-run propagation (RANGE frame), or bounded
                # prefix-sum differences (sliding ROWS k PRECEDING) —
                # SQL null semantics (aggregates skip NULLs; an
                # all-null window yields NULL; COUNT never does)
                kind, op2, src_col = m[0], m[1], m[2]
                kprec = m[3] if len(m) > 3 else 0
                if n == 0:
                    et = pa.float64() if op2 == "Mean" or (
                        src_col != "*" and op2 != "Count"
                        and pa.types.is_floating(
                            g.schema.field(src_col).type)) else pa.int64()
                    g = g.append_column(pa.field(col, et),
                                        pa.array([], et))
                    continue
                if src_col == "*":
                    valid = np.ones(n, dtype=bool)
                    vals = np.ones(n, dtype=np.int64)
                    vtype = pa.int64()
                else:
                    v = combine(g[src_col])
                    vtype = v.type
                    valid = pc.is_valid(v).to_numpy(zero_copy_only=False)
                    if op2 != "Count":
                        if not (pa.types.is_integer(vtype)
                                or pa.types.is_floating(vtype)
                                or pa.types.is_boolean(vtype)):
                            raise ValueError(
                                f"window {op2} needs a numeric column, "
                                f"got {vtype}")
                        vals = pc.fill_null(v, 0).cast(
                            pa.float64() if pa.types.is_floating(vtype)
                            else pa.int64()).to_numpy(zero_copy_only=False)
                contrib = np.where(valid, 1, 0).astype(np.int64)
                if kind == "wtotal":
                    cnt = np.repeat(np.add.reduceat(contrib, starts)
                                    if n else contrib, sizes)
                    if op2 == "Count":
                        r, otype, mask0 = cnt, pa.int64(), None
                    elif op2 in ("Min", "Max"):
                        if np.issubdtype(vals.dtype, np.floating):
                            sent = np.inf if op2 == "Min" else -np.inf
                        else:
                            info = np.iinfo(np.int64)
                            sent = info.max if op2 == "Min" else info.min
                        arr = np.where(valid, vals, sent)
                        f = np.minimum if op2 == "Min" else np.maximum
                        r = np.repeat(f.reduceat(arr, starts), sizes)
                        otype, mask0 = (pa.float64()
                                        if np.issubdtype(vals.dtype,
                                                         np.floating)
                                        else pa.int64()), cnt == 0
                    else:
                        s = np.repeat(np.add.reduceat(
                            np.where(valid, vals, 0), starts), sizes)
                        if op2 == "Mean":
                            r = s.astype(np.float64) / np.maximum(cnt, 1)
                            otype = pa.float64()
                        else:
                            r, otype = s, (pa.float64() if
                                           np.issubdtype(vals.dtype,
                                                         np.floating)
                                           else pa.int64())
                        mask0 = cnt == 0
                else:
                    # running / sliding frames over segment-sorted rows
                    ccnt = np.cumsum(contrib)
                    ok_win = None
                    if kind in ("wrows", "wspan"):
                        # bounded frame: prefix-sum difference between
                        # the clamped frame bounds
                        grp_end = grp_start + grp_n - 1
                        if kind == "wrows":
                            lo = np.maximum(grp_start,
                                            pos - np.int64(kprec))
                            hi = pos
                        else:
                            lo_off, hi_off = m[3], m[4]
                            lo = grp_start if lo_off is None else \
                                np.maximum(grp_start,
                                           pos + np.int64(lo_off))
                            hi = grp_end if hi_off is None else \
                                np.minimum(grp_end,
                                           pos + np.int64(hi_off))
                            # empty windows (an AND k PRECEDING upper
                            # bound near the segment start, or a
                            # FOLLOWING lower bound past the segment
                            # end) are masked by ok_win; clamp BOTH
                            # bounds into the segment so the prefix
                            # gathers never index out of range (hi can
                            # go negative, lo past the array end)
                            ok_win = (hi >= lo) & (lo <= grp_end)
                            lo = np.minimum(lo, grp_end)
                            hi = np.clip(hi, lo, grp_end)
                        base_c = np.where(lo > 0,
                                          ccnt[np.maximum(lo - 1, 0)], 0)
                        rcnt = ccnt[hi] - base_c
                        if ok_win is not None:
                            rcnt = np.where(ok_win, rcnt, 0)
                    else:
                        rcnt = ccnt - np.repeat(
                            ccnt[starts] - contrib[starts], sizes)
                    src_float = (op2 != "Count"
                                 and np.issubdtype(vals.dtype, np.floating))
                    if op2 == "Count":
                        r, otype, mask0 = rcnt, pa.int64(), None
                    elif op2 in ("Min", "Max"):
                        # segment-reset cummin/cummax (running) or
                        # per-segment rolling min/max (bounded frame):
                        # pandas Cython kernels over ALL groups at once;
                        # NaN marks nulls (skipped), ffill restores the
                        # SQL "min over preceding non-nulls" at null rows
                        import pandas as pd
                        seg_id = np.cumsum(new_grp) - 1
                        mask0 = rcnt == 0
                        big = (not src_float and valid.any()
                               and np.abs(vals[valid]).max() >= 2 ** 53)
                        if kind == "wspan" or (big and kind == "wrows"):
                            # exact range-min/max: a vectorized sparse
                            # table over the sentinel-filled values,
                            # queried at the already-clamped global
                            # [lo, hi] frame bounds — covers FOLLOWING
                            # bounds (no prefix order-statistic exists)
                            # and int64 magnitudes beyond 2^53 exactly;
                            # empty windows are masked by rcnt == 0
                            if src_float:
                                sent = np.inf if op2 == "Min" else -np.inf
                                arr = np.where(valid, vals, sent)
                            else:
                                info = np.iinfo(np.int64)
                                sent = info.max if op2 == "Min" \
                                    else info.min
                                arr = np.where(valid, vals, sent) \
                                    .astype(np.int64)
                            r = _range_minmax(
                                arr, lo, hi, np.minimum if op2 == "Min"
                                else np.maximum)
                        elif big:
                            # exact int64 path: a sentinel replaces
                            # nulls (it never wins once any valid value
                            # precedes; all-null prefixes are masked by
                            # rcnt == 0 below)
                            sent = (np.iinfo(np.int64).max if op2 == "Min"
                                    else np.iinfo(np.int64).min)
                            iv = pd.Series(np.where(valid, vals, sent)
                                           .astype(np.int64))
                            gbi = iv.groupby(seg_id)
                            r = (gbi.cummin() if op2 == "Min"
                                 else gbi.cummax()).to_numpy()
                        else:
                            fv = pd.Series(np.where(
                                valid, vals.astype(np.float64), np.nan))
                            gb = fv.groupby(seg_id)
                            if kind == "wrows":
                                r = gb.rolling(kprec + 1, min_periods=1) \
                                    .agg("min" if op2 == "Min" else "max") \
                                    .to_numpy()
                            else:
                                r = (gb.cummin() if op2 == "Min"
                                     else gb.cummax()).groupby(seg_id) \
                                    .ffill().to_numpy()
                        otype = pa.float64() if src_float else pa.int64()
                        if otype == pa.int64():
                            # exact for |v| < 2^53 (float64 mantissa);
                            # larger magnitudes took the sentinel path
                            r = np.where(mask0, 0, r).astype(np.int64)
                    else:                  # Sum / Mean
                        c2 = np.where(valid, vals, 0)
                        cs = np.cumsum(c2)
                        if kind in ("wrows", "wspan"):
                            base_s = np.where(lo > 0,
                                              cs[np.maximum(lo - 1, 0)], 0)
                            rs = cs[hi] - base_s
                            if ok_win is not None:
                                rs = np.where(ok_win, rs, 0)
                        else:
                            rs = cs - np.repeat(cs[starts] - c2[starts],
                                                sizes)
                        if kind == "wrange":
                            # default RANGE frame: value PEERS share the
                            # frame — every row takes the running value
                            # at the END of its peer run
                            new_peer = value_runs()
                            pstarts = np.flatnonzero(new_peer)
                            psizes = np.diff(np.append(pstarts, n))
                            pends = pstarts + psizes - 1
                            rs = np.repeat(rs[pends], psizes)
                            rcnt = np.repeat(rcnt[pends], psizes)
                        if op2 == "Mean":
                            r = rs.astype(np.float64) / np.maximum(rcnt, 1)
                            otype = pa.float64()
                        else:
                            r, otype = rs, (pa.float64() if src_float
                                            else pa.int64())
                        mask0 = rcnt == 0
                    if kind == "wrange" and op2 in ("Min", "Max", "Count"):
                        new_peer = value_runs()
                        pstarts = np.flatnonzero(new_peer)
                        psizes = np.diff(np.append(pstarts, n))
                        pends = pstarts + psizes - 1
                        r = np.repeat(r[pends], psizes)
                        if mask0 is not None:
                            mask0 = np.repeat(mask0[pends], psizes)
                arr_out = pa.array(r.astype(
                    np.float64 if otype == pa.float64() else np.int64))
                if otype == pa.float64() and arr_out.type != pa.float64():
                    arr_out = arr_out.cast(pa.float64())
                if mask0 is not None and mask0.any():
                    arr_out = pc.if_else(pa.array(~mask0), arr_out,
                                         pa.nulls(1, arr_out.type)[0])
                g = g.append_column(pa.field(col, arr_out.type), arr_out)
                continue
            if isinstance(m, tuple):
                # lag/lead: per-row shifted gather clamped to the key
                # segment (one vectorized take over the sorted run)
                kind, src_col, off = m
                shift = off if kind == "lag" else -off
                idx = pos - np.int64(shift)
                grp_end = grp_start + grp_n - 1
                ok = (idx >= grp_start) & (idx <= grp_end)
                v = combine(g[src_col])
                taken = v.take(pa.array(np.where(ok, idx, 0),
                                        type=pa.int64()))
                vals = pc.if_else(pa.array(ok), taken,
                                  pa.nulls(1, v.type)[0])
                g = g.append_column(pa.field(col, v.type), vals)
                continue
            if m == "row_number":
                r = pos - grp_start + 1
            elif m == "ntile":
                p = pos - grp_start
                b = np.int64(ntile_buckets)
                q, rem = grp_n // b, grp_n % b
                head = rem * (q + 1)        # rows in the larger buckets
                r = np.where(p < head, p // np.maximum(q + 1, 1),
                             rem + (p - head) // np.maximum(q, 1)) + 1
                r = np.minimum(r, grp_n)    # q==0: each row its own bucket
            else:
                nv = value_runs()
                if m == "dense_rank":
                    cnv = np.cumsum(nv)
                    r = cnv - cnv[grp_start] + 1
                elif m == "cume_dist":
                    vs = np.flatnonzero(nv)
                    run_idx = np.cumsum(nv) - 1
                    run_end = np.append(vs[1:], n)[run_idx]
                    r = (run_end - grp_start) / grp_n
                else:               # rank: position of the value-run start
                    r = np.maximum.accumulate(np.where(nv, pos, 0)) \
                        - grp_start + 1
                    if m == "percent_rank":
                        r = np.where(grp_n > 1,
                                     (r - 1) / np.maximum(grp_n - 1, 1), 0.0)
            if m in ("percent_rank", "cume_dist"):
                g = g.append_column(pa.field(col, pa.float64()),
                                    pa.array(r.astype(np.float64)))
            else:
                g = g.append_column(pa.field(col, pa.int64()),
                                    pa.array(r.astype(np.int64)))
        return g

    _rank.__name__ = "window_rank"
    return _group_partition(ds, keys, num_partitions) \
        .groupby(_GPART).map_groups(_rank, batch_format="pyarrow")


def shuffled_shards(ds, id_col: str, n_shards: int, seed: int = 0,
                    _emit=None):
    """Deterministic global shuffle for training-data export: each
    row's shard and within-shard position are PURE FUNCTIONS of its id
    (shard = splitmix64(id) XOR seed_mix, mod n_shards; within-shard
    order ascending by (shuffle hash, id)). Appends int64 ``shard`` and
    ``pos`` columns.

    vs ``Dataset.random_shuffle``: the same uniform-permutation effect
    for training, but reproducible across reruns / repartitionings /
    engines (the oracle reproduces splitmix64 in SQL), resumable
    per shard after a crash, and ONE hash exchange — no two-stage
    materializing all-to-all. Epochs vary by ``seed``. Each shard is
    one output group — write shard files straight from the groups."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))
    n_u = np.uint64(n_shards)

    def tag(batch: pa.Table) -> pa.Table:
        h = hash64(combine(batch[id_col])).astype(np.uint64) ^ seed_mix
        batch = batch.append_column(
            pa.field("__h", pa.uint64()), pa.array(h))
        return batch.append_column(
            pa.field("shard", pa.int64()),
            pa.array((h % n_u).astype(np.int64)))

    def order(group: pa.Table) -> pa.Table:
        g = group.sort_by([("__h", "ascending"), (id_col, "ascending")])
        g = g.append_column(pa.field("pos", pa.int64()),
                            pa.array(np.arange(g.num_rows)))
        g = g.drop_columns(["__h"])
        return _emit(g) if _emit is not None else g

    order.__name__ = "shard_order"
    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("shard").map_groups(order, batch_format="pyarrow")


def export_shuffled_shards(ds, id_col: str, n_shards: int, out_dir: str,
                           seed: int = 0) -> pa.Table:
    """RESUMABLE training-data export: ``shuffled_shards`` with one
    parquet file per shard (``shard-NNNN.parquet``) written atomically
    (tmp + rename) INSIDE the per-shard group task — same single
    exchange, no extra pass. A shard file that already exists is
    skipped, so a crashed export rerun finishes only the missing shards
    (the permutation is a pure function of the data and seed, so a
    rewritten shard has identical content). Returns a manifest table
    (shard, rows, path, skipped)."""
    import os

    import pyarrow.parquet as _pq

    from datavec_ray.util import dataset_to_table

    os.makedirs(out_dir, exist_ok=True)

    def write(g: pa.Table) -> pa.Table:
        sid = int(g["shard"][0].as_py())
        path = os.path.join(out_dir, f"shard-{sid:04d}.parquet")
        skipped = os.path.exists(path)
        if not skipped:
            tmp = path + ".tmp"
            _pq.write_table(g, tmp)     # already in pos order
            os.replace(tmp, path)
        return pa.table({"shard": pa.array([sid], pa.int64()),
                         "rows": pa.array([g.num_rows], pa.int64()),
                         "path": pa.array([path], pa.string()),
                         "skipped": pa.array([skipped], pa.bool_())})

    manifest = shuffled_shards(ds, id_col, n_shards, seed=seed,
                               _emit=write)
    return dataset_to_table(manifest).sort_by([("shard", "ascending")])


def sequence_merge(datasets: Sequence, keys: Sequence[str],
                   order_by: Sequence[str],
                   ops: Sequence[SequenceOp] = ()):
    """Merge sequences sharing a key across several datasets into one
    re-sorted sequence (SequenceMerge.java:34): union → one grouped
    shuffle, optional per-sequence op chain applied after the sort."""
    it = iter(datasets)
    ds = next(it)
    for other in it:
        ds = ds.union(other)
    return GroupedSequence(keys, order_by, ops).apply_dataset(ds)


def pack_by_budget(ds, weight_col: str, budget: int,
                   order_by: Sequence[str] | str,
                   shard_col: str = "shard"):
    """Pack rows into fixed-weight-budget output shards in a stable
    total order — the training-data sharding step ("fill each shard
    with ~budget tokens, in doc_id order, reproducibly"). A row whose
    EXCLUSIVE prefix sum is p lands in shard ``p // budget``, so shard
    boundaries are pure functions of the order and weights (a shard
    overruns only by its last document's overflow — sequential-packing
    parity, and exactly SQL's
    ``sum(w) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING AND 1
    PRECEDING) // budget``).

    Execution mirrors CalculateSortedRank (rank.py): ``ds.sort`` (range
    shuffle) → per-block weight sums (tiny metadata pass) → driver
    prefix offsets (P ints) → per-block exclusive cumsum + offset.
    Blocks never leave the object store; the driver sees P numbers.
    """
    import ray
    import ray.data as rd

    if budget <= 0:
        raise ValueError("budget must be positive")
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    mat = ds.sort(order_by).materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def _wsum(block: pa.Table) -> int:
        s = pc.sum(pc.fill_null(block[weight_col].cast(pa.int64()), 0))
        return int(s.as_py() or 0)

    @ray.remote
    def _assign(block: pa.Table, offset: int) -> pa.Table:
        w = pc.fill_null(block[weight_col].cast(pa.int64()), 0) \
            .combine_chunks().to_numpy(zero_copy_only=False)
        excl = offset + np.cumsum(w, dtype=np.int64) - w
        return block.append_column(
            pa.field(shard_col, pa.int64()), pa.array(excl // budget))

    sums = ray.get([_wsum.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]]) if sums else []
    return rd.from_arrow_refs(
        [_assign.remote(r, int(o)) for r, o in zip(refs, offsets)])


def range_window_agg(ds, keys: Sequence[str], order_col: str,
                     value_col: str, width,
                     out_col: str = "w_sum", agg: str = "sum",
                     num_partitions: int = 32):
    """Time-range windowed aggregate: for every row, aggregate
    ``value_col`` over the rows of the same key group whose ``order_col``
    lies in ``[t - width, t]`` — SQL ``agg(value) OVER (PARTITION BY keys
    ORDER BY order_col RANGE BETWEEN width PRECEDING AND CURRENT ROW)``,
    peers (equal timestamps) included, matching the SQL RANGE frame.
    ``agg`` in {'sum', 'count', 'mean'}. Appends ``out_col`` (float64 for
    sum/mean, int64 for count) to every input row.

    Distinct from the sequence ops: `SequenceMovingWindowReduce` is a
    ROWS frame (fixed row count) and `ReduceSequenceByWindow` collapses
    windows to one row; this keeps every row and frames by VALUE range.

    Scale shape: ONE hash-partition shuffle (P groups, not one per key);
    within a partition all groups are resolved together by one sort +
    two ``searchsorted`` calls — each group's timestamps are biased by
    ``segment_id * span`` in EXACT int64 arithmetic (span = observed
    timestamp range + width + 1) so a single global binary search can
    never cross a group boundary; exactness holds whenever
    ``n_segments * span < 2**62`` (epoch-ms spans ~2**41 allow ~2**21
    groups per partition — add partitions for more). Float order
    columns, or partitions beyond that bound, fall back to a
    per-segment searchsorted (still vectorized within each segment) —
    never a lossy float bias. Window sums use ``np.add.reduceat`` on
    the [lo, hi) bounds — direct per-window summation, no cumsum
    cancellation error.
    """
    if agg not in ("sum", "count", "mean"):
        raise ValueError(f"agg must be sum/count/mean, got {agg!r}")
    keys = list(keys)
    width = float(width)

    def rw(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(k, "ascending") for k in keys] + [(order_col, "ascending")])
        n = g.num_rows
        if n == 0:
            return g.append_column(
                pa.field(out_col, pa.int64() if agg == "count"
                         else pa.float64()),
                pa.array([], pa.int64() if agg == "count" else pa.float64()))
        tarr = combine(g[order_col])
        int_like = (pa.types.is_integer(tarr.type)
                    or pa.types.is_timestamp(tarr.type))
        v = combine(g[value_col]).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        run_starts = _key_run_starts(g, keys)
        seg = np.cumsum(run_starts) - 1                    # segment id/row
        lo = hi = None
        if int_like:
            # over integer timestamps a fractional width floors exactly:
            # t_j >= t_i - w  <=>  t_j >= t_i - floor(w)
            t = tarr.cast(pa.int64()).to_numpy(zero_copy_only=False)
            wq = np.int64(np.floor(width))
            shift = t - t.min()
            span = int(shift.max()) + max(int(wq), 0) + 1
            nseg = int(seg[-1]) + 1
            if span > 0 and nseg <= (2 ** 62) // span:
                # exact int64 segment bias: one global searchsorted pair
                tt = seg * np.int64(span) + shift
                lo = np.searchsorted(tt, tt - wq, side="left")
                hi = np.searchsorted(tt, tt, side="right")
        else:
            t = tarr.cast(pa.float64()).to_numpy(zero_copy_only=False)
            wq = width
        if lo is None:
            # per-segment searchsorted (float order cols / huge spans):
            # exact at any timestamp magnitude or segment count
            bounds = np.append(np.flatnonzero(run_starts), n)
            lo = np.empty(n, np.int64)
            hi = np.empty(n, np.int64)
            for a, b in zip(bounds[:-1], bounds[1:]):
                ts = t[a:b]
                lo[a:b] = a + np.searchsorted(ts, ts - wq, side="left")
                hi[a:b] = a + np.searchsorted(ts, ts, side="right")
        cnt = hi - lo
        if agg == "count":
            out = pa.array(cnt.astype(np.int64))
        else:
            # sentinel element keeps every hi (== n at the last row) a
            # legal reduceat index; odd (inter-window) outputs discarded
            vs = np.append(np.nan_to_num(v, nan=0.0), 0.0)
            idx = np.empty(2 * n, dtype=np.int64)
            idx[0::2], idx[1::2] = lo, hi
            sums = np.add.reduceat(vs, idx)[0::2]
            nvalid = np.add.reduceat(
                np.append((~np.isnan(v)).astype(np.int64), 0), idx)[0::2]
            if agg == "sum":
                res = np.where(nvalid > 0, sums, np.nan)
            else:
                res = np.where(nvalid > 0, sums / np.maximum(nvalid, 1),
                               np.nan)
            out = pa.array(res, pa.float64(), from_pandas=True)
        return g.append_column(pa.field(out_col, out.type), out)

    rw.__name__ = "range_window_agg"
    return _group_partition(ds, keys, num_partitions) \
        .groupby(_GPART).map_groups(rw, batch_format="pyarrow")


def sessionize(ds, keys: Sequence[str], order_col: str, gap,
               tiebreak: Optional[str] = None,
               out_col: str = "session_id", num_partitions: int = 32):
    """Gap-based sessionization over FLAT event rows: within each key
    group ordered by ``order_col`` (ties broken by ``tiebreak``), start
    a new session whenever the gap to the previous event exceeds
    ``gap``; appends ``out_col`` = 0-based session ordinal per key.
    SQL: ``sum(case when t - lag(t) > gap then 1 else 0 end) OVER
    (PARTITION BY keys ORDER BY t, tiebreak ROWS UNBOUNDED PRECEDING)``.

    The sequence op `SequenceSplitTimeSeparation` does the same split on
    the grouped-sequence representation; this variant never builds
    sequences — one hash-partition shuffle, then per partition one sort
    + one vectorized diff/cumsum over ALL groups at once.
    """
    keys = list(keys)
    gap = float(gap)
    sort_cols = keys + [order_col] + ([tiebreak] if tiebreak else [])

    def sz(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(c, "ascending") for c in sort_cols])
        n = g.num_rows
        if n == 0:
            return g.append_column(pa.field(out_col, pa.int64()),
                                   pa.array([], pa.int64()))
        t = combine(g[order_col]).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        starts_mask = _key_run_starts(g, keys)
        new = starts_mask.copy()
        if n > 1:
            new[1:] |= (t[1:] - t[:-1]) > gap
        sid = np.cumsum(new)
        seg_starts = np.flatnonzero(starts_mask)
        lens = np.diff(np.concatenate((seg_starts, [n])))
        base = np.repeat(sid[seg_starts], lens)
        return g.append_column(pa.field(out_col, pa.int64()),
                               pa.array(sid - base))

    sz.__name__ = "sessionize"
    return _group_partition(ds, keys, num_partitions) \
        .groupby(_GPART).map_groups(sz, batch_format="pyarrow")


def grouped_ewma(ds, keys: Sequence[str], order_col: str, value_col: str,
                 alpha: float, tiebreak: Optional[str] = None,
                 out_col: str = "ewma", adjust: bool = True,
                 num_partitions: int = 32):
    """Exponentially-weighted moving average per key group ordered by
    ``order_col`` — the feature-engineering counterpart of the rolling
    window ops (reference moving-window family, ``sequence/window``).
    ``adjust=True`` is the standard normalized form
    ``y_t = Σ (1-α)^(t-i) x_i / Σ (1-α)^(t-i)``.

    Shape: ONE hash-partition shuffle (same discipline as sessionize);
    per partition one sort, then pandas' Cython ``groupby().ewm()``
    scan over ALL groups at once — a numerically-stable O(n) kernel,
    no Python per row (the same deliberate pandas-kernel choice as
    merge_asof in join.py).
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    keys = list(keys)
    sort_cols = keys + [order_col] + ([tiebreak] if tiebreak else [])

    def ew(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(c, "ascending") for c in sort_cols])
        if g.num_rows == 0:
            return g.append_column(pa.field(out_col, pa.float64()),
                                   pa.array([], pa.float64()))
        df = g.select(keys + [value_col]).to_pandas()
        y = df.groupby(keys, sort=False, dropna=False)[value_col] \
              .ewm(alpha=alpha, adjust=adjust).mean() \
              .reset_index(drop=True).to_numpy()
        return g.append_column(pa.field(out_col, pa.float64()),
                               pa.array(y, pa.float64()))

    ew.__name__ = "grouped_ewma"
    return _group_partition(ds, keys, num_partitions) \
        .groupby(_GPART).map_groups(ew, batch_format="pyarrow")


def ffill_group(ds, keys: Sequence[str], order_col: str,
                value_cols: Sequence[str],
                tiebreak: Optional[str] = None,
                direction: str = "forward", num_partitions: int = 32):
    """Last-observation-carried-forward (LOCF) per key group: within
    each ``keys`` group ordered by ``order_col`` (ties broken by
    ``tiebreak``), replace each null in ``value_cols`` with the nearest
    preceding non-null value of the same group (``direction="backward"``
    fills from the nearest following value instead). Leading (resp.
    trailing) nulls with no donor stay null. SQL:
    ``last_value(x IGNORE NULLS) OVER (PARTITION BY keys ORDER BY
    order_col ROWS UNBOUNDED PRECEDING)``.

    The classic time-series gap-repair step (reference has no
    counterpart; complements ReplaceInvalid, steps/math.py). Shape: one
    hash-partition shuffle, then per PARTITION one sort + per column one
    ``np.maximum.accumulate`` over all groups at once — donor indices
    are clamped to their own key segment, so fills never cross group
    boundaries; the gather is a single Arrow ``take`` (works for any
    column type, strings included), no Python per row.
    """
    if direction not in ("forward", "backward"):
        raise ValueError("direction must be 'forward' or 'backward'")
    keys = list(keys)
    value_cols = list(value_cols)
    bad = set(value_cols) & (set(keys) | {order_col})
    if bad:
        raise ValueError(f"value_cols overlap keys/order: {sorted(bad)}")
    sort_cols = keys + [order_col] + ([tiebreak] if tiebreak else [])

    def ff(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(c, "ascending") for c in sort_cols])
        n = g.num_rows
        if n == 0:
            return g
        starts_mask = _key_run_starts(g, keys)
        seg_starts = np.flatnonzero(starts_mask)
        lens = np.diff(np.concatenate((seg_starts, [n])))
        seg_lo = np.repeat(seg_starts, lens)          # segment start, incl.
        idx = np.arange(n)
        for col in value_cols:
            arr = combine(g[col])
            if arr.null_count == 0:
                continue
            valid = ~pc.is_null(arr).to_numpy(zero_copy_only=False)
            if direction == "forward":
                lv = np.maximum.accumulate(np.where(valid, idx, -1))
                ok = lv >= seg_lo
            else:
                lv_r = np.maximum.accumulate(
                    np.where(valid[::-1], idx, -1))
                lv = (n - 1) - lv_r[::-1]             # next valid >= i
                ok = lv < seg_lo + np.repeat(lens, lens)
            filled = arr.take(pa.array(np.where(ok, lv, 0)))
            filled = pc.if_else(pa.array(ok), filled,
                                pa.scalar(None, arr.type))
            g = g.set_column(g.column_names.index(col),
                             pa.field(col, arr.type), filled)
        return g

    ff.__name__ = "ffill_group"
    return _group_partition(ds, keys, num_partitions) \
        .groupby(_GPART).map_groups(ff, batch_format="pyarrow")


def group_winsorize(ds, keys: Sequence[str], column: str,
                    lo: float = 0.05, hi: float = 0.95,
                    out_col: Optional[str] = None,
                    interpolation: str = "lower",
                    num_partitions: int = 32):
    """Per-group quantile clipping (winsorization): each value is
    clamped into [q_lo, q_hi] of ITS OWN key group — the outlier-
    trimming feature-prep step (companion to the two-pass normalizers,
    steps/normalize.py). Null values stay null; all-null groups pass
    through unclipped.

    Scale shape: two passes — exact grouped quantiles (ONE partial-row
    shuffle, `grouped_quantile`) yield a groups-sized stats table that
    is BROADCAST-joined back (JoinStep broadcast — the input corpus
    never shuffles), then one vectorized min/max clip kernel.
    """
    from datavec_ray.join import JoinStep
    from datavec_ray.util import dataset_to_table

    out_col = out_col or f"{column}_w"
    keys = list(keys)
    stats = dataset_to_table(grouped_quantile(
        ds, keys, column, [lo, hi], ["__wlo", "__whi"],
        num_partitions, interpolation))
    joined = JoinStep(stats, keys, join_type="LeftOuter",
                      broadcast=True).apply_dataset(ds)

    def clip(b: pa.Table) -> pa.Table:
        v = combine(b[column]).cast(pa.float64())
        w = pc.min_element_wise(pc.max_element_wise(v, combine(b["__wlo"])),
                                combine(b["__whi"]))
        w = pc.if_else(pc.is_null(v), pa.scalar(None, pa.float64()), w)
        return b.drop_columns(["__wlo", "__whi"]).append_column(
            pa.field(out_col, pa.float64()), w)

    return joined.map_batches(clip, batch_format="pyarrow")


def quantile_bucket(ds, keys: Sequence[str], column: str,
                    n_buckets: int, out_col: Optional[str] = None,
                    num_partitions: int = 32):
    """Per-group equi-depth discretization: each value is assigned the
    bucket 0..n-1 of ITS OWN key group's quantile grid — bucket =
    number of interior thresholds (inverted-CDF ``quantile_disc(j/n)``,
    j = 1..n-1) at or below the value. Deterministic under ties
    (repeated thresholds collapse buckets, exactly as the SQL mirror
    counts them); nulls stay null. The classic feature-discretization
    step (equal-frequency binning).

    Shape: exact grouped quantiles (ONE partial-row shuffle) →
    groups-sized threshold table broadcast-joined back (the corpus
    never shuffles) → one vectorized comparison-sum kernel.
    """
    from datavec_ray.join import JoinStep
    from datavec_ray.util import dataset_to_table

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    out_col = out_col or f"{column}_bucket"
    keys = list(keys)
    qs = [j / n_buckets for j in range(1, n_buckets)]
    names = [f"__qb{j}" for j in range(1, n_buckets)]
    stats = dataset_to_table(grouped_quantile(
        ds, keys, column, qs, names, num_partitions))
    joined = JoinStep(stats, keys, join_type="LeftOuter",
                      broadcast=True).apply_dataset(ds)

    def assign(b: pa.Table) -> pa.Table:
        v = combine(b[column]).cast(pa.float64())
        bucket = np.zeros(len(v), dtype=np.int64)
        for nm in names:
            ge = pc.fill_null(
                pc.greater_equal(v, combine(b[nm])), False)
            bucket += ge.to_numpy(zero_copy_only=False).astype(np.int64)
        col = pc.if_else(pc.is_null(v), pa.scalar(None, pa.int64()),
                         pa.array(bucket))
        return b.drop_columns(names).append_column(
            pa.field(out_col, pa.int64()), col)

    return joined.map_batches(assign, batch_format="pyarrow")


def grouped_top_values(ds, keys: Sequence[str], value_col: str,
                       n: int, num_partitions: int = 32):
    """Top-``n`` most frequent non-null values per key group (SQL
    ``QUALIFY row_number() OVER (PARTITION BY keys ORDER BY cnt DESC,
    value ASC) <= n``) — the per-group heavy-hitters report (e.g. the
    dominant tools per conversation, top languages per source).
    Deterministic: ties broken by the smaller value. Output: keys +
    value + cnt + rk (1-based rank).

    Same scale shape as :func:`grouped_mode`: a map-side (key, value)
    count combiner bounds the ONE shuffle by per-batch-distinct pairs;
    the per-partition final merges counts and ranks every key segment
    with one lexsort — no Python per group.
    """
    keys = list(keys)

    def _partial(batch: pa.Table) -> pa.Table:
        b = batch.replace_schema_metadata(None) \
            .filter(pc.is_valid(batch[value_col]))
        g = b.select(keys + [value_col]) \
            .group_by(keys + [value_col], use_threads=False) \
            .aggregate([([], "count_all")])
        return g.rename_columns(keys + [value_col, "__cnt"])

    def _final(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(c, "ascending") for c in keys + [value_col]])
        m = g.num_rows
        if m == 0:
            out = g.drop_columns(["__cnt"])
            out = out.append_column(pa.field("cnt", pa.int64()),
                                    pa.array([], pa.int64()))
            return out.append_column(pa.field("rk", pa.int64()),
                                     pa.array([], pa.int64()))
        pair_starts = np.flatnonzero(_key_run_starts(g, keys + [value_col]))
        cnt = np.add.reduceat(
            combine(g["__cnt"]).to_numpy(zero_copy_only=False)
            .astype(np.int64), pair_starts)
        u = g.take(pa.array(pair_starts, pa.int64()))
        # rank within each key segment by (cnt desc, value-order asc):
        # u is already value-sorted within key, so a stable argsort on
        # -cnt within segments preserves the value tie-break
        seg = np.flatnonzero(_key_run_starts(u, keys))
        seg_id = np.cumsum(_key_run_starts(u, keys)) - 1
        order = np.lexsort((-cnt, seg_id))     # stable: value order kept
        sizes = np.diff(np.append(seg, len(cnt)))
        rk = (np.arange(len(cnt), dtype=np.int64)
              - np.repeat(seg, sizes))
        keep_order = order[rk < n]
        rk_kept = rk[rk < n] + 1
        win = u.take(pa.array(keep_order, pa.int64())) \
            .drop_columns(["__cnt"])
        win = win.append_column(pa.field("cnt", pa.int64()),
                                pa.array(cnt[keep_order]))
        return win.append_column(pa.field("rk", pa.int64()),
                                 pa.array(rk_kept))

    _final.__name__ = "grouped_top_values"
    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return _group_partition(partials, keys, num_partitions) \
        .groupby(_GPART).map_groups(_final, batch_format="pyarrow")


def grouped_mode(ds, keys: Sequence[str], value_col: str,
                 out_col: str = "mode", num_partitions: int = 32):
    """Most frequent non-null ``value_col`` per key group (SQL
    ``mode()``), made deterministic: ties broken by the SMALLEST value.
    Output: keys + ``out_col`` + ``cnt`` (the winning count, int64).

    Scale shape: a map-side combiner counts (keys, value) pairs per
    batch with one Acero ``group_by`` — the ONE shuffle moves at most
    per-batch-distinct (key, value) partial rows, never raw data; the
    per-partition final merges counts and picks each key's winner with
    a segmented argmax (first-max-in-value-order = smallest tied value),
    no Python per group.
    """
    keys = list(keys)

    def _partial(batch: pa.Table) -> pa.Table:
        b = batch.replace_schema_metadata(None) \
            .filter(pc.is_valid(batch[value_col]))
        g = b.select(keys + [value_col]) \
            .group_by(keys + [value_col], use_threads=False) \
            .aggregate([([], "count_all")])
        return g.rename_columns(keys + [value_col, "__cnt"])

    def _final(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(c, "ascending") for c in keys + [value_col]])
        n = g.num_rows
        if n == 0:
            return g.drop_columns(["__cnt"]).rename_columns(
                keys + [out_col]).append_column(
                pa.field("cnt", pa.int64()), pa.array([], pa.int64()))
        # merge partial counts of identical (keys, value) runs
        pair_starts = np.flatnonzero(_key_run_starts(g, keys + [value_col]))
        cnt = np.add.reduceat(
            combine(g["__cnt"]).to_numpy(zero_copy_only=False)
            .astype(np.int64), pair_starts)
        u = g.take(pa.array(pair_starts, pa.int64()))  # unique pairs
        key_starts_mask = _key_run_starts(u, keys)
        seg = np.flatnonzero(key_starts_mask)
        segs_end = np.append(seg[1:], len(cnt))
        best = np.maximum.reduceat(cnt, seg)
        # first index in each segment attaining the max (value-sorted →
        # smallest tied value)
        cand = np.flatnonzero(cnt == np.repeat(best, segs_end - seg))
        first = cand[np.searchsorted(cand, seg)]
        win = u.take(pa.array(first, pa.int64()))
        out = win.select(keys)
        out = out.append_column(pa.field(out_col, win[value_col].type),
                                combine(win[value_col]))
        return out.append_column(pa.field("cnt", pa.int64()),
                                 pa.array(cnt[first]))

    _final.__name__ = "grouped_mode"
    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return _group_partition(partials, keys, num_partitions) \
        .groupby(_GPART).map_groups(_final, batch_format="pyarrow")


def render_conversations(ds, key: str = "conv_id",
                         order_cols: Sequence[str] = ("turn_idx",),
                         role_col: str = "role", text_col: str = "text",
                         role_sep: str = ": ", turn_sep: str = "\n",
                         out_col: str = "rendered",
                         num_partitions: int = 32):
    """Assemble per-turn transcript rows into ONE training text per
    conversation — the SFT/ChatML-style formatting step of an LLM data
    pipeline (``role: text`` per turn, turns joined by ``turn_sep`` in
    ``order_cols`` order). SQL: ``string_agg(role || ': ' || text,
    sep ORDER BY order_cols) GROUP BY key``.

    Shape: ONE hash-partition shuffle on the conversation key; per
    partition one sort, one vectorized Arrow concat for the per-turn
    parts, then polars' Rust group-join for the per-conversation join
    (no Python per row/group). Output: (key, out_col, n_turns).
    """
    import polars as pl

    key_cols = [key]
    sort_cols = key_cols + list(order_cols)

    def render(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(c, "ascending") for c in sort_cols])
        part = pc.binary_join_element_wise(
            pc.fill_null(combine(g[role_col]).cast(pa.string()), ""),
            pc.fill_null(combine(g[text_col]).cast(pa.string()), ""),
            role_sep)
        df = pl.DataFrame({key: pl.Series(combine(g[key])),
                           "part": pl.Series(part)})
        out = df.group_by(key, maintain_order=True).agg(
            pl.col("part").str.join(turn_sep).alias(out_col),
            pl.len().alias("n_turns"))
        t = out.to_arrow()
        # polars emits large_string; normalize for stable schemas
        return pa.table({
            key: t[key].cast(pa.string()) if pa.types.is_large_string(
                t.schema.field(key).type) else t[key],
            out_col: t[out_col].cast(pa.string()),
            "n_turns": t["n_turns"].cast(pa.int64()),
        })

    render.__name__ = "render_conversations"
    return _group_partition(ds, key_cols, num_partitions) \
        .groupby(_GPART).map_groups(render, batch_format="pyarrow")


def negative_samples(ds, id_col: str, n_items: int, k: int,
                     seed: int = 0):
    """Deterministic negative sampling for contrastive training: each
    anchor row emits ``k`` rows (anchor, slot, neg_id) with ``neg_id =
    splitmix64(anchor·1000003 + slot, seed) mod n_items``, bumped by
    one (mod n) when it collides with the anchor. A pure function of
    the data — reproducible across reruns, partitionings and engines
    (the oracle reproduces splitmix64 in SQL) — so a resumed training
    run regenerates identical pairs. Requires dense ids [0, n_items).
    Shuffle-free: one flat map, k·rows output.
    """
    if k < 1 or n_items < 2:
        raise ValueError("need k >= 1 and n_items >= 2")

    def nm(batch: pa.Table) -> pa.Table:
        a = combine(batch[id_col]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        A = np.repeat(a, k)
        slot = np.tile(np.arange(k, dtype=np.int64), len(a))
        with np.errstate(over="ignore"):
            key = A * np.int64(1000003) + slot
        u = hash64(key, seed)
        neg = (u % np.uint64(n_items)).astype(np.int64)
        neg = np.where(neg == A, (neg + 1) % n_items, neg)
        return pa.table({"anchor": pa.array(A), "slot": pa.array(slot),
                         "neg_id": pa.array(neg)})

    nm.__name__ = "negative_samples"
    return ds.map_batches(nm, batch_format="pyarrow")


def turn_offsets(ds, key: str = "conv_id",
                 order_cols: Sequence[str] = ("turn_idx",),
                 role_col: str = "role", text_col: str = "text",
                 role_sep: str = ": ", turn_sep: str = "\n",
                 target_role: str = "assistant",
                 num_partitions: int = 32):
    """Loss-mask span offsets for SFT training prep: for every turn,
    the [start_off, end_off) CHARACTER range its ``role: text`` part
    occupies inside the conversation text `render_conversations`
    assembles (same format, same order), plus ``is_target`` (the turns
    whose spans train — typically the assistant's). A tokenizer
    consumes the rendered text and these spans to build labels without
    re-parsing. SQL: running ``sum(length(part) + len(sep))`` window.

    Shape: ONE conversation-key shuffle; per partition one sort + one
    vectorized length pass + a segmented exclusive cumsum.
    """
    sort_cols = [key] + list(order_cols)
    sep_len = len(turn_sep)

    def offs(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(c, "ascending") for c in sort_cols])
        n = g.num_rows
        if n == 0:
            g = g.append_column(pa.field("start_off", pa.int64()),
                                pa.array([], pa.int64()))
            g = g.append_column(pa.field("end_off", pa.int64()),
                                pa.array([], pa.int64()))
            return g.append_column(pa.field("is_target", pa.bool_()),
                                   pa.array([], pa.bool_()))
        part = pc.binary_join_element_wise(
            pc.fill_null(combine(g[role_col]).cast(pa.string()), ""),
            pc.fill_null(combine(g[text_col]).cast(pa.string()), ""),
            role_sep)
        plen = pc.utf8_length(part).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        total = plen + sep_len
        c = np.cumsum(total)
        excl = c - total                       # chars before this part
        seg_starts = np.flatnonzero(_key_run_starts(g, [key]))
        lens = np.diff(np.append(seg_starts, n))
        start = excl - np.repeat(excl[seg_starts], lens)
        g = g.append_column(pa.field("start_off", pa.int64()),
                            pa.array(start))
        g = g.append_column(pa.field("end_off", pa.int64()),
                            pa.array(start + plen))
        return g.append_column(
            pa.field("is_target", pa.bool_()),
            pc.fill_null(pc.equal(combine(g[role_col]), target_role),
                         False))

    offs.__name__ = "turn_offsets"
    return _group_partition(ds, [key], num_partitions) \
        .groupby(_GPART).map_groups(offs, batch_format="pyarrow")


def role_alternation_stats(ds, key: str = "conv_id",
                           order_cols: Sequence[str] = ("turn_idx",),
                           role_col: str = "role",
                           num_partitions: int = 32):
    """Transcript QA: per conversation, count adjacent SAME-role turn
    pairs (a well-formed user/assistant dialogue alternates, so
    ``n_repeats > 0`` flags merge artifacts or dropped turns). SQL:
    ``sum(case when role = lag(role) over (partition by key order by
    order_cols) then 1 else 0 end)``.

    ONE key shuffle; per partition one sort + one vectorized
    shifted-equality + segmented bincount over all groups at once.
    Output: (key, n_turns, n_repeats).
    """
    sort_cols = [key] + list(order_cols)

    def stats(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(c, "ascending") for c in sort_cols])
        n = g.num_rows
        if n == 0:
            return pa.table({key: g[key],
                             "n_turns": pa.array([], pa.int64()),
                             "n_repeats": pa.array([], pa.int64())})
        new_grp = _key_run_starts(g, [key])
        role = combine(g[role_col])
        same = np.zeros(n, dtype=bool)
        if n > 1:
            eq = pc.fill_null(pc.equal(role.slice(0, n - 1), role.slice(1)),
                              False).to_numpy(zero_copy_only=False)
            same[1:] = eq & ~new_grp[1:]
        gid = np.cumsum(new_grp) - 1
        n_groups = int(gid[-1]) + 1
        n_turns = np.bincount(gid, minlength=n_groups)
        n_rep = np.bincount(gid, weights=same, minlength=n_groups)
        keys = combine(g[key]).take(
            pa.array(np.flatnonzero(new_grp), pa.int64()))
        return pa.table({key: keys,
                         "n_turns": pa.array(n_turns, pa.int64()),
                         "n_repeats": pa.array(n_rep.astype(np.int64))})

    stats.__name__ = "role_alternation_stats"
    return _group_partition(ds, [key], num_partitions) \
        .groupby(_GPART).map_groups(stats, batch_format="pyarrow")


_ROLLUP_OPS = {"Sum": ("sum", "sum"), "Count": ("count", "sum"),
               "Min": ("min", "min"), "Max": ("max", "max")}


def rollup_agg(ds, keys: Sequence[str], aggs: Sequence[Sequence[str]],
               sets: Optional[Sequence[Sequence[str]]] = None,
               num_partitions: int = 32):
    """Multi-level aggregation in ONE pass — SQL ``GROUP BY ROLLUP
    (keys)`` (default) or arbitrary ``GROUPING SETS`` via ``sets``.
    ``aggs`` rows are ``(column, op, out_name)`` with op in
    Sum/Count/Min/Max (Count counts non-null values of ``column``).
    Rolled-up key columns are emitted NULL, as in SQL.

    Scale shape: the map-side combiner aggregates EVERY grouping set
    per batch (one vectorized Acero ``group_by`` per set), so the ONE
    hash-partition shuffle moves at most |sets| x per-batch-distinct
    keys partial rows — never raw data; the final per-partition merge
    is again one Acero ``group_by`` (nulls group together, giving the
    rolled-up rows for free). This is how a 100 TB "per-(lang,source) +
    per-lang + grand-total" report runs as a single job instead of
    |sets| separate groupbys over the corpus.
    """
    keys = list(keys)
    if sets is None:                       # ROLLUP: prefixes, longest first
        sets = [keys[:i] for i in range(len(keys), -1, -1)]
    sets = [list(s) for s in sets]
    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s} not a subset of {keys}")
    aggs = [tuple(a) for a in aggs]
    for _, op, _ in aggs:
        if op not in _ROLLUP_OPS:
            raise ValueError(f"op must be one of {sorted(_ROLLUP_OPS)}")

    schema = ds.schema().base_schema
    key_types = {k: schema.field(k).type for k in keys}

    def _partial(batch: pa.Table) -> pa.Table:
        outs = []
        for gi, s in enumerate(sets):
            if s:
                g = batch.group_by(s).aggregate(
                    [(c, _ROLLUP_OPS[op][0]) for c, op, _ in aggs])
                cols = {}
                for k in keys:
                    cols[k] = (g[k] if k in s
                               else pa.nulls(g.num_rows, key_types[k]))
                for c, op, nm in aggs:
                    cols[nm] = g[f"{c}_{_ROLLUP_OPS[op][0]}"] \
                        .cast(pa.int64() if op == "Count" else
                              g[f"{c}_{_ROLLUP_OPS[op][0]}"].type)
            else:                          # grand total: no group_by([])
                cols = {k: pa.nulls(1, key_types[k]) for k in keys}
                for c, op, nm in aggs:
                    col = combine(batch[c])
                    if op == "Count":
                        v = pa.array([len(col) - col.null_count], pa.int64())
                    elif op == "Sum":
                        v = pa.array([pc.sum(col).as_py()], from_pandas=True)
                    elif op == "Min":
                        v = pa.array([pc.min(col).as_py()], col.type,
                                     from_pandas=True)
                    else:
                        v = pa.array([pc.max(col).as_py()], col.type,
                                     from_pandas=True)
                    cols[nm] = v
            t = pa.table(cols)
            outs.append(t.append_column(
                pa.field("__gset", pa.int8()),
                pa.nulls(t.num_rows, pa.int8()).fill_null(gi)))
        out = pa.concat_tables(outs, promote_options="permissive")
        return out

    def _final(group: pa.Table) -> pa.Table:
        # merge partials with sort + run detection (`_key_run_starts`,
        # nulls equal) instead of Acero group_by: worker-side blocks
        # arrive as exotic chunk/slice layouts on which Acero's hash
        # grouping was observed to split null-keyed groups (duplicate
        # (key, NULL) output rows); the sort path is layout-independent.
        gkeys = ["__gset"] + keys
        g = group.drop_columns([_GPART]).sort_by(
            [(k, "ascending") for k in gkeys])
        n = g.num_rows
        agg_names = [nm for _, _, nm in aggs]
        if n == 0:
            return g.select(keys + agg_names)
        starts = np.flatnonzero(_key_run_starts(g, gkeys))
        take = pa.array(starts, pa.int64())
        cols = {k: combine(g[k]).take(take) for k in keys}
        for _, op, nm in aggs:
            arr = combine(g[nm])
            isnull = pc.is_null(arr).to_numpy(zero_copy_only=False)
            merge = _ROLLUP_OPS[op][1]
            np_dtype = np.dtype(arr.type.to_pandas_dtype())
            is_int = np.issubdtype(np_dtype, np.integer)
            if merge == "sum":
                sent = 0
            elif merge == "min":
                sent = np.iinfo(np_dtype).max if is_int else np.inf
            else:
                sent = np.iinfo(np_dtype).min if is_int else -np.inf
            vals = pc.fill_null(arr, sent).to_numpy(zero_copy_only=False)
            red = {"sum": np.add, "min": np.minimum,
                   "max": np.maximum}[merge]
            out = red.reduceat(vals, starts)
            valid = np.add.reduceat((~isnull).astype(np.int64), starts)
            res = pa.array(out).cast(arr.type)
            if (valid == 0).any():          # all-null group stays NULL
                res = pc.if_else(pa.array(valid == 0),
                                 pa.nulls(len(starts), arr.type), res)
            cols[nm] = res
        return pa.table(cols)

    _final.__name__ = "rollup_final"
    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return _group_partition(partials, ["__gset"] + keys, num_partitions) \
        .groupby(_GPART).map_groups(_final, batch_format="pyarrow")


def time_resample(ds, keys: Sequence[str], ts_col: str, value_col: str,
                  step_ms: int, method: str = "linear",
                  out_ts_col: str = "ts_ms", num_partitions: int = 32):
    """Per-key regular-grid time resampling with gap fill — the
    missing-timestep repair stage of a sensor/metrics pipeline (SQL:
    ``generate_series`` grid + two ASOF joins + linear interpolation).
    For each key group, emits one row per grid point ``t = i·step_ms``
    covering ``[ceil(min_ts/step)·step, floor(max_ts/step)·step]`` —
    every grid point lies between two observations, so no extrapolation
    policy is needed. ``method="linear"`` interpolates between the
    bracketing observations; ``"locf"`` carries the last observation
    forward. Duplicate timestamps within a key are first reduced to
    MAX(value) (deterministic under any partitioning; mirror it in the
    oracle).

    Scale shape: one per-batch (keys, ts) MAX combiner bounds the
    shuffle at per-batch-distinct observation rows; then ONE
    hash-partition exchange and, per partition, one sort + ONE global
    ``searchsorted`` pair over segment-biased EXACT int64 timestamps
    (same discipline as ``range_window_agg``; per-segment fallback
    beyond the 2^62 bias bound). The grid itself is materialized
    directly from per-segment counts (repeat/cumsum), never a Python
    loop per key.

    Interpolation float-op order is fixed and mirrored in SQL —
    ``pv + (nv − pv) · (double(t − pt) / double(nt − pt))`` over exact
    int64 ms — so results are bit-identical to the DuckDB oracle."""
    from datavec_ray.reduce import Reducer

    if method not in ("linear", "locf"):
        raise ValueError("method must be 'linear' or 'locf'")
    keys = list(keys)
    step = int(step_ms)
    if step <= 0:
        raise ValueError("step_ms must be positive")

    def to_points(b: pa.Table) -> pa.Table:
        t = b[ts_col]
        if pa.types.is_timestamp(t.type):
            t = pc.cast(pc.cast(t, pa.timestamp("ms"), safe=False),
                        pa.int64())
        else:
            t = pc.cast(t, pa.int64())
        tbl = b.select(keys)
        tbl = tbl.append_column(pa.field("__t", pa.int64()), t)
        tbl = tbl.append_column(pa.field("__v", pa.float64()),
                                pc.cast(b[value_col], pa.float64()))
        tbl = tbl.filter(pc.is_valid(tbl["__v"]))
        return tbl.group_by(keys + ["__t"]).aggregate([("__v", "max")]) \
            .rename_columns(keys + ["__t", "__v"])

    pts = ds.map_batches(to_points, batch_format="pyarrow")
    pts = Reducer(keys + ["__t"], [["__v", "Max", "__v"]]).apply_dataset(pts)

    def resample(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(k, "ascending") for k in keys] + [("__t", "ascending")])
        n = g.num_rows
        empty = {k: pa.array([], g.schema.field(k).type) for k in keys}
        empty[out_ts_col] = pa.array([], pa.int64())
        empty[value_col] = pa.array([], pa.float64())
        if n == 0:
            return pa.table(empty)
        t = g["__t"].to_numpy(zero_copy_only=False)
        v = g["__v"].to_numpy(zero_copy_only=False)
        run_starts = _key_run_starts(g.select(keys), keys)
        starts = np.flatnonzero(run_starts)
        ends = np.append(starts[1:], n)
        tmin, tmax = t[starts], t[ends - 1]
        gmin = -(-tmin // step) * step          # ceil to grid
        gmax = (tmax // step) * step            # floor to grid
        cnt = np.maximum((gmax - gmin) // step + 1, 0)
        total = int(cnt.sum())
        if total == 0:
            return pa.table(empty)
        seg_of_grid = np.repeat(np.arange(len(starts)), cnt)
        offs = np.arange(total, dtype=np.int64) \
            - np.repeat(np.concatenate(([0], np.cumsum(cnt[:-1]))), cnt)
        gt = np.repeat(gmin, cnt) + offs * step
        # segment-biased exact int64 binary search (range_window_agg
        # discipline); per-segment fallback beyond the bias bound
        tshift = t - t.min()
        span = int(tshift.max()) + 1
        seg_of_pt = np.cumsum(run_starts) - 1
        if len(starts) <= (2 ** 62) // max(span, 1):
            tt = seg_of_pt * np.int64(span) + tshift
            gg = seg_of_grid * np.int64(span) + (gt - t.min())
            ip = np.searchsorted(tt, gg, side="right") - 1
            inx = np.searchsorted(tt, gg, side="left")
        else:
            ip = np.empty(total, np.int64)
            inx = np.empty(total, np.int64)
            gb = np.concatenate(([0], np.cumsum(cnt)))
            for si, (a, b) in enumerate(zip(starts, ends)):
                lo, hi = gb[si], gb[si + 1]
                ip[lo:hi] = a + np.searchsorted(
                    t[a:b], gt[lo:hi], side="right") - 1
                inx[lo:hi] = a + np.searchsorted(
                    t[a:b], gt[lo:hi], side="left")
        pt_, nt_ = t[ip], t[inx]
        pv, nv = v[ip], v[inx]
        if method == "locf":
            val = pv
        else:
            same = nt_ == pt_
            with np.errstate(invalid="ignore", divide="ignore"):
                frac = (gt - pt_).astype(np.float64) \
                    / (nt_ - pt_).astype(np.float64)
                val = np.where(same, pv, pv + (nv - pv) * frac)
        cols = {k: combine(g[k]).take(pa.array(starts[seg_of_grid],
                                               pa.int64()))
                for k in keys}
        cols[out_ts_col] = pa.array(gt)
        cols[value_col] = pa.array(val)
        return pa.table(cols)

    resample.__name__ = "time_resample"
    return _group_partition(pts, keys, num_partitions) \
        .groupby(_GPART).map_groups(resample, batch_format="pyarrow")


def mad_outliers(ds, keys: Sequence[str], column: str, k: float = 3.0,
                 out_col: str = "is_outlier", summary: bool = False,
                 num_partitions: int = 32):
    """Per-group robust outlier detection by median absolute deviation:
    a row is an outlier when ``|x − median(x)| > k · MAD`` with MAD =
    ``median(|x − median(x)|)`` over the row's OWN key group — the
    Hampel identifier, the robust companion to z-score trimming
    (group_winsorize), insensitive to the very outliers it flags.
    SQL mirror: DuckDB ``quantile_cont`` median/MAD.

    Scale shape: ONE hash-partition exchange (the exact-median floor —
    raw values must co-locate per key once); within a partition a
    single sort resolves EVERY group's median, |x−median| re-sorts
    once more segment-locally, and flags/summaries emit in place — no
    second shuffle, no broadcast joins (the first version spent two
    quantile exchanges plus two joins on the same answer).

    Null values are never outliers and contribute 0 to the flag count
    (mirrors ``CASE WHEN abs(x−m) > k·mad THEN 1 ELSE 0 END``)."""
    keys = list(keys)
    k = float(k)

    def _med_of_sorted(vals: np.ndarray, starts: np.ndarray,
                       counts: np.ndarray) -> np.ndarray:
        """Per-segment quantile_cont(0.5) over segment-sorted values
        (NaNs sorted last; counts = valid values per segment)."""
        m = counts
        h = 0.5 * np.maximum(m - 1, 0)
        lo = np.floor(h).astype(np.int64)
        frac = h - lo
        hi = np.minimum(lo + 1, np.maximum(m - 1, 0))
        med = vals[starts + lo] * (1.0 - frac) + vals[starts + hi] * frac
        med[m == 0] = np.nan
        return med

    def per_partition(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(kk, "ascending") for kk in keys] + [(column, "ascending")])
        n = g.num_rows
        vals = combine(g[column]).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        run_starts = _key_run_starts(g.select(keys), keys)
        starts = np.flatnonzero(run_starts)
        sizes = np.diff(np.append(starts, n))
        valid = np.add.reduceat((~np.isnan(vals)).astype(np.int64),
                                starts) if n else np.zeros(0, np.int64)
        med_seg = _med_of_sorted(vals, starts, valid)
        seg = np.cumsum(run_starts) - 1
        med = med_seg[seg] if n else np.empty(0)
        with np.errstate(invalid="ignore"):
            ad = np.abs(vals - med)
        # per-segment sort of ad (NaNs last) via one biased argsort
        order = np.lexsort((ad, seg)) if n else np.empty(0, np.int64)
        mad_seg = _med_of_sorted(ad[order], starts, valid)
        mad = mad_seg[seg] if n else np.empty(0)
        with np.errstate(invalid="ignore"):
            flag = ad > k * mad                 # NaN compares False
        if not summary:
            out = g.append_column(pa.field("__med", pa.float64()),
                                  pa.array(med, from_pandas=True))
            out = out.append_column(pa.field("__mad", pa.float64()),
                                    pa.array(mad, from_pandas=True))
            return out.append_column(pa.field(out_col, pa.bool_()),
                                     pa.array(flag))
        n_out = np.add.reduceat(flag.astype(np.int64), starts) if n \
            else np.zeros(0, np.int64)
        cols = {kk: combine(g[kk]).take(pa.array(starts, pa.int64()))
                for kk in keys}
        cols["n"] = pa.array(valid)
        cols["n_outliers"] = pa.array(n_out)
        cols["median"] = pa.array(med_seg, pa.float64(), from_pandas=True)
        cols["mad"] = pa.array(mad_seg, pa.float64(), from_pandas=True)
        return pa.table(cols)

    per_partition.__name__ = "mad_outliers"
    return _group_partition(ds, keys, num_partitions) \
        .groupby(_GPART).map_groups(per_partition, batch_format="pyarrow")
def table_digest(ds, cols: Sequence[str], mode: str = "portable") -> dict:
    """Order-insensitive whole-table digest — the streaming equality
    check for CDC replay verification ("does the replayed lake equal
    the oracle state?") that never materializes or sorts either table:
    digest(T) = Σ_rows rowhash(serialized row) mod 2⁶⁴, so two tables
    are equal (up to rowhash collisions, ≤ n²/2⁶⁵) iff counts and
    digests match, under ANY partitioning and row order.

    ``mode="portable"``: rowhash = low 64 bits of md5 over the
    canonical serialization ``coalesce(col, chr(0)) ... joined by
    chr(31)`` with ints/timestamps(ms) rendered in decimal — EXACTLY
    mirrorable in SQL as ``sum(md5_number_lower(serialized)) %
    18446744073709551616`` (md5 is per-row C work, the price of
    cross-engine portability; contract covers int/string/timestamp
    columns — floats have no canonical cross-engine decimal rendering).
    ``mode="fast"``: rowhash = the engine's vectorized hash64 chain
    (splitmix/polars) — no Python per row, for engine-to-engine lake
    comparisons (not SQL-checkable).

    Scale shape: one shuffle-free column-pruned pass; each block emits
    ONE (count, partial-digest) row; the driver wrap-sums block
    partials. Returns {"n": int, "digest": int}.
    """
    import hashlib

    cols = list(cols)
    if mode not in ("portable", "fast"):
        raise ValueError("mode must be 'portable' or 'fast'")

    def serialize(b: pa.Table) -> list:
        parts = []
        for c in cols:
            col = combine(b[c])
            t = col.type
            if pa.types.is_timestamp(t):
                col = pc.cast(pc.cast(col, pa.timestamp("ms"), safe=False),
                              pa.int64())
                t = col.type
            if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
                col = pc.cast(col, pa.string())
            parts.append(pc.fill_null(col, "\x00"))
        return pc.binary_join_element_wise(*parts, "\x1f") if len(parts) > 1 \
            else parts[0]

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "d": pa.array([], pa.uint64())})
        s = serialize(b)
        if mode == "fast":
            h = hash64(s)
        else:
            h = np.fromiter(
                (int.from_bytes(
                    hashlib.md5(v.encode("utf-8")).digest()[8:16],
                    "little")
                 for v in s.to_pylist()),
                np.uint64, len(s))
        with np.errstate(over="ignore"):
            d = np.uint64(np.add.reduce(h))    # wraps mod 2^64 by design
        return pa.table({"n": pa.array([b.num_rows], pa.int64()),
                         "d": pa.array([d], pa.uint64())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    total = 0
    n = 0
    for r in rows:
        n += int(r["n"])
        total = (total + int(r["d"])) % (1 << 64)
    return {"n": n, "digest": total}


def zorder_key(ds, cols: Sequence[str], bits: int = 16,
               out_col: str = "zkey"):
    """Morton / Z-order interleaving of the LOW ``bits`` bits of k
    integer columns — the multi-dimensional clustering key: sorting by
    it before a partitioned write co-locates rows close in EVERY listed
    dimension, so min/max file statistics prune multi-column range
    predicates (the Delta/Iceberg OPTIMIZE ZORDER layout trick; hash
    partitioning cannot give this). Pre-bucket continuous values
    upstream (``quantile_bucket`` composes) — the contract is exact bit
    arithmetic on non-negative ints, mirrorable in SQL term for term.

    Bit j of column i lands at position ``j·k + i``; requires
    ``bits·k ≤ 62``. One vectorized shift/mask pass per batch, no
    shuffle."""
    cols = list(cols)
    k = len(cols)
    if k < 1:
        raise ValueError("zorder_key needs at least one column")
    if bits * k > 62:
        raise ValueError(f"bits*k = {bits * k} exceeds int64 capacity")

    def zk(b: pa.Table) -> pa.Table:
        z = np.zeros(b.num_rows, np.int64)
        for i, c in enumerate(cols):
            v = combine(b[c]).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            if (v < 0).any():
                raise ValueError(f"zorder_key column {c!r} has negative "
                                 "values; shift/bucket upstream")
            for j in range(bits):
                z |= ((v >> j) & 1) << (j * k + i)
        return b.append_column(pa.field(out_col, pa.int64()),
                               pa.array(z))

    zk.__name__ = "zorder_key"
    return ds.map_batches(zk, batch_format="pyarrow")


def transition_counts(ds, keys: Sequence[str], order_col: str,
                      state_col: str, tiebreak: Optional[str] = None,
                      num_partitions: int = 32):
    """Global Markov TRANSITION MATRIX of a state column over ordered
    key groups: one row per (from_state, to_state) with the count of
    adjacent occurrences across all groups — conversation role-flow /
    tool-flow analysis (who speaks after whom, which tool follows
    which). SQL: ``lag(state) OVER (PARTITION BY keys ORDER BY
    order_col)`` then GROUP BY.

    Scale shape: ONE hash-partition exchange on the keys; per partition
    one sort + a shifted-array pair scan over ALL groups at once, then
    an in-partition Arrow ``group_by`` combine — only (from, to, n)
    partials (≤ states² per partition) reach the tiny final Sum."""
    from datavec_ray.reduce import Reducer

    keys = list(keys)
    sort_cols = keys + [order_col] + ([tiebreak] if tiebreak else [])

    def per_partition(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(c, "ascending") for c in sort_cols])
        n = g.num_rows
        empty = pa.table({"from_state": pa.array([], pa.string()),
                          "to_state": pa.array([], pa.string()),
                          "__c": pa.array([], pa.int64())})
        if n < 2:
            return empty
        st = combine(g[state_col]).cast(pa.string())
        same_key = ~_key_run_starts(g.select(keys), keys)   # row i pairs
        # with row i-1 iff same key group
        mask = same_key[1:]
        if not mask.any():
            return empty
        frm = st.slice(0, n - 1).filter(pa.array(mask))
        to = st.slice(1).filter(pa.array(mask))
        t = pa.table({"from_state": frm, "to_state": to})
        t = t.append_column(pa.field("__c", pa.int64()),
                            pa.array(np.ones(t.num_rows, np.int64)))
        return t.group_by(["from_state", "to_state"]).aggregate(
            [("__c", "sum")]).rename_columns(
            ["from_state", "to_state", "__c"])

    per_partition.__name__ = "transition_counts"
    partials = _group_partition(ds, keys, num_partitions) \
        .groupby(_GPART).map_groups(per_partition, batch_format="pyarrow")
    return Reducer(["from_state", "to_state"],
                   [["__c", "Sum", "n"]]).apply_dataset(partials)


def merge_intervals(ds, keys: Sequence[str], start_col: str, end_col: str,
                    min_gap: int = 0, count_col: str = "n",
                    num_partitions: int = 32):
    """Coalesce overlapping/adjacent intervals per key group — the
    gaps-and-islands operator: within each ``keys`` group, intervals
    sorted by (start, end) merge while ``start <= max(prior ends) +
    min_gap``; each island emits (keys, min start, max end, interval
    count). Touching intervals (start == prior end) merge; rows with a
    null start or end are dropped (SQL comparison semantics). Classic
    uses: availability/visit-span consolidation, duplicated-substring
    span unions (composes with substring_dedup), retention-window
    planning. SQL mirror: ``max(end) OVER (... ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` + a windowed island counter.

    Scale shape: ONE key-hash exchange (`_group_partition` — per-
    partition calls, never per key), then per partition one sort + one
    vectorized island scan over ALL groups at once: per-segment running
    max is computed exactly via RANK-space segment biasing (start and
    gap-shifted end values are mapped to their sorted-union ranks, so
    ``seg_id * (n_ranks+1)`` never overflows int64 regardless of the
    raw value range — the lesson of range_window_agg's float-bias bug),
    and island aggregates are ``np.maximum.reduceat`` / take gathers.
    No reference counterpart (DataVec has no interval algebra).
    """
    keys = list(keys)

    def mi(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART])
        ok = pc.and_(pc.is_valid(g[start_col]), pc.is_valid(g[end_col]))
        g = g.filter(ok).sort_by(
            [(c, "ascending") for c in keys + [start_col, end_col]])
        n = g.num_rows
        out_fields = keys + [start_col, end_col, count_col]
        s_arr = combine(g[start_col]) if n else None
        e_arr = combine(g[end_col]) if n else None
        if n == 0:
            sch = pa.schema(
                [group.schema.field(k) for k in keys]
                + [group.schema.field(start_col),
                   group.schema.field(end_col),
                   pa.field(count_col, pa.int64())])
            return sch.empty_table()
        s = s_arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        e = e_arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        e2 = e + int(min_gap)
        # rank space: comparisons preserved, segment bias can't overflow
        uniq, inv = np.unique(np.concatenate([s, e2]), return_inverse=True)
        rs, re = inv[:n], inv[n:]
        seg_id = np.cumsum(_key_run_starts(g, keys)) - 1
        bias = seg_id * np.int64(len(uniq) + 1)
        cm = np.maximum.accumulate(re + bias)
        prev = np.empty(n, dtype=np.int64)
        prev[0] = np.iinfo(np.int64).min
        prev[1:] = cm[:-1]
        new_island = (seg_id != np.concatenate(([-1], seg_id[:-1]))) | \
            ((rs + bias) > prev)
        starts_idx = np.flatnonzero(new_island)
        island_of = np.cumsum(new_island) - 1
        counts = np.bincount(island_of, minlength=len(starts_idx))
        take = pa.array(starts_idx, pa.int64())
        e_max = np.maximum.reduceat(e, starts_idx)
        cols = {k: combine(g[k]).take(take) for k in keys}
        cols[start_col] = s_arr.take(take)
        cols[end_col] = pa.array(e_max).cast(e_arr.type)
        cols[count_col] = pa.array(counts.astype(np.int64))
        return pa.table({f: cols[f] for f in out_fields})

    mi.__name__ = "merge_intervals"
    return _group_partition(ds, keys, num_partitions) \
        .groupby(_GPART).map_groups(mi, batch_format="pyarrow")
