"""Event-stream product analytics: ordered funnels and cohort
retention.

Classic event-table analytics the reference's reduce/sequence ops
don't cover (nearest counterparts: grouped reduce
``reduce/Reducer.java`` and time-ordered sequence ops
``transform/sequence/*.java``, which both lack the cross-event-type
ORDERED chaining a funnel needs). Both ops are SQL-mirrorable so the
driver's DuckDB gate value-checks them end to end.

Scale shapes:

- ``funnel``: ONE hash-partition exchange on the user column (P
  groups, not one per user), then each partition resolves every user
  at once — per step, a two-level vectorized ``searchsorted`` (user
  segment bounds, then strictly-after timestamps) finds each user's
  earliest qualifying event; only S tiny (step, count) partials leave
  the partition.
- ``cohort_retention``: per-batch distinct (user, period) combiner →
  the same single exchange → per-partition cohort (= min period per
  user) + in-partition (cohort, offset) partial counts → one tiny
  final groupby. Raw events cross the wire at most once, already
  deduplicated to (user, period) granularity.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.misc import _GPART, _group_partition


def _ts_ms_np(col: pa.ChunkedArray) -> np.ndarray:
    t = col.type
    if pa.types.is_timestamp(t):
        col = pc.cast(col, pa.timestamp("ms"), safe=False)
    return np.asarray(pc.cast(col, pa.int64()).combine_chunks())


def funnel(ds, steps: Sequence[str], user_col: str = "user_id",
           type_col: str = "event_type", ts_col: str = "ts",
           within_ms: int | None = None, num_partitions: int = 32):
    """Strict-order funnel: a user reaches step k iff events of types
    ``steps[0..k]`` exist with STRICTLY increasing timestamps (each
    step's event is the earliest one after the previous step's —
    greedy-earliest, the standard funnel definition; ties on ts do not
    chain). ``within_ms`` additionally requires each step to land
    within that window of the previous step (conversion windows).
    Returns one row per step:
    ``(step:int64 1-based, event_type, n_users:int64)``.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("funnel needs at least one step")

    def pre(batch: pa.Table) -> pa.Table:
        # prune to funnel-relevant events before the exchange
        keep = pc.is_in(batch[type_col],
                        value_set=pa.array(steps, pa.string()))
        sub = batch.filter(keep)
        return pa.table({
            user_col: sub[user_col],
            type_col: sub[type_col],
            "__ts_ms": pa.array(_ts_ms_np(sub[ts_col]), pa.int64()),
        })

    pruned = ds.map_batches(pre, batch_format="pyarrow",
                            zero_copy_batch=True)
    parts = _group_partition(pruned, [user_col], num_partitions)

    def per_partition(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(user_col, "ascending"), ("__ts_ms", "ascending")])
        counts = np.zeros(len(steps), dtype=np.int64)
        if g.num_rows:
            ts = np.asarray(g["__ts_ms"].combine_chunks())
            et = g[type_col].combine_chunks()
            enc = pc.dictionary_encode(g[user_col].combine_chunks())
            codes = np.asarray(enc.indices).astype(np.int64)
            # frontier: per alive user, the ts of the last completed
            # step; -inf sentinel = "no constraint yet"
            NEG = -(1 << 62)
            uids = np.arange(len(enc.dictionary), dtype=np.int64)
            frontier = np.full(len(uids), NEG, dtype=np.int64)
            base = int(ts.min())
            span = int(ts.max()) - base + 2
            if len(uids) * span >= (1 << 62):  # pragma: no cover
                raise ValueError(
                    "funnel partition exceeds the exact int64 bias bound "
                    "(users x ts-span) — raise num_partitions")
            for k, step in enumerate(steps):
                m = pc.equal(et, step).to_numpy(zero_copy_only=False)
                m = m.astype(bool) if m.dtype != bool else m
                c_k, t_k = codes[m], ts[m]
                # (c_k, t_k) is lexicographically ascending, so
                # biased = code*span + (ts-base) is GLOBALLY ascending:
                # one searchsorted resolves every alive user's earliest
                # step-k event STRICTLY after its frontier (exact int64
                # bias, same discipline as misc.range_window_agg)
                biased = c_k * span + (t_k - base)
                probe = uids * span + np.maximum(
                    frontier - base + 1, 0)
                pos = np.searchsorted(biased, probe, side="left")
                found = pos < len(biased)
                found[found] = c_k[pos[found]] == uids[found]
                if within_ms is not None and k > 0:
                    # greedy-earliest within a conversion window
                    found[found] &= (t_k[pos[found]]
                                     <= frontier[found] + int(within_ms))
                new_frontier = np.full(len(uids), NEG, dtype=np.int64)
                new_frontier[found] = t_k[pos[found]]
                counts[k] = int(found.sum())
                # dead users keep NEG frontiers and can never match a
                # later step's strictly-after probe within their segment
                keep = found
                uids, frontier = uids[keep], new_frontier[keep]
                if not len(uids):
                    break
        return pa.table({
            "step": pa.array(np.arange(1, len(steps) + 1), pa.int64()),
            "event_type": pa.array(steps, pa.string()),
            "n_users": pa.array(counts, pa.int64()),
        })

    partials = parts.groupby(_GPART).map_groups(
        per_partition, batch_format="pyarrow")

    def final(group: pa.Table) -> pa.Table:
        agg = group.group_by(["step", "event_type"],
                             use_threads=False).aggregate(
            [("n_users", "sum")])
        return agg.rename_columns(["step", "event_type", "n_users"])

    return partials.groupby("step").map_groups(final,
                                               batch_format="pyarrow")


def cohort_retention(ds, period_ms: int, user_col: str = "user_id",
                     ts_col: str = "ts", num_partitions: int = 32):
    """Cohort retention matrix: cohort = each user's first-activity
    period (``ts_ms // period_ms``); a user is retained at offset d if
    active in period ``cohort + d``. Returns
    ``(cohort:int64, offset:int64, n_users:int64)``.
    """
    P = np.int64(period_ms)

    def combine_pairs(batch: pa.Table) -> pa.Table:
        per = _ts_ms_np(batch[ts_col]) // P
        t = pa.table({user_col: batch[user_col],
                      "per": pa.array(per, pa.int64())})
        return t.group_by([user_col, "per"], use_threads=False).aggregate([])

    pairs = ds.map_batches(combine_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
    parts = _group_partition(pairs, [user_col], num_partitions)

    def per_partition(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART])
        # batch-level distinct pairs may still repeat across batches
        g = g.group_by([user_col, "per"], use_threads=False).aggregate([])
        g = g.sort_by([(user_col, "ascending"), ("per", "ascending")])
        per = np.asarray(g["per"].combine_chunks())
        codes = np.asarray(
            pc.dictionary_encode(g[user_col].combine_chunks()).indices)
        if len(codes) == 0:
            return pa.table({"cohort": pa.array([], pa.int64()),
                             "offset": pa.array([], pa.int64()),
                             "n_users": pa.array([], pa.int64())})
        first = np.concatenate([[True], codes[1:] != codes[:-1]])
        cohort = per[np.flatnonzero(first)][
            np.cumsum(first) - 1]  # broadcast each user's min period
        off = per - cohort
        t = pa.table({"cohort": pa.array(cohort, pa.int64()),
                      "offset": pa.array(off, pa.int64())})
        agg = t.group_by(["cohort", "offset"], use_threads=False).aggregate(
            [([], "count_all")])
        return agg.rename_columns(["cohort", "offset", "n_users"])

    partials = parts.groupby(_GPART).map_groups(
        per_partition, batch_format="pyarrow")

    def final(group: pa.Table) -> pa.Table:
        agg = group.group_by(["cohort", "offset"],
                             use_threads=False).aggregate(
            [("n_users", "sum")])
        return agg.rename_columns(["cohort", "offset", "n_users"])

    return partials.groupby("cohort").map_groups(final,
                                                 batch_format="pyarrow")


def pairwise_corr(ds, columns, round_digits: int | None = None) -> "pa.Table":
    """Pairwise Pearson correlation matrix over numeric columns in ONE
    streaming pass (the classic profiling companion to `analysis.analyze`;
    the reference's AnalyzeSpark stops at per-column moments —
    AnalyzeSpark.java:120 — so cross-column structure is beyond-reference).

    Per batch: rows with a null in ANY of the columns are dropped
    (complete-case, matching SQL ``corr``'s pairwise-on-complete rows
    when applied jointly), then one k-vector of sums, one of sum-squares
    and one k×k Gram matrix X'X — O(k²) floats per batch regardless of
    rows. Partials merge by addition (Ray tree reduce); the driver forms
    the matrix. Returns tidy rows (col_a, col_b, corr) for a < b.
    """
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import AggregateFn

    cols = list(columns)
    k = len(cols)

    # state = ONE flat float64 vector [n, sums(k), gram(k*k)] — a single
    # ndarray ships through Ray's aggregate block layer cleanly
    def acc_block(state, blk: pa.Table):
        x = np.column_stack([
            blk[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols])
        x = x[~np.isnan(x).any(axis=1)]
        out = state.copy()
        out[0] += len(x)
        out[1:k + 1] += x.sum(axis=0)
        out[k + 1:] += (x.T @ x).ravel()
        return out

    agg = AggregateFn(
        init=lambda _k: np.zeros(1 + k + k * k),
        accumulate_block=acc_block,
        merge=lambda a, b: a + b,
        finalize=lambda s: s, name="corr")
    state = np.asarray(ds.select_columns(cols).aggregate(agg)["corr"])
    n = int(state[0])
    s = state[1:k + 1]
    g = state[k + 1:].reshape(k, k)
    if n < 2:
        return pa.table({"col_a": pa.array([], pa.string()),
                         "col_b": pa.array([], pa.string()),
                         "corr": pa.array([], pa.float64())})
    cov = g / n - np.outer(s / n, s / n)
    sd = np.sqrt(np.clip(np.diag(cov), 0, None))
    denom = np.outer(sd, sd)
    with np.errstate(invalid="ignore", divide="ignore"):
        corr = np.where(denom > 0, cov / denom, np.nan)
    a_idx, b_idx = np.triu_indices(k, 1)
    vals = corr[a_idx, b_idx]
    if round_digits is not None:
        vals = np.round(vals, round_digits)
    return pa.table({"col_a": pa.array([cols[i] for i in a_idx]),
                     "col_b": pa.array([cols[i] for i in b_idx]),
                     "corr": pa.array(vals, pa.float64())})


def grouped_linreg(ds, keys, x_col: str, y_col: str,
                   round_digits: int | None = None, exact: bool = False):
    """Per-group simple OLS — SQL ``regr_slope(y, x)`` /
    ``regr_intercept(y, x)`` / ``regr_count`` GROUP BY keys — in one
    combiner pass: each batch emits per-group partial sums
    (n, Σx, Σy, Σxx, Σxy) via one Arrow group_by, the grouped Sum
    reduce merges them (map-side combined), and a final narrow map
    computes slope = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²) and intercept.
    Complete-case: rows with a null x or y are dropped (SQL regr_*
    semantics). Groups with zero x-variance emit null slope/intercept
    (DuckDB likewise).

    ``exact=True`` is the cross-engine-exact mode for INTEGER-valued
    inputs (pre-scale decimals yourself): partial sums of ints are
    exact in float64 below 2^53, and the final combination runs in
    arbitrary-precision Python ints with ONE float division at the end
    — bit-identical to a DuckDB oracle doing the same formula in
    HUGEINT then casting to double.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from datavec_ray.reduce import Reducer

    keys = list(keys)

    def partial(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(x) | np.isnan(y))
        t = b.select(keys).filter(pa.array(ok))
        x, y = x[ok], y[ok]
        t = t.append_column(pa.field("__n", pa.float64()),
                            pa.array(np.ones(len(x))))
        for name, v in (("__sx", x), ("__sy", y), ("__sxx", x * x),
                        ("__sxy", x * y)):
            t = t.append_column(pa.field(name, pa.float64()), pa.array(v))
        return t.group_by(keys).aggregate(
            [(c, "sum") for c in ("__n", "__sx", "__sy", "__sxx",
                                  "__sxy")]) \
            .rename_columns(keys + ["__n", "__sx", "__sy", "__sxx",
                                    "__sxy"])

    part = ds.map_batches(partial, batch_format="pyarrow")
    summed = Reducer(keys, [[c, "Sum", c] for c in
                            ("__n", "__sx", "__sy", "__sxx", "__sxy")]) \
        .apply_dataset(part)

    def finalize(b: pa.Table) -> pa.Table:
        n = b["__n"].to_numpy(zero_copy_only=False)
        sx = b["__sx"].to_numpy(zero_copy_only=False)
        sy = b["__sy"].to_numpy(zero_copy_only=False)
        sxx = b["__sxx"].to_numpy(zero_copy_only=False)
        sxy = b["__sxy"].to_numpy(zero_copy_only=False)
        if exact:
            slope = np.empty(len(n)); intercept = np.empty(len(n))
            for i in range(len(n)):
                ni, sxi, syi = int(n[i]), int(sx[i]), int(sy[i])
                sxxi, sxyi = int(sxx[i]), int(sxy[i])
                den = ni * sxxi - sxi * sxi     # exact python ints
                if den == 0:
                    slope[i] = np.nan; intercept[i] = np.nan
                    continue
                slope[i] = float(ni * sxyi - sxi * syi) / float(den)
                intercept[i] = (syi - slope[i] * sxi) / ni
        else:
            denom = n * sxx - sx * sx
            with np.errstate(invalid="ignore", divide="ignore"):
                slope = np.where(denom != 0, (n * sxy - sx * sy) / denom,
                                 np.nan)
                intercept = np.where(denom != 0, (sy - slope * sx) / n,
                                     np.nan)
        if round_digits is not None:
            slope = np.round(slope, round_digits)
            intercept = np.round(intercept, round_digits)
        out = b.select(keys)
        out = out.append_column(pa.field("n", pa.int64()),
                                pc.cast(pa.array(n), pa.int64()))
        out = out.append_column(pa.field("slope", pa.float64()),
                                pa.array(slope))
        out = out.append_column(pa.field("intercept", pa.float64()),
                                pa.array(intercept))
        return out

    return summed.map_batches(finalize, batch_format="pyarrow")


def key_skew(ds, col: str, k: int = 20, capacity: int = 2000) -> pa.Table:
    """Partition-skew diagnostic for a prospective shuffle/partition
    key: the exact top-``k`` hottest values of ``col`` with count,
    share of all rows, and cumulative share in (count desc, value asc)
    order — the report that tells you whether a key needs salting
    before a groupby / CDC ingest routes on it (the engine's own hot-
    conversation salting, cdc/engine.py, is driven by exactly this
    distribution).

    Scale shape: rides `ops.sketches.frequent_items` — block-local
    pigeonhole candidate pruning (<= capacity candidate rows leave any
    block) + one exact refine pass; the total row count comes from the
    Dataset metadata count, no extra data pass. Output is k rows.
    """
    import numpy as np

    from datavec_ray.ops.sketches import frequent_items

    top = frequent_items(ds, col, k, capacity)
    n = ds.count()
    cnt = top["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
    share = cnt / float(n)
    return pa.table({
        "value": top["value"],
        "cnt": top["cnt"],
        "share": pa.array(share, pa.float64()),
        "cum_share": pa.array(np.cumsum(share), pa.float64()),
    })


def cooccurrence(ds, group_col: str, item_col: str,
                 num_partitions: int = 32) -> pa.Table:
    """Item co-occurrence / association statistics: for every unordered
    item pair (a < b), the number of groups containing BOTH, each
    item's group count, and the derived support and lift — the
    market-basket view of tool usage per conversation (or tags per
    document). Nulls ignored.

    Scale shape: a per-batch DISTINCT (group, item) combiner bounds
    everything downstream by distinct memberships; ONE group-hash
    shuffle co-locates each group's items; per partition the pair
    explode runs segment-wise (groups are small sets) and collapses to
    (a, b, cnt) partials — the exchange and the driver-side finalize
    are bounded by the item-vocabulary squared, never by the corpus.
    """
    from datavec_ray.misc import _GPART, _group_partition, _key_run_starts
    from datavec_ray.steps.base import combine
    from datavec_ray.util import dataset_to_table

    def _distinct(batch: pa.Table) -> pa.Table:
        b = batch.replace_schema_metadata(None) \
            .filter(pc.is_valid(batch[item_col]))
        return b.select([group_col, item_col]) \
            .group_by([group_col, item_col], use_threads=False) \
            .aggregate([])

    memb = ds.map_batches(_distinct, batch_format="pyarrow")

    def _pairs(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(group_col, "ascending"), (item_col, "ascending")])
        m = g.num_rows
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64()),
                          "item": pa.array([], pa.string()),
                          "icnt": pa.array([], pa.int64()),
                          "groups": pa.array([], pa.int64())})
        if m == 0:
            return empty
        # cross-batch distinct within the partition
        starts = np.flatnonzero(_key_run_starts(g, [group_col, item_col]))
        u = g.take(pa.array(starts, pa.int64()))
        items = combine(u[item_col])
        seg = np.flatnonzero(_key_run_starts(u, [group_col]))
        sizes = np.diff(np.append(seg, len(starts)))
        outs_a, outs_b = [], []
        for s, ln in zip(seg, sizes):
            if ln >= 2:
                i, j = np.triu_indices(ln, k=1)
                sl = items.slice(s, ln)
                outs_a.append(sl.take(pa.array(i)))
                outs_b.append(sl.take(pa.array(j)))
        if outs_a:
            pt = pa.table({"a": pa.concat_arrays(outs_a),
                           "b": pa.concat_arrays(outs_b)})
            pc_tbl = pt.group_by(["a", "b"], use_threads=False) \
                .aggregate([([], "count_all")]) \
                .rename_columns(["a", "b", "cnt"])
        else:
            pc_tbl = empty.select(["a", "b", "cnt"])
        sing = pa.table({"item": items}).group_by(
            ["item"], use_threads=False).aggregate([([], "count_all")]) \
            .rename_columns(["item", "icnt"])
        ng = pa.table({"groups": pa.array([len(seg)], pa.int64())})
        # pad the three partial families into one schema
        def pad(t: pa.Table) -> pa.Table:
            cols = {}
            for name in ("a", "b", "item"):
                cols[name] = (t[name] if name in t.column_names
                              else pa.nulls(t.num_rows, pa.string()))
            for name in ("cnt", "icnt", "groups"):
                cols[name] = (t[name] if name in t.column_names
                              else pa.nulls(t.num_rows, pa.int64()))
            return pa.table(cols)
        return pa.concat_tables([pad(pc_tbl), pad(sing), pad(ng)]) \
            .select(["a", "b", "cnt", "item", "icnt", "groups"])

    _pairs.__name__ = "cooccurrence_pairs"
    partials = dataset_to_table(
        _group_partition(memb, [group_col], num_partitions)
        .groupby(_GPART).map_groups(_pairs, batch_format="pyarrow"))
    total = int(pc.sum(partials["groups"]).as_py() or 0)
    pt = partials.filter(pc.is_valid(partials["a"]))
    pair = pt.group_by(["a", "b"], use_threads=False) \
        .aggregate([("cnt", "sum")])
    st = partials.filter(pc.is_valid(partials["item"]))
    sing = st.group_by(["item"], use_threads=False) \
        .aggregate([("icnt", "sum")])
    it = sing["item"].to_pylist()
    ic = dict(zip(it, sing["icnt_sum"].to_pylist()))
    a = pair["a"].to_pylist()
    b = pair["b"].to_pylist()
    n_ab = np.asarray(pair["cnt_sum"].to_pylist(), dtype=np.int64)
    n_a = np.asarray([ic[x] for x in a], dtype=np.int64)
    n_b = np.asarray([ic[x] for x in b], dtype=np.int64)
    order = np.lexsort((np.asarray(b, dtype=object),
                        np.asarray(a, dtype=object)))
    return pa.table({
        "tool_a": pa.array(np.asarray(a, dtype=object)[order].tolist(),
                           pa.string()),
        "tool_b": pa.array(np.asarray(b, dtype=object)[order].tolist(),
                           pa.string()),
        "n_ab": pa.array(n_ab[order]),
        "n_a": pa.array(n_a[order]),
        "n_b": pa.array(n_b[order]),
        "support": pa.array(n_ab[order] / total, pa.float64()),
        # exact-int products, ONE float division — mirrors SQL's
        # BIGINT*BIGINT / BIGINT*BIGINT → DOUBLE evaluation
        "lift": pa.array((n_ab[order] * total) / (n_a[order] * n_b[order]),
                         pa.float64()),
    })


def grouped_corr(ds, keys, x_col: str, y_col: str,
                 round_digits: int | None = 6) -> "ray.data.Dataset":
    """Per-group Pearson correlation — SQL ``corr(y, x) GROUP BY keys``
    — with the same combiner discipline as `grouped_linreg`: per-batch
    partial sums (n, Σx, Σy, Σxx, Σyy, Σxy) through one map-side-
    combined grouped Sum, then a narrow finalize. Complete-case null
    handling; zero-variance groups emit null (DuckDB likewise).
    ``round_digits`` rounds the result (both engines' stable-vs-naive
    summation differ in the last ulps; round-6 matches the oracle)."""
    from datavec_ray.reduce import Reducer

    keys = list(keys)
    names = ("__n", "__sx", "__sy", "__sxx", "__syy", "__sxy")

    def partial(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(x) | np.isnan(y))
        t = b.select(keys).filter(pa.array(ok))
        x, y = x[ok], y[ok]
        for name, v in zip(names, (np.ones(len(x)), x, y, x * x, y * y,
                                   x * y)):
            t = t.append_column(pa.field(name, pa.float64()),
                                pa.array(v))
        return t.group_by(keys).aggregate(
            [(c, "sum") for c in names]).rename_columns(
            keys + list(names))

    part = ds.map_batches(partial, batch_format="pyarrow")
    summed = Reducer(keys, [[c, "Sum", c] for c in names]) \
        .apply_dataset(part)

    def finalize(b: pa.Table) -> pa.Table:
        n = b["__n"].to_numpy(zero_copy_only=False)
        sx = b["__sx"].to_numpy(zero_copy_only=False)
        sy = b["__sy"].to_numpy(zero_copy_only=False)
        sxx = b["__sxx"].to_numpy(zero_copy_only=False)
        syy = b["__syy"].to_numpy(zero_copy_only=False)
        sxy = b["__sxy"].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            den = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
            r = np.where(den > 0, (n * sxy - sx * sy) / den, np.nan)
        if round_digits is not None:
            r = np.round(r, round_digits)
        out = b.select(keys)
        out = out.append_column(pa.field("n", pa.int64()),
                                pc.cast(pa.array(n), pa.int64()))
        return out.append_column(pa.field("corr", pa.float64()),
                                 pa.array(r, from_pandas=True))

    return summed.map_batches(finalize, batch_format="pyarrow")


def grouped_moments(ds, keys, x_col: str) -> "ray.data.Dataset":
    """Per-group skewness and excess kurtosis for INTEGER-VALUED inputs
    — the distribution-shape companion to ``grouped_linreg(exact=True)``
    (reference counterpart: the analyze pass's mean/stdev moments,
    datavec-api transform/analysis/AnalyzeSpark semantics extended to
    3rd/4th order).

    Cross-engine-exact by construction: each batch emits per-group raw
    power sums (n, Σx, Σx², Σx³, Σx⁴) via one Arrow ``group_by`` (exact
    in float64 for integer values with Σx⁴ < 2^53), the map-side-
    combined grouped Sum merges them, and the finalize combines them in
    ARBITRARY-PRECISION Python ints with a fixed float operation order:

        m2 = float(n·S2 − S1²)            / n²      (population variance)
        m3 = float(n²·S3 − 3n·S1·S2 + 2S1³)/ n³
        m4 = float(n³·S4 − 4n²·S1·S3 + 6n·S1²·S2 − 3S1⁴) / n⁴
        skew = sqrt(n-ulp-exact) path:  m3 / (m2 · sqrt(m2))
        kurt = m4 / (m2 · m2) − 3

    The oracle mirrors EXACTLY these expressions over HUGEINT sums
    (``m2*sqrt(m2)`` instead of ``pow(m2, 1.5)`` keeps both sides on
    IEEE-exact multiply+sqrt), so results are bit-identical — no
    dependence on either engine's streaming ``skewness()`` builtin.
    Zero-variance groups emit null (matching a NULLIF(den,0) oracle).
    Complete-case: null x rows are dropped."""
    from datavec_ray.reduce import Reducer

    keys = list(keys)
    names = ("__n", "__s1", "__s2", "__s3", "__s4")

    def partial(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(x)
        t = b.select(keys).filter(pa.array(ok))
        x = x[ok]
        x2 = x * x
        for name, v in zip(names, (np.ones(len(x)), x, x2, x2 * x,
                                   x2 * x2)):
            t = t.append_column(pa.field(name, pa.float64()), pa.array(v))
        return t.group_by(keys).aggregate(
            [(c, "sum") for c in names]).rename_columns(keys + list(names))

    part = ds.map_batches(partial, batch_format="pyarrow")
    summed = Reducer(keys, [[c, "Sum", c] for c in names]) \
        .apply_dataset(part)

    def finalize(b: pa.Table) -> pa.Table:
        import math
        cols = [b[c].to_numpy(zero_copy_only=False) for c in names]
        out_n = np.zeros(b.num_rows, np.int64)
        skew = np.full(b.num_rows, np.nan)
        kurt = np.full(b.num_rows, np.nan)
        for i in range(b.num_rows):
            n = int(cols[0][i]); s1 = int(cols[1][i]); s2 = int(cols[2][i])
            s3 = int(cols[3][i]); s4 = int(cols[4][i])
            out_n[i] = n
            if n == 0:
                continue
            num2 = n * s2 - s1 * s1
            if num2 == 0:
                continue                      # zero variance -> null
            m2 = float(num2) / (n * n)
            m3 = float(n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3) \
                / (n ** 3)
            m4 = float(n ** 3 * s4 - 4 * n * n * s1 * s3
                       + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4) / (n ** 4)
            skew[i] = m3 / (m2 * math.sqrt(m2))
            kurt[i] = m4 / (m2 * m2) - 3.0
        out = b.select(keys)
        out = out.append_column(pa.field("n", pa.int64()), pa.array(out_n))
        out = out.append_column(pa.field("skew", pa.float64()),
                                pa.array(skew, from_pandas=True))
        return out.append_column(pa.field("kurt", pa.float64()),
                                 pa.array(kurt, from_pandas=True))

    return summed.map_batches(finalize, batch_format="pyarrow")


def grouped_entropy(ds, keys, value_col: str,
                    out_col: str = "entropy") -> "ray.data.Dataset":
    """Per-group Shannon entropy (log base 2) of the VALUE distribution
    — SQL ``entropy(value) GROUP BY keys`` — with the distinct-count
    combiner discipline: each batch pre-counts (keys, value) occurrences
    via one Arrow ``group_by`` (the shuffle ships at most
    per-batch-distinct (key, value) partial rows, never raw data), the
    grouped Sum merges counts, and a per-key finalize computes

        H = log2(N) − (Σ cᵥ·log2(cᵥ)) / N

    which is algebraically −Σ p·log2 p but keeps all inputs exact
    integers until one final division (the form DuckDB's ``entropy``
    uses, so round-6 comparison is stable). Null values count as a
    category of their own (DuckDB ``entropy`` ignores nulls — pass
    ``drop_null=True`` via a filter upstream to mirror; the driver
    query does)."""
    from datavec_ray.misc import _key_run_starts
    from datavec_ray.reduce import Reducer

    keys = list(keys)

    def partial(b: pa.Table) -> pa.Table:
        t = b.select(keys + [value_col])
        t = t.append_column(pa.field("__c", pa.int64()),
                            pa.array(np.ones(t.num_rows, np.int64)))
        return t.group_by(keys + [value_col]).aggregate([("__c", "sum")]) \
            .rename_columns(keys + [value_col, "__c"])

    part = ds.map_batches(partial, batch_format="pyarrow")
    counts = Reducer(keys + [value_col], [["__c", "Sum", "__c"]]) \
        .apply_dataset(part)

    def finalize(group: pa.Table) -> pa.Table:
        # group = all (key, value, count) rows of one hash partition;
        # one sort + run scan resolves every key at once
        g = group.sort_by([(k, "ascending") for k in keys])
        c = g["__c"].to_numpy(zero_copy_only=False).astype(np.float64)
        new_key = _key_run_starts(g.select(keys), keys)
        starts = np.flatnonzero(new_key)
        n_tot = np.add.reduceat(c, starts)
        clogc = np.add.reduceat(c * np.log2(c), starts)
        ent = np.log2(n_tot) - clogc / n_tot
        out = g.select(keys).take(pa.array(starts, pa.int64()))
        out = out.append_column(pa.field("n", pa.int64()),
                                pa.array(n_tot.astype(np.int64)))
        return out.append_column(pa.field(out_col, pa.float64()),
                                 pa.array(np.round(ent, 6)))

    return _group_partition(counts, keys, 32) \
        .groupby(_GPART).map_groups(finalize, batch_format="pyarrow")


def benford_profile(ds, keys, x_col: str,
                    num_partitions: int = 32) -> "ray.data.Dataset":
    """Per-group leading-significant-digit distribution vs Benford's
    law — the classic fabricated-/synthetic-data forensic (Benford
    1938; Nigrini 2012): natural multi-scale magnitudes follow
    P(d) = log10(1 + 1/d). Emits one row per (keys, digit 1..9) with
    the observed count, observed share, and the Benford expectation —
    a screening report for value columns before they feed training
    signals.

    Contract: the digit is the first character of ``floor(abs(x))``
    rendered in decimal (exact in both engines — no float log10
    boundary ambiguity); rows with ``floor(abs(x)) = 0`` or null are
    excluded. Scale shape: per-batch (keys, digit) count combiner →
    map-side-combined grouped Sum → per-partition share finalize; the
    shuffle carries ≤ 9 × groups partial rows."""
    from datavec_ray.misc import _key_run_starts
    from datavec_ray.reduce import Reducer

    keys = list(keys)

    def partial(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore"):
            mag = np.floor(np.abs(x))
        ok = ~np.isnan(mag) & (mag >= 1)
        t = b.select(keys).filter(pa.array(ok))
        mag = mag[ok]
        # leading digit without string round-trips: strip trailing
        # decimal digits by repeated power-of-10 division (exact for
        # magnitudes below 2^53)
        d = mag
        big = d >= 10
        while big.any():
            d = np.where(big, np.floor(d / 10.0), d)
            big = d >= 10
        t = t.append_column(pa.field("digit", pa.int64()),
                            pa.array(d.astype(np.int64)))
        t = t.append_column(pa.field("__c", pa.int64()),
                            pa.array(np.ones(len(d), np.int64)))
        return t.group_by(keys + ["digit"]).aggregate([("__c", "sum")]) \
            .rename_columns(keys + ["digit", "__c"])

    part = ds.map_batches(partial, batch_format="pyarrow")
    counts = Reducer(keys + ["digit"], [["__c", "Sum", "n"]]) \
        .apply_dataset(part)

    def finalize(group: pa.Table) -> pa.Table:
        from datavec_ray.misc import _GPART
        g = group.drop_columns([_GPART]).sort_by(
            [(k, "ascending") for k in keys] + [("digit", "ascending")])
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        new_key = _key_run_starts(g.select(keys), keys) if keys else \
            np.concatenate(([True], np.zeros(g.num_rows - 1, bool)))
        starts = np.flatnonzero(new_key)
        tot = np.repeat(np.add.reduceat(n, starts),
                        np.diff(np.append(starts, len(n))))
        dig = g["digit"].to_numpy(zero_copy_only=False).astype(np.float64)
        out = g.append_column(pa.field("share", pa.float64()),
                              pa.array(np.round(n / tot, 6)))
        return out.append_column(
            pa.field("benford", pa.float64()),
            pa.array(np.round(np.log10(1.0 + 1.0 / dig), 6)))

    finalize.__name__ = "benford_profile"
    from datavec_ray.misc import _GPART, _group_partition
    return _group_partition(counts, keys, num_partitions) \
        .groupby(_GPART).map_groups(finalize, batch_format="pyarrow")


def grouped_multiplicative_means(ds, keys, x_col: str,
                                 round_digits: int = 6):
    """Per-group GEOMETRIC and HARMONIC means — the rate/ratio
    aggregates the arithmetic ReduceOps family lacks (geomean for
    multiplicative quantities, harmonic for rates): one combiner pass
    emits per-group (n, Σln x, Σ1/x) partials via Arrow ``group_by``,
    the map-side-combined grouped Sum merges them, and a narrow
    finalize computes ``exp(Σln/n)`` and ``n/Σ(1/x)``. Complete-case;
    non-positive x yields null geomean (ln undefined; mirrors SQL
    CASE), zero x yields null harmonic. Values round to
    ``round_digits`` (cross-engine libm ulps, same convention as
    grouped_corr)."""
    from datavec_ray.reduce import Reducer

    keys = list(keys)
    names = ("__n", "__sln", "__sinv", "__npos")

    def partial(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(x)
        t = b.select(keys).filter(pa.array(ok))
        x = x[ok]
        with np.errstate(divide="ignore", invalid="ignore"):
            ln = np.where(x > 0, np.log(np.maximum(x, 1e-300)), 0.0)
            inv = np.where(x != 0, 1.0 / np.where(x == 0, 1.0, x), 0.0)
        pos = (x > 0).astype(np.float64)
        for name, v in zip(names, (np.ones(len(x)), ln, inv, pos)):
            t = t.append_column(pa.field(name, pa.float64()),
                                pa.array(v))
        return t.group_by(keys).aggregate(
            [(c, "sum") for c in names]).rename_columns(
            keys + list(names))

    part = ds.map_batches(partial, batch_format="pyarrow")
    summed = Reducer(keys, [[c, "Sum", c] for c in names]) \
        .apply_dataset(part)

    def finalize(b: pa.Table) -> pa.Table:
        n = b["__n"].to_numpy(zero_copy_only=False)
        sln = b["__sln"].to_numpy(zero_copy_only=False)
        sinv = b["__sinv"].to_numpy(zero_copy_only=False)
        npos = b["__npos"].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            geo = np.where((n > 0) & (npos == n), np.exp(sln / n), np.nan)
            har = np.where((n > 0) & (npos == n) & (sinv != 0),
                           n / sinv, np.nan)
        out = b.select(keys)
        out = out.append_column(pa.field("n", pa.int64()),
                                pc.cast(pa.array(n), pa.int64()))
        out = out.append_column(
            pa.field("geomean", pa.float64()),
            pa.array(np.round(geo, round_digits), from_pandas=True))
        return out.append_column(
            pa.field("harmean", pa.float64()),
            pa.array(np.round(har, round_digits), from_pandas=True))

    return summed.map_batches(finalize, batch_format="pyarrow")
