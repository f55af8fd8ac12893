"""Event-time watermarks, late-event routing, and emit-on-watermark
tumbling windows with allowed lateness over a CDC binlog.

The binlog carries two orders: ARRIVAL order (monotonic ``lsn``) and
EVENT TIME (``ts``, which arrives out of order — the generator and the
driver's events table both produce late updates). A streaming engine
reconciles them with a watermark: after processing the event at
``lsn``, the watermark is ``max(ts of all events with lower lsn) -
delay``. An event whose own ``ts`` is below the watermark in effect
when it arrives is LATE; a window finalizes ("fires") once the
watermark passes ``window_end + allowed_lateness`` and later events
for it are dropped to a side output, exactly the Flink/Beam
allowed-lateness contract (public semantics; the reference has no
counterpart — its sequence ops assume fully sorted input, e.g.
``transform/sequence/ConvertToSequence.java`` sorting by time column).

Everything here is deterministic and SQL-mirrorable: the watermark in
effect at an event is

    max(ts_ms) OVER (ORDER BY lsn ROWS UNBOUNDED PRECEDING
                     AND 1 PRECEDING) - delay_ms

so the driver's DuckDB oracle checks both the per-event late flags and
the final windowed aggregates (queries ``late_events`` /
``windowed_stream``).

Distributed shape — a prefix scan, computed in two tiny-metadata
passes with the raw rows never leaving their blocks:

1. one ``map_batches`` pass emits per-block summaries
   ``(min_lsn, max_lsn, rows, max_ts)`` — O(blocks) rows to the driver;
2. the driver sorts summaries by ``min_lsn``, VERIFIES the blocks
   tile the lsn axis without overlap (true for any binlog written in
   lsn order — segments and parquet row groups preserve it), and
   computes each block's exclusive prefix max (its seed);
3. a second ``map_batches`` pass over the SAME materialized blocks
   re-keys each batch to its summary by (min_lsn, max_lsn, rows) and
   runs a vectorized seeded cumulative max inside the block.

If the input's blocks DO overlap in lsn (an already-shuffled dataset),
``assign_watermarks`` falls back to ONE range-repartition exchange
(driver picks balanced lsn cuts from the pass-1 summaries, rows route
by searchsorted) after which the partitions tile by construction.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_NEG = -(1 << 62)  # "no prior event" sentinel, far below any epoch-ms


def _ts_ms(col: pa.ChunkedArray) -> pa.ChunkedArray:
    t = col.type
    if pa.types.is_timestamp(t):
        col = pc.cast(col, pa.timestamp("ms"), safe=False)
        return pc.cast(col, pa.int64())
    return pc.cast(col, pa.int64())


def _block_summary(batch: pa.Table, order_col: str, ts_col: str) -> pa.Table:
    lsn = batch[order_col]
    ts = _ts_ms(batch[ts_col])
    return pa.table({
        "min_lsn": pa.array([pc.min(lsn).as_py()], pa.int64()),
        "max_lsn": pa.array([pc.max(lsn).as_py()], pa.int64()),
        "rows": pa.array([batch.num_rows], pa.int64()),
        "max_ts": pa.array([pc.max(ts).as_py()], pa.int64()),
    })


def _seeded_scan(batch: pa.Table, seed_ms: int, delay_ms: int,
                 order_col: str, ts_col: str,
                 out_wm: str, out_late: str) -> pa.Table:
    """Vectorized in-block watermark assignment given the exclusive
    prefix max of every earlier block (``seed_ms``)."""
    lsn = np.asarray(pc.cast(batch[order_col], pa.int64()).combine_chunks())
    ts = np.asarray(_ts_ms(batch[ts_col]).combine_chunks())
    order = np.argsort(lsn, kind="stable")
    ts_sorted = ts[order]
    # exclusive running max: prior-events-only, seeded from earlier blocks
    run = np.empty(len(ts_sorted), dtype=np.int64)
    run[0] = seed_ms
    if len(ts_sorted) > 1:
        np.maximum.accumulate(ts_sorted[:-1], out=run[1:])
        np.maximum(run[1:], seed_ms, out=run[1:])
    wm_sorted = np.where(run == _NEG, np.int64(-1), run - np.int64(delay_ms))
    wm = np.empty_like(wm_sorted)
    wm[order] = wm_sorted
    late_sorted = (run != _NEG) & (ts_sorted < run - np.int64(delay_ms))
    late = np.empty_like(late_sorted)
    late[order] = late_sorted
    out = batch.append_column(out_wm, pa.array(wm, pa.int64()))
    return out.append_column(out_late, pa.array(late, pa.bool_()))


def _summaries(ds, order_col: str, ts_col: str) -> "pa.Table":
    import pyarrow as _pa
    meta = ds.map_batches(
        lambda b: _block_summary(b, order_col, ts_col),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    rows = meta.take_all()
    return _pa.table({k: [r[k] for r in rows] for k in
                      ("min_lsn", "max_lsn", "rows", "max_ts")})


def _tiles(summ: pa.Table) -> Optional[dict]:
    """If the block lsn ranges tile without overlap, return a lookup
    {(min_lsn, max_lsn, rows) -> exclusive-prefix-max seed}."""
    order = np.argsort(np.asarray(summ["min_lsn"]), kind="stable")
    lo = np.asarray(summ["min_lsn"])[order]
    hi = np.asarray(summ["max_lsn"])[order]
    if len(lo) > 1 and not (lo[1:] > hi[:-1]).all():
        return None
    mx = np.asarray(summ["max_ts"])[order]
    seeds = np.empty(len(mx), dtype=np.int64)
    seeds[0] = _NEG
    if len(mx) > 1:
        np.maximum.accumulate(mx[:-1], out=seeds[1:])
    rows = np.asarray(summ["rows"])[order]
    return {(int(a), int(b), int(n)): int(s)
            for a, b, n, s in zip(lo, hi, rows, seeds)}


def _seeded_pass_fn(seeds: dict, delay_ms: int, order_col: str,
                    ts_col: str, out_wm: str, out_late: str):
    """Second-pass map fn: re-key each batch to its pass-1 summary.

    A plain TASK-based closure on purpose: the seeds dict rides each
    task submission (it is O(blocks), tiny), so there is no actor pool
    to spin up for a sub-second stage and no ray#53727 restart hazard
    — an actor's constructor args in the object store can be lost,
    a task closure cannot."""
    def _seeded(batch: pa.Table) -> pa.Table:
        lsn = batch[order_col]
        key = (pc.min(lsn).as_py(), pc.max(lsn).as_py(), batch.num_rows)
        seed = seeds.get(key)
        if seed is None:
            raise RuntimeError(
                f"watermark pass-2 batch {key} does not match any pass-1 "
                "block — the plan re-batched between passes; materialize "
                "the input or use the range-shuffle path")
        return _seeded_scan(batch, seed, delay_ms, order_col,
                            ts_col, out_wm, out_late)
    _seeded.__name__ = "watermark_seeded_pass"
    return _seeded


def assign_watermarks(ds, delay_ms: int, ts_col: str = "ts",
                      order_col: str = "lsn", out_wm: str = "wm_ms",
                      out_late: str = "is_late",
                      num_partitions: int = 32,
                      replan=None):
    """Append ``wm_ms`` (the event-time watermark in effect when each
    event arrived; -1 for the very first arrival) and ``is_late``
    (its own ts is below that watermark) to a binlog Dataset.

    Contiguous-block fast path: two metadata-only passes, zero
    shuffles. Overlapping-block fallback: one lsn-range exchange.

    Both passes must see the SAME blocks; by default the input is
    pinned once with ``materialize()`` (in-cluster, spills under
    pressure). For a re-readable source (a parquet binlog/lake), pass
    ``replan`` — a zero-arg callable returning a FRESH Dataset over
    the same input — and neither pass pins anything: pass 1 streams
    the re-planned input for summaries, pass 2 streams it again with
    the seeds, trading one extra source read for zero object-store
    residency. A Ray read plan over unchanged files reproduces its
    block layout, so the tiles re-key exactly; if the layouts ever
    diverge the seeded pass raises its loud mismatch error rather
    than mis-seeding. Measured at GRAFT_EVENTS_MULT=8, 96M events,
    32 CPUs (WATERMARK_REPLAN.json): materialize 7.72 s vs replan
    8.50 s — the re-read path trades ~10% wall time for zero pinned
    bytes, the right default only when the input is far larger than
    the object store."""
    if replan is not None:
        summ = _summaries(replan(), order_col, ts_col)
        seeds = _tiles(summ)
        if seeds is not None:
            return replan().map_batches(
                _seeded_pass_fn(seeds, delay_ms, order_col, ts_col,
                                out_wm, out_late),
                batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True)
        ds = replan()                  # overlapping blocks: exchange
    mat = ds.materialize()
    summ = _summaries(mat, order_col, ts_col)
    seeds = _tiles(summ)
    if seeds is not None:
        return mat.map_batches(
            _seeded_pass_fn(seeds, delay_ms, order_col, ts_col,
                            out_wm, out_late),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    # ---- general path: ONE range exchange on lsn, then per-range scans
    lo = int(pc.min(summ["min_lsn"]).as_py())
    hi = int(pc.max(summ["max_lsn"]).as_py())
    P = max(1, min(num_partitions, hi - lo + 1))
    cuts = np.linspace(lo, hi + 1, P + 1).astype(np.int64)[1:-1]

    def _route(batch: pa.Table) -> pa.Table:
        part = np.searchsorted(cuts, np.asarray(
            pc.cast(batch[order_col], pa.int64()).combine_chunks()),
            side="right")
        return batch.append_column("__rpart", pa.array(part, pa.int32()))

    routed = mat.map_batches(_route, batch_format="pyarrow",
                             zero_copy_batch=True)
    parts = routed.groupby("__rpart").map_groups(
        lambda g: g, batch_format="pyarrow").materialize()
    # per-range summaries now tile by construction; re-run the fast path
    summ2 = _summaries(parts, order_col, ts_col)
    seeds2 = _tiles(summ2)
    if seeds2 is None:  # pragma: no cover - ranges tile by construction
        raise RuntimeError("range partitions overlap — unreachable")
    out = parts.map_batches(
        _seeded_pass_fn(seeds2, delay_ms, order_col, ts_col,
                        out_wm, out_late),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    return out.drop_columns(["__rpart"])


def route_late_events(ds, delay_ms: int, **kw):
    """(on_time, late) Dataset pair — the late side is the DLQ-style
    side output a streaming job audits."""
    tagged = assign_watermarks(ds, delay_ms, **kw).materialize()
    out_late = kw.get("out_late", "is_late")
    on_time = tagged.filter(expr=f"{out_late} == False")
    late = tagged.filter(expr=f"{out_late} == True")
    return on_time, late


def windowed_stream(ds, window_ms: int, delay_ms: int,
                    allowed_lateness_ms: int = 0,
                    keys: Sequence[str] = ("role",),
                    ts_col: str = "ts", order_col: str = "lsn",
                    value_col: str = "turn_idx",
                    slide_ms: Optional[int] = None):
    """Emit-on-watermark TUMBLING (default) or HOPPING
    (``slide_ms < window_ms``) windows with allowed lateness.

    An event at event-time ``ts`` belongs to every window ``w`` with
    ``w*S <= ts < w*S + W`` (S = slide, W = width; S == W is the
    tumbling special case where ``w = ts // W``). A (event, window)
    pair is DROPPED (side output) iff the window had already fired
    when the event arrived: ``w*S + W + allowed_lateness <=
    wm_at_arrival``. Surviving pairs aggregate per (window, keys):
    count + sum(value).

    Returns ``(windows, dropped)`` — the fired-window table (every
    window finalized at its last accepted state, identical to what an
    online engine would have emitted after its final firing) and the
    dropped-late (event, window) side output.

    Shape: watermark assignment (above, shuffle-free on binlog input)
    → per-block multi-window assignment + combine to (window, keys)
    partial rows → ONE tiny groupby over partials. Raw events never
    shuffle; the hopping fan-out (W/S pairs per event) exists only
    inside the combiner, already pre-aggregated before the exchange.
    """
    tagged = assign_watermarks(ds, delay_ms, ts_col=ts_col,
                               order_col=order_col).materialize()
    keys = list(keys)
    W = np.int64(window_ms)
    S = np.int64(slide_ms if slide_ms is not None else window_ms)
    if S > W:
        raise ValueError("slide_ms must be <= window_ms")
    L = np.int64(allowed_lateness_ms)

    def _assign(batch: pa.Table):
        """(row_idx, win, keep) arrays for every (event, window) pair.
        numpy // floors, so the range formula is exact for any int64
        ts; the SQL mirror's `//` truncates — keep ts positive there
        (epoch-ms always is)."""
        ts = np.asarray(_ts_ms(batch[ts_col]).combine_chunks())
        wm = np.asarray(pc.cast(batch["wm_ms"], pa.int64()).combine_chunks())
        lo = (ts - W) // S + 1
        hi = ts // S
        cnt = (hi - lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(ts)), cnt)
        # win = lo[row] + position-within-row
        offs = np.arange(len(idx)) - np.repeat(
            np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
        win = lo[idx] + offs
        keep = ~((win * S + W + L) <= wm[idx])
        return idx, win, keep

    def _combine(batch: pa.Table) -> pa.Table:
        idx, win, keep = _assign(batch)
        if not keep.any():
            return pa.table(
                {"win": pa.array([], pa.int64()),
                 **{k: pa.array([], batch.schema.field(k).type) for k in keys},
                 "n": pa.array([], pa.int64()),
                 "val_sum": pa.array([], pa.int64())})
        rows = batch.take(pa.array(idx[keep]))
        gt = pa.table({"win": pa.array(win[keep], pa.int64()),
                       **{k: rows[k] for k in keys},
                       "__v": pc.cast(rows[value_col], pa.int64())})
        agg = gt.group_by(["win"] + keys, use_threads=False).aggregate(
            [("__v", "count"), ("__v", "sum")])
        return agg.rename_columns(["win"] + keys + ["n", "val_sum"])

    partials = tagged.map_batches(_combine, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def _final(group: pa.Table) -> pa.Table:
        agg = group.group_by(["win"] + keys, use_threads=False).aggregate(
            [("n", "sum"), ("val_sum", "sum")])
        return agg.rename_columns(["win"] + keys + ["n", "val_sum"])

    windows = partials.groupby("win").map_groups(
        _final, batch_format="pyarrow")

    def _dropped(batch: pa.Table) -> pa.Table:
        idx, win, keep = _assign(batch)
        out = batch.take(pa.array(idx[~keep]))
        return out.append_column("win", pa.array(win[~keep], pa.int64()))

    dropped = tagged.map_batches(_dropped, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return windows, dropped


def windowed_distinct(ds, window_ms: int, delay_ms: int,
                      allowed_lateness_ms: int = 0,
                      keys: Sequence[str] = ("role",),
                      ts_col: str = "ts", order_col: str = "lsn",
                      value_col: str = "conv_id",
                      slide_ms: Optional[int] = None,
                      approx: bool = False, hll_p: int = 9):
    """Emit-on-watermark windowed EXACT distinct count (e.g. active
    conversations per hour) — same window / allowed-lateness contract
    as :func:`windowed_stream`, with aggregate
    ``count(DISTINCT value_col)`` per (window, keys).

    Shape: the per-block combiner reduces every block to its distinct
    (window, keys, value) TRIPLES — the exact-distinct floor: raw
    events never shuffle and repeated values collapse map-side — then
    ONE exchange on window and a final distinct+count per (window,
    keys). ``approx=True`` swaps the triples for FIXED 2^p-byte HLL
    register partials per (window, keys) group (merge = element-wise
    max), so the exchange is bounded by windows×keys regardless of the
    value domain — the scale path when distinct values per window rival
    the corpus; estimates use the same estimator as the Reducer's
    CountUnique (``n_distinct`` float64). Returns ``(windows, dropped)``.
    """
    tagged = assign_watermarks(ds, delay_ms, ts_col=ts_col,
                               order_col=order_col).materialize()
    keys = list(keys)
    W = np.int64(window_ms)
    S = np.int64(slide_ms if slide_ms is not None else window_ms)
    if S > W:
        raise ValueError("slide_ms must be <= window_ms")
    L = np.int64(allowed_lateness_ms)

    def _assign(batch: pa.Table):
        ts = np.asarray(_ts_ms(batch[ts_col]).combine_chunks())
        wm = np.asarray(pc.cast(batch["wm_ms"], pa.int64()).combine_chunks())
        lo = (ts - W) // S + 1
        hi = ts // S
        cnt = (hi - lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(ts)), cnt)
        offs = np.arange(len(idx)) - np.repeat(
            np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
        win = lo[idx] + offs
        keep = ~((win * S + W + L) <= wm[idx])
        return idx, win, keep

    if approx:
        from datavec_ray.hll import hash64
        from datavec_ray.misc import _key_run_starts
        from datavec_ray.reduce import _hll_cardinality, _hll_fold
        from datavec_ray.steps.base import combine as _cc
        m = 1 << hll_p

        def _regs_np(col) -> np.ndarray:
            a = _cc(col) if isinstance(col, pa.ChunkedArray) else col
            buf = a.buffers()[1]
            return np.frombuffer(buf, np.uint8)[
                a.offset * m:(a.offset + len(a)) * m].reshape(-1, m)

        def _regs_arr(regs: np.ndarray) -> pa.Array:
            return pa.Array.from_buffers(
                pa.binary(m), len(regs),
                [None, pa.py_buffer(regs.tobytes())])

        def _combine_hll(batch: pa.Table) -> pa.Table:
            idx, win, keep = _assign(batch)
            if not keep.any():
                return pa.table(
                    {"win": pa.array([], pa.int64()),
                     **{k: pa.array([], batch.schema.field(k).type)
                        for k in keys},
                     "__regs": pa.array([], pa.binary(m))})
            rows = batch.take(pa.array(idx[keep]))
            h = hash64(_cc(rows[value_col]))
            gt = pa.table({"win": pa.array(win[keep], pa.int64()),
                           **{k: rows[k] for k in keys},
                           "__h": pa.array(h)}).sort_by(
                [("win", "ascending")]
                + [(k, "ascending") for k in keys])
            starts_mask = _key_run_starts(gt, ["win"] + keys)
            gid = np.cumsum(starts_mask) - 1
            regs = _hll_fold(
                gid, _cc(gt["__h"]).to_numpy(zero_copy_only=False)
                .astype(np.uint64), int(gid[-1]) + 1, hll_p)
            u = gt.take(pa.array(np.flatnonzero(starts_mask), pa.int64()))
            return pa.table({"win": u["win"],
                             **{k: u[k] for k in keys},
                             "__regs": _regs_arr(regs)})

        partials = tagged.map_batches(_combine_hll, batch_format="pyarrow",
                                      zero_copy_batch=True)

        def _final_hll(group: pa.Table) -> pa.Table:
            g = group.sort_by([("win", "ascending")]
                              + [(k, "ascending") for k in keys])
            starts = np.flatnonzero(_key_run_starts(g, ["win"] + keys))
            regs = _regs_np(g["__regs"])
            folded = np.maximum.reduceat(regs, starts, axis=0)
            u = g.take(pa.array(starts, pa.int64()))
            return pa.table({"win": u["win"],
                             **{k: u[k] for k in keys},
                             "n_distinct": pa.array(
                                 _hll_cardinality(folded), pa.float64())})

        _final_hll.__name__ = "windowed_distinct_hll"
        windows = partials.groupby("win").map_groups(
            _final_hll, batch_format="pyarrow")
    else:
        def _combine(batch: pa.Table) -> pa.Table:
            idx, win, keep = _assign(batch)
            if not keep.any():
                return pa.table(
                    {"win": pa.array([], pa.int64()),
                     **{k: pa.array([], batch.schema.field(k).type)
                        for k in keys},
                     "__v": pa.array([], batch.schema.field(value_col).type)})
            rows = batch.take(pa.array(idx[keep]))
            gt = pa.table({"win": pa.array(win[keep], pa.int64()),
                           **{k: rows[k] for k in keys},
                           "__v": rows[value_col]})
            return gt.group_by(["win"] + keys + ["__v"],
                               use_threads=False).aggregate([])

        partials = tagged.map_batches(_combine, batch_format="pyarrow",
                                      zero_copy_batch=True)

        def _final(group: pa.Table) -> pa.Table:
            d = group.group_by(["win"] + keys + ["__v"],
                               use_threads=False).aggregate([])
            agg = d.group_by(["win"] + keys, use_threads=False).aggregate(
                [([], "count_all")])
            return agg.rename_columns(["win"] + keys + ["n_distinct"])

        _final.__name__ = "windowed_distinct"
        windows = partials.groupby("win").map_groups(
            _final, batch_format="pyarrow")

    def _dropped(batch: pa.Table) -> pa.Table:
        idx, win, keep = _assign(batch)
        out = batch.take(pa.array(idx[~keep]))
        return out.append_column("win", pa.array(win[~keep], pa.int64()))

    dropped = tagged.map_batches(_dropped, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return windows, dropped


def session_stream(ds, gap_ms: int, delay_ms: int,
                   allowed_lateness_ms: int = 0,
                   keys: Sequence[str] = ("conv_id",),
                   ts_col: str = "ts", order_col: str = "lsn"):
    """Watermark-gated SESSION windows: events older than
    ``watermark - allowed_lateness`` at arrival are dropped to the
    side output (they can no longer extend any open session); the
    survivors sessionize per key on event-time gaps > ``gap_ms``
    (``misc.sessionize`` — one hash exchange, per-partition segmented
    gap scan). Returns ``(sessions, dropped)``.
    """
    tagged = assign_watermarks(ds, delay_ms, ts_col=ts_col,
                               order_col=order_col).materialize()
    L = np.int64(allowed_lateness_ms)

    def _gate(batch: pa.Table, drop: bool) -> pa.Table:
        ts = np.asarray(_ts_ms(batch[ts_col]).combine_chunks())
        wm = np.asarray(pc.cast(batch["wm_ms"], pa.int64()).combine_chunks())
        late = ts <= wm - L
        return batch.filter(pa.array(late if drop else ~late))

    import functools

    def _ms_col(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__ts_ms", pa.array(np.asarray(
                _ts_ms(batch[ts_col]).combine_chunks()), pa.int64()))

    on_time = tagged.map_batches(
        functools.partial(_gate, drop=False), batch_format="pyarrow",
        zero_copy_batch=True).drop_columns(["wm_ms", "is_late"]) \
        .map_batches(_ms_col, batch_format="pyarrow", zero_copy_batch=True)
    dropped = tagged.map_batches(
        functools.partial(_gate, drop=True), batch_format="pyarrow",
        zero_copy_batch=True)
    from datavec_ray.misc import sessionize
    sessions = sessionize(on_time, keys=list(keys), order_col="__ts_ms",
                          gap=gap_ms, tiebreak=order_col)
    return sessions.drop_columns(["__ts_ms"]), dropped


def stream_join(ds, side_col: str, left_value, right_value,
                band_ms: int, delay_ms: int,
                allowed_lateness_ms: int = 0,
                keys: Sequence[str] = ("conv_id",),
                ts_col: str = "ts", order_col: str = "lsn",
                suffix: str = "_r"):
    """Watermark-gated stream-stream INTERVAL join (the Flink
    two-stream primitive): one arrival stream carries both sides
    (``side_col`` ∈ {left_value, right_value}); each event is gated at
    ITS arrival (dropped to the side output iff its event time is at or
    below ``watermark − allowed_lateness``, the moment an online engine
    would have purged the matching state); accepted LEFT events join
    accepted RIGHT events of the same key with event time within
    ``± band_ms``. Returns ``(joined, dropped)``; the joined set equals
    what an online engine with band-sized state retention would have
    emitted in total.

    Shape: one metadata-only watermark pass (shuffle-free on
    lsn-contiguous blocks) → vectorized gate map → ONE hash-bucket
    co-partition of both sides (`join.range_join`), per bucket two
    searchsorted passes. Raw events cross the wire once.
    """
    import functools

    from datavec_ray.join import range_join

    tagged = assign_watermarks(ds, delay_ms, ts_col=ts_col,
                               order_col=order_col).materialize()
    L = np.int64(allowed_lateness_ms)

    def _gate(batch: pa.Table, drop: bool) -> pa.Table:
        ts = np.asarray(_ts_ms(batch[ts_col]).combine_chunks())
        wm = np.asarray(pc.cast(batch["wm_ms"], pa.int64()).combine_chunks())
        late = ts <= wm - L
        out = batch.filter(pa.array(late if drop else ~late))
        if drop:
            return out
        keep_ts = np.asarray(_ts_ms(out[ts_col]).combine_chunks())
        return out.drop_columns(["wm_ms", "is_late"]).append_column(
            "__ts_ms", pa.array(keep_ts, pa.int64()))

    on_time = tagged.map_batches(functools.partial(_gate, drop=False),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True)
    dropped = tagged.map_batches(functools.partial(_gate, drop=True),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True)

    def side(batch: pa.Table, want) -> pa.Table:
        return batch.filter(pc.equal(batch[side_col], want))

    left = on_time.map_batches(functools.partial(side, want=left_value),
                               batch_format="pyarrow")
    right = on_time.map_batches(functools.partial(side, want=right_value),
                                batch_format="pyarrow")
    joined = range_join(left, right, on="__ts_ms", by=list(keys),
                        lower=-int(band_ms), upper=int(band_ms),
                        suffix=suffix)
    return joined, dropped
