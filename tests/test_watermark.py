"""Event-time watermarks / late routing / emit-on-watermark windows
(``datavec_ray/cdc/watermark.py``) vs a sequential single-process
reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from datavec_ray.cdc.binlog import synth_binlog

DELAY = 5_000


def _reference(bl: pa.Table, delay_ms: int):
    df = bl.to_pandas().sort_values("lsn").reset_index(drop=True)
    ts = df["ts"].values.astype("datetime64[ms]").astype("int64")
    run = np.maximum.accumulate(ts)
    wm = np.empty(len(ts), np.int64)
    wm[0] = -1
    wm[1:] = run[:-1] - delay_ms
    late = np.zeros(len(ts), bool)
    late[1:] = ts[1:] < run[:-1] - delay_ms
    return df, ts, run, wm, late


def test_assign_watermarks_fast_path(ray_session):
    ray = ray_session
    from datavec_ray.cdc.watermark import assign_watermarks
    bl = synth_binlog(12_000, seed=11)
    ds = ray.data.from_arrow(bl).repartition(7)
    out = assign_watermarks(ds, DELAY).to_pandas().sort_values(
        "lsn").reset_index(drop=True)
    _, _, _, wm, late = _reference(bl, DELAY)
    assert (out["wm_ms"].values == wm).all()
    assert (out["is_late"].values == late).all()


def test_assign_watermarks_overlapping_blocks_fallback(ray_session):
    """Blocks that interleave in lsn must take the range-exchange path
    and still produce the exact global scan."""
    ray = ray_session
    from datavec_ray.cdc.watermark import assign_watermarks
    bl = synth_binlog(6_000, seed=13)
    # deal rows round-robin into 5 interleaved tables
    idx = np.arange(bl.num_rows)
    parts = [bl.take(pa.array(idx[idx % 5 == r])) for r in range(5)]
    ds = ray.data.from_arrow(parts)
    out = assign_watermarks(ds, DELAY, num_partitions=6).to_pandas()
    out = out.sort_values("lsn").reset_index(drop=True)
    _, _, _, wm, late = _reference(bl, DELAY)
    assert (out["wm_ms"].values == wm).all()
    assert (out["is_late"].values == late).all()
    assert "__rpart" not in out.columns


def test_route_late_events(ray_session):
    ray = ray_session
    from datavec_ray.cdc.watermark import route_late_events
    bl = synth_binlog(4_000, seed=5)
    ds = ray.data.from_arrow(bl).repartition(4)
    on_time, late = route_late_events(ds, DELAY)
    _, _, _, _, late_ref = _reference(bl, DELAY)
    assert on_time.count() == int((~late_ref).sum())
    assert late.count() == int(late_ref.sum())
    assert on_time.count() + late.count() == bl.num_rows


@pytest.mark.parametrize("lateness", [0, 120_000])
def test_windowed_stream_parity(ray_session, lateness):
    ray = ray_session
    from datavec_ray.cdc.watermark import windowed_stream
    W = 3_600_000
    bl = synth_binlog(10_000, seed=23)
    ds = ray.data.from_arrow(bl).repartition(6)
    win, dropped = windowed_stream(ds, window_ms=W, delay_ms=DELAY,
                                   allowed_lateness_ms=lateness)
    got = win.to_pandas().sort_values(["win", "role"]).reset_index(drop=True)

    df, ts, run, wm, _ = _reference(bl, DELAY)
    winid = ts // W
    drop = (winid + 1) * W + lateness <= wm
    keep = ~drop
    ref = (pd.DataFrame({"win": winid[keep], "role": df["role"].values[keep],
                         "v": df["turn_idx"].values[keep]})
           .groupby(["win", "role"], dropna=False)
           .agg(n=("v", "size"), val_sum=("v", "sum")).reset_index()
           .sort_values(["win", "role"]).reset_index(drop=True))
    assert dropped.count() == int(drop.sum())
    assert len(got) == len(ref)
    assert (got["n"].values == ref["n"].values).all()
    assert (got["val_sum"].values == ref["val_sum"].values).all()


def test_windowed_stream_matches_final_firing_semantics(ray_session):
    """The batch result equals an ONLINE engine's last firing per
    window: replaying events one at a time with watermark-gated
    accepts produces the same (window, key) -> (n, sum) map."""
    ray = ray_session
    from datavec_ray.cdc.watermark import windowed_stream
    W, L = 1_800_000, 60_000
    bl = synth_binlog(3_000, seed=31)
    df, ts, run, wm, _ = _reference(bl, DELAY)
    state: dict = {}
    for i in range(len(ts)):
        w = ts[i] // W
        if (w + 1) * W + L <= wm[i]:
            continue  # window already fired before this arrival
        key = (w, df["role"].values[i])
        n, s = state.get(key, (0, 0))
        state[key] = (n + 1, s + int(df["turn_idx"].values[i]))
    ds = ray.data.from_arrow(bl).repartition(5)
    win, _ = windowed_stream(ds, window_ms=W, delay_ms=DELAY,
                             allowed_lateness_ms=L)
    got = win.to_pandas()
    assert len(got) == len(state)
    for _, r in got.iterrows():
        role = r["role"] if pd.notna(r["role"]) else None
        assert state[(r["win"], role)] == (r["n"], r["val_sum"])


def test_hopping_stream_parity(ray_session):
    """W=3600s, S=1800s: every event lands in 2 windows; pairs gate
    independently on the watermark at arrival."""
    ray = ray_session
    from datavec_ray.cdc.watermark import windowed_stream
    W, S, L = 3_600_000, 1_800_000, 60_000
    bl = synth_binlog(8_000, seed=17)
    ds = ray.data.from_arrow(bl).repartition(6)
    win, dropped = windowed_stream(ds, window_ms=W, delay_ms=DELAY,
                                   allowed_lateness_ms=L, slide_ms=S)
    got = win.to_pandas().sort_values(["win", "role"]).reset_index(drop=True)

    df, ts, run, wm, _ = _reference(bl, DELAY)
    rows = []
    for i in range(len(ts)):
        lo = (ts[i] - W) // S + 1
        for w in range(lo, ts[i] // S + 1):
            rows.append((w, df["role"].values[i],
                         int(df["turn_idx"].values[i]),
                         w * S + W + L <= wm[i]))
    ref = pd.DataFrame(rows, columns=["win", "role", "v", "drop"])
    assert dropped.count() == int(ref["drop"].sum())
    keep = ref[~ref["drop"]]
    refagg = (keep.groupby(["win", "role"], dropna=False)
              .agg(n=("v", "size"), val_sum=("v", "sum")).reset_index()
              .sort_values(["win", "role"]).reset_index(drop=True))
    assert len(got) == len(refagg)
    assert (got["n"].values == refagg["n"].values).all()
    assert (got["val_sum"].values == refagg["val_sum"].values).all()
    # hopping assigns ~2x the windows of tumbling (W/S = 2 overlap);
    # compare pre-gate universes (the late gate prunes both alike)
    assert ref["win"].nunique() > len(np.unique(ts // W))


def test_session_stream_parity(ray_session):
    ray = ray_session
    from datavec_ray.cdc.watermark import session_stream
    GAP, L = 500, 120_000  # synth per-conv gaps are 0-2000 ms
    DELAY_W = 3_600_000  # wide lateness band so conv gaps survive
    bl = synth_binlog(6_000, seed=29)
    ds = ray.data.from_arrow(bl).repartition(5)
    sessions, dropped = session_stream(ds, gap_ms=GAP, delay_ms=DELAY_W,
                                       allowed_lateness_ms=L)
    got = sessions.to_pandas().sort_values("lsn").reset_index(drop=True)

    df, ts, run, wm, _ = _reference(bl, DELAY_W)
    late = ts <= wm - L
    assert dropped.count() == int(late.sum())
    sub = df[~late].assign(tsm=ts[~late]).sort_values(
        ["conv_id", "tsm", "lsn"])
    brk = (sub.groupby("conv_id")["tsm"].diff() > GAP).astype(int)
    sid = brk.groupby(sub["conv_id"]).cumsum()
    ref = sub.assign(session_id=sid).sort_values("lsn")
    assert len(got) == len(ref)
    assert (got["lsn"].values == ref["lsn"].values).all()
    assert (got["session_id"].values == ref["session_id"].values).all()
    assert got["session_id"].max() > 0  # sessions actually split


def test_windowed_distinct_matches_exact(ray_session):
    """windowed_distinct == exact count(distinct) over the gated pairs
    (computed locally from the same watermark assignment)."""
    import ray
    import pyarrow.compute as pc
    from datavec_ray.cdc.watermark import assign_watermarks, windowed_distinct
    from datavec_ray.util import dataset_to_table

    rng = np.random.default_rng(5)
    n = 4000
    lsn = np.arange(1, n + 1)
    ts = np.cumsum(rng.integers(0, 120_000, n)) \
        - (lsn % 11) * 300_000          # out-of-order event time
    conv = np.array([f"c{int(x)}" for x in rng.integers(0, 60, n)])
    role = np.where(lsn % 2 == 0, "user", "assistant")
    t = pa.table({"lsn": pa.array(lsn, pa.int64()),
                  "ts_ms": pa.array(ts, pa.int64()),
                  "role": pa.array(role.tolist()),
                  "conv_id": pa.array(conv.tolist())})
    ds = ray.data.from_arrow(t).repartition(6)
    W, D, L = 3_600_000, 1_200_000, 300_000
    win, dropped = windowed_distinct(ds, W, D, allowed_lateness_ms=L,
                                     keys=["role"], ts_col="ts_ms",
                                     value_col="conv_id")
    got = dataset_to_table(win).to_pandas() \
        .sort_values(["win", "role"]).reset_index(drop=True)

    # local oracle: sequential watermark scan in lsn order
    order = np.argsort(lsn)
    wm = -np.inf
    seen = {}
    for i in order:
        w = ts[i] // W
        if not (w * W + W + L <= wm):
            seen.setdefault((w, role[i]), set()).add(conv[i])
        wm = max(wm, ts[i] - D)
    exp = sorted((int(w), r, len(s)) for (w, r), s in seen.items())
    assert list(map(tuple, got[["win", "role", "n_distinct"]]
                    .itertuples(index=False))) == exp


def test_stream_join_matches_online_simulation(ray_session):
    """stream_join == the pair set an online band-state engine emits
    (sequential simulation over arrival order)."""
    import ray
    from datavec_ray.cdc.watermark import stream_join
    from datavec_ray.util import dataset_to_table

    rng = np.random.default_rng(9)
    n = 1500
    lsn = np.arange(1, n + 1)
    # epoch-ms event times (the watermark contract: ts >= 0)
    ts = 10_000_000 + np.cumsum(rng.integers(0, 90_000, n)) \
        - (lsn % 7) * 400_000
    conv = np.array([f"c{int(x)}" for x in rng.integers(0, 25, n)])
    role = np.where(rng.integers(0, 2, n) == 0, "user", "assistant")
    t = pa.table({"lsn": pa.array(lsn, pa.int64()),
                  "ts_ms": pa.array(ts, pa.int64()),
                  "conv_id": pa.array(conv.tolist()),
                  "role": pa.array(role.tolist())})
    D, L, B = 1_000_000, 200_000, 900_000
    joined, dropped = stream_join(
        ray.data.from_arrow(t).repartition(5), side_col="role",
        left_value="user", right_value="assistant", band_ms=B,
        delay_ms=D, allowed_lateness_ms=L, keys=["conv_id"],
        ts_col="ts_ms", order_col="lsn")
    got = dataset_to_table(joined)
    got_pairs = sorted(zip(got["lsn"].to_pylist(), got["lsn_r"].to_pylist()))

    # online oracle: accept events whose ts > wm - L at arrival; pairs =
    # accepted user x accepted assistant, same conv, |dt| <= B
    wm, acc = -np.inf, []
    for i in range(n):
        if not (ts[i] <= wm - L):
            acc.append(i)
        wm = max(wm, ts[i] - D)
    exp = sorted((int(lsn[i]), int(lsn[j]))
                 for i in acc for j in acc
                 if role[i] == "user" and role[j] == "assistant"
                 and conv[i] == conv[j] and abs(int(ts[i]) - int(ts[j])) <= B)
    assert got_pairs == exp


def test_windowed_distinct_approx_tracks_exact(ray_session):
    """HLL mode: same windows, estimates within HLL tolerance of the
    exact counts (p=9 → ~4.6% standard error)."""
    import ray
    from datavec_ray.cdc.watermark import windowed_distinct
    from datavec_ray.util import dataset_to_table

    rng = np.random.default_rng(13)
    n = 6000
    lsn = np.arange(1, n + 1)
    ts = 10_000_000 + np.cumsum(rng.integers(0, 60_000, n))
    conv = np.array([f"c{int(x)}" for x in rng.integers(0, 400, n)])
    role = np.where(lsn % 2 == 0, "user", "assistant")
    t = pa.table({"lsn": pa.array(lsn, pa.int64()),
                  "ts_ms": pa.array(ts, pa.int64()),
                  "role": pa.array(role.tolist()),
                  "conv_id": pa.array(conv.tolist())})
    ds = ray.data.from_arrow(t).repartition(5)
    kw = dict(window_ms=3_600_000, delay_ms=600_000,
              allowed_lateness_ms=0, keys=["role"], ts_col="ts_ms",
              value_col="conv_id")
    exact, _ = windowed_distinct(ds, **kw)
    approx, _ = windowed_distinct(ds, approx=True, **kw)
    et = dataset_to_table(exact).to_pandas() \
        .set_index(["win", "role"])["n_distinct"]
    at = dataset_to_table(approx).to_pandas() \
        .set_index(["win", "role"])["n_distinct"]
    assert set(et.index) == set(at.index)
    for k, v in et.items():
        assert abs(at[k] - v) <= max(3, 0.15 * v), (k, at[k], v)
