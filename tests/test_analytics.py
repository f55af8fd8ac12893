"""Funnel / cohort retention (``datavec_ray/ops/analytics.py``) vs a
sequential per-user reference on synthetic event streams."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _synth_events(n=6_000, n_users=40, n_types=4, seed=3):
    rng = np.random.default_rng(seed)
    types = [f"t{i}" for i in range(n_types)]
    df = pd.DataFrame({
        "user_id": rng.integers(0, n_users, n),
        "event_type": rng.choice(types, n),
        # coarse grid forces ts ties within users (strict-> must hold)
        "ts_ms": rng.integers(0, 500, n).astype(np.int64) * 1000,
    })
    return df, types


def _funnel_ref(df, steps, within=None):
    counts = []
    reached = {u: -(1 << 62) for u in df["user_id"].unique()}
    for k, s in enumerate(steps):
        nxt = {}
        sub = df[df["event_type"] == s]
        for u, f in reached.items():
            cand = sub[(sub["user_id"] == u) & (sub["ts_ms"] > f)]
            if within is not None and k > 0:
                cand = cand[cand["ts_ms"] <= f + within]
            if len(cand):
                nxt[u] = int(cand["ts_ms"].min())
        counts.append(len(nxt))
        reached = nxt
    return counts


@pytest.mark.parametrize("within", [None, 30_000])
def test_funnel_parity(ray_session, within):
    ray = ray_session
    from datavec_ray.ops.analytics import funnel
    df, types = _synth_events()
    steps = types[:3]
    ds = ray.data.from_pandas(df.sample(frac=1.0, random_state=1)
                              ).repartition(5)
    got = funnel(ds, steps, ts_col="ts_ms", within_ms=within,
                 num_partitions=4).to_pandas().sort_values(
        "step").reset_index(drop=True)
    ref = _funnel_ref(df, steps, within)
    assert list(got["event_type"]) == steps
    assert list(got["n_users"]) == ref
    if within is not None:
        assert ref[0] > ref[-1] > 0  # windowed funnel discriminates


def test_funnel_strictness_on_ties(ray_session):
    """Two steps at the SAME ts must not chain (strict >)."""
    ray = ray_session
    from datavec_ray.ops.analytics import funnel
    df = pd.DataFrame({
        "user_id": [1, 1, 2, 2],
        "event_type": ["a", "b", "a", "b"],
        "ts_ms": np.array([100, 100, 100, 200], np.int64),
    })
    got = funnel(ray.data.from_pandas(df), ["a", "b"], ts_col="ts_ms",
                 num_partitions=2).to_pandas().sort_values("step")
    assert list(got["n_users"]) == [2, 1]  # user 1's tie doesn't chain


def test_cohort_retention_parity(ray_session):
    ray = ray_session
    from datavec_ray.ops.analytics import cohort_retention
    df, _ = _synth_events(seed=9)
    P = 50_000
    ds = ray.data.from_pandas(df.sample(frac=1.0, random_state=2)
                              ).repartition(6)
    got = cohort_retention(ds, P, ts_col="ts_ms", num_partitions=4
                           ).to_pandas().sort_values(
        ["cohort", "offset"]).reset_index(drop=True)
    per = df.assign(per=df["ts_ms"] // P)[["user_id", "per"]].drop_duplicates()
    coh = per.groupby("user_id")["per"].min().rename("c")
    ref = (per.join(coh, on="user_id")
           .assign(offset=lambda d: d["per"] - d["c"])
           .groupby(["c", "offset"]).size().rename("n_users").reset_index()
           .sort_values(["c", "offset"]).reset_index(drop=True))
    assert len(got) == len(ref)
    assert (got["cohort"].values == ref["c"].values).all()
    assert (got["offset"].values == ref["offset"].values).all()
    assert (got["n_users"].values == ref["n_users"].values).all()
    # offset 0 row per cohort counts the whole cohort
    z = got[got["offset"] == 0].set_index("cohort")["n_users"]
    sizes = coh.value_counts()
    for c, n in z.items():
        assert sizes[c] == n


def test_pairwise_corr_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from datavec_ray.ops.analytics import pairwise_corr

    rng = np.random.default_rng(13)
    a = rng.normal(size=2000)
    t = pa.table({"a": a, "b": 2 * a + rng.normal(size=2000),
                  "c": rng.normal(size=2000)})
    out = pairwise_corr(rd.from_arrow(t).repartition(7), ["a", "b", "c"])
    got = {(r, c): v for r, c, v in zip(out["col_a"].to_pylist(),
                                        out["col_b"].to_pylist(),
                                        out["corr"].to_pylist())}
    ref = np.corrcoef(np.column_stack([a, t["b"].to_numpy(),
                                       t["c"].to_numpy()]), rowvar=False)
    assert abs(got[("a", "b")] - ref[0, 1]) < 1e-9
    assert abs(got[("a", "c")] - ref[0, 2]) < 1e-9
    assert abs(got[("b", "c")] - ref[1, 2]) < 1e-9
    # nulls: complete-case rows only
    t2 = pa.table({"a": [1.0, 2.0, None, 4.0], "b": [2.0, 4.0, 9.0, 8.0]})
    out2 = pairwise_corr(rd.from_arrow(t2), ["a", "b"])
    assert abs(out2["corr"][0].as_py() - 1.0) < 1e-12


def test_grouped_linreg_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from datavec_ray.ops.analytics import grouped_linreg
    from datavec_ray.util import dataset_to_table

    rng = np.random.default_rng(3)
    g = np.repeat(["a", "b"], 500)
    x = rng.normal(size=1000)
    y = np.where(g == "a", 3 * x + 1, -2 * x + 5) + rng.normal(
        scale=0.1, size=1000)
    t = pa.table({"g": g, "x": x, "y": y})
    out = dataset_to_table(grouped_linreg(
        rd.from_arrow(t).repartition(6), ["g"], "x", "y")).sort_by("g")
    for i, grp in enumerate(out["g"].to_pylist()):
        m = g == grp
        want = np.polyfit(x[m], y[m], 1)
        assert abs(out["slope"][i].as_py() - want[0]) < 1e-6
        assert abs(out["intercept"][i].as_py() - want[1]) < 1e-6
    assert out["n"].to_pylist() == [500, 500]
    # zero-variance group -> null slope; null rows dropped
    t2 = pa.table({"g": ["z"] * 3 + ["w"] * 2,
                   "x": [2.0, 2.0, 2.0, 1.0, None],
                   "y": [1.0, 2.0, 3.0, 4.0, 5.0]})
    o2 = dataset_to_table(grouped_linreg(rd.from_arrow(t2), ["g"],
                                         "x", "y")).sort_by("g")
    rows = {k: (s, n) for k, s, n in zip(o2["g"].to_pylist(),
                                         o2["slope"].to_pylist(),
                                         o2["n"].to_pylist())}
    assert rows["z"][0] is None or np.isnan(rows["z"][0])
    assert rows["w"][1] == 1   # the null row dropped


def test_key_skew_report(ray_session):
    import ray
    from datavec_ray.ops.analytics import key_skew

    vals = ["hot"] * 50 + ["warm"] * 30 + ["a"] * 10 + ["b"] * 10
    ds = ray.data.from_arrow(pa.table({"k": pa.array(vals)}))
    out = key_skew(ds, "k", k=3)
    assert out["value"].to_pylist() == ["hot", "warm", "a"]
    assert out["cnt"].to_pylist() == [50, 30, 10]
    assert np.allclose(out["share"].to_numpy(), [0.5, 0.3, 0.1])
    assert np.allclose(out["cum_share"].to_numpy(), [0.5, 0.8, 0.9])


def test_cooccurrence_counts_and_lift(ray_session):
    import ray
    from datavec_ray.ops.analytics import cooccurrence

    t = pa.table({
        "g": ["c1", "c1", "c1", "c2", "c2", "c3", "c3", "c1"],
        "i": ["x", "y", "z", "x", "y", "x", None, "x"],  # dup (c1,x)
    })
    out = cooccurrence(ray.data.from_arrow(t).repartition(3), "g", "i")
    rows = {(r["tool_a"], r["tool_b"]): r for r in out.to_pylist()}
    # groups: c1={x,y,z}, c2={x,y}, c3={x}; total = 3 groups
    assert rows[("x", "y")]["n_ab"] == 2
    assert rows[("x", "y")]["n_a"] == 3 and rows[("x", "y")]["n_b"] == 2
    assert abs(rows[("x", "y")]["support"] - 2 / 3) < 1e-12
    assert abs(rows[("x", "y")]["lift"] - (2 * 3) / (3 * 2)) < 1e-12
    assert rows[("x", "z")]["n_ab"] == 1
    assert rows[("y", "z")]["n_ab"] == 1
    assert len(rows) == 3
