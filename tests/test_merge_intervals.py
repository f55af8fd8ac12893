"""merge_intervals: gaps-and-islands interval coalescing per key."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from datavec_ray.misc import merge_intervals


def _run(df, gap=0):
    out = merge_intervals(rd.from_pandas(df), ["k"], "s", "e",
                          min_gap=gap).to_pandas()
    return out.sort_values(["k", "s"]).reset_index(drop=True)


def test_golden_islands(ray_session):
    df = pd.DataFrame({
        "k": ["a", "a", "a", "a", "b"],
        "s": [0, 5, 10, 30, 2],
        "e": [7, 6, 20, 40, 3],
    })
    out = _run(df)
    # a: [0,7]+[5,6]+[10,20] -> [0,7] touches nothing at 10? 7 < 10 so
    # [0,7] (2 intervals), [10,20], [30,40]; b: [2,3]
    want = pd.DataFrame({
        "k": ["a", "a", "a", "b"],
        "s": [0, 10, 30, 2],
        "e": [7, 20, 40, 3],
        "n": [2, 1, 1, 1],
    })
    pd.testing.assert_frame_equal(out.astype({"n": "int64"}), want)


def test_touching_merges_and_gap(ray_session):
    df = pd.DataFrame({"k": [1, 1, 1], "s": [0, 5, 11], "e": [5, 8, 12]})
    out = _run(df)                      # s=5 == prior end 5 -> merge
    assert out["n"].tolist() == [2, 1]
    out2 = _run(df, gap=3)              # 11 <= 8+3 -> all one island
    assert out2["n"].tolist() == [3]
    assert out2.loc[0, ["s", "e"]].tolist() == [0, 12]


def test_null_rows_dropped_and_contained_intervals(ray_session):
    df = pd.DataFrame({
        "k": [1, 1, 1],
        "s": pd.array([0, None, 2], dtype="Int64"),
        "e": pd.array([100, 50, 3], dtype="Int64"),
    })
    out = _run(df)
    assert len(out) == 1 and out.loc[0, "n"] == 2
    assert (out.loc[0, "s"], out.loc[0, "e"]) == (0, 100)


def test_timestamp_intervals_keep_type(ray_session):
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "k": [1, 1],
        "s": [base, base + pd.Timedelta(minutes=30)],
        "e": [base + pd.Timedelta(hours=1), base + pd.Timedelta(hours=2)],
    })
    out = _run(df)
    assert len(out) == 1
    assert pd.Timestamp(out.loc[0, "e"]) == base + pd.Timedelta(hours=2)


def test_matches_reference_on_random(ray_session):
    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "s": rng.integers(0, 2000, n).astype(np.int64),
    })
    df["e"] = df["s"] + rng.integers(0, 60, n)

    def ref(df, gap):
        rows = []
        for k, g in df.sort_values(["s", "e"]).groupby("k"):
            cur = None
            for s, e in zip(g["s"], g["e"]):
                if cur and s <= cur[1] + gap:
                    cur[1] = max(cur[1], e)
                    cur[2] += 1
                else:
                    if cur:
                        rows.append([k] + cur)
                    cur = [s, e, 1]
            rows.append([k] + cur)
        return pd.DataFrame(rows, columns=["k", "s", "e", "n"]) \
            .sort_values(["k", "s"]).reset_index(drop=True)

    for gap in (0, 7):
        got = _run(df, gap=gap).astype("int64")
        pd.testing.assert_frame_equal(got, ref(df, gap).astype("int64"))
