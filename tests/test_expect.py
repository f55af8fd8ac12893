"""Tests: declarative expectations suite (datavec_ray/expect.py)."""

import pyarrow as pa
import pytest


def test_expect_rules(ray_session):
    import ray
    from datavec_ray.expect import expect

    t = pa.table({
        "k": pa.array([1, 2, 2, 3, None], pa.int64()),
        "v": pa.array([0.5, 1.5, 2.0, 9.0, None]),
        "f": ["A", "B", "A", "Z", "A"],
    })
    out = expect(ray.data.from_arrow(t).repartition(3), [
        {"column": "k", "check": "not_null"},
        {"column": "v", "check": "between", "lo": 0, "hi": 2},
        {"column": "f", "check": "in_set", "value": ["A", "B"]},
        {"column": "v", "check": "null_fraction_le", "value": 0.3},
        {"column": "k", "check": "unique"},
        {"column": "v", "check": "min_ge", "value": 0},
    ])
    rows = {(r["rule"], r["column"]): r for r in out.to_pylist()}
    assert rows[("not_null", "k")]["violations"] == 1
    assert not rows[("not_null", "k")]["passed"]
    assert rows[("between", "v")]["violations"] == 1      # 9.0
    assert rows[("in_set", "f")]["violations"] == 1       # Z
    assert rows[("null_fraction_le", "v")]["passed"]      # 1/5 <= 0.3
    assert rows[("unique", "k")]["violations"] == 1       # dup 2
    assert rows[("min_ge", "v")]["passed"]


def test_expect_rejects_unknown_check(ray_session):
    import ray
    from datavec_ray.expect import expect
    ds = ray.data.from_arrow(pa.table({"x": [1]}))
    with pytest.raises(ValueError):
        expect(ds, [{"column": "x", "check": "wat"}])
