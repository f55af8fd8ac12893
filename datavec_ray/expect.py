"""Declarative data-validation expectations (Great-Expectations-class
suite evaluated in ONE distributed aggregate pass).

The reference's quality analysis (`analysis/quality`, DataQualityAnalysis)
counts invalid/missing per column against the schema; this module is the
user-facing generalization: a rule list evaluated corpus-wide with a
per-rule violation count, so a 100 TB ingest can gate on "0 nulls in the
key, prices in range, flags in the enum" without materializing anything.

Rules (each a dict):
  {"column": c, "check": "not_null"}
  {"column": c, "check": "min_ge", "value": v}      # all x >= v
  {"column": c, "check": "max_le", "value": v}      # all x <= v
  {"column": c, "check": "between", "lo": a, "hi": b}
  {"column": c, "check": "in_set", "value": [..]}
  {"column": c, "check": "null_fraction_le", "value": f}
  {"column": c, "check": "unique"}                  # exact, one exchange

Scale shape: every rule except ``unique`` folds into a single
AggregateFn whose state is one int64 counter vector (2 slots per rule:
violations, rows considered) accumulated per block and merged by
addition — no shuffle at all. ``unique`` needs a distinct count, the
one rule that costs an exchange (map-side distinct combiner via
``misc.unique_values``).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_CHECKS = ("not_null", "min_ge", "max_le", "between", "in_set",
           "null_fraction_le", "unique")


def _violations(rule: dict, col) -> tuple[int, int]:
    """(violations, rows considered) of one rule over one block column."""
    n = len(col)
    check = rule["check"]
    if check == "not_null":
        return col.null_count, n
    if check == "null_fraction_le":
        return col.null_count, n          # fraction applied at finalize
    valid = col.drop_null()
    if check == "min_ge":
        bad = pc.less(valid, rule["value"])
    elif check == "max_le":
        bad = pc.greater(valid, rule["value"])
    elif check == "between":
        bad = pc.or_(pc.less(valid, rule["lo"]),
                     pc.greater(valid, rule["hi"]))
    elif check == "in_set":
        bad = pc.invert(pc.is_in(valid, value_set=pa.array(rule["value"])))
    else:
        raise ValueError(f"unknown check {check!r}")
    return int(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0), n


def expect(ds, rules: Sequence[dict]) -> pa.Table:
    """Evaluate a rule suite; returns one tidy row per rule:
    (rule, column, violations, rows, passed)."""
    from ray.data.aggregate import AggregateFn

    rules = [dict(r) for r in rules]
    for r in rules:
        if r["check"] not in _CHECKS:
            raise ValueError(f"unknown check {r['check']!r}")
    inline = [(i, r) for i, r in enumerate(rules) if r["check"] != "unique"]
    uniq = [(i, r) for i, r in enumerate(rules) if r["check"] == "unique"]

    viol = np.zeros(len(rules), dtype=np.int64)
    rows = np.zeros(len(rules), dtype=np.int64)
    if inline:
        def acc(state, blk: pa.Table):
            out = (np.zeros(2 * len(inline), dtype=np.int64)
                   if state is None else state.copy())
            for slot, (_, r) in enumerate(inline):
                v, n = _violations(r, blk[r["column"]])
                out[2 * slot] += v
                out[2 * slot + 1] += n
            return out

        agg = AggregateFn(
            init=lambda _: None, accumulate_block=acc,
            merge=lambda a, b: b if a is None else
            (a if b is None else a + b),
            finalize=lambda s: s, name="expect")
        state = np.asarray(ds.aggregate(agg)["expect"])
        for slot, (i, _) in enumerate(inline):
            viol[i] = state[2 * slot]
            rows[i] = state[2 * slot + 1]
    for i, r in uniq:
        from datavec_ray.misc import unique_values
        c = r["column"]

        def drop_nulls(b: pa.Table, c=c) -> pa.Table:
            return b.select([c]).filter(pc.is_valid(b[c]))

        nonnull = ds.map_batches(drop_nulls, batch_format="pyarrow")
        nn = nonnull.count()
        distinct = len(unique_values(nonnull, c))
        viol[i] = nn - distinct       # duplicated non-null occurrences
        rows[i] = ds.count()

    passed = []
    for i, r in enumerate(rules):
        if r["check"] == "null_fraction_le":
            ok = rows[i] == 0 or (viol[i] / rows[i]) <= r["value"]
        else:
            ok = viol[i] == 0
        passed.append(bool(ok))
    return pa.table({
        "rule": pa.array([r["check"] for r in rules]),
        "column": pa.array([r.get("column", "") for r in rules]),
        "violations": pa.array(viol),
        "rows": pa.array(rows),
        "passed": pa.array(passed),
    })
