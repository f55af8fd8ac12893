"""Single-process replay oracle for the CDC engine.

Semantics (FIXTURES.md §2, BASELINE.json north_star): apply change
events in LSN order into a dict keyed (conv_id, turn_idx); a new event
wins iff its (ts, lsn) is strictly greater than the stored one
(last-writer-wins on value timestamp, monotonic-LSN tiebreaker); "D"
removes the key (tombstone). Final table sorted by (conv_id, turn_idx).

Because every key keeps only its (ts, lsn)-argmax event, the final state
is invariant to the order events are applied in — that is the property
the distributed engine relies on; this oracle applies them strictly in
LSN order as the reference semantics.
"""

from __future__ import annotations

import pyarrow as pa

from datavec_ray.cdc.binlog import TRANSCRIPT_SCHEMA


def replay_oracle(binlog: pa.Table) -> pa.Table:
    binlog = binlog.sort_by("lsn")
    cols = binlog.to_pydict()
    has_tool = "tool" in binlog.column_names
    state: dict[tuple, tuple] = {}
    for i in range(binlog.num_rows):
        key = (cols["conv_id"][i], cols["turn_idx"][i])
        ts, lsn = cols["ts"][i], cols["lsn"][i]
        prev = state.get(key)
        if prev is not None and (ts, lsn) <= (prev[0], prev[1]):
            continue
        op = cols["op"][i]
        if op == "D":
            state[key] = (ts, lsn, None)
        else:
            row = (cols["role"][i], cols["text"][i],
                   cols["tool"][i] if has_tool else None, ts)
            state[key] = (ts, lsn, row)
    keys = sorted(k for k, v in state.items() if v[2] is not None)
    data = {"conv_id": [], "turn_idx": [], "role": [], "text": [],
            "tool": [], "ts": []}
    for k in keys:
        _, _, row = state[k]
        data["conv_id"].append(k[0])
        data["turn_idx"].append(k[1])
        data["role"].append(row[0])
        data["text"].append(row[1])
        data["tool"].append(row[2])
        data["ts"].append(row[3])
    return pa.table(data, schema=TRANSCRIPT_SCHEMA)
