"""Staged 4 x 96M-event delta-mode replay — the 10^10-event
steady-state cadence demonstration (round-4 item 2).

Models the north rule's steady state: a large lake (segment 0 bulk:
~67M live keys) receiving successive 96M-event commit batches whose
working set is BOUNDED (segments 1-3 touch a ~1M-conversation subset,
~8M keys ≈ 12% of state), with ``commit_mode="delta"`` so each commit
appends one LSM delta segment per partition (write volume ∝ delta, not
state) and a periodic ``compact()`` folding deltas into the base.

Pass criteria (VERDICT round-3 item 2):
- per-segment replay throughput flat within ~25% as the lake grows;
- bytes written per incremental segment ∝ its delta rows, a small
  fraction of what a full state rewrite would cost.

Usage: python scripts/staged_replay_384m.py [--events N] [--segments K]
Writes /tmp/staged_replay_384m.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def seg_path(i: int, events: int, seed: int, num_convs: int,
             lsn_off: int, ts_off_ms: int) -> str:
    """Generate (once) and cache one binlog segment as a parquet dir."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from datavec_ray.cdc.binlog import synth_binlog

    path = (f"/tmp/staged384_seg{i}_{events}_{seed}_{num_convs}")
    if os.path.isdir(path):
        return path
    t0 = time.time()
    tbl = synth_binlog(events, num_convs=num_convs, seed=seed)
    if lsn_off or ts_off_ms:
        lsn = pc.add(tbl["lsn"], pa.scalar(lsn_off, pa.int64()))
        ts = pc.add(tbl["ts"].cast(pa.int64()),
                    pa.scalar(ts_off_ms, pa.int64())).cast(
            tbl.schema.field("ts").type)
        tbl = tbl.set_column(tbl.schema.get_field_index("lsn"),
                             "lsn", lsn)
        tbl = tbl.set_column(tbl.schema.get_field_index("ts"), "ts", ts)
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    n_seg = max(8, min(96, events // 1_500_000))
    rows = (tbl.num_rows + n_seg - 1) // n_seg
    for j in range(n_seg):
        part = tbl.slice(j * rows, rows)
        if part.num_rows:
            pq.write_table(part, os.path.join(tmp, f"f-{j:04d}.parquet"),
                           row_group_size=131_072)
    del tbl
    os.replace(tmp, path)
    print(f"segment {i}: generated {events} events in "
          f"{time.time()-t0:.0f}s -> {path}", flush=True)
    return path


def lake_bytes(lake: str) -> int:
    return sum(os.path.getsize(os.path.join(lake, f))
               for f in os.listdir(lake) if f.endswith(".parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=96_000_000,
                    help="events per segment")
    ap.add_argument("--segments", type=int, default=4)
    ap.add_argument("--tail-convs", type=int, default=1_000_000,
                    help="conversation subset touched by segments >=1")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--compact-every", type=int, default=2)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from bench import warm_cluster
    from datavec_ray.cdc.engine import CdcIngestEngine

    lake = f"/tmp/staged384_lake_{os.getpid()}"
    shutil.rmtree(lake, ignore_errors=True)
    eng = CdcIngestEngine(lake, num_partitions=32, commit_mode="delta")
    rd.range(10_000).map_batches(lambda b: b).count()
    warm_cluster()

    segs = []
    for i in range(args.segments):
        # segment 0: full population bulk; later segments: bounded
        # working set (the steady-state cadence), time advancing so
        # touched keys genuinely re-win under LWW
        nc = 0 if i == 0 else args.tail_convs
        path = seg_path(i, args.events, 42 + i, nc,
                        lsn_off=i * args.events,
                        ts_off_ms=i * 1_000_000_000)
        before = lake_bytes(lake)
        t0 = time.time()
        lineage = eng.replay(rd.read_parquet(path),
                             checkpoint_name=f"seg{i}")
        sec = time.time() - t0
        rows = sum(l["rows"] for l in lineage)
        delta = sum(l["delta_rows"] if l.get("delta_rows") is not None
                    else l["rows"] for l in lineage)
        written = lake_bytes(lake) - before
        rec = {"segment": i, "events": args.events,
               "sec": round(sec, 2),
               "events_per_sec": round(args.events / sec, 1),
               "state_rows": rows, "delta_rows_shipped": delta,
               "bytes_written": written}
        if args.compact_every and i and i % args.compact_every == 0:
            t1 = time.time()
            eng.compact()
            rec["compact_sec"] = round(time.time() - t1, 2)
        segs.append(rec)
        print(json.dumps(rec), flush=True)

    rates = [s["events_per_sec"] for s in segs]
    out = {
        "metric": "staged_delta_replay",
        "segments": segs,
        "total_events": args.events * args.segments,
        "total_sec": round(sum(s["sec"] for s in segs), 2),
        "throughput_flatness": round(min(rates) / max(rates), 3),
        "num_cpus": args.cpus,
    }
    eng.shutdown()
    shutil.rmtree(lake, ignore_errors=True)
    with open("/tmp/staged_replay_384m.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
