"""Measure assign_watermarks' two block-stability strategies at scale:

- materialize: pin the input once in the object store (spills under
  pressure), run both passes over the pinned blocks (default path);
- replan: re-execute the read plan for each pass — one extra source
  read, ZERO object-store residency (opt-in ``replan=`` path).

Run (round-4 verdict ask #4):
    GRAFT_EVENTS_MULT=8 python scripts/measure_watermark_replan.py

Prints one JSON line with best-of-2 interleaved wall times per
variant and the (asserted-equal) late-event counts.
"""

import json
import os
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def consume(tagged):
    """Force full execution, returning (late_count, max_wm) without
    materializing the tagged dataset on the driver."""
    def agg(t: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.array([int(pc.sum(pc.cast(
                t["is_late"], pa.int64())).as_py() or 0)], pa.int64()),
            "w": pa.array([int(pc.max(t["wm_ms"]).as_py())], pa.int64()),
        })
    rows = tagged.map_batches(agg, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    return sum(r["n"] for r in rows), max(r["w"] for r in rows)


def main():
    import ray
    import ray.data as rd
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from bench import binlog_path, warm_cluster
    from datavec_ray.cdc.watermark import assign_watermarks

    sf = float(os.environ.get("GRAFT_SF", "0.1"))
    path = binlog_path(sf)
    warm_cluster()
    delay = 3_600_000

    def run_mat():
        ds = rd.read_parquet(path)
        return consume(assign_watermarks(ds, delay))

    def run_replan():
        return consume(assign_watermarks(
            rd.read_parquet(path), delay,
            replan=lambda: rd.read_parquet(path)))

    results = {"materialize": [], "replan": []}
    counts = set()
    for _ in range(2):                 # interleaved best-of-2
        for name, fn in (("materialize", run_mat), ("replan", run_replan)):
            t0 = time.time()
            n, w = fn()
            results[name].append(round(time.time() - t0, 2))
            counts.add((n, w))
    assert len(counts) == 1, f"variant results diverge: {counts}"
    n, w = counts.pop()
    out = {
        "metric": "watermark_assign_sec",
        "sf": sf,
        "events_mult": float(os.environ.get("GRAFT_EVENTS_MULT", "1")),
        "late_events": n,
        "materialize_sec": min(results["materialize"]),
        "replan_sec": min(results["replan"]),
        "runs": results,
        "replan_overhead_pct": round(
            100 * (min(results["replan"])
                   / max(min(results["materialize"]), 1e-9) - 1), 1),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
