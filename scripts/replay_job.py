"""`ray job submit` entrypoint for the CDC replay pipeline.

On a real cluster:

    ray job submit --working-dir . -- \
        python scripts/replay_job.py --binlog /data/binlog \
            --lake /data/lake --partitions 64

connects to the cluster Ray (RAY_ADDRESS from the job environment),
streams the binlog parquet through the two-stage replay exchange into
the lake, and prints one JSON line of lineage/metrics (events applied,
rows, dedup counts, LSN range, seconds, events/sec). Re-submitting
after a crash resumes from the last manifest checkpoint (idempotent
commits; see CdcIngestEngine.replay). In this sandbox the same script
runs single-node: --synth N generates the deterministic binlog instead
of reading one.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--binlog", help="directory of binlog parquet segments")
    p.add_argument("--synth", type=int, default=0,
                   help="generate a deterministic synthetic binlog of N "
                        "events instead of --binlog")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--lake", required=True, help="lake output directory")
    p.add_argument("--partitions", type=int, default=32)
    p.add_argument("--checkpoint-name", default="replay")
    p.add_argument("--num-cpus", type=int, default=0,
                   help="local mode only; on a cluster leave 0")
    args = p.parse_args()
    if not args.binlog and not args.synth:
        p.error("one of --binlog / --synth is required")

    import ray
    if not ray.is_initialized():
        if args.num_cpus:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        else:
            ray.init(logging_level="ERROR")   # cluster address from env
    import ray.data as rd
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from datavec_ray.cdc.engine import CdcIngestEngine

    if args.binlog:
        ds = rd.read_parquet(args.binlog)
        events = ds.count()
    else:
        from datavec_ray.cdc.binlog import synth_binlog
        tbl = synth_binlog(args.synth, seed=args.seed)
        events = tbl.num_rows
        ds = rd.from_arrow(tbl)

    eng = CdcIngestEngine(args.lake, num_partitions=args.partitions)
    t0 = time.time()
    lineages = eng.replay(ds, checkpoint_name=args.checkpoint_name)
    sec = time.time() - t0
    applied = sum(l["events_applied"] for l in lineages)
    print(json.dumps({
        "metric": "cdc_replay_job",
        "events": events, "events_applied": applied,
        "rows": sum(l["rows"] for l in lineages),
        "stale_dropped": sum(l["stale_dropped"] for l in lineages),
        "deletes": sum(l["deletes"] for l in lineages),
        "lsn_lo": min((l["lsn_lo"] for l in lineages), default=0),
        "lsn_hi": max((l["lsn_hi"] for l in lineages), default=0),
        "partitions": args.partitions,
        "sec": round(sec, 3),
        "events_per_sec": round(applied / sec, 1) if sec else None,
    }))
    eng.shutdown()
    ray.shutdown()


if __name__ == "__main__":
    main()
