"""Benchmark harness.

Headline: CDC replay — synthetic transcript binlog (deterministic,
sized to the scale factor) streamed through the hash-partitioned LWW
upsert engine into a Parquet lake (the BASELINE.json metric:
change-events/sec sustained upsert throughput). Plus representative
operator pipelines from __ray_entry__.queries() over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "events_per_sec": ...}

--scaling: runs the headline twice in fresh processes (num_cpus=8 and
32) on the SAME input and reports both throughputs + scaling
efficiency (T_8/T_32)/4 — the sandbox substitute for the N vs 4N node
criterion (BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_QUERIES = ["groupby_agg", "join_shuffle", "cdc_upsert", "exact_dedup",
                 "similarity_topk", "sequence_diff", "tumbling_window",
                 "reduce_ops"]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def binlog_path(sf: float, seed: int = 42) -> str:
    """Deterministic synthetic binlog parquet, cached under /tmp (the
    'binlog tail on storage' the engine replays)."""
    import pyarrow.parquet as pq
    from datavec_ray.cdc.binlog import synth_binlog

    num_events = max(50_000, int(12_000_000 * sf))
    path = f"/tmp/datavec_ray_binlog_sf{sf}_{seed}_{num_events}.parquet"
    if not os.path.exists(path):
        tbl = synth_binlog(num_events, seed=seed)
        pq.write_table(tbl, path + ".tmp")
        os.replace(path + ".tmp", path)
    return path


def run_headline(sf: float) -> dict:
    """CDC replay: read binlog parquet → upsert engine → committed lake."""
    import shutil

    import ray.data as rd
    from datavec_ray.cdc.engine import CdcIngestEngine

    path = binlog_path(sf)
    import pyarrow.parquet as pq
    n_events = pq.read_metadata(path).num_rows
    lake = f"/tmp/datavec_ray_bench_lake_{os.getpid()}"
    shutil.rmtree(lake, ignore_errors=True)
    # warm page cache so we measure compute+shuffle, not first disk read
    with open(path, "rb") as f:
        while f.read(1 << 24):
            pass
    num_parts = max(4, NUM_CPUS // 2)
    t0 = time.time()
    eng = CdcIngestEngine(lake, num_partitions=num_parts,
                          shard_num_cpus=0.5)
    ds = rd.read_parquet(path)
    eng.ingest(ds)
    eng.checkpoint("bench", 10 ** 12)
    lineage = eng.commit()
    sec = time.time() - t0
    rows = sum(l["rows"] for l in lineage)
    shutil.rmtree(lake, ignore_errors=True)
    return {"sec": round(sec, 3), "events": n_events,
            "events_per_sec": round(n_events / sec, 1), "lake_rows": rows}


def run_queries(sf_dir: str) -> dict[str, float]:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod
    from datavec_ray.util import table_from_result

    out = {}
    qs = entrymod.queries()
    for name in BENCH_QUERIES:
        t0 = time.time()
        res = table_from_result(qs[name](sf_dir))
        _ = res.num_rows
        out[name] = round(time.time() - t0, 3)
    return out


def main_once() -> dict:
    import logging

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sf = _sf_of(SF_DIR)
    headline = run_headline(sf)
    queries = run_queries(SF_DIR)
    result = {
        "metric": "cdc_replay_upsert_sec",
        "value": headline["sec"],
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "events": headline["events"],
        "events_per_sec": headline["events_per_sec"],
        "lake_rows": headline["lake_rows"],
    }
    ray.shutdown()
    return result


def main_scaling():
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    print(json.dumps({
        "metric": "cdc_replay_scaling",
        "sec_8": r_lo["value"], "sec_32": r_hi["value"],
        "events_per_sec_8": r_lo["events_per_sec"],
        "events_per_sec_32": r_hi["events_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "events": r_lo["events"], "sf": r_lo["sf"],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    else:
        print(json.dumps(main_once()))
