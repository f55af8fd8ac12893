"""Calm-window re-bench of the four queries BENCH_r04 showed >15%
slower than BENCH_r03 at identical input (round-4 verdict ask #3):
interleaved best-of-3, compared against each query's best recorded
time. A calm window is confirmed by the headline-replay canary first
(BASELINE.md: a fast sf0.1 replay indicates one).

    python scripts/rebench_regressed.py          # writes REBENCH_r05.json
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# best recorded times (BENCH_r03, same sf0.1 / 32 CPUs input)
BEST = {"cdc_merge": 2.34, "windowed_stream": 1.12,
        "cdc_zonemap": 1.04, "cdc_replicate": 1.61}


def main():
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    from bench import run_headline, warm_cluster
    from datavec_ray.util import table_from_result

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_cluster()
    canary = run_headline(0.1)
    qs = entrymod.queries()
    runs = {k: [] for k in BEST}
    for _ in range(3):
        for name in BEST:
            t0 = time.time()
            _ = table_from_result(qs[name](sf_dir)).num_rows
            runs[name].append(round(time.time() - t0, 3))
    out = {"canary_headline_sec": round(canary["sec"], 3),
           "queries": {}}
    for name, best_ref in BEST.items():
        best_now = min(runs[name])
        out["queries"][name] = {
            "runs": runs[name], "best": best_now,
            "best_recorded_r03": best_ref,
            "within_15pct": best_now <= best_ref * 1.15,
        }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "REBENCH_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
