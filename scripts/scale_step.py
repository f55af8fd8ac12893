"""Decade scale step (round-4 verdict ask #5): run the heaviest sweep
queries at sf0.1 AND at the deterministic 10x tables from
``make_scaled_tables.py``, and record the wall-time ratio per query.
Anything super-linear (ratio well beyond the 10x data growth) is a
scale bug to fix, not to report.

    python scripts/make_scaled_tables.py     # once
    python scripts/scale_step.py             # writes SCALE_STEP_r05.json
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["sql_tpch_q5", "sql_tpch_q10", "sql_tpch_q21", "tpch_q18",
           "semantic_dedup", "kmeans_clusters", "jaccard_against",
           "tree_paths", "skew_join", "decontaminate", "curation_export",
           "dedup_against", "fuzzy_pairs", "cdc_merge", "cdc_multitable",
           "exact_dedup"]

SMALL = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG = os.environ.get("GRAFT_SF1_DIR", "/tmp/graft_sf1")


def main():
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entrymod
    from bench import warm_cluster
    from datavec_ray.util import table_from_result

    warm_cluster()
    qs = entrymod.queries()
    results = {}
    only = sys.argv[1:]
    for name in QUERIES:
        if only and name not in only:
            continue
        rec = {}
        for label, sf_dir in (("sf0_1", SMALL), ("sf1", BIG)):
            t0 = time.time()
            try:
                n = table_from_result(qs[name](sf_dir)).num_rows
                rec[label] = {"sec": round(time.time() - t0, 3), "rows": n}
            except Exception as e:      # noqa: BLE001 — record, continue
                rec[label] = {"error": f"{type(e).__name__}: {e}"[:300],
                              "sec": round(time.time() - t0, 3)}
        if "rows" in rec.get("sf0_1", {}) and "rows" in rec.get("sf1", {}):
            rec["ratio"] = round(rec["sf1"]["sec"]
                                 / max(rec["sf0_1"]["sec"], 1e-9), 2)
            rec["linear_or_better"] = rec["ratio"] <= 12.0
        results[name] = rec
        print(json.dumps({name: rec}))
    out = {"metric": "scale_step_10x", "small": SMALL, "big": BIG,
           "queries": results,
           "all_linear_or_better": all(
               r.get("linear_or_better", False) for r in results.values())}
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALE_STEP_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v.get("ratio") for k, v in results.items()}))
    ray.shutdown()


if __name__ == "__main__":
    main()
