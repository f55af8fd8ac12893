"""Streaming steady-state demo (round-4 verdict ask #6): one
continuous run in which N WAL segments arrive one at a time and, after
EVERY arrival,

- the engine's ``tail()`` ingests the new segment (delta commits,
  exactly-once manifest, checkpoint per segment),
- an incremental ``AggView`` advances with the snapshot-to-snapshot
  retract feed (work proportional to the delta),
- a follower mirror catches up via ``replicate_to`` (the change feed
  between replicated snapshots),

and two equality gates run: the incremental view must equal a
from-scratch rebuild over the live lake, and the mirror's live state
hash must equal the source's. A final independent gate replays a
deterministic sample of conversations through the pure-Python
``replay_oracle`` and compares the lake rows.

Writes STREAMING_STEADY.json: per-segment ingest/view/mirror
latencies, live-state growth, and the flatness ratio (last-2 mean
ingest over segments-2-3 mean — delta commits keep per-segment work
bounded by the delta while state grows).

    GRAFT_STREAM_EVENTS=6000000 GRAFT_STREAM_SEGMENTS=8 \
        python scripts/streaming_steady_state.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def state_fingerprint(eng):
    """Order-insensitive content hash + row count of a lake's live
    state, computed with bounded per-block partials (no driver
    materialization of the state)."""
    import numpy as np

    from datavec_ray.hll import hash64
    from datavec_ray.steps.base import combine

    ds = eng.read_lake_dataset(
        columns=["conv_id", "turn_idx", "role", "text", "ts"])

    def part(t: pa.Table) -> pa.Table:
        h = None
        for c in ("conv_id", "turn_idx", "role", "text", "ts"):
            col = combine(pc.cast(t[c], pa.string(), safe=False))
            hc = hash64(col).astype(np.uint64)
            h = hc if h is None else h * np.uint64(1099511628211) + hc
        return pa.table({
            "x": pa.array([int(np.bitwise_xor.reduce(h)) if len(h)
                           else 0], pa.uint64()),
            "n": pa.array([t.num_rows], pa.int64())})
    rows = ds.map_batches(part, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    x = 0
    for r in rows:
        x ^= int(r["x"])
    return x, sum(r["n"] for r in rows)


def main():
    import ray
    import ray.data as rd
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from bench import warm_cluster
    from datavec_ray.cdc.aggview import AggView
    from datavec_ray.cdc.binlog import synth_binlog
    from datavec_ray.cdc.engine import CdcIngestEngine
    from datavec_ray.cdc.oracle import replay_oracle
    from datavec_ray.util import dataset_to_table

    total = int(os.environ.get("GRAFT_STREAM_EVENTS", "6000000"))
    n_seg = int(os.environ.get("GRAFT_STREAM_SEGMENTS", "8"))
    warm_cluster()
    binlog = synth_binlog(total, seed=11)
    seg_rows = (binlog.num_rows + n_seg - 1) // n_seg

    wal = tempfile.mkdtemp(prefix="stream_wal_")
    src_lake = tempfile.mkdtemp(prefix="stream_src_")
    mir_lake = tempfile.mkdtemp(prefix="stream_mir_")
    eng = CdcIngestEngine(src_lake, num_partitions=16,
                          commit_mode="delta")
    mirror = CdcIngestEngine(mir_lake, num_partitions=16,
                             commit_mode="delta")
    view = AggView(keys=["role"],
                   specs=[("role", "Count", "n_turns"),
                          ("turn_idx", "Sum", "sum_turn"),
                          ("ts", "Mean", "mean_ts_ms")])
    state = None
    prev_ckpt = None
    segments = []
    try:
        for i in range(n_seg):
            part = binlog.slice(i * seg_rows, seg_rows)
            if not part.num_rows:
                break
            # producer: atomic placement (temp + rename)
            fname = f"seg-{i:04d}.parquet"
            tmp = os.path.join(wal, f".{fname}.tmp")
            pq.write_table(part, tmp, row_group_size=131_072)
            os.replace(tmp, os.path.join(wal, fname))

            t0 = time.time()
            r = eng.tail(wal, poll_interval=0.05, idle_rounds=1)
            t_ingest = time.time() - t0
            assert r["segments"] == 1, r
            ckpt = f"tail-{fname}"

            t0 = time.time()
            tt = eng.time_travel()
            if state is None:
                state = view.build(tt.read_state_at(ckpt))
            else:
                state = view.advance(
                    state, tt.retract_feed(prev_ckpt, ckpt))
            t_view = time.time() - t0
            prev_ckpt = ckpt

            t0 = time.time()
            rep = eng.replicate_to(mirror)
            t_mirror = time.time() - t0

            t0 = time.time()
            got = view.finalize(state).to_pandas()
            want = view.finalize(view.build(eng.read_lake_dataset(
                columns=["role", "turn_idx", "ts"]))).to_pandas()
            view_ok = got.round(6).equals(want.round(6))
            fp_src = state_fingerprint(eng)
            fp_mir = state_fingerprint(mirror)
            t_check = time.time() - t0
            segments.append({
                "segment": i, "events": part.num_rows,
                "ingest_sec": round(t_ingest, 3),
                "view_sec": round(t_view, 3),
                "mirror_sec": round(t_mirror, 3),
                "check_sec": round(t_check, 3),
                "view_matches_rebuild": bool(view_ok),
                "mirror_matches_source": fp_src == fp_mir,
                "live_rows": fp_src[1],
                "mirror_events_shipped": rep.get("events"),
            })
            print(json.dumps(segments[-1]))
            assert view_ok, f"view mismatch at segment {i}"
            assert fp_src == fp_mir, f"mirror mismatch at segment {i}"

        # final independent oracle on a deterministic conv sample
        # (conv_id is 'conv-%08d' — sample conv number % 64 == 0)
        def conv_mask(t: pa.Table) -> pa.Array:
            num = pc.cast(pc.utf8_slice_codeunits(
                pc.cast(t["conv_id"], pa.string()), 5, 99), pa.int64())
            return pc.equal(pc.bit_wise_and(
                num, pa.scalar(63, pa.int64())), pa.scalar(0, pa.int64()))

        sample = binlog.filter(conv_mask(binlog))
        want = replay_oracle(sample).sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")])

        def keep_sample(t: pa.Table) -> pa.Table:
            return t.filter(conv_mask(t))
        got = dataset_to_table(eng.read_lake_dataset().map_batches(
            keep_sample, batch_format="pyarrow")).select(
            want.column_names).sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")])
        oracle_ok = got.num_rows == want.num_rows and all(
            pc.all(pc.equal(pc.cast(got[c], pa.string(), safe=False),
                            pc.cast(want[c], pa.string(), safe=False)))
            .as_py() in (True, None)
            and got[c].null_count == want[c].null_count
            for c in want.column_names)
        ing = [s["ingest_sec"] for s in segments]
        out = {
            "metric": "streaming_steady_state",
            "events_total": sum(s["events"] for s in segments),
            "segments": segments,
            "oracle_sample_rows": want.num_rows,
            "oracle_matches": bool(oracle_ok),
            "flatness_last2_over_seg23": round(
                (sum(ing[-2:]) / 2) / max(sum(ing[1:3]) / 2, 1e-9), 3),
            "all_view_checks": all(s["view_matches_rebuild"]
                                   for s in segments),
            "all_mirror_checks": all(s["mirror_matches_source"]
                                     for s in segments),
        }
        print(json.dumps({k: v for k, v in out.items()
                          if k != "segments"}))
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
                "STREAMING_STEADY.json"), "w") as f:
            json.dump(out, f, indent=1)
        assert oracle_ok, "final oracle sample mismatch"
    finally:
        eng.shutdown()
        mirror.shutdown()
        shutil.rmtree(wal, ignore_errors=True)
        shutil.rmtree(src_lake, ignore_errors=True)
        shutil.rmtree(mir_lake, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
