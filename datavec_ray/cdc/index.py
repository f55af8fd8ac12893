"""Secondary (non-key) lookup index over the CDC lake — Bloom sidecars.

``CdcIngestEngine.lookup`` serves point reads by the PARTITION key
(conv_id hashes to its owning file). Serving reads by any other column
(role, tool, a user id inside the payload) would otherwise scan every
partition. This module adds the standard lakehouse answer: one small
Bloom-filter sidecar per (partition file, indexed column), built with a
column-pruned pass and consulted on the driver so a value lookup reads
ONLY the partitions whose filter may contain it (false positives cost
one wasted pruned read; false negatives cannot happen).

Scale shape:
- build = one Ray TASK per partition file (the same per-file unit the
  lake itself uses), each reading only the indexed columns; sidecar
  size is a few KB-MB per partition at 1% FP, independent of payload
  width. Sidecars persist under ``<lake>/_index`` (tmp+rename) with
  the manifest watermark stamped, so an index survives restarts and
  staleness is detectable.
- lookup = driver-side membership test over the per-partition filters
  (numpy, microseconds) → pruned ``pq.read_table(file, filters=...)``
  of only candidate partitions. Work is O(matching partitions), never
  a lake scan.
- maintenance = rebuild on watermark change (``refresh()``; checked by
  default) — rebuild cost is the column-pruned pass, amortized the
  usual lakehouse way (index after a batch of commits, not per
  commit).

No reference counterpart (DataVec has no serving index); the closest
analogue is parquet row-group statistics, which cannot answer
membership for high-cardinality string columns — Blooms can.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from datavec_ray.hll import hash64
from datavec_ray.ops.bloom import BloomFilter
from datavec_ray.steps.base import combine


class SecondaryIndex:
    """Bloom-sidecar index over ``engine``'s committed lake files for
    ``columns``. Build once (``build()`` or lazily on first lookup),
    then ``lookup(col, values)`` returns the matching live rows."""

    def __init__(self, engine, columns: Sequence[str], fp: float = 0.01):
        self.engine = engine
        self.columns = list(columns)
        self.fp = fp
        self.index_dir = os.path.join(engine.lake_dir, "_index")
        # {(pid, col): BloomFilter}
        self._blooms: dict[tuple[int, str], BloomFilter] = {}
        self._built_watermark = None
        # pid → lsn_hi the sidecar was built at (incremental refresh)
        self._pid_watermarks: dict[int, int] = {}

    # -- build -----------------------------------------------------------

    def _lake_files(self) -> list[tuple[int, str]]:
        out = []
        for pid in sorted(self.engine.manifest.committed_partitions()):
            path = os.path.join(self.engine.lake_dir,
                                f"part-{pid:04d}.parquet")
            if os.path.exists(path):
                out.append((pid, path))
        return out

    def build(self, only_pids=None) -> dict:
        """(Re)build sidecars — all of them, or (incremental refresh)
        only ``only_pids``: one Ray task per partition file,
        column-pruned read. Returns a small manifest dict."""
        import ray

        cols, fp = self.columns, self.fp

        @ray.remote
        def _index_file(pid: int, path: str):
            import pyarrow.compute as pc
            t = pq.read_table(path, columns=cols)
            out = {}
            for c in cols:
                # canonical string representation so lookup's str(v)
                # hashes identically (string/int columns supported)
                arr = combine(pc.cast(t[c], pa.string()))
                h = hash64(arr)
                bits, k = BloomFilter.size_for(max(t.num_rows, 1), fp)
                bf = BloomFilter(bits, k)
                if arr.null_count:
                    mask = pc.is_valid(arr).to_numpy(zero_copy_only=False)
                    h = h[mask]
                bf.add_hashes(h)
                out[c] = (bf.num_bits, bf.num_hashes, bf.words)
            return pid, out

        files = self._lake_files()
        if only_pids is not None:
            files = [(pid, p) for pid, p in files if pid in set(only_pids)]
        else:
            self._blooms.clear()
            self._pid_watermarks.clear()
        results = ray.get([_index_file.remote(pid, path)
                           for pid, path in files])
        os.makedirs(self.index_dir, exist_ok=True)
        wms = self.engine.manifest.committed_watermarks()
        for pid, per_col in results:
            for c, (bits, k, words) in per_col.items():
                self._blooms[(pid, c)] = BloomFilter(bits, k, words)
            self._pid_watermarks[pid] = wms.get(pid)
        self._built_watermark = self.engine.manifest.watermark()
        self._persist()
        return {"partitions": len(files), "columns": cols,
                "watermark": self._built_watermark}

    def _persist(self) -> None:
        rows = {"pid": [], "col": [], "num_bits": [], "num_hashes": [],
                "words": []}
        for (pid, c), bf in self._blooms.items():
            rows["pid"].append(pid)
            rows["col"].append(c)
            rows["num_bits"].append(bf.num_bits)
            rows["num_hashes"].append(bf.num_hashes)
            rows["words"].append(bf.words.tobytes())
        tmp = os.path.join(self.index_dir, "blooms.parquet.tmp")
        pq.write_table(pa.table({
            "pid": pa.array(rows["pid"], pa.int64()),
            "col": pa.array(rows["col"], pa.string()),
            "num_bits": pa.array(rows["num_bits"], pa.int64()),
            "num_hashes": pa.array(rows["num_hashes"], pa.int64()),
            "words": pa.array(rows["words"], pa.binary()),
        }), tmp)
        os.replace(tmp, os.path.join(self.index_dir, "blooms.parquet"))
        meta = {"watermark": self._built_watermark, "columns": self.columns,
                "fp": self.fp,
                "pid_watermarks": {str(k): v for k, v
                                   in self._pid_watermarks.items()}}
        with open(os.path.join(self.index_dir, "meta.json.tmp"), "w") as f:
            json.dump(meta, f)
        os.replace(os.path.join(self.index_dir, "meta.json.tmp"),
                   os.path.join(self.index_dir, "meta.json"))

    def load(self) -> bool:
        """Load persisted sidecars; False if absent."""
        path = os.path.join(self.index_dir, "blooms.parquet")
        meta_path = os.path.join(self.index_dir, "meta.json")
        if not (os.path.exists(path) and os.path.exists(meta_path)):
            return False
        with open(meta_path) as f:
            meta = json.load(f)
        self._built_watermark = meta["watermark"]
        self._pid_watermarks = {int(k): v for k, v
                                in meta.get("pid_watermarks", {}).items()}
        t = pq.read_table(path)
        self._blooms.clear()
        for pid, c, bits, k, raw in zip(t["pid"].to_pylist(),
                                        t["col"].to_pylist(),
                                        t["num_bits"].to_pylist(),
                                        t["num_hashes"].to_pylist(),
                                        t["words"].to_pylist()):
            self._blooms[(pid, c)] = BloomFilter(
                bits, k, np.frombuffer(raw, dtype=np.uint64).copy())
        return True

    def refresh(self) -> None:
        """Build if never built; otherwise re-index ONLY the partitions
        whose committed watermark advanced since their sidecar was
        built (new commits touch few partitions — the incremental cost
        is proportional to the delta, the lakehouse discipline used by
        AggView as well)."""
        if not self._blooms and not self.load():
            self.build()
            return
        if self._built_watermark == self.engine.manifest.watermark():
            return
        wms = self.engine.manifest.committed_watermarks()
        stale = [pid for pid, wm in wms.items()
                 if self._pid_watermarks.get(pid) != wm]
        self.build(only_pids=stale)

    # -- lookup ----------------------------------------------------------

    def candidate_partitions(self, col: str, values) -> list[int]:
        """Partitions whose Bloom may contain ANY of the values."""
        if col not in self.columns:
            raise KeyError(f"column {col!r} is not indexed "
                           f"(indexed: {self.columns})")
        vals = pa.array(sorted({str(v) for v in values}), pa.string())
        if len(vals) == 0:
            return []
        h = hash64(vals)
        pids = []
        for (pid, c), bf in self._blooms.items():
            if c == col and bf.contains_hashes(h).any():
                pids.append(pid)
        return sorted(set(pids))

    def _read_candidates(self, pids, filters) -> list:
        """Pruned filtered reads of the candidate partition files — one
        Ray task per file so a many-candidate lookup parallelizes."""
        import ray

        paths = [os.path.join(self.engine.lake_dir,
                              f"part-{pid:04d}.parquet")
                 for pid in pids]
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            return []
        if len(paths) == 1:  # common point-lookup case: skip task cost
            t = pq.read_table(paths[0], filters=filters)
            return [t] if t.num_rows else []

        @ray.remote
        def _read(path):
            return pq.read_table(path, filters=filters)

        return [t for t in ray.get([_read.remote(p) for p in paths])
                if t.num_rows]

    def lookup_and(self, filters: dict, check_fresh: bool = True) -> pa.Table:
        """Conjunctive lookup over several indexed columns: candidate
        partitions = INTERSECTION of each column's Bloom-candidate set
        (tighter pruning than any single column), then one read per
        surviving partition with all value filters pushed (AND)."""
        if check_fresh or not self._blooms:
            self.refresh()
        pids = None
        for col, values in filters.items():
            cand = set(self.candidate_partitions(col, sorted(set(values))))
            pids = cand if pids is None else (pids & cand)
        tables = self._read_candidates(
            sorted(pids or ()),
            [(c, "in", sorted(set(v))) for c, v in filters.items()])
        if not tables:
            from datavec_ray.cdc.engine import TRANSCRIPT_SCHEMA
            return TRANSCRIPT_SCHEMA.empty_table()
        out = pa.concat_tables(tables, promote_options="permissive")
        return out.sort_by([("conv_id", "ascending"),
                            ("turn_idx", "ascending")])

    def lookup(self, col: str, values, check_fresh: bool = True) -> pa.Table:
        """Live lake rows whose ``col`` is in ``values`` — reads only
        Bloom-candidate partitions, with the value filter pushed into
        the parquet read (false positives are then dropped by the
        pushed filter — results are exact)."""
        if check_fresh or not self._blooms:
            self.refresh()
        vals = sorted(set(values))   # original type for the pushed filter
        tables = self._read_candidates(
            self.candidate_partitions(col, vals), [(col, "in", vals)])
        if not tables:
            from datavec_ray.cdc.engine import TRANSCRIPT_SCHEMA
            return TRANSCRIPT_SCHEMA.empty_table()
        out = pa.concat_tables(tables, promote_options="permissive")
        return out.sort_by([("conv_id", "ascending"),
                            ("turn_idx", "ascending")])
