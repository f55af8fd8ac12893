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
from typing import Optional, Sequence

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


# ---------------------------------------------------------------------------
# Zonemap (min/max) statistics index — file + row-group data skipping
# ---------------------------------------------------------------------------

_ZONE_OPS = ("==", "=", "<", "<=", ">", ">=", "between", "in")
# parquet writers may truncate long binary statistics; a truncated max
# UNDERSTATES the real max and could wrongly skip a file. Lake strings
# (conv ids, roles, tools) are short; anything at/over this length is
# treated as "no stats" (file stays a candidate — never wrong, only slower).
_STR_STAT_TRUST_LEN = 60


def _zone_norm(v):
    """Normalize a statistic / filter literal into a JSON-portable,
    mutually comparable primitive: timestamps → epoch ms int. Returns
    None for values we refuse to prune on."""
    import datetime

    import pandas as pd
    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, (float, np.floating)):
        return float(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime, np.datetime64)):
        return int(pd.Timestamp(v).value // 1_000_000)
    if isinstance(v, str):
        return v if len(v) < _STR_STAT_TRUST_LEN else None
    return None


def _zone_comparable(a, b) -> bool:
    num = (int, float, bool)
    return (isinstance(a, num) and isinstance(b, num)) or \
        (isinstance(a, str) and isinstance(b, str))


def _zone_intersects(mn, mx, op: str, val) -> bool:
    """May rows in [mn, mx] satisfy ``col op val``? Conservative: any
    missing/incomparable stat → True (candidate)."""
    if mn is None or mx is None:
        return True
    if op == "in":
        vals = [_zone_norm(v) for v in val]
        return any(v is None or not _zone_comparable(mn, v)
                   or (mn <= v <= mx) for v in vals)
    if op == "between":
        lo, hi = (_zone_norm(val[0]), _zone_norm(val[1]))
        ok_lo = lo is None or not _zone_comparable(mx, lo) or lo <= mx
        ok_hi = hi is None or not _zone_comparable(mn, hi) or hi >= mn
        return ok_lo and ok_hi
    v = _zone_norm(val)
    if v is None or not _zone_comparable(mn, v):
        return True
    if op in ("==", "="):
        return mn <= v <= mx
    if op == "<":
        return mn < v
    if op == "<=":
        return mn <= v
    if op == ">":
        return mx > v
    if op == ">=":
        return mx >= v
    raise ValueError(f"unknown zonemap filter op {op!r}")


def _footer_zones(path: str, columns: list[str]) -> list[dict]:
    """Per-row-group {col: [min, max]} stats from the parquet FOOTER
    only — no data pages are read. Stats a writer did not record (or
    long strings we refuse to trust, see _STR_STAT_TRUST_LEN) come
    back as [None, None] = unprunable."""
    md = pq.ParquetFile(path).metadata
    name_to_idx = {md.schema.column(i).path: i
                   for i in range(md.num_columns)}
    out = []
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        zones = {"__rows": g.num_rows}
        for c in columns:
            mn = mx = None
            ci = name_to_idx.get(c)
            if ci is not None:
                st = g.column(ci).statistics
                if st is not None and st.has_min_max:
                    mn, mx = _zone_norm(st.min), _zone_norm(st.max)
                    if mn is None or mx is None:
                        mn = mx = None
            zones[c] = [mn, mx]
        out.append(zones)
    return out


class ZoneMapIndex:
    """File- and row-group-level min/max (zonemap) statistics over the
    lake's committed data files — the Delta/Iceberg "stats in the
    transaction log" data-skipping design. Build reads only parquet
    FOOTERS (one tiny Ray task per file, zero data pages); scans
    consult the sidecar on the driver and read ONLY files whose stats
    intersect the predicate, with the exact filter still applied to
    every row that is read (skipping is an optimization, never a
    semantics change).

    Freshness is per-file (size, mtime_ns) signatures, so ANY lake
    mutation — commit, compact, ``optimize`` clustering — re-indexes
    exactly the files it touched.

    Delta-mode (merge-on-read) partitions skip at PARTITION granularity:
    a partition is a candidate iff any of its segments intersects —
    sound for LWW because a winning row physically lives in some
    segment, so stats over all segments bound every winner.

    No reference counterpart (DataVec has no lake); parquet row-group
    pruning inside one file is the closest standard machinery — this
    sidecar lifts it to the file/partition level so the driver never
    opens non-candidate files at all, the part that matters at 100 TB.
    """

    def __init__(self, engine, columns: Sequence[str]):
        self.engine = engine
        self.columns = list(columns)
        self.index_dir = os.path.join(engine.lake_dir, "_index")
        # fname -> {"sig": [size, mtime_ns], "pid": int, "delta": bool,
        #           "row_groups": [ {col: [mn,mx], "__rows": n} ]}
        self._files: dict[str, dict] = {}
        self.last_report: dict = {}

    # -- build / persist ---------------------------------------------------

    def _data_files(self) -> list[str]:
        lake = self.engine.lake_dir
        if not os.path.isdir(lake):
            return []
        return sorted(f for f in os.listdir(lake)
                      if f.startswith("part-") and f.endswith(".parquet"))

    @staticmethod
    def _sig(path: str) -> list[int]:
        st = os.stat(path)
        return [st.st_size, st.st_mtime_ns]

    def build(self, only_files: Optional[Sequence[str]] = None) -> dict:
        import ray

        lake = self.engine.lake_dir
        cols = self.columns
        names = list(only_files) if only_files is not None \
            else self._data_files()
        if only_files is None:
            self._files.clear()

        footer = ray.remote(num_cpus=0.25)(_footer_zones)
        zones = ray.get([footer.remote(os.path.join(lake, f), cols)
                         for f in names]) if names else []
        for f, z in zip(names, zones):
            self._files[f] = {
                "sig": self._sig(os.path.join(lake, f)),
                "pid": int(f[len("part-"):].split(".")[0]),
                "delta": ".base." in f or ".delta-" in f,
                "row_groups": z,
            }
        self._persist()
        return {"files": len(names), "columns": cols}

    def _persist(self) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        payload = {"columns": self.columns, "files": self._files}
        tmp = os.path.join(self.index_dir, "zonemaps.json.tmp")
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, os.path.join(self.index_dir, "zonemaps.json"))

    def load(self) -> bool:
        path = os.path.join(self.index_dir, "zonemaps.json")
        if not os.path.exists(path):
            return False
        with open(path) as f:
            payload = json.load(f)
        if payload.get("columns") != self.columns:
            return False
        self._files = payload["files"]
        return True

    def refresh(self) -> None:
        """Index new files, re-index changed ones (signature mismatch),
        forget deleted ones — cost proportional to the mutation, the
        same incremental discipline as SecondaryIndex.refresh."""
        if not self._files:
            self.load()
        lake = self.engine.lake_dir
        current = self._data_files()
        cur = set(current)
        stale = [f for f in current
                 if self._files.get(f, {}).get("sig")
                 != self._sig(os.path.join(lake, f))]
        gone = [f for f in self._files if f not in cur]
        for f in gone:
            del self._files[f]
        if stale:
            self.build(only_files=stale)
        elif gone:
            self._persist()

    # -- skipping ----------------------------------------------------------

    def _check_filters(self, filters) -> list[tuple]:
        out = []
        for flt in filters:
            col, op, val = flt
            if op not in _ZONE_OPS:
                raise ValueError(f"unknown zonemap filter op {op!r}")
            if col not in self.columns:
                raise KeyError(f"column {col!r} is not zonemap-indexed "
                               f"(indexed: {self.columns})")
            out.append((col, op, val))
        return out

    def candidates(self, filters) -> dict:
        """Driver-side skipping decision. Returns
        {"plain": {fname: [candidate rg indices]},
         "delta_pids": [pid...], "report": {...}} — a plain (rewrite-
        mode) file is read iff any row group intersects every filter;
        a delta partition is read iff any of its segments does."""
        filters = self._check_filters(filters)
        plain: dict[str, list[int]] = {}
        delta_pids: set[int] = set()
        rg_total = rg_cand = 0
        for fname, info in sorted(self._files.items()):
            cand_rgs = []
            for i, zones in enumerate(info["row_groups"]):
                rg_total += 1
                ok = all(_zone_intersects(zones[c][0], zones[c][1], op, v)
                         for c, op, v in filters)
                if ok:
                    cand_rgs.append(i)
            rg_cand += len(cand_rgs)
            if not cand_rgs:
                continue
            if info["delta"]:
                delta_pids.add(info["pid"])
            else:
                plain[fname] = cand_rgs
        report = {
            "files_total": len(self._files),
            "files_scanned": len(plain) + sum(
                1 for f, i in self._files.items()
                if i["delta"] and i["pid"] in delta_pids),
            "row_groups_total": rg_total,
            "row_groups_candidate": rg_cand,
        }
        self.last_report = report
        return {"plain": plain, "delta_pids": sorted(delta_pids),
                "report": report}
