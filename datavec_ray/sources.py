"""Sources (readers) and sinks (writers). SURVEY.md §2.14-2.15.

The reference's RecordReader/InputSplit machinery maps onto Ray Data's
``read_*`` functions plus vectorized parse stages:

| reference reader | here |
|---|---|
| CSVRecordReader (csv/CSVRecordReader.java:42) | read_csv_records |
| CSVSequenceRecordReader (one sequence/file, :40) | read_csv_sequences |
| CSVNLinesSequenceRecordReader (:45) | read_csv_records + add_line_group |
| LineRecordReader (impl/LineRecordReader.java:46) | read_lines |
| FileRecordReader (whole file = record, :42) | read_whole_files |
| RegexLineRecordReader (regex/RegexLineRecordReader.java:48) | read_regex_lines |
| JacksonRecordReader (jackson/JacksonRecordReader.java:60) | read_json_records |
| SVMLightRecordReader (misc/SVMLightRecordReader.java:53) | read_svmlight |
| CSVRegexRecordReader (csv/CSVRegexRecordReader.java:32) | read_csv_regex |
| CSVVariableSlidingWindowRecordReader (csv/...:43) | add_sliding_window |
| MatlabRecordReader/Writer (misc/MatlabRecordReader.java:37) | read_matlab / write_matlab |
| CSVRecordWriter (writer/impl/csv/CSVRecordWriter.java:35) | write_csv |
| SVMLightRecordWriter (misc/SVMLightRecordWriter.java:63) | write_svmlight |
| MapFile / SparkStorageUtils save/restore (storage/SparkStorageUtils.java:45-290) | write_records / read_records (partitioned parquet lake) |

All parse stages are vectorized map_batches bodies; schema application
(typed columns from string cells) uses the Schema's arrow types.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.schema import Schema
from datavec_ray.steps.base import combine


# ---------------------------------------------------------------------------
# readers
# ---------------------------------------------------------------------------

def read_csv_records(paths, schema: Optional[Schema] = None, **kwargs):
    """CSV → typed Dataset. With a Schema, column names/types are enforced
    (the reference parses by schema; InferredSchema covers the no-schema
    case — Arrow's CSV reader infers likewise)."""
    import ray.data as rd
    from pyarrow import csv as pacsv
    if schema is not None:
        kwargs.setdefault("read_options", pacsv.ReadOptions(
            column_names=schema.names))
        kwargs.setdefault("convert_options", pacsv.ConvertOptions(
            column_types={n: schema.type_of(n) for n in schema.names}))
    return rd.read_csv(paths, **kwargs)


def read_lines(paths):
    """One record per line, single `text` column (LineRecordReader)."""
    import ray.data as rd
    return rd.read_text(paths)


def read_whole_files(paths):
    """Whole file = one record: (path, bytes) (FileRecordReader)."""
    import ray.data as rd
    return rd.read_binary_files(paths, include_paths=True)


def read_regex_lines(paths, pattern: str, columns: Sequence[str],
                     schema: Optional[Schema] = None):
    """Regex groups → typed fields per line (RegexLineRecordReader).
    Lines not matching are dropped (reference throws; filtering is the
    distributed-friendly behavior, logged via count difference)."""
    import re

    import ray.data as rd

    cols = list(columns)
    creg = re.compile(pattern)

    def parse_py(batch: pa.Table) -> pa.Table:
        txt = combine(batch["text"]).to_pylist()
        data: dict[str, list] = {c: [] for c in cols}
        for line in txt:
            m = creg.match(line or "")
            if not m:
                continue
            for i, c in enumerate(cols):
                data[c].append(m.group(i + 1))
        arrays = {}
        for c in cols:
            arr = pa.array(data[c], pa.string())
            if schema is not None and schema.has(c):
                arr = arr.cast(schema.type_of(c))
            arrays[c] = arr
        return pa.table(arrays)

    return rd.read_text(paths).map_batches(parse_py, batch_format="pyarrow")


def read_csv_sequences(paths, schema: Optional[Schema] = None,
                       seq_col: str = "__seq_id", **kwargs):
    """One sequence per file (CSVSequenceRecordReader.java:40): the file
    path becomes the sequence key column, ready for GroupedSequence."""
    import ray.data as rd
    from pyarrow import csv as pacsv
    if schema is not None:
        kwargs.setdefault("read_options", pacsv.ReadOptions(
            column_names=schema.names))
        kwargs.setdefault("convert_options", pacsv.ConvertOptions(
            column_types={n: schema.type_of(n) for n in schema.names}))
    ds = rd.read_csv(paths, include_paths=True, **kwargs)

    def rename(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("path")
        return batch.set_column(i, pa.field(seq_col, pa.string()),
                                batch["path"]).rename_columns(
            [seq_col if c == "path" else c for c in batch.column_names])

    return ds.map_batches(rename, batch_format="pyarrow")


def add_line_group(ds, n: int, seq_col: str = "__seq_id"):
    """Every N consecutive rows = one sequence
    (CSVNLinesSequenceRecordReader.java:45). Adds a global row index
    (sort-free: per-block offsets via the rank machinery) then // n."""
    from datavec_ray.rank import CalculateSortedRank  # noqa: F401  (doc ref)
    import ray

    mat = ds.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def _count(block: pa.Table) -> int:
        return block.num_rows

    @ray.remote
    def _with_group(block: pa.Table, offset: int) -> pa.Table:
        idx = np.arange(offset, offset + block.num_rows)
        return block.append_column(pa.field(seq_col, pa.int64()),
                                   pa.array(idx // n))

    counts = ray.get([_count.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]) if counts else []
    import ray.data as rd
    return rd.from_arrow_refs([_with_group.remote(r, int(o))
                               for r, o in zip(refs, offsets)])


def read_csv_regex(paths, cell_pattern: str, columns: Sequence[str],
                   csv_column: str = "text", delimiter: str = ","):
    """CSV whose cells are further split by a regex
    (csv/CSVRegexRecordReader.java:32): each input line is split on the
    CSV delimiter, then every cell is matched against `cell_pattern`;
    group 1 of each cell becomes the value. `columns` names the outputs
    (one per CSV cell)."""
    import re

    import ray.data as rd

    creg = re.compile(cell_pattern)
    cols = list(columns)

    def parse(batch: pa.Table) -> pa.Table:
        data: dict[str, list] = {c: [] for c in cols}
        for line in combine(batch[csv_column]).to_pylist():
            cells = (line or "").split(delimiter)
            if len(cells) != len(cols):
                continue
            for c, cell in zip(cols, cells):
                m = creg.match(cell.strip())
                data[c].append(m.group(1) if m else cell.strip())
        return pa.table({c: pa.array(v, pa.string()) for c, v in data.items()})

    return rd.read_text(paths).map_batches(parse, batch_format="pyarrow")


def add_sliding_window(ds, max_window: int, seq_col: str = "__win_id",
                       pos_col: str = "__win_pos"):
    """Sliding line windows (csv/CSVVariableSlidingWindowRecordReader.java:43):
    window w contains rows max(0, w-max_window+1)..w — each row is
    replicated into up to `max_window` windows (so windows ramp 1→maxN
    at the start, like the reference). Needs a global row order: uses the
    same per-block-offset index pass as add_line_group."""
    import ray

    mat = ds.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def _count(block: pa.Table) -> int:
        return block.num_rows

    @ray.remote
    def _explode(block: pa.Table, offset: int, total: int) -> pa.Table:
        idx = np.arange(offset, offset + block.num_rows)
        # row i -> windows i .. min(i+max_window-1, total-1)
        counts = np.minimum(max_window, total - idx)
        row_of = np.repeat(np.arange(block.num_rows), counts)
        win = np.concatenate([np.arange(i, i + c)
                              for i, c in zip(idx, counts)]) if len(idx) else             np.array([], np.int64)
        pos = win - np.repeat(idx, counts)
        out = block.take(pa.array(row_of, pa.int64()))
        out = out.append_column(pa.field(seq_col, pa.int64()),
                                pa.array(win.astype(np.int64)))
        return out.append_column(pa.field(pos_col, pa.int64()),
                                 pa.array(pos.astype(np.int64)))

    counts = ray.get([_count.remote(r) for r in refs])
    total = int(sum(counts))
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]) if counts else []
    import ray.data as rd
    return rd.from_arrow_refs([_explode.remote(r, int(o), total)
                               for r, o in zip(refs, offsets)])


def read_matlab(paths):
    """MATLAB-style whitespace-separated numeric text rows
    (misc/MatlabRecordReader.java:37) → columns f0..fn."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        rows = [list(map(float, (l or "").split()))
                for l in combine(batch["text"]).to_pylist() if (l or "").strip()]
        if not rows:
            return pa.table({})
        width = len(rows[0])
        mat = np.array([r for r in rows if len(r) == width])
        return pa.table({f"f{i}": pa.array(mat[:, i]) for i in range(width)})

    return rd.read_text(paths).map_batches(parse, batch_format="pyarrow")


def write_matlab(ds, out_dir: str):
    """Numeric columns → whitespace-separated text rows (MatlabRecordWriter)."""
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        cols = [combine(batch[c]).to_numpy(zero_copy_only=False)
                for c in batch.column_names]
        mat = np.column_stack(cols)
        name = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:12]}.txt")
        np.savetxt(name + ".tmp", mat, fmt="%g")
        os.replace(name + ".tmp", name)
        return pa.table({"file": pa.array([name])})

    return [b for b in ds.map_batches(write_block, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")]


def read_json_records(paths, field_selection: Optional[dict] = None):
    """JSON lines → records; ``field_selection`` maps output column →
    (dotted path, default) like the reference's FieldSelection
    (jackson/FieldSelection.java:36)."""
    import ray.data as rd
    ds = rd.read_json(paths)
    if not field_selection:
        return ds

    def select(batch: pa.Table) -> pa.Table:
        import json as _json
        out: dict[str, list] = {k: [] for k in field_selection}
        pylist = batch.to_pylist()
        for row in pylist:
            for col, (path, default) in field_selection.items():
                cur = row
                for part in path.split("."):
                    if isinstance(cur, dict) and part in cur:
                        cur = cur[part]
                    else:
                        cur = None
                        break
                out[col].append(default if cur is None else cur)
        return pa.table({k: pa.array(v) for k, v in out.items()})

    return ds.map_batches(select, batch_format="pyarrow")


def _parse_svmlight_batch(batch: pa.Table, num_features: int,
                          zero_based: bool) -> pa.Table:
    txt = combine(batch["text"]).to_pylist()
    off = 0 if zero_based else 1
    labels = np.zeros(len(txt), dtype=np.float64)
    mat = np.zeros((len(txt), num_features), dtype=np.float32)
    for i, line in enumerate(txt):
        if not line:
            continue
        parts = line.split("#")[0].split()
        if not parts:
            continue
        labels[i] = float(parts[0])
        for tok in parts[1:]:
            if ":" not in tok:
                continue
            k, v = tok.split(":", 1)
            idx = int(k) - off
            if 0 <= idx < num_features:
                mat[i, idx] = float(v)
    feats = pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel()),
                                              num_features) \
        .cast(pa.list_(pa.float32()))
    return pa.table({"label": pa.array(labels),
                     "features": feats})


def read_svmlight(paths, num_features: int, zero_based: bool = False):
    """Sparse `label idx:val ...` lines → (label, features) with a dense
    list<float32> feature column (SVMLightRecordReader.java:53)."""
    import ray.data as rd
    return rd.read_text(paths).map_batches(
        lambda b: _parse_svmlight_batch(b, num_features, zero_based),
        batch_format="pyarrow")


def from_records(rows: Sequence[dict] | pa.Table):
    """In-memory records (CollectionRecordReader / InMemoryRecordReader)."""
    import ray.data as rd
    if isinstance(rows, pa.Table):
        return rd.from_arrow(rows)
    return rd.from_items(list(rows))


def zip_readers(left, right):
    """Zip two datasets' rows into combined records
    (ComposableRecordReader.java:43)."""
    return left.zip(right)


def read_records(lake_dir: str, **kwargs):
    """Read a partitioned parquet lake written by write_records
    (the MapFile/SparkStorageUtils replacement)."""
    import ray.data as rd
    return rd.read_parquet(lake_dir, **kwargs)


def read_lines_with_provenance(paths):
    """One record per line plus (``__source_file``, ``__row_idx``)
    provenance columns (RecordMetaData parity:
    ``records/metadata/RecordMetaData.java:50`` /
    ``RecordMetaDataLine``). Whole-file read tasks → vectorized line
    split, so line numbers are exact per file; use
    ``load_lines_from_metadata`` for the reference's loadFromMetaData
    random re-read (``records/reader/RecordReader.java:138-147``)."""
    import numpy as np
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def explode(batch: pa.Table) -> pa.Table:
        texts = [b.decode("utf-8", "replace") for b in batch["bytes"].to_pylist()]
        srcs = batch["path"].to_pylist()
        all_lines, files, idxs = [], [], []
        for src, txt in zip(srcs, texts):
            lines = txt.splitlines()
            all_lines.extend(lines)
            files.extend([src] * len(lines))
            idxs.append(np.arange(len(lines), dtype=np.int64))
        return pa.table({
            "line": pa.array(all_lines, pa.string()),
            "__source_file": pa.array(files, pa.string()),
            "__row_idx": pa.array(np.concatenate(idxs) if idxs
                                  else np.empty(0, np.int64)),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def load_lines_from_metadata(metadata: Sequence[tuple[str, int]]) -> pa.Table:
    """Random re-read by provenance (loadFromMetaData parity): group the
    (source_file, row_idx) pairs by file, read each file ONCE, take the
    requested lines. Returns rows in the metadata's order."""
    import collections
    by_file: dict[str, list[int]] = collections.defaultdict(list)
    for src, idx in metadata:
        by_file[src].append(idx)
    lines_of: dict[str, list[str]] = {}
    for src in by_file:
        with open(src, encoding="utf-8", errors="replace") as f:
            lines_of[src] = f.read().splitlines()
    return pa.table({
        "line": pa.array([lines_of[s][i] for s, i in metadata], pa.string()),
        "__source_file": pa.array([s for s, _ in metadata], pa.string()),
        "__row_idx": pa.array([i for _, i in metadata], pa.int64()),
    })


def read_jdbc(sql: str, connection_factory, **kwargs):
    """SQL result set → records (JDBCRecordReader parity,
    ``datavec-jdbc/.../JDBCRecordReader.java:37``).

    Maps straight onto ``ray.data.read_sql``: ``connection_factory`` is
    a zero-arg callable returning a DB-API connection, invoked INSIDE
    each read task — the per-worker connection shape of the reference's
    DataSource (never ship a live connection through the object store).
    Works with sqlite3, DuckDB, or any DB-API driver.
    """
    import ray.data as rd
    return rd.read_sql(sql, connection_factory, **kwargs)


def sqlite_connection(path: str):
    """Picklable connection factory for a sqlite database file."""
    import functools
    import sqlite3
    return functools.partial(sqlite3.connect, path)


def write_jdbc(ds, table: str, connection_factory,
               pk_cols: Optional[Sequence[str]] = None,
               batch_rows: int = 10_000) -> int:
    """Dataset → DB-API table sink (the write-side complement of
    ``read_jdbc``; the reference only reads from JDBC — this closes
    the round trip). Returns rows written.

    Idempotence: with ``pk_cols``, every batch runs as
    ``INSERT OR REPLACE`` (upsert on the primary key), so re-running a
    failed write converges to the same table state — the same
    exactly-once-by-idempotence discipline as the parquet lake sink.
    Without ``pk_cols``, plain INSERT (caller owns dedup).

    Shape: the connection is opened INSIDE each write task (never
    shipped through the object store); each task commits one DB
    transaction per block, parameters bound via ``executemany`` on
    Python-native rows (DB-API has no columnar path — this boundary
    is per-row by protocol, not by choice; keep bulk exports on the
    parquet/ORC/IPC sinks)."""

    verb = "INSERT OR REPLACE" if pk_cols else "INSERT"

    def write_block(batch: pa.Table) -> pa.Table:
        conn = connection_factory()
        try:
            cols = batch.column_names
            sql = (f"{verb} INTO {table} ({', '.join(cols)}) "
                   f"VALUES ({', '.join(['?'] * len(cols))})")
            cur = conn.cursor()
            arrs = [combine(batch[c]).to_pylist() for c in cols]
            rows = list(zip(*arrs)) if arrs else []
            for i in range(0, len(rows), batch_rows):
                cur.executemany(sql, rows[i:i + batch_rows])
            conn.commit()
        finally:
            conn.close()
        return pa.table({"rows": pa.array([batch.num_rows], pa.int64())})

    acks = ds.map_batches(write_block, batch_format="pyarrow")
    return int(sum(r["rows"] for r in acks.take_all()))


# ---------------------------------------------------------------------------
# writers
# ---------------------------------------------------------------------------

def write_records(ds, out_dir: str, partition_cols: Optional[Sequence[str]] = None,
                  min_rows_per_file: Optional[int] = None):
    """Partitioned parquet lake sink (SparkStorageUtils.saveMapFile
    replacement): resumable, shard-per-block, optional hive partitioning."""
    kwargs = {}
    if partition_cols:
        kwargs["partition_cols"] = list(partition_cols)
    if min_rows_per_file:
        kwargs["min_rows_per_file"] = min_rows_per_file
    ds.write_parquet(out_dir, **kwargs)
    return out_dir


def write_csv(ds, out_dir: str, **kwargs):
    ds.write_csv(out_dir, **kwargs)
    return out_dir


def write_json(ds, out_dir: str, **kwargs):
    ds.write_json(out_dir, **kwargs)
    return out_dir


def write_svmlight(ds, out_dir: str, label_col: str = "label",
                   features_col: str = "features", zero_based: bool = False):
    """(label, features:list<float>) → SVMLight text shards
    (SVMLightRecordWriter.java:63). Zeros are omitted (sparse format)."""
    off = 0 if zero_based else 1

    def fmt(batch: pa.Table) -> pa.Table:
        labels = combine(batch[label_col]).to_pylist()
        feats = combine(batch[features_col])
        width = len(feats[0]) if len(feats) else 0
        mat = feats.flatten().to_numpy(zero_copy_only=False).reshape(-1, width)
        lines = []
        for i, lab in enumerate(labels):
            nz = np.nonzero(mat[i])[0]
            toks = [f"{int(lab) if float(lab).is_integer() else lab}"]
            toks += [f"{j + off}:{mat[i, j]:g}" for j in nz]
            lines.append(" ".join(toks))
        return pa.table({"text": pa.array(lines, pa.string())})

    out = ds.map_batches(fmt, batch_format="pyarrow")
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        import uuid
        name = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:12]}.svm")
        with open(name + ".tmp", "w") as f:
            f.write("\n".join(batch["text"].to_pylist()) + "\n")
        os.replace(name + ".tmp", name)
        return pa.table({"file": pa.array([name]), "rows": pa.array([batch.num_rows])})

    return [b for b in out.map_batches(write_block, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")]


# ---------------------------------------------------------------------------
# columnar file formats beyond parquet (ORC, Arrow IPC)
# ---------------------------------------------------------------------------

def _expand_paths(paths) -> list[str]:
    """str | dir | list → sorted flat file list (hidden files skipped)."""
    paths = [paths] if isinstance(paths, str) else list(paths)
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files += sorted(os.path.join(p, f) for f in sorted(os.listdir(p))
                            if not f.startswith((".", "_")))
        else:
            files.append(p)
    return files


def read_orc(paths, columns: Optional[Sequence[str]] = None):
    """ORC files → Dataset (this Ray build ships no ``read_orc``;
    upstream DataVec reads columnar warehouse exports through Spark's
    ORC support — same lake-interchange role as the parquet reader,
    ``RecordReader.java:61`` record-iterator contract).

    Scale shape: one read TASK per file (drivers only list paths — no
    file bytes touch the driver), and within a task stripes stream out
    as separate zero-copy Arrow tables, so block size tracks the ORC
    stripe size rather than whole files. ``columns`` prunes at the
    stripe reader, same discipline as ``read_parquet(columns=...)``."""
    import ray.data as rd

    files = _expand_paths(paths)
    cols = list(columns) if columns else None

    def load(batch: pa.Table):
        from pyarrow import orc
        for path in batch["path"].to_pylist():
            f = orc.ORCFile(path)
            for i in range(f.nstripes):
                t = f.read_stripe(i, columns=cols)
                yield pa.Table.from_batches([t]) \
                    if isinstance(t, pa.RecordBatch) else t

    return rd.from_items([{"path": p} for p in files],
                         override_num_blocks=max(len(files), 1)) \
        .map_batches(load, batch_format="pyarrow")


def write_orc(ds, out_dir: str, **writer_kwargs):
    """Dataset → ORC shards, one file per block, unique names with
    tmp+rename so a re-run never exposes a torn file (same resumable
    discipline as the parquet lake sink)."""
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        from pyarrow import orc
        name = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:12]}.orc")
        orc.write_table(batch, name + ".tmp", **writer_kwargs)
        os.replace(name + ".tmp", name)
        return pa.table({"file": pa.array([name]),
                         "rows": pa.array([batch.num_rows])})

    return [b for b in ds.map_batches(write_block, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")]


def read_warc(paths, payload_as: str = "binary", http_parse: bool = False):
    """WARC crawl shards → Dataset of (url, warc_type, content_type,
    payload, path, rec_idx). ``.warc.gz`` (one gzip member per record,
    the Common-Crawl layout — ``gzip.decompress`` walks concatenated
    members) and plain ``.warc`` both work.

    ``http_parse=True`` additionally strips the HTTP envelope from
    ``response`` records (the Common-Crawl record type): payload
    becomes the HTTP BODY and an ``http_status`` column carries the
    status code (null for non-response records / unparseable
    envelopes, whose payloads pass through untouched).

    Scale shape: one shard per read task (whole-file record reader —
    ``impl/FileRecordReader.java:42`` shape; WARC is a sequential
    record-delimited format so intra-file parallelism isn't possible),
    driver only lists paths. The per-record walk is a read-task parse
    loop, same as every record-delimited reader here.

    ``payload_as``: "binary" (default) or "text" (utf-8, replacement
    on invalid bytes). Shards are parsed as a STREAM (a 1 GB .warc.gz
    decompresses to several GB — it never sits in the task heap):
    records walk off a bounded buffer and emit as Arrow blocks of
    ``records_per_block`` records.
    """
    import gzip

    import ray.data as rd

    files = _expand_paths(paths)

    def _iter_records(stream):
        """(headers dict, body bytes) per record off a binary stream;
        memory bounded by one record + one read chunk."""
        buf = b""
        while True:
            start = buf.find(b"WARC/")
            while start < 0:
                buf = buf[-6:]  # keep a tail: magic may split a chunk
                chunk = stream.read(1 << 18)
                if not chunk:
                    return
                buf += chunk
                start = buf.find(b"WARC/")
            buf = buf[start:]
            hdr_end = buf.find(b"\r\n\r\n")
            while hdr_end < 0:
                chunk = stream.read(1 << 18)
                if not chunk:
                    return
                buf += chunk
                hdr_end = buf.find(b"\r\n\r\n")
            headers = {}
            for line in buf[:hdr_end].split(b"\r\n")[1:]:
                k, _, v = line.partition(b":")
                headers[k.strip().lower()] = v.strip()
            try:
                clen = int(headers.get(b"content-length", b"0"))
            except ValueError:
                clen = 0
            need = hdr_end + 4 + clen + 4  # payload + trailing \r\n\r\n
            while len(buf) < need:
                chunk = stream.read(max(1 << 18, need - len(buf)))
                if not chunk:
                    break
                buf += chunk
            yield headers, buf[hdr_end + 4:hdr_end + 4 + clen]
            buf = buf[need:]

    def parse(batch: pa.Table, records_per_block: int = 1024):
        for path in batch["path"].to_pylist():
            opener = gzip.open if path.endswith(".gz") else open
            with opener(path, "rb") as stream:
                urls, types, ctypes, payloads, statuses = \
                    [], [], [], [], []
                base_idx = 0

                def flush():
                    nonlocal base_idx
                    if payload_as == "text":
                        pay = pa.array([b.decode("utf-8", "replace")
                                        for b in payloads])
                    else:
                        pay = pa.array(payloads, pa.binary())
                    cols = {
                        "url": pa.array(urls, pa.string()),
                        "warc_type": pa.array(types, pa.string()),
                        "content_type": pa.array(ctypes, pa.string()),
                        "payload": pay,
                        "path": pa.array([path] * len(urls)),
                        "rec_idx": pa.array(
                            np.arange(base_idx, base_idx + len(urls),
                                      dtype=np.int64)),
                    }
                    if http_parse:
                        cols["http_status"] = pa.array(statuses, pa.int64())
                    base_idx += len(urls)
                    urls.clear(); types.clear(); ctypes.clear()
                    payloads.clear(); statuses.clear()
                    return pa.table(cols)

                for headers, body in _iter_records(stream):
                    urls.append(headers.get(b"warc-target-uri",
                                            b"").decode("utf-8", "replace")
                                or None)
                    types.append(headers.get(b"warc-type",
                                             b"").decode() or None)
                    ctypes.append(headers.get(b"content-type",
                                              b"").decode() or None)
                    status = None
                    if http_parse and types[-1] == "response" \
                            and body.startswith(b"HTTP/"):
                        split = body.find(b"\r\n\r\n")
                        if split >= 0:
                            line = body[:body.find(b"\r\n")].split(b" ")
                            try:
                                status = int(line[1])
                                body = body[split + 4:]
                            except (IndexError, ValueError):
                                status = None
                    statuses.append(status)
                    payloads.append(body)
                    if len(urls) >= records_per_block:
                        yield flush()
                if urls or base_idx == 0:
                    yield flush()

    return rd.from_items([{"path": p} for p in files],
                         override_num_blocks=max(len(files), 1)) \
        .map_batches(parse, batch_format="pyarrow")


def write_warc(ds, out_dir: str, url_col: str = "url",
               payload_col: str = "payload",
               content_type: str = "text/html",
               warc_type: str = "resource",
               warc_date: str = "2026-01-01T00:00:00Z",
               gzip_members: bool = True):
    """Dataset → WARC shards (one ``.warc[.gz]`` per block, tmp+rename,
    one gzip member per record when ``gzip_members``). Records are
    ``warc_type`` (default resource; "conversion" + text/plain gives
    the Common-Crawl WET extracted-text layout) with deterministic
    record ids (md5 of url) and a FIXED WARC-Date so re-exports are
    byte-identical (resumable-sink discipline)."""
    import gzip
    import hashlib
    import uuid

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_members else ".warc"

    def write_block(batch: pa.Table) -> pa.Table:
        name = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:12]}{ext}")
        urls = batch[url_col].to_pylist()
        payloads = combine(batch[payload_col])
        if pa.types.is_string(payloads.type) or \
                pa.types.is_large_string(payloads.type):
            bodies = [s.encode() if s is not None else b""
                      for s in payloads.to_pylist()]
        else:
            bodies = [b or b"" for b in payloads.to_pylist()]
        with open(name + ".tmp", "wb") as f:
            for url, body in zip(urls, bodies):
                rid = hashlib.md5((url or "").encode()).hexdigest()
                rec = (b"WARC/1.0\r\n"
                       b"WARC-Type: " + warc_type.encode() + b"\r\n"
                       b"WARC-Target-URI: " + (url or "").encode() + b"\r\n"
                       b"WARC-Date: " + warc_date.encode() + b"\r\n"
                       b"WARC-Record-ID: <urn:uuid:" + rid.encode() +
                       b">\r\n"
                       b"Content-Type: " + content_type.encode() + b"\r\n"
                       b"Content-Length: " + str(len(body)).encode() +
                       b"\r\n\r\n" + body + b"\r\n\r\n")
                f.write(gzip.compress(rec, mtime=0) if gzip_members
                        else rec)
        os.replace(name + ".tmp", name)
        return pa.table({"file": pa.array([name]),
                         "rows": pa.array([batch.num_rows])})

    return [b for b in ds.map_batches(write_block, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")]


def read_arrow_ipc(paths, columns: Optional[Sequence[str]] = None):
    """Arrow IPC (Feather V2 / ``.arrow``) files → Dataset. The file is
    MEMORY-MAPPED in each read task and record batches are sliced
    zero-copy — the cheapest possible on-disk interchange for
    Arrow-native pipelines (upstream DataVec's ArrowRecordReader plays
    this role; this snapshot predates it, so the parity anchor is the
    same RecordReader.java:61 iterator contract)."""
    import ray.data as rd

    files = _expand_paths(paths)
    cols = list(columns) if columns else None

    def load(batch: pa.Table):
        from pyarrow import ipc
        for path in batch["path"].to_pylist():
            with pa.memory_map(path) as src:
                reader = ipc.open_file(src)
                for i in range(reader.num_record_batches):
                    t = pa.Table.from_batches([reader.get_batch(i)])
                    yield t.select(cols) if cols else t

    return rd.from_items([{"path": p} for p in files],
                         override_num_blocks=max(len(files), 1)) \
        .map_batches(load, batch_format="pyarrow")


def write_arrow_ipc(ds, out_dir: str):
    """Dataset → Arrow IPC file shards (one per block, tmp+rename)."""
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        from pyarrow import ipc
        name = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:12]}.arrow")
        with ipc.new_file(name + ".tmp", batch.schema) as w:
            w.write_table(batch)
        os.replace(name + ".tmp", name)
        return pa.table({"file": pa.array([name]),
                         "rows": pa.array([batch.num_rows])})

    return [b for b in ds.map_batches(write_block, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")]
