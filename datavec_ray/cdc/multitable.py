"""Atomic multi-table transactional replay — the MySQL-XID / Postgres
commit-record contract as an ENGINE feature: one binlog whose events
route to SEVERAL lake tables must make a transaction's events visible
in ALL tables or NONE, across crashes at any point.

The reference has no counterpart (DataVec transforms one record stream
into one output); the nearest public analogue is Debezium's
transaction-boundary topic consumed by a multi-table sink.

Design (two-phase commit over the engine's own WAP staged commits):

- one :class:`~datavec_ray.cdc.engine.CdcIngestEngine` per table under
  ``<base_dir>/<table>/`` — per-table manifests, checkpoints, layout;
- a SHARED committed-txn gate: commit markers are collected ONCE over
  the union of every table's stream (column-pruned to
  ``(txn_col, op_col)``), broadcast via one ``ray.put``, and each
  table's stream is filtered map-side — events of transactions without
  a commit marker never reach any staged write;
- phase 1 (prepare): each table's gated stream replays into an
  isolated WAP stage (``engine.stage``) — full exactly-once machinery,
  zero reader-visible bytes;
- the commit point: one coordinator journal file
  ``<base_dir>/_multitxn.json`` written atomically (tmp + fsync +
  rename + dir fsync) AFTER every stage is prepared;
- phase 2: each stage publishes (crash-rerunnable, see
  :mod:`datavec_ray.cdc.wap`); the journal is removed last;
- :func:`recover_tables` (also run automatically at the start of every
  ``replay_tables``) finishes the protocol after a crash: journal
  present → re-publish every listed stage (stages already published
  re-resolve via their manifest ``publish`` entries); journal absent →
  abort any leftover stage dirs, leaving every table untouched.

Scale shape: the gate is one tiny distinct-combiner pass; each table's
replay is the ordinary two-stage task exchange; prepare/publish move
hardlinks and manifest lines — O(partitions), never O(rows).
"""

from __future__ import annotations

import json
import os
from typing import Optional

_JOURNAL = "_multitxn.json"


def _journal_path(base_dir: str) -> str:
    return os.path.join(base_dir, _JOURNAL)


def _write_journal(base_dir: str, payload: dict) -> None:
    """Atomic + durable: tmp file, fsync, rename, directory fsync —
    the rename is the multi-table commit point."""
    path = _journal_path(base_dir)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    dfd = os.open(base_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _read_journal(base_dir: str) -> Optional[dict]:
    path = _journal_path(base_dir)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        # a torn journal can only be the tmp-rename losing a race with
        # the crash — treat as absent (commit point never reached)
        return None


def open_table_engines(base_dir: str, names, num_partitions: int = 8,
                       **engine_kwargs) -> dict:
    """One CdcIngestEngine per table under ``<base_dir>/<name>``."""
    from datavec_ray.cdc.engine import CdcIngestEngine
    os.makedirs(base_dir, exist_ok=True)
    return {n: CdcIngestEngine(os.path.join(base_dir, n),
                               num_partitions=num_partitions,
                               **engine_kwargs)
            for n in names}


def _next_stage_name(txn_name: str, engines: dict) -> str:
    """Unique stage name per invocation: WAP's publish() treats an
    existing manifest ``publish`` entry with the same stage name as a
    crash-resume shortcut (cleanup + return the OLD entry), so reusing
    a name across successful runs would silently discard the new
    batch. Sequence on the number of prior publishes of this txn_name
    across all table manifests."""
    prefix = f"mtx_{txn_name}_"
    seq = 0
    for eng in engines.values():
        eng.manifest.reload()
        for e in eng.manifest.entries:
            if e.get("type") == "publish" and \
                    str(e.get("stage", "")).startswith(prefix):
                try:
                    seq = max(seq, 1 + int(
                        str(e["stage"])[len(prefix):]))
                except ValueError:
                    seq = max(seq, 1)
    return f"{prefix}{seq}"


def recover_tables(base_dir: str, engines: dict) -> str:
    """Finish (or roll back) an interrupted multi-table commit.

    Returns "committed" when a journal was found and every listed
    stage published, "aborted" when leftover pre-commit stages were
    discarded, "clean" when there was nothing to do."""
    from datavec_ray.cdc.wap import StagedCommit
    j = _read_journal(base_dir)
    if j is not None:
        sname = j["stage"]
        for t in j["tables"]:
            if t not in engines:
                raise ValueError(
                    f"journal lists table {t!r} with no open engine — "
                    "pass every table of the original replay_tables")
            StagedCommit(engines[t], sname).publish()
        os.remove(_journal_path(base_dir))
        return "committed"
    import shutil
    aborted = False
    for eng in engines.values():
        for f in os.listdir(eng.lake_dir):
            if f.startswith("_stage_mtx_"):
                shutil.rmtree(os.path.join(eng.lake_dir, f),
                              ignore_errors=True)
                aborted = True
    return "aborted" if aborted else "clean"


def replay_tables(base_dir: str, tables: dict, *,
                  txn_col: Optional[str] = None, op_col: str = "op",
                  commit_op: str = "C", drop_markers: bool = True,
                  txn_name: str = "txn", num_partitions: int = 8,
                  engines: Optional[dict] = None,
                  **engine_kwargs) -> dict:
    """Replay ``{table_name: binlog Dataset}`` into one lake per table
    under ``base_dir``, atomically across tables (see module
    docstring). With ``txn_col`` set, a shared committed-transaction
    gate filters every stream against commit markers collected over
    ALL streams. Returns ``{"engines": {name: engine}, "stats":
    {name: replay_stats}, "recovered": str}``."""
    import ray

    from datavec_ray.cdc.txn import _TxnFilter, committed_txns
    from datavec_ray.cdc.wap import StagedCommit
    if engines is None:
        engines = open_table_engines(base_dir, tables.keys(),
                                     num_partitions, **engine_kwargs)
    recovered = recover_tables(base_dir, engines)

    if txn_col is not None:
        pruned = None
        for ds in tables.values():
            p = ds.select_columns([txn_col, op_col])
            pruned = p if pruned is None else pruned.union(p)
        ids = committed_txns(pruned, txn_col, op_col, commit_op)
        ref = ray.put(ids)
        tables = {n: ds.map_batches(
            _TxnFilter(ref, txn_col, True, drop_markers, op_col,
                       commit_op),
            batch_format="pyarrow", zero_copy_batch=True)
            for n, ds in tables.items()}

    # phase 1: prepare every table's staged replay (invisible)
    sname = _next_stage_name(txn_name, engines)
    stages, stats = {}, {}
    for n, ds in tables.items():
        st = StagedCommit(engines[n], sname)
        stages[n] = st
        stats[n] = st.replay(ds, checkpoint_name=f"{sname}-{n}")

    # the commit point: journal all prepared tables durably
    _write_journal(base_dir, {"txn": txn_name, "stage": sname,
                              "tables": sorted(tables.keys())})

    # phase 2: publish every stage (each step crash-rerunnable; a
    # crash anywhere below is finished by recover_tables)
    for n in sorted(stages):
        stages[n].publish()
    os.remove(_journal_path(base_dir))
    return {"engines": engines, "stats": stats, "recovered": recovered}
