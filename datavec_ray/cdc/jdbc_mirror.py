"""Incremental JDBC/DB-API mirror of the CDC lake.

Serving-side complement of ``replicate_to`` (lake→lake) and
``sources.write_jdbc`` (one-shot table dump): materialize the lake's
live state into an external SQL database and keep it current by
shipping ONLY the row-level change feed between the mirror's recorded
snapshot position and the lake's newest snapshot — upserts as
key-replacing inserts, deletes as key deletes.

Reference anchor: DataVec only READS from JDBC
(``datavec-jdbc/.../JDBCRecordReader.java:37``); an incrementally
maintained write-side mirror is the capability a serving stack needs
on top.

Exactly-once discipline (same as every sink in this engine):
- the applied operations are IDEMPOTENT (primary-key upsert / delete),
  so re-running a crashed catch-up converges to the same table state;
- the mirror position (source lake id → snapshot name) is stored IN
  THE TARGET DATABASE (``_datavec_mirror_state``) and only advanced
  AFTER the feed fully applied — a crash in between re-applies the
  same idempotent feed;
- cost per catch-up is proportional to the CHANGESET (one aligned
  partition-diff task per partition), never the lake.

Scale shape: the change feed is computed distributed (Ray tasks per
partition); the DB apply itself is the protocol boundary — DB-API is
row-oriented and (for sqlite) single-writer, so rows are bound via
``executemany`` per feed batch through ONE connection opened by the
driver. A parallel apply against a server-grade DB would shard the
feed by key range with one connection per task (the ``write_jdbc``
pattern); the feed side needs no change.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import pyarrow as pa
import pyarrow.compute as pc

MIRROR_STATE_TABLE = "_datavec_mirror_state"

_CREATE_DATA = """
CREATE TABLE IF NOT EXISTS {table} (
  conv_id TEXT NOT NULL,
  turn_idx INTEGER NOT NULL,
  role TEXT, text TEXT, tool TEXT,
  ts_ms INTEGER, lsn INTEGER,
  PRIMARY KEY (conv_id, turn_idx)
)"""

_CREATE_STATE = f"""
CREATE TABLE IF NOT EXISTS {MIRROR_STATE_TABLE} (
  source TEXT PRIMARY KEY, snapshot TEXT, lsn_hi INTEGER
)"""


def mirror_to_jdbc(engine, connection_factory: Callable, table: str,
                   upto: Optional[str] = None,
                   upsert_sql: Optional[str] = None) -> dict:
    """Catch the DB table up to the lake's newest (or ``upto``)
    snapshot. ``connection_factory`` is a zero-arg callable returning a
    DB-API connection (e.g. ``sources.sqlite_connection(path)``).
    ``upsert_sql`` overrides the per-row upsert statement for non-sqlite
    dialects (default: ``INSERT OR REPLACE``, 7 positional params).
    Returns {from, to, upserts, deletes, noop}."""
    tt = engine.time_travel()
    vs = [v for v in tt.versions() if v["available"]]
    if not vs:
        raise ValueError("source lake has no committed snapshots")
    names = [v["name"] for v in vs]
    to_name = names[-1] if upto is None else upto
    if to_name not in names:
        raise ValueError(f"snapshot {to_name!r} not available on source")
    src_id = os.path.abspath(engine.lake_dir)

    conn = connection_factory()
    try:
        cur = conn.cursor()
        cur.execute(_CREATE_DATA.format(table=table))
        cur.execute(_CREATE_STATE)
        conn.commit()
        cur.execute(f"SELECT snapshot FROM {MIRROR_STATE_TABLE} "
                    "WHERE source = ?", (src_id,))
        row = cur.fetchone()
        from_name = row[0] if row else None
        if from_name == to_name:
            return {"from": from_name, "to": to_name, "upserts": 0,
                    "deletes": 0, "noop": True}
        if from_name is not None:
            if from_name not in names:
                raise ValueError(
                    f"mirrored snapshot {from_name!r} was pruned on the "
                    "source; rebuild the mirror (drop the table + state "
                    "row) from scratch")
            if names.index(from_name) > names.index(to_name):
                raise ValueError(
                    f"upto={to_name!r} is older than the mirror's "
                    f"position {from_name!r}")

        up_sql = upsert_sql or (
            f"INSERT OR REPLACE INTO {table} "
            "(conv_id, turn_idx, role, text, tool, ts_ms, lsn) "
            "VALUES (?, ?, ?, ?, ?, ?, ?)")
        del_sql = f"DELETE FROM {table} WHERE conv_id = ? AND turn_idx = ?"
        feed = tt.change_feed(from_name, to_name)
        n_up = n_del = 0
        lsn_hi = 0
        for batch in feed.iter_batches(batch_size=16384,
                                       batch_format="pyarrow"):
            if batch.num_rows == 0:
                continue
            lsn_hi = max(lsn_hi, int(pc.max(batch["lsn"]).as_py() or 0))
            is_del = pc.equal(batch["change_type"], "delete")
            dels = batch.filter(is_del)
            ups = batch.filter(pc.invert(is_del))
            if ups.num_rows:
                ts_ms = pc.cast(pc.cast(ups["ts"], pa.timestamp("ms")),
                                pa.int64())
                rows = zip(ups["conv_id"].to_pylist(),
                           ups["turn_idx"].to_pylist(),
                           ups["role"].to_pylist(),
                           ups["text"].to_pylist(),
                           ups["tool"].to_pylist(),
                           ts_ms.to_pylist(),
                           ups["lsn"].to_pylist())
                cur.executemany(up_sql, list(rows))
                n_up += ups.num_rows
            if dels.num_rows:
                cur.executemany(del_sql, list(zip(
                    dels["conv_id"].to_pylist(),
                    dels["turn_idx"].to_pylist())))
                n_del += dels.num_rows
            conn.commit()       # per-batch commit: idempotent re-apply
        # advance the position ONLY after the feed fully applied
        cur.execute(
            f"INSERT OR REPLACE INTO {MIRROR_STATE_TABLE} "
            "(source, snapshot, lsn_hi) VALUES (?, ?, ?)",
            (src_id, to_name, lsn_hi))
        conn.commit()
        return {"from": from_name, "to": to_name, "upserts": n_up,
                "deletes": n_del, "noop": False}
    finally:
        conn.close()
