"""Driver contract for the graft builder (Ray Data target).

entry():    flagship CDC replay (binlog derived from events.parquet →
            hash-partitioned LWW upsert engine → Parquet lake) at sf0.001.
queries():  one callable per implemented operator/pipeline (SURVEY.md §2);
            each takes sf_dir and returns Dataset / DataFrame / Table.
oracle_sql(): DuckDB-equivalent SQL per query (same column names!).

Ray is initialised by the driver BEFORE importing this module: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

# make the sibling package importable regardless of the driver's cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import pyarrow.parquet as pq
    import ray.data as rd
    path = os.path.join(sf_dir, f"{table}.parquet")
    # metadata-free schema: the testdata files carry pandas metadata
    # whose presence makes pa.Schema unhashable (pyarrow 16), so every
    # read task would log Ray's "Failed to hash the schemas" warning
    sch = pq.read_schema(path).remove_metadata()
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns, schema=sch)


def _schema_of(sf_dir: str, table: str):
    import pyarrow.parquet as pq
    from datavec_ray.schema import Schema
    return Schema(pq.read_schema(os.path.join(sf_dir, f"{table}.parquet")))


# ---------------------------------------------------------------------------
# entry — flagship CDC pipeline at sf0.001
# ---------------------------------------------------------------------------

def entry() -> Any:
    """events.parquet → deterministic transcript binlog → stateless
    transform steps → LWW upsert engine (actor shards, checkpoint,
    manifest) → lake; returns the final lake table."""
    import ray.data as rd
    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine

    sf_dir = "/root/testdata/sf0.001"
    events = _read(sf_dir, "events")
    binlog_ds = events.map_batches(binlog_from_events, batch_format="pyarrow")
    lake = os.path.join(tempfile.gettempdir(), "datavec_ray_entry_lake")
    shutil.rmtree(lake, ignore_errors=True)
    eng = CdcIngestEngine(lake, num_partitions=4)
    eng.ingest(binlog_ds)
    eng.checkpoint("entry", 10**9)
    eng.commit()
    final = eng.read_lake()
    eng.shutdown()
    return rd.from_arrow(final)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_groupby_agg(sf_dir: str):
    """TPC-H Q1 shape: filter + derived column + grouped reduce."""
    import datetime
    from datavec_ray import TransformPipeline
    from datavec_ray.conditions import ColumnCondition
    from datavec_ray.reduce import Reducer
    from datavec_ray.steps import ConditionFilter, DoubleColumnsMathOp

    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_shipdate"]
    ds = _read(sf_dir, "lineitem", cols)
    p = TransformPipeline(_schema_of(sf_dir, "lineitem").select(cols))
    p.add(ConditionFilter(ColumnCondition(
        "l_shipdate", "GreaterThan", datetime.datetime(1998, 9, 2))))
    p.add(DoubleColumnsMathOp("gross", "Multiply", ["l_extendedprice", "l_quantity"]))
    p.add(Reducer(["l_returnflag", "l_linestatus"],
                  [["l_quantity", "Sum", "sum_qty"],
                   ["l_extendedprice", "Sum", "sum_price"],
                   ["gross", "Mean", "avg_gross"],
                   ["l_quantity", "Count", "n"]]))
    from datavec_ray.steps import RoundColumns
    p.add(RoundColumns(["sum_qty", "sum_price", "avg_gross"], 4))
    return p.execute(ds)


def _q_filter_math(sf_dir: str):
    from datavec_ray import TransformPipeline
    from datavec_ray.conditions import BooleanCondition, ColumnCondition
    from datavec_ray.steps import (ConditionFilter, DoubleMathOp,
                                   DoubleMathFunction, KeepColumns)

    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_discount"]
    ds = _read(sf_dir, "lineitem", cols)
    p = TransformPipeline(_schema_of(sf_dir, "lineitem").select(cols))
    p.add(ConditionFilter(BooleanCondition("OR", [
        ColumnCondition("l_discount", "LessThan", 0.02),
        ColumnCondition("l_quantity", "GreaterOrEqual", 45.0)])))
    p.add(DoubleMathOp("l_quantity", "Multiply", 2.0))
    p.add(DoubleMathOp("l_quantity", "Add", 1.0))
    p.add(DoubleMathFunction("l_discount", "SQRT"))
    from datavec_ray.steps import RoundColumns
    p.add(RoundColumns(["l_discount"], 6))
    p.add(KeepColumns(["l_orderkey", "l_linenumber", "l_quantity", "l_discount"]))
    return p.execute(ds)


def _q_join_broadcast(sf_dir: str):
    from datavec_ray import TransformPipeline
    from datavec_ray.conditions import ColumnCondition
    from datavec_ray.join import JoinStep
    from datavec_ray.steps import ConditionFilter, KeepColumns
    from datavec_ray.util import dataset_to_table

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = dataset_to_table(_read(sf_dir, "customer",
                                  ["c_custkey", "c_name", "c_mktsegment"]))
    p = TransformPipeline(_schema_of(sf_dir, "orders").select(
        ["o_orderkey", "o_custkey", "o_totalprice"]))
    p.add(JoinStep(cust, ["o_custkey"], ["c_custkey"], "Inner", broadcast=True))
    p.add(ConditionFilter(ColumnCondition("c_mktsegment", "NotEqual", "BUILDING")))
    p.add(KeepColumns(["o_orderkey", "o_totalprice", "c_name", "c_mktsegment"]))
    return p.execute(orders)


def _q_join_shuffle(sf_dir: str):
    from datavec_ray import TransformPipeline
    from datavec_ray.join import JoinStep
    from datavec_ray.reduce import Reducer

    from datavec_ray.steps import LambdaStep

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    p = TransformPipeline(_schema_of(sf_dir, "lineitem").select(
        ["l_orderkey", "l_extendedprice", "l_discount"]))

    # prices have 2 decimals: sum EXACT integer cents so the parallel
    # sum is bit-equal to the oracle's at any scale factor (a float
    # sum's error exceeds round(4) once the total passes ~1e10)
    def to_cents(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("l_extendedprice")
        return t.set_column(
            i, pa.field("l_extendedprice", pa.int64()),
            pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0), 0),
                    pa.int64()))

    p.add(LambdaStep(
        to_cents,
        lambda s: s.without_columns(["l_extendedprice"])
        .with_column("l_extendedprice", pa.int64(), index=1),
        "price_to_cents"))
    p.add(JoinStep(lambda: orders, ["l_orderkey"], ["o_orderkey"], "Inner",
                   broadcast=False, num_partitions=8))  # exercise shuffle join
    p.add(Reducer(["o_orderpriority"],
                  [["l_extendedprice", "Sum", "sum_cents"],
                   ["l_extendedprice", "Count", "n"]]))

    def cents_out(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("sum_cents")
        return t.set_column(
            i, pa.field("sum_price", pa.float64()),
            pc.round(pc.divide(pc.cast(t["sum_cents"], pa.float64()), 100.0),
                     4)).rename_columns(
            [c if c != "sum_cents" else "sum_price" for c in t.column_names])

    p.add(LambdaStep(cents_out, lambda s: s, "cents_to_price"))
    return p.execute(li)


def _q_rank(sf_dir: str):
    from datavec_ray import TransformPipeline
    from datavec_ray.rank import CalculateSortedRank
    from datavec_ray.steps import KeepColumns

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    p = TransformPipeline(_schema_of(sf_dir, "orders").select(
        ["o_orderkey", "o_totalprice"]))
    p.add(CalculateSortedRank(["o_totalprice", "o_orderkey"], "rank",
                              descending=True))
    p.add(KeepColumns(["o_orderkey", "o_totalprice", "rank"]))
    return p.execute(ds)


def _q_pivot(sf_dir: str):
    from datavec_ray import TransformPipeline
    from datavec_ray.steps import Pivot, StringToCategorical

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])
    p = TransformPipeline(_schema_of(sf_dir, "orders").select(
        ["o_orderkey", "o_orderstatus", "o_totalprice"]))
    p.add(StringToCategorical("o_orderstatus", ["F", "O", "P"]))
    p.add(Pivot("o_orderstatus", "o_totalprice", default_value=0.0))
    return p.execute(ds)


def _q_string_ops(sf_dir: str):
    from datavec_ray import TransformPipeline
    from datavec_ray.steps import (AppendString, ChangeCase,
                                   ConcatenateStringColumns, KeepColumns,
                                   RegexReplace)

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    p = TransformPipeline(_schema_of(sf_dir, "customer").select(
        ["c_custkey", "c_name", "c_mktsegment"]))
    p.add(ChangeCase("c_mktsegment", "LOWER"))
    p.add(ConcatenateStringColumns("label", "-", ["c_name", "c_mktsegment"]))
    p.add(RegexReplace("label", [["[0-9]+", "#"]]))
    p.add(AppendString("label", "!"))
    p.add(KeepColumns(["c_custkey", "label"]))
    return p.execute(ds)


def _q_normalize_text(sf_dir: str):
    """Unicode canonicalization before hashing/dedup: deterministic
    messy text (combining accent + tab + control char injected around
    each document, mirrored in SQL) → NFC + control strip + whitespace
    collapse + trim + lowercase."""
    from datavec_ray.steps.string import NormalizeText

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def messy(t: pa.Table) -> pa.Table:
        m = pc.binary_join_element_wise(
            "Café\t ", t["text"].combine_chunks(), "  X\x7fY", "")
        return pa.table({"doc_id": t["doc_id"], "text": m})

    step = NormalizeText("text", form="NFC", lower=True)
    return docs.map_batches(messy, batch_format="pyarrow") \
        .map_batches(lambda b: step.apply(b), batch_format="pyarrow")


def _q_categorical_onehot(sf_dir: str):
    from datavec_ray import TransformPipeline
    from datavec_ray.steps import CategoricalToOneHot, KeepColumns, StringToCategorical

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_returnflag"])
    p = TransformPipeline(_schema_of(sf_dir, "lineitem").select(
        ["l_orderkey", "l_linenumber", "l_returnflag"]))
    p.add(StringToCategorical("l_returnflag", ["A", "N", "R"]))
    p.add(CategoricalToOneHot("l_returnflag"))
    p.add(KeepColumns(["l_orderkey", "l_linenumber", "l_returnflag[A]",
                       "l_returnflag[N]", "l_returnflag[R]"]))
    return p.execute(ds)


def _q_time_derive(sf_dir: str):
    from datavec_ray import TransformPipeline
    from datavec_ray.reduce import Reducer
    from datavec_ray.steps import DeriveColumnsFromTime

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    p = TransformPipeline(_schema_of(sf_dir, "orders").select(
        ["o_orderdate", "o_totalprice"]))
    p.add(DeriveColumnsFromTime("o_orderdate", [["year", "yr"], ["month", "mo"]]))
    p.add(Reducer(["yr", "mo"], [["o_totalprice", "Sum", "sum_price"],
                                 ["o_totalprice", "Count", "n"]]))
    from datavec_ray.steps import RoundColumns
    p.add(RoundColumns(["sum_price"], 4))
    return p.execute(ds)


def _q_conditional_replace(sf_dir: str):
    from datavec_ray import TransformPipeline
    from datavec_ray.conditions import ColumnCondition
    from datavec_ray.reduce import Reducer
    from datavec_ray.steps import ConditionalReplaceValue

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_discount"])
    p = TransformPipeline(_schema_of(sf_dir, "lineitem").select(
        ["l_returnflag", "l_discount"]))
    p.add(ConditionalReplaceValue("l_discount", 0.0,
                                  ColumnCondition("l_discount", "LessThan", 0.05)))
    p.add(Reducer(["l_returnflag"], [["l_discount", "Sum", "sum_disc"],
                                     ["l_discount", "Count", "n"]]))
    from datavec_ray.steps import RoundColumns
    p.add(RoundColumns(["sum_disc"], 6))
    return p.execute(ds)


def _q_reduce_ops(sf_dir: str):
    from datavec_ray import TransformPipeline
    from datavec_ray.reduce import Reducer

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_partkey"])
    p = TransformPipeline(_schema_of(sf_dir, "lineitem").select(
        ["l_returnflag", "l_quantity", "l_partkey"]))
    p.add(Reducer(["l_returnflag"],
                  [["l_quantity", "Min", "min_q"], ["l_quantity", "Max", "max_q"],
                   ["l_quantity", "Range", "range_q"],
                   ["l_quantity", "Stdev", "sd_q"],
                   ["l_quantity", "Variance", "var_q"],
                   ["l_partkey", "CountUniqueExact", "uniq_parts"]]))
    from datavec_ray.steps import RoundColumns
    p.add(RoundColumns(["sd_q", "var_q"], 6))
    return p.execute(ds)


def _q_normalize(sf_dir: str):
    from datavec_ray import TransformPipeline
    from datavec_ray.reduce import Reducer
    from datavec_ray.steps.normalize import fit_normalizer

    ds = _read(sf_dir, "events", ["event_type", "value"])
    norm = fit_normalizer(ds, "MinMax", "value")
    p = TransformPipeline(_schema_of(sf_dir, "events").select(
        ["event_type", "value"]))
    p.add(norm)
    p.add(Reducer(["event_type"], [["value", "Mean", "avg_norm"],
                                   ["value", "Count", "n"]]))
    from datavec_ray.steps import RoundColumns
    p.add(RoundColumns(["avg_norm"], 8))
    return p.execute(ds)


def _q_sequence_diff(sf_dir: str):
    from datavec_ray import TransformPipeline
    from datavec_ray.sequence import GroupedSequence, SequenceDifference
    from datavec_ray.steps import KeepColumns

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    p = TransformPipeline(_schema_of(sf_dir, "events").select(
        ["event_id", "user_id", "ts", "value"]))
    p.add(GroupedSequence(["user_id"], ["ts", "event_id"],
                          [SequenceDifference("value", 1, new_column="dv")]))
    p.add(KeepColumns(["event_id", "user_id", "dv"]))
    return p.execute(ds)


def _q_moving_window(sf_dir: str):
    from datavec_ray import TransformPipeline
    from datavec_ray.sequence import GroupedSequence, MovingWindowReduce
    from datavec_ray.steps import KeepColumns

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    p = TransformPipeline(_schema_of(sf_dir, "events").select(
        ["event_id", "user_id", "ts", "value"]))
    p.add(GroupedSequence(["user_id"], ["ts", "event_id"],
                          [MovingWindowReduce("value", 3, "Mean", "mv")]))
    from datavec_ray.steps import RoundColumns
    p.add(RoundColumns(["mv"], 8))
    p.add(KeepColumns(["event_id", "user_id", "mv"]))
    return p.execute(ds)


def _q_session_split(sf_dir: str):
    from datavec_ray import TransformPipeline
    from datavec_ray.sequence import GroupedSequence, SplitTimeSeparation
    from datavec_ray.steps import KeepColumns

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    p = TransformPipeline(_schema_of(sf_dir, "events").select(
        ["event_id", "user_id", "ts"]))
    p.add(GroupedSequence(["user_id"], ["ts", "event_id"],
                          [SplitTimeSeparation("ts", 3_600_000, "session")]))
    p.add(KeepColumns(["event_id", "user_id", "session"]))
    return p.execute(ds)


def _q_tumbling_window(sf_dir: str):
    from datavec_ray import TransformPipeline
    from datavec_ray.sequence import GroupedSequence, TumblingTimeWindowReduce
    from datavec_ray.steps import LambdaStep

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    p = TransformPipeline(_schema_of(sf_dir, "events").select(
        ["user_id", "ts", "value"]))
    p.add(GroupedSequence(["user_id"], ["ts"],
                          [TumblingTimeWindowReduce(
                              ["user_id"], "ts", 86_400_000,
                              [["value", "Sum", "sum_value"],
                               ["value", "Count", "n"]],
                              emit_window_bounds=False)]))

    def to_ms(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("window_start")
        ms = pc.divide(t["window_start"].cast(pa.int64()), 1000)
        return t.set_column(i, pa.field("window_start", pa.int64()), ms)

    p.add(LambdaStep(to_ms, name="window_start_to_ms"))
    from datavec_ray.steps import RoundColumns
    p.add(RoundColumns(["sum_value"], 6))
    return p.execute(ds)


def _q_cdc_upsert(sf_dir: str):
    """The flagship as an oracle-checkable query: derived binlog → pure
    Dataset LWW compaction → final transcript state (ts as epoch ms)."""
    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import lww_compact_dataset

    ds = _read(sf_dir, "events")
    binlog = ds.map_batches(binlog_from_events, batch_format="pyarrow")
    final = lww_compact_dataset(binlog, num_partitions=16)

    def ts_to_ms(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("ts")
        return t.set_column(i, pa.field("ts_ms", pa.int64()),
                            t["ts"].cast(pa.int64())).rename_columns(
            [c if c != "ts" else "ts_ms" for c in t.column_names])

    return final.map_batches(ts_to_ms, batch_format="pyarrow")


_SQL_LAKE = """select role, count(*) as n, min(turn_idx) as lo,
                   max(turn_idx) as hi, count(distinct conv_id) as convs,
                   avg(length(text)) as avg_len
            from lake
            group by role
            order by role asc"""


def _q_cdc_sql(sf_dir: str):
    """The two flagship surfaces composed: replay the binlog into an
    exactly-once lake (CdcIngestEngine), then query the lake through
    the SQL frontend — the statement plans onto read_lake_dataset
    (projection pushdown) + the combiner Reducer. Oracle = the LWW
    binlog CTE feeding the IDENTICAL aggregation SQL in DuckDB."""
    import tempfile

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine
    from datavec_ray.sql import sql

    ds = _read(sf_dir, "events")
    binlog = ds.map_batches(binlog_from_events, batch_format="pyarrow")
    lake = tempfile.mkdtemp(prefix="sql_lake")
    eng = CdcIngestEngine(lake, num_partitions=8)
    eng.replay(binlog, checkpoint_name="base")
    table = eng.read_lake_dataset(
        columns=["conv_id", "turn_idx", "role", "text"])
    return sql(_SQL_LAKE, {"lake": table})


def _q_cdc_stats(sf_dir: str):
    """Metadata-only table statistics over the replayed lake:
    ``CdcIngestEngine.table_stats`` answers count/min/max/null-count
    from parquet FOOTERS only for rewrite-mode partitions (sound
    because a committed partition file IS the live state — tombstones
    dropped at commit), with an exact pruned-scan fallback for the
    string column. The 100-TB shape: counting the lake reads only
    footers. Oracle = the same statistics from the LWW state in SQL."""
    import tempfile

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine

    ds = _read(sf_dir, "events")
    binlog = ds.map_batches(binlog_from_events, batch_format="pyarrow")
    lake = tempfile.mkdtemp(prefix="stats_lake")
    eng = CdcIngestEngine(lake, num_partitions=8)
    try:
        eng.replay(binlog, checkpoint_name="base")
        st = eng.table_stats(["ts", "turn_idx", "tool"])
    finally:
        eng.shutdown()

    def ms(v):
        return pa.scalar(v, pa.timestamp("ms")).cast(pa.int64()).as_py()

    c = st["columns"]
    return pa.table({
        "n_rows": pa.array([st["rows"]], pa.int64()),
        "ts_lo": pa.array([ms(c["ts"]["min"])], pa.int64()),
        "ts_hi": pa.array([ms(c["ts"]["max"])], pa.int64()),
        "turn_lo": pa.array([c["turn_idx"]["min"]], pa.int64()),
        "turn_hi": pa.array([c["turn_idx"]["max"]], pa.int64()),
        "tool_nulls": pa.array([c["tool"]["null_count"]], pa.int64()),
        "tool_lo": pa.array([c["tool"]["min"]], pa.string()),
        "tool_hi": pa.array([c["tool"]["max"]], pa.string()),
    })


def _q_cdc_merge(sf_dir: str):
    """ANSI-MERGE conditional upsert against a replayed lake: build the
    lake from the full binlog, then MERGE a deterministic changeset —
    WHEN MATCHED AND turn_idx%5=0 DELETE, WHEN MATCHED AND target
    role='assistant' UPDATE, WHEN NOT MATCHED AND turn_idx%3=0 INSERT —
    through the engine's one-exchange merge + exactly-once replay.
    Source ts embeds event_id so duplicate-key source rows resolve by
    LWW to exactly the SQL mirror's row_number()=1 pick."""
    import tempfile

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine

    ds = _read(sf_dir, "events")
    binlog = ds.map_batches(binlog_from_events, batch_format="pyarrow")
    lake = tempfile.mkdtemp(prefix="merge_lake")
    eng = CdcIngestEngine(lake, num_partitions=8)
    try:
        eng.replay(binlog, checkpoint_name="base")

        def to_src(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            eid = t["event_id"].to_numpy(zero_copy_only=False)
            keep = eid % 7 == 0
            t = t.filter(pa.array(keep))
            eid = eid[keep]
            ts_ms = pc.cast(t["ts"], pa.timestamp("ms"), safe=False) \
                .cast(pa.int64()).to_numpy(zero_copy_only=False)
            props = pc.fill_null(pc.cast(t["props"], pa.string()), "")
            return pa.table({
                "conv_id": pc.binary_join_element_wise(
                    "conv-", pc.cast(t["user_id"], pa.string()), ""),
                "turn_idx": pa.array((eid % 23).astype(np.int32)),
                "role": pa.array(["merged"] * len(eid), pa.string()),
                "text": pc.binary_join_element_wise("m:", props, ""),
                "tool": pa.array(["merge"] * len(eid), pa.string()),
                "ts": pa.array(ts_ms + 31536000000 + eid).cast(
                    pa.timestamp("ms")),
            })

        src = _read(sf_dir, "events",
                    ["event_id", "user_id", "ts", "props"]) \
            .map_batches(to_src, batch_format="pyarrow")
        eng.merge_into(
            src,
            when_matched_delete=lambda s, t: (
                s["turn_idx"].to_numpy(zero_copy_only=False) % 5 == 0),
            when_matched_update=lambda s, t: pc.equal(t["role"],
                                                      "assistant"),
            when_not_matched_insert=lambda s: (
                s["turn_idx"].to_numpy(zero_copy_only=False) % 3 == 0),
        )
        final = eng.read_lake()
    finally:
        eng.shutdown()
    i = final.schema.get_field_index("ts")
    return final.set_column(
        i, pa.field("ts_ms", pa.int64()),
        final["ts"].cast(pa.int64()))


def _q_cdc_replicate(sf_dir: str):
    """Lake→lake CDC replication: replay the first half of the binlog
    into a source lake (snapshot v1), replicate the full change feed
    into a cross-layout mirror, replay the second half (v2), then
    incrementally catch the mirror up — the catch-up ships only the
    v1→v2 delta through the mirror's exactly-once replay path. The
    mirror's final state must equal the full-binlog LWW oracle."""
    import tempfile

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine

    ds = _read(sf_dir, "events")
    cut = int(_read(sf_dir, "events", ["event_id"]).max("event_id")) // 2
    binlog = ds.map_batches(binlog_from_events, batch_format="pyarrow")

    def _half(lo: bool):
        def f(t: pa.Table) -> pa.Table:
            m = pc.less_equal(t["lsn"], cut) if lo \
                else pc.greater(t["lsn"], cut)
            return t.filter(m)
        f.__name__ = "binlog_v1" if lo else "binlog_v2"
        return f

    src = CdcIngestEngine(tempfile.mkdtemp(prefix="repl_src"),
                          num_partitions=8)
    mir = CdcIngestEngine(tempfile.mkdtemp(prefix="repl_mir"),
                          num_partitions=5)
    try:
        src.replay(binlog.map_batches(_half(True), batch_format="pyarrow"),
                   checkpoint_name="v1")
        src.replicate_to(mir)
        src.replay(binlog.map_batches(_half(False), batch_format="pyarrow"),
                   checkpoint_name="v2")
        src.replicate_to(mir)
        final = mir.read_lake()
    finally:
        src.shutdown()
        mir.shutdown()
    i = final.schema.get_field_index("ts")
    return final.set_column(i, pa.field("ts_ms", pa.int64()),
                            final["ts"].cast(pa.int64()))


def _q_cdc_aggview(sf_dir: str):
    """Incrementally-maintained grouped aggregate over the CDC lake:
    ingest the first half of the binlog (snapshot v1), build the view,
    ingest the rest (v2), then ADVANCE the view with the v1→v2 retract
    feed — delta-proportional work, no lake rescan. The oracle
    recomputes the same aggregate from scratch over the full LWW
    replay, so the incremental path is value-checked end to end."""
    import tempfile

    from datavec_ray.cdc.aggview import AggView
    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine

    # pin the scan once: .max() is a full pass and the binlog map is
    # another; without the pin each re-reads parquet
    ds = _read(sf_dir, "events").materialize()
    cut = int(ds.max("event_id")) // 2
    binlog = ds.map_batches(binlog_from_events, batch_format="pyarrow")
    lake = tempfile.mkdtemp(prefix="aggview_lake")
    eng = CdcIngestEngine(lake, num_partitions=8)
    try:
        eng.replay(binlog.filter(expr=f"lsn <= {cut}"),
                   checkpoint_name="v1")
        eng.replay(binlog.filter(expr=f"lsn > {cut}"),
                   checkpoint_name="v2")
        tt = eng.time_travel()
        view = AggView(keys=["role"],
                       specs=[("role", "Count", "n_turns"),
                              ("turn_idx", "Sum", "sum_turn"),
                              ("ts", "Mean", "mean_ts_ms")])
        state = view.build(tt.read_state_at("v1"))
        state = view.advance(state, tt.retract_feed("v1", "v2"))
        return view.finalize(state)
    finally:
        eng.shutdown()


def _q_role_transitions(sf_dir: str):
    """Markov role-transition matrix over the replayed transcript
    state (who speaks after whom): one key exchange, per-partition
    shifted-pair scan + in-partition combine, ≤ states² partial rows
    (misc.transition_counts). Oracle: lag() window + GROUP BY."""
    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import lww_compact_dataset
    from datavec_ray.misc import transition_counts

    ds = _read(sf_dir, "events")
    binlog = ds.map_batches(binlog_from_events, batch_format="pyarrow")
    final = lww_compact_dataset(binlog, num_partitions=16)
    return transition_counts(final, ["conv_id"], "turn_idx", "role")


def _q_cdc_renderview(sf_dir: str):
    """Incrementally-maintained SFT render export: build the rendered
    per-conversation training table from snapshot v1, then ADVANCE it
    with the v1→v2 retract feed — only conversations the delta touched
    re-render; the oracle re-renders the full LWW state from scratch
    (cdc.aggview.RenderView)."""
    import tempfile

    from datavec_ray.cdc.aggview import RenderView
    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine

    cut = int(_read(sf_dir, "events", ["event_id"]).max("event_id")) // 2
    ds = _read(sf_dir, "events")
    binlog = ds.map_batches(binlog_from_events, batch_format="pyarrow")
    with tempfile.TemporaryDirectory(dir="/tmp") as lake:
        eng = CdcIngestEngine(lake, num_partitions=8)
        try:
            eng.replay(binlog.filter(expr=f"lsn <= {cut}"),
                       checkpoint_name="v1")
            eng.replay(binlog.filter(expr=f"lsn > {cut}"),
                       checkpoint_name="v2")
            tt = eng.time_travel()
            view = RenderView()
            state = view.build(tt.read_state_at("v1"))
            state = view.advance(state, tt.retract_feed("v1", "v2"),
                                 tt.read_state_at("v2"))
            return state
        finally:
            eng.shutdown()


def _q_cdc_evolve(sf_dir: str):
    """Schema evolution through the REAL ingest path, driver-checked:
    segment 1 arrives WITHOUT the tool column, segment 2 arrives with
    tool AND a widened turn_idx (int32→int64); the registry unifies
    (additive column null-backfilled, lossless promotion) before any
    lake write. Oracle = LWW over the full binlog with tool nulled for
    the pre-evolution LSN range and turn_idx cast wide."""
    import tempfile

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine
    from datavec_ray.util import dataset_to_table

    ds = _read(sf_dir, "events").materialize()
    cut = int(ds.max("event_id")) // 2
    binlog = dataset_to_table(
        ds.map_batches(binlog_from_events, batch_format="pyarrow"))
    binlog = binlog.sort_by([("lsn", "ascending")])
    n1 = int(pc.sum(pc.less_equal(binlog["lsn"], cut)).as_py())
    seg1 = binlog.slice(0, n1).drop_columns(["tool"])
    seg2 = binlog.slice(n1)
    i = seg2.schema.get_field_index("turn_idx")
    seg2 = seg2.set_column(i, pa.field("turn_idx", pa.int64()),
                           seg2["turn_idx"].cast(pa.int64()))
    lake = tempfile.mkdtemp(prefix="evolve_lake")
    eng = CdcIngestEngine(lake, num_partitions=8)
    try:
        eng.ingest(seg1)
        eng.ingest(seg2)
        eng.commit()
        out = eng.read_lake()
        return pa.table({
            "conv_id": out["conv_id"],
            "turn_idx": pc.cast(out["turn_idx"], pa.int64()),
            "role": out["role"],
            "text": out["text"],
            "tool": out["tool"],
            "ts_ms": pc.cast(out["ts"], pa.int64()),
        })
    finally:
        eng.shutdown()


def _q_cdc_resume(sf_dir: str):
    """Crash/resume + double delivery through the real engine,
    driver-checked: engine 1 replays the first half and checkpoints,
    then 'crashes'; engine 2 opens the same lake (fresh writer epoch),
    resumes from the checkpoint, and is fed the ENTIRE binlog again —
    events at or below the resume watermark are dropped exactly-once
    (min_lsn_exclusive), the rest apply. Final state must equal the
    one-shot LWW oracle over the full binlog."""
    import tempfile

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine
    from datavec_ray.util import dataset_to_table

    ds = _read(sf_dir, "events").materialize()
    cut = int(ds.max("event_id")) // 2
    binlog = dataset_to_table(
        ds.map_batches(binlog_from_events, batch_format="pyarrow"))
    lake = tempfile.mkdtemp(prefix="resume_lake")
    eng1 = CdcIngestEngine(lake, num_partitions=8)
    try:
        eng1.replay(binlog.filter(pc.less_equal(binlog["lsn"], cut)),
                    checkpoint_name="v1")
    finally:
        eng1.shutdown()                      # crash after the checkpoint
    eng2 = CdcIngestEngine(lake, num_partitions=8)
    try:
        wm = eng2.resume_from_checkpoint()
        eng2.ingest(binlog, min_lsn_exclusive=wm)   # full feed re-delivered
        eng2.commit()
        out = eng2.read_lake()
        return pa.table({
            "conv_id": out["conv_id"],
            "turn_idx": pc.cast(out["turn_idx"], pa.int32()),
            "role": out["role"],
            "text": out["text"],
            "tool": out["tool"],
            "ts_ms": pc.cast(out["ts"], pa.int64()),
        })
    finally:
        eng2.shutdown()


def _q_cdc_wap(sf_dir: str):
    """Write-audit-publish staged commits through the real engine
    (cdc/wap.py — the Iceberg WAP pattern): replay the first half
    directly, then (a) stage a POISONED second half, fail its audit,
    abort — the lake must be untouched; (b) stage the clean second
    half, pass the audit, publish atomically. Final state must equal
    the one-shot LWW oracle over the full binlog — i.e. the aborted
    stage is invisible and the published one is exactly-once."""
    import tempfile

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine
    from datavec_ray.util import dataset_to_table

    ds = _read(sf_dir, "events").materialize()
    cut = int(ds.max("event_id")) // 2
    binlog = dataset_to_table(
        ds.map_batches(binlog_from_events, batch_format="pyarrow"))
    seg1 = binlog.filter(pc.less_equal(binlog["lsn"], cut))
    seg2 = binlog.filter(pc.greater(binlog["lsn"], cut))
    poisoned = seg2.set_column(
        seg2.schema.get_field_index("turn_idx"), "turn_idx",
        pc.subtract(pa.scalar(-1, pa.int32()), seg2["turn_idx"]))
    rule = [{"column": "turn_idx", "check": "min_ge", "value": 0}]
    lake = tempfile.mkdtemp(prefix="wap_lake")
    eng = CdcIngestEngine(lake, num_partitions=8)
    try:
        eng.replay(seg1, checkpoint_name="v1")
        bad = eng.stage("bad")
        bad.replay(poisoned)
        bad.audit(rule)
        assert bad.audit_passed is False
        bad.abort()                      # lake untouched
        good = eng.stage("good")
        good.replay(seg2)
        good.audit(rule)
        good.publish(require_audit=True)
        out = eng.read_lake()
        return pa.table({
            "conv_id": out["conv_id"],
            "turn_idx": pc.cast(out["turn_idx"], pa.int32()),
            "role": out["role"],
            "text": out["text"],
            "tool": out["tool"],
            "ts_ms": pc.cast(out["ts"], pa.int64()),
        })
    finally:
        eng.shutdown()


def _q_cdc_repartition(sf_dir: str):
    """Online partition-layout evolution through the real engine: replay
    half the binlog at 4 partitions, repartition the live lake to 8
    (full state re-splits through the ordinary exchange, watermark
    floored, old layout files dropped), replay the rest at the new
    layout. Final state must equal the one-shot LWW oracle — layout is
    physical only."""
    import tempfile

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine
    from datavec_ray.util import dataset_to_table

    ds = _read(sf_dir, "events").materialize()
    cut = int(ds.max("event_id")) // 2
    binlog = dataset_to_table(
        ds.map_batches(binlog_from_events, batch_format="pyarrow"))
    lake = tempfile.mkdtemp(prefix="repart_lake")
    eng = CdcIngestEngine(lake, num_partitions=4)
    try:
        eng.replay(binlog.filter(pc.less_equal(binlog["lsn"], cut)),
                   checkpoint_name="v1")
        eng.repartition(8, checkpoint_name="r8")
        assert eng.num_partitions == 8
        eng.replay(binlog.filter(pc.greater(binlog["lsn"], cut)),
                   checkpoint_name="v2")
        out = eng.read_lake()
        return pa.table({
            "conv_id": out["conv_id"],
            "turn_idx": pc.cast(out["turn_idx"], pa.int32()),
            "role": out["role"],
            "text": out["text"],
            "tool": out["tool"],
            "ts_ms": pc.cast(out["ts"], pa.int64()),
        })
    finally:
        eng.shutdown()


def _q_jdbc_mirror(sf_dir: str):
    """Incremental JDBC mirror end to end: replay half the binlog,
    mirror into sqlite (initial full sync), replay the rest, mirror
    again (ships ONLY the change feed — upserts + key deletes), read
    the DB table back. Oracle = the same LWW state; the external
    mirror must equal the lake exactly after the two catch-ups."""
    import sqlite3
    import tempfile

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine
    from datavec_ray.sources import sqlite_connection
    from datavec_ray.util import dataset_to_table

    ds = _read(sf_dir, "events").materialize()
    cut = int(ds.max("event_id")) // 2
    binlog = dataset_to_table(
        ds.map_batches(binlog_from_events, batch_format="pyarrow"))
    work = tempfile.mkdtemp(prefix="jdbc_mirror")
    lake, db = f"{work}/lake", f"{work}/mirror.db"
    eng = CdcIngestEngine(lake, num_partitions=8)
    try:
        eng.replay(binlog.filter(pc.less_equal(binlog["lsn"], cut)),
                   checkpoint_name="v1")
        eng.mirror_to_jdbc(sqlite_connection(db), "mirror")
        eng.replay(binlog.filter(pc.greater(binlog["lsn"], cut)),
                   checkpoint_name="v2")
        r = eng.mirror_to_jdbc(sqlite_connection(db), "mirror")
        assert not r["noop"] and r["from"] == "v1"
        con = sqlite3.connect(db)
        rows = con.execute(
            "SELECT conv_id, turn_idx, role, text, tool, ts_ms "
            "FROM mirror").fetchall()
        con.close()
        cols = list(zip(*rows)) if rows else [[]] * 6
        return pa.table({
            "conv_id": pa.array(cols[0], pa.string()),
            "turn_idx": pa.array(cols[1], pa.int32()),
            "role": pa.array(cols[2], pa.string()),
            "text": pa.array(cols[3], pa.string()),
            "tool": pa.array(cols[4], pa.string()),
            "ts_ms": pa.array(cols[5], pa.int64()),
        })
    finally:
        eng.shutdown()


def _q_cdc_autosalt(sf_dir: str):
    """AUTO skew handling end to end: a quarter of all events are
    concentrated into one synthetic hot conversation; the engine opens
    with auto_salt=True, detects it from the first segment's sampled
    key distribution, records the salt layout durably in the manifest,
    and every later replay routes with the same layout. Oracle = LWW
    over the identically-skewed binlog (salting must not change state,
    only its physical spread)."""
    import tempfile

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine
    from datavec_ray.util import dataset_to_table

    ds = _read(sf_dir, "events").materialize()
    cut = int(ds.max("event_id")) // 2

    def skew(b: pa.Table) -> pa.Table:
        hot = pc.equal(pc.bit_wise_and(b["lsn"], 3), 0)
        conv = pc.if_else(hot, pa.scalar("conv-hot"), b["conv_id"])
        return b.set_column(b.schema.get_field_index("conv_id"),
                            "conv_id", conv)

    binlog = dataset_to_table(
        ds.map_batches(binlog_from_events, batch_format="pyarrow")
          .map_batches(skew, batch_format="pyarrow"))
    lake = tempfile.mkdtemp(prefix="autosalt_lake")
    eng = CdcIngestEngine(lake, num_partitions=8, auto_salt=True)
    try:
        eng.replay(binlog.filter(pc.less_equal(binlog["lsn"], cut)),
                   checkpoint_name="v1")
        assert eng.hot_convs and "conv-hot" in eng.hot_convs \
            and eng.salt_turns > 1, "auto-salt detection did not fire"
        eng.replay(binlog.filter(pc.greater(binlog["lsn"], cut)),
                   checkpoint_name="v2")
        out = eng.read_lake()
        return pa.table({
            "conv_id": out["conv_id"],
            "turn_idx": pc.cast(out["turn_idx"], pa.int32()),
            "role": out["role"],
            "text": out["text"],
            "tool": out["tool"],
            "ts_ms": pc.cast(out["ts"], pa.int64()),
        })
    finally:
        eng.shutdown()


def _q_cdc_salted(sf_dir: str):
    """Skew handling through the real engine, driver-checked: the 4
    hottest conversations (by event count) are salted over 3
    sub-partitions each — (conv_id, turn_idx) keys keep single-owner
    LWW semantics, but a hot conversation's turns spread across
    partitions. Final state must equal the unsalted LWW oracle."""
    import tempfile

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine
    from datavec_ray.util import dataset_to_table

    ds = _read(sf_dir, "events")
    binlog = dataset_to_table(
        ds.map_batches(binlog_from_events, batch_format="pyarrow"))
    counts = binlog.group_by("conv_id").aggregate([([], "count_all")]) \
        .sort_by([("count_all", "descending"), ("conv_id", "ascending")])
    hot = counts["conv_id"].to_pylist()[:4]
    lake = tempfile.mkdtemp(prefix="salted_lake")
    eng = CdcIngestEngine(lake, num_partitions=8, salt_turns=3,
                          hot_convs=hot)
    try:
        eng.ingest(binlog)
        eng.commit()
        out = eng.read_lake()
        return pa.table({
            "conv_id": out["conv_id"],
            "turn_idx": pc.cast(out["turn_idx"], pa.int32()),
            "role": out["role"],
            "text": out["text"],
            "tool": out["tool"],
            "ts_ms": pc.cast(out["ts"], pa.int64()),
        })
    finally:
        eng.shutdown()


def _q_cdc_dlq(sf_dir: str):
    """Dead-letter quarantine, driver-checked: every 97th event is
    deterministically malformed (conv_id nulled); the engine splits
    those to the DLQ vectorized and applies only the valid stream.
    Final state must equal the LWW oracle over lsn % 97 <> 0 events."""
    import tempfile

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine
    from datavec_ray.util import dataset_to_table

    ds = _read(sf_dir, "events")
    binlog = dataset_to_table(
        ds.map_batches(binlog_from_events, batch_format="pyarrow"))
    mod = pc.subtract(binlog["lsn"],
                      pc.multiply(pc.divide(binlog["lsn"], 97),
                                  pa.scalar(97, pa.int64())))
    is_bad = pc.equal(mod, pa.scalar(0, pa.int64()))
    conv = pc.if_else(is_bad, pa.scalar(None, pa.string()),
                      binlog["conv_id"])
    i = binlog.schema.get_field_index("conv_id")
    corrupted = binlog.set_column(i, pa.field("conv_id", pa.string()),
                                  conv)
    lake = tempfile.mkdtemp(prefix="dlq_lake")
    eng = CdcIngestEngine(lake, num_partitions=8, dlq=True)
    try:
        eng.ingest(corrupted)
        eng.commit()
        out = eng.read_lake()
        return pa.table({
            "conv_id": out["conv_id"],
            "turn_idx": pc.cast(out["turn_idx"], pa.int32()),
            "role": out["role"],
            "text": out["text"],
            "tool": out["tool"],
            "ts_ms": pc.cast(out["ts"], pa.int64()),
        })
    finally:
        eng.shutdown()


def _q_cdc_expectations(sf_dir: str):
    """Ingest-time expectations (Delta-Live-Tables "expect or
    quarantine"): declarative row-level rules — turn_idx <= 12, role in
    the transcript enum — evaluated vectorized in the same DLQ split as
    structural validation; failing events never reach LWW state. Final
    lake must equal the SQL LWW over only the passing events."""
    import tempfile

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "props"])
    binlog = ds.map_batches(binlog_from_events, batch_format="pyarrow")
    lake = tempfile.mkdtemp(prefix="expect_lake")
    eng = CdcIngestEngine(
        lake, num_partitions=8,
        expectations=[
            {"column": "turn_idx", "check": "max_le", "value": 12},
            {"column": "role", "check": "in_set",
             "value": ["user", "assistant"]},
        ])
    try:
        eng.replay(binlog, checkpoint_name="v1")
        out = eng.read_lake()
        return pa.table({
            "conv_id": out["conv_id"],
            "turn_idx": pc.cast(out["turn_idx"], pa.int32()),
            "role": out["role"],
            "text": out["text"],
            "tool": out["tool"],
            "ts_ms": pc.cast(out["ts"], pa.int64()),
        })
    finally:
        eng.shutdown()


def _q_scd2_history(sf_dir: str):
    """SCD Type-2 change history of the binlog: every I/U event as a
    version row with [valid_from, valid_to) LSN range (D closes the
    last version). One key shuffle + shifted next-LSN scan."""
    from datavec_ray.cdc.binlog import binlog_from_events, scd2_history

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "props"]) \
        .map_batches(binlog_from_events, batch_format="pyarrow")

    def to_ms(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("ts")
        return b.set_column(i, pa.field("ts_ms", pa.int64()),
                            b["ts"].cast(pa.int64()))

    return scd2_history(ds.map_batches(to_ms, batch_format="pyarrow"))


def _q_fuzzy_dedup(sf_dir: str):
    """Fuzzy duplicate-cluster resolution: lev<=1 customer-name pairs
    as edges → distributed connected components → every customer
    labeled with its cluster representative (min id). Oracle =
    recursive-CTE transitive closure over the levenshtein join."""
    from datavec_ray.ops.fuzzy import fuzzy_dup_pairs
    from datavec_ray.ops.graph import assign_components, connected_components

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    edges = fuzzy_dup_pairs(ds, text_col="c_name", id_col="c_custkey",
                            max_edits=1)
    labels = connected_components(edges, "id_a", "id_b")
    return assign_components(
        _read(sf_dir, "customer", ["c_custkey", "c_name"]), labels,
        "c_custkey")


def _q_patch_upsert(sf_dir: str):
    """Debezium-style partial-update replay: updates are deterministic
    sparse PATCHES (text dropped when lsn%3=0, tool when lsn%5=0 —
    mirrored in the oracle CTE); each payload column takes its last
    non-null value after the key's last delete. One key shuffle +
    ffill-donor kernels (cdc.binlog.patch_upsert)."""
    from datavec_ray.cdc.binlog import binlog_from_events, patch_upsert

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "props"]) \
        .map_batches(binlog_from_events, batch_format="pyarrow")

    def sparsify(b: pa.Table) -> pa.Table:
        lsn = b["lsn"]
        m3 = pc.equal(pc.subtract(lsn, pc.multiply(pc.divide(lsn, 3),
                                                   pa.scalar(3, pa.int64()))),
                      pa.scalar(0, pa.int64()))
        m5 = pc.equal(pc.subtract(lsn, pc.multiply(pc.divide(lsn, 5),
                                                   pa.scalar(5, pa.int64()))),
                      pa.scalar(0, pa.int64()))
        is_u = pc.equal(b["op"], "U")
        text = pc.if_else(pc.and_(is_u, m3),
                          pa.scalar(None, pa.string()), b["text"])
        tool = pc.if_else(pc.and_(is_u, m5),
                          pa.scalar(None, pa.string()), b["tool"])
        b = b.set_column(b.schema.get_field_index("text"),
                         pa.field("text", pa.string()), text)
        return b.set_column(b.schema.get_field_index("tool"),
                            pa.field("tool", pa.string()), tool)

    out = patch_upsert(ds.map_batches(sparsify, batch_format="pyarrow"))

    def to_ms(b: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": b["conv_id"],
            "turn_idx": b["turn_idx"],
            "role": b["role"],
            "text": b["text"],
            "tool": b["tool"],
            "ts_ms": pc.cast(b["ts"], pa.int64()),
            "lsn": b["lsn"],
        })

    return out.map_batches(to_ms, batch_format="pyarrow")


def _q_cdc_topn_view(sf_dir: str):
    """Incrementally-maintained per-conversation leaderboard (the 2
    most recent live turns of every conversation): build from snapshot
    v1, ADVANCE with the v1→v2 retract feed — only conversations named
    in the delta are recomputed. Oracle = QUALIFY row_number() over the
    from-scratch LWW state, so the splice is value-checked end to end."""
    import tempfile

    from datavec_ray.cdc.aggview import TopNView
    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine

    ds = _read(sf_dir, "events").materialize()
    cut = int(ds.max("event_id")) // 2
    binlog = ds.map_batches(binlog_from_events, batch_format="pyarrow")
    lake = tempfile.mkdtemp(prefix="topnview_lake")
    eng = CdcIngestEngine(lake, num_partitions=8)
    try:
        eng.replay(binlog.filter(expr=f"lsn <= {cut}"),
                   checkpoint_name="v1")
        eng.replay(binlog.filter(expr=f"lsn > {cut}"),
                   checkpoint_name="v2")
        tt = eng.time_travel()
        view = TopNView(keys=["conv_id"], order_col="turn_idx", n=2,
                        descending=True)
        state = view.build(tt.read_state_at("v1"))
        state = view.advance(state, tt.retract_feed("v1", "v2"),
                             tt.read_state_at("v2"))
        return pa.table({
            "conv_id": state["conv_id"],
            "turn_idx": state["turn_idx"],
            "role": state["role"],
            "text": state["text"],
            "tool": state["tool"],
            "ts_ms": pc.cast(state["ts"], pa.int64()),
        })
    finally:
        eng.shutdown()


def _q_cdc_joinview(sf_dir: str):
    """Incrementally-maintained materialized JOIN view over the CDC
    lake: pair every live USER turn with the live ASSISTANT turn that
    answers it (join key (conv_id, pair=turn_idx//2)). Build the view
    from snapshot v1's sides, then ADVANCE it with the v1→v2 retract
    feed — only join keys named in the delta are recomputed from the
    v2 snapshot (broadcast affected-key filter map-side); every other
    view row is carried forward. The oracle joins the two sides of the
    from-scratch LWW state, so the incremental splice is value-checked
    end to end."""
    import tempfile

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine
    from datavec_ray.cdc.joinview import JoinView

    def _side(parity: int, text_name: str, ts_name: str):
        def fn(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            turn = t["turn_idx"].cast(pa.int64())
            keep = pc.equal(pc.bit_wise_and(turn, 1), parity)
            s = t.filter(keep)
            turn_s = s["turn_idx"].cast(pa.int64())
            return pa.table({
                "conv_id": s["conv_id"],
                "pair": pc.shift_right(turn_s, 1),
                text_name: s["text"],
                ts_name: s["ts"].cast(pa.int64()),
            })
        fn.__name__ = f"joinview_side_p{parity}"
        return fn

    def _feed_keys(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return pa.table({
            "conv_id": t["conv_id"],
            "pair": pc.shift_right(t["turn_idx"].cast(pa.int64()), 1)})

    # pin the scan once: .max() is a full pass and the binlog map is
    # another; without the pin each re-reads parquet
    ds = _read(sf_dir, "events").materialize()
    cut = int(ds.max("event_id")) // 2
    binlog = ds.map_batches(binlog_from_events, batch_format="pyarrow")
    lake = tempfile.mkdtemp(prefix="joinview_lake")
    eng = CdcIngestEngine(lake, num_partitions=8)
    try:
        eng.replay(binlog.filter(expr=f"lsn <= {cut}"),
                   checkpoint_name="v1")
        eng.replay(binlog.filter(expr=f"lsn > {cut}"),
                   checkpoint_name="v2")
        tt = eng.time_travel()
        jv = JoinView(on=["conv_id", "pair"], how="inner")
        left = _side(0, "q_text", "q_ts_ms")
        right = _side(1, "a_text", "a_ts_ms")
        v1 = tt.read_state_at("v1")
        view = jv.build(
            v1.map_batches(left, batch_format="pyarrow"),
            tt.read_state_at("v1").map_batches(right,
                                               batch_format="pyarrow"))
        feed = tt.retract_feed("v1", "v2").map_batches(
            _feed_keys, batch_format="pyarrow")
        v2l = tt.read_state_at("v2").map_batches(left,
                                                 batch_format="pyarrow")
        v2r = tt.read_state_at("v2").map_batches(right,
                                                 batch_format="pyarrow")
        return jv.advance(view, [feed], v2l, v2r)
    finally:
        eng.shutdown()


def _q_preference_pairs(sf_dir: str):
    """Preference-pair mining from the transcript edit history: every
    (conv, turn) with >= 2 live versions pairs its first draft
    (rejected) with its final LWW winner (chosen) — DPO-style training
    pairs straight from the change stream. Map-side tombstone prune +
    one key-hash exchange + run-boundary first/last gather."""
    from datavec_ray.cdc.binlog import binlog_from_events, preference_pairs

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "props"])
    binlog = ds.map_batches(binlog_from_events, batch_format="pyarrow")
    return preference_pairs(binlog)


def _q_conv_dedup(sf_dir: str):
    """Conversation-level exact dedup: the binlog's INSERT turns plus a
    re-keyed duplicate copy of every conversation (id || '~dup') are
    fingerprinted per conversation (ordered md5 over role/text turns)
    and deduplicated to the min-id conversation per fingerprint — the
    duplicates must all collapse away. One key exchange to assemble
    fingerprints (vectorized turn concat, one md5 per conversation),
    one tiny fingerprint exchange to resolve."""
    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.ops.dedup import conversation_dedup

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "props"]) \
        .map_batches(binlog_from_events, batch_format="pyarrow")

    def turns_with_dups(b: pa.Table) -> pa.Table:
        ins = b.filter(pc.equal(b["op"], "I")) \
               .select(["conv_id", "turn_idx", "lsn", "role", "text"])
        dup = ins.set_column(
            0, "conv_id",
            pc.binary_join_element_wise(ins["conv_id"], "~dup", ""))
        return pa.concat_tables([ins, dup])

    turns = ds.map_batches(turns_with_dups, batch_format="pyarrow")
    return conversation_dedup(turns, key="conv_id",
                              order_cols=("turn_idx", "lsn"))


def _q_cdc_delta_lake(sf_dir: str):
    """LSM merge-on-read commit mode end to end: three replays into a
    delta-mode lake (base + per-commit delta segments, write volume
    proportional to each commit's CHANGED winners, not the state),
    compact() folds the segments, and the merged read must equal the
    same from-scratch LWW state the rewrite-mode lake produces —
    oracle identical to cdc_upsert."""
    import tempfile

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "props"]).materialize()
    hi = int(ds.max("event_id"))
    c1, c2 = hi // 3, 2 * hi // 3
    binlog = ds.map_batches(binlog_from_events, batch_format="pyarrow")
    lake = tempfile.mkdtemp(prefix="delta_lake")
    eng = CdcIngestEngine(lake, num_partitions=8, commit_mode="delta")
    try:
        eng.replay(binlog.filter(expr=f"lsn <= {c1}"),
                   checkpoint_name="v1")
        eng.replay(binlog.filter(expr=f"lsn > {c1} and lsn <= {c2}"),
                   checkpoint_name="v2")
        eng.compact()       # mid-stream compaction must be transparent
        eng.replay(binlog.filter(expr=f"lsn > {c2}"),
                   checkpoint_name="v3")
        state = eng.read_lake_dataset()

        def ts_to_ms(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index("ts")
            return t.set_column(i, pa.field("ts_ms", pa.int64()),
                                t["ts"].cast(pa.int64())).rename_columns(
                [c if c != "ts" else "ts_ms" for c in t.column_names])

        from datavec_ray.util import dataset_to_table
        return dataset_to_table(
            state.map_batches(ts_to_ms, batch_format="pyarrow"))
    finally:
        eng.shutdown()


def _q_cdc_zonemap(sf_dir: str):
    """OPTIMIZE + zonemap data skipping end to end: replay the binlog,
    re-cluster every partition by ts with small row groups
    (``optimize``), then answer a ts-range scan through
    ``scan_where`` — footer-stats sidecar picks candidate files/row
    groups on the driver, the exact predicate filters every row read.
    The bounds are integer-ms quartiles of the event stream, mirrored
    term for term in SQL; the result must equal the LWW state WHERE
    ts BETWEEN bounds regardless of how much was skipped."""
    import tempfile

    import pandas as pd

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "props"])
    binlog = ds.map_batches(binlog_from_events,
                            batch_format="pyarrow").materialize()
    mn = int(pd.Timestamp(binlog.min("ts")).value // 1_000_000)
    mx = int(pd.Timestamp(binlog.max("ts")).value // 1_000_000)
    lo, hi = mn + (mx - mn) // 4, mn + (mx - mn) // 2
    lake = tempfile.mkdtemp(prefix="zonemap_lake")
    eng = CdcIngestEngine(lake, num_partitions=8)
    try:
        eng.replay(binlog, checkpoint_name="v1")
        eng.optimize(cluster_by=["ts"], row_group_rows=2048)
        hits = eng.scan_where(
            [("ts", "between", (pd.Timestamp(lo, unit="ms"),
                                pd.Timestamp(hi, unit="ms")))])

        def ts_to_ms(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index("ts")
            return t.set_column(i, pa.field("ts_ms", pa.int64()),
                                t["ts"].cast(pa.int64())).rename_columns(
                [c if c != "ts" else "ts_ms" for c in t.column_names])

        from datavec_ray.util import dataset_to_table
        return dataset_to_table(
            hits.map_batches(ts_to_ms, batch_format="pyarrow"))
    finally:
        eng.shutdown()


def _q_cdc_changefeed(sf_dir: str):
    """Row-level CHANGE FEED between two lake snapshots (Delta CDF /
    Iceberg changelog semantics): ingest half the binlog (v1), the
    rest (v2), then emit v1→v2 deltas — insert/update/delete per key,
    new image + winning LSN — with NO shuffle (snapshot partitions
    align). The oracle recomputes both LWW states in SQL and joins
    them, so the positional partition diff is value-checked end to
    end."""
    import tempfile

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "props"]).materialize()
    cut = int(ds.max("event_id")) // 2
    binlog = ds.map_batches(binlog_from_events, batch_format="pyarrow")
    lake = tempfile.mkdtemp(prefix="changefeed_lake")
    eng = CdcIngestEngine(lake, num_partitions=8)
    try:
        eng.replay(binlog.filter(expr=f"lsn <= {cut}"),
                   checkpoint_name="v1")
        eng.replay(binlog.filter(expr=f"lsn > {cut}"),
                   checkpoint_name="v2")
        feed = eng.time_travel().change_feed("v1", "v2")

        def ts_to_ms(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index("ts")
            return t.set_column(i, pa.field("ts_ms", pa.int64()),
                                t["ts"].cast(pa.int64())).rename_columns(
                [c if c != "ts" else "ts_ms" for c in t.column_names])

        from datavec_ray.util import dataset_to_table
        return dataset_to_table(
            feed.map_batches(ts_to_ms, batch_format="pyarrow"))
    finally:
        eng.shutdown()


def _q_cdc_timetravel(sf_dir: str):
    """AS-OF read through the real lake: ingest v1 then v2, then read
    the state AS OF the v1 watermark LSN — resolved from the manifest,
    served from the v1 segment (hardlinked payloads), never touching
    v2 files. Oracle = LWW over only the events at or below the
    watermark."""
    import tempfile

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "props"]).materialize()
    cut = int(ds.max("event_id")) // 2
    binlog = ds.map_batches(binlog_from_events, batch_format="pyarrow")
    lake = tempfile.mkdtemp(prefix="timetravel_lake")
    eng = CdcIngestEngine(lake, num_partitions=8)
    try:
        eng.replay(binlog.filter(expr=f"lsn <= {cut}"),
                   checkpoint_name="v1")
        eng.replay(binlog.filter(expr=f"lsn > {cut}"),
                   checkpoint_name="v2")
        asof = eng.time_travel().read_state_as_of(cut)

        def ts_to_ms(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index("ts")
            return t.set_column(i, pa.field("ts_ms", pa.int64()),
                                t["ts"].cast(pa.int64())).rename_columns(
                [c if c != "ts" else "ts_ms" for c in t.column_names])

        from datavec_ray.util import dataset_to_table
        return dataset_to_table(
            asof.map_batches(ts_to_ms, batch_format="pyarrow"))
    finally:
        eng.shutdown()


def _q_edit_pairs(sf_dir: str):
    """Edit-history mining over the transcript change stream: adjacent
    (previous → current) version pairs of every (conv, turn) in LWW
    order — the raw material for revision/preference training pairs.
    One key-hash exchange after a map-side tombstone/column prune."""
    from datavec_ray.cdc.binlog import binlog_from_events, edit_pairs

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "props"])
    binlog = ds.map_batches(binlog_from_events, batch_format="pyarrow")
    return edit_pairs(binlog)


def _q_tree_paths(sf_dir: str):
    """Message-TREE linearization (OpenAssistant-style branched
    transcripts): every root→leaf branch becomes one path row, via
    parallel pointer doubling — ceil(log2 depth) co-partition
    exchanges, no driver-held parent map. The tree is synthesized
    deterministically from events (node v's parent = 1 +
    ((v*48271+11) mod (v-1)), a random recursive tree rooted at 1),
    mirrored in a recursive CTE."""
    from datavec_ray.ops.graph import tree_paths

    def synth(b: pa.Table) -> pa.Table:
        vn = b["event_id"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) + 1
        par = 1 + (vn * 48271 + 11) % np.maximum(vn - 1, 1)
        return pa.table({
            "id": pa.array(vn),
            "parent": pa.array(par, pa.int64(), mask=(vn == 1))})

    ds = _read(sf_dir, "events", ["event_id"])
    return tree_paths(ds.map_batches(synth, batch_format="pyarrow"))


def _binlog_with_skewed_ts(sf_dir: str):
    """Derived binlog + a deterministically OUT-OF-ORDER event-time
    column (``ts_skew_ms = ts_ms - (lsn % 16) * 600s``): arrival order
    (lsn) stays monotone while event time arrives late, which is the
    real shape a watermark exists to reconcile. Pure vectorized map,
    mirrored term-for-term in the oracle CTE."""
    from datavec_ray.cdc.binlog import binlog_from_events

    ds = _read(sf_dir, "events")

    def prep(b: pa.Table) -> pa.Table:
        bl = binlog_from_events(b)
        ts_ms = bl["ts"].cast(pa.int64())
        off = pc.multiply(pc.bit_wise_and(bl["lsn"], 15),
                          pa.scalar(600_000, pa.int64()))
        return bl.append_column("ts_skew_ms", pc.subtract(ts_ms, off))

    return ds.map_batches(prep, batch_format="pyarrow")


def _q_late_events(sf_dir: str):
    """Event-time watermark assignment over an out-of-order binlog:
    wm_ms = (running max of event time over arrival order, exclusive)
    - delay; is_late = own event time below the watermark in effect on
    arrival. Two metadata-only passes, zero shuffles on lsn-contiguous
    input (``cdc/watermark.py``)."""
    from datavec_ray.cdc.watermark import assign_watermarks

    out = assign_watermarks(_binlog_with_skewed_ts(sf_dir),
                            delay_ms=1_800_000, ts_col="ts_skew_ms")
    return out.select_columns(["lsn", "wm_ms", "is_late"])


def _q_windowed_stream(sf_dir: str):
    """Emit-on-watermark tumbling windows (1 h) with 10 min allowed
    lateness: an event is dropped iff its window had already fired when
    it arrived; survivors aggregate per (window, role). Watermark pass
    + per-block (window,key) combine + ONE tiny partial groupby — raw
    events never shuffle."""
    from datavec_ray.cdc.watermark import windowed_stream

    win, _dropped = windowed_stream(
        _binlog_with_skewed_ts(sf_dir), window_ms=3_600_000,
        delay_ms=1_800_000, allowed_lateness_ms=600_000,
        keys=["role"], ts_col="ts_skew_ms", value_col="turn_idx")
    return win


def _q_windowed_distinct(sf_dir: str):
    """Watermark-gated windowed exact distinct: active conversations
    per (1 h window, role) with 10 min allowed lateness. Per-block
    distinct-triple combiner — raw events never shuffle."""
    from datavec_ray.cdc.watermark import windowed_distinct

    win, _dropped = windowed_distinct(
        _binlog_with_skewed_ts(sf_dir), window_ms=3_600_000,
        delay_ms=1_800_000, allowed_lateness_ms=600_000,
        keys=["role"], ts_col="ts_skew_ms", value_col="conv_id")
    return win


def _q_stream_join(sf_dir: str):
    """Watermark-gated stream-stream interval join: user turns join
    assistant turns of the same conversation within ±2 h event
    time, both sides gated at arrival (30 min delay, 5 min allowed
    lateness). One metadata-only watermark pass + one hash-bucket
    co-partition (range_join)."""
    from datavec_ray.cdc.watermark import stream_join

    ds = _binlog_with_skewed_ts(sf_dir)

    def proj(b: pa.Table) -> pa.Table:
        return b.select(["lsn", "conv_id", "role", "ts_skew_ms"])

    joined, _dropped = stream_join(
        ds.map_batches(proj, batch_format="pyarrow"),
        side_col="role", left_value="user", right_value="assistant",
        band_ms=7_200_000, delay_ms=1_800_000,
        allowed_lateness_ms=300_000, keys=["conv_id"],
        ts_col="ts_skew_ms", order_col="lsn")

    def out(b: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": b["conv_id"],
            "l_lsn": b["lsn"],
            "r_lsn": b["lsn_r"],
            "l_ts": b["__ts_ms"],
            "r_ts": b["__ts_ms_r"],
        })

    return joined.map_batches(out, batch_format="pyarrow")


def _q_hopping_stream(sf_dir: str):
    """Emit-on-watermark HOPPING windows (2 h wide, 1 h slide, 10 min
    allowed lateness) — each event lands in W/S overlapping windows;
    the fan-out exists only inside the per-block combiner, already
    pre-aggregated before the one tiny partial exchange."""
    from datavec_ray.cdc.watermark import windowed_stream

    win, _dropped = windowed_stream(
        _binlog_with_skewed_ts(sf_dir), window_ms=7_200_000,
        delay_ms=1_800_000, allowed_lateness_ms=600_000,
        keys=["role"], ts_col="ts_skew_ms", value_col="turn_idx",
        slide_ms=3_600_000)
    return win


def _q_session_stream(sf_dir: str):
    """Watermark-gated SESSION windows: events too old to extend any
    open session (ts <= wm - lateness on arrival) drop to the side
    output; survivors sessionize per conversation on 30 min event-time
    gaps."""
    from datavec_ray.cdc.watermark import session_stream

    sessions, _dropped = session_stream(
        _binlog_with_skewed_ts(sf_dir), gap_ms=1_800_000,
        delay_ms=1_800_000, allowed_lateness_ms=600_000,
        keys=["conv_id"], ts_col="ts_skew_ms")
    return sessions.select_columns(["lsn", "conv_id", "session_id"])


def _q_txn_upsert(sf_dir: str):
    """Transactional CDC visibility: group the derived binlog into
    transactions (lsn // 8); a txn is committed iff it contains a
    'signup' row (payload-based commit marker). Only committed txns'
    events reach the LWW upsert — atomic visibility
    (``cdc/txn.py``). Final state as epoch-ms, mirroring cdc_upsert."""
    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import lww_compact_dataset
    from datavec_ray.cdc.txn import txn_split

    ds = _read(sf_dir, "events")

    def prep(b: pa.Table) -> pa.Table:
        bl = binlog_from_events(b)
        txn = pc.divide(bl["lsn"], 8)
        return bl.append_column("txn_id", pc.cast(txn, pa.int64()))

    binlog = ds.map_batches(prep, batch_format="pyarrow")
    apply_ds, _pending, _n = txn_split(
        binlog, txn_col="txn_id", op_col="tool", commit_op="signup",
        drop_markers=False)
    final = lww_compact_dataset(apply_ds.drop_columns(["txn_id"]),
                                num_partitions=16)

    def ts_to_ms(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("ts")
        return t.set_column(i, pa.field("ts_ms", pa.int64()),
                            t["ts"].cast(pa.int64())).rename_columns(
            [c if c != "ts" else "ts_ms" for c in t.column_names])

    return final.map_batches(ts_to_ms, batch_format="pyarrow")


def _q_cdc_multitable(sf_dir: str):
    """Cross-table transactional atomicity THROUGH THE ENGINE API:
    one transactional binlog whose events route to TWO lake tables
    (A = even turn_idx, B = odd) replays via
    ``CdcIngestEngine.replay_tables`` — per-table engines + manifests,
    ONE shared committed-txn gate over the union of both streams, WAP
    staged writes and a coordinator journal (crash between tables →
    neither visible; tested in test_multitable.py). Output = union of
    both final lake states tagged with ``tbl`` — the multi-table
    consistency contract of a transactional CDC source (MySQL XID /
    Postgres commit records)."""
    import tempfile

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine

    ds = _read(sf_dir, "events")

    def prep(b: pa.Table) -> pa.Table:
        bl = binlog_from_events(b)
        txn = pc.divide(bl["lsn"], 8)
        return bl.append_column("txn_id", pc.cast(txn, pa.int64()))

    binlog = ds.map_batches(prep, batch_format="pyarrow")

    def pick(side: int):
        def f(t: pa.Table, _s=side) -> pa.Table:
            par = pc.bit_wise_and(t["turn_idx"], pa.scalar(1, pa.int32()))
            return t.filter(pc.equal(par, pa.scalar(_s, pa.int32())))
        f.__name__ = f"route_tbl_{side}"
        return f

    base = tempfile.mkdtemp(prefix="dv_multitable_")
    import atexit
    import shutil
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    out = CdcIngestEngine.replay_tables(
        base, {"A": binlog.map_batches(pick(0), batch_format="pyarrow"),
               "B": binlog.map_batches(pick(1), batch_format="pyarrow")},
        txn_col="txn_id", op_col="tool", commit_op="signup",
        drop_markers=False, num_partitions=8)

    def _table(name: str):
        eng = out["engines"][name]
        final = eng.read_lake_dataset(
            columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])

        def tag(t: pa.Table, _n=name) -> pa.Table:
            i = t.schema.get_field_index("ts")
            t = t.set_column(i, pa.field("ts_ms", pa.int64()),
                             t["ts"].cast(pa.int64())).rename_columns(
                [c if c != "ts" else "ts_ms" for c in t.column_names])
            return t.append_column("tbl", pa.array([_n] * len(t)))

        return final.map_batches(tag, batch_format="pyarrow")

    return _table("A").union(_table("B"))


def _q_regex_extract(sf_dir: str):
    """Named-capture-group regex extraction to new columns (RegexExtract
    step, Arrow extract_regex kernel — one vectorized pass)."""
    from datavec_ray import TransformPipeline
    from datavec_ray.steps import KeepColumns, RegexExtract

    ds = _read(sf_dir, "events", ["event_id", "props"])
    p = TransformPipeline(_schema_of(sf_dir, "events").select(
        ["event_id", "props"]))
    p.add(RegexExtract("props", r'"k":\s*(?P<kval>\d+)'))
    p.add(KeepColumns(["event_id", "kval"]))
    return p.execute(ds)


_SYNTH_DOC_COLS = ["doc_id", "text", "lang", "source"]


def _q_html_extract(sf_dir: str):
    """Web-curation front half: deterministic HTML pages synthesized
    from documents (pure column concatenation, mirrored term-for-term
    in the oracle), parsed back by the HtmlTextExtract actor stage —
    title, visible body text (script/style stripped), link count."""
    from datavec_ray.ops.web import HtmlTextExtract, synth_html

    ds = _read(sf_dir, "documents", _SYNTH_DOC_COLS)
    out = ds.map_batches(synth_html, batch_format="pyarrow") \
            .map_batches(HtmlTextExtract("html"), batch_format="pyarrow")

    def shape(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "title": b["title"],
            "body_text": b["body_text"],
            "n_links": b["links"].combine_chunks().value_lengths().cast(
                pa.int64()),
        })

    return out.map_batches(shape, batch_format="pyarrow")


def _q_url_extract(sf_dir: str):
    """URL extraction + normalization + per-domain stats over the
    synthesized pages: vectorized extract_all → host → per-batch
    combine → one tiny grouped reduce (crawl domain-mix report)."""
    from datavec_ray.ops.web import synth_html, url_domain_stats

    ds = _read(sf_dir, "documents", _SYNTH_DOC_COLS)
    pages = ds.map_batches(synth_html, batch_format="pyarrow")
    return url_domain_stats(pages, "html")


def _q_blocklist_tag(sf_dir: str):
    """Word-boundary keyword-blocklist tagging (FlashText-style multi
    keyword scan as ONE RE2 alternation pass per batch)."""
    from datavec_ray.ops.web import blocklist_tag

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tag(b: pa.Table) -> pa.Table:
        n, flag = blocklist_tag(b["text"], ["spark", "slow", "dup", "big"])
        return pa.table({"doc_id": b["doc_id"], "n_hits": n,
                         "flagged": flag})

    return ds.map_batches(tag, batch_format="pyarrow")


def _q_warc_source(sf_dir: str):
    """WARC lake interchange: synthesized pages written once to
    .warc.gz shards under /tmp (gzip member per record, tmp+rename,
    keyed by source mtime), read back via sources.read_warc, and
    aggregated per host — page count plus exact payload byte sum, so
    the round trip is verified byte-for-byte in aggregate."""
    import shutil

    from datavec_ray.ops.web import synth_html, url_host
    from datavec_ray.reduce import Reducer
    from datavec_ray.sources import read_warc, write_warc

    src = os.path.join(sf_dir, "documents.parquet")
    mtime = int(os.path.getmtime(src))
    lake = os.path.join("/tmp", "datavec_ray_warc_"
                        + os.path.basename(sf_dir.rstrip("/")) + f"_{mtime}")
    if not os.path.isdir(lake):
        tmp = lake + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)

        def to_records(b: pa.Table) -> pa.Table:
            b = synth_html(b)
            url = pc.binary_join_element_wise(
                "https://", b["source"].combine_chunks(),
                ".example.com/page/",
                pc.cast(b["doc_id"], pa.string()), "")
            return pa.table({"url": url, "payload": b["html"]})

        write_warc(_read(sf_dir, "documents", _SYNTH_DOC_COLS)
                   .map_batches(to_records, batch_format="pyarrow"), tmp)
        try:
            os.rename(tmp, lake)
        except OSError:                  # lost a concurrent-build race
            shutil.rmtree(tmp, ignore_errors=True)

    ds = read_warc([os.path.join(lake, f) for f in sorted(os.listdir(lake))])

    def per_page(b: pa.Table) -> pa.Table:
        return pa.table({
            "host": url_host(b["url"]),
            "bytes": pc.cast(pc.binary_length(
                b["payload"].combine_chunks()), pa.int64()),
        })

    return Reducer(["host"], [["bytes", "Count", "n_pages"],
                              ["bytes", "Sum", "sum_bytes"]]) \
        .apply_dataset(ds.map_batches(per_page, batch_format="pyarrow"))


def _q_render_transcripts(sf_dir: str):
    """SFT-style conversation rendering: the binlog's INSERT turns are
    assembled into one training text per conversation ('role: text'
    joined by newlines in (turn_idx, lsn) order). One key shuffle, one
    sort + Arrow concat + polars Rust group-join per partition. Oracle
    = string_agg(... ORDER BY turn_idx, lsn) over the same CTE."""
    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.misc import render_conversations

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "props"]) \
        .map_batches(binlog_from_events, batch_format="pyarrow")

    def inserts(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["op"], "I")) \
                .select(["conv_id", "turn_idx", "lsn", "role", "text"])

    turns = ds.map_batches(inserts, batch_format="pyarrow")
    return render_conversations(turns, key="conv_id",
                                order_cols=["turn_idx", "lsn"])


def _q_merge_intervals(sf_dir: str):
    """Gaps-and-islands interval coalescing: per supplier, merge
    overlapping/touching [ship_day, ship_day + qty] spans into islands
    (min start, max end, interval count). One key-hash exchange + a
    rank-space segment-biased vectorized island scan per partition —
    mirrored in SQL by the classic max-over-preceding-rows window."""
    from datavec_ray.misc import merge_intervals

    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_shipdate",
                                    "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.divide(t["l_shipdate"].cast(pa.int64()),
                        86_400_000_000)
        return pa.table({
            "suppkey": t["l_suppkey"],
            "s_day": day,
            "e_day": pc.add(day, t["l_quantity"].cast(pa.int64())),
        })

    iv = ds.map_batches(prep, batch_format="pyarrow")
    return merge_intervals(iv, ["suppkey"], "s_day", "e_day", min_gap=0)


def _q_ffill_tool(sf_dir: str):
    """LOCF gap repair over the binlog: D tombstones carry null
    role/tool; forward-fill both per conversation in lsn order so every
    change event shows the last known attribution. One key shuffle +
    per-partition maximum.accumulate donor scan (misc.ffill_group).
    Oracle = last_value(x IGNORE NULLS) running window."""
    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.misc import ffill_group

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "props"]) \
        .map_batches(binlog_from_events, batch_format="pyarrow")

    def proj(b: pa.Table) -> pa.Table:
        return b.select(["conv_id", "lsn", "op", "role", "tool"])

    return ffill_group(ds.map_batches(proj, batch_format="pyarrow"),
                       keys=["conv_id"], order_col="lsn",
                       value_cols=["role", "tool"])


def _q_negative_samples(sf_dir: str):
    """Contrastive-training negative sampling: 4 deterministic
    splitmix-drawn non-self ids per embedding anchor — shuffle-free,
    reproducible across engines (splitmix64 mirrored in SQL)."""
    from datavec_ray.misc import negative_samples

    ds = _read(sf_dir, "embeddings", ["vec_id"])
    n = 1 + int(ds.max("vec_id"))
    return negative_samples(ds, "vec_id", n_items=n, k=4)


def _q_embedding_cov(sf_dir: str):
    """Streaming covariance of the embedding column (first 8 dims as
    tidy entries) — ONE pass, (1+d+d²)-float partials merged by
    addition; the oracle-checkable face of the PCA moment pass."""
    from datavec_ray.ops.similarity import embedding_cov
    ds = _read(sf_dir, "embeddings", ["embedding"])
    return embedding_cov(ds, dims=8)


def _q_embedding_pca(sf_dir: str):
    """PCA projection of the embeddings to 4 components: one streaming
    moment pass (driver-side d×d eigh, deterministic sign convention)
    + one broadcast projection map. Rows-only by design (LAPACK
    eigenvectors have no SQL counterpart); the moment pass itself is
    oracle-checked as embedding_cov and the kernel parity-tested vs
    whole-matrix numpy PCA."""
    from datavec_ray.ops.similarity import pca_fit, pca_transform
    from datavec_ray.util import dataset_to_table

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    model = pca_fit(ds, k=4)
    out = dataset_to_table(pca_transform(ds, model))
    proj = np.stack(out["pca"].to_numpy(zero_copy_only=False))
    return pa.table({
        "vec_id": out["vec_id"],
        **{f"p{i}": pa.array(proj[:, i], pa.float64()) for i in range(4)},
    })


def _q_expectations(sf_dir: str):
    """Declarative data-validation suite over lineitem in ONE
    aggregate pass (+ one exchange for the uniqueness rule): per-rule
    violation counts and pass/fail — the ingest gate a 100 TB pipeline
    runs before committing a batch (datavec_ray/expect.py)."""
    from datavec_ray.expect import expect

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_quantity", "l_returnflag",
                "l_discount", "l_linestatus"])
    return expect(ds, [
        {"column": "l_orderkey", "check": "not_null"},
        {"column": "l_quantity", "check": "between", "lo": 1, "hi": 50},
        {"column": "l_returnflag", "check": "in_set",
         "value": ["A", "N", "R"]},
        {"column": "l_discount", "check": "max_le", "value": 0.08},
        {"column": "l_linestatus", "check": "null_fraction_le", "value": 0.5},
        {"column": "l_orderkey", "check": "unique"},
    ])


def _q_key_skew(sf_dir: str):
    """Partition-skew report on the CDC routing key: top-20 hottest
    conv_ids with count / share / cumulative share — the diagnostic
    that drives hot-key salting. Pigeonhole heavy-hitter pruning, one
    exact refine pass (ops.analytics.key_skew)."""
    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.ops.analytics import key_skew

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "props"]) \
        .map_batches(binlog_from_events, batch_format="pyarrow")
    return key_skew(ds, "conv_id", k=20)


def _q_winsorize(sf_dir: str):
    """Per-group outlier trimming: clamp l_extendedprice into the
    [p05, p95] of its own return-flag group. Exact grouped quantiles
    (one partial-row shuffle) broadcast back; the corpus never
    shuffles (misc.group_winsorize)."""
    from datavec_ray.misc import group_winsorize

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_returnflag",
                "l_extendedprice"])
    return group_winsorize(ds, ["l_returnflag"], "l_extendedprice",
                           lo=0.05, hi=0.95, out_col="price_w")


def _q_quantile_bucket(sf_dir: str):
    """Equi-depth discretization: l_extendedprice into 4 equal-
    frequency buckets of its own return-flag group (thresholds =
    exact per-group quantile_disc grid, broadcast back)."""
    from datavec_ray.misc import quantile_bucket

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_returnflag",
                "l_extendedprice"])
    return quantile_bucket(ds, ["l_returnflag"], "l_extendedprice", 4,
                           out_col="bucket")


def _q_grouped_mode(sf_dir: str):
    """Most frequent tool per conversation (SQL mode(), deterministic
    smallest-value tie-break) — map-side (key,value) count combiner,
    one partial-row shuffle, segmented-argmax finalize."""
    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.misc import grouped_mode

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "props"]) \
        .map_batches(binlog_from_events, batch_format="pyarrow")
    return grouped_mode(ds, ["conv_id"], "tool")


def _q_tool_cooccurrence(sf_dir: str):
    """Market-basket association stats over tools per conversation:
    pair counts + support + lift from distinct-membership combiners;
    everything past the membership pass is bounded by the tool
    vocabulary squared (ops.analytics.cooccurrence)."""
    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.ops.analytics import cooccurrence

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "props"]) \
        .map_batches(binlog_from_events, batch_format="pyarrow")
    return cooccurrence(ds, "conv_id", "tool")


def _q_grouped_top_values(sf_dir: str):
    """Top-3 most frequent tools per conversation (per-group heavy
    hitters, deterministic ties) — (key,value) count combiner + one
    partial-row shuffle + per-partition lexsort ranking."""
    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.misc import grouped_top_values

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "props"]) \
        .map_batches(binlog_from_events, batch_format="pyarrow")
    return grouped_top_values(ds, ["conv_id"], "tool", 3)


def _q_fuzzy_pairs(sf_dir: str):
    """Entity-resolution fuzzy duplicates: every customer-name pair
    within Levenshtein distance 1, found by SymSpell deletion-
    neighborhood bucketing (variant HASHES only, via an invertible-base
    polynomial over the flat byte buffer) + vectorized exact-DP verify.
    EXACT output — oracle is the brute-force levenshtein() cross join."""
    from datavec_ray.ops.fuzzy import fuzzy_dup_pairs
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return fuzzy_dup_pairs(ds, text_col="c_name", id_col="c_custkey",
                           max_edits=1)


def _q_grouped_corr(sf_dir: str):
    """Per-group Pearson correlation (corr(extendedprice, quantity)
    per return flag) — combiner partial sums, one grouped Sum, narrow
    finalize (ops.analytics.grouped_corr)."""
    from datavec_ray.ops.analytics import grouped_corr

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])
    return grouped_corr(ds, ["l_returnflag"], "l_quantity",
                        "l_extendedprice")


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _q_pairwise_corr(sf_dir: str):
    """One-pass pairwise Pearson correlation matrix over lineitem's
    numeric measures — O(k²) floats per batch, merged by addition;
    driver forms the matrix. Oracle: DuckDB corr() per pair."""
    from datavec_ray.ops.analytics import pairwise_corr

    ds = _read(sf_dir, "lineitem", _CORR_COLS)
    return pairwise_corr(ds, _CORR_COLS, round_digits=6)


def _corr_sql() -> str:
    pairs = [(a, b) for i, a in enumerate(_CORR_COLS)
             for b in _CORR_COLS[i + 1:]]
    parts = [f"""select '{a}' as col_a, '{b}' as col_b,
                    round(corr({a}, {b}), 6) as "corr" from lineitem"""
             for a, b in pairs]
    return " union all ".join(parts) + " order by col_a, col_b"


def _q_grouped_linreg(sf_dir: str):
    """Per-returnflag OLS of extendedprice (cents) on quantity —
    combiner partial sums + one tiny grouped Sum + exact-int finalize
    (partial integer sums are exact in float64 below 2^53; the final
    combination runs in Python ints, mirrored by HUGEINT in the
    oracle, so the single float division is bit-identical)."""
    from datavec_ray.ops.analytics import grouped_linreg

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])

    def to_ints(b: pa.Table) -> pa.Table:
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        p = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "x": pa.array(np.rint(q).astype(np.int64)),
            "y": pa.array(np.rint(p * 100).astype(np.int64)),
        })

    out = grouped_linreg(ds.map_batches(to_ints, batch_format="pyarrow"),
                         ["l_returnflag"], "x", "y", exact=True)

    def shape(b: pa.Table) -> pa.Table:
        return pa.table({"l_returnflag": b["l_returnflag"], "n": b["n"],
                         "slope": pc.round(b["slope"], 6),
                         "intercept": pc.round(b["intercept"], 6)})

    return out.map_batches(shape, batch_format="pyarrow")


def _q_role_alternation(sf_dir: str):
    """Transcript QA: adjacent same-role turn pairs per conversation
    over the binlog's INSERT turns (well-formed dialogues alternate).
    One key shuffle + vectorized shifted-equality per partition."""
    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.misc import role_alternation_stats

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "props"]) \
        .map_batches(binlog_from_events, batch_format="pyarrow")

    def inserts(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["op"], "I")) \
                .select(["conv_id", "turn_idx", "lsn", "role"])

    turns = ds.map_batches(inserts, batch_format="pyarrow")
    return role_alternation_stats(turns, key="conv_id",
                                  order_cols=["turn_idx", "lsn"])


def _q_turn_offsets(sf_dir: str):
    """SFT loss-mask prep: per-turn [start, end) character spans inside
    the rendered conversation text (same format/order as
    render_transcripts) + is_target for assistant turns. One key
    shuffle + segmented exclusive cumsum (misc.turn_offsets)."""
    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.misc import turn_offsets

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "props"]) \
        .map_batches(binlog_from_events, batch_format="pyarrow")

    def inserts(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["op"], "I")) \
                .select(["conv_id", "turn_idx", "lsn", "role", "text"])

    out = turn_offsets(ds.map_batches(inserts, batch_format="pyarrow"),
                       order_cols=["turn_idx", "lsn"])
    return out.map_batches(
        lambda b: b.select(["conv_id", "turn_idx", "lsn", "role",
                            "start_off", "end_off", "is_target"]),
        batch_format="pyarrow")


def _q_quality_classifier(sf_dir: str):
    """fastText-class model-based quality scoring: label documents
    with the deterministic blocklist heuristic, train the distributed
    hashed-feature logistic regression (full-batch GD — fixed epochs,
    partition-invariant gradients), then score the corpus in one
    shuffle-free pass. Rows-only by design (iterative training, no SQL
    counterpart); kernel + invariance are test-covered."""
    from datavec_ray.ops.classifier import (score_logreg_hashed,
                                            train_logreg_hashed)
    from datavec_ray.ops.web import blocklist_tag

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def label(b: pa.Table) -> pa.Table:
        _, flag = blocklist_tag(b["text"], ["spark", "slow", "dup"])
        return b.append_column(
            pa.field("label", pa.int64()),
            pc.cast(pc.invert(flag), pa.int64()))

    labeled = ds.map_batches(label, batch_format="pyarrow")
    model = train_logreg_hashed(labeled, dim=1 << 14, epochs=8,
                                lr=1.0, seed=11)
    out = score_logreg_hashed(labeled, model)
    return out.select_columns(["doc_id", "label", "quality_score"])


def _q_hashing_vectorize(sf_dir: str):
    """Vocabulary-free feature-hashing vectorization (one pass, no
    vocab fit/shuffle — the at-scale TF-IDF alternative). Rows-only by
    design: the bucket mapping rides the engine-pinned vectorized
    string hash (same rationale as hll_distinct); kernel parity is
    test-covered against a naive per-token reference."""
    from datavec_ray.ops.textstats import hashing_vectorize

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: hashing_vectorize(b, dim=256, seed=7),
        batch_format="pyarrow")


def _q_web_pipeline(sf_dir: str):
    """End-to-end web-curation slice chained as ONE streaming plan:
    synthesized pages → HTML text extraction (actor-parse stage) →
    word-boundary blocklist gate on the EXTRACTED body text → per-host
    link stats over the surviving pages (in-batch combine → one tiny
    grouped Sum). Every stage is mirrored in the composite oracle
    (the blocklist gate on body text equals the gate on the raw text:
    the synthetic wrapper tokens never match and newlines preserve
    word boundaries)."""
    from datavec_ray.ops.web import (HtmlTextExtract, blocklist_tag,
                                     synth_html, url_host)
    from datavec_ray.reduce import Reducer

    ds = _read(sf_dir, "documents", _SYNTH_DOC_COLS)
    pages = ds.map_batches(synth_html, batch_format="pyarrow") \
              .map_batches(HtmlTextExtract("html"), batch_format="pyarrow")

    def gate_explode(b: pa.Table) -> pa.Table:
        _, flag = blocklist_tag(b["body_text"],
                                ["spark", "slow", "dup", "big"])
        b = b.filter(pc.invert(flag))
        links = b["links"].combine_chunks()
        counts = pc.fill_null(links.value_lengths(), 0).to_numpy(
            zero_copy_only=False)
        page_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        t = pa.table({"host": url_host(links.flatten()),
                      "page": pa.array(page_of)})
        t = t.filter(pc.is_valid(t["host"]))
        g = t.group_by("host").aggregate([("page", "count"),
                                          ("page", "count_distinct")])
        return g.rename_columns(["host", "n_links", "n_docs"])

    part = pages.map_batches(gate_explode, batch_format="pyarrow")
    return Reducer(["host"], [["n_links", "Sum", "n_links"],
                              ["n_docs", "Sum", "n_docs"]]) \
        .apply_dataset(part)


def _q_pagerank(sf_dir: str):
    """PageRank over a deterministic synthetic host graph derived from
    documents (src = doc_id mod 211, dst = (31·doc_id+7) mod 211 —
    mirrored term-for-term in the oracle's edge CTE): 5 fixed
    iterations, damping 0.85, dangling mass redistributed. Each
    iteration is one shuffle-free edges pass with the broadcast rank
    vector + one tiny grouped Sum; the oracle unrolls the same 5
    iterations as chained CTEs."""
    from datavec_ray.ops.graph import pagerank

    ds = _read(sf_dir, "documents", ["doc_id"])

    def edges(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(ids % 211),
                         "dst": pa.array((ids * 31 + 7) % 211)})

    t = pagerank(ds.map_batches(edges, batch_format="pyarrow"),
                 damping=0.85, iterations=5)
    return pa.table({"node": t["node"], "rank": pc.round(t["rank"], 6)})


def _q_triangle_count(sf_dir: str):
    """Exact triangle count of a deterministic synthetic host graph
    (3 edge families over doc_id mod 97, mirrored in the oracle edge
    CTE): degree-ordered wedge generation (Σ deg² ≤ O(E^1.5)) + one
    Bloom-prefiltered semi join closing wedges against the edge set."""
    from datavec_ray.ops.graph import triangle_count

    ds = _read(sf_dir, "documents", ["doc_id"])

    def edges(b: pa.Table) -> pa.Table:
        d = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        u = np.concatenate([d % 97, d % 97, d % 97])
        v = np.concatenate([(31 * d + 7) % 97, (17 * d + 3) % 97,
                            (53 * d + 11) % 97])
        return pa.table({"src": pa.array(u), "dst": pa.array(v)})

    n = triangle_count(ds.map_batches(edges, batch_format="pyarrow"))
    return pa.table({"triangles": pa.array([n], pa.int64())})


def _q_pagerank_personalized(sf_dir: str):
    """Personalized PageRank (Haveliwala 2002) over the same synthetic
    host graph, teleport pinned to node 0 — topic-focused crawl
    ranking. Same iteration engine; the oracle unrolls the seeded
    recurrence (teleport AND dangling mass land on the seed)."""
    from datavec_ray.ops.graph import pagerank

    ds = _read(sf_dir, "documents", ["doc_id"])

    def edges(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(ids % 211),
                         "dst": pa.array((ids * 31 + 7) % 211)})

    t = pagerank(ds.map_batches(edges, batch_format="pyarrow"),
                 damping=0.85, iterations=5, personalization={0: 1.0})
    return pa.table({"node": t["node"], "rank": pc.round(t["rank"], 6)})


def _pagerank_sql(iters: int = 5, d: float = 0.85,
                  seed_node: "int | None" = None) -> str:
    """Oracle for ``pagerank`` / ``pagerank_personalized``: the same
    fixed-iteration recurrence unrolled as chained CTEs (r0 … r{iters});
    with ``seed_node`` the teleport vector p is the seed indicator
    instead of uniform (init, (1-d) term and dangling mass all use p)."""
    sql = """
with e as (
  select doc_id % 211 as src, (doc_id * 31 + 7) % 211 as dst
  from documents
), nodes as (
  select distinct n from (select src as n from e
                          union all select dst as n from e)
), deg as (
  select src as n, count(*) as c from e group by src
), nn as (select count(*) as cnt from nodes
), r0 as (
"""
    if seed_node is None:
        pvec = "1.0 / (select cnt from nn)"
        sql += "  select n, 1.0 / (select cnt from nn) as r from nodes\n)"
    else:
        pvec = f"(case when nodes.n = {seed_node} then 1.0 else 0.0 end)"
        sql += (f"  select n, case when n = {seed_node} then 1.0 "
                "else 0.0 end as r from nodes\n)")
    prev = "r0"
    for i in range(1, iters + 1):
        sql += f""", r{i} as (
  select nodes.n,
         (1 - {d}) * {pvec}
         + {d} * (coalesce(c.s, 0)
                  + (select coalesce(sum(p.r), 0) from {prev} p
                     where p.n not in (select n from deg))
                    * {pvec}) as r
  from nodes
  left join (
    select e.dst as n, sum(p.r / deg.c) as s
    from e join {prev} p on p.n = e.src
           join deg on deg.n = e.src
    group by e.dst
  ) c on c.n = nodes.n
)"""
        prev = f"r{i}"
    sql += f"""
select n as node, round(r, 6) as "rank" from {prev} order by n"""
    return sql


def _q_ewma(sf_dir: str):
    """Per-user exponentially-weighted moving average of event values
    ordered by time (feature-engineering scan): one hash-partition
    shuffle, then pandas' Cython groupby().ewm() over all of a
    partition's groups at once. Oracle = the closed form
    Σ (1-α)^(t-i) x_i / Σ (1-α)^(t-i) as an in-group power-sum join."""
    from datavec_ray.misc import grouped_ewma

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = grouped_ewma(ds, ["user_id"], "ts", "value", alpha=0.3,
                       tiebreak="event_id")

    def shape(b: pa.Table) -> pa.Table:
        return pa.table({"event_id": b["event_id"],
                         "ewma": pc.round(b["ewma"], 6)})

    return out.map_batches(shape, batch_format="pyarrow")


def _q_funnel(sf_dir: str):
    """Strict-order conversion funnel with a 24 h per-step window over
    the events stream: one hash exchange on user, then every user in a
    partition resolves per step via a single biased int64 searchsorted
    (``ops/analytics.py``)."""
    from datavec_ray.ops.analytics import funnel

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    return funnel(ds, ["signup", "view", "click", "purchase"],
                  within_ms=86_400_000)


def _q_cohort_retention(sf_dir: str):
    """Weekly cohort retention matrix: per-batch distinct
    (user, week) combiner → one exchange → per-partition cohort + cell
    partials → tiny final groupby."""
    from datavec_ray.ops.analytics import cohort_retention

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return cohort_retention(ds, period_ms=7 * 86_400_000)


def _q_grouped_quantile_cont(sf_dir: str):
    """Interpolated (continuous) per-group quantiles — DuckDB
    quantile_cont semantics."""
    from datavec_ray.misc import grouped_quantile

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_quantile(ev, ["event_type"], "value",
                            [0.5, 0.9, 0.95], interpolation="linear")


def _q_grouped_quantile_hist(sf_dir: str):
    """Histogram-sketch per-group quantiles (bounded shuffle: at most
    groups x bins partial rows cross the exchange, never raw rows).
    Deterministic binning — the SQL oracle mirrors every float
    expression term for term, so the approximation itself is
    value-checked."""
    from datavec_ray.misc import grouped_quantile_hist

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_quantile_hist(ev, ["event_type"], "value",
                                 [0.5, 0.9, 0.99], bins=1024)


def _q_bigram_logprob(sf_dir: str):
    """Bigram stupid-backoff scoring: LM built from docs < 300, docs
    >= 300 scored — both the seen-bigram and OOV-backoff branches are
    exercised and value-checked."""
    from datavec_ray.ops.textstats import bigram_logprob

    cols = ["doc_id", "text"]
    lm = _read(sf_dir, "documents", cols).filter(expr="doc_id < 300")
    sc = _read(sf_dir, "documents", cols).filter(expr="doc_id >= 300")
    return bigram_logprob(sc, "text", "doc_id", alpha=0.4, lm_ds=lm)


def _q_importance_resample(sf_dir: str):
    """DSIR-style importance resampling: docs >= 100 are the raw pool,
    docs < 100 the target distribution; keep raw docs whose
    deterministic draw lands under min(1, exp(score)/tau). Scores, the
    two unigram LMs and the splitmix selection are all reproduced in
    SQL — the whole selection is value-checked."""
    from datavec_ray.ops.textstats import importance_resample

    docs = _read(sf_dir, "documents",
                 ["doc_id", "text"]).materialize()  # one scan, two forks
    raw = docs.filter(expr="doc_id >= 100")
    tgt = docs.filter(expr="doc_id < 100")
    return importance_resample(raw, tgt, "text", "doc_id",
                               tau=1.0, seed=0)


def _q_curation_export(sf_dir: str):
    """END-TO-END curation pipeline, every stage SQL-mirrored: Gopher
    quality gate → exact dedup (min doc_id per text) → benchmark
    decontamination (drop docs sharing any word 3-gram with docs < 25)
    → deterministic shuffled-shard export. The final (doc_id, shard,
    pos) permutation is value-checked, so the whole chain is."""
    from datavec_ray.join import anti_join
    from datavec_ray.misc import shuffled_shards
    from datavec_ray.ops.dedup import decontaminate, exact_dedup
    from datavec_ray.ops.textstats import quality_signals

    # pin the shared nodes once: `docs` feeds two forks and `uniq`
    # feeds three consumers (decontaminate + anti-join left + export);
    # without the pins each consumer re-executes the whole upstream
    # chain (read -> quality -> dedup shuffle) from parquet
    docs = _read(sf_dir, "documents", ["doc_id", "text"]).materialize()
    pool = docs.filter(expr="doc_id >= 25")
    bench = docs.filter(expr="doc_id < 25")
    kept = (pool.map_batches(quality_signals, batch_format="pyarrow")
            .filter(expr="keep == 1")
            .select_columns(["doc_id", "text"]))
    uniq = exact_dedup(kept, "text", "doc_id",
                       num_partitions=16).materialize()
    flagged = decontaminate(uniq, bench, "text", "doc_id", n=3)
    clean = anti_join(uniq, lambda: flagged.select_columns(["doc_id"]),
                      ["doc_id"])
    return (shuffled_shards(clean, "doc_id", n_shards=4, seed=0)
            .map_batches(lambda t: t.select(["doc_id", "shard", "pos"]),
                         batch_format="pyarrow"))


def _q_shuffle_export(sf_dir: str):
    """Deterministic global shuffle into training shards: shard and
    within-shard position are pure functions of doc_id (splitmix64),
    so the full permutation is reproducible in SQL."""
    from datavec_ray.misc import shuffled_shards

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return shuffled_shards(ds, "doc_id", n_shards=8, seed=0)


def _q_frequent_tokens(sf_dir: str):
    """Exact top-25 corpus tokens via the bounded-shuffle heavy-hitter
    plan (block-local candidate pruning with the pigeonhole guarantee,
    then an exact refine pass over the broadcast candidate set)."""
    from datavec_ray.ops.sketches import frequent_tokens

    ds = _read(sf_dir, "documents", ["text"])
    return frequent_tokens(ds, "text", k=25, capacity=4000)


def _q_exact_dedup(sf_dir: str):
    from datavec_ray.ops.dedup import exact_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup(ds, "text", "doc_id", num_partitions=16)


def _q_token_count(sf_dir: str):
    from datavec_ray.ops.textstats import token_count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(pa.field("n_tokens", pa.int64()),
                                   token_count(batch["text"]))

    return ds.map_batches(add, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens"])


def _q_fingerprint(sf_dir: str):
    from datavec_ray.ops.textstats import fingerprint_md5

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(lambda b: fingerprint_md5(b, "text", "fp"),
                          batch_format="pyarrow").select_columns(["doc_id", "fp"])


def _q_similarity_topk(sf_dir: str):
    import pyarrow.parquet as pq
    from datavec_ray.ops.similarity import brute_force_topk

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    emb = emb.sort_by("vec_id")
    q = np.stack([np.asarray(v, dtype=np.float64)
                  for v in emb["embedding"].to_pylist()[:5]])
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = brute_force_topk(ds, q, k=10)
    return out.select_columns(["query_id", "match_id"])


def _q_text_stats(sf_dir: str):
    """Language ID + quality scoring (actor-pool stage). Rows-only check."""
    from datavec_ray.ops.textstats import TextStats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(TextStats, batch_format="pyarrow", concurrency=2)
    return out.select_columns(["doc_id", "n_tokens", "quality_score", "lang_id"])


def _q_minhash_neardup(sf_dir: str):
    """MinHash-LSH near-duplicate pairs, Jaccard-verified via a
    column-pruned candidate-sketch pass (no driver-side corpus
    materialization). Rows-only check."""
    from datavec_ray.ops.dedup import minhash_lsh_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_lsh_pairs(ds, jaccard_threshold=0.5)


def _q_ngram_jaccard(sf_dir: str):
    """EXACT word-trigram Jaccard similarity join (inverted index, two
    shuffles + broadcast size join) — the oracle-checkable near-dup op;
    MinHash/SimHash approximate what this computes exactly."""
    from datavec_ray.ops.dedup import ngram_jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_pairs(ds, n=3, threshold=0.4)


def _q_grouped_topk(sf_dir: str):
    """Top-3 documents per (lang, source) by length: per-batch combiner
    prune (≤k rows per key per batch) then one small groupby — the
    'best N docs per domain' curation primitive."""
    from datavec_ray.rank import grouped_topk

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])
    return grouped_topk(ds, keys=["lang", "source"], order_col="n_chars",
                        k=3, descending=True, tiebreak="doc_id")


def _q_bpe_tokens(sf_dir: str):
    """GPT-2-style pre-tokenizer token count — one vectorized RE2 kernel
    per batch; the DuckDB oracle runs the SAME regex on the same engine."""
    from datavec_ray.ops.textstats import bpe_token_count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(pa.field("n_bpe_tokens", pa.int64()),
                                   bpe_token_count(batch["text"]))

    return ds.map_batches(add, batch_format="pyarrow").select_columns(
        ["doc_id", "n_bpe_tokens"])


def _q_asof_join(sf_dir: str):
    """Point-in-time join: each click joined to the user's latest
    at-or-before purchase. Hash-bucket co-partition (one shuffle) +
    one vectorized merge_asof per bucket; oracle = DuckDB ASOF JOIN."""
    import ray.data as rd
    from datavec_ray.join import asof_join

    def _side(event_type, drop):
        return rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts", "value", "event_type"],
            filter=pc.field("event_type") == event_type).drop_columns(drop)

    clicks = _side("click", ["event_type"])
    purch = _side("purchase", ["event_type", "event_id"])
    out = asof_join(clicks, purch, on="ts", by="user_id", num_buckets=16)
    return out.select_columns(["event_id", "user_id", "value",
                               "value_r", "ts_r"])


def _q_range_join(sf_dir: str):
    """Banded range join: every (click, purchase) pair of the same user
    with the purchase in the 24h before the click. One co-partitioning
    shuffle + two searchsorted passes per bucket; oracle = SQL interval
    inner join."""
    import ray.data as rd
    from datavec_ray.join import range_join

    def _side(event_type, cols):
        return rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=cols,
            filter=pc.field("event_type") == event_type)

    clicks = _side("click", ["event_id", "user_id", "ts"])
    purch = _side("purchase", ["user_id", "ts", "value"])
    out = range_join(clicks, purch, on="ts", by="user_id",
                     lower=-86_400_000_000, upper=0, num_buckets=16)
    return out.select_columns(["event_id", "user_id", "value_r", "ts_r"])


def _q_doc_quality(sf_dir: str):
    """Gopher-style per-document quality signals + keep rule (repetition,
    word-length, stopword bands) — one vectorized split + segmented
    numpy aggregation per batch; SQL-expressible, hash-checked."""
    from datavec_ray.ops.textstats import quality_signals

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(quality_signals, batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_words", "mean_word_len",
                               "top_word_frac", "distinct_frac",
                               "stopword_frac", "keep"])


def _q_lang_id(sf_dir: str):
    """Marker-frequency language ID per document — the same vectorized
    kernel text_stats uses (script-range counts + per-language marker
    substring counts, first-language tie-break), now value-checked: the
    oracle rebuilds the identical decision from the SAME marker
    constants in SQL (ops.textstats.TextStats._lang_batch)."""
    from datavec_ray.ops.textstats import TextStats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ts = TextStats("text")

    def lid(b: pa.Table) -> pa.Table:
        from datavec_ray.steps.base import combine as _c
        return pa.table({"doc_id": b["doc_id"],
                         "lang_id": ts._lang_batch(_c(b["text"]))})

    lid.__name__ = "lang_id"
    return ds.map_batches(lid, batch_format="pyarrow")


def _lang_id_oracle() -> str:
    """SQL mirror of TextStats._lang_batch generated from the SAME
    marker constants (shared verbatim, like PII_PATTERNS)."""
    from datavec_ray.ops.textstats import _LANG_MARKERS

    langs = list(_LANG_MARKERS)

    def cnt(lang: str) -> str:
        terms = [
            f"(length(padded) - length(replace(padded, '{m}', '')))"
            f" // {len(m)}"
            for m in sorted(_LANG_MARKERS[lang])]
        return " + ".join(terms)

    counts = ",\n                     ".join(
        f"({cnt(l)}) as c_{l}" for l in langs)
    # first max wins: the >= chain in declaration order
    best_cases = []
    for i, l in enumerate(langs):
        conds = [f"c_{l} >= c_{o}" for o in langs[i + 1:]]
        cond = " and ".join(conds) if conds else "true"
        best_cases.append(f"when {cond} then '{l}'")
    best = "case " + " ".join(best_cases) + " end"
    greatest = "greatest(" + ", ".join(f"c_{l}" for l in langs) + ")"
    return f"""
            with base as (
              select doc_id,
                     ' ' || lower(substr(coalesce(text, ''), 1, 1000))
                         || ' ' as padded,
                     substr(coalesce(text, ''), 1, 200) as head
              from documents
            ), c as (
              select doc_id, padded, head,
                     {counts},
                     len(regexp_extract_all(head, '[一-鿿぀-ヿ]'))
                         as cjk,
                     len(regexp_extract_all(head, '[Ѐ-ӿ]')) as cyr,
                     cast(length(head) as double) as hlen
              from base
            )
            select doc_id,
                   case when cjk > hlen * 0.2 then 'cjk'
                        when cyr > hlen * 0.2 then 'ru'
                        when {greatest} = 0 then 'unknown'
                        else {best} end as lang_id
            from c order by doc_id"""


def _q_quality_blend(sf_dir: str):
    """Multi-signal curation scorecard: Gopher signals → corpus-wide
    percentile rank per signal (three window_rank passes over the
    doc-count-sized signal table, the corpus never re-shuffles) →
    fixed-weight blend ``pr(distinct) + pr(stopword) + (1 −
    pr(top_word))`` — the composite ranking step that orders a corpus
    for budgeted selection. Oracle: percent_rank() windows over the
    same signal CTE."""
    from datavec_ray.misc import window_rank
    from datavec_ray.ops.textstats import quality_signals

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    sig = ds.map_batches(quality_signals, batch_format="pyarrow") \
        .map_batches(
            lambda b: b.select(["doc_id", "top_word_frac",
                                "distinct_frac", "stopword_frac"])
            .append_column(pa.field("__g", pa.int8()),
                           pa.array(np.zeros(b.num_rows, np.int8))),
            batch_format="pyarrow")
    for col, out in (("distinct_frac", "pr_d"), ("stopword_frac", "pr_s"),
                     ("top_word_frac", "pr_t")):
        sig = window_rank(sig, ["__g"], col, specs={out: "percent_rank"})

    def blend(b: pa.Table) -> pa.Table:
        score = pc.add(
            pc.add(b["pr_d"], b["pr_s"]),
            pc.subtract(pa.scalar(1.0, pa.float64()), b["pr_t"]))
        return pa.table({"doc_id": b["doc_id"], "pr_d": b["pr_d"],
                         "pr_s": b["pr_s"], "pr_t": b["pr_t"],
                         "score": score})

    return sig.map_batches(blend, batch_format="pyarrow")


def _q_cosine_pairs(sf_dir: str):
    """EXACT cosine similarity self-join over the embedding column —
    the oracle-checkable op that embedding_neardup's LSH bucketing
    approximates. Broadcast normalized corpus, one matmul per batch."""
    from datavec_ray.ops.similarity import cosine_pairs_exact

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_pairs_exact(ds, threshold=0.35)


def _q_simhash_neardup(sf_dir: str):
    from datavec_ray.ops.dedup import simhash_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_pairs(ds, "text", "doc_id", max_hamming=3)


def _q_embedding_neardup(sf_dir: str):
    from datavec_ray.ops.dedup import embedding_neardup_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_neardup_pairs(ds, cos_threshold=0.9)


def _q_hll_distinct(sf_dir: str):
    """HLL approximate distinct (tolerance-checked in tests, rows-only
    for the driver — approximation cannot hash-match exact SQL)."""
    from datavec_ray import TransformPipeline
    from datavec_ray.reduce import Reducer

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_partkey"])
    p = TransformPipeline(_schema_of(sf_dir, "lineitem").select(
        ["l_returnflag", "l_partkey"]))
    p.add(Reducer(["l_returnflag"], [["l_partkey", "CountUnique", "approx_parts"]]))
    return p.execute(ds)


def _q_sequence_offset(sf_dir: str):
    """Lag (SequenceOffset NewColumn/SpecifiedValue) per user over events."""
    from datavec_ray import TransformPipeline
    from datavec_ray.sequence import GroupedSequence, SequenceOffset
    from datavec_ray.steps import KeepColumns

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    p = TransformPipeline(_schema_of(sf_dir, "events").select(
        ["event_id", "user_id", "ts", "value"]))
    p.add(GroupedSequence(["user_id"], ["ts", "event_id"],
                          [SequenceOffset(["value"], 1, "NewColumn",
                                          "SpecifiedValue", -1.0)]))
    p.add(KeepColumns(["event_id", "user_id", "value_offset1"]))
    return p.execute(ds)


def _q_analysis_profile(sf_dir: str):
    """One-pass dataset profiling (AnalyzeSpark.analyze) over the numeric
    lineitem columns — oracle-checked against SQL aggregates (counts,
    min/max/mean/sample-stdev rounded to 4 decimals)."""
    from datavec_ray.analysis import analyze

    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    stats = analyze(_read(sf_dir, "lineitem", cols))
    rows = []
    for col in cols:
        st = stats[col]
        rows.append({
            "column": col,
            "n": int(st["count"]),
            "n_missing": int(st["count_missing"]),
            "n_zero": int(st["count_zero"]),
            "n_positive": int(st["count_positive"]),
            "n_negative": int(st["count_negative"]),
            "vmin": round(float(st["min"]), 4),
            "vmax": round(float(st["max"]), 4),
            "vmean": round(float(st["mean"]), 4),
            "vstdev": round(float(st["sample_stdev"]), 4),
        })
    import pandas as pd
    return pd.DataFrame(rows)


def _q_string_profile(sf_dir: str):
    """String-column profiling (AnalyzeSpark string stats: empty /
    alphabetic / numeric-string counts + length stats) — oracle-checked."""
    from datavec_ray.analysis import analyze

    cols = ["l_returnflag", "l_linestatus"]
    stats = analyze(_read(sf_dir, "lineitem", cols))
    rows = []
    for col in cols:
        st = stats[col]
        rows.append({
            "column": col,
            "n": int(st["count"]),
            "n_missing": int(st["count_missing"]),
            "n_empty": int(st["count_empty"]),
            "n_alpha": int(st["count_alphabetic"]),
            "n_numeric": int(st["count_numeric_string"]),
            "len_min": int(st["min_length"]),
            "len_max": int(st["max_length"]),
            "len_mean": round(float(st["mean_length"]), 4),
        })
    import pandas as pd
    return pd.DataFrame(rows)


def _q_quality_profile(sf_dir: str):
    """Schema-validity quality counts (AnalyzeSpark.analyzeQuality) —
    oracle-checked: valid/invalid/missing per column vs the declared
    constraints (range for doubles, anchored regex for strings)."""
    import pandas as pd
    from datavec_ray.analysis import analyze_quality
    from datavec_ray.schema import Schema

    sch = (Schema.builder()
           .add_double("l_quantity", min_value=0, max_value=50)
           .add_double("l_discount", min_value=0, max_value=0.05)
           .add_string("l_returnflag", regex="[ANR]")
           .build())
    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_discount", "l_returnflag"])
    q = analyze_quality(ds, sch)
    return pd.DataFrame([{"column": c, **v} for c, v in q.items()])


def _q_bpe_subwords(sf_dir: str):
    """Distributed BPE (Sennrich 2016): learn 150 merges from the
    corpus (one combiner word-count pass + driver merge loop over the
    vocabulary-sized table), then encode every document with the
    broadcast merge ranks — rows-only (iterative algorithm; merge
    order and encode are golden-tested vs a brute-force reference)."""
    from datavec_ray.ops.bpe import bpe_pipeline

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    enc = bpe_pipeline(ds, num_merges=150)
    return enc.select_columns(["doc_id", "n_subwords"])


def _q_stem_tokens(sf_dir: str):
    """Token ending-stemmer parity (EndingPreProcessor.java) composed
    with stopword removal (StopWords.java): explode documents to
    whitespace tokens, drop stop words, strip endings, count per stem —
    the oracle mirrors the five-regex chain term for term."""
    from datavec_ray.steps.nlp import RemoveStopWords, ending_stem_array

    ds = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .filter(expr="doc_id < 200")

    def explode(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(
            pc.utf8_lower(pc.fill_null(b["text"].combine_chunks(), "")),
            " ")
        flat = pc.list_flatten(parts)
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({"tok": flat})

    def stem(b: pa.Table) -> pa.Table:
        return pa.table(
            {"stem": ending_stem_array(b["tok"].combine_chunks())})

    rm = RemoveStopWords("tok")
    toks = ds.map_batches(explode, batch_format="pyarrow") \
        .map_batches(rm.apply, batch_format="pyarrow")
    stems = toks.map_batches(stem, batch_format="pyarrow")
    agg = stems.groupby("stem").count()

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"stem": b["stem"],
                         "n": b["count()"].cast(pa.int64())})

    out = agg.map_batches(fin, batch_format="pyarrow")
    return out.sort(["n", "stem"], descending=[True, False]).limit(30)


def _q_context_windows(sf_dir: str):
    """Moving-window context expansion (movingwindow/Windows.java):
    per token of each document, the focus word + its '<s>'/'</s>'-padded
    context window — oracle-checked against a DuckDB list_transform
    reproducing windowForWordInPosition exactly."""
    from datavec_ray.steps.nlp import context_windows

    ds = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .filter(expr="doc_id < 40")
    win = context_windows(ds, "text", "doc_id", window_size=5)

    def flat(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "seq_pos": b["seq_pos"].cast(pa.int64()),
            "focus": b["focus"],
            "window_str": pc.binary_join(
                b["window"].combine_chunks(), " "),
        })

    return win.map_batches(flat, batch_format="pyarrow")


def _q_tfidf(sf_dir: str):
    """Two-pass TF-IDF over documents (stateful vocab build via a
    distributed DF aggregate + broadcast vectorize), exploded to
    (doc_id, term, tfidf) rows — oracle-checked against a DuckDB CTE
    implementing the same tokenizer / vocab cap / idf formula."""
    import ray
    from datavec_ray.steps.nlp import TfidfVectorize, fit_tfidf_vocab

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    model = fit_tfidf_vocab(ds, max_vocab=256)
    ref = ray.put(model)
    inv_vocab = {i: t for t, i in model["vocab"].items()}

    def explode(batch: pa.Table) -> pa.Table:
        with_vec = TfidfVectorize(ref, dtype=np.float64)(batch)
        arr = with_vec["tfidf"].combine_chunks()
        w = len(arr[0]) if len(arr) else 0
        mat = arr.flatten().to_numpy(zero_copy_only=False).reshape(-1, w)
        ids = with_vec["doc_id"].to_numpy(zero_copy_only=False)
        r, c = np.nonzero(mat)
        return pa.table({
            "doc_id": pa.array(ids[r], pa.int64()),
            "term": pa.array([inv_vocab[j] for j in c], pa.string()),
            "tfidf": pa.array(np.round(mat[r, c].astype(np.float64), 4)),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def _q_ivf_topk(sf_dir: str):
    """IVF approximate nearest neighbors (scale path): the corpus is
    physically partitioned by centroid ONCE per sf_dir (cached index,
    amortized across queries — the real-usage shape) and each query
    reads only its nprobe probed partitions. Rows-only (recall vs the
    exact brute-force path is asserted in tests)."""
    import pyarrow.parquet as pq
    from datavec_ray.ops.similarity import ivf_build, ivf_query

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"]).sort_by("vec_id")
    q = np.stack([np.asarray(v, dtype=np.float64)
                  for v in emb["embedding"].to_pylist()[:5]])
    mtime = int(os.path.getmtime(os.path.join(sf_dir, "embeddings.parquet")))
    idx = os.path.join("/tmp", "datavec_ray_ivf_idx_"
                       + os.path.basename(sf_dir.rstrip("/")) + f"_{mtime}")
    if not os.path.isdir(os.path.join(idx, "cent=0")):
        ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        ivf_build(ds, idx, num_centroids=8, sample_frac=0.5)
    return ivf_query(idx, q, k=10, nprobe=4)


def _q_ivf_upsert(sf_dir: str):
    """Incremental vector-index maintenance (the vector-lake path):
    build the centroid-partitioned IVF index, apply a CHANGE batch
    (10 vectors moved, 5 deleted, 5 inserted) as versioned upsert
    files + a ledger — no rebuild — then query; superseded/deleted
    copies can never surface. Rows-only (engine-pinned geometry; the
    exact-equivalence and compaction invariants are pytest-asserted)
    (ops.similarity.ivf_upsert / ivf_query_live / ivf_compact)."""
    import shutil

    import pyarrow.parquet as pq
    from datavec_ray.ops.similarity import (ivf_build, ivf_query_live,
                                            ivf_upsert)

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"]).sort_by("vec_id")
    vecs = [np.asarray(v, dtype=np.float64)
            for v in emb["embedding"].to_pylist()]
    idx = f"/tmp/datavec_ray_ivf_upsert_{os.getpid()}"
    shutil.rmtree(idx, ignore_errors=True)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ivf_build(ds, idx, num_centroids=8, sample_frac=0.5)
    dim = len(vecs[0])
    moved = [list(-v) for v in vecs[:10]]            # flip 10 vectors
    new_ids = [100000 + i for i in range(5)]
    delta = pa.table({
        "vec_id": pa.array(list(range(10)) + list(range(10, 15))
                           + new_ids, pa.int64()),
        "embedding": pa.array(
            moved + [None] * 5
            + [list(vecs[i] * 0.5 + 0.1) for i in range(5)],
            pa.list_(pa.float64())),
    })
    ivf_upsert(idx, delta)
    q = np.stack(vecs[:5])
    out = ivf_query_live(idx, q, k=10, nprobe=4)
    from datavec_ray.util import dataset_to_table
    tbl = dataset_to_table(out).sort_by(
        [("query_id", "ascending"), ("cosine", "descending"),
         ("match_id", "ascending")])
    shutil.rmtree(idx, ignore_errors=True)
    return tbl


def _q_pq_topk(sf_dir: str):
    """Product-quantization ANN (the memory path: m uint8 codes per
    vector, ADC lookup-table scoring — corpus pass reads 8 bytes/row
    instead of 256). Rows-only; exactness/recall vs brute force is
    asserted in tests (a corpus built from codebook entries round-trips
    losslessly)."""
    import pyarrow.parquet as pq

    from datavec_ray.ops.similarity import pq_encode, pq_topk, pq_train

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"]).sort_by("vec_id")
    q = np.stack([np.asarray(v, dtype=np.float64)
                  for v in emb["embedding"].to_pylist()[:5]])
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cb = pq_train(ds, m=8, sample_frac=0.5)
    codes = pq_encode(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                      cb)
    return pq_topk(codes, cb, q, k=10)


def _q_ivfpq_topk(sf_dir: str):
    """IVF-PQ physical index (both scale levers composed: probed
    partitions only are READ, and what is read is m-byte residual codes,
    never vectors). Rows-only; recall/pruning asserted in tests."""
    import pyarrow.parquet as pq

    from datavec_ray.ops.similarity import ivfpq_build, ivfpq_query

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"]).sort_by("vec_id")
    q = np.stack([np.asarray(v, dtype=np.float64)
                  for v in emb["embedding"].to_pylist()[:5]])
    mtime = int(os.path.getmtime(os.path.join(sf_dir, "embeddings.parquet")))
    idx = os.path.join("/tmp", "datavec_ray_ivfpq_idx_"
                       + os.path.basename(sf_dir.rstrip("/")) + f"_{mtime}")
    if not os.path.isdir(os.path.join(idx, "cent=0")):
        ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        ivfpq_build(ds, idx, num_centroids=8, m=8, nbits=8,
                    sample_frac=0.5)
    return ivfpq_query(idx, q, k=10, nprobe=4)


def _q_ivf_exact(sf_dir: str):
    """IVF with FULL probing (nprobe = num_centroids) is exact — every
    partition is scored, so the result must equal brute-force cosine
    top-k. Oracle-checks the whole IVF machinery (k-means build,
    physical centroid partitioning, probe routing, per-partition
    scoring, top-k merge) against the same SQL as similarity_topk."""
    import pyarrow.parquet as pq
    from datavec_ray.ops.similarity import ivf_build, ivf_query

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"]).sort_by("vec_id")
    q = np.stack([np.asarray(v, dtype=np.float64)
                  for v in emb["embedding"].to_pylist()[:5]])
    mtime = int(os.path.getmtime(os.path.join(sf_dir, "embeddings.parquet")))
    idx = os.path.join("/tmp", "datavec_ray_ivf_idx_"
                       + os.path.basename(sf_dir.rstrip("/")) + f"_{mtime}")
    if not os.path.isdir(os.path.join(idx, "cent=0")):
        ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        ivf_build(ds, idx, num_centroids=8, sample_frac=0.5)
    out = ivf_query(idx, q, k=10, nprobe=8)
    return out.select_columns(["query_id", "match_id"])


def _q_geo_distance(sf_dir: str):
    """Geo ops over coordinates derived deterministically from events
    (no geo columns in the testdata). Rows-only."""
    from datavec_ray.ops.geo import CoordinatesDistance
    from datavec_ray import TransformPipeline
    from datavec_ray.steps import KeepColumns, LambdaStep

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def synth_coords(t: pa.Table) -> pa.Table:
        v = pc.cast(t["value"], pa.float64())
        lat = pc.subtract(pc.cast(pc.multiply(
            pc.subtract(v, pc.floor(v)), 180), pa.float64()), 90.0)
        # wrap user_id so lon stays in [-180, 180) at every scale factor
        uid = pc.subtract(t["user_id"],
                          pc.multiply(pc.divide(t["user_id"], 10000), 10000))
        lon = pc.subtract(pc.cast(pc.multiply(pc.divide(
            pc.cast(uid, pa.float64()), 1e4), 360), pa.float64()), 180.0)
        a = pc.binary_join_element_wise(pc.cast(lat, pa.string()),
                                        pc.cast(lon, pa.string()), ",")
        b = pc.binary_join_element_wise(pc.cast(lon, pa.string()),
                                        pc.cast(lat, pa.string()), ",")
        t = t.append_column(pa.field("pos_a", pa.string()), a)
        return t.append_column(pa.field("pos_b", pa.string()), b)

    p = TransformPipeline(_schema_of(sf_dir, "events").select(
        ["event_id", "user_id", "value"]))
    p.add(LambdaStep(synth_coords, lambda s: s.with_column("pos_a", pa.string())
                     .with_column("pos_b", pa.string()), "synth_coords"))
    p.add(CoordinatesDistance("dist_m", "pos_a", "pos_b"))
    p.add(KeepColumns(["event_id", "dist_m"]))

    def to_int_m(t: pa.Table) -> pa.Table:
        # integer meters: numpy and DuckDB libm disagree in the last
        # ulp, so any fixed-decimal rounding can flip a boundary digit
        # somewhere in a big table; at whole meters the flip window is
        # ~1e-8 m — negligible at any scale factor
        return t.set_column(t.schema.get_field_index("dist_m"),
                            pa.field("dist_m", pa.int64()),
                            pc.cast(pc.round(t["dist_m"], 0), pa.int64()))

    p.add(LambdaStep(to_int_m, lambda s: s, "round_dist"))
    return p.execute(ds)


def _q_media_pipeline(sf_dir: str):
    """Multimodal pipeline: synthetic media table (real PNG/BMP/WAV
    payloads) → actor-pool decode/resize → deterministic augmentation
    chain → DCT perceptual hash, all real kernels over decoded pixels
    (pure-stdlib codecs). Rows-only."""
    import ray.data as rd
    from datavec_ray.ops.multimodal import (ImageAugmentChain,
                                            ImageDecodeResize, ImagePHash,
                                            synth_media_table)

    ds = rd.from_arrow(synth_media_table(200, seed=3))
    dec = ds.map_batches(ImageDecodeResize, batch_format="pyarrow",
                         fn_constructor_args=(8, 8),
                         batch_size=32, concurrency=2)
    aug = dec.map_batches(
        ImageAugmentChain([{"op": "flip_h", "p": 0.5},
                           {"op": "normalize", "mean": 0.5, "std": 0.5}],
                          h=8, w=8, seed=0),
        batch_format="pyarrow", batch_size=32)
    hashed = aug.map_batches(ImagePHash(8, 8), batch_format="pyarrow",
                             batch_size=32)
    return hashed.select_columns(["media_id", "media_type", "width",
                                  "height", "phash"])


def _q_audio_mfcc(sf_dir: str):
    """Audio featurization: synthetic media table's REAL WAV payloads →
    actor-pool MFCC stage (batched rfft → mel filterbank → DCT-II,
    per-clip mean/std pooling) — the ASR-data clip embedding; rows-only
    (DSP has no SQL counterpart; known-signal pytest covers parity)."""
    import ray.data as rd

    from datavec_ray.ops.multimodal import AudioMFCC, synth_media_table

    media = synth_media_table(200, seed=3)
    audio = rd.from_arrow(media).filter(expr="media_type == 'audio'")
    feat = audio.map_batches(AudioMFCC, batch_format="pyarrow",
                             batch_size=32, concurrency=2)
    return feat.select_columns(["media_id", "sample_rate",
                                "mfcc_mean", "mfcc_std"])


def _q_jdbc_source(sf_dir: str):
    """JDBC source (JDBCRecordReader parity → ray.data.read_sql over a
    DB-API connection): the nation table loaded into sqlite once per
    sf_dir, then read back with a SQL filter as a Ray Dataset."""
    import sqlite3

    import pyarrow.parquet as pq
    from datavec_ray.sources import read_jdbc, sqlite_connection

    src = os.path.join(sf_dir, "nation.parquet")
    mtime = int(os.path.getmtime(src))
    db = os.path.join("/tmp", "datavec_ray_jdbc_"
                      + os.path.basename(sf_dir.rstrip("/")) + f"_{mtime}.db")
    if not os.path.exists(db):
        tbl = pq.read_table(src)
        tmp = db + ".tmp"
        with sqlite3.connect(tmp) as conn:
            conn.execute("CREATE TABLE nation "
                         "(n_nationkey INTEGER, n_name TEXT, n_regionkey INTEGER)")
            conn.executemany(
                "INSERT INTO nation VALUES (?, ?, ?)",
                zip(tbl["n_nationkey"].to_pylist(), tbl["n_name"].to_pylist(),
                    tbl["n_regionkey"].to_pylist()))
            conn.commit()
        os.replace(tmp, db)
    ds = read_jdbc("SELECT n_nationkey, n_name, n_regionkey FROM nation "
                   "WHERE n_regionkey < 3 ORDER BY n_nationkey",
                   sqlite_connection(db))

    def cast(batch):
        return pa.table({
            "n_nationkey": batch["n_nationkey"].cast(pa.int32()),
            "n_name": batch["n_name"],
            "n_regionkey": batch["n_regionkey"].cast(pa.int32()),
        })

    return ds.map_batches(cast, batch_format="pyarrow")


def _q_anti_join(sf_dir: str):
    """Customers with NO order above 400k (SQL NOT EXISTS) — pinned to
    the SHUFFLE semi/anti path with the Bloom prefilter ON, so the
    driver gate exercises the 100 TB shape: one aggregate pass builds
    the bloom over right keys, definite non-matches bypass the shuffle,
    possible matches are confirmed by a per-bucket exact anti join
    (broadcast path is covered by `semi_join` + tests)."""
    from datavec_ray.join import anti_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .filter(expr="o_totalprice > 400000")
    return anti_join(cust, orders, keys=["c_custkey"],
                     right_keys=["o_custkey"], broadcast=False,
                     bloom=True, num_buckets=16)


def _q_semi_join(sf_dir: str):
    """Customers with at least one high-value order (SQL EXISTS) —
    broadcast path: distinct right keys ray.put once, one vectorized
    pyarrow left-semi join per batch, zero shuffle."""
    from datavec_ray.join import semi_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    big = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .filter(expr="o_totalprice > 150000")
    return semi_join(cust, big, keys=["c_custkey"], right_keys=["o_custkey"])


def _q_grouped_quantile(sf_dir: str):
    """Exact per-event-type value percentiles (discrete quantile =
    element selection, bit-exact vs DuckDB quantile_disc)."""
    from datavec_ray.misc import grouped_quantile

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_quantile(ev, ["event_type"], "value", [0.5, 0.9, 0.95])


def _q_tdigest_quantile(sf_dir: str):
    """Per-event-type value percentiles via MERGEABLE t-digest sketches
    (fixed groups x delta centroid partials cross the exchange, never
    raw rows — the 10^10-row path for heavy-tailed columns where the
    range-histogram sketch degrades). Rows-only: estimates depend on
    block partitioning within the O(1/delta) rank-error bound; the
    exact counterpart `grouped_quantile` is oracle-checked, and
    tests/test_round3_features.py asserts the rank-error bound under
    multiple blockings."""
    from datavec_ray.ops.sketches import tdigest_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return tdigest_quantiles(ev, ["event_type"], "value",
                             [0.5, 0.9, 0.95], delta=200)


def _q_cumulative_sum(sf_dir: str):
    """Per-user running total of event values ordered by (ts, event_id)
    — SUM() OVER (PARTITION BY ... ROWS UNBOUNDED PRECEDING) as one
    grouped-shuffle sequence stage with a partition-vectorized pandas
    fast path."""
    from datavec_ray import TransformPipeline
    from datavec_ray.sequence import GroupedSequence, SequenceCumulativeSum
    from datavec_ray.steps import KeepColumns

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    p = TransformPipeline(_schema_of(sf_dir, "events").select(
        ["event_id", "user_id", "ts", "value"]))
    p.add(GroupedSequence(["user_id"], ["ts", "event_id"],
                          [SequenceCumulativeSum(["value"])]))
    p.add(KeepColumns(["event_id", "user_id", "value_cumsum"]))
    return p.execute(ds)


def _q_hash_sample(sf_dir: str):
    """Deterministic 10% content-hash sample of documents by doc_id —
    reproducible across reruns/repartitioning/engines; the oracle
    reproduces splitmix64 exactly in SQL (hugeint mod-2^64 arithmetic)."""
    from datavec_ray.misc import hash_sample

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return hash_sample(docs, "doc_id", 0.1, seed=7)


def _q_line_dedup(sf_dir: str):
    """C4-style corpus-wide exact line dedup over documents re-chunked
    into 10-word lines (the corpus stores single-line texts, so the
    vectorized word-chunker gives line structure first — both steps
    reproduced exactly in the SQL oracle). Keep = globally first
    occurrence of each distinct line in (doc_id, line_idx) order."""
    import pyarrow as pa

    from datavec_ray.ops.dedup import chunk_words_to_lines, line_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def chunk(batch: pa.Table) -> pa.Table:
        lines = chunk_words_to_lines(batch["text"], words_per_line=10)
        i = batch.schema.get_field_index("text")
        return batch.set_column(i, pa.field("text", pa.string()), lines)

    return line_dedup(docs.map_batches(chunk, batch_format="pyarrow"),
                      num_buckets=16)


def _q_repetition_signals(sf_dir: str):
    """Gopher n-gram/line repetition filters per document (dup-line
    fractions over 10-word lines, top-{2,3,4}-gram char coverage,
    dup-{5,10}-gram char coverage) — exact int64 numerators, one
    divide, round(6); the oracle reproduces every expression."""
    from datavec_ray.ops.textstats import repetition_signals

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return repetition_signals(docs, "text", "doc_id",
                              words_per_line=10,
                              top_ns=(2, 3, 4), dup_ns=(5, 10))


def _q_top_ngrams(sf_dir: str):
    """Corpus-wide 50 most frequent word bigrams (count desc, gram asc
    — total order, deterministic under ties)."""
    from datavec_ray.ops.textstats import top_ngrams

    docs = _read(sf_dir, "documents", ["text"])
    return top_ngrams(docs, "text", n=2, k=50)


def _q_dup_clusters(sf_dir: str):
    """Near-duplicate CLUSTER resolution: exact cosine pairs (>= 0.35)
    as edges -> distributed connected components (one mergeable
    spanning-forest aggregate pass) -> every embedding labeled with its
    duplicate-cluster id (min vec_id of the component; singletons label
    themselves). The final stage of every near-dedup pipeline; oracle =
    recursive-CTE transitive closure in DuckDB."""
    from datavec_ray.ops.graph import assign_components, connected_components
    from datavec_ray.ops.similarity import cosine_pairs_exact

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    edges = cosine_pairs_exact(ds, threshold=0.35)
    labels = connected_components(edges, "id_a", "id_b")
    return assign_components(
        _read(sf_dir, "embeddings", ["vec_id", "label"]), labels, "vec_id")


def _q_grouped_topn(sf_dir: str):
    """Top-3 orders per customer by price (deterministic tiebreak) —
    per-batch top-n combiner, then ONE groupby shuffle of winners only."""
    from datavec_ray.misc import grouped_topn

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])
    return grouped_topn(orders, ["o_custkey"], "o_totalprice", 3,
                        descending=True, tiebreak=["o_orderkey"])


def _q_pii_redact(sf_dir: str):
    """PII scrub over documents: deterministic synthetic PII (derived
    from doc_id, reproduced verbatim in the SQL oracle) is appended to
    each text, then redacted with the shared RE2 patterns — so the
    oracle genuinely checks that every email/IP/phone/SSN was caught."""
    from datavec_ray.ops.textstats import redact_pii

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def add_and_redact(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].combine_chunks().cast(pa.string())
        seeded = pc.binary_join_element_wise(
            batch["text"].combine_chunks(), " contact user", d,
            "@example.com ip 10.0.", d, ".7 tel +1 555 010 ", d,
            " ssn 123-45-6789", "")
        red = redact_pii(seeded)
        return pa.table({"doc_id": batch["doc_id"], "text": red})

    return docs.map_batches(add_and_redact, batch_format="pyarrow")


def _q_melt(sf_dir: str):
    """Wide->long unpivot of lineitem's numeric measures (SQL UNPIVOT)."""
    from datavec_ray import TransformPipeline
    from datavec_ray.steps import Melt

    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
            "l_discount"]
    ds = _read(sf_dir, "lineitem", cols)
    p = TransformPipeline(_schema_of(sf_dir, "lineitem").select(cols))
    p.add(Melt(["l_orderkey", "l_linenumber"],
               ["l_quantity", "l_extendedprice", "l_discount"],
               var_name="metric", value_name="val"))
    return p.execute(ds)


def _both_discount_sides(batch: pa.Table) -> pa.Table:
    """side 1 = deep discount (>= 0.06), side 2 = low (<= 0.02),
    0 = neither — both EXCEPT operands derived from ONE lineitem scan."""
    d = batch["l_discount"]
    side = pc.add(
        pc.cast(pc.greater_equal(d, 0.06), pa.int8()),
        pc.multiply(pc.cast(pc.less_equal(d, 0.02), pa.int8()),
                    pa.scalar(2, pa.int8())))
    return batch.drop_columns(["l_discount"]).append_column(
        pa.field("side", pa.int8()), side)


def _q_set_except(sf_dir: str):
    """(part, supplier) pairs shipped at deep discount but never at low
    discount — SQL EXCEPT via hash-partitioned exact set resolution.
    Both operands are filters of the same table, so the side assignment
    happens in the scan map (one lineitem read, one exchange)."""
    from datavec_ray.ops.setops import setop_with_sides

    ds = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_discount"]) \
        .map_batches(_both_discount_sides, batch_format="pyarrow")
    return setop_with_sides(ds, "side", "except")


def _q_set_intersect(sf_dir: str):
    """(part, supplier) pairs shipped at BOTH deep and low discount —
    SQL INTERSECT, same one-scan machinery as EXCEPT."""
    from datavec_ray.ops.setops import setop_with_sides

    ds = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_discount"]) \
        .map_batches(_both_discount_sides, batch_format="pyarrow")
    return setop_with_sides(ds, "side", "intersect")


def _q_distinct_rows(sf_dir: str):
    """Multi-column SELECT DISTINCT (set-semantics dedup; NULLs equal)."""
    from datavec_ray.ops.setops import distinct_rows

    ds = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_returnflag", "l_linestatus"])
    return distinct_rows(ds)


def _q_stratified_sample(sf_dir: str):
    """Exactly 20 documents per language, picked by splitmix64(doc_id)
    rank — deterministic stratified sampling (oracle mirrors the hash
    bit-for-bit in SQL)."""
    from datavec_ray.misc import sample_stratified

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source"])
    return sample_stratified(docs, ["lang"], "doc_id", 20, seed=7)


def _q_pivot_agg(sf_dir: str):
    """Aggregating pivot (SQL PIVOT ... USING sum(...) GROUP BY ...):
    per-batch partial-agg combiner, ONE shuffle of (keys × states)
    cells, spread to one column per return flag."""
    from datavec_ray.misc import pivot_table

    ds = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_returnflag", "l_quantity"])
    return pivot_table(ds, ["l_suppkey"], "l_returnflag", "l_quantity",
                       "sum", states=["A", "N", "R"])


def _q_window_rank(sf_dir: str):
    """SQL rank() OVER (PARTITION BY customer ORDER BY price DESC) —
    ties share the min position, so the result is deterministic without
    a tiebreak column."""
    from datavec_ray.misc import window_rank

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])
    return window_rank(orders, ["o_custkey"], "o_totalprice",
                       rank_col="rnk", method="rank", descending=True)


def _q_window_ntile(sf_dir: str):
    """percent_rank / cume_dist / ntile(4) over one shuffle+sort pass
    (specs mode): the percentile-bucketing step of a quality-filter
    pipeline ("drop the bottom quartile by score per group")."""
    from datavec_ray.misc import window_rank

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])
    return window_rank(orders, ["o_custkey"], "o_totalprice",
                       tiebreak=["o_orderkey"],
                       specs={"pct": "percent_rank", "cume": "cume_dist",
                              "tile": "ntile"}, ntile_buckets=4)


def _q_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling: each lineitem survives with
    probability l_linenumber/10 as a pure function of
    splitmix64(l_orderkey) — integer weights, no float rounding to
    diverge between engines; oracle mirrors the hash in SQL."""
    from datavec_ray.misc import weighted_sample

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity"])
    return weighted_sample(li, "l_orderkey", "l_linenumber",
                           denom=10, seed=5)


def _q_group_normalize(sf_dir: str):
    """Within-group z-score (SQL window avg/stddev_samp): one small
    stats groupby + broadcast join; the 60k-row input is never
    shuffled."""
    from datavec_ray.steps.normalize import group_normalize

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_suppkey", "l_quantity"])
    return group_normalize(li, ["l_suppkey"], ["l_quantity"],
                           "Standardize", suffix="_z")


def _q_chunk_words(sf_dir: str):
    """Context-window chunking: 32-word windows advancing by 24 (8-word
    overlap) — the max-sequence-length prep step before tokenize/pack.
    Row-local and fully vectorized (repeat/cumsum gather on the flat
    word array); oracle = list_slice over generate_series in SQL."""
    from datavec_ray.ops.textstats import chunk_words

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return chunk_words(docs, "text", ["doc_id"], chunk=32, overlap=8)


def _q_sentences(sf_dir: str):
    """Rule-based sentence splitting with an abbreviation guard —
    the tokenizer-family step the reference delegates to UIMA's
    sentence annotator (datavec-data-nlp PosUimaTokenizer.java),
    reimplemented as row-local vectorized Arrow kernels. Oracle
    mirrors the replace → regexp_split → trim → strip → restore chain
    term-for-term (SENT_ABBREVS / SENT_SPLIT_RE shared verbatim)."""
    from datavec_ray.ops.textstats import split_sentences

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return split_sentences(docs)


def _sentences_sql() -> str:
    from datavec_ray.ops.textstats import SENT_ABBREVS, SENT_SPLIT_RE
    expr = "text"
    for a in SENT_ABBREVS:
        rep = a.replace(".", "' || chr(1) || '")
        expr = f"replace({expr}, '{a}', '{rep}')"
    return f"""
        with r0 as (select doc_id, {expr} as t from documents),
        sp as (select doc_id,
                unnest(regexp_split_to_array(t, '{SENT_SPLIT_RE}'))
                  as piece,
                generate_subscripts(
                  regexp_split_to_array(t, '{SENT_SPLIT_RE}'), 1) as pidx
               from r0),
        cl as (select doc_id, pidx,
                replace(regexp_replace(
                    trim(piece, ' ' || chr(9) || chr(13) || chr(10)),
                    '[.!?]+$', ''), chr(1), '.') as sentence
               from sp)
        select doc_id,
               row_number() over (partition by doc_id
                                  order by pidx) - 1 as sent_idx,
               sentence
        from cl where sentence <> ''
    """


def _q_corpus_mix(sf_dir: str):
    """Deterministic corpus mixing: keep ALL English documents and a 30%
    content-hash sample of everything else — the fixed-ratio
    domain-mixture step of a training-data pipeline (reproducible across
    reruns/engines; oracle mirrors the per-source seeded hash)."""
    from datavec_ray.misc import interleave_corpora

    docs = _read(sf_dir, "documents",
                 ["doc_id", "lang", "source"]).materialize()
    en = docs.filter(expr="lang == 'en'")
    rest = docs.filter(expr="lang != 'en'")
    return interleave_corpora([en, rest], [1.0, 0.3], "doc_id", seed=11)


def _q_pack_shards(sf_dir: str):
    """Token-budget shard packing: documents assigned to fixed-budget
    output shards (10k chars each) in doc_id order via a global
    exclusive prefix sum (sort + per-block offsets, rank.py shape —
    blocks never leave the object store). Oracle = SQL window sum."""
    from datavec_ray.misc import pack_by_budget

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return pack_by_budget(docs, "n_chars", 10_000, "doc_id")


def _q_decontaminate(sf_dir: str):
    """Benchmark decontamination: documents sharing >= 1 exact word
    3-gram with the 'benchmark' split (doc_id < 25) are flagged with
    their distinct-overlap count. Bench grams are collected once and
    broadcast (eval sets are tiny vs the corpus); the corpus side is
    one shuffle-free streaming map. Oracle = distinct-gram join."""
    from datavec_ray.ops.dedup import decontaminate

    docs = _read(sf_dir, "documents",
                 ["doc_id", "text"]).materialize()  # one scan, two forks
    bench = docs.filter(expr="doc_id < 25")
    cand = docs.filter(expr="doc_id >= 25")
    return decontaminate(cand, bench, "text", "doc_id", n=3)


def _q_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd's k-means over the embedding column: seeded
    sample init + 3 full refinement passes (per-batch (sum,count)
    partials; the corpus never moves), then one assignment map.
    Iterative — no SQL oracle; test asserts allclose parity of the
    distributed Lloyd update vs an in-memory numpy reference."""
    from datavec_ray.ops.similarity import kmeans_assign, kmeans_fit

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents = kmeans_fit(ds, "embedding", k=8, iters=3, seed=11)
    return (kmeans_assign(ds, cents, "embedding")
            .select_columns(["vec_id", "cluster"]).sort("vec_id"))


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup: k-means clustering + exact within-cluster cosine pairs
    (>= 0.35) -> connected components -> keep min-id representative.
    Approximate by construction (cross-cluster pairs pruned); the exact
    counterparts cosine_pairs / dup_clusters are oracle-checked."""
    from datavec_ray.ops.similarity import semantic_dedup

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semantic_dedup(ds, "embedding", "vec_id", k=8,
                          threshold=0.35, iters=3, seed=11).sort("vec_id")


def _q_substring_dedup(sf_dir: str):
    """Exact duplicated-substring signals (Lee et al. 2022): per
    document, the count of 8-token windows shared verbatim with another
    document and the tokens covered by their union. Corpus explodes to
    one row per token position (the intrinsic cost of exact substring
    matching), two hash-partition groupbys, vectorized run/interval
    arithmetic inside. Oracle = DuckDB gram join + lead() span union."""
    from datavec_ray.ops.dedup import substring_dup_signals

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return substring_dup_signals(docs, "text", "doc_id", k=8)


def _q_dedup_against(sf_dir: str):
    """Incremental corpus dedup: drop incoming documents (doc_id % 7
    != 0) whose normalized-content md5 already exists in the reference
    'lake' split (doc_id % 7 == 0). Bloom-prefiltered shuffle anti-join
    on 16-byte fingerprints — the new-crawl-versus-lake step of a
    continuously ingesting pipeline."""
    from datavec_ray.ops.dedup import dedup_against

    def _split(want_ref: bool):
        def f(b: pa.Table) -> pa.Table:
            is_ref = pc.equal(
                pc.subtract(b["doc_id"],
                            pc.multiply(pc.divide(b["doc_id"], 7), 7)), 0)
            return b.filter(is_ref if want_ref else pc.invert(is_ref))
        f.__name__ = "split_ref" if want_ref else "split_inc"
        return f

    # ONE pruned scan, pinned once; both sides (and the anti join's
    # bloom + join passes over them) reuse the same blocks instead of
    # re-reading parquet per consumer (same one-scan discipline as the
    # set-op queries) — measured 10.4 s -> ~2 s at sf0.1
    docs = _read(sf_dir, "documents", ["doc_id", "text"]).materialize()
    inc = docs.map_batches(_split(False), batch_format="pyarrow")
    ref = docs.map_batches(_split(True), batch_format="pyarrow")
    # no output sort: the driver's compare is order-insensitive, and a
    # full Ray sort is pure fixed cost here (same call decontaminate
    # made in round 2)
    return dedup_against(inc, ref, "text", "doc_id",
                         broadcast=False, bloom=True,
                         num_buckets=16)


def _q_orc_source(sf_dir: str):
    """ORC lake interchange: customer.parquet converted once to ORC
    shards under /tmp (tmp-dir + atomic rename, keyed by source mtime),
    then read back via ``sources.read_orc`` with column pruning and
    aggregated per nation. Exercises write_orc's shard manifest and
    read_orc's per-stripe streaming; aggregates are order-insensitive
    (count + min/max — no float summation) so the value hash is exact."""
    import shutil

    from datavec_ray.reduce import Reducer
    from datavec_ray.sources import read_orc, write_orc

    src = os.path.join(sf_dir, "customer.parquet")
    mtime = int(os.path.getmtime(src))
    lake = os.path.join("/tmp", "datavec_ray_orc_"
                        + os.path.basename(sf_dir.rstrip("/")) + f"_{mtime}")
    if not os.path.isdir(lake):
        tmp = lake + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        write_orc(_read(sf_dir, "customer",
                        ["c_custkey", "c_nationkey", "c_acctbal"]), tmp)
        try:
            os.rename(tmp, lake)
        except OSError:                  # lost a concurrent-build race
            shutil.rmtree(tmp, ignore_errors=True)
    ds = read_orc(lake, columns=["c_nationkey", "c_acctbal"])

    def positive(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b["c_acctbal"], 0.0))

    return Reducer(["c_nationkey"],
                   [["c_acctbal", "Count", "n_customers"],
                    ["c_acctbal", "Min", "min_acctbal"],
                    ["c_acctbal", "Max", "max_acctbal"]]) \
        .apply_dataset(ds.map_batches(positive, batch_format="pyarrow"))


def _q_range_window(sf_dir: str):
    """Value-range windowed aggregate: per user ordered by time, the
    sum of `value` over the trailing 1-hour window (peers included) —
    SQL RANGE BETWEEN frame. One hash-partition shuffle; per partition
    all groups resolve via one sort + two segment-biased binary
    searches + per-window reduceat summation."""
    from datavec_ray.misc import range_window_agg

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def to_ms(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())
        ms = pc.divide(us, 1000)        # truncation = date_trunc('ms')
        return b.set_column(b.schema.get_field_index("ts"),
                            pa.field("ts_ms", pa.int64()), ms)

    ev = ev.map_batches(to_ms, batch_format="pyarrow")
    return (range_window_agg(ev, ["user_id"], "ts_ms", "value",
                             width=3_600_000, out_col="w_sum", agg="sum")
            .select_columns(["event_id", "user_id", "ts_ms", "w_sum"])
            .sort("event_id"))


def _q_unigram_logprob(sf_dir: str):
    """Unigram-LM document scoring (the KenLM-free perplexity proxy of
    CCNet-style curation): mean ln-probability per token under the
    corpus's own unigram distribution. Two passes — a combiner-first
    token-frequency groupby, then a broadcast vocab + one shuffle-free
    scoring map. Oracle = SQL unnest + frequency join."""
    from datavec_ray.ops.textstats import unigram_logprob

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return unigram_logprob(docs, "text", "doc_id")


def _q_bm25(sf_dir: str):
    """Okapi BM25 lexical-retrieval scoring of every document against a
    fixed query — the retrieval-based-filtering / hard-negative-mining
    scorer. Two shuffle-free passes: tiny per-batch (N, sum_dl, df)
    stat partials, then broadcast (query hashes, idf, avgdl) + one
    vectorized tf-matrix scoring map. Oracle = the same plus-one idf
    and tf saturation formula as SQL CTEs."""
    from datavec_ray.ops.textstats import bm25_score

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return bm25_score(docs, ["hash", "join", "filter"], "text", "doc_id")


def _q_sessionize(sf_dir: str):
    """Gap-based sessionization of flat events: per user ordered by
    (ts, event_id), a >30-minute silence starts a new session; each row
    gets its 0-based per-user session ordinal. One hash-partition
    shuffle, vectorized diff/cumsum across all of a partition's users
    at once. Oracle = SQL windowed lag + running sum."""
    from datavec_ray.misc import sessionize

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def to_ms(b: pa.Table) -> pa.Table:
        ms = pc.divide(pc.cast(b["ts"], pa.int64()), 1000)
        return b.set_column(b.schema.get_field_index("ts"),
                            pa.field("ts_ms", pa.int64()), ms)

    ev = ev.map_batches(to_ms, batch_format="pyarrow")
    return (sessionize(ev, ["user_id"], "ts_ms", gap=1_800_000,
                       tiebreak="event_id")
            .select_columns(["event_id", "user_id", "ts_ms", "session_id"])
            .sort("event_id"))


def _q_rollup(sf_dir: str):
    """Multi-level report in ONE pass: per-(lang, source), per-lang and
    grand-total document counts + char sums via GROUPING SETS (SQL
    ROLLUP). Map-side combiner aggregates every set per batch; the one
    shuffle moves partial rows only. Oracle = GROUP BY ROLLUP."""
    from datavec_ray.misc import rollup_agg

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source",
                                       "n_chars"])
    return rollup_agg(docs, ["lang", "source"],
                      [("n_chars", "Count", "n_docs"),
                       ("n_chars", "Sum", "sum_chars")])


def _q_json_extract(sf_dir: str):
    """Semi-structured payload extraction: pull props.k out of the JSON
    event payload (vectorized polars JSON kernel), then aggregate per
    event_type with the map-side-combiner reduce. Oracle = DuckDB
    json_extract_string + GROUP BY."""
    from datavec_ray import TransformPipeline
    from datavec_ray.reduce import Reducer
    from datavec_ray.steps import JsonExtract, RoundColumns

    ds = _read(sf_dir, "events", ["event_type", "props"])
    p = TransformPipeline(_schema_of(sf_dir, "events").select(
        ["event_type", "props"]))
    p.add(JsonExtract("props", {"k": ["$.k", "Long"]}, keep_source=False))
    p.add(Reducer(["event_type"],
                  [["k", "Sum", "sum_k"],
                   ["k", "Mean", "avg_k"],
                   ["k", "Count", "n"]]))
    p.add(RoundColumns(["avg_k"], 6))
    return p.execute(ds)


def _q_grouped_geomean(sf_dir: str):
    """Per-group geometric + harmonic means of l_quantity — the
    rate/ratio aggregates (one (n, Σln, Σ1/x) combiner pass)
    (ops.analytics.grouped_multiplicative_means)."""
    from datavec_ray.ops.analytics import grouped_multiplicative_means

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    return grouped_multiplicative_means(ds, ["l_returnflag"],
                                        "l_quantity")


def _q_grouped_moments(sf_dir: str):
    """Per-group skewness / excess kurtosis over integer-valued
    l_quantity — exact power-sum partials combined in arbitrary
    precision; the oracle mirrors the identical float expression over
    HUGEINT sums, bit-exact (ops.analytics.grouped_moments)."""
    from datavec_ray.ops.analytics import grouped_moments

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    return grouped_moments(ds, ["l_returnflag"], "l_quantity")


def _q_grouped_entropy(sf_dir: str):
    """Shannon entropy (log2) of the order-status distribution per
    order priority — distinct-count combiner, one partial shuffle
    (ops.analytics.grouped_entropy)."""
    from datavec_ray.ops.analytics import grouped_entropy

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])
    return grouped_entropy(ds, ["o_orderpriority"], "o_orderstatus")


def _q_time_resample(sf_dir: str):
    """Per-user daily-grid resampling of event values with linear
    interpolation between bracketing observations — generate_series +
    double ASOF-join oracle; duplicate timestamps reduce to MAX first
    (misc.time_resample)."""
    from datavec_ray.misc import time_resample

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"]) \
        .filter(expr="user_id < 50")
    return time_resample(ds, ["user_id"], "ts", "value",
                         step_ms=86_400_000, method="linear")


def _q_mad_outliers(sf_dir: str):
    """Per-event-type robust outlier counts via the Hampel identifier
    (|x − median| > 3·MAD) — two exact grouped-median passes broadcast
    back, corpus never shuffles (misc.mad_outliers)."""
    from datavec_ray.misc import mad_outliers

    ds = _read(sf_dir, "events", ["event_type", "value"])
    return mad_outliers(ds, ["event_type"], "value", k=3.0, summary=True)


def _q_compression_signal(sf_dir: str):
    """zlib compression-ratio repetition signal per document (C4 /
    Gopher-class quality gate) — rows-only: DEFLATE has no SQL
    counterpart; parity vs direct zlib is pytest-checked
    (ops.textstats.compression_signal)."""
    from datavec_ray.ops.textstats import compression_signal

    ds = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .filter(expr="doc_id < 500")
    return compression_signal(ds).select_columns(
        ["doc_id", "n_bytes", "n_compressed", "compress_ratio"])


def _q_cdc_copart_join(sf_dir: str):
    """SHUFFLE-FREE join of two co-partitioned CDC lakes (current state
    ⋈ half-replay snapshot on the shared routing key): both lakes hash
    conv_id with the same partitioner, so partition i joins partition i
    in one local task — zero exchange, parallelism = layout
    (cdc.engine.copartitioned_lake_join). Oracle: the two LWW states
    joined in SQL."""
    import tempfile

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import (CdcIngestEngine,
                                        copartitioned_lake_join)
    from datavec_ray.util import dataset_to_table

    cut = int(_read(sf_dir, "events", ["event_id"]).max("event_id")) // 2
    ds = _read(sf_dir, "events")
    binlog = ds.map_batches(binlog_from_events, batch_format="pyarrow")
    with tempfile.TemporaryDirectory(dir="/tmp") as la, \
            tempfile.TemporaryDirectory(dir="/tmp") as lb:
        ea = CdcIngestEngine(la, num_partitions=8)
        ea.replay(binlog, checkpoint_name="v2")
        eb = CdcIngestEngine(lb, num_partitions=8)
        eb.replay(binlog.filter(expr=f"lsn <= {cut}"),
                  checkpoint_name="v1")
        out = copartitioned_lake_join(ea, eb,
                                      on=["conv_id", "turn_idx"])
        tbl = dataset_to_table(out.map_batches(
            lambda b: b.select(["conv_id", "turn_idx", "text",
                                "text_r"]),
            batch_format="pyarrow"))
        ea.shutdown()
        eb.shutdown()
    return tbl


def _q_cross_join(sf_dir: str):
    """Cartesian grid expansion (nation × region): broadcast right
    side, map-side row repetition, no shuffle; hard-capped right rows
    (join.cross_join). Oracle = CROSS JOIN."""
    from datavec_ray.join import cross_join
    from datavec_ray.util import dataset_to_table

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    region = dataset_to_table(
        _read(sf_dir, "region", ["r_regionkey", "r_name"]))
    return cross_join(nation, region)


def _q_skew_join(sf_dir: str):
    """Skew-aware join: events joined with a per-user profile on the
    Zipf-headed user_id — the exact heavy-hitter pass routes hot keys
    through a broadcast map-side join (no straggler partition), cold
    keys through the ordinary shuffle; result set provably equals the
    plain JOIN (join.skew_join)."""
    from datavec_ray.join import skew_join
    from datavec_ray.reduce import Reducer

    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])
    prof = Reducer(["user_id"], [["value", "Sum", "user_value"],
                                 ["value", "Count", "user_events"]]) \
        .apply_dataset(_read(sf_dir, "events", ["user_id", "value"]))
    out = skew_join(ev, prof, ["user_id"], hot_share=0.005)
    return out.map_batches(
        lambda b: b.select(["user_id", "event_type", "value",
                            "user_value", "user_events"]),
        batch_format="pyarrow")


def _q_cdc_lineage(sf_dir: str):
    """Per-partition lineage metrics of an exactly-once replay — the
    north rule's audit record (source LSN range, rows applied, stale
    dupes dropped, tombstones) emitted by the engine per committed
    partition; rows-only (engine metrics, no SQL counterpart — the
    STATE they describe is oracle-checked by cdc_upsert/cdc_digest)."""
    import tempfile

    import pandas as pd

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import CdcIngestEngine

    ds = _read(sf_dir, "events")
    binlog = ds.map_batches(binlog_from_events, batch_format="pyarrow")
    with tempfile.TemporaryDirectory(dir="/tmp") as lake:
        eng = CdcIngestEngine(lake, num_partitions=16)
        lineage = eng.replay(binlog, checkpoint_name="lineage")
        eng.shutdown()
    df = pd.DataFrame(lineage)[
        ["partition", "rows", "events_applied", "stale_dropped",
         "deletes", "lsn_lo", "lsn_hi"]]
    return df.sort_values("partition").reset_index(drop=True)


def _q_zorder(sf_dir: str):
    """Z-order (Morton) clustering key over (o_custkey, o_orderkey) —
    the multi-dim data-layout key that makes min/max file stats prune
    range predicates on EITHER column after a sort-by-zkey write;
    exact bit interleave mirrored term-for-term in SQL
    (misc.zorder_key)."""
    from datavec_ray.misc import zorder_key

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    return zorder_key(ds, ["o_custkey", "o_orderkey"], bits=12)


def _q_cube(sf_dir: str):
    """Full CUBE report in ONE pass — all 2^k grouping sets of
    (lang, source) through the same map-side multi-set combiner as
    rollup_agg; the shuffle moves |sets|×distinct-keys partial rows
    (misc.rollup_agg with explicit sets). Oracle = GROUP BY CUBE."""
    from datavec_ray.misc import rollup_agg

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source",
                                       "n_chars"])
    return rollup_agg(docs, ["lang", "source"],
                      [("n_chars", "Count", "n_docs"),
                       ("n_chars", "Sum", "sum_chars")],
                      sets=[["lang", "source"], ["lang"], ["source"],
                            []])


def _q_benford(sf_dir: str):
    """Leading-significant-digit distribution vs Benford's law per
    return flag — the fabricated-data forensic screen; (keys, digit)
    count combiner, ≤ 9×groups partial rows cross the wire
    (ops.analytics.benford_profile)."""
    from datavec_ray.ops.analytics import benford_profile

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
    return benford_profile(ds, ["l_returnflag"], "l_extendedprice")


def _q_robust_scale(sf_dir: str):
    """Within-group ROBUST scaling ((v − median)/IQR, quantile_cont
    stats) — the outlier-insensitive normalizer; exact grouped
    quantiles broadcast back, input never shuffled
    (steps.normalize.group_normalize mode=Robust)."""
    from datavec_ray.steps.normalize import group_normalize

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_suppkey", "l_quantity"])
    return group_normalize(li, ["l_suppkey"], ["l_quantity"],
                           "Robust", suffix="_r")


def _q_cdc_digest(sf_dir: str):
    """Order-insensitive streaming digest of the replayed CDC final
    state (Σ md5-low64 of canonically serialized rows mod 2⁶⁴) — the
    at-scale "does the lake equal the oracle state" check that never
    sorts or materializes the table; the oracle computes the identical
    digest over its own LWW state in SQL (misc.table_digest)."""
    import pandas as pd

    from datavec_ray.cdc.binlog import binlog_from_events
    from datavec_ray.cdc.engine import lww_compact_dataset
    from datavec_ray.misc import table_digest

    ds = _read(sf_dir, "events")
    binlog = ds.map_batches(binlog_from_events, batch_format="pyarrow")
    final = lww_compact_dataset(binlog, num_partitions=16)

    def ts_to_ms(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("ts")
        return t.set_column(i, pa.field("ts_ms", pa.int64()),
                            t["ts"].cast(pa.int64())).rename_columns(
            [c if c != "ts" else "ts_ms" for c in t.column_names])

    d = table_digest(final.map_batches(ts_to_ms, batch_format="pyarrow"),
                     ["conv_id", "turn_idx", "role", "text", "tool",
                      "ts_ms"])
    return pd.DataFrame([{"n": d["n"],
                          "digest": np.uint64(d["digest"])}])


def _q_jaccard_against(sf_dir: str):
    """EXACT cross-corpus trigram Jaccard join (new docs vs existing
    corpus) — the incremental-crawl near-dup gate; inverted index with
    cross-side-only pair fan-out (ops.dedup.jaccard_against)."""
    from datavec_ray.ops.dedup import jaccard_against

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    ref = docs.filter(expr="doc_id < 300")
    new = docs.filter(expr="doc_id >= 300")
    return jaccard_against(new, ref, n=3, threshold=0.4)


def _q_minhash_against(sf_dir: str):
    """Cross-corpus MinHash+LSH near-dup candidates, exact-Jaccard
    verified — the banded scale path whose exact counterpart
    jaccard_against is oracle-checked (rows-only: engine-pinned
    signature seeds; ops.dedup.minhash_against)."""
    from datavec_ray.ops.dedup import minhash_against

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    ref = docs.filter(expr="doc_id < 300")
    new = docs.filter(expr="doc_id >= 300")
    return minhash_against(new, ref, jaccard_threshold=0.7)


# ---------------------------------------------------------------------------
# TPC-H composed analytics (multi-join + aggregate + top-k pipelines)
# ---------------------------------------------------------------------------
#
# Classic TPC-H shapes adapted to the testdata's column subset. These
# exercise COMPOSITION — join chains with auto broadcast-vs-shuffle
# decisions, map-side combiner aggregation, integer-exact money math
# (cents*(100-disc_pct) in int64 so the parallel sum is bit-equal to
# the sequential oracle at any scale), and deterministic distributed
# top-k via CalculateSortedRank over the still-integer sort key.

def _add_revenue_units(t: pa.Table) -> pa.Table:
    """price*(1-discount) in EXACT integer 'units' (cents × pct):
    px_cents * (100 - disc_pct). Drops the float source columns."""
    px = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0), 0),
                 pa.int64())
    disc = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0), 0),
                   pa.int64())
    units = pc.multiply(px, pc.subtract(pa.scalar(100, pa.int64()), disc))
    t = t.append_column(pa.field("units", pa.int64()), units)
    return t.drop_columns(["l_extendedprice", "l_discount"])


def _units_step():
    from datavec_ray.steps import LambdaStep
    return LambdaStep(
        _add_revenue_units,
        lambda s: s.without_columns(["l_extendedprice", "l_discount"])
        .with_column("units", pa.int64()),
        "revenue_units")


def _finalize_revenue(t: pa.Table) -> pa.Table:
    i = t.schema.get_field_index("revenue_units")
    return t.set_column(
        i, pa.field("revenue", pa.float64()),
        pc.round(pc.divide(pc.cast(t["revenue_units"], pa.float64()),
                           10000.0), 4)).rename_columns(
        [c if c != "revenue_units" else "revenue" for c in t.column_names])


def _revenue_step():
    from datavec_ray.steps import LambdaStep
    return LambdaStep(
        _finalize_revenue,
        lambda s: s.without_columns(["revenue_units"])
        .with_column("revenue", pa.float64()),
        "revenue_out")


def _q_tpch_q3(sf_dir: str):
    """TPC-H Q3 (shipping priority): customer ⋈ orders ⋈ lineitem,
    grouped revenue per urgent order, deterministic top 10. The
    orders⋈customer side is built once (filter + broadcast hash join)
    and joined to the lineitem spine with the auto broadcast/shuffle
    decision; top-k ranks the INTEGER revenue so ties are exact."""
    import datetime
    from datavec_ray import TransformPipeline
    from datavec_ray.conditions import ColumnCondition
    from datavec_ray.join import JoinStep
    from datavec_ray.rank import CalculateSortedRank
    from datavec_ray.reduce import Reducer
    from datavec_ray.steps import (ConditionFilter, KeepColumns, LongMathOp,
                                   RemoveColumns)

    cutoff = datetime.datetime(1998, 7, 1)

    def right():
        ocols = ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
        orders = _read(sf_dir, "orders", ocols)
        cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        cp = TransformPipeline(_schema_of(sf_dir, "customer").select(
            ["c_custkey", "c_mktsegment"]))
        cp.add(ConditionFilter(ColumnCondition(
            "c_mktsegment", "NotEqual", "BUILDING")))
        op = TransformPipeline(_schema_of(sf_dir, "orders").select(ocols))
        op.add(ConditionFilter(ColumnCondition(
            "o_orderdate", "GreaterOrEqual", cutoff)))
        op.add(JoinStep(lambda: cp.execute(cust), ["o_custkey"],
                        ["c_custkey"], "Inner"))
        op.add(KeepColumns(["o_orderkey", "o_orderdate", "o_orderpriority"]))
        return op.execute(orders)

    cols = ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    li = _read(sf_dir, "lineitem", cols)
    p = TransformPipeline(_schema_of(sf_dir, "lineitem").select(cols))
    p.add(ConditionFilter(ColumnCondition("l_shipdate", "LessOrEqual",
                                          cutoff)))
    p.add(RemoveColumns(["l_shipdate"]))
    p.add(_units_step())
    p.add(JoinStep(right, ["l_orderkey"], ["o_orderkey"], "Inner"))
    p.add(Reducer(["l_orderkey", "o_orderdate", "o_orderpriority"],
                  [["units", "Sum", "revenue_units"]]))
    # deterministic top 10: rank ascending on (-revenue, date, orderkey)
    p.add(LongMathOp("revenue_units", "Multiply", -1))
    p.add(CalculateSortedRank(["revenue_units", "o_orderdate", "l_orderkey"],
                              "rk"))
    p.add(ConditionFilter(ColumnCondition("rk", "GreaterOrEqual", 10)))
    p.add(LongMathOp("revenue_units", "Multiply", -1))
    p.add(_revenue_step())
    p.add(KeepColumns(["l_orderkey", "revenue", "o_orderdate",
                       "o_orderpriority"]))
    return p.execute(li)


def _q_tpch_q5(sf_dir: str):
    """TPC-H Q5 (local-supplier volume): 6-table join — lineitem spine,
    one-year orders, customer/supplier nation equality, ASIA region —
    grouped revenue per nation. region⋈nation folds into one tiny
    broadcast side; the nationkey equality is a column-vs-column
    subtract + filter (int32-exact)."""
    import datetime
    from datavec_ray import TransformPipeline
    from datavec_ray.conditions import BooleanCondition, ColumnCondition
    from datavec_ray.join import JoinStep
    from datavec_ray.reduce import Reducer
    from datavec_ray.steps import (ConditionFilter, IntegerColumnsMathOp,
                                   KeepColumns)

    lo = datetime.datetime(1997, 1, 1)
    hi = datetime.datetime(1998, 1, 1)

    def orders_year():
        ocols = ["o_orderkey", "o_custkey", "o_orderdate"]
        orders = _read(sf_dir, "orders", ocols)
        op = TransformPipeline(_schema_of(sf_dir, "orders").select(ocols))
        op.add(ConditionFilter(BooleanCondition("OR", [
            ColumnCondition("o_orderdate", "LessThan", lo),
            ColumnCondition("o_orderdate", "GreaterOrEqual", hi)])))
        op.add(KeepColumns(["o_orderkey", "o_custkey"]))
        return op.execute(orders)

    def asia_nations():
        from datavec_ray.util import dataset_to_table
        nation = dataset_to_table(
            _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]))
        region = dataset_to_table(
            _read(sf_dir, "region", ["r_regionkey", "r_name"]))
        asia = region.filter(pc.equal(region["r_name"], "ASIA"))
        keep = pc.is_in(nation["n_regionkey"], value_set=asia["r_regionkey"]
                        .combine_chunks())
        return nation.filter(keep).select(["n_nationkey", "n_name"])

    cols = ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    li = _read(sf_dir, "lineitem", cols)
    p = TransformPipeline(_schema_of(sf_dir, "lineitem").select(cols))
    p.add(_units_step())
    p.add(JoinStep(orders_year, ["l_orderkey"], ["o_orderkey"], "Inner"))
    p.add(JoinStep(lambda: _read(sf_dir, "customer",
                                 ["c_custkey", "c_nationkey"]),
                   ["o_custkey"], ["c_custkey"], "Inner"))
    p.add(JoinStep(lambda: _read(sf_dir, "supplier",
                                 ["s_suppkey", "s_nationkey"]),
                   ["l_suppkey"], ["s_suppkey"], "Inner"))
    p.add(IntegerColumnsMathOp("nk_diff", "Subtract",
                               ["c_nationkey", "s_nationkey"]))
    p.add(ConditionFilter(ColumnCondition("nk_diff", "NotEqual", 0)))
    p.add(JoinStep(asia_nations, ["s_nationkey"], ["n_nationkey"], "Inner"))
    p.add(Reducer(["n_name"], [["units", "Sum", "revenue_units"]]))
    p.add(_revenue_step())
    p.add(KeepColumns(["n_name", "revenue"]))
    return p.execute(li)


def _q_tpch_q10(sf_dir: str):
    """TPC-H Q10 (returned-item reporting): revenue of 'R' lineitems in
    one quarter grouped by customer BEFORE the customer join (aggregate
    early, ship 1 row per customer into the join), top 20 by integer
    revenue with custkey tiebreak."""
    import datetime
    from datavec_ray import TransformPipeline
    from datavec_ray.conditions import BooleanCondition, ColumnCondition
    from datavec_ray.join import JoinStep
    from datavec_ray.rank import CalculateSortedRank
    from datavec_ray.reduce import Reducer
    from datavec_ray.steps import (ConditionFilter, KeepColumns, LongMathOp,
                                   RemoveColumns)

    lo = datetime.datetime(1998, 1, 1)
    hi = datetime.datetime(1998, 4, 1)

    def orders_quarter():
        ocols = ["o_orderkey", "o_custkey", "o_orderdate"]
        orders = _read(sf_dir, "orders", ocols)
        op = TransformPipeline(_schema_of(sf_dir, "orders").select(ocols))
        op.add(ConditionFilter(BooleanCondition("OR", [
            ColumnCondition("o_orderdate", "LessThan", lo),
            ColumnCondition("o_orderdate", "GreaterOrEqual", hi)])))
        op.add(KeepColumns(["o_orderkey", "o_custkey"]))
        return op.execute(orders)

    def cust_nation():
        ccols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal"]
        cust = _read(sf_dir, "customer", ccols)
        cp = TransformPipeline(_schema_of(sf_dir, "customer").select(ccols))
        cp.add(JoinStep(lambda: _read(sf_dir, "nation",
                                      ["n_nationkey", "n_name"]),
                        ["c_nationkey"], ["n_nationkey"], "Inner"))
        cp.add(KeepColumns(["c_custkey", "c_name", "c_acctbal", "n_name"]))
        return cp.execute(cust)

    cols = ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]
    li = _read(sf_dir, "lineitem", cols)
    p = TransformPipeline(_schema_of(sf_dir, "lineitem").select(cols))
    p.add(ConditionFilter(ColumnCondition("l_returnflag", "NotEqual", "R")))
    p.add(RemoveColumns(["l_returnflag"]))
    p.add(_units_step())
    p.add(JoinStep(orders_quarter, ["l_orderkey"], ["o_orderkey"], "Inner"))
    p.add(Reducer(["o_custkey"], [["units", "Sum", "revenue_units"]]))
    p.add(JoinStep(cust_nation, ["o_custkey"], ["c_custkey"], "Inner"))
    # the hash join coalesces the key pair under the left name
    from datavec_ray.steps import RenameColumns
    p.add(RenameColumns({"o_custkey": "c_custkey"}))
    p.add(LongMathOp("revenue_units", "Multiply", -1))
    p.add(CalculateSortedRank(["revenue_units", "c_custkey"], "rk"))
    p.add(ConditionFilter(ColumnCondition("rk", "GreaterOrEqual", 20)))
    p.add(LongMathOp("revenue_units", "Multiply", -1))
    p.add(_revenue_step())
    p.add(KeepColumns(["c_custkey", "c_name", "c_acctbal", "n_name",
                       "revenue"]))
    return p.execute(li)


def _promo_gate(t: pa.Table) -> pa.Table:
    promo = pc.if_else(pc.equal(t["p_type"], "PROMO"), t["units"],
                       pa.scalar(0, pa.int64()))
    return t.append_column(pa.field("promo_units", pa.int64()), promo)


def _promo_share(t: pa.Table) -> pa.Table:
    share = pc.round(pc.divide(
        pc.multiply(pa.scalar(100.0),
                    pc.cast(t["promo_total"], pa.float64())),
        pc.cast(t["total"], pa.float64())), 6)
    return pa.table({"promo_share": share})


def _q_tpch_q14(sf_dir: str):
    """TPC-H Q14 (promotion effect): one-month lineitems ⋈ part
    (broadcast), promo revenue share as a ratio of two EXACT integer
    sums — a global two-sum reduce expressed through the grouped
    combiner on a constant key."""
    import datetime
    from datavec_ray import TransformPipeline
    from datavec_ray.conditions import BooleanCondition, ColumnCondition
    from datavec_ray.join import JoinStep
    from datavec_ray.reduce import Reducer
    from datavec_ray.steps import (AddConstantColumn, ConditionFilter,
                                   KeepColumns, LambdaStep, RemoveColumns)

    lo = datetime.datetime(1998, 9, 1)
    hi = datetime.datetime(1998, 10, 1)

    cols = ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"]
    li = _read(sf_dir, "lineitem", cols)
    p = TransformPipeline(_schema_of(sf_dir, "lineitem").select(cols))
    p.add(ConditionFilter(BooleanCondition("OR", [
        ColumnCondition("l_shipdate", "LessThan", lo),
        ColumnCondition("l_shipdate", "GreaterOrEqual", hi)])))
    p.add(RemoveColumns(["l_shipdate"]))
    p.add(_units_step())
    p.add(JoinStep(lambda: _read(sf_dir, "part", ["p_partkey", "p_type"]),
                   ["l_partkey"], ["p_partkey"], "Inner"))
    p.add(LambdaStep(_promo_gate,
                     lambda s: s.with_column("promo_units", pa.int64()),
                     "promo_gate"))
    p.add(AddConstantColumn("g", "Integer", 1))
    p.add(Reducer(["g"], [["promo_units", "Sum", "promo_total"],
                          ["units", "Sum", "total"]]))
    p.add(LambdaStep(
        _promo_share,
        lambda s: s.select([]).with_column("promo_share", pa.float64()),
        "promo_share"))
    p.add(KeepColumns(["promo_share"]))
    return p.execute(li)


_SQL_GROUPBY = """select l_returnflag, l_linestatus,
                   sum(l_quantity) as sq, avg(l_discount) as ad,
                   count(*) as n
            from lineitem
            where l_quantity between 5 and 45
              and l_returnflag in ('A', 'N')
            group by l_returnflag, l_linestatus
            having n > 10
            order by l_returnflag asc, l_linestatus asc"""

_SQL_JOIN = """select n_name, o_orderpriority, count(*) as n,
                   sum(o_totalprice) as total
            from orders
            join customer on o_custkey = c_custkey
            join nation on c_nationkey = n_nationkey
            where o_orderpriority like '1%' or o_orderpriority like '2%'
            group by n_name, o_orderpriority"""


_SQL_CASE = """select bucket, status, count(*) as n,
                   min(o_totalprice) as lo, max(o_totalprice) as hi,
                   avg(prio_len) as avg_len
            from (select case when o_totalprice > 200000 then 'big'
                              when o_totalprice > 50000 then 'mid'
                              else 'small' end as bucket,
                         lower(o_orderstatus) as status,
                         o_totalprice,
                         length(o_orderpriority) as prio_len
                  from orders
                  where o_orderstatus in ('O', 'F')) t
            group by bucket, status
            order by bucket asc, status asc"""


_SQL_WINDOW = """select o_orderkey, status, rk
            from (select o_orderkey, lower(o_orderstatus) as status,
                         rank() over (partition by o_orderstatus
                                      order by o_totalprice desc) as rk
                  from orders) t
            where rk <= 10
            order by status asc, rk asc"""

_SQL_UNION = """select 'big' as seg, o_orderkey as k from orders
            where o_totalprice > 400000
            union all
            select 'small' as seg, o_orderkey as k from orders
            where o_totalprice < 2000
            order by seg asc, k asc"""


def _q_sql_window(sf_dir: str):
    """SQL frontend: RANK() OVER (PARTITION BY ... ORDER BY ... DESC)
    inside a derived table with an outer rank filter (the QUALIFY
    pattern), planned onto misc.window_rank — one hash-partition
    shuffle, vectorized run-boundary ranking. Oracle = the identical
    SQL string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_WINDOW, {
        "orders": _read(sf_dir, "orders",
                        ["o_orderkey", "o_orderstatus", "o_totalprice"]),
    })


def _q_sql_union(sf_dir: str):
    """SQL frontend: UNION ALL of two filtered projections with a
    trailing union-scoped ORDER BY, planned onto Dataset.union.
    Oracle = the identical SQL string in DuckDB."""
    from datavec_ray.sql import sql

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return sql(_SQL_UNION, {"orders": orders})


_SQL_CUBE = """select lang, source, count(*) as n, min(n_chars) as lo,
                   max(n_chars) as hi, avg(n_chars) as ac
            from documents
            group by cube (lang, source)
            order by lang asc, source desc"""


_SQL_INSUB = """select o_orderpriority, count(*) as n,
                   min(o_totalprice) as lo, max(o_totalprice) as hi
            from orders
            where o_custkey in (select c_custkey from customer
                                where c_acctbal > 5000)
              and o_orderpriority not like '3%'
            group by o_orderpriority
            order by o_orderpriority asc"""


def _q_sql_insub(sf_dir: str):
    """SQL frontend: IN (SELECT ...) planned as a broadcast semi-join
    (the subquery's DISTINCT value set rides ONE ray.put; the probe
    side streams shuffle-free with SQL three-valued IN semantics),
    plus NOT LIKE. Oracle = the identical SQL string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_INSUB, {
        "orders": _read(sf_dir, "orders",
                        ["o_custkey", "o_orderpriority", "o_totalprice"]),
        "customer": _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]),
    })


_SQL_OUTERJOIN = """select o_orderkey, c_custkey, o_totalprice, c_acctbal
            from (select o_orderkey, o_custkey, o_totalprice from orders
                  where o_totalprice > 150000) a
            full outer join (select c_custkey, c_acctbal from customer
                             where c_acctbal > 5000) b
            on o_custkey = c_custkey"""


def _q_sql_outerjoin(sf_dir: str):
    """SQL frontend: FULL OUTER JOIN with exact ANSI key semantics —
    planned onto the bucket co-partition join (ONE hash exchange,
    per-bucket pyarrow join with coalesce_keys=False so BOTH key
    columns survive: left key NULL on right-only rows and vice versa).
    Oracle = the identical SQL string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_OUTERJOIN, {
        "orders": _read(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_totalprice"]),
        "customer": _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]),
    })


_SQL_EXISTS = """select o_orderpriority, count(*) as n from orders
            where exists (select c_custkey from customer
                          where c_custkey = o_custkey
                            and c_acctbal > 7000)
              and not exists (select n_nationkey from nation
                              where n_nationkey = o_orderkey)
            group by o_orderpriority
            order by o_orderpriority asc"""


def _q_sql_exists(sf_dir: str):
    """SQL frontend: CORRELATED EXISTS / NOT EXISTS decorrelated onto
    SemiJoinStep (semi / anti join — broadcast DISTINCT keys for small
    inner sides, Bloom-capable bucket shuffle for large), with inner
    predicates pushed below the join and the inner scan pruned to the
    key columns. Oracle = the identical SQL string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_EXISTS, {
        "orders": _read(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_orderpriority"]),
        "customer": _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]),
        "nation": _read(sf_dir, "nation", ["n_nationkey"]),
    })


_SQL_LAG = """select event_id,
                   lag(value) over (partition by user_id
                                    order by ts, event_id) as prev_value,
                   lead(event_type, 2) over (partition by user_id
                                    order by ts, event_id) as next2_type
            from events"""


def _q_sql_lag(sf_dir: str):
    """SQL frontend: LAG / LEAD planned onto the SAME single
    hash-partition exchange as the rank family (misc.window_rank
    positional-shift specs — one sorted run scan, one clamped
    vectorized gather per function). Oracle = the identical SQL
    string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_LAG, {
        "events": _read(sf_dir, "events",
                        ["event_id", "user_id", "ts", "value",
                         "event_type"]),
    })


_SQL_WINAGG = """select event_id,
                   sum(value) over (partition by user_id
                     order by ts, event_id
                     rows between unbounded preceding and current row)
                     as run_value,
                   count(*) over (partition by user_id
                     order by ts, event_id
                     rows between unbounded preceding and current row)
                     as run_n
            from events"""


def _q_sql_winagg(sf_dir: str):
    """SQL frontend: running windowed aggregates (ROWS UNBOUNDED
    PRECEDING) planned onto window_rank's segment-reset cumulative
    scans — ONE hash exchange for every window item of the SELECT.
    Oracle = the identical SQL string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_WINAGG, {
        "events": _read(sf_dir, "events",
                        ["event_id", "user_id", "ts", "value"]),
    })


_SQL_FRAMES = """select event_id,
                   sum(value) over (partition by user_id
                     order by ts, event_id
                     rows between 9 preceding and current row)
                     as win_sum,
                   min(value) over (partition by user_id
                     order by ts, event_id
                     rows between 9 preceding and current row)
                     as win_min,
                   count(value) over (partition by user_id
                     order by ts, event_id
                     rows between 9 preceding and current row)
                     as win_n
            from events"""


def _q_sql_frames(sf_dir: str):
    """SQL frontend: bounded sliding frames (ROWS BETWEEN k PRECEDING
    AND CURRENT ROW) — sum/count via clamped prefix-sum differences,
    min via pandas per-segment rolling kernels, all planned onto ONE
    window_rank exchange. Oracle = the identical SQL string in
    DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_FRAMES, {
        "events": _read(sf_dir, "events", ["event_id", "user_id",
                                           "ts", "value"]),
    })


_SQL_RANGE_FRAME = """select event_id,
                   sum(value) over (partition by user_id order by ts)
                     as run_sum,
                   count(value) over (partition by user_id order by ts)
                     as run_n
            from events"""


def _q_sql_range_frame(sf_dir: str):
    """SQL frontend: the SQL *default* RANGE-peers frame (ORDER BY
    with no explicit frame) — running values shared across value
    peers, deterministic even under ts ties, planned as a cumulative
    scan + peer-run-end propagation. Oracle = the identical SQL
    string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_RANGE_FRAME, {
        "events": _read(sf_dir, "events", ["event_id", "user_id",
                                           "ts", "value"]),
    })


_SQL_TPCH_Q17 = """select round(sum(l_extendedprice) / 7.0, 2)
                     as avg_yearly
            from part join lineitem on p_partkey = l_partkey
            where p_brand = 'Brand#23' and p_size < 15
              and l_quantity < (select 0.2 * avg(l_quantity) as thr
                                from lineitem
                                where l_partkey = p_partkey)"""


def _q_sql_tpch_q17(sf_dir: str):
    """TPC-H Q17 (small-quantity-order revenue) through the SQL
    frontend: the correlated scalar subquery decorrelates to a
    per-partkey grouped AVG (one combiner exchange) left-joined back
    to the probe side — no per-row re-execution. Oracle = the
    identical SQL string in DuckDB. (p_container is absent from the
    synthetic part table; p_size < 15 stands in as the second part
    filter.)"""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q17, {
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_partkey", "l_quantity", "l_extendedprice"]),
        "part": _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]),
    })


_SQL_TPCH_Q3 = """with rev as (
  select l_orderkey, o_orderdate, o_orderpriority,
         sum(cast(round(l_extendedprice * 100, 0) as bigint)
             * (100 - cast(round(l_discount * 100, 0) as bigint)))
           as units
  from lineitem
  join orders on l_orderkey = o_orderkey
  join customer on o_custkey = c_custkey
  where c_mktsegment = 'BUILDING'
    and o_orderdate < timestamp '1998-07-01'
    and l_shipdate > timestamp '1998-07-01'
  group by l_orderkey, o_orderdate, o_orderpriority)
select l_orderkey, round(units / 10000.0, 4) as revenue,
       o_orderdate, o_orderpriority,
       row_number() over (order by units desc, o_orderdate, l_orderkey)
         as rn
from rev
qualify rn <= 10"""


def _q_sql_tpch_q3(sf_dir: str):
    """TPC-H Q3 (shipping priority) ENTIRELY through the SQL frontend:
    CTE → two-join chain → grouped fixed-point revenue (integer-exact,
    the same idiom as the hand-built tpch_q3) → global-window
    row_number + QUALIFY top-10. Oracle = the identical string in
    DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q3, {
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_orderkey", "l_extendedprice", "l_discount",
                           "l_shipdate"]),
        "orders": _read(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_orderdate",
                         "o_orderpriority"]),
        "customer": _read(sf_dir, "customer",
                          ["c_custkey", "c_mktsegment"]),
    })


_SQL_TPCH_Q4 = """select o_orderpriority, count(*) as order_count
from orders
where o_orderdate >= timestamp '1997-01-01'
  and o_orderdate < timestamp '1998-01-01'
  and exists (select l_orderkey from lineitem
              where l_orderkey = o_orderkey and l_quantity > 30)
group by o_orderpriority
order by o_orderpriority asc"""


def _q_sql_tpch_q4(sf_dir: str):
    """TPC-H Q4 (order-priority checking) through the frontend: the
    correlated EXISTS decorrelates onto SemiJoinStep (inner predicate
    pushed below, inner scan pruned to keys). The synthetic lineitem
    has no commit/receipt dates; l_quantity > 30 stands in as the
    inner filter. Oracle = the identical string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q4, {
        "orders": _read(sf_dir, "orders",
                        ["o_orderkey", "o_orderdate", "o_orderpriority"]),
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_orderkey", "l_quantity"]),
    })


_SQL_TPCH_Q5 = """select n_name,
       round(sum(cast(round(l_extendedprice * 100, 0) as bigint)
             * (100 - cast(round(l_discount * 100, 0) as bigint)))
             / 10000.0, 4) as revenue
from lineitem
join orders on l_orderkey = o_orderkey
join customer on o_custkey = c_custkey
join supplier on l_suppkey = s_suppkey
join nation on s_nationkey = n_nationkey
join region on n_regionkey = r_regionkey
where r_name = 'ASIA'
  and c_nationkey = s_nationkey
  and o_orderdate >= timestamp '1997-01-01'
  and o_orderdate < timestamp '1998-01-01'
group by n_name"""


def _q_sql_tpch_q5(sf_dir: str):
    """TPC-H Q5 (local supplier volume) through the frontend: a
    SIX-table join chain (auto broadcast for the small dimensions) +
    the non-key equality c_nationkey = s_nationkey as a fused filter +
    integer-exact grouped revenue. Oracle = the identical string in
    DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q5, {
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_orderkey", "l_suppkey", "l_extendedprice",
                           "l_discount"]),
        "orders": _read(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_orderdate"]),
        "customer": _read(sf_dir, "customer",
                          ["c_custkey", "c_nationkey"]),
        "supplier": _read(sf_dir, "supplier",
                          ["s_suppkey", "s_nationkey"]),
        "nation": _read(sf_dir, "nation",
                        ["n_nationkey", "n_name", "n_regionkey"]),
        "region": _read(sf_dir, "region", ["r_regionkey", "r_name"]),
    })


_SQL_TPCH_Q22 = """select c_nationkey, count(*) as numcust,
       round(sum(c_acctbal), 2) as totacctbal
from customer
where c_acctbal > (select avg(c_acctbal) as a from customer
                   where c_acctbal > 0.0)
  and not exists (select o_custkey from orders
                  where o_custkey = c_custkey
                    and o_totalprice > 400000)
group by c_nationkey
order by c_nationkey asc"""


def _q_sql_tpch_q22(sf_dir: str):
    """TPC-H Q22 (global sales opportunity) through the frontend:
    uncorrelated scalar AVG folds to a literal, correlated NOT EXISTS
    decorrelates to an anti join with the inner predicate pushed
    below; grouped balance totals per nation (the synthetic c_name
    carries no country code — c_nationkey plays that role, and
    "has no order above 400k" stands in for "has no orders" since
    every synthetic customer has orders). Oracle = the identical
    string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q22, {
        "customer": _read(sf_dir, "customer",
                          ["c_custkey", "c_nationkey", "c_acctbal"]),
        "orders": _read(sf_dir, "orders",
                        ["o_custkey", "o_totalprice"]),
    })


_SQL_TPCH_Q10 = """with rev as (
  select o_custkey,
         sum(cast(round(l_extendedprice * 100, 0) as bigint)
             * (100 - cast(round(l_discount * 100, 0) as bigint)))
           as units
  from lineitem
  join orders on l_orderkey = o_orderkey
  where l_returnflag = 'R'
    and o_orderdate >= timestamp '1998-01-01'
    and o_orderdate < timestamp '1998-04-01'
  group by o_custkey)
select c_custkey, c_name, c_acctbal, n_name,
       round(units / 10000.0, 4) as revenue,
       row_number() over (order by units desc, c_custkey) as rn
from rev
join customer on o_custkey = c_custkey
join nation on c_nationkey = n_nationkey
qualify rn <= 20"""


def _q_sql_tpch_q10(sf_dir: str):
    """TPC-H Q10 (returned-item reporting) through the SQL frontend:
    CTE combiner aggregate → two dimension joins → global-window
    row_number + QUALIFY top-20, integer-exact revenue. Oracle = the
    identical string in DuckDB (the hand-built tpch_q10 pipeline
    remains as the operator-API counterpart)."""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q10, {
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_orderkey", "l_extendedprice", "l_discount",
                           "l_returnflag"]),
        "orders": _read(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_orderdate"]),
        "customer": _read(sf_dir, "customer",
                          ["c_custkey", "c_name", "c_acctbal",
                           "c_nationkey"]),
        "nation": _read(sf_dir, "nation", ["n_nationkey", "n_name"]),
    })


_SQL_TPCH_Q14 = """select round((100.0 * cast(sum(case
                 when p_type = 'ECONOMY' then units else 0 end)
                 as double)) / cast(sum(units) as double), 6)
             as promo_share
from (select l_partkey,
             cast(round(l_extendedprice * 100, 0) as bigint)
             * (100 - cast(round(l_discount * 100, 0) as bigint))
               as units
      from lineitem
      where l_shipdate >= timestamp '1998-09-01'
        and l_shipdate < timestamp '1998-10-01') li
join part on l_partkey = p_partkey"""


def _q_sql_tpch_q14(sf_dir: str):
    """TPC-H Q14 (promotion effect) through the SQL frontend: derived
    table with integer fixed-point units → broadcast join → a global
    aggregate-expression ratio with a conditional CASE sum ('ECONOMY'
    — the synthetic p_type has no 'PROMO', which would make the share
    trivially zero). Oracle = the identical string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q14, {
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_partkey", "l_extendedprice", "l_discount",
                           "l_shipdate"]),
        "part": _read(sf_dir, "part", ["p_partkey", "p_type"]),
    })


_SQL_RECURSIVE = """with recursive r as (
  select n_nationkey as k, cast(n_nationkey + 1 as bigint) as v
  from nation
  union all
  select k, v * 2 as v from r where v * 2 < 1000)
select k, v from r order by k asc, v asc"""


def _q_sql_recursive(sf_dir: str):
    """WITH RECURSIVE through the SQL frontend: bounded semi-naive
    evaluation — anchor UNION ALL step, each iteration's delta
    re-broadcast into the step plan until fixpoint (per-key geometric
    chains here; cycle/row caps raise loudly; lake-scale closures
    belong to ops.graph's pointer-doubling). Oracle = the identical
    string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_RECURSIVE, {
        "nation": _read(sf_dir, "nation", ["n_nationkey"]),
    })


_SQL_GROUPEXPR = """select date_trunc('day', ts) as d, count(*) as n,
                   min(value) as lo, max(value) as hi,
                   count(distinct user_id) as users
            from events
            group by date_trunc('day', ts)
            order by d asc"""


def _q_sql_groupexpr(sf_dir: str):
    """SQL frontend: GROUP BY over an expression (date_trunc) — the
    computed key becomes a hidden column evaluated map-side, riding
    the SAME combiner exchange as the aggregates; matching select
    subtrees are substituted to reference it. Oracle = the identical
    SQL string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_GROUPEXPR, {
        "events": _read(sf_dir, "events", ["ts", "value", "user_id"]),
    })


_SQL_TPCH_Q1 = """select l_returnflag, l_linestatus,
                   sum(l_quantity) as sum_qty,
                   round(sum(l_extendedprice), 2) as sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                     as sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount)
                             * (1 + l_tax)), 2) as sum_charge,
                   round(sum(l_quantity) / count(*), 6) as avg_qty,
                   round(sum(l_extendedprice) / count(*), 6) as avg_price,
                   round(sum(l_discount) / count(*), 6) as avg_disc,
                   count(*) as count_order
            from lineitem
            where l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            group by l_returnflag, l_linestatus
            order by l_returnflag asc, l_linestatus asc"""


def _q_sql_tpch_q1(sf_dir: str):
    """TPC-H Q1 run ENTIRELY through the SQL frontend: parsed and
    planned onto the combiner Reducer (aggregate expressions for the
    averages), one pruned scan. Oracle = the identical SQL string in
    DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q1, {
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_returnflag", "l_linestatus", "l_quantity",
                           "l_extendedprice", "l_discount", "l_tax",
                           "l_shipdate"]),
    })


_SQL_TPCH_Q6 = """select round(sum(l_extendedprice * l_discount), 2)
                     as revenue,
                   count(*) as n
            from lineitem
            where l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
              and l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
              and l_discount between 0.05 and 0.07
              and l_quantity < 24"""


def _q_sql_tpch_q6(sf_dir: str):
    """TPC-H Q6 (forecast revenue change) through the SQL frontend:
    one pruned scan -> fused vectorized filter -> global aggregate
    (identity-row machinery covers an empty match set). Oracle = the
    identical SQL string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q6, {
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_extendedprice", "l_discount", "l_quantity",
                           "l_shipdate"]),
    })


_REV_UNITS = ("cast(round(l_extendedprice * 100, 0) as bigint) "
              "* (100 - cast(round(l_discount * 100, 0) as bigint))")

_SQL_TPCH_Q7 = f"""select supp_nation, cust_nation, l_year,
       round(sum(volume) / 10000.0, 4) as revenue
from (
  select n1.n_name as supp_nation, n2.n_name as cust_nation,
         extract(year from l_shipdate) as l_year,
         {_REV_UNITS} as volume
  from supplier
  join lineitem on s_suppkey = l_suppkey
  join orders on o_orderkey = l_orderkey
  join customer on c_custkey = o_custkey
  join nation n1 on s_nationkey = n1.n_nationkey
  join nation n2 on c_nationkey = n2.n_nationkey
  where ((n1.n_name = 'NATION_3' and n2.n_name = 'NATION_7')
      or (n1.n_name = 'NATION_7' and n2.n_name = 'NATION_3'))
    and l_shipdate between timestamp '1996-01-01'
                       and timestamp '1999-12-31'
) as shipping
group by supp_nation, cust_nation, l_year
order by supp_nation asc, cust_nation asc, l_year asc"""


def _q_sql_tpch_q7(sf_dir: str):
    """TPC-H Q7 (volume shipping) through the SQL frontend: a SELF-
    JOINED dimension (nation n1 / n2 — the scope-resolution pass
    physically renames n2's colliding columns and rewrites the
    qualified references), EXTRACT(YEAR), an OR-of-ANDs cross-side
    predicate, a derived table in FROM, and integer-exact revenue.
    Oracle = the identical SQL string in DuckDB. (The synthetic
    l_shipdate range replaces TPC-H's 1995–1996 window; nation
    constants map to the synthetic domain.)"""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q7, {
        "supplier": _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_orderkey", "l_suppkey", "l_extendedprice",
                           "l_discount", "l_shipdate"]),
        "orders": _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        "customer": _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        "nation": _read(sf_dir, "nation", ["n_nationkey", "n_name"]),
    })


_SQL_TPCH_Q8 = f"""select o_year,
       round(sum(case when nation = 'NATION_3' then volume else 0 end)
             * 1.0 / sum(volume), 6) as mkt_share
from (
  select extract(year from o_orderdate) as o_year,
         {_REV_UNITS} as volume,
         n2.n_name as nation
  from part
  join lineitem on p_partkey = l_partkey
  join supplier on s_suppkey = l_suppkey
  join orders on l_orderkey = o_orderkey
  join customer on o_custkey = c_custkey
  join nation n1 on c_nationkey = n1.n_nationkey
  join region on n1.n_regionkey = r_regionkey
  join nation n2 on s_nationkey = n2.n_nationkey
  where r_name = 'AMERICA'
    and o_orderdate between timestamp '1996-01-01'
                        and timestamp '1999-12-31'
    and p_type = 'ECONOMY'
) as all_nations
group by o_year
order by o_year asc"""


def _q_sql_tpch_q8(sf_dir: str):
    """TPC-H Q8 (national market share) through the SQL frontend: an
    EIGHT-table join chain with nation joined twice (alias scoping +
    physical rename), CASE inside SUM, and a ratio of two aggregates
    over a derived table. Oracle = the identical SQL string in
    DuckDB. ('ECONOMY' stands in for the p_type class; region/nation
    constants map to the synthetic domain.)"""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q8, {
        "part": _read(sf_dir, "part", ["p_partkey", "p_type"]),
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_partkey", "l_suppkey", "l_orderkey",
                           "l_extendedprice", "l_discount"]),
        "supplier": _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        "orders": _read(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_orderdate"]),
        "customer": _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        "nation": _read(sf_dir, "nation",
                        ["n_nationkey", "n_name", "n_regionkey"]),
        "region": _read(sf_dir, "region", ["r_regionkey", "r_name"]),
    })


_SQL_TPCH_Q12 = """select l_returnflag,
  cast(sum(case when o_orderpriority = '1-URGENT'
            or o_orderpriority = '2-HIGH'
       then 1 else 0 end) as bigint) as high_line_count,
  cast(sum(case when o_orderpriority <> '1-URGENT'
            and o_orderpriority <> '2-HIGH'
       then 1 else 0 end) as bigint) as low_line_count
from orders join lineitem on o_orderkey = l_orderkey
where l_returnflag in ('A', 'N')
  and l_quantity < 10
  and l_shipdate >= timestamp '1997-01-01'
  and l_shipdate < timestamp '1998-01-01'
group by l_returnflag
order by l_returnflag asc"""


def _q_sql_tpch_q12(sf_dir: str):
    """TPC-H Q12 (shipping modes / order priority) through the SQL
    frontend: join + IN-list + two CASE-gated conditional SUMs riding
    one combiner exchange. Oracle = the identical SQL string in
    DuckDB. (The synthetic lineitem has no l_shipmode/commitdate —
    l_returnflag and l_quantity stand in, shape preserved.)"""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q12, {
        "orders": _read(sf_dir, "orders",
                        ["o_orderkey", "o_orderpriority"]),
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_orderkey", "l_returnflag", "l_quantity",
                           "l_shipdate"]),
    })


_SQL_TPCH_Q13 = """select c_count, count(*) as custdist
from (
  select c_custkey, count(o_orderkey) as c_count
  from customer left outer join orders
    on c_custkey = o_custkey and o_orderpriority <> '5-LOW'
  group by c_custkey
) as c_orders
group by c_count
order by custdist desc, c_count desc"""


def _q_sql_tpch_q13(sf_dir: str):
    """TPC-H Q13 (customer order-count distribution) through the SQL
    frontend: LEFT OUTER JOIN with a non-key residual ON conjunct
    (pushed to the null-supplying side pre-join), COUNT(col) counting
    matches only, and a second aggregation over the derived table.
    Oracle = the identical SQL string in DuckDB. (o_orderpriority
    stands in for TPC-H's o_comment NOT LIKE filter.)"""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q13, {
        "customer": _read(sf_dir, "customer", ["c_custkey"]),
        "orders": _read(sf_dir, "orders",
                        ["o_custkey", "o_orderkey", "o_orderpriority"]),
    })


_SQL_TPCH_Q15 = f"""with revenue as (
  select l_suppkey as supplier_no,
         sum({_REV_UNITS}) as total_units
  from lineitem
  where l_shipdate >= timestamp '1997-01-01'
    and l_shipdate < timestamp '1997-07-01'
  group by l_suppkey)
select s_suppkey, s_name,
       round(total_units / 10000.0, 4) as total_revenue
from supplier join revenue on s_suppkey = supplier_no
where total_units = (select max(total_units) as m from revenue)
order by s_suppkey asc"""


def _q_sql_tpch_q15(sf_dir: str):
    """TPC-H Q15 (top supplier) through the SQL frontend: the revenue
    VIEW as a CTE referenced twice (grouped combiner aggregate), an
    uncorrelated scalar MAX subquery folded to a literal, and a join
    back to supplier. Oracle = the identical SQL string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q15, {
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_suppkey", "l_extendedprice", "l_discount",
                           "l_shipdate"]),
        "supplier": _read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
    })


_SQL_TPCH_Q19 = f"""select round(sum({_REV_UNITS}) / 10000.0, 4)
  as revenue
from lineitem join part on p_partkey = l_partkey
where (p_brand = 'Brand#12' and p_size between 1 and 5
       and l_quantity >= 1 and l_quantity <= 11)
   or (p_brand = 'Brand#23' and p_size between 1 and 10
       and l_quantity >= 10 and l_quantity <= 20)
   or (p_brand = 'Brand#3' and p_size between 1 and 15
       and l_quantity >= 20 and l_quantity <= 30)"""


def _q_sql_tpch_q19(sf_dir: str):
    """TPC-H Q19 (discounted revenue) through the SQL frontend: the
    three OR'd AND-groups evaluate as one fused vectorized post-join
    filter; the ON clause lists the RIGHT table's key first (schema-
    aware key-side orientation). Oracle = the identical SQL string in
    DuckDB. (p_size stands in for p_container; no l_shipmode in the
    synthetic lineitem.)"""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q19, {
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_partkey", "l_quantity", "l_extendedprice",
                           "l_discount"]),
        "part": _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]),
    })


_SQL_TPCH_Q21 = """select s_name, count(*) as numwait
from supplier
join lineitem l1 on s_suppkey = l1.l_suppkey
join orders on o_orderkey = l1.l_orderkey
join nation on s_nationkey = n_nationkey
where o_orderstatus = 'F'
  and l1.l_returnflag = 'R'
  and exists (select * from lineitem l2
              where l2.l_orderkey = l1.l_orderkey
                and l2.l_suppkey <> l1.l_suppkey)
  and not exists (select * from lineitem l3
                  where l3.l_orderkey = l1.l_orderkey
                    and l3.l_suppkey <> l1.l_suppkey
                    and l3.l_returnflag = 'R')
  and n_name = 'NATION_3'
group by s_name
order by numwait desc, s_name asc
limit 100"""


def _q_sql_tpch_q21(sf_dir: str):
    """TPC-H Q21 (suppliers who kept orders waiting) through the SQL
    frontend: qualified outer references (l1/l2/l3 aliases) resolve to
    explicit outer-column markers, and BOTH the <>-correlated EXISTS
    and NOT EXISTS decorrelate to a grouped MIN/MAX per orderkey
    left-joined back — no per-row re-execution, no fan-out join.
    Oracle = the identical SQL string in DuckDB. (l_returnflag = 'R'
    stands in for l_receiptdate > l_commitdate.)"""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q21, {
        "supplier": _read(sf_dir, "supplier",
                          ["s_suppkey", "s_name", "s_nationkey"]),
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_orderkey", "l_suppkey", "l_returnflag"]),
        "orders": _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]),
        "nation": _read(sf_dir, "nation", ["n_nationkey", "n_name"]),
    })


_SQL_TPCH_Q18 = """select c_name, c_custkey, o_orderkey, o_orderdate,
       o_totalprice, cast(sum(l_quantity) as bigint) as sum_qty
from customer
join orders on c_custkey = o_custkey
join lineitem on o_orderkey = l_orderkey
where o_orderkey in (select l_orderkey from lineitem
                     group by l_orderkey having sum(l_quantity) > 150)
group by c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
order by o_totalprice desc, o_orderkey asc
limit 100"""


def _q_sql_tpch_q18(sf_dir: str):
    """TPC-H Q18 (large-volume customers) through the SQL frontend: an
    uncorrelated IN over a grouped+HAVING subquery binds to a
    broadcast value set (combiner aggregate -> ray.put semi-join),
    then a three-table join and a five-key grouped SUM with top-100.
    Oracle = the identical SQL string in DuckDB (threshold 150 suits
    the synthetic quantity distribution; with the 17 frontend queries
    this closes every TPC-H query expressible without partsupp)."""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q18, {
        "customer": _read(sf_dir, "customer", ["c_custkey", "c_name"]),
        "orders": _read(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_orderdate",
                         "o_totalprice"]),
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_orderkey", "l_quantity"]),
    })


# the synthetic schema ships no partsupp table; the five remaining
# TPC-H queries derive one DETERMINISTICALLY from lineitem as a CTE —
# the IDENTICAL string runs in DuckDB, so the oracle contract holds
_PS_CTE = """partsupp as (
  select l_partkey as ps_partkey, l_suppkey as ps_suppkey,
         count(*) as ps_availqty,
         round(min(l_extendedprice) / 10.0, 2) as ps_supplycost
  from lineitem
  group by l_partkey, l_suppkey)"""

_SQL_TPCH_Q2 = f"""with {_PS_CTE},
ps_eur as (
  select ps_partkey, ps_supplycost, s_suppkey, s_name, s_acctbal, n_name
  from partsupp
  join supplier on ps_suppkey = s_suppkey
  join nation on s_nationkey = n_nationkey
  join region on n_regionkey = r_regionkey
  where r_name = 'EUROPE')
select s_acctbal, s_name, n_name, p_partkey, p_brand
from part
join ps_eur on p_partkey = ps_partkey
where p_size = 15
  and ps_supplycost = (select min(ps_supplycost) as m from ps_eur
                       where ps_partkey = p_partkey)
order by s_acctbal desc, n_name asc, s_name asc, p_partkey asc
limit 100"""


def _q_sql_tpch_q2(sf_dir: str):
    """TPC-H Q2 (minimum-cost supplier) through the SQL frontend: the
    region-filtered part-supplier relation as a CTE referenced twice,
    with the correlated MIN scalar subquery decorrelated to a grouped
    aggregate left-joined back (Q17 machinery). Oracle = the identical
    SQL string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q2, {
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_partkey", "l_suppkey", "l_extendedprice"]),
        "supplier": _read(sf_dir, "supplier",
                          ["s_suppkey", "s_name", "s_acctbal",
                           "s_nationkey"]),
        "nation": _read(sf_dir, "nation",
                        ["n_nationkey", "n_name", "n_regionkey"]),
        "region": _read(sf_dir, "region", ["r_regionkey", "r_name"]),
        "part": _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]),
    })


_SQL_TPCH_Q9 = f"""with {_PS_CTE}
select nation, o_year, round(sum(amount) / 10000.0, 4) as sum_profit
from (
  select n_name as nation, extract(year from o_orderdate) as o_year,
         cast(round(l_extendedprice * 100, 0) as bigint)
           * (100 - cast(round(l_discount * 100, 0) as bigint))
           - cast(round(ps_supplycost * 100, 0) as bigint)
             * cast(l_quantity as bigint) * 100 as amount
  from lineitem
  join part on p_partkey = l_partkey
  join supplier on s_suppkey = l_suppkey
  join partsupp on ps_suppkey = l_suppkey and ps_partkey = l_partkey
  join orders on o_orderkey = l_orderkey
  join nation on s_nationkey = n_nationkey
  where p_name like '%ring%'
) as profit
group by nation, o_year
order by nation asc, o_year desc"""


def _q_sql_tpch_q9(sf_dir: str):
    """TPC-H Q9 (product-type profit) through the SQL frontend: a
    six-way join incl. the two-key partsupp join (ON keys listed
    right-column-first — schema orientation), LIKE filter,
    EXTRACT(YEAR), integer-exact profit arithmetic over a derived
    table. Oracle = the identical SQL string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q9, {
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_partkey", "l_suppkey", "l_orderkey",
                           "l_extendedprice", "l_discount", "l_quantity"]),
        "part": _read(sf_dir, "part", ["p_partkey", "p_name"]),
        "supplier": _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        "orders": _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]),
        "nation": _read(sf_dir, "nation", ["n_nationkey", "n_name"]),
    })


_SQL_TPCH_Q11 = f"""with {_PS_CTE},
natps as (
  select ps_partkey, ps_supplycost, ps_availqty
  from partsupp join supplier on ps_suppkey = s_suppkey
  join nation on s_nationkey = n_nationkey
  where n_name = 'NATION_3')
select ps_partkey, round(sum(ps_supplycost * ps_availqty), 2) as value
from natps
group by ps_partkey
having sum(ps_supplycost * ps_availqty) > (
  select sum(ps_supplycost * ps_availqty) * 1.5
         / count(distinct ps_partkey) as thr from natps)
order by value desc, ps_partkey asc"""


def _q_sql_tpch_q11(sf_dir: str):
    """TPC-H Q11 (important stock) through the SQL frontend: the
    nation-filtered stock CTE referenced twice; HAVING compares a
    grouped aggregate against an UNCORRELATED scalar subquery folded
    to a literal at bind time. Oracle = the identical SQL string in
    DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q11, {
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_partkey", "l_suppkey", "l_extendedprice"]),
        "supplier": _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        "nation": _read(sf_dir, "nation", ["n_nationkey", "n_name"]),
    })


_SQL_TPCH_Q16 = f"""with {_PS_CTE}
select p_brand, p_type, p_size,
       count(distinct ps_suppkey) as supplier_cnt
from partsupp
join part on p_partkey = ps_partkey
where p_brand <> 'Brand#1'
  and p_type not like 'MEDIUM%'
  and p_size in (1, 5, 9, 14, 20, 26, 33, 41)
  and ps_suppkey not in (select s_suppkey from supplier
                         where s_acctbal < 700)
group by p_brand, p_type, p_size
order by supplier_cnt desc, p_brand asc, p_type asc, p_size asc"""


def _q_sql_tpch_q16(sf_dir: str):
    """TPC-H Q16 (supplier relationship) through the SQL frontend:
    NOT LIKE + IN-list filters, uncorrelated NOT IN broadcast
    anti-set, and exact COUNT(DISTINCT) per group. Oracle = the
    identical SQL string in DuckDB (s_acctbal < 700 stands in for the
    comment-pattern exclusion)."""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q16, {
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_partkey", "l_suppkey", "l_extendedprice"]),
        "part": _read(sf_dir, "part",
                      ["p_partkey", "p_brand", "p_type", "p_size"]),
        "supplier": _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]),
    })


_SQL_TPCH_Q20 = f"""with {_PS_CTE}
select s_name, s_acctbal
from supplier
join nation on s_nationkey = n_nationkey
where n_name = 'NATION_3'
  and s_suppkey in (
    select ps_suppkey from partsupp
    where ps_partkey in (select p_partkey from part
                         where p_name like 'hot%')
      and ps_availqty * 13 > (select 0.5 * sum(l_quantity) as thr
                         from lineitem
                         where l_partkey = ps_partkey
                           and l_suppkey = ps_suppkey))
order by s_name asc"""


def _q_sql_tpch_q20(sf_dir: str):
    """TPC-H Q20 (potential part promotion) through the SQL frontend:
    THREE nested subquery levels — an uncorrelated IN whose body holds
    another uncorrelated IN (LIKE-filtered parts) plus a TWO-KEY
    correlated scalar SUM decorrelated to a grouped aggregate join.
    Oracle = the identical SQL string in DuckDB (the *13 factor keeps
    the derived ps_availqty comparable to half the line quantity)."""
    from datavec_ray.sql import sql

    return sql(_SQL_TPCH_Q20, {
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_partkey", "l_suppkey", "l_quantity",
                           "l_extendedprice"]),
        "supplier": _read(sf_dir, "supplier",
                          ["s_suppkey", "s_name", "s_acctbal",
                           "s_nationkey"]),
        "nation": _read(sf_dir, "nation", ["n_nationkey", "n_name"]),
        "part": _read(sf_dir, "part", ["p_partkey", "p_name"]),
    })


_SQL_FILTER = """select l_returnflag, count(*) as n,
                   count(*) filter (where l_quantity > 25) as heavy,
                   min(l_extendedprice) filter (where l_discount = 0)
                     as lo_nodisc
            from lineitem
            group by l_returnflag
            order by l_returnflag asc"""


def _q_sql_filter(sf_dir: str):
    """SQL frontend: aggregate FILTER (WHERE ...) clauses — gated
    inputs null-masked map-side (CASE WHEN c THEN x END), so the
    conditional aggregates ride the SAME combiner exchange as the
    unconditional ones. Oracle = the identical SQL string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_FILTER, {
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_returnflag", "l_quantity", "l_extendedprice",
                           "l_discount"]),
    })


def _q_sql_cube(sf_dir: str):
    """SQL frontend: GROUP BY CUBE planned onto misc.rollup_agg — all
    2^k grouping sets in ONE map-side-combined pass (AVG as an exact
    int Sum/Count pair divided post-aggregation). Oracle = the
    identical SQL string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_CUBE, {
        "documents": _read(sf_dir, "documents",
                           ["lang", "source", "n_chars"]),
    })


def _q_sql_case(sf_dir: str):
    """SQL frontend: CASE WHEN, scalar functions (lower/length),
    and a derived-table subquery, planned onto fused map_batches
    projections + the combiner Reducer. Oracle = the identical SQL
    string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_CASE, {
        "orders": _read(sf_dir, "orders",
                        ["o_totalprice", "o_orderstatus",
                         "o_orderpriority"]),
    })


def _q_sql_groupby(sf_dir: str):
    """SQL frontend end to end (datavec_ray/sql.py): the statement is
    parsed and planned onto map_batches + the combiner-backed Reducer;
    the ORACLE IS THE SAME SQL STRING run by DuckDB — the strongest
    possible parity check for a query surface."""
    from datavec_ray.sql import sql

    return sql(_SQL_GROUPBY, {
        "lineitem": _read(sf_dir, "lineitem",
                          ["l_returnflag", "l_linestatus", "l_quantity",
                           "l_discount"]),
    })


def _q_sql_join(sf_dir: str):
    """SQL frontend: two INNER joins (auto broadcast) + OR'd LIKE
    predicates + grouped aggregates, planned onto JoinStep + Reducer.
    Oracle = the identical SQL string in DuckDB."""
    from datavec_ray.sql import sql

    return sql(_SQL_JOIN, {
        "orders": _read(sf_dir, "orders",
                        ["o_custkey", "o_orderpriority", "o_totalprice"]),
        "customer": _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        "nation": _read(sf_dir, "nation", ["n_nationkey", "n_name"]),
    })


def _q_tpch_q18(sf_dir: str):
    """TPC-H Q18 (large-volume customers): HAVING over a grouped sum —
    lineitem reduces to per-order quantity through the map-side
    combiner, the small qualifying set (sum > 180) broadcast-joins back
    to orders, then customer. The composition the reference expresses
    as reduce → filter-on-aggregate → two joins; integer-exact sums."""
    from datavec_ray import TransformPipeline
    from datavec_ray.conditions import ColumnCondition
    from datavec_ray.join import JoinStep
    from datavec_ray.reduce import Reducer
    from datavec_ray.steps import (ConditionFilter, ConvertToLong,
                                   KeepColumns)

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    lp = TransformPipeline(_schema_of(sf_dir, "lineitem").select(
        ["l_orderkey", "l_quantity"]))
    lp.add(ConvertToLong("l_quantity"))
    lp.add(Reducer(["l_orderkey"], [["l_quantity", "Sum", "sum_qty"]]))
    lp.add(ConditionFilter(ColumnCondition("sum_qty", "LessOrEqual", 180)))

    ocols = ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    orders = _read(sf_dir, "orders", ocols)
    p = TransformPipeline(_schema_of(sf_dir, "orders").select(ocols))
    p.add(JoinStep(lambda: lp.execute(li), ["o_orderkey"],
                   ["l_orderkey"], "Inner"))
    p.add(JoinStep(lambda: _read(sf_dir, "customer",
                                 ["c_custkey", "c_name"]),
                   ["o_custkey"], ["c_custkey"], "Inner"))
    p.add(KeepColumns(["c_name", "o_custkey", "o_orderkey",
                       "o_orderdate", "o_totalprice", "sum_qty"]))
    return p.execute(orders)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "groupby_agg": _q_groupby_agg,
        "filter_math": _q_filter_math,
        "join_broadcast": _q_join_broadcast,
        "join_shuffle": _q_join_shuffle,
        "rank": _q_rank,
        "pivot": _q_pivot,
        "string_ops": _q_string_ops,
        "categorical_onehot": _q_categorical_onehot,
        "time_derive": _q_time_derive,
        "conditional_replace": _q_conditional_replace,
        "reduce_ops": _q_reduce_ops,
        "normalize": _q_normalize,
        "sequence_diff": _q_sequence_diff,
        "moving_window": _q_moving_window,
        "session_split": _q_session_split,
        "tumbling_window": _q_tumbling_window,
        "cdc_upsert": _q_cdc_upsert,
        "cdc_sql": _q_cdc_sql,
        "cdc_stats": _q_cdc_stats,
        "cdc_merge": _q_cdc_merge,
        "cdc_replicate": _q_cdc_replicate,
        "cdc_aggview": _q_cdc_aggview,
        "cdc_renderview": _q_cdc_renderview,
        "role_transitions": _q_role_transitions,
        "cdc_joinview": _q_cdc_joinview,
        "cdc_topn_view": _q_cdc_topn_view,
        "cdc_delta_lake": _q_cdc_delta_lake,
        "cdc_zonemap": _q_cdc_zonemap,
        "cdc_changefeed": _q_cdc_changefeed,
        "preference_pairs": _q_preference_pairs,
        "conv_dedup": _q_conv_dedup,
        "cdc_timetravel": _q_cdc_timetravel,
        "edit_pairs": _q_edit_pairs,
        "tree_paths": _q_tree_paths,
        "scd2_history": _q_scd2_history,
        "triangle_count": _q_triangle_count,
        "fuzzy_dedup": _q_fuzzy_dedup,
        "cdc_evolve": _q_cdc_evolve,
        "cdc_resume": _q_cdc_resume,
        "cdc_wap": _q_cdc_wap,
        "cdc_autosalt": _q_cdc_autosalt,
        "jdbc_mirror": _q_jdbc_mirror,
        "cdc_repartition": _q_cdc_repartition,
        "cdc_salted": _q_cdc_salted,
        "cdc_dlq": _q_cdc_dlq,
        "cdc_expectations": _q_cdc_expectations,
        "late_events": _q_late_events,
        "windowed_stream": _q_windowed_stream,
        "windowed_distinct": _q_windowed_distinct,
        "stream_join": _q_stream_join,
        "txn_upsert": _q_txn_upsert,
        "cdc_multitable": _q_cdc_multitable,
        "hopping_stream": _q_hopping_stream,
        "session_stream": _q_session_stream,
        "funnel": _q_funnel,
        "cohort_retention": _q_cohort_retention,
        "frequent_tokens": _q_frequent_tokens,
        "grouped_quantile_hist": _q_grouped_quantile_hist,
        "grouped_quantile_cont": _q_grouped_quantile_cont,
        "shuffle_export": _q_shuffle_export,
        "importance_resample": _q_importance_resample,
        "bigram_logprob": _q_bigram_logprob,
        "curation_export": _q_curation_export,
        "exact_dedup": _q_exact_dedup,
        "token_count": _q_token_count,
        "fingerprint": _q_fingerprint,
        "similarity_topk": _q_similarity_topk,
        "text_stats": _q_text_stats,
        "minhash_neardup": _q_minhash_neardup,
        "ngram_jaccard": _q_ngram_jaccard,
        "grouped_topk": _q_grouped_topk,
        "bpe_tokens": _q_bpe_tokens,
        "asof_join": _q_asof_join,
        "range_join": _q_range_join,
        "doc_quality": _q_doc_quality,
        "quality_blend": _q_quality_blend,
        "lang_id": _q_lang_id,
        "cosine_pairs": _q_cosine_pairs,
        "simhash_neardup": _q_simhash_neardup,
        "embedding_neardup": _q_embedding_neardup,
        "hll_distinct": _q_hll_distinct,
        "sequence_offset": _q_sequence_offset,
        "analysis_profile": _q_analysis_profile,
        "string_profile": _q_string_profile,
        "quality_profile": _q_quality_profile,
        "tfidf": _q_tfidf,
        "stem_tokens": _q_stem_tokens,
        "context_windows": _q_context_windows,
        "bpe_subwords": _q_bpe_subwords,
        "ivf_topk": _q_ivf_topk,
        "ivf_upsert": _q_ivf_upsert,
        "pq_topk": _q_pq_topk,
        "ivfpq_topk": _q_ivfpq_topk,
        "ivf_exact": _q_ivf_exact,
        "geo_distance": _q_geo_distance,
        "media_pipeline": _q_media_pipeline,
        "audio_mfcc": _q_audio_mfcc,
        "jdbc_source": _q_jdbc_source,
        "anti_join": _q_anti_join,
        "semi_join": _q_semi_join,
        "grouped_quantile": _q_grouped_quantile,
        "tdigest_quantile": _q_tdigest_quantile,
        "cumulative_sum": _q_cumulative_sum,
        "hash_sample": _q_hash_sample,
        "line_dedup": _q_line_dedup,
        "top_ngrams": _q_top_ngrams,
        "repetition_signals": _q_repetition_signals,
        "normalize_text": _q_normalize_text,
        "dup_clusters": _q_dup_clusters,
        "grouped_topn": _q_grouped_topn,
        "pii_redact": _q_pii_redact,
        "melt": _q_melt,
        "set_except": _q_set_except,
        "set_intersect": _q_set_intersect,
        "distinct_rows": _q_distinct_rows,
        "stratified_sample": _q_stratified_sample,
        "pivot_agg": _q_pivot_agg,
        "window_rank": _q_window_rank,
        "window_ntile": _q_window_ntile,
        "weighted_sample": _q_weighted_sample,
        "group_normalize": _q_group_normalize,
        "chunk_words": _q_chunk_words,
        "sentences": _q_sentences,
        "corpus_mix": _q_corpus_mix,
        "pack_shards": _q_pack_shards,
        "decontaminate": _q_decontaminate,
        "kmeans_clusters": _q_kmeans_clusters,
        "semantic_dedup": _q_semantic_dedup,
        "substring_dedup": _q_substring_dedup,
        "dedup_against": _q_dedup_against,
        "orc_source": _q_orc_source,
        "range_window": _q_range_window,
        "unigram_logprob": _q_unigram_logprob,
        "bm25": _q_bm25,
        "sessionize": _q_sessionize,
        "rollup": _q_rollup,
        "json_extract": _q_json_extract,
        "regex_extract": _q_regex_extract,
        "html_extract": _q_html_extract,
        "url_extract": _q_url_extract,
        "blocklist_tag": _q_blocklist_tag,
        "warc_source": _q_warc_source,
        "ewma": _q_ewma,
        "pagerank": _q_pagerank,
        "web_pipeline": _q_web_pipeline,
        "hashing_vectorize": _q_hashing_vectorize,
        "quality_classifier": _q_quality_classifier,
        "render_transcripts": _q_render_transcripts,
        "pagerank_personalized": _q_pagerank_personalized,
        "role_alternation": _q_role_alternation,
        "ffill_tool": _q_ffill_tool,
        "merge_intervals": _q_merge_intervals,
        "fuzzy_pairs": _q_fuzzy_pairs,
        "key_skew": _q_key_skew,
        "grouped_mode": _q_grouped_mode,
        "grouped_top_values": _q_grouped_top_values,
        "tool_cooccurrence": _q_tool_cooccurrence,
        "turn_offsets": _q_turn_offsets,
        "negative_samples": _q_negative_samples,
        "grouped_corr": _q_grouped_corr,
        "grouped_moments": _q_grouped_moments,
        "grouped_geomean": _q_grouped_geomean,
        "cdc_digest": _q_cdc_digest,
        "robust_scale": _q_robust_scale,
        "benford": _q_benford,
        "cube": _q_cube,
        "zorder": _q_zorder,
        "cdc_lineage": _q_cdc_lineage,
        "skew_join": _q_skew_join,
        "cross_join": _q_cross_join,
        "cdc_copart_join": _q_cdc_copart_join,
        "jaccard_against": _q_jaccard_against,
        "minhash_against": _q_minhash_against,
        "grouped_entropy": _q_grouped_entropy,
        "time_resample": _q_time_resample,
        "mad_outliers": _q_mad_outliers,
        "compression_signal": _q_compression_signal,
        "patch_upsert": _q_patch_upsert,
        "winsorize": _q_winsorize,
        "quantile_bucket": _q_quantile_bucket,
        "embedding_cov": _q_embedding_cov,
        "expectations": _q_expectations,
        "embedding_pca": _q_embedding_pca,
        "pairwise_corr": _q_pairwise_corr,
        "grouped_linreg": _q_grouped_linreg,
        "tpch_q3": _q_tpch_q3,
        "tpch_q5": _q_tpch_q5,
        "tpch_q10": _q_tpch_q10,
        "tpch_q14": _q_tpch_q14,
        "tpch_q18": _q_tpch_q18,
        "sql_groupby": _q_sql_groupby,
        "sql_join": _q_sql_join,
        "sql_case": _q_sql_case,
        "sql_window": _q_sql_window,
        "sql_union": _q_sql_union,
        "sql_cube": _q_sql_cube,
        "sql_filter": _q_sql_filter,
        "sql_insub": _q_sql_insub,
        "sql_outerjoin": _q_sql_outerjoin,
        "sql_exists": _q_sql_exists,
        "sql_lag": _q_sql_lag,
        "sql_winagg": _q_sql_winagg,
        "sql_frames": _q_sql_frames,
        "sql_range_frame": _q_sql_range_frame,
        "sql_tpch_q17": _q_sql_tpch_q17,
        "sql_tpch_q3": _q_sql_tpch_q3,
        "sql_tpch_q4": _q_sql_tpch_q4,
        "sql_tpch_q5": _q_sql_tpch_q5,
        "sql_tpch_q22": _q_sql_tpch_q22,
        "sql_tpch_q10": _q_sql_tpch_q10,
        "sql_tpch_q14": _q_sql_tpch_q14,
        "sql_recursive": _q_sql_recursive,
        "sql_groupexpr": _q_sql_groupexpr,
        "sql_tpch_q1": _q_sql_tpch_q1,
        "sql_tpch_q6": _q_sql_tpch_q6,
        "sql_tpch_q7": _q_sql_tpch_q7,
        "sql_tpch_q8": _q_sql_tpch_q8,
        "sql_tpch_q12": _q_sql_tpch_q12,
        "sql_tpch_q13": _q_sql_tpch_q13,
        "sql_tpch_q15": _q_sql_tpch_q15,
        "sql_tpch_q19": _q_sql_tpch_q19,
        "sql_tpch_q21": _q_sql_tpch_q21,
        "sql_tpch_q18": _q_sql_tpch_q18,
        "sql_tpch_q2": _q_sql_tpch_q2,
        "sql_tpch_q9": _q_sql_tpch_q9,
        "sql_tpch_q11": _q_sql_tpch_q11,
        "sql_tpch_q16": _q_sql_tpch_q16,
        "sql_tpch_q20": _q_sql_tpch_q20,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB, same column names as the Ray results)
# ---------------------------------------------------------------------------

_BINLOG_CTE = """
with b as (
  select event_id as lsn,
         case when event_type = 'click' then 'U'
              when event_type = 'purchase' then 'D' else 'I' end as op,
         'conv-' || cast(user_id as varchar) as conv_id,
         cast(event_id - (event_id // 16) * 16 as int) as turn_idx,
         ts
       , event_type, props
  from events
), e as (
  select lsn, op, conv_id, turn_idx,
         case when op = 'D' then null
              when turn_idx - (turn_idx // 2) * 2 = 0 then 'user'
              else 'assistant' end as role,
         case when op = 'D' then null else props end as text,
         case when op = 'D' then null else event_type end as tool,
         epoch_ms(date_trunc('milliseconds', ts)) as ts_ms
  from b
)
"""


def _repetition_sql(wpl: int = 10, top_ns=(2, 3, 4),
                    dup_ns=(5, 10)) -> str:
    """Oracle for ``repetition_signals``: every numerator/denominator
    mirrored term for term (exact integer sums, one divide, round 6)."""
    all_ns = sorted(set(top_ns) | set(dup_ns))
    ctes = [f"""
with toks as (
  select doc_id,
         list_filter(string_split(coalesce(text, ''), ' '),
                     x -> x <> '') as ws
  from documents
), w as (
  select doc_id, unnest(ws) as w, generate_subscripts(ws, 1) as i
  from toks
), base as (
  select doc_id, count(*) as n_words,
         cast(sum(length(w)) + count(*) - 1 as bigint) as total_chars
  from w group by doc_id
), lines as (
  select doc_id, (i - 1) // {wpl} as li,
         cast(sum(length(w)) + count(*) - 1 as bigint) as L,
         string_agg(w, ' ' order by i) as line
  from w group by doc_id, (i - 1) // {wpl}
), lg as (
  select doc_id, line, count(*) as k, max(L) as L
  from lines group by doc_id, line
), lstats as (
  select doc_id, cast(sum(k) as bigint) as n_lines,
         sum(k - 1) as dup_lines,
         sum((k - 1) * L) as dup_chars,
         sum(k * L) as tot_lchars
  from lg group by doc_id
)"""]
    for n in all_ns:
        gram = " || ' ' || ".join(
            ["w"] + [f"lead(w, {j}) over win" for j in range(1, n)])
        ctes.append(f""", g{n} as (
  select doc_id, gram, count(*) as k,
         cast(max(length(gram)) as bigint) as L
  from (select doc_id, {gram} as gram,
               lead(w, {n - 1}) over win as last_w
        from w window win as (partition by doc_id order by i))
  where last_w is not null
  group by doc_id, gram
)""")
        if n in top_ns:
            ctes.append(f""", top{n} as (
  select doc_id, k * L as top_num
  from (select doc_id, k, L, row_number() over
          (partition by doc_id order by k desc, gram asc) as rn
        from g{n})
  where rn = 1
)""")
        if n in dup_ns:
            ctes.append(f""", dup{n} as (
  select doc_id, sum((k - 1) * L) as dup_num from g{n} group by doc_id
)""")
    sel = ["""
select d.doc_id,
       cast(coalesce(b.n_words, 0) as bigint) as n_words,
       cast(coalesce(ls.n_lines, 0) as bigint) as n_lines,
       round(coalesce(ls.dup_lines * 1.0 / ls.n_lines, 0.0), 6)
           as dup_line_frac,
       round(coalesce(ls.dup_chars * 1.0 / ls.tot_lchars, 0.0), 6)
           as dup_line_char_frac"""]
    joins = ["""
from documents d
left join base b using (doc_id)
left join lstats ls using (doc_id)"""]
    for n in all_ns:
        if n in top_ns:
            sel.append(f""",
       round(coalesce(t{n}.top_num * 1.0 / b.total_chars, 0.0), 6)
           as top{n}gram_char_frac""")
            joins.append(f"\nleft join top{n} t{n} using (doc_id)")
        if n in dup_ns:
            sel.append(f""",
       round(coalesce(d{n}.dup_num * 1.0 / b.total_chars, 0.0), 6)
           as dup{n}gram_char_frac""")
            joins.append(f"\nleft join dup{n} d{n} using (doc_id)")
    return "".join(ctes) + "".join(sel) + "".join(joins)


# the exact RE2 pattern strings the Ray-side redact_pii applies, in
# order — shared verbatim with the SQL oracle (both engines are RE2)
def _pii_sql_patterns() -> list[str]:
    from datavec_ray.ops.textstats import PII_PATTERNS
    return [p for _, p, _ in PII_PATTERNS]


_PII_SQL = _pii_sql_patterns()


def _splitmix_mul_sql(x: str, c: int) -> str:
    """SQL for ``(x * c) mod 2^64`` with x < 2^64: the 64x64 multiply is
    decomposed into 32-bit halves so no intermediate exceeds int128
    (DuckDB hugeint overflows on a direct 64x64 product)."""
    c0, c1 = c % (1 << 32), c >> 32
    return (f"((({x}) % 4294967296) * {c0}"
            f" + (((({x}) // 4294967296) * {c0}"
            f" + (({x}) % 4294967296) * {c1}) % 4294967296)"
            f" * 4294967296) % 18446744073709551616")


def oracle_sql() -> dict[str, str]:
    from datavec_ray.steps.nlp import STOP_WORDS
    _sw = ", ".join("'" + w.replace("'", "''") + "'"
                    for w in sorted(STOP_WORDS))
    return {
        "stem_tokens": f"""
            with tok as (
              select unnest(list_filter(
                       string_split(lower(coalesce(text, '')), ' '),
                       x -> x <> '')) as tok
              from documents where doc_id < 200
            ), kept as (
              select tok from tok where tok not in ({_sw})
            ), st as (
              select regexp_replace(regexp_replace(regexp_replace(
                     regexp_replace(regexp_replace(regexp_replace(
                       tok, '^s$', ''), '([^s])s$', '\\1'), '\\.$', ''),
                       'ed$', ''), 'ing$', ''), 'ly$', '') as stem
              from kept
            )
            select stem, count(*) as n from st group by stem
            order by n desc, stem asc limit 30""",
        "context_windows": """
            with toks as (
              select doc_id,
                     list_filter(string_split(coalesce(text, ''), ' '),
                                 x -> x <> '') as w
              from documents where doc_id < 40
            ), e as (
              select doc_id, w,
                     unnest(generate_series(1, len(w))) as i
              from toks
            )
            select doc_id, cast(i - 1 as bigint) as seq_pos,
                   w[i] as focus,
                   array_to_string(list_transform(
                     generate_series(i - 2, i + 2),
                     j -> case when j < 1 then '<s>'
                               when j > len(w) then '</s>'
                               else w[j] end), ' ') as window_str
            from e""",
        "jdbc_source": """
            select n_nationkey, n_name, n_regionkey
            from nation
            where n_regionkey < 3
            order by n_nationkey
        """,
        "orc_source": """
            select c_nationkey,
                   count(c_acctbal) as n_customers,
                   min(c_acctbal) as min_acctbal,
                   max(c_acctbal) as max_acctbal
            from customer
            where c_acctbal > 0
            group by c_nationkey
        """,
        "analysis_profile": """
            with cols as (
                select 'l_quantity' as "column", l_quantity as v from lineitem
                union all
                select 'l_extendedprice', l_extendedprice from lineitem
                union all
                select 'l_discount', l_discount from lineitem
            )
            select "column",
                   count(v) as n,
                   count(*) - count(v) as n_missing,
                   count(*) filter (where v = 0) as n_zero,
                   count(*) filter (where v > 0) as n_positive,
                   count(*) filter (where v < 0) as n_negative,
                   round(min(v), 4) as vmin,
                   round(max(v), 4) as vmax,
                   round(avg(v), 4) as vmean,
                   round(stddev_samp(v), 4) as vstdev
            from cols group by "column"
        """,
        "string_profile": """
            with cols as (
                select 'l_returnflag' as "column", l_returnflag as v from lineitem
                union all
                select 'l_linestatus', l_linestatus from lineitem
            )
            select "column",
                   count(v) as n,
                   count(*) - count(v) as n_missing,
                   count(*) filter (where v = '') as n_empty,
                   count(*) filter (where regexp_full_match(v, '[A-Za-z]+'))
                       as n_alpha,
                   count(*) filter (where regexp_full_match(v, '[0-9]+'))
                       as n_numeric,
                   min(length(v)) as len_min,
                   max(length(v)) as len_max,
                   round(avg(length(v)), 4) as len_mean
            from cols group by "column"
        """,
        "quality_profile": """
            select 'l_quantity' as "column", count(*) as count_total,
                   count(*) filter (where l_quantity is null)
                       as count_missing,
                   count(*) filter (where l_quantity is not null and
                       (isnan(l_quantity) or l_quantity < 0
                        or l_quantity > 50)) as count_invalid,
                   count(*) filter (where l_quantity is not null and
                       not isnan(l_quantity) and l_quantity >= 0
                       and l_quantity <= 50) as count_valid
            from lineitem
            union all
            select 'l_discount', count(*),
                   count(*) filter (where l_discount is null),
                   count(*) filter (where l_discount is not null and
                       (isnan(l_discount) or l_discount < 0
                        or l_discount > 0.05)),
                   count(*) filter (where l_discount is not null and
                       not isnan(l_discount) and l_discount >= 0
                       and l_discount <= 0.05)
            from lineitem
            union all
            select 'l_returnflag', count(*),
                   count(*) filter (where l_returnflag is null),
                   count(*) filter (where l_returnflag is not null and
                       not regexp_full_match(l_returnflag, '[ANR]')),
                   count(*) filter (where l_returnflag is not null and
                       regexp_full_match(l_returnflag, '[ANR]'))
            from lineitem
        """,
        "tfidf": """
            with tok as (
                select doc_id,
                       unnest(regexp_extract_all(lower(text), '[0-9a-z_'']+'))
                           as term
                from documents
            ),
            df as (
                select term, count(distinct doc_id) as df
                from tok group by term
            ),
            n as (select count(*) as n_docs from documents),
            vocab as (
                select term, df from df
                order by df desc, term asc
                limit 256
            ),
            tf as (
                select doc_id, term, count(*) as tf
                from tok group by doc_id, term
            )
            select t.doc_id, t.term,
                   round(t.tf * (ln((n.n_docs + 1.0) / (v.df + 1.0)) + 1.0), 4)
                       as tfidf
            from tf t
            join vocab v using (term)
            cross join n
        """,
        "geo_distance": """
            with c as (
                select event_id,
                       (value - floor(value)) * 180 - 90 as lat,
                       ((user_id % 10000) / 10000.0) * 360 - 180 as lon
                from events
            ), h as (
                select event_id,
                       least(1.0, greatest(0.0,
                           pow(sin(radians(lon - lat) / 2), 2)
                           + cos(radians(lat)) * cos(radians(lon))
                             * pow(sin(radians(lat - lon) / 2), 2))) as a
                from c
            )
            select event_id,
                   cast(round(2 * 6371000 * atan2(sqrt(a), sqrt(1 - a)), 0)
                        as bigint) as dist_m
            from h
        """,
        "groupby_agg": """
            select l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) as sum_qty,
                   round(sum(l_extendedprice), 4) as sum_price,
                   round(avg(l_extendedprice * l_quantity), 4) as avg_gross,
                   count(*) as n
            from lineitem
            where l_shipdate <= timestamp '1998-09-02'
            group by 1, 2""",
        "filter_math": """
            select l_orderkey, l_linenumber,
                   l_quantity * 2 + 1 as l_quantity,
                   round(sqrt(l_discount), 6) as l_discount
            from lineitem
            where not (l_discount < 0.02 or l_quantity >= 45)""",
        "join_broadcast": """
            select o_orderkey, o_totalprice, c_name, c_mktsegment
            from orders join customer on o_custkey = c_custkey
            where c_mktsegment = 'BUILDING'""",
        "join_shuffle": """
            select o_orderpriority,
                   round(sum(cast(round(l_extendedprice * 100, 0) as bigint))
                         / 100.0, 4) as sum_price,
                   count(*) as n
            from lineitem join orders on l_orderkey = o_orderkey
            group by 1""",
        "rank": """
            select o_orderkey, o_totalprice,
                   row_number() over (order by o_totalprice desc, o_orderkey desc) - 1
                     as rank
            from orders""",
        "pivot": """
            select o_orderkey,
                   case when o_orderstatus = 'F' then o_totalprice else 0.0 end
                     as "o_orderstatus[F]",
                   case when o_orderstatus = 'O' then o_totalprice else 0.0 end
                     as "o_orderstatus[O]",
                   case when o_orderstatus = 'P' then o_totalprice else 0.0 end
                     as "o_orderstatus[P]"
            from orders""",
        "string_ops": """
            select c_custkey,
                   regexp_replace(c_name || '-' || lower(c_mktsegment),
                                  '[0-9]+', '#', 'g') || '!' as label
            from customer""",
        "categorical_onehot": """
            select l_orderkey, l_linenumber,
                   cast(l_returnflag = 'A' as int) as "l_returnflag[A]",
                   cast(l_returnflag = 'N' as int) as "l_returnflag[N]",
                   cast(l_returnflag = 'R' as int) as "l_returnflag[R]"
            from lineitem""",
        "time_derive": """
            select cast(date_part('year', o_orderdate) as int) as yr,
                   cast(date_part('month', o_orderdate) as int) as mo,
                   round(sum(o_totalprice), 4) as sum_price, count(*) as n
            from orders group by 1, 2""",
        "conditional_replace": """
            select l_returnflag,
                   round(sum(case when l_discount < 0.05 then 0.0
                             else l_discount end), 6) as sum_disc,
                   count(*) as n
            from lineitem group by 1""",
        "reduce_ops": """
            select l_returnflag,
                   min(l_quantity) as min_q, max(l_quantity) as max_q,
                   max(l_quantity) - min(l_quantity) as range_q,
                   round(stddev_samp(l_quantity), 6) as sd_q,
                   round(var_samp(l_quantity), 6) as var_q,
                   count(distinct l_partkey) as uniq_parts
            from lineitem group by 1""",
        "normalize": """
            with s as (select min(value) mn, max(value) mx from events)
            select event_type,
                   round(avg((value - mn) / (mx - mn)), 8) as avg_norm,
                   count(*) as n
            from events, s group by event_type, mn, mx""",
        "sequence_diff": """
            select event_id, user_id,
                   coalesce(value - lag(value) over
                     (partition by user_id order by ts, event_id), 0.0) as dv
            from events""",
        "moving_window": """
            select event_id, user_id,
                   round(avg(value) over
                     (partition by user_id order by ts, event_id
                      rows between 2 preceding and current row), 8) as mv
            from events""",
        "session_split": """
            select event_id, user_id,
                   cast(sum(case when gap_ms > 3600000 then 1 else 0 end) over
                     (partition by user_id order by ts, event_id
                      rows unbounded preceding) as bigint) as session
            from (select event_id, user_id, ts,
                         epoch_ms(ts) - epoch_ms(lag(ts, 1, ts) over
                           (partition by user_id order by ts, event_id)) as gap_ms
                  from events)""",
        "tumbling_window": """
            select user_id,
                   (epoch_ms(ts) // 86400000) * 86400000 as window_start,
                   round(sum(value), 6) as sum_value, count(*) as n
            from events group by 1, 2""",
        "cdc_upsert": _BINLOG_CTE + """
            select conv_id, turn_idx, role, text, tool, ts_ms
            from (select *, row_number() over
                    (partition by conv_id, turn_idx
                     order by ts_ms desc, lsn desc) as rn
                  from e) t
            where rn = 1 and op <> 'D'""",
        "cdc_stats": _BINLOG_CTE.rstrip() + """
            , state as (
              select conv_id, turn_idx, tool, ts_ms
              from (select *, row_number() over
                      (partition by conv_id, turn_idx
                       order by ts_ms desc, lsn desc) as rn
                    from e) t
              where rn = 1 and op <> 'D')
            select cast(count(*) as bigint) as n_rows,
                   min(ts_ms) as ts_lo, max(ts_ms) as ts_hi,
                   cast(min(turn_idx) as bigint) as turn_lo,
                   cast(max(turn_idx) as bigint) as turn_hi,
                   cast(count(*) filter (where tool is null) as bigint)
                     as tool_nulls,
                   min(tool) as tool_lo, max(tool) as tool_hi
            from state""",
        "cdc_sql": _BINLOG_CTE.rstrip() + """
            , lake as (
              select conv_id, turn_idx, role, text
              from (select *, row_number() over
                      (partition by conv_id, turn_idx
                       order by ts_ms desc, lsn desc) as rn
                    from e) t
              where rn = 1 and op <> 'D')
            """ + _SQL_LAKE,
        "cdc_replicate": _BINLOG_CTE + """
            select conv_id, turn_idx, role, text, tool, ts_ms
            from (select *, row_number() over
                    (partition by conv_id, turn_idx
                     order by ts_ms desc, lsn desc) as rn
                  from e) t
            where rn = 1 and op <> 'D'""",
        "cdc_merge": _BINLOG_CTE + """
            , lake as (
              select conv_id, turn_idx, role, text, tool, ts_ms
              from (select *, row_number() over
                      (partition by conv_id, turn_idx
                       order by ts_ms desc, lsn desc) as rn
                    from e) t
              where rn = 1 and op <> 'D'
            ), src0 as (
              select 'conv-' || cast(user_id as varchar) as conv_id,
                     cast(event_id % 23 as int) as turn_idx,
                     'merged' as role,
                     'm:' || coalesce(cast(props as varchar), '') as text,
                     'merge' as tool,
                     epoch_ms(date_trunc('milliseconds', ts))
                       + 31536000000 + event_id as ts_ms
              from events where event_id % 7 = 0
            ), src as (
              select conv_id, turn_idx, role, text, tool, ts_ms
              from (select *, row_number() over
                      (partition by conv_id, turn_idx
                       order by ts_ms desc) as rn from src0) t
              where rn = 1
            ), touched as (
              select s.conv_id, s.turn_idx
              from src s join lake l
                using (conv_id, turn_idx)
              where s.turn_idx % 5 = 0 or l.role = 'assistant'
            ), mupd as (
              select s.*
              from src s join lake l using (conv_id, turn_idx)
              where s.turn_idx % 5 <> 0 and l.role = 'assistant'
            ), mins as (
              select s.*
              from src s
              where s.turn_idx % 3 = 0
                and not exists (select 1 from lake l
                                where l.conv_id = s.conv_id
                                  and l.turn_idx = s.turn_idx)
            )
            select l.conv_id, l.turn_idx, l.role, l.text, l.tool, l.ts_ms
            from lake l
            where not exists (select 1 from touched d
                              where d.conv_id = l.conv_id
                                and d.turn_idx = l.turn_idx)
            union all
            select conv_id, turn_idx, role, text, tool, ts_ms from mupd
            union all
            select conv_id, turn_idx, role, text, tool, ts_ms from mins""",
        "cdc_delta_lake": _BINLOG_CTE + """
            select conv_id, turn_idx, role, text, tool, ts_ms
            from (select *, row_number() over
                    (partition by conv_id, turn_idx
                     order by ts_ms desc, lsn desc) as rn
                  from e) t
            where rn = 1 and op <> 'D'""",
        "cdc_zonemap": _BINLOG_CTE + """
            , bounds as (select min(ts_ms) as mn, max(ts_ms) as mx from e)
            select conv_id, turn_idx, role, text, tool, ts_ms
            from (select *, row_number() over
                    (partition by conv_id, turn_idx
                     order by ts_ms desc, lsn desc) as rn
                  from e) t, bounds
            where rn = 1 and op <> 'D'
              and ts_ms between mn + (mx - mn) // 4
                            and mn + (mx - mn) // 2""",
        "cdc_changefeed": _BINLOG_CTE + """
            , s2 as (select * from (select *, row_number() over
                       (partition by conv_id, turn_idx
                        order by ts_ms desc, lsn desc) as rn
                     from e) t where rn = 1),
              s1 as (select * from (select *, row_number() over
                       (partition by conv_id, turn_idx
                        order by ts_ms desc, lsn desc) as rn
                     from e where lsn <= (select max(lsn) // 2 from e)) t
                     where rn = 1)
            select s2.conv_id, s2.turn_idx,
                   case when s2.op = 'D' then 'delete'
                        when s1.lsn is not null and s1.op <> 'D'
                             then 'update'
                        else 'insert' end as change_type,
                   s2.role, s2.text, s2.tool, s2.ts_ms, s2.lsn
            from s2 left join s1
              on s1.conv_id = s2.conv_id and s1.turn_idx = s2.turn_idx
            where (s1.lsn is null or s1.lsn <> s2.lsn)
              and (s2.op <> 'D'
                   or (s1.lsn is not null and s1.op <> 'D'))""",
        "cdc_timetravel": _BINLOG_CTE + """
            select conv_id, turn_idx, role, text, tool, ts_ms
            from (select *, row_number() over
                    (partition by conv_id, turn_idx
                     order by ts_ms desc, lsn desc) as rn
                  from e where lsn <= (select max(lsn) // 2 from e)) t
            where rn = 1 and op <> 'D'""",
        "preference_pairs": _BINLOG_CTE + """
            select conv_id, turn_idx, role, rejected, chosen,
                   n_versions, lsn
            from (
              select conv_id, turn_idx,
                     last_value(role) over w as role,
                     first_value(text) over w as rejected,
                     last_value(text) over w as chosen,
                     count(*) over (partition by conv_id, turn_idx)
                       as n_versions,
                     last_value(lsn) over w as lsn,
                     row_number() over (partition by conv_id, turn_idx
                                        order by ts_ms, lsn) as rn
              from e where op <> 'D'
              window w as (partition by conv_id, turn_idx
                           order by ts_ms, lsn
                           rows between unbounded preceding
                                    and unbounded following)) t
            where rn = 1 and n_versions >= 2""",
        "conv_dedup": _BINLOG_CTE + """
            , t as (
              select conv_id, turn_idx, lsn, role, text
              from e where op = 'I'
              union all
              select conv_id || '~dup', turn_idx, lsn, role, text
              from e where op = 'I'),
            c as (
              select conv_id,
                     md5(string_agg(
                           coalesce(role, '') || chr(31)
                           || coalesce(text, ''), chr(30)
                           order by turn_idx, lsn)) as content_hash,
                     count(*) as n_turns
              from t group by conv_id)
            select conv_id, content_hash, n_turns from c
            qualify row_number() over (partition by content_hash
                                       order by conv_id) = 1""",
        "edit_pairs": _BINLOG_CTE + """
            select conv_id, turn_idx,
                   lag(role) over w as prev_role, role,
                   lag(text) over w as prev_text, text,
                   lag(ts_ms) over w as prev_ts_ms, ts_ms, lsn
            from e where op <> 'D'
            window w as (partition by conv_id, turn_idx
                         order by ts_ms, lsn)
            qualify lag(lsn) over w is not null""",
        "tree_paths": """
            with recursive t as (
              select event_id + 1 as id,
                     case when event_id + 1 = 1 then null
                          else 1 + (((event_id + 1) * 48271 + 11)
                                    % (event_id + 1 - 1)) end as parent
              from events),
            walk as (
              select id, cast(id as varchar) as path,
                     cast(1 as bigint) as depth
              from t where parent is null
              union all
              select c.id, w.path || '/' || cast(c.id as varchar),
                     w.depth + 1
              from walk w join t c on c.parent = w.id)
            select w.id, w.depth, w.path from walk w
            where w.id not in
              (select parent from t where parent is not null)""",
        "role_transitions": _BINLOG_CTE + """
            , st as (
              select conv_id, turn_idx, role
              from (select *, row_number() over
                      (partition by conv_id, turn_idx
                       order by ts_ms desc, lsn desc) as rn
                    from e) t
              where rn = 1 and op <> 'D'
            ), pairs as (
              select lag(role) over (partition by conv_id
                                     order by turn_idx) as from_state,
                     role as to_state
              from st
            )
            select from_state, to_state, cast(count(*) as bigint) as n
            from pairs where from_state is not null
            group by 1, 2 order by 1, 2""",
        "cdc_renderview": _BINLOG_CTE + """
            , st as (
              select conv_id, turn_idx, role, text
              from (select *, row_number() over
                      (partition by conv_id, turn_idx
                       order by ts_ms desc, lsn desc) as rn
                    from e) t
              where rn = 1 and op <> 'D'
            )
            select conv_id,
                   string_agg(role || ': ' || coalesce(text, ''),
                              chr(10) order by turn_idx) as rendered,
                   cast(count(*) as bigint) as n_turns
            from st group by conv_id order by conv_id""",
        "cdc_aggview": _BINLOG_CTE + """
            select role, count(*) as n_turns,
                   cast(sum(turn_idx) as bigint) as sum_turn,
                   avg(ts_ms) as mean_ts_ms
            from (select *, row_number() over
                    (partition by conv_id, turn_idx
                     order by ts_ms desc, lsn desc) as rn
                  from e) t
            where rn = 1 and op <> 'D'
            group by role""",
        "triangle_count": """
            with raw as (
              select doc_id % 97 as u, (31*doc_id+7) % 97 as v
              from documents
              union all
              select doc_id % 97, (17*doc_id+3) % 97 from documents
              union all
              select doc_id % 97, (53*doc_id+11) % 97 from documents),
            e as (select distinct least(u, v) as a, greatest(u, v) as b
                  from raw where u <> v)
            select cast(count(*) as bigint) as triangles
            from e e1
            join e e2 on e2.a = e1.b
            join e e3 on e3.a = e1.a and e3.b = e2.b""",
        "scd2_history": _BINLOG_CTE + """
            , v as (select *, lead(lsn) over (partition by conv_id,
                        turn_idx order by lsn) as valid_to
                    from e)
            select lsn as valid_from, op, conv_id, turn_idx, role,
                   text, tool, ts_ms, valid_to
            from v where op <> 'D'""",
        "fuzzy_dedup": """
            with recursive pairs as (
              select a.c_custkey as id_a, b.c_custkey as id_b
              from customer a join customer b
                on a.c_custkey < b.c_custkey
              where levenshtein(a.c_name, b.c_name) <= 1),
            bidir as (
              select id_a as a, id_b as b from pairs
              union all
              select id_b, id_a from pairs),
            walk(node, reach) as (
              select a, a from bidir group by a
              union
              select w.node, b.b
              from walk w join bidir b on b.a = w.reach),
            comp as (
              select node, min(reach) as component from walk group by node)
            select c.c_custkey, c.c_name,
                   coalesce(p.component, c.c_custkey) as component
            from customer c left join comp p on p.node = c.c_custkey""",
        "cdc_salted": _BINLOG_CTE + """
            select conv_id, turn_idx, role, text, tool, ts_ms
            from (select *, row_number() over
                    (partition by conv_id, turn_idx
                     order by ts_ms desc, lsn desc) as rn
                  from e) t
            where rn = 1 and op <> 'D'""",
        "cdc_dlq": _BINLOG_CTE + """
            select conv_id, turn_idx, role, text, tool, ts_ms
            from (select *, row_number() over
                    (partition by conv_id, turn_idx
                     order by ts_ms desc, lsn desc) as rn
                  from e where lsn % 97 <> 0) t
            where rn = 1 and op <> 'D'""",
        "cdc_expectations": _BINLOG_CTE + """
            select conv_id, turn_idx, role, text, tool, ts_ms
            from (select *, row_number() over
                    (partition by conv_id, turn_idx
                     order by ts_ms desc, lsn desc) as rn
                  from e
                  where turn_idx <= 12
                    and (role is null
                         or role in ('user', 'assistant'))) t
            where rn = 1 and op <> 'D'""",
        "cdc_resume": _BINLOG_CTE + """
            select conv_id, turn_idx, role, text, tool, ts_ms
            from (select *, row_number() over
                    (partition by conv_id, turn_idx
                     order by ts_ms desc, lsn desc) as rn
                  from e) t
            where rn = 1 and op <> 'D'""",
        "cdc_wap": _BINLOG_CTE + """
            select conv_id, turn_idx, role, text, tool, ts_ms
            from (select *, row_number() over
                    (partition by conv_id, turn_idx
                     order by ts_ms desc, lsn desc) as rn
                  from e) t
            where rn = 1 and op <> 'D'""",
        "jdbc_mirror": _BINLOG_CTE + """
            select conv_id, turn_idx, role, text, tool, ts_ms
            from (select *, row_number() over
                    (partition by conv_id, turn_idx
                     order by ts_ms desc, lsn desc) as rn
                  from e) t
            where rn = 1 and op <> 'D'""",
        "cdc_repartition": _BINLOG_CTE + """
            select conv_id, turn_idx, role, text, tool, ts_ms
            from (select *, row_number() over
                    (partition by conv_id, turn_idx
                     order by ts_ms desc, lsn desc) as rn
                  from e) t
            where rn = 1 and op <> 'D'""",
        "cdc_autosalt": _BINLOG_CTE + """
            , s as (select lsn, op,
                      case when lsn % 4 = 0 then 'conv-hot'
                           else conv_id end as conv_id,
                      turn_idx, role, text, tool, ts_ms
                    from e)
            select conv_id, turn_idx, role, text, tool, ts_ms
            from (select *, row_number() over
                    (partition by conv_id, turn_idx
                     order by ts_ms desc, lsn desc) as rn
                  from s) t
            where rn = 1 and op <> 'D'""",
        "cdc_evolve": _BINLOG_CTE + """
            , ev as (
              select lsn, op, conv_id,
                     cast(turn_idx as bigint) as turn_idx, role, text,
                     case when lsn <= (select max(event_id) // 2
                                       from events)
                          then null else tool end as tool,
                     ts_ms
              from e)
            select conv_id, turn_idx, role, text, tool, ts_ms
            from (select *, row_number() over
                    (partition by conv_id, turn_idx
                     order by ts_ms desc, lsn desc) as rn
                  from ev) t
            where rn = 1 and op <> 'D'""",
        "patch_upsert": _BINLOG_CTE + """
            , e2 as (
              select lsn, op, conv_id, turn_idx, role,
                     case when op = 'U' and lsn % 3 = 0 then null
                          else text end as text,
                     case when op = 'U' and lsn % 5 = 0 then null
                          else tool end as tool,
                     ts_ms
              from e),
            o as (select *, row_number() over
                    (partition by conv_id, turn_idx
                     order by ts_ms, lsn) as rn from e2),
            d as (select conv_id, turn_idx, max(rn) as last_d
                  from o where op = 'D' group by conv_id, turn_idx),
            live as (select o.* from o
                     left join d using (conv_id, turn_idx)
                     where o.op <> 'D'
                       and o.rn > coalesce(d.last_d, 0)),
            f as (select conv_id, turn_idx,
                    last_value(role ignore nulls) over w as role,
                    last_value(text ignore nulls) over w as text,
                    last_value(tool ignore nulls) over w as tool,
                    ts_ms, lsn,
                    row_number() over (partition by conv_id, turn_idx
                                       order by rn desc) as rk
                  from live
                  window w as (partition by conv_id, turn_idx
                               order by rn
                               rows between unbounded preceding
                               and current row))
            select conv_id, turn_idx, role, text, tool, ts_ms, lsn
            from f where rk = 1""",
        "cdc_topn_view": _BINLOG_CTE + """
            , state as (
              select conv_id, turn_idx, role, text, tool, ts_ms
              from (select *, row_number() over
                      (partition by conv_id, turn_idx
                       order by ts_ms desc, lsn desc) as rn
                    from e) t
              where rn = 1 and op <> 'D')
            select conv_id, turn_idx, role, text, tool, ts_ms
            from (select *, row_number() over
                    (partition by conv_id order by turn_idx desc) as rk
                  from state) s
            where rk <= 2
            order by conv_id, turn_idx desc""",
        "cdc_joinview": _BINLOG_CTE + """
            , state as (
              select conv_id, turn_idx, text, ts_ms
              from (select *, row_number() over
                      (partition by conv_id, turn_idx
                       order by ts_ms desc, lsn desc) as rn
                    from e) t
              where rn = 1 and op <> 'D')
            select l.conv_id, cast(l.turn_idx // 2 as bigint) as pair,
                   l.text as q_text, l.ts_ms as q_ts_ms,
                   r.text as a_text, r.ts_ms as a_ts_ms
            from state l join state r
              on l.conv_id = r.conv_id
             and l.turn_idx // 2 = r.turn_idx // 2
            where l.turn_idx % 2 = 0 and r.turn_idx % 2 = 1""",
        "txn_upsert": _BINLOG_CTE + """
            , t as (select *, lsn // 8 as txn_id from e),
            c as (select distinct txn_id from t where tool = 'signup')
            select conv_id, turn_idx, role, text, tool, ts_ms
            from (select t.*, row_number() over
                    (partition by conv_id, turn_idx
                     order by ts_ms desc, lsn desc) as rn
                  from t join c using(txn_id)) x
            where rn = 1 and op <> 'D'""",
        "cdc_multitable": _BINLOG_CTE + """
            , t as (select *, lsn // 8 as txn_id,
                    case when turn_idx % 2 = 0 then 'A' else 'B' end as tbl
                    from e),
            c as (select distinct txn_id from t where tool = 'signup')
            select tbl, conv_id, turn_idx, role, text, tool, ts_ms
            from (select t.*, row_number() over
                    (partition by tbl, conv_id, turn_idx
                     order by ts_ms desc, lsn desc) as rn
                  from t join c using(txn_id)) x
            where rn = 1 and op <> 'D'""",
        "late_events": _BINLOG_CTE + """
            , s as (select lsn, ts_ms - (lsn % 16) * 600000 as tsk from e)
            select lsn,
                   coalesce(max(tsk) over w - 1800000, -1) as wm_ms,
                   coalesce(tsk < max(tsk) over w - 1800000, false)
                     as is_late
            from s
            window w as (order by lsn
                         rows between unbounded preceding
                         and 1 preceding)""",
        "windowed_stream": _BINLOG_CTE + """
            , s as (select lsn, role, turn_idx,
                           ts_ms - (lsn % 16) * 600000 as tsk from e)
            , wmk as (select *, max(tsk) over (order by lsn
                        rows between unbounded preceding
                        and 1 preceding) - 1800000 as wm
                      from s)
            select tsk // 3600000 as win, role,
                   count(*) as n,
                   cast(sum(turn_idx) as bigint) as val_sum
            from wmk
            where coalesce((tsk // 3600000 + 1) * 3600000 + 600000 > wm,
                           true)
            group by win, role""",
        "stream_join": _BINLOG_CTE + """
            , s as (select lsn, conv_id, role,
                           ts_ms - (lsn % 16) * 600000 as tsk from e)
            , wmk as (select *, max(tsk) over (order by lsn
                        rows between unbounded preceding
                        and 1 preceding) - 1800000 as wm
                      from s)
            , g as (select * from wmk
                    where coalesce(tsk > wm - 300000, true))
            select l.conv_id, l.lsn as l_lsn, r.lsn as r_lsn,
                   l.tsk as l_ts, r.tsk as r_ts
            from g l join g r on l.conv_id = r.conv_id
            where l.role = 'user' and r.role = 'assistant'
              and r.tsk between l.tsk - 7200000
                            and l.tsk + 7200000""",
        "windowed_distinct": _BINLOG_CTE + """
            , s as (select lsn, role, conv_id,
                           ts_ms - (lsn % 16) * 600000 as tsk from e)
            , wmk as (select *, max(tsk) over (order by lsn
                        rows between unbounded preceding
                        and 1 preceding) - 1800000 as wm
                      from s)
            select tsk // 3600000 as win, role,
                   cast(count(distinct conv_id) as bigint) as n_distinct
            from wmk
            where coalesce((tsk // 3600000 + 1) * 3600000 + 600000 > wm,
                           true)
            group by win, role""",
        "hopping_stream": _BINLOG_CTE + """
            , s as (select lsn, role, turn_idx,
                           ts_ms - (lsn % 16) * 600000 as tsk from e)
            , wmk as (select *, max(tsk) over (order by lsn
                        rows between unbounded preceding
                        and 1 preceding) - 1800000 as wm
                      from s)
            , x as (select *, unnest(generate_series(
                        (tsk - 7200000) // 3600000 + 1,
                        tsk // 3600000)) as win
                    from wmk)
            select win, role, count(*) as n,
                   cast(sum(turn_idx) as bigint) as val_sum
            from x
            where coalesce(win * 3600000 + 7200000 + 600000 > wm, true)
            group by win, role""",
        "session_stream": _BINLOG_CTE + """
            , s as (select lsn, conv_id,
                           ts_ms - (lsn % 16) * 600000 as tsk from e)
            , wmk as (select *, max(tsk) over (order by lsn
                        rows between unbounded preceding
                        and 1 preceding) - 1800000 as wm
                      from s)
            , ot as (select lsn, conv_id, tsk from wmk
                     where wm is null or tsk > wm - 600000)
            , g as (select *, case when tsk - lag(tsk) over w > 1800000
                                   then 1 else 0 end as brk
                    from ot window w as (partition by conv_id
                                         order by tsk, lsn))
            select lsn, conv_id,
                   cast(sum(brk) over (partition by conv_id
                                       order by tsk, lsn
                                       rows unbounded preceding) as bigint)
                     as session_id
            from g""",
        "funnel": """
            with s1 as (
              select user_id, min(epoch_ms(date_trunc('milliseconds', ts)))
                       as t
              from events where event_type = 'signup' group by user_id),
            s2 as (
              select e.user_id,
                     min(epoch_ms(date_trunc('milliseconds', e.ts))) as t
              from events e join s1 using(user_id)
              where event_type = 'view'
                and epoch_ms(date_trunc('milliseconds', e.ts)) > s1.t
                and epoch_ms(date_trunc('milliseconds', e.ts))
                      <= s1.t + 86400000
              group by e.user_id),
            s3 as (
              select e.user_id,
                     min(epoch_ms(date_trunc('milliseconds', e.ts))) as t
              from events e join s2 using(user_id)
              where event_type = 'click'
                and epoch_ms(date_trunc('milliseconds', e.ts)) > s2.t
                and epoch_ms(date_trunc('milliseconds', e.ts))
                      <= s2.t + 86400000
              group by e.user_id),
            s4 as (
              select e.user_id,
                     min(epoch_ms(date_trunc('milliseconds', e.ts))) as t
              from events e join s3 using(user_id)
              where event_type = 'purchase'
                and epoch_ms(date_trunc('milliseconds', e.ts)) > s3.t
                and epoch_ms(date_trunc('milliseconds', e.ts))
                      <= s3.t + 86400000
              group by e.user_id)
            select 1 as step, 'signup' as event_type,
                   count(*) as n_users from s1
            union all select 2, 'view', count(*) from s2
            union all select 3, 'click', count(*) from s3
            union all select 4, 'purchase', count(*) from s4""",
        "cohort_retention": """
            with up as (
              select distinct user_id,
                     epoch_ms(date_trunc('milliseconds', ts)) // 604800000
                       as per
              from events),
            coh as (select user_id, min(per) as c from up group by user_id)
            select coh.c as cohort, up.per - coh.c as "offset",
                   count(*) as n_users
            from up join coh using(user_id)
            group by 1, 2""",
        "frequent_tokens": """
            select value, cnt from (
              select tok as value, count(*) as cnt
              from (select unnest(list_filter(
                       string_split(coalesce(text, ''), ' '),
                       x -> x <> '')) as tok
                    from documents)
              group by tok)
            order by cnt desc, value asc limit 25""",
        "grouped_quantile_hist": """
            with rng as (
              select event_type, min(value) as lo, max(value) as hi
              from events where value is not null group by event_type
            ), b as (
              select e.event_type,
                     cast(case when hi > lo
                          then least(floor((value - lo) / (hi - lo) * 1024),
                                     1023)
                          else 0 end as bigint) as bin
              from events e join rng using (event_type)
              where value is not null
            ), h as (
              select event_type, bin, count(*) as c from b group by 1, 2
            ), cum as (
              select event_type, bin,
                     sum(c) over (partition by event_type
                                  order by bin) as cc,
                     sum(c) over (partition by event_type) as m
              from h
            )
            select c.event_type,
                   min(case when cc >= ceil(0.5 * m)
                       then lo + (bin + 0.5) / 1024 * (hi - lo) end) as p50,
                   min(case when cc >= ceil(0.9 * m)
                       then lo + (bin + 0.5) / 1024 * (hi - lo) end) as p90,
                   min(case when cc >= ceil(0.99 * m)
                       then lo + (bin + 0.5) / 1024 * (hi - lo) end) as p99
            from cum c join rng using (event_type)
            group by c.event_type""",
        "exact_dedup": """
            select doc_id, text from documents
            where doc_id in (select min(doc_id) from documents group by text)""",
        "token_count": """
            select doc_id,
                   len(list_filter(string_split(coalesce(text, ''), ' '),
                                   x -> x <> '')) as n_tokens
            from documents""",
        "grouped_topk": """
            select doc_id, lang, source, n_chars from (
              select doc_id, lang, source, n_chars,
                     row_number() over (partition by lang, source
                       order by n_chars desc, doc_id) as rn
              from documents)
            where rn <= 3 order by lang, source, rn""",
        "bpe_tokens": """
            select doc_id,
                   len(regexp_extract_all(coalesce(text, ''),
                     '''(s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+'))
                     as n_bpe_tokens
            from documents""",
        "fingerprint": """
            select doc_id,
                   md5(regexp_replace(lower(coalesce(text, '')),
                                      '\\s', '', 'g')) as fp
            from documents""",
        "sequence_offset": """
            select event_id, user_id,
                   lag(value, 1, -1.0) over
                     (partition by user_id order by ts, event_id)
                     as value_offset1
            from events""",
        "similarity_topk": """
            with q as (select vec_id as qid, embedding as qe
                       from embeddings where vec_id < 5)
            select qid as query_id, vec_id as match_id
            from q cross join embeddings
            qualify row_number() over
              (partition by qid
               order by list_cosine_similarity(
                 cast(qe as double[]), cast(embedding as double[])) desc,
               vec_id asc) <= 10""",
        "ivf_exact": """
            with q as (select vec_id as qid, embedding as qe
                       from embeddings where vec_id < 5)
            select qid as query_id, vec_id as match_id
            from q cross join embeddings
            qualify row_number() over
              (partition by qid
               order by list_cosine_similarity(
                 cast(qe as double[]), cast(embedding as double[])) desc,
               vec_id asc) <= 10""",
        "ngram_jaccard": r"""
            with toks as (
              select doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') as w
              from documents
            ), grams as (
              select distinct doc_id, g from (
                select doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] as g
                from toks, unnest(range(1, len(w) - 1)) as t(i)
                where len(w) >= 3
                union all
                select doc_id, array_to_string(w, ' ') as g
                from toks where len(w) > 0 and len(w) < 3
              )
            ), sizes as (
              select doc_id, count(*) as sz from grams group by doc_id
            ), inter as (
              select a.doc_id as id_a, b.doc_id as id_b, count(*) as icnt
              from grams a join grams b
                on a.g = b.g and a.doc_id < b.doc_id
              group by 1, 2
            )
            select id_a, id_b,
                   round(icnt * 1.0 / (sa.sz + sb.sz - icnt), 6) as jaccard
            from inter
            join sizes sa on id_a = sa.doc_id
            join sizes sb on id_b = sb.doc_id
            where icnt * 1.0 / (sa.sz + sb.sz - icnt) >= 0.4
            order by id_a, id_b""",
        "pack_shards": """
            select doc_id, n_chars,
                   cast(coalesce(sum(n_chars) over (order by doc_id
                     rows between unbounded preceding and 1 preceding), 0)
                   // 10000 as bigint) as shard
            from documents
            order by doc_id""",
        "decontaminate": r"""
            with toks as (
              select doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') as w
              from documents
            ), grams as (
              select distinct doc_id, g from (
                select doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] as g
                from toks, unnest(range(1, len(w) - 1)) as t(i)
                where len(w) >= 3
                union all
                select doc_id, array_to_string(w, ' ') as g
                from toks where len(w) > 0 and len(w) < 3
              )
            ), bench as (
              select distinct g from grams where doc_id < 25
            )
            select g.doc_id, count(*) as n_hits
            from grams g join bench b on g.g = b.g
            where g.doc_id >= 25
            group by g.doc_id
            order by g.doc_id""",
        "asof_join": """
            with clicks as (
              select event_id, user_id, ts, value from events
              where event_type = 'click'
            ), purch as (
              select user_id, ts, value from events
              where event_type = 'purchase'
            )
            select c.event_id, c.user_id, c.value,
                   p.value as value_r, p.ts as ts_r
            from clicks c asof left join purch p
              on c.user_id = p.user_id and c.ts >= p.ts
            order by c.event_id""",
        "range_join": """
            with clicks as (
              select event_id, user_id, ts from events
              where event_type = 'click'
            ), purch as (
              select user_id, ts, value from events
              where event_type = 'purchase'
            )
            select c.event_id, c.user_id,
                   p.value as value_r, p.ts as ts_r
            from clicks c join purch p on c.user_id = p.user_id
              and p.ts between c.ts - interval 24 hours and c.ts
            order by c.event_id, ts_r""",
        "lang_id": _lang_id_oracle(),
        "quality_blend": """
            with toks as (
              select doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') as w
              from documents
            ), flat as (
              select doc_id, unnest(w) as word from toks
            ), freq as (
              select doc_id, word, count(*) as c from flat group by 1, 2
            ), sig0 as (
              select doc_id,
                     max(c) * 1.0 / sum(c) as top_word_frac,
                     count(*) * 1.0 / sum(c) as distinct_frac,
                     sum(case when word in
                       ('the','a','and','of','to','in','is')
                       then c else 0 end) * 1.0 / sum(c) as stopword_frac
              from freq group by doc_id
            ), sig as (
              select d.doc_id,
                     round(coalesce(s.top_word_frac, 0.0), 6) as pt,
                     round(coalesce(s.distinct_frac, 0.0), 6) as pd,
                     round(coalesce(s.stopword_frac, 0.0), 6) as ps
              from documents d left join sig0 s using (doc_id)
            ), pr as (
              select doc_id,
                     percent_rank() over (order by pd) as pr_d,
                     percent_rank() over (order by ps) as pr_s,
                     percent_rank() over (order by pt) as pr_t
              from sig
            )
            select doc_id, pr_d, pr_s, pr_t,
                   pr_d + pr_s + (1.0 - pr_t) as score
            from pr order by doc_id""",
        "doc_quality": """
            with toks as (
              select doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') as w
              from documents
            ), flat as (
              select doc_id, unnest(w) as word from toks
            ), freq as (
              select doc_id, word, count(*) as c from flat group by 1, 2
            ), sig as (
              select doc_id,
                     cast(sum(c) as bigint) as n_words,
                     sum(len(word) * c) * 1.0 / sum(c) as mean_word_len,
                     max(c) * 1.0 / sum(c) as top_word_frac,
                     count(*) * 1.0 / sum(c) as distinct_frac,
                     sum(case when word in
                       ('the','a','and','of','to','in','is')
                       then c else 0 end) * 1.0 / sum(c) as stopword_frac
              from freq group by doc_id
            )
            select d.doc_id,
                   coalesce(s.n_words, 0) as n_words,
                   round(coalesce(s.mean_word_len, 0.0), 6) as mean_word_len,
                   round(coalesce(s.top_word_frac, 0.0), 6) as top_word_frac,
                   round(coalesce(s.distinct_frac, 0.0), 6) as distinct_frac,
                   round(coalesce(s.stopword_frac, 0.0), 6) as stopword_frac,
                   cast(case when s.n_words between 20 and 5000
                         and s.top_word_frac <= 0.12
                         and s.distinct_frac >= 0.5
                         and s.stopword_frac between 0.02 and 0.3
                        then 1 else 0 end as int) as keep
            from documents d left join sig s using (doc_id)
            order by d.doc_id""",
        "cosine_pairs": """
            select a.vec_id as id_a, b.vec_id as id_b,
                   round(list_cosine_similarity(
                     cast(a.embedding as double[]),
                     cast(b.embedding as double[])), 6) as cosine
            from embeddings a join embeddings b on a.vec_id < b.vec_id
            where list_cosine_similarity(cast(a.embedding as double[]),
                                         cast(b.embedding as double[])) >= 0.35
            order by id_a, id_b""",
        "anti_join": """
            select c_custkey, c_name, c_acctbal
            from customer c
            where not exists (select 1 from orders o
                              where o.o_custkey = c.c_custkey
                                and o.o_totalprice > 400000)
        """,
        "semi_join": """
            select c_custkey, c_name, c_mktsegment
            from customer c
            where exists (select 1 from orders o
                          where o.o_custkey = c.c_custkey
                            and o.o_totalprice > 150000)
        """,
        "grouped_quantile": """
            select event_type,
                   quantile_disc(value, 0.5) as p50,
                   quantile_disc(value, 0.9) as p90,
                   quantile_disc(value, 0.95) as p95
            from events group by event_type
        """,
        "grouped_quantile_cont": """
            select event_type,
                   quantile_cont(value, 0.5) as p50,
                   quantile_cont(value, 0.9) as p90,
                   quantile_cont(value, 0.95) as p95
            from events group by event_type
        """,
        "cumulative_sum": """
            select event_id, user_id,
                   sum(value) over (partition by user_id
                                    order by ts, event_id
                                    rows between unbounded preceding
                                    and current row) as value_cumsum
            from events
        """,
        # splitmix64 finalizer reproduced exactly in SQL: 64x64-bit
        # multiplies decomposed into 32-bit halves (hugeint mod 2^64),
        # matching datavec_ray.hll.hash64's integer fast path; the xor
        # constant is seed(7) * golden-ratio-odd mod 2^64.
        "grouped_corr": """
            select l_returnflag, cast(count(*) as bigint) as n,
                   round(corr(l_extendedprice, l_quantity), 6) as corr
            from lineitem
            group by l_returnflag
            order by l_returnflag""",
        "cdc_copart_join": _BINLOG_CTE + """
            , v2 as (
              select conv_id, turn_idx, text
              from (select *, row_number() over
                      (partition by conv_id, turn_idx
                       order by ts_ms desc, lsn desc) as rn
                    from e) t
              where rn = 1 and op <> 'D'
            ), v1 as (
              select conv_id, turn_idx, text
              from (select *, row_number() over
                      (partition by conv_id, turn_idx
                       order by ts_ms desc, lsn desc) as rn
                    from e
                    where lsn <= (select max(lsn) // 2 from e)) t
              where rn = 1 and op <> 'D'
            )
            select v2.conv_id, v2.turn_idx, v2.text,
                   v1.text as text_r
            from v2 join v1 using (conv_id, turn_idx)""",
        "cross_join": """
            select n_nationkey, n_name, r_regionkey, r_name
            from nation cross join region""",
        "skew_join": """
            with prof as (
              select user_id, sum(value) as user_value,
                     cast(count(value) as bigint) as user_events
              from events group by 1
            )
            select e.user_id, e.event_type, e.value,
                   p.user_value, p.user_events
            from events e join prof p using (user_id)""",
        "zorder": """
            select o_orderkey, o_custkey,
                   cast(((o_custkey // 1) % 2) * 1 + ((o_orderkey // 1) % 2) * 2 + ((o_custkey // 2) % 2) * 4 + ((o_orderkey // 2) % 2) * 8 + ((o_custkey // 4) % 2) * 16 + ((o_orderkey // 4) % 2) * 32 + ((o_custkey // 8) % 2) * 64 + ((o_orderkey // 8) % 2) * 128 + ((o_custkey // 16) % 2) * 256 + ((o_orderkey // 16) % 2) * 512 + ((o_custkey // 32) % 2) * 1024 + ((o_orderkey // 32) % 2) * 2048 + ((o_custkey // 64) % 2) * 4096 + ((o_orderkey // 64) % 2) * 8192 + ((o_custkey // 128) % 2) * 16384 + ((o_orderkey // 128) % 2) * 32768 + ((o_custkey // 256) % 2) * 65536 + ((o_orderkey // 256) % 2) * 131072 + ((o_custkey // 512) % 2) * 262144 + ((o_orderkey // 512) % 2) * 524288 + ((o_custkey // 1024) % 2) * 1048576 + ((o_orderkey // 1024) % 2) * 2097152 + ((o_custkey // 2048) % 2) * 4194304 + ((o_orderkey // 2048) % 2) * 8388608 as bigint) as zkey
            from orders""",
        "cube": """
            select lang, source,
                   count(n_chars) as n_docs,
                   cast(sum(n_chars) as bigint) as sum_chars
            from documents
            group by cube(lang, source)
            order by lang nulls last, source nulls last""",
        "benford": """
            with x as (
              select l_returnflag as rf,
                     cast(floor(abs(l_extendedprice)) as hugeint) as m
              from lineitem
              where l_extendedprice is not null
                and floor(abs(l_extendedprice)) >= 1
            ), c as (
              select rf,
                     cast(substr(cast(m as varchar), 1, 1) as bigint)
                         as digit,
                     cast(count(*) as bigint) as n
              from x group by 1, 2
            ), t as (
              select rf, sum(n) as tot from c group by 1
            )
            select c.rf as l_returnflag, c.digit, c.n,
                   round(cast(c.n as double) / cast(t.tot as double), 6)
                       as share,
                   round(log10(1 + 1.0 / c.digit), 6) as benford
            from c join t on c.rf = t.rf
            order by 1, 2""",
        "robust_scale": """
            select l_orderkey, l_linenumber, l_suppkey, l_quantity,
                   (l_quantity - quantile_cont(l_quantity, 0.5) over w)
                     / nullif(quantile_cont(l_quantity, 0.75) over w
                              - quantile_cont(l_quantity, 0.25) over w, 0)
                     as l_quantity_r
            from lineitem window w as (partition by l_suppkey)""",
        "cdc_digest": _BINLOG_CTE + """
            , st as (
              select conv_id, turn_idx, role, text, tool, ts_ms
              from (select *, row_number() over
                      (partition by conv_id, turn_idx
                       order by ts_ms desc, lsn desc) as rn
                    from e) t
              where rn = 1 and op <> 'D'
            ), ser as (
              select coalesce(conv_id, chr(0)) || chr(31)
                  || coalesce(cast(turn_idx as varchar), chr(0)) || chr(31)
                  || coalesce(role, chr(0)) || chr(31)
                  || coalesce(text, chr(0)) || chr(31)
                  || coalesce(tool, chr(0)) || chr(31)
                  || coalesce(cast(ts_ms as varchar), chr(0)) as s
              from st
            )
            select cast(count(*) as bigint) as n,
                   cast(sum(cast(md5_number_lower(s) as hugeint))
                        % 18446744073709551616 as ubigint) as digest
            from ser""",
        "jaccard_against": """
            with toks as (
              select doc_id,
                     list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '') as w
              from documents
            ), grams as (
              select distinct doc_id, g from (
                select doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] as g
                from toks, unnest(range(1, len(w) - 1)) as t(i)
                where len(w) >= 3
                union all
                select doc_id, array_to_string(w, ' ') as g
                from toks where len(w) > 0 and len(w) < 3
              )
            ), sizes as (
              select doc_id, count(*) as sz from grams group by doc_id
            ), inter as (
              select a.doc_id as ref_id, b.doc_id as doc_id,
                     count(*) as icnt
              from grams a join grams b
                on a.g = b.g and a.doc_id < 300 and b.doc_id >= 300
              group by 1, 2
            )
            select ref_id, i.doc_id,
                   round(icnt * 1.0 / (sa.sz + sb.sz - icnt), 6)
                       as jaccard
            from inter i
            join sizes sa on ref_id = sa.doc_id
            join sizes sb on i.doc_id = sb.doc_id
            where icnt * 1.0 / (sa.sz + sb.sz - icnt) >= 0.4
            order by ref_id, i.doc_id""",
        "grouped_geomean": """
            select l_returnflag,
                   cast(count(l_quantity) as bigint) as n,
                   case when count(l_quantity)
                          = count(case when l_quantity > 0 then 1 end)
                        then round(exp(sum(case when l_quantity > 0
                                          then ln(l_quantity) end)
                                       / count(l_quantity)), 6) end
                       as geomean,
                   case when count(l_quantity)
                          = count(case when l_quantity > 0 then 1 end)
                        then round(count(l_quantity)
                                   / sum(1.0 / l_quantity), 6) end
                       as harmean
            from lineitem group by 1 order by 1""",
        "grouped_moments": """
            with x as (
              select l_returnflag as rf, cast(l_quantity as hugeint) as v
              from lineitem where l_quantity is not null
            ), s as (
              select rf, cast(count(*) as hugeint) as n, sum(v) as s1,
                     sum(v*v) as s2, sum(v*v*v) as s3, sum(v*v*v*v) as s4
              from x group by rf
            ), m as (
              select rf, n,
                cast(n*s2 - s1*s1 as double) / cast(n*n as double) as m2,
                cast(n*n*s3 - 3*n*s1*s2 + 2*s1*s1*s1 as double)
                    / cast(n*n*n as double) as m3,
                cast(n*n*n*s4 - 4*n*n*s1*s3 + 6*n*s1*s1*s2
                     - 3*s1*s1*s1*s1 as double)
                    / cast(n*n*n*n as double) as m4
              from s
            )
            select rf as l_returnflag, cast(n as bigint) as n,
                   case when m2 = 0 then null
                        else m3 / (m2 * sqrt(m2)) end as skew,
                   case when m2 = 0 then null
                        else m4 / (m2 * m2) - 3.0 end as kurt
            from m order by 1""",
        "grouped_entropy": """
            with c as (
              select o_orderpriority as pri, o_orderstatus as v,
                     cast(count(*) as hugeint) as c
              from orders where o_orderstatus is not null
              group by 1, 2
            )
            select pri as o_orderpriority, cast(sum(c) as bigint) as n,
                   round(log2(cast(sum(c) as double))
                         - sum(cast(c as double)
                               * log2(cast(c as double)))
                           / cast(sum(c) as double), 6) as entropy
            from c group by pri order by pri""",
        "time_resample": """
            with pts as (
              select user_id, cast(epoch_ms(ts) as bigint) as t,
                     max(value) as v
              from events
              where user_id < 50 and value is not null
              group by 1, 2
            ), rng as (
              select user_id,
                     ((min(t) + 86399999) // 86400000) * 86400000 as gmin,
                     (max(t) // 86400000) * 86400000 as gmax
              from pts group by 1
            ), grid as (
              select user_id,
                     unnest(generate_series(gmin, gmax, 86400000)) as t
              from rng where gmax >= gmin
            ), prv as (
              select g.user_id, g.t, p.t as pt, p.v as pv
              from grid g asof join pts p
                on g.user_id = p.user_id and g.t >= p.t
            ), nxt as (
              select g.user_id, g.t, p.t as nt, p.v as nv
              from grid g asof join pts p
                on g.user_id = p.user_id and g.t <= p.t
            )
            select p.user_id, p.t as ts_ms,
                   case when n.nt = p.pt then p.pv
                        else p.pv + (n.nv - p.pv)
                             * (cast(p.t - p.pt as double)
                                / cast(n.nt - p.pt as double)) end as value
            from prv p join nxt n
              on p.user_id = n.user_id and p.t = n.t
            order by 1, 2""",
        "mad_outliers": """
            with med as (
              select event_type, quantile_cont(value, 0.5) as median
              from events group by 1
            ), d as (
              select e.event_type, e.value,
                     abs(e.value - m.median) as ad, m.median
              from events e join med m using (event_type)
            ), md as (
              select event_type, quantile_cont(ad, 0.5) as mad
              from d group by 1
            )
            select d.event_type, cast(count(d.value) as bigint) as n,
                   cast(sum(case when d.ad > 3.0 * md.mad then 1
                                 else 0 end) as bigint) as n_outliers,
                   max(d.median) as median, max(md.mad) as mad
            from d join md using (event_type)
            group by d.event_type order by d.event_type""",
        "negative_samples": f"""
            with s as (select vec_id,
                         unnest(generate_series(0, 3)) as slot
                       from embeddings),
            nn as (select cast(max(vec_id) + 1 as hugeint) as n
                   from embeddings),
            h0 as (select vec_id, slot,
                     cast(vec_id * 1000003 + slot as hugeint)
                         % 18446744073709551616 as x
                   from s),
            h1 as (select vec_id, slot,
                     {_splitmix_mul_sql('xor(x, x >> 30)', 0xBF58476D1CE4E5B9)} as x
                   from h0),
            h2 as (select vec_id, slot,
                     {_splitmix_mul_sql('xor(x, x >> 27)', 0x94D049BB133111EB)} as x
                   from h1),
            h3 as (select vec_id, slot, xor(x, x >> 31) as x from h2),
            r as (select vec_id, slot,
                    x % (select n from nn) as neg0 from h3)
            select vec_id as anchor, cast(slot as bigint) as slot,
                   cast(case when neg0 = vec_id
                        then (neg0 + 1) % (select n from nn)
                        else neg0 end as bigint) as neg_id
            from r
            order by anchor, slot""",
        "hash_sample": f"""
            with h0 as (
              select doc_id, lang, n_chars,
                     cast(doc_id as hugeint) % 18446744073709551616 as x
              from documents),
            h1 as (select doc_id, lang, n_chars,
                     {_splitmix_mul_sql('xor(x, x >> 30)', 0xBF58476D1CE4E5B9)} as x
                   from h0),
            h2 as (select doc_id, lang, n_chars,
                     {_splitmix_mul_sql('xor(x, x >> 27)', 0x94D049BB133111EB)} as x
                   from h1),
            h3 as (select doc_id, lang, n_chars,
                     xor(xor(x, x >> 31), 6018027440424182931) as x
                   from h2)
            select doc_id, lang, n_chars from h3
            where x % 10000 < 1000
        """,
        # curation_export: the full pipeline in SQL — quality gate,
        # keep-min dedup, 3-gram decontamination anti-join, splitmix
        # shard/pos (same chain as shuffle_export, 4 shards)
        "curation_export": f"""
            with pool as (select doc_id, text from documents
                          where doc_id >= 25),
            qtoks as (select doc_id,
                        list_filter(string_split(text, ' '),
                                    x -> x <> '') as w from pool),
            qflat as (select doc_id, unnest(w) as word from qtoks),
            qfreq as (select doc_id, word, count(*) as c
                      from qflat group by 1, 2),
            sig as (select doc_id, sum(c) as n_words,
                      max(c) * 1.0 / sum(c) as topf,
                      count(*) * 1.0 / sum(c) as distf,
                      sum(case when word in
                          ('the','a','and','of','to','in','is')
                          then c else 0 end) * 1.0 / sum(c) as stopf
                    from qfreq group by doc_id),
            kept as (select p.doc_id, p.text
                     from pool p join sig s using (doc_id)
                     where s.n_words between 20 and 5000
                       and s.topf <= 0.12 and s.distf >= 0.5
                       and s.stopf between 0.02 and 0.3),
            uniq as (select doc_id, text from kept
                     where doc_id in (select min(doc_id)
                                      from kept group by text)),
            ltoks as (select doc_id,
                        list_filter(string_split_regex(lower(text),
                                                       '\\s+'),
                                    x -> x <> '') as w from uniq),
            grams as (select distinct doc_id, g from (
                select doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] as g
                from ltoks, unnest(range(1, len(w) - 1)) as t(i)
                where len(w) >= 3
                union all
                select doc_id, array_to_string(w, ' ') as g
                from ltoks where len(w) > 0 and len(w) < 3)),
            btoks as (select doc_id,
                        list_filter(string_split_regex(lower(text),
                                                       '\\s+'),
                                    x -> x <> '') as w
                      from documents where doc_id < 25),
            bgrams as (select distinct g from (
                select w[i] || ' ' || w[i+1] || ' ' || w[i+2] as g
                from btoks, unnest(range(1, len(w) - 1)) as t(i)
                where len(w) >= 3
                union all
                select array_to_string(w, ' ') as g
                from btoks where len(w) > 0 and len(w) < 3)),
            flagged as (select distinct doc_id
                        from grams join bgrams using (g)),
            clean as (select doc_id from uniq
                      where doc_id not in (select doc_id from flagged)),
            h0 as (select doc_id,
                     cast(doc_id as hugeint) % 18446744073709551616 as x
                   from clean),
            h1 as (select doc_id,
                     {_splitmix_mul_sql('xor(x, x >> 30)', 0xBF58476D1CE4E5B9)} as x
                   from h0),
            h2 as (select doc_id,
                     {_splitmix_mul_sql('xor(x, x >> 27)', 0x94D049BB133111EB)} as x
                   from h1),
            h3 as (select doc_id, xor(x, x >> 31) as x from h2)
            select doc_id, cast(x % 4 as bigint) as shard,
                   cast(row_number() over (partition by x % 4
                                           order by x, doc_id) - 1
                        as bigint) as pos
            from h3
        """,
        # bigram_logprob: stupid backoff mirrored term for term
        "bigram_logprob": r"""
            with lm as (select text from documents where doc_id < 300),
            lt as (select list_filter(string_split_regex(lower(text),
                                                         '\s+'),
                                      x -> x <> '') as w from lm),
            uni as (select unnest(w) as tok from lt),
            uf as (select tok, count(*) as c from uni group by tok),
            un as (select cast(sum(c) as double) as nu,
                          cast(count(*) as double) as v from uf),
            bp as (select w[i] as w1, w[i+1] as w2
                   from lt, unnest(range(1, len(w))) as t(i)
                   where len(w) >= 2),
            bf as (select w1, w2, count(*) as cb from bp group by 1, 2),
            st as (select doc_id,
                          list_filter(string_split_regex(lower(text),
                                                         '\s+'),
                                      x -> x <> '') as w
                   from documents where doc_id >= 300),
            sp as (select doc_id, w[i] as w1, w[i+1] as w2
                   from st, unnest(range(1, len(w))) as t(i)
                   where len(w) >= 2)
            select p.doc_id, count(*) as n_bigrams,
                   sum(case when bf.cb is not null
                        then ln(bf.cb / f1.c)
                        else ln(0.4) + ln(coalesce(f2.c, 0) + 1.0)
                             - ln(nu + v) end) / count(*)
                     as logprob_per_bigram
            from sp p
            left join bf on p.w1 = bf.w1 and p.w2 = bf.w2
            left join uf f1 on p.w1 = f1.tok
            left join uf f2 on p.w2 = f2.tok, un
            group by p.doc_id""",
        # importance_resample: both unigram LMs, the per-doc score and
        # the splitmix selection chain reproduced in SQL (tau=1, seed=0)
        "importance_resample": f"""
            with rawd as (select doc_id, text from documents
                          where doc_id >= 100),
            tgtd as (select text from documents where doc_id < 100),
            rt as (select doc_id,
                          unnest(list_filter(
                              string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) as tok
                   from rawd),
            tt as (select unnest(list_filter(
                              string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) as tok
                   from tgtd),
            rf as (select tok, count(*) as cr from rt group by tok),
            tf as (select tok, count(*) as ct from tt group by tok),
            rn as (select cast(sum(cr) as double) as nr from rf),
            tn as (select cast(coalesce(sum(ct), 0) as double) as nt
                   from tf),
            vu as (select cast(count(*) as double) as v from
                   (select tok from rf union select tok from tf)),
            diff as (
              select rf.tok,
                     ln((coalesce(tf.ct, 0) + 1.0) / (nt + v))
                       - ln(cr / nr) as d
              from rf left join tf using (tok), rn, tn, vu),
            scored as (
              select rt.doc_id, count(*) as n_tokens,
                     sum(d) / count(*) as score
              from rt join diff using (tok)
              group by rt.doc_id),
            h0 as (select doc_id, n_tokens, score,
                     cast(doc_id as hugeint) % 18446744073709551616 as x
                   from scored),
            h1 as (select doc_id, n_tokens, score,
                     {_splitmix_mul_sql('xor(x, x >> 30)', 0xBF58476D1CE4E5B9)} as x
                   from h0),
            h2 as (select doc_id, n_tokens, score,
                     {_splitmix_mul_sql('xor(x, x >> 27)', 0x94D049BB133111EB)} as x
                   from h1),
            h3 as (select doc_id, n_tokens, score,
                     xor(x, x >> 31) as x from h2)
            select doc_id, n_tokens,
                   score as log_importance_per_token
            from h3
            where x % 10000 <
                  floor(10000 * least(1.0, exp(score) / 1.0))
        """,
        # shuffle_export: same splitmix64 chain as hash_sample, seed 0
        # (no xor), shard = x % 8, pos = dense order by (x, doc_id)
        "shuffle_export": f"""
            with h0 as (
              select doc_id, lang,
                     cast(doc_id as hugeint) % 18446744073709551616 as x
              from documents),
            h1 as (select doc_id, lang,
                     {_splitmix_mul_sql('xor(x, x >> 30)', 0xBF58476D1CE4E5B9)} as x
                   from h0),
            h2 as (select doc_id, lang,
                     {_splitmix_mul_sql('xor(x, x >> 27)', 0x94D049BB133111EB)} as x
                   from h1),
            h3 as (select doc_id, lang, xor(x, x >> 31) as x from h2)
            select doc_id, lang, cast(x % 8 as bigint) as shard,
                   cast(row_number() over (partition by x % 8
                                           order by x, doc_id) - 1
                        as bigint) as pos
            from h3
        """,
        "line_dedup": """
            with words as (
              select doc_id,
                     unnest(string_split(text, ' ')) as w,
                     generate_subscripts(string_split(text, ' '), 1) as wi
              from documents),
            lines as (
              select doc_id, cast((wi - 1) // 10 as bigint) as line_idx,
                     string_agg(w, ' ' order by wi) as line
              from words group by doc_id, (wi - 1) // 10),
            winners as (
              select doc_id, line_idx, line,
                     row_number() over (partition by line
                                        order by doc_id, line_idx) as rn
              from lines)
            select doc_id, string_agg(line, chr(10) order by line_idx) as text
            from winners where rn = 1
            group by doc_id
        """,
        # connected components as recursive-CTE transitive closure:
        # walk enumerates every (node, reachable node) pair over the
        # bidirected pair edges (UNION dedups, so it terminates);
        # component = min reachable node; singletons label themselves.
        "dup_clusters": """
            with recursive pairs as (
              select a.vec_id as id_a, b.vec_id as id_b
              from embeddings a join embeddings b on a.vec_id < b.vec_id
              where list_cosine_similarity(cast(a.embedding as double[]),
                                           cast(b.embedding as double[]))
                    >= 0.35),
            bidir as (
              select id_a as a, id_b as b from pairs
              union all
              select id_b, id_a from pairs),
            walk(node, reach) as (
              select a, a from bidir group by a
              union
              select w.node, b.b
              from walk w join bidir b on b.a = w.reach),
            comp as (
              select node, min(reach) as component from walk group by node)
            select e.vec_id, e.label,
                   coalesce(c.component, e.vec_id) as component
            from embeddings e left join comp c on c.node = e.vec_id
        """,
        "grouped_topn": """
            select o_orderkey, o_custkey, o_totalprice
            from orders
            qualify row_number() over (
                partition by o_custkey
                order by o_totalprice desc, o_orderkey) <= 3
        """,
        "pii_redact": f"""
            with seeded as (
              select doc_id,
                     text || ' contact user' || doc_id ||
                     '@example.com ip 10.0.' || doc_id ||
                     '.7 tel +1 555 010 ' || doc_id ||
                     ' ssn 123-45-6789' as text
              from documents)
            select doc_id,
              regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                text,
                '{_PII_SQL[0]}', '<EMAIL>', 'g'),
                '{_PII_SQL[1]}', '<IP>', 'g'),
                '{_PII_SQL[2]}', '<PHONE>', 'g'),
                '{_PII_SQL[3]}', '<SSN>', 'g') as text
            from seeded
        """,
        "melt": """
            select l_orderkey, l_linenumber, metric, val
            from (select l_orderkey, l_linenumber, l_quantity,
                         l_extendedprice, l_discount from lineitem)
            unpivot (val for metric in
                     (l_quantity, l_extendedprice, l_discount))
        """,
        "set_except": """
            select l_partkey, l_suppkey from lineitem
            where l_discount >= 0.06
            except
            select l_partkey, l_suppkey from lineitem
            where l_discount <= 0.02
        """,
        "set_intersect": """
            select l_partkey, l_suppkey from lineitem
            where l_discount >= 0.06
            intersect
            select l_partkey, l_suppkey from lineitem
            where l_discount <= 0.02
        """,
        "distinct_rows": """
            select distinct l_suppkey, l_returnflag, l_linestatus
            from lineitem
        """,
        "pivot_agg": """
            pivot (select l_suppkey, l_returnflag, l_quantity from lineitem)
            on l_returnflag using sum(l_quantity) group by l_suppkey
        """,
        "window_rank": """
            select o_orderkey, o_custkey, o_totalprice,
                   rank() over (partition by o_custkey
                                order by o_totalprice desc) as rnk
            from orders
        """,
        "window_ntile": """
            select o_orderkey, o_custkey, o_totalprice,
                   percent_rank() over w as pct,
                   cume_dist() over w as cume,
                   ntile(4) over (partition by o_custkey
                                  order by o_totalprice, o_orderkey) as tile
            from orders
            window w as (partition by o_custkey order by o_totalprice)
        """,
        # splitmix64 chain on l_orderkey (seed 5); survive iff
        # hash mod 10 < l_linenumber
        "weighted_sample": f"""
            with h0 as (
              select l_orderkey, l_linenumber, l_quantity,
                     cast(l_orderkey as hugeint) % 18446744073709551616 as x
              from lineitem),
            h1 as (select l_orderkey, l_linenumber, l_quantity,
                     {_splitmix_mul_sql('xor(x, x >> 30)', 0xBF58476D1CE4E5B9)} as x
                   from h0),
            h2 as (select l_orderkey, l_linenumber, l_quantity,
                     {_splitmix_mul_sql('xor(x, x >> 27)', 0x94D049BB133111EB)} as x
                   from h1),
            h3 as (select l_orderkey, l_linenumber, l_quantity,
                     xor(xor(x, x >> 31), 1663341875487337577) as x
                   from h2)
            select l_orderkey, l_linenumber, l_quantity from h3
            where x % 10 < l_linenumber
        """,
        "group_normalize": """
            select l_orderkey, l_linenumber, l_suppkey, l_quantity,
                   (l_quantity - avg(l_quantity) over w)
                     / stddev_samp(l_quantity) over w as l_quantity_z
            from lineitem window w as (partition by l_suppkey)
        """,
        # second source (seed 11+1=12) sampled at 30%: splitmix64 chain
        # with xor constant (12 * golden) mod 2^64
        "corpus_mix": f"""
            select doc_id, lang, source from documents where lang = 'en'
            union all
            select doc_id, lang, source from (
              with h0 as (
                select doc_id, lang, source,
                       cast(doc_id as hugeint) % 18446744073709551616 as x
                from documents where lang <> 'en'),
              h1 as (select doc_id, lang, source,
                       {_splitmix_mul_sql('xor(x, x >> 30)', 0xBF58476D1CE4E5B9)} as x
                     from h0),
              h2 as (select doc_id, lang, source,
                       {_splitmix_mul_sql('xor(x, x >> 27)', 0x94D049BB133111EB)} as x
                     from h1),
              h3 as (select doc_id, lang, source,
                       xor(xor(x, x >> 31), 7681369315911520508) as x
                     from h2)
              select doc_id, lang, source from h3
              where x % 10000 < 3000)
        """,
        # 32-word chunks advancing by 24; W words -> ceil(W/24) chunks
        # (W=0 still gives one chunk: split('') = [''], len 1)
        "sentences": _sentences_sql(),
        "chunk_words": """
            with words as (
              select doc_id, string_split(text, ' ') as w from documents),
            n as (
              select doc_id, w,
                     greatest(1, cast(ceil(len(w) / 24.0) as bigint)) as nc
              from words),
            c as (
              select doc_id, w, unnest(range(nc)) as chunk_idx from n)
            select doc_id, chunk_idx,
                   array_to_string(
                     list_slice(w, chunk_idx * 24 + 1, chunk_idx * 24 + 32),
                     ' ') as text
            from c
        """,
        # same splitmix64 SQL chain as hash_sample (seed 7), then a
        # per-language rank on the hash value
        "stratified_sample": f"""
            with h0 as (
              select doc_id, lang, source,
                     cast(doc_id as hugeint) % 18446744073709551616 as x
              from documents),
            h1 as (select doc_id, lang, source,
                     {_splitmix_mul_sql('xor(x, x >> 30)', 0xBF58476D1CE4E5B9)} as x
                   from h0),
            h2 as (select doc_id, lang, source,
                     {_splitmix_mul_sql('xor(x, x >> 27)', 0x94D049BB133111EB)} as x
                   from h1),
            h3 as (select doc_id, lang, source,
                     xor(xor(x, x >> 31), 6018027440424182931) as x
                   from h2)
            select doc_id, lang, source from h3
            qualify row_number() over (partition by lang
                                       order by x, doc_id) <= 20
        """,
        "repetition_signals": _repetition_sql(),
        "normalize_text": """
            select doc_id,
                   lower(trim(regexp_replace(regexp_replace(
                       nfc_normalize('Cafe' || chr(769) || chr(9) || ' '
                                     || text || '  X' || chr(127) || 'Y'),
                       '[\\x00-\\x1f\\x7f]', '', 'g'),
                       '\\s+', ' ', 'g'))) as text
            from documents""",
        "top_ngrams": """
            with words as (
              select doc_id,
                     unnest(string_split(text, ' ')) as w,
                     generate_subscripts(string_split(text, ' '), 1) as wi
              from documents),
            big as (
              select w || ' ' ||
                     lead(w) over (partition by doc_id order by wi) as g
              from words)
            select g as gram, count(*) as n
            from big where g is not null
            group by g
            order by n desc, gram
            limit 50
        """,
        "substring_dedup": r"""
            with toks as (
              select doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') as w
              from documents
            ), grams as (
              select doc_id, i, array_to_string(w[i:i+7], ' ') as g
              from toks, unnest(range(1, len(w) - 6)) as t(i)
              where len(w) >= 8
            ), dup as (
              select g from grams group by g
              having count(distinct doc_id) > 1
            ), hits as (
              select doc_id, i from grams join dup using (g)
            ), spans as (
              select doc_id, i,
                     lead(i) over (partition by doc_id order by i) as nxt
              from hits
            )
            select doc_id,
                   count(*) as dup_grams,
                   cast(sum(case when nxt is null then 8
                            else least(nxt - i, 8) end) as bigint)
                     as covered_tokens
            from spans group by doc_id order by doc_id""",
        "dedup_against": r"""
            select doc_id, text from documents
            where doc_id % 7 <> 0
              and md5(regexp_replace(lower(text), '\s', '', 'g')) not in (
                select md5(regexp_replace(lower(text), '\s', '', 'g'))
                from documents where doc_id % 7 = 0)
            order by doc_id""",
        "range_window": """
            with e as (
              select event_id, user_id, value,
                     epoch_ms(date_trunc('milliseconds', ts)) as ts_ms
              from events
            )
            select event_id, user_id, ts_ms,
                   sum(value) over (
                     partition by user_id order by ts_ms
                     range between 3600000 preceding and current row)
                     as w_sum
            from e order by event_id""",
        "unigram_logprob": r"""
            with toks as (
              select doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') as w
              from documents
            ), flat as (
              select doc_id, unnest(w) as tok from toks
            ), freq as (
              select tok, count(*) as c from flat group by tok
            ), tot as (
              select sum(c) as tc from freq
            )
            select doc_id,
                   count(*) as n_tokens,
                   sum(ln(c / tc)) / count(*) as logprob_per_token
            from flat join freq using (tok), tot
            group by doc_id order by doc_id""",
        "bm25": r"""
            with toks as (
              select doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') as w
              from documents
            ), stats as (
              select count(*) as n, sum(len(w)) / count(*) as avgdl
              from toks
            ), q(term) as (values ('hash'), ('join'), ('filter')),
            flat as (
              select doc_id, unnest(w) as tok from toks
            ), tf as (
              select doc_id, tok as term, count(*)::double as tf
              from flat join q on tok = term group by 1, 2
            ), df as (
              select term, count(distinct doc_id)::double as df
              from flat join q on tok = term group by 1
            ), dl as (
              select doc_id, len(w)::double as dl from toks
            )
            select t.doc_id,
                   round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                             * tf * (1.2 + 1)
                             / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))),
                         4) as bm25
            from tf t join df using (term) join dl using (doc_id), stats
            group by t.doc_id order by t.doc_id""",
        "sessionize": """
            with e as (
              select event_id, user_id,
                     epoch_ms(date_trunc('milliseconds', ts)) as ts_ms
              from events
            ), g as (
              select *, case when ts_ms - lag(ts_ms) over w > 1800000
                             then 1 else 0 end as brk
              from e window w as (partition by user_id
                                  order by ts_ms, event_id)
            )
            select event_id, user_id, ts_ms,
                   cast(sum(brk) over (partition by user_id
                                  order by ts_ms, event_id
                                  rows unbounded preceding) as bigint)
                       as session_id
            from g order by event_id""",
        "rollup": """
            select lang, source,
                   count(n_chars) as n_docs,
                   cast(sum(n_chars) as bigint) as sum_chars
            from documents
            group by rollup(lang, source)
            order by lang nulls last, source nulls last""",
        "regex_extract": """
            select event_id,
                   nullif(regexp_extract(props, '"k":\\s*(\\d+)', 1), '')
                       as kval
            from events
            order by event_id""",
        "role_alternation": _BINLOG_CTE + """
            , w as (
              select conv_id, role,
                     lag(role) over (partition by conv_id
                                     order by turn_idx, lsn) as prev
              from e where op = 'I'
            )
            select conv_id, cast(count(*) as bigint) as n_turns,
                   cast(sum(case when role = prev then 1 else 0 end)
                        as bigint) as n_repeats
            from w group by conv_id order by conv_id""",
        "expectations": """
            select 'not_null' as rule, 'l_orderkey' as "column",
                   cast(sum(case when l_orderkey is null then 1 else 0
                            end) as bigint) as violations,
                   cast(count(*) as bigint) as "rows",
                   sum(case when l_orderkey is null then 1 else 0
                       end) = 0 as passed
            from lineitem
            union all
            select 'between', 'l_quantity',
                   cast(sum(case when l_quantity is not null and
                            (l_quantity < 1 or l_quantity > 50)
                            then 1 else 0 end) as bigint),
                   cast(count(*) as bigint),
                   sum(case when l_quantity is not null and
                       (l_quantity < 1 or l_quantity > 50)
                       then 1 else 0 end) = 0
            from lineitem
            union all
            select 'in_set', 'l_returnflag',
                   cast(sum(case when l_returnflag is not null and
                            l_returnflag not in ('A','N','R')
                            then 1 else 0 end) as bigint),
                   cast(count(*) as bigint),
                   sum(case when l_returnflag is not null and
                       l_returnflag not in ('A','N','R')
                       then 1 else 0 end) = 0
            from lineitem
            union all
            select 'max_le', 'l_discount',
                   cast(sum(case when l_discount is not null and
                            l_discount > 0.08 then 1 else 0 end)
                        as bigint),
                   cast(count(*) as bigint),
                   sum(case when l_discount is not null and
                       l_discount > 0.08 then 1 else 0 end) = 0
            from lineitem
            union all
            select 'null_fraction_le', 'l_linestatus',
                   cast(sum(case when l_linestatus is null then 1 else 0
                            end) as bigint),
                   cast(count(*) as bigint),
                   (sum(case when l_linestatus is null then 1.0 else 0.0
                        end) / count(*)) <= 0.5
            from lineitem
            union all
            select 'unique', 'l_orderkey',
                   cast(count(l_orderkey) - count(distinct l_orderkey)
                        as bigint),
                   cast(count(*) as bigint),
                   count(l_orderkey) = count(distinct l_orderkey)
            from lineitem""",
        "embedding_cov": " union all ".join(
            f"select cast({i} as bigint) as dim_a, "
            f"cast({j} as bigint) as dim_b, "
            f"covar_samp(embedding[{i + 1}], embedding[{j + 1}]) as cov "
            f"from embeddings"
            for i in range(8) for j in range(i, 8)
        ) + " order by dim_a, dim_b",
        "quantile_bucket": """
            with q as (
              select l_returnflag,
                     quantile_disc(l_extendedprice, 0.25) as t1,
                     quantile_disc(l_extendedprice, 0.50) as t2,
                     quantile_disc(l_extendedprice, 0.75) as t3
              from lineitem group by l_returnflag
            )
            select l.l_orderkey, l.l_linenumber, l.l_returnflag,
                   l.l_extendedprice,
                   cast((case when l.l_extendedprice >= q.t1 then 1
                              else 0 end)
                      + (case when l.l_extendedprice >= q.t2 then 1
                              else 0 end)
                      + (case when l.l_extendedprice >= q.t3 then 1
                              else 0 end) as bigint) as bucket
            from lineitem l join q using (l_returnflag)
            order by l.l_orderkey, l.l_linenumber""",
        "winsorize": """
            with q as (
              select l_returnflag,
                     quantile_disc(l_extendedprice, 0.05) as lo,
                     quantile_disc(l_extendedprice, 0.95) as hi
              from lineitem group by l_returnflag
            )
            select l.l_orderkey, l.l_linenumber, l.l_returnflag,
                   l.l_extendedprice,
                   least(greatest(l.l_extendedprice, q.lo), q.hi)
                       as price_w
            from lineitem l join q using (l_returnflag)
            order by l.l_orderkey, l.l_linenumber""",
        "tool_cooccurrence": _BINLOG_CTE + """
            , dt as (select distinct conv_id, tool from e
                     where tool is not null),
            n as (select cast(count(distinct conv_id) as bigint)
                      as total from dt),
            s as (select tool, cast(count(*) as bigint) as cnt
                  from dt group by tool),
            p as (select a.tool as tool_a, b.tool as tool_b,
                         cast(count(*) as bigint) as n_ab
                  from dt a join dt b on a.conv_id = b.conv_id
                       and a.tool < b.tool
                  group by a.tool, b.tool)
            select p.tool_a, p.tool_b, p.n_ab,
                   sa.cnt as n_a, sb.cnt as n_b,
                   p.n_ab / (select total from n) as support,
                   (p.n_ab * (select total from n))
                       / (sa.cnt * sb.cnt) as lift
            from p
            join s sa on sa.tool = p.tool_a
            join s sb on sb.tool = p.tool_b
            order by tool_a, tool_b""",
        "grouped_top_values": _BINLOG_CTE + """
            , c as (
              select conv_id, tool, cast(count(*) as bigint) as cnt
              from e where tool is not null
              group by conv_id, tool)
            select conv_id, tool, cnt,
                   cast(row_number() over (partition by conv_id
                        order by cnt desc, tool asc) as bigint) as rk
            from c
            qualify rk <= 3
            order by conv_id, rk""",
        "grouped_mode": _BINLOG_CTE + """
            , c as (
              select conv_id, tool, cast(count(*) as bigint) as cnt
              from e where tool is not null
              group by conv_id, tool
            ), r as (
              select *, row_number() over (partition by conv_id
                        order by cnt desc, tool asc) as rn
              from c
            )
            select conv_id, tool as mode, cnt from r where rn = 1
            order by conv_id""",
        "key_skew": _BINLOG_CTE + """
            , c as (
              select conv_id as value, cast(count(*) as bigint) as cnt
              from e group by conv_id
            ), t as (select sum(cnt) as total from c)
            select value, cnt,
                   cnt / (select total from t) as share,
                   sum(cnt / (select total from t)) over (
                       order by cnt desc, value asc
                       rows between unbounded preceding and current row)
                       as cum_share
            from c
            order by cnt desc, value asc
            limit 20""",
        "fuzzy_pairs": """
            select c1.c_custkey as id_a, c2.c_custkey as id_b,
                   levenshtein(c1.c_name, c2.c_name) as dist
            from customer c1
            join customer c2 on c1.c_custkey < c2.c_custkey
            where levenshtein(c1.c_name, c2.c_name) <= 1
            order by id_a, id_b""",
        "merge_intervals": """
            with iv as (
              select l_suppkey as suppkey,
                     epoch_ms(l_shipdate) // 86400000 as s_day,
                     epoch_ms(l_shipdate) // 86400000
                       + cast(l_quantity as bigint) as e_day
              from lineitem),
            m as (select *, max(e_day) over
                    (partition by suppkey order by s_day, e_day
                     rows between unbounded preceding and 1 preceding)
                    as pmax from iv),
            g as (select *, sum(case when pmax is null or s_day > pmax
                                     then 1 else 0 end) over
                    (partition by suppkey order by s_day, e_day
                     rows unbounded preceding) as isl from m)
            select suppkey, min(s_day) as s_day, max(e_day) as e_day,
                   count(*) as n
            from g group by suppkey, isl""",
        "ffill_tool": _BINLOG_CTE + """
            select conv_id, lsn, op,
                   last_value(role ignore nulls) over (
                       partition by conv_id order by lsn
                       rows between unbounded preceding and current row)
                       as role,
                   last_value(tool ignore nulls) over (
                       partition by conv_id order by lsn
                       rows between unbounded preceding and current row)
                       as tool
            from e
            order by conv_id, lsn""",
        "turn_offsets": _BINLOG_CTE + """
            , p as (
              select conv_id, turn_idx, lsn, role,
                     length(coalesce(role, '') || ': ' ||
                            coalesce(text, '')) as plen
              from e where op = 'I')
            select conv_id, turn_idx, lsn, role,
                   cast(coalesce(sum(plen + 1) over (
                        partition by conv_id
                        order by turn_idx, lsn
                        rows between unbounded preceding
                        and 1 preceding), 0) as bigint) as start_off,
                   cast(coalesce(sum(plen + 1) over (
                        partition by conv_id
                        order by turn_idx, lsn
                        rows between unbounded preceding
                        and 1 preceding), 0) + plen as bigint)
                       as end_off,
                   coalesce(role = 'assistant', false) as is_target
            from p""",
        "render_transcripts": _BINLOG_CTE + """
            select conv_id,
                   string_agg(role || ': ' || coalesce(text, ''), chr(10)
                              order by turn_idx, lsn) as rendered,
                   cast(count(*) as bigint) as n_turns
            from e where op = 'I'
            group by conv_id
            order by conv_id""",
        "pagerank": _pagerank_sql(),
        "pagerank_personalized": _pagerank_sql(seed_node=0),
        "pairwise_corr": _corr_sql(),
        "grouped_linreg": """
            with s as (
              select l_returnflag,
                     cast(count(*) as hugeint) as n,
                     cast(sum(cast(round(l_quantity) as bigint))
                          as hugeint) as sx,
                     cast(sum(cast(round(l_extendedprice * 100) as bigint))
                          as hugeint) as sy,
                     cast(sum(cast(round(l_quantity) as bigint)
                              * cast(round(l_quantity) as bigint))
                          as hugeint) as sxx,
                     cast(sum(cast(round(l_quantity) as bigint)
                              * cast(round(l_extendedprice * 100) as bigint))
                          as hugeint) as sxy
              from lineitem
              group by l_returnflag
            )
            select l_returnflag, cast(n as bigint) as n,
                   round(cast(n * sxy - sx * sy as double)
                         / cast(n * sxx - sx * sx as double), 6) as slope,
                   round((cast(sy as double)
                          - (cast(n * sxy - sx * sy as double)
                             / cast(n * sxx - sx * sx as double))
                            * cast(sx as double))
                         / cast(n as double), 6) as intercept
            from s order by l_returnflag""",
        "web_pipeline": """
            with ok as (
              select doc_id, lang, source from documents
              where len(regexp_extract_all(lower(coalesce(text, '')),
                        '\\b(?:spark|slow|dup|big)\\b')) = 0
            ), u as (
              select doc_id, source || '.example.com' as host from ok
              union all
              select doc_id, 'mirror-' || lang || '.example.org' as host
              from ok
            )
            select host, cast(count(*) as bigint) as n_links,
                   cast(count(distinct doc_id) as bigint) as n_docs
            from u group by host order by host""",
        "ewma": """
            with w as (
              select event_id, user_id, value,
                     row_number() over (partition by user_id
                                        order by ts, event_id) as rn
              from events
            )
            select a.event_id,
                   round(sum(power(0.7, a.rn - b.rn) * b.value)
                         / sum(power(0.7, a.rn - b.rn)), 6) as ewma
            from w a join w b
              on a.user_id = b.user_id and b.rn <= a.rn
            group by a.event_id
            order by a.event_id""",
        "html_extract": """
            select doc_id,
                   'doc ' || cast(doc_id as varchar) as title,
                   'doc ' || cast(doc_id as varchar) || chr(10) || text
                       || chr(10) || 'l0' || chr(10) || 'l1' as body_text,
                   cast(2 as bigint) as n_links
            from documents
            order by doc_id""",
        "url_extract": """
            with u as (
              select doc_id, source || '.example.com' as host
              from documents
              union all
              select doc_id, 'mirror-' || lang || '.example.org' as host
              from documents
            )
            select host, cast(count(*) as bigint) as n_urls,
                   cast(count(distinct doc_id) as bigint) as n_pages
            from u group by host order by host""",
        "blocklist_tag": """
            select doc_id,
                   cast(len(regexp_extract_all(lower(coalesce(text, '')),
                        '\\b(?:spark|slow|dup|big)\\b')) as bigint)
                       as n_hits,
                   len(regexp_extract_all(lower(coalesce(text, '')),
                       '\\b(?:spark|slow|dup|big)\\b')) > 0 as flagged
            from documents
            order by doc_id""",
        "warc_source": """
            with h as (
              select source || '.example.com' as host,
                     strlen('<html><head><title>doc '
                       || cast(doc_id as varchar)
                       || '</title><style>p{margin:0}</style></head>'
                       || '<body><script>var x=1;</script><h1>doc '
                       || cast(doc_id as varchar) || '</h1><p>' || text
                       || '</p><a href="https://' || source
                       || '.example.com/d/' || cast(doc_id % 97 as varchar)
                       || '">l0</a> <a href="http://mirror-' || lang
                       || '.example.org/d/' || cast(doc_id % 13 as varchar)
                       || '?x=1#f">l1</a></body></html>') as nbytes
              from documents
            )
            select host, cast(count(*) as bigint) as n_pages,
                   cast(sum(nbytes) as bigint) as sum_bytes
            from h group by host order by host""",
        "json_extract": """
            select event_type,
                   cast(sum(cast(json_extract_string(props, '$.k')
                                 as bigint)) as bigint) as sum_k,
                   round(avg(cast(json_extract_string(props, '$.k')
                                  as bigint)), 6) as avg_k,
                   count(json_extract_string(props, '$.k')) as n
            from events
            group by event_type
            order by event_type""",
        "tpch_q3": """
            with rev as (
              select l_orderkey, o_orderdate, o_orderpriority,
                     sum(cast(round(l_extendedprice * 100, 0) as bigint)
                         * (100 - cast(round(l_discount * 100, 0) as bigint)))
                       as units
              from lineitem
              join orders on l_orderkey = o_orderkey
              join customer on o_custkey = c_custkey
              where c_mktsegment = 'BUILDING'
                and o_orderdate < timestamp '1998-07-01'
                and l_shipdate > timestamp '1998-07-01'
              group by 1, 2, 3)
            select l_orderkey, round(units / 10000.0, 4) as revenue,
                   o_orderdate, o_orderpriority
            from rev
            qualify row_number() over
                (order by units desc, o_orderdate, l_orderkey) <= 10""",
        "tpch_q5": """
            select n_name,
                   round(sum(cast(round(l_extendedprice * 100, 0) as bigint)
                         * (100 - cast(round(l_discount * 100, 0) as bigint)))
                         / 10000.0, 4) as revenue
            from lineitem
            join orders on l_orderkey = o_orderkey
            join customer on o_custkey = c_custkey
            join supplier on l_suppkey = s_suppkey
            join nation on s_nationkey = n_nationkey
            join region on n_regionkey = r_regionkey
            where r_name = 'ASIA'
              and c_nationkey = s_nationkey
              and o_orderdate >= timestamp '1997-01-01'
              and o_orderdate < timestamp '1998-01-01'
            group by 1""",
        "tpch_q10": """
            with rev as (
              select o_custkey,
                     sum(cast(round(l_extendedprice * 100, 0) as bigint)
                         * (100 - cast(round(l_discount * 100, 0) as bigint)))
                       as units
              from lineitem
              join orders on l_orderkey = o_orderkey
              where l_returnflag = 'R'
                and o_orderdate >= timestamp '1998-01-01'
                and o_orderdate < timestamp '1998-04-01'
              group by 1)
            select c_custkey, c_name, c_acctbal, n_name,
                   round(units / 10000.0, 4) as revenue
            from rev
            join customer on o_custkey = c_custkey
            join nation on c_nationkey = n_nationkey
            qualify row_number() over (order by units desc, c_custkey) <= 20""",
        "tpch_q14": """
            select round((100.0 * cast(sum(case when p_type = 'PROMO'
                                               then units else 0 end)
                                       as double))
                         / cast(sum(units) as double), 6) as promo_share
            from (select l_partkey,
                         cast(round(l_extendedprice * 100, 0) as bigint)
                         * (100 - cast(round(l_discount * 100, 0) as bigint))
                           as units
                  from lineitem
                  where l_shipdate >= timestamp '1998-09-01'
                    and l_shipdate < timestamp '1998-10-01') li
            join part on l_partkey = p_partkey""",
        "sql_groupby": _SQL_GROUPBY,
        "sql_join": _SQL_JOIN,
        "sql_case": _SQL_CASE,
        "sql_window": _SQL_WINDOW,
        "sql_union": _SQL_UNION,
        "sql_cube": _SQL_CUBE,
        "sql_filter": _SQL_FILTER,
        "sql_insub": _SQL_INSUB,
        "sql_outerjoin": _SQL_OUTERJOIN,
        "sql_exists": _SQL_EXISTS,
        "sql_lag": _SQL_LAG,
        "sql_winagg": _SQL_WINAGG,
        "sql_frames": _SQL_FRAMES,
        "sql_range_frame": _SQL_RANGE_FRAME,
        "sql_tpch_q17": _SQL_TPCH_Q17,
        "sql_tpch_q3": _SQL_TPCH_Q3,
        "sql_tpch_q4": _SQL_TPCH_Q4,
        "sql_tpch_q5": _SQL_TPCH_Q5,
        "sql_tpch_q22": _SQL_TPCH_Q22,
        "sql_tpch_q10": _SQL_TPCH_Q10,
        "sql_tpch_q14": _SQL_TPCH_Q14,
        "sql_recursive": _SQL_RECURSIVE,
        "sql_groupexpr": _SQL_GROUPEXPR,
        "sql_tpch_q1": _SQL_TPCH_Q1,
        "sql_tpch_q6": _SQL_TPCH_Q6,
        "sql_tpch_q7": _SQL_TPCH_Q7,
        "sql_tpch_q8": _SQL_TPCH_Q8,
        "sql_tpch_q12": _SQL_TPCH_Q12,
        "sql_tpch_q13": _SQL_TPCH_Q13,
        "sql_tpch_q15": _SQL_TPCH_Q15,
        "sql_tpch_q19": _SQL_TPCH_Q19,
        "sql_tpch_q21": _SQL_TPCH_Q21,
        "sql_tpch_q18": _SQL_TPCH_Q18,
        "sql_tpch_q2": _SQL_TPCH_Q2,
        "sql_tpch_q9": _SQL_TPCH_Q9,
        "sql_tpch_q11": _SQL_TPCH_Q11,
        "sql_tpch_q16": _SQL_TPCH_Q16,
        "sql_tpch_q20": _SQL_TPCH_Q20,
        "tpch_q18": """
            select c_name, o_custkey, o_orderkey, o_orderdate,
                   o_totalprice, sum_qty
            from (select l_orderkey,
                         cast(sum(cast(l_quantity as bigint)) as bigint)
                           as sum_qty
                  from lineitem group by l_orderkey
                  having sum(cast(l_quantity as bigint)) > 180) big
            join orders on o_orderkey = l_orderkey
            join customer on c_custkey = o_custkey""",
        # text_stats / minhash_neardup / simhash_neardup / embedding_neardup /
        # hll_distinct: non-SQL-expressible (model scoring, sketches,
        # approximations) — rows-only driver check by design.
    }
