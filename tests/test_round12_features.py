"""Round-12 session: precision + robustness fixes from round-4 ADVICE,
and the SQL-frontend surface that lifted TPC-H coverage to 16 queries:

- exact int64 running MIN/MAX when |v| >= 2^53 (float64 kernels would
  silently round; ``misc.py`` now takes a sentinel int64 path)
- rolling (bounded-frame) MIN/MAX over such values raises loudly
- table aliases + qualified references + self-joins (scope-resolution
  pass with physical renames of colliding columns)
- EXTRACT(part FROM expr)
- schema-aware JOIN ON key-side orientation (either order round)
- non-equality residual ON conjuncts (inner post-filter / outer-side
  pre-filter)
- [NOT] EXISTS with an ``inner.c <> outer.c`` conjunct decorrelated to
  a grouped MIN/MAX left join (TPC-H Q21)
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datavec_ray.sql import SqlError, sql
from datavec_ray.util import dataset_to_table


@pytest.fixture(scope="module")
def sj_frames():
    rng = np.random.default_rng(7)
    n = 400
    edges = pd.DataFrame({
        "src": rng.integers(0, 12, n),
        "dst": rng.integers(0, 12, n),
        "w": rng.integers(1, 100, n),
        "eid": np.arange(n),
    })
    nodes = pd.DataFrame({
        "nid": np.arange(12),
        "label": [f"N{i % 4}" for i in range(12)],
        "score": rng.integers(0, 50, 12),
    })
    items = pd.DataFrame({
        "oid": rng.integers(0, 60, 300),
        "sid": rng.integers(0, 9, 300),
        "flag": rng.choice(["R", "A", "N"], 300),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 500 * 24, 300), unit="h"),
    })
    return {"edges": edges, "nodes": nodes, "items": items}


@pytest.fixture(scope="module")
def sj_tables(ray_session, sj_frames):
    import ray.data as rd
    return {k: rd.from_pandas(v).repartition(3)
            for k, v in sj_frames.items()}


@pytest.fixture(scope="module")
def sj_ddb(sj_frames):
    con = duckdb.connect()
    for k, v in sj_frames.items():
        con.register(k, v)
    return con


def _cmp(name, ray_ds, want):
    got = dataset_to_table(ray_ds).to_pandas()
    assert sorted(got.columns) == sorted(want.columns), \
        (name, list(got.columns), list(want.columns))
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(g) == len(w), (name, len(g), len(w))
    for c in cols:
        if g[c].dtype.kind == "f" or w[c].dtype.kind == "f":
            assert np.allclose(g[c].astype(float), w[c].astype(float),
                               rtol=1e-9, equal_nan=True), (name, c)
        else:
            assert (g[c].astype(str).values
                    == w[c].astype(str).values).all(), (name, c)


SJ_STMTS = [
    # self-join with aliases: qualified refs on both instances; the
    # second instance's colliding columns are physically renamed
    "select a.label as src_label, b.label as dst_label, "
    "count(*) as n, sum(w) as tot from edges "
    "join nodes a on src = a.nid "
    "join nodes b on dst = b.nid "
    "where a.label <> b.label "
    "group by a.label, b.label "
    "order by src_label asc, dst_label asc",
    # EXTRACT parts vs DuckDB
    "select extract(year from ts) as y, extract(month from ts) as m, "
    "extract(day from ts) as d, extract(hour from ts) as h, "
    "count(*) as n from items group by extract(year from ts), "
    "extract(month from ts), extract(day from ts), "
    "extract(hour from ts) order by y asc, m asc, d asc, h asc",
    # ON key order: right table's column first (q19 shape)
    "select label, count(*) as n from edges "
    "join nodes on nid = src group by label order by label asc",
    # INNER join with a non-equality residual ON conjunct
    "select label, count(*) as n from edges "
    "join nodes on src = nid and w > score "
    "group by label order by label asc",
    # LEFT JOIN with a right-side residual ON conjunct + count(col)
    "select cnt, count(*) as freq from ("
    "  select nid, count(eid) as cnt from nodes "
    "  left outer join edges on nid = src and w >= 50 "
    "  group by nid) as t group by cnt order by freq desc, cnt desc",
    # <>-correlated EXISTS and NOT EXISTS (TPC-H Q21 shape)
    "select e1.eid from edges e1 where "
    "exists (select * from edges e2 where e2.src = e1.src "
    "        and e2.dst <> e1.dst) "
    "order by eid asc limit 50",
    "select e1.eid from edges e1 where "
    "not exists (select * from edges e2 where e2.src = e1.src "
    "            and e2.dst <> e1.dst and e2.w > 90) "
    "order by eid asc limit 50",
    # qualified refs inside derived tables
    "select lbl, sum(ww) as s from ("
    "  select a.label as lbl, w as ww from edges join nodes a "
    "  on src = a.nid where a.score > 10) as d "
    "group by lbl order by lbl asc",
    # correlated scalar COUNT: zero-match outer rows compare against
    # 0 (grouped decorrelation + COALESCE), exactly as ANSI
    "select nid from nodes where score > "
    "(select count(*) as c from edges where src = nid) "
    "order by nid asc",
]


@pytest.mark.parametrize("stmt", SJ_STMTS)
def test_sql_scope_features(sj_tables, sj_ddb, stmt):
    _cmp(stmt[:60], sql(stmt, sj_tables), sj_ddb.sql(stmt).df())


def test_watermark_replan_matches_materialize(ray_session, tmp_path):
    # the re-read watermark path (zero object-store pinning) must
    # produce exactly the materialize-path result on a parquet source
    import pyarrow.parquet as pq
    import ray.data as rd

    from datavec_ray.cdc.watermark import assign_watermarks
    rng = np.random.default_rng(3)
    n = 5000
    t = pd.DataFrame({
        "lsn": np.arange(n),
        "ts": rng.integers(0, 10_000_000, n),
        "v": rng.integers(0, 100, n),
    })
    path = str(tmp_path / "binlog.parquet")
    pq.write_table(__import__("pyarrow").Table.from_pandas(t), path)

    def replan():
        return rd.read_parquet(path)

    a = dataset_to_table(
        assign_watermarks(rd.read_parquet(path), 1000)).to_pandas() \
        .sort_values("lsn").reset_index(drop=True)
    b = dataset_to_table(
        assign_watermarks(rd.read_parquet(path), 1000, replan=replan)) \
        .to_pandas().sort_values("lsn").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert b["is_late"].any()          # non-trivial input


SJ_OUTER_STMTS = [
    # LEFT OUTER self-join: renamed non-key right columns NULL-extend
    "select a.nid, b.label as blabel, b.score as bscore from nodes a "
    "left outer join nodes b on a.score = b.nid order by a.nid asc",
    # FULL OUTER self-join through the bucket co-partition join
    "select a.nid as left_id, b.nid as right_id from nodes a "
    "full outer join nodes b on a.score = b.nid "
    "order by left_id asc, right_id asc",
]


@pytest.mark.parametrize("stmt", SJ_OUTER_STMTS)
def test_sql_outer_self_joins(sj_tables, sj_ddb, stmt):
    _cmp(stmt[:60], sql(stmt, sj_tables), sj_ddb.sql(stmt).df())


def test_sql_scope_refusals(sj_tables):
    # unqualified same-name <> correlation is ambiguous — must refuse
    with pytest.raises(SqlError, match="ambiguous"):
        sql("select eid from edges e1 where exists "
            "(select * from edges e2 where src = src and dst <> dst)",
            sj_tables)
    # residual ON conjunct on the row-preserving side of a LEFT join
    with pytest.raises(SqlError, match="null-supplying"):
        sql("select nid from nodes left join edges "
            "on nid = src and score > 10", sj_tables)
    # duplicate unaliased columns across FROM tables
    with pytest.raises(SqlError, match="alias"):
        sql("select eid from edges join edges on src = dst", sj_tables)
    # alias reuse
    with pytest.raises(SqlError, match="duplicate table alias"):
        sql("select a.eid from edges a join edges a on a.src = a.dst",
            sj_tables)
    # unknown column under a known qualifier is loud
    with pytest.raises(SqlError, match="not found"):
        sql("select a.bogus from nodes a", sj_tables)

BIG = 1 << 60  # far above the 2^53 float64 mantissa bound


@pytest.fixture(scope="module")
def bigint_frame():
    return pd.DataFrame({
        "id": range(8),
        "g": [0, 0, 0, 0, 1, 1, 1, 1],
        "v": pd.array([BIG + 5, None, BIG + 3, BIG + 9,
                       -BIG - 2, -BIG - 7, None, -BIG - 1],
                      dtype="Int64"),
    })


def test_bigint_running_minmax_exact(ray_session, bigint_frame):
    import ray.data as rd
    t = rd.from_pandas(bigint_frame).repartition(2)
    q = ("select id, "
         "min(v) over (partition by g order by id, v "
         "rows unbounded preceding) as lo, "
         "max(v) over (partition by g order by id, v "
         "rows unbounded preceding) as hi from t")
    got = dataset_to_table(sql(q, {"t": t})).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", bigint_frame)
    want = con.sql(q).df().sort_values("id").reset_index(drop=True)
    for c in ("lo", "hi"):
        assert got[c].astype("Int64").equals(want[c].astype("Int64")), \
            (c, got[c].tolist(), want[c].tolist())
    # the float64 kernel would have collapsed BIG+3 / BIG+5 / BIG+9
    assert got["lo"].iloc[3] == BIG + 3
    assert got["hi"].iloc[3] == BIG + 9


def test_bigint_rolling_minmax_exact(ray_session, bigint_frame):
    # bounded ROWS frames route through the exact sparse-table range
    # kernel when |v| >= 2^53 (the float64 rolling kernel would round)
    import ray.data as rd
    t = rd.from_pandas(bigint_frame).repartition(2)
    q = ("select id, min(v) over (order by id, v "
         "rows between 2 preceding and current row) as m, "
         "max(v) over (order by id, v "
         "rows between 1 preceding and 1 following) as x from t")
    got = dataset_to_table(sql(q, {"t": t})).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", bigint_frame)
    want = con.sql(q).df().sort_values("id").reset_index(drop=True)
    for c in ("m", "x"):
        assert got[c].astype("Int64").equals(want[c].astype("Int64")), \
            (c, got[c].tolist(), want[c].tolist())
