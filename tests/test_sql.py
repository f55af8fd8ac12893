"""SQL frontend (datavec_ray/sql.py): every statement runs through BOTH
the Ray-Data compilation and DuckDB on identical tables; values must
match. The frontend is a strict subset — unsupported syntax must raise
SqlError, never silently misplan."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from datavec_ray.sql import SqlError, sql
from datavec_ray.util import dataset_to_table


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(3)
    n = 5000
    sales = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "region": rng.choice(["east", "west", "north", None], n,
                             p=[.4, .3, .2, .1]),
        "qty": rng.integers(1, 50, n).astype(np.int64),
        "price": np.round(rng.uniform(0.5, 99.5, n), 2),
        "note": rng.choice(["promo", "bulk", "retail"], n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 90 * 24 * 3600, n), unit="s")
        + pd.to_timedelta(rng.integers(0, 1_000_000, n), unit="us"),
    })
    sales.loc[rng.random(n) < 0.05, "qty"] = None
    regions = pd.DataFrame({
        "rname": ["east", "west", "north", "south"],
        "mgr": ["ann", "bo", "cy", "di"],
        "target": [100, 200, 300, 400],
    })
    return {"sales": sales, "regions": regions}


@pytest.fixture(scope="module")
def tables(ray_session, frames):
    import ray.data as rd
    return {k: rd.from_pandas(v).repartition(4) for k, v in frames.items()}


@pytest.fixture(scope="module")
def ddb(frames):
    con = duckdb.connect()
    for k, v in frames.items():
        con.register(k, v)
    return con


def _match(name, ray_ds, sql_df, sort=True):
    got = dataset_to_table(ray_ds).to_pandas()
    want = sql_df
    assert sorted(got.columns) == sorted(want.columns), \
        f"{name}: {got.columns} vs {want.columns}"
    got, want = got[sorted(got.columns)], want[sorted(got.columns)]
    if sort and len(got.columns):
        got = got.sort_values(list(got.columns)).reset_index(drop=True)
        want = want.sort_values(list(want.columns)).reset_index(drop=True)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            assert np.allclose(g.astype(float), w.astype(float),
                               rtol=1e-9, equal_nan=True), f"{name}:{c}"
        else:
            assert (g.fillna("\0").astype(str).values
                    == w.fillna("\0").astype(str).values).all(), \
                f"{name}:{c}"


BATTERY = [
    "select region, qty, price from sales where qty > 25 and price < 50",
    "select id, qty * price as amount from sales where region = 'east'",
    "select * from sales where region is null",
    "select * from sales where region is not null and note <> 'bulk'",
    "select id from sales where qty between 10 and 20",
    "select id, note from sales where note in ('promo', 'bulk')",
    "select id from sales where note like 'pro%'",
    "select distinct region, note from sales",
    "select region, sum(qty) as total_qty, count(*) as n from sales "
    "group by region",
    "select region, count(qty) as n_qty, avg(price) as avg_price "
    "from sales group by region",
    "select region, min(price) as lo, max(price) as hi from sales "
    "where qty > 5 group by region having min(price) >= 0",
    "select sum(qty * price) as revenue from sales",
    "select count(*) as n, count(region) as n_region from sales",
    "select count(distinct note) as kinds from sales",
    "select region, sum(qty) as s from sales group by region "
    "having sum(qty) > 100 order by s desc",
    "select note, count(*) as n from sales where qty is not null "
    "group by note order by n desc, note asc limit 2",
    "select rname, mgr, qty from sales join regions on region = rname "
    "where qty > 40",
    "select mgr, sum(qty) as s from sales join regions on region = rname "
    "group by mgr",
    "select id, price from sales where (qty > 45 or qty < 3) "
    "and not note = 'bulk'",
    "select id, price / qty as unit from sales where qty > 0 "
    "and region = 'west'",
    "select region, note, sum(price) as s from sales group by region, note",
    "select id from sales order by id desc limit 5",
    "select id, case when qty > 25 then 'big' when qty > 10 then 'mid' "
    "else 'small' end as bucket from sales where qty is not null",
    "select region, sum(case when note = 'promo' then qty else 0 end) "
    "as promo_qty from sales where qty is not null group by region",
    "select id, round(price, 1) as p1, abs(qty - 25) as d from sales "
    "where qty is not null",
    "select upper(note) as u, lower(note) as l, length(note) as n "
    "from sales limit 50",
    "select coalesce(region, 'unknown') as r, count(*) as n from sales "
    "group by region",
    "select r, n from (select region as r, count(*) as n from sales "
    "group by region) t where n > 100",
    "select note, sum(amount) as s from (select note, qty * price as "
    "amount from sales where qty is not null) t group by note",
    # window functions (one shared OVER clause per SELECT)
    "select id, rank() over (partition by region order by qty) as rk "
    "from sales where qty is not null and region is not null",
    "select id, row_number() over (partition by note order by price, id) "
    "as rn, ntile(7) over (partition by note order by price, id) as nt "
    "from sales",
    "select id, dense_rank() over (partition by note order by price) as dr "
    "from sales",
    "select id, percent_rank() over (partition by region order by qty) "
    "as pr, cume_dist() over (partition by region order by qty) as cd "
    "from sales where qty is not null and region is not null",
    "select id, ntile(4) over (partition by note order by price, id) "
    "as bucket from sales",
    "select id, rank() over (partition by region order by qty desc) as rk "
    "from sales where qty is not null and region is not null",
    "select id, row_number() over (order by price, id) as rn from sales "
    "limit 4000",
    # LAG / LEAD (positional shift within the key segment)
    "select id, lag(price) over (partition by note order by price, id) "
    "as lp, lead(price, 2) over (partition by note order by price, id) "
    "as l2 from sales",
    "select id, lag(qty, 3) over (order by id, price) as lq from sales "
    "limit 4000",
    "select id, lead(note) over (partition by region order by qty, id) "
    "as nn from sales where region is not null and qty is not null",
    # windowed aggregates: partition totals + running frames
    "select id, sum(qty) over (partition by region) as rtot, "
    "count(*) over (partition by region) as rn from sales",
    "select id, avg(price) over (partition by note) as ap, "
    "min(price) over (partition by note) as lo, "
    "max(qty) over (partition by note) as hi from sales",
    "select id, sum(price) over (partition by note order by price, id "
    "rows between unbounded preceding and current row) as run from sales",
    "select id, count(qty) over (partition by region order by id, price "
    "rows unbounded preceding) as rc, avg(qty) over (partition by region "
    "order by id, price rows unbounded preceding) as ra from sales",
    "select id, sum(qty) over () as tot from sales where qty is not null",
    # default RANGE-peers frame (ORDER BY, no explicit frame): running
    # values shared across value peers, exactly as ANSI
    "select id, sum(qty) over (partition by note order by price) as s "
    "from sales",
    "select id, count(qty) over (partition by region order by qty) as c, "
    "avg(qty) over (partition by region order by qty) as a from sales "
    "where region is not null",
    "select id, sum(qty) over (order by price) as s from sales",
    "select id, min(price) over (partition by note order by qty) as lo, "
    "max(price) over (partition by note order by qty) as hi from sales "
    "where qty is not null",
    # explicit RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    "select id, sum(qty) over (partition by note order by price "
    "range between unbounded preceding and current row) as s from sales",
    # running MIN/MAX over a ROWS frame
    "select id, min(price) over (partition by note order by price, id "
    "rows unbounded preceding) as m from sales",
    "select id, max(qty) over (partition by region order by id, price "
    "rows unbounded preceding) as mx from sales where region is not null",
    # bounded sliding frames: ROWS BETWEEN k PRECEDING AND CURRENT ROW
    "select id, sum(qty) over (partition by note order by price, id "
    "rows between 3 preceding and current row) as s3, "
    "avg(price) over (partition by note order by price, id "
    "rows between 3 preceding and current row) as v3 from sales",
    "select id, min(price) over (partition by region order by id, price "
    "rows between 10 preceding and current row) as lo10, "
    "count(qty) over (partition by region order by id, price "
    "rows between 10 preceding and current row) as n10 from sales "
    "where region is not null",
    "select id, sum(price) over (order by id, price "
    "rows between 0 preceding and current row) as w_cur from sales "
    "limit 3000",
    # FOLLOWING bounds: centered / leading / trailing-from-ahead spans
    "select id, sum(qty) over (partition by note order by price, id "
    "rows between 2 preceding and 2 following) as s_c, "
    "avg(qty) over (partition by note order by price, id "
    "rows between 2 preceding and 2 following) as v_c, "
    "count(qty) over (partition by note order by price, id "
    "rows between 2 preceding and 2 following) as n_c from sales",
    "select id, sum(qty) over (partition by region order by id, price "
    "rows between current row and 3 following) as s_f from sales "
    "where region is not null",
    "select id, sum(price) over (partition by note order by price, id "
    "rows between current row and unbounded following) as s_uf "
    "from sales",
    "select id, sum(qty) over (partition by note order by price, id "
    "rows between 1 following and 4 following) as s_ahead from sales",
    "select id, count(*) over (partition by note order by price, id "
    "rows between 5 preceding and 2 preceding) as n_back from sales",
    # MIN/MAX over FOLLOWING bounds (exact sparse-table range kernel)
    "select id, min(price) over (partition by note order by price, id "
    "rows between 1 preceding and 1 following) as m_c, "
    "max(qty) over (partition by note order by price, id "
    "rows between 2 preceding and 3 following) as x_c from sales",
    "select id, min(qty) over (partition by region order by id, price "
    "rows between 1 following and 4 following) as m_ahead, "
    "max(price) over (partition by region order by id, price "
    "rows between current row and unbounded following) as x_uf "
    "from sales where region is not null",
    # INTERSECT / EXCEPT (DISTINCT set semantics)
    "select region from sales where qty > 30 intersect "
    "select rname as region from regions",
    "select note as k from sales except "
    "select region as k from sales where region is not null",
    "select region from sales where qty > 45 except "
    "select rname as region from regions where target > 150 "
    "order by region asc",
    # CTEs (WITH ... AS) — planned as named derived tables
    "with big as (select region, qty from sales where qty > 40) "
    "select region, count(*) as n from big group by region",
    "with r as (select rname from regions where target > 150), "
    "s as (select id, region from sales where qty > 45) "
    "select s.id, s.region from s join r on region = rname",
    "with a as (select qty from sales where qty is not null), "
    "b as (select qty * 2 as q2 from a) select max(q2) as m from b",
    "with u as (select note as k from sales where qty > 48 union all "
    "select region as k from sales where qty < 2) "
    "select k, count(*) as n from u where k is not null group by k",
    # WITH RECURSIVE: bounded semi-naive evaluation (anchor UNION [ALL]
    # step), deltas re-broadcast into the step plan per iteration
    "with recursive r as (select min(qty) as q from sales union all "
    "select q + 7 as q from r where q + 7 <= 40) "
    "select q from r order by q asc",
    "with recursive r as (select target as v from regions union "
    "select cast(v / 2 as bigint) + 50 as v from r where v > 10) "
    "select v from r order by v asc",
    # RECURSIVE keyword with a plain (non-self-referencing) CTE
    "with recursive t as (select qty from sales where qty > 45) "
    "select qty, count(*) as n from t group by qty",
    # GROUP BY expressions (hidden computed key columns)
    "select date_trunc('day', ts) as d, count(*) as n, min(price) as lo "
    "from sales group by date_trunc('day', ts) "
    "order by n desc, d asc limit 7",
    "select year(ts) as y, month(ts) as m, sum(qty) as s from sales "
    "where qty is not null group by year(ts), month(ts)",
    "select qty / 10 as decile, count(*) as n from sales "
    "where qty is not null group by qty / 10 having count(*) > 100",
    # time functions
    "select id, epoch_ms(ts) as ms, year(ts) as y, month(ts) as m, "
    "day(ts) as d, hour(ts) as h from sales limit 300",
    "select d, count(*) as n from (select date_trunc('day', ts) as d "
    "from sales) t group by d order by n desc, d asc limit 10",
    "select w, min(ts) as first_ts from (select date_trunc('week', ts) "
    "as w, ts from sales) t group by w",
    # ORDER BY expressions (evaluated over output columns)
    "select region, count(*) as n from sales group by region "
    "order by n / 2 desc, region asc",
    "select id, note from sales where qty > 46 "
    "order by lower(note) asc, id desc",
    "select id, qty, price from sales where qty is not null and qty > 44 "
    "order by qty * price desc, id asc limit 200",
    # ORDER BY over null-containing keys (NULLS LAST both directions)
    "select region, qty from sales order by region asc, qty desc "
    "limit 4800",
    # aggregate FILTER clause (null-masked combiner inputs)
    "select region, sum(qty) filter (where note = 'promo') as promo, "
    "count(*) filter (where qty > 25) as big, "
    "count(qty) filter (where note = 'bulk') as nb "
    "from sales where region is not null group by region",
    "select count(*) filter (where qty is null) as missing, "
    "min(price) filter (where note = 'retail') as lo from sales",
    # GROUP BY CUBE / ROLLUP (one rollup_agg combiner pass)
    "select region, note, count(*) as n, sum(qty) as s from sales "
    "where region is not null and qty is not null "
    "group by cube (region, note)",
    "select note, region, count(*) as n from sales "
    "where region is not null group by rollup (note, region)",
    "select note, avg(price) as ap, min(price) as lo, count(qty) as nq "
    "from sales group by cube (note)",
    # QUALIFY (window filter, pre-projection scope)
    "select id, rank() over (partition by region order by qty) as rk "
    "from sales where qty is not null and region is not null "
    "qualify rk <= 3",
    "select id, note, row_number() over (partition by note "
    "order by price, id) as rn from sales qualify rn = 1",
    # UNION / UNION ALL (trailing ORDER BY/LIMIT scopes to the union)
    "select note as k, qty as v from sales where qty > 45 union all "
    "select region as k, qty as v from sales where qty < 3",
    "select region from sales where qty > 40 union "
    "select region from sales where qty < 10",
    "select note as k from sales where qty > 48 union all "
    "select note as k from sales where qty < 2 order by k asc limit 20",
    # three-valued IN over literal lists (NULL probe / NULL in set)
    "select count(*) as n from sales where region not in ('east')",
    "select count(*) as n from sales where region in ('east', null)",
    "select id from sales where region not in ('east', 'west') "
    "and qty > 40",
    # INTERSECT binds tighter than UNION (ANSI precedence)
    "select region from sales where qty > 45 union "
    "select region from sales where qty < 3 intersect "
    "select rname as region from regions where target < 250",
    # uncorrelated EXISTS over an aggregate subquery: one row even
    # over zero matches, so EXISTS is TRUE
    "select count(*) as n from sales where exists "
    "(select max(target) as m from regions where target > 9999)",
    # negated membership / range / pattern predicates
    "select id, note from sales where note not in ('promo', 'bulk')",
    "select id from sales where qty not between 5 and 45",
    "select id from sales where note not like 'pro%'",
    # IN (SELECT ...): broadcast semi-join with SQL three-valued logic
    "select id, region from sales where region in "
    "(select rname from regions where target > 150)",
    "select count(*) as n from sales where region not in "
    "(select rname from regions where target > 250)",
    # probe side contains NULLs (NULL IN ... is NULL → row dropped)
    "select region, count(*) as n from sales where region in "
    "(select rname from regions) group by region",
    # subquery side contains NULLs: NOT IN must keep ZERO rows
    "select count(*) as n from sales where note not in "
    "(select region from sales where qty > 48)",
    # IN-subquery over an aggregating subquery
    "select id, note from sales where qty in "
    "(select max(qty) as m from sales group by note)",
    # CAST (float->int rounds half away from zero, DuckDB semantics)
    "select id, cast(price as integer) as p, cast(qty as double) as qd, "
    "cast(id as varchar) as sid from sales where qty is not null",
    "select cast(sum(qty) as double) / count(*) as mean_qty from sales",
    # string functions
    "select id, substr(note, 2) as tail, substr(note, 1, 3) as head3, "
    "replace(note, 'o', '0') as r0 from sales limit 200",
    "select trim(' x ') as t, ltrim(' x ') as l, rtrim(' x ') as r "
    "from sales limit 1",
    # stddev / variance family (combiner-backed Chan merge)
    "select region, stddev(price) as sd, var_pop(qty) as vp, "
    "stddev_pop(price) as sp, var_samp(price) as vs from sales "
    "where qty is not null group by region",
    "select variance(price) as v from sales having count(*) > 10",
    # scalar subqueries and [NOT] EXISTS (uncorrelated, fold to literals)
    "select id, price from sales where price > "
    "(select avg(price) as a from sales) and qty > 40",
    "select id, qty - (select max(target) as m from regions) as gap "
    "from sales where qty > 45",
    "select count(*) as n from sales where exists "
    "(select rname from regions where target > 350)",
    "select count(*) as n from sales where not exists "
    "(select rname from regions where target > 999) and qty > 25",
    # CORRELATED [NOT] EXISTS / IN → semi / anti joins
    "select id, region, qty from sales where exists "
    "(select rname from regions where rname = region and target > 150) "
    "and qty > 45",
    "select count(*) as n from sales where not exists "
    "(select rname from regions where rname = region)",
    "select region, count(*) as n from sales where exists "
    "(select rname from regions where region = rname) group by region",
    "select id from sales where qty in "
    "(select cast(target / 10 as bigint) as t from regions "
    "where rname = region)",
    # aggregate expressions: HAVING over raw aggregates, computed items
    "select region, avg(price) as ap from sales group by region "
    "having avg(price) > 45 and count(*) > 50",
    "select note, sum(qty * price) / sum(qty) as wavg from sales "
    "where qty is not null group by note",
    "select max(price) - min(price) as spread, "
    "count(*) - count(qty) as missing from sales",
    "select region, count(*) as n from sales group by region "
    "having sum(qty) > 100 and max(price) < 100",
    "select note, round(sum(price) / count(*), 2) as avg2 from sales "
    "group by note having count(distinct region) >= 2",
    # [NOT] IN over an EMPTY subquery result: ANSI IN = FALSE /
    # NOT IN = TRUE regardless of the probe (incl. NULL probes)
    "select count(*) as n from sales where id not in "
    "(select target from regions where target > 100000)",
    "select count(*) as n from sales where id in "
    "(select target from regions where target > 100000)",
    "select count(*) as n from sales where qty not in "
    "(select target from regions where target > 100000)",
    # scalar subquery over zero rows folds to NULL
    "select count(*) as n from sales where price > "
    "(select target from regions where target > 100000)",
    # CORRELATED scalar AGGREGATE subqueries (TPC-H Q17 shape):
    # decorrelated to a grouped aggregate + left join; unmatched
    # outer rows compare against NULL and drop, exactly as ANSI
    "select id, qty, region from sales where qty < "
    "(select max(target) as m from regions where rname = region)",
    "select id, region from sales where price * 5 > "
    "(select avg(target) as a from regions where rname = region) "
    "and qty > 40",
    "select id, region from sales where price > "
    "(select 0.25 * max(target) as t from regions where rname = region)",
    "select region, count(*) as n from sales where qty < "
    "(select max(target) as m from regions where rname = region) "
    "group by region",
    # grouped aggregate over an EMPTY semi-join result: Ray cannot
    # infer the schema of a zero-row plan, so the planner's static
    # schema hint must carry through the decorrelation steps
    "select region, count(*) as n from sales where exists "
    "(select rname from regions where rname = region and "
    "target > 99999) group by region",
    "select note, count(*) as n, round(sum(price), 2) as s from sales "
    "where not exists (select rname from regions where rname = note) "
    "and qty > 10 group by note",
]


@pytest.mark.parametrize("stmt", BATTERY)
def test_battery_matches_duckdb(tables, ddb, stmt):
    _match(stmt, sql(stmt, tables), ddb.sql(stmt).df())


@pytest.mark.parametrize("stmt", [
    "select id from sales, regions",                  # implicit cross join
    "update sales set qty = 1",                       # not a SELECT
    "select qty + 1 from sales",                      # computed needs alias
    "select region, sum(qty) as s from sales",        # bare col w/o group
    "select id from sales join regions on region < rname",  # theta join
    "select sum(distinct qty) as s from sales",       # distinct non-count
    # value-tied window fn with composite ORDER BY (composite-value
    # ranking is not planned — must refuse, not silently misrank)
    "select dense_rank() over (partition by note order by price, id) "
    "as dr from sales",
    # row_number without a deterministic total order
    "select row_number() over (partition by note order by price) as rn "
    "from sales",
    # lag without a deterministic total order
    "select lag(price) over (partition by note order by price) as lp "
    "from sales",
    # default RANGE frame with composite ORDER BY (peers are defined
    # by the composite value — must refuse, not misplan)
    "select sum(qty) over (partition by note order by price, id) as s "
    "from sales",
    # RANGE <k> PRECEDING frames are not planned
    "select sum(qty) over (partition by note order by price "
    "range between 5 preceding and current row) as s from sales",
    # negative frame offsets
    "select sum(qty) over (partition by note order by price, id "
    "rows between -1 preceding and current row) as s from sales",
    # frame lower bound after its upper bound
    "select sum(qty) over (partition by note order by price, id "
    "rows between 2 following and 1 preceding) as s from sales",
    # RANGE with a FOLLOWING bound
    "select sum(qty) over (partition by note order by price "
    "range between current row and current row) as s from sales",
    # window fns in one SELECT with different OVER clauses
    "select rank() over (partition by note order by price) as a, "
    "rank() over (partition by region order by price) as b from sales",
    # window fn mixed with aggregates
    "select note, rank() over (partition by note order by price) as r, "
    "sum(qty) as s from sales group by note",
    # UNION branches with mismatched columns
    "select id, qty from sales union all select qty from sales",
    # ORDER BY before a later UNION branch
    "select id from sales order by id union all select id from sales",
    # QUALIFY without a window function
    "select id from sales qualify id > 3",
    # COUNT(DISTINCT) under CUBE
    "select note, count(distinct region) as n from sales "
    "group by cube (note)",
    # FILTER with DISTINCT
    "select count(distinct region) filter (where qty > 5) as x "
    "from sales",
    # IN-subquery must produce exactly one column
    "select id from sales where region in (select rname, mgr from regions)",
    # dangling NOT before a comparison
    "select id from sales where qty not > 5",
    # aggregates outside SELECT/HAVING scope
    "select id from sales where sum(qty) > 5",
    "select sum(qty) + 1 from sales",            # computed needs alias
    "select id from sales having count(*) > 1",  # HAVING w/o grouping
    # scalar subquery with more than one row
    "select id from sales where qty > (select qty from sales)",
    # scalar subquery with more than one column
    "select id from sales where qty > (select qty, price from sales)",
    # correlated NOT IN (ambiguous under SQL null semantics)
    "select id from sales where qty not in "
    "(select target from regions where rname = region)",
    # non-equality correlation
    "select id from sales where exists "
    "(select rname from regions where target > qty)",
    # recursive CTE whose anchor references itself
    "with recursive r as (select qty from r union all "
    "select qty from sales) select qty from r",
    # self-referencing CTE without the anchor UNION shape
    "with recursive r as (select qty from sales "
    "join r on qty = qty) select qty from r",
    # ORDER BY inside a recursive CTE body
    "with recursive r as (select min(qty) as q from sales union all "
    "select q + 1 as q from r where q < 10 order by q) "
    "select q from r",
    # recursive CTE branches with mismatched column names
    "with recursive r as (select min(qty) as q from sales union all "
    "select q + 1 as q2 from r where q < 10) select q from r",
    # correlated scalar subquery equating one inner column to TWO
    # outer columns (single-key decorrelation would drop a constraint)
    "select id from sales where qty < (select max(target) as m "
    "from regions where rname = region and rname = note)",
    # INTERSECT/EXCEPT ALL (bag semantics not supported)
    "select id from sales intersect all select id from sales",
    # same-named correlation column: qualifiers are stripped, so this
    # is ambiguous — must refuse, never silently plan uncorrelated
    "select id from sales where exists "
    "(select region from salesdup where region = region)",
    # correlated EXISTS over an aggregate subquery (always TRUE in SQL)
    "select id from sales where exists "
    "(select max(target) as m from regions where rname = region)",
    # HAVING on a windowed SELECT (QUALIFY is the window filter)
    "select id, rank() over (partition by note order by price) as rk "
    "from sales having id > 3",
    # NTILE bucket count must be >= 1 (DuckDB raises; never coerce)
    "select ntile(0) over (partition by note order by price, id) as nt "
    "from sales",
    # correlated scalar subquery must select an aggregate (a plain
    # expression can return >1 row per outer row — not planned)
    "select id from sales where qty > "
    "(select target as t from regions where rname = region)",
    # correlated scalar EXPRESSION over COUNT (the zero-match value
    # is the expression at COUNT=0; only bare COUNT zero-fills)
    "select id from sales where qty > "
    "(select count(*) + 1 as c from regions where rname = region)",
    # correlated scalar subquery buried inside arithmetic (only a
    # direct comparison side decorrelates)
    "select id from sales where qty + "
    "(select max(target) as m from regions where rname = region) > 100",
])
def test_unsupported_raises(tables, stmt):
    with pytest.raises(SqlError):
        ds = sql(stmt, tables)
        dataset_to_table(ds)


def test_cube_null_key_refused(tables):
    # raised inside the map task, so Ray wraps it — match the message
    with pytest.raises(Exception, match="contains NULLs"):
        dataset_to_table(sql(
            "select region, count(*) as n from sales "
            "group by cube (region)", tables))


def test_left_join_matches(tables, ddb):
    stmt = ("select rname, mgr, target from regions "
            "left join sales on rname = region where target > 150")
    _match(stmt, sql(stmt, tables), ddb.sql(
        "select rname, mgr, target from regions "
        "left join sales on rname = region where target > 150").df())


@pytest.mark.parametrize("stmt", [
    # RIGHT JOIN: unmatched sales rows survive with null region cols
    "select rname, mgr, qty from sales right join regions "
    "on region = rname where qty > 47",
    "select rname, target, count(*) as n from sales "
    "right outer join regions on region = rname "
    "group by rname, target",
    # FULL JOIN keeps both sides' unmatched rows
    "select rname, mgr, qty from sales full outer join regions "
    "on region = rname where qty > 47 or qty is null",
])
def test_right_full_join_matches(tables, ddb, stmt):
    _match(stmt, sql(stmt, tables), ddb.sql(stmt).df())


def test_unsupported_salesdup(tables, frames):
    # the same-name-correlation must-raise needs a second table whose
    # column names overlap sales'
    import ray.data as rd
    t2 = dict(tables)
    t2["salesdup"] = rd.from_pandas(frames["sales"][["region"]])
    with pytest.raises(SqlError, match="ambiguous"):
        sql("select id from sales where exists "
            "(select region from salesdup where region = region)", t2)


def test_global_agg_stays_lazy(tables):
    # a global aggregate must return an UNEXECUTED plan (regression:
    # the zero-row identity synthesis used to materialize eagerly)
    ds = sql("select count(*) as n, sum(qty) as s from sales", tables)
    import ray.data
    assert isinstance(ds, ray.data.Dataset)
    stats_before = ds._plan.has_computed_output() \
        if hasattr(ds, "_plan") else False
    assert not stats_before
    out = dataset_to_table(ds).to_pandas()
    assert out["n"][0] == 5000


def test_approx_count_distinct_empty_is_zero(tables):
    got = dataset_to_table(sql(
        "select approx_count_distinct(id) as ad, count(*) as n "
        "from sales where qty > 9999", tables)).to_pandas()
    assert len(got) == 1 and got["ad"][0] == 0 and got["n"][0] == 0


def test_approx_count_distinct(tables):
    # HLL estimate: within the p=9 register error bound of the truth
    got = dataset_to_table(sql(
        "select region, approx_count_distinct(id) as ad, "
        "count(*) as n from sales group by region", tables)).to_pandas()
    want = dataset_to_table(sql(
        "select region, count(distinct id) as d from sales "
        "group by region", tables)).to_pandas()
    g = got.sort_values("region", na_position="last").reset_index(drop=True)
    w = want.sort_values("region", na_position="last").reset_index(drop=True)
    for ad, d in zip(g["ad"], w["d"]):
        assert abs(ad - d) / max(d, 1) < 0.12, (ad, d)


def test_recursive_cte_cycle_guard(tables, monkeypatch):
    """A non-converging UNION ALL recursion hits the iteration cap with
    a loud SqlError instead of spinning."""
    import datavec_ray.sql as S
    monkeypatch.setattr(S, "_RECURSIVE_MAX_ITERS", 3)
    with pytest.raises(SqlError, match="iterations"):
        dataset_to_table(sql(
            "with recursive r as (select target as v from regions "
            "union all select v as v from r where v > 0) "
            "select v from r", tables))


def test_recursive_cte_row_cap(tables, monkeypatch):
    import datavec_ray.sql as S
    monkeypatch.setattr(S, "_RECURSIVE_MAX_ROWS", 5)
    with pytest.raises(SqlError, match="accumulated rows"):
        dataset_to_table(sql(
            "with recursive r as (select target as v from regions "
            "union all select v + 1 as v from r where v < 1000) "
            "select v from r", tables))


def test_wspan_small_segment_bounds(ray_session):
    """FOLLOWING/PRECEDING span bounds clamp inside tiny key segments
    (unclamped prefix gathers would index out of range)."""
    import ray.data as rd

    from datavec_ray.misc import window_rank
    t = pa.table({"k": ["a", "b", "b", "b"],
                  "o": [1, 1, 2, 3],
                  "i": [1, 2, 3, 4],
                  "v": [10.0, 20.0, 30.0, 40.0]})
    out = dataset_to_table(window_rank(
        rd.from_arrow(t), ["k"], "o", tiebreak=["i"],
        specs={"s_back": ("wspan", "Sum", "v", -5, -2),
               "s_fwd": ("wspan", "Sum", "v", 1, 4),
               "n_fwd": ("wspan", "Count", "v", 1, 4)})) \
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    # 5..2-preceding windows: empty (NULL) except b/o=3, whose offset
    # -2 row (b/o=1, v=20) is in range
    assert list(out.s_back.fillna(-1)) == [-1, -1, -1, 20.0]
    # forward windows: within-segment rows ahead only
    got = list(zip(out.k, out.o, out.s_fwd.fillna(-1), out.n_fwd))
    assert got == [("a", 1, -1, 0), ("b", 1, 70.0, 2),
                   ("b", 2, 40.0, 1), ("b", 3, -1, 0)]
