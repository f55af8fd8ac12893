"""Minimal SQL frontend: compile a strict SELECT subset onto the
Ray-Data operator library.

The reference exposes its pipeline only programmatically
(``TransformProcess`` builder, ``transform/TransformProcess.java:62``);
this module adds the query surface a lakehouse user expects on top of
the SAME operators — nothing here executes SQL, it PARSES SQL and
plans it onto the existing vectorized steps:

    WHERE / projection  → one fused ``map_batches`` (pyarrow.compute)
    GROUP BY aggregates → ``reduce.Reducer`` (map-side combiner)
    CUBE / ROLLUP       → ``misc.rollup_agg`` (all grouping sets in ONE
                          combiner pass; NULL keys refused — they would
                          fold into the super-aggregate rows)
    HAVING              → post-reduce ``map_batches`` filter
    JOIN ... ON         → ``join.JoinStep`` (auto broadcast/shuffle)
    window functions    → ``misc.window_rank`` (one hash shuffle, all
                          window items of a SELECT share it)
    UNION [ALL]         → ``Dataset.union`` (+ ``setops.distinct_rows``)
    ORDER BY / LIMIT    → ``Dataset.sort`` / ``Dataset.limit``

Supported grammar (anything else raises ``SqlError`` loudly — a silent
wrong answer is worse than no answer):

    query := [WITH name AS ( query ) [, ...]]
             SELECT [DISTINCT] item [, item ...]
             FROM table [INNER|LEFT|RIGHT|FULL [OUTER] JOIN table
                         ON a = b [AND c = d ...]]*
             [WHERE expr]
             [GROUP BY expr [, expr ...] | CUBE (cols) | ROLLUP (cols)]
             [HAVING expr] [QUALIFY expr]
             [ORDER BY expr [ASC|DESC] [, ...]] [LIMIT n]
             (ORDER BY expressions evaluate over OUTPUT columns)
             [UNION [ALL] | INTERSECT | EXCEPT query]

    table := name | ( query ) [AS] alias
    item  := * | expr [AS alias] | agg | win
    agg   := SUM|MIN|MAX|AVG|COUNT|STDDEV[_SAMP|_POP]|VARIANCE|
             VAR_SAMP|VAR_POP ( [DISTINCT] expr | * )
             [FILTER ( WHERE expr )] [AS alias] — also usable inside
             expressions (sum(a)/count(*)) and HAVING
    win   := ROW_NUMBER|RANK|DENSE_RANK|PERCENT_RANK|CUME_DIST () |
             NTILE (n) | LAG|LEAD (col [, offset])
             OVER ( [PARTITION BY col, ...]
             ORDER BY col [DESC] [, tiebreak ...] ) AS alias
    expr  := arithmetic (+ - * /) over columns/literals, comparisons,
             AND/OR/NOT, [NOT] IN ( literals | SELECT ... ),
             [NOT] BETWEEN, [NOT] LIKE, IS [NOT] NULL,
             ( SELECT ... ) scalar subqueries, [NOT] EXISTS ( SELECT );
             uncorrelated IN plans as a broadcast semi-join and
             scalar/EXISTS fold to literals at plan time; CORRELATED
             [NOT] EXISTS / IN (equality correlation, as a top-level
             WHERE conjunct) decorrelate onto SemiJoinStep — SQL
             EXISTS ≡ semi join, NOT EXISTS ≡ anti join,
             CASE WHEN ... END, CAST (expr AS type),
             ROUND/ABS/LOWER/UPPER/LENGTH/COALESCE/SUBSTR/TRIM/
             LTRIM/RTRIM/REPLACE, EPOCH_MS/DATE_TRUNC('unit', ts)/
             YEAR/MONTH/DAY/HOUR/MINUTE/SECOND;
             literals: numbers, 'strings', TIMESTAMP 'iso', NULL

Correctness is self-oracle-checking by construction: every compiled
query's DuckDB twin is the query string itself (see the ``sql_*``
driver queries and tests/test_sql.py, which run a battery of
statements against both engines and compare values).
"""

from __future__ import annotations

import re
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class SqlError(ValueError):
    """Unsupported or malformed SQL (this frontend is a strict subset)."""


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<ts>TIMESTAMP\s+'[^']*')
    | (?P<str>'(?:[^']|'')*')
    | (?P<num>\d+\.\d*|\.\d+|\d+)
    | (?P<name>[A-Za-z_][A-Za-z_0-9]*(?:\.[A-Za-z_][A-Za-z_0-9]*)?)
    | (?P<op><>|<=|>=|!=|=|<|>|\(|\)|,|\*|\+|-|/)
    )""", re.X | re.I)

_KEYWORDS = {"select", "distinct", "from", "where", "group", "by", "having",
             "order", "limit", "join", "inner", "left", "right", "full",
             "outer", "on", "as", "and",
             "or", "not", "in", "between", "like", "is", "null", "asc",
             "desc", "sum", "min", "max", "avg", "count",
             "case", "when", "then", "else", "end",
             "round", "abs", "lower", "upper", "length", "coalesce",
             "substr", "substring", "trim", "ltrim", "rtrim", "replace",
             "cast", "stddev", "stddev_samp", "stddev_pop", "variance",
             "var_samp", "var_pop", "approx_count_distinct",
             "epoch_ms", "date_trunc", "year", "month", "day", "hour",
             "minute", "second",
             "with", "union", "intersect", "except", "all"}

_SCALAR_FUNCS = {"round", "abs", "lower", "upper", "length", "coalesce",
                 "substr", "substring", "trim", "ltrim", "rtrim",
                 "replace", "epoch_ms", "date_trunc", "year", "month",
                 "day", "hour", "minute", "second"}

# CAST target → (arrow type, DuckDB name); float→int casts ROUND
# half-away-from-zero first (DuckDB), Arrow alone would refuse/truncate
_CAST_TYPES = {
    "tinyint": pa.int8(), "smallint": pa.int16(),
    "int": pa.int32(), "integer": pa.int32(), "bigint": pa.int64(),
    "hugeint": pa.int64(),
    "real": pa.float32(), "float": pa.float32(),
    "double": pa.float64(),
    "varchar": pa.string(), "text": pa.string(), "string": pa.string(),
    "boolean": pa.bool_(), "bool": pa.bool_(),
}

# window functions are NOT keywords (a column may be named "rank");
# they are recognized as name tokens immediately followed by "("
_WIN_FUNCS = {"row_number", "rank", "dense_rank", "percent_rank",
              "cume_dist", "ntile", "lag", "lead"}


def _tokenize(sql: str) -> list[tuple[str, Any]]:
    out, pos = [], 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m or m.end() == pos:
            rest = sql[pos:].strip()
            if not rest:
                break
            raise SqlError(f"cannot tokenize at: {rest[:30]!r}")
        pos = m.end()
        if m.group("ts"):
            iso = m.group("ts").split("'", 1)[1][:-1]
            out.append(("lit_ts", iso))
        elif m.group("str"):
            out.append(("lit_str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("num"):
            t = m.group("num")
            out.append(("lit_num", float(t) if "." in t else int(t)))
        elif m.group("name"):
            w = m.group("name")
            out.append(("kw", w.lower()) if w.lower() in _KEYWORDS
                       and "." not in w else ("name", w))
        else:
            out.append(("op", m.group("op")))
    out.append(("eof", None))
    return out


# ---------------------------------------------------------------------------
# Parser (recursive descent) — AST as nested tuples
# ---------------------------------------------------------------------------

_AGG_FUNCS = {"sum": "Sum", "min": "Min", "max": "Max", "avg": "Mean",
              "count": "Count",
              "stddev": "Stdev", "stddev_samp": "Stdev",
              "stddev_pop": "UncorrectedStdDev",
              "variance": "Variance", "var_samp": "Variance",
              "var_pop": "PopulationVariance",
              # HLL sketch (512-byte mergeable register partials);
              # estimates differ from DuckDB's sketch — tolerance-test
              # coverage, not string-identical oracle
              "approx_count_distinct": "CountUnique"}


# EXTRACT parts with identical semantics in DuckDB and pyarrow
# (day_of_week disagrees on week start — deliberately excluded)
_EXTRACT_PARTS = {"year": "year", "quarter": "quarter", "month": "month",
                  "day": "day", "hour": "hour", "minute": "minute",
                  "second": "second", "millisecond": "millisecond"}


def _has_aggref(ast) -> bool:
    """True when an expression AST contains an aggregate call."""
    if isinstance(ast, tuple):
        if ast and ast[0] == "aggref":
            return True
        return any(_has_aggref(x) for x in ast)
    if isinstance(ast, list):
        return any(_has_aggref(x) for x in ast)
    return False


class _Parser:
    def __init__(self, sql: str):
        self.toks = _tokenize(sql)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_kw(self, *words):
        k, v = self.next()
        if k != "kw" or v not in words:
            raise SqlError(f"expected {'/'.join(words).upper()}, got {v!r}")
        return v

    def accept_kw(self, *words) -> Optional[str]:
        k, v = self.peek()
        if k == "kw" and v in words:
            self.i += 1
            return v
        return None

    def accept_op(self, *ops) -> Optional[str]:
        k, v = self.peek()
        if k == "op" and v in ops:
            self.i += 1
            return v
        return None

    # -- statement ---------------------------------------------------------
    def parse(self) -> dict:
        ctes = []
        recursive = False
        if self.accept_kw("with"):
            k, v = self.peek()
            if k == "name" and v.lower() == "recursive":
                self.next()
                recursive = True
            while True:
                nm = self._name()
                self.expect_kw("as")
                self._expect_paren("(")
                ctes.append((nm, self._query()))
                self._expect_paren(")")
                if not self.accept_op(","):
                    break
        q = self._query()
        if ctes:
            q["ctes"] = ctes
            if recursive:
                q["recursive"] = True
        if self.peek()[0] != "eof":
            raise SqlError(f"trailing input at {self.peek()!r}")
        return q

    def _query(self) -> dict:
        """A SELECT, possibly chained with UNION [ALL] (left-assoc).
        A trailing ORDER BY/LIMIT — parsed inside the LAST branch —
        applies to the whole union (matching standard SQL scoping), so
        it is hoisted onto the union node; earlier branches must not
        carry one."""
        node = self._intersect_term()
        while True:
            op = self.accept_kw("union", "except")
            if not op:
                break
            if op == "union":
                op = "all" if self.accept_kw("all") else "distinct"
            elif self.accept_kw("all"):
                raise SqlError("EXCEPT ALL is not supported "
                               "(DISTINCT set semantics only)")
            if node["order"] or node["limit"] is not None:
                raise SqlError(
                    "ORDER BY/LIMIT only after the last set-op branch")
            right = self._intersect_term()
            node = {"setop": op,
                    "left": node, "right": right,
                    "order": right["order"], "limit": right["limit"]}
            right["order"], right["limit"] = [], None
        return node

    def _intersect_term(self) -> dict:
        """INTERSECT binds TIGHTER than UNION/EXCEPT (ANSI precedence,
        matched by DuckDB — the declared oracle)."""
        node = self._select()
        while self.accept_kw("intersect"):
            if self.accept_kw("all"):
                raise SqlError("INTERSECT ALL is not supported "
                               "(DISTINCT set semantics only)")
            if node["order"] or node["limit"] is not None:
                raise SqlError(
                    "ORDER BY/LIMIT only after the last set-op branch")
            right = self._select()
            node = {"setop": "intersect",
                    "left": node, "right": right,
                    "order": right["order"], "limit": right["limit"]}
            right["order"], right["limit"] = [], None
        return node

    def _table_ref(self):
        """A FROM/JOIN table: a registered name, or a parenthesized
        derived-table subquery ``( SELECT ... ) [AS] alias``."""
        if self.accept_op("("):
            sub = self._query()
            self._expect_paren(")")
            alias = self._table_alias()
            base = ("sub", sub)
            return ("aliased", (base, alias)) if alias else base
        k, v = self.next()
        if k != "name":
            raise SqlError("expected table name or ( SELECT ... )")
        alias = self._table_alias()
        return ("aliased", (("name", v), alias)) if alias else ("name", v)

    def _table_alias(self) -> Optional[str]:
        """Optional ``[AS] alias`` after a FROM/JOIN table reference.
        ``qualify`` is a pseudo-keyword name, never an alias."""
        had_as = bool(self.accept_kw("as"))
        k, v = self.peek()
        if k == "name" and "." not in v and v.lower() != "qualify":
            self.next()
            return v
        if had_as:
            raise SqlError("expected alias after AS")
        return None

    def _select(self) -> dict:
        self.expect_kw("select")
        distinct = bool(self.accept_kw("distinct"))
        items = [self._select_item()]
        while self.accept_op(","):
            items.append(self._select_item())
        self.expect_kw("from")
        table = self._table_ref()
        joins = []
        while True:
            how = "Inner"
            if self.accept_kw("left"):
                how = "LeftOuter"
                self.accept_kw("outer")
                self.expect_kw("join")
            elif self.accept_kw("right"):
                how = "RightOuter"
                self.accept_kw("outer")
                self.expect_kw("join")
            elif self.accept_kw("full"):
                how = "FullOuter"
                self.accept_kw("outer")
                self.expect_kw("join")
            elif self.accept_kw("inner"):
                self.expect_kw("join")
            elif not self.accept_kw("join"):
                break
            right = self._table_ref()
            self.expect_kw("on")
            # full ON expression; the planner splits it into equi-key
            # pairs + residual conjuncts (schema-aware side resolution)
            joins.append((right, self._expr(), how))
        where = self._expr() if self.accept_kw("where") else None
        group, group_mode = [], "plain"
        if self.accept_kw("group"):
            self.expect_kw("by")
            k, v = self.peek()
            if k == "name" and v.lower() in ("cube", "rollup"):
                self.next()
                group_mode = v.lower()
                self._expect_paren("(")
                group.append(self._name())
                while self.accept_op(","):
                    group.append(self._name())
                self._expect_paren(")")
            else:
                # plain GROUP BY accepts full expressions (e.g.
                # date_trunc('day', ts)); non-column exprs become
                # hidden computed key columns in the grouped planner
                def _gitem():
                    e = self._expr()
                    if _has_aggref(e):
                        raise SqlError("aggregates cannot be GROUP BY "
                                       "keys")
                    return e[1] if e[0] == "col" else e
                group.append(_gitem())
                while self.accept_op(","):
                    group.append(_gitem())
        having = self._expr() if self.accept_kw("having") else None
        qualify = None
        k, v = self.peek()
        if k == "name" and v.lower() == "qualify":
            self.next()
            qualify = self._expr()
        order = []
        if self.accept_kw("order"):
            self.expect_kw("by")
            while True:
                # a plain name, or an expression over OUTPUT columns
                # (SQL scoping: ORDER BY runs after the projection)
                e = self._expr()
                if _has_aggref(e):
                    raise SqlError("ORDER BY aggregates by their "
                                   "select-item alias")
                c = e[1] if e[0] == "col" else e
                d = self.accept_kw("asc", "desc") or "asc"
                order.append((c, d == "desc"))
                if not self.accept_op(","):
                    break
        limit = None
        if self.accept_kw("limit"):
            k, v = self.next()
            if k != "lit_num" or not isinstance(v, int):
                raise SqlError("LIMIT needs an integer")
            limit = v
        return {"items": items, "distinct": distinct, "table": table,
                "joins": joins, "where": where, "group": group,
                "group_mode": group_mode, "having": having,
                "qualify": qualify, "order": order, "limit": limit}

    def _name(self) -> str:
        k, v = self.next()
        if k != "name":
            raise SqlError(f"expected column name, got {v!r}")
        return v                    # may be qualified (a.c) — the
                                    # scope-resolution pass strips or
                                    # rewrites it after parse

    def _select_item(self):
        if self.accept_op("*"):
            return ("star", None, None)
        k, v = self.peek()
        if k == "name" and v.lower() in _WIN_FUNCS \
                and self.toks[self.i + 1] == ("op", "("):
            self.i += 1
            return self._window_item(v.lower())
        e = self._expr()
        if e[0] == "aggref":
            k2, v2 = self.peek()
            if k2 == "name" and v2.lower() == "over":
                # windowed aggregate: SUM(x) OVER (...) — totals
                # (PARTITION BY only) or running frames (ROWS
                # UNBOUNDED PRECEDING)
                self.next()
                return self._windowed_agg_item(e[1])
        alias = self._alias()
        if e[0] == "aggref":
            # a bare aggregate: SUM(x) [AS alias]
            return ("agg", e[1],
                    alias or f"agg_{len(self.toks)}_{self.i}")
        if _has_aggref(e):
            # an expression OVER aggregates, e.g. sum(a)/count(*) —
            # evaluated post-reduce on hidden aggregate columns
            if alias is None:
                raise SqlError("computed select items need AS alias")
            return ("aggexpr", e, alias)
        if alias is None:
            if e[0] == "col":
                alias = e[1].split(".")[-1]   # SELECT a.c outputs "c"
            else:
                raise SqlError("computed select items need AS alias")
        return ("expr", e, alias)

    def _window_item(self, method: str):
        self._expect_paren("(")
        buckets = None
        shift = None
        if method == "ntile":
            k, v = self.next()
            if k != "lit_num" or not isinstance(v, int):
                raise SqlError("NTILE needs an integer bucket count")
            if v < 1:
                raise SqlError(f"NTILE bucket count must be >= 1, got {v}")
            buckets = v
        elif method in ("lag", "lead"):
            src_col = self._name()
            off = 1
            if self.accept_op(","):
                k, v = self.next()
                if k != "lit_num" or not isinstance(v, int) or v < 0:
                    raise SqlError("LAG/LEAD offset must be a "
                                   "non-negative integer")
                off = v
            shift = (src_col, off)
        self._expect_paren(")")
        k, v = self.next()
        if not (k == "name" and v.lower() == "over"):
            raise SqlError("window function needs OVER (...)")
        part, order, _ = self._over_clause(allow_frame=False)
        alias = self._alias()
        if alias is None:
            raise SqlError("window select items need AS alias")
        return ("win", (method, buckets, part, order, shift), alias)

    def _over_clause(self, allow_frame: bool):
        """Parse ``( [PARTITION BY ...] [ORDER BY ...] [frame] )``.
        The only supported frame is ROWS UNBOUNDED PRECEDING (running
        aggregates); rank/lag items take no frame."""
        self._expect_paren("(")
        part = []
        k, v = self.peek()
        if k == "name" and v.lower() == "partition":
            self.next()
            self.expect_kw("by")
            part.append(self._name())
            while self.accept_op(","):
                part.append(self._name())
        order = []
        if self.accept_kw("order"):
            self.expect_kw("by")
            while True:
                c = self._name()
                desc = bool(self.accept_kw("desc"))
                if not desc:
                    self.accept_kw("asc")
                order.append((c, desc))
                if not self.accept_op(","):
                    break
        frame = None
        k, v = self.peek()
        if k == "name" and v.lower() in ("rows", "range"):
            if not allow_frame:
                raise SqlError("frames are only supported on windowed "
                               "aggregates")
            is_range = v.lower() == "range"
            self.next()

            def _words(*ws):
                for w in ws:
                    if self._name().lower() != w:
                        raise SqlError(
                            "only ROWS frames over UNBOUNDED|<k> "
                            "PRECEDING / CURRENT ROW / <k>|UNBOUNDED "
                            "FOLLOWING bounds and RANGE [BETWEEN] "
                            "UNBOUNDED PRECEDING [AND CURRENT ROW] "
                            "frames are supported")

            def _bound(lower: bool):
                """One frame bound → int offset relative to the row
                (negative = preceding), or None for UNBOUNDED."""
                k2, v2 = self.peek()
                if k2 == "lit_num" and isinstance(v2, int):
                    if is_range:
                        raise SqlError("RANGE <k> PRECEDING frames are "
                                       "not supported (use "
                                       "misc.range_window_agg)")
                    self.next()
                    if v2 < 0:
                        raise SqlError("frame offset must be >= 0")
                    w = self._name().lower()
                    if w == "preceding":
                        return -v2
                    if w == "following":
                        return v2
                    raise SqlError(f"expected PRECEDING/FOLLOWING, "
                                   f"got {w!r}")
                if k2 == "name" and v2.lower() == "current":
                    self.next()
                    _words("row")
                    return 0
                _words("unbounded", "preceding" if lower else "following")
                return None
            if self.accept_kw("between"):
                lo = _bound(True)
                self.expect_kw("and")
                hi = _bound(False)
            else:
                lo, hi = _bound(True), 0
            if lo is not None and hi is not None and lo > hi:
                raise SqlError(
                    f"frame lower bound ({lo}) follows its upper "
                    f"bound ({hi})")
            if is_range:
                if lo is not None or hi != 0:
                    raise SqlError("only RANGE [BETWEEN] UNBOUNDED "
                                   "PRECEDING [AND CURRENT ROW] is "
                                   "supported")
                frame = "range_upc"
            elif lo is None and hi == 0:
                frame = "rows_upc"
            elif isinstance(lo, int) and lo <= 0 and hi == 0:
                frame = ("rows_kpc", -lo)
            else:
                frame = ("rows_span", lo, hi)
        self._expect_paren(")")
        return part, order, frame

    def _windowed_agg_item(self, spec):
        """``agg(col) OVER (...)`` — a per-partition total (no ORDER
        BY), a running aggregate (ORDER BY + ROWS UNBOUNDED PRECEDING
        or the SQL *default* RANGE-peers frame — running values shared
        across value peers, exactly as ANSI), or a bounded sliding
        frame (ROWS BETWEEN k PRECEDING AND CURRENT ROW)."""
        op, arg, distinct, filt = spec
        if distinct or filt is not None:
            raise SqlError("windowed aggregates support neither "
                           "DISTINCT nor FILTER")
        if arg == ("star",):
            src = "*"
        elif arg[0] == "col":
            src = arg[1]
        else:
            raise SqlError("windowed aggregates take a plain column "
                           "or *")
        part, order, frame = self._over_clause(allow_frame=True)
        if frame is not None and not order:
            raise SqlError("a window frame needs ORDER BY")
        if op not in ("Sum", "Mean", "Min", "Max", "Count"):
            raise SqlError(f"{op} is not supported as a window function")
        if not order:
            m = ("wtotal", op, src)
        elif frame is None or frame == "range_upc":
            # SQL default: RANGE BETWEEN UNBOUNDED PRECEDING AND
            # CURRENT ROW — running values shared across value peers
            m = ("wrange", op, src)
        elif frame == "rows_upc":
            m = ("wrun", op, src)
        elif frame[0] == "rows_kpc":
            m = ("wrows", op, src, frame[1])
        else:                                   # ("rows_span", lo, hi)
            # MIN/MAX over FOLLOWING bounds run on the exact sparse-
            # table range kernel (misc._range_minmax)
            m = ("wspan", op, src, frame[1], frame[2])
        alias = self._alias()
        if alias is None:
            raise SqlError("window select items need AS alias")
        return ("win", (m, None, part, order, None), alias)

    def _alias(self) -> Optional[str]:
        if self.accept_kw("as"):
            k, v = self.next()
            if k != "name":
                raise SqlError("expected alias after AS")
            return v
        return None

    def _expect_paren(self, p):
        if not self.accept_op(p):
            raise SqlError(f"expected {p!r}")

    # -- expressions ---------------------------------------------------------
    def _expr(self):
        return self._or()

    def _or(self):
        e = self._and()
        while self.accept_kw("or"):
            e = ("or", e, self._and())
        return e

    def _and(self):
        e = self._not()
        while self.accept_kw("and"):
            e = ("and", e, self._not())
        return e

    def _not(self):
        if self.accept_kw("not"):
            return ("not", self._not())
        return self._cmp()

    def _cmp(self):
        e = self._addsub()
        if self.accept_kw("is"):
            neg = bool(self.accept_kw("not"))
            self.expect_kw("null")
            return ("isnull", e, neg)
        neg = bool(self.accept_kw("not"))       # x NOT IN/BETWEEN/LIKE y
        if self.accept_kw("in"):
            self._expect_paren("(")
            if self.peek() == ("kw", "select"):
                sub = self._query()
                self._expect_paren(")")
                return ("insub", e, sub, neg)
            lits = [self._literal()]
            while self.accept_op(","):
                lits.append(self._literal())
            self._expect_paren(")")
            return ("inlit", e, lits, neg)
        if self.accept_kw("between"):
            lo = self._addsub()
            self.expect_kw("and")
            hi = self._addsub()
            b = ("and", ("bin", ">=", e, lo), ("bin", "<=", e, hi))
            return ("not", b) if neg else b
        if self.accept_kw("like"):
            k, v = self.next()
            if k != "lit_str":
                raise SqlError("LIKE needs a string literal")
            return ("not", ("like", e, v)) if neg else ("like", e, v)
        if neg:
            raise SqlError("NOT here must precede IN/BETWEEN/LIKE")
        op = self.accept_op("=", "<>", "!=", "<", "<=", ">", ">=")
        if op:
            return ("bin", {"!=": "<>"}.get(op, op), e, self._addsub())
        return e

    def _addsub(self):
        e = self._muldiv()
        while True:
            op = self.accept_op("+", "-")
            if not op:
                return e
            e = ("arith", op, e, self._muldiv())

    def _muldiv(self):
        e = self._unary()
        while True:
            op = self.accept_op("*", "/")
            if not op:
                return e
            e = ("arith", op, e, self._unary())

    def _unary(self):
        if self.accept_op("-"):
            return ("arith", "-", ("lit", 0), self._unary())
        if self.accept_op("("):
            if self.peek() == ("kw", "select"):
                sub = self._query()
                self._expect_paren(")")
                return ("scalarsub", sub)
            e = self._expr()
            self._expect_paren(")")
            return e
        return self._atom()

    def _atom(self):
        k, v = self.next()
        if k == "name":
            if v.lower() == "exists" and self.peek() == ("op", "(") \
                    and self.toks[self.i + 1] == ("kw", "select"):
                self.next()
                sub = self._query()
                self._expect_paren(")")
                return ("existssub", sub)
            if v.lower() == "extract" and self.peek() == ("op", "("):
                # EXTRACT(part FROM expr) — ANSI datetime field access
                self.next()
                pk, pv = self.next()   # part may tokenize as kw (year)
                if pk not in ("name", "kw") \
                        or str(pv).lower() not in _EXTRACT_PARTS:
                    raise SqlError(
                        f"EXTRACT supports {sorted(_EXTRACT_PARTS)}, "
                        f"got {pv!r}")
                self.expect_kw("from")
                e = self._expr()
                self._expect_paren(")")
                return ("extract", pv.lower(), e)
            return ("col", v)
        if k == "lit_num" or k == "lit_str":
            return ("lit", v)
        if k == "lit_ts":
            import datetime
            return ("lit", datetime.datetime.fromisoformat(v))
        if k == "kw" and v == "null":
            return ("lit", None)
        if k == "kw" and v == "cast":
            self._expect_paren("(")
            e = self._expr()
            self.expect_kw("as")
            tk, tv = self.next()
            if tk not in ("name", "kw") or str(tv).lower() not in \
                    _CAST_TYPES:
                raise SqlError(f"unsupported CAST target {tv!r} "
                               f"(one of {sorted(_CAST_TYPES)})")
            self._expect_paren(")")
            return ("cast", e, str(tv).lower())
        if k == "kw" and v in _AGG_FUNCS:
            # aggregate call as an EXPRESSION node (select items and
            # HAVING); the grouped planner interns each distinct
            # (op, arg, distinct, filter) as one reduce output column
            self._expect_paren("(")
            distinct = bool(self.accept_kw("distinct"))
            if self.accept_op("*"):
                if v != "count":
                    raise SqlError(f"{v.upper()}(*) is not supported")
                arg = ("star",)
            else:
                arg = self._expr()
            self._expect_paren(")")
            filt = None
            k2, v2 = self.peek()
            if k2 == "name" and v2.lower() == "filter":
                self.next()
                self._expect_paren("(")
                self.expect_kw("where")
                filt = self._expr()
                self._expect_paren(")")
            return ("aggref", (_AGG_FUNCS[v], arg, distinct, filt))
        if k == "kw" and v in _SCALAR_FUNCS:
            self._expect_paren("(")
            args = [self._expr()]
            while self.accept_op(","):
                args.append(self._expr())
            self._expect_paren(")")
            return ("func", v, args)
        if k == "kw" and v == "case":
            whens = []
            while self.accept_kw("when"):
                cond = self._expr()
                self.expect_kw("then")
                whens.append((cond, self._expr()))
            if not whens:
                raise SqlError("CASE needs at least one WHEN")
            other = self._expr() if self.accept_kw("else") else ("lit", None)
            self.expect_kw("end")
            return ("case", whens, other)
        raise SqlError(f"unexpected token {v!r} in expression")

    def _literal(self):
        e = self._atom()
        if e[0] != "lit":
            raise SqlError("expected a literal")
        return e


# ---------------------------------------------------------------------------
# Expression compiler: AST → fn(pa.Table) -> pa.Array
# ---------------------------------------------------------------------------

_CMP = {"=": pc.equal, "<>": pc.not_equal, "<": pc.less,
        "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}


def _in_3vl(x, vals: pa.Array, has_null: bool, neg: bool):
    """ANSI three-valued IN: NULL probe → NULL; a NULL in the value
    set makes every non-match NULL (so NOT IN keeps nothing)."""
    if isinstance(x, pa.ChunkedArray):
        x = x.combine_chunks()
    vs = vals
    if len(vals) and vals.type != x.type:
        try:
            vs = vals.cast(x.type)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                pa.ArrowTypeError):
            pass
    if len(vs) == 0:
        if not has_null:
            # ANSI: IN over the empty set is FALSE (NOT IN is TRUE)
            # for EVERY probe, including NULL — no validity gate
            r = pa.array(np.zeros(len(x), dtype=bool))
            return pc.invert(r) if neg else r
        r = pc.and_(pc.is_valid(x), pa.scalar(False))
    else:
        r = pc.is_in(x, value_set=vs)
    nb = pa.scalar(None, pa.bool_())
    if has_null:
        r = pc.if_else(r, pa.scalar(True), nb)
    r = pc.if_else(pc.is_valid(x), r, nb)
    return pc.invert(r) if neg else r
_ARITH = {"+": pc.add, "-": pc.subtract, "*": pc.multiply}


def _eval(ast, t: pa.Table):
    kind = ast[0]
    if kind == "col":
        if ast[1] not in t.column_names:
            raise SqlError(f"unknown column {ast[1]!r}")
        return t[ast[1]]
    if kind == "ocol":
        raise SqlError(
            f"outer column reference {ast[1]!r} is only supported "
            "inside decorrelatable subquery predicates")
    if kind == "extract":
        return pc.cast(getattr(pc, _EXTRACT_PARTS[ast[1]])(
            _eval(ast[2], t)), pa.int64())
    if kind == "lit":
        return pa.scalar(ast[1])
    if kind == "bin":
        return _CMP[ast[1]](_eval(ast[2], t), _eval(ast[3], t))
    if kind == "arith":
        if ast[1] == "/":
            return pc.divide(pc.cast(_eval(ast[2], t), pa.float64()),
                             pc.cast(_eval(ast[3], t), pa.float64()))
        return _ARITH[ast[1]](_eval(ast[2], t), _eval(ast[3], t))
    if kind == "and":
        return pc.and_kleene(_eval(ast[1], t), _eval(ast[2], t))
    if kind == "or":
        return pc.or_kleene(_eval(ast[1], t), _eval(ast[2], t))
    if kind == "not":
        return pc.invert(_eval(ast[1], t))
    if kind == "isnull":
        v = pc.is_null(_eval(ast[1], t))
        return pc.invert(v) if ast[2] else v
    if kind == "in":
        vals = [l[1] for l in ast[2]]
        return pc.is_in(_eval(ast[1], t), value_set=pa.array(vals))
    if kind == "inlit":
        _, e, lits, neg = ast
        pyvals = [l[1] for l in lits]
        nonnull = [v for v in pyvals if v is not None]
        return _in_3vl(_eval(e, t), pa.array(nonnull),
                       any(v is None for v in pyvals), neg)
    if kind == "like":
        return pc.match_like(_eval(ast[1], t), ast[2])
    if kind == "inset":
        # bound IN-subquery: broadcast value set + SQL three-valued
        # logic (NULL probe → NULL; set containing NULL → non-match
        # is NULL, not FALSE — so NOT IN over a null-bearing set
        # keeps zero rows, exactly as ANSI/DuckDB)
        _, e, ref, has_null, neg = ast
        vals = ref
        if not isinstance(vals, pa.Array):
            import ray
            vals = ray.get(vals)
        return _in_3vl(_eval(e, t), vals, has_null, neg)
    if kind == "valid_int":
        return pc.cast(pc.is_valid(_eval(ast[1], t)), pa.int64())
    if kind == "func":
        name, args = ast[1], [_eval(a, t) for a in ast[2]]
        if name == "round":
            nd = 0
            if len(args) == 2:
                nd = args[1].as_py() if isinstance(args[1], pa.Scalar) \
                    else args[1]
            # SQL ROUND is half-away-from-zero (DuckDB/ANSI), not
            # Arrow's default banker's rounding
            return pc.round(pc.cast(args[0], pa.float64()),
                            ndigits=int(nd),
                            round_mode="half_towards_infinity")
        if name == "abs":
            return pc.abs(args[0])
        if name == "lower":
            return pc.utf8_lower(args[0])
        if name == "upper":
            return pc.utf8_upper(args[0])
        if name == "length":
            return pc.cast(pc.utf8_length(args[0]), pa.int64())
        if name == "coalesce":
            return pc.coalesce(*args)
        if name in ("substr", "substring"):
            # 1-based SQL substring; optional length
            start = args[1].as_py() if isinstance(args[1], pa.Scalar) \
                else args[1]
            if not isinstance(start, int) or start < 1:
                raise SqlError("SUBSTR start must be a positive integer")
            stop = None
            if len(args) == 3:
                ln = args[2].as_py() if isinstance(args[2], pa.Scalar) \
                    else args[2]
                if not isinstance(ln, int) or ln < 0:
                    raise SqlError("SUBSTR length must be a non-negative "
                                   "integer")
                stop = start - 1 + ln
            return pc.utf8_slice_codeunits(args[0], start - 1, stop)
        if name == "trim":
            return pc.utf8_trim_whitespace(args[0])
        if name == "ltrim":
            return pc.utf8_ltrim_whitespace(args[0])
        if name == "rtrim":
            return pc.utf8_rtrim_whitespace(args[0])
        if name == "replace":
            pat = args[1].as_py() if isinstance(args[1], pa.Scalar) else None
            rep = args[2].as_py() if isinstance(args[2], pa.Scalar) else None
            if pat is None or rep is None:
                raise SqlError("REPLACE needs literal pattern/replacement")
            return pc.replace_substring(args[0], pattern=pat,
                                        replacement=rep)
        if name == "epoch_ms":
            # DuckDB: BIGINT milliseconds since epoch, sub-ms
            # components TRUNCATED (Arrow's safe cast would raise)
            v = args[0]
            typ = v.type
            if pa.types.is_timestamp(typ) and typ.unit != "ms":
                v = pc.floor_temporal(v, unit="millisecond")
            return pc.cast(pc.cast(v, pa.timestamp("ms"), safe=False),
                           pa.int64())
        if name == "date_trunc":
            unit = args[0].as_py() if isinstance(args[0], pa.Scalar) \
                else None
            if unit not in ("year", "quarter", "month", "week", "day",
                            "hour", "minute", "second", "millisecond"):
                raise SqlError(f"unsupported date_trunc unit {unit!r}")
            if unit == "week":
                # ISO weeks start Monday (DuckDB semantics)
                return pc.floor_temporal(args[1], unit="week",
                                         week_starts_monday=True)
            return pc.floor_temporal(args[1], unit=unit)
        if name in ("year", "month", "day", "hour", "minute", "second"):
            return pc.cast(getattr(pc, name)(args[0]), pa.int64())
        raise SqlError(f"unknown function {name!r}")
    if kind == "cast":
        v = _eval(ast[1], t)
        typ = _CAST_TYPES[ast[2]]
        src = v.type if not isinstance(v, pa.Scalar) else v.type
        if pa.types.is_floating(src) and pa.types.is_integer(typ):
            # SQL float→int casts ROUND — DuckDB's DOUBLE→INT uses C
            # nearbyint, i.e. half-to-even (its DECIMAL casts round
            # half-away, but this frontend's numeric literals are
            # float64); Arrow alone would refuse non-integral values
            v = pc.round(v, ndigits=0, round_mode="half_to_even")
            return pc.cast(v, typ, safe=False)
        return pc.cast(v, typ)
    if kind == "aggref":
        raise SqlError("aggregates are only allowed in SELECT items "
                       "and HAVING")
    if kind == "case":
        # evaluate as nested if_else, first matching WHEN wins
        out = _eval(ast[2], t)
        for cond, val in reversed(ast[1]):
            c = pc.fill_null(_eval(cond, t), False)
            out = pc.if_else(c, _eval(val, t), out)
        return out
    raise SqlError(f"cannot evaluate node {kind!r}")


def _filter_fn(ast, name: str):
    def fn(t: pa.Table) -> pa.Table:
        mask = _eval(ast, t)
        if isinstance(mask, pa.Scalar):     # constant predicate (EXISTS)
            mask = pa.array([mask.as_py()] * t.num_rows, pa.bool_())
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        return t.filter(pc.fill_null(mask, False))
    fn.__name__ = name
    return fn


def _rewrite_ast(ast, keymap: dict):
    if not isinstance(ast, tuple):
        return ast
    if ast[0] == "col":
        return ("col", keymap.get(ast[1], ast[1]))
    return tuple(_rewrite_ast(x, keymap) if isinstance(x, tuple)
                 else ([_rewrite_ast(y, keymap) for y in x]
                       if isinstance(x, list) else x) for x in ast)


def _rewrite_cols(q: dict, keymap: dict) -> dict:
    """Resolve references to INNER-join right keys (coalesced away by
    the physical join) to their left-key columns, everywhere a column
    can appear. Select-item ALIASES keep the user's names."""
    out = dict(q)
    out["where"] = _rewrite_ast(q["where"], keymap) if q["where"] else None
    # QUALIFY runs pre-projection (input columns + window aliases)
    out["qualify"] = _rewrite_ast(q["qualify"], keymap) \
        if q.get("qualify") is not None else None
    # HAVING and ORDER BY reference OUTPUT names (aliases), not input
    # columns — they run after the reduce / projection, unrewritten
    out["group"] = [keymap.get(g, g) if isinstance(g, str)
                    else _rewrite_ast(g, keymap) for g in q["group"]]
    items = []
    for kind, e, a in q["items"]:
        if kind == "agg":
            op, arg, distinct, filt = e
            arg = arg if arg == ("star",) else _rewrite_ast(arg, keymap)
            filt = _rewrite_ast(filt, keymap) if filt is not None else None
            items.append((kind, (op, arg, distinct, filt), a))
        elif kind in ("expr", "aggexpr"):
            items.append((kind, _rewrite_ast(e, keymap), a))
        elif kind == "win":
            method, buckets, part, order, shift = e
            if shift is not None:
                shift = (keymap.get(shift[0], shift[0]), shift[1])
            if isinstance(method, tuple) and method[2] != "*":
                method = (method[0], method[1],
                          keymap.get(method[2], method[2]))
            items.append((kind, (method, buckets,
                                 [keymap.get(c, c) for c in part],
                                 [(keymap.get(c, c), d) for c, d in order],
                                 shift),
                          a))
        else:
            items.append((kind, e, a))
    out["items"] = items
    return out


# ---------------------------------------------------------------------------
# Correlated [NOT] EXISTS / IN — decorrelated to semi / anti joins
# ---------------------------------------------------------------------------

def _conjuncts(ast) -> list:
    if isinstance(ast, tuple) and ast[0] == "and":
        return _conjuncts(ast[1]) + _conjuncts(ast[2])
    return [ast]


def _re_and(conjs: list):
    out = None
    for c in conjs:
        out = c if out is None else ("and", out, c)
    return out


def _plan_correlated(subq: dict, tables: dict, probe):
    """If ``subq`` is a CORRELATED single-table subquery (its WHERE has
    equality conjuncts between an inner column and an OUTER column),
    return ``(outer_keys, inner_keys, inner_ds)`` for a semi/anti join;
    return None when it is uncorrelated (the broadcast binder handles
    it). ``probe`` is the IN probe expression (None for EXISTS) — it
    becomes one more key pair against the subquery's select item."""
    split = _corr_conjunct_split(subq, tables)
    if split is None:
        return None
    inner_ds, inner_cols, outer_keys, inner_keys, inner_preds, \
        correlated, neq_pairs = split
    if not correlated:
        return None
    if probe is None and any(k in ("agg", "aggexpr")
                             for k, _, _ in subq["items"]):
        # EXISTS over a correlated AGGREGATE subquery: a global
        # aggregate yields one row even over zero matches, so EXISTS
        # is always TRUE in SQL — a semi join would silently drop rows
        raise SqlError(
            "correlated EXISTS over an aggregate subquery is always "
            "TRUE in SQL (a global aggregate returns one row even "
            "over zero matches) — drop the EXISTS or use IN")
    if neq_pairs:
        # EXISTS with an additional inner.c <> outer.c conjunct
        # (TPC-H Q21): decorrelates to a grouped MIN/MAX per equality
        # key — "another value exists in the group" ⇔ matched AND
        # (min(c) <> outer.c OR max(c) <> outer.c)
        if probe is not None:
            raise SqlError("correlated IN with a <> conjunct is not "
                           "planned — write EXISTS")
        if len(neq_pairs) != 1:
            raise SqlError("at most one inner.c <> outer.c conjunct "
                           "per correlated EXISTS is planned")
        if not inner_keys:
            raise SqlError("a <>-correlated EXISTS needs at least one "
                           "equality correlation conjunct to group by")
        return ("neq", subq, outer_keys, inner_keys, inner_preds,
                neq_pairs[0])
    if inner_preds:
        inner_ds = inner_ds.map_batches(
            _filter_fn(_re_and(inner_preds), "sql_corr_inner"),
            batch_format="pyarrow", zero_copy_batch=True)
    if probe is not None:
        if probe[0] != "col":
            raise SqlError("correlated IN needs a plain column probe")
        items = subq["items"]
        if len(items) != 1 or items[0][0] != "expr" \
                or not _cols_in(items[0][1]) <= inner_cols:
            raise SqlError("correlated IN subquery must select exactly "
                           "one expression over its own table")
        e_in = items[0][1]
        outer_keys.append(probe[1])
        if e_in[0] == "col":
            inner_keys.append(e_in[1])
        else:
            def _add_inval(t: pa.Table, _e=e_in) -> pa.Table:
                v = _eval(_e, t)
                if isinstance(v, pa.Scalar):
                    v = pa.nulls(t.num_rows, v.type).fill_null(v)
                return t.append_column("__inval", v)
            _add_inval.__name__ = "sql_corr_inval"
            inner_ds = inner_ds.map_batches(
                _add_inval, batch_format="pyarrow", zero_copy_batch=True)
            inner_keys.append("__inval")
    # the join consumes only the key columns — prune the inner scan
    keep = list(dict.fromkeys(inner_keys))
    inner_ds = inner_ds.select_columns(keep)
    return ("semi", outer_keys, inner_keys, inner_ds)


def _corr_conjunct_split(subq: dict, tables: dict):
    """Shared conjunct walk for correlated-subquery planners: classify
    the subquery's WHERE conjuncts into pure-inner predicates and
    equality correlation key pairs. Returns ``(inner_ds, inner_cols,
    outer_keys, inner_keys, inner_preds, correlated)`` or None when the
    subquery shape can't decorrelate (set ops / joins / grouping /
    limits) or the table is unknown."""
    if subq.get("setop") or subq["joins"] or subq["group"] or \
            subq["having"] is not None or subq.get("qualify") is not None \
            or subq["limit"] is not None or subq["order"] \
            or subq.get("ctes"):
        return None
    spec = subq["table"]
    if spec[0] == "aliased":          # single-table alias: cosmetic
        spec = spec[1][0]
    kind, tname = spec
    if kind != "name" or tname not in tables:
        return None
    inner_ds = tables[tname]
    sch = inner_ds.schema(fetch_if_missing=True)
    base = getattr(sch, "base_schema", sch)
    inner_cols = set(base.names if isinstance(base, pa.Schema)
                     else sch.names)
    conjs = _conjuncts(subq["where"]) if subq["where"] is not None else []
    outer_keys, inner_keys, inner_preds, neq_pairs = [], [], [], []
    correlated = False

    def has_ocol(ast):
        if isinstance(ast, tuple):
            if ast[0] == "ocol":
                return True
            return any(has_ocol(x) for x in ast
                       if isinstance(x, (tuple, list)))
        return isinstance(ast, list) and any(has_ocol(x) for x in ast)

    for c in conjs:
        # explicit (qualified) outer references resolve exactly
        if isinstance(c, tuple) and c[0] == "bin" \
                and c[1] in ("=", "<>"):
            l, r = c[2], c[3]
            pair = None
            if l[0] == "col" and r[0] == "ocol":
                pair = (l[1], r[1])
            elif l[0] == "ocol" and r[0] == "col":
                pair = (r[1], l[1])
            if pair is not None:
                if pair[0] not in inner_cols:
                    raise SqlError(f"unknown inner column {pair[0]!r} "
                                   "in correlated predicate")
                correlated = True
                if c[1] == "=":
                    inner_keys.append(pair[0])
                    outer_keys.append(pair[1])
                else:
                    neq_pairs.append(pair)
                continue
        if has_ocol(c):
            raise SqlError(
                "correlated subqueries support only =/<> conjuncts "
                f"between one inner and one outer column, got: {c!r}")
        if isinstance(c, tuple) and c[0] == "bin" \
                and c[1] in ("=", "<>") \
                and c[2][0] == "col" and c[3][0] == "col" \
                and c[2][1] == c[3][1] and c[2][1] in inner_cols:
            raise SqlError(
                f"ambiguous predicate {c[2][1]} {c[1]} {c[2][1]} in a "
                "subquery: an unqualified correlation on a same-named "
                "column cannot be told from an inner tautology — "
                "qualify with table aliases (l2.x <> l1.x)")
        cols = _cols_in(c)
        if cols <= inner_cols:
            inner_preds.append(c)
            continue
        correlated = True
        if isinstance(c, tuple) and c[0] == "bin" \
                and c[1] in ("=", "<>") \
                and c[2][0] == "col" and c[3][0] == "col":
            a, b = c[2][1], c[3][1]
            pair = None
            if a in inner_cols and b not in inner_cols:
                pair = (a, b)
            elif b in inner_cols and a not in inner_cols:
                pair = (b, a)
            if pair is not None:
                if c[1] == "=":
                    inner_keys.append(pair[0])
                    outer_keys.append(pair[1])
                else:
                    neq_pairs.append(pair)
                continue
        raise SqlError(
            "correlated subqueries support only =/<> conjuncts "
            f"between one inner and one outer column, got: {c!r}")
    return inner_ds, inner_cols, outer_keys, inner_keys, inner_preds, \
        correlated, neq_pairs


def _agg_uses_count(item) -> bool:
    """True when an ('agg', spec, a) / ('aggexpr', e, a) select item
    computes any COUNT — which is 0 over zero matched rows in SQL, but
    a grouped decorrelation yields NO row (NULL after the left join),
    so such subqueries must be refused rather than silently misplanned."""
    kind, e, _ = item
    if kind == "agg":
        return e[0] in ("Count", "CountUnique")

    def walk(ast):
        if isinstance(ast, tuple):
            if ast[0] == "aggref" and ast[1][0] in ("Count", "CountUnique"):
                return True
            return any(walk(x) for x in ast)
        if isinstance(ast, list):
            return any(walk(x) for x in ast)
        return False
    return walk(e)


def _plan_corr_scalar(subq: dict, tables: dict, idx: int):
    """If ``subq`` is a CORRELATED single-table scalar AGGREGATE
    subquery, decorrelate it: run the inner aggregate GROUPED by its
    correlation keys (one combiner exchange over the pruned inner
    scan), and return ``(outer_keys, join_keys, val_col, agg_ds)`` for
    a left join back to the outer side. Returns None when
    uncorrelated (the broadcast binder folds those to literals)."""
    split = _corr_conjunct_split(subq, tables)
    if split is None:
        return None
    _, inner_cols, outer_keys, inner_keys, inner_preds, correlated, \
        neq_pairs = split
    if not correlated:
        return None
    if neq_pairs:
        raise SqlError("correlated scalar subqueries support only "
                       "equality correlation conjuncts (got <>)")
    items = subq["items"]
    if len(items) != 1 or items[0][0] not in ("agg", "aggexpr"):
        raise SqlError(
            "correlated scalar subqueries must select exactly one "
            "aggregate (decorrelated to a grouped aggregate + join)")
    zero_fill = False
    if items[0][0] == "agg" and items[0][1][0] == "Count":
        # a BARE correlated COUNT: over zero matches SQL says 0, the
        # grouped decorrelation says no-row/NULL — reconcile by
        # COALESCE(val, 0) at the comparison site
        zero_fill = True
    elif _agg_uses_count(items[0]):
        raise SqlError(
            "correlated scalar subqueries computing an EXPRESSION "
            "over COUNT are not decorrelated (the zero-match value "
            "is the expression at COUNT=0, not NULL — rewrite as an "
            "explicit LEFT JOIN + COALESCE)")
    if not _cols_in(items[0][1]) <= inner_cols:
        raise SqlError("correlated scalar subqueries may aggregate "
                       "only the inner table's columns")
    val_col = f"__sc{idx}"
    keys = list(dict.fromkeys(inner_keys))
    sub2 = dict(subq)
    sub2["where"] = _re_and(inner_preds)
    sub2["group"] = list(keys)
    sub2["items"] = [("expr", ("col", k), k) for k in keys] \
        + [(items[0][0], items[0][1], val_col)]
    agg_ds = _exec(sub2, tables)
    # hidden join-key names: the inner keys may collide with outer
    # columns of the same name (e.g. both sides carry l_partkey)
    join_keys = [f"__sck{idx}_{j}" for j in range(len(keys))]

    def rn(t: pa.Table, _k=tuple(keys), _jk=tuple(join_keys)) -> pa.Table:
        return t.rename_columns(
            [dict(zip(_k, _jk)).get(c, c) for c in t.column_names])
    rn.__name__ = "sql_corr_scalar_keys"
    # materialize: the result is one row per correlation-key group (a
    # grouped aggregate — small by construction), and the join's
    # broadcast-size probe + broadcast pickup would otherwise execute
    # the whole aggregate plan twice
    agg_ds = agg_ds.map_batches(rn, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    # outer keys aligned to the DEDUPED inner key order; one inner
    # column correlating to TWO different outer columns cannot be
    # planned as a single-key join — refuse rather than silently
    # dropping the second constraint
    k2outer = {}
    for ik, ok in zip(inner_keys, outer_keys):
        if k2outer.setdefault(ik, ok) != ok:
            raise SqlError(
                f"correlated scalar subquery equates inner column "
                f"{ik!r} to multiple outer columns "
                f"({k2outer[ik]!r} and {ok!r}) — not planned")
    return [k2outer[k] for k in keys], join_keys, val_col, agg_ds, \
        zero_fill


def _apply_neq_exists(ds, plan, neg: bool, keymap: dict, idx: int,
                      tables: dict):
    """[NOT] EXISTS with an ``inner.c <> outer.c`` conjunct (TPC-H
    Q21), decorrelated WITHOUT a fan-out join: group the inner side by
    its equality-correlation keys computing ``min(c)`` / ``max(c)``
    (one combiner exchange), left-join the tiny per-group row back to
    the outer side, and filter —

        EXISTS  ⇔ matched ∧ min ≢ NULL ∧ o ≢ NULL
                          ∧ (min <> o ∨ max <> o)
        ¬EXISTS ⇔ ¬matched ∨ min ≡ NULL ∨ o ≡ NULL
                          ∨ (min = o ∧ max = o)

    The min/max pair decides "another value exists in the group"
    exactly: all-equal groups compare against the outer value, mixed
    groups always pass; NULL inner values never satisfy ``c <> o``
    (ANSI UNKNOWN), matching the min/max null-skip. Hidden columns
    are dropped after the filter, so the outer schema is unchanged."""
    from datavec_ray.join import JoinStep
    _, subq, okeys, ikeys, ipreds, (nc, oc) = plan
    okeys = [keymap.get(k, k) for k in okeys]
    oc = keymap.get(oc, oc)
    keys = list(dict.fromkeys(ikeys))
    k2outer = {}
    for ik, ok in zip(ikeys, okeys):
        if k2outer.setdefault(ik, ok) != ok:
            raise SqlError(
                f"correlated EXISTS equates inner column {ik!r} to "
                f"multiple outer columns ({k2outer[ik]!r} and {ok!r}) "
                "— not planned")
    mcol, mn, mx = (f"__nq{idx}_m", f"__nq{idx}_min", f"__nq{idx}_max")
    sub2 = dict(subq)
    sub2["where"] = _re_and(ipreds)
    sub2["group"] = list(keys)
    sub2["group_mode"] = "plain"
    sub2["items"] = [("expr", ("col", k), k) for k in keys] + [
        ("agg", ("Count", ("star",), False, None), mcol),
        ("agg", ("Min", ("col", nc), False, None), mn),
        ("agg", ("Max", ("col", nc), False, None), mx)]
    sub2["order"], sub2["limit"] = [], None
    sub2["having"] = sub2["qualify"] = None
    sub2["distinct"] = False
    agg_ds = _exec(sub2, tables)
    jkeys = [f"__nqk{idx}_{j}" for j in range(len(keys))]

    def rn(t: pa.Table, _k=tuple(keys), _jk=tuple(jkeys)) -> pa.Table:
        return t.rename_columns(
            [dict(zip(_k, _jk)).get(c, c) for c in t.column_names])
    rn.__name__ = "sql_neq_exists_keys"
    # one row per correlation-key group — small by construction; the
    # join's broadcast-size probe would otherwise run the plan twice
    agg_ds = agg_ds.map_batches(rn, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    src_sch = _static_schema(ds)
    step = JoinStep(agg_ds, [k2outer[k] for k in keys], jkeys,
                    "LeftOuter")
    if src_sch is not None:
        step._in_schema_hint = src_sch
    ds = step.apply_dataset(ds)

    def notnull(col):
        return ("isnull", ("col", col), True)

    def isnull(col):
        return ("isnull", ("col", col), False)
    if not neg:
        cond = _re_and([
            notnull(mcol), notnull(mn), notnull(oc),
            ("or", ("bin", "<>", ("col", mn), ("col", oc)),
                   ("bin", "<>", ("col", mx), ("col", oc)))])
    else:
        cond = ("or", ("or", isnull(mcol), isnull(mn)),
                ("or", isnull(oc),
                 ("and", ("bin", "=", ("col", mn), ("col", oc)),
                         ("bin", "=", ("col", mx), ("col", oc)))))
    hidden = [mcol, mn, mx]

    def filt_drop(t: pa.Table, _c=cond, _h=tuple(hidden)) -> pa.Table:
        mask = _eval(_c, t)
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        return t.filter(pc.fill_null(mask, False)).drop_columns(list(_h))
    filt_drop.__name__ = "sql_neq_exists_filter"
    return _keep_hint(ds.map_batches(filt_drop, batch_format="pyarrow",
                                     zero_copy_batch=True), src_sch)


def _scalarsub_nodes(ast):
    if isinstance(ast, tuple):
        if ast[0] == "scalarsub":
            yield ast
            return
        for x in ast:
            yield from _scalarsub_nodes(x)
    elif isinstance(ast, list):
        for x in ast:
            yield from _scalarsub_nodes(x)


def _subquery_nodes(ast):
    if isinstance(ast, tuple):
        if ast[0] in ("scalarsub", "existssub", "insub"):
            yield ast
            return
        for x in ast:
            yield from _subquery_nodes(x)
    elif isinstance(ast, list):
        for x in ast:
            yield from _subquery_nodes(x)


def _decorrelate_where(q: dict, ds, tables: dict, keymap=None):
    """Split TOP-LEVEL WHERE conjuncts that are correlated [NOT]
    EXISTS / IN subqueries into SemiJoinStep applications (SQL EXISTS
    ≡ semi join, NOT EXISTS ≡ anti join — Bloom-prefilter-capable,
    broadcast when the inner side is small), and correlated scalar
    AGGREGATE comparisons into grouped-aggregate left joins (TPC-H
    Q17-style ``x < (SELECT agg(...) WHERE k = outer_k)``). Remaining
    conjuncts stay in WHERE; uncorrelated subqueries fall through to
    the broadcast binder."""
    if q["where"] is None:
        return q, ds
    from datavec_ray.join import JoinStep, SemiJoinStep
    # subquery dicts escape the join-key rewrite (_rewrite_ast does
    # not descend into them), so correlation references to an INNER
    # join's coalesced right key must be resolved here
    keymap = keymap or {}
    rest = []
    n_scalar = 0
    for c in _conjuncts(q["where"]):
        neg, node = False, c
        if isinstance(node, tuple) and node[0] == "not" \
                and isinstance(node[1], tuple) \
                and node[1][0] == "existssub":
            neg, node = True, node[1]
        plan = None
        probe = None
        if isinstance(node, tuple) and node[0] == "existssub":
            plan = _plan_correlated(node[1], tables, None)
        elif isinstance(node, tuple) and node[0] == "insub":
            _, probe, subq, in_neg = node
            plan = _plan_correlated(subq, tables, probe)
            if plan is not None and in_neg:
                raise SqlError(
                    "correlated NOT IN is ambiguous under SQL NULL "
                    "semantics — write NOT EXISTS instead")
        elif isinstance(node, tuple) and node[0] == "bin":
            # x CMP (SELECT agg(...) WHERE k = outer_k): decorrelate
            # the scalar side to a grouped aggregate + left join; the
            # comparison then references the joined value column
            # (NULL on unmatched rows → UNKNOWN → dropped, as ANSI)
            sides = [node[2], node[3]]
            sc = [i for i, s in enumerate(sides)
                  if isinstance(s, tuple) and s[0] == "scalarsub"]
            if len(sc) == 1:
                sp = _plan_corr_scalar(sides[sc[0]][1], tables, n_scalar)
                if sp is not None:
                    okeys, jkeys, val_col, agg_ds, zero_fill = sp
                    okeys = [keymap.get(k, k) for k in okeys]
                    n_scalar += 1
                    if any(kind == "star" for kind, _, _ in q["items"]):
                        raise SqlError(
                            "correlated scalar subqueries cannot mix "
                            "with SELECT * (the decorrelation join "
                            "adds hidden columns)")
                    src_sch = _static_schema(ds)
                    ds = JoinStep(agg_ds, okeys, jkeys, "LeftOuter") \
                        .apply_dataset(ds)
                    if src_sch is not None:
                        # left join appends the agg side's columns
                        # (materialized → schema known); key columns
                        # coalesce into the left keys
                        agg_sch = agg_ds.schema(
                            fetch_if_missing=False)
                        agg_sch = getattr(agg_sch, "base_schema",
                                          agg_sch)
                        if isinstance(agg_sch, pa.Schema):
                            ext = src_sch
                            for f in agg_sch:
                                if f.name not in ext.names \
                                        and f.name not in jkeys:
                                    ext = ext.append(f)
                            ds = _keep_hint(ds, ext)
                    sides[sc[0]] = ("func", "coalesce",
                                    [("col", val_col), ("lit", 0)]) \
                        if zero_fill else ("col", val_col)
                    rest.append(("bin", node[1], sides[0], sides[1]))
                    continue
            elif len(sc) == 2:
                raise SqlError("a comparison between two correlated "
                               "scalar subqueries is not planned")
        if plan is None:
            rest.append(c)
            continue
        if plan[0] == "neq":
            ds = _apply_neq_exists(ds, plan, neg, keymap, n_scalar,
                                   tables)
            n_scalar += 1
            continue
        _, outer_keys, inner_keys, inner_ds = plan
        outer_keys = [keymap.get(k, k) for k in outer_keys]
        ds = _keep_hint(
            SemiJoinStep(inner_ds, outer_keys, inner_keys,
                         anti=neg).apply_dataset(ds),
            _static_schema(ds))
    # any correlated scalar subquery still buried deeper in the tree
    # (not one side of a top-level comparison) would reach the
    # uncorrelated binder and crash on an unknown column — refuse now
    # with an actionable message instead
    for c in rest:
        for sub in _scalarsub_nodes(c):
            split = _corr_conjunct_split(sub[1], tables)
            if split is not None and split[5]:
                raise SqlError(
                    "correlated scalar subqueries are supported only "
                    "as one side of a top-level WHERE comparison")
    out = dict(q)
    out["where"] = _re_and(rest)
    return out, ds


# ---------------------------------------------------------------------------
# IN (SELECT ...) binding — broadcast semi-join
# ---------------------------------------------------------------------------

_INSUB_CAP = 4_000_000


def _bind_insub(ast, tables):
    """Execute each ``IN (SELECT ...)`` subquery and replace its node
    with an ``inset`` carrying the DISTINCT value set behind a single
    ``ray.put`` — the classic broadcast semi-join: the subquery side
    must be small (≤ ``_INSUB_CAP`` values; bigger sides belong in an
    explicit ``join.semi_join``), the probe side streams, no shuffle."""
    if not isinstance(ast, tuple):
        return ast
    if ast[0] == "scalarsub":
        # uncorrelated scalar subquery → a literal (0 rows → NULL,
        # >1 rows is an error, exactly as ANSI)
        from datavec_ray.util import dataset_to_table
        sub = dataset_to_table(_exec(ast[1], tables))
        if sub.num_columns != 1:
            # a zero-row result can lose its schema entirely
            # (dataset_to_table of an empty plan has no columns) —
            # validate shape against the declared output names instead
            names = _out_names(ast[1]) if sub.num_rows == 0 else None
            if sub.num_rows == 0 and (names is None or len(names) == 1):
                return ("lit", None)
            raise SqlError("scalar subquery must produce one column, "
                           f"got {sub.column_names or names}")
        if sub.num_rows > 1:
            raise SqlError(
                f"scalar subquery produced {sub.num_rows} rows")
        v = sub.column(0)[0].as_py() if sub.num_rows else None
        return ("lit", v)
    if ast[0] == "existssub":
        # uncorrelated EXISTS → a boolean literal; only probe for the
        # FIRST row (limit(1) stops the subquery's streaming executor
        # as soon as any block arrives)
        n = _exec(ast[1], tables).limit(1).count()
        return ("lit", n > 0)
    if ast[0] == "insub":
        _, e, subq, neg = ast
        e = _bind_insub(e, tables)
        from datavec_ray.util import dataset_to_table
        sub = dataset_to_table(_exec(subq, tables))
        if sub.num_columns != 1:
            # zero-row subquery: the materialized table has no schema;
            # ANSI still treats the empty set as IN=FALSE / NOT IN=TRUE,
            # so validate single-column shape via the declared output
            # names and bind an empty value set
            names = _out_names(subq) if sub.num_rows == 0 else None
            if sub.num_rows == 0 and (names is None or len(names) == 1):
                return ("inset", e, pa.array([], pa.null()), False, neg)
            raise SqlError("IN (SELECT ...) must produce exactly one "
                           f"column, got {sub.column_names or names}")
        if sub.num_rows > _INSUB_CAP:
            raise SqlError(
                f"IN-subquery produced {sub.num_rows} rows "
                f"(cap {_INSUB_CAP}); use join.semi_join for large sides")
        col = sub.column(0).combine_chunks()
        has_null = col.null_count > 0
        vals = pc.unique(col.drop_null())
        import ray
        ref = ray.put(vals) if ray.is_initialized() else vals
        return ("inset", e, ref, has_null, neg)
    return tuple(_bind_insub(x, tables) if isinstance(x, tuple)
                 else ([_bind_insub(y, tables) for y in x]
                       if isinstance(x, list) else x) for x in ast)


def _bind_q_insub(q: dict, tables: dict) -> dict:
    """Bind IN-subqueries everywhere an expression can appear in one
    SELECT node (WHERE / HAVING / QUALIFY / select items / agg args)."""
    def b(ast):
        return _bind_insub(ast, tables) if ast is not None else None
    out = dict(q)
    out["where"] = b(q["where"])
    out["having"] = b(q["having"])
    out["qualify"] = b(q.get("qualify"))
    items = []
    for kind, e, a in q["items"]:
        if kind == "agg":
            op, arg, distinct, filt = e
            arg = arg if arg == ("star",) else b(arg)
            items.append((kind, (op, arg, distinct, b(filt)), a))
        elif kind in ("expr", "aggexpr"):
            items.append((kind, b(e), a))
        else:
            items.append((kind, e, a))
    out["items"] = items
    return out


# ---------------------------------------------------------------------------
# Planner / executor
# ---------------------------------------------------------------------------

def _as_arrow(d):
    """Normalize any table-ish input to an Arrow-blocked Dataset —
    pandas-backed datasets report PandasBlockSchema, which the
    join/reduce schema probes can't use (zero work for already-Arrow
    datasets at execution)."""
    import pandas as pd
    if isinstance(d, (pa.Table, pd.DataFrame)):
        import ray.data as rd
        return rd.from_arrow(d if isinstance(d, pa.Table)
                             else pa.Table.from_pandas(d))
    sch = d.schema(fetch_if_missing=False)
    if sch is not None and not isinstance(
            getattr(sch, "base_schema", None), pa.Schema):
        ident = lambda t: t                       # noqa: E731
        d = d.map_batches(ident, batch_format="pyarrow",
                          zero_copy_batch=True)
    return d


def _static_schema(ds):
    """Best-effort Arrow schema WITHOUT executing the plan: a hint
    attached by schema-preserving planner steps (filters, semi/anti
    joins — Ray cannot infer a map_batches schema over a zero-row
    input without executing), else Ray's no-execute metadata."""
    h = getattr(ds, "_dv_schema_hint", None)
    if h is not None:
        return h
    s = ds.schema(fetch_if_missing=False)
    base = getattr(s, "base_schema", s)
    return base if isinstance(base, pa.Schema) else None


def _keep_hint(new_ds, src_schema):
    if src_schema is not None:
        new_ds._dv_schema_hint = src_schema
    return new_ds


def _resolve_table(spec, tables):
    kind, v = spec
    if kind == "sub":
        return _exec(v, tables)       # derived table: plan recursively
    if kind == "aliased":             # unresolved alias: base table
        return _resolve_table(v[0], tables)
    if kind == "rename":              # self-join instance: physically
        base, rn = v                  # rename colliding columns
        ds = _resolve_table(base, tables)
        sch = _static_schema(ds)

        def rnf(t: pa.Table, _rn=rn) -> pa.Table:
            return t.rename_columns([_rn.get(c, c)
                                     for c in t.column_names])
        rnf.__name__ = "sql_alias_rename"
        out = ds.map_batches(rnf, batch_format="pyarrow",
                             zero_copy_batch=True)
        if sch is not None:
            out = _keep_hint(out, pa.schema(
                [pa.field(rn.get(f.name, f.name), f.type) for f in sch]))
        return out
    if v not in tables:
        raise SqlError(f"unknown table {v!r}")
    return tables[v]


# ---------------------------------------------------------------------------
# Scope resolution: table aliases, qualified column references, self-joins
# ---------------------------------------------------------------------------
#
# Runs once on the parsed AST, before planning. Each SELECT scope maps
# ``alias -> {column -> physical name}``; a later table instance whose
# columns collide with an earlier one (a self-join: ``nation n1, nation
# n2``) gets those columns physically renamed to ``alias.column`` via a
# ("rename", (base_spec, {old: new})) table spec the planner applies to
# the right side before joining. A qualified reference whose qualifier
# lives in an ANCESTOR scope becomes an ("ocol", name) node — an
# explicit outer-column marker the correlated-subquery planners
# classify exactly (no more inner-tautology ambiguity for
# ``l2.l_suppkey <> l1.l_suppkey``).


def _resolve_scopes(q: dict, env: dict, outers: list) -> dict:
    """Rewrite one query node (and its subqueries, recursively).
    ``env``: table/CTE name -> known column list (or None).
    ``outers``: enclosing SELECT scopes, outermost first."""
    out = dict(q)
    if q.get("ctes"):
        env = dict(env)
        ctes = []
        for nm, sub in q["ctes"]:
            if q.get("recursive"):
                env[nm] = _out_names(sub)     # visible to its own body
            rsub = _resolve_scopes(sub, env, [])
            env[nm] = _out_names(rsub)
            ctes.append((nm, rsub))
        out["ctes"] = ctes
    if "setop" in q:
        out["left"] = _resolve_scopes(out["left"], env, outers)
        out["right"] = _resolve_scopes(out["right"], env, outers)
        return out

    # ---- build this SELECT's scope ------------------------------------
    def unpack(spec):
        alias = None
        if spec[0] == "aliased":
            spec, alias = spec[1]
        if spec[0] == "name":
            return spec, (alias or spec[1]), env.get(spec[1])
        rsub = _resolve_scopes(spec[1], env, [])   # derived: no LATERAL
        return ("sub", rsub), alias, _out_names(rsub)

    raw = [unpack(q["table"])] + [unpack(right)
                                  for right, _, _ in q["joins"]]
    taken: set = set()
    scope: dict = {}
    specs = []
    for spec, alias, cols in raw:
        phys, rn = {}, {}
        if cols is None:
            phys = None
        else:
            for c in cols:
                if c in taken:
                    if alias is None:
                        raise SqlError(
                            f"duplicate column {c!r} across FROM tables "
                            "— alias the second instance to disambiguate")
                    p = f"{alias}.{c}"
                    rn[c] = p
                else:
                    p = c
                    taken.add(c)
                phys[c] = p
        if rn:
            spec = ("rename", (spec, rn))
        specs.append(spec)
        if alias is not None:
            if alias in scope:
                raise SqlError(f"duplicate table alias {alias!r}")
            scope[alias] = phys
    out["table"] = specs[0]

    # ---- expression / name rewriting ----------------------------------
    def res_qual(name: str, allow_outer: bool):
        qual, c = name.split(".", 1)
        if qual in scope:
            phys = scope[qual]
            if phys is None:
                return ("col", c)
            if c not in phys:
                raise SqlError(f"column {c!r} not found in table "
                               f"{qual!r}")
            return ("col", phys[c])
        for osc in reversed(outers):
            if qual in osc:
                if not allow_outer:
                    raise SqlError(
                        f"outer reference {name!r} is not allowed here")
                ophys = osc[qual]
                if ophys is None:
                    return ("ocol", c)
                if c not in ophys:
                    raise SqlError(f"column {c!r} not found in outer "
                                   f"table {qual!r}")
                return ("ocol", ophys[c])
        # unknown qualifier: legacy strip to the LAST path component
        return ("col", name.split(".")[-1])

    def res_name(s: str) -> str:
        if not isinstance(s, str) or "." not in s:
            return s
        node = res_qual(s, allow_outer=False)
        return node[1]

    def res(ast):
        if not isinstance(ast, tuple):
            return [res(x) for x in ast] if isinstance(ast, list) else ast
        if ast[0] == "col" and isinstance(ast[1], str):
            if "." in ast[1]:
                return res_qual(ast[1], allow_outer=True)
            return ast
        if ast[0] == "scalarsub":
            return ("scalarsub",
                    _resolve_scopes(ast[1], env, outers + [scope]))
        if ast[0] == "existssub":
            return ("existssub",
                    _resolve_scopes(ast[1], env, outers + [scope]))
        if ast[0] == "insub":
            return ("insub", res(ast[1]),
                    _resolve_scopes(ast[2], env, outers + [scope]),
                    ast[3])
        return tuple(res(x) if isinstance(x, (tuple, list)) else x
                     for x in ast)

    out["joins"] = [(spec, res(onexpr), how) for spec, (_, onexpr, how)
                    in zip(specs[1:], q["joins"])]
    for key in ("where", "having", "qualify"):
        if out.get(key) is not None:
            out[key] = res(out[key])
    out["group"] = [res_name(g) if isinstance(g, str) else res(g)
                    for g in q["group"]]
    out["order"] = [(res_name(c) if isinstance(c, str) else res(c), d)
                    for c, d in q["order"]]
    items = []
    for kind, e, a in q["items"]:
        if kind == "agg":
            op, arg, distinct, filt = e
            arg = arg if arg == ("star",) else res(arg)
            filt = res(filt) if filt is not None else None
            items.append((kind, (op, arg, distinct, filt), a))
        elif kind in ("expr", "aggexpr"):
            items.append((kind, res(e), a))
        elif kind == "win":
            method, buckets, part, order, shift = e
            if shift is not None:
                shift = (res_name(shift[0]), shift[1])
            if isinstance(method, tuple) and method[2] != "*":
                method = (method[0], method[1], res_name(method[2])) \
                    + tuple(method[3:])
            items.append((kind, (method, buckets,
                                 [res_name(c) for c in part],
                                 [(res_name(c), d) for c, d in order],
                                 shift), a))
        else:
            items.append((kind, e, a))
    out["items"] = items
    return out


def sql(query: str, tables: dict):
    """Compile + execute: returns a ``ray.data.Dataset``. ``tables``
    maps FROM/JOIN names to Datasets. Qualified references and table
    aliases (incl. self-joins) resolve through ``_resolve_scopes``;
    unqualified column names must be unique across joined tables."""
    q = _Parser(query).parse()
    tables = {k: _as_arrow(v) for k, v in tables.items()}
    env = {}
    for k, v in tables.items():
        try:
            sch = _static_schema(v)
            if sch is None:
                # in-memory datasets (from_pandas) expose no plan-time
                # schema; their blocks exist, so this probe is cheap —
                # and alias/self-join resolution needs the column sets
                s = v.schema(fetch_if_missing=True)
                base = getattr(s, "base_schema", s)
                sch = base if isinstance(base, pa.Schema) else None
        except Exception:              # noqa: BLE001 — schema best-effort
            sch = None
        env[k] = list(sch.names) if sch is not None else None
    q = _resolve_scopes(q, env, [])
    return _exec(q, tables)


def _null_safe_sort(ds, order):
    """ORDER BY with SQL null semantics (NULLS LAST, DuckDB's default).
    Ray's range-partitioned sort compares raw values and chokes on None
    vs value, so each key is lifted to an (is_null, filled) pair —
    null flag ascending puts null rows last for ASC and DESC alike."""
    cols = [c for c, _ in order]
    desc = [d for _, d in order]
    flags = [f"__n{i}" for i in range(len(cols))]
    fills = [f"__s{i}" for i in range(len(cols))]

    def lift(t: pa.Table) -> pa.Table:
        for i, c in enumerate(cols):
            if isinstance(c, tuple):        # ORDER BY expression
                a = _eval(c, t)
                if isinstance(a, pa.Scalar):
                    a = pa.nulls(t.num_rows, a.type).fill_null(a)
                if isinstance(a, pa.ChunkedArray):
                    a = a.combine_chunks()
            else:
                a = t[c]
            t = t.append_column(flags[i], pc.is_null(a))
            try:
                filled = pc.fill_null(a, pa.scalar(
                    "" if pa.types.is_string(a.type)
                    or pa.types.is_large_string(a.type)
                    else False if pa.types.is_boolean(a.type)
                    else 0).cast(a.type))
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                filled = a                   # unfillable type: raw column
            t = t.append_column(fills[i], filled)
        return t
    lift.__name__ = "sql_sort_keys"
    keys = [k for pair in zip(flags, fills) for k in pair]
    dirs = [d for dd in desc for d in (False, dd)]
    ds = ds.map_batches(lift, batch_format="pyarrow",
                        zero_copy_batch=True).sort(keys, descending=dirs)

    def drop(t: pa.Table) -> pa.Table:
        return t.drop_columns(flags + fills)
    drop.__name__ = "sql_sort_drop"
    return ds.map_batches(drop, batch_format="pyarrow",
                          zero_copy_batch=True)


def _out_names(q: dict):
    """Declared output column names of a query node, or None when not
    statically known (SELECT *)."""
    if "setop" in q:
        return _out_names(q["left"])
    if any(kind == "star" for kind, _, _ in q["items"]):
        return None
    return [a for _, _, a in q["items"]]


def _ref_count(q: dict, nm: str) -> int:
    """How many times a query node references table ``nm`` — FROM/JOIN
    chain, derived tables, set-op branches, and subqueries in any
    expression position. Drives the materialize-once decision for
    multi-referenced CTEs."""
    if "setop" in q:
        return _ref_count(q["left"], nm) + _ref_count(q["right"], nm)

    def spec_n(spec):
        k, v = spec
        if k == "name":
            return int(v == nm)
        if k in ("aliased", "rename"):
            return spec_n(v[0])
        return _ref_count(v, nm)

    n = spec_n(q["table"])
    for right, onexpr, _ in q["joins"]:
        n += spec_n(right)

    def walk(ast):
        c = 0
        if isinstance(ast, tuple):
            if ast[0] in ("scalarsub", "existssub"):
                return _ref_count(ast[1], nm)
            if ast[0] == "insub":
                return walk(ast[1]) + _ref_count(ast[2], nm)
            for x in ast:
                if isinstance(x, (tuple, list)):
                    c += walk(x)
        elif isinstance(ast, list):
            for x in ast:
                c += walk(x)
        return c

    for key in ("where", "having", "qualify"):
        if q.get(key) is not None:
            n += walk(q[key])
    for kind, e, _ in q.get("items", []):
        if kind in ("expr", "aggexpr"):
            n += walk(e)
        elif kind == "agg" and isinstance(e, tuple):
            _, arg, _, filt = e
            if arg != ("star",):
                n += walk(arg)
            if filt is not None:
                n += walk(filt)
    return n


def _refs_table(q: dict, nm: str) -> bool:
    """Does a query node reference table ``nm`` anywhere in its
    FROM/JOIN chain, derived tables, set-op branches, or WHERE
    subqueries?"""
    if "setop" in q:
        return _refs_table(q["left"], nm) or _refs_table(q["right"], nm)
    def spec_refs(spec):
        k, v = spec
        if k == "name":
            return v == nm
        if k == "aliased":
            return spec_refs(v[0])
        if k == "rename":
            return spec_refs(v[0])
        return _refs_table(v, nm)
    if spec_refs(q["table"]):
        return True
    if any(spec_refs(right) for right, _, _ in q["joins"]):
        return True

    def walk(ast):
        if isinstance(ast, tuple):
            if ast[0] in ("scalarsub", "existssub") \
                    and _refs_table(ast[1], nm):
                return True
            if ast[0] == "insub" and _refs_table(ast[2], nm):
                return True
            return any(walk(x) for x in ast
                       if isinstance(x, (tuple, list)))
        if isinstance(ast, list):
            return any(walk(x) for x in ast)
        return False
    return walk(q.get("where")) or walk(q.get("having")) \
        or walk(q.get("qualify")) \
        or any(walk(e) for _, e, _ in q.get("items", []))


_RECURSIVE_MAX_ROWS = 2_000_000
_RECURSIVE_MAX_ITERS = 200


def _exec_recursive_cte(nm: str, body: dict, tables: dict):
    """WITH RECURSIVE nm AS (<anchor> UNION [ALL] <step>): iterative
    semi-naive evaluation — the step query runs against ONLY the
    previous iteration's delta (standard linear recursion), each delta
    materialized on the driver and re-broadcast into the step plan.

    Scale contract: deltas + accumulated rows are driver-held and
    capped (rows/iterations) — the SQL surface is the exact, bounded
    counterpart; unbounded iterative closures at lake scale belong to
    ``ops.graph`` (pointer-doubling tree_paths / connected
    components), which shuffle instead of materializing."""
    import ray.data as rd

    from datavec_ray.util import dataset_to_table
    distinct = body.get("setop") == "distinct"
    anchor = body["left"]
    step = body["right"]
    if "setop" in anchor or "setop" in step:
        raise SqlError(
            "recursive CTEs support exactly one UNION [ALL] of an "
            "anchor and one recursive term")
    if _refs_table(anchor, nm):
        raise SqlError("the recursive CTE anchor cannot reference "
                       f"{nm!r} (only the term after UNION may)")
    if not _refs_table(step, nm):
        raise SqlError(f"the recursive term does not reference {nm!r} "
                       "— drop RECURSIVE")
    if body.get("order") or body.get("limit") is not None:
        raise SqlError("ORDER BY/LIMIT inside a recursive CTE body "
                       "are not supported (apply them outside)")
    an, sn = _out_names(anchor), _out_names(step)
    if an is not None and sn is not None and an != sn:
        raise SqlError(
            f"recursive CTE branches must declare the same columns "
            f"({an} vs {sn})")
    cur = dataset_to_table(_exec(anchor, tables))
    seen: set = set()

    def keys_of(t: pa.Table):
        if t.num_rows == 0:
            return []
        return list(zip(*[c.to_pylist() for c in t.columns]))

    def dedupe(t: pa.Table):
        ks = keys_of(t)
        keep = []
        for i, k in enumerate(ks):
            if k not in seen:
                seen.add(k)
                keep.append(i)
        if len(keep) == t.num_rows:
            return t
        return t.take(pa.array(keep, pa.int64()))

    if distinct:
        cur = dedupe(cur)
    acc = [cur]
    total = cur.num_rows
    iters = 0
    while cur.num_rows:
        iters += 1
        if iters > _RECURSIVE_MAX_ITERS:
            raise SqlError(
                f"recursive CTE {nm!r} exceeded "
                f"{_RECURSIVE_MAX_ITERS} iterations — likely a cycle "
                "(use UNION for set semantics, or ops.graph for "
                "unbounded closures)")
        t2 = dict(tables)
        t2[nm] = rd.from_arrow(cur)
        delta = dataset_to_table(_exec(step, t2))
        if delta.num_rows and delta.column_names != cur.column_names:
            delta = delta.select(cur.column_names) \
                if set(cur.column_names) <= set(delta.column_names) \
                else delta
        if distinct:
            delta = dedupe(delta)
        if delta.num_rows == 0:
            break
        total += delta.num_rows
        if total > _RECURSIVE_MAX_ROWS:
            raise SqlError(
                f"recursive CTE {nm!r} exceeded {_RECURSIVE_MAX_ROWS} "
                "accumulated rows — use ops.graph for lake-scale "
                "closures")
        acc.append(delta)
        cur = delta
    return rd.from_arrow(pa.concat_tables(
        acc, promote_options="permissive"))


def _exec(q: dict, tables: dict):
    if q.get("ctes"):
        # WITH name AS (...): each CTE plans into a Dataset visible to
        # later CTEs and the main query. A CTE referenced MORE THAN
        # ONCE (later CTEs + anywhere in the body, incl. subqueries —
        # TPC-H Q2/Q11/Q15 reference theirs twice) is materialized
        # once in the object store instead of re-executing its whole
        # plan per reference; single-use CTEs stay lazy. Under WITH
        # RECURSIVE, a CTE whose body is a two-branch UNION [ALL] with
        # a self-referencing second branch runs the bounded iterative
        # evaluator.
        tables = dict(tables)
        ctes = q["ctes"]
        body = {k: v for k, v in q.items()
                if k not in ("ctes", "recursive")}
        for i, (nm, sub) in enumerate(ctes):
            if q.get("recursive") and "setop" in sub \
                    and sub.get("setop") in ("all", "distinct") \
                    and _refs_table(sub["right"], nm):
                tables[nm] = _exec_recursive_cte(nm, sub, tables)
            elif q.get("recursive") and _refs_table(sub, nm):
                raise SqlError(
                    f"recursive CTE {nm!r} must be <anchor> UNION "
                    "[ALL] <recursive term>")
            else:
                cds = _exec(sub, tables)
                uses = _ref_count(body, nm) + sum(
                    _ref_count(s, nm) for _, s in ctes[i + 1:])
                if uses > 1:
                    cds = cds.materialize()
                tables[nm] = cds
        q = body
    if "setop" in q:
        left = _exec(q["left"], tables)
        right = _exec(q["right"], tables)
        ln, rn = _out_names(q["left"]), _out_names(q["right"])
        if ln is not None and rn is not None and ln != rn:
            raise SqlError(
                f"UNION branches must declare the same columns "
                f"({ln} vs {rn})")
        if q["setop"] in ("intersect", "except"):
            from datavec_ray.ops.setops import except_rows, intersect_rows
            f = intersect_rows if q["setop"] == "intersect" else except_rows
            ds = f(left, right)
        else:
            ds = left.union(right)
            if q["setop"] == "distinct":
                from datavec_ray.ops.setops import distinct_rows
                ds = distinct_rows(ds)
        if q["order"]:
            ds = _null_safe_sort(ds, q["order"])
        if q["limit"] is not None:
            ds = ds.limit(q["limit"])
        return ds

    ds = _resolve_table(q["table"], tables)
    if _static_schema(ds) is None and q["where"] is not None and any(
            True for _ in _subquery_nodes(q["where"])):
        # capture the FROM table's schema while it is still cheap to
        # probe — downstream semi/anti joins from decorrelated WHERE
        # subqueries can EMPTY the plan, after which no schema is
        # recoverable. Probed only when such subqueries exist: for a
        # derived-table FROM (a CTE ending in a blocking aggregate)
        # the probe would otherwise execute the whole upstream once
        # just for the schema
        s = ds.schema(fetch_if_missing=True)
        base = getattr(s, "base_schema", s)
        if isinstance(base, pa.Schema):
            _keep_hint(ds, base)

    from datavec_ray.join import JoinStep
    keymap: dict[str, str] = {}
    # track the running join-output schema statically: every JoinStep
    # whose left schema must otherwise be PROBED executes the whole
    # accumulated chain through a limit(1) at PLAN time — a join of J
    # tables paid J-1 probe executions before this
    cur_sch = _static_schema(ds)
    for right, onexpr, how in q["joins"]:
        rds = _resolve_table(right, tables)
        rsch = rsch_hint = _static_schema(rds)
        if rsch is None:
            spec2 = right[1][0] if right[0] == "rename" else right
            if spec2[0] == "sub":      # derived: declared output names
                names = _out_names(spec2[1])
                if names is not None:
                    rsch = pa.schema([pa.field(n, pa.null())
                                      for n in names])
            else:
                try:                   # base table: cheap schema probe
                    s = rds.schema(fetch_if_missing=True)
                    base = getattr(s, "base_schema", s)
                    rsch = base if isinstance(base, pa.Schema) else None
                except Exception:      # noqa: BLE001 — best-effort
                    rsch = None
        lnames = set(cur_sch.names) if cur_sch is not None else None
        rnames = set(rsch.names) if rsch is not None else None
        lks, rks, resid = [], [], []
        for c in _conjuncts(onexpr):
            if isinstance(c, tuple) and c[0] == "bin" and c[1] == "=" \
                    and c[2][0] == "col" and c[3][0] == "col":
                a, b = c[2][1], c[3][1]
                # orient each pair (left key, right key) by schema —
                # TPC-H writes ON both ways round (p_partkey =
                # l_partkey vs l_partkey = p_partkey)
                if lnames is not None and rnames is not None:
                    if a not in lnames and b in lnames and a in rnames:
                        a, b = b, a
                    elif a in lnames and b in lnames \
                            and a in rnames and b not in rnames:
                        a, b = b, a
                elif lnames is not None:
                    if a not in lnames and b in lnames:
                        a, b = b, a
                elif rnames is not None:
                    if a in rnames and b not in rnames:
                        a, b = b, a
                lks.append(a)
                rks.append(b)
            else:
                resid.append(c)
        if not lks:
            raise SqlError("JOIN ON needs at least one equality "
                           "between a left and a right column")
        resid_expr = _re_and(resid) if resid else None
        if resid_expr is not None and how != "Inner":
            # outer joins: a residual predicate is part of the MATCH
            # condition — only safe to evaluate as a pre-join filter
            # on the null-supplying side (its rows without a match
            # survive as NULLs either way)
            rcols = _cols_in(resid_expr)
            if how == "LeftOuter" and rnames is not None \
                    and rcols <= rnames:
                rds = rds.map_batches(
                    _filter_fn(resid_expr, "sql_on_resid"),
                    batch_format="pyarrow", zero_copy_batch=True)
                rds = _keep_hint(rds, rsch_hint)
                resid_expr = None
            elif how == "RightOuter" and lnames is not None \
                    and rcols <= lnames:
                ds = _keep_hint(ds.map_batches(
                    _filter_fn(resid_expr, "sql_on_resid"),
                    batch_format="pyarrow", zero_copy_batch=True),
                    cur_sch)
                resid_expr = None
            else:
                raise SqlError(
                    "non-equality JOIN ON conjuncts are supported on "
                    "INNER joins and on the null-supplying side of "
                    "LEFT/RIGHT OUTER joins")
        if how in ("RightOuter", "FullOuter"):
            # exact ANSI key semantics need BOTH key columns (left key
            # NULL on right-only rows and vice versa) — the bucket
            # co-partition join keeps them (coalesce_keys=False per
            # bucket); the coalesced Dataset.join column would silently
            # lie for one side's key
            try:
                step = JoinStep(rds, lks, rks,
                                how, strategy="bucket",
                                keep_right_keys=True)
                if cur_sch is not None:
                    step._in_schema_hint = cur_sch
                ds = step.apply_dataset(ds)
            except ValueError as e:
                # apply_dataset raises the same schema-shape ValueError
                # as the constructor when the left side's schema is not
                # statically known — surface both as plan-time SqlError
                raise SqlError(str(e)) from e
            cur_sch = None          # keep-both-keys shape: fall back
            continue
        step = JoinStep(rds, lks, rks, how)
        if cur_sch is not None:
            step._in_schema_hint = cur_sch
        ds = step.apply_dataset(ds)
        if cur_sch is not None:
            try:
                from datavec_ray.schema import Schema as _DvSchema
                cur_sch = step.output_schema(_DvSchema(cur_sch)).arrow()
                _keep_hint(ds, cur_sch)
            except Exception:       # noqa: BLE001 — best-effort hint
                cur_sch = None
        for lk, rk in zip(lks, rks):
            if rk != lk:
                # the executed join coalesces the right key into the
                # left key column; on INNER joins they are equal by
                # definition, so references to the right key resolve
                # to the left key. (On LEFT joins the right key is
                # null on non-matches — coalescing would lie, so a
                # reference to it fails at eval with unknown column.)
                if how == "Inner":
                    keymap[rk] = lk
        if resid_expr is not None:     # Inner: residual ≡ post-filter
            ds = _keep_hint(ds.map_batches(
                _filter_fn(_rewrite_ast(resid_expr, keymap),
                           "sql_on_filter"),
                batch_format="pyarrow", zero_copy_batch=True), cur_sch)
    if keymap:
        q = _rewrite_cols(q, keymap)
    q, ds = _decorrelate_where(q, ds, tables, keymap)
    q = _bind_q_insub(q, tables)

    if q["where"] is not None:
        if _has_aggref(q["where"]):
            raise SqlError("aggregates are not allowed in WHERE")
        ds = _keep_hint(
            ds.map_batches(_filter_fn(q["where"], "sql_where"),
                           batch_format="pyarrow", zero_copy_batch=True),
            _static_schema(ds))

    agg_items = [(e, a) for kind, e, a in q["items"] if kind == "agg"]
    aggexprs = [(e, a) for kind, e, a in q["items"] if kind == "aggexpr"]
    plain = [(e, a) for kind, e, a in q["items"] if kind == "expr"]
    wins = [(e, a) for kind, e, a in q["items"] if kind == "win"]
    star = any(kind == "star" for kind, _, _ in q["items"])

    if q.get("qualify") is not None:
        if not wins:
            raise SqlError("QUALIFY needs window functions in the SELECT")
        if _has_aggref(q["qualify"]):
            raise SqlError("aggregates are not allowed in QUALIFY")
    if wins:
        if agg_items or aggexprs or q["group"]:
            raise SqlError(
                "window functions cannot mix with GROUP BY/aggregates")
        if q["having"] is not None:
            raise SqlError("HAVING cannot apply to a windowed SELECT "
                           "(use QUALIFY for window filters)")
        if star:
            raise SqlError("SELECT * cannot mix with window functions")
        ds = _windowed(ds, q, wins)
    elif agg_items or aggexprs or q["group"]:
        if star:
            raise SqlError("SELECT * cannot mix with GROUP BY/aggregates")
        ds = _grouped(ds, q, agg_items, aggexprs, plain)
    elif q["having"] is not None:
        raise SqlError("HAVING needs GROUP BY or aggregates")
    elif not star:
        names = [a for _, a in plain]
        exprs = [e for e, _ in plain]

        def project(t: pa.Table) -> pa.Table:
            cols = []
            for e in exprs:
                v = _eval(e, t)
                if isinstance(v, pa.Scalar):
                    v = pa.nulls(t.num_rows, v.type).fill_null(v)
                cols.append(v)
            return pa.table(dict(zip(names, cols)))
        project.__name__ = "sql_project"
        in_hint = _static_schema(ds)
        ds = ds.map_batches(project, batch_format="pyarrow",
                            zero_copy_batch=True)
        if in_hint is not None:
            try:
                # projection over a typed empty table yields the output
                # schema statically (scalars → nulls of their type)
                _keep_hint(ds, project(in_hint.empty_table()).schema)
            except Exception:       # noqa: BLE001 — best-effort hint
                pass

    if q["distinct"]:
        from datavec_ray.ops.setops import distinct_rows
        ds = distinct_rows(ds)
    if q["order"]:
        ds = _null_safe_sort(ds, q["order"])
    if q["limit"] is not None:
        ds = ds.limit(q["limit"])
    return ds


def _windowed(ds, q, wins):
    """Plan the window items of a SELECT onto ONE ``misc.window_rank``
    call (one hash-partition shuffle computes every window column), then
    project the declared select order."""
    from datavec_ray.misc import window_rank
    overs = {(tuple(p), tuple(o)) for (m, b, p, o, s), _ in wins}
    if len(overs) != 1:
        raise SqlError("all window functions in one SELECT must share "
                       "one OVER clause")
    _, _, part, order, _ = wins[0][0]
    methods = [m for (m, b, p, o, s), _ in wins]
    if not order and not all(isinstance(m, tuple) and m[0] == "wtotal"
                             for m in methods):
        raise SqlError("OVER needs ORDER BY (only partition-total "
                       "aggregates may omit it)")
    if order:
        order_col, descending = order[0]
    else:
        order_col, descending = None, False   # wtotal-only: any order
    tiebreak = []
    for c, d in order[1:]:
        if d:
            raise SqlError("only the first OVER ORDER BY key may be DESC")
        tiebreak.append(c)
    # positional functions need a deterministic TOTAL order (tiebreak
    # keys); value-tied rank functions take exactly one ORDER BY key
    _POSITIONAL = ("row_number", "ntile", "lag", "lead")
    specs, buckets = {}, None
    for (m, b, _, _, shift), a in wins:
        if isinstance(m, tuple):    # (wtotal|wrun|wrange[|wrows], ...)
            if m[0] in ("wrun", "wrows", "wspan") and len(order) < 2:
                raise SqlError("running/sliding ROWS frames need "
                               "tiebreak ORDER BY keys for a "
                               "deterministic frame")
            if m[0] == "wrange" and len(order) > 1:
                # peers are defined by the COMPOSITE order value in
                # SQL; the single-value run scan can't plan that
                raise SqlError("the default RANGE frame supports "
                               "exactly one OVER ORDER BY key")
            specs[a] = m
            continue
        if m in _POSITIONAL and len(order) < 2:
            raise SqlError(f"{m} needs tiebreak ORDER BY keys for a "
                           "deterministic total order")
        if m not in _POSITIONAL and len(order) > 1:
            # extra ORDER BY keys are positional tiebreaks; value-tied
            # functions rank the COMPOSITE value in SQL — planning that
            # onto a single-value run scan would silently disagree
            raise SqlError(f"{m} supports exactly one OVER ORDER BY key "
                           "(extra keys are positional tiebreaks)")
        if m in ("lag", "lead"):
            specs[a] = (m, shift[0], shift[1])
            continue
        specs[a] = m
        if m == "ntile":
            if buckets is not None and b != buckets:
                raise SqlError("multiple NTILE bucket counts in one query")
            buckets = b
    keys = list(part)
    if not keys:
        # partition-less OVER: a single global window — inherently one
        # sorter, same as any SQL engine's serial fallback
        def add_g(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__wg", pa.nulls(t.num_rows, pa.int8()).fill_null(0))
        add_g.__name__ = "sql_win_global"
        ds = ds.map_batches(add_g, batch_format="pyarrow",
                            zero_copy_batch=True)
        keys = ["__wg"]
    if order_col is None:          # wtotal-only: order-insensitive
        order_col = keys[0]
    ds = window_rank(ds, keys, order_col, descending=descending,
                     tiebreak=tiebreak or None, specs=specs,
                     ntile_buckets=buckets if buckets is not None else 4)
    if q.get("qualify") is not None:
        # pre-projection: input columns AND window aliases in scope
        ds = ds.map_batches(_filter_fn(q["qualify"], "sql_qualify"),
                            batch_format="pyarrow", zero_copy_batch=True)

    items = [(kind, e, a) for kind, e, a in q["items"] if kind != "star"]

    def final(t: pa.Table) -> pa.Table:
        cols = {}
        for kind, e, a in items:
            if kind == "win":
                cols[a] = t[a]
            else:
                v = _eval(e, t)
                if isinstance(v, pa.Scalar):
                    v = pa.nulls(t.num_rows, v.type).fill_null(v)
                cols[a] = v
        return pa.table(cols)
    final.__name__ = "sql_win_final"
    return ds.map_batches(final, batch_format="pyarrow",
                          zero_copy_batch=True)


def _cols_in(ast) -> set:
    """Column names referenced anywhere in an expression AST."""
    out: set = set()

    def walk(n):
        if isinstance(n, tuple):
            if len(n) == 2 and n[0] == "col" and isinstance(n[1], str):
                out.add(n[1])
            elif n and isinstance(n[0], str):
                for x in n[1:]:
                    walk(x)
            else:                      # untagged pair, e.g. CASE (cond, val)
                for x in n:
                    walk(x)
        elif isinstance(n, list):
            for x in n:
                walk(x)
    walk(ast)
    return out


def _grouped(ds, q, agg_items, aggexprs, plain):
    from datavec_ray.reduce import Reducer
    mode = q.get("group_mode", "plain")
    keyed_out_sch = None
    # GROUP BY items may be full expressions (date_trunc('day', ts));
    # each non-column expr becomes a hidden computed key column, and
    # every matching subtree in select items / HAVING references it
    gexpr_map: list = []
    group: list = []
    for gi in q["group"]:
        if isinstance(gi, str):
            group.append(gi)
        else:
            h = f"__gx{len(gexpr_map)}"
            gexpr_map.append((gi, h))
            group.append(h)

    def subst_g(ast):
        if not isinstance(ast, (tuple, list)) or not gexpr_map:
            return ast
        for gi, h in gexpr_map:
            if ast == gi:
                return ("col", h)
        if isinstance(ast, list):
            return [subst_g(x) for x in ast]
        return tuple(subst_g(x) for x in ast)

    if gexpr_map:
        plain = [(subst_g(e), a) for e, a in plain]
        aggexprs = [(subst_g(e), a) for e, a in aggexprs]
        agg_items = [((op, arg if arg == ("star",) else subst_g(arg),
                       d, subst_g(filt) if filt is not None else None), a)
                     for (op, arg, d, filt), a in agg_items]
    # non-agg select items under GROUP BY must be expressions over the
    # group keys only (evaluated post-aggregation on the grouped rows)
    for e, a in plain:
        if not _cols_in(e) <= set(group):
            raise SqlError(
                f"select item {a!r} is neither an aggregate nor an "
                "expression over GROUP BY keys")
    # intern every aggregate call — bare items keep their alias; aggs
    # embedded in expressions (aggexpr items, HAVING) get a hidden
    # reduce column, substituted into the expression as a col ref
    all_aggs = list(agg_items)

    def intern(spec) -> str:
        for s, a in all_aggs:
            if s == spec:
                return a
        a = f"__h{len(all_aggs)}"
        all_aggs.append((spec, a))
        return a

    def subst(ast):
        if isinstance(ast, tuple):
            if ast and ast[0] == "aggref":
                return ("col", intern(ast[1]))
            return tuple(subst(x) for x in ast)
        if isinstance(ast, list):
            return [subst(x) for x in ast]
        return ast

    aggexprs = [(subst(e), a) for e, a in aggexprs]
    having = subst(subst_g(q["having"])) if q["having"] is not None \
        else None
    # pre-compute computed group keys + aggregate input expressions
    pre, specs = [(h, gi) for gi, h in gexpr_map], []
    count_aliases = set()
    for idx, ((op, arg, distinct, filt), alias) in enumerate(all_aggs):
        if op in ("Count", "CountUnique"):
            count_aliases.add(alias)
        if filt is not None:
            # FILTER (WHERE c): null-mask the aggregate input — SQL
            # aggregates skip NULLs, so gating = CASE WHEN c THEN x END
            if distinct:
                raise SqlError("FILTER with DISTINCT is not supported")
            base = ("lit", 1) if arg == ("star",) else arg
            arg = ("case", [(filt, base)], ("lit", None))
        if distinct:
            if op != "Count":
                raise SqlError("DISTINCT only with COUNT")
            op = "CountUniqueExact"
        if arg == ("star",):
            col = "__star"
            pre.append((col, ("lit", 1)))
            op = "Sum" if op == "Count" else op      # COUNT(*) = Σ1
        elif op == "Count":
            # SQL COUNT(expr) counts NON-NULL values (the reference's
            # Count ReduceOp counts rows) → sum of the validity bitmap
            col = f"__agg{idx}"
            pre.append((col, ("valid_int", arg)))
            op = "Sum"
        elif arg[0] == "col":
            col = arg[1]
        else:
            col = f"__agg{idx}"
            pre.append((col, arg))
        specs.append([col, op, alias])

    keep = group + [c for c, _ in pre] + \
        [s[0] for s in specs if not s[0].startswith("__")]
    seen = set()
    keep = [c for c in keep if not (c in seen or seen.add(c))]
    synthetic = not group
    if synthetic:
        group = ["__g"]

    def prep(t: pa.Table) -> pa.Table:
        cols = {}
        for c in keep:
            cols[c] = _eval(("col", c), t) if c in t.column_names else None
        for c, e in pre:
            v = _eval(e, t)
            if isinstance(v, pa.Scalar):
                v = pa.nulls(t.num_rows, v.type).fill_null(v)
            cols[c] = v
        if synthetic:
            cols["__g"] = pa.nulls(t.num_rows, pa.int32()).fill_null(0)
        missing = [c for c, v in cols.items() if v is None]
        if missing:
            raise SqlError(f"unknown column(s) {missing}")
        if mode != "plain":
            # rollup_agg merges null keys with rolled-up NULLs — a data
            # NULL in a CUBE/ROLLUP key would silently fold into the
            # super-aggregate row, so refuse it outright
            for g in q["group"]:
                if cols[g].null_count:
                    raise SqlError(
                        f"CUBE/ROLLUP key {g!r} contains NULLs (they "
                        "would merge with the super-aggregate rows)")
        return pa.table(cols)
    prep.__name__ = "sql_agg_prep"
    # Ray cannot infer the schema of a constructed-table map over a
    # zero-row input (an all-filtering WHERE), so compute prep's output
    # schema statically by running it over a typed empty table and hand
    # it to the Reducer as a hint (also validates columns at plan time)
    hint = None
    base_sch = _static_schema(ds)
    if base_sch is None:
        in_sch = ds.schema(fetch_if_missing=True)
        base_sch = getattr(in_sch, "base_schema", in_sch)
    if isinstance(base_sch, pa.Schema):
        hint = prep(base_sch.empty_table()).schema
    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    mean_div = {}
    if mode == "plain":
        red = Reducer(group, specs)
        if hint is not None:
            red._in_schema_hint = hint
        ds = red.apply_dataset(ds)
        if synthetic and hint is not None:
            # global aggregate: SQL returns exactly ONE row even over
            # zero input rows (COUNT = 0, SUM/MIN/MAX/AVG = NULL). The
            # reduce of an empty input yields zero BLOCKS — no map
            # task would ever run to synthesize the identity row — so
            # union a tagged sentinel identity row and resolve LAZILY
            # in one task (the plan stays unexecuted until consumed)
            from datavec_ray.schema import Schema as _DvSchema
            import ray.data as rd
            out_sch = red.output_schema(_DvSchema(hint)).arrow()
            names = list(out_sch.names)
            cols = {}
            for f in out_sch:
                if f.name in count_aliases or f.name == "__g":
                    cols[f.name] = pa.array([0], f.type)
                else:
                    cols[f.name] = pa.nulls(1, f.type)
            sent = pa.table(cols).append_column(
                "__sent", pa.array([1], pa.int8()))

            def _tag_real(t: pa.Table) -> pa.Table:
                t = t.select(names)
                return t.append_column(
                    "__sent", pa.nulls(t.num_rows, pa.int8()).fill_null(0))
            _tag_real.__name__ = "sql_gagg_tag"

            def _resolve(t: pa.Table) -> pa.Table:
                real = t.filter(pc.equal(t["__sent"], 0))
                pick = real if real.num_rows else \
                    t.filter(pc.equal(t["__sent"], 1))
                return pick.drop_columns(["__sent"])
            _resolve.__name__ = "sql_gagg_resolve"
            ds = (ds.map_batches(_tag_real, batch_format="pyarrow",
                                 zero_copy_batch=True)
                  .union(rd.from_arrow(sent))
                  .repartition(1)
                  .map_batches(_resolve, batch_format="pyarrow"))
        elif hint is not None:
            # KEYED grouped reduce over a zero-row input: remember the
            # reduce output schema — the sentinel machinery at the end
            # of this function restores the declared schema of an
            # empty result (an empty groupby emits schema-less blocks
            # and Ray never runs map UDFs over 0-row blocks)
            from datavec_ray.schema import Schema as _DvSchema
            keyed_out_sch = red.output_schema(_DvSchema(hint)).arrow()
    else:
        from itertools import combinations

        from datavec_ray.misc import rollup_agg
        aggs = []
        for col, op, alias in specs:
            if op == "Mean":
                # AVG under grouping sets = exact Sum/Count pair,
                # divided once post-aggregation (matching SQL's
                # sum/count double division)
                aggs.append((col, "Sum", f"__s_{alias}"))
                aggs.append((col, "Count", f"__c_{alias}"))
                mean_div[alias] = (f"__s_{alias}", f"__c_{alias}")
            elif op in ("Sum", "Count", "Min", "Max"):
                aggs.append((col, op, alias))
            else:
                raise SqlError(
                    f"{op} is not supported with GROUP BY CUBE/ROLLUP")
        sets = None if mode == "rollup" else \
            [list(c) for r in range(len(group), -1, -1)
             for c in combinations(group, r)]
        ds = rollup_agg(ds, group, aggs, sets=sets)
        if mean_div:
            def div_means(t: pa.Table) -> pa.Table:
                for alias, (s, c) in mean_div.items():
                    t = t.append_column(
                        alias, pc.divide(pc.cast(t[s], pa.float64()),
                                         pc.cast(t[c], pa.float64())))
                return t.drop_columns(
                    [x for p in mean_div.values() for x in p])
            div_means.__name__ = "sql_cube_avg"
            ds = ds.map_batches(div_means, batch_format="pyarrow",
                                zero_copy_batch=True)
    if having is not None:
        ds = ds.map_batches(_filter_fn(having, "sql_having"),
                            batch_format="pyarrow", zero_copy_batch=True)
    # project the DECLARED select order: group-key expressions (under
    # their aliases — a join-key rewrite can make alias != physical
    # column), bare aggregates by alias, aggregate expressions over
    # hidden reduce columns; hidden columns are dropped here
    aggexpr_map = {a: e for e, a in aggexprs}
    plain_map = {a: e for e, a in plain}
    out_items = []
    for kind, e, a in q["items"]:
        if kind == "agg":
            out_items.append(("take", None, a))
        elif kind == "aggexpr":
            out_items.append(("eval", aggexpr_map[a], a))
        elif kind == "expr":
            out_items.append(("eval", plain_map[a], a))

    def final(t: pa.Table) -> pa.Table:
        cols = {}
        for how, e, alias in out_items:
            if how == "take":
                cols[alias] = t[alias]
            else:
                v = _eval(e, t)
                if isinstance(v, pa.Scalar):
                    v = pa.nulls(t.num_rows, v.type).fill_null(v)
                cols[alias] = v
        return pa.table(cols)
    final.__name__ = "sql_agg_final"
    ds = ds.map_batches(final, batch_format="pyarrow",
                        zero_copy_batch=True)
    if keyed_out_sch is not None:
        # restore the declared schema of an EMPTY keyed result: an
        # empty groupby emits schema-less 0-row blocks, Ray never runs
        # map UDFs over 0-row blocks (they pass through untyped), and
        # a 0-row batch DIES between fused UDFs — so union one tagged
        # sentinel row carrying the FINAL projected schema and drop it
        # in the LAST operator (a last-op 0-row output block survives
        # to the consumer; dataset_to_table prefers typed blocks)
        import ray.data as rd
        fin_sch = final(keyed_out_sch.empty_table()).schema
        sent = pa.table(
            {f.name: pa.nulls(1, f.type) for f in fin_sch}
        ).append_column("__sent", pa.array([1], pa.int8()))

        def _tag_fin(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__sent", pa.nulls(t.num_rows, pa.int8()).fill_null(0))
        _tag_fin.__name__ = "sql_kagg_tag"

        def _drop_fin(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["__sent"], 0)) \
                .drop_columns(["__sent"])
        _drop_fin.__name__ = "sql_kagg_drop"
        ds = (ds.map_batches(_tag_fin, batch_format="pyarrow",
                             zero_copy_batch=True)
              .union(rd.from_arrow(sent))
              .map_batches(_drop_fin, batch_format="pyarrow"))
        # the final projected schema is statically known — carry it so
        # a derived-table FROM over this aggregate never needs a probe
        _keep_hint(ds, fin_sch)
    return ds
