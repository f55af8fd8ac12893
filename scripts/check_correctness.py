"""Mimic the driver's correctness gate: run every queries() entry at
sf0.01 and compare to oracle_sql() via DuckDB — row count, schema
(column names), and order-insensitive value comparison (floats rounded).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame, round_floats: bool = True) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    sort_keys = {}
    for c in df.columns:
        if df[c].dtype.kind == "O" and len(df) and all(
                isinstance(v, (pd.Timestamp, __import__("datetime").date))
                or v is None for v in df[c].head(50)):
            # parquet-roundtripped DATE/TIMESTAMP columns come back as
            # object dtype — coerce to datetime64 so both sides compare
            # on the same representation
            df[c] = pd.to_datetime(df[c])
        if df[c].dtype.kind == "f":
            sort_keys[c] = df[c].round(6)
            if round_floats:
                df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            # canonical unit first: a parquet-roundtripped side may be
            # ns where the other is us — raw int64 views would differ
            # by 1000x
            df[c] = df[c].astype("datetime64[ns]").astype("int64")
    # sort rows by the ROUNDED float keys (+ raw others) so both sides
    # order identically even when raw floats differ at the last ulp
    key_df = df.copy()
    for c, k in sort_keys.items():
        key_df[c] = k
    order = key_df.sort_values(list(key_df.columns)).index
    return df.loc[order].reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> dict:
    res = {"query": name, "ray_rows": len(ray_df), "sql_rows": len(sql_df)}
    res["rows_match"] = len(ray_df) == len(sql_df)
    res["cols_match"] = sorted(ray_df.columns) == sorted(sql_df.columns)
    if not (res["rows_match"] and res["cols_match"]):
        res["values_match"] = False
        res["exact_match"] = False
        return res
    a, b = normalize(ray_df), normalize(sql_df)
    try:
        ok = True
        for c in a.columns:
            if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
                ok &= np.allclose(a[c].astype(float), b[c].astype(float),
                                  rtol=1e-6, atol=1e-6, equal_nan=True)
            else:
                av = a[c].fillna("\0null").astype(str).values
                bv = b[c].fillna("\0null").astype(str).values
                ok &= (av == bv).all()
        res["values_match"] = bool(ok)
    except Exception as e:  # noqa: BLE001
        res["values_match"] = False
        res["error"] = str(e)
    # STRICT mirror of the driver's value-hash (calibrated against
    # CORRECTNESS_r02: the driver ROUNDS floats before hashing — rows
    # with last-ulp float diffs were hash-green — but is DTYPE
    # sensitive: rows whose only diff was int64 vs float64, e.g. an
    # uncast DuckDB hugeint sum, were hash-red). So: dtype kinds must
    # match exactly; floats compared after round(6); everything else
    # compared exactly.
    try:
        a = normalize(ray_df, round_floats=True)
        b = normalize(sql_df, round_floats=True)
        bad_cols = []
        for c in a.columns:
            if a[c].dtype.kind != b[c].dtype.kind:
                bad_cols.append(f"{c}:dtype {a[c].dtype}!={b[c].dtype}")
                continue
            av, bv = a[c].values, b[c].values
            if a[c].dtype.kind == "f":
                eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
                if not eq.all():
                    # distinguish real value bugs from accumulation-
                    # order ULP noise: a sum of ~1e9-magnitude doubles
                    # carries ~1e-12 relative error on EITHER engine,
                    # which crosses the absolute round(6) boundary at
                    # big SF — annotate, don't fail
                    d = np.abs(av - bv)
                    rel = d / np.maximum(np.abs(bv), 1.0)
                    # NaN on one side only is a REAL mismatch (wrong
                    # NULL), never ulp noise — force failure
                    rel = np.where(pd.isna(av) != pd.isna(bv),
                                   np.inf, rel)
                    if np.nanmax(rel) < 1e-9:
                        res.setdefault("float_ulp_cols", []).append(c)
                        continue
            else:
                eq = (a[c].fillna("\0null").astype(str).values
                      == b[c].fillna("\0null").astype(str).values)
            if not eq.all():
                bad_cols.append(f"{c}:values")
        res["exact_match"] = not bad_cols
        if bad_cols:
            res["exact_bad_cols"] = bad_cols
    except Exception as e:  # noqa: BLE001
        res["exact_match"] = False
        res["error_exact"] = str(e)
    return res


def run_oracle_subprocess(sql: str, sf_dir: str, timeout: float):
    """Evaluate one DuckDB oracle in a forked child with a hard time
    budget (some oracles are intentionally quadratic — brute-force
    levenshtein / exact cosine cross joins — and at 10x data their
    cost is a DuckDB artifact, not an engine property). Returns the
    DataFrame, or None on timeout."""
    import multiprocessing as mp
    import tempfile

    fd, out_path = tempfile.mkstemp(suffix=".parquet", prefix="oracle_")
    os.close(fd)  # DuckDB's COPY overwrites the placeholder in the child

    def child():
        code = 0
        try:
            con2 = duckdb.connect()
            for t in ("region nation customer supplier part orders lineitem "
                      "events documents embeddings").split():
                con2.sql(f"create view {t} as select * from "
                         f"read_parquet('{sf_dir}/{t}.parquet')")
            con2.sql(f"copy ({sql}) to '{out_path}' (format parquet)")
        except BaseException:
            code = 1
        finally:
            # the fork inherits the parent's Ray driver state — skip
            # Python/Ray atexit teardown entirely
            os._exit(code)

    p = mp.get_context("fork").Process(target=child)
    p.start()
    p.join(timeout)
    if p.is_alive():
        p.terminate()
        p.join(5)
        if os.path.exists(out_path):
            os.remove(out_path)
        return None
    if p.exitcode != 0 or not os.path.exists(out_path):
        raise RuntimeError(f"oracle subprocess exit {p.exitcode}")
    df = pd.read_parquet(out_path)
    os.remove(out_path)
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) \
        else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if not os.path.isdir(a)]
    oracle_timeout = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0"))

    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("GRAFT_CHECK_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod
    from datavec_ray.util import table_from_result

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"create view {t} as select * from "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_res = table_from_result(fn(sf_dir)).to_pandas()
        except Exception as e:  # noqa: BLE001
            results.append({"query": name, "error": f"ray: {e}"})
            print(f"{name}: RAY ERROR {e}")
            continue
        ray_sec = round(time.time() - t0, 2)
        if name not in oracles:
            results.append({"query": name, "ray_rows": len(ray_res),
                            "rows_only": True, "ray_sec": ray_sec})
            print(f"{name}: rows-only ({len(ray_res)} rows) "
                  f"[ray {ray_sec}s]")
            continue
        t_or = time.time()
        try:
            if oracle_timeout > 0:
                sql_res = run_oracle_subprocess(oracles[name], sf_dir,
                                                oracle_timeout)
                if sql_res is None:
                    results.append({"query": name, "ray_rows": len(ray_res),
                                    "oracle_timeout": True,
                                    "ray_sec": ray_sec})
                    print(f"{name}: ORACLE TIMEOUT (>{oracle_timeout}s "
                          f"DuckDB-side; ray={len(ray_res)} rows in "
                          f"{ray_sec}s)")
                    continue
            else:
                sql_res = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            results.append({"query": name, "error": f"sql: {e}"})
            print(f"{name}: SQL ERROR {e}")
            continue
        r = compare(name, ray_res, sql_res)
        r["sec"] = round(time.time() - t0, 2)
        r["ray_sec"] = ray_sec
        r["oracle_sec"] = round(time.time() - t_or, 2)
        results.append(r)
        if r.get("values_match") and r.get("exact_match"):
            status = "OK"
            if r.get("float_ulp_cols"):
                status += f" (ulp-tol: {r['float_ulp_cols']})"
        elif r.get("values_match"):
            status = f"INEXACT {r.get('exact_bad_cols')}"
        else:
            status = "MISMATCH"
        print(f"{name}: {status} rows={r['ray_rows']}/{r['sql_rows']} "
              f"cols={r['cols_match']} [ray {ray_sec}s / oracle "
              f"{r['oracle_sec']}s]")
    bad = [r for r in results
           if not (r.get("values_match", True) and r.get("exact_match", True))
           or "error" in r]
    print(f"\n{len(results) - len(bad)}/{len(results)} pass")
    with open("/tmp/correctness_check.json", "w") as f:
        json.dump(results, f, indent=2)
    ray.shutdown()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
