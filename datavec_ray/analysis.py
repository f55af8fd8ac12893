"""Dataset analysis & quality profiling. SURVEY.md §2.16.

Parity targets:
- ``AnalyzeSpark.analyze`` — ONE ``rdd.aggregate`` pass computing
  per-column min/max/mean/sampleStdev/sampleVariance/countZero/
  countPositive/countNegative/countTotal + (second pass) histograms with
  30 buckets by default (``datavec-spark/.../AnalyzeSpark.java:65-260``).
- ``AnalyzeSpark.analyzeQuality`` — per-column countValid/countInvalid/
  countMissing/countTotal vs schema metadata
  (``AnalyzeSpark.java:359+``, ``quality/columns/ColumnQuality.java:33-36``).
- ``SequenceLengthAnalysis`` — sequence-length stats
  (``analysis/sequence/SequenceLengthAnalysis.java:50``).

Ray-Data execution: one ``ds.aggregate`` with a composed AggregateFn per
column (same accept/combine monoid), histograms as a second map_batches
pass binned against the first pass's min/max.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.conditions import InvalidValueCondition
from datavec_ray.schema import Schema
from datavec_ray.steps.base import combine


def _numeric_state_zero():
    return {"n": 0, "nulls": 0, "zero": 0, "pos": 0, "neg": 0,
            "min": None, "max": None, "mean": 0.0, "M2": 0.0}


def _numeric_accumulate(state, col) -> dict:
    nulls = col.null_count
    arr = combine(col).drop_null()
    a = arr.to_numpy(zero_copy_only=False).astype(np.float64) if len(arr) else \
        np.empty(0)
    s = dict(state)
    s["nulls"] += nulls
    if len(a) == 0:
        return s
    bn, bmean = len(a), float(a.mean())
    bM2 = float(((a - bmean) ** 2).sum())
    n, mean, M2 = s["n"], s["mean"], s["M2"]
    tot = n + bn
    delta = bmean - mean
    s["mean"] = mean + delta * bn / tot
    s["M2"] = M2 + bM2 + delta * delta * n * bn / tot
    s["n"] = tot
    s["zero"] += int((a == 0).sum())
    s["pos"] += int((a > 0).sum())
    s["neg"] += int((a < 0).sum())
    bmn, bmx = float(a.min()), float(a.max())
    s["min"] = bmn if s["min"] is None else min(s["min"], bmn)
    s["max"] = bmx if s["max"] is None else max(s["max"], bmx)
    return s


def _numeric_merge(a, b) -> dict:
    out = dict(a)
    out["nulls"] = a["nulls"] + b["nulls"]
    out["zero"] = a["zero"] + b["zero"]
    out["pos"] = a["pos"] + b["pos"]
    out["neg"] = a["neg"] + b["neg"]
    for k, fn in (("min", min), ("max", max)):
        x, y = a[k], b[k]
        out[k] = y if x is None else (x if y is None else fn(x, y))
    na, nb = a["n"], b["n"]
    if na == 0:
        out.update(n=b["n"], mean=b["mean"], M2=b["M2"])
    elif nb == 0:
        out.update(n=a["n"], mean=a["mean"], M2=a["M2"])
    else:
        n = na + nb
        delta = b["mean"] - a["mean"]
        out["mean"] = a["mean"] + delta * nb / n
        out["M2"] = a["M2"] + b["M2"] + delta * delta * na * nb / n
        out["n"] = n
    return out


def _numeric_finalize(s) -> dict:
    n = s["n"]
    var = s["M2"] / (n - 1) if n > 1 else 0.0
    return {"count": n, "count_missing": s["nulls"], "count_zero": s["zero"],
            "count_positive": s["pos"], "count_negative": s["neg"],
            "min": s["min"], "max": s["max"],
            "mean": s["mean"] if n else None,
            "sample_stdev": float(np.sqrt(var)), "sample_variance": var}


def _string_state_zero():
    return {"n": 0, "nulls": 0, "empty": 0, "alpha": 0, "numeric": 0,
            "min_len": None, "max_len": None, "sum_len": 0}


def _string_accumulate(state, col) -> dict:
    s = dict(state)
    s["nulls"] += col.null_count
    arr = combine(col).drop_null()
    if len(arr) == 0:
        return s
    s["n"] += len(arr)
    lens = pc.utf8_length(arr)
    s["empty"] += int(pc.sum(pc.cast(pc.equal(arr, ""), pa.int64())).as_py() or 0)
    s["alpha"] += int(pc.sum(pc.cast(pc.match_substring_regex(arr, r"^[A-Za-z]+$"),
                                     pa.int64())).as_py() or 0)
    s["numeric"] += int(pc.sum(pc.cast(pc.match_substring_regex(arr, r"^\d+$"),
                                       pa.int64())).as_py() or 0)
    mn, mx = pc.min(lens).as_py(), pc.max(lens).as_py()
    s["min_len"] = mn if s["min_len"] is None else min(s["min_len"], mn)
    s["max_len"] = mx if s["max_len"] is None else max(s["max_len"], mx)
    s["sum_len"] += int(pc.sum(lens).as_py() or 0)
    return s


def _string_merge(a, b) -> dict:
    out = {k: a[k] + b[k] for k in ("n", "nulls", "empty", "alpha", "numeric",
                                    "sum_len")}
    for k, fn in (("min_len", min), ("max_len", max)):
        x, y = a[k], b[k]
        out[k] = y if x is None else (x if y is None else fn(x, y))
    return out


def _string_finalize(s) -> dict:
    return {"count": s["n"], "count_missing": s["nulls"],
            "count_empty": s["empty"], "count_alphabetic": s["alpha"],
            "count_numeric_string": s["numeric"], "min_length": s["min_len"],
            "max_length": s["max_len"],
            "mean_length": s["sum_len"] / s["n"] if s["n"] else None}


def analyze(ds_or_table, columns: Optional[Sequence[str]] = None) -> dict[str, dict]:
    """Per-column stats in one distributed aggregate pass."""
    if isinstance(ds_or_table, pa.Table):
        tbl = ds_or_table
        cols = list(columns) if columns else tbl.column_names
        out = {}
        for c in cols:
            typ = tbl[c].type
            if pa.types.is_floating(typ) or pa.types.is_integer(typ):
                st = _numeric_accumulate(_numeric_state_zero(), tbl[c])
                out[c] = _numeric_finalize(st)
            elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
                st = _string_accumulate(_string_state_zero(), tbl[c])
                out[c] = _string_finalize(st)
        return out

    from ray.data.aggregate import AggregateFn
    schema = ds_or_table.schema().base_schema
    cols = list(columns) if columns else schema.names
    aggs = []
    kinds = {}
    for c in cols:
        typ = schema.field(c).type
        if pa.types.is_floating(typ) or pa.types.is_integer(typ):
            kinds[c] = "num"
            aggs.append(AggregateFn(
                init=lambda k: _numeric_state_zero(),
                merge=_numeric_merge,
                accumulate_block=lambda st, blk, c=c: _numeric_accumulate(st, blk[c]),
                finalize=lambda st: st, name=c))
        elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
            kinds[c] = "str"
            aggs.append(AggregateFn(
                init=lambda k: _string_state_zero(),
                merge=_string_merge,
                accumulate_block=lambda st, blk, c=c: _string_accumulate(st, blk[c]),
                finalize=lambda st: st, name=c))
    if not aggs:
        return {}
    row = ds_or_table.aggregate(*aggs)
    return {c: (_numeric_finalize(row[c]) if kinds[c] == "num"
                else _string_finalize(row[c])) for c in kinds}


def histogram(ds_or_table, column: str, bins: int = 30,
              lo: Optional[float] = None, hi: Optional[float] = None):
    """Fixed-bucket histogram; min/max from analyze() if not given (the
    reference's 30-bucket default + second pass, AnalyzeSpark.java:120-145)."""
    if lo is None or hi is None:
        st = analyze(ds_or_table, [column])[column]
        lo, hi = st["min"], st["max"]
    edges = np.linspace(lo, hi, bins + 1)

    if isinstance(ds_or_table, pa.Table):
        a = combine(ds_or_table[column]).drop_null().to_numpy(zero_copy_only=False)
        counts, _ = np.histogram(a, bins=edges)
        return edges, counts

    def per_batch(batch: pa.Table) -> pa.Table:
        a = combine(batch[column]).drop_null().to_numpy(zero_copy_only=False)
        counts, _ = np.histogram(a, bins=edges)
        return pa.table({"bucket": pa.array(np.arange(bins, dtype=np.int64)),
                         "count": pa.array(counts.astype(np.int64))})

    agg = (ds_or_table.map_batches(per_batch, batch_format="pyarrow")
           .groupby("bucket").sum("count"))
    from datavec_ray.util import dataset_to_table
    tbl = dataset_to_table(agg).sort_by("bucket")
    counts = np.zeros(bins, dtype=np.int64)
    counts[tbl["bucket"].to_numpy(zero_copy_only=False)] = \
        tbl["sum(count)"].to_numpy(zero_copy_only=False)
    return edges, counts


def analyze_quality(ds_or_table, schema: Schema,
                    columns: Optional[Sequence[str]] = None) -> dict[str, dict]:
    """Per-column countValid/countInvalid/countMissing/countTotal vs the
    schema's ColumnMeta constraints (ColumnQuality.java:33-36)."""
    cols = list(columns) if columns else schema.names

    def quality_batch(batch: pa.Table) -> pa.Table:
        data = {"column": [], "total": [], "missing": [], "invalid": []}
        for c in cols:
            if c not in batch.column_names:
                continue
            meta = schema.meta_of(c).to_dict()
            invalid = InvalidValueCondition(c, meta).mask(batch)
            data["column"].append(c)
            data["total"].append(batch.num_rows)
            data["missing"].append(batch[c].null_count)
            data["invalid"].append(int(pc.sum(pc.cast(invalid, pa.int64())).as_py() or 0))
        return pa.table({k: pa.array(v) for k, v in data.items()})

    if isinstance(ds_or_table, pa.Table):
        tbl = quality_batch(ds_or_table)
    else:
        agg = (ds_or_table.map_batches(quality_batch, batch_format="pyarrow")
               .groupby("column").sum(["total", "missing", "invalid"]))
        from datavec_ray.util import dataset_to_table
        tbl = dataset_to_table(agg).rename_columns(
            ["column", "total", "missing", "invalid"])
    out = {}
    for i in range(tbl.num_rows):
        c = tbl["column"][i].as_py()
        total = tbl["total"][i].as_py()
        missing = tbl["missing"][i].as_py()
        invalid = tbl["invalid"][i].as_py()
        out[c] = {"count_total": total, "count_missing": missing,
                  "count_invalid": invalid - missing if invalid >= missing else invalid,
                  "count_valid": total - invalid}
    return out


def sequence_length_analysis(ds_or_table, key: str) -> dict:
    """Sequence-length min/max/mean/stdev (SequenceLengthAnalysis.java:50):
    groupby count → stats over the counts."""
    if isinstance(ds_or_table, pa.Table):
        counts = ds_or_table.group_by(key).aggregate([(key, "count")])
        a = counts[f"{key}_count"].to_numpy(zero_copy_only=False).astype(float)
    else:
        from datavec_ray.util import dataset_to_table
        counts = dataset_to_table(ds_or_table.groupby(key).count())
        a = counts["count()"].to_numpy(zero_copy_only=False).astype(float)
    return {"num_sequences": len(a), "min": float(a.min()) if len(a) else None,
            "max": float(a.max()) if len(a) else None,
            "mean": float(a.mean()) if len(a) else None,
            "stdev": float(a.std(ddof=1)) if len(a) > 1 else 0.0}


def analysis_to_html(stats: dict[str, dict], title: str = "Dataset analysis",
                     histograms: Optional[dict] = None) -> str:
    """Render analyze() output (+optional histograms) to a standalone HTML
    report — the reference's HtmlAnalysis (transform/ui/HtmlAnalysis.java:48)
    without the freemarker/plotting deps: plain tables + inline SVG bars."""
    rows = []
    for col, st in stats.items():
        cells = "".join(
            f"<tr><td>{k}</td><td>{v if not isinstance(v, float) else round(v, 6)}"
            f"</td></tr>" for k, v in st.items())
        svg = ""
        if histograms and col in histograms:
            edges, counts = histograms[col]
            mx = max(int(c) for c in counts) or 1
            bars = "".join(
                f'<rect x="{i * 12}" y="{60 - 60 * int(c) / mx}" width="10" '
                f'height="{60 * int(c) / mx}" fill="#4878a8"/>'
                for i, c in enumerate(counts))
            svg = (f'<svg width="{12 * len(counts)}" height="62">{bars}</svg>'
                   f'<div class="hint">range [{edges[0]:g}, {edges[-1]:g}], '
                   f'{len(counts)} buckets</div>')
        rows.append(f"<section><h2>{col}</h2>{svg}"
                    f"<table>{cells}</table></section>")
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{title}</title>"
        "<style>body{font-family:sans-serif;margin:2em}"
        "table{border-collapse:collapse}td{border:1px solid #ccc;"
        "padding:2px 8px}h2{margin-bottom:4px}.hint{color:#666;"
        "font-size:12px}</style></head><body>"
        f"<h1>{title}</h1>" + "".join(rows) + "</body></html>")


def write_analysis_html(ds_or_table, path: str,
                        columns: Optional[Sequence[str]] = None,
                        histogram_columns: Optional[Sequence[str]] = None,
                        bins: int = 30, title: str = "Dataset analysis") -> str:
    stats = analyze(ds_or_table, columns)
    hists = {}
    for c in (histogram_columns or []):
        hists[c] = histogram(ds_or_table, c, bins=bins)
    html = analysis_to_html(stats, title, hists)
    import os
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write(html)
    return path


def sequence_plot_html(table: pa.Table, key_col: str, order_col: str,
                       value_cols: Sequence[str],
                       title: str = "Sequence plot",
                       max_sequences: int = 10) -> str:
    """Render per-sequence line charts of numeric columns to standalone
    HTML — the reference's HtmlSequencePlotting
    (``transform/ui/HtmlSequencePlotting.java:51``) without the
    freemarker/plotting deps: one inline-SVG polyline chart per
    (sequence, column). ``table`` is a flat table; sequences are rows
    sharing ``key_col``, ordered by ``order_col``. At most
    ``max_sequences`` sequences are plotted (reports are for eyeballs,
    not bulk data)."""
    import html as _html

    import numpy as np
    import pyarrow.compute as pc

    table = table.sort_by([(key_col, "ascending"), (order_col, "ascending")])
    keys = table[key_col].to_pylist()
    uniq_keys = list(dict.fromkeys(keys))[:max_sequences]
    charts = []
    W, H, PAD = 420, 120, 8
    for k in uniq_keys:
        sub = table.filter(pc.equal(table[key_col], k))
        for col in value_cols:
            y = np.asarray(sub[col].to_pylist(), dtype=np.float64)
            y = y[~np.isnan(y)] if np.isnan(y).any() else y
            if len(y) == 0:
                continue
            lo, hi = float(y.min()), float(y.max())
            span = (hi - lo) or 1.0
            xs = np.linspace(PAD, W - PAD, len(y))
            ys = H - PAD - (y - lo) / span * (H - 2 * PAD)
            pts = " ".join(f"{x:.1f},{v:.1f}" for x, v in zip(xs, ys))
            charts.append(
                f"<div class='chart'><h3>{_html.escape(str(k))} · "
                f"{_html.escape(col)}</h3>"
                f"<svg width='{W}' height='{H}' viewBox='0 0 {W} {H}'>"
                f"<rect width='{W}' height='{H}' fill='#fafafa' "
                f"stroke='#ddd'/>"
                f"<polyline fill='none' stroke='#3366cc' stroke-width='1.5' "
                f"points='{pts}'/>"
                f"<text x='{PAD}' y='{PAD + 4}' font-size='9'>"
                f"max {round(hi, 4)}</text>"
                f"<text x='{PAD}' y='{H - 2}' font-size='9'>"
                f"min {round(lo, 4)}</text></svg></div>")
    return (f"<!DOCTYPE html><html><head><meta charset='utf-8'>"
            f"<title>{_html.escape(title)}</title>"
            f"<style>body{{font-family:sans-serif}}"
            f".chart{{display:inline-block;margin:6px}}"
            f"h3{{font-size:12px;margin:2px}}</style></head>"
            f"<body><h1>{_html.escape(title)}</h1>"
            f"{''.join(charts)}</body></html>")


def write_sequence_plot_html(table: pa.Table, path: str, key_col: str,
                             order_col: str, value_cols: Sequence[str],
                             title: str = "Sequence plot",
                             max_sequences: int = 10) -> str:
    html = sequence_plot_html(table, key_col, order_col, value_cols,
                              title, max_sequences)
    import os
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write(html)
    return path


def approx_quantile(ds_or_table, column: str,
                    qs: Sequence[float], bins: int = 8192) -> dict[str, float]:
    """Approximate global quantiles from the two-pass fixed-bucket
    histogram (exact min/max pass, then one ``bins``-bucket count pass
    with map-side combining — both are small-shuffle aggregates, so this
    works on columns far too large for ``grouped_quantile``'s
    sort-in-worker path). Linear interpolation inside the landing
    bucket bounds the error by one bucket width: (max-min)/bins — with
    the default 8192 buckets, under 0.013% of the value range.
    Deterministic (no sampling). Returns {"p50": v, ...} keyed like
    ``grouped_quantile``."""
    qs = list(qs)
    edges, counts = histogram(ds_or_table, column, bins=bins)
    total = int(counts.sum())
    out: dict[str, float] = {}
    cum = np.concatenate([[0], np.cumsum(counts)])
    for q in qs:
        name = f"p{int(round(q * 100))}"
        if total == 0:
            out[name] = float("nan")
            continue
        target = q * total
        b = int(np.searchsorted(cum, target, side="left"))
        b = max(1, min(b, bins))
        in_bucket = counts[b - 1]
        frac = ((target - cum[b - 1]) / in_bucket) if in_bucket else 0.0
        lo, hi = edges[b - 1], edges[b]
        out[name] = float(lo + frac * (hi - lo))
    return out
