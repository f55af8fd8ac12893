"""Two-pass normalizers. SURVEY.md §2.3 / §2.16.

Parity targets: ``doubletransform/MinMaxNormalizer.java:34`` (to [0,1] or
[newMin,newMax]), ``StandardizeNormalizer.java:29`` ((x-μ)/σ),
``SubtractMeanNormalizer.java:26``, ``Log2Normalizer.java:32``
(log2((x-min)/(mean-min) + 1) · scale), dispatched by the Normalize enum
(``transform/TransformProcess.java:1039-1083``); Spark-side stats come
from one aggregate pass (``datavec-spark/.../Normalization.java:23-401``).

Usage: ``step = fit_normalizer(ds_or_table, "MinMax", column)`` — the
stats pass is ONE ``ds.aggregate`` (min/max/mean/std computed together);
the returned step is stateless and fuses with its neighbors.
"""

from __future__ import annotations

from typing import Any, Optional

import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.registry import register
from datavec_ray.schema import Schema
from datavec_ray.steps.base import Step, combine, set_column

NORMALIZE_MODES = ("MinMax", "MinMax2", "Standardize", "SubtractMean", "Log2Mean")


@register("step")
class Normalize(Step):
    """Stateless normalizer with fitted stats baked in (serializable)."""

    def __init__(self, column: str, mode: str, stats: dict[str, float],
                 new_min: float = 0.0, new_max: float = 1.0):
        if mode not in NORMALIZE_MODES:
            raise ValueError(f"unknown normalize mode {mode!r}")
        self.column, self.mode, self.stats = column, mode, dict(stats)
        self.new_min, self.new_max = new_min, new_max

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema.with_type(self.column, pa.float64())

    def apply(self, table: pa.Table) -> pa.Table:
        col = pc.cast(table[self.column], pa.float64())
        s = self.stats
        if self.mode in ("MinMax", "MinMax2"):
            lo, hi = s["min"], s["max"]
            rng = (hi - lo) or 1.0
            scaled = pc.divide(pc.subtract(col, lo), rng)
            if self.mode == "MinMax2" or (self.new_min, self.new_max) != (0.0, 1.0):
                scaled = pc.add(pc.multiply(scaled, self.new_max - self.new_min),
                                self.new_min)
            out = scaled
        elif self.mode == "Standardize":
            std = s["std"] or 1.0
            out = pc.divide(pc.subtract(col, s["mean"]), std)
        elif self.mode == "SubtractMean":
            out = pc.subtract(col, s["mean"])
        else:  # Log2Mean: log2((x - min)/(mean - min) + 1) * scale
            denom = (s["mean"] - s["min"]) or 1.0
            ratio = pc.add(pc.divide(pc.subtract(col, s["min"]), denom), 1.0)
            out = pc.divide(pc.ln(ratio), 0.6931471805599453)
        return set_column(table, self.column, combine(out))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "Normalize", "column": self.column, "mode": self.mode,
                "stats": self.stats, "new_min": self.new_min,
                "new_max": self.new_max}


def column_stats(ds_or_table, column: str) -> dict[str, float]:
    """One pass: min/max/mean/std (sample) of a column."""
    if isinstance(ds_or_table, pa.Table):
        col = ds_or_table[column]
        n = len(col) - col.null_count
        mean = pc.mean(col).as_py()
        std = pc.stddev(col, ddof=1).as_py() if n > 1 else 0.0
        return {"min": pc.min(col).as_py(), "max": pc.max(col).as_py(),
                "mean": mean, "std": std or 0.0}
    from ray.data.aggregate import Max, Mean, Min, Std
    row = ds_or_table.aggregate(Min(column), Max(column), Mean(column),
                                Std(column, ddof=1))
    return {"min": row[f"min({column})"], "max": row[f"max({column})"],
            "mean": row[f"mean({column})"], "std": row[f"std({column})"] or 0.0}


def fit_normalizer(ds_or_table, mode: str, column: str,
                   new_min: float = 0.0, new_max: float = 1.0) -> Normalize:
    return Normalize(column, mode, column_stats(ds_or_table, column),
                     new_min, new_max)


def fit_normalizers(ds_or_table, mode: str, columns,
                    new_min: float = 0.0, new_max: float = 1.0) -> list:
    """Fit one normalizer per column with a SINGLE stats pass over the
    dataset (the reference's Normalization computes all column stats in
    one df.agg; N separate passes would read the data N times)."""
    columns = list(columns)
    if isinstance(ds_or_table, pa.Table):
        return [fit_normalizer(ds_or_table, mode, c, new_min, new_max)
                for c in columns]
    from ray.data.aggregate import Max, Mean, Min, Std
    aggs = []
    for c in columns:
        aggs += [Min(c), Max(c), Mean(c), Std(c, ddof=1)]
    row = ds_or_table.aggregate(*aggs)
    out = []
    for c in columns:
        stats = {"min": row[f"min({c})"], "max": row[f"max({c})"],
                 "mean": row[f"mean({c})"], "std": row[f"std({c})"] or 0.0}
        out.append(Normalize(c, mode, stats, new_min, new_max))
    return out


def group_normalize(ds, keys, columns, mode: str = "Standardize",
                    suffix: str = "_norm"):
    """Within-group normalization — SQL
    ``(v - avg(v) OVER (PARTITION BY keys)) / stddev_samp(v) OVER ...``
    (``Standardize``), or min-max to [0,1] (``MinMax``), or mean
    subtraction (``SubtractMean``), or the outlier-insensitive robust
    scaler ``(v - median) / (q75 - q25)`` (``Robust``; SQL
    ``quantile_cont`` stats). Appends ``{col}{suffix}`` float64
    columns; groups where the statistic is undefined (single row, or
    zero range/IQR) yield NULL, matching SQL division-by-NULL.

    Scale shape: ONE small ``groupby().aggregate`` shuffle computes the
    per-group stats (combiner-backed builtin aggs), the stats table is
    broadcast once via ``ray.put``, and the transform itself is a
    stateless per-batch join + vectorized arithmetic — the input is
    never shuffled."""
    import numpy as np
    import ray

    if mode not in ("Standardize", "MinMax", "SubtractMean", "Robust"):
        raise ValueError(f"unsupported group_normalize mode {mode!r}")
    from ray.data.aggregate import Max, Mean, Min, Std
    keys, columns = list(keys), list(columns)
    if mode == "Robust":
        # exact per-group quantile stats (grouped_quantile ==
        # quantile_cont), one partial-row shuffle per column, joined
        # into one groups-sized stats table
        from datavec_ray.misc import grouped_quantile
        from datavec_ray.util import dataset_to_table
        stats_tbl = None
        for c in columns:
            q = dataset_to_table(grouped_quantile(
                ds, keys, c, [0.5, 0.25, 0.75],
                [f"med({c})", f"q25({c})", f"q75({c})"],
                interpolation="linear"))
            stats_tbl = q if stats_tbl is None else \
                stats_tbl.join(q, keys=keys, join_type="inner")
    else:
        aggs = []
        for c in columns:
            if mode == "Standardize":
                aggs += [Mean(c), Std(c, ddof=1)]
            elif mode == "MinMax":
                aggs += [Min(c), Max(c)]
            else:
                aggs += [Mean(c)]
        stats = ds.groupby(keys).aggregate(*aggs)
        stats_tbl = stats.to_arrow() if isinstance(stats, pa.Table) else None
        if stats_tbl is None:
            from datavec_ray.util import dataset_to_table
            stats_tbl = dataset_to_table(stats)
    ref = ray.put(stats_tbl)

    class _Apply:
        def __init__(self):
            self.stats = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            # join may reorder rows within the batch (row identity, not
            # order, is the contract here — same as any shuffle stage)
            j = batch.join(self.stats, keys=keys, join_type="left outer")
            for c in columns:
                v = pc.cast(j[c], pa.float64())
                if mode == "Standardize":
                    mu, sd = j[f"mean({c})"], j[f"std({c})"]
                    sd = pc.if_else(pc.equal(sd, 0.0),
                                    pa.scalar(None, pa.float64()), sd)
                    out = pc.divide(pc.subtract(v, mu), sd)
                elif mode == "MinMax":
                    lo, hi = j[f"min({c})"], j[f"max({c})"]
                    rng = pc.subtract(pc.cast(hi, pa.float64()),
                                      pc.cast(lo, pa.float64()))
                    rng = pc.if_else(pc.equal(rng, 0.0),
                                     pa.scalar(None, pa.float64()), rng)
                    out = pc.divide(pc.subtract(v, pc.cast(lo, pa.float64())),
                                    rng)
                elif mode == "Robust":
                    med = j[f"med({c})"]
                    iqr = pc.subtract(j[f"q75({c})"], j[f"q25({c})"])
                    iqr = pc.if_else(pc.equal(iqr, 0.0),
                                     pa.scalar(None, pa.float64()), iqr)
                    out = pc.divide(pc.subtract(v, med), iqr)
                else:
                    out = pc.subtract(v, j[f"mean({c})"])
                j = j.append_column(pa.field(c + suffix, pa.float64()),
                                    combine(out))
            drop = [n for n in j.column_names
                    if n.startswith(("mean(", "std(", "min(", "max(",
                                     "med(", "q25(", "q75("))]
            return j.drop_columns(drop)

    return ds.map_batches(_Apply, batch_format="pyarrow",
                          concurrency=(1, 8))
