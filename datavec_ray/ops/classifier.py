"""Distributed hashed-feature logistic regression — the fastText-class
quality classifier used by CCNet/LLaMA-style curation (train a small
linear model on "good vs bad" documents, score the corpus, keep the
top band). No reference counterpart (DataVec stops at featurization);
provided because model-based quality scoring is a standard stage of a
100 TB curation run and everything it needs is already here
(`hashing_vectorize` features, combiner-style partial aggregation).

Scale shape (the same vertex-state-fits / corpus-streams regime as
PageRank and k-means):
- features are vocabulary-free hashed unigrams (`hashing_vectorize`) —
  no vocab fit, no shuffle, `dim` buckets;
- training is FULL-BATCH gradient descent with a fixed epoch count:
  each epoch is ONE pass over the corpus where every batch emits a
  SPARSE gradient partial — only the buckets it touched — against the
  broadcast weight vector (ray.put once per epoch), summed by the
  map-side-combiner grouped reduce (shuffle volume ~ distinct buckets
  touched, never dim × blocks); the driver applies the update.
  Deterministic up to float summation order (gradients are a sum —
  order-independent modulo last-ulp), unlike SGD;
- scoring is one shuffle-free map with the broadcast weights.

Weights are (dim + 1,) float64 (last slot = bias): 2 MB at the default
dim — broadcastable to any cluster size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from datavec_ray.ops.textstats import hashing_vectorize
from datavec_ray.steps.base import combine


def _batch_features(batch: pa.Table, text_col: str, dim: int, seed: int):
    """Sparse per-row hashed counts: (row_idx, bucket, weight) arrays
    over the batch (unsigned counts — logistic regression wants
    magnitudes; the sign trick is for inner-product sketches)."""
    t = pa.table({"__row": pa.array(np.arange(batch.num_rows,
                                              dtype=np.int64)),
                  text_col: batch[text_col]})
    sp = hashing_vectorize(t, text_col=text_col, id_col="__row",
                           dim=dim, seed=seed, signed=False)
    return (sp["__row"].to_numpy(zero_copy_only=False),
            sp["bucket"].to_numpy(zero_copy_only=False),
            sp["weight"].to_numpy(zero_copy_only=False))


def _scores(rows, buckets, weights, w, n_rows):
    """Per-row linear scores z = Σ w[bucket]·weight + bias, vectorized
    via one bincount over row ids."""
    contrib = w[buckets] * weights
    z = np.bincount(rows, weights=contrib, minlength=n_rows)
    return z + w[-1]


def train_logreg_hashed(ds, text_col: str = "text",
                        label_col: str = "label", dim: int = 1 << 18,
                        epochs: int = 20, lr: float = 0.5,
                        l2: float = 1e-6, seed: int = 0) -> dict:
    """Train on a labeled Dataset (text_col, label_col ∈ {0,1}).
    Returns {"w": (dim+1,) float64, "dim", "seed", "losses": [...]}.
    """
    import ray

    w = np.zeros(dim + 1)
    losses = []

    def grad_partial(batch: pa.Table, *, ref):
        wb = ray.get(ref)
        n = batch.num_rows
        y = combine(batch[label_col]).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        rows, buckets, vals = _batch_features(batch, text_col, dim, seed)
        z = _scores(rows, buckets, vals, wb, n)
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y                      # dL/dz per row
        # SPARSE gradient partial: only the buckets this batch touched
        # leave the task (shuffle volume ~ nnz, never ~ dim x blocks);
        # bias / loss / n ride along as sentinel buckets dim, dim+1,
        # dim+2
        ub, inv = np.unique(buckets, return_inverse=True)
        gv = np.bincount(inv, weights=vals * err[rows],
                         minlength=len(ub))
        loss = np.sum(np.maximum(z, 0) - z * y + np.log1p(np.exp(-np.abs(z))))
        b_out = np.concatenate([ub, [dim, dim + 1, dim + 2]])
        g_out = np.concatenate([gv, [err.sum(), loss, float(n)]])
        return pa.table({"bucket": pa.array(b_out, pa.int64()),
                         "g": pa.array(g_out, pa.float64())})

    from datavec_ray.reduce import Reducer
    from datavec_ray.util import dataset_to_table

    for _ in range(epochs):
        ref = ray.put(w)
        part = ds.map_batches(grad_partial, batch_format="pyarrow",
                              fn_kwargs={"ref": ref})
        tbl = dataset_to_table(
            Reducer(["bucket"], [["g", "Sum", "g"]]).apply_dataset(part))
        b = tbl["bucket"].to_numpy(zero_copy_only=False)
        gs = tbl["g"].to_numpy(zero_copy_only=False)
        g = np.zeros(dim + 1)
        feat = b < dim
        g[b[feat]] = gs[feat]
        g[-1] = gs[b == dim].sum()
        loss = gs[b == dim + 1].sum()
        n = max(gs[b == dim + 2].sum(), 1.0)
        w = w - lr * (g / n + l2 * np.append(w[:-1], 0.0))
        losses.append(loss / n)

    return {"w": w, "dim": dim, "seed": seed, "losses": losses}


def score_logreg_hashed(ds, model: dict, text_col: str = "text",
                        out_col: str = "quality_score"):
    """Score a corpus with a trained model: one shuffle-free pass,
    broadcast weights, appends ``out_col`` = P(label=1)."""
    import ray

    ref = ray.put(model["w"])
    dim, seed = model["dim"], model["seed"]

    def score(batch: pa.Table, *, ref=ref):
        wb = ray.get(ref)
        rows, buckets, vals = _batch_features(batch, text_col, dim, seed)
        z = _scores(rows, buckets, vals, wb, batch.num_rows)
        p = 1.0 / (1.0 + np.exp(-z))
        return batch.append_column(pa.field(out_col, pa.float64()),
                                   pa.array(p, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")
