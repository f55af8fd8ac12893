"""Generate a deterministic 10x (sf1-equivalent) copy of the driver's
sf0.1 test tables under /tmp/graft_sf1 (round-4 verdict ask #5 — the
driver only ships sf0.001/0.01/0.1; the scale-step harness needs one
decade more).

Table strategies (all seeded, no external data):

- TPC-H star tables (customer/orders/lineitem/supplier/part): K=10
  key-shifted copies — every foreign key shifts by the same stride as
  its dimension, so join fan-outs, group cardinalities per key, and
  value distributions are EXACTLY the sf0.1 ones at 10x the rows.
  nation/region stay fixed (true dimensions).
- events: key-shifted copies (event_id stride keeps lsn dense and
  monotonic per copy, user_id stride scales the conversation count) —
  the CDC binlog derived from it keeps its update/delete mix.
- documents: fresh corpus sampled from the sf0.1 vocabulary at its
  empirical word frequencies and document-length distribution
  (replicating texts verbatim would plant 10x near-duplicate groups
  and collapse the dedup workloads); exact-dup and near-dup pairs are
  planted at the sf0.1 empirical rates.
- embeddings: per-label diagonal-Gaussian fit on sf0.1, sampled at
  10x with the empirical label mix — preserves the cluster structure
  k-means / IVF queries rely on.

    python scripts/make_scaled_tables.py [src_dir] [out_dir] [K]
"""

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10


def shifted_copies(t: pa.Table, strides: dict) -> pa.Table:
    """K copies of ``t``; each named int column shifts by k * stride."""
    parts = []
    for k in range(K):
        cols = {}
        for name in t.column_names:
            col = t[name]
            if name in strides and k:
                col = pc.add(col, pa.scalar(k * strides[name],
                                            pa.int64())).cast(col.type)
            cols[name] = col
        parts.append(pa.table(cols))
    return pa.concat_tables(parts)


def rekey_names(t: pa.Table, key: str, col: str, prefix: str) -> pa.Table:
    """Regenerate a key-derived name column ('Customer#%09d') from the
    SHIFTED key — replicating names verbatim would multiply every
    fuzzy-duplicate group by K^2 (a pathological density no real 10x
    corpus has; the sf0.1 names are exactly this function of the key)."""
    names = pc.binary_join_element_wise(
        prefix, pc.utf8_lpad(pc.cast(t[key], pa.string()), 9, "0"), "")
    return t.set_column(t.schema.get_field_index(col),
                        pa.field(col, pa.string()), names)


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(20260820)
    rd = {t: pq.read_table(os.path.join(SRC, f"{t}.parquet"))
          for t in ("region nation customer supplier part orders "
                    "lineitem events documents embeddings").split()}
    stride = {t: int(pc.max(rd[t][c]).as_py()) + 1 for t, c in
              (("customer", "c_custkey"), ("supplier", "s_suppkey"),
               ("part", "p_partkey"), ("orders", "o_orderkey"))}
    ev_stride = int(pc.max(rd["events"]["event_id"]).as_py()) + 1
    user_stride = int(pc.max(rd["events"]["user_id"]).as_py()) + 1

    out = {
        "region": rd["region"],
        "nation": rd["nation"],
        "customer": rekey_names(
            shifted_copies(rd["customer"],
                           {"c_custkey": stride["customer"]}),
            "c_custkey", "c_name", "Customer#"),
        "supplier": rekey_names(
            shifted_copies(rd["supplier"],
                           {"s_suppkey": stride["supplier"]}),
            "s_suppkey", "s_name", "Supplier#"),
        "part": shifted_copies(rd["part"], {"p_partkey": stride["part"]}),
        "orders": shifted_copies(rd["orders"],
                                 {"o_orderkey": stride["orders"],
                                  "o_custkey": stride["customer"]}),
        "lineitem": shifted_copies(rd["lineitem"],
                                   {"l_orderkey": stride["orders"],
                                    "l_partkey": stride["part"],
                                    "l_suppkey": stride["supplier"]}),
        "events": shifted_copies(rd["events"],
                                 {"event_id": ev_stride,
                                  "user_id": user_stride}),
    }

    # ---- documents: vocabulary-frequency corpus at 10x -----------------
    docs = rd["documents"]
    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist()
    sources = docs["source"].to_pylist()
    words, lengths = [], []
    for t in texts:
        ws = t.split()
        lengths.append(len(ws))
        words.extend(ws)
    vocab, counts = np.unique(np.array(words), return_counts=True)
    p = counts / counts.sum()
    n_docs = len(texts) * K
    lens = rng.choice(np.array(lengths), size=n_docs, replace=True)
    flat = rng.choice(vocab, size=int(lens.sum()), replace=True, p=p)
    offs = np.concatenate([[0], np.cumsum(lens)])
    new_texts = [" ".join(flat[offs[i]:offs[i + 1]])
                 for i in range(n_docs)]
    # plant exact dups at the empirical sf0.1 rate, near-dups at ~1%
    n_exact = max(1, (len(texts) - len(set(texts))) * K)
    for i, j in zip(rng.choice(n_docs, n_exact, replace=False),
                    rng.choice(n_docs, n_exact, replace=False)):
        if i != j:
            new_texts[j] = new_texts[i]
    n_near = n_docs // 100
    src_i = rng.choice(n_docs, n_near, replace=False)
    dst_i = rng.choice(n_docs, n_near, replace=False)
    for i, j in zip(src_i, dst_i):
        if i == j:
            continue
        ws = new_texts[i].split()
        if len(ws) < 12:
            continue
        for pos in rng.choice(len(ws), max(1, len(ws) // 10),
                              replace=False):
            ws[pos] = str(vocab[rng.integers(len(vocab))])
        new_texts[j] = " ".join(ws)
    out["documents"] = pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(new_texts, pa.string()),
        "lang": pa.array(rng.choice(np.array(langs), n_docs), pa.string()),
        "source": pa.array(rng.choice(np.array(sources), n_docs),
                           pa.string()),
        "n_chars": pa.array([len(t) for t in new_texts], pa.int64()),
    })

    # ---- embeddings: per-label Gaussian fit at 10x ---------------------
    emb = rd["embeddings"]
    vecs = np.asarray(emb["embedding"].to_pylist(), dtype=np.float32)
    labels = np.asarray(emb["label"].to_pylist())
    n_vec = len(vecs) * K
    ulabels, lcounts = np.unique(labels, return_counts=True)
    new_labels = rng.choice(ulabels, size=n_vec, p=lcounts / lcounts.sum())
    new_vecs = np.empty((n_vec, vecs.shape[1]), dtype=np.float32)
    for lb in ulabels:
        sel = labels == lb
        mu, sd = vecs[sel].mean(0), vecs[sel].std(0) + 1e-6
        m = new_labels == lb
        new_vecs[m] = rng.normal(mu, sd, size=(int(m.sum()),
                                               vecs.shape[1]))
    out["embeddings"] = pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.array(list(new_vecs),
                              pa.list_(pa.float32(), vecs.shape[1]))
        if pa.types.is_fixed_size_list(emb["embedding"].type)
        else pa.array([list(map(float, v)) for v in new_vecs]),
        "label": pa.array(new_labels.astype(np.int32), pa.int32()),
    })

    meta = {}
    for name, tbl in out.items():
        pq.write_table(tbl, os.path.join(OUT, f"{name}.parquet"),
                       row_group_size=131_072)
        meta[name] = tbl.num_rows
    with open(os.path.join(OUT, "MANIFEST.json"), "w") as f:
        json.dump({"src": SRC, "K": K, "rows": meta}, f, indent=1)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
