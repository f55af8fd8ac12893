"""Distributed connected components over an edge-list Dataset.

The cluster-resolution stage of near-duplicate deduplication: the pair
ops (``ngram_jaccard_pairs``, ``cosine_pairs_exact``, MinHash/SimHash
candidates) emit EDGES (id_a, id_b); keeping "one document per
duplicate cluster" needs each node's connected component. No reference
counterpart (DataVec has no graph stage) — provided first-class because
every large-scale dedup pipeline ends with exactly this step.

Algorithm: one streaming ``Dataset.aggregate`` pass whose state is a
SPANNING FOREST of the edges seen so far — a mergeable summary (union
of two forests, re-reduced, is a forest of the union), so Ray's tree
reduce combines per-block forests without ever holding the raw edge
list in one place. A forest over the duplicate-pair graph has at most
(#distinct duplicated docs − 1) edges, which at real dedup rates is
orders of magnitude below corpus size — this is the same
"pairs << corpus" contract the pair ops themselves rely on, and the
reason trillion-token pipelines (SlimPajama, RedPajama-v2) resolve
clusters from the pair list rather than the corpus. For edge lists
that exceed a single reducer's heap, fall back to iterative hash-min
label propagation (not needed at any scale this repo targets, noted in
ARCHITECTURE.md).

Union-find itself is inherently sequential per edge, but runs only over
block-local edges (then forest-sized merges), never the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from datavec_ray.steps.base import combine

_EMPTY = np.zeros((0, 2), dtype=np.int64)


def _spanning_forest(e: np.ndarray) -> np.ndarray:
    """Spanning forest (subset of the input rows) of an (k,2) int64 edge
    array — array-based union-find with path halving."""
    if len(e) == 0:
        return _EMPTY
    nodes, idx = np.unique(e, return_inverse=True)
    idx = idx.reshape(e.shape)
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    keep = np.zeros(len(e), dtype=bool)
    for i in range(len(e)):
        ru, rv = find(idx[i, 0]), find(idx[i, 1])
        if ru != rv:
            parent[ru] = rv
            keep[i] = True
    return np.ascontiguousarray(e[keep])


def _labels_from_forest(forest: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(nodes, component) with component = MIN node id of each tree —
    a deterministic, engine-independent representative."""
    if len(forest) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    nodes, idx = np.unique(forest, return_inverse=True)
    idx = idx.reshape(forest.shape)
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(forest)):
        ru, rv = find(idx[i, 0]), find(idx[i, 1])
        if ru != rv:
            parent[ru] = rv
    roots = np.array([find(i) for i in range(len(nodes))], dtype=np.int64)
    comp_min = np.full(len(nodes), np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(comp_min, roots, nodes)
    return nodes, comp_min[roots]


def _edges_of_block(blk: pa.Table, src: str, dst: str) -> np.ndarray:
    a = combine(blk[src]).to_numpy(zero_copy_only=False).astype(np.int64)
    b = combine(blk[dst]).to_numpy(zero_copy_only=False).astype(np.int64)
    return np.stack([a, b], axis=1)


def connected_components(edges, src: str = "id_a", dst: str = "id_b",
                         node_col: str = "node",
                         comp_col: str = "component") -> pa.Table:
    """Connected components of an undirected edge list (Dataset or
    Table). Returns a table (node_col, comp_col) covering every node
    that appears in an edge; component id = min node id of the
    component. ONE streaming aggregate pass (see module docstring)."""
    if isinstance(edges, pa.Table):
        forest = _spanning_forest(_edges_of_block(edges, src, dst))
    else:
        from ray.data.aggregate import AggregateFn

        agg = AggregateFn(
            init=lambda _k: _EMPTY,
            accumulate_block=lambda f, blk: _spanning_forest(
                np.concatenate([f, _edges_of_block(blk, src, dst)])),
            merge=lambda a, b: _spanning_forest(np.concatenate([a, b])),
            finalize=lambda f: f, name="forest")
        forest = np.asarray(
            edges.select_columns([src, dst]).aggregate(agg)["forest"],
            dtype=np.int64).reshape(-1, 2)
    nodes, comps = _labels_from_forest(forest)
    return pa.table({node_col: pa.array(nodes, pa.int64()),
                     comp_col: pa.array(comps, pa.int64())})


def assign_components(ds, labels: pa.Table, id_col: str,
                      node_col: str = "node", comp_col: str = "component"):
    """Attach each row's duplicate-cluster id: broadcast the (small)
    label table once via ray.put, one vectorized pyarrow left join per
    batch; nodes not in any edge are their own singleton component
    (component = own id)."""
    import ray
    import pyarrow.compute as pc

    lbl_ref = ray.put(labels.rename_columns([id_col, comp_col]))

    class _Assign:
        def __init__(self):
            lbl = ray.get(lbl_ref)
            # index_in lookup instead of Table.join: pyarrow's join
            # rejects list-typed payload columns (e.g. embeddings), a
            # lookup is type-agnostic and just as vectorized
            self.ids = lbl[id_col].combine_chunks().cast(pa.int64())
            self.comps = lbl[comp_col].combine_chunks().cast(pa.int64())

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].combine_chunks().cast(pa.int64())
            idx = pc.index_in(ids, value_set=self.ids)
            comp = pc.coalesce(pc.take(self.comps, idx), ids)
            return batch.append_column(pa.field(comp_col, pa.int64()), comp)

    return ds.map_batches(_Assign, batch_format="pyarrow",
                          concurrency=(1, 8))


def dedup_by_components(ds, edges, id_col: str, src: str = "id_a",
                        dst: str = "id_b"):
    """Keep one row per duplicate cluster (the min-id representative):
    rows never seen in a pair survive untouched; within a cluster only
    ``id == component`` survives. The standard final stage of
    MinHash/SimHash/embedding near-dedup."""
    import pyarrow.compute as pc

    labels = connected_components(edges, src=src, dst=dst)
    with_comp = assign_components(ds, labels, id_col)

    def keep(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch[id_col].combine_chunks().cast(pa.int64()),
                     batch["component"])
        return batch.filter(m).drop_columns(["component"])

    return with_comp.map_batches(keep, batch_format="pyarrow")
