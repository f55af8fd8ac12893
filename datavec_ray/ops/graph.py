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
import pyarrow.compute as pc

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

    # max_restarts=0: the constructor closure reads a ray.put ref —
    # a restart after the ref is lost would fail anyway (ray#53727)
    return ds.map_batches(_Assign, batch_format="pyarrow",
                          concurrency=(1, 8), max_restarts=0)


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


def pagerank(edges, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iterations: int = 10,
             personalization: "dict[int, float] | None" = None,
             materialize: bool = True) -> pa.Table:
    """PageRank over a directed edge-list Dataset (or Table) — the
    crawl-prioritization / domain-ranking stage of a web-curation
    pipeline (Common-Crawl-style pipelines rank hosts to decide what
    to fetch and keep). Multi-edges count once per occurrence; nodes
    with no out-edges are dangling and redistribute their mass
    uniformly (the standard formulation).

    Scale shape — the classic "vertex state fits, edges stream"
    regime (edges >> nodes by orders of magnitude on web graphs):
    the rank vector lives on the driver / object store (16 B per
    node: fine to ~1e8 hosts), while the EDGE list — the big side —
    is only ever streamed. Per iteration: ONE shuffle-free
    map_batches pass over edges with the broadcast (node → weight)
    vector (searchsorted lookup + in-batch bincount combine by dst,
    so a batch emits ≤ its distinct-dst rows), then one tiny grouped
    Sum over those partials. ``iterations`` fixed passes (no
    convergence test) keeps the result deterministic and
    SQL-mirrorable.

    ``personalization`` (node → weight, normalized internally) makes
    it PERSONALIZED PageRank: teleports — including dangling mass —
    land on the seed distribution instead of uniformly (topic-focused
    crawl ranking; Haveliwala 2002).

    Returns a pa.Table (node, rank) over every node in the edge set;
    ranks sum to 1.
    """
    import ray
    import ray.data as rd

    from datavec_ray.reduce import Reducer
    from datavec_ray.util import dataset_to_table

    if isinstance(edges, pa.Table):
        edges = rd.from_arrow(edges)
    if materialize:
        # iterative algorithm: pin the (src, dst) projection once in the
        # object store instead of re-executing the upstream plan every
        # iteration — the standard Ray Data iterative-dataset tradeoff
        # (blocks spill to disk if the edge list exceeds store memory;
        # pass materialize=False to re-stream from the source instead).
        edges = edges.select_columns([src, dst]).materialize()

    def node_deg(batch: pa.Table):
        s = combine(batch[src]).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        d = combine(batch[dst]).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        sn, sc = np.unique(s, return_counts=True)
        alln = np.union1d(sn, d)
        deg = np.zeros(len(alln), dtype=np.int64)
        deg[np.searchsorted(alln, sn)] = sc
        return pa.table({"n": pa.array(alln), "deg": pa.array(deg)})

    deg_tbl = dataset_to_table(
        Reducer(["n"], [["deg", "Sum", "deg"]]).apply_dataset(
            edges.map_batches(node_deg, batch_format="pyarrow")))
    nodes = deg_tbl["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(nodes)
    nodes = nodes[order]
    outdeg = deg_tbl["deg"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)[order]
    n = len(nodes)
    if n == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.float64())})
    if personalization is None:
        p = np.full(n, 1.0 / n)
    else:
        p = np.zeros(n)
        seeds = np.array(sorted(personalization), dtype=np.int64)
        pos = np.searchsorted(nodes, seeds)
        ok = (pos < n) & (nodes[np.minimum(pos, n - 1)] == seeds)
        if not ok.any():
            raise ValueError("personalization names no node in the edge set")
        p[pos[ok]] = [personalization[s] for s in seeds[ok]]
        p /= p.sum()
    rank = p.copy()
    dangling = outdeg == 0
    safe_deg = np.where(dangling, 1, outdeg).astype(np.float64)

    def _contrib(batch: pa.Table, *, ref) -> pa.Table:
        # broadcast rank vector: ray.put once per iteration, zero-copy
        # plasma read in every task (numpy arrays share the store page)
        bnodes, w_all = ray.get(ref)
        s = combine(batch[src]).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        d = combine(batch[dst]).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        w = w_all[np.searchsorted(bnodes, s)]
        dn, inv = np.unique(d, return_inverse=True)
        c = np.bincount(inv, weights=w, minlength=len(dn))
        return pa.table({"n": pa.array(dn),
                         "c": pa.array(c, pa.float64())})

    for _ in range(iterations):
        ref = ray.put((nodes, rank / safe_deg))
        part = edges.map_batches(_contrib, batch_format="pyarrow",
                                 fn_kwargs={"ref": ref})
        contrib_tbl = dataset_to_table(
            Reducer(["n"], [["c", "Sum", "c"]]).apply_dataset(part))
        contrib = np.zeros(n)
        cn = contrib_tbl["n"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        contrib[np.searchsorted(nodes, cn)] = \
            contrib_tbl["c"].to_numpy(zero_copy_only=False)
        m = rank[dangling].sum()
        rank = (1.0 - damping) * p + damping * (contrib + m * p)

    return pa.table({"node": pa.array(nodes),
                     "rank": pa.array(rank, pa.float64())})


def triangle_count(edges, src: str = "src", dst: str = "dst",
                   num_partitions: int = 32) -> int:
    """Exact triangle count of the undirected simple graph induced by
    the edge stream (self-loops dropped, multi-edges collapsed) — the
    classic graph-quality / community-density statistic.

    Degree-ordered wedge algorithm, fully vectorized:
    1. canonicalize (u < v) + distinct — one pair-hash shuffle;
    2. per-node out-degrees (one grouped Count with the combiner) —
       broadcast as sorted arrays (the vertex-state-fits-memory regime,
       same contract as `pagerank`'s rank vector);
    3. orient every edge from its lower-(degree, id) endpoint, so each
       node's out-degree is O(sqrt(E)) on any graph — wedge generation
       (all pairs of out-neighbors per node, a per-partition segmented
       triu explode) does Σ deg_out² ≤ O(E^1.5) total work;
    4. every wedge (a, b) closes a triangle iff (a, b) is an edge:
       one Bloom-prefiltered semi join (`join.semi_join`) of wedges
       against the canonical edge set, counted.
    Each triangle is counted exactly once (by its lowest-order apex).
    """
    import ray

    from datavec_ray.join import semi_join
    from datavec_ray.misc import _GPART, _group_partition
    from datavec_ray.steps.base import combine
    from datavec_ray.ops.dedup import distinct_pairs

    def canon(b: pa.Table) -> pa.Table:
        u = combine(b[src]).cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = combine(b[dst]).cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = u != v
        u, v = u[m], v[m]
        return pa.table({"id_a": pa.array(np.minimum(u, v)),
                         "id_b": pa.array(np.maximum(u, v))})

    ce = distinct_pairs(edges.map_batches(canon, batch_format="pyarrow"),
                        num_partitions=num_partitions).materialize()

    # degrees over the canonical undirected edges
    def deg_partial(b: pa.Table) -> pa.Table:
        ids = np.concatenate([
            b["id_a"].to_numpy(zero_copy_only=False),
            b["id_b"].to_numpy(zero_copy_only=False)])
        n, c = np.unique(ids, return_counts=True)
        return pa.table({"node": pa.array(n), "d": pa.array(c)})

    parts = ce.map_batches(deg_partial, batch_format="pyarrow")
    from datavec_ray.util import dataset_to_table
    dt = dataset_to_table(parts)
    if dt.num_rows == 0:
        return 0
    agg = dt.group_by("node").aggregate([("d", "sum")])
    nodes = agg["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    degs = agg["d_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(nodes)
    deg_ref = ray.put((nodes[order], degs[order]))

    def orient(b: pa.Table) -> pa.Table:
        nd, dg = ray.get(deg_ref)
        a = b["id_a"].to_numpy(zero_copy_only=False)
        c = b["id_b"].to_numpy(zero_copy_only=False)
        da = dg[np.searchsorted(nd, a)]
        db = dg[np.searchsorted(nd, c)]
        # lower (degree, id) endpoint emits the edge
        a_first = (da < db) | ((da == db) & (a < c))
        return pa.table({"x": pa.array(np.where(a_first, a, c)),
                         "nbr": pa.array(np.where(a_first, c, a))})

    oriented = ce.map_batches(orient, batch_format="pyarrow")

    def wedges(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [("x", "ascending"), ("nbr", "ascending")])
        x = g["x"].to_numpy(zero_copy_only=False)
        nb = g["nbr"].to_numpy(zero_copy_only=False)
        n = len(x)
        if n == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        new = np.ones(n, dtype=bool)
        new[1:] = x[1:] != x[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, n))
        outs_a, outs_b = [], []
        for s, ln in zip(starts, lens):      # few segments per partition
            if ln < 2:
                continue
            seg = nb[s:s + ln]
            i, j = np.triu_indices(ln, k=1)
            outs_a.append(seg[i])
            outs_b.append(seg[j])
        if not outs_a:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        a = np.concatenate(outs_a)
        b2 = np.concatenate(outs_b)
        return pa.table({"id_a": pa.array(np.minimum(a, b2)),
                         "id_b": pa.array(np.maximum(a, b2))})

    wedges.__name__ = "triangle_wedges"
    wg = _group_partition(oriented, ["x"], num_partitions) \
        .groupby(_GPART).map_groups(wedges, batch_format="pyarrow")
    closed = semi_join(wg, ce, ["id_a", "id_b"])
    return int(closed.count())


def tree_paths(ds, id_col: str = "id", parent_col: str = "parent",
               label_col=None, sep: str = "/", leaves_only: bool = True,
               num_partitions: int = 32, max_rounds: int = 64):
    """Root-to-node paths over a FOREST (message trees: OpenAssistant /
    branched-transcript layouts where each message points at its
    parent) — linearizing every root→leaf branch into one training
    conversation is the standard tree-flattening step before SFT
    export.

    Parallel POINTER DOUBLING (Wyllie-style path jumping): every node
    carries (ancestor, prefix) where ``prefix`` is the label path from
    just below that ancestor down to itself; one round joins each
    node's state with its ancestor's state, doubling the span the
    prefix covers. A forest of depth D resolves in ceil(log2 D)
    co-partition hash exchanges — total traffic O(n·|path|·log D), no
    per-node recursion, no driver-held parent map (the map IS the
    distributed dataset). A node whose parent id never appears in the
    input is treated as depth-1 child of a missing root (its path
    starts at itself) — the robust choice for partially-exported trees.

    Returns (id, depth, path): ``depth`` = number of nodes on the path,
    ``path`` = sep-joined labels root→node. ``leaves_only=True`` keeps
    only nodes that are nobody's parent (each full branch once).
    SQL mirror: a recursive CTE walking roots downward.
    """
    import ray.data as rd

    from datavec_ray.join import anti_join
    from datavec_ray.misc import _GPART, _group_partition
    from datavec_ray.steps.base import combine

    def init(batch: pa.Table) -> pa.Table:
        ids = combine(batch[id_col]).cast(pa.int64())
        lab = (combine(batch[label_col]).cast(pa.string())
               if label_col else ids.cast(pa.string()))
        return pa.table({
            "__id": ids,
            "__anc": combine(batch[parent_col]).cast(pa.int64()),
            "__pfx": lab,
            "__dist": pa.array(np.ones(batch.num_rows, np.int64)),
        })

    state = ds.map_batches(init, batch_format="pyarrow").materialize()

    def jump(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART])
        probe = g.filter(pc.equal(g["__side"], 0))
        look = g.filter(pc.equal(g["__side"], 1))
        # resolved nodes (null ancestor) arrive ONLY as lookup rows;
        # their lookup copy doubles as the state pass-through so they
        # never ride the exchange under a null probe key (which would
        # hash every resolved row into ONE partition — the skew that
        # made late rounds single-worker sorts)
        done = look.filter(pc.is_null(look["__anc"])) \
            .select(["__id", "__anc", "__pfx", "__dist"])
        look = pa.table({"__jid": look["__id"], "__anc2": look["__anc"],
                         "__pfx2": look["__pfx"], "__dist2": look["__dist"]})
        j = probe.select(["__id", "__anc", "__pfx", "__dist"]) \
            .join(look, keys=["__anc"], right_keys=["__jid"],
                  join_type="left outer")
        hit = pc.is_valid(j["__dist2"])
        pfx = pc.if_else(
            hit,
            pc.binary_join_element_wise(
                pc.fill_null(j["__pfx2"], ""), j["__pfx"], sep),
            j["__pfx"])
        # unmatched parent id = missing root: resolve the node as-is
        anc = pc.if_else(hit, j["__anc2"], pa.scalar(None, pa.int64()))
        dist = pc.add(j["__dist"], pc.fill_null(j["__dist2"], 0))
        out = pa.table({"__id": j["__id"], "__anc": anc,
                        "__pfx": pfx, "__dist": dist})
        return pa.concat_tables([out, done]) if done.num_rows else out

    jump.__name__ = "tree_paths_jump"

    def count_undone(batch: pa.Table) -> pa.Table:
        n = int(pc.sum(pc.is_valid(batch["__anc"]).cast(pa.int64()))
                .as_py() or 0)
        return pa.table({"n": pa.array([n], pa.int64())})

    def both_sides(batch: pa.Table) -> pa.Table:
        # ONE output per block carrying probe rows (key = ancestor,
        # UNRESOLVED nodes only — resolved nodes would all carry a null
        # key and hash into a single partition) and lookup rows (key =
        # own id, every node: descendants may still need a resolved
        # ancestor's prefix), so the round needs no Dataset.union
        # diamond. Resolved nodes re-enter the next state through their
        # lookup copy (see jump).
        probe = batch.filter(pc.is_valid(batch["__anc"]))
        probe = pa.table({
            "__id": probe["__id"], "__anc": probe["__anc"],
            "__pfx": probe["__pfx"], "__dist": probe["__dist"],
            "__side": pa.array(np.zeros(probe.num_rows, np.int8)),
            "__k": probe["__anc"]})
        look = pa.table({
            "__id": batch["__id"], "__anc": batch["__anc"],
            "__pfx": batch["__pfx"], "__dist": batch["__dist"],
            "__side": pa.array(np.ones(batch.num_rows, np.int8)),
            "__k": batch["__id"]})
        return pa.concat_tables([probe, look])

    for _ in range(max_rounds):
        undone = sum(r["n"] for r in
                     state.map_batches(count_undone,
                                       batch_format="pyarrow").take_all())
        if undone == 0:
            break
        tagged = state.map_batches(both_sides, batch_format="pyarrow")
        state = _group_partition(tagged, ["__k"], num_partitions) \
            .groupby(_GPART).map_groups(jump, batch_format="pyarrow") \
            .materialize()
    else:
        raise RuntimeError(
            f"tree_paths: depth exceeds 2**{max_rounds} rounds "
            "(cycle in parent pointers?)")

    out = state.map_batches(
        lambda b: pa.table({id_col: b["__id"], "depth": b["__dist"],
                            "path": b["__pfx"]}),
        batch_format="pyarrow")
    if leaves_only:
        parents = ds.map_batches(
            lambda b: pa.table({"__p": combine(b[parent_col])
                                .cast(pa.int64())}).drop_null(),
            batch_format="pyarrow")
        out = anti_join(out, parents, [id_col], right_keys=["__p"])
    return out
