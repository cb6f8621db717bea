"""Distributed connected components over candidate/near-dup pair graphs.

Turning verified near-dup PAIRS into dedup CLUSTERS (one survivor per
component) needs connected components at corpus scale. This implements
the alternating large-star / small-star algorithm (Kiveris, Lattanzi,
Mirrokni, Rastogi & Vassilvitskii, "Connected Components in MapReduce
and Beyond", SoCC 2014 — public literature): each round is two
``groupby(node).map_groups`` passes over the edge list, the edge set
monotonically contracts toward one star per component rooted at the
component's minimum id, and convergence takes O(log n) rounds. Nothing
node- or edge-scale ever lands on the driver — the driver only sees
per-round changed-edge COUNTS (small aggregates) to detect the fixpoint.

Fixpoint test: the graph is a union of min-rooted stars iff
  (a) large-star moves nothing — every node that has a larger neighbor
      has no smaller one, and
  (b) small-star moves nothing — every node has at most one smaller
      neighbor;
(a) + (b) force each node to be either a root (all neighbors larger) or
a leaf (exactly one neighbor, smaller), i.e. stars — and a star is a
no-op for both passes, so the counts are zero exactly at convergence.

Edges are canonical (u < v) int64 pairs throughout; self loops are
dropped on input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_EMPTY_EDGES = pa.table({"u": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64()),
                         "changed": pa.array([], pa.int64())})


def _canon_edges(batch: pa.Table) -> pa.Table:
    a = batch.column("doc_a").to_numpy().astype(np.int64)
    b = batch.column("doc_b").to_numpy().astype(np.int64)
    u = np.minimum(a, b)
    v = np.maximum(a, b)
    keep = u != v
    return pa.table({"u": pa.array(u[keep], pa.int64()),
                     "v": pa.array(v[keep], pa.int64())})


def _segments(node_s: np.ndarray):
    n = len(node_s)
    seg = np.ones(n, bool)
    seg[1:] = node_s[1:] != node_s[:-1]
    starts = np.nonzero(seg)[0]
    ends = np.append(starts[1:], n)
    return starts, ends


def _large_star_explode(batch: pa.Table) -> pa.Table:
    """(u, v) canonical -> both directed rows (node, nbr)."""
    u = batch.column("u").to_numpy().astype(np.int64)
    v = batch.column("v").to_numpy().astype(np.int64)
    return pa.table({
        "node": pa.array(np.concatenate([u, v]), pa.int64()),
        "nbr": pa.array(np.concatenate([v, u]), pa.int64()),
    })


def _out(u: np.ndarray, v: np.ndarray, changed: int) -> pa.Table:
    cg = np.zeros(len(u), np.int64)
    if len(cg):
        cg[0] = changed
        return pa.table({"u": pa.array(u, pa.int64()),
                         "v": pa.array(v, pa.int64()),
                         "changed": pa.array(cg, pa.int64())})
    # unreachable by construction: large-star's changed mask is a subset
    # of its emitted edges, small-star emits one edge per segment
    assert changed == 0, "changed count with no emitted edges"
    return _EMPTY_EDGES


def _large_star_group(group: pa.Table) -> pa.Table:
    """large-star(node): m = min(N ∪ {node}); for every nbr > node emit
    canonical (m, nbr). changed counts emitted edges whose root moved
    (m != node)."""
    node = group.column("node").to_numpy().astype(np.int64)
    nbr = group.column("nbr").to_numpy().astype(np.int64)
    order = np.lexsort((nbr, node))
    node_s, nbr_s = node[order], nbr[order]
    starts, ends = _segments(node_s)
    m = np.minimum(np.minimum.reduceat(nbr_s, starts), node_s[starts])
    m_full = np.repeat(m, ends - starts)
    big = nbr_s > node_s
    changed = int((big & (m_full != node_s)).sum())
    return _out(m_full[big], nbr_s[big], changed)


def _small_star_group(group: pa.Table) -> pa.Table:
    """small-star(node) over the smaller neighbors L (rows (node, nbr),
    nbr < node): m = min(L); emit canonical (m, x) for x in
    (L ∪ {node}) minus {m}. changed = sum(|L| - 1) — zero iff every node
    here has exactly one smaller neighbor (star leaf)."""
    node = group.column("node").to_numpy().astype(np.int64)
    nbr = group.column("nbr").to_numpy().astype(np.int64)
    order = np.lexsort((nbr, node))
    node_s, nbr_s = node[order], nbr[order]
    starts, ends = _segments(node_s)
    m = np.minimum.reduceat(nbr_s, starts)
    m_full = np.repeat(m, ends - starts)
    keep = nbr_s != m_full          # drops exactly one row per segment
    out_u = np.concatenate([m_full[keep], m])
    out_v = np.concatenate([nbr_s[keep], node_s[starts]])
    changed = int(len(node_s) - len(starts))
    return _out(out_u, out_v, changed)


def _dedup_edges_group(group: pa.Table) -> pa.Table:
    u = group.column("u").to_numpy().astype(np.int64)
    v = group.column("v").to_numpy().astype(np.int64)
    uv = np.unique(np.stack([u, v], axis=1), axis=0)
    return pa.table({"u": pa.array(uv[:, 0], pa.int64()),
                     "v": pa.array(uv[:, 1], pa.int64())})


def _swap_to_node_nbr(batch: pa.Table) -> pa.Table:
    return pa.table({"node": batch.column("v"), "nbr": batch.column("u")})


def connected_components(pairs, max_iters: int = 64,
                         collect: bool = True):
    """(doc_a, doc_b) pair Dataset -> (doc_id, cluster_rep) pyarrow Table
    (or, with collect=False, a Dataset with those columns — for
    corpus-scale consumers like survivor selection that must not pull
    the membership table onto the driver):
    cluster_rep = component minimum, every node that appears in a pair
    present exactly once, sorted by doc_id. Nodes in no pair (singletons)
    are by construction absent — union with the corpus id space upstream
    if full coverage is needed."""
    edges = pairs.map_batches(_canon_edges, batch_format="pyarrow")
    converged = False
    for _ in range(max_iters):
        ls = (edges.map_batches(_large_star_explode, batch_format="pyarrow")
              .groupby("node").map_groups(_large_star_group,
                                          batch_format="pyarrow")
              .materialize())
        changed_l = int(ls.sum("changed") or 0)
        edges = (ls.drop_columns(["changed"]).groupby("u")
                 .map_groups(_dedup_edges_group, batch_format="pyarrow"))
        ss = (edges.map_batches(_swap_to_node_nbr, batch_format="pyarrow")
              .groupby("node").map_groups(_small_star_group,
                                          batch_format="pyarrow")
              .materialize())
        changed_s = int(ss.sum("changed") or 0)
        edges = (ss.drop_columns(["changed"]).groupby("u")
                 .map_groups(_dedup_edges_group, batch_format="pyarrow")
                 .materialize())
        if changed_l == 0 and changed_s == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_iters} rounds")

    def _members(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy().astype(np.int64)
        v = batch.column("v").to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": pa.array(np.concatenate([v, u]), pa.int64()),
            "cluster_rep": pa.array(np.concatenate([u, u]), pa.int64()),
        })

    members = edges.map_batches(_members, batch_format="pyarrow")
    out = members.groupby("doc_id").min("cluster_rep")
    if not collect:
        def _rename(b: pa.Table) -> pa.Table:
            return b.rename_columns(["doc_id", "cluster_rep"]) \
                if b.num_columns == 2 else b
        return out.map_batches(_rename, batch_format="pyarrow")
    chunks = list(out.iter_batches(batch_size=65536, batch_format="pyarrow"))
    if not chunks:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "cluster_rep": pa.array([], pa.int64())})
    t = pa.concat_tables(chunks).rename_columns(["doc_id", "cluster_rep"])
    return t.sort_by([("doc_id", "ascending")])
