"""Exact deterministic k-means (Lloyd) over embedding columns.

The training-data use case is corpus bucketing / semantic sharding
(cluster-then-sample curation, SemDeDup-style cluster prefilters). A
float k-means is nondeterministic across summation orders, so this
operator defines a QUANTIZED EXACT variant whose every step is integer
arithmetic — the result is a pure function of the input regardless of
block boundaries, task order, or cluster size, and a DuckDB oracle can
replay it bit-for-bit (4 unrolled Lloyd iterations as SQL CTEs in
``__ray_entry__``):

- quantize: q_j = floor(x_j * 2^16 + 0.5) as int64 (identical IEEE ops
  in numpy float64 and SQL DOUBLE; float32 -> float64 is exact);
- init: the k vectors with the smallest vec_ids;
- assign: argmin over exact squared L2; ties -> smallest cluster index.
  Distances are computed via the float64 BLAS expansion
  ||q||^2 - 2 q.c + ||c||^2 — every intermediate is an integer below
  2^53 (|q| <= ~2^17, dim 64 => q.c <= 2^17 * 2^17 * 64 = 2^40), so
  the float math IS exact integer math at BLAS speed;
- update: per-dim mean with deterministic floor rounding
  m = floor((2*s + n) / (2*n)) (round-half-up; exact in float64 for
  |2s| < 2^53); an empty cluster keeps its previous centroid.

Distribution shape — ZERO all-to-all exchanges: centroids broadcast by
``ray.put`` each iteration (k x d int64, tiny); each batch emits one
(k x d) partial-sum block + counts; the driver streams the per-block
partials (bounded: k*d values per block, never rows) and folds them —
int64 addition is associative/commutative, so the fold order cannot
change the result. The final pass emits (vec_id, cluster) assignments.

Relation to similarity.py's IVF coarse quantizer: that one is a
sampled, float, fixed-seed k-means-lite used only to bucket ANN probes
(exactness guaranteed at nprobe=n_lists); this is the first-class exact
clustering operator.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

QUANT = 65536.0  # 2^16 quantization grid


def _quantize(mat: np.ndarray) -> np.ndarray:
    """float32/64 (n, d) -> int64 grid, floor(x * 2^16 + 0.5).

    Rejects magnitude x dimension combinations that would break the
    'float64 BLAS on integer operands is exact' invariant in ``_assign``
    (distance terms are bounded by d*M^2 with M = max |q|; require
    d*M^2 < 2^53) — the same loud-failure contract as ``_quantize8``,
    which also keeps |2s| < 2^53 in the centroid update for any
    realistic row count."""
    q = np.floor(mat.astype(np.float64) * QUANT + 0.5).astype(np.int64)
    if len(q):
        m = int(np.abs(q).max())
        d = q.shape[1]
        if d * m * m >= 2 ** 53:
            raise ValueError(
                "embedding magnitude x dimension exceeds the exact-"
                f"distance float64 bound (max|q|={m}, dim={d}); "
                "rescale inputs or use a coarser grid")
    return q


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.compute as pc

    ids = batch.column("vec_id").to_numpy().astype(np.int64)
    flat = pc.list_flatten(batch.column("embedding")).to_numpy()
    d = len(flat) // max(len(ids), 1)
    return ids, flat.reshape(len(ids), d)


def _assign(q: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Exact argmin cluster per row (ties -> smallest index): float64
    BLAS on integer-valued operands stays exact below 2^53."""
    qf = q.astype(np.float64)
    cf = cents.astype(np.float64)
    d2 = (qf * qf).sum(axis=1, keepdims=True) \
        - 2.0 * (qf @ cf.T) + (cf * cf).sum(axis=1)[None, :]
    return np.argmin(d2, axis=1).astype(np.int64)


def _partials_batch(batch: pa.Table, cents_ref, k: int) -> pa.Table:
    """One batch -> one row holding the (k, d) int64 partial sums and
    per-cluster counts for the broadcast centroids."""
    import ray

    cents = ray.get(cents_ref)
    ids, mat = _batch_matrix(batch)
    if len(ids) == 0:
        d = cents.shape[1]
        return pa.table({
            "sums": pa.array([np.zeros(k * d, np.int64).tobytes()],
                             pa.large_binary()),
            "counts": pa.array([np.zeros(k, np.int64).tobytes()],
                               pa.large_binary()),
        })
    q = _quantize(mat)
    a = _assign(q, cents)
    d = q.shape[1]
    sums = np.zeros((k, d), np.int64)
    np.add.at(sums, a, q)
    counts = np.bincount(a, minlength=k).astype(np.int64)
    return pa.table({
        "sums": pa.array([sums.tobytes()], pa.large_binary()),
        "counts": pa.array([counts.tobytes()], pa.large_binary()),
    })


def _assign_batch(batch: pa.Table, cents_ref) -> pa.Table:
    import ray

    cents = ray.get(cents_ref)
    ids, mat = _batch_matrix(batch)
    if len(ids) == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int64())})
    a = _assign(_quantize(mat), cents)
    return pa.table({"vec_id": pa.array(ids),
                     "cluster": pa.array(a)})


def _init_centroids(ds, k: int) -> np.ndarray:
    """Quantized vectors of the k smallest vec_ids: per-batch partial
    min-k, folded on the driver (holds <= k x d per block, tiny)."""
    def part(batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "q": pa.array([], pa.large_binary())})
        order = np.argsort(ids, kind="stable")[:k]
        q = _quantize(mat[order])
        return pa.table({
            "vec_id": pa.array(ids[order]),
            "q": pa.array([row.tobytes() for row in q],
                          pa.large_binary()),
        })

    best: list[tuple[int, bytes]] = []
    for b in ds.map_batches(part, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        best.extend(zip(b.column("vec_id").to_pylist(),
                        b.column("q").to_pylist()))
        best.sort(key=lambda t: t[0])
        best = best[:k]
    if len(best) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(best)}")
    return np.stack([np.frombuffer(buf, np.int64) for _, buf in best])


def kmeans_centroids(ds, k: int = 8, iters: int = 4) -> np.ndarray:
    """The quantized centroids after ``iters`` exact Lloyd iterations
    (the k x d int64 matrix the final assignment pass broadcasts)."""
    import ray

    cents = _init_centroids(ds, k)
    for _ in range(iters):
        ref = ray.put(cents)
        sums = np.zeros_like(cents)
        counts = np.zeros(k, np.int64)
        rows = ds.map_batches(partial(_partials_batch, cents_ref=ref,
                                      k=k), batch_format="pyarrow")
        for b in rows.iter_batches(batch_size=None,
                                   batch_format="pyarrow"):
            for sbuf, cbuf in zip(b.column("sums").to_pylist(),
                                  b.column("counts").to_pylist()):
                sums += np.frombuffer(sbuf, np.int64).reshape(k, -1)
                counts += np.frombuffer(cbuf, np.int64)
        nz = counts > 0
        # m = floor((2s + n) / (2n)) — exact in float64 below 2^53
        upd = np.floor((2.0 * sums[nz] + counts[nz][:, None])
                       / (2.0 * counts[nz][:, None])).astype(np.int64)
        cents = cents.copy()
        cents[nz] = upd  # empty clusters keep their previous centroid
    return cents


def kmeans_assign(ds, k: int = 8, iters: int = 4):
    """Quantized exact Lloyd: returns the (vec_id, cluster) assignment
    Dataset after ``iters`` iterations (see module docstring for the
    exact deterministic spec the SQL oracle replays)."""
    import ray

    ref = ray.put(kmeans_centroids(ds, k, iters))
    return ds.map_batches(partial(_assign_batch, cents_ref=ref),
                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SemDeDup: cluster-then-cosine semantic near-dup pairs
# ---------------------------------------------------------------------------

QUANT8 = 256.0           # coarser grid for the exact cosine test
_SEM_MAX_CLUSTER = 4096  # all-pairs cap per cluster (star+chain above)


def _quantize8(mat: np.ndarray, coef: int = 100) -> np.ndarray:
    """Quantize to the 2^8 grid and REJECT inputs whose magnitude x
    dimension combination could overflow int64 in the pair test: with
    M = max |q8| and d = dim, |dot| and |norm| are <= d*M^2, so the
    largest product formed is coef * (d*M^2)^2 — require it < 2^63.
    (A fixed |q8| <= 1024 bound only suffices for d <= ~290; 768-dim
    embeddings near that bound would silently wrap.)"""
    q = np.floor(mat.astype(np.float64) * QUANT8 + 0.5).astype(np.int64)
    if len(q):
        m = int(np.abs(q).max())
        d = q.shape[1]
        if coef * (d * m * m) ** 2 >= 2 ** 63:
            raise ValueError(
                "embedding magnitude x dimension exceeds the exact-cosine "
                f"int64 bound (max|q8|={m}, dim={d}, coef={coef}); "
                "rescale inputs or use a coarser grid")
    return q


def _sem_pair_group(group: pa.Table, num_sq: int, den_sq: int
                    ) -> pa.Table:
    """One cluster: emit (vec_a, vec_b, dot) for every pair whose exact
    cosine passes  cos >= sqrt(num_sq/den_sq), tested entirely in int64:
    dot > 0 AND den_sq * dot^2 >= num_sq * |a|^2 * |b|^2. The
    ``_quantize8`` magnitude-x-dimension check guarantees every product
    here stays below 2^63 (no silent int64 wrap). Clusters
    above _SEM_MAX_CLUSTER docs fall back to star+chain pairs (same
    logged recall caveat as dedup._segment_pairs)."""
    ids = group.column("vec_id").to_numpy().astype(np.int64)
    n = len(ids)
    empty = pa.table({"vec_a": pa.array([], pa.int64()),
                      "vec_b": pa.array([], pa.int64()),
                      "dot": pa.array([], pa.int64())})
    if n < 2:
        return empty
    q = np.stack([np.frombuffer(b, np.int64)
                  for b in group.column("q8").to_pylist()])
    order = np.argsort(ids, kind="stable")
    ids, q = ids[order], q[order]
    if n > _SEM_MAX_CLUSTER:
        from .dedup import _log_segment_cap

        _log_segment_cap("semdedup", n, n * (n - 1) // 2 - (2 * n - 3))
        ii = np.concatenate([np.zeros(n - 1, np.int64),
                             np.arange(1, n - 1, dtype=np.int64)])
        jj = np.concatenate([np.arange(1, n, dtype=np.int64),
                             np.arange(2, n, dtype=np.int64)])
    else:
        ii, jj = np.triu_indices(n, k=1)
    dots = np.einsum("ij,ij->i", q[ii], q[jj])
    norms = np.einsum("ij,ij->i", q, q)
    keep = (dots > 0) & (den_sq * dots * dots
                         >= num_sq * norms[ii] * norms[jj])
    return pa.table({
        "vec_a": pa.array(ids[ii[keep]]),
        "vec_b": pa.array(ids[jj[keep]]),
        "dot": pa.array(dots[keep].astype(np.int64)),
    })


def semdedup_pairs(ds, k: int = 8, iters: int = 4,
                   num_sq: int = 81, den_sq: int = 100,
                   collect: bool = True):
    """SemDeDup (Abbas et al. 2023, public paper): semantic near-dup
    pairs found by clustering embeddings (the quantized exact k-means
    above) and testing exact cosine ONLY within clusters — the
    cluster blocking that makes web-scale semantic dedup tractable
    (all-pairs over 10^12 vectors is impossible; within-cluster pairs
    are k-fold fewer). Default threshold cos >= 0.9 (num_sq/den_sq =
    81/100), tested in exact integer arithmetic on the 2^8 grid so the
    SQL oracle (k-means CTE chain + HUGEINT pair test) matches
    bit-for-bit. BLOCKING CAVEAT (inherent to SemDeDup, not this
    implementation): a cross-cluster near-dup pair is out of scope by
    definition — the operator's contract is within-cluster pairs, and
    the oracle checks exactly that contract.

    One exchange: the assignment pass emits (cluster, vec_id, q8) and
    the per-cluster pair scan runs inside ``groupby(cluster)``."""
    import ray

    cents = ray.put(kmeans_centroids(ds, k, iters))

    def tag(batch: pa.Table) -> pa.Table:
        vids, mat = _batch_matrix(batch)
        if len(vids) == 0:
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "q8": pa.array([], pa.large_binary())})
        a = _assign(_quantize(mat), ray.get(cents))
        q8 = _quantize8(mat, coef=max(num_sq, den_sq))
        return pa.table({
            "cluster": pa.array(a),
            "vec_id": pa.array(vids),
            "q8": pa.array([row.tobytes() for row in q8],
                           pa.large_binary()),
        })

    pairs = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("cluster").map_groups(
            partial(_sem_pair_group, num_sq=num_sq, den_sq=den_sq),
            batch_format="pyarrow")
    if not collect:
        return pairs
    from .equijoin import collect_arrow

    t = collect_arrow(pairs, pa.schema([
        ("vec_a", pa.int64()), ("vec_b", pa.int64()),
        ("dot", pa.int64())]))
    return t.sort_by([("vec_a", "ascending"), ("vec_b", "ascending")])
