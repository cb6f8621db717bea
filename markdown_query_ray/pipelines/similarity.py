"""Similarity search over an embedding column (list<float>).

- ``knn_bruteforce``: exact cosine top-k — one numpy matmul per batch against
  a broadcast query matrix (``ray.put`` once, read in every task), per-batch
  partial top-k, driver merge. The baseline and the oracle.
- ``lsh_ann``: random-hyperplane LSH buckets -> candidate set -> exact
  rerank. The scale path: the bucketing is a map-side hash, the rerank only
  touches candidate buckets.
- ``ivf_ann``: IVF with a deterministic k-means-lite coarse quantizer;
  probes ``nprobe`` nearest centroids.
- ``cosine_neardup_pairs``: embedding-cosine near-duplicate detection — all
  (a, b) pairs with cosine >= threshold. Block-row x broadcast-matrix matmul
  per batch (each task compares its rows against the full set read once from
  the object store); output is only the above-threshold pairs, so the
  quadratic part never materializes.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

from .dedup import _cat


def _to_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (zero-copy-ish)."""
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _cosine(queries: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """(q, n) cosine similarities as dot/(|a|*|b|) — the same formula shape
    DuckDB's list_cosine_similarity uses, so oracle comparisons agree to the
    rounding digit. Zero vectors get similarity 0."""
    qn = np.linalg.norm(queries, axis=1)[:, None]
    mn = np.linalg.norm(mat, axis=1)[None, :]
    denom = qn * mn
    denom[denom == 0] = 1.0
    return (queries @ mat.T) / denom


class _BruteForceScore:
    """map_batches body: broadcast query matrix via ray.put (fetched once per
    task from the object store, zero-copy)."""

    def __init__(self, queries_ref, k: int):
        self.queries_ref = queries_ref
        self.k = k
        self._queries = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._queries is None:
            self._queries = ray.get(self.queries_ref)
        sims = _cosine(self._queries, _to_matrix(batch.column("embedding")))
        vec_ids = batch.column("vec_id").to_numpy()
        out_q, out_v, out_s = [], [], []
        k = min(self.k, sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            # full (sim desc, vec_id asc) sort before the cut: argpartition
            # on sim alone would drop the wrong member of a tie that
            # straddles k, permanently (each vector lives in ONE batch)
            order = np.lexsort((vec_ids, -row))[:k]
            out_q.extend([qi] * len(order))
            out_v.extend(vec_ids[order].tolist())
            out_s.extend(row[order].tolist())
        return pa.table({
            "query_idx": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })


def _partial_topk_batch(batch: pa.Table, k: int) -> pa.Table:
    """Per-query top-k WITHIN one batch of (query_idx, vec_id, sim) partials
    — the tree-reduce combiner. Vectorized: one lexsort groups by query and
    orders by (sim desc, vec_id asc), then each query segment's first k rows
    are kept."""
    if batch.num_rows == 0:
        return batch
    q = batch.column("query_idx").to_numpy()
    v = batch.column("vec_id").to_numpy()
    s = batch.column("sim").to_numpy()
    order = np.lexsort((v, -s, q))
    q_s = q[order]
    seg_start = np.ones(len(q_s), bool)
    seg_start[1:] = q_s[1:] != q_s[:-1]
    # rank within each query segment = position - segment start position
    pos = np.arange(len(q_s))
    rank_in_seg = pos - np.maximum.accumulate(np.where(seg_start, pos, 0))
    keep = order[rank_in_seg < k]
    return batch.take(pa.array(np.sort(keep)))


def _merge_topk_partials(partials, k: int) -> pa.Table:
    """(query_idx, vec_id, sim) partials -> final per-query top-k table
    (query_idx, rank, vec_id, sim), ties broken by vec_id asc.

    Scale shape: one shuffle-free tree-reduce level (``map_batches`` with a
    large batch_size coalesces many per-task partial blocks and re-applies
    the per-query top-k, shrinking the stream ~batch/(q*k)-fold), then the
    driver folds the remainder through the same combiner while STREAMING
    ``iter_batches`` — never a full ``to_pandas`` of the partials."""
    reduced = partials.map_batches(partial(_partial_topk_batch, k=k),
                                   batch_format="pyarrow", batch_size=65536)
    acc: pa.Table | None = None
    for b in reduced.iter_batches(batch_size=65536, batch_format="pyarrow"):
        acc = b if acc is None else _partial_topk_batch(
            pa.concat_tables([acc, b]), k)
    if acc is None or acc.num_rows == 0:
        return pa.table({
            "query_idx": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        })
    q = acc.column("query_idx").to_numpy()
    v = acc.column("vec_id").to_numpy()
    s = acc.column("sim").to_numpy()
    order = np.lexsort((v, -s, q))
    q_s = q[order]
    pos = np.arange(len(q_s))
    seg_start = np.ones(len(q_s), bool)
    seg_start[1:] = q_s[1:] != q_s[:-1]
    rank = pos - np.maximum.accumulate(np.where(seg_start, pos, 0))
    sel = rank < k
    return pa.table({
        "query_idx": pa.array(q_s[sel], pa.int64()),
        "rank": pa.array(rank[sel] + 1, pa.int64()),
        "vec_id": pa.array(v[order][sel], pa.int64()),
        "sim": pa.array(s[order][sel], pa.float64()),
    })


def knn_bruteforce(ds, queries: np.ndarray, k: int = 10) -> pa.Table:
    """Exact cosine top-k for each query row. Returns
    (query_idx, rank, vec_id, sim) with ties broken by vec_id asc."""
    import ray

    qref = ray.put(np.asarray(queries, np.float64))
    partials = ds.map_batches(_BruteForceScore(qref, k),
                              batch_format="pyarrow", batch_size=8192)
    return _merge_topk_partials(partials, k)


class LshBucketStage:
    """Random-hyperplane signatures per vector: standard MULTI-TABLE LSH —
    L independent tables of b planes each (one weak hash alone has poor
    recall when neighbors are near-orthogonal; the union of L tables'
    bucket matches recovers it, the same banding trick MinHash uses).
    Emits one row per (vector, table)."""

    def __init__(self, dim: int, n_planes: int = 5, n_tables: int = 12,
                 seed: int = 11):
        # scale rule: n_planes ~ log2(n_vectors / target_bucket_size);
        # defaults tuned for the sf-scale test tables (recall@10 ~ 0.7 vs
        # brute force, tests/test_similarity_quality.py)
        rng = np.random.Generator(np.random.PCG64(seed))
        self.planes = rng.standard_normal((n_tables, n_planes, dim))
        self.n_planes = n_planes
        self.n_tables = n_tables

    def signatures(self, mat: np.ndarray) -> np.ndarray:
        """(n, n_tables) int signatures."""
        sigs = np.zeros((len(mat), self.n_tables), np.int64)
        for t in range(self.n_tables):
            bits = (mat @ self.planes[t].T) > 0
            for i in range(self.n_planes):
                sigs[:, t] |= bits[:, i].astype(np.int64) << i
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch.column("embedding"))
        sigs = self.signatures(mat)
        n, L = sigs.shape
        return pa.table({
            "vec_id": pa.array(np.repeat(
                batch.column("vec_id").to_numpy(), L), pa.int64()),
            "table": pa.array(np.tile(np.arange(L, dtype=np.int64), n)),
            "bucket": pa.array(sigs.ravel(), pa.int64()),
        })


class _LshCandidateScore:
    """Distributed LSH candidate+rerank stage: each task recreates the plane
    set from the seed (cheap, deterministic), signatures its OWN batch,
    matches against the broadcast per-query probe-bucket lookup, and exactly
    scores only the matched (query, vector) pairs — emitting per-batch
    per-query top-k partials. ONE streaming pass over the corpus; neither
    the bucket table nor the embeddings ever materialize on the driver."""

    def __init__(self, dim: int, n_planes: int, n_tables: int, seed: int,
                 queries_ref, member_ref, k: int):
        self.stage = LshBucketStage(dim, n_planes, n_tables, seed)
        self.queries_ref = queries_ref
        self.member_ref = member_ref
        self.k = k
        self._queries = self._member = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._queries is None:
            self._queries = ray.get(self.queries_ref)
            self._member = ray.get(self.member_ref)
        mat = _to_matrix(batch.column("embedding"))
        vec_ids = batch.column("vec_id").to_numpy()
        out_q: list[np.ndarray] = []
        out_v: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        if len(mat):
            sigs = self.stage.signatures(mat)  # (n, n_tables)
            # matched[qi, row] = any table where row's bucket is probed by qi
            matched = np.zeros((len(self._queries), len(mat)), bool)
            for t in range(sigs.shape[1]):
                matched |= self._member[t][:, sigs[:, t]]
            for qi in range(len(self._queries)):
                rows = np.nonzero(matched[qi])[0]
                if not len(rows):
                    continue
                sims = _cosine(self._queries[qi:qi + 1], mat[rows])[0]
                # full sort before the cut: ties at k must break vec_id-asc
                order = np.lexsort((vec_ids[rows], -sims))[:self.k]
                out_q.append(np.full(len(order), qi, np.int64))
                out_v.append(vec_ids[rows][order].astype(np.int64))
                out_s.append(sims[order])
        return pa.table({
            "query_idx": pa.array(_cat(out_q, np.int64), pa.int64()),
            "vec_id": pa.array(_cat(out_v, np.int64), pa.int64()),
            "sim": pa.array(_cat(out_s, np.float64), pa.float64()),
        })


def lsh_ann(ds, queries: np.ndarray, k: int = 10, n_planes: int = 5,
            n_tables: int = 12, seed: int = 11,
            multiprobe: int = 0) -> pa.Table:
    """ANN via multi-table hyperplane LSH: candidates = union over tables of
    the query's bucket (plus Hamming-``multiprobe`` neighbor buckets),
    exact cosine rerank. Returns (query_idx, rank, vec_id, sim).

    Scale shape: the per-query probe buckets are a tiny
    (n_tables, n_queries, 2^n_planes) boolean lookup broadcast once via
    ``ray.put``; candidate matching AND the exact rerank both run inside
    ``map_batches`` (one pass over the corpus), then the standard top-k
    partial merge. Nothing corpus-sized touches the driver."""
    import ray

    if n_planes > 16:
        raise ValueError("probe lookup table needs n_planes <= 16")
    queries = np.asarray(queries, np.float64)
    dim = queries.shape[1]
    stage = LshBucketStage(dim, n_planes, n_tables, seed)
    qsigs = stage.signatures(queries)
    nq = len(queries)
    member = np.zeros((n_tables, nq, 1 << n_planes), bool)
    for qi in range(nq):
        for t in range(n_tables):
            sig = int(qsigs[qi, t])
            member[t, qi, sig] = True
            if multiprobe >= 1:
                for j in range(n_planes):
                    member[t, qi, sig ^ (1 << j)] = True
    partials = ds.map_batches(
        _LshCandidateScore(dim, n_planes, n_tables, seed,
                           ray.put(queries), ray.put(member), k),
        batch_format="pyarrow", batch_size=8192)
    return _merge_topk_partials(partials, k)


class _NearDupStage:
    """map_batches body: each task compares its batch rows against the full
    broadcast matrix and keeps pairs (a < b, sim >= threshold). The broadcast
    is ``ray.put`` once and fetched once per actor (zero-copy plasma read),
    NOT re-shipped per batch."""

    def __init__(self, mat_ref, ids_ref, threshold: float):
        self.mat_ref = mat_ref
        self.ids_ref = ids_ref
        self.threshold = threshold
        self._mat = self._ids = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._mat is None:
            self._mat = ray.get(self.mat_ref)
            self._ids = ray.get(self.ids_ref)
        rows = _to_matrix(batch.column("embedding"))
        row_ids = batch.column("vec_id").to_numpy()
        sims = _cosine(rows, self._mat)
        # keep upper triangle only (a < b): dedups across batches too
        keep = (sims >= self.threshold) & (row_ids[:, None] < self._ids[None, :])
        ai, bj = np.nonzero(keep)
        return pa.table({
            "vec_a": pa.array(row_ids[ai], pa.int64()),
            "vec_b": pa.array(self._ids[bj], pa.int64()),
            "sim": pa.array(sims[ai, bj], pa.float64()),
        })


def cosine_neardup_pairs(ds, threshold: float = 0.9,
                         batch_size: int = 4096) -> pa.Table:
    """All embedding pairs with cosine similarity >= threshold (vec_a <
    vec_b), sorted. Exact: every pair is scored via one matmul per batch.
    At 10^12-row scale the broadcast side would shard by LSH bucket first
    (see ``lsh_ann``); the brute pairing is the correctness baseline and
    fine while the matrix fits the object store."""
    import ray

    full = ds.to_pandas()
    mat = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    ids = full["vec_id"].to_numpy().astype(np.int64)
    mat_ref = ray.put(mat)
    ids_ref = ray.put(ids)
    pairs = ds.map_batches(
        _NearDupStage(mat_ref, ids_ref, threshold),
        batch_format="pyarrow", batch_size=batch_size)
    t = pa.Table.from_pandas(pairs.to_pandas(), preserve_index=False)
    return t.sort_by([("vec_a", "ascending"), ("vec_b", "ascending")])


_NEARDUP_BUCKETS = 64  # shuffle-coarsening groups for the LSH-pair groupby


class _NearDupBucketStage:
    """Emit one row per (vector, table): (bucket, table, sig, vec_id,
    embedding). Equal (table, sig) rows land in the same coarse shuffle
    bucket; embeddings ride the shuffle so the pair scan needs no second
    corpus pass."""

    def __init__(self, dim: int, n_planes: int, n_tables: int, seed: int):
        self.stage = LshBucketStage(dim, n_planes, n_tables, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..pipelines.dedup import _fnv1a_u64_rows

        mat = _to_matrix(batch.column("embedding"))
        n = len(mat)
        L = self.stage.n_tables
        if n == 0:
            return pa.table({
                "bucket": pa.array([], pa.int32()),
                "table": pa.array([], pa.int32()),
                "sig": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], batch.schema.field("embedding").type),
            })
        sigs = self.stage.signatures(mat)  # (n, L)
        tables = np.tile(np.arange(L, dtype=np.uint64), n)
        flat_sigs = sigs.astype(np.uint64).ravel()
        bh = _fnv1a_u64_rows(np.stack([tables, flat_sigs], axis=1))
        take = np.repeat(np.arange(n), L)
        return pa.table({
            "bucket": pa.array((bh % np.uint64(_NEARDUP_BUCKETS))
                               .astype(np.int32)),
            "table": pa.array(tables.astype(np.int32)),
            "sig": pa.array(flat_sigs.astype(np.int64)),
            "vec_id": pa.array(np.repeat(
                batch.column("vec_id").to_numpy().astype(np.int64), L)),
            "embedding": batch.column("embedding").take(pa.array(take)),
        })


def _neardup_bucket_pairs(group: pa.Table, threshold: float) -> pa.Table:
    """Exact pairwise cosine within each (table, sig) segment of one coarse
    bucket; keeps (vec_a < vec_b, sim >= threshold). One lexsort + segment
    scan; each segment's quadratic part is a small local matmul."""
    tb = group.column("table").to_numpy()
    sg = group.column("sig").to_numpy()
    ids = group.column("vec_id").to_numpy()
    order = np.lexsort((ids, sg, tb))
    tb_s, sg_s, ids_s = tb[order], sg[order], ids[order]
    mat = _to_matrix(group.column("embedding"))[order]
    n = len(ids_s)
    change = np.ones(n, bool)
    change[1:] = (tb_s[1:] != tb_s[:-1]) | (sg_s[1:] != sg_s[:-1])
    starts = np.nonzero(change)[0]
    ends = np.append(starts[1:], n)
    from .dedup import _segment_pairs

    pa_, pb_, ps_ = [], [], []
    for a, b in _segment_pairs(ids_s, starts, ends, "cosine_neardup_lsh"):
        # row-pair cosine (not a full segment matrix): stays O(pairs)
        # even when the star cap kicks in on a giant segment
        num = np.einsum("ij,ij->i", mat[a], mat[b])
        den = (np.linalg.norm(mat[a], axis=1)
               * np.linalg.norm(mat[b], axis=1))
        den[den == 0] = 1.0
        sims = num / den
        keep = sims >= threshold
        # ids_s ascending within the segment => a < b holds
        pa_.append(ids_s[a[keep]])
        pb_.append(ids_s[b[keep]])
        ps_.append(sims[keep])
    return pa.table({
        "vec_a": pa.array(_cat(pa_, np.int64), pa.int64()),
        "vec_b": pa.array(_cat(pb_, np.int64), pa.int64()),
        "sim": pa.array(_cat(ps_, np.float64), pa.float64()),
    })


def cosine_neardup_pairs_lsh(ds, threshold: float = 0.9, n_planes: int = 8,
                             n_tables: int = 8, seed: int = 11) -> pa.Table:
    """The SCALE path for embedding near-dup: approximate pair blocking by
    multi-table hyperplane LSH, exact cosine verify inside each block —
    no full-matrix broadcast, no quadratic scoring.

    Shape: one map_batches emits (table, sig, vec_id, embedding) rows (L
    per vector), a coarse-bucket ``groupby`` co-locates equal signatures
    (the only shuffle, ~L x (8 bytes + one embedding) per vector), and the
    per-group scan does small local matmuls. Only verified pairs reach the
    driver, deduped across tables there. Recall is the standard LSH bound
    1-(1-p^b)^L with p = 1-acos(sim)/pi (>= ~0.95 for sim >= 0.9 at the
    8x8 default); precision is exact because every emitted pair is
    cosine-verified."""
    first = ds.take(1)
    if not first:
        return pa.table({
            "vec_a": pa.array([], pa.int64()),
            "vec_b": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        })
    dim = len(first[0]["embedding"])
    bands = ds.map_batches(_NearDupBucketStage(dim, n_planes, n_tables, seed),
                           batch_format="pyarrow", batch_size=4096)
    pairs = bands.groupby("bucket").map_groups(
        partial(_neardup_bucket_pairs, threshold=threshold),
        batch_format="pyarrow")
    chunks = list(pairs.iter_batches(batch_size=65536,
                                     batch_format="pyarrow"))
    empty = pa.table({
        "vec_a": pa.array([], pa.int64()),
        "vec_b": pa.array([], pa.int64()),
        "sim": pa.array([], pa.float64()),
    })
    t = pa.concat_tables(chunks) if chunks else empty
    if t.num_rows == 0:
        return empty
    a = t.column("vec_a").to_numpy()
    b = t.column("vec_b").to_numpy()
    s = t.column("sim").to_numpy()
    uniq, first_i = np.unique(np.stack([a, b], axis=1), axis=0,
                              return_index=True)
    return pa.table({
        "vec_a": pa.array(uniq[:, 0], pa.int64()),
        "vec_b": pa.array(uniq[:, 1], pa.int64()),
        "sim": pa.array(s[first_i], pa.float64()),
    })


def kmeans_lite(mat: np.ndarray, k: int, iters: int = 5,
                seed: int = 13) -> np.ndarray:
    """Deterministic small k-means (random init from seed, fixed iters) —
    the IVF coarse quantizer."""
    rng = np.random.Generator(np.random.PCG64(seed))
    centroids = mat[rng.choice(len(mat), size=min(k, len(mat)),
                               replace=False)]
    for _ in range(iters):
        d = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(centroids)):
            sel = assign == c
            if sel.any():
                centroids[c] = mat[sel].mean(0)
    return centroids


class _IvfProbeScore:
    """Distributed IVF probe+rerank stage: each task assigns its batch's
    vectors to the nearest broadcast centroid, keeps the (query, vector)
    pairs whose list the query probes, scores them exactly, and emits
    per-batch per-query top-k partials — ONE pass, nothing corpus-sized on
    the driver."""

    def __init__(self, centroids_ref, queries_ref, probe_ref, k: int):
        self.centroids_ref = centroids_ref
        self.queries_ref = queries_ref
        self.probe_ref = probe_ref
        self.k = k
        self._c = self._q = self._probe = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._c is None:
            self._c = ray.get(self.centroids_ref)
            self._q = ray.get(self.queries_ref)
            self._probe = ray.get(self.probe_ref)  # (nq, n_lists) bool
        mat = _to_matrix(batch.column("embedding"))
        vec_ids = batch.column("vec_id").to_numpy()
        out_q: list[np.ndarray] = []
        out_v: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        if len(mat):
            d = ((mat[:, None, :] - self._c[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)
            for qi in range(len(self._q)):
                rows = np.nonzero(self._probe[qi][assign])[0]
                if not len(rows):
                    continue
                sims = _cosine(self._q[qi:qi + 1], mat[rows])[0]
                # full sort before the cut: ties at k must break vec_id-asc
                order = np.lexsort((vec_ids[rows], -sims))[:self.k]
                out_q.append(np.full(len(order), qi, np.int64))
                out_v.append(vec_ids[rows][order].astype(np.int64))
                out_s.append(sims[order])
        return pa.table({
            "query_idx": pa.array(_cat(out_q, np.int64), pa.int64()),
            "vec_id": pa.array(_cat(out_v, np.int64), pa.int64()),
            "sim": pa.array(_cat(out_s, np.float64), pa.float64()),
        })


def ivf_ann(ds, queries: np.ndarray, k: int = 10, n_lists: int = 16,
            nprobe: int = 4, seed: int = 13) -> pa.Table:
    """IVF ANN: coarse k-means partition (trained on a driver-side sample —
    the one deliberately small materialization), probe the ``nprobe``
    nearest lists per query, exact rerank within them.

    Scale shape: centroids + per-query probed-list mask broadcast via
    ``ray.put``; assignment, probing and rerank all happen inside one
    ``map_batches`` pass, then the standard top-k partial merge."""
    import ray

    sample = ds.limit(2048).to_pandas()
    smat = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    centroids = kmeans_lite(smat, n_lists, seed=seed)
    queries = np.asarray(queries, np.float64)
    qd = ((queries[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
    probe = np.zeros((len(queries), len(centroids)), bool)
    for qi in range(len(queries)):
        probe[qi, np.argsort(qd[qi])[:nprobe]] = True
    partials = ds.map_batches(
        _IvfProbeScore(ray.put(centroids), ray.put(queries),
                       ray.put(probe), k),
        batch_format="pyarrow", batch_size=8192)
    return _merge_topk_partials(partials, k)
