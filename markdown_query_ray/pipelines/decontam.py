"""Benchmark decontamination: n-gram overlap against an eval suite.

Training corpora must not contain the benchmarks they are evaluated on;
the standard defense (GPT-3 appendix C, PaLM, Llama) flags every corpus
document whose token-n-gram overlap with the benchmark suite exceeds a
threshold. This module implements that as a broadcast-small-side scan:

- the benchmark suite is SMALL by construction (eval sets are MBs even
  when the corpus is 100 TB), so its distinct shingle-hash set is reduced
  map-side (unique per batch), unioned once, sorted, and published with
  ``ray.put`` — read once per map task, never re-shipped per batch;
- the corpus side is ONE zero-shuffle ``map_batches`` pass that counts,
  per document, how many of its distinct shingles are in the benchmark
  set via a vectorized ``np.searchsorted`` membership probe.

If a benchmark set ever outgrew the broadcast budget, the Bloom-gated
shuffle semi-join used by ``minhash_dedup_pairs`` (dedup.py) is the
fallback shape; at real benchmark sizes the broadcast is strictly better
(no shuffle, no second pass over the corpus).

Shingling is ``dedup.shingle_hashes`` (w-token windows, FNV-1a64 token
and window hashes, whole-doc window for docs shorter than w) so the
DuckDB oracle can re-derive the identical shingle SETS from strings —
set membership counts are invariant under the hash mapping.

The contamination test is kept in exact integer arithmetic so Python and
SQL agree bit-for-bit: a doc with ``n`` distinct shingles and ``o`` of
them in the benchmark set is contaminated iff
``o * den >= n * num`` (threshold fraction num/den), and never when
``n == 0``.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

DEFAULT_W = 3
# threshold fraction num/den = 10% of a doc's distinct shingles
DEFAULT_NUM, DEFAULT_DEN = 1, 10


def _batch_unique_shingles(batch: pa.Table, w: int,
                           text_col: str) -> pa.Table:
    """Map-side reduction of the benchmark side: distinct shingle hashes
    of this batch only (one small uint64 column out per batch)."""
    from .dedup import shingle_hashes

    texts = batch.column(text_col).to_pylist()
    if not texts:
        return pa.table({"h": pa.array([], pa.uint64())})
    hs = np.unique(np.concatenate(
        [shingle_hashes(t, w) for t in texts] or
        [np.empty(0, np.uint64)]))
    return pa.table({"h": pa.array(hs, pa.uint64())})


def benchmark_shingle_set(bench_ds, w: int = DEFAULT_W,
                          text_col: str = "text") -> np.ndarray:
    """Sorted distinct shingle hashes of the benchmark Dataset.

    Each task emits only its batch-unique hashes; the driver unions the
    already-deduplicated partials (bounded by the benchmark vocabulary,
    not the corpus)."""
    parts = bench_ds.map_batches(
        partial(_batch_unique_shingles, w=w, text_col=text_col),
        batch_format="pyarrow")
    arrs = [b.column("h").to_numpy()
            for b in parts.iter_batches(batch_format="pyarrow")]
    if not arrs:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(arrs))


class ContaminationStage:
    """Actor-pool stage: per-doc benchmark-overlap counts.

    The sorted benchmark hash array is fetched from the object store once
    per actor in ``__init__`` (zero-copy numpy view); ``__call__`` probes
    it with one ``searchsorted`` per document."""

    def __init__(self, bench_ref, w: int = DEFAULT_W,
                 num: int = DEFAULT_NUM, den: int = DEFAULT_DEN,
                 text_col: str = "text", id_col: str = "doc_id"):
        import ray

        self.bench = ray.get(bench_ref) if not isinstance(
            bench_ref, np.ndarray) else bench_ref
        self.w, self.num, self.den = w, num, den
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import shingle_hashes

        texts = batch.column(self.text_col).to_pylist()
        n_sh = np.zeros(len(texts), np.int64)
        n_ov = np.zeros(len(texts), np.int64)
        bench = self.bench
        for i, t in enumerate(texts):
            sh = np.unique(shingle_hashes(t, self.w))
            n_sh[i] = len(sh)
            if len(sh) and len(bench):
                pos = np.searchsorted(bench, sh)
                pos[pos == len(bench)] = 0
                n_ov[i] = int(np.count_nonzero(bench[pos] == sh))
        contaminated = ((n_sh > 0)
                        & (n_ov * self.den >= n_sh * self.num)).astype(
                            np.int64)
        return pa.table({
            self.id_col: batch.column(self.id_col).cast(pa.int64()),
            "n_shingles": pa.array(n_sh),
            "n_overlap": pa.array(n_ov),
            "contaminated": pa.array(contaminated),
        })


def contamination_flags(corpus_ds, bench_ds, w: int = DEFAULT_W,
                        num: int = DEFAULT_NUM, den: int = DEFAULT_DEN,
                        concurrency=(1, 8),
                        text_col: str = "text", id_col: str = "doc_id"):
    """Dataset of (doc_id, n_shingles, n_overlap, contaminated) for every
    corpus doc; contaminated = 1 iff distinct-shingle overlap with the
    benchmark suite is >= num/den of the doc's distinct shingles."""
    import ray

    bench_ref = ray.put(benchmark_shingle_set(bench_ds, w,
                                              text_col=text_col))
    return corpus_ds.map_batches(
        ContaminationStage,
        fn_constructor_kwargs=dict(bench_ref=bench_ref, w=w, num=num,
                                   den=den, text_col=text_col,
                                   id_col=id_col),
        concurrency=concurrency, batch_format="pyarrow")
