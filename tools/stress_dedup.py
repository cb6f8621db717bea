"""Driver-memory stress for the dedup family (VERDICT r2 items 1-2).

Reproduces the round-2 200k-doc high-dup MinHash stress (4 x 10k-identical
clusters + 160k distinct docs) and reports wall time plus driver maxRSS —
the point is that NOTHING corpus- or candidate-scale lands on the driver:
texts route through the jkey shuffle semi-join, pair verification runs in
``groupby(vbucket).map_groups``, and the only driver state is the
fixed-size candidate Bloom filter plus the verified pairs themselves.

Usage:  python tools/stress_dedup.py [--docs 200000] [--clusters 4]
        [--cluster-size 10000] [--mode oph]
"""

from __future__ import annotations

import argparse
import resource
import time

import numpy as np
import pyarrow as pa


def make_corpus(n_docs: int, n_clusters: int, cluster_size: int):
    rng = np.random.Generator(np.random.PCG64(7))
    vocab = np.array([f"w{i}" for i in range(5000)])
    texts: list[str] = []
    for c in range(n_clusters):
        body = " ".join(rng.choice(vocab, size=60).tolist())
        texts.extend([body] * cluster_size)
    for i in range(n_docs - n_clusters * cluster_size):
        texts.append(" ".join(rng.choice(vocab, size=60).tolist()))
    return pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--clusters", type=int, default=4)
    ap.add_argument("--cluster-size", type=int, default=10_000)
    ap.add_argument("--mode", default="oph", choices=["oph", "classic"])
    args = ap.parse_args()

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    from markdown_query_ray.pipelines.dedup import minhash_dedup_pairs

    t = make_corpus(args.docs, args.clusters, args.cluster_size)
    ds = ray.data.from_arrow(t).repartition(64).materialize()
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    t0 = time.time()
    pairs = minhash_dedup_pairs(ds, threshold=0.9, num_hashes=128,
                                bands=16, sig_mode=args.mode)
    wall = time.time() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    # each 10k-cluster contributes star+chain = 2*10k-3 pairs
    per = 2 * args.cluster_size - 3
    print(f"docs={args.docs} mode={args.mode} pairs={pairs.num_rows} "
          f"(expect >= {args.clusters * per} cluster pairs) "
          f"wall={wall:.1f}s driver maxRSS {rss0:.2f}->{rss1:.2f} GB")
    ray.shutdown()


if __name__ == "__main__":
    main()
