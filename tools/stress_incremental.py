"""Driver-memory stress for the substring-dedup + incremental-dedup ops
(round 3, late): a web-shaped corpus with boilerplate shared across many
docs (every doc embeds one of a few hundred header/footer templates), run
through ``dup_span_scrub`` and ``incremental_minhash_pairs``, reporting
wall time and driver maxRSS. The point is that corpus-scale state (window
positions, dup-suspect texts, the base corpus) never lands on the driver:
only the fixed-size Bloom filters and the collected result tables do.

Usage:  python tools/stress_incremental.py [--docs 200000]
        [--templates 256] [--new-frac 0.2]
"""

from __future__ import annotations

import argparse
import resource
import time

import numpy as np
import pyarrow as pa


def make_corpus(n_docs: int, n_templates: int):
    """Every doc = unique body + a shared boilerplate template (the
    RefinedWeb/CC shape dup_span_scrub exists for)."""
    rng = np.random.Generator(np.random.PCG64(11))
    vocab = np.array([f"w{i}" for i in range(20000)])
    templates = [" ".join(rng.choice(vocab, size=24).tolist())
                 for _ in range(n_templates)]
    texts = []
    for i in range(n_docs):
        body = " ".join(rng.choice(vocab, size=48).tolist())
        texts.append(templates[i % n_templates] + " " + body)
    return pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--templates", type=int, default=256)
    ap.add_argument("--new-frac", type=float, default=0.2)
    args = ap.parse_args()

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    from markdown_query_ray.pipelines.dedup import (
        dup_span_scrub,
        incremental_minhash_pairs,
    )

    t = make_corpus(args.docs, args.templates)
    ds = ray.data.from_arrow(t).repartition(64).materialize()

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    t0 = time.time()
    scrubbed = dup_span_scrub(ds, w=4, collect=False)
    n_out = scrubbed.count()
    removed = scrubbed.map_batches(
        lambda b: pa.table({"r": pa.array(
            [int(np.sum(b.column("n_removed").to_numpy()))])}),
        batch_format="pyarrow").sum("r")
    wall_scrub = time.time() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"scrub: {args.docs} docs in {wall_scrub:.1f}s "
          f"({args.docs / wall_scrub:,.0f} docs/s), rows out {n_out}, "
          f"tokens removed {removed:,}, "
          f"driver maxRSS {rss0:.2f} -> {rss1:.2f} GB")

    # incremental: the last new_frac of docs against the rest. Boilerplate
    # alone (24 of 72 tokens ~ Jaccard 0.2) stays under the 0.5 threshold;
    # plant exact dups so the expected pair count is known.
    n_new = int(args.docs * args.new_frac)
    split = args.docs - n_new

    def base_half(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return b.filter(pa.array(ids < split))

    def new_half(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return b.filter(pa.array(ids >= split))

    base = ds.map_batches(base_half, batch_format="pyarrow")
    # every 10th new doc is an exact copy of a base doc
    texts = t.column("text").to_pylist()
    planted = 0
    for j in range(split, args.docs, 10):
        texts[j] = texts[j - split]
        planted += 1
    t2 = pa.table({"doc_id": t.column("doc_id"),
                   "text": pa.array(texts, pa.string())})
    ds2 = ray.data.from_arrow(t2).repartition(64).materialize()
    new = ds2.map_batches(new_half, batch_format="pyarrow")
    base2 = ds2.map_batches(base_half, batch_format="pyarrow")

    t0 = time.time()
    pairs = incremental_minhash_pairs(base2, new, threshold=0.5,
                                      num_hashes=128, bands=16,
                                      sig_mode="oph", collect=False)
    n_pairs = pairs.count()
    wall_inc = time.time() - t0
    rss2 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"incremental: {split}+{n_new} docs in {wall_inc:.1f}s "
          f"({args.docs / wall_inc:,.0f} docs/s), verified pairs "
          f"{n_pairs} (planted {planted} exact dups), "
          f"driver maxRSS {rss1:.2f} -> {rss2:.2f} GB")
    ray.shutdown()


if __name__ == "__main__":
    main()
