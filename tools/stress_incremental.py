"""Driver-memory stress for the substring-dedup + incremental-dedup ops
(round 3, late): a web-shaped corpus with boilerplate shared across many
docs (every doc embeds one of a few hundred header/footer templates), run
through ``dup_span_scrub`` and ``incremental_minhash_pairs``, reporting
wall time and driver maxRSS. The corpus is generated DISTRIBUTED as a
pure function of doc_id (no driver-side text ever exists), so the RSS
numbers measure the pipelines alone: corpus-scale state (window
positions, dup-suspect texts, the base corpus) must never land on the
driver — only the fixed-size Bloom filters and the collected result
tables do.

Usage:  python tools/stress_incremental.py [--docs 200000]
        [--templates 256] [--new-frac 0.2]
"""

from __future__ import annotations

import argparse
import os
import resource
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_TEMPLATES = 256
TEMPLATE_TOKENS = 24
BODY_TOKENS = 48
VOCAB = 20000


def _template(t: int) -> str:
    rng = np.random.Generator(np.random.PCG64(10_000_000 + t))
    return " ".join(f"w{i}" for i in
                    rng.integers(0, VOCAB, TEMPLATE_TOKENS))


def _text_of(doc_id: int, split: int) -> str:
    """Deterministic text: boilerplate template + unique body. New-side
    docs (>= split) at (doc_id - split) % 10 == 0 are exact copies of
    base doc (doc_id - split) — the planted incremental dups."""
    if doc_id >= split and (doc_id - split) % 10 == 0:
        return _text_of(doc_id - split, split)
    rng = np.random.Generator(np.random.PCG64(doc_id))
    body = " ".join(f"w{i}" for i in rng.integers(0, VOCAB, BODY_TOKENS))
    return _template(doc_id % N_TEMPLATES) + " " + body


class GenStage:
    """Distributed corpus generator (templates built once per actor)."""

    def __init__(self, split: int):
        self.split = split
        self.templates = [_template(t) for t in range(N_TEMPLATES)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy().astype(np.int64)
        texts = []
        for i in ids.tolist():
            src = i
            if i >= self.split and (i - self.split) % 10 == 0:
                src = i - self.split
            rng = np.random.Generator(np.random.PCG64(src))
            body = " ".join(
                f"w{j}" for j in rng.integers(0, VOCAB, BODY_TOKENS))
            texts.append(self.templates[src % N_TEMPLATES] + " " + body)
        return pa.table({"doc_id": pa.array(ids),
                         "text": pa.array(texts, pa.string())})


def refresh_stress(base_docs: int, new_docs: int) -> None:
    """Multi-generation refresh measurement (round-5 verdict item 7):
    with the base-signature checkpoint, refresh #2's wall time must be
    dominated by the NEW batch (+ the appended delta), not the
    accumulated base size — the checkpoint turns the base-side
    signature pass into a pruned parquet scan and the append path
    signatures only the growth. Reported side by side with a no-
    checkpoint control refresh #2 that re-signatures the whole base."""
    import shutil
    import tempfile

    import ray
    import ray.data

    from markdown_query_ray.pipelines.dedup import incremental_minhash_pairs

    B, K = base_docs, new_docs
    total = B + 2 * K
    ds = ray.data.range(total, override_num_blocks=64).map_batches(
        GenStage, fn_constructor_args=(B,), batch_format="pyarrow",
        concurrency=(1, 8)).materialize()

    def rng_filter(lo, hi):
        def f(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy()
            return b.filter(pa.array((ids >= lo) & (ids < hi)))
        return f

    base1 = ds.map_batches(rng_filter(0, B), batch_format="pyarrow")
    new1 = ds.map_batches(rng_filter(B, B + K), batch_format="pyarrow")
    base2 = ds.map_batches(rng_filter(0, B + K), batch_format="pyarrow")
    new2 = ds.map_batches(rng_filter(B + K, total),
                          batch_format="pyarrow")

    ck = tempfile.mkdtemp(prefix="refresh-sigck-")
    # classic signature mode: the expensive-signature regime the
    # checkpoint targets (OPH signatures are so cheap that fixed
    # pipeline costs dominate at stress scale and mask the effect)
    kw = dict(threshold=0.5, num_hashes=128, bands=16,
              sig_mode="classic", collect=False)

    t0 = time.time()
    p1 = incremental_minhash_pairs(base1, new1, base_sigs_dir=ck, **kw)
    n1 = p1.count()
    t1 = time.time() - t0

    t0 = time.time()
    p2 = incremental_minhash_pairs(base2, new2, base_sigs_dir=ck, **kw)
    n2 = p2.count()
    t2 = time.time() - t0

    t0 = time.time()
    p2c = incremental_minhash_pairs(base2, new2, **kw)  # control: live
    n2c = p2c.count()
    t2c = time.time() - t0
    shutil.rmtree(ck, ignore_errors=True)

    print(f"refresh #1 (base {B:,}, new {K:,}, cold checkpoint): "
          f"{t1:.1f}s, pairs {n1}")
    print(f"refresh #2 (base {B + K:,} grown, new {K:,}, checkpoint + "
          f"append): {t2:.1f}s, pairs {n2}")
    print(f"refresh #2 control (no checkpoint, full re-signature): "
          f"{t2c:.1f}s, pairs {n2c}")
    print(f"checkpoint speedup on refresh #2: {t2c / t2:.2f}x; "
          f"refresh#2/refresh#1 = {t2 / t1:.2f} "
          f"(new+delta = {2 * K:,} of {B + 2 * K:,} docs signatured)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--new-frac", type=float, default=0.2)
    ap.add_argument("--refresh", action="store_true",
                    help="multi-generation refresh measurement")
    ap.add_argument("--base-docs", type=int, default=200_000)
    ap.add_argument("--new-docs", type=int, default=25_000)
    ap.add_argument("--body-tokens", type=int, default=None,
                    help="override BODY_TOKENS (web pages are ~300-800 tokens; the default 48 keeps the legacy RSS stress cheap)")
    args = ap.parse_args()
    if args.body_tokens:
        global BODY_TOKENS
        BODY_TOKENS = args.body_tokens

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    if args.refresh:
        refresh_stress(args.base_docs, args.new_docs)
        ray.shutdown()
        return
    from markdown_query_ray.pipelines.dedup import (
        dup_span_scrub,
        incremental_minhash_pairs,
    )

    n_new = int(args.docs * args.new_frac)
    split = args.docs - n_new
    ds = ray.data.range(args.docs, override_num_blocks=64).map_batches(
        GenStage, fn_constructor_args=(split,), batch_format="pyarrow",
        concurrency=(1, 8)).materialize()

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

    # incremental: the last new_frac of docs against the rest.
    # Boilerplate alone (24 of 72 tokens ~ Jaccard 0.2) stays under the
    # 0.5 threshold; every 10th new doc is an exact base copy (planted).
    def base_half(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return b.filter(pa.array(ids < split))

    def new_half(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return b.filter(pa.array(ids >= split))

    base = ds.map_batches(base_half, batch_format="pyarrow")
    new = ds.map_batches(new_half, batch_format="pyarrow")

    t0 = time.time()
    pairs = incremental_minhash_pairs(base, new, threshold=0.5,
                                      num_hashes=128, bands=16,
                                      sig_mode="oph", collect=False)
    n_pairs = pairs.count()
    wall_inc = time.time() - t0
    rss2 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"incremental: {split}+{n_new} docs in {wall_inc:.1f}s "
          f"({args.docs / wall_inc:,.0f} docs/s), verified pairs "
          f"{n_pairs} (planted {(n_new + 9) // 10} exact dups), "
          f"driver maxRSS {rss1:.2f} -> {rss2:.2f} GB")
    ray.shutdown()


if __name__ == "__main__":
    main()
