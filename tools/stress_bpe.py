"""Scale stress for the trained-BPE operator (pipelines/bpe.py).

Proves the three scale claims at >= 1M docs:
  1. the counting pass streams (driver RSS flat vs corpus size — the
     only corpus-scale pass);
  2. training state is vocabulary-bounded (top_words histogram rows on
     the driver, regardless of corpus rows);
  3. the actor-pool encode's distinct-token cache makes throughput
     track DISTINCT pre-tokens, not occurrences (Zipf corpus).

Usage:  python tools/stress_bpe.py [--docs 1000000] [--cpus 32]
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


def corpus_ds(n_docs: int, block_rows: int = 65536):
    """Deterministic Zipf-vocab docs, ~60 tokens/doc, generated
    block-parallel inside Ray tasks (nothing corpus-scale on the
    driver)."""
    import ray.data

    def block(b: pa.Table) -> pa.Table:
        starts = b.column("start").to_numpy()
        out_id, out_tx = [], []
        vocab = np.array([f"tok{i}" for i in range(30000)])
        for s in starts:
            n = min(block_rows, n_docs - s)
            rng = np.random.Generator(np.random.PCG64(99 + s))
            idx = (rng.random((n, 60)) ** 3 * len(vocab)).astype(np.int64)
            words = vocab[idx]
            texts = [" ".join(row) for row in words]
            out_id.append(np.arange(s, s + n, dtype=np.int64))
            out_tx.extend(texts)
        return pa.table({"doc_id": pa.array(np.concatenate(out_id)),
                         "text": pa.array(out_tx, pa.string())})

    starts = list(range(0, n_docs, block_rows))
    seed = ray.data.from_arrow(
        pa.table({"start": pa.array(starts, pa.int64())}))
    return seed.repartition(len(starts)).map_batches(
        block, batch_format="pyarrow")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--merges", type=int, default=2048)
    ap.add_argument("--top-words", type=int, default=65536)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False)
    from ray.data.aggregate import Sum

    from markdown_query_ray.pipelines.bpe import bpe_encode, bpe_train

    ds = corpus_ds(args.docs).materialize()  # pin input so train+encode
    # timings exclude generation
    t0 = time.perf_counter()
    model = bpe_train(ds, n_merges=args.merges, top_words=args.top_words)
    t1 = time.perf_counter()
    enc = bpe_encode(ds, model, concurrency=(1, args.cpus))
    agg = enc.aggregate(Sum("n_tokens", alias_name="total"))
    t2 = time.perf_counter()
    import shutil
    import tempfile

    from markdown_query_ray.pipelines.bpe import bpe_pack_shards

    shard_dir = tempfile.mkdtemp(prefix="bpe_shards_")
    man = bpe_pack_shards(ds, model, shard_dir, seq_len=1024,
                          seqs_per_shard=16384,
                          concurrency=(1, args.cpus))
    t3 = time.perf_counter()
    n_seqs = sum(man.column("n_seqs").to_pylist())
    shutil.rmtree(shard_dir, ignore_errors=True)
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"docs={args.docs} merges_learned={len(model.merges)} "
          f"train={t1-t0:.1f}s encode={t2-t1:.1f}s "
          f"encode_docs_per_s={args.docs/(t2-t1):,.0f} "
          f"total_tokens={agg['total']:,} "
          f"pack={t3-t2:.1f}s shards={man.num_rows} seqs={n_seqs:,} "
          f"pack_tokens_per_s={int(agg['total'])/(t3-t2):,.0f} "
          f"driver_maxrss={rss_gb:.2f}GB")
    ray.shutdown()


if __name__ == "__main__":
    main()
