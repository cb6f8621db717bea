"""Object-store residency stress for the checkpointed ccnet_buckets path
(VERDICT r3 item 4).

Round 3 materialized the (doc_id, lang, metric) projection in the object
store for its two consumers (quantile histogram + bucket assignment);
round 4 checkpoints it to partitioned parquet and streams it back twice.
This stress proves the new shape at >= 1M docs: the checkpoint lands on
disk (size reported), both consumers stream it, Ray reports zero (or
bounded) object-store spill, and the driver holds only the per-lang
tertile thresholds.

Reading driver maxRSS: Ray's sort-based all-to-all itself inflates the
DRIVER high-water mark in proportion to exchanged rows (controls on the
same 1M-doc corpus: a map->write_parquet pipeline peaks at ~0.19 GB, a
single plain groupby over the 39M-row bigram exchange at ~1.7 GB, the
full 3-exchange ccnet chain at ~4.9 GB) — that is Ray's shuffle
coordination, common to every groupby in the engine, not operator state;
the checkpoint removed the only operator-held corpus-scale residency
(the former materialize() of the metric projection).

Usage:  python tools/stress_ccnet.py [--docs 1000000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import os
import resource
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_corpus(n_docs: int, block_rows: int = 65536):
    """Deterministic synthetic docs with a 3-language split and a skewed
    bigram distribution (Zipf-ish vocab) so head/middle/tail separate."""
    vocab = np.array([f"w{i}" for i in range(4000)])
    langs = np.array(["en", "de", "fr"])
    tables = []
    for start in range(0, n_docs, block_rows):
        n = min(block_rows, n_docs - start)
        rng = np.random.Generator(np.random.PCG64(1234 + start))
        # Zipf-flavored token draw: squared uniform concentrates mass
        idx = (rng.random((n, 40)) ** 2 * len(vocab)).astype(np.int64)
        toks = vocab[idx]
        texts = [" ".join(row) for row in toks]
        ids = np.arange(start, start + n, dtype=np.int64)
        tables.append(pa.table({
            "doc_id": pa.array(ids),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs[ids % 3].tolist(), pa.string()),
        }))
    return tables


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False)

    import ray.data

    from markdown_query_ray.pipelines.ngramstats import ccnet_buckets

    src = f"/tmp/mdq_stress_ccnet_src_{args.docs}"
    if not os.path.exists(os.path.join(src, "_DONE")):
        shutil.rmtree(src, ignore_errors=True)
        os.makedirs(src, exist_ok=True)
        for i, t in enumerate(make_corpus(args.docs)):
            import pyarrow.parquet as pq

            pq.write_table(t, os.path.join(src, f"part-{i:05d}.parquet"))
        open(os.path.join(src, "_DONE"), "w").close()

    ck = f"/tmp/mdq_stress_ccnet_ck_{os.getpid()}"
    t0 = time.perf_counter()
    ds = ray.data.read_parquet(src, columns=["doc_id", "text", "lang"])
    out = ccnet_buckets(ds, checkpoint_dir=ck)
    # consume WITHOUT collecting: per-bucket counts only
    counts = out.groupby("bucket").count().take_all()
    wall = time.perf_counter() - t0

    ck_bytes = sum(os.path.getsize(os.path.join(ck, f))
                   for f in os.listdir(ck))
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(f"docs={args.docs} wall={wall:.1f}s "
          f"docs/s={args.docs / wall:,.0f}")
    print(f"bucket counts: {sorted((r['bucket'], r['count()']) for r in counts)}")
    print(f"checkpoint: {ck_bytes / 1e6:.1f} MB on disk at {ck}")
    print(f"driver maxRSS: {rss_mb:.0f} MB")
    try:
        from ray._private.internal_api import memory_summary

        addr = ray.get_runtime_context().gcs_address
        spilled = [ln for ln in
                   memory_summary(address=addr,
                                  stats_only=True).splitlines()
                   if "Spilled" in ln or "spilled" in ln]
        print("spill lines:", spilled or ["none reported"])
    except Exception as ex:  # summary is best-effort diagnostics
        print("spill summary unavailable:", ex)
    shutil.rmtree(ck, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
