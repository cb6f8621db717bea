"""Positional-decode micro-benchmark (VERDICT r2 item 4 / NOTES_r2 item 2).

Builds a positional index where one stopword-grade term carries ~10M
positions, then measures:

  1. warm term load (fresh Evaluator, OS cache hot) — with the lazy skip
     structure this no longer decodes any positions (round-2 baseline:
     0.73 s/10M-position term spent in decode_positions at load);
  2. a SELECTIVE phrase ("the rareword"): candidate intersection is tiny,
     so only the candidates' payload slices decode;
  3. a heavy phrase ("the of", both stopword-grade): the worst case where
     most payloads decode anyway — bounds the regression risk.

Usage:  python tools/bench_positions.py [--docs 300000] [--reps 33]
"""

from __future__ import annotations

import argparse
import shutil
import time

import numpy as np
import pyarrow as pa


def synth(batch: pa.Table, reps: int) -> pa.Table:
    ids = batch.column("id").to_numpy().astype(np.int64)
    texts = []
    for i in ids.tolist():
        rng = np.random.Generator(np.random.PCG64(i))
        fill = [f"w{w}" for w in rng.integers(0, 20000, size=reps).tolist()]
        toks = []
        for j, f in enumerate(fill):
            toks.append("the")
            toks.append(f)
            if j % 7 == 3:
                toks.append("of")
        if i % 4096 == 0:
            toks.extend(["the", "rareword"])  # selective phrase matches
        texts.append(" ".join(toks))
    return pa.table({
        "doc_id": pa.array(ids),
        "url": pa.array([f"https://ex.com/{i}" for i in ids.tolist()]),
        "text": pa.array(texts, pa.string()),
    })


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=300_000)
    ap.add_argument("--reps", type=int, default=33)
    ap.add_argument("--out", default="/tmp/bench_positions_idx")
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)

    from functools import partial

    from markdown_query_ray.config import BM25Params, IndexConfig
    from markdown_query_ray.index.build import build_index
    from markdown_query_ray.index.reader import IndexReader
    from markdown_query_ray.query.ast import Phrase
    from markdown_query_ray.query.executor import Evaluator

    import os
    if not (args.skip_build and os.path.exists(
            os.path.join(args.out, "global_stats.json"))):
        shutil.rmtree(args.out, ignore_errors=True)
        ds = ray.data.range(args.docs, override_num_blocks=128).map_batches(
            partial(synth, reps=args.reps), batch_format="pyarrow")
        cfg = IndexConfig(tokenizer="simple", stem=False, positions=True,
                          num_term_parts=16, num_doc_buckets=1)
        t0 = time.time()
        g = build_index(args.out, dataset=ds, cfg=cfg, total_docs=args.docs)
        print(f"build: {g['n_docs']} docs in {time.time() - t0:.1f}s")

    reader = IndexReader(args.out)
    params = BM25Params.classic()

    def timed_load(terms):
        ev = Evaluator(reader, params)
        t0 = time.perf_counter()
        ev._load_terms(terms)
        dt = time.perf_counter() - t0
        p = ev.postings(terms[0])
        return dt, ev, int(len(p.ids))

    # warm the OS cache + stats
    timed_load(["the"])
    dt, _, npost = timed_load(["the"])
    print(f"warm load 'the' ({npost} postings, ~{npost * args.reps / 1e6:.1f}M "
          f"positions): {dt * 1e3:.1f} ms")

    for terms, label in ([["the", "rareword"], "selective"],
                         [["of", "the"], "heavy"]):
        ev = Evaluator(reader, params)
        ev._load_terms(terms)
        t0 = time.perf_counter()
        res = ev.evaluate(Phrase(tuple(terms), window=0, ordered=True))
        dt = time.perf_counter() - t0
        print(f"phrase {label} {terms}: {dt * 1e3:.1f} ms, "
              f"{len(res.ids)} matching docs")
    ray.shutdown()


if __name__ == "__main__":
    main()
