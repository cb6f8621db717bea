"""Sequence packing: concat-and-chunk assignment of docs to training rows.

LLM pretraining consumes fixed-length token sequences; the standard
"concat and chunk" packing (GPT-2/3, Llama) concatenates all documents
in a canonical order and slices the stream every ``seq_len`` tokens.
The per-document outputs — global token offset and the range of
sequence ids the doc lands in — require an exclusive prefix sum over
token counts in doc_id order, i.e. a distributed scan. SQL expresses it
as ``SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)``;
Ray Data has no window functions, so this composes the classic
two-level scan:

1. one ``map_batches`` pass counts tokens per doc (vectorized RE2
   kernel, ``textstats.token_count_batch``) and drops the text — only
   (doc_id, n_tokens) = 16 bytes/doc ever shuffles;
2. bucket = ``doc_id // range_size`` (order-preserving: every doc of
   bucket b precedes every doc of bucket b+1); a tiny
   ``groupby(bucket).sum`` yields per-bucket token totals — the driver
   holds ONE int64 per bucket (10^11 docs / 2^20-doc buckets ≈ 0.8 MB),
   computes the exclusive prefix over buckets, and broadcasts it with
   ``ray.put``;
3. ``groupby(bucket).map_groups`` sorts each bucket by doc_id, cumsums
   locally, and adds the broadcast bucket base — exact global offsets
   with no global sort and no corpus-sized driver state.

Offsets are a pure function of (doc_id, n_tokens) — stable under
re-runs, resume, repartitioning and cluster size. Empty docs occupy no
tokens: ``n_seqs = 0`` and first/last_seq are pinned to -1 so the SQL
oracle can mirror the convention without NULL-ordering hazards.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

DEFAULT_SEQ_LEN = 512
DEFAULT_RANGE_SIZE = 1 << 20  # docs per scan bucket


def _bucket_partials(batch: pa.Table, range_size: int,
                     id_col: str = "doc_id") -> pa.Table:
    ids = batch.column(id_col).to_numpy().astype(np.int64)
    toks = batch.column("n_tokens").to_numpy().astype(np.int64)
    bucket = ids // range_size
    uniq, inv = np.unique(bucket, return_inverse=True)
    sums = np.zeros(len(uniq), np.int64)
    np.add.at(sums, inv, toks)
    return pa.table({"bucket": pa.array(uniq),
                     "tok_part": pa.array(sums)})


def _pack_group(group: pa.Table, base_ref, range_size: int,
                seq_len: int) -> pa.Table:
    import ray

    bases = ray.get(base_ref) if base_ref is not None else {}
    ids = group.column("doc_id").to_numpy().astype(np.int64)
    toks = group.column("n_tokens").to_numpy().astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids, toks = ids[order], toks[order]
    bucket = int(ids[0]) // range_size
    start = np.int64(bases.get(bucket, 0)) + \
        np.concatenate(([0], np.cumsum(toks)[:-1]))
    end = start + toks
    first = start // seq_len
    last = np.maximum(first, (end - 1) // seq_len)
    n_seqs = last - first + 1
    empty = toks == 0
    first[empty] = -1
    last[empty] = -1
    n_seqs[empty] = 0
    return pa.table({
        "doc_id": pa.array(ids),
        "n_tokens": pa.array(toks),
        "start_tok": pa.array(start),
        "first_seq": pa.array(first),
        "last_seq": pa.array(last),
        "n_seqs": pa.array(n_seqs),
    })


def pack_sequences(ds, seq_len: int = DEFAULT_SEQ_LEN,
                   range_size: int = DEFAULT_RANGE_SIZE):
    """Dataset of (doc_id, text) -> Dataset of per-doc packing
    assignments (doc_id, n_tokens, start_tok, first_seq, last_seq,
    n_seqs) for fixed ``seq_len`` concat-and-chunk packing in doc_id
    order."""
    import ray
    from ray.data.aggregate import Sum

    from .textstats import token_count_batch

    counts = ds.map_batches(token_count_batch, batch_format="pyarrow")

    # tiny per-bucket totals -> exclusive prefix on the driver
    totals = counts.map_batches(
        partial(_bucket_partials, range_size=range_size),
        batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("tok_part", alias_name="toks"))
    tt = totals.sort("bucket").to_pandas()
    excl = np.concatenate(([0], np.cumsum(
        tt["toks"].to_numpy(np.int64))[:-1]))
    bases = {int(b): int(e) for b, e in zip(tt["bucket"], excl)}
    base_ref = ray.put(bases)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = batch.column("doc_id").to_numpy().astype(np.int64) \
            // range_size
        return batch.append_column("bucket", pa.array(b))

    return counts.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(
            partial(_pack_group, base_ref=base_ref,
                    range_size=range_size, seq_len=seq_len),
            batch_format="pyarrow")
