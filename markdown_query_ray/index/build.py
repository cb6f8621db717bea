"""Index build pipeline: pages parquet -> posting-list index directory.

Ray-Data-first rebuild of the reference's ``mdq <db> update`` path
(src/main.rs:84-110 + xapian glass commit, glass_database.cc:1119-1146),
restructured for streaming execution over a multi-node cluster:

    read_pages (doc_id prefix-sum)                      [stateless tasks]
      -> extract_batch (html->text, drop html)          [stateless tasks]
      -> TokenizeStage                                  [actor pool]
      -> write tokenized/ staging parquet               [CHECKPOINT]
    tokenized/ -> docs/ + global_stats.json             [cheap aggregate]
    tokenized/ -> ExplodeStage (term,doc_id,tf,doclen,skey)
      -> groupby(skey)                                  [THE merge shuffle]
      -> encode+write postings/part-*.parquet           [per-partition commit]
      -> manifest rows (lineage + throughput metrics)
    postings metadata cols -> term_stats/               [small groupby]

Shuffle key ``skey = crc32(term) % P * S + doc_bucket``: P term-hash parts
give posting-merge parallelism; S doc-range salt shards are the explicit skew
handling — a stopword-grade term (60%+ of docs) splits into S groups bounded
by its per-doc-range postings, and because posting blocks are keyed
(term, first_doc_id), the salted sub-lists are already disjoint sorted runs
that need no second-pass merge (only term_stats needs a tiny final groupby).

Each shuffle group writes its own parquet file atomically (tmp+rename) and
returns a manifest row; a re-run skips groups whose output file exists — the
per-partition checkpoint/resume story (the reference's analog is idempotent
upsert-by-key, backends/database.cc:193-208).
"""

from __future__ import annotations

import json
import os
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import IndexConfig
from ..sources.pages import file_row_counts, read_pages
from ..stages.extract import extract_batch
from ..stages.tokenize import TokenizeStage
from .codec import encode_partition


def term_part(term: str, num_parts: int) -> int:
    """Stable term-hash partition (process-invariant, unlike ``hash()``)."""
    return zlib.crc32(term.encode("utf-8")) % num_parts


class ExplodeStage:
    """tokenized doc rows -> flat posting rows with shuffle key.

    Stateful actor: the term->part map is cached across batches (Zipf => ~100%
    hit rate), so the per-posting cost is one dict lookup, with the list
    flatten/repeat done by Arrow kernels."""

    def __init__(self, cfg: IndexConfig, docs_per_bucket: int):
        self.cfg = cfg
        self.docs_per_bucket = max(1, docs_per_bucket)
        self._part_cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        terms_list = batch.column("terms")
        lens = pc.list_value_length(terms_list).to_numpy().astype(np.int64)
        flat_terms = pc.list_flatten(terms_list)
        flat_tfs = pc.list_flatten(batch.column("tfs"))
        doc_ids = np.repeat(
            batch.column("doc_id").to_numpy().astype(np.uint64), lens)
        doclens = np.repeat(
            batch.column("doclen").to_numpy().astype(np.uint32), lens)

        cache = self._part_cache
        P = cfg.num_term_parts
        parts = np.empty(len(flat_terms), np.uint32)
        for i, t in enumerate(flat_terms.to_pylist()):
            p = cache.get(t)
            if p is None:
                p = term_part(t, P)
                cache[t] = p
            parts[i] = p
        bucket = ((doc_ids // np.uint64(self.docs_per_bucket))
                  % np.uint64(cfg.num_doc_buckets)).astype(np.uint32)
        skey = parts * np.uint32(cfg.num_doc_buckets) + bucket
        return pa.table({
            "term": flat_terms,
            "doc_id": pa.array(doc_ids),
            "tf": flat_tfs,
            "doclen": pa.array(doclens),
            "skey": pa.array(skey),
        })


def _manifest_row(skey: int, path: str, n_blocks: int, n_postings: int,
                  nbytes: int, resumed: bool, seconds: float) -> pa.Table:
    return pa.table({
        "skey": pa.array([skey], pa.int64()),
        "path": pa.array([path], pa.string()),
        "n_blocks": pa.array([n_blocks], pa.int64()),
        "n_postings": pa.array([n_postings], pa.int64()),
        "bytes": pa.array([nbytes], pa.int64()),
        "seconds": pa.array([seconds], pa.float64()),
        "resumed": pa.array([resumed], pa.bool_()),
    })


def encode_write_group(group: pa.Table, out_dir: str,
                       cfg: IndexConfig) -> pa.Table:
    """map_groups body for one shuffle group: sort by (term, doc_id), encode
    varint blocks, write one parquet file atomically, return a manifest row.
    Skips work (resume) when the output file already exists."""
    t0 = time.perf_counter()
    skey = int(group.column("skey")[0].as_py())
    path = os.path.join(out_dir, "postings", f"part-{skey:06d}.parquet")
    n_rows = len(group)
    if os.path.exists(path):
        meta = pq.ParquetFile(path).metadata
        return _manifest_row(skey, path, meta.num_rows, n_rows, 0,
                             resumed=True, seconds=0.0)
    order = pc.sort_indices(group, sort_keys=[("term", "ascending"),
                                              ("doc_id", "ascending")])
    g = group.take(order)
    terms = np.asarray(g.column("term").to_pylist(), dtype=object)
    blocks = encode_partition(
        terms,
        g.column("doc_id").to_numpy().astype(np.uint64),
        g.column("tf").to_numpy().astype(np.uint64),
        g.column("doclen").to_numpy().astype(np.uint64),
        block_size=cfg.block_size)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp-{os.getpid()}"
    pq.write_table(blocks, tmp, row_group_size=4096,
                   use_dictionary=["term"])
    os.replace(tmp, path)  # atomic commit of this partition
    return _manifest_row(skey, path, len(blocks), n_rows,
                         os.path.getsize(path), resumed=False,
                         seconds=time.perf_counter() - t0)


def build_index(out_dir: str,
                paths: list[str] | None = None,
                dataset=None,
                cfg: IndexConfig | None = None,
                total_docs: int | None = None) -> dict:
    """Build the full index under ``out_dir``. Input is either ``paths``
    (pages-shaped parquet: url, warc_ts, html, text, lang) or ``dataset``
    (a Ray Dataset already carrying doc_id + text or html).

    Returns the global stats dict. Ray must already be initialised by the
    caller (the driver owns the session)."""
    import ray.data

    cfg = cfg or IndexConfig()
    os.makedirs(out_dir, exist_ok=True)
    tok_dir = os.path.join(out_dir, "tokenized")
    tok_done = os.path.join(tok_dir, "_SUCCESS")

    if paths is not None and total_docs is None:
        total_docs = sum(file_row_counts(sorted(paths)))
    docs_per_bucket = (
        max(1, -(-int(total_docs) // cfg.num_doc_buckets))
        if total_docs else cfg.docs_per_bucket)

    # ---- stage 1: extract + tokenize -> staging checkpoint -----------------
    if not os.path.exists(tok_done):
        if dataset is None:
            ds = read_pages(sorted(paths), columns=["url", "html"])
        else:
            ds = dataset
        if "html" in ds.schema().names:
            ds = ds.map_batches(extract_batch, batch_format="pyarrow")
        tok = ds.map_batches(
            TokenizeStage(cfg), batch_format="pyarrow",
            batch_size=cfg.tokenize_batch_size,
            concurrency=cfg.tokenize_concurrency)
        tok.write_parquet(tok_dir)
        with open(tok_done, "w") as f:
            f.write("ok")

    tokds = ray.data.read_parquet(tok_dir,
                                  file_extensions=["parquet"])

    # ---- stage 2: docs table + global stats (tiny aggregates) --------------
    docs_dir = os.path.join(out_dir, "docs")
    if not os.path.exists(os.path.join(docs_dir, "_SUCCESS")):
        tokds.select_columns(["doc_id", "url", "doclen"]) \
             .write_parquet(docs_dir)
        with open(os.path.join(docs_dir, "_SUCCESS"), "w") as f:
            f.write("ok")

    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    agg = ray.data.read_parquet(docs_dir, columns=["doclen"]).aggregate(
        Count(alias_name="n_docs"),
        Sum("doclen", alias_name="total_doclen"),
        Min("doclen", alias_name="doclen_lb"),
        Max("doclen", alias_name="doclen_ub"),
        Mean("doclen", alias_name="avg_doclen"),
    )
    gstats = {
        "n_docs": int(agg["n_docs"]),
        "total_doclen": int(agg["total_doclen"] or 0),
        "doclen_lb": int(agg["doclen_lb"] or 0),
        "doclen_ub": int(agg["doclen_ub"] or 0),
        "avg_doclen": float(agg["avg_doclen"] or 0.0),
        "num_term_parts": cfg.num_term_parts,
        "num_doc_buckets": cfg.num_doc_buckets,
        "docs_per_bucket": docs_per_bucket,
        "block_size": cfg.block_size,
        "tokenizer": cfg.tokenizer,
        "stem": cfg.stem,
    }
    with open(os.path.join(out_dir, "global_stats.json"), "w") as f:
        json.dump(gstats, f, indent=1)

    # ---- stage 3: the merge shuffle -> encoded posting partitions ----------
    posts = tokds.map_batches(
        ExplodeStage(cfg, docs_per_bucket), batch_format="pyarrow",
        batch_size=cfg.tokenize_batch_size)
    from functools import partial

    manifest = posts.groupby("skey").map_groups(
        partial(encode_write_group, out_dir=out_dir, cfg=cfg),
        batch_format="pyarrow")
    man_table = pa.Table.from_pandas(manifest.to_pandas(), preserve_index=False)
    man_path = os.path.join(out_dir, "_manifest.jsonl")
    with open(man_path, "w") as f:
        for row in man_table.to_pylist():
            f.write(json.dumps(row) + "\n")

    # ---- stage 4: per-term stats from posting-block metadata ---------------
    ts_dir = os.path.join(out_dir, "term_stats")
    stats_ds = ray.data.read_parquet(
        os.path.join(out_dir, "postings"),
        columns=["term", "n", "sum_wdf", "max_wdf"])
    term_stats = stats_ds.groupby("term").aggregate(
        Sum("n", alias_name="termfreq"),
        Sum("sum_wdf", alias_name="collfreq"),
        Max("max_wdf", alias_name="wdf_ub"),
    )
    term_stats.write_parquet(ts_dir)
    return gstats
