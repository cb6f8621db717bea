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
    hit rate). Per batch, the flat term column is dictionary-encoded so the
    crc32 partition hash runs once per UNIQUE term; the per-posting expansion
    is a single numpy gather. List flatten/repeat are Arrow kernels."""

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
        denc = flat_terms.combine_chunks().dictionary_encode()
        uniq = denc.dictionary.to_pylist()
        uniq_parts = np.empty(len(uniq), np.uint32)
        for j, t in enumerate(uniq):
            p = cache.get(t)
            if p is None:
                p = term_part(t, P)
                cache[t] = p
            uniq_parts[j] = p
        idx = denc.indices.to_numpy(zero_copy_only=False)
        parts = uniq_parts[idx] if len(idx) else uniq_parts[:0]
        bucket = ((doc_ids // np.uint64(self.docs_per_bucket))
                  % np.uint64(cfg.num_doc_buckets)).astype(np.uint32)
        skey = parts * np.uint32(cfg.num_doc_buckets) + bucket
        cols = {
            "term": flat_terms,
            "doc_id": pa.array(doc_ids),
            "tf": flat_tfs,
            "doclen": pa.array(doclens),
            "skey": pa.array(skey),
        }
        if "npos" in batch.column_names:  # positional build
            cols["npos"] = pc.list_flatten(batch.column("npos"))
            cols["pos"] = pc.list_flatten(batch.column("poss"))
        return pa.table(cols)


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


def _write_atomic(table: pa.Table, path: str, **kw) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp, **kw)
    os.replace(tmp, path)


def _stats_partial_from_blocks(blocks: pa.Table) -> pa.Table:
    """Exact per-term stats for one shuffle group, from its block metadata
    (the group holds ALL postings of its (term-part, doc-bucket) slice):
    termfreq = sum n, collfreq = sum wdf, wdf_ub = max wdf."""
    agg = pa.TableGroupBy(
        blocks.select(["term", "n", "sum_wdf", "max_wdf"]), "term"
    ).aggregate([("n", "sum"), ("sum_wdf", "sum"), ("max_wdf", "max")])
    return pa.table({
        "term": agg.column("term"),
        "termfreq": agg.column("n_sum").cast(pa.int64()),
        "collfreq": agg.column("sum_wdf_sum").cast(pa.int64()),
        "wdf_ub": agg.column("max_wdf_max").cast(pa.int64()),
    })


def encode_write_group(group: pa.Table, out_dir: str,
                       cfg: IndexConfig) -> pa.Table:
    """map_groups body for one shuffle group: sort by (term, doc_id), encode
    varint blocks, write one parquet file atomically (plus the group's exact
    per-term stats partial), return a manifest row. Skips work (resume) when
    the output file already exists."""
    t0 = time.perf_counter()
    skey = int(group.column("skey")[0].as_py())
    path = os.path.join(out_dir, "postings", f"part-{skey:06d}.parquet")
    spath = os.path.join(out_dir, "term_stats_parts",
                         f"part-{skey:06d}.parquet")
    n_rows = len(group)
    if os.path.exists(path):
        if not os.path.exists(spath):  # resume across the partial write
            blocks = pq.read_table(
                path, columns=["term", "n", "sum_wdf", "max_wdf"])
            _write_atomic(_stats_partial_from_blocks(blocks), spath)
        meta = pq.ParquetFile(path).metadata
        return _manifest_row(skey, path, meta.num_rows, n_rows, 0,
                             resumed=True, seconds=0.0)
    order = pc.sort_indices(group, sort_keys=[("term", "ascending"),
                                              ("doc_id", "ascending")])
    g = group.take(order)
    terms = np.asarray(g.column("term").to_pylist(), dtype=object)
    pos_kw = {}
    if "npos" in g.column_names:
        pos_kw = {
            "npos": g.column("npos").to_numpy().astype(np.uint64),
            "pos_payloads": np.asarray(
                g.column("pos").to_pylist(), dtype=object),
        }
    blocks = encode_partition(
        terms,
        g.column("doc_id").to_numpy().astype(np.uint64),
        g.column("tf").to_numpy().astype(np.uint64),
        g.column("doclen").to_numpy().astype(np.uint64),
        block_size=cfg.block_size, **pos_kw)
    _write_atomic(_stats_partial_from_blocks(blocks), spath)
    _write_atomic(blocks, path, row_group_size=4096,
                  use_dictionary=["term"])  # postings last: the resume marker
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
    metrics: dict[str, float] = {}
    t_start = time.perf_counter()

    def _mark(stage: str, t0: float) -> None:
        metrics[stage] = round(time.perf_counter() - t0, 3)

    if paths is not None and total_docs is None:
        total_docs = sum(file_row_counts(sorted(paths)))
    docs_per_bucket = (
        max(1, -(-int(total_docs) // cfg.num_doc_buckets))
        if total_docs else cfg.docs_per_bucket)

    # ---- stage 1: extract + tokenize -> staging checkpoint -----------------
    t0 = time.perf_counter()
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
    _mark("extract_tokenize", t0)

    tokds = ray.data.read_parquet(tok_dir,
                                  file_extensions=["parquet"])

    # ---- stage 2: global stats (per-file partials, driver reduce) ----------
    # The docs table (doc_id, url, doclen) is NOT re-written: tokenized/ IS
    # the docs table — parquet column pruning makes reading just those three
    # columns cheap. The doclen aggregate is algebraic (count/sum/min/max),
    # so it runs as a task-pool map over files (one tiny partial row per
    # file) + an O(files) driver fold — an all-to-all ``Dataset.aggregate``
    # here would shuffle for no reason.
    from ray.data.aggregate import Max, Sum

    t0 = time.perf_counter()
    tok_files = sorted(
        os.path.join(tok_dir, f) for f in os.listdir(tok_dir)
        if f.endswith(".parquet"))

    def doclen_partial(batch: pa.Table) -> pa.Table:
        rows = {"n": [], "s": [], "lo": [], "hi": []}
        for p in batch.column("path").to_pylist():
            a = pq.read_table(p, columns=["doclen"]).column("doclen")
            n = len(a)
            rows["n"].append(n)
            rows["s"].append(int(pc.sum(a).as_py() or 0))
            rows["lo"].append(int(pc.min(a).as_py()) if n else None)
            rows["hi"].append(int(pc.max(a).as_py()) if n else None)
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in rows.items()})

    partials = ray.data.from_items(
        [{"path": p} for p in tok_files]).map_batches(
        doclen_partial, batch_format="pyarrow").take_all()
    n_docs = sum(r["n"] for r in partials)
    total_doclen = sum(r["s"] for r in partials)
    los = [r["lo"] for r in partials if r["lo"] is not None]
    his = [r["hi"] for r in partials if r["hi"] is not None]
    gstats = {
        "n_docs": n_docs,
        "total_doclen": total_doclen,
        "doclen_lb": min(los) if los else 0,
        "doclen_ub": max(his) if his else 0,
        "avg_doclen": (total_doclen / n_docs) if n_docs else 0.0,
        "num_term_parts": cfg.num_term_parts,
        "num_doc_buckets": cfg.num_doc_buckets,
        "docs_per_bucket": docs_per_bucket,
        "block_size": cfg.block_size,
        "tokenizer": cfg.tokenizer,
        "stem": cfg.stem,
        "positions": cfg.positions,
    }
    _mark("global_stats", t0)

    # ---- stage 3: the merge shuffle -> encoded posting partitions ----------
    t0 = time.perf_counter()
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
    _mark("merge_shuffle_encode", t0)

    # ---- stage 4: merge per-group term-stat partials -----------------------
    # Each shuffle group wrote exact partials for its (term-part, doc-bucket)
    # slice; the final merge sums S partials per (term, part). Small merges
    # (test/bench scale) run driver-side as one Arrow groupby; past the row
    # threshold it becomes a Ray groupby over the partials dataset — same
    # semantics, distributed — so a trillion-doc term dictionary never has to
    # fit on the driver.
    ts_dir = os.path.join(out_dir, "term_stats")
    tsp_dir = os.path.join(out_dir, "term_stats_parts")
    t0 = time.perf_counter()
    partial_rows = sum(
        pq.ParquetFile(os.path.join(tsp_dir, f)).metadata.num_rows
        for f in os.listdir(tsp_dir) if f.endswith(".parquet"))
    if partial_rows <= cfg.term_stats_driver_rows:
        parts_tbl = pq.ParquetDataset(tsp_dir).read()
        agg = pa.TableGroupBy(parts_tbl, "term").aggregate(
            [("termfreq", "sum"), ("collfreq", "sum"), ("wdf_ub", "max")])
        merged = pa.table({
            "term": agg.column("term"),
            "termfreq": agg.column("termfreq_sum").cast(pa.int64()),
            "collfreq": agg.column("collfreq_sum").cast(pa.int64()),
            "wdf_ub": agg.column("wdf_ub_max").cast(pa.int64()),
        })
        merged = merged.take(pc.sort_indices(
            merged, sort_keys=[("term", "ascending")]))
        _write_atomic(merged, os.path.join(ts_dir, "part-000000.parquet"),
                      row_group_size=1 << 16)
    else:
        term_stats = ray.data.read_parquet(
            tsp_dir, file_extensions=["parquet"]).groupby("term").aggregate(
            Sum("termfreq", alias_name="termfreq"),
            Sum("collfreq", alias_name="collfreq"),
            Max("wdf_ub", alias_name="wdf_ub"),
        )
        term_stats.write_parquet(ts_dir)
    _mark("term_stats", t0)
    metrics["total"] = round(time.perf_counter() - t_start, 3)
    if gstats["n_docs"]:
        metrics["docs_per_sec"] = round(gstats["n_docs"] / metrics["total"], 2)
    gstats["stage_metrics"] = metrics
    with open(os.path.join(out_dir, "global_stats.json"), "w") as f:
        json.dump(gstats, f, indent=1)
    with open(os.path.join(out_dir, "_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    return gstats
