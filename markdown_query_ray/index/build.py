"""Index build pipeline: pages parquet -> posting-list index directory.

Ray-Data-first rebuild of the reference's ``mdq <db> update`` path
(src/main.rs:84-110 + xapian glass commit, glass_database.cc:1119-1146),
restructured for streaming execution over a multi-node cluster:

    read_pages (doc_id prefix-sum)                      [stateless tasks]
      -> extract_batch (html->text, drop html)          [stateless tasks]
      -> TokenizeStage                                  [actor pool]
      -> write tokenized/ staging parquet               [CHECKPOINT]
    tokenized/ -> docs/ + global_stats.json             [cheap aggregate]
    tokenized/ -> PartialPostingsStage                  [map-side combine:
                    (skey, term, n, varint-packed ids/tfs/dls) per batch]
      -> groupby(skey)                                  [THE merge shuffle]
      -> encode+write postings/part-*.parquet           [per-partition commit]
      -> manifest rows (lineage + throughput metrics)
    postings metadata cols -> term_stats/               [small groupby]

Shuffle key ``skey = fnv1a64(term) % P * S + doc_bucket``: P term-hash parts
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
    """Stable term-hash partition (process-invariant, unlike ``hash()``).
    FNV-1a64 so the build can batch-hash terms straight out of Arrow string
    buffers (functions/hashing.py) — this scalar form is the query-side
    single-term lookup of the same function."""
    from ..functions.hashing import fnv1a_bytes

    return fnv1a_bytes(term.encode("utf-8")) % num_parts


class PartialPostingsStage:
    """tokenized doc rows -> PACKED partial posting lists with shuffle key.

    The map-side combiner of the merge shuffle (SURVEY.md §2.6 "per-task
    partial-postings dict flushed as sorted Arrow batch"): instead of one
    shuffle row per posting, each batch emits one row per (skey, term) with
    the postings packed —

        (skey, term, n, first_id, ids_enc, tfs_enc, dls_enc
         [, npos_enc, pos_enc])

    ``first_id`` carries the segment's first doc_id as a plain uint64
    column; ``ids_enc`` holds the remaining n-1 gap-1 deltas, coded per
    ``cfg.partial_codec`` — "varint" (LEB128) or "bitpack" (per-segment
    frame-of-reference, ~0.7x the bytes: the knob that keeps a 4M+ doc
    merge shuffle inside the object store). Keeping the first id out of
    the payload matters for bitpack: one absolute u64 would force the
    whole segment to full width. This packing cuts the all-to-all payload
    ~10x vs one row per posting (term strings ship once per batch) — the
    sort-based shuffle moves bytes, not rows.

    Partition hashes run once per UNIQUE term via dictionary encoding,
    batch-hashed straight out of the Arrow string buffers (C fast path in
    functions/hashing.py — no per-term Python objects). All packing is numpy
    prefix-sum arithmetic, no Python loops over postings."""

    def __init__(self, cfg: IndexConfig, docs_per_bucket: int):
        self.cfg = cfg
        self.docs_per_bucket = max(1, docs_per_bucket)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .codec import _segment_binary, encode_varints

        cfg = self.cfg
        terms_list = batch.column("terms")
        lens = pc.list_value_length(terms_list).to_numpy().astype(np.int64)
        flat_terms = pc.list_flatten(terms_list).combine_chunks()
        flat_tfs = pc.list_flatten(batch.column("tfs")).to_numpy() \
            .astype(np.uint64)
        doc_ids = np.repeat(
            batch.column("doc_id").to_numpy().astype(np.uint64), lens)
        doclens = np.repeat(
            batch.column("doclen").to_numpy().astype(np.uint64), lens)

        from ..functions.hashing import fnv1a64_strings

        P = cfg.num_term_parts
        denc = flat_terms.dictionary_encode()
        # hash every unique term straight out of the Arrow buffers (C path:
        # no per-term Python objects); scalar term_part() is the same hash
        uniq_parts = (fnv1a64_strings(denc.dictionary)
                      % np.uint64(P)).astype(np.uint32)
        if len(uniq_parts) == 0:
            uniq_parts = np.zeros(1, np.uint32)
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(codes)
        if n == 0:
            return self._empty()
        parts = uniq_parts[codes]
        bucket = ((doc_ids // np.uint64(self.docs_per_bucket))
                  % np.uint64(cfg.num_doc_buckets)).astype(np.uint32)
        skey = parts * np.uint32(cfg.num_doc_buckets) + bucket

        # group flat postings by (skey, term): stable lexsort keeps the
        # doc-major flatten order => doc_ids ascending within each group
        order = np.lexsort((codes, skey))
        skey_s, codes_s = skey[order], codes[order]
        ids_s, tfs_s, dls_s = doc_ids[order], flat_tfs[order], doclens[order]
        change = np.ones(n, bool)
        change[1:] = (skey_s[1:] != skey_s[:-1]) | (codes_s[1:] != codes_s[:-1])
        seg_start = np.nonzero(change)[0]
        seg_n = np.diff(np.append(seg_start, n))

        is_first = np.zeros(n, bool)
        is_first[seg_start] = True
        gaps = np.zeros(n, np.uint64)
        gaps[1:] = ids_s[1:] - ids_s[:-1] - 1  # within-segment deltas
        gaps_rest = gaps[~is_first]            # first id rides as a column
        if cfg.partial_codec == "bitpack":
            from .codec import _binary_from_seg_ends, pack_for_blocks

            ids_payload, ids_bends = pack_for_blocks(gaps_rest, seg_n - 1)
            ids_enc = _binary_from_seg_ends(ids_payload, ids_bends)
            tf_payload, tf_bends = pack_for_blocks(tfs_s, seg_n)
            tfs_enc = _binary_from_seg_ends(tf_payload, tf_bends)
            dl_payload, dl_bends = pack_for_blocks(dls_s, seg_n)
            dls_enc = _binary_from_seg_ends(dl_payload, dl_bends)
        elif cfg.partial_codec == "varint":
            ids_payload, ids_ends = encode_varints(gaps_rest)
            ids_enc = _segment_binary(ids_payload, ids_ends, seg_n - 1)
            tf_payload, tf_ends = encode_varints(tfs_s)
            tfs_enc = _segment_binary(tf_payload, tf_ends, seg_n)
            dl_payload, dl_ends = encode_varints(dls_s)
            dls_enc = _segment_binary(dl_payload, dl_ends, seg_n)
        else:
            raise ValueError(
                f"unknown partial codec {cfg.partial_codec!r}")

        cols = {
            "skey": pa.array(skey_s[seg_start], pa.uint32()),
            "term": denc.dictionary.take(pa.array(codes_s[seg_start])),
            "n": pa.array(seg_n.astype(np.uint32)),
            "first_id": pa.array(ids_s[seg_start], pa.uint64()),
            "ids_enc": ids_enc,
            "tfs_enc": tfs_enc,
            "dls_enc": dls_enc,
        }
        if "npos" in batch.column_names:  # positional build
            from .codec import _binary_parts

            npos = pc.list_flatten(batch.column("npos")).to_numpy() \
                .astype(np.uint64)[order]
            np_payload, np_ends = encode_varints(npos)
            cols["npos_enc"] = _segment_binary(np_payload, np_ends, seg_n)
            poss = pc.list_flatten(batch.column("poss")).combine_chunks()
            poss = poss.take(pa.array(order))
            offs, pbuf = _binary_parts(poss)
            bends = np.zeros(len(seg_n) + 1, np.int64)
            cum = np.cumsum(seg_n)
            bends[1:] = offs[1:][cum - 1]
            cols["pos_enc"] = pa.BinaryArray.from_buffers(
                pa.binary(), len(seg_n),
                [None, pa.py_buffer(bends.astype(np.int32).tobytes()),
                 pa.py_buffer(pbuf)])
        return pa.table(cols)

    def _empty(self) -> pa.Table:
        cols = {
            "skey": pa.array([], pa.uint32()),
            "term": pa.array([], pa.string()),
            "n": pa.array([], pa.uint32()),
            "first_id": pa.array([], pa.uint64()),
            "ids_enc": pa.array([], pa.binary()),
            "tfs_enc": pa.array([], pa.binary()),
            "dls_enc": pa.array([], pa.binary()),
        }
        if self.cfg.positions:
            cols["npos_enc"] = pa.array([], pa.binary())
            cols["pos_enc"] = pa.array([], pa.binary())
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


URL_MAP_BUCKETS = 64
# below this many rows the url map is written in one local pass (the Ray
# shuffle's fixed cost exceeds the work); above it, a bucket groupby.
# Measured crossover: 5k docs 0.1 s local vs 1.4 s Ray, but 784k docs
# ~28 s local (single-threaded read + 64 filter passes) vs ~1 s inside
# the distributed build — keep this threshold low.
URL_MAP_DRIVER_ROWS = 100_000


def _url_bucket_batch(batch: pa.Table) -> pa.Table:
    """(url, doc_id, doclen, ubucket) rows for the url-map shuffle; bucket =
    FNV-1a64(url) % URL_MAP_BUCKETS (the same vectorized hash updates use
    for lookups)."""
    from ..functions.hashing import fnv1a64_strings

    col = batch.column("url")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    h = fnv1a64_strings(col)
    return pa.table({
        "url": batch.column("url"),
        "doc_id": batch.column("doc_id"),
        "doclen": batch.column("doclen"),
        "ubucket": pa.array((h % np.uint64(URL_MAP_BUCKETS))
                            .astype(np.int32)),
    })


def _write_url_map_group(group: pa.Table, out_dir: str) -> pa.Table:
    """map_groups body: write one url-map bucket file atomically."""
    b = int(group.column("ubucket")[0].as_py())
    path = os.path.join(out_dir, "url_map", f"umap-{b:04d}.parquet")
    if not os.path.exists(path):
        _write_atomic(group.select(["url", "doc_id", "doclen"]), path)
    return pa.table({"bucket": pa.array([b], pa.int32()),
                     "rows": pa.array([group.num_rows], pa.int64())})


def url_map_lookup(seg_dir: str, urls: list[str]) -> pa.Table | None:
    """(doc_id, url, doclen) rows of ``urls`` from a segment's url map,
    reading ONLY the hash buckets the urls fall in — the per-update lookup
    never scans the segment's corpus. Returns None when the segment predates
    the url map (callers fall back to the tokenized scan)."""
    um_dir = os.path.join(seg_dir, "url_map")
    if not os.path.exists(os.path.join(um_dir, "_SUCCESS")):
        return None
    from ..functions.hashing import fnv1a64_strings

    need = np.unique(fnv1a64_strings(pa.array(urls, pa.string()))
                     % np.uint64(URL_MAP_BUCKETS))
    tabs = []
    for b in need:
        p = os.path.join(um_dir, f"umap-{int(b):04d}.parquet")
        if os.path.exists(p):
            t = pq.read_table(p)
            t = t.filter(pc.is_in(t.column("url"),
                                  value_set=pa.array(urls, pa.string())))
            if len(t):
                tabs.append(t.select(["doc_id", "url", "doclen"]))
    if not tabs:
        return pa.table({"doc_id": pa.array([], pa.uint64()),
                         "url": pa.array([], pa.string()),
                         "doclen": pa.array([], pa.uint32())})
    out = pa.concat_tables(tabs)
    return pa.table({"doc_id": out.column("doc_id").cast(pa.uint64()),
                     "url": out.column("url"),
                     "doclen": out.column("doclen").cast(pa.uint32())})


def _clear_parquet_dir(d: str) -> None:
    """Remove stale parquet output (incl. write tmp files) from an
    incomplete multi-file write so a re-run starts clean."""
    if not os.path.isdir(d):
        return
    for f in os.listdir(d):
        if f.endswith(".parquet") or ".parquet.tmp" in f or ".tmp-" in f:
            try:
                os.remove(os.path.join(d, f))
            except FileNotFoundError:
                pass


def _write_atomic(table: pa.Table, path: str, **kw) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp, **kw)
    os.replace(tmp, path)


def _write_text_atomic(text: str, path: str) -> None:
    """Crash-safe metadata write (tmp + fsync + rename + dir fsync): a torn
    global_stats / manifest / segments file must never be observable, even
    across power loss — without the fsyncs the rename can hit disk before
    the data blocks on some filesystems."""
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    dfd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


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
                       cfg: IndexConfig,
                       docs_per_bucket: int | None = None) -> pa.Table:
    """map_groups body for one shuffle group of PACKED partial posting rows:
    decode+merge to (term, doc_id) order, encode varint blocks, write one
    parquet file atomically (plus the group's exact per-term stats partial),
    return a manifest row. Skips work (resume) when the output file already
    exists."""
    from .codec import decode_partial_group

    t0 = time.perf_counter()
    skey = int(group.column("skey")[0].as_py())
    path = os.path.join(out_dir, "postings", f"part-{skey:06d}.parquet")
    spath = os.path.join(out_dir, "term_stats_parts",
                         f"part-{skey:06d}.parquet")
    n_rows = int(pc.sum(group.column("n")).as_py() or 0)
    if os.path.exists(path):
        if not os.path.exists(spath):  # resume across the partial write
            blocks = pq.read_table(
                path, columns=["term", "n", "sum_wdf", "max_wdf"])
            _write_atomic(_stats_partial_from_blocks(blocks), spath)
        meta = pq.ParquetFile(path).metadata
        return _manifest_row(skey, path, meta.num_rows, n_rows, 0,
                             resumed=True, seconds=0.0)
    decoded = decode_partial_group(group, codec=cfg.partial_codec)
    terms, doc_ids, tfs, dls = decoded[:4]
    pos_kw = {}
    if len(decoded) > 4:
        pos_kw = {"npos": decoded[4], "pos_payloads": decoded[5]}
    # stripe-align blocks (see codec.encode_partition): only needed when
    # multiple buckets interleave id stripes
    stripe = docs_per_bucket if cfg.num_doc_buckets > 1 else None
    blocks = encode_partition(terms, doc_ids, tfs, dls,
                              block_size=cfg.block_size,
                              stripe_size=stripe, codec=cfg.codec,
                              **pos_kw)
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
                total_docs: int | None = None,
                id_base: int = 0) -> dict:
    """Build the full index under ``out_dir``. Input is either ``paths``
    (pages-shaped parquet: url, warc_ts, html, text, lang) or ``dataset``
    (a Ray Dataset carrying text or html plus either a ``doc_id`` column
    or a ``url`` to derive deterministic ids from; ``id_base`` offsets
    derived ids — updates continue the id space).

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
        # a crash mid-write leaves partial staging files with no _SUCCESS;
        # the rewrite would ADD fresh files beside them (Ray names output
        # files per run) and the reader would see duplicated docs — clear
        # stale output before rewriting
        _clear_parquet_dir(tok_dir)
        if dataset is None:
            ds = read_pages(sorted(paths), columns=["url", "html"])
        else:
            ds = dataset
            names = ds.schema().names
            if "doc_id" not in names and "terms" not in names:
                # url+text/html dataset without ids (the documented input
                # shape): assign deterministic ids by url rank
                from ..sources.pages import assign_doc_ids
                ds = assign_doc_ids(ds, id_base=id_base)
        if "terms" in ds.schema().names:
            tok = ds  # caller already tokenized (e.g. field-prefix stage)
        else:
            if "html" in ds.schema().names:
                ds = ds.map_batches(extract_batch, batch_format="pyarrow")
            # size the actor pool to the cluster rather than letting the
            # autoscaling pool ramp up from its minimum — on a short job
            # the ramp-up IS the job
            concurrency = cfg.tokenize_concurrency
            if concurrency is None:
                # exactly the cluster's CPUs: max(2, ...) would oversubscribe
                # a 1-CPU cluster and skew scaling measurements
                concurrency = max(
                    1, int(ray.cluster_resources().get("CPU", 2)))
            tok = ds.map_batches(
                TokenizeStage(cfg), batch_format="pyarrow",
                batch_size=cfg.tokenize_batch_size,
                concurrency=concurrency)
        tok.write_parquet(tok_dir)
        with open(tok_done, "w") as f:
            f.write("ok")
    _mark("extract_tokenize", t0)

    tokds = ray.data.read_parquet(tok_dir,
                                  file_extensions=["parquet"])

    # ---- stage 1b: url -> (doc_id, doclen) hash-bucketed map ---------------
    # Updates look up replaced urls here instead of scanning every segment's
    # tokenized table (a corpus scan per update batch at 10^12 docs). One
    # small shuffle of (url, doc_id, doclen) rows into URL_MAP_BUCKETS
    # bucket files; lookups read only the buckets their urls hash to.
    t0 = time.perf_counter()
    um_done = os.path.join(out_dir, "url_map", "_SUCCESS")
    if "url" in tokds.schema().names and not os.path.exists(um_done):
        _clear_parquet_dir(os.path.join(out_dir, "url_map"))
        tok_rows = sum(
            pq.ParquetFile(os.path.join(tok_dir, f)).metadata.num_rows
            for f in os.listdir(tok_dir) if f.endswith(".parquet"))
        if tok_rows <= URL_MAP_DRIVER_ROWS:
            # small build: one local pass beats a Ray shuffle whose fixed
            # scheduling cost exceeds the work (measured 1.4 s vs 0.1 s at
            # 5k docs)
            t = pq.ParquetDataset(tok_dir).read(
                columns=["url", "doc_id", "doclen"])
            bucketed = _url_bucket_batch(t)
            ub = bucketed.column("ubucket").to_numpy()
            for b in np.unique(ub):
                _write_url_map_group(
                    bucketed.filter(pa.array(ub == b)), out_dir)
        else:
            from functools import partial as _partial

            umds = ray.data.read_parquet(
                tok_dir, file_extensions=["parquet"],
                columns=["url", "doc_id", "doclen"])
            umds.map_batches(
                _url_bucket_batch, batch_format="pyarrow"
            ).groupby("ubucket").map_groups(
                _partial(_write_url_map_group, out_dir=out_dir),
                batch_format="pyarrow").materialize()
        with open(um_done, "w") as f:
            f.write("ok")
    _mark("url_map", t0)

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
        rows = {"n": [], "s": [], "lo": [], "hi": [], "max_id": []}
        for p in batch.column("path").to_pylist():
            t = pq.read_table(p, columns=["doclen", "doc_id"])
            a = t.column("doclen")
            n = len(a)
            rows["n"].append(n)
            rows["s"].append(int(pc.sum(a).as_py() or 0))
            rows["lo"].append(int(pc.min(a).as_py()) if n else None)
            rows["hi"].append(int(pc.max(a).as_py()) if n else None)
            rows["max_id"].append(
                int(pc.max(t.column("doc_id")).as_py()) if n else None)
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in rows.items()})

    partials = ray.data.from_items(
        [{"path": p} for p in tok_files]).map_batches(
        doclen_partial, batch_format="pyarrow").take_all()
    n_docs = sum(r["n"] for r in partials)
    total_doclen = sum(r["s"] for r in partials)
    los = [r["lo"] for r in partials if r["lo"] is not None]
    his = [r["hi"] for r in partials if r["hi"] is not None]
    max_ids = [r["max_id"] for r in partials if r["max_id"] is not None]
    # compacted indexes preserve doc_ids across tombstone holes, so the
    # next free id is max(live id)+1, NOT n_docs — conflating the two would
    # hand a later update an id that is already live
    next_doc_id = (max(max_ids) + 1) if max_ids else 0
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
        "codec": cfg.codec,
        "tokenizer": cfg.tokenizer,
        "stem": cfg.stem,
        "positions": cfg.positions,
    }
    _mark("global_stats", t0)

    # ---- stage 3: the merge shuffle -> encoded posting partitions ----------
    t0 = time.perf_counter()
    posts = tokds.map_batches(
        PartialPostingsStage(cfg, docs_per_bucket), batch_format="pyarrow",
        batch_size=cfg.postings_batch_size)
    from functools import partial

    manifest = posts.groupby("skey").map_groups(
        partial(encode_write_group, out_dir=out_dir, cfg=cfg,
                docs_per_bucket=docs_per_bucket),
        batch_format="pyarrow")
    man_table = pa.Table.from_pandas(manifest.to_pandas(), preserve_index=False)
    man_path = os.path.join(out_dir, "_manifest.jsonl")
    _write_text_atomic(
        "".join(json.dumps(row) + "\n" for row in man_table.to_pylist()),
        man_path)
    _mark("merge_shuffle_encode", t0)
    # skew evidence: with doc-range salting no shuffle group should be much
    # larger than the mean even though stopword-grade terms hit 60%+ of docs
    nposts = man_table.column("n_postings").to_numpy()
    if len(nposts) and nposts.sum():
        metrics["shuffle_groups"] = int(len(nposts))
        metrics["shuffle_max_group_share"] = round(
            float(nposts.max()) / float(nposts.sum()), 4)
        metrics["shuffle_balance_max_over_mean"] = round(
            float(nposts.max()) / float(nposts.mean()), 2)

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
    _clear_parquet_dir(ts_dir)  # always recomputed; drop any stale output
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
        gstats["wdf_ub_global"] = int(
            pc.max(merged.column("wdf_ub")).as_py() or 0)
    else:
        term_stats = ray.data.read_parquet(
            tsp_dir, file_extensions=["parquet"]).groupby("term").aggregate(
            Sum("termfreq", alias_name="termfreq"),
            Sum("collfreq", alias_name="collfreq"),
            Max("wdf_ub", alias_name="wdf_ub"),
        )
        term_stats.write_parquet(ts_dir)
        from ray.data.aggregate import Max as _Max
        mx = ray.data.read_parquet(
            tsp_dir, file_extensions=["parquet"]).aggregate(
            _Max("wdf_ub", alias_name="m"))
        # glass version-file wdf_ubound analog (glass_version.h:260-262):
        # exact global max wdf, input to the per-term xapian wdf bound
        gstats["wdf_ub_global"] = int(mx["m"] or 0)
    _mark("term_stats", t0)
    metrics["total"] = round(time.perf_counter() - t_start, 3)
    if gstats["n_docs"]:
        metrics["docs_per_sec"] = round(gstats["n_docs"] / metrics["total"], 2)
    gstats["stage_metrics"] = metrics
    _write_text_atomic(json.dumps(gstats, indent=1),
                       os.path.join(out_dir, "global_stats.json"))
    _write_text_atomic(json.dumps(metrics, indent=1),
                       os.path.join(out_dir, "_metrics.json"))
    # initial segment registry: updates treat segments.json as the atomic
    # commit point, and its embedded stats snapshot is what lets a crashed
    # update re-run without double-counting — so it must exist (and hold
    # the untainted base stats) BEFORE any update mutates global_stats.json
    _write_text_atomic(
        json.dumps({"segments": ["."], "next_doc_id": next_doc_id,
                    "next_gen": 1, "global_stats": gstats}, indent=1),
        os.path.join(out_dir, "segments.json"))
    return gstats
