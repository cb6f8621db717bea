"""Incremental index update: the reference's upsert-by-url re-run semantics.

``mdq <db> update`` is idempotent: re-running replaces documents whose key
term ``Q<fullpath>`` already exists (backends/database.cc:193-208). The
columnar rebuild expresses the same contract as LSM-style delta segments:

    <index>/                      base build (gen 0)
    <index>/updates/gen-0001/     each update = a complete mini-index over
                                  the new/changed docs (same P x S layout)
    <index>/tombstones/*.parquet  doc_ids of replaced old versions
    <index>/term_stats_deltas/    NEGATIVE per-term rows for the replaced
                                  docs (computed exactly from their stored
                                  tokenized rows)
    <index>/segments.json         segment list + next_doc_id

Queries see exact results: the reader unions posting partitions across
segments, drops tombstoned doc_ids at decode time, and aggregates
term_stats as base + segments + deltas — termfreq/collfreq are EXACT;
wdf_ub only ever widens (still a valid WAND upper bound). Global
n_docs/avg_doclen are recomputed exactly at update time from the replaced
docs' stored doclens. ``compact()`` folds everything back into one base
build (the analog of xapian-compact).

Replaced docs get a NEW doc_id (arrival order of the update), unlike
Xapian which keeps the old docid — a documented divergence: keeping the id
would require rewriting every posting partition the old version touched,
the one thing a 10^12-doc index must never do per update.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..config import IndexConfig
from .build import _write_atomic, _write_text_atomic, build_index


def _segments_path(index_dir: str) -> str:
    return os.path.join(index_dir, "segments.json")


def load_segments(index_dir: str) -> dict:
    p = _segments_path(index_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    with open(os.path.join(index_dir, "global_stats.json")) as f:
        g = json.load(f)
    return {"segments": ["."], "next_doc_id": g["n_docs"], "next_gen": 1}


def _live_url_ids(index_dir: str, segs: dict, urls: list[str],
                  exclude_gen: int | None = None) -> pa.Table:
    """(doc_id, url, doclen) of LIVE docs among ``urls`` across segments.
    Reads the segment's hash-bucketed url map when present (only the
    buckets the urls fall in — no corpus scan per update); segments built
    before the url map fall back to a filtered tokenized scan.
    ``exclude_gen`` ignores that generation's own tombstones — a re-run
    after a crash mid-commit must recompute the SAME replaced set, not an
    empty one (its first attempt's tombstones already cover the urls)."""
    from .build import url_map_lookup

    ts = _tombstone_ids(index_dir, exclude_gen=exclude_gen)
    tabs = []
    for seg in segs["segments"]:
        seg_dir = os.path.join(index_dir, seg)
        t = url_map_lookup(seg_dir, urls)
        if t is None:
            tok = os.path.join(seg_dir, "tokenized")
            if not os.path.isdir(tok):
                continue
            t = pads.dataset(tok).to_table(
                columns=["doc_id", "url", "doclen"],
                filter=pc.field("url").isin(urls))
        if len(t):
            tabs.append(t)
    if not tabs:
        return pa.table({"doc_id": pa.array([], pa.uint64()),
                         "url": pa.array([], pa.string()),
                         "doclen": pa.array([], pa.uint32())})
    out = pa.concat_tables(tabs)
    if len(ts):
        keep = ~np.isin(out.column("doc_id").to_numpy().astype(np.uint64), ts)
        out = out.filter(pa.array(keep))
    return out


def _tombstone_ids(index_dir: str,
                   exclude_gen: int | None = None) -> np.ndarray:
    d = os.path.join(index_dir, "tombstones")
    if not os.path.isdir(d):
        return np.empty(0, np.uint64)
    skip = f"gen-{exclude_gen:04d}.parquet" if exclude_gen is not None \
        else None
    ids = []
    for f in sorted(os.listdir(d)):
        if f == skip:
            continue
        if f.endswith(".parquet"):
            ids.append(pq.read_table(os.path.join(d, f))
                       .column("doc_id").to_numpy().astype(np.uint64))
    return np.sort(np.concatenate(ids)) if ids else np.empty(0, np.uint64)


_EMPTY_DELTAS = {
    "term": pa.string(), "termfreq": pa.int64(),
    "collfreq": pa.int64(), "wdf_ub": pa.int64()}


def _empty_deltas() -> pa.Table:
    return pa.table({k: pa.array([], t) for k, t in _EMPTY_DELTAS.items()})


def _file_doc_id_range(path: str) -> tuple[int, int] | None:
    """[min, max] doc_id of one tokenized parquet file from footer
    statistics only (no data read). None when stats are absent."""
    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    c = idx.get("doc_id")
    if c is None:
        return None
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(c).statistics
        if st is None or not st.has_min_max:
            return None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return (int(lo), int(hi)) if lo is not None else None


def _file_delta_partial(path: str, ids_sorted: np.ndarray) -> pa.Table:
    """POSITIVE per-term (count, sum) partial for one file's replaced rows:
    row groups whose doc_id range misses the id set are skipped via footer
    stats, hit groups read with column pruning and filtered vectorized."""
    pf = pq.ParquetFile(path)
    md = pf.metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    c = idx["doc_id"]
    hit = []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(c).statistics
        if st is None or not st.has_min_max:
            hit.append(rg)
            continue
        j0 = np.searchsorted(ids_sorted, np.uint64(st.min))
        j1 = np.searchsorted(ids_sorted, np.uint64(st.max), "right")
        if j1 > j0:
            hit.append(rg)
    if not hit:
        return pa.table({"term": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64()),
                         "tot": pa.array([], pa.int64())})
    t = pf.read_row_groups(hit, columns=["doc_id", "terms", "tfs"])
    mask = np.isin(t.column("doc_id").to_numpy().astype(np.uint64),
                   ids_sorted)
    t = t.filter(pa.array(mask))
    flat_terms = pc.list_flatten(t.column("terms"))
    flat_tfs = pc.list_flatten(t.column("tfs")).cast(pa.int64())
    agg = pa.TableGroupBy(
        pa.table({"term": flat_terms, "tf": flat_tfs}), "term"
    ).aggregate([("tf", "count"), ("tf", "sum")])
    return pa.table({
        "term": agg.column("term"),
        "cnt": agg.column("tf_count").cast(pa.int64()),
        "tot": agg.column("tf_sum").cast(pa.int64()),
    })


# below this many pruned files the per-file partials run in a local loop
# (a Ray stage's fixed scheduling cost exceeds the work)
_DELTA_DRIVER_FILES = 8


def _stats_deltas_for(index_dir: str, segs: dict,
                      doc_ids: np.ndarray) -> pa.Table:
    """Exact NEGATIVE per-term (termfreq, collfreq) rows for the given
    doc_ids, from their stored tokenized rows.

    Scale shape: tokenized files carry prefix-sum doc_ids, so each file
    covers one contiguous id range — footer statistics prune the scan to
    files (and row groups) that intersect the replaced id set, and the
    per-file partial aggregates run as a Ray task pool when the pruned set
    is large. Cost is bounded by (files hit) x (row-group size), i.e. by
    the UPDATE batch and its locality, not the corpus — a fully scattered
    replaced set over a much larger corpus still degrades to a parallel
    corpus pass (the documented limit; ``stats_mode="stale"`` is the
    escape hatch there). The output delta table is bounded by the replaced
    docs' distinct terms, never corpus-scale."""
    if len(doc_ids) == 0:
        return _empty_deltas()
    ids_sorted = np.sort(np.asarray(doc_ids, np.uint64))
    files: list[str] = []
    for seg in segs["segments"]:
        tok = os.path.join(index_dir, seg, "tokenized")
        if not os.path.isdir(tok):
            continue
        for f in sorted(os.listdir(tok)):
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(tok, f)
            rng = _file_doc_id_range(p)
            if rng is not None:
                j0 = np.searchsorted(ids_sorted, np.uint64(rng[0]))
                j1 = np.searchsorted(ids_sorted, np.uint64(rng[1]), "right")
                if j1 == j0:
                    continue  # file's id range holds no replaced doc
            files.append(p)
    if not files:
        return _empty_deltas()

    if len(files) <= _DELTA_DRIVER_FILES:
        partials = [_file_delta_partial(p, ids_sorted) for p in files]
    else:
        import ray
        import ray.data

        ids_ref = ray.put(ids_sorted)  # ship the id set once, not per task

        def per_file(batch: pa.Table) -> pa.Table:
            import ray as _ray
            ids = _ray.get(ids_ref)
            return pa.concat_tables([
                _file_delta_partial(p, ids)
                for p in batch.column("path").to_pylist()])

        partials = ray.data.from_items(
            [{"path": p} for p in files]).map_batches(
            per_file, batch_format="pyarrow").take_all()
        partials = [pa.Table.from_pylist(
            partials, schema=pa.schema([("term", pa.string()),
                                        ("cnt", pa.int64()),
                                        ("tot", pa.int64())]))]
    nonempty = [p for p in partials if len(p)]
    if not nonempty:
        return _empty_deltas()
    t = pa.concat_tables(nonempty)
    agg = pa.TableGroupBy(t, "term").aggregate(
        [("cnt", "sum"), ("tot", "sum")])
    return pa.table({
        "term": agg.column("term"),
        "termfreq": pc.multiply(agg.column("cnt_sum").cast(pa.int64()), -1),
        "collfreq": pc.multiply(agg.column("tot_sum").cast(pa.int64()), -1),
        "wdf_ub": pa.array([0] * len(agg), pa.int64()),  # ub never shrinks
    })


def _load_commit_state(index_dir: str) -> tuple[dict, dict]:
    """(global_stats, segments) with the crash-idempotence preamble
    shared by update_index and delete_documents: the stats snapshot
    inside segments.json is authoritative once updates exist
    (segments.json is the atomic commit point — a crash between the
    global_stats.json write and the segments.json write must not let a
    re-run double-count), and a legacy index without a registry gets
    one persisted (with the still-untainted snapshot) BEFORE any
    mutation."""
    with open(os.path.join(index_dir, "global_stats.json")) as f:
        g = json.load(f)
    segs = load_segments(index_dir)
    g = segs.get("global_stats", g)
    if not os.path.exists(_segments_path(index_dir)):
        segs.setdefault("global_stats", g)
        _write_text_atomic(json.dumps(segs, indent=1),
                           _segments_path(index_dir))
    return g, segs


def _write_gen_tombstones(index_dir: str, segs: dict, gen: int,
                          old_ids: np.ndarray, stats_mode: str) -> None:
    """Write generation ``gen``'s tombstone ids + per-term stat deltas
    (NEGATIVE rows keeping termfreq/collfreq exact, or empty in
    ``"stale"`` mode — deferred to compaction). Atomic per file; safe
    to re-run for the same generation."""
    os.makedirs(os.path.join(index_dir, "tombstones"), exist_ok=True)
    _write_atomic(pa.table({"doc_id": pa.array(old_ids)}),
                  os.path.join(index_dir, "tombstones",
                               f"gen-{gen:04d}.parquet"))
    deltas = (_empty_deltas() if stats_mode == "stale"
              else _stats_deltas_for(index_dir, segs, old_ids))
    os.makedirs(os.path.join(index_dir, "term_stats_deltas"),
                exist_ok=True)
    _write_atomic(deltas, os.path.join(index_dir, "term_stats_deltas",
                                       f"gen-{gen:04d}.parquet"))


def update_index(index_dir: str,
                 paths: list[str] | None = None,
                 dataset=None,
                 cfg: IndexConfig | None = None,
                 dataset_fn=None,
                 stats_mode: str = "exact") -> dict:
    """Upsert new/changed docs into an existing index. Input shape matches
    build_index (pages parquet paths, or a Dataset with url + text/html, or
    an already-tokenized Dataset). Docs whose url already exists replace the
    old version (old doc_id tombstoned). Returns the updated global stats.

    ``dataset_fn(id_base) -> Dataset`` is the NO-SHUFFLE input path for
    file-backed batches: the callable receives the index's next free doc_id
    and must return a dataset whose ``doc_id`` column continues the id
    space deterministically (file-rank prefix-sum ids — what
    ``read_warc(paths, id_base=...)`` / ``read_jsonl`` / ``read_pages``
    produce). A plain ``dataset`` without ids instead pays
    ``assign_doc_ids``'s (url, content-hash) sort — the only all-to-all in
    the update path, now reserved for genuinely unordered in-memory input.

    ``stats_mode``: ``"exact"`` (default) computes NEGATIVE per-term stat
    deltas for the replaced docs by scanning their stored tokenized rows —
    termfreq/collfreq stay exact but the scan is a (distributed,
    file-pruned) pass over segments whose files intersect the replaced id
    set. ``"stale"`` skips the scan: replaced docs' term contributions
    remain counted until :func:`compact` (which rebuilds exact stats).
    Stale termfreq/collfreq only ever OVER-count, so WAND bounds stay
    valid, but BM25 idf on updated terms is slightly off until compaction
    — the documented trillion-doc mode where any per-update corpus pass is
    unaffordable. Tombstones are unaffected: match RESULTS are identical,
    only scores on terms touching replaced docs drift."""
    if stats_mode not in ("exact", "stale"):
        raise ValueError(f"stats_mode must be 'exact' or 'stale', "
                         f"got {stats_mode!r}")
    g, segs = _load_commit_state(index_dir)
    if cfg is None:
        cfg = IndexConfig(
            block_size=g["block_size"], num_term_parts=g["num_term_parts"],
            num_doc_buckets=g["num_doc_buckets"], tokenizer=g["tokenizer"],
            stem=g["stem"], positions=g.get("positions", False),
            codec=g.get("codec", "varint"),
            docs_per_bucket=g.get("docs_per_bucket", 1 << 32))
    gen = segs["next_gen"]
    seg_rel = os.path.join("updates", f"gen-{gen:04d}")
    seg_dir = os.path.join(index_dir, seg_rel)
    if os.path.isdir(seg_dir):
        # an uncommitted generation dir from a crashed attempt may hold a
        # staged build of DIFFERENT input; its checkpoints would silently
        # short-circuit this run's build (and drop this run's docs), so
        # clear it — correctness over resuming one in-flight update batch
        import shutil

        shutil.rmtree(seg_dir)

    # ---- build the delta segment as a complete mini-index ------------------
    import ray.data

    if dataset is None and dataset_fn is not None:
        # file-rank ids continuing the index's id space: no assign_doc_ids
        # sort (the update path's last all-to-all) for file-backed input
        dataset = dataset_fn(segs["next_doc_id"])
    if dataset is None:
        from ..sources.pages import read_pages
        dataset = read_pages(sorted(paths), columns=["url", "html"],
                             id_base=segs["next_doc_id"])
    gseg = build_index(seg_dir, dataset=dataset, cfg=cfg,
                       id_base=segs["next_doc_id"])

    # ---- tombstone replaced urls + exact stat deltas -----------------------
    new_tok = pads.dataset(os.path.join(seg_dir, "tokenized"))
    new_urls = new_tok.to_table(columns=["url"]).column("url").to_pylist()
    old = _live_url_ids(index_dir, segs, new_urls, exclude_gen=gen)
    old_ids = old.column("doc_id").to_numpy().astype(np.uint64)
    _write_gen_tombstones(index_dir, segs, gen, old_ids, stats_mode)

    # ---- exact merged global stats -----------------------------------------
    removed_doclen = int(pc.sum(old.column("doclen")).as_py() or 0)
    n_docs = g["n_docs"] + gseg["n_docs"] - len(old_ids)
    total_doclen = (g["total_doclen"] + gseg["total_doclen"]
                    - removed_doclen)
    g.update({
        "n_docs": n_docs,
        "total_doclen": total_doclen,
        "avg_doclen": (total_doclen / n_docs) if n_docs else 0.0,
        # bounds stay conservative (lb can only be proven by compaction)
        "doclen_lb": min(g["doclen_lb"], gseg["doclen_lb"])
        if gseg["n_docs"] else g["doclen_lb"],
        "doclen_ub": max(g["doclen_ub"], gseg["doclen_ub"]),
        "wdf_ub_global": max(g.get("wdf_ub_global", 0),
                             gseg.get("wdf_ub_global", 0)),
    })
    _write_text_atomic(json.dumps(g, indent=1),
                       os.path.join(index_dir, "global_stats.json"))

    segs["segments"].append(seg_rel)
    segs["next_doc_id"] = segs["next_doc_id"] + gseg["n_docs"]
    segs["next_gen"] = gen + 1
    segs["global_stats"] = g  # snapshot travels with the commit point
    _write_text_atomic(json.dumps(segs, indent=1), _segments_path(index_dir))
    return g


def delete_documents(index_dir: str, urls: list[str],
                     stats_mode: str = "exact") -> dict:
    """Delete-by-url: the reference's delete-by-unique-key-term semantics
    (xapian WritableDatabase::delete_document(term) — public
    api/omdatabase.cc) as a tombstone-only generation. No segment is
    added: the LIVE (url -> doc_id) set resolves through the bucketed
    url maps (no corpus scan), those ids tombstone, NEGATIVE per-term
    stat deltas keep termfreq/collfreq exact (``stats_mode="stale"``
    defers them to compaction, same contract as update_index), and
    global n_docs/avg_doclen update exactly from the deleted docs'
    stored doclens. ``segments.json`` stays the atomic commit point:
    a crash after the tombstone write but before the commit re-runs
    the SAME generation and recomputes the same set (its own gen's
    tombstones are excluded from the live lookup). Returns the updated
    global stats. Deleting urls that don't exist (or were already
    deleted) is a no-op that still consumes a generation.

    At trillion-doc scale callers batch the url list (the live lookup
    is bounded by |urls| x touched url-map buckets, never a corpus
    pass)."""
    if stats_mode not in ("exact", "stale"):
        raise ValueError(f"stats_mode must be 'exact' or 'stale', "
                         f"got {stats_mode!r}")
    g, segs = _load_commit_state(index_dir)
    gen = segs["next_gen"]

    old = _live_url_ids(index_dir, segs, list(urls), exclude_gen=gen)
    old_ids = old.column("doc_id").to_numpy().astype(np.uint64)
    _write_gen_tombstones(index_dir, segs, gen, old_ids, stats_mode)

    removed_doclen = int(pc.sum(old.column("doclen")).as_py() or 0)
    n_docs = g["n_docs"] - len(old_ids)
    total_doclen = g["total_doclen"] - removed_doclen
    g.update({
        "n_docs": n_docs,
        "total_doclen": total_doclen,
        "avg_doclen": (total_doclen / n_docs) if n_docs else 0.0,
        # doclen/wdf bounds stay as-is: only ever conservative for WAND,
        # compaction re-proves them tight
    })
    _write_text_atomic(json.dumps(g, indent=1),
                       os.path.join(index_dir, "global_stats.json"))
    segs["next_gen"] = gen + 1
    segs["global_stats"] = g
    _write_text_atomic(json.dumps(segs, indent=1),
                       _segments_path(index_dir))
    return g


def compact(index_dir: str, out_dir: str,
            cfg: IndexConfig | None = None) -> dict:
    """Fold all segments minus tombstones into a fresh single-segment build
    (the xapian-compact analog): live tokenized rows re-shuffle into new
    posting partitions; doc_ids are preserved."""
    with open(os.path.join(index_dir, "global_stats.json")) as f:
        g = json.load(f)
    if cfg is None:
        cfg = IndexConfig(
            block_size=g["block_size"], num_term_parts=g["num_term_parts"],
            num_doc_buckets=g["num_doc_buckets"], tokenizer=g["tokenizer"],
            stem=g["stem"], positions=g.get("positions", False),
            codec=g.get("codec", "varint"),
            docs_per_bucket=g.get("docs_per_bucket", 1 << 32))
    segs = load_segments(index_dir)
    ts = _tombstone_ids(index_dir)

    import ray.data

    tok_dirs = [os.path.join(index_dir, s, "tokenized")
                for s in segs["segments"]]
    tok_dirs = [d for d in tok_dirs if os.path.isdir(d)]
    ds = ray.data.read_parquet(tok_dirs, file_extensions=["parquet"])
    if len(ts):
        def drop_dead(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy().astype(np.uint64)
            return batch.filter(pa.array(~np.isin(ids, ts)))

        ds = ds.map_batches(drop_dead, batch_format="pyarrow")
    return build_index(out_dir, dataset=ds, cfg=cfg)
