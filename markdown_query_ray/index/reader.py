"""Read-side access to a built index directory.

The analog of the reference's read-only ``Database::new_with_path``
(src/main.rs:115,130), but columnar: global stats from JSON, per-term stats
and posting blocks from parquet with predicate pushdown (terms are
dictionary-encoded and files are sorted by term, so row-group statistics
prune reads to the query's terms).

Partition pruning: a query touching terms T and doc-bucket b needs only the
files ``part-{fnv1a64(t) % P * S + b}`` — the scorer never lists, let alone
reads, unrelated partitions.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..functions.introselect import nth_element
from .build import term_part


class IndexReader:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "global_stats.json")) as f:
            self.gstats = json.load(f)
        self.P = int(self.gstats["num_term_parts"])
        self.S = int(self.gstats["num_doc_buckets"])
        # incremental updates: delta segments + tombstones (index/update.py)
        seg_file = os.path.join(index_dir, "segments.json")
        if os.path.exists(seg_file):
            with open(seg_file) as f:
                self.segments = json.load(f)["segments"]
        else:
            self.segments = ["."]
        self._tombstones = None

    @property
    def tombstones(self):
        """Sorted uint64 doc_ids of replaced document versions (empty on a
        never-updated index). Loaded lazily, cached."""
        if self._tombstones is None:
            from .update import _tombstone_ids
            self._tombstones = _tombstone_ids(self.index_dir)
        return self._tombstones

    # -- stats ---------------------------------------------------------------
    @property
    def n_docs(self) -> int:
        return self.gstats["n_docs"]

    @property
    def avg_doclen(self) -> float:
        # exact int/int division (not the stored float mean): bit-identical
        # to the oracle SQL's sum(dl)/count(*) and stable across block orders
        n = self.gstats["n_docs"]
        return (self.gstats["total_doclen"] / n) if n else 0.0

    @property
    def doclen_lb(self) -> int:
        return self.gstats["doclen_lb"]

    @property
    def doclen_ub(self) -> int:
        return self.gstats["doclen_ub"]

    @property
    def wdf_ub_global(self) -> int | None:
        """Exact global max wdf (glass version-file wdf_ubound,
        glass_version.h:260-262); None on indexes built before the stat
        existed."""
        return self.gstats.get("wdf_ub_global")

    def first_wdf(self, terms: list[str]) -> dict[str, int]:
        """wdf of each term's first (lowest-doc_id) posting, across all
        buckets/segments — the input to glass's loose per-term wdf upper
        bound (glass_postlist.cc:176-191: ``max(cf - first_wdf,
        first_wdf)``), which drives ELITE_SET selection parity. Reads only
        the terms' block_id==0 rows' metadata + one leading varint each;
        results are cached. On tombstoned (updated) indexes the first
        posting may be a deleted doc — a documented divergence (glass
        rewrites the chunk on delete; we'd need a decode pass)."""
        cache = getattr(self, "_first_wdf_cache", None)
        if cache is None:
            cache = self._first_wdf_cache = {}
        missing = [t for t in set(terms) if t not in cache]
        if missing:
            best: dict[str, tuple[int, bytes]] = {}
            for p in self.posting_paths(missing):
                t = pq.read_table(
                    p, columns=["term", "first_doc_id", "tfs_enc"],
                    filters=[("term", "in", missing), ("block_id", "=", 0)])
                for term, did, enc in zip(
                        t.column("term").to_pylist(),
                        t.column("first_doc_id").to_pylist(),
                        t.column("tfs_enc").to_pylist()):
                    cur = best.get(term)
                    if cur is None or did < cur[0]:
                        best[term] = (did, enc)
            for term in missing:
                hit = best.get(term)
                if hit is None:
                    cache[term] = 0
                    continue
                if self.gstats.get("codec", "varint") == "bitpack":
                    # [width byte][packed]: first value = low w bits
                    from .codec import unpack_for_blocks

                    v = int(unpack_for_blocks(
                        np.frombuffer(hit[1], np.uint8),
                        np.array([1], np.int64))[0]) if hit[1] else 0
                else:
                    v = shift = 0
                    for b in hit[1]:  # leading LEB128 varint of the tf stream
                        v |= (b & 0x7F) << shift
                        if not b & 0x80:
                            break
                        shift += 7
                cache[term] = v
        return {t: cache[t] for t in set(terms)}

    @property
    def has_positions(self) -> bool:
        return bool(self.gstats.get("positions", False))

    def _stats_tables(self, flt, columns=None):
        tabs = []
        for seg in self.segments:
            d = os.path.join(self.index_dir, seg, "term_stats")
            if os.path.isdir(d):
                t = pads.dataset(d).to_table(filter=flt, columns=columns)
                if len(t):
                    tabs.append(t)
        deltas = os.path.join(self.index_dir, "term_stats_deltas")
        if os.path.isdir(deltas):
            t = pads.dataset(deltas).to_table(filter=flt, columns=columns)
            if len(t):
                tabs.append(t)
        return tabs

    def term_stats(self, terms: list[str]) -> dict[str, dict]:
        """{term: {termfreq, collfreq, wdf_ub}} for the given terms (absent
        terms omitted). Predicate-pushdown read of the term_stats dataset;
        on an updated index, segment stats and the negative deltas of
        replaced docs sum to EXACT termfreq/collfreq (wdf_ub only widens —
        still a valid WAND bound)."""
        if not terms:
            return {}
        flt = pc.field("term").isin(list(set(terms)))
        out: dict[str, dict] = {}
        for t in self._stats_tables(flt):
            for r in t.to_pylist():
                cur = out.setdefault(r["term"], {"termfreq": 0,
                                                 "collfreq": 0, "wdf_ub": 0})
                cur["termfreq"] += int(r["termfreq"])
                cur["collfreq"] += int(r["collfreq"])
                cur["wdf_ub"] = max(cur["wdf_ub"], int(r["wdf_ub"]))
        return {k: v for k, v in out.items() if v["termfreq"] > 0}

    def term_exists(self, term: str) -> bool:
        """Does the (unstemmed, lowercased) term occur in the live index?
        Drives the query-side c++/c# suffix rule
        (queryparser_internal.cc:781-810 ``db.term_exists``)."""
        return bool(self.term_stats([term]))

    def expand_wildcard(self, prefix: str, limit: int = 0,
                        most_frequent: bool = False) -> list[str]:
        """Right-truncation expansion over the term dictionary
        (OP_WILDCARD, api/queryinternal.cc:1019-1126; limit 0 = unlimited).
        A prefix range scan: term >= prefix AND term < prefix+MAXCHAR.
        Terms whose post-delta termfreq hits 0 (every holder replaced) are
        excluded.

        most_frequent: keep the ``limit`` highest-termfreq matches
        (WILDCARD_LIMIT_MOST_FREQUENT, what FLAG_PARTIAL uses). The subset
        kept when the cap cuts through a termfreq tie is whatever
        std::nth_element leaves in the first ``limit`` slots
        (OrContext::select_most_frequent, api/queryinternal.cc:199-206,
        over the lexicographic allterms order) — replicated bit-for-bit
        by functions/introselect.py."""
        hi = prefix + "\U0010ffff"
        flt = (pc.field("term") >= prefix) & (pc.field("term") <= hi)
        freqs: dict[str, int] = {}
        for t in self._stats_tables(flt, columns=["term", "termfreq"]):
            for term, tf in zip(t.column("term").to_pylist(),
                                t.column("termfreq").to_pylist()):
                freqs[term] = freqs.get(term, 0) + int(tf)
        alive = {t: f for t, f in freqs.items() if f > 0}
        if most_frequent and limit and len(alive) > limit:
            arr = [(f, t) for t, f in sorted(alive.items())]
            nth_element(arr, limit - 1, lambda a, b: a[0] > b[0])
            return sorted(t for _, t in arr[:limit])
        terms = sorted(alive)
        if limit and len(terms) > limit:
            terms = terms[:limit]
        return terms

    # -- postings ------------------------------------------------------------
    def posting_paths(self, terms: list[str], bucket: int | None = None
                      ) -> list[str]:
        parts = sorted({term_part(t, self.P) for t in terms})
        buckets = range(self.S) if bucket is None else [bucket]
        paths = []
        for seg in self.segments:
            for p in parts:
                for b in buckets:
                    f = os.path.join(self.index_dir, seg, "postings",
                                     f"part-{p * self.S + b:06d}.parquet")
                    if os.path.exists(f):
                        paths.append(f)
        return paths

    def load_blocks(self, terms: list[str], bucket: int | None = None):
        """Posting-block rows for the given terms, in (term, doc order)."""
        import pyarrow as pa

        paths = self.posting_paths(terms, bucket)
        if not paths:
            from .codec import _empty_blocks_table
            return _empty_blocks_table()
        tset = list(set(terms))

        def read_one(p: str):
            return pq.read_table(p, filters=[("term", "in", tset)])

        if len(paths) > 1:
            # filtered parquet reads release the GIL; a wide multi-token
            # partial query touches every partition file of the bucket, so
            # reading them serially dominates cold-query latency
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, len(paths))) as ex:
                tabs = [t for t in ex.map(read_one, paths) if len(t)]
        else:
            tabs = [t for t in map(read_one, paths) if len(t)]
        if not tabs:
            from .codec import _empty_blocks_table
            return _empty_blocks_table()
        out = pa.concat_tables(tabs)
        # term, then doc order (bucket files may interleave doc ranges)
        return out.take(pc.sort_indices(
            out, sort_keys=[("term", "ascending"),
                            ("first_doc_id", "ascending")]))

    # -- docs ----------------------------------------------------------------
    def doc_ids_in_bucket(self, bucket: int | None) -> "object":
        """All live doc_ids (sorted numpy array) in one doc-bucket — the
        <alldocuments> universe for MatchAll / pure-NOT queries. A pruned
        columnar read of the staging docs table; cached per reader."""
        import numpy as np

        cache = getattr(self, "_universe_cache", None)
        if cache is None:
            cache = self._universe_cache = {}
        if bucket in cache:
            return cache[bucket]
        ids = []
        for seg in self.segments:
            d = os.path.join(self.index_dir, seg, "tokenized")
            if not os.path.isdir(d):
                continue
            t = pads.dataset(d).to_table(columns=["doc_id"])
            ids.append(t.column("doc_id").to_numpy().astype(np.uint64))
        out = np.sort(np.concatenate(ids)) if ids else             np.empty(0, np.uint64)
        ts = self.tombstones
        if len(ts):
            out = out[~np.isin(out, ts)]
        if bucket is not None and self.S > 1:
            dpb = int(self.gstats.get("docs_per_bucket", 1 << 32))
            keep = (out // dpb) % self.S == bucket
            out = out[keep]
        cache[bucket] = out
        return out

    def payloads_for(self, doc_ids: list[int]) -> dict[int, str]:
        """doc_id -> stored payload (Document::get_data analog). Empty dict
        when the index was built without ``store_payload``."""
        if not doc_ids:
            return {}
        flt = pc.field("doc_id").isin([int(d) for d in doc_ids])
        out: dict[int, str] = {}
        for seg in self.segments:
            d = os.path.join(self.index_dir, seg, "tokenized")
            if not os.path.isdir(d):
                continue
            ds = pads.dataset(d)
            if "payload" not in ds.schema.names:
                continue
            t = ds.to_table(filter=flt, columns=["doc_id", "payload"])
            out.update(zip(t.column("doc_id").to_pylist(),
                           t.column("payload").to_pylist()))
        return out

    def urls_for(self, doc_ids: list[int]) -> dict[int, str]:
        """doc_id -> url lookup. tokenized/ doubles as the docs table — the
        parquet read prunes to the (doc_id, url) columns, so the fat
        terms/tfs list columns are never touched."""
        if not doc_ids:
            return {}
        flt = pc.field("doc_id").isin([int(d) for d in doc_ids])
        out: dict[int, str] = {}
        for seg in self.segments:
            d = os.path.join(self.index_dir, seg, "tokenized")
            if not os.path.isdir(d):
                continue
            t = pads.dataset(d).to_table(filter=flt,
                                         columns=["doc_id", "url"])
            out.update(zip(t.column("doc_id").to_pylist(),
                           t.column("url").to_pylist()))
        return out
