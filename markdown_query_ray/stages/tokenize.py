"""Tokenize stage: text -> per-document term/wdf postings (actor pool).

The rebuild of the reference's TermGenerator walk (src/document.rs:162-190 +
termgenerator_internal.cc): a stateful ``map_batches`` CLASS so the compiled
regex, Unicode tables and the term->stem cache are built ONCE per actor
(``__init__``) and amortized over every batch (``__call__``) — the pattern the
reference gets for free from its single process (Stem::new("en") once,
src/main.rs:80-82).

Output: one row per document —
``(doc_id:uint64, url, doclen:uint32, terms:list<string>, tfs:list<uint32>)``
with ``doclen = sum(tfs)`` under the Xapian definition (Z-stems double-count;
glass_database.cc:1121-1131). One-row-per-doc keeps the stage's output
~10x smaller than exploded postings and makes the staging checkpoint (the
resumable boundary) cheap; the explode to flat (term, doc_id, tf) rows
happens inside the shuffle stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import IndexConfig
from ..functions.snowball import CachingStemmer
from ..functions.xapian_tokenizer import (
    fast_positional_counts,
    fast_term_counts,
    fast_tokenize,
    position_payloads,
    position_payloads_flagged,
    simple_tokenize,
    term_counts,
    tokenize_ngram,
)
from ..index.codec import encode_varints


class TokenizeStage:
    def __init__(self, cfg: IndexConfig):
        self.cfg = cfg
        self.stemmer = CachingStemmer() if cfg.stem else None
        # xapian mode rides the C fast path for ASCII docs (identical output,
        # fuzz-verified); positions mode needs the full token stream so it
        # uses fast_tokenize + term_counts instead of the fused C counter
        self.xapian_mode = cfg.tokenizer == "xapian"
        self.tokenize = fast_tokenize if self.xapian_mode else simple_tokenize
        # CJK n-gram mode only affects texts containing CJK-range chars;
        # ASCII docs still ride the C fast path (tokenize_ngram defers)
        self.cjk = cfg.cjk_ngram and self.xapian_mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        max_bytes = self.cfg.max_term_bytes
        with_pos = self.cfg.positions
        terms_col: list[list[str]] = []
        tfs_col: list[list[int]] = []
        doclens: list[int] = []
        npos_col: list[list[int]] = []
        poss_col: list[list[bytes]] = []
        # boolean (wdf-0) terms: the add_boolean_term analog — the Q<url> id
        # term (upsert/lookup key, src/document.rs:185-187) plus an L<lang>
        # facet term when the column exists. wdf 0 => they score 0, never
        # enter doclen, and serve FILTER / lookup semantics exactly like
        # Xapian boolean terms.
        urls = batch.column("url").to_pylist()
        langs = batch.column("lang").to_pylist() \
            if "lang" in batch.column_names else None
        texts = batch.column("text").to_pylist()
        for row_i, text in enumerate(texts):
            text = text or ""
            if self.cjk and not text.isascii():
                toks_f = tokenize_ngram(text, max_bytes)
                counts = term_counts([t for t, _ in toks_f],
                                     stemmer=self.stemmer)
                if with_pos:
                    pos_of = position_payloads_flagged(toks_f)
            elif with_pos:
                if self.xapian_mode:
                    counts, pos_of = fast_positional_counts(
                        text, stemmer=self.stemmer, max_term_bytes=max_bytes)
                else:
                    toks = self.tokenize(text, max_bytes)
                    counts = term_counts(toks, stemmer=self.stemmer)
                    pos_of = position_payloads(toks)
            elif not self.xapian_mode:
                counts = term_counts(self.tokenize(text, max_bytes),
                                     stemmer=self.stemmer)
            else:
                counts = fast_term_counts(
                    text, stemmer=self.stemmer, max_term_bytes=max_bytes)
            doclen = sum(counts.values())  # before wdf-0 terms (Xapian)
            boolean_terms = [f"Q{urls[row_i]}"]
            if langs is not None and langs[row_i]:
                boolean_terms.append(f"L{langs[row_i]}")
            for bt in boolean_terms:
                if len(bt.encode("utf-8")) <= 245:  # Xapian key-length cap
                    counts.setdefault(bt, 0)
            # sorted term order: deterministic output regardless of dict order
            items = sorted(counts.items())
            terms_col.append([t for t, _ in items])
            tfs_col.append([c for _, c in items])
            doclens.append(doclen)
            if with_pos:
                npos_col.append([pos_of[t][0] if t in pos_of else 0
                                 for t, _ in items])
                poss_col.append([pos_of[t][1] if t in pos_of else b""
                                 for t, _ in items])
        cols = {
            "doc_id": batch.column("doc_id"),
            "url": batch.column("url"),
            "doclen": pa.array(doclens, pa.uint32()),
            "terms": pa.array(terms_col, pa.list_(pa.string())),
            "tfs": pa.array(tfs_col, pa.list_(pa.uint32())),
        }
        if with_pos:
            cols["npos"] = pa.array(npos_col, pa.list_(pa.uint32()))
            cols["poss"] = pa.array(poss_col, pa.list_(pa.binary()))
        if self.cfg.store_payload:
            # the Document::set_data analog: the raw text rides the staging
            # checkpoint (columnar, compressed) for retrieval-time preview
            cols["payload"] = batch.column("text").cast(pa.large_string())
        return pa.table(cols)

def pack_position_payloads(items: list[tuple[str, int]],
                           pos_map: dict[str, list[int]]
                           ) -> tuple[list[int], list[bytes]]:
    """Per-term position payloads for one document: 1-based token positions
    (termgenerator_internal.cc:269-277), delta-packed as varint
    [first, gap, gap, ...]. Terms absent from ``pos_map`` (Z-stems: STEM_SOME
    adds stems wdf-only) carry no positions. One varint-encode call per doc;
    per-term byte ranges come from the value-end offsets. Returns
    (npos, payloads) aligned with ``items``."""
    deltas: list[int] = []
    counts: list[int] = []
    for term, _ in items:
        plist = pos_map.get(term)
        if plist is None:
            counts.append(0)
            continue
        counts.append(len(plist))
        prev = 0
        for p in plist:
            deltas.append(p - prev)
            prev = p
    payload, ends = encode_varints(np.asarray(deltas, np.uint64))
    buf = payload.tobytes()
    npos_out: list[int] = []
    poss_out: list[bytes] = []
    vi = 0
    for c in counts:
        npos_out.append(c)
        if c == 0:
            poss_out.append(b"")
        else:
            lo = int(ends[vi - 1]) if vi else 0
            poss_out.append(buf[lo:int(ends[vi + c - 1])])
            vi += c
    return npos_out, poss_out
