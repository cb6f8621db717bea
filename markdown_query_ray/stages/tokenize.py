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

import pyarrow as pa

from ..config import IndexConfig
from ..functions.snowball import CachingStemmer
from ..functions.xapian_tokenizer import simple_tokenize, term_counts, tokenize


class TokenizeStage:
    def __init__(self, cfg: IndexConfig):
        self.cfg = cfg
        self.stemmer = CachingStemmer() if cfg.stem else None
        self.tokenize = tokenize if cfg.tokenizer == "xapian" \
            else simple_tokenize

    def __call__(self, batch: pa.Table) -> pa.Table:
        max_bytes = self.cfg.max_term_bytes
        terms_col: list[list[str]] = []
        tfs_col: list[list[int]] = []
        doclens: list[int] = []
        for text in batch.column("text").to_pylist():
            counts = term_counts(self.tokenize(text or "", max_bytes),
                                 stemmer=self.stemmer)
            # sorted term order: deterministic output regardless of dict order
            items = sorted(counts.items())
            terms_col.append([t for t, _ in items])
            tfs_col.append([c for _, c in items])
            doclens.append(sum(counts.values()))
        cols = {
            "doc_id": batch.column("doc_id"),
            "url": batch.column("url"),
            "doclen": pa.array(doclens, pa.uint32()),
            "terms": pa.array(terms_col, pa.list_(pa.string())),
            "tfs": pa.array(tfs_col, pa.list_(pa.uint32())),
        }
        return pa.table(cols)
