"""Sequential oracle: single-process reference implementation of the engine's
semantics (SURVEY.md §5.2 item 3). Deliberately naive — dict postings, per-doc
loops — so it shares no code path with the distributed engine beyond the
tokenizer functions (which have their own conformance goldens)."""

from __future__ import annotations

import math

import pyarrow.parquet as pq

from markdown_query_ray.config import BM25Params
from markdown_query_ray.functions.snowball import CachingStemmer
from markdown_query_ray.functions.xapian_tokenizer import (
    simple_tokenize,
    term_counts,
    tokenize,
)
from markdown_query_ray.stages.extract import extract_text


class OracleIndex:
    def __init__(self, paths: list[str], use_html: bool = True,
                 tokenizer: str = "xapian", stem: bool = True):
        self.postings: dict[str, dict[int, int]] = {}
        self.doclen: dict[int, int] = {}
        self.urls: dict[int, str] = {}
        stemmer = CachingStemmer() if stem else None
        tok = tokenize if tokenizer == "xapian" else simple_tokenize
        doc_id = 0
        for path in sorted(paths):
            t = pq.read_table(path)
            for row in t.to_pylist():
                text = extract_text(row["html"]) if use_html else row["text"]
                counts = term_counts(tok(text or ""), stemmer=stemmer)
                for term, tf in counts.items():
                    self.postings.setdefault(term, {})[doc_id] = tf
                self.doclen[doc_id] = sum(counts.values())
                self.urls[doc_id] = row["url"]
                doc_id += 1
        self.n_docs = doc_id
        self.avg_doclen = (sum(self.doclen.values()) / doc_id) if doc_id else 0

    def term_weight(self, term: str, params: BM25Params, wqf: int = 1) -> float:
        df = len(self.postings.get(term, {}))
        if df == 0:
            return 0.0
        tw = (self.n_docs - df + 0.5) / (df + 0.5)
        if params.idf_floor and tw < 2:
            tw = tw * 0.5 + 1
        w = math.log(tw)
        if not params.idf_floor and w < 0:
            w = 0.0  # classic profile clamps negative idf (matches engine)
        if params.wqf_factor and params.k3 != 0:
            w *= (params.k3 + 1) * wqf / (params.k3 + wqf)
        if params.k1_plus_1_factor:
            w *= params.k1 + 1
        return w

    def sumpart(self, params: BM25Params, w: float, wdf: int,
                doclen: int) -> float:
        if self.avg_doclen > 0 and params.b != 0 and params.k1 != 0:
            normlen = max(doclen / self.avg_doclen, params.min_normlen)
        else:
            normlen = params.min_normlen
        denom = params.k1 * (normlen * params.b + (1 - params.b)) + wdf
        return w * (wdf / denom)

    def score_or(self, terms: list[str], params: BM25Params
                 ) -> dict[int, float]:
        """Weighted-OR BM25 scores, per-doc sum in query-term order."""
        scores: dict[int, float] = {}
        for term in terms:
            w = self.term_weight(term, params)
            for doc, tf in self.postings.get(term, {}).items():
                scores[doc] = scores.get(doc, 0.0) + \
                    self.sumpart(params, w, tf, self.doclen[doc])
        return scores

    def topk(self, scores: dict[int, float], k: int
             ) -> list[tuple[float, int]]:
        return sorted(((s, d) for d, s in scores.items()),
                      key=lambda t: (-t[0], t[1]))[:k]
