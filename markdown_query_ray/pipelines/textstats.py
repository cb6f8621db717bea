"""Text-analysis pipelines over a documents-shaped table
(doc_id, text, lang, ...): token counting, term df/cf aggregates, quality
scoring, language-ID, document fingerprinting.

All hot paths are vectorized map_batches bodies; the df/cf aggregate
pre-aggregates inside each batch before the (small) groupby shuffle —
the partial/combiner pattern that keeps the wide step tiny at 100 TB.

Oracle notes: token semantics here are ``text.split(' ')`` (single-space
split, empties removed) — chosen because it is exactly reproducible in
ANSI SQL (string_split + list_filter), making these pipelines
DuckDB-checkable end to end.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

# fixed stopword list for quality scoring (shared with the oracle SQL)
STOPWORDS = ("the", "and", "for", "was", "with", "that", "this", "are",
             "from", "have", "a", "an", "of", "to", "in", "is", "it", "on")


def _tokens(text: str) -> list[str]:
    return [t for t in (text or "").split(" ") if t]


def token_count_batch(batch: pa.Table) -> pa.Table:
    counts = [len(_tokens(t)) for t in batch.column("text").to_pylist()]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(counts, pa.int64()),
    })


# BPE-style pre-tokenizer (GPT-2 shape, minus lookaheads so the identical
# pattern runs under RE2 in the DuckDB oracle): contraction suffixes,
# space-prefixed letter/digit/punct runs, whitespace runs.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


class BpeCountStage:
    """Stateful map_batches body: the compiled pattern lives once per actor
    (regex compilation of Unicode property classes is the setup cost)."""

    def __init__(self):
        import regex

        self.pat = regex.compile(BPE_PATTERN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        findall = self.pat.findall
        counts = [len(findall(t or ""))
                  for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_bpe_tokens": pa.array(counts, pa.int64()),
        })


def term_partials_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial (term, df, cf) rows — the combiner before the
    groupby(term) shuffle."""
    df: Counter = Counter()
    cf: Counter = Counter()
    for t in batch.column("text").to_pylist():
        toks = _tokens(t)
        cf.update(toks)
        df.update(set(toks))
    terms = sorted(df)
    return pa.table({
        "term": pa.array(terms, pa.string()),
        "df_part": pa.array([df[t] for t in terms], pa.int64()),
        "cf_part": pa.array([cf[t] for t in terms], pa.int64()),
    })


def term_df(ds, top_n: int | None = None):
    """(term, df, cf) via partial aggregation + small groupby shuffle."""
    from ray.data.aggregate import Sum

    parts = ds.map_batches(term_partials_batch, batch_format="pyarrow")
    agg = parts.groupby("term").aggregate(
        Sum("df_part", alias_name="df"),
        Sum("cf_part", alias_name="cf"))
    if top_n:
        agg = agg.sort(["df", "term"], descending=[True, False]).limit(top_n)
    return agg


def quality_batch(batch: pa.Table) -> pa.Table:
    """Integer quality features (stopword hits, token count, char count) —
    ratio computation left to the consumer so the columns stay exactly
    SQL-comparable."""
    stopset = set(STOPWORDS)
    n_stop, n_tok, n_chars = [], [], []
    for t in batch.column("text").to_pylist():
        toks = _tokens(t)
        n_tok.append(len(toks))
        n_stop.append(sum(1 for w in toks if w in stopset))
        n_chars.append(len(t or ""))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_tok, pa.int64()),
        "n_stopwords": pa.array(n_stop, pa.int64()),
        "n_chars": pa.array(n_chars, pa.int64()),
    })


# language-ID: tiny per-language frequent-word profiles (n-gram-free heuristic
# good enough for the synthetic corpus; a real system would plug a model into
# the same actor-pool stage).
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "with", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "que", "por"},
}


class LangIdStage:
    """Actor-pool stage: profiles built once per actor."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = []
        for t in batch.column("text").to_pylist():
            toks = set(_tokens((t or "").lower()))
            best, best_hits = "und", 0
            for lang in sorted(self.profiles):
                hits = len(toks & self.profiles[lang])
                if hits > best_hits:
                    best, best_hits = lang, hits
            preds.append(best)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(preds, pa.string()),
        })


_FNV_OFFSET = np.uint64(0xcbf29ce484222325)
_FNV_PRIME = np.uint64(0x100000001b3)


from ..functions.hashing import fnv1a_bytes  # canonical definition (re-export)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Order-sensitive rolling document fingerprint: FNV-1a over the token
    stream with position mixing."""
    fps = []
    for t in batch.column("text").to_pylist():
        h = 0xcbf29ce484222325
        for i, tok in enumerate(_tokens(t)):
            th = fnv1a_bytes(tok.encode("utf-8"))
            h = ((h ^ (th + i)) * 0x100000001b3) & 0xFFFFFFFFFFFFFFFF
        fps.append(h)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fingerprint": pa.array(fps, pa.uint64()),
    })
