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
    """Whitespace token count, vectorized: tokens are maximal runs of
    non-space chars (``text.split(" ")`` with empties dropped), counted by
    one Arrow RE2 kernel pass over the column."""
    import pyarrow.compute as pc

    counts = pc.count_substring_regex(
        pc.fill_null(batch.column("text"), ""), "[^ ]+")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": counts.cast(pa.int64()),
    })


# BPE-style pre-tokenizer (GPT-2 shape, minus lookaheads so the identical
# pattern runs under RE2 in the DuckDB oracle): contraction suffixes,
# space-prefixed letter/digit/punct runs, whitespace runs.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


class BpeCountStage:
    """BPE-ish token counting via Arrow's RE2 kernel — one vectorized
    ``count_substring_regex`` pass per batch, and the SAME regex engine
    the DuckDB oracle uses (``regexp_extract_all`` is RE2 too), so Ray and
    oracle agree by construction even on exotic whitespace where Python's
    ``regex`` module and RE2 diverge (e.g. \\x0b in \\s classes)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        counts = pc.count_substring_regex(
            pc.fill_null(batch.column("text"), ""), BPE_PATTERN)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_bpe_tokens": counts.cast(pa.int64()),
        })


class TokenCountsStage:
    """Whitespace + BPE-ish token counts fused into one per-batch pass —
    two RE2 kernel sweeps over the same (already materialized) string
    column, so one driver entry covers both counting rules with a single
    corpus read."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = pc.fill_null(batch.column("text"), "")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pc.count_substring_regex(
                col, "[^ ]+").cast(pa.int64()),
            "n_bpe_tokens": pc.count_substring_regex(
                col, BPE_PATTERN).cast(pa.int64()),
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


def distinct_partials_batch(batch: pa.Table, group_col: str = "lang"
                            ) -> pa.Table:
    """Map-side combine for exact distributed COUNT(DISTINCT token)
    per group: the batch's distinct (group, token-hash) pairs. Hashing
    (FNV-1a64, the shared identity) keeps the shuffle narrow — 16
    bytes/pair instead of the token strings."""
    groups = batch.column(group_col).to_pylist()
    texts = batch.column("text").to_pylist()
    from .dedup import shingle_hashes

    gs, hs = [], []
    for g, t in zip(groups, texts):
        h = np.unique(shingle_hashes(t or "", 1))
        gs.append(np.full(len(h), g, object))
        hs.append(h.view(np.int64))
    if not gs:
        return pa.table({group_col: pa.array([], pa.string()),
                         "tkey": pa.array([], pa.int64())})
    ga = np.concatenate(gs)
    ha = np.concatenate(hs)
    _, ginv = np.unique(ga, return_inverse=True)
    _, first = np.unique(np.stack([ginv, ha], axis=1), axis=0,
                         return_index=True)
    return pa.table({group_col: pa.array(ga[first].tolist(), pa.string()),
                     "tkey": pa.array(ha[first])})


def distinct_token_counts(ds, group_col: str = "lang"):
    """Exact COUNT(DISTINCT whitespace token) per group, no corpus-scale
    state anywhere: batch-distinct (group, token-hash) pairs -> one
    groupby([group, tkey]) global dedup -> per-batch (group, n) partials
    -> tiny groupby(group) sum. Token vocabularies at web scale exceed
    any single worker, which rules out ``map_groups`` per group — the
    pair groupby shards the vocabulary across the cluster instead."""
    from functools import partial as _partial

    from ray.data.aggregate import Sum

    pairs = ds.map_batches(
        _partial(distinct_partials_batch, group_col=group_col),
        batch_format="pyarrow")
    uniq = pairs.groupby([group_col, "tkey"]).count()

    def count_partials(b: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(b.select([group_col]),
                              [group_col]).aggregate([([], "count_all")])
        return agg.rename_columns([group_col, "n_part"])

    return uniq.map_batches(count_partials, batch_format="pyarrow") \
        .groupby(group_col).aggregate(Sum("n_part",
                                          alias_name="n_distinct"))


def quality_batch(batch: pa.Table) -> pa.Table:
    """Integer quality features (stopword hits, token count, char count) —
    ratio computation left to the consumer so the columns stay exactly
    SQL-comparable. Fully vectorized: token counts via one RE2 kernel
    pass; stopword hits (all occurrences, like the oracle's list_filter)
    via split + flatten + is_in + per-parent bincount."""
    import numpy as np
    import pyarrow.compute as pc

    col = pc.fill_null(batch.column("text"), "")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    n_tok = pc.count_substring_regex(col, "[^ ]+")
    parts = pc.split_pattern(col, " ")
    flat = pc.list_flatten(parts)
    parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    hit = pc.is_in(flat, value_set=pa.array(STOPWORDS)).to_numpy(
        zero_copy_only=False)
    n_stop = np.bincount(parent[hit], minlength=n) if len(parent) \
        else np.zeros(n, np.int64)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": n_tok.cast(pa.int64()),
        "n_stopwords": pa.array(n_stop.astype(np.int64)),
        "n_chars": pc.utf8_length(col).cast(pa.int64()),
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
    """Actor-pool stage: per-language profile-word table built once per
    actor. Vectorized scoring: lowercase + split + flatten once per batch,
    keep only profile words, dedupe (doc, word) pairs (hits count DISTINCT
    words), then one bincount per language; prediction is the
    lexicographically-first language with the strictly-highest hit count,
    'und' when nothing matches."""

    def __init__(self):
        self.langs = sorted(_LANG_PROFILES)
        uniq = sorted({w for p in _LANG_PROFILES.values() for w in p})
        self.words = pa.array(uniq, pa.string())
        self.word_index = {w: i for i, w in enumerate(uniq)}
        # a profile word may belong to several languages ("la": fr AND es)
        self.owners = np.zeros((len(uniq), len(self.langs)), np.int64)
        for li, lang in enumerate(self.langs):
            for w in _LANG_PROFILES[lang]:
                self.owners[self.word_index[w], li] = 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = pc.utf8_lower(pc.fill_null(batch.column("text"), ""))
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        parts = pc.split_pattern(col, " ")
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        keep = pc.is_in(flat, value_set=self.words).to_numpy(
            zero_copy_only=False)
        hits = np.zeros((n, len(self.langs)), np.int64)
        if keep.any():
            kept_parent = parent[keep]
            kept_words = pc.filter(flat, pa.array(keep)).to_pylist()
            wid = np.array([self.word_index[w] for w in kept_words], np.int64)
            pairs = np.unique(np.stack([kept_parent, wid], axis=1), axis=0)
            np.add.at(hits, pairs[:, 0], self.owners[pairs[:, 1]])
        best = hits.argmax(axis=1)  # first max in sorted-lang order
        langs_arr = np.array(self.langs, object)
        preds = np.where(hits.max(axis=1) > 0, langs_arr[best], "und")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(preds.tolist(), pa.string()),
        })


from ..functions.hashing import FNV_OFF, FNV_PRIME, fnv1a_bytes


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Order-sensitive rolling document fingerprint: FNV-1a over the token
    stream with position mixing. C fast path (one call per doc, no
    per-token Python); identical pure-Python fold as fallback."""
    from ..functions.ctok import load as _load_ctok

    ct = _load_ctok()
    fp_c = getattr(ct, "rolling_fingerprint64", None) if ct else None
    fps = []
    for t in batch.column("text").to_pylist():
        t = t or ""
        if fp_c is not None:
            fps.append(fp_c(t))
            continue
        h = FNV_OFF
        for i, tok in enumerate(_tokens(t)):
            th = fnv1a_bytes(tok.encode("utf-8"))
            # (th + i) wraps mod 2^64 — keeps the fold identical to the
            # C kernel's native uint64 arithmetic
            h = ((h ^ ((th + i) & 0xFFFFFFFFFFFFFFFF))
                 * FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
        fps.append(h)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fingerprint": pa.array(fps, pa.uint64()),
    })


def quality_repetition_batch(batch: pa.Table) -> pa.Table:
    """``quality_batch`` + ``repetition_batch`` fused into one per-doc
    pass, plus the rolling document fingerprint — one driver entry
    covers all three per-doc signal families (the length/stopword gate,
    the Gopher repetition gate and the fingerprint act on the same doc
    in a real curation pipeline anyway, so fusing them also cuts the
    corpus reads 3x). Shared doc_id/n_chars; integer columns throughout
    for the same SQL-exactness rationale as the parents."""
    q = quality_batch(batch)
    r = repetition_batch(batch)
    f = fingerprint_batch(batch)
    return pa.table({
        "doc_id": q.column("doc_id"),
        "n_tokens": q.column("n_tokens"),
        "n_stopwords": q.column("n_stopwords"),
        "n_chars": q.column("n_chars"),
        "top2gram_cov": r.column("top2gram_cov"),
        "top3gram_cov": r.column("top3gram_cov"),
        "dup5gram_cov": r.column("dup5gram_cov"),
        "fingerprint": f.column("fingerprint"),
    })


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition quality signals (Rae et al. 2021, public
    literature), word-n-gram variants (the corpus has no newlines, so the
    line-based rules are degenerate here):

    - ``top2gram_cov`` / ``top3gram_cov``: characters covered by the
      most frequent word n-gram (count * chars of the joined n-gram,
      ties broken toward the longest);
    - ``dup5gram_cov``: characters covered by all 5-grams occurring
      more than once (sum of count * chars; overlapping occurrences all
      count);
    - ``n_chars``: the denominator.

    INTEGER covered-chars + denominator, not ratios — same rationale as
    ``quality_batch``: exact binary fractions like 13/128 round-half
    differently in Python (half-even) and SQL (half-away), so the columns
    stay integers and exactly SQL-comparable; consumers divide.

    n-gram identity via the C shingle hash (64-bit FNV window hashes;
    collision odds ~1e-14 per doc); window char lengths from one
    cumulative-sum pass — no per-token Python in the loop body."""
    from .dedup import shingle_hashes

    ids = batch.column("doc_id")
    texts = batch.column("text").to_pylist()
    out = {"top2gram_cov": [], "top3gram_cov": [], "dup5gram_cov": []}
    n_chars = []
    for t in texts:
        t = t or ""
        n_chars.append(len(t))
        toks = _tokens(t)
        tok_lens = np.array([len(x) for x in toks], np.int64)
        cs = np.concatenate([[0], np.cumsum(tok_lens)])
        for key, n in (("top2gram_cov", 2), ("top3gram_cov", 3),
                       ("dup5gram_cov", 5)):
            if len(toks) < n:
                out[key].append(0)
                continue
            h = shingle_hashes(t, n)
            wchars = cs[n:] - cs[:-n] + (n - 1)
            u, first, counts = np.unique(h, return_index=True,
                                         return_counts=True)
            chars_u = wchars[first]
            if key == "dup5gram_cov":
                dup = counts > 1
                cov = int((counts[dup] * chars_u[dup]).sum())
            else:
                mc = counts.max()
                cov = int(mc * chars_u[counts == mc].max())
            out[key].append(cov)
    return pa.table({
        "doc_id": ids,
        "top2gram_cov": pa.array(out["top2gram_cov"], pa.int64()),
        "top3gram_cov": pa.array(out["top3gram_cov"], pa.int64()),
        "dup5gram_cov": pa.array(out["dup5gram_cov"], pa.int64()),
        "n_chars": pa.array(n_chars, pa.int64()),
    })


# ---------------------------------------------------------------------------
# Character-trigram statistical language ID (the "model-grade" shape the
# profile-word heuristic above stands in for): per-language trigram
# frequency profiles are TRAINED distributed over the labeled corpus
# (map-side partial counts -> one small groupby; driver state is bounded
# by |langs| x trigram vocabulary, <= 2^24 keys, never corpus rows),
# broadcast once via ray.put, and classification is a zero-shuffle
# vectorized map_batches pass. All scoring is fixed-point integer
# arithmetic (freq = cnt * 2^20 // tot) so a SQL oracle replays the whole
# model bit-for-bit. Trigram identity is defined on UTF-8 BYTES (the
# standard byte-n-gram model convention); on ASCII corpora — which the
# test tables are — byte trigrams coincide with the SQL oracle's
# substring(text, i, 3) character trigrams.
# ---------------------------------------------------------------------------

TRI_SCALE = 1 << 20  # fixed-point denominator for profile frequencies


def _tri_windows(col) -> tuple[np.ndarray, np.ndarray]:
    """All UTF-8-byte trigram keys of a string column, fully vectorized on
    the Arrow buffers: returns (keys, docidx) where keys = b0<<16|b1<<8|b2
    for every in-document 3-byte window (windows never cross documents)
    and docidx is sorted ascending."""
    import pyarrow.compute as pc

    col = pc.fill_null(col, "")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type):
        col = col.cast(pa.string())
    off = np.frombuffer(col.buffers()[1], np.int32)[
        col.offset: col.offset + len(col) + 1].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], np.uint8)[off[0]: off[-1]]
    off = off - off[0]
    n_bytes = int(off[-1])
    if n_bytes < 3:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    starts = np.arange(n_bytes - 2, dtype=np.int64)
    docidx = np.searchsorted(off[1:], starts, side="right")
    valid = starts + 3 <= off[docidx + 1]
    s, d = starts[valid], docidx[valid]
    keys = ((data[s].astype(np.int64) << 16)
            | (data[s + 1].astype(np.int64) << 8)
            | data[s + 2].astype(np.int64))
    return keys, d


def tri_profile_partial(batch: pa.Table) -> pa.Table:
    """Map-side combiner for profile training: (lang, tri_key, cnt)
    partial counts for one batch — only the combined counts shuffle.
    Every lang present in the batch also emits a (lang, -1, 0) sentinel
    row so trigram-less languages survive the aggregate: the language
    UNIVERSE must be every distinct lang in the corpus (the SQL oracle
    cross-joins DISTINCT lang), not just the ones that produced
    trigrams — otherwise all-zero-score docs can resolve to a different
    lexicographically-first language than the oracle's."""
    langs = np.asarray(batch.column("lang").to_pylist(), object)
    uniq_langs = np.unique(langs) if len(langs) else langs
    sentinel_lang = uniq_langs.tolist()
    sentinel_key = np.full(len(uniq_langs), -1, np.int64)
    sentinel_cnt = np.zeros(len(uniq_langs), np.int64)
    keys, d = _tri_windows(batch.column("text"))
    if not len(keys):
        return pa.table({
            "lang": pa.array(sentinel_lang, pa.string()),
            "tri_key": pa.array(sentinel_key),
            "cnt": pa.array(sentinel_cnt),
        })
    inv = np.searchsorted(uniq_langs, langs)
    combo = inv[d].astype(np.int64) * (1 << 24) + keys
    u, c = np.unique(combo, return_counts=True)
    return pa.table({
        "lang": pa.array(
            uniq_langs[(u >> 24)].tolist() + sentinel_lang, pa.string()),
        "tri_key": pa.array(np.concatenate(
            [u & ((1 << 24) - 1), sentinel_key])),
        "cnt": pa.array(np.concatenate(
            [c.astype(np.int64), sentinel_cnt])),
    })


def ngram_lang_profiles(ds, scale: int = TRI_SCALE):
    """Train per-language trigram profiles over a labeled Dataset.
    Returns (sorted lang list, {lang: (sorted tri keys, scaled freqs)}).
    Driver state is the aggregated profile table only — bounded by
    |langs| x 2^24, independent of corpus row count."""
    from ray.data.aggregate import Sum

    from .equijoin import collect_arrow

    agg = ds.map_batches(tri_profile_partial, batch_format="pyarrow") \
        .groupby(["lang", "tri_key"]).aggregate(Sum("cnt", alias_name="cnt"))
    t = collect_arrow(agg, pa.schema([
        ("lang", pa.string()), ("tri_key", pa.int64()),
        ("cnt", pa.int64())]))
    # one global (lang, tri_key) lexsort, then per-lang runs sliced by
    # searchsorted — O(rows log rows) total instead of the former
    # per-lang full-table filter (O(|langs| x rows))
    all_langs = np.asarray(t.column("lang").to_pylist(), dtype=object)
    all_keys = t.column("tri_key").to_numpy().astype(np.int64)
    all_cnt = t.column("cnt").to_numpy().astype(np.int64)
    order = np.lexsort((all_keys, all_langs))
    all_langs, all_keys, all_cnt = (all_langs[order], all_keys[order],
                                    all_cnt[order])
    langs = sorted(set(all_langs.tolist()))
    lo = np.searchsorted(all_langs, np.asarray(langs, dtype=object), "left")
    hi = np.searchsorted(all_langs, np.asarray(langs, dtype=object), "right")
    prof: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for lang, a, b in zip(langs, lo, hi):
        keys = all_keys[a:b]
        cnt = all_cnt[a:b]
        real = keys >= 0  # drop the lang-universe sentinel rows
        keys, cnt = keys[real], cnt[real]
        tot = int(cnt.sum())
        if tot == 0:  # lang exists in the corpus but has no trigrams
            prof[lang] = (keys[:0], cnt[:0])
            continue
        assert tot * scale < 2 ** 63, "profile counts overflow fixed point"
        prof[lang] = (keys, (cnt * scale) // tot)
    return langs, prof


class NgramLangIdStage:
    """Actor-pool classifier: profiles fetched from the object store once
    per actor; per batch one vectorized trigram pass + one searchsorted
    lookup per language. Prediction = highest integer score, ties to the
    lexicographically-first language (matching the SQL oracle's
    ORDER BY score DESC, lang); documents shorter than one trigram
    predict 'und' with score 0."""

    def __init__(self, prof_ref):
        import ray

        self._langs, self._prof = ray.get(prof_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if not self._langs:  # corpus produced no language universe at all
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(["und"] * n, pa.string()),
                "score": pa.array(np.zeros(n, np.int64)),
            })
        keys, d = _tri_windows(batch.column("text"))
        scores = np.zeros((len(self._langs), n), np.int64)
        if len(keys):
            for li, lang in enumerate(self._langs):
                pk, pf = self._prof[lang]
                if not len(pk):
                    continue
                pos = np.minimum(np.searchsorted(pk, keys), len(pk) - 1)
                contrib = np.where(pk[pos] == keys, pf[pos], 0)
                # bincount sums in float64: exact while any per-doc score
                # stays below 2^53 (scale 2^20 x <2^33 windows per doc)
                scores[li] = np.bincount(
                    d, weights=contrib.astype(np.float64),
                    minlength=n).astype(np.int64)
        has_tri = np.bincount(d, minlength=n) > 0 if len(keys) \
            else np.zeros(n, bool)
        best = scores.argmax(axis=0)  # first max = lexicographic tiebreak
        langs_arr = np.asarray(self._langs, object)
        preds = np.where(has_tri, langs_arr[best], "und")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(preds.tolist(), pa.string()),
            "score": pa.array(np.where(has_tri, scores.max(axis=0), 0)),
        })
