"""Unicode tokenizer reproducing the reference's text->terms semantics.

The reference tokenizes through xapian-core's TermGenerator
(xapian-core-1.4.17/queryparser/termgenerator_internal.cc:140-247). The rules,
re-implemented here from that public source's behavior:

- word characters are Unicode categories L*, M*, N*, Pc
  (include/xapian/unicode.h:343-358); terms are lowercased per codepoint.
- acronym rule: >=2 uppercase ASCII letters separated by '.', with a trailing
  '.' consumed if present, failing when followed by a word char
  (``U.N.C.L.E`` -> ``uncle``; termgenerator_internal.cc:155-174).
- infix joins between letters: ``'`` ``&`` U+00B7 U+05F4 U+2027 (and U+2019 /
  U+201B normalized to ``'``) when both neighbours are word chars and not both
  digits (``AT&T`` -> ``at&t``, ``it's`` -> ``it's``;
  termgenerator_internal.cc:80-96, 213-219).
- infix joins between digits: ``, . ;`` U+037E U+0589 U+060D U+07F8 U+2044
  U+FE10 U+FE13 U+FE14 (``1,000`` -> ``1,000``;
  termgenerator_internal.cc:98-119).
- zero-width chars U+200B..U+200D, U+2060, U+FEFF are joined over and dropped
  (termgenerator_internal.cc:93-94).
- suffix rule: up to 3 trailing ``+``/``#`` kept unless followed by a word
  char or a 4th suffix char (``c++``, ``c#``, but ``fish+chips`` -> ``fish``,
  ``chips``; termgenerator_internal.cc:227-241).
- terms longer than 64 UTF-8 bytes are dropped entirely
  (termgenerator_internal.h:48-49, check at termgenerator_internal.cc:264).
- NO stopwords: the reference never sets a stopper (STOP_NONE effective).

Implemented as one compiled ``regex`` pattern plus a small post-pass — the
hot path is regex-engine C code, not a Python char loop.

Character classification and lowercasing come from ``_xapian_unicode``,
GENERATED from the reference library's own compiled Unicode tables
(tools/gen_unicode_tables.py + the oracle's ``unitable`` mode) — not from
Python's: xapian 1.4.17 predates ~30k currently-assigned codepoints, so a
\\p{L}-style class would join terms the reference splits, and xapian's
single-codepoint tolower differs from Python's full case map inside terms
at U+0130. tests/test_tokenizer_parity.py fuzzes multilingual text through
the real TermGenerator and asserts identical term/wdf/position streams.
"""

from __future__ import annotations

from bisect import bisect_right
from collections import Counter

import regex

import numpy as np

from ._xapian_unicode import (
    DIGIT_CLASS,
    DIVERGENT_FLAT,
    STEM_FLAT,
    TOLOWER,
    WORDCHAR_CLASS,
)
# Letter-context infix joiners (U+2019/U+201B normalized to ' in post-pass).
_LSEP = "['&·״‧’‛]"
# Digit-context infix joiners.
_DSEP = "[,.;;։؍߸⁄︐︓︔]"
# Zero-width "ignore" characters, joined over and stripped from the term.
_ZW = "[​‌‍⁠﻿]"

def _build_pattern(wc: str, nd: str):
    """Compile the term pattern over word-char class ``wc`` / digit class
    ``nd``:

    - infix joins: digit-sep between two digits, letter-sep when the
      neighbours are not both digits, zero-width chars joined over.
    - acronym: the (?>...) atomic group mirrors xapian's no-backtracking
      consume — on failure the whole alternative fails and the general term
      is tried at the same position (``A.B.CD`` -> a, b, cd — not ``ab``).
      A '.' directly after the pairs is always consumed (p advances past it
      in the C loop) and the acronym then fails if a word char follows.
    - general term: word-char runs joined by infixes, optional +/# suffix.
    """
    sep = (
        rf"(?:(?<={nd}){_DSEP}(?={nd})"
        rf"|(?<!{nd}){_LSEP}(?={wc})"           # prev not digit
        rf"|{_LSEP}(?=(?!{nd}){wc})"            # next not digit
        rf"|{_ZW}(?={wc}))"
    )
    acronym = rf"(?P<acr>[A-Z](?>\.[A-Z])+)(?:\.(?!{wc})|(?![.])(?!{wc}))"
    term = rf"(?P<term>{wc}+(?:{sep}{wc}+)*(?:[+#]{{1,3}}(?![+#]|{wc}))?)"
    return regex.compile(rf"(?:{acronym}|{term})", regex.V1)


# Exact pattern: classes generated from xapian's OWN tables — correct for
# every codepoint, but a 703-range explicit class the engine scans linearly
# (~6x slower than property bitmaps).
_TOKEN_RE_EXACT = _build_pattern(WORDCHAR_CLASS, DIGIT_CLASS)
# Fast pattern: the regex module's property bitmaps. Identical behavior on
# any text containing no DIVERGENT codepoint (newer-Unicode assignments
# xapian 1.4.17 splits on, plus U+0130) — the common case, dispatched by a
# vectorized interval-membership guard (~54 MB/s vs ~0.6 for exact findall).
_TOKEN_RE_FAST = _build_pattern(r"[\p{L}\p{M}\p{N}\p{Pc}]", r"\p{Nd}")

_DIV_FLAT = np.asarray(DIVERGENT_FLAT, dtype=np.uint32)


def _pattern_for(text: str):
    if text.isascii():
        return _TOKEN_RE_FAST
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    if (np.searchsorted(_DIV_FLAT, cps, side="right") & 1).any():
        return _TOKEN_RE_EXACT
    return _TOKEN_RE_FAST

_POST_CHARS = "’‛​‌‍⁠﻿"
_POST_TABLE = {0x2019: "'", 0x201b: "'", 0x200b: None, 0x200c: None,
               0x200d: None, 0x2060: None, 0xfeff: None}
# Per-codepoint xapian tolower fused with the post-pass above, for the two
# characters where Python's str.lower() diverges INSIDE a term: U+0130
# (full case map: i + combining dot; xapian: plain i) and U+03A3 (Python's
# context-sensitive final sigma: xapian always maps to U+03C3).
_EXACT_LOWER = dict(TOLOWER)
_EXACT_LOWER.update(_POST_TABLE)


def tokenize(text: str, max_term_bytes: int = 64) -> list[str]:
    """Return the term stream for ``text`` (lowercased, in document order).

    Hot path: ``findall`` returns (acronym, term) group tuples in one C
    call (no per-token Match objects); ASCII terms take ``str.lower`` (same
    result as xapian's table there); non-ASCII terms take str.lower + a
    post-pass, except Σ/İ terms which need the per-codepoint table."""
    out = []
    append = out.append
    for acr, term in _pattern_for(text).findall(text):
        if acr:
            term = acr.replace(".", "").lower()
            if len(term) <= max_term_bytes:
                append(term)
            continue
        if term.isascii():
            term = term.lower()
            if len(term) <= max_term_bytes:
                append(term)
            continue
        if "Σ" in term or "İ" in term:
            term = term.translate(_EXACT_LOWER)
        else:
            term = term.lower()
            for ch in _POST_CHARS:
                if ch in term:
                    term = term.translate(_POST_TABLE)
                    break
        if term.isascii():  # normalization may have made it ASCII
            if len(term) <= max_term_bytes:
                append(term)
        elif len(term.encode("utf-8")) <= max_term_bytes:
            append(term)
    return out


def simple_tokenize(text: str, max_term_bytes: int = 64) -> list[str]:
    """Lowercase SINGLE-SPACE tokenizer ("simple" mode) — exactly
    reproducible in ANSI SQL (string_split on ' ' + list_filter), the same
    convention pipelines/textstats.py documents. ``str.split()`` (any
    whitespace) would silently diverge from the DuckDB oracle on any text
    containing tabs or newlines."""
    return [t for t in text.lower().split(" ")
            if t and len(t) <= max_term_bytes]


def should_stem(term: str) -> bool:
    """STEM_SOME gate: stem only terms starting with a lower/title/modifier/
    other-case letter (digits and symbols are not stemmed;
    termgenerator_internal.cc:63-73), per xapian's OWN category tables
    (STEM_FLAT intervals): a-z fast path for ASCII, interval bisect
    otherwise (odd index = inside a stemmable range)."""
    if not term:
        return False
    c = term[0]
    if c.isascii():
        return "a" <= c <= "z"
    return bool(bisect_right(STEM_FLAT, ord(c)) & 1)


def _load_ctok():
    """The compiled ASCII fast path (functions/_ctok.c), or None. Resolved
    lazily so importing this module never triggers a compile."""
    from .ctok import load

    return load()


def fast_tokenize(text: str, max_term_bytes: int = 64):
    """`tokenize` with the C fast path for pure-ASCII text (identical output,
    enforced by tests/test_tokenizer.py's fuzz parity suite)."""
    if text.isascii():
        ct = _load_ctok()
        if ct is not None:
            return ct.tokenize_ascii(text, max_term_bytes)
    return tokenize(text, max_term_bytes)


def fast_term_counts(text: str, stemmer=None, max_term_bytes: int = 64):
    """(term -> wdf) map for one document straight from text: the composition
    ``term_counts(tokenize(text))`` with tokenization AND counting done in C
    for pure-ASCII text. Returns a plain dict on the C path (same contents)."""
    if text.isascii():
        ct = _load_ctok()
        if ct is not None:
            counts = ct.count_ascii_terms(text, max_term_bytes)
            if stemmer is not None:
                zcounts: dict = {}
                zget = zcounts.get
                for term, n in counts.items():
                    # ASCII terms are already lowercased: stemmable iff the
                    # first char is a lowercase letter (STEM_SOME gate)
                    if "a" <= term[0] <= "z":
                        k = "Z" + stemmer(term)
                        zcounts[k] = zget(k, 0) + n
                counts.update(zcounts)
            return counts
    return term_counts(tokenize(text, max_term_bytes), stemmer=stemmer)


def fast_positional_counts(text: str, stemmer=None,
                           max_term_bytes: int = 64):
    """Positional analog of :func:`fast_term_counts`: returns
    ``(term -> wdf incl. Z-stems, term -> (npos, varint position payload))``
    for one document, with tokenize + count + position packing fused in C
    for pure-ASCII text (byte-identical to the Python fallback; positions
    are 1-based token indices delta-packed [first, gap, ...],
    termgenerator_internal.cc:269-277). Z-stems carry wdf only — STEM_SOME
    adds stems as non-positional postings."""
    if text.isascii():
        ct = _load_ctok()
        if ct is not None and hasattr(ct, "count_ascii_terms_positions"):
            cp = ct.count_ascii_terms_positions(text, max_term_bytes)
            counts = {t: v[0] for t, v in cp.items()}
            if stemmer is not None:
                zget = counts.get
                zadd: dict = {}
                for term, n in counts.items():
                    if "a" <= term[0] <= "z":
                        k = "Z" + stemmer(term)
                        zadd[k] = zadd.get(k, 0) + n
                for k, n in zadd.items():
                    counts[k] = zget(k, 0) + n
            return counts, cp
    toks = tokenize(text, max_term_bytes)
    return term_counts(toks, stemmer=stemmer), position_payloads(toks)


def position_payloads(tokens: list[str]) -> dict:
    """(term -> (npos, varint position payload)) from a token stream:
    1-based positions delta-packed [first, gap, ...] — the pure-Python
    equivalent of the C fused path's payloads (byte-identical)."""
    from ..index.codec import encode_varints
    import numpy as np

    pos_map: dict[str, list[int]] = {}
    for i, t in enumerate(tokens):
        pos_map.setdefault(t, []).append(i + 1)
    pos_of: dict = {}
    for t, plist in pos_map.items():
        orig = np.asarray(plist, np.uint64)
        deltas = np.empty_like(orig)
        deltas[0] = orig[0]
        deltas[1:] = orig[1:] - orig[:-1]
        payload, _ = encode_varints(deltas)
        pos_of[t] = (len(plist), payload.tobytes())
    return pos_of


def term_counts(tokens: list[str], stemmer=None) -> Counter:
    """(term -> wdf) map for one document, STEM_SOME style: every unstemmed
    token counts 1, and each stemmable token also adds 1 to its ``Z``-prefixed
    stem (termgenerator_internal.cc:269-312). Document length is the sum of
    all wdf values including the Z-duplicates — the Xapian doclen definition
    (glass_database.cc:1121-1131) that BM25 rank-identity depends on."""
    counts: Counter = Counter(tokens)
    if stemmer is not None:
        zcounts: Counter = Counter()
        for term, n in counts.items():
            if should_stem(term):
                zcounts["Z" + stemmer(term)] += n
        counts.update(zcounts)
    return counts
