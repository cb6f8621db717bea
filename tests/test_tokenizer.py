"""Conformance tests for the Xapian-semantics tokenizer (SURVEY.md §2.3 T1-T5).

Each rule of xapian-core-1.4.17/queryparser/termgenerator_internal.cc:140-247
gets a case; expected outputs derived by tracing the C source.
"""

from markdown_query_ray.functions.snowball import CachingStemmer
from markdown_query_ray.functions.xapian_tokenizer import (
    simple_tokenize,
    term_counts,
    tokenize,
)


def test_basic_words():
    assert tokenize("Hello World") == ["hello", "world"]
    assert tokenize("foo bar baz") == ["foo", "bar", "baz"]


def test_acronym_rule():
    assert tokenize("U.N.C.L.E") == ["uncle"]
    assert tokenize("U.N.C.L.E.") == ["uncle"]
    assert tokenize("P.T.O") == ["pto"]
    assert tokenize("see M&S today") == ["see", "m&s", "today"]
    # acronym followed by a word char fails and falls back to single letters
    assert tokenize("A.B.CD") == ["a", "b", "cd"]
    assert tokenize("A.B.C.d") == ["a", "b", "c", "d"]
    assert tokenize("A.B.C-x") == ["abc", "x"]
    assert tokenize("A.B..") == ["ab"]
    # single uppercase letter is not an acronym
    assert tokenize("A. line") == ["a", "line"]
    # mid-word uppercase does not trigger the acronym path
    assert tokenize("xU.N.C") == ["xu", "nc"]


def test_infix_letters():
    assert tokenize("AT&T") == ["at&t"]
    assert tokenize("it's") == ["it's"]
    assert tokenize("l'école") == ["l'école"]
    # Unicode apostrophes normalize to ASCII '
    assert tokenize("don’t") == ["don't"]
    assert tokenize("don‛t") == ["don't"]
    # separator at end of word run does not join
    assert tokenize("a'' b") == ["a", "b"]
    assert tokenize("ab' cd") == ["ab", "cd"]
    # apostrophe does not join two digits
    assert tokenize("1'2") == ["1", "2"]
    # but does join digit-letter and letter-digit
    assert tokenize("a'1") == ["a'1"]
    assert tokenize("1'a") == ["1'a"]


def test_infix_digits():
    assert tokenize("1,000,000") == ["1,000,000"]
    assert tokenize("3.14") == ["3.14"]
    assert tokenize("1.a") == ["1", "a"]
    assert tokenize("a.1") == ["a", "1"]
    assert tokenize("a.b") == ["a", "b"]
    assert tokenize("1;2") == ["1;2"]


def test_zero_width_joins():
    assert tokenize("ab​cd") == ["abcd"]
    assert tokenize("ab‍cd") == ["abcd"]
    assert tokenize("1​2") == ["12"]
    # two zero-width chars in a row break the term
    assert tokenize("ab​​cd") == ["ab", "cd"]
    # trailing zero-width char is dropped
    assert tokenize("ab​") == ["ab"]


def test_suffix_rule():
    assert tokenize("C++") == ["c++"]
    assert tokenize("C#") == ["c#"]
    assert tokenize("c+++") == ["c+++"]
    assert tokenize("c++++") == ["c"]
    assert tokenize("fish+chips") == ["fish", "chips"]
    assert tokenize("1+2") == ["1", "2"]
    assert tokenize("C++ rocks") == ["c++", "rocks"]


def test_max_term_length():
    long_tok = "x" * 70
    assert tokenize(f"keep {long_tok} kept") == ["keep", "kept"]
    assert tokenize("y" * 64) == ["y" * 64]
    assert tokenize("y" * 65) == []
    # byte length, not char length: 33 two-byte chars = 66 bytes
    assert tokenize("é" * 33) == []
    assert tokenize("é" * 32) == ["é" * 32]


def test_unicode_words():
    assert tokenize("naïve café") == ["naïve", "café"]
    assert tokenize("Größe") == ["größe"]
    assert tokenize("под_черк") == ["под_черк"]  # Pc joins
    assert tokenize("²³ squared") == ["²³", "squared"]  # No category


def test_no_stopwords():
    # the reference sets no stopper: "the" and friends are real terms
    assert tokenize("the a an of") == ["the", "a", "an", "of"]


def test_term_counts_with_stems():
    st = CachingStemmer()
    counts = term_counts(tokenize("running runs run the"), stemmer=st)
    # surface forms
    assert counts["running"] == 1 and counts["runs"] == 1 and counts["run"] == 1
    assert counts["the"] == 1
    # Z-stems: running->run, runs->run, run->run merge into Zrun with wdf 3
    assert counts["Zrun"] == 3
    assert counts["Zthe"] == 1
    # doclen = sum of all wdf including Z duplicates
    assert sum(counts.values()) == 8


def test_digit_terms_not_stemmed():
    st = CachingStemmer()
    counts = term_counts(tokenize("123 abc"), stemmer=st)
    assert "Z123" not in counts
    assert counts["Zabc"] == 1


def test_simple_tokenize():
    assert simple_tokenize("The Fast fox") == ["the", "fast", "fox"]
    # SINGLE-SPACE split (the documented DuckDB-oracle contract:
    # string_split(text, ' ') + list_filter): tabs/newlines stay inside
    # tokens, exactly as the SQL sees them — any-whitespace splitting
    # would silently diverge from the oracle on multi-line text
    assert simple_tokenize("a  b\tc\n") == ["a", "b\tc\n"]
    assert simple_tokenize("a  b c") == ["a", "b", "c"]


def test_empty_and_punct_only():
    assert tokenize("") == []
    assert tokenize("!!! --- ...") == []


# ---------------------------------------------------------------------------
# C fast path (functions/_ctok.c): must be byte-identical to the Python
# implementation on every pure-ASCII input. Skipped when no C compiler is
# available (the engine then runs the Python path everywhere).
# ---------------------------------------------------------------------------

import pytest

from markdown_query_ray.functions import ctok
from markdown_query_ray.functions.xapian_tokenizer import (
    fast_term_counts,
    fast_tokenize,
)

_ct = ctok.load()
needs_ctok = pytest.mark.skipif(_ct is None, reason="no C compiler")

_ASCII_CORNERS = [
    "U.N.C.L.E", "U.N.C.L.E.", "A.B.CD", "A.B.C.d", "A.B.C-x", "A.B..",
    "xU.N.C", "AT&T", "it's", "1,000", "c++", "c#", "fish+chips", "c++++",
    "c++x", "x" * 64, "x" * 65, "A.B", "A.B.", "1.5", "3.14.15", "a&1",
    "1&a", "1&2", "a'b'c", "don''t", "A.", ".A.", "_foo_bar_", "12,34,56",
    "1,,2", "end.", "I.B.M.'s", "A.B.C+", "A.B.C#x", "1;2;3", "x+#+",
    "+#x", "a&&b", "", "   ", "...", "C++0x",
]


@needs_ctok
def test_ctok_matches_python_on_corners():
    for s in _ASCII_CORNERS:
        assert _ct.tokenize_ascii(s, 64) == tokenize(s), repr(s)
        assert _ct.count_ascii_terms(s, 64) == dict(
            term_counts(tokenize(s))), repr(s)


@needs_ctok
def test_ctok_fuzz_parity():
    import random
    import string

    rng = random.Random(0xC70C)
    alpha = string.ascii_letters + string.digits + "_.'&+#,; \t\n" + '"-:/()'
    for _ in range(4000):
        s = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 60)))
        assert _ct.tokenize_ascii(s, 64) == tokenize(s), repr(s)
        assert _ct.count_ascii_terms(s, 64) == dict(
            term_counts(tokenize(s))), repr(s)


def test_fast_wrappers_dispatch_and_match():
    stem = CachingStemmer()
    texts = [
        "The U.N.C.L.E agents' c++ code costs 1,000 dollars at AT&T",
        "naïve café résumé — l'école",  # non-ASCII: python path
        "",
    ]
    for t in texts:
        assert fast_tokenize(t) == tokenize(t)
        assert dict(fast_term_counts(t, stemmer=stem)) == dict(
            term_counts(tokenize(t), stemmer=stem))


@needs_ctok
def test_ctok_positions_fuzz_parity():
    """count_ascii_terms_positions (fused C) is byte-identical to the
    Python path (term_counts + position_payloads) — counts AND varint
    position payloads."""
    import random
    import string

    from markdown_query_ray.functions.xapian_tokenizer import (
        position_payloads,
    )

    rng = random.Random(0x905)
    alpha = string.ascii_letters + string.digits + "_.'&+#,; \t\n" + '"-:/()'
    cases = [""] + ["".join(rng.choice(alpha)
                            for _ in range(rng.randint(0, 80)))
                    for _ in range(2000)]
    for s in cases:
        cp = _ct.count_ascii_terms_positions(s, 64)
        toks = tokenize(s)
        assert {t: v[0] for t, v in cp.items()} == dict(term_counts(toks)), \
            repr(s)
        assert dict(cp) == position_payloads(toks), repr(s)


def test_fast_positional_counts_dispatch():
    """The stage-facing wrapper: C path for ASCII, Python path otherwise,
    identical results, and Z-stems carry wdf but no positions."""
    from markdown_query_ray.functions.xapian_tokenizer import (
        fast_positional_counts,
        position_payloads,
    )

    stem = CachingStemmer()
    for text in ["the merges merging mergers 1,000 c++",
                 "naïve café the naïve"]:
        counts, pos_of = fast_positional_counts(text, stemmer=stem)
        toks = tokenize(text)
        assert counts == dict(term_counts(toks, stemmer=stem))
        assert dict(pos_of) == position_payloads(toks)
        for z in [t for t in counts if t.startswith("Z")]:
            assert z not in pos_of


@needs_ctok
def test_fnv1a64_offsets_matches_python():
    import numpy as np
    import pyarrow as pa

    from markdown_query_ray.functions.hashing import (
        fnv1a64_strings,
        fnv1a_bytes,
    )

    words = ["", "a", "hello", "naïve", "x" * 100, "1,000", "AT&T"] * 3
    for typ in (pa.string(), pa.large_string()):
        arr = pa.array(words, typ)
        expect = np.array([fnv1a_bytes(w.encode("utf-8")) for w in words],
                          np.uint64)
        assert np.array_equal(fnv1a64_strings(arr), expect)
        # sliced arrays (non-zero offset) hash the right windows
        assert np.array_equal(fnv1a64_strings(arr.slice(2, 5)), expect[2:7])


@needs_ctok
def test_fnv1a128_offsets_matches_python():
    import numpy as np
    import pyarrow as pa

    from markdown_query_ray.functions.hashing import (
        fnv1a128_bytes,
        fnv1a128_strings,
    )

    words = ["", "a", "hello", "naïve", "x" * 100, "1,000", "AT&T"] * 3
    vals = [fnv1a128_bytes(w.encode("utf-8")) for w in words]
    exp_lo = np.array([v & 0xFFFFFFFFFFFFFFFF for v in vals], np.uint64)
    exp_hi = np.array([v >> 64 for v in vals], np.uint64)
    for typ in (pa.string(), pa.large_string()):
        arr = pa.array(words, typ)
        lo, hi = fnv1a128_strings(arr)
        assert np.array_equal(lo, exp_lo) and np.array_equal(hi, exp_hi)
        lo_s, hi_s = fnv1a128_strings(arr.slice(2, 5))
        assert np.array_equal(lo_s, exp_lo[2:7])
        assert np.array_equal(hi_s, exp_hi[2:7])


@needs_ctok
def test_shingle_hashes_c_matches_numpy_fallback():
    import numpy as np

    from markdown_query_ray.pipelines.dedup import (
        _fnv1a_u64_rows,
        shingle_hashes,
    )
    from markdown_query_ray.functions.hashing import fnv1a_bytes

    def py_shingles(text, w):
        toks = [t for t in (text or "").split(" ") if t]
        if not toks:
            return np.empty(0, np.uint64)
        th = np.array([fnv1a_bytes(t.encode("utf-8")) for t in toks],
                      np.uint64)
        win = th[None, :] if len(th) < w else \
            np.lib.stride_tricks.sliding_window_view(th, w)
        return _fnv1a_u64_rows(win)

    cases = ["", " ", "a", "a b c d e", "  double  spaces ",
             "naïve café s’il", "tab\tnot a split", "x " * 50]
    for s in cases:
        for w in (1, 2, 3, 5):
            assert np.array_equal(shingle_hashes(s, w), py_shingles(s, w)), \
                (repr(s), w)
