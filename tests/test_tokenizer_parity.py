"""Full-Unicode tokenizer identity vs the REAL xapian-core 1.4.17
TermGenerator (oracle ``termdump`` mode): term strings, wdf (incl. Z-stems)
and 1-based positions must match for multilingual text — including the
~30k codepoints where current-Unicode Python tables disagree with the
tables the reference is compiled against (functions/_xapian_unicode.py is
GENERATED from the library's own tables; this file also re-derives those
tables through the oracle's ``unitable`` mode and asserts the checked-in
module is current).

Skipped cleanly when the oracle binary is absent
(``bash tools/build_xapian_oracle.sh`` once per machine).
"""

from __future__ import annotations

import os
import subprocess

import numpy as np
import pytest

ORACLE = os.environ.get("XAPIAN_ORACLE",
                        "/tmp/xapian-install/bin/xapian_oracle")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE),
    reason="xapian oracle binary not built (tools/build_xapian_oracle.sh)")


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")


def _unesc(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            c = s[i + 1]
            out.append("\t" if c == "t" else "\n" if c == "n" else c)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _xapian_termdump(lines: list[str]) -> dict[int, dict]:
    """line# -> {term: (wdf, positions tuple)} from the real TermGenerator
    (Stem("en"), positional index_text — the exact mdq body call)."""
    out = subprocess.run([ORACLE, "/nonexistent-db", "termdump"],
                         input="".join(_esc(ln) + "\n" for ln in lines),
                         capture_output=True, text=True, check=True)
    res: dict[int, dict] = {i: {} for i in range(len(lines))}
    for line in out.stdout.splitlines():
        qn, term, wdf, poss = line.split("\t")
        res[int(qn)][_unesc(term)] = (
            int(wdf),
            tuple(int(p) for p in poss.split(",")) if poss else ())
    return res


def _ours(line: str) -> dict:
    from markdown_query_ray.functions.snowball import stem
    from markdown_query_ray.functions.xapian_tokenizer import (
        term_counts,
        tokenize,
    )

    toks = tokenize(line)
    counts = term_counts(toks, stemmer=stem)
    posmap: dict[str, list[int]] = {}
    for j, t in enumerate(toks):
        posmap.setdefault(t, []).append(j + 1)
    return {t: (n, tuple(posmap.get(t, ()))) for t, n in counts.items()}


# Curated multilingual lines spanning BOTH the agreement set and every
# class of table divergence found when the tables were generated:
# Armenian U+0560/U+0588/U+05EF, NKo U+07FD, Syriac U+0860-086A, Georgian
# Mtavruli U+1C90 (not a wordchar to xapian), Hanifi Rohingya digits
# U+10D30 (not Nd to xapian), U+0130 (the one in-term tolower difference),
# combining marks, titlecase Dž, zero-width joins, digit separators, CJK.
CURATED = [
    "Hello AT&T U.N.C.L.E. 1,000 c++ it\u2019s \u00dcber stra\u00dfe",
    "\u0560\u0561\u0562 \u05ef\u05d0 \u07fd\u07ca \u0860\u0861 "
    "\u1c90\u10d0 pre\u0860post",
    "\U00010d30\U00010d31 42 \u0966\u0967,\u0968 \u0c66\u0c67",
    "\u0130stanbul \u0131\u015f\u0131k I\u0307",
    "a\u200bb c\u2060d e\ufeff f\u200d\u200cg",
    "\u4e2d\u6587\u30c6\u30b9\u30c8 \ud55c\uae00 \u0645\u0631\u062d\u0628\u0627",
    "x\u0345y \u03c3\u03c2 \u03a3\u0399\u03a3\u0391",
    "nai\u0308ve fac\u0327ade \u01c5ungeon \u01c4X \u01c6y",
    "M&S P.T.O. e.g. i.e. R2D2 B2B 3.14159 1.000,5 v1.2.3",
    "don\u2019t c\u2027est \u05d0\u05f4\u05d1 x\u00b7y a'b'c''d",
    "\u0baa\u0bc6\u0baf\u0bb0\u0bcd \u0995\u09be\u099b\u09c7 "
    "\u0627\u0644\u0639\u064e\u0631\u064e\u0628\u0650\u064a\u064e\u0651\u0629",
    # Python str.lower() is context-sensitive for capital sigma (final
    # sigma at term end); xapian's per-codepoint tolower always gives
    # U+03C3 \u2014 \u039d\u0399\u039a\u039f\u03a3 must index as \u03bd\u03b9\u03ba\u03bf\u03c3, not \u03bd\u03b9\u03ba\u03bf\u03c2.
    "\u039d\u0399\u039a\u039f\u03a3 \u0391\u03a3 \u03a3\u0399\u03a3 "
    "\u03c3\u03b9\u03c2 \u0130\u03a3",
]


def test_curated_multilingual_termdump_identity():
    want = _xapian_termdump(CURATED)
    for i, line in enumerate(CURATED):
        assert _ours(line) == want[i], f"term stream mismatch: {line!r}"


def _char_pool() -> list[str]:
    """Characters drawn from agreement ranges, divergence ranges, joiners,
    separators — weighted toward term-forming chars."""
    cps = []
    # ASCII letters/digits + '_'
    cps += [chr(c) for c in range(0x61, 0x7b)]
    cps += [chr(c) for c in range(0x41, 0x5b)]
    cps += [chr(c) for c in range(0x30, 0x3a)] + ["_"]
    # Latin-1 letters, Greek, Cyrillic, Hebrew, Arabic, Devanagari,
    # CJK, Hangul
    for rng in [(0xC0, 0xFF), (0x391, 0x3C9), (0x410, 0x44F),
                (0x5D0, 0x5EA), (0x627, 0x64A), (0x905, 0x939),
                (0x4E00, 0x4E10), (0xAC00, 0xAC10)]:
        cps += [chr(c) for c in range(rng[0], rng[1] + 1)]
    # divergence set: wordchar-to-Python, separator-to-xapian
    cps += [chr(c) for c in (0x560, 0x588, 0x5EF, 0x7FD, 0x860, 0x866,
                             0x1C90, 0x1CA0, 0xA7C0, 0xAB68, 0x10D30,
                             0x10D35, 0x1E290, 0x16FE4)]
    # marks, digits beyond ASCII, sigma/İ case corners
    cps += [chr(c) for c in (0x300, 0x301, 0x345, 0x966, 0x6F0,
                             0x3A3, 0x130, 0x131, 0x1E9E)]
    # joiners / separators / suffix chars / quotes
    cps += list("'&\u00b7\u05f4\u2027\u2019\u201b,.;+#")
    cps += list("\u200b\u200c\u200d\u2060\ufeff")
    cps += list(" \t.!?-/():\"")
    return cps


def test_fuzz_multilingual_termdump_identity():
    rng = np.random.default_rng(1729)
    pool = _char_pool()
    lines = []
    for _ in range(300):
        n = int(rng.integers(1, 60))
        idx = rng.integers(0, len(pool), n)
        lines.append("".join(pool[int(i)] for i in idx))
    want = _xapian_termdump(lines)
    for i, line in enumerate(lines):
        assert _ours(line) == want[i], f"term stream mismatch: {line!r}"


def test_generated_tables_current():
    """Re-derive _xapian_unicode.py from the library and compare with the
    checked-in module (guards against stale regeneration)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    try:
        import gen_unicode_tables as gen
    finally:
        sys.path.pop(0)

    from markdown_query_ray.functions import _xapian_unicode as xu

    derived = gen.derive(gen.load_table(ORACLE))
    assert derived["WORDCHAR_CLASS"] == xu.WORDCHAR_CLASS
    assert derived["DIGIT_CLASS"] == xu.DIGIT_CLASS
    assert derived["STEM_FLAT"] == xu.STEM_FLAT
    assert derived["TOLOWER"] == xu.TOLOWER
    assert derived["DIVERGENT_FLAT"] == xu.DIVERGENT_FLAT
