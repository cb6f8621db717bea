"""Generate functions/_xapian_unicode.py from the REAL xapian-core 1.4.17
Unicode tables (the exact tables the reference's tokenizer is compiled
against, include/xapian/unicode.h:343-381 + unicode/unicodetables.cc).

Why generated: the Python ``regex``/``unicodedata`` tables track current
Unicode (29,784 codepoints classified as word chars that xapian 1.4.17
splits on, 190 extra Nd digits, one in-term tolower difference at U+0130).
Deriving the tokenizer's character classes from the reference library's own
tables makes term segmentation byte-identical for ALL of Unicode and immune
to Python-version drift.

Usage: python tools/gen_unicode_tables.py   (needs the oracle binary;
build with `bash tools/build_xapian_oracle.sh`). The output module is
checked in; tests/test_tokenizer_parity.py re-derives it from the oracle
and asserts equality whenever the oracle binary is present.
"""

from __future__ import annotations

import os
import subprocess
import sys

ORACLE = os.environ.get("XAPIAN_ORACLE",
                        "/tmp/xapian-install/bin/xapian_oracle")
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "markdown_query_ray", "functions", "_xapian_unicode.py")


def load_table(oracle: str = ORACLE) -> dict[int, tuple[int, int, int, int]]:
    """cp -> (wordchar, digit, stemgate, tolower_cp) for every codepoint the
    oracle reports as notable (everything else: 0,0,0,identity)."""
    out = subprocess.run([oracle, "/nonexistent-db", "unitable"],
                         capture_output=True, text=True, check=True)
    table: dict[int, tuple[int, int, int, int]] = {}
    for line in out.stdout.splitlines():
        cp, w, d, s, lo = line.split("\t")
        table[int(cp)] = (int(w), int(d), int(s), int(lo))
    return table


def _ranges(table, pred) -> list[tuple[int, int]]:
    rs: list[tuple[int, int]] = []
    start = prev = None
    for cp in sorted(table):
        if not pred(cp, table[cp]):
            continue
        if start is None:
            start = prev = cp
        elif cp == prev + 1:
            prev = cp
        else:
            rs.append((start, prev))
            start = prev = cp
    if start is not None:
        rs.append((start, prev))
    return rs


def _esc(cp: int) -> str:
    if cp < 0x10000:
        return f"\\u{cp:04x}"
    return f"\\U{cp:08x}"


def _class_src(ranges: list[tuple[int, int]]) -> str:
    """Regex character-class source string (without brackets)."""
    parts = []
    for a, b in ranges:
        if a == b:
            parts.append(_esc(a))
        elif b == a + 1:
            parts.append(_esc(a) + _esc(b))
        else:
            parts.append(f"{_esc(a)}-{_esc(b)}")
    return "".join(parts)


# The CJK codepoint ranges xapian's n-gram tokenizer spans
# (queryparser/cjk-tokenizer.cc:71-83) — fixed constants in the library.
CJK_RANGES = ((0x2E80, 0x2EFF), (0x3000, 0x9FFF), (0xA700, 0xA71F),
              (0xAC00, 0xD7AF), (0xF900, 0xFAFF), (0xFE30, 0xFE4F),
              (0xFF00, 0xFFEF), (0x20000, 0x2A6DF), (0x2F800, 0x2FA1F))


def _is_cjk(cp: int) -> bool:
    return any(a <= cp <= b for a, b in CJK_RANGES)


def derive(table) -> dict:
    w = _ranges(table, lambda cp, v: v[0])
    d = _ranges(table, lambda cp, v: v[1])
    s = _ranges(table, lambda cp, v: v[2])
    cjkw = _ranges(table, lambda cp, v: v[0] and _is_cjk(cp))
    noncjkw = _ranges(table, lambda cp, v: v[0] and not _is_cjk(cp))
    flat: list[int] = []
    for a, b in s:
        flat.extend((a, b + 1))
    lo = {cp: v[3] for cp, v in sorted(table.items()) if v[3] != cp}
    return {
        "WORDCHAR_CLASS": "[" + _class_src(w) + "]",
        "DIGIT_CLASS": "[" + _class_src(d) + "]",
        "STEM_FLAT": tuple(flat),
        "TOLOWER": lo,
        "DIVERGENT_FLAT": tuple(
            v for a, b in _divergent(table) for v in (a, b + 1)),
        "CJK_WORDCHAR_CLASS": "[" + _class_src(cjkw) + "]",
        "NONCJK_WORDCHAR_CLASS": "[" + _class_src(noncjkw) + "]",
        "WORDCHAR_FLAT": tuple(v for a, b in w for v in (a, b + 1)),
        "DIGIT_FLAT": tuple(v for a, b in d for v in (a, b + 1)),
        "counts": (len(w), len(d), len(s), len(lo)),
    }


def _divergent(table) -> list[tuple[int, int]]:
    """Codepoints where the CURRENT Python ``regex`` property classes
    disagree with xapian's tables: \\p{L}\\p{M}\\p{N}\\p{Pc} members that
    xapian does not classify as word chars (newer-Unicode assignments the
    reference splits on), plus U+0130 (the one in-term tolower
    difference). Text free of these chars tokenizes identically under the
    fast property-class pattern — the guard for the tokenizer's two-tier
    dispatch. Regenerate (and CI re-verifies) whenever the regex module's
    Unicode tables move."""
    import regex as _re

    wc = _re.compile(r"[\p{L}\p{M}\p{N}\p{Pc}]", _re.V1)
    cps = {0x130}
    for cp in range(0x110000):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        if wc.match(chr(cp)) and not table.get(cp, (0, 0, 0, cp))[0]:
            cps.add(cp)
    rs: list[tuple[int, int]] = []
    start = prev = None
    for cp in sorted(cps):
        if start is None:
            start = prev = cp
        elif cp == prev + 1:
            prev = cp
        else:
            rs.append((start, prev))
            start = prev = cp
    if start is not None:
        rs.append((start, prev))
    return rs


def render(derived) -> str:
    nw, nd, ns, nl = derived["counts"]
    lines = [
        '"""AUTO-GENERATED by tools/gen_unicode_tables.py — do not edit.',
        "",
        "xapian-core 1.4.17 Unicode tables (the exact tables the reference",
        "tokenizer is compiled against), dumped through the oracle binary's",
        "`unitable` mode and re-expressed for the Python tokenizer:",
        "",
        f"- WORDCHAR_CLASS: regex class of the {nw}-range is_wordchar set",
        "  (categories L*/M*/N*/Pc per xapian's tables,",
        "  include/xapian/unicode.h:343-358)",
        f"- DIGIT_CLASS: regex class of the {nd}-range DECIMAL_DIGIT_NUMBER",
        "  set (the digit-infix join rule, termgenerator_internal.cc:120-123)",
        f"- STEM_FLAT: flattened [start, end+1, ...] intervals of the",
        f"  {ns}-range STEM_SOME gate (first-char category Ll/Lt/Lm/Lo,",
        "  termgenerator_internal.cc:63-73); odd bisect index = stemmable",
        f"- TOLOWER: the {nl} codepoints xapian's single-codepoint tolower",
        "  delta table maps away from identity (unicode.h:376-381)",
        '"""',
        "",
        "# fmt: off",
    ]
    lines.append(f'WORDCHAR_CLASS = r"{derived["WORDCHAR_CLASS"]}"')
    lines.append("")
    lines.append(f'DIGIT_CLASS = r"{derived["DIGIT_CLASS"]}"')
    lines.append("")
    lines.append("# is_wordchar intersected with / minus the CJK ranges")
    lines.append("# xapian's optional n-gram tokenizer spans")
    lines.append("# (queryparser/cjk-tokenizer.cc:71-83).")
    lines.append(
        f'CJK_WORDCHAR_CLASS = r"{derived["CJK_WORDCHAR_CLASS"]}"')
    lines.append("")
    lines.append(
        f'NONCJK_WORDCHAR_CLASS = r"{derived["NONCJK_WORDCHAR_CLASS"]}"')
    lines.append("")
    div = derived["DIVERGENT_FLAT"]
    lines.append("# Flattened [start, end+1, ...] intervals of codepoints")
    lines.append("# where the regex module's \\p classes disagree with the")
    lines.append("# tables above (newer-Unicode assignments) plus U+0130 —")
    lines.append("# text free of these tokenizes identically under the fast")
    lines.append("# property-class pattern (two-tier dispatch guard).")
    lines.append("DIVERGENT_FLAT = (")
    for i in range(0, len(div), 12):
        lines.append("    " + " ".join(f"{v}," for v in div[i:i + 12]))
    lines.append(")")
    lines.append("")
    lines.append("# Flattened [start, end+1, ...] intervals of the full")
    lines.append("# is_wordchar / DECIMAL_DIGIT_NUMBER sets (bitmap-friendly")
    lines.append("# form of the classes above, for the CJK n-gram char loop).")
    for name in ("WORDCHAR_FLAT", "DIGIT_FLAT"):
        vals = derived[name]
        lines.append(f"{name} = (")
        for i in range(0, len(vals), 12):
            lines.append("    " + " ".join(f"{v}," for v in vals[i:i + 12]))
        lines.append(")")
        lines.append("")
    flat = derived["STEM_FLAT"]
    lines.append("STEM_FLAT = (")
    for i in range(0, len(flat), 12):
        lines.append("    " + " ".join(f"{v}," for v in flat[i:i + 12]))
    lines.append(")")
    lines.append("")
    lo = derived["TOLOWER"]
    lines.append("TOLOWER = {")
    items = [f"{cp}: {to}," for cp, to in lo.items()]
    for i in range(0, len(items), 6):
        lines.append("    " + " ".join(items[i:i + 6]))
    lines.append("}")
    lines.append("# fmt: on")
    lines.append("")
    return "\n".join(lines)


def main():
    table = load_table()
    derived = derive(table)
    src = render(derived)
    out = os.path.normpath(OUT)
    with open(out, "w") as f:
        f.write(src)
    nw, nd, ns, nl = derived["counts"]
    print(f"wrote {out}: {nw} wordchar ranges, {nd} digit ranges, "
          f"{ns} stem ranges, {nl} tolower entries")


if __name__ == "__main__":
    sys.exit(main())
