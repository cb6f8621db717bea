"""QueryParser free-text compile: one whole chunk through Xapian's own
grammar (the path mdq uses for chunks BEFORE an operator keyword,
xapian_utils.rs:597-600 — ``qp.parse_query(chunk, flags)``).

Character-level port of queryparser_internal.cc's lexer main loop
(xapian-core-1.4.17, :2982-3550) feeding an exact port of the lemon
parser runtime and grammar actions (_lemon.py) for mdq's flag set
(BOOLEAN | PHRASE | LOVEHATE | BOOLEAN_ANY_CASE | WILDCARD | PURE_NOT |
PARTIAL). Lexer rules kept from the C control flow:

- modes DEFAULT / IN_QUOTES / IN_PHRASED_TERM / IN_GROUP / IN_GROUP2;
  whitespace-separated term runs become GROUP_TERMs (one OR sub-node),
  joiner-punctuation runs (``.-/:\\@`` immediately followed by a word char)
  become PHR_TERM chains (ordered phrases), quotes open positional phrases
  and are implicitly closed at end of input;
- ``(`` opens a subexpression only after whitespace/``()+-`` and when not
  immediately followed by ``)``; a stray ``)`` reaches the grammar as KET;
  unclosed ``(`` are implicitly closed at end;
- ``+``/``-`` are love/hate only after whitespace/``(`` and when not
  followed by whitespace or more +/-; ``-`` right after an operator
  keyword lexes as HATE_AFTER_AND (grammar-valid only in ``A AND -B``);
- boolean keywords (any case): AND OR NOT XOR and case-folded NEAR/ADJ with
  optional ``/width``; acronyms (A.N.D.) are never keywords;
- a term immediately followed by a stem preventer (``(/\\@<>=*[{"``) is not
  Z-stemmed; trailing ``*`` makes a WILD_TERM (unlimited SYNONYM-wildcard);
  the final term of the input partial-expands (FLAG_PARTIAL) only in
  DEFAULT/GROUP modes;
- the trailing ``+``/``#`` suffix (c++, c#) is kept when the suffixed term
  exists in the index or when NEITHER form exists (= the no-database
  default), and stripped-and-relexed when only the bare term exists
  (queryparser_internal.cc:781-810 ``db.term_exists``) — pass
  ``term_exists`` wired to the live index for the data-dependent rule;
- lexing stops once the grammar records an error (the C loop guard);
  implicit closes and the end-of-input Parse(0) only run error-free.

Error semantics come from the lemon runtime itself: a "parse error"
re-parses the chunk flagless (queryparser.cc:170-174, flags &=
FLAG_CJK_NGRAM), while a VET_BOOL_ARGS "Syntax: ..." error — possibly
overwriting an earlier parse error after lemon's stack-reset recovery —
throws without retry. See _lemon.py.
"""

from __future__ import annotations

import regex as _regex

from ..functions._xapian_unicode import CJK_WORDCHAR_CLASS, TOLOWER
from ..functions.xapian_tokenizer import (
    _pattern_for,
    is_wordchar,
    should_stem,
)
from ._lemon import TOK, LemonParser
from .compiler import MatchNothing

# ---------------------------------------------------------------------------
# CJK helpers (FLAG_CJK_NGRAM)
# ---------------------------------------------------------------------------

_CJK_RUN_RE = _regex.compile(rf"{CJK_WORDCHAR_CLASS}+", _regex.V1)
_CJK_ONE_RE = _regex.compile(rf"{CJK_WORDCHAR_CLASS}", _regex.V1)


def _cjk_lower(s: str) -> str:
    return s.translate(TOLOWER)


# ---------------------------------------------------------------------------
# term-text normalization (same per-term processing as tokenize(), no cap)
# ---------------------------------------------------------------------------

_POST_CHARS = "’‛​‌‍⁠﻿"
_POST_TABLE = {0x2019: "'", 0x201b: "'", 0x200b: None, 0x200c: None,
               0x200d: None, 0x2060: None, 0xfeff: None}
_EXACT_LOWER = dict(TOLOWER)
_EXACT_LOWER.update(_POST_TABLE)


def _norm_term(raw: str) -> str:
    if raw.isascii():
        return raw.lower()
    if "Σ" in raw or "İ" in raw:
        return raw.translate(_EXACT_LOWER)
    t = raw.lower()
    for ch in _POST_CHARS:
        if ch in t:
            return t.translate(_POST_TABLE)
    return t


# ---------------------------------------------------------------------------
# lexer
# ---------------------------------------------------------------------------

_DQUOTE = {'"', '“', '”'}
_PHRASE_GEN = set(".-/:\\@")
_STEM_PREVENTER = set('(/\\@<>=*[{"')
_KEYWORDS = {"AND": "AND", "NOT": "NOT", "XOR": "XOR", "OR": "OR",
             "NEAR": "NEAR", "ADJ": "ADJ"}

# flag bits (subset exercised by mdq)
F_BOOLEAN = 1
F_PHRASE = 2
F_LOVEHATE = 4
F_ANY_CASE = 8
F_WILDCARD = 16
F_PURE_NOT = 32
F_PARTIAL = 64
MDQ_FLAGS = (F_BOOLEAN | F_PHRASE | F_LOVEHATE | F_ANY_CASE | F_WILDCARD
             | F_PURE_NOT | F_PARTIAL)

_T_TERM = TOK["TERM"]
_T_GROUP = TOK["GROUP_TERM"]
_T_PHR = TOK["PHR_TERM"]
_T_WILD = TOK["WILD_TERM"]
_T_PARTIAL = TOK["PARTIAL_TERM"]
_T_QUOTE = TOK["QUOTE"]
_T_BRA = TOK["BRA"]
_T_KET = TOK["KET"]
_T_CJK = TOK["CJKTERM"]
_T_EGOK = TOK["EMPTY_GROUP_OK"]
_T_LOVE = TOK["LOVE"]
_T_HATE = TOK["HATE"]
_T_HATE_AND = TOK["HATE_AFTER_AND"]
_OPCODE = {"AND": TOK["AND"], "OR": TOK["OR"], "NOT": TOK["NOT"],
           "XOR": TOK["XOR"], "NEAR": TOK["NEAR"], "ADJ": TOK["ADJ"]}


class _T:
    """A TERM-family token (minor value for the grammar)."""

    __slots__ = ("value", "stem_ok")

    def __init__(self, value, stem_ok=False):
        self.value = value
        self.stem_ok = stem_ok

    def __repr__(self):  # debugging aid
        return f"<term {self.value!r}>"


def _is_ws(ch: str) -> bool:
    # Unicode::is_whitespace: category Z* plus the ASCII control whitespace
    return ch.isspace()


def _lex_ql(chunk: str, flags: int, cjk_ngram: bool, eng: LemonParser,
            term_exists=None) -> None:
    """Port of the lexer main loop: Parse() each token into ``eng`` as it
    is recognized, stop lexing once the grammar records an error, then
    (error-free only) emit the implicit closing QUOTE/KETs and the
    end-of-input token (queryparser_internal.cc:2990, :3536-3549)."""
    pat = _pattern_for(chunk)
    i, n = 0, len(chunk)
    newprev = " "
    mode = "DEFAULT"  # DEFAULT IN_QUOTES IN_PHRASED_TERM IN_GROUP IN_GROUP2
    bra_depth = 0
    parse = eng.parse

    def skip_ws(j: int) -> int:
        while j < n and _is_ws(chunk[j]):
            j += 1
        return j

    def parse_one_term(j: int):
        """(value, stem_ok, end_index, was_acronym) for the term at j
        (j must be a word char). CJK handled by the caller."""
        m = pat.match(chunk, j)
        if m is None:  # defensive: single word char not matched (shouldn't)
            return _norm_term(chunk[j]), False, j + 1, False
        acr = m.group("acr")
        if acr is not None:
            end = m.end()
            return acr.replace(".", "").lower(), False, end, True
        raw = m.group("term")
        end = m.end()
        if cjk_ngram:
            cm = _CJK_ONE_RE.search(raw)
            if cm is not None:  # general term breaks at a CJK char
                raw = raw[:cm.start()]
                end = j + cm.start()
        # query-side +/# suffix rule: keep the suffixed form when it
        # exists in the db or when neither form does (covers the
        # no-database case); otherwise strip it and re-lex the suffix
        # chars (which breaks any phrase chain they preceded)
        if term_exists is not None and raw.endswith(("+", "#")):
            sfx = len(raw) - len(raw.rstrip("+#"))
            if not term_exists(_norm_term(raw)) and \
                    term_exists(_norm_term(raw[:-sfx])):
                raw = raw[:-sfx]
                end -= sfx
        stem_ok = bool(raw) and should_stem(raw[0]) and \
            not (end < n and chunk[end] in _STEM_PREVENTER)
        return _norm_term(raw), stem_ok, end, False

    outer_done = False
    while i < n and not outer_done and eng.error is None:
        last_op = False        # last_was_operator
        last_op_term = False   # last_was_operator_needing_term
        # events within one C loop iteration (operator keywords goto back)
        while True:
            if mode == "IN_PHRASED_TERM":
                mode = "DEFAULT"
            if i < n and _is_ws(chunk[i]):
                newprev = " "
                i = skip_ws(i + 1)
                if i >= n:
                    outer_done = True
                    break
            if i >= n:
                outer_done = True
                break
            ch = chunk[i]
            if not (is_wordchar(ch) or
                    (cjk_ngram and _CJK_ONE_RE.match(ch))):
                prev = newprev
                i += 1
                newprev = ch
                if mode in ("IN_GROUP", "IN_GROUP2"):
                    mode = "DEFAULT"
                if ch in _DQUOTE:
                    if mode == "DEFAULT":
                        i = skip_ws(i)
                        if i >= n:
                            outer_done = True
                            break
                        if chunk[i] in _DQUOTE:
                            newprev = chunk[i]
                            i += 1
                            break
                    if flags & F_PHRASE:
                        if ch == '"' and i < n and chunk[i] == '"':
                            i += 1  # "" escape inside a phrase
                            break
                        parse(_T_QUOTE)
                        mode = "IN_QUOTES" if mode == "DEFAULT" else "DEFAULT"
                    break
                if ch in "+-":
                    if i >= n:
                        outer_done = True
                        break
                    if ord(prev) > 32 and prev != "(":
                        break
                    if _is_ws(chunk[i]) or chunk[i] in "+-":
                        newprev = chunk[i]
                        i += 1
                        break
                    if mode == "DEFAULT" and (flags & F_LOVEHATE):
                        if ch == "+":
                            parse(_T_LOVE)
                        elif last_op:
                            parse(_T_HATE_AND)
                        else:
                            parse(_T_HATE)
                        last_op = True
                        last_op_term = True
                        mode = "DEFAULT"
                        continue  # just_had_operator_needing_term
                    break
                if ch == "(":
                    i = skip_ws(i)
                    if i >= n:
                        outer_done = True
                        break
                    if ord(prev) > 32 and prev not in "()+-":
                        break
                    if chunk[i] == ")":
                        newprev = ")"
                        i += 1
                        break
                    if mode == "DEFAULT" and (flags & F_BOOLEAN):
                        parse(_T_BRA)
                        bra_depth += 1
                    break
                if ch == ")":
                    if mode == "DEFAULT" and (flags & F_BOOLEAN):
                        # a stray KET doesn't pop below the initial frame:
                        # unclosed opens still get their implicit closes
                        parse(_T_KET)
                        if bra_depth > 0:
                            bra_depth -= 1
                    break
                break  # any other punctuation: skip
            # --- word char: CJK run or term (or keyword) -------------------
            if cjk_ngram and _CJK_ONE_RE.match(ch):
                m = _CJK_RUN_RE.match(chunk, i)
                parse(_T_CJK, _T(_cjk_lower(m.group())))
                i = m.end()
                # C: Parse(CJKTERM); if end break; continue — mode UNCHANGED,
                # lookaheads skipped
                if i >= n:
                    outer_done = True
                break

            value, stem_ok, end, was_acronym = parse_one_term(i)
            raw = chunk[i:end]
            newprev = "A"

            if (mode in ("DEFAULT", "IN_GROUP", "IN_GROUP2")
                    and (flags & F_BOOLEAN) and not was_acronym
                    and 2 <= len(raw) <= 4 and raw[:1].isascii()
                    and raw[:1].isalpha()):
                op = raw.upper() if flags & F_ANY_CASE else raw
                kw = _KEYWORDS.get(op)
                if kw is not None and len(op) == len(kw):
                    i = end
                    width = 0
                    if kw in ("NEAR", "ADJ") and i < n and chunk[i] == "/":
                        j = i + 1
                        w = 0
                        while j < n and chunk[j].isdigit() and \
                                chunk[j].isascii():
                            w = w * 10 + int(chunk[j])
                            j += 1
                        if w and (j >= n or _is_ws(chunk[j])):
                            i = j
                            width = w
                    parse(_OPCODE[kw], width if width else None)
                    mode = "DEFAULT"
                    last_op = True
                    last_op_term = False
                    continue  # just_had_operator

            i = end

            # WILD_TERM / PARTIAL_TERM (DEFAULT and GROUP modes only)
            if mode in ("DEFAULT", "IN_GROUP", "IN_GROUP2"):
                if i < n:
                    if (flags & F_WILDCARD) and chunk[i] == "*":
                        j = i + 1
                        if j >= n or not is_wordchar(chunk[j]):
                            i = j
                            if mode == "IN_GROUP2":
                                parse(_T_EGOK)
                            mode = "DEFAULT"
                            parse(_T_WILD, _T(value))
                            break
                else:
                    if flags & F_PARTIAL:
                        if mode == "IN_GROUP2":
                            parse(_T_EGOK)
                        mode = "DEFAULT"
                        parse(_T_PARTIAL, _T(value, stem_ok))
                        outer_done = True
                        break

            if mode == "IN_PHRASED_TERM":
                parse(_T_PHR, _T(value))
            else:
                # a group candidate followed by joiner punctuation + word
                # char starts a phrased chain instead: demote to TERM
                if mode in ("IN_GROUP", "IN_GROUP2") and i < n and \
                        chunk[i] in _PHRASE_GEN:
                    j = i
                    while j < n and chunk[j] in _PHRASE_GEN:
                        j += 1
                    if j < n and is_wordchar(chunk[j]):
                        mode = "DEFAULT"
                if mode in ("IN_GROUP", "IN_GROUP2"):
                    mode = "IN_GROUP2"
                    parse(_T_GROUP, _T(value, stem_ok))
                else:
                    parse(_T_TERM, _T(value, stem_ok))
                    if mode != "DEFAULT":  # IN_QUOTES: no lookaheads
                        break

            if i >= n:
                outer_done = True
                break
            # phrase-generator lookahead (consumes the run either way)
            if chunk[i] in _PHRASE_GEN:
                j = i
                while j < n and chunk[j] in _PHRASE_GEN:
                    j += 1
                i = j
                if i < n and (is_wordchar(chunk[i]) or
                              (cjk_ngram and _CJK_ONE_RE.match(chunk[i]))):
                    mode = "IN_PHRASED_TERM"
                    # goto phrased_term: lex the next term immediately with
                    # IN_PHRASED_TERM (skipping the iteration-top reset)
                    if cjk_ngram and _CJK_ONE_RE.match(chunk[i]):
                        # C parses the CJK run at the phrased_term label but
                        # emits CJKTERM (the is_cjk_term check precedes the
                        # PHR_TERM dispatch) and `continue`s: the chain ends
                        m = _CJK_RUN_RE.match(chunk, i)
                        parse(_T_CJK, _T(_cjk_lower(m.group())))
                        i = m.end()
                        mode = "DEFAULT"
                        if i >= n:
                            outer_done = True
                        break
                    value, stem_ok, end, _wa = parse_one_term(i)
                    i = end
                    newprev = "A"
                    parse(_T_PHR, _T(value))
                    if i >= n:
                        outer_done = True
                        break
                    # chain continues? loop the generator lookahead
                    while i < n and chunk[i] in _PHRASE_GEN:
                        j = i
                        while j < n and chunk[j] in _PHRASE_GEN:
                            j += 1
                        if j < n and (is_wordchar(chunk[j]) or
                                      (cjk_ngram and
                                       _CJK_ONE_RE.match(chunk[j]))):
                            if cjk_ngram and _CJK_ONE_RE.match(chunk[j]):
                                m = _CJK_RUN_RE.match(chunk, j)
                                parse(_T_CJK, _T(_cjk_lower(m.group())))
                                i = m.end()
                                mode = "DEFAULT"
                                break
                            value, stem_ok, end, _wa = parse_one_term(j)
                            i = end
                            parse(_T_PHR, _T(value))
                        else:
                            i = j
                            mode = "IN_PHRASED_TERM"  # reset at next top
                            break
                    if i >= n:
                        outer_done = True
                    break
                break
            elif mode in ("DEFAULT", "IN_GROUP", "IN_GROUP2"):
                old = mode
                mode = "DEFAULT"
                if not last_op_term and _is_ws(chunk[i]):
                    newprev = " "
                    i = skip_ws(i + 1)
                    if i < n and (is_wordchar(chunk[i]) or
                                  (cjk_ngram and
                                   _CJK_ONE_RE.match(chunk[i]))):
                        mode = "IN_GROUP2" \
                            if old in ("IN_GROUP", "IN_GROUP2") \
                            else "IN_GROUP"
                    if i >= n:
                        outer_done = True
                break
            break

    # done: implicit closes + end of input, error-free only
    # (queryparser_internal.cc:3536-3549)
    if eng.error is None:
        if mode == "IN_QUOTES":
            parse(_T_QUOTE)
        while bra_depth > 0:
            parse(_T_KET)
            bra_depth -= 1
        parse(0)


# ---------------------------------------------------------------------------
# public compile
# ---------------------------------------------------------------------------


class FreetextParseError(ValueError):
    """The grammar rejected the chunk the way the real QueryParser throws
    QueryParserError to the caller: a missing boolean operand
    (VET_BOOL_ARGS, no retry) or a chunk whose flagless re-parse also
    fails."""


def _run(chunk: str, flags: int, cjk_ngram: bool,
         term_exists) -> LemonParser:
    eng = LemonParser(flags)
    _lex_ql(chunk, flags, cjk_ngram, eng, term_exists)
    return eng


def compile_freetext(chunk: str, cjk_ngram: bool = False, term_exists=None):
    """Compile one chunk exactly as ``qp.parse_query(chunk, mdq_flags)``
    would (with FLAG_CJK_NGRAM when ``cjk_ngram`` — pair with an index
    built under ``IndexConfig.cjk_ngram``). ``term_exists`` (an
    ``str -> bool`` over the live index, e.g. IndexReader.term_exists)
    drives the data-dependent c++/c# suffix rule; without it the
    compiler behaves like a QueryParser with no database set. Returns an
    AST node (or MatchNothing); raises FreetextParseError where the real
    parser throws."""
    if not chunk:
        return MatchNothing()
    eng = _run(chunk, MDQ_FLAGS, cjk_ngram, term_exists)
    if eng.error == "parse error":
        # the real parser's retry: re-parse with all flags stripped
        # except FLAG_CJK_NGRAM (queryparser.cc:170-174)
        eng = _run(chunk, 0, cjk_ngram, term_exists)
    if eng.error is not None:
        raise FreetextParseError(eng.error)
    return eng.query if eng.query is not None else MatchNothing()


# ---------------------------------------------------------------------------
# mdq-exact full-query orchestration (bug-for-bug)
# ---------------------------------------------------------------------------

# mdq's take_up_to_operator alternation (xapian_utils.rs:687-703): the FIRST
# keyword IN THIS PRIORITY ORDER that occurs ANYWHERE in the remaining
# string wins (case-sensitive, NO word boundaries — "WANDER" splits at AND)
MDQ_OP_ORDER = ["AND MAYBE", "AND NOT", "SYNONYM", "FILTER", "PHRASE",
                "SCALED", "ELITE", "RANGE", "NEAR", "AND", "XOR", "OR"]


def parse_user_query_mdq_exact(q: str, term_exists=None):
    """The reference's parse_user_query, mechanics and all
    (xapian_utils.rs:578-654): chunks split by priority-ordered take_until;
    every chunk BEFORE an operator goes through the raw QueryParser grammar
    (compile_freetext); the FINAL remainder goes through the per-token
    expression path; left-fold with the operator algebra; depth cap 50.
    Raises on the same inputs the reference errors on."""
    from .compiler import QueryError, _fold, parse_chunk

    def find_op(s: str):
        for kw in MDQ_OP_ORDER:
            i = s.find(kw)
            if i != -1:
                return i, kw
        return None

    hit = find_op(q)
    if hit is None:
        return parse_chunk(q, strict_keywords=True)  # expression path
    pos, kw = hit
    node = compile_freetext(q[:pos], term_exists=term_exists)
    pending = kw
    rest = q[pos + len(kw):]
    depth = 0
    while rest:
        depth += 1
        if depth > 50:
            raise QueryError("mdq depth cap reached")
        hit = find_op(rest)
        if hit is None:
            node = _fold(node, pending,
                         parse_chunk(rest, strict_keywords=True))
            return node
        pos, kw = hit
        node = _fold(node, pending,
                     compile_freetext(rest[:pos], term_exists=term_exists))
        pending = kw
        rest = rest[pos + len(kw):]
    return node
