"""QueryParser free-text compile: one whole chunk through Xapian's own
grammar (the path mdq uses for chunks BEFORE an operator keyword,
xapian_utils.rs:597-600 — ``qp.parse_query(chunk, flags)``).

Character-level port of queryparser_internal.cc's lexer main loop
(xapian-core-1.4.17, :2990-3400) plus the lemon grammar
(queryparser.lemony:1850-2260) for mdq's flag set (BOOLEAN | PHRASE |
LOVEHATE | BOOLEAN_ANY_CASE | WILDCARD | PURE_NOT | PARTIAL). The port
keeps the C control flow's observable semantics:

- lexer modes DEFAULT / IN_QUOTES / IN_PHRASED_TERM / IN_GROUP / IN_GROUP2;
  whitespace-separated term runs become GROUP_TERMs (one OR sub-node),
  joiner-punctuation runs (``.-/:\\@`` immediately followed by a word char)
  become PHR_TERM chains (ordered phrases), quotes open positional phrases
  and are implicitly closed at end of input;
- ``(`` opens a subexpression only after whitespace/``()+-`` and when not
  immediately followed by ``)``; a stray ``)`` reaches the grammar as KET
  and is a syntax error; unclosed ``(`` are implicitly closed at end;
- ``+``/``-`` are love/hate only after whitespace/``(`` and when not
  followed by whitespace or more +/-; ``-`` right after a boolean keyword
  lexes as HATE_AFTER_AND (valid only in ``A AND -B`` = AND_NOT);
- boolean keywords (any case): AND OR NOT XOR and case-folded NEAR/ADJ with
  optional ``/width``; acronyms (A.N.D.) are never keywords;
- a term immediately followed by a stem preventer (``(/\\@<>=*[{"``) is not
  Z-stemmed; trailing ``*`` makes a WILD_TERM (unlimited SYNONYM-wildcard);
  the final term of the input partial-expands (FLAG_PARTIAL) only in
  DEFAULT/GROUP modes;
- grammar errors (the lemon "parse error") re-parse the chunk flagless
  (queryparser.cc:170-174: flags &= FLAG_CJK_NGRAM), where keywords and
  love/hate/brackets/quotes are inert; missing operands of an explicit
  boolean operator (VET_BOOL_ARGS) throw WITHOUT retry, as does a chunk
  whose flagless re-parse fails again (only the CJK group corner).

Known deliberate divergence: the query-side suffix rule keeps ``c++``/
``c#`` only when the suffixed term exists in the database
(queryparser_internal.cc:781-805 ``db.term_exists``); this compiler has no
database handle and always keeps the suffix (the index stores suffixed
terms for all TermGenerator-indexed text, so the common case agrees).
"""

from __future__ import annotations

import regex as _regex

from ..functions._xapian_unicode import CJK_WORDCHAR_CLASS, TOLOWER
from ..functions.snowball import stem as snowball_stem
from ..functions.xapian_tokenizer import (
    _pattern_for,
    is_wordchar,
    should_stem,
    tokenize,
)
from .ast import (
    And,
    AndMaybe,
    AndNot,
    MatchAll,
    Or,
    Phrase,
    Synonym,
    Term,
    Wildcard,
    Xor,
)
from .compiler import MatchNothing, _partial_term

# ---------------------------------------------------------------------------
# CJK helpers (FLAG_CJK_NGRAM)
# ---------------------------------------------------------------------------

_CJK_RUN_RE = _regex.compile(rf"{CJK_WORDCHAR_CLASS}+", _regex.V1)
_CJK_ONE_RE = _regex.compile(rf"{CJK_WORDCHAR_CLASS}", _regex.V1)


def _cjk_lower(s: str) -> str:
    return s.translate(TOLOWER)


def _cjk_ngrams(run: str) -> list[str]:
    """CJKTokenIterator order: c1, c1c2, c2, c2c3, ..., cn."""
    out = []
    m = len(run)
    for k in range(m):
        out.append(run[k])
        if k + 1 < m:
            out.append(run[k:k + 2])
    return out


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


class _T:
    __slots__ = ("kind", "value", "stem_ok", "width")

    def __init__(self, kind, value=None, stem_ok=False, width=0):
        self.kind = kind
        self.value = value
        self.stem_ok = stem_ok
        self.width = width

    def __repr__(self):  # debugging aid
        return f"<{self.kind} {self.value!r}>"


def _is_ws(ch: str) -> bool:
    # Unicode::is_whitespace: category Z* plus the ASCII control whitespace
    return ch.isspace()


def _lex_ql(chunk: str, flags: int, cjk_ngram: bool) -> list[_T]:
    """Port of the lexer main loop. Returns the token stream (with implicit
    closing QUOTE/KETs appended, mirroring queryparser.lemony:1383-1392)."""
    toks: list[_T] = []
    pat = _pattern_for(chunk)
    i, n = 0, len(chunk)
    newprev = " "
    mode = "DEFAULT"  # DEFAULT IN_QUOTES IN_PHRASED_TERM IN_GROUP IN_GROUP2
    bra_depth = 0

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
        stem_ok = bool(raw) and should_stem(raw[0]) and \
            not (end < n and chunk[end] in _STEM_PREVENTER)
        return _norm_term(raw), stem_ok, end, False

    outer_done = False
    while i < n and not outer_done:
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
                        toks.append(_T("QUOTE"))
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
                            toks.append(_T("LOVE"))
                        elif last_op:
                            toks.append(_T("HATE_AND"))
                        else:
                            toks.append(_T("HATE"))
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
                        toks.append(_T("BRA"))
                        bra_depth += 1
                    break
                if ch == ")":
                    if mode == "DEFAULT" and (flags & F_BOOLEAN):
                        toks.append(_T("KET"))
                        bra_depth -= 1  # may go negative: stray KET
                    break
                break  # any other punctuation: skip

            # --- word char: CJK run or term (or keyword) -------------------
            if cjk_ngram and _CJK_ONE_RE.match(ch):
                m = _CJK_RUN_RE.match(chunk, i)
                toks.append(_T("CJK", _cjk_lower(m.group())))
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
                    toks.append(_T(kw, width=width))
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
                                toks.append(_T("EGOK"))
                            mode = "DEFAULT"
                            toks.append(_T("WILD", value))
                            break
                else:
                    if flags & F_PARTIAL:
                        if mode == "IN_GROUP2":
                            toks.append(_T("EGOK"))
                        mode = "DEFAULT"
                        toks.append(_T("PARTIAL", value, stem_ok))
                        outer_done = True
                        break

            if mode == "IN_PHRASED_TERM":
                toks.append(_T("PHR_TERM", value))
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
                    toks.append(_T("GROUP_TERM", value, stem_ok))
                else:
                    toks.append(_T("TERM", value, stem_ok))
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
                        toks.append(_T("CJK", _cjk_lower(m.group())))
                        i = m.end()
                        mode = "DEFAULT"
                        if i >= n:
                            outer_done = True
                        break
                    value, stem_ok, end, _wa = parse_one_term(i)
                    i = end
                    newprev = "A"
                    toks.append(_T("PHR_TERM", value))
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
                                toks.append(_T("CJK", _cjk_lower(m.group())))
                                i = m.end()
                                mode = "DEFAULT"
                                break
                            value, stem_ok, end, _wa = parse_one_term(j)
                            i = end
                            toks.append(_T("PHR_TERM", value))
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

    # implicit closes (queryparser.lemony:1383-1392)
    if mode == "IN_QUOTES":
        toks.append(_T("QUOTE"))
    while bra_depth > 0:
        toks.append(_T("KET"))
        bra_depth -= 1
    return toks


# ---------------------------------------------------------------------------
# parser (lemon grammar port)
# ---------------------------------------------------------------------------


class FreetextParseError(ValueError):
    """The grammar rejected the chunk the way the real QueryParser throws
    QueryParserError to the caller: a missing boolean operand
    (VET_BOOL_ARGS, no retry) or a chunk whose flagless re-parse also
    fails."""


class _ParseFailed(Exception):
    """lemon's generic "parse error" — triggers the flagless retry."""


_PREC = {"OR": 1, "XOR": 2, "AND": 3, "NOT": 3}


def _add_or(left, right):
    """add_to_query(q, OP_OR, x): flatten when the left side is already an
    OR chain (matches xapian's left-merge composition)."""
    if left is None:
        return right
    if isinstance(left, Or):
        return Or(left.children + (right,))
    return Or((left, right))


def _cjk_node(run: str):
    grams = _cjk_ngrams(run)
    if len(grams) == 1:
        return Term(grams[0])
    return And(tuple(Term(g) for g in grams))


class _P:
    def __init__(self, toks: list[_T], flags: int):
        self.toks = toks
        self.i = 0
        self.flags = flags

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def parse(self):
        e = self.expr(0)
        if self.peek() is not None:  # stray KET or other leftover
            raise _ParseFailed()
        return e

    # -- boolean expression levels -------------------------------------------
    def expr(self, min_prec: int):
        left = self.operand()
        while True:
            t = self.peek()
            if t is None or t.kind not in _PREC:
                return left
            prec = _PREC[t.kind]
            if prec < min_prec:
                return left
            op = t.kind
            self.i += 1
            nt = self.peek()
            if op == "AND" and nt is not None and nt.kind == "NOT":
                self.i += 1
                op = "ANDNOT"
            elif op == "AND" and nt is not None and nt.kind == "HATE_AND":
                self.i += 1
                op = "ANDHATE"
            right = self.expr(prec + 1)
            if op == "NOT" and left is None and (self.flags & F_PURE_NOT):
                left = MatchAll()
            if left is None or right is None:
                word = {"ANDNOT": "AND NOT", "ANDHATE": "AND"}.get(op, op)
                raise FreetextParseError(
                    f"Syntax: <expression> {word} <expression>")
            if op == "AND":
                left = And((left, right))
            elif op == "OR":
                left = _add_or(left, right)
            elif op == "XOR":
                left = Xor((left, right))
            else:  # NOT / ANDNOT / ANDHATE
                left = AndNot(left, right)

    # -- prob (sequence of stop_terms with love/hate) --------------------------
    # Returning None = lemon's empty ``bool_arg ::= . [ERROR]`` reduction:
    # the caller's operator rule then hits VET_BOOL_ARGS (throw, no retry)
    # when an operator is pending, or the leftover tokens fail parse()
    # (syntax error -> flagless retry) otherwise — matching the observed
    # split ("a OR NEAR b" throws, "NEAR b" retries; oracle-probed).
    def operand(self):
        norm: list = []
        loves: list = []
        hates: list = []
        while True:
            t = self.peek()
            if t is None:
                break
            if t.kind in ("LOVE", "HATE"):
                self.i += 1
                node = self.term_unit()
                if node is None:
                    raise _ParseFailed()  # dangling love/hate marker
                if t.kind == "LOVE":
                    loves.append(node)
                else:
                    hates.append(node)
                continue
            node = self.term_unit()
            if node is None:
                break
            norm.append(node)
        if not norm and not loves and not hates:
            return None
        query = None
        for x in norm:
            query = _add_or(query, x)
        e = query
        if loves:
            love = loves[0]
            for x in loves[1:]:
                love = And((love, x))
            e = AndMaybe(love, query) if query is not None else love
        if hates:
            if e is None:
                raise _ParseFailed()  # "Can't just hate!"
            hate = hates[0]
            for x in hates[1:]:
                hate = _add_or(hate, x)
            e = AndNot(e, hate)
        return e

    # -- one stop_term / term (compound terms included) ------------------------
    def term_unit(self):
        """One unit, or None when the next token cannot start one
        (operators, KET, stray chain tokens, end of input)."""
        t = self.peek()
        if t is None:
            return None
        if t.kind == "TERM":
            self.i += 1
            nt = self.peek()
            if nt is not None and nt.kind == "GROUP_TERM":
                members = [t]
                while nt is not None and nt.kind in ("GROUP_TERM", "EGOK"):
                    self.i += 1
                    if nt.kind == "GROUP_TERM":
                        members.append(nt)
                    nt = self.peek()
                return Or(tuple(self._free_term(m) for m in members))
            if nt is not None and nt.kind in ("PHR_TERM", "PHR_CJK"):
                terms: list[str] = [t.value]
                while nt is not None and nt.kind in ("PHR_TERM", "PHR_CJK"):
                    self.i += 1
                    if nt.kind == "PHR_CJK":
                        terms.extend(nt.value)  # per-char positional terms
                    else:
                        terms.append(nt.value)
                    nt = self.peek()
                return Phrase(tuple(terms), window=len(terms))
            if nt is not None and nt.kind in ("NEAR", "ADJ"):
                kind = nt.kind
                terms = [t.value]
                window = 0
                while nt is not None and nt.kind == kind:
                    self.i += 1
                    if nt.width:
                        window = max(window, nt.width)
                    nx = self.peek()
                    if nx is None or nx.kind != "TERM":
                        raise _ParseFailed()
                    self.i += 1
                    terms.append(nx.value)
                    nt = self.peek()
                if nt is not None and nt.kind in ("NEAR", "ADJ"):
                    raise _ParseFailed()  # mixed NEAR/ADJ chain
                w = window if window else 10
                return Phrase(tuple(terms), window=w - 1 + len(terms),
                              ordered=(kind == "ADJ"))
            return self._free_term(t)
        if t.kind == "WILD":
            self.i += 1
            return Synonym((Wildcard(t.value, 0, False),))
        if t.kind == "PARTIAL":
            self.i += 1
            return _partial_term(t.value, stem=t.stem_ok)
        if t.kind == "CJK":
            self.i += 1
            return _cjk_node(t.value)
        if t.kind == "QUOTE":
            self.i += 1
            terms = []
            while True:
                nt = self.peek()
                if nt is None:
                    raise _ParseFailed()  # lexer closes quotes; defensive
                if nt.kind == "QUOTE":
                    self.i += 1
                    break
                if nt.kind == "TERM":
                    terms.append(nt.value)
                elif nt.kind == "CJK":
                    terms.extend(nt.value)  # per-char positional terms
                else:
                    raise _ParseFailed()
                self.i += 1
            if not terms:
                raise _ParseFailed()  # QUOTE QUOTE: phrase needs >= 1 TERM
            if len(terms) == 1:
                return Term(terms[0])  # single-term phrase: plain, unstemmed
            return Phrase(tuple(terms), window=len(terms))
        if t.kind == "BRA":
            self.i += 1
            sub = self.expr(0)
            nt = self.peek()
            if nt is None or nt.kind != "KET":
                raise _ParseFailed()
            self.i += 1
            if sub is None:
                raise _ParseFailed()
            return sub
        return None

    @staticmethod
    def _free_term(t: _T):
        if t.stem_ok:
            return Term("Z" + snowball_stem(t.value))
        return Term(t.value)


# ---------------------------------------------------------------------------
# public compile
# ---------------------------------------------------------------------------


def compile_freetext(chunk: str, cjk_ngram: bool = False):
    """Compile one chunk exactly as ``qp.parse_query(chunk, mdq_flags)``
    would (with FLAG_CJK_NGRAM when ``cjk_ngram`` — pair with an index
    built under ``IndexConfig.cjk_ngram``). Returns an AST node (or
    MatchNothing); raises FreetextParseError where the real parser
    throws."""
    if not chunk:
        return MatchNothing()
    try:
        toks = _lex_ql(chunk, MDQ_FLAGS, cjk_ngram)
        if not toks:
            return MatchNothing()
        node = _P(toks, MDQ_FLAGS).parse()
    except _ParseFailed:
        # the real parser's "parse error" path: re-parse with all flags
        # stripped except FLAG_CJK_NGRAM (queryparser.cc:170-174)
        try:
            toks = _lex_ql(chunk, 0, cjk_ngram)
            if not toks:
                return MatchNothing()
            node = _P(toks, 0).parse()
        except _ParseFailed:
            raise FreetextParseError("parse error") from None
    return node if node is not None else MatchNothing()


# ---------------------------------------------------------------------------
# mdq-exact full-query orchestration (bug-for-bug)
# ---------------------------------------------------------------------------

# mdq's take_up_to_operator alternation (xapian_utils.rs:687-703): the FIRST
# keyword IN THIS PRIORITY ORDER that occurs ANYWHERE in the remaining
# string wins (case-sensitive, NO word boundaries — "WANDER" splits at AND)
MDQ_OP_ORDER = ["AND MAYBE", "AND NOT", "SYNONYM", "FILTER", "PHRASE",
                "SCALED", "ELITE", "RANGE", "NEAR", "AND", "XOR", "OR"]


def parse_user_query_mdq_exact(q: str):
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
    node = compile_freetext(q[:pos])
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
        node = _fold(node, pending, compile_freetext(rest[:pos]))
        pending = kw
        rest = rest[pos + len(kw):]
    return node
