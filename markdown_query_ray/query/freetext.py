"""QueryParser free-text compile: one whole chunk through Xapian's own
grammar (the path mdq uses for chunks BEFORE an operator keyword,
xapian_utils.rs:597-600 — ``qp.parse_query(chunk, flags)``).

Implements the exercised subset of queryparser_internal.cc under mdq's flag
set (BOOLEAN | PHRASE | LOVEHATE | BOOLEAN_ANY_CASE | WILDCARD | PURE_NOT |
PARTIAL), with every rule below verified against the real library through
the ``query-raw`` mode of tools/xapian_oracle.cc
(tests/test_xapian_parity.py::test_freetext_*):

- free words stem to positional Z-terms (STEM_SOME: words whose first char
  is uppercase or non-letter stay unstemmed, lowercased);
- the FINAL word partial-expands (OR(WILDCARD-SYNONYM, exact)) only when
  the input ends mid-word (no trailing space/quote/bracket);
- quoted strings and joiner-punctuation runs (``.-/:\\@`` between word
  characters) become PHRASEs of unstemmed terms;
- boolean keywords in any case (and/or/not/xor) combine with Xapian's
  precedence (OR lowest, then XOR, then AND/NOT); brackets group;
- ``+term``/``-term`` love/hate: loves AND-group and AND_MAYBE the rest,
  hates AND_NOT the result; pure ``NOT x`` = AND_NOT(MatchAll, x).
"""

from __future__ import annotations

import re

import regex as _regex

from ..functions._xapian_unicode import CJK_WORDCHAR_CLASS, TOLOWER
from ..functions.snowball import stem as snowball_stem
from ..functions.xapian_tokenizer import should_stem, tokenize
from .ast import And, AndMaybe, AndNot, MatchAll, Or, Phrase, Term
from .compiler import MatchNothing, _partial_term

# CJK n-gram mode (FLAG_CJK_NGRAM / XAPIAN_CJK_NGRAM): the lexer splits a
# span at CJK-wordchar runs (parse_term consumes a whole run as ONE term
# marked is_cjk_term, queryparser_internal.cc:748-753, and term building
# breaks at a CJK char, :759); a free CJK term compiles to OP_AND over its
# lowered unigrams+bigrams (Term::as_cjk_query, :532-549) and never
# partial-expands (CJKTERM bypasses the wildcard path, :3407-3411); inside
# a phrase each CJK character is its own positional term
# (as_positional_cjk_term, :1158-1170). Known unimplemented corner: an
# infix char directly between a word char and a CJK char joins into the
# left term in the real lexer ("a'中" -> term "a'"); we tokenize the left
# segment in isolation ("a").
_CJK_SPLIT_RE = _regex.compile(rf"({CJK_WORDCHAR_CLASS}+)", _regex.V1)


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


def _phrase_terms_ngram(quoted: str) -> list[str]:
    terms: list[str] = []
    for pi, part in enumerate(_CJK_SPLIT_RE.split(quoted)):
        if not part:
            continue
        if pi % 2 == 1:
            terms.extend(_cjk_lower(part))  # one positional term per char
        else:
            terms.extend(tokenize(part))
    return terms

# one lexeme: quoted string, bracket, love/hate marker, or a word-ish span
# (maximal run of non-space, non-bracket, non-quote chars)
_LEX_RE = re.compile(r'"([^"]*)"|([()])|([+-](?=\S))|([^\s()"+-][^\s()"]*)')

_BOOL_WORDS = {"and": "AND", "or": "OR", "not": "NOT", "xor": "XOR"}
# NEAR/ADJ are case-sensitive (lowercase "near" is a plain stemmable word;
# verified via the raw oracle)
_POSITIONAL_OPS = {"NEAR", "ADJ"}


class _Tok:
    __slots__ = ("kind", "value", "stemmed", "partial_ok", "src_end")

    def __init__(self, kind, value=None, stemmed=True, partial_ok=False):
        self.kind = kind          # term|phrase|cjkterm|op|lpar|rpar|love|hate
        self.value = value
        self.stemmed = stemmed    # term: eligible for Z-stemming
        self.partial_ok = partial_ok  # term: may partial-expand if final
        self.src_end = -1         # chunk offset just past this token's source


def _word_term(raw: str) -> _Tok:
    """One word from the lexer -> term token. STEM_SOME gate runs on the
    RAW text: an uppercase-initial word is not stemmed (NEAR -> near)."""
    lowered = raw.lower()
    return _Tok("term", lowered,
                stemmed=should_stem(raw[0]) if raw else False,
                partial_ok=True)


def _lex(chunk: str, cjk_ngram: bool = False) -> list[_Tok]:
    toks: list[_Tok] = []

    def span_tokens(span: str, src_end: int = -1) -> None:
        kw = _BOOL_WORDS.get(span.lower())
        if kw is not None:
            toks.append(_Tok("op", kw))
            return
        if span in _POSITIONAL_OPS:
            toks.append(_Tok("posop", span))
            return
        terms = tokenize(span)
        if not terms:
            return
        if len(terms) == 1:
            # term VALUE comes from the tokenizer (parity-tested: strips
            # the punctuation QueryParser never indexes — "hello," must
            # become Zhello, verified vs the real parser), while the
            # STEM_SOME gate still reads the RAW first word char below
            toks.append(_word_term(terms[0]))
            toks[-1].stemmed = should_stem(_first_word_char(span))
            toks[-1].src_end = src_end
        else:
            # multiple terms inside one whitespace-free span: Xapian
            # phrase-joins them (the .-/:\@ generator chars; verified for
            # foo-bar, tag:meh, a/b via the raw oracle)
            toks.append(_Tok("phrase", tuple(terms)))

    for m in _LEX_RE.finditer(chunk):
        quoted, bracket, lovehate, span = m.groups()
        if quoted is not None:
            terms = _phrase_terms_ngram(quoted) if cjk_ngram \
                else tokenize(quoted)
            if terms:
                toks.append(_Tok("phrase", tuple(terms)))
            continue
        if bracket is not None:
            toks.append(_Tok("lpar" if bracket == "(" else "rpar"))
            continue
        if lovehate is not None:
            toks.append(_Tok("love" if lovehate == "+" else "hate"))
            continue
        if cjk_ngram and _CJK_SPLIT_RE.search(span):
            # split at CJK runs: each run is one CJKTERM token, the
            # remaining segments lex as usual (keywords included:
            # "AND中" is operator AND followed by the CJK term 中)
            off = m.start()
            for pi, part in enumerate(_CJK_SPLIT_RE.split(span)):
                if not part:
                    continue
                off += len(part)
                if pi % 2 == 1:
                    toks.append(_Tok("cjkterm", _cjk_lower(part),
                                     stemmed=False))
                    toks[-1].src_end = off
                else:
                    span_tokens(part, off)
            continue
        span_tokens(span, m.end())
    return toks


def _first_word_char(span: str) -> str:
    for ch in span:
        if ch.isalnum() or ch == "_":
            return ch
    return "x"


def _term_node(tok: _Tok, partial: bool):
    if partial:
        # tok.value is already lowercased — hand the raw-case STEM_SOME
        # gate result through (uppercase-initial partials keep a PLAIN
        # exact side: "Paris" -> OR(WILDCARD paris*, paris), not Zpari)
        return _partial_term(tok.value, stem=tok.stemmed)
    if tok.stemmed:
        return Term("Z" + snowball_stem(tok.value))
    return Term(tok.value)


def _phrase_node(terms: tuple) -> object:
    if len(terms) == 1:
        return Term(terms[0])
    return Phrase(tuple(terms), window=len(terms))


class _Parser:
    """Recursive-descent over the token stream with Xapian's boolean
    precedence: or_expr -> xor_expr -> and_expr -> unary/prob."""

    def __init__(self, toks: list[_Tok], partial_idx: int):
        self.toks = toks
        self.i = 0
        self.partial_idx = partial_idx  # index of the token that may expand

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def parse(self):
        node = self.or_expr(first=True)
        return node if node is not None else MatchNothing()

    def or_expr(self, first=False):
        left = self.xor_expr(first)
        while True:
            t = self.peek()
            if t is not None and t.kind == "op" and t.value == "OR":
                self.i += 1
                right = self.xor_expr(False)
                if left is None or right is None:
                    raise FreetextParseError("dangling OR")
                left = Or((left, right))
            else:
                return left

    def xor_expr(self, first=False):
        left = self.and_expr(first)
        while True:
            t = self.peek()
            if t is not None and t.kind == "op" and t.value == "XOR":
                self.i += 1
                right = self.and_expr(False)
                if left is None or right is None:
                    raise FreetextParseError("dangling XOR")
                from .ast import Xor

                left = Xor((left, right))
            else:
                return left

    def and_expr(self, first=False):
        t = self.peek()
        if t is not None and t.kind == "op" and t.value == "NOT":
            # pure NOT (FLAG_PURE_NOT): <alldocuments> AND_NOT x
            self.i += 1
            right = self.and_expr(False)
            return AndNot(MatchAll(), right) if right is not None else None
        left = self.prob(first)
        while True:
            t = self.peek()
            if t is not None and t.kind == "op" and t.value in ("AND", "NOT"):
                op = t.value
                self.i += 1
                # AND NOT: consume the NOT and flip to AND_NOT
                nt = self.peek()
                if op == "AND" and nt is not None and nt.kind == "op" \
                        and nt.value == "NOT":
                    self.i += 1
                    op = "NOT"
                # `A AND -x rest...`: the hate marker turns the WHOLE
                # following prob into the AND_NOT right side; the formerly
                # hated word joins it as a non-absorbing member (its inner
                # love/hate mechanics still apply; raw-oracle verified)
                flip = False
                if op == "AND" and self.peek() is not None \
                        and self.peek().kind == "hate":
                    self.i += 1
                    op = "NOT"
                    flip = True
                right = self.prob(False, flip=flip)
                if right is None or left is None:
                    raise FreetextParseError(f"dangling {op}")
                if op == "AND":
                    left = And((left, right))
                else:
                    left = AndNot(left, right)
            else:
                return left

    @staticmethod
    def _join(cls, left, right):
        if left is None:
            return right
        if right is None:
            return left
        return cls((left, right))

    def prob(self, first=False, flip=False):
        """Default-OR sequence of terms/phrases/brackets with love/hate.

        NEAR/ADJ (case-sensitive) binds TERM op TERM... chains, valid ONLY
        when the left term is the FIRST element of the prob with no pending
        love/hate and each right operand is a bare non-partial term; any
        other placement is the real parser's "parse error" -> flagless
        retry (raw-oracle verified)."""
        normal, loves, hates = [], [], []
        pending = None  # 'love' | 'hate'
        last_was_bare_term = False
        near_done = False
        n_elems = 0
        n_bare_terms = 0  # only bare words absorb NEAR operands
        while True:
            t = self.peek()
            if t is None or t.kind in ("rpar", "op"):
                break
            self.i += 1
            if t.kind == "hate" and n_elems == 0 and not first:
                # hate on the FIRST element of a non-initial prob is a hard
                # parser error ("thest OR -x" throws; raw-oracle verified —
                # love markers are honored everywhere: a lone love term is
                # simply itself, which made them LOOK dropped)
                raise FreetextParseError("hate after operator")
            if t.kind == "posop":
                # valid ONLY as a single TERM op TERM pair whose left term
                # is the FIRST NORMAL element of the prob (love/hate
                # elements don't absorb it) and whose right term is a bare
                # non-partial word; chains and any other placement hit the
                # real parser's "parse error" -> flagless retry (all
                # raw-oracle verified)
                ok = (last_was_bare_term and n_bare_terms == 1
                      and pending is None and not near_done)
                terms = []
                if ok:
                    terms = [self._last_term_text]
                    nt = self.peek()
                    if nt is None or nt.kind != "term" \
                            or self.i == self.partial_idx:
                        ok = False
                    else:
                        self.i += 1
                        terms.append(nt.value)
                        nxt = self.peek()
                        if nxt is not None and nxt.kind == "posop":
                            ok = False  # NEAR chains are parse errors
                if not ok:
                    raise _FlaglessRetry()
                normal[-1] = Phrase(tuple(terms),
                                    window=10 + len(terms) - 1,
                                    ordered=(t.value == "ADJ"))
                near_done = True
                last_was_bare_term = False
                continue
            if t.kind in ("love", "hate"):
                pending = t.kind
                last_was_bare_term = False
                continue
            if t.kind == "lpar":
                sub = self.or_expr(first=True)
                if self.peek() is not None and self.peek().kind == "rpar":
                    self.i += 1
                if sub is not None and not isinstance(sub, MatchNothing):
                    (loves if pending == "love" else
                     hates if pending == "hate" else normal).append(sub)
                    n_elems += 1
                pending = None
                last_was_bare_term = False
                continue
            if t.kind == "cjkterm":
                # Term::as_cjk_query: OP_AND over lowered unigrams+bigrams;
                # never stems, never partial-expands
                grams = _cjk_ngrams(t.value)
                node = Term(grams[0]) if len(grams) == 1 \
                    else And(tuple(Term(g) for g in grams))
                last_was_bare_term = False
            elif t.kind == "phrase":
                node = _phrase_node(t.value)
                last_was_bare_term = False
            else:
                node = _term_node(t, self.i - 1 == self.partial_idx)
                bare = (pending is None and self.i - 1 != self.partial_idx
                        and not (flip and n_elems == 0))
                last_was_bare_term = bare
                if bare:
                    n_bare_terms += 1
                self._last_term_text = t.value
            (loves if pending == "love" else
             hates if pending == "hate" else normal).append(node)
            pending = None
            n_elems += 1
        if not normal and not loves and not hates:
            return None
        if hates and not normal and not loves:
            # hate-only prob: the real parser hits "parse error" and goes
            # flagless ("-term" alone -> plain stemmed term, no partial)
            raise _FlaglessRetry()
        rest = normal[0] if len(normal) == 1 else \
            (Or(tuple(normal)) if normal else None)
        if loves:
            love = loves[0] if len(loves) == 1 else And(tuple(loves))
            node = AndMaybe(love, rest) if rest is not None else love
        else:
            node = rest
        if hates:
            hate = hates[0] if len(hates) == 1 else Or(tuple(hates))
            node = AndNot(node if node is not None else MatchAll(), hate)
        return node


class FreetextParseError(ValueError):
    """The grammar rejected the chunk (dangling boolean operator) — the
    raw QueryParser throws QueryParserError there, which mdq propagates."""


def _cjk_group_check(toks, chunk, partial_idx):
    """Replicate the real grammar's CJKTERM/group conflict: ``group ::=
    TERM GROUP_TERM | group GROUP_TERM`` (queryparser.lemony:2191-2195) has
    no production for GROUP_TERM after CJKTERM, and the lexer emits
    GROUP_TERM for any whitespace-separated term while in group mode —
    which a CJKTERM does not reset (its code path skips the mode update,
    queryparser_internal.cc:3407-3411). Since the "parse error" retry
    keeps FLAG_CJK_NGRAM (queryparser.cc:171-174), the shape throws:
    "a テ c" is QueryParserError while "a テ c(partial)" is fine (the
    final-partial term drops out of group mode). All probed against the
    real library."""
    from ..functions.xapian_tokenizer import is_wordchar

    mode = 0  # 0 DEFAULT, 1 IN_GROUP, 2 IN_GROUP2
    prev_cjk = False
    n = len(chunk)
    for idx, t in enumerate(toks):
        if t.kind == "cjkterm":
            prev_cjk = True  # mode intentionally unchanged
            continue
        if t.kind != "term":
            mode = 0
            prev_cjk = False
            continue
        if mode and idx != partial_idx and prev_cjk:
            raise FreetextParseError(
                "term group member directly after a CJK term "
                "(GROUP_TERM after CJKTERM is a grammar error)")
        prev_cjk = False
        if idx == partial_idx:
            mode = 0
            continue
        j = t.src_end
        ws = False
        while 0 <= j < n and chunk[j].isspace():
            ws = True
            j += 1
        if ws and 0 <= j < n and is_wordchar(chunk[j]):
            mode = 2 if mode else 1
        else:
            mode = 0


def compile_freetext(chunk: str, cjk_ngram: bool = False):
    """Compile one chunk exactly as ``qp.parse_query(chunk, mdq_flags)``
    would (with FLAG_CJK_NGRAM when ``cjk_ngram`` — pair with an index
    built under ``IndexConfig.cjk_ngram``). Returns an AST node (or
    MatchNothing); raises FreetextParseError where the real parser
    throws."""
    toks = _lex(chunk, cjk_ngram)
    if not toks:
        return MatchNothing()
    # FLAG_PARTIAL: the last token may wildcard-expand only when the input
    # ends mid-word (no trailing whitespace/quote/bracket)
    partial_idx = -1
    if chunk and (chunk[-1].isalnum() or chunk[-1] in "_+#") \
            and toks[-1].kind == "term":
        partial_idx = len(toks) - 1
    if cjk_ngram:
        _cjk_group_check(toks, chunk, partial_idx)
    try:
        node = _Parser(toks, partial_idx).parse()
    except _FlaglessRetry:
        # the real parser's "parse error" path: re-parse with ALL flags
        # stripped (queryparser.cc:170-174) — every span becomes a plain
        # term (keywords included), no booleans/love-hate/partial; quoted
        # text becomes an OR group whose LAST word is unstemmed; joiner
        # phrases persist (all raw-oracle verified)
        node = _flagless_parse(chunk)
    return node if node is not None else MatchNothing()


class _FlaglessRetry(Exception):
    """Internal: grammar shape that makes the real parser emit the generic
    "parse error" and re-parse flagless (e.g. NEAR in an invalid position,
    queryparser.cc:170-174)."""


def _flagless_parse(chunk: str):
    parts = []
    for m in _LEX_RE.finditer(chunk):
        quoted, bracket, lovehate, span = m.groups()
        if bracket is not None or lovehate is not None:
            continue  # grouping/markers are inert without flags
        if quoted is not None:
            words = tokenize(quoted)
            if not words:
                continue
            subs = []
            for j, w in enumerate(words):
                if j == len(words) - 1:
                    subs.append(Term(w))  # quote-final word: unstemmed
                elif should_stem(w):
                    subs.append(Term("Z" + snowball_stem(w)))
                else:
                    subs.append(Term(w))
            parts.append(subs[0] if len(subs) == 1 else Or(tuple(subs)))
            continue
        terms = tokenize(span)
        if not terms:
            continue
        if len(terms) > 1:
            parts.append(Phrase(tuple(terms), window=len(terms)))
            continue
        if should_stem(_first_word_char(span)):
            parts.append(Term("Z" + snowball_stem(terms[0])))
        else:
            parts.append(Term(terms[0]))
    if not parts:
        return MatchNothing()
    return parts[0] if len(parts) == 1 else Or(tuple(parts))




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
