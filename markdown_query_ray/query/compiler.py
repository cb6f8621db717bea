"""Query compiler: reference query strings -> AST.

Rebuilds the reference's two-layer parse (SURVEY.md §2.4):

1. Operator splitter (src/interactive/xapian_utils.rs:578-654): the query
   splits case-sensitively on operator keywords and left-folds with
   Query::add_right, depth capped at 50 (xapian_utils.rs:648-650).
   DELIBERATE SUBSET of mdq's exact mechanics, which are buggy upstream
   (its own boolean-path goldens are #[ignore]d failing,
   xapian_utils.rs:551-576): mdq's take_until alternation picks operators
   by PRIORITY ORDER rather than position, matches keywords inside words
   ("WANDER" splits at AND), and routes every non-final chunk through the
   raw Xapian QueryParser (whose own boolean grammar, precedence and
   brackets then apply — field tags phrase-join there). We instead split
   at the earliest boundary-guarded keyword and parse every chunk through
   the per-token path — self-consistent, field tags work in all chunks,
   and the scoring semantics are verified rank-identical against the real
   xapian library under identical orchestration
   (tests/test_xapian_parity.py).
2. Chunk parser (xapian_utils.rs:434-479 + the exercised Xapian QueryParser
   subset): tokens are ``quoted | tagged | word``; with no operator context
   each token is parsed individually and OR-joined, and — because each token
   is then the "final word" of its mini-query under FLAG_PARTIAL — every
   term wildcard-expands: ``tok`` compiles to
   ``OR(SYNONYM(WILDCARD tok*), Z<stem(tok)>)``
   (queryparser_internal.cc:506-530, 3434-3446).

Field tags map to the reference's prefixes (xapian_utils.rs:360-394):
fullpath->U subtitle->XS author->A title->S date->D tag->K; unknown tags
fall through as a phrase-join on ':' (queryparser_internal.cc:560-566).

PHRASE/NEAR compile to positional Phrase nodes when both sides are plain
word chunks (true OP_PHRASE/OP_NEAR on an index built with positions=True;
AND degradation otherwise — see ast.Phrase). Known divergences (documented):
RANGE/``>``/``<`` parse but match nothing (the reference sets no value
slots, so Xapian's value ops match nothing there too — SURVEY.md §2.5 L10);
SCALED applies scale 1.0; ELITE compiles to an EliteSet node — the
executor keeps the 10 highest-maxweight flattened sub-postlists
(DEFAULT_ELITE_SET_SIZE) exactly as xapian does (queryinternal.cc:1268,
select_elite_set :188-197), except that ties at the selection cut take
the earliest in query order where xapian's nth_element subset is
unspecified.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..functions.snowball import stem as snowball_stem
from ..functions.xapian_tokenizer import tokenize
from .ast import (
    And,
    AndMaybe,
    AndNot,
    EliteSet,
    Filter,
    Or,
    Phrase,
    ScaleWeight,
    Synonym,
    Term,
    Wildcard,
    Xor,
)


class QueryError(ValueError):
    pass


@dataclass(frozen=True)
class MatchNothing:
    """Matches no documents (Xapian's Query::MatchNothing)."""


# Reference alternation order (xapian_utils.rs:588-633): longest first where
# prefixes overlap; matched case-sensitively as standalone uppercase words.
_OPERATORS = ["AND MAYBE", "AND NOT", "SYNONYM", "FILTER", "PHRASE",
              "SCALED", "ELITE", "RANGE", "NEAR", "AND", "XOR", "OR"]
_OP_RE = re.compile(
    r"(?<![A-Za-z0-9_])(" + "|".join(re.escape(o) for o in _OPERATORS)
    + r")(?![A-Za-z0-9_])")

_FIELD_PREFIXES = {
    "fullpath": "U", "subtitle": "XS", "author": "A",
    "title": "S", "date": "D", "tag": "K",
}

_WORD_RE = re.compile(r"[A-Za-z0-9_]+")
_TOKEN_RE = re.compile(
    r"\"(?P<dq>[^\"]*)\""          # "quoted"
    r"|'(?P<sq>[^']*)'"            # 'quoted'
    r"|(?P<tagged>[A-Za-z0-9_]+):(?:\"(?P<tdq>[^\"]*)\"|'(?P<tsq>[^']*)'"
    r"|(?P<tval>[A-Za-z0-9_]+))"   # word:(quoted|word)
    r"|(?P<word>[A-Za-z0-9_]+)"    # bare word
)

DEPTH_CAP = 50


def _partial_term(tok: str, prefix: str = "", stem: bool | None = None):
    """FLAG_PARTIAL compile of one token:
    OR(SYNONYM(WILDCARD prefix+tok*), <exact side>), where the exact side
    is the Z-stemmed term for stemmable words and the PLAIN term otherwise
    (STEM_SOME gates on the leading character OF THE RAW TOKEN — digits
    and uppercase-initial words don't stem, so ``2024`` compiles to
    OR(WILDCARD 2024*, 2024) and ``Paris`` to OR(WILDCARD paris*, paris),
    never a Z-term; queryparser_internal.cc:506-530 +
    termgenerator_internal.cc:63-73, verified against the real library in
    tests/test_xapian_parity.py). Callers that lowercased the token
    earlier must pass the raw-case gate result via ``stem``."""
    from ..functions.xapian_tokenizer import should_stem

    if stem is None:
        stem = should_stem(tok)
    tok = tok.lower()
    exact = Term("Z" + prefix + snowball_stem(tok)) if stem \
        else Term(prefix + tok)
    # FLAG_PARTIAL wildcards keep the 100 MOST FREQUENT matches
    # (max_partial_expansion=100, WILDCARD_LIMIT_MOST_FREQUENT;
    # queryparser_internal.h:128-130)
    return Or((Synonym((Wildcard(prefix + tok, 100, True),)), exact))


def _phrase_node(text: str, prefix: str = ""):
    terms = [prefix + t for t in tokenize(text)]
    if not terms:
        return MatchNothing()
    if len(terms) == 1:
        # single quoted word: unstemmed exact term
        return Term(terms[0])
    return Phrase(tuple(terms), window=len(terms))


_WS_RE = re.compile(r"\s+")


def _chunk_matches(chunk: str):
    """mdq's ``expression = many1(alt((quoted, tagged, word, whitespace)))``
    (xapian_utils.rs:434-436): alternatives tried IN ORDER at the current
    position, and parsing STOPS at the first character none matches — the
    rest of the chunk is silently dropped (``at&t`` yields only ``at``;
    verified against the real engine in tests/test_xapian_parity.py)."""
    i, n = 0, len(chunk)
    out = []
    while i < n:
        m = _TOKEN_RE.match(chunk, i)
        if m:
            out.append(m)
            i = m.end()
            continue
        w = _WS_RE.match(chunk, i)
        if w:
            i = w.end()
            continue
        break  # nom many1 stops; remainder discarded
    return out


_KEYWORD_TOKENS = {"and", "or", "not", "xor"}


def parse_chunk(chunk: str, strict_keywords: bool = False):
    """Operator-free chunk: tokens parsed individually and OR-joined
    (xapian_utils.rs:455-479).

    strict_keywords: a lone boolean keyword token makes the per-token
    ``parse_query`` call throw in the reference (FLAG_BOOLEAN +
    BOOLEAN_ANY_CASE) and the whole query errors — mdq-exact mode
    propagates that; the default clean mode stays tolerant."""
    parts = []
    for m in _chunk_matches(chunk):
        if strict_keywords and m.group("word") is not None \
                and m.group("word").lower() in _KEYWORD_TOKENS:
            raise QueryError(
                f"lone boolean keyword {m.group('word')!r} in per-token "
                "parse (QueryParserError in the reference)")
        if m.group("dq") is not None:
            parts.append(_phrase_node(m.group("dq")))
        elif m.group("sq") is not None:
            parts.append(_phrase_node(m.group("sq")))
        elif m.group("tagged") is not None:
            field = m.group("tagged").lower()
            value = m.group("tdq") or m.group("tsq") or m.group("tval") or ""
            prefix = _FIELD_PREFIXES.get(field)
            if prefix is None:
                # unknown field: Xapian phrase-joins on ':'
                # (queryparser_internal.cc:560-566)
                parts.append(_phrase_node(f"{field} {value}"))
            elif m.group("tval") is not None:
                parts.append(_partial_term(value, prefix))
            else:
                parts.append(_phrase_node(value, prefix))
        elif m.group("word") is not None:
            parts.append(_partial_term(m.group("word")))
    parts = [p for p in parts if not isinstance(p, MatchNothing)]
    if not parts:
        return MatchNothing()
    if len(parts) == 1:
        return parts[0]
    return Or(tuple(parts))


def _fold(left, op: str, right):
    """Left-associative fold step (Query::add_right, xapian_utils.rs:688-703).
    MatchNothing propagation follows Xapian: OR/XOR drop the empty side, AND-
    like ops annihilate, AND_NOT/AND_MAYBE/FILTER keep the left."""
    lempty = isinstance(left, MatchNothing)
    rempty = isinstance(right, MatchNothing)
    if op == "OR":
        if lempty:
            return right
        if rempty:
            return left
        if isinstance(left, Or):  # operator|= flattens the left chain
            return Or(left.children + (right,))
        return Or((left, right))
    if op == "ELITE":
        # Query(OP_ELITE_SET, l, r) with default set_size 10
        # (queryinternal.h:29-30); done() drops MatchNothing sides
        if lempty:
            return right
        if rempty:
            return left
        return EliteSet((left, right))
    if op == "XOR":
        if lempty:
            return right
        if rempty:
            return left
        if isinstance(left, Xor):
            # operator^= flattens: one multiway XOR, whose weight is the
            # SUM of every matching child for odd-count docs — a nested
            # binary chain loses the inner pair's weights (verified vs
            # the real matcher)
            return Xor(left.children + (right,))
        return Xor((left, right))
    if op == "AND":
        if lempty or rempty:
            return MatchNothing()
        if isinstance(left, And):  # operator&= flattens the left chain
            return And(left.children + (right,))
        return And((left, right))
    if op == "AND NOT":
        if lempty:
            return MatchNothing()
        if rempty:
            return left
        return AndNot(left, right)
    if op == "AND MAYBE":
        if lempty:
            return MatchNothing()
        if rempty:
            return left
        return AndMaybe(left, right)
    if op == "FILTER":
        if lempty or rempty:
            return MatchNothing()
        return Filter(left, right)
    if op == "SYNONYM":
        # synonym over the concrete terms of both sides
        terms = tuple(Term(t) for t in _synonym_terms(left)
                      + _synonym_terms(right))
        return Synonym(terms) if terms else MatchNothing()
    if op == "PHRASE" or op == "NEAR":
        if lempty or rempty:
            return MatchNothing()
        # positional window op over plain word chunks -> true Phrase node
        # (Xapian OP_PHRASE/OP_NEAR, default window = number of terms);
        # non-term sides degrade to AND (Xapian throws UnimplementedError
        # there — we choose the documented superset instead)
        lw = _phrase_words(left)
        rw = _phrase_words(right)
        if lw is not None and rw is not None:
            words = tuple(lw + rw)
            return Phrase(words, window=len(words),
                          ordered=(op == "PHRASE"))
        return And((left, right))
    if op == "SCALED":
        if lempty:
            return MatchNothing()
        return ScaleWeight(left if rempty else And((left, right)), 1.0)
    if op == "RANGE":
        # the reference sets no value slots: value ranges match nothing
        return MatchNothing()
    raise QueryError(f"unknown operator {op!r}")


def _phrase_words(node) -> list[str] | None:
    """Recover the raw unstemmed word sequence of a chunk parse, if the chunk
    was plain words / quoted phrases (the shapes OP_PHRASE accepts). A
    partial-compiled token ``OR(SYNONYM(WILDCARD tok*), Ztok)`` yields its
    wildcard prefix — the original lowercased token."""
    if isinstance(node, Term) and not node.text.startswith("Z"):
        return [node.text]
    if isinstance(node, Phrase):
        return list(node.terms)
    if (isinstance(node, Or) and len(node.children) == 2
            and isinstance(node.children[0], Synonym)
            and len(node.children[0].children) == 1
            and isinstance(node.children[0].children[0], Wildcard)
            and isinstance(node.children[1], Term)
            and node.children[1].text.startswith("Z")):
        return [node.children[0].children[0].prefix]
    if isinstance(node, Or):
        out: list[str] = []
        for c in node.children:
            w = _phrase_words(c)
            if w is None:
                return None
            out.extend(w)
        return out
    return None


def _synonym_terms(node) -> list[str]:
    from .ast import query_terms

    if isinstance(node, MatchNothing):
        return []
    # concrete terms only: SYNONYM over a chunk that compiled to
    # wildcard-only nodes yields no terms (and hence MatchNothing) — a
    # documented divergence (xapian synonyms over full subtrees including
    # wildcard expansions; see the SYNONYM exclusion note in
    # tests/test_xapian_parity.py QUERIES)
    return query_terms(node)


def parse_user_query(q: str):
    """Full parse: operator split + left fold (xapian_utils.rs:578-654)."""
    q = q.strip()
    if not q:
        return MatchNothing()
    node = None
    depth = 0
    rest = q
    pending_op = None
    while True:
        m = _OP_RE.search(rest)
        if m is None:
            chunk = rest
            trailing = None
        else:
            chunk = rest[: m.start()]
            trailing = m.group(1)
            rest = rest[m.end():]
        sub = parse_chunk(chunk)
        if node is None:
            node = sub
        else:
            node = _fold(node, pending_op, sub)
        if trailing is None:
            break
        pending_op = trailing
        depth += 1
        if depth > DEPTH_CAP:
            raise QueryError(
                f"operator chain deeper than {DEPTH_CAP} (reference cap, "
                "xapian_utils.rs:648-650)")
    return node if node is not None else MatchNothing()
