"""Exact port of the lemon parser runtime driving Xapian's QueryParser
grammar (xapian-core 1.4.17, queryparser/queryparser_internal.cc).

The action/goto tables come verbatim from the generated parser
(_lemon_tables.py, see tools/gen_lemon_tables.py); this module ports the
~100-line interpreter (yy_find_shift_action / yy_shift / yy_reduce /
error handling, queryparser_internal.cc:1888-2950) plus the grammar's
reduce actions (queryparser.lemony:1830-2260) rebuilt over our AST.

Porting the runtime (rather than hand-writing a recursive-descent
equivalent) is what makes the ERROR cases exact: lemon's behavior after
a failed reduce — pop the stack to one entry, drop the lookahead token,
keep feeding later tokens into the reset machine, let a later
VET_BOOL_ARGS overwrite the pending "parse error" — decides whether a
malformed query throws QueryParserError or silently re-parses flagless,
and no approximation of it survived oracle fuzzing.

Semantics notes (mdq's configuration):
- default_op is OP_OR; no stopper, no field prefixes, no ranges, no
  explicit synonyms -> the RANGE / BOOLEAN_FILTER / SYNONYM rules are
  unreachable (their tokens are never lexed).
- FLAG_PURE_NOT only applies on the first parse (the flagless retry
  clears it, queryparser.cc:170-174).
"""

from __future__ import annotations

from .ast import And, AndMaybe, AndNot, MatchAll, Or, Phrase, Synonym, \
    Term, Wildcard, Xor
from .compiler import _partial_term
from ..functions.snowball import stem as snowball_stem
from . import _lemon_tables as T

F_PURE_NOT = 32

# terminal codes (from the generated grammar)
TOK = T.TOKENS


class _Fail(Exception):
    """yy_parse_failed + return from inside a reduce action."""


# ---------------------------------------------------------------------------
# query-building helpers (Query composition semantics)
# ---------------------------------------------------------------------------


def _add_or(left, right):
    """add_to_query(q, OP_OR, x): left-assoc merge flattens same-op chains
    the way Xapian::Query's operator|= does."""
    if left is None:
        return right
    if isinstance(left, Or):
        return Or(left.children + (right,))
    return Or((left, right))


def _add_and(left, right):
    if left is None:
        return right
    if isinstance(left, And):
        return And(left.children + (right,))
    return And((left, right))


def _add_xor(left, right):
    if left is None:
        return right
    if isinstance(left, Xor):
        return Xor(left.children + (right,))
    return Xor((left, right))


def _free_term(tok):
    """Term::get_query_with_auto_synonyms (no synonyms configured):
    positional term, Z-stemmed under STEM_SOME when eligible."""
    if tok.stem_ok:
        return Term("Z" + snowball_stem(tok.value))
    return Term(tok.value)


def _cjk_ngrams(run: str) -> list[str]:
    """CJKTokenIterator order: c1, c1c2, c2, c2c3, ..., cn."""
    out = []
    m = len(run)
    for k in range(m):
        out.append(run[k])
        if k + 1 < m:
            out.append(run[k:k + 2])
    return out


def _cjk_node(run: str):
    """Term::as_cjk_query: OP_AND over the run's unigrams+bigrams."""
    grams = _cjk_ngrams(run)
    if len(grams) == 1:
        return Term(grams[0])
    return And(tuple(Term(g) for g in grams))


class _Terms:
    """Terms accumulator (phrases / NEAR / ADJ chains); members are
    unstemmed (Term::get_query, need_positions)."""

    __slots__ = ("terms", "window")

    def __init__(self, terms):
        self.terms = terms
        self.window = 0

    def adjust_window(self, w):
        if w and w > self.window:
            self.window = w

    def as_opwindow_query(self, w_delta, ordered):
        w = w_delta + len(self.terms)
        if len(self.terms) == 1:
            return Term(self.terms[0])
        return Phrase(tuple(self.terms), window=w, ordered=ordered)

    def as_phrase_query(self):
        return self.as_opwindow_query(0, True)

    def as_near_query(self):
        return self.as_opwindow_query((self.window or 10) - 1, False)

    def as_adj_query(self):
        return self.as_opwindow_query((self.window or 10) - 1, True)


class _Group:
    """TermGroup (whitespace-separated term run): OP_OR under mdq's
    default_op, members through get_query_with_auto_synonyms."""

    __slots__ = ("members",)

    def __init__(self, members):
        self.members = members

    def as_group(self):
        return Or(tuple(_free_term(m) for m in self.members))


class _Prob:
    """ProbQuery (query + love + hate; filters unreachable here)."""

    __slots__ = ("query", "love", "hate")

    def __init__(self, query=None):
        self.query = query
        self.love = None
        self.hate = None


# ---------------------------------------------------------------------------
# the parser engine
# ---------------------------------------------------------------------------


class LemonParser:
    """One QueryParser::Internal::parse_query run: feed terminal tokens
    via parse(); read .error / .query afterwards."""

    def __init__(self, flags: int):
        self.flags = flags
        self.stack: list[tuple] = [(0, 0, None)]  # (stateno, major, minor)
        self.yyerrcnt = -1
        self.error: str | None = None
        self.query = None  # set by the query ::= ... reductions

    # -- table lookups (yy_find_*_action) -----------------------------------

    def _find_shift_action(self, la: int) -> int:
        stateno = self.stack[-1][0]
        if stateno > T.YY_MAX_SHIFT:
            return stateno  # encoded pending reduce
        i = T.YY_SHIFT_OFST[stateno] + la
        if T.YY_LOOKAHEAD[i] != la:
            return T.YY_DEFAULT[stateno]
        return T.YY_ACTION[i]

    def _find_reduce_action(self, stateno: int, nt: int) -> int:
        i = T.YY_REDUCE_OFST[stateno] + nt
        assert 0 <= i < len(T.YY_LOOKAHEAD) and T.YY_LOOKAHEAD[i] == nt
        return T.YY_ACTION[i]

    # -- state transitions ----------------------------------------------------

    def _shift(self, newstate: int, major: int, minor) -> None:
        if newstate > T.YY_MAX_SHIFT:
            newstate += T.YY_MIN_REDUCE - T.YY_MIN_SHIFTREDUCE
        self.stack.append((newstate, major, minor))

    def _parse_failed(self) -> None:
        del self.stack[1:]
        if self.error is None:
            self.error = "parse error"

    def _reduce(self, ruleno: int) -> bool:
        stack = self.stack
        nrhs = -T.RULE_NRHS[ruleno]
        if nrhs == 0:
            under_state = stack[-1][0]
            minors = ()
        else:
            under_state = stack[-1 - nrhs][0]
            minors = [e[2] for e in stack[-nrhs:]]
        try:
            result = self._action(ruleno, minors)
        except _Fail:
            self._parse_failed()
            return False
        goto = T.RULE_LHS[ruleno]
        act = self._find_reduce_action(under_state, goto)
        if nrhs:
            del stack[-nrhs:]
        stack.append((act, goto, result))
        return True

    def parse(self, major: int, minor=None) -> None:
        """Parse() — one token (0 = end of input)."""
        yyendofinput = major == 0
        while True:
            act = self._find_shift_action(major)
            if act >= T.YY_MIN_REDUCE:
                self._reduce(act - T.YY_MIN_REDUCE)
            elif act <= T.YY_MAX_SHIFTREDUCE:
                self._shift(act, major, minor)
                self.yyerrcnt -= 1
                major = T.YYNOCODE
            elif act == T.YY_ACCEPT_ACTION:
                self.stack.pop()
                self.yyerrcnt = -1
                return
            else:  # YY_ERROR_ACTION (YYERRORSYMBOL is not defined)
                if self.yyerrcnt <= 0:
                    self._parse_failed()  # %syntax_error
                self.yyerrcnt = 3
                if yyendofinput:
                    self._parse_failed()
                    self.yyerrcnt = -1
                major = T.YYNOCODE
            if major == T.YYNOCODE or len(self.stack) <= 1:
                return

    # -- reduce actions (queryparser.lemony) ----------------------------------

    def _vet(self, a, b, word: str):
        """VET_BOOL_ARGS: unconditional error assign, fail without the
        default message (so it throws instead of retrying)."""
        if a is None or b is None:
            self.error = f"Syntax: <expression> {word} <expression>"
            raise _Fail

    def _finalize_prob(self, p: _Prob):
        """prob_expr ::= prob — love AND-group AND_MAYBEs the free query,
        hate AND_NOTs the result; hate with nothing else fails ("Can't
        just hate!", plain parse error -> flagless retry)."""
        e = p.query
        if p.love is not None:
            e = p.love if e is None else AndMaybe(p.love, e)
        if p.hate is not None:
            if e is None:
                raise _Fail
            e = AndNot(e, p.hate)
        return e

    def _action(self, r: int, m):
        if r == 0:      # query ::= expr
            self.query = m[0]
            return None
        if r == 1:      # query ::= .
            self.query = None
            return None
        if r == 2:      # expr ::= bool_arg AND bool_arg
            self._vet(m[0], m[2], "AND")
            return _add_and(m[0], m[2])
        if r == 3:      # expr ::= bool_arg NOT bool_arg
            a = m[0]
            if a is None and (self.flags & F_PURE_NOT):
                a = MatchAll()
            self._vet(a, m[2], "NOT")
            return AndNot(a, m[2])
        if r == 4:      # expr ::= bool_arg AND NOT bool_arg
            self._vet(m[0], m[3], "AND NOT")
            return AndNot(m[0], m[3])
        if r == 5:      # expr ::= bool_arg AND HATE_AFTER_AND bool_arg
            self._vet(m[0], m[3], "AND")
            return AndNot(m[0], m[3])
        if r == 6:      # expr ::= bool_arg OR bool_arg
            self._vet(m[0], m[2], "OR")
            return _add_or(m[0], m[2])
        if r == 7:      # expr ::= bool_arg XOR bool_arg
            self._vet(m[0], m[2], "XOR")
            return _add_xor(m[0], m[2])
        if r == 8:      # bool_arg ::= . [ERROR]
            return None
        if r == 9:      # prob_expr ::= prob
            return self._finalize_prob(m[0])
        if r == 12:     # prob ::= stop_term stop_term (default_op = OR)
            p = _Prob(m[0])
            if m[1] is not None:
                p.query = _add_or(p.query, m[1])
            return p
        if r == 13:     # prob ::= prob stop_term
            p = m[0]
            if m[1] is not None:
                p.query = _add_or(p.query, m[1])
            return p
        if r == 14:     # prob ::= LOVE term (default_op != AND)
            p = _Prob()
            p.love = m[1]
            return p
        if r == 15:     # prob ::= stop_prob LOVE term
            p = m[0]
            p.love = _add_and(p.love, m[2])
            return p
        if r == 16:     # prob ::= HATE term
            p = _Prob()
            p.hate = m[1]
            return p
        if r == 17:     # prob ::= stop_prob HATE term
            p = m[0]
            p.hate = _add_or(p.hate, m[2])
            return p
        if r == 24:     # stop_prob ::= stop_term
            return _Prob(m[0])
        if r in (25, 26):   # stop_term ::= TERM / term ::= TERM (no stopper)
            return _free_term(m[0])
        if r == 27:     # compound_term ::= WILD_TERM
            return Synonym((Wildcard(m[0].value, 0, False),))
        if r == 28:     # compound_term ::= PARTIAL_TERM
            return _partial_term(m[0].value, stem=m[0].stem_ok)
        if r == 29:     # compound_term ::= QUOTE phrase QUOTE
            return m[1].as_phrase_query()
        if r == 30:     # compound_term ::= phrased_term
            return m[0].as_phrase_query()
        if r == 31:     # compound_term ::= group
            return m[0].as_group()
        if r == 32:     # compound_term ::= near_expr
            return m[0].as_near_query()
        if r == 33:     # compound_term ::= adj_expr
            return m[0].as_adj_query()
        if r == 34:     # compound_term ::= BRA expr KET
            return m[1]
        if r == 36:     # compound_term ::= CJKTERM
            return _cjk_node(m[0].value)
        if r == 37:     # phrase ::= TERM
            return _Terms([m[0].value])
        if r == 38:     # phrase ::= CJKTERM (one positional term per char)
            return _Terms(list(m[0].value))
        if r == 39:     # phrase ::= phrase TERM
            m[0].terms.append(m[1].value)
            return m[0]
        if r == 40:     # phrase ::= phrase CJKTERM
            m[0].terms.extend(m[1].value)
            return m[0]
        if r == 41:     # phrased_term ::= TERM PHR_TERM
            return _Terms([m[0].value, m[1].value])
        if r == 42:     # phrased_term ::= phrased_term PHR_TERM
            m[0].terms.append(m[1].value)
            return m[0]
        if r == 43:     # group ::= TERM GROUP_TERM
            return _Group([m[0], m[1]])
        if r == 44:     # group ::= group GROUP_TERM
            m[0].members.append(m[1])
            return m[0]
        if r == 45:     # group ::= group EMPTY_GROUP_OK (stopper-only flag)
            return m[0]
        if r in (46, 48):   # near_expr/adj_expr ::= TERM NEAR/ADJ TERM
            acc = _Terms([m[0].value, m[2].value])
            acc.adjust_window(m[1])
            return acc
        if r in (47, 49):   # near_expr/adj_expr ::= chain NEAR/ADJ TERM
            m[0].terms.append(m[2].value)
            m[0].adjust_window(m[1])
            return m[0]
        if r in (51, 53, 54, 55):   # pass-throughs
            return m[0]
        # 10/11 RANGE, 18-23 BOOLEAN_FILTER, 35 SYNONYM: tokens never lexed
        # under mdq's flags; 50/52 are lemon-"optimized out".
        raise AssertionError(f"unreachable grammar rule {r}")
