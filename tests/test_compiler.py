"""Query-compiler structure tests, modeled on the reference's parser test
modules (xapian_utils.rs:127-576): operator splitting, field prefixes,
partial-wildcard compilation, quoted phrases, limits."""

import pytest

from markdown_query_ray.query.ast import (
    And,
    AndMaybe,
    AndNot,
    Filter,
    Or,
    Phrase,
    Synonym,
    Term,
    Wildcard,
    Xor,
    describe,
)
from markdown_query_ray.query.compiler import (
    DEPTH_CAP,
    MatchNothing,
    QueryError,
    parse_chunk,
    parse_user_query,
)


def test_single_free_term_partial():
    # token -> OR(SYNONYM(WILDCARD t*), Zstem)
    node = parse_user_query("running")
    assert isinstance(node, Or)
    syn, zterm = node.children
    assert isinstance(syn, Synonym)
    assert syn.children[0] == Wildcard("running", 100, True)
    assert zterm == Term("Zrun")


def test_multi_term_or_joined():
    node = parse_user_query("foo baz")
    assert isinstance(node, Or)
    assert len(node.children) == 2
    for c in node.children:
        assert isinstance(c, Or)  # each token partial-compiled


def test_field_tags():
    node = parse_user_query("title:foo")
    assert isinstance(node, Or)
    syn, zterm = node.children
    assert syn.children[0] == Wildcard("Sfoo", 100, True)
    assert zterm == Term("ZSfoo")

    for field, prefix in [("author", "A"), ("tag", "K"), ("fullpath", "U"),
                          ("subtitle", "XS"), ("date", "D")]:
        n = parse_user_query(f"{field}:val")
        assert n.children[0].children[0] == \
            Wildcard(prefix + "val", 100, True), field


def test_unknown_field_phrase_joins():
    node = parse_user_query("foo:bar")
    assert node == Phrase(("foo", "bar"), window=2)


def test_quoted_phrase():
    node = parse_user_query('"hee hee hee"')
    assert node == Phrase(("hee", "hee", "hee"), window=3)
    single = parse_user_query('"exact"')
    assert single == Term("exact")  # unstemmed


def test_boolean_split_left_assoc():
    node = parse_user_query("a AND b OR c")
    # ((a AND b) OR c)
    assert isinstance(node, Or)
    assert isinstance(node.children[0], And)

    node = parse_user_query("a OR b AND c")
    assert isinstance(node, And)
    assert isinstance(node.children[0], Or)


def test_operator_keywords():
    assert isinstance(parse_user_query("a AND NOT b"), AndNot)
    assert isinstance(parse_user_query("a AND MAYBE b"), AndMaybe)
    assert isinstance(parse_user_query("a FILTER b"), Filter)
    assert isinstance(parse_user_query("a XOR b"), Xor)
    assert isinstance(parse_user_query("a SYNONYM b"), Synonym)
    assert isinstance(parse_user_query("a RANGE b"), MatchNothing)


def test_case_sensitive_operators():
    # lowercase "and" is a term, not an operator (splitter is case-sensitive)
    node = parse_user_query("a and b")
    assert isinstance(node, Or)
    assert len(node.children) == 3


def test_mixed_golden_structure():
    # the reference's expression_tests shape (xapian_utils.rs:499-547)
    node = parse_user_query('title:foo baz bar author:bob hee tag:rust')
    assert isinstance(node, Or)
    assert len(node.children) == 6
    d = describe(node)
    assert "WILDCARD Sfoo*" in d and "ZSfoo" in d
    assert "WILDCARD Abob*" in d and "ZAbob" in d
    assert "WILDCARD Krust*" in d


def test_empty_queries():
    assert isinstance(parse_user_query(""), MatchNothing)
    assert isinstance(parse_user_query("   "), MatchNothing)
    assert isinstance(parse_user_query("!!!"), MatchNothing)


def test_depth_cap():
    q = " OR ".join(["t"] * (DEPTH_CAP + 3))
    with pytest.raises(QueryError):
        parse_user_query(q)
    # exactly at cap is fine
    parse_user_query(" OR ".join(["t"] * (DEPTH_CAP + 1)))


def test_match_nothing_propagation():
    # AND with empty side annihilates; OR keeps the other side
    n = parse_user_query("a AND ???")
    assert isinstance(n, MatchNothing)
    n = parse_user_query("a OR ???")
    assert isinstance(n, Or)  # just the compiled "a"


def test_chunk_parse_tagged_quoted():
    node = parse_chunk('author:"two words"')
    assert node == Phrase(("Atwo", "Awords"), window=2)


def test_end_to_end_compile_and_search(built_index):
    from markdown_query_ray.config import BM25Params, QueryConfig
    from markdown_query_ray.query.executor import search

    index_dir, _, _ = built_index
    out = search(index_dir, parse_user_query("the"),
                 QueryConfig(k=10, params=BM25Params.xapian()))
    assert len(out) == 10
    # wildcard-partial means 'xqzrare' matches all three planted terms
    out = search(index_dir, parse_user_query("xqzrare"),
                 QueryConfig(k=10, params=BM25Params.xapian()))
    assert set(out.column("doc_id").to_pylist()) == {42, 43, 44, 45, 46, 47}


def test_chunk_parse_stops_at_unparseable_char():
    """mdq's many1 grammar stops at the first char no alternative matches
    and DROPS the remainder (xapian_utils.rs:434-436): 'at&t' is just 'at',
    'it's' is just 'it' — verified vs the real engine in the parity suite."""
    from markdown_query_ray.query.ast import query_terms

    def words(q):
        node = parse_user_query(q)
        out = []
        for t in query_terms(node):
            if not t.startswith("Z"):
                out.append(t)
        return out

    n = parse_user_query("at&t")
    assert "Zat" in query_terms(n) and "Zt" not in query_terms(n)
    n2 = parse_user_query("one two&three four")
    terms = query_terms(n2)
    assert "Zone" in terms and "Ztwo" in terms
    assert "Zthree" not in terms and "Zfour" not in terms
    # quoted phrases keep their content (the quote alternative matches)
    n3 = parse_user_query('"at&t merger" extra')
    assert any(isinstance(c, Phrase) for c in
               (n3.children if hasattr(n3, "children") else [n3]))
