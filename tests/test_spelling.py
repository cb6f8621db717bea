"""Spelling correction: edit distance, trigram candidates, query-string
correction over a built index's term dictionary."""

from __future__ import annotations

import pytest

from markdown_query_ray.query.spelling import (
    SpellingIndex,
    correct_query,
    edit_distance,
    trigrams,
)


@pytest.mark.parametrize("a,b,d", [
    ("", "", 0), ("a", "", 1), ("abc", "abc", 0), ("abc", "abd", 1),
    ("abc", "acb", 2), ("kitten", "sitting", 3), ("merge", "mrege", 2),
    ("merge", "merg", 1), ("sort", "sport", 1),
])
def test_edit_distance(a, b, d):
    got = edit_distance(a, b, cap=3)
    assert got == min(d, 4) or (d > 3 and got == 4)


def test_edit_distance_cap():
    assert edit_distance("abcdefgh", "zyxwvuts", cap=2) == 3


def test_trigrams():
    assert trigrams("ab") == {"^ab", "ab$"}
    assert "^me" in trigrams("merge") and "ge$" in trigrams("merge")


@pytest.fixture()
def spell():
    return SpellingIndex({
        "merge": 100, "sort": 80, "merger": 5, "sorted": 10,
        "window": 30, "windows": 3, "Zmerg": 999, "Stitle": 999,
    })


def test_prefixed_terms_excluded(spell):
    assert "Zmerg" not in spell.freqs and "Stitle" not in spell.freqs


def test_suggest_basic(spell):
    assert spell.suggest("mrege") == "merge"
    assert spell.suggest("sprt") == "sort"
    assert spell.suggest("windoow") == "window"


def test_in_dictionary_not_corrected(spell):
    assert spell.suggest("merge") is None


def test_frequency_breaks_ties(spell):
    # "merg" is distance 1 from both merge(100) and merger(5)
    assert spell.suggest("merg") == "merge"


def test_too_far_returns_none(spell):
    assert spell.suggest("zzzzzz") is None


def test_correct_query_preserves_operators(spell):
    got = correct_query("mrege AND sprt", spell)
    assert got == "merge AND sort"
    assert correct_query("merge AND sort", spell) is None
    got = correct_query('mrege OR "window sort"', spell)
    assert got == 'merge OR "window sort"'


def test_session_suggestion_over_built_index(built_index):
    from markdown_query_ray.query.session import SearchSession

    idx, _, _ = built_index
    s = SearchSession(idx)
    # 'xqzrareuno' is planted in the fixture corpus (fixtures.RARE_TERMS);
    # a one-edit corruption of it must correct back
    got = s.suggest_correction("xqzrareun")
    assert got == "xqzrareuno"
    assert s.suggest_correction("xqzrareuno") is None
    # second call reuses the cached dictionary
    assert s.suggest_correction("xqzrareun") == "xqzrareuno"
