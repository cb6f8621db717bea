"""Trigram-model language ID vs a sequential pure-Python reference.

The operator's contract is exact: fixed-point integer profiles
(cnt * 2^20 // tot) trained on the labeled corpus, integer scores,
lexicographic tie-break, 'und' below one trigram.
"""

from collections import Counter

import numpy as np
import pyarrow as pa

from markdown_query_ray.pipelines.textstats import (
    TRI_SCALE,
    NgramLangIdStage,
    _tri_windows,
    ngram_lang_profiles,
)


def _ref(docs):
    """Independent reference: python loops, byte trigrams."""
    prof_cnt = {}
    for _id, text, lang in docs:
        b = text.encode()
        for i in range(len(b) - 2):
            prof_cnt.setdefault(lang, Counter())[b[i:i + 3]] += 1
    prof = {}
    for lang, cnt in prof_cnt.items():
        tot = sum(cnt.values())
        prof[lang] = {t: c * TRI_SCALE // tot for t, c in cnt.items()}
    langs = sorted(prof)
    out = []
    for _id, text, _lang in docs:
        b = text.encode()
        tris = [b[i:i + 3] for i in range(len(b) - 2)]
        if not tris:
            out.append((_id, "und", 0))
            continue
        scores = {L: sum(prof[L].get(t, 0) for t in tris) for L in langs}
        # max score, ties to the lexicographically FIRST lang
        top = max(scores.values())
        best = min(L for L in langs if scores[L] == top)
        out.append((_id, best, top))
    return out


def _docs():
    rng = np.random.Generator(np.random.PCG64(7))
    vocab = {
        "en": ["the", "quick", "brown", "fox", "jumps", "river"],
        "de": ["der", "schnelle", "braune", "fuchs", "springt", "fluss"],
        "fr": ["le", "rapide", "renard", "brun", "saute", "fleuve"],
    }
    docs = []
    i = 0
    for lang, words in vocab.items():
        for _ in range(12):
            n = int(rng.integers(3, 12))
            docs.append((i, " ".join(rng.choice(words, n)), lang))
            i += 1
    docs.append((i, "", "en"))         # no trigram -> 'und'
    docs.append((i + 1, "ab", "de"))   # too short -> 'und'
    return docs


def test_tri_windows_never_cross_docs():
    col = pa.array(["abcd", "", "xy", "pqr"])
    keys, d = _tri_windows(col)
    # doc 0: abc,bcd; doc 3: pqr
    assert d.tolist() == [0, 0, 3]
    assert keys[2] == (ord("p") << 16) | (ord("q") << 8) | ord("r")


def test_ngram_langid_matches_reference(ray_session):
    import ray.data

    docs = _docs()
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs]),
        "lang": pa.array([d[2] for d in docs]),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    import ray as _ray

    prof_ref = _ray.put(ngram_lang_profiles(ds))
    out = ds.map_batches(
        NgramLangIdStage, fn_constructor_args=(prof_ref,),
        batch_format="pyarrow", concurrency=(1, 4)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = _ref(docs)
    assert list(out["lang_pred"]) == [e[1] for e in exp]
    assert list(out["score"]) == [e[2] for e in exp]
    # the model should actually separate the languages on labeled rows
    labeled = [(d, e) for d, e in zip(docs, exp) if d[1]]
    acc = np.mean([d[2] == e[1] for d, e in labeled])
    assert acc > 0.9


def test_langid_universe_includes_trigramless_langs(ray_session):
    """The language universe must be every DISTINCT lang in the corpus
    (the SQL oracle cross-joins all of them): a lang whose only docs are
    too short to produce trigrams still participates, so an
    all-zero-score doc resolves to the lexicographically-first lang of
    the FULL universe."""
    import ray
    import ray.data

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        # lang 'aa' contributes NO trigrams; 'qzj' shares no trigram
        # with the 'en' profile -> zero score everywhere
        "text": pa.array(["hello world text", "ab", "qzj"]),
        "lang": pa.array(["en", "aa", "en"]),
    })
    ds = ray.data.from_arrow(t)
    # scale=1 floors every profile frequency to 0 (cnt < tot), forcing
    # the all-zero-score regime the universe rule decides
    langs, prof = ngram_lang_profiles(ds, scale=1)
    assert langs == ["aa", "en"]
    assert len(prof["aa"][0]) == 0
    stage = NgramLangIdStage.__new__(NgramLangIdStage)
    stage._langs, stage._prof = langs, prof
    out = stage(t).to_pydict()
    # docs 0 and 2 have trigrams but zero score for both langs -> 'aa'
    # (first of the FULL universe), matching ORDER BY score DESC, lang
    # over a cross join of all corpus langs
    assert out["lang_pred"][0] == "aa" and out["score"][0] == 0
    assert out["lang_pred"][2] == "aa" and out["score"][2] == 0
    assert out["lang_pred"][1] == "und"  # no trigram at all


def test_langid_all_short_corpus(ray_session):
    """Corpus where no doc produces a trigram: every prediction is
    'und', no crash on the empty profile matrix."""
    import ray.data

    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["ab", ""]),
        "lang": pa.array(["en", "de"]),
    })
    langs, prof = ngram_lang_profiles(ray.data.from_arrow(t))
    stage = NgramLangIdStage.__new__(NgramLangIdStage)
    stage._langs, stage._prof = langs, prof
    out = stage(t).to_pydict()
    assert out["lang_pred"] == ["und", "und"]
    assert out["score"] == [0, 0]
