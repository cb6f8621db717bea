"""Bigram score-by-join vs a string-level brute force."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from markdown_query_ray.pipelines.ngramstats import (
    bigram_count_partials,
    bigram_scores,
)


def _brute(texts):
    def bigrams(t):
        toks = [x for x in (t or "").split(" ") if x]
        return [(toks[i], toks[i + 1]) for i in range(len(toks) - 1)]

    counts = Counter()
    for t in texts:
        counts.update(bigrams(t))
    rows = {}
    for i, t in enumerate(texts):
        bg = bigrams(t)
        if bg:
            cs = [counts[b] for b in bg]
            rows[i] = (len(bg), sum(cs), min(cs))
    return rows


TEXTS = [
    "the cat sat on the mat",
    "the cat ran",
    "the cat sat on a hat",
    "single",
    "",
    "the cat sat on the mat",   # exact dup: doubles its bigram counts
    "on the",                   # one bigram, shared with doc 0/5
]


def test_scores_match_brute(ray_session):
    import ray.data

    t = pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                  "text": pa.array(TEXTS, pa.string())})
    out = bigram_scores(ray.data.from_arrow(t).repartition(3),
                        num_buckets=4).to_pandas() \
        .set_index("doc_id").sort_index()
    exp = _brute(TEXTS)
    assert set(out.index) == set(exp)
    for i, (n, s, mn) in exp.items():
        row = out.loc[i]
        assert (row["n_bigrams"], row["sum_count"],
                row["min_count"]) == (n, s, mn), i


def test_count_partials_count_occurrences():
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["a b a b", "a b"], pa.string())})
    out = bigram_count_partials(t)
    # "a b" occurs 2x in doc0 + 1x in doc1; "b a" 1x
    assert sorted(out.column("cnt_part").to_pylist()) == [1, 3]


def test_short_docs_have_no_bigrams():
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(["", "one", "  "], pa.string())})
    assert bigram_count_partials(t).num_rows == 0


def test_driver_entry_pins_empties(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from markdown_query_ray.pipelines.driver_api import bigram_novelty

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                  "text": pa.array(TEXTS, pa.string())}),
        str(sf / "documents.parquet"))
    out = bigram_novelty(str(sf))
    assert out.num_rows == len(TEXTS)
    got = {r["doc_id"]: (r["n_bigrams"], r["sum_count"], r["min_count"])
           for r in out.to_pylist()}
    exp = _brute(TEXTS)
    for i in range(len(TEXTS)):
        assert got[i] == exp.get(i, (0, 0, -1)), i


# ---------------------------------------------------------------------------
# cross-doc duplicated-window coverage
# ---------------------------------------------------------------------------

def _brute_dup(texts, w):
    def grams(t):
        toks = [x for x in (t or "").split(" ") if x]
        return [tuple(toks[i:i + w]) for i in range(len(toks) - w + 1)]

    docsets = [set(grams(t)) for t in texts]
    df = Counter()
    for s in docsets:
        df.update(s)
    rows = {}
    for i, t in enumerate(texts):
        gs = grams(t)
        rows[i] = (len(gs), sum(1 for g in gs if df[g] >= 2))
    return rows


DUP_TEXTS = [
    "a b c d e f",        # shares "a b c d" with doc 1
    "a b c d x y",
    "p q r s p q r s",    # within-doc repeat only: NOT cross-duplicated
    "unrelated words here entirely",
    "a b c",              # < 4 tokens: pinned (0, 0)
    "",
    "a b c d e f",        # exact dup of doc 0
]


def test_cross_dup_scores_match_brute(ray_session):
    import ray.data

    from markdown_query_ray.pipelines.ngramstats import cross_dup_scores

    t = pa.table({"doc_id": pa.array(range(len(DUP_TEXTS)), pa.int64()),
                  "text": pa.array(DUP_TEXTS, pa.string())})
    out = cross_dup_scores(ray.data.from_arrow(t).repartition(3),
                           w=4, num_buckets=4).to_pandas() \
        .set_index("doc_id").sort_index()
    exp = _brute_dup(DUP_TEXTS, 4)
    # cross_dup_scores only emits docs with >= w tokens
    assert set(out.index) == {i for i, (n, _) in exp.items() if n > 0}
    for i in out.index:
        row = out.loc[i]
        assert (row["n_windows"], row["dup_windows"]) == exp[i], i


def test_cross_dup_driver_entry_pins_short_docs(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from markdown_query_ray.pipelines.driver_api import cross_dup_coverage

    sf = tmp_path / "sfdup"
    sf.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(DUP_TEXTS)), pa.int64()),
                  "text": pa.array(DUP_TEXTS, pa.string())}),
        str(sf / "documents.parquet"))
    out = cross_dup_coverage(str(sf))
    assert out.num_rows == len(DUP_TEXTS)
    got = {r["doc_id"]: (r["n_windows"], r["dup_windows"])
           for r in out.to_pylist()}
    exp = _brute_dup(DUP_TEXTS, 4)
    for i in range(len(DUP_TEXTS)):
        assert got[i] == exp[i], i


def test_ccnet_buckets_matches_reference(ray_session):
    """Pipeline vs a sequential pure-Python replay of the whole gate:
    bigram corpus counts, fixed-point mean metric, per-lang tertiles
    with the max(1, ceil(q*n)) rank rule, threshold buckets."""
    import math
    from collections import Counter

    import ray.data

    from markdown_query_ray.pipelines.equijoin import collect_arrow
    from markdown_query_ray.pipelines.ngramstats import ccnet_buckets

    rng = np.random.Generator(np.random.PCG64(11))
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(120):
        n = int(rng.integers(0, 14))  # includes 0- and 1-token docs
        docs.append((i, " ".join(rng.choice(vocab, n)),
                     ["en", "de", "fr"][i % 3]))

    # -- reference --
    cnt = Counter()
    doc_bi = {}
    for i, text, _ in docs:
        toks = [t for t in text.split(" ") if t]
        bi = [(toks[j], toks[j + 1]) for j in range(len(toks) - 1)]
        doc_bi[i] = bi
        cnt.update(bi)
    metric = {i: sum(cnt[b] for b in bi) * 1024 // len(bi)
              for i, bi in doc_bi.items() if bi}
    thr = {}
    for lang in ["en", "de", "fr"]:
        vals = sorted(metric[i] for i, _, la in docs
                      if la == lang and i in metric)
        n = len(vals)
        t13 = vals[max(1, math.ceil(n / 3)) - 1]
        t23 = vals[max(1, math.ceil(2 * n / 3)) - 1]
        thr[lang] = (t13, t23)
    exp = {}
    for i, _, lang in docs:
        if i not in metric:
            exp[i] = (-1, "tail")
            continue
        m = metric[i]
        t13, t23 = thr[lang]
        exp[i] = (m, "head" if m >= t23 else
                  "middle" if m >= t13 else "tail")

    # -- pipeline --
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs]),
        "lang": pa.array([d[2] for d in docs]),
    })
    out = collect_arrow(
        ccnet_buckets(ray.data.from_arrow(t).repartition(5)),
        pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                   ("metric", pa.int64()), ("bucket", pa.string())]))
    got = {d: (m, b) for d, m, b in zip(
        out.column("doc_id").to_pylist(), out.column("metric").to_pylist(),
        out.column("bucket").to_pylist())}
    assert got == exp
    assert {"head", "middle", "tail"} == set(
        b for _, b in got.values() if _ != -1) | {"tail"}


def test_shingle_column_kernel_parity():
    """The one-sweep Arrow-buffer shingle kernel computes exactly the
    per-doc shingle_hashes function (including the <w whole-doc shingle,
    empty docs, nulls, multiple spaces, and non-ASCII), and the C and
    pure-Python paths agree."""
    import os

    import numpy as np
    import pyarrow as pa

    from markdown_query_ray.pipelines.dedup import (
        shingle_hashes,
        shingle_hashes_column,
    )

    texts = ["a b c d e", "", None, "one", "two  spaced   out", "x y",
             "héllo wörld naïve", " lead and trail ", "a a a a a a a a"]
    col = pa.array(texts, pa.string())
    for w in (1, 2, 4):
        keys, counts, ntok = shingle_hashes_column(col, w)
        exp_keys, exp_counts, exp_ntok = [], [], []
        for t in texts:
            t = t or ""
            h = shingle_hashes(t, w)
            exp_keys.append(h)
            exp_counts.append(len(h))
            exp_ntok.append(sum(1 for x in t.split(" ") if x))
        assert counts.tolist() == exp_counts
        assert ntok.tolist() == exp_ntok
        assert keys.tolist() == np.concatenate(
            exp_keys if exp_keys else [np.empty(0, np.uint64)]).tolist()
        # pure-Python fallback identical
        os.environ["MDQ_RAY_NO_CTOK"] = "1"
        try:
            import markdown_query_ray.functions.ctok as ctok
            saved = ctok._mod
            ctok._mod = None
            k2, c2, n2 = shingle_hashes_column(col, w)
        finally:
            del os.environ["MDQ_RAY_NO_CTOK"]
            ctok._mod = saved
        assert k2.tolist() == keys.tolist()
        assert c2.tolist() == counts.tolist()
        assert n2.tolist() == ntok.tolist()


def test_col_windows_matches_per_doc_reference():
    """_col_windows (batch kernel + vectorized gates) == the per-doc
    _doc_bigrams reference, and window_occ_batch's run-length per-doc
    occurrence counts == per-doc np.unique."""
    import numpy as np
    import pyarrow as pa

    from markdown_query_ray.pipelines.dedup import shingle_hashes
    from markdown_query_ray.pipelines.ngramstats import (
        _as_i64,
        _col_windows,
        _doc_bigrams,
        window_occ_batch,
    )

    texts = ["b a b a b", "", None, "solo", "x y z w v u",
             "dup dup dup dup", "a b"]
    batch = pa.table({
        "doc_id": pa.array(list(range(100, 100 + len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    rows, keys = _col_windows(batch, 2)
    ref_rows, ref_keys = _doc_bigrams(texts)
    assert rows.tolist() == ref_rows.tolist()
    assert keys.tolist() == ref_keys.tolist()

    w = 3
    got = window_occ_batch(batch, w)
    exp = []
    for i, t in enumerate(texts):
        if not t or sum(1 for x in t.split(" ") if x) < w:
            continue
        uk, cnt = np.unique(_as_i64(shingle_hashes(t, w)),
                            return_counts=True)
        for k, c in zip(uk, cnt):
            exp.append((100 + i, int(k), int(c)))
    got_rows = sorted(zip(got.column("doc_id").to_pylist(),
                          got.column("skey").to_pylist(),
                          got.column("occ").to_pylist()))
    assert got_rows == sorted(exp)


def test_distinct_pairs_expand_to_occurrences():
    """bigram_scores' distinct (doc, bkey, occ) rows are exactly the
    occurrence-row form of bigram_occurrences_batch: repeating each
    distinct pair occ times reproduces the occurrence multiset."""
    import numpy as np

    from markdown_query_ray.pipelines.ngramstats import (
        bigram_occurrences_batch,
        window_occ_batch,
    )

    texts = ["a b a b a", "x y", "", "solo", "a a a a",
             "the cat the cat the"]
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    occ_rows = bigram_occurrences_batch(batch)
    dist = window_occ_batch(batch, 2)
    want = np.stack([occ_rows.column("doc_id").to_numpy(),
                     occ_rows.column("bkey").to_numpy()], axis=1)
    got = np.stack([
        np.repeat(dist.column("doc_id").to_numpy(),
                  dist.column("occ").to_numpy()),
        np.repeat(dist.column("skey").to_numpy(),
                  dist.column("occ").to_numpy()),
    ], axis=1)
    # multiset equality (order-insensitive)
    assert np.array_equal(want[np.lexsort(want.T)], got[np.lexsort(got.T)])
