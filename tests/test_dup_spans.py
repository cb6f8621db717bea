"""dup_token_spans (cross-doc duplicated-substring extraction) vs brute
force."""

import numpy as np
import pyarrow as pa

from markdown_query_ray.pipelines.dedup import dup_token_spans


def _brute(texts, w):
    def grams(t):
        toks = [x for x in (t or "").split(" ") if x]
        if len(toks) < w:
            return []
        return [tuple(toks[i:i + w]) for i in range(len(toks) - w + 1)]

    from collections import Counter
    df = Counter()
    for t in texts:
        df.update(set(grams(t)))
    spans = []
    for i, t in enumerate(texts):
        gs = grams(t)
        dpos = [p for p, g in enumerate(gs) if df[g] >= 2]
        j = 0
        while j < len(dpos):
            k = j
            while k + 1 < len(dpos) and dpos[k + 1] - dpos[k] <= w:
                k += 1
            spans.append((i, dpos[j], dpos[k] + w))
            j = k + 1
    return sorted(spans)


TEXTS = [
    "x1 a b c d e f x2 x3 x4 a b c d q r",   # two dup regions, 2nd overlaps
    "z a b c d e f z z",                     # shares "a b c d e f"
    "p q r s t u v w",                       # clean
    "tiny doc",                              # < w tokens
    "",                                      #
    "p q r s t u v w",                       # exact dup of doc 2
]


def test_spans_match_brute(ray_session):
    import ray.data

    t = pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                  "text": pa.array(TEXTS, pa.string())})
    out = dup_token_spans(ray.data.from_arrow(t).repartition(3), w=4,
                          num_buckets=8)
    got = sorted(zip(out.column("doc_id").to_pylist(),
                     out.column("span_start").to_pylist(),
                     out.column("span_end").to_pylist()))
    assert got == _brute(TEXTS, 4)


def test_adjacent_windows_merge(ray_session):
    import ray.data

    # docs 0/1 share the full 8-token run: every window dup, one span
    texts = ["a b c d e f g h", "a b c d e f g h junk tail words x"]
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = dup_token_spans(ray.data.from_arrow(t), w=4, num_buckets=4)
    got = sorted(zip(out.column("doc_id").to_pylist(),
                     out.column("span_start").to_pylist(),
                     out.column("span_end").to_pylist()))
    assert got == [(0, 0, 8), (1, 0, 8)]


def test_within_doc_repeat_not_cross_dup(ray_session):
    import ray.data

    texts = ["m n o p m n o p", "unrelated other doc content"]
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = dup_token_spans(ray.data.from_arrow(t), w=4, num_buckets=4)
    assert out.num_rows == 0


# ---------------------------------------------------------------------------
# dup_span_scrub (the rewrite)
# ---------------------------------------------------------------------------

def _brute_scrub(texts, w):
    def toklist(t):
        return [x for x in (t or "").split(" ") if x]

    from collections import Counter

    def grams(toks):
        if len(toks) < w:
            return []
        return [tuple(toks[i:i + w]) for i in range(len(toks) - w + 1)]

    df = Counter()
    for t in texts:
        df.update(set(grams(toklist(t))))
    out = []
    for i, t in enumerate(texts):
        toks = toklist(t)
        covered = [False] * len(toks)
        for p, g in enumerate(grams(toks)):
            if df[g] >= 2:
                for k in range(p, min(p + w, len(toks))):
                    covered[k] = True
        kept = [tok for tok, c in zip(toks, covered) if not c]
        out.append((i, " ".join(kept), sum(covered)))
    return out


def test_scrub_matches_brute(ray_session):
    import ray.data

    from markdown_query_ray.pipelines.dedup import dup_span_scrub

    t = pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                  "text": pa.array(TEXTS, pa.string())})
    out = dup_span_scrub(ray.data.from_arrow(t).repartition(3), w=4,
                         num_buckets=8)
    got = sorted(zip(out.column("doc_id").to_pylist(),
                     out.column("clean_text").to_pylist(),
                     out.column("n_removed").to_pylist()))
    assert got == _brute_scrub(TEXTS, 4)


def test_scrub_no_dups_normalizes_only(ray_session):
    import ray.data

    from markdown_query_ray.pipelines.dedup import dup_span_scrub

    texts = ["a  b   c", "totally different", ""]
    t = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = dup_span_scrub(ray.data.from_arrow(t), w=4, num_buckets=4)
    got = dict(zip(out.column("doc_id").to_pylist(),
                   out.column("clean_text").to_pylist()))
    assert got == {0: "a b c", 1: "totally different", 2: ""}
    assert out.column("n_removed").to_pylist() == [0, 0, 0]
