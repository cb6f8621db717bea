"""Benchmark-decontamination operator vs a string-set brute force."""

import numpy as np
import pyarrow as pa
import pytest

from markdown_query_ray.pipelines.decontam import (
    ContaminationStage,
    benchmark_shingle_set,
    contamination_flags,
)


def _brute(texts, bench_texts, w=3, num=1, den=10):
    """Reference semantics on STRING shingle sets (no hashing)."""
    def shingles(t):
        toks = [x for x in (t or "").split(" ") if x]
        if not toks:
            return set()
        if len(toks) <= w:
            return {"\x1f".join(toks)}
        return {"\x1f".join(toks[i:i + w])
                for i in range(len(toks) - w + 1)}

    bench = set()
    for t in bench_texts:
        bench |= shingles(t)
    rows = []
    for i, t in enumerate(texts):
        s = shingles(t)
        o = len(s & bench)
        rows.append((i, len(s), o,
                     int(len(s) > 0 and o * den >= len(s) * num)))
    return rows


CORPUS = [
    "the quick brown fox jumps over the lazy dog",      # partial overlap
    "the quick brown fox",                               # heavy overlap
    "completely unrelated text with novel words here",   # zero overlap
    "xy",                                                # shorter than w
    "",                                                  # no tokens
    "the quick brown cat naps under the lazy dog",       # mid overlap
]
BENCH = ["the quick brown fox ran far", "over the lazy dog it went"]


@pytest.fixture()
def corpus_ds(ray_session):
    import ray.data

    t = pa.table({"doc_id": pa.array(range(len(CORPUS)), pa.int64()),
                  "text": pa.array(CORPUS, pa.string())})
    return ray.data.from_arrow(t).repartition(3)


@pytest.fixture()
def bench_ds(ray_session):
    import ray.data

    t = pa.table({"doc_id": pa.array(range(len(BENCH)), pa.int64()),
                  "text": pa.array(BENCH, pa.string())})
    return ray.data.from_arrow(t).repartition(2)


def test_flags_match_brute_force(corpus_ds, bench_ds):
    out = contamination_flags(corpus_ds, bench_ds, concurrency=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = _brute(CORPUS, BENCH)
    got = list(out.itertuples(index=False, name=None))
    assert got == exp


def test_benchmark_set_is_distinct_union(bench_ds):
    hs = benchmark_shingle_set(bench_ds)
    assert hs.dtype == np.uint64
    assert len(np.unique(hs)) == len(hs)
    assert np.all(np.diff(hs.astype(np.uint64)) > 0)  # sorted
    # exactly the string-set cardinality (no collisions at this size)
    exp = _brute([], BENCH)
    bench_strings = set()
    for t in BENCH:
        toks = t.split(" ")
        bench_strings |= {"\x1f".join(toks[i:i + 3])
                          for i in range(len(toks) - 2)}
    assert len(hs) == len(bench_strings)


def test_threshold_boundary_exact_integer():
    # doc with 10 distinct shingles, exactly 1 in bench -> o*10 == n -> hit
    bench = np.sort(np.unique(
        benchmark_like := _hashes("a b c")))
    stage = ContaminationStage(bench, w=3, num=1, den=10)
    doc = "a b c " + " ".join(f"w{i}" for i in range(9))  # 12 toks, 10 sh
    t = stage(pa.table({"doc_id": pa.array([0], pa.int64()),
                        "text": pa.array([doc])}))
    assert t.column("n_shingles")[0].as_py() == 10
    assert t.column("n_overlap")[0].as_py() == 1
    assert t.column("contaminated")[0].as_py() == 1


def test_empty_doc_never_contaminated():
    bench = _hashes("a b c")
    stage = ContaminationStage(np.sort(bench), w=3)
    t = stage(pa.table({"doc_id": pa.array([7], pa.int64()),
                        "text": pa.array([""])}))
    assert t.column("n_shingles")[0].as_py() == 0
    assert t.column("contaminated")[0].as_py() == 0


def test_bench_member_fully_contaminated(corpus_ds):
    """A doc that IS in the benchmark overlaps itself completely."""
    import ray.data

    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array([CORPUS[0]])})
    out = contamination_flags(
        corpus_ds, ray.data.from_arrow(t), concurrency=1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    row = out.iloc[0]
    assert row["n_overlap"] == row["n_shingles"] > 0
    assert row["contaminated"] == 1


def _hashes(text):
    from markdown_query_ray.pipelines.dedup import shingle_hashes

    return np.unique(shingle_hashes(text, 3))
