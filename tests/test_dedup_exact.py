"""exact_dedup / exact_dedup_rows semantics: minimum doc_id per distinct
text survives; exact_dedup_rows returns the full surviving rows (all input
columns) with values identical to filtering by exact_dedup's id set — and
stays equivalent across parallelism (repartition) levels."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def dup_table():
    rng = np.random.Generator(np.random.PCG64(11))
    vocab = [f"w{i}" for i in range(50)]
    distinct = [" ".join(rng.choice(vocab, size=12)) for _ in range(120)]
    # each distinct text appears 1-5 times, interleaved, with extra columns
    texts, langs = [], []
    for i in range(600):
        texts.append(distinct[int(rng.integers(0, len(distinct)))])
        langs.append(["en", "de", "fr"][i % 3])
    # a few empty/null rows exercise the null path
    texts[7] = ""
    return pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def _expected_survivors(t: pa.Table) -> set[int]:
    first: dict[str, int] = {}
    for did, txt in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
        if txt not in first:
            first[txt] = did
    return set(first.values())


def test_exact_dedup_rows_matches_id_set(ray_session, dup_table):
    import ray.data

    from markdown_query_ray.pipelines.dedup import (
        exact_dedup,
        exact_dedup_rows,
    )

    ds = ray.data.from_arrow(dup_table).repartition(6)
    ids = set(np.concatenate([
        b.column("doc_id").to_numpy()
        for b in exact_dedup(ds).iter_batches(batch_format="pyarrow")] or
        [np.empty(0, np.int64)]).tolist())
    rows = pa.concat_tables(list(
        exact_dedup_rows(ds).iter_batches(batch_format="pyarrow")))
    expected = _expected_survivors(dup_table)
    assert ids == expected
    assert set(rows.column("doc_id").to_pylist()) == expected
    # full input schema preserved, values identical to the source rows
    assert set(rows.column_names) == set(dup_table.column_names)
    src = dup_table.sort_by("doc_id")
    got = rows.sort_by("doc_id").select(src.column_names)
    mask = np.isin(src.column("doc_id").to_numpy(),
                   np.array(sorted(expected), np.int64))
    assert got.equals(src.filter(pa.array(mask)))


def test_exact_dedup_rows_parallelism_invariant(ray_session, dup_table):
    import ray.data

    from markdown_query_ray.pipelines.dedup import exact_dedup_rows

    outs = []
    for parts in (1, 13):
        ds = ray.data.from_arrow(dup_table).repartition(parts)
        t = pa.concat_tables(list(
            exact_dedup_rows(ds).iter_batches(batch_format="pyarrow")))
        outs.append(t.sort_by("doc_id"))
    assert outs[0].equals(outs[1])
