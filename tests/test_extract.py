"""Fixture determinism + html->text extraction byte-identity (the per-row
invariant from BASELINE.json input_hint)."""

import pyarrow as pa

from markdown_query_ray.fixtures import (
    make_pages_table,
    pages_from_documents,
    write_pages_corpus,
)
from markdown_query_ray.stages.extract import extract_batch, extract_text


def test_fixture_deterministic():
    t1 = make_pages_table(0, 50)
    t2 = make_pages_table(0, 50)
    assert t1.equals(t2)
    # slicing invariance: rows [10, 30) generated standalone are identical
    t3 = make_pages_table(10, 20)
    assert t1.slice(10, 20).column("html").to_pylist() == \
        t3.column("html").to_pylist()


def test_extract_byte_identity():
    t = make_pages_table(0, 120)  # includes all corner-case docs
    for url, html, text in zip(t.column("url").to_pylist(),
                               t.column("html").to_pylist(),
                               t.column("text").to_pylist()):
        assert extract_text(html) == text, f"extraction mismatch for {url}"


def test_extract_batch_drops_html():
    t = make_pages_table(0, 10)
    out = extract_batch(t)
    assert "html" in t.column_names
    assert "html" not in out.column_names
    assert out.column("text").to_pylist() == t.column("text").to_pylist()
    assert out.column("url").to_pylist() == t.column("url").to_pylist()


def test_corner_docs_content():
    t = make_pages_table(0, 20)
    texts = t.column("text").to_pylist()
    assert "U.N.C.L.E." in texts[0]
    assert "AT&T" in texts[2]
    assert texts[15] == ""  # empty body doc
    assert "don’t" in texts[13]


def test_write_corpus(tmp_path):
    paths = write_pages_corpus(str(tmp_path / "pages"), n_docs=100, n_files=3)
    assert len(paths) == 3
    import pyarrow.parquet as pq
    total = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
    assert total == 100
    t = pq.read_table(paths[0])
    assert t.schema.names == ["url", "warc_ts", "html", "text", "lang"]


def test_pages_from_documents():
    t = pages_from_documents("/root/testdata/sf0.001")
    assert len(t) == 500
    for html, text in zip(t.column("html").to_pylist()[:25],
                          t.column("text").to_pylist()[:25]):
        assert extract_text(html) == text
