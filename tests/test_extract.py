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


def test_jsonl_source_matches_parquet(ray_session, tmp_path):
    """read_pages_jsonl assigns the identical deterministic doc_ids and
    yields the same rows as the parquet reader over the same stream, and a
    JSONL-built index equals the parquet-built one."""
    import json as jsonlib

    import pyarrow.parquet as pq

    from markdown_query_ray.config import IndexConfig, QueryConfig
    from markdown_query_ray.fixtures import write_pages_corpus
    from markdown_query_ray.index.build import build_index
    from markdown_query_ray.query import executor as qx
    from markdown_query_ray.query.ast import Term
    from markdown_query_ray.sources.pages import read_pages_jsonl

    paths = write_pages_corpus(str(tmp_path / "pq"), n_docs=120, n_files=3)
    jl_paths = []
    for p in sorted(paths):
        t = pq.read_table(p, columns=["url", "text"])
        jp = str(tmp_path / (p.split("/")[-1] + ".jsonl"))
        with open(jp, "w") as f:
            for row in t.to_pylist():
                f.write(jsonlib.dumps(row) + "\n")
        jl_paths.append(jp)

    ds = read_pages_jsonl(jl_paths, columns=["url", "text"])
    rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in rows] == list(range(120))

    cfg = IndexConfig(tokenizer="simple", stem=False, num_term_parts=2,
                      num_doc_buckets=1)
    idx_a = str(tmp_path / "idx_jsonl")
    build_index(idx_a, dataset=read_pages_jsonl(
        jl_paths, columns=["url", "text"]), cfg=cfg, total_docs=120)
    idx_b = str(tmp_path / "idx_pq")
    import ray.data

    pq_ds = ray.data.read_parquet(sorted(paths), columns=["url", "text"])

    def add_ids(batch, base={"n": 0}):  # single-threaded fallback ids
        return batch

    # reuse parquet reader with its own id scheme for the reference build
    from markdown_query_ray.sources.pages import read_pages
    # (read_pages loads html; this corpus comparison uses text via jsonl and
    # html->text via parquet — instead compare against a direct text build)
    t_all = []
    for p in sorted(paths):
        t_all.append(pq.read_table(p, columns=["url", "text"]))
    import numpy as np
    import pyarrow as pa

    full = pa.concat_tables(t_all).append_column(
        "doc_id", pa.array(np.arange(120, dtype=np.uint64)))
    build_index(idx_b, dataset=ray.data.from_arrow(full), cfg=cfg,
                total_docs=120)

    for term in ("the", "merge", "xqzrareuno"):
        a = qx.search(idx_a, Term(term), QueryConfig(k=50),
                      distributed=False)
        b = qx.search(idx_b, Term(term), QueryConfig(k=50),
                      distributed=False)
        assert a.equals(b), term


def test_jsonl_missing_trailing_newline_ids_dont_overlap(ray_session,
                                                         tmp_path):
    """A JSONL file whose last line lacks a trailing newline still counts
    that row: undercounting would make the next file's doc_id base overlap
    and two documents would share an id."""
    import json as jsonlib

    from markdown_query_ray.sources.pages import (
        jsonl_row_counts,
        read_pages_jsonl,
    )

    p1 = str(tmp_path / "a.jsonl")
    p2 = str(tmp_path / "b.jsonl")
    with open(p1, "w") as f:  # NO trailing newline on the last row
        f.write(jsonlib.dumps({"url": "u0", "text": "x"}) + "\n")
        f.write(jsonlib.dumps({"url": "u1", "text": "y"}))
    with open(p2, "w") as f:
        f.write(jsonlib.dumps({"url": "u2", "text": "z"}) + "\n")

    assert jsonl_row_counts([p1, p2]) == [2, 1]
    rows = sorted(read_pages_jsonl([p1, p2]).take_all(),
                  key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in rows] == [0, 1, 2]
    assert [r["url"] for r in rows] == ["u0", "u1", "u2"]


# ---------------------------------------------------------------------------
# general boilerplate-stripping extractor (round 4)
# ---------------------------------------------------------------------------

from markdown_query_ray.stages.extract import (  # noqa: E402
    extract_batch_general,
    extract_text_general,
)


def test_general_subsumes_wrapper_byte_identical():
    """On the synthetic wrapper corpus the general extractor produces
    byte-identical output to the fast inverter (so it strictly
    subsumes it)."""
    t = make_pages_table(0, 200)  # includes every corner-case doc
    for html, text in zip(t.column("html").to_pylist(),
                          t.column("text").to_pylist()):
        assert extract_text_general(html) == text


def test_general_drops_boilerplate_subtrees():
    html = (b"<html><head><title>T</title><script>var x = '<p>no</p>';"
            b"</script><style>p{}</style></head><body>"
            b"<nav><ul><li>menu</li></ul></nav>"
            b"<p>keep me</p>"
            b"<aside>sidebar junk</aside>"
            b"<footer>foot</footer></body></html>")
    assert extract_text_general(html) == "keep me"


def test_general_blocks_and_br():
    html = (b"<div>first\n  block</div><h1>Head  ing</h1>"
            b"<p>line one<br>line two<br/>line three</p>")
    assert extract_text_general(html) == \
        "first block\n\nHead ing\n\nline one\nline two\nline three"


def test_general_entities_and_comments():
    html = (b"<p>Fish &amp; chips &lt;3 &#39;quoted&#39; &copy; &#x41;</p>"
            b"<!-- <p>commented out</p> --><p>after</p>")
    assert extract_text_general(html) == \
        "Fish & chips <3 'quoted' \xa9 A\n\nafter"


def test_general_attribute_with_gt_and_malformed():
    html = (b'<p data-x="a > b">body</p><p>unclosed'
            b"<p>next</p>")
    # attribute '>' must not terminate the tag; unclosed <p> flushes at
    # the next block boundary
    assert extract_text_general(html) == "body\n\nunclosed\n\nnext"


def test_general_pre_verbatim():
    html = (b"<p>intro</p><pre>  code   line\n   indented  </pre>"
            b"<p>outro</p>")
    assert extract_text_general(html) == \
        "intro\n\n  code   line\n   indented  \n\noutro"


def test_general_table_cells_and_lists():
    html = (b"<table><tr><td>a1</td><td>b1</td></tr>"
            b"<tr><td>a2</td></tr></table>"
            b"<ul><li>one</li><li>two</li></ul>")
    assert extract_text_general(html) == \
        "a1\n\nb1\n\na2\n\none\n\ntwo"


def test_general_utf8_replacement_and_determinism():
    bad = b"<p>caf\xc3\xa9 ok \xff\xfe broken</p>"
    out1 = extract_text_general(bad)
    out2 = extract_text_general(bad)
    assert out1 == out2
    assert "caf\xe9 ok" in out1 and "�" in out1


def test_general_nested_drop_same_tag():
    html = b"<nav>outer<nav>inner</nav>still dropped</nav><p>kept</p>"
    assert extract_text_general(html) == "kept"


def test_extract_batch_general_column_lifecycle():
    t = make_pages_table(0, 8)
    out = extract_batch_general(t)
    assert "html" not in out.column_names
    assert out.column("text").to_pylist() == t.column("text").to_pylist()


def test_general_void_and_implicitly_closed_drop_tags():
    """Void drop elements (<embed>) and implicitly-closed ones
    (<option> inside <select>) must not leak the drop scope and eat the
    rest of the document."""
    assert extract_text_general(
        b"<p>before</p><embed src=x><p>after</p>") == "before\n\nafter"
    assert extract_text_general(
        b"<select><option>A<option>B</select><p>content</p>") == "content"
    assert extract_text_general(
        b"<nav>menu<select><option>A</select></nav><p>kept</p>") == "kept"
    # stray end tag with nothing open is a no-op
    assert extract_text_general(b"</nav><p>ok</p>") == "ok"
