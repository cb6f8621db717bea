"""HTML -> text extraction stage.

The analog of the reference's frontmatter split (src/document.rs:123-160):
the per-row "parse" that turns the raw stored form into the indexable body,
with the per-row invariant that extraction is deterministic and byte-identical
per url (BASELINE.json ``input_hint``).

The extractor inverts the synthetic Common-Crawl wrapper produced by
``fixtures._doc_html``: it keeps ``<p>...</p>`` payloads (dropping
nav/script/style/footer boilerplate), unescapes the four entities the wrapper
escapes, and joins paragraphs with a blank line. On real Common-Crawl HTML
this would be a readability-style extractor behind the same stage signature;
the Ray-side plumbing (batch shape, column lifecycle) is identical.

Stateless ``map_batches`` stage: pure per-row, no setup cost, so plain tasks
(not an actor pool) are the right physical operator. The fat ``html`` column
is dropped here — immediately after its last use — so downstream shuffle
blocks stay small (SURVEY.md §7.3 item 8).
"""

from __future__ import annotations

import re

import pyarrow as pa

_P_RE = re.compile(r"<p>(.*?)</p>", re.S)


def extract_text(html: bytes | str) -> str:
    """Extract body text from one synthetic-wrapper HTML page."""
    if isinstance(html, (bytes, memoryview)):
        html = bytes(html).decode("utf-8")
    paras = _P_RE.findall(html)
    out = "\n\n".join(paras)
    # inverse of fixtures._escape (order matters: &amp; last)
    return (out.replace("&#39;", "'").replace("&gt;", ">")
               .replace("&lt;", "<").replace("&amp;", "&"))


def extract_batch(batch: pa.Table) -> pa.Table:
    """map_batches body: html:binary -> text:string, html column dropped.

    If the batch already carries a ``text`` column (trusted upstream extract),
    it is replaced — the extractor is the source of truth for the index.
    """
    texts = pa.array(
        [extract_text(h) for h in batch.column("html").to_pylist()],
        pa.large_string())
    cols = {name: batch.column(name) for name in batch.column_names
            if name not in ("html", "text")}
    cols["text"] = texts
    return pa.table(cols)
