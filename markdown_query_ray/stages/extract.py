"""HTML -> text extraction stage.

The analog of the reference's frontmatter split (src/document.rs:123-160):
the per-row "parse" that turns the raw stored form into the indexable body,
with the per-row invariant that extraction is deterministic and byte-identical
per url (BASELINE.json ``input_hint``).

Two extractors behind the same stage signature:

- :func:`extract_text` — the fast inverse of the synthetic Common-Crawl
  wrapper produced by ``fixtures._doc_html`` (keeps ``<p>...</p>``
  payloads, unescapes the wrapper's four entities, joins paragraphs with
  a blank line). This is what every golden/oracle was recorded against.
- :func:`extract_text_general` (round 4) — a real boilerplate-stripping
  extractor for arbitrary HTML, built on the stdlib ``html.parser``
  state machine (handles comments, attributes containing ``>``,
  script/style CDATA modes, all named/numeric character references):
  drops script/style/noscript/template/head/nav/footer/aside/form/
  iframe/svg/... subtrees, breaks text into blocks at block-level
  elements (joined with a blank line), honors ``<br>`` as an intra-block
  line break, collapses whitespace per line (verbatim inside ``<pre>``),
  and decodes bytes as UTF-8 with replacement (the WET-style policy; a
  charset sniffer would slot in front). On the synthetic wrapper corpus
  it produces BYTE-IDENTICAL output to :func:`extract_text`
  (property-tested in tests/test_extract.py), so it strictly subsumes
  the fast path; the fast path stays the default for the oracle-pinned
  entries.

Stateless ``map_batches`` stage: pure per-row, no setup cost, so plain tasks
(not an actor pool) are the right physical operator. The fat ``html`` column
is dropped here — immediately after its last use — so downstream shuffle
blocks stay small (SURVEY.md §7.3 item 8).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

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


# ---------------------------------------------------------------------------
# general boilerplate-stripping extractor (round 4)
# ---------------------------------------------------------------------------

# subtrees whose text never reaches the output
_DROP_TAGS = frozenset((
    "script", "style", "noscript", "template", "head", "title", "nav",
    "footer", "aside", "form", "iframe", "svg", "canvas", "button",
    "select", "datalist", "option", "object", "embed", "applet", "map",
))

# elements that open/close a text block (blocks join with a blank line)
_BLOCK_TAGS = frozenset((
    "address", "article", "blockquote", "body", "caption", "dd",
    "details", "dialog", "div", "dl", "dt", "fieldset", "figcaption",
    "figure", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hgroup",
    "hr", "html", "li", "main", "menu", "ol", "p", "pre", "section",
    "summary", "table", "tbody", "td", "tfoot", "th", "thead", "tr",
    "ul",
))

_BR = object()  # intra-block line-break sentinel (cannot occur in data)

# HTML5 void elements: no end tag ever arrives, so a void drop tag
# (e.g. <embed>) must not open a drop scope it can never close
_VOID_TAGS = frozenset((
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
))


class _TextExtractor(HTMLParser):
    """Single-pass text extraction over the stdlib HTML5-ish tokenizer.

    Dropped subtrees are tracked as a STACK of open drop tags, not a
    counter: an end tag pops up to and including its nearest matching
    open tag, which gives implicit-close semantics for misnested markup
    (``<select><option>A<option>B</select>`` leaves the stack empty —
    a plain counter would leak and silently drop the rest of the
    document). Void drop elements never push.

    Reusable across documents via :meth:`restart` (HTMLParser.reset plus
    clearing the accumulation state) so the batch stage pays parser
    construction once."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self._drop: list[str] = []
        self._pre = 0
        self._parts: list = []
        self._blocks: list[str] = []

    def restart(self) -> None:
        self.reset()
        self._drop = []
        self._pre = 0
        self._parts = []
        self._blocks = []

    # -- tokenizer callbacks --
    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            if tag not in _VOID_TAGS:
                self._drop.append(tag)
            return
        if self._drop:
            return
        if tag == "br":
            self._parts.append(_BR)
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag == "pre":
                self._pre += 1

    def handle_startendtag(self, tag, attrs):
        # <br/>, <hr/>, <embed/> — self-closing never opens a scope
        if tag in _DROP_TAGS or self._drop:
            return
        if tag == "br":
            self._parts.append(_BR)
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if self._drop:
            if tag in self._drop:
                # pop up to and including the nearest match: implicit
                # close of anything the tokenizer saw opened inside it
                while self._drop and self._drop.pop() != tag:
                    pass
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag == "pre":
                self._pre = max(0, self._pre - 1)

    def handle_data(self, data):
        if not self._drop and data:
            self._parts.append(data)

    # -- block assembly --
    def _flush(self) -> None:
        parts = self._parts
        if not parts:
            return
        self._parts = []
        if self._pre:
            block = "".join("\n" if p is _BR else p
                            for p in parts).strip("\n")
            if block.strip():
                self._blocks.append(block)
            return
        lines: list[list[str]] = [[]]
        for p in parts:
            if p is _BR:
                lines.append([])
            else:
                lines[-1].append(p)
        norm = [" ".join("".join(seg).split()) for seg in lines]
        norm = [ln for ln in norm if ln]
        if norm:
            self._blocks.append("\n".join(norm))

    def text(self) -> str:
        self._flush()
        return "\n\n".join(self._blocks)


def extract_text_general(html: bytes | str,
                         parser: _TextExtractor | None = None) -> str:
    """Boilerplate-stripping text extraction for arbitrary HTML (see
    module docstring for the exact whitespace/block policy). Pass a
    reused parser to amortize construction inside a batch loop."""
    if isinstance(html, (bytes, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = parser or _TextExtractor()
    p.restart()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # html.parser raises only on truly pathological input; the
        # stage contract is deterministic text out for bytes in, so a
        # parse abort yields whatever was extracted up to that point
        pass
    return p.text()


def extract_batch_general(batch: pa.Table) -> pa.Table:
    """map_batches body for the general extractor — same column
    lifecycle as :func:`extract_batch` (html dropped after use)."""
    parser = _TextExtractor()
    texts = pa.array(
        [extract_text_general(h, parser)
         for h in batch.column("html").to_pylist()],
        pa.large_string())
    cols = {name: batch.column(name) for name in batch.column_names
            if name not in ("html", "text")}
    cols["text"] = texts
    return pa.table(cols)
