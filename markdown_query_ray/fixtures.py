"""Deterministic synthetic Common-Crawl-style web-page corpus (FIXTURES.md §1).

Input shape per BASELINE.json ``input_hint``:
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.

Everything is a pure function of (seed, row index): no wall clock, no UUIDs —
so re-runs, task retries and different parallelism levels produce
byte-identical data (the reference achieves the same via upsert-by-key,
backends/database.cc:193-208; we achieve it by construction).

The ``html`` column is a deterministic wrapper of ``text`` with boilerplate
(nav/script/footer) that the extractor must drop; the per-row invariant is
``extract_text(html) == text`` byte-for-byte per url.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SEED = 42
VOCAB_SIZE = 8000
ZIPF_S = 1.07

# Tokenizer corner-case snippets embedded verbatim into docs 0..len-1
# (FIXTURES.md: acronym, infix, suffix, 64-byte cap, unicode, empty body).
CORNER_SNIPPETS = [
    "U.N.C.L.E. called",
    "P.T.O today",
    "AT&T merger",
    "it's working",
    "l'école francaise",
    "naïve approach",
    "1,000,000 rows",
    "pi is 3.14 exactly",
    "C++ templates",
    "C# generics",
    "fish+chips dinner",
    "x" * 70 + " oversize",
    "ALL-CAPS HYPHEN-JOINED",
    "don’t stop",
    "zero​width joined",
    "",  # empty body doc
    "M&S and A.B.CD",
    "under_score token",
    "Größe naïveté",
    "the the the the repeated",
]

# Planted rare terms: term -> exact row indices containing it (idf goldens).
RARE_TERMS = {
    "xqzrareuno": [42],
    "xqzrareduo": [43, 44],
    "xqzraretri": [45, 46, 47],
}


def _make_vocab() -> list[str]:
    """~VOCAB_SIZE pseudo-words from syllables, deterministic; index 0 is the
    most frequent under the Zipf draw."""
    rng = np.random.Generator(np.random.PCG64(SEED))
    onsets = ["b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "n", "p",
              "r", "s", "t", "v", "w", "z", "ch", "sh", "th", "br", "st",
              "tr", "pl", "cr", "gr"]
    nuclei = ["a", "e", "i", "o", "u", "ai", "ea", "ou", "io"]
    codas = ["", "n", "r", "s", "t", "l", "m", "x", "nd", "st", "ck"]
    words: list[str] = []
    seen = set()
    # first ten entries: explicit stopword-grade words
    for w in ["the", "and", "for", "was", "with", "that", "this", "are",
              "from", "have"]:
        words.append(w)
        seen.add(w)
    while len(words) < VOCAB_SIZE:
        n_syl = int(rng.integers(1, 4))
        w = "".join(
            onsets[rng.integers(0, len(onsets))]
            + nuclei[rng.integers(0, len(nuclei))]
            + codas[rng.integers(0, len(codas))]
            for _ in range(n_syl)
        )
        if w not in seen and len(w) >= 2:
            words.append(w)
            seen.add(w)
    return words


_VOCAB_CACHE: list[str] | None = None


def get_vocab() -> list[str]:
    global _VOCAB_CACHE
    if _VOCAB_CACHE is None:
        _VOCAB_CACHE = _make_vocab()
    return _VOCAB_CACHE


def _doc_text(i: int, vocab: list[str], token_scale: int = 1) -> str:
    """Deterministic Zipfian text for row i: 20-400 tokens (x token_scale:
    web-page-sized docs for benchmarks), ~10 stopword-grade terms in >60% of
    docs, paragraph breaks every ~40 tokens."""
    rng = np.random.Generator(np.random.PCG64(SEED * 1_000_003 + i))
    n_tokens = int(np.clip(rng.lognormal(mean=4.4, sigma=0.7), 20, 400))
    n_tokens *= token_scale
    # Zipf over the vocab (s ~ ZIPF_S), bounded to vocab size.
    ranks = rng.zipf(ZIPF_S, size=n_tokens)
    ranks = np.minimum(ranks - 1, len(vocab) - 1)
    tokens = [vocab[r] for r in ranks]
    if i < len(CORNER_SNIPPETS):
        snippet = CORNER_SNIPPETS[i]
        if not snippet:
            return ""
        tokens = snippet.split(" ") + tokens[: max(4, n_tokens // 4)]
    for term, rows in RARE_TERMS.items():
        if i in rows:
            tokens.append(term)
    # paragraphs of ~40 tokens
    paras = [" ".join(tokens[j:j + 40]) for j in range(0, len(tokens), 40)]
    return "\n\n".join(paras)


def _escape(s: str) -> str:
    """HTML-entity escape used by the synthetic wrapper (& first: bijective)."""
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;").replace("'", "&#39;"))


def _doc_html(i: int, text: str, title: str) -> bytes:
    paras = "".join(f"<p>{_escape(p)}</p>\n" for p in text.split("\n\n")) \
        if text else ""
    html = (
        "<html><head>"
        f"<title>{_escape(title)}</title>"
        '<script>var nav="menu";trackPage();</script>'
        '<style>.hidden{display:none}</style>'
        "</head><body>"
        '<nav><a href="/">home</a> | <a href="/about">about</a></nav>\n'
        f"{paras}"
        "<footer>&copy; 2025 example</footer>"
        "</body></html>"
    )
    return html.encode("utf-8")


LANGS = ["en"] * 19 + ["de", "fr"]  # ~95% en, non-en still indexed


def make_pages_table(start: int, count: int,
                     token_scale: int = 1) -> pa.Table:
    """Rows [start, start+count) of the deterministic pages corpus."""
    vocab = get_vocab()
    urls, tss, htmls, texts, langs = [], [], [], [], []
    base_ts = np.datetime64("2025-01-01T00:00:00", "us")
    for i in range(start, start + count):
        text = _doc_text(i, vocab, token_scale)
        word = vocab[i % 97]
        urls.append(f"https://site{i % 97}.example/{word}/{i}")
        tss.append(base_ts + np.timedelta64(i * 137, "s"))
        htmls.append(_doc_html(i, text, f"page {i} {word}"))
        texts.append(text)
        langs.append(LANGS[i % len(LANGS)])
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def write_pages_corpus(out_dir: str, n_docs: int, n_files: int = 4,
                       token_scale: int = 1) -> list[str]:
    """Write the corpus as ``n_files`` parquet files (exercises the per-file
    doc_id prefix-sum assignment). Returns the file paths, sorted — the
    canonical input order."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    per = (n_docs + n_files - 1) // n_files
    start = 0
    for f in range(n_files):
        count = min(per, n_docs - start)
        if count <= 0:
            break
        path = os.path.join(out_dir, f"pages-{f:05d}.parquet")
        pq.write_table(make_pages_table(start, count, token_scale), path,
                       row_group_size=max(64, count // 4))
        paths.append(path)
        start += count
    return sorted(paths)


def write_pages_corpus_parallel(out_dir: str, n_docs: int,
                                n_files: int = 64,
                                token_scale: int = 1) -> list[str]:
    """Ray-parallel corpus writer, byte-identical to write_pages_corpus for
    the same (n_docs, n_files, token_scale): row content is a pure function
    of the row index, so each file generates independently. Ray must be
    initialised by the caller."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    per = (n_docs + n_files - 1) // n_files
    jobs = []
    start = 0
    for f in range(n_files):
        count = min(per, n_docs - start)
        if count <= 0:
            break
        jobs.append({"f": f, "start": start, "count": count})
        start += count

    def write_one(batch: pa.Table) -> pa.Table:
        paths = []
        for row in batch.to_pylist():
            path = os.path.join(out_dir, f"pages-{row['f']:05d}.parquet")
            t = make_pages_table(row["start"], row["count"], token_scale)
            pq.write_table(t, path,
                           row_group_size=max(64, row["count"] // 4))
            paths.append(path)
        return pa.table({"path": pa.array(paths, pa.string())})

    out = ray.data.from_items(jobs).map_batches(
        write_one, batch_format="pyarrow", batch_size=1).take_all()
    return sorted(r["path"] for r in out)


def write_warc_corpus(out_dir: str, n_docs: int, n_files: int = 4,
                      token_scale: int = 1, gzip_members: bool = True,
                      start: int = 0) -> list[str]:
    """The pages corpus as Common-Crawl-style WARC files: one ``response``
    record per page (HTTP response payload: status line + headers + html),
    each record its own gzip member when ``gzip_members`` (the CC layout).
    Deterministic; returns sorted paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    per = (n_docs + n_files - 1) // n_files
    paths = []
    row = start
    for f in range(n_files):
        count = min(per, n_docs - row + start)
        if count <= 0:
            break
        t = make_pages_table(row, count, token_scale)
        ext = ".warc.gz" if gzip_members else ".warc"
        path = os.path.join(out_dir, f"crawl-{f:05d}{ext}")
        write_warc_file(t, path, gzip_members=gzip_members)
        paths.append(path)
        row += count
    return sorted(paths)


def write_warc_file(pages: pa.Table, path: str,
                    gzip_members: bool = True) -> None:
    """Write one WARC file of ``response`` records from a pages-shaped
    table (url, warc_ts, html), one gzip member per record when asked
    (the Common-Crawl layout)."""
    import gzip

    with open(path, "wb") as out:
        for url, ts, html in zip(pages.column("url").to_pylist(),
                                 pages.column("warc_ts").to_pylist(),
                                 pages.column("html").to_pylist()):
            http = (b"HTTP/1.1 200 OK\r\n"
                    b"Content-Type: text/html; charset=utf-8\r\n"
                    b"\r\n" + html)
            date = ts.strftime("%Y-%m-%dT%H:%M:%S") + "Z"
            rec = (f"WARC/1.0\r\n"
                   f"WARC-Type: response\r\n"
                   f"WARC-Target-URI: {url}\r\n"
                   f"WARC-Date: {date}\r\n"
                   f"Content-Length: {len(http)}\r\n"
                   f"\r\n").encode("ascii") + http + b"\r\n\r\n"
            out.write(gzip.compress(rec, mtime=0) if gzip_members else rec)


def pages_from_documents(sf_dir: str) -> pa.Table:
    """Wrap the driver's ``documents`` table (doc_id, text, lang, ...) into the
    Common-Crawl page shape so driver-contract pipelines can exercise the full
    extract->index path on driver data. Deterministic per doc_id."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    base_ts = np.datetime64("2025-01-01T00:00:00", "us")
    urls = [f"https://docs.example/d/{i}" for i in ids]
    tss = [base_ts + np.timedelta64(int(i) * 137, "s") for i in ids]
    htmls = [_doc_html(int(i), t, f"doc {i}") for i, t in zip(ids, texts)]
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })
