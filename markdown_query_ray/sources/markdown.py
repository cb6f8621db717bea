"""Markdown + YAML-frontmatter source (SURVEY.md §2.1 S1/S2).

The reference's native input path: walk directories for ``*.md`` files
(skipping dot-files, src/main.rs:84-97), split each file into YAML
frontmatter + markdown body, and deserialize into the fixed Document schema
with lenient coercions (src/document.rs:123-160, 194-232; src/date.rs).

Ray-Data-first shape: file discovery is ``ray.data.read_binary_files`` (its
reader parallelizes listing + IO); the parse is a stateless ``map_batches``
over (path, bytes) rows producing the columnar document schema:

    fullpath:string, id:string, title:string, subtitle:string,
    authors:list<string>, tags:list<string>, date:int64 (epoch s),
    weight:int32, writes:int32, views:int32, body:large_string

A file without frontmatter or without the required ``title``/``date`` is
dropped and counted (the reference logs the error and continues,
src/main.rs:101-106).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..stages.normalize import parse_date

_DELIM = "---"


def split_frontmatter(text: str) -> tuple[str, str] | None:
    """Split ``---\\nyaml\\n---\\nbody`` -> (yaml, body); None when the file
    has no frontmatter (an error in the reference, src/document.rs:155-158)."""
    if not text.startswith(_DELIM):
        return None
    rest = text[len(_DELIM):]
    if rest[:1] == "\n":
        rest = rest[1:]
    elif rest[:2] == "\r\n":
        rest = rest[2:]
    else:
        return None
    for sep in ("\n---\n", "\n---\r\n", "\r\n---\r\n", "\r\n---\n"):
        i = rest.find(sep)
        if i != -1:
            return rest[:i], rest[i + len(sep):]
    # frontmatter closed at EOF
    stripped = rest.rstrip()
    if stripped.endswith("\n---") or stripped.endswith("\r\n---"):
        return stripped[: stripped.rfind("---")].rstrip("\r\n"), ""
    return None


def _as_list(meta: dict, singular: str, plural: str) -> list[str]:
    """Scalar-or-list coercion (src/document.rs:194-232): plural list wins,
    scalar singular wraps, both absent -> []."""
    v = meta.get(plural)
    if v is not None:
        if isinstance(v, (list, tuple)):
            return [str(x) for x in v]
        return [str(v)]
    v = meta.get(singular)
    if v is None:
        return []
    if isinstance(v, (list, tuple)):
        return [str(x) for x in v]
    return [str(v)]


def parse_markdown_doc(path: str, raw: bytes | str) -> dict | None:
    """One file -> document row dict, or None when invalid (logged+skipped
    by the caller, mirroring src/main.rs:101-106)."""
    import yaml

    if isinstance(raw, (bytes, memoryview)):
        try:
            raw = bytes(raw).decode("utf-8")
        except UnicodeDecodeError:
            return None
    split = split_frontmatter(raw)
    if split is None:
        return None
    fm, body = split
    try:
        meta = yaml.safe_load(fm) or {}
    except yaml.YAMLError:
        return None
    if not isinstance(meta, dict):
        return None
    title = meta.get("title")
    date = parse_date(meta.get("date"))
    if title is None or date is None:
        # title and date are the two required fields (src/document.rs:95-104)
        return None
    doc_id = meta.get("id")
    if doc_id is None:
        # deterministic surrogate for the reference's random UUID
        doc_id = hashlib.sha1(path.encode("utf-8")).hexdigest()
    return {
        "fullpath": path,
        "id": str(doc_id),
        "title": str(title),
        "subtitle": str(meta.get("subtitle", "")),
        "authors": _as_list(meta, "author", "authors"),
        "tags": _as_list(meta, "tag", "tags"),
        "date": date,
        "weight": int(meta.get("weight", 0) or 0),
        "writes": int(meta.get("writes", 0) or 0),
        "views": int(meta.get("views", 0) or 0),
        "body": body,
    }


DOC_SCHEMA = pa.schema([
    ("fullpath", pa.string()),
    ("id", pa.string()),
    ("title", pa.string()),
    ("subtitle", pa.string()),
    ("authors", pa.list_(pa.string())),
    ("tags", pa.list_(pa.string())),
    ("date", pa.int64()),
    ("weight", pa.int32()),
    ("writes", pa.int32()),
    ("views", pa.int32()),
    ("body", pa.large_string()),
])


def parse_markdown_batch(batch: pa.Table) -> pa.Table:
    """map_batches body: (path, bytes) -> document rows; invalid files are
    dropped (reference: error log + continue)."""
    rows = []
    for path, raw in zip(batch.column("path").to_pylist(),
                         batch.column("bytes").to_pylist()):
        doc = parse_markdown_doc(path, raw)
        if doc is not None:
            rows.append(doc)
    if not rows:
        return DOC_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)


def read_markdown(paths: list[str]):
    """Directory/file paths -> Dataset of parsed document rows.

    ``read_binary_files`` handles discovery + IO sharding; dot-files and
    non-.md entries are excluded at listing time (M1/M2 pushed into the
    read, src/main.rs:86-97)."""
    import ray.data

    ds = ray.data.read_binary_files(
        paths, include_paths=True, file_extensions=["md"])

    def drop_hidden(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        base = pc.replace_substring_regex(batch.column("path"), r"^.*/", "")
        return batch.filter(pc.invert(pc.starts_with(base, ".")))

    return ds.map_batches(drop_hidden, batch_format="pyarrow") \
             .map_batches(parse_markdown_batch, batch_format="pyarrow")


def index_dataset_from_markdown(paths: list[str]):
    """Parsed markdown rows -> the index build's expected input shape
    (doc_id, url, text): url=fullpath, text = title+subtitle+body in the
    reference's cross-field position order (src/document.rs:171-180 indexes
    fields into one position stream; body unprefixed)."""
    ds = read_markdown(paths)

    def shape(batch: pa.Table) -> pa.Table:
        texts = [
            " ".join(x for x in (t, s, b) if x)
            for t, s, b in zip(batch.column("title").to_pylist(),
                               batch.column("subtitle").to_pylist(),
                               batch.column("body").to_pylist())
        ]
        return pa.table({
            "url": batch.column("fullpath"),
            "text": pa.array(texts, pa.large_string()),
        })

    return ds.map_batches(shape, batch_format="pyarrow")
