"""PII detection and redaction over a text column.

Training-data pipelines scrub personally identifiable information
before anything else touches the text (C4, Dolma, FineWeb all ship an
email/IP/phone scrubber). This is a pure zero-shuffle ``map_batches``
stage: each pattern runs as ONE vectorized Arrow RE2 kernel pass over
the column (``count_substring_regex`` to flag, ``replace_substring_regex``
to redact) — no Python-level row loop anywhere.

Oracle story: DuckDB's ``regexp_*`` functions are the SAME RE2 engine,
so the identical pattern strings produce identical non-overlapping
leftmost matches by construction (verified for all three patterns,
including the ``1.2.3.4.5`` partial-IP edge where the fourth octet
match leaves the trailing ``.5``).

The synthetic documents tables contain no PII, so ``synth_pii_batch``
deterministically plants emails/IPs/phones as a pure function of
doc_id — the same augmentation the oracle re-derives in SQL (mirroring
how webnorm tests URL rules via ``synth_messy_urls_batch``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# each pattern is ONE string literal shared verbatim with the SQL oracle
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_RE = (r"(?:\+?[0-9]{1,2}[-. ])?(?:\([0-9]{3}\)[ ]?|[0-9]{3}[-. ])"
            r"[0-9]{3}[-. ][0-9]{4}\b")

PATTERNS = (("email", EMAIL_RE, "<EMAIL>"),
            ("ipv4", IPV4_RE, "<IP>"),
            ("phone", PHONE_RE, "<PHONE>"))


def synth_pii_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministically plant PII spans keyed on doc_id (vectorized
    string build): docs with id%3==0 gain an email, id%4==0 an IPv4,
    id%5==0 a phone number — some docs carry several, some none."""
    ids = batch.column("doc_id").to_numpy().astype(np.int64)
    sid = pc.cast(batch.column("doc_id"), pa.string())
    text = pc.fill_null(batch.column(text_col), "")

    def where(mask, parts):
        add = pc.binary_join_element_wise(*parts, "")
        return pc.if_else(pa.array(mask), add, "")

    email = where(ids % 3 == 0,
                  [" contact user", sid, "@mail-example.org"])
    ipv4 = where(ids % 4 == 0,
                 [" from 10.0.", pc.cast(pa.array(ids % 256 // 16), pa.string()),
                  ".", pc.cast(pa.array(ids % 16), pa.string())])
    phone = where(ids % 5 == 0,
                  [" call 555-01", pc.cast(pa.array(ids % 10), pa.string()),
                   "-", pc.cast(pa.array(1000 + ids % 9000), pa.string())])
    out = pc.binary_join_element_wise(text, email, ipv4, phone, "")
    i = batch.schema.get_field_index(text_col)
    return batch.set_column(i, text_col, out)


def redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, n_email, n_ipv4, n_phone, n_pii, redacted_len) + the
    redacted text column — all Arrow kernels."""
    text = pc.fill_null(batch.column(text_col), "")
    counts = {}
    red = text
    for name, pat, token in PATTERNS:
        counts[name] = pc.cast(pc.count_substring_regex(red, pat),
                               pa.int64())
        red = pc.replace_substring_regex(red, pat, token)
    total = counts["email"]
    for name in ("ipv4", "phone"):
        total = pc.add(total, counts[name])
    return pa.table({
        "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
        "n_email": counts["email"],
        "n_ipv4": counts["ipv4"],
        "n_phone": counts["phone"],
        "n_pii": total,
        "redacted_len": pc.cast(pc.utf8_length(red), pa.int64()),
        "redacted": red,
    })


def redact_pii(ds, text_col: str = "text", synth: bool = False):
    """Dataset -> Dataset of per-doc PII counts + redacted text.
    ``synth=True`` plants deterministic PII first (test/oracle mode)."""
    from functools import partial

    if synth:
        ds = ds.map_batches(partial(synth_pii_batch, text_col=text_col),
                            batch_format="pyarrow")
    return ds.map_batches(partial(redact_batch, text_col=text_col),
                          batch_format="pyarrow")
