"""PII redaction kernels vs Python re (same RE2-compatible patterns)."""

import re

import pyarrow as pa

from markdown_query_ray.pipelines.pii import (
    PATTERNS,
    redact_batch,
    redact_pii,
    synth_pii_batch,
)


def _brute(texts):
    """Sequential count+replace per pattern, mirroring redact_batch."""
    rows = []
    for i, t in enumerate(texts):
        red, counts = t or "", []
        for _, pat, token in PATTERNS:
            # RE2 \b == Python re \b for these ASCII patterns
            counts.append(len(re.findall(pat.replace("(?:", "(?:"), red)))
            red = re.sub(pat, token, red)
        rows.append((i, *counts, sum(counts), len(red), red))
    return rows


TEXTS = [
    "mail a.b@x.co.uk and c@d.io end",
    "ip 10.0.0.1 and 255.1.2.3, ver 1.2.3.4.5",
    "call +1-555-123-4567 or (555) 987-6543 now",
    "x 555-123-4567 y and bob@site.org at 192.168.0.7",
    "nothing sensitive here at all",
    "",
]


def _table(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_redact_matches_python_re():
    out = redact_batch(_table(TEXTS)).to_pylist()
    got = [tuple(row.values()) for row in out]
    assert got == _brute(TEXTS)


def test_counts_are_sequential_not_double():
    # the email's digits must not also count as a phone/IP
    t = _table(["reach 12.34.56.78@host.com ok"])
    out = redact_batch(t)
    assert out.column("n_email")[0].as_py() == 1
    assert out.column("n_ipv4")[0].as_py() == 0


def test_synth_is_deterministic_and_detected():
    t = _table(["base text"] * 60)
    t = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                  "text": t.column("text")})
    a = synth_pii_batch(t)
    b = synth_pii_batch(t)
    assert a.column("text").to_pylist() == b.column("text").to_pylist()
    out = redact_batch(a)
    for i in range(60):
        assert out.column("n_email")[i].as_py() == (1 if i % 3 == 0 else 0)
        assert out.column("n_ipv4")[i].as_py() == (1 if i % 4 == 0 else 0)
        assert out.column("n_phone")[i].as_py() == (1 if i % 5 == 0 else 0)
    # redaction removes every planted span
    re_out = redact_batch(pa.table({
        "doc_id": out.column("doc_id"), "text": out.column("redacted")}))
    assert re_out.column("n_pii").to_pylist() == [0] * 60


def test_dataset_path(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_table(TEXTS)).repartition(3)
    out = redact_pii(ds).to_pandas().sort_values("doc_id")
    exp = _brute(TEXTS)
    assert [tuple(r) for r in out.itertuples(index=False)] == exp
