"""Crawl-refresh edge case: a refresh whose quality gate (or dedup)
leaves ZERO survivors must complete, not crash in the survivors
checkpoint (round-5 review finding: Ray's write_parquet on an empty
dataset creates no files, so the immediate read_parquet failed)."""

import pyarrow as pa


def test_refresh_with_zero_survivors(ray_session, tmp_path, monkeypatch):
    from markdown_query_ray.pipelines import driver_api as d

    monkeypatch.setattr(d, "_CACHE_ROOT", str(tmp_path))
    # min_tokens far above any synthetic doc: the gate drops the whole
    # new-crawl batch, survivors are empty, the update inserts nothing
    t = d.crawl_refresh_pipeline("/root/testdata/sf0.001",
                                 min_tokens=10_000_000)
    assert isinstance(t, pa.Table)
    # search over the base-only index still answers
    assert t.num_rows >= 0 and "doc_id" in t.column_names
