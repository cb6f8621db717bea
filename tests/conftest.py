import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_corpus(tmp_path_factory):
    """Small deterministic pages corpus shared across e2e tests."""
    from markdown_query_ray.fixtures import write_pages_corpus

    out = tmp_path_factory.mktemp("corpus")
    paths = write_pages_corpus(str(out), n_docs=400, n_files=4)
    return paths


@pytest.fixture(scope="session")
def built_index(ray_session, pages_corpus, tmp_path_factory):
    """Index over the shared corpus (xapian tokenizer, stems, P=4, S=2)."""
    from markdown_query_ray.config import IndexConfig
    from markdown_query_ray.index.build import build_index

    out = str(tmp_path_factory.mktemp("index") / "idx")
    cfg = IndexConfig(num_term_parts=4, num_doc_buckets=2, block_size=32)
    gstats = build_index(out, paths=pages_corpus, cfg=cfg)
    return out, cfg, gstats
