"""Local replica of the driver's correctness gate: run every queries() entry
at sf0.001 and compare row-count + sorted values against oracle_sql() via
DuckDB. Mirrors the driver's column-name-sorted, order-insensitive compare.
"""

import importlib.util
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _load_entry_module():
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__ray_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    return _load_entry_module()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pa.Table):
        df = result.to_pandas()
    elif isinstance(result, pd.DataFrame):
        df = result
    else:  # Ray Dataset
        df = result.to_pandas()
    return df


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


SQL_CHECKED = [
    "bm25_single_term", "bm25_or3", "bm25_or3_bitpack", "bm25_rare_dup",
    "bm25_lang_de",
    "phrase_merge_sort",
    "near_merge_sort_w5", "embedding_neardup",
    "bool_and", "bool_and_not", "bool_xor", "match_counts",
    "doc_token_counts", "bpe_token_counts", "term_df_top50", "lang_doc_stats",
    "quality_features", "dedup_exact", "knn_cosine_top10",
    "events_tumbling_1h", "events_hopping_1h_30m", "events_sessions_30m",
    "tpch_q1ish",
    # round 2: formerly rows-only, now oracle-checked (exact-SQL
    # reimplementations, recall-complete LSH parameterizations, and
    # golden tables — flagship's golden comes from the REAL xapian-core)
    "minhash_dedup_pairs", "simhash_pairs", "doc_fingerprints", "langid",
    "embedding_neardup_lsh", "lsh_ann_top10", "ivf_ann_top10",
    "flagship_xapian_search", "multimodal_features", "video_frame_features",
    "audio_chunk_features",
    "url_canonicalize", "domain_doc_stats", "warc_extract", "span_dedup",
    "composite_quality_dedup_bm25",
    # round 3: new operators, oracle-checked from the start
    "ngram_jaccard_pairs", "neardup_clusters", "repetition_signals",
    "asof_purchase_click", "range_purchase_clicks",
    "domain_topk_docs", "hash_split_counts", "decontam_flags",
    "seq_packing", "pii_redact", "mixture_weighted_repeat",
    "lang_length_quantiles", "stratified_sample_docs", "tpch_q3ish",
    "bigram_novelty", "lang_distinct_tokens", "cross_dup_coverage",
    "incremental_dedup_pairs", "dup_token_spans", "dup_span_scrub",
    "kmeans_embeddings", "semdedup_pairs", "langid_ngram",
    "ccnet_buckets", "crawl_refresh_bm25", "search_snippets",
    "facet_lang_counts", "neardup_dedup_docs",
]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(entry_mod, duck, name):
    ray_result = _to_df(entry_mod.queries()[name](SF_DIR))
    sql = entry_mod.oracle_sql()[name]
    oracle = duck.sql(sql).df()
    a, b = _normalize(ray_result), _normalize(oracle)
    assert list(a.columns) == list(b.columns), \
        f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  check_exact=False, rtol=1e-9, atol=1e-9)


ROWS_ONLY: list[str] = []  # every entry is oracle-checked as of round 2


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(entry_mod, name):
    out = _to_df(entry_mod.queries()[name](SF_DIR))
    assert len(out) >= 0
    assert len(out.columns) > 0


def test_every_query_key_has_callable(entry_mod):
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)  # every oracle key has a query
    assert set(SQL_CHECKED) == set(o)
    assert set(ROWS_ONLY) == set(q) - set(o)


def test_entry_smoke(entry_mod):
    out = _to_df(entry_mod.entry())
    assert len(out) >= 1
    assert "doc_id" in out.columns and "score" in out.columns
