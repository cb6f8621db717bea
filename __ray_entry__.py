"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in markdown_query_ray) calls ``ray.init`` / ``ray.shutdown``.

The BM25/boolean entries run the REAL inverted-index engine end to end
(build -> salted merge shuffle -> varint posting blocks -> WAND top-k) in
"simple" tokenizer mode whose semantics are exactly reproducible in ANSI SQL,
so the DuckDB match validates the whole pipeline, not a reimplementation.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_STOPWORDS_SQL = "('the','and','for','was','with','that','this','are'," \
    "'from','have','a','an','of','to','in','is','it','on')"

# tokens CTE for BM25 entries (matches simple_tokenize: lowercase,
# single-space split, empties dropped)
_TOKS = ("WITH toks AS (SELECT doc_id, unnest(list_filter("
         "string_split(lower(text), ' '), x -> x <> '')) AS term "
         "FROM documents), "
         "dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks "
         "GROUP BY doc_id), "
         "st AS (SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) "
         "AS n_docs, (SELECT sum(dl) FROM dl) / CAST((SELECT count(*) "
         "FROM documents) AS DOUBLE) AS avgdl) ")


def _bm25_sql(terms: list[str], k: int) -> str:
    """Classic-profile BM25 (k1=1.2, b=0.75, idf clamped at 0) over the
    simple-tokenized documents table; mirrors TermWeight/sumpart exactly
    (markdown_query_ray/query/scorer.py)."""
    per_term = " UNION ALL ".join(
        f"SELECT tf.doc_id, "
        f"greatest(ln((st.n_docs - df.df + 0.5) / (df.df + 0.5)), 0.0) * "
        f"(tf.tf / (1.2 * ((dl.dl * (1.0 / st.avgdl)) * 0.75 + 0.25) "
        f"+ tf.tf)) AS s "
        f"FROM (SELECT doc_id, CAST(count(*) AS DOUBLE) AS tf FROM toks "
        f"WHERE term = '{t}' GROUP BY doc_id) tf, "
        f"(SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks "
        f"WHERE term = '{t}') df, st, dl WHERE dl.doc_id = tf.doc_id"
        for t in terms)
    return (
        _TOKS +
        f", scored AS (SELECT doc_id, sum(s) AS score FROM ({per_term}) "
        f"GROUP BY doc_id) "
        f"SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) "
        f"AS BIGINT) AS rank, doc_id, round(score, 6) AS score "
        f"FROM scored ORDER BY score DESC, doc_id LIMIT {k}")


# BPE-ish pre-tokenizer count oracle: the exact pattern the Ray stage
# compiles (textstats.BPE_PATTERN), SQL-escaped for the DuckDB literal.
from markdown_query_ray.pipelines.textstats import BPE_PATTERN as _BPE_PAT

_BPE_SQL = (
    "SELECT doc_id, CAST(len(regexp_extract_all(text, '"
    + _BPE_PAT.replace("'", "''")
    + "')) AS BIGINT) AS n_bpe_tokens FROM documents ORDER BY doc_id")


_POS = ("pos AS (SELECT doc_id, unnest(l) AS term, "
        "generate_subscripts(l, 1) AS i FROM (SELECT doc_id, "
        "list_filter(string_split(lower(text), ' '), x -> x <> '') AS l "
        "FROM documents) dd), ")


def _phrase_match_cte(terms: list[str], ordered: bool, window: int) -> str:
    """pm CTE: doc_ids where the terms co-occur in a window-wide position
    span — in order (PHRASE) or any order (NEAR). Mirrors
    executor._ordered_within/_unordered_within over the simple tokenizer."""
    aliases = [f"p{i}" for i in range(len(terms))]
    joins = " JOIN ".join(
        f"pos {a}" + ("" if i == 0 else f" ON {a}.doc_id = p0.doc_id")
        for i, a in enumerate(aliases))
    conds = [f"{a}.term = '{t}'" for a, t in zip(aliases, terms)]
    if ordered:
        conds += [f"{aliases[i]}.i < {aliases[i + 1]}.i"
                  for i in range(len(terms) - 1)]
        span = (f"{aliases[-1]}.i - {aliases[0]}.i <= {window - 1}")
    else:
        ilist = ", ".join(f"{a}.i" for a in aliases)
        span = (f"greatest({ilist}) - least({ilist}) <= {window - 1}")
    return (f"pm AS (SELECT DISTINCT p0.doc_id FROM {joins} "
            f"WHERE {' AND '.join(conds)} AND {span}) ")


def _phrase_bm25_sql(terms: list[str], k: int, ordered: bool = True,
                     window: int = 0) -> str:
    """BM25 (XAPIAN profile: k1=1, b=0.5, min_normlen=0.5, negative-idf
    floor tw<2 -> tw*0.5+1, x(k1+1); wqf factor = 1 at wqf=1) of the member
    terms, restricted to docs where the phrase/near window matches. The
    xapian profile is used because the synthetic vocabulary is so common
    (df ~ 0.8N) that the classic clamped idf is 0 for every term."""
    window = window or len(terms)
    tw = "((st.n_docs - df.df + 0.5) / (df.df + 0.5))"
    tw_floored = f"(CASE WHEN {tw} < 2 THEN {tw} * 0.5 + 1 ELSE {tw} END)"
    per_term = " UNION ALL ".join(
        f"SELECT tf.doc_id, "
        f"ln({tw_floored}) * 2.0 * "
        f"(tf.tf / ((greatest(dl.dl * (1.0 / st.avgdl), 0.5) * 0.5 + 0.5) "
        f"+ tf.tf)) AS s "
        f"FROM (SELECT doc_id, CAST(count(*) AS DOUBLE) AS tf FROM toks "
        f"WHERE term = '{t}' GROUP BY doc_id) tf, "
        f"(SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks "
        f"WHERE term = '{t}') df, st, dl WHERE dl.doc_id = tf.doc_id "
        f"AND tf.doc_id IN (SELECT doc_id FROM pm)"
        for t in terms)
    return (
        _TOKS + ", " + _POS + _phrase_match_cte(terms, ordered, window) +
        f", scored AS (SELECT doc_id, sum(s) AS score FROM ({per_term}) "
        f"GROUP BY doc_id) "
        f"SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) "
        f"AS BIGINT) AS rank, doc_id, round(score, 6) AS score "
        f"FROM scored ORDER BY score DESC, doc_id LIMIT {k}")


def _bm25_xapian_restricted_sql(terms: list[str], k: int,
                                restrict: str) -> str:
    """Xapian-profile BM25 over the simple tokens, match set restricted by
    ``restrict`` (SQL yielding doc_ids) — FILTER semantics: the restriction
    contributes no weight."""
    tw = "((st.n_docs - df.df + 0.5) / (df.df + 0.5))"
    tw_floored = f"(CASE WHEN {tw} < 2 THEN {tw} * 0.5 + 1 ELSE {tw} END)"
    per_term = " UNION ALL ".join(
        f"SELECT tf.doc_id, "
        f"ln({tw_floored}) * 2.0 * "
        f"(tf.tf / ((greatest(dl.dl * (1.0 / st.avgdl), 0.5) * 0.5 + 0.5) "
        f"+ tf.tf)) AS s "
        f"FROM (SELECT doc_id, CAST(count(*) AS DOUBLE) AS tf FROM toks "
        f"WHERE term = '{t}' GROUP BY doc_id) tf, "
        f"(SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks "
        f"WHERE term = '{t}') df, st, dl WHERE dl.doc_id = tf.doc_id "
        f"AND tf.doc_id IN ({restrict})"
        for t in terms)
    return (
        _TOKS +
        f", scored AS (SELECT doc_id, sum(s) AS score FROM ({per_term}) "
        f"GROUP BY doc_id) "
        f"SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) "
        f"AS BIGINT) AS rank, doc_id, round(score, 6) AS score "
        f"FROM scored ORDER BY score DESC, doc_id LIMIT {k}")


def _bool_sql(op: str, t1: str, t2: str) -> str:
    base = ("WITH toks AS (SELECT doc_id, unnest(list_filter("
            "string_split(lower(text), ' '), x -> x <> '')) AS term "
            "FROM documents), "
            f"a AS (SELECT DISTINCT doc_id FROM toks WHERE term = '{t1}'), "
            f"b AS (SELECT DISTINCT doc_id FROM toks WHERE term = '{t2}') ")
    body = {
        "and": "SELECT doc_id FROM a INTERSECT SELECT doc_id FROM b",
        "and_not": "SELECT doc_id FROM a EXCEPT SELECT doc_id FROM b",
        "xor": ("SELECT doc_id FROM ((SELECT doc_id FROM a UNION "
                "SELECT doc_id FROM b) EXCEPT (SELECT doc_id FROM a "
                "INTERSECT SELECT doc_id FROM b))"),
    }[op]
    return base + f"SELECT doc_id FROM ({body}) ORDER BY doc_id"


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: synthesize Common-Crawl
    pages from the documents table, build the full xapian-mode index
    (extract -> tokenize+stem -> salted shuffle -> varint blocks), run a
    compiled natural-language query through block-max WAND."""
    from markdown_query_ray.pipelines.driver_api import flagship_search

    return flagship_search("/root/testdata/sf0.001",
                           query="the fast merge", k=20)


def queries() -> dict[str, Callable[[str], Any]]:
    from markdown_query_ray.pipelines import driver_api as d

    return {
        # -- inverted index + BM25 (engine end to end, SQL-checked) ----------
        "bm25_single_term": lambda sf: d.bm25_topk(sf, ["merge"], k=20),
        "bm25_or3": lambda sf: d.bm25_topk(sf, ["merge", "sort", "window"],
                                           k=20),
        # rare term (df=25): exercises nonzero classic idf + WAND pruning
        "bm25_rare_dup": lambda sf: d.bm25_topk(sf, ["dup", "merge"], k=20),
        # same query over a bitpack-codec index: the DuckDB oracle validates
        # the frame-of-reference block codec end to end
        "bm25_or3_bitpack": lambda sf: d.bm25_topk(
            sf, ["merge", "sort", "window"], k=20, codec="bitpack"),
        "bm25_lang_de": lambda sf: d.bm25_lang_filtered(
            sf, ["merge", "sort"], "de", k=20),
        "phrase_merge_sort": lambda sf: d.phrase_bm25(sf, ["merge", "sort"],
                                                      k=20),
        "near_merge_sort_w5": lambda sf: d.phrase_bm25(
            sf, ["merge", "sort"], k=20, ordered=False, window=5),
        "bool_and": lambda sf: d.boolean_docs(sf, "and", "merge", "sort"),
        "bool_and_not": lambda sf: d.boolean_docs(sf, "and_not", "merge",
                                                  "sort"),
        "bool_xor": lambda sf: d.boolean_docs(sf, "xor", "merge", "sort"),
        "match_counts": lambda sf: d.match_counts(sf, ["merge", "sort",
                                                       "window"]),
        # -- text analysis ---------------------------------------------------
        "doc_token_counts": d.doc_token_counts,
        "bpe_token_counts": d.bpe_token_counts,
        "term_df_top50": lambda sf: d.term_df_top(sf, 50),
        "lang_doc_stats": d.lang_doc_stats,
        "quality_features": d.quality_features,
        # -- dedup -----------------------------------------------------------
        "dedup_exact": d.dedup_exact_ids,
        "embedding_neardup": d.embedding_neardup,
        # -- similarity ------------------------------------------------------
        "knn_cosine_top10": lambda sf: d.knn_cosine(sf, 0, 10),
        # -- stream-shaped ---------------------------------------------------
        "events_tumbling_1h": d.events_tumbling,
        "events_hopping_1h_30m": d.events_hopping,
        "events_sessions_30m": d.events_sessions,
        # -- relational smoke ------------------------------------------------
        "tpch_q1ish": d.tpch_q1ish,
        # -- rows-only (non-SQL-expressible; driver records weaker check) ----
        "flagship_xapian_search": lambda sf: d.flagship_search(sf),
        "minhash_dedup_pairs": d.minhash_pairs,
        "embedding_neardup_lsh": d.embedding_neardup_lsh,
        "simhash_pairs": d.simhash_near_pairs,
        "lsh_ann_top10": d.lsh_ann_topk,
        "ivf_ann_top10": d.ivf_ann_topk,
        "langid": d.langid_preds,
        "doc_fingerprints": d.fingerprints,
        "multimodal_features": d.multimodal_features,
        "video_frame_features": d.video_frame_feats,
        "audio_chunk_features": d.audio_chunk_feats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_single_term": _bm25_sql(["merge"], 20),
        "bm25_or3": _bm25_sql(["merge", "sort", "window"], 20),
        "bm25_or3_bitpack": _bm25_sql(["merge", "sort", "window"], 20),
        "bm25_rare_dup": _bm25_sql(["dup", "merge"], 20),
        "bm25_lang_de": _bm25_xapian_restricted_sql(
            ["merge", "sort"], 20,
            "SELECT doc_id FROM documents WHERE lang = 'de'"),
        "phrase_merge_sort": _phrase_bm25_sql(["merge", "sort"], 20),
        "near_merge_sort_w5": _phrase_bm25_sql(["merge", "sort"], 20,
                                               ordered=False, window=5),
        "bool_and": _bool_sql("and", "merge", "sort"),
        "bool_and_not": _bool_sql("and_not", "merge", "sort"),
        "bool_xor": _bool_sql("xor", "merge", "sort"),
        "match_counts": (
            "WITH toks AS (SELECT doc_id, unnest(list_filter("
            "string_split(lower(text), ' '), x -> x <> '')) AS term "
            "FROM documents) "
            "SELECT query, n_matches FROM ("
            "SELECT term AS query, CAST(count(DISTINCT doc_id) AS BIGINT) "
            "AS n_matches FROM toks WHERE term IN ('merge','sort','window') "
            "GROUP BY term "
            "UNION ALL SELECT 'ANY', CAST(count(DISTINCT doc_id) AS BIGINT) "
            "FROM toks WHERE term IN ('merge','sort','window')) "
            "ORDER BY query"),
        "doc_token_counts": (
            "SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), "
            "x -> x <> '')) AS BIGINT) AS n_tokens FROM documents "
            "ORDER BY doc_id"),
        "bpe_token_counts": _BPE_SQL,
        "term_df_top50": (
            "WITH toks AS (SELECT doc_id, unnest(list_filter("
            "string_split(text, ' '), x -> x <> '')) AS term FROM documents) "
            "SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df, "
            "CAST(count(*) AS BIGINT) AS cf FROM toks GROUP BY term "
            "ORDER BY df DESC, term LIMIT 50"),
        "lang_doc_stats": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM documents "
            "GROUP BY lang ORDER BY lang"),
        "quality_features": (
            "SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), "
            "x -> x <> '')) AS BIGINT) AS n_tokens, "
            "CAST(len(list_filter(string_split(text, ' '), "
            f"x -> x IN {_STOPWORDS_SQL})) AS BIGINT) AS n_stopwords, "
            "CAST(length(text) AS BIGINT) AS n_chars FROM documents "
            "ORDER BY doc_id"),
        "dedup_exact": (
            "SELECT doc_id FROM (SELECT min(doc_id) AS doc_id FROM documents "
            "GROUP BY text) ORDER BY doc_id"),
        "embedding_neardup": (
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 6) AS sim "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.4 "
            "ORDER BY vec_a, vec_b"),
        "knn_cosine_top10": (
            "SELECT CAST(row_number() OVER (ORDER BY sim DESC, vec_id) "
            "AS BIGINT) AS rank, vec_id, round(sim, 6) AS sim FROM "
            "(SELECT vec_id, list_cosine_similarity("
            "CAST(embedding AS DOUBLE[]), (SELECT CAST(embedding AS "
            "DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS sim "
            "FROM embeddings) ORDER BY sim DESC, vec_id LIMIT 10"),
        "events_tumbling_1h": (
            "SELECT event_type, date_trunc('hour', ts) AS window_start, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "round(sum(value), 6) AS sum_value FROM events "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "events_hopping_1h_30m": (
            "SELECT event_type, make_timestamp(((CAST(floor(epoch(ts) / "
            "1800) AS BIGINT) - g.j) * 1800) * 1000000) AS window_start, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "round(sum(value), 6) AS sum_value "
            "FROM events, generate_series(0, 1) AS g(j) "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "events_sessions_30m": (
            "WITH l AS (SELECT event_id, user_id, ts, lag(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts "
            "FROM events) SELECT event_id, user_id, CAST(sum(CASE WHEN "
            "prev_ts IS NULL OR ts - prev_ts > INTERVAL '30 minutes' "
            "THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts, "
            "event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id "
            "FROM l ORDER BY event_id"),
        "tpch_q1ish": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(l_quantity) AS BIGINT) AS sum_qty, "
            "round(sum(l_extendedprice), 2) AS sum_price, "
            "CAST(count(*) AS BIGINT) AS n_rows FROM lineitem "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
    }
