"""Driver-mimic: run every queries() entry at sf0.01 and compare against its
oracle_sql() via DuckDB — row count, column names, and an order-insensitive
value comparison (this is the same gate CORRECTNESS_r{N}.json records)."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.fixture(scope="module")
def entry(ray_session):
    import __ray_entry__

    return __ray_entry__


def _to_pandas(obj):
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    return pd.DataFrame(obj)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    assert len(ray_df) == len(sql_df), f"{name}: row count {len(ray_df)} != {len(sql_df)}"
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        f"{name}: columns {sorted(ray_df.columns)} != {sorted(sql_df.columns)}"
    )
    a, b = _canon(ray_df), _canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(np.asarray(av).dtype, np.floating) or np.issubdtype(
            np.asarray(bv).dtype, np.floating
        ):
            np.testing.assert_allclose(
                av.astype(np.float64), bv.astype(np.float64), rtol=0, atol=0,
                err_msg=f"{name}.{c}",
            )
        else:
            assert (av == bv).all(), f"{name}.{c}: values differ"


def test_entry_smoke(entry):
    out = entry.entry()
    df = _to_pandas(out)
    assert len(df) >= 0
    assert list(df.columns) == ["query", "rank", "doc_id", "score"]
    assert len(df) > 0


def test_query_and_oracle_keys_align(entry):
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q), "oracle keys must be a subset of query keys"
    # every SQL-checked op plus the documented rows-only ops
    assert len(q) >= 20


@pytest.mark.parametrize(
    "name",
    [
        "extract_text", "doc_ids", "term_postings", "term_df", "dictionary",
        "doc_lengths", "top_terms", "index_stats", "boolean_and", "boolean_or",
        "more_like_this", "boolean_not", "wildcard_terms", "wildcard_search",
        "ql_topk", "hybrid_rrf", "retrieval_eval", "doc_bigram_logprob",
        "search_dsl", "doc_embeddings", "passage_bm25",
        "tfidf_topk", "bm25_topk", "bm25_msm", "bm25_filtered", "bm25_capped",
        "bm25_grouped", "bm25_prf",
        "bm25_wand", "bm25_maxscore", "ltr_features", "ltr_training",
        "dense_rerank", "mmr_rerank",
        "bm25_distributed",
        "bm25_segments", "bm25_blend", "phrase", "phrase_slop", "within_window",
        "proximity", "fuzzy", "prefix_search",
        "spell_correct", "facet_counts", "exact_dedup", "cluster_best",
        "query_predictors", "bm25_sorted", "bm25_prox", "bm25_range",
        "bm25_corrected",
        "normalize_text", "lang_counts", "lang_confusion", "corpus_drift",
        "validate",
        "text_stats", "classifier_scores", "quality_logreg", "bitext_mine",
        "gopher_rules",
        "doc_keywords", "sparse_knn",
        "doc_logprob", "dsir_weights",
        "ccnet_buckets", "doc_novelty",
        "host_stats", "host_cap", "canonical_urls", "host_mirrors",
        "stratified_sample", "upsample_mix", "curriculum_order", "quality_filter",
        "token_budget", "split_assign", "sample_k",
        "pack_sequences", "chunk_documents", "shuffle",
        "collocations", "cooccurrence", "prune_postings",
        "pagerank", "hits", "link_components", "anchor_terms",
        "reciprocal_links", "robots_meta", "resolve_redirects",
        "docid_gap_report", "hreflang_map", "canonical_tags",
        "latest_snapshot", "degree_stats",
        "bm25f",
        "remove_repeated_ngrams", "remove_global_ngrams",
        "heavy_hitters_exact", "vocab_size",
        "ann_topk", "quantize_embeddings", "ann_quantized_topk",
        "project_embeddings", "media_features", "media_resize",
        "media_frames", "event_windows", "event_hopping", "value_quantiles",
        "grouped_quantiles",
        "event_sessions", "event_asof", "event_range", "funnel",
        "cohort_retention", "window_anomalies",
        "pricing_summary", "revenue_by_nation",
        "clean_corpus", "clean_corpus_full", "new_vs_snapshot",
        "new_vs_snapshot_near", "dedup_lines",
        "host_boilerplate",
        "cosine_norms", "jaccard_verify", "containment_verify", "dedup_clusters",
        "lsh_recall", "triplets",
        "cosine_verify",
        "fingerprints", "minhash_pairs", "simhash_pairs",
        "ann_ivf_full", "ann_lsh_full", "langid", "readability", "regex_search",
        "pii_scrub", "repetition",
        "decontaminate", "decontaminate_fuzzy",
    ],
)
def test_sql_parity(entry, con, name):
    ray_out = _to_pandas(entry.queries()[name](SF))
    sql_out = con.execute(entry.oracle_sql()[name]).df()
    compare(ray_out, sql_out, name)


@pytest.mark.parametrize(
    "name", ["heavy_hitters", "ann_ivf_topk", "bpe_tokens", "training_shards",
             "bloom_new_docs",
             "ann_lsh_topk", "cosine_neardup", "value_quantiles_approx", "vocab_size_hll",
             "embedding_clusters", "semdedup_pairs", "cdc_chunks",
             "cdc_dup_chunks", "dedup_chunks",
             "host_mirrors_near", "textrank_keywords", "count_min"]
)
def test_rows_only_queries_run(entry, name):
    out = _to_pandas(entry.queries()[name](SF))
    assert len(out) >= 0
    assert len(out.columns) >= 2
