"""Query registry — the bridge between operator modules and the driver
contract (``__spark_entry__.py``).  The reference has no query registry -
its one job is hardcoded (SURVEY.md §3: 'there is no query language'); the
registry is what makes the engine a queryable surface instead.

Every implemented operator registers a named query callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, a DuckDB oracle SQL
string computing the same result with the same column names (the driver's
comparison sorts columns by name and hash-compares values — FIXTURES.md §5).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` under ``name``, optionally with oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


# The round driver verifies 50 queries per round in registration order.
# Round-4 budget (VERDICT r3 "Next round" #1-#2, extended for the queries
# built DURING round 4 — never-driver-checked oracle-backed queries outrank
# stale-green re-proofs, the same ranking VERDICT r3 applied):
#   slots 1-11  — the 11 oracle-backed queries with no driver row yet (added
#                 or fixed during r3, all locally green on the driver-identical
#                 gate);
#   slots 12-13 — sim_topk_ivf / sim_ann_recall_report, upgraded this round
#                 from rows-only to hash-checked (deterministic SQL-expressible
#                 IVF quantizer replaces driver KMeans);
#   slots 14-50 — the queries BUILT in round 4 (graph, corpus ops, CEP,
#                 interpolation, stats, hybrid retrieval, span dedup, Gram
#                 matrix, recursive CTE, watermark finalization, MAD outliers,
#                 byte entropy, JSONL round-trip, OLS + GD training,
#                 token-label MI, unpivot, naive Bayes, KMV sketch + merge,
#                 skyline, prefix-filter + sorted-neighborhood dedup, k-core,
#                 association rules, sequence log-lik, left-outer stream
#                 join, rolling median, quantile normalization, Poisson
#                 bootstrap), each locally green on the driver-identical
#                 gate.  Round 4 built MORE never-checked queries than the
#                 50-slot budget holds; the overflow (last ~7 of this group
#                 plus the stale-green wordcount re-proofs below) is queued
#                 in the same never-checked-first ranking for round 5.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (1) oracle-backed, never driver-checked — land rows first
    "jsondict_roundtrip",
    "multimodal_decode_bmp",
    "multimodal_decode_wav",
    "text_unigram_logprob",
    "bpe_merge_pairs",
    "sim_lsh_recall",
    "pagerank_word_graph",
    "sim_topk_vectorized",
    "sim_quantized_recall",
    "grouped_zscore_pandas",
    "q12_priority_by_flag",
    # (2) upgraded rows-only → hash-checked this round
    "sim_topk_ivf",
    "sim_ann_recall_report",
    # (3) built in round 4 — oracle-backed, never driver-checked
    "bfs_word_distances",
    "corpus_shuffle_shards",
    "stream_cep_funnel",
    "ts_interpolate_daily",
    "analyze_table_stats",
    "hybrid_search_rrf",
    "corpus_temperature_mixture",
    "quantile_binning",
    "c4_line_dedup",
    "dedup_substring_coverage",
    "emb_gram_matrix",
    "recursive_cte_inventory",
    "stream_watermark_finalize",
    "text_length_outliers_mad",
    "join_null_safe",
    "corpus_chunk_windows",
    "feature_hashing_trick",
    "target_encode_brand",
    "target_encode_kfold",
    "ab_test_conversion",
    "stream_upsert_user_state",
    "multimodal_phash",
    "multimodal_phash_pairs",
    "emb_whiten_diag",
    "text_byte_entropy",
    "jsonl_roundtrip",
    "linreg_normal_equations",
    "token_label_mi",
    "unpivot_order_metrics",
    "naive_bayes_langid",
    "kmv_daily_distinct",
    "skyline_parts",
    "linreg_by_returnflag",
    "dedup_prefix_filter",
    "dedup_sorted_neighborhood",
    "logreg_gradient_descent",
    "graph_kcore_parts",
    "kmv_weekly_merge",
    "basket_association_rules",
    "events_sequence_loglik",
    "stream_join_left_outer",
    "ts_rolling_median_revenue",
    "emb_quantile_normalize",
    "bootstrap_mean_ci",
    # (4) stalest greens: last driver contact was round 1, oldest fixtures
    "wordcount_top20",
    "wordcount_full",
    "wordcount_rdd_core",
    "inverted_index_stats",
    # --- 50-slot budget line falls here (46 + 4) ---
    "ingest_zip_wordcount",
    "ziptext_datasource_scan",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority_check",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_revenue_share",
    "q18_large_volume_customers",
    "filter_project_pushdown",
    "join_broadcast_dim",
    "join_left_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "agg_distinct",
    "agg_stats",
    "rollup_agg",
    "cube_agg",
    "window_topk_per_group",
    "window_running_sum",
    "window_lag_gap",
    "setop_union",
    "setop_intersect",
    "setop_except",
    "orderby_limit_global",
    "distinct_projection",
    "scalar_functions",
    "pivot_status_by_flag",
    "scalar_subquery_above_avg",
    "grouping_sets_sql",
    "salted_join_revenue_by_priority",
    "q7_volume_shipping",
    "q9_product_type_profit",
    "q13_customer_order_histogram",
    "q16_supplier_part_counts",
    "q22_global_sales_opportunity",
    "agg_percentiles",
    "window_analytics",
    "q8_market_share",
    "q11_important_stock",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
)

# Permanently rows-only reports (no SQL-replayable oracle by design: file
# layout, HLL/approx-percentile estimator internals).  Registered LAST so a
# driver budget slot never again produces a `no_oracle` error row
# (r3 spent 3 of its 50 slots on these — VERDICT r3 "wrong" #2).
DRIVER_DEMOTE: tuple[str, ...] = (
    "storage_file_report",
    "hll_daily_distinct_error",
    "approx_percentile_error",
)


def load_all() -> None:
    """Import every operator module so its ``@register`` calls run, then
    reorder the registry so :data:`DRIVER_PRIORITY` names come first.

    Registration order is deliberate: the round driver verifies queries in
    registration order under a budget (50/round), so the queries still missing
    a driver correctness row go FIRST and the already-driver-green surface
    registers behind them.
    """
    for mod in (
        "queries_dedup",
        "queries_similarity",
        "queries_text",
        "queries_events",
        "queries_temporal",
        "queries_quality",
        "queries_sketches",
        "queries_streaming",
        "queries_multimodal",
        "queries_wordcount",
        "queries_relational",
        "queries_features",
    ):
        try:
            __import__(f"distributed_mapreduce_in_docker_rpyc_spark.operators.{mod}")
        except ModuleNotFoundError as exc:
            # Only tolerate genuinely-optional third-party deps; a missing
            # module of THIS package (typo'd import, broken refactor) must
            # fail loudly, not silently shrink the query surface.
            if (exc.name or "").startswith("distributed_mapreduce_in_docker_rpyc_spark"):
                raise
            import warnings

            warnings.warn(
                f"operator module {mod!r} skipped: missing optional dependency {exc.name!r}",
                stacklevel=2,
            )

    missing = [n for n in (*DRIVER_PRIORITY, *DRIVER_DEMOTE) if n not in QUERIES]
    if missing:
        raise ValueError(f"DRIVER_PRIORITY/DEMOTE names not registered: {missing}")
    pinned = {*DRIVER_PRIORITY, *DRIVER_DEMOTE}
    ordered = [
        *DRIVER_PRIORITY,
        *(n for n in QUERIES if n not in pinned),
        *DRIVER_DEMOTE,
    ]
    for d in (QUERIES, ORACLES):
        items = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(items)
