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


# The round driver verifies 50 queries per round in registration order.  After
# round 2, exactly 50 registered queries lack a green driver CORRECTNESS row:
# 48 never reached by any round's budget plus 2 that failed the driver's
# canonicalizer (VERDICT.md r2 "Next round" #1).  They are promoted to the
# front of the registry so round 3's budget covers precisely this set; every
# other query keeps its natural (module) registration order behind them.
#
# ROUND 4 NOTE: once round 3's driver run lands rows for this set, replace it
# with the queries added/upgraded during round 3 that still lack a driver row:
# jsondict_roundtrip, multimodal_decode_bmp, multimodal_decode_wav,
# text_unigram_logprob, bpe_merge_pairs, sim_lsh_recall,
# pagerank_word_graph / sim_topk_vectorized / sim_quantized_recall
# (oracles added).
DRIVER_PRIORITY: tuple[str, ...] = (
    # failed r2 on driver canonicalization (array outputs) — fixed, re-verify
    "label_centroids",
    "emb_quantize_int8",
    # streaming (8)
    "stream_tumbling_hourly",
    "stream_sliding_10m_5m",
    "stream_stateful_user_totals",
    "stream_session_windows",
    "stream_static_join_segments",
    "stream_dedup_pairs",
    "stream_stream_join_attribution",
    "stream_dedup_against_corpus",
    # quality (5)
    "dq_orders_report",
    "dq_referential_integrity",
    "dq_join_key_skew",
    "dq_k_anonymity",
    "storage_file_report",
    # sketches (5)
    "heavy_hitters_verified",
    "cms_word_estimates",
    "stat_corr_matrix",
    "hll_daily_distinct_error",
    "approx_percentile_error",
    # multimodal (4)
    "multimodal_meta",
    "multimodal_decode_stub",
    "multimodal_frame_sample",
    "multimodal_resize",
    # temporal (2)
    "asof_purchase_click",
    "interval_join_error_window",
    # events (5)
    "events_funnel",
    "events_hourly_anomaly",
    "events_variant_props",
    "events_transition_matrix",
    "events_active_users_7d",
    # relational (19)
    "q2_min_cost_supplier",
    "q15_top_supplier",
    "q20_potential_promotion",
    "q21_waiting_orders",
    "orders_monthly_growth",
    "supplier_pareto",
    "part_price_histogram",
    "customer_rfm_segments",
    "scd2_priority_history",
    "cdc_snapshot_diff",
    "winsorized_prices",
    "order_item_quantities",
    "basket_part_pairs",
    "fuzzy_supplier_pairs",
    "date_spine_daily_revenue",
    "mv_incremental_daily_revenue",
    "udf_scalar_pandas_net_price",
    "udaf_weighted_avg_pandas",
    "cogrouped_order_fill_pandas",
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

    missing = [n for n in DRIVER_PRIORITY if n not in QUERIES]
    if missing:
        raise ValueError(f"DRIVER_PRIORITY names not registered: {missing}")
    ordered = [*DRIVER_PRIORITY, *(n for n in QUERIES if n not in set(DRIVER_PRIORITY))]
    for d in (QUERIES, ORACLES):
        items = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(items)
