"""Registered temporal-join queries (as-of + binned interval join).

Extended scope: the reference has no joins of any kind (SURVEY.md §2.2
"Joins: none"); these are the two join shapes every event workload needs.

DuckDB's native ``ASOF JOIN`` is the oracle for the as-of operator; a plain
range-predicate join oracles the binned interval join — so both scalable
formulations are hash-checked against direct declarative semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_mapreduce_in_docker_rpyc_spark.operators import temporal as tp
from distributed_mapreduce_in_docker_rpyc_spark.registry import register
from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table


@register(
    "asof_purchase_click",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts, MAX(event_id) AS click_event_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.click_event_id AS click_event_id_right,
           c.ts AS ts_right
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's latest preceding (or simultaneous)
    click — the canonical as-of shape. The right side is deduped per
    (user, ts) so the match is deterministic on both engines."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    return tp.asof_join(purchases, clicks, on="user_id")


@register(
    "interval_join_error_window",
    oracle="""
    SELECT e.event_id AS error_event_id, p.event_id AS purchase_event_id,
           e.user_id
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
    JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
      ON p.user_id = e.user_id
     AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL '10 minutes'
    """,
)
def interval_join_error_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases within 10 minutes after an error by the same user, via the
    binned interval join (equi-join on (user, time-bin) + residual range
    filter — no nested-loop range join)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"), "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_event_id"),
        "user_id",
        F.col("ts").alias("t_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("t_end"),
    )
    joined = tp.interval_join_binned(
        purchases, errors, on="user_id", point_ts="ts",
        start_ts="t_start", end_ts="t_end", bin_seconds=600,
    )
    return joined.select("error_event_id", "purchase_event_id", "user_id")
