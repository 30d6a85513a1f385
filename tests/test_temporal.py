"""As-of join and binned interval join semantics tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce_in_docker_rpyc_spark.operators import temporal as tp
from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table


def _ts_df(spark, name, rows, cols):
    return spark.createDataFrame(rows, cols).withColumn("ts", F.to_timestamp("ts"))


def test_asof_backward_inclusive_and_outer(spark):
    left = _ts_df(
        spark,
        "l",
        [
            (1, 100, "2024-01-01 00:05:00"),  # matches r@00:00
            (2, 100, "2024-01-01 00:10:00"),  # matches r@00:10 (inclusive tie)
            (3, 100, "2024-01-01 00:20:00"),  # matches r@00:10 (latest <=)
            (4, 200, "2024-01-01 00:01:00"),  # no right row for key -> null
            (5, 300, "2024-01-01 00:00:00"),  # right exists but later -> null
        ],
        ["event_id", "user_id", "ts"],
    )
    right = _ts_df(
        spark,
        "r",
        [
            (10, 100, "2024-01-01 00:00:00"),
            (11, 100, "2024-01-01 00:10:00"),
            (12, 300, "2024-01-01 00:30:00"),
        ],
        ["rid", "user_id", "ts"],
    )
    out = {
        r["event_id"]: r["rid_right"]
        for r in tp.asof_join(left, right, on="user_id").collect()
    }
    assert out == {1: 10, 2: 11, 3: 11, 4: None, 5: None}


def test_asof_preserves_left_row_count(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("cid")
    )
    assert tp.asof_join(p, c, on="user_id").count() == p.count()


def test_interval_join_binned_equals_naive(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    points = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("pid"), "user_id", "ts"
    )
    iv = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("iid"),
        "user_id",
        F.col("ts").alias("t_start"),
        (F.col("ts") + F.expr("INTERVAL 47 MINUTES")).alias("t_end"),
    )
    binned = {
        (r["pid"], r["iid"])
        for r in tp.interval_join_binned(
            points, iv, on="user_id", point_ts="ts",
            start_ts="t_start", end_ts="t_end", bin_seconds=600,
        ).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in points.join(iv, "user_id")
        .filter((F.col("ts") >= F.col("t_start")) & (F.col("ts") <= F.col("t_end")))
        .collect()
    }
    assert binned == naive and binned
