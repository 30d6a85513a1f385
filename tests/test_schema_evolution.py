"""Schema evolution on the parquet store (mergeSchema).

A long-lived 100 TB table is written by many pipeline versions; columns get
added over time.  The reader contract under test: ``mergeSchema`` unions
the per-file schemas, old files surface the new columns as nulls, and
filters/projections on the evolved column still push down.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_schema_unions_snapshots(spark, tmp_path):
    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id bigint, text string"
    ).write.parquet(path)
    spark.createDataFrame(
        [(3, "gamma", "en"), (4, "delta", "de")],
        "doc_id bigint, text string, lang string",
    ).write.mode("append").parquet(path)

    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"doc_id", "text", "lang"}
    rows = {r.doc_id: r.lang for r in df.collect()}
    assert rows == {1: None, 2: None, 3: "en", 4: "de"}

    # Filters on the evolved column behave (old-file rows are null → dropped)
    assert {r.doc_id for r in df.filter(F.col("lang") == "en").collect()} == {3}
    # and the filter reaches the scan.
    plan = (
        df.filter(F.col("lang") == "en")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan


def test_evolved_column_aggregates_treat_missing_as_null(spark, tmp_path):
    path = str(tmp_path / "evolving2")
    spark.createDataFrame([(1, 10.0)], "k bigint, v double").write.parquet(path)
    spark.createDataFrame(
        [(2, 20.0, 5.0)], "k bigint, v double, bonus double"
    ).write.mode("append").parquet(path)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    got = df.agg(
        F.sum("v").alias("v"), F.sum("bonus").alias("bonus"), F.count("*").alias("n")
    ).first()
    assert (got.v, got.bonus, got.n) == (30.0, 5.0, 2)
