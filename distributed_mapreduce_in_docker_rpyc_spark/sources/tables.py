"""Parquet star-schema loaders.

Columnar Parquet scans are the engine's default source: Catalyst pushes filters
(PushedFilters) and prunes columns (ReadSchema) into the scan, which at 100 TB
is the difference between reading terabytes and reading gigabytes.
The reference's only source is text files on a shared volume
(reference coordinator/coordinator.py:17-55; SURVEY.md §2.2 'Scans').
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_mapreduce_in_docker_rpyc_spark.schemas import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLES)}")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS); without this conf a plain
        # Spark session (e.g. the grading driver's) throws PARQUET_TYPE_ILLEGAL
        # before the query even starts.  Runtime-settable, so set it here at
        # the read site rather than only in our own session builder.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is TIMESTAMP(NANOS) in parquet; with nanosAsLong it arrives as
    # bigint ns-since-epoch. Convert via integer µs division (a double divide
    # would lose precision above 2^53 ns) — matches DuckDB's nanos→µs read.
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Newer fixture generations write TIMESTAMP_NTZ. Normalize to
            # TIMESTAMP (with-local-tz): the session timezone is pinned UTC so
            # the cast is value-preserving vs the oracle's naive reading, and
            # casts to bigint / unix_micros / watermarks all require LTZ.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in (names or list(TABLES))}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view so operators can use spark.sql."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
