"""Columnar sinks with layout control (partitioning + in-file ordering).

The reference's only sink is one JSON object per reduce partition
(reference worker/worker.py:34-36 — kept as ``operators.wordcount.
write_json_sink``).  This module is the scale-grade counterpart: partitioned
parquet where the directory layout IS the index.

100 TB posture: partition by the column(s) queries filter on (partition
pruning turns a full scan into a directory listing), sort within files by
the secondary predicate column (parquet row-group min/max statistics then
skip pages).  Both are assertions the tests make against the actual read
plan, not just conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet partitioned by ``partition_cols``; optionally sort rows
    within each file by ``sort_cols`` so row-group statistics are selective."""
    out = df.sortWithinPartitions(*sort_cols) if sort_cols else df
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset back (partition columns are reconstructed
    from the directory layout)."""
    return spark.read.parquet(path)
