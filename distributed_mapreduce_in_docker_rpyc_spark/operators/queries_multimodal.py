"""Registered multimodal queries.

``multimodal_meta`` is oracle-checked (byte-level metadata is SQL-expressible);
``multimodal_decode_stub`` exercises the Arrow/mapInPandas decode plumbing and
gets the driver's rows-only check (Python crc32 is not SQL-portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_mapreduce_in_docker_rpyc_spark.operators import multimodal as mm
from distributed_mapreduce_in_docker_rpyc_spark.registry import register
from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table


@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           ascii(substr(text, 1, 1)) AS first_char_code
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the binary payload column (byte length, content
    hash, head byte) — the schema pattern for opaque media columns."""
    docs = mm.attach_payload(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.md5("text").alias("content_md5"),
        F.ascii(F.substring("text", 1, 1)).alias("first_char_code"),
    )


@register("multimodal_decode_stub")
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed media decode over Arrow batches (see multimodal.py). Rows-only
    check; tests assert features against Python-computed ground truth."""
    docs = mm.attach_payload(load_table(spark, sf_dir, "documents"))
    return mm.decode_stub_features(docs)
