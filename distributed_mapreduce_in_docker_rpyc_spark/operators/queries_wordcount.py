"""Registered word-count queries (flagship) with DuckDB oracles.

Covers SURVEY.md §2.1 OP-5 (tokenize), OP-6 (lower), OP-7/9/10 (partial/
shuffle/final count aggregation), OP-12 (global merge — implicit), OP-13
(deterministic top-20).  OP-11 (JSON sink) and OP-14 (report) are exercised in
tests (sinks aren't oracle-comparable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from distributed_mapreduce_in_docker_rpyc_spark.operators import wordcount as wc
from distributed_mapreduce_in_docker_rpyc_spark.registry import register
from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

# Tokenizer must match functions/text.py (reference worker/worker.py:7,18).
_TOKS_CTE = """
    WITH toks AS (
        SELECT lower(unnest(regexp_extract_all(lower(text), '[A-Za-z'']+'))) AS word
        FROM documents
    )
"""


@register(
    "wordcount_top20",
    oracle=_TOKS_CTE
    + """
    SELECT word, count(*) AS cnt
    FROM toks
    GROUP BY word
    ORDER BY cnt DESC, length(word) DESC, word ASC
    LIMIT 20
    """,
)
def wordcount_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's one query, end-to-end (SURVEY.md §3.1)."""
    return wc.top_k_words(load_table(spark, sf_dir, "documents"), k=20)


@register(
    "wordcount_full",
    oracle=_TOKS_CTE
    + """
    SELECT word, count(*) AS cnt
    FROM toks
    GROUP BY word
    """,
)
def wordcount_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full per-word counts — validates OP-7/9/10 without the top-k slice."""
    return wc.word_counts(load_table(spark, sf_dir, "documents"))


@register(
    "wordcount_rdd_core",
    oracle=_TOKS_CTE
    + """
    SELECT word, count(*) AS cnt
    FROM toks
    GROUP BY word
    """,
)
def wordcount_rdd_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generic RDD map/reduce-core path (core/mapreduce.py) — same oracle
    as the DataFrame path, so the driver hash-checks the reference-paradigm
    surface too."""
    return wc.word_counts_rdd(load_table(spark, sf_dir, "documents"))
