"""Property-based tests (hypothesis): the tokenizer contract holds for
adversarial inputs, and shingle/count invariants follow from it.

One Spark job per test: hypothesis generates a corpus driver-side, the
whole batch ships as one DataFrame, and per-row results are compared
against the pure-Python reference semantics (reference worker/worker.py:7,18).
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from distributed_mapreduce_in_docker_rpyc_spark.functions.text import tokenize_column, tokenize_line

# Adversarial text: ASCII letters/apostrophes mixed with digits, unicode
# letters (müller), combining marks, newlines, punctuation, emoji.
# Deliberately excludes the one known divergence class: uppercase unicode
# whose lowercase expands into ASCII + combining mark (e.g. İ → i̇), where
# lower-then-match (Spark) and match-then-lower (reference) differ — the
# engine contract documents lower-then-match (functions/text.py).
TEXT = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ'0_9-– \t\n.,!?") + ["é", "ü", "ß", "中", "🙂", "́"]
    ),
    max_size=80,
)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_spark_tokenizer_equals_reference_python(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    got = {
        r["i"]: list(r["toks"])
        for r in df.select("i", tokenize_column("text").alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == tokenize_line(t), repr(t)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_wordcount_equals_python_counter(spark, texts):
    from distributed_mapreduce_in_docker_rpyc_spark.operators.wordcount import word_counts

    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = {r["word"]: r["cnt"] for r in word_counts(df).collect()}
    want = Counter(w for t in texts for w in tokenize_line(t))
    assert got == dict(want)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(TEXT, min_size=1, max_size=20), st.integers(min_value=1, max_value=6))
def test_counts_invariant_under_repartition(spark, texts, nparts):
    """OP-4/OP-16 invariance (SURVEY.md §5): results never depend on the
    partition count."""
    from distributed_mapreduce_in_docker_rpyc_spark.operators.wordcount import word_counts

    df = spark.createDataFrame([(t,) for t in texts], ["text"]).repartition(nparts)
    got = {r["word"]: r["cnt"] for r in word_counts(df).collect()}
    want = Counter(w for t in texts for w in tokenize_line(t))
    assert got == dict(want)


def test_shingles_match_token_slices_on_fixture(spark, sf_dir):
    """dedup.shingles_column ≡ the definitional k-token slices, checked
    row-for-row on the real fixture corpus."""
    from distributed_mapreduce_in_docker_rpyc_spark.operators.dedup import SHINGLE_K, shingles_column
    from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select(
        "doc_id", F.col("text"), shingles_column("text").alias("sh")
    ).collect()
    for r in rows:
        toks = tokenize_line(r["text"])
        if len(toks) < SHINGLE_K:
            want = [" ".join(toks)]
        else:
            want = [
                " ".join(toks[i : i + SHINGLE_K])
                for i in range(len(toks) - SHINGLE_K + 1)
            ]
        assert list(r["sh"]) == want, r["doc_id"]
