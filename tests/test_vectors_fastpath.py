"""r10 optimization guards: the one-expr string fast path of dot/norm and
the precomputed-norm cosine must be BIT-identical to the r9 Column-built
forms — these feed every hash-checked similarity/ANN oracle, so a single
ULP of drift is a driver red."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce_in_docker_rpyc_spark.functions.vectors import (
    cosine_from_norms,
    cosine_similarity_col,
    dot_col,
    norm_col,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = random.Random(10)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)], [rng.uniform(-1, 1) for _ in range(64)])
        for i in range(50)
    ]
    # a zero vector exercises the zero-norm → 0.0 branch
    rows.append((50, [0.0] * 64, [rng.uniform(-1, 1) for _ in range(64)]))
    return spark.createDataFrame(rows, "id long, a array<double>, b array<double>")


def test_expr_fastpath_bit_identical_to_column_form(vec_df):
    df = vec_df.select(
        "id",
        dot_col("a", "b").alias("dot_fast"),  # string args → one F.expr
        dot_col(F.col("a"), F.col("b")).alias("dot_cols"),  # Column args → op loop
        norm_col("a").alias("nrm_fast"),
        norm_col(F.col("a")).alias("nrm_cols"),
    )
    bad = df.filter(
        (F.col("dot_fast") != F.col("dot_cols")) | (F.col("nrm_fast") != F.col("nrm_cols"))
    ).count()
    assert bad == 0


def test_cosine_from_norms_bit_identical_to_inline(vec_df):
    df = vec_df.select(
        "id",
        cosine_similarity_col("a", "b").alias("inline"),
        cosine_from_norms("a", "b", norm_col("a"), norm_col("b")).alias("precomp"),
    )
    rows = df.collect()
    for r in rows:
        assert r["inline"] == r["precomp"], r
    # the zero-norm row takes the 0.0 branch in both forms
    zero = [r for r in rows if r["id"] == 50][0]
    assert zero["inline"] == 0.0 and zero["precomp"] == 0.0


def test_fastpath_matches_python_float_math(vec_df):
    """Anchor both Spark forms to plain sequential Python float math."""
    row = vec_df.filter(F.col("id") == 7).collect()[0]
    a, b = row["a"], row["b"]
    expect_dot = 0.0
    first = a[0] * b[0]
    acc = first
    for i in range(1, 64):
        acc = acc + a[i] * b[i]
    expect_dot = acc
    got = (
        vec_df.filter(F.col("id") == 7)
        .select(dot_col("a", "b").alias("d"), norm_col("a").alias("n"))
        .collect()[0]
    )
    assert got["d"] == expect_dot
    # norm: sqrt of the same sequential self-dot
    acc = a[0] * a[0]
    for i in range(1, 64):
        acc = acc + a[i] * a[i]
    assert got["n"] == math.sqrt(acc)
