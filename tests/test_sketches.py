"""Sketch-family guarantees that an SQL oracle can't express: CMS one-sided
error, HLL tolerance, and Misra-Gries no-false-negatives."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce_in_docker_rpyc_spark.operators import wordcount as wc
from distributed_mapreduce_in_docker_rpyc_spark.operators.queries_sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    HH_SUPPORT,
    cms_word_estimates,
    heavy_hitters_verified,
    hll_daily_distinct_error,
)
from distributed_mapreduce_in_docker_rpyc_spark.registry import QUERIES, load_all
from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

load_all()


def test_cms_overestimates_within_bound(spark, sf_dir):
    rows = cms_word_estimates(spark, sf_dir).collect()
    assert rows
    n_tokens = wc.tokens(load_table(spark, sf_dir, "documents")).count()
    # One-sided: est >= exact always; overshoot bounded by ~e*N/w w.h.p.
    # (CMS_DEPTH rows make the w.h.p. comfortable at test scale).
    slack = 3.0 * n_tokens / CMS_WIDTH
    for r in rows:
        assert r.cms_est >= r.cnt, f"{r.word}: CMS underestimated"
        assert r.cms_est <= r.cnt + slack, f"{r.word}: overshoot {r.cms_est - r.cnt} > {slack}"
    assert CMS_DEPTH * CMS_WIDTH < 20_000  # sketch stays broadcast-tiny


def test_heavy_hitters_match_exact_having(spark, sf_dir):
    got = {(r.word, r.cnt) for r in heavy_hitters_verified(spark, sf_dir).collect()}
    toks = wc.tokens(load_table(spark, sf_dir, "documents"))
    total = toks.count()
    want = {
        (r.word, r.cnt)
        for r in toks.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > HH_SUPPORT * total)
        .collect()
    }
    assert got == want and got  # candidates-then-verify loses nothing


def test_hll_error_within_tolerance(spark, sf_dir):
    rows = hll_daily_distinct_error(spark, sf_dir).collect()
    assert rows
    # rsd=0.02 → 3-sigma tolerance 6%, pinned INSIDE the query as the
    # integer contract column the oracle hash-checks (self-certifying).
    assert all(r.err_within_3rsd == 1 for r in rows)
    assert all(r.exact_users > 0 for r in rows)


def test_approx_percentile_error_within_tolerance(spark, sf_dir):
    """The GK sketch at accuracy 10000 must sit within 1% of the exact
    percentile on every return-flag group (it is typically exact at this
    scale — the bound is the contract, not the expectation)."""
    from distributed_mapreduce_in_docker_rpyc_spark.operators.queries_sketches import approx_percentile_error

    rows = approx_percentile_error(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p50_within_1pct == 1, r
        assert r.p95_within_1pct == 1, r
        assert 0 < r.exact_p50 <= r.exact_p95, r


def test_bootstrap_se_tracks_classical_se(spark, sf_dir):
    """The Poisson-bootstrap SE must agree with the classical sd/sqrt(n)
    within 40% (B=32 replicas), the CI must bracket both means, and the
    bootstrap center must sit within ~3 SE of the sample mean."""
    import math

    from distributed_mapreduce_in_docker_rpyc_spark.registry import QUERIES

    row = QUERIES["bootstrap_mean_ci"](spark, sf_dir).first()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
        "CAST(o_totalprice AS DOUBLE) AS x"
    )
    stats = o.agg(
        F.count("*").alias("n"), F.avg("x").alias("mu"), F.stddev("x").alias("sd")
    ).first()
    classical_se = stats.sd / math.sqrt(stats.n)
    assert row.n_orders == stats.n
    assert abs(row.sample_mean - stats.mu) < 1e-3
    assert 0.6 * classical_se <= row.boot_se <= 1.4 * classical_se
    assert row.ci_lo < row.boot_mean < row.ci_hi
    assert abs(row.boot_mean - row.sample_mean) <= 3 * row.boot_se


def test_join_cardinality_estimate_ground_truth(spark, sf_dir):
    """Exact F2 and the hash-sampled estimate recomputed in Python; the
    1/64 key sample must be the md5-prefix rule, not RNG."""
    import hashlib
    from collections import Counter

    row = QUERIES["join_cardinality_estimate"](spark, sf_dir).collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_partkey").collect()
    freq = Counter(r.l_partkey for r in li if r.l_partkey is not None)
    exact = sum(c * c for c in freq.values())
    t = (1 << 24) // 64
    sampled = {
        k: c
        for k, c in freq.items()
        if int(hashlib.md5(str(k).encode()).hexdigest()[:6], 16) < t
    }
    est = 64 * sum(c * c for c in sampled.values())
    assert row.n_keys == len(freq)
    assert row.n_sampled == len(sampled)
    assert row.exact_size == exact
    assert row.est_size == est
    assert abs(row.rel_err - abs(est - exact) / exact) < 1e-6
