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


def test_bh_fdr_report_matches_python(spark, oracle_sf_dir):
    """KS D per source, asymptotic p, and the BH step-up recomputed in
    plain Python over the fixture."""
    import math

    from distributed_mapreduce_in_docker_rpyc_spark.registry import QUERIES, load_all

    load_all()
    docs = [
        (r.source, r.n_chars)
        for r in spark.read.parquet(f"{oracle_sf_dir}/documents.parquet").collect()
        if r.source is not None and r.n_chars is not None
    ]
    sources = sorted({s for s, _ in docs})
    grid = sorted({v for _, v in docs})
    stats = {}
    for s in sources:
        mine = sorted(v for src, v in docs if src == s)
        rest = sorted(v for src, v in docs if src != s)
        ns, nr = len(mine), len(rest)
        d = 0.0
        import bisect

        for v in grid:
            fs = bisect.bisect_right(mine, v) / ns
            fr = bisect.bisect_right(rest, v) / nr
            d = max(d, abs(fs - fr))
        d = round(d, 9)
        p = min(1.0, round(2 * math.exp(-2 * d * d * (ns * nr / (ns + nr))), 9))
        stats[s] = (ns, d, p)
    order = sorted(sources, key=lambda s: (stats[s][2], s))
    m = len(order)
    hits = [i + 1 for i, s in enumerate(order) if stats[s][2] <= (i + 1) * 0.10 / m]
    k = max(hits) if hits else 0

    rows = {r.source: r for r in QUERIES["stat_bh_fdr_report"](spark, oracle_sf_dir).collect()}
    assert set(rows) == set(sources)
    for i, s in enumerate(order):
        r = rows[s]
        ns, d, p = stats[s]
        assert r.n_docs == ns
        assert abs(r.ks_d - round(d, 6)) < 2e-6
        assert abs(r.p_value - round(p, 6)) < 2e-6
        assert r.bh_rank == i + 1
        assert r.is_rejected == int(i + 1 <= k)


def test_did_analysis_matches_python(spark, oracle_sf_dir):
    """All four cell means and the DiD estimate recomputed in plain Python
    with the same midpoint-epoch cut."""
    from distributed_mapreduce_in_docker_rpyc_spark.registry import QUERIES, load_all
    from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

    load_all()
    ev = [
        (r.user_id % 2, int(r.ts.timestamp()), round(r.value, 6))
        for r in load_table(spark, oracle_sf_dir, "events")
        .filter("event_type = 'purchase' AND value IS NOT NULL AND ts IS NOT NULL")
        .collect()
    ]
    secs = [s for _, s, _ in ev]
    cut = (min(secs) + max(secs)) // 2
    cells = {}
    for t, s, v in ev:
        key = (t, int(s >= cut))
        n, tot = cells.get(key, (0, 0.0))
        cells[key] = (n + 1, tot + v)
    mean = {k: tot / n for k, (n, tot) in cells.items()}
    row = QUERIES["events_did_analysis"](spark, oracle_sf_dir).collect()[0]
    assert row.n_treat_pre == cells[(1, 0)][0]
    assert row.n_ctrl_post == cells[(0, 1)][0]
    for col, key in [
        ("mean_treat_pre", (1, 0)),
        ("mean_treat_post", (1, 1)),
        ("mean_ctrl_pre", (0, 0)),
        ("mean_ctrl_post", (0, 1)),
    ]:
        assert abs(getattr(row, col) - mean[key]) < 1e-5, col
    want = (mean[(1, 1)] - mean[(1, 0)]) - (mean[(0, 1)] - mean[(0, 0)])
    assert abs(row.did_estimate - want) < 1e-5


def test_uniqueness_profile_matches_python(spark, oracle_sf_dir):
    """Distinct/null/top-value profile recomputed with plain Python."""
    from collections import Counter

    from distributed_mapreduce_in_docker_rpyc_spark.registry import QUERIES, load_all

    load_all()
    orders = spark.read.parquet(f"{oracle_sf_dir}/orders.parquet").collect()
    rows = {r.col: r for r in QUERIES["dq_uniqueness_profile"](spark, oracle_sf_dir).collect()}
    for col, get in [
        ("o_orderstatus", lambda r: r.o_orderstatus),
        ("o_orderpriority", lambda r: r.o_orderpriority),
        ("o_custkey", lambda r: str(r.o_custkey) if r.o_custkey is not None else None),
    ]:
        vals = [get(r) for r in orders]
        nn = [v for v in vals if v is not None]
        cnt = Counter(nn)
        top_value, top_freq = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        r = rows[col]
        assert r.n_rows == len(vals)
        assert r.n_distinct == len(cnt)
        assert r.n_null == len(vals) - len(nn)
        assert (r.top_value, r.top_freq) == (top_value, top_freq)
        assert abs(r.distinct_ratio - round(len(cnt) / len(vals), 6)) < 1e-9


def test_session_gap_sensitivity_matches_python(spark, oracle_sf_dir):
    """Session-start counts at all three gaps recomputed in plain Python
    from per-user sorted event times; monotone in the gap."""
    from distributed_mapreduce_in_docker_rpyc_spark.registry import QUERIES, load_all

    load_all()
    ev = [
        (r.user_id, r.ts, r.event_id)
        for r in spark.read.parquet(f"{oracle_sf_dir}/events.parquet").collect()
        if r.ts is not None
    ]
    byu = {}
    for u, ts, eid in ev:
        byu.setdefault(u, []).append((ts, eid))
    want = {}
    for gap_min in (10, 30, 60):
        n = 0
        for items in byu.values():
            items.sort()
            prev = None
            for ts, _ in items:
                sec = int(ts.timestamp()) if hasattr(ts, "timestamp") else int(ts) // 10**9
                if prev is None or sec - prev > gap_min * 60:
                    n += 1
                prev = sec
        want[gap_min] = n
    rows = {r.gap_minutes: r for r in QUERIES["events_session_gap_sensitivity"](spark, oracle_sf_dir).collect()}
    assert set(rows) == {10, 30, 60}
    for g in (10, 30, 60):
        assert rows[g].n_sessions == want[g], g
        assert abs(rows[g].avg_events_per_session - round(len(ev) / want[g], 6)) < 1e-9
    assert rows[10].n_sessions >= rows[30].n_sessions >= rows[60].n_sessions
