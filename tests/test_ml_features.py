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
    "logreg_gradient_descent",
    "kmv_weekly_merge",
    "basket_association_rules",
    "graph_kcore_parts",
    "events_sequence_loglik",
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


def test_logreg_gd_matches_numpy_reference(spark, sf_dir):
    """Re-run the exact GD recipe (fast-sigmoid link, lr=2, 6 iters) in
    numpy float64 and require the Spark coefficients to agree to ~1e-5 —
    numpy sums in a different order and skips the DECIMAL quantization, so
    agreement bounds the quantization error, not just self-consistency."""
    import numpy as np

    row = QUERIES["logreg_gradient_descent"](spark, sf_dir).first()
    pdf = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr(
            "CAST(l_quantity AS DOUBLE)/50.0 - 0.5 AS x1",
            "CAST(l_discount AS DOUBLE)*10.0 - 0.5 AS x2",
            "CAST(CASE WHEN l_extendedprice > 36000 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS y",
        )
        .toPandas()
    )
    X = np.column_stack([np.ones(len(pdf)), pdf.x1.values, pdf.x2.values])
    y = pdf.y.values
    b = np.zeros(3)
    for _ in range(6):
        z = X @ b
        p = 0.5 * (1 + z / (1 + np.abs(z)))
        b = b - 2.0 * ((p - y) @ X) / len(y)
    assert abs(row.b0 - b[0]) < 1e-4
    assert abs(row.b1 - b[1]) < 1e-4
    assert abs(row.b2 - b[2]) < 1e-4
    assert row.n_obs == len(pdf)
    assert 0.0 <= row.train_accuracy <= 1.0


def test_kmv_merged_sketch_equals_direct_weekly_sketch(spark, sf_dir):
    """Mergeability is exact: the k smallest hashes of the union of daily
    sketches equal the k smallest of the raw week, so the weekly estimate
    from merged daily sketches must equal the estimate computed directly
    from the week's distinct users."""
    from pyspark.sql import Window

    merged = {
        (str(r.week), r.kmv_estimate)
        for r in QUERIES["kmv_weekly_merge"](spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(F.col("user_id").isNotNull())
    du = ev.selectExpr(
        "CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week", "user_id"
    ).distinct()
    u = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10).cast("double")
        / F.lit(281474976710656.0)
    )
    ranked = du.select("week", u.alias("u")).select(
        "week",
        "u",
        F.row_number().over(Window.partitionBy("week").orderBy(F.asc("u"))).alias("rn"),
        F.count("*").over(Window.partitionBy("week")).alias("ns"),
    )
    direct = {
        (str(r.week), round(r.est, 6))
        for r in ranked.groupBy("week", "ns")
        .agg(
            F.when(F.col("ns") < 32, F.col("ns").cast("double"))
            .otherwise(F.lit(31) / F.max(F.when(F.col("rn") == 32, F.col("u"))))
            .alias("est")
        )
        .collect()
    }
    assert merged == direct


def test_association_rules_probability_axioms(spark, sf_dir):
    """Confidence is a conditional probability (0 < conf ≤ 1); lift is
    symmetric across the two directions of a pair (lift(a→b) == lift(b→a)
    up to the 6-dp round); antecedent/consequent counts are consistent."""
    rows = QUERIES["basket_association_rules"](spark, sf_dir).collect()
    assert rows
    lifts = {}
    for r in rows:
        assert 0 < r.confidence <= 1
        assert r.lift > 0
        key = (min(r.antecedent, r.consequent), max(r.antecedent, r.consequent))
        lifts.setdefault(key, []).append(r.lift)
    assert all(len(v) == 2 and abs(v[0] - v[1]) <= 2e-6 for v in lifts.values())


def test_kcore_every_member_has_core_degree(spark, sf_dir):
    """Every surviving node reports degree ≥ 3 computed strictly within the
    surviving set, and the core never exceeds the pair-connected node set.
    Strict peeling is NOT asserted — on the dense sf0.001 fixture the 3-core
    can retain every pair-connected part, so < would flake; <= plus the
    core-degree invariant is the fixture-independent contract."""
    core = QUERIES["graph_kcore_parts"](spark, sf_dir).collect()
    assert core
    assert all(r.core_degree >= 3 for r in core)
    items = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_parts_with_pair = (
        items.alias("a")
        .join(
            items.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey"))
        .distinct()
        .count()
    )
    assert len(core) <= n_parts_with_pair  # core ⊆ pair-connected set


def test_sequence_loglik_bounds(spark, sf_dir):
    """Log probabilities are negative; the transition counts tie out to the
    total number of per-user consecutive pairs."""
    rows = QUERIES["events_sequence_loglik"](spark, sf_dir).collect()
    assert rows
    assert all(r.avg_loglik < 0 for r in rows)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_transitions for r in rows) == n_events - n_users


def test_rolling_median_window_is_exact(spark, sf_dir):
    """Recompute one series' rolling median in pure Python over the collected
    daily frame — implementation-independent ground truth for the
    percentile-over-window path."""
    import statistics

    rows = QUERIES["ts_rolling_median_revenue"](spark, sf_dir).collect()
    by_prio = {}
    for r in rows:
        by_prio.setdefault(r.o_orderpriority, []).append(r)
    prio, series = sorted(by_prio.items())[0]
    series.sort(key=lambda r: r.day)
    for i, r in enumerate(series):
        window = [s.revenue for s in series[max(0, i - 6) : i + 1]]
        assert abs(r.rolling_median_7 - round(statistics.median(window), 6)) <= 2e-6
        assert abs(r.abs_dev - round(abs(r.revenue - statistics.median(window)), 6)) <= 4e-6


def test_quantile_normalize_is_uniform_bijection_per_dim(spark, sf_dir):
    """Per dimension: q values are exactly the uniform grid {0, 1/(n-1), ...,
    1} (each rank used once), and the map preserves the value order."""
    rows = QUERIES["emb_quantile_normalize"](spark, sf_dir).collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    dims = {}
    for r in rows:
        dims.setdefault(r.dim, []).append(r.q)
    expected = sorted(round((i) / (n_vecs - 1), 6) for i in range(n_vecs))
    for qs in dims.values():
        assert sorted(qs) == expected


def test_knn_label_vote_invariants(spark, sf_dir):
    """50 held-out rows, one verdict each; every prediction is an actually
    observed training label; votes bounded by k=10; correct == (true==pred)."""
    rows = QUERIES["knn_label_vote"](spark, sf_dir).collect()
    assert len(rows) == 50
    assert len({r.query_id for r in rows}) == 50
    train_labels = {
        r.label
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter("vec_id >= 50 AND label IS NOT NULL")
        .select("label")
        .distinct()
        .collect()
    }
    for r in rows:
        assert r.pred_label in train_labels
        assert 1 <= r.n_votes <= 10
        assert r.correct == int(r.true_label == r.pred_label)


def test_bloom_filter_probe_no_false_negatives(spark, sf_dir):
    """The defining Bloom invariant: every true member tests positive —
    n_positive >= n_keys — plus the bit set is bounded by min(k*n, m) and
    the FPR accounting ties out."""
    r = QUERIES["bloom_filter_probe"](spark, sf_dir).collect()[0]
    assert r.n_bits_set <= min(3 * r.n_keys, 65536)
    # no false negatives: positives cover all members (+ the false positives)
    assert r.n_positive == r.n_keys + r.n_false_pos
    assert 0.0 <= r.fpr <= 1.0


def test_decision_stump_beats_majority_class(spark, sf_dir):
    """The chosen split's weighted Gini must be <= the no-split Gini of the
    label distribution (a stump can always fall back to not splitting), and
    the side counts tie out to the observation count."""
    import pyspark.sql.functions as SF

    row = QUERIES["decision_stump_train"](spark, sf_dir).collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        "l_quantity IS NOT NULL AND l_discount IS NOT NULL AND l_returnflag IS NOT NULL"
    )
    n = li.count()
    pos = li.filter(SF.col("l_returnflag") == "R").count()
    p = pos / n
    root_gini = 1.0 - p * p - (1.0 - p) * (1.0 - p)
    assert row.n_left + row.n_right == n
    assert row.gini <= root_gini + 1e-9
    assert row.feature in ("quantity", "discount")


def test_theilsen_slope_bounded_by_extreme_pair(spark, sf_dir):
    """The median pairwise slope lies within the min/max banded pairwise
    slope recomputed in pure Python for one priority — implementation-
    independent ground truth."""
    rows = {r.o_orderpriority: r for r in QUERIES["theilsen_daily_trend"](spark, sf_dir).collect()}
    assert rows
    import pyspark.sql.functions as SF

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    prio = sorted(rows)[0]
    daily = (
        o.filter(SF.col("o_orderpriority") == prio)
        .groupBy(SF.to_date("o_orderdate").alias("day"))
        .agg(SF.sum("o_totalprice").alias("rev"))
        .collect()
    )
    pts = sorted((r.day.toordinal(), float(r.rev)) for r in daily)
    slopes = [
        (r2 - r1) / (d2 - d1)
        for i, (d1, r1) in enumerate(pts)
        for (d2, r2) in pts[i + 1 :]
        if 0 < d2 - d1 <= 90
    ]
    assert len(slopes) == rows[prio].n_pairs
    assert min(slopes) - 1e-6 <= rows[prio].theil_sen_slope <= max(slopes) + 1e-6


def test_attribution_credit_conservation(spark, sf_dir):
    """Every attributed purchase's credits sum to exactly 10000 bp, and the
    single/double-touch degenerate splits hold."""
    rows = QUERIES["events_attribution_credit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.first_credit_bp + r.last_credit_bp + r.mid_credit_bp == 10000
        assert r.n_touches >= 1
        if r.n_touches == 1:
            assert r.first_click_id == r.last_click_id
            assert (r.first_credit_bp, r.mid_credit_bp) == (10000, 0)
        if r.n_touches == 2:
            assert r.first_credit_bp == r.last_credit_bp == 5000


def test_streaks_python_ground_truth(spark, sf_dir):
    """Recompute one user's streak decomposition in pure Python."""
    rows = {r.user_id: r for r in QUERIES["events_active_streaks"](spark, sf_dir).collect()}
    assert rows
    uid = sorted(rows)[0]
    days = sorted(
        {
            r.day.toordinal()
            for r in spark.read.parquet(f"{sf_dir}/events.parquet")
            .filter(f"user_id = {uid}")
            .selectExpr("CAST(ts AS DATE) AS day")
            .collect()
        }
    )
    streaks, cur = [], 1
    for a, b in zip(days, days[1:]):
        if b == a + 1:
            cur += 1
        else:
            streaks.append(cur)
            cur = 1
    streaks.append(cur)
    got = rows[uid]
    assert got.n_active_days == len(days)
    assert got.longest_streak == max(streaks)
    assert got.n_streaks == len(streaks)


def test_markov_stationary_is_distribution(spark, sf_dir):
    """The iterated vector is non-negative and sums to 1 (up to the
    DECIMAL(38,12) per-step truncation drift over 8 iterations)."""
    rows = QUERIES["events_markov_stationary"](spark, sf_dir).collect()
    assert rows
    total = sum(r.stationary_p for r in rows)
    assert all(r.stationary_p >= 0 for r in rows)
    assert abs(total - 1.0) < 1e-6


def test_kmv_intersection_consistency(spark, sf_dir):
    """Inclusion-exclusion internal consistency plus estimate-vs-exact
    bracketing at k=32 (rel err ~18%; allow 3x)."""
    r = QUERIES["kmv_type_intersection"](spark, sf_dir).collect()[0]
    assert r.exact_intersection <= min(r.exact_a, r.exact_b)
    assert r.kmv_intersection >= 0
    assert abs(round(r.kmv_a + r.kmv_b - r.kmv_union, 6)) >= r.kmv_intersection - 1e-6
    for est, exact in ((r.kmv_a, r.exact_a), (r.kmv_b, r.exact_b)):
        assert 0.3 * exact <= est <= 3.0 * exact


def test_lsh_tuning_configs_are_nested(spark, sf_dir):
    """Bands nest (an 8-row band match implies its 4- and 2-row sub-band
    matches), so candidate counts must be monotone decreasing in rows-per-
    band, and true pairs never exceed candidates."""
    rows = {r.rows_per_band: r for r in QUERIES["dedup_lsh_tuning_report"](spark, sf_dir).collect()}
    assert set(rows) == {2, 4, 8}
    assert rows[2].n_candidates >= rows[4].n_candidates >= rows[8].n_candidates
    for r in rows.values():
        assert 0 <= r.n_true_pairs <= r.n_candidates
        assert 0.0 <= r.precision_at_05 <= 1.0


def test_phrase_search_counts_match_python(spark, sf_dir):
    """Recompute one phrase's per-doc occurrence counts with a pure-Python
    sliding window."""
    import re

    rows = QUERIES["phrase_search_positional"](spark, sf_dir).collect()
    assert rows
    phrase = sorted({r.phrase for r in rows})[0]
    target = tuple(phrase.split(" "))
    got = {r.doc_id: r.n_occurrences for r in rows if r.phrase == phrase}
    word = re.compile(r"[a-z']+")
    want = {}
    for d in spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text").collect():
        toks = word.findall((d.text or "").lower())
        n = sum(1 for i in range(len(toks) - 2) if tuple(toks[i : i + 3]) == target)
        if n:
            want[d.doc_id] = n
    assert got == want


def test_pit_join_covers_every_order_with_correct_nulls(spark, sf_dir):
    """One output row per order; NULL priority exactly when the probe time
    precedes the customer's first recorded change."""
    rows = QUERIES["scd2_point_in_time_join"](spark, sf_dir).collect()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert len(rows) == o.count()
    first_change = {
        r.o_custkey: r.first_day
        for r in o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_day")).collect()
    }
    for r in rows[:500]:
        if r.priority_at_t is None:
            assert r.t < first_change[r.o_custkey]
        else:
            assert r.t >= first_change[r.o_custkey]


def test_reservoir_sample_exact_group_sizes(spark, sf_dir):
    """Each source yields exactly min(10, group size) rows, ranks are the
    contiguous prefix 1..k, and a rerun selects the identical sample
    (hash priorities, no RNG)."""
    from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

    out = QUERIES["corpus_reservoir_sample"](spark, sf_dir)
    got = out.groupBy("source").agg(
        F.count("*").alias("n"), F.max("rank").alias("max_rank")
    ).collect()
    sizes = {
        r["source"]: r["count"]
        for r in load_table(spark, sf_dir, "documents").groupBy("source").count().collect()
    }
    assert got
    for r in got:
        expect = min(10, sizes[r.source])
        assert (r.n, r.max_rank) == (expect, expect)
    a = sorted((r.source, r.doc_id) for r in out.collect())
    b = sorted(
        (r.source, r.doc_id)
        for r in QUERIES["corpus_reservoir_sample"](spark, sf_dir).collect()
    )
    assert a == b


def test_reservoir_sample_is_size_biased(spark, oracle_sf_dir):
    """The n_chars-weighted priority must pull the sample mean length above
    the corpus mean (the point of weighting) — a distribution-level check
    that the weight actually reaches the rank key.  Runs at sf0.01, where
    groups exceed the reservoir size so selection is actually exercised
    (at sf0.001 every group fits in the reservoir and sample == corpus)."""
    from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

    sample_mean = (
        QUERIES["corpus_reservoir_sample"](spark, oracle_sf_dir)
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    corpus_mean = (
        load_table(spark, oracle_sf_dir, "documents").agg(F.avg("n_chars")).first()[0]
    )
    assert sample_mean > corpus_mean


def test_oov_rate_bounds_and_vocab_coverage(spark, sf_dir):
    """0 <= n_oov <= n_tokens with rate consistent; empty docs rate 0; and
    the corpus-wide OOV mass must be a minority share, since the top-500
    vocab by construction covers the head of a Zipfian corpus."""
    rows = QUERIES["vocab_oov_rate"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        expect = (r.n_oov / r.n_tokens) if r.n_tokens else 0.0
        assert abs(r.oov_rate - expect) < 1e-12
    total_oov = sum(r.n_oov for r in rows)
    total_tok = sum(r.n_tokens for r in rows)
    assert total_oov < 0.5 * total_tok


def test_seasonal_decompose_identity_and_shape(spark, sf_dir):
    """revenue == trend + seasonal + residual bit-for-bit up to fp assoc
    (the residual is defined as that difference), dow covers 1..7, and each
    priority contributes one row per observed day."""
    out = QUERIES["ts_seasonal_decompose"](spark, sf_dir).collect()
    assert out
    for r in out:
        assert 1 <= r.dow <= 7
        assert abs(r.revenue - (r.trend + r.seasonal + r.residual)) < 1e-6
    by_key = {(r.o_orderpriority, r.day) for r in out}
    assert len(by_key) == len(out)


def test_seasonal_decompose_seasonal_is_dow_mean_of_detrended(spark, sf_dir):
    """Per (priority, dow), mean(revenue - trend) must equal the seasonal
    value on every member row — recompute it driver-side from the output."""
    from collections import defaultdict

    out = QUERIES["ts_seasonal_decompose"](spark, sf_dir).collect()
    groups = defaultdict(list)
    for r in out:
        groups[(r.o_orderpriority, r.dow)].append(r)
    for (_, _), rows in groups.items():
        mean_det = sum(r.revenue - r.trend for r in rows) / len(rows)
        for r in rows:
            assert abs(r.seasonal - mean_det) < 1e-6


def test_wav_hadamard_parseval_exact(spark, sf_dir):
    """Unnormalized WHT Parseval: per document, sum of coefficient energies
    equals exactly 64x the energy of the (zero-padded) 64-sample input —
    recomputed here from the raw text bytes, integer-exact."""
    from collections import defaultdict

    rows = QUERIES["multimodal_wav_hadamard"](spark, sf_dir).collect()
    assert rows
    energy = defaultdict(int)
    coef0 = {}
    for r in rows:
        energy[r.doc_id] += r.energy
        assert r.energy == r.coef * r.coef
        if r.seq_idx == 0:
            coef0[r.doc_id] = r.coef
    docs = {
        r.doc_id: (r.text or "").encode("utf-8") or b"\x00"
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    for did, data in docs.items():
        v = [b - 128 for b in data[:64]]
        assert energy[did] == 64 * sum(x * x for x in v)
        # sequency 0 is the plain sample sum (all +1 weights)
        assert coef0[did] == sum(v)


def test_bitmap_counts_equal_direct_scan(spark, sf_dir):
    """The defining invariant: popcount over the AND/OR bitmaps equals the
    direct predicate scan, and inclusion-exclusion ties all four together."""
    r = QUERIES["bitmap_index_intersection"](spark, sf_dir).first()
    assert r.n_both_bitmap == r.n_both_direct
    assert r.n_either_bitmap == r.n_either_direct
    assert r.n_returned + r.n_finished == r.n_both_bitmap + r.n_either_bitmap


def test_rake_phrases_are_stopword_free_runs(spark, sf_dir):
    """No extracted phrase contains a stopword; scores are positive and the
    output is totally ordered by (score desc, phrase asc)."""
    from distributed_mapreduce_in_docker_rpyc_spark.operators.queries_text import _RAKE_STOPS

    stops = {s.strip("'") for s in _RAKE_STOPS.split(",")}
    rows = QUERIES["text_rake_phrases"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        words = r.phrase.split(" ")
        assert not (set(words) & stops)
        assert r.n_words >= 1
        assert r.degree_score >= r.n_words  # each word's degree >= its phrase len
    keys = [(-r.degree_score, r.phrase) for r in rows]
    assert keys == sorted(keys)


def test_bmp_gradient_matches_python_recompute(spark, sf_dir):
    """Independent ground truth: recompute each image's horizontal gradient
    energy from the raw text bytes (cycled raster, stride-3 same-channel
    pairs) in plain Python and require exact integer equality."""
    rows = {r.doc_id: r for r in QUERIES["multimodal_bmp_gradient"](spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    assert rows
    for d in docs:
        src = (d.text or "").encode("utf-8") or b"\x00"
        n = len(src)
        w, h = 1 + (n * 7) % 16, 1 + (n * 13) % 16
        rw = 3 * w
        expect = sum(
            abs(src[(t + 3) % n] - src[t % n])
            for t in range(rw * h)
            if (t % rw) < rw - 3
        )
        r = rows[d.doc_id]
        assert (r.width, r.height, r.grad_energy) == (w, h, expect)
        m = h * (rw - 3)
        assert r.mean_abs_grad == (expect / m if m else 0.0)


def test_asof_nearest_is_truly_nearest(spark, sf_dir):
    """For every matched error the reported purchase is at minimal |dt|
    among ALL the user's purchases (recomputed driver-side), ties resolve
    to the earlier purchase, and users with no purchases emit NULLs."""
    from collections import defaultdict

    out = QUERIES["asof_nearest_purchase"](spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    purchases = defaultdict(list)
    errors = {}
    for e in ev:
        if e.event_type == "purchase":
            purchases[e.user_id].append(e)
        elif e.event_type == "error":
            errors[e.event_id] = e
    assert out
    n_checked = 0
    for r in out[:800]:
        err = errors[r.error_event_id]
        ps = purchases.get(r.user_id)
        if not ps:
            assert r.nearest_purchase_id is None and r.dt_us is None
            continue
        def us(td):
            return (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds

        best = min(abs(us(p.ts - err.ts)) for p in ps)
        assert r.dt_us == best
        n_checked += 1
    assert n_checked > 0


def test_stream_wordcount_equals_batch_wordcount(spark, sf_dir):
    """The streaming state-store path and the batch shuffle path must
    produce identical word totals — the reference's whole workload, both
    execution models."""
    stream = {
        (r.word, r.cnt)
        for r in QUERIES["stream_wordcount_totals"](spark, sf_dir).collect()
    }
    batch = {
        (r.word, r.cnt) for r in QUERIES["wordcount_full"](spark, sf_dir).collect()
    }
    assert stream == batch
    assert stream


def test_completeness_matrix_covers_every_column(spark, sf_dir):
    """One row per (table, column) for all ten tables, n_null <= n_rows,
    and the fraction is consistent; row counts agree with direct counts."""
    from distributed_mapreduce_in_docker_rpyc_spark.operators.queries_quality import (
        _COMPLETENESS_SCHEMA,
    )
    from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

    rows = QUERIES["dq_completeness_matrix"](spark, sf_dir).collect()
    seen = {(r.table_name, r.column_name) for r in rows}
    expect = {(t, c) for t, cols in _COMPLETENESS_SCHEMA.items() for c in cols}
    assert seen == expect
    counts = {t: load_table(spark, sf_dir, t).count() for t in _COMPLETENESS_SCHEMA}
    for r in rows:
        assert r.n_rows == counts[r.table_name]
        assert 0 <= r.n_null <= r.n_rows
        assert r.null_frac == r.n_null / max(r.n_rows, 1)


def test_rake_matches_python_reference(spark, sf_dir):
    """Independent ground truth for RAKE: recompute candidate phrases, word
    degrees, and phrase scores from the raw documents in plain Python (the
    DuckDB oracle shares the relational formulation; this reference
    doesn't) and require the exact same top-20."""
    import re
    from collections import Counter

    from distributed_mapreduce_in_docker_rpyc_spark.operators.queries_text import _RAKE_STOPS

    stops = {s.strip("'") for s in _RAKE_STOPS.split(",")}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    phrases: list[tuple[str, ...]] = []
    for d in docs:
        cur: list[str] = []
        for w in re.findall(r"[a-z']+", (d.text or "").lower()):
            if w in stops:
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(tuple(cur))
    deg: Counter = Counter()
    for p in phrases:
        for w in p:
            deg[w] += len(p)
    occ = Counter(" ".join(p) for p in phrases)
    score = {ph: sum(deg[w] for w in ph.split(" ")) for ph in occ}
    want = sorted(
        ((ph, len(ph.split(" ")), occ[ph], score[ph]) for ph in occ),
        key=lambda t: (-t[3], t[0]),
    )[:20]
    got = sorted(
        (
            (r.phrase, r.n_words, r.n_occurrences, r.degree_score)
            for r in QUERIES["text_rake_phrases"](spark, sf_dir).collect()
        ),
        key=lambda t: (-t[3], t[0]),
    )
    assert got == want


def test_matryoshka_recall_bounds_and_self_consistency(spark, sf_dir):
    """Recall is in [0, 1] over the full query set, and truncating to ALL
    64 dims would be recall 1.0 by construction — spot-check that the
    16-dim recall is meaningfully above chance (10/(N-1) for random picks)."""
    r = QUERIES["emb_matryoshka_recall"](spark, sf_dir).first()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert 0.0 <= r.mean_recall_at_10 <= 1.0
    assert r.n_queries == min(50, n_vecs)
    assert r.mean_recall_at_10 > 10.0 / max(n_vecs - 1, 11)


def test_time_to_convert_invariants(spark, sf_dir):
    """Every viewing user appears exactly once; converted rows have
    non-negative delays consistent with the timestamps; unconverted rows
    are all-NULL on the purchase side."""
    rows = QUERIES["events_time_to_convert"](spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_viewers = (
        ev.filter("event_type = 'view' AND user_id IS NOT NULL")
        .select("user_id")
        .distinct()
        .count()
    )
    assert len(rows) == n_viewers
    for r in rows:
        if r.converted:
            assert r.first_purchase_ts >= r.first_view_ts
            td = r.first_purchase_ts - r.first_view_ts
            assert r.delay_us == (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds
        else:
            assert r.first_purchase_ts is None and r.delay_us is None


def test_link_prediction_candidates_are_nonedges_with_witnesses(spark, sf_dir):
    """No predicted pair is an existing edge, every pair really has the
    claimed number of common neighbors (recomputed driver-side), and the
    output is totally ordered by (jaccard desc, a, b)."""
    import re
    from collections import Counter, defaultdict

    rows = QUERIES["graph_link_prediction"](spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    cnt: Counter = Counter()
    for d in docs:
        ws = re.findall(r"[a-z']+", (d.text or "").lower())
        for x, y in zip(ws, ws[1:]):
            if x != y:
                cnt[(min(x, y), max(x, y))] += 1
    edges = {p for p, c in cnt.items() if c >= 50}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    keys = []
    for r in rows:
        assert (r.a, r.b) not in edges
        common = adj[r.a] & adj[r.b]
        assert len(common) == r.common_neighbors > 0
        union = len(adj[r.a] | adj[r.b])
        assert abs(r.jaccard - len(common) / union) < 1e-12
        keys.append((-r.jaccard, r.a, r.b))
    assert keys == sorted(keys)


def test_backlog_conservation_and_bounds(spark, sf_dir):
    """Difference-array invariants: the series starts and ends at the
    per-day stabbing count (recomputed driver-side from the spans), total
    inflow equals total outflow (every order closes), and n_open is
    always >= 0."""
    rows = {r.day: r.n_open for r in QUERIES["orders_open_backlog"](spark, sf_dir).collect()}
    assert rows
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    import collections
    max_ship = collections.defaultdict(lambda: None)
    for l in li:
        d = l.l_shipdate.date() if hasattr(l.l_shipdate, "date") else l.l_shipdate
        k = l.l_orderkey
        if max_ship[k] is None or d > max_ship[k]:
            max_ship[k] = d
    spans = []
    for r in o:
        if max_ship[r.o_orderkey] is None:
            continue
        s = r.o_orderdate.date() if hasattr(r.o_orderdate, "date") else r.o_orderdate
        spans.append((s, max(s, max_ship[r.o_orderkey])))
    for day, n in list(rows.items())[:200]:
        expect = sum(1 for s, e in spans if s <= day <= e)
        assert n == expect, (day, n, expect)
    assert all(n >= 0 for n in rows.values())
    last_day = max(rows)
    assert rows[last_day] == sum(1 for s, e in spans if s <= last_day <= e)


def test_roc_auc_matches_bruteforce_pairwise(spark, sf_dir):
    """The rank-statistic AUC must equal the brute-force pairwise
    definition P(score_pos > score_neg) + P(tie)/2, recomputed driver-side
    from the raw observations, and gini == 2*auc - 1."""
    row = QUERIES["logreg_roc_auc"](spark, sf_dir).collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    from distributed_mapreduce_in_docker_rpyc_spark.operators.queries_features import _fit_gd
    from distributed_mapreduce_in_docker_rpyc_spark.operators.queries_features import (
        _GD_X1,
        _GD_X2,
        _GD_Y,
    )

    obs_df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter("l_quantity IS NOT NULL AND l_discount IS NOT NULL"
                " AND l_extendedprice IS NOT NULL")
        .selectExpr(f"{_GD_X1} AS x1", f"{_GD_X2} AS x2", f"{_GD_Y} AS y")
    )
    b0, b1, b2 = _fit_gd(obs_df)
    scored = [
        ((b0 + b1 * ((float(r.l_quantity) / 50.0) - 0.5))
         + b2 * ((float(r.l_discount) * 10.0) - 0.5),
         1 if float(r.l_extendedprice) > 36000 else 0)
        for r in li
        if r.l_quantity is not None and r.l_discount is not None
        and r.l_extendedprice is not None
    ]
    pos = sorted(z for z, y in scored if y == 1)
    neg = sorted(z for z, y in scored if y == 0)
    assert row.n_pos == len(pos) and row.n_neg == len(neg)
    import bisect

    num2 = 0
    for z in pos:
        lt = bisect.bisect_left(neg, z)
        eq = bisect.bisect_right(neg, z) - lt
        num2 += 2 * lt + eq
    auc = num2 / (2.0 * len(pos) * len(neg))
    assert abs(row.auc - auc) < 1e-6
    assert abs(row.gini - (num2 / (len(pos) * len(neg)) - 1.0)) < 1e-5


def test_threshold_sweep_monotone_and_conserving(spark, sf_dir):
    """Across the nine thresholds: tp+fn and fp+tn are constant (class
    totals), tp and fp are non-increasing in the threshold, recall is
    non-increasing, and every confusion cell is non-negative."""
    rows = sorted(
        QUERIES["logreg_threshold_sweep"](spark, sf_dir).collect(),
        key=lambda r: r.threshold,
    )
    assert len(rows) == 9
    n_pos = {r.tp + r.fn for r in rows}
    n_neg = {r.fp + r.tn for r in rows}
    assert len(n_pos) == 1 and len(n_neg) == 1
    for a, b in zip(rows, rows[1:]):
        assert b.tp <= a.tp and b.fp <= a.fp
        if a.rec is not None and b.rec is not None:
            assert b.rec <= a.rec + 1e-12
    for r in rows:
        assert min(r.tp, r.fp, r.fn, r.tn) >= 0
        if r.tp + r.fp > 0:
            assert abs(r.prec - r.tp / (r.tp + r.fp)) < 1e-6


def test_connected_components_fixpoint_and_edge_consistency(spark, sf_dir):
    """The 16-round labels are a true fixpoint (one extra propagation round
    changes nothing), every edge's endpoints share a component, component
    ids are member minima, and sizes partition the vertex set."""
    from collections import defaultdict

    out = QUERIES["graph_connected_components"](spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    orders = defaultdict(set)
    for r in li:
        orders[r.l_orderkey].add(r.l_partkey)
    from collections import Counter

    pair_n = Counter()
    for parts in orders.values():
        ps = sorted(parts)
        for i, x in enumerate(ps):
            for y in ps[i + 1:]:
                pair_n[(x, y)] += 1
    edges = [e for e, n in pair_n.items() if n >= 2]
    # driver-side union-find ground truth
    par = {}

    def find(x):
        while par.setdefault(x, x) != x:
            par[x] = par[par[x]]
            x = par[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            par[ra] = rb
    comp = defaultdict(list)
    for v in par:
        comp[find(v)].append(v)
    truth = {(min(vs), len(vs), sum(vs)) for vs in comp.values()}
    got = {(r.component, r.n_parts, r.sum_parts) for r in out}
    assert got == truth
    assert sum(r.n_parts for r in out) == len(par)


def test_chi2_keyness_matches_bruteforce(spark, sf_dir):
    """Each reported word's chi-squared statistic must equal the textbook
    2x2 contingency computation from raw token counts, and the 20 rows
    must be the global maxima (no eligible word scores higher)."""
    import re
    from collections import Counter

    rows = QUERIES["text_chi2_keyness"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ca, cb = Counter(), Counter()
    for d in docs:
        words = re.findall(r"[a-z']+", (d.text or "").lower())
        (ca if d.doc_id % 2 == 0 else cb).update(words)
    na, nb = sum(ca.values()), sum(cb.values())
    n = na + nb

    def chi2(w):
        a, b = ca[w], cb[w]
        c, d = na - a, nb - b
        return (n * ((a * d - b * c) ** 2)) / (((a + b) * (c + d)) * (na * nb))

    assert len(rows) == 20
    for r in rows:
        assert (r.count_even, r.count_odd) == (ca[r.word], cb[r.word])
        assert abs(r.chi2 - chi2(r.word)) < 1e-4
    floor = min(r.chi2 for r in rows)
    eligible = {w for w in set(ca) | set(cb) if ca[w] + cb[w] >= 20}
    better = [w for w in eligible if chi2(w) > floor + 1e-4]
    assert len(better) <= 20


def test_kaplan_meier_invariants(spark, sf_dir):
    """Survival is non-increasing in duration, stays in [0,1], matches the
    direct product of per-step factors, and the risk set counts exactly
    the users whose time-to-first-purchase >= t."""
    from collections import Counter

    out = sorted(
        QUERIES["survival_kaplan_meier"](spark, sf_dir).collect(),
        key=lambda r: r.duration_days,
    )
    assert out
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    first = {}
    conv = {}
    tmax = max(e.ts for e in ev)
    for e in ev:
        if e.user_id is None:
            continue
        if e.user_id not in first or e.ts < first[e.user_id]:
            first[e.user_id] = e.ts
        if e.event_type == "purchase" and (
            e.user_id not in conv or e.ts < conv[e.user_id]
        ):
            conv[e.user_id] = e.ts

    durs = Counter()
    cens = Counter()
    for u, t0 in first.items():
        if u in conv:
            durs[(conv[u].date() - t0.date()).days] += 1
        else:
            cens[(tmax.date() - t0.date()).days] += 1
    all_d = sorted(set(durs) | set(cens))
    n_risk = {}
    rem = sum(durs.values()) + sum(cens.values())
    for d in all_d:
        n_risk[d] = rem
        rem -= durs[d] + cens[d]
    s = 1.0
    surv = {}
    for d in all_d:
        if durs[d] > 0:
            if durs[d] == n_risk[d]:
                s = 0.0
            else:
                s = s * (1.0 - durs[d] / n_risk[d]) if s > 0 else 0.0
            surv[d] = s
    prev = 1.0
    for r in out:
        assert r.n_events == durs[r.duration_days]
        assert r.n_censored == cens[r.duration_days]
        assert r.n_at_risk == n_risk[r.duration_days]
        assert 0.0 <= r.survival <= prev + 1e-9
        assert abs(r.survival - surv[r.duration_days]) < 1e-5
        prev = r.survival


def test_cusum_peaks_at_injected_shift(spark, tmp_path):
    """On a synthetic series with a known mean shift, the flagged
    changepoint day must be the shift boundary, and the CUSUM values
    must match the direct prefix-sum computation."""
    import datetime

    rows = []
    base = datetime.datetime(2024, 1, 1)
    eid = 0
    for day in range(30):
        v = 10.0 if day < 20 else 30.0
        for k in range(4):
            rows.append(
                (eid, base + datetime.timedelta(days=day, hours=k), 1, "view", v, None)
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = sorted(
        QUERIES["events_cusum_changepoint"](spark, str(tmp_path)).collect(),
        key=lambda r: r.day,
    )
    assert len(out) == 30
    mu = (20 * 40.0 + 10 * 120.0) / 30
    cum = 0.0
    for i, r in enumerate(out):
        cum += (40.0 if i < 20 else 120.0)
        assert abs(r.cusum - (cum - (i + 1) * mu)) < 1e-6
    flagged = [r.day for r in out if r.is_changepoint == 1]
    assert flagged == [out[19].day]


def test_autocorrelation_of_pure_sine_peaks_at_period(spark, tmp_path):
    """A clean 7-day-period sine series must autocorrelate near +1 at lag
    7 and 14 and negative at the half period."""
    import datetime
    import math

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for day in range(140):
        v = 1000.0 + 500.0 * math.sin(2 * math.pi * day / 7)
        rows.append((day, base + datetime.timedelta(days=day), v, "1-URGENT"))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double,"
        " o_orderpriority string"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = {r.lag: r for r in QUERIES["ts_autocorrelation"](spark, str(tmp_path)).collect()}
    assert set(out) == set(range(1, 15))
    # the biased estimator scales a perfect sine's peak by (n-k)/n
    assert out[7].autocorr >= 0.95 - 1e-6 and out[14].autocorr >= 0.9 - 1e-6
    assert out[3].autocorr < -0.5 and out[4].autocorr < -0.5
    for k, r in out.items():
        assert r.n_pairs == 140 - k


def test_ols_kfold_cv_beats_noise_and_matches_numpy_free_fit(spark, sf_dir):
    """Per-fold beta/alpha must match a driver-side exact-fraction OLS fit
    on the same train split, and the held-out RMSE must be well below the
    no-model standard deviation (quantity genuinely predicts price)."""
    import hashlib
    from collections import defaultdict

    out = {r.fold: r for r in QUERIES["ols_kfold_cv"](spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    per = defaultdict(lambda: [0, 0.0, 0.0, 0.0, 0.0])
    data = defaultdict(list)
    for r in li:
        if r.l_quantity is None or r.l_extendedprice is None:
            continue
        key = f"{r.l_orderkey}-{r.l_linenumber}"
        fold = int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % 5
        x, y = float(r.l_quantity), float(r.l_extendedprice)
        st = per[fold]
        st[0] += 1
        st[1] += x
        st[2] += y
        st[3] += x * x
        st[4] += x * y
        data[fold].append((x, y))
    tot = [sum(per[f][i] for f in per) for i in range(5)]
    for f, r in out.items():
        n, sx, sy, sxx, sxy = (tot[i] - per[f][i] for i in range(5))
        beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        alpha = (sy - beta * sx) / n
        assert r.n_train == n and r.n_test == per[f][0]
        assert abs(r.beta - beta) < 1e-4
        assert abs(r.alpha - alpha) < 1e-3
        ssr = sum(round((y - (alpha + beta * x)) ** 2, 6) for x, y in data[f])
        rmse = (ssr / len(data[f])) ** 0.5
        assert abs(r.rmse - rmse) < max(1e-3, 1e-5 * rmse)


def test_ams_f2_matches_driver_reference(spark, sf_dir):
    """The AMS estimate must equal the driver-side recomputation (same md5
    signs, same median-of-means), and exact_f2 must equal sum f^2."""
    import hashlib
    import statistics
    from collections import Counter

    row = QUERIES["ams_f2_sketch"](spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    freq = Counter(e.user_id for e in ev if e.user_id is not None)
    exact = sum(f * f for f in freq.values())
    assert row.exact_f2 == exact and row.n_users == len(freq)
    z = [0] * 32
    for u, f in freq.items():
        for j in range(32):
            h = hashlib.md5(f"{j}:{u}".encode()).hexdigest()
            z[j] += f if int(h[0], 16) % 2 == 0 else -f
    groups = [[z[j] ** 2 for j in range(32) if j % 8 == g] for g in range(8)]
    est = statistics.median(sum(gr) / len(gr) for gr in groups)
    assert abs(row.ams_estimate - est) < 1e-4
    assert abs(row.rel_error - abs(est - exact) / exact) < 1e-5


def test_pca_power_iteration_properties(spark, sf_dir):
    """Loadings are unit-norm; the eigenvalue estimate matches a driver-side
    numpy power iteration on the same 4-dp Gram; and the loadings align
    with the numpy iterate (same fixed rounds) up to quantization noise."""
    import numpy as np

    out = sorted(
        QUERIES["emb_pca_power_iteration"](spark, sf_dir).collect(),
        key=lambda r: r.dim,
    )
    assert len(out) == 64
    x_spark = np.array([r.loading for r in out])
    lam_spark = out[0].eigenvalue
    assert abs(np.linalg.norm(x_spark) - 1.0) < 1e-4
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    m = np.array(
        [e.embedding for e in emb if e.embedding is not None and len(e.embedding) == 64],
        dtype=np.float64,
    )
    g = np.round(m.T @ m, 4)
    x = np.full(64, 0.125)
    lam = None
    prev_rq = -np.inf
    for _ in range(8):
        y = g @ x
        lam = float(np.linalg.norm(y))
        x = y / lam
        rq = float(x @ g @ x)
        assert rq >= prev_rq - 1e-6 * abs(rq)  # power-iteration certificate
        prev_rq = rq
    assert abs(lam_spark - lam) / lam < 1e-4
    assert np.abs(x_spark - x).max() < 1e-4


def test_gini_matches_driver_and_lorenz_is_convex(spark, sf_dir):
    """Gini equals the exact driver-side rank formula, cumulative shares
    are increasing and convex (sorted ascending ⇒ marginal decile shares
    non-decreasing), and the final share is 1."""
    from collections import defaultdict

    out = sorted(
        QUERIES["customer_gini_concentration"](spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    rev = defaultdict(float)
    for o in orders:
        rev[o.o_custkey] += float(o.o_totalprice)
    xs = sorted(rev.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(xs)
    tot = sum(v for _, v in xs)
    sw = sum((i + 1) * v for i, (_, v) in enumerate(xs))
    gini = 2 * sw / (n * tot) - (n + 1) / n
    assert abs(out[0].gini - gini) < 1e-5
    assert sum(r.n_customers for r in out) == n
    shares = [r.cum_share for r in out]
    assert all(b > a for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-6
    marg = [shares[0]] + [b - a for a, b in zip(shares, shares[1:])]
    assert all(b >= a - 1e-9 for a, b in zip(marg, marg[1:]))


def test_mannwhitney_matches_scipy_free_ground_truth(spark, sf_dir):
    """Recompute U and z from raw rows with a plain-Python average-rank
    pass (independent of both engines' window machinery)."""
    out = QUERIES["stat_mannwhitney_u"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    c = {
        r.c_custkey: r.c_mktsegment
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    vals = [
        (0 if c[r.o_custkey] == "BUILDING" else 1, r.o_totalprice)
        for r in o
        if r.o_totalprice is not None
        and c.get(r.o_custkey) in ("BUILDING", "MACHINERY")
    ]
    vals.sort(key=lambda t: t[1])
    n = len(vals)
    # average ranks with ties
    ranks = {}
    i = 0
    tiesum = 0.0
    while i < n:
        j = i
        while j < n and vals[j][1] == vals[i][1]:
            j += 1
        t = j - i
        ranks[vals[i][1]] = (i + 1 + j) / 2.0
        tiesum += t**3 - t
        i = j
    r1 = sum(ranks[v] for g, v in vals if g == 0)
    n1 = sum(1 for g, v in vals if g == 0)
    n2 = n - n1
    u1 = r1 - n1 * (n1 + 1) / 2.0
    assert row.n_building == n1 and row.n_machinery == n2
    assert abs(row.rank_sum_building - r1) < 1e-6
    assert abs(row.u_building - u1) < 1e-6
    assert abs(row.u_building + row.u_machinery - n1 * n2) < 1e-6
    sigma = math.sqrt(n1 * n2 / 12.0 * ((n + 1) - tiesum / (n * (n - 1))))
    z = (u1 - n1 * n2 / 2.0) / sigma
    assert abs(row.z_score - z) < 1e-5


def test_welch_ttest_matches_numpy(spark, sf_dir):
    """t and the Welch-Satterthwaite df recomputed with numpy sample stats."""
    out = QUERIES["stat_welch_ttest"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    c = {
        r.c_custkey: r.c_mktsegment
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    a = np.array(
        [
            r.o_totalprice
            for r in o
            if r.o_totalprice is not None and c.get(r.o_custkey) == "BUILDING"
        ]
    )
    b = np.array(
        [
            r.o_totalprice
            for r in o
            if r.o_totalprice is not None and c.get(r.o_custkey) == "MACHINERY"
        ]
    )
    v1, v2 = a.var(ddof=1), b.var(ddof=1)
    se = v1 / len(a) + v2 / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se)
    df = se**2 / ((v1 / len(a)) ** 2 / (len(a) - 1) + (v2 / len(b)) ** 2 / (len(b) - 1))
    assert row.n_building == len(a) and row.n_machinery == len(b)
    assert abs(row.mean_building - a.mean()) < 1e-4
    assert abs(row.t_stat - t) < 1e-5
    assert abs(row.welch_df - df) < 1e-3


def test_spearman_bounds_and_ground_truth(spark, sf_dir):
    """rho in [-1, 1] per flag; one flag recomputed with a plain-Python
    average-rank Pearson (scipy-free)."""
    rows = {r.l_returnflag: r for r in QUERIES["stat_spearman_corr"](spark, sf_dir).collect()}
    assert rows
    for r in rows.values():
        assert -1.0 - 1e-9 <= r.spearman_rho <= 1.0 + 1e-9

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    flag = sorted(rows)[0]
    xy = [
        (r.l_quantity, r.l_extendedprice)
        for r in li
        if r.l_returnflag == flag
        and r.l_quantity is not None
        and r.l_extendedprice is not None
    ]

    def avg_ranks(vs):
        s = sorted(vs)
        pos = {}
        i = 0
        while i < len(s):
            j = i
            while j < len(s) and s[j] == s[i]:
                j += 1
            pos[s[i]] = (i + 1 + j) / 2.0
            i = j
        return [pos[v] for v in vs]

    rx = avg_ranks([x for x, _ in xy])
    ry = avg_ranks([y for _, y in xy])
    n = len(xy)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    rho = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert abs(rows[flag].spearman_rho - rho) < 1e-5


def test_conformal_ground_truth_and_marginal_coverage(spark, sf_dir):
    """qhat equals the exact ceil(0.9(n+1))-th calibration residual and
    coverage matches a plain-Python replay; pooled test coverage is near
    the nominal 90% (finite-sample slack for the small fixture)."""
    rows = {
        r.o_orderpriority: r
        for r in QUERIES["conformal_interval_coverage"](spark, sf_dir).collect()
    }
    assert rows
    o = [
        r
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
        if r.o_totalprice is not None and r.o_orderpriority is not None
    ]
    import hashlib

    def fold(k):
        return int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 5

    train = [r for r in o if fold(r.o_orderkey) <= 2]
    mu = {}
    for p in {r.o_orderpriority for r in train}:
        vs = [r.o_totalprice for r in train if r.o_orderpriority == p]
        mu[p] = sum(vs) / len(vs)
    cal = sorted(
        abs(r.o_totalprice - mu[r.o_orderpriority])
        for r in o
        if fold(r.o_orderkey) == 3 and r.o_orderpriority in mu
    )
    rank = min(math.ceil(0.9 * (len(cal) + 1)), len(cal))
    qhat = cal[rank - 1]
    test = [
        r for r in o if fold(r.o_orderkey) == 4 and r.o_orderpriority in mu
    ]
    covered = total = 0
    for p, row in rows.items():
        ts = [r for r in test if r.o_orderpriority == p]
        c = sum(1 for r in ts if abs(r.o_totalprice - mu[p]) <= qhat)
        assert row.n_test == len(ts)
        assert abs(row.qhat - qhat) < 1e-4
        assert abs(row.coverage - c / len(ts)) < 1e-6
        covered += c
        total += len(ts)
    assert 0.85 <= covered / total <= 0.97


def test_ks_test_ground_truth(spark, sf_dir):
    """KS D recomputed from the raw samples with a plain sorted-ECDF pass."""
    out = QUERIES["stat_ks_test"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    c = {
        r.c_custkey: r.c_mktsegment
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    a = sorted(
        r.o_totalprice
        for r in o
        if r.o_totalprice is not None and c.get(r.o_custkey) == "BUILDING"
    )
    b = sorted(
        r.o_totalprice
        for r in o
        if r.o_totalprice is not None and c.get(r.o_custkey) == "MACHINERY"
    )
    import bisect

    d = max(
        abs(
            bisect.bisect_right(a, v) / len(a)
            - bisect.bisect_right(b, v) / len(b)
        )
        for v in set(a) | set(b)
    )
    assert row.n_building == len(a) and row.n_machinery == len(b)
    assert abs(row.ks_d - d) < 1e-6
    scale = math.sqrt(len(a) * len(b) / (len(a) + len(b)))
    assert abs(row.ks_stat_scaled - d * scale) < 1e-4
    assert 0.0 <= row.ks_d <= 1.0


def test_mann_kendall_ground_truth(spark, sf_dir):
    """S, Var(S) and z recomputed from the daily series in plain Python."""
    from collections import Counter
    from decimal import Decimal

    out = QUERIES["stat_mann_kendall"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    daily = {}
    for r in o:
        if r.o_orderdate is None:
            continue
        d = r.o_orderdate.date()
        daily[d] = daily.get(d, Decimal(0)) + Decimal(str(round(r.o_totalprice, 2)))
    days = sorted(daily)
    vs = [daily[d] for d in days]
    n = len(vs)
    s = sum(
        (vs[j] > vs[i]) - (vs[j] < vs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(vs)
    tie_adj = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var_s = (n * (n - 1) * (2 * n + 5) - tie_adj) / 18.0
    z = (s - 1) / math.sqrt(var_s) if s > 0 else (s + 1) / math.sqrt(var_s) if s < 0 else 0.0
    assert row.n_days == n
    assert row.s_statistic == s
    assert abs(row.var_s - var_s) < 1e-3
    assert abs(row.z_score - z) < 1e-5


def test_chisq_independence_ground_truth(spark, sf_dir):
    """chi2, dof and Cramér's V recomputed from a plain contingency table."""
    out = QUERIES["stat_chisq_independence"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    c = {
        r.c_custkey: r.c_mktsegment
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    from collections import Counter

    cells = Counter(
        (c[r.o_custkey], r.o_orderpriority)
        for r in o
        if r.o_orderpriority is not None and c.get(r.o_custkey) is not None
    )
    n = sum(cells.values())
    rs = Counter()
    cs = Counter()
    for (s, p), v in cells.items():
        rs[s] += v
        cs[p] += v
    chi2 = sum(
        (cells[(s, p)] - rs[s] * cs[p] / n) ** 2 / (rs[s] * cs[p] / n)
        for s in rs
        for p in cs
        if cells[(s, p)]  # empty cells only matter if expected > 0 observed 0
    ) + sum(
        (0 - rs[s] * cs[p] / n) ** 2 / (rs[s] * cs[p] / n)
        for s in rs
        for p in cs
        if (s, p) not in cells
    )
    dof = (len(rs) - 1) * (len(cs) - 1)
    v = math.sqrt(chi2 / (n * min(len(rs) - 1, len(cs) - 1)))
    assert row.n_orders == n
    assert row.dof == dof
    # the engine sums only over OBSERVED cells; with every (seg, prio)
    # combination present in the fixture the two formulations agree
    assert abs(row.chi2 - chi2) < 1e-3
    assert abs(row.cramers_v - v) < 1e-5
    assert 0.0 <= row.cramers_v <= 1.0


def test_anova_ground_truth(spark, sf_dir):
    """F and eta^2 recomputed with numpy group stats."""
    out = QUERIES["stat_anova_oneway"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    c = {
        r.c_custkey: r.c_mktsegment
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    groups = {}
    for r in o:
        seg = c.get(r.o_custkey)
        if seg is not None and r.o_totalprice is not None:
            groups.setdefault(seg, []).append(r.o_totalprice)
    n = sum(len(g) for g in groups.values())
    k = len(groups)
    grand = sum(sum(g) for g in groups.values()) / n
    ssb = sum(len(g) * (np.mean(g) - grand) ** 2 for g in groups.values())
    ssw = sum(sum((x - np.mean(g)) ** 2 for x in g) for g in groups.values())
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row.n_orders == n and row.n_groups == k
    assert abs(row.f_stat - f) < 1e-4
    assert abs(row.eta_squared - ssb / (ssb + ssw)) < 1e-6


def test_weighted_median_ground_truth(spark, sf_dir):
    """Lower weighted median recomputed with a plain cumulative pass; it
    must sit at or below where the unweighted median would for bulk-cheap
    flags, and the crossing property holds exactly."""
    rows = {
        r.l_returnflag: r
        for r in QUERIES["lineitem_weighted_median"](spark, sf_dir).collect()
    }
    assert rows
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    for flag, r in rows.items():
        pairs = sorted(
            (x.l_extendedprice, x.l_quantity)
            for x in li
            if x.l_returnflag == flag
            and x.l_extendedprice is not None
            and x.l_quantity is not None
        )
        total = sum(w for _, w in pairs)
        acc = 0.0
        med = None
        for v, w in pairs:
            acc += w
            if acc >= total / 2.0:
                med = v
                break
        assert abs(r.weighted_median_price - round(med, 2)) < 1e-9
        assert abs(r.total_weight - total) < 1e-4


def test_kruskal_wallis_ground_truth(spark, sf_dir):
    """H and epsilon^2 recomputed with plain-Python average ranks."""
    out = QUERIES["stat_kruskal_wallis"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    groups = {}
    for r in o:
        if r.o_orderpriority is not None and r.o_totalprice is not None:
            groups.setdefault(r.o_orderpriority, []).append(r.o_totalprice)
    pooled = sorted(v for g in groups.values() for v in g)
    n = len(pooled)
    # average rank per distinct value
    rank = {}
    i = 0
    while i < n:
        j = i
        while j < n and pooled[j] == pooled[i]:
            j += 1
        rank[pooled[i]] = (i + 1 + j) / 2.0
        i = j
    k = len(groups)
    sumr2n = sum(sum(rank[v] for v in g) ** 2 / len(g) for g in groups.values())
    ties = {}
    for v in pooled:
        ties[v] = ties.get(v, 0) + 1
    tiesum = sum(t**3 - t for t in ties.values())
    h = ((12.0 / (n * (n + 1))) * sumr2n - 3.0 * (n + 1)) / (
        1.0 - tiesum / (n**3 - n)
    )
    eps2 = (h - k + 1) / (n - k)
    assert row.n_orders == n and row.n_groups == k
    assert abs(row.h_stat - h) < 1e-3
    assert abs(row.epsilon_squared - eps2) < 1e-6


def test_levene_brown_forsythe_ground_truth(spark, sf_dir):
    """W recomputed as plain ANOVA-F over |x - lower-median(group)|."""
    out = QUERIES["stat_levene_brown_forsythe"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    groups = {}
    for r in li:
        if r.l_returnflag is not None and r.l_extendedprice is not None:
            groups.setdefault(r.l_returnflag, []).append(r.l_extendedprice)
    z = {}
    for g, vals in groups.items():
        s = sorted(vals)
        med = s[(len(s) + 1) // 2 - 1]  # lower median, the query's contract
        z[g] = [abs(v - med) for v in vals]
    n = sum(len(v) for v in z.values())
    k = len(z)
    grand = sum(sum(v) for v in z.values()) / n
    ssb = sum(len(v) * (np.mean(v) - grand) ** 2 for v in z.values())
    ssw = sum(sum((x - np.mean(v)) ** 2 for x in v) for v in z.values())
    w = (ssb / (k - 1)) / (ssw / (n - k))
    assert row.n_items == n and row.n_groups == k
    assert abs(row.bf_w_stat - w) < 1e-3


def test_jarque_bera_ground_truth(spark, sf_dir):
    """Skewness, excess kurtosis and JB recomputed with numpy moments;
    the uniform quantity column must be strongly platykurtic (K < 0)."""
    rows = {r.l_returnflag: r for r in QUERIES["stat_jarque_bera"](spark, sf_dir).collect()}
    assert rows
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    groups = {}
    for r in li:
        if r.l_returnflag is not None and r.l_quantity is not None:
            groups.setdefault(r.l_returnflag, []).append(float(r.l_quantity))
    assert set(rows) == set(groups)
    for flag, vals in groups.items():
        x = np.asarray(vals)
        n = len(x)
        m2 = ((x - x.mean()) ** 2).mean()
        m3 = ((x - x.mean()) ** 3).mean()
        m4 = ((x - x.mean()) ** 4).mean()
        s = m3 / m2**1.5
        kurt = m4 / m2**2 - 3.0
        jb = n / 6.0 * (s * s + kurt * kurt / 4.0)
        r = rows[flag]
        assert r.n_items == n
        assert abs(r.skewness - s) < 1e-4
        assert abs(r.excess_kurtosis - kurt) < 1e-4
        assert abs(r.jb_stat - jb) < max(1e-3, abs(jb) * 1e-4)
        assert r.excess_kurtosis < 0  # uniform-ish quantity: platykurtic


def test_cohens_kappa_ground_truth(spark, sf_dir):
    """Contingency counts and kappa recomputed with Python re module."""
    import re

    out = QUERIES["stat_cohens_kappa"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    n = a1 = b1 = n11 = n00 = 0
    for r in docs:
        text = r.text or ""
        a = 1 if len(text) >= 150 else 0
        toks = re.findall(r"[a-z']+", text.lower())
        b = 1 if toks and 100 * len(set(toks)) >= 55 * len(toks) else 0
        n += 1
        a1 += a
        b1 += b
        n11 += a * b
        n00 += (1 - a) * (1 - b)
    pe_num = a1 * b1 + (n - a1) * (n - b1)
    kappa = (n * (n11 + n00) - pe_num) / (n * n - pe_num)
    assert row.n_docs == n
    assert row.n_both_pass == n11 and row.n_both_fail == n00
    assert abs(row.observed_agreement - (n11 + n00) / n) < 1e-6
    assert abs(row.kappa - kappa) < 1e-6
    assert -1.0 <= row.kappa <= 1.0


def test_t_closeness_ground_truth(spark, sf_dir):
    """Per-class TVD recomputed with exact Python fractions."""
    rows = QUERIES["dq_t_closeness"](spark, sf_dir).collect()
    assert rows
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    import math as _math

    obs = [
        (r.c_nationkey, r.c_mktsegment, _math.floor((r.c_acctbal or 0.0) / 2000))
        for r in cust
    ]
    n = len(obs)
    from collections import Counter

    cls = Counter((nk, seg) for nk, seg, _ in obs)
    sv = Counter(s for _, _, s in obs)
    cs = Counter(obs)
    got = {(r.c_nationkey, r.c_mktsegment): r for r in rows}
    assert set(got) == set(cls)
    for key, nc in cls.items():
        sdiff = sum(
            abs(cs.get((key[0], key[1], s), 0) * n - ns * nc) for s, ns in sv.items()
        )
        tvd = sdiff / (2.0 * nc * n)
        r = got[key]
        assert r.group_size == nc
        assert abs(r.tvd - tvd) < 1e-6
        assert r.is_t_close == (1 if tvd <= 0.2 else 0)
        assert 0.0 <= r.tvd <= 1.0


def test_histogram_quantile_within_bin_bound(spark, sf_dir):
    """The bin-lower-bound estimate must sit at or below the exact order
    statistic and within the 1% relative bound the 3-digit bins guarantee
    by construction; the exact column is recomputed in Python."""
    rows = QUERIES["histogram_quantile_portable"](spark, sf_dir).collect()
    assert rows
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    groups = {}
    for r in li:
        if r.l_extendedprice is not None and r.l_extendedprice >= 100:
            groups.setdefault(r.l_returnflag, []).append(r.l_extendedprice)
    for r in rows:
        vals = sorted(groups[r.l_returnflag])
        n = len(vals)
        exact50 = vals[(n + 1) // 2 - 1]
        exact95 = vals[(19 * n + 19) // 20 - 1]
        assert abs(r.exact_p50 - round(exact50, 2)) < 1e-9
        assert abs(r.exact_p95 - round(exact95, 2)) < 1e-9
        assert r.est_p50 <= r.exact_p50 and r.est_p95 <= r.exact_p95
        assert r.rel_err_p50 <= 0.01 and r.rel_err_p95 <= 0.01


def test_poisson_rate_ground_truth(spark, sf_dir):
    """Counts, exposures and z recomputed with Python isoweekday."""
    out = QUERIES["events_poisson_rate_test"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    kwe = kwd = 0
    dwe, dwd = set(), set()
    for r in ev:
        if r.ts is None:
            continue
        weekend = r.ts.isoweekday() in (6, 7)
        (dwe if weekend else dwd).add(r.ts.date())
        if r.event_type == "purchase":
            if weekend:
                kwe += 1
            else:
                kwd += 1
    twe, twd = len(dwe), len(dwd)
    z = (kwe / twe - kwd / twd) / math.sqrt(kwe / twe**2 + kwd / twd**2)
    assert row.n_weekend_purchases == kwe and row.n_weekday_purchases == kwd
    assert row.weekend_days == twe and row.weekday_days == twd
    assert abs(row.weekend_rate - kwe / twe) < 1e-6
    assert abs(row.weekday_rate - kwd / twd) < 1e-6
    assert abs(row.z_score - z) < 1e-5


def test_fleiss_kappa_ground_truth(spark, sf_dir):
    """Vote counts and kappa recomputed with the Python re module."""
    import re

    out = QUERIES["stat_fleiss_kappa"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    n = s1 = s_pp = 0
    for d in docs:
        text = d.text or ""
        toks = re.findall(r"[a-z']+", text.lower())
        votes = (
            (1 if len(text) >= 150 else 0)
            + (1 if toks and 100 * len(set(toks)) >= 55 * len(toks) else 0)
            + (1 if sum(len(t) for t in toks) >= 4 * len(toks) else 0)
        )
        n += 1
        s1 += votes
        s_pp += votes * votes + (3 - votes) * (3 - votes)
    pbar = (s_pp - 3 * n) / (6 * n)
    p_pass = s1 / (3 * n)
    p_fail = (3 * n - s1) / (3 * n)  # the query's form, not 1 - p_pass:
    # the two differ in last ulps and the small 1 - Pe denominator
    # amplifies that past 1e-6 on a high-agreement fixture
    pe = p_pass * p_pass + p_fail * p_fail
    kappa = (pbar - pe) / (1 - pe)
    assert row.n_docs == n and row.n_pass_votes == s1
    assert abs(row.observed_agreement - pbar) < 1e-6
    assert abs(row.expected_agreement - pe) < 1e-6
    assert abs(row.fleiss_kappa - kappa) < 5e-6


def test_column_entropy_ground_truth(spark, sf_dir):
    """Entropy, distinct counts and max-frequency ratio recomputed with
    Counter + math.log; entropy must sit in [0, ln(n_distinct)]."""
    from collections import Counter

    rows = {r.col_name: r for r in QUERIES["dq_column_entropy"](spark, sf_dir).collect()}
    assert set(rows) == {
        "l_returnflag",
        "l_linestatus",
        "o_orderstatus",
        "o_orderpriority",
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    for col, data in (
        ("l_returnflag", li),
        ("l_linestatus", li),
        ("o_orderstatus", o),
        ("o_orderpriority", o),
    ):
        cnt = Counter(getattr(r, col) for r in data if getattr(r, col) is not None)
        n = sum(cnt.values())
        h = math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n
        r = rows[col]
        assert r.n_rows == n and r.n_distinct == len(cnt)
        assert abs(r.max_freq_ratio - max(cnt.values()) / n) < 1e-6
        assert abs(r.shannon_entropy_nats - h) < 1e-5
        assert -1e-9 <= r.shannon_entropy_nats <= math.log(len(cnt)) + 1e-9


def test_cohort_ltv_ground_truth(spark, sf_dir):
    """Cohorts, cumulative revenue and per-user LTV recomputed in Python
    (ISO-Monday weeks); cumulative revenue must be nondecreasing in age."""
    import datetime as dt
    from collections import defaultdict

    rows = QUERIES["events_cohort_ltv"](spark, sf_dir).collect()
    assert rows
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    first = {}
    for r in ev:
        if r.ts is None or r.user_id is None:
            continue
        d = r.ts.date()
        if r.user_id not in first or d < first[r.user_id]:
            first[r.user_id] = d
    cohort = {
        u: d - dt.timedelta(days=d.weekday()) for u, d in first.items()
    }
    sizes = defaultdict(int)
    for u in cohort.values():
        sizes[u] += 1
    weekly = defaultdict(float)
    for r in ev:
        if r.ts is None or r.event_type != "purchase" or r.value is None:
            continue
        if r.user_id not in cohort:
            continue
        c = cohort[r.user_id]
        age = (r.ts.date() - c).days // 7
        weekly[(c, age)] += round(r.value, 6)
    got = {(r.cohort_week, r.age_week): r for r in rows}
    assert set(got) == set(weekly)
    for (c, age), r in got.items():
        cum = sum(v for (cc, a), v in weekly.items() if cc == c and a <= age)
        assert r.cohort_users == sizes[c]
        assert abs(r.cum_revenue - cum) < 1e-4
        assert abs(r.ltv_per_user - round(cum / sizes[c], 6)) < 1e-4
    for c in {k[0] for k in got}:
        ages = sorted(a for cc, a in got if cc == c)
        vals = [got[(c, a)].cum_revenue for a in ages]
        assert vals == sorted(vals)


def test_iqr_outlier_report_ground_truth(spark, sf_dir):
    """Quartiles (lower order statistics), fences and outlier counts
    recomputed in plain Python."""
    rows = {r.l_returnflag: r for r in QUERIES["dq_outlier_iqr_report"](spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    groups = {}
    for r in li:
        if r.l_extendedprice is not None:
            groups.setdefault(r.l_returnflag, []).append(r.l_extendedprice)
    assert set(rows) == set(groups)
    for flag, vals in groups.items():
        s = sorted(vals)
        n = len(s)
        q1 = s[(n + 3) // 4 - 1]
        q3 = s[(3 * n + 3) // 4 - 1]
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        out = sum(1 for v in vals if v < lo or v > hi)
        r = rows[flag]
        assert r.n_items == n
        assert abs(r.q1 - round(q1, 2)) < 1e-9 and abs(r.q3 - round(q3, 2)) < 1e-9
        assert r.n_outliers == out
        assert abs(r.outlier_rate - round(out / n, 6)) < 1e-9


def test_freshness_lag_ground_truth(spark, sf_dir):
    """Latest marks and lags recomputed from raw maxima; the fleet-newest
    table must report lag 0 and fresh."""
    rows = {r.tbl: r for r in QUERIES["dq_freshness_lag_report"](spark, sf_dir).collect()}
    assert set(rows) == {"orders", "lineitem", "events"}
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .agg(F.max(F.col("o_orderdate").cast("date")))
        .first()[0]
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .agg(F.max(F.col("l_shipdate").cast("date")))
        .first()[0]
    )
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .agg(F.max(F.col("ts").cast("date")))
        .first()[0]
    )
    marks = {"orders": o, "lineitem": li, "events": ev}
    now = max(marks.values())
    for t, latest in marks.items():
        r = rows[t]
        assert r.latest == latest
        assert r.lag_days == (now - latest).days
        assert r.is_fresh == (1 if r.lag_days <= 35 else 0)
    assert min(r.lag_days for r in rows.values()) == 0


def test_pinball_loss_ground_truth(spark, sf_dir):
    """Split, predictors and pinball means recomputed with hashlib; the
    P90 predictor must sit at or above the P50 predictor."""
    import hashlib as hl

    rows = {r.l_returnflag: r for r in QUERIES["forecast_pinball_loss"](spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    tr, te = {}, {}
    for r in li:
        if r.l_extendedprice is None:
            continue
        h = hl.md5(f"{r.l_orderkey}:{r.l_linenumber}".encode()).hexdigest()[0]
        (tr if h in "01234567" else te).setdefault(r.l_returnflag, []).append(
            r.l_extendedprice
        )
    assert set(rows) == set(te)
    for flag, test_vals in te.items():
        s = sorted(tr[flag])
        n = len(s)
        p50 = s[(n + 1) // 2 - 1]
        p90 = s[(9 * n + 9) // 10 - 1]
        pin50 = sum(
            round(0.5 * (y - p50), 6) if y >= p50 else round(0.5 * (p50 - y), 6)
            for y in test_vals
        ) / len(test_vals)
        pin90 = sum(
            round(0.9 * (y - p90), 6) if y >= p90 else round(0.1 * (p90 - y), 6)
            for y in test_vals
        ) / len(test_vals)
        r = rows[flag]
        assert r.n_train == n and r.n_test == len(test_vals)
        assert abs(r.pred_p50 - round(p50, 2)) < 1e-9
        assert abs(r.pred_p90 - round(p90, 2)) < 1e-9
        assert r.pred_p90 >= r.pred_p50
        assert abs(r.pinball_p50 - pin50) < 1e-4
        assert abs(r.pinball_p90 - pin90) < 1e-4


def test_permutation_test_ground_truth(spark, sf_dir):
    """The full 64-replicate randomization replayed with hashlib; the
    p-value is the add-one estimator and sits in (0, 1]."""
    import hashlib as hl
    from collections import defaultdict

    out = QUERIES["stat_permutation_test"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    daily = defaultdict(float)
    for r in o:
        if r.o_orderdate is not None and r.o_totalprice is not None:
            daily[r.o_orderdate.date()] += r.o_totalprice
    days = sorted(daily)
    lo, hi = days[0], days[-1]
    span = (hi - lo).days

    def diff(groups):
        a = [daily[d] for d in days if groups(d)]
        b = [daily[d] for d in days if not groups(d)]
        return sum(a) / len(a) - sum(b) / len(b)

    obs = diff(lambda d: (d - lo).days * 2 <= span)
    n_ext = 0
    for b in range(64):
        stat = diff(
            lambda d, bb=b: hl.md5(f"{d.isoformat()}:{bb}".encode()).hexdigest()[0]
            in "02468ace"
        )
        if abs(stat) >= abs(obs):
            n_ext += 1
    assert row.n_days == len(days)
    assert abs(row.obs_diff - obs) < max(1e-3, abs(obs) * 1e-6)
    assert row.n_extreme == n_ext
    assert abs(row.p_value - round((1 + n_ext) / 65.0, 6)) < 1e-9
    assert 0 < row.p_value <= 1


def test_tost_equivalence_ground_truth(spark, sf_dir):
    """TOST recomputed in plain Python: Welch SE from exact sums, both
    one-sided t statistics, the equivalence verdict."""
    import math

    out = QUERIES["stat_tost_equivalence"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    groups = {0: [], 1: []}
    for r in li:
        if r.l_linestatus in ("F", "O") and r.l_extendedprice is not None:
            groups[0 if r.l_linestatus == "F" else 1].append(r.l_extendedprice)
    n1, n2 = len(groups[0]), len(groups[1])
    m1, m2 = sum(groups[0]) / n1, sum(groups[1]) / n2
    v1 = (sum(x * x for x in groups[0]) - n1 * m1 * m1) / (n1 - 1)
    v2 = (sum(x * x for x in groups[1]) - n2 * m2 * m2) / (n2 - 1)
    se = math.sqrt(v1 / n1 + v2 / n2)
    margin = 0.005 * (sum(groups[0]) + sum(groups[1])) / (n1 + n2)
    tl = ((m1 - m2) + margin) / se
    tu = (margin - (m1 - m2)) / se
    assert row.n_f == n1 and row.n_o == n2
    assert abs(row.mean_diff - (m1 - m2)) < 1e-3
    assert abs(row.margin - margin) < 1e-3
    assert abs(row.t_lower - tl) < 1e-3
    assert abs(row.t_upper - tu) < 1e-3
    assert row.is_equivalent == int(tl > 1.644854 and tu > 1.644854)


def test_mcnemar_ground_truth(spark, sf_dir):
    """Discordant-pair counts and the continuity-corrected statistic
    recomputed per user from raw events."""
    from collections import defaultdict

    out = QUERIES["stat_mcnemar_test"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    secs = [
        int(r.ts.timestamp())
        for r in ev
        if r.event_type == "purchase" and r.ts is not None and r.user_id is not None
    ]
    cut = (min(secs) + max(secs)) // 2
    per = defaultdict(lambda: [0, 0])
    for r in ev:
        if r.event_type == "purchase" and r.ts is not None and r.user_id is not None:
            sec = int(r.ts.timestamp())
            per[r.user_id][0 if sec < cut else 1] = 1
    b = sum(1 for p in per.values() if p == [1, 0])
    c = sum(1 for p in per.values() if p == [0, 1])
    both = sum(1 for p in per.values() if p == [1, 1])
    stat = ((abs(b - c) - 1.0) ** 2 / (b + c)) if (b + c) else 0.0
    assert row.n_users == len(per)
    assert row.n_both == both
    assert row.n_pre_only == b and row.n_post_only == c
    assert abs(row.mcnemar_stat - stat) < 1e-5
    assert row.is_significant == int(stat > 3.841459)


def test_cochran_armitage_ground_truth(spark, sf_dir):
    """Trend z recomputed from the closed form over raw orders."""
    import math

    out = QUERIES["stat_cochran_armitage"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    obs = [
        (int(r.o_orderpriority[0]), 1 if r.o_orderstatus == "F" else 0)
        for r in o
        if r.o_orderpriority is not None and r.o_orderstatus is not None
    ]
    n = len(obs)
    rr = sum(y for _, y in obs)
    t1 = sum(s * y for s, y in obs)
    t2 = sum(s for s, _ in obs)
    t3 = sum(s * s for s, _ in obs)
    pbar = rr / n
    var = pbar * (1 - pbar) * (t3 - t2 * t2 / n)
    z = (t1 - pbar * t2) / math.sqrt(var)
    assert row.n_orders == n and row.n_final == rr
    assert abs(row.p_pool - pbar) < 1e-6
    assert abs(row.z_trend - z) < 1e-4
    assert row.is_significant == int(abs(z) > 1.959964)


def test_woe_iv_ground_truth(spark, sf_dir):
    """WoE/IV recomputed per fixed-width band; the total IV is the sum of
    the 9-rounded contributions."""
    import math
    from collections import defaultdict

    rows = {r.bin: r for r in QUERIES["feature_woe_iv"](spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    per = defaultdict(lambda: [0, 0])
    for r in li:
        if r.l_extendedprice is not None and r.l_returnflag is not None:
            b = min(int(r.l_extendedprice // 11000), 9)
            per[b][0] += 1
            per[b][1] += 1 if r.l_returnflag == "R" else 0
    tp = sum(v[1] for v in per.values())
    tn = sum(v[0] - v[1] for v in per.values())
    ivcs = {}
    for b, (nb, np_) in per.items():
        gs = (np_ + 0.5) / (tp + 5.0)
        bs = (nb - np_ + 0.5) / (tn + 5.0)
        woe = math.log(gs / bs)
        ivcs[b] = round((gs - bs) * woe, 9)
        r = rows[b]
        assert r.n_rows == nb and r.n_pos == np_ and r.n_neg == nb - np_
        assert abs(r.woe - woe) < 1e-5
        assert abs(r.iv_contrib - ivcs[b]) < 1e-5
    total = round(sum(ivcs.values()), 6)
    assert set(rows) == set(per)
    for r in rows.values():
        assert abs(r.iv_total - total) < 1e-6


def test_contract_validation_ground_truth(spark, sf_dir):
    """Every rule's checked/violation counts recomputed from raw rows."""
    rows = {r.rule_id: r for r in QUERIES["dq_contract_validation"](spark, sf_dir).collect()}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    okeys = [r.o_orderkey for r in o]
    assert rows[1].n_checked == len(o)
    assert rows[1].n_violations == sum(
        1 for r in o if r.o_totalprice is None or r.o_totalprice <= 0
    )
    assert rows[2].n_violations == sum(1 for r in o if r.o_orderdate is None)
    assert rows[3].n_violations == sum(
        1 for r in o if r.o_orderstatus not in ("F", "O", "P")
    )
    assert rows[4].n_violations == len(okeys) - len(set(okeys))
    assert rows[5].n_checked == len(li)
    assert rows[5].n_violations == sum(
        1 for r in li if r.l_quantity is None or not (1 <= r.l_quantity <= 50)
    )
    oset = set(okeys)
    assert rows[6].n_violations == sum(1 for r in li if r.l_orderkey not in oset)
    pairs = [(r.l_orderkey, r.l_linenumber) for r in li]
    assert rows[7].n_violations == len(pairs) - len(set(pairs))
    assert set(rows) == set(range(1, 8))


def test_friedman_ground_truth(spark, sf_dir):
    """Friedman Q recomputed from scratch: month × priority cell means,
    within-month ranks, the closed-form statistic."""
    from collections import defaultdict

    out = QUERIES["stat_friedman_test"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    cells = defaultdict(lambda: [0.0, 0])
    for r in o:
        if (
            r.o_orderdate is not None
            and r.o_orderpriority is not None
            and r.o_totalprice is not None
        ):
            key = (r.o_orderdate.month, r.o_orderpriority)
            cells[key][0] += r.o_totalprice
            cells[key][1] += 1
    blocks = sorted({b for b, _ in cells})
    trts = sorted({t for _, t in cells})
    n, k = len(blocks), len(trts)
    rsum = {t: 0.0 for t in trts}
    for b in blocks:
        vals = sorted(
            (round(cells[(b, t)][0] / cells[(b, t)][1], 6), t) for t in trts
        )
        for i, (_, t) in enumerate(vals, 1):
            rsum[t] += i
    srq = sum(v * v for v in rsum.values()) / n
    q = (12.0 / (k * (k + 1.0))) * srq - 3.0 * n * (k + 1.0)
    assert row.n_blocks == n and row.n_treatments == k
    assert abs(row.q_stat - q) < 1e-4
    assert row.is_significant == int(q > 9.487729)


def test_dp_noised_count_ground_truth(spark, sf_dir):
    """The deterministic Laplace draw replayed with hashlib; the noised
    count must be count + inverse-CDF noise exactly."""
    import hashlib as hl
    import math
    from collections import Counter

    rows = {r.source: r for r in QUERIES["dp_noised_count_report"](spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    counts = Counter(d.source for d in docs if d.source is not None)
    assert set(rows) == set(counts)
    for s, n in counts.items():
        u = (int(hl.md5(f"dp:{s}".encode()).hexdigest()[:8], 16) + 0.5) / 4294967296.0
        noise = -1.0 * math.copysign(1.0, u - 0.5) * math.log(1.0 - 2.0 * abs(u - 0.5))
        r = rows[s]
        assert r.n_docs == n and r.epsilon == 1.0
        assert abs(r.noise - round(noise, 6)) < 1e-9
        assert abs(r.noised_count - round(n + noise, 6)) < 1e-9


def test_label_propagation_ground_truth(spark, sf_dir):
    """4 synchronous LPA rounds replayed in plain Python over the same
    co-purchase edge set; community histogram must match exactly."""
    from collections import Counter, defaultdict

    out = {r.community: (r.n_parts, r.sum_parts)
           for r in QUERIES["graph_label_propagation"](spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    pair_count = Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_count[(ps[i], ps[j])] += 1
    nbrs = defaultdict(list)
    for (a, b), c in pair_count.items():
        if c >= 2:
            nbrs[a].append(b)
            nbrs[b].append(a)
    lab = {w: w for w in nbrs}
    for _ in range(4):
        new = {}
        for w, ns in nbrs.items():
            votes = Counter(lab[x] for x in ns)
            new[w] = min(votes, key=lambda l: (-votes[l], l))
        lab = new
    want = defaultdict(lambda: [0, 0])
    for w, l in lab.items():
        want[l][0] += 1
        want[l][1] += w
    assert out == {l: (c, s) for l, (c, s) in want.items()}


def test_bartlett_ground_truth(spark, sf_dir):
    """Bartlett T recomputed from per-group sufficient statistics."""
    import math
    from collections import defaultdict

    out = QUERIES["stat_bartlett_test"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    groups = defaultdict(list)
    for r in o:
        if r.o_orderpriority is not None and r.o_totalprice is not None:
            groups[r.o_orderpriority].append(r.o_totalprice)
    k = len(groups)
    nn = sum(len(v) for v in groups.values())
    ssw = sum_ln = sum_inv = 0.0
    for v in groups.values():
        n = len(v)
        m = sum(v) / n
        s2 = (sum(x * x for x in v) - n * m * m) / (n - 1)
        ssw += (n - 1) * s2
        sum_ln += (n - 1) * math.log(s2)
        sum_inv += 1.0 / (n - 1)
    sp2 = ssw / (nn - k)
    t = ((nn - k) * math.log(sp2) - sum_ln) / (
        1.0 + (sum_inv - 1.0 / (nn - k)) / (3.0 * (k - 1))
    )
    assert row.n_orders == nn and row.n_groups == k
    assert abs(row.pooled_var - sp2) < max(1.0, sp2 * 1e-6)
    assert abs(row.t_stat - t) < 1e-3
    assert row.is_significant == int(t > 9.487729)


def test_dedup_survivorship_ground_truth(spark, sf_dir):
    """Keeper policy and cross-source loss accounting replayed in Python."""
    import hashlib as hl
    from collections import defaultdict

    rows = {r.source: r for r in QUERIES["dedup_survivorship_report"](spark, sf_dir).collect()}
    docs = [
        d
        for d in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        if d.text is not None and d.source is not None
    ]
    keeper = {}
    for d in docs:
        h = hl.sha256(d.text.encode()).hexdigest()
        if h not in keeper or d.doc_id < keeper[h][0]:
            keeper[h] = (d.doc_id, d.source)
    want = defaultdict(lambda: [0, 0, 0, 0])
    for d in docs:
        h = hl.sha256(d.text.encode()).hexdigest()
        kid, ksrc = keeper[h]
        w = want[d.source]
        w[0] += 1
        if d.doc_id == kid:
            w[1] += 1
        else:
            w[2] += 1
            if ksrc != d.source:
                w[3] += 1
    assert set(rows) == set(want)
    for s, (nd, ns, nr, nl) in want.items():
        r = rows[s]
        assert (r.n_docs, r.n_survivors, r.n_removed, r.n_lost_to_other_source) == (
            nd, ns, nr, nl
        )


def test_contrastive_pairs_ground_truth(spark, sf_dir):
    """Hard-negative/positive mining recomputed with NumPy cosines."""
    import numpy as np

    out = QUERIES["contrastive_pair_mining"](spark, sf_dir).collect()
    emb = {
        r.vec_id: (int(r.label), np.asarray(r.embedding, dtype=np.float64))
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
        if r.embedding is not None and r.label is not None
    }
    want = {}
    for q in [i for i in emb if i < 3]:
        ql, qv = emb[q]
        qn = np.linalg.norm(qv)
        cands = {"pos": [], "neg": []}
        for i, (l, v) in emb.items():
            if i == q:
                continue
            sim = round(float(qv @ v / (qn * np.linalg.norm(v))), 6)
            cands["pos" if l == ql else "neg"].append((-sim, i))
        for kind, lst in cands.items():
            for rk, (nsim, i) in enumerate(sorted(lst)[:2], 1):
                want[(q, kind, rk)] = (i, -nsim, ql)
    assert len(out) == len(want)
    for r in out:
        wi, ws, wl = want[(r.anchor_id, r.kind, r.rank_pos)]
        assert r.cand_id == wi and r.anchor_label == wl
        assert abs(r.sim - ws) < 2e-6


def test_markov_attribution_ground_truth(spark, sf_dir):
    """Journeys, transition matrix, 12-step absorption for the full and
    every removal chain replayed in plain Python; removal effects and
    shares must match within float-replay tolerance."""
    from collections import Counter, defaultdict

    out = {r.channel: r for r in QUERIES["events_markov_attribution"](spark, sf_dir).collect()}
    ev = [
        r
        for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        if r.event_type is not None and r.user_id is not None
    ]
    by_user = defaultdict(list)
    purchasers = set()
    for r in ev:
        if r.event_type == "purchase":
            purchasers.add(r.user_id)
        else:
            by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    bi = Counter()
    for u, lst in by_user.items():
        lst.sort()
        types = [t for _, _, t in lst]
        bi[("START", types[0])] += 1
        for a, b in zip(types, types[1:]):
            bi[(a, b)] += 1
        bi[(types[-1], "CONV" if u in purchasers else "NULL")] += 1
    tot = Counter()
    for (s, _), c in bi.items():
        tot[s] += c
    pr = {(s, d): c / tot[s] for (s, d), c in bi.items()}
    channels = sorted({s for s, _ in pr if s != "START"})

    def pconv(removed=None):
        trans = defaultdict(dict)
        for (s, d), p in pr.items():
            if removed is not None and s == removed:
                continue
            d2 = "NULL" if d == removed else d
            trans[s][d2] = trans[s].get(d2, 0.0) + p
        for a in ("CONV", "NULL"):
            trans[a] = {a: 1.0}
        pi = {"START": 1.0}
        for _ in range(12):
            nxt = defaultdict(float)
            for s, mass in pi.items():
                for d, p in trans.get(s, {}).items():
                    nxt[d] += mass * p
            pi = dict(nxt)
        return pi.get("CONV", 0.0)

    full = pconv()
    effs = {c: round(1.0 - pconv(c) / full, 9) for c in channels}
    se = sum(effs.values())
    assert set(out) == set(channels)
    for c in channels:
        r = out[c]
        assert abs(r.p_conv_full - round(full, 6)) < 1e-5
        assert abs(r.p_conv_removed - round(pconv(c), 6)) < 1e-5
        assert abs(r.removal_effect - round(effs[c], 6)) < 1e-5
        assert abs(r.attribution_share - round(effs[c] / se, 6)) < 1e-5


def test_zorder_cluster_ground_truth(spark, sf_dir):
    """Morton interleave, banding, footer stats and the skip fraction
    replayed in plain Python."""
    from collections import defaultdict

    rows = {r.band: r for r in QUERIES["storage_zorder_cluster"](spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()

    def zval(p, s):
        z = 0
        for b in range(16):
            z += (((p >> b) & 1) << (2 * b + 1)) + (((s >> b) & 1) << (2 * b))
        return z

    import math

    zs = [
        (zval(r.l_partkey, r.l_suppkey), r.l_partkey, r.l_suppkey)
        for r in li
        if r.l_partkey is not None and r.l_suppkey is not None
    ]
    zmax = max(z for z, _, _ in zs)
    bands = defaultdict(list)
    for z, p, s in zs:
        bands[math.floor(z * 64.0 / (zmax + 1.0))].append((p, s))
    total = sum(len(v) for v in bands.values())
    skipped = sum(
        len(v) for v in bands.values() if min(p for p, _ in v) > 127
    )
    assert set(rows) == set(bands)
    for b, v in bands.items():
        r = rows[b]
        ps = [p for p, _ in v]
        ss = [s for _, s in v]
        assert r.n_rows == len(v)
        assert (r.min_partkey, r.max_partkey) == (min(ps), max(ps))
        assert (r.min_suppkey, r.max_suppkey) == (min(ss), max(ss))
        assert r.prunable == int(min(ps) > 127)
        assert abs(r.frac_rows_skipped - round(skipped / total, 6)) < 1e-9
    # the whole point of z-order: SOME band must be prunable for the
    # partkey hot-range even though the table is not sorted by partkey
    assert any(r.prunable for r in rows.values())


def test_pass_at_k_ground_truth(spark, sf_dir):
    """Unbiased pass@k recomputed with exact integer combinatorics
    (math.comb) — the unrolled-ratio form must agree."""
    from collections import defaultdict
    from math import comb

    out = QUERIES["eval_pass_at_k"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    per = defaultdict(lambda: [0, 0])
    for r in o:
        if r.o_custkey is not None and r.o_orderstatus is not None:
            per[r.o_custkey][0] += 1
            per[r.o_custkey][1] += 1 if r.o_orderstatus == "F" else 0
    probs1, probs5 = [], []
    for n, c in per.values():
        if n >= 5:
            probs1.append(c / n)
            probs5.append(1.0 - comb(n - c, 5) / comb(n, 5) if n - c >= 5 else 1.0)
    assert row.n_problems == len(probs5)
    assert abs(row.avg_pass_at_1 - sum(probs1) / len(probs1)) < 1e-6
    assert abs(row.avg_pass_at_5 - sum(probs5) / len(probs5)) < 1e-6
    assert 0.0 <= row.avg_pass_at_1 <= row.avg_pass_at_5 <= 1.0


def test_mase_backtest_ground_truth(spark, sf_dir):
    """The 80/20 split, both forecasters and the MASE scale replayed in
    plain Python on the daily series."""
    from collections import defaultdict
    import datetime

    rows = {r.method: r for r in QUERIES["forecast_mase_backtest"](spark, sf_dir).collect()}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    daily = defaultdict(float)
    for r in o:
        if r.o_orderdate is not None and r.o_totalprice is not None:
            daily[r.o_orderdate.date()] += round(r.o_totalprice, 6)
    days = sorted(daily)
    nd = len(days)
    train = {d for i, d in enumerate(days, 1) if i * 5 <= nd * 4}
    test = [d for d in days if d not in train]
    wk = datetime.timedelta(days=7)
    scale_diffs = [
        abs(daily[d] - daily[d - wk]) for d in train if d - wk in daily and d - wk in train
    ]
    s = sum(scale_diffs) / len(scale_diffs)
    sn_err = [abs(daily[d] - daily[d - wk]) for d in test if d - wk in daily]
    mu = sum(daily[d] for d in train) / len(train)
    gm_err = [abs(daily[d] - mu) for d in test]
    r1, r2 = rows["seasonal_naive_7d"], rows["train_mean"]
    assert r1.n_test == len(sn_err) and r2.n_test == len(gm_err)
    assert abs(r1.mae - sum(sn_err) / len(sn_err)) < 1e-3
    assert abs(r2.mae - sum(gm_err) / len(gm_err)) < 1e-3
    assert abs(r1.mase - (sum(sn_err) / len(sn_err)) / s) < 1e-5
    assert abs(r2.mase - (sum(gm_err) / len(gm_err)) / s) < 1e-5


def test_top_paths_ground_truth(spark, sf_dir):
    """Path strings, conversion counts and the top-20 ranking replayed in
    plain Python."""
    from collections import defaultdict

    out = {r.rank_pos: r for r in QUERIES["events_top_paths"](spark, sf_dir).collect()}
    ev = [
        r
        for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        if r.event_type is not None and r.user_id is not None
    ]
    by_user = defaultdict(list)
    purchasers = set()
    for r in ev:
        if r.event_type == "purchase":
            purchasers.add(r.user_id)
        else:
            by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    per = defaultdict(lambda: [0, 0])
    for u, lst in by_user.items():
        lst.sort()
        path = ">".join(t for _, _, t in lst[:8])
        per[path][0] += 1
        per[path][1] += 1 if u in purchasers else 0
    ranked = sorted(per.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    assert len(out) == min(20, len(per))
    for rk, (path, (n, c)) in enumerate(ranked, 1):
        r = out[rk]
        assert r.path == path and r.n_users == n and r.n_converted == c
        assert abs(r.conv_rate - round(c / n, 6)) < 1e-9


def test_sprt_ground_truth(spark, sf_dir):
    """The day-by-day LLR walk and the first boundary crossing replayed
    in plain Python."""
    import math
    from collections import defaultdict

    out = QUERIES["stat_sprt_sequential"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    daily = defaultdict(lambda: [0, 0])
    for r in o:
        if r.o_orderdate is not None and r.o_orderpriority is not None:
            d = daily[r.o_orderdate.date()]
            d[0] += 1
            d[1] += 1 if r.o_orderpriority == "1-URGENT" else 0
    w1, w0 = math.log(0.22 / 0.18), math.log(0.78 / 0.82)
    a, b = math.log(19.0), math.log(1 / 19.0)
    llr, hit_day, hit_llr = 0.0, None, None
    for day in sorted(daily):
        n, u = daily[day]
        llr += u * w1 + (n - u) * w0
        if hit_day is None and (llr >= a or llr <= b):
            hit_day, hit_llr = day, llr
    assert row.n_days == len(daily)
    assert abs(row.llr_final - llr) < 1e-4
    if hit_day is None:
        assert row.decision == "continue" and row.decision_day is None
    else:
        assert row.decision_day == hit_day
        assert row.decision == ("accept_h1" if hit_llr >= a else "accept_h0")
        assert abs(row.llr_at_decision - hit_llr) < 1e-4


def test_power_mde_ground_truth(spark, sf_dir):
    """MDE and per-arm sizing recomputed from raw purchase values."""
    import math

    out = QUERIES["stat_power_mde_report"](spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    arms = {0: [], 1: []}
    for r in ev:
        if r.event_type == "purchase" and r.value is not None and r.user_id is not None:
            arms[r.user_id % 2].append(round(r.value, 6))
    n1, n2 = len(arms[0]), len(arms[1])
    m1 = sum(arms[0]) / n1
    v1 = (sum(x * x for x in arms[0]) - n1 * m1 * m1) / (n1 - 1)
    m2 = sum(arms[1]) / n2
    v2 = (sum(x * x for x in arms[1]) - n2 * m2 * m2) / (n2 - 1)
    se = math.sqrt(v1 / n1 + v2 / n2)
    z = 1.959964 + 0.841621
    assert row.n_control == n1 and row.n_treat == n2
    assert abs(row.se - se) < 1e-4
    assert abs(row.mde_abs - z * se) < 1e-3
    assert abs(row.mde_rel - z * se / m1) < 1e-5
    want_n = 2 * z * z * ((v1 + v2) / 2) / (0.05 * m1) ** 2
    assert abs(row.n_per_arm_for_5pct - want_n) < max(0.02, want_n * 1e-5)


def test_stickiness_ground_truth(spark, sf_dir):
    """DAU/MAU per month replayed with set arithmetic."""
    from collections import defaultdict

    rows = {r.month: r for r in QUERIES["events_stickiness_dau_mau"](spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    daily = defaultdict(set)
    monthly = defaultdict(set)
    for r in ev:
        if r.ts is not None and r.user_id is not None:
            day = r.ts.date()
            m = day.replace(day=1)
            daily[(m, day)].add(r.user_id)
            monthly[m].add(r.user_id)
    per_month = defaultdict(lambda: [0, 0])
    for (m, _), users in daily.items():
        per_month[m][0] += len(users)
        per_month[m][1] += 1
    assert set(rows) == set(monthly)
    for m, (sum_dau, n_days) in per_month.items():
        r = rows[m]
        mau = len(monthly[m])
        assert r.mau == mau and r.sum_dau == sum_dau and r.n_days == n_days
        assert abs(r.stickiness - round(sum_dau / n_days / mau, 6)) < 1e-9
