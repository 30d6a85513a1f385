"""Registered temporal-join queries (as-of + binned interval join).

Extended scope: the reference has no joins of any kind (SURVEY.md §2.2
"Joins: none"); these are the two join shapes every event workload needs.

DuckDB's native ``ASOF JOIN`` is the oracle for the as-of operator; a plain
range-predicate join oracles the binned interval join — so both scalable
formulations are hash-checked against direct declarative semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_mapreduce_in_docker_rpyc_spark.operators import temporal as tp
from distributed_mapreduce_in_docker_rpyc_spark.operators.relational import money_sum
from distributed_mapreduce_in_docker_rpyc_spark.registry import register
from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table


@register(
    "asof_purchase_click",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts, MAX(event_id) AS click_event_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.click_event_id AS click_event_id_right,
           c.ts AS ts_right
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's latest preceding (or simultaneous)
    click — the canonical as-of shape. The right side is deduped per
    (user, ts) so the match is deterministic on both engines."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    return tp.asof_join(purchases, clicks, on="user_id")


@register(
    "interval_join_error_window",
    oracle="""
    SELECT e.event_id AS error_event_id, p.event_id AS purchase_event_id,
           e.user_id
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
    JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
      ON p.user_id = e.user_id
     AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL '10 minutes'
    """,
)
def interval_join_error_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases within 10 minutes after an error by the same user, via the
    binned interval join (equi-join on (user, time-bin) + residual range
    filter — no nested-loop range join)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"), "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_event_id"),
        "user_id",
        F.col("ts").alias("t_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("t_end"),
    )
    joined = tp.interval_join_binned(
        purchases, errors, on="user_id", point_ts="ts",
        start_ts="t_start", end_ts="t_end", bin_seconds=600,
    )
    return joined.select("error_event_id", "purchase_event_id", "user_id")


@register(
    "ts_interpolate_daily",
    oracle="""
    WITH bounds AS (
        SELECT min(CAST(o_orderdate AS DATE)) AS lo,
               max(CAST(o_orderdate AS DATE)) AS hi
        FROM orders
    ),
    spine AS (
        SELECT p.o_orderpriority,
               unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
        FROM bounds, (SELECT DISTINCT o_orderpriority FROM orders) p
    ),
    daily AS (
        SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS rev
        FROM orders GROUP BY 1, 2
    ),
    g AS (
        SELECT s.o_orderpriority, s.day, d.rev,
               last_value(d.rev IGNORE NULLS) OVER w_prev AS prev_rev,
               last_value(CASE WHEN d.rev IS NOT NULL THEN s.day END IGNORE NULLS)
                   OVER w_prev AS prev_day,
               first_value(d.rev IGNORE NULLS) OVER w_next AS next_rev,
               first_value(CASE WHEN d.rev IS NOT NULL THEN s.day END IGNORE NULLS)
                   OVER w_next AS next_day
        FROM spine s LEFT JOIN daily d
          ON d.o_orderpriority = s.o_orderpriority AND d.day = s.day
        WINDOW
          w_prev AS (PARTITION BY s.o_orderpriority ORDER BY s.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          w_next AS (PARTITION BY s.o_orderpriority ORDER BY s.day
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT o_orderpriority, day,
           CAST(CASE
               WHEN rev IS NOT NULL THEN rev
               WHEN prev_rev IS NOT NULL AND next_rev IS NOT NULL THEN
                   prev_rev + (next_rev - prev_rev)
                   * (CAST(day - prev_day AS DOUBLE)
                      / CAST(next_day - prev_day AS DOUBLE))
               ELSE COALESCE(prev_rev, next_rev)
           END AS DOUBLE) AS revenue,
           rev IS NOT NULL AS is_observed
    FROM g
    """,
)
def ts_interpolate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill with LINEAR INTERPOLATION: per-priority daily
    revenue on a gap-free date spine, missing days interpolated between the
    nearest observed neighbors (edge gaps take the nearest observation) —
    the resample/interpolate step every timeseries feature pipeline needs,
    built from window functions instead of a per-key driver loop.

    Scale posture: the daily rollup is O(days x priorities) and broadcast
    into the spine join; the two IGNORE-NULLS window passes share one
    shuffle on the uniform (priority) key with linear per-partition work.
    ~28% of slots are gaps at sf0.01, so the interpolation arm is
    load-bearing, not decorative.
    """
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    spine = (
        bounds.select(F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day"))
        .crossJoin(o.select("o_orderpriority").distinct())
    )
    daily = o.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("day")
    ).agg(money_sum("o_totalprice").cast("double").alias("rev"))
    # Broadcast the DAILY side: the preserved (spine) side of a left join
    # can't be the broadcast build side, but the rollup is bounded at
    # O(days x priorities) rows, so it broadcasts instead.
    g = spine.join(F.broadcast(daily), ["o_orderpriority", "day"], "left")
    w_prev = (
        Window.partitionBy("o_orderpriority").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("o_orderpriority").orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    rev = F.col("rev")
    marked_day = F.when(rev.isNotNull(), F.col("day"))
    g = g.select(
        "o_orderpriority",
        "day",
        rev,
        F.last(rev, ignorenulls=True).over(w_prev).alias("prev_rev"),
        F.last(marked_day, ignorenulls=True).over(w_prev).alias("prev_day"),
        F.first(rev, ignorenulls=True).over(w_next).alias("next_rev"),
        F.first(marked_day, ignorenulls=True).over(w_next).alias("next_day"),
    )
    frac = F.datediff("day", "prev_day").cast("double") / F.datediff(
        "next_day", "prev_day"
    ).cast("double")
    interp = (
        F.when(rev.isNotNull(), rev)
        .when(
            F.col("prev_rev").isNotNull() & F.col("next_rev").isNotNull(),
            F.col("prev_rev") + (F.col("next_rev") - F.col("prev_rev")) * frac,
        )
        .otherwise(F.coalesce("prev_rev", "next_rev"))
    )
    # No engine-side ROUND: Spark (BigDecimal half-up) and DuckDB round
    # doubles differently at the exact .xx5 midpoints that 2-day gaps
    # produce structurally.  Both engines evaluate the SAME IEEE expression
    # tree over identical inputs (exact DECIMAL sums cast to double), so the
    # raw doubles are bit-identical and the driver's own float rounding
    # canonicalizes both sides consistently.
    return g.select(
        "o_orderpriority",
        "day",
        interp.cast("double").alias("revenue"),
        rev.isNotNull().alias("is_observed"),
    )


@register(
    "ts_rolling_median_revenue",
    oracle="""
    WITH daily AS (
        SELECT o_orderpriority,
               CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY 1, 2
    )
    SELECT o_orderpriority, day, ROUND(revenue, 6) AS revenue,
           ROUND(quantile_cont(revenue, 0.5) OVER (
               PARTITION BY o_orderpriority ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ), 6) AS rolling_median_7,
           ROUND(abs(revenue - quantile_cont(revenue, 0.5) OVER (
               PARTITION BY o_orderpriority ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           )), 6) AS abs_dev
    FROM daily
    """,
)
def ts_rolling_median_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-observation rolling MEDIAN of daily revenue per order priority —
    the robust smoother (median filters shrug off the spikes that wreck
    rolling means), plus each day's absolute deviation from it, the
    building block of a rolling-MAD anomaly detector
    (cf. text_length_outliers_mad for the static variant).

    Spark has no median window function; ``percentile(x, 0.5)`` IS a
    window-capable aggregate and computes the same linear-interpolated
    quantile as DuckDB's ``quantile_cont`` — both interpolate
    ``a + (b-a)/2`` over bit-identical doubles (daily sums ride the exact
    DECIMAL money path, cast to double once), so even the interpolated
    midpoints hash-match at 6 dp.

    Scale shape: the rolling window partitions by priority and frames 7
    ROWS — state per window is O(7), the sort is within uniform series
    keys; at 100 TB-per-series granularity you'd pre-bucket by (series,
    month) and carry 6 rows of overlap, same frame semantics."""
    from pyspark.sql import Window

    from distributed_mapreduce_in_docker_rpyc_spark.operators.relational import money_sum

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("day")
    ).agg(money_sum(F.col("o_totalprice")).alias("revenue"))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    med = F.expr("percentile(revenue, 0.5D)").over(w)
    return daily.select(
        "o_orderpriority",
        "day",
        F.round("revenue", 6).alias("revenue"),
        F.round(med, 6).alias("rolling_median_7"),
        F.round(F.abs(F.col("revenue") - med), 6).alias("abs_dev"),
    )


_EWMA_K = 20  # trailing lags; 2^-20 < the 1e-6 quantization grain anyway


@register(
    "ts_ewma_revenue",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderpriority,
               CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DECIMAL(24,6)) AS revenue
        FROM orders GROUP BY 1, 2
    ),
    seq AS (
        SELECT o_orderpriority, day, revenue,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY day) AS rn
        FROM daily
    ),
    lags AS (
        SELECT o_orderpriority, day, rn,
               unnest(generate_series(0, {_EWMA_K - 1})) AS k
        FROM seq
    ),
    terms AS (
        SELECT l.o_orderpriority, l.day,
               CAST(s.revenue * CAST((CAST(1 AS BIGINT) << ({_EWMA_K - 1} - l.k))
                    AS DECIMAL(7,0)) AS DECIMAL(38,6)) AS num_t,
               (CAST(1 AS BIGINT) << ({_EWMA_K - 1} - l.k)) AS den_t
        FROM lags l
        JOIN seq s ON s.o_orderpriority = l.o_orderpriority
                  AND s.rn = l.rn - l.k
    )
    SELECT o_orderpriority, day,
           CAST(SUM(num_t) AS DOUBLE) / CAST(SUM(den_t) AS DOUBLE) AS ewma
    FROM terms
    GROUP BY o_orderpriority, day
    """,
)
def ts_ewma_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (decay 1/2) of daily revenue
    per priority, truncated at 20 trailing observations — the classic
    recency-weighted smoother, built WITHOUT recursion so it distributes:
    y_t = Σ_k 2^-k·x_{t-k} / Σ_k 2^-k over available lags.

    Engine-exactness by construction: both numerator and denominator are
    scaled by 2^(K-1), turning every weight into the INTEGER 2^(K-1-k)
    (a bit-shift — no pow(), no libm, and crucially no division): each
    term is decimal-exact (DECIMAL(24,6) revenue × DECIMAL(7,0) weight
    fits (32,6) with zero rounding), sums are exact and order-independent,
    and the only inexact operation in the whole query is ONE final double
    division of two exactly-computed operands — bit-identical across
    engines.  (The earlier per-term x/2^k form quantized each term to the
    1e-6 grain where Spark's HALF_UP and DuckDB's rounding disagree,
    drifting up to 2e-6 over 20 terms — driver-red in its first check.)
    The lag join is a pure EQUI-join (explode k=0..19, join on rn−k) — the
    trick that turns a "recursive" smoother into one shuffle.  Truncation
    at 20 lags loses < 2⁻¹⁹ of the weight mass.

    Shape at 100 TB: series-key-partitioned window for rn, then a 20×
    explode + equi-join — candidate volume exactly 20 rows/observation,
    uniform keys throughout."""
    from pyspark.sql import Window

    from distributed_mapreduce_in_docker_rpyc_spark.operators.relational import money

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("day")
    ).agg(F.sum(money(F.col("o_totalprice"))).cast("decimal(24,6)").alias("revenue"))
    seq = daily.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("o_orderpriority").orderBy("day")),
    ).persist()
    lags = seq.select(
        "o_orderpriority", "day", "rn",
        F.explode(F.sequence(F.lit(0), F.lit(_EWMA_K - 1))).alias("k"),
    )
    src = seq.select(
        F.col("o_orderpriority").alias("sp"),
        F.col("rn").alias("srn"),
        F.col("revenue").alias("x"),
    )
    terms = lags.join(
        src,
        (F.col("sp") == F.col("o_orderpriority")) & (F.col("srn") == F.col("rn") - F.col("k")),
    ).selectExpr(
        "o_orderpriority",
        "day",
        f"CAST(x * CAST(shiftleft(CAST(1 AS BIGINT), {_EWMA_K - 1} - k) AS DECIMAL(7,0))"
        " AS DECIMAL(38,6)) AS num_t",
        f"shiftleft(CAST(1 AS BIGINT), {_EWMA_K - 1} - k) AS den_t",
    )
    # NOT rounded engine-side: every term is decimal-exact (integer weights,
    # see docstring), so the quotient of the two exact sums is one IEEE
    # double division — BIT-identical in both engines; the driver rounds
    # both sides with the same pandas call.
    return terms.groupBy("o_orderpriority", "day").agg(
        F.expr("CAST(SUM(num_t) AS DOUBLE) / CAST(SUM(den_t) AS DOUBLE) AS ewma")
    )


@register(
    "theilsen_daily_trend",
    oracle="""
    WITH daily AS (
        SELECT o_orderpriority,
               date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS d,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DECIMAL(24,6))
                    AS DOUBLE) AS r
        FROM orders GROUP BY 1, 2
    ),
    slopes AS (
        SELECT a.o_orderpriority,
               (b.r - a.r) / CAST(b.d - a.d AS DOUBLE) AS slope
        FROM daily a
        JOIN daily b ON b.o_orderpriority = a.o_orderpriority
                    AND b.d > a.d AND b.d - a.d <= 90
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY slope), 6) AS theil_sen_slope
    FROM slopes
    GROUP BY o_orderpriority
    """,
)
def theilsen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend estimator per order priority: the MEDIAN of
    all pairwise slopes of the daily-revenue series — the
    breakdown-point-29% robust alternative to OLS trend fitting, immune to
    the revenue spikes that wreck a least-squares slope.  Pairs are BANDED
    to a 90-day horizon (the standard long-series Theil-Sen variant): the
    pair count is O(days x 90) per key instead of O(days^2), and slopes
    across multi-year gaps carry no trend information anyway.

    Scale posture: the quadratic lives in TIME, not data — the series
    first collapses to one row per (priority, day) via a map-side-combined
    exact-decimal aggregate (at 100 TB this is the only pass over the fact
    table), and the pair join is over the day spine (~2.4 k rows/priority
    → ~3 M pairs/priority), bounded by calendar length regardless of data
    volume.  Slopes are engine-identical doubles (decimal-exact daily
    revenue, one subtraction + one division); the median interpolates the
    two middle elements identically in both engines, rounded to 6."""
    from distributed_mapreduce_in_docker_rpyc_spark.operators.relational import money

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority",
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")).alias("d"),
    ).agg(
        F.sum(money(F.col("o_totalprice")))
        .cast("decimal(24,6)")
        .cast("double")
        .alias("r")
    )
    # The pair space is (priority, d1 < d2) — only 5 join keys, so a
    # shuffled join would serialize ~3 M pairs/priority onto 5 tasks.  The
    # daily rollup is bounded at O(days x priorities) rows regardless of
    # data volume, so BROADCAST it and spread the probe side across all
    # cores: every task expands its own day rows against the broadcast
    # copy, no shuffle, no skew.
    cores = spark.sparkContext.defaultParallelism
    a = daily.select(
        "o_orderpriority", F.col("d").alias("d1"), F.col("r").alias("r1")
    ).repartition(cores)
    b = daily.select(
        F.col("o_orderpriority").alias("p2"), F.col("d").alias("d2"), F.col("r").alias("r2")
    )
    slopes = (
        a.join(
            F.broadcast(b),
            (F.col("p2") == F.col("o_orderpriority"))
            & (F.col("d2") > F.col("d1"))
            & (F.col("d2") - F.col("d1") <= 90),
        )
        .select(
            "o_orderpriority",
            ((F.col("r2") - F.col("r1")) / (F.col("d2") - F.col("d1")).cast("double")).alias(
                "slope"
            ),
        )
    )
    return slopes.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(F.percentile(F.col("slope"), F.lit(0.5)), 6).alias("theil_sen_slope"),
    )


@register(
    "ts_seasonal_decompose",
    oracle="""
    WITH daily AS (
        SELECT o_orderpriority,
               CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DECIMAL(24,6)) AS rev
        FROM orders GROUP BY 1, 2
    ),
    tr AS (
        SELECT o_orderpriority, day, rev,
               dayofweek(day) + 1 AS dow,
               CAST(SUM(rev) OVER w7 AS DECIMAL(32,6)) AS num,
               COUNT(*) OVER w7 AS den
        FROM daily
        WINDOW w7 AS (PARTITION BY o_orderpriority ORDER BY day
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
        SELECT o_orderpriority, day, dow, rev, num, den,
               CAST(CAST(rev * CAST(den AS DECIMAL(2,0)) AS DECIMAL(32,6)) - num
                    AS DECIMAL(32,6))
               * CAST(420 // den AS DECIMAL(3,0)) AS det_scaled
        FROM tr
    ),
    seas AS (
        SELECT o_orderpriority, dow,
               CAST(SUM(det_scaled) AS DOUBLE)
               / CAST(420 * COUNT(*) AS DOUBLE) AS seasonal
        FROM det GROUP BY o_orderpriority, dow
    )
    SELECT d.o_orderpriority, d.day, CAST(d.dow AS BIGINT) AS dow,
           CAST(d.rev AS DOUBLE) AS revenue,
           CAST(d.num AS DOUBLE) / CAST(d.den AS DOUBLE) AS trend,
           s.seasonal,
           (CAST(d.rev AS DOUBLE) - CAST(d.num AS DOUBLE) / CAST(d.den AS DOUBLE))
               - s.seasonal AS residual
    FROM det d JOIN seas s
      ON s.o_orderpriority = d.o_orderpriority AND s.dow = d.dow
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily revenue per
    priority: trend = centered 7-row moving mean, seasonal = day-of-week
    mean of the detrended series, residual = the rest — the
    moving-average STL precursor every demand/forecast pipeline runs
    first, and the feature split (trend/seasonal/residual) its anomaly
    detectors consume.

    Engine-exactness by the ``ts_ewma_revenue`` construction: the trend is
    ONE double division of a decimal-exact window sum by its row count;
    the detrended value is kept as the exact rational (rev·den − num)/den
    and rescaled to the common denominator 420 (= lcm 1..7, so 420/den is
    an INTEGER for every edge-window width) — the day-of-week seasonal
    mean is then again exact-decimal sums with one final double division.
    The only inexact steps are three double divisions/subtractions of
    bit-identical operands, evaluated as the same IEEE expression tree on
    both engines.

    Scale shape: one map-side-combined aggregate over the fact table
    collapses to the (priority, day) spine; everything after is windows
    and a 35-row broadcast join on the spine — calendar-bounded,
    data-volume-independent."""
    from pyspark.sql import Window

    from distributed_mapreduce_in_docker_rpyc_spark.operators.relational import money

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("day")
    ).agg(F.sum(money(F.col("o_totalprice"))).cast("decimal(24,6)").alias("rev"))
    w7 = (
        Window.partitionBy("o_orderpriority").orderBy("day").rowsBetween(-3, 3)
    )
    tr = daily.select(
        "o_orderpriority",
        "day",
        "rev",
        F.dayofweek("day").alias("dow"),
        F.sum("rev").over(w7).cast("decimal(32,6)").alias("num"),
        F.count("*").over(w7).alias("den"),
    )
    det = tr.withColumn(
        "det_scaled",
        F.expr(
            "CAST(CAST(rev * CAST(den AS DECIMAL(2,0)) AS DECIMAL(32,6)) - num"
            " AS DECIMAL(32,6)) * CAST(420 div den AS DECIMAL(3,0))"
        ),
    ).persist()
    seas = det.groupBy("o_orderpriority", "dow").agg(
        F.expr(
            "CAST(SUM(det_scaled) AS DOUBLE) / CAST(420 * COUNT(*) AS DOUBLE)"
        ).alias("seasonal")
    )
    trend = F.col("num").cast("double") / F.col("den").cast("double")
    return (
        det.join(F.broadcast(seas), ["o_orderpriority", "dow"])
        .select(
            "o_orderpriority",
            "day",
            F.col("dow").cast("bigint").alias("dow"),
            F.col("rev").cast("double").alias("revenue"),
            trend.alias("trend"),
            "seasonal",
            ((F.col("rev").cast("double") - trend) - F.col("seasonal")).alias("residual"),
        )
    )


@register(
    "asof_nearest_purchase",
    oracle="""
    WITH p AS (
        SELECT user_id, ts, MAX(event_id) AS pid
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    ),
    uni AS (
        SELECT user_id, ts, NULL AS pid, event_id AS eid, 1 AS is_err
        FROM events WHERE event_type = 'error'
        UNION ALL
        SELECT user_id, ts, pid, NULL AS eid, 0 AS is_err FROM p
    ),
    walked AS (
        SELECT user_id, ts, eid, is_err,
               last_value(CASE WHEN is_err = 0 THEN ts END IGNORE NULLS)
                   OVER w_prev AS prev_ts,
               last_value(CASE WHEN is_err = 0 THEN pid END IGNORE NULLS)
                   OVER w_prev AS prev_pid,
               first_value(CASE WHEN is_err = 0 THEN ts END IGNORE NULLS)
                   OVER w_next AS next_ts,
               first_value(CASE WHEN is_err = 0 THEN pid END IGNORE NULLS)
                   OVER w_next AS next_pid
        FROM uni
        WINDOW
          w_prev AS (PARTITION BY user_id ORDER BY ts, is_err
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          w_next AS (PARTITION BY user_id ORDER BY ts, is_err DESC
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT eid AS error_event_id, user_id,
           CASE WHEN prev_ts IS NOT NULL
                     AND (next_ts IS NULL
                          OR epoch_us(ts) - epoch_us(prev_ts)
                             <= epoch_us(next_ts) - epoch_us(ts))
                THEN prev_pid ELSE next_pid END AS nearest_purchase_id,
           CASE WHEN prev_ts IS NOT NULL
                     AND (next_ts IS NULL
                          OR epoch_us(ts) - epoch_us(prev_ts)
                             <= epoch_us(next_ts) - epoch_us(ts))
                THEN epoch_us(ts) - epoch_us(prev_ts)
                ELSE epoch_us(next_ts) - epoch_us(ts) END AS dt_us
    FROM walked WHERE is_err = 1
    """,
)
def asof_nearest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-neighbor as-of join: each error event matched to the
    closest purchase by the same user in EITHER time direction (ties to
    the earlier purchase) — the sensor-alignment/nearest-fill variant of
    the backward-only as-of (``asof_purchase_click``), which neither
    Spark nor DuckDB's ASOF JOIN expresses directly.  Formulated as two
    IGNORE-NULLS window walks over the unioned per-user timeline: the
    backward walk orders same-timestamp purchases BEFORE the error
    (inclusive match), the forward walk orders them after — so a
    simultaneous purchase is a 0-distance backward match on both engines.
    Distances are exact integer microseconds (epoch_us both sides); no
    unmatched error is dropped (users with no purchases emit NULLs).

    Scale posture: one shuffle on the uniform user key, two linear window
    passes — no range join, no per-user loop, state O(1) per row."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("pid"))
        .select("user_id", "ts", "pid", F.lit(None).cast("long").alias("eid"), F.lit(0).alias("is_err"))
    )
    e = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.lit(None).cast("long").alias("pid"),
        F.col("event_id").alias("eid"), F.lit(1).alias("is_err"),
    )
    uni = e.unionByName(p)
    w_prev = (
        Window.partitionBy("user_id").orderBy("ts", "is_err")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id").orderBy("ts", F.desc("is_err"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    purchase_ts = F.when(F.col("is_err") == 0, F.col("ts"))
    purchase_id = F.when(F.col("is_err") == 0, F.col("pid"))
    walked = uni.select(
        "user_id", "ts", "eid", "is_err",
        F.last(purchase_ts, ignorenulls=True).over(w_prev).alias("prev_ts"),
        F.last(purchase_id, ignorenulls=True).over(w_prev).alias("prev_pid"),
        F.first(purchase_ts, ignorenulls=True).over(w_next).alias("next_ts"),
        F.first(purchase_id, ignorenulls=True).over(w_next).alias("next_pid"),
    ).filter(F.col("is_err") == 1)
    prev_dt = F.unix_micros("ts") - F.unix_micros("prev_ts")
    next_dt = F.unix_micros("next_ts") - F.unix_micros("ts")
    take_prev = F.col("prev_ts").isNotNull() & (
        F.col("next_ts").isNull() | (prev_dt <= next_dt)
    )
    return walked.select(
        F.col("eid").alias("error_event_id"),
        "user_id",
        F.when(take_prev, F.col("prev_pid")).otherwise(F.col("next_pid")).alias(
            "nearest_purchase_id"
        ),
        F.when(take_prev, prev_dt).otherwise(next_dt).alias("dt_us"),
    )


@register(
    "orders_open_backlog",
    oracle="""
    /* deliberately the DIRECT stabbing formulation — an independent
       derivation of the same series the engine computes by difference
       arrays: day d counts orders with start <= d <= end */
    WITH spans AS (
        SELECT o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS s,
               GREATEST(CAST(o.o_orderdate AS DATE),
                        CAST(MAX(l.l_shipdate) AS DATE)) AS e
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
    ),
    bounds AS (SELECT MIN(s) AS lo, MAX(e) AS hi FROM spans),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
        FROM bounds
    )
    SELECT sp.day,
           CAST(COUNT(s.o_orderkey) AS BIGINT) AS n_open
    FROM spine sp LEFT JOIN spans s ON s.s <= sp.day AND sp.day <= s.e
    GROUP BY sp.day
    """,
)
def orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OPEN-ORDER backlog: how many orders are in flight
    (order date <= day <= last line shipment) on every calendar day — the
    interval-stabbing/concurrency count behind WIP dashboards, hotel
    occupancy, session concurrency.  The engine computes it as a
    DIFFERENCE ARRAY: each order contributes (+1 at start, −1 after end),
    and the backlog is one running sum over the day spine — O(orders)
    events + one calendar-bounded window instead of the O(orders × days)
    stabbing join; the ORACLE deliberately runs the direct stabbing
    formulation, so the two independent derivations must agree day by day.

    Scale posture: the per-order span is one map-side-combined aggregate
    over lineitem; the delta aggregation is day-keyed (calendar-bounded);
    the single global running-sum window runs over the spine (thousands of
    rows), not the data — at 100 TB you'd segment the spine per month and
    carry segment offsets, same arithmetic."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        li.groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("max_ship"))
        .join(
            o.select("o_orderkey", F.to_date("o_orderdate").alias("s")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("s", F.greatest("s", "max_ship").alias("e"))
    )
    deltas = (
        spans.select(F.col("s").alias("day"), F.lit(1).alias("d"))
        .unionAll(spans.select(F.date_add("e", 1).alias("day"), F.lit(-1).alias("d")))
        .groupBy("day")
        .agg(F.sum("d").alias("delta"))
    )
    bounds = spans.agg(F.min("s").alias("lo"), F.max("e").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        spine.join(F.broadcast(deltas), "day", "left")
        .select("day", F.coalesce("delta", F.lit(0)).alias("delta"))
        .select("day", F.sum("delta").over(w).cast("bigint").alias("n_open"))
    )


# --- Autocorrelation function of the daily revenue series --------------------
_ACF_MAX_LAG = 14


@register(
    "ts_autocorrelation",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DECIMAL(24,6))
                   AS v
        FROM orders GROUP BY 1
    ),
    seq AS (
        SELECT day, v,
               ROW_NUMBER() OVER (ORDER BY day) AS rn,
               CAST(SUM(v) OVER () AS DOUBLE) / COUNT(*) OVER () AS mu
        FROM daily
    ),
    dev AS (SELECT rn, (CAST(v AS DOUBLE) - mu) AS e FROM seq),
    lagged AS (
        SELECT g.k AS lag,
               CAST(ROUND(a.e * b.e, 6) AS DECIMAL(38,6)) AS prod
        FROM generate_series(0, {_ACF_MAX_LAG}) g(k)
        JOIN dev a ON TRUE
        JOIN dev b ON b.rn = a.rn + g.k
    ),
    sums AS (
        SELECT lag, COUNT(*) AS n_pairs, SUM(prod) AS num,
               MAX(SUM(prod)) FILTER (WHERE lag = 0) OVER () AS den
        FROM lagged GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS autocorr
    FROM sums WHERE lag >= 1
    """,
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation function of the daily order-revenue series at
    lags 1..14 — the seasonality screen (weekly cycles show as a lag-7
    spike) a forecasting pipeline runs before model choice.  Uses the
    standard biased ACF: r_k = Σ e_t·e_{t+k} / Σ e_t², deviations from the
    global mean.

    Exactness: daily sums ride exact DECIMAL; the mean is one division;
    each lag product e_t·e_{t+k} is a deterministic double that is then
    QUANTIZED (ROUND 6 → DECIMAL(38,6)) so the per-lag sums are exact and
    order-independent — the same money-trick that de-flakes every float
    aggregation in this repo.  The lag-0 row doubles as the shared
    denominator, so no scalar broadcast is needed.

    Shape at 100 TB: the series collapses to the calendar spine first
    (map-side-combined groupBy(day)); the 15-lag fan-out and self-join run
    over THAT (thousands of rows), so lag depth scales the small side."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        money_sum(F.col("o_totalprice")).alias("v")
    )
    w_ord = Window.orderBy("day")
    w_all = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    seq = daily.select(
        "day",
        "v",
        F.row_number().over(w_ord).alias("rn"),
        (F.sum("v").over(w_all).cast("double") / F.count("*").over(w_all)).alias(
            "mu"
        ),
    )
    dev = seq.selectExpr("rn", "(CAST(v AS DOUBLE) - mu) AS e")
    ks = dev.select(
        F.explode(F.expr(f"sequence(0, {_ACF_MAX_LAG})")).alias("lag"),
        F.col("rn").alias("arn"),
        F.col("e").alias("ae"),
    )
    lagged = ks.join(
        dev.selectExpr("rn AS brn", "e AS be"),
        F.col("brn") == F.col("arn") + F.col("lag"),
    ).selectExpr("lag", "CAST(ROUND(ae * be, 6) AS DECIMAL(38,6)) AS prod")
    w_lag = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sums = lagged.groupBy("lag").agg(
        F.count("*").alias("n_pairs"), F.sum("prod").alias("num")
    )
    sums = sums.select(
        "lag",
        "n_pairs",
        "num",
        F.max(F.when(F.col("lag") == 0, F.col("num"))).over(w_lag).alias("den"),
    )
    return sums.filter(F.col("lag") >= 1).selectExpr(
        "CAST(lag AS BIGINT) AS lag",
        "CAST(n_pairs AS BIGINT) AS n_pairs",
        "ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS autocorr",
    )
