"""Event-stream analytics (batch form; SURVEY.md §7 M5's batch oracles).

These are the batch-equivalent queries of the Structured Streaming slice in
``streaming/`` — tumbling/sliding windows, sessionization, JSON extraction.
The streaming versions run the same aggregations incrementally; tests assert
stream ≡ batch on the same parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_mapreduce_in_docker_rpyc_spark.operators.relational import sessionize
from distributed_mapreduce_in_docker_rpyc_spark.registry import register
from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

_VALUE_DEC = "CAST(value AS DECIMAL(30,6))"


@register(
    "events_tumbling_hourly",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS wstart, event_type,
           COUNT(*) AS n_events,
           CAST(SUM({_VALUE_DEC}) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type (batch form of the streaming
    windowed count)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("wstart"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total_value"),
        )
    )


@register(
    "events_sliding_10m_5m",
    oracle=f"""
    WITH slid AS (
        SELECT e.*, time_bucket(INTERVAL '5 minutes', e.ts) - o.o * INTERVAL '5 minutes' AS wstart
        FROM events e, generate_series(0, 1) o(o)
    )
    SELECT wstart, COUNT(*) AS n_events,
           CAST(SUM({_VALUE_DEC}) AS DOUBLE) AS total_value
    FROM slid
    WHERE ts >= wstart AND ts < wstart + INTERVAL '10 minutes'
    GROUP BY wstart
    """,
)
def events_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10-minute length, 5-minute slide): each event lands in
    2 windows. Spark's window() expands rows exactly like the oracle's
    generate_series join; both align window origins to an epoch that 5 minutes
    divides evenly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("wstart"), "n_events", "total_value")
    )


@register(
    "events_sessionize",
    oracle="""
    WITH x AS (
        SELECT user_id, event_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, event_id, ts,
               CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM x
    )
    SELECT user_id, session_seq, COUNT(*) AS n_events,
           MIN(ts) AS t_start, MAX(ts) AS t_end
    FROM s GROUP BY user_id, session_seq
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + cumulative break
    count, then per-session stats. One shuffle on user_id shared by both
    windows and the final aggregation."""
    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, gap_minutes=30)
    return s.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
    )


@register(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the props column, aggregated per type."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        F.count("*").alias("n"),
    )


@register(
    "events_top_users",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events
    FROM events GROUP BY user_id
    ORDER BY n_events DESC, user_id ASC
    LIMIT 10
    """,
)
def events_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most active users (deterministic total order)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(10)
    )


@register(
    "window_range_frame_rolling",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW) AS n_last_hour
    FROM events
    """,
)
def window_range_frame_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: events in the trailing hour per user. Spark's
    range frame needs a numeric ordering key — microseconds-since-epoch
    keeps the boundary semantics exact (a seconds cast would merge
    sub-second neighbors and disagree with the oracle's interval frame)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.count("*").over(w).alias("n_last_hour")
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, date_trunc('day', e.ts)) AS BIGINT) AS day_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN first_seen f ON f.user_id = e.user_id
    GROUP BY f.cohort_day, date_diff('day', f.cohort_day, date_trunc('day', e.ts))
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, distinct
    actives per day offset — two shuffles (first-seen agg on user, final agg
    on cohort/offset), the self-join broadcasts the per-user cohort map."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.date_trunc("day", F.min("ts")).cast("date").alias("cohort_day"))
    return (
        ev.join(F.broadcast(first_seen), "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day"))
            .cast("bigint")
            .alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@register(
    "events_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_view_click_purchase
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): each stage's earliest
    qualifying time must follow the previous stage's. Three filtered
    aggregations chained by broadcast joins — no window over the full
    stream, so each stage scans only its event type (pushed filter)."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_view_click_purchase")))
    )


@register(
    "events_hourly_anomaly",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
        FROM events GROUP BY date_trunc('hour', ts)
    ),
    scored AS (
        SELECT h, n,
               AVG(n) OVER w AS mu,
               stddev_samp(n) OVER w AS sigma
        FROM hourly
        WINDOW w AS (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT h, n, ROUND((n - mu) / sigma, 6) AS zscore
    FROM scored
    WHERE sigma > 0 AND abs((n - mu) / sigma) > 2.0
    """,
)
def events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomalous traffic hours: z-score of each hour's event count against
    the trailing 24 fully-closed hours (frame excludes the current row so
    the anomaly does not contaminate its own baseline)."""
    from pyspark.sql import Window

    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy("h").rowsBetween(-24, -1)
    scored = hourly.select(
        "h",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sigma"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        scored.filter((F.col("sigma") > 0) & (F.abs(z) > 2.0))
        .select("h", "n", F.round(z, 6).alias("zscore"))
    )


@register(
    "events_variant_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(json_extract_string(props, '$.k')) AS n_with_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured data through the VARIANT type (Spark 4): props parsed
    once with ``parse_json`` into a binary-encoded variant, fields extracted
    with ``variant_get`` — the modern engine path for JSON at scale (parse
    once, extract many, no per-extract re-parse like ``get_json_object``).
    Same answer as the string-path ``events_json_extract`` family."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    k = F.variant_get("v", "$.k", "bigint")
    return v.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(k).alias("n_with_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
        FROM events
    ),
    pairs AS (
        SELECT src, dst, count(*) AS cnt FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    tot AS (
        SELECT src, sum(cnt) AS n FROM pairs GROUP BY src
    )
    SELECT pairs.src, pairs.dst, pairs.cnt, round(pairs.cnt / tot.n, 6) AS p
    FROM pairs JOIN tot ON pairs.src = tot.src
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current) — the sequence-mining statistic behind
    next-action models.  One (user, time) window pass builds the
    transitions; the per-source totals are a tiny aggregate broadcast back
    for normalization.  Window tie-break on event_id keeps the sequence —
    and therefore the matrix — engine-deterministic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(F.col("event_type").alias("src"), F.lead("event_type").over(w).alias("dst"))
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("cnt"))
    )
    tot = pairs.groupBy("src").agg(F.sum("cnt").alias("n"))
    return pairs.join(F.broadcast(tot), "src").select(
        "src", "dst", "cnt", F.round(F.col("cnt") / F.col("n"), 6).alias("p")
    )


@register(
    "events_active_users_7d",
    oracle="""
    WITH days AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
    ),
    du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    dau AS (
        SELECT day, count(*) AS dau FROM du GROUP BY day
    )
    SELECT days.day, dau.dau, count(DISTINCT du.user_id) AS wau
    FROM days
    JOIN du ON du.day BETWEEN days.day - INTERVAL 6 DAY AND days.day
    JOIN dau ON dau.day = days.day
    GROUP BY days.day, dau.dau
    """,
)
def events_active_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + trailing-7-day active users (WAU) per day — the engagement
    rollup every product pipeline ships.

    Distinct (day, user) pairs are computed ONCE (the only big shuffle),
    then a broadcast day-spine range join re-buckets each pair into the ≤7
    windows it belongs to.  COUNT(DISTINCT) over a window frame isn't
    supported by any engine — this dedup-then-rebucket shape is the
    standard rewrite, and at 100 TB the distinct-pair frame is the one to
    swap for per-day HLL sketches merged across the trailing window."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct().persist()
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.count("*").alias("dau"))
    spine = days.select(F.col("day").alias("anchor"))
    window_pairs = du.join(
        F.broadcast(spine),
        (F.col("day") >= F.date_sub(F.col("anchor"), 6)) & (F.col("day") <= F.col("anchor")),
    )
    wau = window_pairs.groupBy("anchor").agg(F.count_distinct("user_id").alias("wau"))
    return (
        dau.join(wau, dau.day == wau.anchor)
        .select("day", "dau", "wau")
    )


@register(
    "ab_test_conversion",
    oracle="""
    WITH users AS (
        SELECT user_id,
               CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                    AS BIGINT) % 2 AS BIGINT) AS variant,
               max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY 1, 2
    ),
    per AS (
        SELECT variant, count(*) AS n_users, sum(conv) AS n_conv
        FROM users GROUP BY variant
    ),
    tot AS (SELECT sum(n_users) AS tn, sum(n_conv) AS tc FROM per)
    SELECT variant,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_conv AS BIGINT) AS n_conv,
           round(CAST(n_conv AS DOUBLE) / n_users, 6) AS conv_rate,
           round(
             (CAST(n_conv AS DOUBLE) / n_users
              - CAST(tc - n_conv AS DOUBLE) / (tn - n_users))
             / sqrt((CAST(tc AS DOUBLE) / tn) * (1 - CAST(tc AS DOUBLE) / tn)
                    * (1.0 / n_users + 1.0 / (tn - n_users))),
             6) AS z_vs_other
    FROM per, tot
    """,
)
def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation analytics: a deterministic 50/50 user split (md5
    bucket of user_id — the portable hash-assignment every experiment
    platform uses) and the two-proportion pooled z-statistic for
    high-value-purchase conversion (a purchase with value > 150 — chosen so
    conversion sits mid-range at every fixture scale instead of saturating) — the readout of an A/B test over the event log.
    The split is derived in-query because the fixture carries no
    assignment column; a real platform would read it from an exposure
    table and everything downstream is unchanged.

    Scale posture: one per-user conditional aggregate (uniform user_id
    key), then O(variants) rows; the pooled totals come from a window-free
    second aggregate of the 2-row frame."""
    ev = load_table(spark, sf_dir, "events")
    variant = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(2),
    )
    users = ev.groupBy("user_id", variant.alias("variant")).agg(
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 150), 1).otherwise(0)
        ).alias("conv")
    )
    per = users.groupBy("variant").agg(
        F.count("*").alias("n_users"), F.sum("conv").alias("n_conv")
    )
    tot = per.agg(F.sum("n_users").alias("tn"), F.sum("n_conv").alias("tc"))
    rate = F.col("n_conv").cast("double") / F.col("n_users")
    other = (F.col("tc") - F.col("n_conv")).cast("double") / (
        F.col("tn") - F.col("n_users")
    )
    pooled = F.col("tc").cast("double") / F.col("tn")
    se = F.sqrt(
        pooled
        * (1 - pooled)
        * (1.0 / F.col("n_users") + 1.0 / (F.col("tn") - F.col("n_users")))
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "variant",
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_conv").cast("long").alias("n_conv"),
        F.round(rate, 6).alias("conv_rate"),
        F.round((rate - other) / se, 6).alias("z_vs_other"),
    )


@register(
    "events_sequence_loglik",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
        FROM events
    ),
    trans AS (SELECT user_id, src, dst FROM seq WHERE dst IS NOT NULL),
    model AS (
        SELECT src, dst, count(*) AS cnt FROM trans GROUP BY src, dst
    ),
    tot AS (SELECT src, sum(cnt) AS n FROM model GROUP BY src),
    k AS (SELECT count(DISTINCT event_type) AS n_types FROM events),
    probs AS (
        SELECT m.src, m.dst,
               ln((CAST(m.cnt AS DOUBLE) + 1.0) / (CAST(t.n AS DOUBLE) + k.n_types))
                   AS lp
        FROM model m JOIN tot t ON t.src = m.src CROSS JOIN k
    )
    SELECT tr.user_id,
           count(*) AS n_transitions,
           ROUND(sum(p.lp) / count(*), 6) AS avg_loglik
    FROM trans tr
    JOIN probs p ON p.src = tr.src AND p.dst = tr.dst
    GROUP BY tr.user_id
    """,
)
def events_sequence_loglik(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sequence plausibility under the corpus's own first-order
    Markov model: each user's event stream is scored by the average
    add-1-smoothed log transition probability — the classic
    sequence-anomaly detector (users whose behavior deviates from global
    transition structure score low; bots and replay attacks surface here).

    Two passes over the same windowed transition frame: pass one aggregates
    the global model (K² rows max — broadcast back), pass two joins each
    user's transitions against it and averages.  The transition frame is
    computed ONCE per pass from a (user, time) window — at 100 TB both the
    model agg and the per-user agg shuffle on uniform keys
    ((src,dst) / user_id); the model join is a broadcast hash join.
    Laplace smoothing makes every observed transition scoreable; ln() sums
    differ across engines by ulps only, absorbed by the 6-dp round."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            "user_id",
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .persist()
    )
    model = trans.groupBy("src", "dst").agg(F.count("*").alias("cnt"))
    tot = model.groupBy("src").agg(F.sum("cnt").alias("n"))
    k = ev.agg(F.countDistinct("event_type").alias("n_types"))
    probs = (
        model.join(tot, "src")
        .crossJoin(F.broadcast(k))
        .select(
            "src",
            "dst",
            F.log(
                (F.col("cnt").cast("double") + F.lit(1.0))
                / (F.col("n").cast("double") + F.col("n_types"))
            ).alias("lp"),
        )
    )
    return (
        trans.join(F.broadcast(probs), ["src", "dst"])
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_transitions"),
            F.round(F.sum("lp") / F.count("*"), 6).alias("avg_loglik"),
        )
    )


@register(
    "events_attribution_credit",
    oracle="""
    WITH p AS (
        SELECT event_id AS purchase_id, user_id, ts
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT event_id AS click_id, user_id, ts
        FROM events WHERE event_type = 'click'
    ),
    touches AS (
        SELECT p.purchase_id, p.user_id, c.click_id,
               ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                  ORDER BY c.ts ASC, c.click_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY p.purchase_id) AS n_touches
        FROM p JOIN c ON c.user_id = p.user_id
                     AND c.ts < p.ts
                     AND c.ts >= p.ts - INTERVAL '2 hours'
    )
    SELECT purchase_id, user_id,
           CAST(MAX(n_touches) AS BIGINT) AS n_touches,
           MAX(CASE WHEN rn = 1 THEN click_id END) AS first_click_id,
           MAX(CASE WHEN rn = n_touches THEN click_id END) AS last_click_id,
           CAST(CASE WHEN MAX(n_touches) = 1 THEN 10000
                     WHEN MAX(n_touches) = 2 THEN 5000
                     ELSE 4000 END AS BIGINT) AS first_credit_bp,
           CAST(CASE WHEN MAX(n_touches) = 1 THEN 0
                     WHEN MAX(n_touches) = 2 THEN 5000
                     ELSE 4000 END AS BIGINT) AS last_credit_bp,
           CAST(CASE WHEN MAX(n_touches) >= 3 THEN 2000 ELSE 0 END AS BIGINT)
               AS mid_credit_bp
    FROM touches
    GROUP BY purchase_id, user_id
    """,
)
def events_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: every purchase is
    joined to the same user's clicks in the preceding 2 hours and credit is
    split 40/20/40 between first touch, middle touches, and last touch
    (100%/50-50% for 1- and 2-touch paths) — in integer BASIS POINTS, so
    the report is exact and engine-portable (float credit splits would
    re-introduce the sum-order lottery).

    Scale posture: the touch join is the BINNED interval join
    (operators/temporal.py — equi-join on (user, time-bucket) + residual
    range filter, never a nested-loop range scan), the position rank is a
    per-purchase window over the bounded 2-hour touch set, and the final
    aggregate is one row per purchase."""
    from distributed_mapreduce_in_docker_rpyc_spark.operators import temporal as tp
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        (F.col("ts") - F.expr("INTERVAL 2 HOURS")).alias("w_start"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    touches = tp.interval_join_binned(
        clicks,
        purchases,
        on="user_id",
        point_ts="c_ts",
        start_ts="w_start",
        end_ts="p_ts",
        bin_seconds=3600,
    ).filter(F.col("c_ts") < F.col("p_ts"))
    w_rank = Window.partitionBy("purchase_id").orderBy(F.asc("c_ts"), F.asc("click_id"))
    w_all = Window.partitionBy("purchase_id")
    ranked = touches.select(
        "purchase_id",
        "user_id",
        "click_id",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_all).alias("n_touches"),
    )
    n = F.max("n_touches")
    return ranked.groupBy("purchase_id", "user_id").agg(
        n.cast("bigint").alias("n_touches"),
        F.max(F.when(F.col("rn") == 1, F.col("click_id"))).alias("first_click_id"),
        F.max(F.when(F.col("rn") == F.col("n_touches"), F.col("click_id"))).alias(
            "last_click_id"
        ),
        F.when(n == 1, 10000).when(n == 2, 5000).otherwise(4000).cast("bigint").alias(
            "first_credit_bp"
        ),
        F.when(n == 1, 0).when(n == 2, 5000).otherwise(4000).cast("bigint").alias(
            "last_credit_bp"
        ),
        F.when(n >= 3, 2000).otherwise(0).cast("bigint").alias("mid_credit_bp"),
    )


@register(
    "events_active_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        FROM events WHERE user_id IS NOT NULL
    ),
    islands AS (
        SELECT user_id, day,
               day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                          AS INTEGER) AS island
        FROM days
    ),
    streaks AS (
        SELECT user_id, island, COUNT(*) AS streak_len
        FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(SUM(streak_len) AS BIGINT) AS n_active_days,
           CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY user_id
    """,
)
def events_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user CONSECUTIVE-day activity streaks via the
    classic day-minus-rank island key (consecutive days share a constant
    difference between the calendar day and the activity rank) — the
    retention/engagement metric behind every "7-day streak" feature, and
    the canonical relational answer to sequence analysis without
    self-joins or per-user loops.

    Shape at 100 TB: one distinct on (user, day), one ranking window and
    two aggregations — all on the uniform user key, each output strictly
    smaller than its input."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    days = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.select(
        "user_id",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("island"),
    )
    streaks = islands.groupBy("user_id", "island").agg(F.count("*").alias("streak_len"))
    return streaks.groupBy("user_id").agg(
        F.sum("streak_len").cast("bigint").alias("n_active_days"),
        F.max("streak_len").cast("bigint").alias("longest_streak"),
        F.count("*").cast("bigint").alias("n_streaks"),
    )


_MARKOV_ITERS = 8


def _markov_oracle() -> str:
    """Unrolled 8-step power iteration over the per-user transition matrix.
    Each step's mass sums are quantized to DECIMAL(38,12) (products are
    engine-identical doubles; the quantized sum is order-independent), so
    every iterate is bit-identical cross-engine — the GD fixed-point trick
    applied to an eigenvector computation."""
    steps = []
    prev = "it0"
    for i in range(1, _MARKOV_ITERS + 1):
        steps.append(f"""
    it{i} AS (
        SELECT pr.dst AS s,
               CAST(SUM(CAST({prev}.pi * pr.pv AS DECIMAL(38,12))) AS DOUBLE) AS pi
        FROM {prev} JOIN pr ON pr.src = {prev}.s
        GROUP BY pr.dst
    )""")
        prev = f"it{i}"
    return (
        """
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_type
        FROM events WHERE event_type IS NOT NULL
    ),
    pairs AS (
        SELECT event_type AS src, next_type AS dst, COUNT(*) AS cnt
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    ),
    states AS (SELECT DISTINCT src FROM pairs),
    pf AS (
        SELECT p.src, p.dst, p.cnt FROM pairs p
        JOIN states s ON s.src = p.dst
    ),
    tot AS (SELECT src, SUM(cnt) AS n FROM pf GROUP BY src),
    pr AS (
        SELECT pf.src, pf.dst, CAST(pf.cnt AS DOUBLE) / CAST(t.n AS DOUBLE) AS pv
        FROM pf JOIN tot t ON t.src = pf.src
    ),
    k AS (SELECT COUNT(*) AS k FROM states),
    it0 AS (SELECT src AS s, 1.0 / CAST(k.k AS DOUBLE) AS pi FROM states, k),"""
        + ",".join(steps)
        + f"""
    SELECT s AS event_type, ROUND(pi, 6) AS stationary_p
    FROM it{_MARKOV_ITERS}
    """
    )


@register("events_markov_stationary", oracle=_markov_oracle())
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-behavior Markov chain by POWER
    ITERATION: 8 steps of pi <- pi P over the row-normalized transition
    matrix (restricted to states with outgoing transitions, so P is
    stochastic) — where users' sessions settle in the long run, the
    eigenvector analysis behind engagement-loop detection.  Another
    iterative-algorithm-as-dataflow entry alongside GD training and Lloyd
    clustering: per step ONE tiny join + aggregate, mass sums quantized to
    DECIMAL(38,12) so all 8 iterates are bit-identical cross-engine and
    the final vector hash-checks.

    Scale posture: the transition matrix is K^2-bounded (event-type
    vocabulary, not data) and collected ONCE — constant driver traffic.
    The heavy work — building the matrix — is one window pass + one
    aggregate over the events table, exactly once.

    r11 (VERDICT r10 #3, guide §1.2 step 1): the 8 mass-sum steps replay on
    the DRIVER over the collected K²-row count frame instead of launching 8
    Spark jobs (each a createDataFrame + broadcast join + aggregate +
    collect over ~25 rows).  Driver traffic is strictly LESS than before
    (one K²-row collect vs 8 K-row collects + 8 K-row broadcasts); the
    replay is bit-identical to the Spark expression chain by construction
    (functions/exactmath.py — same IEEE multiply, same HALF_UP decimal(38,12)
    quantize via shortest-round-trip repr, same exact decimal sum, same
    correctly-rounded cast back; differential fuzz in
    tests/test_exactmath.py, old-vs-new equality in
    tests/test_driver_side_iteration.py).  Measured: build 4.8–16 s →
    ~0.5 s at sf0.1 (9 jobs → 1)."""
    from pyspark.sql import Window

    from distributed_mapreduce_in_docker_rpyc_spark.functions.exactmath import mass_step

    # Untyped (NULL event_type) events are not states: drop them from the
    # sequence BEFORE lead(), so a null cell neither becomes a phantom
    # state (it crashed the driver-side sort) nor breaks a real transition.
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("cnt"))
    )
    # ONE K²-bounded collect; states / sink-drop / row-normalization replay
    # the former pf/tot/pr dataflow exactly (integer counts, then the same
    # bigint→double casts and IEEE divide).
    cnt_rows = pairs.collect()
    states = sorted({r.src for r in cnt_rows})  # K event types (~5)
    if not states:
        return spark.createDataFrame([], "event_type string, stationary_p double")
    sset = set(states)
    pf = [(r.src, r.dst, int(r.cnt)) for r in cnt_rows if r.dst in sset]
    tot: dict[str, int] = {}
    for s, _, c in pf:
        tot[s] = tot.get(s, 0) + c
    trans = [(s, d, float(c) / float(tot[s])) for s, d, c in pf]
    pi = {s: 1.0 / float(len(states)) for s in states}
    for _ in range(_MARKOV_ITERS):
        pi = mass_step(pi, trans)
    out = spark.createDataFrame(
        [(s, p) for s, p in pi.items()], "event_type string, stationary_p double"
    )
    return out.select("event_type", F.round("stationary_p", 6).alias("stationary_p"))


@register(
    "events_time_to_convert",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS fv
        FROM events WHERE event_type = 'view' AND user_id IS NOT NULL
        GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS fp
        FROM events e JOIN v ON v.user_id = e.user_id AND e.ts >= v.fv
        WHERE e.event_type = 'purchase'
        GROUP BY e.user_id
    )
    SELECT v.user_id, v.fv AS first_view_ts, p.fp AS first_purchase_ts,
           CASE WHEN p.fp IS NULL THEN NULL
                ELSE epoch_us(p.fp) - epoch_us(v.fv) END AS delay_us,
           CAST(p.fp IS NOT NULL AS INT) AS converted
    FROM v LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert: for every user who ever viewed, the delay from
    FIRST view to the first purchase AT OR AFTER it (exact integer
    microseconds; NULL for users who never converted) — the latency
    distribution behind every conversion-funnel dashboard, and the
    survival-analysis input (`events_funnel` counts stage reach; this
    measures the clock between stages).

    Two map-side-combined MIN aggregates on the uniform user key and one
    equi-join — no window, no per-user loop; the purchase arm filters
    ``ts >= first_view`` INSIDE the join so pre-view purchases never count
    as conversions."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fv"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("fv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp"))
    )
    return (
        v.join(p, "user_id", "left")
        .select(
            "user_id",
            F.col("fv").alias("first_view_ts"),
            F.col("fp").alias("first_purchase_ts"),
            F.when(
                F.col("fp").isNotNull(),
                F.unix_micros("fp") - F.unix_micros("fv"),
            ).alias("delay_us"),
            F.col("fp").isNotNull().cast("int").alias("converted"),
        )
    )


# --- Bradley-Terry preference strengths -------------------------------------
#
# Pairwise-preference aggregation (Bradley & Terry 1952, fitted by the MM
# algorithm of Hunter 2004) — the model behind preference-data pipelines:
# given "A beat B" contest counts, recover a latent strength per entity.
# Entities are the event types; a contest is one (user, day) where two types
# both occurred, won by the type with the larger exact DECIMAL value total
# (ties are no-contests).  The MM update
#
#     s_i <- W_i / sum_j  n_ij / (s_i + s_j)
#
# runs a FIXED 20 iterations.  Cross-engine exactness uses the same recipe
# as logreg_gradient_descent: every input to the float math (n_ij, W_i) is
# an exact integer, and the per-entity denominator is an explicit
# left-associated addition chain in ascending-j order, generated from ONE
# helper for both the DuckDB recursive-CTE oracle and the driver-side
# Python loop — identical operands, identical order, bit-identical result.
# The entity domain is pinned to the fixture's five event types so the
# chain can be unrolled; unknown types are excluded (documented contract).
_BT_TYPES = ("click", "error", "purchase", "signup", "view")
_BT_ITERS = 20


def _bt_pair(i: int, j: int) -> str:
    a, b = min(i, j), max(i, j)
    return f"n{a}{b}"


def _bt_den_sql(i: int) -> str:
    """den_i as an explicit left-assoc chain, ascending j (1-based)."""
    terms = [
        f"(CASE WHEN {_bt_pair(i, j)} > 0 "
        f"THEN {_bt_pair(i, j)} / (s{i} + s{j}) ELSE 0.0 END)"
        for j in range(1, 6)
        if j != i
    ]
    return "(" + " + ".join(terms) + ")"


def _bt_oracle() -> str:
    k = len(_BT_TYPES)
    in_list = ", ".join(f"'{t}'" for t in _BT_TYPES)
    n_cols = ", ".join(
        f"COALESCE(SUM(CASE WHEN ta = '{_BT_TYPES[a - 1]}' AND "
        f"tb = '{_BT_TYPES[b - 1]}' THEN n END), 0) AS n{a}{b}"
        for a in range(1, k + 1)
        for b in range(a + 1, k + 1)
    )
    w_cols = ", ".join(
        f"COALESCE(SUM(CASE WHEN ta = '{_BT_TYPES[i - 1]}' THEN wa "
        f"WHEN tb = '{_BT_TYPES[i - 1]}' THEN wb END), 0) AS w{i}"
        for i in range(1, k + 1)
    )
    mat_pass = ", ".join(
        [f"n{a}{b}" for a in range(1, k + 1) for b in range(a + 1, k + 1)]
        + [f"w{i}" for i in range(1, k + 1)]
    )
    upd = ", ".join(
        f"CASE WHEN w{i} > 0 AND {_bt_den_sql(i)} > 0 "
        f"THEN w{i} / {_bt_den_sql(i)} ELSE 0.0 END"
        for i in range(1, k + 1)
    )
    tot = "(" + " + ".join(f"s{i}" for i in range(1, k + 1)) + ")"
    strength = (
        "CASE p.event_type "
        + " ".join(
            f"WHEN '{_BT_TYPES[i - 1]}' THEN ROUND(s{i} / {tot}, 6)"
            for i in range(1, k + 1)
        )
        + " END"
    )
    # CAST(1.0 AS DOUBLE) seeds: a bare 1.0 literal is DECIMAL(2,1) in
    # DuckDB, and the recursive arm inherits the non-recursive arm's column
    # types — strengths would be truncated to one decimal place on every
    # iteration (s stuck at 1.0, uniform 0.2 output).
    return f"""
    WITH RECURSIVE daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, event_type,
               SUM(CAST(value AS DECIMAL(30,6))) AS tot
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL
          AND event_type IN ({in_list})
        GROUP BY 1, 2, 3
    ),
    duels AS (
        SELECT a.event_type AS ta, b.event_type AS tb,
               CASE WHEN a.tot > b.tot THEN 1
                    WHEN b.tot > a.tot THEN 2 ELSE 0 END AS win
        FROM daily a
        JOIN daily b ON a.user_id = b.user_id AND a.day = b.day
                    AND a.event_type < b.event_type
    ),
    pairs AS (
        SELECT ta, tb, COUNT(*) AS n,
               SUM(CASE WHEN win = 1 THEN 1 ELSE 0 END) AS wa,
               SUM(CASE WHEN win = 2 THEN 1 ELSE 0 END) AS wb
        FROM duels WHERE win != 0 GROUP BY ta, tb
    ),
    mat AS (SELECT {n_cols}, {w_cols} FROM pairs),
    it AS (
        SELECT 0 AS t,
               {", ".join(f"CAST(1.0 AS DOUBLE) AS s{i}" for i in range(1, k + 1))},
               {mat_pass}
        FROM mat
        UNION ALL
        SELECT t + 1, {upd}, {mat_pass}
        FROM it WHERE t < {_BT_ITERS}
    ),
    per_type AS (
        SELECT et AS event_type, SUM(w) AS wins, SUM(n) AS contests
        FROM (SELECT ta AS et, wa AS w, n FROM pairs
              UNION ALL
              SELECT tb AS et, wb AS w, n FROM pairs)
        GROUP BY et
    )
    SELECT p.event_type,
           CAST(p.wins AS BIGINT) AS wins,
           CAST(p.contests AS BIGINT) AS contests,
           {strength} AS bt_strength,
           ROW_NUMBER() OVER (ORDER BY {strength} DESC, p.event_type ASC)
               AS bt_rank
    FROM per_type p, (SELECT * FROM it WHERE t = {_BT_ITERS})
    """


@register("bradley_terry_strength", oracle=_bt_oracle())
def bradley_terry_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry preference strengths over the five event types, fitted
    by 20 MM iterations (Hunter 2004) — the pairwise-preference model a
    RLHF/ranking data pipeline runs over comparison logs, expressed as one
    contest-counting DAG plus a constant-size driver-side fit.

    Contests: within each (user, day), every pair of event types both
    present duels; the larger exact DECIMAL(30,6) value total wins, ties
    are dropped.  Self-join fan-out is bounded: per (user, day) group at
    most K=5 rows -> at most 10 pair rows.

    Shape at 100 TB: the duel build is one shuffle on (user, day) uniform
    keys; the win matrix is K(K-1)/2 + K = 15 exact integers — a
    domain-bounded collect (the same bounded-scalar pattern as the GD
    model state), so driver traffic is CONSTANT regardless of corpus
    size.  The MM fit itself is O(K^2) per iteration on the driver.
    Cross-engine bit-identity: the denominator chains in the Python loop
    below and in the recursive-CTE oracle are generated with the same
    ascending-j left-associated order over the same exact integers, so
    20 chained float iterations still hash-match at 6 places."""
    k = len(_BT_TYPES)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_type").isin(*_BT_TYPES)
    )
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.sum(F.col("value").cast("decimal(30,6)")).alias("tot"))
    a, b = daily.alias("a"), daily.alias("b")
    duels = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .select(
            F.col("a.event_type").alias("ta"),
            F.col("b.event_type").alias("tb"),
            F.when(F.col("a.tot") > F.col("b.tot"), F.lit(1))
            .when(F.col("b.tot") > F.col("a.tot"), F.lit(2))
            .otherwise(F.lit(0))
            .alias("win"),
        )
        .filter(F.col("win") != 0)
    )
    pairs = duels.groupBy("ta", "tb").agg(
        F.count("*").alias("n"),
        F.sum((F.col("win") == 1).cast("int")).alias("wa"),
        F.sum((F.col("win") == 2).cast("int")).alias("wb"),
    )
    pairs = pairs.persist()
    # Domain-bounded collect: at most K(K-1)/2 = 10 rows of exact integers.
    idx = {t: i + 1 for i, t in enumerate(_BT_TYPES)}
    n = [[0] * (k + 1) for _ in range(k + 1)]
    w = [0] * (k + 1)
    for row in pairs.collect():
        i, j = idx[row["ta"]], idx[row["tb"]]
        n[i][j] = n[j][i] = int(row["n"])
        w[i] += int(row["wa"])
        w[j] += int(row["wb"])
    s = [0.0] * (k + 1)
    for i in range(1, k + 1):
        s[i] = 1.0
    for _ in range(_BT_ITERS):
        nxt = list(s)
        for i in range(1, k + 1):
            den = None
            for j in range(1, k + 1):
                if j == i:
                    continue
                term = n[i][j] / (s[i] + s[j]) if n[i][j] > 0 else 0.0
                den = term if den is None else den + term
            nxt[i] = w[i] / den if (w[i] > 0 and den > 0) else 0.0
        s = nxt
    tot = s[1]
    for i in range(2, k + 1):
        tot = tot + s[i]
    per_type = (
        pairs.select(F.col("ta").alias("et"), F.col("wa").alias("w"), "n")
        .unionAll(pairs.select(F.col("tb").alias("et"), F.col("wb").alias("w"), "n"))
        .groupBy(F.col("et").alias("event_type"))
        .agg(F.sum("w").alias("wins"), F.sum("n").alias("contests"))
    )
    strength = F.lit(None).cast("double")
    for t in _BT_TYPES:
        # s_i / tot computed here with the same float division the oracle's
        # final SELECT performs, injected as an exact repr literal; the
        # 6-place rounding happens ENGINE-side (Spark ROUND == DuckDB ROUND
        # = half-away-from-zero on positives — Python's banker's round would
        # not match at a .5 boundary).
        val = s[idx[t]] / tot if tot > 0 else None
        strength = F.when(
            F.col("event_type") == t, F.round(F.lit(val), 6)
        ).otherwise(strength)
    out = per_type.withColumn("bt_strength", strength)
    win = Window.orderBy(F.desc("bt_strength"), F.asc("event_type"))
    return out.withColumn("bt_rank", F.row_number().over(win).cast("bigint"))


# --- Kaplan-Meier survival over user activity spans --------------------------


@register(
    "survival_kaplan_meier",
    oracle="""
    WITH spans AS (
        SELECT user_id, MIN(ts) AS t0,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    horizon AS (SELECT MAX(ts) AS tmax FROM events),
    obs AS (
        SELECT CASE WHEN s.tp IS NOT NULL
                    THEN datediff('day', CAST(s.t0 AS DATE), CAST(s.tp AS DATE))
                    ELSE datediff('day', CAST(s.t0 AS DATE), CAST(h.tmax AS DATE))
               END AS dur,
               CASE WHEN s.tp IS NULL THEN 1 ELSE 0 END AS censored
        FROM spans s, horizon h
    ),
    grp AS (
        SELECT dur, SUM(1 - censored) AS d, SUM(censored) AS c
        FROM obs GROUP BY dur
    ),
    risk AS (
        SELECT dur, d, c,
               SUM(d + c) OVER (ORDER BY dur
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
        FROM grp
    ),
    km AS (
        SELECT dur, d, c, n_risk,
               SUM(CASE WHEN d > 0 AND d < n_risk
                        THEN ln(1.0 - (CAST(d AS DOUBLE) / n_risk))
                        ELSE 0.0 END)
                   OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS log_s,
               MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
                   OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS hit_zero
        FROM risk
    )
    SELECT CAST(dur AS BIGINT) AS duration_days,
           CAST(d AS BIGINT) AS n_events,
           CAST(c AS BIGINT) AS n_censored,
           CAST(n_risk AS BIGINT) AS n_at_risk,
           CASE WHEN hit_zero = 0 THEN ROUND(log_s, 6) END AS log_survival,
           CASE WHEN hit_zero = 1 THEN 0.0 ELSE ROUND(exp(log_s), 6) END
               AS survival
    FROM km WHERE d > 0
    """,
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier curve for time-to-first-purchase: per user, days from
    first event to first purchase; users who never purchase are
    right-censored at the observation horizon — the product-limit
    estimator (Kaplan & Meier 1958) that conversion/churn pipelines run.
    One row per conversion time: events (conversions), censored count,
    risk-set size, and cumulative "survival" S(t) = Π (1 - d/n) (the
    probability of remaining unconverted past t).

    Cross-engine exactness: d and n_risk are exact integers (the risk set
    is a REVERSED cumulative sum over duration groups — no per-user sort),
    each factor's ln((n-d)/n) is libm over bit-identical doubles, and the
    cumulative sum runs in pinned duration order; if any group kills the
    whole risk set (d = n_risk) the curve is pinned to exactly 0.0 from
    that point (ln(0) is NULL in Spark but -inf in DuckDB — the CASE keeps
    both engines on the same branch).

    Shape at 100 TB: one groupBy(user) for spans, one groupBy(duration)
    for the curve — the window runs over DISTINCT DURATIONS (calendar-
    bounded, thousands), never users.  The observation horizon rides a
    broadcast 1-row frame."""
    ev = load_table(spark, sf_dir, "events")
    spans = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("t0"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
                "tp"
            ),
        )
    )
    horizon = ev.agg(F.max("ts").alias("tmax"))
    obs = spans.crossJoin(F.broadcast(horizon)).selectExpr(
        "CASE WHEN tp IS NOT NULL"
        " THEN datediff(CAST(tp AS DATE), CAST(t0 AS DATE))"
        " ELSE datediff(CAST(tmax AS DATE), CAST(t0 AS DATE)) END AS dur",
        "CASE WHEN tp IS NULL THEN 1 ELSE 0 END AS censored",
    )
    grp = obs.groupBy("dur").agg(
        F.expr("SUM(1 - censored)").alias("d"),
        F.expr("SUM(censored)").alias("c"),
    )
    w_fwd = (
        Window.orderBy("dur")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w_back = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    risk = grp.select(
        "dur", "d", "c", F.sum(F.col("d") + F.col("c")).over(w_fwd).alias("n_risk")
    )
    km = risk.select(
        "dur",
        "d",
        "c",
        "n_risk",
        F.sum(
            F.expr(
                "CASE WHEN d > 0 AND d < n_risk"
                " THEN ln(1.0 - (CAST(d AS DOUBLE) / n_risk)) ELSE 0.0 END"
            )
        )
        .over(w_back)
        .alias("log_s"),
        F.max(F.expr("CASE WHEN d = n_risk THEN 1 ELSE 0 END"))
        .over(w_back)
        .alias("hit_zero"),
    )
    return km.filter(F.col("d") > 0).selectExpr(
        "CAST(dur AS BIGINT) AS duration_days",
        "CAST(d AS BIGINT) AS n_events",
        "CAST(c AS BIGINT) AS n_censored",
        "CAST(n_risk AS BIGINT) AS n_at_risk",
        "CASE WHEN hit_zero = 0 THEN ROUND(log_s, 6) END AS log_survival",
        "CASE WHEN hit_zero = 1 THEN 0.0 ELSE ROUND(exp(log_s), 6) END AS survival",
    )


# --- CUSUM changepoint detection on the daily value series -------------------


@register(
    "events_cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(30,6))) AS v
        FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    seq AS (
        SELECT day, v,
               ROW_NUMBER() OVER (ORDER BY day) AS i,
               SUM(v) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(v) OVER () AS sv,
               COUNT(*) OVER () AS nd
        FROM daily
    ),
    cus AS (
        SELECT day, v, i,
               CAST(cum AS DOUBLE)
                   - (CAST(i AS DOUBLE) * (CAST(sv AS DOUBLE) / nd)) AS cusum
        FROM seq
    )
    SELECT day,
           ROUND(CAST(v AS DOUBLE), 6) AS daily_value,
           ROUND(cusum, 6) AS cusum,
           CAST(CASE WHEN ABS(cusum) = MAX(ABS(cusum)) OVER () THEN 1 ELSE 0 END
                AS INT) AS is_changepoint
    FROM cus
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the daily event-value series: the
    cumulative sum of deviations from the global mean, C_d = Σ(v_u − μ),
    peaks in magnitude at the most likely mean-shift point (Page 1954;
    the standard offline CUSUM screen a metrics pipeline runs before
    alerting).  Every day is emitted with its CUSUM value; the argmax |C|
    day(s) carry is_changepoint = 1.

    Exactness: daily sums and the cumulative prefix ride exact
    DECIMAL(30,6); the deviation form is algebraically restated as
    cum_d − i·μ so the ONLY float operations are one division (μ), one
    multiplication, and one subtraction per day — no per-day float
    accumulation to drift.  The argmax compares bit-identical doubles.

    Shape at 100 TB: one map-side-combined groupBy(day); all windows run
    over the calendar-bounded daily frame (thousands of rows), so the
    unpartitioned window is a non-issue — the heavy data never reaches
    a single partition."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(30,6)")).alias("v")
    )
    w_ord = Window.orderBy("day")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    seq = daily.select(
        "day",
        "v",
        F.row_number().over(w_ord).alias("i"),
        F.sum("v").over(w_cum).alias("cum"),
        F.sum("v").over(w_all).alias("sv"),
        F.count("*").over(w_all).alias("nd"),
    )
    cus = seq.selectExpr(
        "day",
        "v",
        "i",
        "CAST(cum AS DOUBLE) - (CAST(i AS DOUBLE) * (CAST(sv AS DOUBLE) / nd))"
        " AS cusum",
    )
    return cus.select(
        "day",
        F.expr("ROUND(CAST(v AS DOUBLE), 6)").alias("daily_value"),
        F.round("cusum", 6).alias("cusum"),
        (F.abs(F.col("cusum")) == F.max(F.abs(F.col("cusum"))).over(w_all))
        .cast("int")
        .alias("is_changepoint"),
    )


@register(
    "events_interval_coverage",
    oracle="""
    WITH iv AS (
        SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
               CAST(FLOOR(epoch(ts)) AS BIGINT) + 300 AS e
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    sweep AS (
        SELECT user_id, s, e,
               MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS prev_max
        FROM iv
    ),
    isl AS (
        SELECT user_id, s, e,
               SUM(CASE WHEN prev_max IS NULL OR s > prev_max
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS island
        FROM sweep
    ),
    agg AS (
        SELECT user_id, island, MIN(s) AS lo, MAX(e) AS hi
        FROM isl GROUP BY user_id, island
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(hi - lo) AS BIGINT) AS covered_seconds
    FROM agg GROUP BY user_id
    """,
)
def events_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION-of-intervals per user: pad every event to a 300-second activity
    interval, merge overlaps with the classic sweep (running max of
    interval ends detects island starts), and report each user's merged
    interval count and total covered seconds — the 'true active time'
    metric that naive SUM(duration) double-counts and `events_sessionize`
    (gap-based session counting) does not expose.

    All integer-seconds arithmetic (exact everywhere); two windows and two
    aggregations, every one partitioned by user_id — at 100 TB this is one
    shuffle on the user key and per-user state no wider than a running
    max."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull()).selectExpr(
        "user_id",
        "CAST(unix_timestamp(ts) AS BIGINT) AS s",
        "CAST(unix_timestamp(ts) AS BIGINT) + 300 AS e",
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sweep = iv.withColumn("prev_max", F.max("e").over(w_prev))
    isl = sweep.withColumn(
        "island",
        F.sum(
            F.expr("CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END")
        ).over(w_cum),
    )
    agg = isl.groupBy("user_id", "island").agg(
        F.min("s").alias("lo"), F.max("e").alias("hi")
    )
    return agg.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_intervals"),
        F.sum(F.col("hi") - F.col("lo")).cast("bigint").alias("covered_seconds"),
    )


# --- Two-sample Poisson rate test ---------------------------------------------
#
# Normal-approximation z for a rate difference: the only inputs are four
# exact integers (two counts, two exposures), so the shared float algebra
# is bit-identical cross-engine.
_PR_Z = (
    "(((kwe / twe) - (kwd / twd))"
    " / NULLIF(sqrt((kwe / (twe * twe)) + (kwd / (twd * twd))), 0.0))"
)


@register(
    "events_poisson_rate_test",
    oracle=f"""
    WITH ev AS (
        SELECT CASE WHEN date_part('isodow', ts) IN (6, 7) THEN 1 ELSE 0 END AS we,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p,
               CAST(ts AS DATE) AS d
        FROM events WHERE ts IS NOT NULL
    ),
    s AS (
        SELECT CAST(SUM(CASE WHEN we = 1 THEN p ELSE 0 END) AS DOUBLE) AS kwe,
               CAST(SUM(CASE WHEN we = 0 THEN p ELSE 0 END) AS DOUBLE) AS kwd,
               CAST(COUNT(DISTINCT CASE WHEN we = 1 THEN d END) AS DOUBLE) AS twe,
               CAST(COUNT(DISTINCT CASE WHEN we = 0 THEN d END) AS DOUBLE) AS twd
        FROM ev
    )
    SELECT CAST(kwe AS BIGINT) AS n_weekend_purchases,
           CAST(kwd AS BIGINT) AS n_weekday_purchases,
           CAST(twe AS BIGINT) AS weekend_days,
           CAST(twd AS BIGINT) AS weekday_days,
           ROUND(kwe / twe, 6) AS weekend_rate,
           ROUND(kwd / twd, 6) AS weekday_rate,
           ROUND({_PR_Z}, 6) AS z_score
    FROM s
    """,
)
def events_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Poisson rate test: is the weekend purchase rate
    (purchases per observed weekend day) different from the weekday
    rate?  z = (λ̂₁−λ̂₂)/√(k₁/T₁² + k₂/T₂²) — the unpooled
    normal-approximation test for count processes, the standard guardrail
    check before attributing a rate shift to a launch.

    Exposure is measured, not assumed: T = DISTINCT observed dates per
    class (from ALL events, so a day with zero purchases still counts as
    exposure).  Everything reduces to ONE aggregate over one scan — two
    conditional sums and two conditional distinct-date counts (the
    distinct expand is calendar-bounded) — and the z algebra is a shared
    expression string over four exact integers.  Weekend classification
    is ISO day-of-week (Spark ``weekday()+1`` ≡ DuckDB ``isodow``; the
    engines' raw ``dayofweek`` disagree on the week start, documented
    here so nobody 'simplifies' it back).  At 100 TB: one scan, four
    integers of state."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .selectExpr(
            "CASE WHEN weekday(ts) + 1 IN (6, 7) THEN 1 ELSE 0 END AS we",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p",
            "CAST(ts AS DATE) AS d",
        )
    )
    s = ev.agg(
        F.sum(F.expr("CASE WHEN we = 1 THEN p ELSE 0 END")).cast("double").alias("kwe"),
        F.sum(F.expr("CASE WHEN we = 0 THEN p ELSE 0 END")).cast("double").alias("kwd"),
        F.count_distinct(F.expr("CASE WHEN we = 1 THEN d END"))
        .cast("double")
        .alias("twe"),
        F.count_distinct(F.expr("CASE WHEN we = 0 THEN d END"))
        .cast("double")
        .alias("twd"),
    )
    return s.selectExpr(
        "CAST(kwe AS BIGINT) AS n_weekend_purchases",
        "CAST(kwd AS BIGINT) AS n_weekday_purchases",
        "CAST(twe AS BIGINT) AS weekend_days",
        "CAST(twd AS BIGINT) AS weekday_days",
        "ROUND(kwe / twe, 6) AS weekend_rate",
        "ROUND(kwd / twd, 6) AS weekday_rate",
        f"ROUND({_PR_Z}, 6) AS z_score",
    )


@register(
    "events_cohort_ltv",
    oracle="""
    WITH firstd AS (
        SELECT user_id, date_trunc('week', MIN(CAST(ts AS DATE))) AS cohort
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        GROUP BY user_id
    ),
    rev AS (
        SELECT f.cohort,
               CAST(FLOOR(date_diff('day', f.cohort, CAST(e.ts AS DATE)) / 7.0)
                    AS BIGINT) AS age_week,
               CAST(ROUND(e.value, 6) AS DECIMAL(18,6)) AS v
        FROM events e JOIN firstd f ON f.user_id = e.user_id
        WHERE e.ts IS NOT NULL AND e.event_type = 'purchase'
          AND e.value IS NOT NULL
    ),
    weekly AS (
        SELECT cohort, age_week, SUM(v) AS wk_rev
        FROM rev GROUP BY cohort, age_week
    ),
    sized AS (
        SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_users FROM firstd
        GROUP BY cohort
    )
    SELECT CAST(w.cohort AS DATE) AS cohort_week,
           w.age_week,
           s.cohort_users,
           CAST(SUM(w.wk_rev) OVER (PARTITION BY w.cohort ORDER BY w.age_week
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS cum_revenue,
           ROUND(CAST(SUM(w.wk_rev) OVER (PARTITION BY w.cohort ORDER BY w.age_week
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / s.cohort_users, 6) AS ltv_per_user
    FROM weekly w JOIN sized s ON s.cohort = w.cohort
    """,
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users grouped by first-seen ISO week,
    cumulative purchase revenue by cohort age in weeks, per-user LTV — the
    growth-accounting surface `events_cohort_retention` lacks (retention
    counts heads; this follows the money).

    Two user-keyed aggregates (first-seen, then revenue joined back on the
    uniform user key), one calendar-bounded window for the running sum.
    Revenue rides DECIMAL(18,6) sums of 6-rounded values so the cumulative
    totals are order-independent; week bucketing is date_trunc('week')
    (ISO Monday in both engines) and age is integer day-difference
    division.  At 100 TB: the joins shuffle on user_id; every frame after
    `weekly` is (cohorts × ages) rows — calendar-bounded."""
    ev = load_table(spark, sf_dir, "events")
    firstd = (
        ev.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min(F.col("ts").cast("date"))).cast("date").alias("cohort"))
    )
    rev = (
        ev.filter(
            F.col("ts").isNotNull()
            & (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .join(firstd, "user_id")
        .selectExpr(
            "cohort",
            "CAST(FLOOR(datediff(CAST(ts AS DATE), cohort) / 7.0) AS BIGINT)"
            " AS age_week",
            "CAST(ROUND(value, 6) AS DECIMAL(18,6)) AS v",
        )
    )
    weekly = rev.groupBy("cohort", "age_week").agg(F.sum("v").alias("wk_rev"))
    sized = firstd.groupBy("cohort").agg(
        F.count("*").cast("bigint").alias("cohort_users")
    )
    w_cum = (
        Window.partitionBy("cohort")
        .orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        weekly.join(F.broadcast(sized), "cohort")
        .select(
            F.col("cohort").alias("cohort_week"),
            "age_week",
            "cohort_users",
            F.sum("wk_rev").over(w_cum).cast("double").alias("cum_revenue"),
            F.round(
                F.sum("wk_rev").over(w_cum).cast("double") / F.col("cohort_users"), 6
            ).alias("ltv_per_user"),
        )
    )


@register(
    "events_did_analysis",
    oracle="""
    WITH base AS (
        SELECT user_id % 2 AS treat,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
               CAST(ROUND(value, 6) AS DECIMAL(24,6)) AS v
        FROM events
        WHERE event_type = 'purchase' AND value IS NOT NULL AND ts IS NOT NULL
    ),
    thr AS (
        SELECT CAST(FLOOR((MIN(sec) + MAX(sec)) / 2.0) AS BIGINT) AS cut FROM base
    ),
    cells AS (
        SELECT treat, CASE WHEN sec >= cut THEN 1 ELSE 0 END AS post,
               COUNT(*) AS n, SUM(v) AS s
        FROM base, thr
        GROUP BY treat, CASE WHEN sec >= cut THEN 1 ELSE 0 END
    ),
    m AS (
        SELECT
            MAX(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n_tp,
            MAX(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n_tq,
            MAX(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n_cp,
            MAX(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n_cq,
            CAST(MAX(CASE WHEN treat = 1 AND post = 0 THEN s END) AS DOUBLE)
                / MAX(CASE WHEN treat = 1 AND post = 0 THEN n END) AS m_tp,
            CAST(MAX(CASE WHEN treat = 1 AND post = 1 THEN s END) AS DOUBLE)
                / MAX(CASE WHEN treat = 1 AND post = 1 THEN n END) AS m_tq,
            CAST(MAX(CASE WHEN treat = 0 AND post = 0 THEN s END) AS DOUBLE)
                / MAX(CASE WHEN treat = 0 AND post = 0 THEN n END) AS m_cp,
            CAST(MAX(CASE WHEN treat = 0 AND post = 1 THEN s END) AS DOUBLE)
                / MAX(CASE WHEN treat = 0 AND post = 1 THEN n END) AS m_cq
        FROM cells
    )
    SELECT CAST(n_tp AS BIGINT) AS n_treat_pre,
           CAST(n_tq AS BIGINT) AS n_treat_post,
           CAST(n_cp AS BIGINT) AS n_ctrl_pre,
           CAST(n_cq AS BIGINT) AS n_ctrl_post,
           ROUND(m_tp, 6) AS mean_treat_pre,
           ROUND(m_tq, 6) AS mean_treat_post,
           ROUND(m_cp, 6) AS mean_ctrl_pre,
           ROUND(m_cq, 6) AS mean_ctrl_post,
           ROUND((m_tq - m_tp) - (m_cq - m_cp), 6) AS did_estimate
    FROM m
    """,
)
def events_did_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate on purchase values: treatment =
    odd user_id (standing in for the rollout cohort), post = the second
    half of the observed time range (cut at the midpoint epoch second),
    DiD = (treat post − pre) − (control post − pre) — the first-line
    causal-impact readout for any feature launch with a concurrent
    control.  Cell means ride ROUND(value,6) DECIMAL sums so they are
    order-independent; every division and subtraction then acts on
    engine-identical doubles.

    Scale posture: one scan, conditional aggregation into 4 cells + a
    broadcast 1-row epoch threshold; output is a single row."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select(
            (F.col("user_id") % 2).alias("treat"),
            F.unix_timestamp("ts").alias("sec"),
            F.round("value", 6).cast("decimal(24,6)").alias("v"),
        )
    )
    thr = ev.agg(
        F.floor((F.min("sec") + F.max("sec")) / 2.0).cast("bigint").alias("cut")
    )
    cells = (
        ev.crossJoin(F.broadcast(thr))
        .groupBy("treat", (F.col("sec") >= F.col("cut")).cast("int").alias("post"))
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    cell = lambda t, p, c: F.max(  # noqa: E731
        F.when((F.col("treat") == t) & (F.col("post") == p), F.col(c))
    )
    m = cells.agg(
        cell(1, 0, "n").alias("n_tp"),
        cell(1, 1, "n").alias("n_tq"),
        cell(0, 0, "n").alias("n_cp"),
        cell(0, 1, "n").alias("n_cq"),
        (cell(1, 0, "s").cast("double") / cell(1, 0, "n")).alias("m_tp"),
        (cell(1, 1, "s").cast("double") / cell(1, 1, "n")).alias("m_tq"),
        (cell(0, 0, "s").cast("double") / cell(0, 0, "n")).alias("m_cp"),
        (cell(0, 1, "s").cast("double") / cell(0, 1, "n")).alias("m_cq"),
    )
    return m.select(
        F.col("n_tp").cast("bigint").alias("n_treat_pre"),
        F.col("n_tq").cast("bigint").alias("n_treat_post"),
        F.col("n_cp").cast("bigint").alias("n_ctrl_pre"),
        F.col("n_cq").cast("bigint").alias("n_ctrl_post"),
        F.round("m_tp", 6).alias("mean_treat_pre"),
        F.round("m_tq", 6).alias("mean_treat_post"),
        F.round("m_cp", 6).alias("mean_ctrl_pre"),
        F.round("m_cq", 6).alias("mean_ctrl_post"),
        F.round(
            (F.col("m_tq") - F.col("m_tp")) - (F.col("m_cq") - F.col("m_cp")), 6
        ).alias("did_estimate"),
    )


@register(
    "events_session_gap_sensitivity",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
               CAST(FLOOR(epoch(ts)) AS BIGINT)
                 - LAG(CAST(FLOOR(epoch(ts)) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events WHERE ts IS NOT NULL
    ),
    gaps AS (
        SELECT g AS gap_minutes FROM (VALUES (10), (30), (60)) t(g)
    ),
    agg AS (
        SELECT COUNT(*) AS n_events,
               SUM(CASE WHEN gap IS NULL OR gap > 10 * 60 THEN 1 ELSE 0 END) AS s10,
               SUM(CASE WHEN gap IS NULL OR gap > 30 * 60 THEN 1 ELSE 0 END) AS s30,
               SUM(CASE WHEN gap IS NULL OR gap > 60 * 60 THEN 1 ELSE 0 END) AS s60
        FROM seq
    )
    SELECT gap_minutes,
           CAST(CASE gap_minutes WHEN 10 THEN s10 WHEN 30 THEN s30 ELSE s60 END
                AS BIGINT) AS n_sessions,
           ROUND(CAST(n_events AS DOUBLE)
                 / (CASE gap_minutes WHEN 10 THEN s10 WHEN 30 THEN s30 ELSE s60 END),
                 6) AS avg_events_per_session
    FROM agg, gaps
    """,
)
def events_session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization parameter sweep: session counts and mean session size
    at 10/30/60-minute inactivity gaps, all THREE thresholds priced from
    ONE per-user LAG pass — the sensitivity table an analyst builds before
    fixing `events_sessionize`'s gap constant.  A session starts where the
    user's inter-event gap exceeds the threshold (or at their first
    event), so each threshold is one conditional sum over the same
    gap column — no per-threshold rescan, no per-threshold shuffle.

    Scale posture: one window shuffle on user_id (the same partitioning
    every sessionization needs), one scalar reduce, a 3-row broadcast
    spine for presentation."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.unix_timestamp("ts").alias("sec"),
        (F.unix_timestamp("ts") - F.lag(F.unix_timestamp("ts")).over(w)).alias("gap"),
    )
    starts = lambda m: F.sum(  # noqa: E731
        F.when(F.col("gap").isNull() | (F.col("gap") > m * 60), 1).otherwise(0)
    )
    agg = seq.agg(
        F.count("*").alias("n_events"),
        starts(10).alias("s10"),
        starts(30).alias("s30"),
        starts(60).alias("s60"),
    )
    gaps = agg.sparkSession.createDataFrame(
        [(10,), (30,), (60,)], "gap_minutes int"
    )
    n_sessions = (
        F.when(F.col("gap_minutes") == 10, F.col("s10"))
        .when(F.col("gap_minutes") == 30, F.col("s30"))
        .otherwise(F.col("s60"))
    )
    return (
        F.broadcast(agg)
        .crossJoin(gaps)
        .select(
            "gap_minutes",
            n_sessions.cast("bigint").alias("n_sessions"),
            F.round(F.col("n_events").cast("double") / n_sessions, 6).alias(
                "avg_events_per_session"
            ),
        )
    )


_ATTR_ITERS = 12


def _attr_oracle() -> str:
    """Unrolled 12-step absorption iteration for the full chain and every
    removal chain JOINTLY (chain is a key column, so one CTE chain serves
    all 5 chains).  Same DECIMAL(38,12)-quantized mass sums as
    `_markov_oracle`, so every iterate is bit-identical cross-engine."""
    steps = []
    prev = "at0"
    for i in range(1, _ATTR_ITERS + 1):
        steps.append(
            f"""
    at{i} AS (
        SELECT p.chain, p.dst AS s,
               CAST(SUM(CAST({prev}.pi * p.pv AS DECIMAL(38,12))) AS DOUBLE) AS pi
        FROM {prev} JOIN pra p ON p.chain = {prev}.chain AND p.src = {prev}.s
        GROUP BY p.chain, p.dst
    )"""
        )
        prev = f"at{i}"
    return (
        """
    WITH chseq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS nxt,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM events
        WHERE event_type IS NOT NULL AND event_type != 'purchase'
          AND user_id IS NOT NULL
    ),
    conv AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    bi AS (
        SELECT event_type AS src, nxt AS dst FROM chseq WHERE nxt IS NOT NULL
        UNION ALL
        SELECT 'START', event_type FROM chseq WHERE rn = 1
        UNION ALL
        SELECT c.event_type,
               CASE WHEN v.user_id IS NULL THEN 'NULL' ELSE 'CONV' END
        FROM chseq c LEFT JOIN conv v ON v.user_id = c.user_id
        WHERE c.rn = c.n
    ),
    cnts AS (SELECT src, dst, COUNT(*) AS cnt FROM bi GROUP BY src, dst),
    tot AS (SELECT src, SUM(cnt) AS n FROM cnts GROUP BY src),
    pr0 AS (
        SELECT c.src, c.dst, CAST(c.cnt AS DOUBLE) / CAST(t.n AS DOUBLE) AS pv
        FROM cnts c JOIN tot t ON t.src = c.src
    ),
    chans AS (SELECT DISTINCT src AS ch FROM pr0 WHERE src != 'START'),
    prs AS (
        SELECT 'full' AS chain, src, dst, SUM(pv) AS pv
        FROM pr0 GROUP BY src, dst
        UNION ALL
        SELECT 'rm:' || c.ch AS chain, p.src,
               CASE WHEN p.dst = c.ch THEN 'NULL' ELSE p.dst END AS dst,
               SUM(p.pv) AS pv
        FROM pr0 p JOIN chans c ON p.src != c.ch
        GROUP BY 1, 2, 3
    ),
    pra AS (
        SELECT chain, src, dst, pv FROM prs
        UNION ALL
        SELECT DISTINCT chain, v.s, v.s, 1.0
        FROM prs, (VALUES ('CONV'), ('NULL')) v(s)
    ),
    at0 AS (SELECT DISTINCT chain, 'START' AS s, 1.0 AS pi FROM prs),"""
        + ",".join(steps)
        + f"""
    ,
    fin AS (
        SELECT chain, pi FROM at{_ATTR_ITERS} WHERE s = 'CONV'
    ),
    eff AS (
        SELECT substr(f.chain, 4) AS channel,
               fl.p_full AS p_full, f.pi AS p_rm,
               ROUND(1.0 - f.pi / fl.p_full, 9) AS eff9
        FROM fin f, (SELECT pi AS p_full FROM fin WHERE chain = 'full') fl
        WHERE f.chain != 'full'
    )
    SELECT channel,
           ROUND(p_full, 6) AS p_conv_full,
           ROUND(p_rm, 6) AS p_conv_removed,
           ROUND(eff9, 6) AS removal_effect,
           ROUND(eff9 / SUM(eff9) OVER (), 6) AS attribution_share
    FROM eff
    """
    )


@register("events_markov_attribution", oracle=_attr_oracle())
def events_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven (Markov removal-effect) attribution: user journeys are
    the per-user channel sequences (all non-purchase event types, ordered
    by ts with event_id tie-break), START-prefixed and terminated in CONV
    (the user ever purchased) or NULL; first-order transition probabilities
    feed an absorbing chain, and each channel's credit is its REMOVAL
    EFFECT — 1 − P(conv | channel's inbound edges redirected to NULL) /
    P(conv) — normalized into attribution shares (Anderl et al. 2014; the
    standard upgrade from the heuristic `events_attribution_credit`
    last/first/linear rules to credits the journey data itself implies).

    Absorption probabilities use a fixed 12-step iteration (mass starts at
    START, CONV/NULL are self-loop absorbing), all five chains — full +
    one per removed channel — advancing JOINTLY as one (chain, state)
    keyed frame.  Each step's mass sums are DECIMAL(38,12)-quantized (the
    `events_markov_stationary` trick), so every iterate, both conversion
    probabilities, and the final shares are bit-identical cross-engine.

    Scale posture: the heavy work — journey bigram counting — is one
    window pass + one aggregate over events; everything after lives on
    K²-bounded transition rows (K = event-type vocabulary ≈ 5), collected
    ONCE — constant driver state.

    r11 (VERDICT r10 #3, guide §1.2 step 1): the removal-chain construction
    and all 12 absorption steps replay on the DRIVER over the one collected
    bigram-count frame instead of 12 Spark jobs over a persisted
    (chain,src,dst) frame plus a K-branch union build.  Bit-identity of the
    replay: the chain construction is ≤2-term commutative double addition
    (each redirected group merges at most {pv(src,c), pv(src,'NULL')}), and
    each step is the exact quantized mass sum of functions/exactmath.py;
    old-vs-new equality is asserted in tests/test_driver_side_iteration.py
    and the oracle hash is unchanged at all three SFs.  Measured: build
    11–16 s → ~0.6 s at sf0.1 (14 jobs → 1)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
    )
    ch = ev.filter(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id")
    seq = ch.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("nxt"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wall).alias("n"),
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("is_conv", F.lit(1))
    )
    bi = (
        seq.filter(F.col("nxt").isNotNull())
        .select(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .unionByName(
            seq.filter(F.col("rn") == 1).select(
                F.lit("START").alias("src"), F.col("event_type").alias("dst")
            )
        )
        .unionByName(
            seq.filter(F.col("rn") == F.col("n"))
            .join(conv, "user_id", "left")
            .select(
                F.col("event_type").alias("src"),
                F.when(F.col("is_conv").isNull(), F.lit("NULL"))
                .otherwise(F.lit("CONV"))
                .alias("dst"),
            )
        )
    )
    cnts = bi.groupBy("src", "dst").agg(F.count("*").alias("cnt"))
    # ONE K²-bounded collect of the bigram counts; everything below is
    # driver arithmetic over ≤ (K+1)·(K+2) rows (see docstring r11 note).
    from distributed_mapreduce_in_docker_rpyc_spark.functions.exactmath import mass_step

    cnt_rows = cnts.collect()
    tot: dict[str, int] = {}
    for r in cnt_rows:
        tot[r.src] = tot.get(r.src, 0) + int(r.cnt)
    # Row-normalize with the identical bigint→double casts + IEEE divide.
    pr0 = [
        (r.src, r.dst, float(int(r.cnt)) / float(tot[r.src])) for r in cnt_rows
    ]
    channels = sorted(
        {src for src, _, _ in pr0 if src != "START"}
    )  # K-bounded event-type vocabulary (~4), documented constant driver state
    chains = ["full"] + [f"rm:{c}" for c in channels]
    # Chain transitions, keyed (chain, state).  The full chain carries pr0
    # verbatim; each removal chain redirects dst==c to 'NULL' and merges the
    # ≤2 colliding edges with one commutative double addition (the former
    # Spark SUM over the same ≤2 values); CONV/NULL self-loop with pv=1.0.
    trans: dict[tuple, float] = {}
    for src, dst, pv in pr0:
        trans[("full", src, dst)] = pv
    for c in channels:
        for src, dst, pv in pr0:
            if src == c:
                continue
            d = "NULL" if dst == c else dst
            key = (f"rm:{c}", src, d)
            prev = trans.get(key)
            trans[key] = pv if prev is None else prev + pv
    for cn in chains:
        for s in ("CONV", "NULL"):
            trans[(cn, s, s)] = 1.0
    steps = [((cn, s), (cn, d), pv) for (cn, s, d), pv in trans.items()]
    pi = {(cn, "START"): 1.0 for cn in chains}
    for _ in range(_ATTR_ITERS):
        pi = mass_step(pi, steps)
    p_full = pi.get(("full", "CONV"), 0.0)
    out = spark.createDataFrame(
        [(c, p_full, pi.get((f"rm:{c}", "CONV"), 0.0)) for c in channels],
        "channel string, p_full double, p_rm double",
    )
    from pyspark.sql import Window as W2

    eff = out.select(
        "channel",
        "p_full",
        "p_rm",
        F.expr("ROUND(1.0 - p_rm / p_full, 9)").alias("eff9"),
    )
    return eff.select(
        "channel",
        F.round("p_full", 6).alias("p_conv_full"),
        F.round("p_rm", 6).alias("p_conv_removed"),
        F.round("eff9", 6).alias("removal_effect"),
        F.round(
            F.col("eff9") / F.sum("eff9").over(W2.partitionBy()), 6
        ).alias("attribution_share"),
    )


@register(
    "events_top_paths",
    oracle="""
    WITH chseq AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS rn
        FROM events
        WHERE event_type IS NOT NULL AND event_type != 'purchase'
          AND user_id IS NOT NULL
    ),
    paths AS (
        SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        FROM chseq WHERE rn <= 8 GROUP BY user_id
    ),
    conv AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    per AS (
        SELECT p.path, COUNT(*) AS n_users,
               SUM(CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END) AS n_converted
        FROM paths p LEFT JOIN conv c ON c.user_id = p.user_id
        GROUP BY p.path
    ),
    rk AS (
        SELECT path, n_users, n_converted,
               ROW_NUMBER() OVER (ORDER BY n_users DESC, path ASC) AS rnk
        FROM per
    )
    SELECT CAST(rnk AS BIGINT) AS rank_pos, path,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_converted AS BIGINT) AS n_converted,
           ROUND(CAST(n_converted AS DOUBLE) / n_users, 6) AS conv_rate
    FROM rk WHERE rnk <= 20
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 user journey paths with conversion rates: each user's first
    8 channel events (ordered by ts, event_id tie-break) join into a
    'view>click>…' path string, grouped with purchase-conversion counts —
    the path-analysis table behind every Sankey/flow dashboard, and the
    raw material `events_markov_attribution` abstracts into transitions.

    Determinism: the path string aggregates in the explicit rn order on
    both engines (array_sort on the (rn, type) struct Spark-side,
    string_agg ORDER BY in the oracle); ranking ties break on the path
    string.  Scale posture: one user-partition window pass, a user-keyed
    aggregate, and a TakeOrdered top-20 (the rank window runs on the 20
    survivors, never the full path inventory)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chseq = (
        ev.filter(F.col("event_type") != "purchase")
        .select("user_id", "event_type", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 8)
    )
    paths = chseq.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("is_conv", F.lit(1))
    )
    per = (
        paths.join(conv, "user_id", "left")
        .groupBy("path")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.coalesce("is_conv", F.lit(0))).alias("n_converted"),
        )
    )
    top = per.orderBy(F.desc("n_users"), F.asc("path")).limit(20)
    w_rank = Window.orderBy(F.desc("n_users"), F.asc("path"))
    return top.select(
        F.row_number().over(w_rank).cast("bigint").alias("rank_pos"),
        "path",
        F.col("n_users").cast("bigint").alias("n_users"),
        F.col("n_converted").cast("bigint").alias("n_converted"),
        F.round(F.col("n_converted").cast("double") / F.col("n_users"), 6).alias(
            "conv_rate"
        ),
    )


@register(
    "events_stickiness_dau_mau",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               date_trunc('month', CAST(ts AS DATE)) AS month,
               user_id
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    dau AS (
        SELECT month, day, COUNT(DISTINCT user_id) AS dau
        FROM d GROUP BY month, day
    ),
    mau AS (
        SELECT month, COUNT(DISTINCT user_id) AS mau FROM d GROUP BY month
    )
    SELECT CAST(mau.month AS DATE) AS month,
           CAST(mau.mau AS BIGINT) AS mau,
           CAST(SUM(dau.dau) AS BIGINT) AS sum_dau,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CAST(SUM(dau.dau) AS DOUBLE) / COUNT(*) / mau.mau, 6)
               AS stickiness
    FROM mau JOIN dau ON dau.month = mau.month
    GROUP BY mau.month, mau.mau
    """,
)
def events_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month — avg daily active users over monthly
    active users, THE engagement ratio on every product dashboard
    (`events_active_users_7d` tracks the rolling window; this is the
    calendar-month management metric).  Row per month: MAU, summed DAU,
    day count, and stickiness = (ΣDAU/days)/MAU.

    Two exact distinct-count aggregates on (month, day, user) /
    (month, user) uniform keys and one month-keyed join — at 100 TB the
    distincts are the cost and both partial-aggregate cleanly; swap in
    `hll_portable_daily`'s sketch when approximate is acceptable."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    d = ev.select(
        F.col("ts").cast("date").alias("day"),
        F.trunc(F.col("ts").cast("date"), "month").alias("month"),
        "user_id",
    )
    dau = d.groupBy("month", "day").agg(F.countDistinct("user_id").alias("dau"))
    mau = d.groupBy("month").agg(F.countDistinct("user_id").alias("mau"))
    return (
        mau.join(dau, "month")
        .groupBy("month", "mau")
        .agg(
            F.sum("dau").cast("bigint").alias("sum_dau"),
            F.count("*").cast("bigint").alias("n_days"),
            F.round(
                F.sum("dau").cast("double") / F.count("*") / F.col("mau"), 6
            ).alias("stickiness"),
        )
        .select(
            F.col("month").cast("date").alias("month"),
            F.col("mau").cast("bigint").alias("mau"),
            "sum_dau",
            "n_days",
            "stickiness",
        )
    )


@register(
    "ab_uplift_by_segment",
    oracle="""
    WITH users AS (
        SELECT user_id,
               CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                    AS BIGINT) % 2 AS BIGINT) AS variant,
               max(CASE WHEN event_type = 'purchase' AND value > 150
                        THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY 1, 2
    ),
    seg AS (
        SELECT u.user_id, u.variant, u.conv, c.c_mktsegment AS segment
        FROM users u JOIN customer c ON c.c_custkey = u.user_id
    ),
    per AS (
        SELECT segment,
               count(*) FILTER (WHERE variant = 1) AS n_treat,
               count(*) FILTER (WHERE variant = 0) AS n_ctrl,
               CAST(COALESCE(sum(conv) FILTER (WHERE variant = 1), 0) AS BIGINT)
                   AS conv_treat,
               CAST(COALESCE(sum(conv) FILTER (WHERE variant = 0), 0) AS BIGINT)
                   AS conv_ctrl
        FROM seg GROUP BY segment
    )
    SELECT segment, n_treat, n_ctrl, conv_treat, conv_ctrl,
           round((CAST(conv_treat AS DOUBLE) / greatest(n_treat, 1))
                 - (CAST(conv_ctrl AS DOUBLE) / greatest(n_ctrl, 1)), 6)
               AS uplift
    FROM per
    """,
)
def ab_uplift_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous treatment effect readout: the same deterministic md5
    50/50 split as ``ab_test_conversion``, but conversion uplift
    (treatment rate − control rate) broken out by the user's market
    segment via the customer dimension — the first question after a flat
    A/B readout is "who did it work for?".

    Scale posture: per-user conditional aggregate on the uniform user key,
    one broadcast-able dimension join, O(segments) output rows."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    variant = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(2),
    )
    users = ev.groupBy("user_id", variant.alias("variant")).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
            ).otherwise(0)
        ).alias("conv")
    )
    seg = users.join(
        F.broadcast(cust.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")),
        "user_id",
    )
    per = seg.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.when(F.col("variant") == 1, 1)).alias("n_treat"),
        F.count(F.when(F.col("variant") == 0, 1)).alias("n_ctrl"),
        F.coalesce(F.sum(F.when(F.col("variant") == 1, F.col("conv"))), F.lit(0))
        .cast("bigint")
        .alias("conv_treat"),
        F.coalesce(F.sum(F.when(F.col("variant") == 0, F.col("conv"))), F.lit(0))
        .cast("bigint")
        .alias("conv_ctrl"),
    )
    return per.select(
        "segment",
        "n_treat",
        "n_ctrl",
        "conv_treat",
        "conv_ctrl",
        F.round(
            (F.col("conv_treat").cast("double") / F.greatest(F.col("n_treat"), F.lit(1)))
            - (F.col("conv_ctrl").cast("double") / F.greatest(F.col("n_ctrl"), F.lit(1))),
            6,
        ).alias("uplift"),
    )


@register(
    "events_bandit_ucb",
    oracle="""
    WITH arms AS (
        SELECT event_type AS arm,
               COUNT(*) AS n_pulls,
               CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS reward_sum
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type
    ),
    tot AS (SELECT CAST(SUM(n_pulls) AS DOUBLE) AS big_n FROM arms),
    scored AS (
        SELECT arm, n_pulls,
               ROUND(reward_sum / n_pulls, 6) AS mean_reward,
               ROUND((reward_sum / n_pulls)
                     + sqrt((2.0 * ln(big_n)) / n_pulls), 6) AS ucb_score
        FROM arms, tot
    )
    SELECT arm, CAST(n_pulls AS BIGINT) AS n_pulls, mean_reward, ucb_score,
           CAST(ROW_NUMBER() OVER (ORDER BY ucb_score DESC, arm ASC) = 1
                AS INT) AS is_chosen
    FROM scored
    """,
)
def events_bandit_ucb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 bandit allocation readout (Auer et al. 2002) over the event
    log, arms = event types, reward = the event value: per arm the pull
    count, exact mean reward (decimal-quantized sum / count), the
    upper-confidence score mean + sqrt(2·ln N / n), and which arm the
    policy pulls next — the deterministic counterpart to Thompson sampling
    that an experimentation platform can actually replay and audit.

    Scale posture: one conditional aggregate on the low-cardinality arm
    key (map-side combined), a 1-row total crossed back in, O(arms)
    output.  Scores are rounded to 6 places BEFORE the argmax ranking so
    the chosen arm is engine-portable (same discipline as the TF-IDF
    ranking); the reward sum rides DECIMAL(24,6) so the mean is exact
    under any partitioning."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    arms = ev.groupBy(F.col("event_type").alias("arm")).agg(
        F.count("*").alias("n_pulls"),
        F.sum(F.expr("CAST(value AS DECIMAL(24,6))"))
        .cast("double")
        .alias("reward_sum"),
    )
    tot = arms.agg(F.sum("n_pulls").cast("double").alias("big_n"))
    scored = arms.crossJoin(F.broadcast(tot)).select(
        "arm",
        "n_pulls",
        F.round(F.col("reward_sum") / F.col("n_pulls"), 6).alias("mean_reward"),
        F.round(
            (F.col("reward_sum") / F.col("n_pulls"))
            + F.sqrt((F.lit(2.0) * F.log(F.col("big_n"))) / F.col("n_pulls")),
            6,
        ).alias("ucb_score"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("ucb_score"), F.asc("arm"))
    return scored.select(
        "arm",
        F.col("n_pulls").cast("bigint").alias("n_pulls"),
        "mean_reward",
        "ucb_score",
        (F.row_number().over(w) == 1).cast("int").alias("is_chosen"),
    )
