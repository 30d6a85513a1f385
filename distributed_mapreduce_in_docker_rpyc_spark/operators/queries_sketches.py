"""Sketch & statistics family: approximate algorithms with verified-exact
outputs, plus distributed summary statistics (extended scope — the reference
computes only exact word counts, SURVEY.md §2.2; its Top-20 report
coordinator/coordinator.py:250-251 is the closest analogue to a heavy-hitter
query).

The 100 TB posture for sketches is *candidates-then-verify*: a cheap
single-pass approximate structure (Misra-Gries via ``df.stat.freqItems``,
count-min via hash-bucket aggregation) prunes the key space map-side, then
one exact aggregation over only the surviving candidates produces an
*exactly correct* answer.  The sketch bounds the shuffle, the verify pass
bounds the error — at zero.  Queries whose output is exact carry DuckDB
oracles; the raw-estimate queries (CMS estimates, HLL error) are inherently
non-SQL and are covered by property tests instead (tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_mapreduce_in_docker_rpyc_spark.operators import wordcount as wc
from distributed_mapreduce_in_docker_rpyc_spark.registry import register
from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

_TOKS_CTE = """
    WITH toks AS (
        SELECT lower(unnest(regexp_extract_all(lower(text), '[A-Za-z'']+'))) AS word
        FROM documents
    )
"""

#: Support fraction for heavy hitters: keep words with freq > SUPPORT * N.
HH_SUPPORT = 0.002


@register(
    "heavy_hitters_verified",
    oracle=_TOKS_CTE
    + f"""
    SELECT word, count(*) AS cnt
    FROM toks
    GROUP BY word
    HAVING count(*) > (SELECT {HH_SUPPORT} * count(*) FROM toks)
    """,
)
def heavy_hitters_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (words with freq > 0.2% of all tokens) via
    Misra-Gries candidate pruning.

    Pass 1: ``df.stat.freqItems`` — Spark's single-pass Karp/Misra-Gries
    summary, guaranteed to contain every item with frequency > support*N
    (false positives possible, false negatives impossible).  Pass 2: exact
    counts restricted to the candidate set — the ``isin`` filter is pushed
    map-side, so the shuffle carries at most ~1/support keys per partition
    regardless of vocabulary size.  Output is exactly the HAVING query the
    oracle runs, at a fraction of the shuffle.
    """
    toks = wc.tokens(load_table(spark, sf_dir, "documents"))
    cands = toks.stat.freqItems(["word"], support=HH_SUPPORT).collect()[0][0]
    total = toks.count()
    return (
        toks.filter(F.col("word").isin(list(cands)))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > F.lit(HH_SUPPORT * total))
    )


#: Count-min sketch shape: d independent hash rows, w buckets each.
CMS_DEPTH = 5
CMS_WIDTH = 2048


def _cms_bucket(key_col, seed: int, portable: bool):
    """Seeded bucket hash.  ``portable=False``: xxhash64 (fastest, JVM-only).
    ``portable=True``: first 16 bits of md5(seed:key) — bit-identical in any
    engine with md5 (the same trick the LSH oracles use), so a sketch built
    this way is SQL-replicable.  65536 % CMS_WIDTH == 0, so both are uniform."""
    if not portable:
        return F.pmod(F.xxhash64(key_col, F.lit(seed)), F.lit(CMS_WIDTH))
    h = F.md5(F.concat(F.lit(f"{seed}:"), key_col))
    return F.pmod(F.conv(F.substring(h, 1, 4), 16, 10).cast("long"), F.lit(CMS_WIDTH))


def cms_build(toks: DataFrame, key: str = "word", portable: bool = False) -> DataFrame:
    """Build a count-min sketch as a DataFrame of (seed, bucket, cnt).

    Each of the ``CMS_DEPTH`` seeded hash functions maps a key to one of
    ``CMS_WIDTH`` buckets; the sketch is just a groupBy over (seed, bucket) —
    one shuffle of at most d*w rows no matter how many distinct keys exist.
    That is the whole point at 100 TB: sketch size is O(d*w), not O(keys).
    """
    rows = [
        F.struct(
            F.lit(s).alias("seed"),
            _cms_bucket(F.col(key), s, portable).alias("bucket"),
        )
        for s in range(CMS_DEPTH)
    ]
    return (
        toks.select(F.explode(F.array(*rows)).alias("h"))
        .select("h.seed", "h.bucket")
        .groupBy("seed", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_probe(sketch: DataFrame, keys: DataFrame, key: str = "word", portable: bool = False) -> DataFrame:
    """Probe: est(key) = min over seeds of the key's bucket count.

    The sketch is tiny (d*w rows) so it broadcasts; probing any number of
    keys is a broadcast join + min-agg, never a wide shuffle.
    """
    probes = keys.select(
        key,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _cms_bucket(F.col(key), s, portable).alias("bucket"),
                    )
                    for s in range(CMS_DEPTH)
                ]
            )
        ).alias("h"),
    ).select(key, "h.seed", "h.bucket")
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
    )


# One md5 nibble of h at 1-based position p, as its 0..15 integer value.
_NIB = "(strpos('0123456789abcdef', substr(md5({h}), {p}, 1)) - 1)"


def _cms_bucket_sql(key_expr: str, seed_expr: str) -> str:
    """DuckDB replica of _cms_bucket(portable=True): first 16 md5 bits of
    'seed:key', mod CMS_WIDTH."""
    h = f"{seed_expr} || ':' || {key_expr}"
    return (
        f"({_NIB.format(h=h, p=1)} * 4096 + {_NIB.format(h=h, p=2)} * 256 + "
        f"{_NIB.format(h=h, p=3)} * 16 + {_NIB.format(h=h, p=4)}) % {CMS_WIDTH}"
    )


@register(
    "cms_word_estimates",
    oracle=_TOKS_CTE
    + f""",
    sketch AS (
        SELECT s.s AS seed, {_cms_bucket_sql('word', 's.s')} AS bucket, count(*) AS cnt
        FROM toks, generate_series(0, {CMS_DEPTH - 1}) s(s)
        GROUP BY 1, 2
    ),
    top AS (
        SELECT word, count(*) AS cnt FROM toks GROUP BY word
        ORDER BY cnt DESC, length(word) DESC, word ASC LIMIT 50
    ),
    probe AS (
        SELECT t.word, t.cnt, s.s AS seed, {_cms_bucket_sql('t.word', 's.s')} AS bucket
        FROM top t, generate_series(0, {CMS_DEPTH - 1}) s(s)
    )
    SELECT p.word, p.cnt, CAST(MIN(COALESCE(sk.cnt, 0)) AS BIGINT) AS cms_est
    FROM probe p LEFT JOIN sketch sk USING (seed, bucket)
    GROUP BY p.word, p.cnt
    """,
)
def cms_word_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min estimates vs exact counts for the top-50 words.

    Output: (word, cnt, cms_est) with the CMS guarantee cnt <= cms_est <=
    cnt + eps*N (also asserted in tests/test_sketches.py).  The registered
    query builds the sketch with the PORTABLE md5-derived hash so DuckDB
    replicates every bucket decision and the estimates hash-check exactly;
    the xxhash64 fast path stays the library default and keeps its own
    guarantee test."""
    toks = wc.tokens(load_table(spark, sf_dir, "documents"))
    sketch = cms_build(toks, portable=True)
    top = wc.top_k_words(load_table(spark, sf_dir, "documents"), k=50).select("word", "cnt")
    return top.join(cms_probe(sketch, top.select("word"), portable=True), "word").select(
        "word", "cnt", "cms_est"
    )


@register(
    "stat_corr_matrix",
    oracle="""
    SELECT corr(l_quantity, l_extendedprice) AS corr_qty_price,
           corr(l_extendedprice, l_discount) AS corr_price_disc,
           covar_samp(l_quantity, l_extendedprice) AS cov_qty_price,
           stddev_samp(l_quantity) AS sd_qty,
           avg(l_quantity) AS avg_qty
    FROM lineitem
    """,
)
def stat_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed summary statistics: Pearson correlation / sample
    covariance / stddev in ONE aggregate pass (co-moment merge is
    associative, so partials combine map-side like any other agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.corr("l_quantity", "l_extendedprice").alias("corr_qty_price"),
        F.corr("l_extendedprice", "l_discount").alias("corr_price_disc"),
        F.covar_samp("l_quantity", "l_extendedprice").alias("cov_qty_price"),
        F.stddev_samp("l_quantity").alias("sd_qty"),
        F.avg("l_quantity").alias("avg_qty"),
    )


@register(
    "hll_daily_distinct_error",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           COUNT(DISTINCT user_id) AS exact_users,
           1 AS err_within_3rsd
    FROM events
    WHERE ts IS NOT NULL AND user_id IS NOT NULL
    GROUP BY 1
    """,
)
def hll_daily_distinct_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ vs exact per-day distinct users — self-certifying.

    Output: (day, exact_users, err_within_3rsd).  ``approx_count_distinct``
    is the 100 TB path — mergeable fixed-size registers instead of a
    distinct-shuffle per group; the exact column exists to measure the
    error at test scale.  The sketch VALUE is Spark-internal (its register
    hashing is not SQL-replayable — the portable, estimate-hash-checked
    variant is ``hll_portable_daily``), so what the oracle pins is (a) the
    exact side, bit-for-bit, and (b) the error CONTRACT as an integer
    column: ``err_within_3rsd`` = 1 iff |approx−exact|/exact ≤ 3·rsd =
    0.06 (rsd=0.02 → 3-sigma band).  The oracle emits the literal 1, so a
    sketch drifting outside its published band hash-fails the driver gate
    instead of passing a rows-only check (VERDICT r5 next-round #5)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    by_day = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
    )
    return by_day.select(
        "day",
        "exact_users",
        (
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.06
            ).cast("int")
        ).alias("err_within_3rsd"),
    )


@register(
    "approx_percentile_error",
    oracle="""
    WITH pv AS (
        SELECT l_returnflag AS flag, l_extendedprice AS v,
               COUNT(*) AS c
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT flag, v,
               SUM(c) OVER (PARTITION BY flag ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
               SUM(c) OVER (PARTITION BY flag) AS n
        FROM pv
    ),
    ex AS (
        SELECT flag,
               MIN(CASE WHEN cc >= CAST(FLOOR((n + 1) / 2.0) AS BIGINT)
                        THEN v END) AS exact_p50,
               MIN(CASE WHEN cc >= CAST(FLOOR((19.0 * n + 19.0) / 20.0) AS BIGINT)
                        THEN v END) AS exact_p95
        FROM cum GROUP BY flag
    )
    SELECT flag AS l_returnflag,
           ROUND(exact_p50, 2) AS exact_p50,
           ROUND(exact_p95, 2) AS exact_p95,
           1 AS p50_within_1pct,
           1 AS p95_within_1pct
    FROM ex
    """,
)
def approx_percentile_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate (mergeable-sketch) vs exact percentiles of extended price
    per return flag — self-certifying: (flag, exact_p50, exact_p95,
    p50_within_1pct, p95_within_1pct).

    ``approx_percentile`` (Greenwald-Khanna variant, accuracy 10000) is the
    100 TB path — bounded-size summaries merged associatively instead of a
    full sort per group.  The sketch VALUE is not SQL-replayable (DuckDB's
    sketch differs), so the oracle pins (a) the EXACT side as order
    statistics — lower order statistic at rank ⌈q·n⌉, computed from
    per-distinct-value counts + one cumulative window over the price grid
    (integer crossing logic, deterministic cross-engine; no interpolated
    quantile whose rounding could differ) — and (b) the error CONTRACT as
    integer columns: within 1% relative of the exact order statistic
    (rank error ≤ n/10000 → far inside 1% on a dense price grid).  The
    oracle emits the literal 1s, so a sketch drifting outside its bound
    hash-fails the driver gate instead of passing rows-only (VERDICT r5
    next-round #5).  At 100 TB the grid frame is bounded by price-grid
    cardinality; the sketch side never materializes the grid."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    pv = (
        li.filter(F.col("l_extendedprice").isNotNull())
        .groupBy(F.col("l_returnflag").alias("flag"), F.col("l_extendedprice").alias("v"))
        .agg(F.count("*").alias("c"))
    )
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_flag = Window.partitionBy("flag")
    cum = pv.select(
        "flag",
        "v",
        F.sum("c").over(w_cum).alias("cc"),
        F.sum("c").over(w_flag).alias("n"),
    )
    ex = cum.groupBy("flag").agg(
        F.min(
            F.when(
                F.col("cc") >= F.floor((F.col("n") + 1) / F.lit(2.0)).cast("bigint"),
                F.col("v"),
            )
        ).alias("exact_p50"),
        F.min(
            F.when(
                F.col("cc")
                >= F.floor((19.0 * F.col("n") + 19.0) / F.lit(20.0)).cast("bigint"),
                F.col("v"),
            )
        ).alias("exact_p95"),
    )
    approx = li.filter(F.col("l_extendedprice").isNotNull()).groupBy(
        F.col("l_returnflag").alias("flag")
    ).agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("approx_p50"),
        F.expr("approx_percentile(l_extendedprice, 0.95, 10000)").alias("approx_p95"),
    )
    return ex.join(approx, "flag").select(
        F.col("flag").alias("l_returnflag"),
        F.round("exact_p50", 2).alias("exact_p50"),
        F.round("exact_p95", 2).alias("exact_p95"),
        (
            (F.abs(F.col("approx_p50") - F.col("exact_p50")) / F.col("exact_p50") <= 0.01).cast(
                "int"
            )
        ).alias("p50_within_1pct"),
        (
            (F.abs(F.col("approx_p95") - F.col("exact_p95")) / F.col("exact_p95") <= 0.01).cast(
                "int"
            )
        ).alias("p95_within_1pct"),
    )


# ---- ANALYZE-style table statistics ---------------------------------------
# (col_name, kind) — kind drives which min/max slot the column fills.
_STATS_COLS: tuple[tuple[str, str], ...] = (
    ("l_orderkey", "num"),
    ("l_partkey", "num"),
    ("l_suppkey", "num"),
    ("l_linenumber", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "other"),
)


def _stats_oracle() -> str:
    parts = []
    for c, kind in _STATS_COLS:
        min_num = f"CAST(MIN({c}) AS DOUBLE)" if kind == "num" else "CAST(NULL AS DOUBLE)"
        max_num = f"CAST(MAX({c}) AS DOUBLE)" if kind == "num" else "CAST(NULL AS DOUBLE)"
        min_str = f"MIN({c})" if kind == "str" else "CAST(NULL AS VARCHAR)"
        max_str = f"MAX({c})" if kind == "str" else "CAST(NULL AS VARCHAR)"
        parts.append(
            f"SELECT '{c}' AS col_name, "
            f"COUNT(*) - COUNT({c}) AS n_nulls, "
            f"COUNT(DISTINCT {c}) AS ndv, "
            f"{min_num} AS min_num, {max_num} AS max_num, "
            f"{min_str} AS min_str, {max_str} AS max_str "
            f"FROM lineitem"
        )
    return " UNION ALL ".join(parts)


@register("analyze_table_stats", oracle=_stats_oracle())
def analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer-statistics collection (the ANALYZE TABLE surface): per-column
    null count, EXACT distinct count, and type-appropriate min/max for every
    lineitem column, computed in ONE wide aggregation pass and unpivoted with
    ``stack`` — not one scan per column.

    Scale posture: the exact multi-column COUNT(DISTINCT) plans as a single
    Expand (one row per tracked column) feeding partial aggregation, so the
    input is read once and the shuffle carries only (column-tag, value)
    pairs after map-side dedup; the final unpivot is over a 1-row frame.  At
    100 TB you'd swap the exact NDV for ``approx_count_distinct`` per column
    (same single-pass shape, no Expand blowup) — kept exact here so the
    result is oracle-checkable."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for i, (c, kind) in enumerate(_STATS_COLS):
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{i}"))
        aggs.append(F.countDistinct(c).alias(f"ndv_{i}"))
        if kind == "num":
            aggs.append(F.min(c).cast("double").alias(f"min_{i}"))
            aggs.append(F.max(c).cast("double").alias(f"max_{i}"))
        elif kind == "str":
            aggs.append(F.min(c).alias(f"smin_{i}"))
            aggs.append(F.max(c).alias(f"smax_{i}"))
    wide = li.agg(*aggs)
    rows = []
    for i, (c, kind) in enumerate(_STATS_COLS):
        min_num = f"min_{i}" if kind == "num" else "CAST(NULL AS DOUBLE)"
        max_num = f"max_{i}" if kind == "num" else "CAST(NULL AS DOUBLE)"
        min_str = f"smin_{i}" if kind == "str" else "CAST(NULL AS STRING)"
        max_str = f"smax_{i}" if kind == "str" else "CAST(NULL AS STRING)"
        rows.append(f"'{c}', nulls_{i}, ndv_{i}, {min_num}, {max_num}, {min_str}, {max_str}")
    return wide.selectExpr(
        f"stack({len(_STATS_COLS)}, {', '.join(rows)}) "
        "AS (col_name, n_nulls, ndv, min_num, max_num, min_str, max_str)"
    )


_KMV_K = 32
# Uniform (0,1] hash of a user id: first 12 md5 hex digits over 2^48 —
# portable (Spark spells it conv(..., 16, 10), DuckDB CAST('0x'||...), the
# established two-sided md5 idiom) and collision-free at any realistic
# cardinality.  The KMV estimator is DETERMINISTIC given the hash, so
# unlike HLL the whole error report is hash-checkable.
_KMV_U_SQL = (
    "CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) "
    "AS DOUBLE) / 281474976710656.0"
)


@register(
    "kmv_daily_distinct",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        FROM events WHERE user_id IS NOT NULL
    ),
    hashed AS (SELECT day, {_KMV_U_SQL} AS u FROM du),
    ranked AS (
        SELECT day, u,
               ROW_NUMBER() OVER (PARTITION BY day ORDER BY u ASC) AS rn,
               COUNT(*) OVER (PARTITION BY day) AS nd
        FROM hashed
    ),
    est AS (
        SELECT day, nd AS exact_distinct,
               CASE WHEN nd < {_KMV_K} THEN CAST(nd AS DOUBLE)
                    ELSE ({_KMV_K} - 1) / MAX(CASE WHEN rn = {_KMV_K} THEN u END)
               END AS kmv_estimate
        FROM ranked
        GROUP BY day, nd
    )
    SELECT day, exact_distinct,
           ROUND(kmv_estimate, 6) AS kmv_estimate,
           ROUND(ABS(kmv_estimate - exact_distinct) / exact_distinct, 6)
               AS rel_error
    FROM est
    """,
)
def kmv_daily_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002) per
    event day, with its error against the exact count — the
    mergeable-sketch pattern HLL uses, but built from a DETERMINISTIC
    portable hash, so the estimate itself is oracle-hash-checked (the HLL
    report can only ever be rows-only: its register hashing is
    Spark-internal).  Estimator: with u_(k) the k-th smallest of the
    distinct keys' uniform hashes, distinct ≈ (k-1)/u_(k); days with fewer
    than k keys fall back to the exact count (the sketch stores all of
    them).

    Shape at 100 TB: per-(day, user) distinct is one shuffle on uniform
    keys; ranking the k minima is a per-day window over the distinct-user
    frame.  At real scale the k minima would fold map-side (a
    min-k-by-partition then merge, O(k) state per day per task — the
    mergeability the estimator exists for); the window form keeps the
    day-local semantics identical and the plan windows-over-shuffle."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    du = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    u = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
        ).cast("double")
        / F.lit(281474976710656.0)
    )
    hashed = du.select("day", u.alias("u"))
    w_rank = Window.partitionBy("day").orderBy(F.asc("u"))
    w_all = Window.partitionBy("day")
    ranked = hashed.select(
        "day",
        "u",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_all).alias("nd"),
    )
    est = ranked.groupBy("day", "nd").agg(
        F.when(F.col("nd") < _KMV_K, F.col("nd").cast("double"))
        .otherwise(
            F.lit(_KMV_K - 1)
            / F.max(F.when(F.col("rn") == _KMV_K, F.col("u")))
        )
        .alias("kmv_estimate")
    )
    return est.select(
        "day",
        F.col("nd").alias("exact_distinct"),
        F.round("kmv_estimate", 6).alias("kmv_estimate"),
        F.round(
            F.abs(F.col("kmv_estimate") - F.col("nd")) / F.col("nd"), 6
        ).alias("rel_error"),
    )


@register(
    "kmv_weekly_merge",
    oracle=f"""
    WITH du AS (
        SELECT CAST(ts AS DATE) AS day, user_id
        FROM events WHERE user_id IS NOT NULL
        GROUP BY 1, 2
    ),
    hashed AS (SELECT day, user_id, {_KMV_U_SQL} AS u FROM du),
    daily_sketch AS (
        SELECT day, u FROM (
            SELECT day, u,
                   ROW_NUMBER() OVER (PARTITION BY day ORDER BY u ASC) AS rn
            FROM hashed
        ) WHERE rn <= {_KMV_K}
    ),
    merged AS (
        SELECT DISTINCT CAST(date_trunc('week', day) AS DATE) AS week, u
        FROM daily_sketch
    ),
    mranked AS (
        SELECT week, u,
               ROW_NUMBER() OVER (PARTITION BY week ORDER BY u ASC) AS rn,
               COUNT(*) OVER (PARTITION BY week) AS ns
        FROM merged
    ),
    est AS (
        SELECT week,
               CASE WHEN ns < {_KMV_K} THEN CAST(ns AS DOUBLE)
                    ELSE ({_KMV_K} - 1) / MAX(CASE WHEN rn = {_KMV_K} THEN u END)
               END AS kmv_estimate
        FROM mranked
        GROUP BY week, ns
    ),
    exact AS (
        SELECT CAST(date_trunc('week', day) AS DATE) AS week,
               COUNT(DISTINCT user_id) AS exact_distinct
        FROM du GROUP BY 1
    )
    SELECT e.week, x.exact_distinct,
           ROUND(e.kmv_estimate, 6) AS kmv_estimate,
           ROUND(ABS(e.kmv_estimate - x.exact_distinct) / x.exact_distinct, 6)
               AS rel_error
    FROM est e JOIN exact x ON x.week = e.week
    """,
)
def kmv_weekly_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch MERGEABILITY: weekly distinct-user estimates computed by
    merging the 7 per-day sketches (union the ≤32 stored minima, keep the 32
    smallest), never re-touching the raw events — the property that makes
    bottom-k sketches the right distinct-count structure for a 100 TB
    lake (per-partition/per-day sketches fold up a rollup tree in O(k)
    state per merge, exactly how Spark's own partial aggregation folds).

    Merging daily sketches is EXACT here, not approximate-on-approximate:
    every one of the week's 32 smallest hashes is necessarily among its own
    day's 32 smallest, so the merged sketch equals the sketch of the raw
    week (``test_kmv_merge_equals_direct``).  The estimate is the standard
    (k-1)/u_(k); weeks with fewer than k stored values fall back to the
    exact count (the sketch holds every member).  Deterministic md5 hash →
    the whole pipeline hash-checks against the oracle."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    du = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    u = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
        ).cast("double")
        / F.lit(281474976710656.0)
    )
    hashed = du.select("day", "user_id", u.alias("u"))
    daily_sketch = (
        hashed.select(
            "day",
            "u",
            F.row_number().over(Window.partitionBy("day").orderBy(F.asc("u"))).alias("rn"),
        )
        .filter(F.col("rn") <= _KMV_K)
        .select("day", "u")
    )
    merged = daily_sketch.select(
        F.date_trunc("week", "day").cast("date").alias("week"), "u"
    ).distinct()
    mranked = merged.select(
        "week",
        "u",
        F.row_number().over(Window.partitionBy("week").orderBy(F.asc("u"))).alias("rn"),
        F.count("*").over(Window.partitionBy("week")).alias("ns"),
    )
    est = mranked.groupBy("week", "ns").agg(
        F.when(F.col("ns") < _KMV_K, F.col("ns").cast("double"))
        .otherwise(F.lit(_KMV_K - 1) / F.max(F.when(F.col("rn") == _KMV_K, F.col("u"))))
        .alias("kmv_estimate")
    )
    exact = du.groupBy(
        F.date_trunc("week", "day").cast("date").alias("week")
    ).agg(F.countDistinct("user_id").alias("exact_distinct"))
    return est.join(exact, "week").select(
        "week",
        "exact_distinct",
        F.round("kmv_estimate", 6).alias("kmv_estimate"),
        F.round(
            F.abs(F.col("kmv_estimate") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            6,
        ).alias("rel_error"),
    )


# Inverse-CDF thresholds for Poisson(1): P(X <= k) partial sums of e^-1/k!,
# written as literal constants so both engines compare the SAME doubles
# against the SAME md5-uniform — no libm exp() in either plan.
_POIS_CDF = [
    (0.36787944117144233, 0),
    (0.7357588823428847, 1),
    (0.9196986029286058, 2),
    (0.9810118431238462, 3),
    (0.9963401531726563, 4),
    (0.9994058151824183, 5),
    (0.9999167588507119, 6),
    (0.9999897508033253, 7),
]
_POIS_W = (
    "CASE "
    + " ".join(f"WHEN u < {c!r} THEN {k}" for c, k in _POIS_CDF)
    + " ELSE 8 END"
)
_BOOT_B = 32
# The (orderkey, replica) uniform: first 12 md5 hex digits over 2^48.  The
# hex->int spelling is engine-specific (Spark: conv(.., 16, 10); DuckDB:
# CAST('0x'||.. AS BIGINT)) but both yield the same integer, hence the same
# double — the established two-sided md5 idiom (_KMV_U_SQL).
_BOOT_U_ORACLE = (
    "CAST(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '-' || "
    "CAST(b AS VARCHAR)), 1, 12) AS BIGINT) AS DOUBLE) / 281474976710656.0"
)
_BOOT_U_SPARK = (
    "CAST(conv(substr(md5(CAST(o_orderkey AS STRING) || '-' || "
    "CAST(b AS STRING)), 1, 12), 16, 10) AS DOUBLE) / 281474976710656.0"
)


@register(
    "bootstrap_mean_ci",
    oracle=f"""
    WITH reps AS (
        SELECT o.o_orderkey, o.o_totalprice,
               unnest(generate_series(1, {_BOOT_B})) AS b
        FROM orders o
    ),
    weighted AS (
        SELECT b, o_totalprice, {_POIS_W} AS w
        FROM (SELECT o_orderkey, o_totalprice, b, {_BOOT_U_ORACLE} AS u FROM reps)
    ),
    per_rep AS (
        SELECT b,
               CAST(CAST(SUM(w * CAST(o_totalprice AS DECIMAL(24,6)))
                    AS DOUBLE) / SUM(w) AS DECIMAL(38,6)) AS m
        FROM weighted GROUP BY b
    ),
    center AS (
        SELECT CAST(AVG(m) AS DECIMAL(38,6)) AS boot_mean FROM per_rep
    ),
    spread AS (
        SELECT CAST(SUM(CAST((CAST(m AS DOUBLE) - CAST(boot_mean AS DOUBLE))
                             * (CAST(m AS DOUBLE) - CAST(boot_mean AS DOUBLE))
                             AS DECIMAL(38,6))) AS DOUBLE)
               / ({_BOOT_B} - 1) AS var_m
        FROM per_rep, center
    ),
    base AS (
        SELECT COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE)
                   / COUNT(*) AS sample_mean
        FROM orders
    )
    SELECT base.n_orders, ROUND(base.sample_mean, 6) AS sample_mean,
           {_BOOT_B} AS n_replicas,
           ROUND(CAST(center.boot_mean AS DOUBLE), 6) AS boot_mean,
           ROUND(sqrt(spread.var_m), 6) AS boot_se,
           ROUND(CAST(center.boot_mean AS DOUBLE) - 1.96 * sqrt(spread.var_m), 6)
               AS ci_lo,
           ROUND(CAST(center.boot_mean AS DOUBLE) + 1.96 * sqrt(spread.var_m), 6)
               AS ci_hi
    FROM base, center, spread
    """,
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap confidence interval for the mean order value —
    THE uncertainty estimator for massive data (Chamandy et al., 'Estimating
    Uncertainty for Massive Data Streams', 2012): instead of resampling n
    rows B times (impossible distributedly), each row draws a Poisson(1)
    weight per replica, which converges to multinomial resampling and needs
    only ONE streaming pass.  B=32 replicas, 95% normal-interval CI from
    the replica spread.

    Determinism/portability: the per-(row, replica) Poisson draw inverts a
    literal CDF table against the md5-uniform of (orderkey, replica) — no
    RNG state, no libm, same weights in any engine, any partitioning, any
    retry (the property that makes deterministic bootstrap auditable).
    Replica means ride exact DECIMAL sums and are quantized to
    DECIMAL(38,6) before the cross-replica variance, so every arithmetic
    step is order-independent.

    Shape at 100 TB: explode×32 → one groupBy(replica) with map-side
    partial aggregation — shuffle carries 32 rows of sufficient statistics
    TOTAL; the final variance is over a 32-row frame.  No extra pass over
    the data versus a plain mean."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    reps = o.select(
        "o_orderkey", "o_totalprice",
        F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("b"),
    )
    weighted = reps.selectExpr(
        "b", "o_totalprice", f"{_BOOT_U_SPARK} AS u"
    ).selectExpr("b", "o_totalprice", f"{_POIS_W} AS w")
    per_rep = weighted.groupBy("b").agg(
        F.expr(
            "CAST(CAST(SUM(w * CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE)"
            " / SUM(w) AS DECIMAL(38,6)) AS m"
        )
    )
    center = per_rep.agg(F.expr("CAST(AVG(m) AS DECIMAL(38,6)) AS boot_mean"))
    spread = per_rep.crossJoin(F.broadcast(center)).agg(
        F.expr(
            "CAST(SUM(CAST((CAST(m AS DOUBLE) - CAST(boot_mean AS DOUBLE))"
            " * (CAST(m AS DOUBLE) - CAST(boot_mean AS DOUBLE))"
            f" AS DECIMAL(38,6))) AS DOUBLE) / ({_BOOT_B} - 1) AS var_m"
        )
    )
    base = o.agg(
        F.expr("COUNT(*) AS n_orders"),
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE)"
            " / COUNT(*) AS sample_mean"
        ),
    )
    return (
        base.crossJoin(F.broadcast(center))
        .crossJoin(F.broadcast(spread))
        .selectExpr(
            "n_orders",
            "ROUND(sample_mean, 6) AS sample_mean",
            f"{_BOOT_B} AS n_replicas",
            "ROUND(CAST(boot_mean AS DOUBLE), 6) AS boot_mean",
            "ROUND(sqrt(var_m), 6) AS boot_se",
            "ROUND(CAST(boot_mean AS DOUBLE) - 1.96 * sqrt(var_m), 6) AS ci_lo",
            "ROUND(CAST(boot_mean AS DOUBLE) + 1.96 * sqrt(var_m), 6) AS ci_hi",
        )
    )


# Bloom positions: 16-bit slot from the first 4 md5 hex nibbles of
# 'j:key' — spelled as nibble arithmetic so DuckDB (no conv()) and Spark
# compute the identical integer.
_BLOOM_K = 3
_BLOOM_NIBBLE = "(strpos('0123456789abcdef', substr(md5({s}), {i}, 1)) - 1)"


def _bloom_pos_sql(key_expr: str, j_expr: str) -> str:
    """DuckDB form: nibble arithmetic (DuckDB has no conv())."""
    s = f"CAST({j_expr} AS VARCHAR) || ':' || CAST({key_expr} AS VARCHAR)"
    nib = [_BLOOM_NIBBLE.format(s=f"({s})", i=i) for i in (1, 2, 3, 4)]
    return f"({nib[0]} * 4096 + {nib[1]} * 256 + {nib[2]} * 16 + {nib[3]})"


def _bloom_pos_spark(key_expr: str, j_expr: str) -> str:
    """Spark form: conv() on the same first-4-hex-digit slice — the same
    16-bit integer as the oracle's nibble arithmetic."""
    s = f"CAST({j_expr} AS STRING) || ':' || CAST({key_expr} AS STRING)"
    return f"CAST(conv(substr(md5({s}), 1, 4), 16, 10) AS BIGINT)"


@register(
    "bloom_filter_probe",
    oracle=f"""
    WITH member AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE o_orderpriority = '1-URGENT'
    ),
    bits AS (
        SELECT DISTINCT {_bloom_pos_sql('m.k', 'g.j')} AS pos
        FROM member m, generate_series(0, {_BLOOM_K - 1}) g(j)
    ),
    probe AS (
        SELECT c.c_custkey AS k, g.j, {_bloom_pos_sql('c.c_custkey', 'g.j')} AS pos
        FROM customer c, generate_series(0, {_BLOOM_K - 1}) g(j)
    ),
    verdicts AS (
        SELECT p.k,
               MIN(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS positive
        FROM probe p LEFT JOIN bits b ON b.pos = p.pos
        GROUP BY p.k
    ),
    labeled AS (
        SELECT v.k, v.positive,
               CASE WHEN m.k IS NOT NULL THEN 1 ELSE 0 END AS is_member
        FROM verdicts v LEFT JOIN member m ON m.k = v.k
    )
    SELECT (SELECT COUNT(*) FROM member) AS n_keys,
           (SELECT COUNT(*) FROM bits) AS n_bits_set,
           COUNT(*) AS n_probes,
           CAST(SUM(positive) AS BIGINT) AS n_positive,
           CAST(SUM(CASE WHEN positive = 1 AND is_member = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_false_pos,
           ROUND(CAST(SUM(CASE WHEN positive = 1 AND is_member = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(CASE WHEN is_member = 0 THEN 1 ELSE 0 END) AS DOUBLE), 6) AS fpr
    FROM labeled
    """,
)
def bloom_filter_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Bloom filter, built and probed as dataflow: a 65536-slot
    / 3-hash filter over the urgent-order customer set, probed with every
    customer, with EXACT false-positive accounting (the sketch's verdict
    joined back against true membership).  Bloom membership is the
    workhorse of 100 TB anti-joins: ship the bit set, not the key set.

    Scale posture: the materialized filter is AT MOST 65536 rows no matter
    how many build keys stream in (DISTINCT over a bounded position space)
    — it broadcasts forever, so the probe side is a map-side hash lookup
    with NO shuffle on the big table; build and probe are each one linear
    pass.  All 3 positions must match (MIN over the k probes) for a
    positive — no false negatives by construction, which
    tests/test_sketches.py pins as an invariant.  The md5-nibble slot
    arithmetic is engine-portable, so the whole report (including the
    false-positive RATE) hash-checks against the oracle."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    member = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    js = spark.range(_BLOOM_K).select(F.col("id").alias("j"))
    bits = (
        member.crossJoin(F.broadcast(js))
        .selectExpr(f"{_bloom_pos_spark('k', 'j')} AS pos")
        .distinct()
    )
    probe = (
        cust.select(F.col("c_custkey").alias("k"))
        .crossJoin(F.broadcast(js))
        .selectExpr("k", f"{_bloom_pos_spark('k', 'j')} AS pos")
    )
    verdicts = (
        probe.join(F.broadcast(bits).withColumn("hit", F.lit(1)), "pos", "left")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("hit"), F.lit(0))).alias("positive"))
    )
    labeled = verdicts.join(
        member.withColumn("is_member", F.lit(1)), "k", "left"
    ).withColumn("is_member", F.coalesce(F.col("is_member"), F.lit(0)))
    n_keys = member.agg(F.count("*").alias("n_keys"))
    n_bits = bits.agg(F.count("*").alias("n_bits_set"))
    return (
        labeled.agg(
            F.count("*").alias("n_probes"),
            F.sum("positive").cast("bigint").alias("n_positive"),
            F.sum(
                ((F.col("positive") == 1) & (F.col("is_member") == 0)).cast("int")
            )
            .cast("bigint")
            .alias("n_false_pos"),
            F.round(
                F.sum(((F.col("positive") == 1) & (F.col("is_member") == 0)).cast("int"))
                .cast("double")
                / F.sum((F.col("is_member") == 0).cast("int")).cast("double"),
                6,
            ).alias("fpr"),
        )
        .crossJoin(F.broadcast(n_keys))
        .crossJoin(F.broadcast(n_bits))
        .select("n_keys", "n_bits_set", "n_probes", "n_positive", "n_false_pos", "fpr")
    )


@register(
    "kmv_type_intersection",
    oracle=f"""
    WITH a AS (
        SELECT DISTINCT user_id FROM events
        WHERE user_id IS NOT NULL AND event_type = 'click'
    ),
    b AS (
        SELECT DISTINCT user_id FROM events
        WHERE user_id IS NOT NULL AND event_type = 'purchase'
    ),
    ha AS (SELECT {_KMV_U_SQL} AS u FROM a),
    hb AS (SELECT {_KMV_U_SQL} AS u FROM b),
    hu AS (SELECT u FROM (SELECT u FROM ha UNION SELECT u FROM hb)),
    est_a AS (
        SELECT CASE WHEN COUNT(*) < {_KMV_K} THEN CAST(COUNT(*) AS DOUBLE)
                    ELSE ({_KMV_K} - 1) / MAX(CASE WHEN rn = {_KMV_K} THEN u END)
               END AS e
        FROM (SELECT u, ROW_NUMBER() OVER (ORDER BY u ASC) AS rn FROM ha)
    ),
    est_b AS (
        SELECT CASE WHEN COUNT(*) < {_KMV_K} THEN CAST(COUNT(*) AS DOUBLE)
                    ELSE ({_KMV_K} - 1) / MAX(CASE WHEN rn = {_KMV_K} THEN u END)
               END AS e
        FROM (SELECT u, ROW_NUMBER() OVER (ORDER BY u ASC) AS rn FROM hb)
    ),
    est_u AS (
        SELECT CASE WHEN COUNT(*) < {_KMV_K} THEN CAST(COUNT(*) AS DOUBLE)
                    ELSE ({_KMV_K} - 1) / MAX(CASE WHEN rn = {_KMV_K} THEN u END)
               END AS e
        FROM (SELECT u, ROW_NUMBER() OVER (ORDER BY u ASC) AS rn FROM hu)
    )
    SELECT (SELECT COUNT(*) FROM a) AS exact_a,
           (SELECT COUNT(*) FROM b) AS exact_b,
           (SELECT COUNT(*) FROM a JOIN b USING (user_id)) AS exact_intersection,
           ROUND(est_a.e, 6) AS kmv_a,
           ROUND(est_b.e, 6) AS kmv_b,
           ROUND(est_u.e, 6) AS kmv_union,
           ROUND(GREATEST(est_a.e + est_b.e - est_u.e, 0.0), 6) AS kmv_intersection
    FROM est_a, est_b, est_u
    """,
)
def kmv_type_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET ALGEBRA: estimate the overlap between the click and
    purchase user populations by inclusion–exclusion over three sketches —
    |A∩B| ≈ est(A) + est(B) − est(A∪B), where the union sketch is just the
    k smallest hashes of the two sketches' union (the mergeability that
    makes sketches composable without re-reading data).  The exact counts
    ride along so the estimate's error is visible; everything is the
    deterministic md5-uniform hash, so even the ESTIMATES hash-check
    cross-engine.

    Shape at 100 TB: each sketch is one distinct-shuffle + a k-row window;
    the union estimate needs only the two k-row sketches, never the data —
    the entire set-overlap analysis ships 3k doubles."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    u_expr = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
        .cast("double")
        / F.lit(281474976710656.0)
    )

    def sketch(df):
        hashed = df.select(u_expr.alias("u")).distinct()
        w = Window.orderBy(F.asc("u"))
        ranked = hashed.select("u", F.row_number().over(w).alias("rn"))
        return ranked.agg(
            F.when(F.count("*") < _KMV_K, F.count("*").cast("double"))
            .otherwise(
                F.lit(float(_KMV_K - 1))
                / F.max(F.when(F.col("rn") == _KMV_K, F.col("u")))
            )
            .alias("e")
        )

    a = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    b = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    est_a = sketch(a).withColumnRenamed("e", "ea")
    est_b = sketch(b).withColumnRenamed("e", "eb")
    est_u = sketch(a.unionAll(b)).withColumnRenamed("e", "eu")
    exact = (
        a.withColumn("ina", F.lit(1))
        .join(b.withColumn("inb", F.lit(1)), "user_id", "full")
        .agg(
            F.sum("ina").alias("exact_a"),
            F.sum("inb").alias("exact_b"),
            F.sum(
                (F.col("ina").isNotNull() & F.col("inb").isNotNull()).cast("int")
            ).alias("exact_intersection"),
        )
    )
    return (
        exact.crossJoin(F.broadcast(est_a))
        .crossJoin(F.broadcast(est_b))
        .crossJoin(F.broadcast(est_u))
        .select(
            "exact_a",
            "exact_b",
            "exact_intersection",
            F.round("ea", 6).alias("kmv_a"),
            F.round("eb", 6).alias("kmv_b"),
            F.round("eu", 6).alias("kmv_union"),
            F.round(F.greatest(F.col("ea") + F.col("eb") - F.col("eu"), F.lit(0.0)), 6).alias(
                "kmv_intersection"
            ),
        )
    )


@register(
    "bitmap_index_intersection",
    oracle="""
    WITH keys_r AS (
        SELECT DISTINCT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R'
    ),
    keys_f AS (
        SELECT DISTINCT l_orderkey AS k FROM lineitem WHERE l_linestatus = 'F'
    ),
    bm_r AS (
        SELECT k // 32 AS blk,
               SUM(CAST(1 AS BIGINT) << CAST(k % 32 AS INT)) AS w
        FROM keys_r GROUP BY k // 32
    ),
    bm_f AS (
        SELECT k // 32 AS blk,
               SUM(CAST(1 AS BIGINT) << CAST(k % 32 AS INT)) AS w
        FROM keys_f GROUP BY k // 32
    ),
    merged AS (
        SELECT COALESCE(r.blk, f.blk) AS blk,
               COALESCE(r.w, 0) AS wr, COALESCE(f.w, 0) AS wf
        FROM bm_r r FULL OUTER JOIN bm_f f ON f.blk = r.blk
    ),
    bitmap AS (
        SELECT CAST(SUM(bit_count(wr)) AS BIGINT) AS n_returned,
               CAST(SUM(bit_count(wf)) AS BIGINT) AS n_finished,
               CAST(SUM(bit_count(wr & wf)) AS BIGINT) AS n_both_bitmap,
               CAST(SUM(bit_count(wr | wf)) AS BIGINT) AS n_either_bitmap
        FROM merged
    ),
    per_order AS (
        SELECT l_orderkey,
               MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r,
               MAX(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS has_f
        FROM lineitem GROUP BY l_orderkey
    ),
    direct AS (
        SELECT CAST(SUM(CASE WHEN has_r = 1 AND has_f = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_both_direct,
               CAST(SUM(CASE WHEN has_r = 1 OR has_f = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_either_direct
        FROM per_order
    )
    SELECT b.n_returned, b.n_finished, b.n_both_bitmap, b.n_either_bitmap,
           d.n_both_direct, d.n_either_direct
    FROM bitmap b CROSS JOIN direct d
    """,
)
def bitmap_index_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index emulation over plain parquet, on the ORDER-KEY domain:
    one bitmap per predicate ("order contains a returned item",
    "order contains a finished-status item") as 32-bit words keyed by
    key-block, then the conjunction/disjunction counts answered with
    bitwise AND/OR + popcount on the word pairs — the access path OLAP
    engines (Oracle bitmap indexes, Druid, Pinot, Kylin) use for
    multi-predicate membership queries.  The bitmap is built over DISTINCT
    qualifying keys, so each bit is set at most once and the word SUM is
    exactly the bitwise OR (the fact table itself has duplicate
    (orderkey, linenumber) pairs in these fixtures — a row-level rowid is
    NOT unique, which is why the indexed domain is the key space).  The
    same output row carries the direct per-order scan counts, so the
    result is self-certifying: bitmap == direct or the hash fails
    (property-tested too).

    Words are 32-bit on purpose: a 64-bit word with bit 63 set would
    overflow BIGINT summation on the Spark side (DuckDB silently promotes
    to HUGEINT — an engine divergence this layout never enters).

    Scale posture: per predicate one distinct + one map-side-combined
    aggregate on the uniform block key; the AND is a full-outer equi-join
    on block — no row-level intersection ever materializes, and the
    bitmap's size is the key-domain density, not the fact-table size."""
    li = load_table(spark, sf_dir, "lineitem")

    def bitmap(pred, name):
        return (
            li.filter(pred)
            .select(F.col("l_orderkey").alias("k"))
            .distinct()
            .groupBy(F.expr("k div 32").alias("blk"))
            .agg(
                F.expr(
                    "SUM(shiftleft(CAST(1 AS BIGINT), CAST(k % 32 AS INT)))"
                ).alias(name)
            )
        )

    bm_r = bitmap(F.col("l_returnflag") == "R", "wr")
    bm_f = bitmap(F.col("l_linestatus") == "F", "wf")
    merged = (
        bm_r.join(bm_f, "blk", "full_outer")
        .select(
            F.coalesce("wr", F.lit(0)).alias("wr"),
            F.coalesce("wf", F.lit(0)).alias("wf"),
        )
    )
    bitmap_counts = merged.agg(
        F.sum(F.bit_count("wr")).cast("bigint").alias("n_returned"),
        F.sum(F.bit_count("wf")).cast("bigint").alias("n_finished"),
        F.sum(F.bit_count(F.col("wr").bitwiseAND(F.col("wf")))).cast("bigint").alias("n_both_bitmap"),
        F.sum(F.bit_count(F.col("wr").bitwiseOR(F.col("wf")))).cast("bigint").alias("n_either_bitmap"),
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_r"),
        F.max((F.col("l_linestatus") == "F").cast("int")).alias("has_f"),
    )
    direct = per_order.agg(
        F.sum(((F.col("has_r") == 1) & (F.col("has_f") == 1)).cast("int"))
        .cast("bigint")
        .alias("n_both_direct"),
        F.sum(((F.col("has_r") == 1) | (F.col("has_f") == 1)).cast("int"))
        .cast("bigint")
        .alias("n_either_direct"),
    )
    return bitmap_counts.crossJoin(direct)


# Portable HyperLogLog (Flajolet et al. 2007): m=256 registers keyed by the
# first md5 byte, rank rho = leading-zero count of the next 48 hash bits + 1.
# Everything that decides a register value is INTEGER/STRING logic (hex-digit
# leading-zero walk, no floating log2 whose boundary rounding could differ
# between engines), and the register sum Σ 2^(-M_j) is carried as the exact
# integer Σ 2^(49-M_j) (≤ 256·2^48 < 2^63), so both engines feed the SAME
# integers into one identical float expression.  Unlike Spark's built-in
# approx_count_distinct (whose register hashing is engine-internal — the
# rows-only `hll_daily_distinct_error`), this sketch is deterministic and
# portable, so the ESTIMATE ITSELF is oracle-hash-checked.
_HLL_M = 256
_HLL_TWO49 = 1 << 49
# leading zero BITS contributed by the first non-zero hex digit
_HLL_EXTRA_SQL = (
    "CASE WHEN d IN ('4','5','6','7') THEN 1 "
    "WHEN d IN ('2','3') THEN 2 WHEN d = '1' THEN 3 ELSE 0 END"
)


@register(
    "hll_portable_daily",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        FROM events WHERE user_id IS NOT NULL
    ),
    h AS (SELECT day, md5(CAST(user_id AS VARCHAR)) AS hx FROM du),
    parts AS (
        SELECT day,
               CAST(CAST('0x' || substr(hx, 1, 2) AS BIGINT) AS INT) AS idx,
               substr(hx, 3, 12) AS rem
        FROM h
    ),
    z AS (
        SELECT day, idx, rem,
               length(regexp_extract(rem, '^0*')) AS nz,
               substr(rem, length(regexp_extract(rem, '^0*')) + 1, 1) AS d
        FROM parts
    ),
    rho AS (
        SELECT day, idx,
               CASE WHEN nz = 12 THEN 49
                    ELSE 4 * nz + ({_HLL_EXTRA_SQL}) + 1 END AS rho
        FROM z
    ),
    regs AS (SELECT day, idx, MAX(rho) AS reg FROM rho GROUP BY day, idx),
    per_day AS (
        SELECT day,
               COUNT(*) AS n_present,
               SUM(CAST(power(2.0, 49 - reg) AS BIGINT)) AS s_present
        FROM regs GROUP BY day
    ),
    est AS (
        SELECT day,
               {_HLL_M} - n_present AS v,
               ((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0)
                   * 562949953421312.0
                   / CAST(s_present + ({_HLL_M} - n_present)
                          * {_HLL_TWO49} AS DOUBLE) AS e_raw
        FROM per_day
    ),
    fin AS (
        SELECT day,
               CASE WHEN e_raw <= 640.0 AND v > 0
                    THEN 256.0 * ln(256.0 / v) ELSE e_raw END AS hll_estimate
        FROM est
    ),
    exact AS (SELECT day, COUNT(*) AS exact_distinct FROM du GROUP BY day)
    SELECT x.day, x.exact_distinct,
           ROUND(f.hll_estimate, 6) AS hll_estimate,
           ROUND(ABS(f.hll_estimate - x.exact_distinct) / x.exact_distinct, 6)
               AS rel_error
    FROM exact x JOIN fin f ON f.day = x.day
    """,
)
def hll_portable_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day distinct-user estimate from a PORTABLE HyperLogLog built on
    md5 — the register construction (first hash byte selects one of 256
    registers, rank = leading-zero count of the next 48 bits + 1) is pure
    integer/string logic shared verbatim with the DuckDB oracle, so the
    HLL ESTIMATE is hash-checked cross-engine, not just sanity-bounded
    (the built-in ``approx_count_distinct`` report can only ever be
    rows-only: its register hashing is Spark-internal).

    Shape at 100 TB: registers fold MAP-SIDE — ``MAX(rho) GROUP BY (day,
    idx)`` is a partial aggregate with ≤256 rows of state per day per
    task, and register frames MERGE by the same max, which is why HLL is
    the counting sketch every warehouse ships.  Linear-counting correction
    (``m·ln(m/V)``) applies below 2.5m, exactly as published; the register
    sum is carried as an exact integer so no float-accumulation order can
    drift the estimate."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    du = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    h = du.select("day", F.md5(F.col("user_id").cast("string")).alias("hx"))
    parts = h.select(
        "day",
        F.conv(F.substring("hx", 1, 2), 16, 10).cast("int").alias("idx"),
        F.substring("hx", 3, 12).alias("rem"),
    )
    z = parts.select(
        "day",
        "idx",
        F.length(F.regexp_extract("rem", "^0*", 0)).alias("nz"),
        F.expr(
            "substr(rem, length(regexp_extract(rem, '^0*', 0)) + 1, 1)"
        ).alias("d"),
    )
    rho = z.select(
        "day",
        "idx",
        F.when(F.col("nz") == 12, F.lit(49))
        .otherwise(F.col("nz") * 4 + F.expr(_HLL_EXTRA_SQL) + 1)
        .alias("rho"),
    )
    regs = rho.groupBy("day", "idx").agg(F.max("rho").alias("reg"))
    per_day = regs.groupBy("day").agg(
        F.count("*").alias("n_present"),
        F.sum(F.pow(F.lit(2.0), F.lit(49) - F.col("reg")).cast("bigint")).alias(
            "s_present"
        ),
    )
    est = per_day.select(
        "day",
        (F.lit(_HLL_M) - F.col("n_present")).alias("v"),
        (
            F.lit((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0)
            * F.lit(562949953421312.0)
            / (
                F.col("s_present")
                + (F.lit(_HLL_M) - F.col("n_present")) * F.lit(_HLL_TWO49)
            ).cast("double")
        ).alias("e_raw"),
    )
    fin = est.select(
        "day",
        F.when(
            (F.col("e_raw") <= 640.0) & (F.col("v") > 0),
            F.lit(256.0) * F.log(F.lit(256.0) / F.col("v")),
        )
        .otherwise(F.col("e_raw"))
        .alias("hll_estimate"),
    )
    exact = du.groupBy("day").agg(F.count("*").alias("exact_distinct"))
    return exact.join(fin, "day").select(
        "day",
        "exact_distinct",
        F.round("hll_estimate", 6).alias("hll_estimate"),
        F.round(
            F.abs(F.col("hll_estimate") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            6,
        ).alias("rel_error"),
    )


# --- AMS F2 (second frequency moment) sketch ---------------------------------
#
# Alon-Matias-Szegedy (1996): J=32 independent ±1-sign estimators, grouped
# 8 x 4, estimate = median over groups of the mean of Z² within the group.
# The sign s_j(u) is the parity of the first hex digit of md5(j || ':' || u)
# — pure integer/string logic shared verbatim with the oracle, so every Z_j
# is an exact integer and the estimate is exact-integer arithmetic until
# two final divisions (the same portability recipe as the count-min and KMV
# sketches).
_AMS_J = 32
_AMS_SIGN = (
    "CASE WHEN CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||"
    " CAST(user_id AS VARCHAR)), 1, 1) AS BIGINT) % 2 = 0"
    " THEN 1 ELSE -1 END"
)
_AMS_SIGN_SPARK = (
    "CASE WHEN CAST(conv(substr(md5(CAST(j AS STRING) || ':' ||"
    " CAST(user_id AS STRING)), 1, 1), 16, 10) AS BIGINT) % 2 = 0"
    " THEN 1 ELSE -1 END"
)


@register(
    "ams_f2_sketch",
    oracle=f"""
    WITH freq AS (
        SELECT user_id, COUNT(*) AS f
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    signs AS (
        SELECT g.j, ({_AMS_SIGN}) * f AS term
        FROM freq, generate_series(0, {_AMS_J - 1}) g(j)
    ),
    z AS (SELECT j, SUM(term) AS zj FROM signs GROUP BY j),
    grp AS (
        SELECT j % 8 AS grp, SUM(zj * zj) AS s4, COUNT(*) AS m
        FROM z GROUP BY j % 8
    ),
    med AS (
        SELECT quantile_cont(CAST(s4 AS DOUBLE) / m, 0.5) AS est FROM grp
    ),
    exact AS (SELECT SUM(f * f) AS f2, COUNT(*) AS n_users FROM freq)
    SELECT CAST(e.n_users AS BIGINT) AS n_users,
           CAST(e.f2 AS BIGINT) AS exact_f2,
           ROUND(m.est, 6) AS ams_estimate,
           ROUND(ABS(m.est - e.f2) / e.f2, 6) AS rel_error
    FROM exact e, med m
    """,
)
def ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS sketch estimate of the second frequency moment F2 = Σ f_u² of
    the user-activity stream (the self-join-size / repeat-rate statistic
    that drives skew-aware join planning), alongside the exact value and
    relative error.  32 ±1-sign estimators, median-of-8-means — the
    textbook variance reduction.

    Cross-engine exactness: signs are md5-parity (shared string logic),
    each Z_j = Σ f_u·s_j(u) is an exact integer, Z² sums are exact, and
    the median is quantile_cont over 8 exactly-equal doubles — Spark's
    ``percentile`` computes the same interpolated midpoint.

    Shape at 100 TB: frequencies first (one user-keyed partial agg), then
    a ×32 fan-out over the DISTINCT-USER frame (never the raw stream) into
    a 32-group aggregate — sketch state is 32 integers, mergeable by
    addition, which is the whole point of AMS."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    freq = ev.groupBy("user_id").agg(F.count("*").alias("f"))
    signs = freq.select(
        F.explode(F.expr(f"sequence(0, {_AMS_J - 1})")).alias("j"),
        "user_id",
        "f",
    ).selectExpr("j", f"({_AMS_SIGN_SPARK}) * f AS term")
    z = signs.groupBy("j").agg(F.sum("term").alias("zj"))
    grp = z.groupBy((F.col("j") % 8).alias("grp")).agg(
        F.expr("SUM(zj * zj)").alias("s4"), F.count("*").alias("m")
    )
    med = grp.agg(
        F.expr("percentile(CAST(s4 AS DOUBLE) / m, 0.5D)").alias("est")
    )
    exact = freq.agg(
        F.expr("SUM(f * f)").alias("f2"), F.count("*").alias("n_users")
    )
    return exact.crossJoin(F.broadcast(med)).selectExpr(
        "CAST(n_users AS BIGINT) AS n_users",
        "CAST(f2 AS BIGINT) AS exact_f2",
        "ROUND(est, 6) AS ams_estimate",
        "ROUND(ABS(est - f2) / f2, 6) AS rel_error",
    )


# --- Portable mergeable-histogram quantile ------------------------------------
#
# Decimal leading-digit bins (pure integer/string logic, same portability
# discipline as the HLL above): bin key = (digit count d, first three digits
# lead) of FLOOR(v); lower bound = lead * 10^(d-3).  Bin width / lower bound
# <= 1/100, so the bin-lower-bound estimate is within 1% of the exact order
# statistic BY CONSTRUCTION — the bound the rel_err columns certify.
_HQ_T50 = "CAST(FLOOR((n + 1) / 2.0) AS BIGINT)"
_HQ_T95 = "CAST(FLOOR((19.0 * n + 19.0) / 20.0) AS BIGINT)"


@register(
    "histogram_quantile_portable",
    oracle=f"""
    WITH v AS (
        SELECT l_returnflag AS flag, l_extendedprice AS x,
               CAST(FLOOR(l_extendedprice) AS BIGINT) AS iv
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_extendedprice >= 100
    ),
    b AS (
        SELECT flag, x,
               CAST(substr(CAST(iv AS VARCHAR), 1, 3) AS BIGINT)
                   * CAST(power(10.0, length(CAST(iv AS VARCHAR)) - 3)
                          AS BIGINT) AS lo
        FROM v
    ),
    hist AS (SELECT flag, lo, COUNT(*) AS c FROM b GROUP BY flag, lo),
    hcum AS (
        SELECT flag, lo,
               SUM(c) OVER (PARTITION BY flag ORDER BY lo
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
               SUM(c) OVER (PARTITION BY flag) AS n
        FROM hist
    ),
    est AS (
        SELECT flag,
               MIN(CASE WHEN cc >= {_HQ_T50} THEN lo END) AS est_p50,
               MIN(CASE WHEN cc >= {_HQ_T95} THEN lo END) AS est_p95
        FROM hcum GROUP BY flag
    ),
    pv AS (SELECT flag, x, COUNT(*) AS c FROM b GROUP BY flag, x),
    pcum AS (
        SELECT flag, x,
               SUM(c) OVER (PARTITION BY flag ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
               SUM(c) OVER (PARTITION BY flag) AS n
        FROM pv
    ),
    ex AS (
        SELECT flag,
               MIN(CASE WHEN cc >= {_HQ_T50} THEN x END) AS exact_p50,
               MIN(CASE WHEN cc >= {_HQ_T95} THEN x END) AS exact_p95
        FROM pcum GROUP BY flag
    )
    SELECT e.flag AS l_returnflag,
           CAST(e.est_p50 AS BIGINT) AS est_p50,
           CAST(e.est_p95 AS BIGINT) AS est_p95,
           ROUND(x.exact_p50, 2) AS exact_p50,
           ROUND(x.exact_p95, 2) AS exact_p95,
           ROUND(ABS(e.est_p50 - x.exact_p50) / x.exact_p50, 6) AS rel_err_p50,
           ROUND(ABS(e.est_p95 - x.exact_p95) / x.exact_p95, 6) AS rel_err_p95
    FROM est e JOIN ex x ON x.flag = e.flag
    """,
)
def histogram_quantile_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a PORTABLE mergeable histogram — the
    100 TB quantile path made cross-engine-checkable.  Bins are decimal
    leading-digit buckets of FLOOR(price) ((digit-count, first-3-digits)
    — pure integer/string logic, the same portability discipline as
    `hll_portable_daily`; no libm log whose last-ulp could differ between
    engines), so per-partition (flag, bin) COUNT partials merge
    associatively and the bin frame is ≤900 rows per decade regardless of
    data volume.  The estimate is the LOWER BOUND of the bin where the
    cumulative count crosses rank ⌈q·n⌉; bin width ≤ 1% of its lower
    bound, so the estimate sits within 1% of the exact order statistic BY
    CONSTRUCTION — and unlike Spark's built-in ``approx_percentile``
    (engine-internal GK sketch, see `approx_percentile_error`), the
    ESTIMATE ITSELF is hash-checked against the DuckDB replay, alongside
    the exact order statistic and the realized relative errors.

    At 100 TB the exact side would be dropped and only the histogram
    runs: one scan, bounded bins, no sort — exactly how warehouse
    percentile dashboards are built."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    v = li.filter(
        F.col("l_extendedprice").isNotNull() & (F.col("l_extendedprice") >= 100)
    ).selectExpr(
        "l_returnflag AS flag",
        "l_extendedprice AS x",
        "CAST(FLOOR(l_extendedprice) AS BIGINT) AS iv",
    )
    b = v.selectExpr(
        "flag",
        "x",
        "CAST(substr(CAST(iv AS STRING), 1, 3) AS BIGINT)"
        " * CAST(power(10.0, length(CAST(iv AS STRING)) - 3) AS BIGINT) AS lo",
    )
    w_flag = Window.partitionBy("flag")

    def _crossings(frame: DataFrame, col: str) -> DataFrame:
        w_cum = (
            Window.partitionBy("flag")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = frame.select(
            "flag",
            col,
            F.sum("c").over(w_cum).alias("cc"),
            F.sum("c").over(w_flag).alias("n"),
        )
        return cum.groupBy("flag").agg(
            F.min(F.when(F.expr(f"cc >= {_HQ_T50}"), F.col(col))).alias("p50"),
            F.min(F.when(F.expr(f"cc >= {_HQ_T95}"), F.col(col))).alias("p95"),
        )

    hist = b.groupBy("flag", "lo").agg(F.count("*").alias("c"))
    est = _crossings(hist, "lo").withColumnsRenamed(
        {"p50": "est_p50", "p95": "est_p95"}
    )
    pv = b.groupBy("flag", "x").agg(F.count("*").alias("c"))
    ex = _crossings(pv, "x").withColumnsRenamed(
        {"p50": "exact_p50", "p95": "exact_p95"}
    )
    return est.join(ex, "flag").select(
        F.col("flag").alias("l_returnflag"),
        F.col("est_p50").cast("bigint").alias("est_p50"),
        F.col("est_p95").cast("bigint").alias("est_p95"),
        F.round("exact_p50", 2).alias("exact_p50"),
        F.round("exact_p95", 2).alias("exact_p95"),
        F.round(
            F.abs(F.col("est_p50") - F.col("exact_p50")) / F.col("exact_p50"), 6
        ).alias("rel_err_p50"),
        F.round(
            F.abs(F.col("est_p95") - F.col("exact_p95")) / F.col("exact_p95"), 6
        ).alias("rel_err_p95"),
    )


# --- Hash-sampled join-cardinality estimate -----------------------------------
#
# Optimizer-stats sketch: the self-join size on a key equals the F2 moment
# of its frequency vector; a 1/64 hash sample of KEYS (not rows) estimates
# it with one tiny frame.  Threshold = 2^24/64 on the first 6 md5 hex
# digits — integer logic, portable (same discipline as hll_portable_daily).
_JC_RATE = 64
_JC_T = (1 << 24) // _JC_RATE


@register(
    "join_cardinality_estimate",
    oracle=f"""
    WITH freq AS (
        SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS c
        FROM lineitem WHERE l_partkey IS NOT NULL
        GROUP BY l_partkey
    ),
    hashed AS (
        SELECT k, c,
               CAST(CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 6)
                    AS BIGINT) AS BIGINT) AS h
        FROM freq
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(CASE WHEN h < {_JC_T} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_sampled,
               CAST(SUM(c * c) AS BIGINT) AS exact_size,
               CAST({_JC_RATE} * SUM(CASE WHEN h < {_JC_T} THEN c * c ELSE 0 END)
                    AS BIGINT) AS est_size
        FROM hashed
    )
    SELECT n_keys, n_sampled, exact_size, est_size,
           ROUND(ABS(CAST(est_size AS DOUBLE) - exact_size) / exact_size, 6)
               AS rel_err
    FROM s
    """,
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from a hash sample of KEYS — the optimizer
    statistic that decides broadcast-vs-shuffle before running a join.
    The self-join size on l_partkey is Σ c_k² (the F2 moment of the key
    frequency vector); the estimator keeps only keys whose md5 prefix
    falls under 2^24/64 (a deterministic 1/64 KEY sample — sampling keys,
    not rows, is what keeps per-key counts exact inside the sample) and
    scales by 64.  Both the exact and the estimated size are emitted with
    the realized relative error, all hash-checked: the sample is integer
    hash logic, so the ESTIMATE itself replays bit-for-bit in the oracle
    (same portability discipline as `hll_portable_daily`).

    At 100 TB the exact Σc² column is dropped and only the sampled branch
    runs: the frequency aggregate is one map-side-combined pass, and the
    sampled frame is ~|keys|/64 rows — the whole point of the sketch."""
    li = load_table(spark, sf_dir, "lineitem")
    freq = (
        li.filter(F.col("l_partkey").isNotNull())
        .groupBy(F.col("l_partkey").alias("k"))
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    hashed = freq.selectExpr(
        "k",
        "c",
        "CAST(conv(substr(md5(CAST(k AS STRING)), 1, 6), 16, 10) AS BIGINT) AS h",
    )
    s = hashed.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum(F.expr(f"CASE WHEN h < {_JC_T} THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_sampled"),
        F.sum(F.expr("c * c")).cast("bigint").alias("exact_size"),
        (
            F.lit(_JC_RATE)
            * F.sum(F.expr(f"CASE WHEN h < {_JC_T} THEN c * c ELSE 0 END"))
        )
        .cast("bigint")
        .alias("est_size"),
    )
    return s.selectExpr(
        "n_keys",
        "n_sampled",
        "exact_size",
        "est_size",
        "ROUND(ABS(CAST(est_size AS DOUBLE) - exact_size) / exact_size, 6)"
        " AS rel_err",
    )
