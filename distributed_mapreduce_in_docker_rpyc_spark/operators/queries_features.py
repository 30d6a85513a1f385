"""ML feature-engineering operators — the table-to-training-matrix steps a
100 TB feature pipeline runs after cleaning/dedup (SURVEY.md §7 M4 scope
extension).  All pure codegen expressions; hashes use the md5-prefix trick
(portable between Spark and DuckDB, same as the count-min buckets in
queries_sketches.py) rather than engine-specific hash functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_mapreduce_in_docker_rpyc_spark.registry import register
from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

_HASH_DIM = 32

# Cramer's-rule solve of the 3x3 normal equations for OLS with intercept
# (regressors 1, x1, x2).  The SAME expression strings feed Spark's
# selectExpr and the DuckDB oracle, so the double arithmetic is evaluated
# in an identical shape in both engines over bit-identical inputs (the
# sufficient statistics are exact DECIMAL sums cast to double once).
_LR_DETS = {
    "det": "n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2)",
    "det0": "sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y)",
    "det1": "n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2)",
    "det2": "n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2)",
}
_LR_BETAS = {
    "b0": f"(({_LR_DETS['det0']}) / ({_LR_DETS['det']}))",
    "b1": f"(({_LR_DETS['det1']}) / ({_LR_DETS['det']}))",
    "b2": f"(({_LR_DETS['det2']}) / ({_LR_DETS['det']}))",
}
_LR_R2 = (
    f"1 - (syy - ({_LR_BETAS['b0']}*sy + {_LR_BETAS['b1']}*s1y + {_LR_BETAS['b2']}*s2y))"
    " / (syy - sy*sy/n)"
)
# The sufficient-statistics aggregate, shared verbatim by both engines.
# Inputs stay DOUBLE; each product is computed in IEEE double (bit-identical
# across engines) then cast to DECIMAL(38,6) — the money() trick: the true
# products have <=4 decimal places, the double is within ulps of them, so
# the cast recovers the exact decimal and the SUM is order- and
# engine-independent.  DECIMAL x DECIMAL is avoided entirely (DuckDB caps
# multiply width and overflows at (18,6) x (18,6)).
_LR_SUMS = """
    CAST(COUNT(*) AS DOUBLE)                           AS n,
    CAST(SUM(CAST(x1    AS DECIMAL(38,6))) AS DOUBLE)  AS s1,
    CAST(SUM(CAST(x2    AS DECIMAL(38,6))) AS DOUBLE)  AS s2,
    CAST(SUM(CAST(y     AS DECIMAL(38,6))) AS DOUBLE)  AS sy,
    CAST(SUM(CAST(x1*x1 AS DECIMAL(38,6))) AS DOUBLE)  AS s11,
    CAST(SUM(CAST(x1*x2 AS DECIMAL(38,6))) AS DOUBLE)  AS s12,
    CAST(SUM(CAST(x2*x2 AS DECIMAL(38,6))) AS DOUBLE)  AS s22,
    CAST(SUM(CAST(x1*y  AS DECIMAL(38,6))) AS DOUBLE)  AS s1y,
    CAST(SUM(CAST(x2*y  AS DECIMAL(38,6))) AS DOUBLE)  AS s2y,
    CAST(SUM(CAST(y*y   AS DECIMAL(38,6))) AS DOUBLE)  AS syy
"""


@register(
    "linreg_normal_equations",
    oracle=f"""
    WITH obs AS (
        SELECT l_quantity AS x1, l_discount AS x2, l_extendedprice AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
          AND l_extendedprice IS NOT NULL
    ),
    stats AS (SELECT {_LR_SUMS} FROM obs)
    SELECT CAST(n AS BIGINT) AS n_obs,
           ROUND({_LR_BETAS['b0']}, 6) AS intercept,
           ROUND({_LR_BETAS['b1']}, 6) AS coef_quantity,
           ROUND({_LR_BETAS['b2']}, 6) AS coef_discount,
           ROUND({_LR_R2}, 6) AS r2
    FROM stats
    """,
)
def linreg_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed OLS training via sufficient statistics — the way linear
    models are actually fit at 100 TB: one map-side-combined pass computes
    the ten exact moment sums (n, Sx, Sxx, Sxy, ...), and the 3x3 normal
    equations solve on a one-row frame by Cramer's rule.  Fits
    ``extendedprice ~ quantity + discount`` and reports coefficients + R².

    No per-row Python, no iteration, no gram-matrix shuffle: the entire
    model reduces to a single HashAggregate whose output is ~10 doubles,
    identical in cost shape to a COUNT(*).  Exactness: all products ride
    DECIMAL(38,6) (inputs have <=2 true decimal places), so both engines feed
    bit-identical doubles into the textually-shared Cramer expressions."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_quantity").isNotNull()
            & F.col("l_discount").isNotNull()
            & F.col("l_extendedprice").isNotNull()
        )
        .selectExpr(
            "l_quantity AS x1",
            "l_discount AS x2",
            "l_extendedprice AS y",
        )
    )
    stats = li.groupBy().agg(
        *[
            F.expr(part.strip())
            for part in _split_agg_exprs(_LR_SUMS)
        ]
    )
    return stats.selectExpr(
        "CAST(n AS BIGINT) AS n_obs",
        f"ROUND({_LR_BETAS['b0']}, 6) AS intercept",
        f"ROUND({_LR_BETAS['b1']}, 6) AS coef_quantity",
        f"ROUND({_LR_BETAS['b2']}, 6) AS coef_discount",
        f"ROUND({_LR_R2}, 6) AS r2",
    )


def _split_agg_exprs(sums_sql: str) -> list[str]:
    """Split the shared sufficient-statistics SELECT-list into individual
    aggregate expressions (they contain no nested commas outside parens)."""
    out, depth, cur = [], 0, []
    for ch in sums_sql:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [e.strip() for e in out if e.strip()]


def _bucket(col):
    """Portable hash-mod-32 of a string column: first 8 md5 hex digits as an
    integer, mod the feature dimension — identical in Spark and DuckDB."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"), F.lit(_HASH_DIM)
    )


@register(
    "feature_hashing_trick",
    oracle="""
    WITH feats AS (
        SELECT p_partkey, f
        FROM part, unnest([
            'brand=' || coalesce(p_brand, ''),
            'type='  || coalesce(p_type, ''),
            'size='  || CAST(coalesce(p_size, -1) // 10 AS VARCHAR)
        ]) AS u(f)
    )
    SELECT p_partkey,
           CAST(CAST('0x' || substr(md5(f), 1, 8) AS BIGINT) % 32 AS BIGINT)
               AS feature_idx,
           CAST(count(*) AS BIGINT) AS n
    FROM feats
    GROUP BY 1, 2
    """,
)
def feature_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): categorical features
    (brand, type, decile-bucketed size) hashed into a fixed 32-dim sparse
    count vector per part — unbounded vocabularies become a constant-width
    feature space with no dictionary to build, ship, or keep consistent
    across 1000 executors.  Output is the sparse COO form
    (row key, feature index, count); collisions (n > 1) are the method's
    documented tradeoff.

    Scale posture: per-row array build + one explode + partial-agg groupBy
    on (key, idx) — no dictionary broadcast, no shuffle wider than the
    output."""
    p = load_table(spark, sf_dir, "part")
    feats = F.array(
        F.concat(F.lit("brand="), F.coalesce(F.col("p_brand"), F.lit(""))),
        F.concat(F.lit("type="), F.coalesce(F.col("p_type"), F.lit(""))),
        F.concat(
            F.lit("size="),
            F.floor(F.coalesce(F.col("p_size"), F.lit(-1)) / 10).cast("string"),
        ),
    )
    return (
        p.select("p_partkey", F.explode(feats).alias("f"))
        .groupBy("p_partkey", _bucket(F.col("f")).alias("feature_idx"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "target_encode_brand",
    oracle="""
    WITH joined AS (
        SELECT p.p_brand, CAST(l.l_extendedprice AS DECIMAL(24,6)) AS y
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    gstats AS (SELECT CAST(sum(y) AS DOUBLE) / count(*) AS prior FROM joined),
    per AS (
        SELECT p_brand, count(*) AS n, CAST(sum(y) AS DOUBLE) AS s
        FROM joined GROUP BY p_brand
    )
    SELECT p_brand, CAST(n AS BIGINT) AS n,
           round(s / n, 4) AS raw_mean,
           round((s + prior * 100) / (n + 100), 4) AS encoded
    FROM per, gstats
    """,
)
def target_encode_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding (the empirical-Bayes categorical encoder):
    each brand's feature value is its mean item price shrunk toward the
    global mean with pseudo-count m=100 — rare categories get the prior,
    frequent ones their own mean, and no high-cardinality one-hot blowup.
    The leakage-control variants (k-fold / leave-one-out) change only the
    aggregation scope.

    Scale posture: one fact-dim equi-join (part side broadcastable), one
    groupBy on the category key, global prior on a broadcast 1-row frame.
    Sums ride DECIMAL(24,6) so both engines agree bit-for-bit before the
    final double division (the established money-sum pattern)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_brand", F.col("l_extendedprice").cast("decimal(24,6)").alias("y")
    )
    glob = joined.agg(
        (F.sum("y").cast("double") / F.count("*")).alias("prior")
    )
    per = joined.groupBy("p_brand").agg(
        F.count("*").alias("n"), F.sum("y").cast("double").alias("s")
    )
    return per.crossJoin(F.broadcast(glob)).select(
        "p_brand",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("s") / F.col("n"), 4).alias("raw_mean"),
        F.round((F.col("s") + F.col("prior") * 100) / (F.col("n") + 100), 4).alias(
            "encoded"
        ),
    )


@register(
    "target_encode_kfold",
    oracle="""
    WITH joined AS (
        SELECT p.p_brand,
               CAST(CAST('0x' || substr(md5(CAST(l.l_orderkey AS VARCHAR)), 1, 8)
                    AS BIGINT) % 5 AS BIGINT) AS fold,
               CAST(l.l_extendedprice AS DECIMAL(24,6)) AS y
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    gstats AS (SELECT CAST(sum(y) AS DOUBLE) / count(*) AS prior FROM joined),
    per AS (
        SELECT p_brand, fold, count(*) AS n, CAST(sum(y) AS DOUBLE) AS s
        FROM joined GROUP BY 1, 2
    ),
    tot AS (
        SELECT p_brand, sum(n) AS tn, sum(s) AS ts FROM per GROUP BY 1
    )
    SELECT per.p_brand, per.fold, CAST(per.n AS BIGINT) AS n,
           round((tot.ts - per.s + gstats.prior * 100)
                 / (tot.tn - per.n + 100), 4) AS encoded_oof
    FROM per JOIN tot USING (p_brand), gstats
    """,
)
def target_encode_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding — the leakage-controlled variant of
    ``target_encode_brand`` every real training pipeline uses: rows are
    hashed into 5 deterministic folds (md5 of the order key, portable), and
    each fold's encoding is computed from the OTHER folds only
    ((total - own fold + prior*m) / (n_total - n_fold + m)), so a row never
    sees its own target.  Output: one encoding per (brand, fold).

    Scale posture: same shuffle shape as the plain encoder plus one extra
    groupBy on (brand, fold) — fold totals derive from the per-fold frame,
    not a second scan; the prior rides a broadcast 1-row frame."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_extendedprice"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    fold = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(5),
    )
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_brand",
        fold.alias("fold"),
        F.col("l_extendedprice").cast("decimal(24,6)").alias("y"),
    )
    gstats = joined.agg((F.sum("y").cast("double") / F.count("*")).alias("prior"))
    per = joined.groupBy("p_brand", "fold").agg(
        F.count("*").alias("n"), F.sum("y").cast("double").alias("s")
    )
    tot = per.groupBy("p_brand").agg(
        F.sum("n").alias("tn"), F.sum("s").alias("ts")
    )
    return (
        per.join(tot, "p_brand")
        .crossJoin(F.broadcast(gstats))
        .select(
            "p_brand",
            "fold",
            F.col("n").cast("long").alias("n"),
            F.round(
                (F.col("ts") - F.col("s") + F.col("prior") * 100)
                / (F.col("tn") - F.col("n") + 100),
                4,
            ).alias("encoded_oof"),
        )
    )


@register(
    "linreg_by_returnflag",
    oracle=f"""
    WITH obs AS (
        SELECT l_returnflag AS grp, l_quantity AS x1, l_discount AS x2,
               l_extendedprice AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
          AND l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL
    ),
    stats AS (SELECT grp, {_LR_SUMS} FROM obs GROUP BY grp)
    SELECT grp AS l_returnflag, CAST(n AS BIGINT) AS n_obs,
           ROUND({_LR_BETAS['b0']}, 6) AS intercept,
           ROUND({_LR_BETAS['b1']}, 6) AS coef_quantity,
           ROUND({_LR_BETAS['b2']}, 6) AS coef_discount,
           ROUND({_LR_R2}, 6) AS r2
    FROM stats
    """,
)
def linreg_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped OLS — one independent regression PER GROUP in a single pass:
    the segment-model pattern (a model per tenant/market/category) that at
    100 TB replaces thousands of sequential fits with one grouped
    aggregation.  Identical sufficient-statistics + Cramer machinery as
    ``linreg_normal_equations``, keyed by l_returnflag; the shuffle carries
    ten doubles per group, nothing else."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_quantity").isNotNull()
            & F.col("l_discount").isNotNull()
            & F.col("l_extendedprice").isNotNull()
            & F.col("l_returnflag").isNotNull()
        )
        .selectExpr(
            "l_returnflag AS grp",
            "l_quantity AS x1",
            "l_discount AS x2",
            "l_extendedprice AS y",
        )
    )
    stats = li.groupBy("grp").agg(
        *[F.expr(part) for part in _split_agg_exprs(_LR_SUMS)]
    )
    return stats.selectExpr(
        "grp AS l_returnflag",
        "CAST(n AS BIGINT) AS n_obs",
        f"ROUND({_LR_BETAS['b0']}, 6) AS intercept",
        f"ROUND({_LR_BETAS['b1']}, 6) AS coef_quantity",
        f"ROUND({_LR_BETAS['b2']}, 6) AS coef_discount",
        f"ROUND({_LR_R2}, 6) AS r2",
    )


# --- Logistic-style classifier via fixed-unroll gradient descent ----------
#
# The engine-portable construction: the link is the ALGEBRAIC "fast sigmoid"
# s(z) = 0.5*(1 + z/(1+|z|)) — same shape as the logistic curve but built
# from +,-,*,/,abs only, all of which IEEE-754 requires to be correctly
# rounded.  exp() is NOT correctly-rounded-guaranteed across libm
# implementations, so classic logistic GD can drift between engines by an
# ulp per row; this link cannot.  Per-row gradient terms are computed in
# double (bit-identical given bit-identical inputs), then quantized to
# DECIMAL(38,6) before summation — fixed-point gradient accumulation, the
# standard trick for DETERMINISTIC parallel reduction (sum of decimals is
# exact and order-independent, so Spark's partial aggregation over any
# partitioning equals DuckDB's serial sum bit-for-bit).  Every expression
# string below feeds BOTH engines verbatim; explicit parentheses pin the
# association order.
_GD_X1 = "((CAST(l_quantity AS DOUBLE) / 50.0) - 0.5)"
_GD_X2 = "((CAST(l_discount AS DOUBLE) * 10.0) - 0.5)"
_GD_Y = "(CASE WHEN l_extendedprice > 36000 THEN 1.0 ELSE 0.0 END)"
_GD_Z = "((b0 + (b1 * x1)) + (b2 * x2))"
_GD_P = f"(0.5 * (1.0 + ({_GD_Z} / (1.0 + abs({_GD_Z})))))"
_GD_GRAD = f"""
    CAST(SUM(CAST(({_GD_P} - y) AS DECIMAL(38,6))) AS DOUBLE)          AS g0,
    CAST(SUM(CAST((({_GD_P} - y) * x1) AS DECIMAL(38,6))) AS DOUBLE)   AS g1,
    CAST(SUM(CAST((({_GD_P} - y) * x2) AS DECIMAL(38,6))) AS DOUBLE)   AS g2,
    CAST(COUNT(*) AS DOUBLE)                                           AS n
"""
_GD_STEP = [
    "(b0 - (2.0 * (g0 / n))) AS b0",
    "(b1 - (2.0 * (g1 / n))) AS b1",
    "(b2 - (2.0 * (g2 / n))) AS b2",
]
_GD_ITERS = 6
_GD_CORRECT = f"(CASE WHEN ({_GD_Z} >= 0.0) = (y = 1.0) THEN 1 ELSE 0 END)"


def _logreg_oracle() -> str:
    parts = [
        f"""
    WITH obs AS (
        SELECT {_GD_X1} AS x1, {_GD_X2} AS x2, {_GD_Y} AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
          AND l_extendedprice IS NOT NULL
    ),
    it0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2)
    """
    ]
    for i in range(1, _GD_ITERS + 1):
        parts.append(
            f""",
    gr{i} AS (SELECT {_GD_GRAD} FROM obs, it{i - 1}),
    it{i} AS (SELECT {", ".join(_GD_STEP)} FROM it{i - 1}, gr{i})"""
        )
    parts.append(
        f""",
    fin AS (
        SELECT COUNT(*) AS n_obs,
               CAST(SUM({_GD_CORRECT}) AS DOUBLE) / COUNT(*) AS acc
        FROM obs, it{_GD_ITERS}
    )
    SELECT fin.n_obs AS n_obs,
           ROUND(b0, 6) AS b0, ROUND(b1, 6) AS b1, ROUND(b2, 6) AS b2,
           ROUND(acc, 6) AS train_accuracy
    FROM fin, it{_GD_ITERS}
    """
    )
    return "".join(parts)


def _gd_obs(spark: SparkSession, sf_dir: str):
    """The persisted GD observation frame, repartitioned to the session's
    full parallelism BEFORE caching: the sf0.1 lineitem parquet splits into
    only 3 input partitions under maxPartitionBytes, so every one of the 6
    training passes would otherwise run on 3 of 32 cores (measured: the
    one-time shuffle cuts the sf0.1 fit 13.7 -> ~3 s).  At 100 TB the scan
    is naturally wide and the repartition folds into the ingest exchange —
    the iterative reader wants uniform, core-saturating partitions either
    way.  The exact DECIMAL(38,6) gradient sums are order-independent, so
    repartitioning cannot move the trained coefficients."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_quantity").isNotNull()
            & F.col("l_discount").isNotNull()
            & F.col("l_extendedprice").isNotNull()
        )
        .selectExpr(f"{_GD_X1} AS x1", f"{_GD_X2} AS x2", f"{_GD_Y} AS y")
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )


def _fit_gd(li: DataFrame) -> tuple[float, float, float]:
    """Run the fixed 6-step GD loop over the persisted observation frame,
    holding the 3-double model state on the driver (see
    logreg_gradient_descent's docstring for the traffic argument)."""
    b = (0.0, 0.0, 0.0)
    for _ in range(_GD_ITERS):
        g = (
            li.withColumn("b0", F.lit(b[0]))
            .withColumn("b1", F.lit(b[1]))
            .withColumn("b2", F.lit(b[2]))
            .agg(*[F.expr(e) for e in _split_agg_exprs(_GD_GRAD)])
            .first()
        )
        if not g.n or g.g0 is None:
            # Zero observations: SUM(...) over an empty frame is NULL and
            # COUNT(*) is 0 — there is no gradient, so β stays put and the
            # caller's final aggregate returns the correct empty-input row.
            break
        b = (
            b[0] - (2.0 * (g.g0 / g.n)),
            b[1] - (2.0 * (g.g1 / g.n)),
            b[2] - (2.0 * (g.g2 / g.n)),
        )
    return b


@register("logreg_gradient_descent", oracle=_logreg_oracle())
def logreg_gradient_descent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear classifier trained by 6 full-batch gradient-descent steps
    (fast-sigmoid link, lr=2.0) predicting high-value line items
    (extendedprice > 36000) from scaled quantity/discount — iterative ML
    training as ONE declarative DAG, hash-checked against a fixed-unroll
    DuckDB oracle.

    How iterative optimization runs at 100 TB: model state is a 1-row
    broadcast frame (3 doubles), each step is one map-side-combined
    aggregate over the observations producing a 4-double gradient row —
    per-step shuffle traffic is CONSTANT, independent of data size, and the
    driver sees only the model state (3 doubles per step), never the data.
    The observation frame is persisted once and re-scanned per step — GD is
    inherently multi-pass.

    Cross-engine exactness (see the _GD_* block comment): algebraic link
    (no libm), pinned association order, and fixed-point DECIMAL(38,6)
    gradient accumulation make every βᵢ bit-identical in Spark and DuckDB —
    which is what lets an ITERATIVE training loop be oracle-hash-checked at
    all.  On this fixture price⊥quantity (corr≈0.003), so training
    converges toward the base-rate intercept; the operator's claim is the
    machinery, not the model."""
    li = _gd_obs(spark, sf_dir)
    # Model state lives on the driver as THREE floats — the shape every
    # distributed ML framework uses (data-parallel gradients, driver-held
    # parameters).  Each step is one map-side-combined aggregate returning a
    # 4-double row; F.lit round-trips the doubles bit-exactly into the next
    # step's plan.  (The all-DAG alternative — beta as a 1-row broadcast
    # frame chained through localCheckpoint — was measured at ~1.6 s/step of
    # pure broadcast/checkpoint job overhead vs 0.04 s for the aggregate
    # itself; per-step driver traffic is identical: 3 doubles.)
    b = _fit_gd(li)
    return (
        li.withColumn("b0", F.lit(b[0]))
        .withColumn("b1", F.lit(b[1]))
        .withColumn("b2", F.lit(b[2]))
        .agg(
            F.expr("COUNT(*) AS n_obs"),
            F.expr(f"CAST(SUM({_GD_CORRECT}) AS DOUBLE) / COUNT(*) AS acc"),
        )
        .selectExpr(
            "n_obs",
            f"ROUND({b[0]!r}D, 6) AS b0",
            f"ROUND({b[1]!r}D, 6) AS b1",
            f"ROUND({b[2]!r}D, 6) AS b2",
            "ROUND(acc, 6) AS train_accuracy",
        )
    )


# Weighted Gini impurity of a binary split, spelled with explicit multiplies
# (no POWER()) so Spark and DuckDB evaluate the identical IEEE expression
# over identical integer counts — the argmin rank can then use the raw
# doubles with no boundary lottery.
_STUMP_GINI = (
    "(nl * (1.0 - (CAST(posl AS DOUBLE)/nl) * (CAST(posl AS DOUBLE)/nl)"
    "            - (CAST(nl - posl AS DOUBLE)/nl) * (CAST(nl - posl AS DOUBLE)/nl))"
    " + nr * (1.0 - (CAST(posr AS DOUBLE)/nr) * (CAST(posr AS DOUBLE)/nr)"
    "             - (CAST(nr - posr AS DOUBLE)/nr) * (CAST(nr - posr AS DOUBLE)/nr))"
    ") / CAST(nl + nr AS DOUBLE)"
)


@register(
    "decision_stump_train",
    oracle=f"""
    WITH obs AS (
        SELECT CAST(l_quantity AS DOUBLE) AS quantity,
               CAST(l_discount AS DOUBLE) AS discount,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
              AND l_returnflag IS NOT NULL
    ),
    long AS (
        SELECT 'quantity' AS feature, quantity AS v, y FROM obs
        UNION ALL
        SELECT 'discount' AS feature, discount AS v, y FROM obs
    ),
    hist AS (
        SELECT feature, v, COUNT(*) AS n, SUM(y) AS pos
        FROM long GROUP BY feature, v
    ),
    cum AS (
        SELECT feature, v,
               SUM(n)   OVER (PARTITION BY feature ORDER BY v) AS nl,
               SUM(pos) OVER (PARTITION BY feature ORDER BY v) AS posl,
               SUM(n)   OVER (PARTITION BY feature) AS n_tot,
               SUM(pos) OVER (PARTITION BY feature) AS pos_tot
        FROM hist
    ),
    splits AS (
        SELECT feature, v AS threshold,
               nl, n_tot - nl AS nr, posl, pos_tot - posl AS posr
        FROM cum WHERE n_tot - nl > 0
    ),
    scored AS (
        SELECT feature, threshold, nl AS n_left, nr AS n_right,
               {_STUMP_GINI} AS gini
        FROM splits
    ),
    best AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY gini ASC, feature ASC, threshold ASC) AS rk
        FROM scored
    )
    SELECT feature, threshold, ROUND(gini, 6) AS gini,
           CAST(n_left AS BIGINT) AS n_left, CAST(n_right AS BIGINT) AS n_right
    FROM best WHERE rk = 1
    """,
)
def decision_stump_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a decision stump (the root split of a decision tree) predicting
    returned line items (l_returnflag = 'R') over two numeric features:
    exact optimal (feature, threshold) by weighted Gini impurity.

    The scalable formulation is the point: instead of scoring each of the
    N × V candidate splits against the observations (the naive quadratic),
    the observations collapse to a per-(feature, value) HISTOGRAM (one
    map-side-combined shuffle, ≤ V rows per feature), and every split's
    left/right class counts come from a cumulative-sum WINDOW over the
    ordered histogram — O(V) split scoring after one linear pass, the same
    histogram trick distributed GBDT frameworks use for split finding.
    The final argmin is a 1-row TakeOrdered.  Gini is computed with
    explicit multiplies over identical integer counts in both engines, so
    the raw-double ranking is engine-stable; ties break (feature ASC,
    threshold ASC)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").isNotNull()
        & F.col("l_discount").isNotNull()
        & F.col("l_returnflag").isNotNull()
    )
    obs = li.select(
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_discount").cast("double").alias("discount"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    long = obs.selectExpr("'quantity' AS feature", "quantity AS v", "y").unionAll(
        obs.selectExpr("'discount' AS feature", "discount AS v", "y")
    )
    hist = long.groupBy("feature", "v").agg(
        F.count("*").alias("n"), F.sum("y").alias("pos")
    )
    w_cum = Window.partitionBy("feature").orderBy("v")
    w_all = Window.partitionBy("feature")
    cum = hist.select(
        "feature",
        "v",
        F.sum("n").over(w_cum).alias("nl"),
        F.sum("pos").over(w_cum).alias("posl"),
        F.sum("n").over(w_all).alias("n_tot"),
        F.sum("pos").over(w_all).alias("pos_tot"),
    )
    splits = cum.filter(F.col("n_tot") - F.col("nl") > 0).select(
        "feature",
        F.col("v").alias("threshold"),
        "nl",
        (F.col("n_tot") - F.col("nl")).alias("nr"),
        "posl",
        (F.col("pos_tot") - F.col("posl")).alias("posr"),
    )
    scored = splits.selectExpr(
        "feature", "threshold", "nl AS n_left", "nr AS n_right", f"{_STUMP_GINI} AS gini"
    )
    w_best = Window.orderBy(F.asc("gini"), F.asc("feature"), F.asc("threshold"))
    return (
        scored.withColumn("rk", F.row_number().over(w_best))
        .filter(F.col("rk") == 1)
        .select(
            "feature",
            "threshold",
            F.round("gini", 6).alias("gini"),
            F.col("n_left").cast("bigint").alias("n_left"),
            F.col("n_right").cast("bigint").alias("n_right"),
        )
    )


# --- Calibration of the GD-trained classifier --------------------------------
#
# Expected-calibration-error readout (Guo et al. 2017 §2) for the trained
# linear classifier: confidence = max(p, 1-p) from the algebraic
# fast-sigmoid (NO libm — the whole scoring path is +,*,/,abs, so both
# engines compute bit-identical doubles), 10 equal-width confidence bins,
# per-bin mean confidence vs empirical accuracy, and the n-weighted ECE as
# a summary row.  Mean confidence is accumulated exactly: each row's
# confidence is rounded to 9 places then cast DECIMAL(38,9) (the money
# trick), so the per-bin sums are order- and engine-independent.
_CAL_CONF = f"(CASE WHEN {_GD_Z} >= 0.0 THEN {_GD_P} ELSE (1.0 - {_GD_P}) END)"


def _cal_oracle() -> str:
    parts = [
        f"""
    WITH obs AS (
        SELECT {_GD_X1} AS x1, {_GD_X2} AS x2, {_GD_Y} AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
          AND l_extendedprice IS NOT NULL
    ),
    it0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2)
    """
    ]
    for i in range(1, _GD_ITERS + 1):
        parts.append(
            f""",
    gr{i} AS (SELECT {_GD_GRAD} FROM obs, it{i - 1}),
    it{i} AS (SELECT {", ".join(_GD_STEP)} FROM it{i - 1}, gr{i})"""
        )
    parts.append(
        f""",
    sc AS (
        SELECT {_CAL_CONF} AS conf, {_GD_CORRECT} AS corr
        FROM obs, it{_GD_ITERS}
    ),
    binned AS (
        SELECT LEAST(CAST(FLOOR(conf * 10.0) AS BIGINT), 9) AS bin, conf, corr
        FROM sc
    ),
    perbin AS (
        SELECT bin, COUNT(*) AS n_obs,
               SUM(CAST(ROUND(conf, 9) AS DECIMAL(38,9))) AS sconf,
               SUM(corr) AS ncorr
        FROM binned GROUP BY bin
    ),
    vals AS (
        SELECT bin, n_obs,
               CAST(sconf AS DOUBLE) / n_obs AS conf_raw,
               CAST(ncorr AS DOUBLE) / n_obs AS acc_raw
        FROM perbin
    )
    SELECT bin, n_obs,
           ROUND(conf_raw, 6) AS avg_conf,
           ROUND(acc_raw, 6) AS accuracy,
           ROUND(ABS(conf_raw - acc_raw), 6) AS abs_gap
    FROM vals
    UNION ALL
    SELECT CAST(-1 AS BIGINT) AS bin,
           CAST(SUM(n_obs) AS BIGINT) AS n_obs,
           CAST(NULL AS DOUBLE) AS avg_conf,
           CAST(NULL AS DOUBLE) AS accuracy,
           ROUND(CAST(SUM(CAST(ROUND(ABS(conf_raw - acc_raw), 9)
                               AS DECIMAL(18,9))
                          * CAST(n_obs AS DECIMAL(19,0))) AS DOUBLE)
                 / SUM(n_obs), 6) AS abs_gap
    FROM vals
    """
    )
    return "".join(parts)


@register("logreg_calibration_bins", oracle=_cal_oracle())
def logreg_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration curve + expected calibration error (ECE) for the
    GD-trained linear classifier — the model-evaluation pass a training
    pipeline runs after fitting: does predicted confidence match empirical
    accuracy?  Ten equal-width confidence bins, each row carrying bin
    population, mean confidence, accuracy, and |gap|; the bin = -1 summary
    row carries the n-weighted ECE.

    Shape at 100 TB: training is the same constant-traffic 6-pass GD
    (model state = 3 doubles on the driver); the calibration pass is ONE
    map-side-combined aggregate over the scored observations (10 groups),
    so the whole readout adds a single linear scan.  The scoring link is
    algebraic (fast sigmoid), so confidences are bit-identical across
    engines; per-bin confidence mass accumulates as exact DECIMAL(38,9)."""
    li = _gd_obs(spark, sf_dir)
    b = _fit_gd(li)
    sc = (
        li.withColumn("b0", F.lit(b[0]))
        .withColumn("b1", F.lit(b[1]))
        .withColumn("b2", F.lit(b[2]))
        .selectExpr(f"{_CAL_CONF} AS conf", f"{_GD_CORRECT} AS corr")
    )
    binned = sc.selectExpr(
        "LEAST(CAST(FLOOR(conf * 10.0) AS BIGINT), 9) AS bin", "conf", "corr"
    )
    perbin = binned.groupBy("bin").agg(
        F.count("*").alias("n_obs"),
        F.sum(F.expr("CAST(ROUND(conf, 9) AS DECIMAL(38,9))")).alias("sconf"),
        F.sum("corr").alias("ncorr"),
    )
    vals = perbin.selectExpr(
        "bin",
        "n_obs",
        "CAST(sconf AS DOUBLE) / n_obs AS conf_raw",
        "CAST(ncorr AS DOUBLE) / n_obs AS acc_raw",
    )
    bins_out = vals.selectExpr(
        "bin",
        "n_obs",
        "ROUND(conf_raw, 6) AS avg_conf",
        "ROUND(acc_raw, 6) AS accuracy",
        "ROUND(ABS(conf_raw - acc_raw), 6) AS abs_gap",
    )
    summary = vals.agg(
        F.expr("SUM(n_obs) AS tot"),
        F.expr(
            "SUM(CAST(ROUND(ABS(conf_raw - acc_raw), 9) AS DECIMAL(18,9))"
            " * CAST(n_obs AS DECIMAL(19,0))) AS gsum"
        ),
    ).selectExpr(
        "CAST(-1 AS BIGINT) AS bin",
        "tot AS n_obs",
        "CAST(NULL AS DOUBLE) AS avg_conf",
        "CAST(NULL AS DOUBLE) AS accuracy",
        "ROUND(CAST(gsum AS DOUBLE) / tot, 6) AS abs_gap",
    )
    return bins_out.unionByName(summary)


# --- Rank-based evaluation of the GD-trained classifier ----------------------
#
# Both readouts below group the scored observations by their raw score first
# (score = the algebraic fast-sigmoid link, bit-identical across engines
# because it is +,*,/,abs only), so every downstream count is an exact
# integer and the final metric is ONE float division — the same
# exact-integers-then-one-division recipe as graph_link_prediction.

_GD_OBS_SQL = f"""
    SELECT {_GD_X1} AS x1, {_GD_X2} AS x2, {_GD_Y} AS y
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
      AND l_extendedprice IS NOT NULL
"""


def _gd_iter_prefix() -> str:
    """The shared obs + 6 unrolled GD iteration CTEs (it0..it6)."""
    parts = [f"WITH obs AS ({_GD_OBS_SQL}),\n    it0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2)"]
    for i in range(1, _GD_ITERS + 1):
        parts.append(
            f""",
    gr{i} AS (SELECT {_GD_GRAD} FROM obs, it{i - 1}),
    it{i} AS (SELECT {", ".join(_GD_STEP)} FROM it{i - 1}, gr{i})"""
        )
    return "".join(parts)


def _auc_oracle() -> str:
    return f"""
    {_gd_iter_prefix()},
    sc AS (SELECT {_GD_Z} AS z, y FROM obs, it{_GD_ITERS}),
    grp AS (
        SELECT z,
               SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS pos,
               SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS neg
        FROM sc GROUP BY z
    ),
    cum AS (
        SELECT pos, neg,
               COALESCE(SUM(neg) OVER (ORDER BY z
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS neg_below
        FROM grp
    )
    SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(neg) AS BIGINT) AS n_neg,
           ROUND(CAST(SUM(pos * (2 * neg_below + neg)) AS DOUBLE)
                 / (2.0 * SUM(pos) * SUM(neg)), 6) AS auc,
           ROUND(CAST(SUM(pos * (2 * neg_below + neg)) AS DOUBLE)
                 / (CAST(SUM(pos) AS DOUBLE) * SUM(neg)) - 1.0, 6) AS gini
    FROM cum
    """


@register("logreg_roc_auc", oracle=_auc_oracle())
def logreg_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the GD-trained classifier by the Mann-Whitney rank
    statistic: AUC = P(score_pos > score_neg) + P(tie)/2, computed from
    per-distinct-score positive/negative counts — never from all pairs.
    Doubling the tie term keeps the numerator an exact integer:
    2·U = Σ_groups pos·(2·neg_below + neg), so AUC = 2U / (2·n_pos·n_neg)
    is exact integers into one float division, hash-checked cross-engine.
    Gini = 2·AUC - 1 rides along.

    Shape at 100 TB: one map-side-combined groupBy on the raw score (the
    feature domain bounds distinct scores — l_quantity × l_discount give
    ≤ 550 groups), one ordered prefix-sum over those groups, one global
    aggregate.  The sort is over score GROUPS, not rows — the classic
    trick that makes AUC a two-pass distributed computation (training is
    the same constant-traffic 6-pass GD as logreg_gradient_descent)."""
    from pyspark.sql import Window

    li = _gd_obs(spark, sf_dir)
    b = _fit_gd(li)
    sc = (
        li.withColumn("b0", F.lit(b[0]))
        .withColumn("b1", F.lit(b[1]))
        .withColumn("b2", F.lit(b[2]))
        .selectExpr(f"{_GD_Z} AS z", "y")
    )
    grp = sc.groupBy("z").agg(
        F.expr("SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END)").alias("pos"),
        F.expr("SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END)").alias("neg"),
    )
    w = Window.orderBy("z").rowsBetween(Window.unboundedPreceding, -1)
    cum = grp.select(
        "pos", "neg", F.coalesce(F.sum("neg").over(w), F.lit(0)).alias("neg_below")
    )
    return cum.agg(
        F.expr("CAST(SUM(pos) AS BIGINT)").alias("n_pos"),
        F.expr("CAST(SUM(neg) AS BIGINT)").alias("n_neg"),
        F.expr(
            "ROUND(CAST(SUM(pos * (2 * neg_below + neg)) AS DOUBLE)"
            " / (2.0 * SUM(pos) * SUM(neg)), 6)"
        ).alias("auc"),
        F.expr(
            "ROUND(CAST(SUM(pos * (2 * neg_below + neg)) AS DOUBLE)"
            " / (CAST(SUM(pos) AS DOUBLE) * SUM(neg)) - 1.0, 6)"
        ).alias("gini"),
    )


_SWEEP_THRESHOLDS = "0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9"


def _sweep_oracle() -> str:
    values = ", ".join(f"({t})" for t in _SWEEP_THRESHOLDS.split(", "))
    return f"""
    {_gd_iter_prefix()},
    sc AS (SELECT {_GD_P} AS p, y FROM obs, it{_GD_ITERS}),
    grp AS (
        SELECT p,
               SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS pos,
               SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS neg
        FROM sc GROUP BY p
    ),
    th AS (SELECT * FROM (VALUES {values}) t(thr)),
    cm AS (
        SELECT thr,
               SUM(CASE WHEN p >= thr THEN pos ELSE 0 END) AS tp,
               SUM(CASE WHEN p >= thr THEN neg ELSE 0 END) AS fp,
               SUM(CASE WHEN p < thr THEN pos ELSE 0 END) AS fn,
               SUM(CASE WHEN p < thr THEN neg ELSE 0 END) AS tn
        FROM th, grp GROUP BY thr
    )
    SELECT CAST(thr AS DOUBLE) AS threshold,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           CASE WHEN tp + fp > 0
                THEN ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS prec,
           CASE WHEN tp + fn > 0
                THEN ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS rec,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN ROUND(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6)
                END AS f1
    FROM cm
    """


@register("logreg_threshold_sweep", oracle=_sweep_oracle())
def logreg_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision / recall / F1 of the GD-trained classifier at nine decision
    thresholds — the operating-point sweep a training pipeline runs to pick
    a deployment threshold.  Confusion counts are exact integers derived
    from per-distinct-score class counts; each metric is one float
    division, so all nine rows hash-match the oracle.

    Shape at 100 TB: ONE linear aggregation pass builds the per-score
    histogram (≤ 550 groups — the feature domain bounds it); the nine
    thresholds then fan out via explode over that tiny grouped frame, so
    threshold count scales the small side, never the scan.  No join, no
    BNLJ: the sweep is explode + re-aggregate.

    r9: the ``threshold`` OUTPUT column is cast to DOUBLE on both sides
    (it was a bare decimal literal — DECIMAL(2,1), the dtype pair the r8
    verdict proved hash-hazardous; this query stayed driver-green only
    because small decimals happen to render identically, and the fleet
    output-type lint now forbids the pattern outright).  The threshold
    COMPARISONS are untouched, so every count is unchanged."""
    li = _gd_obs(spark, sf_dir)
    b = _fit_gd(li)
    sc = (
        li.withColumn("b0", F.lit(b[0]))
        .withColumn("b1", F.lit(b[1]))
        .withColumn("b2", F.lit(b[2]))
        .selectExpr(f"{_GD_P} AS p", "y")
    )
    grp = sc.groupBy("p").agg(
        F.expr("SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END)").alias("pos"),
        F.expr("SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END)").alias("neg"),
    )
    ex = grp.select(
        F.explode(F.expr(f"array({_SWEEP_THRESHOLDS})")).alias("thr"),
        "p",
        "pos",
        "neg",
    )
    cm = ex.groupBy("thr").agg(
        F.expr("SUM(CASE WHEN p >= thr THEN pos ELSE 0 END)").alias("tp"),
        F.expr("SUM(CASE WHEN p >= thr THEN neg ELSE 0 END)").alias("fp"),
        F.expr("SUM(CASE WHEN p < thr THEN pos ELSE 0 END)").alias("fn"),
        F.expr("SUM(CASE WHEN p < thr THEN neg ELSE 0 END)").alias("tn"),
    )
    return cm.selectExpr(
        "CAST(thr AS DOUBLE) AS threshold",
        "CAST(tp AS BIGINT) AS tp",
        "CAST(fp AS BIGINT) AS fp",
        "CAST(fn AS BIGINT) AS fn",
        "CAST(tn AS BIGINT) AS tn",
        "CASE WHEN tp + fp > 0 THEN ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS prec",
        "CASE WHEN tp + fn > 0 THEN ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS rec",
        "CASE WHEN 2 * tp + fp + fn > 0"
        " THEN ROUND(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6) END AS f1",
    )


# --- K-fold cross-validated simple OLS ---------------------------------------
#
# Fold assignment is the portable md5 hash used by target_encode_kfold; the
# per-fold TRAIN sufficient statistics are derived as (global − own fold),
# so the whole 5-fold fit is ONE aggregation pass + exact decimal algebra.
_CV_FOLD = (  # DuckDB spelling ('0x..' cast); the Spark side uses conv()
    "CAST(CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||"
    " CAST(l_linenumber AS VARCHAR)), 1, 8) AS BIGINT) % 5 AS BIGINT)"
)
_CV_FOLD_SPARK = (
    "CAST(CAST(conv(substr(md5(CAST(l_orderkey AS STRING) || '-' ||"
    " CAST(l_linenumber AS STRING)), 1, 8), 16, 10) AS BIGINT) % 5 AS BIGINT)"
)
_CV_BETA = (
    "(((CAST(ntr AS DOUBLE) * CAST(sxytr AS DOUBLE))"
    " - (CAST(sxtr AS DOUBLE) * CAST(sytr AS DOUBLE)))"
    " / ((CAST(ntr AS DOUBLE) * CAST(sxxtr AS DOUBLE))"
    " - (CAST(sxtr AS DOUBLE) * CAST(sxtr AS DOUBLE))))"
)
_CV_ALPHA = (
    "((CAST(sytr AS DOUBLE) - (beta * CAST(sxtr AS DOUBLE)))"
    " / CAST(ntr AS DOUBLE))"
)
_CV_RESID = "(CAST(y AS DOUBLE) - (alpha + (beta * CAST(x AS DOUBLE))))"


@register(
    "ols_kfold_cv",
    oracle=f"""
    WITH obs AS (
        SELECT {_CV_FOLD} AS fold,
               CAST(l_quantity AS DECIMAL(12,6)) AS x,
               CAST(l_extendedprice AS DECIMAL(24,6)) AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    per AS (
        SELECT fold, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx,
               SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy
        FROM obs GROUP BY fold
    ),
    train AS (
        SELECT fold, n,
               SUM(n) OVER () - n AS ntr,
               SUM(sx) OVER () - sx AS sxtr,
               SUM(sy) OVER () - sy AS sytr,
               SUM(sxx) OVER () - sxx AS sxxtr,
               SUM(sxy) OVER () - sxy AS sxytr
        FROM per
    ),
    coef0 AS (SELECT fold, n, ntr, sxtr, sytr, {_CV_BETA} AS beta FROM train),
    coef AS (SELECT fold, n, ntr, beta, {_CV_ALPHA} AS alpha FROM coef0),
    resid AS (
        SELECT o.fold,
               CAST(ROUND({_CV_RESID} * {_CV_RESID}, 6) AS DECIMAL(38,6)) AS r2
        FROM obs o JOIN coef ON coef.fold = o.fold
    ),
    rss AS (SELECT fold, SUM(r2) AS ssr FROM resid GROUP BY fold)
    SELECT c.fold,
           CAST(c.ntr AS BIGINT) AS n_train,
           CAST(c.n AS BIGINT) AS n_test,
           ROUND(c.beta, 6) AS beta,
           ROUND(c.alpha, 6) AS alpha,
           ROUND(sqrt(CAST(r.ssr AS DOUBLE) / c.n), 6) AS rmse
    FROM coef c JOIN rss r ON r.fold = c.fold
    """,
)
def ols_kfold_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validated simple OLS (extendedprice ~ quantity): each
    fold's model is fitted on the OTHER four folds via sufficient
    statistics and scored on the held-out fold — the leakage-controlled
    evaluation loop every training pipeline runs, expressed as two linear
    passes (no per-fold refit scans).

    Train statistics come free from ONE aggregation: per-fold sums are
    exact DECIMALs and train_i = global − fold_i, so β/α are closed-form
    floats over exact operands (bit-identical cross-engine; pinned
    association order).  Held-out residual energy is quantized per row
    (ROUND 6 → DECIMAL(38,6)) so the per-fold RSS is exact and
    order-independent; RMSE's sqrt is IEEE-exact.

    Shape at 100 TB: pass 1 is a 5-group map-side-combined aggregate;
    pass 2 joins each row to its fold's 5-row coefficient frame
    (broadcast) and re-aggregates — two scans total, constant model
    state, no iteration."""
    from pyspark.sql import Window

    obs = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull())
        .selectExpr(
            f"{_CV_FOLD_SPARK} AS fold",
            "CAST(l_quantity AS DECIMAL(12,6)) AS x",
            "CAST(l_extendedprice AS DECIMAL(24,6)) AS y",
        )
        .persist()
    )
    per = obs.groupBy("fold").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("CAST(x * x AS DECIMAL(38,12))")).alias("sxx"),
        F.sum(F.expr("CAST(x * y AS DECIMAL(38,12))")).alias("sxy"),
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    train = per.select(
        "fold",
        "n",
        (F.sum("n").over(w_all) - F.col("n")).alias("ntr"),
        (F.sum("sx").over(w_all) - F.col("sx")).alias("sxtr"),
        (F.sum("sy").over(w_all) - F.col("sy")).alias("sytr"),
        (F.sum("sxx").over(w_all) - F.col("sxx")).alias("sxxtr"),
        (F.sum("sxy").over(w_all) - F.col("sxy")).alias("sxytr"),
    )
    coef = train.selectExpr(
        "fold", "n", "ntr", "sxtr", "sytr", f"{_CV_BETA} AS beta"
    ).selectExpr("fold", "n", "ntr", "beta", f"{_CV_ALPHA} AS alpha")
    resid = obs.join(F.broadcast(coef), "fold").selectExpr(
        "fold", f"CAST(ROUND({_CV_RESID} * {_CV_RESID}, 6) AS DECIMAL(38,6)) AS r2"
    )
    rss = resid.groupBy("fold").agg(F.sum("r2").alias("ssr"))
    return coef.join(rss, "fold").selectExpr(
        "fold",
        "CAST(ntr AS BIGINT) AS n_train",
        "CAST(n AS BIGINT) AS n_test",
        "ROUND(beta, 6) AS beta",
        "ROUND(alpha, 6) AS alpha",
        "ROUND(sqrt(CAST(ssr AS DOUBLE) / n), 6) AS rmse",
    )


# --- Rank / location two-sample tests ----------------------------------------
#
# Classical nonparametric + parametric two-sample tests over order totals,
# BUILDING vs MACHINERY market segments.  Both are expressed so the heavy
# math runs over DISTINCT VALUES (Mann-Whitney) or exact sufficient
# statistics (Welch), never a global per-row sort — the 100 TB-safe
# formulation.  Shared expression strings keep the final float algebra
# bit-identical across engines (same trick as _CV_BETA above).


def _banded_cum(pv, value_col: str, cols: tuple[str, ...], band_width: float):
    """Cumulative sums over a distinct-value grid WITHOUT a global
    single-partition window (VERDICT r7 "wrong" #4): fixed-width value
    bands split the cumulative into (a) within-band running sums under
    ``Window.partitionBy(band)`` — distributed across executors — plus
    (b) prior-band offsets from a cumulative window over the band-TOTAL
    frame, whose cardinality is value_range / band_width: bounded by the
    value DOMAIN, constant in row count, at any scale.  The two-level sum
    is bit-identical to the single global window (integer counts, same
    total order), so the SQL oracles are untouched.

    Returns ``pv`` with one ``cum_<col>`` column per input col (the
    inclusive running total in global ``value_col`` order)."""
    from pyspark.sql import Window

    # Persisted: the banded grid feeds BOTH the band-total/offset aggregate
    # and the within-band windows — without reuse the whole upstream plan
    # (scans + joins) is evaluated twice (no cross-DAG subplan dedup in
    # Spark; same finding as operators/dedup.py).  The grid is the distinct-
    # value frame, already the provably small side.
    pvb = pv.withColumn(
        "_band", F.floor(F.col(value_col) / F.lit(band_width))
    ).persist()
    w_in = Window.partitionBy("_band").orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_off = Window.orderBy("_band").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        pvb.groupBy("_band")
        .agg(*[F.sum(c).alias(f"_bt_{c}") for c in cols])
        .select(
            "_band",
            *[
                F.coalesce(F.sum(f"_bt_{c}").over(w_off), F.lit(0)).alias(f"_off_{c}")
                for c in cols
            ],
        )
    )
    orig = list(pv.columns)
    within = pvb.select(
        *orig, "_band", *[F.sum(c).over(w_in).alias(f"_in_{c}") for c in cols]
    )
    out = within.join(F.broadcast(offsets), "_band")
    return out.select(
        *orig,
        *[(F.col(f"_in_{c}") + F.col(f"_off_{c}")).alias(f"cum_{c}") for c in cols],
    )


_MW_U1 = "(r1 - ((n1 * (n1 + 1.0)) / 2.0))"
_MW_N2 = "(n - n1)"
_MW_SIGMA = (
    f"sqrt((((n1 * {_MW_N2}) / 12.0)"
    f" * ((n + 1.0) - (tiesum / NULLIF(n * (n - 1.0), 0.0)))))"
)
_MW_Z = (
    f"(({_MW_U1} - ((n1 * {_MW_N2}) / 2.0)) / NULLIF({_MW_SIGMA}, 0.0))"
)


@register(
    "stat_mannwhitney_u",
    oracle=f"""
    WITH obs AS (
        SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 0 ELSE 1 END AS grp,
               o_totalprice AS v
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
          AND o_totalprice IS NOT NULL
    ),
    pv AS (
        SELECT v, COUNT(*) AS t,
               SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS t1
        FROM obs GROUP BY v
    ),
    rk AS (
        SELECT t, t1,
               (CAST(SUM(t) OVER (ORDER BY v
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS DOUBLE)
                - t) + ((t + 1.0) / 2.0) AS r
        FROM pv
    ),
    s AS (
        SELECT CAST(SUM(t1) AS DOUBLE) AS n1,
               CAST(SUM(t) AS DOUBLE) AS n,
               CAST(SUM(CAST(t1 * r AS DECIMAL(38,1))) AS DOUBLE) AS r1,
               CAST(SUM(t * t * t - t) AS DOUBLE) AS tiesum
        FROM rk
    )
    SELECT CAST(n1 AS BIGINT) AS n_building,
           CAST({_MW_N2} AS BIGINT) AS n_machinery,
           ROUND(r1, 1) AS rank_sum_building,
           ROUND({_MW_U1}, 1) AS u_building,
           ROUND(((n1 * {_MW_N2}) - {_MW_U1}), 1) AS u_machinery,
           ROUND({_MW_Z}, 6) AS z_score
    FROM s
    """,
)
def stat_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test: do BUILDING and MACHINERY
    customers draw order totals from the same distribution?  Average ranks
    with the standard tie correction; z is the normal approximation
    (no continuity correction, documented).

    The rank pass is the DISTRIBUTED formulation: ranks depend only on the
    value, so the engine aggregates per DISTINCT value first (map-side
    combined) and runs the one cumulative window over the distinct-value
    frame — bounded by price-grid cardinality, not row count.  Rank sums
    are exact for n below ~9e7 rows per group (average ranks are halves;
    the t1·r products ride IEEE doubles before the DECIMAL(38,1) cast, so
    exactness holds while every product stays under 2^53 — ADVICE r5);
    past that, promote t1 and the doubled rank (2r, an integer) to DECIMAL
    before the multiply and divide the doubled sum once at the end.  The z
    algebra is a shared expression string, bit-identical cross-engine.

    At 100 TB the cumulative never sees a single-partition frame (r8,
    VERDICT r7 "wrong" #4): ``_banded_cum`` runs it as within-band windows
    partitioned by fixed-width value band plus a prior-band offset join —
    the unpartitioned window touches only the band-total frame, whose
    cardinality is bounded by the value DOMAIN (price range / 10k), not by
    row count, even on a truly continuous column."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    obs = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            & F.col("o_totalprice").isNotNull()
        )
        .selectExpr(
            "CASE WHEN c_mktsegment = 'BUILDING' THEN 0 ELSE 1 END AS grp",
            "o_totalprice AS v",
        )
    )
    pv = obs.groupBy("v").agg(
        F.count("*").alias("t"),
        F.sum(F.expr("CASE WHEN grp = 0 THEN 1 ELSE 0 END")).alias("t1"),
    )
    # banded two-level cumulative (r8): same running totals as the former
    # global Window.orderBy("v"), never a single-partition frame
    rk = _banded_cum(pv, "v", ("t",), band_width=10000.0).select(
        "t",
        "t1",
        (
            (F.col("cum_t").cast("double") - F.col("t"))
            + (F.col("t") + F.lit(1.0)) / F.lit(2.0)
        ).alias("r"),
    )
    s = rk.agg(
        F.sum("t1").cast("double").alias("n1"),
        F.sum("t").cast("double").alias("n"),
        F.sum(F.expr("CAST(t1 * r AS DECIMAL(38,1))")).cast("double").alias("r1"),
        F.sum(F.expr("t * t * t - t")).cast("double").alias("tiesum"),
    )
    return s.selectExpr(
        "CAST(n1 AS BIGINT) AS n_building",
        f"CAST({_MW_N2} AS BIGINT) AS n_machinery",
        "ROUND(r1, 1) AS rank_sum_building",
        f"ROUND({_MW_U1}, 1) AS u_building",
        f"ROUND(((n1 * {_MW_N2}) - {_MW_U1}), 1) AS u_machinery",
        f"ROUND({_MW_Z}, 6) AS z_score",
    )


# Welch's t: the shared float algebra over the pivoted sufficient statistics.
_WT_M1 = "(sx1 / n1)"
_WT_M2 = "(sx2 / n2)"
_WT_V1 = "((sxx1 - ((sx1 * sx1) / n1)) / (n1 - 1.0))"
_WT_V2 = "((sxx2 - ((sx2 * sx2) / n2)) / (n2 - 1.0))"
_WT_SE1 = f"({_WT_V1} / n1)"
_WT_SE2 = f"({_WT_V2} / n2)"
_WT_T = f"(({_WT_M1} - {_WT_M2}) / NULLIF(sqrt({_WT_SE1} + {_WT_SE2}), 0.0))"
_WT_DF = (
    f"((({_WT_SE1} + {_WT_SE2}) * ({_WT_SE1} + {_WT_SE2}))"
    f" / NULLIF((({_WT_SE1} * {_WT_SE1}) / (n1 - 1.0))"
    f" + (({_WT_SE2} * {_WT_SE2}) / (n2 - 1.0)), 0.0))"
)


@register(
    "stat_welch_ttest",
    oracle=f"""
    WITH obs AS (
        SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 0 ELSE 1 END AS grp,
               o_totalprice AS v
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
          AND o_totalprice IS NOT NULL
    ),
    per AS (
        SELECT grp, CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(v AS DECIMAL(24,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS sxx
        FROM obs GROUP BY grp
    ),
    piv AS (
        SELECT MAX(CASE WHEN grp = 0 THEN n END) AS n1,
               MAX(CASE WHEN grp = 0 THEN sx END) AS sx1,
               MAX(CASE WHEN grp = 0 THEN sxx END) AS sxx1,
               MAX(CASE WHEN grp = 1 THEN n END) AS n2,
               MAX(CASE WHEN grp = 1 THEN sx END) AS sx2,
               MAX(CASE WHEN grp = 1 THEN sxx END) AS sxx2
        FROM per
    )
    SELECT CAST(n1 AS BIGINT) AS n_building,
           CAST(n2 AS BIGINT) AS n_machinery,
           ROUND({_WT_M1}, 6) AS mean_building,
           ROUND({_WT_M2}, 6) AS mean_machinery,
           ROUND({_WT_T}, 6) AS t_stat,
           ROUND({_WT_DF}, 6) AS welch_df
    FROM piv
    """,
)
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on mean order total, BUILDING vs
    MACHINERY — the parametric partner of `stat_mannwhitney_u`, with the
    Welch-Satterthwaite effective degrees of freedom.

    One map-side-combined aggregation produces exact decimal sufficient
    statistics per group (Σx exact at 2 dp; Σx² rides the same
    cross-engine-identical DECIMAL(38,12) cast as `ols_kfold_cv`); the
    pivot to one row and the t/df algebra are shared expression strings —
    bit-identical across engines, constant driver state.  Scale cost: one
    scan, two groups."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    obs = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            & F.col("o_totalprice").isNotNull()
        )
        .selectExpr(
            "CASE WHEN c_mktsegment = 'BUILDING' THEN 0 ELSE 1 END AS grp",
            "o_totalprice AS v",
        )
    )
    per = obs.groupBy("grp").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.expr("CAST(v AS DECIMAL(24,6))")).cast("double").alias("sx"),
        F.sum(F.expr("CAST(v * v AS DECIMAL(38,12))")).cast("double").alias("sxx"),
    )
    piv = per.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 0, F.col("sx"))).alias("sx1"),
        F.max(F.when(F.col("grp") == 0, F.col("sxx"))).alias("sxx1"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("grp") == 1, F.col("sx"))).alias("sx2"),
        F.max(F.when(F.col("grp") == 1, F.col("sxx"))).alias("sxx2"),
    )
    return piv.selectExpr(
        "CAST(n1 AS BIGINT) AS n_building",
        "CAST(n2 AS BIGINT) AS n_machinery",
        f"ROUND({_WT_M1}, 6) AS mean_building",
        f"ROUND({_WT_M2}, 6) AS mean_machinery",
        f"ROUND({_WT_T}, 6) AS t_stat",
        f"ROUND({_WT_DF}, 6) AS welch_df",
    )


# Spearman: Pearson over average ranks; all rank sums exact decimals.
_SP_RHO = (
    "(((n * srxy) - (srx * sry))"
    " / NULLIF(sqrt((n * sxx) - (srx * srx))"
    " * sqrt((n * syy) - (sry * sry)), 0.0))"
)


@register(
    "stat_spearman_corr",
    oracle=f"""
    WITH obs AS (
        SELECT l_returnflag AS flag, l_quantity AS x, l_extendedprice AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    rx AS (
        SELECT flag, x,
               (CAST(SUM(t) OVER (PARTITION BY flag ORDER BY x
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS DOUBLE)
                - t) + ((t + 1.0) / 2.0) AS rnk
        FROM (SELECT flag, x, COUNT(*) AS t FROM obs GROUP BY flag, x)
    ),
    ry AS (
        SELECT flag, y,
               (CAST(SUM(t) OVER (PARTITION BY flag ORDER BY y
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS DOUBLE)
                - t) + ((t + 1.0) / 2.0) AS rnk
        FROM (SELECT flag, y, COUNT(*) AS t FROM obs GROUP BY flag, y)
    ),
    ranked AS (
        SELECT o.flag, rx.rnk AS rxv, ry.rnk AS ryv
        FROM obs o
        JOIN rx ON rx.flag = o.flag AND rx.x = o.x
        JOIN ry ON ry.flag = o.flag AND ry.y = o.y
    ),
    s AS (
        SELECT flag, CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(rxv AS DECIMAL(38,1))) AS DOUBLE) AS srx,
               CAST(SUM(CAST(ryv AS DECIMAL(38,1))) AS DOUBLE) AS sry,
               CAST(SUM(CAST(ROUND(rxv * ryv, 2) AS DECIMAL(38,2))) AS DOUBLE)
                   AS srxy,
               CAST(SUM(CAST(ROUND(rxv * rxv, 2) AS DECIMAL(38,2))) AS DOUBLE)
                   AS sxx,
               CAST(SUM(CAST(ROUND(ryv * ryv, 2) AS DECIMAL(38,2))) AS DOUBLE)
                   AS syy
        FROM ranked GROUP BY flag
    )
    SELECT flag AS l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           ROUND({_SP_RHO}, 6) AS spearman_rho
    FROM s
    """,
)
def stat_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and extended price, per
    return flag — the monotone-association screen that is robust where
    Pearson (see `stat_corr_matrix`) is distorted by heavy tails.

    Ranks are average ranks computed over DISTINCT (flag, value) pairs
    (tie-correct by construction) and joined back by equi-join — no global
    per-row sort anywhere.  Rank sums and products are exact for n below
    ~9e7 rows per group (halves → DECIMAL(38,1); rank products are
    quarters → ROUND 2 → DECIMAL(38,2), but the r_x·r_y multiply itself
    rides IEEE doubles, exact only while products stay under 2^53 —
    ADVICE r5; past that, carry the doubled ranks as DECIMAL integers and
    divide the summed products by 4 once at the end), so the Pearson
    formula over ranks runs once over exact operands via a shared
    expression string.

    At 100 TB: two distinct-value aggregations (map-side combined), two
    per-group cumulative windows over distinct-value frames, two uniform
    equi-joins back — the quantity rank map is tiny (integer grid) and the
    price map is bounded by the price grid, both far below row count."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    obs = li.filter(
        F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    ).selectExpr("l_returnflag AS flag", "l_quantity AS x", "l_extendedprice AS y")

    def rank_map(col: str) -> DataFrame:
        pv = obs.groupBy("flag", col).agg(F.count("*").alias("t"))
        w_cum = (
            Window.partitionBy("flag")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return pv.select(
            "flag",
            col,
            (
                (F.sum("t").over(w_cum).cast("double") - F.col("t"))
                + (F.col("t") + F.lit(1.0)) / F.lit(2.0)
            ).alias(f"r_{col}"),
        )

    ranked = obs.join(rank_map("x"), ["flag", "x"]).join(rank_map("y"), ["flag", "y"])
    s = ranked.groupBy("flag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.expr("CAST(r_x AS DECIMAL(38,1))")).cast("double").alias("srx"),
        F.sum(F.expr("CAST(r_y AS DECIMAL(38,1))")).cast("double").alias("sry"),
        F.sum(F.expr("CAST(ROUND(r_x * r_y, 2) AS DECIMAL(38,2))"))
        .cast("double")
        .alias("srxy"),
        F.sum(F.expr("CAST(ROUND(r_x * r_x, 2) AS DECIMAL(38,2))"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.expr("CAST(ROUND(r_y * r_y, 2) AS DECIMAL(38,2))"))
        .cast("double")
        .alias("syy"),
    )
    return s.selectExpr(
        "flag AS l_returnflag",
        "CAST(n AS BIGINT) AS n_rows",
        f"ROUND({_SP_RHO}, 6) AS spearman_rho",
    )


# Split-conformal fold hash (orders keyed on o_orderkey alone) and the
# shared residual expression.
_CF_FOLD = (
    "CAST(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)"
    " AS BIGINT) % 5 AS BIGINT)"
)
_CF_FOLD_SPARK = (
    "CAST(CAST(conv(substr(md5(CAST(o_orderkey AS STRING)), 1, 8), 16, 10)"
    " AS BIGINT) % 5 AS BIGINT)"
)
_CF_RESID = "abs(CAST(y AS DOUBLE) - mu)"


@register(
    "conformal_interval_coverage",
    oracle=f"""
    WITH obs AS (
        SELECT {_CF_FOLD} AS fold, o_orderpriority AS prio,
               o_totalprice AS y
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL
    ),
    mu AS (
        SELECT prio,
               CAST(SUM(CAST(y AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*) AS mu
        FROM obs WHERE fold <= 2 GROUP BY prio
    ),
    cal AS (
        SELECT {_CF_RESID} AS r
        FROM obs JOIN mu USING (prio) WHERE fold = 3
    ),
    ranked AS (
        SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rn, COUNT(*) OVER () AS n
        FROM cal
    ),
    qhat AS (
        SELECT MAX(r) AS q
        FROM ranked
        WHERE rn <= LEAST(CAST(CEIL(0.9 * (n + 1)) AS BIGINT), n)
    )
    SELECT o.prio AS o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           ROUND(MAX(q.q), 6) AS qhat,
           ROUND(AVG(CASE WHEN {_CF_RESID} <= q.q THEN 1.0 ELSE 0.0 END), 6)
               AS coverage
    FROM obs o JOIN mu USING (prio), qhat q
    WHERE o.fold = 4
    GROUP BY o.prio
    """,
)
def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Papadopoulos et al. 2002 /
    Vovk): train a per-priority mean predictor on folds 0-2, take the
    ceil(0.9·(n+1))-th smallest absolute calibration residual on fold 3 as
    the distribution-free 90% radius qhat, and report EMPIRICAL coverage
    on the held-out fold 4 — the finite-sample-guaranteed uncertainty
    wrapper modern ML serving puts around any point predictor.

    qhat is an exact ORDER STATISTIC (rank ceil(0.9(n+1))), not an
    interpolated quantile — deterministic cross-engine with no
    interpolation-rule drift.  Residuals are shared expression strings
    over exact train means (decimal sums), so both engines rank identical
    doubles.

    Shape at 100 TB: one scan splits three ways by hash; the model is a
    5-row broadcast; the calibration ranking runs over one fold (sampled
    down or sketched via fixed-grid counts if a fold outgrows a partition
    — the rank-selection arithmetic is unchanged); coverage is one
    map-side aggregate."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    obs = o.filter(
        F.col("o_totalprice").isNotNull() & F.col("o_orderpriority").isNotNull()
    ).selectExpr(f"{_CF_FOLD_SPARK} AS fold", "o_orderpriority AS prio", "o_totalprice AS y")
    mu = (
        obs.filter(F.col("fold") <= 2)
        .groupBy("prio")
        .agg(
            (
                F.sum(F.expr("CAST(y AS DECIMAL(24,6))")).cast("double") / F.count("*")
            ).alias("mu")
        )
    )
    cal = (
        obs.filter(F.col("fold") == 3)
        .join(F.broadcast(mu), "prio")
        .selectExpr(f"{_CF_RESID} AS r")
    )
    w_rank = Window.orderBy("r")
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = cal.select(
        "r",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_all).alias("n"),
    )
    qhat = ranked.filter(
        F.col("rn")
        <= F.least(F.ceil(0.9 * (F.col("n") + 1)).cast("bigint"), F.col("n"))
    ).agg(F.max("r").alias("q"))
    return (
        obs.filter(F.col("fold") == 4)
        .join(F.broadcast(mu), "prio")
        .crossJoin(F.broadcast(qhat))
        .groupBy(F.col("prio").alias("o_orderpriority"))
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            F.round(F.max("q"), 6).alias("qhat"),
            F.round(
                F.avg(
                    F.expr(
                        f"CASE WHEN {_CF_RESID} <= q THEN CAST(1.0 AS DOUBLE)"
                        " ELSE CAST(0.0 AS DOUBLE) END"
                    )
                ),
                6,
            ).alias("coverage"),
        )
    )


@register(
    "stat_ks_test",
    oracle="""
    WITH obs AS (
        SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 0 ELSE 1 END AS grp,
               o_totalprice AS v
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
          AND o_totalprice IS NOT NULL
    ),
    pv AS (
        SELECT v,
               SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS t1,
               SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS t2
        FROM obs GROUP BY v
    ),
    cum AS (
        SELECT v,
               CAST(SUM(t1) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS c1,
               CAST(SUM(t2) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS c2,
               CAST(SUM(t1) OVER () AS DOUBLE) AS n1,
               CAST(SUM(t2) OVER () AS DOUBLE) AS n2
        FROM pv
    )
    SELECT CAST(MAX(n1) AS BIGINT) AS n_building,
           CAST(MAX(n2) AS BIGINT) AS n_machinery,
           ROUND(MAX(abs((c1 / n1) - (c2 / n2))), 6) AS ks_d,
           ROUND(MAX(abs((c1 / n1) - (c2 / n2)))
                 * sqrt((MAX(n1) * MAX(n2)) / (MAX(n1) + MAX(n2))), 6)
               AS ks_stat_scaled
    FROM cum
    """,
)
def stat_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic on order totals, BUILDING vs
    MACHINERY: D = sup |F̂₁ − F̂₂| over the pooled support, plus the
    scaled statistic D·√(n₁n₂/(n₁+n₂)) compared against the Kolmogorov
    critical values (1.358 at α=0.05) — the distribution-shape partner of
    the location tests `stat_mannwhitney_u` / `stat_welch_ttest`.

    The ECDFs are computed per DISTINCT VALUE (map-side combined counts,
    then one cumulative window over the value grid) — the same
    distributed-rank formulation as Mann-Whitney, so row count never
    reaches the window.  ECDF steps are exact integer-count ratios; the
    sup and the scale factor are a final 1-row reduce.

    Evaluating only at observed values is exact for D: |F1−F2| is
    right-constant between pooled observations."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    obs = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            & F.col("o_totalprice").isNotNull()
        )
        .selectExpr(
            "CASE WHEN c_mktsegment = 'BUILDING' THEN 0 ELSE 1 END AS grp",
            "o_totalprice AS v",
        )
    )
    pv = obs.groupBy("v").agg(
        F.sum(F.expr("CASE WHEN grp = 0 THEN 1 ELSE 0 END")).alias("t1"),
        F.sum(F.expr("CASE WHEN grp = 1 THEN 1 ELSE 0 END")).alias("t2"),
    )
    # banded two-level cumulative (r8) + broadcast totals: same doubles as
    # the former global Window.orderBy("v") / whole-frame window pair.
    # Totals come from the banded frame's own maxima (the last inclusive
    # running total IS the group total), so both consumers read the grid
    # persisted inside _banded_cum instead of re-evaluating the scans.
    cum0 = _banded_cum(pv, "v", ("t1", "t2"), band_width=10000.0)
    totals = cum0.agg(
        F.max("cum_t1").cast("double").alias("n1"),
        F.max("cum_t2").cast("double").alias("n2"),
    )
    cum = cum0.crossJoin(F.broadcast(totals)).select(
        F.col("cum_t1").cast("double").alias("c1"),
        F.col("cum_t2").cast("double").alias("c2"),
        "n1",
        "n2",
    )
    return cum.agg(
        F.max("n1").cast("bigint").alias("n_building"),
        F.max("n2").cast("bigint").alias("n_machinery"),
        F.round(F.max(F.expr("abs((c1 / n1) - (c2 / n2))")), 6).alias("ks_d"),
        F.round(
            F.max(F.expr("abs((c1 / n1) - (c2 / n2))"))
            * F.sqrt(
                (F.max("n1") * F.max("n2")) / (F.max("n1") + F.max("n2"))
            ),
            6,
        ).alias("ks_stat_scaled"),
    )


# Mann-Kendall over the daily revenue series: S from pairwise signs on the
# calendar spine (like ts_autocorrelation's lag join, bounded by days²),
# variance with the tie correction, and the standard continuity-corrected z.
_MK_Z = (
    "(CASE WHEN s > 0 THEN (s - 1.0) / NULLIF(sqrt(var_s), 0.0)"
    " WHEN s < 0 THEN (s + 1.0) / NULLIF(sqrt(var_s), 0.0)"
    " ELSE 0.0 END)"
)


@register(
    "stat_mann_kendall",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DECIMAL(24,6))
                   AS v
        FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ),
    pairs AS (
        SELECT CASE WHEN b.v > a.v THEN 1
                    WHEN b.v < a.v THEN -1 ELSE 0 END AS sgn
        FROM daily a JOIN daily b ON b.day > a.day
    ),
    ties AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM daily GROUP BY v
    ),
    agg AS (
        SELECT (SELECT CAST(SUM(sgn) AS DOUBLE) FROM pairs) AS s,
               (SELECT CAST(COUNT(*) AS DOUBLE) FROM daily) AS n,
               (SELECT CAST(SUM(t * (t - 1.0) * (2.0 * t + 5.0)) AS DOUBLE)
                FROM ties) AS tie_adj
    ),
    v AS (
        SELECT s, n,
               ((n * (n - 1.0) * (2.0 * n + 5.0)) - tie_adj) / 18.0 AS var_s
        FROM agg
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(s AS BIGINT) AS s_statistic,
           ROUND(var_s, 6) AS var_s,
           ROUND({_MK_Z}, 6) AS z_score
    FROM v
    """,
)
def stat_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on daily order revenue: S counts
    concordant minus discordant day pairs, Var(S) carries the standard
    tie correction, z applies the ±1 continuity correction — the
    significance companion of the `theilsen_daily_trend` slope estimate
    (both are rank-based: no normality assumption on revenue).

    The pairwise S runs on the CALENDAR SPINE after the daily collapse
    (same bounded self-join as `ts_autocorrelation`): days² pairs of a
    few-thousand-row frame, never data², with exact DECIMAL daily sums so
    the sign comparisons are engine-independent integers.  At 100 TB the
    daily collapse is the only data-sized pass."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.expr("CAST(o_totalprice AS DECIMAL(24,6))")).alias("v"))
        .persist()
    )
    a = daily.selectExpr("day AS da", "v AS va")
    b = daily.selectExpr("day AS db", "v AS vb")
    s_frame = (
        a.join(b, F.col("db") > F.col("da"))
        .selectExpr("CASE WHEN vb > va THEN 1 WHEN vb < va THEN -1 ELSE 0 END AS sgn")
        .agg(F.sum("sgn").cast("double").alias("s"))
    )
    n_frame = daily.agg(F.count("*").cast("double").alias("n"))
    tie_frame = (
        daily.groupBy("v")
        .agg(F.count("*").cast("double").alias("t"))
        .agg(
            F.sum(F.expr("t * (t - 1.0) * (2.0 * t + 5.0)"))
            .cast("double")
            .alias("tie_adj")
        )
    )
    v = (
        s_frame.crossJoin(F.broadcast(n_frame))
        .crossJoin(F.broadcast(tie_frame))
        .selectExpr(
            "s",
            "n",
            "((n * (n - 1.0) * (2.0 * n + 5.0)) - COALESCE(tie_adj, 0.0)) / 18.0"
            " AS var_s",
        )
    )
    return v.selectExpr(
        "CAST(n AS BIGINT) AS n_days",
        "CAST(s AS BIGINT) AS s_statistic",
        "ROUND(var_s, 6) AS var_s",
        f"ROUND({_MK_Z}, 6) AS z_score",
    )


@register(
    "stat_chisq_independence",
    oracle="""
    WITH obs AS (
        SELECT c_mktsegment AS seg, o_orderpriority AS prio
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IS NOT NULL AND o_orderpriority IS NOT NULL
    ),
    cell AS (SELECT seg, prio, CAST(COUNT(*) AS DOUBLE) AS o FROM obs GROUP BY seg, prio),
    spine AS (
        SELECT s.seg, p.prio, COALESCE(c.o, 0.0) AS o
        FROM (SELECT DISTINCT seg FROM cell) s
        CROSS JOIN (SELECT DISTINCT prio FROM cell) p
        LEFT JOIN cell c ON c.seg = s.seg AND c.prio = p.prio
    ),
    marg AS (
        SELECT seg, prio, o,
               SUM(o) OVER (PARTITION BY seg) AS rs,
               SUM(o) OVER (PARTITION BY prio) AS cs,
               SUM(o) OVER () AS n,
               COUNT(DISTINCT seg) OVER () AS r,
               COUNT(DISTINCT prio) OVER () AS c
        FROM spine
    ),
    terms AS (
        SELECT r, c, n,
               CAST(ROUND(((o - ((rs * cs) / n)) * (o - ((rs * cs) / n)))
                          / ((rs * cs) / n), 9) AS DECIMAL(38,9)) AS t
        FROM marg
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST((MAX(r) - 1) * (MAX(c) - 1) AS BIGINT) AS dof,
           ROUND(CAST(SUM(t) AS DOUBLE), 6) AS chi2,
           ROUND(sqrt(CAST(SUM(t) AS DOUBLE)
                      / (MAX(n) * LEAST(MAX(r) - 1.0, MAX(c) - 1.0))), 6)
               AS cramers_v
    FROM terms
    """,
)
def stat_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared test of INDEPENDENCE on the (market segment × order
    priority) contingency table, with Cramér's V as the bounded-[0,1]
    effect size — the categorical-association screen run before trusting
    a segment feature in a model (chi2 alone grows with n; V does not).

    One scan builds the exact cell counts (map-side combined, |seg|×|prio|
    groups); margins ride window sums over the full seg×prio SPINE (the
    cross join of the distinct observed margins, left-joined to cell
    counts with COALESCE 0 — ADVICE r5: a structurally-empty cell must
    still contribute its (0−E)²/E = E mass or chi2 silently understates);
    each (O−E)²/E term is quantized (ROUND 9 → DECIMAL) so the statistic
    is an order-independent exact sum.  E > 0 for every spine cell because
    each margin value appears in at least one observed cell.  At 100 TB
    the contingency frame is still |seg|×|prio| rows — the scan is the
    entire cost; the spine cross join is broadcast over two
    margin-cardinality frames."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    obs = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isNotNull() & F.col("o_orderpriority").isNotNull())
        .selectExpr("c_mktsegment AS seg", "o_orderpriority AS prio")
    )
    cell = obs.groupBy("seg", "prio").agg(F.count("*").cast("double").alias("o")).persist()
    spine = (
        cell.select("seg")
        .distinct()
        .crossJoin(F.broadcast(cell.select("prio").distinct()))
        .join(F.broadcast(cell), ["seg", "prio"], "left")
        .select("seg", "prio", F.coalesce(F.col("o"), F.lit(0.0)).alias("o"))
    )
    w_seg = Window.partitionBy("seg")
    w_prio = Window.partitionBy("prio")
    w_all = Window.partitionBy()
    marg = spine.select(
        "o",
        F.sum("o").over(w_seg).alias("rs"),
        F.sum("o").over(w_prio).alias("cs"),
        F.sum("o").over(w_all).alias("n"),
        F.size(F.collect_set("seg").over(w_all)).cast("double").alias("r"),
        F.size(F.collect_set("prio").over(w_all)).cast("double").alias("c"),
    )
    terms = marg.selectExpr(
        "r",
        "c",
        "n",
        "CAST(ROUND(((o - ((rs * cs) / n)) * (o - ((rs * cs) / n)))"
        " / ((rs * cs) / n), 9) AS DECIMAL(38,9)) AS t",
    )
    return terms.agg(
        F.max("n").cast("bigint").alias("n_orders"),
        ((F.max("r") - 1) * (F.max("c") - 1)).cast("bigint").alias("dof"),
        F.round(F.sum("t").cast("double"), 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.sum("t").cast("double")
                / (F.max("n") * F.least(F.max("r") - 1.0, F.max("c") - 1.0))
            ),
            6,
        ).alias("cramers_v"),
    )


# One-way ANOVA F over the pivot-free sufficient statistics.
_AN_F = (
    "(((ssb / (k - 1.0))) / NULLIF((ssw / (n - k)), 0.0))"
)


@register(
    "stat_anova_oneway",
    oracle=f"""
    WITH obs AS (
        SELECT c_mktsegment AS seg, o_totalprice AS v
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IS NOT NULL AND o_totalprice IS NOT NULL
    ),
    per AS (
        SELECT seg, CAST(COUNT(*) AS DOUBLE) AS ng,
               CAST(SUM(CAST(v AS DECIMAL(24,6))) AS DOUBLE) AS sg,
               CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS qg
        FROM obs GROUP BY seg
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS k,
               CAST(SUM(ng) AS DOUBLE) AS n,
               CAST(SUM(sg) AS DOUBLE) AS s,
               CAST(SUM(qg) AS DOUBLE) AS q,
               CAST(SUM(CAST(ROUND((sg * sg) / ng, 9) AS DECIMAL(38,9)))
                    AS DOUBLE) AS sq_over_n
        FROM per
    ),
    ss AS (
        SELECT k, n,
               (sq_over_n - ((s * s) / n)) AS ssb,
               (q - sq_over_n) AS ssw
        FROM tot
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           CAST(k AS BIGINT) AS n_groups,
           ROUND(ssb / (ssb + ssw), 6) AS eta_squared,
           ROUND({_AN_F}, 6) AS f_stat
    FROM ss
    """,
)
def stat_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does mean order total differ across the five market
    segments?  F = (between-group SS / (k−1)) / (within-group SS / (n−k))
    — the k-group generalization of `stat_welch_ttest` (classical
    equal-variance form, documented).

    Everything reduces to one map-side-combined aggregation of exact
    per-group sufficient statistics (n, Σx, Σx² — the same DECIMAL casts
    as `ols_kfold_cv`), then a 5-row reduce; Σ(S²/n) terms are quantized
    so the between-SS is an order-independent sum.  The report carries the
    scale-free F and η² (raw SS at ~1e14 sit within 1-2 ulp of engine
    FMA-contraction differences, so only ratios are hash-stable — same
    reasoning as the SS-free `linreg_by_returnflag` report).  At 100 TB:
    one scan, five groups."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    obs = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isNotNull() & F.col("o_totalprice").isNotNull())
        .selectExpr("c_mktsegment AS seg", "o_totalprice AS v")
    )
    per = obs.groupBy("seg").agg(
        F.count("*").cast("double").alias("ng"),
        F.sum(F.expr("CAST(v AS DECIMAL(24,6))")).cast("double").alias("sg"),
        F.sum(F.expr("CAST(v * v AS DECIMAL(38,12))")).cast("double").alias("qg"),
    )
    tot = per.agg(
        F.count("*").cast("double").alias("k"),
        F.sum("ng").cast("double").alias("n"),
        F.sum("sg").cast("double").alias("s"),
        F.sum("qg").cast("double").alias("q"),
        F.sum(F.expr("CAST(ROUND((sg * sg) / ng, 9) AS DECIMAL(38,9))"))
        .cast("double")
        .alias("sq_over_n"),
    )
    ss = tot.selectExpr(
        "k",
        "n",
        "(sq_over_n - ((s * s) / n)) AS ssb",
        "(q - sq_over_n) AS ssw",
    )
    return ss.selectExpr(
        "CAST(n AS BIGINT) AS n_orders",
        "CAST(k AS BIGINT) AS n_groups",
        "ROUND(ssb / (ssb + ssw), 6) AS eta_squared",
        f"ROUND({_AN_F}, 6) AS f_stat",
    )


@register(
    "lineitem_weighted_median",
    oracle="""
    WITH pv AS (
        SELECT l_returnflag AS flag, l_extendedprice AS v,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS w
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT flag, v,
               SUM(w) OVER (PARTITION BY flag ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
               SUM(w) OVER (PARTITION BY flag) AS tw
        FROM pv
    )
    SELECT flag AS l_returnflag,
           ROUND(MIN(v), 2) AS weighted_median_price,
           ROUND(MAX(tw), 6) AS total_weight
    FROM cum
    WHERE cw >= tw / 2.0
    GROUP BY flag
    """,
)
def lineitem_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-WEIGHTED median extended price per return flag: the
    smallest price whose cumulative quantity weight reaches half the
    total — the robust 'typical traded price' that an unweighted median
    mis-states when cheap items trade in bulk.

    Distributed order-statistic form: weights aggregate per DISTINCT
    (flag, price) first (map-side combined), one cumulative window runs
    over the price grid per flag, and the answer is the first
    grid point crossing W/2 — no per-row global sort, no interpolation
    (exact lower weighted median, deterministic cross-engine).  Weights
    ride exact DECIMAL sums so the W/2 crossing is engine-independent.
    At 100 TB the grid frame is bounded by price-grid cardinality."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    pv = (
        li.filter(F.col("l_extendedprice").isNotNull() & F.col("l_quantity").isNotNull())
        .groupBy(F.col("l_returnflag").alias("flag"), F.col("l_extendedprice").alias("v"))
        .agg(F.sum(F.expr("CAST(l_quantity AS DECIMAL(18,6))")).cast("double").alias("w"))
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
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_flag).alias("tw"),
    )
    return (
        cum.filter(F.col("cw") >= F.col("tw") / 2.0)
        .groupBy(F.col("flag").alias("l_returnflag"))
        .agg(
            F.round(F.min("v"), 2).alias("weighted_median_price"),
            F.round(F.max("tw"), 6).alias("total_weight"),
        )
    )


# --- Kruskal-Wallis H (k-group rank test) -------------------------------------
#
# The k-group generalization of `stat_mannwhitney_u`, same distributed
# formulation: ranks live on the DISTINCT-value grid, rank sums ride exact
# DECIMAL, and the final H algebra is one shared expression string.
_KW_H = (
    "((((12.0 / (n * (n + 1.0))) * sumr2n) - (3.0 * (n + 1.0)))"
    " / NULLIF(1.0 - (tiesum / (n * n * n - n)), 0.0))"
)
_KW_EPS2 = f"(({_KW_H} - k + 1.0) / NULLIF(n - k, 0.0))"


@register(
    "stat_kruskal_wallis",
    oracle=f"""
    WITH obs AS (
        SELECT o_orderpriority AS grp, o_totalprice AS v
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
    ),
    pv AS (SELECT v, COUNT(*) AS t FROM obs GROUP BY v),
    rk AS (
        SELECT v, t,
               (CAST(SUM(t) OVER (ORDER BY v
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS DOUBLE)
                - t) + ((t + 1.0) / 2.0) AS r
        FROM pv
    ),
    gv AS (SELECT grp, v, COUNT(*) AS tg FROM obs GROUP BY grp, v),
    gr AS (
        SELECT g.grp,
               CAST(SUM(g.tg) AS DOUBLE) AS ng,
               CAST(SUM(CAST(g.tg * rk.r AS DECIMAL(38,1))) AS DOUBLE) AS rg
        FROM gv g JOIN rk ON rk.v = g.v
        GROUP BY g.grp
    ),
    s AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS k,
               CAST(SUM(ng) AS DOUBLE) AS n,
               CAST(SUM(CAST(ROUND((rg * rg) / ng, 9) AS DECIMAL(38,9)))
                    AS DOUBLE) AS sumr2n,
               (SELECT CAST(SUM(t * t * t - t) AS DOUBLE) FROM pv) AS tiesum
        FROM gr
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           CAST(k AS BIGINT) AS n_groups,
           ROUND({_KW_H}, 6) AS h_stat,
           ROUND({_KW_EPS2}, 6) AS epsilon_squared
    FROM s
    """,
)
def stat_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H: do the five order priorities draw order totals
    from the same distribution?  The k-group generalization of
    `stat_mannwhitney_u` — rank-based, so it needs no normality or
    equal-variance assumption (`stat_anova_oneway` is the parametric
    sibling on a different grouping).  Tie-corrected H plus the
    epsilon-squared effect size ((H−k+1)/(n−k)).

    Distributed formulation: average ranks depend only on the VALUE, so
    they are computed once on the DISTINCT-value grid (map-side combined
    count per value + one cumulative window over the grid), and per-group
    rank sums come from the (group, value) count frame equi-joined to the
    grid — never a per-row global sort.  Rank sums ride DECIMAL(38,1)
    (ranks are halves; exact while tg·r products stay under 2^53 — same
    envelope as `stat_mannwhitney_u`), and the Σ R_g²/n_g terms are
    quantized (ROUND 9 → DECIMAL) so the 5-term reduce is
    order-independent.  H/ε² algebra is a shared expression string,
    bit-identical cross-engine.  At 100 TB the cumulative never sees a
    single-partition frame (r8): ``_banded_cum`` splits it into
    band-partitioned windows plus a domain-bounded band-offset frame."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    obs = o.filter(
        F.col("o_orderpriority").isNotNull() & F.col("o_totalprice").isNotNull()
    ).selectExpr("o_orderpriority AS grp", "o_totalprice AS v")
    pv = obs.groupBy("v").agg(F.count("*").alias("t"))
    # banded two-level cumulative (r8): same running totals as the former
    # global Window.orderBy("v"), never a single-partition frame
    rk = _banded_cum(pv, "v", ("t",), band_width=10000.0).select(
        "v",
        "t",
        (
            (F.col("cum_t").cast("double") - F.col("t"))
            + (F.col("t") + 1.0) / 2.0
        ).alias("r"),
    )
    gv = obs.groupBy("grp", "v").agg(F.count("*").alias("tg"))
    gr = (
        gv.join(rk.select("v", "r"), "v")
        .groupBy("grp")
        .agg(
            F.sum("tg").cast("double").alias("ng"),
            F.sum(F.expr("CAST(tg * r AS DECIMAL(38,1))")).cast("double").alias("rg"),
        )
    )
    ties = pv.agg(F.sum(F.expr("t * t * t - t")).cast("double").alias("tiesum"))
    s = gr.agg(
        F.count("*").cast("double").alias("k"),
        F.sum("ng").cast("double").alias("n"),
        F.sum(F.expr("CAST(ROUND((rg * rg) / ng, 9) AS DECIMAL(38,9))"))
        .cast("double")
        .alias("sumr2n"),
    ).crossJoin(ties)
    return s.selectExpr(
        "CAST(n AS BIGINT) AS n_orders",
        "CAST(k AS BIGINT) AS n_groups",
        f"ROUND({_KW_H}, 6) AS h_stat",
        f"ROUND({_KW_EPS2}, 6) AS epsilon_squared",
    )


@register(
    "stat_levene_brown_forsythe",
    oracle=f"""
    WITH pv AS (
        SELECT l_returnflag AS flag, l_extendedprice AS v, COUNT(*) AS c
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT flag, v, c,
               SUM(c) OVER (PARTITION BY flag ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
               SUM(c) OVER (PARTITION BY flag) AS ngrp
        FROM pv
    ),
    med AS (
        SELECT flag,
               MIN(CASE WHEN cc >= CAST(FLOOR((ngrp + 1) / 2.0) AS BIGINT)
                        THEN v END) AS m
        FROM cum GROUP BY flag
    ),
    per AS (
        SELECT p.flag,
               CAST(SUM(p.c) AS DOUBLE) AS ng,
               CAST(SUM(CAST(p.c * abs(p.v - med.m) AS DECIMAL(24,6)))
                    AS DOUBLE) AS sg,
               CAST(SUM(CAST(p.c * (abs(p.v - med.m) * abs(p.v - med.m))
                             AS DECIMAL(38,12))) AS DOUBLE) AS qg
        FROM pv p JOIN med ON med.flag = p.flag
        GROUP BY p.flag
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS k,
               CAST(SUM(ng) AS DOUBLE) AS n,
               CAST(SUM(sg) AS DOUBLE) AS s,
               CAST(SUM(qg) AS DOUBLE) AS q,
               CAST(SUM(CAST(ROUND((sg * sg) / ng, 9) AS DECIMAL(38,9)))
                    AS DOUBLE) AS sq_over_n
        FROM per
    ),
    ss AS (
        SELECT k, n,
               (sq_over_n - ((s * s) / n)) AS ssb,
               (q - sq_over_n) AS ssw
        FROM tot
    )
    SELECT CAST(n AS BIGINT) AS n_items,
           CAST(k AS BIGINT) AS n_groups,
           ROUND({_AN_F}, 6) AS bf_w_stat
    FROM ss
    """,
)
def stat_levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test (Levene's test with group MEDIANS): do the
    return-flag groups have equal price VARIANCE?  W = the one-way ANOVA
    F statistic computed on z = |x − median_group| — the robust
    variance-homogeneity gate run before trusting `stat_anova_oneway`'s
    equal-variance assumption.

    Fully grid-resident: per-(flag, price) counts are the only row-sized
    pass; the group median is the exact lower order statistic from one
    cumulative window over the price grid (same crossing recipe as
    `lineitem_weighted_median`), and the deviation sufficient statistics
    (Σc·z, Σc·z²) are computed WITH MULTIPLICITY on the grid itself — the
    original rows are never touched again.  DECIMAL casts + quantized
    Σ(S²/n) terms follow the `stat_anova_oneway` recipe exactly, so W is
    bit-identical cross-engine.  At 100 TB: one scan to the grid, then
    price-cardinality-bounded work."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    pv = (
        li.filter(F.col("l_returnflag").isNotNull() & F.col("l_extendedprice").isNotNull())
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
        "c",
        F.sum("c").over(w_cum).alias("cc"),
        F.sum("c").over(w_flag).alias("ngrp"),
    )
    med = cum.groupBy("flag").agg(
        F.min(
            F.when(
                F.col("cc") >= F.floor((F.col("ngrp") + 1) / F.lit(2.0)).cast("bigint"),
                F.col("v"),
            )
        ).alias("m")
    )
    per = (
        pv.join(F.broadcast(med), "flag")
        .groupBy("flag")
        .agg(
            F.sum("c").cast("double").alias("ng"),
            F.sum(F.expr("CAST(c * abs(v - m) AS DECIMAL(24,6))"))
            .cast("double")
            .alias("sg"),
            F.sum(
                F.expr("CAST(c * (abs(v - m) * abs(v - m)) AS DECIMAL(38,12))")
            )
            .cast("double")
            .alias("qg"),
        )
    )
    tot = per.agg(
        F.count("*").cast("double").alias("k"),
        F.sum("ng").cast("double").alias("n"),
        F.sum("sg").cast("double").alias("s"),
        F.sum("qg").cast("double").alias("q"),
        F.sum(F.expr("CAST(ROUND((sg * sg) / ng, 9) AS DECIMAL(38,9))"))
        .cast("double")
        .alias("sq_over_n"),
    )
    ss = tot.selectExpr(
        "k",
        "n",
        "(sq_over_n - ((s * s) / n)) AS ssb",
        "(q - sq_over_n) AS ssw",
    )
    return ss.selectExpr(
        "CAST(n AS BIGINT) AS n_items",
        "CAST(k AS BIGINT) AS n_groups",
        f"ROUND({_AN_F}, 6) AS bf_w_stat",
    )


# --- Jarque-Bera normality (moment-based) -------------------------------------
#
# Central moments from raw power sums; every power product is written with
# EXPLICIT left association so both engines perform the identical sequence
# of IEEE multiplies before the DECIMAL quantization.
_JB_M2 = "((q2 / n) - (mu * mu))"
_JB_M3 = "((q3 / n) - ((3.0 * mu) * (q2 / n)) + ((2.0 * mu) * (mu * mu)))"
_JB_M4 = (
    "((q4 / n) - ((4.0 * mu) * (q3 / n)) + (((6.0 * mu) * mu) * (q2 / n))"
    " - (((3.0 * mu) * mu) * (mu * mu)))"
)
_JB_SKEW = f"({_JB_M3} / NULLIF(power({_JB_M2}, 1.5), 0.0))"
_JB_EXKURT = f"(({_JB_M4} / NULLIF({_JB_M2} * {_JB_M2}, 0.0)) - 3.0)"
_JB_STAT = (
    f"((n / 6.0) * (({_JB_SKEW} * {_JB_SKEW})"
    f" + (({_JB_EXKURT} * {_JB_EXKURT}) / 4.0)))"
)


@register(
    "stat_jarque_bera",
    oracle=f"""
    WITH per AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,10)))
                    AS DOUBLE) AS q2,
               CAST(SUM(CAST((l_quantity * l_quantity) * l_quantity
                             AS DECIMAL(38,10))) AS DOUBLE) AS q3,
               CAST(SUM(CAST(((l_quantity * l_quantity) * l_quantity)
                             * l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS q4
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
        GROUP BY 1
    ),
    m AS (SELECT l_returnflag, n, (s1 / n) AS mu, q2, q3, q4 FROM per)
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_items,
           ROUND({_JB_SKEW}, 6) AS skewness,
           ROUND({_JB_EXKURT}, 6) AS excess_kurtosis,
           ROUND({_JB_STAT}, 6) AS jb_stat
    FROM m
    """,
)
def stat_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test per return flag: JB = n/6·(S² + K²/4)
    from the moment-based skewness S and excess kurtosis K of quantity —
    the single-pass normality gate a pipeline runs before trusting
    moment-based anomaly thresholds (a uniform quantity column like this
    one fails loudly: K ≈ −1.2).

    One map-side-combined aggregate collects the four raw power sums per
    group (Σx..Σx⁴ as exact DECIMALs — quantity ≤ 50 keeps x⁴ ≤ 6.25e6,
    far inside DECIMAL(38,10)); central moments, S, K and JB are shared
    expression strings with EXPLICIT left-associated multiplies so both
    engines execute the identical IEEE sequence.  At 100 TB: one scan,
    3 groups, 15 doubles of state per task."""
    li = load_table(spark, sf_dir, "lineitem")
    per = (
        li.filter(F.col("l_returnflag").isNotNull() & F.col("l_quantity").isNotNull())
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum(F.expr("CAST(l_quantity AS DECIMAL(24,6))")).cast("double").alias("s1"),
            F.sum(F.expr("CAST(l_quantity * l_quantity AS DECIMAL(38,10))"))
            .cast("double")
            .alias("q2"),
            F.sum(
                F.expr("CAST((l_quantity * l_quantity) * l_quantity AS DECIMAL(38,10))")
            )
            .cast("double")
            .alias("q3"),
            F.sum(
                F.expr(
                    "CAST(((l_quantity * l_quantity) * l_quantity) * l_quantity"
                    " AS DECIMAL(38,10))"
                )
            )
            .cast("double")
            .alias("q4"),
        )
    )
    m = per.selectExpr("l_returnflag", "n", "(s1 / n) AS mu", "q2", "q3", "q4")
    return m.selectExpr(
        "l_returnflag",
        "CAST(n AS BIGINT) AS n_items",
        f"ROUND({_JB_SKEW}, 6) AS skewness",
        f"ROUND({_JB_EXKURT}, 6) AS excess_kurtosis",
        f"ROUND({_JB_STAT}, 6) AS jb_stat",
    )


# --- Cohen's kappa (inter-rater agreement) ------------------------------------
#
# Kappa over exact integer contingency counts: numerator and denominator are
# BIGINT products, so the only float op is the final division.
_CK_KAPPA = (
    "(CAST((n * (n11 + n00)) - ((a1 * b1) + ((n - a1) * (n - b1))) AS DOUBLE)"
    " / NULLIF(CAST((n * n) - ((a1 * b1) + ((n - a1) * (n - b1))) AS DOUBLE),"
    " 0.0))"
)


@register(
    "stat_cohens_kappa",
    oracle=f"""
    WITH rated AS (
        SELECT CASE WHEN length(COALESCE(text, '')) >= 150 THEN 1 ELSE 0 END AS a,
               CASE WHEN len(regexp_extract_all(lower(COALESCE(text, '')), '[a-z'']+')) > 0
                         AND 100 * len(list_distinct(regexp_extract_all(
                                 lower(COALESCE(text, '')), '[a-z'']+')))
                             >= 55 * len(regexp_extract_all(
                                 lower(COALESCE(text, '')), '[a-z'']+'))
                    THEN 1 ELSE 0 END AS b
        FROM documents
    ),
    c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a) AS BIGINT) AS a1,
               CAST(SUM(b) AS BIGINT) AS b1,
               CAST(SUM(a * b) AS BIGINT) AS n11,
               CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
        FROM rated
    )
    SELECT n AS n_docs,
           n11 AS n_both_pass,
           n00 AS n_both_fail,
           ROUND(CAST(n11 + n00 AS DOUBLE) / n, 6) AS observed_agreement,
           ROUND({_CK_KAPPA}, 6) AS kappa
    FROM c
    """,
)
def stat_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two independent document-quality raters:
    rater A = length gate (≥150 chars), rater B = lexical-diversity gate
    (distinct tokens ≥ 55% of tokens).  Kappa is the chance-corrected
    agreement — THE metric for deciding whether two cheap filter
    heuristics are redundant (κ→1) or complementary (κ→0) before wiring
    both into a training-data pipeline.

    Both raters are pure codegen expressions evaluated in ONE scan (the
    tokenizer regex is shared verbatim with the oracle, the same
    ``[a-z']+`` contract as `text_fingerprint`); the contingency table is
    four exact BIGINT counts from one aggregate, the diversity gate is an
    INTEGER cross-multiplication (100·distinct ≥ 55·tokens — no float
    ratio anywhere), and kappa's numerator/denominator are integer
    products with one final division (shared expression string).  At
    100 TB: one scan, five integers of state per task."""
    docs = load_table(spark, sf_dir, "documents")
    toks = "regexp_extract_all(lower(COALESCE(text, '')), \"[a-z']+\", 0)"
    rated = docs.selectExpr(
        "CASE WHEN length(COALESCE(text, '')) >= 150 THEN 1 ELSE 0 END AS a",
        f"CASE WHEN size({toks}) > 0"
        f"          AND 100 * size(array_distinct({toks})) >= 55 * size({toks})"
        f"     THEN 1 ELSE 0 END AS b",
    )
    c = rated.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("a").cast("bigint").alias("a1"),
        F.sum("b").cast("bigint").alias("b1"),
        F.sum(F.expr("a * b")).cast("bigint").alias("n11"),
        F.sum(F.expr("(1 - a) * (1 - b)")).cast("bigint").alias("n00"),
    )
    return c.selectExpr(
        "n AS n_docs",
        "n11 AS n_both_pass",
        "n00 AS n_both_fail",
        "ROUND(CAST(n11 + n00 AS DOUBLE) / n, 6) AS observed_agreement",
        f"ROUND({_CK_KAPPA}, 6) AS kappa",
    )


# --- Fleiss' kappa (multi-rater agreement) ------------------------------------
#
# Binary categories, 3 raters: per-item agreement P_i = (n1^2 + n0^2 - 3)/6
# where n1 = raters voting pass.  Everything up to the final divisions is
# exact integer arithmetic.
_FK_PBAR = "((CAST(s_pp AS DOUBLE) - 3.0 * n) / (6.0 * n))"
_FK_PE = (
    "(((CAST(s1 AS DOUBLE) / (3.0 * n)) * (CAST(s1 AS DOUBLE) / (3.0 * n)))"
    " + (((3.0 * n - s1) / (3.0 * n)) * ((3.0 * n - s1) / (3.0 * n))))"
)
_FK_KAPPA = f"(({_FK_PBAR} - {_FK_PE}) / NULLIF(1.0 - {_FK_PE}, 0.0))"


@register(
    "stat_fleiss_kappa",
    oracle=f"""
    WITH rated AS (
        SELECT (CASE WHEN length(COALESCE(text, '')) >= 150 THEN 1 ELSE 0 END
                + CASE WHEN len(regexp_extract_all(lower(COALESCE(text, '')), '[a-z'']+')) > 0
                            AND 100 * len(list_distinct(regexp_extract_all(
                                    lower(COALESCE(text, '')), '[a-z'']+')))
                                >= 55 * len(regexp_extract_all(
                                    lower(COALESCE(text, '')), '[a-z'']+'))
                       THEN 1 ELSE 0 END
                + CASE WHEN length(array_to_string(regexp_extract_all(
                                 lower(COALESCE(text, '')), '[a-z'']+'), ''))
                            >= 4 * len(regexp_extract_all(
                                 lower(COALESCE(text, '')), '[a-z'']+'))
                       THEN 1 ELSE 0 END) AS n1
        FROM documents
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(n1) AS BIGINT) AS s1,
               CAST(SUM(n1 * n1 + (3 - n1) * (3 - n1)) AS BIGINT) AS s_pp
        FROM rated
    )
    SELECT n AS n_docs,
           s1 AS n_pass_votes,
           ROUND({_FK_PBAR}, 6) AS observed_agreement,
           ROUND({_FK_PE}, 6) AS expected_agreement,
           ROUND({_FK_KAPPA}, 6) AS fleiss_kappa
    FROM s
    """,
)
def stat_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa for THREE document-quality raters (length gate,
    lexical-diversity gate, mean-token-length gate) voting pass/fail —
    the multi-rater generalization of `stat_cohens_kappa`, the metric for
    'do my ensemble of cheap filters actually agree beyond chance?'
    before majority-voting them in a pipeline.

    Each rater is a codegen expression in ONE scan; the per-item vote
    count n1 ∈ {{0..3}} makes P_i = (n1² + (3−n1)² − 3)/6 pure integer
    work, so the sufficient statistics are three exact BIGINTs (n, Σn1,
    Σ(n1²+(3−n1)²)) and every float op lives in one shared expression
    string.  The mean-token-length gate is the integer comparison
    total_token_chars ≥ 4·tokens (chars via length(concat of tokens) —
    portable, no per-token loop).  At 100 TB: one scan, three integers."""
    docs = load_table(spark, sf_dir, "documents")
    toks = "regexp_extract_all(lower(COALESCE(text, '')), \"[a-z']+\", 0)"
    rated = docs.selectExpr(
        f"(CASE WHEN length(COALESCE(text, '')) >= 150 THEN 1 ELSE 0 END"
        f" + CASE WHEN size({toks}) > 0"
        f"            AND 100 * size(array_distinct({toks})) >= 55 * size({toks})"
        f"        THEN 1 ELSE 0 END"
        f" + CASE WHEN length(array_join({toks}, '')) >= 4 * size({toks})"
        f"        THEN 1 ELSE 0 END) AS n1"
    )
    s = rated.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("n1").cast("bigint").alias("s1"),
        F.sum(F.expr("n1 * n1 + (3 - n1) * (3 - n1)")).cast("bigint").alias("s_pp"),
    )
    return s.selectExpr(
        "n AS n_docs",
        "s1 AS n_pass_votes",
        f"ROUND({_FK_PBAR}, 6) AS observed_agreement",
        f"ROUND({_FK_PE}, 6) AS expected_agreement",
        f"ROUND({_FK_KAPPA}, 6) AS fleiss_kappa",
    )


@register(
    "forecast_pinball_loss",
    oracle="""
    WITH base AS (
        SELECT l_returnflag AS flag, l_extendedprice AS y,
               CASE WHEN strpos('01234567',
                        substr(md5(CAST(l_orderkey AS VARCHAR) || ':'
                               || CAST(l_linenumber AS VARCHAR)), 1, 1)) > 0
                    THEN 1 ELSE 0 END AS is_train
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL
    ),
    pv AS (
        SELECT flag, y, COUNT(*) AS c FROM base WHERE is_train = 1
        GROUP BY flag, y
    ),
    cum AS (
        SELECT flag, y, c,
               SUM(c) OVER (PARTITION BY flag ORDER BY y
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
               SUM(c) OVER (PARTITION BY flag) AS n
        FROM pv
    ),
    pred AS (
        SELECT flag,
               MIN(CASE WHEN cc >= CAST(FLOOR((n + 1) / 2.0) AS BIGINT)
                        THEN y END) AS p50,
               MIN(CASE WHEN cc >= CAST(FLOOR((9.0 * n + 9.0) / 10.0) AS BIGINT)
                        THEN y END) AS p90,
               MAX(n) AS n_train
        FROM cum GROUP BY flag
    )
    SELECT b.flag AS l_returnflag,
           CAST(MAX(p.n_train) AS BIGINT) AS n_train,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           ROUND(MAX(p.p50), 2) AS pred_p50,
           ROUND(MAX(p.p90), 2) AS pred_p90,
           ROUND(CAST(SUM(CAST(ROUND(CASE WHEN b.y >= p.p50
                         THEN 0.5 * (b.y - p.p50)
                         ELSE 0.5 * (p.p50 - b.y) END, 6) AS DECIMAL(24,6)))
                 AS DOUBLE) / COUNT(*), 6) AS pinball_p50,
           ROUND(CAST(SUM(CAST(ROUND(CASE WHEN b.y >= p.p90
                         THEN 0.9 * (b.y - p.p90)
                         ELSE 0.1 * (p.p90 - b.y) END, 6) AS DECIMAL(24,6)))
                 AS DOUBLE) / COUNT(*), 6) AS pinball_p90
    FROM base b JOIN pred p ON p.flag = b.flag
    WHERE b.is_train = 0
    GROUP BY b.flag
    """,
)
def forecast_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-forecast evaluation: train-half order-statistic quantile
    predictors (P50/P90 of price per flag) scored on the held-out half
    with PINBALL LOSS — the proper scoring rule for quantile forecasts
    (what a demand-forecast eval pipeline reports per series).

    The train/test split is a deterministic md5 hash of the row key (50%
    by first hex digit — replays in any engine, unlike RNG splits);
    predictors are exact lower order statistics from the train-half price
    grid (the `histogram_quantile_portable` crossing recipe); each
    pinball term is quantized (ROUND 6 → DECIMAL) so the test-half mean
    is an order-independent sum.  At 100 TB: one scan to the grid + one
    broadcast probe of 2 predictors per group over the test half."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_extendedprice").isNotNull()).selectExpr(
        "l_returnflag AS flag",
        "l_extendedprice AS y",
        "CASE WHEN instr('01234567', substr(md5(concat(CAST(l_orderkey AS STRING),"
        " ':', CAST(l_linenumber AS STRING))), 1, 1)) > 0 THEN 1 ELSE 0 END"
        " AS is_train",
    )
    pv = (
        base.filter(F.col("is_train") == 1)
        .groupBy("flag", "y")
        .agg(F.count("*").alias("c"))
    )
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_flag = Window.partitionBy("flag")
    cum = pv.select(
        "flag",
        "y",
        F.sum("c").over(w_cum).alias("cc"),
        F.sum("c").over(w_flag).alias("n"),
    )
    pred = cum.groupBy("flag").agg(
        F.min(
            F.when(
                F.col("cc") >= F.floor((F.col("n") + 1) / F.lit(2.0)).cast("bigint"),
                F.col("y"),
            )
        ).alias("p50"),
        F.min(
            F.when(
                F.col("cc")
                >= F.floor((9.0 * F.col("n") + 9.0) / F.lit(10.0)).cast("bigint"),
                F.col("y"),
            )
        ).alias("p90"),
        F.max("n").alias("n_train"),
    )
    return (
        base.filter(F.col("is_train") == 0)
        .join(F.broadcast(pred), "flag")
        .groupBy("flag")
        .agg(
            F.max("n_train").cast("bigint").alias("n_train"),
            F.count("*").cast("bigint").alias("n_test"),
            F.round(F.max("p50"), 2).alias("pred_p50"),
            F.round(F.max("p90"), 2).alias("pred_p90"),
            F.round(
                F.sum(
                    F.expr(
                        "CAST(ROUND(CASE WHEN y >= p50 THEN 0.5 * (y - p50)"
                        " ELSE 0.5 * (p50 - y) END, 6) AS DECIMAL(24,6))"
                    )
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("pinball_p50"),
            F.round(
                F.sum(
                    F.expr(
                        "CAST(ROUND(CASE WHEN y >= p90 THEN 0.9 * (y - p90)"
                        " ELSE 0.1 * (p90 - y) END, 6) AS DECIMAL(24,6))"
                    )
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("pinball_p90"),
        )
        .withColumnRenamed("flag", "l_returnflag")
    )


# --- Hash-randomization permutation test --------------------------------------
#
# B=64 deterministic relabelings from md5(day:replicate) — a randomization
# test with NO RNG state, so both engines enumerate the identical replicate
# set and the p-value is hash-checkable.
_PT_B = 64


@register(
    "stat_permutation_test",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS rev
        FROM orders
        WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        GROUP BY o_orderdate
    ),
    bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
    lab AS (
        SELECT daily.d, daily.rev,
               CASE WHEN date_diff('day', b.lo, daily.d) * 2
                         <= date_diff('day', b.lo, b.hi)
                    THEN 1 ELSE 0 END AS g
        FROM daily CROSS JOIN bounds b
    ),
    obs AS (
        SELECT (SUM(CASE WHEN g = 1 THEN rev END) / SUM(CASE WHEN g = 1 THEN 1 END))
             - (SUM(CASE WHEN g = 0 THEN rev END) / SUM(CASE WHEN g = 0 THEN 1 END))
               AS stat,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM lab
    ),
    reps AS (
        SELECT r.b, lab.rev,
               CASE WHEN strpos('02468ace',
                        substr(md5(CAST(lab.d AS VARCHAR) || ':'
                               || CAST(r.b AS VARCHAR)), 1, 1)) > 0
                    THEN 1 ELSE 0 END AS g
        FROM lab, generate_series(0, {_PT_B - 1}) r(b)
    ),
    repstat AS (
        SELECT b,
               (SUM(CASE WHEN g = 1 THEN rev END) / NULLIF(SUM(CASE WHEN g = 1 THEN 1 END), 0))
             - (SUM(CASE WHEN g = 0 THEN rev END) / NULLIF(SUM(CASE WHEN g = 0 THEN 1 END), 0))
               AS stat
        FROM reps GROUP BY b
    )
    SELECT o.n_days,
           ROUND(o.stat, 6) AS obs_diff,
           CAST(SUM(CASE WHEN ABS(r.stat) >= ABS(o.stat) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_extreme,
           ROUND((1.0 + SUM(CASE WHEN ABS(r.stat) >= ABS(o.stat) THEN 1 ELSE 0 END))
                 / (1.0 + {_PT_B}), 6) AS p_value
    FROM repstat r CROSS JOIN obs o
    GROUP BY o.n_days, o.stat
    """,
)
def stat_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization (permutation-style) test for a mean shift between the
    first and second half of the order calendar, on DAILY revenue: B=64
    deterministic relabelings drawn from md5(day:replicate) — no RNG
    state, so the ENTIRE replicate set (and therefore the p-value) replays
    bit-for-bit in the oracle, unlike any seed-based shuffle.  p =
    (1 + #{{|stat_b| ≥ |obs|}}) / (B+1), the standard add-one estimator.

    The data-sized work is ONE aggregate (daily revenue on exact DECIMAL
    sums); everything after lives on the calendar-bounded daily frame
    (days × 64 replicate labels — the only fan-out), so at 100 TB the
    test costs one scan plus a constant-size shuffle.  The group split is
    by hash parity per replicate (a randomization test; exact-permutation
    balance is not required for validity under H0)."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.filter(F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull())
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.expr("CAST(o_totalprice AS DECIMAL(24,6))"))
            .cast("double")
            .alias("rev")
        )
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    lab = daily.crossJoin(F.broadcast(bounds)).selectExpr(
        "d",
        "rev",
        "CASE WHEN datediff(d, lo) * 2 <= datediff(hi, lo) THEN 1 ELSE 0 END AS g",
    )
    obs = lab.agg(
        (
            F.expr("SUM(CASE WHEN g = 1 THEN rev END) / SUM(CASE WHEN g = 1 THEN 1 END)")
            - F.expr(
                "SUM(CASE WHEN g = 0 THEN rev END) / SUM(CASE WHEN g = 0 THEN 1 END)"
            )
        ).alias("stat"),
        F.count("*").cast("bigint").alias("n_days"),
    )
    reps = (
        lab.crossJoin(F.broadcast(spark.range(_PT_B).selectExpr("id AS b")))
        .selectExpr(
            "b",
            "rev",
            "CASE WHEN instr('02468ace', substr(md5(concat(CAST(d AS STRING), ':',"
            " CAST(b AS STRING))), 1, 1)) > 0 THEN 1 ELSE 0 END AS g",
        )
    )
    repstat = reps.groupBy("b").agg(
        (
            F.expr(
                "SUM(CASE WHEN g = 1 THEN rev END)"
                " / NULLIF(SUM(CASE WHEN g = 1 THEN 1 END), 0)"
            )
            - F.expr(
                "SUM(CASE WHEN g = 0 THEN rev END)"
                " / NULLIF(SUM(CASE WHEN g = 0 THEN 1 END), 0)"
            )
        ).alias("stat")
    )
    return (
        repstat.crossJoin(F.broadcast(obs.selectExpr("stat AS obs_stat", "n_days")))
        .groupBy("n_days", "obs_stat")
        .agg(
            F.sum(
                F.expr("CASE WHEN ABS(stat) >= ABS(obs_stat) THEN 1 ELSE 0 END")
            )
            .cast("bigint")
            .alias("n_extreme")
        )
        .selectExpr(
            "n_days",
            "ROUND(obs_stat, 6) AS obs_diff",
            "n_extreme",
            f"ROUND((1.0 + CAST(n_extreme AS DOUBLE)) / (1.0 + {_PT_B}), 6)"
            " AS p_value",
        )
    )


@register(
    "stat_bh_fdr_report",
    oracle="""
    WITH docs_ok AS (
        SELECT source, n_chars FROM documents
        WHERE source IS NOT NULL AND n_chars IS NOT NULL
    ),
    grid AS (SELECT DISTINCT n_chars AS v FROM docs_ok),
    srcs AS (SELECT source, COUNT(*) AS n_s FROM docs_ok GROUP BY source),
    cnt AS (
        SELECT source, n_chars AS v, COUNT(*) AS c
        FROM docs_ok GROUP BY source, n_chars
    ),
    tot AS (SELECT n_chars AS v, COUNT(*) AS c FROM docs_ok GROUP BY n_chars),
    dense AS (
        SELECT s.source, s.n_s, g.v,
               COALESCE(c.c, 0) AS cs,
               t.c AS ct
        FROM srcs s CROSS JOIN grid g
        JOIN tot t ON t.v = g.v
        LEFT JOIN cnt c ON c.source = s.source AND c.v = g.v
    ),
    cum AS (
        SELECT source, n_s, v,
               CAST(SUM(cs) OVER (PARTITION BY source ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS fs,
               CAST(SUM(ct - cs) OVER (PARTITION BY source ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS fr,
               CAST(SUM(ct - cs) OVER (PARTITION BY source) AS DOUBLE) AS n_r
        FROM dense
    ),
    ks AS (
        SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_docs,
               ROUND(MAX(abs(fs / n_s - fr / n_r)), 9) AS d,
               MAX(n_s) AS n_s, MAX(n_r) AS n_r
        FROM cum GROUP BY source
    ),
    pv AS (
        SELECT source, n_docs, d,
               LEAST(1.0, ROUND(2 * exp(-2 * d * d * (n_s * n_r / (n_s + n_r))), 9))
                   AS p
        FROM ks
    ),
    ranked AS (
        SELECT source, n_docs, d, p,
               ROW_NUMBER() OVER (ORDER BY p ASC, source ASC) AS rk,
               COUNT(*) OVER () AS m
        FROM pv
    ),
    flagged AS (
        SELECT *, CASE WHEN p <= rk * 0.10 / m THEN rk ELSE 0 END AS hit
        FROM ranked
    )
    SELECT source, n_docs,
           ROUND(d, 6) AS ks_d,
           ROUND(p, 6) AS p_value,
           CAST(rk AS BIGINT) AS bh_rank,
           ROUND(rk * 0.10 / m, 6) AS bh_threshold,
           CAST(rk <= MAX(hit) OVER () AS INT) AS is_rejected
    FROM flagged
    """,
)
def stat_bh_fdr_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR control over a family of per-source tests:
    each document source gets a two-sample KS test of its length
    distribution against the pooled rest (asymptotic p = 2·exp(−2D²·n̄),
    clamped), then the BH step-up at q=0.10 — the multiple-testing
    correction every per-group anomaly report needs before flagging
    sources, completing the stat family's single-test entries
    (`stat_ks_test`, `stat_welch_ttest`, …) with the FAMILY-level verdict.
    Row = source with its KS D, p-value, BH rank/threshold, and the
    step-up rejection flag (all ranks ≤ the largest rank whose p clears
    its threshold).

    Determinism: ECDFs are exact integer-count ratios on the pooled value
    grid; D and p are 9-rounded before any comparison; ranks tie-break on
    source.  Scale posture: counts aggregate map-side to the (source ×
    distinct-value) grid — never row-sized windows; the BH pass runs on
    m = O(sources) rows."""
    from pyspark.sql import Window

    docs_ok = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("source").isNotNull() & F.col("n_chars").isNotNull())
        .select("source", "n_chars")
    )
    grid = docs_ok.select(F.col("n_chars").alias("v")).distinct()
    srcs = docs_ok.groupBy("source").agg(F.count("*").alias("n_s"))
    cnt = docs_ok.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count("*").alias("c")
    )
    tot = docs_ok.groupBy(F.col("n_chars").alias("v")).agg(F.count("*").alias("ct"))
    dense = (
        srcs.crossJoin(grid)
        .join(tot, "v")
        .join(cnt, ["source", "v"], "left")
        .select(
            "source", "n_s", "v", F.coalesce("c", F.lit(0)).alias("cs"), "ct"
        )
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_src = Window.partitionBy("source")
    cum = dense.select(
        "source",
        "n_s",
        F.sum("cs").over(w_cum).cast("double").alias("fs"),
        F.sum(F.col("ct") - F.col("cs")).over(w_cum).cast("double").alias("fr"),
        F.sum(F.col("ct") - F.col("cs")).over(w_src).cast("double").alias("n_r"),
    )
    ks = cum.groupBy("source").agg(
        F.max("n_s").cast("bigint").alias("n_docs"),
        F.round(
            F.max(F.abs(F.col("fs") / F.col("n_s") - F.col("fr") / F.col("n_r"))), 9
        ).alias("d"),
        F.max("n_s").alias("ns"),
        F.max("n_r").alias("nr"),
    )
    p = F.least(
        F.lit(1.0),
        F.round(
            2
            * F.exp(
                -2
                * F.col("d")
                * F.col("d")
                * (F.col("ns") * F.col("nr") / (F.col("ns") + F.col("nr")))
            ),
            9,
        ),
    )
    pv = ks.select("source", "n_docs", "d", p.alias("p"))
    w_rank = Window.orderBy(F.asc("p"), F.asc("source"))
    ranked = pv.select(
        "source",
        "n_docs",
        "d",
        "p",
        F.row_number().over(w_rank).alias("rk"),
        F.count("*").over(Window.partitionBy()).alias("m"),
    )
    flagged = ranked.withColumn(
        "hit",
        F.when(F.col("p") <= F.col("rk") * 0.10 / F.col("m"), F.col("rk")).otherwise(
            F.lit(0)
        ),
    )
    return flagged.select(
        "source",
        "n_docs",
        F.round("d", 6).alias("ks_d"),
        F.round("p", 6).alias("p_value"),
        F.col("rk").cast("bigint").alias("bh_rank"),
        F.round(F.col("rk") * 0.10 / F.col("m"), 6).alias("bh_threshold"),
        (F.col("rk") <= F.max("hit").over(Window.partitionBy()))
        .cast("int")
        .alias("is_rejected"),
    )


# ---------------------------------------------------------------------------
# Round 7 second wave: equivalence testing, paired pre/post tests, ordered
# trend tests, and WoE/IV feature screening — the remaining staples of an
# experimentation + feature-engineering stack.  All shared-expression-string
# designs (the same SQL fragment feeds Spark's selectExpr and the DuckDB
# oracle) like the Welch/TOST family above.

# TOST reuses the Welch pivot column names (n1/sx1/sxx1, n2/sx2/sxx2), so the
# mean/variance/SE fragments are shared with stat_welch_ttest verbatim.
_TOST_DIFF = f"({_WT_M1} - {_WT_M2})"
_TOST_SE = f"sqrt({_WT_SE1} + {_WT_SE2})"
_TOST_MARGIN = "(0.005 * ((sx1 + sx2) / (n1 + n2)))"
_TOST_TL = f"(({_TOST_DIFF} + {_TOST_MARGIN}) / NULLIF({_TOST_SE}, 0.0))"
_TOST_TU = f"(({_TOST_MARGIN} - {_TOST_DIFF}) / NULLIF({_TOST_SE}, 0.0))"
# one-sided z critical value at alpha = 0.05 (Welch df is ~sample-sized here,
# so the normal limit is the appropriate reference)
_TOST_CRIT = "1.644854"


@register(
    "stat_tost_equivalence",
    oracle=f"""
    WITH obs AS (
        SELECT CASE WHEN l_linestatus = 'F' THEN 0 ELSE 1 END AS grp,
               l_extendedprice AS v
        FROM lineitem
        WHERE l_linestatus IN ('F', 'O') AND l_extendedprice IS NOT NULL
    ),
    per AS (
        SELECT grp, CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(v AS DECIMAL(24,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS sxx
        FROM obs GROUP BY grp
    ),
    piv AS (
        SELECT MAX(CASE WHEN grp = 0 THEN n END) AS n1,
               MAX(CASE WHEN grp = 0 THEN sx END) AS sx1,
               MAX(CASE WHEN grp = 0 THEN sxx END) AS sxx1,
               MAX(CASE WHEN grp = 1 THEN n END) AS n2,
               MAX(CASE WHEN grp = 1 THEN sx END) AS sx2,
               MAX(CASE WHEN grp = 1 THEN sxx END) AS sxx2
        FROM per
    )
    SELECT CAST(n1 AS BIGINT) AS n_f,
           CAST(n2 AS BIGINT) AS n_o,
           ROUND({_WT_M1}, 6) AS mean_f,
           ROUND({_WT_M2}, 6) AS mean_o,
           ROUND({_TOST_DIFF}, 6) AS mean_diff,
           ROUND({_TOST_MARGIN}, 6) AS margin,
           ROUND({_TOST_TL}, 6) AS t_lower,
           ROUND({_TOST_TU}, 6) AS t_upper,
           CAST(({_TOST_TL} > {_TOST_CRIT} AND {_TOST_TU} > {_TOST_CRIT}) AS INT)
               AS is_equivalent
    FROM piv
    """,
)
def stat_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two One-Sided Tests (TOST) equivalence check on mean extended price,
    line status F vs O, margin ±0.5% of the pooled mean — the test that
    answers "are these the SAME?" which a plain t-test cannot (failing to
    reject difference is not evidence of equivalence).  The experimentation
    stack's guardrail-metric check runs exactly this shape.

    Same sufficient-statistics design as `stat_welch_ttest` (exact DECIMAL
    Σx / Σx², pivot to one row, shared expression strings for both engines);
    both one-sided t statistics compare against the one-sided normal
    critical value 1.644854.  Scale cost: one scan, two groups, one row."""
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.filter(
        F.col("l_linestatus").isin("F", "O") & F.col("l_extendedprice").isNotNull()
    ).selectExpr(
        "CASE WHEN l_linestatus = 'F' THEN 0 ELSE 1 END AS grp",
        "l_extendedprice AS v",
    )
    per = obs.groupBy("grp").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("v").cast("decimal(24,6)")).cast("double").alias("sx"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxx"),
    )
    piv = per.agg(
        *[
            F.max(F.when(F.col("grp") == g, F.col(c))).alias(f"{c}{g + 1}")
            for g in (0, 1)
            for c in ("n", "sx", "sxx")
        ]
    )
    return piv.selectExpr(
        "CAST(n1 AS BIGINT) AS n_f",
        "CAST(n2 AS BIGINT) AS n_o",
        f"ROUND({_WT_M1}, 6) AS mean_f",
        f"ROUND({_WT_M2}, 6) AS mean_o",
        f"ROUND({_TOST_DIFF}, 6) AS mean_diff",
        f"ROUND({_TOST_MARGIN}, 6) AS margin",
        f"ROUND({_TOST_TL}, 6) AS t_lower",
        f"ROUND({_TOST_TU}, 6) AS t_upper",
        f"CAST(({_TOST_TL} > {_TOST_CRIT} AND {_TOST_TU} > {_TOST_CRIT}) AS INT)"
        " AS is_equivalent",
    )


_MCN_STAT = (
    "((ABS(CAST(b - c AS DOUBLE)) - 1.0) * (ABS(CAST(b - c AS DOUBLE)) - 1.0)"
    " / NULLIF(CAST(b + c AS DOUBLE), 0.0))"
)


@register(
    "stat_mcnemar_test",
    oracle=f"""
    WITH base AS (
        SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
        FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL AND user_id IS NOT NULL
    ),
    thr AS (
        SELECT CAST(FLOOR((MIN(sec) + MAX(sec)) / 2.0) AS BIGINT) AS cut FROM base
    ),
    per_user AS (
        SELECT user_id,
               MAX(CASE WHEN sec <  cut THEN 1 ELSE 0 END) AS pre,
               MAX(CASE WHEN sec >= cut THEN 1 ELSE 0 END) AS post
        FROM base, thr GROUP BY user_id
    ),
    cnt AS (
        SELECT COUNT(*) AS n_users,
               SUM(CASE WHEN pre = 1 AND post = 1 THEN 1 ELSE 0 END) AS n_both,
               SUM(CASE WHEN pre = 1 AND post = 0 THEN 1 ELSE 0 END) AS b,
               SUM(CASE WHEN pre = 0 AND post = 1 THEN 1 ELSE 0 END) AS c
        FROM per_user
    )
    SELECT CAST(n_users AS BIGINT) AS n_users,
           CAST(n_both AS BIGINT) AS n_both,
           CAST(b AS BIGINT) AS n_pre_only,
           CAST(c AS BIGINT) AS n_post_only,
           ROUND(COALESCE({_MCN_STAT}, 0.0), 6) AS mcnemar_stat,
           CAST(COALESCE({_MCN_STAT}, 0.0) > 3.841459 AS INT) AS is_significant
    FROM cnt
    """,
)
def stat_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test for paired binary outcomes: per user, did they
    purchase in the first half of the observed window vs the second half
    (cut at the midpoint epoch second, same cut as `events_did_analysis`)?
    Only the discordant pairs carry information — the continuity-corrected
    statistic (|b−c|−1)²/(b+c) against χ²(1df) 3.841459 is the standard
    pre/post retention readout when each user is their own control.

    Scale posture: one scan → per-user 2-bit reduction (uniform user_id
    key, map-side combined) → one count row; the epoch cut is a broadcast
    1-row frame.  Integer counts everywhere until the final division."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select("user_id", F.unix_timestamp("ts").alias("sec"))
    )
    thr = ev.agg(
        F.floor((F.min("sec") + F.max("sec")) / 2.0).cast("bigint").alias("cut")
    )
    per_user = (
        ev.crossJoin(F.broadcast(thr))
        .groupBy("user_id")
        .agg(
            F.max(F.expr("CASE WHEN sec <  cut THEN 1 ELSE 0 END")).alias("pre"),
            F.max(F.expr("CASE WHEN sec >= cut THEN 1 ELSE 0 END")).alias("post"),
        )
    )
    cnt = per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(F.expr("CASE WHEN pre = 1 AND post = 1 THEN 1 ELSE 0 END")).alias(
            "n_both"
        ),
        F.sum(F.expr("CASE WHEN pre = 1 AND post = 0 THEN 1 ELSE 0 END")).alias("b"),
        F.sum(F.expr("CASE WHEN pre = 0 AND post = 1 THEN 1 ELSE 0 END")).alias("c"),
    )
    return cnt.selectExpr(
        "CAST(n_users AS BIGINT) AS n_users",
        "CAST(n_both AS BIGINT) AS n_both",
        "CAST(b AS BIGINT) AS n_pre_only",
        "CAST(c AS BIGINT) AS n_post_only",
        f"ROUND(COALESCE({_MCN_STAT}, 0.0), 6) AS mcnemar_stat",
        f"CAST(COALESCE({_MCN_STAT}, 0.0) > 3.841459 AS INT) AS is_significant",
    )


_CA_PBAR = "(CAST(r AS DOUBLE) / n)"
_CA_NUM = f"(t1 - {_CA_PBAR} * t2)"
_CA_VAR = f"({_CA_PBAR} * (1.0 - {_CA_PBAR}) * (t3 - (t2 * t2) / n))"
_CA_Z = f"({_CA_NUM} / NULLIF(sqrt({_CA_VAR}), 0.0))"


@register(
    "stat_cochran_armitage",
    oracle=f"""
    WITH obs AS (
        SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS s,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(y) AS BIGINT) AS r,
               CAST(SUM(s * y) AS DOUBLE) AS t1,
               CAST(SUM(s) AS DOUBLE) AS t2,
               CAST(SUM(s * s) AS DOUBLE) AS t3
        FROM obs
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           r AS n_final,
           ROUND({_CA_PBAR}, 6) AS p_pool,
           ROUND({_CA_Z}, 6) AS z_trend,
           CAST(ABS({_CA_Z}) > 1.959964 AS INT) AS is_significant
    FROM agg
    """,
)
def stat_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage trend test: does the proportion of finalized
    ('F') orders trend monotonically with order priority (scores 1..5
    from the priority label's leading digit)?  The ordered-groups
    refinement of `stat_chisq_independence` — a dose-response check that
    one degree of freedom makes far more powerful than the omnibus χ².

    All five sufficient statistics (N, R, Σsy, Σs, Σs²) are exact integer
    sums computed in ONE map-side-combined pass with no group stage at
    all; the z algebra is a shared expression string over engine-identical
    doubles.  Scale cost: one scan, one row out."""
    o = load_table(spark, sf_dir, "orders")
    obs = o.filter(
        F.col("o_orderpriority").isNotNull() & F.col("o_orderstatus").isNotNull()
    ).selectExpr(
        "CAST(substr(o_orderpriority, 1, 1) AS INT) AS s",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y",
    )
    agg = obs.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("y").cast("bigint").alias("r"),
        F.sum(F.col("s") * F.col("y")).cast("double").alias("t1"),
        F.sum("s").cast("double").alias("t2"),
        F.sum(F.col("s") * F.col("s")).cast("double").alias("t3"),
    )
    return agg.selectExpr(
        "CAST(n AS BIGINT) AS n_orders",
        "r AS n_final",
        f"ROUND({_CA_PBAR}, 6) AS p_pool",
        f"ROUND({_CA_Z}, 6) AS z_trend",
        f"CAST(ABS({_CA_Z}) > 1.959964 AS INT) AS is_significant",
    )


_WOE_GS = "((np + 0.5) / (tp + 5.0))"
_WOE_BS = "((nn + 0.5) / (tn + 5.0))"
_WOE = f"ln({_WOE_GS} / {_WOE_BS})"
_WOE_IVC = f"(({_WOE_GS} - {_WOE_BS}) * {_WOE})"


@register(
    "feature_woe_iv",
    oracle=f"""
    WITH obs AS (
        SELECT LEAST(CAST(FLOOR(l_extendedprice / 11000.0) AS INT), 9) AS bin,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL
    ),
    per_bin AS (
        SELECT bin, COUNT(*) AS n,
               SUM(pos) AS np, COUNT(*) - SUM(pos) AS nn
        FROM obs GROUP BY bin
    ),
    tot AS (
        SELECT CAST(SUM(np) AS DOUBLE) AS tp, CAST(SUM(nn) AS DOUBLE) AS tn
        FROM per_bin
    ),
    scored AS (
        SELECT bin, n, np, nn,
               ROUND({_WOE}, 6) AS woe,
               ROUND({_WOE_IVC}, 9) AS ivc
        FROM per_bin, tot
    )
    SELECT bin, CAST(n AS BIGINT) AS n_rows,
           CAST(np AS BIGINT) AS n_pos,
           CAST(nn AS BIGINT) AS n_neg,
           woe,
           ROUND(ivc, 6) AS iv_contrib,
           ROUND(SUM(ivc) OVER (), 6) AS iv_total
    FROM scored
    """,
)
def feature_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence / Information-Value screening of extended price
    against the 'R' return flag: fixed-width price bands (11k-wide, top
    band open) get ln(event-share / non-event-share) with 0.5 Laplace
    smoothing, and the IV sums the share-gap-weighted WoE — the standard
    credit-scoring feature-screening readout (IV > 0.02 = informative).

    Bands are VALUE-based, not rank-based, deliberately: a rank binning
    (NTILE over a global sort) needs a total order over the table — a
    single-reducer sort at 100 TB — while fixed bands are a pure map-side
    expression feeding one bin-keyed aggregation.  IV contributions are
    9-rounded BEFORE the window sum, so the total is a sum of exact
    1e-9 multiples — addition-order-independent across engines.  The
    window runs over |bins| = 10 rows."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    obs = li.filter(
        F.col("l_extendedprice").isNotNull() & F.col("l_returnflag").isNotNull()
    ).selectExpr(
        "LEAST(CAST(FLOOR(l_extendedprice / 11000.0) AS INT), 9) AS bin",
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos",
    )
    per_bin = obs.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.sum("pos").alias("np"),
        (F.count("*") - F.sum("pos")).alias("nn"),
    )
    tot = per_bin.agg(
        F.sum("np").cast("double").alias("tp"),
        F.sum("nn").cast("double").alias("tn"),
    )
    scored = per_bin.crossJoin(F.broadcast(tot)).selectExpr(
        "bin",
        "n",
        "np",
        "nn",
        f"ROUND({_WOE}, 6) AS woe",
        f"ROUND({_WOE_IVC}, 9) AS ivc",
    )
    return scored.select(
        "bin",
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("np").cast("bigint").alias("n_pos"),
        F.col("nn").cast("bigint").alias("n_neg"),
        "woe",
        F.round("ivc", 6).alias("iv_contrib"),
        F.round(F.sum("ivc").over(Window.partitionBy()), 6).alias("iv_total"),
    )


# Q = 12/(k(k+1)) · ΣRsum²/n − 3n(k+1), with srq = ΣRsum²/n precomputed
# (NULLIF keeps the empty-input reduce NULL instead of dividing by zero)
_FR_QSTAT = (
    "((12.0 / NULLIF(k * (k + 1.0), 0.0)) * srq - 3.0 * n_blocks * (k + 1.0))"
)


@register(
    "stat_friedman_test",
    oracle=f"""
    WITH cells AS (
        SELECT CAST(EXTRACT(month FROM o_orderdate) AS INT) AS blk,
               o_orderpriority AS trt,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE)
                     / COUNT(*), 6) AS v
        FROM orders
        WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
          AND o_totalprice IS NOT NULL
        GROUP BY 1, 2
    ),
    rk AS (
        SELECT blk, trt,
               CAST(ROW_NUMBER() OVER (PARTITION BY blk ORDER BY v ASC, trt ASC)
                    AS DOUBLE) AS r
        FROM cells
    ),
    per_trt AS (
        SELECT trt, CAST(COUNT(*) AS DOUBLE) AS n_blocks, SUM(r) AS rsum
        FROM rk GROUP BY trt
    ),
    tot AS (
        SELECT CAST(MAX(n_blocks) AS DOUBLE) AS n_blocks,
               CAST(COUNT(*) AS DOUBLE) AS k,
               SUM(rsum * rsum) / MAX(n_blocks) AS srq
        FROM per_trt
    )
    SELECT CAST(n_blocks AS BIGINT) AS n_blocks,
           CAST(k AS BIGINT) AS n_treatments,
           ROUND({_FR_QSTAT}, 6) AS q_stat,
           CAST({_FR_QSTAT} > 9.487729 AS INT) AS is_significant
    FROM tot
    """,
)
def stat_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test: do the five order priorities differ in mean
    order value CONSISTENTLY across months?  Blocks = order months (the
    repeated measure), treatments = priorities; each month ranks its five
    priority means and Q = 12n/(k(k+1))·Σ_j R_j²/n − 3n(k+1) compares the
    rank sums against χ²(k−1) (crit 9.487729 at k=5, α=0.05) — the
    nonparametric repeated-measures ANOVA that `stat_anova_oneway`'s
    independence assumption can't cover.

    Cell means ride exact DECIMAL sums and are 6-rounded BEFORE ranking,
    so the rank assignment (value, then treatment tie-break) is identical
    across engines; continuous means make true rank ties measure-zero.
    Scale posture: one scan → |months × priorities| cells; every window
    runs on ≤ k rows per block."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    cells = (
        o.filter(
            F.col("o_orderdate").isNotNull()
            & F.col("o_orderpriority").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .groupBy(
            F.month("o_orderdate").cast("int").alias("blk"),
            F.col("o_orderpriority").alias("trt"),
        )
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(24,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("v")
        )
    )
    w = Window.partitionBy("blk").orderBy(F.asc("v"), F.asc("trt"))
    rk = cells.select(
        "blk", "trt", F.row_number().over(w).cast("double").alias("r")
    )
    per_trt = rk.groupBy("trt").agg(
        F.count("*").cast("double").alias("n_blocks"), F.sum("r").alias("rsum")
    )
    tot = per_trt.agg(
        F.max("n_blocks").cast("double").alias("n_blocks"),
        F.count("*").cast("double").alias("k"),
        (F.sum(F.col("rsum") * F.col("rsum")) / F.max("n_blocks")).alias("srq"),
    )
    return tot.selectExpr(
        "CAST(n_blocks AS BIGINT) AS n_blocks",
        "CAST(k AS BIGINT) AS n_treatments",
        f"ROUND({_FR_QSTAT}, 6) AS q_stat",
        f"CAST({_FR_QSTAT} > 9.487729 AS INT) AS is_significant",
    )


_BT_S2 = "((sxx - (sx * sx) / n) / (n - 1.0))"
_BT_T = (
    "(((nn - k) * LN(ssw / (nn - k)) - sum_ln)"
    " / (1.0 + (sum_inv - 1.0 / (nn - k)) / (3.0 * (k - 1.0))))"
)


@register(
    "stat_bartlett_test",
    oracle=f"""
    WITH per AS (
        SELECT o_orderpriority AS grp, CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,12)))
                    AS DOUBLE) AS sxx
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
        GROUP BY o_orderpriority
    ),
    red AS (
        SELECT SUM(n) AS nn, CAST(COUNT(*) AS DOUBLE) AS k,
               SUM((n - 1.0) * {_BT_S2}) AS ssw,
               SUM((n - 1.0) * LN({_BT_S2})) AS sum_ln,
               SUM(1.0 / (n - 1.0)) AS sum_inv
        FROM per
    )
    SELECT CAST(nn AS BIGINT) AS n_orders,
           CAST(k AS BIGINT) AS n_groups,
           ROUND(ssw / (nn - k), 6) AS pooled_var,
           ROUND({_BT_T}, 6) AS t_stat,
           CAST({_BT_T} > 9.487729 AS INT) AS is_significant
    FROM red
    """,
)
def stat_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test of variance homogeneity for order value across the
    five priorities — the parametric partner of
    `stat_levene_brown_forsythe` (Bartlett is the more powerful test when
    normality holds; Levene is the robust fallback), and the assumption
    check that should precede `stat_anova_oneway`.  Compares against
    χ²(k−1 = 4) at 9.487729.

    One map-side-combined pass yields exact DECIMAL sufficient statistics
    per group; the k-row reduce and the correction-factor algebra are
    shared expression strings over engine-identical doubles.  Scale cost:
    one scan, five groups, one row."""
    o = load_table(spark, sf_dir, "orders")
    per = (
        o.filter(
            F.col("o_orderpriority").isNotNull() & F.col("o_totalprice").isNotNull()
        )
        .groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(24,6)"))
            .cast("double")
            .alias("sx"),
            F.sum(
                (F.col("o_totalprice") * F.col("o_totalprice")).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("sxx"),
        )
    )
    red = per.agg(
        F.sum("n").alias("nn"),
        F.count("*").cast("double").alias("k"),
        F.sum(F.expr(f"(n - 1.0) * {_BT_S2}")).alias("ssw"),
        F.sum(F.expr(f"(n - 1.0) * LN({_BT_S2})")).alias("sum_ln"),
        F.sum(F.expr("1.0 / (n - 1.0)")).alias("sum_inv"),
    )
    return red.selectExpr(
        "CAST(nn AS BIGINT) AS n_orders",
        "CAST(k AS BIGINT) AS n_groups",
        "ROUND(ssw / (nn - k), 6) AS pooled_var",
        f"ROUND({_BT_T}, 6) AS t_stat",
        f"CAST({_BT_T} > 9.487729 AS INT) AS is_significant",
    )


_ES_SP = (
    "sqrt((((n1 - 1.0) * " + _WT_V1 + ") + ((n2 - 1.0) * " + _WT_V2 + "))"
    " / (n1 + n2 - 2.0))"
)
_ES_D = f"(({_WT_M1} - {_WT_M2}) / NULLIF({_ES_SP}, 0.0))"
_ES_J = "(1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))"
_ES_GLASS = f"(({_WT_M1} - {_WT_M2}) / NULLIF(sqrt({_WT_V2}), 0.0))"


@register(
    "stat_effect_sizes_report",
    oracle=f"""
    WITH obs AS (
        SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 0 ELSE 1 END AS grp,
               o_totalprice AS v
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
          AND o_totalprice IS NOT NULL
    ),
    per AS (
        SELECT grp, CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(v AS DECIMAL(24,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS sxx
        FROM obs GROUP BY grp
    ),
    piv AS (
        SELECT MAX(CASE WHEN grp = 0 THEN n END) AS n1,
               MAX(CASE WHEN grp = 0 THEN sx END) AS sx1,
               MAX(CASE WHEN grp = 0 THEN sxx END) AS sxx1,
               MAX(CASE WHEN grp = 1 THEN n END) AS n2,
               MAX(CASE WHEN grp = 1 THEN sx END) AS sx2,
               MAX(CASE WHEN grp = 1 THEN sxx END) AS sxx2
        FROM per
    )
    SELECT CAST(n1 AS BIGINT) AS n_building,
           CAST(n2 AS BIGINT) AS n_machinery,
           ROUND({_WT_M1} - {_WT_M2}, 6) AS mean_diff,
           ROUND({_ES_SP}, 6) AS pooled_sd,
           ROUND({_ES_D}, 6) AS cohens_d,
           ROUND({_ES_J} * {_ES_D}, 6) AS hedges_g,
           ROUND({_ES_GLASS}, 6) AS glass_delta
    FROM piv
    """,
)
def stat_effect_sizes_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect sizes for the BUILDING-vs-MACHINERY order-value
    comparison — the MAGNITUDE report that must accompany
    `stat_welch_ttest`'s significance verdict (with these sample sizes
    everything is 'significant'; d/g/Δ say whether anyone should care):
    Cohen's d on the pooled SD, Hedges' g (the small-sample J correction),
    and Glass's Δ (control-group SD — MACHINERY as control), all from the
    same exact-DECIMAL sufficient statistics and shared expression strings
    as the Welch pivot.  Scale cost: one scan, two groups, one row."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    obs = (
        o.join(c, o.o_custkey == c.c_custkey)
        .filter(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            & F.col("o_totalprice").isNotNull()
        )
        .selectExpr(
            "CASE WHEN c_mktsegment = 'BUILDING' THEN 0 ELSE 1 END AS grp",
            "o_totalprice AS v",
        )
    )
    per = obs.groupBy("grp").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("v").cast("decimal(24,6)")).cast("double").alias("sx"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxx"),
    )
    piv = per.agg(
        *[
            F.max(F.when(F.col("grp") == g, F.col(col))).alias(f"{col}{g + 1}")
            for g in (0, 1)
            for col in ("n", "sx", "sxx")
        ]
    )
    return piv.selectExpr(
        "CAST(n1 AS BIGINT) AS n_building",
        "CAST(n2 AS BIGINT) AS n_machinery",
        f"ROUND({_WT_M1} - {_WT_M2}, 6) AS mean_diff",
        f"ROUND({_ES_SP}, 6) AS pooled_sd",
        f"ROUND({_ES_D}, 6) AS cohens_d",
        f"ROUND({_ES_J} * {_ES_D}, 6) AS hedges_g",
        f"ROUND({_ES_GLASS}, 6) AS glass_delta",
    )


# Unbiased pass@k (Chen et al. 2021, Codex): 1 − C(n−c,k)/C(n,k), with the
# binomial ratio unrolled to k=5 double factors so the identical expression
# runs in both engines; the n−c<k branch is the C(n−c,k)=0 case.
_PK_K = 5
_PK_FAIL = " * ".join(
    f"((CAST(n - c AS DOUBLE) - {i}) / (CAST(n AS DOUBLE) - {i}))"
    for i in range(_PK_K)
)
_PK_PASS = f"(CASE WHEN n - c < {_PK_K} THEN 1.0 ELSE 1.0 - ({_PK_FAIL}) END)"


@register(
    "eval_pass_at_k",
    oracle=f"""
    WITH per AS (
        SELECT o_custkey,
               COUNT(*) AS n,
               SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS c
        FROM orders
        WHERE o_custkey IS NOT NULL AND o_orderstatus IS NOT NULL
        GROUP BY o_custkey
        HAVING COUNT(*) >= {_PK_K}
    ),
    scored AS (
        SELECT CAST(CAST(c AS DOUBLE) / n AS DECIMAL(18,12)) AS p1,
               CAST({_PK_PASS} AS DECIMAL(18,12)) AS pk
        FROM per
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_problems,
           ROUND(CAST(SUM(p1) AS DOUBLE) / COUNT(*), 6) AS avg_pass_at_1,
           ROUND(CAST(SUM(pk) AS DOUBLE) / COUNT(*), 6) AS avg_pass_at_5
    FROM scored
    """,
)
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unbiased pass@k estimator (Chen et al. 2021) — THE
    code-generation eval metric: per problem with n samples and c
    successes, pass@k = 1 − C(n−c,k)/C(n,k), averaged over problems.
    Customers stand in for problems (orders = attempts, status 'F' =
    success, k = 5; problems with fewer than k attempts are excluded, as
    the estimator requires).  The binomial ratio is unrolled to five
    shared-expression factors — no factorials, no overflow — and each
    problem's estimate is DECIMAL(18,12)-quantized before the average, so
    the mean is addition-order-free and bit-identical cross-engine.

    Scale posture: one count aggregate on the uniform problem key, a
    per-row closed form, one global reduce — the eval over a billion
    sampled generations is exactly this shape."""
    o = load_table(spark, sf_dir, "orders")
    per = (
        o.filter(F.col("o_custkey").isNotNull() & F.col("o_orderstatus").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END")).alias(
                "c"
            ),
        )
        .filter(F.col("n") >= _PK_K)
    )
    scored = per.selectExpr(
        "CAST(CAST(c AS DOUBLE) / n AS DECIMAL(18,12)) AS p1",
        f"CAST({_PK_PASS} AS DECIMAL(18,12)) AS pk",
    )
    return scored.agg(
        F.count("*").cast("bigint").alias("n_problems"),
        F.round(F.sum("p1").cast("double") / F.count("*"), 6).alias("avg_pass_at_1"),
        F.round(F.sum("pk").cast("double") / F.count("*"), 6).alias("avg_pass_at_5"),
    )


@register(
    "forecast_mase_backtest",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS y
        FROM orders
        WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        GROUP BY CAST(o_orderdate AS DATE)
    ),
    idx AS (
        SELECT day, y,
               ROW_NUMBER() OVER (ORDER BY day) AS rn,
               COUNT(*) OVER () AS nd
        FROM daily
    ),
    marked AS (
        SELECT day, y, rn, CASE WHEN rn * 5 <= nd * 4 THEN 1 ELSE 0 END AS is_train
        FROM idx
    ),
    scale AS (
        SELECT AVG(ABS(a.y - b.y)) AS s
        FROM marked a JOIN marked b ON b.day = a.day - 7
        WHERE a.is_train = 1 AND b.is_train = 1
    ),
    tr AS (SELECT AVG(y) AS mu FROM marked WHERE is_train = 1),
    sn AS (
        SELECT AVG(ABS(a.y - b.y)) AS mae, COUNT(*) AS n_test
        FROM marked a JOIN marked b ON b.day = a.day - 7
        WHERE a.is_train = 0
    ),
    gm AS (
        SELECT AVG(ABS(a.y - tr.mu)) AS mae, COUNT(*) AS n_test
        FROM marked a, tr WHERE a.is_train = 0
    )
    SELECT 'seasonal_naive_7d' AS method,
           CAST(sn.n_test AS BIGINT) AS n_test,
           ROUND(sn.mae, 6) AS mae,
           ROUND(sn.mae / scale.s, 6) AS mase
    FROM sn, scale
    UNION ALL
    SELECT 'train_mean', CAST(gm.n_test AS BIGINT), ROUND(gm.mae, 6),
           ROUND(gm.mae / scale.s, 6)
    FROM gm, scale
    """,
)
def forecast_mase_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE backtest (Hyndman & Koehler 2006) of two forecasters on daily
    revenue: seasonal-naive (predict the value 7 days earlier) and the
    train-mean baseline, scored on the last 20% of days against the
    scale-free MASE denominator — the in-sample mean absolute 7-day
    seasonal difference.  MASE < 1 beats the naive scale; it is THE
    cross-series-comparable forecast error, completing the forecast shelf
    next to `forecast_pinball_loss`'s quantile loss.

    The 80/20 split is positional on the ordered day spine (rn·5 ≤ nd·4 —
    integer arithmetic, no float threshold); forecasts join calendar
    day−7, so test days without a 7-day-back observation are excluded
    identically in both engines.  Daily sums ride DECIMAL; the three MAE
    reduces are day-count-sized.  Scale posture: one scan to the daily
    grain, then everything is O(days)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.filter(F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull())
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(24,6)"))
            .cast("double")
            .alias("y")
        )
    )
    idx = daily.select(
        "day",
        "y",
        F.row_number().over(Window.orderBy("day")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("nd"),
    )
    marked = idx.select(
        "day", "y", (F.col("rn") * 5 <= F.col("nd") * 4).cast("int").alias("is_train")
    ).persist()
    lag7 = marked.selectExpr("day AS bday", "y AS by")
    pairs = marked.join(lag7, F.expr("bday = day - INTERVAL '7' DAY"))
    scale = (
        pairs.filter("is_train = 1 AND by IS NOT NULL")
        .agg(F.avg(F.abs(F.col("y") - F.col("by"))).alias("s"))
    )
    sn = pairs.filter("is_train = 0").agg(
        F.avg(F.abs(F.col("y") - F.col("by"))).alias("mae"),
        F.count("*").alias("n_test"),
    )
    tr = marked.filter("is_train = 1").agg(F.avg("y").alias("mu"))
    gm = (
        marked.filter("is_train = 0")
        .crossJoin(F.broadcast(tr))
        .agg(
            F.avg(F.abs(F.col("y") - F.col("mu"))).alias("mae"),
            F.count("*").alias("n_test"),
        )
    )
    out_sn = sn.crossJoin(F.broadcast(scale)).select(
        F.lit("seasonal_naive_7d").alias("method"),
        F.col("n_test").cast("bigint").alias("n_test"),
        F.round("mae", 6).alias("mae"),
        F.round(F.col("mae") / F.col("s"), 6).alias("mase"),
    )
    out_gm = gm.crossJoin(F.broadcast(scale)).select(
        F.lit("train_mean").alias("method"),
        F.col("n_test").cast("bigint").alias("n_test"),
        F.round("mae", 6).alias("mae"),
        F.round(F.col("mae") / F.col("s"), 6).alias("mase"),
    )
    return out_sn.unionByName(out_gm)


# SPRT constants: H0 p=0.18 vs H1 p=0.22 urgent-order share, alpha=beta=0.05
# explicit DOUBLE casts: a bare 0.22/0.18 is DECIMAL division in DuckDB
# (scale-limited quotient), which would skew every LLR term
_SPRT_W1 = "LN(CAST(0.22 AS DOUBLE) / CAST(0.18 AS DOUBLE))"
_SPRT_W0 = "LN(CAST(0.78 AS DOUBLE) / CAST(0.82 AS DOUBLE))"
_SPRT_A = "LN(19.0)"  # accept H1 at/above
_SPRT_B = "LN(1.0 / 19.0)"  # accept H0 at/below


@register(
    "stat_sprt_sequential",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               COUNT(*) AS n,
               SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS u
        FROM orders
        WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
        GROUP BY CAST(o_orderdate AS DATE)
    ),
    cum AS (
        SELECT day, n, u,
               SUM(u * ({_SPRT_W1}) + (n - u) * ({_SPRT_W0}))
                   OVER (ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS llr
        FROM daily
    ),
    hit AS (
        SELECT MIN(day) AS dday
        FROM cum WHERE llr >= ({_SPRT_A}) OR llr <= ({_SPRT_B})
    ),
    fin AS (
        SELECT (SELECT COUNT(*) FROM cum) AS n_days,
               (SELECT llr FROM cum ORDER BY day DESC LIMIT 1) AS llr_final,
               h.dday,
               (SELECT llr FROM cum WHERE day = h.dday) AS llr_at
        FROM hit h
    )
    SELECT CAST(n_days AS BIGINT) AS n_days,
           CASE WHEN dday IS NULL THEN 'continue'
                WHEN llr_at >= ({_SPRT_A}) THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           dday AS decision_day,
           ROUND(llr_at, 6) AS llr_at_decision,
           ROUND(llr_final, 6) AS llr_final
    FROM fin
    """,
)
def stat_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's Sequential Probability Ratio Test replayed over the order
    calendar: is the urgent-order share 0.18 (H0) or 0.22 (H1)?  Each
    day's counts add u·ln(p1/p0) + (n−u)·ln(q1/q0) to the running
    log-likelihood ratio; the test stops the FIRST day the LLR crosses
    ln 19 (accept H1) or −ln 19 (accept H0) at α = β = 0.05 — the
    always-valid sequential monitoring every experiment dashboard needs
    instead of fixed-horizon peeking.  Output: total days, the decision,
    the decision day, and the LLR at decision and at end-of-data.

    Determinism: daily terms are integer counts times two shared ln
    constants; the cumulative window accumulates in day order on both
    engines, so every prefix LLR is bit-identical.  Scale posture: one
    scan to the daily grain; everything after is O(days) with one ordered
    window."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.filter(
            F.col("o_orderdate").isNotNull() & F.col("o_orderpriority").isNotNull()
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.expr("CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END")
            ).alias("u"),
        )
    )
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = daily.select(
        "day",
        F.sum(F.expr(f"u * ({_SPRT_W1}) + (n - u) * ({_SPRT_W0})"))
        .over(w_cum)
        .alias("llr"),
    ).persist()
    hit = cum.filter(
        F.expr(f"llr >= ({_SPRT_A}) OR llr <= ({_SPRT_B})")
    ).agg(F.min("day").alias("dday"))
    n_days = cum.agg(F.count("*").alias("n_days"))
    llr_final = cum.orderBy(F.desc("day")).limit(1).select(
        F.col("llr").alias("llr_final")
    )
    at = (
        hit.join(cum, F.col("day") == F.col("dday"), "left")
        .select("dday", F.col("llr").alias("llr_at"))
    )
    return (
        n_days.crossJoin(F.broadcast(llr_final))
        .crossJoin(F.broadcast(at))
        .selectExpr(
            "CAST(n_days AS BIGINT) AS n_days",
            f"CASE WHEN dday IS NULL THEN 'continue'"
            f" WHEN llr_at >= ({_SPRT_A}) THEN 'accept_h1'"
            f" ELSE 'accept_h0' END AS decision",
            "dday AS decision_day",
            "ROUND(llr_at, 6) AS llr_at_decision",
            "ROUND(llr_final, 6) AS llr_final",
        )
    )


# two-sided alpha = 0.05 and power = 0.80: z_{0.975} and z_{0.80}
_PW_ZA = "1.959964"
_PW_ZB = "0.841621"


@register(
    "stat_power_mde_report",
    oracle=f"""
    WITH obs AS (
        SELECT user_id % 2 AS arm,
               CAST(ROUND(value, 6) AS DECIMAL(24,6)) AS v
        FROM events
        WHERE event_type = 'purchase' AND value IS NOT NULL
          AND user_id IS NOT NULL
    ),
    per AS (
        SELECT arm, CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(v) AS DOUBLE) AS sx,
               CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS sxx
        FROM obs GROUP BY arm
    ),
    piv AS (
        SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n1,
               MAX(CASE WHEN arm = 1 THEN n END) AS n2,
               MAX(CASE WHEN arm = 0 THEN (sxx - sx * sx / n) / (n - 1.0) END)
                   AS v1,
               MAX(CASE WHEN arm = 1 THEN (sxx - sx * sx / n) / (n - 1.0) END)
                   AS v2,
               MAX(CASE WHEN arm = 0 THEN sx / n END) AS m1
        FROM per
    )
    SELECT CAST(n1 AS BIGINT) AS n_control,
           CAST(n2 AS BIGINT) AS n_treat,
           ROUND(sqrt(v1 / n1 + v2 / n2), 6) AS se,
           ROUND(({_PW_ZA} + {_PW_ZB}) * sqrt(v1 / n1 + v2 / n2), 6)
               AS mde_abs,
           ROUND(({_PW_ZA} + {_PW_ZB}) * sqrt(v1 / n1 + v2 / n2) / m1, 6)
               AS mde_rel,
           ROUND(2.0 * ({_PW_ZA} + {_PW_ZB}) * ({_PW_ZA} + {_PW_ZB})
                 * ((v1 + v2) / 2.0)
                 / (0.05 * m1 * 0.05 * m1), 2) AS n_per_arm_for_5pct
    FROM piv
    """,
)
def stat_power_mde_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power planning from the data itself: with the current
    even/odd-user split of purchase values (the `events_did_analysis`
    cohorts), what's the minimum detectable effect at α = 0.05 two-sided
    and 80% power — absolute, and relative to the control mean — and how
    many users per arm would a 5%-lift experiment need
    (n = 2(z_α+z_β)²·σ̄²/Δ²)?  This is the sizing table every launch
    review asks for BEFORE the A/B test `ab_test_conversion` evaluates
    after the fact.

    Sufficient statistics ride the exact-DECIMAL pattern of the Welch
    family; the z constants are shared literals.  Scale cost: one scan,
    two arms, one row."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select(
            (F.col("user_id") % 2).alias("arm"),
            F.round("value", 6).cast("decimal(24,6)").alias("v"),
        )
    )
    per = ev.groupBy("arm").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("v").cast("double").alias("sx"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxx"),
    )
    piv = per.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n2"),
        F.max(
            F.when(F.col("arm") == 0, F.expr("(sxx - sx * sx / n) / (n - 1.0)"))
        ).alias("v1"),
        F.max(
            F.when(F.col("arm") == 1, F.expr("(sxx - sx * sx / n) / (n - 1.0)"))
        ).alias("v2"),
        F.max(F.when(F.col("arm") == 0, F.expr("sx / n"))).alias("m1"),
    )
    return piv.selectExpr(
        "CAST(n1 AS BIGINT) AS n_control",
        "CAST(n2 AS BIGINT) AS n_treat",
        "ROUND(sqrt(v1 / n1 + v2 / n2), 6) AS se",
        f"ROUND(({_PW_ZA} + {_PW_ZB}) * sqrt(v1 / n1 + v2 / n2), 6) AS mde_abs",
        f"ROUND(({_PW_ZA} + {_PW_ZB}) * sqrt(v1 / n1 + v2 / n2) / m1, 6)"
        " AS mde_rel",
        f"ROUND(2.0 * ({_PW_ZA} + {_PW_ZB}) * ({_PW_ZA} + {_PW_ZB})"
        " * ((v1 + v2) / 2.0) / (0.05 * m1 * 0.05 * m1), 2)"
        " AS n_per_arm_for_5pct",
    )


# --- Ridge regression (r8): L2-regularized normal equations -------------------
#
# (X'X + λI')β = X'y with the intercept unpenalized (the standard form): the
# 3×3 system matrix is the OLS one with λ added to the two feature-diagonal
# entries — textually, every s11/s22 occurrence in the Cramer determinants
# IS a system-matrix entry (the data vector contributes s1y/s2y/sy only), so
# the ridge determinants are a pure string substitution on _LR_DETS, shared
# verbatim by both engines like everything else in this family.
_RIDGE_LAMBDA = "100.0"
_RIDGE_DETS = {
    k: v.replace("s11", f"(s11 + {_RIDGE_LAMBDA})").replace(
        "s22", f"(s22 + {_RIDGE_LAMBDA})"
    )
    for k, v in _LR_DETS.items()
}
_RIDGE_BETAS = {
    "b0": f"(({_RIDGE_DETS['det0']}) / ({_RIDGE_DETS['det']}))",
    "b1": f"(({_RIDGE_DETS['det1']}) / ({_RIDGE_DETS['det']}))",
    "b2": f"(({_RIDGE_DETS['det2']}) / ({_RIDGE_DETS['det']}))",
}
# Ridge R² (r9 fix, ADVICE r8): the OLS shortcut SSE = syy - β'X'y is
# invalid under an L2 penalty — ridge residuals are not orthogonal to X
# (X'e = λI'β), so β'X'Xβ = β'X'y - λ(b1²+b2²) and the true
# SSE = syy - β'X'y - λ(b1²+b2²).  Shared expression string, both engines.
_RIDGE_R2 = (
    f"1 - (syy - ({_RIDGE_BETAS['b0']}*sy + {_RIDGE_BETAS['b1']}*s1y"
    f" + {_RIDGE_BETAS['b2']}*s2y)"
    f" - {_RIDGE_LAMBDA} * ({_RIDGE_BETAS['b1']}*{_RIDGE_BETAS['b1']}"
    f" + {_RIDGE_BETAS['b2']}*{_RIDGE_BETAS['b2']})) / (syy - sy*sy/n)"
)


@register(
    "linreg_ridge",
    oracle=f"""
    WITH obs AS (
        SELECT l_quantity AS x1, l_discount AS x2, l_extendedprice AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
          AND l_extendedprice IS NOT NULL
    ),
    stats AS (SELECT {_LR_SUMS} FROM obs)
    SELECT CAST(n AS BIGINT) AS n_obs,
           CAST({_RIDGE_LAMBDA} AS DOUBLE) AS ridge_lambda,
           ROUND({_RIDGE_BETAS['b0']}, 6) AS intercept,
           ROUND({_RIDGE_BETAS['b1']}, 6) AS coef_quantity,
           ROUND({_RIDGE_BETAS['b2']}, 6) AS coef_discount,
           ROUND({_RIDGE_R2}, 6) AS train_r2,
           ROUND(ABS({_LR_BETAS['b1']}) - ABS({_RIDGE_BETAS['b1']}), 6)
             AS shrinkage_quantity,
           ROUND(ABS({_LR_BETAS['b2']}) - ABS({_RIDGE_BETAS['b2']}), 6)
             AS shrinkage_discount
    FROM stats
    """,
)
def linreg_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge (L2-regularized) regression via the same one-pass sufficient
    statistics as ``linreg_normal_equations`` — the regularized fit a
    pipeline reaches for when OLS coefficients blow up on collinear
    features: (X'X + λI')β = X'y with the intercept unpenalized, λ = 100,
    solved by Cramer on the one-row moment frame.  Reports the ridge
    coefficients, train R², and per-feature |coef| shrinkage vs the OLS
    solution (both solves share the SAME ten exact moment sums, so the
    comparison costs nothing extra).

    r9 fixes: (a) ``train_r2`` now subtracts the λ(b1²+b2²) penalty term
    from the SSE identity (ADVICE r8 — ridge residuals are not orthogonal
    to X, so the OLS shortcut overstated SSE and understated R²); (b) the
    ``ridge_lambda`` output literal is CAST to DOUBLE on both sides — a
    bare ``100.0`` types as DECIMAL(4,1), which DuckDB's pandas path
    renders float64 while Spark returns Decimal, the exact dtype pair the
    r8 verdict proved the driver hash flags as a false red.

    Scale posture: identical to OLS — one map-side-combined aggregate of
    ten DECIMAL-exact moments; the solve is driver-free expression algebra
    on a 1-row frame.  Regularization changes the MODEL, not the plan."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_quantity").isNotNull()
            & F.col("l_discount").isNotNull()
            & F.col("l_extendedprice").isNotNull()
        )
        .selectExpr("l_quantity AS x1", "l_discount AS x2", "l_extendedprice AS y")
    )
    stats = li.groupBy().agg(
        *[F.expr(part.strip()) for part in _split_agg_exprs(_LR_SUMS)]
    )
    return stats.selectExpr(
        "CAST(n AS BIGINT) AS n_obs",
        f"CAST({_RIDGE_LAMBDA} AS DOUBLE) AS ridge_lambda",
        f"ROUND({_RIDGE_BETAS['b0']}, 6) AS intercept",
        f"ROUND({_RIDGE_BETAS['b1']}, 6) AS coef_quantity",
        f"ROUND({_RIDGE_BETAS['b2']}, 6) AS coef_discount",
        f"ROUND({_RIDGE_R2}, 6) AS train_r2",
        f"ROUND(ABS({_LR_BETAS['b1']}) - ABS({_RIDGE_BETAS['b1']}), 6)"
        " AS shrinkage_quantity",
        f"ROUND(ABS({_LR_BETAS['b2']}) - ABS({_RIDGE_BETAS['b2']}), 6)"
        " AS shrinkage_discount",
    )


# --- Dunn's post-hoc test (r8): which groups differ, after Kruskal-Wallis ----
#
# Shared z expression over the pooled-rank means: for groups a, b
#   z = (mean_rank_a - mean_rank_b)
#       / sqrt( (n(n+1)/12 - tiesum/(12(n-1))) * (1/n_a + 1/n_b) )
# (Dunn 1964 with the tie correction).  Bonferroni-adjusted two-sided
# critical value at family alpha 0.05 over C(5,2)=10 comparisons:
# z_{alpha/(2m)} = z_{0.0025} = 2.807034.
_DUNN_Z = (
    "((ma - mb) / sqrt(((((n * (n + 1.0)) / 12.0)"
    " - (tiesum / (12.0 * (n - 1.0))))) * ((1.0 / na) + (1.0 / nb))))"
)
_DUNN_ZCRIT = "2.807034"


@register(
    "stat_dunn_posthoc",
    oracle=f"""
    WITH obs AS (
        SELECT o_orderpriority AS grp, o_totalprice AS v
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
    ),
    pv AS (SELECT v, COUNT(*) AS t FROM obs GROUP BY v),
    rk AS (
        SELECT v, t,
               (CAST(SUM(t) OVER (ORDER BY v
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS DOUBLE)
                - t) + ((t + 1.0) / 2.0) AS r
        FROM pv
    ),
    gv AS (SELECT grp, v, COUNT(*) AS tg FROM obs GROUP BY grp, v),
    gr AS (
        SELECT g.grp,
               CAST(SUM(g.tg) AS DOUBLE) AS ng,
               CAST(SUM(CAST(g.tg * rk.r AS DECIMAL(38,1))) AS DOUBLE) AS rg
        FROM gv g JOIN rk ON rk.v = g.v
        GROUP BY g.grp
    ),
    tot AS (
        SELECT CAST(SUM(ng) AS DOUBLE) AS n,
               (SELECT CAST(SUM(t * t * t - t) AS DOUBLE) FROM pv) AS tiesum
        FROM gr
    ),
    pairs AS (
        SELECT a.grp AS grp_a, b.grp AS grp_b,
               a.ng AS na, b.ng AS nb,
               (a.rg / a.ng) AS ma, (b.rg / b.ng) AS mb,
               t.n AS n, t.tiesum AS tiesum
        FROM gr a JOIN gr b ON a.grp < b.grp, tot t
    )
    SELECT grp_a, grp_b,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           ROUND(ma, 6) AS mean_rank_a,
           ROUND(mb, 6) AS mean_rank_b,
           ROUND({_DUNN_Z}, 6) AS z,
           CAST(ABS(ROUND({_DUNN_Z}, 6)) > {_DUNN_ZCRIT} AS INT)
               AS reject_bonferroni
    FROM pairs
    """,
)
def stat_dunn_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc pairwise comparisons (Dunn 1964, tie-corrected) —
    the question a significant ``stat_kruskal_wallis`` H immediately
    raises: WHICH priorities differ?  One z per priority pair from the
    pooled-rank means, with the Bonferroni-adjusted decision at family
    alpha 0.05 over the C(5,2)=10 comparisons.

    Distributed shape: the pooled average ranks come from the r8 banded
    two-level cumulative (``_banded_cum`` — no single-partition frame),
    group rank-sums ride exact DECIMAL(38,1), and the pairwise stage is a
    self-join of the k-row group frame: O(k²) rows of driver-free algebra,
    constant in corpus size.  The z algebra is a shared expression string,
    bit-identical cross-engine; z is rounded to 6 places BEFORE the
    critical-value comparison so the reject bit is engine-portable."""
    obs = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderpriority").isNotNull() & F.col("o_totalprice").isNotNull()
        )
        .selectExpr("o_orderpriority AS grp", "o_totalprice AS v")
    )
    pv = obs.groupBy("v").agg(F.count("*").alias("t"))
    rk = _banded_cum(pv, "v", ("t",), band_width=10000.0).select(
        "v",
        "t",
        (
            (F.col("cum_t").cast("double") - F.col("t")) + (F.col("t") + 1.0) / 2.0
        ).alias("r"),
    )
    gv = obs.groupBy("grp", "v").agg(F.count("*").alias("tg"))
    # Persisted: the k-row group frame feeds BOTH self-join sides and the
    # totals — without reuse the whole rank pipeline evaluates three times
    # (same no-cross-DAG-dedup finding as _banded_cum / operators/dedup.py).
    gr = (
        gv.join(rk.select("v", "r"), "v")
        .groupBy("grp")
        .agg(
            F.sum("tg").cast("double").alias("ng"),
            F.sum(F.expr("CAST(tg * r AS DECIMAL(38,1))")).cast("double").alias("rg"),
        )
        .persist()
    )
    ties = pv.agg(F.sum(F.expr("t * t * t - t")).cast("double").alias("tiesum"))
    tot = gr.agg(F.sum("ng").alias("n")).crossJoin(F.broadcast(ties))
    a = gr.selectExpr("grp AS grp_a", "ng AS na", "(rg / ng) AS ma")
    b = gr.selectExpr("grp AS grp_b", "ng AS nb", "(rg / ng) AS mb")
    # broadcast the k-row side so the non-equi pair join plans the
    # allowlisted tiny-broadcast BNLJ, never a CartesianProduct
    pairs = (
        a.join(F.broadcast(b), F.col("grp_a") < F.col("grp_b"))
        .crossJoin(F.broadcast(tot))
    )
    return pairs.selectExpr(
        "grp_a",
        "grp_b",
        "CAST(na AS BIGINT) AS n_a",
        "CAST(nb AS BIGINT) AS n_b",
        "ROUND(ma, 6) AS mean_rank_a",
        "ROUND(mb, 6) AS mean_rank_b",
        f"ROUND({_DUNN_Z}, 6) AS z",
        f"CAST(ABS(ROUND({_DUNN_Z}, 6)) > {_DUNN_ZCRIT} AS INT)"
        " AS reject_bonferroni",
    )
