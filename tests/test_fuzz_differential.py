"""Differential query fuzzing (SQLancer-style, seeded and deterministic).

A small grammar generates 101 seeded queries across seven families — GROUP
BY / filter / HAVING, inner/left joins, window frames, distinct aggregates,
semi/anti joins (EXISTS / IN subqueries), set operations, and grouping
sets — over lineitem/orders; the SAME SQL text runs on Spark and DuckDB and
the results must agree row-for-row.  This catches whole classes of engine-integration mistakes the
hand-written oracles can't: type-coercion drift, null-handling divergence,
predicate/aggregate interactions nobody thought to enshrine in a named query.

Aggregates over doubles are rounded to 2 places inside the SQL (sum order
differs between engines; the values are ~1e8 with ~1e-8 float error, so 2
places is conservative by six orders of magnitude).
"""

from __future__ import annotations

import random

import pytest

from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import register_views
from tests.oracle import compare

GROUP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]
METRICS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
AGGS = ["SUM", "AVG", "MIN", "MAX"]
# Thresholds chosen inside each column's live range so predicates are
# selective but never empty at sf0.001.
PRED_RANGES = {
    "l_quantity": (5.0, 45.0),
    "l_extendedprice": (2000.0, 80000.0),
    "l_discount": (0.01, 0.09),
    "l_tax": (0.01, 0.07),
}


def gen_query(rng: random.Random) -> str:
    groups = rng.sample(GROUP_COLS, rng.randint(1, 2))
    metric = rng.choice(METRICS)
    agg = rng.choice(AGGS)
    pred_col = rng.choice(METRICS)
    lo, hi = PRED_RANGES[pred_col]
    thresh = round(rng.uniform(lo, hi), 4)
    op = rng.choice(["<", ">", "<=", ">="])
    date_pred = ""
    if rng.random() < 0.5:
        day = rng.randint(1, 28)
        month = rng.randint(1, 12)
        year = rng.choice([1993, 1994, 1995, 1996])
        date_op = rng.choice(["<", ">="])
        date_pred = f" AND l_shipdate {date_op} CAST('{year}-{month:02d}-{day:02d}' AS TIMESTAMP)"
    having = ""
    if rng.random() < 0.4:
        having = f" HAVING COUNT(*) >= {rng.randint(2, 20)}"
    gcols = ", ".join(groups)
    return (
        f"SELECT {gcols}, CAST(ROUND({agg}({metric}), 2) AS DOUBLE) AS agg_val, "
        f"COUNT(*) AS n "
        f"FROM lineitem WHERE {pred_col} {op} {thresh}{date_pred} "
        f"GROUP BY {gcols}{having}"
    )


@pytest.mark.parametrize("seed", range(25))
def test_fuzzed_query_agrees_with_duckdb(spark, sf_dir, seed):
    register_views(spark, sf_dir, ["lineitem"])
    sql = gen_query(random.Random(seed))
    compare(spark.sql(sql), sql, sf_dir, float_places=2)


JOIN_GROUPS = ["o_orderstatus", "o_orderpriority", "l_returnflag", "l_linestatus"]


def gen_join_query(rng: random.Random) -> str:
    """Join-shaped variant: orders x lineitem with mixed-side group keys,
    aggregates, and per-side predicates; occasionally LEFT JOIN so unmatched
    null semantics get fuzzed too."""
    groups = rng.sample(JOIN_GROUPS, rng.randint(1, 2))
    metric = rng.choice(METRICS + ["o_totalprice"])
    agg = rng.choice(AGGS)
    jt = rng.choice(["JOIN", "JOIN", "LEFT JOIN"])
    pred_col = rng.choice(METRICS)
    lo, hi = PRED_RANGES[pred_col]
    thresh = round(rng.uniform(lo, hi), 4)
    o_pred = ""
    if rng.random() < 0.6:
        year = rng.choice([1993, 1995, 1997])
        o_pred = f" AND o_orderdate >= CAST('{year}-01-01' AS TIMESTAMP)"
    gcols = ", ".join(groups)
    on = "o_orderkey = l_orderkey"
    base_pred = f"{pred_col} {op_for(rng)} {thresh}{o_pred}"
    if jt == "LEFT JOIN":
        # Predicates on the right side of a LEFT JOIN belong in ON, not
        # WHERE (WHERE would silently turn it inner) — fuzz exactly that.
        return (
            f"SELECT {gcols}, CAST(ROUND({agg}({metric}), 2) AS DOUBLE) AS agg_val, "
            f"COUNT(*) AS n FROM orders LEFT JOIN lineitem "
            f"ON {on} AND {pred_col} < {thresh} "
            f"WHERE o_totalprice > 1000{o_pred} GROUP BY {gcols}"
        )
    return (
        f"SELECT {gcols}, CAST(ROUND({agg}({metric}), 2) AS DOUBLE) AS agg_val, "
        f"COUNT(*) AS n FROM orders {jt} lineitem ON {on} "
        f"WHERE {base_pred} GROUP BY {gcols}"
    )


def op_for(rng: random.Random) -> str:
    return rng.choice(["<", ">", "<=", ">="])


@pytest.mark.parametrize("seed", range(15))
def test_fuzzed_join_query_agrees_with_duckdb(spark, sf_dir, seed):
    register_views(spark, sf_dir, ["orders", "lineitem"])
    sql = gen_join_query(random.Random(1000 + seed))
    compare(spark.sql(sql), sql, sf_dir, float_places=2)


WINDOW_FUNCS = ["SUM", "AVG", "MIN", "MAX", "COUNT"]


# (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture (the
# fuzzer's first catch was its own grammar assuming it was): under ORDER BY
# ties, LAG and ROWS-frame results are engine-dependent.  Ordering by the
# FULL row restores a deterministic output multiset — rows that still tie
# are bit-identical, so any tie-break yields the same set of output tuples.
_TOTAL_ORDER = "l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax"


def gen_window_query(rng: random.Random) -> str:
    """Window-function variant: ROWS and RANGE frames, LAG with defaults,
    over a total order (see _TOTAL_ORDER) so results are deterministic."""
    part = rng.choice(["l_returnflag", "l_linestatus"])
    metric = rng.choice(METRICS)
    kind = rng.random()
    if kind < 0.4:
        n = rng.randint(1, 10)
        fn = rng.choice(WINDOW_FUNCS)
        wexpr = (
            f"{fn}({metric}) OVER (PARTITION BY {part} "
            f"ORDER BY {_TOTAL_ORDER} "
            f"ROWS BETWEEN {n} PRECEDING AND CURRENT ROW)"
        )
    elif kind < 0.7:
        n = rng.choice([100, 1000, 5000])
        fn = rng.choice(WINDOW_FUNCS)
        wexpr = (
            f"{fn}({metric}) OVER (PARTITION BY {part} ORDER BY l_orderkey "
            f"RANGE BETWEEN {n} PRECEDING AND CURRENT ROW)"
        )
    else:
        k = rng.randint(1, 3)
        wexpr = (
            f"LAG({metric}, {k}, -1.0) OVER (PARTITION BY {part} "
            f"ORDER BY {_TOTAL_ORDER})"
        )
    pred_col = rng.choice(METRICS)
    lo, hi = PRED_RANGES[pred_col]
    thresh = round(rng.uniform(lo, hi), 4)
    return (
        f"SELECT l_orderkey, l_linenumber, "
        f"CAST(ROUND({wexpr}, 2) AS DOUBLE) AS w "
        f"FROM lineitem WHERE {pred_col} {op_for(rng)} {thresh}"
    )


@pytest.mark.parametrize("seed", range(15))
def test_fuzzed_window_query_agrees_with_duckdb(spark, sf_dir, seed):
    register_views(spark, sf_dir, ["lineitem"])
    sql = gen_window_query(random.Random(2000 + seed))
    compare(spark.sql(sql), sql, sf_dir, float_places=2)


def gen_distinct_query(rng: random.Random) -> str:
    """COUNT(DISTINCT) variant: distinct aggregates (single and mixed with
    plain ones, sometimes two distinct columns) exercise the expand/rewrite
    path planners use for distinct aggregation."""
    groups = rng.sample(GROUP_COLS, rng.randint(1, 2))
    d1 = rng.choice(["l_partkey", "l_suppkey", "l_orderkey"])
    extra = ""
    if rng.random() < 0.5:
        d2 = rng.choice([c for c in ("l_partkey", "l_suppkey") if c != d1])
        extra = f", COUNT(DISTINCT {d2}) AS nd2"
    plain = ""
    if rng.random() < 0.6:
        m = rng.choice(METRICS)
        plain = f", CAST(ROUND(SUM({m}), 2) AS DOUBLE) AS s"
    pred_col = rng.choice(METRICS)
    lo, hi = PRED_RANGES[pred_col]
    thresh = round(rng.uniform(lo, hi), 4)
    gcols = ", ".join(groups)
    return (
        f"SELECT {gcols}, COUNT(DISTINCT {d1}) AS nd1{extra}{plain}, COUNT(*) AS n "
        f"FROM lineitem WHERE {pred_col} {op_for(rng)} {thresh} GROUP BY {gcols}"
    )


@pytest.mark.parametrize("seed", range(10))
def test_fuzzed_distinct_agg_agrees_with_duckdb(spark, sf_dir, seed):
    register_views(spark, sf_dir, ["lineitem"])
    sql = gen_distinct_query(random.Random(3000 + seed))
    compare(spark.sql(sql), sql, sf_dir, float_places=2)


def gen_semi_anti_query(rng: random.Random) -> str:
    """Semi/anti-join variant: EXISTS / NOT EXISTS / IN / NOT IN subqueries
    between orders and lineitem — Spark plans all four as LeftSemi/LeftAnti
    joins, the families previously covered only by the hand-written
    join_semi/join_anti queries (VERDICT r3 #6)."""
    shape = rng.choice(["EXISTS", "NOT EXISTS", "IN", "NOT IN"])
    metric = rng.choice(METRICS)
    lo, hi = PRED_RANGES[metric]
    thresh = round(rng.uniform(lo, hi), 4)
    group = rng.choice(["o_orderstatus", "o_orderpriority"])
    o_pred = ""
    if rng.random() < 0.5:
        year = rng.choice([1993, 1995, 1997])
        o_pred = f" AND o_orderdate >= CAST('{year}-01-01' AS TIMESTAMP)"
    if shape in ("EXISTS", "NOT EXISTS"):
        sub = (
            f"SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
            f"AND {metric} {op_for(rng)} {thresh}"
        )
        where = f"{shape} ({sub})"
    else:
        sub = f"SELECT l_orderkey FROM lineitem WHERE {metric} {op_for(rng)} {thresh}"
        where = f"o_orderkey {shape} ({sub})"
    return (
        f"SELECT {group}, COUNT(*) AS n, "
        f"CAST(ROUND(SUM(o_totalprice), 2) AS DOUBLE) AS total "
        f"FROM orders WHERE {where}{o_pred} GROUP BY {group}"
    )


@pytest.mark.parametrize("seed", range(12))
def test_fuzzed_semi_anti_agrees_with_duckdb(spark, sf_dir, seed):
    register_views(spark, sf_dir, ["orders", "lineitem"])
    sql = gen_semi_anti_query(random.Random(4000 + seed))
    compare(spark.sql(sql), sql, sf_dir, float_places=2)


def gen_setop_query(rng: random.Random) -> str:
    """Set-operation variant: UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL]
    between two filtered projections of lineitem — set semantics (dedupe,
    multiset difference) are engine behavior the named setop_* queries pin
    only at one shape each."""
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL", "EXCEPT", "EXCEPT ALL"])
    metric = rng.choice(METRICS)
    lo, hi = PRED_RANGES[metric]
    # Overlapping thresholds so INTERSECT/EXCEPT have non-trivial overlap.
    t1 = round(rng.uniform(lo, hi), 4)
    t2 = round(rng.uniform(lo, hi), 4)
    proj = (
        "l_returnflag, l_linestatus, l_linenumber, "
        f"CAST(ROUND({metric}, 2) AS DOUBLE) AS m"
    )
    side1 = f"SELECT {proj} FROM lineitem WHERE {metric} >= {t1}"
    side2 = f"SELECT {proj} FROM lineitem WHERE {metric} <= {t2}"
    # Aggregate on top so the compared result is small and stable.
    return (
        f"SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
        f"CAST(ROUND(SUM(m), 2) AS DOUBLE) AS s "
        f"FROM ({side1} {op} {side2}) GROUP BY l_returnflag, l_linestatus"
    )


@pytest.mark.parametrize("seed", range(12))
def test_fuzzed_setop_agrees_with_duckdb(spark, sf_dir, seed):
    register_views(spark, sf_dir, ["lineitem"])
    sql = gen_setop_query(random.Random(5000 + seed))
    compare(spark.sql(sql), sql, sf_dir, float_places=2)


def gen_grouping_sets_query(rng: random.Random) -> str:
    """Multi-level aggregation variant: GROUPING SETS / ROLLUP / CUBE with
    GROUPING() disambiguation — the NULL-placeholder semantics of subtotal
    rows are exactly the kind of cross-engine drift the hand-written
    rollup_agg/cube_agg/grouping_sets_sql queries pin at one shape each."""
    kind = rng.choice(["GROUPING SETS", "ROLLUP", "CUBE"])
    cols = rng.sample(GROUP_COLS, 2)
    a, b = cols
    metric = rng.choice(METRICS)
    agg = rng.choice(AGGS)
    pred_col = rng.choice(METRICS)
    lo, hi = PRED_RANGES[pred_col]
    thresh = round(rng.uniform(lo, hi), 4)
    if kind == "GROUPING SETS":
        sets = rng.choice(
            [f"(({a}, {b}), ({a}), ())", f"(({a}), ({b}))", f"(({a}, {b}), ())"]
        )
        group = f"GROUPING SETS {sets}"
    else:
        group = f"{kind} ({a}, {b})"
    return (
        f"SELECT {a}, {b}, GROUPING({a}) AS ga, GROUPING({b}) AS gb, "
        f"CAST(ROUND({agg}({metric}), 2) AS DOUBLE) AS agg_val, COUNT(*) AS n "
        f"FROM lineitem WHERE {pred_col} {op_for(rng)} {thresh} "
        f"GROUP BY {group}"
    )


@pytest.mark.parametrize("seed", range(12))
def test_fuzzed_grouping_sets_agrees_with_duckdb(spark, sf_dir, seed):
    register_views(spark, sf_dir, ["lineitem"])
    sql = gen_grouping_sets_query(random.Random(6000 + seed))
    compare(spark.sql(sql), sql, sf_dir, float_places=2)
