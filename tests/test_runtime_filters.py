"""Runtime filter (bloom) injection — Spark's runtime analogue of the
reference's nonexistent predicate pushdown across joins.

At 100 TB the classic star-join waste is scanning the whole fact table when
the dim filter keeps 1% of keys; Spark's runtime bloom filter builds a
bloom of the filtered dim keys and applies `might_contain` at the fact scan
BEFORE the shuffle.  These tests pin the capability on (session default)
and assert injection actually happens on the canonical selective-dim shape,
so a conf regression can't silently drop it.
"""

from __future__ import annotations

import pytest

from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table


@pytest.fixture
def no_broadcast(spark):
    """Force shuffle joins (bloom filters only apply there) and drop the
    size thresholds that gate injection at benchmark scale."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_injected_on_selective_dim_join(spark, sf_dir, no_broadcast):
    """Selective filter on orders joined to lineitem without broadcast →
    the optimized plan must carry a bloom might_contain on the fact side,
    and the join result must equal the unfiltered-plan result."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter("o_orderpriority = '1-URGENT'")
        .select("o_orderkey", "o_orderpriority")
    )
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    plan = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter" in plan or "might_contain" in plan, plan[:2000]

    n = joined.count()
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        assert joined.count() == n and n > 0
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
