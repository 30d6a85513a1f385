"""Small-file compaction + storage report (operators/maintenance.py).

The invariant under test is the maintenance contract: compaction changes
the FILE LAYOUT and nothing else — same rows, same schema, fewer files —
and the planner refuses pure-churn rewrites of already-healthy layouts.
"""

from __future__ import annotations

import pytest

from distributed_mapreduce_in_docker_rpyc_spark.operators import maintenance as mt
from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table


@pytest.fixture
def fragmented(spark, sf_dir, tmp_path):
    """A deliberately over-fragmented copy of nation: 25 rows, 25 files."""
    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "frag")
    src.repartition(25).write.parquet(path)
    return path, src


def test_compact_preserves_data_and_reduces_files(spark, fragmented, tmp_path):
    path, src = fragmented
    before = mt.list_files(spark, path)
    assert len(before) == 25

    out = str(tmp_path / "compacted")
    plan = mt.compact(spark, path, out, target_bytes=64 * 1024 * 1024)
    assert plan["needed"] and plan["n_files"] == 25
    assert plan["n_files_after"] == plan["n_target_files"] == 1

    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    want = {tuple(r) for r in src.collect()}
    assert got == want
    assert spark.read.parquet(out).schema == src.schema


def test_compact_shuffle_path_same_data(spark, fragmented, tmp_path):
    path, src = fragmented
    out = str(tmp_path / "compacted_shuffle")
    plan = mt.compact(spark, path, out, target_bytes=64 * 1024 * 1024, shuffle=True)
    assert plan["n_files_after"] == 1
    assert spark.read.parquet(out).count() == src.count()


def test_compaction_plan_skips_healthy_layout(spark, fragmented):
    path, _ = fragmented
    # With a tiny target, 25 files is already under the target count:
    # rewriting would be pure churn and the planner must say so.
    plan = mt.compaction_plan(spark, path, target_bytes=64)
    assert not plan["needed"]


def test_storage_report_shape(spark, sf_dir):
    rows = {r.table_name: r for r in mt.storage_report(spark, sf_dir, ["nation", "lineitem"]).collect()}
    assert set(rows) == {"nation", "lineitem"}
    for r in rows.values():
        assert r.n_files >= 1
        assert r.total_bytes > 0
        assert r.min_file_bytes <= r.avg_file_bytes <= r.max_file_bytes


def test_bucketed_join_plans_no_shuffle(spark, sf_dir, tmp_path):
    """Co-located storage: orders and lineitem bucketed by order key with the
    same bucket count join WITHOUT any Exchange in the physical plan — the
    shuffle was paid at write time.  The same join over plain parquet plans
    two Exchanges, proving the assertion bites."""
    from pyspark.sql import functions as F

    from distributed_mapreduce_in_docker_rpyc_spark.operators.maintenance import write_bucketed
    from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_bkt", str(tmp_path / "orders_bkt"), "o_orderkey", 8)
    write_bucketed(li, "lineitem_bkt", str(tmp_path / "lineitem_bkt"), "l_orderkey", 8)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bucketed = spark.table("orders_bkt").join(
            spark.table("lineitem_bkt"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = bucketed._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert bucketed.count() == li.count()

        plain = orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert plain_plan.count("Exchange") >= 2, plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_zorder_write_shrinks_per_file_key_ranges(spark, sf_dir, tmp_path):
    """Z-order clustering on (l_orderkey, l_partkey) must make every output
    file cover a narrow slice of BOTH key ranges (that is what lets parquet
    min/max stats prune scans on either column), while a hash-repartitioned
    write leaves each file spanning essentially the full range."""
    import glob as g

    import pyarrow.parquet as pq

    from distributed_mapreduce_in_docker_rpyc_spark.operators.maintenance import zorder_write
    from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")

    def per_file_span(path, col):
        spans = []
        for f in sorted(g.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    zpath = str(tmp_path / "li_zorder")
    ppath = str(tmp_path / "li_plain")
    zorder_write(li, ["l_orderkey", "l_partkey"], zpath, n_files=8)
    li.repartition(8).write.mode("overwrite").parquet(ppath)

    rows = li.count()
    back = spark.read.parquet(zpath)
    assert back.count() == rows

    for col in ("l_orderkey", "l_partkey"):
        z_span = per_file_span(zpath, col)
        p_span = per_file_span(ppath, col)
        assert z_span < 0.75 * p_span, (col, z_span, p_span)


def test_upsert_parquet_updates_and_inserts(spark, sf_dir, tmp_path):
    """MERGE semantics on plain parquet: updated keys take the new values,
    new keys append, untouched keys survive byte-identical."""
    from pyspark.sql import functions as F

    from distributed_mapreduce_in_docker_rpyc_spark.operators.maintenance import upsert_parquet
    from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

    path = str(tmp_path / "cust")
    base = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    base.write.parquet(path)
    n = base.count()

    updates = spark.createDataFrame(
        [(1, "UPDATED-1", 999.0), (2, "UPDATED-2", 888.0), (10_000_001, "NEW-1", 1.0)],
        "c_custkey long, c_name string, c_acctbal double",
    )
    stats = upsert_parquet(spark, path, updates, "c_custkey")
    assert stats["rows_after"] == n + 1
    assert stats["rows_inserted"] == 1 and stats["rows_updated"] == 2

    after = spark.read.parquet(path)
    got = {r["c_custkey"]: r for r in after.filter(F.col("c_custkey").isin(1, 2, 10_000_001)).collect()}
    assert got[1]["c_name"] == "UPDATED-1" and got[2]["c_acctbal"] == 888.0
    assert got[10_000_001]["c_name"] == "NEW-1"
    # an untouched key keeps its original row
    k = 5
    orig = base.filter(F.col("c_custkey") == k).collect()
    assert after.filter(F.col("c_custkey") == k).collect() == orig


def test_upsert_parquet_rejects_duplicate_update_keys(spark, sf_dir, tmp_path):
    """Duplicate keys inside updates make the winner nondeterministic and
    skew the returned stats (ADVICE r3) — rejected before any write, with
    the table left untouched."""
    import pytest

    from distributed_mapreduce_in_docker_rpyc_spark.operators.maintenance import upsert_parquet
    from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

    path = str(tmp_path / "cust")
    base = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    base.write.parquet(path)
    n = base.count()

    dup_updates = spark.createDataFrame(
        [(1, "A", 1.0), (1, "B", 2.0)],
        "c_custkey long, c_name string, c_acctbal double",
    )
    with pytest.raises(ValueError, match="duplicate"):
        upsert_parquet(spark, path, dup_updates, "c_custkey")
    assert spark.read.parquet(path).count() == n


def test_zorder_skips_all_null_columns_and_caps_bits(spark, tmp_path):
    """All-NULL clustered columns carry no signal — zorder_write drops them
    instead of crashing on int(None); zorder_expr caps bits so 4 columns at
    the default 16 bits cannot shift into the long sign bit (ADVICE r3)."""
    from pyspark.sql import functions as F

    from distributed_mapreduce_in_docker_rpyc_spark.operators.maintenance import (
        zorder_expr,
        zorder_write,
    )

    df = spark.range(1000).select(
        F.col("id").alias("a"),
        (F.col("id") * 7 % 97).alias("b"),
        (F.col("id") * 13 % 89).alias("c"),
        (F.col("id") * 17 % 83).alias("d"),
        F.lit(None).cast("long").alias("all_null"),
    )
    out = str(tmp_path / "z")
    zorder_write(df, ["a", "all_null"], out, n_files=2)
    assert spark.read.parquet(out).count() == 1000

    # 4 columns × capped bits: every interleaved bit index stays below 63,
    # so the curve key is non-negative for non-negative scaled inputs.
    cols = ["a", "b", "c", "d"]
    stats = {c: (0, 1000) for c in cols}
    mins = {c: lo for c, (lo, _) in stats.items()}
    maxs = {c: hi for c, (_, hi) in stats.items()}
    z = df.select(zorder_expr(cols, mins, maxs, bits=16).alias("z"))
    assert z.filter(F.col("z") < 0).count() == 0

    # all-NULL columns are rejected with a clear message at the expr level
    import pytest

    with pytest.raises(ValueError, match="NULL min/max"):
        zorder_expr(["all_null"], {"all_null": None}, {"all_null": None})
