"""Table maintenance: small-file compaction and storage-layout reporting.

The reference has no storage layer at all (it streams one text file through
RPC workers — SURVEY.md §1.3), but any engine run continuously at 100 TB
accretes small files: streaming micro-batches, incremental ingests, and
over-parallel writes each leave thousands of sub-HDFS-block parquet files,
and scan cost then becomes file-open latency instead of IO.  Compaction is
the maintenance job every production Spark/Iceberg/Delta deployment
schedules; this module is the plain-parquet formulation.

Scale posture: `compact` plans output file count from TOTAL BYTES (listed
driver-side from the file index — metadata only, no data motion), then
rewrites in one pass.  `coalesce` (default) merges map-side with NO shuffle
— each output task concatenates whole input files; `shuffle=True` buys
balanced outputs at the price of one exchange when input sizes are skewed.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def list_files(spark: SparkSession, path: str, suffix: str = ".parquet") -> list[tuple[str, int]]:
    """(path, bytes) for every data file under ``path`` (driver-side
    metadata listing via the Hadoop FileSystem — no data read)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    out: list[tuple[str, int]] = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        if p.endswith(suffix):
            out.append((p, st.getLen()))
    return sorted(out)


def compaction_plan(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Decide how many output files a compaction of ``path`` should produce.

    Returns {n_files, total_bytes, n_target_files, needed} — ``needed`` is
    False when the layout is already at-or-under the target count (rewriting
    well-sized files is pure churn)."""
    files = list_files(spark, path)
    total = sum(b for _, b in files)
    n_target = max(1, math.ceil(total / target_bytes))
    return {
        "n_files": len(files),
        "total_bytes": total,
        "n_target_files": n_target,
        "needed": len(files) > n_target,
    }


def compact(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    shuffle: bool = False,
) -> dict:
    """Rewrite ``in_path`` to ``out_path`` with ≈``target_bytes`` files.

    ``shuffle=False`` (default) uses ``coalesce`` — map-side merge, no
    exchange; use ``shuffle=True`` (``repartition``) when input file sizes
    are skewed enough that concatenation would produce unbalanced outputs.
    Returns the plan dict plus ``rows`` (rewritten row count, for the
    caller's invariant check)."""
    plan = compaction_plan(spark, in_path, target_bytes)
    df = spark.read.parquet(in_path)
    n = plan["n_target_files"]
    out = df.repartition(n) if shuffle else df.coalesce(n)
    out.write.mode("overwrite").parquet(out_path)
    plan["rows"] = spark.read.parquet(out_path).count()
    plan["n_files_after"] = len(list_files(spark, out_path))
    return plan


def storage_report(spark: SparkSession, sf_dir: str, tables: list[str]) -> DataFrame:
    """One row per table: file count, total bytes, min/avg/max file bytes —
    the health report a compaction scheduler reads to pick targets.  Pure
    metadata (file-index listing); no table data is scanned."""
    rows = []
    for t in tables:
        files = list_files(spark, os.path.join(sf_dir, f"{t}.parquet"))
        sizes = [b for _, b in files] or [0]
        rows.append(
            (
                t,
                len(files),
                int(sum(sizes)),
                int(min(sizes)),
                int(sum(sizes) / max(len(files), 1)),
                int(max(sizes)),
            )
        )
    return spark.createDataFrame(
        rows,
        "table_name string, n_files bigint, total_bytes bigint, "
        "min_file_bytes bigint, avg_file_bytes bigint, max_file_bytes bigint",
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int = 32,
) -> None:
    """Persist ``df`` as a bucketed, bucket-sorted parquet table.

    Bucketing is THE storage-level co-location tool at 100 TB: both sides of
    a recurring equi-join written with the same bucket count on the join key
    join with NO exchange — the shuffle is paid once at write time and
    amortized over every subsequent join/aggregation on that key (Spark's
    bucketed-scan output partitioning satisfies the join's distribution
    requirement).  The reference has no storage layer, so nothing to cite;
    this is the Spark-native answer to its hash partitioner (SURVEY.md OP-8)
    made durable.

    The table registers in the session catalog with an explicit ``path``
    (external), so the data outlives the session and any session can
    rediscover the bucketing metadata from the catalog."""
    (
        df.write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def zorder_expr(cols: list[str], mins: dict, maxs: dict, bits: int = 16):
    """Z-order (Morton) key expression: each column is min-max scaled to
    ``bits`` bits, then the bits of all columns are interleaved.  Pure
    codegen arithmetic — no UDF.

    ``bits`` is capped at ``63 // len(cols)`` so the highest interleaved bit
    index (``(bits-1) * k + k-1``) stays below the long sign bit — at the
    default 16 bits, 4+ columns would otherwise shift into/past bit 63 and
    corrupt the curve order.  Columns whose min or max is NULL (all-NULL
    input) cannot be scaled and are rejected with a clear error; callers
    that want to skip them do so before building the expression
    (``zorder_write`` does)."""
    from pyspark.sql import functions as F

    k = len(cols)
    if not cols:
        raise ValueError("zorder_expr needs at least one column")
    bits = min(bits, 63 // k)
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        lo, hi = mins[c], maxs[c]
        if lo is None or hi is None:
            raise ValueError(f"z-order column {c!r} has NULL min/max (all-NULL input)")
        span = max(int(hi) - int(lo), 1)
        scaled = (
            (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(float(span))
            * F.lit(float((1 << bits) - 1))
        ).cast("long")
        for b in range(bits):
            z = z + F.shiftleft(F.shiftright(scaled, b).bitwiseAND(F.lit(1)), b * k + ci)
    return z


def zorder_write(df: DataFrame, cols: list[str], path: str, n_files: int = 8, bits: int = 16) -> None:
    """Rewrite ``df`` clustered on the Z-order curve of ``cols``.

    Multi-dimensional clustering for data skipping: after the rewrite, every
    output file covers a small hyper-rectangle of the key space, so parquet
    min/max statistics prune files/row-groups for predicates on ANY of the
    clustered columns — the single-column sort can only serve one.  This is
    the plain-parquet formulation of what Delta/Iceberg ``OPTIMIZE ZORDER BY``
    schedules; at 100 TB it runs as one range-exchange on the z-key (uniform
    by construction) and a linear write.

    Column min/max are taken driver-side in one metadata-cheap aggregate
    (two scalars per column), mirroring compaction's metadata-only planning.
    All-NULL columns carry no clustering signal and are skipped (the curve
    is built from the remaining columns; with none left the rewrite is a
    plain unclustered write).
    """
    from pyspark.sql import functions as F

    row = df.agg(
        *[F.min(c).alias(f"min_{c}") for c in cols],
        *[F.max(c).alias(f"max_{c}") for c in cols],
    ).collect()[0]
    mins = {c: row[f"min_{c}"] for c in cols}
    maxs = {c: row[f"max_{c}"] for c in cols}
    usable = [c for c in cols if mins[c] is not None and maxs[c] is not None]
    if not usable:
        df.write.mode("overwrite").parquet(path)
        return
    (
        df.withColumn("_z", zorder_expr(usable, mins, maxs, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def upsert_parquet(spark: SparkSession, path: str, updates: DataFrame, key: str) -> dict:
    """MERGE INTO for plain parquet: rows in ``updates`` replace same-key rows
    in the table at ``path``; new keys append.  Returns merge stats.

    The merge itself is one shuffle on the key (window over key, source rank
    breaks ties toward updates) — the same dataflow a Delta/Iceberg MERGE
    compiles to, minus their transaction log: the rewrite stages to a temp
    directory, then swaps via rename-old → rename-tmp → delete-old, so the
    no-table window is two metadata renames rather than a full recursive
    delete.  Duplicate keys WITHIN ``updates`` are rejected up front — with
    them, "which update wins" is nondeterministic and the returned
    updated/inserted stats would be wrong.  At 100 TB you partition the
    table and merge only affected partitions; table formats add snapshot
    isolation on top.
    """
    import shutil
    import uuid

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = spark.read.parquet(path)
    n_base = base.count()
    n_updates = updates.count()
    n_update_keys = updates.select(key).distinct().count()
    if n_update_keys != n_updates:
        raise ValueError(
            f"updates contain {n_updates - n_update_keys} duplicate {key!r} rows; "
            "dedupe them first (which duplicate wins is undefined)"
        )
    w = Window.partitionBy(key).orderBy(F.desc("_src"))
    merged = (
        base.withColumn("_src", F.lit(0))
        .unionByName(updates.withColumn("_src", F.lit(1)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_src", "_rn")
    )
    token = uuid.uuid4().hex[:8]
    tmp = f"{path}.merge-{token}"
    merged.write.mode("overwrite").parquet(tmp)
    n_final = spark.read.parquet(tmp).count()
    old = f"{path}.old-{token}"
    os.replace(path, old)
    os.replace(tmp, path)
    shutil.rmtree(old)
    return {
        "rows_before": n_base,
        "rows_updates": n_updates,
        "rows_after": n_final,
        "rows_inserted": n_final - n_base,
        "rows_updated": n_updates - (n_final - n_base),
    }
