"""Attribute driver-side (planning) vs execution time per query (guide §7.3).

For each named query: build the DataFrame, read QueryExecution's phase
tracker (parsing/analysis/optimization/planning durations), then time the
noop-sink execution.  Repeats ``reps`` times; prints per-phase medians.

Usage: python scripts/measure_planning.py [reps] [q1,q2,...]
Honors SPARK_GRAFT_EXTRA_CONFS for conf A/B tests, e.g.:
  SPARK_GRAFT_EXTRA_CONFS="spark.sql.constraintPropagation.enabled=false" \
      python scripts/measure_planning.py 3 sim_topk_lsh
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_mapreduce_in_docker_rpyc_spark import registry
from distributed_mapreduce_in_docker_rpyc_spark.session import get_spark


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = (
        sys.argv[2].split(",")
        if len(sys.argv) > 2
        else ["q1_pricing_summary", "sim_topk_lsh", "sim_topk_bruteforce", "dedup_minhash_lsh"]
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark("planning-measure")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    (
        spark.range(10_000)
        .repartition(32)
        .mapInPandas(lambda it: it, "id long")
        .write.format("noop").mode("overwrite").save()
    )

    for name in names:
        fn = registry.QUERIES[name]
        build_s, phases_all, exec_s = [], [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # force analysis + optimization + physical planning
            df._jdf.queryExecution().executedPlan()
            t1 = time.perf_counter()
            tracker = df._jdf.queryExecution().tracker()
            phases = {
                str(k): v.durationMs()
                for k, v in spark._jvm.scala.collection.JavaConverters.mapAsJavaMap(
                    tracker.phases()
                ).items()
            }
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            build_s.append(t1 - t0)
            phases_all.append(phases)
            exec_s.append(t2 - t1)
        med_build = statistics.median(build_s)
        med_exec = statistics.median(exec_s)
        keys = sorted({k for p in phases_all for k in p})
        med_ph = {k: statistics.median([p.get(k, 0) for p in phases_all]) for k in keys}
        print(
            f"{name:28s} build+plan={med_build:6.3f}s exec={med_exec:6.3f}s "
            + " ".join(f"{k}={v:.0f}ms" for k, v in med_ph.items())
        )


if __name__ == "__main__":
    main()
