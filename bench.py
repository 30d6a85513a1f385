"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the noop sink (full execution, no
driver-side result transfer) so the timing measures the engine, not collect().

Median-of-N protocol (default N=5, override $SPARK_GRAFT_BENCH_REPS):
single-run timings on this VM vary up to 3x per query (JIT warm-up of
interpreted expressions + noisy-neighbor effects — BASELINE.md documents the
measured variance), so the harness makes N full passes over the headline list
and reports the per-query MEDIAN; "value" is the sum of medians.  N=5 (up
from r3's 3): an r4 calibration run caught a multi-minute noisy-neighbor
window that inflated one whole pass (q1 1.9->7.2 s, q18 1.8->8.3 s), and a
3-pass median tolerates only one corrupted pass where a 5-pass median
tolerates two; the full run stays under the driver budget (~8 min).

The two ANN queries get N+2 reps and an untimed Python/Arrow worker-pool
pre-warm: r3 measured sim_topk_bruteforce runs of 5.41/2.56/5.17 s (median
1.69x baseline, best run 0.84x) — pure scheduler/JIT variance on a plan
that is a broadcast of 5 query vectors over a linear corpus scan (VERDICT
r3 #4); more reps + a warmed worker pool pin the median to the real cost.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distributed_mapreduce_in_docker_rpyc_spark import registry
from distributed_mapreduce_in_docker_rpyc_spark.session import get_spark

# Headline set: the flagship word count, the heavy relational shapes (scan-agg,
# fact-fact join, 6-way star join, having, window), and one of each extended
# family (dedup, ANN, sessionization, text stats).
HEADLINE = [
    "wordcount_top20",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q18_large_volume_customers",
    "window_running_sum",
    "q9_product_type_profit",
    "q21_waiting_orders",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "sim_topk_lsh",
    "asof_purchase_click",
    "events_sessionize",
    "stream_tumbling_hourly",
    "text_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    registry.load_all()
    spark = get_spark("distributed_mapreduce_in_docker_rpyc_spark-bench")
    # Warm-up: touch the same machinery the queries use (parquet reader,
    # shuffle, noop sink, Python/Arrow worker pool) so timings measure the
    # engine, not first-touch init.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    (
        spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
        .groupBy("r_name").count()
        .write.format("noop").mode("overwrite").save()
    )
    (
        spark.range(10_000)
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .mapInPandas(lambda it: it, "id long")
        .write.format("noop").mode("overwrite").save()
    )

    # r10: default 5 → 7.  Round-10 calibration measured the SAME query at
    # 1.37 s and 29 s within one session (multi-minute noisy-neighbor
    # windows, invisible to /proc/stat steal), and a 5-pass median dies
    # once 3 passes land in such a window — observed twice this round.  A
    # 7-pass median tolerates 3 corrupted passes; the quiet-pass cost of
    # the headline list fell ~30% this round, so the full run stays inside
    # the driver budget.  The protocol (noop sink, per-query median, sum of
    # medians as "value") is unchanged and comparable with BENCH_r01-r09.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "7")))
    # High-variance heavy queries get extra reps so their median converges
    # (VERDICT r3 #4: 2x spread between best and worst run at reps=3; an r4
    # calibration run measured minhash spreads of 3.8-9.9 s on identical
    # plans under noisy-neighbor load).
    # q21 joined the extra-reps set in r8: its r7 median moved 1.14x vs r6
    # (inside the documented noise band) — VERDICT r7 next-round #8 asks for
    # a confirming re-measure under the high-variance protocol.
    extra = {
        "sim_topk_bruteforce": 2,
        "sim_topk_lsh": 2,
        "dedup_minhash_lsh": 2,
        "q21_waiting_orders": 2,
    }
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for pass_i in range(reps + max(extra.values(), default=0)):
        for name in HEADLINE:
            if pass_i >= reps + extra.get(name, 0):
                continue
            fn = registry.QUERIES[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs[name].append(time.perf_counter() - t0)

    timings = {name: round(statistics.median(ts), 3) for name, ts in runs.items()}
    total = round(sum(timings.values()), 3)
    # Auxiliary noise floor (r10): the per-query MINIMUM.  Noise on this VM
    # only ever ADDS time, so min-of-N is the standard noise-robust compute
    # estimate; reported NEXT TO the median (which stays the headline
    # "value" for round-over-round comparability), never instead of it.
    mins = {name: round(min(ts), 3) for name, ts in runs.items()}
    print(
        json.dumps(
            {
                "metric": f"headline query wall-clock (noop sink, local, median of {reps})",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reps": reps,
                "value_min": round(sum(mins.values()), 3),
                "queries_min": mins,
                "all_runs": {n: [round(t, 3) for t in ts] for n, ts in runs.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
