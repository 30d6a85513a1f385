"""Measure wall-clock for a set of registered queries across scale decades
(best-of-2 through the noop sink) — feeds the SCALING.md decade tables.

Usage: python scripts/measure_scaling.py q1,q2,... [sf_dir1 sf_dir2 ...]
Defaults to sf0.01, sf0.1 and the tiled sf1 fixture at /tmp/sg-sf1.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = [n for n in sys.argv[1].split(",") if n]
    dirs = sys.argv[2:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        "/tmp/sg-sf1",
    ]
    from distributed_mapreduce_in_docker_rpyc_spark.registry import QUERIES, load_all
    from distributed_mapreduce_in_docker_rpyc_spark.session import get_spark

    load_all()
    spark = get_spark("measure-scaling")
    # warm the JVM/Python worker pool off the clock
    QUERIES[names[0]](spark, dirs[0]).write.format("noop").mode("overwrite").save()
    for name in names:
        cells = []
        for d in dirs:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[name](spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            cells.append(best)
        print(
            f"| `{name}` | " + " | ".join(f"{c:.1f} s" for c in cells) + " |",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
