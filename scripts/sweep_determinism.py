"""Full-fleet input-order-invariance sweep: run EVERY registered query on
the pristine fixtures and on row-shuffled twins, and compare canonicalized
results — a distributed engine never sees rows in a defined order, so any
difference is a scale bug hiding in a tie-break.

The permanent guard (tests/test_determinism.py RISK_SET) covers the
rank/top-N shapes on every CI run; this sweep is the periodic whole-fleet
version (r4 ran it at 156 queries; rerun it when the registry grows).

Usage: python scripts/sweep_determinism.py [--sf-dir DIR]
Exit 0 = every query invariant; prints one line per difference.
"""

from __future__ import annotations

import argparse
import math
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _canon(df):
    cols = sorted(df.columns)
    return sorted((tuple(_norm(r[c]) for c in cols) for r in df.collect()), key=repr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--only",
        default="",
        help="comma-separated query names (r9: sweep just the round's new "
        "builds between the periodic full-fleet runs)",
    )
    args = ap.parse_args()

    from distributed_mapreduce_in_docker_rpyc_spark import registry
    from distributed_mapreduce_in_docker_rpyc_spark.session import get_spark

    registry.load_all()

    only = {s for s in args.only.split(",") if s}
    # A typo'd --only name must not make the sweep vacuously green
    # (ADVICE r9): unknown names are a hard error before any work happens,
    # not a silent skip that prints '0/1 invariant' and exits 0.
    unknown = sorted(only - set(registry.QUERIES))
    if unknown:
        print(f"ERROR: --only names not registered: {unknown}")
        return 1

    spark = get_spark("sweep-determinism")

    shuffled = tempfile.mkdtemp(prefix="sg-shuffled-")
    con = duckdb.connect()
    for f in sorted(os.listdir(args.sf_dir)):
        if f.endswith(".parquet"):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{args.sf_dir}/{f}') "
                f"ORDER BY md5(CAST(ROW_NUMBER() OVER () AS VARCHAR))) "
                f"TO '{shuffled}/{f}' (FORMAT PARQUET)"
            )

    diffs, errors, n_ok = {}, {}, 0
    try:
        for name, fn in registry.QUERIES.items():
            if only and name not in only:
                continue
            try:
                if _canon(fn(spark, args.sf_dir)) != _canon(fn(spark, shuffled)):
                    diffs[name] = "result depends on input row order"
                    print(f"DIFF  {name}", flush=True)
                else:
                    n_ok += 1
            except Exception as exc:  # noqa: BLE001 - report, don't die
                errors[name] = repr(exc)[:200]
                print(f"ERROR {name}: {errors[name]}", flush=True)
    finally:
        shutil.rmtree(shuffled, ignore_errors=True)

    total = len(only) if only else len(registry.QUERIES)
    print(f"\n{n_ok}/{total} input-order invariant; {len(diffs)} diffs, {len(errors)} errors")
    return 1 if (diffs or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
