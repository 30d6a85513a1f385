"""Command-line surface: ``python -m distributed_mapreduce_in_docker_rpyc_spark <cmd>``.

The reference's user surface is "run the hardcoded job via docker-compose"
(reference coordinator/coordinator.py, SURVEY.md §3); this engine's surface
is a query registry, so the CLI exposes it directly:

  list                 every registered query (* = DuckDB-oracle-checked)
  run NAME             execute one query, print rows as JSON lines
  explain NAME         print the physical plan (formatted)
  oracle NAME          print the query's DuckDB oracle SQL

All commands accept ``--sf-dir`` (default $SPARK_GRAFT_SF_DIR or
/root/testdata/sf0.1).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    from distributed_mapreduce_in_docker_rpyc_spark import registry
    from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import DEFAULT_SF_DIR

    p = argparse.ArgumentParser(prog="distributed_mapreduce_in_docker_rpyc_spark", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    ls = sub.add_parser("list", help="list registered queries")
    ls.add_argument("--prefix", default="", help="only names starting with PREFIX")

    for name, hlp in (
        ("run", "execute a query, print rows as JSON lines"),
        ("explain", "print a query's physical plan"),
        ("oracle", "print a query's DuckDB oracle SQL"),
    ):
        s = sub.add_parser(name, help=hlp)
        s.add_argument("name")
        if name != "oracle":
            s.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
        if name == "run":
            s.add_argument("--limit", type=int, default=20, help="max rows to print (0 = all)")

    args = p.parse_args(argv)
    registry.load_all()

    if args.cmd == "list":
        for name in registry.QUERIES:
            if name.startswith(args.prefix):
                print(f"{'*' if name in registry.ORACLES else ' '} {name}")
        return 0

    if args.name not in registry.QUERIES:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2

    if args.cmd == "oracle":
        sql = registry.ORACLES.get(args.name)
        if sql is None:
            print(f"{args.name} has no oracle (rows-only check)", file=sys.stderr)
            return 1
        print(sql)
        return 0

    from distributed_mapreduce_in_docker_rpyc_spark.session import get_spark

    spark = get_spark("distributed_mapreduce_in_docker_rpyc_spark-cli")
    df = registry.QUERIES[args.name](spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
        return 0
    rows = df.toJSON().take(args.limit) if args.limit else df.toJSON().collect()
    for r in rows:
        print(r)
    return 0


if __name__ == "__main__":
    sys.exit(main())
