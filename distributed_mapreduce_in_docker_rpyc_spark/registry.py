"""Query registry — the bridge between operator modules and the driver
contract (``__spark_entry__.py``).  The reference has no query registry -
its one job is hardcoded (SURVEY.md §3: 'there is no query language'); the
registry is what makes the engine a queryable surface instead.

Every implemented operator registers a named query callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, a DuckDB oracle SQL
string computing the same result with the same column names (the driver's
comparison sorts columns by name and hash-compares values — FIXTURES.md §5).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` under ``name``, optionally with oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so its ``@register`` calls run.

    Registration order is deliberate: the round driver verifies queries in
    registration order under a budget, so the LLM-pipeline families (the ones
    without driver correctness rows yet) register FIRST and the already-green
    wordcount/TPC-H surface registers last.
    """
    for mod in (
        "queries_dedup",
        "queries_similarity",
        "queries_text",
        "queries_events",
        "queries_temporal",
        "queries_quality",
        "queries_sketches",
        "queries_streaming",
        "queries_multimodal",
        "queries_wordcount",
        "queries_relational",
    ):
        try:
            __import__(f"distributed_mapreduce_in_docker_rpyc_spark.operators.{mod}")
        except ModuleNotFoundError as exc:
            # Only tolerate genuinely-optional third-party deps; a missing
            # module of THIS package (typo'd import, broken refactor) must
            # fail loudly, not silently shrink the query surface.
            if (exc.name or "").startswith("distributed_mapreduce_in_docker_rpyc_spark"):
                raise
            import warnings

            warnings.warn(
                f"operator module {mod!r} skipped: missing optional dependency {exc.name!r}",
                stacklevel=2,
            )
