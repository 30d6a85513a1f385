"""Fleet-wide empty-input robustness: every registered query must execute
over ZERO-ROW tables without crashing.

At 100 TB this is not an edge case — a date filter, a new tenant, or a
fresh partition routinely hands an operator an empty frame, and an operator
that throws (instead of returning an empty result) kills the whole job.
The failure mode this guards is specifically the collected-scalar pattern:
``agg(...).first()[0]`` returns None over empty input, and None then
poisons driver-side arithmetic (``None * 0.0006``) or NumPy matrix shapes
(an empty query matrix is 1-D, so ``norm(axis=1)`` raises AxisError).  The
r4 sweep found and fixed exactly 8 such crashes (q11, pareto, histogram,
mixture/stratified plans, zip ingest of an empty archive, and the two
queries sharing the vectorized top-k worker).

Content on empty input is NOT asserted (some reports legitimately emit
summary rows; oracles pin content on real fixtures) — only that execution
completes.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from distributed_mapreduce_in_docker_rpyc_spark import registry

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """Zero-row parquet twins of every fixture table, schemas preserved."""
    dst = tmp_path_factory.mktemp("sf_empty")
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            schema = pq.read_schema(os.path.join(SRC, f))
            empty = pa.table(
                {n: pa.array([], type=schema.field(n).type) for n in schema.names},
                schema=schema,
            )
            pq.write_table(empty, os.path.join(str(dst), f))
    return str(dst)


@pytest.mark.slow  # full-fleet sweep (~5 min); default run deselects, see pytest.ini
def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    registry.load_all()
    failures = {}
    for name, fn in registry.QUERIES.items():
        try:
            fn(spark, empty_sf_dir).limit(5).collect()
        except Exception as exc:  # noqa: BLE001 — collecting the fleet report
            failures[name] = repr(exc)[:200]
    assert not failures, failures
