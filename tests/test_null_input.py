"""Fleet-wide NULL robustness: every registered query must execute over
fixtures where ~10% of every NON-KEY cell is NULL.

The shipped fixtures contain no NULLs, so without this sweep the fleet's
NULL-handling is untested: the r4 injection run found 9 crashes in two
clusters — NULL embedding cells poisoning JVM array expressions (NPE-shaped
Py4J errors) and NumPy batch matrices (inhomogeneous shape), and NULL text
reaching ``ZipFile.writestr``.  The fixes define the domain contract: rows
with a NULL vector/text are outside the operator's domain (SQL-aggregate
semantics), enforced by ``similarity.non_null_vectors`` at every vector
entry point.

Join/grouping keys stay non-NULL: nulling them changes query semantics
(NULL never equi-joins), which is the fuzzer's territory — this sweep pins
crash-freedom, not content.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from distributed_mapreduce_in_docker_rpyc_spark import registry

SRC = "/root/testdata/sf0.001"
KEY_COLS = {
    "doc_id", "vec_id", "event_id", "user_id", "label",
    "o_orderkey", "o_custkey", "l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "c_custkey", "c_nationkey", "s_suppkey", "s_nationkey",
    "p_partkey", "n_nationkey", "n_regionkey", "r_regionkey",
}


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory):
    """Fixture twins with ~10% of every non-key cell nulled (seeded)."""
    dst = tmp_path_factory.mktemp("sf_nulls")
    rng = np.random.default_rng(42)
    for f in sorted(os.listdir(SRC)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(SRC, f))
        cols = {}
        for name in t.column_names:
            col = t[name]
            if name in KEY_COLS or t.num_rows == 0:
                cols[name] = col
                continue
            mask = pa.array(rng.random(t.num_rows) < 0.10)
            cols[name] = pc.if_else(
                mask, pa.nulls(t.num_rows, type=col.type), col.combine_chunks()
            )
        pq.write_table(pa.table(cols, schema=t.schema), os.path.join(str(dst), f))
    return str(dst)


@pytest.mark.slow  # full-fleet sweep (~7 min); default run deselects, see pytest.ini
def test_every_query_survives_null_cells(spark, null_sf_dir):
    registry.load_all()
    failures = {}
    for name, fn in registry.QUERIES.items():
        try:
            fn(spark, null_sf_dir).limit(5).collect()
        except Exception as exc:  # noqa: BLE001 — collecting the fleet report
            failures[name] = repr(exc)[:200]
    assert not failures, failures
