"""Regenerate PLANS.md: formatted physical plans of representative queries,
with the scale-relevant evidence (pushed filters, pruned schemas, broadcast
joins, exchange counts) summarized per plan."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_mapreduce_in_docker_rpyc_spark import registry  # noqa: E402
from distributed_mapreduce_in_docker_rpyc_spark.session import get_spark  # noqa: E402

SHOWN = [
    "wordcount_top20",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "dedup_exact",
    "asof_purchase_click",
    "interval_join_error_window",
    "heavy_hitters_verified",
    "text_tfidf_top_terms",
    "scd2_priority_history",
    "sim_topk_lsh",
    "sim_cosine_pairs",
    "dedup_incremental",
    "udaf_weighted_avg_pandas",
    "text_bm25_search",
    "decontam_ngram_overlap",
    "corpus_pipeline_report",
    "c4_line_dedup",
    "dedup_substring_coverage",
    "emb_gram_matrix",
    "join_null_safe",
    "bucketed_join_colocated",
    "asof_nearest_purchase",
    # round-7 second wave: the ADC scan (broadcast table lookups + two-stage
    # rank), the bucketed interval join, and the map-side Morton banding
    "sim_pq_adc_topk",
    "negative_sampling_plan",
    "storage_zorder_cluster",
    # round 8: the two record-linkage joins (bucketed LSH A↔B equi-join vs
    # IVF probe join), the banded two-level cumulative replacing the global
    # distinct-grid window, and the single-scan flag-product funnel
    "ann_join_nearest_neighbor",
    "ann_join_ivf",
    "stat_mannwhitney_u",
    "corpus_filter_funnel",
    # round 9: the auto-sized LSH join (the log2(|R|/B) rule at plan-build
    # time) and the delta-cost fingerprint maintenance (one pushed-filter
    # scan of the mutation slices + map-side-combinable decimal sums)
    "ann_join_auto_k",
    "dataset_fingerprint_incremental",
    # round 10: the probe-expanded linkage joins (query-side flip family,
    # index side and candidate equi-join unchanged — blind Hamming-1 vs
    # margin-directed T=2) and the packed-window content verification
    # (doc_id equi-join moving each token array once + per-row slice)
    "ann_join_auto_k_multiprobe",
    "ann_join_query_directed_probe",
    "pack_windows_content_readback",
    # round 10 second wave: SemDeDup's cluster-scoped pairwise (the
    # quadratic term bounded by the largest cluster, centroids broadcast)
    # and the attention-mask pricing (manifest-shaped scan, two aggregates)
    "dedup_semdedup_report",
    "pack_attention_mask_plan",
]


def main() -> None:
    registry.load_all()
    spark = get_spark("gen-plans")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    sf = "/root/testdata/sf0.001"

    out = [
        "# PLANS — physical plans of representative queries (auto-generated)",
        "",
        "Captured at sf0.001 with AQE enabled; regenerate with",
        "`python scripts/gen_plans.py`. The summary line counts the",
        "scale-relevant plan features; full formatted plans follow.",
        "",
    ]
    for name in SHOWN:
        plan = (
            registry.QUERIES[name](spark, sf)
            ._jdf.queryExecution()
            .explainString(mode)
        )
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        out += [
            f"## {name}",
            "",
            f"broadcast joins: {plan.count('BroadcastHashJoin')} · "
            f"sort-merge joins: {plan.count('SortMergeJoin')} · "
            f"exchanges: {len(re.findall(r'[(][0-9]+[)] Exchange', plan))} · "
            f"scans with pushed filters: {pushed}",
            "",
            "```",
            plan.strip(),
            "```",
            "",
        ]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote PLANS.md: {len(SHOWN)} plans")


if __name__ == "__main__":
    main()
