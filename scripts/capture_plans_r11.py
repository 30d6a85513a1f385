"""Capture .explain('formatted') for the headline bench queries into
plans/r11/<query>_<tag>.txt (tag = before/after).  sf0.1 with AQE on —
the same data the bench times, so plan shapes match the measured runs."""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_mapreduce_in_docker_rpyc_spark import registry
from distributed_mapreduce_in_docker_rpyc_spark.session import get_spark

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
NAMES = sys.argv[2].split(",") if len(sys.argv) > 2 else [
    "wordcount_top20", "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "q18_large_volume_customers",
    "window_running_sum", "q9_product_type_profit", "q21_waiting_orders",
    "dedup_exact", "dedup_minhash_lsh", "sim_topk_bruteforce",
    "sim_topk_lsh", "asof_purchase_click", "events_sessionize",
    "text_stats",
]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

registry.load_all()
spark = get_spark("plan-capture-r11")
out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11")
os.makedirs(out_dir, exist_ok=True)
for name in NAMES:
    df = registry.QUERIES[name](spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(out_dir, f"{name}_{TAG}.txt"), "w") as f:
        f.write(buf.getvalue())
    print("captured", name)
