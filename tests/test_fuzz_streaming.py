"""Differential streaming fuzzing: stream ≡ batch over randomized configs.

The hand-written M5 tests pin stream≡batch at one shape per operator; this
grammar varies the knobs that change state-store behavior — window width,
slide (tumbling vs overlapping), session gap, watermark delay, event-type
filters, grouping columns, and aggregate set — and asserts the incremental
execution (file source → availableNow → memory sink, complete mode) emits
exactly the batch answer on the same parquet.  Complete mode is the right
gate here: with a finite backfill it must reproduce every window regardless
of watermark delay, so watermark variation fuzzes STATE MANAGEMENT without
changing the expected answer (append-mode drop semantics are pinned
separately in test_streaming.py).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table
from distributed_mapreduce_in_docker_rpyc_spark.streaming import jobs

WIDTHS = ["30 minutes", "1 hour", "2 hours", "45 minutes"]
GAPS = ["15 minutes", "30 minutes", "1 hour"]
WATERMARKS = ["30 minutes", "2 hours", "1 day"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def gen_config(rng: random.Random) -> dict:
    width = rng.choice(WIDTHS)
    cfg = {
        "kind": rng.choice(["tumbling", "sliding", "session"]),
        "width": width,
        # slide = half the width keeps every event in exactly 2 windows
        "slide": {"30 minutes": "15 minutes", "1 hour": "30 minutes",
                  "2 hours": "1 hour", "45 minutes": "15 minutes"}[width],
        "gap": rng.choice(GAPS),
        "watermark": rng.choice(WATERMARKS),
        "types": rng.sample(EVENT_TYPES, rng.randint(1, 4)) if rng.random() < 0.6 else None,
        "group_type": rng.random() < 0.5,
        "sum_value": rng.random() < 0.6,
    }
    if cfg["kind"] == "session":
        # Spark rejects GLOBAL session aggregation in streaming ("Global
        # aggregation with session window ... not supported") — sessions
        # need a partition key, exactly as the named job keys by user_id.
        cfg["group_type"] = True
    return cfg


def apply_query(df, cfg, *, streaming: bool):
    """The SAME transformation over a stream or a batch frame — only the
    watermark call differs (batch frames accept it too, but keeping the
    batch side watermark-free proves the answer doesn't depend on it)."""
    if cfg["types"]:
        df = df.filter(F.col("event_type").isin(cfg["types"]))
    if streaming:
        df = df.withWatermark("ts", cfg["watermark"])
    if cfg["kind"] == "session":
        win = F.session_window("ts", cfg["gap"])
    elif cfg["kind"] == "sliding":
        win = F.window("ts", cfg["width"], cfg["slide"])
    else:
        win = F.window("ts", cfg["width"])
    keys = [win.alias("w")] + (["event_type"] if cfg["group_type"] else [])
    aggs = [F.count("*").alias("n")]
    if cfg["sum_value"]:
        aggs.append(
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("tv")
        )
    out = df.groupBy(*keys).agg(*aggs)
    cols = [F.col("w.start").alias("ws"), F.col("w.end").alias("we")]
    if cfg["group_type"]:
        cols.append(F.col("event_type"))
    return out.select(*cols, "n", *( ["tv"] if cfg["sum_value"] else [] ))


@pytest.mark.parametrize("seed", range(8))
def test_fuzzed_stream_equals_batch(spark, sf_dir, seed):
    cfg = gen_config(random.Random(11_000 + seed))
    table = f"fuzz_stream_{seed}"
    stream = jobs.events_stream(spark, sf_dir)
    jobs.run_to_memory(apply_query(stream, cfg, streaming=True), table)
    got = {tuple(r) for r in spark.table(table).collect()}
    batch = load_table(spark, sf_dir, "events")
    want = {tuple(r) for r in apply_query(batch, cfg, streaming=False).collect()}
    assert got == want and got, cfg
