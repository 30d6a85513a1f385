"""Differential streaming fuzzing: stream ≡ batch over randomized configs.

The hand-written M5 tests pin stream≡batch at one shape per operator; this
grammar varies the knobs that change state-store behavior across SIX
families (35 seeded configs total): windowed aggregations (width, slide,
session gap, watermark delay, filters, grouping, aggregate set),
stream-stream interval joins (event-type pair, join horizon, independent
per-side watermarks), dedup gates (dropDuplicates over randomized key
subsets), out-of-order replays (a randomized straggler band arriving
after the watermark advanced), UNBOUNDED stateful running totals (keys
never expire; every micro-batch merges live state), and composed
dedup-then-window pipelines (two chained stateful operators).  Each asserts the incremental execution
(file source → availableNow → memory sink) emits exactly the batch answer
on the same parquet.  Complete mode is the right gate for aggregations:
with a finite backfill it must reproduce every window regardless of
watermark delay, so watermark variation fuzzes STATE MANAGEMENT without
changing the expected answer; inner joins and dedup emit in append mode,
where a finite backfill likewise pins the full match/distinct set
(append-mode window FINALIZATION/drop semantics are pinned separately by
stream_watermark_finalize and test_streaming.py).
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


@pytest.mark.parametrize("seed", range(12))
def test_fuzzed_stream_equals_batch(spark, sf_dir, seed):
    cfg = gen_config(random.Random(11_000 + seed))
    table = f"fuzz_stream_{seed}"
    stream = jobs.events_stream(spark, sf_dir)
    jobs.run_to_memory(apply_query(stream, cfg, streaming=True), table)
    got = {tuple(r) for r in spark.table(table).collect()}
    batch = load_table(spark, sf_dir, "events")
    want = {tuple(r) for r in apply_query(batch, cfg, streaming=False).collect()}
    assert got == want and got, cfg


# ---------------------------------------------------------------------------
# Stream-stream interval join fuzz: vary the event-type pair, the join
# horizon, and both watermarks.  Inner interval joins over a finite
# availableNow backfill must emit EXACTLY the batch join's matches — the
# watermarks only bound state, never the (complete-input) answer.
# ---------------------------------------------------------------------------

JOIN_PAIRS = [
    ("click", "purchase"),
    ("view", "click"),
    ("signup", "purchase"),
    ("view", "purchase"),
    ("click", "error"),
]
JOIN_WINDOWS = ["10 minutes", "30 minutes", "1 hour", "2 hours"]


def gen_join_config(rng: random.Random) -> dict:
    return {
        "pair": rng.choice(JOIN_PAIRS),
        "window": rng.choice(JOIN_WINDOWS),
        "wm_left": rng.choice(WATERMARKS),
        "wm_right": rng.choice(WATERMARKS),
    }


def apply_join(df, cfg, *, streaming: bool):
    lt, rt = cfg["pair"]
    left = df.filter(F.col("event_type") == lt).select(
        F.col("user_id").alias("l_user"),
        F.col("event_id").alias("l_id"),
        F.col("ts").alias("l_ts"),
    )
    right = df.filter(F.col("event_type") == rt).select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("r_id"),
        F.col("ts").alias("r_ts"),
    )
    if streaming:
        left = left.withWatermark("l_ts", cfg["wm_left"])
        right = right.withWatermark("r_ts", cfg["wm_right"])
    return right.join(
        left,
        (F.col("r_user") == F.col("l_user"))
        & (F.col("l_ts") <= F.col("r_ts"))
        & (F.col("l_ts") >= F.col("r_ts") - F.expr(f"INTERVAL {cfg['window']}")),
    ).select("r_user", "l_id", "r_id", "l_ts", "r_ts")


@pytest.mark.parametrize("seed", range(5))
def test_fuzzed_stream_stream_join_equals_batch(spark, sf_dir, seed):
    cfg = gen_join_config(random.Random(12_000 + seed))
    table = f"fuzz_ssjoin_{seed}"
    stream = jobs.events_stream(spark, sf_dir)
    jobs.run_to_memory(apply_join(stream, cfg, streaming=True), table, output_mode="append")
    got = {tuple(r) for r in spark.table(table).collect()}
    batch = load_table(spark, sf_dir, "events")
    want = {tuple(r) for r in apply_join(batch, cfg, streaming=False).collect()}
    assert got == want and got, cfg


# ---------------------------------------------------------------------------
# Streaming dedup-gate fuzz: dropDuplicates over randomized key subsets
# (including a truncated-hour time key) with randomized watermark — the
# emitted SET must equal batch DISTINCT over the same projection.
# ---------------------------------------------------------------------------


def gen_dedup_config(rng: random.Random) -> dict:
    keys = rng.choice(
        [
            ["user_id", "event_type"],
            ["event_type"],
            ["user_id"],
            ["user_id", "event_type", "h"],
            ["event_type", "h"],
        ]
    )
    return {"keys": keys, "watermark": rng.choice(WATERMARKS)}


def apply_dedup(df, cfg, *, streaming: bool):
    df = df.withColumn("h", F.date_trunc("hour", F.col("ts")))
    if streaming:
        return (
            df.withWatermark("ts", cfg["watermark"])
            .select(*cfg["keys"], "ts")
            .dropDuplicates(cfg["keys"])
            .select(*cfg["keys"])
        )
    return df.select(*cfg["keys"]).distinct()


@pytest.mark.parametrize("seed", range(4))
def test_fuzzed_dedup_gate_equals_batch(spark, sf_dir, seed):
    cfg = gen_dedup_config(random.Random(13_000 + seed))
    table = f"fuzz_dedup_{seed}"
    stream = jobs.events_stream(spark, sf_dir)
    jobs.run_to_memory(apply_dedup(stream, cfg, streaming=True), table, output_mode="append")
    got = {tuple(r) for r in spark.table(table).collect()}
    batch = load_table(spark, sf_dir, "events")
    want = {tuple(r) for r in apply_dedup(batch, cfg, streaming=False).collect()}
    assert got == want and got, cfg


# ---------------------------------------------------------------------------
# Late-data placement fuzz: replay the events table as an OUT-OF-ORDER
# multi-file feed (a randomized straggler band arrives after newer data has
# advanced the watermark), one file per micro-batch.  In COMPLETE mode the
# watermark never evicts aggregation state, so the tumbling counts must
# still equal batch exactly — this fuzzes multi-batch state management
# under genuinely late arrivals, the axis the in-order fuzzer above can't
# reach.  (Append-mode finalization/drop semantics are pinned separately by
# stream_watermark_finalize.)
# ---------------------------------------------------------------------------


def gen_late_config(rng: random.Random) -> dict:
    band_hi = rng.randint(5, 12)           # straggler band = (mx-hi, mx-lo]
    band_lo = rng.randint(3, band_hi - 1)
    return {
        "band_hi": band_hi,
        "band_lo": band_lo,
        "head_cut": rng.randint(1, band_lo),  # head = newest head_cut hours
        "width": rng.choice(WIDTHS),
        "watermark": rng.choice(["137 seconds", "30 minutes", "2 hours"]),
        "group_type": rng.random() < 0.5,
    }


@pytest.mark.parametrize("seed", range(4))
def test_fuzzed_late_replay_tumbling_equals_batch(spark, sf_dir, seed):
    from distributed_mapreduce_in_docker_rpyc_spark.operators.queries_streaming import _replay_feed

    cfg = gen_late_config(random.Random(14_000 + seed))
    band = (
        F.col("ts") > F.col("mx") - F.expr(f"INTERVAL {cfg['band_hi']} HOUR")
    ) & (F.col("ts") <= F.col("mx") - F.expr(f"INTERVAL {cfg['band_lo']} HOUR"))
    head_cut = F.col("ts") <= F.col("mx") - F.expr(f"INTERVAL {cfg['head_cut']} HOUR")
    splits = [
        ("0-history", (~band) & head_cut),
        ("1-stragglers", band),
        ("2-head", ~head_cut),
    ]
    _, stream = _replay_feed(
        spark, sf_dir, ["ts", "event_type"], f"fuzzlate{seed}", splits=splits
    )
    keys = [F.window("ts", cfg["width"]).alias("w")] + (
        ["event_type"] if cfg["group_type"] else []
    )
    agg = (
        stream.withWatermark("ts", cfg["watermark"])
        .groupBy(*keys)
        .agg(F.count("*").alias("n"))
    )
    sel = [F.col("w.start").alias("ws"), F.col("w.end").alias("we")] + (
        ["event_type"] if cfg["group_type"] else []
    ) + ["n"]
    table = f"fuzz_late_{seed}"
    jobs.run_to_memory(agg.select(*sel), table)
    got = {tuple(r) for r in spark.table(table).collect()}
    batch = load_table(spark, sf_dir, "events")
    bkeys = [F.window("ts", cfg["width"]).alias("w")] + (
        ["event_type"] if cfg["group_type"] else []
    )
    want = {
        tuple(r)
        for r in batch.groupBy(*bkeys).agg(F.count("*").alias("n")).select(*sel).collect()
    }
    assert got == want and got, cfg


# ---------------------------------------------------------------------------
# Stateful running-totals fuzz: UNBOUNDED-state aggregation (no time window
# at all) over randomized key subsets and aggregate sets — complete mode
# over a finite backfill must equal the batch groupBy exactly.  This is the
# state-store axis the windowed family can't reach: keys never expire, so
# every micro-batch merges into live state (the fuzzed twin of the named
# stream_stateful_user_totals).
# ---------------------------------------------------------------------------


def gen_stateful_config(rng: random.Random) -> dict:
    return {
        "keys": rng.choice(
            [["user_id"], ["event_type"], ["user_id", "event_type"]]
        ),
        "types": rng.sample(EVENT_TYPES, rng.randint(2, 4)) if rng.random() < 0.5 else None,
        "max_too": rng.random() < 0.5,
    }


def apply_stateful(df, cfg):
    if cfg["types"]:
        df = df.filter(F.col("event_type").isin(cfg["types"]))
    aggs = [
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("tv"),
    ]
    if cfg["max_too"]:
        aggs.append(F.max(F.col("value").cast("decimal(30,6)")).cast("double").alias("mx"))
    return df.groupBy(*cfg["keys"]).agg(*aggs)


@pytest.mark.parametrize("seed", range(5))
def test_fuzzed_stateful_totals_equal_batch(spark, sf_dir, seed):
    cfg = gen_stateful_config(random.Random(15_000 + seed))
    table = f"fuzz_stateful_{seed}"
    stream = jobs.events_stream(spark, sf_dir)
    jobs.run_to_memory(apply_stateful(stream, cfg), table)
    got = {tuple(r) for r in spark.table(table).collect()}
    batch = load_table(spark, sf_dir, "events")
    want = {tuple(r) for r in apply_stateful(batch, cfg).collect()}
    assert got == want and got, cfg


# ---------------------------------------------------------------------------
# Composed-pipeline fuzz: dropDuplicates THEN windowed aggregation in ONE
# streaming query — operator composition is where streaming planners break
# (two stateful operators chained: dedup state feeding window state).  The
# batch twin is distinct-then-aggregate over the same projection.
# ---------------------------------------------------------------------------


def gen_pipeline_config(rng: random.Random) -> dict:
    dedup_keys = rng.choice(
        [["user_id", "event_type", "ts"], ["user_id", "ts"], ["event_type", "ts"]]
    )
    return {
        "dedup_keys": dedup_keys,
        "width": rng.choice(WIDTHS),
        "watermark": rng.choice(WATERMARKS),
        # downstream grouping may only use columns INSIDE the dedup key:
        # a carried column outside it would be "first arrival wins" in the
        # stream but "all distinct combinations" in batch — legitimately
        # different answers, not a bug
        "group_type": "event_type" in dedup_keys and rng.random() < 0.5,
    }


def apply_pipeline(df, cfg, *, streaming: bool):
    cols = cfg["dedup_keys"]
    if streaming:
        dedup = (
            df.withWatermark("ts", cfg["watermark"])
            .select(*cols)
            .dropDuplicates(cols)
        )
    else:
        dedup = df.select(*cols).distinct()
    keys = [F.window("ts", cfg["width"]).alias("w")] + (
        ["event_type"] if cfg["group_type"] else []
    )
    out = dedup.groupBy(*keys).agg(F.count("*").alias("n"))
    sel = [F.col("w.start").alias("ws")] + (
        ["event_type"] if cfg["group_type"] else []
    ) + ["n"]
    return out.select(*sel)


@pytest.mark.parametrize("seed", range(5))
def test_fuzzed_dedup_then_window_equals_batch(spark, sf_dir, seed):
    cfg = gen_pipeline_config(random.Random(16_000 + seed))
    table = f"fuzz_pipe_{seed}"
    stream = jobs.events_stream(spark, sf_dir)
    jobs.run_to_memory(apply_pipeline(stream, cfg, streaming=True), table)
    got = {tuple(r) for r in spark.table(table).collect()}
    batch = load_table(spark, sf_dir, "events")
    want = {tuple(r) for r in apply_pipeline(batch, cfg, streaming=False).collect()}
    assert got == want and got, cfg
