"""Source-format breadth: CSV and JSONL round-trips with explicit schemas
(Spark gives these sources free — assert the engine's loaders keep values
intact), plus sketch-aggregate sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table


def _normalized(df):
    return {
        tuple(r)
        for r in df.select("event_id", "user_id", "event_type", "value").collect()
    }


def test_csv_round_trip(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    path = str(tmp_path / "events_csv")
    ev.write.option("header", True).option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(path)
    back = (
        spark.read.schema(ev.schema)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(path)
    )
    assert _normalized(back) == _normalized(ev)
    assert back.select(F.max("ts")).first()[0] == ev.select(F.max("ts")).first()[0]


def test_jsonl_round_trip(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    path = str(tmp_path / "events_jsonl")
    ev.write.json(path)  # one JSON object per line — the JSONL contract
    back = spark.read.schema(ev.schema).json(path)
    assert _normalized(back) == _normalized(ev)
    # nested JSON string column survives the trip
    want = ev.select(F.sum(F.get_json_object("props", "$.k").cast("bigint"))).first()[0]
    assert back.select(F.sum(F.get_json_object("props", "$.k").cast("bigint"))).first()[0] == want


def test_approx_count_distinct_tolerance(spark, sf_dir):
    """HLL++ sketch (mergeable, constant memory — the 100 TB COUNT DISTINCT)
    must land within its advertised relative error of the exact count."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.count_distinct("l_orderkey")).first()[0]
    approx = li.select(F.approx_count_distinct("l_orderkey", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact <= 0.05


def test_orc_round_trip(spark, sf_dir, tmp_path):
    """ORC as a second columnar format: write/read round trip preserves
    values, and predicates push into the ORC scan like parquet."""
    from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    o.write.orc(path)
    back = spark.read.orc(path)
    assert back.count() == o.count()
    q = back.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderpriority" in plan
    assert q.count() == o.filter(F.col("o_orderpriority") == "1-URGENT").count()


def test_pagerank_deterministic_top20(spark, sf_dir):
    """The iterative PageRank report is reproducible run-to-run and every
    rank respects the damping floor."""
    from distributed_mapreduce_in_docker_rpyc_spark.registry import QUERIES, load_all

    load_all()
    a = [tuple(r) for r in QUERIES["pagerank_word_graph"](spark, sf_dir).collect()]
    b = [tuple(r) for r in QUERIES["pagerank_word_graph"](spark, sf_dir).collect()]
    assert a == b and len(a) == 20
    assert all(pr >= 0.15 for _, pr in a)


def test_xml_round_trip(spark, sf_dir, tmp_path):
    """XML as a built-in source (Spark 4): write/read round trip on the
    nation dim preserves rows and schema."""
    from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_xml")
    n.write.format("xml").option("rootTag", "nations").option("rowTag", "nation").save(path)
    back = spark.read.format("xml").option("rowTag", "nation").load(path)
    cols = n.columns
    assert {tuple(r) for r in back.select(*cols).collect()} == {tuple(r) for r in n.collect()}


def test_csv_permissive_corrupt_record_capture(spark, tmp_path):
    """Malformed-input contract: PERMISSIVE mode captures bad lines in
    _corrupt_record instead of failing the job; DROPMALFORMED drops them —
    the ingest posture for dirty 100 TB feeds."""
    p = tmp_path / "dirty.csv"
    p.write_text("1,alpha,10.5\n2,beta,not_a_number\n3,gamma,7.25\nbroken line only\n")
    schema = "id INT, name STRING, score DOUBLE, _corrupt_record STRING"
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
        .cache()
    )
    assert df.count() == 4
    bad = df.filter(df._corrupt_record.isNotNull())
    assert bad.count() == 2  # bad double + short row
    ok = spark.read.schema("id INT, name STRING, score DOUBLE").option("mode", "DROPMALFORMED").csv(str(p))
    # count() alone parses zero columns, so malformed rows aren't detected —
    # materialize the full rows to exercise the drop.
    assert len(ok.collect()) == 2
    df.unpersist()


def test_observation_metrics_piggyback_on_action(spark, sf_dir):
    """The Observation API: row-level metrics (counts, sums) collected as a
    side effect of ONE pass — no second scan for pipeline telemetry."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("scan_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("n_high_discount"),
    )
    n = observed.filter(F.col("l_quantity") > 0).count()
    m = obs.get
    assert m["n_rows"] == li.count() and n <= m["n_rows"]
    assert 0 < m["n_high_discount"] < m["n_rows"]


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """approx_percentile (the 100 TB path) stays within its accuracy
    contract against the exact percentile on a skewed money column."""
    from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, array(0.5, 0.95, 0.99))").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 10000)").alias("approx"),
    ).first()
    for e, a in zip(row.exact, row.approx):
        assert abs(a - e) / e < 0.01, (e, a)


def test_jsondict_sink_writes_reference_reduce_files(spark, sf_dir, tmp_path):
    """The jsondict Python DataSource writer reproduces the reference's
    reduce output shape (one reduce-<pid>.json dict per partition,
    worker/worker.py:34-36) through the three-phase write protocol:
    per-task files, driver _SUCCESS manifest, overwrite clearing priors."""
    import json

    from distributed_mapreduce_in_docker_rpyc_spark.operators.wordcount import word_counts
    from distributed_mapreduce_in_docker_rpyc_spark.sources.jsondict_sink import register_jsondict
    from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

    register_jsondict(spark)
    docs = load_table(spark, sf_dir, "documents").select("text")
    counts = word_counts(docs)
    out = str(tmp_path / "reduce_out")

    counts.repartition(3).write.format("jsondict").mode("overwrite").save(out)

    import glob
    files = sorted(glob.glob(f"{out}/reduce-*.json"))
    assert len(files) == 3, files
    merged = {}
    for p in files:
        with open(p) as f:
            part = json.load(f)
        assert not (merged.keys() & part.keys()), "a key appeared in two reducer files"
        merged.update(part)
    expect = {r["word"]: r["cnt"] for r in counts.collect()}
    assert merged == expect

    with open(f"{out}/_SUCCESS") as f:
        manifest = json.load(f)
    assert manifest["total_keys"] == len(expect)
    assert manifest["files"] == files

    # Overwrite with fewer partitions must clear the old generation.
    counts.repartition(2).write.format("jsondict").mode("overwrite").save(out)
    files2 = sorted(glob.glob(f"{out}/reduce-*.json"))
    assert len(files2) == 2, files2


def test_binaryfile_source_feeds_multimodal_pipeline(spark, tmp_path):
    """Real media ingest path: spark.read.format('binaryFile') on raw files
    feeds the same Arrow-batched feature extraction the synthetic payloads
    use — proving the multimodal dataflow end-to-end from files on disk."""
    import hashlib

    from distributed_mapreduce_in_docker_rpyc_spark.operators.multimodal import (
        decode_stub_features,
    )

    blobs = {i: bytes([i]) * (100 + i) + b"\x89PNG" for i in range(4)}
    media = tmp_path / "media"
    media.mkdir()
    for i, b in blobs.items():
        (media / f"img_{i}.bin").write_bytes(b)

    raw = spark.read.format("binaryFile").load(str(media))
    assert set(raw.columns) == {"path", "modificationTime", "length", "content"}
    df = raw.select(
        F.regexp_extract("path", r"img_(\d+)\.bin", 1).cast("long").alias("doc_id"),
        F.col("content").alias("payload"),
    )
    feats = {r["doc_id"]: r for r in decode_stub_features(df).collect()}
    assert set(feats) == set(blobs)
    for i, b in blobs.items():
        assert feats[i]["n_bytes"] == len(b)
        assert feats[i]["payload_md5"] == hashlib.md5(b).hexdigest()
        assert feats[i]["head_hex"] == b[:8].hex()


def test_jsondict_sink_abort_cleans_up(spark, tmp_path):
    """Failed jobs must not leave partial reducer output: a task that throws
    mid-write aborts the job, and abort() removes files already committed by
    sibling tasks — no _SUCCESS, no reduce-*.json survivors."""
    import glob
    import os

    import pytest

    from distributed_mapreduce_in_docker_rpyc_spark.sources.jsondict_sink import register_jsondict

    register_jsondict(spark)
    out = str(tmp_path / "abort_out")
    df = spark.range(100).selectExpr("CAST(id AS STRING) AS k", "id AS v").repartition(4)
    poisoned = df.select(
        "k",
        F.when(F.col("v") != 99, F.col("v"))
        .otherwise(F.expr("raise_error('poison row')"))
        .alias("v"),
    )
    with pytest.raises(Exception, match="poison row"):
        poisoned.write.format("jsondict").mode("overwrite").save(out)
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))
    # Final names only ever appear at job commit (tasks write into the
    # job-scoped staging dir), so even a straggler task finishing after the
    # driver-side abort cannot leak a reduce file into the listing.
    assert glob.glob(os.path.join(out, "reduce-*.json")) == []


def test_jsondict_reader_round_trips(spark, sf_dir, tmp_path):
    """The jsondict reader turns committed reduce-<pid>.json files back into
    (key, value) rows — one input partition per file — and honors the
    _SUCCESS manifest: a stray uncommitted file in the directory is invisible
    to the scan."""
    import json

    from distributed_mapreduce_in_docker_rpyc_spark.operators.wordcount import word_counts
    from distributed_mapreduce_in_docker_rpyc_spark.sources.jsondict_sink import register_jsondict
    from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

    register_jsondict(spark)
    counts = word_counts(load_table(spark, sf_dir, "documents").select("text"))
    out = str(tmp_path / "rt_out")
    counts.repartition(3).write.format("jsondict").mode("overwrite").save(out)

    back = spark.read.format("jsondict").schema("word string, cnt long").load(out)
    assert back.rdd.getNumPartitions() == 3
    expect = {r["word"]: r["cnt"] for r in counts.collect()}
    assert {r["word"]: r["cnt"] for r in back.collect()} == expect

    # A file not listed in the manifest (e.g. an orphan from a failed job
    # attempt) must not leak into the scan.
    with open(f"{out}/reduce-99.json", "w") as f:
        json.dump({"orphan": 1}, f)
    again = spark.read.format("jsondict").schema("word string, cnt long").load(out)
    assert {r["word"]: r["cnt"] for r in again.collect()} == expect


def test_bmp_codec_round_trip():
    """Pure-Python BMP encode/decode agree on dimensions and channel sums,
    including non-multiple-of-4 row widths (padding) for every width 1..8."""
    from distributed_mapreduce_in_docker_rpyc_spark.operators.multimodal import bmp_decode, bmp_encode

    for w in range(1, 9):
        for h in (1, 3, 5):
            stream = bytes((7 * i + 13) % 256 for i in range(3 * w * h))
            data = bmp_encode(w, h, stream)
            # File size field must match the actual byte length.
            import struct

            assert struct.unpack_from("<I", data, 2)[0] == len(data)
            dw, dh, sr, sg, sb = bmp_decode(data)
            assert (dw, dh) == (w, h)
            assert sr == sum(stream[0::3])
            assert sg == sum(stream[1::3])
            assert sb == sum(stream[2::3])


def test_bmp_decode_rejects_non_bmp():
    import pytest

    from distributed_mapreduce_in_docker_rpyc_spark.operators.multimodal import bmp_decode

    with pytest.raises(ValueError, match="not a BMP"):
        bmp_decode(b"\x89PNG" + b"\x00" * 60)


def test_multimodal_decode_bmp_matches_text_bytes(spark, sf_dir):
    """Spark encode→decode pipeline over real documents equals channel sums
    computed directly from the tiled text bytes in Python."""
    from distributed_mapreduce_in_docker_rpyc_spark.operators.multimodal import (
        attach_bmp_payload,
        decode_image,
    )
    from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    got = {r["doc_id"]: r for r in decode_image(attach_bmp_payload(docs)).collect()}
    for r in docs.select("doc_id", "text").collect():
        b = r["text"].encode() or b"\x00"
        n = len(b)
        w, h = 1 + (n * 7) % 16, 1 + (n * 13) % 16
        stream = bytes(b[i % n] for i in range(3 * w * h))
        row = got[r["doc_id"]]
        assert (row["width"], row["height"]) == (w, h)
        assert row["sum_r"] == sum(stream[0::3])
        assert row["sum_g"] == sum(stream[1::3])
        assert row["sum_b"] == sum(stream[2::3])


def test_wav_codec_round_trip():
    """RIFF/WAVE encode/decode agree, including chunk-walk past an inserted
    LIST chunk and odd-length data (word alignment)."""
    import struct

    from distributed_mapreduce_in_docker_rpyc_spark.operators.multimodal import wav_decode, wav_encode

    for n in (1, 2, 7, 100):
        samples = bytes((11 * i + 3) % 256 for i in range(n))
        data = wav_encode(samples)
        ns, rate, s, peak = wav_decode(data)
        assert (ns, rate, s, peak) == (n, 8000, sum(samples), max(samples))

    # Insert a LIST chunk between fmt and data: the chunk walker must skip it.
    samples = bytes(range(5))
    data = wav_encode(samples)
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 7) + b"INFOxyz" + b"\x00"  # odd size, padded
    spliced = data[:fmt_end] + extra + data[fmt_end:]
    assert wav_decode(spliced) == (5, 8000, sum(samples), max(samples))


def test_wav_decode_rejects_non_wav():
    import pytest

    from distributed_mapreduce_in_docker_rpyc_spark.operators.multimodal import wav_decode

    with pytest.raises(ValueError, match="not a WAV"):
        wav_decode(b"OggS" + b"\x00" * 40)


def test_jsondict_append_merges_manifest_and_validates_collisions(spark, tmp_path):
    """Append commit merges the prior generation's manifest (earlier files
    must stay visible to the manifest-honoring reader) and validates ALL
    collisions before promoting ANY file (ADVICE r3)."""
    import glob
    import json

    import pytest

    from distributed_mapreduce_in_docker_rpyc_spark.sources.jsondict_sink import register_jsondict

    register_jsondict(spark)
    out = str(tmp_path / "append_out")

    gen1 = spark.createDataFrame([("a", 1), ("b", 2)], "key string, value long")
    gen1.repartition(1).write.format("jsondict").mode("overwrite").save(out)

    # second generation writes a DIFFERENT partition id by renaming gen1's
    # file out of the way is not possible — instead append 2 partitions and
    # expect the collision with reduce-0.json to be rejected up front,
    # leaving the first generation fully intact and fully listed
    gen2 = spark.createDataFrame([("c", 3), ("d", 4)], "key string, value long")
    with pytest.raises(Exception, match="collide"):
        gen2.repartition(1).write.format("jsondict").mode("append").save(out)
    with open(f"{out}/_SUCCESS") as f:
        manifest = json.load(f)
    assert manifest["files"] == sorted(glob.glob(f"{out}/reduce-*.json"))
    assert manifest["total_keys"] == 2

    # a non-colliding append (prior generation moved to a fresh name range
    # via a 2-partition write over a 1-partition prior is still partition 0
    # collision) — emulate by appending into a directory whose existing
    # file ids do not overlap: write gen1 as partition 1 only
    out2 = str(tmp_path / "append_out2")
    gen1.repartition(2).write.format("jsondict").mode("overwrite").save(out2)
    # drop one generation-1 file from disk AND manifest to free id 0
    files = sorted(glob.glob(f"{out2}/reduce-*.json"))
    assert len(files) == 2
    import os

    os.remove(files[0])
    with open(f"{out2}/_SUCCESS") as f:
        m = json.load(f)
    kept = [p for p in m["files"] if p != files[0]]
    with open(f"{out2}/_SUCCESS", "w") as f:
        json.dump({"files": kept, "total_keys": 2}, f)

    gen3 = spark.createDataFrame([("x", 9)], "key string, value long")
    gen3.repartition(1).write.format("jsondict").mode("append").save(out2)
    with open(f"{out2}/_SUCCESS") as f:
        merged = json.load(f)
    # merged manifest lists BOTH the surviving gen-1 file and the new one
    assert set(merged["files"]) == set(kept) | {f"{out2}/reduce-0.json"}
    assert merged["total_keys"] == 2 + 1
    rows = (
        spark.read.format("jsondict").schema("key string, value long").load(out2).collect()
    )
    assert len(rows) >= 2


def test_partitioned_write_prunes_at_directory_level(spark, sf_dir):
    """The read-back scan must carry the priority predicate as a
    PartitionFilter (directory pruning), not a data filter, and the
    roundtrip aggregate must match the direct query on the source."""
    from distributed_mapreduce_in_docker_rpyc_spark.operators._shared import work_dir
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = f"{work_dir('partwrite-test')}/orders_by_priority"
    o.write.partitionBy("o_orderpriority").parquet(path)
    back = spark.read.parquet(path).filter(F.col("o_orderpriority") == "1-URGENT")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderpriority" in m.group(1)
    # data equality through the layout
    got = back.count()
    want = o.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert got == want


def test_xml_roundtrip_deviations_zero(spark, oracle_sf_dir):
    """Spark 4 built-in XML write→read must be lossless on the lineitem
    slice: every deviation column zero, signature imbalance zero."""
    from distributed_mapreduce_in_docker_rpyc_spark.registry import QUERIES, load_all

    load_all()
    row = QUERIES["xml_roundtrip"](spark, oracle_sf_dir).collect()[0].asDict()
    assert row == {
        "dev_n_rows": 0,
        "dev_sum_key": 0,
        "dev_n_flags": 0,
        "dev_min_ship": 0,
        "dev_max_ship": 0,
        "n_rows_changed": 0,
    }
