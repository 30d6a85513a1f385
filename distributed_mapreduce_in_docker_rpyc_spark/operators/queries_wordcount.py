"""Registered word-count queries (flagship) with DuckDB oracles.

Covers SURVEY.md §2.1 OP-5 (tokenize), OP-6 (lower), OP-7/9/10 (partial/
shuffle/final count aggregation), OP-12 (global merge — implicit), OP-13
(deterministic top-20).  OP-11 (JSON sink) and OP-14 (report) are exercised in
tests (sinks aren't oracle-comparable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_mapreduce_in_docker_rpyc_spark.operators import wordcount as wc
from distributed_mapreduce_in_docker_rpyc_spark.registry import register
from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table

def _work_dir(name: str) -> str:
    """Deterministic per-process scratch directory, WIPED on every call.

    The sink/ingest queries need a filesystem path to round-trip through;
    ``tempfile.mkdtemp`` per invocation leaked one directory per run (three
    per median-of-3 bench pass — ADVICE r3).  A fixed ``<tmp>/sg-work-<name>-
    <pid>`` path makes every rerun overwrite the previous one, so a process
    owns at most one copy per query."""
    import os
    import shutil
    import tempfile

    path = os.path.join(tempfile.gettempdir(), f"sg-work-{name}-{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    return path


# Tokenizer must match functions/text.py (reference worker/worker.py:7,18).
_TOKS_CTE = """
    WITH toks AS (
        SELECT lower(unnest(regexp_extract_all(lower(text), '[A-Za-z'']+'))) AS word
        FROM documents
    )
"""


@register(
    "wordcount_top20",
    oracle=_TOKS_CTE
    + """
    SELECT word, count(*) AS cnt
    FROM toks
    GROUP BY word
    ORDER BY cnt DESC, length(word) DESC, word ASC
    LIMIT 20
    """,
)
def wordcount_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's one query, end-to-end (SURVEY.md §3.1)."""
    return wc.top_k_words(load_table(spark, sf_dir, "documents"), k=20)


@register(
    "wordcount_full",
    oracle=_TOKS_CTE
    + """
    SELECT word, count(*) AS cnt
    FROM toks
    GROUP BY word
    """,
)
def wordcount_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full per-word counts — validates OP-7/9/10 without the top-k slice."""
    return wc.word_counts(load_table(spark, sf_dir, "documents"))


@register(
    "wordcount_rdd_core",
    oracle=_TOKS_CTE
    + """
    SELECT word, count(*) AS cnt
    FROM toks
    GROUP BY word
    """,
)
def wordcount_rdd_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generic RDD map/reduce-core path (core/mapreduce.py) — same oracle
    as the DataFrame path, so the driver hash-checks the reference-paradigm
    surface too."""
    return wc.word_counts_rdd(load_table(spark, sf_dir, "documents"))


@register(
    "inverted_index_stats",
    oracle="""
    SELECT word,
           COUNT(DISTINCT doc_id) AS n_docs,
           MIN(doc_id) AS first_doc
    FROM (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS word
        FROM documents
    )
    GROUP BY word
    """,
)
def inverted_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A SECOND job on the generic map/reduce core (core/mapreduce.py),
    proving the user-pluggable surface beyond word count: map emits
    (word, {doc_id}), reduce is set-union — the classic inverted index.
    Stats (posting-list size + smallest doc) are emitted rather than the
    lists so the oracle can hash-match.

    Scale note: set-union values grow with posting-list size; at 100 TB the
    DataFrame groupBy(count_distinct) form (no per-key materialized set) is
    preferred — this query exists to exercise the paradigm surface."""
    from distributed_mapreduce_in_docker_rpyc_spark.core.mapreduce import run_mapreduce
    from distributed_mapreduce_in_docker_rpyc_spark.functions.text import tokenize_line

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rdd = docs.rdd.map(lambda r: (r[0], r[1]))

    def map_fn(row):
        doc_id, text = row
        return ((w, {doc_id}) for w in set(tokenize_line(text or "")))

    postings = run_mapreduce(rdd, map_fn, lambda a, b: a | b)
    stats = postings.map(lambda kv: (kv[0], len(kv[1]), min(kv[1])))
    return spark.createDataFrame(stats, "word string, n_docs long, first_doc long")


@register(
    "ingest_zip_wordcount",
    oracle="""
    SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS word
        FROM documents WHERE doc_id < 50
    )
    GROUP BY word
    """,
)
def ingest_zip_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-1..4 end-to-end under the oracle: stage the first 50 documents as a
    ZIP archive, run the full ingestion pipeline (URL fetch → all-members
    extract → lossy UTF-8 transcode → line scan), count words — the result
    must equal SQL word counts computed directly from the source table.
    Driver-side staging mirrors the reference's edge-loader role
    (reference coordinator/coordinator.py:17-55); at 100 TB the archives are
    pre-staged in object storage and only the scan distributes."""
    import os
    import zipfile

    from distributed_mapreduce_in_docker_rpyc_spark.operators.wordcount import word_counts
    from distributed_mapreduce_in_docker_rpyc_spark.sources import ingest

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
        .collect()
    )
    tmp = _work_dir("ingest")
    zpath = os.path.join(tmp, "corpus.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for r in sorted(docs, key=lambda r: r.doc_id):
            zf.writestr(f"doc-{r.doc_id:05d}.txt", r.text or "")  # NULL text -> 0 words, same as the oracle's regexp over NULL
    lines = ingest.ingest(spark, f"file://{zpath}", os.path.join(tmp, "staging"))
    return word_counts(lines, "value")


@register(
    "jsondict_roundtrip",
    oracle="""
    SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS word
        FROM documents WHERE doc_id < 50
    )
    GROUP BY word
    """,
)
def jsondict_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-11 (per-reducer JSON-dict sink) under the oracle: count words for
    the first 50 documents, WRITE them through the ``jsondict`` DataSource
    (the reference's ``reduce-<pid>.json`` shape, reference
    worker/worker.py:34-36), then READ the committed files back through the
    same source and hash-check against SQL word counts — proving the sink
    round-trips bytes-for-bytes, not merely that it writes something.

    Scale posture: the write is one file per reduce partition and the read
    is one input partition per file, so both sides parallelize with the
    reducer count; in production ``path`` is shared storage."""
    from distributed_mapreduce_in_docker_rpyc_spark.operators.wordcount import word_counts
    from distributed_mapreduce_in_docker_rpyc_spark.sources.jsondict_sink import register_jsondict

    register_jsondict(spark)
    counts = word_counts(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    )
    out_dir = _work_dir("jsondict")
    counts.write.format("jsondict").mode("overwrite").save(out_dir)
    return (
        spark.read.format("jsondict")
        .schema("word string, cnt long")
        .load(out_dir)
    )


@register(
    "ziptext_datasource_scan",
    oracle="""
    SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS word
        FROM documents WHERE doc_id < 50
    )
    GROUP BY word
    """,
)
def ziptext_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same ingestion contract through the format('ziptext') Python
    DataSource (sources/zip_datasource.py): stage 50 documents as a ZIP,
    scan it as a first-class source, count words against the SQL oracle."""
    import os
    import zipfile

    from distributed_mapreduce_in_docker_rpyc_spark.operators.wordcount import word_counts
    from distributed_mapreduce_in_docker_rpyc_spark.sources.zip_datasource import register_ziptext

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
        .collect()
    )
    tmp = _work_dir("ziptext")
    zpath = os.path.join(tmp, "corpus.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for r in sorted(docs, key=lambda r: r.doc_id):
            zf.writestr(f"doc-{r.doc_id:05d}.txt", r.text or "")  # NULL text -> 0 words, same as the oracle's regexp over NULL
    register_ziptext(spark)
    lines = spark.read.format("ziptext").load(zpath)
    return word_counts(lines, "value")
