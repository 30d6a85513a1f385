"""Adversarial-content regression tests for the engine-agreement bisection
probes (VERDICT r7 next-round #1).

The r7 driver left exactly four hash-red queries, all source-only
engine-agreement aggregates that are green under the driver-identical local
harness — proof that the driver's regenerated fixture contains a content
class the local fixtures lack.  ``operators/queries_probes.py`` splits those
folded hashes into 20 single-property probes; this file pins that every
probe (and the re-registered agreement queries) stays Spark≡DuckDB on the
nastiest VALID content we can synthesize locally:

* documents: astral-plane codepoints (4-byte UTF-8), C0/C1 controls, a
  literal U+FFFD, NFC vs NFD composed/decomposed pairs, U+2028/29, NUL,
  empty vs NULL text, a 20k-char body, and rows whose stored ``n_chars``
  deliberately disagrees with the body's codepoint count.
* orders: NaN / +Inf / -Inf / NULL prices, finite values beyond the ±1e12
  clamp, subnormals, 0001-01-01 / 9999-12-31 timestamp extremes, and NULL
  dates.

INVALID UTF-8 (lone surrogates / WTF-8, overlong, truncated sequences) is
deliberately absent: DuckDB 1.0 rejects every such value at parquet-scan
time with InvalidInputException (verified while building this file by
writing raw Arrow buffers that bypass pyarrow's validation), so a driver
fixture containing it would have produced an oracle ERROR row, not the
observed err=None hash-red.  The probes therefore target valid-content
divergence; if the driver's newer DuckDB skips validation, the
``probe_docs_replacement_char`` + byte-sum bucket booleans will name it.
"""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

PROBE_NAMES = [
    "probe_docs_counts",
    "probe_docs_distincts",
    "probe_docs_meta_bytes",
    *[f"probe_docs_text_bytes_b{b}" for b in range(8)],
    "probe_docs_astral",
    "probe_docs_controls",
    "probe_docs_replacement_char",
    "probe_docs_len_vs_nchars",
    "probe_docs_case_mapping",
    "probe_orders_base",
    "probe_orders_dates",
    "probe_orders_priorities",
    "probe_orders_price_micro",
    "probe_orders_price_micro_bigint",
]

AGREEMENT_NAMES = [
    "jsonl_source_agreement",
    "csv_source_agreement",
    "compaction_source_agreement",
    "dataset_fingerprint_report",
]


@pytest.fixture(scope="module")
def probe_adv_dir(spark, sf_dir, tmp_path_factory) -> str:
    root = str(tmp_path_factory.mktemp("sg-probe-adv"))

    nfc = unicodedata.normalize("NFC", "étude")  # étude, composed
    nfd = unicodedata.normalize("NFD", "étude")  # same text, decomposed
    adv_docs = [
        # (doc_id, text, lang, source, n_chars_override)
        (150, "astral \U0001f600\U0001f4a9\U00010000 tail", "xx", "advsrc", None),
        (151, "controls \x01\x02\x1f\x7f\x85 tail", "en", "advsrc", None),
        (152, "replacement � char literal", "en", "advsrc", None),
        (153, nfc, "fr", "advsrc", None),
        (154, nfd, "fr", "advsrc", None),
        (155, "line para seps", "en", "advsrc", None),
        (156, "nul\x00byte", "en", "advsrc", None),
        (157, "", "en", "advsrc", None),
        (158, None, None, None, None),
        (159, "y" * 20000, "en", "advsrc", None),
        # stored n_chars deliberately wrong: len_vs_nchars must count these
        # IDENTICALLY in both engines (2 rows, known signed delta)
        (160, "four", "en", "advsrc", 7),
        (161, "\U0001f600\U0001f600", "en", "advsrc", 5),
    ]
    ids = [r[0] for r in adv_docs]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    inject = spark.createDataFrame(
        [
            (i, t, lang, src, (len(t) if t is not None else None) if nc is None else nc)
            for i, t, lang, src, nc in adv_docs
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.filter(~F.col("doc_id").isin(ids)).unionByName(inject).coalesce(
        2
    ).write.parquet(f"{root}/documents.parquet")

    nan, inf = float("nan"), float("inf")
    adv_orders = [
        (450, 1, "O", nan, "1996-01-01", "1-URGENT"),
        (451, 1, "F", inf, "1996-01-02", "2-HIGH"),
        (452, 1, "P", -inf, "1996-01-03", "3-MEDIUM"),
        (453, 1, "O", None, None, None),
        (454, 1, "F", 9.9e14, "0001-01-01", "4-NOT SPECIFIED"),
        (455, 1, "P", -8.8e13, "9999-12-31", "5-LOW"),
        (456, 1, "O", 5e-324, "1996-02-29", "pri éxotique"),
        (457, 1, "F", -0.0, "1996-01-07", ""),
        (458, 1, "P", 0.1 + 0.2, "1996-01-08", "1-URGENT"),
        (459, 1, "O", 123456.654321, "1996-01-09", "2-HIGH"),
    ]
    keys = [r[0] for r in adv_orders]
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    inject_o = spark.createDataFrame(
        adv_orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    orders.filter(~F.col("o_orderkey").isin(keys)).unionByName(
        inject_o
    ).coalesce(2).write.parquet(f"{root}/orders.parquet")
    return root


@pytest.fixture(scope="module")
def duck(probe_adv_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{probe_adv_dir}/{t}.parquet/*.parquet')"
        )
    return con


def _match(spark, con, probe_adv_dir, name):
    from distributed_mapreduce_in_docker_rpyc_spark.registry import ORACLES, QUERIES, load_all

    load_all()
    rows = QUERIES[name](spark, probe_adv_dir).collect()
    res = con.execute(ORACLES[name])
    cols = [d[0] for d in res.description]
    want = res.fetchall()
    got = [tuple(r[c] for c in cols) for r in rows]
    assert sorted(map(repr, got)) == sorted(map(repr, want)), (name, got, want)
    return got


@pytest.mark.parametrize("name", PROBE_NAMES)
def test_probe_matches_duckdb_on_adversarial_content(spark, probe_adv_dir, duck, name):
    _match(spark, duck, probe_adv_dir, name)


@pytest.mark.parametrize("name", AGREEMENT_NAMES)
def test_agreement_query_matches_duckdb_on_adversarial_content(
    spark, probe_adv_dir, duck, name
):
    _match(spark, duck, probe_adv_dir, name)


def test_char_class_probes_actually_fire(spark, probe_adv_dir, duck):
    """The char-class probes must COUNT the injected rows (a probe that
    matches DuckDB because both count zero proves nothing)."""
    from distributed_mapreduce_in_docker_rpyc_spark.registry import QUERIES, load_all

    load_all()

    def one(name):
        return QUERIES[name](spark, probe_adv_dir).collect()[0][0]

    assert one("probe_docs_astral") >= 2  # rows 150, 161
    assert one("probe_docs_controls") >= 2  # rows 151, 156
    assert one("probe_docs_replacement_char") >= 1  # row 152
    n_mismatch = QUERIES["probe_docs_len_vs_nchars"](spark, probe_adv_dir).collect()[0]
    assert n_mismatch["n_mismatch_rows"] == 2  # rows 160, 161
    assert n_mismatch["sum_len_delta"] == (4 - 7) + (2 - 5)


def test_price_census_counts_edge_values(spark, probe_adv_dir):
    from distributed_mapreduce_in_docker_rpyc_spark.registry import QUERIES, load_all

    load_all()
    row = QUERIES["probe_orders_base"](spark, probe_adv_dir).collect()[0].asDict()
    assert row["n_nan_price"] == 1
    assert row["n_posinf_price"] == 1
    assert row["n_neginf_price"] == 1
    assert row["n_null_price"] >= 1
    assert row["n_extreme_price"] >= 2  # 9.9e14 and -8.8e13? (-8.8e13 > 1e12 abs)


def test_case_mapping_probe_detects_engine_divergence(spark, tmp_path):
    """The r9 case-mapping probe must actually DIVERGE between engines on
    case-divergent codepoints — that divergence is its attribution signal
    (a red on this probe names Unicode case mapping as the cause of any
    simultaneous red on the lower()-tokenizing text queries).  U+0130
    ('İ') lowercases to 2 codepoints under the JVM's full case mapping but
    1 under DuckDB's utf8proc simple mapping; 'ß' uppercases to 'SS' (2)
    vs 'ẞ' (1); 'ﬁ' uppercases to 'FI' (2) vs itself (1).  On the clean
    fixture the probe AGREES (see PROBE_NAMES above) — this test pins that
    it fires when the content class appears."""
    import duckdb

    from distributed_mapreduce_in_docker_rpyc_spark.registry import ORACLES, QUERIES, load_all

    load_all()
    root = str(tmp_path)
    rows = [
        (1, "İstanbul", "tr", "case", 8),  # İstanbul — lower grows on JVM
        (2, "straße", "de", "case", 6),  # straße — upper grows on JVM
        (3, "ﬁnance", "en", "case", 7),  # ﬁnance — upper grows on JVM
        (4, "plain ascii", "en", "case", 11),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{root}/documents.parquet")

    got = QUERIES["probe_docs_case_mapping"](spark, root).collect()[0].asDict()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{root}/documents.parquet/*.parquet')"
    )
    res = con.execute(ORACLES["probe_docs_case_mapping"])
    want = dict(zip([d[0] for d in res.description], res.fetchone()))

    # JVM full mapping: lower('İstanbul') adds a combining dot (1 row
    # differs); upper grows 'straße' and 'ﬁnance' (2 rows differ).
    assert got["n_lower_len_diff"] == 1, got
    assert got["n_upper_len_diff"] >= 2, got
    # utf8proc simple mapping: every per-codepoint map preserves length.
    assert want["n_lower_len_diff"] == 0, want
    assert want["n_upper_len_diff"] == 0, want
    assert got != want  # the attribution signal itself
