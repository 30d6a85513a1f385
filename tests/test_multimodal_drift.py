"""Fixture-drift hardening for the multimodal family (ADVICE r3).

The round driver regenerates /root/testdata between rounds; round 3 proved
schemas and content CAN change.  The r3 advice flagged that the BMP/WAV/stub
oracles assumed non-empty pure-ASCII text (char length == byte length, no
NULLs).  This suite runs every multimodal query AND its registered oracle
over a synthetic documents table built to contain exactly the risky rows —
empty text, NULL text, multibyte UTF-8 (2/3/4-byte sequences), a lone
ASCII char, and a long mixed document — so any byte/char or empty/NULL
asymmetry between the Spark path and the DuckDB oracle fails here first,
before a drifted fixture can surface it in a driver round.
"""

from __future__ import annotations

import os

import pytest

from distributed_mapreduce_in_docker_rpyc_spark import registry
from tests.oracle import compare

TRICKY_TEXTS = [
    (0, "plain ascii words only"),
    (1, ""),  # empty: the encoder substitutes b"\x00" for BMP/WAV
    (2, None),  # NULL text ≡ empty in the multimodal contract
    (3, "café naïve résumé"),  # 2-byte UTF-8 sequences
    (4, "日本語の文書"),  # 3-byte sequences
    (5, "emoji \U0001f600\U0001f680 mix"),  # 4-byte sequences
    (6, "x"),  # single char → payload shorter than one frame
    (7, "a" * 100 + "é" * 30 + " tail words " * 20),  # > 4 frames, mixed widths
]

MULTIMODAL_QUERIES = [
    "multimodal_meta",
    "multimodal_decode_stub",
    "multimodal_decode_bmp",
    "multimodal_decode_wav",
    "multimodal_frame_sample",
    "multimodal_resize",
    "multimodal_phash",
    "multimodal_phash_pairs",
    "multimodal_pixel_histogram",
    "multimodal_wav_energy",
    "multimodal_wav_hadamard",
    "multimodal_bmp_gradient",
]


@pytest.fixture(scope="module")
def tricky_sf_dir(tmp_path_factory) -> str:
    # single parquet FILE named documents.parquet — the driver fixtures'
    # layout (a Spark .write.parquet dir would not match read_parquet here)
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = str(tmp_path_factory.mktemp("tricky-docs"))
    table = pa.table(
        {
            "doc_id": pa.array([d for d, _ in TRICKY_TEXTS], pa.int64()),
            "text": pa.array([t for _, t in TRICKY_TEXTS], pa.string()),
            "lang": pa.array(["xx"] * len(TRICKY_TEXTS), pa.string()),
            "source": pa.array(["synthetic"] * len(TRICKY_TEXTS), pa.string()),
            "n_chars": pa.array([len(t or "") for _, t in TRICKY_TEXTS], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


@pytest.mark.parametrize("name", MULTIMODAL_QUERIES)
def test_multimodal_query_survives_tricky_text(spark, tricky_sf_dir, name):
    registry.load_all()
    df = registry.QUERIES[name](spark, tricky_sf_dir)
    compare(df, registry.ORACLES[name], tricky_sf_dir)


def test_audio_constellation_ground_truth(spark, sf_dir):
    """Peaks and landmark hashes replayed in plain Python from the raw
    text bytes (the synthesized PCM source)."""
    from distributed_mapreduce_in_docker_rpyc_spark.registry import QUERIES, load_all

    load_all()
    rows = {
        r.doc_id: r
        for r in QUERIES["multimodal_audio_constellation"](spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    for d in docs:
        data = (d.text or "").encode("utf-8") or b"\x00"
        arr = [b - 128 for b in data]
        n_frames = max((len(arr) + 255) // 256, 1)
        frames = [
            sum(x * x for x in arr[i * 256 : (i + 1) * 256]) for i in range(n_frames)
        ]
        peaks = [
            (i, e)
            for i, e in enumerate(frames)
            if e > (frames[i - 1] if i > 0 else -1)
            and e > (frames[i + 1] if i + 1 < n_frames else -1)
        ]
        n_pairs = fp = 0
        for a in range(len(peaks)):
            for b in range(a + 1, min(a + 3, len(peaks))):
                (i1, e1), (i2, e2) = peaks[a], peaks[b]
                if i2 - i1 <= 8:
                    n_pairs += 1
                    fp += ((e1 % 251) * 251 + (e2 % 251)) * 64 + (i2 - i1)
        r = rows[d.doc_id]
        assert r.n_frames == n_frames
        assert r.n_peaks == len(peaks)
        assert r.n_pairs == n_pairs
        assert r.fp_checksum == fp
    assert set(rows) == {d.doc_id for d in docs}
