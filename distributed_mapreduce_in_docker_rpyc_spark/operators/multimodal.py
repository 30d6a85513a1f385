"""Multimodal column pattern: opaque binary payloads + typed metadata.

Extended scope (SURVEY.md §2.2: the reference processes UTF-8 text only).

The engine treats image/audio/video as ``binary`` columns with a metadata
struct, processed by Arrow-batched pandas iterators (``mapInPandas``) — the
Spark-side plumbing (schema, batching, partitioning) is real and tested; the
actual media decode is STUBBED because media libraries are not available in
this environment:

  - ``decode_stub_features`` computes deterministic fake features from the
    raw bytes (length, crc32, head bytes) — exercising the exact dataflow a
    real decoder would use.
  - ``decode_image`` raises ``NotImplementedError`` unless PIL is installed
    (import-try gate), documenting the intended real path.

Scale posture: payload bytes never pass through Python row-at-a-time — each
mapInPandas batch moves via Arrow; feature extraction is embarrassingly
parallel per partition; binary columns stay out of shuffle keys.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not installed in this environment
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

FEATURE_SCHEMA = "doc_id long, n_bytes long, crc32 long, head_hex string"


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize the multimodal shape from text fixtures: a binary payload
    column + metadata struct (modality tag, byte length). With real media the
    payload would come from ``spark.read.format('binaryFile')``."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
        ),
    )


def decode_stub_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake 'decode': per-batch pandas iterator over the binary
    payload, emitting byte-level features. Swap the body for PIL/librosa/av
    decoding — the batching, schema and partitioning stay identical."""

    def per_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "crc32": payloads.map(lambda b: zlib.crc32(bytes(b)) & 0xFFFFFFFF).astype("int64"),
                    "head_hex": payloads.map(lambda b: bytes(b)[:8].hex()),
                }
            )

    return df.select(id_col, "payload").mapInPandas(per_batch, schema=FEATURE_SCHEMA)


def decode_image(df: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """Real image decode path (resize / RGB histogram / EXIF) — requires PIL.

    Kept as an explicit gate so the operator inventory is honest about what
    runs here vs on a properly-provisioned cluster."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; this environment has no media libraries. "
            "Use decode_stub_features for the dataflow-equivalent stub."
        )
    raise NotImplementedError("wire PIL decode into the mapInPandas batch loop")


FRAME_BYTES = 16
FRAME_SCHEMA = "doc_id long, frame_idx long, frame_hash string"
RESIZE_SCHEMA = "doc_id long, orig_w long, orig_h long, thumb_w long, thumb_h long"


def sample_frames(df: DataFrame, k: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Video frame-sampling pattern: one output row per sampled frame.

    The payload is treated as a fake container of 16-byte "frames"; ``k``
    evenly-spaced frames are sampled (all of them when the clip is shorter)
    and fingerprinted with md5 — a deterministic stand-in for an av/ffmpeg
    keyframe extractor with the identical flatMap dataflow: binary in via
    Arrow, multiple typed rows out per input. Swap the loop body for real
    demuxing; the schema, batching and fan-out shape stay."""
    import hashlib

    def per_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            ids: list[int] = []
            idxs: list[int] = []
            hashes: list[str] = []
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                n_frames = max(len(b) // FRAME_BYTES, 1)
                kk = min(k, n_frames)
                for ix in sorted({(j * n_frames) // kk for j in range(kk)}):
                    ids.append(did)
                    idxs.append(ix)
                    hashes.append(
                        hashlib.md5(b[ix * FRAME_BYTES : (ix + 1) * FRAME_BYTES]).hexdigest()
                    )
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_hash": hashes})

    return df.select(id_col, "payload").mapInPandas(per_batch, schema=FRAME_SCHEMA)


def resize_thumbnail(df: DataFrame, box: int = 64, id_col: str = "doc_id") -> DataFrame:
    """Image-resize pattern: fit (orig_w, orig_h) into a ``box``×``box``
    thumbnail preserving aspect ratio, integer math only.

    Original dimensions are derived deterministically from the payload size
    (no real decoder available); the aspect-fit arithmetic and the
    NumPy-vectorized Arrow batch path are exactly what a PIL ``thumbnail()``
    stage would use."""
    import numpy as np

    def per_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            n = pdf["payload"].map(len).to_numpy(dtype="int64")
            w = 1 + (n * 7) % 640
            h = 1 + (n * 13) % 480
            longest = np.maximum(w, h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "orig_w": w,
                    "orig_h": h,
                    "thumb_w": np.maximum(1, (w * box) // longest),
                    "thumb_h": np.maximum(1, (h * box) // longest),
                }
            )

    return df.select(id_col, "payload").mapInPandas(per_batch, schema=RESIZE_SCHEMA)
