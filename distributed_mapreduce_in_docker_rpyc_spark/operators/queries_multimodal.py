"""Registered multimodal queries.

Extended scope: the reference has no multimodal/binary handling at all
(SURVEY.md §2.2 - its only payload is UTF-8 text, reference
coordinator/coordinator.py:45-49); this family is the training-data-pipeline
extension mandated by SURVEY.md §7 M4.

Every query in this family is hash-checked: the oracles recompute the
byte-level features from the UTF-8 BYTES of text (hex-string byte math, not
char functions), with NULL ≡ empty text, so they hold under fixture drift —
multibyte or empty documents included (tests/test_multimodal_drift.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_mapreduce_in_docker_rpyc_spark.operators import multimodal as mm
from distributed_mapreduce_in_docker_rpyc_spark.registry import register
from distributed_mapreduce_in_docker_rpyc_spark.sources.tables import load_table


@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           ascii(substr(text, 1, 1)) AS first_char_code
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the binary payload column (byte length, content
    hash, head byte) — the schema pattern for opaque media columns."""
    docs = mm.attach_payload(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.md5("text").alias("content_md5"),
        F.ascii(F.substring("text", 1, 1)).alias("first_char_code"),
    )


@register(
    "multimodal_decode_stub",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT) AS n_bytes,
           md5(COALESCE(text, '')) AS payload_md5,
           lower(substr(hex(encode(COALESCE(text, ''))), 1, 16)) AS head_hex
    FROM documents
    """,
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic media decode dataflow over Arrow batches (see multimodal.py)
    with engine-portable byte features (length, md5, head bytes), so the
    Python batch loop hash-checks against SQL recomputing them from the
    source column.  The format-specific REAL decoders are
    ``multimodal_decode_bmp`` / ``multimodal_decode_wav``."""
    docs = mm.attach_payload(load_table(spark, sf_dir, "documents"))
    return mm.decode_stub_features(docs)


@register(
    "multimodal_decode_bmp",
    oracle="""
    WITH raw AS (
        /* UTF-8 BYTES via hex (char functions would drift on multibyte
           text); empty/NULL text becomes the single zero byte the encoder
           substitutes, so the modulo below is never over zero */
        SELECT doc_id,
               CASE WHEN octet_length(encode(COALESCE(text, ''))) = 0 THEN '00'
                    ELSE hex(encode(text)) END AS hx
        FROM documents
    ),
    dims AS (
        SELECT doc_id, hx, length(hx) // 2 AS n,
               1 + ((length(hx) // 2) * 7) % 16 AS w,
               1 + ((length(hx) // 2) * 13) % 16 AS h
        FROM raw
    )
    SELECT doc_id,
           CAST(width AS BIGINT) AS width,
           CAST(height AS BIGINT) AS height,
           CAST(SUM(CASE WHEN j % 3 = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
           CAST(SUM(CASE WHEN j % 3 = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
           CAST(SUM(CASE WHEN j % 3 = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b
    FROM (
        SELECT d.doc_id, d.w AS width, d.h AS height, g.j AS j,
               (strpos('0123456789ABCDEF', substr(d.hx, 2 * (g.j % d.n) + 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(d.hx, 2 * (g.j % d.n) + 2, 1)) - 1) AS v
        FROM dims d, unnest(generate_series(0, 3 * d.w * d.h - 1)) AS g(j)
    )
    GROUP BY doc_id, width, height
    """,
)
def multimodal_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode under the oracle (VERDICT r2 #6): text bytes are
    tiled into a w×h RGB raster and serialized as genuine 24-bit BMP files
    (headers, BGR rows, bottom-up order, 4-byte row padding), then a second
    Arrow stage parses the BMPs back — header validation, padding strip,
    row-order inversion — and emits dimensions + per-channel pixel sums.
    The oracle recomputes the sums straight from the text bytes, so any
    encode/decode asymmetry (padding read as pixels, channel swap, row-order
    bug) breaks the hash."""
    docs = load_table(spark, sf_dir, "documents")
    return mm.decode_image(mm.attach_bmp_payload(docs))


@register(
    "multimodal_decode_wav",
    oracle="""
    WITH raw AS (
        /* UTF-8 BYTES via hex; empty/NULL text becomes the single zero
           byte the encoder substitutes (see attach_wav_payload) */
        SELECT doc_id,
               CASE WHEN octet_length(encode(COALESCE(text, ''))) = 0 THEN '00'
                    ELSE hex(encode(text)) END AS hx
        FROM documents
    )
    SELECT doc_id,
           CAST(length(hx) // 2 AS BIGINT) AS n_samples,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(SUM(v) AS BIGINT) AS sum_amplitude,
           CAST(MAX(v) AS BIGINT) AS peak
    FROM (
        SELECT r.doc_id, r.hx,
               (strpos('0123456789ABCDEF', substr(r.hx, 2 * g.j + 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(r.hx, 2 * g.j + 2, 1)) - 1) AS v
        FROM raw r, unnest(generate_series(0, length(r.hx) // 2 - 1)) AS g(j)
    )
    GROUP BY doc_id, hx
    """,
)
def multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode under the oracle: document bytes become 8-bit PCM
    samples in genuine RIFF/WAVE containers, then a chunk-walking parser
    recovers sample count, rate, amplitude sum and peak — hash-checked
    against SQL recomputing the same stats from the text bytes."""
    docs = load_table(spark, sf_dir, "documents")
    return mm.decode_audio(mm.attach_wav_payload(docs))


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH raw AS (
        SELECT doc_id, lower(hex(encode(COALESCE(text, '')))) AS hx
        FROM documents
    ),
    meta AS (
        SELECT doc_id, hx,
               greatest((length(hx) // 2) // 16, 1) AS n_frames,
               least(4, greatest((length(hx) // 2) // 16, 1)) AS kk
        FROM raw
    ),
    idx AS (
        SELECT DISTINCT doc_id, hx, (j.j * n_frames) // kk AS frame_idx
        FROM meta, generate_series(0, 3) j(j)
        WHERE j.j < kk
    )
    SELECT doc_id, frame_idx,
           md5(substr(hx, CAST(frame_idx * 32 + 1 AS INTEGER), 32)) AS frame_hash
    FROM idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the fake video container: 4 evenly-spaced 16-byte
    frames per payload, fingerprinted as md5 of each frame's lowercase-hex
    rendering (engine-portable: works for multibyte and empty text, where
    raw-byte hashing could not be SQL-replayed). The mapInPandas fan-out
    result is hash-checked against the oracle recomputing the same frames
    from the UTF-8 BYTES of text."""
    docs = mm.attach_payload(load_table(spark, sf_dir, "documents"))
    return mm.sample_frames(docs, k=4)


@register(
    "multimodal_resize",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               1 + (octet_length(encode(COALESCE(text, ''))) * 7) % 640 AS orig_w,
               1 + (octet_length(encode(COALESCE(text, ''))) * 13) % 480 AS orig_h
        FROM documents
    )
    SELECT doc_id, orig_w, orig_h,
           greatest(1, (orig_w * 64) // greatest(orig_w, orig_h)) AS thumb_w,
           greatest(1, (orig_h * 64) // greatest(orig_w, orig_h)) AS thumb_h
    FROM dims
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving thumbnail-fit arithmetic over Arrow batches —
    oracle-checked integer math, PIL-shaped dataflow."""
    docs = mm.attach_payload(load_table(spark, sf_dir, "documents"))
    return mm.resize_thumbnail(docs, box=64)


@register(
    "multimodal_phash",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               CASE WHEN octet_length(encode(COALESCE(text, ''))) = 0 THEN '00'
                    ELSE hex(encode(text)) END AS hx
        FROM documents
    ),
    dims AS (
        SELECT doc_id, hx, length(hx) // 2 AS n,
               1 + ((length(hx) // 2) * 7) % 16 AS w,
               1 + ((length(hx) // 2) * 13) % 16 AS h
        FROM raw
    ),
    scored AS (
        SELECT d.doc_id, d.w, d.h, g.c,
               (strpos('0123456789ABCDEF', substr(d.hx, 2 * ((kk.k + 0) % d.n) + 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(d.hx, 2 * ((kk.k + 0) % d.n) + 2, 1)) - 1)
             + (strpos('0123456789ABCDEF', substr(d.hx, 2 * ((kk.k + 1) % d.n) + 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(d.hx, 2 * ((kk.k + 1) % d.n) + 2, 1)) - 1)
             + (strpos('0123456789ABCDEF', substr(d.hx, 2 * ((kk.k + 2) % d.n) + 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(d.hx, 2 * ((kk.k + 2) % d.n) + 2, 1)) - 1)
               AS s
        FROM dims d,
             unnest(generate_series(0, 63)) AS g(c),
             LATERAL (SELECT 3 * (((2 * (g.c // 8) + 1) * d.h // 16) * d.w
                               + ((2 * (g.c % 8) + 1) * d.w // 16)) AS k) AS kk
    ),
    means AS (SELECT doc_id, sum(s) / 64.0 AS mean FROM scored GROUP BY doc_id),
    bits AS (
        SELECT sc.doc_id, sc.w, sc.h, sc.c,
               CASE WHEN sc.s >= m.mean THEN 1 ELSE 0 END AS b
        FROM scored sc JOIN means m USING (doc_id)
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           lpad(lower(to_hex(sum(CASE WHEN c >= 32 THEN CAST(b AS BIGINT) << (c - 32) ELSE 0 END))), 8, '0')
        || lpad(lower(to_hex(sum(CASE WHEN c <  32 THEN CAST(b AS BIGINT) << c        ELSE 0 END))), 8, '0')
               AS phash,
           CAST(sum(b) AS BIGINT) AS n_set_bits
    FROM bits
    GROUP BY doc_id, w, h
    """,
)
def multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash over REAL decoded images — the image-side
    near-duplicate fingerprint (aHash, nearest-neighbor variant; SimHash's
    multimodal sibling): BMP payloads are genuinely parsed back to pixels
    (``multimodal.bmp_pixels`` — BGR flip, bottom-up rows, padding), an
    8x8 grid of pixel centers is sampled, and each sample's channel sum is
    thresholded against the 64-sample mean into a 64-bit hex hash.  The
    oracle replays every sampled byte from the SOURCE bytes, so any decode
    asymmetry flips bits and breaks the hash; the mean is a /64 (power of
    two) division, exact in both engines, so the >= threshold compare is
    bit-stable.

    Scale posture: decode + hash stay inside one Arrow batch pass
    (mapInPandas); output is 16 hex chars per image.  Pair-finding on the
    hashes reuses the SimHash band-join machinery unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    return mm.phash_image(mm.attach_bmp_payload(docs))


_PHASH_ORACLE_CTES = """
    WITH raw AS (
        SELECT doc_id,
               CASE WHEN octet_length(encode(COALESCE(text, ''))) = 0 THEN '00'
                    ELSE hex(encode(text)) END AS hx
        FROM documents
    ),
    dims AS (
        SELECT doc_id, hx, length(hx) // 2 AS n,
               1 + ((length(hx) // 2) * 7) % 16 AS w,
               1 + ((length(hx) // 2) * 13) % 16 AS h
        FROM raw
    ),
    scored AS (
        SELECT d.doc_id, g.c,
               (strpos('0123456789ABCDEF', substr(d.hx, 2 * ((kk.k + 0) % d.n) + 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(d.hx, 2 * ((kk.k + 0) % d.n) + 2, 1)) - 1)
             + (strpos('0123456789ABCDEF', substr(d.hx, 2 * ((kk.k + 1) % d.n) + 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(d.hx, 2 * ((kk.k + 1) % d.n) + 2, 1)) - 1)
             + (strpos('0123456789ABCDEF', substr(d.hx, 2 * ((kk.k + 2) % d.n) + 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(d.hx, 2 * ((kk.k + 2) % d.n) + 2, 1)) - 1)
               AS s
        FROM dims d,
             unnest(generate_series(0, 63)) AS g(c),
             LATERAL (SELECT 3 * (((2 * (g.c // 8) + 1) * d.h // 16) * d.w
                               + ((2 * (g.c % 8) + 1) * d.w // 16)) AS k) AS kk
    ),
    means AS (SELECT doc_id, sum(s) / 64.0 AS mean FROM scored GROUP BY doc_id),
    hashes AS (
        SELECT sc.doc_id,
               sum(CASE WHEN sc.c >= 32 THEN CAST(CASE WHEN sc.s >= m.mean THEN 1 ELSE 0 END AS BIGINT) << (sc.c - 32) ELSE 0 END) AS hi,
               sum(CASE WHEN sc.c <  32 THEN CAST(CASE WHEN sc.s >= m.mean THEN 1 ELSE 0 END AS BIGINT) << sc.c        ELSE 0 END) AS lo
        FROM scored sc JOIN means m USING (doc_id)
        GROUP BY sc.doc_id
    )
"""


@register(
    "multimodal_phash_pairs",
    oracle=_PHASH_ORACLE_CTES
    + """
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT)
               AS hamming
    FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 6
    """,
)
def multimodal_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual hash: band the 64-bit aHash
    into 8 bytes, equi-join on any shared (band, value) to get candidates,
    then keep pairs within hamming distance 6 — pigeonhole-EXACT (6 wrong
    bits can dirty at most 6 of 8 bands, so every qualifying pair shares a
    clean band), the image twin of ``dedup_simhash_pairs``.  The oracle
    recomputes the hashes from source bytes and checks ALL pairs — at test
    scale the quadratic reference is affordable; the Spark side stays
    banded.

    Scale posture: candidates come from 8 equi-joins on uniform byte-band
    keys (never all-pairs); the hamming rerank touches only candidates."""
    docs = load_table(spark, sf_dir, "documents")
    hashes = mm.phash_image(mm.attach_bmp_payload(docs)).select(
        "doc_id",
        F.conv(F.substring("phash", 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring("phash", 9, 8), 16, 10).cast("long").alias("lo"),
        "phash",
    )
    bands = hashes.select(
        "doc_id",
        "hi",
        "lo",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(7)),
                lambda i: F.substring("phash", i * 2 + 1, 2),
            )
        ).alias("band_idx", "band_val"),
    )
    left = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hi").alias("hi_a"),
        F.col("lo").alias("lo_a"),
        "band_idx",
        "band_val",
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hi").alias("hi_b"),
        F.col("lo").alias("lo_b"),
        "band_idx",
        "band_val",
    )
    cand = (
        left.join(right, ["band_idx", "band_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "hi_a", "lo_a", "hi_b", "lo_b")
        .distinct()
    )
    hamming = F.bit_count(
        F.col("hi_a").bitwiseXOR(F.col("hi_b"))
    ) + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    return cand.select(
        "doc_a", "doc_b", hamming.cast("long").alias("hamming")
    ).where(F.col("hamming") <= 6)


@register(
    "multimodal_wav_energy",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               CASE WHEN octet_length(encode(COALESCE(text, ''))) = 0 THEN '00'
                    ELSE hex(encode(text)) END AS hx
        FROM documents
    ),
    samples AS (
        SELECT r.doc_id, g.j // 256 AS frame_idx,
               (strpos('0123456789ABCDEF', substr(r.hx, 2 * g.j + 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(r.hx, 2 * g.j + 2, 1)) - 1) - 128 AS v
        FROM raw r, unnest(generate_series(0, length(r.hx) // 2 - 1)) AS g(j)
    ),
    frames AS (
        SELECT doc_id, frame_idx, SUM(v * v) AS energy
        FROM samples GROUP BY doc_id, frame_idx
    ),
    ranked AS (
        SELECT doc_id, frame_idx, energy,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY energy DESC, frame_idx ASC) AS rk
        FROM frames
    )
    SELECT f.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(SUM(f.energy) AS BIGINT) AS total_energy,
           CAST(MAX(CASE WHEN r.rk = 1 THEN r.frame_idx END) AS BIGINT) AS peak_frame_idx,
           CAST(MAX(CASE WHEN r.rk = 1 THEN r.energy END) AS BIGINT) AS peak_frame_energy
    FROM frames f JOIN ranked r ON r.doc_id = f.doc_id AND r.frame_idx = f.frame_idx
    GROUP BY f.doc_id
    """,
)
def multimodal_wav_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio energy (VAD/loudness front end): every document's WAV
    payload is decoded and its 8-bit PCM stream split into 256-sample
    frames; the report carries frame count, total energy, and the peak
    frame (index + energy, ties to the earlier frame).  Energy is the
    exact integer sum of squared midpoint deviations, so the whole frame
    walk hash-checks against SQL recomputing it from the text bytes.

    Scale posture: the samples never become rows — each Arrow batch
    reshapes its payloads in NumPy and emits ONE row per document; the
    shuffle-free mapInPandas is the entire job (the oracle's per-sample
    unnest is the oracle's problem, not the engine's)."""
    docs = load_table(spark, sf_dir, "documents")
    return mm.frame_energies(mm.attach_wav_payload(docs))


@register(
    "multimodal_pixel_histogram",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               CASE WHEN octet_length(encode(COALESCE(text, ''))) = 0 THEN '00'
                    ELSE hex(encode(text)) END AS hx
        FROM documents
    ),
    meta AS (
        SELECT doc_id, hx, length(hx) // 2 AS n,
               3 * (1 + ((length(hx) // 2) * 7) % 16)
                 * (1 + ((length(hx) // 2) * 13) % 16) AS t
        FROM raw
    ),
    bytes AS (
        /* byte i of the source appears ceil((T - i)/n) times in the cycled
           (w x h) raster — counted arithmetically, never unrolled to T rows */
        SELECT doc_id,
               strpos('0123456789ABCDEF', substr(hx, 2 * g.i + 1, 1)) - 1 AS bucket,
               (t - g.i + n - 1) // n AS cnt
        FROM meta, unnest(generate_series(0, n - 1)) AS g(i)
        WHERE g.i < t  /* a raster SHORTER than the source truncates the cycle */
    )
    SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
           CAST(SUM(cnt) AS BIGINT) AS n_bytes
    FROM bytes GROUP BY doc_id, bucket
    """,
)
def multimodal_pixel_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image 16-bin pixel histogram (high nibble of every raster byte)
    decoded from the real BMP container — the exposure/value-distribution
    profile an image-quality gate reads before expensive model scoring.
    The oracle reproduces the tiled raster's byte multiplicities
    ARITHMETICALLY (byte i of an n-byte source appears ceil((T−i)/n)
    times in the T-byte cycle), so it never materializes per-pixel rows.

    Scale posture: pixels never become rows engine-side either — NumPy
    bincount per Arrow batch, ≤16 output rows per image, shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    return mm.pixel_histograms(mm.attach_bmp_payload(docs))


@register(
    "multimodal_wav_hadamard",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               CASE WHEN octet_length(encode(COALESCE(text, ''))) = 0 THEN '00'
                    ELSE hex(encode(text)) END AS hx
        FROM documents
    ),
    samples AS (
        SELECT r.doc_id, g.j,
               (strpos('0123456789ABCDEF', substr(r.hx, 2 * g.j + 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(r.hx, 2 * g.j + 2, 1)) - 1) - 128 AS v
        FROM raw r,
             unnest(generate_series(0, least(length(r.hx) // 2, 64) - 1)) AS g(j)
    ),
    ks AS (SELECT unnest(generate_series(0, 63)) AS k),
    coefs AS (
        SELECT s.doc_id, ks.k,
               SUM(s.v * (1 - 2 * (bit_count(CAST(ks.k AS BIGINT)
                                             & CAST(s.j AS BIGINT)) % 2))) AS coef
        FROM samples s CROSS JOIN ks
        GROUP BY s.doc_id, ks.k
    )
    SELECT d.doc_id, CAST(ks.k AS BIGINT) AS seq_idx,
           CAST(COALESCE(c.coef, 0) AS BIGINT) AS coef,
           CAST(COALESCE(c.coef, 0) * COALESCE(c.coef, 0) AS BIGINT) AS energy
    FROM documents d
    CROSS JOIN ks
    LEFT JOIN coefs c ON c.doc_id = d.doc_id AND c.k = ks.k
    """,
)
def multimodal_wav_hadamard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walsh–Hadamard sequency spectrum of each audio clip's first 64 PCM
    samples — the integer-exact spectral front end (all WHT weights are ±1,
    so the 64 coefficients are pure integer arithmetic where a cos/sin DFT
    would drift by libm ulps between engines).  Parseval holds exactly:
    Σ_k coef² = 64 · Σ_j v_j², property-tested.  Every document emits
    exactly 64 (sequency, coefficient, energy) rows; absent samples are
    silence (v = 0).

    Scale posture: the transform is a 64×64 integer matmul per clip inside
    the Arrow batch (samples never become rows engine-side; the oracle's
    per-sample unnest is the oracle's cost, not the engine's), shuffle-free
    end to end."""
    docs = load_table(spark, sf_dir, "documents")
    return mm.hadamard_spectrum(mm.attach_wav_payload(docs))


@register(
    "multimodal_bmp_gradient",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               CASE WHEN octet_length(encode(COALESCE(text, ''))) = 0 THEN '00'
                    ELSE hex(encode(text)) END AS hx
        FROM documents
    ),
    meta AS (
        SELECT doc_id, hx, length(hx) // 2 AS n,
               1 + ((length(hx) // 2) * 7) % 16 AS w,
               1 + ((length(hx) // 2) * 13) % 16 AS h
        FROM raw
    ),
    grads AS (
        /* raster byte at position t is source byte (t mod n); same-channel
           horizontal neighbors are 3 bytes apart, pairs stay inside a row */
        SELECT m.doc_id,
               abs(((strpos('0123456789ABCDEF', substr(m.hx, 2 * ((g.t + 3) % m.n) + 1, 1)) - 1) * 16
                  + (strpos('0123456789ABCDEF', substr(m.hx, 2 * ((g.t + 3) % m.n) + 2, 1)) - 1))
                 - ((strpos('0123456789ABCDEF', substr(m.hx, 2 * (g.t % m.n) + 1, 1)) - 1) * 16
                  + (strpos('0123456789ABCDEF', substr(m.hx, 2 * (g.t % m.n) + 2, 1)) - 1))) AS d
        FROM meta m,
             unnest(generate_series(0, 3 * m.w * m.h - 1)) AS g(t)
        WHERE (g.t % (3 * m.w)) < 3 * m.w - 3
    ),
    agg AS (
        SELECT doc_id, SUM(d) AS grad_energy FROM grads GROUP BY doc_id
    )
    SELECT m.doc_id, CAST(m.w AS BIGINT) AS width, CAST(m.h AS BIGINT) AS height,
           CAST(COALESCE(a.grad_energy, 0) AS BIGINT) AS grad_energy,
           CASE WHEN m.w > 1
                THEN CAST(COALESCE(a.grad_energy, 0) AS DOUBLE)
                     / CAST(m.h * (3 * m.w - 3) AS DOUBLE)
                ELSE 0.0 END AS mean_abs_grad
    FROM meta m LEFT JOIN agg a ON a.doc_id = m.doc_id
    """,
)
def multimodal_bmp_gradient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image sharpness profile: per-image horizontal gradient energy
    (sum of |same-channel byte difference| between neighboring pixels,
    within raster rows) decoded from the real BMP container — the
    blur/flatness signal a vision-training quality gate uses to drop
    uniform or out-of-focus images.  Integer-exact; the oracle recomputes
    the cycled raster's byte pairs arithmetically from the source bytes.

    Scale posture: NumPy row-diff per Arrow batch, one output row per
    image, shuffle-free (the oracle's per-byte unnest is its own cost)."""
    docs = load_table(spark, sf_dir, "documents")
    return mm.gradient_energies(mm.attach_bmp_payload(docs))


@register(
    "multimodal_audio_constellation",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               CASE WHEN octet_length(encode(COALESCE(text, ''))) = 0 THEN '00'
                    ELSE hex(encode(text)) END AS hx
        FROM documents
    ),
    samples AS (
        SELECT r.doc_id, g.j // 256 AS frame_idx,
               (strpos('0123456789ABCDEF', substr(r.hx, 2 * g.j + 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(r.hx, 2 * g.j + 2, 1)) - 1) - 128 AS v
        FROM raw r, unnest(generate_series(0, length(r.hx) // 2 - 1)) AS g(j)
    ),
    frames AS (
        SELECT doc_id, frame_idx, SUM(v * v) AS energy
        FROM samples GROUP BY doc_id, frame_idx
    ),
    nb AS (
        SELECT doc_id, frame_idx, energy,
               COALESCE(LAG(energy) OVER w, -1) AS ep,
               COALESCE(LEAD(energy) OVER w, -1) AS en
        FROM frames
        WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
    ),
    peaks AS (
        SELECT doc_id, frame_idx, energy,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY frame_idx) AS rk
        FROM nb WHERE energy > ep AND energy > en
    ),
    prs AS (
        SELECT a.doc_id,
               ((a.energy % 251) * 251 + (b.energy % 251)) * 64
                 + (b.frame_idx - a.frame_idx) AS h
        FROM peaks a JOIN peaks b
          ON b.doc_id = a.doc_id AND b.rk - a.rk IN (1, 2)
         AND b.frame_idx - a.frame_idx <= 8
    ),
    fr AS (SELECT doc_id, COUNT(*) AS n_frames FROM frames GROUP BY doc_id),
    pk AS (SELECT doc_id, COUNT(*) AS n_peaks FROM peaks GROUP BY doc_id),
    pp AS (
        SELECT doc_id, COUNT(*) AS n_pairs, SUM(h) AS fp FROM prs GROUP BY doc_id
    )
    SELECT fr.doc_id,
           CAST(fr.n_frames AS BIGINT) AS n_frames,
           CAST(COALESCE(pk.n_peaks, 0) AS BIGINT) AS n_peaks,
           CAST(COALESCE(pp.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(COALESCE(pp.fp, 0) AS BIGINT) AS fp_checksum
    FROM fr
    LEFT JOIN pk ON pk.doc_id = fr.doc_id
    LEFT JOIN pp ON pp.doc_id = fr.doc_id
    """,
)
def multimodal_audio_constellation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio fingerprinting constellation (the Shazam peak-pair scheme,
    Wang 2003) over every document's WAV payload: local-maximum energy
    frames become constellation peaks, each anchor pairs with its next
    1..2 peaks within 8 frames, and the packed (quantized-energy,
    quantized-energy, Δframe) hashes are the landmarks a fingerprint
    index stores.  Per document: frame/peak/pair counts and the exact
    integer checksum over all landmark hashes — the track-level summary a
    dedup-by-audio or content-ID pipeline ingests.

    All-integer end to end (energies are exact squared-deviation sums;
    the hash is modular arithmetic), so the whole fingerprint hash-checks
    against the oracle's per-byte SQL replay.  Scale posture: identical to
    `multimodal_wav_energy` — the PCM stream never becomes rows; each
    Arrow batch emits one row per document, shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    return mm.constellation_fingerprints(mm.attach_wav_payload(docs))
