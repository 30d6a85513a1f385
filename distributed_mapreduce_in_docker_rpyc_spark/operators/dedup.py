"""Deduplication operator family for large-scale training-data pipelines.

Five dedup strategies, all engine-portable (md5-derived hashing so the DuckDB
oracle computes bit-identical signatures):

  - exact          : sha2-256 content hash, keep min doc_id per hash.
  - minhash LSH    : 3-token shingles → k=16 md5 minhashes → b=4 bands × r=4
                     rows → band-bucket self-join → Jaccard verification.
  - simhash        : 64-bit fingerprint from per-token md5 bit votes; near-dup
                     = Hamming distance ≤ threshold.
  - n-gram Jaccard : direct shared-shingle pair join (the exact answer minhash
                     approximates).
  - embedding cos  : near-dup pairs by cosine ≥ threshold (see similarity.py).

Scale posture (100 TB): signatures are computed per-row with array expressions
(NO shuffle, no UDF — everything whole-stage-codegen'd); the only shuffles are
the band-bucket join (keys are 128-bit hashes → uniform, skew-free) and the
candidate-verification join, whose input is already reduced to candidate pairs.
The band join is exactly the "shuffle on a good hash" the reference's MD5
partitioner did (reference worker/worker.py:10-11) — reused as an LSH bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from distributed_mapreduce_in_docker_rpyc_spark.functions.text import tokenize_column

N_MINHASH = 16
N_BANDS = 4
ROWS_PER_BAND = 4
SHINGLE_K = 3


def shingles_column(text: Column | str, k: int = SHINGLE_K) -> Column:
    """k-token shingles as an array<string> — per-row, shuffle-free.

    Mirrors DuckDB ``t[i:i+k-1]`` slicing semantics (1-based, inclusive): docs
    with < k tokens produce one short shingle, empty docs one '' shingle.

    Implemented as overlapping-match regex over the space-joined token string
    (lookbehind pins matches to token starts) instead of the equivalent
    ``transform(sequence(...), slice+array_join)``: higher-order-function
    lambdas are interpreted, not codegen'd, and measured 9× slower at sf0.1
    for identical output.
    """
    toks = tokenize_column(text)
    joined = F.array_join(toks, " ")
    # e.g. k=3: (?<![a-z'])(?=([a-z']+ [a-z']+ [a-z']+))
    pattern = "(?<![a-z'])(?=(" + " ".join(["[a-z']+"] * k) + "))"
    return F.when(
        F.size(toks) >= k, F.regexp_extract_all(joined, F.lit(pattern), 1)
    ).otherwise(F.array(joined))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = N_MINHASH,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """``(doc_id, minhash: array<string>)`` — n md5-minhashes per document
    (lexicographic min over hex digests of hash family i = md5(f"{i}:" + s)).

    Pass ``shingles`` (a precomputed ``_distinct_shingles`` frame, ideally
    persisted) when the same shingle set feeds multiple consumers: Spark does
    not dedupe identical subplans across a DAG (no ReusedExchange fired
    here), so without it the tokenize→shingle pipeline is re-executed once
    per consumer — 12 redundant parquet scans in the full LSH query.

    Computed as ``n_hashes`` md5 projections over the MATERIALIZED shingle
    frame with one min-aggregate per hash column: every value computed
    exactly once, one uniform shuffle on doc_id (map-side partial mins), no
    row explosion.  Two formulations this deliberately avoids, both measured
    slower: nested per-row array expressions (Catalyst inlines the shingle
    subexpression into all 16 hash lambdas — ~200× at sf0.1), and the
    explode-shingles-×-seeds relational form (16× the row volume plus an
    extra (doc, seed) shuffle and a collect_list reassembly for the same
    result).  The hash family is unchanged in all three: column ``i`` is
    ``min(md5(f"{i}:" + shingle)))``.
    """
    shd = (
        shingles
        if shingles is not None
        else _distinct_shingles(df, text_col, id_col)
    ).withColumnRenamed("doc_id", id_col)
    mins = shd.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"_h{i}")
            for i in range(n_hashes)
        ]
    )
    return mins.select(
        id_col, F.array(*[F.col(f"_h{i}") for i in range(n_hashes)]).alias("minhash")
    )


def band_signatures(minhash: Column, n_bands: int = N_BANDS, rows: int = ROWS_PER_BAND) -> Column:
    """Array of n_bands band signatures: md5 of the comma-joined band slice."""
    return F.array(
        *[
            F.md5(F.concat_ws(",", *[minhash[b * rows + r] for r in range(rows)]))
            for b in range(n_bands)
        ]
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via sha2-256: one row per distinct content, keeping the
    smallest id (deterministic winner) and the duplicate count.

    Single shuffle on the 256-bit hash — perfectly uniform keys, no skew."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (doc_a < doc_b) sharing ≥1 LSH band bucket.

    The band self-join keys (band, sig) are md5 digests — uniform, so the
    shuffle is skew-free; bucket sizes follow the data's true near-dup
    clustering, which is exactly what LSH is for.
    """
    sigs = minhash_signatures(df, text_col, id_col, shingles=shingles).select(
        F.col(id_col),
        F.posexplode(band_signatures(F.col("minhash"))).alias("band", "sig"),
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def _distinct_shingles(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    # r10 (guide §2.4: share one exchange): hash-repartition by doc_id
    # BEFORE the distinct.  doc_id ⊆ (doc_id, shingle), so the distinct's
    # EnsureRequirements is satisfied with no second exchange, and — because
    # the frame is persisted with hashpartitioning(doc_id) — every
    # downstream groupBy(doc_id) (minhash mins, sizes) and doc-keyed
    # aggregation reuses the partitioning instead of re-shuffling the
    # shingle frame once per consumer.  Same shuffle volume, same rows.
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(shingles_column(text_col)).alias("shingle"))
        .repartition("doc_id")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame | None = None,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles: DataFrame | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Shingle-set Jaccard for candidate pairs (or all shared-shingle pairs).

    ``candidates=None`` is the exact n-gram-Jaccard dedup: the pair space is
    pruned to pairs sharing ≥1 shingle by the equi-join — never a full cross
    join. With LSH ``candidates`` it verifies a much smaller set.

    ``max_df``: document-frequency cap — shingles appearing in more than
    ``max_df`` documents are dropped from the sets BEFORE sizes/intersection
    (standard stop-shingle practice).  This bounds the shared-shingle join's
    per-key fan-out at max_df² pairs: without it one "of the and"-class hot
    shingle makes a single join key quadratic in corpus size.  Jaccard is
    then over the capped sets on both sides (the oracle applies the same
    cap), and discrimination IMPROVES — ubiquitous shingles carry no
    near-dup signal.

    ``shingles``: see ``minhash_signatures`` — the shingle frame feeds three
    consumers here (sizes, x, y), so passing a persisted one avoids three
    recomputations of the scan→tokenize→shingle pipeline.
    """
    shd = shingles if shingles is not None else _distinct_shingles(df, text_col, id_col)
    if max_df is not None:
        keep = (
            shd.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("shingle")
        )
        # left-semi on the (mostly-kept) shingle list; the groupBy tolerates
        # the very skew it removes because partial aggregation combines
        # map-side.
        shd = shd.join(keep, "shingle", "left_semi")
    sizes = shd.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    x = shd.alias("x")
    y = shd.alias("y")
    if candidates is None:
        inter = (
            x.join(y, (F.col("x.shingle") == F.col("y.shingle")) & (F.col("x.doc_id") < F.col("y.doc_id")))
            .groupBy(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
            .agg(F.count("*").alias("n_inter"))
        )
    else:
        # Candidate-driven: cost is linear in |candidates| × shingles-per-doc,
        # NOT the full shared-shingle pair space — this is the whole point of
        # LSH.  (A semi-join of the full pair join against candidates would
        # silently pay the quadratic cost anyway.)
        inter = (
            candidates.join(x, F.col("x.doc_id") == F.col("doc_a"))
            .join(y, (F.col("y.doc_id") == F.col("doc_b")) & (F.col("y.shingle") == F.col("x.shingle")))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_inter"))
        )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


_HEX = "0123456789abcdef"


def simhash_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit simhash as a 16-hex-char string (engine-portable construction).

    Per token w with count c, md5(w) supplies 64 bits (16 hex digits × 4);
    each bit votes ±c; fingerprint bit = 1 iff the vote sum is > 0.  Hex-digit
    arithmetic (locate in '0123456789abcdef') instead of native 64-bit ints
    keeps the construction identical in any engine with md5 + string ops.

    Dataflow: token counts (1 shuffle on (doc, word)) → explode 16 digit
    positions → vote sums (shuffle on (doc, pos)) → assemble. Row width stays
    tiny; both shuffles are on high-cardinality uniform keys.
    """
    counts = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(tokenize_column(text_col)).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
        .withColumn("h", F.md5("word"))
    )
    # first 16 hex digits of md5 = 64 bits
    pos = (
        counts.select(
            "doc_id",
            "c",
            F.posexplode(F.split(F.substring("h", 1, 16), "(?!$)")).alias("k", "digit_ch"),
        )
        .filter(F.col("digit_ch") != "")
        .withColumn("digit", F.expr(f"locate(digit_ch, '{_HEX}') - 1"))
    )
    votes = (
        pos.select(
            "doc_id",
            "k",
            "c",
            F.explode(F.array(*[F.lit(b) for b in range(4)])).alias("b"),
            F.col("digit"),
        )
        .withColumn("bit", F.expr("shiftright(digit, b) & 1"))
        .withColumn("vote", (F.col("bit") * 2 - 1) * F.col("c"))
        .groupBy("doc_id", "k", "b")
        .agg(F.sum("vote").alias("s"))
    )
    nibbles = (
        votes.withColumn("bitval", F.when(F.col("s") > 0, F.expr("shiftleft(1, b)")).otherwise(0))
        .groupBy("doc_id", "k")
        .agg(F.sum("bitval").alias("nibble"))
        .withColumn("hex_ch", F.expr(f"substr('{_HEX}', nibble + 1, 1)"))
    )
    return nibbles.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("k", "hex_ch"))), lambda s: s["hex_ch"]
            ),
            "",
        ).alias("simhash")
    )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 20,
) -> DataFrame:
    """Min-label propagation connected components: ``(id, cluster)`` where
    cluster = the smallest vertex id reachable through ``edges``
    (undirected; pass each edge once as (src, dst)).

    The iterative Pregel-style pattern Spark needs for graph operators the
    relational algebra can't express in one pass: each round joins labels
    across edges, takes the per-vertex min, and materializes via
    ``localCheckpoint`` (truncating lineage — without it the plan doubles
    every iteration and the driver OOMs planning round ~15). Converges in
    O(graph diameter) rounds; near-dup graphs are unions of small cliques,
    so 2-3 rounds in practice. Driver work per round is one scalar
    convergence count.
    """
    both = edges.select(F.col("src").alias("a"), F.col("dst").alias("b")).unionAll(
        edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    )
    labels = vertices.select(F.col(id_col), F.col(id_col).alias("cluster"))
    for _ in range(max_iterations):
        neighbor_min = (
            both.join(labels, both.b == labels[id_col])
            .groupBy(F.col("a").alias(id_col))
            .agg(F.min("cluster").alias("neighbor_cluster"))
        )
        new_labels = (
            labels.join(neighbor_min, id_col, "left_outer")
            .select(
                id_col,
                F.least(
                    F.col("cluster"), F.coalesce("neighbor_cluster", F.col("cluster"))
                ).alias("cluster"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), id_col)
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def containment_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles: DataFrame | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric shingle CONTAINMENT pairs: |A∩B| / |A| and |A∩B| / |B|.

    Jaccard misses the excerpt case — a paragraph quoted inside a much larger
    document scores near zero on |∩|/|∪| but 1.0 on containment of the small
    side — and excerpt/quote duplication is exactly what training-data dedup
    must catch (Broder's resemblance vs containment distinction).  Emits
    pairs where EITHER direction ≥ ``threshold``, with both directions
    reported so the caller can tell subset from overlap.

    Same scale shape as ``jaccard_pairs``: DF-capped shared-shingle
    equi-join (per-key fan-out ≤ max_df²), sizes and intersection on uniform
    doc keys, never a cross join.
    """
    shd = shingles if shingles is not None else _distinct_shingles(df, text_col, id_col)
    if max_df is not None:
        keep = (
            shd.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("shingle")
        )
        shd = shd.join(keep, "shingle", "left_semi")
    sizes = shd.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    x = shd.alias("x")
    y = shd.alias("y")
    inter = (
        x.join(y, (F.col("x.shingle") == F.col("y.shingle")) & (F.col("x.doc_id") < F.col("y.doc_id")))
        .groupBy(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    cont_a = F.col("n_inter").cast("double") / F.col("sa.n_shingles")
    cont_b = F.col("n_inter").cast("double") / F.col("sb.n_shingles")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(cont_a, 6).alias("containment_a_in_b"),
            F.round(cont_b, 6).alias("containment_b_in_a"),
        )
        .filter(
            (F.col("containment_a_in_b") >= threshold)
            | (F.col("containment_b_in_a") >= threshold)
        )
    )
