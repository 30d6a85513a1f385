"""Vector math over ``array<float>`` columns, JVM-side.

Extended scope (SURVEY.md §2.2: the reference's only types are str/int,
SURVEY.md §1.2 - no arrays, no floats).

For the fixed embedding width the dot/norm expressions are UNROLLED into
plain arithmetic over ``a[i]*b[i]`` terms: higher-order functions
(``zip_with``/``aggregate``) evaluate their lambdas interpreted — measured
4-10× slower than the unrolled form at sf0.1 (same finding as the shingle
expression, operators/dedup.py).  The unrolled sum accumulates left-to-right
exactly like the sequential ``aggregate`` fold, so results are
bit-identical; pass ``dim=None`` to fall back to the HOF form for unknown
widths.

At 100 TB the alternative — a row-at-a-time Python UDF — is the difference
between a codegen'd loop and a per-row pickle; the Pandas-UDF path in
operators/similarity.py exists only for the batched top-k variant where
NumPy's BLAS beats expression evaluation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_DIM = 64  # the embeddings fixture width (FIXTURES.md)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_col(a: Column | str, b: Column | str, dim: int | None = DEFAULT_DIM) -> Column:
    """Dot product of two array<numeric> columns.

    Elements are cast to double BEFORE multiplying so float32 inputs get
    IEEE-double products — the same arithmetic any double-based oracle
    computes — and accumulation is sequential left-to-right (deterministic,
    order-identical between the unrolled and HOF forms).

    When both operands are plain column NAMES the unrolled sum is built as
    ONE ``F.expr`` string instead of ~5·dim Column operator calls (r10):
    every Column op is a Py4J round-trip, and the per-call latency made
    plan CONSTRUCTION of the cosine-heavy queries cost seconds of driver
    time per execution (measured ~2 s per sim_topk_* build).  SQL ``x[i]``
    is 0-based GetArrayItem and ``CAST(… AS DOUBLE) * …`` parses
    left-associated — the identical expression tree, one JVM call.

    The fast path requires SIMPLE identifiers (r11, ADVICE r10): a name
    with a backtick would break the quoting, and a dotted name like
    ``t.col`` would resolve as one literal identifier under backticks —
    both silently diverging from the ``F.col`` path.  Non-simple names fall
    back to the Column-built form, which handles them canonically.
    """
    if (
        dim is not None
        and isinstance(a, str)
        and isinstance(b, str)
        and a.isidentifier()
        and b.isidentifier()
    ):
        return F.expr(
            " + ".join(
                f"CAST(`{a}`[{i}] AS DOUBLE) * CAST(`{b}`[{i}] AS DOUBLE)"
                for i in range(dim)
            )
        )
    ca, cb = _c(a), _c(b)
    if dim is None:
        return F.aggregate(
            F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    expr = ca[0].cast("double") * cb[0].cast("double")
    for i in range(1, dim):
        expr = expr + ca[i].cast("double") * cb[i].cast("double")
    return expr


def norm_col(a: Column | str, dim: int | None = DEFAULT_DIM) -> Column:
    """L2 norm of an array<numeric> column (double math, deterministic)."""
    if dim is not None and isinstance(a, str):
        return F.sqrt(dot_col(a, a, dim))  # one-expr fast path (see dot_col)
    ca = _c(a)
    if dim is None:
        return F.sqrt(
            F.aggregate(
                ca, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
            )
        )
    return F.sqrt(dot_col(ca, ca, dim))


def cosine_similarity_col(
    a: Column | str, b: Column | str, dim: int | None = DEFAULT_DIM
) -> Column:
    """Cosine similarity; 0.0 where either vector has zero norm."""
    na, nb = norm_col(a, dim), norm_col(b, dim)
    return F.when((na > 0) & (nb > 0), dot_col(a, b, dim) / (na * nb)).otherwise(F.lit(0.0))


def cosine_from_norms(
    a: Column | str, b: Column | str, na: Column | str, nb: Column | str,
    dim: int | None = DEFAULT_DIM,
) -> Column:
    """Cosine similarity with PRECOMPUTED norm columns (r10, guide §2.3/§1.2
    per-task work): ``cosine_similarity_col`` re-derives both 64-term norms
    per PAIR, so a rerank over C candidates evaluates 3·C unrolled dots and
    the combined whole-stage projection rode janino's 64 KB method cliff
    (observed compile failure + interpreted fallback in the ANN-join
    rerank).  Computing each side's norm ONCE on the (much smaller) vector
    frames and referencing it here reduces the pair cost to one dot and
    keeps every stage far below the codegen limit.  The norm values are the
    identical IEEE doubles (same unrolled sum), so results are bit-equal —
    0.0 where either norm is zero, exactly as before."""
    cna, cnb = _c(na), _c(nb)
    return F.when(
        (cna > 0) & (cnb > 0), dot_col(a, b, dim) / (cna * cnb)
    ).otherwise(F.lit(0.0))
