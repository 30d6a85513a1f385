"""Vector math over ``array<float>`` columns, JVM-side.

``F.zip_with`` + ``F.aggregate`` keep dot products inside Catalyst (no Python
round-trip).  At 100 TB the alternative — a row-at-a-time Python UDF — is the
difference between a codegen'd loop and a per-row pickle; the Pandas-UDF path
in operators/similarity.py exists only for the batched top-k variant where
NumPy's BLAS beats per-row expression evaluation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_col(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns.

    Elements are cast to double BEFORE multiplying so float32 inputs get
    IEEE-double products — the same arithmetic any double-based oracle
    computes, and sequential left-to-right accumulation is deterministic.
    """
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column | str) -> Column:
    """L2 norm of an array<numeric> column (double math, deterministic)."""
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity_col(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 where either vector has zero norm."""
    na, nb = norm_col(a), norm_col(b)
    return F.when((na > 0) & (nb > 0), dot_col(a, b) / (na * nb)).otherwise(F.lit(0.0))
