"""Skew mitigation: salted joins and two-phase aggregation.

The reference's MD5 hash partitioner (reference worker/worker.py:10-11)
is the same placement-only trick: salting just adds a second key component.

AQE's skew-join split (enabled in session.py) handles most skew at runtime
by splitting oversized sort-merge partitions; salting is the explicit
fallback for the cases AQE can't fix — a hot key inside ONE shuffle
partition of a hash aggregate, or a broadcast-ineligible join where one key
holds a double-digit percent of all rows (the classic "null key" / "default
user" skew at 100 TB).

  - ``salted_join``: fan the hot side's rows across ``n_salts`` sub-keys
    (deterministic hash of the whole row), replicate the other side to every
    salt, equi-join on (key, salt). Shuffle volume: |small| × n_salts extra
    rows buys per-partition balance on the big side. Results identical to
    the plain join for skewed-side-preserving types — inner/left/semi/anti
    (asserted in tests + oracle); right/full outer are rejected.
  - ``salted_aggregate``: pre-aggregate per (key, salt), then merge per key.
    Spark's map-side partial aggregation already does this per-task; the
    explicit two-phase form matters when the FINAL aggregate's single
    hot-key partition is the bottleneck (e.g. collect-heavy aggs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8

# final-merge function per partial-agg op
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str] | str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted into ``n_salts`` sub-keys.

    ``skewed`` rows get ``salt = xxhash64(row) mod n`` (deterministic, no
    RNG state); ``other`` is exploded to all n salts. The (key, salt) hash
    join then spreads any hot key over n partitions.

    Only skewed-side-preserving join types are allowed: each ``skewed`` row
    carries exactly one salt, so inner/left/semi/anti results are identical
    to the plain join — but every UNMATCHED ``other`` row exists once per
    salt, so right/full outer would emit it ``n_salts`` times. Salting the
    other direction is spelled ``salted_join(other, skewed, ...)``."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports skewed-side-preserving joins only {sorted(allowed)}, got {how!r}: "
            "the exploded other side would duplicate unmatched rows under right/full outer"
        )
    on = [on] if isinstance(on, str) else list(on)
    s = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    )
    o = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)]))
    )
    return s.join(o, [*on, "_salt"], how).drop("_salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name → (op, column) with
    op ∈ {sum, count, min, max}. Phase 1 aggregates per (keys, salt); phase 2
    merges per keys — the hot key's final merge sees n_salts rows instead of
    all of them."""
    for name, (op, _) in aggs.items():
        if op not in _MERGE:
            raise ValueError(f"unsupported op {op!r} for {name!r}; use {sorted(_MERGE)}")
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            (F.count(c) if op == "count" else getattr(F, op)(c)).alias(name)
            for name, (op, c) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[_MERGE[op](name).alias(name) for name, (op, _) in aggs.items()]
    )
