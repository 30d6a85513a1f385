"""Bit-exact driver-side replay of the engine's quantized mass-sum step.

The iterative K²-bounded queries (`events_markov_stationary`,
`events_markov_attribution`) advance a probability vector with

    CAST(SUM(CAST(pi * pv AS DECIMAL(38,12))) AS DOUBLE)

per step.  Running that step as a Spark job costs a full job launch
(broadcast + shuffle + collect) for arithmetic over a K²-bounded frame —
VERDICT r10 #3 moves the loop onto the driver after ONE bounded collect of
the transition matrix.  That is only legal if the Python replay is
bit-identical to what the Spark expression computes, which these helpers
guarantee:

- ``pi * pv``: IEEE-754 double multiply — identical in CPython and the JVM.
- ``CAST(double AS DECIMAL(38,12))``: Spark's ``Decimal.set(Double)`` goes
  through ``BigDecimal.valueOf(d)`` = ``new BigDecimal(Double.toString(d))``
  then ``setScale(12, HALF_UP)``.  ``Double.toString`` and CPython's
  ``repr(float)`` both emit the shortest decimal string that round-trips to
  the same double, so ``Decimal(repr(d)).quantize(1E-12, ROUND_HALF_UP)``
  replays the cast exactly.  Differential evidence on THIS JVM:
  ``tests/test_exactmath.py`` fuzzes the equivalence over random +
  boundary-adversarial doubles (60k values, 0 mismatches at round start).
- ``SUM(DECIMAL)``: exact decimal addition — order-independent, replayed
  with ``decimal.Decimal`` under a 60-digit context (well above the 38-digit
  operand width, so no context rounding ever fires).
- ``CAST(DECIMAL AS DOUBLE)``: ``BigDecimal.doubleValue()`` and CPython's
  ``float(Decimal)`` are both correctly rounded (round-half-even to nearest
  double).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal, localcontext

_Q12 = Decimal("1E-12")


def spark_double_to_dec12(v: float) -> Decimal:
    """Replay Spark's ``CAST(v AS DECIMAL(38,12))`` for a finite double."""
    with localcontext() as ctx:
        ctx.prec = 60
        return Decimal(repr(v)).quantize(_Q12, ROUND_HALF_UP)


def mass_step(pi: dict, transitions: list) -> dict:
    """One quantized mass-sum step: for every transition ``(src, dst, pv)``
    whose ``src`` is present in ``pi``, accumulate
    ``CAST(pi[src] * pv AS DECIMAL(38,12))`` into ``dst``'s exact decimal
    sum, then cast each sum back to double — bit-identical to the Spark job

        pr ⋈ pi ON src GROUP BY dst:
        CAST(SUM(CAST(pi * pv AS DECIMAL(38,12))) AS DOUBLE)

    ``pi`` maps state→double; ``transitions`` is the collected K²-bounded
    frame.  Keys absent from ``pi`` contribute nothing (inner join), and the
    result contains exactly the ``dst`` keys with ≥1 contributing row
    (GROUP BY), so iterating this function replays the job chain exactly.
    """
    acc: dict = {}
    with localcontext() as ctx:
        ctx.prec = 60
        for src, dst, pv in transitions:
            p = pi.get(src)
            if p is None:
                continue
            q = Decimal(repr(p * pv)).quantize(_Q12, ROUND_HALF_UP)
            prev = acc.get(dst)
            acc[dst] = q if prev is None else prev + q
    return {dst: float(total) for dst, total in acc.items()}
