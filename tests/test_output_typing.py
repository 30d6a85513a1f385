"""Fleet-wide output-type lint (r9, VERDICT r8 next-round #3).

The r6-r8 driver hash-reds were a TYPING artifact, not engine disagreement:
the driver compares value-hashes over pandas frames, and DuckDB's pandas
conversion renders HUGEINT and EVERY DECIMAL as float64 while Spark's
matching column arrives int64 / object-Decimal — equal values, divergent
dtypes, red hash.  The r8 type audit proved a perfect 6/6 correlation
(exactly the six reds were exactly the six oracles whose final column lands
HUGEINT/DECIMAL(38,0)).

This lint converts that three-round hunt into a cheap fleet-wide check:
every oracle's output types (via DuckDB ``DESCRIBE`` — planner only, no
execution) and every LAZY Spark query's output schema (DataFrame build at
sf0.001; for most queries that's plan-only plus parquet footer reads) must
land in the hash-stable set.  Queries in ``registry.EAGER`` — whose builder
RUNS streaming jobs, writes scratch, or trains iteratively (ADVICE r9: for
those, "build and read .schema" is neither fast nor side-effect-free) —
skip the Spark-side build here; their oracle side still gets the
spark-independent HUGEINT check, and scripts/verify_driver.py covers them
dtype-faithfully at execution time.  The hash-stable rules:

  * oracle HUGEINT                      → always flagged (pandas float64 vs
    Spark int64/Decimal — the proven red signature)
  * Spark DecimalType                   → always flagged (collects as
    object-Decimal; DuckDB's pandas path can never produce that, even from
    a DECIMAL oracle column, which it renders float64)
  * oracle DECIMAL                      → flagged unless the Spark column is
    float/double (decimal→float64 matches Spark's float64; anything else
    diverges — the ``linreg_ridge`` bare-literal case)
  * int-vs-float class mismatch         → flagged (int64 vs float64 hash
    differently on equal values)

Exemptions: the two typing canaries, whose PURPOSE is to emit the divergent
pair so the driver's hash behavior is measured directly each round.
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

from distributed_mapreduce_in_docker_rpyc_spark import registry

SRC = "/root/testdata/sf0.001"
TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# The only queries allowed to violate the lint — see module docstring.
TYPING_CANARIES = {"probe_hash_typing_hugeint", "probe_hash_typing_decimal38"}


def _duck_class(t: str) -> str:
    t = t.upper()
    if t == "HUGEINT":
        return "hugeint"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t in ("VARCHAR", "TEXT", "STRING"):
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE" or t.startswith("TIMESTAMP"):
        return "datetime"
    return f"other:{t}"


def _spark_class(dt) -> str:
    name = dt.typeName()
    if name.startswith("decimal"):
        return "decimal"
    if name in ("byte", "short", "integer", "long"):
        return "int"
    if name in ("float", "double"):
        return "float"
    if name == "string":
        return "str"
    if name == "boolean":
        return "bool"
    if name in ("date", "timestamp", "timestamp_ntz"):
        return "datetime"
    return f"other:{name}"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        p = os.path.join(SRC, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def test_fleet_output_types_are_hash_stable(spark, duck):
    registry.load_all()
    findings: dict[str, list[str]] = {}
    for name, fn in registry.QUERIES.items():
        if name in TYPING_CANARIES:
            continue
        per_query: list[str] = []
        # Spark side: build the lazy plan, read the schema — skipped for
        # EAGER builders (streaming jobs / scratch writes / training loops
        # would actually run here; verify_driver checks those at execution).
        s_classes: dict[str, str] = {}
        if name not in registry.EAGER:
            try:
                schema = fn(spark, SRC).schema
            except Exception as exc:  # noqa: BLE001 — other sweeps assert execution
                findings[name] = [f"spark build raised {type(exc).__name__}: {exc}"]
                continue
            s_classes = {f.name: _spark_class(f.dataType) for f in schema.fields}
        for col, cls in s_classes.items():
            if cls == "decimal":
                per_query.append(
                    f"spark column {col!r} is DecimalType (collects as "
                    "object-Decimal; no DuckDB pandas dtype can match it)"
                )
        # Oracle side: DESCRIBE = planner-only type resolution.
        sql = registry.ORACLES.get(name)
        if sql is not None:
            rows = duck.execute(f"DESCRIBE {sql}").fetchall()
            for col, duck_type, *_ in rows:
                o_cls = _duck_class(duck_type)
                s_cls = s_classes.get(col)
                if o_cls == "hugeint":
                    per_query.append(
                        f"oracle column {col!r} is HUGEINT (pandas float64 "
                        f"vs spark {s_cls}) — wrap in CAST(... AS BIGINT) "
                        "or render VARCHAR"
                    )
                elif o_cls == "decimal" and s_cls is not None and s_cls != "float":
                    per_query.append(
                        f"oracle column {col!r} is {duck_type} (pandas "
                        f"float64) vs spark {s_cls} — cast both sides to a "
                        "hash-stable type (BIGINT/DOUBLE/VARCHAR)"
                    )
                elif (
                    s_cls is not None
                    and o_cls != "decimal"
                    and {o_cls, s_cls} == {"int", "float"}
                ):
                    per_query.append(
                        f"oracle column {col!r} {duck_type}={o_cls} vs "
                        f"spark {s_cls} — int64 and float64 hash differently "
                        "on equal values"
                    )
        if per_query:
            findings[name] = per_query
    assert not findings, (
        f"{len(findings)} queries emit driver-hash-divergent output types:\n"
        + "\n".join(f"  {n}: {msgs}" for n, msgs in sorted(findings.items()))
    )


def test_canaries_do_violate_the_lint(spark, duck):
    """The exemption must stay honest: each canary really emits the
    divergent dtype pair it documents.  If a refactor accidentally 'fixes'
    a canary, it stops measuring anything and this fails."""
    registry.load_all()
    hug = duck.execute(
        f"DESCRIBE {registry.ORACLES['probe_hash_typing_hugeint']}"
    ).fetchall()
    assert hug[0][1].upper() == "HUGEINT", hug
    dec = duck.execute(
        f"DESCRIBE {registry.ORACLES['probe_hash_typing_decimal38']}"
    ).fetchall()
    assert re.match(r"DECIMAL\(38,\s*0\)", dec[0][1].upper()), dec
    s_hug = registry.QUERIES["probe_hash_typing_hugeint"](spark, SRC).schema
    assert s_hug.fields[0].dataType.typeName() in ("long", "bigint")
    s_dec = registry.QUERIES["probe_hash_typing_decimal38"](spark, SRC).schema
    assert s_dec.fields[0].dataType.typeName().startswith("decimal")


def test_canary_dtype_sensitivity_through_pandas_path(spark, duck):
    """The canaries' driver-slot measurement, re-homed here at zero driver
    cost (VERDICT r9 next-round #4): bind each canary oracle through
    DuckDB's ACTUAL pandas conversion — the dtypes the driver hashes — and
    assert the divergent pair materializes end-to-end:

      * HUGEINT and DECIMAL(38,0) oracle outputs both arrive float64 in
        pandas (the r6-r8 red signature),
      * while the matching Spark columns collect as int64 / object-Decimal.

    If a DuckDB upgrade ever changes the pandas rendering (e.g. nullable
    Int64 for HUGEINT), this fails and the lint's flagging rules — and the
    driver-red theory they encode — need re-verifying.  This keeps the
    canaries' signal alive after their demotion below the driver's 50-slot
    window (they answered their question in r9: red exactly as predicted)."""
    import decimal

    import pandas as pd

    registry.load_all()
    hug_pdf = duck.execute(registry.ORACLES["probe_hash_typing_hugeint"]).df()
    dec_pdf = duck.execute(registry.ORACLES["probe_hash_typing_decimal38"]).df()
    assert hug_pdf.dtypes.iloc[0].kind == "f", hug_pdf.dtypes
    assert dec_pdf.dtypes.iloc[0].kind == "f", dec_pdf.dtypes
    # Spark side, through the same pd.DataFrame(rows) canonicalization the
    # driver applies: int64 for the bigint, object-Decimal for the decimal.
    hug_rows = registry.QUERIES["probe_hash_typing_hugeint"](spark, SRC).collect()
    s_hug = pd.DataFrame([tuple(r) for r in hug_rows])
    assert s_hug.dtypes.iloc[0].kind in "iu", s_hug.dtypes
    dec_rows = registry.QUERIES["probe_hash_typing_decimal38"](spark, SRC).collect()
    s_dec = pd.DataFrame([tuple(r) for r in dec_rows])
    assert isinstance(s_dec.iloc[0, 0], decimal.Decimal), s_dec.dtypes
