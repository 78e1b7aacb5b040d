"""Deterministic aggregation helpers.

Summing IEEE doubles is order-dependent, and Spark's partial+final hash
aggregation merges partitions in a nondeterministic order — so `sum(double)`
can differ in the last bits run-to-run and engine-to-engine. The correctness
gate hash-compares our results against a DuckDB oracle, so every declared
aggregate over a double column goes through exact decimal arithmetic and is
cast back to double at the end:

    Spark : sum(cast(x as decimal(18, s)))  -> exact -> cast(double)
    DuckDB: CAST(SUM(CAST(x AS DECIMAL(18, s))) AS DOUBLE)

Both sides produce the same exact decimal, and decimal->double rounding is
IEEE round-nearest-even in both engines, so the doubles are bit-identical.
This costs one decimal widening per row — negligible next to the shuffle —
and keeps the aggregation itself inside Tungsten codegen.

The input doubles themselves come from parquet, so `cast(x as decimal)` sees
bit-identical inputs in both engines. For derived measures (e.g.
extendedprice * (1 - discount)) the per-row double product is IEEE-determined
and identical in both engines; only the *sum* needs the decimal detour.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Input-cast precision. 18 is the widest precision Spark backs with a
#: primitive long (Decimal.MAX_LONG_DIGITS): cast(double as decimal(18,s))
#: stays compact in Tungsten rows and the partial-sum buffers, where the old
#: decimal(28,s) cast forced 16-byte byte-array decimals through every
#: aggregation buffer — measured 1.03 s -> 0.64 s for one ungrouped sum over
#: lineitem at sf0.1 (tools/opt_micro_dsum.py), same exact result. Range is
#: unchanged where it matters: per-VALUE inputs here are <= ~1.1e5 (12
#: integer digits at s=6 is plenty), and the SUM accumulates in
#: decimal(p+10, s) per Spark's sum typing (DuckDB: decimal(38, s)) — 22
#: integer digits at s=6, enough for 1e12 rows of 1e6-magnitude values, the
#: same 100 TB envelope the old comment argued. Both engines compute the
#: identical exact decimal either way; only the in-memory representation
#: narrows.
#:
#: FAILURE-MODE ASYMMETRY (ADVICE r12): in non-ANSI Spark,
#: cast(double as decimal(18,s)) silently NULLs a value whose magnitude
#: exceeds 10^(18-s) — dropping it from the sum — while the DuckDB oracle
#: twin RAISES on CAST overflow. A future call site whose inputs can exceed
#: the per-value envelope would diverge quietly instead of failing loudly.
#: Any new call site (or scale change: scale=s leaves 10^(18-s) per-value
#: headroom, so scale=12 caps values at 1e6) must extend the input-domain
#: pins in tests/test_opt_equivalence.py (test_dsum_inputs_fit_decimal18,
#: test_dsum_scale12_embedding_components_fit).
_PRECISION = 18


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent, engine-exact sum of a double column (cast to double)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({_PRECISION},{scale})")).cast("double")


def dsum_expr(sql_expr: str, scale: int = 2) -> Column:
    """dsum over a SQL expression string (per-row IEEE double math is
    deterministic; only the aggregation needs decimal)."""
    return F.sum(F.expr(sql_expr).cast(f"decimal({_PRECISION},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, out_scale: int = 6) -> Column:
    """Deterministic average: exact decimal sum -> double, / count, round.

    Division and rounding happen in double on both engines with identical
    operands, so the result is bit-identical.
    """
    c = F.col(col) if isinstance(col, str) else col
    total = F.sum(c.cast(f"decimal({_PRECISION},{scale})")).cast("double")
    return F.round(total / F.count(c), out_scale)


def oracle_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB SQL twin of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({_PRECISION},{scale}))) AS DOUBLE)"


def oracle_davg(expr: str, scale: int = 2, out_scale: int = 6) -> str:
    """DuckDB SQL twin of :func:`davg`."""
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL({_PRECISION},{scale}))) AS DOUBLE)"
        f" / COUNT({expr}), {out_scale})"
    )


def round6(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, 6)
