"""Deterministic aggregation helpers.

Summing IEEE doubles is order-dependent, and Spark's partial+final hash
aggregation merges partitions in a nondeterministic order — so `sum(double)`
can differ in the last bits run-to-run and engine-to-engine. The correctness
gate hash-compares our results against a DuckDB oracle, so every declared
aggregate over a double column goes through exact decimal arithmetic and is
cast back to double at the end:

    Spark : sum(cast(x as decimal(28, s)))  -> exact -> cast(double)
    DuckDB: CAST(SUM(CAST(x AS DECIMAL(28, s))) AS DOUBLE)

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

#: decimal(28, s) leaves 28-s integer digits — at 100 TB a sum of 1e12 rows of
#: 1e6-magnitude values needs 19 integer digits; 22 (s=6) is comfortable.
_PRECISION = 28


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
