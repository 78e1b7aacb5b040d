"""Bucketed interval join (SURVEY.md §2F J-10 batch twin): all pairs
(left, right) on the same key with

    right_time  IN  [left_time + lower,  left_time + upper]

The reference's streaming enrichment never joins two event streams, but the
engine declares the watermarked stream-stream interval join (J-10,
tests/test_streaming.py::test_stream_stream_interval_join); this module is
its deterministic batch twin, so the streaming PROP test can compare against
a driver-hash-checked result instead of an ad-hoc local join.

Scale shape: the naive formulation is an equi-join on the key with the time
range as a post-join filter — per-key quadratic when keys are hot (a single
celebrity user at 100 TB produces clicks x buys candidate pairs across the
WHOLE timeline). The standard fix, used here, is time bucketing: pick the
bucket width = the interval span, assign each right row to ONE bucket
(floor(t / span)) and explode each left row to the at-most-TWO buckets its
window can overlap. The join key becomes (key, bucket), so candidate pairs
are bounded by co-occupancy of a bounded time window, the shuffle key gains
time locality (hot users spread across their timeline instead of hammering
one reducer), and the exact BETWEEN filter runs post-join on a candidate set
that is already interval-local. Left rows duplicate at most 2x — constant
fan-out, map-side, no skew amplification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def _floor_div(a: Column, w: int) -> Column:
    """Exact floor division of an int64 column, correct for negatives:
    (a - pmod(a, w)) is divisible by w, so integer `div` is exact — no
    double-precision rounding at epoch-microsecond magnitudes."""
    return ((a - F.pmod(a, F.lit(w))) / F.lit(w)).cast("long")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    lower_s: int,
    upper_s: int,
) -> DataFrame:
    """Inner interval join: rows (l x r) with l[left_on] == r[right_on] and
    r[right_time] between l[left_time] + lower_s and l[left_time] + upper_s
    (bounds in whole seconds, inclusive). Column names of the two sides must
    be disjoint — the output carries all of both."""
    if upper_s <= lower_s:
        raise ValueError(f"empty interval: lower_s={lower_s} upper_s={upper_s}")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"left/right column names must be disjoint, both have {sorted(overlap)}")
    reserved = {"_b"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError("column `_b` is reserved by interval_join")

    span_us = (upper_s - lower_s) * 1_000_000
    lt = F.unix_micros(F.col(left_time))
    l_exp = left.withColumn(
        "_b",
        F.explode(
            F.array_distinct(
                F.array(
                    _floor_div(lt + F.lit(lower_s * 1_000_000), span_us),
                    _floor_div(lt + F.lit(upper_s * 1_000_000), span_us),
                )
            )
        ),
    )
    r_b = right.withColumn("_b", _floor_div(F.unix_micros(F.col(right_time)), span_us))
    cond = (
        (l_exp[left_on] == r_b[right_on])
        & (l_exp["_b"] == r_b["_b"])
        & (
            F.col(right_time)
            >= F.col(left_time) + F.expr(f"INTERVAL {lower_s} SECONDS")
        )
        & (
            F.col(right_time)
            <= F.col(left_time) + F.expr(f"INTERVAL {upper_s} SECONDS")
        )
    )
    # each right row lives in exactly one bucket, so a qualifying pair meets
    # exactly once — no dedup pass needed after the bucket join
    return l_exp.join(r_b, cond, "inner").select(*left.columns, *right.columns)
