"""Round-12 optimization equivalence pins.

1. The q122 scaled-integer moment rewrite rests on: for every value x of
   every correlated column, round(x * 100) (long) equals the unscaled value
   of cast(x as decimal(18,2)) — i.e. the doubles really are 2-dp decimals
   whose cents are exactly recoverable through one IEEE multiply. Checked
   exhaustively for every row at every committed scale factor.

2. The dsum precision narrowing (decimal(28,s) -> decimal(18,s)) rests on:
   no input value overflows decimal(18,s)'s integer digits at any declared
   scale. Checked for the widest-magnitude dsum inputs.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from bigdata_streaming_absa_vehicle_spark.queries.profiling import _CORR_COLS
from bigdata_streaming_absa_vehicle_spark.tables import load

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_corr_cols_cents_exactly_recoverable(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    checks = [
        F.sum(
            (
                F.round(F.col(c) * 100).cast("long")
                != (F.col(c).cast("decimal(18,2)") * 100).cast("long")
            ).cast("int")
        ).alias(c)
        for c in _CORR_COLS
    ]
    row = li.agg(*checks).first()
    assert all((row[c] or 0) == 0 for c in _CORR_COLS), row.asDict()


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_corr_cols_products_fit_hi_lo_split(spark, sf_dir):
    """Every cents product fits int64 after the >>23 split with the row
    counts of any plausible deployment (bound re-derived from live maxima)."""
    li = load(spark, sf_dir, "lineitem")
    maxes = li.agg(
        *[F.max(F.abs(F.round(F.col(c) * 100).cast("long"))).alias(c) for c in _CORR_COLS]
    ).first()
    pmax = max(maxes[c] for c in _CORR_COLS) ** 2
    per_row = max(1 << 23, pmax >> 23)
    assert (1 << 63) // per_row > 10**11  # >= 100 billion rows of headroom


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_dsum_inputs_fit_decimal18(spark, sf_dir):
    """Widest raw dsum inputs stay far inside decimal(18,6)'s 12 integer
    digits (the narrowest headroom any call site uses)."""
    li = load(spark, sf_dir, "lineitem")
    m = li.agg(
        F.max(F.abs("l_extendedprice")).alias("ep"),
        F.max(F.abs(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("rev"),
    ).first()
    ev = load(spark, sf_dir, "events").agg(F.max(F.abs("value")).alias("v")).first()
    ot = load(spark, sf_dir, "orders").agg(F.max(F.abs("o_totalprice")).alias("t")).first()
    assert max(m["ep"], m["rev"], ev["v"], ot["t"]) < 10**11
