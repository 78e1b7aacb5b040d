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


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_dsum_scale12_embedding_components_fit(spark, sf_dir):
    """The scale=12 call site (operators/similarity.exact_centroids sums
    embedding components through dsum('val', scale=12)) has only 6 integer
    digits of per-value headroom in decimal(18,12), while its DuckDB oracle
    twin uses DECIMAL(28,12): a component >= 1e6 would silently NULL out of
    the Spark sum (non-ANSI cast) but still be summed by the oracle
    (ADVICE r12 item 1). Pin the data envelope: every embedding component
    stays far inside 1e6."""
    emb = load(spark, sf_dir, "embeddings").select(
        F.explode(F.col("embedding").cast("array<double>")).alias("val")
    )
    mx = emb.agg(F.max(F.abs("val")).alias("m")).first()["m"]
    assert mx < 10**5, mx  # decimal(18,12) caps at 1e6; keep 10x slack


def test_pin_thin_skip_classification_and_default(spark):
    """r13 pin() plan-awareness: by DEFAULT every pin materializes (the
    thin-skip mode measured 1.2-1.7x slower on the thin cohort and was
    rejected — see ordering.pin docstring). Under
    spark.graft.pin_thin=false, the classifier must skip ONLY pure
    Project/Filter-over-scan pipelines: aggregates and Python-UDF maps
    (physical planning extracts *EvalPython nodes) keep the checkpoint."""
    from bigdata_streaming_absa_vehicle_spark.functions.ordering import pin

    sf = SF_DIRS[0]
    li = load(spark, sf, "lineitem")
    spark.conf.set("spark.graft.pin_sorts", "true")
    try:
        thin = li.select("l_orderkey", "l_extendedprice").filter(F.col("l_orderkey") > 0)
        # default: always pin
        assert "ExistingRDD" in pin(thin)._jdf.queryExecution().toString()

        spark.conf.set("spark.graft.pin_thin", "false")
        assert "ExistingRDD" not in pin(thin)._jdf.queryExecution().toString()

        agg = li.groupBy("l_returnflag").count()
        assert "ExistingRDD" in pin(agg)._jdf.queryExecution().toString()

        pyudf = F.udf(lambda s: s and s.lower())
        udf_map = li.select(pyudf(F.col("l_returnflag")).alias("x"))
        assert "ExistingRDD" in pin(udf_map)._jdf.queryExecution().toString()
    finally:
        spark.conf.unset("spark.graft.pin_thin")
        spark.conf.unset("spark.graft.pin_sorts")
