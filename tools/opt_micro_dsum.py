"""Microbenchmark: is the exact-decimal sum (dsum) a per-row bottleneck?

Variants over lineitem.l_extendedprice at sf0.1 (noop sink, median of 5):
  A sum(cast(x as decimal(28,2)))           -- current dsum
  B sum(cast(x as decimal(18,2)))           -- long-backed storage decimal
  C sum(round(x*100) :: long)               -- scaled-long (rounding caveat)
  D sum(x)                                  -- plain double (lower bound)
  E count(*)                                -- scan floor
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_streaming_absa_vehicle_spark.session import get_spark
from bigdata_streaming_absa_vehicle_spark.tables import load


def timeit(df, n=5):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    return sorted(runs)[n // 2]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("micro-dsum")
    li = load(spark, sf_dir, "lineitem")
    li.write.mode("overwrite").format("noop").save()  # page-cache warm
    x = F.col("l_extendedprice")
    variants = {
        "A dec28": li.agg(F.sum(x.cast("decimal(28,2)")).cast("double")),
        "B dec18": li.agg(F.sum(x.cast("decimal(18,2)")).cast("double")),
        "C lcents": li.agg((F.sum(F.round(x * 100).cast("long")) / 100.0)),
        "D dsum_double": li.agg(F.sum(x)),
        "E count": li.agg(F.count(F.lit(1))),
        # grouped versions (the common shape): 8 groups
        "A8 dec28 grouped": li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(x.cast("decimal(28,2)")).cast("double")
        ),
        "C8 lcents grouped": li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(F.round(x * 100).cast("long")) / 100.0
        ),
        # q122 shape: 14 decimal moments vs long-moment twin
    }
    d = {c: F.col(c).cast("decimal(18,2)") for c in
         ("l_quantity", "l_extendedprice", "l_discount", "l_tax")}
    cols = list(d)
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(d[c]).cast("double"))
        aggs.append(F.sum(d[c] * d[c]).cast("double"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.sum(d[a] * d[b]).cast("double"))
    variants["Q122 decimal moments"] = li.agg(*aggs)
    cents = {c: F.round(F.col(c) * 100).cast("long") for c in cols}
    aggs2 = [F.count(F.lit(1)).alias("n")]
    M = 1 << 23
    for c in cols:
        aggs2.append(F.sum(cents[c]))
    # shiftright/bitwiseAND match the production q122 operator exactly
    # (ADVICE r12: the earlier (p / M).cast('long') measured IEEE division +
    # truncation — a different expression, and wrong for negative p)
    shift, mask = 23, M - 1
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            p = cents[a] * cents[b]
            aggs2.append(F.sum(F.shiftright(p, shift)))
            aggs2.append(F.sum(p.bitwiseAND(F.lit(mask))))
    for c in cols:
        p = cents[c] * cents[c]
        aggs2.append(F.sum(F.shiftright(p, shift)))
        aggs2.append(F.sum(p.bitwiseAND(F.lit(mask))))
    variants["Q122 long moments hi/lo"] = li.agg(*aggs2)

    for name, df in variants.items():
        print(f"{name}: {timeit(df):.4f}s")
    spark.stop()


if __name__ == "__main__":
    main()
