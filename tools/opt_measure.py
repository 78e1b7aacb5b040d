"""Isolated per-query measurement harness for the optimization rounds.

Times one or more registry queries with the noop sink (guide §1.4) on the
bench session, median of N runs, and optionally dumps `.explain("formatted")`
(with pin_sorts disabled so the pre-sort pipeline is visible) to
plans/<round>/<query>_<tag>.txt.

Usage:
    python tools/opt_measure.py [--sf DIR] [--runs N] [--explain TAG] q113_column_profile ...
    python tools/opt_measure.py --explain before q113_column_profile q122_correlation_matrix
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_streaming_absa_vehicle_spark.queries import all_queries
from bigdata_streaming_absa_vehicle_spark.session import get_spark
from bigdata_streaming_absa_vehicle_spark.tables import TABLE_NAMES, load

ROUND = os.environ.get("SPARK_GRAFT_ROUND", "r12")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dump plans/<round>/<q>_<TAG>.txt")
    ap.add_argument("--no-time", action="store_true", help="explain only, skip timed runs")
    args = ap.parse_args()

    spark = get_spark("opt-measure")
    specs = all_queries()
    # same warm-up discipline as bench.py so numbers are comparable
    specs["q09_pricing_summary"].fn(spark, args.sf).write.mode("overwrite").format("noop").save()
    for t in TABLE_NAMES:
        load(spark, args.sf, t).write.mode("overwrite").format("noop").save()
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").write.mode(
        "overwrite"
    ).format("noop").save()
    specs["q60_absa_inference_batch"].fn(spark, "/root/testdata/sf0.001").write.mode(
        "overwrite"
    ).format("noop").save()
    specs["q01_projection"].fn(spark, "/root/testdata/sf0.001").write.mode(
        "overwrite"
    ).format("noop").save()

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             "plans", ROUND)
    for name in args.names:
        if name not in specs:
            print(f"!! unknown query {name}")
            continue
        if args.explain:
            os.makedirs(plans_dir, exist_ok=True)
            spark.conf.set("spark.graft.pin_sorts", "false")
            df = specs[name].fn(spark, args.sf)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            spark.conf.set("spark.graft.pin_sorts", "true")
            path = os.path.join(plans_dir, f"{name}_{args.explain}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"plan -> {path} ({txt.count('Exchange')} Exchange refs)")
        if args.no_time:
            continue
        spark.sparkContext.setJobDescription(f"opt:{name}")
        runs = []
        for _ in range(args.runs):
            df = specs[name].fn(spark, args.sf)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        med = sorted(runs)[len(runs) // 2]
        print(f"{name}: median={med:.3f}s runs={runs}")
    spark.stop()


if __name__ == "__main__":
    main()
