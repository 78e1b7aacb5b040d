"""Interleaved A/B: registry queries with a boolean session conf toggled
on vs off, noop sink, ABBA order so machine drift cancels. Reports
per-arm medians. Default conf is `spark.graft.rebalance` (fan_out /
hold_width exchanges); `--conf spark.graft.pin_thin --on-value true
--off-value false` A/Bs the thin-pin skip (note pin_thin=true means
ALWAYS PIN, i.e. the r12 behavior, so there "on" is the OLD arm).

Usage:
    python tools/opt_ab_rebalance.py [--sf DIR] [--rounds N]
        [--conf KEY] [--on-value V] [--off-value V] q218_join_size_estimate ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_streaming_absa_vehicle_spark.queries import all_queries
from bigdata_streaming_absa_vehicle_spark.session import get_spark
from bigdata_streaming_absa_vehicle_spark.tables import TABLE_NAMES, load


def median(xs):
    s = sorted(xs)
    return s[len(s) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--conf", default="spark.graft.rebalance")
    ap.add_argument("--on-value", default="true")
    ap.add_argument("--off-value", default="false")
    args = ap.parse_args()

    spark = get_spark("opt-ab-rebalance")
    specs = all_queries()
    # bench-style warm-up so arm 1 round 1 is not paying JIT for everyone
    specs["q09_pricing_summary"].fn(spark, args.sf).write.mode("overwrite").format("noop").save()
    for t in TABLE_NAMES:
        load(spark, args.sf, t).write.mode("overwrite").format("noop").save()

    results = {}
    for name in args.names:
        arms = {"on": [], "off": []}
        spark.sparkContext.setJobDescription(f"ab:{name}")
        for r in range(args.rounds):
            # ABBA: on,off / off,on alternating across rounds
            order = ("on", "off") if r % 2 == 0 else ("off", "on")
            for arm in order:
                spark.conf.set(args.conf, args.on_value if arm == "on" else args.off_value)
                df = specs[name].fn(spark, args.sf)
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                arms[arm].append(round(time.perf_counter() - t0, 4))
        spark.conf.unset(args.conf)
        results[name] = {
            "on_median": median(arms["on"]),
            "off_median": median(arms["off"]),
            "on": arms["on"],
            "off": arms["off"],
        }
        print(f"{name}: on={median(arms['on'])} off={median(arms['off'])} "
              f"(on runs {arms['on']}, off runs {arms['off']})", flush=True)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
