"""A/B experiment: per-query noop-sink timing with pin() on vs off.

pin() (lazy localCheckpoint under every final orderBy) trades "run the
pipeline twice" (range-partitioner sampling) for "materialize the result
once + read it twice". That is a win for expensive pipelines with small
results and a loss for thin scans with large results — and a pure loss for
queries whose final sort is a TakeOrdered (orderBy+limit never samples).

Design notes (first attempt was confounded): stage() stays ON in both arms
(spark.graft.pin_stages=true) so mid-pipeline reuse is not part of the
measurement, and each arm runs twice interleaved (pin, nopin, pin, nopin)
with the per-arm MIN compared, so one-time codegen/JIT cost does not load
the first arm.

Writes /tmp/pin_ab2.json: {query: {"pin": sec, "nopin": sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_streaming_absa_vehicle_spark.queries import all_queries
from bigdata_streaming_absa_vehicle_spark.session import get_spark
from bigdata_streaming_absa_vehicle_spark.tables import TABLE_NAMES, load


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pin-ab")
    spark.conf.set("spark.graft.pin_stages", "true")  # isolate pin() only
    specs = all_queries()
    # bench.py warm-up discipline
    specs["q09_pricing_summary"].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    for t in TABLE_NAMES:
        load(spark, sf_dir, t).write.mode("overwrite").format("noop").save()
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").write.mode(
        "overwrite"
    ).format("noop").save()
    specs["q60_absa_inference_batch"].fn(spark, "/root/testdata/sf0.001").write.mode(
        "overwrite"
    ).format("noop").save()
    specs["q01_projection"].fn(spark, "/root/testdata/sf0.001").write.mode(
        "overwrite"
    ).format("noop").save()

    out: dict[str, dict[str, float]] = {}
    names = sorted(specs)
    only = sys.argv[1:]
    if only:
        names = [n for n in names if n in only]
    for name in names:
        runs: dict[str, list[float]] = {"pin": [], "nopin": []}
        for _ in range(2):
            for arm, conf in (("pin", "true"), ("nopin", "false")):
                spark.conf.set("spark.graft.pin_sorts", conf)
                df = specs[name].fn(spark, sf_dir)
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                runs[arm].append(round(time.perf_counter() - t0, 4))
        spark.conf.set("spark.graft.pin_sorts", "true")
        rec = {arm: min(v) for arm, v in runs.items()}
        out[name] = rec
        d = rec["pin"] - rec["nopin"]
        if abs(d) > 0.05:
            print(f"{name}: pin={rec['pin']:.3f} nopin={rec['nopin']:.3f} delta={d:+.3f}")
    with open("/tmp/pin_ab2.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    tot_pin = sum(r["pin"] for r in out.values())
    tot_nop = sum(r["nopin"] for r in out.values())
    print(f"TOTAL pin={tot_pin:.1f}s nopin={tot_nop:.1f}s over {len(out)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
