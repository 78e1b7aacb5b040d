"""Per-SQL-node profiler for the optimization rounds (guide §7.1/§7.2 without
a live UI): runs each named registry query once with the Spark UI enabled and
dumps, for every SQL execution the query triggered (localCheckpoint
materializations and the final noop save appear as separate executions), the
node-level metrics that attribute wall time — output rows per operator,
aggregation/sort/build times, shuffle bytes — plus the per-stage task counts
so serial stages (1-task explosions behind AQE-coalesced or broadcast-probe
reads) are visible directly.

Usage:
    python tools/opt_sqlprof.py q411b_ppjoin_full q113_column_profile ...
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_streaming_absa_vehicle_spark.queries import all_queries
from bigdata_streaming_absa_vehicle_spark.session import get_spark

KEEP = ("time in agg", "number of output rows", "sort time", "shuffle bytes written",
        "time to build", "scan time", "op time", "time to broadcast", "spill size")


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-sqlprof", extra_conf={"spark.ui.enabled": "true"})
    specs = all_queries()
    base = f"http://localhost:4040/api/v1/applications/{spark.sparkContext.applicationId}"

    def sqls() -> list:
        return json.load(urllib.request.urlopen(f"{base}/sql?length=10000"))

    def stages() -> dict[int, tuple]:
        out = {}
        for s in json.load(urllib.request.urlopen(f"{base}/stages?status=complete")):
            out[s["stageId"]] = (s["numCompleteTasks"], s["executorRunTime"],
                                 s.get("shuffleReadBytes", 0), s.get("shuffleWriteBytes", 0))
        return out

    # warm-up: JVM codegen + python workers + page cache (bench discipline)
    specs["q09_pricing_summary"].fn(spark, sf).write.mode("overwrite").format("noop").save()
    for name in sys.argv[1:]:
        if name not in specs:
            print(f"!! unknown query {name}")
            continue
        specs[name].fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop").save()  # per-query codegen warm-up at smoke scale
        n0, st0 = len(sqls()), set(stages())
        df = specs[name].fn(spark, sf)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        print(f"\n#### {name}: wall={time.perf_counter() - t0:.3f}s")
        for s in sqls()[n0:]:
            print(f"== sql {s['id']} dur={s.get('duration')}ms "
                  f"nodes={len(s.get('nodes', []))} {s.get('description', '')[:50]}")
            for nd in s.get("nodes", []):
                mets = {m["name"]: m["value"] for m in nd.get("metrics", [])}
                keep = {k: v.split("\n")[-1] for k, v in mets.items()
                        if any(t in k for t in KEEP)}
                if keep and nd["nodeName"] != "ColumnarToRow":
                    print(f"   {nd['nodeId']:>3} {nd['nodeName']:<22} {keep}")
        st = stages()
        rows = sorted(((sid,) + st[sid] for sid in st if sid not in st0),
                      key=lambda r: -r[2])
        print("   stage tasks execMs shRead shWrite")
        for sid, tasks, ms, rd, wr in rows[:8]:
            print(f"   {sid:>5} {tasks:>5} {ms:>6} {rd:>9} {wr:>9}")
    spark.stop()


if __name__ == "__main__":
    main()
