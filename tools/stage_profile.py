"""Stage-level attribution for one registry query (guide §1.1/§7.1):
run the query warm with the Spark UI enabled, then pull per-stage
metrics from the REST API and print the top stages of the LAST run by
executor run time — mapping slot wall time back to operators/exchanges.

Usage: python tools/stage_profile.py <query> [n_warm]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    n_warm = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from scida_spark.session import get_spark

    spark = get_spark(
        "stage_profile", extra_conf={"spark.ui.enabled": "true"}
    )
    import __spark_entry__ as E

    reg = E.queries()
    df = reg[name](spark, sf_dir)
    for _ in range(n_warm):
        df.count()
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    before = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
    )
    seen = {s["stageId"] for s in before}
    t0 = time.perf_counter()
    df.count()
    wall = time.perf_counter() - t0
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
    )
    new = [s for s in stages if s["stageId"] not in seen]
    new.sort(key=lambda s: -s.get("executorRunTime", 0))
    total_rt = sum(s.get("executorRunTime", 0) for s in new)
    print(f"{name}: wall {wall:.2f}s, {len(new)} stages, "
          f"executorRunTime total {total_rt/1000:.1f}s (32 cores)")
    for s in new[:20]:
        dur = s.get("executorRunTime", 0) / 1000
        sr = s.get("shuffleReadBytes", 0) / 1e6
        sw = s.get("shuffleWriteBytes", 0) / 1e6
        inp = s.get("inputBytes", 0) / 1e6
        nm = s.get("name", "")[:80]
        print(
            f"  stage {s['stageId']:4d} rt {dur:7.2f}s tasks {s.get('numCompleteTasks', 0):4d} "
            f"in {inp:8.1f}MB sr {sr:7.1f}MB sw {sw:7.1f}MB  {nm}"
        )
        det = s.get("details", "")
        for line in det.splitlines():
            if "scida_spark" in line or "queries" in line:
                print(f"      {line.strip()[:110]}")
                break


if __name__ == "__main__":
    main()
