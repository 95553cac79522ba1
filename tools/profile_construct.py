"""Profile a registry slot's CONSTRUCTION cost (plan building only —
no action): wall seconds + py4j round-trip count, the r13 VERDICT #1
metric. Usage:

    python tools/profile_construct.py sim_topk [sf_dir] [--twice]

--twice constructs a second time (exercising the _memo_slot cache) and
reports both. py4j round trips are counted as calls to
py4j.java_gateway.JavaMember.__call__ (every JVM method invocation goes
through it).
"""
from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _roundtrips(st: pstats.Stats) -> int:
    total = 0
    for (fn_file, _line, fn_name), (cc, _nc, _tt, _ct, _callers) in st.stats.items():
        if "java_gateway" in fn_file and fn_name in ("__call__", "send_command"):
            if fn_name == "__call__":
                total += cc
    return total


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "sim_topk"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "/root/testdata/sf0.1"
    twice = "--twice" in sys.argv

    from scida_spark.session import get_spark
    from scida_spark.queries import registry

    spark = get_spark("profile-construct")
    reg = registry()
    fn = reg[name].fn

    for label in ("cold", "warm") if twice else ("cold",):
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        fn(spark, sf_dir)
        pr.disable()
        wall = time.perf_counter() - t0
        st = pstats.Stats(pr)
        print(
            f"{name} construct[{label}]: wall={wall:.3f}s "
            f"py4j_calls={_roundtrips(st)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
