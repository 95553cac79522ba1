"""Targeted per-query timing: N interleaved samples per named registry
query at $SPARK_GRAFT_SF_DIR (default sf0.1), reporting min and median.
The min is the noise-robust number on this host (contention only ever
adds time); the bench's median-of-5 remains the driver-comparable one.

Usage: python tools/qbench.py [-n N] query [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    n = 7
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from scida_spark.session import get_spark

    spark = get_spark("qbench")
    import __spark_entry__ as E

    reg = E.queries()
    names = args
    # warm-up (JVM + Arrow workers + memoized construction)
    for name in names:
        try:
            reg[name](spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERR {exc}")
            return
    samples: dict[str, list[float]] = {m: [] for m in names}
    for _ in range(n):
        for name in names:
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"qbench:{name}")
            reg[name](spark, sf_dir).count()
            samples[name].append(time.perf_counter() - t0)
    for name in names:
        s = samples[name]
        print(
            f"{name:30s} min {min(s):7.3f}  med {statistics.median(s):7.3f}"
            f"  max {max(s):7.3f}  (n={n})"
        )


if __name__ == "__main__":
    main()
