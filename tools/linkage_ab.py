"""Same-night A/B probe for the `linkage` section of
dedup_signature_pairs (r13 VERDICT next #3: the r12->r13 section probe
moved 3.90 -> 11.19 s with untouched code — above the night's 1.7x VM
band; is it real?).

Run from ANY repo tree (the current checkout or a `git worktree` of a
prior commit):

    python tools/linkage_ab.py [sf_dir] [passes]

Times, per pass: (a) the full slot count, (b) the `linkage` section
probe (filter on the discriminator, which prunes the other union
branches), (c) the `simhash` probe as the control section. Emits one
JSON line per measurement. Pass 0 includes one-time construction; on
r14+ trees the slot DataFrame is memoized so later passes measure the
pure branch execution.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from scida_spark.session import get_spark

    spark = get_spark("linkage-ab")
    fn = E.queries()["dedup_signature_pairs"]
    head = os.popen("git rev-parse --short HEAD").read().strip()
    for p in range(passes):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        construct = time.perf_counter() - t0
        out = {"commit": head, "pass": p, "construct": round(construct, 3)}
        for section in ("linkage", "simhash", "esub"):
            t0 = time.perf_counter()
            try:
                n = df.filter(F.col("method") == section).count()
            except Exception:
                continue  # section absent on older trees
            out[section] = round(time.perf_counter() - t0, 3)
            out[f"{section}_rows"] = n
        t0 = time.perf_counter()
        out["full"] = None
        n = df.count()
        out["full"] = round(time.perf_counter() - t0, 3)
        out["rows"] = n
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
