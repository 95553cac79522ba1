"""Dump .explain("formatted") for every registry query to
plans/r16/<query>_<tag>.txt — the optimization round's before/after
plan evidence. Usage: python tools/r16_plans.py <tag> [query ...]
(default: all headline queries; tag is 'before' or 'after').
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from scida_spark.session import get_spark

    spark = get_spark("r16_plans")
    import __spark_entry__ as E
    from bench import HEADLINE

    reg = E.queries()
    if not names:
        names = [n for n in HEADLINE if n in reg]
    os.makedirs("plans/r16", exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = reg[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = f"plans/r16/{name}_{tag}.txt"
        with open(path, "w") as fh:
            fh.write(plan.strip() + "\n")
        n_ex = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInArrow") + plan.count(
            "MapInPandas"
        ) + plan.count("FlatMapGroupsInPandas")
        print(f"{name}: {len(plan)} chars, Exchange x{n_ex}, PythonNodes x{n_py} -> {path}")


if __name__ == "__main__":
    main()
