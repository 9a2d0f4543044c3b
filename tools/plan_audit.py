"""Physical-plan audit over every contract query.

Builds (does not execute, beyond fit-time collects inside query
construction) the optimized physical plan of all `queries()` entries
and tabulates the scale-relevant counts:

- shuffle Exchanges (every one is a cluster-wide data movement),
- broadcast vs sort-merge vs nested-loop joins,
- Python evaluation nodes (Arrow-batched pandas ops are the sanctioned
  slow path; BatchEvalPython row-at-a-time would be a red flag),
- WholeStageCodegen spans (JVM-fused pipeline segments).

Output: a markdown table on stdout (redirect into BENCH/PLANS.md).
`tests/test_plans.py` pins the load-bearing shapes; this is the
whole-surface census a reviewer can diff round over round.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARKERS = {
    "exchg": r"Exchange hashpartitioning",
    "bhj": r"BroadcastHashJoin",
    "smj": r"SortMergeJoin",
    "nlj": r"BroadcastNestedLoopJoin|CartesianProduct",
    "arrow": r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|MapInArrow",
    "rowpy": r"BatchEvalPython",
    "codegen": r"\*\(\d+\)",
}


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    from adtk_spark import get_spark

    import __spark_entry__ as entry

    spark = get_spark("plan-audit", cores=4, shuffle_partitions=8)
    print(f"# Physical-plan census ({len(entry.queries())} contract "
          f"queries, sf_dir={sf_dir})\n")
    print("| query | exchanges | bcast joins | SMJ | nested-loop "
          "| arrow py | row py | codegen spans |")
    print("|---|---|---|---|---|---|---|---|")
    bad = []
    for name, fn in entry.queries().items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution() \
                .executedPlan().toString()
        except Exception as e:  # pragma: no cover - diagnostic path
            print(f"| {name} | BUILD ERROR: {str(e)[:60]} | | | | | | |")
            bad.append(name)
            continue
        c = {k: len(re.findall(p, plan)) for k, p in MARKERS.items()}
        spans = len(set(re.findall(r"\*\((\d+)\)", plan)))
        print(f"| {name} | {c['exchg']} | {c['bhj']} | {c['smj']} | "
              f"{c['nlj']} | {c['arrow']} | {c['rowpy']} | {spans} |")
        if c["rowpy"]:
            bad.append(f"{name}: row-at-a-time Python")
    spark.stop()
    if bad:
        print(f"\nAUDIT FAILURES: {bad}")
        return 1
    print("\nAUDIT FAILURES: none (no row-at-a-time Python anywhere)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
