"""Benchmark harness.

Default mode (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ...}`` plus extra keys with the
north-rule throughput metric (rolled-up points/sec across the 4
retention tiers on the synthetic token-sequence table).

``python bench.py --scaling`` additionally runs the tier pipeline at
local[8] vs local[32] on the same input and reports scaling efficiency
(the sandbox proxy for the N -> 4N executor gate, see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DOCS_PER_SF = 4_000_000  # synthetic corpus rows at sf=1.0


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def materialize(df) -> int:
    """Force full execution without driver-side transfer."""
    return df.write.format("noop").mode("overwrite").save() or df.count()


def run_tiers(spark, n_docs: int) -> tuple[float, int]:
    """The headline pipeline: token corpus -> raw series -> 1m/1h/1d
    tiers (+ gap-filled 1m) -> PersistAD on the 1h tier. Returns
    (seconds, total rolled points)."""
    from pyspark.sql import functions as F

    from adtk_spark.operators.detectors import persist_ad
    from adtk_spark.plans.gapfill import forward_fill, time_spine
    from adtk_spark.plans.tiers import build_tiers, tier_series
    from adtk_spark.sources.tokens import token_corpus, token_series

    corpus = token_corpus(spark, n_docs, partitions=max(CPUS * 2, 16))
    raw = token_series(corpus)
    raw.persist()
    n_raw = raw.count()  # corpus generation excluded from the timed span

    t0 = time.time()
    tiers = build_tiers(raw)
    counts = {}
    for name, df in tiers.items():
        df.persist()
        counts[name] = df.count()
    filled = forward_fill(time_spine(tier_series(tiers["1m"]), "1 minute"))
    n_filled = filled.count()
    labeled = persist_ad(tier_series(tiers["1h"]), window=24, c=3.0, min_periods=12)
    materialize(labeled)
    elapsed = time.time() - t0
    for df in tiers.values():
        df.unpersist()
    raw.unpersist()
    points = n_raw + sum(counts.values()) + n_filled
    return elapsed, points


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    names = [
        "rollup_1m", "rollup_1h_2level", "quantile_ad", "persist_ad",
        "rolling_median_w7c", "double_rolling_l1", "to_events",
        "gapfill_lerp", "standard_scale", "doc_quality",
        "embed_cosine_top10",
    ]
    qs = entrymod.queries()
    out = {}
    for name in names:
        t0 = time.time()
        materialize(qs[name](spark, sf_dir))
        out[name] = round(time.time() - t0, 3)
    return out


def main():
    from adtk_spark.session import get_spark

    sf = sf_of(SF_DIR)
    n_docs = max(10_000, int(DOCS_PER_SF * sf))

    if "--scaling" in sys.argv:
        results = {}
        for cores in (8, 32):
            spark = get_spark(f"bench-scaling-{cores}", cores=cores,
                              shuffle_partitions=2 * cores)
            sec, points = run_tiers(spark, n_docs)
            results[cores] = (sec, points, points / sec)
            spark.stop()
        eff = (results[32][2] / results[8][2]) / 4.0
        line = {
            "mode": "scaling", "sf": sf, "n_docs": n_docs,
            "local8_points_per_sec": round(results[8][2]),
            "local32_points_per_sec": round(results[32][2]),
            "local8_sec": round(results[8][0], 2),
            "local32_sec": round(results[32][0], 2),
            "scaling_efficiency": round(eff, 3),
        }
        print(json.dumps(line))
        return

    spark = get_spark("bench", cores=CPUS, shuffle_partitions=2 * CPUS)
    t_all = time.time()
    tier_sec, tier_points = run_tiers(spark, n_docs)
    queries = bench_queries(spark, SF_DIR)
    queries["tiers_tokens"] = round(tier_sec, 3)
    total = round(time.time() - t_all, 3)
    print(json.dumps({
        "metric": "headline_suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "tier_points": tier_points,
        "tier_points_per_sec": round(tier_points / tier_sec),
        "n_docs": n_docs,
        "cpus": CPUS,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
