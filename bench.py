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


def materialize(df) -> None:
    """Force full execution without driver-side transfer."""
    df.write.format("noop").mode("overwrite").save()


def run_tiers(spark, n_docs: int) -> tuple[float, int]:
    """The headline pipeline, production-shaped: raw parquet in ->
    1m/1h/1d tier parquet out (tier writes ARE the product) -> gap-fill
    the 1m tier -> PersistAD on the 1h tier. Returns (seconds, total
    rolled points). Corpus generation + raw ingest are setup, untimed.

    Deliberately no .persist(): building Spark's columnar cache for the
    tier outputs costs more than recomputing or re-reading parquet
    (measured: cache build ~10s vs 3-4s recompute at sf0.1), and parquet
    round-trips mirror the real snapshot-committed pipeline.
    """
    import shutil
    import tempfile

    from adtk_spark.operators.detectors import persist_ad
    from adtk_spark.plans.gapfill import forward_fill, time_spine
    from adtk_spark.plans.tiers import rollup_raw, rollup_up, tier_series
    from adtk_spark.sources.tokens import token_corpus, token_series

    work = tempfile.mkdtemp(prefix="bench_tiers_")
    try:
        corpus = token_corpus(spark, n_docs, partitions=max(CPUS * 2, 16))
        token_series(corpus).write.mode("overwrite").parquet(f"{work}/raw")
        raw = spark.read.parquet(f"{work}/raw")
        n_raw = raw.count()  # parquet metadata, cheap

        t0 = time.time()
        t1m = rollup_raw(raw, "1m")
        t1m.write.mode("overwrite").parquet(f"{work}/t1m")
        t1m = spark.read.parquet(f"{work}/t1m")
        t1h = rollup_up(t1m, "1h")
        t1h.write.mode("overwrite").parquet(f"{work}/t1h")
        t1h = spark.read.parquet(f"{work}/t1h")
        t1d = rollup_up(t1h, "1d")
        t1d.write.mode("overwrite").parquet(f"{work}/t1d")
        filled = forward_fill(time_spine(tier_series(t1m), "1 minute"))
        n_filled = filled.count()
        labeled = persist_ad(tier_series(t1h), window=24, c=3.0, min_periods=12)
        materialize(labeled)
        elapsed = time.time() - t0
        counts = sum(
            spark.read.parquet(f"{work}/{t}").count() for t in ("t1m", "t1h", "t1d")
        )
        points = n_raw + counts + n_filled
        return elapsed, points
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    names = [
        "rollup_1m", "rollup_1h_2level", "quantile_ad", "persist_ad",
        "rolling_median_w7c", "double_rolling_l1", "to_events",
        "gapfill_lerp", "standard_scale", "doc_quality",
        "embed_cosine_top10",
    ]
    # warm the parquet footers / JVM before timing
    for t in ("events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
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
