"""Production entry point: spark-submit the streaming ingest edge.

Cluster usage (same --py-files shape as jobs/rollup_job.py):

    spark-submit --py-files /tmp/adtk_spark.zip jobs/stream_job.py \
        --source /data/raw_stream --out /data/tiers_stream \
        --score-bounds-from /data/tiers --window 24

Each invocation drains everything currently in the source directory
(availableNow trigger — the batch-boundary-friendly mode) through two
independent streaming queries:

1. watermarked 1-minute tumbling rollup -> parquet append
   (streaming/rollup_stream.py); exact quantiles are backfilled by the
   next incremental batch refresh — the documented lambda split;
2. optionally, stateful PersistAD scoring of the raw stream against
   batch-fitted bounds (streaming/stateful.py) -> labeled parquet.

Checkpoints live under --out; a rerun resumes from them and processes
only new files, which is the streaming analogue of the snapshot
watermark in the batch job (verified by running the CLI twice in
tests/test_streaming_job.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--source", required=True, help="raw-series parquet stream dir")
    p.add_argument("--out", required=True, help="output root (tiers, labels, checkpoints)")
    p.add_argument("--watermark", default="5 minutes")
    p.add_argument("--score-bounds-from", default=None,
                   help="tier-catalog root holding a raw table to fit "
                        "PersistAD bounds from (enables the scoring query)")
    p.add_argument("--window", type=int, default=24)
    p.add_argument("--min-periods", type=int, default=12)
    p.add_argument("--c", type=float, default=3.0)
    p.add_argument("--psi-ref-from", default=None,
                   help="tier-catalog root holding a raw table to fit the "
                        "frozen psi_reference from (enables the live "
                        "per-window PSI drift monitor)")
    p.add_argument("--psi-edges", default="1,25,50,100,150,250",
                   help="comma-separated PSI value-bin edges")
    p.add_argument("--psi-window", default="1 hour",
                   help="tumbling window for the streamed PSI score")
    p.add_argument("--twa", action="store_true",
                   help="also emit exact mergeable 1m TWA partials "
                        "(LOCF segments closed by per-source state; "
                        "readers merge with twa_merge_partials)")
    p.add_argument("--cores", type=int, default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from adtk_spark.session import get_spark
    from adtk_spark.streaming.rollup_stream import (
        run_available_now,
        streaming_rollup_1m,
    )

    t0 = time.time()
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("adtk-stream-job", cores=args.cores)
    report = {"source": args.source, "out": args.out}

    agg = streaming_rollup_1m(spark, args.source, watermark=args.watermark)
    run_available_now(agg, f"{args.out}/t1m", f"{args.out}/ckpt_rollup")
    report["t1m_rows"] = spark.read.parquet(f"{args.out}/t1m").count()

    if args.twa:
        from adtk_spark.streaming.rollup_stream import streaming_twa_partials

        stream = spark.readStream.schema(
            "source string, ts timestamp, value double"
        ).parquet(args.source)
        q = (streaming_twa_partials(stream, "1m")
             .writeStream.outputMode("append").trigger(availableNow=True)
             .option("checkpointLocation", f"{args.out}/ckpt_twa")
             .format("parquet").option("path", f"{args.out}/twa_partials")
             .start())
        q.awaitTermination()
        report["twa_partial_rows"] = spark.read.parquet(
            f"{args.out}/twa_partials").count()

    if args.score_bounds_from:
        from adtk_spark.operators.detectors import persist_ad_fit
        from adtk_spark.sources.catalog import TierCatalog
        from adtk_spark.streaming.stateful import streaming_persist_ad

        cat = TierCatalog(args.score_bounds_from)
        train = cat.read(spark, "raw")
        if train is not None:
            bounds = persist_ad_fit(
                train.select("source", "ts", "value"), window=args.window,
                c=args.c, min_periods=args.min_periods)
            stream = spark.readStream.schema(
                "source string, ts timestamp, value double"
            ).parquet(args.source)
            labeled = streaming_persist_ad(
                stream, bounds, window=args.window,
                min_periods=args.min_periods)
            q = (labeled.writeStream.outputMode("append")
                 .trigger(availableNow=True)
                 .option("checkpointLocation", f"{args.out}/ckpt_score")
                 .format("parquet").option("path", f"{args.out}/labels")
                 .start())
            q.awaitTermination()
            report["label_rows"] = spark.read.parquet(f"{args.out}/labels").count()

    if args.psi_ref_from:
        from adtk_spark.plans.tiers import psi_reference
        from adtk_spark.sources.catalog import TierCatalog
        from adtk_spark.streaming.rollup_stream import streaming_psi_drift

        cat = TierCatalog(args.psi_ref_from)
        train = cat.read(spark, "raw")
        if train is not None:
            edges = [float(x) for x in args.psi_edges.split(",")]
            ref = psi_reference(train.select("source", "ts", "value"), edges)
            drift = streaming_psi_drift(
                spark, args.source, edges, ref,
                window=args.psi_window, watermark=args.watermark)
            run_available_now(drift, f"{args.out}/drift",
                              f"{args.out}/ckpt_drift")
            report["drift_rows"] = spark.read.parquet(
                f"{args.out}/drift").count()

    report["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(report))
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
