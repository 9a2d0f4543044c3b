"""Structured Streaming variant of the 1m tier rollup.

The batch path (plans/tiers + plans/incremental) is the system of
record — adtk's centered windows need future data, and exact quantiles
are not mergeable, so detectors stay batch. This module covers the
*ingest edge*: a file stream of raw token-series rows rolled into
1-minute tumbling aggregates with a watermark for late data. Streaming
aggregates are algebraic only (count/min/max/sum -> mean); the exact
per-bucket quantile is backfilled by the next incremental batch refresh
(the classic lambda split, stated in the tier table docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RAW_SCHEMA = "source string, ts timestamp, value double"


def streaming_rollup_1m(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "5 minutes",
) -> DataFrame:
    """readStream(parquet dir) -> watermarked 1-minute tumbling rollup."""
    stream = spark.readStream.schema(RAW_SCHEMA).parquet(source_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("source", F.window("ts", "1 minute").alias("w"))
        .agg(
            F.count("value").alias("cnt"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.sum("value").alias("vsum"),
        )
        .select(
            "source", F.col("w.start").alias("bucket_ts"),
            "cnt", "vmin", "vmax", "vsum",
            (F.col("vsum") / F.col("cnt")).alias("mean"),
        )
    )


def streaming_rollup_1m_sketch(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "5 minutes",
    delta: int = 200,
    quantile: float = 0.5,
) -> DataFrame:
    """Sketch-carrying variant of the streaming 1m rollup: each finalized
    bucket also gets a mergeable t-digest of its raw values (same
    ``vdigest`` schema as the batch ``rollup_raw_sketch``), so streamed
    snapshots can feed ``rollup_up_sketch`` re-aggregation and
    ``route_rollup_sketch`` raw-distribution quantile queries directly —
    the streaming ingest edge stops being a sketch-less second class.

    State cost: the only non-algebraic aggregate is the per-bucket
    ``collect_list``, whose size is bounded by points/bucket/source
    (exactly the batch path's per-task frame); the digest compress runs
    once per *finalized* bucket in the post-aggregation projection,
    never per micro-batch update."""
    from ..functions.sketch import digest_of_sorted_arr, digest_quantile

    stream = spark.readStream.schema(RAW_SCHEMA).parquet(source_dir)
    agged = (
        stream.withWatermark("ts", watermark)
        .groupBy("source", F.window("ts", "1 minute").alias("w"))
        .agg(
            F.count("value").alias("cnt"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.sum("value").alias("vsum"),
            F.collect_list("value").alias("_vals"),
        )
    )
    return (
        agged.select(
            "source", F.col("w.start").alias("bucket_ts"),
            "cnt", "vmin", "vmax", "vsum",
            (F.col("vsum") / F.col("cnt")).alias("mean"),
            digest_of_sorted_arr(F.col("_vals"), delta).alias("vdigest"),
        )
        .withColumn("vq", digest_quantile(F.col("vdigest"), quantile,
                                          F.col("vmin"), F.col("vmax")))
    )


def streaming_psi_drift(
    spark: SparkSession,
    source_dir: str,
    edges: list[float],
    reference: DataFrame,
    window: str = "1 hour",
    watermark: str = "5 minutes",
    eps: float = 1e-6,
) -> DataFrame:
    """Live distribution-drift monitor: every finalized tumbling window
    of the stream gets a per-source PSI against a FROZEN reference
    distribution (a ``plans.tiers.psi_reference`` fit — e.g. the
    training corpus's value distribution), so an upstream feed
    regression alarms within one window + watermark instead of at the
    next batch audit.

    Plan: ONE watermarked windowed aggregation with the bins unrolled
    as conditional integer sums (a single stateful operator — no
    chained streaming aggregation), then a pure projection: the tiny
    reference is collected and embedded as literal maps, never joined.
    Sources absent from the reference emit NULL psi (a streaming
    monitor cannot invent a reference; fit first, or refit to admit new
    sources).

    Parity: bin proportions, the ``(p - q) * ln(p / q)`` association,
    and the 1e-9 DECIMAL term quantization are identical to the batch
    ``psi_drift``, and the summation (a fixed-order chain of exact
    DECIMALs) equals its order-free DECIMAL sum — so a window's
    streamed psi is bit-equal to batch psi_drift run over
    reference + that window (verified in tests).
    """
    ref_rows = reference.collect()
    k = len(edges) + 1
    map_entries, n_entries = [], []
    for r in ref_rows:
        map_entries += [F.lit(r["source"]),
                        F.array(*[F.lit(float(p)) for p in r["props"]])]
        n_entries += [F.lit(r["source"]), F.lit(int(r["n_ref"]))]
    props_of = F.create_map(*map_entries)
    nref_of = F.create_map(*n_entries)

    v = F.col("value")
    bin_expr = None
    for e in edges:
        ind = (v >= F.lit(float(e))).cast("int")
        bin_expr = ind if bin_expr is None else bin_expr + ind

    stream = spark.readStream.schema(RAW_SCHEMA).parquet(source_dir)
    agged = (
        stream.where(v.isNotNull())
        .withColumn("_bin", bin_expr)
        .withWatermark("ts", watermark)
        .groupBy("source", F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_cur"),
            *[F.sum((F.col("_bin") == i).cast("long")).alias(f"_c{i}")
              for i in range(k)],
        )
    )
    props = props_of[F.col("source")]
    # decimal(20,9), NOT (38,9): chained decimal adds grow precision by
    # 1 each and Spark silently reduces SCALE once the 38 cap is hit —
    # (20,9) keeps the full 9-digit scale through any realistic chain
    terms = None
    for i in range(k):
        p = F.greatest(props[i], F.lit(eps))
        q = F.greatest(F.col(f"_c{i}") / F.col("n_cur"), F.lit(eps))
        term = F.round((p - q) * F.log(p / q), 9).cast("decimal(20,9)")
        terms = term if terms is None else terms + term
    # F.greatest skips NULLs, so a missing reference would silently
    # degrade to the eps floor — gate the whole score on a fitted ref
    psi = F.when(props.isNotNull(), F.round(terms.cast("double"), 6))
    return agged.select(
        "source", F.col("w.start").alias("w_start"),
        nref_of[F.col("source")].alias("n_ref"), "n_cur",
        psi.alias("psi"),
    )


def run_available_now(agg: DataFrame, out_dir: str, checkpoint: str) -> None:
    """Drain everything currently in the source (availableNow trigger),
    append to parquet, then stop — the batch-boundary-friendly mode the
    incremental refresher schedules between snapshot commits."""
    q = (
        agg.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()


def run_into_catalog(agg: DataFrame, catalog, table: str, checkpoint: str) -> None:
    """Drain the stream into the TierCatalog: each non-empty micro-batch
    of watermark-finalized 1m buckets commits ONE catalog snapshot —
    the Iceberg streaming-write contract (one snapshot per epoch), which
    makes streamed buckets immediately visible to every batch consumer
    (``read_tier_latest``, incremental refresh, the tier router) with
    no separate ingest directory to reconcile.

    Failure contract: the stream checkpoint and the catalog manifest
    are separate stores, so a crash between sink and checkpoint write
    can replay an epoch into a *second* snapshot holding the same
    buckets. That is exactly a bucket restatement: ``read_tier_latest``
    resolves (source, bucket_ts) to the newest snapshot, so replays are
    idempotent to readers — same at-least-once-commit + latest-wins-read
    pairing the batch incremental refresher uses."""
    def _commit(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        catalog.commit(batch_df, table, meta={"stream_epoch": int(epoch_id)})

    q = (
        agg.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_commit)
        .start()
    )
    q.awaitTermination()


DOC_SCHEMA = "doc_id long, ts timestamp, text string"


def streaming_dedup_exact(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "10 minutes",
    *,
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact dedup at the STREAM ingest edge: drop any document whose
    content hash was already seen within the watermark horizon — the
    cheap first pass that keeps bulk re-posts and crawler replays from
    ever landing, while the batch ``corpus.dedup_exact`` (whole-corpus,
    md5 keep-min-id) remains the system of record — the same
    lambda split as the tier rollups (streaming handles the edge,
    batch owns restatements).

    State is BOUNDED: ``dropDuplicatesWithinWatermark`` expires each
    hash key once the watermark passes it, so state size tracks the
    ingest rate x horizon, not corpus size — an unbounded
    ``dropDuplicates`` would OOM a year-long stream. Keys are 16-byte
    md5 hashes (never raw text), same as the batch path's shuffle.
    """
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(source_dir)
    return (
        stream.withColumn("content_hash", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
