"""Incremental tier refresh with snapshot watermarks (checkpoint/resume).

Batch analogue of a continuous aggregate: each run reads only raw
snapshots committed after the last processed watermark, finds the
(source, bucket) windows they touch, recomputes exactly those buckets
from the full raw history (exact — percentile is not mergeable), and
commits the restated buckets as a new snapshot of each tier table. A
killed job restarts from the manifest watermark and reprocesses only
uncommitted work; committed snapshots are never rewritten.

Readers use ``read_tier_latest`` to resolve bucket restatements: the
highest snapshot id wins per (source, bucket) — Iceberg's
MERGE-on-read semantics expressed as a window dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .lineage import commit_with_lineage
from .tiers import TIER_INTERVALS, rollup_raw, rollup_up

RAW_TABLE = "raw"
WATERMARK_KEY = "tiers_from_raw"


def read_tier_latest(
    catalog, spark: SparkSession, table: str, start=None, end=None,
) -> DataFrame | None:
    """Committed tier rows with restated buckets resolved to the newest
    snapshot (latest-wins per (source, bucket)).

    ``start``/``end`` bound ``bucket_ts`` and activate the catalog's
    manifest zone maps (``TierCatalog.read_range``): snapshot dirs that
    cannot intersect the range are skipped on the driver before any
    file is touched. Latest-wins stays correct under pruning because a
    snapshot restating an in-range bucket necessarily has that bucket
    inside its own min/max stats, so it is never skipped."""
    if start is not None or end is not None:
        df = catalog.read_range(spark, table, start, end)
    else:
        df = catalog.read(spark, table)
    if df is None:
        return None
    w = Window.partitionBy("source", "bucket_ts").orderBy(F.desc("snap"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "snap")
    )


def compact_tier(catalog, spark: SparkSession, table: str) -> int | None:
    """Rewrite a tier's live snapshots into ONE compacted snapshot
    (Iceberg rewrite_data_files): materializes the latest-wins state and
    commits it, then marks the inputs superseded so every later read
    unions a single directory instead of one-per-epoch.

    Why it matters at scale: the streaming sink commits a snapshot per
    drained epoch, so an always-on ingest accumulates thousands of tiny
    snapshot dirs — the latest-wins window then pays a wider union scan
    and the row_number dedup sees ever more restatement candidates.
    Periodic compaction bounds both at one snapshot; the zone-map stats
    of the compacted snapshot are recorded by ``commit`` as usual, and
    old files stay on disk for in-flight readers until
    ``catalog.vacuum(table)``.

    Intended for TIER tables (restatement resolved by latest-wins).
    Compacting the raw table works but moves all rows above any
    ``read_since`` watermark, forcing a (restatement-safe) full
    re-rollup — prefer leaving raw append-only.
    """
    ids = catalog.snapshots(table)
    if len(ids) <= 1:
        return None
    latest = read_tier_latest(catalog, spark, table)
    new_id = catalog.commit(latest, table, {"compaction_of": ids})
    catalog.mark_superseded(table, ids)
    return new_id


def refresh_tiers(
    catalog,
    spark: SparkSession,
    quantile: float = 0.5,
    *,
    series_of=None,
    sketch: bool = False,
    delta: int = 200,
) -> dict:
    """Roll every unprocessed raw snapshot into the 1m/1h/1d tiers.

    ``series_of``: optional fn(DataFrame) -> (source, ts, value) long
    series; defaults to the token-corpus n_tok series.

    ``sketch=True`` switches to the t-digest-carrying rollups
    (plans/tiers.py rollup_raw_sketch / rollup_up_sketch): every tier
    row then stores a mergeable digest and ``vq`` estimates the RAW
    distribution's quantile, while restatement/watermark semantics are
    identical — restated buckets rebuild their digests from the scoped
    raw windows, so incremental refresh never degrades sketch accuracy.
    """
    from ..sources.tokens import token_series

    # no-op fast path BEFORE the mode guards: with nothing to process
    # the sketch/no-sketch flag is irrelevant, and raising here would
    # make a sketch-flavored catalog (e.g. one fed by --stream-sketch
    # ingest) reject every later maintenance run that omits --sketch
    wm = catalog.get_watermark(WATERMARK_KEY)
    last = catalog.last_snapshot(RAW_TABLE)
    if last is None or last <= wm:
        return {"processed": 0, "watermark": wm}

    # flavor sniff for the mode guards below: inspect ONLY the newest
    # live tier_1m snapshot's schema (one snap= dir), not a union of
    # every live snapshot — under always-on streaming ingest the
    # full-catalog listing grows with snapshot count per refresh (r03
    # ADVICE). The guards themselves keep flavors uniform across
    # snapshots, so the newest dir's schema speaks for all of them.
    _last_tier = catalog.last_snapshot("tier_1m")
    existing = (
        catalog._read_ids(spark, "tier_1m", [_last_tier])
        if _last_tier is not None else None
    )

    if sketch:
        from .tiers import rollup_raw_sketch, rollup_up_sketch

        # switching sketch on over a catalog that already holds
        # pre-sketch tier snapshots would merge restated (digest) rows
        # with historical rows that have no vdigest — NULL digests crash
        # the merge UDF, and skipping them would silently drop history
        # from the quantile estimate. Demand an explicit restatement.
        if existing is not None and "vdigest" not in existing.columns:
            raise ValueError(
                "sketch=True on a catalog whose existing tier snapshots "
                "have no vdigest column: restate the tiers first (new "
                "catalog root, or reset the watermark and re-rollup) — "
                "mixing sketchless history into digest merges would "
                "corrupt the quantile estimates"
            )

        def r_raw(df, tier, q):
            return rollup_raw_sketch(df, tier, q, delta)

        def r_up(df, tier, q):
            return rollup_up_sketch(df, tier, q, delta)
    else:
        # mirror of the guard above: sketch=False over a catalog whose
        # existing snapshots DO carry vdigest would union snapshot dirs
        # with mismatched schemas — spark.read.parquet without
        # mergeSchema infers from a sampled file, so the digest column
        # can silently disappear (or the read fails nondeterministically
        # depending on which file is sampled). Same answer: demand an
        # explicit restatement.
        if existing is not None and "vdigest" in existing.columns:
            raise ValueError(
                "sketch=False on a catalog whose existing tier snapshots "
                "carry a vdigest column: restate the tiers first (new "
                "catalog root, or reset the watermark and re-rollup) — "
                "appending sketchless snapshots would leave the tier "
                "directories with mixed schemas and nondeterministic reads"
            )
        r_raw, r_up = rollup_raw, rollup_up

    series_of = series_of or token_series
    new_raw = catalog.read_since(spark, RAW_TABLE, wm).drop("snap")
    all_raw = catalog.read(spark, RAW_TABLE).drop("snap")
    new_series = series_of(new_raw)
    full_series = series_of(all_raw)

    # affected 1m buckets: only windows the new snapshots touch
    touched = (
        new_series.select(
            "source", F.date_trunc("minute", F.col("ts")).alias("bucket_ts")
        ).distinct()
    )
    scoped = full_series.alias("s").join(
        F.broadcast(touched.alias("t")),
        on=(
            (F.col("s.source") == F.col("t.source"))
            & (F.date_trunc("minute", F.col("s.ts")) == F.col("t.bucket_ts"))
        ),
        how="leftsemi",
    )

    stats = {}
    t1m = r_raw(scoped, "1m", quantile)
    snap_1m = commit_with_lineage(catalog, spark, t1m, "tier_1m",
                                  {"raw_watermark": last})
    stats["tier_1m"] = snap_1m

    # affected coarser buckets derive from the restated 1m buckets; they
    # must re-aggregate the LATEST full set of finer buckets they cover
    latest_1m = read_tier_latest(catalog, spark, "tier_1m")
    for finer, tier, table in (("tier_1m", "1h", "tier_1h"), ("tier_1h", "1d", "tier_1d")):
        trunc = TIER_INTERVALS[tier]
        affected = t1m.select(
            "source", F.date_trunc(trunc, F.col("bucket_ts")).alias("_b")
        ).distinct() if finer == "tier_1m" else None
        finer_latest = latest_1m if finer == "tier_1m" else read_tier_latest(catalog, spark, finer)
        if affected is None:
            affected = catalog.read_since(spark, finer, stats[finer] - 1).select(
                "source", F.date_trunc(trunc, F.col("bucket_ts")).alias("_b")
            ).distinct()
        scoped_finer = finer_latest.alias("f").join(
            F.broadcast(affected.alias("a")),
            on=(
                (F.col("f.source") == F.col("a.source"))
                & (F.date_trunc(trunc, F.col("f.bucket_ts")) == F.col("a._b"))
            ),
            how="leftsemi",
        )
        out = r_up(scoped_finer, tier, quantile)
        stats[table] = commit_with_lineage(catalog, spark, out, table,
                                           {"raw_watermark": last})

    catalog.set_watermark(WATERMARK_KEY, last)
    return {"processed": last - wm, "watermark": last, **stats}
