"""Tiered continuous aggregates: raw -> 1m -> 1h -> 1d, with retention.

The reference has no storage/rollup layer; these tiers are the north
rule's addition. Semantics (SURVEY.md §7.3 item 5): each tier holds
tumbling-window aggregates of the tier below — 1m aggregates raw
points; 1h/1d re-aggregate algebraically (min of mins, max of maxes,
sum of sums, count of counts; mean = vsum/cnt) and take their quantile
over the *finer tier's mean series* (a tier's series IS its points;
adtk detector semantics then apply per tier).

Scale notes:
- groupBy keys are (source, bucket): cardinality grows with time span,
  so parallelism scales with data; per-key size is bounded by
  events/bucket/source. Algebraic aggs combine map-side; the only
  holistic agg (percentile) sees at most one bucket's values per task.
- A pathologically hot (source, bucket) pair is handled by the salted
  two-phase path (``salt_partials``) for the algebraic part; AQE skew
  handling covers the join/shuffle side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.windows import exact_quantile_agg

TIER_INTERVALS = {"1m": "minute", "1h": "hour", "1d": "day"}
TIER_ORDER = ["raw", "1m", "1h", "1d"]


def rollup_raw(
    df: DataFrame,
    tier: str = "1m",
    quantile: float = 0.5,
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """First-level rollup from raw points."""
    trunc = TIER_INTERVALS[tier]
    v = F.col(value_col)
    return (
        df.groupBy(source_col, F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts"))
        .agg(
            F.count(v).alias("cnt"),
            F.min(v).alias("vmin"),
            F.max(v).alias("vmax"),
            F.sum(v).alias("vsum"),
            exact_quantile_agg(v, quantile).alias("vq"),
        )
        .withColumn("mean", F.col("vsum") / F.col("cnt"))
    )


def rollup_up(
    finer: DataFrame,
    tier: str,
    quantile: float = 0.5,
    *,
    source_col: str = "source",
) -> DataFrame:
    """Re-aggregate a finer tier into a coarser one. Algebraic stats
    merge exactly; the quantile is the quantile of the finer tier's mean
    points (per-tier series semantics)."""
    trunc = TIER_INTERVALS[tier]
    return (
        finer.groupBy(source_col, F.date_trunc(trunc, F.col("bucket_ts")).alias("bucket_ts"))
        .agg(
            F.sum("cnt").alias("cnt"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
            F.sum("vsum").alias("vsum"),
            exact_quantile_agg(F.col("mean"), quantile).alias("vq"),
        )
        .withColumn("mean", F.col("vsum") / F.col("cnt"))
    )


def build_tiers(
    series: DataFrame,
    quantile: float = 0.5,
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
) -> dict[str, DataFrame]:
    """raw -> 1m -> 1h -> 1d chain (lazy plan; caller materializes)."""
    t1m = rollup_raw(series, "1m", quantile, source_col=source_col,
                     ts_col=ts_col, value_col=value_col)
    t1h = rollup_up(t1m, "1h", quantile, source_col=source_col)
    t1d = rollup_up(t1h, "1d", quantile, source_col=source_col)
    return {"1m": t1m, "1h": t1h, "1d": t1d}


def tier_series(tier: DataFrame, stat: str = "mean",
                *, source_col: str = "source") -> DataFrame:
    """A tier as a detector-ready long series (source, ts, value)."""
    return tier.select(source_col, F.col("bucket_ts").alias("ts"),
                       F.col(stat).alias("value"))


def salt_partials(
    df: DataFrame,
    tier: str = "1m",
    n_salts: int = 16,
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Two-phase salted rollup for pathologically hot (source, bucket)
    keys: phase 1 aggregates (source, bucket, salt) partials, phase 2
    merges. Only algebraic stats (no exact quantile) — use when a single
    bucket can exceed a task's memory; otherwise prefer rollup_raw.
    """
    trunc = TIER_INTERVALS[tier]
    v = F.col(value_col)
    salt = F.pmod(F.xxhash64(F.col(ts_col)), F.lit(n_salts))
    partial = (
        df.groupBy(
            source_col,
            F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts"),
            salt.alias("_salt"),
        )
        .agg(
            F.count(v).alias("cnt"),
            F.min(v).alias("vmin"),
            F.max(v).alias("vmax"),
            F.sum(v).alias("vsum"),
        )
    )
    return (
        partial.groupBy(source_col, "bucket_ts")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
            F.sum("vsum").alias("vsum"),
        )
        .withColumn("mean", F.col("vsum") / F.col("cnt"))
    )


def retention_filter(
    tier_df: DataFrame, keep_after, *, ts_col: str = "bucket_ts"
) -> DataFrame:
    """Retention enforcement: drop buckets older than the policy cutoff.
    On a partitioned tier table this prunes whole partitions (the
    companion TierCatalog partitions by date(bucket_ts))."""
    return tier_df.where(F.col(ts_col) >= F.lit(keep_after))
