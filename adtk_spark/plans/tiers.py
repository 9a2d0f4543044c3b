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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.windows import _interp_sorted, exact_quantile_agg, sorted_frame_arr

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


def rollup_sliding(
    tier: DataFrame,
    width_secs: int,
    step_secs: int,
    quantile: float | None = None,
    *,
    source_col: str = "source",
) -> DataFrame:
    """Trailing sliding-window continuous aggregate over a tumbling tier.

    For every tier bucket t, aggregates all finer buckets in the window
    ``(t - width_secs, t]`` — e.g. ``width_secs=300, step_secs=60`` on
    the 1m tier is a 5-minute window sliding every minute (the north
    star's "tumbling/sliding window rollups ... as continuous
    aggregates"). Algebraic stats merge exactly from the tier partials
    (sum of sums, min of mins, count of counts); ``quantile`` (if set)
    is the exact type-7 quantile of the window's `mean` points, same
    per-tier series semantics as ``rollup_up``.

    Scale: computed FROM the tumbling tier, never from raw — input
    cardinality is already compacted by ``width/step``× vs raw, and the
    plan is one shuffle on ``source`` + a time-sorted RANGE frame of at
    most ``width_secs/step_secs`` rows, vs the ``F.window(slide)``
    explode idiom which multiplies raw rows by the overlap factor
    before the shuffle. Frame memory is bounded by the window width,
    independent of history length.
    """
    if width_secs % step_secs:
        raise ValueError("width_secs must be a multiple of step_secs")
    epoch = F.unix_timestamp(F.col("bucket_ts")).cast("long")
    win = (
        Window.partitionBy(source_col)
        .orderBy(epoch)
        .rangeBetween(-(width_secs - step_secs), 0)
    )
    cols = [
        F.col(source_col),
        F.col("bucket_ts"),
        F.sum("cnt").over(win).alias("w_cnt"),
        F.min("vmin").over(win).alias("w_min"),
        F.max("vmax").over(win).alias("w_max"),
        F.sum("vsum").over(win).alias("w_sum"),
    ]
    if quantile is None:
        out = tier.select(*cols)
    else:
        # one sorted frame buffer behind a projection boundary, then
        # interpolate — all window nodes share the (source, epoch)
        # sort, so Catalyst plans a single exchange+sort
        out = (
            tier.select(*cols, sorted_frame_arr("mean", win).alias("_arr"))
            .withColumn("w_q", _interp_sorted(F.col("_arr"), quantile))
            .drop("_arr")
        )
    return out.withColumn(
        "w_mean", F.col("w_sum").cast("double") / F.col("w_cnt")
    )


def rollup_raw_sketch(
    df: DataFrame,
    tier: str = "1m",
    quantile: float = 0.5,
    delta: int = 200,
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """First-level rollup carrying a mergeable t-digest of the bucket's
    raw value distribution (functions/sketch.py).

    This is the 100 TB scale path for *raw-distribution* quantiles at
    coarse tiers: the exact chain (``rollup_raw``/``rollup_up``) defines
    ``vq`` over the finer tier's mean points, and recovering the true
    raw quantile at 1d would otherwise re-scan raw. Here every tier row
    stores <= ``delta`` centroids (~3 KB) that coarser tiers re-merge
    algebraically, so the 1d raw quantile costs one pass over the 1h
    rows — never a raw re-scan. ``vq`` is the digest estimate
    (rank error O(1/delta)); cnt/min/max/sum/mean stay exact.
    """
    from ..functions.sketch import digest_of_sorted_arr, digest_quantile

    trunc = TIER_INTERVALS[tier]
    v = F.col(value_col)
    agged = df.groupBy(
        source_col, F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts")
    ).agg(
        F.count(v).alias("cnt"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        F.sum(v).alias("vsum"),
        F.collect_list(v).alias("_vals"),
    )
    return (
        agged.withColumn("vdigest", digest_of_sorted_arr(F.col("_vals"), delta))
        .drop("_vals")
        .withColumn("mean", F.col("vsum") / F.col("cnt"))
        .withColumn(
            "vq",
            digest_quantile(F.col("vdigest"), quantile,
                            F.col("vmin"), F.col("vmax")),
        )
    )


def rollup_up_sketch(
    finer: DataFrame,
    tier: str,
    quantile: float = 0.5,
    delta: int = 200,
    *,
    source_col: str = "source",
) -> DataFrame:
    """Re-aggregate a sketch-carrying tier: algebraic stats merge
    exactly; digests merge by concat + one vectorized re-compress, so
    ``vq`` estimates the *raw* distribution's quantile at every level
    without touching raw again."""
    from ..functions.sketch import digest_quantile, merge_digests

    trunc = TIER_INTERVALS[tier]
    agged = finer.groupBy(
        source_col, F.date_trunc(trunc, F.col("bucket_ts")).alias("bucket_ts")
    ).agg(
        F.sum("cnt").alias("cnt"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
        F.sum("vsum").alias("vsum"),
        F.collect_list("vdigest").alias("_ds"),
    )
    return (
        agged.withColumn("vdigest", merge_digests(F.col("_ds"), delta))
        .drop("_ds")
        .withColumn("mean", F.col("vsum") / F.col("cnt"))
        .withColumn(
            "vq",
            digest_quantile(F.col("vdigest"), quantile,
                            F.col("vmin"), F.col("vmax")),
        )
    )


def rollup_ohlc(
    df: DataFrame,
    tier: str = "1m",
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """OHLC tumbling rollup: per (source, bucket) the first (open) and
    last (close) values by event time plus min/max — the financial-tier
    shape of the same one-shuffle groupBy as ``rollup_raw``. ``min_by``/
    ``max_by`` are algebraic (each partial keeps one (ts, value) champion,
    merged map-side), so the plan is identical to the algebraic rollup:
    no window, no sort, one exchange on (source, bucket).

    Determinism: assumes unique ``ts`` per source (validate_series
    dedups); with duplicate timestamps min_by/max_by tie-break
    arbitrarily.
    """
    trunc = TIER_INTERVALS[tier]
    v, t = F.col(value_col), F.col(ts_col)
    return (
        df.where(v.isNotNull())
        .groupBy(source_col, F.date_trunc(trunc, t).alias("bucket_ts"))
        .agg(
            F.min_by(v, t).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, t).alias("close"),
            F.count(v).alias("cnt"),
        )
    )


def rollup_distinct(
    df: DataFrame,
    tier: str = "1h",
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Exact distinct-key count per (source, bucket) — the ops metric
    (unique users/devices per window) the algebraic tier family can't
    carry: COUNT(DISTINCT) is NOT re-aggregable upward (1h distincts
    don't sum to 1d). Catalyst plans the standard two-phase expand
    (partial distinct on (source, bucket, key) map-side, then count) —
    exact, but every level must recompute from the key level. For the
    10^12-row regime where that re-scan is the bottleneck, use
    ``rollup_distinct_sketch`` (mergeable HLL) instead.
    """
    trunc = TIER_INTERVALS[tier]
    return (
        df.groupBy(source_col, F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts"))
        .agg(F.countDistinct(key_col).alias("n_distinct"))
    )


def rollup_topk(
    df: DataFrame,
    tier: str = "1h",
    k: int = 3,
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Exact heavy hitters per (source, bucket): the top-``k`` keys by
    row count with deterministic tie-breaks (count DESC, key ASC).
    Two-phase plan: counts collapse map-side on (source, bucket, key)
    — ONE shuffle carries at most one row per distinct key per bucket —
    then a rank window over the (small) per-bucket count rows. At the
    10^12-row regime where even the distinct-key level is too wide,
    cap the key space first (hash_sample on the key) or maintain a
    Misra-Gries summary in the streaming path; this operator is the
    exact serving-layer form.
    """
    trunc = TIER_INTERVALS[tier]
    counts = df.groupBy(
        source_col,
        F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts"),
        F.col(key_col).alias("key"),
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy(source_col, "bucket_ts").orderBy(
        F.col("cnt").desc(), F.col("key").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def rollup_topk_up(
    topk_finer: DataFrame,
    tier: str = "1d",
    k: int = 3,
    *,
    source_col: str = "source",
) -> DataFrame:
    """Heavy hitters at a COARSER tier merged from the finer tier's
    stored top-``m`` rows, without re-reading the raw key level — the
    Datasketches frequent-items pattern completing the mergeable-tier
    family (t-digest quantiles, HLL distincts, fixed-bin histograms,
    and now top-k). Same output shape as ``rollup_topk``.

    Approximation contract (Misra-Gries truncation): merged counts are
    LOWER BOUNDS — a key outside some finer bucket's stored top-m
    contributes 0 there, and its true coarse count exceeds the merged
    one by at most the sum of those buckets' m-th counts. The merge is
    EXACT (identical to re-reading raw) whenever every coarse top-k key
    made every finer bucket's top-m — store m comfortably above the
    serving k (m = 4k is the usual slack) and skewed hitters satisfy it.

    Plan: one (source, coarse bucket, key) groupBy over rows that
    number at most m per finer bucket, then the same deterministic rank
    window — the whole merge touches tier rows only.
    """
    trunc = TIER_INTERVALS[tier]
    g = topk_finer.groupBy(
        source_col,
        F.date_trunc(trunc, F.col("bucket_ts")).alias("bucket_ts"),
        "key",
    ).agg(F.sum("cnt").alias("cnt"))
    w = Window.partitionBy(source_col, "bucket_ts").orderBy(
        F.col("cnt").desc(), F.col("key").asc()
    )
    return (
        g.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def rollup_hist(
    df: DataFrame,
    edges: list[float],
    tier: str = "1m",
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Mergeable histogram tier: per (source, bucket, bin) row counts
    over EXPLICIT bin edges — the exact, trivially re-aggregable
    distribution tier. Bin counts SUM upward (``rollup_hist_up``), so a
    1m -> 1h -> 1d heatmap chain reads raw once; fixed bins are the
    exact complement to the adaptive t-digest column (sketch.py) when
    the value range is known (latency SLO buckets, token-count bands).

    Bin index = number of edges <= value (0 = below the first edge,
    len(edges) = above the last), computed as a branch-free sum of
    indicator casts — whole-stage codegen, identical in any SQL
    dialect. Relational one-row-per-nonempty-bin form keeps the upward
    merge algebraic and skew-free.
    """
    trunc = TIER_INTERVALS[tier]
    v = F.col(value_col)
    bin_expr = None
    for e in edges:
        ind = (v >= F.lit(float(e))).cast("int")
        bin_expr = ind if bin_expr is None else bin_expr + ind
    return (
        df.where(v.isNotNull())
        .groupBy(
            source_col,
            F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts"),
            bin_expr.alias("bin"),
        )
        .agg(F.count("*").alias("cnt"))
    )


def rollup_hist_up(
    finer: DataFrame,
    tier: str,
    *,
    source_col: str = "source",
) -> DataFrame:
    """Merge a finer histogram tier up to ``tier``: bin counts sum —
    one algebraic groupBy over tier rows, never the raw values."""
    trunc = TIER_INTERVALS[tier]
    return finer.groupBy(
        source_col,
        F.date_trunc(trunc, F.col("bucket_ts")).alias("bucket_ts"),
        "bin",
    ).agg(F.sum("cnt").alias("cnt"))


def psi_drift(
    df: DataFrame,
    split_ts,
    edges: list[float],
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index per source between a reference window
    (``ts < split_ts``) and the current window (``ts >= split_ts``) over
    EXPLICIT value-bin edges: ``PSI = sum_bins (p_i - q_i) ln(p_i/q_i)``
    with proportions floored at ``eps`` — the standard
    distribution-drift monitor (PSI > 0.2 = major shift) a training-data
    pipeline runs per source per day to catch upstream regressions
    before they reach a model.

    Plan shape: one (source, bin) shuffle with conditional counts
    (map-side combinable), then the per-source totals as WINDOW sums
    over the source partitioning and a final per-source reduce that
    reuses that same partitioning — exactly two Exchanges, no join, no
    duplicated aggregation subtree (a totals-aggregate + join-back
    formulation plans the bin-count aggregate twice). Bins empty in
    both windows contribute exactly 0, so only observed (source, bin)
    rows ever materialize.

    Determinism: counts are integers; each bin's PSI term is computed
    with one fixed association ``(p - q) * ln(p / q)`` and the terms
    are 1e-9-quantized DECIMAL-summed, so the score is bit-stable at
    any parallelism and hash-equal to the SQL replay.
    """
    v = F.col(value_col)
    bin_expr = None
    for e in edges:
        ind = (v >= F.lit(float(e))).cast("int")
        bin_expr = ind if bin_expr is None else bin_expr + ind
    is_ref = F.col(ts_col) < F.lit(split_ts)
    per = (
        df.where(v.isNotNull())
        .groupBy(source_col, bin_expr.alias("bin"))
        .agg(
            F.sum(F.when(is_ref, 1).otherwise(0)).alias("cref"),
            F.sum(F.when(is_ref, 0).otherwise(1)).alias("ccur"),
        )
    )
    wsrc = Window.partitionBy(source_col)
    j = per.withColumn("n_ref", F.sum("cref").over(wsrc)).withColumn(
        "n_cur", F.sum("ccur").over(wsrc))
    p = F.when(F.col("n_ref") == 0, F.lit(eps)).otherwise(
        F.greatest(F.col("cref") / F.col("n_ref"), F.lit(eps)))
    q = F.when(F.col("n_cur") == 0, F.lit(eps)).otherwise(
        F.greatest(F.col("ccur") / F.col("n_cur"), F.lit(eps)))
    term = (p - q) * F.log(p / q)
    return (
        j.groupBy(source_col)
        .agg(
            F.min("n_ref").alias("n_ref"),
            F.min("n_cur").alias("n_cur"),
            F.sum(F.round(term, 9).cast("decimal(38,9)"))
            .cast("double").alias("_psi"),
        )
        .select(
            source_col, "n_ref", "n_cur",
            F.round("_psi", 6).alias("psi"),
        )
    )


def rollup_twa(
    df: DataFrame,
    tier: str = "1h",
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
    carry_sums: bool = False,
) -> DataFrame:
    """Time-weighted average per (source, bucket) for IRREGULAR series
    (TimescaleDB ``time_weight('LOCF')`` analogue): each observation
    holds its value until the next one, so a sensor that reports every
    second and then sleeps an hour doesn't get its sleep value counted
    once — plain ``mean`` is sampling-rate-biased, TWA is not. A
    point's segment [ts, next_ts) is split across every tier bucket it
    spans (the interval-explode device, so month-long silences weight
    their buckets correctly); the series' last point ends its segment
    (no extrapolation past the final observation).

    Plan shape: ONE (source, ts) window for the lead; the
    (source, bucket) groupBy's clustering is satisfied by that same
    source partitioning, so the WHOLE operator is one Exchange
    (asserted in tests). Determinism: overlap
    micros are integers, each ``value x overlap-seconds`` term is
    quantized to 1e-6 and DECIMAL-summed, the weight sum is an exact
    integer — one final division, bit-stable at any parallelism.
    ``carry_sums=True`` additionally emits the exact ``_w_us``/``_vw``
    partials so ``rollup_twa_up`` can merge the tier upward without
    re-reading raw points.
    """
    trunc = TIER_INTERVALS[tier]
    # CALENDAR interval stepping, not fixed 60/3600/86400 s: with a
    # non-UTC session timezone, date_trunc('day') buckets around DST
    # transitions are 23/25 h wide, and a fixed-seconds explode would
    # mislabel or skip those buckets — same hazard fixed in
    # rollup_retention and counter_rate (r04 ADVICE). In UTC the
    # arithmetic is bit-identical to the fixed-step version.
    shift = {"1m": "INTERVAL 1 MINUTE", "1h": "INTERVAL 1 HOUR",
             "1d": "INTERVAL 1 DAY"}[tier]
    w = Window.partitionBy(source_col).orderBy(ts_col)
    seg = (
        df.where(F.col(value_col).isNotNull())
        .select(
            source_col,
            F.col(ts_col).alias("_s"),
            F.lead(ts_col).over(w).alias("_e"),
            F.col(value_col).alias("_v"),
        )
        .where(F.col("_e").isNotNull() & (F.col("_e") > F.col("_s")))
    )
    ex = seg.select(
        source_col, "_s", "_e", "_v",
        F.explode(F.sequence(F.date_trunc(trunc, F.col("_s")),
                             F.date_trunc(trunc, F.col("_e")),
                             F.expr(shift))).alias("_bts"),
    )
    us = F.unix_micros
    b_lo = us(F.col("_bts"))
    b_hi = us(F.col("_bts") + F.expr(shift))
    ov = (F.least(us(F.col("_e").cast("timestamp")), b_hi)
          - F.greatest(us(F.col("_s").cast("timestamp")), b_lo))
    term = F.round(F.col("_v") * (ov.cast("double") / 1000000.0), 6) \
        .cast("decimal(38,6)")
    agged = ex.where(ov > 0).groupBy(
        source_col, F.col("_bts").alias("bucket_ts")
    ).agg(
        F.sum(ov).alias("_w_us"),
        F.sum(term).alias("_vw"),
    )
    out = agged.select(
        source_col, "bucket_ts", "_w_us", "_vw",
        F.round(F.col("_w_us").cast("double") / 1000000.0, 6)
        .alias("covered_secs"),
        F.round(
            F.col("_vw").cast("double")
            / (F.col("_w_us").cast("double") / 1000000.0), 6,
        ).alias("twa"),
    )
    if carry_sums:
        return out
    return out.drop("_w_us", "_vw")


def rollup_twa_up(
    twa_finer: DataFrame,
    tier: str = "1d",
    *,
    source_col: str = "source",
) -> DataFrame:
    """TWA at a COARSER tier merged from the finer tier's carried sums
    (``rollup_twa(..., carry_sums=True)``) — one groupBy over tier
    rows, the raw point level never re-read: the weight micros sum
    EXACTLY (integers) and the value-seconds DECIMALs sum exactly, so
    the merged TWA differs from a direct coarse rollup only by where
    segments were cut for quantization (hour vs day boundaries) —
    bounded by 5e-7 x pieces / covered_secs, far below the 1e-6 output
    rounding for any real bucket (tolerance-tested).
    """
    trunc = TIER_INTERVALS[tier]
    g = twa_finer.groupBy(
        source_col,
        F.date_trunc(trunc, F.col("bucket_ts")).alias("bucket_ts"),
    ).agg(F.sum("_w_us").alias("_w_us"), F.sum("_vw").alias("_vw"))
    return g.select(
        source_col, "bucket_ts",
        F.round(F.col("_w_us").cast("double") / 1000000.0, 6)
        .alias("covered_secs"),
        F.round(
            F.col("_vw").cast("double")
            / (F.col("_w_us").cast("double") / 1000000.0), 6,
        ).alias("twa"),
    )


def psi_reference(
    df: DataFrame,
    edges: list[float],
    *,
    source_col: str = "source",
    value_col: str = "value",
) -> DataFrame:
    """Fit the per-source reference bin distribution ``psi_drift``
    compares against: one row per source with ``n_ref`` and ``props``
    (bin proportions, ``len(edges)+1`` entries). Feed the collected
    result to ``streaming_psi_drift`` to monitor a live feed against a
    frozen training-time distribution.

    Scale: ONE groupBy(source) with the bins unrolled as conditional
    integer sums (map-side combinable) — no (source, bin) row
    materialization, no second pass. Proportions are single IEEE
    divisions of exact integer counts, so the collected literals replay
    bit-equal wherever they are re-embedded.
    """
    v = F.col(value_col)
    bin_expr = None
    for e in edges:
        ind = (v >= F.lit(float(e))).cast("int")
        bin_expr = ind if bin_expr is None else bin_expr + ind
    k = len(edges) + 1
    d = df.where(v.isNotNull()).withColumn("_bin", bin_expr)
    agg = d.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_ref"),
        *[F.sum((F.col("_bin") == i).cast("long")).alias(f"_c{i}")
          for i in range(k)],
    )
    props = F.array(*[F.col(f"_c{i}") / F.col("n_ref") for i in range(k)])
    return agg.select(source_col, "n_ref", props.alias("props"))


def ks_drift(
    df: DataFrame,
    split_ts,
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
    round_to: int | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic per source between the
    reference window (``ts < split_ts``) and the current window
    (``ts >= split_ts``): ``D = max_x |F_ref(x) - F_cur(x)|`` over the
    empirical CDFs. The bin-free companion to ``psi_drift`` — PSI needs
    explicit edges chosen in advance and saturates on unseen mass; KS
    is parameter-free and catches any shape change, so a feed monitor
    runs both (PSI for interpretable per-bin attribution, KS for the
    edge-free alarm).

    Plan shape: one (source, value) shuffle with conditional integer
    counts (map-side combinable), then cumulative window sums over the
    source partitioning ordered by value, and a final per-source max
    that reuses that same partitioning — exactly two Exchanges, no
    join, mirror of ``psi_drift``.

    Determinism: the statistic is computed ENTIRELY in integers —
    ``D = max |rc*n_cur - cc*n_ref| / (n_ref*n_cur)`` where rc/cc are
    cumulative counts at each distinct value — so the max is exact (no
    float ECDF subtraction ties) and the single final division makes
    the score bit-stable at any parallelism and hash-equal to the SQL
    replay. Sources empty on either side emit NULL ks.

    Scale caveat: the second stage's per-source cumsum runs over the
    DISTINCT values of that source — already-quantized data (token
    counts, integer gauges) keeps it tiny, but continuous floats
    degenerate toward one sorted pass per source. For those, set
    ``round_to`` (decimal places) to bound distinct values; the KS
    statistic of the rounded sample differs from the raw one by at
    most the mass within half an ulp of each cut — at round_to=3 that
    is far below any actionable drift threshold.
    """
    v = F.col(value_col)
    if round_to is not None:
        v = F.round(v, round_to)
    is_ref = F.col(ts_col) < F.lit(split_ts)
    per = (
        df.where(v.isNotNull())
        .groupBy(source_col, v.alias("v"))
        .agg(
            F.sum(F.when(is_ref, 1).otherwise(0)).alias("cref"),
            F.sum(F.when(is_ref, 0).otherwise(1)).alias("ccur"),
        )
    )
    wsrc = Window.partitionBy(source_col)
    wcum = wsrc.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    j = (
        per.withColumn("n_ref", F.sum("cref").over(wsrc))
        .withColumn("n_cur", F.sum("ccur").over(wsrc))
        .withColumn("rc", F.sum("cref").over(wcum))
        .withColumn("cc", F.sum("ccur").over(wcum))
    )
    # DECIMAL cross-products: two ~1e12 per-source counts would
    # overflow int64 multiplied; (20,0)x(20,0) -> (38,0) holds 1e26.
    dec = "decimal(20,0)"
    gap = F.abs(
        F.col("rc").cast(dec) * F.col("n_cur").cast(dec)
        - F.col("cc").cast(dec) * F.col("n_ref").cast(dec)
    )
    return (
        j.groupBy(source_col)
        .agg(
            F.min("n_ref").alias("n_ref"),
            F.min("n_cur").alias("n_cur"),
            F.max(gap).alias("_gap"),
        )
        .select(
            source_col, "n_ref", "n_cur",
            F.when(
                (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
                F.round(
                    F.col("_gap").cast("double")
                    # the denominator needs the same DECIMAL treatment as
                    # the numerator: two ~3e9+ per-source counts multiplied
                    # as int64 would silently wrap (r04 ADVICE)
                    / (F.col("n_ref").cast(dec) * F.col("n_cur").cast(dec))
                    .cast("double"),
                    6,
                ),
            ).alias("ks"),
        )
    )


def js_drift(
    df: DataFrame,
    split_ts,
    edges: list[float],
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Jensen-Shannon divergence per source between the reference
    window (``ts < split_ts``) and the current window over EXPLICIT
    value-bin edges: ``JSD = KL(p||m)/2 + KL(q||m)/2`` with
    ``m = (p+q)/2``. The bounded companion to ``psi_drift`` over the
    same bins: PSI is unbounded and needs an eps floor exactly where
    drift is worst (a bin empty on one side), JSD handles
    zero-proportion bins natively (``0*ln(0) = 0`` and ``m > 0``
    whenever the bin is observed at all) and saturates at ``ln 2``, so
    thresholds transfer across sources with wildly different
    distributions. A feed monitor runs all three: PSI for per-bin
    attribution, KS for the edge-free alarm, JSD for the bounded
    cross-source comparable score.

    Plan shape: identical to ``psi_drift`` — one (source, bin) shuffle
    with conditional integer counts (map-side combinable), per-source
    totals as WINDOW sums over the source partitioning, final reduce
    on that same partitioning: exactly two Exchanges, no join. Bins
    empty in both windows never materialize and would contribute 0.

    Determinism: counts are integers; each bin's term is computed with
    one fixed association ``0.5*p*ln(p/m) + 0.5*q*ln(q/m)`` (each half
    gated to 0 when its proportion is 0) and the terms are
    1e-9-quantized DECIMAL-summed, so the score is bit-stable at any
    parallelism and hash-equal to the SQL replay. Sources empty on
    either side emit NULL jsd (KS convention — "distance to no data"
    is not 0.5*ln2).
    """
    v = F.col(value_col)
    bin_expr = None
    for e in edges:
        ind = (v >= F.lit(float(e))).cast("int")
        bin_expr = ind if bin_expr is None else bin_expr + ind
    is_ref = F.col(ts_col) < F.lit(split_ts)
    per = (
        df.where(v.isNotNull())
        .groupBy(source_col, bin_expr.alias("bin"))
        .agg(
            F.sum(F.when(is_ref, 1).otherwise(0)).alias("cref"),
            F.sum(F.when(is_ref, 0).otherwise(1)).alias("ccur"),
        )
    )
    wsrc = Window.partitionBy(source_col)
    j = per.withColumn("n_ref", F.sum("cref").over(wsrc)).withColumn(
        "n_cur", F.sum("ccur").over(wsrc))
    p = F.when(F.col("n_ref") == 0, F.lit(0.0)).otherwise(
        F.col("cref") / F.col("n_ref"))
    q = F.when(F.col("n_cur") == 0, F.lit(0.0)).otherwise(
        F.col("ccur") / F.col("n_cur"))
    m = (p + q) * F.lit(0.5)
    term = (
        F.when(p > 0, F.lit(0.5) * p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(q > 0, F.lit(0.5) * q * F.log(q / m)).otherwise(F.lit(0.0))
    )
    return (
        j.groupBy(source_col)
        .agg(
            F.min("n_ref").alias("n_ref"),
            F.min("n_cur").alias("n_cur"),
            F.sum(F.round(term, 9).cast("decimal(38,9)"))
            .cast("double").alias("_jsd"),
        )
        .select(
            source_col, "n_ref", "n_cur",
            F.when(
                (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
                F.round("_jsd", 6),
            ).alias("jsd"),
        )
    )


def psi_timeline(
    df: DataFrame,
    edges: list[float],
    tier: str = "1d",
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
    eps: float = 1e-6,
) -> DataFrame:
    """PSI drift TIMELINE: each tier bucket's value distribution scored
    against the source's previous observed bucket — ``psi_drift`` gives
    one number for one chosen split; this gives the per-source
    day-over-day (or hour-over-hour) drift series a feed dashboard
    plots and alerts on. Emits ``prev_bucket_ts`` so a consumer can see
    when "previous" skipped an ingest gap; the first bucket per source
    has NULL psi.

    Plan shape: ONE (source, bucket) groupBy with the bins unrolled as
    conditional integer sums (no (source, bucket, bin) row
    materialization — a lag over sparse bin rows would silently skip
    empty bins), then ONE lag window over the source partitioning —
    two Exchanges, no join. Same association and DECIMAL term
    quantization as psi_drift/streaming_psi_drift: bit-stable at any
    parallelism.
    """
    trunc = TIER_INTERVALS[tier]
    v = F.col(value_col)
    bin_expr = None
    for e in edges:
        ind = (v >= F.lit(float(e))).cast("int")
        bin_expr = ind if bin_expr is None else bin_expr + ind
    k = len(edges) + 1
    per = (
        df.where(v.isNotNull())
        .withColumn("_bin", bin_expr)
        .groupBy(source_col,
                 F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts"))
        .agg(
            F.count(F.lit(1)).alias("n_cur"),
            *[F.sum((F.col("_bin") == i).cast("long")).alias(f"_c{i}")
              for i in range(k)],
        )
    )
    w = Window.partitionBy(source_col).orderBy("bucket_ts")
    lagged = per.select(
        source_col, "bucket_ts", "n_cur",
        F.lag("bucket_ts").over(w).alias("prev_bucket_ts"),
        F.lag("n_cur").over(w).alias("n_prev"),
        *[F.col(f"_c{i}") for i in range(k)],
        *[F.lag(f"_c{i}").over(w).alias(f"_p{i}") for i in range(k)],
    )
    # decimal(20,9), NOT (38,9): Spark grows precision by 1 per chained
    # add and SILENTLY DROPS SCALE (9 -> 8 -> ... -> 6) once the cap of
    # 38 is hit — (20,9) leaves 18 digits of headroom for the chain
    terms = None
    for i in range(k):
        p = F.greatest(F.col(f"_p{i}") / F.col("n_prev"), F.lit(eps))
        q = F.greatest(F.col(f"_c{i}") / F.col("n_cur"), F.lit(eps))
        term = F.round((p - q) * F.log(p / q), 9).cast("decimal(20,9)")
        terms = term if terms is None else terms + term
    # F.greatest skips NULLs: without the gate, the first bucket would
    # score against an eps-floored phantom instead of emitting NULL
    psi = F.when(F.col("n_prev").isNotNull(),
                 F.round(terms.cast("double"), 6))
    return lagged.select(
        source_col, "bucket_ts", "prev_bucket_ts", "n_prev", "n_cur",
        psi.alias("psi"),
    )


def seasonality_strength(
    df: DataFrame,
    period_secs: int,
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """How seasonal is each source at a CANDIDATE period? Emits
    ``strength = max(0, 1 - Var(x - phase_mean) / Var(x))`` — the
    fraction of variance a phase-of-period profile explains (1 = pure
    seasonal, 0 = the period explains nothing). The routing knob in
    front of SeasonalAD/ClassicSeasonalDecomposition: score a period
    grid per source, send only genuinely seasonal sources (say
    strength > 0.6) into the seasonal detectors, plain shift/persist
    detectors for the rest.

    Plan shape: one (source, phase) window for the phase means, one
    (source) window + groupBy sharing the source partitioning — two
    Exchanges, no join. Determinism: phase/overall means come from
    1e-9-quantized DECIMAL sums with ONE final division, squared
    residuals are re-quantized before the DECIMAL variance sums, so
    the score is bit-stable at any parallelism (the verify-recipe rule:
    never hash an unordered raw-double aggregation).
    """
    v = F.col(value_col)
    secs = F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1_000_000)
    phase = F.floor(secs).cast("long") % F.lit(int(period_secs))
    d = df.where(v.isNotNull()).select(
        source_col, v.alias("_v"), phase.alias("_ph"))

    def dec_mean(win) -> Column:
        s = F.sum(F.round(F.col("_v"), 9).cast("decimal(38,9)")).over(win)
        return s.cast("double") / F.count(F.lit(1)).over(win)

    wp = Window.partitionBy(source_col, "_ph")
    ws = Window.partitionBy(source_col)
    d = d.withColumn("_pm", dec_mean(wp)).withColumn("_m", dec_mean(ws))
    rq = F.round((F.col("_v") - F.col("_pm"))
                 * (F.col("_v") - F.col("_pm")), 9).cast("decimal(38,9)")
    tq = F.round((F.col("_v") - F.col("_m"))
                 * (F.col("_v") - F.col("_m")), 9).cast("decimal(38,9)")
    out = d.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(rq).cast("double").alias("_ssr"),
        F.sum(tq).cast("double").alias("_sst"),
    )
    strength = F.when(
        F.col("_sst") > 0,
        F.greatest(F.lit(0.0),
                   F.round(F.lit(1.0) - F.col("_ssr") / F.col("_sst"), 6)),
    )
    return out.select(
        source_col, "n",
        F.lit(int(period_secs)).alias("period_secs"),
        strength.alias("strength"),
    )


def seasonality_scan(
    df: DataFrame,
    periods: list[int],
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """``seasonality_strength`` over a whole CANDIDATE-PERIOD GRID in
    one plan: the input is exploded once per period and every
    (source, period, phase) mean comes from a single shared window pass
    — two Exchanges for the entire grid, where p separate strength
    calls would cost 2p. The practical router call: scan
    [hour, day, week], route each source by its best period.

    Output one row per (source, period_secs) with n and strength;
    same DECIMAL quantization as seasonality_strength, so values for
    any single period are identical to the single-period op's.
    """
    v = F.col(value_col)
    secs = F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1_000_000)
    d = (
        df.where(v.isNotNull())
        .select(source_col, v.alias("_v"),
                F.floor(secs).cast("long").alias("_secs"))
        .withColumn("period_secs",
                    F.explode(F.array(*[F.lit(int(p)) for p in periods])))
        .withColumn("_ph", F.col("_secs") % F.col("period_secs"))
    )

    def dec_mean(win) -> Column:
        s = F.sum(F.round(F.col("_v"), 9).cast("decimal(38,9)")).over(win)
        return s.cast("double") / F.count(F.lit(1)).over(win)

    wp = Window.partitionBy(source_col, "period_secs", "_ph")
    ws = Window.partitionBy(source_col, "period_secs")
    d = d.withColumn("_pm", dec_mean(wp)).withColumn("_m", dec_mean(ws))
    rq = F.round((F.col("_v") - F.col("_pm"))
                 * (F.col("_v") - F.col("_pm")), 9).cast("decimal(38,9)")
    tq = F.round((F.col("_v") - F.col("_m"))
                 * (F.col("_v") - F.col("_m")), 9).cast("decimal(38,9)")
    out = d.groupBy(source_col, "period_secs").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(rq).cast("double").alias("_ssr"),
        F.sum(tq).cast("double").alias("_sst"),
    )
    strength = F.when(
        F.col("_sst") > 0,
        F.greatest(F.lit(0.0),
                   F.round(F.lit(1.0) - F.col("_ssr") / F.col("_sst"), 6)),
    )
    return out.select(source_col, "n", "period_secs",
                      strength.alias("strength"))


def seasonal_naive_anomaly(
    df: DataFrame,
    period_secs: int,
    z: float = 3.0,
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Seasonal-naive residual anomaly over a (tier) series: baseline =
    the value exactly one period earlier (the forecasting-textbook
    "seasonal naive" forecast), residual = value - baseline, flagged
    when |residual - mu_resid| > z * sd_resid per source. The
    tier-native complement to SeasonalAD: where the classic
    decomposition fits a phase profile (and needs a fit pass), the
    naive baseline is a pure window expression — the right first-line
    monitor over 1h/1d rollup tiers ("is this hour unlike the same
    hour yesterday, beyond this source's normal day-over-day churn?").

    Plan shape: ONE Exchange (hash on source). The baseline is an
    exact-offset RANGE frame over epoch micros (never a row lag, so
    missing buckets yield NULL baselines instead of silently comparing
    against the wrong period), and the residual moments are unordered
    whole-partition windows over the SAME source partitioning — no
    join, no second shuffle, no fit action. Scales per source-span
    like every tier window.

    Determinism: residuals are 1e-9-quantized before the DECIMAL
    moment sums; mu/var/sd are then single IEEE expressions on exact
    inputs, so the flag is bit-stable at any parallelism and
    replayable in SQL (DuckDB: the same exact-offset RANGE frame with
    INTERVAL bounds).
    """
    v = F.col(value_col)
    eus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    off = int(period_secs) * 1_000_000
    wb = (
        Window.partitionBy(source_col)
        .orderBy(eus)
        .rangeBetween(-off, -off)
    )
    d = df.select(source_col, ts_col, v.alias("_v")).withColumn(
        "_base", F.max("_v").over(wb))
    # NOTE: the residual is quantized to 1e-9 ONLY inside the DECIMAL
    # moment sums; every emitted value rounds the ORGANIC double once.
    # Rounding an already-9-quantized value to 6 decimals manufactures
    # exact ...500 ties where Spark's shortest-repr HALF_UP and a
    # binary-rounding engine disagree (~1/1000 rows) — caught live at
    # sf0.1.
    d = d.withColumn("_r", F.col("_v") - F.col("_base"))
    r9 = F.round(F.col("_r"), 9)
    ws = Window.partitionBy(source_col)
    n = F.count("_r").over(ws)
    s = F.sum(r9.cast("decimal(38,9)")).over(ws).cast("double")
    ss = F.sum(F.round(F.col("_r") * F.col("_r"), 9)
               .cast("decimal(38,9)")).over(ws).cast("double")
    d = d.select(source_col, ts_col, "_v", "_base", "_r",
                 n.alias("_n"), s.alias("_s"), ss.alias("_ss"))
    mu = F.col("_s") / F.col("_n")
    sd = F.sqrt(F.greatest(
        F.col("_ss") / F.col("_n") - mu * mu, F.lit(0.0)))
    flag = F.when(
        F.col("_r").isNotNull(),
        F.abs(F.col("_r") - mu) > F.lit(float(z)) * sd,
    )
    return d.select(
        source_col,
        ts_col,
        F.round("_v", 6).alias("value"),
        F.round("_base", 6).alias("baseline"),
        F.round("_r", 6).alias("resid"),
        flag.alias("is_anomaly"),
    )


def rollup_retention(
    df: DataFrame,
    tier: str = "1h",
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Consecutive-bucket retention: per (source, bucket) the number of
    distinct keys also present in the PREVIOUS bucket, plus the
    bucket's own distinct count and the retention ratio — the
    stickiness metric distinct counts alone can't give (set
    intersection is not re-aggregable; it needs the key level once).

    Plan: one map-side distinct collapse to (source, bucket, key) rows,
    then a self equi-join on (source, key, next-bucket) — co-located
    on the same hash keys, so AQE plans a single shuffle reused by both
    sides — and an algebraic count per bucket. Buckets with no
    predecessor simply report retained = 0.

    The previous-bucket shift uses a CALENDAR interval (INTERVAL 1 DAY
    etc.), not fixed seconds: with a non-UTC session timezone,
    date_trunc('day') buckets around DST transitions are 23/25 h wide,
    and a fixed 86400 s shift would miss the join and silently read
    retention 0 on those days (r03 ADVICE).
    """
    trunc = TIER_INTERVALS[tier]
    shift = {"1m": "INTERVAL 1 MINUTE", "1h": "INTERVAL 1 HOUR",
             "1d": "INTERVAL 1 DAY"}[tier]
    cur = df.select(
        source_col,
        F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts"),
        F.col(key_col).alias("key"),
    ).distinct()
    prev_shifted = cur.select(
        source_col,
        (F.col("bucket_ts") + F.expr(shift)).alias("bucket_ts"),
        "key",
    )
    retained = (
        cur.join(prev_shifted, [source_col, "bucket_ts", "key"])
        .groupBy(source_col, "bucket_ts")
        .agg(F.count("*").alias("n_retained"))
    )
    totals = cur.groupBy(source_col, "bucket_ts").agg(
        F.count("*").alias("n_distinct")
    )
    return (
        totals.join(retained, [source_col, "bucket_ts"], "left")
        .select(
            source_col,
            "bucket_ts",
            "n_distinct",
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            F.round(
                F.coalesce("n_retained", F.lit(0)) / F.col("n_distinct"), 6
            ).alias("retention"),
        )
    )


def rollup_distinct_sketch(
    df: DataFrame,
    tier: str = "1m",
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    key_col: str = "user_id",
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable distinct-count tier: per (source, bucket) a Datasketches
    HLL sketch (``hll_sketch_agg``) instead of an exact distinct — the
    same role the t-digest column plays for quantiles. Sketches union
    upward (``rollup_distinct_up``) without touching the key level
    again, so a raw->1m->1h->1d distinct chain reads the raw keys ONCE
    (the Iceberg theta/HLL-sketch pattern). ~0.8% relative error at
    lg_k=12 with 4 KB per bucket.
    """
    trunc = TIER_INTERVALS[tier]
    return (
        df.groupBy(source_col, F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts"))
        .agg(F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("hll"))
        .withColumn("n_distinct_est", F.hll_sketch_estimate("hll").cast("long"))
    )


def rollup_distinct_up(
    finer: DataFrame,
    tier: str,
    *,
    source_col: str = "source",
) -> DataFrame:
    """Union a finer sketch tier up to ``tier``: hll_union_agg merges
    the per-bucket sketches — one shuffle over sketch rows (thousands
    of bytes per bucket), never the raw keys."""
    trunc = TIER_INTERVALS[tier]
    return (
        finer.groupBy(
            source_col, F.date_trunc(trunc, F.col("bucket_ts")).alias("bucket_ts")
        )
        .agg(F.hll_union_agg("hll").alias("hll"))
        .withColumn("n_distinct_est", F.hll_sketch_estimate("hll").cast("long"))
    )


def m4_downsample(
    df: DataFrame,
    width: str = "15 minutes",
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """M4 visualization-grade downsampling (Jugel et al., VLDB 2014):
    per (source, tumbling ``width`` bucket) keep ONLY the real points a
    line rendering needs — the first, last, min-value and max-value
    tuples — and drop everything else. Error-free for pixel-perfect
    line charts when ``width`` matches the pixel column; at 100 TB this
    is the serve-a-dashboard operator (<=4 rows out per bucket
    regardless of input density).

    Plan shape: ONE shuffle (the groupBy on (source, bucket)); the <=4
    champions per bucket are algebraic aggregates (min/max/min_by/
    max_by/struct-min merge map-side), then a local array_distinct +
    explode — no second exchange, no window, no sort.

    Determinism (required for oracle hashing): assumes unique ``ts``
    per source (validate_series parity — the engine's standing series
    precondition). Ties on *value* are broken by timestamp via struct
    ordering: the min point is (vmin, earliest ts among vmin rows), the
    max point is (vmax, latest ts among vmax rows).

    Returns (source, ts, value) rows — a genuine sub-series of the
    input, ordered relation semantics left to the caller.
    """
    v, t = F.col(value_col), F.col(ts_col)
    agg = (
        df.where(v.isNotNull())
        .groupBy(source_col, F.window(t, width)["start"].alias("_bucket"))
        .agg(
            F.min(t).alias("_tf"),
            F.min_by(v, t).alias("_vf"),
            F.max(t).alias("_tl"),
            F.max_by(v, t).alias("_vl"),
            F.min(F.struct(v.alias("v"), t.alias("t"))).alias("_mn"),
            F.max(F.struct(v.alias("v"), t.alias("t"))).alias("_mx"),
        )
    )
    pts = agg.select(
        source_col,
        F.explode(
            F.array_distinct(
                F.array(
                    F.struct(F.col("_tf").alias(ts_col), F.col("_vf").alias(value_col)),
                    F.struct(
                        F.col("_mn")["t"].alias(ts_col),
                        F.col("_mn")["v"].alias(value_col),
                    ),
                    F.struct(
                        F.col("_mx")["t"].alias(ts_col),
                        F.col("_mx")["v"].alias(value_col),
                    ),
                    F.struct(F.col("_tl").alias(ts_col), F.col("_vl").alias(value_col)),
                )
            )
        ).alias("_p"),
    )
    return pts.select(source_col, f"_p.{ts_col}", f"_p.{value_col}")


def rollup_slope(
    df: DataFrame,
    tier: str = "1h",
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-bucket OLS trend tier: the least-squares slope of value vs
    time inside each (source, tumbling bucket) — the PromQL ``deriv()``
    analogue as a materialized tier, for "how fast is this metric
    moving" dashboards and pre-breach alerting where ``counter_rate``
    only fits monotone counters.

    Closed form from sums, one shuffle: ``slope = (n*Sxy - Sx*Sy) /
    (n*Sxx - Sx^2)`` with x = seconds since the bucket start. All five
    statistics combine map-side (algebraic), so the plan is exactly the
    rollup_raw shape — groupBy (source, bucket), no window, no second
    pass, per-bucket work bounded by bucket density.

    Determinism: x is derived from integer micros relative to the
    bucket start (never absolute epoch, so Sxx stays small and the
    per-row doubles are exact to micros); each per-row term is
    1e-9-quantized and DECIMAL-summed; the final slope is one fixed
    double expression over the exact sums. Zero-variance buckets
    (single point, or all points at one timestamp) emit NULL rather
    than an IEEE infinity.
    """
    trunc = TIER_INTERVALS[tier]
    v, t = F.col(value_col), F.col(ts_col)
    bucket = F.date_trunc(trunc, t)
    xs = (
        (F.unix_micros(t.cast("timestamp"))
         - F.unix_micros(bucket.cast("timestamp"))).cast("double")
        / F.lit(1_000_000.0)
    )
    d = df.where(v.isNotNull()).select(
        source_col,
        bucket.alias("bucket_ts"),
        xs.alias("_x"),
        v.alias("_y"),
    )

    def dsum(c: Column) -> Column:
        return F.sum(F.round(c, 9).cast("decimal(38,9)")).cast("double")

    agg = d.groupBy(source_col, "bucket_ts").agg(
        F.count("*").alias("n"),
        dsum(F.col("_x")).alias("_sx"),
        dsum(F.col("_y")).alias("_sy"),
        dsum(F.col("_x") * F.col("_x")).alias("_sxx"),
        dsum(F.col("_x") * F.col("_y")).alias("_sxy"),
    )
    n = F.col("n").cast("double")
    denom = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    # Variance floor, not just != 0: for an (near-)zero-x-variance
    # bucket the denominator is PURE 1e-9-quantization residue (round
    # (x*x,9) vs round(x,9)^2), and num/denom amplifies engine-level
    # ulp rounding differences into garbage slopes — caught live on
    # n=1 buckets at sf0.01. denom = n^2*Var(x); requiring
    # Var(x) > 1e-5 s^2 (x-spread beyond ~3ms) keeps every real bucket
    # and NULLs exactly the degenerate ones.
    return agg.select(
        source_col, "bucket_ts", "n",
        F.when(denom > n * n * F.lit(1e-5),
               F.round(num / denom, 6)).alias("slope_per_sec"),
    )


def ltob_downsample(
    df: DataFrame,
    width: str = "15 minutes",
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Largest-Triangle-One-Bucket downsampling (Steinarsson 2013, the
    public LTTB thesis, ch. 4.2): per (source, tumbling ``width``
    bucket) keep the single point forming the largest triangle with its
    immediate raw neighbors — the *shape-preserving* one-point-per-pixel
    companion to M4's four-champion buckets (M4 is error-free for line
    rasterization; LTOB reads better at one point per pixel and is the
    standard choice when the renderer interpolates). LTOB, not LTTB,
    deliberately: LTTB's triangle anchors on the PREVIOUSLY SELECTED
    point, a sequential dependency that cannot distribute; LTOB's
    anchors are the raw neighbors, so every point scores independently
    — the thesis's own parallel-friendly variant.

    Plan shape: ONE Exchange. The neighbor lag/lead window partitions
    on source; the per-bucket argmax window partitions on (source,
    bucket) — hash(source) already clusters that, so Spark inserts only
    a sort, no second shuffle. Endpoint rows (no neighbor) have NULL
    area and rank last (explicit NULLS LAST both engines — Spark and
    DuckDB disagree on default NULL order), so they are kept only when
    alone in their bucket.

    Determinism: the doubled triangle area is one fixed IEEE expression
    over epoch-micros deltas and raw values (micros fit double's 53-bit
    mantissa; the deltas are small); ties — exact, e.g. every area 0 on
    a flat series — break by earliest ts. Unique ts per source assumed
    (validate_series parity).
    """
    v, t = F.col(value_col), F.col(ts_col)
    d = df.where(v.isNotNull()).select(
        source_col, t.alias(ts_col), v.alias(value_col),
        F.unix_micros(t.cast("timestamp")).cast("double").alias("_x"),
    )
    wn = Window.partitionBy(source_col).orderBy(ts_col)
    d = d.select(
        source_col, ts_col, value_col, "_x",
        F.lag("_x").over(wn).alias("_xp"),
        F.lag(value_col).over(wn).alias("_yp"),
        F.lead("_x").over(wn).alias("_xn"),
        F.lead(value_col).over(wn).alias("_yn"),
    )
    area2 = F.abs(
        (F.col("_xp") - F.col("_xn")) * (v - F.col("_yp"))
        - (F.col("_xp") - F.col("_x")) * (F.col("_yn") - F.col("_yp"))
    )
    d = d.withColumn("_a2", area2).withColumn(
        "_bucket", F.window(t, width)["start"])
    rk = F.row_number().over(
        Window.partitionBy(source_col, "_bucket")
        .orderBy(F.col("_a2").desc_nulls_last(), t.asc())
    )
    return (
        d.withColumn("_rk", rk)
        .where(F.col("_rk") == 1)
        .select(source_col, ts_col, value_col)
    )


# N(0,1) quantile breakpoints for SAX alphabets (Lin et al. 2003,
# table 3): alphabet a -> a-1 cut points splitting the standard normal
# into a equiprobable regions. Shortest-repr literals so a SQL replay
# with the same constants is bit-identical.
SAX_BREAKPOINTS = {
    2: [0.0],
    3: [-0.4307, 0.4307],
    4: [-0.6745, 0.0, 0.6745],
    5: [-0.8416, -0.2533, 0.2533, 0.8416],
    6: [-0.9674, -0.4307, 0.0, 0.4307, 0.9674],
    7: [-1.0676, -0.5659, -0.18, 0.18, 0.5659, 1.0676],
    8: [-1.1503, -0.6745, -0.3186, 0.0, 0.3186, 0.6745, 1.1503],
}


def sax_downsample(
    tier_df: DataFrame,
    segment_secs: int = 480,
    alphabet: int = 4,
    *,
    source_col: str = "source",
    ts_col: str = "bucket_ts",
    value_col: str = "mean",
) -> DataFrame:
    """SAX symbolic downsampling (Lin et al., "A Symbolic Representation
    of Time Series", DMKD 2003) over a tier's mean series: per source,
    z-normalize against the source's own mean/std, PAA-average each
    tumbling ``segment_secs`` segment, and map the normalized PAA value
    to a letter via the N(0,1) equiprobable breakpoints. The output
    word stream is the standard index for motif/discord mining and
    cheap shape search at corpus scale — the symbol table is thousands
    of times smaller than the tier it summarizes.

    Plan shape: one tiny per-source stats aggregate (broadcast back) +
    one (source, segment) groupBy — two shuffles total, both keyed on
    source so AQE can reuse the partitioning; no window, no UDF.

    Determinism at any parallelism (oracle-hash requirement): the
    per-source moments and the per-segment PAA sums are 1e-9-quantized
    DECIMAL(38,9) sums (order-independent), and every double-arithmetic
    step (mu, sigma, z) associates identically to the SQL replay.
    ``sigma = 0`` (constant source) maps z to 0.0 explicitly on both
    engines. Breakpoint comparison on the unrounded z is engine-stable
    because both engines compute the identical double.
    """
    if alphabet not in SAX_BREAKPOINTS:
        raise ValueError(f"alphabet must be in {sorted(SAX_BREAKPOINTS)}")
    bps = SAX_BREAKPOINTS[alphabet]
    v = F.col(value_col)
    q = F.round(v, 9).cast("decimal(38,9)")
    q2 = F.round(v * v, 9).cast("decimal(38,9)")
    stats = tier_df.groupBy(source_col).agg(
        F.sum(q).cast("double").alias("_s1"),
        F.sum(q2).cast("double").alias("_s2"),
        F.count(v).alias("_n"),
    ).select(
        source_col,
        (F.col("_s1") / F.col("_n")).alias("_mu"),
        F.sqrt(F.greatest(
            (F.col("_s2") - (F.col("_s1") / F.col("_n")) * F.col("_s1"))
            / F.col("_n"), F.lit(0.0))).alias("_sigma"),
    )
    # integer epoch modulo, NOT divide-then-cast: Spark's double->long
    # cast truncates but DuckDB's rounds, so a /-based replay would
    # disagree on segment boundaries
    _e = F.unix_timestamp(F.col(ts_col)).cast("long")
    seg_ts = F.timestamp_seconds(_e - (_e % segment_secs))
    paa = (
        tier_df.groupBy(source_col, seg_ts.alias("seg_ts"))
        .agg(F.sum(q).cast("double").alias("_ps"),
             F.count(v).alias("n_buckets"))
        .withColumn("paa", F.col("_ps") / F.col("n_buckets"))
    )
    j = paa.join(F.broadcast(stats), source_col)
    z = F.when(F.col("_sigma") == 0.0, F.lit(0.0)).otherwise(
        (F.col("paa") - F.col("_mu")) / F.col("_sigma"))
    sym = F.lit(chr(ord("a") + len(bps)))
    for i in range(len(bps) - 1, -1, -1):
        sym = F.when(z < F.lit(bps[i]), F.lit(chr(ord("a") + i))).otherwise(sym)
    return j.select(
        source_col, "seg_ts", "n_buckets",
        F.round("paa", 6).alias("paa"),
        F.round(z, 6).alias("z"),
        sym.alias("symbol"),
    )


def sax_words(
    sax: DataFrame,
    word_secs: int = 3840,
    *,
    source_col: str = "source",
) -> DataFrame:
    """Roll ``sax_downsample`` letters up into fixed-width WORDS — the
    unit a motif/discord index actually stores (one word per source per
    ``word_secs`` window, e.g. 8 letters x 480 s segments = one 64-min
    word). Letters concatenate in segment order via a sorted struct
    array, so the word is deterministic at any parallelism; one
    algebraic groupBy on (source, word window).
    """
    _e = F.unix_timestamp(F.col("seg_ts")).cast("long")
    word_ts = F.timestamp_seconds(_e - (_e % word_secs))
    return (
        sax.groupBy(source_col, word_ts.alias("word_ts"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("seg_ts").alias("t"),
                                 F.col("symbol").alias("s")))),
                    lambda x: x["s"],
                ), "",
            ).alias("word"),
            F.count("*").alias("n_segments"),
        )
    )


def sax_motifs(
    words: DataFrame,
    min_count: int = 2,
    *,
    source_col: str = "source",
) -> DataFrame:
    """Motif discovery over [[sax_words]] output (Lin et al. DMKD'03's
    motif application): per source, the SAX words that RECUR — a word
    appearing k times marks k windows whose normalized shape repeats,
    the cheap first pass before any expensive exact-distance motif
    verification. Emits occurrence counts, the first/last window, and
    a per-source rank by frequency.

    Plan shape: one (source, word) groupBy over the words relation +
    one source-partitioned rank window. Everything is integers,
    strings, and timestamp minima/maxima — nothing to quantize;
    ranking ties break by word ascending.
    """
    g = (
        words.groupBy(source_col, "word")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.min("word_ts").alias("first_ts"),
            F.max("word_ts").alias("last_ts"),
        )
        .where(F.col("n_occurrences") >= min_count)
    )
    rk = F.row_number().over(
        Window.partitionBy(source_col)
        .orderBy(F.col("n_occurrences").desc(), F.col("word").asc())
    )
    return g.withColumn("rank", rk)


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


def ks_timeline(
    df: DataFrame,
    tier: str = "1d",
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
    round_to: int | None = None,
) -> DataFrame:
    """KS drift TIMELINE: each tier bucket's value distribution scored
    against the source's previous OBSERVED bucket with the two-sample
    Kolmogorov-Smirnov statistic — the edge-free companion to
    [[psi_timeline]] exactly as [[ks_drift]] is to [[psi_drift]]: PSI's
    fixed edges give per-bin attribution but saturate on unseen mass;
    the KS series alarms on ANY shape change day over day. The first
    bucket per source emits NULL ks; ``prev_bucket_ts`` exposes ingest
    gaps (the pair is consecutive-OBSERVED, not calendar-adjacent).

    Plan shape: one (source, bucket, value) count shuffle; each
    bucket's counts then serve two roles — "cur" of its own pair and
    "ref" of the source's NEXT observed bucket (a broadcast of the
    tiny distinct-bucket lead map, then a 2x role union) — one
    (source, pair, value) re-aggregation, cumulative ECDF windows on
    that same partitioning, one final reduce. No per-pair data
    re-scan: raw rows are touched once.

    Determinism: identical integer device as ks_drift — ``D = max
    |rc*n_cur - cc*n_ref| / (n_ref*n_cur)`` with DECIMAL cross
    products — bit-stable at any parallelism and hash-equal to the SQL
    replay. Same ``round_to`` caveat for continuous floats.
    """
    trunc = TIER_INTERVALS[tier]
    v = F.col(value_col)
    if round_to is not None:
        v = F.round(v, round_to)
    per = (
        df.where(v.isNotNull())
        .groupBy(source_col,
                 F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts"),
                 v.alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        # lazy lineage cut: per feeds the bucket-lead map AND both
        # union roles — without it the raw scan + count re-runs three
        # times (6 FileScans measured; 2 after the cut)
        .localCheckpoint(eager=False)
    )
    wsrc = Window.partitionBy(source_col).orderBy("bucket_ts")
    nxt = (per.select(source_col, "bucket_ts").distinct()
           .withColumn("_next", F.lead("bucket_ts").over(wsrc)))
    cur = per.select(source_col, F.col("bucket_ts").alias("pair_ts"),
                     F.lit(None).cast("timestamp").alias("prev_bucket_ts"),
                     "v", F.lit(0).alias("cref"), F.col("c").alias("ccur"))
    ref = (per.join(F.broadcast(nxt), [source_col, "bucket_ts"])
           .where(F.col("_next").isNotNull())
           .select(source_col, F.col("_next").alias("pair_ts"),
                   F.col("bucket_ts").alias("prev_bucket_ts"),
                   "v", F.col("c").alias("cref"), F.lit(0).alias("ccur")))
    u = (cur.unionByName(ref)
         .groupBy(source_col, "pair_ts", "v")
         .agg(F.sum("cref").alias("cref"), F.sum("ccur").alias("ccur"),
              F.max("prev_bucket_ts").alias("prev_bucket_ts")))
    wp = Window.partitionBy(source_col, "pair_ts")
    wcum = wp.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    j = (u.withColumn("n_ref", F.sum("cref").over(wp))
         .withColumn("n_cur", F.sum("ccur").over(wp))
         .withColumn("rc", F.sum("cref").over(wcum))
         .withColumn("cc", F.sum("ccur").over(wcum)))
    dec = "decimal(20,0)"
    gap = F.abs(F.col("rc").cast(dec) * F.col("n_cur").cast(dec)
                - F.col("cc").cast(dec) * F.col("n_ref").cast(dec))
    return (
        j.groupBy(source_col, F.col("pair_ts").alias("bucket_ts"))
        .agg(F.max("prev_bucket_ts").alias("prev_bucket_ts"),
             F.min("n_ref").alias("n_prev"),
             F.min("n_cur").alias("n_cur"),
             F.max(gap).alias("_gap"))
        .select(
            source_col, "bucket_ts", "prev_bucket_ts", "n_prev", "n_cur",
            F.when(
                (F.col("n_prev") > 0) & (F.col("n_cur") > 0),
                F.round(F.col("_gap").cast("double")
                        / (F.col("n_prev").cast(dec)
                           * F.col("n_cur").cast(dec)).cast("double"), 6),
            ).alias("ks"),
        )
    )


def weekday_profile(
    df: DataFrame,
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hour-of-week seasonal fingerprint per source: mean and count of
    every (day-of-week, hour-of-day) cell — the 168-slot profile a
    capacity planner reads and the seasonal detectors consume as a
    baseline ([[seasonal_ad]] fits a phase profile internally; this
    exposes the same shape as a QUERYABLE table, joinable back onto
    live traffic as "expected value for this slot"). Calendar slots
    come from the session-timezone calendar (UTC by the engine's
    contract).

    Plan shape: ONE groupBy on (source, dow, hour) — bounded keys
    (168 x sources), map-side combined; the cheapest possible full-scan
    aggregation shape.

    Determinism: DECIMAL(38,9) value sums with one IEEE division —
    hash-equal to the SQL replay at any parallelism.
    """
    v = F.col(value_col)
    t = F.col(ts_col).cast("timestamp")
    return (
        df.where(v.isNotNull())
        .groupBy(source_col,
                 F.dayofweek(t).alias("dow"),
                 F.hour(t).alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(v.cast("decimal(38,9)")).cast("double").alias("_s"))
        .select(source_col, "dow", "hour", "n",
                F.round(F.col("_s") / F.col("n").cast("double"), 6)
                .alias("mean_value"))
    )
