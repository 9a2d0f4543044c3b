"""Series validation and chronological train/test splitting.

Parity: /root/reference/src/adtk/data/_data.py:10-95 (validate_series)
and :618-782 (split_train_test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def validate_series(
    df: DataFrame,
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    order_col: str | None = None,
    check_freq: bool = False,
) -> DataFrame:
    """Deduplicate timestamps per source, keeping the first occurrence.

    Parity: validate_series (_data.py:55-78). "First" follows
    ``order_col`` (e.g. an ingest sequence/event id) when given,
    otherwise the winner among duplicates is arbitrary-but-deterministic.
    Sorting is not materialized — every downstream window op orders by ts
    itself.

    ``check_freq=True`` mirrors the reference's freq handling
    (_data.py:75-78 + tests/test_data_validation.py): pandas only infers
    a freq when the index is already perfectly regular (inferred_freq is
    None as soon as a gap exists — the reference's missed-timestamp test
    expects gaps to SURVIVE validation), so asfreq never adds rows and
    the regular grid passes through unchanged. Here it is therefore a
    semantic no-op on the rows; use ``infer_freq`` / ``regularize`` for
    the scale-relevant modal-frequency gap insertion.
    """
    order = [F.col(order_col)] if order_col else [F.lit(1)]
    w = Window.partitionBy(source_col, ts_col).orderBy(*order)
    out = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    if check_freq:
        out = regularize(out, source_col=source_col, ts_col=ts_col,
                         freq_mode="strict")
    return out


def infer_freq(
    df: DataFrame,
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    freq_mode: str = "strict",
) -> DataFrame:
    """Per-source time-step inference -> (source, freq_micros).

    ``freq_mode='strict'``: pandas ``DatetimeIndex.inferred_freq``
    parity — a freq exists only when EVERY consecutive delta is equal
    (NULL otherwise). ``freq_mode='mode'``: the most common delta
    (ties -> smallest), which is what a production pipeline wants when
    a mostly-regular feed drops points.

    One window pass for deltas + one aggregation — no data movement
    beyond a (source, delta) shuffle of distinct-delta counts.
    """
    w = Window.partitionBy(source_col).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    deltas = (
        df.select(F.col(source_col), (us - F.lag(us).over(w)).alias("_d"))
        .where(F.col("_d").isNotNull())
    )
    counts = deltas.groupBy(source_col, "_d").agg(F.count("*").alias("_n"))
    if freq_mode == "strict":
        return counts.groupBy(source_col).agg(
            F.when(F.count("*") == 1, F.min("_d")).alias("freq_micros")
        )
    if freq_mode == "mode":
        r = Window.partitionBy(source_col).orderBy(F.desc("_n"), F.asc("_d"))
        return (
            counts.withColumn("_r", F.row_number().over(r))
            .where(F.col("_r") == 1)
            .select(source_col, F.col("_d").alias("freq_micros"))
        )
    raise ValueError(f"unknown freq_mode: {freq_mode!r}")


def regularize(
    df: DataFrame,
    freqs: DataFrame | None = None,
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    freq_mode: str = "mode",
) -> DataFrame:
    """Reindex each source onto its inferred regular grid — pandas
    ``asfreq(inferred_freq)`` semantics: grid points missing from the
    data appear as all-NULL rows, and points OFF the grid are dropped.
    Sources with no inferable freq pass through unchanged.

    The spine is generated per source from (min_ts, max_ts, freq) — an
    explode of a sequence, no driver-side loop — then left-joined; the
    join keys are (source, grid_ts), so the shuffle carries the series
    exactly once.
    """
    if freqs is None:
        freqs = infer_freq(df, source_col=source_col, ts_col=ts_col,
                           freq_mode=freq_mode)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bounds = df.groupBy(source_col).agg(
        F.min(us).alias("_mn"), F.max(us).alias("_mx"))
    bounds = bounds.join(F.broadcast(freqs), source_col, "left")
    spine = (
        bounds.where(F.col("freq_micros").isNotNull())
        .select(
            F.col(source_col),
            F.explode(F.sequence("_mn", "_mx", "freq_micros")).alias("_us"),
        )
        .select(F.col(source_col), F.timestamp_micros(F.col("_us")).alias("_grid_ts"))
    )
    ts_type = dict(df.dtypes)[ts_col]
    sp = spine.select(
        F.col(source_col).alias("_sp_src"),
        F.col("_grid_ts").cast(ts_type).alias("_sp_ts"),
    )
    dd = df.withColumnRenamed(source_col, "_d_src").withColumnRenamed(ts_col, "_d_ts")
    on_grid = sp.join(
        dd,
        on=[F.col("_sp_src") == F.col("_d_src"), F.col("_sp_ts") == F.col("_d_ts")],
        how="left",
    ).select(
        F.col("_sp_src").alias(source_col), F.col("_sp_ts").alias(ts_col),
        *[c for c in df.columns if c not in (source_col, ts_col)],
    )
    # pass-through = every row whose source has NO inferable freq: a
    # NULL freq row OR no freqs row at all (a source with a single
    # point produces no delta, so infer_freq emits nothing for it — a
    # leftsemi against the NULL rows alone would silently DROP it)
    no_freq = df.join(
        F.broadcast(
            freqs.where(F.col("freq_micros").isNotNull()).select(source_col)
        ),
        source_col, "left_anti",
    )
    return on_grid.unionByName(no_freq)


def one_hot(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    source_col: str = "source",
) -> DataFrame:
    """validate_series(check_categorical=True) parity (_data.py:80-93):
    pd.get_dummies — string columns become `{col}_{value}` 0/1 indicator
    columns, ordered by value; non-string columns pass through. The
    series key (``source_col``) is structural, never encoded.

    Fit-as-action: the distinct value sets (small) are collected once,
    the encoding itself is a pure projection — no shuffle of the series.
    """
    if cols is None:
        cols = [f.name for f in df.schema.fields
                if f.dataType.simpleString() == "string"
                and f.name != source_col]
    values = {}
    if cols:
        rows = (
            df.select(*[F.collect_set(c).alias(c) for c in cols]).collect()[0]
        )
        values = {c: sorted(v for v in rows[c] if v is not None) for c in cols}
    # pd.get_dummies ordering: passthrough columns first, indicator
    # columns appended after, per encoded column in value order; a NULL
    # category yields ALL-ZERO indicators (not NULLs)
    passthrough = [F.col(f.name) for f in df.schema.fields if f.name not in cols]
    dummies = [
        F.coalesce((F.col(c) == F.lit(v)).cast("int"), F.lit(0)).alias(f"{c}_{v}")
        for c in cols
        for v in values[c]
    ]
    return df.select(*passthrough, *dummies)


def split_train_test(
    df: DataFrame,
    mode: int = 1,
    n_splits: int = 1,
    train_ratio: float = 0.7,
    *,
    source_col: str = "source",
    ts_col: str = "ts",
) -> list[tuple[DataFrame, DataFrame]]:
    """split_train_test (_data.py:618-782): 4 chronological fold modes.

    Positions are per-source row numbers (the reference's iloc); each
    fold is a lazily-filtered view of the input — no materialization.
    """
    w = Window.partitionBy(source_col).orderBy(ts_col)
    wn = Window.partitionBy(source_col)
    base = df.withColumn("_pos", F.row_number().over(w) - 1).withColumn(
        "_n", F.count(F.lit(1)).over(wn)
    )
    n = F.col("_n")
    pos = F.col("_pos")
    # Python round() is half-to-even; F.rint matches that (F.round is half-up)
    splits: list[tuple[DataFrame, DataFrame]] = []
    clean = lambda d: d.drop("_pos", "_n")

    if mode == 1:
        fold_len = F.rint(n / n_splits).cast("long")
        for k in range(n_splits - 1):
            fp = fold_len * k
            tr_end = fp + F.rint(fold_len * train_ratio).cast("long")
            splits.append((
                clean(base.where((pos >= fp) & (pos < tr_end))),
                clean(base.where((pos >= tr_end) & (pos < fp + fold_len))),
            ))
        fp = fold_len * (n_splits - 1)
        tr_end = fp + F.rint((n - fp) * train_ratio).cast("long")
        splits.append((
            clean(base.where((pos >= fp) & (pos < tr_end))),
            clean(base.where(pos >= tr_end)),
        ))
    elif mode == 2:
        for k in range(n_splits - 1):
            fold_len = F.rint(n / n_splits).cast("long") * (k + 1)
            tr_end = F.rint(fold_len * train_ratio).cast("long")
            splits.append((
                clean(base.where(pos < tr_end)),
                clean(base.where((pos >= tr_end) & (pos < fold_len))),
            ))
        tr_end = F.rint(n * train_ratio).cast("long")
        splits.append((
            clean(base.where(pos < tr_end)),
            clean(base.where(pos >= tr_end)),
        ))
    elif mode == 3:
        fold_len = F.rint(n / (n_splits + 1)).cast("long")
        for k in range(n_splits - 1):
            splits.append((
                clean(base.where(pos < fold_len * (k + 1))),
                clean(base.where((pos >= fold_len * (k + 1)) & (pos < fold_len * (k + 2)))),
            ))
        splits.append((
            clean(base.where(pos < fold_len * n_splits)),
            clean(base.where(pos >= fold_len * n_splits)),
        ))
    elif mode == 4:
        fold_len = F.rint(n / (n_splits + 1)).cast("long")
        for k in range(n_splits):
            splits.append((
                clean(base.where(pos < fold_len * (k + 1))),
                clean(base.where(pos >= fold_len * (k + 1))),
            ))
    else:
        raise ValueError("mode must be one of 1, 2, 3, 4")
    return splits
