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
) -> DataFrame:
    """Deduplicate timestamps per source, keeping the first occurrence.

    Parity: validate_series (_data.py:55-78). "First" follows
    ``order_col`` (e.g. an ingest sequence/event id) when given,
    otherwise the winner among duplicates is arbitrary-but-deterministic.
    Sorting is not materialized — every downstream window op orders by ts
    itself; freq/gap handling is explicit via plans.gapfill.time_spine.
    """
    order = [F.col(order_col)] if order_col else [F.lit(1)]
    w = Window.partitionBy(source_col, ts_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


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
    out_cols = []
    for f in df.schema.fields:
        if f.name not in cols:
            out_cols.append(F.col(f.name))
            continue
        for v in values[f.name]:
            out_cols.append(
                (F.col(f.name) == F.lit(v)).cast("int").alias(f"{f.name}_{v}")
            )
    return df.select(*out_cols)


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
