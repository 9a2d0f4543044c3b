"""Label aggregation (AND/OR over parallel binary label columns).

Parity: OrAggregator / AndAggregator on label frames
(/root/reference/src/adtk/aggregator/_aggregator.py:123-126, 209-212).
adtk's tri-state truth tables are exactly SQL three-valued logic:

  OR : TRUE|NULL = TRUE,  FALSE|NULL = NULL   (NaN only when not-any-true)
  AND: FALSE&NULL = FALSE, TRUE&NULL = NULL   (NaN only when all-true-so-far)

so both reduce to folds of native boolean operators over ``col == 1``.
Event-list AND/OR live in events.py (events_and / events_or).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fold(cols: list[str], op) -> Column:
    expr = None
    for c in cols:
        term = F.col(c) == 1
        expr = term if expr is None else op(expr, term)
    return expr.cast("double")


def or_labels(df: DataFrame, cols: list[str], out_col: str = "label") -> DataFrame:
    return df.withColumn(out_col, _fold(cols, lambda a, b: a | b))


def and_labels(df: DataFrame, cols: list[str], out_col: str = "label") -> DataFrame:
    return df.withColumn(out_col, _fold(cols, lambda a, b: a & b))
