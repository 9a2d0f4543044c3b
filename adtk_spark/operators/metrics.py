"""Detection quality metrics over labels and event lists.

Parity: /root/reference/src/adtk/metrics/_metrics.py (recall :48-192,
precision :231-301, f1 :348-441, iou :478-589). Label metrics are one
aggregation over a (y_true, y_pred) column pair; event metrics compose
the interval algebra (events_and / events_or) with an overlap join.
Results come back per source as a small DataFrame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .events import events_and, events_or, validate_events, _micros


def _bin(c: Column) -> Column:
    # pandas .clip(0, 1).round() with NaN passing through. NOT
    # greatest/least: those *skip* NULLs (returning the other operand),
    # which would silently turn NULL labels into 0.
    return F.round(F.when(c < 0, 0.0).when(c > 1, 1.0).otherwise(c))


def recall_labels(
    df: DataFrame,
    *,
    source_col: str = "source",
    true_col: str = "y_true",
    pred_col: str = "y_pred",
    out_col: str = "recall",
) -> DataFrame:
    """recall on label series (_metrics.py:125-135): sum(t*p)/sum(t),
    NULL when no true positives exist (sums skip NULLs as pandas does)."""
    t, p = _bin(F.col(true_col)), _bin(F.col(pred_col))
    return df.groupBy(source_col).agg(
        F.when(F.sum(t) != 0, F.sum(t * p) / F.sum(t)).alias(out_col)
    )


def precision_labels(df: DataFrame, **kw) -> DataFrame:
    """precision = recall with roles swapped (_metrics.py:301)."""
    kw.setdefault("out_col", "precision")
    return recall_labels(
        df,
        source_col=kw.get("source_col", "source"),
        true_col=kw.get("pred_col", "y_pred"),
        pred_col=kw.get("true_col", "y_true"),
        out_col=kw["out_col"],
    )


def f1_labels(df: DataFrame, *, source_col: str = "source",
              true_col: str = "y_true", pred_col: str = "y_pred") -> DataFrame:
    r = recall_labels(df, source_col=source_col, true_col=true_col, pred_col=pred_col)
    p = precision_labels(df, source_col=source_col, true_col=true_col, pred_col=pred_col)
    j = r.join(p, on=source_col)
    f1 = F.when(
        (F.col("recall") + F.col("precision")) != 0,
        2 * F.col("recall") * F.col("precision") / (F.col("recall") + F.col("precision")),
    )
    return j.select(source_col, f1.alias("f1"))


def iou_labels(df: DataFrame, *, source_col: str = "source",
               true_col: str = "y_true", pred_col: str = "y_pred",
               out_col: str = "iou") -> DataFrame:
    """iou on labels (_metrics.py:543-558): sum(t*p)/sum(clip(t+p))."""
    t, p = _bin(F.col(true_col)), _bin(F.col(pred_col))
    # NOT F.least(t+p, 1): least() skips NULLs, but a NULL pair must be
    # excluded from the union count (pandas sums skip NaN)
    union = ((t + p) >= 1).cast("double")
    return df.groupBy(source_col).agg(
        F.when(F.sum(union) != 0, F.sum(t * p) / F.sum(union)).alias(out_col)
    )


# ---------------------------------------------------------------------------
# event-list metrics
# ---------------------------------------------------------------------------

def recall_events(
    y_true: DataFrame,
    y_pred: DataFrame,
    thresh: float = 0.5,
    *,
    source_col: str = "source",
    out_col: str = "recall",
) -> DataFrame:
    """recall on event lists (_metrics.py:142-182): a true event is a hit
    when >= thresh of its span is covered by AND(true, pred); zero-length
    (instantaneous) events need containment.
    """
    # Validate each list ONCE and cut the true side's lineage with a
    # lazy localCheckpoint: t feeds BOTH the probe side and the
    # intersection's build side, and events_and would otherwise rebuild
    # the whole upstream (e.g. a to_events gaps-and-islands chain) per
    # use — the r04 plan census read 10 Exchanges here for that reason.
    t = validate_events(y_true, source_col=source_col) \
        .localCheckpoint(eager=False)
    p = validate_events(y_pred, source_col=source_col)
    # rename the intersection side before joining: inter derives from t,
    # so alias-based disambiguation of a self-join lineage is unreliable
    inter = events_and([t, p], source_col=source_col,
                       validate=False).select(
        F.col(source_col).alias("_isrc"),
        _micros(F.col("start_ts")).alias("_is"),
        _micros(F.col("end_ts")).alias("_ie"),
    ).localCheckpoint(eager=False)  # tiny per-source list, broadcast below;
    # pinned so broadcast retries / AQE replans never re-run the sweep
    ts, te = _micros(F.col("start_ts")), _micros(F.col("end_ts"))
    cond = (
        (F.col(source_col) == F.col("_isrc"))
        & (ts <= F.col("_ie")) & (F.col("_is") <= te)
    )
    joined = t.join(F.broadcast(inter), on=cond, how="left")
    # guard the unmatched-row case explicitly: least/greatest skip NULLs,
    # which would otherwise turn "no intersection" into "full overlap"
    overlap = F.when(
        F.col("_is").isNull(), F.lit(None).cast("long")
    ).otherwise(
        F.greatest(F.lit(0).cast("long"),
                   F.least(te, F.col("_ie")) - F.greatest(ts, F.col("_is")))
    )
    length = te - ts
    contained = (F.col("_is") <= ts) & (F.col("_ie") >= te)
    per_event = joined.groupBy(
        F.col(source_col), F.col("start_ts"), F.col("end_ts")
    ).agg(
        F.first(length).alias("_len"),
        F.sum(overlap).alias("_ov"),
        F.max(F.coalesce(contained, F.lit(False))).alias("_contained"),
    )
    hit = F.when(
        F.col("_len") > 0, F.coalesce(F.col("_ov"), F.lit(0)) >= thresh * F.col("_len")
    ).otherwise(F.col("_contained"))
    return per_event.groupBy(source_col).agg(
        (F.sum(hit.cast("int")) / F.count("*")).alias(out_col)
    )


def precision_events(y_true, y_pred, thresh: float = 0.5, *,
                     source_col: str = "source", out_col: str = "precision"):
    return recall_events(y_pred, y_true, thresh, source_col=source_col, out_col=out_col)


def f1_events(y_true, y_pred, recall_thresh=0.5, precision_thresh=0.5, *,
              source_col: str = "source"):
    r = recall_events(y_true, y_pred, recall_thresh, source_col=source_col)
    p = precision_events(y_true, y_pred, precision_thresh, source_col=source_col)
    j = r.join(p, on=source_col, how="outer")
    f1 = F.when(
        (F.col("recall") + F.col("precision")) != 0,
        2 * F.col("recall") * F.col("precision") / (F.col("recall") + F.col("precision")),
    )
    return j.select(source_col, f1.alias("f1"))


def iou_events(y_true, y_pred, *, source_col: str = "source", out_col: str = "iou"):
    """iou on event lists (_metrics.py:563-582): duration(AND)/duration(OR);
    instantaneous segments contribute zero length. Each input is
    validated once and checkpointed — AND and OR both consume the same
    merged lists without rebuilding their upstream lineage."""
    t = validate_events(y_true, source_col=source_col) \
        .localCheckpoint(eager=False)
    p = validate_events(y_pred, source_col=source_col) \
        .localCheckpoint(eager=False)
    inter = events_and([t, p], source_col=source_col, validate=False)
    union = events_or([t, p], source_col=source_col)

    def total(d, name):
        return d.groupBy(source_col).agg(
            F.sum(_micros(F.col("end_ts")) - _micros(F.col("start_ts"))).alias(name)
        )

    j = total(union, "_u").join(total(inter, "_i"), on=source_col, how="left")
    return j.select(
        source_col,
        F.when(F.col("_u") != 0, F.coalesce(F.col("_i"), F.lit(0)) / F.col("_u")).alias(out_col),
    )
