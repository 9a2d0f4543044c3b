"""Time-series joins Spark lacks natively: as-of alignment and
point-in-interval (range) matching.

The reference aligns series by pandas index (`pd.concat(..., axis=1)`,
src/adtk/_base.py:137) — only meaningful when both series share one
DatetimeIndex. At engine scale two feeds rarely share timestamps, so
the canonical alignment is the AS-OF join: each left row picks the most
recent right row at-or-before its timestamp (kdb's `aj`, DuckDB's
``ASOF JOIN``, pandas ``merge_asof``).

Spark has no native as-of join. A naive theta join
(``l.ts >= r.ts`` + row_number) explodes to O(|L| x |R|) per source
before pruning. This implementation is the union + running-last trick:

    union(left-tagged, right-tagged)
    -> ONE window pass per source ordered by (ts, right-first)
    -> last(right_col, ignorenulls) carries the newest right values
    -> keep the left rows

One shuffle on the source key, linear work, no join node at all —
the same plan shape as a rolling aggregate, so it scales like one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: str = "source",
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket: str = "hour",
    how: str = "inner",
) -> DataFrame:
    """Range join: each point row joins every interval containing its
    timestamp (``start <= ts <= end``) within the ``on`` key.

    A raw BETWEEN predicate gives Spark a theta join — broadcast
    nested-loop or cartesian, O(|P| x |I|) per source. This is the
    standard bucketized range join instead: every interval explodes to
    the coarse time buckets it spans, points carry their single bucket,
    and the match becomes an EQUI-join on (key, bucket) + a residual
    BETWEEN filter. Each point matches a given interval at most once
    (only in the point's own bucket), so no dedup pass is needed.

    ``bucket`` sets the granularity (a `date_trunc` unit): choose it
    near the typical interval length — too coarse inflates candidate
    pairs, too fine explodes long intervals into many rows. An interval
    spanning k buckets emits k rows; pathological month-long intervals
    at 'minute' granularity are the skew case to avoid.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    step = {"minute": 60, "hour": 3600, "day": 86400}[bucket]
    b_start = F.unix_timestamp(F.date_trunc(bucket, F.col(start_col)))
    b_end = F.unix_timestamp(F.date_trunc(bucket, F.col(end_col)))
    iv = intervals.select(
        F.col(on), F.col(start_col), F.col(end_col),
        F.explode(F.sequence(b_start, b_end, F.lit(step))).alias("_b"),
    )
    # row id so the left-outer path can find unmatched points without
    # comparing data columns (plain column equality is not NULL-safe —
    # a matched point with a NULL column would also count as unmatched)
    pt = points.withColumn("_pid", F.monotonically_increasing_id()).withColumn(
        "_b", F.unix_timestamp(F.date_trunc(bucket, F.col(ts_col))))
    if how == "left":
        # monotonically_increasing_id is only stable within ONE
        # evaluation of one physical layout; the left path evaluates
        # `pt` twice (hits + anti-join), and an AQE re-plan or task
        # retry between the two would renumber rows — silently dropping
        # or duplicating points. Pin the ids by materializing the
        # partitions once before branching.
        pt = pt.localCheckpoint(eager=False)
    hits = (
        pt.join(iv, on=[on, "_b"], how="inner")
        .where((F.col(ts_col) >= F.col(start_col))
               & (F.col(ts_col) <= F.col(end_col)))
        .drop("_b")
    )
    if how == "inner":
        return hits.drop("_pid")
    # left: points with no containing interval appear once with NULLs
    unmatched = (
        pt.drop("_b")
        .join(hits.select("_pid"), on="_pid", how="left_anti")
        .select(
            "*",
            F.lit(None).cast(dict(intervals.dtypes)[start_col]).alias(start_col),
            F.lit(None).cast(dict(intervals.dtypes)[end_col]).alias(end_col),
        )
    )
    return hits.unionByName(unmatched).drop("_pid")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "source",
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_secs: float | None = None,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``ts <= left.ts`` per ``on`` key (``direction='backward'``; ties on
    equal timestamps match, like ``merge_asof(allow_exact_matches=True)``).
    ``direction='forward'`` attaches the smallest ``ts >= left.ts``.

    ``right_cols``: right columns to carry (default: all but key/ts).
    ``tolerance_secs``: NULL the carried value columns when the matched
    right row is further than this from the left timestamp; the matched
    right timestamp ``{ts_col}{suffix}`` STAYS populated, so "a match
    existed but was out of tolerance" remains distinguishable from
    "no match at all" (pandas ``merge_asof`` collapses the two).
    The matched right timestamp is always emitted as ``{ts_col}{suffix}``.

    NULL semantics: ALL carried columns come from the single matched
    right row, as one ``last(struct, ignorenulls)`` — a struct is
    non-NULL even when every field is NULL, so a legitimate NULL in the
    matched row is preserved (and columns can never tear across
    different right rows, which per-column ``last(..., ignorenulls)``
    would do).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, ts_col)]
    clash = [c for c in right_cols if c in left.columns]
    out_names = {c: (c + suffix if c in clash else c) for c in right_cols}
    rtypes = dict(right.dtypes)
    # one match-struct per right row: its fields are the carried values
    # plus the right timestamp; left placeholder rows carry a NULL struct
    m_ddl = "struct<" + ",".join(
        ["_mts:" + rtypes[ts_col]]
        + [f"{out_names[c]}:{rtypes[c]}" for c in right_cols]) + ">"

    l_tag = left.select(
        "*", F.lit(0).alias("_r"), F.lit(None).cast(m_ddl).alias("_m"))
    r_tag = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(1).alias("_r"),
        F.struct(
            F.col(ts_col).alias("_mts"),
            *[F.col(c).alias(out_names[c]) for c in right_cols],
        ).cast(m_ddl).alias("_m"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes
          if c not in (on, ts_col)],
    ).select(*l_tag.columns)  # align column order for the union

    # right rows sort BEFORE left rows at equal ts (backward: an exact
    # match is visible); forward reverses the scan direction
    asc = direction == "backward"
    order = [F.col(ts_col).asc() if asc else F.col(ts_col).desc(),
             F.col("_r").desc()]
    w = (Window.partitionBy(on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, 0))
    u = l_tag.unionByName(r_tag)
    out = (
        u.select(
            *[c for c in left.columns], "_r",
            F.last("_m", ignorenulls=True).over(w).alias("_m"),
        )
        .where(F.col("_r") == 0)
        .select(
            *[c for c in left.columns],
            *[F.col("_m")[out_names[c]].alias(out_names[c])
              for c in right_cols],
            F.col("_m")["_mts"].alias(ts_col + suffix),
        )
    )

    if tolerance_secs is not None:
        lt = F.unix_micros(F.col(ts_col).cast("timestamp"))
        rt = F.unix_micros(F.col(ts_col + suffix).cast("timestamp"))
        gap = F.abs(lt - rt) / 1e6
        keep = gap <= F.lit(float(tolerance_secs))
        out = out.select(
            *[c for c in left.columns],
            *[F.when(keep, F.col(out_names[c])).alias(out_names[c])
              for c in right_cols],
            F.col(ts_col + suffix),
        )
    return out
