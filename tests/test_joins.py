"""As-of join: pandas merge_asof parity + plan shape."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from adtk_spark.operators.joins import asof_join


def frames(spark, seed=3):
    import numpy as np

    rng = np.random.RandomState(seed)
    t0 = dt.datetime(2021, 1, 1)
    lrows, rrows = [], []
    for src in ("a", "b", "c"):
        for _ in range(40):
            lrows.append((src, t0 + dt.timedelta(seconds=int(rng.randint(0, 3600))),
                          float(rng.randint(0, 100))))
        for _ in range(15):
            rrows.append((src, t0 + dt.timedelta(seconds=int(rng.randint(0, 3600))),
                          float(rng.randint(0, 100))))
    # dedupe ts per source (merge_asof needs unique, sorted keys)
    lrows = list({(s, t): (s, t, v) for s, t, v in lrows}.values())
    rrows = list({(s, t): (s, t, v) for s, t, v in rrows}.values())
    left = spark.createDataFrame(lrows, "source string, ts timestamp, value double")
    right = spark.createDataFrame(rrows, "source string, ts timestamp, ref double")
    return left, right, lrows, rrows


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_merge_asof(spark, direction):
    left, right, lrows, rrows = frames(spark)
    lp = pd.DataFrame(lrows, columns=["source", "ts", "value"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["source", "ts", "ref"]).sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="source", direction=direction)
    want = {(r.source, r.ts): None if pd.isna(r.ref) else r.ref
            for r in exp.itertuples()}
    got = {(r["source"], r["ts"]): r["ref"]
           for r in asof_join(left, right, direction=direction).collect()}
    assert got == want


def test_asof_join_tolerance_and_plan(spark):
    left, right, lrows, rrows = frames(spark, seed=4)
    lp = pd.DataFrame(lrows, columns=["source", "ts", "value"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["source", "ts", "ref"]).sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="source",
                        tolerance=pd.Timedelta(seconds=120))
    want = {(r.source, r.ts): None if pd.isna(r.ref) else r.ref
            for r in exp.itertuples()}
    out = asof_join(left, right, tolerance_secs=120)
    got = {(r["source"], r["ts"]): r["ref"] for r in out.collect()}
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE prints both plans
    import re
    # one shuffle pass per input row: either a single Exchange above the
    # Union, or (AQE) one pushed into each union branch — never more,
    # and never a join node (the naive theta-join implementation would
    # show SortMergeJoin + O(|L| x |R|) expansion)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2
    assert plan.count("Window") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_interval_join_brute_force_parity(spark):
    """Bucketized range join vs the O(P x I) brute-force answer on
    random data: identical pair sets for inner and left modes,
    including intervals spanning many buckets, nested overlaps, and
    unmatched points."""
    import numpy as np

    from adtk_spark.operators.joins import interval_join

    rng = np.random.RandomState(11)
    t0 = dt.datetime(2022, 1, 1)
    prows = [("s%d" % (i % 3), t0 + dt.timedelta(seconds=int(rng.randint(0, 40000))),
              float(i)) for i in range(120)]
    irows = [("s%d" % (i % 3),
              t0 + dt.timedelta(seconds=int(a := rng.randint(0, 35000))),
              t0 + dt.timedelta(seconds=int(a + rng.randint(60, 12000))))
             for i in range(25)]
    pts = spark.createDataFrame(prows, "source string, ts timestamp, value double")
    ivs = spark.createDataFrame(irows, "source string, start_ts timestamp, end_ts timestamp")

    want = {(s, t, a, b) for s, t, _ in prows for s2, a, b in irows
            if s == s2 and a <= t <= b}
    got = {(r["source"], r["ts"], r["start_ts"], r["end_ts"])
           for r in interval_join(pts, ivs).collect()}
    assert got == want

    left = interval_join(pts, ivs, how="left").collect()
    matched_pts = {(s, t) for s, t, _, _ in want}
    got_nulls = {(r["source"], r["ts"]) for r in left if r["start_ts"] is None}
    assert got_nulls == {(s, t) for s, t, _ in prows} - matched_pts
    assert len(left) == len(want) + len(got_nulls)


def test_interval_join_left_with_null_columns(spark):
    """A matched point carrying a NULL data column must appear exactly
    once in how='left' output (regression: non-null-safe anti-join
    double-counted it as both matched and unmatched)."""
    from adtk_spark.operators.joins import interval_join

    pts = spark.createDataFrame(
        [("a", dt.datetime(2022, 1, 1, 0, 30), None),
         ("a", dt.datetime(2022, 1, 1, 5, 0), None)],
        "source string, ts timestamp, value double")
    ivs = spark.createDataFrame(
        [("a", dt.datetime(2022, 1, 1, 0, 0), dt.datetime(2022, 1, 1, 1, 0))],
        "source string, start_ts timestamp, end_ts timestamp")
    out = interval_join(pts, ivs, how="left").collect()
    assert len(out) == 2
    by_ts = {r["ts"]: r for r in out}
    assert by_ts[dt.datetime(2022, 1, 1, 0, 30)]["start_ts"] is not None
    assert by_ts[dt.datetime(2022, 1, 1, 5, 0)]["start_ts"] is None


def test_interval_join_plan_is_equi_join(spark):
    from adtk_spark.operators.joins import interval_join

    pts = spark.createDataFrame([("a", dt.datetime(2020, 1, 1), 1.0)],
                                "source string, ts timestamp, value double")
    ivs = spark.createDataFrame(
        [("a", dt.datetime(2020, 1, 1), dt.datetime(2020, 1, 2))],
        "source string, start_ts timestamp, end_ts timestamp")
    plan = interval_join(pts, ivs)._jdf.queryExecution() \
        .executedPlan().toString().split("== Initial")[0]
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


# ---------------------------------------------------------------------------
# property-based merge_asof parity (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_ts_set = st.sets(st.integers(min_value=0, max_value=120), min_size=1, max_size=10)
_vals = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))


@settings(max_examples=12, deadline=None)
@given(
    lts=_ts_set,
    rts=_ts_set,
    rvals=st.lists(_vals, min_size=10, max_size=10),
    direction=st.sampled_from(["backward", "forward"]),
    tol=st.sampled_from([None, 30]),
)
def test_asof_join_property_matches_pandas(spark, lts, rts, rvals, direction, tol):
    """Random left/right series (incl. NULL right values, equal-ts
    matches, out-of-tolerance rows): carried value must equal pandas
    merge_asof row-for-row. Guards the matched-row-NULL semantics — a
    per-column last(ignorenulls) would skip legitimate NULLs and tear
    rows, which this generator hits quickly."""
    t0 = dt.datetime(2022, 1, 1)
    lrows = [("s", t0 + dt.timedelta(seconds=t)) for t in sorted(lts)]
    rrows = [("s", t0 + dt.timedelta(seconds=t),
              None if rvals[i % len(rvals)] is None else float(rvals[i % len(rvals)]))
             for i, t in enumerate(sorted(rts))]
    left = spark.createDataFrame(lrows, "source string, ts timestamp")
    right = spark.createDataFrame(rrows, "source string, ts timestamp, ref double")

    out = asof_join(left, right, direction=direction, tolerance_secs=tol)
    got = {r["ts"]: r["ref"] for r in out.collect()}

    lp = pd.DataFrame(lrows, columns=["source", "ts"])
    rp = pd.DataFrame(rrows, columns=["source", "ts", "ref"])
    exp_df = pd.merge_asof(
        lp.sort_values("ts"), rp.sort_values("ts"), on="ts",
        direction=direction,
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    exp = {r.ts.to_pydatetime(): (None if pd.isna(r.ref) else r.ref)
           for r in exp_df.itertuples()}

    assert set(got) == set(exp)
    for ts in exp:
        assert got[ts] == exp[ts], (ts, got[ts], exp[ts], direction, tol)


_iv_strat = st.lists(
    st.tuples(st.integers(min_value=0, max_value=200),
              st.integers(min_value=0, max_value=120)),
    min_size=0, max_size=6)


@settings(max_examples=10, deadline=None)
@given(
    pts=st.sets(st.integers(min_value=0, max_value=260), min_size=1, max_size=12),
    ivs=_iv_strat,
    how=st.sampled_from(["inner", "left"]),
    bucket=st.sampled_from(["minute", "hour"]),
)
def test_interval_join_property_matches_naive(spark, pts, ivs, how, bucket):
    """Random points and (possibly overlapping / zero-length /
    bucket-straddling) intervals: the bucketized equi-join + residual
    filter must produce exactly the naive BETWEEN semantics, for inner
    and left, at two bucket granularities."""
    from adtk_spark.operators.joins import interval_join

    t0 = dt.datetime(2023, 1, 1)
    prow = [("s", t0 + dt.timedelta(minutes=p)) for p in sorted(pts)]
    irow = [("s", t0 + dt.timedelta(minutes=a),
             t0 + dt.timedelta(minutes=a + d)) for a, d in ivs]
    points = spark.createDataFrame(prow, "source string, ts timestamp")
    intervals = spark.createDataFrame(
        irow, "source string, start_ts timestamp, end_ts timestamp")

    out = interval_join(points, intervals, how=how, bucket=bucket)
    got = sorted((r["ts"], r["start_ts"], r["end_ts"]) for r in out.collect())

    naive = []
    for _, ts in prow:
        hits = [(s, e) for _, s, e in irow if s <= ts <= e]
        if hits:
            naive.extend((ts, s, e) for s, e in hits)
        elif how == "left":
            naive.append((ts, None, None))
    assert got == sorted(naive), (got, naive, how, bucket)
