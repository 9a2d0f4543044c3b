"""Remaining transformer goldens: StandardScale, ClassicSeasonalDecomposition
(incl. the phase-shift transform test), Retrospect, SumAll, split modes.

Transcribed from /root/reference/tests/test_transformer1d.py:14-27,
:434-475, :659-698 and tests/test_train_test_split.py semantics.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from adtk_spark.operators.transformers import (
    retrospect,
    seasonal_fit,
    seasonal_transform,
    standard_scale,
    sum_all,
)
from tests.conftest import NAN, assert_series, series_df


def test_standard_scale_goldens(spark):
    df = series_df(spark, [NAN, 0, 1, NAN, 2, NAN])
    assert_series(standard_scale(df), "scaled", [NAN, -1, 0, NAN, 1, NAN])
    df2 = series_df(spark, [NAN, 1, 1, NAN, 1, NAN])
    assert_series(standard_scale(df2), "scaled", [NAN, 0, 0, NAN, 0, NAN])


def test_retrospect_goldens(spark):
    df = series_df(spark, list(range(10)))
    out = retrospect(df, n_steps=3, step_size=2, till=3, prefix="t_")
    assert_series(out, "t_3", [NAN] * 3 + list(range(7)))
    assert_series(out, "t_5", [NAN] * 5 + list(range(5)))
    assert_series(out, "t_7", [NAN] * 7 + list(range(3)))


def test_sum_all(spark):
    rows = [("A", dt.datetime(2017, 1, 1 + i), float(i), v)
            for i, v in enumerate([1.0, None, 3.0])]
    df = spark.createDataFrame(rows, "source string, ts timestamp, x double, y double")
    out = sum_all(df, ["x", "y"])
    got = [r["sum_all"] for r in out.orderBy("ts").collect()]
    assert got == [1.0, None, 5.0]  # skipna=False


def test_seasonal_decomposition_golden(spark):
    # season30: residual all zero (test_transformer1d.py:462-475)
    s = [0, 1, 2, 3, 2, 1] * 5
    df = series_df(spark, s)
    model = seasonal_fit(df, freq=None)
    out = seasonal_transform(df, model)
    assert_series(out, "residual", [0.0] * 30, tol=1e-9)
    model12 = seasonal_fit(df, freq=12)
    out12 = seasonal_transform(df, model12)
    assert_series(out12, "residual", [0.0] * 30, tol=1e-9)


def test_seasonal_phase_shift(spark):
    # test_transformer1d.py:659-698: fit at 00:05, transform windows
    # starting 00:02 (before datum) and 00:52 (after) — phase alignment
    train = series_df(spark, [0, 1, 2, 3, 4] * 8,
                      start="2017-01-01 00:05:00", freq_hours=1 / 60)
    model = seasonal_fit(train, freq=5)
    expected = [0, 0, 0.1, 0, 0, 0, -0.1, 0, 0, 0]
    for start in ("2017-01-01 00:02:00", "2017-01-01 00:52:00"):
        test = series_df(spark, [2, 3, 4.1, 0, 1, 2, 2.9, 4, 0, 1],
                         start=start, freq_hours=1 / 60)
        out = seasonal_transform(test, model)
        assert_series(out, "residual", expected, tol=1e-9)


def test_split_train_test_modes(spark):
    from adtk_spark.operators.data import split_train_test

    df = series_df(spark, list(range(40)))

    def positions(d):
        return [int(r["value"]) for r in d.where("source='A'").orderBy("ts").collect()]

    # reference docstring example (_data.py:673-701), n_splits=4, ratio=0.7
    s1 = split_train_test(df, mode=1, n_splits=4)
    assert positions(s1[0][0]) == list(range(0, 7))
    assert positions(s1[0][1]) == list(range(7, 10))
    assert positions(s1[3][0]) == list(range(30, 37))
    assert positions(s1[3][1]) == list(range(37, 40))

    s2 = split_train_test(df, mode=2, n_splits=4)
    assert positions(s2[1][0]) == list(range(0, 14))
    assert positions(s2[1][1]) == list(range(14, 20))

    s3 = split_train_test(df, mode=3, n_splits=4)
    assert positions(s3[0][0]) == list(range(0, 8))
    assert positions(s3[0][1]) == list(range(8, 16))
    assert positions(s3[3][0]) == list(range(0, 32))
    assert positions(s3[3][1]) == list(range(32, 40))

    s4 = split_train_test(df, mode=4, n_splits=4)
    assert positions(s4[0][0]) == list(range(0, 8))
    assert positions(s4[0][1]) == list(range(8, 40))


def test_seasonal_trend_per_source_freq(spark):
    """trend=True with DIFFERENT freqs per source (the round-1
    NotImplementedError): each source flows through its own fixed-frame
    centered-MA branch; expected residuals computed with pandas using
    the statsmodels convention the reference follows."""
    import numpy as np
    import pandas as pd

    def mk(vals, src):
        return [(src, dt.datetime(2017, 1, 1) + dt.timedelta(hours=i), float(v))
                for i, v in enumerate(vals)]

    a_vals = [v + 0.1 * i for i, v in enumerate([0, 2, 4, 2] * 12)]      # freq 4
    b_vals = [v + 0.05 * i for i, v in enumerate([1, 5, 3, 7, 2, 6] * 8)]  # freq 6
    df = spark.createDataFrame(mk(a_vals, "A") + mk(b_vals, "B"),
                               "source string, ts timestamp, value double")
    model = seasonal_fit(df, freq=None, trend=True)
    out = seasonal_transform(df, model, trend=True)
    got = {s: [r["residual"] for r in out.where(f"source='{s}'").orderBy("ts").collect()]
           for s in ("A", "B")}

    for s, vals in (("A", a_vals), ("B", b_vals)):
        ser = pd.Series(vals)
        f = 4 if s == "A" else 6
        half = f // 2
        ma = ser.rolling(f, center=True).mean()
        if f % 2 == 0:  # statsmodels even-freq 2x MA
            ma = (ser.rolling(f, center=True).mean()
                  .add(ser.shift(-1).rolling(f, center=True).mean()) / 2)
            ma = ser.rolling(f + 1, center=True, win_type=None).apply(
                lambda w: (w[0] / 2 + w[1:-1].sum() + w[-1] / 2) / f, raw=True)
        detr = ser - ma
        pat = np.array([np.nanmean(detr[i::f]) for i in range(f)])
        pat -= np.nanmean(pat)
        exp = [v - m - pat[i % f] for i, (v, m) in enumerate(zip(vals, ma))]
        for g, e in zip(got[s], exp):
            if np.isnan(e):
                assert g is None
            else:
                assert abs(g - e) < 1e-9, (s, g, e)


def test_ewma_matches_pandas_bounded(spark):
    """Bounded-window EWMA equals pandas ewm(adjust=True, ignore_na)
    exactly when the series is shorter than the window, and within the
    documented (1-alpha)^W truncation bias on longer series; NULLs are
    renormalized out of both sums."""
    import datetime as dt

    import numpy as np
    import pandas as pd

    from adtk_spark.operators.transformers import ewma

    t0 = dt.datetime(2025, 1, 1)
    vals = [3.0, 1.0, None, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0]
    rows = [("s", t0 + dt.timedelta(minutes=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "source string, ts timestamp, value double")
    # window >= len(series): exact pandas equality (ignore_na=False =
    # absolute-position weights, NaN excluded from both sums — the
    # pandas default and our row-distance form)
    got = [r["ewma"] for r in
           ewma(df, alpha=0.3, window=16).orderBy("ts").collect()]
    exp = (pd.Series([np.nan if v is None else v for v in vals])
           .ewm(alpha=0.3, adjust=True, ignore_na=False).mean())
    for g, e in zip(got, exp):
        assert g is not None and abs(g - e) < 1e-12
    # truncated window: bias bounded by (1-alpha)^W
    got8 = [r["ewma"] for r in
            ewma(df, alpha=0.3, window=4).orderBy("ts").collect()]
    for g, e in zip(got8, exp):
        assert abs(g - e) <= 0.7 ** 4 * 10 + 1e-12


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None)
@given(vals=st.lists(st.one_of(st.none(), st.integers(min_value=-9, max_value=9)),
                     min_size=2, max_size=14))
def test_ewma_property_matches_pandas(spark, vals):
    """Property: with window >= len(series), bounded EWMA equals pandas
    ewm(adjust=True, ignore_na=False) on arbitrary NULL patterns."""
    import datetime as dt
    import math

    import numpy as np
    import pandas as pd

    from adtk_spark.operators.transformers import ewma

    t0 = dt.datetime(2025, 1, 1)
    rows = [("s", t0 + dt.timedelta(minutes=i),
             None if v is None else float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "source string, ts timestamp, value double")
    got = [r["ewma"] for r in ewma(df, alpha=0.4, window=16).orderBy("ts").collect()]
    exp = (pd.Series([np.nan if v is None else float(v) for v in vals])
           .ewm(alpha=0.4, adjust=True, ignore_na=False).mean())
    for g, e in zip(got, exp):
        if math.isnan(e):
            assert g is None, vals  # all-NULL prefix
        else:
            assert g is not None and abs(g - e) < 1e-12, vals
