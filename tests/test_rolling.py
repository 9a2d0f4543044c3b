"""RollingAggregate / DoubleRollingAggregate parity vs reference goldens.

Every case is transcribed verbatim from
/root/reference/tests/test_transformer1d.py:14-461 (the reference's own
pytest oracle — golden input/output tables, no scipy required).
"""

import pytest

from adtk_spark.functions.windows import double_rolling_agg, rolling_agg
from tests.conftest import NAN, assert_series, series_df

ROLL10 = [0, 1, 2, 3, NAN, 5, 6, 7, 8, 9]
MONO10 = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]

ROLLING_CASES = [
    # (id, values, kwargs, expected) — test_transformer1d.py:30-201
    ("mean_w3_center", ROLL10, dict(window=3, agg="mean", center=True),
     [NAN, 1, 2, NAN, NAN, NAN, 6, 7, 8, NAN]),
    ("mean_w3", ROLL10, dict(window=3, agg="mean", center=False),
     [NAN, NAN, 1, 2, NAN, NAN, NAN, 6, 7, 8]),
    ("mean_w3_center_mp2", ROLL10, dict(window=3, agg="mean", center=True, min_periods=2),
     [0.5, 1, 2, 2.5, 4, 5.5, 6, 7, 8, 8.5]),
    ("mean_3D_mp3", ROLL10, dict(window="3D", agg="mean", center=False, min_periods=3),
     [NAN, NAN, 1, 2, NAN, NAN, NAN, 6, 7, 8]),
    ("iqr_w3_center_mp1", ROLL10, dict(window=3, agg="iqr", center=True, min_periods=1),
     [0.5, 1, 1, 0.5, 1, 0.5, 1, 1, 1, 0.5]),
    ("iqr_3D_mp1", ROLL10, dict(window="3D", agg="iqr", center=False, min_periods=1),
     [0, 0.5, 1, 1, 0.5, 1, 0.5, 1, 1, 1]),
    ("idr_w3_center_mp1", ROLL10, dict(window=3, agg="idr", center=True, min_periods=1),
     [0.8, 1.6, 1.6, 0.8, 1.6, 0.8, 1.6, 1.6, 1.6, 0.8]),
    ("nunique_w3_mp2", [1, 2, 2, NAN, 3, 3, 4, 4, 4, 4],
     dict(window=3, agg="nunique", center=False, min_periods=2),
     [NAN, 2, 2, 1, 2, 1, 2, 2, 1, 1]),
    ("nnz_w3_center_mp3", [1, 0, 2, NAN, 3, 0, 0, 4, 0, 4],
     dict(window=3, agg="nnz", center=True, min_periods=3),
     [NAN, 2, NAN, NAN, NAN, 1, 1, 1, 2, NAN]),
    ("quantile_scalar", ROLL10,
     dict(window=3, agg="quantile", agg_params={"q": 0.5}, center=True, min_periods=2),
     [0.5, 1, 2, 2.5, 4, 5.5, 6, 7, 8, 8.5]),
]


@pytest.mark.parametrize("case", ROLLING_CASES, ids=[c[0] for c in ROLLING_CASES])
def test_rolling_agg(spark, case):
    _, values, kwargs, expected = case
    df = series_df(spark, values)
    out = rolling_agg(df, out_col="r", **kwargs)
    assert_series(out, "r", expected)


def test_rolling_quantile_list(spark):
    df = series_df(spark, ROLL10)
    out = rolling_agg(
        df, window=3, agg="quantile", agg_params={"q": [0.25, 0.5]},
        center=True, min_periods=2, out_col="r",
    )
    assert_series(out, "r_q0.25", [0.25, 0.5, 1.5, 2.25, 3.5, 5.25, 5.5, 6.5, 7.5, 8.25])
    assert_series(out, "r_q0.5", [0.5, 1, 2, 2.5, 4, 5.5, 6, 7, 8, 8.5])


def test_rolling_hist(spark):
    df = series_df(spark, ROLL10)
    out = rolling_agg(
        df, window=3, agg="hist", agg_params={"bins": [0, 3, 7, 9]},
        center=False, min_periods=2, out_col="h",
    )
    assert_series(out, "h_[0, 3)", [NAN, 2, 3, 2, 1, 0, 0, 0, 0, 0])
    assert_series(out, "h_[3, 7)", [NAN, 0, 0, 1, 1, 2, 2, 2, 1, 0])
    assert_series(out, "h_[7, 9]", [NAN, 0, 0, 0, 0, 0, 0, 1, 2, 3])


def test_rolling_hist_int_bins(spark):
    # test_transformer1d.py:186-201 — integer bins derive equal-width
    # edges from the WHOLE series range (fit-action inside rolling_agg)
    df = series_df(spark, [0, 1, 2, 3, 4, NAN, 5, 6, 7, 8, 9])
    out = rolling_agg(
        df, window=3, agg="hist", agg_params={"bins": 3},
        center=False, min_periods=1, out_col="h",
    )
    assert_series(out, "h_[0.0, 3.0)", [1, 2, 3, 2, 1, 0, 0, 0, 0, 0, 0])
    assert_series(out, "h_[3.0, 6.0)", [0, 0, 0, 1, 2, 2, 2, 1, 1, 0, 0])
    assert_series(out, "h_[6.0, 9.0]", [0, 0, 0, 0, 0, 0, 0, 1, 2, 3, 3])


def test_rolling_callable_scalar(spark):
    df = series_df(spark, MONO10)
    out = rolling_agg(
        df, window=3, agg=lambda x: x.max() - x.min(), center=False,
        min_periods=3, out_col="r",
    )
    assert_series(out, "r", [NAN, NAN, 2, 2, 2, 2, 2, 2, 2, 2])


def test_rolling_callable_vector(spark):
    df = series_df(spark, MONO10)
    out = rolling_agg(
        df, window=3, agg=lambda x: [x.min(), x.max()],
        agg_params={"names": ["min", "max"]}, center=False, min_periods=3,
        out_col="r",
    )
    assert_series(out, "r_min", [NAN, NAN, 0, 1, 2, 3, 4, 5, 6, 7])
    assert_series(out, "r_max", [NAN, NAN, 2, 3, 4, 5, 6, 7, 8, 9])


DOUBLE_CASES = [
    # test_transformer1d.py:232-432
    ("l1_w2_center_mp1", MONO10,
     dict(window=2, agg="mean", center=True, diff="l1", min_periods=1),
     [NAN, 1.5, 2, 2, 2, 2, 2, 2, 2, 1.5]),
    ("l1_w2_center_mp2", MONO10,
     dict(window=2, agg="mean", center=True, diff="l1", min_periods=2),
     [NAN, NAN, 2, 2, 2, 2, 2, 2, 2, NAN]),
    ("l1_w2_mp2", MONO10,
     dict(window=2, agg="mean", center=False, diff="l1", min_periods=2),
     [NAN, NAN, NAN, 2, 2, 2, 2, 2, 2, 2]),
    ("rel_diff_w2_mp2", [0, 1, 2, 3, 4, 5, 6, 7],
     dict(window=2, agg="mean", center=False, diff="rel_diff", min_periods=2),
     [NAN, NAN, NAN, 2 / 0.5, 2 / 1.5, 2 / 2.5, 2 / 3.5, 2 / 4.5]),
    ("l1_2d_mp2", MONO10,
     dict(window="2d", agg="mean", center=False, diff="l1", min_periods=2),
     [NAN, NAN, NAN, 2, 2, 2, 2, 2, 2, 2]),
    ("l1_w21_center", MONO10,
     dict(window=(2, 1), agg="mean", center=True, diff="l1", min_periods=(2, 1)),
     [NAN, NAN, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5]),
    ("l1_2d1_center", MONO10,
     dict(window=("2d", 1), agg="mean", center=True, diff="l1", min_periods=(2, 1)),
     [NAN, NAN, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5]),
    ("l1_2_1d_center", MONO10,
     dict(window=(2, "1d"), agg="mean", center=True, diff="l1", min_periods=(2, 1)),
     [NAN, NAN, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5]),
    ("mixed_agg_tuple", MONO10,
     dict(window=(2, 1), agg=("quantile", "median"), agg_params=({"q": 0.5}, None),
          center=True, diff="l1", min_periods=(2, 1)),
     [NAN, NAN, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5]),
    ("shared_agg_params", MONO10,
     dict(window=(2, 1), agg=("quantile", "quantile"), agg_params={"q": 0.5},
          center=True, diff="l1", min_periods=(2, 1)),
     [NAN, NAN, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5]),
    ("tuple_agg_params", MONO10,
     dict(window=(2, 1), agg="quantile", agg_params=({"q": 0.5}, {"q": 0.5}),
          center=True, diff="l1", min_periods=(2, 1)),
     [NAN, NAN, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5]),
    ("vector_l1", MONO10,
     dict(window=2, agg="quantile", agg_params={"q": [0, 1]}, center=True,
          diff="l1", min_periods=2),
     [NAN, NAN, 4, 4, 4, 4, 4, 4, 4, NAN]),
    ("vector_l2", MONO10,
     dict(window=2, agg="quantile", agg_params={"q": [0, 1]}, center=True,
          diff="l2", min_periods=2),
     [NAN, NAN] + [8 ** 0.5] * 7 + [NAN]),
    ("vector_l2_2d", MONO10,
     dict(window="2d", agg="quantile", agg_params={"q": [0, 1]}, center=False,
          diff="l2", min_periods=2),
     [NAN, NAN, NAN] + [8 ** 0.5] * 7),
]


@pytest.mark.parametrize("case", DOUBLE_CASES, ids=[c[0] for c in DOUBLE_CASES])
def test_double_rolling_agg(spark, case):
    _, values, kwargs, expected = case
    df = series_df(spark, values)
    out = double_rolling_agg(df, out_col="d", **kwargs)
    assert_series(out, "d", expected)


def _pandas_double_mixed(values, wl, wr, agg="mean", diff="l1"):
    """Expected output per the reference's center=False shift tricks
    (_transformer_1d.py:558-598), computed with pandas directly."""
    import numpy as np
    import pandas as pd

    s = pd.Series(values, index=pd.date_range("2017-01-01", periods=len(values),
                                              freq="24h"), dtype="float64")
    if isinstance(wr, int):
        left = s.shift(wr).rolling(wl).agg(agg)
        right = s.rolling(wr).agg(agg)
    else:
        s_shifted = pd.Series(s.values, s.index + pd.Timedelta(wr))
        s_shifted = pd.concat([s_shifted, pd.Series(index=s.index, dtype="float64")])
        s_shifted = s_shifted.iloc[~s_shifted.index.duplicated()]
        s_shifted = s_shifted.sort_index()
        left = s_shifted.rolling(wl).agg(agg)[s.index]
        right = s.rolling(wr).agg(agg)
    out = abs(right - left) if diff == "l1" else (right - left)
    return [None if np.isnan(v) else v for v in out]


@pytest.mark.parametrize("wl,wr", [("3D", 2), (2, "3D"), ("2D", 3), (3, "2D")])
def test_double_rolling_mixed_windows(spark, wl, wr):
    vals = [0, 1, 2, 3, NAN, 5, 6, 7, 8, 9]
    df = series_df(spark, vals)
    out = double_rolling_agg(df, (wl, wr), agg="mean", center=False,
                             diff="l1", out_col="d")
    assert_series(out, "d", _pandas_double_mixed(vals, wl, wr))


def test_double_rolling_callable_diff(spark):
    vals = [0, 1, 2, 3, NAN, 5, 6, 7, 8, 9]
    df = series_df(spark, vals)
    out = double_rolling_agg(df, 2, agg="mean", center=False,
                             diff=lambda l, r: (r - l) * 10.0, out_col="d")
    import numpy as np
    import pandas as pd

    s = pd.Series(vals, index=pd.date_range("2017-01-01", periods=10, freq="24h"),
                  dtype="float64")
    left = s.shift(2).rolling(2).mean()
    right = s.rolling(2).mean()
    exp = [(None if np.isnan(v) else v) for v in (right - left) * 10.0]
    assert_series(out, "d", exp)


def test_double_rolling_callable_diff_mixed(spark):
    vals = [0, 1, 2, 3, NAN, 5, 6, 7, 8, 9]
    df = series_df(spark, vals)
    out = double_rolling_agg(df, ("3D", 2), agg="mean", center=False,
                             diff=lambda l, r: r - l, out_col="d")
    assert_series(out, "d", _pandas_double_mixed(vals, "3D", 2, diff="diff"))


def test_double_rolling_callable_diff_multi_output(spark):
    """callable diff over a multi-output agg (quantile list): the
    callable receives per-row Series slices, matching the reference's
    DataFrame-rolling branch (_transformer_1d.py:620-626)."""
    import numpy as np
    import pandas as pd

    vals = [0, 1, 2, 3, NAN, 5, 6, 7, 8, 9]
    df = series_df(spark, vals)
    fn = lambda l, r: float((r - l).abs().sum())
    out = double_rolling_agg(df, 3, agg="quantile",
                             agg_params={"q": [0.25, 0.75]}, center=True,
                             diff=fn, out_col="d")

    s = pd.Series(vals, index=pd.date_range("2017-01-01", periods=10,
                                            freq="24h"), dtype="float64")
    # reference center=True frames: left = 3 rows ending at t-1,
    # right = 3 rows starting at t
    left = s.rolling(3).quantile(0.25).shift(1).to_frame("a").assign(
        b=s.rolling(3).quantile(0.75).shift(1))
    right = s[::-1].rolling(3).quantile(0.25)[::-1].to_frame("a").assign(
        b=s[::-1].rolling(3).quantile(0.75)[::-1])
    exp = []
    for i in range(len(s)):
        v = fn(left.iloc[i], right.iloc[i])
        exp.append(None if np.isnan(v) else v)
    assert_series(out, "d", exp)


# ---------------------------------------------------------------------------
# property-based pandas parity (hypothesis)
# ---------------------------------------------------------------------------

import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.conftest import fetch, series_df


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(st.one_of(st.none(), st.integers(min_value=-9, max_value=9)),
                  min_size=4, max_size=18),
    window=st.integers(min_value=2, max_value=5),
    center=st.booleans(),
    mp=st.integers(min_value=1, max_value=3),
    agg=st.sampled_from(["mean", "median", "min", "max", "sum", "std"]),
)
def test_rolling_agg_property_matches_pandas(spark, vals, window, center, mp, agg):
    """Random series (incl. NaNs), random frame/center/min_periods:
    rolling_agg must match pandas.Series.rolling point-for-point — the
    reference's own kernel semantics (RollingAggregate wraps exactly
    this call, _transformer_1d.py:215-344)."""
    df = series_df(spark, [float("nan") if v is None else float(v) for v in vals])
    out = rolling_agg(df, window=window, agg=agg, center=center,
                      min_periods=min(mp, window), out_col="r")
    got = fetch(out, "r")

    s = pd.Series([float("nan") if v is None else float(v) for v in vals])
    exp = getattr(
        s.rolling(window, center=center, min_periods=min(mp, window)), agg)()
    for g, e in zip(got, exp.tolist()):
        if e is None or (isinstance(e, float) and math.isnan(e)):
            assert g is None, (got, exp.tolist(), agg, window, center, mp)
        else:
            assert g is not None and abs(g - e) < 1e-9, (
                got, exp.tolist(), agg, window, center, mp)
