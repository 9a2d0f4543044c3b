"""Detector parity vs reference goldens.

Transcribed verbatim from /root/reference/tests/test_detector1d.py:20-322
(the reference's own pytest oracle). GeneralizedESDTestAD and the
SVR-regressor AutoregressionAD variants are covered separately/later.
"""

import pytest

from adtk_spark.operators import detectors as D
from tests.conftest import NAN, assert_series, series_df

THRESH6 = [0, -10, 0, NAN, 0, 10]
IQR8 = [0, -10, 0, 0, 0, NAN, 0, 10]
PERSIST14 = [0, 1, 0, 1, 0, -10, -9, -10, -9, -10, 1, NAN, 1, 0]
PERSIST30 = PERSIST14 + [1, 0] * 8
STEP20 = [0] * 10 + [1] * 10
VOL40 = [0, 1] * 10 + [100, -100] * 10
FIB18 = [13, -8, 5, -3, 2, -1, 1, 0, 1, 1, 1, 2, 3, 5, NAN, 13, 21, 34]

LS_EXPECT = [NAN] * 3 + [0] * 6 + [1] * 3 + [0] * 6 + [NAN] * 2

CASES = [
    ("thresh_none", THRESH6, lambda df: D.threshold_ad(df),
     [0, 0, 0, NAN, 0, 0]),
    ("thresh_low", THRESH6, lambda df: D.threshold_ad(df, low=-5),
     [0, 1, 0, NAN, 0, 0]),
    ("thresh_both", THRESH6, lambda df: D.threshold_ad(df, low=-5, high=5),
     [0, 1, 0, NAN, 0, 1]),
    ("quantile_none", THRESH6, lambda df: D.quantile_ad(df),
     [0, 0, 0, NAN, 0, 0]),
    ("quantile_low", THRESH6, lambda df: D.quantile_ad(df, low=0.1),
     [0, 1, 0, NAN, 0, 0]),
    ("quantile_both", THRESH6, lambda df: D.quantile_ad(df, low=0.1, high=0.9),
     [0, 1, 0, NAN, 0, 1]),
    ("iqr_default", IQR8, lambda df: D.iqr_ad(df),
     [0, 1, 0, 0, 0, NAN, 0, 1]),
    ("iqr_high_only", IQR8, lambda df: D.iqr_ad(df, c=(None, 3)),
     [0, 0, 0, 0, 0, NAN, 0, 1]),
    ("iqr_low_only", IQR8, lambda df: D.iqr_ad(df, c=(3, None)),
     [0, 1, 0, 0, 0, NAN, 0, 0]),
    ("persist_default", PERSIST14, lambda df: D.persist_ad(df),
     [NAN, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, NAN, NAN, 0]),
    ("persist_pos", PERSIST14, lambda df: D.persist_ad(df, side="positive"),
     [NAN, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, NAN, NAN, 0]),
    ("persist_neg", PERSIST14, lambda df: D.persist_ad(df, side="negative"),
     [NAN, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, NAN, NAN, 0]),
    ("persist_w2", PERSIST30, lambda df: D.persist_ad(df, window=2),
     [NAN, NAN, 0, 0, 0, 1, 1, 0, 0, 0, 1, NAN, NAN, NAN] + [0, 0] * 8),
    ("persist_50H_mp2", PERSIST30,
     lambda df: D.persist_ad(df, window="50H", min_periods=2),
     [NAN, NAN, 0, 0, 0, 1, 1, 0, 0, 0, 1, NAN, NAN, NAN] + [0, 0] * 8),
    ("persist_w2_mp1", PERSIST30,
     lambda df: D.persist_ad(df, window=2, min_periods=1),
     [NAN, 1, 0, 0, 0, 1, 1, 0, 0, 0, 1, NAN, 0, 1] + [0, 0] * 8),
    ("persist_50H_mp1", PERSIST30,
     lambda df: D.persist_ad(df, window="50H", min_periods=1),
     [NAN, 1, 0, 0, 0, 1, 1, 0, 0, 0, 1, NAN, 0, 1] + [0, 0] * 8),
    ("persist_drift", [0, 1, 2.1, 3.3, 4.5, 5.8, 7.3],
     lambda df: D.persist_ad(df, c=1.5),
     [NAN, 0, 0, 0, 0, 0, 1]),
    ("levelshift_w3", STEP20, lambda df: D.level_shift_ad(df, window=3),
     LS_EXPECT),
    ("levelshift_72H", STEP20,
     lambda df: D.level_shift_ad(df, window="72H", min_periods=3), LS_EXPECT),
    ("levelshift_80H_72H", STEP20,
     lambda df: D.level_shift_ad(df, window=("80H", "72H"), min_periods=3), LS_EXPECT),
    ("levelshift_3_72H", STEP20,
     lambda df: D.level_shift_ad(df, window=(3, "72H"), min_periods=3), LS_EXPECT),
    ("levelshift_80H_3", STEP20,
     lambda df: D.level_shift_ad(df, window=("80H", 3), min_periods=3), LS_EXPECT),
    ("volshift_std", VOL40, lambda df: D.volatility_shift_ad(df, window=3),
     [NAN] * 3 + [0] * 15 + [1] * 5 + [0] * 15 + [NAN] * 2),
    ("volshift_iqr", VOL40,
     lambda df: D.volatility_shift_ad(df, window=3, agg="iqr"),
     [NAN] * 3 + [0] * 15 + [1] * 4 + [0] * 16 + [NAN] * 2),
    ("ar_n2", FIB18, lambda df: D.autoregression_ad(df, n_steps=2),
     [NAN, NAN, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, NAN, NAN, NAN, 0]),
    ("ar_n2_pos", [13, -8, 5, -3, 2, -1, 1, 0, 1, 1, 1, 2, 3, 6, 9, 15, 24],
     lambda df: D.autoregression_ad(df, n_steps=2, side="positive"),
     [NAN, NAN, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0]),
    ("ar_n2_s2_neg", [0, 13, 1, -8, 1, 5, 2, -3, 3, 2, 5.1, -1, 8, 1, 13, 0],
     lambda df: D.autoregression_ad(df, n_steps=2, step_size=2, side="negative"),
     [NAN, NAN, NAN, NAN, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0]),
]


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_detector(spark, case):
    _, values, run, expected = case
    out = run(series_df(spark, values))
    assert_series(out, "label", expected)


def test_esd_ad(spark):
    # test_detector1d.py:84-97
    s = IQR8 + [0] * 10
    out = D.esd_ad(series_df(spark, s))
    assert_series(out, "label", [0, 1, 0, 0, 0, NAN, 0, 1] + [0] * 10)
    out2 = D.esd_ad(series_df(spark, s), alpha=0.0001)
    assert_series(out2, "label", [0, 0, 0, 0, 0, NAN, 0, 0] + [0] * 10)


SEASONAL84 = [1, 2, 3, 4] * 10 + [1, 3, 2, 4] + [1, 2, 3, 4] * 10
SEASONAL84_TREND = [v + i for i, v in enumerate(SEASONAL84)]

SEASONAL_CASES = [
    ("seasonal_auto", SEASONAL84, dict(),
     [0] * 40 + [0, 1, 1, 0] + [0] * 40),
    ("seasonal_f8", SEASONAL84, dict(freq=8),
     [0] * 40 + [0, 1, 1, 0] + [0] * 40),
    ("seasonal_f8_trend", SEASONAL84_TREND, dict(freq=8, trend=True),
     [NAN] * 4 + [0] * 36 + [0, 1, 1, 0] + [0] * 36 + [NAN] * 4),
    ("seasonal_f8_trend_pos", SEASONAL84_TREND, dict(freq=8, trend=True, side="positive"),
     [NAN] * 4 + [0] * 36 + [0, 1, 0, 0] + [0] * 36 + [NAN] * 4),
]


@pytest.mark.parametrize("case", SEASONAL_CASES, ids=[c[0] for c in SEASONAL_CASES])
def test_seasonal_ad(spark, case):
    _, values, kwargs, expected = case
    out = D.seasonal_ad(series_df(spark, values), **kwargs)
    assert_series(out, "label", expected)


def test_cusum_matches_recursion(spark):
    """Window-native CUSUM (prefix-sum minus running-min closed form)
    equals the textbook max(0, S + dev) recursion point-for-point, and
    flags the mean shift."""
    import datetime as dt

    from adtk_spark.operators.detectors import cusum_ad, cusum_ad_fit

    t0 = dt.datetime(2025, 1, 1)
    vals = [10.0, 10.5, 9.5, 10.2, 9.8, 10.1, 9.9, 10.0,
            13.0, 13.5, 13.2, 12.9, 13.1, 13.4, 12.8, 13.0]
    rows = [("s", t0 + dt.timedelta(minutes=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "source string, ts timestamp, value double")
    # whole-series fit: verify the closed form == the recursion exactly
    model = cusum_ad_fit(df).collect()[0]
    mu, sigma = model["mu"], model["sigma"]
    k, h = 0.5 * sigma, 2.0 * sigma
    sp = sm = 0.0
    exp = []
    for v in vals:
        sp = max(0.0, sp + v - mu - k)
        sm = max(0.0, sm + mu - k - v)
        exp.append((sp, sm, 1.0 if (sp > h or sm > h) else 0.0))
    got = [(r["sp"], r["sm"], r["label"]) for r in
           cusum_ad(df, k_sigmas=0.5, h_sigmas=2.0).orderBy("ts").collect()]
    for (gsp, gsm, gl), (esp, esm, el) in zip(got, exp):
        assert abs(gsp - esp) < 1e-9 and abs(gsm - esm) < 1e-9 and gl == el
    # proper usage: fit on the clean train prefix, detect on the full
    # series — pre-shift rows stay quiet, the shift is flagged
    from adtk_spark.operators.detectors import cusum_ad_detect

    train = df.limit(8)
    out = [r["label"] for r in
           cusum_ad_detect(df, cusum_ad_fit(train), 0.5, 4.0)
           .orderBy("ts").collect()]
    assert all(l == 0.0 for l in out[:8])
    assert any(l == 1.0 for l in out[8:])


def test_robust_zscore_vs_numpy(spark):
    """Median/MAD rule equals the numpy re-derivation, and is immune to
    the contamination that drags a mean/std rule (the outlier inflates
    std enough to hide itself at z=3.5 but cannot move the MAD)."""
    import datetime as dt

    import numpy as np

    from adtk_spark.operators.detectors import robust_zscore_ad

    rng = np.random.RandomState(3)
    vals = list(10.0 + rng.randn(60).round(3))
    vals[30] = 200.0  # one gross outlier
    t0 = dt.datetime(2025, 1, 1)
    rows = [("s", t0 + dt.timedelta(minutes=i), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "source string, ts timestamp, value double")
    got = [r["label"] for r in robust_zscore_ad(df, z=3.5).orderBy("ts").collect()]

    a = np.array(vals)
    med = np.quantile(a, 0.5)  # type-7, matches exact_quantile_agg
    mad = np.quantile(np.abs(a - med), 0.5)
    exp = (np.abs(a - med) > 3.5 * (1.4826 * mad)).astype(float)
    assert got == list(exp)
    assert got[30] == 1.0
    # the mean/std z-score would NOT flag it at the same z on this data
    z_classic = abs(a[30] - a.mean()) / a.std(ddof=1)
    assert z_classic < 8  # grossly deflated vs the robust score


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None)
@given(vals=st.lists(
    st.one_of(st.none(), st.integers(min_value=-20, max_value=20)),
    min_size=3, max_size=24))
def test_cusum_closed_form_property(spark, vals):
    """Property: the window-native closed form equals the textbook
    recursion on arbitrary series including NULL runs (NULL -> NaN
    label, transparent to the cumsums)."""
    import datetime as dt
    import math

    from adtk_spark.operators.detectors import cusum_ad, cusum_ad_fit

    if all(v is None for v in vals):
        return
    t0 = dt.datetime(2025, 1, 1)
    rows = [("s", t0 + dt.timedelta(minutes=i),
             None if v is None else float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "source string, ts timestamp, value double")
    m = cusum_ad_fit(df).collect()[0]
    mu, sigma = m["mu"], m["sigma"]
    k, h = 0.5 * sigma, 2.0 * sigma
    sp = sm = 0.0
    seen = False  # before any valid value the cumsums are NULL (empty SUM)
    exp = []
    for v in vals:
        if v is not None:
            seen = True
            sp = max(0.0, sp + v - mu - k)
            sm = max(0.0, sm + mu - k - v)
        exp.append((
            (sp, sm) if seen else (None, None),
            None if v is None else (1.0 if (sp > h or sm > h) else 0.0),
        ))
    got = [(r["sp"], r["sm"], r["label"]) for r in
           cusum_ad(df, 0.5, 2.0).orderBy("ts").collect()]
    for (gsp, gsm, gl), ((esp, esm), el) in zip(got, exp):
        if esp is None:
            assert gsp is None and gsm is None, vals
        else:
            assert abs(gsp - esp) < 1e-9 and abs(gsm - esm) < 1e-9, vals
        assert gl == el, vals


def test_hot_source_guard_on_grouped_map_fits(spark):
    """max_rows_per_source arms guard_source_rows inside the per-source
    applyInPandas fits: a source exceeding the cap fails fast with a
    tier-routing hint instead of buffering the whole series in one task;
    under the cap the fits behave identically to unguarded runs."""
    import datetime as dt

    import pytest

    from adtk_spark.functions.rolling_udf import rolling_agg_callable
    from adtk_spark.operators.detectors import esd_ad_fit
    from adtk_spark.operators.transformers import seasonal_fit

    t0 = dt.datetime(2025, 1, 1)
    rows = [("hot", t0 + dt.timedelta(hours=i),
             float(i % 4) + (1.0 if i % 8 == 0 else 0.0)) for i in range(64)]
    df = spark.createDataFrame(rows, "source string, ts timestamp, value double")

    for build in (
        lambda d, cap: esd_ad_fit(d, max_rows_per_source=cap),
        lambda d, cap: seasonal_fit(d, freq=4, max_rows_per_source=cap),
        lambda d, cap: rolling_agg_callable(
            d, 4, lambda s: s.mean(), None, False, None,
            max_rows_per_source=cap),
    ):
        with pytest.raises(Exception, match="max_rows_per_source"):
            build(df, 32).collect()
        assert build(df, 1000).count() > 0  # under the cap: unaffected


def test_trailing_percentile_ad_regime_shift(spark):
    """A spike is flagged against the trailing distribution; after a
    sustained regime shift the detector re-baselines (late normal
    points at the new level are NOT flagged — the QuantileAD failure
    mode); warm-up rows carry NULL labels; partitioning-invariant."""
    import datetime as dt

    from adtk_spark.operators.detectors import trailing_percentile_ad

    t0 = dt.datetime(2025, 1, 1)
    vals = [10.0 + (i % 5) * 0.1 for i in range(30)]     # calm regime
    vals[27] = 99.0                                      # spike
    vals += [100.0 + (i % 5) * 0.1 for i in range(40)]   # shifted regime
    rows = [("a", t0 + dt.timedelta(hours=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "source string, ts timestamp, value double")
    out = {r["ts"]: r for r in
           trailing_percentile_ad(df, window=24, q=0.95).collect()}
    by_i = [out[t0 + dt.timedelta(hours=i)] for i in range(len(vals))]
    assert all(r["label"] is None for r in by_i[:24])          # warm-up
    assert by_i[27]["label"] is True and by_i[27]["rank_frac"] == 1.0
    assert by_i[30]["label"] is True                           # shift onset
    # re-baselined: the flood stops — only the recurring cycle maxima
    # (rank 1.0 of their trailing window by construction) stay flagged,
    # every non-max point at the NEW level is clean
    late = by_i[60:]
    assert sum(r["label"] for r in late) <= len(late) // 4
    assert all(r["label"] is False for r in late
               if r["value"] < 100.4)
    out2 = {r["ts"]: tuple(r) for r in
            trailing_percentile_ad(df.repartition(7), window=24,
                                   q=0.95).collect()}
    assert out2 == {k: tuple(v) for k, v in out.items()}


def test_peak_detection_unique_max_rule(spark):
    """Two bumps far apart are both found; two competing bumps within
    min_distance yield only the taller; an equal-height plateau pair is
    suppressed by uniqueness; height floor filters small bumps;
    partitioning-invariant."""
    import datetime as dt

    from adtk_spark.operators.detectors import peak_detection

    t0 = dt.datetime(2025, 1, 1)
    vals = [0.0] * 60
    vals[10] = 5.0                       # clear peak
    vals[40] = 7.0; vals[43] = 6.0       # within distance 5: keep 7.0
    vals[52] = 4.0; vals[53] = 4.0       # plateau pair: suppressed
    rows = [("a", t0 + dt.timedelta(hours=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "source string, ts timestamp, value double")
    got = {(r["ts"] - t0).total_seconds() / 3600: r["local_rise"]
           for r in peak_detection(df, min_distance=5).collect()}
    assert set(got) == {10.0, 40.0}
    assert got[10.0] == 5.0 and got[40.0] == 7.0
    tall = peak_detection(df, min_distance=5, height=6.0).collect()
    assert [(r["value"]) for r in tall] == [7.0]
    got2 = {(r["ts"] - t0).total_seconds() / 3600: r["local_rise"]
            for r in peak_detection(df.repartition(9), min_distance=5).collect()}
    assert got2 == got
