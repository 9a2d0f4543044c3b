"""Few-shot fit/predict and train-test consistency parity.

Transcribed from /root/reference/tests/test_few_shot_fit.py,
test_few_shot_predict.py, and test_inconsistent_train_test.py.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import series_df


def sin_series(spark, n):
    return series_df(spark, list(np.sin(np.arange(n))))


def test_few_shot_fit_raises(spark):
    """Reference: fit on a series too short for the window raises
    RuntimeError (test_few_shot_fit.py); a window that just fits is OK.
    Our strict contract lives in require_fit (distributed fits degrade
    to NULL models per source instead of killing the job)."""
    from adtk_spark.operators.detectors import (
        autoregression_ad_fit,
        level_shift_ad_fit,
        persist_ad_fit,
        require_fit,
        volatility_shift_ad_fit,
    )

    s10 = sin_series(spark, 10)
    with pytest.raises(RuntimeError):
        require_fit(persist_ad_fit(s10, window=10))
    require_fit(persist_ad_fit(s10, window=9))

    with pytest.raises(RuntimeError):
        require_fit(level_shift_ad_fit(s10, window=6))
    require_fit(level_shift_ad_fit(s10, window=5))

    with pytest.raises(RuntimeError):
        require_fit(volatility_shift_ad_fit(s10, window=6))
    require_fit(volatility_shift_ad_fit(s10, window=5))

    with pytest.raises(RuntimeError):
        require_fit(autoregression_ad_fit(s10, n_steps=3, step_size=4))
    require_fit(autoregression_ad_fit(s10, n_steps=3, step_size=3))


def _labels(df, src="A"):
    rows = df.where(F.col("source") == src).orderBy("ts").collect()
    return [None if r["label"] is None or
            (isinstance(r["label"], float) and math.isnan(r["label"]))
            else r["label"] for r in rows]


def test_few_shot_predict_persist(spark):
    """Reference test_few_shot_predict.py::test_persist_ad: a model
    trained on a long series predicts a very short test series with the
    head NULL-padded exactly as pandas does."""
    from adtk_spark.operators.detectors import persist_ad_detect, persist_ad_fit

    full = list(np.sin(np.arange(100)))
    train = series_df(spark, full[:-10])

    m1 = persist_ad_fit(train, window=1)
    t2 = series_df(spark, full[-2:-1] + [10.0],
                   start="2017-04-09")  # row 98, 99 positions
    assert _labels(persist_ad_detect(t2, m1, window=1)) == [None, 1.0]
    t1 = series_df(spark, [10.0], start="2017-04-10")
    assert _labels(persist_ad_detect(t1, m1, window=1)) == [None]

    m5 = persist_ad_fit(train, window=5)
    t5 = series_df(spark, full[-5:-1] + [10.0], start="2017-04-06")
    assert _labels(persist_ad_detect(t5, m5, window=5)) == [None] * 5
    t6 = series_df(spark, full[-6:-1] + [10.0], start="2017-04-05")
    assert _labels(persist_ad_detect(t6, m5, window=5)) == [None] * 5 + [1.0]


def test_inconsistent_train_test_columns(spark):
    """Reference test_inconsistent_train_test.py: predict accepts a
    frame with extra/reordered columns, raises ValueError when a
    trained-on column is missing."""
    from adtk_spark.operators.hd import (
        pca_fit,
        pca_projection,
        pca_reconstruction,
        pca_reconstruction_error,
        regression_residual,
        regression_residual_fit,
    )

    rows = [("all", i, float(i), float(2 * i)) for i in range(20)]
    train = spark.createDataFrame(rows, "source string, ts int, A double, B double")
    ok = train.withColumn("C", F.lit(0.0)).select("source", "ts", "C", "B", "A")
    not_ok = train.select("source", "ts", F.col("A"),
                          F.col("B").alias("D"))

    reg = regression_residual_fit(train, target="A", features=["B"])
    regression_residual(ok, reg, target="A", features=["B"]).collect()
    with pytest.raises(ValueError, match="The model was trained by"):
        regression_residual(not_ok, reg, target="A", features=["B"])

    pca = pca_fit(train, ["A", "B"], k=1)
    for fn in (pca_projection, pca_reconstruction, pca_reconstruction_error):
        fn(ok, pca, ["A", "B"]).collect()
        with pytest.raises(ValueError, match="The model was trained by"):
            fn(not_ok, pca, ["A", "B"])


QUANTILE_BOUND_CASES = [
    (dict(low=None, high=None), (-math.inf, math.inf)),
    (dict(low=0.1, high=None), (1.0, math.inf)),
    (dict(low=None, high=0.9), (-math.inf, 9.0)),
    (dict(low=0.1, high=0.9), (1.0, 9.0)),
]

IQR_BOUND_CASES = [
    (3.0, (2.5 - 15, 7.5 + 15)),
    (2.0, (2.5 - 10, 7.5 + 10)),
    ((2, 4), (2.5 - 10, 7.5 + 20)),
    ((2, None), (2.5 - 10, math.inf)),
    ((None, 4), (-math.inf, 7.5 + 20)),
    (None, (-math.inf, math.inf)),
]


def test_fitted_bound_attributes(spark):
    """Reference tests/test_attribute.py: the fitted abs_low_/abs_high_
    values on [0..10] — here the bounds-table columns."""
    from adtk_spark.operators.detectors import iqr_ad_fit, quantile_ad_fit

    s = series_df(spark, list(range(11)))
    for kw, (lo, hi) in QUANTILE_BOUND_CASES:
        r = quantile_ad_fit(s, **kw).where("source = 'A'").first()
        assert (r["abs_low"], r["abs_high"]) == (lo, hi), kw
    for c, (lo, hi) in IQR_BOUND_CASES:
        c_arg = c if not isinstance(c, tuple) else c
        r = iqr_ad_fit(s, c=c_arg).where("source = 'A'").first()
        assert (r["abs_low"], r["abs_high"]) == (lo, hi), c


def test_fitted_seasonal_attributes(spark):
    """Reference tests/test_attribute.py seasonal cases: detected freq
    and the fitted phase pattern (with and without trend removal)."""
    from adtk_spark.operators.transformers import seasonal_fit

    def pattern(df, src="A"):
        rows = df.where(F.col("source") == src).orderBy("phase").collect()
        return rows[0]["freq"], [round(r["seasonal"], 9) for r in rows]

    base = [0.0, 1.0, 2.0, 1.0] * 10
    s = series_df(spark, base)
    assert pattern(seasonal_fit(s, freq=4)) == (4, [0, 1, 2, 1])
    assert pattern(seasonal_fit(s, freq=8)) == (8, [0, 1, 2, 1, 0, 1, 2, 1])
    assert pattern(seasonal_fit(s)) == (4, [0, 1, 2, 1])  # ACF detect

    trended = list(np.array(base) + np.arange(40) / 10)
    f, pat = pattern(seasonal_fit(series_df(spark, trended), trend=True))
    assert f == 4 and pat == [-1, 0, 1, 0]

    steep = list(np.array(base) + np.arange(40))
    f, pat = pattern(seasonal_fit(series_df(spark, steep), trend=True, freq=8))
    assert f == 8 and pat == [-1, 0, 1, 0, -1, 0, 1, 0]
