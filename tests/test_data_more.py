"""one_hot categorical encoding (validate_series check_categorical parity)."""

import datetime as dt


def test_one_hot(spark):
    from adtk_spark.operators.data import one_hot

    t0 = dt.datetime(2017, 1, 1)
    rows = [
        ("A", t0, 1.0, "red"),
        ("A", t0 + dt.timedelta(days=1), 2.0, "blue"),
        ("A", t0 + dt.timedelta(days=2), 3.0, "red"),
    ]
    df = spark.createDataFrame(rows, "source string, ts timestamp, value double, color string")
    out = one_hot(df)
    # pd.get_dummies ordering: values sorted; source/ts/value untouched
    assert out.columns == ["source", "ts", "value", "color_blue", "color_red"]
    got = [(r["color_blue"], r["color_red"]) for r in out.orderBy("ts").collect()]
    assert got == [(0, 1), (1, 0), (0, 1)]

    # explicit cols + no categorical -> passthrough
    same = one_hot(df, cols=[])
    assert same.columns == df.columns


def test_pipenet_summary_and_score(spark):
    from pyspark.sql import functions as F

    from adtk_spark.operators.detectors import threshold_ad
    from adtk_spark.operators.pipe import Pipenet
    from tests.conftest import series_df

    values = [0, 0, 5, 0, 0, 9, 0]
    df = series_df(spark, values)
    net = Pipenet({
        "detect": {"fn": lambda d: threshold_ad(d, high=4.0), "input": "original"},
    })
    s = net.summary()
    assert "detect" in s and "original" in s

    truth = df.withColumn("label", (F.col("value") > 4).cast("double"))
    rec = net.score(df, truth, scoring="recall")
    assert all(r["recall"] == 1.0 for r in rec.collect())
    f1 = net.score(df, truth, scoring="f1")
    assert all(r["f1"] == 1.0 for r in f1.collect())


def test_validate_series_check_freq_parity(spark):
    """Reference parity (tests/test_data_validation.py): pandas only
    infers a freq on a perfectly regular index, so validation must
    leave both regular series and gap-containing series row-identical
    (missed timestamps SURVIVE — asfreq never fires on gappy data)."""
    import datetime as dt

    from adtk_spark.operators.data import validate_series

    base = dt.datetime(2017, 1, 1)
    day = dt.timedelta(days=1)
    # regular (10 pts) for A; B misses days 2 and 8 (reference's
    # test_series_missed_timestamp selection [0,1,3,4,5,6,7,9])
    rows = [("A", base + i * day, float(i)) for i in range(10)]
    rows += [("B", base + i * day, float(i)) for i in (0, 1, 3, 4, 5, 6, 7, 9)]
    df = spark.createDataFrame(rows, "source string, ts timestamp, value double")
    out = validate_series(df, check_freq=True)
    got = {(r["source"], r["ts"], r["value"]) for r in out.collect()}
    assert got == set(rows)


def test_infer_freq_modes(spark):
    import datetime as dt

    from adtk_spark.operators.data import infer_freq

    base = dt.datetime(2017, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [("reg", base + i * h, 1.0) for i in range(24)]
    rows += [("gappy", base + i * h, 1.0) for i in range(24) if i not in (5, 11)]
    rows += [("wild", base, 1.0), ("wild", base + 3 * h, 1.0),
             ("wild", base + 4 * h, 1.0)]
    df = spark.createDataFrame(rows, "source string, ts timestamp, value double")
    strict = {r["source"]: r["freq_micros"] for r in infer_freq(df).collect()}
    assert strict["reg"] == 3_600_000_000
    assert strict["gappy"] is None and strict["wild"] is None
    mode = {r["source"]: r["freq_micros"]
            for r in infer_freq(df, freq_mode="mode").collect()}
    assert mode["reg"] == mode["gappy"] == 3_600_000_000


def test_regularize_mode_fills_gaps_and_drops_offgrid(spark):
    import datetime as dt

    from adtk_spark.operators.data import regularize

    base = dt.datetime(2017, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [("g", base + i * h, float(i)) for i in range(10) if i != 4]
    rows += [("g", base + dt.timedelta(hours=6, minutes=30), 99.0)]  # off-grid
    df = spark.createDataFrame(rows, "source string, ts timestamp, value double")
    out = {(r["ts"], r["value"]) for r in regularize(df).collect()}
    assert (base + 4 * h, None) in out                       # gap -> NULL row
    assert all(ts.minute == 0 for ts, _ in out)              # off-grid dropped
    assert len(out) == 10


def test_regularize_keeps_single_point_sources(spark):
    """A source with one row has no inferable freq (no delta) — it must
    pass through regularize/validate_series untouched, not vanish
    (round-2 review finding: the pass-through branch only matched
    sources with an explicit NULL-freq row)."""
    import datetime as dt

    from adtk_spark.operators.data import regularize, validate_series

    rows = [("a", dt.datetime(2020, 1, 1, 0, 0, 0), 1.0),
            ("a", dt.datetime(2020, 1, 1, 1, 0, 0), 2.0),
            ("lonely", dt.datetime(2020, 6, 1), 42.0)]
    df = spark.createDataFrame(rows, "source string, ts timestamp, value double")
    out = regularize(df)
    got = {(r["source"], r["ts"], r["value"]) for r in out.collect()}
    assert ("lonely", dt.datetime(2020, 6, 1), 42.0) in got
    assert len([1 for s, _, _ in got if s == "a"]) == 2
    v = validate_series(df, check_freq=True)
    assert v.where("source = 'lonely'").count() == 1


def test_seasonal_transform_trend_unknown_source(spark):
    """trend=True predict on a source absent from the model keeps the
    rows with NULL residual (round-2 review finding: they were dropped
    by the per-freq union)."""
    from adtk_spark.operators.transformers import seasonal_fit, seasonal_transform
    from tests.conftest import series_df

    train = series_df(spark, [0.0, 1.0, 2.0, 1.0] * 10, sources=("A",))
    model = seasonal_fit(train, freq=4, trend=True)
    test = series_df(spark, [0.0, 1.0, 2.0, 1.0] * 3, sources=("A", "GHOST"))
    out = seasonal_transform(test, model, trend=True)
    ghost = out.where("source = 'GHOST'").collect()
    assert len(ghost) == 12
    assert all(r["residual"] is None for r in ghost)
    assert out.where("source = 'A' and residual is not null").count() > 0
