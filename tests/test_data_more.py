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
