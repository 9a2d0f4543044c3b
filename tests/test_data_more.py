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
