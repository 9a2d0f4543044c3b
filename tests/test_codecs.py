"""Codec round-trips (property-style, numpy-level) + Spark payload path."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from adtk_spark.codecs import dod_decode, dod_encode, xor_decode, xor_encode


@given(st.lists(st.integers(min_value=-2**62, max_value=2**62), max_size=300))
@settings(max_examples=50, deadline=None)
def test_dod_roundtrip(xs):
    arr = np.array(xs, dtype=np.int64)
    assert np.array_equal(dod_decode(dod_encode(arr)), arr)


@given(st.lists(st.floats(allow_nan=False, width=64), max_size=300))
@settings(max_examples=50, deadline=None)
def test_xor_roundtrip(xs):
    arr = np.array(xs, dtype=np.float64)
    out = xor_decode(xor_encode(arr))
    assert np.array_equal(out, arr)


def test_xor_nan_roundtrip():
    arr = np.array([1.0, np.nan, 3.0, np.nan], dtype=np.float64)
    out = xor_decode(xor_encode(arr))
    assert np.array_equal(np.isnan(out), np.isnan(arr))
    assert np.array_equal(out[~np.isnan(out)], arr[~np.isnan(arr)])


def test_compression_ratio_on_regular_series():
    # sorted regular timestamps collapse to ~1 byte/point
    ts = np.arange(0, 86_400_000_000, 60_000_000, dtype=np.int64)  # 1 day of minutes
    blob = dod_encode(ts)
    assert len(blob) < len(ts) * 1.1 + 32
    # slowly varying values compress well too
    vals = np.round(np.sin(np.arange(1440) / 100.0), 3) + 100
    vblob = xor_encode(vals)
    assert len(vblob) < vals.nbytes * 0.8


def test_spark_payload_roundtrip(spark):
    import datetime as dt

    from adtk_spark.plans.payloads import compress_tier, decompress_tier
    from pyspark.sql import functions as F

    rows = [
        ("A", dt.datetime(2025, 1, 1 + d, h, m), float(d * 100 + h + m / 60))
        for d in range(2) for h in range(3) for m in range(0, 60, 15)
    ]
    tier = spark.createDataFrame(rows, "source string, bucket_ts timestamp, mean double")
    payloads = compress_tier(tier, stat="mean")
    assert payloads.count() == 2  # one chunk per day
    back = decompress_tier(payloads)
    a = {(r["source"], r["bucket_ts"], r["value"]) for r in back.collect()}
    b = {(r["source"], r["bucket_ts"], r["mean"]) for r in tier.collect()}
    assert a == b


def test_spark_payload_many_chunks_per_source(spark):
    # a hot source with a long history: each (source, day) chunk must
    # decode independently (decompress groups on (source, chunk_ts),
    # not source alone)
    import datetime as dt

    rows = [
        ("hot", dt.datetime(2025, 1, 1) + dt.timedelta(days=d, minutes=15 * m),
         float(d + m))
        for d in range(30) for m in range(4)
    ] + [("cold", dt.datetime(2025, 1, 1, 0, 30), 7.0)]
    tier = spark.createDataFrame(rows, "source string, bucket_ts timestamp, mean double")
    from adtk_spark.plans.payloads import compress_tier, decompress_tier

    payloads = compress_tier(tier, stat="mean")
    assert payloads.count() == 31  # 30 hot days + 1 cold day
    back = decompress_tier(payloads)
    a = {(r["source"], r["bucket_ts"], r["value"]) for r in back.collect()}
    b = {(r["source"], r["bucket_ts"], r["mean"]) for r in tier.collect()}
    assert a == b
