"""Compressed tier payload blocks via Arrow UDFs over the codecs.

Each (source, day) chunk of a tier becomes one row holding the
timestamps as a delta-of-delta varint blob and the chosen stat as a
Gorilla-style XOR blob (codecs.py). The grouped-map UDF receives one
Arrow batch per chunk — vectorized numpy inside, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codecs import dod_decode, dod_encode, xor_decode, xor_encode


def compress_tier(
    tier: DataFrame,
    stat: str = "mean",
    chunk: str = "day",
    *,
    source_col: str = "source",
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Tier rows -> (source, chunk_ts, n_points, ts_blob, val_blob)."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        ts = pdf[ts_col].values.astype("datetime64[us]").astype(np.int64)
        vals = pdf[stat].values.astype(np.float64)
        return pd.DataFrame(
            {
                source_col: [pdf[source_col].iloc[0]],
                "chunk_ts": [pdf["_chunk"].iloc[0]],
                "n_points": [len(pdf)],
                "ts_blob": [dod_encode(ts)],
                "val_blob": [xor_encode(vals)],
            }
        )

    schema = (
        f"{source_col} string, chunk_ts timestamp, n_points long, "
        "ts_blob binary, val_blob binary"
    )
    chunked = tier.withColumn("_chunk", F.date_trunc(chunk, F.col(ts_col)))
    return chunked.groupBy(source_col, "_chunk").applyInPandas(pack, schema=schema)


def decompress_tier(
    payloads: DataFrame,
    *,
    source_col: str = "source",
    value_name: str = "value",
) -> DataFrame:
    """Inverse of compress_tier -> (source, bucket_ts, value).

    Groups by (source, chunk_ts) — one task decodes ONE chunk, so a hot
    source with a long history fans out across the cluster instead of
    serializing (and potentially OOMing) in a single task.
    """

    def unpack(pdf: pd.DataFrame) -> pd.DataFrame:
        # compress_tier emits exactly one row per (source, chunk_ts)
        if len(pdf) != 1:
            raise ValueError(
                f"duplicate payload chunk for {pdf.iloc[0, 0]!r}: {len(pdf)} rows"
            )
        row = pdf.iloc[0]
        ts = dod_decode(row["ts_blob"]).astype("datetime64[us]")
        vals = xor_decode(row["val_blob"])
        return pd.DataFrame(
            {source_col: row[source_col], "bucket_ts": ts, value_name: vals}
        )

    schema = f"{source_col} string, bucket_ts timestamp, {value_name} double"
    return payloads.groupBy(source_col, "chunk_ts").applyInPandas(unpack, schema=schema)
