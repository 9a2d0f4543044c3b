"""Multimodal columns: opaque binary payloads with typed metadata.

Image/audio/video bytes are treated as ``binary`` columns next to a
typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` UDFs so the Spark
plumbing (schema, partition sizing, batch shape) is real and tested.
The actual media decoding is STUBBED: the codec libraries (PIL,
torchaudio, av) are not in this container, so ``decode_fn=None`` uses a
deterministic fake decoder and a real library can be dropped in on a
cluster via the ``decode_fn`` parameter.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id string, media binary, media_type string, width int, height int, "
    "n_frames int, sample_rate int"
)


def synthetic_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table exercising the binary-column path:
    payload bytes derive from xxhash64 of the id (no Python RNG)."""
    df = spark.range(n)
    payload = F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
    return df.select(
        F.concat(F.lit("m"), "id").alias("doc_id"),
        F.to_binary(F.repeat(payload, 8), F.lit("hex")).alias("media"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id"), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(64)) + 1).cast("int").alias("n_frames"),
        F.lit(16000).alias("sample_rate"),
    )


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: tile the payload
    bytes into a (height, width) uint8 array. Replace with a real
    decoder via ``decode_fn`` on a cluster with media libs installed."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(width * height / len(raw)))
    return np.tile(raw, reps)[: width * height].reshape(height, width)


def extract_features(
    media: DataFrame,
    decode_fn: Callable | None = None,
    batch_limit: int = 256,
) -> DataFrame:
    """Per-item feature extraction over Arrow batches (mapInPandas):
    decode -> mean/std/histogram-entropy features. The partition- and
    batch-shape handling here is the production plumbing; only the
    decode is a stub."""
    decode = decode_fn or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                if row["media"] is None:
                    out.append((row["doc_id"], None, None, None))
                    continue
                arr = decode(bytes(row["media"]), int(row["width"]), int(row["height"]))
                hist = np.bincount(arr.reshape(-1) % 16, minlength=16).astype(float)
                p = hist / hist.sum()
                ent = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
                out.append((row["doc_id"], float(arr.mean()), float(arr.std()), ent))
            yield pd.DataFrame(out, columns=["doc_id", "px_mean", "px_std", "entropy"])

    schema = "doc_id string, px_mean double, px_std double, entropy double"
    return media.mapInPandas(run, schema=schema)


def frame_sample(media: DataFrame, every_k: int = 8) -> DataFrame:
    """Frame sampling plan: explode frame indices 0, k, 2k, ... per video
    row — pure expressions; the per-frame decode would plug into
    extract_features downstream."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
    return (
        media.where(F.col("media_type") == "video")
        .select("doc_id", F.explode(frames).alias("frame_idx"))
    )


def resize_stub(*_args, **_kw):
    raise NotImplementedError(
        "media resize needs a real image library (PIL/cv2), absent in "
        "this container; wire it through extract_features(decode_fn=...)"
    )
