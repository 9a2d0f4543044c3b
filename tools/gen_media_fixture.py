"""Generate the committed multimodal contract fixtures.

Writes four small parquet files under ``fixtures/``:

- ``media_bmp.parquet``      — 50 rows of MEDIA_SCHEMA whose payloads are
  REAL uncompressed 24-bit BMP files (deterministic per-id pixel noise,
  the same arithmetic as ``synthetic_bmp_media``).
- ``media_bmp_pixels.parquet`` — the ground-truth DECODED luma arrays
  (doc_id, pixels list<int>) for the same payloads: the DuckDB oracle
  aggregates these raw arrays in SQL while the Spark contract query
  decodes the BINARY payloads through the real BMP codec — matching
  doubles prove the decode+feature path end-to-end (r4 VERDICT item #3).
- ``media_wav.parquet``      — 50 rows whose payloads are REAL 16-bit PCM
  WAV files (per-id harmonic tones + seeded noise, the arithmetic of
  ``synthetic_wav_media``).
- ``media_wav_samples.parquet`` — the ground-truth int16 sample arrays
  (doc_id, samples list<int>, sample_rate) for the same payloads.

Both fixture pairs are generated from ONE in-memory array per id, so
payload and ground truth agree by construction; the contract then tests
that Spark's decode recovers the arrays exactly. Deterministic: fixed
seeds, no time or environment dependence. Run once and commit:

    python tools/gen_media_fixture.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adtk_spark.operators.multimodal import (  # noqa: E402
    _luma,
    bmp_encode,
    wav_encode,
)

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")

MEDIA_PA_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("media", pa.binary()),
    ("media_type", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_frames", pa.int32()),
    ("sample_rate", pa.int32()),
])


def gen_bmp(n: int = 50, width: int = 32, height: int = 24, seed: int = 7):
    """Per-id uniform pixel noise — same arithmetic as
    ``synthetic_bmp_media`` (multimodal.py), shared array for payload
    and ground truth."""
    media_rows, pixel_rows = [], []
    for i in range(n):
        rng = np.random.RandomState(seed + i)
        arr = rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)
        media_rows.append((f"bmp{i}", bmp_encode(arr), "image",
                           width, height, 1, 0))
        pixel_rows.append((f"bmp{i}", _luma(arr).reshape(-1).tolist()))
    media = pa.Table.from_pylist(
        [dict(zip(MEDIA_PA_SCHEMA.names, r)) for r in media_rows],
        schema=MEDIA_PA_SCHEMA)
    pixels = pa.Table.from_pylist(
        [{"doc_id": d, "pixels": p} for d, p in pixel_rows],
        schema=pa.schema([("doc_id", pa.string()),
                          ("pixels", pa.list_(pa.int32()))]))
    return media, pixels


def gen_wav(n: int = 50, sample_rate: int = 8000,
            duration_secs: float = 0.25, seed: int = 11):
    """Per-id harmonic tone + seeded noise — same arithmetic as
    ``synthetic_wav_media`` (multimodal.py)."""
    n_samp = int(sample_rate * duration_secs)
    t = np.arange(n_samp) / sample_rate
    media_rows, sample_rows = [], []
    for i in range(n):
        rng = np.random.RandomState(seed + i)
        f0 = 100.0 + 40.0 * (i % 17)
        x = (0.6 * np.sin(2 * np.pi * f0 * t)
             + 0.25 * np.sin(2 * np.pi * 2 * f0 * t)
             + 0.05 * rng.standard_normal(n_samp))
        pcm = np.clip(x * 20000, -32768, 32767).astype(np.int16)
        media_rows.append((f"wav{i}", wav_encode(pcm, sample_rate), "audio",
                           0, 0, 0, sample_rate))
        sample_rows.append((f"wav{i}", pcm.astype(np.int32).tolist(),
                            sample_rate))
    media = pa.Table.from_pylist(
        [dict(zip(MEDIA_PA_SCHEMA.names, r)) for r in media_rows],
        schema=MEDIA_PA_SCHEMA)
    samples = pa.Table.from_pylist(
        [{"doc_id": d, "samples": s, "sample_rate": r}
         for d, s, r in sample_rows],
        schema=pa.schema([("doc_id", pa.string()),
                          ("samples", pa.list_(pa.int32())),
                          ("sample_rate", pa.int32())]))
    return media, samples


def main() -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    media_bmp, pixels = gen_bmp()
    media_wav, samples = gen_wav()
    for name, table in (("media_bmp", media_bmp),
                        ("media_bmp_pixels", pixels),
                        ("media_wav", media_wav),
                        ("media_wav_samples", samples)):
        path = os.path.join(FIXTURE_DIR, f"{name}.parquet")
        pq.write_table(table, path, compression="zstd")
        print(f"wrote {path}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
