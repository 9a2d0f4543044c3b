"""Columnar payload codecs: Gorilla-style XOR floats, delta-of-delta
timestamps. Pure numpy, fully vectorized (loops run over byte
*positions*, never over values), wrapped by Arrow pandas UDFs in
plans/payloads.py.

Formats (little-endian):

float64 XOR stream (Gorilla-style, byte-aligned):
  8-byte raw first value, then per value one control byte
  ``(leading_zero_bytes << 4) | n_significant_bytes`` followed by the
  significant bytes of ``xor(prev, cur)``; control 0x00 == identical
  value, no payload. Byte (not bit) alignment trades a little ratio for
  vectorizability — the control/offset arithmetic becomes cumsums.

int64 delta-of-delta varint stream:
  raw first value (8 bytes) + raw first delta (8 bytes), then zigzag +
  LEB128 varint of each delta-of-delta. Sorted regular timestamps
  collapse to one byte per point.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# varint helpers (vectorized over byte positions)
# ---------------------------------------------------------------------------

def _zigzag(v: np.ndarray) -> np.ndarray:
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    return ((u >> 1) ^ (-(u & 1)).astype(np.uint64)).astype(np.int64)


def _varint_encode(u: np.ndarray) -> bytes:
    if len(u) == 0:
        return b""
    u = u.astype(np.uint64)
    # LEB128 length = ceil(bit_length/7): vectorized via 9 threshold
    # compares (a frompyfunc bit_length here was the codec's only
    # per-value Python call — 5x the whole encode cost)
    nbytes = np.ones(len(u), dtype=np.int64)
    for s in range(7, 64, 7):
        nbytes += u >= (np.uint64(1) << np.uint64(s))
    offsets = np.zeros(len(u) + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    buf = np.zeros(offsets[-1], dtype=np.uint8)
    for k in range(int(nbytes.max())):
        mask = nbytes > k
        byte = ((u[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        buf[offsets[:-1][mask] + k] = byte | cont
    return buf.tobytes()


def _varint_decode(b: bytes) -> np.ndarray:
    raw = np.frombuffer(b, dtype=np.uint8)
    if len(raw) == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (raw & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.concatenate([[0], ends[:-1] + 1])
    out = np.zeros(len(ends), dtype=np.uint64)
    max_len = int((ends - starts).max()) + 1
    for k in range(max_len):
        pos = starts + k
        mask = pos <= ends
        out[mask] |= (raw[pos[mask]].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * k)
    return out


# ---------------------------------------------------------------------------
# delta-of-delta timestamps
# ---------------------------------------------------------------------------

def dod_encode(ts: np.ndarray) -> bytes:
    """int64 (e.g. epoch micros) -> delta-of-delta varint payload."""
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    head = np.int64(n).tobytes()
    if n == 0:
        return head
    if n == 1:
        return head + ts[:1].tobytes()
    d = np.diff(ts)
    return head + ts[:1].tobytes() + d[:1].tobytes() + _varint_encode(_zigzag(np.diff(d)))


def dod_decode(b: bytes) -> np.ndarray:
    n = int(np.frombuffer(b[:8], dtype=np.int64)[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n == 1:
        return np.frombuffer(b[8:16], dtype=np.int64).copy()
    t0 = np.frombuffer(b[8:16], dtype=np.int64)[0]
    d0 = np.frombuffer(b[16:24], dtype=np.int64)[0]
    dod = _unzigzag(_varint_decode(b[24:]))
    d = np.concatenate([[d0], d0 + np.cumsum(dod)])
    return t0 + np.concatenate([[0], np.cumsum(d)]).astype(np.int64)


# ---------------------------------------------------------------------------
# Gorilla-style XOR floats
# ---------------------------------------------------------------------------

def xor_encode(vals: np.ndarray) -> bytes:
    """float64 -> XOR-compressed payload (byte-aligned Gorilla variant).

    Layout: n (int64) | first value (8B) | control block (n bytes) |
    packed significant bytes. Keeping the control bytes contiguous makes
    decode offsets a single cumsum — no per-value scan on either path.
    """
    v = np.asarray(vals, dtype=np.float64).view(np.uint64).copy()
    n = len(v)
    head = np.int64(n).tobytes()
    if n == 0:
        return head
    x = np.zeros(n, dtype=np.uint64)
    x[1:] = v[1:] ^ v[:-1]
    bytes_ = x.view(np.uint8).reshape(n, 8)  # little-endian: col 7 = MSB
    nz = bytes_ != 0
    msb = np.where(nz.any(axis=1), 7 - np.argmax(nz[:, ::-1], axis=1), -1)
    sig = (msb + 1).astype(np.int64)  # significant byte count, 0 == same value
    lead = (8 - sig).astype(np.uint8)
    ctrl = ((lead << 4) | sig.astype(np.uint8)).astype(np.uint8)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sig, out=offsets[1:])
    payload = np.zeros(offsets[-1], dtype=np.uint8)
    for k in range(8):
        mask = sig > k
        payload[offsets[:-1][mask] + k] = bytes_[mask, k]
    return head + v[:1].tobytes() + ctrl.tobytes() + payload.tobytes()


def xor_decode(b: bytes) -> np.ndarray:
    n = int(np.frombuffer(b[:8], dtype=np.int64)[0])
    if n == 0:
        return np.empty(0, dtype=np.float64)
    first = np.frombuffer(b[8:16], dtype=np.uint64)[0]
    ctrl = np.frombuffer(b[16:16 + n], dtype=np.uint8)
    payload = np.frombuffer(b[16 + n:], dtype=np.uint8)
    sig = (ctrl & 0x0F).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sig, out=offsets[1:])
    x = np.zeros(n, dtype=np.uint64)
    for k in range(8):
        mask = sig > k
        x[mask] |= payload[offsets[:-1][mask] + k].astype(np.uint64) << np.uint64(8 * k)
    x[0] = first
    out = np.bitwise_xor.accumulate(x)
    return out.view(np.float64).copy()
