"""Gorilla-style compression codecs, fully vectorized in numpy.

Two codecs, both following the Gorilla paper's ideas (Pelkonen et al.,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database", VLDB 2015):

- :func:`encode_floats_xor` — XOR-with-previous float encoding.  Each value
  is XORed with its predecessor; the leading- and trailing-zero *bytes* of
  the XOR are stripped and only the meaningful bytes are stored, with a
  1-byte header ``(leading_zero_bytes, meaningful_bytes)`` per value.
  This is a byte-aligned variant of Gorilla's bit-level scheme: same
  algorithm (XOR, strip zeros around the meaningful window), but aligned to
  bytes so both encode and decode are pure vectorized numpy (no per-value
  Python loop — mandatory at 100 TB scale).  Typical ratio on smooth series
  is 2-4x; the bit-level original reaches ~1.37 bytes/value on Facebook's
  data at the cost of a sequential bit cursor.

- :func:`encode_ints_dod` — delta-of-delta integer encoding for timestamps
  (and raw token arrays): ``order`` rounds of differencing, zigzag mapping,
  then byte-aligned varint packing with a 1-byte length header per value.
  Regular timestamps (constant stride) collapse to one header byte per
  point.

Round-trip is bitwise exact (tested; the raw-tier token invariant of
BASELINE.json rides on :func:`encode_ints_dod`).
"""

from __future__ import annotations

import numpy as np

_MAGIC_F = b"GXF1"  # float XOR stream
_MAGIC_I = b"GDD1"  # int delta-of-delta stream


def _pack_selected_bytes(bm: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Select bytes ``lo[i]..hi[i]-1`` from each row of byte-matrix ``bm``
    (shape (m, 8)), concatenated row-major.  Vectorized."""
    cols = np.arange(8, dtype=np.int64)
    mask = (cols >= lo[:, None]) & (cols < hi[:, None])
    return bm[mask]


def _unpack_selected_bytes(payload: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_pack_selected_bytes`: scatter payload bytes back
    into a zeroed (m, 8) byte matrix."""
    m = lo.shape[0]
    bm = np.zeros((m, 8), dtype=np.uint8)
    cols = np.arange(8, dtype=np.int64)
    mask = (cols >= lo[:, None]) & (cols < hi[:, None])
    bm[mask] = payload
    return bm


def encode_floats_xor(values: np.ndarray) -> bytes:
    """Compress a float64 array with byte-aligned XOR-of-previous encoding."""
    x = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    n = x.size
    head = _MAGIC_F + np.uint32(n).tobytes()
    if n == 0:
        return head
    first = x[:1].tobytes()
    if n == 1:
        return head + first
    xor = x[1:] ^ x[:-1]
    bm = xor.astype(">u8").view(np.uint8).reshape(n - 1, 8)
    nz = bm != 0
    any_nz = nz.any(axis=1)
    lzb = np.where(any_nz, nz.argmax(axis=1), 0).astype(np.int64)
    last = np.where(any_nz, 7 - nz[:, ::-1].argmax(axis=1), -1).astype(np.int64)
    nbytes = np.where(any_nz, last - lzb + 1, 0)
    headers = (lzb * 9 + nbytes).astype(np.uint8)
    payload = _pack_selected_bytes(bm, lzb, lzb + nbytes)
    return head + first + headers.tobytes() + payload.tobytes()


def decode_floats_xor(buf: bytes) -> np.ndarray:
    """Inverse of :func:`encode_floats_xor` (bitwise exact)."""
    assert buf[:4] == _MAGIC_F, "not a GXF1 stream"
    n = int(np.frombuffer(buf, dtype=np.uint32, count=1, offset=4)[0])
    if n == 0:
        return np.empty(0, dtype=np.float64)
    first = np.frombuffer(buf, dtype=np.uint64, count=1, offset=8)
    if n == 1:
        return first.view(np.float64).copy()
    headers = np.frombuffer(buf, dtype=np.uint8, count=n - 1, offset=16).astype(np.int64)
    lzb, nbytes = headers // 9, headers % 9
    total = int(nbytes.sum())
    payload = np.frombuffer(buf, dtype=np.uint8, count=total, offset=16 + (n - 1))
    bm = _unpack_selected_bytes(payload, lzb, lzb + nbytes)
    xor = np.frombuffer(bm.tobytes(), dtype=">u8").astype(np.uint64)
    vals = np.empty(n, dtype=np.uint64)
    vals[0] = first[0]
    vals[1:] = xor
    return np.bitwise_xor.accumulate(vals).view(np.float64)


def _zigzag(d: np.ndarray) -> np.ndarray:
    return ((d << 1) ^ (d >> 63)).astype(np.uint64)


def _unzigzag(z: np.ndarray) -> np.ndarray:
    zi = z.astype(np.int64)
    return (zi >> 1) ^ -(zi & 1)


def encode_ints_dod(values: np.ndarray, order: int = 2) -> bytes:
    """Delta-of-delta (``order`` differencing rounds) + zigzag + byte-aligned
    varint compression of an integer array.  ``order=2`` is the Gorilla
    timestamp scheme; ``order=1`` (plain delta) suits token-value arrays."""
    x = np.ascontiguousarray(values, dtype=np.int64)
    n = x.size
    k = min(order, n)
    head = _MAGIC_I + np.uint32(n).tobytes() + np.uint8(order).tobytes()
    raw = x[:k].tobytes()
    if n <= k:
        return head + raw
    d = x
    for _ in range(order):
        d = np.diff(d)
    z = _zigzag(d)
    bm = z.astype(">u8").view(np.uint8).reshape(z.size, 8)
    nz = bm != 0
    any_nz = nz.any(axis=1)
    lzb = np.where(any_nz, nz.argmax(axis=1), 8).astype(np.int64)
    nbytes = 8 - lzb
    headers = nbytes.astype(np.uint8)
    payload = _pack_selected_bytes(bm, lzb, np.full(z.size, 8, dtype=np.int64))
    return head + raw + headers.tobytes() + payload.tobytes()


def decode_ints_dod(buf: bytes) -> np.ndarray:
    """Inverse of :func:`encode_ints_dod` (bitwise exact)."""
    assert buf[:4] == _MAGIC_I, "not a GDD1 stream"
    n = int(np.frombuffer(buf, dtype=np.uint32, count=1, offset=4)[0])
    order = int(buf[8])
    k = min(order, n)
    raw = np.frombuffer(buf, dtype=np.int64, count=k, offset=9).copy()
    if n <= k:
        return raw
    m = n - order
    off = 9 + 8 * k
    nbytes = np.frombuffer(buf, dtype=np.uint8, count=m, offset=off).astype(np.int64)
    total = int(nbytes.sum())
    payload = np.frombuffer(buf, dtype=np.uint8, count=total, offset=off + m)
    bm = _unpack_selected_bytes(payload, 8 - nbytes, np.full(m, 8, dtype=np.int64))
    z = np.frombuffer(bm.tobytes(), dtype=">u8").astype(np.uint64)
    level = _unzigzag(z)  # level_order = diff^order(x), length n - order
    # Invert the differencing level by level: level_j has length n - j and
    # its first element diff^j(x)[0] is computable from the stored raw head
    # (raw = x[:order], and j <= order - 1 needs only x[0..j]).
    for j in range(order - 1, -1, -1):
        seed = np.diff(raw[: j + 1], n=j) if j > 0 else raw[:1]
        level = np.cumsum(np.concatenate([seed[-1:], level]))
    return level


def compression_ratio(raw_nbytes: int, encoded: bytes) -> float:
    return raw_nbytes / max(1, len(encoded))
