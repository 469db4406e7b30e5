"""Delta-of-delta + zigzag varint block codec for integer token windows.

Lossless: ``decode(encode(x)) == x`` exactly (the engine's token-array
equality invariant, BASELINE.json input_hint). Fully vectorized NumPy —
no per-element Python in the hot path.

Layout (little-endian):
  [u8 version=1][u64 n][i64 first][i64 first_delta][varint-zigzag dd...]
n==0 -> header only; n==1 -> first only is meaningful.
"""

from __future__ import annotations

import struct

import numpy as np


class BlockCorruption(ValueError):
    """A block failed structural validation during decode."""


_MAGIC = 1


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64, copy=False)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -((u & np.uint64(1)).astype(np.int64))


def varint_encode_ex(u: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Vectorized LEB128 encode of a uint64 array.
    Returns (buffer, per-value byte counts) so callers can split the stream.
    """
    u = u.astype(np.uint64, copy=False)
    n = u.shape[0]
    if n == 0:
        return b"", np.empty(0, dtype=np.int64)
    # bytes needed per value: ceil(bit_length/7), min 1
    tmp = u.copy()
    nbytes = np.ones(n, dtype=np.int64)
    tmp >>= np.uint64(7)
    while np.any(tmp):
        more = tmp > 0
        nbytes[more] += 1
        tmp >>= np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # write byte position j of every value that has >= j+1 bytes
    max_b = int(nbytes.max())
    for j in range(max_b):
        sel = nbytes > j
        vals = (u[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[sel] - 1) > j
        out[starts[sel] + j] = vals.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out.tobytes(), nbytes


def varint_encode(u: np.ndarray) -> bytes:
    return varint_encode_ex(u)[0]


def varint_decode(buf: bytes, count: int) -> np.ndarray:
    """Vectorized LEB128 decode of ``count`` values."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_end = (b & 0x80) == 0
    if int(is_end.sum()) < count:
        raise BlockCorruption(f"varint stream truncated: {int(is_end.sum())} < {count} values")
    ends = np.flatnonzero(is_end)[:count]
    starts = np.concatenate([[0], ends[:-1] + 1])
    nbytes = ends - starts + 1
    out = np.zeros(count, dtype=np.uint64)
    max_b = int(nbytes.max())
    for j in range(max_b):
        sel = nbytes > j
        out[sel] |= (b[starts[sel] + j].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * j)
    return out


def dod_encode(x: np.ndarray) -> bytes:
    """Delta-of-delta encode an int array (token window)."""
    x = np.asarray(x).astype(np.int64, copy=False)
    n = x.shape[0]
    first = int(x[0]) if n >= 1 else 0
    first_delta = int(x[1] - x[0]) if n >= 2 else 0
    header = struct.pack("<BQqq", _MAGIC, n, first, first_delta)
    if n <= 2:
        return header
    d = np.diff(x)
    dd = np.diff(d)
    return header + varint_encode(zigzag_encode(dd))


def dod_encode_windows(x: np.ndarray, W: int) -> list[bytes]:
    """Batched per-window delta-of-delta encode of a whole doc: ONE varint
    pass over the concatenated window dd-streams, then byte-offset slicing.
    Output blocks are byte-identical to calling ``dod_encode`` per window
    (diff is local, so each window's dd array is a slice of the doc's)."""
    x = np.asarray(x).astype(np.int64, copy=False)
    n = x.shape[0]
    nw = (n + W - 1) // W
    if n == 0:
        return []
    dd_full = np.diff(x, n=2) if n > 2 else np.empty(0, dtype=np.int64)
    seg_starts = np.arange(nw) * W
    seg_lens = np.minimum(W, n - seg_starts)
    dd_counts = np.maximum(seg_lens - 2, 0)
    segs = [dd_full[s : s + c] for s, c in zip(seg_starts, dd_counts) if c > 0]
    if segs:
        buf, nbytes = varint_encode_ex(zigzag_encode(np.concatenate(segs)))
        ends_per_val = np.cumsum(nbytes)
        val_ends = np.cumsum(dd_counts)
        byte_ends = np.where(dd_counts > 0, ends_per_val[np.maximum(val_ends - 1, 0)], 0)
        byte_ends = np.maximum.accumulate(byte_ends)
    else:
        buf = b""
        byte_ends = np.zeros(nw, dtype=np.int64)
    blocks: list[bytes] = []
    prev_end = 0
    for w in range(nw):
        s = int(seg_starts[w])
        L = int(seg_lens[w])
        first = int(x[s])
        first_delta = int(x[s + 1] - x[s]) if L >= 2 else 0
        header = struct.pack("<BQqq", _MAGIC, L, first, first_delta)
        e = int(byte_ends[w])
        blocks.append(header + buf[prev_end:e] if L > 2 else header)
        prev_end = e
    return blocks


def dod_decode(buf: bytes) -> np.ndarray:
    """Inverse of dod_encode; returns int64 array.
    Raises BlockCorruption on malformed input (integrity auditing is the
    lineage table's sha256 digests; this is the structural backstop)."""
    if len(buf) < struct.calcsize("<BQqq"):
        raise BlockCorruption(f"block too short: {len(buf)} bytes")
    magic, n, first, first_delta = struct.unpack_from("<BQqq", buf, 0)
    if magic != _MAGIC:
        raise BlockCorruption(f"bad delta-block magic {magic}")
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n == 1:
        return np.array([first], dtype=np.int64)
    dd = zigzag_decode(varint_decode(buf[struct.calcsize("<BQqq"):], n - 2)) if n > 2 else np.empty(0, dtype=np.int64)
    deltas = np.empty(n - 1, dtype=np.int64)
    deltas[0] = first_delta
    if n > 2:
        deltas[1:] = first_delta + np.cumsum(dd)
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    out[1:] = first + np.cumsum(deltas)
    return out
