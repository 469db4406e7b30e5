"""Gorilla-style XOR block codec for float64 series.

XORs each value's bit pattern with its predecessor (the core idea of
Facebook's Gorilla TSDB, Pelkonen et al., VLDB 2015; successors like
Chimp, VLDB 2022, refine the bit packing), then stores each XOR
result byte-aligned with leading zero *bytes* stripped (a byte-aligned
variant of Facebook Gorilla's bit-packing — same XOR-of-successive-values
core, simpler framing so the codec stays fully NumPy-vectorized; the
round-trip is bit-exact, which is the engine invariant. Bit-level packing
is a ratio optimisation, not a semantics change).

Layout: [u8 version=2][u64 n][f64 first][u4-pairs len nibbles][payload bytes]
Each XOR value stores ``nbytes`` (0..8) in a nibble stream, then its
significant little-endian bytes in the payload.
"""

from __future__ import annotations

import struct

import numpy as np

from .delta import BlockCorruption

_MAGIC = 2


def xor_encode(x: np.ndarray) -> bytes:
    x = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
    n = x.shape[0]
    header = struct.pack("<BQd", _MAGIC, n, float(x[0]) if n else 0.0)
    if n <= 1:
        return header
    bits = x.view(np.uint64)
    xors = bits[1:] ^ bits[:-1]
    m = xors.shape[0]
    # significant bytes per xor value (0 if identical)
    nbytes = np.zeros(m, dtype=np.uint8)
    tmp = xors.copy()
    while np.any(tmp):
        nz = tmp > 0
        nbytes[nz] += 1
        tmp >>= np.uint64(8)
    # nibble stream of lengths
    if m % 2 == 1:
        nib = np.concatenate([nbytes, np.zeros(1, dtype=np.uint8)])
    else:
        nib = nbytes
    packed_len = (nib[0::2] | (nib[1::2] << 4)).tobytes()
    # payload: for each value, its nbytes little-endian bytes
    total = int(nbytes.sum())
    payload = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes.astype(np.int64))
    starts = ends - nbytes
    max_b = int(nbytes.max()) if m else 0
    for j in range(max_b):
        sel = nbytes > j
        payload[starts[sel] + j] = ((xors[sel] >> np.uint64(8 * j)) & np.uint64(0xFF)).astype(np.uint8)
    return header + packed_len + payload.tobytes()


def xor_encode_windows(x: np.ndarray, W: int) -> list[bytes]:
    """Batched per-window XOR encode of a whole series: the pairwise XORs,
    significant-byte counts, and payload bytes for ALL windows are computed
    in one vectorized pass over the concatenated array, then sliced per
    window. Output blocks are byte-identical to ``xor_encode(x[w*W:(w+1)*W])``
    per window (pinned by test) — the XOR chain is window-local because
    each window re-seeds from its own first value, so the only per-window
    work left is the (tiny) nibble packing and the byte slicing. This is
    the higher-tier block path of rollup_doc: per-call numpy overhead on
    ~60-element windows was ~10% of cascade CPU before batching."""
    x = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
    n = x.shape[0]
    if n == 0:
        return []
    nw = (n + W - 1) // W
    seg_starts = np.arange(nw) * W
    seg_lens = np.minimum(W, n - seg_starts)
    bits = x.view(np.uint64)
    # within-window consecutive pairs: pair i (between i and i+1) belongs
    # to window i//W iff it does not straddle a boundary (i % W != W-1)
    pair_keep = (np.arange(n - 1) % W) != (W - 1)
    xors = (bits[1:] ^ bits[:-1])[pair_keep]
    counts = np.maximum(seg_lens - 1, 0)
    nbytes = np.zeros(len(xors), dtype=np.uint8)
    tmp = xors.copy()
    while np.any(tmp):
        nz = tmp > 0
        nbytes[nz] += 1
        tmp >>= np.uint64(8)
    ends = np.cumsum(nbytes.astype(np.int64))
    starts = ends - nbytes
    payload = np.empty(int(nbytes.sum()), dtype=np.uint8)
    max_b = int(nbytes.max()) if len(nbytes) else 0
    for j in range(max_b):
        sel = nbytes > j
        payload[starts[sel] + j] = ((xors[sel] >> np.uint64(8 * j)) & np.uint64(0xFF)).astype(np.uint8)
    payload_b = payload.tobytes()
    blocks: list[bytes] = []
    pv = pb = 0
    for w in range(nw):
        L = int(seg_lens[w])
        header = struct.pack("<BQd", _MAGIC, L, float(x[seg_starts[w]]) if L else 0.0)
        if L <= 1:
            blocks.append(header)
            continue
        c = int(counts[w])
        nb_w = nbytes[pv:pv + c]
        nib = np.append(nb_w, np.uint8(0)) if c % 2 else nb_w
        packed = (nib[0::2] | (nib[1::2] << 4)).tobytes()
        byte_c = int(ends[pv + c - 1] - (ends[pv - 1] if pv else 0))
        blocks.append(header + packed + payload_b[pb:pb + byte_c])
        pv += c
        pb += byte_c
    return blocks


def xor_decode(buf: bytes) -> np.ndarray:
    if len(buf) < struct.calcsize("<BQd"):
        raise BlockCorruption(f"block too short: {len(buf)} bytes")
    magic, n, first = struct.unpack_from("<BQd", buf, 0)
    if magic != _MAGIC:
        raise BlockCorruption(f"bad gorilla-block magic {magic}")
    if n == 0:
        return np.empty(0, dtype=np.float64)
    out_bits = np.empty(n, dtype=np.uint64)
    out_bits[0] = np.float64(first).view(np.uint64)
    if n == 1:
        return out_bits.view(np.float64)
    m = n - 1
    off = struct.calcsize("<BQd")
    nib_len = (m + 1) // 2
    nib = np.frombuffer(buf, dtype=np.uint8, count=nib_len, offset=off)
    nbytes = np.empty(nib_len * 2, dtype=np.uint8)
    nbytes[0::2] = nib & 0x0F
    nbytes[1::2] = nib >> 4
    nbytes = nbytes[:m]
    payload = np.frombuffer(buf, dtype=np.uint8, offset=off + nib_len)
    xors = np.zeros(m, dtype=np.uint64)
    ends = np.cumsum(nbytes.astype(np.int64))
    starts = ends - nbytes
    max_b = int(nbytes.max()) if m else 0
    for j in range(max_b):
        sel = nbytes > j
        xors[sel] |= payload[starts[sel] + j].astype(np.uint64) << np.uint64(8 * j)
    # xor prefix-scan: bits[i] = bits[i-1] ^ xors[i-1]; cumulative xor has no
    # numpy ufunc.accumulate for ^ on uint64? np.bitwise_xor.accumulate exists.
    acc = np.bitwise_xor.accumulate(np.concatenate([out_bits[:1], xors]))
    return acc.view(np.float64)
