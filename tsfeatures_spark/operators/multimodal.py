"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, decoded/processed in Arrow-batched Python.

REAL codecs for the self-describing formats (pure numpy/struct — no
external media libs exist in this container, and none are needed here):

- PPM (P6) images: encode + decode + nearest-neighbour resize + mean
  colour + 8x8 average-hash (aHash) perceptual fingerprint.
- WAV (RIFF PCM16) audio: encode + decode + RMS/peak/duration + stride
  resampling (the frame-sample primitive).

Formats that require real third-party codecs (JPEG/PNG/H.264/MP3) are the
ONLY stubs, clearly marked: ``decode_media(real_decoder=...)`` is the
injection point where Pillow/ffmpeg plug in on a real cluster image. The
Spark-side plumbing — binary columns, Arrow batch shape, mapInPandas
signatures, unified nullable metadata schema — is identical either way.

The synthetic generator derives each doc's media deterministically from
its id (no RNG state crosses workers), so every pipeline is exercisable
and reproducible end-to-end at any scale.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_META_SCHEMA = (
    "doc_id string, media_type string, n_bytes long, digest string, "
    "decode_ok boolean, "
    "width int, height int, mean_r double, mean_g double, mean_b double, ahash string, "
    "sample_rate int, n_samples long, duration_s double, rms double, peak double"
)


# ---------------------------------------------------------------------------
# PPM (P6) — real image codec
# ---------------------------------------------------------------------------

def ppm_encode(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def ppm_decode(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8. Raises on malformed input."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval as whitespace-separated tokens
    # (comments allowed); pixel data starts after the single whitespace
    # byte following maxval
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    arr = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=i)
    return arr.reshape(h, w, 3)


def image_resize_nn(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize via index striding — pure numpy."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[rows[:, None], cols[None, :]]


def image_ahash(img: np.ndarray) -> str:
    """8x8 average-hash: grayscale, resize to 8x8, threshold at the mean —
    64-bit perceptual fingerprint as hex."""
    gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = image_resize_nn(gray, 8, 8)
    bits = (small > small.mean()).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return f"{val:016x}"


# ---------------------------------------------------------------------------
# WAV (RIFF PCM16) — real audio codec
# ---------------------------------------------------------------------------

def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16 bytes."""
    samples = np.asarray(samples, dtype="<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def wav_decode(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 mono -> (sample_rate, int16 array). Chunk-walks the
    container, so extra chunks (LIST, fact) are tolerated."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i = 12
    sample_rate = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, sample_rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_tag != 1 or bits != 16 or channels != 1:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, data


def audio_resample_stride(samples: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Nearest-index resampling (the frame-sample primitive for audio)."""
    n_out = int(len(samples) * dst_rate / src_rate)
    idx = (np.arange(n_out) * src_rate // dst_rate).clip(0, len(samples) - 1)
    return samples[idx]


# ---------------------------------------------------------------------------
# Deterministic synthetic media (id-seeded; any worker regenerates any doc)
# ---------------------------------------------------------------------------

def _doc_rng(doc_id: str) -> np.random.Generator:
    seed = int.from_bytes(hashlib.sha256(doc_id.encode()).digest()[:8], "big")
    return np.random.default_rng(seed)


def synth_media_bytes(doc_id: str) -> tuple[bytes, str]:
    """Deterministic per-doc payload: even hash -> PPM image, odd -> WAV."""
    rng = _doc_rng(doc_id)
    if rng.integers(0, 2) == 0:
        h, w = int(rng.integers(16, 64)), int(rng.integers(16, 64))
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        return ppm_encode(img), "image/ppm"
    sr = int(rng.choice([8000, 16000]))
    n = int(rng.integers(400, 4000))
    t = np.arange(n)
    wave = (3000 * np.sin(2 * np.pi * t * float(rng.uniform(0.01, 0.1)))
            + rng.normal(scale=500, size=n)).astype(np.int16)
    return wav_encode(wave, sr), "audio/wav"


def attach_synthetic_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Binary media column derived deterministically from the doc id —
    real pipelines read binary columns from parquet the same way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, types = [], []
            for d in pdf[id_col]:
                b, t = synth_media_bytes(str(d))
                payloads.append(b)
                types.append(t)
            yield pd.DataFrame({id_col: pdf[id_col], "media": payloads, "media_type": types})

    return df.select(id_col).mapInPandas(run, schema=f"{id_col} string, media binary, media_type string")


# backwards-compatible alias (round-1 name)
def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return attach_synthetic_media(df, id_col=id_col)


# ---------------------------------------------------------------------------
# Decode pipeline
# ---------------------------------------------------------------------------

_META_NULLS = {
    "width": None, "height": None, "mean_r": None, "mean_g": None,
    "mean_b": None, "ahash": None, "sample_rate": None, "n_samples": None,
    "duration_s": None, "rms": None, "peak": None,
}


def _decode_one(payload: bytes, media_type: str) -> dict:
    meta = {"n_bytes": len(payload),
            "digest": hashlib.sha256(payload).hexdigest(), **_META_NULLS}
    try:
        if payload.startswith(b"P6"):
            img = ppm_decode(payload)
            mean = img.reshape(-1, 3).mean(axis=0)
            meta.update(width=int(img.shape[1]), height=int(img.shape[0]),
                        mean_r=float(mean[0]), mean_g=float(mean[1]),
                        mean_b=float(mean[2]), ahash=image_ahash(img),
                        decode_ok=True)
        elif payload[:4] == b"RIFF":
            sr, samples = wav_decode(payload)
            x = samples.astype(np.float64)
            meta.update(sample_rate=sr, n_samples=len(samples),
                        duration_s=len(samples) / sr,
                        rms=float(np.sqrt(np.mean(x * x))) if len(x) else None,
                        peak=float(np.abs(x).max()) if len(x) else None,
                        decode_ok=True)
        else:
            # JPEG/PNG/H.264/... need real codec libs — the documented stub
            raise NotImplementedError(
                f"no built-in codec for {media_type!r}; inject real_decoder"
            )
    except NotImplementedError:
        meta["decode_ok"] = False
    except Exception:
        meta["decode_ok"] = False
    return meta


def decode_media(df: DataFrame, media_col: str = "media", id_col: str = "doc_id",
                 real_decoder=None) -> DataFrame:
    """Arrow-batched decode of a binary media column -> typed metadata
    (unified nullable schema across modalities). PPM and WAV decode for
    real here; ``real_decoder(bytes, media_type) -> dict`` injects
    Pillow/ffmpeg-class codecs where they exist — rows those would handle
    come back decode_ok=false from the built-ins."""
    decoder = real_decoder or _decode_one

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            types = pdf["media_type"] if "media_type" in pdf else ["unknown"] * len(pdf)
            metas = [decoder(bytes(b), t) for b, t in zip(pdf[media_col], types)]
            out = pd.DataFrame(metas)
            out.insert(0, id_col, pdf[id_col].values)
            out.insert(1, "media_type",
                       pdf["media_type"].values if "media_type" in pdf else "unknown")
            cols = [c.split(" ")[0] for c in MEDIA_META_SCHEMA.split(", ")]
            yield out[cols]

    sel = [id_col, media_col] + (["media_type"] if "media_type" in df.columns else [])
    return df.select(*sel).mapInPandas(run, schema=MEDIA_META_SCHEMA)


def media_roundtrip(df: DataFrame, media_col: str = "media", id_col: str = "doc_id") -> DataFrame:
    """Self-validating codec check: decode each payload with the built-in
    PPM/WAV codecs and re-encode; ``roundtrip_ok`` is byte-equality of the
    re-encoded payload with the original (both codecs are canonical — one
    byte layout per logical content — so decode∘encode must be identity).
    ``decode_ok`` false (unknown format) yields roundtrip_ok false."""

    def _one(payload: bytes) -> tuple[bool, bool]:
        try:
            if payload.startswith(b"P6"):
                return True, ppm_encode(ppm_decode(payload)) == payload
            if payload[:4] == b"RIFF":
                sr, samples = wav_decode(payload)
                return True, wav_encode(samples, sr) == payload
        except Exception:
            return False, False
        return False, False

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            flags = [_one(bytes(b)) for b in pdf[media_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "decode_ok": [f[0] for f in flags],
                "roundtrip_ok": [f[1] for f in flags],
            })

    return df.select(id_col, media_col).mapInPandas(
        run, schema=f"{id_col} string, decode_ok boolean, roundtrip_ok boolean")


def frame_sample_stub(*_a, **_k):
    """Video frame sampling requires ffmpeg — not available in this
    container; ``audio_resample_stride``/``image_resize_nn`` are the real
    in-repo primitives for the decodable formats."""
    raise NotImplementedError("frame sampling needs ffmpeg; inject via real_decoder")
