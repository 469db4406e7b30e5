"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/resize/frame-sample kernels are STUBS in this container (no
image/audio libs baked in — clearly marked), but the Spark-side plumbing is
real and tested: schema, Arrow batch shape, mapInPandas signatures, and a
deterministic fake "decoder" so pipelines are exercisable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_META_SCHEMA = (
    "doc_id string, media_type string, n_bytes long, digest string, "
    "fake_width int, fake_height int, decode_ok boolean"
)


def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic binary payload column (UTF-8 bytes of the
    text) standing in for image bytes; real pipelines read binary columns
    from parquet the same way."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.lit("image/fake").alias("media_type"),
    )


def _decode_image_stub(payload: bytes) -> dict:
    """STUB: real deployments plug Pillow/ffmpeg here. Deterministic fake:
    dimensions derived from the content digest."""
    digest = hashlib.sha256(payload).hexdigest()
    return {
        "n_bytes": len(payload),
        "digest": digest,
        "fake_width": int(digest[:4], 16) % 2048 + 1,
        "fake_height": int(digest[4:8], 16) % 2048 + 1,
        "decode_ok": True,
    }


def decode_media(df: DataFrame, media_col: str = "media", id_col: str = "doc_id",
                 real_decoder=None) -> DataFrame:
    """Arrow-batched decode of a binary media column -> typed metadata.
    ``real_decoder(bytes) -> dict`` can be injected where the libs exist;
    otherwise the deterministic stub runs (NotImplementedError is NOT
    raised so pipelines stay testable — the stub is clearly fake)."""
    decoder = real_decoder or _decode_image_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decoder(bytes(b)) for b in pdf[media_col]]
            out = pd.DataFrame(metas)
            out.insert(0, id_col, pdf[id_col].values)
            out.insert(1, "media_type", pdf["media_type"].values if "media_type" in pdf else "unknown")
            yield out

    cols = [id_col, media_col] + (["media_type"] if "media_type" in df.columns else [])
    return df.select(*cols).mapInPandas(run, schema=MEDIA_META_SCHEMA)


def frame_sample_stub(*_a, **_k):
    """Video frame sampling requires ffmpeg — not available in this
    container."""
    raise NotImplementedError("frame sampling needs ffmpeg; inject via real_decoder")
