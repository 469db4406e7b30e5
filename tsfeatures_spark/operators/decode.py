"""Block decode operators: reconstruct series from stored tier blocks.

The read-side of the compression story: 1m blocks decode to the exact raw
token windows (token-array equality — consumers can drop the raw tier and
still recover every token), 1h/1d blocks decode to the child tier's mean
series (the downsample). Arrow-batched mapInPandas; decode is the
vectorized NumPy codec, no per-element Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..compression import dod_decode, xor_decode


def decode_blocks(tier_df: DataFrame) -> DataFrame:
    """(tier, doc_id, window_id, block) -> + ``values array<double>``:
    raw tokens for 1m rows, child-tier means for 1h/1d rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for tier, block in zip(pdf["tier"], pdf["block"]):
                buf = bytes(block)
                if tier == "1m":
                    vals.append(dod_decode(buf).astype(np.float64))
                else:
                    vals.append(xor_decode(buf))
            out = pdf[["tier", "doc_id", "window_id"]].copy()
            out["values"] = vals
            yield out

    return tier_df.select("tier", "doc_id", "window_id", "block").mapInPandas(
        run, schema="tier string, doc_id string, window_id long, values array<double>"
    )


def reconstruct_tokens(tier_df: DataFrame) -> DataFrame:
    """Rebuild each doc's full int64 token array from its 1m blocks alone
    (proves raw-tier retirement loses nothing). Returns (doc_id,
    tokens array<long>)."""
    from pyspark.sql import functions as F

    decoded = decode_blocks(tier_df.where(F.col("tier") == "1m"))
    assembled = (
        decoded.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("window_id", "values"))).alias("wins"))
        .select(
            "doc_id",
            F.flatten(F.transform("wins", lambda w: w["values"])).alias("_vals"),
        )
        .select("doc_id", F.transform("_vals", lambda v: v.cast("long")).alias("tokens"))
    )
    return assembled
