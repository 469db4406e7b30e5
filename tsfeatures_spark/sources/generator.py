"""Deterministic synthetic token-table generator (FIXTURES.md §1).

Produces the engine's primary input per BASELINE.json input_hint:
    (doc_id string, tokens array<int32>, n_tok int32, source string)

Generation is *distributed and deterministic*: each doc's array is derived
from a Philox counter RNG seeded by (base_seed, doc_index), so any worker
can generate any doc independently — this is how the table scales to 10^12
sequences on a real cluster (spark.range -> mapInPandas, no driver-side
data) while tests can regenerate any single doc to use as an oracle.

Length distribution: log-normal clipped to [1, max_len] (covers degenerate
n=1/2, sub-window n<60, multi-day n>86400 tails). Sources are
low-cardinality with one deliberately hot source (skew driver). Token
values: trend + two seasonalities (24, 60) + noise + zero-inflated runs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

SOURCES = ["web", "books", "code", "wiki", "chat"]
# hot-source mix: 'web' takes 60% of docs (skew driver per FIXTURES.md §1)
SOURCE_WEIGHTS = np.array([0.60, 0.10, 0.10, 0.10, 0.10])

TOKEN_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def gen_doc(base_seed: int, i: int, mean_len: float = 2000.0, sigma: float = 1.2,
            max_len: int = 200_000) -> tuple[str, np.ndarray, str]:
    """Deterministically generate doc #i. Pure function of (base_seed, i)."""
    rng = np.random.Generator(np.random.Philox(key=base_seed, counter=i))
    src = SOURCES[int(rng.choice(len(SOURCES), p=SOURCE_WEIGHTS))]
    n = int(np.clip(rng.lognormal(np.log(mean_len), sigma), 1, max_len))
    t = np.arange(n, dtype=np.float64)
    trend = rng.normal(0, 0.05) * t
    seas24 = rng.uniform(0, 300) * np.sin(2 * np.pi * t / 24 + rng.uniform(0, 6.28))
    seas60 = rng.uniform(0, 300) * np.sin(2 * np.pi * t / 60 + rng.uniform(0, 6.28))
    noise = rng.normal(0, 100, size=n)
    base = 2000 + trend + seas24 + seas60 + noise
    # zero-inflated runs: ~5% of docs get zeroed spans
    if rng.random() < 0.05:
        k = rng.integers(1, 4)
        for _ in range(k):
            s = int(rng.integers(0, n))
            e = min(n, s + int(rng.integers(1, max(2, n // 4))))
            base[s:e] = 0.0
    tokens = np.clip(np.round(base), 0, 2**31 - 1).astype(np.int32)
    return f"{src}-{i:010d}", tokens, src


def gen_pandas(base_seed: int, indices: np.ndarray, **kw) -> pd.DataFrame:
    rows = [gen_doc(base_seed, int(i), **kw) for i in indices]
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "tokens": [r[1] for r in rows],
            "n_tok": np.array([len(r[1]) for r in rows], dtype=np.int32),
            "source": [r[2] for r in rows],
        }
    )


def token_table(spark, n_docs: int, base_seed: int = 42, partitions: int | None = None,
                mean_len: float = 2000.0, **kw):
    """Distributed token table as a DataFrame. No driver-side data: each
    partition generates its own docs from the counter RNG."""
    if partitions is None:
        partitions = max(int(spark.sparkContext.defaultParallelism), 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # chunk so huge docs don't blow one Arrow batch
            ids = pdf["id"].to_numpy()
            for s in range(0, len(ids), 64):
                yield gen_pandas(base_seed, ids[s : s + 64], mean_len=mean_len, **kw)

    rng_df = spark.range(0, n_docs, 1, partitions)
    return rng_df.mapInPandas(gen, schema=TOKEN_SCHEMA)


def write_token_table(spark, path: str, n_docs: int, base_seed: int = 42,
                      buckets: int = 32, row_group_bytes: int = 2 << 20,
                      **kw) -> None:
    """Materialize the token table bucketed by doc_id hash (explicit layout
    for co-located downstream group-bys; stand-in for Iceberg
    bucket(doc_id) partitioning).

    ``row_group_bytes`` bounds the parquet row-group size. The row group —
    not spark.sql.files.maxPartitionBytes — is the true lower bound on read
    task granularity: Spark plans byte-range splits, but a task only reads
    the row groups whose midpoint falls in its range, so a table written as
    one fat row group per file collapses any finer split plan back to
    file-count parallelism. Measured here: a 60k-doc table written as 16 x
    ~25MB single-row-group files ran the 16-slot arm as 16 monolithic tasks
    (max task 33.3s, JVM GC 21.8% of task time from whole-column-chunk
    allocation spikes) vs ~2MB row groups (max task 2.7s, GC 0.8%). At
    production scale the same bound holds per-core; 2MB suits this box's
    small heaps — a real cluster with 8-16g executors would use 16-64MB."""
    from pyspark.sql import functions as F

    df = token_table(spark, n_docs, base_seed, **kw)
    (
        df.withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(buckets)))
        .repartition(buckets, "bucket")
        .write.mode("overwrite")
        .option("parquet.block.size", str(row_group_bytes))
        .partitionBy("bucket")
        .parquet(path)
    )
