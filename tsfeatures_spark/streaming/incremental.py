"""Incremental maintenance & retention (the engine's late-data story).

The reference is a batch library; the north rule asks for *resumable
checkpointed batch*, not Structured Streaming (SURVEY.md §2.5). The model:

- New docs land as APPEND snapshots on the token table (IcebergLite).
- ``incremental_rollup`` computes tier rows ONLY for docs added between
  the last processed snapshot (recorded in the lineage table) and the
  current one, and append-commits them: the watermark is the snapshot id.
- ``apply_retention`` ages tiers out: raw/1m windows older than their
  retention horizon are dropped by rewriting the tier table WITHOUT those
  rows (a new snapshot — old data remains time-travelable until snapshots
  are expired, exactly Iceberg's model).

A Structured Streaming front-end (readStream on a landing dir feeding
append commits) composes on top; the core maintenance below is engine
logic either way.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.rollup import rollup_tiers
from ..sources.catalog import IcebergLiteCatalog


def new_docs_since(spark, catalog: IcebergLiteCatalog, table: str,
                   last_snapshot: int | None, current: int | None = None):
    """Docs present in ``current`` but not in ``last_snapshot`` — computed
    from manifests (file-level diff), not an anti-join over data."""
    cur = catalog.snapshot(table, current)
    if last_snapshot is None:
        new_files = cur["files"]
    else:
        old = set(catalog.snapshot(table, last_snapshot)["files"])
        new_files = [f for f in cur["files"] if f not in old]
    if not new_files:
        return None
    import os

    tdir = catalog._tdir(table)
    by_commit: dict[str, list[str]] = {}
    for f in new_files:
        base = os.path.join(tdir, *f.split(os.sep)[:2])
        by_commit.setdefault(base, []).append(os.path.join(tdir, f))
    df = None
    for base, paths in by_commit.items():
        part = spark.read.option("basePath", base).parquet(*paths)
        df = part if df is None else df.unionByName(part)
    return df


def last_processed_snapshot(spark, catalog: IcebergLiteCatalog, lineage_table: str = "lineage") -> int | None:
    try:
        lin = catalog.read(spark, lineage_table)
    except FileNotFoundError:
        return None
    row = lin.agg(F.max("input_snapshot_id")).collect()[0]
    return row[0]


def incremental_rollup(spark, catalog: IcebergLiteCatalog, tokens_table: str = "tokens",
                       out_table: str = "tiers", lineage_table: str = "lineage") -> dict:
    """Process only the docs appended since the last run. Returns stats."""
    current = catalog.current_snapshot_id(tokens_table)
    last = last_processed_snapshot(spark, catalog, lineage_table)
    if last is not None and last >= current:
        return {"processed_docs": 0, "from_snapshot": last, "to_snapshot": current}
    fresh = new_docs_since(spark, catalog, tokens_table, last, current)
    if fresh is None:
        return {"processed_docs": 0, "from_snapshot": last, "to_snapshot": current}
    out = rollup_tiers(fresh.select("doc_id", "tokens", "source"))
    out = out.withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(16)))
    catalog.commit(spark, out_table, out, mode="append", partition_by=["tier"],
                   meta={"incremental_from": last, "incremental_to": current})
    n_docs = fresh.select("doc_id").distinct().count()
    lin = out.groupBy(F.lit(0).alias("bucket")).agg(
        F.lit(current).cast("long").alias("input_snapshot_id"),
        F.lit(-1).cast("long").alias("wave_id"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_windows"),
        # decimal(38,0) sum: order-insensitive AND overflow-free to ~1e26
        # rows (an int64 sum of 2^40-bounded terms would overflow — and
        # under ANSI mode FAIL — at ~2^24 rows per batch)
        F.sum(F.pmod(F.xxhash64("doc_id", "tier", "window_id", "block_digest"), F.lit(1 << 40)).cast("decimal(38,0)")).alias("content_digest"),
    )
    catalog.commit(spark, lineage_table, lin, mode="append")
    return {"processed_docs": n_docs, "from_snapshot": last, "to_snapshot": current}


RETENTION_WINDOWS = {"1m": 7 * 24 * 60, "1h": 90 * 24, "1d": 3650}  # windows kept per tier


def apply_retention(spark, catalog: IcebergLiteCatalog, out_table: str = "tiers",
                    horizon: dict[str, int] | None = None, now_window: dict[str, int] | None = None) -> int:
    """Drop per-tier windows older than the retention horizon (counted in
    windows back from each doc's latest window, or from an absolute
    ``now_window`` per tier). Rewrites the tier table as a fresh overwrite
    snapshot; prior snapshots stay readable via time travel."""
    from pyspark.sql import Window

    horizon = horizon or RETENTION_WINDOWS
    df = catalog.read(spark, out_table)
    # window functions can't live in WHERE: materialize the per-(doc,tier)
    # latest window first, then filter
    w = Window.partitionBy("doc_id", "tier")
    df = df.withColumn("_latest", F.max("window_id").over(w))
    conds = None
    for tier, keep in horizon.items():
        if now_window and tier in now_window:
            cutoff = F.lit(now_window[tier] - keep)
        else:
            cutoff = F.col("_latest") - keep
        c = (F.col("tier") == tier) & (F.col("window_id") > cutoff)
        conds = c if conds is None else (conds | c)
    # tiers without a horizon are kept whole
    conds = conds | ~F.col("tier").isin(list(horizon.keys()))
    kept = df.where(conds).drop("_latest")
    catalog.commit(spark, out_table, kept, mode="overwrite", partition_by=["tier"],
                   meta={"retention": {k: int(v) for k, v in horizon.items()}})
    return catalog.current_snapshot_id(out_table)
