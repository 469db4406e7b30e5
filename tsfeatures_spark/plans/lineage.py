"""Resumable tier-rollup job with per-partition lineage (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

The unit of work is a *wave* of input buckets (micro-batch). Each wave:
  1. reads only its buckets from the pinned input snapshot,
  2. runs the single-scan tier cascade,
  3. append-commits the tier rows to the output table (atomic snapshot),
  4. append-commits a lineage row per bucket: input snapshot id, doc/window
     counts, and an order-insensitive content digest (sum of xxhash64 over
     (doc_id, tier, window_id, block_digest)).

A killed job loses at most the in-flight wave: committed snapshots are
immutable and VERSION flips atomically. ``run(resume=True)`` anti-joins the
lineage table's completed buckets and processes only the remainder — the
final table state is equal to a single uninterrupted run (pinned by
tests/test_resume.py).

At cluster scale the same structure holds with Iceberg snapshot commits;
waves map to job groups and the lineage table doubles as the metrics table
(rows/sec per bucket, block digests for audit).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import functions as F

from ..operators.rollup import rollup_tiers
from ..sources.catalog import IcebergLiteCatalog


class ResumableRollupJob:
    def __init__(self, spark, catalog: IcebergLiteCatalog, tokens_table: str,
                 out_table: str = "tiers", lineage_table: str = "lineage",
                 n_buckets: int = 16, waves: int = 4,
                 split_giant_tok: int | None = 4 * 86400):
        self.spark = spark
        self.catalog = catalog
        self.tokens_table = tokens_table
        self.out_table = out_table
        self.lineage_table = lineage_table
        self.n_buckets = n_buckets
        self.waves = waves
        self.split_giant_tok = split_giant_tok

    # -- helpers --------------------------------------------------------------
    def _with_bucket(self, df):
        if "bucket" in df.columns:
            return df
        return df.withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(self.n_buckets)))

    def completed_buckets(self) -> set[int]:
        try:
            lin = self.catalog.read(self.spark, self.lineage_table)
        except FileNotFoundError:
            return set()
        return {r.bucket for r in lin.select("bucket").distinct().collect()}

    def _reconcile_orphans(self) -> set[int]:
        """Heal the crash window BETWEEN the two commits of a wave: tier
        data committed (snapshot meta carries its buckets) but the lineage
        append never happened. Without this, resume would reprocess those
        buckets and append duplicate tier rows. Backfills the missing
        lineage rows from the committed data (same aggregate as the normal
        path), so resumed state == uninterrupted run. Returns the healed
        bucket set."""
        done = self.completed_buckets()
        healed: set[int] = set()
        for snap in self.catalog.history(self.out_table):
            meta = snap.get("meta") or {}
            bkts = meta.get("buckets")
            if not bkts:
                continue
            missing = [b for b in bkts if b not in done and b not in healed]
            if not missing:
                continue
            committed = self.catalog.read(self.spark, self.out_table).withColumn(
                "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(self.n_buckets))
            ).where(F.col("bucket").isin(missing))
            lin = self._lineage_rows(committed, meta.get("input_snapshot", -1), meta.get("wave", -1))
            self.catalog.commit(self.spark, self.lineage_table, lin, mode="append")
            healed.update(missing)
        return healed

    def _lineage_rows(self, committed, input_sid: int, wave_id: int):
        return committed.groupBy("bucket").agg(
            F.lit(input_sid).cast("long").alias("input_snapshot_id"),
            F.lit(wave_id).cast("long").alias("wave_id"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_windows"),
            # order-insensitive content digest; the decimal(38,0) sum is
            # exact and overflow-free to ~1e26 rows per bucket (an int64
            # sum would overflow — and under ANSI mode fail — at ~2^24)
            F.sum(F.pmod(F.xxhash64("doc_id", "tier", "window_id", "block_digest"), F.lit(1 << 40)).cast("decimal(38,0)")).alias("content_digest"),
        )

    def _wave_buckets(self) -> list[list[int]]:
        per = max(1, self.n_buckets // self.waves)
        ids = list(range(self.n_buckets))
        return [ids[i : i + per] for i in range(0, len(ids), per)]

    # -- main -----------------------------------------------------------------
    def run(self, resume: bool = True, fail_after_waves: int | None = None,
            fail_between_commits: int | None = None) -> dict:
        """Process all (remaining) waves. ``fail_after_waves`` aborts after k
        fully committed waves; ``fail_between_commits`` aborts the k-th wave
        AFTER its data commit but BEFORE its lineage commit — the two
        kill-mid-job hooks used by the resume tests."""
        input_sid = self.catalog.current_snapshot_id(self.tokens_table)
        tokens = self._with_bucket(self.catalog.read(self.spark, self.tokens_table))
        if resume:
            self._reconcile_orphans()
        done = self.completed_buckets() if resume else set()
        waves_run = 0
        for wave_id, bucket_ids in enumerate(self._wave_buckets()):
            remaining = [b for b in bucket_ids if b not in done]
            if not remaining:
                continue
            part = tokens.where(F.col("bucket").isin(remaining))
            out = rollup_tiers(part.select("doc_id", "tokens", "n_tok", "source"),
                               split_giant_tok=self.split_giant_tok)
            # re-derive bucket on the output (rollup schema is bucket-free)
            out = out.withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(self.n_buckets)))
            self.catalog.commit(
                self.spark, self.out_table, out, mode="append",
                partition_by=["tier"],
                meta={"wave": wave_id, "buckets": remaining, "input_snapshot": input_sid},
            )
            if fail_between_commits is not None and waves_run + 1 >= fail_between_commits:
                raise RuntimeError(
                    f"simulated failure between data and lineage commits (wave {wave_id})"
                )
            # lineage/metrics rows from the data just committed (read back the
            # snapshot so the digest reflects what is actually on disk)
            committed = self.catalog.read(self.spark, self.out_table).withColumn(
                "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(self.n_buckets))
            ).where(F.col("bucket").isin(remaining))
            lin = self._lineage_rows(committed, input_sid, wave_id)
            self.catalog.commit(self.spark, self.lineage_table, lin, mode="append")
            waves_run += 1
            if fail_after_waves is not None and waves_run >= fail_after_waves:
                raise RuntimeError(f"simulated failure after {waves_run} waves")
        return {
            "input_snapshot": input_sid,
            "waves_run": waves_run,
            "out_snapshot": self.catalog.current_snapshot_id(self.out_table),
        }


def bootstrap_tokens(spark, catalog: IcebergLiteCatalog, table: str, n_docs: int,
                     base_seed: int = 42, n_buckets: int = 16, mean_len: float = 2000.0) -> int:
    """Commit the deterministic token table as snapshot v1 of ``table``."""
    from ..sources.generator import token_table

    df = token_table(spark, n_docs, base_seed, mean_len=mean_len)
    df = df.withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)))
    # bound row groups on the wide-payload raw tier: with few buckets each
    # file would otherwise land as one fat row group and cap downstream
    # scan parallelism at file count (see catalog.commit docstring)
    return catalog.commit(spark, table, df.repartition(n_buckets, "bucket"),
                          mode="overwrite", partition_by=["bucket"],
                          row_group_bytes=2 << 20)
