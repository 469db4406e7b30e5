"""spark-submit entrypoint for the resumable tier-rollup pipeline.

    spark-submit --py-files tsfeatures_spark.zip jobs/rollup_job.py \
        --warehouse /data/wh --docs 100000 --buckets 64 --waves 8 [--resume]

Bootstraps the deterministic token table if the warehouse is empty, then
runs (or resumes) the wave-checkpointed cascade and prints a JSON summary.
On a cluster the same file runs unchanged — parallelism comes from the
session/submit conf, not from code.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--docs", type=int, default=10000)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--waves", type=int, default=8)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--incremental", action="store_true",
                    help="process only docs appended since the last run")
    ap.add_argument("--retention", default=None,
                    help="JSON dict tier->windows-to-keep, e.g. '{\"1m\": 10080}'")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from tsfeatures_spark.plans import ResumableRollupJob, bootstrap_tokens
    from tsfeatures_spark.sources.catalog import IcebergLiteCatalog

    spark = SparkSession.builder.appName("ts-rollup").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cat = IcebergLiteCatalog(args.warehouse)

    if cat.current_snapshot_id("tokens") is None:
        bootstrap_tokens(spark, cat, "tokens", n_docs=args.docs,
                         base_seed=args.seed, n_buckets=args.buckets)

    if args.incremental:
        from tsfeatures_spark.streaming import incremental_rollup

        summary = incremental_rollup(spark, cat, "tokens", "tiers")
    else:
        job = ResumableRollupJob(spark, cat, "tokens", n_buckets=args.buckets, waves=args.waves)
        summary = job.run(resume=args.resume)

    if args.retention:
        from tsfeatures_spark.streaming import apply_retention

        summary["retention_snapshot"] = apply_retention(
            spark, cat, "tiers", horizon=json.loads(args.retention)
        )

    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
