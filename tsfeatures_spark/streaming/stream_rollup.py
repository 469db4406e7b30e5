"""Structured Streaming front-end for the tier cascade.

Landing-zone pattern: token parquet files arrive in a directory; a
``readStream`` picks up new files, and ``foreachBatch`` pushes each
micro-batch through the SAME single-scan cascade used by the batch path,
append-committing to the catalog (or plain parquet). Spark's streaming
checkpoint tracks which files were consumed — late-arriving docs are
simply a later micro-batch (per-doc windows are self-contained, so no
watermark/state is needed: the engine's "late data" unit is a whole doc,
SURVEY.md §2.5).

``run_stream(..., available_now=True)`` drains everything currently in the
landing zone and stops — the testable, cron-able mode; omit it for a
long-running continuous job.
"""

from __future__ import annotations

from ..operators.rollup import rollup_tiers
from ..sources.generator import TOKEN_SCHEMA


def run_stream(spark, landing_dir: str, out_dir: str, checkpoint_dir: str,
               available_now: bool = True, catalog=None, out_table: str = "tiers"):
    """Stream token docs from ``landing_dir`` through the cascade.

    Returns the terminated StreamingQuery (available_now mode) or the live
    query handle.
    """
    stream = (
        spark.readStream.schema(TOKEN_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_dir)
    )

    def process_batch(batch_df, epoch_id: int):
        out = rollup_tiers(batch_df.select("doc_id", "tokens", "source"))
        if catalog is not None:
            catalog.commit(batch_df.sparkSession, out_table, out, mode="append",
                           partition_by=["tier"], meta={"stream_epoch": epoch_id})
        else:
            (
                out.write.mode("append")
                .option("compression", "zstd")
                .partitionBy("tier")
                .parquet(out_dir)
            )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
