"""Sequence packing for LLM training batches (concat-and-chunk).

Big training pipelines pack variable-length documents into fixed
token-budget training sequences: within a stream (here: per ``source``),
documents are concatenated in a stable order and the concatenation is
sliced every ``budget`` tokens. The operator assigns each document to
the training sequence (bin) where its FIRST token lands:

    bin_id = cum_tokens_before_doc // budget

which is the standard deterministic concat-chunk layout (a bin boundary
may split a document across sequences; the doc is attributed to its
starting bin, so per-bin token sums equal the classic greedy fill).

Scale design (10^12 docs): the per-source ordered prefix sum is the
whole problem — a plain ``Window.partitionBy(source).orderBy(doc_id)``
funnels each source through ONE task, and the generator's 'web' source
owns ~60% of the corpus, so that window IS the job at 100 TB. Same
two-pass trick as operators/skew.py::rebalance_by_cost, but with
ORDER-PRESERVING buckets (fixed doc_id intervals, not hashes — packing
is order-sensitive where rebalancing is not):

  1. bucket = doc_id // K with K sized so ~``n_buckets`` buckets span
     the observed id range; every id in bucket b precedes every id in
     b+1, so per-(source, bucket) token subtotals — a B x n_sources-row
     partial-aggregated groupBy, driver-scale by construction — give
     exclusive per-source OFFSETS in bucket order;
  2. a window partitioned by (source, bucket) computes the local prefix
     sum over its ~1/B slice in parallel; offset + local prefix - cost
     = the exclusive global cumulative, hence the bin id.

The result is row-identical to the single-window formulation (asserted
in tests against a plain pandas cumsum), while every stage stays
parallel in B. Reference for packing semantics: this is a training-data
engine addition beyond Nixtla/tsfeatures (no counterpart in
/root/reference); token counting matches operators/text.py
token_count_cols (whitespace tokens), whose DuckDB mirror is
hash-verified by the doc_token_counts oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pack_sequences(df: DataFrame, budget: int, cost_col: str = "n_tok",
                   key_col: str = "source", order_col: str = "doc_id",
                   n_buckets: int = 256) -> DataFrame:
    """Per-``key_col`` concat-and-chunk packing of ``cost_col`` into
    ``budget``-token bins, ordered by ``order_col`` (must be unique per
    row — ties would make any packing ambiguous).

    Returns one row per document: key, order, cost, bin_id. Aggregate
    downstream for per-bin stats (see ``pack_bins``).

    The (key, order, cost) projection is persisted (memory-and-disk) so
    the input is scanned exactly once: the bounds job, the subtotal job
    and the returned pass-2 plan all read the cache. It stays cached for
    the lifetime of the returned plan; long-lived sessions that are done
    with the result can release it via ``spark.catalog.clearCache()`` or
    by unpersisting the plan's source.
    """
    from pyspark.sql import Window
    from pyspark.sql.types import (ByteType, IntegerType, LongType, ShortType,
                                   StructField, StructType)

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    order_type = df.schema[order_col].dataType
    if not isinstance(order_type, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"pack_sequences needs an integral order_col (bucket arithmetic is "
            f"`{order_col} // k`); got {order_type.simpleString()} — derive an "
            f"integer rank first (e.g. unix_timestamp / row_number)"
        )
    spark = df.sparkSession
    # one scan of the input: the 3-column projection is materialized via
    # localCheckpoint (eager), so the bounds job, the subtotal job and
    # the returned pass-2 plan all read the stored blocks instead of
    # re-scanning the source. localCheckpoint rather than persist()
    # (ADVICE r05): a persist() handle unreachable to callers accumulated
    # cached blocks across repeated calls with no release path short of
    # clearCache(); checkpoint blocks are freed by the ContextCleaner as
    # soon as the returned plan (and its RDD) is garbage-collected, so
    # the lifecycle follows the result automatically. At 100 TB the
    # projection is a small fraction of the table and blocks spill to
    # local disk, never recompute.
    d0 = df.select(key_col, order_col, F.col(cost_col).alias("_cost")).localCheckpoint()
    bounds = d0.agg(F.min(order_col).alias("lo"), F.max(order_col).alias("hi")).collect()[0]
    if bounds["lo"] is None:
        return df.select(
            F.col(key_col), F.col(order_col), F.col(cost_col).alias("_cost"),
        ).withColumn("bin_id", F.lit(0).cast("long")).limit(0)
    span = int(bounds["hi"]) - int(bounds["lo"]) + 1
    k = max(span // max(n_buckets, 1), 1)
    # integer bucket arithmetic (ADVICE r05): the float-divide-then-cast
    # form could shift a bucket boundary for order values beyond 2^53;
    # `div` matches the documented `order_col // k` exactly (bucketing is
    # row-identity-invariant either way — pinned by tests — but the code
    # now does what the TypeError message says)
    d = d0.withColumn(
        "_bkt", F.expr(f"(`{order_col}` - {int(bounds['lo'])}L) div {k}L")
    )
    # pass 1: per-(key, bucket) subtotals -> exclusive per-key offsets in
    # bucket order (driver-scale: <= n_keys * (n_buckets + 1) rows).
    # Ascending-bucket iteration gives each key's running total in order;
    # keys accumulate independently (raw values as dict keys — the key
    # column keeps its input type end-to-end).
    sub = d.groupBy(key_col, "_bkt").agg(F.sum("_cost").alias("_c")).collect()
    acc: dict = {}
    off_rows = []
    for r in sorted(sub, key=lambda r: int(r["_bkt"])):
        key = r[key_col]
        off_rows.append((key, int(r["_bkt"]), acc.get(key, 0)))
        acc[key] = acc.get(key, 0) + int(r["_c"])
    offsets = spark.createDataFrame(
        off_rows,
        StructType([
            StructField(key_col, df.schema[key_col].dataType, True),
            StructField("_bkt", LongType(), False),
            StructField("_off", LongType(), False),
        ]),
    )
    # pass 2: intra-bucket ordered prefix sums, shifted by the broadcast
    # offsets — parallel in (key, bucket), no task sees more than ~1/B of
    # one key's rows
    w_in = Window.partitionBy(key_col, "_bkt").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        d.join(F.broadcast(offsets), [key_col, "_bkt"])
        .withColumn("_cum_before",
                    F.col("_off") + F.sum("_cost").over(w_in) - F.col("_cost"))
        .withColumn("bin_id", F.expr(f"_cum_before div {int(budget)}"))
        .drop("_bkt", "_off", "_cum_before")
    )


def pack_bins(df: DataFrame, budget: int, cost_col: str = "n_tok",
              key_col: str = "source", order_col: str = "doc_id",
              n_buckets: int = 256) -> DataFrame:
    """Per-(key, bin) packing stats: docs packed, token mass attributed
    to the bin (by starting position), and the order range it covers."""
    packed = pack_sequences(df, budget, cost_col=cost_col, key_col=key_col,
                            order_col=order_col, n_buckets=n_buckets)
    return packed.groupBy(key_col, "bin_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_cost").cast("long").alias("packed_tokens"),
        F.min(order_col).alias("first_doc"),
        F.max(order_col).alias("last_doc"),
    )
