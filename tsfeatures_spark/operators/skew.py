"""Skew handling for the token table (north rule: "partitioning / shuffle /
skew handled explicitly").

Two sources of skew at 10^12 scale:
1. HOT SOURCE: one provenance tag owns most docs (generator makes 'web'
   60%). Bucketing by doc_id hash already spreads docs uniformly — source
   skew only matters for source-keyed aggregates, where we salt the key.
2. GIANT DOCS: lognormal n_tok tails. A 200k-token doc is one task's unit
   of work; at extreme tails (multi-GB docs) one straggler pins a core.
   ``split_giant_docs`` segments oversized docs at DAY-WINDOW boundaries
   (86400 ticks) so every holistic window stays intact inside one segment
   — algebraic states merge across segments exactly, holistic features
   never straddle a split (SURVEY.md §7.2).

``rebalance_by_cost`` does cost-aware repartitioning: partition docs by
cumulative token count rather than row count, so each task gets equal
WORK, not equal row cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DAY = 86400


def split_giant_docs(df: DataFrame, max_tok: int = 4 * DAY) -> DataFrame:
    """Split docs with n_tok > max_tok into day-aligned segments.

    Output schema: doc_id, seg_id, seg_start (tick offset), tokens, n_tok,
    source. Small docs pass through as seg_id=0. Window ids downstream are
    computed as (seg_start + pos) // W, so per-(doc, window) rows from
    different segments are identical to the unsplit computation for every
    W dividing DAY.
    """
    seg_len = (max_tok // DAY) * DAY
    assert seg_len > 0
    small = df.where(F.col("n_tok") <= max_tok).select(
        "doc_id", F.lit(0).alias("seg_id"), F.lit(0).cast("long").alias("seg_start"),
        "tokens", "n_tok", "source",
    )
    big = df.where(F.col("n_tok") > max_tok)
    segs = big.select(
        "doc_id", "source", "n_tok",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0).cast("long"), ((F.col("n_tok") - 1) / seg_len).cast("long")),
                lambda i: F.slice("tokens", (i * seg_len + 1).cast("int"), seg_len),
            )
        ).alias("seg_id", "tokens"),
    ).select(
        "doc_id", "seg_id", (F.col("seg_id").cast("long") * seg_len).alias("seg_start"),
        "tokens", F.size("tokens").alias("n_tok"), "source",
    )
    return small.unionByName(segs)


def rebalance_by_cost(df: DataFrame, n_partitions: int, cost_col: str = "n_tok") -> DataFrame:
    """Cost-aware repartition: order rows by a salted hash, assign partition
    ids by cumulative cost (each partition gets ~equal token mass), then
    repartition on that id. Costs one narrow shuffle; prevents a handful
    of giant docs from landing in the same task."""
    from pyspark.sql import Window

    total = df.agg(F.sum(cost_col)).collect()[0][0] or 1
    per_part = max(int(total) // n_partitions + 1, 1)
    w = Window.orderBy(F.xxhash64("doc_id"))
    with_part = df.withColumn(
        "_cum", F.sum(cost_col).over(w)
    ).withColumn("_pid", (F.col("_cum") / per_part).cast("int"))
    return with_part.repartition(n_partitions, "_pid").drop("_cum", "_pid")


def salted_source_agg(df: DataFrame, aggs: list, salt_buckets: int = 32) -> DataFrame:
    """Two-phase aggregate keyed by the skewed ``source`` column: partial
    agg on (source, salt) then final on source. Pattern for any
    hot-key grouped aggregate; exact for algebraic aggregates."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets)))
    partial = salted.groupBy("source", "_salt").agg(
        F.sum("n_tok").alias("_tok"), F.count(F.lit(1)).alias("_docs")
    )
    return partial.groupBy("source").agg(
        F.sum("_tok").alias("total_tokens"), F.sum("_docs").alias("n_docs")
    )
