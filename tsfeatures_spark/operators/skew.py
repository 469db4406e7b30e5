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


def rebalance_by_cost(df: DataFrame, n_partitions: int, cost_col: str = "n_tok",
                      id_col: str = "doc_id", oversample: int = 8) -> DataFrame:
    """Cost-aware repartition: assign partition ids by cumulative cost in a
    deterministic hash order, so each task gets ~equal token MASS rather
    than equal row cardinality.

    Two-pass prefix-sum — NO global window (a ``Window.orderBy`` with no
    partitionBy funnels the whole table through ONE task; at 100 TB that is
    the job):
      1. rows are hashed into B = oversample * n_partitions deterministic
         buckets; per-bucket cost subtotals (one partial-aggregated groupBy
         over B rows of output) give exclusive cumulative OFFSETS — the
         running sum over those B rows is driver-scale work, broadcast back;
      2. within each bucket (a bounded ~1/B slice), a per-bucket window
         computes the local prefix sum; offset + local prefix = the global
         cumulative cost, from which the target partition id follows.
    Every stage is parallel in B; the only serial structure is the B-row
    offset table. Determinism: bucket AND intra-bucket order derive from
    xxhash64(id_col), not physical partition ids, so the assignment is
    stable under AQE/recomputation."""
    from pyspark.sql import Window

    spark = df.sparkSession
    n_buckets = max(n_partitions * oversample, 1)
    h = F.xxhash64(id_col)
    d = df.withColumn("_bkt", F.pmod(h, F.lit(n_buckets)))
    # pass 1: per-bucket cost subtotals — ONE partial-aggregated job whose
    # result is B rows (driver-scale by construction, B = 8 * n_partitions
    # regardless of data size); exclusive running offsets computed driver-side
    sub = {r["_bkt"]: r["_c"] for r in d.groupBy("_bkt").agg(F.sum(cost_col).alias("_c")).collect()}
    total = sum(sub.values()) or 1
    per_part = max(int(total) // n_partitions + 1, 1)
    acc = 0
    off_rows = []
    for b in sorted(sub):
        off_rows.append((int(b), int(acc)))
        acc += int(sub[b])
    offsets = spark.createDataFrame(off_rows, "_bkt long, _off long")
    # pass 2: intra-bucket prefix sums shifted by the broadcast offsets; the
    # window partitions on _bkt, so the sort is parallel in B — no task ever
    # sees more than ~1/B of the data
    w_in = Window.partitionBy("_bkt").orderBy(h, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_part = (
        d.join(F.broadcast(offsets), "_bkt")
        .withColumn("_cum", F.col("_off") + F.sum(cost_col).over(w_in))
        .withColumn("_pid", ((F.col("_cum") - 1) / per_part).cast("int"))
    )
    # HashPartitioning murmur-hashes the key, so distinct small pids would
    # COLLIDE into the same physical partition (2x+ cost hotspots). Remap
    # each pid to a preimage v with murmur3(v) % n == pid (F.hash is the
    # same Murmur3(seed=42) HashPartitioning uses), making placement exact.
    remap = _murmur_preimages(spark, n_partitions)
    mapping = F.create_map(*[F.lit(x) for kv in remap.items() for x in kv])
    with_part = with_part.withColumn("_pkey", mapping[F.col("_pid")])
    return with_part.repartition(n_partitions, "_pkey").drop(
        "_bkt", "_off", "_cum", "_pid", "_pkey"
    )


def _murmur_preimages(spark, n: int) -> dict[int, int]:
    """pid -> int v with pmod(murmur3_hash(v), n) == pid, found by scanning
    a small candidate range with the engine's own F.hash (identical to
    HashPartitioning's partition-id expression). O(n) driver work."""
    out: dict[int, int] = {}
    lo = 0
    while len(out) < n:
        cand = spark.range(lo, lo + max(4096, 64 * n)).select(
            F.col("id").cast("int").alias("v"),
            F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("p"),
        )
        for r in cand.groupBy("p").agg(F.min("v").alias("v")).collect():
            out.setdefault(int(r["p"]), int(r["v"]))
        lo += max(4096, 64 * n)
    return out


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
