"""Gap-fill for windowed/tiered series: generate the complete window grid
per key (sequence + explode = no driver loop), left-join observed windows,
then fill by LOCF (last observation carried forward) and/or linear
interpolation between the bracketing observations — all window functions,
no UDF. North-star requirement: "gap-fill via interval interpolation".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill(df: DataFrame, keys: list[str], window_col: str = "window_id",
            value_cols: list[str] | None = None, mode: str = "linear",
            max_span: int | None = 2_000_000) -> DataFrame:
    """Fill missing ``window_col`` slots per key group.

    mode: 'locf' | 'linear'. Adds ``<col>_filled`` plus ``is_gap`` flag.
    The full grid spans min..max observed window per key.

    ``max_span`` bounds the per-key grid explode (VERDICT r03 #6): a
    single key with a pathological hole (e.g. a multi-year gap at 1m
    windows) would otherwise materialize its whole span in ONE explode —
    an executor-memory hazard no partitioning can save. Keys whose span
    exceeds the cap raise a clear task error naming the key rather than
    OOMing; pass ``max_span=None`` to opt out (bounded tiers, trusted
    input). The default (2M windows ≈ 4 years of 1m windows) costs ~16 MB
    of exploded longs per key — safe at any executor size."""
    value_cols = value_cols or ["mean"]
    span = df.groupBy(*keys).agg(
        F.min(window_col).alias("_lo"), F.max(window_col).alias("_hi")
    )
    lo = F.col("_lo")
    if max_span is not None:
        key_str = F.concat_ws("/", *[F.col(k).cast("string") for k in keys])
        msg = F.concat(
            F.lit("gapfill: window span "),
            (F.col("_hi") - F.col("_lo") + 1).cast("string"),
            F.lit(f" exceeds max_span={max_span} for key "), key_str,
            F.lit("; chunk the input or raise max_span"),
        )
        lo = F.when(F.col("_hi") - F.col("_lo") + 1 > F.lit(max_span),
                    F.raise_error(msg).cast(df.schema[window_col].dataType)
                    ).otherwise(lo)
    grid = span.select(
        *keys, F.explode(F.sequence(lo, F.col("_hi"))).alias(window_col)
    )
    j = grid.join(df, keys + [window_col], "left")
    out = j.withColumn("is_gap", F.col(value_cols[0]).isNull())
    w_prev = Window.partitionBy(*keys).orderBy(window_col).rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.partitionBy(*keys).orderBy(window_col).rowsBetween(0, Window.unboundedFollowing)
    for c in value_cols:
        prev_v = F.last(F.col(c), ignorenulls=True).over(w_prev)
        if mode == "locf":
            out = out.withColumn(f"{c}_filled", prev_v)
            continue
        prev_t = F.last(F.when(F.col(c).isNotNull(), F.col(window_col)), ignorenulls=True).over(w_prev)
        next_v = F.first(F.col(c), ignorenulls=True).over(w_next)
        next_t = F.first(F.when(F.col(c).isNotNull(), F.col(window_col)), ignorenulls=True).over(w_next)
        frac = (F.col(window_col) - prev_t) / (next_t - prev_t)
        interp = F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
            F.when(prev_t.isNull(), next_v)
            .when(next_t.isNull(), prev_v)
            .otherwise(prev_v + (next_v - prev_v) * frac)
        )
        out = out.withColumn(f"{c}_filled", interp)
    return out
