"""As-of join — the time-series join Spark lacks as a native operator.

For every left row, attach the most recent right row (per key) with
right_time <= left_time (direction='backward'; 'forward' mirrors it).
Classic uses over the token/event tables: attach the latest completed
hourly rollup mark to each raw event, join quotes to trades, align a
slowly-changing dimension to a fast stream.

Scale-first composition — NO range/cross join, NO per-key loop:
    1. UNION the two sides tagged with a side bit (left=0, right=1),
       right rows carrying only (keys, time, value columns).
    2. ONE window per key ordered by (time, side): ``last(value,
       ignorenulls=True)`` propagates the latest right values onto every
       subsequent row of the same key.
    3. Keep the left rows; enforce ``tolerance`` by nulling matches whose
       time gap exceeds it.
Cost = one hash shuffle of |L|+|R| rows on the key + one sort — the same
cost as the groupBy the join feeds, and it inherits AQE skew splitting.
The window never holds state beyond the running "last right values", so
no per-key materialization blows up on hot keys.

DuckDB's native ASOF JOIN is the independent oracle in the driver gate;
pandas.merge_asof pins the semantics in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_time: str,
    right_time: str | None = None,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: int | float | None = None,
    allow_exact_matches: bool = True,
    matched_time_col: str = "matched_time",
) -> DataFrame:
    """Left as-of join. ``value_cols`` default to every right column that
    is neither a key nor the time; they must not collide with left column
    names (rename upstream). Returns every left row + the matched right
    value columns (NULL when no match / outside tolerance) + the matched
    right time as ``matched_time_col``."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    right_time = right_time or left_time
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(keys) | {right_time}]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right value columns collide with left: {sorted(clash)}")

    l_tag = left.withColumn("_t", F.col(left_time)).withColumn("_side", F.lit(0))
    r_tag = right.select(
        *keys, F.col(right_time).alias("_t"), *value_cols
    ).withColumn("_side", F.lit(1))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # At equal times the right row must be visible iff exact matches are
    # allowed: order the side bit so right sorts before (allowed) or after
    # (disallowed) the left row at the same timestamp.
    side_order = F.col("_side").desc() if allow_exact_matches else F.col("_side").asc()
    t_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(t_order, side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Propagate the matched right row ATOMICALLY (one struct), not column
    # by column: per-column last(ignorenulls) would skip a NULL field of
    # the true match and leak the value of an OLDER right row — a torn row
    # that can also smuggle stale values past the tolerance check.
    row_struct = F.when(
        F.col("_side") == 1,
        F.struct(F.col("_t").alias("_rt"), *[F.col(c) for c in value_cols]),
    )
    filled = u.withColumn("_match", F.last(row_struct, ignorenulls=True).over(w))
    out = filled.where(F.col("_side") == 0)
    for c in value_cols:
        out = out.withColumn(c, F.col(f"_match.{c}"))
    out = out.withColumn(matched_time_col, F.col("_match._rt")).drop("_match")
    if tolerance is not None:
        gap = (
            F.col("_t") - F.col(matched_time_col)
            if direction == "backward"
            else F.col(matched_time_col) - F.col("_t")
        )
        ok = gap <= F.lit(tolerance)
        for c in value_cols:
            out = out.withColumn(c, F.when(ok, F.col(c)))
        out = out.withColumn(matched_time_col, F.when(ok, F.col(matched_time_col)))
    return out.drop("_t", "_side")
