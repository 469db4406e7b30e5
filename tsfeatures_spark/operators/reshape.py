"""Wide <-> long panel reshaping.

The reference ships a pandas ``wide_to_long`` ingestion step for M4-style
CSV panels (reference m4_data.py:56-131: V1..Vn value columns -> long
(unique_id, ds, y)). This module is the Spark-native equivalent in both
directions, built entirely from JVM-side primitives:

- ``wide_to_long``: one ``posexplode`` — no UDF, no shuffle (narrow).
- ``long_to_wide``: groupBy + ``array_sort(collect_list(struct(ds, y)))``
  so element order is deterministic regardless of partitioning — the one
  shuffle a long->wide pivot fundamentally needs.
- ``columns_to_array``: M4-CSV shape (V1..Vn columns, NULL-padded tails)
  -> a trimmed array column, for users arriving with the reference's
  literal file layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def wide_to_long(df: DataFrame, id_col: str = "doc_id", value_col: str = "tokens",
                 time_col: str = "ds", y_col: str = "y", base: int = 1) -> DataFrame:
    """(id, array) -> (id, ds, y) with ds = base, base+1, ... per element.
    Parity: reference m4_data.py:56-131 semantics (1-based ds)."""
    out = df.select(
        F.col(id_col),
        F.posexplode(F.col(value_col)).alias(time_col, y_col),
    )
    if base:
        out = out.withColumn(time_col, F.col(time_col) + base)
    return out


def long_to_wide(df: DataFrame, id_col: str = "unique_id", time_col: str = "ds",
                 value_col: str = "y", out_col: str = "tokens") -> DataFrame:
    """(id, ds, y) -> (id, array ordered by ds). ``collect_list`` order is
    partition-dependent, so the struct list is sorted by ds BEFORE the
    values are projected out — deterministic under any shuffle."""
    pairs = F.array_sort(F.collect_list(F.struct(F.col(time_col).alias("t"), F.col(value_col).alias("v"))))
    return df.groupBy(id_col).agg(F.transform(pairs, lambda s: s["v"]).alias(out_col))


def columns_to_array(df: DataFrame, id_col: str, value_cols: list[str],
                     out_col: str = "tokens") -> DataFrame:
    """V1..Vn wide columns (NULL-padded ragged tails, the reference's M4
    CSV layout) -> trimmed array column."""
    arr = F.array(*[F.col(c) for c in value_cols])
    return df.select(F.col(id_col), F.filter(arr, lambda x: x.isNotNull()).alias(out_col))
