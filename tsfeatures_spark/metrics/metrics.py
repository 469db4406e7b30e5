"""Forecast-evaluation metrics, fully SQL-native (no UDF).

Parity: reference tsfeatures/metrics/metrics.py:19-245. The reference
evaluates per-uid NumPy arrays in a process pool (metrics.py:340-341); here
each metric is a Column expression over an equi-joined panel, so the whole
evaluation is one shuffle + one partial-aggregated groupBy.

``evaluate_panel(y_test, y_hat, ...)`` mirrors the reference entry point
(metrics.py:275-345) and returns (unique_id, error).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AVAILABLE_METRICS = ["mse", "rmse", "mape", "smape", "mase", "rmsse", "mini_owa", "pinball_loss"]


def mse_expr(y: str = "y", y_hat: str = "y_hat") -> Column:
    return F.avg(F.pow(F.col(y) - F.col(y_hat), 2))


def rmse_expr(y: str = "y", y_hat: str = "y_hat") -> Column:
    return F.sqrt(mse_expr(y, y_hat))


def mape_expr(y: str = "y", y_hat: str = "y_hat") -> Column:
    # y == 0 -> NaN that poisons the mean, matching np.mean of 0/0 under the
    # reference's global seterr(ignore) (metrics.py:88 + utils.py:9); ANSI
    # Spark would otherwise raise DIVIDE_BY_ZERO
    ratio = F.when(F.col(y) == 0, F.lit(float("nan"))).otherwise(
        F.abs(F.col(y) - F.col(y_hat)) / F.abs(F.col(y))
    )
    return 100.0 * F.avg(ratio)


def smape_expr(y: str = "y", y_hat: str = "y_hat") -> Column:
    # zero denominators clamped to 1e-3 (reference metrics.py:116-117)
    scale = F.abs(F.col(y)) + F.abs(F.col(y_hat))
    scale = F.when(scale == 0, F.lit(1e-3)).otherwise(scale)
    return 200.0 * F.avg(F.abs(F.col(y) - F.col(y_hat)) / scale)


def pinball_expr(y: str = "y", y_hat: str = "y_hat", tau: float = 0.5) -> Column:
    d = F.col(y) - F.col(y_hat)
    return F.avg(F.greatest(tau * d, (tau - 1) * d))


def _seasonal_scale(y_train: DataFrame, seasonality: int, squared: bool,
                    id_col: str, time_col: str, value_col: str) -> DataFrame:
    """Per-uid mean (abs|sq) seasonal-naive train error (metrics.py:149,176),
    window-native lag(seasonality)."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(time_col)
    lagged = y_train.withColumn("_lag", F.lag(value_col, seasonality).over(w)).where(F.col("_lag").isNotNull())
    err = F.col(value_col) - F.col("_lag")
    agg = F.avg(err * err) if squared else F.avg(F.abs(err))
    return lagged.groupBy(id_col).agg(agg.alias("_scale"))


def validate_panel(y_test: DataFrame, y_hat: DataFrame, id_col: str = "unique_id") -> None:
    """Distributed equivalent of the reference's eager input checks
    (metrics.py:321-322): equal row counts and equal uid sets. One extra
    job (full-outer join of two partial-aggregated per-uid counts)."""
    t = y_test.groupBy(id_col).agg(F.count(F.lit(1)).alias("_nt"))
    h = y_hat.groupBy(id_col).agg(F.count(F.lit(1)).alias("_nh"))
    row = (
        t.join(h, id_col, "full_outer")
        .agg(
            F.sum(F.when(F.col("_nt").isNull() | F.col("_nh").isNull(), 1).otherwise(0)).alias("uid_mismatch"),
            (F.sum(F.coalesce(F.col("_nt"), F.lit(0))) - F.sum(F.coalesce(F.col("_nh"), F.lit(0)))).alias("len_diff"),
        )
        .collect()[0]
    )
    if row["uid_mismatch"]:
        raise ValueError("not same u_ids")  # reference metrics.py:322
    if row["len_diff"] != 0:
        raise ValueError("not same length")  # reference metrics.py:321


def _nan_if_null(c: Column) -> Column:
    """Missing seasonal scale (train span < seasonality) -> NaN, matching
    the reference's np.mean(empty)=NaN propagation (metrics.py:149)."""
    return F.when(c.isNull(), F.lit(float("nan"))).otherwise(c)


def _ieee_div(num: Column, den: Column) -> Column:
    """NumPy float-division semantics under Spark-4 ANSI mode (which raises
    DIVIDE_BY_ZERO even for doubles): x/0 -> signed inf, 0/0 -> NaN — so a
    zero seasonal scale yields inf MASE exactly as the reference's
    np.mean(...)/0.0 does (metrics.py:150), instead of failing the job.
    CASE branches are evaluated lazily, so the raw division never sees a
    zero divisor."""
    return (
        F.when(den == 0,
               F.when(num == 0, F.lit(float("nan")))
                .when(num > 0, F.lit(float("inf")))
                .otherwise(F.lit(float("-inf"))))
        .otherwise(num / den)
    )


def evaluate_panel(
    y_test: DataFrame,
    y_hat: DataFrame,
    metric: str,
    y_train: DataFrame | None = None,
    seasonality: int | None = None,
    y_bench: DataFrame | None = None,
    id_col: str = "unique_id",
    time_col: str = "ds",
    validate: bool = True,
) -> DataFrame:
    """(unique_id, error) per series. Equi-join on (uid, ds) + native agg —
    the reference's index-probe loop (metrics.py:324-341) becomes one
    broadcast/sort-merge join Catalyst is free to reorder.

    ``validate=True`` replicates the reference's input asserts
    (metrics.py:321-322) with one extra aggregate job; pass False to skip
    the pass at very large scale when inputs are known-aligned."""
    if metric not in AVAILABLE_METRICS:
        raise ValueError(f"unknown metric {metric}; available: {AVAILABLE_METRICS}")
    if validate:
        validate_panel(y_test, y_hat, id_col)
    j = y_test.join(y_hat, [id_col, time_col])
    if metric == "mse":
        return j.groupBy(id_col).agg(mse_expr().alias("error"))
    if metric == "rmse":
        return j.groupBy(id_col).agg(rmse_expr().alias("error"))
    if metric == "mape":
        return j.groupBy(id_col).agg(mape_expr().alias("error"))
    if metric == "smape":
        return j.groupBy(id_col).agg(smape_expr().alias("error"))
    if metric == "pinball_loss":
        return j.groupBy(id_col).agg(pinball_expr().alias("error"))
    if metric in ("mase", "rmsse"):
        assert y_train is not None and seasonality is not None
        scale = _seasonal_scale(y_train, seasonality, metric == "rmsse", id_col, time_col, "y")
        base = j.groupBy(id_col).agg(
            (mse_expr() if metric == "rmsse" else F.avg(F.abs(F.col("y") - F.col("y_hat")))).alias("_err")
        )
        # LEFT join: a series whose train span < seasonality has no scale row;
        # the reference yields NaN for it (np.mean of an empty diff,
        # metrics.py:149/176) — an inner join would silently drop the series.
        out = base.join(F.broadcast(scale), id_col, "left")
        sc = _nan_if_null(F.col("_scale"))
        ratio = _ieee_div(F.col("_err"), sc)
        e = F.sqrt(ratio) if metric == "rmsse" else ratio
        return out.select(id_col, (100.0 * e).alias("error"))
    if metric == "mini_owa":
        assert y_train is not None and seasonality is not None and y_bench is not None
        scale = _seasonal_scale(y_train, seasonality, False, id_col, time_col, "y")
        model = j.groupBy(id_col).agg(
            F.avg(F.abs(F.col("y") - F.col("y_hat"))).alias("_mae_m"), smape_expr().alias("_smape_m")
        )
        jb = y_test.join(y_bench.withColumnRenamed("y_hat", "_yb"), [id_col, time_col])
        bench = jb.groupBy(id_col).agg(
            F.avg(F.abs(F.col("y") - F.col("_yb"))).alias("_mae_b"),
            smape_expr("y", "_yb").alias("_smape_b"),
        )
        # Reference computes OWA through the actual MASE values
        # (metrics.py:213-216): the seasonal scale cancels algebraically in
        # mase_m/mase_b ONLY when it is finite — a missing/NaN scale must
        # propagate NaN into the ratio exactly as NaN/NaN does in NumPy.
        out = model.join(bench, id_col).join(F.broadcast(scale), id_col, "left")
        sc = _nan_if_null(F.col("_scale"))
        mase_ratio = _ieee_div(_ieee_div(F.col("_mae_m"), sc), _ieee_div(F.col("_mae_b"), sc))
        owa = (mase_ratio + _ieee_div(F.col("_smape_m"), F.col("_smape_b"))) / 2.0
        return out.select(id_col, owa.alias("error"))
    raise AssertionError("unreachable")
