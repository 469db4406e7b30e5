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


def evaluate_panel(
    y_test: DataFrame,
    y_hat: DataFrame,
    metric: str,
    y_train: DataFrame | None = None,
    seasonality: int | None = None,
    y_bench: DataFrame | None = None,
    id_col: str = "unique_id",
    time_col: str = "ds",
) -> DataFrame:
    """(unique_id, error) per series. Equi-join on (uid, ds) + native agg —
    the reference's index-probe loop (metrics.py:324-341) becomes one
    broadcast/sort-merge join Catalyst is free to reorder."""
    if metric not in AVAILABLE_METRICS:
        raise ValueError(f"unknown metric {metric}; available: {AVAILABLE_METRICS}")
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
        out = base.join(F.broadcast(scale), id_col)
        e = F.sqrt(F.col("_err") / F.col("_scale")) if metric == "rmsse" else F.col("_err") / F.col("_scale")
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
        out = model.join(bench, id_col).join(F.broadcast(scale), id_col)
        owa = ((F.col("_mae_m") / F.col("_mae_b")) + (F.col("_smape_m") / F.col("_smape_b"))) / 2.0
        return out.select(id_col, owa.alias("error"))
    raise AssertionError("unreachable")
