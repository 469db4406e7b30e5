"""Forecast metrics: Spark SQL-native expressions vs the reference formulas
(metrics/metrics.py:19-245) evaluated in NumPy on a synthetic panel."""

import numpy as np
import pandas as pd
import pytest

from tsfeatures_spark.metrics import evaluate_panel


def _np_metrics(y, y_hat, y_train=None, s=1, y_bench=None):
    out = {
        "mse": np.mean((y - y_hat) ** 2),
        "rmse": np.sqrt(np.mean((y - y_hat) ** 2)),
        "mape": 100 * np.mean(np.abs(y - y_hat) / np.abs(y)),
        "pinball_loss": np.mean(np.maximum(0.5 * (y - y_hat), -0.5 * (y - y_hat))),
    }
    scale = np.abs(y) + np.abs(y_hat)
    scale[scale == 0] = 1e-3
    out["smape"] = 200 * np.mean(np.abs(y - y_hat) / scale)
    if y_train is not None:
        sc = np.mean(np.abs(y_train[s:] - y_train[:-s]))
        out["mase"] = 100 * np.mean(np.abs(y - y_hat)) / sc
        sc2 = np.mean((y_train[s:] - y_train[:-s]) ** 2)
        out["rmsse"] = 100 * np.sqrt(np.mean((y - y_hat) ** 2) / sc2)
    if y_bench is not None:
        sm_b = 200 * np.mean(np.abs(y - y_bench) / np.where(np.abs(y) + np.abs(y_bench) == 0, 1e-3, np.abs(y) + np.abs(y_bench)))
        mae_m, mae_b = np.mean(np.abs(y - y_hat)), np.mean(np.abs(y - y_bench))
        out["mini_owa"] = ((mae_m / mae_b) + (out["smape"] / sm_b)) / 2
    return out


@pytest.fixture(scope="module")
def panel():
    rng = np.random.default_rng(5)
    rows_test, rows_hat, rows_train, rows_bench = [], [], [], []
    expected = {}
    for uid in ["a", "b", "c"]:
        n_train, h, s = 60, 14, 7
        tr = 100 + np.cumsum(rng.normal(size=n_train))
        y = 100 + np.cumsum(rng.normal(size=h))
        yh = y + rng.normal(scale=2, size=h)
        yb = y + rng.normal(scale=4, size=h)
        y[3] = 0.0
        yh[3] = 0.0  # exercise the smape zero clamp
        expected[uid] = _np_metrics(y, yh, tr, s, yb)
        rows_train += [(uid, i, float(v)) for i, v in enumerate(tr)]
        rows_test += [(uid, n_train + i, float(v)) for i, v in enumerate(y)]
        rows_hat += [(uid, n_train + i, float(v)) for i, v in enumerate(yh)]
        rows_bench += [(uid, n_train + i, float(v)) for i, v in enumerate(yb)]
    return expected, rows_test, rows_hat, rows_train, rows_bench


@pytest.mark.parametrize("metric", ["mse", "rmse", "mape", "smape", "pinball_loss", "mase", "rmsse", "mini_owa"])
def test_metric_matches_reference_formula(spark, panel, metric):
    expected, rt, rh, rtr, rb = panel
    y_test = spark.createDataFrame(pd.DataFrame(rt, columns=["unique_id", "ds", "y"]))
    y_hat = spark.createDataFrame(pd.DataFrame(rh, columns=["unique_id", "ds", "y_hat"]))
    y_train = spark.createDataFrame(pd.DataFrame(rtr, columns=["unique_id", "ds", "y"]))
    y_bench = spark.createDataFrame(pd.DataFrame(rb, columns=["unique_id", "ds", "y_hat"]))
    out = evaluate_panel(y_test, y_hat, metric, y_train=y_train, seasonality=7, y_bench=y_bench)
    got = {r.unique_id: r.error for r in out.collect()}
    for uid, exp in expected.items():
        g, e = got[uid], exp[metric]
        assert (np.isnan(g) and np.isnan(e)) or np.isclose(g, e, rtol=1e-9), (uid, metric, g, e)


def test_unknown_metric_raises(spark, panel):
    _, rt, rh, *_ = panel
    y_test = spark.createDataFrame(pd.DataFrame(rt, columns=["unique_id", "ds", "y"]))
    y_hat = spark.createDataFrame(pd.DataFrame(rh, columns=["unique_id", "ds", "y_hat"]))
    with pytest.raises(ValueError, match="unknown metric"):
        evaluate_panel(y_test, y_hat, "nope")
