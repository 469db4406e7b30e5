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


def _panel_df(spark, uid, ds, y, colname="y"):
    return spark.createDataFrame(
        pd.DataFrame({"unique_id": uid, "ds": ds, colname: y})
    )


def test_evaluate_panel_validation_raises_reference_errors(spark):
    """Reference metrics.py:321-322 asserts equal lengths and uid sets;
    the distributed check must raise the same messages."""
    t = _panel_df(spark, ["a"] * 3 + ["b"] * 3, [1, 2, 3] * 2, [1.0] * 6)
    h_short = _panel_df(spark, ["a"] * 3 + ["b"] * 2, [1, 2, 3, 1, 2], [1.0] * 5, "y_hat")
    with pytest.raises(ValueError, match="not same length"):
        evaluate_panel(t, h_short, "mse")
    h_wrong_uid = _panel_df(spark, ["a"] * 3 + ["c"] * 3, [1, 2, 3] * 2, [1.0] * 6, "y_hat")
    with pytest.raises(ValueError, match="not same u_ids"):
        evaluate_panel(t, h_wrong_uid, "mse")
    # matched panels evaluate unchanged
    h_ok = _panel_df(spark, ["a"] * 3 + ["b"] * 3, [1, 2, 3] * 2, [1.5] * 6, "y_hat")
    out = evaluate_panel(t, h_ok, "mse").toPandas()
    assert len(out) == 2 and np.allclose(out["error"], 0.25)


def test_scaled_metrics_nan_for_short_train_span(spark):
    """Series whose train span < seasonality: the reference's seasonal-naive
    scale is np.mean of an EMPTY diff = NaN -> mase/rmsse/mini_owa NaN.
    An inner join would silently DROP the series instead."""
    uid = ["ok"] * 30 + ["short"] * 4 + ["flat"] * 30
    ds_tr = list(range(1, 31)) + [1, 2, 3, 4] + list(range(1, 31))
    y_tr = [i % 7 + 0.1 * i for i in range(30)] + [1.0, 2.0, 3.0, 4.0] + [5.0] * 30
    train = _panel_df(spark, uid, ds_tr, y_tr)
    uid_t = ["ok", "ok", "short", "short", "flat", "flat"]
    test = _panel_df(spark, uid_t, [31, 32, 5, 6, 31, 32], [3.0, 4.0, 5.0, 6.0, 5.0, 5.0])
    hat = _panel_df(spark, uid_t, [31, 32, 5, 6, 31, 32], [2.5, 4.5, 5.5, 6.5, 4.0, 6.0], "y_hat")
    bench = _panel_df(spark, uid_t, [31, 32, 5, 6, 31, 32], [2.0, 5.0, 4.0, 7.0, 3.0, 7.0], "y_hat")
    for metric in ("mase", "rmsse", "mini_owa"):
        out = evaluate_panel(
            test, hat, metric, y_train=train, seasonality=7,
            y_bench=bench if metric == "mini_owa" else None,
        ).toPandas().set_index("unique_id")["error"]
        assert set(out.index) == {"ok", "short", "flat"}, f"{metric} dropped a series"
        assert np.isfinite(out["ok"]), metric
        assert np.isnan(out["short"]), f"{metric} must be NaN for short train span"
        if metric in ("mase", "rmsse"):
            # constant train -> zero seasonal scale -> inf, as np.mean/0.0
            assert np.isinf(out["flat"]), f"{metric} must be inf for zero scale"
        else:
            # mini_owa: inf/inf mase ratio -> NaN (NumPy semantics)
            assert np.isnan(out["flat"])
