"""Golden parity tests: our from-scratch kernels vs the reference's
published golden values (reference tests/test_*.py, values also tabulated in
FIXTURES.md §3). Pure NumPy — no Spark session needed."""

from math import isclose

import numpy as np
import pandas as pd
import pytest

from tsfeatures_spark.kernels import FEATURES, compute_features
from tsfeatures_spark.kernels.features import (
    acf_features,
    arch_stat,
    crossing_points,
    entropy,
    flat_spots,
    holt_parameters,
    intervals,
    lumpiness,
    pacf_features,
    sparsity,
    stability,
    statistics,
)
from tsfeatures_spark.kernels.fixtures import USAccDeaths, WWWusage


def test_acf_features_seasonal():
    z = acf_features(USAccDeaths, 12)
    assert isclose(z["x_acf1"], 0.70, abs_tol=0.01)
    assert isclose(z["x_acf10"], 1.20, abs_tol=0.01)
    assert isclose(z["diff1_acf1"], 0.023, abs_tol=0.01)
    assert isclose(z["diff1_acf10"], 0.27, abs_tol=0.01)
    assert isclose(z["diff2_acf1"], -0.48, abs_tol=0.01)
    assert isclose(z["diff2_acf10"], 0.74, abs_tol=0.01)
    assert isclose(z["seas_acf1"], 0.62, abs_tol=0.01)


def test_acf_features_non_seasonal():
    z = acf_features(WWWusage, 1)
    assert isclose(z["x_acf1"], 0.96, abs_tol=0.01)
    assert isclose(z["x_acf10"], 4.19, abs_tol=0.01)
    assert isclose(z["diff1_acf1"], 0.79, abs_tol=0.01)
    assert isclose(z["diff1_acf10"], 1.40, abs_tol=0.01)
    assert isclose(z["diff2_acf1"], 0.17, abs_tol=0.01)
    assert isclose(z["diff2_acf10"], 0.33, abs_tol=0.01)


def test_arch_stat():
    assert isclose(arch_stat(USAccDeaths, 12)["arch_lm"], 0.54, abs_tol=0.01)
    assert isclose(arch_stat(WWWusage, 12)["arch_lm"], 0.98, abs_tol=0.01)


def test_holt_parameters():
    z = holt_parameters(USAccDeaths, 12)
    assert isclose(z["alpha"], 0.96, abs_tol=0.07)
    assert isclose(z["beta"], 0.00, abs_tol=0.1)
    z = holt_parameters(WWWusage, 1)
    assert isclose(z["alpha"], 0.99, abs_tol=0.02)
    assert isclose(z["beta"], 0.99, abs_tol=0.02)


def test_sparsity_scaled_and_unscaled():
    z = np.zeros(10)
    z[-1] = 1
    assert compute_features(z, 7, ["sparsity"], scale=True)["sparsity"] == 0.0
    assert compute_features(z, 7, ["sparsity"], scale=False)["sparsity"] == 0.9


def test_pacf_smoke():
    rng = np.random.default_rng(42)
    pacf_features(rng.normal(size=15), 7)


def test_small_series_no_crash():
    # n=2 and n=1 through every registered kernel (reference test_small_ts)
    for n in (2, 1):
        z = np.zeros(n)
        z[-1] = 1
        out = compute_features(z, 12, list(FEATURES), scale=False)
        assert isinstance(out, dict) and len(out) > 0


def test_purity_feature_order_invariance():
    # reference test_mutability: result must not depend on kernel order
    z = np.zeros(100)
    z[-1] = 1
    names = ["sparsity", "intervals", "acf_features", "crossing_points", "stability"]
    a = compute_features(z, 7, names, scale=False)
    b = compute_features(z, 7, list(reversed(names)), scale=False)
    for k in a:
        va, vb = a[k], b[k]
        assert (np.isnan(va) and np.isnan(vb)) or va == vb, k


def test_kernels_do_not_mutate_input():
    z = np.zeros(50)
    z[::3] = 2.0
    for name, (kernel, _) in FEATURES.items():
        before = z.copy()
        try:
            kernel(z, 7)
        except Exception:
            pass
        np.testing.assert_array_equal(z, before, err_msg=f"{name} mutated input")


def test_statistics_vs_numpy():
    x = WWWusage
    s = statistics(x)
    assert s["total_sum"] == float(np.sum(x))
    assert s["variance"] == float(np.var(x, ddof=1))
    assert s["median"] == float(np.median(x))
    assert s["p25"] == float(np.quantile(x, 0.25))


def test_flat_spots_matches_pandas_cut():
    x = WWWusage
    cutx = pd.cut(x, bins=10, include_lowest=True, labels=False)
    # longest run computed directly
    best = cur = 1
    for i in range(1, len(cutx)):
        cur = cur + 1 if cutx[i] == cutx[i - 1] else 1
        best = max(best, cur)
    assert flat_spots(x)["flat_spots"] == float(best)


def test_crossing_points_known():
    x = np.array([1.0, 3.0, 1.0, 3.0, 1.0])  # median 1? median=1.0... crossings
    m = np.median(x)
    ab = x <= m
    expected = float(np.sum(ab[:-1] ^ ab[1:]))
    assert crossing_points(x)["crossing_points"] == expected


def test_stability_lumpiness_tiling_rules():
    # n < 2*width -> 0
    assert stability(np.arange(15.0), 1)["stability"] == 0.0
    assert lumpiness(np.arange(15.0), 1)["lumpiness"] == 0.0
    # width=10 (freq 1), trailing partial tile dropped
    x = np.arange(25.0)
    tiles = x[:20].reshape(2, 10)
    exp_stab = float(np.var(tiles.mean(axis=1), ddof=1))
    exp_lump = float(np.var(tiles.var(axis=1, ddof=1), ddof=1))
    assert isclose(stability(x, 1)["stability"], exp_stab, rel_tol=1e-12)
    assert isclose(lumpiness(x, 1)["lumpiness"], exp_lump, rel_tol=1e-12)


def test_intervals_run_lengths():
    x = np.array([0.0, 2.0, 3.0, 0.0, 5.0, 0.0, 0.0, 7.0, 7.0, 7.0])
    z = intervals(x)
    runs = np.array([2.0, 1.0, 3.0])
    assert isclose(z["intervals_mean"], runs.mean(), rel_tol=1e-12)
    assert isclose(z["intervals_sd"], runs.std(ddof=1), rel_tol=1e-12)


def test_entropy_range():
    e1 = entropy(WWWusage)["entropy"]
    assert 0.0 < e1 < 1.0
    rng = np.random.default_rng(0)
    e2 = entropy(rng.normal(size=1000))["entropy"]
    assert e2 > e1  # white noise has higher spectral entropy than smooth series


def test_degenerate_inputs_emit_nan_not_crash():
    cases = [np.zeros(30), np.ones(30), np.array([]), np.full(30, np.nan)]
    for x in cases:
        out = compute_features(x, 12, list(FEATURES), scale=False)
        assert isinstance(out, dict)
