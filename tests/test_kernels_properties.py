"""Property tests for the kernel library (pure NumPy, no Spark):
bounded outputs, scale/shift invariances the math implies, and
cross-implementation consistency checks."""

import numpy as np
import pytest

from tsfeatures_spark.kernels import FEATURES, compute_features
from tsfeatures_spark.kernels import stats as st

RNG = np.random.default_rng(123)
SERIES = [
    RNG.normal(size=50),
    np.cumsum(RNG.normal(size=200)),
    RNG.poisson(3, size=120).astype(float),
    np.sin(np.arange(144) * 2 * np.pi / 12) * 10 + RNG.normal(size=144),
    np.concatenate([np.zeros(30), RNG.normal(5, 1, 40)]),
]


@pytest.mark.parametrize("i", range(len(SERIES)))
def test_acf_bounded(i):
    acf = st.acf_biased(SERIES[i], 10)
    assert np.all(np.abs(acf[np.isfinite(acf)]) <= 1.0 + 1e-12)
    assert acf[0] == 1.0


@pytest.mark.parametrize("i", range(len(SERIES)))
def test_pacf_lag1_equals_acf1(i):
    # Levinson-Durbin's first coefficient IS the lag-1 autocorrelation
    assert np.isclose(st.pacf_ldb(SERIES[i], 5)[1], st.acf_biased(SERIES[i], 1)[1], rtol=1e-10)


@pytest.mark.parametrize("i", range(len(SERIES)))
def test_entropy_in_unit_interval(i):
    e = st.spectral_entropy_normalized(SERIES[i])
    assert 0.0 <= e <= 1.0


def test_entropy_white_noise_near_one():
    e = st.spectral_entropy_normalized(RNG.normal(size=4096))
    assert e > 0.9


def test_acf_shift_invariant_scale_invariant():
    x = SERIES[1]
    a = st.acf_biased(x, 10)
    b = st.acf_biased(x * 7.5 + 100.0, 10)
    np.testing.assert_allclose(a, b, rtol=1e-9)


def test_hurst_random_walk_near_one_noise_near_half():
    rw = np.cumsum(RNG.normal(size=4000))
    wn = RNG.normal(size=4000)
    assert st.hurst_exponent(rw) > 0.85
    assert 0.3 < st.hurst_exponent(wn) < 0.75


def test_kpss_positive():
    for x in SERIES:
        n = len(x)
        v = st.kpss_stat(x, int(4 * (n / 100) ** 0.25))
        assert v > 0 or np.isnan(v)


def test_fminbound_quadratic():
    x, fx = st.fminbound(lambda t: (t - 0.7) ** 2 + 3, -1, 2)
    assert abs(x - 0.7) < 1e-4 and abs(fx - 3) < 1e-8



def test_all_kernels_finite_or_nan_on_random_series():
    # no kernel may raise or return inf through the dispatcher
    for x in SERIES:
        for freq in (1, 12):
            out = compute_features(x, freq, list(FEATURES), scale=False)
            for k, v in out.items():
                assert not np.isinf(v), (k, v)


def test_embed_matches_manual():
    x = np.arange(10.0)
    m = st.embed(x, 3)
    assert m.shape == (8, 3)
    np.testing.assert_array_equal(m[0], [2.0, 1.0, 0.0])
    np.testing.assert_array_equal(m[-1], [9.0, 8.0, 7.0])


def test_statistics_translation():
    x = SERIES[0]
    from tsfeatures_spark.kernels.features import statistics

    a = statistics(x)
    b = statistics(x + 1000.0)
    assert np.isclose(b["mean"] - a["mean"], 1000.0)
    assert np.isclose(b["variance"], a["variance"], rtol=1e-9)


def test_stl_decomposition_regimes():
    """STL feature sanity across known regimes (loess STL + supsmu-lite)."""
    from tsfeatures_spark.kernels.features import stl_features
    from tsfeatures_spark.kernels.fixtures import USAccDeaths

    rng = np.random.default_rng(0)
    n, m = 240, 12
    t = np.arange(n)
    seasonal = 50 * np.sin(2 * np.pi * t / m)
    noise = rng.normal(0, 2, n)

    f = stl_features(100 + 0.5 * t + seasonal + noise, m)
    assert f["trend"] > 0.95 and f["seasonal_strength"] > 0.95
    assert f["peak"] == 4.0 and f["trough"] == 10.0  # sin peak t=3 -> pos 4

    f_noise = stl_features(rng.normal(size=n), m)
    assert f_noise["trend"] < 0.3 and f_noise["seasonal_strength"] < 0.4

    f_trend = stl_features(100 + 2 * t + noise, m)
    assert f_trend["trend"] > 0.99 and f_trend["seasonal_strength"] < 0.4

    # freq=1 supersmoother path
    assert stl_features(100 + 0.5 * t + noise, 1)["trend"] > 0.95
    assert stl_features(rng.normal(size=n), 1)["trend"] < 0.3

    # classic dataset: July peak / February trough of US accidental deaths
    fu = stl_features(USAccDeaths, 12)
    assert fu["peak"] == 7.0 and fu["trough"] == 2.0
    assert 0.7 < fu["trend"] < 1.0 and fu["seasonal_strength"] > 0.9


def test_heterogeneity_discriminates_garch():
    from tsfeatures_spark.kernels.features import heterogeneity

    rng = np.random.default_rng(5)
    n = 500
    om, al, be = 0.2, 0.25, 0.65
    h = np.empty(n)
    e = np.empty(n)
    h[0] = om / (1 - al - be)
    for t in range(n):
        if t:
            h[t] = om + al * e[t - 1] ** 2 + be * h[t - 1]
        e[t] = rng.normal() * np.sqrt(h[t])
    f_garch = heterogeneity(e, 1)
    f_wn = heterogeneity(rng.normal(size=n), 1)
    assert f_garch["arch_r2"] > 3 * f_wn["arch_r2"]
    assert f_garch["arch_acf"] > 3 * f_wn["arch_acf"]


def test_pdcut_codes_match_pandas_cut():
    import pandas as pd

    from tsfeatures_spark.kernels.features import _pdcut_codes

    rng = np.random.default_rng(11)
    cases = [
        rng.normal(size=200),
        np.round(rng.normal(size=200) * 50, 2),        # 2-decimal grid
        rng.integers(0, 50000, size=300).astype(float),  # token-like
        np.full(50, 7.0),                               # constant
        np.full(50, 0.0),                               # constant zero
        np.array([1.0, 2.0]),
        np.linspace(0, 1, 11),                          # values ON bin edges
    ]
    for x in cases:
        exp = pd.cut(x, bins=10, include_lowest=True, labels=False)
        got = _pdcut_codes(x, 10)
        assert np.array_equal(np.asarray(exp), got), x[:5]
