"""INDEPENDENT numeric contracts for the fit kernels (VERDICT r02 #4/#6).

statsmodels/R are not installable in this container, so foreign-library
golden values cannot be generated here. These tests certify the kernels'
*claims* directly instead, with evaluators written from the published
equations in THIS file (no engine code in the objective):

- holt_parameters / hw_parameters claim to MINIMIZE the one-step-ahead
  SSE of the standard (additive) exponential-smoothing recursions. The
  certificate: an independent Nelder-Mead multistart over the same box
  must not find a lower SSE than the kernel's returned parameters
  achieve under the independent evaluator. This is strictly stronger
  than matching another optimizer's output — it verifies optimality of
  the actual objective.
- stl_features claims a seasonal/trend/remainder decomposition; the
  certificate: exact reconstruction, near-zero seasonal mean, trend
  smoothness, strength formulas recomputed from the components, and
  remainder ACF recomputed with a from-scratch ACF.

heterogeneity stays documented-only (docs/COVERAGE.md): the reference's
own dependency pins make it unrunnable anywhere (SURVEY §2.6.9), and its
GARCH profile MLE has no closed property this container can certify.
"""

from __future__ import annotations

import numpy as np
import pytest

from tsfeatures_spark.kernels.features import (
    HOLT_CERT_ROUNDS,
    HW_CERT_ROUNDS,
    holt_parameters,
    hw_parameters,
    stl_features,
    _stl_decompose,
)
from tsfeatures_spark.kernels.fixtures import USAccDeaths, WWWusage


# --------------------------------------------------------------------------
# independent objective evaluators (standard additive ES equations)
# --------------------------------------------------------------------------

def holt_sse(y: np.ndarray, alpha: float, beta: float) -> float:
    """One-step-ahead SSE of additive-trend Holt with the SSE-optimal
    initial (l0, b0): the recursion is affine in the initial state, so
    three runs + least squares give the exact optimum (superposition)."""

    def errors(l0: float, b0: float) -> np.ndarray:
        L, B = l0, b0
        e = np.empty(len(y))
        for t, yt in enumerate(y):
            f = L + B
            e[t] = yt - f
            Ln = alpha * yt + (1 - alpha) * f
            B = beta * (Ln - L) + (1 - beta) * B
            L = Ln
        return e

    e0 = errors(0.0, 0.0)
    u = errors(1.0, 0.0) - e0
    v = errors(0.0, 1.0) - e0
    theta, *_ = np.linalg.lstsq(np.column_stack([u, v]), -e0, rcond=None)
    r = e0 + theta[0] * u + theta[1] * v
    return float(r @ r)


def hw_initials(y: np.ndarray, m: int):
    """The kernel's documented heuristic initial state, restated from the
    classical-decomposition formulas (NOT imported from the engine)."""
    n = len(y)
    seasons = y[: (n // m) * m].reshape(-1, m)
    s0 = (seasons - seasons.mean(axis=1, keepdims=True)).mean(axis=0)
    s0 = s0 - s0.mean()
    tt = np.arange(1.0, min(n, 2 * m) + 1.0)
    deseas = y[: len(tt)] - np.tile(s0, 3)[: len(tt)]
    slope, intercept = np.polyfit(tt, deseas, 1)
    return intercept, slope, s0


def hw_sse(y: np.ndarray, m: int, a: float, b: float, g: float) -> float:
    """One-step-ahead SSE of additive Holt-Winters from the heuristic
    initial state (standard equations)."""
    L, B, s0 = hw_initials(y, m)
    S = s0.copy()
    sse = 0.0
    for t, yt in enumerate(y):
        j = t % m
        e = yt - (L + B + S[j])
        sse += e * e
        Ln = a * (yt - S[j]) + (1 - a) * (L + B)
        B = b * (Ln - L) + (1 - b) * B
        S[j] = g * (yt - Ln) + (1 - g) * S[j]
        L = Ln
    return float(sse)


def nelder_mead(f, x0: np.ndarray, lo: float, hi: float, iters: int = 200) -> float:
    """Minimal textbook Nelder-Mead with box clipping; returns best f."""
    n = len(x0)
    simplex = [np.clip(x0, lo, hi)]
    for i in range(n):
        p = x0.copy()
        p[i] = np.clip(p[i] + 0.15, lo, hi)
        if p[i] == x0[i]:
            p[i] = np.clip(p[i] - 0.15, lo, hi)
        simplex.append(p)
    simplex = np.array(simplex)
    fv = np.array([f(np.clip(p, lo, hi)) for p in simplex])
    for _ in range(iters):
        o = np.argsort(fv)
        simplex, fv = simplex[o], fv[o]
        c = simplex[:-1].mean(axis=0)
        xr = np.clip(c + (c - simplex[-1]), lo, hi)
        fr = f(xr)
        if fr < fv[0]:
            xe = np.clip(c + 2 * (c - simplex[-1]), lo, hi)
            fe = f(xe)
            simplex[-1], fv[-1] = (xe, fe) if fe < fr else (xr, fr)
        elif fr < fv[-2]:
            simplex[-1], fv[-1] = xr, fr
        else:
            xc = np.clip(c + 0.5 * (simplex[-1] - c), lo, hi)
            fc = f(xc)
            if fc < fv[-1]:
                simplex[-1], fv[-1] = xc, fc
            else:
                simplex = simplex[0] + 0.5 * (simplex - simplex[0])
                fv = np.array([f(np.clip(p, lo, hi)) for p in simplex])
    return float(fv.min())


def _rand_series(seed: int, n: int = 120, m: int = 12) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (
        50
        + 0.3 * t * rng.uniform(0.5, 1.5)
        + rng.uniform(2, 15) * np.sin(2 * np.pi * t / m + rng.uniform(0, 6))
        + rng.normal(0, rng.uniform(0.5, 5), n)
    )


# --------------------------------------------------------------------------
# Holt: optimality certificate
# --------------------------------------------------------------------------

@pytest.mark.parametrize("series", [
    WWWusage, USAccDeaths,
    _rand_series(1), _rand_series(2), _rand_series(3, n=60),
], ids=["WWWusage", "USAccDeaths", "rand1", "rand2", "rand3"])
def test_holt_params_minimize_independent_sse(series):
    y = np.asarray(series, dtype=float)
    # certificate runs at CERT depth: the full-depth grid must not be
    # beaten by an independent 5-start Nelder-Mead on the same objective
    p = holt_parameters(y, rounds=HOLT_CERT_ROUNDS)
    kernel_sse = holt_sse(y, p["alpha"], p["beta"])
    lo, hi = 1e-4, 1 - 1e-4
    starts = [np.array(s) for s in
              [(0.2, 0.1), (0.8, 0.1), (0.5, 0.5), (0.95, 0.9), (0.1, 0.9)]]
    nm_best = min(nelder_mead(lambda q: holt_sse(y, q[0], q[1]), s, lo, hi)
                  for s in starts)
    # the kernel's grid+zoom must be at least as good as an independent
    # 5-start Nelder-Mead on the identical objective (tiny numerical slack)
    assert kernel_sse <= nm_best * (1 + 1e-6) + 1e-9, (kernel_sse, nm_best)
    # production-depth contract (VERDICT r03 #2): the default depth stays
    # inside the reference's own golden tolerance (±0.02) of the certified
    # optimum, at roughly half the per-series cost
    pd_ = holt_parameters(y)
    if np.isfinite(p["alpha"]):
        assert abs(pd_["alpha"] - p["alpha"]) < 0.02
        assert abs(pd_["beta"] - p["beta"]) < 0.02
        default_sse = holt_sse(y, pd_["alpha"], pd_["beta"])
        assert default_sse <= kernel_sse * (1 + 1e-3) + 1e-9


# --------------------------------------------------------------------------
# Holt-Winters: optimality certificate
# --------------------------------------------------------------------------

@pytest.mark.parametrize("series,m", [
    (USAccDeaths, 12), (_rand_series(4), 12), (_rand_series(5, n=96, m=8), 8),
], ids=["USAccDeaths", "rand4", "rand5-m8"])
def test_hw_params_minimize_independent_sse(series, m):
    y = np.asarray(series, dtype=float)
    p = hw_parameters(y, freq=m, rounds=HW_CERT_ROUNDS)
    kernel_sse = hw_sse(y, m, p["hw_alpha"], p["hw_beta"], p["hw_gamma"])
    lo, hi = 1e-4, 1 - 1e-4
    starts = [np.array(s) for s in
              [(0.3, 0.1, 0.1), (0.7, 0.2, 0.5), (0.5, 0.5, 0.5), (0.9, 0.05, 0.9)]]
    nm_best = min(nelder_mead(lambda q: hw_sse(y, m, q[0], q[1], q[2]), s, lo, hi)
                  for s in starts)
    assert kernel_sse <= nm_best * (1 + 1e-6) + 1e-9, (kernel_sse, nm_best)
    # production-depth contract (VERDICT r03 #2)
    pd_ = hw_parameters(y, freq=m)
    if np.isfinite(p["hw_alpha"]):
        for k in ("hw_alpha", "hw_beta", "hw_gamma"):
            assert abs(pd_[k] - p[k]) < 0.02, (k, pd_[k], p[k])
        default_sse = hw_sse(y, m, pd_["hw_alpha"], pd_["hw_beta"], pd_["hw_gamma"])
        assert default_sse <= kernel_sse * (1 + 1e-3) + 1e-9


# --------------------------------------------------------------------------
# STL: component contracts
# --------------------------------------------------------------------------

def _np_acf1(r: np.ndarray) -> float:
    d = r - r.mean()
    return float((d[:-1] @ d[1:]) / (d @ d))


def test_stl_reconstruction_and_component_properties():
    y = np.asarray(USAccDeaths, dtype=float)
    m = 12
    seasonal, trend, remainder = _stl_decompose(y, m, seasonal_len=13)
    # exact reconstruction
    assert np.max(np.abs(seasonal + trend + remainder - y)) < 1e-8
    # seasonal balance: near-zero mean relative to its own scale
    assert abs(seasonal.mean()) < 0.05 * (np.abs(seasonal).mean() + 1e-12)
    # trend is smoother than the input (second-difference energy)
    assert np.var(np.diff(trend, 2)) < 0.1 * np.var(np.diff(y, 2))
    # seasonal captures the cycle: correlation between consecutive cycles
    s = seasonal[: (len(seasonal) // m) * m].reshape(-1, m)
    cors = [np.corrcoef(s[i], s[i + 1])[0, 1] for i in range(len(s) - 1)]
    assert min(cors) > 0.9


def test_stl_strengths_recomputed_from_components():
    y = np.asarray(USAccDeaths, dtype=float)
    m = 12
    feats = stl_features(y, freq=m)
    seasonal, trend0, remainder = _stl_decompose(y, m, seasonal_len=13)
    vare = np.var(remainder, ddof=1)
    # published strength formulas (Wang-Smith-Hyndman / tsfeatures):
    trend_ind = max(0.0, min(1.0, 1 - vare / np.var(y - seasonal, ddof=1)))
    seas_ind = max(0.0, min(1.0, 1 - vare / np.var(remainder + seasonal, ddof=1)))
    assert feats["trend"] == pytest.approx(trend_ind, abs=1e-9)
    assert feats["seasonal_strength"] == pytest.approx(seas_ind, abs=1e-9)
    # e_acf1 via a from-scratch ACF
    assert feats["e_acf1"] == pytest.approx(_np_acf1(remainder), abs=1e-9)
    # peak/trough point INTO the seasonal component's extremes
    pk = int(feats["peak"]) % m
    tr = int(feats["trough"]) % m
    assert seasonal[(np.arange(len(seasonal)) + 1) % m == pk].mean() == max(
        seasonal[(np.arange(len(seasonal)) + 1) % m == j].mean() for j in range(m)
    )
    assert seasonal[(np.arange(len(seasonal)) + 1) % m == tr].mean() == min(
        seasonal[(np.arange(len(seasonal)) + 1) % m == j].mean() for j in range(m)
    )


def test_stl_directional_regimes():
    rng = np.random.default_rng(9)
    t = np.arange(240.0)
    pure_season = 10 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 0.3, 240)
    pure_trend = 0.5 * t + rng.normal(0, 0.5, 240)
    noise = rng.normal(0, 1, 240)
    f_season = stl_features(pure_season, freq=12)
    f_trend = stl_features(pure_trend, freq=12)
    f_noise = stl_features(noise, freq=12)
    assert f_season["seasonal_strength"] > 0.95
    assert f_trend["trend"] > 0.95
    assert f_noise["seasonal_strength"] < 0.45 and f_noise["trend"] < 0.45
    # linearity is signed slope-like: positive for the rising trend and
    # dominant over curvature; near-pure-linear series has small |curvature|
    assert f_trend["linearity"] > 0
    assert abs(f_trend["curvature"]) < 0.05 * abs(f_trend["linearity"])
