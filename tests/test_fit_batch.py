"""Cross-series batched Holt / Holt-Winters fits: exact equality with the
per-series kernels.

The batch path exists purely for dispatch amortization (~3x per series at
bench lengths); every time-axis op is elementwise in the (series,
candidate) plane, so results must be IDENTICAL — not close — to
holt_parameters / hw_parameters, including NaN positions from guards,
constant/degenerate series, and candidate argmin tie-breaks. Any bit of
drift here is a bug, so the assertions use exact equality.
"""

from __future__ import annotations

import numpy as np
import pytest

from tsfeatures_spark.kernels.features import (
    HOLT_CERT_ROUNDS,
    HW_CERT_ROUNDS,
    holt_parameters,
    hw_parameters,
)
from tsfeatures_spark.kernels.fit_batch import holt_fit_batch, hw_fit_batch
from tsfeatures_spark.kernels.stats import scalets


def _mixed_series(seed: int, n_series: int = 40):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n_series):
        n = int(rng.integers(2, 400))
        kind = i % 5
        if kind == 0:
            y = np.cumsum(rng.normal(size=n)) + 100
        elif kind == 1:
            y = rng.integers(0, 50000, size=n).astype(float)
        elif kind == 2:
            y = np.full(n, 7.0)               # constant
        elif kind == 3:
            y = scalets(np.full(n, 3.0))      # all-NaN after scaling
        else:
            t = np.arange(n)
            y = 10 * np.sin(2 * np.pi * t / 24) + t * 0.3 + rng.normal(size=n)
        out.append(y)
    # guard boundaries for holt (n<4) and hw (n<2m+2)
    out += [np.arange(k, dtype=float) for k in (0, 1, 2, 3, 4, 5, 25, 49, 50, 51)]
    return out


def _eq(a: float, b: float) -> bool:
    return (np.isnan(a) and np.isnan(b)) or a == b


@pytest.mark.parametrize("rounds", [None, HOLT_CERT_ROUNDS])
def test_holt_batch_equals_scalar(rounds):
    ys = _mixed_series(1)
    kw = {} if rounds is None else {"rounds": rounds}
    got = holt_fit_batch(ys, group=7, **kw)   # small group: boundaries + remainder
    for i, y in enumerate(ys):
        exp = holt_parameters(y, 1, **kw)
        assert _eq(got[i, 0], exp["alpha"]), f"series {i} alpha {got[i,0]} != {exp['alpha']}"
        assert _eq(got[i, 1], exp["beta"]), f"series {i} beta {got[i,1]} != {exp['beta']}"


@pytest.mark.parametrize("m,rounds", [(24, None), (12, None), (7, None),
                                      (24, HW_CERT_ROUNDS)])
def test_hw_batch_equals_scalar(m, rounds):
    ys = _mixed_series(2)
    kw = {} if rounds is None else {"rounds": rounds}
    got = hw_fit_batch(ys, m, group=7, **kw)
    for i, y in enumerate(ys):
        exp = hw_parameters(y, m, **kw)
        for c, k in enumerate(("hw_alpha", "hw_beta", "hw_gamma")):
            assert _eq(got[i, c], exp[k]), f"series {i} m={m} {k}: {got[i,c]} != {exp[k]}"


def test_heterogeneity_batch_equals_scalar():
    """GARCH-stage-batched heterogeneity must equal the scalar kernel
    exactly: guard boundaries (order_max<1, short resid < 20, zero
    variance), AR whitening, and the two-stage profile search."""
    from tsfeatures_spark.kernels.features import heterogeneity
    from tsfeatures_spark.kernels.fit_batch import heterogeneity_fit_batch

    ys = _mixed_series(5)
    got = heterogeneity_fit_batch(ys, 24, group=7)
    for i, y in enumerate(ys):
        exp = heterogeneity(np.asarray(y, dtype=float), 24)
        for k in ("arch_acf", "garch_acf", "arch_r2", "garch_r2"):
            assert _eq(got[i][k], exp[k]), f"series {i} {k}: {got[i][k]} != {exp[k]}"


def test_ar_order_scan_matches_svd_reference_on_raw_scale():
    """The prefix-sum AR order scan must agree with the exact per-order
    SVD least-squares scan on ILL-CONDITIONED raw-scale input (level ~4e4
    with trend), not just z-scored series — normal equations square the
    condition number, and the uncentered variant flipped the chosen order
    on most such series (review r04). Centering fixed it; pin that."""
    from tsfeatures_spark.kernels import stats as st
    from tsfeatures_spark.kernels.features import _ar_order_by_aic

    def svd_order(y, order_max):
        n = len(y)
        best_aic, best_p = np.inf, None
        for p in range(0, order_max + 1):
            if p == 0:
                r = y - y.mean()
                nobs = n
            else:
                mat = st.embed(y, p + 1)
                _, r = st.lstsq_const(mat[:, 1:], mat[:, 0])
                nobs = len(r)
            if nobs <= p + 1:
                continue
            sigma2 = float(np.dot(r, r)) / nobs
            if sigma2 <= 0:
                continue
            aic = np.log(sigma2) + 2.0 * (p + 1) / nobs
            if aic < best_aic:
                best_aic, best_p = aic, p
        return best_p

    rng = np.random.default_rng(0)
    for _ in range(40):
        n = int(rng.integers(60, 400))
        y = 40000 + rng.uniform(-5, 5) * np.arange(n) + rng.normal(0, 50, n)
        om = int(min(n - 1, np.floor(10 * np.log10(n))))
        assert _ar_order_by_aic(y, om) == svd_order(y, om)


def test_registry_fields_collision_free():
    """The batched-fit merge into the per-series dict is order-independent
    ONLY because no two kernels share an output field (compute_features is
    first-wins on duplicates); guard that invariant."""
    from collections import Counter

    from tsfeatures_spark.kernels.features import FEATURES

    counts = Counter(f for _, fields in FEATURES.values() for f in fields)
    dups = {k: v for k, v in counts.items() if v > 1}
    assert not dups, f"duplicate kernel output fields: {dups}"


def test_features_wide_batch_fits_identical_to_per_series(spark):
    """The Spark path with batch_fits=True (default) must emit the exact
    rows of the per-series path — same doc batching, mixed lengths."""
    from tsfeatures_spark.operators.features import features_wide
    from tsfeatures_spark.sources.generator import token_table

    fd = token_table(spark, 60, base_seed=11, mean_len=120, max_len=400)
    a = (features_wide(fd, scale=True, freq=24, batch_fits=True)
         .toPandas().sort_values("doc_id").reset_index(drop=True))
    b = (features_wide(fd, scale=True, freq=24, batch_fits=False)
         .toPandas().sort_values("doc_id").reset_index(drop=True))
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        if c == "doc_id":
            assert (a[c] == b[c]).all()
        else:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            same = (av == bv) | (np.isnan(av) & np.isnan(bv))
            assert same.all(), f"column {c} differs: {av[~same][:3]} vs {bv[~same][:3]}"


def test_batch_empty_and_single():
    assert holt_fit_batch([]).shape == (0, 2)
    assert hw_fit_batch([], 24).shape == (0, 3)
    y = np.cumsum(np.random.default_rng(3).normal(size=60)) + 5
    got = holt_fit_batch([y])
    exp = holt_parameters(y, 1)
    assert _eq(got[0, 0], exp["alpha"]) and _eq(got[0, 1], exp["beta"])


def test_garch_degenerate_stage2_tiebreak_matches_scalar(monkeypatch):
    """ADVICE r04 flagged the batch NaN->inf map as diverging from the
    scalar path's np.nanargmin on rows mixing NaN and +inf. It does not:
    numpy's nanargmin itself replaces NaN with +inf before argmin, so BOTH
    paths resolve a [nan, inf, ..., inf] stage-2 row to index 0. This test
    pins that degenerate-row parity so neither path drifts."""
    from tsfeatures_spark.kernels import features as feat
    from tsfeatures_spark.kernels import fit_batch as fb

    def crafted_row(n_cand):
        row = np.full(n_cand, 0.0)
        if n_cand == 13:  # the stage-2 mu profile
            row = np.full(13, np.inf)
            row[0] = np.nan  # first slot NaN; every non-NaN is +inf
        return row

    monkeypatch.setattr(
        feat, "_garch_negll_candidates",
        lambda r, mu, om, A, B, var: crafted_row(len(mu)))
    monkeypatch.setattr(
        fb, "_garch_negll_batch",
        lambda R, lens, mu, om, A, B, var: np.tile(
            crafted_row(mu.shape[1]), (mu.shape[0], 1)))

    rng = np.random.default_rng(3)
    r = rng.normal(10.0, 2.0, 120)
    resid_scalar = feat._garch11_resid(r)
    mu_scalar = float((r - resid_scalar)[0])
    mu_batch, failed = fb._garch_group([r])
    assert not failed[0]
    assert mu_batch[0] == pytest.approx(mu_scalar, abs=0.0)
