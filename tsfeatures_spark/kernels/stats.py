"""Numerical primitives shared by the feature kernels.

Everything here is a from-scratch NumPy reimplementation of the statistical
math the reference (Nixtla/tsfeatures) pulls from statsmodels / scipy /
antropy — those libraries are deliberately NOT dependencies of this engine.
Semantics are matched against the published formulas; parity targets are
cited as ``reference-path:line`` (files under /root/reference).

Design note: every function takes a 1-D float64 array and returns scalars or
small arrays.  They are called from inside Arrow-vectorized pandas UDFs
(one call per series / per window), so they must be allocation-light and
loop-free wherever possible.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "scalets",
    "embed",
    "poly_orth",
    "acf_biased",
    "pacf_ldb",
    "ols_r2",
    "lstsq_const",
    "periodogram_psd",
    "spectral_entropy_normalized",
    "run_lengths",
    "hurst_exponent",
    "kpss_stat",
    "ur_pp_stat",
    "terasvirta_stat",
    "lambda_coef_var",
    "fminbound",
]


def scalets(x: np.ndarray) -> np.ndarray:
    """Mean/std (ddof=1) scaling. Parity: tsfeatures/utils.py:19-23."""
    with np.errstate(divide="ignore", invalid="ignore"):
        return (x - x.mean()) / x.std(ddof=1)


def embed(x: np.ndarray, p: int) -> np.ndarray:
    """R-style ``embed``: row t = [x_{t+p-1}, ..., x_t].

    Parity: tsfeatures/utils.py:45-62 (implemented there via np.roll; here a
    zero-copy strided view, same values).
    """
    n = x.shape[0]
    if n < p:
        return np.empty((0, p), dtype=x.dtype)
    # Column k of the R embed is x shifted back by k: x[p-1-k : n-k].
    windows = np.lib.stride_tricks.sliding_window_view(x, p)  # (n-p+1, p) fwd
    return windows[:, ::-1]


def poly_orth(t: np.ndarray, p: int) -> np.ndarray:
    """Orthogonal polynomial basis (degrees 1..p), R ``poly`` semantics via QR.

    Parity: tsfeatures/utils.py:25-43.
    """
    cols = np.column_stack([t.astype(float) ** k for k in range(p + 1)])
    q = np.linalg.qr(cols)[0]
    return q[:, 1:]


def acf_biased(x: np.ndarray, nlags: int) -> np.ndarray:
    """Biased-normalisation autocorrelation, lags 0..nlags.

    Matches statsmodels ``acf(x, nlags=k, fft=False)`` (adjusted=False,
    demean=True): rho_k = sum((x_t-m)(x_{t+k}-m)) / sum((x_t-m)^2).
    Parity target: tsfeatures/tsfeatures.py:63 usage.
    """
    x = np.asarray(x, dtype=float)
    n = x.shape[0]
    nlags = int(nlags)
    out = np.full(nlags + 1, np.nan)
    if n == 0:
        return out
    xd = x - x.mean()
    denom = float(np.dot(xd, xd))
    # full autocovariance via FFT-free correlate is O(n*k); fine for k<=24
    kmax = min(nlags, n - 1)
    if denom == 0 or not np.isfinite(denom):
        return out  # constant/degenerate series: all-NaN (statsmodels parity)
    out[0] = 1.0
    for k in range(1, kmax + 1):
        out[k] = float(np.dot(xd[:-k], xd[k:])) / denom
    return out


def acovf_biased(x: np.ndarray, nlags: int) -> np.ndarray:
    """Biased autocovariance (divide by n), demeaned, lags 0..nlags."""
    x = np.asarray(x, dtype=float)
    n = x.shape[0]
    out = np.full(nlags + 1, np.nan)
    if n == 0:
        return out
    xd = x - x.mean()
    kmax = min(nlags, n - 1)
    out[0] = float(np.dot(xd, xd)) / n
    for k in range(1, kmax + 1):
        out[k] = float(np.dot(xd[:-k], xd[k:])) / n
    return out


def pacf_ldb(x: np.ndarray, nlags: int) -> np.ndarray:
    """Partial autocorrelation via Levinson-Durbin on the *biased* ACF.

    Matches statsmodels ``pacf(x, nlags, method='ldb')``; pacf[0] = 1.
    Parity target: tsfeatures/tsfeatures.py:535.
    """
    order = int(nlags)
    sxx = acovf_biased(x, order)
    pac = np.full(order + 1, np.nan)
    pac[0] = 1.0
    if order < 1 or not np.isfinite(sxx[: order + 1]).all() or sxx[0] == 0:
        return pac
    phi = np.zeros((order + 1, order + 1))
    sig = np.zeros(order + 1)
    phi[1, 1] = sxx[1] / sxx[0]
    sig[1] = sxx[0] - phi[1, 1] * sxx[1]
    pac[1] = phi[1, 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        for k in range(2, order + 1):
            phi[k, k] = (sxx[k] - np.dot(phi[1:k, k - 1], sxx[1:k][::-1])) / sig[k - 1]
            for j in range(1, k):
                phi[j, k] = phi[j, k - 1] - phi[k, k] * phi[k - j, k - 1]
            sig[k] = sig[k - 1] * (1.0 - phi[k, k] ** 2)
            pac[k] = phi[k, k]
    return pac


def lstsq_const(X: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """OLS with intercept prepended. Returns (params incl. const, residuals)."""
    A = np.column_stack([np.ones(len(X)), X]) if X.ndim == 2 else np.column_stack([np.ones(len(X)), X.reshape(-1, 1)])
    beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    resid = y - A @ beta
    return beta, resid


def ols_r2(X: np.ndarray, y: np.ndarray) -> float:
    """R^2 of OLS with intercept — sklearn ``LinearRegression().score`` parity
    (tsfeatures/tsfeatures.py:130)."""
    _, resid = lstsq_const(X, y)
    ss_res = float(np.dot(resid, resid))
    yd = y - y.mean()
    ss_tot = float(np.dot(yd, yd))
    if ss_tot == 0.0:
        return 1.0  # sklearn returns 1.0 when the model is perfect, else 0; guard rare
    return 1.0 - ss_res / ss_tot


def periodogram_psd(x: np.ndarray) -> np.ndarray:
    """scipy.signal.periodogram(x, fs=1) parity: boxcar window, constant
    detrend, one-sided density scaling."""
    x = np.asarray(x, dtype=float)
    n = x.shape[0]
    xd = x - x.mean()
    spec = np.abs(np.fft.rfft(xd)) ** 2 / n
    if n % 2 == 0:
        spec[1:-1] *= 2.0
    else:
        spec[1:] *= 2.0
    return spec


def spectral_entropy_normalized(x: np.ndarray) -> float:
    """antropy ``spectral_entropy(x, sf=1, method='fft', normalize=True)``
    parity (tsfeatures/tsfeatures.py:197): Shannon entropy (base 2) of the
    normalised periodogram, divided by log2(#psd bins). Zero psd bins
    contribute 0 (antropy xlogx convention)."""
    psd = periodogram_psd(x)
    total = psd.sum()
    if not np.isfinite(total) or total <= 0:
        return float("nan")
    p = psd / total
    nz = p[p > 0]
    se = -float(np.sum(nz * np.log2(nz)))
    return se / np.log2(p.shape[0])


def run_lengths(mask_or_codes: np.ndarray) -> np.ndarray:
    """Lengths of maximal runs of equal consecutive values."""
    a = np.asarray(mask_or_codes)
    if a.shape[0] == 0:
        return np.empty(0, dtype=np.int64)
    change = np.flatnonzero(a[1:] != a[:-1]) + 1
    bounds = np.concatenate([[0], change, [a.shape[0]]])
    return np.diff(bounds)


def hurst_exponent(x: np.ndarray) -> float:
    """R/S Hurst exponent, parity with tsfeatures/utils.py:131-162.

    The reference computes, for every prefix length t:
      s_t = sqrt(mean((x[:t] - mean_t)^2))            (biased std of prefix)
      r_t = ptp(y[:t] - arange(1,t+1)*mean_t)          (range of adjusted walk)
    then regresses log(r/s) on log(t).  The reference is O(n^2); here s_t is
    O(n) via prefix sums and r_t is O(n^2/block) via blocked broadcasting for
    short series and an O(n log n) monotone-hull trick for long ones — values
    are identical.
    """
    x = np.asarray(x, dtype=float)
    n = x.size
    if n < 2:
        raise ValueError("series too short for hurst")
    t = np.arange(1, n + 1, dtype=float)
    y = np.cumsum(x)
    mean_t = y / t
    with np.errstate(divide="ignore", invalid="ignore"):
        s_t = np.sqrt(np.cumsum(x * x) / t - mean_t**2)
        r_t = _range_adjusted_walk(y, mean_t)
        r_s = np.log(r_t / s_t)[1:]
    logt = np.log(t)[1:]
    if not np.isfinite(r_s).all():
        # Reference parity (utils.py:156-161): the reference regresses on the
        # RAW log(r/s) vector; any non-finite term (e.g. a degenerate prefix
        # with x[0]==x[1]) makes its lstsq raise/NaN and the kernel wrapper
        # returns NaN — propagate instead of silently filtering.
        raise ValueError("non-finite log(r/s) term (reference returns NaN)")
    A = np.column_stack([logt, np.ones(logt.size)])
    h, _ = np.linalg.lstsq(A, r_s, rcond=-1)[0]
    return float(h)


def _range_adjusted_walk(y: np.ndarray, mean_t: np.ndarray) -> np.ndarray:
    """r_t[i] = max_{j<=i}(y_j - t_j*m_i) - min_{j<=i}(y_j - t_j*m_i)."""
    n = y.size
    t = np.arange(1.0, n + 1.0)
    if n <= 256:
        # blocked O(n^2) broadcast — cheap at window scale; larger series
        # take the O(n log n) hull path (110ms -> ~3ms at n=2000)
        out = np.empty(n)
        block = 512
        for s in range(0, n, block):
            e = min(s + block, n)
            m = mean_t[s:e][:, None]  # (b,1)
            adj = y[None, :e] - t[None, :e] * m  # (b, e)
            mask = np.triu(np.ones((e - s, e), dtype=bool), k=s + 1)
            adj_max = np.where(mask, -np.inf, adj).max(axis=1)
            adj_min = np.where(mask, np.inf, adj).min(axis=1)
            out[s:e] = adj_max - adj_min
        return out
    # O(n log n): f_i(m) = max_j (y_j - j*m) is the upper envelope of lines
    # with slope -j, intercept y_j; maintain upper & lower convex hulls
    # incrementally (j arrives in increasing order => decreasing slope).
    out = np.empty(n)
    # hulls store (slope, intercept); query by binary search on breakpoints
    hi_s: list[float] = []  # upper hull (for max)
    hi_b: list[float] = []
    lo_s: list[float] = []  # lower hull (for min)
    lo_b: list[float] = []

    def _bad(s1, b1, s2, b2, s3, b3, upper):
        # middle line (s2,b2) unnecessary?
        lhs = (b3 - b1) * (s1 - s2)
        rhs = (b2 - b1) * (s1 - s3)
        return lhs >= rhs if upper else lhs <= rhs

    def _query(hs, hb, m, upper):
        lo_i, hi_i = 0, len(hs) - 1
        while lo_i < hi_i:
            mid = (lo_i + hi_i) // 2
            v1 = hs[mid] * m + hb[mid]
            v2 = hs[mid + 1] * m + hb[mid + 1]
            better = v2 > v1 if upper else v2 < v1
            if better:
                lo_i = mid + 1
            else:
                hi_i = mid
        return hs[lo_i] * m + hb[lo_i]

    for i in range(n):
        s, b = -t[i], y[i]
        for hs, hb, upper in ((hi_s, hi_b, True), (lo_s, lo_b, False)):
            while len(hs) >= 2 and _bad(hs[-2], hb[-2], hs[-1], hb[-1], s, b, upper):
                hs.pop()
                hb.pop()
            # equal slopes can't happen (slopes strictly decreasing)
            hs.append(s)
            hb.append(b)
        m = mean_t[i]
        out[i] = _query(hi_s, hi_b, m, True) - _query(lo_s, lo_b, m, False)
    return out


def kpss_stat(x: np.ndarray, nlags: int) -> float:
    """KPSS level-stationarity statistic, statsmodels ``kpss(x, nlags=L)``
    parity (regression='c'): eta / s^2_lrv with Bartlett weights.
    Parity target: tsfeatures/tsfeatures.py:808-816."""
    x = np.asarray(x, dtype=float)
    n = x.size
    if n < 2:
        return float("nan")
    e = x - x.mean()
    s_cum = np.cumsum(e)
    eta = float(np.dot(s_cum, s_cum)) / (n * n)
    s2 = float(np.dot(e, e)) / n
    for lag in range(1, min(nlags, n - 1) + 1):
        w = 1.0 - lag / (nlags + 1.0)
        s2 += 2.0 / n * w * float(np.dot(e[lag:], e[:-lag]))
    if s2 <= 0 or not np.isfinite(s2):
        return float("nan")
    return eta / s2


def ur_pp_stat(x: np.ndarray) -> float:
    """Phillips-Perron test statistic, parity with the reference's own
    spelled-out implementation at tsfeatures/utils.py:164-213 — including its
    idiosyncratic ``s = 1/(n*sum(res^2))`` term, reproduced verbatim for
    output parity."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    lmax = int(4 * (n / 100) ** 0.25)
    y, y_l1 = x[1:], x[: n - 1]
    n -= 1
    beta, res = lstsq_const(y_l1, y)
    with np.errstate(divide="ignore", invalid="ignore"):
        s = 1.0 / (n * float(np.dot(res, res)))
        myybar = (1.0 / n**2) * float(np.sum((y - y.mean()) ** 2))
        coprods = np.array(
            [float(np.dot(res[i + 1 :], res[: n - i - 1])) for i in range(lmax)]
        )
        idx = np.arange(lmax)
        weights = 1.0 - (idx + 1) / (lmax + 1)
        sig = s + (2.0 / n) * float(np.dot(weights, coprods))
        lambda_ = 0.5 * (sig - s)
        alpha = beta[1]
        return float(n * (alpha - 1) - lambda_ / myybar)


def terasvirta_stat(x: np.ndarray, lag: int = 1, scale: bool = True) -> float:
    """Teraesvirta neural-network nonlinearity test statistic (lag=1).

    Parity: tsfeatures/utils.py:68-129. n*log(ssr0/ssr) where ssr0 is from
    OLS of x_t on lags and ssr from augmenting with squared/cubed lag terms.
    """
    x = np.asarray(x, dtype=float)
    if scale:
        x = scalets(x)
    size_x = len(x)
    mat = embed(x, lag + 1)
    yv = mat[:, 0]
    X = mat[:, 1:]
    _, u = lstsq_const(X, yv)
    ssr0 = float(np.dot(u, u))
    cross2 = [X[:, i] * X[:, j] for i in range(lag) for j in range(i, lag)]
    cross3 = [
        X[:, i] * X[:, j] * X[:, k]
        for i in range(lag)
        for j in range(i, lag)
        for k in range(j, lag)
    ]
    X_nn = np.column_stack([X] + cross2 + cross3)
    _, v = lstsq_const(X_nn, u)
    ssr = float(np.dot(v, v))
    with np.errstate(divide="ignore", invalid="ignore"):
        return float(size_x * np.log(ssr0 / ssr))


def lambda_coef_var(lambda_par: float, x: np.ndarray, period: int = 2) -> float:
    """Guerrero coefficient of variation for Box-Cox lambda.
    Parity: tsfeatures/utils.py:215-248."""
    if len(np.unique(x)) == 1:
        return 1.0
    split_size = (len(x) - 1) // period
    split = np.array_split(x, split_size)
    with np.errstate(divide="ignore", invalid="ignore"):
        mu_h = np.array([np.nanmean(sub) for sub in split])
        sig_h = np.array([np.nanstd(sub, ddof=1) for sub in split])
        rat = sig_h / mu_h ** (1 - lambda_par)
        return float(np.nanstd(rat, ddof=1) / np.nanmean(rat))


def fminbound(func, a: float, b: float, xatol: float = 1e-5, maxiter: int = 500):
    """Bounded scalar minimisation (golden section + parabolic interpolation),
    scipy ``minimize_scalar(method='bounded')`` algorithm. Returns (x, fx)."""
    sqrt_eps = np.sqrt(2.2e-16)
    golden_mean = 0.5 * (3.0 - np.sqrt(5.0))
    fulc = a + golden_mean * (b - a)
    nfc, xf = fulc, fulc
    rat = e_ = 0.0
    fx = func(xf)
    fu = np.inf
    ffulc = fnfc = fx
    xm = 0.5 * (a + b)
    tol1 = sqrt_eps * np.abs(xf) + xatol / 3.0
    tol2 = 2.0 * tol1
    num = 1
    while np.abs(xf - xm) > (tol2 - 0.5 * (b - a)):
        golden = 1
        if np.abs(e_) > tol1:
            golden = 0
            r = (xf - nfc) * (fx - ffulc)
            q = (xf - fulc) * (fx - fnfc)
            p = (xf - fulc) * q - (xf - nfc) * r
            q = 2.0 * (q - r)
            if q > 0.0:
                p = -p
            q = np.abs(q)
            r = e_
            e_ = rat
            if (np.abs(p) < np.abs(0.5 * q * r)) and (p > q * (a - xf)) and (p < q * (b - xf)):
                rat = (p + 0.0) / q
                u = xf + rat
                if ((u - a) < tol2) or ((b - u) < tol2):
                    si = np.sign(xm - xf) + ((xm - xf) == 0)
                    rat = tol1 * si
            else:
                golden = 1
        if golden:
            # step into the larger subinterval
            e_ = (a - xf) if xf >= xm else (b - xf)
            rat = golden_mean * e_
        si = np.sign(rat) + (rat == 0)
        u = xf + si * np.maximum(np.abs(rat), tol1)
        fu = func(u)
        num += 1
        if fu <= fx:
            if u >= xf:
                a = xf
            else:
                b = xf
            fulc, ffulc = nfc, fnfc
            nfc, fnfc = xf, fx
            xf, fx = u, fu
        else:
            if u < xf:
                a = u
            else:
                b = u
            if (fu <= fnfc) or (nfc == xf):
                fulc, ffulc = nfc, fnfc
                nfc, fnfc = u, fu
            elif (fu <= ffulc) or (fulc == xf) or (fulc == nfc):
                fulc, ffulc = u, fu
        xm = 0.5 * (a + b)
        tol1 = sqrt_eps * np.abs(xf) + xatol / 3.0
        tol2 = 2.0 * tol1
        if num >= maxiter:
            break
    return xf, fx
