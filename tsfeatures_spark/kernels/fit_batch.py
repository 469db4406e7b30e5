"""Holt / Holt-Winters grid fits vectorized ACROSS series.

The per-series fit kernels (features.py: holt_parameters, hw_parameters)
are dominated by numpy dispatch overhead, not flops: each zoom round is
one pass over time with ~10 elementwise ops per step on small (G,)
candidate arrays, so a 300-step series costs ~3000 dispatches per round
regardless of how cheap the math is. Batching S series into one padded
(S, T) matrix keeps the SAME dispatch count per step while the arrays
grow to (S, G) — measured ~3x per series at the bench workload
(lognormal lengths, mean 300), and the win multiplies by 10^12 at corpus
scale, which is why `features_wide` routes the fit kernels through here
by default.

Bit-identity contract: every operation along the time axis is elementwise
in the candidate/series plane, so batching cannot change a single bit of
any series' result. The candidate grids, zoom bookkeeping, degenerate
guards and dead-series handling replicate features.py term for term
(np.linspace with array endpoints runs the same arange*step+start formula
elementwise; masked padding steps contribute exactly 0 to the moment /
SSE accumulators while the state is allowed to evolve harmlessly).
Pinned by tests/test_fit_batch.py: exact equality with the per-series
kernels over mixed random / constant / short / NaN-scaled series at both
default and certification depth.

Reference semantics: tsfeatures.py:340-368 (Holt via statsmodels
ExponentialSmoothing(trend='add')), tsfeatures.py:392-423 (additive
Holt-Winters) — same parity targets as the per-series kernels.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from .features import (
    HOLT_DEFAULT_ROUNDS,
    HW_DEFAULT_ROUNDS,
)
from . import stats as st

_LO, _HI = 1e-4, 1.0 - 1e-4

#: Max series per padded sub-batch. Groups are formed over length-sorted
#: series (see _length_groups) so padding waste stays small; 16 keeps the
#: working set (3x3xSxG moments at G=225) inside L2 while amortizing
#: dispatch up to 16x.
GROUP = 16

#: Padded work may exceed real work by at most this factor within a group
#: (T_group * S <= cap * sum(len)): homogeneous-length groups batch wide,
#: a length outlier starts its own group instead of inflating everyone's
#: time loop to its length. Measured on lognormal bench lengths: fixed
#: groups of 16 gave ~1.1x over scalar, waste-capped grouping ~2.5x.
WASTE_CAP = 1.3


def _length_groups(order: List[int], lens: Sequence[int],
                   group: int, waste_cap: float = WASTE_CAP) -> List[List[int]]:
    """Greedy walk over length-sorted indices: extend the current group
    while the padded step count stays within ``waste_cap`` of the true
    step count and the group is under ``group`` series."""
    groups: List[List[int]] = []
    cur: List[int] = []
    cur_sum = 0
    cur_max = 0
    for i in order:
        n = lens[i]
        new_max = max(cur_max, n)
        if cur and (len(cur) >= group
                    or new_max * (len(cur) + 1) > waste_cap * (cur_sum + n)):
            groups.append(cur)
            cur, cur_sum, cur_max = [], 0, 0
            new_max = n
        cur.append(i)
        cur_sum += n
        cur_max = new_max
    if cur:
        groups.append(cur)
    return groups


def _coerce_series(ys: Sequence) -> List:
    """Per-series input coercion with the scalar kernels' resilience: a
    value that cannot become a 1-D float array (0-d scalar, ragged object,
    None) maps to None — the caller emits the NaN row the scalar kernel's
    try/except would have produced, instead of one bad series failing the
    whole Spark task (the batch paths run OUTSIDE compute_features' guard)."""
    out = []
    for y in ys:
        try:
            a = np.asarray(y, dtype=float)
            out.append(a if a.ndim == 1 else None)
        except Exception:
            out.append(None)
    return out


def _pad_group(ys: Sequence[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """(S, T) zero-padded matrix + (S,) lengths. Zeros are inert: every
    accumulator contribution at t >= len is masked to exactly 0.0."""
    lens = np.fromiter((len(y) for y in ys), dtype=np.int64, count=len(ys))
    T = int(lens.max()) if len(lens) else 0
    Y = np.zeros((len(ys), T))
    for i, y in enumerate(ys):
        Y[i, : len(y)] = y
    return Y, lens


def _holt_sse_batch(Y: np.ndarray, lens: np.ndarray,
                    A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Batched `_holt_sse_candidates` (features.py): same stacked-state
    recursion — rows respond to l0=1, b0=1 and the zero-initial input —
    with moments accumulated per (series, candidate); the closed-form
    initial-state solve and SSE are the scalar path's expressions
    elementwise. Returns sse with shape (S, G)."""
    S, T = Y.shape
    G = A.shape[1]
    omA = 1.0 - A
    omB = 1.0 - B
    L = np.zeros((3, S, G))
    L[0] = 1.0
    Bm = np.zeros((3, S, G))
    Bm[1] = 1.0
    M = np.zeros((3, 3, S, G))
    tmp = np.empty((3, 3, S, G))
    P = np.empty((3, S, G))
    v = np.empty((3, S, G))
    n_min = int(lens.min()) if S else 0
    for t in range(T):
        yt = Y[:, t][:, None]
        np.add(L, Bm, out=P)
        v[:2] = P[:2]
        np.subtract(yt, P[2], out=v[2])
        if t >= n_min:
            # finished series: zero the moment contribution by assignment,
            # NOT multiplication — an unstable candidate's state can
            # overflow to inf on a long padded tail, and inf*0 = NaN would
            # poison the accumulator; assignment is inert regardless. (The
            # state may keep evolving on the padding — it is never read.)
            v[:, t >= lens, :] = 0.0
        np.multiply(v[:, None], v[None, :], out=tmp)
        M += tmp
        Ln = np.multiply(omA, P, out=P)  # P's values are consumed; reuse
        Ln[2] += A * yt
        d = np.subtract(Ln, L, out=v)    # v consumed by M; reuse as scratch
        d *= B
        Bm *= omB
        Bm += d
        L, P = Ln, L                     # old-L buffer becomes next P
    sUU, sUV, sUd = M[0, 0], M[0, 1], M[0, 2]
    sVV, sVd, sdd = M[1, 1], M[1, 2], M[2, 2]
    det = sUU * sVV - sUV * sUV
    with np.errstate(divide="ignore", invalid="ignore"):
        l0 = (sUd * sVV - sVd * sUV) / det
        b0 = (sVd * sUU - sUd * sUV) / det
        bad = ~np.isfinite(l0) | ~np.isfinite(b0) | (np.abs(det) < 1e-300)
        if bad.any():
            l0 = np.where(bad, np.where(sUU > 0, sUd / np.where(sUU > 0, sUU, 1.0), 0.0), l0)
            b0 = np.where(bad, 0.0, b0)
        sse = sdd - l0 * sUd - b0 * sVd
    return sse


def _grid_candidates(ga: np.ndarray, gb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-series meshgrid('ij').ravel() — A repeats each ga entry,
    B tiles gb — matching the scalar candidate ordering exactly (argmin
    tie-breaks depend on it)."""
    return np.repeat(ga, gb.shape[1], axis=1), np.tile(gb, (1, ga.shape[1]))


def _holt_group(ys: Sequence[np.ndarray], rounds: int) -> np.ndarray:
    """(S, 2) alpha/beta for one padded group — `_holt_fit_grid`
    vectorized over series; dead series (all-NaN SSE, e.g. constant
    series z-scaled to NaN) keep inf best-SSE and exit as NaN exactly
    like the scalar early return."""
    S = len(ys)
    Y, lens = _pad_group(ys)
    ga = np.tile(np.linspace(_LO, _HI, 15), (S, 1))
    gb = ga.copy()
    best_sse = np.full(S, np.inf)
    best_a = np.full(S, np.nan)
    best_b = np.full(S, np.nan)
    span_a = np.full(S, ga[0, 1] - ga[0, 0])
    span_b = span_a.copy()
    rows = np.arange(S)
    with np.errstate(all="ignore"):
        for _round in range(rounds):
            A, B = _grid_candidates(ga, gb)
            sse = _holt_sse_batch(Y, lens, A, B)
            sse = np.where(np.isfinite(sse), sse, np.inf)
            i = np.argmin(sse, axis=1)
            si = sse[rows, i]
            upd = si < best_sse
            best_sse = np.where(upd, si, best_sse)
            best_a = np.where(upd, A[rows, i], best_a)
            best_b = np.where(upd, B[rows, i], best_b)
            # dead series: NaN centers -> NaN grids -> inf sse next round
            # -> never updated again (scalar path returns here instead)
            ga = np.clip(np.linspace(best_a - span_a, best_a + span_a, 7, axis=1), _LO, _HI)
            gb = np.clip(np.linspace(best_b - span_b, best_b + span_b, 7, axis=1), _LO, _HI)
            span_a = np.where(ga[:, 1] > ga[:, 0], ga[:, 1] - ga[:, 0], span_a / 3)
            span_b = np.where(gb[:, 1] > gb[:, 0], gb[:, 1] - gb[:, 0], span_b / 3)
    out = np.column_stack([best_a, best_b])
    out[~np.isfinite(best_sse)] = np.nan
    return out


def holt_fit_batch(ys: Sequence[np.ndarray],
                   rounds: int = HOLT_DEFAULT_ROUNDS,
                   group: int = GROUP) -> np.ndarray:
    """alpha/beta for every series, shape (N, 2) — equal bit-for-bit to
    ``holt_parameters(y, freq)`` per series (the input must already carry
    whatever scaling the caller wants; `features_wide` passes the scaled
    series, same as `compute_features`)."""
    N = len(ys)
    out = np.full((N, 2), np.nan)
    ys = _coerce_series(ys)
    eligible = [i for i, y in enumerate(ys) if y is not None and len(y) >= 4]
    order = sorted(eligible, key=lambda i: len(ys[i]))
    lens = [len(y) if y is not None else 0 for y in ys]
    for idx in _length_groups(order, lens, group):
        out[idx] = _holt_group([ys[i] for i in idx], rounds)
    return out


def _hw_sse_batch(Y: np.ndarray, lens: np.ndarray, m: int,
                  l0: np.ndarray, b0: np.ndarray, s0: np.ndarray,
                  A: np.ndarray, B: np.ndarray, Gm: np.ndarray) -> np.ndarray:
    """Batched `_hw_sse_candidates`: per-(series, candidate) recursion with
    the shared per-series heuristic initial state; SSE contributions
    masked to 0 on padding steps. Shapes: l0/b0 (S,), s0 (S, m),
    A/B/Gm (S, G); returns (S, G)."""
    S, T = Y.shape
    G = A.shape[1]
    L = np.broadcast_to(l0[:, None], (S, G)).copy()
    Bt = np.broadcast_to(b0[:, None], (S, G)).copy()
    Ssn = np.broadcast_to(s0[:, None, :], (S, G, m)).copy()
    sse = np.zeros((S, G))
    omA = 1.0 - A
    omB = 1.0 - B
    omG = 1.0 - Gm
    n_min = int(lens.min()) if S else 0
    # preallocated scratch (r06): the expression form allocated ~14 (S, G)
    # temporaries per time step — at (16, 729) that is ~25 MB of transient
    # traffic per step, pure allocator/bandwidth cost under 32-way task
    # concurrency. Every value below is produced by the SAME op sequence
    # on the same operands (just with out= buffers), so results are
    # bit-identical — pinned by tests/test_fit_batch.py exact equality.
    P = np.empty((S, G))       # L + Bt
    t1 = np.empty((S, G))
    e = np.empty((S, G))
    Ln = np.empty((S, G))
    t4 = np.empty((S, G))
    for t in range(T):
        j = t % m
        yt = Y[:, t][:, None]
        si = Ssn[:, :, j]
        np.add(L, Bt, out=P)                  # P = L + Bt
        np.add(P, si, out=t1)                 # t1 = (L + Bt) + si
        np.subtract(yt, t1, out=e)            # e = yt - (L + Bt + si)
        np.multiply(e, e, out=t1)             # t1 = e * e
        if t >= n_min:
            # assignment, not multiply: see _holt_sse_batch (inf*0 hazard)
            t1[t >= lens, :] = 0.0
        sse += t1
        np.subtract(yt, si, out=t4)           # t4 = yt - si
        np.multiply(A, t4, out=t4)            # t4 = A * (yt - si)
        np.multiply(omA, P, out=P)            # P = omA * (L + Bt)
        np.add(t4, P, out=Ln)                 # Ln = A*(yt-si) + omA*(L+Bt)
        np.subtract(Ln, L, out=t1)            # t1 = Ln - L
        np.multiply(B, t1, out=t1)            # t1 = B * (Ln - L)
        Bt *= omB
        Bt += t1                              # Bt = B*(Ln-L) + omB*Bt
        np.subtract(yt, Ln, out=t1)           # t1 = yt - Ln
        np.multiply(Gm, t1, out=t1)           # t1 = Gm * (yt - Ln)
        np.multiply(omG, si, out=t4)          # t4 = omG * si (copy: si is a
        np.add(t1, t4, out=si)                #   view; t4 breaks aliasing)
        L, Ln = Ln, L                         # reuse old-L buffer next step
    return sse


def _hw_group(ys: Sequence[np.ndarray], m: int, inits, rounds: int) -> np.ndarray:
    """(S, 3) hw_alpha/beta/gamma for one padded group — the
    `hw_parameters` zoom loop vectorized over series. ``inits`` is the
    per-series (intercept, slope, s0) heuristic state computed by the
    caller (identical code path to the scalar kernel)."""
    S = len(ys)
    Y, lens = _pad_group(ys)
    l0 = np.array([iv[0] for iv in inits])
    b0 = np.array([iv[1] for iv in inits])
    s0 = np.stack([iv[2] for iv in inits])
    ga = np.tile(np.linspace(_LO, _HI, 9), (S, 1))
    gb = ga.copy()
    gg = ga.copy()
    best_sse = np.full(S, np.inf)
    best = np.full((S, 3), np.nan)
    spans = [np.full(S, ga[0, 1] - ga[0, 0]) for _ in range(3)]
    rows = np.arange(S)
    with np.errstate(all="ignore"):
        for _round in range(rounds):
            # meshgrid(ga, gb, gg, 'ij').ravel(): A repeats over |gb|*|gg|,
            # B tiles per-ga and repeats over |gg|, Gm tiles over |ga|*|gb|
            nb, ng = gb.shape[1], gg.shape[1]
            A = np.repeat(ga, nb * ng, axis=1)
            B = np.tile(np.repeat(gb, ng, axis=1), (1, ga.shape[1]))
            Gm = np.tile(gg, (1, ga.shape[1] * nb))
            sse = _hw_sse_batch(Y, lens, m, l0, b0, s0, A, B, Gm)
            sse = np.where(np.isfinite(sse), sse, np.inf)
            i = np.argmin(sse, axis=1)
            si = sse[rows, i]
            upd = si < best_sse
            best_sse = np.where(upd, si, best_sse)
            best[:, 0] = np.where(upd, A[rows, i], best[:, 0])
            best[:, 1] = np.where(upd, B[rows, i], best[:, 1])
            best[:, 2] = np.where(upd, Gm[rows, i], best[:, 2])
            ga = np.clip(np.linspace(best[:, 0] - spans[0], best[:, 0] + spans[0], 7, axis=1), _LO, _HI)
            gb = np.clip(np.linspace(best[:, 1] - spans[1], best[:, 1] + spans[1], 7, axis=1), _LO, _HI)
            gg = np.clip(np.linspace(best[:, 2] - spans[2], best[:, 2] + spans[2], 7, axis=1), _LO, _HI)
            spans = [np.maximum(g[:, 1] - g[:, 0], 1e-7) for g in (ga, gb, gg)]
    out = best.copy()
    out[~np.isfinite(best_sse)] = np.nan
    return out


def _hw_inits(y: np.ndarray, m: int):
    """The scalar kernel's heuristic initial state (hw_parameters preamble,
    term for term); None when the series is ineligible (guards or a
    raising polyfit — the scalar path's except -> NaN)."""
    n = len(y)
    if m < 2 or n < 2 * m + 2:
        return None
    try:
        seasons = y[: (n // m) * m].reshape(-1, m)
        row_means = seasons.mean(axis=1, keepdims=True)
        s0 = (seasons - row_means).mean(axis=0)
        s0 = s0 - s0.mean()
        tt = np.arange(1.0, min(n, 2 * m) + 1.0)
        deseas = y[: len(tt)] - np.tile(s0, 3)[: len(tt)]
        slope, intercept = np.polyfit(tt, deseas, 1)
    except Exception:
        return None
    return intercept, slope, s0


def hw_fit_batch(ys: Sequence[np.ndarray], m: int,
                 rounds: int = HW_DEFAULT_ROUNDS,
                 group: int = GROUP) -> np.ndarray:
    """hw_alpha/beta/gamma for every series at shared seasonality ``m``,
    shape (N, 3) — equal bit-for-bit to ``hw_parameters(y, m)`` per
    series (pre-scaled input, as with `holt_fit_batch`)."""
    N = len(ys)
    out = np.full((N, 3), np.nan)
    ys = _coerce_series(ys)
    m = int(m)
    inits = {i: (_hw_inits(ys[i], m) if ys[i] is not None else None)
             for i in range(N)}
    eligible = [i for i in range(N) if inits[i] is not None]
    order = sorted(eligible, key=lambda i: len(ys[i]))
    lens = [len(y) if y is not None else 0 for y in ys]
    for idx in _length_groups(order, lens, group):
        out[idx] = _hw_group([ys[i] for i in idx], m,
                             [inits[i] for i in idx], rounds)
    return out


def _garch_negll_batch(R: np.ndarray, lens: np.ndarray, mu: np.ndarray,
                       om: np.ndarray, al: np.ndarray, be: np.ndarray,
                       h0: np.ndarray) -> np.ndarray:
    """Batched `_garch_negll_candidates`: the variance recursion per
    (series, candidate); padded-step terms zeroed by assignment. Shapes:
    R (S, T), mu/om/al/be (S, G), h0 (S,); returns (S, G)."""
    S, T = R.shape
    h = np.broadcast_to(h0[:, None], mu.shape).copy()
    e = R[:, 0][:, None] - mu
    ll = np.log(h) + e * e / h
    prev_e2 = e * e
    n_min = int(lens.min()) if S else 0
    # preallocated scratch (r06, see _hw_sse_batch): identical op sequence
    # with out= buffers — bit-identical, ~2x fewer transient allocations
    G = mu.shape[1]
    t1 = np.empty((S, G))
    t2 = np.empty((S, G))
    e = np.empty((S, G))
    for t in range(1, T):
        np.multiply(al, prev_e2, out=t1)
        np.add(om, t1, out=t1)            # t1 = om + al*prev_e2
        np.multiply(be, h, out=t2)        # t2 = be*h
        np.add(t1, t2, out=h)             # h = (om + al*prev_e2) + be*h
        np.subtract(R[:, t][:, None], mu, out=e)
        np.log(h, out=t1)                 # t1 = log(h)
        np.multiply(e, e, out=prev_e2)    # prev_e2 = e*e (this step's)
        np.divide(prev_e2, h, out=t2)     # t2 = e*e/h
        np.add(t1, t2, out=t2)            # t2 = log(h) + e*e/h
        if t >= n_min:
            t2[t >= lens, :] = 0.0
        ll += t2
    return 0.5 * ll


def _garch_group(rs: Sequence[np.ndarray]):
    """(mu_best, failed) per series for one padded group — the two-stage
    profile search of `_garch11_resid` vectorized over series. ``failed``
    marks a series whose stage-2 likelihoods were all-NaN (the scalar
    path's np.nanargmin raises there and `heterogeneity`'s except turns
    the WHOLE feature dict NaN — callers must reproduce that)."""
    S = len(rs)
    R, lens = _pad_group(rs)
    mu0 = np.array([float(r.mean()) for r in rs])
    var = np.array([float(np.var(r - m0)) for r, m0 in zip(rs, mu0)])
    rows = np.arange(S)
    with np.errstate(all="ignore"):
        om_floor = 1e-12 * np.maximum(var, 1.0)

        def _stage_ab(ga: np.ndarray, gb: np.ndarray):
            A = np.repeat(ga, gb.shape[1], axis=1)
            B = np.tile(gb, (1, ga.shape[1]))
            ok = A + B < 0.9999
            om = np.clip(var[:, None] * (1.0 - A - B), om_floor[:, None], None)
            mu = np.broadcast_to(mu0[:, None], A.shape)
            ll = _garch_negll_batch(R, lens, mu, om, A, B, var)
            ll = np.where(ok & np.isfinite(ll), ll, np.inf)
            i = np.argmin(ll, axis=1)
            return ll[rows, i], A[rows, i], B[rows, i]

        ga = np.tile(np.linspace(0.0, 0.5, 11), (S, 1))
        gb = np.tile(np.linspace(0.0, 0.98, 11), (S, 1))
        _, a1, b1 = _stage_ab(ga, gb)
        sa, sb = ga[0, 1] - ga[0, 0], gb[0, 1] - gb[0, 0]
        _, a2, b2 = _stage_ab(
            np.clip(np.linspace(a1 - sa, a1 + sa, 7, axis=1), 0.0, 0.9998),
            np.clip(np.linspace(b1 - sb, b1 + sb, 7, axis=1), 0.0, 0.9998),
        )
        se = np.sqrt(var / lens)
        mus = mu0[:, None] + np.linspace(-3.0, 3.0, 13)[None, :] * se[:, None]
        om2 = np.maximum(var * (1.0 - a2 - b2), om_floor)
        ll = _garch_negll_batch(
            R, lens, mus,
            np.broadcast_to(om2[:, None], (S, 13)),
            np.broadcast_to(a2[:, None], (S, 13)),
            np.broadcast_to(b2[:, None], (S, 13)), var,
        )
        allnan = np.all(np.isnan(ll), axis=1)
        # NaN->inf + argmin is EXACTLY np.nanargmin's tie-break (numpy
        # replaces NaN with +inf internally before argmin, so a mixed
        # [nan, inf, ...] row resolves to the first slot in both paths);
        # parity with the scalar _garch11_resid's nanargmin is pinned by
        # tests/test_fit_batch.py::test_garch_degenerate_stage2_tiebreak.
        safe = np.where(np.isnan(ll), np.inf, ll)
        mu_best = mus[rows, np.argmin(safe, axis=1)]
    return mu_best, allnan


_HET_NAN = {"arch_acf": np.nan, "garch_acf": np.nan,
            "arch_r2": np.nan, "garch_r2": np.nan}


def heterogeneity_fit_batch(ys: Sequence[np.ndarray],
                            freq: int = 1,
                            group: int = GROUP) -> List[dict]:
    """`heterogeneity` for every series, GARCH stage batched across
    series: per-series AR whitening + arch/Ljung-Box composition are the
    scalar kernel's code paths verbatim; only the three likelihood time
    loops run batched (elementwise in the (series, candidate) plane, so
    per-series values are identical). Returns the exact per-series
    dicts of ``heterogeneity(y, freq)``."""
    from .features import _ar_order_by_aic, arch_stat

    N = len(ys)
    out: List[dict] = [dict(_HET_NAN) for _ in range(N)]
    pre = {}   # i -> (resid, lb, arch_r2) for series entering the GARCH stage
    for i in range(N):
        try:
            y = np.asarray(ys[i], dtype=float)
            n = len(y)
            order_max = int(min(n - 1, np.floor(10 * np.log10(n)))) if n else 0
            if order_max < 1 or n < order_max + 3:
                continue
            best_p = _ar_order_by_aic(y, order_max)
            if best_p is None:
                continue
            if best_p == 0:
                resid = y - y.mean()
            else:
                mat = st.embed(y, best_p + 1)
                _, resid = st.lstsq_const(mat[:, 1:], mat[:, 0])
            arch_r2 = arch_stat(resid, freq)["arch_lm"]
            lb = float(np.sum(st.acf_biased(resid**2, 12)[1:] ** 2))
            # _garch11_resid's own eligibility guards (None -> partial dict)
            if len(resid) < 20 or float(np.var(resid - resid.mean())) <= 0:
                out[i] = {"arch_acf": lb, "garch_acf": np.nan,
                          "arch_r2": arch_r2, "garch_r2": np.nan}
                continue
            pre[i] = (resid, lb, arch_r2)
        except Exception:
            continue  # scalar path: whole dict NaN
    order = sorted(pre, key=lambda i: len(pre[i][0]))
    lens_all = {i: len(pre[i][0]) for i in pre}
    for idx in _length_groups(order, [lens_all.get(i, 0) for i in range(N)], group):
        rs = [pre[i][0] for i in idx]
        try:
            mu_best, failed = _garch_group(rs)
        except Exception:
            # a group-wide failure must not take down unrelated series:
            # fall back to the scalar kernel for this group only
            from .features import heterogeneity

            for i in idx:
                out[i] = heterogeneity(ys[i], freq)  # scalar guards inside
            continue
        for r_i, i in enumerate(idx):
            resid, lb, arch_r2 = pre[i]
            if failed[r_i]:
                out[i] = dict(_HET_NAN)  # scalar nanargmin raise -> except
                continue
            try:
                g = resid - mu_best[r_i]
                garch_r2 = arch_stat(g, freq)["arch_lm"]
                lb2 = float(np.sum(st.acf_biased(g**2, 12)[1:] ** 2))
                out[i] = {"arch_acf": lb, "garch_acf": lb2,
                          "arch_r2": arch_r2, "garch_r2": garch_r2}
            except Exception:
                out[i] = dict(_HET_NAN)
    return out
