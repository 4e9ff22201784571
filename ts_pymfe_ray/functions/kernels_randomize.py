"""Randomize-group feature kernels (reference:
/root/reference/tspymfe/randomize.py, class MFETSRandomize).

Per-row Monte Carlo.  The reference drives everything from the GLOBAL
numpy seed (randomize.py:294-295, _utils.py:402-403, _surrogates.py:63-64)
— a cluster-reproducibility hazard; the engine derives a per-row
Generator from doc_id instead (SURVEY.md §7.0), so stochastic features are
deterministic per row regardless of scheduling."""

from __future__ import annotations

import numpy as np

from ts_pymfe_ray.registry import FeatureKernel, SeriesCtx, register
from ts_pymfe_ray.functions import stats as _st
from ts_pymfe_ray.functions.kernels_general import _find_crit_pt


def _itrand_snapshots(c: SeriesCtx, strategy: str = "dist-dynamic",
                      prop_rep: float = 2, prop_interval: float = 0.1) -> np.ndarray:
    """Iterative perturbation sampling (randomize.py:175-312): runs the
    sequential perturbation walk and returns the (K, n) matrix of series
    SNAPSHOTS at each report step, so callers can compute their statistic
    over all snapshots in one stacked pass.  The rng draw (one integers()
    call) is identical to the per-stat loop, preserving the shared
    per-row stream's order for downstream kernels."""
    s = np.copy(c.ts_scaled)
    n = s.size
    rep_it = int(np.ceil(prop_interval * n))
    num_it = int(np.ceil(prop_rep * n))
    num_it += num_it % rep_it
    src = c.ts_scaled if strategy == "dist-static" else s
    swap = strategy == "permute"
    rng = c.rng
    inds = rng.integers(n, size=(num_it, 2))
    S = np.empty((1 + num_it // rep_it, n))
    k = 0
    for it, (a, b) in enumerate(inds):
        if swap:
            s[a], src[b] = src[b], s[a]
        else:
            s[a] = src[b]
        if it % rep_it == 0:
            S[k] = s
            k += 1
    return S[:k]


register(FeatureKernel(
    "itrand_mean", "randomize",
    # axis-mean over contiguous rows == per-row np.mean bitwise
    lambda c: _itrand_snapshots(c).mean(axis=1),
    returns_array=True, cost="medium", ref="randomize.py:315",
))
register(FeatureKernel(
    "itrand_sd", "randomize",
    lambda c: np.std(_itrand_snapshots(c), axis=1, ddof=1),
    returns_array=True, cost="medium", ref="randomize.py:410",
))


def _itrand_acf1(c: SeriesCtx) -> np.ndarray:
    S = _itrand_snapshots(c)
    if S.shape[1] <= 2:
        return np.full(S.shape[0], np.nan)
    return _st.acf_stack(S, nlags=1)[:, 0]


register(FeatureKernel(
    "itrand_acf", "randomize", _itrand_acf1,
    returns_array=True, cost="medium", ref="randomize.py:505 (lag-1 ACF)",
))


def _samples(arr: np.ndarray, rng: np.random.Generator, num_samples: int, frac: float):
    """Random contiguous subsamples (reference apply_on_samples,
    _utils.py:353-415)."""
    size = int(np.ceil(arr.size * frac))
    starts = rng.integers(arr.size - size + 1, size=num_samples)
    return (arr[s : s + size] for s in starts)


def _resample_std(c: SeriesCtx) -> np.ndarray:
    # equal-size windows: one axis-reduction (bitwise == per-row np.std,
    # parity-asserted in tests/test_kernels.py)
    W = np.stack(list(_samples(c.ts_scaled, c.rng, 64, 0.1)))
    return np.std(W, axis=1, ddof=1)


register(FeatureKernel(
    "resample_std", "randomize", _resample_std,
    returns_array=True, cost="medium",
    ref="randomize.py:604 (64 samples of 10% of the scaled series)",
))


def _resample_acf_stat(c: SeriesCtx, locmin: bool) -> np.ndarray:
    # equal-size contiguous windows -> ONE batched FFT ACF pass instead of
    # 128 per-window transforms (tolerance-compared surface, not bitwise),
    # and the crit-point / nonpos scan vectorized across all rows — the
    # comparisons are elementwise, so first-hit indices match the per-row
    # _find_crit_pt path exactly
    W = np.stack(list(_samples(c.ts, c.rng, 128, 0.2)))
    A = _st.acf_stack(W, nlags=W.shape[1] // 2)
    L = A.shape[1]
    if locmin:
        if L <= 2:
            return np.full(128, np.nan)
        d1 = np.diff(A, axis=1)
        crit = np.zeros((128, L), dtype=bool)
        crit[:, 1:-1] = (d1[:, 1:] * d1[:, :-1] < 0) & (np.diff(d1, axis=1) > 0)
        mask = crit
    else:
        mask = A <= 0
    has = mask.any(axis=1)
    first = np.argmax(mask, axis=1).astype(np.float64)
    return np.where(has, first + 1, np.nan)


register(FeatureKernel(
    "resample_first_acf_nonpos", "randomize",
    lambda c: _resample_acf_stat(c, False),
    returns_array=True, cost="medium", ref="randomize.py:658",
))
register(FeatureKernel(
    "resample_first_acf_locmin", "randomize",
    lambda c: _resample_acf_stat(c, True),
    returns_array=True, cost="medium", ref="randomize.py:711",
))


def iaaft(ts: np.ndarray, rng: np.random.Generator, max_iter: int = 128,
          atol: float = 1e-8, rtol: float = 1e-10) -> np.ndarray:
    """IAAFT surrogate (reference _surrogates.py:8-78)."""
    ampl = np.abs(np.fft.rfft(ts))
    srt = np.sort(ts)
    err_prev = -1.0
    ts_fft = np.fft.rfft(rng.permutation(ts))
    ts_sur = ts
    rank = np.empty(ts.size, dtype=np.intp)
    ar = np.arange(ts.size)
    for _ in range(max_iter):
        s = np.fft.irfft(ampl * ts_fft / (1e-8 + np.abs(ts_fft)), n=ts.size).real
        # rank via scatter: argsort of a permutation is its exact inverse,
        # so this equals argsort(argsort(s)) bitwise at half the sort cost
        rank[np.argsort(s)] = ar
        ts_sur = srt[rank]
        ts_fft = np.fft.rfft(ts_sur)
        err_cur = float(np.sqrt(np.mean((ampl**2 - np.abs(ts_fft) ** 2) ** 2)))
        if abs(err_cur - err_prev) <= atol + rtol * abs(err_prev):
            break
        err_prev = err_cur
    return ts_sur


def _trev_at_lag(x: np.ndarray, lag: int) -> float:
    d = x[lag:] - x[:-lag]
    return float(np.mean(d**3) / np.mean(d**2) ** 1.5)


def _tc3_at_lag(x: np.ndarray, lag: int) -> float:
    if x.size <= 2 * lag:
        return np.nan
    aux = x[: -2 * lag] * x[lag:-lag]
    return float(np.mean(aux * x[2 * lag :]) / np.abs(np.mean(aux)) ** 1.5)


def _surr_stat(c: SeriesCtx, stat, surrogate_num: int = 32) -> np.ndarray:
    from ts_pymfe_ray.functions.kernels_autocorr import embed_lag

    lag = embed_lag(c)
    vals = np.empty(surrogate_num)
    for i in range(surrogate_num):
        vals[i] = stat(iaaft(c.ts, c.rng), lag)
    base = stat(c.ts, lag)
    return vals / base


register(FeatureKernel(
    "surr_trev", "randomize",
    lambda c: _surr_stat(c, _trev_at_lag),
    returns_array=True, cost="heavy",
    ref="randomize.py:764, _surrogates.py:8-170",
))
register(FeatureKernel(
    "surr_tc3", "randomize",
    lambda c: _surr_stat(c, _tc3_at_lag),
    returns_array=True, cost="heavy", ref="randomize.py:891",
))
