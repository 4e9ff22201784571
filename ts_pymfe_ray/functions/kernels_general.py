"""General-group feature kernels (reference: /root/reference/tspymfe/general.py,
class MFETSGeneral).  Pure numpy, O(n) or O(n log n) per row; sequential
recursions (walker, moving_threshold) are vectorized where a closed form
exists and otherwise bounded by the analysis cap."""

from __future__ import annotations

import numpy as np

from ts_pymfe_ray.registry import FeatureKernel, SeriesCtx, register
from ts_pymfe_ray.functions import stats as _st


def _find_crit_pt(arr: np.ndarray, type_: str) -> np.ndarray:
    """Critical points (reference _utils.py:170-213)."""
    if arr.size <= 2:
        raise ValueError("array too small")
    d1 = np.diff(arr)
    turning = d1[1:] * d1[:-1] < 0
    if type_ == "plateau":
        d2 = np.diff(d1)
        res = np.logical_and(np.isclose(d2, 0), np.isclose(d1[:-1], 0))
        return np.hstack((False, res, False))
    if type_ == "non-plateau":
        return np.hstack((False, turning, False))
    if type_ == "any":
        d2 = np.diff(d1)
        plat = np.hstack((False, np.logical_and(np.isclose(d2, 0), np.isclose(d1[:-1], 0)), False))
        return np.logical_or(np.hstack((False, turning, False)), plat)
    d2 = np.diff(d1)
    interest = d2 < 0 if type_ == "max" else d2 > 0
    return np.hstack((False, np.logical_and(turning, interest), False))


def _discretize(ts: np.ndarray, num_bins: int = 10, strategy: str = "equal-width") -> np.ndarray:
    """Reference _utils.py:418-463."""
    if strategy == "equal-width":
        bins = np.histogram(ts, num_bins)[1][:-1]
    else:
        bins = np.quantile(ts, np.linspace(0, 1, num_bins + 1)[:-1])
    return np.digitize(ts, bins).astype(int)


def _walker(ts_scaled: np.ndarray, step_size: float = 0.1) -> np.ndarray:
    """Exponential-filter particle w[i] = w[i-1] + s*(ts[i-1]-w[i-1])
    (reference general.py:299-333) — vectorized closed form in chunks to
    avoid (1-s)^-i overflow."""
    n = ts_scaled.size
    w = np.empty(n, dtype=np.float64)
    s = step_size
    a = 1.0 - s
    prev = 0.0
    chunk = 256
    for st in range(0, n, chunk):
        en = min(n, st + chunk)
        m = en - st
        # w[st+j] = a^j * prev_pos + s * sum_{k<j} a^(j-1-k) * ts[st+k-1+...]
        # driven by inputs u[j] = ts[st + j - 1] (u[0] uses ts[st-1] or start)
        u = ts_scaled[st - 1 : en - 1] if st > 0 else np.concatenate([[0.0], ts_scaled[: m - 1]])
        if st == 0:
            u[0] = 0.0  # w[0] = start_point = 0
        pow_a = a ** np.arange(m, dtype=np.float64)
        # y[j] = w[st+j]/a^j ; y[j] = y[j-1] + (s/a^j) u[j] ... with y[-1]=prev
        if st == 0:
            # w[0] = 0 exactly; recursion starts at j=1
            contrib = np.concatenate([[0.0], s * u[1:] / pow_a[1:]])
            y = np.cumsum(contrib)
            w[st:en] = y * pow_a
        else:
            contrib = s * u / pow_a  # j = 0..m-1 uses a^-(j) scaled by a
            # w[st+j] = a^(j+1)*prev + s*sum_{k<=j} a^(j-k) u[k]
            y = np.cumsum(u / pow_a)
            w[st:en] = pow_a * a * prev + s * pow_a * y
        prev = w[en - 1]
    return w


# --------------------------------------------------------------------- kernels


register(FeatureKernel(
    "length", "general",
    lambda c: float(c.ts_all.size),
    ref="general.py:336 (ft_length = ts.size; full series, not capped)",
))

register(FeatureKernel(
    "diff", "general",
    lambda c: np.diff(c.ts),
    returns_array=True,
    ref="general.py:358 (ft_diff, order=1)",
))

register(FeatureKernel(
    "period", "general",
    lambda c: float(c.period),
    ref="general.py:377 -> _period.py:14-45",
))

register(FeatureKernel(
    "turning_points", "general",
    lambda c: _find_crit_pt(c.ts, "non-plateau").astype(float),
    returns_array=True,
    ref="general.py:398, _utils.py:170-213",
))

register(FeatureKernel(
    "turning_points_trend", "general",
    lambda c: _find_crit_pt(c.ts_trend, "non-plateau").astype(float),
    returns_array=True, cost="medium",
    ref="general.py:431",
))


def _step_changes(ts: np.ndarray, ddof: int = 1) -> np.ndarray:
    """O(n) rewrite of the reference's O(n^2) prefix loop
    (general.py:461-506): prefix std via running (n, sum, sumsq)."""
    n = ts.size
    cs = np.cumsum(ts)
    cs2 = np.cumsum(ts * ts)
    cnt = np.arange(1, n + 1, dtype=np.float64)
    cmeans = cs / cnt
    mean_abs_div = np.abs(ts[1:] - cmeans[:-1])
    # prefix std of ts[:i] for i = 1+ddof .. n-1 (ddof degrees of freedom)
    i = np.arange(1 + ddof, n)
    pn = i.astype(np.float64)
    var = (cs2[i - 1] - pn * cmeans[i - 1] ** 2) / (pn - ddof)
    var = np.maximum(var, 0.0)
    return (mean_abs_div[i - 1] > 2.0 * np.sqrt(var)).astype(float)


register(FeatureKernel(
    "step_changes", "general",
    lambda c: _step_changes(c.ts),
    returns_array=True,
    ref="general.py:461 (O(n) rewrite of the O(n^2) prefix-std loop)",
))

register(FeatureKernel(
    "step_changes_trend", "general",
    lambda c: _step_changes(c.ts_trend),
    returns_array=True, cost="medium",
    ref="general.py:508",
))


def _frac_cp(c: SeriesCtx) -> float:
    s = c.ts_scaled
    thr = np.median(s)
    higher = s <= thr
    return float(np.logical_xor(higher[1:], higher[:-1]).sum() / (s.size - 1))


register(FeatureKernel("frac_cp", "general", _frac_cp, ref="general.py:702-768"))

register(FeatureKernel(
    "bin_mean", "general",
    lambda c: (c.ts >= c.ts.mean()).astype(float),
    returns_array=True,
    ref="general.py:769",
))


def _fs_len(c: SeriesCtx) -> np.ndarray:
    ts_disc = _discretize(c.ts, 10)
    # run lengths; reference drops the final run (general.py:797-854 loop)
    change = np.flatnonzero(ts_disc[1:] != ts_disc[:-1])
    if change.size == 0:
        return np.empty(0)
    lens = np.diff(np.concatenate([[-1], change])).astype(float)
    return lens


register(FeatureKernel("fs_len", "general", _fs_len, returns_array=True,
                       ref="general.py:797 (vectorized run-length encode)"))


def _season_mode_ind(season: np.ndarray, period: int, indfunc) -> float:
    num = season.size // period
    if num < 1:
        return np.nan
    mat = season[: num * period].reshape(num, period)
    inds = indfunc(mat, axis=1)
    # scipy.stats.mode: smallest most-frequent value
    vals, counts = np.unique(inds, return_counts=True)
    return float(vals[np.argmax(counts)] + 1)


def _peak_frac(c: SeriesCtx) -> float:
    p = c.period
    if p <= 1:
        return np.nan
    return _season_mode_ind(c.ts_season, p, np.argmax) / p


def _trough_frac(c: SeriesCtx) -> float:
    p = c.period
    if p <= 1:
        return np.nan
    return _season_mode_ind(c.ts_season, p, np.argmin) / p


register(FeatureKernel("peak_frac", "general", _peak_frac, cost="medium",
                       ref="general.py:855, helper 274-296"))
register(FeatureKernel("trough_frac", "general", _trough_frac, cost="medium",
                       ref="general.py:925"))


def _walker_path(c: SeriesCtx) -> np.ndarray:
    w = _walker(c.ts_scaled)
    return np.abs(w - c.ts_scaled)


def _walker_cross_frac(c: SeriesCtx) -> float:
    s = c.ts_scaled
    w = _walker(s)
    cross = (w[1:] - s[1:]) * (w[:-1] - s[:-1]) < 0
    return float(cross.sum() / (s.size - 1))


register(FeatureKernel("walker_path", "general", _walker_path, returns_array=True,
                       ref="general.py:995, _ts_walker:299-333 (vectorized exp filter)"))
register(FeatureKernel("walker_cross_frac", "general", _walker_cross_frac,
                       ref="general.py:1069"))


def _moving_threshold(c: SeriesCtx, rate_absorption: float = 0.1, rate_decay: float = 0.1) -> np.ndarray:
    """Sequential absorb/decay threshold (general.py:1151-1241); genuinely
    state-dependent branching -> bounded Python scan (analysis cap)."""
    s = np.abs(c.ts_scaled)
    ra, rd = 1.0 + rate_absorption, 1.0 - rate_decay
    thr = np.empty(1 + s.size)
    thr[0] = 1.0
    t = 1.0
    for i, v in enumerate(s):
        t = ra * v if v > t else rd * t
        thr[i + 1] = t
    return thr[1:] - s


register(FeatureKernel("moving_threshold", "general", _moving_threshold,
                       returns_array=True, cost="medium",
                       ref="general.py:1151-1241"))


def _embed_in_shell(c: SeriesCtx, radii=(0.0, 1.0), dim: int = 2) -> float:
    from ts_pymfe_ray.functions.embed import embed_ts

    lag = int(_emb_lag(c))  # reference default lag=None -> auto via emb_lag
    emb = embed_ts(c.ts_scaled, dim=dim, lag=lag)
    norms = np.linalg.norm(emb, axis=1)
    r_in, r_out = radii
    return float(np.mean((norms >= r_in) & (norms <= r_out)))


register(FeatureKernel("embed_in_shell", "general", _embed_in_shell, cost="medium",
                       ref="general.py:1244"))


def _stick_angles(c: SeriesCtx) -> np.ndarray:
    s = c.ts_scaled
    norm = s.size - 1

    def ang(inds):
        if inds.size < 2:
            return np.empty(0)
        tangent = np.diff(s[inds]) / np.diff(inds)
        return np.arctan(norm * tangent)

    nonneg = s >= 0
    return np.hstack([ang(np.flatnonzero(nonneg)), ang(np.flatnonzero(~nonneg))])


register(FeatureKernel("stick_angles", "general", _stick_angles, returns_array=True,
                       ref="general.py:1478"))


def _emb_lag(c: SeriesCtx, max_nlags: int | None = None) -> float:
    """Embedding lag = first non-significant detrended-ACF lag, default
    threshold 1.96/sqrt(n); fallback 1 (reference general.py:1528,
    _embed.py:346-455)."""
    acfs = c.detrended_acfs
    thr = 1.96 / np.sqrt(c.ts.size)
    below = np.flatnonzero(np.abs(acfs) <= thr)
    if below.size == 0:
        return 1.0
    return float(below[0] + 1)


register(FeatureKernel("emb_lag", "general", _emb_lag, cost="medium",
                       ref="general.py:1528, _embed.py:346-455"))
