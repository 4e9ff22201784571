"""Local-statistics feature kernels (reference:
/root/reference/tspymfe/local_stats.py, class MFETSLocalStats) — the
rolling-window suite at the heart of the rollup engine.

The reference computes every moving_* via pandas ``rolling(w,
center=True).apply(...)`` — O(n*w) per stat, O(n*w^2) for the .apply ones.
Here each rolling statistic is an O(n) sliding-sketch computation (running
power sums / comoments via cumsum), exactly the same algebra the tier
rollup uses (SURVEY.md §7.0).  Centered windows with min_periods=window +
remove_nan=True reduce to the n-w+1 fully-valid windows, which is what the
sliding implementation produces directly.

All moving_* operate on the z-scored series; window size =
process_window_size(ts, 0.1) forced odd (reference _utils.py:36-67).
``*_shift`` variants are |diff(moving_stat)| (lag 1, order 1 defaults,
local_stats.py:176-253).
"""

from __future__ import annotations

import math

import numpy as np

from ts_pymfe_ray.registry import FeatureKernel, SeriesCtx, register
from ts_pymfe_ray.functions import stats as _st


def process_window_size(n: int, window_size: float = 0.1) -> int:
    """Reference _utils.py:36-67."""
    if 0 < window_size < 1:
        w = max(1, math.ceil(window_size * n))  # == int(np.ceil(...)), same double
    else:
        w = min(n, int(window_size))
    if w % 2 == 0:
        w -= 1
    return int(w)


def _sliding_sums(x: np.ndarray, w: int, power: int = 1) -> np.ndarray:
    xp = x if power == 1 else x**power
    c = np.concatenate([[0.0], np.cumsum(xp)])
    return c[w:] - c[:-w]


def _power_prefixes(x: np.ndarray) -> np.ndarray:
    """(4, n+1) prefix sums of x^1..x^4 in ONE stacked cumsum — bitwise
    identical to four separate cumsums (accumulate is per-row) and shared
    by every moving-stat kernel of a row via the ctx cache.  Powers use
    np.power (x**3/x**4 differ bitwise from repeated multiplication, and
    the committed goldens pin the np.power values)."""
    P = np.zeros((4, x.size + 1))
    np.cumsum(np.stack([x, x * x, x**3, x**4]), axis=1, out=P[:, 1:])
    return P


def _power_prefixes_stack(X: np.ndarray) -> np.ndarray:
    """Batched :func:`_power_prefixes` for an (R, n) stack -> (R, 4, n+1);
    bitwise identical per row (cumsum over the last axis is per-row)."""
    R, n = X.shape
    A = np.stack([X, X * X, X**3, X**4], axis=1)
    P = np.zeros((R, 4, n + 1))
    np.cumsum(A, axis=2, out=P[:, :, 1:])
    return P


def _psums(P: np.ndarray, w: int, power: int) -> np.ndarray:
    # dimension-agnostic: P is (4, n+1) per row or (R, 4, n+1) stacked;
    # slicing along the last axis keeps every op per-row (bitwise-equal)
    c = P[..., power - 1, :]
    return c[..., w:] - c[..., :-w]


def _window_of(c: SeriesCtx) -> int:
    return process_window_size(c.ts.size, 0.1)


def moving_mean(s: np.ndarray, w: int, P: np.ndarray | None = None) -> np.ndarray:
    s1 = _psums(P, w, 1) if P is not None else _sliding_sums(s, w)
    return s1 / w


def moving_var(s: np.ndarray, w: int, P: np.ndarray | None = None, ddof: int = 1) -> np.ndarray:
    s1 = _psums(P, w, 1) if P is not None else _sliding_sums(s, w)
    s2 = _psums(P, w, 2) if P is not None else _sliding_sums(s, w, 2)
    v = (s2 - s1 * s1 / w) / (w - ddof)
    return np.maximum(v, 0.0)


def moving_skewness(s: np.ndarray, w: int, P: np.ndarray | None = None) -> np.ndarray:
    """e1071 method-3, bias=True per window (local_stats.py:671)."""
    if P is None:
        P = _power_prefixes(s)
    s1, s2, s3 = _psums(P, w, 1), _psums(P, w, 2), _psums(P, w, 3)
    mu = s1 / w
    m2 = s2 / w - mu**2
    m3 = s3 / w - 3 * mu * s2 / w + 2 * mu**3
    with np.errstate(all="ignore"):
        g1 = np.where(m2 > 0, m3 / np.power(np.maximum(m2, 0), 1.5), 0.0)
    return g1 * ((w - 1.0) / w) ** 1.5


def moving_kurtosis(s: np.ndarray, w: int, P: np.ndarray | None = None) -> np.ndarray:
    if P is None:
        P = _power_prefixes(s)
    s1, s2, s3, s4 = (_psums(P, w, k) for k in (1, 2, 3, 4))
    mu = s1 / w
    m2 = s2 / w - mu**2
    m4 = s4 / w - 4 * mu * s3 / w + 6 * mu**2 * s2 / w - 3 * mu**4
    with np.errstate(all="ignore"):
        g2 = np.where(m2 > 0, m4 / np.maximum(m2, 1e-300) ** 2 - 3.0, -3.0)
    return (g2 + 3.0) * (1.0 - 1.0 / w) ** 2 - 3.0


def moving_acf1(s: np.ndarray, w: int, P: np.ndarray | None = None, adjusted: bool = True) -> np.ndarray:
    """Rolling lag-1 ACF, statsmodels semantics per window
    (local_stats.py:1031: rolling apply of ft_acf(nlags=1, adjusted)):
    acf1 = (sum_pairs/(w-1)) / (var_pop) with var_pop = ss/w.
    Dimension-agnostic (1-D row or (R, n) stack), per-row bitwise."""
    s1 = _psums(P, w, 1) if P is not None else _sliding_sums(s, w)
    s2 = _psums(P, w, 2) if P is not None else _sliding_sums(s, w, 2)
    prod = s[..., :-1] * s[..., 1:]
    cp = np.zeros(prod.shape[:-1] + (prod.shape[-1] + 1,))
    np.cumsum(prod, axis=-1, out=cp[..., 1:])
    c1 = cp[..., w - 1 :] - cp[..., : -(w - 1)]  # sum of w-1 in-window pairs
    nw = s1.shape[-1]
    c1 = c1[..., :nw]
    mu = s1 / w
    first = s[..., :nw]
    last = s[..., w - 1 :]
    num = c1 - mu * (2 * s1 - first - last) + (w - 1) * mu**2
    den = s2 - w * mu**2
    with np.errstate(all="ignore"):
        acf1 = num / den
        if adjusted:
            acf1 = acf1 * w / (w - 1.0)
    return acf1


def moving_gmean(s: np.ndarray, w: int, P: np.ndarray | None = None) -> np.ndarray:
    """scipy.stats.gmean per window: NaN whenever the window holds a
    non-positive value (log-domain), matching scipy on z-scored input."""
    with np.errstate(all="ignore"):
        logs = np.where(s > 0, np.log(np.maximum(s, 1e-300)), np.nan)
    c = np.zeros(logs.shape[:-1] + (logs.shape[-1] + 1,))
    np.nancumsum(logs, axis=-1, out=c[..., 1:])
    sums = c[..., w:] - c[..., :-w]
    bad = np.zeros(logs.shape[:-1] + (logs.shape[-1] + 1,))
    np.cumsum(~np.isfinite(logs) | np.isnan(logs), axis=-1, out=bad[..., 1:])
    nbad = bad[..., w:] - bad[..., :-w]
    out = np.exp(sums / w)
    out[nbad > 0] = np.nan
    return out


def _postprocess(vals: np.ndarray, shift: bool) -> np.ndarray:
    vals = vals[np.isfinite(vals) | np.isnan(vals)]
    if shift:
        v = vals[~np.isnan(vals)]
        return np.abs(v[1:] - v[:-1])  # == np.diff, minus its dispatch cost
    return vals


def _mk_moving(name: str, stat_fn, shift: bool):
    def fn(c: SeriesCtx) -> np.ndarray:
        w = _window_of(c)
        if w < 2 or c.ts.size < w:
            return np.full(1, np.nan)
        # base rolling stat cached per row: the _shift variant reuses the
        # non-shift computation, and all moving stats share ONE cached
        # power-prefix matrix instead of recomputing cumsums per kernel
        P = c._get("mvpow", lambda: _power_prefixes(c.ts_scaled))
        vals = c._get(f"mv_{name}_{w}", lambda: stat_fn(c.ts_scaled, w, P))
        vals = vals[~np.isnan(vals)] if not shift else vals
        return _postprocess(vals, shift)

    return fn


# (registered name, stat fn, reference line); the stat fns are
# dimension-agnostic so the feature stage can seed `mv_{name}_{w}` from an
# (R, n) stack (stages/features.py::preseed_stacked)
MOVING_BASE_STATS = (
    ("moving_avg", moving_mean, "local_stats.py:256"),
    ("moving_var", moving_var, "local_stats.py:388"),
    ("moving_sd", lambda s, w, P=None: np.sqrt(moving_var(s, w, P)), "local_stats.py:543"),
    ("moving_skewness", moving_skewness, "local_stats.py:671"),
    ("moving_kurtosis", moving_kurtosis, "local_stats.py:849"),
    ("moving_acf", moving_acf1, "local_stats.py:1031"),
    ("moving_gmean", moving_gmean, "local_stats.py:1162"),
)

for _name, _fn, _ref in MOVING_BASE_STATS:
    register(FeatureKernel(_name, "local_stats", _mk_moving(_name, _fn, False),
                           returns_array=True, ref=_ref + " (O(n) sliding sketch)"))
    register(FeatureKernel(_name + "_shift", "local_stats", _mk_moving(_name, _fn, True),
                           returns_array=True, ref=_ref + " shift variant"))


def _moving_kldiv(c: SeriesCtx, remove_inf: bool = True) -> np.ndarray:
    """KL divergence of consecutive window density histograms
    (local_stats.py:1281).  Vectorized: per-window 10-bin histograms for
    ALL stride-1 windows in one bincount, then KL(next||cur) row-wise.
    Each window keeps its own equal-width bin range like np.histogram."""

    def _build():
        s = c.ts_scaled
        w = _window_of(c)
        if s.size <= w + 1:
            return np.full(1, np.nan)
        from numpy.lib.stride_tricks import sliding_window_view

        m = s.size - w  # windows 0..m-1 (reference computes m-1 divergences)
        wins = sliding_window_view(s, w)[:m]
        lo = wins.min(axis=1, keepdims=True)
        hi = wins.max(axis=1, keepdims=True)
        rng_ = np.where(hi > lo, hi - lo, 1.0)
        idx = ((wins - lo) * (10.0 / rng_)).astype(np.int64)
        np.minimum(idx, 9, out=idx)
        rows = np.arange(m)[:, None]
        counts = np.bincount((rows * 10 + idx).ravel(), minlength=m * 10).reshape(m, 10)
        p = counts / w  # per-window distribution (normalization cancels)
        cur, nxt = p[:-1], p[1:]
        with np.errstate(all="ignore"):
            terms = np.where(nxt > 0, nxt * np.log(nxt / cur), 0.0)
            out = terms.sum(axis=1)
            out[np.logical_and(nxt > 0, cur == 0).any(axis=1)] = np.inf
        # reference quirk kept: result array is length n-w with a trailing
        # 0.0 that the loop never fills (local_stats.py:1341-1353)
        return np.concatenate([out, [0.0]])

    out = c._get("moving_kldiv", _build)
    if remove_inf:
        out = out[np.isfinite(out)]
    return out


register(FeatureKernel("moving_kldiv", "local_stats", _moving_kldiv,
                       returns_array=True, cost="medium",
                       ref="local_stats.py:1281"))


def _moving_kldiv_shift(c: SeriesCtx) -> np.ndarray:
    vals = _moving_kldiv(c, remove_inf=True)
    return np.abs(np.diff(vals[~np.isnan(vals)]))


register(FeatureKernel("moving_kldiv_shift", "local_stats", _moving_kldiv_shift,
                       returns_array=True, cost="medium",
                       ref="local_stats.py:1364"))


def lilliefors_statistic(x: np.ndarray) -> float:
    """Lilliefors KS statistic vs normal with estimated params
    (statsmodels lilliefors, statistic only; stat_tests.py:425)."""
    from ts_pymfe_ray.functions.special import norm_cdf_vec

    n = x.size
    if n < 4:
        return np.nan
    mu, sd = x.mean(), x.std(ddof=1)
    if sd == 0:
        return np.nan
    z = np.sort((x - mu) / sd)
    cdf = norm_cdf_vec(z)
    ecdf_hi = np.arange(1, n + 1) / n
    ecdf_lo = np.arange(0, n) / n
    return float(max(np.max(cdf - ecdf_lo), np.max(ecdf_hi - cdf)))


def _moving_lilliefors(c: SeriesCtx) -> np.ndarray:
    s = c.ts_scaled
    w = _window_of(c)
    if s.size < w or w < 4:
        return np.full(1, np.nan)
    from numpy.lib.stride_tricks import sliding_window_view

    wins = sliding_window_view(s, w)
    return np.array([lilliefors_statistic(win) for win in wins])


register(FeatureKernel("moving_lilliefors", "local_stats", _moving_lilliefors,
                       returns_array=True, cost="heavy",
                       ref="local_stats.py:1451"))


def _moving_approx_ent(c: SeriesCtx) -> np.ndarray:
    from ts_pymfe_ray.functions.kernels_info import approx_entropy

    s = c.ts_scaled
    w = _window_of(c)
    if s.size < w or w < 8:
        return np.full(1, np.nan)
    from numpy.lib.stride_tricks import sliding_window_view

    wins = sliding_window_view(s, w)
    # reference evaluates every stride-1 window (O(n * w^2)); the engine
    # strides so at most 64 windows are evaluated — the mean/sd summary
    # over a uniform subsample converges to the same value (documented
    # cost bound for the single most expensive reference feature)
    stride = max(1, wins.shape[0] // 64)
    return np.array([approx_entropy(_st.standardize_ts(win)) for win in wins[::stride]])


register(FeatureKernel("moving_approx_ent", "local_stats", _moving_approx_ent,
                       returns_array=True, cost="heavy",
                       ref="local_stats.py:1528"))


# ------------------------------------------------------------------ tiles


def _tile_stats(c: SeriesCtx, num_tiles: int = 16) -> dict[str, np.ndarray]:
    """Per-tile mean/var/min/max in one reduceat pass.  Tile boundaries =
    np.array_split semantics (reference _utils.py:11-33: first n%k tiles
    get one extra element); cached per row."""

    def _build():
        s = c.ts_scaled
        n = s.size
        if num_tiles > 0.5 * n:
            raise ValueError("num_tiles larger than half the series size")
        base, extra = divmod(n, num_tiles)
        sizes = np.full(num_tiles, base, dtype=np.int64)
        sizes[:extra] += 1
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        cnt = sizes.astype(np.float64)
        s1 = np.add.reduceat(s, starts)
        s2 = np.add.reduceat(s * s, starts)
        mean = s1 / cnt
        with np.errstate(all="ignore"):
            var = (s2 - cnt * mean**2) / (cnt - 1)
        return {
            "mean": mean,
            "var": np.maximum(var, 0.0),
            "min": np.minimum.reduceat(s, starts),
            "max": np.maximum.reduceat(s, starts),
        }

    return c._get(f"tiles{num_tiles}", _build)


register(FeatureKernel(
    "lumpiness", "local_stats",
    lambda c: _tile_stats(c)["var"],
    returns_array=True, ref="local_stats.py:1624",
))
register(FeatureKernel(
    "stability", "local_stats",
    lambda c: _tile_stats(c)["mean"],
    returns_array=True, ref="local_stats.py:1684",
))


def _local_extrema(c: SeriesCtx) -> np.ndarray:
    t = _tile_stats(c)
    return np.where(np.abs(t["min"]) <= t["max"], t["max"], t["min"])


register(FeatureKernel("local_extrema", "local_stats", _local_extrema,
                       returns_array=True, ref="local_stats.py:1736"))
register(FeatureKernel(
    "local_range", "local_stats",
    lambda c: _tile_stats(c)["max"] - _tile_stats(c)["min"],
    returns_array=True, ref="local_stats.py:1791",
))
