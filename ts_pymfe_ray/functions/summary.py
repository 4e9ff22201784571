"""Summary reducers — all 32 of the reference registry
(/root/reference/tspymfe/_summary.py:450-485), pure numpy.

A summary reduces an array-valued feature into fixed-width output
(reference tsmfe.py:525-549).  Multi-output summaries (histogram,
quantiles) expand into suffixed columns ``name.summary.i``.  Exceptions
during summarization become NaN (reference _internal.py:547-553).
"""

from __future__ import annotations

import numpy as np

from ts_pymfe_ray.functions.stats import kurtosis as _kurt
from ts_pymfe_ray.functions.stats import skewness as _skew


def _as_arr(v) -> np.ndarray:
    return np.asarray(v, dtype=np.float64)


def _nn(v):  # drop nan
    v = _as_arr(v)
    return v[~np.isnan(v)]


def sum_histogram(v, bins: int = 10, normalize: bool = True):
    v = _as_arr(v)
    if v.size == 0 or not np.isfinite(v).all():
        if _nn(v).size == 0:
            return np.full(bins, np.nan)
    try:
        freqs, _ = np.histogram(v, bins=bins)
    except ValueError:
        return np.full(bins, np.nan)
    return freqs / freqs.sum() if normalize else freqs.astype(float)


def sum_nanhistogram(v, bins: int = 10, normalize: bool = True):
    return sum_histogram(_nn(v), bins=bins, normalize=normalize)


def sum_quantiles(v):
    v = _as_arr(v)
    if v.size == 0:
        return np.full(5, np.nan)
    return np.quantile(v, (0.0, 0.25, 0.5, 0.75, 1.0))


def sum_nanquantiles(v):
    return sum_quantiles(_nn(v))


def sum_skewness(v, method: int = 3, bias: bool = True):
    v = _as_arr(v)
    return _skew(v, method=method, bias=bias) if v.size else np.nan


def sum_kurtosis(v, method: int = 3, bias: bool = True):
    v = _as_arr(v)
    return _kurt(v, method=method, bias=bias) if v.size else np.nan


def sum_powersum(v, p: float = 2.0):
    v = _as_arr(v)
    return float(np.sum(v**p)) if v.size else np.nan


def sum_pnorm(v, p: float = 2.0):
    v = _as_arr(v)
    return float(np.sum(np.abs(v) ** p) ** (1.0 / p)) if v.size else np.nan


def _guard(fn):
    def wrapped(v):
        v = _as_arr(v)
        if v.size == 0:
            return np.nan
        with np.errstate(all="ignore"):
            return float(fn(v))

    return wrapped


SUMMARY_METHODS = {
    "mean": _guard(np.mean),
    "nanmean": _guard(lambda v: np.nanmean(v)),
    "sd": _guard(lambda v: np.std(v, ddof=1)),
    "nansd": _guard(lambda v: np.nanstd(v, ddof=1)),
    "var": _guard(lambda v: np.var(v, ddof=1)),
    "nanvar": _guard(lambda v: np.nanvar(v, ddof=1)),
    "count": lambda v: float(_as_arr(v).size),
    "nancount": lambda v: float(_nn(v).size),
    "histogram": sum_histogram,
    "nanhistogram": sum_nanhistogram,
    "iq_range": _guard(lambda v: np.quantile(v, 0.75) - np.quantile(v, 0.25)),
    "naniq_range": lambda v: SUMMARY_METHODS["iq_range"](_nn(v)),
    "kurtosis": sum_kurtosis,
    "nankurtosis": lambda v: sum_kurtosis(_nn(v)),
    "max": _guard(np.max),
    "nanmax": _guard(lambda v: np.nanmax(v)),
    "median": _guard(np.median),
    "nanmedian": _guard(lambda v: np.nanmedian(v)),
    "min": _guard(np.min),
    "nanmin": _guard(lambda v: np.nanmin(v)),
    "quantiles": sum_quantiles,
    "nanquantiles": sum_nanquantiles,
    "range": _guard(np.ptp),
    "nanrange": lambda v: SUMMARY_METHODS["range"](_nn(v)),
    "skewness": sum_skewness,
    "nanskewness": lambda v: sum_skewness(_nn(v)),
    "sum": _guard(np.sum),
    "nansum": _guard(lambda v: np.nansum(v)),
    "powersum": sum_powersum,
    "nanpowersum": lambda v: sum_powersum(_nn(v)),
    "pnorm": sum_pnorm,
    "nanpnorm": lambda v: sum_pnorm(_nn(v)),
}

# output widths for multi-output summaries (fixed at plan time)
MULTI_OUTPUT = {"histogram": 10, "nanhistogram": 10, "quantiles": 5, "nanquantiles": 5}


def apply_summary(name: str, values) -> dict[str, float]:
    """Apply one summary; returns {suffix: value} — multi-output summaries
    get '.0', '.1', ... suffixes (reference tsmfe.py:428-438)."""
    fn = SUMMARY_METHODS[name]
    try:
        out = fn(values)
    except Exception:
        out = np.nan
    if name in MULTI_OUTPUT:
        width = MULTI_OUTPUT[name]
        arr = np.full(width, np.nan) if np.isscalar(out) else np.asarray(out, dtype=float)
        if arr.size != width:
            arr = np.full(width, np.nan)
        return {f"{name}.{i}": float(arr[i]) for i in range(width)}
    try:
        return {name: float(out)}
    except (TypeError, ValueError):
        return {name: np.nan}
