"""Period estimation (reference: /root/reference/tspymfe/_period.py:14-45).

The period is ``argmax(|acf(detrended)|) + 1`` where the ACF is computed up
to ``size // 2`` lags with the FFT, adjusted=True, lag 0 dropped, and the
series is detrended with Friedman's Super Smoother when no detrended
version is supplied.
"""

from __future__ import annotations

import numpy as np

from ts_pymfe_ray.functions.stats import acf


def ts_period_from_detrended(ts_detrended: np.ndarray) -> int:
    n = ts_detrended.size
    if n <= 1:
        return 1
    autocorr = acf(ts_detrended, nlags=n // 2, adjusted=True)
    if autocorr.size == 0 or not np.isfinite(autocorr).any():
        return 1
    return int(np.nanargmax(np.abs(autocorr)) + 1)


def get_ts_period(ts: np.ndarray, ts_detrended: np.ndarray | None = None) -> int:
    if ts.size <= 1:
        return 1
    if ts_detrended is None:
        from ts_pymfe_ray.functions.decompose import supersmoother

        ts_detrended = np.asarray(ts, dtype=np.float64) - supersmoother(ts)
    return ts_period_from_detrended(ts_detrended)
