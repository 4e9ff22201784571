"""Frequency-domain feature kernels (reference:
/root/reference/tspymfe/freq_domain.py, class MFETSFreqDomain).

The periodogram reimplements scipy.signal.periodogram(detrend=None,
window=..., scaling="spectrum", return_onesided=True) semantics in numpy:
periodic window, |rfft|^2 / win.sum()^2, doubled except DC/Nyquist."""

from __future__ import annotations

import numpy as np

from ts_pymfe_ray.registry import FeatureKernel, SeriesCtx, register
from ts_pymfe_ray.functions.kernels_info import shannon_entropy


def _periodic_window(kind: str, n: int) -> np.ndarray:
    k = np.arange(n)
    if kind == "hamming":
        return 0.54 - 0.46 * np.cos(2 * np.pi * k / n)
    if kind == "hann":
        return 0.5 - 0.5 * np.cos(2 * np.pi * k / n)
    raise ValueError(kind)


def periodogram(x: np.ndarray, window: str = "hamming") -> tuple[np.ndarray, np.ndarray]:
    """(freqs in [0, 0.5], one-sided power spectrum, scaling='spectrum')."""
    n = x.size
    win = _periodic_window(window, n)
    f = np.fft.rfft(x * win)
    ps = (np.abs(f) ** 2) / (win.sum() ** 2)
    if n % 2 == 0:
        ps[1:-1] *= 2.0
    else:
        ps[1:] *= 2.0
    freqs = np.fft.rfftfreq(n)
    return freqs, ps


def _ps(c: SeriesCtx) -> np.ndarray:
    return c._get("ps_residuals", lambda: periodogram(c.ts_residuals)[1])


register(FeatureKernel(
    "ps_residuals", "freq_domain",
    _ps, returns_array=True, cost="medium",
    ref="freq_domain.py:82 (full Hamming-window spectrum of residuals)",
))


def _ps_freqs(c: SeriesCtx, freq_num: float = 0.05) -> np.ndarray:
    k = int(np.ceil(freq_num * c.ts_residuals.size))
    return np.sort(_ps(c))[-k:]


register(FeatureKernel("ps_freqs", "freq_domain", _ps_freqs, returns_array=True,
                       cost="medium", ref="freq_domain.py:122"))

register(FeatureKernel(
    "ps_peaks", "freq_domain",
    lambda c: (_ps(c) >= 0.6 * np.max(_ps(c))).astype(float),
    returns_array=True, cost="medium",
    ref="freq_domain.py:174",
))


def _ps_entropy(c: SeriesCtx, base: float = 2.0) -> float:
    ps = _ps(c)
    ent = shannon_entropy(ps / ps.sum(), base=base)
    return ent / (np.log(c.ts_residuals.size) / np.log(base))


register(FeatureKernel("ps_entropy", "freq_domain", _ps_entropy, cost="medium",
                       ref="freq_domain.py:233"))


def _low_freq_power(c: SeriesCtx, threshold: float = 0.04) -> float:
    freqs, ps = periodogram(c.ts_residuals, window="hann")
    freqs = freqs * 2 * np.pi
    return float(ps[freqs <= threshold].sum() / ps.sum())


register(FeatureKernel("low_freq_power", "freq_domain", _low_freq_power,
                       cost="medium", ref="freq_domain.py:305-350"))
