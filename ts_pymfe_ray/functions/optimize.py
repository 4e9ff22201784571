"""Derivative-free optimization (Nelder-Mead) + least-squares curve fit.

scipy.optimize is unavailable; this is the classic Nelder-Mead simplex
(Nelder & Mead 1965, with the standard adaptive coefficients) used by the
model-fit kernels.  curve_fit-style fits minimize SSE from the same initial
guesses the reference passes to scipy.optimize.curve_fit — documented
approximate parity for optimizer-backed features."""

from __future__ import annotations

import numpy as np


def nelder_mead(
    f,
    x0: np.ndarray,
    max_iter: int = 400,
    xatol: float = 1e-6,
    fatol: float = 1e-9,
    initial_step: float = 0.1,
) -> np.ndarray:
    x0 = np.asarray(x0, dtype=np.float64)
    n = x0.size
    alpha, gamma, rho, sigma = 1.0, 2.0, 0.5, 0.5
    simplex = [x0]
    for i in range(n):
        p = x0.copy()
        p[i] += initial_step if p[i] == 0 else initial_step * abs(p[i]) + 1e-4
        simplex.append(p)
    simplex = np.array(simplex)
    fvals = np.array([_safe(f, p) for p in simplex])
    for _ in range(max_iter):
        order = np.argsort(fvals)
        simplex, fvals = simplex[order], fvals[order]
        if (
            np.max(np.abs(simplex[1:] - simplex[0])) < xatol
            and np.max(np.abs(fvals[1:] - fvals[0])) < fatol
        ):
            break
        centroid = simplex[:-1].mean(axis=0)
        xr = centroid + alpha * (centroid - simplex[-1])
        fr = _safe(f, xr)
        if fvals[0] <= fr < fvals[-2]:
            simplex[-1], fvals[-1] = xr, fr
        elif fr < fvals[0]:
            xe = centroid + gamma * (xr - centroid)
            fe = _safe(f, xe)
            if fe < fr:
                simplex[-1], fvals[-1] = xe, fe
            else:
                simplex[-1], fvals[-1] = xr, fr
        else:
            xc = centroid + rho * (simplex[-1] - centroid)
            fc = _safe(f, xc)
            if fc < fvals[-1]:
                simplex[-1], fvals[-1] = xc, fc
            else:
                for i in range(1, n + 1):
                    simplex[i] = simplex[0] + sigma * (simplex[i] - simplex[0])
                    fvals[i] = _safe(f, simplex[i])
    return simplex[np.argmin(fvals)]


def _safe(f, x) -> float:
    try:
        v = float(f(x))
        return v if np.isfinite(v) else 1e300
    except (ValueError, FloatingPointError, OverflowError, ZeroDivisionError):
        return 1e300


def curve_fit_sse(func, x: np.ndarray, y: np.ndarray, p0: np.ndarray,
                  max_iter: int = 400) -> np.ndarray:
    """Fit func(x, *params) to y by SSE minimization from p0."""

    def sse(p):
        with np.errstate(all="ignore"):
            r = func(x, *p) - y
        return float(r @ r)

    return nelder_mead(sse, np.asarray(p0, dtype=np.float64), max_iter=max_iter)
