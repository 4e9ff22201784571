"""Minimal Gaussian-process regression (RBF kernel) in numpy.

Stands in for sklearn.gaussian_process.GaussianProcessRegressor used by the
reference (_utils.py:216-245; model_based.py:943; landmarking.py:737).
sklearn's default (ConstantKernel * RBF, L-BFGS marginal-likelihood
optimization) is replaced by a small log-spaced grid search over
(signal variance, length scale) maximizing the exact log marginal
likelihood — documented as an approximate-parity kernel (optimizer-backed
features carry loose tolerances, SURVEY.md §5.2).

O(n^3) in the training size; callers cap n (GP_CAP) — the reference itself
is O(n^3) here and warns about cost.
"""

from __future__ import annotations

import numpy as np

GP_CAP = 256


class GPModel:
    def __init__(self, x: np.ndarray, y: np.ndarray, alpha: float = 1e-10):
        self.x = x
        self.y = y
        best = (-np.inf, 1.0, 1.0)
        n = x.size
        d2 = (x[:, None] - x[None, :]) ** 2
        eye = (alpha + 1e-8) * np.eye(n)
        for ls in np.logspace(-2.0, 0.5, 8):
            K0 = np.exp(-0.5 * d2 / ls**2)
            for sv in (0.5, 1.0, 2.0):
                K = sv * K0 + eye
                try:
                    L = np.linalg.cholesky(K)
                except np.linalg.LinAlgError:
                    continue
                # K^-1 y via ONE general solve: numpy has no triangular
                # solver, so solve(L, .)/solve(L.T, .) each paid a full LU
                # of an already-factored matrix — 2.7x the needed flops
                a = np.linalg.solve(K, y)
                lml = -0.5 * y @ a - np.log(np.diag(L)).sum() - 0.5 * n * np.log(2 * np.pi)
                if lml > best[0]:
                    best = (lml, ls, sv)
        _, self.ls, self.sv = best
        K = self.sv * np.exp(-0.5 * d2 / self.ls**2) + eye
        self.L = np.linalg.cholesky(K)
        self.a = np.linalg.solve(K, y)

    def predict(self, x_new: np.ndarray) -> np.ndarray:
        Ks = self.sv * np.exp(-0.5 * (x_new[:, None] - self.x[None, :]) ** 2 / self.ls**2)
        return Ks @ self.a


def fit_gp_residuals(ts_scaled: np.ndarray, cap: int = GP_CAP) -> np.ndarray:
    """Residuals of a GP fit on [0,1] timestamps (reference
    _utils.py:216-245 semantics; input already standardized)."""
    y = ts_scaled[-cap:] if ts_scaled.size > cap else ts_scaled
    x = np.linspace(0.0, 1.0, y.size)
    m = GPModel(x, y)
    return y - m.predict(x)


def gp_r_squared(ts_scaled: np.ndarray, cap: int = GP_CAP) -> float:
    """R^2 of the GP regression (reference ft_gaussian_r_sqr,
    model_based.py:943)."""
    y = ts_scaled[-cap:] if ts_scaled.size > cap else ts_scaled
    x = np.linspace(0.0, 1.0, y.size)
    m = GPModel(x, y)
    pred = m.predict(x)
    ss_res = ((y - pred) ** 2).sum()
    ss_tot = ((y - y.mean()) ** 2).sum()
    if ss_tot <= 0:
        return np.nan
    return float(1.0 - ss_res / ss_tot)
