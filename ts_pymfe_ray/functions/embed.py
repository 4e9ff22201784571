"""Delay embedding helpers (reference: /root/reference/tspymfe/_embed.py).

Vectorized: the embedding matrix is built with stride tricks instead of the
reference's per-row loop (_embed.py:69-72)."""

from __future__ import annotations

import numpy as np


def embed_ts(ts: np.ndarray, dim: int, lag: int = 1) -> np.ndarray:
    """Delay-embed with include_val=True semantics (_embed.py:26-74):
    row i = [x_{i+(dim-1)lag}, ..., x_{i+lag}, x_i]; shape
    (n - (dim-1)*lag, dim)."""
    x = np.asarray(ts, dtype=np.float64)
    d = dim - 1
    if dim <= 0 or lag <= 0 or d * lag >= x.size:
        raise ValueError("invalid embedding parameters")
    m = x.size - d * lag
    shifts = lag * (d - 1 - np.arange(-1, d))  # [d*lag, (d-1)*lag, ..., 0]
    cols = [x[s : s + m] for s in shifts]
    return np.column_stack(cols)


def nn_inds_dists(emb: np.ndarray, metric: str = "chebyshev") -> tuple[np.ndarray, np.ndarray]:
    """All-pairs nearest neighbor (excluding near-equal points), as the
    reference's nn() (_embed.py:77-90).  O(m^2 d) — callers cap m."""
    if metric == "chebyshev":
        dist = np.max(np.abs(emb[:, None, :] - emb[None, :, :]), axis=2)
    else:
        d2 = ((emb[:, None, :] - emb[None, :, :]) ** 2).sum(axis=2)
        dist = np.sqrt(d2)
    dist[np.isclose(dist, 0.0)] = np.inf
    nn = np.argmin(dist, axis=1)
    return nn, dist[np.arange(nn.size), nn]
