"""Gap-fill: LOCF + linear interpolation over sentinel-marked missing points.

The reference library has NO missing-data path (its ``check_data`` only
rejects empty input, /root/reference/tspymfe/_internal.py:1334-1364); the
north rule mandates engine-side gap-fill applied per series before window
aggregation.  Convention (FIXTURES.md §1): missing points are stored as the
sentinel token ``-1`` in the int32 ``tokens`` array.

Policy:
- interior gaps  -> linear interpolation between surrounding valid points
- trailing gaps  -> LOCF (last observation carried forward)
- leading gaps   -> NOCB (next observation carried backward; LOCF has
  nothing to carry)
- all-missing row -> all zeros (degenerate; flagged by the caller)

``np.interp`` implements exactly this contract (flat extrapolation at both
ends) in one vectorized call.
"""

from __future__ import annotations

import numpy as np

SENTINEL = -1


def gap_fill(tokens: np.ndarray, sentinel: int = SENTINEL,
             out: np.ndarray | None = None) -> np.ndarray:
    """Return a float64 copy of ``tokens`` with sentinel gaps filled.

    Vectorized; rows without gaps take a fast path (just a dtype cast).
    ``out`` (same length, float64) lets hot loops reuse a cache-resident
    buffer instead of allocating per row; values are bitwise-identical.
    """
    x = np.asarray(tokens)
    mask = x == sentinel
    if not mask.any():
        if out is None:
            return x.astype(np.float64)
        out[...] = x
        return out
    valid = ~mask
    if not valid.any():
        if out is None:
            return np.zeros(x.size, dtype=np.float64)
        out[...] = 0.0
        return out
    idx = np.arange(x.size)
    filled = np.interp(idx, idx[valid], x[valid].astype(np.float64))
    if out is None:
        return filled
    out[...] = filled
    return out


def gap_fill_batch(token_arrays: list[np.ndarray], sentinel: int = SENTINEL) -> list[np.ndarray]:
    """Gap-fill a batch of rows (list of per-row token arrays)."""
    return [gap_fill(t, sentinel) for t in token_arrays]
