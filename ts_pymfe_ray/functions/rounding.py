"""Driver-hash-stable float rounding.

The driver's oracle compare rounds floats to 6 decimals on both sides and
then hashes the values, so the engine must round exactly like DuckDB's
``ROUND``: half-away-from-zero on the scaled double.  numpy's ``np.round``
is half-even and differs on boundary values (e.g. 86.1234375 -> 86.123437
vs DuckDB's 86.123438), which round 1 showed flips the hash on real data.

``round_ha`` mirrors DuckDB bit-for-bit (verified empirically against
duckdb ROUND on boundary values in both signs): sign(x) * floor(|x|*10^d
+ 0.5) / 10^d.  NaN/inf propagate unchanged.
"""

from __future__ import annotations

import numpy as np

__all__ = ["round_ha"]


def round_ha(x, decimals: int = 6):
    """Half-away-from-zero rounding matching DuckDB ``ROUND(x, decimals)``.

    Accepts scalars, numpy arrays or pandas Series; always computes in
    float64 and returns float64 (scalar in -> python float out).
    """
    arr = np.asarray(x, dtype=np.float64)
    p = 10.0 ** decimals
    with np.errstate(invalid="ignore"):
        out = np.sign(arr) * np.floor(np.abs(arr) * p + 0.5) / p
    # propagate non-finite values untouched (inf*0 above would yield nan)
    out = np.where(np.isfinite(arr), out, arr)
    if np.ndim(x) == 0:
        return float(out)
    return out
