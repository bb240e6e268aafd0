"""Driver-side decimal rounding that matches DuckDB bit-for-bit.

DuckDB's ``round(x, d)`` scales by the (exactly representable) power
of ten, rounds the SCALED DOUBLE half away from zero, and divides
back. Python's ``round`` correctly rounds the double's exact decimal
value (half-even). The two disagree when ``x`` sits within the
scaling error (~1e-17) of a decimal midpoint — measure-zero for
generic doubles (why the repo's older lanes never mismatched), but
REACHABLE two ways that new lanes hit structurally:

- grid-aligned iteration state (the PCA power iteration: sums of
  1e-9-grid products land near midpoints);
- exact integer ratios with power-of-two denominators (piece
  probabilities ``cnt/total``, discount estimates ``n1/(n1+2n2)``,
  fertility ``tokens/words`` — ``1/1024`` at 9 digits IS a midpoint,
  and power-of-two totals are ordinary corpus statistics).

Any driver-side rounding whose value is compared against a DuckDB
``round`` must use this replication (30k-case fuzz incl. adversarial
near-midpoint inputs + pytest pins; see tests/test_operators.py::
test_pca_round_and_fold_parity).
"""

from __future__ import annotations

import math


def round_like_sql(x: float, digits: int) -> float:
    """Bit-exact replication of DuckDB ``round(x, digits)``."""
    p = float(10 ** digits)
    y = x * p
    if y >= 0:
        n = math.floor(y)
        r = n + 1 if y - n >= 0.5 else n
    else:
        a = -y
        n = math.floor(a)
        r = -(n + 1) if a - n >= 0.5 else -n
    return r / p


def round_like_sql_np(arr, digits: int):
    """Vectorized :func:`round_like_sql` over a numpy array — the SAME
    scale / floor / half-away / divide sequence, so the Arrow lanes
    and the scalar driver lanes share ONE replication of DuckDB's
    rounding (a second inline copy would silently stop tracking fixes
    to this fuzz-pinned surface)."""
    import numpy as np

    p = float(10 ** digits)
    y = arr * p
    pos = np.floor(y)
    rp = np.where(y - pos >= 0.5, pos + 1, pos)
    a = -y
    na = np.floor(a)
    rn = -np.where(a - na >= 0.5, na + 1, na)
    return np.where(y >= 0, rp, rn) / p
