"""Oracle-parity rounding.

DuckDB's `round(x, k)` breaks ties half-AWAY-from-zero; numpy/pandas
round half-to-even (banker's). Exact .xxxx5 ties (dyadic fractions
like 5/32) therefore flip between the two, breaking value-hash parity
with the SQL oracles. Every operator whose rounded output is
oracle-checked rounds through this helper.
"""

from __future__ import annotations

import numpy as np


def round_half_up(x, decimals: int = 4) -> np.ndarray:
    """round(x, decimals) with half-away-from-zero ties (DuckDB
    semantics), sign-aware."""
    a = np.asarray(x, dtype=np.float64)
    f = 10.0 ** decimals
    return np.sign(a) * np.floor(np.abs(a) * f + 0.5) / f
