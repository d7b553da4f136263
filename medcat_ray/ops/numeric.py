"""Numeric helpers shared by operators whose outputs are compared against
DuckDB oracles.

``np.round`` / ``pandas.round`` round half-to-even (banker's rounding);
ANSI-SQL ``ROUND`` (DuckDB included) rounds half away from zero.  On exact
ties at the last kept digit (e.g. 0.0703125 at 6 digits) the two diverge
and a value-hash comparison fails even though both results are "correct".
Every operator that rounds a column the oracle also rounds must use
:func:`round_half_away` so both sides agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np


def round_half_away(arr, ndigits: int = 6):
    """Round half away from zero, matching SQL ``ROUND`` semantics.

    Works on numpy arrays and pandas Series (returns the same type via
    numpy ufunc dispatch).  Exactly ``sign(x) * floor(|x| * 10^n + 0.5)
    / 10^n``.
    """
    scale = 10.0 ** ndigits
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
