"""Numeric helpers for oracle-exact float handling.

DuckDB's ``round()`` rounds half away from zero; numpy/pyarrow default to
banker's rounding (half to even).  Monetary sums land on exact .5 boundaries
(2-decimal prices), so every Ray-side rounding that must match a DuckDB
oracle goes through ``round_half_away``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["round_half_away", "round_col"]


def round_half_away(x, ndigits: int):
    """Round half away from zero (DuckDB semantics) for scalars/ndarrays."""
    arr = np.asarray(x, dtype=np.float64)
    factor = 10.0**ndigits
    return np.sign(arr) * np.floor(np.abs(arr) * factor + 0.5) / factor


def round_col(table: pa.Table, col: str, ndigits: int) -> pa.Table:
    """Replace a float column with its half-away-rounded values."""
    vals = round_half_away(table[col].to_numpy(zero_copy_only=False), ndigits)
    return table.set_column(
        table.column_names.index(col), col, pa.array(vals, type=pa.float64())
    )
