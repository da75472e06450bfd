"""Scalar-function helpers (SURVEY.md §2B B22) — wrappers where
SQL-engine parity needs non-default semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def sql_round(arr, ndigits: int = 2) -> pa.Array:
    """round() with DuckDB/ANSI double semantics: round(x, n) ==
    copysign(floor(|x| * 10^n + 0.5), x) / 10^n  (half away from zero,
    scale-then-divide).  pyarrow's pc.round uses a different algorithm
    whose result can differ by one ulp on exact-cent products, which
    breaks bit-exact oracle value-hash comparison — verified against
    DuckDB 1.0.0 on all sf0.01 rows (0 mismatches)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    x = arr.to_numpy(zero_copy_only=False).astype(np.float64)
    m = 10.0 ** ndigits
    with np.errstate(over="ignore", invalid="ignore"):
        y = np.abs(x) * m
        out = np.copysign(np.floor(y + 0.5), x) / m
        # DuckDB returns the INPUT unchanged when the scale step
        # overflows (round(1e308, 2) == 1e308, probed on 1.0.0);
        # without this, a finite |x| > DBL_MAX/10^n rounds to +-inf
        # and diverges.
        blown = np.isinf(y) & np.isfinite(x)
    if blown.any():
        out = np.where(blown, x, out)
    if isinstance(arr, pa.Array):
        # null iff the INPUT was null: from_pandas=True would also turn
        # a genuine NaN VALUE into null, where DuckDB's round(NaN) is
        # NaN (NaN-carrying floats are legal web data; found by the
        # NaN/inf parity probe)
        mask = (
            pc.is_null(arr).to_numpy(zero_copy_only=False)
            if arr.null_count
            else None
        )
        return pa.array(out, type=pa.float64(), mask=mask)
    return pa.array(out, type=pa.float64(), from_pandas=True)
