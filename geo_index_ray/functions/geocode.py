"""Deterministic geometry derivation — numpy and ANSI-SQL twins.

Every spatial query in this engine derives geometry from table keys with
pure integer arithmetic so the exact same values are computable by the
DuckDB oracle (`__ray_entry__.oracle_sql`).  Keep the numpy and SQL forms
in lockstep: any edit here must edit both.

The derived domain: lon ∈ [-180, 180), lat ∈ [-85, 85) via two LCG-style
mixes of the key.  Box half-extents come from small moduli so bbox joins
have bounded fan-out.
"""

from __future__ import annotations

import numpy as np

_MOD = 2147483647  # 2^31 - 1
_LON_MULT = 48271  # MINSTD
_LAT_MULT = 16807  # MINSTD0


def derive_lon(key) -> np.ndarray:
    key = np.asarray(key, dtype=np.int64)
    return ((key * _LON_MULT) % _MOD) % 360000 / 1000.0 - 180.0


def derive_lat(key) -> np.ndarray:
    key = np.asarray(key, dtype=np.int64)
    return ((key * _LAT_MULT) % _MOD) % 170000 / 1000.0 - 85.0


def derive_half_w(key) -> np.ndarray:
    key = np.asarray(key, dtype=np.int64)
    return (key % 97) / 100.0 + 0.05


def derive_half_h(key) -> np.ndarray:
    key = np.asarray(key, dtype=np.int64)
    return (key % 89) / 100.0 + 0.05


# --- SQL twins (DuckDB / ANSI) ---------------------------------------------


def sql_lon(expr: str) -> str:
    return f"(((({expr}) * {_LON_MULT}) % {_MOD}) % 360000 / 1000.0 - 180.0)"


def sql_lat(expr: str) -> str:
    return f"(((({expr}) * {_LAT_MULT}) % {_MOD}) % 170000 / 1000.0 - 85.0)"


def sql_half_w(expr: str) -> str:
    return f"((({expr}) % 97) / 100.0 + 0.05)"


def sql_half_h(expr: str) -> str:
    return f"((({expr}) % 89) / 100.0 + 0.05)"


def sql_flat_cell(lon_expr: str, lat_expr: str, res: int) -> str:
    """SQL twin of cells.flat_cell_id at fixed resolution (no clamp needed
    because derived lon/lat never hit the closed upper edge)."""
    n = 1 << res
    return (
        f"(CAST(FLOOR(({lon_expr} + 180.0) / 360.0 * {n}) AS BIGINT) * {n} "
        f"+ CAST(FLOOR(({lat_expr} + 90.0) / 180.0 * {n}) AS BIGINT))"
    )
