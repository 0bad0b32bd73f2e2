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


def derive_ilon_md(key) -> np.ndarray:
    """Integer milli-degree longitude offset (``(lon + 180) * 1000`` as an
    exact int64 in [0, 360000)) — the grid :func:`derive_lon` scales from.
    Trajectory operators sum SQUARED leg lengths on this grid so per-leg
    terms are exact int64 (order-independent, hash-exact vs SQL)."""
    key = np.asarray(key, dtype=np.int64)
    return ((key * _LON_MULT) % _MOD) % 360000


def derive_ilat_md(key) -> np.ndarray:
    """Integer milli-degree latitude offset (``(lat + 85) * 1000``)."""
    key = np.asarray(key, dtype=np.int64)
    return ((key * _LAT_MULT) % _MOD) % 170000


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


def sql_ilon_md(expr: str) -> str:
    return f"(((({expr}) * {_LON_MULT}) % {_MOD}) % 360000)"


def sql_ilat_md(expr: str) -> str:
    return f"(((({expr}) * {_LAT_MULT}) % {_MOD}) % 170000)"


def sql_half_w(expr: str) -> str:
    return f"((({expr}) % 97) / 100.0 + 0.05)"


def sql_half_h(expr: str) -> str:
    return f"((({expr}) % 89) / 100.0 + 0.05)"


def sql_hilbert_select(inner_sql: str, passthrough: list[str]) -> str:
    """SQL twin of ``kernels.hilbert.hilbert_d`` (the flatbush u16×u16→u32
    Hilbert d-index, reference src/rtree/sort/hilbert.rs:121-177).

    ``inner_sql`` must yield integer columns ``hx``/``hy`` in [0, 65535]
    plus the ``passthrough`` columns; returns a SELECT producing the
    passthrough columns + ``hkey``.  All intermediates stay < 2^32, so
    plain BIGINT bit ops are exact — generated as staged sub-selects that
    mirror the numpy kernel level by level.
    """
    keep = ", ".join(passthrough)
    m = 65535

    def lvl(exprs: dict[str, str], src: str) -> str:
        cols = ", ".join(f"{e} AS {name}" for name, e in exprs.items())
        return f"(SELECT {keep}, {cols} FROM {src})"

    q = f"({inner_sql})"
    # L0: force BIGINT so << never overflows an INT32-typed literal
    q = lvl({"hx": "CAST(hx AS BIGINT)", "hy": "CAST(hy AS BIGINT)"}, q)
    # L1: initial a/b/c/d  (keep hx, hy for the final i0)
    q = lvl(
        {
            "hx": "hx", "hy": "hy",
            "a": "xor(hx, hy)",
            "b": f"xor({m}, xor(hx, hy))",
            "c": f"xor({m}, hx | hy)",
            "d": f"hx & xor(hy, {m})",
        },
        q,
    )
    # L2 (shift 1): fresh a/b, accumulate c/d
    q = lvl(
        {
            "hx": "hx", "hy": "hy",
            "a2": "a | (b >> 1)",
            "b2": "xor(a >> 1, a)",
            "c2": "xor(xor(c >> 1, b & (d >> 1)), c)",
            "d2": "xor(xor(a & (c >> 1), d >> 1), d)",
        },
        q,
    )
    for shift, i, o in ((2, "2", "3"), (4, "3", "4")):
        q = lvl(
            {
                "hx": "hx", "hy": "hy",
                f"a{o}": f"xor(a{i} & (a{i} >> {shift}), b{i} & (b{i} >> {shift}))",
                f"b{o}": f"xor(a{i} & (b{i} >> {shift}), b{i} & (xor(a{i}, b{i}) >> {shift}))",
                f"c{o}": f"xor(c{i}, xor(a{i} & (c{i} >> {shift}), b{i} & (d{i} >> {shift})))",
                f"d{o}": f"xor(d{i}, xor(b{i} & (c{i} >> {shift}), xor(a{i}, b{i}) & (d{i} >> {shift})))",
            },
            q,
        )
    # L5 (shift 8): only c/d advance; then fold to i0/i1
    q = lvl(
        {
            "hx": "hx", "hy": "hy",
            "c5": "xor(c4, xor(a4 & (c4 >> 8), b4 & (d4 >> 8)))",
            "d5": "xor(d4, xor(b4 & (c4 >> 8), xor(a4, b4) & (d4 >> 8)))",
        },
        q,
    )
    q = lvl(
        {
            "i0": "xor(hx, hy)",
            "i1": f"xor(d5, d5 >> 1) | xor({m}, xor(hx, hy) | xor(c5, c5 >> 1))",
        },
        q,
    )
    # bit interleave (4 spreading steps each), then hkey = (i1 << 1) | i0
    for mask, shift in ((0x00FF00FF, 8), (0x0F0F0F0F, 4), (0x33333333, 2), (0x55555555, 1)):
        q = lvl(
            {
                "i0": f"(i0 | (i0 << {shift})) & {mask}",
                "i1": f"(i1 | (i1 << {shift})) & {mask}",
            },
            q,
        )
    return f"SELECT {keep}, (i1 << 1) | i0 AS hkey FROM {q}"


def sql_hilbert_grid(x_expr: str, y_expr: str) -> tuple[str, str]:
    """(hx, hy) SQL exprs matching pipelines.partition._hilbert_keys's
    16-bit world-grid snap (float op order kept identical to numpy)."""
    hx = (
        f"CAST(FLOOR(LEAST(GREATEST(({x_expr} - -180.0) / 360.0 * 65535.0, 0.0),"
        " 65535.0)) AS BIGINT)"
    )
    hy = (
        f"CAST(FLOOR(LEAST(GREATEST(({y_expr} - -90.0) / 180.0 * 65535.0, 0.0),"
        " 65535.0)) AS BIGINT)"
    )
    return hx, hy


def sql_flat_cell(lon_expr: str, lat_expr: str, res: int) -> str:
    """SQL twin of cells.flat_cell_id at fixed resolution (no clamp needed
    because derived lon/lat never hit the closed upper edge)."""
    n = 1 << res
    return (
        f"(CAST(FLOOR(({lon_expr} + 180.0) / 360.0 * {n}) AS BIGINT) * {n} "
        f"+ CAST(FLOOR(({lat_expr} + 90.0) / 180.0 * {n}) AS BIGINT))"
    )
