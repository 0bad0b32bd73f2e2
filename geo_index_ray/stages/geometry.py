"""Geometry-derivation stages: stateless map_batches over zero-copy Arrow.

Each stage appends derived columns to a pyarrow batch without touching the
payload columns (wide columns like ``html``/``text`` should be projected
away *before* any shuffle — see pipelines).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import geocode
from ..kernels import cells


def derive_point_columns(key_col: str, x_col: str = "x", y_col: str = "y"):
    """Stage: append deterministic lon/lat point columns from an int key."""

    def fn(batch: pa.Table) -> pa.Table:
        key = batch[key_col].to_numpy()
        batch = batch.append_column(x_col, pa.array(geocode.derive_lon(key)))
        return batch.append_column(y_col, pa.array(geocode.derive_lat(key)))

    return fn


def derive_box_columns(key_col: str):
    """Stage: append deterministic bbox columns (center point ± half extents)."""

    def fn(batch: pa.Table) -> pa.Table:
        key = batch[key_col].to_numpy()
        cx = geocode.derive_lon(key)
        cy = geocode.derive_lat(key)
        hw = geocode.derive_half_w(key)
        hh = geocode.derive_half_h(key)
        for name, arr in (
            ("min_x", cx - hw),
            ("min_y", cy - hh),
            ("max_x", cx + hw),
            ("max_y", cy + hh),
        ):
            batch = batch.append_column(name, pa.array(arr))
        return batch

    return fn


def assign_cell_column(
    x_col: str = "x",
    y_col: str = "y",
    res: int = 6,
    out: str = "cell",
    flat: bool = True,
):
    """Stage: append the cell id of each point at ``res``.

    ``flat=True`` uses the SQL-oracle-friendly flat id ``ix*2^res+iy``;
    ``flat=False`` the packed hierarchical id.
    """

    def fn(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy()
        y = batch[y_col].to_numpy()
        cid = cells.flat_cell_id(x, y, res) if flat else cells.lonlat_to_cell(x, y, res)
        return batch.append_column(out, pa.array(cid))

    return fn
