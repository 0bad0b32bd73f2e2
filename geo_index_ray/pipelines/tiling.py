"""Cell tiling, histograms and raster↔vector assignment.

The engine's H3/S2-style layer (the reference's analog is Hilbert leaf
partitioning, python/src/rtree/partitions.rs).  All stages stream:
per-batch combiners first, one small groupby after.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels import cells as cellmod
from ..stages.geometry import assign_cell_column


def assign_cells(ds, res: int, x_col: str = "x", y_col: str = "y", flat: bool = True):
    """Append a ``cell`` column to every row (map_batches, zero shuffle)."""
    return ds.map_batches(
        assign_cell_column(x_col, y_col, res, "cell", flat), batch_format="pyarrow"
    )


def cell_histogram(ds, res: int, x_col: str = "x", y_col: str = "y", flat: bool = True):
    """Per-cell row counts: partial counts inside map_batches (combiner),
    then a groupby-sum over the already-tiny per-block histograms."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy()
        y = batch[y_col].to_numpy()
        cid = cellmod.flat_cell_id(x, y, res) if flat else cellmod.lonlat_to_cell(x, y, res)
        uniq, counts = np.unique(cid, return_counts=True)
        return pa.table({"cell": pa.array(uniq), "n": pa.array(counts.astype(np.int64))})

    from ..stages.util import coalesce_for_shuffle

    partials = coalesce_for_shuffle(
        ds.map_batches(partial, batch_format="pyarrow"), 0.25
    )
    hist = partials.groupby("cell").sum("n")
    return hist.map_batches(
        lambda b: b.rename_columns(["cell", "n_rows"]), batch_format="pyarrow"
    )


def vectorize_cells(hist_ds, res: int):
    """raster → vector: attach each cell's tile-polygon bounds (the cell id
    grid is the raster; the bounds columns are the vector geometry)."""

    def fn(batch: pa.Table) -> pa.Table:
        cell = cellmod.flat_to_cell(batch["cell"].to_numpy(), res)
        mnx, mny, mxx, mxy = cellmod.cell_bounds(cell)
        for name, arr in (
            ("tile_min_x", mnx),
            ("tile_min_y", mny),
            ("tile_max_x", mxx),
            ("tile_max_y", mxy),
        ):
            batch = batch.append_column(name, pa.array(arr))
        return batch

    return hist_ds.map_batches(fn, batch_format="pyarrow")


def rasterize_boxes(ds, res: int, id_col: str):
    """vector → raster: explode each bbox geometry into the cells it covers
    (`polyfill`), emitting (id, cell) coverage rows."""

    def fn(batch: pa.Table) -> pa.Table:
        rid = batch[id_col].to_numpy().astype(np.int64)
        rows, cc = cellmod.polyfill_boxes(
            batch["min_x"].to_numpy(),
            batch["min_y"].to_numpy(),
            batch["max_x"].to_numpy(),
            batch["max_y"].to_numpy(),
            res,
        )
        return pa.table(
            {id_col: pa.array(rid[rows]), "cell": pa.array(cellmod.cell_to_flat(cc))}
        )

    return ds.map_batches(fn, batch_format="pyarrow")
