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


def kring_smooth(hist_ds, res: int, k: int = 1, count_col: str = "n_rows"):
    """Neighborhood (k-ring) smoothing over the flat cell grid — the
    raster focal-sum every density / heat-map pipeline runs after
    :func:`cell_histogram`: each cell's smoothed value is the sum of the
    counts of all in-bounds cells within Chebyshev distance ≤ ``k``.

    Input is the (cell, count) histogram — already cell-bounded, orders
    of magnitude smaller than the corpus — so the fan-out is (2k+1)²
    contribution rows per counted cell into one cell-keyed groupby; the
    corpus itself is never touched.  Cells with no counted neighbor emit
    nothing (sparse-raster semantics, same as the SQL twin).  Output
    (cell, n_smooth), exact int64.
    """
    n = np.int64(1 << res)
    offs = np.arange(-k, k + 1, dtype=np.int64)
    dx = np.repeat(offs, 2 * k + 1)
    dy = np.tile(offs, 2 * k + 1)

    def fan(batch: pa.Table) -> pa.Table:
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        cnt = batch[count_col].to_numpy(zero_copy_only=False)
        ix = cell // n
        iy = cell % n
        nx = ix[:, None] + dx[None, :]
        ny = iy[:, None] + dy[None, :]
        ok = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
        ncell = (nx * n + ny)[ok]
        ncnt = np.broadcast_to(cnt[:, None], ok.shape)[ok]
        # per-batch combiner before the exchange
        uniq, inv = np.unique(ncell, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, ncnt)
        return pa.table({"cell": pa.array(uniq), "s": pa.array(sums)})

    from ..stages.util import coalesce_for_shuffle

    fanned = coalesce_for_shuffle(
        hist_ds.map_batches(fan, batch_format="pyarrow"), 0.25
    )
    return (
        fanned.groupby("cell")
        .sum("s")
        .map_batches(
            lambda b: b.rename_columns(["cell", "n_smooth"]),
            batch_format="pyarrow",
        )
    )


def sql_kring_smooth(hist_cte: str, res: int, k: int = 1,
                     count_col: str = "n_rows") -> str:
    """DuckDB twin of :func:`kring_smooth` — ``hist_cte`` must yield
    (cell, ``count_col``)."""
    n = 1 << res
    return f"""
WITH h AS ({hist_cte}),
o AS (SELECT dx.g AS dx, dy.g AS dy
      FROM (SELECT unnest(generate_series(-{k}, {k})) AS g) dx
      CROSS JOIN (SELECT unnest(generate_series(-{k}, {k})) AS g) dy),
e AS (
  SELECT (h.cell // {n} + o.dx) * {n} + (h.cell % {n} + o.dy) AS cell,
         h.{count_col} AS s
  FROM h CROSS JOIN o
  WHERE h.cell // {n} + o.dx BETWEEN 0 AND {n - 1}
    AND h.cell % {n} + o.dy BETWEEN 0 AND {n - 1}
)
SELECT cell, CAST(SUM(s) AS BIGINT) AS n_smooth FROM e GROUP BY 1
"""


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


def tile_pyramid(ds, max_res: int, x_col: str = "x", y_col: str = "y"):
    """Counts at EVERY resolution 0..max_res — the web-map tile pyramid
    (each zoom level's per-tile density) from ONE corpus pass.

    The corpus is tiled once at the finest level (per-batch combiner →
    cell-bounded histogram); each finest cell then fans out one row per
    ancestor level by integer bit-shifts of its (ix, iy) — exact floor-
    grid nesting, the cell_rollup invariant, so parents are derived from
    the CHILD ids and never re-tile the points (no float re-quantization
    at coarser levels, no second corpus read).  One final native
    groupby((level, cell)).sum bounded by Σ_r 4^r cells, not by rows.

    Output: (level, cell, n_rows) with flat ids ``ix * 2^level + iy``.
    """
    hist = cell_histogram(ds, max_res, x_col=x_col, y_col=y_col)
    L = int(max_res)
    nL = np.int64(1 << L)

    def expand(batch: pa.Table) -> pa.Table:
        f = batch["cell"].to_numpy()
        cnt = batch["n_rows"].to_numpy()
        ix, iy = f // nL, f % nL
        levels, cells, cnts = [], [], []
        for r in range(L + 1):
            s = np.int64(L - r)
            levels.append(np.full(len(f), r, np.int64))
            cells.append((ix >> s) * np.int64(1 << r) + (iy >> s))
            cnts.append(cnt)
        return pa.table(
            {
                "level": pa.array(np.concatenate(levels)),
                "cell": pa.array(np.concatenate(cells)),
                "n": pa.array(np.concatenate(cnts)),
            }
        )

    agg = (
        hist.map_batches(expand, batch_format="pyarrow")
        .groupby(["level", "cell"])
        .sum("n")
    )
    return agg.map_batches(
        lambda b: b.rename_columns(["level", "cell", "n_rows"]),
        batch_format="pyarrow",
    )
