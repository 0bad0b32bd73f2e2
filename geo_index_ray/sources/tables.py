"""Testdata table readers with derived geometry.

Reads ONLY the needed columns from parquet (column pruning at the read) and
appends deterministic geometry via the geocode functions, so every dataset
here has an exact DuckDB-SQL twin.
"""

from __future__ import annotations

import pyarrow as pa

from ..stages.geometry import derive_box_columns, derive_point_columns


def read_table(sf_dir: str, name: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def points_ds(sf_dir: str, table: str, key: str, extra_columns=()):
    """Dataset of (key, ..., x, y) with point geometry derived from the key."""
    ds = read_table(sf_dir, table, columns=[key, *extra_columns])
    return ds.map_batches(derive_point_columns(key), batch_format="pyarrow")


def boxes_ds(sf_dir: str, table: str, key: str, extra_columns=()):
    """Dataset of (key, ..., min_x..max_y) with bbox geometry from the key."""
    ds = read_table(sf_dir, table, columns=[key, *extra_columns])
    return ds.map_batches(derive_box_columns(key), batch_format="pyarrow")


def point_boxes_ds(sf_dir: str, table: str, key: str, extra_columns=()):
    """Points presented as degenerate boxes (min == max) for join stages."""
    ds = points_ds(sf_dir, table, key, extra_columns)

    def to_boxes(batch: pa.Table) -> pa.Table:
        x = batch["x"]
        y = batch["y"]
        for name, col in (("min_x", x), ("min_y", y), ("max_x", x), ("max_y", y)):
            batch = batch.append_column(name, col)
        return batch

    return ds.map_batches(to_boxes, batch_format="pyarrow")
