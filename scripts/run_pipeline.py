"""Flagship resumable pipeline — the `ray job submit` entry point.

Runs the full CC-style pages flow over a deterministic synthetic corpus
(or the testdata tables with ``--sf-dir``):

    pages → geocode/tile (map_batches)
          → cell histogram (combiner + tiny groupby)     → stage "tiles"
          → cell-shuffle PIP join vs occupied-cell tiles → stage "join"
          → MinHash near-dup candidate pairs             → stage "neardup"

Every stage streams into ``checkpoint.write_partitioned(out_dir)``:
partitioned parquet + a JSONL manifest line per partition
{stage, partition, input_fingerprint, rows, bytes, wall_s, ts}.  Rerunning
with the same ``--out`` skips completed partitions (kill it mid-run and
rerun to see `skipped: true` in the report).

Usage:
    python scripts/run_pipeline.py --rows 100000 --out /tmp/pages_run
    python scripts/run_pipeline.py --rows 100000 --out /tmp/pages_run  # resume
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--out", default="/tmp/pages_run")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--res", type=int, default=6)
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            log_to_driver=False,
        )
    import ray.data

    from geo_index_ray.pipelines import dedup as dedup_pipe
    from geo_index_ray.pipelines import spatial_join as sj
    from geo_index_ray.pipelines import tiling
    from geo_index_ray.sources import pages
    from geo_index_ray.state import checkpoint

    t_start = time.perf_counter()
    report = {}

    ds = pages.pages_dataset(args.rows, parallelism=args.num_cpus * 4)

    def geocode_batch(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        lon, lat = pages.page_geometry(urls)
        h = pages.url_hash64(urls)
        return pa.table(
            {
                "page_id": pa.array(h.view(np.int64)),
                "x": pa.array(lon),
                "y": pa.array(lat),
                "min_x": pa.array(lon),
                "min_y": pa.array(lat),
                "max_x": pa.array(lon),
                "max_y": pa.array(lat),
            }
        )

    pts = ds.map_batches(geocode_batch, batch_format="pyarrow")

    # stage 1: tiling histogram
    hist = tiling.cell_histogram(pts, args.res)
    rep = checkpoint.write_partitioned(
        hist, os.path.join(args.out, "tiles"), "tiles", "cell"
    )
    report["tiles"] = {
        "rows": int(rep["rows"].sum()),
        "partitions": len(rep),
        "skipped": int(rep["skipped"].sum()),
    }

    # stage 2: PIP join points vs tiles of occupied cells (coarser res)
    tiles_tbl = tiling.vectorize_cells(
        checkpoint.read_partitioned(os.path.join(args.out, "tiles")), args.res
    ).to_pandas()
    tiles = pa.table(
        {
            "tile_id": pa.array(tiles_tbl["cell"].to_numpy().astype(np.int64)),
            "min_x": pa.array(tiles_tbl["tile_min_x"].to_numpy()),
            "min_y": pa.array(tiles_tbl["tile_min_y"].to_numpy()),
            "max_x": pa.array(tiles_tbl["tile_max_x"].to_numpy()),
            "max_y": pa.array(tiles_tbl["tile_max_y"].to_numpy()),
        }
    )
    pairs = sj.shuffle_spatial_join(
        pts,
        ray.data.from_arrow(tiles),
        res=max(3, args.res - 1),
        how="pip",
        left_id="page_id",
        right_id="tile_id",
        skew_split_threshold=max(10_000, args.rows // 50),
    )
    rep = checkpoint.write_partitioned(
        pairs, os.path.join(args.out, "join"), "join", "page_id"
    )
    report["join"] = {
        "rows": int(rep["rows"].sum()),
        "partitions": len(rep),
        "skipped": int(rep["skipped"].sum()),
    }

    # stage 3: near-dup candidates over the page text
    docs = ds.map_batches(
        lambda b: pa.table(
            {
                "doc_id": pa.array(pages.url_hash64(b["url"].to_pylist()).view(np.int64)),
                "text": b["text"],
            }
        ),
        batch_format="pyarrow",
    )
    nd = dedup_pipe.minhash_dedup(docs, "doc_id", threshold=0.9)
    rep = checkpoint.write_partitioned(
        nd, os.path.join(args.out, "neardup"), "neardup", "a_id"
    )
    report["neardup"] = {
        "rows": int(rep["rows"].sum()),
        "partitions": len(rep),
        "skipped": int(rep["skipped"].sum()),
    }

    report["wall_s"] = round(time.perf_counter() - t_start, 2)
    report["rows_in"] = args.rows
    report["num_cpus"] = args.num_cpus
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
