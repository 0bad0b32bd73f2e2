"""Per-partition lineage manifest + resumable partitioned output.

Every pipeline stage that persists results writes through here:

- output is *partitioned parquet* — one file per partition key (cell
  bucket / shard), never one giant file;
- each completed partition appends a manifest line
  ``{stage, partition, input_fingerprint, rows, bytes, wall_s, ts}``;
- on resume, partitions whose fingerprint is already in the manifest are
  skipped (the write stage filters them out before doing any work).

The reference's persistence story is "the buffer is the checkpoint"
(python/README.md Persisting); here the same idea is applied per
partition: deterministic inputs + idempotent per-partition writes ⇒ a
killed job rerun converges to the same output.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_NAME = "manifest.jsonl"


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, MANIFEST_NAME)

    def load_done(self) -> set[str]:
        done = set()
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue  # torn write from a killed run — redo it
                    done.add(rec["partition"])
        return done

    def append(self, record: dict) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        # single O_APPEND write per record: atomic enough for line-oriented
        # JSON on a local/posix fs; torn tails are tolerated by load_done
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


class PartitionedWriter:
    """map_batches sink: writes each batch as one parquet partition keyed by
    a deterministic fingerprint of its key column; skips partitions already
    in the manifest (resume)."""

    def __init__(self, out_dir: str, stage: str, key_col: str):
        self.out_dir = out_dir
        self.stage = stage
        self.key_col = key_col
        self.manifest = Manifest(out_dir)
        self.done = self.manifest.load_done()
        os.makedirs(out_dir, exist_ok=True)

    def _fingerprint(self, batch: pa.Table) -> str:
        import hashlib

        keys = np.sort(batch[self.key_col].to_numpy().astype(np.int64))
        return hashlib.sha1(keys.tobytes()).hexdigest()[:16]

    def __call__(self, batch: pa.Table) -> pa.Table:
        t0 = time.time()
        fp = self._fingerprint(batch)
        out_path = os.path.join(self.out_dir, f"part-{fp}.parquet")
        if fp in self.done and os.path.exists(out_path):
            return pa.table(
                {
                    "partition": pa.array([fp]),
                    "rows": pa.array([batch.num_rows], pa.int64()),
                    "skipped": pa.array([True]),
                }
            )
        tmp = out_path + ".tmp"
        pq.write_table(batch, tmp)
        os.replace(tmp, out_path)  # atomic publish
        self.manifest.append(
            {
                "stage": self.stage,
                "partition": fp,
                "input_fingerprint": fp,
                "rows": batch.num_rows,
                "bytes": os.path.getsize(out_path),
                "wall_s": round(time.time() - t0, 4),
                "ts": time.time(),
            }
        )
        return pa.table(
            {
                "partition": pa.array([fp]),
                "rows": pa.array([batch.num_rows], pa.int64()),
                "skipped": pa.array([False]),
            }
        )


def write_partitioned(ds, out_dir: str, stage: str, key_col: str):
    """Consume a Dataset into resumable partitioned parquet.

    Returns the (small) per-partition write report as a pandas DataFrame.
    """
    report = ds.map_batches(
        PartitionedWriter,
        fn_constructor_kwargs={"out_dir": out_dir, "stage": stage, "key_col": key_col},
        batch_format="pyarrow",
        concurrency=2,
    )
    return report.to_pandas()


def read_partitioned(out_dir: str):
    """Read back a partitioned output directory as a Ray Dataset."""
    import ray.data

    files = [
        os.path.join(out_dir, f)
        for f in sorted(os.listdir(out_dir))
        if f.startswith("part-") and f.endswith(".parquet")
    ]
    return ray.data.read_parquet(files)
