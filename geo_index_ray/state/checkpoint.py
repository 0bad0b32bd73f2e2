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

    def load_done(self) -> dict[str, str]:
        """partition name → last recorded input_fingerprint."""
        done: dict[str, str] = {}
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
                    done[rec["partition"]] = rec.get("input_fingerprint", "")
        return done

    def append(self, record: dict) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        # single O_APPEND write per record: atomic enough for line-oriented
        # JSON on a local/posix fs; torn tails are tolerated by load_done
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


def write_partitioned(ds, out_dir: str, stage: str, key_col: str,
                      num_partitions: int | None = None):
    """Consume a Dataset into resumable partitioned parquet.

    Partition membership is a *deterministic pure function of the key*
    (``hash(key) % num_partitions``), never of upstream batch boundaries —
    so a rerun reproduces the exact same partition contents no matter how
    Ray re-blocks the input, and completed partitions are recognized and
    skipped.  One hash shuffle groups each partition's rows; each group is
    written atomically (tmp + rename) and appends one manifest line
    ``{stage, partition, input_fingerprint, rows, bytes, wall_s, ts}``.
    The manifest is plain JSONL on a shared filesystem; O_APPEND keeps
    concurrent writers line-atomic on POSIX.

    Fingerprint stability: rows are canonicalized by sorting over ALL
    columns before hashing, so duplicate keys cannot flip the
    fingerprint between identical reruns.  Tables with nested-type
    columns fall back to a key-only sort — for those, resume
    idempotency requires ``key_col`` to be unique per row.

    Returns the (small) per-partition write report as a pandas DataFrame.
    """
    import hashlib

    if num_partitions is None:
        from ..stages.util import reducer_count

        num_partitions = reducer_count()
    manifest = Manifest(out_dir)
    done = manifest.load_done()
    os.makedirs(out_dir, exist_ok=True)

    N = num_partitions

    def add_pid(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy().astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            pid = ((k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) % np.uint64(N)
        return batch.append_column("__pid", pa.array(pid.astype(np.int64)))

    def write_group(g: pa.Table) -> pa.Table:
        t0 = time.time()
        pid = int(g["__pid"][0].as_py())
        name = f"{pid:05d}"
        g = g.drop_columns(["__pid"])
        out_path = os.path.join(out_dir, f"part-{name}.parquet")
        # canonical row order inside a partition → byte-stable output; the
        # fingerprint covers the FULL payload (IPC bytes of the ordered
        # table), so a changed upstream input into the same out_dir is
        # detected and the stale partition is rewritten, not silently kept.
        # The sort is over ALL columns (key first): a key-only stable sort
        # leaves duplicate-key rows in Ray's nondeterministic arrival
        # order, which would flip the fingerprint between identical reruns
        # and spuriously rewrite 'done' partitions.  (Nested-type columns
        # fall back to key-only order — there resume determinism requires
        # a unique key, which the fallback docstring note covers.)
        import pyarrow.compute as pc

        try:
            sort_keys = [(key_col, "ascending")] + [
                (c, "ascending") for c in g.column_names if c != key_col
            ]
            order = pc.sort_indices(g, sort_keys=sort_keys)
        except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
            order = pa.array(
                np.argsort(g[key_col].to_numpy(), kind="stable").astype(np.int64)
            )
        g = g.take(order)
        # hash the IPC stream without buffering it — the fingerprint needs
        # one serialization pass, not a second in-memory copy of the table
        hasher = hashlib.sha1()

        class _HashSink:
            @staticmethod
            def write(b):
                hasher.update(b)
                return len(b)

            @staticmethod
            def flush():
                pass

            closed = False

            @staticmethod
            def close():
                pass

        with pa.ipc.new_stream(pa.PythonFile(_HashSink(), mode="w"), g.schema) as w:
            w.write_table(g)
        fp = hasher.hexdigest()[:16]
        if done.get(name) == fp and os.path.exists(out_path):
            return pa.table(
                {
                    "partition": pa.array([name]),
                    "rows": pa.array([g.num_rows], pa.int64()),
                    "skipped": pa.array([True]),
                }
            )
        tmp = out_path + f".tmp.{os.getpid()}"
        pq.write_table(g, tmp)
        os.replace(tmp, out_path)  # atomic publish
        manifest.append(
            {
                "stage": stage,
                "partition": name,
                "input_fingerprint": fp,
                "rows": g.num_rows,
                "bytes": os.path.getsize(out_path),
                "wall_s": round(time.time() - t0, 4),
                "ts": time.time(),
            }
        )
        return pa.table(
            {
                "partition": pa.array([name]),
                "rows": pa.array([g.num_rows], pa.int64()),
                "skipped": pa.array([False]),
            }
        )

    report = (
        ds.map_batches(add_pid, batch_format="pyarrow")
        .groupby("__pid")
        .map_groups(write_group, batch_format="pyarrow")
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
