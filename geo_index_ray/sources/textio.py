"""JSONL / CSV sources and sinks — interchange-format coverage.

Parquet is the engine's native format (``sources.tables``,
``state.checkpoint``); web-corpus pipelines also ingest and emit
newline-delimited JSON and CSV.  Both wrappers keep the Ray Data
streaming shape: ``write_*`` fans out one file per block (resumable the
same way as ``checkpoint.write_partitioned`` — a partial directory can
be re-listed and finished), ``read_*`` streams files back as blocks.

Fidelity note: JSON/CSV are TEXT formats — int64 and strings round-trip
exactly; float64 may lose ULPs depending on the writer's repr, so
pipelines that need bit-exact floats checkpoint through parquet and use
these only at the corpus boundary (the same contract as every
web-archive tool).
"""

from __future__ import annotations

import ray.data


def write_jsonl(ds, out_dir: str) -> str:
    """Newline-delimited JSON, one file per block under ``out_dir``."""
    ds.write_json(out_dir)
    return out_dir


def read_jsonl(path: str):
    return ray.data.read_json(path)


def write_csv(ds, out_dir: str) -> str:
    ds.write_csv(out_dir)
    return out_dir


def read_csv(path: str):
    return ray.data.read_csv(path)
