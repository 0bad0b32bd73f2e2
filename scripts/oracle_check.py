"""Side-by-side Ray-vs-DuckDB oracle check (mirrors the driver's compare).

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
Defaults: sf0.01, all queries that have an oracle_sql entry.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_table(res) -> pa.Table:
    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    batches = []
    for b in res.iter_batches(batch_format="pyarrow"):
        batches.append(pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b)
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches, promote_options="permissive")


def compare(name: str, ray_tbl: pa.Table, oracle_tbl: pa.Table) -> str:
    cols = sorted(ray_tbl.column_names)
    ocols = sorted(oracle_tbl.column_names)
    if cols != ocols:
        return f"SCHEMA MISMATCH ray={cols} oracle={ocols}"
    a = ray_tbl.to_pandas()[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = oracle_tbl.to_pandas()[ocols].sort_values(ocols, kind="mergesort").reset_index(drop=True)
    if a.shape != b.shape:
        return f"ROWCOUNT MISMATCH ray={a.shape} oracle={b.shape}"
    for c in cols:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            if not np.allclose(av.to_numpy(dtype=float), bv.to_numpy(dtype=float),
                               rtol=1e-9, atol=1e-9, equal_nan=True):
                return f"VALUE MISMATCH col={c}"
        elif av.dtype.kind in "iu" and bv.dtype.kind in "iu":
            if not (av.to_numpy().astype(np.int64) == bv.to_numpy().astype(np.int64)).all():
                return f"VALUE MISMATCH col={c}"
        else:
            if not (av.astype(str).to_numpy() == bv.astype(str).to_numpy()).all():
                return f"VALUE MISMATCH col={c}"
    return "MATCH"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, log_to_driver=False)
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    q = e.queries()
    osql = e.oracle_sql()
    names = sys.argv[2:] or [n for n in q if n in osql]
    failures = 0
    for name in names:
        try:
            ray_tbl = to_table(q[name](sf_dir))
            oracle_tbl = con.execute(osql[name]).arrow() if name in osql else None
            if oracle_tbl is None:
                print(f"{name}: rows={ray_tbl.num_rows} (no oracle)")
                continue
            verdict = compare(name, ray_tbl, oracle_tbl)
            print(f"{name}: rows={ray_tbl.num_rows} {verdict}")
            if verdict != "MATCH":
                failures += 1
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            failures += 1
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
