"""Dtype-parity sweep: for every oracle-gated query, compare the PANDAS
dtypes of the engine result against the DuckDB oracle result at the
given sf_dir.

The local value gate (`check_correctness.py`) coerces before comparing,
but the DRIVER hashes values as materialized — a DuckDB ``SUM(BIGINT)``
silently widens to HUGEINT, which pandas renders float64 while the
engine emits int64, and the two hash differently even when every value
is equal (the round-4 ``grid_clusters`` red reproduced exactly this
way).  Any row printed here is a latent driver hash mismatch.

Usage: python scripts/check_dtypes.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in sqls:
            continue
        try:
            res = fn(sf_dir)
            df = res.to_pandas() if hasattr(res, "to_pandas") else (
                res.to_pandas() if hasattr(res, "schema") else res
            )
            if not isinstance(df, pd.DataFrame):
                df = df.to_pandas()
            want = con.execute(sqls[name]).df()
        except Exception as exc:  # pragma: no cover - sweep robustness
            print(f"{name:<24} ERROR {type(exc).__name__}: {exc}")
            n_bad += 1
            continue
        # STRICT comparison: int64-vs-int32 and datetime64[us]-vs-[s]
        # both hash differently at the byte level even when every value
        # is equal (Ray's groupby downcasts timestamp[us] group keys to
        # [s]; DuckDB SUM(BIGINT) widens to HUGEINT→float64; parquet
        # int32 keys pass through oracles while the engine emits int64)
        mism = [
            f"{c}: engine={df[c].dtype} oracle={want[c].dtype}"
            for c in sorted(set(df.columns) & set(want.columns))
            if df[c].dtype != want[c].dtype
        ]
        if mism:
            n_bad += 1
            print(f"{name:<24} DTYPE MISMATCH  " + "; ".join(mism))
    print(f"done: {n_bad} queries with strict dtype mismatches")
    return 0 if n_bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
