"""Local replica of the driver's correctness gate.

Runs every queries() entry at the given sf_dir, converts to pandas, and
compares against the oracle_sql() result from DuckDB: row count, column
names, and order-insensitive value equality (sorted by all columns).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    import pyarrow as pa

    try:
        import ray
        import ray.data

        if isinstance(res, ray.data.Dataset):
            df = res.to_pandas()
            if len(df) == 0 and len(df.columns) == 0:
                # Ray's to_pandas builds from iter_batches, which yields
                # nothing for a 0-row Dataset — rebuild the empty frame
                # from the (schema-bearing) block refs instead so an
                # empty result still carries its column names.
                refs = res.to_arrow_refs()
                tbls = [t for t in ray.get(refs) if t.num_columns]
                if tbls:
                    return tbls[0].schema.empty_table().to_pandas()
            return df
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name, ray_df, ora_df) -> str:
    if sorted(ray_df.columns) != sorted(ora_df.columns):
        return f"SCHEMA MISMATCH ray={sorted(ray_df.columns)} oracle={sorted(ora_df.columns)}"
    if len(ray_df) != len(ora_df):
        return f"ROWCOUNT MISMATCH ray={len(ray_df)} oracle={len(ora_df)}"
    a = canon(ray_df)
    b = canon(ora_df)
    for c in a.columns:
        av = a[c].to_numpy()
        bv = b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            # NaN-aligned equality: a null on both sides in the same row
            # (e.g. outer-join non-matches) is a match, per SQL semantics
            if not np.array_equal(
                av.astype(np.float64), bv.astype(np.float64), equal_nan=True
            ):
                neq = av.astype(np.float64) != bv.astype(np.float64)
                both_nan = np.isnan(av.astype(np.float64)) & np.isnan(
                    bv.astype(np.float64)
                )
                bad = np.nonzero(neq & ~both_nan)[0][:3]
                return f"VALUE MISMATCH col={c} rows={bad.tolist()} ray={av[bad]} ora={bv[bad]}"
        else:
            if not np.array_equal(av, bv):
                bad = np.nonzero(av != bv)[0][:3]
                return f"VALUE MISMATCH col={c} rows={bad.tolist()} ray={av[bad]} ora={bv[bad]}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, log_to_driver=False)

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:24s} RAY ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        t1 = time.time()
        if name in oracles:
            try:
                ora_df = con.execute(oracles[name]).df()
            except Exception as e:
                print(f"{name:24s} ORACLE ERROR: {e}")
                failures += 1
                continue
            verdict = compare(name, ray_df, ora_df)
        else:
            verdict = f"rows-only ({len(ray_df)} rows)"
        status = verdict if verdict.startswith(("OK", "rows-only")) else f"FAIL {verdict}"
        if status.startswith("FAIL"):
            failures += 1
        print(f"{name:24s} {status}  [{t1 - t0:.1f}s ray]")

    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
