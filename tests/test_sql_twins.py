"""SQL-twin parity: the DuckDB oracle generators in functions.sqltext /
functions.geocode must reproduce the numpy kernels bit-for-bit.  These
tests run DuckDB only (no Ray) so drift in either side is caught fast.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from geo_index_ray.functions import geocode, sqltext
from geo_index_ray.kernels.hilbert import hilbert_d
from geo_index_ray.pipelines import dedup, text


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the quick brown fox jumps over the lazy dog",  # exact dup
    "a b",
    "x",
    "",
    "der hund und die katze sind nicht da",
]


def _docs(con):
    df = pd.DataFrame({"doc_id": np.arange(len(CORPUS), dtype=np.int64), "text": CORPUS})
    con.register("documents", df)
    return df


def test_hilbert_sql_parity(con):
    rng = np.random.default_rng(3)
    hx = rng.integers(0, 65536, 5000).astype(np.uint32)
    hy = rng.integers(0, 65536, 5000).astype(np.uint32)
    corners = np.array([[0, 0], [65535, 65535], [0, 65535], [65535, 0]], np.uint32)
    hx = np.concatenate([hx, corners[:, 0]])
    hy = np.concatenate([hy, corners[:, 1]])
    expect = hilbert_d(hx, hy).astype(np.int64)
    con.register(
        "hpts",
        pd.DataFrame(
            {"i": np.arange(len(hx)), "hx": hx.astype(np.int64), "hy": hy.astype(np.int64)}
        ),
    )
    q = geocode.sql_hilbert_select("SELECT i, hx, hy FROM hpts", ["i"])
    got = con.execute(q + " ORDER BY i").df()["hkey"].to_numpy()
    assert np.array_equal(got, expect)


def test_fingerprint_sql_parity(con):
    _docs(con)
    sql = (
        f"SELECT doc_id, {sqltext.u64_to_i64('fp0')} AS fp FROM "
        f"(SELECT doc_id, {sqltext.sql_fnv1a_of('text')} AS fp0 FROM documents)"
        " ORDER BY doc_id"
    )
    got = con.execute(sql).df()["fp"].to_numpy()
    stage = text.fingerprint_stage("doc_id")
    import pyarrow as pa

    expect = stage(
        pa.table({"doc_id": np.arange(len(CORPUS), dtype=np.int64), "text": CORPUS})
    )["fp"].to_numpy()
    assert np.array_equal(got, expect)


def test_simhash_sql_parity(con):
    _docs(con)
    sql = sqltext.sql_simhash_select("documents", "doc_id")
    got = (
        con.execute(f"SELECT * FROM ({sql}) ORDER BY doc_id").df()["simhash"].to_numpy()
    )
    import pyarrow as pa

    stage = dedup.simhash_stage("doc_id")
    expect = stage(
        pa.table({"doc_id": np.arange(len(CORPUS), dtype=np.int64), "text": CORPUS})
    )["simhash"].to_numpy()
    assert np.array_equal(got, expect)


def test_shingle_hash_sql_parity(con):
    _docs(con)
    sql = (
        f"SELECT doc_id, {sqltext.u64_to_i64('h')} AS h "
        f"FROM ({sqltext.sql_shingle_cte('documents', 'doc_id')})"
    )
    got = con.execute(sql).df()
    for i, t in enumerate(CORPUS):
        expect = set(dedup._shingle_hashes(t, 5).view(np.int64).tolist())
        have = set(got[got.doc_id == i].h.astype(np.int64).tolist())
        assert have == expect, f"doc {i}"


def test_vectorized_signatures_match_scalar_kernel():
    """The batch-wide signature stage must equal the per-doc reference
    formula (unique shingles × explicit permutation mins)."""
    import pyarrow as pa

    a, b = dedup._minhash_params(64)
    stage = dedup.minhash_signatures_stage("doc_id")
    out = stage(pa.table({"doc_id": np.arange(len(CORPUS), dtype=np.int64), "text": CORPUS}))
    sigs = (
        out["sig"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        .view(np.uint64).reshape(len(CORPUS), 64)
    )
    for i, t in enumerate(CORPUS):
        sh = dedup._shingle_hashes(t, 5)
        with np.errstate(over="ignore"):
            vals = (a[None, :] * (sh[:, None] % dedup._P61) + b[None, :]) % dedup._P61
        assert np.array_equal(sigs[i], vals.min(axis=0)), f"doc {i}"
