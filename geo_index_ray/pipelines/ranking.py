"""Per-group ranking and stratified sampling operators.

Training-data-curation shapes: keep the top-k rows per group (best-k
documents per language/domain) and deterministic per-stratum sampling
(rebalance a corpus by language without a shuffle).  Both are single
map_batches passes plus (for top-k) one small groupby over per-batch
survivors — the shuffle never carries more than k rows per (group,
input block).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _topk_table(batch: pa.Table, key_col: str, order_col: str, id_col: str,
                k: int, with_rank: bool) -> pa.Table:
    """Rows with rank < k per key under (order_col DESC, id_col ASC) —
    one lexsort, first-occurrence rank, no per-group Python."""
    keys = batch[key_col]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    codes = pc.dictionary_encode(keys).indices.to_numpy(zero_copy_only=False)
    order = batch[order_col].to_numpy(zero_copy_only=False)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    # sort by (key, order DESC, id ASC); negating the order column is safe
    # for signed ints/floats from the table schema
    perm = np.lexsort((ids, -order.astype(np.float64), codes))
    ck = codes[perm]
    first = np.searchsorted(ck, ck, side="left")
    rank = np.arange(len(ck)) - first
    sel = rank < k
    # emit in (key, order DESC, id) order — ranks align positionally
    out = batch.take(pa.array(perm[sel]))
    if not with_rank:
        return out
    return out.append_column("rnk", pa.array(rank[sel] + 1))


def grouped_topk(ds, key_col: str, order_col: str, id_col: str, k: int):
    """Top-k rows per key by (order_col DESC, id_col ASC), with a 1-based
    ``rnk`` column — ROW_NUMBER() OVER (PARTITION BY key ORDER BY order
    DESC, id) <= k semantics.

    Per-batch pre-filter keeps ≤ k rows per key per block, so the
    groupby exchange is bounded by k × blocks per key regardless of group
    size; survivors shuffle under COARSE keys (``hash(key) %
    reducer_count`` — never one Python call per key) and each reducer
    re-ranks all of its keys exactly in one lexsort (the dictionary
    codes inside ``_topk_table`` group keys exactly; the hash only
    routes, so collisions are harmless).
    """
    from ..sources.pages import url_hash64
    from ..stages.util import coalesce_for_shuffle, reducer_count

    R = reducer_count()

    def partial(batch: pa.Table) -> pa.Table:
        out = _topk_table(batch, key_col, order_col, id_col, k, False)
        keys = out[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type):
            h = url_hash64(keys)
        else:
            with np.errstate(over="ignore"):
                h = (
                    keys.to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                    .view(np.uint64)
                    * _GOLDEN
                )
        return out.append_column(
            "rkey",
            pa.array(((h >> np.uint64(3)) % np.uint64(R)).astype(np.int64)),
        )

    survivors = coalesce_for_shuffle(
        ds.map_batches(partial, batch_format="pyarrow"), 0.5
    )

    def final(g: pa.Table) -> pa.Table:
        return _topk_table(
            g.drop_columns(["rkey"]), key_col, order_col, id_col, k, True
        )

    return survivors.groupby("rkey").map_groups(final, batch_format="pyarrow")


def stratified_sample(ds, stratum_col: str, id_col: str,
                      rates: dict[str, float], default_rate: float = 0.0):
    """Deterministic per-stratum sample: keep a row iff
    ``(id * golden64) mod 2^64 < floor(rate[stratum] * 2^64)``.

    Reproducible under any partitioning / retry (pure function of the
    row), no shuffle, and SQL-twin-expressible with the same HUGEINT
    arithmetic as the flat ``sample_docs`` query.
    """
    strata = list(rates)
    thresholds = {
        s: np.uint64(min(int(rates[s] * 2.0**64), 2**64 - 1)) for s in strata
    }
    default_thr = np.uint64(min(int(default_rate * 2.0**64), 2**64 - 1))

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            h = ids * _GOLDEN
        col = batch[stratum_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dic = pc.dictionary_encode(col)
        lut = np.array(
            [thresholds.get(v.as_py(), default_thr) for v in dic.dictionary],
            dtype=np.uint64,
        )
        thr = (
            lut[dic.indices.to_numpy(zero_copy_only=False)]
            if len(lut)
            else np.empty(0, np.uint64)
        )
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(pick, batch_format="pyarrow")


def sql_threshold(rate: float) -> int:
    """The oracle-side integer threshold for ``rate`` (same floor)."""
    return min(int(rate * 2.0**64), 2**64 - 1)
