"""Distributed candidate-pair verification: hash-shuffle payload joins.

Near-dup pipelines (MinHash, hyperplane LSH, n-gram Jaccard) all end the
same way: a small set of candidate ``(a_id, b_id)`` pairs must be checked
against a per-id payload (signature / embedding / shingle set) that is far
too large to broadcast and must never ride the bucket shuffle.  This
module verifies the pairs with two id-hash shuffle joins, entirely inside
workers — the driver never touches data:

1. requests ``(a_id, b_id)`` are keyed by ``hash(a_id)``; payload rows
   ``(id, payload)`` by ``hash(id)``; one groupby co-locates them and the
   reducer attaches ``a_payload`` by a vectorized sorted lookup;
2. the half-joined rows re-key by ``hash(b_id)``, union with the payload
   rows again, and the second reducer attaches ``b_payload`` and calls the
   caller's vectorized verifier on the whole group at once.

A payload travels the network only for ids that actually appear in a
candidate pair side — O(candidates), not O(corpus).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .util import reducer_count


def hash_mod(ids: np.ndarray, R: int) -> np.ndarray:
    """Deterministic id → reducer-key hash (avalanched, not id % R)."""
    with np.errstate(over="ignore"):
        h = ids.astype(np.int64).view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(17)) % np.uint64(R)).astype(np.int64)


def _emit_payload(id_col: str, payload_col: str, R: int):
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        n = len(ids)
        ptype = batch.schema.field(payload_col).type
        return pa.table(
            {
                "jkey": pa.array(hash_mod(ids, R)),
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
                "pid": pa.array(ids),
                "pay": batch[payload_col],
                "a_id": pa.array(np.zeros(n, dtype=np.int64)),
                "b_id": pa.array(np.zeros(n, dtype=np.int64)),
                "apay": pa.nulls(n, ptype),
            }
        )

    return fn


def _gather_payload(g: pa.Table, req_ids: np.ndarray):
    """Vectorized payload lookup: group rows with kind==0 are the payload
    shard; return (found_mask, arrow payload values) for ``req_ids``."""
    kind = g["kind"].to_numpy()
    pmask = kind == 0
    pids = g["pid"].to_numpy().astype(np.int64)[pmask]
    pay = g["pay"].combine_chunks()
    if len(pids) == 0:
        return np.zeros(len(req_ids), dtype=bool), pay.take(pa.array([], pa.int64()))
    ppos = np.nonzero(pmask)[0]
    order = np.argsort(pids, kind="stable")
    pos = np.clip(np.searchsorted(pids[order], req_ids), 0, len(pids) - 1)
    found = pids[order][pos] == req_ids
    take_idx = ppos[order[pos[found]]]
    return found, pay.take(pa.array(take_idx, pa.int64()))


def verify_pairs(
    pairs_ds,
    payload_ds,
    id_col: str,
    payload_col: str,
    payload_type: pa.DataType,
    pair_reducer,
    R: int | None = None,
):
    """Attach each pair's two payloads and run ``pair_reducer`` per group.

    ``pairs_ds`` needs int64 ``a_id``/``b_id``; ``payload_ds`` needs
    ``id_col`` + ``payload_col``.  ``pair_reducer(a_id, b_id, a_pay, b_pay)``
    receives numpy id arrays + arrow payload arrays for one reducer's pairs
    at once (possibly empty) and returns a ``pa.Table``.
    """
    if R is None:
        R = reducer_count()

    def emit_requests(batch: pa.Table) -> pa.Table:
        a = batch["a_id"].to_numpy().astype(np.int64)
        b = batch["b_id"].to_numpy().astype(np.int64)
        n = len(a)
        return pa.table(
            {
                "jkey": pa.array(hash_mod(a, R)),
                "kind": pa.array(np.ones(n, dtype=np.int8)),
                "pid": pa.array(np.zeros(n, dtype=np.int64)),
                "pay": pa.nulls(n, payload_type),
                "a_id": pa.array(a),
                "b_id": pa.array(b),
                "apay": pa.nulls(n, payload_type),
            }
        )

    payload_emit = payload_ds.map_batches(
        _emit_payload(id_col, payload_col, R), batch_format="pyarrow"
    )
    stage1_in = pairs_ds.map_batches(emit_requests, batch_format="pyarrow").union(
        payload_emit
    )

    def stage1(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy()
        rmask = kind == 1
        n_req = int(rmask.sum())
        if n_req == 0:
            return pa.table(
                {
                    "jkey": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.int8()),
                    "pid": pa.array([], pa.int64()),
                    "pay": pa.nulls(0, payload_type),
                    "a_id": pa.array([], pa.int64()),
                    "b_id": pa.array([], pa.int64()),
                    "apay": pa.nulls(0, payload_type),
                }
            )
        a = g["a_id"].to_numpy().astype(np.int64)[rmask]
        b = g["b_id"].to_numpy().astype(np.int64)[rmask]
        found, apay = _gather_payload(g, a)
        a, b = a[found], b[found]
        n = len(a)
        return pa.table(
            {
                "jkey": pa.array(hash_mod(b, R)),
                "kind": pa.array(np.ones(n, dtype=np.int8)),
                "pid": pa.array(np.zeros(n, dtype=np.int64)),
                "pay": pa.nulls(n, payload_type),
                "a_id": pa.array(a),
                "b_id": pa.array(b),
                "apay": apay,
            }
        )

    half = stage1_in.groupby("jkey").map_groups(stage1, batch_format="pyarrow")
    stage2_in = half.union(payload_emit)

    def stage2(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy()
        rmask = kind == 1
        n_req = int(rmask.sum())
        if n_req == 0:
            return pair_reducer(
                np.empty(0, np.int64),
                np.empty(0, np.int64),
                pa.nulls(0, payload_type),
                pa.nulls(0, payload_type),
            )
        a = g["a_id"].to_numpy().astype(np.int64)[rmask]
        b = g["b_id"].to_numpy().astype(np.int64)[rmask]
        apay = g["apay"].combine_chunks().take(
            pa.array(np.nonzero(rmask)[0], pa.int64())
        )
        found, bpay = _gather_payload(g, b)
        sel = pa.array(np.nonzero(found)[0], pa.int64())
        return pair_reducer(a[found], b[found], apay.take(sel), bpay)

    return stage2_in.groupby("jkey").map_groups(stage2, batch_format="pyarrow")
