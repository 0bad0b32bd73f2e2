"""Distributed candidate-pair verification: hash-shuffle payload joins.

Near-dup pipelines (MinHash, hyperplane LSH, n-gram Jaccard) all end the
same way: candidate ``(a_id, b_id)`` pairs must be checked against a
per-id payload (signature / embedding / shingle set) that is far too
large to broadcast and must never ride the bucket shuffle.  This module
verifies the pairs entirely inside workers — the driver never touches
data — with exactly TWO shuffles, and the payload table moves only once:

1. each pair emits two request rows, keyed by ``hash(a_id)`` and
   ``hash(b_id)``; payload rows ``(id, payload)`` key by ``hash(id)``.
   One groupby co-locates them; the reducer dedups the requests (every
   duplicate of a pair lands in the same group per side, so band/bucket
   duplicates die here — callers need NO separate pair-dedup pass) and
   attaches the side's payload by a vectorized sorted lookup;
2. the half-rows re-key by a pair hash; the second reducer zips the two
   sides and calls the caller's vectorized verifier per group.

A payload travels the network once per id that appears in any candidate
pair — O(distinct candidate ids), not O(corpus), and never twice.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .util import coalesce_for_shuffle, reducer_count


def hash_mod(ids: np.ndarray, R: int) -> np.ndarray:
    """Deterministic id → reducer-key hash (avalanched, not id % R)."""
    with np.errstate(over="ignore"):
        h = ids.astype(np.int64).view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(17)) % np.uint64(R)).astype(np.int64)


def pair_hash_mod(a: np.ndarray, b: np.ndarray, R: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = (
            a.astype(np.int64).view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ b.astype(np.int64).view(np.uint64) * np.uint64(0xD1B54A32D192ED03)
        )
    return ((h >> np.uint64(13)) % np.uint64(R)).astype(np.int64)


_BLOOM_BITS = 1 << 23  # 1 MiB bitmap, two hash probes


def _bloom_positions(ids: np.ndarray):
    with np.errstate(over="ignore"):
        u = ids.astype(np.int64).view(np.uint64)
        h1 = u * np.uint64(0x9E3779B97F4A7C15)
        h2 = (u ^ np.uint64(0xD1B54A32D192ED03)) * np.uint64(0x94D049BB133111EB)
    m = np.uint64(_BLOOM_BITS)
    return ((h1 >> np.uint64(17)) % m).astype(np.int64), (
        (h2 >> np.uint64(17)) % m
    ).astype(np.int64)


_BLOOM_SPARSE_MAX = 32768  # distinct positions; above this emit the bitmap


def _bloom_of_pairs(pairs_ds) -> np.ndarray:
    """Fixed-size Bloom bitmap of every id appearing in a candidate pair.

    Two-level distributed reduce: each pair block emits its ids' bit
    POSITIONS (sparse int64, usually a few KB) or the dense 1 MiB bitmap
    when a block is huge; a merge stage ORs those into at most 8 bitmaps
    inside workers; the driver ORs only that fixed handful — O(1) driver
    bytes regardless of block count (a flat per-block OR on the driver
    would stream blocks × 1 MiB through one process)."""

    def block_bloom(batch: pa.Table) -> pa.Table:
        ids = np.unique(
            np.concatenate(
                [
                    batch["a_id"].to_numpy().astype(np.int64),
                    batch["b_id"].to_numpy().astype(np.int64),
                ]
            )
        )
        p1, p2 = _bloom_positions(ids)
        pos = np.unique(np.concatenate([p1, p2]))
        if len(pos) <= _BLOOM_SPARSE_MAX:
            return pa.table(
                {"kind": pa.array([0], pa.int8()),
                 "blob": pa.array([pos.tobytes()], pa.binary())}
            )
        bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table(
            {"kind": pa.array([1], pa.int8()),
             "blob": pa.array([bits.tobytes()], pa.binary())}
        )

    def merge_blooms(batch: pa.Table) -> pa.Table:
        bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
        kinds = batch["kind"].to_numpy()
        for i in range(batch.num_rows):
            blob = batch["blob"][i].as_py()
            if kinds[i] == 0:
                pos = np.frombuffer(blob, dtype=np.int64)
                np.bitwise_or.at(
                    bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
                )
            else:
                bits |= np.frombuffer(blob, dtype=np.uint8)
        return pa.table(
            {"kind": pa.array([1], pa.int8()),
             "blob": pa.array([bits.tobytes()], pa.binary())}
        )

    from .util import cluster_cpus

    # fan-in sized to the cluster: ~1 merge task per 4 cores keeps the
    # driver's final OR at a fixed handful of 1 MiB bitmaps while the
    # merge stage itself stays parallel on big clusters
    fan_in = max(2, cluster_cpus() // 4)
    merged = (
        pairs_ds.map_batches(block_bloom, batch_format="pyarrow")
        .repartition(fan_in)
        .map_batches(merge_blooms, batch_format="pyarrow", batch_size=None)
    )
    agg = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    for b in merged.iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            if b["kind"][i].as_py() == 0:
                pos = np.frombuffer(b["blob"][i].as_py(), dtype=np.int64)
                np.bitwise_or.at(
                    agg, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
                )
            else:
                agg |= np.frombuffer(b["blob"][i].as_py(), dtype=np.uint8)
    return agg


def _bloom_contains(bits: np.ndarray, ids: np.ndarray) -> np.ndarray:
    p1, p2 = _bloom_positions(ids)
    has1 = (bits[p1 >> 3] >> (p1 & 7).astype(np.uint8)) & 1
    has2 = (bits[p2 >> 3] >> (p2 & 7).astype(np.uint8)) & 1
    return (has1 & has2).astype(bool)


def verify_pairs(
    pairs_ds,
    payload_ds,
    id_col: str,
    payload_col: str,
    payload_type: pa.DataType,
    pair_reducer,
    R: int | None = None,
    payload_factory=None,
):
    """Attach each pair's two payloads and run ``pair_reducer`` per group.

    ``pairs_ds`` needs int64 ``a_id``/``b_id`` — duplicates allowed (they
    are deduped in the first reducer).  ``payload_ds`` needs ``id_col`` +
    ``payload_col``.  ``pair_reducer(a_id, b_id, a_pay, b_pay)`` receives
    numpy id arrays + arrow payload arrays for one reducer's pairs at once
    (possibly empty) and returns a ``pa.Table``.

    ``payload_factory(bloom_ref)``, when given, replaces ``payload_ds``:
    it is called with the broadcast Bloom-bitmap ref of the candidate ids
    and returns the payload dataset.  Callers whose payload is DERIVED
    (e.g. recomputed signatures) push the Bloom filter upstream of the
    derivation, so the expensive per-row kernel runs only for ids that
    appear in some candidate pair — nothing corpus-sized is ever pinned.
    """
    if R is None:
        R = reducer_count()

    # normalize fixed-size-list payloads to variable lists: a NULL
    # fixed-size-list row still materializes its full-width child buffer,
    # so request rows (payload columns all null) would each carry the
    # payload's byte width through both exchanges — measured 1 GB of dead
    # nulls on a 2.5M-doc run.  Variable-list nulls are ~5 B.
    if pa.types.is_fixed_size_list(payload_type):
        _target_type = pa.list_(payload_type.value_type)

        def _norm(col):
            return col.cast(_target_type)

        payload_type = _target_type
    else:

        def _norm(col):
            return col

    # Bloom semi-join: the payload table is corpus-sized but only ids that
    # appear in some candidate pair matter.  A broadcast 1 MiB Bloom of
    # the pair ids filters payload rows BEFORE they enter the exchange, so
    # the join moves O(candidate payloads), not the corpus (false
    # positives only add a few stray payload rows — the join drops them).
    import time

    import ray

    from .util import stage_mark

    _t0 = time.perf_counter()
    pairs_ds = pairs_ds.materialize()  # consumed twice: bloom + requests
    _t0 = stage_mark("pairjoin.pairs_materialize", _t0)
    bloom_ref = ray.put(_bloom_of_pairs(pairs_ds))
    _t0 = stage_mark("pairjoin.bloom", _t0)
    if payload_factory is not None:
        payload_ds = payload_factory(bloom_ref)

    def emit_requests(batch: pa.Table) -> pa.Table:
        a = batch["a_id"].to_numpy().astype(np.int64)
        b = batch["b_id"].to_numpy().astype(np.int64)
        n = len(a)
        jkey = np.concatenate([hash_mod(a, R), hash_mod(b, R)])
        side = np.concatenate(
            [np.zeros(n, dtype=np.int8), np.ones(n, dtype=np.int8)]
        )
        aa = np.concatenate([a, a])
        bb = np.concatenate([b, b])
        return pa.table(
            {
                "jkey": pa.array(jkey),
                "kind": pa.array(np.ones(2 * n, dtype=np.int8)),
                "side": pa.array(side),
                "pid": pa.array(np.zeros(2 * n, dtype=np.int64)),
                "pay": pa.nulls(2 * n, payload_type),
                "a_id": pa.array(aa),
                "b_id": pa.array(bb),
            }
        )

    class _EmitPayload:
        def __init__(self, ref):
            self.ref = ref
            self.bits = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.bits is None:
                self.bits = ray.get(self.ref)
            ids = batch[id_col].to_numpy().astype(np.int64)
            keep = _bloom_contains(self.bits, ids)
            batch = batch.filter(pa.array(keep))
            ids = ids[keep]
            n = len(ids)
            return pa.table(
                {
                    "jkey": pa.array(hash_mod(ids, R)),
                    "kind": pa.array(np.zeros(n, dtype=np.int8)),
                    "side": pa.array(np.zeros(n, dtype=np.int8)),
                    "pid": pa.array(ids),
                    "pay": _norm(batch[payload_col].combine_chunks()),
                    "a_id": pa.array(np.zeros(n, dtype=np.int64)),
                    "b_id": pa.array(np.zeros(n, dtype=np.int64)),
                }
            )

    emit_payload = _EmitPayload(bloom_ref)

    # coalesce before each exchange: Ray's sort shuffle cost grows with
    # input-block × output-partition pairs, and the union doubles blocks
    stage1_in = coalesce_for_shuffle(
        pairs_ds.map_batches(emit_requests, batch_format="pyarrow").union(
            payload_ds.map_batches(emit_payload, batch_format="pyarrow")
        ),
        0.5,
    )

    def _empty_half() -> pa.Table:
        return pa.table(
            {
                "pkey": pa.array([], pa.int64()),
                "side": pa.array([], pa.int8()),
                "a_id": pa.array([], pa.int64()),
                "b_id": pa.array([], pa.int64()),
                "pay": pa.nulls(0, payload_type),
            }
        )

    def attach(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy()
        rmask = kind == 1
        if not rmask.any():
            return _empty_half()
        a = g["a_id"].to_numpy().astype(np.int64)[rmask]
        b = g["b_id"].to_numpy().astype(np.int64)[rmask]
        side = g["side"].to_numpy()[rmask]
        # dedup (a, b, side): every duplicate of a pair hashes here with
        # the same side — band/bucket multiplicity dies in this pass
        order = np.lexsort((side, b, a))
        a, b, side = a[order], b[order], side[order]
        keep = np.r_[
            True,
            (a[1:] != a[:-1]) | (b[1:] != b[:-1]) | (side[1:] != side[:-1]),
        ]
        a, b, side = a[keep], b[keep], side[keep]
        want = np.where(side == 0, a, b)
        # payload shard lookup (sorted ids + searchsorted)
        pmask = kind == 0
        pids = g["pid"].to_numpy().astype(np.int64)[pmask]
        if len(pids) == 0:
            return _empty_half()
        ppos = np.nonzero(pmask)[0]
        porder = np.argsort(pids, kind="stable")
        pos = np.clip(np.searchsorted(pids[porder], want), 0, len(pids) - 1)
        found = pids[porder][pos] == want
        take_idx = ppos[porder[pos[found]]]
        pay = g["pay"].combine_chunks().take(pa.array(take_idx, pa.int64()))
        a, b, side = a[found], b[found], side[found]
        return pa.table(
            {
                "pkey": pa.array(pair_hash_mod(a, b, R)),
                "side": pa.array(side),
                "a_id": pa.array(a),
                "b_id": pa.array(b),
                "pay": pay,
            }
        )

    half = coalesce_for_shuffle(
        stage1_in.groupby("jkey").map_groups(attach, batch_format="pyarrow"), 0.5
    )

    def combine(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy()
        a = g["a_id"].to_numpy().astype(np.int64)
        b = g["b_id"].to_numpy().astype(np.int64)
        if len(a) == 0:
            return pair_reducer(
                np.empty(0, np.int64),
                np.empty(0, np.int64),
                pa.nulls(0, payload_type),
                pa.nulls(0, payload_type),
            )
        # align the two sides of each pair by sorting (a, b) within side
        am, bm = side == 0, side == 1
        oa = np.lexsort((b[am], a[am]))
        ob = np.lexsort((b[bm], a[bm]))
        ia = np.nonzero(am)[0][oa]
        ib = np.nonzero(bm)[0][ob]
        # both sides present (an id missing from the payload table drops
        # its side in stage 1) — intersect the sorted pair lists
        pa_keys = np.stack([a[ia], b[ia]], axis=1)
        pb_keys = np.stack([a[ib], b[ib]], axis=1)
        if len(ia) != len(ib) or not np.array_equal(pa_keys, pb_keys):
            # rare path: prune to the common (a,b) set via void-view isin
            va = np.ascontiguousarray(pa_keys).view([("a", np.int64), ("b", np.int64)]).ravel()
            vb = np.ascontiguousarray(pb_keys).view([("a", np.int64), ("b", np.int64)]).ravel()
            common_a = np.isin(va, vb)
            common_b = np.isin(vb, va)
            ia, ib = ia[common_a], ib[common_b]
        pay = g["pay"].combine_chunks()
        return pair_reducer(
            a[ia],
            b[ia],
            pay.take(pa.array(ia, pa.int64())),
            pay.take(pa.array(ib, pa.int64())),
        )

    return half.groupby("pkey").map_groups(combine, batch_format="pyarrow")
