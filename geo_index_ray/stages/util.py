"""Shared stage helpers."""

from __future__ import annotations

import os
import time


def stage_mark(name: str, t0: float) -> float:
    """Print a ``SUBSTAGE`` timing line when GRAFT_STAGE_DEBUG is set.

    Instrumentation for the scaling-criterion work: library pipelines mark
    their internal execution boundaries (materialize points, shuffles) so
    `bench.py --child` output shows where an under-scaling leg spends its
    wall.  Zero cost when the env var is unset."""
    now = time.perf_counter()
    if os.environ.get("GRAFT_STAGE_DEBUG"):
        print(f"SUBSTAGE {name} {now - t0:.1f}", flush=True)
    return now


def default_concurrency(cap: int = 8) -> int:
    """Actor-pool size that never starves upstream task operators.

    An actor pool of size == cluster CPUs deadlocks the streaming executor
    (the read/transform tasks feeding the pool can't get a CPU), so size
    pools to at most half the CPUs, capped.
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        cpus = 4
    return max(1, min(cap, cpus // 2))


def cluster_cpus() -> int:
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        pass
    return 4


def shuffle_block_count() -> int:
    """Number of blocks to feed an all-to-all (groupby/sort) operator.

    Ray's sort-based shuffle cost grows superlinearly with input block
    count (maps × reduces object transfers), but reduce-side parallelism
    is bounded by the block count too — fewer blocks than cores leaves
    cores idle through the widest stage.  One block per core balances
    both.  On a big multi-node cluster the same rule holds per the
    aggregate CPU count — blocks should stay in the tens-of-MB to ~128MB
    range, not the KB range that per-task overhead turns into the
    bottleneck.
    """
    return max(2, cluster_cpus())


def coalesce_for_shuffle(ds, frac: float = 1.0):
    """Coalesce (no shuffle) a dataset about to enter a groupby/sort."""
    n = max(2, int(shuffle_block_count() * frac))
    return ds.repartition(n)


def topk_per_group(cands, group_col: str, k: int, sort_cols, sort_desc,
                   keep_cols, rank_col: str = "rank"):
    """Exact per-group top-k under a lexicographic order, reduced under
    COARSE keys: one shuffle on ``hash(group) % reducer_count()``, then
    one lexsort + first-occurrence ranking per reducer — never a Python
    call per group (``groupby(query_id).map_groups`` costs one
    interpreter call per query, which dominates at 10⁴+ queries).

    ``sort_cols``/``sort_desc`` define the within-group order (ties cut
    ROW_NUMBER-style); ``keep_cols`` are the output columns (group and
    sort columns included only if listed); ``rank_col`` is appended
    1-based.

    Descending integer sort columns are negated IN int64 (bias-flip from
    the dtype max), never via float64 — a float cast would collapse
    distinct int64 magnitudes above 2^53 (timestamps/hash ids) and
    mis-rank.  Float columns negate in their own dtype.
    """
    import numpy as np
    import pyarrow as pa

    R = reducer_count()
    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def add_rkey(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            rk = ((g.view(np.uint64) * GOLD) >> np.uint64(33)) % np.uint64(R)
        return batch.append_column("rkey", pa.array(rk.astype(np.int64)))

    keyed = coalesce_for_shuffle(
        cands.map_batches(add_rkey, batch_format="pyarrow"), 0.25
    )

    def merge_many(g: pa.Table) -> pa.Table:
        grp = g[group_col].to_numpy(zero_copy_only=False)
        keys = []
        for c, d in zip(sort_cols, sort_desc):
            a = g[c].to_numpy(zero_copy_only=False)
            if not d:
                keys.append(a)
            elif a.dtype.kind in "iMm":
                # ~a = -a-1: order-reversing, exact at any magnitude,
                # no overflow anywhere in the int64 range (datetime64 /
                # timedelta64 are int64 under the hood — view, not cast)
                keys.append(np.bitwise_not(
                    a.view(np.int64) if a.dtype.kind in "Mm"
                    else a.astype(np.int64)))
            elif a.dtype.kind == "u":
                keys.append(np.iinfo(a.dtype).max - a)  # exact, in-dtype
            else:
                keys.append(-a.astype(np.float64))
        # lexsort: primary key last
        perm = np.lexsort(tuple(reversed(keys)) + (grp,))
        gs = grp[perm]
        first = np.searchsorted(gs, gs, side="left")
        rank = np.arange(len(gs)) - first
        sel = rank < k
        # Arrow take keeps every payload column's exact type — no
        # pandas float64/object round-trip for ids, strings, timestamps
        idx = pa.array(perm[sel])
        out = {c: g[c].take(idx) for c in keep_cols}
        out[rank_col] = pa.array((rank[sel] + 1).astype(np.int64))
        return pa.table(out)

    return keyed.groupby("rkey").map_groups(merge_many, batch_format="pyarrow")


def reducer_count(frac: float = 1.0) -> int:
    """Reducer-key cardinality for coarse-keyed reduces.

    ``groupby(fine_key).map_groups`` pays one Python call per group — fatal
    when groups are tiny and plentiful (LSH buckets, pair dedup).  Instead
    shuffle on ``coarse_key = hash(fine_key) % reducer_count()`` and reduce
    all of a reducer's fine groups vectorized in one call.  Scales with the
    cluster: ~2 reducers per CPU keeps every core busy without tiny tasks.
    """
    return max(4, int(cluster_cpus() * 2 * frac))


def rkey_of(keys, R: int):
    """Coarse reducer routing key ``hash(key) % R`` — THE shared recipe
    for rule-3 shuffles (string keys hash off the Arrow UTF-8 buffer via
    ``pages.url_hash64``; integer keys golden-ratio mix).  Accepts a
    ``pa.Array``/``pa.ChunkedArray`` or an int64 numpy array; returns
    int64 numpy.  Routing only — reducers never depend on the recipe, so
    every call site can share it and improvements land everywhere at
    once.
    """
    import numpy as np
    import pyarrow as pa

    _GOLD = np.uint64(0x9E3779B97F4A7C15)
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if isinstance(keys, pa.Array):
        if pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type):
            from ..sources.pages import url_hash64

            h = url_hash64(keys)
        else:
            with np.errstate(over="ignore"):
                h = (
                    keys.to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                    .view(np.uint64)
                    * _GOLD
                ) >> np.uint64(33)
    else:
        with np.errstate(over="ignore"):
            h = (
                np.asarray(keys).astype(np.int64).view(np.uint64) * _GOLD
            ) >> np.uint64(33)
    return (h % np.uint64(R)).astype(np.int64)


def gap_pair_offsets(starts, sizes):
    """Yield (t0, t1) position-index array pairs that together cover every
    unordered within-group pair exactly once, for groups laid out
    contiguously in a sorted array (``starts`` = first position of each
    group, ``sizes`` = group lengths).

    The k-offset sweep: iteration k pairs every position t with t+k inside
    the same group, so each yield is one fully vectorized slab of
    ``sum(max(size-k, 0))`` pairs and the loop runs ``max(sizes)-1`` times
    — Python overhead scales with the LARGEST group, not the pair count.
    Callers index their own payload arrays with t0/t1 and apply their
    per-pair filter per slab (simhash popcount, jaccard bounds, ...).
    """
    import numpy as np

    for k in range(1, int(sizes.max(initial=1))):
        act = np.nonzero(sizes > k)[0]
        if not len(act):
            return
        cnt = sizes[act] - k
        t0 = np.repeat(starts[act], cnt) + (
            np.arange(int(cnt.sum())) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        )
        yield t0, t0 + k
