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


def reducer_count(frac: float = 1.0) -> int:
    """Reducer-key cardinality for coarse-keyed reduces.

    ``groupby(fine_key).map_groups`` pays one Python call per group — fatal
    when groups are tiny and plentiful (LSH buckets, pair dedup).  Instead
    shuffle on ``coarse_key = hash(fine_key) % reducer_count()`` and reduce
    all of a reducer's fine groups vectorized in one call.  Scales with the
    cluster: ~2 reducers per CPU keeps every core busy without tiny tasks.
    """
    return max(4, int(cluster_cpus() * 2 * frac))
