"""Shared stage helpers."""

from __future__ import annotations


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
