"""Cluster-aware runtime sizing helpers.

Round-1 hardcoded ``concurrency=2`` on every text/ANN actor-pool stage,
which starves a 32-CPU node (and a cluster far worse). Stages now size
their pools from the live cluster: an autoscaling ``(1, n_cpus)`` range
so small inputs don't pay 32 actor startups but large inputs fan out to
every core.
"""

from __future__ import annotations

import os


def cluster_cpus(default: int = 4) -> int:
    """Total CPUs in the connected Ray cluster (fallback: local cores)."""
    try:
        import ray

        if ray.is_initialized():
            n = int(ray.cluster_resources().get("CPU", 0))
            if n > 0:
                return n
    except Exception:
        pass
    return os.cpu_count() or default


def sf_tag(sf_dir: str) -> str:
    """The scale-factor tag ('sf0.01', …) from a corpus dir path —
    parsed from the basename, not a substring match ('0.1' appearing
    elsewhere in the path must not change fixture sizing)."""
    return os.path.basename(os.path.normpath(sf_dir))


def auto_concurrency(cap: int | None = None) -> tuple[int, int]:
    """Autoscaling actor-pool size for ``map_batches(Cls, concurrency=…)``:
    ``(1, min(cluster CPUs, cap))``. Ray grows the pool only while the
    stage has queued blocks, so tiny inputs stay at one actor while a
    100 TB read saturates the cluster."""
    n = cluster_cpus()
    if cap is not None:
        n = min(n, cap)
    return (1, max(1, n))
