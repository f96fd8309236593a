"""Shared stage helpers."""

from __future__ import annotations


def pool_size(cap: int = 16) -> tuple[int, int]:
    """Autoscaling actor-pool bounds: (1, min(cap, cluster CPUs - 1)).

    A FIXED pool equal to the session CPU count deadlocks the streaming
    executor (all CPUs held by idle actors, none left for the upstream
    read tasks); starting at 1 and autoscaling avoids that while still
    filling the machine under load.
    """
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return (1, max(1, min(cap, cpus - 1)))
