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


def coalesce_partials(partials, num_partitions: int | None = None):
    """Shrink a pre-aggregated partials Dataset to a few blocks before the
    final ``groupby``.

    After a per-batch combiner, partial rows number O(#groups × #input
    blocks) — tiny relative to the scanned input — but Ray's sort-based
    aggregate schedules one reduce task per *input block*, so feeding it
    hundreds of near-empty blocks costs seconds of pure scheduling (the
    dominant cost on small inputs, and wasted tasks at scale). One cheap
    repartition keeps the heavy upstream scan fully parallel while making
    the final shuffle a handful of tasks.
    """
    if num_partitions is None:
        # Fixed CPU-scaled fan-out. (target_num_rows_per_block looks right
        # here but its StreamingRepartition only SPLITS blocks — it never
        # merges small ones, so it cannot shrink the reduce fan-out.)
        try:
            import ray
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        num_partitions = max(2, min(16, cpus // 2))
    return partials.repartition(num_partitions)
