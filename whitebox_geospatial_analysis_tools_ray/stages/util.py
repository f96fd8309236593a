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


def combine_bounded(partials, combine, batch_format: str = "pandas"):
    """Single-task final combine for BOUNDED-key aggregations.

    After a per-batch combiner, partial rows number O(#keys × #blocks).
    When the key domain is bounded by the OPERATOR (a tile grid, lag
    bins, languages, window ids, class pairs) rather than by the data,
    that is a few MB at any input scale — and Ray's sort-based
    ``groupby().aggregate()`` costs seconds of FIXED wall on it (sort +
    one reduce task per block), a pure scaling-efficiency tax measured
    at ~4 s of 32-CPU wall on the flagship. One whole-block pandas
    combine keeps the tail O(#keys × #blocks) and scale-independent.

    Unbounded-key aggregations (exact dedup on content hashes, per-link
    stats) must keep the distributed groupby — do NOT route them here.
    """
    return partials.repartition(1).map_batches(
        combine, batch_format=batch_format, batch_size=None)


def groupwise_combine(final, keys):
    """Adapt a one-group ``final(g) -> DataFrame`` (as written for
    ``groupby().map_groups``) into a whole-partials combine for
    ``combine_bounded`` — identical per-group arithmetic, deterministic
    key order."""
    import pandas as pd

    def combine(df):
        if len(df) == 0:
            return final(df)
        return pd.concat([final(g) for _, g in df.groupby(keys, sort=True)],
                         ignore_index=True)

    return combine
