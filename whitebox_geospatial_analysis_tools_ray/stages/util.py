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


def bucketed_agg(partials, keys, combine, num_buckets: int = 64,
                 batch_format: str = "pandas"):
    """Distributed combine for UNBOUNDED-key aggregations.

    Ray's sort-based ``groupby().aggregate()`` / per-key ``map_groups``
    pays ~1 ms of per-group Python machinery (measured: 4.8 s for 4.7k
    md5 groups, 24 s for 25k ngram groups at sf0.1), so aggregations
    whose key domain grows with the data hash-bucket the key columns
    into a BOUNDED shuffle key and run one vectorized pandas
    ``combine(bucket_df) -> DataFrame`` per bucket. ``combine`` sees
    all partial rows of every key in its bucket (each key lives in
    exactly one bucket) and must do the per-key reduction itself
    (``df.groupby(keys).agg(...)``), vectorized.
    """
    import pandas as pd

    def add_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        h = pd.util.hash_pandas_object(df[list(keys)],
                                       index=False).to_numpy()
        return df.assign(__bucket__=(h % num_buckets).astype("int64"))

    def comb(g: "pd.DataFrame") -> "pd.DataFrame":
        return combine(g.drop(columns="__bucket__"))

    return (coalesce_partials(
                partials.map_batches(add_bucket, batch_format=batch_format))
            .groupby("__bucket__")
            .map_groups(comb, batch_format=batch_format))
