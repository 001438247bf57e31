"""Join utilities.

``Dataset.join`` (Ray 2.49 hash shuffle) runs on dedicated aggregator ACTORS
that reserve CPUs for the whole join. Composing two joins — or a join and
another actor-pool stage — in one streaming graph can deadlock on small CPU
budgets: the first join's aggregators hold every CPU while the downstream
pool waits for an actor slot that never frees. ``safe_join`` therefore runs
each join as its own isolated execution (materialize barrier): the join gets
the full cluster, finishes, releases its actors, and downstream stages start
from materialized blocks. The barrier cost is one object-store round trip of
the join output — which our pipelines checkpoint to Parquet right after
anyway.

``num_partitions`` defaults to ~2× cluster CPUs (more on a real multi-node
cluster via the explicit argument).
"""

from __future__ import annotations


def default_join_partitions() -> int:
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(4, cpus)


def safe_join(
    left,
    right,
    on: tuple,
    right_on: tuple | None = None,
    join_type: str = "inner",
    num_partitions: int | None = None,
    left_suffix: str | None = None,
    right_suffix: str | None = None,
):
    # num_partitions > cluster CPUs deadlocks the aggregator actor pool on
    # small clusters (each aggregator reserves a CPU while upstream tasks
    # starve) — clamp locally, and reserve only half a CPU per aggregator so
    # the producing tasks always have room.
    cap = default_join_partitions()
    parts = min(num_partitions, cap) if num_partitions else cap
    joined = left.join(
        right,
        join_type=join_type,
        num_partitions=parts,
        on=on,
        right_on=right_on,
        left_suffix=left_suffix,
        right_suffix=right_suffix,
        aggregator_ray_remote_args={"num_cpus": 0.5},
    )
    return joined.materialize()
