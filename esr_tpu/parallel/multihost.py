"""Multi-host (DCN) scaffolding (SURVEY.md §5.8: "multi-host over DCN later").

Single-host is this round's tested regime; these helpers are the entry points
a pod deployment needs: process-group init, per-host data sharding, and
global-batch assembly from per-host shards. The degenerate single-process
path is exercised in tests; real multi-host needs a pod environment.
"""

from __future__ import annotations

import jax

__all__ = ["init_distributed", "host_shard", "global_device_array"]


def init_distributed(coordinator_address: str | None = None, num_processes: int | None = None, process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed when running multi-process; no-op single.

    Returns (process_index, process_count)."""
    if coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def host_shard(items: list, process_index: int | None = None, process_count: int | None = None) -> list:
    """Deterministic per-host slice of a dataset's item list (each host loads
    only its shard; the reference's DataLoader has no multi-node analogue)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return items[pi::pc]


def global_device_array(local_batch, mesh):
    """Assemble a data-sharded global array from this host's local batch
    (jax.make_array_from_process_local_data over the 'data' axis)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), local_batch
    )
