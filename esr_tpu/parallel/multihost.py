"""Multi-host (DCN) data-parallel training (SURVEY.md §5.8: the reference has
no multi-node path; this is the TPU-native equivalent).

Helpers a pod deployment needs: process-group init, per-host data sharding,
and global-batch assembly from per-host shards. The full multi-process path
is validated WITHOUT a pod by a localhost dryrun: ``python -m
esr_tpu.parallel.multihost --coordinator localhost:PORT --num-processes N
--process-id I`` runs one DP train step over the global (cross-process) mesh
on forced-CPU devices; tests/test_multihost_mp.py launches N such processes
and asserts the step equals a single-process run of the same global batch
(VERDICT r1 next-step #7).
"""

from __future__ import annotations

import jax

__all__ = [
    "init_distributed",
    "host_shard",
    "global_device_array",
    "run_dryrun_step",
]


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


def run_dryrun_step(seed: int = 0, global_batch: int = 4) -> dict:
    """One deterministic DP train step over the GLOBAL mesh (all processes'
    devices): tiny RRDB, synthetic batch assembled from this host's shard via
    :func:`global_device_array`, gradient psum inserted by the SPMD
    partitioner across the process boundary. Every process must report the
    same metrics, equal to a single-process run with the same seed/mesh size
    — the cross-host correctness invariant this module exists to provide."""
    import numpy as np
    import jax.numpy as jnp
    import optax

    from esr_tpu.models.architecture import RRDBNet
    from esr_tpu.parallel.dp import make_dp_train_step
    from esr_tpu.parallel.mesh import make_mesh

    pi, pc = jax.process_index(), jax.process_count()
    mesh = make_mesh()  # all global devices
    model = RRDBNet(nf=4, nb=1, gc=2, scale=4)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 8, 8, 3)))["params"]
    tx = optax.sgd(1e-2)
    opt_state = tx.init(params)

    rng_np = np.random.default_rng(seed)
    lr_g = rng_np.random((global_batch, 8, 8, 3)).astype(np.float32)
    hr_g = rng_np.random((global_batch, 32, 32, 3)).astype(np.float32)
    if global_batch % pc:
        raise ValueError(f"global_batch {global_batch} not divisible by {pc} processes")
    per = global_batch // pc
    local = {
        "LR": lr_g[pi * per : (pi + 1) * per],
        "HR": hr_g[pi * per : (pi + 1) * per],
    }
    batch = global_device_array(local, mesh)

    def train_step(state, batch, _rng):
        params, opt_state = state

        def loss_fn(p):
            sr = model.apply({"params": p}, batch["LR"])
            return jnp.mean(jnp.abs(sr - batch["HR"]))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state), loss

    dp_step = make_dp_train_step(
        train_step, mesh, n_state_args=1, n_extra_args=1, donate=False
    )
    (params2, _), loss = dp_step((params, opt_state), batch, jax.random.PRNGKey(0))
    leaf = np.asarray(jax.tree.leaves(params2)[0])  # replicated -> addressable
    return {
        "n_devices": len(jax.devices()),
        "loss": float(loss),
        "param_l1": float(np.abs(leaf).sum()),
    }


def _main(argv=None) -> None:
    import argparse
    import json

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--global-batch", type=int, default=4)
    a = ap.parse_args(argv)
    pi, pc = init_distributed(a.coordinator, a.num_processes, a.process_id)
    out = run_dryrun_step(global_batch=a.global_batch)
    print(json.dumps({"process": pi, "process_count": pc, **out}), flush=True)


if __name__ == "__main__":
    _main()
