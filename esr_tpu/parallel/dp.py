"""Data-parallel training over an ICI mesh (SURVEY.md §5.8 TPU equivalent).

Idiomatic design: states carry a replicated NamedSharding, the per-step batch
is sharded over the ``data`` axis, and the whole train step is jitted with
those shardings — XLA's SPMD partitioner inserts the gradient ``psum`` over
ICI automatically (the scaling-book recipe: annotate, compile, let XLA place
collectives). No pmap, no manual collectives, and exactly the same pure step
function as single-chip.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_dp_train_step", "shard_batch", "replicate_states"]


def _check_divisible(batch, n_data: int, dim: int = 0):
    for leaf in jax.tree.leaves(batch):
        shape = getattr(leaf, "shape", None)
        if not shape or len(shape) <= dim:  # scalars have no batch dim
            continue
        n = shape[dim]
        if n is not None and n % n_data:
            raise ValueError(
                f"batch dim {n} does not divide the {n_data}-device 'data' "
                f"axis — use a divisible batch size"
            )


def shard_batch(batch, mesh: Mesh):
    """Place a host batch (array or pytree) with its leading dim sharded over
    the ``data`` axis."""
    _check_divisible(batch, mesh.shape["data"])
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_states(states, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), states)


def make_dp_train_step(
    train_step,
    mesh: Mesh,
    n_state_args: int = 1,
    n_batch_args: int = 1,
    n_extra_args: int = 0,
    donate: bool = True,
    batch_dim: int = 0,
):
    """Wrap a pure ``train_step(*states, *batches, *extras) -> out`` for DP.

    States are replicated over the mesh, batch args sharded on the ``data``
    axis along ``batch_dim`` (0 for a per-step batch; 1 for chunked multi-step
    batches stacked (k, N, ...) — the step axis stays unsharded), extras
    (rng, step, ...) replicated. Shardings are pytree prefixes, so each
    positional arg may itself be a pytree (e.g. a TrainState or a batch dict).
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(*((None,) * batch_dim), "data"))
    shardings = (
        (repl,) * n_state_args + (data,) * n_batch_args + (repl,) * n_extra_args
    )
    jitted = jax.jit(
        train_step,
        in_shardings=shardings,
        donate_argnums=tuple(range(n_state_args)) if donate else (),
    )
    n_data = mesh.shape["data"]

    def step(*args):
        # clear error instead of an opaque XLA sharding failure
        for b in args[n_state_args : n_state_args + n_batch_args]:
            _check_divisible(b, n_data, batch_dim)
        return jitted(*args)

    return step
