"""Pipeline parallelism (GPipe-style) for the RRDB trunk (beyond SURVEY.md
§2.13: the reference's only parallelism is ``nn.DataParallel`` — it has no
pipeline story at all).

The TPU-idiomatic pp axis for this architecture: the trunk is ``nb``
*identical* residual blocks whose params the scan layout already stacks
along a leading ``(nb, ...)`` axis (``rrdb_scan/block`` — architecture.py).
Shard THAT axis over a ``stage`` mesh axis with ``shard_map`` — each device
owns ``nb / n_stages`` consecutive blocks — and stream microbatches through
the ring with ``lax.ppermute``: the standard scaling-book pipelining recipe
(schedule: simple GPipe fill-drain, ``n_micro + n_stages - 1`` ticks).

Why this shape:

- **No weight movement.** Blocks stay put; only activations ride ICI
  (one (mb, H, W, nf) tensor per tick per stage boundary). For deep trunks
  (nb >> nf footprint) this is the memory-scaling axis DP cannot offer:
  a 10x-deeper generator than flagship (nb=230) fits because each stage
  holds nb/S blocks' params + one microbatch's activations.
- **Autodiff-native.** ``ppermute`` transposes to the reverse permute, so
  ``jax.grad`` through this wrapper IS pipelined backprop (fill-drain,
  GPipe-exact gradients — no stale-weight schedule approximations).
- **Composability.** Only the trunk is staged. The cheap pre/post stages
  (conv_first, trunk_conv, upsampling, HR convs — a few % of FLOPs) run
  replicated on every stage, which costs compute no one was using during
  their own bubble anyway and keeps the wrapper a drop-in
  ``apply(variables, lr, z)``.

Bubble fraction is the usual (S-1)/(M+S-1); pick ``n_micro >= 4*stages``
for >80% utilization. Exactness: the pipelined forward is the SAME math as
the sequential scan (same blocks, same order, microbatching only splits the
batch dim) — equivalence is pinned to near-f32-exactness in
``tests/test_parallel.py::test_pipelined_trunk_matches_sequential``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "make_stage_mesh",
    "pipelined_trunk",
    "pipelined_rrdb_apply",
    "pipelined_rrdb_apply_auto",
    "derive_n_micro",
]

_micro_warned: set = set()


def derive_n_micro(batch_size: int, n_stages: int, requested=None) -> int:
    """Pick the GPipe microbatch count for a (trace-time static) batch size.

    ``requested`` (the user's ``eval_pp_micro``/``train_pp_micro``) is
    honored when it divides the batch; otherwise the largest divisor of the
    batch <= requested is used (logged). Unset -> auto: the smallest divisor
    of the batch >= ``4 * n_stages`` (the >80%-utilization guideline in this
    module's docstring), or the whole batch when it is smaller than that —
    maximal microbatching is the best available bubble fraction. Warns
    loudly (once per shape) when forced to 1 with multiple stages: that is
    a (S-1)/S-idle pipeline; raise the batch (``eval_batch``) to fix it.
    """
    b = int(batch_size)
    s = max(1, int(n_stages))
    if requested:
        m = min(int(requested), b)
        while b % m:
            m -= 1
        if m != int(requested) and ("req", b, int(requested)) not in _micro_warned:
            _micro_warned.add(("req", b, int(requested)))
            import logging

            logging.getLogger("base").info(
                f"pp: requested n_micro={requested} does not divide "
                f"batch={b}; using {m}"
            )
    else:
        target = 4 * s
        m = b if b <= target else next(
            (d for d in range(target, b + 1) if b % d == 0), b
        )
    if m == 1 and s > 1 and ("bubble", b) not in _micro_warned:
        _micro_warned.add(("bubble", b))
        import logging

        logging.getLogger("base").warning(
            f"pp: batch={b} forces n_micro=1 over {s} stages — the GPipe "
            f"bubble idles {s - 1}/{s} of the pipeline; batch more images "
            "per forward (eval_batch) to amortize the fill/drain"
        )
    return m


def make_stage_mesh(n_stages: int | None = None, devices=None) -> Mesh:
    """A 1-axis ('stage',) mesh for pipelining."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    n = n_stages or len(devices)
    if n > len(devices):
        raise ValueError(f"asked for {n} stages but only {len(devices)} devices")
    return Mesh(np.asarray(devices[:n]), axis_names=("stage",))


def pipelined_trunk(
    block_apply,
    mesh: Mesh,
    n_micro: int,
    axis: str = "stage",
):
    """Build ``fn(stacked_block_params, x) -> y`` applying ``nb`` sequential
    blocks, param-stacked along axis 0 and sharded over ``axis``, to ``x``
    via GPipe microbatch pipelining.

    ``block_apply(one_block_params, carry) -> carry`` applies ONE block
    (same signature the nn.scan trunk body uses). ``x`` may be a single
    (B, ...) array or a PYTREE of them (e.g. ``(trunk, z)`` for the
    all_layers latent, where the Z map rides the ring alongside its
    microbatch). B must divide by ``n_micro``; nb by the stage count.
    """
    n_stages = mesh.shape[axis]

    def stage_fn(local_blocks, x):
        sid = jax.lax.axis_index(axis)
        m = n_micro

        def to_mb(a):
            return a.reshape(m, a.shape[0] // m, *a.shape[1:])

        mb = jax.tree.map(to_mb, x)
        # the carry becomes stage-varying after the first tick (ppermute /
        # per-stage writes); mark the zero init as varying up front so the
        # scan carry types match (shard_map vma tracking)
        varying = lambda a: jax.lax.pcast(a, (axis,), to="varying")  # noqa: E731
        state = jax.tree.map(lambda a: varying(jnp.zeros_like(a[0])), mb)
        outs = jax.tree.map(lambda a: varying(jnp.zeros_like(a)), mb)

        def chunk(xin):
            def body(carry, p):
                return block_apply(p, carry), None

            y, _ = jax.lax.scan(body, xin, local_blocks)
            return y

        def tick(carry, t):
            state, outs = carry
            # stage 0 ingests microbatch t (clamped during drain); others
            # consume what the previous stage handed over last tick
            ti = jnp.clip(t, 0, m - 1)
            inp = jax.tree.map(
                lambda mbl, s: jnp.where(sid == 0, mbl[ti], s), mb, state
            )
            y = chunk(inp)
            # the last stage emits microbatch t-(S-1) once the fill ends
            oidx = t - (n_stages - 1)
            valid = jnp.logical_and(sid == n_stages - 1, oidx >= 0)
            o = jnp.clip(oidx, 0, m - 1)
            outs = jax.tree.map(
                lambda os, yl: os.at[o].set(jnp.where(valid, yl, os[o])), outs, y
            )
            state = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % n_stages) for i in range(n_stages)]
            )
            return (state, outs), None

        (state, outs), _ = jax.lax.scan(
            tick, (state, outs), jnp.arange(m + n_stages - 1)
        )
        # only the last stage holds the real outputs; replicate them so the
        # (replicated) post-trunk stages see the full result everywhere
        outs = jax.tree.map(
            lambda os: jax.lax.psum(
                jnp.where(sid == n_stages - 1, os, jnp.zeros_like(os)), axis
            ),
            outs,
        )
        return jax.tree.map(lambda a: a.reshape(-1, *a.shape[2:]), outs)

    return shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
    )


def pipelined_rrdb_apply_auto(model, mesh: Mesh, requested=None, axis: str = "stage"):
    """:func:`pipelined_rrdb_apply` with the microbatch count derived from
    each call's (trace-time static) batch via :func:`derive_n_micro` —
    one pipelined program is built per distinct count and cached. Used by
    both the eval forward (``eval_pp``) and the trainers (``train_pp``),
    whose batch sizes differ per call site."""
    n_stages = mesh.shape[axis]
    cache: dict = {}

    def apply(variables, lr, z=None):
        m = derive_n_micro(lr.shape[0], n_stages, requested)
        fn = cache.get(m)
        if fn is None:
            fn = cache[m] = pipelined_rrdb_apply(model, mesh, n_micro=m, axis=axis)
        return fn(variables, lr, z)

    return apply


def pipelined_rrdb_apply(model, mesh: Mesh, n_micro: int, axis: str = "stage"):
    """Drop-in ``fn(variables, lr, z=None) -> sr`` running ``model``'s
    (RRDBNet, scan layout) forward with the trunk pipelined over ``axis``.

    Pre/post-trunk layers run replicated on every stage (a few % of the
    FLOPs); the nb-block trunk — ~90% of the network — is staged. Math is
    identical to ``model.apply`` (tested); restrictions: ``scan_blocks``
    params layout, ``fold == 1``, ``nb %% n_stages == 0``. With
    ``latent_input='all_layers'`` the Z map rides the ring alongside its
    microbatch (carry = (trunk, z), exactly like the sequential scan body).
    """
    from esr_tpu.models.blocks import RRDB, ConvLRelu
    from esr_tpu.parallel.common import check_trunk_parallel_model, make_outer_apply

    check_trunk_parallel_model(model, "pipelined_rrdb_apply")
    n_stages = mesh.shape[axis]
    if model.nb % n_stages:
        raise ValueError(f"nb={model.nb} not divisible by {n_stages} stages")

    all_layers = model.latent_input == "all_layers" and model.num_latent_channels
    block = RRDB(model.nf, model.gc, model.dtype, model.packed, 1)
    proj = ConvLRelu(model.nf, kernel=1, act=False, dtype=model.dtype)

    if all_layers:

        def block_apply(p, carry):
            trunk, z = carry
            t = jnp.concatenate([trunk, z], axis=-1)
            t = proj.apply({"params": p["latent_proj"]}, t)
            return block.apply({"params": p["block"]}, t), z

    else:

        def block_apply(p, x):
            return block.apply({"params": p["block"]}, x)

    return make_outer_apply(model, pipelined_trunk(block_apply, mesh, n_micro, axis))
