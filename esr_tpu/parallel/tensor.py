"""Tensor parallelism (channel sharding) for the RRDB trunk.

Beyond SURVEY.md §2.13: the reference's only parallelism is
``nn.DataParallel`` — it has no tensor-parallel story. For a fully
convolutional SR net the *natural* "tensor" axes are spatial
(``parallel/spatial.py`` — the conv analogue of sequence parallelism) and
batch (DP); channel TP is the third, Megatron-style axis, useful when a
single image is too small to shard spatially any further but per-step
latency still matters, and as the PARAMS-memory-scaling axis for
hypothetical very-wide generators (kernels, their optimizer moments, and
per-conv compute all scale 1/T per device).

**Memory-scaling limit (be precise about what shards):** activations do
NOT shard in ``tp_trunk``/``tp_rrdb_apply`` — every device holds the full
replicated feature maps and grows them by the per-conv concat
(``_rdb_forward_rowparallel``); the 1/T savings apply to params + Adam
moments + per-conv compute only. When activation memory is the binding
constraint (large spatial extents — the usual case for conv SR), use
``spatial_tp_apply`` (r4): ONE shard_map over a ('spatial','model') mesh
that halo-shards H (activations 1/S, including the 4x HR stages) AND
row-parallels the trunk convs (params + compute 1/T) simultaneously.

Design (the scaling-book row-parallel recipe, adapted to dense blocks):

- Every RDB conv is **row-parallel**: its kernel is sharded over the
  *input*-channel dim (``shard_map`` in_spec ``P(None,None,None,'model')``
  on the stacked ``(nb,3,3,cin,cout)`` leaves), each device convolves its
  contiguous Cin slice of the (replicated) input, and a ``psum`` over the
  ``model`` axis completes the channel reduction. Bias + LeakyReLU are
  applied once, after the psum.
- Row-parallel (not column-parallel + all_gather) because the RDB's dense
  connectivity means every conv consumes the *concat of all previous
  features*: with row sharding the concat stays a free, local slice of
  replicated activations — there is no per-feature re-gather step, and the
  only collectives are the 5 psums per RDB (one per conv), each the size of
  that conv's output.
- Per device the convs run the plain concat formulation at width cin/T —
  the per-source "packed" rewrite (blocks.py) is a single-device MXU-lane
  trick and is deliberately not used here; the param tree is identical
  either way, so checkpoints are interchangeable.
- The 1x1 ``latent_proj`` of ``latent_input='all_layers'`` stays replicated
  (its Cin = nf + num_latent_channels is not generally divisible by T and
  it is ~0.1% of the FLOPs).
- Pre/post-trunk layers run replicated (``parallel/common.py``), so the
  wrapper is a drop-in ``apply(variables, lr, z=None)``.

Exactness: same math as ``model.apply`` up to float reduction order (the
psum splits each conv's Cin reduction across devices) — pinned in
``tests/test_parallel.py::test_tp_trunk_matches_sequential`` for forward
AND parameter gradients. ``psum`` transposes to itself under autodiff, so
``jax.grad`` through this wrapper is valid tensor-parallel backprop.

Composability: the ``model`` axis is orthogonal to ``data`` (DP),
``spatial`` (halo sharding) and ``stage`` (pipeline); ``dryrun_multichip``
exercises it alongside the other three.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from esr_tpu.parallel.common import check_trunk_parallel_model, make_outer_apply

__all__ = [
    "make_tp_mesh",
    "tp_trunk",
    "tp_rrdb_apply",
    "make_spatial_tp_mesh",
    "spatial_tp_apply",
]


def make_tp_mesh(
    n_shards: int | None = None, devices=None, data: int = 1
) -> Mesh:
    """A ('model',) mesh for channel tensor parallelism — or, with
    ``data > 1``, a 2-axis ('data', 'model') mesh for composed DP x TP
    (batch sharded over 'data', channels over 'model')."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_shards or len(devices) // data
    # n >= 1 guard: data > len(devices) would floor n to 0 and build an
    # empty 'model' mesh whose shard_map failure is inscrutable (ADVICE r3)
    if n < 1 or data < 1 or n * data > len(devices):
        raise ValueError(
            f"asked for {data}x{n} (data x model) shards but only "
            f"{len(devices)} devices are available"
        )
    if data > 1:
        return Mesh(
            np.asarray(devices[: n * data]).reshape(data, n),
            axis_names=("data", "model"),
        )
    return Mesh(np.asarray(devices[:n]), axis_names=("model",))


def _rdb_forward_rowparallel(p_rdb, x, dtype, axis):
    """One ResidualDenseBlock5C with Cin-sharded conv kernels.

    ``p_rdb[f'conv{j}']['Conv_0']['kernel']`` arrives as the LOCAL shard
    (3,3,cin_j/T,cout_j); the matching input slice is taken from the
    replicated concat features by this device's axis index."""
    tid = jax.lax.axis_index(axis)
    feats = x
    outs = []
    for j in range(1, 6):
        k = p_rdb[f"conv{j}"]["Conv_0"]["kernel"]
        b = p_rdb[f"conv{j}"]["Conv_0"]["bias"]
        c_local = k.shape[2]
        xin = jax.lax.dynamic_slice_in_dim(feats, tid * c_local, c_local, axis=3)
        part = jax.lax.conv_general_dilated(
            xin,
            k.astype(xin.dtype),
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = jax.lax.psum(part, axis) + b.astype(dtype)
        if j < 5:
            xj = jax.nn.leaky_relu(y, negative_slope=0.2)
            feats = jnp.concatenate([feats, xj], axis=-1)
        else:
            outs = y
    return x + 0.2 * outs


def _check_tp_divisible(model, tp: int) -> None:
    if model.nf % tp or model.gc % tp:
        raise ValueError(
            f"channel TP over {tp} devices requires nf ({model.nf}) and gc "
            f"({model.gc}) divisible by {tp}"
        )


def _make_block_apply(model, axis: str):
    """Per-RRDB carry update with row-parallel convs (psum over ``axis``);
    shared by the TP-only trunk and the spatial x TP composition."""
    all_layers = model.latent_input == "all_layers" and model.num_latent_channels
    dtype = model.dtype

    def one_block(p, trunk):
        out = trunk
        for i in range(1, 4):
            out = _rdb_forward_rowparallel(p["block"][f"rdb{i}"], out, dtype, axis)
        return trunk + 0.2 * out

    if not all_layers:
        return one_block

    def block_apply(p, carry):
        trunk, z = carry
        t = jnp.concatenate([trunk, z], axis=-1)
        kp = p["latent_proj"]["Conv_0"]
        t = jax.lax.conv_general_dilated(
            t,
            kp["kernel"].astype(t.dtype),
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + kp["bias"].astype(dtype)
        return one_block(p, t), z

    return block_apply


def _tp_spec_for(axis: str):
    def spec_for(path, leaf):
        # stacked RDB conv kernels (nb,3,3,cin,cout): shard Cin (axis 3);
        # everything else (biases, the replicated latent_proj) stays full
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if "block" in names and names[-1] == "kernel" and leaf.ndim == 5:
            return P(None, None, None, axis, None)
        return P()

    return spec_for


def tp_trunk(model, mesh: Mesh, axis: str = "model", data_axis: str | None = None):
    """Build ``fn(rrdb_scan_params, carry) -> carry`` running the nb-block
    trunk with row-parallel channel sharding over ``axis``.

    Requires ``model.nf % T == 0`` and ``model.gc % T == 0`` so every conv's
    Cin (= nf + k*gc) splits evenly across the T shards.

    With ``data_axis`` set (2-axis DP x TP mesh from ``make_tp_mesh(data=)``)
    the activations additionally shard their batch dim over ``data_axis``;
    the per-conv psums stay model-axis-only, so the two axes compose without
    extra collectives (params replicated over 'data', batch replicated over
    'model' — the standard 2D layout).
    """
    _check_tp_divisible(model, mesh.shape[axis])
    block_apply = _make_block_apply(model, axis)
    spec_for = _tp_spec_for(axis)

    def stage_fn(blocks, carry):
        def body(c, p):
            return block_apply(p, c), None

        y, _ = jax.lax.scan(body, carry, blocks)
        return y

    act_spec = P(data_axis) if data_axis else P()

    def trunk_fn(blocks, carry):
        specs = jax.tree_util.tree_map_with_path(spec_for, blocks)
        act_specs = jax.tree.map(lambda _: act_spec, carry)
        fn = shard_map(
            stage_fn, mesh=mesh, in_specs=(specs, act_specs), out_specs=act_specs
        )
        return fn(blocks, carry)

    return trunk_fn


def tp_rrdb_apply(model, mesh: Mesh, axis: str = "model"):
    """Drop-in ``fn(variables, lr, z=None) -> sr`` running ``model``'s
    (RRDBNet, scan layout) forward with the trunk channel-sharded over
    ``axis`` (see module docstring). Pre/post-trunk layers run replicated.

    If ``mesh`` also carries a 'data' axis (``make_tp_mesh(data=)``), the
    trunk composes DP x TP: batch over 'data', channels over 'model'."""
    check_trunk_parallel_model(model, "tp_rrdb_apply")
    data_axis = "data" if "data" in mesh.axis_names else None
    return make_outer_apply(model, tp_trunk(model, mesh, axis, data_axis))


def make_spatial_tp_mesh(spatial: int, tp: int, devices=None) -> Mesh:
    """A 2-axis ('spatial', 'model') mesh for the composed spatial x TP
    forward (``spatial_tp_apply``)."""
    devices = list(devices if devices is not None else jax.devices())
    if spatial < 1 or tp < 1 or spatial * tp > len(devices):
        raise ValueError(
            f"asked for {spatial}x{tp} (spatial x model) shards but only "
            f"{len(devices)} devices are available"
        )
    return Mesh(
        np.asarray(devices[: spatial * tp]).reshape(spatial, tp),
        axis_names=("spatial", "model"),
    )


def spatial_tp_apply(
    model,
    mesh: Mesh,
    halo: int = 32,
    scale: int | None = None,
    spatial_axis: str = "spatial",
    axis: str = "model",
):
    """Composed spatial x channel-TP forward: ``fn(variables, lr, z=None) ->
    raw_sr`` on a 2-axis ('spatial', 'model') mesh.

    This is the composition the TP module docstring's memory-limit paragraph
    points at — it shards BOTH binding resources at once (r4, VERDICT r3
    weak #4):

    - activations 1/S per device: LR height is sharded over ``spatial_axis``
      using the exact-edge WINDOW policy of
      ``spatial.spatial_window_forward`` (all_gather the tiny LR, slice an
      in-image ``local + 2*halo`` window per shard, crop the kept rows from
      the window's SR) — every feature map, trunk AND the 4x-size HR
      stages, lives window-local;
    - trunk params + per-conv compute 1/T per device: the RDB convs run
      row-parallel over ``axis`` (one psum per conv, exactly as
      ``tp_trunk``); pre/post-trunk layers run on the local window,
      replicated over 'model'.

    ONE ``shard_map`` over both axes — the LR all_gather rides
    ``spatial_axis``, the reduction psums ride ``axis``; no other
    collectives. Approximation: interior-seam halo decay only (image edges
    are exact zero-pad SAME — see spatial_window_forward's docstring; the
    spatial_fold_apply measurement pins bit-exactness by halo=32 at
    flagship depth); TP adds float reduction-order noise. Wrap the RAW
    generator; project CEM globally on the gathered output (same rule as
    the other spatial paths).
    """
    check_trunk_parallel_model(model, "spatial_tp_apply")
    _check_tp_divisible(model, mesh.shape[axis])
    if halo < 0:
        raise ValueError("halo must be >= 0")
    sc = int(scale if scale is not None else model.scale)
    n_shards = mesh.shape[spatial_axis]
    if n_shards == 1:
        # single spatial shard: the window IS the full image; a nonzero halo
        # would slice local+2*halo rows from an h==local image (trace-time
        # crash — ADVICE r4, same fix as spatial_window_forward)
        halo = 0
    block_apply = _make_block_apply(model, axis)

    def stage_fn(blocks, carry):
        def body(c, p):
            return block_apply(p, c), None

        y, _ = jax.lax.scan(body, carry, blocks)
        return y

    inner_apply = make_outer_apply(model, stage_fn)

    def shard_fn(variables, lr, z):
        idx = jax.lax.axis_index(spatial_axis)
        local = lr.shape[1]
        h = local * n_shards
        rows = local + 2 * halo
        start = jnp.clip(idx * local - halo, 0, h - rows)

        def window(x):
            full = jax.lax.all_gather(x, spatial_axis, axis=1, tiled=True)
            return jax.lax.dynamic_slice_in_dim(full, start, rows, axis=1)

        sr_win = inner_apply(variables, window(lr), None if z is None else window(z))
        keep = (idx * local - start) * sc
        return jax.lax.dynamic_slice_in_dim(sr_win, keep, local * sc, axis=1)

    act_spec = P(None, spatial_axis, None, None)

    def fwd(variables, lr, z=None):
        h = lr.shape[1]
        if h % n_shards:
            raise ValueError(
                f"LR height {h} does not divide the {n_shards}-shard "
                f"'{spatial_axis}' axis — pad the image or change the mesh"
            )
        if 2 * halo > h // n_shards:
            raise ValueError(
                f"2*halo ({2 * halo}) exceeds the local strip height "
                f"{h // n_shards} ({h}px / {n_shards} shards) — shrink the "
                "halo or the mesh"
            )
        param_specs = jax.tree_util.tree_map_with_path(_tp_spec_for(axis), variables)
        if z is None:
            f = shard_map(
                lambda v, x: shard_fn(v, x, None),
                mesh=mesh,
                in_specs=(param_specs, act_spec),
                out_specs=act_spec,
            )
            return f(variables, lr)
        f = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(param_specs, act_spec, act_spec),
            out_specs=act_spec,
        )
        return f(variables, lr, z)

    return fwd
