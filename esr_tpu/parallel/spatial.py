"""Spatial ("context") parallelism for large-image inference (SURVEY.md §5.7).

The reference processes large test images whole (memory-bound) or crops
regions in the GUI. The conv analogue of ring-attention/sequence parallelism
on TPU: shard the image height over the mesh's ``spatial`` axis with
``shard_map``, exchange halo rows with neighbours via ``lax.ppermute`` over
ICI, run the generator per shard, and crop the halos off. The generator's
total receptive field (23 RRDBs x 3 RDBs x 5 convs ≈ 700px) makes exact
sharding impractical; a configurable halo (default 32 LR px) bounds the
approximation error, which decays exponentially with distance through the
0.2-scaled residual blocks. Measured at FLAGSHIP depth (nb=23/nf=64,
Kaiming-init params, 4-shard mesh, LR 256x64, f32 — r3 sweep):

    halo (LR px):        4        8        16       32       64
    max-abs interior:  2.9e-02  2.7e-05  2.7e-05  2.7e-05  0.0
    mean-abs:          7.0e-05  3.8e-06  3.5e-06  1.4e-06  0.0

i.e. the error floor (~f32 epsilon of the residual chain) is reached by
halo=8 already; the default 32 keeps two orders of safety margin (trained
weights could decay slower than the x0.1-scaled init — the guard test in
tests/test_parallel.py re-checks the halo=8 floor at flagship depth). CEM
projection runs in its exact FFT form on the per-shard strip + halo, then
the halo is cropped.

``tiled_forward`` is the single-device analogue for memory-bound images:
static tile grid + overlap, lax-free host loop (each tile same shape -> one
compile), CEM projected on the full stitched image for exact consistency.

CEM note: pass the RAW generator as ``apply_fn`` and project the gathered
output globally (``cem.project(fwd(params, lr), lr)``) — per-strip projection
inside the shard would use strip-local circular boundaries and lose exactness
at strip seams (tiled_forward already does the global projection for you).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "spatial_sharded_forward",
    "spatial_window_forward",
    "spatial_fold_apply",
    "tiled_forward",
]


def spatial_fold_apply(apply_fn, fold: int, halo: int = 32, scale: int = 4):
    """Recover the batch->channel fold=2 MXU win for SMALL-batch inference by
    splitting each image into ``fold`` H-strips (single-device analogue of the
    halo-exchange above; SURVEY.md §5.7).

    The fold optimization (blocks.py) needs batch % fold == 0, so the
    reference eval regime — one image at a time (test.py:84 analogue) —
    silently ran unfolded and lost fold's +25-30%. Splitting H into ``fold``
    overlapping strips and stacking them as the batch makes every conv fold.
    Measured on v5e at DIV2K scale (LR 336x504, flagship model, r3):
    13.3 -> 17.2 MP/s (+29%), and the numerics are free:

    - strip seams: with halo=32 the stitched unfolded output is BIT-EXACT
      vs the whole-image forward (bf16, flagship depth — XLA's per-row conv
      accumulation is deterministic across batch/shape changes);
    - fold itself: folded-vs-truth error == unfolded-vs-truth error to all
      printed digits vs a CPU-f32 oracle (fold only reorders the K-dim
      reduction; docs/PERFORMANCE.md "spatial-fold eval" entry).

    Strip windows are clipped to the true image (no padding), so zero-pad
    SAME-conv edge semantics match the whole-image forward exactly; per-strip
    crop offsets are static Python ints — one XLA program per input shape.
    Images too short to split (H < stride + 2*halo) and batches already
    divisible by ``fold`` pass through unchanged. Wrap the RAW generator and
    project CEM on the stitched output (global exactness), as with
    ``tiled_forward``.
    """

    def wrapped(params, lr, z=None):
        n, h, w, c = lr.shape
        f = int(fold)
        stride = -(-h // f)
        # f=2: each strip needs the halo only on its seam side (rows =
        # stride+halo, overhead 1.19x at DIV2K scale); f>2 interior strips
        # need both sides (uniform rows is a batching constraint).
        rows = stride + halo * (1 if f == 2 else 2)
        if f <= 1 or n % f == 0 or rows >= h:
            return apply_fn(params, lr, z)
        if f == 2:
            starts = [0, h - rows]
        else:
            starts = [min(max(s * stride - halo, 0), h - rows) for s in range(f)]
        keeps = [(s * stride, min((s + 1) * stride, h)) for s in range(f)]
        # image-major strip order: [img0_s0 .. img0_s{f-1}, img1_s0, ...]
        strips = jnp.concatenate(
            [lr[i : i + 1, st : st + rows] for i in range(n) for st in starts], 0
        )
        zs = (
            jnp.concatenate(
                [z[i : i + 1, st : st + rows] for i in range(n) for st in starts], 0
            )
            if z is not None
            else None
        )
        raw = apply_fn(params, strips, zs)
        imgs = []
        for i in range(n):
            parts = [
                raw[i * f + s, (k0 - st) * scale : (k1 - st) * scale]
                for s, (st, (k0, k1)) in enumerate(zip(starts, keeps))
            ]
            imgs.append(jnp.concatenate(parts, 0)[None])
        return jnp.concatenate(imgs, 0)

    return wrapped


def spatial_sharded_forward(
    apply_fn,
    mesh: Mesh,
    scale: int = 4,
    halo: int = 32,
    axis: str = "spatial",
):
    """Build ``f(params, lr, z) -> sr`` sharding LR height over ``axis``.

    ``apply_fn(params, lr, z) -> sr`` is the (optionally CEM-wrapped)
    generator forward. LR height must divide the axis size, and the halo
    must fit inside a local strip (both validated at call time — silent
    wrong-halo results otherwise).

    Edge semantics: image top/bottom halos are REPLICATE-padded, which
    diverges from the whole-image forward's zero-pad SAME in the first/last
    ~halo rows. For eval parity use ``spatial_window_forward`` (below, r4)
    — exact edges at the cost of an LR all_gather. This ring variant stays
    the fully-activation-local building block (no gathered LR anywhere).
    """
    n_shards = mesh.shape[axis]

    def _validate(lr):
        if halo < 1:
            raise ValueError(
                f"halo must be >= 1 for the sharded forward (got {halo}); "
                "halo=0 seam-error measurement is supported on the batched "
                "spatial_fold_apply path, not here (the ppermute exchange "
                "and output crop degenerate at 0)"
            )
        h = lr.shape[1]
        if h % n_shards:
            raise ValueError(
                f"LR height {h} does not divide the {n_shards}-shard "
                f"'{axis}' axis — pad the image or change the mesh"
            )
        local = h // n_shards
        if halo > local:
            raise ValueError(
                f"halo {halo} exceeds the local strip height {local} "
                f"({h}px / {n_shards} shards) — shrink the halo or the mesh"
            )

    def shard_fn(params, lr, z):
        # lr: local strip (N, h_local, W, C)
        idx = jax.lax.axis_index(axis)
        up = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        down = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        top_halo = jax.lax.ppermute(lr[:, -halo:], axis, perm=up)
        bot_halo = jax.lax.ppermute(lr[:, :halo], axis, perm=down)
        # edge shards: replicate-pad instead of wrapping around the image
        top_halo = jnp.where(idx == 0, lr[:, :1].repeat(halo, axis=1), top_halo)
        bot_halo = jnp.where(
            idx == n_shards - 1, lr[:, -1:].repeat(halo, axis=1), bot_halo
        )
        lr_ext = jnp.concatenate([top_halo, lr, bot_halo], axis=1)
        z_ext = None
        if z is not None:
            top_z = jax.lax.ppermute(z[:, -halo:], axis, perm=up)
            bot_z = jax.lax.ppermute(z[:, :halo], axis, perm=down)
            top_z = jnp.where(idx == 0, z[:, :1].repeat(halo, axis=1), top_z)
            bot_z = jnp.where(idx == n_shards - 1, z[:, -1:].repeat(halo, axis=1), bot_z)
            z_ext = jnp.concatenate([top_z, z, bot_z], axis=1)
        sr_ext = apply_fn(params, lr_ext, z_ext)
        return sr_ext[:, halo * scale : -halo * scale]

    in_specs = (P(), P(None, axis, None, None), P(None, axis, None, None))
    out_specs = P(None, axis, None, None)

    def fwd(params, lr, z=None):
        _validate(lr)
        if z is None:
            f = shard_map(
                lambda p, x: shard_fn(p, x, None),
                mesh=mesh,
                in_specs=in_specs[:2],
                out_specs=out_specs,
            )
            return f(params, lr)
        f = shard_map(shard_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
        return f(params, lr, z)

    return fwd


def spatial_window_forward(
    apply_fn,
    mesh: Mesh,
    scale: int = 4,
    halo: int = 32,
    axis: str = "spatial",
    data_axis: str | None = None,
):
    """Exact-edge spatial sharding: ``f(params, lr, z) -> sr``.

    ``spatial_sharded_forward`` (above) exchanges halos over a ppermute ring
    and replicate-pads the image edges — cheap and activation-local, but the
    edge shards then see replicated context where the whole-image forward
    zero-pads (SAME), so the first/last ~halo output rows are approximate
    (r4 measurement: mean-abs up to 0.4-0.7 on a random-init net — fine for
    huge images, visible on small eval crops).

    This variant uses the ``spatial_fold_apply`` window policy instead,
    distributed: ``all_gather`` the LR strips over ``axis`` (LR is tiny —
    2MB at DIV2K scale — vs the trunk's FLOPs), then each shard slices an
    in-image window ``clip([i*local - halo, i*local + local + halo)) ->
    [0, H]`` (uniform ``local + 2*halo`` rows; edge windows shift inward
    rather than pad) and crops its kept rows from the window's SR at a
    per-shard offset. Strip content is always true image rows, so zero-pad
    SAME edge semantics are EXACT at image boundaries; interior seams carry
    only the halo-decay error (bit-exact by halo=32 at flagship depth —
    the spatial_fold_apply measurement). Activations are still 1/S per
    device (windows, not the gathered LR, feed the generator).

    Requires ``H % S == 0`` and ``2*halo <= H/S`` (windows must fit the
    image). Wrap the RAW generator; project CEM globally on the output.

    ``data_axis`` (r4, the TRAINING composition): when set, the batch dim
    additionally shards over that mesh axis (DP x spatial — params stay
    replicated, so their gradient transpose psums over BOTH axes). The LR
    all_gather stays ``axis``-only: each data shard gathers only its own
    batch slice's strips. Autodiff is supported — this wrapper is the
    ``train_spatial`` generator forward (BaseModel._train_parallel_apply):
    the window slice transposes to a zero-padded update, the gather to a
    reduce-scatter, and every saved trunk activation lives window-local,
    i.e. 1/S per device — spatial is the axis that shards TRAINING
    activation memory (TP shards params/compute; see tensor.py's
    memory-limit paragraph).
    """
    n_shards = mesh.shape[axis]
    if n_shards == 1:
        # single shard: the window IS the full image; a nonzero halo would
        # slice local+2*halo rows from an h==local image (trace-time crash
        # — ADVICE r4). Exactness is unaffected: halo only feeds seams.
        halo = 0

    def _validate(lr):
        if halo < 0:
            raise ValueError("halo must be >= 0")
        h = lr.shape[1]
        if h % n_shards:
            raise ValueError(
                f"LR height {h} does not divide the {n_shards}-shard "
                f"'{axis}' axis — pad the image or change the mesh"
            )
        if 2 * halo > h // n_shards:
            raise ValueError(
                f"2*halo ({2 * halo}) exceeds the local strip height "
                f"{h // n_shards} ({h}px / {n_shards} shards) — shrink the "
                "halo or the mesh"
            )

    def shard_fn(params, lr, z):
        idx = jax.lax.axis_index(axis)
        local = lr.shape[1]
        h = local * n_shards
        rows = local + 2 * halo
        start = jnp.clip(idx * local - halo, 0, h - rows)
        full = jax.lax.all_gather(lr, axis, axis=1, tiled=True)
        win = jax.lax.dynamic_slice_in_dim(full, start, rows, axis=1)
        z_win = None
        if z is not None:
            z_full = jax.lax.all_gather(z, axis, axis=1, tiled=True)
            z_win = jax.lax.dynamic_slice_in_dim(z_full, start, rows, axis=1)
        sr_win = apply_fn(params, win, z_win)
        keep = (idx * local - start) * scale
        return jax.lax.dynamic_slice_in_dim(sr_win, keep, local * scale, axis=1)

    act = P(data_axis, axis, None, None)
    in_specs = (P(), act, act)
    out_specs = act

    def fwd(params, lr, z=None):
        _validate(lr)
        if z is None:
            f = shard_map(
                lambda p, x: shard_fn(p, x, None),
                mesh=mesh,
                in_specs=in_specs[:2],
                out_specs=out_specs,
            )
            return f(params, lr)
        f = shard_map(shard_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
        return f(params, lr, z)

    return fwd


def tiled_forward(
    apply_fn,
    params,
    lr: jax.Array,
    z: jax.Array | None = None,
    tile: int = 128,
    overlap: int = 16,
    scale: int = 4,
    cem=None,
):
    """Memory-bound large-image inference: fixed-shape overlapping LR tiles
    (one XLA program for all tiles), stitched at HR, then one exact CEM
    projection over the full image (consistency is global, not per-tile)."""
    n, h, w, c = lr.shape
    step = tile - 2 * overlap
    if step <= 0:
        raise ValueError("tile must exceed 2*overlap")
    pad_h = (-(h - tile) % step) if h > tile else tile - h
    pad_w = (-(w - tile) % step) if w > tile else tile - w
    lr_p = jnp.pad(lr, ((0, 0), (overlap, overlap + pad_h), (overlap, overlap + pad_w), (0, 0)), mode="edge")
    z_p = (
        jnp.pad(z, ((0, 0), (overlap, overlap + pad_h), (overlap, overlap + pad_w), (0, 0)), mode="edge")
        if z is not None
        else None
    )
    out = jnp.zeros((n, (h + pad_h) * scale, (w + pad_w) * scale, c), dtype=jnp.float32)

    tiled_apply = jax.jit(apply_fn) if not hasattr(apply_fn, "lower") else apply_fn
    ys = range(0, h + pad_h, step)
    xs = range(0, w + pad_w, step)
    for y in ys:
        for x in xs:
            lr_t = jax.lax.dynamic_slice(lr_p, (0, y, x, 0), (n, tile, tile, c))
            z_t = (
                jax.lax.dynamic_slice(z_p, (0, y, x, 0), (n, tile, tile, z_p.shape[-1]))
                if z_p is not None
                else None
            )
            sr_t = tiled_apply(params, lr_t, z_t)
            inner = sr_t[
                :,
                overlap * scale : (tile - overlap) * scale,
                overlap * scale : (tile - overlap) * scale,
            ]
            out = jax.lax.dynamic_update_slice(
                out, inner.astype(out.dtype), (0, y * scale, x * scale, 0)
            )
    out = out[:, : h * scale, : w * scale]
    if cem is not None:
        out = cem.project(out, lr)
    return out
