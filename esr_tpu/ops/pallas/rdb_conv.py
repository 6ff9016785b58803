"""Fused ResidualDenseBlock-5C forward as a single Pallas TPU kernel.

The RDB (SURVEY.md §2.8) is the generator's innermost hot block: five 3x3
convs with dense concat connections and LeakyReLU(0.2), x0.2 residual. The
XLA path materializes every intermediate (x1..x4) and concat in HBM between
convs; this kernel keeps the whole dense chain in VMEM:

- grid over the batch; one program owns a full (padded) image tile;
- each conv is expressed as 9 tap-shifted MXU matmuls accumulated in f32
  (``pltpu.roll`` + ``jnp.dot``) — the concat inputs are never materialized,
  each prior feature contributes its own matmul partial sums;
- boundary handling: the host pads 5px (the 5-conv receptive margin); rolls
  wrap garbage into at most a 5px ring which the margin absorbs, so the
  cropped interior equals SAME-padded conv composition exactly (tested vs
  the flax block in interpreter mode).

V1 scope: inference forward, whole-image tiles (H, W <= ~160 at nf=64 within
the 16MB VMEM budget — the training-crop and bench regime). Larger images
and a custom VJP land with the H-strip halo variant (PROGRESS_NOTES.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_rdb5c", "rdb5c_params_from_flax"]

_MARGIN = 5  # receptive margin of the 5-conv chain


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _conv3x3_taps(feats, w_ref, b):
    """SAME 3x3 conv over the (virtual) concat of ``feats``.

    Scheme: matmul the UNSHIFTED feature chunk per tap, then rotate the f32
    partial (Mosaic only rotates 32-bit data; the MXU operand stays bf16).
    The 9 taps run under a ``fori_loop`` with tap-stacked weights — a fully
    unrolled version (135 matmuls for the whole block) OOM-kills this
    environment's remote Mosaic compile helper.

    ``w_ref``: (9, Cin_total, Cout) VMEM ref, tap-major; f32 accumulation.
    """
    hp, wp = feats[0].shape[0], feats[0].shape[1]
    cout = w_ref.shape[-1]
    acc = jnp.broadcast_to(b.astype(jnp.float32), (hp, wp, cout))
    off = 0
    for f in feats:
        cf = f.shape[-1]
        f2d = f.reshape(hp * wp, cf)

        def body(tap, acc, f2d=f2d, off=off, cf=cf):
            tap_w = w_ref[tap, off : off + cf, :].astype(f2d.dtype)
            z = jnp.dot(f2d, tap_w, preferred_element_type=jnp.float32)
            z = z.reshape(hp, wp, cout)
            dy, dx = tap // 3, tap % 3
            z = pltpu.roll(z, (1 - dy) % hp, 0)  # pltpu.roll: shift >= 0
            z = pltpu.roll(z, (1 - dx) % wp, 1)
            return acc + z

        acc = jax.lax.fori_loop(0, 9, body, acc)
        off += cf
    return acc


def _rdb_kernel(x_ref, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, out_ref):
    x = x_ref[0]  # (Hp, Wp, nf) — Hp/Wp tile-aligned (multiple of 16)
    dt = x.dtype
    hp, wp = x.shape[0], x.shape[1]
    h, w = out_ref.shape[1], out_ref.shape[2]
    m = _MARGIN
    # SAME-conv parity: intermediates must read as ZERO outside the original
    # image (flax zero-pads each conv at the image edge); the mask also wipes
    # the roll wraparound garbage every stage.
    # float mask built 3-D directly (Mosaic can't minor-dim-expand i1 vectors)
    rows = jax.lax.broadcasted_iota(jnp.int32, (hp, wp, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hp, wp, 1), 1)
    inside = (
        (rows >= m) & (rows < m + h) & (cols >= m) & (cols < m + w)
    ).astype(jnp.float32)

    def conv(feats, w_ref, b, act):
        y = _conv3x3_taps(feats, w_ref, b)
        if act:
            y = _lrelu(y)
        return (y * inside).astype(dt)

    x1 = conv([x], w1, b1[:], True)
    x2 = conv([x, x1], w2, b2[:], True)
    x3 = conv([x, x1, x2], w3, b3[:], True)
    x4 = conv([x, x1, x2, x3], w4, b4[:], True)
    x5 = _conv3x3_taps([x, x1, x2, x3, x4], w5, b5[:])
    out = x[m : m + h, m : m + w].astype(jnp.float32) + 0.2 * x5[m : m + h, m : m + w]
    out_ref[0] = out.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def fused_rdb5c(x: jax.Array, params: dict, interpret: bool = False) -> jax.Array:
    """Fused RDB forward. x: (N, H, W, nf); params: {'w1'..'w5', 'b1'..'b5'}
    with wk (3,3,Cin_k,Cout_k) HWIO and bk (1, Cout_k)."""
    n, h, w, c = x.shape
    m = _MARGIN
    # tile-align the padded working shape (Mosaic rejects unaligned rolls);
    # high-side extra padding is zero and masked out like the margin
    hp = -(-(h + 2 * m) // 16) * 16
    wp = -(-(w + 2 * m) // 16) * 16
    xp = jnp.pad(x, ((0, 0), (m, hp - h - m), (m, wp - w - m), (0, 0)))
    weight_args = []
    for k in range(1, 6):
        wk = params[f"w{k}"]
        # tap-major stacking (9, Cin, Cout) for the fori_loop tap scheme
        weight_args += [
            wk.reshape(9, wk.shape[2], wk.shape[3]),
            params[f"b{k}"].reshape(1, -1),
        ]
    return pl.pallas_call(
        _rdb_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=pl.BlockSpec(
            (1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        interpret=interpret,
    )(xp, *weight_args)


def rdb5c_params_from_flax(rdb_params: dict) -> dict:
    """flax ResidualDenseBlock5C param tree -> this kernel's params dict."""
    out = {}
    for k in range(1, 6):
        conv = rdb_params[f"conv{k}"]["Conv_0"]
        out[f"w{k}"] = conv["kernel"]
        out[f"b{k}"] = conv["bias"]
    return out
