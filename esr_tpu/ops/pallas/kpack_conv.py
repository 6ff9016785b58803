"""K-packed Pallas 3x3 conv: im2col via shifted slices + lane-concats.

Round-2 follow-up to the fused-RDB kernel (rdb_conv.py): the trunk's
remaining inefficiency is its narrow-Cin (32/64) convs, which XLA runs at
8-51 TF/s vs 144-194 for >=128-wide ones (PROGRESS_NOTES "v5e conv-shape
law"). Hypothesis: packing the contraction to K = 9 taps x Cin and feeding
the MXU 576-deep dots would close the gap. The r1 constraint log said bf16
rotates/concats were unsupported; a round-2 Mosaic probe showed the real
constraint is NARROWER — bf16 *rolls* fail, but bf16 lane-concat and
unaligned lane-slices compile and run. That makes this kernel expressible:
shifted tap views come from static/dynamic slices of a padded VMEM block
(never rolls), lane-concatenated into (rows*W, 9*Cin) im2col tiles.

MEASURED VERDICT (v5e, B8 128x128 Cin=64 Cout=128, chained-dispatch
methodology): this kernel 0.425 ms/conv (45.5 TF/s), XLA's conv emitter
0.350 ms/conv (55.2 TF/s), bit-exact parity (max-abs 0.0 vs lax.conv). XLA
already K-packs these shapes about as well as the MXU allows and fuses the
lrelu/add epilogues on top; the VPU cost of materializing im2col in VMEM
eats the difference. XLA therefore REMAINS the production path — the fold=2
block-diagonal rewrite (models/blocks.py) is how the lane problem is
actually solved. Kept as a correct, measured scaffold; revisit only with a
fundamentally different recipe (e.g. DMA-level tap packing).

Reference anchor: SURVEY.md §7.9 / north-star "fused Pallas conv kernels".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["kpack_conv3x3"]


def _make_kernel(h: int, w: int, cin: int, cout: int, rows_per_group: int):
    rg = rows_per_group

    def kernel(x_ref, w_ref, o_ref):
        # x_ref: (1, H+2, W+2, Cin); w_ref: (9*Cin, Cout); o_ref: (1, H, W, Cout)
        def body(g, carry):
            r0 = g * rg
            pieces = []
            for dy in range(3):
                for dx in range(3):
                    blk = x_ref[0, pl.ds(r0 + dy, rg), dx : dx + w, :]
                    pieces.append(blk.reshape(rg * w, cin))
            im2col = jnp.concatenate(pieces, axis=-1)  # (rg*W, 9*Cin)
            acc = jnp.dot(im2col, w_ref[:], preferred_element_type=jnp.float32)
            o_ref[0, pl.ds(r0, rg), :, :] = acc.reshape(rg, w, cout).astype(
                o_ref.dtype
            )
            return carry

        jax.lax.fori_loop(0, h // rg, body, 0)

    return kernel


def kpack_conv3x3(x: jax.Array, kernel: jax.Array, rows_per_group: int = 16,
                  interpret: bool = False) -> jax.Array:
    """SAME 3x3 conv, NHWC x HWIO -> NHWC, as K-packed MXU dots.

    x: (B, H, W, Cin) with H divisible by ``rows_per_group``;
    kernel: (3, 3, Cin, Cout). Exact (f32 accumulation) — see module
    docstring for the measured production verdict.
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    if h % rows_per_group:
        raise ValueError(f"rows_per_group={rows_per_group} must divide H={h}")
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wm = kernel.reshape(9 * cin, cout).astype(x.dtype)
    return pl.pallas_call(
        _make_kernel(h, w, cin, cout, rows_per_group),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        interpret=interpret,
    )(xp, wm)
