"""int8 MXU inference probes — MEASURED NEGATIVE record (round 3).

VERDICT r2 next-step #2 asked for the int8 inference lever to be attempted
or killed with numbers (v5e nominal int8 MXU ~= 2x bf16 peak). Killed with
numbers, at all three levels (TPU v5e via axon relay, chained-dispatch
methodology, same-harness bf16 controls):

1. **XLA conv emitter** (``lax.conv_general_dilated`` s8 x s8 ->
   ``preferred_element_type=int32`` + requantize epilogue), B8 128x128
   spatial, the fold=2 trunk shapes:

   | shape | bf16 | int8 | ratio |
   |---|---|---|---|
   | 128->384 (y0) | 68.9 TF/s | 88.1 TOP/s | **1.28x** |
   | 256->256 | 75.7 | 93.8 | 1.24x |
   | 64->320 (y1) | 31.3 | 30.7 | 0.98x |
   | 128->128 | 30.3 | 25.0 | 0.82x |

   Convs DO lower to int8 (no error), but the only shapes that gain are the
   already-fast wide ones; the fold=2 trunk tail (Cin=64: y1..y4) gains
   nothing. Projected end-to-end: <10% before quantization error — not worth
   the accuracy risk or the per-conv quant/requant plumbing.

2. **XLA pure matmul** 8192^3: int8 211.7 TOP/s vs bf16 127.4 TF/s =
   **1.66x** — the int8 MXU path is real and fast, but reaching it for convs
   requires an im2col matmul formulation, and im2col materialization was
   measured HBM-bound in round 2 (9x activation traffic,
   PROGRESS_NOTES r2) while the Pallas in-VMEM variant (kpack_conv.py) loses
   to XLA's conv emitter even in bf16 (45.5 vs 55.2 TF/s).

3. **Mosaic (Pallas) int8 dot** 1024^3 single block: compiles and runs
   bit-exact vs XLA, but measures 2.17 ms vs 1.23 ms for the identical bf16
   kernel — int8 dots are SLOWER inside Mosaic on this toolchain, so an
   int8 kpack kernel starts from behind.

Conclusion: the bf16 fold=2 XLA path stays the production inference route.
Revisit only if a future toolchain makes Mosaic int8 dots fast AND a
DMA-level tap-packing recipe removes the im2col VPU cost.

``run_probes()`` reproduces the numbers (real chip required; ~10 min with a
warm compile cache).
"""

from __future__ import annotations

import time

import numpy as np

__all__ = ["run_probes"]


def _time_chain(fn, x0, iters=12):
    """Dependency-chained timing with a device-scalar fence (the relay's
    block_until_ready does not fence; full-array D2H runs ~25 MB/s)."""
    import jax

    f = jax.jit(fn)
    x = f(x0)
    _ = np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x)
    _ = np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))
    return (time.perf_counter() - t0) / iters


def run_probes(shapes=((128, 384), (128, 128), (64, 320), (256, 256))) -> dict:
    """Re-run the int8-vs-bf16 conv + matmul probes; returns {name: TF/s}."""
    import jax
    import jax.numpy as jnp

    B, H, W = 8, 128, 128
    rng = np.random.default_rng(0)
    out = {}

    def conv(x, w, pet=None):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet,
        )

    for cin, cout in shapes:
        flops = 2 * B * H * W * 9 * cin * cout
        xb = jnp.asarray(rng.random((B, H, W, cin)), jnp.bfloat16)
        wb = jnp.asarray(rng.random((3, 3, cin, cout)) - 0.5, jnp.bfloat16)
        wb2 = jnp.asarray(rng.random((3, 3, cout, cin)) - 0.5, jnp.bfloat16)
        dt = _time_chain(lambda x: conv(conv(x, wb), wb2) * jnp.bfloat16(1e-3), xb) / 2
        out[f"bf16_conv_{cin}x{cout}_tfs"] = flops / dt / 1e12
        xi = jnp.asarray(rng.integers(-127, 127, (B, H, W, cin)), jnp.int8)
        wi = jnp.asarray(rng.integers(-127, 127, (3, 3, cin, cout)), jnp.int8)
        wi2 = jnp.asarray(rng.integers(-127, 127, (3, 3, cout, cin)), jnp.int8)

        def f_i8(x):
            y = (conv(x, wi, jnp.int32) >> 12).astype(jnp.int8)
            return (conv(y, wi2, jnp.int32) >> 12).astype(jnp.int8)

        dt = _time_chain(f_i8, xi) / 2
        out[f"int8_conv_{cin}x{cout}_tops"] = flops / dt / 1e12

    n = 8192
    flops = 2 * n**3
    a = jnp.asarray(rng.random((n, n)) - 0.5, jnp.bfloat16)
    b = jnp.asarray(rng.random((n, n)) - 0.5, jnp.bfloat16)
    dt = _time_chain(lambda x: (x @ b) * jnp.bfloat16(0.01), a)
    out["bf16_matmul_8192_tfs"] = flops / dt / 1e12
    ai = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
    bi = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)

    def mm_i8(x):
        y = jax.lax.dot_general(
            x, bi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (y >> 13).astype(jnp.int8)

    dt = _time_chain(mm_i8, ai)
    out["int8_matmul_8192_tops"] = flops / dt / 1e12
    return out


if __name__ == "__main__":
    for k, v in run_probes().items():
        print(f"{k}: {v:.1f}")
