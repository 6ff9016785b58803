"""Measured probe: width-tiled fused-RDB Pallas kernel vs XLA (r4 closure).

VERDICT r3 next-step #8 — the LAST untried Pallas lever from the r1/r2
constraint log: width-tiling to unlock strip>=22 (VMEM-blocked at full
image width) and larger per-tap matmul M. This probe times
``fused_rdb5c_tiled`` against the XLA flax block on the two shapes that
matter:

1. the production fold=2 trunk shape (B8 128x128, nf=128/gc=64 — the
   folded trunk's executed shape; XLA reference ~2.0 ms/RDB, r2), and
2. the batch-1 DIV2K eval shape (1x336x504 nf=64/gc=32 — the regime whose
   full-width VMEM overflow motivated width tiling in the first place).

Methodology: dependency-chained same-shape iterations fenced by a
device-scalar fetch (the relay's block_until_ready does not fence; see
PROGRESS_NOTES), with the XLA block timed in the SAME process as canary.

Run: ``python -m esr_tpu.ops.pallas.tiled_probe [--strips 22,54]``.
Measured verdict lives in docs/PERFORMANCE.md (Pallas ledger row).
"""

from __future__ import annotations

import argparse
import time

import numpy as np

__all__ = ["run_tiled_probe"]


def _time_chain(fn, x0, iters=10):
    import jax

    f = jax.jit(fn)
    x = f(x0)
    _ = np.asarray(jax.device_get(x.ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x)
    _ = np.asarray(jax.device_get(x.ravel()[0]))
    return (time.perf_counter() - t0) / iters


def run_tiled_probe(strips=(22, 54), dtype="bfloat16") -> list[dict]:
    import jax
    import jax.numpy as jnp

    from esr_tpu.models.blocks import ResidualDenseBlock5C
    from esr_tpu.ops.pallas.rdb_conv import (
        fused_rdb5c_tiled,
        rdb5c_params_from_flax,
    )

    dt = jnp.dtype(dtype)
    # wtile=38 (tile 32x48 = 1536 positions at strip=22) is the measured
    # helper AREA ceiling — wider tiles HTTP-500 the remote Mosaic compile
    cases = [
        ("r1_anchor", (4, 96, 96), 64, 32, 38),  # r1 measured: XLA 1.9 / pallas 11.8 ms @ strip=6
        ("trunk_fold2", (8, 128, 128), 128, 64, 38),
        ("div2k_b1", (1, 336, 504), 64, 32, 38),
    ]
    results = []
    for name, (n, h, w), nf, gc, wtile in cases:
        block = ResidualDenseBlock5C(nf=nf, gc=gc, dtype=dt)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((n, h, w, nf)), dt)
        variables = block.init(jax.random.PRNGKey(0), x)
        kp = rdb5c_params_from_flax(variables["params"])

        # canary: the XLA production block, same process/session
        t_xla = _time_chain(lambda y: block.apply(variables, y), x)
        row = {"case": name, "shape": (n, h, w, nf), "xla_ms": t_xla * 1e3}
        print(row, flush=True)
        for strip in strips:
            try:
                t = _time_chain(
                    lambda y, s=strip: fused_rdb5c_tiled(
                        y, kp, strip=s, wtile=wtile
                    ).astype(dt),
                    x,
                )
                row[f"pallas_s{strip}_ms"] = t * 1e3
            except Exception as e:  # compile-helper OOM / VMEM overflow
                row[f"pallas_s{strip}_ms"] = f"FAILED: {type(e).__name__}: {e}"[:200]
            print({k: row[k] for k in ("case", f"pallas_s{strip}_ms")}, flush=True)
        results.append(row)
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--strips", default="22,54")
    p.add_argument("--dtype", default="bfloat16")
    a = p.parse_args()
    run_tiled_probe(tuple(int(s) for s in a.strips.split(",")), a.dtype)
