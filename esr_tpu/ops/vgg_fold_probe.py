"""Measured probe: does batch->channel folding (blocks.py fold=2) speed up
the VGG19 perceptual extractor inside the GAN step?

Context (PROGRESS_NOTES r3): the GAN step at 19.0 steps/s is trunk-bound
(66%); the remaining ~17.5 ms is ~60 small fusions (D, VGG, CEM, losses,
Adam) with "no single lever". The one untried lever on that tail is folding
the narrow stages of the VGG/D side stacks the way the trunk is folded:
VGG's conv1_1..conv2_2 run 64/128-wide at the largest spatial sizes — the
v5e conv-shape law's lane-starved regime (64-wide ~51 TF/s vs 128-wide
~144). fold=2 on a 64-wide conv executes 128-wide at 2x (structurally zero)
FLOPs: potential ~1.4x on those layers, exact by construction (fold only
reorders the batch dim into channels).

This probe times the REAL ``VGG19FeatureExtractor`` forward and its
input-gradient (the two things the GAN step does with it: feat(SR)/feat(HR)
forwards + d(feat_loss)/d(SR)) against a functionally-equal variant whose
stage-1/2 convs run folded (block-diagonal kernels from the same params,
unfold before stage 3 where widths reach 256+ and folding can only lose).
Equality is asserted before timing.

Run: PYTHONPATH=/root/repo python -m esr_tpu.ops.vgg_fold_probe
Result: recorded in PROGRESS_NOTES.md / docs/PERFORMANCE.md.
"""

from __future__ import annotations

import time

import numpy as np


def _build(batch: int, size: int):
    import jax
    import jax.numpy as jnp

    from esr_tpu.models.architecture import IMAGENET_MEAN, IMAGENET_STD, VGG19FeatureExtractor
    from esr_tpu.models.blocks import fold_batch, fold_kernel, unfold_batch

    dtype = jnp.bfloat16
    module = VGG19FeatureExtractor(feature_layer=34, dtype=dtype)
    x0 = jnp.asarray(np.random.default_rng(0).random((batch, size, size, 3)), jnp.float32)
    params = module.init(jax.random.PRNGKey(0), x0[:1])["params"]

    def unfolded(p, x):
        return module.apply({"params": p}, x)

    names = [
        f"conv{s + 1}_{l + 1}" for s, n in enumerate((2, 2, 4, 4, 4)) for l in range(n)
    ]
    per_stage = (2, 2, 4, 4, 4)

    def folded(p, x, f: int = 2):
        """Same math: stages 1-2 folded (widths 64/128 -> 128/256), unfold
        before stage 3. relu/maxpool are fold-transparent; the ImageNet
        normalization happens pre-fold."""
        x = (x - IMAGENET_MEAN.astype(x.dtype)) / IMAGENET_STD.astype(x.dtype)
        x = x.astype(dtype)
        x = fold_batch(x, f)
        i = 0
        for stage, n_layers in enumerate(per_stage):
            fold_this = stage < 2
            if stage == 2:
                x = unfold_batch(x, f)
            for _ in range(n_layers):
                k = p[names[i]]["kernel"].astype(dtype)
                b = p[names[i]]["bias"].astype(dtype)
                if fold_this:
                    k = fold_kernel(k, f)
                    b = jnp.tile(b, f)
                x = jax.lax.conv_general_dilated(
                    x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
                ) + b
                i += 1
                if i == 16:  # conv5_4 pre-activation
                    return x.astype(jnp.float32)
                x = jax.nn.relu(x)
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        return x.astype(jnp.float32)

    return params, x0, unfolded, folded


def _time_chained(fn, params, x0, iters: int = 20) -> float:
    """Seconds per call via a dependency chain fenced by a scalar fetch
    (block_until_ready does not reliably fence on the relay — CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(p, x):
        y = fn(p, x)
        return x + jnp.mean(y).astype(x.dtype) * 1e-9

    x = chained(params, x0)
    float(jnp.mean(x[0, 0, 0]))  # compile + settle
    x = chained(params, x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = chained(params, x)
    float(jnp.mean(x[0, 0, 0]))
    return (time.perf_counter() - t0) / iters


def main(batch: int = 16, size: int = 128) -> dict:
    import jax
    import jax.numpy as jnp

    params, x0, unfolded, folded = _build(batch, size)

    # exactness first: folded == unfolded (bf16 bit-level reordering only)
    yu = unfolded(params, x0)
    yf = folded(params, x0)
    err = float(jnp.max(jnp.abs(yu - yf)))
    scale = float(jnp.max(jnp.abs(yu)))
    print(f"fold exactness: max|diff| {err:.3e} on output scale {scale:.1f}")
    assert err <= 0.02 * scale, "folded VGG diverged beyond bf16 reordering noise"

    out = {}
    for name, fn in (("unfolded", unfolded), ("folded", folded)):
        t_fwd = _time_chained(fn, params, x0)

        def fwd_and_grad(p, x, _fn=fn):
            def loss(xx):
                return jnp.mean(jnp.abs(_fn(p, xx)))

            v, g = jax.value_and_grad(loss)(x)
            return g + v.astype(g.dtype)

        t_bwd = _time_chained(fwd_and_grad, params, x0)
        out[name] = (t_fwd, t_bwd)
        print(f"{name}: fwd {t_fwd * 1e3:.2f} ms, fwd+input-grad {t_bwd * 1e3:.2f} ms")

    s_f = out["unfolded"][0] / out["folded"][0]
    s_b = out["unfolded"][1] / out["folded"][1]
    print(f"fold speedup: fwd {s_f:.3f}x, fwd+grad {s_b:.3f}x")
    return {"fwd_speedup": s_f, "fwdgrad_speedup": s_b, "exactness_err": err}


if __name__ == "__main__":
    main()
