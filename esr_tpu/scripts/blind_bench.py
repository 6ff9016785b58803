"""Quantified blind-SR benchmark: how well does the SHIPPED adversarial
kernel estimator recover a known kernel, and what does that buy the
CEM-wrapped eval? (SURVEY.md §2.10a "user/estimated kernel, e.g. from
KernelGAN"; VERDICT r3 missing #5.)

For each (kernel, LR size) case:

1. synthesize a scale-invariant 1/f test image (KernelGAN's signal is
   cross-scale patch recurrence — 1/f fields have it by construction; no
   natural-image assets exist in this environment),
2. make the LR by the TRUE-kernel downsampling operator (the same
   conv->stride operator family CEM assumes),
3. run ``estimate_kernel`` — the real adversarial path users get from
   ``--estimate_kernel`` (no supervised oracle),
4. report: peak-aligned kernel correlation vs truth; SR PSNR under CEM with
   the estimated / true / (wrongly-assumed) bicubic kernel, all with the
   SAME generator; and TRUE-operator consistency ``max|H_true(SR) - LR|``
   — the quantity blind estimation exists to fix (CEM is always exactly
   consistent under its *own* kernel, so self-residuals are ~1e-6
   regardless; only the true-operator residual exposes a wrong kernel).

Run: ``PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python -m
esr_tpu.scripts.blind_bench [--iters 2000] [--sizes 64,96] [--json out]``.
Measured results live in PROGRESS_NOTES.md (round 4) and pin the thresholds
of tests/test_e2e.py::test_blind_eval_flag and the slow recovery test.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def one_f_image(h: int, w: int, seed: int, channels: int = 3) -> np.ndarray:
    """Scale-invariant (1/f amplitude spectrum) random field in [0,1]."""
    rng = np.random.default_rng(seed)
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    amp = 1.0 / np.maximum(np.hypot(fy, fx), 1.0 / max(h, w))
    img = np.stack(
        [
            np.real(
                np.fft.ifft2(amp * np.exp(2j * np.pi * rng.random((h, w))))
            )
            for _ in range(channels)
        ],
        axis=-1,
    )
    img -= img.min()
    img /= img.max() + 1e-12
    return img.astype(np.float32)


def gaussian_kernel(sup: int = 13, sx: float = 2.4, sy: float = 1.4, theta: float = 0.5):
    """Anisotropic rotated gaussian — a typical real-world SR kernel."""
    idx = np.arange(sup) - (sup - 1) / 2.0
    yy, xx = np.meshgrid(idx, idx, indexing="ij")
    c, s = np.cos(theta), np.sin(theta)
    u, v = c * xx + s * yy, -s * xx + c * yy
    k = np.exp(-0.5 * ((u / sx) ** 2 + (v / sy) ** 2))
    return k / k.sum()


def aligned_corr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak normalized cross-correlation over all shifts (the estimate may
    sit a pixel or two off-center — the subsample phase is a gauge
    freedom). Handles different supports."""
    from numpy.fft import fft2, ifft2

    n = a.shape[0] + b.shape[0]
    fa = fft2(a - a.mean(), (n, n))
    fb = fft2(b - b.mean(), (n, n))
    xc = np.real(ifft2(fa * np.conj(fb)))
    denom = np.linalg.norm(a - a.mean()) * np.linalg.norm(b - b.mean())
    return float(xc.max() / (denom + 1e-12))


def run_case(kernel_name: str, k_true, lr_size: int, iters: int, seed: int = 0) -> dict:
    import jax
    import jax.numpy as jnp

    from esr_tpu.cem import CEMConf, make_cem
    from esr_tpu.cem.kernelgan import conf_for_image, estimate_kernel
    from esr_tpu.models.architecture import RRDBNet
    from esr_tpu.ops.metrics import psnr_jax

    scale = 4
    hr = one_f_image(lr_size * scale, lr_size * scale, seed)
    cem_true = make_cem(CEMConf(scale=scale, kernel=k_true))
    lr = np.asarray(cem_true.downsample(jnp.asarray(hr)[None]))[0]
    lr = np.clip(lr, 0.0, 1.0).astype(np.float32)

    conf = conf_for_image(lr.shape, scale, iters, seed=seed)
    k_est, metrics = estimate_kernel(lr, conf)
    corr = aligned_corr(k_est, np.asarray(k_true, np.float64))

    # one generator, three CEM kernels: PSNR differences isolate the kernel
    model = RRDBNet(nf=16, nb=2, gc=8, scale=scale)
    params = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, lr_size, lr_size, 3))
    )["params"]
    raw = model.apply({"params": params}, jnp.asarray(lr)[None])
    out = {"kernel": kernel_name, "lr_size": lr_size, "iters": conf.iters, "corr": corr}
    hr_j = jnp.asarray(hr)[None]
    lr_j = jnp.asarray(lr)[None]
    for label, k in (("est", k_est), ("true", k_true), ("bicubic", None)):
        cem = cem_true if label == "true" else make_cem(CEMConf(scale=scale, kernel=k))
        sr = cem.project(raw, lr_j)
        out[f"psnr_{label}"] = float(psnr_jax(jnp.clip(sr, 0, 1), hr_j, quantize=False))
        # self-consistency (CEM guarantee — should be ~1e-6 for every label)
        out[f"self_res_{label}"] = float(jnp.abs(cem.downsample(sr) - lr_j).max())
        # TRUE-operator consistency — what a wrong kernel breaks
        out[f"true_res_{label}"] = float(jnp.abs(cem_true.downsample(sr) - lr_j).max())
    return out


def main(argv=None) -> list[dict]:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--sizes", default="64,96")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json", default=None, help="write results to this path")
    args = p.parse_args(argv)

    from esr_tpu.cem.kernels import downsample_kernel_2d

    kernels = {
        "aniso_gauss": gaussian_kernel(),
        "bicubic_matlab": downsample_kernel_2d(4)[0],
    }
    rows = []
    for name, k in kernels.items():
        for size in (int(s) for s in args.sizes.split(",")):
            r = run_case(name, k, size, args.iters, args.seed)
            rows.append(r)
            print(
                f"{name:>15} lr={size:>4} corr={r['corr']:.3f} "
                f"PSNR est/true/bicubic = {r['psnr_est']:.2f}/"
                f"{r['psnr_true']:.2f}/{r['psnr_bicubic']:.2f} dB  "
                f"true-residual est/bicubic = {r['true_res_est']:.2e}/"
                f"{r['true_res_bicubic']:.2e}",
                flush=True,
            )
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
    return rows


if __name__ == "__main__":
    main()
