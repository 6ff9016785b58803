"""Precision ladder: quantify bf16/f32 eval error of a trained checkpoint
against a CPU-f32 oracle (PROGRESS_NOTES r3 "precision ladder" rows, now a
reusable tool instead of an ad-hoc harness).

Because a process cannot switch JAX backends after init, the ladder runs as
two invocations writing forwards to ``.npz``, then a compare::

    # on the TPU (default backend):
    python -m esr_tpu.scripts.precision_ladder run --ckpt <G dir> --out chip.npz
    # CPU oracle (f32, HIGHEST precision):
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
        python -m esr_tpu.scripts.precision_ladder run --ckpt <G dir> \
        --variants f32_highest --out cpu.npz
    python -m esr_tpu.scripts.precision_ladder compare chip.npz cpu.npz

The probe input is a deterministic 1/f ("natural spectrum") image — white
noise overstates bf16 error vs natural images; see docs/PERFORMANCE.md
"precision ladder" rows for measured context (noise floor shrinks with
training convergence: 28.5 dB at 2.2k steps -> 37.0 dB at 10k).
"""

from __future__ import annotations

import argparse

import numpy as np


def one_over_f_image(h: int, w: int, seed: int = 0) -> np.ndarray:
    """Deterministic 1/f-spectrum RGB image in [0,1] (HWC f32)."""
    rng = np.random.default_rng(seed)
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    amp = 1.0 / np.maximum(np.hypot(fy, fx), 1.0 / max(h, w))
    chans = []
    for _ in range(3):
        phase = np.exp(2j * np.pi * rng.random((h, w)))
        img = np.real(np.fft.ifft2(amp * phase))
        img = (img - img.min()) / (img.max() - img.min() + 1e-12)
        chans.append(img)
    return np.stack(chans, axis=-1).astype(np.float32)


VARIANTS = ("bf16_unfolded", "bf16_folded", "f32", "f32_highest")


def _forward(params, nf: int, nb: int, gc: int, nz: int, size, variant: str):
    import jax
    import jax.numpy as jnp

    from esr_tpu.models.architecture import RRDBNet

    if variant not in VARIANTS:
        raise ValueError(f"unknown variant {variant!r}; choose from {VARIANTS}")
    h, w = size
    lr = jnp.asarray(one_over_f_image(h, w)[None])
    z = jnp.zeros((1, h, w, nz), jnp.float32) if nz else None

    dtype = jnp.bfloat16 if variant.startswith("bf16") else jnp.float32
    fold = 2 if variant == "bf16_folded" else 1
    batch = jnp.concatenate([lr, lr], 0) if fold == 2 else lr
    zb = (jnp.concatenate([z, z], 0) if fold == 2 else z) if nz else None

    model = RRDBNet(
        nf=nf, nb=nb, gc=gc, scale=4, num_latent_channels=nz, fold=fold, dtype=dtype
    )

    from contextlib import nullcontext

    ctx = (
        jax.default_matmul_precision("highest")
        if variant == "f32_highest"
        else nullcontext()
    )
    with ctx:
        out = jax.jit(lambda p, x, zz: model.apply({"params": p}, x, zz))(
            params, batch, zb
        )
    return np.asarray(out[0], np.float32)


def load_params(ckpt: str):
    import os

    import orbax.checkpoint as ocp

    restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt))
    return restored["params"] if "params" in restored else restored


def metrics(a: np.ndarray, b: np.ndarray) -> dict:
    """rms/max plus PSNR over the nominal [0,1] image span (fixed span keeps
    the convergence-curve rows comparable across checkpoints whose raw
    output ranges differ — PERFORMANCE.md precision-ladder rows)."""
    d = a.astype(np.float64) - b.astype(np.float64)
    rms = float(np.sqrt(np.mean(d**2)))
    psnr = float(20 * np.log10(1.0 / max(rms, 1e-12)))
    return {"rms": rms, "max": float(np.abs(d).max()), "psnr_db": psnr}


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run")
    r.add_argument("--ckpt", required=True, help="orbax G checkpoint dir")
    r.add_argument("--out", required=True, help="output .npz")
    r.add_argument("--nf", type=int, default=64)
    r.add_argument("--nb", type=int, default=23)
    r.add_argument("--gc", type=int, default=32)
    r.add_argument("--nz", type=int, default=1)
    r.add_argument("--size", default="64x48", help="LR HxW")
    r.add_argument(
        "--variants",
        default="bf16_unfolded,bf16_folded,f32,f32_highest",
        help="comma list: bf16_unfolded|bf16_folded|f32|f32_highest",
    )
    c = sub.add_parser("compare")
    c.add_argument("npz", nargs=2)
    args = parser.parse_args(argv)

    if args.cmd == "run":
        h, w = (int(x) for x in args.size.split("x"))
        params = load_params(args.ckpt)
        out = {}
        for v in args.variants.split(","):
            out[v] = _forward(params, args.nf, args.nb, args.gc, args.nz, (h, w), v)
            print(f"ran {v}: output range [{out[v].min():.3f}, {out[v].max():.3f}]")
        np.savez(args.out, **out)
        print(f"saved {list(out)} -> {args.out}")
    else:
        a, b = (np.load(p) for p in args.npz)
        names_a, names_b = list(a.files), list(b.files)
        for ka in names_a:
            for kb in names_b:
                if (ka, args.npz[0]) >= (kb, args.npz[1]) and args.npz[0] == args.npz[1]:
                    continue
                m = metrics(a[ka], b[kb])
                print(
                    f"{args.npz[0]}:{ka} vs {args.npz[1]}:{kb} — rms {m['rms']:.3e}"
                    f" max {m['max']:.3e} psnr {m['psnr_db']:.1f} dB"
                )


if __name__ == "__main__":
    main()
