"""Measure the x8 self-ensemble's quality benefit and compute cost
(VERDICT r4 weak #3: the feature shipped without a ledger row).

Quality: PSNR/SSIM with and without ``self_ensemble`` on the same eval set
through the REAL eval loop (`esr_tpu.test.evaluate_dataset` — CEM
projection, uint8-domain metrics, identical draw seeds). Synthetic eval is
fine: the claim is RELATIVE (ensemble minus plain on one checkpoint).

Cost: chained-dispatch timing of the two jitted forwards at a fixed LR
shape (the bench.py fencing pattern — ``block_until_ready`` does not
reliably fence on the relay), reported as MP/s and the x-factor.

Usage (r4 12k-step soak checkpoint)::

    python -m esr_tpu.scripts.ensemble_bench \
        --opt /root/soak/experiments/soak12k_r4/options.json \
        --ckpt /root/soak/experiments/soak12k_r4/models/12000_G \
        --n 4 --size 96

Emits one JSON line; paste the numbers into PROGRESS_NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--opt", required=True, help="experiment options.json")
    parser.add_argument("--ckpt", required=True, help="generator checkpoint dir")
    parser.add_argument("--n", type=int, default=4, help="eval images")
    parser.add_argument("--size", type=int, default=96, help="synthetic HR px")
    parser.add_argument("--dataroot", default=None, help="eval image dir (else synthetic)")
    parser.add_argument("--iters", type=int, default=6, help="timing iterations")
    parser.add_argument(
        "--time_lr", type=int, default=64, help="LR px for the cost timing"
    )
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import jax.numpy as jnp
    import numpy as np

    from esr_tpu import data as data_mod
    from esr_tpu.models import create_model
    from esr_tpu.options import parse
    from esr_tpu.test import evaluate_dataset

    with open(args.opt) as fh:
        base = json.load(fh)
    base["model"] = "sr"  # eval only needs G (+CEM)
    base["is_train"] = False
    base.setdefault("path", {})["pretrain_model_G"] = args.ckpt
    base["path"].pop("pretrain_model_D", None)
    base["path"].pop("resume_state", None)
    if args.dataroot:
        ds_opt = {"name": "eval", "mode": "LRHR", "dataroot_HR": args.dataroot}
    else:
        ds_opt = {
            "name": "synth_eval",
            "mode": "SYNTHETIC",
            "phase": "val",
            "n_images": args.n,
            "image_size": args.size,
        }
    base["datasets"] = {"test_1": ds_opt}

    results = {}
    model = None
    for label, ens in (("plain", False), ("ensemble", True)):
        opt = parse(dict(base), is_train=False)
        opt["self_ensemble"] = ens
        if model is None:
            model = create_model(opt)
        else:  # same params; rebuild only the forward
            model.opt["self_ensemble"] = ens
            model._forward = jax.jit(model._make_forward())
        ds_parsed = opt["datasets"]["test_1"]
        loader = data_mod.create_dataloader(
            data_mod.create_dataset(ds_parsed), ds_parsed
        )
        t0 = time.perf_counter()
        res = evaluate_dataset(model, loader, opt)
        results[label] = {
            "psnr": res["psnr"],
            "ssim": res["ssim"],
            "cem_residual": res.get("cem_residual"),
            "eval_wall_s": round(time.perf_counter() - t0, 2),
        }
        print(f"[{label}] {results[label]}", flush=True)

    # cost: chained forwards at a fixed shape (both paths share params)
    s = args.time_lr
    lr = jnp.asarray(np.random.default_rng(0).random((1, s, s, 3)), jnp.float32)
    z = jnp.zeros((1, s, s, model.nz), jnp.float32) if model.nz else None
    params = model.state.params
    timing = {}
    for label, ens in (("plain", False), ("ensemble", True)):
        model.opt["self_ensemble"] = ens
        fwd = jax.jit(model._make_forward())

        @jax.jit
        def chained(p, x, zz):
            out = fwd(p, x, zz)
            return x + jnp.mean(out) * 1e-9

        x = chained(params, lr, z)
        float(x[0, 0, 0, 0])  # compile fence
        t0 = time.perf_counter()
        for _ in range(args.iters):
            x = chained(params, x, z)
        float(x[0, 0, 0, 0])
        dt = (time.perf_counter() - t0) / args.iters
        timing[label] = {"sec": dt, "mp_per_s": (s * 4) ** 2 / 1e6 / dt}

    line = {
        "metric": "self_ensemble_ledger",
        "ckpt": args.ckpt,
        "psnr_delta_db": round(results["ensemble"]["psnr"] - results["plain"]["psnr"], 4),
        "ssim_delta": round(results["ensemble"]["ssim"] - results["plain"]["ssim"], 5),
        "cost_factor": round(timing["ensemble"]["sec"] / timing["plain"]["sec"], 2),
        "plain": {**results["plain"], "mp_per_s": round(timing["plain"]["mp_per_s"], 2)},
        "ensemble": {**results["ensemble"], "mp_per_s": round(timing["ensemble"]["mp_per_s"], 2)},
        "time_lr_px": s,
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
