"""Measure the interactive-editing loop's latency on the target hardware
(SURVEY.md §7 hard-part 6: "making the Z-optimization inner loop fast on TPU
(recompilation vs region sizes -> pad-to-bucket shapes)" — the design landed
in r1 (one-``lax.scan``-program search + bucketed crops) but shipped without
an interactivity number; this script is its ledger row).

What a GUI user feels per tool click (reference ``codes/GUI_SR.py`` button ->
``Z_optimization.py`` loop, which host-dispatches every Adam step):

- ``first_s``   — FIRST click at a new crop bucket: jit compile + search.
  At most ``len(buckets)`` of these per session (the pad-to-bucket design's
  whole point); every later click at that bucket is a cached dispatch.
- ``click_s``   — repeat click, same bucket: ONE device program (the whole
  n-step Adam search is a single ``lax.scan``) + small Z/losses fetch.
- ``steps_per_s`` — Z-search Adam steps/s inside that program (n_steps /
  click_s); the reference's host-dispatched loop pays >= one dispatch
  round-trip PER STEP (~8-20 ms on this relay), so its ceiling here is
  ~50-120 steps/s regardless of compute.
- ``render_s``  — full-image SR re-render + D2H fetch (the preview refresh).
- ``adaptive_s`` — a default adaptive imprint (plateau-escalating rounds,
  the converged-region recipe): worst-case tool latency.

Weights don't change the timings (same program); pass --opt/--ckpt to run
against a trained checkpoint anyway, else flagship-shaped Kaiming init.

Usage::

    python -m esr_tpu.scripts.explore_bench [--lr_size 64] [--regions 10 24 64]

Emits one JSON line; paste into PROGRESS_NOTES.md / docs/PERFORMANCE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--lr_size", type=int, default=64, help="LR image px")
    parser.add_argument(
        "--regions", type=int, nargs="+", default=[10, 24, 64],
        help="LR-space region sizes to click (each maps to a crop bucket)",
    )
    parser.add_argument("--n_steps", type=int, default=64, help="steps per search")
    parser.add_argument("--iters", type=int, default=4, help="repeat clicks to time")
    parser.add_argument("--nb", type=int, default=int(os.environ.get("BENCH_NB", 23)))
    parser.add_argument("--opt", default=None, help="optional experiment options.json")
    parser.add_argument("--ckpt", default=None, help="optional generator checkpoint dir")
    parser.add_argument(
        "--alternatives", type=int, default=0,
        help="also time a k-candidate alternatives run (0 = skip)",
    )
    parser.add_argument("--adaptive", action="store_true", default=True)
    parser.add_argument("--no-adaptive", dest="adaptive", action="store_false")
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import jax.numpy as jnp
    import numpy as np

    from esr_tpu.explore.session import ExplorationSession

    scale, nz = 4, 1
    if args.opt:
        from esr_tpu.models import create_model
        from esr_tpu.options import parse

        with open(args.opt) as fh:
            base = json.load(fh)
        base["model"] = "sr"
        base["is_train"] = False
        path = base.setdefault("path", {})
        if args.ckpt:
            path["pretrain_model_G"] = args.ckpt
        path.pop("pretrain_model_D", None)
        path.pop("resume_state", None)
        opt = parse(base, is_train=False)
        model = create_model(opt)
        scale = int(opt.get("scale") or 4)
        nz = model.nz or 1
        params = (getattr(model, "g_state", None) or model.state).params

        def forward(p, lr, z):
            raw = model.g_module.apply({"params": p}, lr, z)
            if model.cem is not None:
                raw = model.cem.project(raw, lr)
            return raw

    else:  # flagship-shaped standalone (bench.py's construction)
        from esr_tpu.cem import CEMConf, make_cem
        from esr_tpu.models.architecture import RRDBNet

        model_m = RRDBNet(
            nf=64, nb=args.nb, gc=32, scale=4, num_latent_channels=1,
            dtype=jnp.bfloat16,
        )
        cem = make_cem(CEMConf(scale=4))
        params = RRDBNet(nf=64, nb=args.nb, gc=32, scale=4, num_latent_channels=1).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1, 8, 8, 1))
        )["params"]

        def forward(p, lr, z):
            return cem.project(model_m.apply({"params": p}, lr, z), lr)

    rng = np.random.default_rng(0)
    lr_img = rng.random((args.lr_size, args.lr_size, 3)).astype(np.float32)
    sess = ExplorationSession(
        forward, params, lr_img, num_latent_channels=nz, scale=scale,
        n_steps=args.n_steps,
    )

    # preview-refresh latency: full-image forward + HR D2H (the relay's
    # D2H runs ~25 MB/s — part of the honest number)
    t0 = time.perf_counter()
    sess.current_sr()
    render_first = time.perf_counter() - t0
    renders = []
    for _ in range(max(2, args.iters // 2)):
        sess._sr_cache = None
        t0 = time.perf_counter()
        sess.current_sr()
        renders.append(time.perf_counter() - t0)
    render_s = float(np.median(renders))

    clicks = []
    for r in args.regions:
        r = min(r, args.lr_size)
        y1 = x1 = min(r * scale, args.lr_size * scale)
        sess.select_rect(0, 0, y1, x1)
        t0 = time.perf_counter()
        sess.increase_variance()
        first_s = time.perf_counter() - t0
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            sess.increase_variance()
            times.append(time.perf_counter() - t0)
        click_s = float(np.median(times))
        clicks.append(
            {
                "region_lr": r,
                "first_s": round(first_s, 3),
                "click_s": round(click_s, 4),
                "steps_per_s": round(args.n_steps / click_s, 1),
            }
        )
        print(f"[region {r}] {clicks[-1]}", flush=True)

    adaptive = None
    if args.adaptive:
        r = args.regions[0]
        y1 = min(r * scale, args.lr_size * scale)
        sess.select_rect(0, 0, y1, y1)
        # imprint targets are full-size HR images (content outside the mask
        # is ignored; the optimizer crops them to the bucket window)
        target = np.zeros((args.lr_size * scale, args.lr_size * scale, 3), np.float32)
        target[::8] = 1.0
        t0 = time.perf_counter()
        sess.imprint(target)  # adaptive by default: rounds + escalation
        adaptive_first = time.perf_counter() - t0
        sess.undo()
        t0 = time.perf_counter()
        sess.imprint(target)
        adaptive_s = time.perf_counter() - t0
        adaptive = {
            "first_s": round(adaptive_first, 3),
            "repeat_s": round(adaptive_s, 3),
            "rounds": len(sess.last_rounds or []),
        }
        print(f"[adaptive imprint] {adaptive}", flush=True)

    alternatives = None
    if args.alternatives:
        r = args.regions[0]
        y1 = min(r * scale, args.lr_size * scale)
        sess.select_rect(0, 0, y1, y1)
        t0 = time.perf_counter()
        sess.propose_alternatives(k=args.alternatives, seed=0)
        alt_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        sess.propose_alternatives(k=args.alternatives, seed=1)
        alt_repeat = time.perf_counter() - t0
        alternatives = {
            "k": args.alternatives,
            "first_s": round(alt_first, 3),
            "repeat_s": round(alt_repeat, 3),
        }
        print(f"[alternatives k={args.alternatives}] {alternatives}", flush=True)

    line = {
        "metric": "explore_click_latency",
        "unit": "s/tool-click",
        "value": clicks[0]["click_s"] if clicks else None,
        "n_steps": args.n_steps,
        "lr_size": args.lr_size,
        "nb": args.nb,
        "clicks": clicks,
        "render_s": {"first": round(render_first, 3), "repeat": round(render_s, 4)},
        "adaptive_imprint": adaptive,
        "alternatives": alternatives,
        "platform": jax.devices()[0].platform,
        "checkpoint": bool(args.ckpt),
    }
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
