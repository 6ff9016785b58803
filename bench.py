"""Benchmark harness — emits ONE JSON line for the driver.

Driver metric (BASELINE.json): "4x SR megapixels/sec/chip (RRDB+CEM); DIV2K
GAN train steps/sec; Set5 PSNR delta". Primary value: output (HR) megapixels
per second per chip for the full flagship RRDB(+CEM, +Z) 4x forward in
bfloat16. Extras carry the GAN train-step rate (on by default — the warm compile
cache keeps it fast; BENCH_TRAIN=0 skips it) and the CEM consistency
residual.

vs_baseline: the reference publishes no throughput (BASELINE.md); the anchor
is an arithmetic V100-fp32 estimate for the same network: ~2.16 TFLOP per HR
megapixel (16.7M-param RRDB trunk at LR resolution + upsample stages) against
~6 TFLOP/s sustained conv throughput => ~2.7 HR-MP/s. The ">=5x V100" target
therefore means >= ~13.5 MP/s/chip here.

Shape sensitivity (round 1): B16/128px runs ~2x faster per pixel than
B4/192px (15.0 vs 7.7 MP/s) — throughput is occupancy-bound at small
batches; within a config, repeated runs agree to <0.5% across sessions.

Stall-proofing (round 5, after BENCH_r04 `rc=124/parsed=null`): running
`python bench.py` starts a jax-free SUPERVISOR that (1) probes relay
liveness in a deadline-bounded subprocess (diagnostic only — a slow/failed
probe annotates the line but never vetoes the bench: in compile-degraded
relay windows a fresh process pays minutes of remote-compile latency for a
trivial canary while the cached production bench still runs), (2) runs the
benches in a child that streams per-stage results to a progress file,
(3) kills the child at $BENCH_DEADLINE (default 540 s) and emits whatever
was measured. Every path prints exactly one parseable JSON line; a wedged
relay yields `value: null` + `"status": "relay-stalled..."` + the last
driver-validated numbers as clearly-stale context, never silence. Test
hooks: BENCH_PREFLIGHT_CMD, BENCH_TEST_HANG_STAGE
(tests/test_bench_supervisor.py). BENCH_DIRECT=1 bypasses the supervisor
for interactive debugging.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

V100_BASELINE_MPS = 2.7  # estimated reference V100 fp32 throughput (see above)

METRIC_NAME = "rrdb_cem_4x_sr_throughput"
METRIC_UNIT = "HR_megapixels/sec/chip"

# r3 driver-validated numbers (BENCH_r03.json) — the stale-by-reference
# fallback if the BENCH_r*.json artifacts are not readable at runtime.
LAST_VALIDATED_FALLBACK = {
    "source": "hardcoded (BENCH_r03, 2026-08-19)",
    "value": 26.171,
    "unit": METRIC_UNIT,
    "extra": {
        "train_steps_per_s": 19.000104695634256,
        "single_image_mp_per_s": 17.062368904277033,
        "cem_consistency_max_err": 2.652406692504883e-06,
    },
}


def _repo_dir() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def _last_full_path() -> str:
    return os.path.join(_repo_dir(), ".jax_cache", "bench_last_full.json")


def _load_last_full() -> dict | None:
    """Freshest COMPLETE bench from this machine (written by child_main),
    annotated with its age — stall/partial context only, never `value`."""
    try:
        with open(_last_full_path()) as fh:
            rec = json.load(fh)
        return {
            "age_s": round(time.time() - float(rec["unix_time"])),
            **rec["result"],
        }
    except (OSError, ValueError, KeyError, TypeError):
        return None


def load_last_validated() -> dict:
    """Most recent driver-recorded bench with a non-null parsed value.

    Used ONLY to annotate a stall/partial emission (status field context) —
    never reported as this round's `value` (VERDICT r4 next #1a)."""
    best = None
    try:
        names = sorted(n for n in os.listdir(_repo_dir()) if n.startswith("BENCH_r") and n.endswith(".json"))
    except OSError:
        names = []
    for name in names:
        try:
            with open(os.path.join(_repo_dir(), name)) as fh:
                rec = json.load(fh)
        except (OSError, ValueError):
            continue
        parsed = rec.get("parsed")
        if isinstance(parsed, dict) and parsed.get("value") is not None:
            best = {
                "source": name,
                "value": parsed["value"],
                "unit": parsed.get("unit"),
                "extra": parsed.get("extra", {}),
            }
    return best or dict(LAST_VALIDATED_FALLBACK)


def bench_inference(batch: int = 16, lr_size: int = 128, iters: int = 12) -> dict:
    import jax
    import jax.numpy as jnp

    from esr_tpu.cem import CEMConf, make_cem
    from esr_tpu.models.architecture import RRDBNet

    fold = int(os.environ.get("BENCH_FOLD", 2))  # batch->channel MXU-lane fold
    nb = int(os.environ.get("BENCH_NB", 23))  # trunk depth (tests shrink it)
    model = RRDBNet(
        nf=64, nb=nb, gc=32, scale=4, num_latent_channels=1, fold=fold,
        dtype=jnp.bfloat16,
    )
    cem = make_cem(CEMConf(scale=4))
    rng = np.random.default_rng(0)
    lr0 = jnp.asarray(rng.random((batch, lr_size, lr_size, 3)), jnp.float32)
    z = jnp.zeros((batch, lr_size, lr_size, 1), jnp.float32)
    # real Kaiming init at a tiny shape (conv params are shape-independent;
    # scan trunk keeps this compile small) so numerics are realistic
    params = RRDBNet(nf=64, nb=nb, gc=32, scale=4, num_latent_channels=1).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1, 8, 8, 1))
    )["params"]

    @jax.jit
    def chained(params, lr_img, z):
        # iteration i+1 consumes a scalar from iteration i: the device relay's
        # block_until_ready does not reliably fence, so throughput is measured
        # over a dependency chain ending in a host fetch (docs/DESIGN.md)
        out = cem.project(model.apply({"params": params}, lr_img, z), lr_img)
        return lr_img + jnp.mean(out) * 1e-9

    lr_img = chained(params, lr0, z)
    float(lr_img[0, 0, 0, 0])  # compile + warmup, forced

    t0 = time.perf_counter()
    for _ in range(iters):
        lr_img = chained(params, lr_img, z)
    float(lr_img[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / iters

    # consistency check on a small shape (cheap second compile)
    @jax.jit
    def fwd_small(params, lr_img, z):
        return cem.project(model.apply({"params": params}, lr_img, z), lr_img)

    lr_s = lr0[:1, :64, :64]
    out_s = fwd_small(params, lr_s, z[:1, :64, :64])
    hr_mp = batch * (lr_size * 4) ** 2 / 1e6
    residual = float(jnp.abs(cem.downsample(out_s.astype(jnp.float32)) - lr_s).max())
    return {"mp_per_s": hr_mp / dt, "sec_per_batch": dt, "cem_residual": residual}


def bench_single_image(h: int = 336, w: int = 504, iters: int = 6) -> dict:
    """Single-image (batch-1) eval regime at DIV2K-val LR scale — the
    reference test loop's shape. Uses the production spatial-fold path
    (each image split into `fold` halo-overlapped H-strips so the MXU fold
    stays active; docs/PERFORMANCE.md 'Spatial-fold eval')."""
    import jax
    import jax.numpy as jnp

    from esr_tpu.cem import CEMConf, make_cem
    from esr_tpu.models.architecture import RRDBNet
    from esr_tpu.parallel import spatial_fold_apply

    fold = int(os.environ.get("BENCH_FOLD", 2))
    # spatial strip count is independent of the model's channel-fold: more
    # strips = more batch elements for the channel-fold/MXU to chew at
    # batch-1, at the price of halo recompute (A/B knob; default == fold)
    sfold = int(os.environ.get("BENCH_SPATIAL_FOLD", fold))
    nb = int(os.environ.get("BENCH_NB", 23))
    model = RRDBNet(nf=64, nb=nb, gc=32, scale=4, num_latent_channels=1,
                    fold=fold, dtype=jnp.bfloat16)
    cem = make_cem(CEMConf(scale=4))
    params = RRDBNet(nf=64, nb=nb, gc=32, scale=4, num_latent_channels=1).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1, 8, 8, 1))
    )["params"]
    lr0 = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3)), jnp.float32)
    z = jnp.zeros((1, h, w, 1), jnp.float32)
    apply_raw = lambda p, x, zz: model.apply({"params": p}, x, zz)  # noqa: E731
    wrapped = (
        spatial_fold_apply(apply_raw, sfold, halo=32, scale=4) if sfold > 1 else apply_raw
    )

    @jax.jit
    def chained(params, lr_img, zz):
        out = cem.project(wrapped(params, lr_img, zz), lr_img)
        return lr_img + jnp.mean(out) * 1e-9

    lr_img = chained(params, lr0, z)
    float(lr_img[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        lr_img = chained(params, lr_img, z)
    float(lr_img[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    return {"single_image_mp_per_s": h * w * 16 / 1e6 / dt}


def bench_gan_train(batch: int = 16, hr_size: int = 128, iters: int = 30) -> dict:
    import jax
    import jax.numpy as jnp

    from esr_tpu.cem import CEMConf, make_cem
    from esr_tpu.data.pipeline import make_train_pipeline
    from esr_tpu.models.architecture import (
        DiscriminatorVGG128,
        RRDBNet,
        VGG19FeatureExtractor,
    )
    from esr_tpu.models.base_model import TrainState, make_adam, multistep_schedule
    from esr_tpu.models.srragan_model import make_gan_train_step

    scale, nz = 4, 1
    fold = int(os.environ.get("BENCH_FOLD", 2))
    nb = int(os.environ.get("BENCH_NB", 23))
    g_module = RRDBNet(nf=64, nb=nb, gc=32, scale=scale, num_latent_channels=nz,
                       fold=fold, dtype=jnp.bfloat16)
    d_module = DiscriminatorVGG128(nf=64, dtype=jnp.bfloat16)
    f_module = VGG19FeatureExtractor(dtype=jnp.bfloat16)
    cem = make_cem(CEMConf(scale=scale))
    rng = jax.random.PRNGKey(0)
    lr_size = hr_size // scale
    g_vars = g_module.init(rng, jnp.zeros((1, lr_size, lr_size, 3)), jnp.zeros((1, lr_size, lr_size, nz)))
    d_vars = d_module.init(rng, jnp.zeros((1, hr_size, hr_size, 3)), train=False)
    f_vars = f_module.init(rng, jnp.zeros((1, hr_size, hr_size, 3)))
    sched = multistep_schedule(1e-4, [50000])
    g_state = TrainState.create(apply_fn=g_module.apply, params=g_vars["params"], tx=make_adam(sched))
    d_state = TrainState.create(
        apply_fn=d_module.apply, params=d_vars["params"], tx=make_adam(sched),
        batch_stats=d_vars.get("batch_stats"),
    )
    pipeline = make_train_pipeline(scale=scale, num_latent_channels=nz)
    cfg = {
        "pixel_weight": 0.01, "feature_weight": 1.0, "gan_weight": 0.005,
        "range_weight": 1.0, "map_weight": 1.0, "gan_type": "vanilla",
        "D_update_ratio": 1, "D_init_iters": 0,
    }
    step = jax.jit(
        make_gan_train_step(g_module, d_module, f_module, f_vars, cem, pipeline, cfg),
        donate_argnums=(0, 1),
    )
    hr = jnp.asarray(np.random.default_rng(1).random((batch, hr_size, hr_size, 3)), jnp.float32)
    g_state, d_state, metrics = step(g_state, d_state, hr, rng, jnp.int32(1))
    _ = float(metrics["l_g"])  # warmup + compile fence (host fetch)
    # Steps are dependency-chained through the donated states; fence the
    # timed region with a HOST FETCH of a final-step metric scalar —
    # block_until_ready does not reliably fence on the relay (CLAUDE.md),
    # and 5-iter runs under-measured by ~12% vs the real CLI loop (r3 A/B:
    # bench 16.2 vs CLI-at-print_freq-20 18.4 steps/s, same session).
    t0 = time.perf_counter()
    for i in range(iters):
        g_state, d_state, metrics = step(g_state, d_state, hr, rng, jnp.int32(i + 2))
    _ = float(metrics["l_g"])
    dt = (time.perf_counter() - t0) / iters
    return {"train_steps_per_s": 1.0 / dt, "sec_per_step": dt}


def read_parity_report() -> dict:
    """Driver metric #3 (Set5 PSNR delta vs the reference's released
    checkpoint). The assets (.pth models, Set5) are unobtainable offline;
    esr_tpu/scripts/parity_eval.py turns them into this report in one
    command the moment they appear, and this picks it up."""
    path = os.environ.get(
        "PARITY_REPORT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "parity_set5.json"),
    )
    if os.path.exists(path):
        with open(path) as fh:
            rep = json.load(fh)
        return {
            "set5_psnr_delta": rep.get("set5_psnr_delta"),
            "set5_psnr": rep.get("psnr"),
            "set5_psnr_delta_status": f"measured by parity_eval ({rep.get('n_images')} images, "
            f"anchor {rep.get('anchor_psnr')} dB)",
        }
    return {
        "set5_psnr_delta": None,
        "set5_psnr_delta_status": "awaiting-assets (parity_eval ready: python -m "
        "esr_tpu.scripts.parity_eval --pth <reference_G.pth> --images <Set5/HR>)",
    }


def _assemble_line(mp_per_s: float | None, extra: dict) -> str:
    """The driver-contract line. `value` carries ONLY a number measured in
    THIS run — never a stale one (VERDICT r4 next #1a)."""
    return json.dumps(
        {
            "metric": METRIC_NAME,
            "value": round(mp_per_s, 3) if mp_per_s is not None else None,
            "unit": METRIC_UNIT,
            "vs_baseline": round(mp_per_s / V100_BASELINE_MPS, 2) if mp_per_s is not None else None,
            "extra": extra,
        }
    )


# -- child: runs the actual benches, streams per-stage progress ------------


def child_main() -> None:
    """Executes the benches (device work happens ONLY here). After every
    stage it appends a JSON record to $BENCH_PROGRESS_FILE and fsyncs, so
    the supervisor can assemble a partial result if the relay wedges
    mid-stage (the r3-soak / r4-bench failure mode: the process sleeps
    forever inside an RPC; no exception, no signal delivery — only an
    external process can recover)."""
    import jax

    cache = os.path.join(_repo_dir(), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)

    progress_path = os.environ.get("BENCH_PROGRESS_FILE")
    hang_stage = os.environ.get("BENCH_TEST_HANG_STAGE")  # test hook

    def note(event: str, stage: str, data: dict | None = None) -> None:
        if not progress_path:
            return
        with open(progress_path, "a") as fh:
            fh.write(json.dumps({"event": event, "stage": stage, "data": data}) + "\n")
            fh.flush()
            os.fsync(fh.fileno())

    def stage(name):
        note("start", name)
        if hang_stage == name:
            time.sleep(10 ** 6)  # simulate a wedged relay RPC

    stage("inference")
    result = bench_inference(
        batch=int(os.environ.get("BENCH_BATCH", 16)),
        lr_size=int(os.environ.get("BENCH_LR_SIZE", 128)),
        iters=int(os.environ.get("BENCH_ITERS", 12)),
    )
    note("done", "inference", result)
    extra = {
        "config": {
            "batch": int(os.environ.get("BENCH_BATCH", 16)),
            "lr_size": int(os.environ.get("BENCH_LR_SIZE", 128)),
            "fold": int(os.environ.get("BENCH_FOLD", 2)),
        },
        "cem_consistency_max_err": result["cem_residual"],
        **read_parity_report(),
    }
    # DRIVER METRIC #2 (GAN train steps/s) runs BEFORE the single-image
    # extra: in a degraded relay window the child deadline cuts off the TAIL
    # stages, and losing an extra beats losing a driver metric (r5: a warm
    # supervised run lost train_steps_per_s to the 383 s child budget while
    # keeping single_image).
    if os.environ.get("BENCH_TRAIN", "1") != "0":
        # full ESRGAN/explorable GAN step (DIV2K regime: batch 16, 128px
        # crops, pixel+VGG+RaGAN+range+map losses, CEM, D BN updates);
        # donated states dependency-chain the timing loop. Never let a train
        # bench failure swallow the primary metric line.
        try:
            stage("gan_train")
            extra.update(train := bench_gan_train())
            note("done", "gan_train", train)
        except Exception as e:  # noqa: BLE001
            extra["train_bench_error"] = f"{type(e).__name__}: {str(e)[:120]}"
    if os.environ.get("BENCH_SINGLE", "1") != "0":
        # batch-1 DIV2K-scale eval via the spatial-fold path; never let a
        # secondary bench failure swallow the primary metric line
        try:
            stage("single_image")
            extra.update(single := bench_single_image())
            note("done", "single_image", single)
        except Exception as e:  # noqa: BLE001
            extra["single_image_bench_error"] = f"{type(e).__name__}: {str(e)[:120]}"
    extra["status"] = "ok"
    line = _assemble_line(result["mp_per_s"], extra)
    # persist the full result: a later stalled/partial run cites it as the
    # freshest on-chip measurement from this machine (relay health
    # oscillates ~10x within a day — measured r5). ONLY production-shaped
    # runs on real hardware qualify: the supervisor's own CPU test suite
    # runs child_main at toy shapes and must not poison the record (r5 bug:
    # a stalled driver line cited a 0.147 MP/s CPU toy run as last-full).
    production_shape = (
        extra["config"] == {"batch": 16, "lr_size": 128, "fold": 2}
        and int(os.environ.get("BENCH_NB", 23)) == 23
        and jax.devices()[0].platform != "cpu"
    )
    if production_shape:
        try:
            with open(_last_full_path(), "w") as fh:
                json.dump({"unix_time": time.time(), "result": json.loads(line)}, fh)
        except OSError:
            pass
    print(line, flush=True)


# -- supervisor: deadline-enforced, jax-free, always emits one line --------

PREFLIGHT_CODE = """
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", {cache!r})
f = jax.jit(lambda a: (a @ a).sum())
x = jnp.ones((128, 128), jnp.bfloat16)
r = float(f(x))          # host fetch fences compile + execute through the relay
r2 = float(f(x * 0 + 2))  # second dispatch: past compile, pure execute latency
# liveness check, not a numerics check (bf16 reduce order differs across
# backends): both fetches returned and are sane
import math
assert math.isfinite(r) and math.isfinite(r2) and r > 0 and r2 > r, (r, r2)
"""


def _preflight(deadline: float) -> str | None:
    """Tiny chained program in a SUBPROCESS with a hard deadline. Returns
    None if the relay is alive, else a human-readable failure string. A
    wedged relay blocks uninterruptibly inside C++ RPC code (twice measured:
    r3 40k-soak, r4 driver bench), so in-process alarms are unreliable —
    only process isolation gives a guaranteed verdict."""
    override = os.environ.get("BENCH_PREFLIGHT_CMD")  # test hook
    if override is not None:
        argv = ["/bin/sh", "-c", override]
    else:
        argv = [sys.executable, "-c", PREFLIGHT_CODE.format(cache=os.path.join(_repo_dir(), ".jax_cache"))]
    t0 = time.monotonic()
    try:
        proc = subprocess.run(
            argv, timeout=deadline, stdout=subprocess.DEVNULL,
            stderr=subprocess.PIPE, text=True,
        )
    except subprocess.TimeoutExpired:
        return f"preflight exceeded {deadline:.0f}s deadline (relay wedged or backend init stalled)"
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()[-1:] or [""]
        return f"preflight exited rc={proc.returncode} after {time.monotonic() - t0:.0f}s: {tail[0][:160]}"
    return None


def _read_progress(path: str) -> tuple[dict, str | None]:
    """(completed stage -> data, stage that started but never finished)."""
    done: dict = {}
    started: str | None = None
    try:
        with open(path) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("event") == "start":
                    started = rec.get("stage")
                elif rec.get("event") == "done":
                    done[rec["stage"]] = rec.get("data")
                    if started == rec.get("stage"):
                        started = None
    except OSError:
        pass
    return done, started


def supervise() -> None:
    """Driver entry: guarantees exactly one parseable JSON line on stdout
    within $BENCH_DEADLINE (default 540 s — safely under the driver's
    external `timeout`, which produced rc=124/parsed=null in r4), whatever
    the relay does.

    The preflight is a DIAGNOSTIC, not a gate (r5 lesson): in
    compile-degraded relay windows a FRESH process pays minutes of remote
    compile latency for even a trivial canary (measured 171-411 s for an
    8 KB matmul) while the fully-cached production bench still runs — a
    gating preflight vetoed three benches that would have succeeded. So on
    preflight failure the child still runs with the remaining budget; the
    preflight verdict only annotates the line (and names the stall when the
    child also produces nothing). Mid-bench wedge -> child killed, partial
    stages emitted."""
    t0 = time.monotonic()
    total = float(os.environ.get("BENCH_DEADLINE", 540))
    margin = float(os.environ.get("BENCH_MARGIN", min(12.0, 0.08 * total + 2)))
    pf_deadline = min(float(os.environ.get("BENCH_PREFLIGHT_DEADLINE", 120)), total - margin)

    fail = _preflight(pf_deadline)

    progress_path = os.path.join(
        _repo_dir(), ".jax_cache", f"bench_progress_{os.getpid()}.jsonl"
    )
    os.makedirs(os.path.dirname(progress_path), exist_ok=True)
    open(progress_path, "w").close()
    env = dict(os.environ)
    env["BENCH_CHILD"] = "1"
    env["BENCH_PROGRESS_FILE"] = progress_path
    budget = total - (time.monotonic() - t0) - margin
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)], env=env,
        stdout=subprocess.PIPE, text=True,  # stderr inherits (diagnostics)
    )
    timed_out = False
    try:
        out, _ = child.communicate(timeout=budget)
    except subprocess.TimeoutExpired:
        timed_out = True
        child.kill()  # direct-PID kill of our own Popen (no pattern match)
        out, _ = child.communicate()
    finally:
        done, hung_stage = _read_progress(progress_path)
        try:
            os.remove(progress_path)
        except OSError:
            pass

    if not timed_out and child.returncode == 0:
        for line in reversed((out or "").splitlines()):
            if line.startswith("{"):
                if fail is not None:  # annotate: bench fine, preflight slow
                    try:
                        obj = json.loads(line)
                        obj.setdefault("extra", {})["preflight_warning"] = fail
                        line = json.dumps(obj)
                    except ValueError:
                        pass
                print(line, flush=True)
                return
        # fall through: child "succeeded" without printing — treat as partial

    cause = (
        f"child exceeded {budget:.0f}s budget" if timed_out
        else f"child exited rc={child.returncode}"
    )
    where = f" during stage '{hung_stage}'" if hung_stage else ""
    inference = done.get("inference") or {}
    mp = inference.get("mp_per_s")
    if fail is not None and not done and hung_stage in (None, "inference"):
        # preflight failed AND the child measured nothing: the relay is down
        status = f"relay-stalled: {fail}; child then {cause}{where}"
    else:
        status = f"partial: {cause}{where}; completed stages: {sorted(done)}"
        if fail is not None:
            status += f"; preflight: {fail}"
    extra = {
        "status": status,
        **read_parity_report(),
    }
    if "cem_residual" in inference:
        extra["cem_consistency_max_err"] = inference["cem_residual"]
    for key in ("single_image", "gan_train"):
        if done.get(key):
            extra.update(done[key])
    if mp is None:
        extra["last_validated_stale"] = load_last_validated()
    full = _load_last_full()
    if full is not None:
        extra["last_full_run_this_machine"] = full
    print(_assemble_line(mp, extra), flush=True)


def main() -> None:
    if os.environ.get("BENCH_CHILD") == "1" or os.environ.get("BENCH_DIRECT") == "1":
        child_main()
    else:
        supervise()


if __name__ == "__main__":
    main()
