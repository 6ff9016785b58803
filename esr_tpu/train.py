"""Training entry point (SURVEY.md §2.1 / §3.1: ``codes/train.py``).

Usage parity with the reference::

    python -m esr_tpu.train -opt esr_tpu/options/train/train_ESRGAN.json

Loop shape mirrors the reference: parse opts -> seed -> build loaders+model ->
iterate (feed_data -> optimize_parameters -> periodic log / val-PSNR /
checkpoint), with resume support. TPU specifics: the fused device pipeline
runs inside the jitted train step, validation uses the on-device PSNR twin,
and checkpoints are orbax trees. ``--auto_resume`` resumes from the newest
state without an explicit path (preemption-friendly, SURVEY.md §5.3), and a
SIGTERM handler (cloud/TPU-pod preemption notice) finishes the in-flight
step, saves network + full training state, and exits cleanly — rerunning
with ``--auto_resume`` continues where preemption struck.
"""

from __future__ import annotations

import argparse
import logging
import math
import os
import signal


def chunk_limit(step: int, k: int, freqs, niter: int) -> int:
    """Largest chunk length starting after ``step`` that does not cross an
    event boundary (any multiple of a freq in ``freqs``) or ``niter`` — so
    chunked dispatch keeps the per-step loop's exact print/val/save cadence.
    Zero/None freqs are ignored."""
    limit = niter - step
    for f in freqs:
        if f:
            limit = min(limit, f - (step % f))
    return max(1, min(k, limit))


def stack_chunk(batches: list) -> dict:
    """Stack a list of loader batch dicts along a new leading step axis;
    non-array entries (path lists...) are collected into lists."""
    import numpy as np

    out = {}
    for key in batches[0]:
        vals = [b.get(key) for b in batches]
        if all(isinstance(v, np.ndarray) for v in vals):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", required=True, help="path to options JSON")
    parser.add_argument("--auto_resume", action="store_true")
    args = parser.parse_args(argv)

    from esr_tpu import data as data_mod
    from esr_tpu import options as options_mod
    from esr_tpu.models import create_model
    from esr_tpu.utils import mkdir_and_rename, mkdirs, set_random_seed, setup_logger
    from esr_tpu.utils.logger import Logger

    opt = options_mod.parse(args.opt, is_train=True)

    # preemption handling (SURVEY.md §5.3): SIGTERM sets a flag; the train
    # loop finishes the in-flight step, checkpoints, and exits 0. Installed
    # before model build so a notice during compile is honored too.
    preempted = {"flag": False}

    def _on_sigterm(signum, frame):  # noqa: ARG001
        preempted["flag"] = True

    prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)

    resume_path = opt["path"].get("resume_state")
    if args.auto_resume and not resume_path:
        from esr_tpu.models.base_model import BaseModel

        resume_path = BaseModel.latest_state_path(opt["path"]["training_state"])
    if resume_path:
        options_mod.check_resume(opt)
    else:
        mkdir_and_rename(opt["path"]["experiments_root"])
    mkdirs([opt["path"][k] for k in ("models", "training_state", "log", "val_images")])

    setup_logger("base", opt["path"]["log"], "train", screen=True)
    logger = logging.getLogger("base")
    options_mod.save(opt)

    seed = (opt["train"] or {}).get("manual_seed") or 0
    set_random_seed(int(seed))

    train_set = val_set = train_loader = val_loader = None
    for phase, dataset_opt in (opt["datasets"] or {}).items():
        if phase.startswith("train"):
            train_set = data_mod.create_dataset(dataset_opt)
            train_loader = data_mod.create_dataloader(train_set, dataset_opt)
            logger.info(f"train dataset [{dataset_opt.get('name')}]: {len(train_set)} images")
        elif phase.startswith("val"):
            val_set = data_mod.create_dataset(dataset_opt)
            val_loader = data_mod.create_dataloader(val_set, dataset_opt)
            logger.info(f"val dataset [{dataset_opt.get('name')}]: {len(val_set)} images")
    if train_loader is None:
        raise ValueError("no train dataset configured")

    model = create_model(opt)
    start_epoch, current_step = 0, 0
    if resume_path:
        start_epoch, current_step = model.resume_training(resume_path)
        logger.info(f"resumed from {resume_path} (epoch {start_epoch}, iter {current_step})")
        if hasattr(train_loader, "set_position") and len(train_loader) > 0:
            # restore the data stream: epoch-E shuffle order + mid-epoch
            # offset, so the resumed run sees the batches the original would
            offset = current_step - start_epoch * len(train_loader)
            if not 0 <= offset <= len(train_loader):
                # stale/misaligned epoch record (e.g. a state saved before
                # exact step<->batch bookkeeping): derive both from the step
                # count, which IS the number of batches consumed
                start_epoch = current_step // len(train_loader)
                offset = current_step - start_epoch * len(train_loader)
                logger.info(f"re-aligned resume position to epoch {start_epoch}")
            train_loader.set_position(start_epoch, offset)

    niter = int(opt["train"].get("niter") or 100000)
    val_freq = int(opt["train"].get("val_freq") or 5000)
    print_freq = int((opt["logger"] or {}).get("print_freq") or 100)
    save_freq = int((opt["logger"] or {}).get("save_checkpoint_freq") or 5000)
    # chunked dispatch: scan k train steps inside one jitted program to
    # amortize per-program dispatch latency (make_gan_multi_step). Chunks
    # are capped at event boundaries so print/val/save cadence is EXACTLY
    # the per-step loop's (pick freqs that are multiples of k to avoid
    # extra compile shapes).
    k_dispatch = int(opt["train"].get("steps_per_dispatch") or 1)
    event_freqs = (print_freq, val_freq if val_loader is not None else 0, save_freq)
    if len(train_loader) == 0:
        # drop_last with batch_size > dataset size yields ZERO batches per
        # epoch — without this guard training "completes" instantly with no
        # steps (found the silent way: an 8-image set at batch 16)
        n_img = len(getattr(train_loader, "dataset", []) or [])
        bsz = getattr(train_loader, "batch_size", "?")
        raise ValueError(
            f"train loader yields 0 batches: dataset has {n_img} images but "
            f"batch_size is {bsz} (drop_last) — shrink batch_size or add data"
        )
    total_epochs = max(1, math.ceil(niter / max(1, len(train_loader))))
    tlogger = Logger(opt)
    logger.info(f"training for {niter} iters (~{total_epochs} epochs)")

    # relay-stall watchdog (SURVEY.md §5.3), DEFAULT-ON since r5: the r3
    # 40k soak wedged inside an RPC with no exception and the r4 driver
    # bench repeated the mode — a no-progress heartbeat exits 86 so a
    # supervisor restarts with --auto_resume (lossless: deterministic
    # mid-epoch replay). `watchdog: false` disables; a number sets the
    # floor seconds. See esr_tpu/utils/watchdog.py.
    from esr_tpu.utils.watchdog import arm_from_opt

    wd = arm_from_opt(
        opt["train"].get("watchdog"), opt["train"].get("watchdog_factor"), logger
    )

    epoch = start_epoch  # bound even if the loop body never runs (stale
    # resume state past niter) — the preemption save below references it
    chunk = []  # pending batches; survives epoch boundaries (data only)
    for epoch in range(start_epoch, total_epochs + 1):
        for batch in train_loader:
            if current_step >= niter or preempted["flag"]:
                break
            if k_dispatch > 1:
                chunk.append(batch)
                if len(chunk) < chunk_limit(
                    current_step, k_dispatch, event_freqs, niter
                ):
                    continue
                if len(chunk) == 1:
                    current_step += 1
                    model.update_learning_rate()
                    model.feed_data(chunk[0])
                    model.optimize_parameters(current_step)
                else:
                    model.optimize_parameters_chunk(
                        current_step + 1, stack_chunk(chunk)
                    )
                    current_step += len(chunk)
                chunk = []
            else:
                current_step += 1
                model.update_learning_rate()
                model.feed_data(batch)
                model.optimize_parameters(current_step)

            if wd is not None:
                wd.beat(current_step)
            if current_step % print_freq == 0:
                tlogger.log_scalars(
                    current_step,
                    epoch,
                    model.get_current_learning_rate(),
                    model.get_current_losses(),
                )
            if val_loader is not None and current_step % val_freq == 0:
                metrics = validate(model, val_loader, opt, step=current_step)
                tlogger.log_validation(current_step, epoch, metrics)
                if wd is not None:  # val takes >> one step: reset the
                    wd.beat(count=False)  # silence clock, keep the EMA clean
            if current_step % save_freq == 0:
                model.save(current_step)
                model.save_training(epoch, current_step)
                logger.info(f"checkpoint saved @ iter {current_step}")
                if wd is not None:
                    wd.beat(count=False)
        if current_step >= niter or preempted["flag"]:
            break

    if chunk:
        # batches pending in an unflushed chunk were already drawn from the
        # data stream — train on them before saving, otherwise the resumed
        # replay (set_position) would hand the model DIFFERENT batches for
        # those step numbers (chunk_limit guarantees this never crosses niter)
        if len(chunk) == 1:
            current_step += 1
            model.update_learning_rate()
            model.feed_data(chunk[0])
            model.optimize_parameters(current_step)
        else:
            model.optimize_parameters_chunk(current_step + 1, stack_chunk(chunk))
            current_step += len(chunk)
        chunk = []

    if preempted["flag"]:
        # keep the flag handler installed through the grace-period save: a
        # second SIGTERM (clouds commonly repeat TERM before KILL) must not
        # hit the default handler and kill us mid-write
        model.save("latest")
        model.save_training(epoch, current_step)
        model.wait_for_checkpoints()
        if wd is not None:  # armed through the save (a wedged final save is
            wd.stop()       # exactly the r3 failure); disarmed only now
        signal.signal(signal.SIGTERM, prev_handler)
        logger.info(f"preempted (SIGTERM) — state saved @ iter {current_step}; "
                    "rerun with --auto_resume to continue")
        return
    model.save("latest")
    model.save_training(total_epochs, current_step)
    model.wait_for_checkpoints()
    if wd is not None:
        wd.stop()
    signal.signal(signal.SIGTERM, prev_handler)
    logger.info("training complete")


def validate(model, val_loader, opt, step=None) -> dict:
    import os

    import numpy as np

    from esr_tpu.data.util import save_img
    from esr_tpu.ops.color import rgb2ycbcr
    from esr_tpu.ops.metrics import calculate_psnr, crop_border

    scale = int(opt.get("scale") or 4)
    on_y = bool(opt.get("val_on_y"))  # Y-channel PSNR (reference option)
    val_dir = opt["path"].get("val_images") if step is not None else None
    psnrs = []
    for i, batch in enumerate(val_loader):
        sample = {k: (v[0] if isinstance(v, (np.ndarray, list)) else v) for k, v in batch.items()}
        model.feed_data(sample)
        model.test()
        # uint8 conversion happens on device; one uint8 fetch per image
        # instead of f32 (the relay's 25 MB/s D2H trap)
        vis = model.get_visuals_uint8()
        sr_img = vis["SR"]
        if val_dir:
            base = os.path.splitext(os.path.basename(str(sample.get("HR_path") or i)))[0]
            save_img(sr_img, os.path.join(val_dir, base, f"{base}_{step}.png"))
        if "HR" not in vis:
            continue
        hr_img = vis["HR"]  # already uint8 via get_visuals_uint8
        a, b = sr_img, hr_img
        if on_y and a.ndim == 3 and a.shape[2] == 3:
            a, b = rgb2ycbcr(a, only_y=True), rgb2ycbcr(b, only_y=True)
        sr = crop_border(a, scale).astype(np.float64)
        hr = crop_border(b, scale).astype(np.float64)
        psnrs.append(calculate_psnr(sr, hr))
    return {"psnr": float(np.mean(psnrs)) if psnrs else float("nan")}


if __name__ == "__main__":
    main()
