"""SRRaGANModel — ESRGAN / explorable GAN trainer (SURVEY.md §2.11,
``codes/models/SRRaGAN_model.py``).

Training semantics mirrored from the reference:
- G forward is CEM-wrapped (when ``use_cem``) and Z-conditioned (random Z map
  drawn per step for explorable training);
- D sees CEM-projected ground truth (so consistency is never a real/fake cue
  — SURVEY.md §2.10a consequence);
- losses: pixel (opt) + VGG-feature L1 + relativistic-average GAN + range +
  map/Z losses;
- ONE generator forward per step (reference parity, SURVEY §3.1): the G
  loss's primal output feeds the D update via stop_gradient;
- G updates first, against the PRE-update D (reference order), gated by
  ``D_update_ratio`` / ``D_init_iters`` (masked update — no host round trip);
  D updates every step;
- separate Adam + MultiStepLR for G and D; optional global-norm grad
  clipping via ``train.grad_clip``.

TPU-first shape: ONE jitted step = fused device pipeline (augment + LR
synthesis + Z draw) + gated G update + D update. Real and fake crops go
through D as a single doubled batch (one MXU pass, halves dispatches, and
matches torch-BN semantics which normalizes real/fake activations jointly
when batched). The step is pure: (g_state, d_state, hr_batch, rng, step) ->
(g_state', d_state', metrics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from esr_tpu.cem import CEMConf, make_cem
from esr_tpu.cem.kernels import resolve_kernel
from esr_tpu.data.pipeline import make_train_pipeline
from esr_tpu.models import losses as L
from esr_tpu.models.base_model import (
    BaseModel,
    TrainState,
    make_adam,
    maybe_dp_step,
    multistep_schedule,
    opt_float,
    step_keyed,
    unit_schedule,
)
from esr_tpu.models.networks import define_D, define_F, define_G
from esr_tpu.ops.metrics import psnr_jax

__all__ = ["SRRaGANModel", "make_gan_train_step", "make_gan_multi_step"]


def make_gan_train_step(
    g_module,
    d_module,
    f_module,
    f_variables,
    cem,
    pipeline,
    cfg: dict,
    g_lr_schedule=None,
    g_apply=None,
):
    """Build the pure GAN train step (see module docstring).

    ``g_lr_schedule``: when given, the G TrainState's optimizer must be built
    with unit learning rate (``make_adam(unit_schedule, ...)``) and the step applies
    ``g_lr_schedule(global_step)`` itself. This reproduces the reference
    exactly under gated G updates (``D_update_ratio``/``D_init_iters``):
    torch's MultiStepLR steps every ITERATION while Adam state advances only
    on real updates — an optax schedule keyed on the optimizer's own count
    would fire the LR milestones late.

    ``g_apply``: optional ``fn(params, lr, z) -> raw`` replacing
    ``g_module.apply`` — the hook through which ``train_tp``/``train_pp``
    swap in a trunk-parallel generator forward (same math, proven
    gradient-equal in tests/test_parallel.py; BaseModel._train_parallel_apply)."""
    gan_type = cfg.get("gan_type") or "vanilla"
    relativistic = bool(cfg.get("relativistic", True))  # False = SRGAN_model
    w_gp = opt_float(cfg, "gp_weight", 10.0 if gan_type == "wgan-gp" else 0.0)
    w_pix = opt_float(cfg, "pixel_weight", 0.0)
    w_feat = opt_float(cfg, "feature_weight", 0.0)
    w_gan = opt_float(cfg, "gan_weight", 0.005)
    w_range = opt_float(cfg, "range_weight", 0.0)
    w_map = opt_float(cfg, "map_weight", 0.0)
    pix_kind = cfg.get("pixel_criterion") or "l1"
    d_ratio = int(cfg.get("D_update_ratio") or 1)
    d_init = int(cfg.get("D_init_iters") or 0)

    def g_forward(params, lr, z):
        if g_apply is not None:
            raw = g_apply(params, lr, z)
        else:
            raw = g_module.apply({"params": params}, lr, z)
        if cem is not None:
            raw = cem.project(raw, lr)
        return raw

    def d_apply(d_state: TrainState, x, train=True):
        variables = {"params": d_state.params}
        if d_state.batch_stats is not None:
            variables["batch_stats"] = d_state.batch_stats
        if train and d_state.batch_stats is not None:
            logits, mutated = d_module.apply(
                variables, x, train=True, mutable=["batch_stats"]
            )
            return logits, mutated["batch_stats"]
        return d_module.apply(variables, x, train=False), d_state.batch_stats

    def train_step(g_state: TrainState, d_state: TrainState, hr_batch, rng, step):
        rng, rng_gp = jax.random.split(rng)
        batch = pipeline(hr_batch, rng)
        lr_img, hr_img, z = batch["LR"], batch["HR"], batch.get("Z")
        if cem is not None:
            # pre-consistent-ize GT so D can't use consistency as a cue
            hr_img = cem.enforce_dt_on_image_pair(lr_img, hr_img)

        # ---- G update FIRST (reference order: one G forward per step; G's
        # adversarial grads taken against the PRE-update D — SURVEY §3.1).
        # The forward's primal output rides out through has_aux and feeds the
        # D update below, so the generator runs exactly once per step.
        def g_loss_fn(g_params):
            sr = g_forward(g_params, lr_img, z)
            loss = 0.0
            aux = {}
            if w_pix:
                aux["l_g_pix"] = w_pix * L.pixel_loss(sr, hr_img, pix_kind)
                loss += aux["l_g_pix"]
            if w_feat:
                feat_sr = f_module.apply(f_variables, jnp.clip(sr, 0.0, 1.0))
                feat_hr = f_module.apply(f_variables, hr_img)
                aux["l_g_fea"] = w_feat * L.perceptual_l1(feat_sr, feat_hr)
                loss += aux["l_g_fea"]
            if w_gan:
                logits, _ = d_apply(d_state, jnp.concatenate([hr_img, sr], 0))
                d_real, d_fake = jnp.split(logits, 2, axis=0)
                aux["l_g_gan"] = w_gan * L.ragan_g_loss(
                    d_real, d_fake, gan_type, relativistic
                )
            else:  # gan_weight: 0 ablation — skip the D forward entirely
                aux["l_g_gan"] = jnp.float32(0.0)
            loss += aux["l_g_gan"]
            if w_range:
                aux["l_g_range"] = w_range * L.range_loss(sr)
                loss += aux["l_g_range"]
            if w_map and z is not None:
                aux["l_g_map"] = w_map * L.map_loss(sr, hr_img, z)
                loss += aux["l_g_map"]
            aux["psnr"] = psnr_jax(sr, hr_img, quantize=False)
            return loss, (aux, sr)

        (l_g, (g_aux, fake)), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            g_state.params
        )
        # reference gate (steps are 1-based): step % ratio == 0 AND step >
        # D_init_iters — strict >, matching the reference's one-step delay
        do_g = jnp.logical_and(step % d_ratio == 0, step > d_init)
        if g_lr_schedule is None:
            updated = g_state.apply_gradients(grads=g_grads)
        else:
            g_upd, g_opt = g_state.tx.update(g_grads, g_state.opt_state, g_state.params)
            lr = g_lr_schedule(step)  # LR from the GLOBAL step (see docstring)
            g_upd = jax.tree.map(lambda u: lr * u, g_upd)
            updated = g_state.replace(
                params=optax.apply_updates(g_state.params, g_upd),
                opt_state=g_opt,
                step=g_state.step + 1,
            )
        g_state = jax.tree.map(lambda new, old: jnp.where(do_g, new, old), updated, g_state)
        fake_sg = jax.lax.stop_gradient(fake)

        # ---- D update (every step): doubled batch through one D pass -----
        def d_loss_fn(d_params):
            ds = d_state.replace(params=d_params)
            logits, new_stats = d_apply(ds, jnp.concatenate([hr_img, fake_sg], 0))
            d_real, d_fake = jnp.split(logits, 2, axis=0)
            loss = L.ragan_d_loss(d_real, d_fake, gan_type, relativistic)
            if w_gp:
                loss += w_gp * L.gradient_penalty(
                    lambda p, x: d_apply(ds.replace(params=p), x, train=False)[0],
                    d_params,
                    hr_img,
                    fake_sg,
                    rng_gp,
                )
            return loss, (new_stats, d_real, d_fake)

        (l_d, (new_stats, d_real_v, d_fake_v)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(d_state.params)
        d_state = d_state.apply_gradients(grads=d_grads).replace(batch_stats=new_stats)

        metrics = {"l_d": l_d, "l_g": l_g, "D_real": jnp.mean(d_real_v), "D_fake": jnp.mean(d_fake_v)}
        metrics.update(g_aux)
        return g_state, d_state, metrics

    return train_step


def make_gan_multi_step(step_fn):
    """Chunked dispatch: ``lax.scan`` k train steps inside ONE jitted program.

    Every dispatched program pays ~8-20 ms of relay/dispatch latency that the
    per-step CLI loop cannot hide (PROGRESS_NOTES r3: 15.0 CLI steps/s vs
    18.6 pure); folding k steps into one program amortizes it k-fold. The
    per-step rng is ``fold_in(base, absolute_step)`` — exactly what the
    per-step path computes on the host — so chunked and unchunked training
    follow the same trajectory, and resume/determinism semantics carry over.

    Signature: ``(g_state, d_state, stacked_batches, rng_base, step0) ->
    (g_state', d_state', stacked_metrics)`` where batch leaves are stacked
    ``(k, N, ...)`` and each metric comes back ``(k,)``.
    """

    def multi_step(g_state, d_state, hr_batches, rng_base, step0):
        k = jax.tree.leaves(hr_batches)[0].shape[0]

        def body(carry, xs):
            g, d = carry
            batch, step = xs
            g, d, m = step_fn(g, d, batch, jax.random.fold_in(rng_base, step), step)
            return (g, d), m

        steps = step0 + jnp.arange(k, dtype=jnp.int32)
        (g_state, d_state), metrics = jax.lax.scan(
            body, (g_state, d_state), (hr_batches, steps)
        )
        return g_state, d_state, metrics

    return multi_step


class SRRaGANModel(BaseModel):
    def __init__(self, opt: dict):
        super().__init__(opt)
        self.scale = int(opt.get("scale") or 4)
        train_opt = opt.get("train") or {}
        self.g_module = define_G(opt)
        self.nz = self.g_module.num_latent_channels
        # optional user/estimated downsampling kernel (top-level 'kernel' opt):
        # defines both the CEM operator and training LR synthesis
        self._kernel = resolve_kernel(opt.get("kernel"))
        self.cem = (
            make_cem(CEMConf(scale=self.scale, kernel=self._kernel))
            if opt.get("use_cem")
            else None
        )
        # custom kernel -> LR synthesis shares the CEM operator (one build);
        # default bicubic -> None (the pipeline's own imresize path)
        self._lr_synth = (
            self.cem or make_cem(CEMConf(scale=self.scale, kernel=self._kernel))
            if self._kernel
            else None
        )

        seed = int(train_opt.get("manual_seed") or 0)
        rng = jax.random.PRNGKey(seed)
        from esr_tpu.data.util import parse_size

        hr_h, hr_w = parse_size(
            ((opt.get("datasets") or {}).get("train") or {}).get("HR_size")
        )
        lr_h, lr_w = hr_h // self.scale, hr_w // self.scale
        g_vars = self.g_module.init(
            rng,
            jnp.zeros((1, lr_h, lr_w, self.g_module.in_nc)),
            jnp.zeros((1, lr_h, lr_w, self.nz)) if self.nz else None,
        )
        g_params = g_vars["params"]
        if opt["path"].get("pretrain_model_G"):
            g_params = self.load_network(opt["path"]["pretrain_model_G"], g_params)

        if self.is_train:
            self.d_module = define_D(opt)
            # D's Dense head is sized by the train crop — rectangular
            # HR_size ([H, W]) gives it a (H/32 * W/32 * 8nf)-wide input
            d_vars = self.d_module.init(
                jax.random.PRNGKey(seed + 1),
                jnp.zeros((1, hr_h, hr_w, 3)),
                train=False,
            )
            self.f_module = define_F(opt)
            self.f_variables = self.f_module.init(
                jax.random.PRNGKey(seed + 2), jnp.zeros((1, hr_h, hr_w, 3))
            )
            if opt["path"].get("pretrain_model_F"):
                self.f_variables = self.load_network(
                    opt["path"]["pretrain_model_F"], self.f_variables
                )

            g_sched = multistep_schedule(
                opt_float(train_opt, "lr_G", 1e-4),
                train_opt.get("lr_steps") or [],
                opt_float(train_opt, "lr_gamma", 0.5),
            )
            d_sched = multistep_schedule(
                opt_float(train_opt, "lr_D", 1e-4),
                train_opt.get("lr_steps") or [],
                opt_float(train_opt, "lr_gamma", 0.5),
            )
            if opt["path"].get("pretrain_model_D"):
                d_vars = self.load_network(opt["path"]["pretrain_model_D"], d_vars)
            grad_clip = train_opt.get("grad_clip")
            grad_clip = float(grad_clip) if grad_clip else None
            self.schedulers = {"G": g_sched, "D": d_sched}
            # unit-LR Adam: the train step applies g_sched(global_step)
            # itself so MultiStepLR milestones track iterations even under
            # gated G updates (reference scheduler semantics). unit_schedule
            # is a CALLABLE so the opt_state keeps its ScaleByScheduleState
            # and earlier training states restore unchanged.
            self.g_state = TrainState.create(
                apply_fn=self.g_module.apply,
                params=g_params,
                tx=make_adam(
                    unit_schedule,
                    opt_float(train_opt, "beta1_G", 0.9),
                    grad_clip=grad_clip,
                ),
            )
            self.d_state = TrainState.create(
                apply_fn=self.d_module.apply,
                params=d_vars["params"],
                tx=make_adam(
                    # D updates every step: shift so milestones fire at the
                    # 1-based global step, in lockstep with G's (see
                    # base_model.step_keyed)
                    step_keyed(d_sched),
                    opt_float(train_opt, "beta1_D", 0.9),
                    grad_clip=grad_clip,
                ),
                batch_stats=d_vars.get("batch_stats"),
            )
            train_ds_opt = (opt.get("datasets") or {}).get("train") or {}
            # paired-LR training: provided LR crops are ground truth, never
            # re-synthesized (ADVICE r1 medium)
            self._paired_lr = bool(train_ds_opt.get("dataroot_LR"))
            pipeline = make_train_pipeline(
                scale=self.scale,
                # reference location: augment flags live in the dataset block
                # (train-block values honored as a fallback)
                use_flip=bool(
                    train_ds_opt.get("use_flip", train_opt.get("use_flip", True))
                ),
                use_rot=bool(
                    train_ds_opt.get("use_rot", train_opt.get("use_rot", True))
                ),
                num_latent_channels=self.nz,
                downsample_fn=self._lr_synth.downsample if self._lr_synth else None,
            )
            # train_tp/train_pp: trunk-parallel G forward in the train step
            g_apply, pmesh = self._train_parallel_apply()
            step_fn = make_gan_train_step(
                self.g_module,
                self.d_module,
                self.f_module,
                self.f_variables,
                self.cem,
                pipeline,
                train_opt,
                g_lr_schedule=g_sched,
                g_apply=g_apply,
            )
            self._step_fn = step_fn
            if pmesh is not None:
                from esr_tpu.models.base_model import make_parallel_train_step

                self._train_step = make_parallel_train_step(
                    step_fn, pmesh, n_state_args=2, n_extra_args=2
                )
                self._mesh = pmesh
            else:
                self._train_step, self._mesh = maybe_dp_step(
                    step_fn, opt, n_state_args=2, n_extra_args=2
                )
            self._multi_step = None  # built lazily on first chunked call
        else:
            import optax

            self.g_state = TrainState.create(
                apply_fn=self.g_module.apply, params=g_params, tx=optax.identity()
            )

        import logging

        from esr_tpu.models.networks import describe_network

        _lg = logging.getLogger("base")
        _lg.info(describe_network("G", self.g_module, {"params": g_params}))
        if self.is_train:
            _lg.info(describe_network("D", self.d_module, self.d_state.params))
            _lg.info(describe_network("F", self.f_module, self.f_variables))
        self._rng = jax.random.PRNGKey(seed + 3)
        self._forward = jax.jit(self._make_forward())
        self._data: dict = {}

    # -- reference API ----------------------------------------------------

    def feed_data(self, data: dict) -> None:
        self._data = data

    def _ensure_placed(self) -> None:
        if self._mesh is not None and not getattr(self, "_placed", False):
            from esr_tpu.parallel.dp import replicate_states

            self.g_state, self.d_state = replicate_states(
                (self.g_state, self.d_state), self._mesh
            )
            self._placed = True

    def optimize_parameters(self, step: int) -> None:
        self.step = step
        # rng is a pure function of (seed, step): deterministic resume
        rng = jax.random.fold_in(self._rng, step)
        batch = self._prep_batch(self._data)
        self._ensure_placed()
        self.g_state, self.d_state, metrics = self._train_step(
            self.g_state, self.d_state, batch, rng, jnp.int32(step)
        )
        self._losses = metrics

    def optimize_parameters_chunk(self, first_step: int, chunk: dict) -> None:
        """Run ``k = chunk['HR'].shape[0]`` consecutive train steps (numbers
        ``first_step .. first_step+k-1``) in ONE dispatch via
        :func:`make_gan_multi_step`. Trajectory-equivalent to k
        ``feed_data``/``optimize_parameters`` calls; ``get_current_losses``
        afterwards reports the last step's metrics."""
        batches = self._prep_batch(chunk)
        k = int(np.asarray(chunk["HR"]).shape[0])
        self._ensure_placed()
        if self._multi_step is None:
            multi = make_gan_multi_step(self._step_fn)
            if (
                self._mesh is not None
                and "data" in self._mesh.axis_names
                and self._mesh.shape["data"] > 1
            ):
                from esr_tpu.parallel.dp import make_dp_train_step

                # batch_dim=1: shard N inside each stacked (k, N, ...) batch
                self._multi_step = make_dp_train_step(
                    multi, self._mesh, n_state_args=2, n_extra_args=2, batch_dim=1
                )
            else:  # single device or a stage-only (train_pp) mesh
                self._multi_step = jax.jit(multi, donate_argnums=(0, 1))
        self.step = first_step + k - 1
        self.g_state, self.d_state, metrics = self._multi_step(
            self.g_state, self.d_state, batches, self._rng, jnp.int32(first_step)
        )
        self._losses = metrics

    def test(self, z: np.ndarray | None = None) -> None:
        lr = jnp.asarray(self._data["LR"])
        if lr.ndim == 3:
            lr = lr[None]
        zz = None
        if self.nz:
            zz = (
                jnp.asarray(z)
                if z is not None
                else jnp.zeros(lr.shape[:-1] + (self.nz,))
            )
            if zz.ndim == 3:
                zz = zz[None]
        sr = self._forward(self.g_state.params, lr, zz)
        # device arrays: fetched on demand (see BaseModel.get_current_visuals)
        self._visuals = {"SR": sr[0], "LR": lr[0]}
        if self._data.get("HR") is not None:
            hr = np.asarray(self._data["HR"])
            self._visuals["HR"] = hr[0] if hr.ndim == 4 else hr

    def save(self, iter_label) -> None:
        self.save_network({"params": self.g_state.params}, "G", iter_label)
        if self.is_train:
            self.save_network(
                {
                    "params": self.d_state.params,
                    "batch_stats": self.d_state.batch_stats,
                },
                "D",
                iter_label,
            )

    def save_training(self, epoch: int, iter_step: int) -> None:
        self.save_training_state(
            epoch, iter_step, {"G": self.g_state, "D": self.d_state}
        )

    def resume_training(self, path: str) -> tuple[int, int]:
        tree = self.restore_training_state(
            path, {"G": self.g_state, "D": self.d_state}
        )
        self.g_state = jax.tree.map(jnp.asarray, tree["G"])
        self.d_state = jax.tree.map(jnp.asarray, tree["D"])
        self.step = int(tree["iter"])
        return int(tree["epoch"]), int(tree["iter"])
