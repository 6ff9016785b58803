"""SRModel — PSNR-oriented trainer (SURVEY.md §2.11, ``codes/models/SR_model.py``).

Pixel-loss (L1/L2/Charbonnier) training of the RRDB generator with Adam +
MultiStepLR. The train step is one pure jitted function fusing the on-device
preprocessing pipeline (LR synthesis + augmentation) with forward/backward —
the host only streams uint8 HR crops.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from esr_tpu.cem import CEMConf, make_cem
from esr_tpu.cem.kernels import resolve_kernel
from esr_tpu.data.pipeline import make_train_pipeline
from esr_tpu.models import losses as L
from esr_tpu.models.base_model import (
    BaseModel,
    TrainState,
    make_adam,
    multistep_schedule,
    opt_float,
    step_keyed,
)
from esr_tpu.models.networks import define_G
from esr_tpu.ops.metrics import psnr_jax

__all__ = ["SRModel", "make_sr_train_step", "make_sr_multi_step"]


def make_sr_train_step(
    g_module,
    pipeline,
    pixel_criterion: str = "l1",
    pixel_weight: float = 1.0,
    g_apply=None,
):
    """Pure train step: (state, hr_batch, rng) -> (state', metrics).

    ``g_apply``: optional trunk-parallel forward replacing
    ``g_module.apply`` (``train_tp``/``train_pp`` —
    BaseModel._train_parallel_apply)."""

    def loss_fn(params, batch):
        if g_apply is not None:
            sr = g_apply(params, batch["LR"], batch.get("Z"))
        else:
            sr = g_module.apply({"params": params}, batch["LR"], batch.get("Z"))
        loss = pixel_weight * L.pixel_loss(sr, batch["HR"], pixel_criterion)
        return loss, sr

    def train_step(state: TrainState, hr_batch, rng):
        batch = pipeline(hr_batch, rng)
        (loss, sr), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch)
        state = state.apply_gradients(grads=grads)
        metrics = {"l_pix": loss, "psnr": psnr_jax(sr, batch["HR"], quantize=False)}
        return state, metrics

    return train_step


def make_sr_multi_step(step_fn):
    """Chunked dispatch: ``lax.scan`` k train steps in ONE jitted program —
    amortizes the ~8-20 ms per-program relay/dispatch latency (see
    :func:`esr_tpu.models.srragan_model.make_gan_multi_step` for the full
    rationale). rng per inner step is ``fold_in(base, absolute_step)``,
    matching the per-step path bit-for-bit."""

    def multi_step(state, hr_batches, rng_base, step0):
        k = jax.tree.leaves(hr_batches)[0].shape[0]

        def body(st, xs):
            batch, step = xs
            st, m = step_fn(st, batch, jax.random.fold_in(rng_base, step))
            return st, m

        steps = step0 + jnp.arange(k, dtype=jnp.int32)
        state, metrics = jax.lax.scan(body, state, (hr_batches, steps))
        return state, metrics

    return multi_step


class SRModel(BaseModel):
    def __init__(self, opt: dict):
        super().__init__(opt)
        self.scale = int(opt.get("scale") or 4)
        train_opt = opt.get("train") or {}
        self.g_module = define_G(opt)
        self.nz = self.g_module.num_latent_channels

        self._kernel = resolve_kernel(opt.get("kernel"))
        self.cem = None
        if opt.get("use_cem"):
            self.cem = make_cem(CEMConf(scale=self.scale, kernel=self._kernel))
        # custom kernel -> LR synthesis shares the CEM operator (one build);
        # default bicubic -> None (the pipeline's own imresize path)
        self._lr_synth = (
            self.cem or make_cem(CEMConf(scale=self.scale, kernel=self._kernel))
            if self._kernel
            else None
        )

        rng = jax.random.PRNGKey(int(train_opt.get("manual_seed") or 0))
        from esr_tpu.data.util import parse_size

        hr_h, hr_w = parse_size(
            ((opt.get("datasets") or {}).get("train") or {}).get("HR_size")
        )
        lr_h, lr_w = hr_h // self.scale, hr_w // self.scale
        variables = self.g_module.init(
            rng,
            jnp.zeros((1, lr_h, lr_w, self.g_module.in_nc)),
            jnp.zeros((1, lr_h, lr_w, self.nz)) if self.nz else None,
        )
        params = variables["params"]

        if opt["path"].get("pretrain_model_G"):
            params = self.load_network(opt["path"]["pretrain_model_G"], params)

        if self.is_train:
            sched = multistep_schedule(
                opt_float(train_opt, "lr_G", 2e-4),
                train_opt.get("lr_steps") or [],
                opt_float(train_opt, "lr_gamma", 0.5),
            )
            self.schedulers["G"] = sched
            grad_clip = train_opt.get("grad_clip")
            tx = make_adam(
                # G updates every step here: shift so MultiStepLR milestones
                # fire at the 1-based global step (base_model.step_keyed)
                step_keyed(sched),
                opt_float(train_opt, "beta1_G", 0.9),
                grad_clip=float(grad_clip) if grad_clip else None,
            )
        else:
            import optax

            tx = optax.identity()  # not used at test time
        self.state = TrainState.create(apply_fn=self.g_module.apply, params=params, tx=tx)

        train_ds_opt = (opt.get("datasets") or {}).get("train") or {}
        # paired-LR training: a configured dataroot_LR means the provided LR
        # crops are ground truth — never re-synthesized (ADVICE r1 medium)
        self._paired_lr = bool(train_ds_opt.get("dataroot_LR"))
        pipeline = make_train_pipeline(
            scale=self.scale,
            # reference location: augment flags live in the dataset block
            # (train-block values honored as a fallback)
            use_flip=bool(
                train_ds_opt.get("use_flip", train_opt.get("use_flip", True))
            ),
            use_rot=bool(train_ds_opt.get("use_rot", train_opt.get("use_rot", True))),
            num_latent_channels=self.nz,
            downsample_fn=self._lr_synth.downsample if self._lr_synth else None,
        )
        from esr_tpu.models.base_model import make_parallel_train_step, maybe_dp_step

        # train_tp/train_pp: trunk-parallel G forward in the train step
        g_apply, pmesh = self._train_parallel_apply() if self.is_train else (None, None)
        self._step_fn = make_sr_train_step(
            self.g_module,
            pipeline,
            train_opt.get("pixel_criterion") or "l1",
            opt_float(train_opt, "pixel_weight", 1.0),
            g_apply=g_apply,
        )
        if pmesh is not None:
            self._train_step = make_parallel_train_step(
                self._step_fn, pmesh, n_state_args=1, n_extra_args=1
            )
            self._mesh = pmesh
        else:
            self._train_step, self._mesh = maybe_dp_step(
                self._step_fn,
                opt,
                n_state_args=1,
                n_extra_args=1,
            )
        self._multi_step = None  # built lazily on first chunked call
        import logging

        from esr_tpu.models.networks import describe_network

        logging.getLogger("base").info(
            describe_network("G", self.g_module, {"params": params})
        )
        self._rng = jax.random.PRNGKey(int(train_opt.get("manual_seed") or 0) + 1)
        self._forward = jax.jit(self._make_forward())
        self._data: dict = {}

    # -- reference API ----------------------------------------------------

    def feed_data(self, data: dict) -> None:
        self._data = data

    def _ensure_placed(self) -> None:
        if self._mesh is not None and not getattr(self, "_placed", False):
            from esr_tpu.parallel.dp import replicate_states

            self.state = replicate_states(self.state, self._mesh)
            self._placed = True

    def optimize_parameters(self, step: int) -> None:
        self.step = step
        # rng is a pure function of (seed, step): deterministic resume
        rng = jax.random.fold_in(self._rng, step)
        batch = self._prep_batch(self._data)
        self._ensure_placed()
        self.state, metrics = self._train_step(self.state, batch, rng)
        self._losses = metrics

    def optimize_parameters_chunk(self, first_step: int, chunk: dict) -> None:
        """Run ``k = chunk['HR'].shape[0]`` consecutive train steps in ONE
        dispatch (see :func:`make_sr_multi_step`); trajectory-equivalent to
        k ``feed_data``/``optimize_parameters`` calls."""
        batches = self._prep_batch(chunk)
        k = int(np.asarray(chunk["HR"]).shape[0])
        self._ensure_placed()
        if self._multi_step is None:
            multi = make_sr_multi_step(self._step_fn)
            if (
                self._mesh is not None
                and "data" in self._mesh.axis_names
                and self._mesh.shape["data"] > 1
            ):
                from esr_tpu.parallel.dp import make_dp_train_step

                self._multi_step = make_dp_train_step(
                    multi, self._mesh, n_state_args=1, n_extra_args=2, batch_dim=1
                )
            else:  # single device or a stage-only (train_pp) mesh
                self._multi_step = jax.jit(multi, donate_argnums=(0,))
        self.step = first_step + k - 1
        self.state, metrics = self._multi_step(
            self.state, batches, self._rng, jnp.int32(first_step)
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
        sr = self._forward(self.state.params, lr, zz)
        # keep SR/LR on device: the fetch (f32 or device-converted uint8)
        # happens in get_current_visuals / get_visuals_uint8 on demand
        self._visuals = {"SR": sr[0], "LR": lr[0]}
        if self._data.get("HR") is not None:
            hr = np.asarray(self._data["HR"])
            self._visuals["HR"] = hr[0] if hr.ndim == 4 else hr

    def save(self, iter_label) -> None:
        self.save_network({"params": self.state.params}, "G", iter_label)

    def save_training(self, epoch: int, iter_step: int) -> None:
        self.save_training_state(epoch, iter_step, {"G": self.state})

    def resume_training(self, path: str) -> tuple[int, int]:
        tree = self.restore_training_state(path, {"G": self.state})
        self.state = jax.tree.map(jnp.asarray, tree["G"])
        self.step = int(tree["iter"])
        return int(tree["epoch"]), int(tree["iter"])
