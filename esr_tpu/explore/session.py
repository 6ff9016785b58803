"""Headless exploration session (SURVEY.md §2.16 capability, TPU-first).

The reference ships a PyQt GUI (``codes/GUI_SR.py``) whose editing tools all
reduce to Z-optimization calls over a selected region. This module provides
that editing model as a headless API (CLI/notebook-friendly — a Qt front-end
can sit on top later): load LR -> SR with Z=0; select region (rect / polygon
/ brush mask); apply tools (imprint, variance up/down, brightness,
periodicity 1D/2D, TV smoothing, random diverse alternatives); per-region Z
state with undo/redo history; save outputs. Every tool maps to a single
jitted Z-search program (esr_tpu.explore.z_optimizer).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from esr_tpu.explore import objectives as obj
from esr_tpu.explore.z_optimizer import ZOptimizer

__all__ = ["ExplorationSession"]


class ExplorationSession:
    def __init__(
        self,
        forward,
        params,
        lr_img: np.ndarray,
        num_latent_channels: int = 1,
        scale: int = 4,
        n_steps: int = 64,
        opt_lr: float = 0.1,
        history_limit: int = 32,
        progress_cb=None,
        progress_chunks: int = 8,
        anchor_cap: int = 8,
    ):
        """forward(params, lr, z) -> sr (CEM-wrapped for guaranteed
        consistency of every edit)."""
        if lr_img.ndim == 3:
            lr_img = lr_img[None]
        self.lr_img = np.asarray(lr_img, np.float32)
        self.scale = scale
        self.nz = num_latent_channels
        n, h, w, _ = self.lr_img.shape
        self.z = np.zeros((n, h, w, num_latent_channels), np.float32)
        self._forward = jax.jit(forward)
        self._params = params
        self._optimizer = ZOptimizer(
            forward, params, scale=scale, n_steps=n_steps, lr=opt_lr
        )
        self._history: list[np.ndarray] = []
        self._redo: list[np.ndarray] = []
        self._history_limit = history_limit
        # progress_cb(done_steps, total_steps, losses_so_far): when set, tool
        # Z-searches run chunked (identical math; see optimize_z) so a GUI can
        # show per-tool progress (SURVEY §2.16).
        self.progress_cb = progress_cb
        self.progress_chunks = progress_chunks
        self.anchor_cap = anchor_cap  # padded-anchor capacity (propose_alternatives)
        self.z_range_max = 3.0  # adaptive tools' escalation ceiling (r5 recipe)
        self._mask: np.ndarray | None = None  # HR-space float mask
        self._box_lr: tuple | None = None
        self._sr_cache: np.ndarray | None = None
        self._d_cfg: tuple | None = None  # (d_vars, nf, norm) for realism tool

    # -- region selection --------------------------------------------------

    @property
    def hr_shape(self):
        n, h, w, _ = self.lr_img.shape
        return (h * self.scale, w * self.scale)

    def select_rect(self, y0: int, x0: int, y1: int, x1: int) -> None:
        """Rectangle in HR coordinates."""
        mask = np.zeros(self.hr_shape, np.float32)
        mask[y0:y1, x0:x1] = 1.0
        self._set_mask(mask)

    def select_polygon(self, vertices) -> None:
        """Polygon (list of (y, x) HR coords) via even-odd rasterization."""
        h, w = self.hr_shape
        ys, xs = np.mgrid[0:h, 0:w]
        v = np.asarray(vertices, np.float32)
        n = len(v)
        inside = np.zeros((h, w), bool)
        j = n - 1
        for i in range(n):
            yi, xi = v[i]
            yj, xj = v[j]
            cond = ((v[i, 0] > ys) != (v[j, 0] > ys)) & (
                xs < (xj - xi) * (ys - yi) / (yj - yi + 1e-12) + xi
            )
            inside ^= cond
            j = i
        self._set_mask(inside.astype(np.float32))

    def select_mask(self, mask_hr: np.ndarray) -> None:
        """Arbitrary brush mask (float/bool HR-space)."""
        self._set_mask(np.asarray(mask_hr, np.float32))

    def _set_mask(self, mask: np.ndarray) -> None:
        if mask.shape != self.hr_shape:
            raise ValueError(f"mask shape {mask.shape} != HR shape {self.hr_shape}")
        self._mask = mask
        ys, xs = np.nonzero(mask > 0)
        if len(ys):
            s = self.scale
            self._box_lr = (
                int(ys.min()) // s,
                int(xs.min()) // s,
                -(-int(ys.max() + 1) // s),
                -(-int(xs.max() + 1) // s),
            )
        else:
            self._box_lr = None

    # -- core ops ----------------------------------------------------------

    def current_sr(self, z: np.ndarray | None = None) -> np.ndarray:
        if z is None:
            # cached: every Z mutation clears _sr_cache, so UI refreshes
            # (pointer events, overlays) don't redispatch the forward
            if self._sr_cache is None:
                sr = self._forward(
                    self._params, jnp.asarray(self.lr_img), jnp.asarray(self.z)
                )
                self._sr_cache = np.asarray(sr)
            return self._sr_cache
        return np.asarray(
            self._forward(self._params, jnp.asarray(self.lr_img), jnp.asarray(z))
        )

    def _push_history(self) -> None:
        self._history.append(self.z.copy())
        if len(self._history) > self._history_limit:
            self._history.pop(0)
        self._redo.clear()

    def undo(self) -> None:
        if self._history:
            self._redo.append(self.z.copy())
            self.z = self._history.pop()
            self._sr_cache = None

    def redo(self) -> None:
        if self._redo:
            self._history.append(self.z.copy())
            self.z = self._redo.pop()
            self._sr_cache = None

    def reset_region_z(self) -> None:
        """Zero the Z map inside the selected region."""
        self._push_history()
        mask_lr = self._mask_lr()
        self.z = self.z * (1.0 - mask_lr[None, :, :, None])
        self._sr_cache = None

    def _mask_lr(self) -> np.ndarray:
        s = self.scale
        m = self._mask if self._mask is not None else np.ones(self.hr_shape, np.float32)
        h, w = m.shape
        return m.reshape(h // s, s, w // s, s).max(axis=(1, 3))

    def _run_tool(
        self, objective, adaptive: bool = False, z_range_max: float | None = None
    ) -> np.ndarray:
        if self._mask is None:
            self._mask = np.ones(self.hr_shape, np.float32)
        self._push_history()
        z_opt, losses = self._optimizer(
            self.lr_img,
            self.z,
            objective,
            mask_hr=self._mask,
            box_lr=self._box_lr,
            progress_cb=self.progress_cb,
            n_chunks=self.progress_chunks if self.progress_cb else 1,
            adaptive=adaptive,
            z_range_max=z_range_max,
        )
        self.z = np.asarray(z_opt)
        self._sr_cache = None
        return np.asarray(losses)

    @property
    def last_rounds(self):
        """Escalation report of the last adaptive tool run (per-round
        {lr, first, last, rel_improvement}), or None."""
        return self._optimizer.last_rounds

    # -- tools (the GUI button set) ---------------------------------------

    def set_search_strength(
        self, n_steps: int | None = None, z_range_max: float | None = None
    ) -> None:
        """Editor-level search controls (the reference exposes its
        Z-optimizer iteration budget as GUI config): ``n_steps`` per search
        round (NOTE: a new value compiles a new scan program per crop
        bucket — the step count is the scan length); ``z_range_max`` caps
        the adaptive tools' Z-box escalation (0 disables widening — edits
        stay inside the trained latent box)."""
        if n_steps is not None:
            self._optimizer.n_steps = int(n_steps)
        if z_range_max is not None:
            self.z_range_max = float(z_range_max) or None

    def imprint(
        self,
        target_hr: np.ndarray,
        adaptive: bool = True,
        z_range_max: float | None | str = "session",
    ) -> np.ndarray:
        """Imprint desired content (e.g. rendered text/graffiti) in-region.

        Adaptive by default (r5, VERDICT r4 weak #4): on trained checkpoints
        converged regions are locally Z-insensitive and the fixed-LR search
        barely moves — the plateau-escalating recipe boosts the Adam LR,
        then (``z_range_max``) widens the latent clip box, the lever the
        12k-checkpoint diagnostic showed actually moves converged regions
        (LR x3 / 4x steps changed nothing; z_range 3.0 doubled movement —
        PROGRESS_NOTES r5). A widened box leaves the trained Z
        distribution; outputs remain exactly CEM-consistent. The escalation
        trace is exposed via ``last_rounds``; pass ``z_range_max=None`` to
        stay inside the trained box. The default ``"session"`` resolves to
        ``self.z_range_max`` (3.0; adjustable via
        :meth:`set_search_strength` / the CLI's ``zmax``)."""
        if z_range_max == "session":
            z_range_max = self.z_range_max
        return self._run_tool(
            obj.imprint_objective(jnp.asarray(target_hr, jnp.float32)),
            adaptive=adaptive,
            z_range_max=z_range_max,
        )

    def increase_variance(self) -> np.ndarray:
        return self._run_tool(obj.variance_objective(+1.0))

    def decrease_variance(self) -> np.ndarray:
        return self._run_tool(obj.variance_objective(-1.0))

    def brightness(self, target_level: float) -> np.ndarray:
        return self._run_tool(obj.brightness_objective(float(target_level)))

    def smooth(self) -> np.ndarray:
        return self._run_tool(obj.tv_objective())

    def periodicity(self, period_y: float = 0.0, period_x: float = 0.0) -> np.ndarray:
        return self._run_tool(obj.periodicity_objective(period_y, period_x))

    def match_histogram(self, target_patch: np.ndarray, adaptive: bool = True) -> np.ndarray:
        """Transfer a target patch's intensity distribution to the region.
        Adaptive by default — content-target tools share imprint's
        converged-region problem (see :meth:`imprint`)."""
        return self._run_tool(
            obj.histogram_objective(jnp.asarray(target_patch, jnp.float32)),
            adaptive=adaptive,
        )

    def set_discriminator(self, d_vars: dict, nf: int = 64, norm: str = "batch") -> None:
        """Attach a trained discriminator (the saved ``*_D`` artifact:
        ``{'params', 'batch_stats'}``) enabling the realism tool."""
        self._d_cfg = (d_vars, int(nf), norm)

    def realism(self, direction: float = 1.0) -> np.ndarray:
        """Push the region's D realism score up (direction>0) or down — the
        reference's adversarial exploration tool (SURVEY.md §2.12)."""
        if self._d_cfg is None:
            raise ValueError(
                "no discriminator attached — call set_discriminator() (e.g. "
                "with the experiment's latest_D checkpoint / "
                "path.pretrain_model_D) before using the realism tool"
            )
        d_vars, nf, norm = self._d_cfg
        return self._run_tool(
            obj.adversarial_objective(d_vars, float(direction), nf=nf, norm=norm)
        )

    def d_score(self) -> float:
        """Mean D logit over the current SR within the selection (a realism
        meter for the UI; higher = D finds it more real).

        The meter scores the REGION: like the realism tool's search, the SR
        is cropped to the selection's bucketed bbox before D sees it (the
        objective's mask only gates gradients, it cannot change the value —
        so without the crop the meter would silently report the whole-image
        score for any selection)."""
        if self._d_cfg is None:
            raise ValueError("no discriminator attached — call set_discriminator()")
        d_vars, nf, norm = self._d_cfg
        # direction=-1 makes the objective return +mean(logits)
        objective = obj.adversarial_objective(d_vars, -1.0, nf=nf, norm=norm)
        mask = self._mask if self._mask is not None else np.ones(self.hr_shape, np.float32)
        sr = jnp.asarray(self.current_sr())
        mask_j = jnp.asarray(mask)
        if self._box_lr is not None:
            from esr_tpu.explore.z_optimizer import bucket_crop

            h, w = self.lr_img.shape[1:3]
            y, x, size = bucket_crop(self._box_lr, h, w, self.scale)
            s = self.scale
            sr = sr[:, y * s : (y + size) * s, x * s : (x + size) * s]
            mask_j = mask_j[y * s : (y + size) * s, x * s : (x + size) * s]
        # jit caches on objective.fn, which is lru_cached per D config — a
        # repeated meter read (per crop bucket) is a dispatch, not a retrace
        return float(jax.jit(objective.fn)(sr, mask_j, objective.aux))

    def propose_alternatives(
        self, k: int = 3, seed: int = 0, candidate_cb=None
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Generate k diverse consistent candidates for the region WITHOUT
        committing any of them: random Z restarts in-region, each repelled
        from the previously produced SRs. Returns ``[(z_full, sr), ...]``; the
        session Z map is left untouched — feed a chosen candidate's ``z`` to
        :meth:`apply_alternative` (the GUI's choose-one-of-k picker).
        ``candidate_cb(i, k)`` reports per-candidate progress."""
        if self._mask is None:
            self._mask = np.ones(self.hr_shape, np.float32)
        cands: list[tuple[np.ndarray, np.ndarray]] = []
        rng = np.random.default_rng(seed)
        mask_lr = self._mask_lr()[None, :, :, None]
        base_z = self.z.copy()
        anchors = [self.current_sr()]  # z unchanged -> rides the SR cache
        # pad the anchor stack to a FIXED capacity (zero-weight rows) so all
        # k candidates — and every later alternatives click — share ONE
        # compiled search program; a growing (i+1,H,W,C) stack would compile
        # k distinct programs (r5 interactivity fix, 20 s+ per relay compile)
        cap = max(self.anchor_cap, k)
        hh, ww, cc = anchors[0].shape[1:]
        for i in range(k):
            z_init = base_z * (1 - mask_lr) + mask_lr * rng.uniform(
                -1, 1, self.z.shape
            ).astype(np.float32)
            padded = np.zeros((cap, hh, ww, cc), np.float32)
            padded[: len(anchors)] = np.stack(anchors)[:, 0]
            weights = np.zeros((cap,), np.float32)
            weights[: len(anchors)] = 1.0
            z_opt, _ = self._optimizer(
                self.lr_img,
                z_init,
                obj.random_diverse_objective(
                    jnp.asarray(padded), anchor_weights=jnp.asarray(weights)
                ),
                mask_hr=self._mask,
                box_lr=self._box_lr,
            )
            z_opt = np.asarray(z_opt)
            sr = np.asarray(
                self._forward(self._params, jnp.asarray(self.lr_img), jnp.asarray(z_opt))
            )
            anchors.append(sr)
            cands.append((z_opt, sr))
            if candidate_cb is not None:
                candidate_cb(i + 1, k)
        # self.z was never mutated — the SR cache stays valid
        return cands

    def apply_alternative(self, z: np.ndarray) -> None:
        """Commit a candidate Z map from :meth:`propose_alternatives` (one
        undo step, like any other tool)."""
        if z.shape != self.z.shape:
            raise ValueError(f"candidate z shape {z.shape} != {self.z.shape}")
        self._push_history()
        self.z = np.asarray(z, np.float32).copy()
        self._sr_cache = None

    def random_alternatives(self, k: int = 3, seed: int = 0) -> list[np.ndarray]:
        """Generate k diverse consistent alternatives for the region,
        committing each in turn (the session ends on the last one; undo steps
        back through them). For a pick-one workflow use
        :meth:`propose_alternatives` + :meth:`apply_alternative`."""
        cands = self.propose_alternatives(k, seed)
        for z_opt, _ in cands:
            self.apply_alternative(z_opt)
        return [sr for _, sr in cands]

    # -- io ---------------------------------------------------------------

    def save_sr(self, path: str) -> None:
        from esr_tpu.data.util import save_img
        from esr_tpu.ops.color import tensor2img

        save_img(tensor2img(self.current_sr()[0]), path)

    def save_state(self, path: str) -> None:
        """Persist the editing state (LR, Z map, selection) as an npz."""
        state = {"z": self.z, "lr": self.lr_img}
        if self._mask is not None:
            state["mask"] = self._mask
        np.savez(path, **state)

    def load_state(self, path: str) -> None:
        data = np.load(path)
        self.z = data["z"]
        self.lr_img = data["lr"]
        if "mask" in data:
            self._set_mask(data["mask"])
        else:
            self._mask = None
            self._box_lr = None
        self._history.clear()
        self._redo.clear()
        self._sr_cache = None
