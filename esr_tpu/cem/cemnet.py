"""CEM — Consistency Enforcing Module, TPU-native (SURVEY.md §2.10/§2.10a).

Behavioral spec from the reference's ``codes/models/modules/CEM/CEMnet.py``:
given downsampling ``y = (x * k) v s`` written as operator ``H``, decompose
signal space into range(H^T) + null(H) and output

    x_out = H^T (H H^T)^{-1} y  +  (I - H^T (H H^T)^{-1} H) . G(y, Z)

so ``H x_out = y`` exactly for any generator output. The reference realizes
``(H H^T)^{-1}`` as a *truncated spatial* inverse filter (FFT-inverted on a
big grid, IFFT'd, truncated) and hides boundary effects with replication
padding.

TPU-first redesign: under circular boundary conditions H is exactly
block-circulant, so ``(H H^T)^{-1}`` is applied *exactly* in the frequency
domain at the actual LR grid size (one fft2/ifft2 pair on the LR grid —
negligible next to the 23-RRDB conv stack, and consistency holds to float
precision at every image size, no truncation error). ``H^T`` is derived by
``jax.linear_transpose`` of the H implementation itself, so the adjoint is
exact by construction (no phase/offset bugs). An optional replicate
pre-padding (``pad_lr``) suppresses wraparound artifacts at the borders like
the reference's padding does. The spatial truncated-filter mode
(``inv_mode='filter'``) is also provided — it is the basis for the fused
Pallas projection kernel.

Everything is a pure jit-able function; the CEM object only carries static
numpy filter constants.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from esr_tpu.cem.kernels import downsample_kernel_2d, lr_autocorrelation

__all__ = ["CEMConf", "CEM", "make_cem"]


@dataclasses.dataclass(frozen=True)
class CEMConf:
    scale: int = 4
    kernel: tuple | None = None  # optional custom 1-D/2-D kernel (nested tuples)
    eps: float = 1e-7  # magnitude floor for the frequency-domain inverse
    pad_lr: int = 0  # replicate pre-padding (LR pixels) to hide wraparound
    inv_mode: str = "auto"  # 'auto' | 'matmul' | 'fft' | 'filter'
    # auto -> 'matmul' for separable kernels (exact + fastest: the whole
    # projection becomes ~6 MXU matmuls, see _axis_matrices), else 'fft'
    inv_filter_support: int = 21  # spatial support (LR px) for 'filter' mode


class CEM:
    """Consistency-Enforcing Module: analytic projection onto {x : Hx = y}."""

    def __init__(self, conf: CEMConf):
        self.conf = conf
        s = int(conf.scale)
        kernel = None if conf.kernel is None else np.asarray(conf.kernel)
        k2d, (rel_h, rel_w) = downsample_kernel_2d(s, kernel)
        self.k2d = jnp.asarray(k2d, dtype=jnp.float32)
        self.rel = (rel_h, rel_w)
        self.scale = s
        q, q_center = lr_autocorrelation(k2d, s)
        self._q = q
        self._q_center = q_center
        self._inv_spatial = None
        if conf.inv_mode == "filter":
            self._inv_spatial = jnp.asarray(
                self.inv_hht_spatial_filter(conf.inv_filter_support)
            )
        # separable fast path: 1-D kernel + phase (bicubic or provided 1-D)
        self._k1 = self._rel1 = None
        if kernel is None:
            from esr_tpu.cem.kernels import bicubic_downsample_kernel_1d

            self._k1, self._rel1 = bicubic_downsample_kernel_1d(s)
        elif kernel.ndim == 1:
            k1 = kernel / kernel.sum()
            self._k1, self._rel1 = k1, -(len(k1) - s) // 2
        self._mode = conf.inv_mode
        if self._mode == "auto":
            self._mode = "matmul" if self._k1 is not None else "fft"
        if self._mode == "matmul" and self._k1 is None:
            raise ValueError("inv_mode='matmul' requires a separable kernel")
        self._mat_cache: dict = {}

    # -- separable matmul realization -------------------------------------

    def _axis_matrices(self, n_lr: int):
        """Per-axis circular operators as dense matrices (cached per size).

        A (n_lr, n_hr): one axis of H.  P = A^T (A A^T)^{-1} (n_hr, n_lr):
        one axis of the consistent upscale. Separability makes this exact:
        H = A_h (x) A_w  =>  H^T (H H^T)^{-1} = P_h (x) P_w. The bicubic
        autocorrelation is superbly conditioned (cond ~ 2), so the small
        dense inverse is exact to f64 — no eps floor, no truncation — and
        the whole projection runs as a handful of MXU matmuls.
        """
        if n_lr in self._mat_cache:
            return self._mat_cache[n_lr]
        s = self.scale
        n_hr = n_lr * s
        a = np.zeros((n_lr, n_hr))
        for j in range(n_lr):
            base = s * j + self._rel1
            for i, kv in enumerate(self._k1):
                a[j, (base + i) % n_hr] += kv
        p = a.T @ np.linalg.inv(a @ a.T)
        # cache host numpy (a jnp constant created inside a jit trace would
        # leak a tracer); einsum lifts these to on-device constants per trace
        mats = (a.astype(np.float32), p.astype(np.float32))
        self._mat_cache[n_lr] = mats
        return mats

    def _matmul_downsample(self, x: jax.Array) -> jax.Array:
        a_h, _ = self._axis_matrices(x.shape[1] // self.scale)
        a_w, _ = self._axis_matrices(x.shape[2] // self.scale)
        hi = jax.lax.Precision.HIGHEST
        y = jnp.einsum("jh,nhwc->njwc", a_h, x.astype(jnp.float32), precision=hi)
        return jnp.einsum("kw,njwc->njkc", a_w, y, precision=hi)

    def _matmul_upscale(self, y: jax.Array) -> jax.Array:
        """P_h (x) P_w: the consistent (DT-satisfying) upscale."""
        _, p_h = self._axis_matrices(y.shape[1])
        _, p_w = self._axis_matrices(y.shape[2])
        hi = jax.lax.Precision.HIGHEST
        x = jnp.einsum("pj,njkc->npkc", p_h, y.astype(jnp.float32), precision=hi)
        return jnp.einsum("qk,npkc->npqc", p_w, x, precision=hi)

    # -- H ----------------------------------------------------------------

    def downsample(self, x: jax.Array) -> jax.Array:
        """H: (N, s*h, s*w, C) -> (N, h, w, C), circular boundary.

        y[j] = sum_i x[(j*s + rel + i) mod n] k[i] per axis — the stationary
        form of MATLAB-bicubic downscaling (esr_tpu.ops.resize semantics).
        In matmul mode this is two per-axis MXU contractions; the depthwise
        conv realization below serves the non-separable modes (numerically
        identical — tested).
        """
        if self._mode == "matmul":
            return self._matmul_downsample(x).astype(x.dtype)
        s = self.scale
        kh, kw = self.k2d.shape
        rel_h, rel_w = self.rel
        pl_h, pr_h = max(0, -rel_h), max(0, rel_h + kh - s)
        pl_w, pr_w = max(0, -rel_w), max(0, rel_w + kw - s)
        x = jnp.pad(x, ((0, 0), (pl_h, pr_h), (pl_w, pr_w), (0, 0)), mode="wrap")
        c = x.shape[-1]
        kern = jnp.tile(self.k2d[:, :, None, None], (1, 1, 1, c)).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            x,
            kern,
            window_strides=(s, s),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,  # consistency gates on f32
        )

    def upsample_transpose(self, y: jax.Array, hr_shape: tuple) -> jax.Array:
        """H^T: exact adjoint of :meth:`downsample`, via linear_transpose."""
        f = jax.linear_transpose(
            self.downsample, jax.ShapeDtypeStruct(hr_shape, y.dtype)
        )
        (x,) = f(y)
        return x

    # -- (H H^T)^{-1} ------------------------------------------------------

    def _q_freq(self, h: int, w: int) -> jax.Array:
        """FFT of the LR autocorrelation kernel embedded on an (h, w) grid."""
        q = np.zeros((h, w))
        qh, qw = self._q.shape
        ch, cw = self._q_center
        for i in range(qh):
            for j in range(qw):
                q[(i - ch) % h, (j - cw) % w] += self._q[i, j]
        return jnp.asarray(np.fft.fft2(q))

    def apply_inv_hht(self, y: jax.Array) -> jax.Array:
        """(H H^T)^{-1} y on the LR grid.

        inv_mode='fft': exact circular inverse (eps floor). inv_mode='filter':
        truncated spatial inverse filter as a depthwise conv (the reference's
        realization) — all-conv hot path, small truncation error bounded by
        ``inv_filter_support``.
        """
        if self._inv_spatial is not None:
            r = self._inv_spatial.shape[0] // 2
            yp = jnp.pad(y, ((0, 0), (r, r), (r, r), (0, 0)), mode="wrap")
            c = y.shape[-1]
            kern = jnp.tile(self._inv_spatial[:, :, None, None], (1, 1, 1, c)).astype(
                y.dtype
            )
            return jax.lax.conv_general_dilated(
                yp,
                kern,
                (1, 1),
                "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
                precision=jax.lax.Precision.HIGHEST,
            )
        h, w = y.shape[-3], y.shape[-2]
        fq = self._q_freq(h, w)
        # eps floor on magnitude to avoid division blowup (reference mechanism)
        mag = jnp.abs(fq)
        fq_safe = jnp.where(mag < self.conf.eps, self.conf.eps, mag) * jnp.exp(
            1j * jnp.angle(fq)
        )
        yf = jnp.fft.fft2(y.astype(jnp.float32), axes=(-3, -2))
        out = jnp.fft.ifft2(yf / fq_safe[None, :, :, None], axes=(-3, -2))
        return jnp.real(out).astype(y.dtype)

    def inv_hht_spatial_filter(self, support: int | None = None) -> np.ndarray:
        """Truncated spatial inverse filter (the reference's realization;
        feeds the fused Pallas projection kernel)."""
        support = support or self.conf.inv_filter_support
        n = 4 * support  # large grid for the inversion
        q = np.zeros((n, n))
        qh, qw = self._q.shape
        ch, cw = self._q_center
        for i in range(qh):
            for j in range(qw):
                q[(i - ch) % n, (j - cw) % n] += self._q[i, j]
        fq = np.fft.fft2(q)
        mag = np.abs(fq)
        fq_safe = np.where(mag < self.conf.eps, self.conf.eps, mag) * np.exp(
            1j * np.angle(fq)
        )
        inv = np.real(np.fft.ifft2(1.0 / fq_safe))
        inv = np.fft.fftshift(inv)
        c = n // 2
        r = support // 2
        return inv[c - r : c + r + 1, c - r : c + r + 1].astype(np.float32)

    # -- public CEM ops (reference API surface, SURVEY.md §2.10a) ----------

    def dt_satisfying_upscale(self, lr: jax.Array) -> jax.Array:
        """H^+ y = H^T (H H^T)^{-1} y — the consistent low-frequency upscale."""
        if self._mode == "matmul":
            return self._matmul_upscale(lr).astype(lr.dtype)
        n, h, w, c = lr.shape
        hr_shape = (n, h * self.scale, w * self.scale, c)
        return self.upsample_transpose(self.apply_inv_hht(lr), hr_shape)

    def project(self, raw_hr: jax.Array, lr: jax.Array) -> jax.Array:
        """LF(lr) + null-space projection of raw_hr; H(result) == lr."""
        raw32 = raw_hr.astype(jnp.float32)
        if self._mode == "matmul":
            residual = lr.astype(jnp.float32) - self._matmul_downsample(raw32)
            return raw_hr + self._matmul_upscale(residual).astype(raw_hr.dtype)
        residual = lr.astype(jnp.float32) - self.downsample(raw32)
        n, h, w, c = lr.shape
        hr_shape = (n, h * self.scale, w * self.scale, c)
        correction = self.upsample_transpose(self.apply_inv_hht(residual), hr_shape)
        return raw_hr + correction.astype(raw_hr.dtype)

    def enforce_dt_on_image_pair(self, lr: jax.Array, hr: jax.Array) -> jax.Array:
        """Project an arbitrary HR image to exact consistency with lr (used to
        pre-consistent-ize ground truth before the discriminator sees it)."""
        return self.project(hr, lr)

    def wrap(self, apply_fn):
        """WrapArchitecture: generator apply -> consistency-projected apply.

        ``apply_fn(params, lr, z) -> raw_hr`` becomes
        ``wrapped(params, lr, z) -> projected_hr``; if ``pad_lr`` is set the
        LR (and Z) inputs are replicate-padded first and the result cropped,
        hiding circular-wraparound at the borders (reference padding policy).
        """
        pad = int(self.conf.pad_lr)
        s = self.scale

        def wrapped(params, lr, z=None):
            if pad:
                lr_p = jnp.pad(lr, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
                z_p = (
                    jnp.pad(z, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
                    if z is not None
                    else None
                )
            else:
                lr_p, z_p = lr, z
            raw = apply_fn(params, lr_p, z_p)
            out = self.project(raw, lr_p)
            if pad:
                out = out[:, pad * s : -pad * s, pad * s : -pad * s, :]
            return out

        return wrapped


def make_cem(conf: CEMConf | None = None, **kwargs) -> CEM:
    return CEM(conf or CEMConf(**kwargs))
