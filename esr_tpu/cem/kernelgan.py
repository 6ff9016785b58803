"""Blind-SR downsampling-kernel estimation (KernelGAN-style), TPU-native.

The reference consumes externally-estimated kernels ("e.g. from KernelGAN" —
SURVEY.md §2.10a; `resolve_kernel` reads its ``kernel_x4.mat``) but ships no
estimator. This module closes the blind-SR loop in-framework: estimate the
kernel from the LR image itself, write it where the existing
``opt['kernel']`` -> CEM path picks it up.

Method (Bell-Kligler et al., "Blind Super-Resolution Kernel Estimation using
an Internal-GAN", NeurIPS 2019 — PAPERS.md lineage; reconstructed from the
public paper, no reference code involved):

- **G is a deep LINEAR conv net** (no bias, no nonlinearity, VALID padding
  as in the paper) ending in an s-stride subsample, so whatever it learns
  IS a single stationary downsampling kernel — its impulse response — and
  its outputs carry no padding artifacts D could key on.
- **D is a small fully-convolutional patch discriminator** trained to tell
  real LR patches from G-downscaled larger LR crops. The internal patch
  recurrence of natural images makes the correct kernel the equilibrium.
- **Kernel regularizers** act on the explicit impulse response: sum-to-1,
  boundary energy penalty, center-of-mass centering, optional sparsity.

TPU-first shape: the whole optimization is ``lax.scan`` chunks of jitted
G/D steps — random crops via ``dynamic_slice`` inside the program, zero
host round-trips per iteration (the torch original dispatches per step).

Deviations from the paper (documented, honest): LSGAN patch loss instead of
the paper's spectral-norm WGAN-ish loss (stabler small-scale, no SN needed);
one stride-s stage for any scale (the paper composes x2 twice for x4);
regularizer weights are reconstructed, not copied.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "KernelGANConf",
    "LinearKernelG",
    "PatchD",
    "conf_for_image",
    "effective_kernel",
    "estimate_kernel",
]


@dataclasses.dataclass(frozen=True)
class KernelGANConf:
    scale: int = 4
    g_kernels: tuple = (9, 7, 5, 3, 1, 1)  # support = sum(k-1)+1 = 21
    g_channels: int = 64
    d_kernels: tuple = (7, 1, 1, 1, 1)
    d_channels: int = 64
    g_input: int = 64  # G crop (LR px); D patches are _fake_size(conf) px
    lr_g: float = 2e-3
    lr_d: float = 2e-3
    iters: int = 2000
    # regularizer weights (reconstructed — see module docstring)
    w_sum2one: float = 0.5
    w_boundaries: float = 0.5
    w_centralized: float = 1.0
    w_sparse: float = 0.0
    seed: int = 0


class LinearKernelG(nn.Module):
    """Deep linear generator: stride-1 no-bias VALID convs, then ::s
    subsample. Linearity means G == one stationary kernel; depth only shapes
    the optimization landscape (implicit regularization, per the paper).
    VALID padding (as in the paper) means the output carries NO zero-pad
    border contamination — every output pixel is a clean window of the
    input, so the discriminator never sees a padding artifact it could use
    as a real/fake tell."""

    conf: KernelGANConf

    @nn.compact
    def __call__(self, x, stride: bool = True):
        c = self.conf
        for i, k in enumerate(c.g_kernels):
            feats = 1 if i == len(c.g_kernels) - 1 else c.g_channels
            x = nn.Conv(
                feats, (k, k), padding="VALID", use_bias=False,
                param_dtype=jnp.float32, name=f"conv{i}",
            )(x)
        if stride:
            s = c.scale
            x = x[:, ::s, ::s, :]
        return x


class PatchD(nn.Module):
    """Fully-convolutional patch discriminator -> per-pixel logit map."""

    conf: KernelGANConf

    @nn.compact
    def __call__(self, x):
        c = self.conf
        for i, k in enumerate(c.d_kernels):
            last = i == len(c.d_kernels) - 1
            x = nn.Conv(
                1 if last else c.d_channels, (k, k), padding="VALID",
                param_dtype=jnp.float32, name=f"conv{i}",
            )(x)
            if not last:
                x = nn.leaky_relu(x, negative_slope=0.2)
        return x


def _support(conf: KernelGANConf) -> int:
    return sum(k - 1 for k in conf.g_kernels) + 1


def _d_receptive(conf: KernelGANConf) -> int:
    return sum(k - 1 for k in conf.d_kernels) + 1


def _fake_size(conf: KernelGANConf) -> int:
    """LR-domain patch size G produces from a ``g_input`` crop: VALID convs
    shrink by support-1, then ::s keeps ceil(L/s) samples. Real crops are
    drawn at exactly this size, so D compares equal spatial supports for ANY
    scale (no divisibility requirement)."""
    flat = conf.g_input - _support(conf) + 1
    return -(-flat // conf.scale)


def effective_kernel(g_module: LinearKernelG, g_params, conf: KernelGANConf):
    """The impulse response of the (stride-less) linear G as an explicit
    (support, support) kernel, in CORRELATION convention — i.e.
    ``G(x, stride=False)[i] == sum_t k[t] * x[i + t]`` (VALID windows), so
    downstream consumers (CEM's ``conv_general_dilated``, the data
    pipeline) can use it directly. A centered delta probe returns the
    FLIPPED kernel under cross-correlation, hence the final flip; the
    algebra is pinned by ``test_effective_kernel_is_exact``."""
    sup = _support(conf)
    n = 2 * sup - 1  # VALID response to a centered delta is exactly (sup, sup)
    delta = jnp.zeros((1, n, n, 1)).at[0, n // 2, n // 2, 0].set(1.0)
    k = g_module.apply({"params": g_params}, delta, stride=False)[0, :, :, 0]
    return k[::-1, ::-1]


def _kernel_regularizers(k: jax.Array, conf: KernelGANConf) -> jax.Array:
    sup = k.shape[0]
    idx = jnp.arange(sup, dtype=jnp.float32)
    center = (sup - 1) / 2.0
    # boundary mask: grows quadratically away from the center (penalize
    # energy far out; keeps the effective support compact)
    d2 = ((idx - center) ** 2)[:, None] + ((idx - center) ** 2)[None, :]
    boundary_mask = d2 / d2.max()
    loss = conf.w_sum2one * jnp.abs(1.0 - jnp.sum(k))
    loss += conf.w_boundaries * jnp.sum(jnp.abs(k) * boundary_mask)
    if conf.w_centralized:
        mass = jnp.sum(jnp.abs(k)) + 1e-8
        com_h = jnp.sum(jnp.abs(k) * idx[:, None]) / mass
        com_w = jnp.sum(jnp.abs(k) * idx[None, :]) / mass
        loss += conf.w_centralized * ((com_h - center) ** 2 + (com_w - center) ** 2)
    if conf.w_sparse:
        loss += conf.w_sparse * jnp.mean(jnp.sqrt(jnp.abs(k) + 1e-8))
    return loss


def _lsgan(logits: jax.Array, target: float) -> jax.Array:
    return jnp.mean((logits - target) ** 2)


def _rand_crop(img, rng, size: int):
    """dynamic_slice random crop of a (H, W, 1) image -> (1, size, size, 1)."""
    h, w = img.shape[0], img.shape[1]
    rh, rw = jax.random.split(rng)
    oy = jax.random.randint(rh, (), 0, h - size + 1)
    ox = jax.random.randint(rw, (), 0, w - size + 1)
    return jax.lax.dynamic_slice(img, (oy, ox, 0), (size, size, 1))[None]


def make_kernelgan_step(g_module, d_module, conf: KernelGANConf):
    """One (G update, D update) iteration as a pure function
    ``(g_state, d_state, img, rng) -> (g_state', d_state', metrics)``.
    Fake patches are VALID-conv products (no pad artifacts); real crops are
    drawn at the same size so D compares like with like."""

    def step(g_state, d_state, img, rng):
        rng_real, rng_fake = jax.random.split(rng)
        g_in = _rand_crop(img, rng_fake, conf.g_input)
        real = _rand_crop(img, rng_real, _fake_size(conf))

        def g_loss_fn(g_params):
            fake = g_module.apply({"params": g_params}, g_in)
            adv = _lsgan(d_module.apply({"params": d_state.params}, fake), 1.0)
            k = effective_kernel(g_module, g_params, conf)
            reg = _kernel_regularizers(k, conf)
            return adv + reg, (fake, adv, reg)

        (l_g, (fake, adv, reg)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_state.params)
        g_state = g_state.apply_gradients(grads=g_grads)
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            lr_real = d_module.apply({"params": d_params}, real)
            lr_fake = d_module.apply({"params": d_params}, fake_sg)
            return (_lsgan(lr_real, 1.0) + _lsgan(lr_fake, 0.0)) / 2.0

        l_d, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
        d_state = d_state.apply_gradients(grads=d_grads)
        return g_state, d_state, {"l_g": l_g, "l_d": l_d, "adv": adv, "reg": reg}

    return step


def conf_for_image(
    shape, scale: int = 4, iters: int = 2000, seed: int = 0
) -> KernelGANConf:
    """A KernelGANConf sized to the image: g_input 64 when it fits, else a
    compact crop (48 at the default architecture) whose VALID-conv fakes
    still cover D's receptive field. Raises for images below that."""
    m = min(int(shape[0]), int(shape[1]))
    base = KernelGANConf(scale=scale, iters=iters, seed=seed)
    need = _support(base) - 1 + scale * _d_receptive(base)  # = 48 at defaults
    if m >= base.g_input:
        return base
    if m >= need:
        return dataclasses.replace(base, g_input=need)
    raise ValueError(
        f"image {tuple(shape[:2])} too small for kernel estimation "
        f"(needs >= {need}px on the short side at the default architecture)"
    )


def estimate_kernel(
    lr_image: np.ndarray,
    conf: KernelGANConf | None = None,
    progress=None,
    loss_override=None,
) -> tuple[np.ndarray, dict]:
    """Estimate the downsampling kernel of ``lr_image`` (HWC or HW float
    [0,1]). Returns ``(kernel, metrics)``: a unit-sum (support, support)
    float64 kernel ready for ``opt['kernel']`` / ``CEMConf(kernel=...)``,
    and the last chunk's loss scalars.

    The estimator runs on the image's luminance (one channel — the kernel is
    shared across RGB, as in the paper). ``lax.scan`` chunks of 100 iters
    keep it one dispatch per chunk; ``progress(done, total, metrics)`` is
    called between chunks. ``loss_override(fake, g_in)`` replaces the
    adversarial term (testing hook: a supervised L2-to-oracle turns the GAN
    into a deterministic inverse problem)."""
    import optax
    from flax.training.train_state import TrainState

    conf = conf or KernelGANConf()
    img = np.asarray(lr_image, np.float32)
    if img.ndim == 3:
        img = img.mean(axis=-1)  # luminance-ish; kernel is color-agnostic
    if min(img.shape) < conf.g_input:
        raise ValueError(
            f"image {img.shape} smaller than g_input {conf.g_input}; "
            "shrink KernelGANConf.g_input"
        )
    if conf.g_input < _support(conf):
        raise ValueError(
            f"g_input {conf.g_input} smaller than the composite G support "
            f"{_support(conf)}; enlarge g_input or shrink g_kernels"
        )
    img = jnp.asarray(img[..., None])

    g_module = LinearKernelG(conf)
    rng = jax.random.PRNGKey(conf.seed)
    r_g, r_d, r_train = jax.random.split(rng, 3)
    probe = jnp.zeros((1, conf.g_input, conf.g_input, 1))
    g_params = g_module.init(r_g, probe)["params"]
    g_state = TrainState.create(
        apply_fn=g_module.apply, params=g_params, tx=optax.adam(conf.lr_g, b1=0.5)
    )

    if loss_override is not None:
        # supervised/test path: D plays no role — skip its init entirely and
        # carry an empty pytree through the scan
        d_state = None
        step = _override_step(g_module, conf, loss_override)
    else:
        if _fake_size(conf) < _d_receptive(conf):
            raise ValueError(
                f"G produces {_fake_size(conf)}px LR patches from g_input "
                f"{conf.g_input} (VALID support {_support(conf)}, scale "
                f"{conf.scale}) but D's receptive field is {_d_receptive(conf)}px;"
                " enlarge g_input or shrink d_kernels"
            )
        d_module = PatchD(conf)
        d_probe = jnp.zeros((1, _fake_size(conf), _fake_size(conf), 1))
        d_params = d_module.init(r_d, d_probe)["params"]
        d_state = TrainState.create(
            apply_fn=d_module.apply, params=d_params, tx=optax.adam(conf.lr_d, b1=0.5)
        )
        step = make_kernelgan_step(g_module, d_module, conf)

    @partial(jax.jit, donate_argnums=(0, 1), static_argnums=(3,))
    def chunk_fn(g_state, d_state, rng0, n_chunk):
        def body(carry, i):
            g, d = carry
            g, d, m = step(g, d, img, jax.random.fold_in(rng0, i))
            return (g, d), m

        (g_state, d_state), ms = jax.lax.scan(
            body, (g_state, d_state), jnp.arange(n_chunk)
        )
        return g_state, d_state, jax.tree.map(lambda x: x[-1], ms)

    chunk = 100
    metrics = {}
    for lo in range(0, conf.iters, chunk):
        n = min(chunk, conf.iters - lo)
        g_state, d_state, metrics = chunk_fn(
            g_state, d_state, jax.random.fold_in(r_train, lo), n
        )
        if progress is not None:
            progress(lo + n, conf.iters, {k: float(v) for k, v in metrics.items()})

    k = np.asarray(effective_kernel(g_module, g_state.params, conf), np.float64)
    if k.sum() <= 1e-8:  # pathological sign/degenerate guard — keep normalizable
        k = np.abs(k)
    k = k / k.sum()
    return k, {key: float(v) for key, v in metrics.items()}


def _override_step(g_module, conf: KernelGANConf, loss_override):
    """Testing/supervised variant of the step: the adversarial term is
    replaced by ``loss_override(fake, g_in)``; D is untouched."""

    def step(g_state, d_state, img, rng):
        _, rng_fake = jax.random.split(rng)
        g_in = _rand_crop(img, rng_fake, conf.g_input)

        def g_loss_fn(g_params):
            fake = g_module.apply({"params": g_params}, g_in)
            main = loss_override(fake, g_in)
            k = effective_kernel(g_module, g_params, conf)
            reg = _kernel_regularizers(k, conf)
            return main + reg, (main, reg)

        (l_g, (main, reg)), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            g_state.params
        )
        g_state = g_state.apply_gradients(grads=g_grads)
        return g_state, d_state, {"l_g": l_g, "l_d": jnp.float32(0.0), "adv": main, "reg": reg}

    return step
