"""KernelGAN-style blind kernel estimation (esr_tpu/cem/kernelgan.py).

The linchpin is `effective_kernel`: if the extracted impulse response
exactly reproduces the linear G, then the regularizers act on the true
kernel and whatever the GAN converges to IS the returned kernel. The
supervised-recovery test then validates the whole optimization stack
deterministically (GAN equilibrium quality is image-dependent; the
adversarial path gets a convergence smoke, not a guarantee)."""

import numpy as np
import pytest

from esr_tpu.cem.kernelgan import (
    KernelGANConf,
    LinearKernelG,
    effective_kernel,
    estimate_kernel,
)

TINY = KernelGANConf(
    scale=4,
    g_kernels=(7, 5, 3, 1),  # support 13
    g_channels=16,
    d_kernels=(5, 1, 1),
    d_channels=16,
    g_input=32,
    iters=100,
)


def _gaussian_kernel(sup=13, sx=2.4, sy=1.4, theta=0.5):
    """Anisotropic, rotated gaussian — a typical real-world SR kernel."""
    idx = np.arange(sup) - (sup - 1) / 2.0
    yy, xx = np.meshgrid(idx, idx, indexing="ij")
    c, s = np.cos(theta), np.sin(theta)
    u, v = c * xx + s * yy, -s * xx + c * yy
    k = np.exp(-0.5 * ((u / sx) ** 2 + (v / sy) ** 2))
    return k / k.sum()


@pytest.mark.slow
def test_effective_kernel_is_exact():
    """G(x, stride=False) — a stack of VALID convs — must equal the single
    VALID correlation with the extracted kernel EVERYWHERE (no borders to
    exclude: every VALID output pixel is a clean window of the input), and
    the strided G output is exactly its phase-0 subsample. The centered
    SAME oracle's output at position i+sup//2 is the VALID output at i."""
    import jax
    import jax.numpy as jnp

    g = LinearKernelG(TINY)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 64, 64, 1)), jnp.float32)
    params = g.init(jax.random.PRNGKey(1), x)["params"]
    k = effective_kernel(g, params, TINY)
    assert k.shape == (13, 13)

    flat = np.asarray(g.apply({"params": params}, x, stride=False))
    want = np.asarray(
        jax.lax.conv_general_dilated(
            x,
            jnp.asarray(k)[:, :, None, None],
            (1, 1),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    assert flat.shape == want.shape == (1, 52, 52, 1)
    np.testing.assert_allclose(flat, want, atol=1e-5)

    strided = np.asarray(g.apply({"params": params}, x))
    s = TINY.scale
    np.testing.assert_array_equal(strided, flat[:, ::s, ::s])


def _aligned_corr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak normalized cross-correlation over all shifts (the estimate may
    sit a pixel or two off-center — the subsample phase is a gauge freedom)."""
    from numpy.fft import fft2, ifft2

    n = a.shape[0] + b.shape[0]
    fa = fft2(a - a.mean(), (n, n))
    fb = fft2(b - b.mean(), (n, n))
    xc = np.real(ifft2(fa * np.conj(fb)))
    denom = np.linalg.norm(a - a.mean()) * np.linalg.norm(b - b.mean())
    return float(xc.max() / (denom + 1e-12))


def test_supervised_recovery():
    """With the adversarial term replaced by L2 against the TRUE-kernel
    downsample (loss_override hook), the estimator must recover the kernel —
    this pins the whole optimization stack (extraction, regularizers, scan
    loop, Adam) with no GAN nondeterminism."""
    import jax
    import jax.numpy as jnp

    k_true = _gaussian_kernel()
    rng = np.random.default_rng(2)
    img = rng.random((96, 96)).astype(np.float32)

    kt = jnp.asarray(k_true, jnp.float32)[:, :, None, None]

    def oracle_down(x):
        # phase-aligned with VALID LinearKernelG: G's fake[j] is the window
        # anchored at j*s, i.e. the CENTERED correlation at j*s + sup//2 —
        # slice the SAME oracle on that offset grid (all windows interior)
        full = jax.lax.conv_general_dilated(
            x, kt, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        off = k_true.shape[0] // 2
        return full[:, off::4, off::4]

    def loss_override(fake, g_in):
        o = oracle_down(g_in)[:, : fake.shape[1], : fake.shape[2]]
        return jnp.mean((fake - o) ** 2)

    # Regularizers are deliberately weakened here: with a perfectly
    # informative supervised data term they only BIAS the solution (at the
    # default weights recovery plateaus at corr~0.81 — measured), whereas
    # this test pins the optimization stack, not the prior.
    conf = KernelGANConf(
        scale=4, g_kernels=(7, 5, 3, 1), g_channels=16, d_kernels=(5, 1, 1),
        d_channels=16, g_input=32, iters=1000, lr_g=2e-3,
        w_centralized=0.1, w_boundaries=0.1,
    )
    k_est, metrics = estimate_kernel(img, conf, loss_override=loss_override)
    assert abs(k_est.sum() - 1.0) < 1e-6  # normalized output contract
    corr = _aligned_corr(k_est, k_true)  # 0.9146 measured at this exact conf/seed
    assert corr > 0.88, (corr, metrics)


@pytest.mark.slow
def test_gan_path_smoke():
    """Full adversarial path on a noise texture: losses stay finite, the
    returned kernel is normalized and centered-ish (COM regularizer active)."""
    k_true = _gaussian_kernel(sx=1.8, sy=1.8, theta=0.0)
    rng = np.random.default_rng(3)
    hr = rng.random((256, 256)).astype(np.float32)
    # LR made with the true kernel (valid-ish via FFT circular conv + ::4)
    from numpy.fft import fft2, ifft2

    kp = np.zeros_like(hr)
    s = k_true.shape[0]
    kp[:s, :s] = k_true
    kp = np.roll(kp, (-(s // 2), -(s // 2)), axis=(0, 1))
    lr = np.real(ifft2(fft2(hr) * fft2(kp)))[::4, ::4].astype(np.float32)

    k_est, metrics = estimate_kernel(lr, TINY)
    assert np.isfinite(list(metrics.values())).all(), metrics
    assert abs(k_est.sum() - 1.0) < 1e-6
    idx = np.arange(k_est.shape[0])
    mass = np.abs(k_est).sum()
    com_h = (np.abs(k_est).sum(1) * idx).sum() / mass
    com_w = (np.abs(k_est).sum(0) * idx).sum() / mass
    center = (k_est.shape[0] - 1) / 2
    assert abs(com_h - center) < 2.5 and abs(com_w - center) < 2.5


def test_estimated_kernel_drives_cem(tmp_path):
    """Plumbing: saved .npy estimate -> resolve_kernel -> CEM projection is
    exactly consistent under the ESTIMATED kernel (blind-SR loop closes)."""
    import jax.numpy as jnp

    from esr_tpu.cem import CEMConf, make_cem
    from esr_tpu.cem.kernels import resolve_kernel

    k = _gaussian_kernel(sup=9, sx=1.5, sy=1.0, theta=0.3)
    path = str(tmp_path / "kernel_x4.npy")
    np.save(path, k)
    cem = make_cem(CEMConf(scale=4, kernel=resolve_kernel(path)))
    rng = np.random.default_rng(4)
    lr = jnp.asarray(rng.random((1, 12, 12, 3)), jnp.float32)
    raw = jnp.asarray(rng.random((1, 48, 48, 3)), jnp.float32)
    out = cem.project(raw, lr)
    res = float(jnp.abs(cem.downsample(out) - lr).max())
    assert res < 1e-4, res


def test_image_too_small_raises():
    with pytest.raises(ValueError, match="smaller than g_input"):
        estimate_kernel(np.zeros((16, 16)), TINY)


@pytest.mark.slow
def test_cli(tmp_path):
    from esr_tpu.scripts.estimate_kernel import main

    rng = np.random.default_rng(5)
    img = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
    from PIL import Image

    p = str(tmp_path / "lr.png")
    Image.fromarray(img).save(p)
    out = str(tmp_path / "k.npy")
    # g_input 48: VALID support 21 leaves 28px -> 7px LR fakes = D's receptive
    main(["--lr", p, "--scale", "4", "--iters", "20", "--g_input", "48", "--out", out])
    k = np.load(out)
    assert k.ndim == 2 and abs(k.sum() - 1.0) < 1e-6


def test_conf_for_image_sizing():
    from esr_tpu.cem.kernelgan import conf_for_image

    assert conf_for_image((100, 100), 4).g_input == 64
    c = conf_for_image((50, 60), 4)
    assert c.g_input == 48  # support-1 + scale*d_receptive at defaults
    with pytest.raises(ValueError, match="too small"):
        conf_for_image((40, 40), 4)
