"""CEM correctness tests (SURVEY.md §4 'implications' + §2.10a invariants).

The module is self-testing by construction: downsampling the projected output
must reproduce the LR input to float precision.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from esr_tpu.cem import CEMConf, make_cem
from esr_tpu.ops.resize import imresize_np


@pytest.fixture(scope="module")
def cem4():
    return make_cem(CEMConf(scale=4))


def test_downsample_matches_imresize_interior(cem4):
    """H equals MATLAB-bicubic 1/4 downscale away from the (circular vs
    symmetric) boundary."""
    rng = np.random.default_rng(0)
    hr = rng.random((1, 64, 64, 3)).astype(np.float32)
    lr_cem = np.asarray(cem4.downsample(jnp.asarray(hr)))[0]
    lr_ref = imresize_np(hr[0], scale=0.25)
    np.testing.assert_allclose(lr_cem[3:-3, 3:-3], lr_ref[3:-3, 3:-3], atol=1e-5)


def test_adjointness(cem4):
    """<Hx, y> == <x, H^T y> — H^T is the exact adjoint."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 32, 32, 1)).astype(np.float32))
    y = jnp.asarray(rng.random((1, 8, 8, 1)).astype(np.float32))
    hx = cem4.downsample(x)
    hty = cem4.upsample_transpose(y, x.shape)
    a = float(jnp.vdot(hx, y))
    b = float(jnp.vdot(x, hty))
    assert abs(a - b) < 1e-4 * max(1.0, abs(a))


def test_consistency_invariant(cem4):
    """H(project(g, lr)) == lr for arbitrary generator output g."""
    rng = np.random.default_rng(2)
    lr = jnp.asarray(rng.random((2, 12, 12, 3)).astype(np.float32))
    g = jnp.asarray(rng.random((2, 48, 48, 3)).astype(np.float32) * 3 - 1)
    out = cem4.project(g, lr)
    err = np.abs(np.asarray(cem4.downsample(out)) - np.asarray(lr)).max()
    assert err < 5e-5, err


def test_lf_term_consistency(cem4):
    """H(H^+ lr) == lr — the DT-satisfying upscale is itself consistent."""
    rng = np.random.default_rng(3)
    lr = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    lf = cem4.dt_satisfying_upscale(lr)
    err = np.abs(np.asarray(cem4.downsample(lf)) - np.asarray(lr)).max()
    assert err < 5e-5, err


def test_projection_idempotent(cem4):
    rng = np.random.default_rng(4)
    lr = jnp.asarray(rng.random((1, 12, 12, 1)).astype(np.float32))
    g = jnp.asarray(rng.random((1, 48, 48, 1)).astype(np.float32))
    once = cem4.project(g, lr)
    twice = cem4.project(once, lr)
    np.testing.assert_allclose(np.asarray(once), np.asarray(twice), atol=5e-5)


def test_consistent_input_passthrough(cem4):
    """If g is already consistent with lr, projection changes (almost) nothing."""
    rng = np.random.default_rng(5)
    g = jnp.asarray(rng.random((1, 48, 48, 1)).astype(np.float32))
    lr = cem4.downsample(g)
    out = cem4.project(g, lr)
    np.testing.assert_allclose(np.asarray(out), np.asarray(g), atol=5e-5)


def test_enforce_dt_on_image_pair(cem4):
    rng = np.random.default_rng(6)
    hr = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    lr = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    fixed = cem4.enforce_dt_on_image_pair(lr, hr)
    err = np.abs(np.asarray(cem4.downsample(fixed)) - np.asarray(lr)).max()
    assert err < 5e-5


def test_custom_kernel():
    """CEM with a provided (e.g. estimated) blur kernel keeps the invariant."""
    g1 = np.exp(-0.5 * (np.arange(9) - 4.0) ** 2 / 2.0**2)
    kern = np.outer(g1, g1)
    kern /= kern.sum()
    cem = make_cem(CEMConf(scale=4, kernel=tuple(map(tuple, kern))))
    rng = np.random.default_rng(7)
    lr = jnp.asarray(rng.random((1, 10, 10, 1)).astype(np.float32))
    g = jnp.asarray(rng.random((1, 40, 40, 1)).astype(np.float32))
    out = cem.project(g, lr)
    err = np.abs(np.asarray(cem.downsample(out)) - np.asarray(lr)).max()
    assert err < 5e-5


def test_wrap_and_padding(cem4):
    """wrap(apply_fn) yields a consistent forward; pad_lr crops correctly."""

    def fake_g(params, lr, z):
        up = jnp.repeat(jnp.repeat(lr, 4, axis=1), 4, axis=2)
        return up + 0.1

    rng = np.random.default_rng(8)
    lr = jnp.asarray(rng.random((1, 12, 12, 3)).astype(np.float32))
    wrapped = cem4.wrap(fake_g)
    out = wrapped(None, lr, None)
    assert out.shape == (1, 48, 48, 3)
    err = np.abs(np.asarray(cem4.downsample(out)) - np.asarray(lr)).max()
    assert err < 5e-5

    cem_pad = make_cem(CEMConf(scale=4, pad_lr=2))
    out_p = cem_pad.wrap(fake_g)(None, lr, None)
    assert out_p.shape == (1, 48, 48, 3)
    # interior consistency for the padded variant
    lr_back = np.asarray(cem4.downsample(out_p))
    np.testing.assert_allclose(lr_back[0, 2:-2, 2:-2], np.asarray(lr)[0, 2:-2, 2:-2], atol=1e-4)


def test_spatial_inverse_filter_mode(cem4):
    """Truncated spatial inverse filter approximates the exact inverse."""
    filt = cem4.inv_hht_spatial_filter(support=21)
    assert filt.shape == (21, 21)
    rng = np.random.default_rng(9)
    lr = jnp.asarray(rng.random((1, 24, 24, 1)).astype(np.float32))
    exact = np.asarray(cem4.apply_inv_hht(lr))
    kern = jnp.asarray(filt)[:, :, None, None]
    approx = jax.lax.conv_general_dilated(
        jnp.pad(lr, ((0, 0), (10, 10), (10, 10), (0, 0)), mode="wrap"),
        kern,
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    rel = np.abs(np.asarray(approx) - exact).max() / (np.abs(exact).max() + 1e-9)
    assert rel < 0.05, rel


def test_filter_inv_mode_end_to_end():
    """inv_mode='filter' (all-conv hot path) approximates the exact FFT mode:
    consistency residual bounded by the truncation, improving with support."""
    rng = np.random.default_rng(10)
    lr = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    g = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    residuals = {}
    for support in (13, 33):
        cem_f = make_cem(CEMConf(scale=4, inv_mode="filter", inv_filter_support=support))
        out = cem_f.project(g, lr)
        residuals[support] = float(np.abs(np.asarray(cem_f.downsample(out)) - np.asarray(lr)).max())
    assert residuals[33] < residuals[13]
    assert residuals[33] < 2e-3, residuals


def test_matmul_mode_matches_fft_mode():
    """Default separable 'matmul' realization == the exact FFT realization,
    and the conv downsample == the matmul downsample."""
    rng = np.random.default_rng(11)
    lr = jnp.asarray(rng.random((2, 12, 12, 3)).astype(np.float32))
    g = jnp.asarray(rng.random((2, 48, 48, 3)).astype(np.float32))
    cem_m = make_cem(CEMConf(scale=4))  # auto -> matmul
    cem_f = make_cem(CEMConf(scale=4, inv_mode="fft"))
    assert cem_m._mode == "matmul"
    np.testing.assert_allclose(
        np.asarray(cem_m.downsample(g)), np.asarray(cem_f.downsample(g)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cem_m.project(g, lr)), np.asarray(cem_f.project(g, lr)), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(cem_m.dt_satisfying_upscale(lr)),
        np.asarray(cem_f.dt_satisfying_upscale(lr)),
        atol=2e-4,
    )
    # matmul-mode consistency is at least as tight as fft's
    out = cem_m.project(g, lr)
    err = np.abs(np.asarray(cem_m.downsample(out)) - np.asarray(lr)).max()
    assert err < 5e-6, err


def test_resolve_kernel_forms(tmp_path):
    """Top-level 'kernel' opt forms: inline list, numpy array (options.parse
    keeps numpy leaves — plain truthiness on one raises), and KernelGAN-style
    files (.npy / .mat with 'Kernel' / .txt)."""
    from esr_tpu.cem.kernels import resolve_kernel

    g = np.exp(-0.5 * ((np.arange(8) - 3.5) / 1.5) ** 2)
    k2 = np.outer(g, g)
    as_list = resolve_kernel(k2.tolist())
    as_np = resolve_kernel(k2)  # ndarray: must not hit bool(ndarray)
    assert as_list == as_np and isinstance(as_np, tuple)
    np.testing.assert_allclose(np.asarray(as_np), k2)

    npy = tmp_path / "k.npy"
    np.save(npy, k2)
    np.testing.assert_allclose(np.asarray(resolve_kernel(str(npy))), k2)

    import scipy.io

    mat = tmp_path / "kernel_x4.mat"  # KernelGAN output convention
    scipy.io.savemat(mat, {"Kernel": k2})
    np.testing.assert_allclose(np.asarray(resolve_kernel(str(mat))), k2)

    txt = tmp_path / "k.txt"
    np.savetxt(txt, k2)
    np.testing.assert_allclose(np.asarray(resolve_kernel(str(txt))), k2)

    # 1-D stays 1-D; None/""/[] fall back to bicubic; bad ndim errors
    assert np.asarray(resolve_kernel(g)).ndim == 1
    assert resolve_kernel(None) is None and resolve_kernel("") is None
    assert resolve_kernel([]) is None  # old truthiness behavior preserved
    with pytest.raises(ValueError):
        resolve_kernel(np.ones((2, 2, 2)))


def test_numpy_kernel_through_trainer(tmp_path):
    """A numpy 'kernel' leaf (the documented options.parse round-trip case)
    must build a trainer without tripping ndarray truthiness, and define both
    CEM and LR synthesis."""
    from esr_tpu.models.sr_model import SRModel

    g = np.exp(-0.5 * ((np.arange(8) - 3.5) / 1.2) ** 2)
    k2 = np.outer(g, g)
    k2 /= k2.sum()
    opt = {
        "name": "npk",
        "model": "sr",
        "scale": 4,
        "use_cem": True,
        "is_train": True,
        "kernel": k2,
        "network_G": {
            "which_model_G": "RRDB_net",
            "nf": 8,
            "nb": 1,
            "gc": 4,
            "num_latent_channels": 1,
        },
        "datasets": {"train": {"HR_size": 32, "batch_size": 2}},
        "path": {"root": str(tmp_path)},
        "train": {"lr_G": 1e-4, "niter": 1, "manual_seed": 0},
    }
    m = SRModel(opt)
    assert m.cem is not None and m._lr_synth is not None
    np.testing.assert_allclose(np.asarray(m._kernel), k2)
