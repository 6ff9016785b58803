"""Bit-faithfulness tests for the MATLAB-bicubic resize core (SURVEY.md §7.1).

Oracle strategy (reference weights/MATLAB unavailable in this environment):
1. an independent straightforward per-pixel implementation of the MATLAB
   imresize algorithm (explicit symmetric padding + direct weighting), written
   from the algorithm definition, checked against the production
   matrix-contraction implementation to float64 precision;
2. PIL's convolution resampler (an independent third-party implementation of
   the same antialiased cubic a=-0.5 filter) on interior pixels;
3. analytic invariants (identity, constant preservation, linearity).
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from esr_tpu.ops.resize import cubic_kernel, imresize, imresize_np, resize_matrix


def reference_imresize_1d(signal: np.ndarray, out_len: int, antialias: bool = True):
    """Direct (slow) MATLAB imresize along axis 0, written independently."""
    in_len = signal.shape[0]
    scale = out_len / in_len
    kw = 4.0 / scale if (scale < 1 and antialias) else 4.0
    out = np.zeros((out_len,) + signal.shape[1:], dtype=np.float64)
    for j in range(1, out_len + 1):
        u = j / scale + 0.5 * (1 - 1 / scale)
        left = math.floor(u - kw / 2)
        p = int(math.ceil(kw)) + 2
        idx = np.arange(left, left + p)
        if scale < 1 and antialias:
            w = scale * cubic_kernel(scale * (u - idx))
        else:
            w = cubic_kernel(u - idx)
        w = w / w.sum()
        # symmetric boundary: reflect indices (1-based) into [1, in_len]
        idx0 = idx - 1
        per = 2 * in_len
        idx0 = np.mod(idx0, per)
        idx0 = np.where(idx0 >= in_len, per - 1 - idx0, idx0)
        out[j - 1] = np.tensordot(w, signal[idx0].astype(np.float64), axes=(0, 0))
    return out


@pytest.mark.parametrize("in_len,out_len", [(16, 4), (17, 5), (8, 32), (13, 29), (100, 25)])
def test_matrix_matches_direct_algorithm(in_len, out_len):
    rng = np.random.default_rng(0)
    sig = rng.random((in_len, 3))
    direct = reference_imresize_1d(sig, out_len)
    mat = resize_matrix(in_len, out_len, dtype=np.float64)
    np.testing.assert_allclose(mat @ sig, direct, atol=1e-12)


def test_imresize_np_separable_matches_direct_2d():
    rng = np.random.default_rng(1)
    img = rng.random((20, 12, 3))
    out = imresize_np(img, scale=0.25)
    step1 = reference_imresize_1d(img, 5)
    step2 = reference_imresize_1d(step1.transpose(1, 0, 2), 3).transpose(1, 0, 2)
    np.testing.assert_allclose(out, step2, atol=1e-6)


def test_jax_matches_numpy():
    rng = np.random.default_rng(2)
    img = rng.random((32, 24, 3)).astype(np.float32)
    a = imresize_np(img, scale=0.25)
    b = np.asarray(imresize(jnp.asarray(img), scale=0.25))
    np.testing.assert_allclose(a, b, atol=2e-5)
    # upscale path too
    a = imresize_np(img, scale=4)
    b = np.asarray(imresize(jnp.asarray(img), scale=4))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_identity_and_constant():
    rng = np.random.default_rng(3)
    img = rng.random((16, 16, 1)).astype(np.float32)
    np.testing.assert_allclose(imresize_np(img, scale=1), img, atol=1e-6)
    const = np.full((20, 20, 3), 0.37, dtype=np.float32)
    for s in (0.25, 0.5, 2, 4):
        out = imresize_np(const, scale=s)
        np.testing.assert_allclose(out, 0.37, atol=1e-6)


def test_against_pil_interior():
    """PIL BICUBIC resampling implements the same antialiased a=-0.5 filter;
    boundary handling differs, so compare away from edges."""
    from PIL import Image

    rng = np.random.default_rng(4)
    img = (rng.random((64, 64)) * 255).astype(np.float32)
    ours = imresize_np(img, scale=0.25)
    pil = np.asarray(
        Image.fromarray(img).resize((16, 16), Image.BICUBIC), dtype=np.float32
    )
    np.testing.assert_allclose(ours[2:-2, 2:-2], pil[2:-2, 2:-2], atol=1e-2)


def test_batched_and_jit():
    rng = np.random.default_rng(5)
    imgs = rng.random((2, 16, 16, 3)).astype(np.float32)
    f = jax.jit(lambda x: imresize(x, scale=0.25))
    out = np.asarray(f(jnp.asarray(imgs)))
    assert out.shape == (2, 4, 4, 3)
    for i in range(2):
        np.testing.assert_allclose(out[i], imresize_np(imgs[i], scale=0.25), atol=2e-5)


def test_2d_input():
    rng = np.random.default_rng(6)
    img = rng.random((16, 16)).astype(np.float32)
    out = np.asarray(imresize(jnp.asarray(img), scale=0.5))
    assert out.shape == (8, 8)
    np.testing.assert_allclose(out, imresize_np(img, scale=0.5), atol=2e-5)


def test_matlab_golden_values():
    """Golden values for imresize(magic-like ramp) hand-derived from the
    direct algorithm at float64 — regression lock, not an external oracle."""
    x = np.arange(64, dtype=np.float64).reshape(64, 1)
    out = resize_matrix(64, 16, dtype=np.float64) @ x
    # downscale by 4 of a linear ramp keeps linearity in the interior
    # (centers at 1.5 + 4k); symmetric padding bends the ramp at the borders
    # (the antialiased kernel spans 18 taps, so ~4 LR px are border-affected).
    np.testing.assert_allclose(out[5:11, 0], 1.5 + 4 * np.arange(5, 11), atol=1e-9)
    # border values are regression-locked from the float64 direct algorithm
    direct = reference_imresize_1d(x, 16)
    np.testing.assert_allclose(out, direct, atol=1e-12)


def test_resize_matrix_cache_byte_bounded():
    """The dense-matrix cache evicts LRU entries past its byte budget so
    varied-size eval sets can't pin GBs of host RAM (r3 review finding)."""
    from esr_tpu.ops import resize as rz

    rz._MAT_CACHE.clear()
    # each (510, 2040) f64 matrix is ~8.3 MB; drive well past a small budget
    old_budget, rz._MAT_CACHE_BUDGET = rz._MAT_CACHE_BUDGET, 32 * 2**20
    try:
        for k in range(8):
            resize_matrix(2040 + 4 * k, (2040 + 4 * k) // 4)
        total = sum(m.nbytes for m in rz._MAT_CACHE.values())
        assert total <= 32 * 2**20, total
        assert len(rz._MAT_CACHE) >= 1
        # the most recent entry survives and hits
        m1 = rz._resize_matrix_cached(2040 + 28, (2040 + 28) // 4, True)
        m2 = rz._resize_matrix_cached(2040 + 28, (2040 + 28) // 4, True)
        assert m1 is m2
    finally:
        rz._MAT_CACHE_BUDGET = old_budget
        rz._MAT_CACHE.clear()
