"""MATLAB-faithful image resizing, designed TPU-first.

Behavioral spec (SURVEY.md §2.5): the reference's ``codes/data/util.py ::
imresize_np / cubic / calculate_weights_indices`` implements MATLAB
``imresize`` semantics — separable cubic kernel with a = -0.5, antialiasing
(kernel stretched by 1/scale) when downscaling, symmetric (mirror) boundary
handling, and per-output-pixel weight normalization. That function defines the
LR domain every model/metric in the stack assumes, so it must be reproduced
bit-faithfully.

TPU-first design: instead of the reference's gather-based 1D passes (a poor
fit for the MXU), each axis resize is expressed as a dense ``(out_len,
in_len)`` weight matrix built once on the host (static shapes under jit) and
applied as a matmul via ``einsum`` — two MXU contractions per image, no
gathers, no dynamic shapes, fully fusable by XLA with surrounding ops.
"""

from __future__ import annotations

import collections
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["imresize", "imresize_np", "resize_matrix", "cubic_kernel"]


def cubic_kernel(x: np.ndarray) -> np.ndarray:
    """MATLAB's cubic interpolation kernel (Keys, a = -0.5)."""
    x = np.abs(np.asarray(x, dtype=np.float64))
    x2 = x * x
    x3 = x2 * x
    return (1.5 * x3 - 2.5 * x2 + 1.0) * (x <= 1.0) + (
        -0.5 * x3 + 2.5 * x2 - 4.0 * x + 2.0
    ) * ((x > 1.0) & (x <= 2.0))


def _reflect_index(idx: np.ndarray, n: int) -> np.ndarray:
    """Map out-of-range 0-based indices into [0, n) with symmetric padding.

    Symmetric = mirror including the edge sample (numpy ``pad`` mode
    'symmetric'), matching MATLAB imresize's boundary rule: -1 -> 0, -2 -> 1,
    n -> n-1, n+1 -> n-2, periodic with period 2n.
    """
    period = 2 * n
    idx = np.mod(idx, period)  # numpy mod is always non-negative for n>0
    return np.where(idx >= n, period - 1 - idx, idx)


# Byte-bounded LRU for the dense f64 matrices: varied-size eval sets (e.g.
# DIV2K val at ~2040 px, ~8 MB per axis entry) must not pin GBs of host RAM
# on the single-core host that also runs the data loader.
_MAT_CACHE: collections.OrderedDict = collections.OrderedDict()
_MAT_CACHE_BUDGET = 128 * 2**20


def _resize_matrix_cached(in_len: int, out_len: int, antialias: bool) -> np.ndarray:
    key = (in_len, out_len, antialias)
    if key in _MAT_CACHE:
        _MAT_CACHE.move_to_end(key)
        return _MAT_CACHE[key]
    mat = _build_resize_matrix(in_len, out_len, antialias)
    _MAT_CACHE[key] = mat
    total = sum(m.nbytes for m in _MAT_CACHE.values())
    while total > _MAT_CACHE_BUDGET and len(_MAT_CACHE) > 1:
        _, old = _MAT_CACHE.popitem(last=False)
        total -= old.nbytes
    return mat


def _build_resize_matrix(in_len: int, out_len: int, antialias: bool) -> np.ndarray:
    scale = out_len / in_len
    base_width = 4.0  # cubic kernel support
    if scale < 1.0 and antialias:
        kernel_width = base_width / scale
    else:
        kernel_width = base_width

    # MATLAB 1-based output sample coordinates mapped into input space.
    x = np.arange(1, out_len + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1.0 - 1.0 / scale)
    left = np.floor(u - kernel_width / 2.0)
    p = int(math.ceil(kernel_width)) + 2
    # (out_len, p) 1-based candidate source indices and kernel distances.
    indices = left[:, None] + np.arange(p, dtype=np.float64)[None, :]
    dist = u[:, None] - indices
    if scale < 1.0 and antialias:
        weights = scale * cubic_kernel(dist * scale)
    else:
        weights = cubic_kernel(dist)
    weights = weights / np.sum(weights, axis=1, keepdims=True)

    idx0 = _reflect_index((indices - 1.0).astype(np.int64), in_len)
    mat = np.zeros((out_len, in_len), dtype=np.float64)
    np.add.at(mat, (np.repeat(np.arange(out_len)[:, None], p, axis=1), idx0), weights)
    return mat


def resize_matrix(
    in_len: int, out_len: int, antialias: bool = True, dtype=np.float32
) -> np.ndarray:
    """Dense 1-D MATLAB-bicubic resampling matrix of shape (out_len, in_len).

    ``out @ = M @ in`` reproduces one separable pass of MATLAB imresize
    (including symmetric boundary handling and antialiasing on downscale).
    """
    return _resize_matrix_cached(int(in_len), int(out_len), bool(antialias)).astype(
        dtype
    )


def _out_shape(h: int, w: int, scale, out_shape):
    if out_shape is not None:
        return int(out_shape[0]), int(out_shape[1])
    if scale is None:
        raise ValueError("either scale or out_shape must be given")
    # MATLAB: output size is ceil(in * scale)
    return int(math.ceil(h * scale)), int(math.ceil(w * scale))


def imresize(
    img: jax.Array,
    scale: float | None = None,
    out_shape: tuple[int, int] | None = None,
    antialias: bool = True,
) -> jax.Array:
    """MATLAB-bicubic resize of channel-last images, jit-able and batched.

    Accepts (H, W), (H, W, C) or (N, H, W, C). Shapes are static under jit;
    the per-axis weight matrices are compile-time constants, so the whole op
    lowers to two MXU matmuls.
    """
    squeeze_hw = img.ndim == 2
    if squeeze_hw:
        img = img[..., None]
    h, w = img.shape[-3], img.shape[-2]
    out_h, out_w = _out_shape(h, w, scale, out_shape)
    mh = jnp.asarray(resize_matrix(h, out_h, antialias))
    mw = jnp.asarray(resize_matrix(w, out_w, antialias))
    orig_dtype = img.dtype
    x = img.astype(mh.dtype)
    # HIGHEST: keep f32 on the MXU — this op defines the LR domain and gates
    # bit-faithfulness (bf16 default precision costs ~1e-3 error).
    x = jnp.einsum("oh,...hwc->...owc", mh, x, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("ow,...hwc->...hoc", mw, x, precision=jax.lax.Precision.HIGHEST)
    x = x.astype(orig_dtype) if jnp.issubdtype(orig_dtype, jnp.floating) else x
    return x[..., 0] if squeeze_hw else x


def imresize_np(
    img: np.ndarray,
    scale: float | None = None,
    out_shape: tuple[int, int] | None = None,
    antialias: bool = True,
) -> np.ndarray:
    """Host-side (numpy) twin of :func:`imresize` — identical math.

    Mirrors the reference's ``imresize_np`` call surface for the data
    pipeline's on-the-fly LR generation (SURVEY.md §2.4) when done on host.
    """
    squeeze_hw = img.ndim == 2
    if squeeze_hw:
        img = img[..., None]
    h, w = img.shape[-3], img.shape[-2]
    out_h, out_w = _out_shape(h, w, scale, out_shape)
    mh = resize_matrix(h, out_h, antialias, dtype=np.float64)
    mw = resize_matrix(w, out_w, antialias, dtype=np.float64)
    x = img.astype(np.float64)
    x = np.einsum("oh,...hwc->...owc", mh, x)
    x = np.einsum("ow,...hwc->...hoc", mw, x)
    x = x.astype(np.float32)
    return x[..., 0] if squeeze_hw else x
