"""Downsampling-kernel construction for CEM (SURVEY.md §2.10, §2.10a).

The reference (``codes/models/modules/CEM/imresize_CEM.py``) derives the
stationary downsampling kernel that makes ``y = (x * k) v s`` equal MATLAB
``imresize(x, 1/s)``; the CEM projection then needs the kernel, its phase
(alignment of the strided subsampling), and the inverse filter of the LR-grid
autocorrelation. Here the kernel + phase are extracted exactly from the same
resize matrices that define our ``imresize`` (single source of truth), so CEM
consistency is w.r.t. the very operator the data pipeline uses.
"""

from __future__ import annotations

import numpy as np

from esr_tpu.ops.resize import resize_matrix

__all__ = [
    "bicubic_downsample_kernel_1d",
    "downsample_kernel_2d",
    "lr_autocorrelation",
    "resolve_kernel",
]


def resolve_kernel(kernel) -> tuple | None:
    """Normalize the top-level ``opt['kernel']`` value into the hashable
    nested-tuple form :class:`esr_tpu.cem.CEMConf` takes.

    Accepted forms (SURVEY.md §2.10a: "alternatively a user/estimated kernel,
    e.g. from KernelGAN"):

    - ``None`` / ``""``        -> ``None`` (MATLAB-bicubic default)
    - nested list / tuple      -> as-is (the JSON-config path)
    - ``np.ndarray`` (1-D/2-D) -> tuple form (``options.parse`` keeps numpy
      leaves; plain truthiness on one is a ``ValueError``, hence this helper)
    - ``str`` path             -> loaded from file: ``.npy``/``.npz``
      (``np.load``), ``.mat`` (``scipy.io.loadmat`` — KernelGAN writes its
      estimate as ``kernel_x4.mat`` with key ``'Kernel'``), anything else
      ``np.loadtxt``. ``.npz``/``.mat`` prefer a ``kernel``/``Kernel`` entry,
      else the single array present.
    """
    if kernel is None or (isinstance(kernel, str) and not kernel):
        return None
    if isinstance(kernel, str):
        import os

        ext = os.path.splitext(kernel)[1].lower()
        if ext == ".npy":
            arr = np.load(kernel)
        elif ext in (".npz", ".mat"):
            if ext == ".npz":
                data = dict(np.load(kernel))
            else:
                import scipy.io

                data = {
                    k: v
                    for k, v in scipy.io.loadmat(kernel).items()
                    if not k.startswith("__")
                }
            for key in ("kernel", "Kernel"):
                if key in data:
                    arr = data[key]
                    break
            else:
                arrays = [v for v in data.values() if np.asarray(v).ndim in (1, 2)]
                if len(arrays) != 1:
                    raise ValueError(
                        f"kernel file {kernel!r}: expected a 'kernel'/'Kernel' "
                        f"entry or exactly one array, got keys {sorted(data)}"
                    )
                arr = arrays[0]
        else:
            arr = np.loadtxt(kernel)
        kernel = arr
    arr = np.asarray(kernel, dtype=np.float64)
    arr = np.squeeze(arr)
    if arr.size == 0:  # e.g. 'kernel': [] — same bicubic fallback as None
        return None
    if arr.ndim not in (1, 2):
        raise ValueError(f"kernel must be 1-D or 2-D, got shape {arr.shape}")
    return tuple(arr.tolist()) if arr.ndim == 1 else tuple(map(tuple, arr.tolist()))


def bicubic_downsample_kernel_1d(scale: int) -> tuple[np.ndarray, int]:
    """Return (k, rel): the stationary 1-D kernel and phase of MATLAB bicubic
    downsampling by integer ``scale``.

    ``y[j] = sum_i x[j*scale + rel + i] * k[i]`` reproduces an interior row of
    ``resize_matrix(scale*M, M)``; stationarity is asserted.
    """
    s = int(scale)
    if s == 1:
        return np.array([1.0]), 0
    m = 32  # LR grid length used for extraction; interior rows are stationary
    mat = resize_matrix(s * m, m, antialias=True, dtype=np.float64)
    j0 = m // 2
    row = mat[j0]
    (nz,) = np.nonzero(np.abs(row) > 1e-14)
    a, b = nz[0], nz[-1]
    k = row[a : b + 1].copy()
    rel = int(a - j0 * s)
    # stationarity check against the neighbouring row
    row1 = mat[j0 + 1]
    (nz1,) = np.nonzero(np.abs(row1) > 1e-14)
    assert nz1[0] - a == s and np.allclose(row1[nz1[0] : nz1[-1] + 1], k, atol=1e-12)
    return k, rel


def downsample_kernel_2d(
    scale: int, kernel: np.ndarray | None = None
) -> tuple[np.ndarray, tuple[int, int]]:
    """2-D separable-or-provided downsampling kernel and its (rel_h, rel_w).

    ``kernel=None`` -> MATLAB-bicubic (outer product of the 1-D kernel).
    A provided 2-D kernel (e.g. KernelGAN-estimated) is normalized to unit sum
    and centered: ``rel = -(L - scale) // 2`` per axis.
    """
    s = int(scale)
    if kernel is None:
        k1, rel = bicubic_downsample_kernel_1d(s)
        return np.outer(k1, k1), (rel, rel)
    k = np.asarray(kernel, dtype=np.float64)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    rel_h = -(k.shape[0] - s) // 2
    rel_w = -(k.shape[1] - s) // 2
    return k, (rel_h, rel_w)


def lr_autocorrelation(k2d: np.ndarray, scale: int) -> tuple[np.ndarray, tuple[int, int]]:
    """q = subsample_s(k * flip(k)) — the LR-grid kernel of H H^T.

    Returns (q, center) where ``center`` is the index of lag 0 in q.
    Full autocorrelation ``a[d] = sum_t k[t] k[t+d]`` has center L-1; the
    subsample keeps lags that are multiples of s.
    """
    s = int(scale)
    from scipy.signal import correlate2d

    a = correlate2d(k2d, k2d, mode="full")  # size (2L-1)
    ch, cw = k2d.shape[0] - 1, k2d.shape[1] - 1
    # lags multiple of s around center
    ih = np.arange(ch % s, a.shape[0], s)
    iw = np.arange(cw % s, a.shape[1], s)
    q = a[np.ix_(ih, iw)]
    center = (int(np.where(ih == ch)[0][0]), int(np.where(iw == cw)[0][0]))
    return q, center
