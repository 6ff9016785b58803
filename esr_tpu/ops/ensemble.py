"""Geometric x8 self-ensemble for eval (beyond-reference; EDSR-style
"enhanced prediction" adapted to explorable SR).

Average the eight dihedral-transformed forwards ``inv_t(G(t(LR), t(Z)))``.
TPU-first shaping: the eight variants run as TWO batched forwards — the four
shape-preserving flips {I, H, V, HV} batch together, and the four transposed
variants {T, T.H, T.V, T.HV} batch together — so the MXU sees batch-4N convs
instead of eight batch-N dispatches, and rectangular images stay legal (each
group is shape-homogeneous).

Consistency with the explorable-SR contract: this wraps the RAW generator
forward and the caller (BaseModel._make_forward) projects the MEAN through
CEM once at the end. The CEM constraint set {x : H(x) = LR} is affine, so
the projected mean is exactly consistent regardless of per-variant residuals
— no per-variant projection needed.

Z semantics: the latent map rides the same transform as the image, so each
variant sees Z aligned with its view of the content; the ensemble average is
over views of the SAME (LR, Z) pair, preserving per-draw diversity scoring.

Transform codes match data/pipeline.py::dihedral_transform (0..7); here they
are STATIC Python ints applied as direct slicing (no lax.switch) because the
transposing branches change (H, W) — a traced switch would try to unify
mismatched shapes on rectangular inputs.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["apply_code", "make_self_ensemble", "INVERSE_CODE"]

# inverse of each dihedral code: T.H and T.V are each other's inverses
# (H∘T == (T∘V) etc.); the rest are involutions. Verified exhaustively in
# tests/test_ensemble.py on rectangular images.
INVERSE_CODE = (0, 1, 2, 3, 4, 6, 5, 7)


def apply_code(x: jnp.ndarray, code: int) -> jnp.ndarray:
    """Apply dihedral ``code`` (static int, pipeline.py numbering) to an
    NHWC batch."""
    if not 0 <= code <= 7:
        raise ValueError(f"dihedral code must be 0..7, got {code}")
    if code >= 4:
        x = jnp.swapaxes(x, 1, 2)
    if code % 4 in (2, 3):
        x = x[:, ::-1, :, :]
    if code % 4 in (1, 3):
        x = x[:, :, ::-1, :]
    return x


def make_self_ensemble(apply_raw):
    """Wrap a raw eval forward ``f(params, lr, z) -> sr`` into its x8
    dihedral ensemble (two batched calls, see module docstring)."""

    def fwd(params, lr, z=None):
        n = lr.shape[0]
        out = None
        for group in ((0, 1, 2, 3), (4, 5, 6, 7)):
            lrt = jnp.concatenate([apply_code(lr, c) for c in group], axis=0)
            zt = (
                jnp.concatenate([apply_code(z, c) for c in group], axis=0)
                if z is not None
                else None
            )
            srt = apply_raw(params, lrt, zt)
            for i, c in enumerate(group):
                back = apply_code(srt[i * n : (i + 1) * n], INVERSE_CODE[c])
                out = back if out is None else out + back
        return out / 8.0

    return fwd
