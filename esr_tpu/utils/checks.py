"""Numerical-safety checks (SURVEY.md §5.2).

The reference has no sanitizers (single-threaded torch). The TPU-native
analogues: pytree NaN/Inf scans for step outputs, a checkify wrapper to
surface device-side errors with location, and a donation-safety helper used
in tests to assert a step function is pure (same inputs -> same outputs)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["find_nonfinite", "assert_finite", "checkify_step", "assert_pure"]


def find_nonfinite(tree) -> list[str]:
    """Paths of leaves containing NaN/Inf (host-side, fetches scalars only)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                bad.append(jax.tree_util.keystr(path))
    return bad


def assert_finite(tree, what: str = "tree") -> None:
    bad = find_nonfinite(tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {what}: {bad[:10]}")


def checkify_step(step_fn):
    """Wrap a jitted-able step with checkify NaN/div checks. Returns
    ``(err, out) = wrapped(*args)``; call ``err.throw()`` on host."""
    from jax.experimental import checkify

    return checkify.checkify(
        step_fn, errors=checkify.float_checks | checkify.user_checks
    )


def assert_pure(step_fn, *args, atol: float = 0.0) -> None:
    """Run a step twice on identical inputs and require identical outputs —
    catches accidental host state, rng reuse, or donation aliasing bugs."""
    a = jax.tree.map(
        lambda x: jnp.asarray(x).copy() if hasattr(x, "shape") else x, args
    )
    out1 = step_fn(*a)
    out2 = step_fn(*args)
    for l1, l2 in zip(jax.tree.leaves(out1), jax.tree.leaves(out2)):
        if hasattr(l1, "dtype"):
            if atol:
                assert bool(jnp.all(jnp.abs(l1 - l2) <= atol))
            else:
                assert bool(jnp.all(l1 == l2))
