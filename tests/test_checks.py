"""Numerical-safety utilities (SURVEY.md §5.2 TPU-equivalents)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from esr_tpu.utils.checks import assert_finite, assert_pure, checkify_step, find_nonfinite


def test_find_nonfinite():
    tree = {"a": jnp.ones(3), "b": {"c": jnp.array([1.0, np.nan])}}
    bad = find_nonfinite(tree)
    assert len(bad) == 1 and "c" in bad[0]
    with pytest.raises(FloatingPointError):
        assert_finite(tree, "grads")
    assert_finite({"a": jnp.ones(2)})


def test_checkify_step_catches_nan():
    def step(x):
        return jnp.log(x)  # nan for negative input

    wrapped = jax.jit(checkify_step(step))
    err, out = wrapped(jnp.array([-1.0]))
    with pytest.raises(Exception):
        err.throw()
    err2, out2 = wrapped(jnp.array([1.0]))
    err2.throw()  # no error


def test_assert_pure():
    def good(x):
        return x * 2

    assert_pure(good, jnp.arange(4.0))

    state = {"n": 0}

    def bad(x):
        state["n"] += 1
        return x * state["n"]

    with pytest.raises(AssertionError):
        assert_pure(bad, jnp.arange(4.0))


def test_precision_ladder_tools():
    """one_over_f_image is deterministic in [0,1]; metrics psnr is sane."""
    import numpy as np

    from esr_tpu.scripts.precision_ladder import metrics, one_over_f_image

    a = one_over_f_image(16, 24, seed=3)
    b = one_over_f_image(16, 24, seed=3)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (16, 24, 3) and a.min() >= 0.0 and a.max() <= 1.0
    m = metrics(a, a + 0.01)
    assert abs(m["rms"] - 0.01) < 1e-6 and abs(m["max"] - 0.01) < 1e-6
