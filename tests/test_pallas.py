"""Pallas kernel correctness tests (interpreter mode on the CPU backend)."""

import numpy as np
import jax
import jax.numpy as jnp

from esr_tpu.models.blocks import ResidualDenseBlock5C
from esr_tpu.ops.pallas.rdb_conv import fused_rdb5c, rdb5c_params_from_flax
import pytest


@pytest.mark.slow
def test_fused_rdb5c_matches_flax():
    nf, gc = 16, 8
    block = ResidualDenseBlock5C(nf=nf, gc=gc)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 24, 24, nf)), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x)
    ref = block.apply(variables, x)
    kparams = rdb5c_params_from_flax(variables["params"])
    got = fused_rdb5c(x, kparams, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


@pytest.mark.slow
def test_fused_rdb5c_nonsquare_and_batch():
    nf, gc = 8, 4
    block = ResidualDenseBlock5C(nf=nf, gc=gc)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 16, 32, nf)), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x)
    ref = block.apply(variables, x)
    got = fused_rdb5c(x, rdb5c_params_from_flax(variables["params"]), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_fused_rdb5c_tiled_matches_flax():
    """Width-tiled variant (r4 probe): many tiles, ragged edges, batch."""
    from esr_tpu.ops.pallas.rdb_conv import fused_rdb5c_tiled

    nf, gc = 8, 4
    block = ResidualDenseBlock5C(nf=nf, gc=gc)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 20, nf)), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x)
    ref = block.apply(variables, x)
    kp = rdb5c_params_from_flax(variables["params"])
    # 3x4 tile grid with ragged right/bottom edges
    got = fused_rdb5c_tiled(x, kp, interpret=True, strip=6, wtile=6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
    # single-tile degenerate case == the 1D kernel's path
    got2 = fused_rdb5c_tiled(x, kp, interpret=True, strip=22, wtile=22)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref), atol=2e-4)


@pytest.mark.slow
def test_kpack_conv_matches_lax_conv():
    """K-packed im2col conv (ops/pallas/kpack_conv.py) is exact vs lax.conv
    (interpret mode on the CPU mesh; on-hardware verdict in the docstring)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from esr_tpu.ops.pallas.kpack_conv import kpack_conv3x3

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 16, 16, 8), jnp.float32)
    w = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 12), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = kpack_conv3x3(x, w, rows_per_group=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
