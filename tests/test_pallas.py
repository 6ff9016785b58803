"""Pallas kernel correctness tests (interpreter mode on the CPU backend)."""

import numpy as np
import jax
import jax.numpy as jnp

from esr_tpu.models.blocks import ResidualDenseBlock5C
from esr_tpu.ops.pallas.rdb_conv import fused_rdb5c, rdb5c_params_from_flax


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


def test_fused_rdb5c_nonsquare_and_batch():
    nf, gc = 8, 4
    block = ResidualDenseBlock5C(nf=nf, gc=gc)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 16, 32, nf)), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x)
    ref = block.apply(variables, x)
    got = fused_rdb5c(x, rdb5c_params_from_flax(variables["params"]), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
