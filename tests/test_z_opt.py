"""Z-optimization + exploration session tests (SURVEY.md §2.12/§2.16).

Core guarantees: the jitted Z search reduces its objective; every explored
output stays exactly CEM-consistent with the LR input (the point of the whole
system); session tools, history and region logic behave."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from esr_tpu.cem import CEMConf, make_cem
from esr_tpu.explore import (
    ExplorationSession,
    ZOptimizer,
    brightness_objective,
    imprint_objective,
    periodicity_objective,
    tv_objective,
    variance_objective,
)
from esr_tpu.explore.z_optimizer import bucket_crop, optimize_z
from esr_tpu.models.architecture import RRDBNet


@pytest.fixture(scope="module")
def setup():
    model = RRDBNet(nf=8, nb=1, gc=4, scale=4, num_latent_channels=1)
    lr_img = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 3)), jnp.float32)
    z0 = jnp.zeros((1, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), lr_img, z0)["params"]
    cem = make_cem(CEMConf(scale=4))

    def forward(p, lr, z):
        return cem.project(model.apply({"params": p}, lr, z), lr)

    return model, params, cem, forward, lr_img, z0


@pytest.mark.slow
def test_optimize_z_reduces_objective_and_keeps_consistency(setup):
    _, params, cem, forward, lr_img, z0 = setup
    mask = jnp.ones((64, 64), jnp.float32)
    objective = variance_objective(+1.0)
    z_opt, losses = optimize_z(
        forward, params, lr_img, z0, mask, objective, n_steps=20, lr=0.2
    )
    assert float(losses[-1]) < float(losses[0])
    assert float(jnp.abs(z_opt).max()) <= 1.0 + 1e-6
    sr = forward(params, lr_img, z_opt)
    lr_back = np.asarray(cem.downsample(sr))
    assert np.abs(lr_back - np.asarray(lr_img)).max() < 1e-4


def test_bucket_crop():
    assert bucket_crop((0, 0, 10, 10), 64, 64, 4) == (0, 0, 16)
    y, x, size = bucket_crop((30, 30, 50, 50), 64, 64, 4)
    assert size == 32 and y + size <= 64 and x + size <= 64
    # need larger than biggest bucket -> full image
    assert bucket_crop((0, 0, 60, 60), 64, 64, 4)[2] == 64


@pytest.mark.slow
def test_z_optimizer_region_crop(setup):
    _, params, cem, forward, _, _ = setup
    # larger image so the 16px bucket crop is a strict subregion
    lr_img = np.random.default_rng(5).random((1, 64, 64, 3)).astype(np.float32)
    z0 = np.zeros((1, 64, 64, 1), np.float32)
    opt = ZOptimizer(forward, params, scale=4, n_steps=10, lr=0.2)
    mask = np.zeros((256, 256), np.float32)
    mask[8:24, 8:24] = 1.0
    z_opt, losses = opt(lr_img, z0, variance_objective(1.0), mask, box_lr=(2, 2, 6, 6))
    assert z_opt.shape == z0.shape
    # Z untouched outside the 16px bucketed crop (crop-paste semantics)
    assert float(jnp.abs(z_opt[:, 20:, 20:]).max()) == 0.0
    assert float(jnp.abs(z_opt).max()) > 0.0


def test_session_tools_and_history(setup):
    _, params, cem, forward, lr_img, _ = setup
    sess = ExplorationSession(
        forward, params, np.asarray(lr_img), num_latent_channels=1, n_steps=6
    )
    sr0 = sess.current_sr().copy()
    sess.select_rect(16, 16, 48, 48)
    losses = sess.increase_variance()
    assert losses.shape == (6,)
    sr1 = sess.current_sr()
    assert np.abs(sr1 - sr0).max() > 0
    # consistency after editing
    lr_back = np.asarray(cem.downsample(jnp.asarray(sr1)))
    assert np.abs(lr_back - sess.lr_img).max() < 1e-4
    # undo restores
    sess.undo()
    np.testing.assert_array_equal(sess.z, np.zeros_like(sess.z))
    sess.redo()
    assert np.abs(sess.z).max() > 0

    sess.smooth()
    sess.brightness(0.8)
    sess.periodicity(period_x=8)
    target = np.zeros((64, 64, 3), np.float32)
    sess.imprint(target)
    assert len(sess._history) >= 4
    sess.reset_region_z()


def test_session_polygon_and_mask(setup):
    _, params, _, forward, lr_img, _ = setup
    sess = ExplorationSession(forward, params, np.asarray(lr_img), n_steps=2)
    sess.select_polygon([(8, 8), (8, 40), (40, 40), (40, 8)])
    assert sess._mask is not None and sess._mask.sum() > 0
    assert sess._box_lr is not None
    brush = np.zeros((64, 64), np.float32)
    brush[0:8, 0:8] = 1
    sess.select_mask(brush)
    assert sess._box_lr == (0, 0, 2, 2)


@pytest.mark.slow
def test_session_random_alternatives(setup):
    _, params, cem, forward, lr_img, _ = setup
    sess = ExplorationSession(forward, params, np.asarray(lr_img), n_steps=4)
    sess.select_rect(0, 0, 32, 32)
    outs = sess.random_alternatives(k=2, seed=1)
    assert len(outs) == 2
    assert np.abs(outs[0] - outs[1]).max() > 1e-4  # diverse
    for sr in outs:
        lr_back = np.asarray(cem.downsample(jnp.asarray(sr)))
        assert np.abs(lr_back - sess.lr_img).max() < 1e-4  # all consistent


@pytest.mark.slow
def test_cli_commands(setup, tmp_path):
    """Drive the terminal editor command loop against a live session."""
    from esr_tpu.explore.cli import run_command
    from esr_tpu.explore.session import ExplorationSession

    _, params, _, forward, lr_img, _ = setup
    sess = ExplorationSession(forward, params, np.asarray(lr_img), n_steps=2)
    assert "selected" in run_command(sess, "select 0 0 32 32")
    assert "variance" in run_command(sess, "variance +")
    assert "smooth" in run_command(sess, "smooth")
    assert "undone" == run_command(sess, "undo")
    out = tmp_path / "sr.png"
    assert str(out) in run_command(sess, f"save {out}")
    assert out.exists()
    assert run_command(sess, "quit") == ""
    assert "unknown" in run_command(sess, "bogus")


@pytest.mark.slow
def test_histogram_objective(setup):
    """Histogram matching pulls the region's distribution toward the target."""
    from esr_tpu.explore import histogram_objective

    _, params, _, forward, lr_img, _ = setup
    sess = ExplorationSession(forward, params, np.asarray(lr_img), n_steps=8)
    sess.select_rect(0, 0, 48, 48)
    bright = np.full((16, 16, 3), 0.95, np.float32)  # push toward bright
    losses = sess.match_histogram(bright)
    assert losses[-1] < losses[0]


def test_realism_tool(setup):
    """The adversarial exploration tool (SURVEY.md §2.12): realism(+1)
    raises the D score, realism(-1) lowers it, and the edit stays exactly
    CEM-consistent (VERDICT r2 next-step #3)."""
    from esr_tpu.models.architecture import DiscriminatorVGG128

    _, params, cem, forward, lr_img, _ = setup
    d = DiscriminatorVGG128(nf=4)
    d_vars = d.init(jax.random.PRNGKey(3), jnp.zeros((1, 128, 128, 3)), train=False)
    sess = ExplorationSession(forward, params, np.asarray(lr_img), n_steps=6)
    with pytest.raises(ValueError, match="set_discriminator"):
        sess.realism()
    sess.set_discriminator(d_vars, nf=4)
    sess.select_rect(8, 8, 56, 56)
    s0 = sess.d_score()
    losses = sess.realism(+1.0)
    assert float(losses[-1]) < float(losses[0])
    assert sess.d_score() > s0
    sr = jnp.asarray(sess.current_sr())
    assert np.abs(np.asarray(cem.downsample(sr)) - sess.lr_img).max() < 1e-4
    sess.undo()
    sess.realism(-1.0)
    assert sess.d_score() < s0


@pytest.mark.slow
def test_realism_region_mask_honored(setup):
    """Z outside the bucketed crop stays untouched — the realism tool obeys
    region semantics like every other tool (VERDICT r2 weak #2)."""
    from esr_tpu.models.architecture import DiscriminatorVGG128

    _, params, _, forward, _, _ = setup
    lr_img = np.random.default_rng(7).random((1, 64, 64, 3)).astype(np.float32)
    d = DiscriminatorVGG128(nf=4)
    # D trained at a 32px HR crop (not 128): the objective must infer the
    # trained input size from the Dense-head shape and resize crops to it
    d_vars = d.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)), train=False)
    sess = ExplorationSession(forward, params, lr_img, n_steps=4)
    sess.set_discriminator(d_vars, nf=4)
    sess.select_rect(8, 8, 24, 24)  # 16px bucket crop, strict subregion
    sess.realism(+1.0)
    assert float(np.abs(sess.z[:, 20:, 20:]).max()) == 0.0
    assert float(np.abs(sess.z).max()) > 0.0


def test_adversarial_objective_fn_is_stable():
    """Same D config -> identical fn object (lru_cache on static config, not
    a bound apply method), so repeated tool clicks hit the jit cache."""
    from esr_tpu.explore import adversarial_objective
    from esr_tpu.models.architecture import DiscriminatorVGG128

    d = DiscriminatorVGG128(nf=4)
    v1 = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False)
    v2 = d.init(jax.random.PRNGKey(1), jnp.zeros((1, 128, 128, 3)), train=False)
    o1 = adversarial_objective(v1, +1.0, nf=4)
    o2 = adversarial_objective(v2, -1.0, nf=4)
    assert o1.fn is o2.fn


@pytest.mark.slow
def test_cli_realism_commands(setup):
    """`realism +` / `dscore` drive the view-model path end-to-end."""
    from esr_tpu.explore.cli import run_command
    from esr_tpu.models.architecture import DiscriminatorVGG128

    _, params, _, forward, lr_img, _ = setup
    d = DiscriminatorVGG128(nf=4)
    d_vars = d.init(jax.random.PRNGKey(3), jnp.zeros((1, 128, 128, 3)), train=False)
    sess = ExplorationSession(forward, params, np.asarray(lr_img), n_steps=2)
    assert "bad arguments" in run_command(sess, "realism")
    out = run_command(sess, "realism +")  # no D attached yet
    assert "set_discriminator" in out or "bad arguments" in out
    sess.set_discriminator(d_vars, nf=4)
    assert "D realism score" in run_command(sess, "dscore")
    assert "realism +" in run_command(sess, "realism +")


@pytest.mark.slow
def test_z_lr_decay(setup):
    """Z-search LR scheduling (reference parity): decayed run still reduces
    the objective and stays consistent."""
    _, params, cem, forward, lr_img, z0 = setup
    mask = jnp.ones((64, 64), jnp.float32)
    z_opt, losses = optimize_z(
        forward, params, lr_img, z0, mask, variance_objective(1.0),
        n_steps=10, lr=0.3, lr_decay=0.1,
    )
    assert float(losses[-1]) < float(losses[0])
    sr = forward(params, lr_img, z_opt)
    assert np.abs(np.asarray(cem.downsample(sr)) - np.asarray(lr_img)).max() < 1e-4


@pytest.mark.slow
def test_cropped_tool_with_fullsize_spatial_constants(setup):
    """ADVICE r1 high: objectives carrying full-size HR constants (imprint
    target, diversity anchors) must work when the bucketed region crop is a
    STRICT subregion — the constants are cropped to the same window."""
    _, params, cem, forward, _, _ = setup
    lr_img = np.random.default_rng(7).random((1, 64, 64, 3)).astype(np.float32)
    sess = ExplorationSession(forward, params, lr_img, n_steps=4)
    sess.select_rect(40, 40, 72, 72)  # HR-space; LR box ~ (10,10,18,18) -> 16px bucket
    # full-size (256,256,3) imprint target vs (64,64,3) crop: crashed pre-fix
    target = np.zeros((256, 256, 3), np.float32)
    target[40:72, 40:72] = 0.9
    losses = sess.imprint(target)
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    # full-size anchors in random_alternatives: also crashed pre-fix
    outs = sess.random_alternatives(k=2, seed=3)
    assert len(outs) == 2 and np.abs(outs[0] - outs[1]).max() > 1e-5
    for sr in outs:
        lr_back = np.asarray(cem.downsample(jnp.asarray(sr)))
        assert np.abs(lr_back - sess.lr_img).max() < 1e-4


def test_repeat_tool_click_hits_jit_cache(setup):
    """VERDICT r1 weak #4: a repeated tool invocation must be a cached
    dispatch — zero new traces of the Z-search program."""
    from esr_tpu.explore.z_optimizer import _optimize_z_jit

    _, params, _, forward, lr_img, _ = setup
    sess = ExplorationSession(forward, params, np.asarray(lr_img), n_steps=2)
    sess.select_rect(8, 8, 40, 40)
    sess.increase_variance()
    sess.brightness(0.3)
    sess.imprint(np.zeros((64, 64, 3), np.float32))
    n0 = _optimize_z_jit._cache_size()
    # same tools again, different array params -> no retrace
    sess.increase_variance()
    sess.decrease_variance()  # direction is traced aux, same fn
    sess.brightness(0.7)
    sess.imprint(np.full((64, 64, 3), 0.5, np.float32))
    assert _optimize_z_jit._cache_size() == n0


def test_periodicity_objective_semantics():
    """The periodicity objective scores truly periodic content lower."""
    from esr_tpu.explore.objectives import periodicity_objective

    obj = periodicity_objective(period_x=8)
    xx = np.arange(32, dtype=np.float32)
    periodic = np.tile(np.sin(2 * np.pi * xx / 8)[None, None, :, None], (1, 32, 1, 3))
    aperiodic = np.random.default_rng(0).random((1, 32, 32, 3)).astype(np.float32)
    mask = jnp.ones((32, 32), jnp.float32)
    lp = float(obj(jnp.asarray(periodic), mask))
    la = float(obj(jnp.asarray(aperiodic), mask))
    assert lp < 1e-5 < la


def test_periodicity_no_border_wrap():
    """jnp.roll wraps, so without the validity band a full-image mask would
    compare opposite borders (r3 review finding). A linear ramp shifted by p
    differs by exactly p inside the valid band; the wrapped band (diff H-p)
    must not contribute."""
    from esr_tpu.explore.objectives import periodicity_objective

    h = 8
    obj = periodicity_objective(period_y=2)
    ramp = np.tile(
        np.arange(h, dtype=np.float32)[None, :, None, None], (1, 1, h, 3)
    )
    mask = jnp.ones((h, h), jnp.float32)
    loss = float(obj(jnp.asarray(ramp), mask))
    # valid rows 0..5 all have |diff| == 2; wrapped rows would push it to 3
    np.testing.assert_allclose(loss, 2.0, rtol=1e-5)


def test_d_score_is_region_sensitive(setup):
    """The realism meter must score the SELECTION, not the whole image: the
    objective's mask only gates gradients (it cannot change the value), so
    d_score crops to the selection's bucketed bbox before D sees it. A
    selection and the cleared (whole-image) state must generally score
    differently (r3 review finding)."""
    from esr_tpu.models.architecture import DiscriminatorVGG128

    _, params, _, forward, _, _ = setup
    lr_img = np.random.default_rng(9).random((1, 64, 64, 3)).astype(np.float32)
    d = DiscriminatorVGG128(nf=4)
    d_vars = d.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)), train=False)
    sess = ExplorationSession(forward, params, lr_img, n_steps=4)
    sess.set_discriminator(d_vars, nf=4)
    whole = sess.d_score()
    sess.select_rect(8, 8, 24, 24)  # 16px bucket, strict subregion
    region = sess.d_score()
    assert region != whole


def test_infer_d_nf_from_checkpoint():
    """Eval opts without a network_D block (or with a stale nf) must attach
    the D at the width it was trained with — inferred from conv0_0."""
    import numpy as np

    from esr_tpu.explore.cli import infer_d_nf

    params = {"conv0_0": {"kernel": np.zeros((3, 3, 3, 8), np.float32)}}
    assert infer_d_nf(params, default=64) == 8
    assert infer_d_nf({}, default=24) == 24  # malformed tree -> config value
    assert infer_d_nf(None, default=64) == 64


def test_optimize_z_adaptive_no_escalation_when_moving():
    """Healthy objective: the first round improves well past plateau_rel, so
    the LR never escalates and the result matches the appetite of a plain
    fixed-LR search."""
    from esr_tpu.explore.z_optimizer import optimize_z_adaptive

    def forward(params, lr_img, z):
        return jnp.repeat(jnp.repeat(z * 1.0, 4, axis=1), 4, axis=2)

    def objective(sr, mask):  # legacy f(sr, mask) path
        return jnp.mean((sr - 0.5) ** 2 * mask)

    lr_img = jnp.zeros((1, 8, 8, 3))
    z0 = jnp.zeros((1, 8, 8, 1))
    mask = jnp.ones((32, 32))
    z, losses, rounds = optimize_z_adaptive(
        forward, None, lr_img, z0, mask, objective, n_steps=32, lr=0.1,
        max_rounds=4,
    )
    assert losses[-1] < 0.01 * losses[0]
    assert all(r["lr"] == pytest.approx(0.1) for r in rounds[:1])
    assert rounds[0]["rel_improvement"] > 0.02  # no plateau in round 1


def test_optimize_z_adaptive_insensitive_region_stops_early():
    """Forward ignores Z entirely: every round plateaus, the LR escalates to
    lr_max, then the search stops early instead of burning max_rounds."""
    from esr_tpu.explore.z_optimizer import optimize_z_adaptive

    def forward(params, lr_img, z):
        return jnp.repeat(jnp.repeat(lr_img, 4, axis=1), 4, axis=2)

    def objective(sr, mask):
        return jnp.mean(sr)

    lr_img = jnp.asarray(np.random.default_rng(0).random((1, 8, 8, 3)), jnp.float32)
    z0 = jnp.zeros((1, 8, 8, 1))
    mask = jnp.ones((32, 32))
    z, losses, rounds = optimize_z_adaptive(
        forward, None, lr_img, z0, mask, objective, n_steps=8, lr=0.1,
        max_rounds=8, lr_boost=3.0, lr_max=0.9,
    )
    lrs = [r["lr"] for r in rounds]
    assert lrs == [0.1, pytest.approx(0.3), pytest.approx(0.9)], lrs  # escalate then stop
    assert len(rounds) < 8
    np.testing.assert_allclose(np.asarray(z), np.asarray(z0))  # grad is 0


def test_optimize_z_adaptive_escalation_beats_fixed_budget():
    """A far target at a too-small LR: the fixed search crawls; the adaptive
    search detects the plateau, boosts the LR (runtime hyperparameter — the
    jitted round program is compiled ONCE across all levels), and lands
    much closer on the same step budget."""
    from esr_tpu.explore.z_optimizer import (
        _optimize_z_round_jit,
        optimize_z,
        optimize_z_adaptive,
    )

    def forward(params, lr_img, z):
        return jnp.repeat(jnp.repeat(z * 1.0, 4, axis=1), 4, axis=2)

    def objective(sr, mask):
        return jnp.abs(jnp.mean(sr) - 60.0)  # far outside [-1,1] -> |z| rails

    lr_img = jnp.zeros((1, 8, 8, 3))
    z0 = jnp.zeros((1, 8, 8, 1))
    mask = jnp.ones((32, 32))
    # z_range=100: the range is NOT the binding constraint; LR is
    kw = dict(n_steps=40, lr=0.01, z_range=100.0)
    n_compiles_before = _optimize_z_round_jit._cache_size()
    z_a, losses_a, rounds = optimize_z_adaptive(
        forward, None, lr_img, z0, mask, objective, max_rounds=5,
        lr_boost=10.0, lr_max=10.0, **kw,
    )
    z_f, losses_f = optimize_z(
        forward, None, lr_img, z0, mask, objective,
        n_steps=40 * len(rounds), lr=0.01, z_range=100.0,
    )
    # strictly better on the same step budget (escalated LR moves ~10x
    # faster toward the far target once the plateau is detected)
    assert float(losses_a[-1]) < float(losses_f[-1]) - 5.0, (
        float(losses_a[-1]), float(losses_f[-1]), rounds,
    )
    assert any(r["lr"] > 0.01 for r in rounds), rounds
    # one compiled program served every escalation level
    assert _optimize_z_round_jit._cache_size() - n_compiles_before == 1


def test_session_imprint_adaptive_default(setup):
    """session.imprint runs the adaptive recipe by default and exposes the
    escalation report; opting out restores the fixed search."""
    model, params, cem, forward, lr_img, z0 = setup

    sess = ExplorationSession(forward, params, np.asarray(lr_img), n_steps=8)
    sess.select_rect(8, 8, 40, 40)
    target = np.zeros((1, 64, 64, 3), np.float32)
    losses = sess.imprint(target)
    assert losses.ndim == 1 and len(losses) >= 8
    assert sess.last_rounds is not None and len(sess.last_rounds) >= 1
    sess.undo()
    losses_f = sess.imprint(target, adaptive=False)
    assert sess.last_rounds is None
    assert len(losses_f) == 8


def test_optimize_z_adaptive_returns_best_not_last():
    """An escalated LR can overshoot so the trace ENDS worse than its best
    point; the returned Z must be the best evaluated one (its objective
    value == min of the trace, within one re-evaluation)."""
    from esr_tpu.explore.z_optimizer import optimize_z_adaptive

    def forward(params, lr_img, z):
        return jnp.repeat(jnp.repeat(z * 1.0, 4, axis=1), 4, axis=2)

    def objective(sr, mask):
        return jnp.abs(jnp.mean(sr) - 0.35)

    lr_img = jnp.zeros((1, 8, 8, 3))
    z0 = jnp.zeros((1, 8, 8, 1))
    mask = jnp.ones((32, 32))
    z, losses, rounds = optimize_z_adaptive(
        forward, None, lr_img, z0, mask, objective, n_steps=10, lr=0.5,
        max_rounds=4, lr_boost=3.0, lr_max=4.5,  # huge steps -> oscillation
    )
    returned = float(objective(forward(None, lr_img, z), mask))
    assert returned <= float(np.min(losses)) + 1e-6, (returned, float(np.min(losses)))


def test_optimize_z_adaptive_widens_z_range_after_lr_ladder():
    """The z-range escalation phase (r5 flagship diagnostic): an objective
    reachable ONLY outside the starting clip box plateaus through the whole
    LR ladder, then widens the box to z_range_max and reaches the target.
    The bound is a traced scalar — still exactly one compile."""
    from esr_tpu.explore.z_optimizer import (
        _optimize_z_round_jit,
        optimize_z_adaptive,
    )

    def forward(params, lr_img, z):
        return jnp.repeat(jnp.repeat(z * 1.0, 4, axis=1), 4, axis=2)

    def objective(sr, mask):
        return jnp.abs(jnp.mean(sr) - 2.5)  # outside [-1, 1]

    lr_img = jnp.zeros((1, 8, 8, 3))
    z0 = jnp.zeros((1, 8, 8, 1))
    mask = jnp.ones((32, 32))
    n_before = _optimize_z_round_jit._cache_size()
    z, losses, rounds = optimize_z_adaptive(
        forward, None, lr_img, z0, mask, objective, n_steps=25, lr=0.3,
        max_rounds=10, lr_boost=3.0, lr_max=0.9,
        z_range=1.0, z_range_boost=2.0, z_range_max=4.0,
    )
    assert any(r["z_range"] > 1.0 for r in rounds), rounds
    assert float(np.abs(np.asarray(z)).max()) > 1.0  # left the trained box
    assert float(losses[-1]) < 0.6, (float(losses[-1]), rounds)
    assert _optimize_z_round_jit._cache_size() - n_before == 1


def test_diverse_padded_anchors_match_unpadded(setup):
    """Zero-weight padded anchor rows change nothing (the padded-anchor
    single-compile design of propose_alternatives, r5)."""
    from esr_tpu.explore.objectives import random_diverse_objective

    rng = np.random.default_rng(3)
    sr = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    anchors = jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32)
    mask = jnp.ones((16, 16), jnp.float32)
    plain = random_diverse_objective(anchors)
    padded = jnp.concatenate([anchors, jnp.zeros((3, 16, 16, 3))], axis=0)
    w = jnp.asarray([1.0, 1.0, 0.0, 0.0, 0.0], jnp.float32)
    pad = random_diverse_objective(padded, anchor_weights=w)
    np.testing.assert_allclose(
        float(plain(sr, mask)), float(pad(sr, mask)), rtol=1e-6
    )


@pytest.mark.slow
def test_propose_alternatives_single_compile(setup):
    """All k candidates (growing live-anchor count) share ONE compiled search
    program: the anchors aux is padded to a fixed capacity, so the jit cache
    gains exactly one entry for the whole pick-one-of-k run."""
    from esr_tpu.explore.z_optimizer import _optimize_z_jit

    _, params, _, forward, lr_img, _ = setup
    sess = ExplorationSession(forward, params, np.asarray(lr_img), n_steps=2)
    sess.select_rect(0, 0, 32, 32)
    n_before = _optimize_z_jit._cache_size()
    cands = sess.propose_alternatives(k=3, seed=0)
    assert len(cands) == 3
    assert _optimize_z_jit._cache_size() - n_before == 1


def test_histogram_target_sizes_share_one_program(setup):
    """Differently-sized histogram target patches must NOT retrace the
    search: the target's soft histogram is precomputed to a fixed
    (n_bins, C) aux at build time (r5)."""
    from esr_tpu.explore import histogram_objective
    from esr_tpu.explore.z_optimizer import _optimize_z_jit

    _, params, _, forward, lr_img, _ = setup
    sess = ExplorationSession(forward, params, np.asarray(lr_img), n_steps=2)
    sess.select_rect(0, 0, 32, 32)
    rng = np.random.default_rng(0)
    sess.match_histogram(rng.random((8, 8, 3)).astype(np.float32), adaptive=False)
    n_before = _optimize_z_jit._cache_size()
    sess.match_histogram(rng.random((13, 7, 3)).astype(np.float32), adaptive=False)
    sess.match_histogram(rng.random((64, 3)).astype(np.float32), adaptive=False)
    assert _optimize_z_jit._cache_size() == n_before

    # and the precomputed-histogram objective equals the direct formulation
    obj = histogram_objective(np.full((4, 4, 3), 0.5, np.float32))
    sr = jnp.asarray(rng.random((1, 8, 8, 3)), jnp.float32)
    mask = jnp.ones((8, 8), jnp.float32)
    dark = histogram_objective(np.zeros((4, 4, 3), np.float32))
    # an SR near 0.5 matches the 0.5-target better than the 0-target
    sr_mid = jnp.full((1, 8, 8, 3), 0.5)
    assert float(obj(sr_mid, mask)) < float(dark(sr_mid, mask))


def test_periodicity_dynamic_matches_static():
    """The traced-period objective is the exact twin of the static-shift
    formulation, for integral and fractional 1D/2D periods."""
    from esr_tpu.explore.objectives import _periodicity_fn, periodicity_objective

    rng = np.random.default_rng(5)
    sr = jnp.asarray(rng.random((1, 24, 20, 3)), jnp.float32)
    mask = np.zeros((24, 20), np.float32)
    mask[2:22, 1:19] = 1.0
    mask = jnp.asarray(mask)
    for py, px in [(8.0, 0.0), (0.0, 6.0), (8.0, 6.0), (5.5, 0.0), (3.25, 7.5)]:
        shifts = tuple(
            s for s in [(py, 0.0) if py else None, (0.0, px) if px else None] if s
        )
        static = _periodicity_fn(shifts)(sr, mask, {})
        dyn = periodicity_objective(py, px)(sr, mask)
        np.testing.assert_allclose(
            float(static), float(dyn), rtol=2e-5, err_msg=f"py={py} px={px}"
        )


def test_periodicity_period_sweep_single_compile(setup):
    """Changing the period must not recompile the jitted search."""
    from esr_tpu.explore.z_optimizer import _optimize_z_jit

    _, params, _, forward, lr_img, _ = setup
    sess = ExplorationSession(forward, params, np.asarray(lr_img), n_steps=2)
    sess.select_rect(0, 0, 32, 32)
    sess.periodicity(period_x=8)
    n_before = _optimize_z_jit._cache_size()
    sess.periodicity(period_x=5)
    sess.periodicity(period_y=3.5, period_x=7.25)
    assert _optimize_z_jit._cache_size() == n_before
