"""Editor view-model tests (SURVEY.md §2.16, VERDICT r1 next-step #6).

The Qt GUI is widget wiring only; every editor capability — selection modes
via the pointer protocol, text/image imprint, histogram transfer, the
alternatives picker, Z-map rendering, per-tool progress, session save/load —
is driven here headlessly against a live (tiny) explorable model."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from esr_tpu.cem import CEMConf, make_cem
from esr_tpu.explore import EditorViewModel, ExplorationSession
from esr_tpu.explore.viewmodel import _mask_boundary, render_text_mask
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

    return cem, forward, params, np.asarray(lr_img)


def make_vm(setup, n_steps=4):
    cem, forward, params, lr_img = setup
    sess = ExplorationSession(forward, params, lr_img, n_steps=n_steps)
    return EditorViewModel(sess), cem


def test_rect_selection_via_pointer_protocol(setup):
    vm, _ = make_vm(setup)
    vm.pointer_down(8, 8)
    vm.pointer_drag(30, 40)
    vm.pointer_up(31, 47)
    mask = vm.selection_mask
    assert mask is not None
    assert mask[8:32, 8:48].all() and mask.sum() == 24 * 40
    # drag in any direction normalizes
    vm.pointer_down(50, 60)
    vm.pointer_up(40, 43)
    assert vm.selection_mask[40:51, 43:61].all()


def test_polygon_selection_via_pointer_protocol(setup):
    vm, _ = make_vm(setup)
    vm.set_selection_mode("polygon")
    assert "3 vertices" in vm.finish_polygon() or "at least" in vm.finish_polygon()
    for y, x in [(8, 8), (8, 40), (40, 40), (40, 8)]:
        vm.pointer_down(y, x)
    msg = vm.finish_polygon()
    assert "polygon" in msg
    mask = vm.selection_mask
    assert mask[20, 20] == 1.0 and mask[50, 50] == 0.0
    # vertex buffer cleared after commit
    assert vm._poly_vertices == []


def test_brush_selection_via_pointer_protocol(setup):
    vm, _ = make_vm(setup)
    vm.set_selection_mode("brush")
    vm.brush_radius = 4
    vm.pointer_down(10, 10)
    vm.pointer_drag(10, 20)
    vm.pointer_up(10, 30)
    mask = vm.selection_mask
    assert mask[10, 10] == 1 and mask[10, 20] == 1 and mask[10, 30] == 1
    assert mask[40, 40] == 0
    # out-of-bounds pointer coords are clipped, not fatal
    vm.pointer_down(-5, 1000)


def test_selection_mode_validation(setup):
    vm, _ = make_vm(setup)
    with pytest.raises(ValueError):
        vm.set_selection_mode("lasso")
    vm.set_selection_mode("brush")
    vm.clear_selection()
    assert vm.selection_mask is None


def test_render_display_and_zmap(setup):
    vm, _ = make_vm(setup)
    h, w = vm.session.hr_shape
    img = vm.render_display()
    assert img.shape == (h, w, 3) and img.dtype == np.uint8
    # selection outline appears
    vm.pointer_down(8, 8)
    vm.pointer_up(31, 31)
    img_sel = vm.render_display()
    assert (img_sel[8, 8:32] == (255, 255, 0)).all(axis=-1).any()
    assert not (img == img_sel).all()
    # z-map: zero Z renders white; positive region turns red-ish
    zimg = vm.zmap_image()
    assert zimg.shape == (h, w * vm.session.nz, 3)
    assert (zimg == 255).all()
    vm.session.z[0, :4, :4, 0] = 1.0
    zimg = vm.zmap_image()
    assert (zimg[0, 0] == (255, 0, 0)).all()
    vm.show_zmap = True
    overlay = vm.render_display()
    assert overlay.shape == (h, w, 3)


def test_mask_boundary_helper():
    m = np.zeros((8, 8), np.float32)
    m[2:6, 2:6] = 1
    edge = _mask_boundary(m)
    assert edge[2, 2] and edge[2, 5] and edge[5, 5]
    assert not edge[3, 3]  # interior
    assert edge.sum() == 12  # 4x4 block perimeter


def test_render_text_mask():
    alpha = render_text_mask("SR", (32, 64))
    assert alpha.shape == (32, 64) and 0.0 <= alpha.min() and alpha.max() <= 1.0
    assert alpha.max() > 0.5  # some ink
    # auto-shrink: long text in a small box still fits (no crash, some ink)
    tiny = render_text_mask("HELLO WORLD", (10, 30))
    assert tiny.max() > 0
    with pytest.raises(ValueError):
        render_text_mask("x", (0, 10))


@pytest.mark.slow
def test_imprint_text_tool_consistent(setup):
    vm, cem = make_vm(setup, n_steps=6)
    vm.pointer_down(8, 8)
    vm.pointer_up(55, 55)
    msg = vm.imprint_text("A", color=(1.0, 1.0, 1.0))
    assert "imprint" in msg and "loss" in msg
    sr = vm.session.current_sr()
    lr_back = np.asarray(cem.downsample(jnp.asarray(sr)))
    assert np.abs(lr_back - vm.session.lr_img).max() < 1e-4


@pytest.mark.slow
def test_imprint_image_patch_sized_to_bbox(setup):
    vm, _ = make_vm(setup)
    vm.pointer_down(8, 8)
    vm.pointer_up(39, 39)  # bbox 32x32
    patch = np.full((32, 32, 3), 0.9, np.float32)
    msg = vm.imprint_image(patch)
    assert "imprint" in msg
    # arbitrary-size patch gets resized to the bbox
    msg = vm.imprint_image(np.full((13, 17, 3), 0.1, np.float32))
    assert "imprint" in msg


@pytest.mark.slow
def test_alternatives_picker_choose_one_of_k(setup):
    vm, cem = make_vm(setup)
    vm.pointer_down(0, 0)
    vm.pointer_up(31, 31)
    z_before = vm.session.z.copy()
    progress = []
    vm.on_progress = lambda done, total, losses: progress.append((done, total))
    msg = vm.generate_alternatives(k=2, seed=1)
    assert "2 alternatives" in msg and len(vm.candidates) == 2
    # proposing commits nothing
    np.testing.assert_array_equal(vm.session.z, z_before)
    assert (1, 2) in progress and (2, 2) in progress
    thumb = vm.candidate_image(1)
    assert thumb.dtype == np.uint8 and thumb.shape == (*vm.session.hr_shape, 3)
    # candidates differ and are all consistent
    assert np.abs(vm.candidates[0][1] - vm.candidates[1][1]).max() > 1e-5
    for z_c, sr_c in vm.candidates:
        lr_back = np.asarray(cem.downsample(jnp.asarray(sr_c)))
        assert np.abs(lr_back - vm.session.lr_img).max() < 1e-4
    chosen = vm.candidates[1][0].copy()
    vm.pick_alternative(1)
    np.testing.assert_array_equal(vm.session.z, chosen)
    assert vm.candidates == []
    # picking is one undo step
    vm.undo()
    np.testing.assert_array_equal(vm.session.z, z_before)
    # cancel path
    vm.generate_alternatives(k=1, seed=2)
    vm.cancel_alternatives()
    assert vm.candidates == []
    with pytest.raises(IndexError):
        vm.pick_alternative(0)


def test_tool_progress_events(setup):
    """Chunked progressive Z-search: progress fires during a tool run and the
    chunked result matches the single-shot program exactly (same math)."""
    from esr_tpu.explore.z_optimizer import optimize_z
    from esr_tpu.explore.objectives import variance_objective

    cem, forward, params, lr_img = setup
    sess = ExplorationSession(forward, params, lr_img, n_steps=8)
    vm = EditorViewModel(sess)
    events = []
    vm.on_progress = lambda done, total, losses: events.append((done, total, len(losses)))
    vm.variance(+1)
    assert events, "no progress events fired"
    dones = [e[0] for e in events]
    assert dones == sorted(dones) and events[-1][0] == events[-1][1] == 8
    assert events[-1][2] == 8  # cumulative loss trace

    # equivalence: chunked == single-shot
    z0 = jnp.zeros((1, 16, 16, 1))
    mask = jnp.ones((64, 64), jnp.float32)
    obj = variance_objective(1.0)
    z_a, l_a = optimize_z(forward, params, jnp.asarray(lr_img), z0, mask, obj, n_steps=6, lr=0.2)
    z_b, l_b = optimize_z(
        forward, params, jnp.asarray(lr_img), z0, mask, obj, n_steps=6, lr=0.2, n_chunks=3
    )
    np.testing.assert_allclose(np.asarray(z_a), np.asarray(z_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(l_a), np.asarray(l_b), atol=1e-6)


def test_chunked_lr_decay_matches_single_shot(setup):
    """The LR schedule's step count travels in the carried opt_state."""
    from esr_tpu.explore.z_optimizer import optimize_z
    from esr_tpu.explore.objectives import variance_objective

    _, forward, params, lr_img = setup
    z0 = jnp.zeros((1, 16, 16, 1))
    mask = jnp.ones((64, 64), jnp.float32)
    obj = variance_objective(1.0)
    kw = dict(n_steps=6, lr=0.3, lr_decay=0.1)
    z_a, l_a = optimize_z(forward, params, jnp.asarray(lr_img), z0, mask, obj, **kw)
    z_b, l_b = optimize_z(
        forward, params, jnp.asarray(lr_img), z0, mask, obj, n_chunks=2, **kw
    )
    np.testing.assert_allclose(np.asarray(z_a), np.asarray(z_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(l_a), np.asarray(l_b), atol=1e-6)


@pytest.mark.slow
def test_session_save_load_roundtrip(setup, tmp_path):
    vm, _ = make_vm(setup)
    vm.pointer_down(8, 8)
    vm.pointer_up(31, 31)
    vm.variance(+1)
    z_saved = vm.session.z.copy()
    mask_saved = vm.selection_mask.copy()
    path = str(tmp_path / "session.npz")
    vm.save_session(path)
    vm.variance(-1)
    vm.clear_selection()
    vm.load_session(path)
    np.testing.assert_array_equal(vm.session.z, z_saved)
    np.testing.assert_array_equal(vm.selection_mask, mask_saved)
    # history cleared on load: undo is a no-op
    vm.undo()
    np.testing.assert_array_equal(vm.session.z, z_saved)


def test_cli_drives_viewmodel_commands(setup, tmp_path):
    """New editor commands flow through the shared view-model."""
    from esr_tpu.explore.cli import run_command

    cem, forward, params, lr_img = setup
    sess = ExplorationSession(forward, params, lr_img, n_steps=2)
    assert "polygon" in run_command(sess, "polygon 8 8 8 40 40 40 40 8")
    assert "loss" in run_command(sess, "text HI")
    assert "alternatives ready" in run_command(sess, "alternatives 2")
    assert "applied" in run_command(sess, "pick 0")
    zp = tmp_path / "z.png"
    assert "z-map" in run_command(sess, f"zmap {zp}") and zp.exists()
    sp = tmp_path / "s.npz"
    assert "state saved" in run_command(sess, f"savez {sp}")
    assert "loaded" in run_command(sess, f"loadz {sp}")
    assert "cleared" in run_command(sess, "clear")
    assert "bad arguments" in run_command(sess, "polygon 1 2 3")
    assert "bad arguments" in run_command(sess, "pick 7")


@pytest.mark.slow
def test_sr_cache_and_rubber_band(setup):
    """current_sr() is cached between Z mutations (pointer-event refreshes
    must not redispatch the forward), and an in-progress rect drag renders a
    live rubber band (code-review r2 findings)."""
    vm, _ = make_vm(setup)
    sess = vm.session
    calls = {"n": 0}
    inner = sess._forward

    def counting_forward(p, lr, z):
        calls["n"] += 1
        return inner(p, lr, z)

    sess._forward = counting_forward
    vm.render_display()
    vm.render_display()
    vm.render_display()
    assert calls["n"] == 1, calls  # cached after the first render
    # live rubber band during a rect drag, still no recompute
    vm.pointer_down(8, 8)
    vm.pointer_drag(20, 30)
    img = vm.render_display()
    assert (img[8, 8:31] == (255, 255, 0)).all()
    assert (img[8:21, 30] == (255, 255, 0)).all()
    assert calls["n"] == 1, calls
    vm.pointer_up(20, 30)
    # a Z mutation invalidates the cache -> exactly one new forward... the
    # tool itself runs the search (its own dispatches); count only render
    before = calls["n"]
    vm.smooth()
    n_after_tool = calls["n"]
    vm.render_display()
    assert calls["n"] == n_after_tool + 1
    vm.render_display()
    assert calls["n"] == n_after_tool + 1


def test_unrolled_checkpoint_migrates_to_scan_layout(setup, tmp_path):
    """An all_layers checkpoint saved in the unrolled rrdb{i}/latent_proj{i}
    layout auto-migrates to the scan layout on load (code-review r2)."""
    import orbax.checkpoint as ocp

    from esr_tpu.models.base_model import BaseModel

    kw = dict(nf=8, nb=2, gc=4, scale=4, num_latent_channels=1,
              latent_input="all_layers")
    unrolled = RRDBNet(scan_blocks=False, **kw)
    scanned = RRDBNet(scan_blocks=True, **kw)
    x = jnp.zeros((1, 8, 8, 3))
    z = jnp.zeros((1, 8, 8, 1))
    pu = unrolled.init(jax.random.PRNGKey(3), x, z)["params"]
    path = str(tmp_path / "old_G")
    ocp.PyTreeCheckpointer().save(path, jax.device_get({"params": pu}))

    ps_template = scanned.init(jax.random.PRNGKey(4), x, z)["params"]
    bm = BaseModel({"path": {}})
    loaded = bm.load_network(path, ps_template)
    y_scan = scanned.apply({"params": loaded}, x, z)
    y_unrolled = unrolled.apply({"params": pu}, x, z)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_unrolled), atol=3e-5)


def test_migration_refuses_block_count_mismatch(setup, tmp_path):
    """Loading an unrolled checkpoint with MORE rrdb blocks than the live
    scan model must error, not silently truncate (ADVICE r2)."""
    import orbax.checkpoint as ocp
    import pytest

    from esr_tpu.models.base_model import BaseModel

    kw = dict(nf=8, gc=4, scale=4, num_latent_channels=1,
              latent_input="all_layers")
    big = RRDBNet(scan_blocks=False, nb=3, **kw)
    small = RRDBNet(scan_blocks=True, nb=2, **kw)
    x = jnp.zeros((1, 8, 8, 3))
    z = jnp.zeros((1, 8, 8, 1))
    pu = big.init(jax.random.PRNGKey(3), x, z)["params"]
    path = str(tmp_path / "big_G")
    ocp.PyTreeCheckpointer().save(path, jax.device_get({"params": pu}))

    tmpl = small.init(jax.random.PRNGKey(4), x, z)["params"]
    bm = BaseModel({"path": {}})
    with pytest.raises(ValueError, match="refusing to silently truncate"):
        bm.load_network(path, tmpl)


def test_search_strength_controls(setup):
    """`steps`/`zmax` editor controls (r5): adjust the Z-search budget and
    the adaptive escalation ceiling through the view-model/CLI."""
    from esr_tpu.explore.cli import run_command

    vm, _ = make_vm(setup)
    sess = vm.session
    assert "steps set to 5" in vm.set_search_steps(5)
    assert sess._optimizer.n_steps == 5
    assert "3.5" in vm.set_z_range_max(3.5) and sess.z_range_max == 3.5
    assert "disabled" in vm.set_z_range_max(0) and sess.z_range_max is None
    # CLI wiring
    assert "steps set to 4" in run_command(sess, "steps 4")
    assert "ceiling set to 2" in run_command(sess, "zmax 2.0")
    with pytest.raises(ValueError):
        vm.set_search_steps(0)
