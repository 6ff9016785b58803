"""Multi-chip sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4:
shard_map DP 1-vs-8 equivalence; spatial halo-exchange inference)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from esr_tpu.models.architecture import RRDBNet
from esr_tpu.parallel import (
    make_dp_train_step,
    make_mesh,
    shard_batch,
    spatial_sharded_forward,
    tiled_forward,
)


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8, "spatial": 1}
    mesh2 = make_mesh(8, spatial=4)
    assert mesh2.shape == {"data": 2, "spatial": 4}


def _tiny_setup():
    model = RRDBNet(nf=8, nb=1, gc=4, scale=4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
    return model, params


def test_dp_train_step_matches_single_device():
    import optax

    model, params = _tiny_setup()
    tx = optax.sgd(1e-2)
    opt_state = tx.init(params)

    def train_step(state, batch, rng):
        params, opt_state = state

        def loss_fn(p):
            sr = model.apply({"params": p}, batch["LR"])
            return jnp.mean(jnp.abs(sr - batch["HR"]))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state), loss

    rng = jax.random.PRNGKey(0)
    data = {
        "LR": jnp.asarray(np.random.default_rng(0).random((8, 8, 8, 3)), jnp.float32),
        "HR": jnp.asarray(np.random.default_rng(1).random((8, 32, 32, 3)), jnp.float32),
    }

    (p_single, _), loss_single = jax.jit(train_step)((params, opt_state), data, rng)

    mesh = make_mesh(8)
    dp_step = make_dp_train_step(train_step, mesh, n_state_args=1, n_extra_args=1, donate=False)
    batch_sharded = shard_batch(data, mesh)
    (p_dp, _), loss_dp = dp_step((params, opt_state), batch_sharded, rng)

    assert float(loss_single) == pytest.approx(float(loss_dp), rel=1e-5)
    a = jax.tree.leaves(p_single)[0]
    b = jax.tree.leaves(p_dp)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_dp_composes_with_fold():
    """fold=2 (batch->channel MXU folding) under 8-way DP: each device's
    local batch folds independently; result equals the unfolded DP step."""
    mesh = make_mesh(8)
    data = {
        "LR": jnp.asarray(np.random.default_rng(0).random((16, 8, 8, 3)), jnp.float32),
        "HR": jnp.asarray(np.random.default_rng(1).random((16, 32, 32, 3)), jnp.float32),
    }
    losses = {}
    for fold in (1, 2):
        model = RRDBNet(nf=8, nb=1, gc=4, scale=4, fold=fold)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]

        def step(params, batch, rng):
            sr = model.apply({"params": params}, batch["LR"])
            return params, jnp.mean(jnp.abs(sr - batch["HR"]))

        dp_step = make_dp_train_step(step, mesh, n_state_args=1, n_extra_args=1, donate=False)
        _, losses[fold] = dp_step(params, shard_batch(data, mesh), jax.random.PRNGKey(1))
    assert float(losses[1]) == pytest.approx(float(losses[2]), abs=1e-6)


@pytest.mark.slow
def test_spatial_halo_exchange_exact_for_local_op():
    """A local operator whose receptive radius fits in the halo is EXACTLY
    reproduced by the sharded forward (validates the ppermute mechanics and
    edge handling)."""
    kern = jnp.asarray(np.random.default_rng(4).random((5, 5, 1, 3)), jnp.float32)

    def apply_fn(p, lr, z=None):
        # edge-padded conv (radius 2) + nearest 4x upsample
        x = jnp.pad(lr, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="edge")
        y = jax.lax.conv_general_dilated(
            x, jnp.tile(kern, (1, 1, 1, 1)), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=3,
        )
        return jnp.repeat(jnp.repeat(y, 4, axis=1), 4, axis=2)

    mesh = make_mesh(8, spatial=8)
    lr = jnp.asarray(np.random.default_rng(2).random((1, 64, 16, 3)), jnp.float32)
    full = apply_fn(None, lr)
    fwd = spatial_sharded_forward(apply_fn, mesh, scale=4, halo=4)
    sharded = fwd(None, lr)
    assert sharded.shape == full.shape
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(full), atol=1e-5)


@pytest.mark.slow
def test_spatial_sharded_forward_rrdb_interior():
    """RRDB receptive field exceeds any practical halo; error at strip
    boundaries decays through the 0.2-scaled residuals — validate interior
    agreement at a realistic halo."""
    model, params = _tiny_setup()

    def apply_fn(p, lr, z=None):
        return model.apply({"params": p}, lr)

    mesh = make_mesh(8, spatial=4)
    lr = jnp.asarray(np.random.default_rng(2).random((1, 64, 16, 3)), jnp.float32)
    full = apply_fn(params, lr)
    fwd = spatial_sharded_forward(apply_fn, mesh, scale=4, halo=8)
    sharded = fwd(params, lr)
    assert sharded.shape == full.shape
    # exclude the image top/bottom (zero-pad vs replicate-halo edge semantics)
    err = np.abs(np.asarray(sharded) - np.asarray(full))[:, 32:-32]
    assert err.mean() < 2e-3, err.mean()


def test_spatial_halo_floor_flagship_depth():
    """Guard for the measured r3 halo law (spatial.py docstring): at FLAGSHIP
    depth (nb=23/nf=64) the interior error already hits its f32 floor
    (~3e-5) by halo=8 — a regression here means the halo default needs
    re-deriving."""
    from esr_tpu.models.architecture import RRDBNet

    model = RRDBNet(nf=64, nb=23, gc=32, scale=4, num_latent_channels=1)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1, 8, 8, 1))
    )["params"]

    def apply_fn(p, lr, z):
        return model.apply({"params": p}, lr, z)

    mesh = make_mesh(8, spatial=4)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((1, 64, 32, 3)), jnp.float32)
    z = jnp.asarray(rng.uniform(-1, 1, (1, 64, 32, 1)), jnp.float32)
    full = jax.jit(apply_fn)(params, lr, z)
    fwd = spatial_sharded_forward(apply_fn, mesh, scale=4, halo=8)
    sharded = fwd(params, lr, z)
    # exclude one edge strip top/bottom (zero-pad vs replicate-halo edges)
    err = np.abs(np.asarray(sharded) - np.asarray(full))[:, 64:-64]
    assert err.max() < 1e-4, err.max()


def test_tiled_forward_matches_full():
    from esr_tpu.cem import CEMConf, make_cem

    model, params = _tiny_setup()
    cem = make_cem(CEMConf(scale=4))

    def apply_fn(p, lr, z=None):
        return model.apply({"params": p}, lr)

    lr = jnp.asarray(np.random.default_rng(3).random((1, 40, 56, 3)), jnp.float32)
    full = cem.project(apply_fn(params, lr), lr)
    # RRDB receptive field far exceeds any tile overlap, so tiling is an
    # approximation (as is the reference GUI's region cropping); the contract
    # is: error decreases with overlap, and CEM consistency stays exact.
    errs = {}
    for overlap in (4, 12):
        tiled = tiled_forward(
            apply_fn, params, lr, tile=32, overlap=overlap, scale=4, cem=cem
        )
        assert tiled.shape == full.shape
        errs[overlap] = float(np.abs(np.asarray(tiled) - np.asarray(full)).mean())
        # consistency is exact even for tiled inference (CEM projected globally)
        lr_back = np.asarray(cem.downsample(tiled))
        assert np.abs(lr_back - np.asarray(lr)).max() < 5e-5
    assert errs[12] < errs[4], errs


def test_tiled_forward_bf16_generator():
    """The stitch buffer is f32; a bf16-compute generator (the repo default)
    must be cast on update, not crash dynamic_update_slice (r3 review)."""
    model, params = _tiny_setup()

    def apply_fn(p, lr, z=None):
        return model.apply({"params": p}, lr.astype(jnp.bfloat16)).astype(jnp.bfloat16)

    lr = jnp.asarray(np.random.default_rng(4).random((1, 40, 40, 3)), jnp.float32)
    out = tiled_forward(apply_fn, params, lr, tile=32, overlap=4, scale=4)
    assert out.shape == (1, 160, 160, 3)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_multihost_helpers_single_process():
    """Degenerate single-process paths of the multi-host scaffolding."""
    from esr_tpu.parallel.multihost import global_device_array, host_shard, init_distributed

    pi, pc = init_distributed()
    assert (pi, pc) == (0, 1)
    items = list(range(10))
    assert host_shard(items) == items
    assert host_shard(items, process_index=1, process_count=4) == [1, 5, 9]

    mesh = make_mesh(8)
    batch = {"HR": np.ones((8, 4, 4, 3), np.float32)}
    garr = global_device_array(batch, mesh)
    assert garr["HR"].shape == (8, 4, 4, 3)
    assert len(garr["HR"].sharding.device_set) == 8


@pytest.mark.slow
def test_spatial_sharded_forward_with_z():
    """Halo exchange also carries the Z map (explorable spatial inference)."""
    model = RRDBNet(nf=8, nb=1, gc=4, scale=4, num_latent_channels=1)
    lr = jnp.asarray(np.random.default_rng(7).random((1, 32, 16, 3)), jnp.float32)
    z = jnp.asarray(np.random.default_rng(8).uniform(-1, 1, (1, 32, 16, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), lr, z)["params"]

    def apply_fn(p, l, zz=None):
        return model.apply({"params": p}, l, zz)

    mesh = make_mesh(8, spatial=4)
    fwd = spatial_sharded_forward(apply_fn, mesh, scale=4, halo=8)
    sharded = fwd(params, lr, z)
    full = apply_fn(params, lr, z)
    assert sharded.shape == full.shape
    err = np.abs(np.asarray(sharded) - np.asarray(full))[:, 32:-32]
    assert err.mean() < 5e-3


@pytest.mark.slow
def test_dp_chunked_multi_step_matches_single():
    """Chunked dispatch (k steps scanned in one program) under 8-way DP
    (batch_dim=1: the step axis stays unsharded, N shards over 'data')
    matches the single-device chunked run."""
    import optax

    from esr_tpu.data.pipeline import make_train_pipeline
    from esr_tpu.models.base_model import TrainState
    from esr_tpu.models.sr_model import make_sr_multi_step, make_sr_train_step
    from esr_tpu.parallel.dp import replicate_states

    model, params = _tiny_setup()
    pipeline = make_train_pipeline(scale=4)
    multi = make_sr_multi_step(make_sr_train_step(model, pipeline))
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(1e-3)
    )
    hrs = np.random.default_rng(0).random((3, 8, 32, 32, 3)).astype(np.float32)
    rng_base = jax.random.PRNGKey(5)

    s1, m1 = jax.jit(multi)(state, hrs, rng_base, jnp.int32(1))

    mesh = make_mesh(8)
    dp_multi = make_dp_train_step(
        multi, mesh, n_state_args=1, n_extra_args=2, batch_dim=1, donate=False
    )
    s2, m2 = dp_multi(replicate_states(state, mesh), hrs, rng_base, jnp.int32(1))

    np.testing.assert_allclose(
        np.asarray(m1["l_pix"]), np.asarray(m2["l_pix"]), rtol=1e-5
    )
    for x, y in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-3)


def test_dp_chunked_rejects_unshardable_inner_batch():
    """batch_dim=1 validates the INNER batch dim (N), not the step axis."""
    from esr_tpu.parallel.dp import _check_divisible

    mesh = make_mesh(8)
    good = np.zeros((3, 8, 4, 4, 3))  # k=3 (not divisible by 8) is fine
    _check_divisible(good, mesh.shape["data"], dim=1)
    bad = np.zeros((8, 3, 4, 4, 3))  # N=3 does not divide 8
    with pytest.raises(ValueError, match="does not divide"):
        _check_divisible(bad, mesh.shape["data"], dim=1)


@pytest.mark.slow
def test_spatial_fold_apply_matches_whole():
    """spatial_fold_apply (single-device H-strip batching that re-enables
    the batch->channel fold for batch-1 eval) matches the whole-image
    unfolded forward: strip windows are clipped to the true image (edge
    conv semantics preserved) and the halo covers the residual decay."""
    from esr_tpu.parallel import spatial_fold_apply

    kw = dict(nf=16, nb=2, gc=8, scale=4, num_latent_channels=1)
    folded = RRDBNet(fold=2, **kw)
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 48, 3)), jnp.float32)
    z = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (1, 64, 48, 1)), jnp.float32)
    params = RRDBNet(**kw).init(jax.random.PRNGKey(0), x, z)["params"]

    def apply_raw(p, lr, zz):
        return folded.apply({"params": p}, lr, zz)

    whole = apply_raw(params, x, z)  # batch 1 -> runs unfolded
    wrapped = spatial_fold_apply(apply_raw, fold=2, halo=12, scale=4)
    split = wrapped(params, x, z)  # 2 strips -> actually folded
    assert split.shape == whole.shape
    np.testing.assert_allclose(np.asarray(split), np.asarray(whole), atol=1e-4)

    # odd H: windows clip, crops stay exact
    x_odd, z_odd = x[:, :50], z[:, :50]
    split_odd = wrapped(params, x_odd, z_odd)
    whole_odd = apply_raw(params, x_odd, z_odd)
    assert split_odd.shape == whole_odd.shape
    np.testing.assert_allclose(np.asarray(split_odd), np.asarray(whole_odd), atol=1e-4)

    # divisible batches / too-short images pass through untouched (no split)
    x2 = jnp.concatenate([x, x], 0)
    z2 = jnp.concatenate([z, z], 0)
    np.testing.assert_array_equal(
        np.asarray(wrapped(params, x2, z2)), np.asarray(apply_raw(params, x2, z2))
    )
    tiny = x[:, :20]
    np.testing.assert_array_equal(
        np.asarray(wrapped(params, tiny, z[:, :20])),
        np.asarray(apply_raw(params, tiny, z[:, :20])),
    )

    # z=None path (explorable model, default zero latent)
    np.testing.assert_allclose(
        np.asarray(wrapped(params, x, None)),
        np.asarray(apply_raw(params, x, None)),
        atol=1e-4,
    )


@pytest.mark.slow
def test_pipelined_trunk_matches_sequential():
    """GPipe pipelining of the scan trunk over a 4-stage mesh is the SAME
    math as the sequential forward (microbatching only splits the batch),
    and gradients flow through ppermute correctly (autodiff = pipelined
    backprop)."""
    from esr_tpu.parallel import make_stage_mesh, pipelined_rrdb_apply

    model = RRDBNet(nf=8, nb=8, gc=4, scale=4, num_latent_channels=1)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((8, 8, 8, 3)), jnp.float32)
    z = jnp.asarray(rng.uniform(-1, 1, (8, 8, 8, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), lr, z)

    mesh = make_stage_mesh(4)
    assert mesh.shape == {"stage": 4}
    pp_apply = pipelined_rrdb_apply(model, mesh, n_micro=4)

    want = model.apply(variables, lr, z)
    got = jax.jit(pp_apply)(variables, lr, z)
    assert got.shape == want.shape == (8, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    # z=None (explorable default-zero latent) path
    np.testing.assert_allclose(
        np.asarray(jax.jit(pp_apply)(variables, lr, None)),
        np.asarray(model.apply(variables, lr, None)),
        atol=2e-6,
    )

    # gradient equivalence: pipelined backprop == sequential backprop
    tgt = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)

    def loss_pp(v):
        return jnp.mean(jnp.abs(pp_apply(v, lr, z) - tgt))

    def loss_seq(v):
        return jnp.mean(jnp.abs(model.apply(v, lr, z) - tgt))

    g_pp = jax.jit(jax.grad(loss_pp))(variables)
    g_seq = jax.jit(jax.grad(loss_seq))(variables)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pipelined_trunk_validation():
    from esr_tpu.parallel import make_stage_mesh, pipelined_rrdb_apply

    mesh = make_stage_mesh(4)
    with pytest.raises(ValueError, match="not divisible"):
        pipelined_rrdb_apply(RRDBNet(nf=8, nb=6, gc=4), mesh, n_micro=2)
    with pytest.raises(ValueError, match="fold=1"):
        pipelined_rrdb_apply(RRDBNet(nf=8, nb=8, gc=4, fold=2), mesh, n_micro=2)


@pytest.mark.slow
def test_pipelined_trunk_all_layers():
    """With latent_input='all_layers' the Z map rides the pipeline ring
    alongside its microbatch; output still equals the sequential scan."""
    from esr_tpu.parallel import make_stage_mesh, pipelined_rrdb_apply

    model = RRDBNet(
        nf=8, nb=8, gc=4, scale=4, num_latent_channels=2, latent_input="all_layers"
    )
    rng = np.random.default_rng(1)
    lr = jnp.asarray(rng.random((8, 8, 8, 3)), jnp.float32)
    z = jnp.asarray(rng.uniform(-1, 1, (8, 8, 8, 2)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), lr, z)

    pp_apply = pipelined_rrdb_apply(model, make_stage_mesh(4), n_micro=4)
    want = model.apply(variables, lr, z)
    got = jax.jit(pp_apply)(variables, lr, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


@pytest.mark.slow
def test_tp_trunk_matches_sequential():
    """Row-parallel channel TP of the trunk over a 4-shard 'model' mesh is
    the same math as the sequential forward up to float reduction order
    (each conv's Cin reduction is split across shards + psum), for forward
    AND parameter gradients (psum self-transposes under autodiff)."""
    from esr_tpu.parallel import make_tp_mesh, tp_rrdb_apply

    model = RRDBNet(nf=8, nb=4, gc=4, scale=4, num_latent_channels=1)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((2, 8, 8, 3)), jnp.float32)
    z = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), lr, z)

    mesh = make_tp_mesh(4)
    assert mesh.shape == {"model": 4}
    tp_apply = tp_rrdb_apply(model, mesh)

    want = model.apply(variables, lr, z)
    got = jax.jit(tp_apply)(variables, lr, z)
    assert got.shape == want.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    # z=None (explorable default-zero latent) path
    np.testing.assert_allclose(
        np.asarray(jax.jit(tp_apply)(variables, lr, None)),
        np.asarray(model.apply(variables, lr, None)),
        atol=2e-6,
    )

    # gradient equivalence: tensor-parallel backprop == sequential backprop
    tgt = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)

    def loss_tp(v):
        return jnp.mean(jnp.abs(tp_apply(v, lr, z) - tgt))

    def loss_seq(v):
        return jnp.mean(jnp.abs(model.apply(v, lr, z) - tgt))

    g_tp = jax.jit(jax.grad(loss_tp))(variables)
    g_seq = jax.jit(jax.grad(loss_seq))(variables)
    for a, b in zip(jax.tree.leaves(g_tp), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_trunk_all_layers():
    """With latent_input='all_layers' the per-block 1x1 latent_proj runs
    replicated (Cin = nf+nz is not T-divisible) while the RDB convs shard;
    output still equals the sequential scan."""
    from esr_tpu.parallel import make_tp_mesh, tp_rrdb_apply

    model = RRDBNet(
        nf=8, nb=4, gc=4, scale=4, num_latent_channels=2, latent_input="all_layers"
    )
    rng = np.random.default_rng(1)
    lr = jnp.asarray(rng.random((2, 8, 8, 3)), jnp.float32)
    z = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 2)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), lr, z)

    tp_apply = tp_rrdb_apply(model, make_tp_mesh(4))
    want = model.apply(variables, lr, z)
    got = jax.jit(tp_apply)(variables, lr, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_tp_trunk_validation():
    from esr_tpu.parallel import make_tp_mesh, tp_rrdb_apply

    mesh = make_tp_mesh(8)
    with pytest.raises(ValueError, match="divisible"):
        tp_rrdb_apply(RRDBNet(nf=8, nb=4, gc=4), mesh)  # gc=4 vs T=8
    with pytest.raises(ValueError, match="fold=1"):
        tp_rrdb_apply(RRDBNet(nf=8, nb=4, gc=4, fold=2), make_tp_mesh(4))


def test_tp_mesh_validation():
    """ADVICE r3: data > device count used to floor the model axis to 0 and
    build an empty mesh with an inscrutable downstream shard_map failure."""
    from esr_tpu.parallel import make_tp_mesh

    with pytest.raises(ValueError, match="devices"):
        make_tp_mesh(data=16)  # 8 CPU devices -> n = 0
    with pytest.raises(ValueError, match="devices"):
        make_tp_mesh(4, data=4)  # 16 > 8


def test_derive_n_micro():
    from esr_tpu.parallel.pipeline import derive_n_micro

    # auto: whole batch when below the 4*stages target...
    assert derive_n_micro(4, 2) == 4
    assert derive_n_micro(1, 4) == 1
    # ...else the smallest divisor >= 4*stages
    assert derive_n_micro(32, 2) == 8
    assert derive_n_micro(24, 2) == 8
    assert derive_n_micro(10, 2) == 10  # no divisor in [8, 10) -> whole batch
    # requested honored when it divides, else largest divisor below it
    assert derive_n_micro(8, 2, requested=4) == 4
    assert derive_n_micro(6, 2, requested=4) == 3
    assert derive_n_micro(4, 2, requested=99) == 4


def test_tp_dp_composed_mesh():
    """DP x TP on a 2-axis ('data','model') 2x4 mesh: batch shards over
    'data', conv channels over 'model'; psums stay model-axis-only. Output
    equals the sequential forward."""
    from esr_tpu.parallel import make_tp_mesh, tp_rrdb_apply

    model = RRDBNet(nf=8, nb=2, gc=4, scale=4, num_latent_channels=1)
    rng = np.random.default_rng(2)
    lr = jnp.asarray(rng.random((4, 8, 8, 3)), jnp.float32)
    z = jnp.asarray(rng.uniform(-1, 1, (4, 8, 8, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), lr, z)

    mesh = make_tp_mesh(4, data=2)
    assert mesh.shape == {"data": 2, "model": 4}
    got = jax.jit(tp_rrdb_apply(model, mesh))(variables, lr, z)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(model.apply(variables, lr, z)), atol=2e-6
    )


def test_spatial_window_forward_matches_full():
    """Exact-edge spatial sharding (r4): in-image windows mean image-edge
    rows keep zero-pad SAME semantics EXACTLY, so the WHOLE image (edges
    included) agrees with the full forward — only interior-seam halo decay
    remains (floor ~3e-5 by halo=8 at flagship depth, r3 sweep)."""
    from esr_tpu.parallel import spatial_window_forward

    model = RRDBNet(nf=8, nb=4, gc=4, scale=4, num_latent_channels=1)
    rng = np.random.default_rng(7)
    lr = jnp.asarray(rng.random((1, 64, 16, 3)), jnp.float32)
    z = jnp.asarray(rng.uniform(-1, 1, (1, 64, 16, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), lr, z)

    def apply_fn(p, lr_, z_=None):
        return model.apply({"params": p}, lr_, z_)

    fwd = spatial_window_forward(apply_fn, make_mesh(8, spatial=4), scale=4, halo=8)
    got = jax.jit(fwd)(variables["params"], lr, z)
    full = model.apply(variables, lr, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full), atol=2e-4)


def test_spatial_tp_apply_matches_full():
    """Composed spatial x TP (r4): on a ('spatial','model') 4x2 mesh the
    output equals the full forward over the WHOLE image (exact-edge window
    policy) up to interior-seam halo decay + TP float reduction-order noise
    (the psum splits each conv's Cin reduction)."""
    from esr_tpu.parallel import make_spatial_tp_mesh, spatial_tp_apply

    model = RRDBNet(nf=8, nb=4, gc=4, scale=4, num_latent_channels=1)
    rng = np.random.default_rng(7)
    lr = jnp.asarray(rng.random((1, 64, 16, 3)), jnp.float32)
    z = jnp.asarray(rng.uniform(-1, 1, (1, 64, 16, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), lr, z)

    mesh = make_spatial_tp_mesh(4, 2)
    assert mesh.shape == {"spatial": 4, "model": 2}
    fwd = spatial_tp_apply(model, mesh, halo=8)
    got = jax.jit(fwd)(variables, lr, z)
    full = model.apply(variables, lr, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full), atol=2e-4)

    # z=None path
    got0 = jax.jit(fwd)(variables, lr)
    full0 = model.apply(variables, lr)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(full0), atol=2e-4)


def test_spatial_tp_apply_validation():
    from esr_tpu.parallel import make_spatial_tp_mesh, spatial_tp_apply

    mesh = make_spatial_tp_mesh(2, 2)
    model = RRDBNet(nf=8, nb=2, gc=4, scale=4)
    variables = {"params": {}}
    fwd = spatial_tp_apply(model, mesh, halo=8)
    with pytest.raises(ValueError, match="does not divide"):
        fwd(variables, jnp.zeros((1, 63, 16, 3)))
    with pytest.raises(ValueError, match="exceeds the local strip"):
        spatial_tp_apply(model, mesh, halo=40)(variables, jnp.zeros((1, 64, 16, 3)))
    with pytest.raises(ValueError, match="fold=1"):
        spatial_tp_apply(RRDBNet(nf=8, nb=2, gc=4, fold=2), mesh)
    with pytest.raises(ValueError, match="divisible"):
        spatial_tp_apply(RRDBNet(nf=8, nb=2, gc=3), mesh)  # gc=3 vs T=2
    with pytest.raises(ValueError, match="spatial x model"):
        make_spatial_tp_mesh(4, 4)  # 16 > 8 devices


def test_spatial_window_forward_grads_match_full():
    """train_spatial's gradient contract (r4): once the halo covers the
    receptive field (nb=1 net: ~19 LR px), the window forward's PARAMETER
    and Z gradients equal the unsharded forward's — dynamic_slice transposes
    to a zero-padded update, all_gather to a reduce-scatter, replicated
    params to a psum of per-shard grads. Also exercises the data_axis
    composition (batch over 'data', height over 'spatial')."""
    from esr_tpu.parallel import spatial_window_forward

    model = RRDBNet(nf=8, nb=1, gc=4, scale=4, num_latent_channels=1)
    rng = np.random.default_rng(3)
    lr = jnp.asarray(rng.random((2, 80, 12, 3)), jnp.float32)
    z = jnp.asarray(rng.uniform(-1, 1, (2, 80, 12, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), lr[:1], z[:1])
    cot = jnp.asarray(rng.random((2, 320, 48, 3)), jnp.float32)

    fwd = spatial_window_forward(
        lambda p, a, b=None: model.apply({"params": p}, a, b),
        make_mesh(4, data=2, spatial=2),
        scale=4,
        halo=20,
        data_axis="data",
    )

    def loss(f):
        return lambda p, zz: jnp.vdot(f(p, lr, zz), cot)

    g_got = jax.grad(loss(jax.jit(fwd)), argnums=(0, 1))(variables["params"], z)
    g_full = jax.grad(
        loss(lambda p, a, b: model.apply({"params": p}, a, b)), argnums=(0, 1)
    )(variables["params"], z)
    for a, b in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_full)):
        scale = max(1.0, float(np.abs(np.asarray(b)).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4 * scale, rtol=2e-4
        )


def test_spatial_window_forward_single_shard_is_exact():
    """ADVICE r4: n_shards==1 with the default halo>0 tried to slice a
    local+2*halo-row window out of an h==local image (trace-time crash in
    dryrun_multichip(1)). The halo is clamped to 0 there — the window is the
    whole image, so the result is bit-identical to the plain forward. Same
    clamp in the composed spatial x TP path (tensor.py)."""
    from esr_tpu.parallel import (
        make_mesh,
        make_spatial_tp_mesh,
        spatial_tp_apply,
        spatial_window_forward,
    )

    model = RRDBNet(nf=8, nb=1, gc=4, scale=4, num_latent_channels=1)
    rng = np.random.default_rng(3)
    lr = jnp.asarray(rng.random((1, 8, 16, 3)), jnp.float32)
    z = jnp.asarray(rng.uniform(-1, 1, (1, 8, 16, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), lr, z)

    def apply_fn(p, lr_, z_=None):
        return model.apply({"params": p}, lr_, z_)

    fwd = spatial_window_forward(
        apply_fn, make_mesh(1, spatial=1), scale=4, halo=2
    )
    got = jax.jit(fwd)(variables["params"], lr, z)
    full = model.apply(variables, lr, z)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(full))

    fwd_tp = spatial_tp_apply(model, make_spatial_tp_mesh(1, 2), halo=2)
    got_tp = jax.jit(fwd_tp)(variables, lr, z)
    np.testing.assert_allclose(np.asarray(got_tp), np.asarray(full), atol=2e-5)
