"""Trainer integration tests (SURVEY.md §4 implications): tiny-model train
step determinism, loss decrease, GAN step mechanics, checkpoint round-trip,
options parsing."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from esr_tpu.options import parse


def tiny_train_opt(tmp_path, model="sr", nz=0, use_cem=False):
    return parse(
        {
            "name": "tiny_test",
            "model": model,
            "scale": 4,
            "use_cem": use_cem,
            "bf16": False,
            "datasets": {
                "train": {
                    "name": "synth",
                    "mode": "SYNTHETIC",
                    "HR_size": 32,
                    "batch_size": 2,
                    "n_images": 4,
                }
            },
            "path": {"root": str(tmp_path)},
            "network_G": {
                "which_model_G": "RRDB_net",
                "nf": 8,
                "nb": 1,
                "gc": 4,
                "in_nc": 3,
                "out_nc": 3,
                "num_latent_channels": nz,
            },
            "network_D": {"which_model_D": "discriminator_vgg_128", "nf": 4},
            "train": {
                "lr_G": 1e-3,
                "lr_D": 1e-3,
                "lr_steps": [100],
                "lr_gamma": 0.5,
                "pixel_criterion": "l1",
                "pixel_weight": 1.0,
                "feature_weight": 0.0,
                "gan_type": "vanilla",
                "gan_weight": 0.005,
                "range_weight": 1.0,
                "map_weight": 1.0 if nz else 0.0,
                "D_update_ratio": 1,
                "D_init_iters": 0,
                "manual_seed": 0,
                "niter": 10,
            },
            "logger": {"print_freq": 1},
        },
        is_train=True,
    )


def make_batch(n=2, hr=32):
    rng = np.random.default_rng(0)
    return {"HR": rng.random((n, hr, hr, 3)).astype(np.float32)}


def test_options_parse_and_nonedict(tmp_path):
    opt = tiny_train_opt(tmp_path)
    assert opt["missing_key"] is None
    assert opt["train"]["missing"] is None
    assert opt["datasets"]["train"]["scale"] == 4
    assert opt["path"]["models"].endswith("models")
    assert opt["network_G"]["scale"] == 4


def test_options_preserve_non_json_leaves(tmp_path):
    """parse(dict) must keep non-JSON leaves (e.g. a numpy CEM kernel) and
    options.save must still dump a record (VERDICT r2 weak #8)."""
    from esr_tpu import options as options_mod

    kernel = np.ones((3, 3), np.float64) / 9.0
    opt = tiny_train_opt(tmp_path)
    raw = {k: v for k, v in opt.items()}
    raw["kernel"] = kernel
    opt2 = options_mod.parse(raw, is_train=True)
    assert isinstance(opt2["kernel"], np.ndarray)
    np.testing.assert_array_equal(opt2["kernel"], kernel)
    path = options_mod.save(opt2)
    import json as _json

    with open(path) as f:
        dumped = _json.load(f)
    assert dumped["kernel"] == kernel.tolist()


def test_sr_model_loss_decreases(tmp_path):
    from esr_tpu.models import create_model

    opt = tiny_train_opt(tmp_path, model="sr")
    model = create_model(opt)
    batch = make_batch()
    model.feed_data(batch)
    losses = []
    for step in range(1, 9):
        model.optimize_parameters(step)
        losses.append(model.get_current_losses()["l_pix"])
    assert losses[-1] < losses[0]
    assert model.get_current_learning_rate() == pytest.approx(1e-3)


@pytest.mark.slow
def test_sr_model_determinism(tmp_path):
    from esr_tpu.models import create_model

    opt = tiny_train_opt(tmp_path, model="sr")
    runs = []
    for _ in range(2):
        model = create_model(opt)
        model.feed_data(make_batch())
        for step in range(1, 3):
            model.optimize_parameters(step)
        runs.append(model.get_current_losses()["l_pix"])
    assert runs[0] == runs[1]


def test_sr_model_test_and_visuals(tmp_path):
    from esr_tpu.models import create_model

    opt = tiny_train_opt(tmp_path, model="sr")
    model = create_model(opt)
    lr = np.random.default_rng(1).random((8, 8, 3)).astype(np.float32)
    model.feed_data({"LR": lr})
    model.test()
    vis = model.get_current_visuals()
    assert vis["SR"].shape == (32, 32, 3)


@pytest.mark.slow
def test_gan_model_step_and_gating(tmp_path):
    from esr_tpu.models import create_model

    opt = tiny_train_opt(tmp_path, model="srragan", nz=1, use_cem=True)
    model = create_model(opt)
    model.feed_data(make_batch())
    g0 = jax.tree.leaves(model.g_state.params)[0].copy()
    d0 = jax.tree.leaves(model.d_state.params)[0].copy()
    # steps are 1-based (CLI increments before calling; reference gate is
    # `step % ratio == 0 and step > D_init_iters`) — step 1 updates G and D
    model.optimize_parameters(1)
    losses = model.get_current_losses()
    for key in ("l_d", "l_g", "l_g_gan", "l_g_range", "l_g_map", "psnr"):
        assert key in losses, losses.keys()
    assert np.isfinite(list(losses.values())).all()
    g1 = jax.tree.leaves(model.g_state.params)[0]
    d1 = jax.tree.leaves(model.d_state.params)[0]
    assert float(jnp.abs(g1 - g0).max()) > 0
    assert float(jnp.abs(d1 - d0).max()) > 0


@pytest.mark.slow
def test_gan_d_init_iters_gates_g(tmp_path):
    from esr_tpu.models import create_model

    opt = tiny_train_opt(tmp_path, model="srragan")
    opt["train"]["D_init_iters"] = 100
    model = create_model(opt)
    model.feed_data(make_batch())
    g0 = jax.tree.leaves(model.g_state.params)[0].copy()
    model.optimize_parameters(1)
    g1 = jax.tree.leaves(model.g_state.params)[0]
    assert float(jnp.abs(g1 - g0).max()) == 0  # G frozen until D_init_iters


@pytest.mark.slow
def test_gan_cem_consistency_after_step(tmp_path):
    """After a GAN train step with CEM, test-time outputs stay consistent."""
    from esr_tpu.models import create_model
    from esr_tpu.cem import CEMConf, make_cem

    opt = tiny_train_opt(tmp_path, model="srragan", nz=1, use_cem=True)
    model = create_model(opt)
    model.feed_data(make_batch())
    model.optimize_parameters(1)
    lr = np.random.default_rng(2).random((8, 8, 3)).astype(np.float32)
    model.feed_data({"LR": lr})
    model.test()
    sr = model.get_current_visuals()["SR"]
    cem = make_cem(CEMConf(scale=4))
    lr_back = np.asarray(cem.downsample(jnp.asarray(sr)[None]))[0]
    assert np.abs(lr_back - lr).max() < 1e-4


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    from esr_tpu.models import create_model

    opt = tiny_train_opt(tmp_path, model="sr")
    model = create_model(opt)
    model.feed_data(make_batch())
    model.optimize_parameters(1)
    model.save("1")
    model.save_training(epoch=0, iter_step=1)

    model2 = create_model(opt)
    state_path = model.latest_state_path(opt["path"]["training_state"])
    assert state_path is not None
    epoch, it = model2.resume_training(state_path)
    assert (epoch, it) == (0, 1)
    p1 = jax.tree.leaves(model.state.params)[0]
    p2 = jax.tree.leaves(model2.state.params)[0]
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    # and the loaded optimizer state continues training identically
    model.feed_data(make_batch())
    model2.feed_data(make_batch())
    model.optimize_parameters(1)
    model2.optimize_parameters(1)
    assert model.get_current_losses()["l_pix"] == pytest.approx(
        model2.get_current_losses()["l_pix"], rel=1e-5
    )


@pytest.mark.slow
def test_gan_wgan_gp_variant(tmp_path):
    from esr_tpu.models import create_model

    opt = tiny_train_opt(tmp_path, model="srragan")
    opt["train"]["gan_type"] = "wgan-gp"
    opt["train"]["gp_weight"] = 10.0
    model = create_model(opt)
    model.feed_data(make_batch())
    model.optimize_parameters(1)
    losses = model.get_current_losses()
    assert np.isfinite(list(losses.values())).all()


def test_packed_dataset_roundtrip(tmp_path):
    from esr_tpu.data import create_dataset
    from esr_tpu.data.packed import write_packed

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8) for _ in range(4)]
    write_packed(imgs, str(tmp_path / "pack"))
    ds = create_dataset(
        {"mode": "PACKED", "dataroot_HR": str(tmp_path / "pack"), "HR_size": 32, "phase": "train"}
    )
    assert len(ds) == 4
    s = ds[1]
    assert s["HR"].shape == (32, 32, 3) and s["HR"].dtype == np.uint8
    # LMDB gated with a clear error
    with pytest.raises(NotImplementedError):
        create_dataset({"mode": "LRHR", "dataroot_HR": "foo.lmdb"})


@pytest.mark.slow
def test_trainers_data_parallel_via_dist_flag(tmp_path):
    """opt['dist']=True runs the OO trainers over the 8-device mesh and
    matches the single-device loss on the same global batch."""
    from esr_tpu.models import create_model

    batch = make_batch(n=8)

    opt = tiny_train_opt(tmp_path, model="sr")
    single = create_model(opt)
    single.feed_data(batch)
    single.optimize_parameters(1)
    l_single = single.get_current_losses()["l_pix"]

    opt_dp = tiny_train_opt(tmp_path, model="sr")
    opt_dp["dist"] = True
    dp = create_model(opt_dp)
    assert dp._mesh is not None
    dp.feed_data(batch)
    dp.optimize_parameters(1)
    l_dp = dp.get_current_losses()["l_pix"]
    assert l_single == pytest.approx(l_dp, rel=1e-5)

    # GAN trainer compiles + runs a DP step too
    opt_gan = tiny_train_opt(tmp_path, model="srragan", nz=1, use_cem=True)
    opt_gan["dist"] = True
    gan = create_model(opt_gan)
    gan.feed_data(batch)
    gan.optimize_parameters(1)
    assert np.isfinite(list(gan.get_current_losses().values())).all()


def test_gan_training_through_tp_and_pp_trunks(tmp_path):
    """VERDICT r3 #3: `train_tp`/`train_pp` run the GAN train step through
    the trunk-parallel generator forwards (channel-TP over a DP x TP mesh /
    GPipe pipeline over a stage mesh). N steps must match single-device
    training: the wrappers are gradient-exact (test_parallel.py), so any
    divergence beyond float reduction noise is a plumbing bug. Uses the
    shipped fold=2 config (fold=1 twin built transparently)."""
    from esr_tpu.models import create_model

    def run(extra, steps=3):
        opt = tiny_train_opt(tmp_path, model="srragan", nz=1, use_cem=True)
        opt["network_G"]["nb"] = 2  # nb must divide the stage count
        opt["network_G"]["fold"] = 2
        opt["dist"] = False
        opt.update(extra)
        model = create_model(opt)
        rng = np.random.default_rng(11)
        metrics = []
        for s in range(1, steps + 1):
            model.feed_data({"HR": rng.random((4, 32, 32, 3)).astype(np.float32)})
            model.optimize_parameters(s)
            metrics.append(model.get_current_losses())
        return jax.device_get(model.g_state.params), metrics

    base_params, base_metrics = run({})
    for extra in ({"train_tp": 2}, {"train_pp": 2}):
        got_params, got_metrics = run(extra)
        # per-step losses: a wrong forward/batch/gate would diverge at once.
        # D_real/D_fake (raw post-update logits) are excluded from the tight
        # band: Adam's first update is ~lr*sign(grad), so float-reduction
        # noise on noise-dominated D grad elements flips isolated signs
        # (measured: 2/57k elements at ~lr scale after one step) and the
        # logit means drift by ~1e-3 — same math, different program shape.
        for m_base, m_got in zip(base_metrics, got_metrics):
            for k in m_base:
                tol = (
                    dict(rel=0.1, abs=0.02)
                    if k in ("D_real", "D_fake")
                    else dict(rel=1e-3, abs=1e-5)
                )
                assert m_base[k] == pytest.approx(m_got[k], **tol), (
                    extra, k, m_base[k], m_got[k],
                )
        # parameter trajectory: bulk float noise ~1e-8 with isolated
        # Adam-sign-flip elements bounded by a few lr (lr=1e-3 here);
        # a real plumbing bug (wrong batch/forward) moves MANY elements
        diffs = np.concatenate(
            [
                np.abs(np.asarray(a) - np.asarray(b)).ravel()
                for a, b in zip(
                    jax.tree.leaves(base_params), jax.tree.leaves(got_params)
                )
            ]
        )
        assert np.percentile(diffs, 99.5) < 1e-6, (extra, np.percentile(diffs, 99.5))
        assert diffs.max() < 1e-2, (extra, diffs.max())

    # mutual exclusion + value validation
    opt = tiny_train_opt(tmp_path, model="srragan", nz=1)
    opt["train"]["train_tp"] = 2  # train-block spelling accepted too
    opt["train_pp"] = 2
    with pytest.raises(ValueError, match="mutually exclusive"):
        create_model(opt)
    opt2 = tiny_train_opt(tmp_path, model="srragan", nz=1)
    opt2["train_tp"] = True
    with pytest.raises(ValueError, match="shard count"):
        create_model(opt2)


@pytest.mark.slow
def test_sr_training_through_tp_trunk(tmp_path):
    """SRModel (pixel trainer) rides the same train_tp hook."""
    from esr_tpu.models import create_model

    def run(extra):
        opt = tiny_train_opt(tmp_path, model="sr")
        opt["network_G"]["nb"] = 2
        opt["dist"] = False
        opt.update(extra)
        model = create_model(opt)
        rng = np.random.default_rng(5)
        for s in range(1, 3):
            model.feed_data({"HR": rng.random((4, 32, 32, 3)).astype(np.float32)})
            model.optimize_parameters(s)
        return jax.device_get(model.state.params), model.get_current_losses()

    p0, m0 = run({})
    p1, m1 = run({"train_pp": 2})
    assert m0["l_pix"] == pytest.approx(m1["l_pix"], rel=1e-4)
    diffs = np.concatenate(
        [
            np.abs(np.asarray(a) - np.asarray(b)).ravel()
            for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1))
        ]
    )
    # bulk float noise + isolated Adam sign flips (see the GAN test above)
    assert np.percentile(diffs, 99.5) < 1e-6, np.percentile(diffs, 99.5)
    assert diffs.max() < 1e-2, diffs.max()


def test_check_resume_and_save(tmp_path):
    from esr_tpu.options import check_resume, parse, save

    opt = tiny_train_opt(tmp_path, model="srragan")
    opt["path"]["resume_state"] = str(
        tmp_path / "experiments" / "tiny_test" / "training_state" / "1000.state"
    )
    check_resume(opt)
    assert opt["path"]["pretrain_model_G"].endswith("models/1000_G")
    assert opt["path"]["pretrain_model_D"].endswith("models/1000_D")

    path = save(opt)
    import json

    with open(path) as f:
        dumped = json.load(f)
    assert dumped["model"] == "srragan"


def test_json_comment_stripping(tmp_path):
    from esr_tpu.options import parse

    p = tmp_path / "opt.json"
    p.write_text('{\n  // a comment\n  "name": "x // not a comment",\n  "scale": 4\n}\n')
    opt = parse(str(p), is_train=False)
    assert opt["name"] == "x // not a comment"
    assert opt["scale"] == 4


@pytest.mark.slow
def test_custom_kernel_training(tmp_path):
    """Top-level 'kernel' opt: LR synthesis and CEM share the estimated
    downsampling operator (blind-SR workflow)."""
    import numpy as np

    from esr_tpu.models import create_model

    g1 = np.exp(-0.5 * (np.arange(9) - 4.0) ** 2 / 1.5**2)
    opt = tiny_train_opt(tmp_path, model="srragan", nz=1, use_cem=True)
    opt["kernel"] = (g1 / g1.sum()).tolist()
    model = create_model(opt)
    assert model.cem._k1 is not None and len(model.cem._k1) == 9
    model.feed_data(make_batch())
    model.optimize_parameters(1)
    assert np.isfinite(list(model.get_current_losses().values())).all()
    # test-time consistency is w.r.t. the custom kernel
    lr = np.random.default_rng(3).random((8, 8, 3)).astype(np.float32)
    model.feed_data({"LR": lr})
    model.test()
    sr = model.get_current_visuals()["SR"]
    import jax.numpy as jnp

    back = np.asarray(model.cem.downsample(jnp.asarray(sr)[None]))[0]
    assert np.abs(back - lr).max() < 1e-4


def test_srresnet_trainer_integration(tmp_path):
    from esr_tpu.models import create_model

    opt = tiny_train_opt(tmp_path, model="sr")
    opt["network_G"]["which_model_G"] = "sr_resnet"
    opt["network_G"]["nb"] = 2
    model = create_model(opt)
    model.feed_data(make_batch())
    model.optimize_parameters(1)
    assert np.isfinite(list(model.get_current_losses().values())).all()


@pytest.mark.slow
def test_all_layers_latent_trainer(tmp_path):
    """latent_input='all_layers' (per-block Z injection) trains end-to-end."""
    from esr_tpu.models import create_model

    opt = tiny_train_opt(tmp_path, model="srragan", nz=1, use_cem=True)
    opt["network_G"]["latent_input"] = "all_layers"
    model = create_model(opt)
    model.feed_data(make_batch())
    model.optimize_parameters(1)
    assert np.isfinite(list(model.get_current_losses().values())).all()


@pytest.mark.slow
def test_srgan_non_relativistic_variant(tmp_path):
    """model='srgan' uses the standard (non-relativistic) adversarial loss."""
    from esr_tpu.models import create_model

    opt = tiny_train_opt(tmp_path, model="srgan")
    model = create_model(opt)
    assert model.opt["train"]["relativistic"] is False
    model.feed_data(make_batch())
    model.optimize_parameters(1)
    assert np.isfinite(list(model.get_current_losses().values())).all()


@pytest.mark.slow
def test_paired_lr_training_uses_provided_lr(tmp_path):
    """ADVICE r1 medium: with dataroot_LR configured, trainers must train on
    the PROVIDED LR pairs, not re-synthesized bicubic LR."""
    from esr_tpu.models import create_model

    opt = tiny_train_opt(tmp_path, model="sr")
    opt["datasets"]["train"]["dataroot_LR"] = "/some/lr/dir"  # signals paired
    model = create_model(opt)
    assert model._paired_lr

    rng = np.random.default_rng(3)
    hr = rng.random((2, 32, 32, 3)).astype(np.float32)
    # a deliberately NON-bicubic LR (e.g. box-downsampled + noise)
    lr = hr.reshape(2, 8, 4, 8, 4, 3).mean(axis=(2, 4))
    lr = np.clip(lr + rng.normal(0, 0.05, lr.size).reshape(lr.shape), 0, 1).astype(np.float32)

    model.feed_data({"HR": hr, "LR": lr})
    model.optimize_parameters(1)
    l_paired = model.get_current_losses()["l_pix"]
    assert np.isfinite(l_paired)

    # identical model WITHOUT paired LR differs (it synthesizes bicubic LR)
    opt2 = tiny_train_opt(tmp_path, model="sr")
    model2 = create_model(opt2)
    model2.feed_data({"HR": hr})
    model2.optimize_parameters(1)
    assert model2.get_current_losses()["l_pix"] != pytest.approx(l_paired)

    # missing LR in the batch -> clear error
    model3 = create_model(tiny_train_opt(tmp_path, model="sr"))
    model3._paired_lr = True
    model3.feed_data({"HR": hr})
    with pytest.raises(ValueError, match="paired-LR"):
        model3.optimize_parameters(1)


@pytest.mark.slow
def test_paired_lr_gan_training(tmp_path):
    from esr_tpu.models import create_model

    opt = tiny_train_opt(tmp_path, model="srragan", nz=1, use_cem=True)
    opt["datasets"]["train"]["dataroot_LR"] = "/some/lr/dir"
    model = create_model(opt)
    rng = np.random.default_rng(4)
    hr = rng.random((2, 32, 32, 3)).astype(np.float32)
    lr = hr.reshape(2, 8, 4, 8, 4, 3).mean(axis=(2, 4)).astype(np.float32)
    model.feed_data({"HR": hr, "LR": lr})
    model.optimize_parameters(1)
    assert np.isfinite(list(model.get_current_losses().values())).all()


def test_grad_clip_wiring(tmp_path):
    """train.grad_clip reaches the optimizer chain (VERDICT r1 item 8)."""
    from esr_tpu.models import create_model

    opt = tiny_train_opt(tmp_path, model="sr")
    opt["train"]["grad_clip"] = 1.0
    clipped = create_model(opt)
    unclipped = create_model(tiny_train_opt(tmp_path, model="sr"))
    # the clip transform adds a stage to the optax chain (Adam's own step is
    # gradient-scale invariant, so wiring is the observable)
    s_clip = jax.tree_util.tree_structure(clipped.state.opt_state)
    s_plain = jax.tree_util.tree_structure(unclipped.state.opt_state)
    assert s_clip != s_plain
    clipped.feed_data(make_batch())
    clipped.optimize_parameters(1)
    assert np.isfinite(clipped.get_current_losses()["l_pix"])

    # GAN trainer accepts it too
    opt_g = tiny_train_opt(tmp_path, model="srragan")
    opt_g["train"]["grad_clip"] = 1.0
    gan = create_model(opt_g)
    gan.feed_data(make_batch())
    gan.optimize_parameters(1)
    assert np.isfinite(list(gan.get_current_losses().values())).all()


@pytest.mark.slow
def test_auto_dp_when_batch_divides(tmp_path):
    """Reference auto-DataParallel parity: DP turns on automatically when >1
    device and the configured batch divides; dist:false opts out; gpu_ids
    caps the mesh (VERDICT r1 item 8)."""
    from esr_tpu.models import create_model

    opt = tiny_train_opt(tmp_path, model="sr")
    opt["datasets"]["train"]["batch_size"] = 8
    model = create_model(opt)
    assert model._mesh is not None and model._mesh.shape["data"] == 8

    opt_off = tiny_train_opt(tmp_path, model="sr")
    opt_off["datasets"]["train"]["batch_size"] = 8
    opt_off["dist"] = False
    assert create_model(opt_off)._mesh is None

    # indivisible batch -> stays single-device instead of erroring later
    opt_odd = tiny_train_opt(tmp_path, model="sr")
    opt_odd["datasets"]["train"]["batch_size"] = 3
    assert create_model(opt_odd)._mesh is None

    # gpu_ids caps the device count (reference CUDA_VISIBLE_DEVICES surface)
    opt_cap = tiny_train_opt(tmp_path, model="sr")
    opt_cap["datasets"]["train"]["batch_size"] = 8
    opt_cap["gpu_ids"] = [0, 1]
    capped = create_model(opt_cap)
    assert capped._mesh is not None and capped._mesh.shape["data"] == 2
    capped.feed_data(make_batch(n=8))
    capped.optimize_parameters(1)
    assert np.isfinite(capped.get_current_losses()["l_pix"])


def test_logger_csv_resume_no_duplicate_header(tmp_path):
    """VERDICT r1 weak #8: resuming must not append a second CSV header."""
    import csv

    from esr_tpu.utils.logger import Logger

    opt = {"path": {"log": str(tmp_path)}, "logger": {}}
    lg1 = Logger(opt)
    lg1.log_scalars(1, 0, 1e-4, {"l_pix": 0.5})
    lg1.log_scalars(2, 0, 1e-4, {"l_pix": 0.4})
    # simulate resume: fresh process -> fresh Logger over the same file
    lg2 = Logger(opt)
    lg2.log_scalars(3, 0, 1e-4, {"l_pix": 0.3})
    with open(tmp_path / "train_metrics.csv", newline="") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["step", "epoch", "lr", "l_pix"]
    assert sum(1 for r in rows if r and r[0] == "step") == 1  # single header
    assert [r[0] for r in rows[1:]] == ["1", "2", "3"]


@pytest.mark.slow
def test_async_checkpointing_roundtrip(tmp_path):
    """async_checkpoint=True: saves return immediately (background write),
    wait_for_checkpoints makes them durable, restore matches (SURVEY §5.3)."""
    from esr_tpu.models import create_model

    opt = tiny_train_opt(tmp_path)
    opt["async_checkpoint"] = True
    model = create_model(opt)
    model.feed_data(make_batch())
    model.optimize_parameters(1)
    model.save(1)
    model.save_training(0, 1)
    model.wait_for_checkpoints()

    opt2 = tiny_train_opt(tmp_path)
    model2 = create_model(opt2)
    import os
    state_path = os.path.join(opt["path"]["training_state"], "1.state")
    epoch, it = model2.resume_training(state_path)
    assert (epoch, it) == (0, 1)
    a = jax.tree.leaves(model.state.params)[0]
    b = jax.tree.leaves(model2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_net_interp_model_checkpoints(tmp_path):
    """net_interp on real model checkpoints: blend two trained-G artifacts
    and load the result back through the normal pretrain path."""
    from esr_tpu.models import create_model
    from esr_tpu.scripts.net_interp import main as interp_main

    opt = tiny_train_opt(tmp_path)
    model = create_model(opt)
    model.feed_data(make_batch())
    model.save("A")
    model.optimize_parameters(1)
    model.save("B")
    models_dir = opt["path"]["models"]
    import os
    pa = os.path.join(models_dir, "A_G")
    pb = os.path.join(models_dir, "B_G")
    po = os.path.join(models_dir, "interp_G")
    interp_main(["--model_psnr", pa, "--model_gan", pb, "--alpha", "0.5", "--out", po])

    opt2 = tiny_train_opt(tmp_path)
    opt2["path"]["pretrain_model_G"] = po
    model2 = create_model(opt2)
    a = jax.tree.leaves(model.state.params)[0]  # post-step (B endpoint)
    mid = jax.tree.leaves(model2.state.params)[0]
    assert np.isfinite(np.asarray(mid)).all()
    # interp lies strictly between endpoints wherever they differ
    diff = np.abs(np.asarray(a) - np.asarray(mid))
    assert diff.max() > 0  # actually moved off the B endpoint


# -- chunked dispatch (steps_per_dispatch: lax.scan over k steps) ----------


def test_chunk_limit_event_boundaries():
    from esr_tpu.train import chunk_limit

    # no boundary within k steps
    assert chunk_limit(0, 4, (20, 0, 100), 1000) == 4
    # print boundary at 20 caps the chunk (steps 19, 20)
    assert chunk_limit(18, 8, (20, 0, 100), 1000) == 2
    # landing exactly on a boundary: next boundary is a full period away
    assert chunk_limit(20, 8, (20, 0, 0), 1000) == 8
    # niter caps the final chunk
    assert chunk_limit(998, 8, (0, 0, 0), 1000) == 2
    # never below 1
    assert chunk_limit(999, 8, (1, 0, 0), 1000) == 1


def _chunk_batches(n=3, bs=2, hr=32, seed=3):
    rng = np.random.default_rng(seed)
    return [
        {"HR": rng.random((bs, hr, hr, 3)).astype(np.float32)} for _ in range(n)
    ]


@pytest.mark.slow
def test_sr_chunked_matches_per_step(tmp_path):
    """optimize_parameters_chunk(k) == k optimize_parameters calls (same rng
    fold per absolute step)."""
    from esr_tpu.models import create_model
    from esr_tpu.train import stack_chunk

    opt = tiny_train_opt(tmp_path, model="sr")
    batches = _chunk_batches(3)

    m1 = create_model(opt)
    for i, b in enumerate(batches, start=1):
        m1.feed_data(b)
        m1.optimize_parameters(i)
    l1 = m1.get_current_losses()

    m2 = create_model(opt)
    m2.optimize_parameters_chunk(1, stack_chunk(batches))
    l2 = m2.get_current_losses()

    assert l2["l_pix"] == pytest.approx(l1["l_pix"], rel=1e-5)
    assert m2.step == 3
    for x, y in zip(jax.tree.leaves(m1.state.params), jax.tree.leaves(m2.state.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-6)


def test_gan_chunked_matches_per_step(tmp_path):
    from esr_tpu.models import create_model
    from esr_tpu.train import stack_chunk

    opt = tiny_train_opt(tmp_path, model="srragan", nz=1, use_cem=True)
    batches = _chunk_batches(2)

    m1 = create_model(opt)
    for i, b in enumerate(batches, start=1):
        m1.feed_data(b)
        m1.optimize_parameters(i)
    l1 = m1.get_current_losses()

    m2 = create_model(opt)
    m2.optimize_parameters_chunk(1, stack_chunk(batches))
    l2 = m2.get_current_losses()

    for key in ("l_d", "l_g", "psnr"):
        assert l2[key] == pytest.approx(l1[key], rel=1e-4), key
    # Param tolerance is O(lr): Adam normalizes (m/sqrt(v) ~ +-1), so f32
    # reassociation noise between the scan body and the standalone program
    # moves near-zero-grad params by up to ~lr per step. Measured floor: a
    # k=1 scan vs the per-step program already differs by ~3e-4 after ONE
    # step with IDENTICAL rng/data (losses match to 1e-4 — same trajectory).
    lr = 1e-3
    for x, y in zip(
        jax.tree.leaves(m1.g_state.params), jax.tree.leaves(m2.g_state.params)
    ):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2 * lr)
    for x, y in zip(
        jax.tree.leaves(m1.d_state.params), jax.tree.leaves(m2.d_state.params)
    ):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2 * lr)


def test_stack_chunk_mixed_entries():
    from esr_tpu.train import stack_chunk

    batches = [
        {"HR": np.ones((2, 4, 4, 3), np.float32), "HR_path": ["a", "b"]},
        {"HR": np.zeros((2, 4, 4, 3), np.float32), "HR_path": ["c", "d"]},
    ]
    out = stack_chunk(batches)
    assert out["HR"].shape == (2, 2, 4, 4, 3)
    assert out["HR_path"] == [["a", "b"], ["c", "d"]]


def test_visuals_device_and_uint8_paths(tmp_path):
    """test() keeps SR/LR on device; get_current_visuals returns host f32
    (reference API) and get_visuals_uint8 equals tensor2img of those —
    the device-converted-uint8 fetch path (VERDICT r2 weak #9)."""
    from esr_tpu.models import create_model
    from esr_tpu.ops.color import tensor2img

    opt = tiny_train_opt(tmp_path, model="srragan", nz=1, use_cem=True)
    model = create_model(opt)
    lr = np.random.default_rng(2).random((8, 8, 3)).astype(np.float32)
    model.feed_data({"LR": lr, "HR": np.zeros((32, 32, 3), np.float32)})
    model.test()
    dev = model.get_visuals_device()
    assert not isinstance(dev["SR"], np.ndarray)  # still on device
    u8 = model.get_visuals_uint8()
    vis = model.get_current_visuals()
    assert isinstance(vis["SR"], np.ndarray) and vis["SR"].dtype != np.uint8
    np.testing.assert_array_equal(u8["SR"], tensor2img(vis["SR"]))
    np.testing.assert_array_equal(u8["HR"], tensor2img(vis["HR"]))
    assert u8["SR"].dtype == np.uint8 and u8["SR"].shape == (32, 32, 3)


@pytest.mark.slow
def test_eval_spatial_fold_default_and_optout(tmp_path):
    """With network_G.fold>1, batch-1 test() auto-splits the image into fold
    H-strips so the MXU fold stays active (BaseModel._make_forward /
    spatial_fold_apply); eval_spatial_fold:false opts back into the plain
    unfolded forward. Outputs agree to the halo floor."""
    from esr_tpu.models import create_model

    opt = tiny_train_opt(tmp_path, model="srragan", nz=1, use_cem=True)
    opt["network_G"]["fold"] = 2
    opt["eval_spatial_fold_halo"] = 12
    lr = np.random.default_rng(3).random((48, 40, 3)).astype(np.float32)

    model = create_model(opt)
    model.feed_data({"LR": lr})
    model.test()
    sr_split = np.asarray(model.get_visuals_device()["SR"])

    opt2 = tiny_train_opt(tmp_path, model="srragan", nz=1, use_cem=True)
    opt2["network_G"]["fold"] = 2
    opt2["eval_spatial_fold"] = False
    model2 = create_model(opt2)
    # same init seed -> same params
    model2.feed_data({"LR": lr})
    model2.test()
    sr_plain = np.asarray(model2.get_visuals_device()["SR"])

    assert sr_split.shape == sr_plain.shape == (192, 160, 3)
    np.testing.assert_allclose(sr_split, sr_plain, atol=1e-4)


def test_train_errors_on_zero_batch_loader(tmp_path):
    """batch_size > dataset size (drop_last) must error loudly instead of
    'completing' a zero-step run (found via an 8-image set at batch 16)."""
    import json

    import pytest

    from esr_tpu.train import main as train_main

    opt = tiny_train_opt(tmp_path, model="sr")
    opt["datasets"]["train"]["batch_size"] = 16
    opt["datasets"]["train"]["n_images"] = 4
    opt_path = tmp_path / "zero_batch.json"
    opt_path.write_text(json.dumps(opt))
    with pytest.raises(ValueError, match="0 batches"):
        train_main(["-opt", str(opt_path)])


@pytest.mark.slow
def test_train_with_custom_kernel_e2e(tmp_path):
    """Top-level 'kernel' opt (user/estimated downsampling kernel, SURVEY
    §2.10a KernelGAN use case) drives BOTH training LR synthesis and the CEM
    operator: a GAN step runs, and test() output is consistent under THAT
    kernel's downsampling (not bicubic)."""
    import jax.numpy as jnp

    from esr_tpu.cem import CEMConf, make_cem
    from esr_tpu.models import create_model

    g = np.outer(*(np.exp(-0.5 * ((np.arange(7) - 3) / 1.2) ** 2),) * 2)
    kern = g / g.sum()
    opt = tiny_train_opt(tmp_path, model="srragan", nz=1, use_cem=True)
    opt["kernel"] = [list(r) for r in kern]
    model = create_model(opt)
    rng = np.random.default_rng(5)
    model.feed_data({"HR": rng.random((2, 32, 32, 3)).astype(np.float32)})
    model.optimize_parameters(1)
    losses = model.get_current_losses()
    assert np.isfinite(losses["l_g"])

    lr = rng.random((8, 8, 3)).astype(np.float32)
    model.feed_data({"LR": lr})
    model.test()
    sr = np.asarray(model.get_current_visuals()["SR"])
    cem_k = make_cem(CEMConf(scale=4, kernel=tuple(map(tuple, kern))))
    res_k = float(np.abs(np.asarray(cem_k.downsample(jnp.asarray(sr)[None]))[0] - lr).max())
    assert res_k < 1e-4, res_k  # consistent under the CUSTOM kernel
    cem_bic = make_cem(CEMConf(scale=4))
    res_b = float(np.abs(np.asarray(cem_bic.downsample(jnp.asarray(sr)[None]))[0] - lr).max())
    assert res_b > 10 * res_k  # and NOT under bicubic (the kernel matters)


@pytest.mark.slow
def test_gan_one_based_gating_semantics(tmp_path):
    """Reference gate parity (``codes/models/SRRaGAN_model.py`` per SURVEY
    §2.11): G updates when ``step % D_update_ratio == 0 AND step >
    D_init_iters`` with 1-based steps (the CLI increments before calling).
    With D_init_iters=1, step 1 must leave G frozen and step 2 must not."""
    from esr_tpu.models import create_model

    opt = tiny_train_opt(tmp_path, model="srragan")
    opt["train"]["D_init_iters"] = 1
    model = create_model(opt)
    model.feed_data(make_batch())
    g0 = jax.tree.leaves(model.g_state.params)[0].copy()
    model.optimize_parameters(1)
    g1 = jax.tree.leaves(model.g_state.params)[0].copy()
    assert float(jnp.abs(g1 - g0).max()) == 0  # step == D_init_iters: frozen
    model.optimize_parameters(2)
    g2 = jax.tree.leaves(model.g_state.params)[0]
    assert float(jnp.abs(g2 - g1).max()) > 0  # step > D_init_iters: updates


@pytest.mark.slow
def test_gan_explicit_zero_weights_honored(tmp_path):
    """An explicit ``gan_weight: 0`` (ablation) must NOT silently fall back
    to the 0.005 default: the G loss then reduces to the non-GAN terms."""
    from esr_tpu.models import create_model

    base = tiny_train_opt(tmp_path, model="srragan")
    base["train"]["gan_weight"] = 0.0
    base["train"]["range_weight"] = 0.0
    base["train"]["pixel_weight"] = 1.0
    model = create_model(base)
    model.feed_data(make_batch())
    model.optimize_parameters(1)
    losses = model.get_current_losses()
    # l_g must equal the pixel term alone: gan/range contributions are off
    assert losses["l_g"] == pytest.approx(losses["l_g_pix"], rel=1e-5)


@pytest.mark.slow
def test_g_lr_milestones_track_global_step(tmp_path):
    """Reference MultiStepLR steps every ITERATION, not every G update: with
    D_update_ratio=2 and a milestone that zeroes the LR at step 3, the G
    update at global step 4 must be a no-op (an optimizer-count-keyed
    schedule would still be pre-milestone there and move G)."""
    from esr_tpu.models import create_model

    opt = tiny_train_opt(tmp_path, model="srragan")
    opt["train"]["D_update_ratio"] = 2
    opt["train"]["lr_steps"] = [3]
    opt["train"]["lr_gamma"] = 0.0  # milestone zeroes the LR: exact observable
    model = create_model(opt)
    model.feed_data(make_batch())
    g0 = jax.tree.leaves(model.g_state.params)[0].copy()
    model.optimize_parameters(1)  # odd: gated off
    model.optimize_parameters(2)  # G update at full LR
    g2 = jax.tree.leaves(model.g_state.params)[0].copy()
    assert float(jnp.abs(g2 - g0).max()) > 0
    model.optimize_parameters(3)  # odd: gated off; milestone passes
    model.optimize_parameters(4)  # G update with POST-milestone LR (= 0)
    g4 = jax.tree.leaves(model.g_state.params)[0]
    assert float(jnp.abs(g4 - g2).max()) == 0


@pytest.mark.slow
def test_augment_flags_reach_pipeline_from_dataset_block(tmp_path, monkeypatch):
    """`use_flip`/`use_rot` live in the dataset block (reference location);
    both trainers must plumb them into the on-device pipeline."""
    captured = {}

    def spy(*args, **kwargs):
        from esr_tpu.data.pipeline import make_train_pipeline

        captured.update(kwargs)
        return make_train_pipeline(*args, **kwargs)

    import esr_tpu.models.sr_model as srm
    import esr_tpu.models.srragan_model as srr
    from esr_tpu.models import create_model

    monkeypatch.setattr(srm, "make_train_pipeline", spy)
    opt = tiny_train_opt(tmp_path, model="sr")
    opt["datasets"]["train"]["use_flip"] = False
    opt["datasets"]["train"]["use_rot"] = False
    create_model(opt)
    assert captured["use_flip"] is False and captured["use_rot"] is False

    captured.clear()
    monkeypatch.setattr(srr, "make_train_pipeline", spy)
    opt2 = tiny_train_opt(tmp_path, model="srragan")
    opt2["datasets"]["train"]["use_flip"] = False
    opt2["datasets"]["train"]["use_rot"] = False
    create_model(opt2)
    assert captured["use_flip"] is False and captured["use_rot"] is False


def test_sr_training_through_spatial_trunk(tmp_path):
    """`train_spatial` (r4): the activation-memory-sharding train axis. With
    an explicit halo covering the tiny net's receptive field (nb=1: ~19 LR
    px < 20) the window forward is math-identical to the unsharded one, so
    N train steps on the ('data','spatial') mesh must match single-device
    training within the same Adam float-noise bounds as train_tp/train_pp."""
    from esr_tpu.models import create_model

    def run(extra):
        opt = tiny_train_opt(tmp_path, model="sr")
        opt["datasets"]["train"]["HR_size"] = 320  # LR 80 -> 40-row strips
        opt["datasets"]["train"]["use_rot"] = False  # rot90 needs square crops
        opt["network_G"]["nb"] = 1
        opt["dist"] = False
        opt.update(extra)
        model = create_model(opt)
        rng = np.random.default_rng(17)
        for s in range(1, 3):
            model.feed_data({"HR": rng.random((2, 320, 32, 3)).astype(np.float32)})
            model.optimize_parameters(s)
        return jax.device_get(model.state.params), model.get_current_losses()

    p0, m0 = run({})
    p1, m1 = run({"train_spatial": 2, "train_spatial_halo": 20})
    assert m0["l_pix"] == pytest.approx(m1["l_pix"], rel=1e-4)
    diffs = np.concatenate(
        [
            np.abs(np.asarray(a) - np.asarray(b)).ravel()
            for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1))
        ]
    )
    # bulk float noise + isolated Adam sign flips (see the TP/PP tests)
    assert np.percentile(diffs, 99.5) < 1e-6, np.percentile(diffs, 99.5)
    assert diffs.max() < 1e-2, diffs.max()


def test_gan_training_spatial_axes(tmp_path):
    """train_spatial runs the full GAN step (alone: DP x spatial mesh with
    auto-derived halo; composed with train_tp: spatial x model mesh) and
    the option validation catches the misuse modes."""
    from esr_tpu.models import create_model

    def run(extra, hr=64):
        opt = tiny_train_opt(tmp_path, model="srragan", nz=1, use_cem=True)
        opt["datasets"]["train"]["HR_size"] = hr
        opt["datasets"]["train"]["batch_size"] = 4
        opt["network_G"]["nb"] = 2
        opt["network_G"]["fold"] = 2  # shipped config: fold=1 twin expected
        opt["dist"] = False
        opt.update(extra)
        model = create_model(opt)
        rng = np.random.default_rng(23)
        for s in range(1, 3):
            model.feed_data({"HR": rng.random((4, hr, hr, 3)).astype(np.float32)})
            model.optimize_parameters(s)
        return model

    m = run({"train_spatial": 2})
    assert m._mesh.shape == {"data": 4, "spatial": 2}
    assert np.isfinite(list(m.get_current_losses().values())).all()

    m2 = run({"train_spatial": 2, "train_tp": 2})
    assert m2._mesh.shape == {"spatial": 2, "model": 2}
    assert np.isfinite(list(m2.get_current_losses().values())).all()

    opt = tiny_train_opt(tmp_path, model="srragan", nz=1)
    opt["train_spatial"] = 2
    opt["train"]["train_pp"] = 2
    with pytest.raises(ValueError, match="mutually exclusive"):
        create_model(opt)
    opt2 = tiny_train_opt(tmp_path, model="srragan", nz=1)
    opt2["train_spatial"] = 2
    opt2["train"]["train_spatial_halo"] = 16  # 2*16 > 8-row local strip
    with pytest.raises(ValueError, match="2\\*halo"):
        create_model(opt2)


def test_train_spatial_divisibility_validated_upfront(tmp_path):
    """ADVICE r4: (HR_size/scale) % train_spatial != 0 used to surface as a
    generic shard_map spec error at the first step; now it's an actionable
    ValueError at model construction."""
    from esr_tpu.models import create_model

    opt = tiny_train_opt(tmp_path, model="sr")
    opt["datasets"]["train"]["HR_size"] = 64  # LR rows 16
    opt["train_spatial"] = 3  # 16 % 3 != 0
    with pytest.raises(ValueError, match="does not divide over"):
        create_model(opt)
