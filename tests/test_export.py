"""AOT export / serving artifact tests (esr_tpu/export.py).

The serving contract: ``export_servable`` writes a directory a server can
consume with ``load_servable`` alone (jax + orbax, no model code), and the
deserialized StableHLO function reproduces the live eval forward exactly
(same platform, same math — jax.export replays the lowered module)."""

import json
import os

import numpy as np
import pytest


def _tiny_opt(tmp_path, nz=1, use_cem=True):
    return {
        "name": "export_test",
        "model": "sr",
        "scale": 4,
        "use_cem": use_cem,
        "datasets": {"train": {"HR_size": 32}},
        "network_G": {
            "which_model_G": "RRDB_net",
            "nf": 8,
            "nb": 1,
            "gc": 8,
            "in_nc": 3,
            "out_nc": 3,
            "num_latent_channels": nz,
            "latent_input": "input_concat" if nz else None,
        },
        "path": {"root": str(tmp_path)},
        "train": {"manual_seed": 0},
    }


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    """One exported tiny explorable model (2 buckets), shared by the tests."""
    from esr_tpu.export import export_servable
    from esr_tpu.models import create_model
    from esr_tpu.options import parse

    tmp = tmp_path_factory.mktemp("export")
    opt = parse(_tiny_opt(tmp), is_train=False)
    model = create_model(opt)
    out = os.path.join(str(tmp), "artifact")
    manifest = export_servable(
        model, [(1, 16, 16), (2, 24, 24)], out, platforms=("cpu",)
    )
    return model, out, manifest


def test_manifest_and_files(artifact):
    _, out, manifest = artifact
    assert manifest["scale"] == 4 and manifest["nz"] == 1 and manifest["cem"]
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f) == manifest
    for e in manifest["buckets"]:
        assert os.path.getsize(os.path.join(out, e["file"])) > 0
    assert os.path.isdir(os.path.join(out, "params"))


@pytest.mark.slow
def test_serve_matches_live_forward(artifact):
    """Exact-bucket input: the deserialized function must reproduce the live
    jitted eval forward bit-exactly (same platform, same lowering)."""
    import jax

    from esr_tpu.export import load_servable

    model, out, _ = artifact
    sv = load_servable(out)
    rng = np.random.default_rng(0)
    lr = rng.random((1, 16, 16, 3), np.float32)
    z = rng.uniform(-1, 1, (1, 16, 16, 1)).astype(np.float32)

    got = sv.sr(lr, z)
    params = jax.device_get(model.state.params)
    want = np.asarray(model._forward(params, lr, z), np.float32)
    np.testing.assert_array_equal(got, want)
    assert got.shape == (1, 64, 64, 3)

    # and the CEM consistency guarantee survives the export
    res = np.abs(np.asarray(model.cem.downsample(got)) - lr).max()
    assert res < 1e-4, res


def test_bucket_routing_pad_and_crop(artifact):
    from esr_tpu.export import load_servable

    _, out, _ = artifact
    sv = load_servable(out)
    rng = np.random.default_rng(1)

    # 10x12 LR -> 16x16 bucket, cropped back; HWC input auto-batched
    sr = sv.sr(rng.random((10, 12, 3), np.float32))
    assert sr.shape == (1, 40, 48, 3)

    # batch 2 at 20x20 -> (2,24,24) bucket
    sr2 = sv.sr(rng.random((2, 20, 20, 3), np.float32))
    assert sr2.shape == (2, 80, 80, 3)

    # batch fill: 1 image at 24x24 routes to the (2,24,24) bucket (the only
    # one that fits spatially) and the repeated fill image is dropped
    sr3 = sv.sr(rng.random((24, 24, 3), np.float32))
    assert sr3.shape == (1, 96, 96, 3)

    # pad+crop mechanics: sv.sr of a 14x14 input must equal hand-edge-padding
    # to the 16x16 bucket, running the LIVE forward, and cropping (at 16px the
    # model's receptive field is global, so a locality check is meaningless —
    # the contract is that the Servable does exactly the eval-loop padding)
    import jax

    model = artifact[0]
    lr14 = rng.random((1, 14, 14, 3), np.float32)
    got = sv.sr(lr14)
    lr16 = np.pad(lr14, ((0, 0), (0, 2), (0, 2), (0, 0)), mode="edge")
    params = jax.device_get(model.state.params)
    want = np.asarray(
        model._forward(params, lr16, np.zeros((1, 16, 16, 1), np.float32)),
        np.float32,
    )[:, :56, :56]
    np.testing.assert_array_equal(got, want)


def test_no_fitting_bucket_raises(artifact):
    from esr_tpu.export import load_servable

    _, out, _ = artifact
    sv = load_servable(out)
    with pytest.raises(ValueError, match="no exported bucket"):
        sv.sr(np.zeros((1, 64, 64, 3), np.float32))
    with pytest.raises(ValueError, match="no exported bucket"):
        sv.sr(np.zeros((3, 16, 16, 3), np.float32))  # batch too large


def test_future_format_version_rejected(artifact):
    from esr_tpu.export import load_servable

    _, out, _ = artifact
    path = os.path.join(out, "manifest.json")
    with open(path) as f:
        manifest = json.load(f)
    bumped = dict(manifest, format_version=manifest["format_version"] + 1)
    with open(path, "w") as f:
        json.dump(bumped, f)
    try:
        with pytest.raises(ValueError, match="newer than this loader"):
            load_servable(out)
    finally:
        with open(path, "w") as f:
            json.dump(manifest, f)


def test_export_without_latents_rejects_z(tmp_path):
    from esr_tpu.export import export_servable, load_servable
    from esr_tpu.models import create_model
    from esr_tpu.options import parse

    opt = parse(_tiny_opt(tmp_path, nz=0), is_train=False)
    model = create_model(opt)
    out = os.path.join(str(tmp_path), "artifact0")
    export_servable(model, [(1, 16, 16)], out, platforms=("cpu",))
    sv = load_servable(out)
    sr = sv.sr(np.random.default_rng(2).random((16, 16, 3), np.float32))
    assert sr.shape == (1, 64, 64, 3)
    with pytest.raises(ValueError, match="without latent"):
        sv.sr(np.zeros((16, 16, 3), np.float32), z=np.zeros((16, 16, 1), np.float32))


def test_export_cli(tmp_path, artifact):
    """The CLI script end-to-end: opt JSON -> artifact dir."""
    from esr_tpu.scripts.export_model import main, parse_shapes

    assert parse_shapes("1x128x128,4x64x64") == [(1, 128, 128), (4, 64, 64)]
    with pytest.raises(ValueError, match="bad bucket"):
        parse_shapes("8x8")

    opt_path = os.path.join(str(tmp_path), "opt.json")
    with open(opt_path, "w") as f:
        json.dump(_tiny_opt(tmp_path), f)
    out = os.path.join(str(tmp_path), "cli_artifact")
    main(["-opt", opt_path, "--shapes", "1x16x16", "--out", out, "--platforms", "cpu"])
    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    assert [tuple(e[k] for k in ("batch", "h", "w")) for e in manifest["buckets"]] == [
        (1, 16, 16)
    ]


def test_export_self_ensemble_forward(tmp_path):
    """`"self_ensemble": true` in the export opt ships the x8 dihedral-mean
    forward (export wraps whatever _make_forward builds): the loaded
    servable equals the live ensembled forward exactly and the manifest
    records the flag for servers."""
    import jax
    import jax.numpy as jnp

    from esr_tpu.export import export_servable, load_servable
    from esr_tpu.models import create_model
    from esr_tpu.options import parse

    opt_d = _tiny_opt(tmp_path)
    opt_d["self_ensemble"] = True
    opt = parse(opt_d, is_train=False)
    model = create_model(opt)
    out = os.path.join(str(tmp_path), "artifact_ens")
    manifest = export_servable(model, [(1, 16, 16)], out, platforms=("cpu",))
    assert manifest["self_ensemble"] is True

    servable = load_servable(out)
    rng = np.random.default_rng(3)
    lr = rng.random((1, 16, 16, 3)).astype(np.float32)
    z = rng.uniform(-1, 1, (1, 16, 16, 1)).astype(np.float32)
    got = np.asarray(servable.sr(lr, z))
    live = np.asarray(jax.jit(model._make_forward())(model.state.params, jnp.asarray(lr), jnp.asarray(z)))
    np.testing.assert_allclose(got, live, atol=1e-6)

    # and it differs from the plain (non-ensembled) forward
    opt_d2 = _tiny_opt(tmp_path)
    plain_model = create_model(parse(opt_d2, is_train=False))
    plain = np.asarray(
        jax.jit(plain_model._make_forward())(model.state.params, jnp.asarray(lr), jnp.asarray(z))
    )
    assert np.abs(got - plain).max() > 1e-5
