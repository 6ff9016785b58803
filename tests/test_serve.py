"""HTTP serving daemon over an exported artifact (scripts/serve.py)."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import os

    from esr_tpu.export import export_servable
    from esr_tpu.models import create_model
    from esr_tpu.options import parse
    from esr_tpu.scripts.serve import make_server

    tmp = tmp_path_factory.mktemp("serve")
    opt = parse(
        {
            "name": "serve_test",
            "model": "sr",
            "scale": 4,
            "use_cem": True,
            "datasets": {"train": {"HR_size": 32}},
            "network_G": {
                "which_model_G": "RRDB_net", "nf": 8, "nb": 1, "gc": 8,
                "in_nc": 3, "out_nc": 3, "num_latent_channels": 1,
                "latent_input": "input_concat",
            },
            "path": {"root": str(tmp)},
            "train": {"manual_seed": 0},
        },
        is_train=False,
    )
    model = create_model(opt)
    art = os.path.join(str(tmp), "artifact")
    export_servable(model, [(1, 16, 16)], art, platforms=("cpu",))
    srv = make_server(art, host="127.0.0.1", port=0)  # ephemeral port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", srv
    srv.shutdown()
    srv.server_close()


def _png_bytes(arr_u8: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr_u8).save(buf, format="PNG")
    return buf.getvalue()


def test_healthz_returns_manifest(server):
    url, srv = server
    with urllib.request.urlopen(f"{url}/healthz", timeout=30) as r:
        manifest = json.loads(r.read())
    assert manifest == srv.servable.manifest
    assert manifest["scale"] == 4


def test_sr_roundtrip(server):
    url, srv = server
    rng = np.random.default_rng(0)
    lr_u8 = (rng.random((14, 16, 3)) * 255).astype(np.uint8)
    req = urllib.request.Request(f"{url}/sr", data=_png_bytes(lr_u8), method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"] == "image/png"
        body = r.read()
    from PIL import Image

    sr = np.asarray(Image.open(io.BytesIO(body)))
    assert sr.shape == (56, 64, 3)  # 4x, cropped to the input size

    # byte-parity with calling the Servable directly (same quantization)
    want = srv.servable.sr(lr_u8.astype(np.float32) / 255.0)[0]
    want_u8 = np.round(np.clip(want, 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(sr, want_u8)


def test_sr_random_z_header(server):
    url, _ = server
    rng = np.random.default_rng(1)
    body = _png_bytes((rng.random((16, 16, 3)) * 255).astype(np.uint8))

    def fetch(headers):
        req = urllib.request.Request(f"{url}/sr", data=body, method="POST", headers=headers)
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.read()

    zeros = fetch({})
    z_a = fetch({"X-Z-Mode": "random", "X-Z-Seed": "7"})
    z_a2 = fetch({"X-Z-Mode": "random", "X-Z-Seed": "7"})
    z_b = fetch({"X-Z-Mode": "random", "X-Z-Seed": "8"})
    assert z_a == z_a2  # seeded draws are reproducible
    assert z_a != zeros and z_a != z_b  # and actually vary the output


def test_errors(server):
    url, _ = server
    # too-large input: no fitting bucket -> 400 with the loader's message
    big = _png_bytes(np.zeros((64, 64, 3), np.uint8))
    req = urllib.request.Request(f"{url}/sr", data=big, method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=120)
    assert e.value.code == 400
    assert b"no exported bucket" in e.value.read()

    # unknown path -> 404
    with pytest.raises(urllib.error.HTTPError) as e404:
        urllib.request.urlopen(f"{url}/nope", timeout=30)
    assert e404.value.code == 404
