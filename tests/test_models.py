"""Architecture parity tests (SURVEY.md §7.3).

Oracle: a minimal torch implementation of the ESRGAN RRDB generator (written
from the architecture spec, torch-cpu is installed for exactly this purpose —
SURVEY.md §4) is run against our flax/NHWC implementation with converted
weights; outputs must agree to float tolerance. Param counts are locked
against the analytic formulas.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from esr_tpu.models.architecture import (
    DiscriminatorVGG128,
    RRDBNet,
    VGG19FeatureExtractor,
)
from esr_tpu.models.networks import define_D, define_F, define_G, load_rrdb_from_torch


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def conv_params(cin, cout, k=3):
    return cin * cout * k * k + cout


def rrdb_g_params(in_nc=3, out_nc=3, nf=64, nb=23, gc=32):
    rdb = sum(conv_params(nf + i * gc, gc) for i in range(4)) + conv_params(nf + 4 * gc, nf)
    rrdb = 3 * rdb
    return (
        conv_params(in_nc, nf)
        + nb * rrdb
        + conv_params(nf, nf)  # trunk
        + 2 * conv_params(nf, nf)  # upconvs
        + conv_params(nf, nf)  # HRconv
        + conv_params(nf, out_nc)
    )


def test_rrdbnet_shapes_and_params():
    model = RRDBNet(nf=16, nb=2, gc=8, scale=4)
    x = jnp.zeros((2, 8, 8, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 32, 32, 3)
    assert n_params(variables) == rrdb_g_params(nf=16, nb=2, gc=8)


def test_rrdbnet_full_param_count():
    """Full ESRGAN generator: 16,697,987 parameters (nb=23, nf=64, gc=32)."""
    assert rrdb_g_params() == 16_697_987
    model = RRDBNet()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    )
    assert n_params(variables) == 16_697_987


def test_rrdbnet_latent_input():
    model = RRDBNet(nf=16, nb=1, gc=8, scale=4, num_latent_channels=2)
    x = jnp.zeros((1, 8, 8, 3))
    z = jnp.ones((1, 8, 8, 2))
    variables = model.init(jax.random.PRNGKey(0), x, z)
    y0 = model.apply(variables, x)  # z defaults to zeros
    y1 = model.apply(variables, x, z)
    assert y0.shape == y1.shape == (1, 32, 32, 3)
    assert float(jnp.abs(y1 - y0).max()) > 0  # z actually affects the output
    # param count: first conv sees in_nc + nz channels
    assert n_params(variables) == rrdb_g_params(in_nc=5, nf=16, nb=1, gc=8)


def test_rrdbnet_latent_all_layers():
    model = RRDBNet(
        nf=16, nb=2, gc=8, scale=4, num_latent_channels=1, latent_input="all_layers"
    )
    x = jnp.zeros((1, 8, 8, 3))
    z = jnp.ones((1, 8, 8, 1))
    variables = model.init(jax.random.PRNGKey(0), x, z)
    assert model.apply(variables, x, z).shape == (1, 32, 32, 3)


def test_all_layers_scan_matches_unrolled():
    """latent_input='all_layers' under nn.scan (stacked per-block latent
    projections) is numerically identical to the unrolled trunk after
    stack_rrdb_params (which also stacks latent_proj{i})."""
    from esr_tpu.models.networks import stack_rrdb_params

    kw = dict(nf=16, nb=3, gc=8, scale=4, num_latent_channels=2,
              latent_input="all_layers")
    unrolled = RRDBNet(scan_blocks=False, **kw)
    scanned = RRDBNet(scan_blocks=True, **kw)
    rng = jax.random.PRNGKey(7)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 2))
    p = unrolled.init(rng, x, z)["params"]
    y_unroll = unrolled.apply({"params": p}, x, z)
    y_scan = scanned.apply({"params": stack_rrdb_params(p, nb=3)}, x, z)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_unroll),
                               atol=5e-5, rtol=0)
    # z=None defaults to zeros on the scan path too
    assert scanned.apply(
        {"params": stack_rrdb_params(p, nb=3)}, x
    ).shape == (2, 32, 32, 3)


@pytest.mark.parametrize("latent", ["first_layer", "all_layers"])
@pytest.mark.slow
def test_fold2_matches_unfolded(latent):
    """fold=2 (batch->channel block-diagonal folding, the v5e MXU-lane
    optimization) is numerically equivalent to the unfolded forward with the
    SAME param tree, for both latent injection modes."""
    kw = dict(nf=16, nb=2, gc=8, scale=4, num_latent_channels=2,
              latent_input=latent)
    base = RRDBNet(fold=1, **kw)
    folded = RRDBNet(fold=2, **kw)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 3))
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 2))
    p = base.init(jax.random.PRNGKey(0), x[:1], z[:1])["params"]
    # identical param trees (fold is apply-time only)
    assert jax.tree.structure(folded.init(jax.random.PRNGKey(0), x, z)["params"]
                              ) == jax.tree.structure(p)
    y0 = base.apply({"params": p}, x, z)
    y1 = folded.apply({"params": p}, x, z)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=5e-5, rtol=0)
    # non-divisible batch degrades gracefully to unfolded
    y_odd = folded.apply({"params": p}, x[:3], z[:3])
    np.testing.assert_allclose(np.asarray(y_odd), np.asarray(y0[:3]), atol=5e-5, rtol=0)
    # unrolled trunk x fold composes too (latent_proj/fold_concat path)
    unrolled = RRDBNet(fold=2, scan_blocks=False, **kw)
    pu = unrolled.init(jax.random.PRNGKey(0), x, z)["params"]
    yu = unrolled.apply({"params": pu}, x, z)
    yu0 = RRDBNet(fold=1, scan_blocks=False, **kw).apply({"params": pu}, x, z)
    np.testing.assert_allclose(np.asarray(yu), np.asarray(yu0), atol=5e-5, rtol=0)


@pytest.mark.slow
def test_fold2_gradients_match():
    """Grads through the folded apply equal the unfolded grads (training can
    run folded) — for BOTH folded backwards: XLA's dense folded-width dW
    (the measured-faster default) and the unfolded-dW custom vjp scaffold
    (kept gradient-exact; see blocks.folded_conv docstring)."""
    from esr_tpu.models import blocks as blocks_mod

    kw = dict(nf=8, nb=1, gc=4, scale=4)
    base, folded = RRDBNet(fold=1, **kw), RRDBNet(fold=2, **kw)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 6, 6, 3))
    p = base.init(jax.random.PRNGKey(0), x)["params"]

    def make_loss(m):
        return lambda params: jnp.sum(m.apply({"params": params}, x) ** 2)

    g0 = jax.grad(make_loss(base))(p)
    orig = blocks_mod.FOLD_CUSTOM_VJP
    try:
        for custom_vjp in (False, True):
            blocks_mod.FOLD_CUSTOM_VJP = custom_vjp
            # fresh trace each time (module-level toggle is read at trace time)
            g1 = jax.grad(jax.jit(make_loss(folded)))(p)
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4
                ),
                g0, g1,
            )
    finally:
        blocks_mod.FOLD_CUSTOM_VJP = orig


@pytest.mark.slow
def test_discriminator_shapes():
    model = DiscriminatorVGG128(nf=8)
    x = jnp.zeros((2, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 1)
    # train mode updates batch stats
    y2, mutated = model.apply(
        variables, jnp.ones((2, 128, 128, 3)), train=True, mutable=["batch_stats"]
    )
    assert "batch_stats" in mutated


def test_vgg_extractor_shapes_and_params():
    model = VGG19FeatureExtractor()
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 8, 8, 512)  # conv5_4 at 128/16
    # all 16 VGG19 conv layers present
    expected = 0
    cfg = [(3, 64), (64, 64), (64, 128), (128, 128)] + [(128, 256)] + [(256, 256)] * 3
    cfg += [(256, 512)] + [(512, 512)] * 3 + [(512, 512)] * 4
    for cin, cout in cfg:
        expected += conv_params(cin, cout)
    assert n_params(variables) == expected == 20_024_384


def test_factories_read_reference_option_keys():
    opt = {
        "scale": 4,
        "bf16": False,
        "network_G": {
            "which_model_G": "RRDB_net",
            "nf": 8,
            "nb": 1,
            "gc": 4,
            "in_nc": 3,
            "out_nc": 3,
            "num_latent_channels": 1,
            "latent_input": "first_layer",
        },
        "network_D": {"which_model_D": "discriminator_vgg_128", "nf": 8},
        "train": {"feature_layer": 34},
    }
    g = define_G(opt)
    assert g.nb == 1 and g.num_latent_channels == 1
    d = define_D(opt)
    assert d.nf == 8
    f = define_F(opt)
    assert f.feature_layer == 34


@pytest.mark.parametrize("key_style", ["new", "old"])
def test_torch_oracle_forward_parity(key_style):
    """Our RRDBNet with weights converted from a torch oracle produces the
    same output (NCHW/NHWC transposed) to float tolerance."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    nf, gc, nb = 8, 4, 2

    class TRDB(nn.Module):
        def __init__(self):
            super().__init__()
            for k in range(1, 5):
                setattr(self, f"conv{k}", nn.Conv2d(nf + (k - 1) * gc, gc, 3, 1, 1))
            self.conv5 = nn.Conv2d(nf + 4 * gc, nf, 3, 1, 1)

        def forward(self, x):
            feats = [x]
            for k in range(1, 5):
                feats.append(
                    F.leaky_relu(getattr(self, f"conv{k}")(torch.cat(feats, 1)), 0.2)
                )
            return x + 0.2 * self.conv5(torch.cat(feats, 1))

    class TRRDB(nn.Module):
        def __init__(self):
            super().__init__()
            self.RDB1, self.RDB2, self.RDB3 = TRDB(), TRDB(), TRDB()

        def forward(self, x):
            return x + 0.2 * self.RDB3(self.RDB2(self.RDB1(x)))

    class TGen(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_first = nn.Conv2d(3, nf, 3, 1, 1)
            self.RRDB_trunk = nn.ModuleList([TRRDB() for _ in range(nb)])
            self.trunk_conv = nn.Conv2d(nf, nf, 3, 1, 1)
            self.upconv1 = nn.Conv2d(nf, nf, 3, 1, 1)
            self.upconv2 = nn.Conv2d(nf, nf, 3, 1, 1)
            self.HRconv = nn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_last = nn.Conv2d(nf, 3, 3, 1, 1)

        def forward(self, x):
            fea = self.conv_first(x)
            t = fea
            for blk in self.RRDB_trunk:
                t = blk(t)
            fea = fea + self.trunk_conv(t)
            for up in (self.upconv1, self.upconv2):
                fea = F.leaky_relu(up(F.interpolate(fea, scale_factor=2, mode="nearest")), 0.2)
            return self.conv_last(F.leaky_relu(self.HRconv(fea), 0.2))

    torch.manual_seed(0)
    tg = TGen().eval()
    x = np.random.default_rng(0).random((1, 3, 12, 12)).astype(np.float32)
    with torch.no_grad():
        y_t = tg(torch.from_numpy(x)).numpy()

    sd = {k: v.numpy() for k, v in tg.state_dict().items()}
    if key_style == "old":
        remap = {}
        for k, v in sd.items():
            nk = k.replace("conv_first.", "model.0.")
            nk = nk.replace("trunk_conv.", "model.1.sub.2.")  # nb=2 -> idx nb
            import re

            nk = re.sub(r"RRDB_trunk\.(\d+)\.", r"model.1.sub.\1.", nk)
            nk = nk.replace("upconv1.", "model.3.")
            nk = nk.replace("upconv2.", "model.6.")
            nk = nk.replace("HRconv.", "model.8.")
            nk = nk.replace("conv_last.", "model.10.")
            remap[nk] = v
        # converter expects old-style trunk at sub.23; emulate by renaming
        remap = {
            k.replace("model.1.sub.2.", "model.1.sub.23."): v for k, v in remap.items()
        }
        sd = remap

    params = load_rrdb_from_torch(sd, nb=nb)
    model = RRDBNet(nf=nf, nb=nb, gc=gc, scale=4)
    y_j = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(y_j), y_t.transpose(0, 2, 3, 1), atol=2e-5
    )


def test_fused_upsample_conv_equivalence():
    """The 4-parity rewrite equals upsample->conv3x3 exactly, and the fused
    RRDBNet (default) matches the unfused variant with identical params."""
    import jax.numpy as jnp

    from esr_tpu.models.blocks import upsample_nearest_2x
    from esr_tpu.ops.fused import upsample2x_conv3x3

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 9, 11, 5)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((3, 3, 5, 4)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(4), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        upsample_nearest_2x(x), kern, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    fused = upsample2x_conv3x3(x, kern, bias)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)

    lr = jnp.asarray(rng.random((1, 8, 8, 3)), jnp.float32)
    fused_model = RRDBNet(nf=8, nb=1, gc=4, scale=4, fused_upsample=True)
    plain_model = RRDBNet(nf=8, nb=1, gc=4, scale=4, fused_upsample=False)
    variables = fused_model.init(jax.random.PRNGKey(0), lr)
    # identical param tree (checkpoint compatibility) -> reuse directly
    y_fused = fused_model.apply(variables, lr)
    y_plain = plain_model.apply(variables, lr)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain), atol=1e-5)


@pytest.mark.slow
def test_scan_blocks_equivalence():
    """scan_blocks (default) matches the unrolled trunk with stacked params."""
    from esr_tpu.models.networks import stack_rrdb_params

    rng = np.random.default_rng(8)
    lr = jnp.asarray(rng.random((1, 8, 8, 3)), jnp.float32)
    plain = RRDBNet(nf=8, nb=3, gc=4, scale=4, scan_blocks=False)
    scanned = RRDBNet(nf=8, nb=3, gc=4, scale=4, scan_blocks=True)
    p_plain = plain.init(jax.random.PRNGKey(0), lr)["params"]
    p_scan = {"params": stack_rrdb_params(p_plain, nb=3)}
    y_plain = plain.apply({"params": p_plain}, lr)
    y_scan = scanned.apply(p_scan, lr)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_plain), atol=1e-5)
    # param counts identical
    def n(t):
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(t))
    assert n(p_scan) == n(p_plain)


def test_torch_oracle_discriminator_parity():
    """Flax DiscriminatorVGG128 with weights converted from a torch oracle
    (eval-mode BN) matches to float tolerance."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from esr_tpu.models.networks import load_discriminator_from_torch

    nf = 8

    class TD(nn.Module):
        def __init__(self):
            super().__init__()
            chans = [(3, nf), (nf, nf), (nf, 2 * nf), (2 * nf, 2 * nf),
                     (2 * nf, 4 * nf), (4 * nf, 4 * nf), (4 * nf, 8 * nf),
                     (8 * nf, 8 * nf), (8 * nf, 8 * nf), (8 * nf, 8 * nf)]
            for i, (cin, cout) in enumerate(chans):
                b, s = divmod(i, 2)
                k, stride = (3, 1) if s == 0 else (4, 2)
                bias = i == 0
                setattr(self, f"conv{b}_{s}", nn.Conv2d(cin, cout, k, stride, (k - 1) // 2, bias=bias))
                if i > 0:
                    setattr(self, f"bn{b}_{s}", nn.BatchNorm2d(cout, affine=True))
            self.linear1 = nn.Linear(8 * nf * 4 * 4, 100)
            self.linear2 = nn.Linear(100, 1)

        def forward(self, x):
            for i in range(10):
                b, s = divmod(i, 2)
                x = getattr(self, f"conv{b}_{s}")(x)
                if i > 0:
                    x = getattr(self, f"bn{b}_{s}")(x)
                x = F.leaky_relu(x, 0.2)
            x = x.flatten(1)
            return self.linear2(F.leaky_relu(self.linear1(x), 0.2))

    torch.manual_seed(0)
    td = TD().eval()
    # randomize BN stats so the test isn't trivially mean-0/var-1
    with torch.no_grad():
        for m in td.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    x = np.random.default_rng(0).random((2, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        y_t = td(torch.from_numpy(x)).numpy()

    variables = load_discriminator_from_torch(
        {k: v.numpy() for k, v in td.state_dict().items()}
    )
    model = DiscriminatorVGG128(nf=nf)
    y_j = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=3e-4)


def _tree_allclose(a, b, atol=0.0):
    import jax

    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


@pytest.mark.parametrize("layout", ["scan", "unrolled"])
def test_torch_export_roundtrip_rrdb(layout):
    """rrdb_to_torch is the exact inverse of load_rrdb_from_torch (both param
    layouts), and the exported key set is exactly what a torch ESRGAN
    generator's state_dict contains — so reference tooling loads it as-is."""
    import jax

    from esr_tpu.models.networks import load_rrdb_from_torch, rrdb_to_torch

    nf, gc, nb = 8, 4, 2
    model = RRDBNet(nf=nf, nb=nb, gc=gc, scale=4, scan_blocks=layout == "scan")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    sd = rrdb_to_torch(params)

    expected = set()
    for name in ("conv_first", "trunk_conv", "upconv1", "upconv2", "HRconv", "conv_last"):
        expected |= {f"{name}.weight", f"{name}.bias"}
    for i in range(nb):
        for j in (1, 2, 3):
            for k in range(1, 6):
                expected |= {
                    f"RRDB_trunk.{i}.RDB{j}.conv{k}.weight",
                    f"RRDB_trunk.{i}.RDB{j}.conv{k}.bias",
                }
    assert set(sd) == expected
    assert sd["conv_first.weight"].shape == (nf, 3, 3, 3)  # OIHW

    back = load_rrdb_from_torch(sd, nb=nb, scan=layout == "scan")
    _tree_allclose(params["params"], back["params"])


def test_torch_export_latent_proj_keys():
    """all_layers latent projections export under the documented fork-only
    naming (no reference counterpart)."""
    import jax

    from esr_tpu.models.networks import rrdb_to_torch

    model = RRDBNet(
        nf=8, nb=2, gc=4, scale=4, num_latent_channels=2, latent_input="all_layers"
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    sd = rrdb_to_torch(params)
    assert {"latent_proj.0.weight", "latent_proj.1.bias"} <= set(sd)


@pytest.mark.slow
def test_torch_export_roundtrip_discriminator():
    """discriminator_to_torch inverts load_discriminator_from_torch,
    including BN running stats and the NHWC/NCHW linear1 permutation."""
    import jax

    from esr_tpu.models.networks import (
        discriminator_to_torch,
        load_discriminator_from_torch,
    )

    model = DiscriminatorVGG128(nf=8)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False
    )
    # non-trivial running stats so the round-trip exercises them
    variables = jax.tree.map(
        lambda x: x + 0.1 * np.random.default_rng(0).random(x.shape).astype(np.float32),
        variables,
    )
    sd = discriminator_to_torch(variables)
    assert "bn0_1.running_mean" in sd and "linear1.weight" in sd
    back = load_discriminator_from_torch(sd)
    _tree_allclose(variables["params"], back["params"], atol=1e-6)
    _tree_allclose(variables["batch_stats"], back["batch_stats"], atol=1e-6)


def test_pixel_shuffle_matches_torch():
    import torch

    from esr_tpu.models.architecture import pixel_shuffle

    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 16, 3, 5)).astype(np.float32)  # NCHW c=16
    ref = torch.pixel_shuffle(torch.from_numpy(x), 2).numpy()  # (2,4,6,10)
    got = np.asarray(pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2))
    np.testing.assert_allclose(got, ref.transpose(0, 2, 3, 1), atol=1e-6)


def test_srresnet_family():
    from esr_tpu.models.architecture import SRResNet
    from esr_tpu.models.networks import define_G

    model = SRResNet(nf=8, nb=2, scale=4, num_latent_channels=1)
    lr = jnp.zeros((1, 8, 8, 3))
    z = jnp.zeros((1, 8, 8, 1))
    variables = model.init(jax.random.PRNGKey(0), lr, z)
    assert model.apply(variables, lr, z).shape == (1, 32, 32, 3)

    g = define_G(
        {
            "scale": 4,
            "bf16": False,
            "network_G": {"which_model_G": "sr_resnet", "nf": 8, "nb": 2},
        }
    )
    assert isinstance(g, SRResNet) and g.nb == 2


def test_remat_gradients():
    """remat=True (rematerialized backward) produces the same gradients."""
    lr = jnp.asarray(np.random.default_rng(10).random((1, 8, 8, 3)), jnp.float32)
    base = RRDBNet(nf=8, nb=2, gc=4, scale=4, remat=False)
    rem = RRDBNet(nf=8, nb=2, gc=4, scale=4, remat=True)
    params = base.init(jax.random.PRNGKey(0), lr)["params"]

    def loss(model, p):
        return jnp.mean(model.apply({"params": p}, lr) ** 2)

    g1 = jax.grad(lambda p: loss(base, p))(params)
    g2 = jax.grad(lambda p: loss(rem, p))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_packed_rdb_equals_dense():
    """The per-source packed RDB formulation (production path) is the same
    function as the concat form: identical param tree, outputs equal to
    accumulation-order rounding (f32), gradients close too."""
    import jax
    import jax.numpy as jnp

    from esr_tpu.models.architecture import RRDBNet

    kw = dict(nf=8, nb=2, gc=4, scale=4, num_latent_channels=1)
    m_p = RRDBNet(**kw, packed=True)
    m_d = RRDBNet(**kw, packed=False)
    lr = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 3)), jnp.float32)
    z = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (1, 16, 16, 1)), jnp.float32)
    v_p = m_p.init(jax.random.PRNGKey(0), lr, z)
    v_d = m_d.init(jax.random.PRNGKey(0), lr, z)
    assert jax.tree_util.tree_structure(v_p) == jax.tree_util.tree_structure(v_d)
    assert all(
        a.shape == b.shape
        for a, b in zip(jax.tree.leaves(v_p), jax.tree.leaves(v_d))
    )
    out_p = m_p.apply(v_d, lr, z)
    out_d = m_d.apply(v_d, lr, z)
    assert float(jnp.abs(out_p - out_d).max()) < 1e-5

    def loss_p(p):
        return jnp.sum(m_p.apply(p, lr, z) ** 2)

    def loss_d(p):
        return jnp.sum(m_d.apply(p, lr, z) ** 2)

    g_p = jax.grad(loss_p)(v_d)
    g_d = jax.grad(loss_d)(v_d)
    num = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_d))
    )
    den = max(float(jnp.abs(b).max()) for b in jax.tree.leaves(g_d))
    assert num / den < 1e-5  # measured ~2e-7: accumulation-order rounding only


@pytest.mark.slow
def test_scale3_rrdb_and_srresnet_with_cem():
    """x3 models (reference lineage supports x2/x3/x4): RRDB takes one
    nearest-x3+conv upsample stage, SRResNet one PixelShuffle(3) stage; CEM
    at scale 3 keeps the output exactly LR-consistent."""
    from esr_tpu.cem import CEMConf, make_cem
    from esr_tpu.models.architecture import RRDBNet, SRResNet

    rng = jax.random.PRNGKey(0)
    lr = jax.random.uniform(rng, (2, 12, 12, 3))

    g = RRDBNet(nf=8, nb=1, gc=4, scale=3, num_latent_channels=1)
    z = jnp.zeros((2, 12, 12, 1))
    v = g.init(rng, lr, z)
    sr = g.apply(v, lr, z)
    assert sr.shape == (2, 36, 36, 3)

    s = SRResNet(nf=8, nb=2, scale=3)
    vs = s.init(rng, lr)
    assert s.apply(vs, lr).shape == (2, 36, 36, 3)

    cem = make_cem(CEMConf(scale=3))
    out = cem.project(sr, lr)
    err = float(jnp.abs(cem.downsample(out) - lr).max())
    assert err < 1e-5, err

    with pytest.raises(ValueError, match="unsupported scale"):
        RRDBNet(nf=8, nb=1, gc=4, scale=5).init(rng, lr, z)
