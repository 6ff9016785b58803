"""Network factories + torch-checkpoint converters (SURVEY.md §2.6).

Behavioral spec from the reference's ``codes/models/networks.py``: ``define_G
/ define_D / define_F`` build generator / discriminator / frozen VGG feature
extractor from the options dict (``network_G``/``network_D`` blocks with the
reference's key names: ``which_model_G``, ``nf``, ``nb``, ``in_nc``,
``out_nc``, ``gc``, ``scale``, ``latent_input``/``num_latent_channels``).
Kaiming(x0.1 residual) init is baked into the flax modules.

Converters map released torch ``.pth`` checkpoints (old- and new-style ESRGAN
key layouts, torchvision VGG19) into our NHWC flax params for parity testing;
torch-cpu is installed in this environment, the weights themselves are not
obtainable offline (SURVEY.md §7 hard-part 3) so they are a pluggable asset.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from esr_tpu.models.architecture import (
    DiscriminatorVGG128,
    RRDBNet,
    SRResNet,
    VGG19FeatureExtractor,
)

__all__ = [
    "define_G",
    "define_D",
    "define_F",
    "init_params",
    "load_rrdb_from_torch",
    "load_vgg19_from_torch",
    "rrdb_to_torch",
    "discriminator_to_torch",
]


def define_G(opt: dict) -> RRDBNet:
    o = opt["network_G"]
    which = (o.get("which_model_G") or "RRDB_net").lower()
    latent = opt.get("network_G", {}).get("latent_input") or opt.get("latent_input")
    nz = int(o.get("num_latent_channels") or 0)
    dtype = jnp.bfloat16 if opt.get("bf16", True) else jnp.float32
    if which in ("sr_resnet", "srresnet", "msrresnet"):
        return SRResNet(
            in_nc=int(o.get("in_nc") or 3),
            out_nc=int(o.get("out_nc") or 3),
            nf=int(o.get("nf") or 64),
            nb=int(o.get("nb") or 16),
            scale=int(opt.get("scale") or 4),
            num_latent_channels=nz,
            dtype=dtype,
        )
    if which not in ("rrdb_net", "rrdbnet", "rrdb"):
        raise NotImplementedError(f"generator {which} not supported")
    return RRDBNet(
        in_nc=int(o.get("in_nc") or 3),
        out_nc=int(o.get("out_nc") or 3),
        nf=int(o.get("nf") or 64),
        nb=int(o.get("nb") or 23),
        gc=int(o.get("gc") or 32),
        scale=int(opt.get("scale") or 4),
        num_latent_channels=nz,
        latent_input=latent or "first_layer",
        packed=bool(o.get("packed", True)),
        fold=int(o.get("fold") or 1),
        dtype=dtype,
    )


def define_D(opt: dict) -> DiscriminatorVGG128:
    o = opt.get("network_D") or {}
    which = (o.get("which_model_D") or "discriminator_vgg_128").lower()
    if "vgg" not in which:
        raise NotImplementedError(f"discriminator {which} not supported")
    dtype = jnp.bfloat16 if opt.get("bf16", True) else jnp.float32
    return DiscriminatorVGG128(
        in_nc=int(o.get("in_nc") or 3),
        nf=int(o.get("nf") or 64),
        norm="batch" if (o.get("norm_type") or "batch") == "batch" else "none",
        dtype=dtype,
    )


def define_F(opt: dict, use_bn: bool = False) -> VGG19FeatureExtractor:
    train_opt = opt.get("train") or {}
    layer = int(train_opt.get("feature_layer") or 34)
    dtype = jnp.bfloat16 if opt.get("bf16", True) else jnp.float32
    return VGG19FeatureExtractor(feature_layer=layer, dtype=dtype)


def init_params(module, rng, *example_args, **kwargs):
    """Initialize flax variables; returns the full variable dict."""
    return module.init(rng, *example_args, **kwargs)


def describe_network(name: str, module, variables) -> str:
    """One-line network description (the reference logs architectures +
    param counts at model creation)."""
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables))
    return f"Network {name}: {type(module).__name__} with {n:,d} parameters"


# --------------------------------------------------------------------------
# torch .pth -> flax params converters (OIHW -> HWIO, name remapping)
# --------------------------------------------------------------------------


def _t2j_conv(w: "Any") -> np.ndarray:
    w = np.asarray(w, dtype=np.float32)
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _normalize_rrdb_keys(state: dict) -> dict:
    """Map both known torch ESRGAN key layouts to a canonical naming.

    new-style: conv_first / RRDB_trunk.{i}.RDB{j}.conv{k}.0 / trunk_conv /
               upconv1 / upconv2 / HRconv / conv_last
    old-style: model.0 / model.1.sub.{i}.RDB{j}.conv{k}.0 / model.1.sub.23 /
               model.3 / model.6 / model.8 / model.10
    """
    out = {}
    for k, v in state.items():
        nk = k
        nk = nk.replace("model.0.", "conv_first.")
        nk = re.sub(r"model\.1\.sub\.23\.", "trunk_conv.", nk)
        nk = re.sub(r"model\.1\.sub\.(\d+)\.", r"RRDB_trunk.\1.", nk)
        nk = nk.replace("model.3.", "upconv1.")
        nk = nk.replace("model.6.", "upconv2.")
        nk = nk.replace("model.8.", "HRconv.")
        nk = nk.replace("model.10.", "conv_last.")
        out[nk] = v
    return out


def load_rrdb_from_torch(state_dict: dict, nb: int = 23, scan: bool = True) -> dict:
    """torch RRDBNet state_dict -> flax params tree for our RRDBNet.

    ``scan=True`` emits the default scan layout (blocks stacked under
    ``rrdb_scan/block`` with a leading (nb,) axis); ``scan=False`` the
    unrolled ``rrdb{i}`` layout.
    """
    sd = _normalize_rrdb_keys(
        {k: v for k, v in state_dict.items() if "weight" in k or "bias" in k}
    )

    def conv(prefix):
        return {
            "Conv_0": {
                "kernel": _t2j_conv(sd[prefix + ".weight"]),
                "bias": np.asarray(sd[prefix + ".bias"], dtype=np.float32),
            }
        }

    def maybe_seq(prefix):
        # torch convs inside RDB are Sequential(conv, lrelu) -> '.0' suffix
        return prefix + ".0" if prefix + ".0.weight" in sd else prefix

    params = {
        "conv_first": conv(maybe_seq("conv_first")),
        "trunk_conv": conv(maybe_seq("trunk_conv")),
        "HRconv": conv(maybe_seq("HRconv")),
        "conv_last": conv(maybe_seq("conv_last")),
    }
    blocks = []
    for i in range(nb):
        rrdb = {}
        for j in range(1, 4):
            rdb = {}
            for k in range(1, 6):
                rdb[f"conv{k}"] = conv(maybe_seq(f"RRDB_trunk.{i}.RDB{j}.conv{k}"))
            rrdb[f"rdb{j}"] = rdb
        blocks.append(rrdb)
    if scan:
        params["rrdb_scan"] = {
            "block": jax.tree.map(lambda *xs: np.stack(xs), *blocks)
        }
    else:
        for i, blk in enumerate(blocks):
            params[f"rrdb{i}"] = blk
    for i in (1, 2):
        params[f"upconv{i}"] = conv(maybe_seq(f"upconv{i}"))
    return {"params": jax.tree.map(jnp.asarray, params)}


def stack_rrdb_params(params: dict, nb: int) -> dict:
    """Convert an unrolled ``rrdb{i}`` param tree to the scan layout.

    Also stacks per-block ``latent_proj{i}`` 1x1 convs (the
    ``latent_input='all_layers'`` injections) under ``rrdb_scan/latent_proj``.
    """
    out = {
        k: v
        for k, v in params.items()
        if not (k.startswith("rrdb") or k.startswith("latent_proj"))
    }
    blocks = [params[f"rrdb{i}"] for i in range(nb)]
    out["rrdb_scan"] = {"block": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)}
    if "latent_proj0" in params:
        projs = [params[f"latent_proj{i}"] for i in range(nb)]
        out["rrdb_scan"]["latent_proj"] = jax.tree.map(
            lambda *xs: jnp.stack(xs), *projs
        )
    return out


def load_discriminator_from_torch(state_dict: dict) -> dict:
    """torch Discriminator_VGG_128 state_dict -> flax variables
    ({'params', 'batch_stats'}) for our DiscriminatorVGG128.

    Expected torch naming: conv0_0/conv0_1/..conv4_1 (+ bnX_Y BatchNorm2d for
    all but conv0_0) and linear1/linear2.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}
    names = [f"{b}_{i}" for b in range(5) for i in (0, 1)]
    for idx, name in enumerate(names):
        conv = {"kernel": jnp.asarray(_t2j_conv(sd[f"conv{name}.weight"]))}
        if f"conv{name}.bias" in sd:
            conv["bias"] = jnp.asarray(sd[f"conv{name}.bias"].astype(np.float32))
        params[f"conv{name}"] = conv
        if f"bn{name}.weight" in sd:
            params[f"bn{name}"] = {
                "scale": jnp.asarray(sd[f"bn{name}.weight"].astype(np.float32)),
                "bias": jnp.asarray(sd[f"bn{name}.bias"].astype(np.float32)),
            }
            stats[f"bn{name}"] = {
                "mean": jnp.asarray(sd[f"bn{name}.running_mean"].astype(np.float32)),
                "var": jnp.asarray(sd[f"bn{name}.running_var"].astype(np.float32)),
            }
    # linear1 consumes the flattened 4x4 feature map: torch flattens NCHW
    # (C-major), our NHWC flatten is H-major -> permute the input axis
    w1 = sd["linear1.weight"].astype(np.float32)  # (100, C*4*4)
    c_last = sd["conv4_1.weight"].shape[0]
    w1 = w1.reshape(-1, c_last, 4, 4).transpose(0, 2, 3, 1).reshape(w1.shape[0], -1)
    params["linear1"] = {
        "kernel": jnp.asarray(w1.T),
        "bias": jnp.asarray(sd["linear1.bias"].astype(np.float32)),
    }
    params["linear2"] = {
        "kernel": jnp.asarray(sd["linear2.weight"].astype(np.float32).T),
        "bias": jnp.asarray(sd["linear2.bias"].astype(np.float32)),
    }
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def _j2t_conv(k: "Any") -> np.ndarray:
    k = np.asarray(k, dtype=np.float32)
    return np.transpose(k, (3, 2, 0, 1))  # HWIO -> OIHW


def rrdb_to_torch(params: dict) -> dict:
    """Our RRDBNet params (scan or unrolled layout) -> a torch-style ESRGAN
    state_dict (new-style keys: ``conv_first`` / ``RRDB_trunk.{i}.RDB{j}.
    conv{k}`` / ``trunk_conv`` / ``upconv{n}`` / ``HRconv`` / ``conv_last``),
    numpy values in OIHW. Inverse of :func:`load_rrdb_from_torch` — lets a
    checkpoint trained here round-trip back to the reference ecosystem
    (SURVEY.md §5.4; the reference loads exactly these keys). Per-block
    latent projections (``latent_input='all_layers'``, a fork-only concept
    with no reference key) are exported as ``latent_proj.{i}.weight/bias``.
    """
    if "params" in params and "conv_first" not in params:
        params = params["params"]
    out: dict = {}

    def put(name: str, conv: dict) -> None:
        c = conv["Conv_0"] if "Conv_0" in conv else conv
        out[name + ".weight"] = _j2t_conv(c["kernel"])
        out[name + ".bias"] = np.asarray(c["bias"], dtype=np.float32)

    blocks: list = []
    projs: list = []
    if "rrdb_scan" in params:
        stacked = params["rrdb_scan"]["block"]
        nb = int(jax.tree.leaves(stacked)[0].shape[0])
        blocks = [jax.tree.map(lambda x, i=i: x[i], stacked) for i in range(nb)]
        if "latent_proj" in params["rrdb_scan"]:
            sp = params["rrdb_scan"]["latent_proj"]
            projs = [jax.tree.map(lambda x, i=i: x[i], sp) for i in range(nb)]
    else:
        nb = sum(1 for k in params if re.fullmatch(r"rrdb\d+", k))
        blocks = [params[f"rrdb{i}"] for i in range(nb)]
        projs = [params[f"latent_proj{i}"] for i in range(nb) if f"latent_proj{i}" in params]

    for name in ("conv_first", "trunk_conv", "HRconv", "conv_last"):
        put(name, params[name])
    for i, blk in enumerate(blocks):
        for j in (1, 2, 3):
            for k in range(1, 6):
                put(f"RRDB_trunk.{i}.RDB{j}.conv{k}", blk[f"rdb{j}"][f"conv{k}"])
    for i, p in enumerate(projs):
        put(f"latent_proj.{i}", p)
    i = 1
    while f"upconv{i}" in params:
        put(f"upconv{i}", params[f"upconv{i}"])
        i += 1
    return out


def discriminator_to_torch(variables: dict) -> dict:
    """Our DiscriminatorVGG128 variables ({'params'[, 'batch_stats']}) ->
    torch Discriminator_VGG_128 state_dict (conv{b}_{i} / bn{b}_{i} /
    linear1 / linear2). Inverse of :func:`load_discriminator_from_torch`,
    including the NHWC->NCHW flatten permutation on linear1."""
    params = variables.get("params", variables)
    stats = variables.get("batch_stats") or {}
    out: dict = {}
    names = [f"{b}_{i}" for b in range(5) for i in (0, 1)]
    for name in names:
        conv = params[f"conv{name}"]
        out[f"conv{name}.weight"] = _j2t_conv(conv["kernel"])
        if "bias" in conv:
            out[f"conv{name}.bias"] = np.asarray(conv["bias"], dtype=np.float32)
        if f"bn{name}" in params:
            bn = params[f"bn{name}"]
            out[f"bn{name}.weight"] = np.asarray(bn["scale"], dtype=np.float32)
            out[f"bn{name}.bias"] = np.asarray(bn["bias"], dtype=np.float32)
            st = stats.get(f"bn{name}", {})
            out[f"bn{name}.running_mean"] = np.asarray(
                st.get("mean", np.zeros_like(bn["bias"])), dtype=np.float32
            )
            out[f"bn{name}.running_var"] = np.asarray(
                st.get("var", np.ones_like(bn["bias"])), dtype=np.float32
            )
            out[f"bn{name}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)
    # linear1: our kernel is (4*4*C H-major-flat, 100); torch flattens NCHW
    w1 = np.asarray(params["linear1"]["kernel"], dtype=np.float32).T  # (100, HWC)
    c_last = params["conv4_1"]["kernel"].shape[-1]
    w1 = w1.reshape(-1, 4, 4, c_last).transpose(0, 3, 1, 2).reshape(w1.shape[0], -1)
    out["linear1.weight"] = w1
    out["linear1.bias"] = np.asarray(params["linear1"]["bias"], dtype=np.float32)
    out["linear2.weight"] = np.asarray(params["linear2"]["kernel"], dtype=np.float32).T
    out["linear2.bias"] = np.asarray(params["linear2"]["bias"], dtype=np.float32)
    return out


def load_vgg19_from_torch(state_dict: dict, feature_layer: int = 34) -> dict:
    """torchvision vgg19 state_dict ('features.N.weight') -> flax params."""
    conv_indices = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
    names = [
        f"conv{s + 1}_{l + 1}"
        for s, n in enumerate((2, 2, 4, 4, 4))
        for l in range(n)
    ]
    params = {}
    for idx, name in zip(conv_indices, names):
        if idx > feature_layer:
            break
        params[name] = {
            "kernel": jnp.asarray(_t2j_conv(state_dict[f"features.{idx}.weight"])),
            "bias": jnp.asarray(
                np.asarray(state_dict[f"features.{idx}.bias"], dtype=np.float32)
            ),
        }
    return {"params": params}
