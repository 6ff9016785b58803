"""Shared scaffolding for trunk-parallel RRDBNet wrappers.

Both pipeline parallelism (``parallel/pipeline.py``) and tensor parallelism
(``parallel/tensor.py``) replace ONLY the nb-block trunk — ~90% of the
network's FLOPs — with a mesh-sharded implementation, while the cheap
pre/post stages (conv_first, trunk_conv, upsampling, HR convs) run
replicated. This module holds that common outer shell so the two wrappers
stay drop-in equivalents of ``RRDBNet.apply`` (SURVEY.md §2.7) with a
pluggable trunk.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["check_trunk_parallel_model", "make_outer_apply"]


def check_trunk_parallel_model(model, what: str) -> None:
    """Common restrictions of the trunk-parallel wrappers: the nn.scan param
    layout (stacked ``rrdb_scan/block``) and ``fold == 1`` (the batch->channel
    MXU folding is a single-device lane trick; it composes with DP, not with
    a sharded trunk)."""
    if getattr(model, "fold", 1) != 1:
        raise ValueError(f"{what} requires fold=1")
    if not getattr(model, "scan_blocks", False):
        raise ValueError(
            f"{what} requires an RRDB generator with the scan_blocks param "
            "layout (stacked rrdb_scan/block)"
        )


def make_outer_apply(model, trunk_fn):
    """Build ``apply(variables, lr, z=None) -> sr`` running ``model``'s
    (RRDBNet, scan layout, fold=1) forward with the nb-block trunk delegated
    to ``trunk_fn(rrdb_scan_params, carry) -> carry``.

    ``carry`` is the trunk feature map ``(B, H, W, nf)``, or the pytree
    ``(trunk, z)`` when ``latent_input='all_layers'`` (the per-block Z
    re-injection rides the carry exactly like the sequential scan body,
    architecture.py::_RRDBScanBodyZ). Everything outside the trunk is the
    same math as ``model.apply``.
    """
    from esr_tpu.models.architecture import _up_factors
    from esr_tpu.models.blocks import ConvLRelu, FusedUpsampleConvLRelu, upsample_nearest

    all_layers = model.latent_input == "all_layers" and model.num_latent_channels

    def sub(**kw):
        return ConvLRelu(dtype=model.dtype, **kw)

    def apply(variables, lr, z=None):
        params = variables["params"] if "params" in variables else variables
        if model.num_latent_channels:
            if z is None:
                z = jnp.zeros(
                    lr.shape[:-1] + (model.num_latent_channels,), dtype=lr.dtype
                )
            x = jnp.concatenate([lr, z], axis=-1)
        else:
            x = lr
        x = x.astype(model.dtype)
        fea = sub(features=model.nf, act=False).apply(
            {"params": params["conv_first"]}, x
        )
        if all_layers:
            trunk, _ = trunk_fn(params["rrdb_scan"], (fea, z.astype(model.dtype)))
        else:
            trunk = trunk_fn(params["rrdb_scan"], fea)
        trunk = sub(features=model.nf, act=False, init_scale=0.1).apply(
            {"params": params["trunk_conv"]}, trunk
        )
        fea = fea + trunk
        for i, r in enumerate(_up_factors(model.scale)):
            p = {"params": params[f"upconv{i + 1}"]}
            if model.fused_upsample and r == 2:
                fea = FusedUpsampleConvLRelu(model.nf, dtype=model.dtype).apply(p, fea)
            else:
                fea = upsample_nearest(fea, r)
                fea = sub(features=model.nf, act=True).apply(p, fea)
        fea = sub(features=model.nf, act=True).apply({"params": params["HRconv"]}, fea)
        out = sub(features=model.out_nc, act=False).apply(
            {"params": params["conv_last"]}, fea
        )
        return out.astype(jnp.float32)

    return apply
