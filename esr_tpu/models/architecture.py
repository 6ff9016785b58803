"""Network architectures (SURVEY.md §2.7).

Behavioral spec from the reference's ``codes/models/modules/architecture.py``:

- ``RRDBNet``: conv_first -> nb(=23) RRDB blocks -> trunk conv (+residual) ->
  two nearest-2x-upsample+conv stages (=4x) -> HR conv -> last conv. The
  explorable fork feeds ``num_latent_channels`` extra Z-map channels; the
  injection point is configurable here (``latent_input='first_layer'`` concat
  at the input — the surveyed default — or ``'all_layers'`` re-injecting Z at
  every RRDB).
- ``DiscriminatorVGG128``: VGG-style 10-conv strided stack for 128x128 crops,
  BN (first conv bare), LeakyReLU(0.2), 2 FC heads -> logit.
- ``VGG19FeatureExtractor``: VGG19 truncated at conv5_4 **pre-activation**,
  ImageNet-normalized, frozen — the ESRGAN perceptual-loss feature space.

All NHWC, bf16-capable compute with f32 params (TPU-native)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from esr_tpu.models.blocks import (
    RRDB,
    ConvLRelu,
    Dtype,
    FusedUpsampleConvLRelu,
    fold_batch,
    fold_concat,
    kaiming_scaled,
    lrelu,
    unfold_batch,
    upsample_nearest,
)

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


def _up_factors(scale: int) -> tuple[int, ...]:
    """Per-stage upsample factors for an integer model scale (reference
    lineage supports x2/x3/x4; x8 and x1 kept for completeness)."""
    table = {1: (), 2: (2,), 3: (3,), 4: (2, 2), 8: (2, 2, 2)}
    if scale not in table:
        raise ValueError(f"unsupported scale {scale}; supported: {sorted(table)}")
    return table[scale]


class _RRDBScanBody(nn.Module):
    """Carry-style RRDB for nn.scan (carry = trunk activations)."""

    nf: int
    gc: int
    dtype: Dtype = jnp.float32
    packed: bool = True
    fold: int = 1

    @nn.compact
    def __call__(self, carry, _):
        return (
            RRDB(self.nf, self.gc, self.dtype, self.packed, self.fold, name="block")(
                carry
            ),
            None,
        )


class _RRDBScanBodyZ(nn.Module):
    """Carry-style RRDB with per-block Z re-injection for nn.scan
    (``latent_input='all_layers'``). Carry = (trunk, z): the Z map rides the
    carry unchanged so the scanned body sees it every block without a scanned
    input axis; each block owns an independent 1x1 latent projection
    (stacked under ``rrdb_scan/latent_proj`` with a leading (nb,) axis)."""

    nf: int
    gc: int
    dtype: Dtype = jnp.float32
    packed: bool = True
    fold: int = 1

    @nn.compact
    def __call__(self, carry, _):
        trunk, z = carry
        t = fold_concat(trunk, z, self.fold)
        t = ConvLRelu(
            self.nf, kernel=1, act=False, dtype=self.dtype, fold=self.fold,
            name="latent_proj",
        )(t)
        t = RRDB(self.nf, self.gc, self.dtype, self.packed, self.fold, name="block")(t)
        return (t, z), None


class RRDBNet(nn.Module):
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    scale: int = 4
    num_latent_channels: int = 0
    latent_input: str = "first_layer"  # 'first_layer' | 'all_layers' | 'none'
    fused_upsample: bool = True  # 4-parity rewrite of upsample+conv (exact)
    scan_blocks: bool = True  # lax.scan over the nb identical RRDBs: compiles
    # one block body instead of nb (~20x faster XLA compiles); params carry a
    # leading (nb,) axis under 'rrdb_scan'. With latent_input='all_layers' the
    # scanned body re-injects Z per block (carry = (trunk, z))
    remat: bool = False  # rematerialize each RRDB in the backward pass
    packed: bool = True  # per-source packed RDB convs (1.45x on v5e; exact
    # same params, accumulation-order-only output difference — blocks.py)
    fold: int = 1  # batch->channel fold: process `fold` images per row with
    # block-diagonal kernels so every conv runs at >=128 MXU lanes (~1.1x on
    # the v5e trunk at fold=2). Apply-time only: params/checkpoints unchanged;
    # non-divisible (static) batches run unfolded; requires packed=True.
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, lr, z=None):
        """lr: (N,H,W,in_nc) in [0,1]; z: (N,H,W,num_latent_channels) or None."""
        f = self.fold
        if f > 1 and not self.packed:
            raise ValueError("fold>1 requires packed=True")
        # graceful degrade: batch is static under jit, so a non-divisible
        # batch (B=1 eval, init traces) just runs unfolded — same params
        if lr.shape[0] % f:
            f = 1
        if self.num_latent_channels:
            if z is None:
                z = jnp.zeros(
                    lr.shape[:-1] + (self.num_latent_channels,), dtype=lr.dtype
                )
            x = jnp.concatenate([lr, z], axis=-1)
        else:
            x = lr
        x = x.astype(self.dtype)
        if f > 1:
            x = fold_batch(x, f)
        fea = ConvLRelu(self.nf, act=False, dtype=self.dtype, fold=f, name="conv_first")(x)
        trunk = fea
        all_layers = self.latent_input == "all_layers" and self.num_latent_channels
        if all_layers:
            zc = z.astype(self.dtype)
            if f > 1:
                zc = fold_batch(zc, f)
        if self.scan_blocks:
            body = _RRDBScanBodyZ if all_layers else _RRDBScanBody
            if self.remat:
                body = nn.remat(body, prevent_cse=False)
            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.nb,
            )(self.nf, self.gc, self.dtype, self.packed, f, name="rrdb_scan")
            if all_layers:
                (trunk, _), _ = scanned((trunk, zc), None)
            else:
                trunk, _ = scanned(trunk, None)
        else:
            for i in range(self.nb):
                if all_layers:
                    trunk = fold_concat(trunk, zc, f)
                    trunk = ConvLRelu(
                        self.nf, kernel=1, act=False, dtype=self.dtype, fold=f,
                        name=f"latent_proj{i}",
                    )(trunk)
                block = RRDB(self.nf, self.gc, self.dtype, self.packed, f, name=f"rrdb{i}")
                trunk = block(trunk)
        trunk = ConvLRelu(self.nf, act=False, init_scale=0.1, dtype=self.dtype, fold=f, name="trunk_conv")(trunk)
        fea = fea + trunk
        for i, r in enumerate(_up_factors(self.scale)):
            if self.fused_upsample and r == 2:
                fea = FusedUpsampleConvLRelu(
                    self.nf, dtype=self.dtype, fold=f, name=f"upconv{i + 1}"
                )(fea)
            else:  # odd factors (x3) take the materialized-upsample path
                fea = upsample_nearest(fea, r)
                fea = ConvLRelu(self.nf, act=True, dtype=self.dtype, fold=f, name=f"upconv{i + 1}")(fea)
        fea = ConvLRelu(self.nf, act=True, dtype=self.dtype, fold=f, name="HRconv")(fea)
        out = ConvLRelu(self.out_nc, act=False, dtype=self.dtype, fold=f, name="conv_last")(fea)
        if f > 1:
            out = unfold_batch(out, f)
        return out.astype(jnp.float32)


def pixel_shuffle(x: jax.Array, factor: int) -> jax.Array:
    """Depth-to-space (torch PixelShuffle semantics: channel-major subpixels),
    NHWC."""
    n, h, w, c = x.shape
    r = factor
    x = x.reshape(n, h, w, c // (r * r), r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r, w, r, c'
    return x.reshape(n, h * r, w * r, c // (r * r))


class ResidualBlockNoBN(nn.Module):
    """SRResNet-style residual block (conv-relu-conv + identity, no BN —
    the BasicSR 'MSRResNet' variant)."""

    nf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvLRelu(self.nf, act=False, init_scale=0.1, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(y)
        y = ConvLRelu(self.nf, act=False, init_scale=0.1, dtype=self.dtype, name="conv2")(y)
        return x + y


class SRResNet(nn.Module):
    """SRResNet / MSRResNet generator (the reference factory's second
    ``which_model_G`` family, ``sr_resnet``): conv_first -> nb residual
    blocks -> trunk conv (+residual) -> pixel-shuffle upsampling -> HR convs.
    Supports the same Z-map latent input as RRDBNet."""

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 16
    scale: int = 4
    num_latent_channels: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, lr, z=None):
        if self.num_latent_channels:
            if z is None:
                z = jnp.zeros(lr.shape[:-1] + (self.num_latent_channels,), dtype=lr.dtype)
            x = jnp.concatenate([lr, z], axis=-1)
        else:
            x = lr
        x = x.astype(self.dtype)
        fea = lrelu(ConvLRelu(self.nf, act=False, dtype=self.dtype, name="conv_first")(x))
        trunk = fea
        for i in range(self.nb):
            trunk = ResidualBlockNoBN(self.nf, self.dtype, name=f"block{i}")(trunk)
        trunk = ConvLRelu(self.nf, act=False, init_scale=0.1, dtype=self.dtype, name="trunk_conv")(trunk)
        fea = fea + trunk
        for i, r in enumerate(_up_factors(self.scale)):
            fea = ConvLRelu(self.nf * r * r, act=False, dtype=self.dtype, name=f"upconv{i + 1}")(fea)
            fea = lrelu(pixel_shuffle(fea, r))
        fea = ConvLRelu(self.nf, act=True, dtype=self.dtype, name="HRconv")(fea)
        out = ConvLRelu(self.out_nc, act=False, dtype=self.dtype, name="conv_last")(fea)
        return out.astype(jnp.float32)


class DiscriminatorVGG128(nn.Module):
    in_nc: int = 3
    nf: int = 64
    norm: str = "batch"  # 'batch' | 'none'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: (N,128,128,in_nc) -> (N,1) logits."""

        def block(x, feats, kernel, stride, use_norm, name):
            x = nn.Conv(
                feats,
                (kernel, kernel),
                strides=(stride, stride),
                padding=((kernel - 1) // 2, (kernel - 1) // 2),
                use_bias=not use_norm,
                kernel_init=kaiming_scaled(1.0),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"conv{name}",
            )(x)
            if use_norm:
                # momentum 0.9 == torch BatchNorm2d momentum 0.1 (reference);
                # flax's 0.99 default adapts running stats 10x slower
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"bn{name}",
                )(x)
            return lrelu(x)

        x = x.astype(self.dtype)
        bn = self.norm == "batch"
        x = block(x, self.nf, 3, 1, False, "0_0")  # 128
        x = block(x, self.nf, 4, 2, bn, "0_1")  # 64
        x = block(x, self.nf * 2, 3, 1, bn, "1_0")
        x = block(x, self.nf * 2, 4, 2, bn, "1_1")  # 32
        x = block(x, self.nf * 4, 3, 1, bn, "2_0")
        x = block(x, self.nf * 4, 4, 2, bn, "2_1")  # 16
        x = block(x, self.nf * 8, 3, 1, bn, "3_0")
        x = block(x, self.nf * 8, 4, 2, bn, "3_1")  # 8
        x = block(x, self.nf * 8, 3, 1, bn, "4_0")
        x = block(x, self.nf * 8, 4, 2, bn, "4_1")  # 4
        x = x.reshape(x.shape[0], -1)
        x = lrelu(nn.Dense(100, dtype=self.dtype, param_dtype=jnp.float32, name="linear1")(x))
        x = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32, name="linear2")(x)
        return x.astype(jnp.float32)


# VGG19 conv plan: (features, layers-per-stage); pools between stages.
_VGG19_CFG = ((64, 2), (128, 2), (256, 4), (512, 4), (512, 4))


class VGG19FeatureExtractor(nn.Module):
    """VGG19 features up to conv5_4 pre-activation (ESRGAN perceptual space).

    Weights are a pluggable asset (ImageNet weights are not downloadable in
    this environment — see ``esr_tpu.models.networks.load_vgg19_from_torch``
    for the converter); architecture + normalization are exact.
    """

    feature_layer: int = 34  # torch features index of conv5_4 (pre-act)
    use_input_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (N,H,W,3) RGB in [0,1] -> (N,h,w,512) conv5_4 pre-activation."""
        if self.use_input_norm:
            x = (x - IMAGENET_MEAN.astype(x.dtype)) / IMAGENET_STD.astype(x.dtype)
        x = x.astype(self.dtype)
        torch_idx = 0  # mirrors torchvision vgg19.features indexing
        for stage, (feats, n_layers) in enumerate(_VGG19_CFG):
            for layer in range(n_layers):
                x = nn.Conv(
                    feats,
                    (3, 3),
                    padding="SAME",
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"conv{stage + 1}_{layer + 1}",
                )(x)
                if torch_idx == self.feature_layer:
                    return x.astype(jnp.float32)
                torch_idx += 1
                x = nn.relu(x)
                torch_idx += 1
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            torch_idx += 1
        return x.astype(jnp.float32)
