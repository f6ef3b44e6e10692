"""G-Net (GUNet): guided UNet with density (histogram-context) and spatial
(Gaussian-prior) modulation (reference NetworksV2/GUNet.py:31-488).

Architecture:
- context subnet: MLP [*context_fc_channels, n_modulator_param] over a
  histogram vector (GUNet.py:31-80), or a 1-D VGG variant; emits per-channel
  modulation gammas consumed by encoder blocks (conditional normalization,
  GUNet.py:119-133), or SE-attention features when use_se.
- spatial subnet: per-scale 1x1 convs over an avg-pooled guide pyramid
  (GUNet.py:136-159); emits additive per-pixel params.
- encoder: modulated_conv_block (GUNet.py:162-217): conv3x3 (norm without
  affine at modulated layers — the guides ARE the affine) → dropout →
  density-mod (x * gamma) → spatial-mod (x + params) → optional channel
  affine → ReLU.
- decoder: standard UNet decoder; final 1x1 conv.

n_modulator_param = init_channels * sum(2^i for i in mod_layers) * 2
(two convs per block, GUNet.py:44-48).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from boxsegliver_tpu.models.layers import (MLP, VGG1D, ChannelAffine,
                                           ConvNormAct, Norm, PatchCNN, UpConv,
                                           get_kernel_init, he_normal,
                                           image_gradients, max_pool2x2)
from boxsegliver_tpu.models.packed import (PackedChannelAffine, PackedConv,
                                           PackedConvNormAct, PackedNorm,
                                           PackedPointwise, PackedUpConv,
                                           pack_w, packed_concat,
                                           packed_max_pool, tile_channel,
                                           unpack_w)


class GUNet(nn.Module):
    num_classes: int = 3
    init_channels: int = 64
    num_down_samples: int = 4
    mod_layers: Tuple[int, ...] = (1, 2, 3, 4)
    context_fc_channels: Tuple[int, ...] = (256,)
    context_model: str = "fc"
    context_conv_init_channels: int = 16
    norm_with_center: bool = False
    norm_with_scale: bool = False
    after_affine: bool = False
    use_context: bool = False
    use_spatial: bool = False
    use_se: bool = False
    guide_channel: int = 1
    side_dropout: float = 0.0
    dropout: float = 0.0
    normalizer: str = "instance_norm"
    without_norm: bool = False
    fix: bool = False
    img_grad: bool = False
    weight_init: str = "xavier"
    dtype: Optional[Any] = None
    # width-packed full-res stage (models/packed.py; see UNet.lane_pack) —
    # same params/numerics, 128-wide lanes on TPU
    lane_pack: bool = False

    def _n_modulator_param(self):
        n_mod = sum(1 for i in range(self.num_down_samples + 1)
                    if i in self.mod_layers)
        if self.use_se:
            return self.context_fc_channels[-1] * n_mod * 2
        return self.init_channels * sum(
            2 ** i for i in range(self.num_down_samples + 1)
            if i in self.mod_layers) * 2

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        images = inputs["images"]

        # ---- context (density) subnet -----------------------------------
        context_params = None
        if self.use_context:
            context = inputs["context"].astype(self.dtype or jnp.float32)
            n_mod_param = self._n_modulator_param()
            channels = list(self.context_fc_channels) + [n_mod_param]
            if self.context_model == "fc":
                context_params = MLP(
                    channels, use_dropout=self.side_dropout > 0,
                    keep_prob=1.0 - self.side_dropout,
                    final_kernel_init=he_normal(), dtype=self.dtype,
                    name="context")(context, train=train)
            elif self.context_model in ("vgg16B", "vgg16C", "vgg16D"):
                context_params = VGG1D(
                    self.context_model, self.context_conv_init_channels,
                    channels, use_dropout=self.side_dropout > 0,
                    keep_prob=1.0 - self.side_dropout, dtype=self.dtype,
                    name="context")(context[..., None], train=train)
            elif self.context_model == "conv":
                # nf2/iin image-patch pyramid context [bs, 32, 32, n_scales]
                # (reference input_pipeline_iin.py ct_coord/crop_and_resize;
                # the reference never shipped a rank-4 context model — this
                # is the working consumer, see layers.PatchCNN)
                context_params = PatchCNN(
                    self.context_conv_init_channels, channels,
                    use_dropout=self.side_dropout > 0,
                    keep_prob=1.0 - self.side_dropout, dtype=self.dtype,
                    name="context")(context, train=train)
            else:
                raise ValueError("Not supported context model")

        # ---- spatial subnet ---------------------------------------------
        spatial_params = [None] * (self.num_down_samples + 1)
        if self.use_spatial:
            gs = inputs["sp_guide"].astype(self.dtype or jnp.float32)
            for i in range(self.num_down_samples + 1):
                if i in self.mod_layers:
                    if self.fix:
                        spatial_params[i] = ConvNormAct(
                            self.init_channels * 2 ** (i + 1), kernel=(1, 1),
                            normalizer=None if self.without_norm else self.normalizer,
                            act=nn.relu, weight_init=self.weight_init,
                            dtype=self.dtype,
                            name=f"spatial_conv{i + 1}")(gs, train=train)
                    else:
                        spatial_params[i] = nn.Conv(
                            self.init_channels * 2 ** (i + 1), (1, 1),
                            padding="SAME",
                            kernel_init=get_kernel_init(self.weight_init),
                            dtype=self.dtype,
                            name=f"spatial_conv{i + 1}")(gs)
                if i < self.num_down_samples:
                    gs = nn.avg_pool(gs, (2, 2), strides=(2, 2), padding="SAME")

        # ---- encoder ------------------------------------------------------
        if self.img_grad:
            dy, dx = image_gradients(images)
            x = jnp.concatenate([images, dy, dx], axis=-1)
        else:
            x = images
        if self.dtype is not None:
            x = x.astype(self.dtype)

        pack = self.lane_pack and x.shape[2] % 2 == 0
        density_mod_id = 0
        skips = []
        for i in range(self.num_down_samples + 1):
            ch = self.init_channels * 2 ** i
            modulated = i in self.mod_layers
            density_mod = self.use_context and modulated
            spatial_mod = self.use_spatial and modulated
            packed_here = pack and i == 0
            if packed_here:
                x = pack_w(x)
            for j in range(2):
                name = f"Encode{i + 1}_conv{j + 1}"
                if packed_here:
                    # packed twins register params under the same names
                    if self.without_norm:
                        x = PackedConv(ch, use_bias=True,
                                       weight_init=self.weight_init,
                                       dtype=self.dtype, name=name)(x)
                    else:
                        nb = (True if not (density_mod or spatial_mod)
                              else self.norm_with_center and not self.after_affine)
                        ns = (True if not (density_mod or spatial_mod)
                              else self.norm_with_scale and not self.after_affine)
                        x = PackedConv(ch, use_bias=False,
                                       weight_init=self.weight_init,
                                       dtype=self.dtype, name=name)(x)
                        x = PackedNorm(self.normalizer, use_bias=nb,
                                       use_scale=ns, dtype=self.dtype,
                                       name=name + "_norm")(x, train=train)
                elif self.without_norm:
                    x = nn.Conv(ch, (3, 3), padding="SAME",
                                kernel_init=get_kernel_init(self.weight_init),
                                dtype=self.dtype, name=name)(x)
                elif density_mod or spatial_mod:
                    # encoder arg_scope: norm affine controlled by flags
                    # (GUNet.py:313-330) — modulation provides the affine
                    x = nn.Conv(ch, (3, 3), padding="SAME", use_bias=False,
                                kernel_init=get_kernel_init(self.weight_init),
                                dtype=self.dtype, name=name)(x)
                    x = Norm(self.normalizer,
                             use_bias=self.norm_with_center and not self.after_affine,
                             use_scale=self.norm_with_scale and not self.after_affine,
                             dtype=self.dtype,
                             name=name + "_norm")(x, train=train)
                else:
                    # unmodulated block: norm with full affine (GUNet.py:183-188)
                    x = nn.Conv(ch, (3, 3), padding="SAME", use_bias=False,
                                kernel_init=get_kernel_init(self.weight_init),
                                dtype=self.dtype, name=name)(x)
                    x = Norm(self.normalizer, use_bias=True, use_scale=True,
                             dtype=self.dtype,
                             name=name + "_norm")(x, train=train)
                if j == 0 and self.dropout:
                    x = nn.Dropout(rate=self.dropout,
                                   deterministic=not train)(x)
                if density_mod:
                    if self.use_se:
                        cfl = self.context_fc_channels[-1]
                        feat = jnp.asarray(context_params)[
                            :, density_mod_id:density_mod_id + cfl]
                        pooled = jnp.mean(x, axis=(1, 2))
                        if packed_here:  # phase-pair mean -> per-channel
                            pooled = 0.5 * (pooled[:, :ch] + pooled[:, ch:])
                        se = jnp.concatenate([pooled, feat], axis=-1)
                        se = nn.relu(nn.Dense((ch + cfl) // 4, dtype=self.dtype,
                                              name=f"{name}_se1")(se))
                        gamma = nn.sigmoid(nn.Dense(ch, dtype=self.dtype,
                                                    name=f"{name}_se2")(se))
                        if packed_here:
                            gamma = tile_channel(gamma)
                        x = x * gamma[:, None, None, :]
                        density_mod_id += cfl
                    else:
                        gamma = context_params[:, density_mod_id:density_mod_id + ch]
                        if packed_here:
                            gamma = tile_channel(gamma)
                        x = x * gamma[:, None, None, :]
                        density_mod_id += ch
                if spatial_mod:
                    sp = spatial_params[i][..., ch * j:ch * (j + 1)]
                    if packed_here:
                        sp = pack_w(sp)
                    x = x + sp
                if self.after_affine:
                    if packed_here:
                        x = PackedChannelAffine(name=f"{name}_affine")(x)
                    else:
                        x = ChannelAffine(name=f"{name}_affine")(x)
                x = nn.relu(x)
            skips.append(x)
            if i < self.num_down_samples:
                if packed_here:
                    x = packed_max_pool(x)
                else:
                    x = max_pool2x2(x, padding="SAME")

        # ---- decoder ------------------------------------------------------
        norm = None if self.without_norm else self.normalizer
        for i in reversed(range(self.num_down_samples)):
            ch = self.init_channels * 2 ** i
            if pack and i == 0:
                up = PackedUpConv(x.shape[-1] // 2,
                                  weight_init=self.weight_init,
                                  dtype=self.dtype, name="up1")(x)
                skip_c, up_c = skips[0].shape[-1] // 2, up.shape[-1] // 2
                x = packed_concat(skips[0], up)
                for j in range(2):
                    x = PackedConvNormAct(
                        ch, normalizer=norm, weight_init=self.weight_init,
                        dtype=self.dtype,
                        in_groups=(skip_c, up_c) if j == 0 else None,
                        name=f"up_conv1_{j + 1}")(x, train=train)
                x = PackedPointwise(self.num_classes,
                                    weight_init=self.weight_init,
                                    dtype=self.dtype, name="AdjustChannels")(x)
                return unpack_w(x).astype(jnp.float32)
            x = UpConv(x.shape[-1] // 2, weight_init=self.weight_init,
                       dtype=self.dtype, name=f"up{i + 1}")(x)
            x = jnp.concatenate([skips[i], x], axis=-1)
            for j in range(2):
                x = ConvNormAct(ch, normalizer=norm,
                                weight_init=self.weight_init, dtype=self.dtype,
                                name=f"up_conv{i + 1}_{j + 1}")(x, train=train)

        logits = nn.Conv(self.num_classes, (1, 1), padding="SAME",
                         kernel_init=get_kernel_init(self.weight_init),
                         dtype=self.dtype, name="AdjustChannels")(x)
        return logits.astype(jnp.float32)
