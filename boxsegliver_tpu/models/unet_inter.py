"""UNetInter: UNet with the interactive guide concatenated to the input
(or to the first-stage output with --mid_cat) (reference NetworksV2/UNetInter.py:31-240).

Encoder convs use norm with full affine (center=scale=True,
UNetInter.py:99-112); decoder/final identical to the UNet family.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from boxsegliver_tpu.models.layers import (ConvNormAct, UpConv,
                                           get_kernel_init, image_gradients,
                                           max_pool2x2)
from boxsegliver_tpu.models.packed import (PackedConvNormAct, PackedPointwise,
                                           PackedUpConv, pack_w, packed_concat,
                                           packed_max_pool, unpack_w)


class UNetInter(nn.Module):
    num_classes: int = 2
    init_channels: int = 64
    num_down_samples: int = 4
    normalizer: str = "instance_norm"
    without_norm: bool = False
    mid_cat: bool = False
    img_grad: bool = False
    weight_init: str = "xavier"
    dtype: Optional[Any] = None
    # width-packed full-res stage (models/packed.py; see UNet.lane_pack).
    # Not applied with --mid_cat (the post-stage guide concat would need a
    # group-aware pool for marginal benefit).
    lane_pack: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        images = inputs["images"]
        sp_guide = inputs["sp_guide"]
        if self.img_grad:
            dy, dx = image_gradients(images)
            images = jnp.concatenate([images, dy, dx], axis=-1)
        if not self.mid_cat:
            x = jnp.concatenate([images, sp_guide], axis=-1)
        else:
            x = images
        if self.dtype is not None:
            x = x.astype(self.dtype)

        pack = self.lane_pack and not self.mid_cat and x.shape[2] % 2 == 0
        norm = None if self.without_norm else self.normalizer
        skips = []
        for i in range(self.num_down_samples + 1):
            ch = self.init_channels * 2 ** i
            if pack and i == 0:
                x = pack_w(x)
                for j in range(2):
                    x = PackedConvNormAct(
                        ch, normalizer=norm, weight_init=self.weight_init,
                        dtype=self.dtype,
                        name=f"Encode1_conv{j + 1}")(x, train=train)
                skips.append(x)
                x = packed_max_pool(x)
                continue
            for j in range(2):
                x = ConvNormAct(ch, normalizer=norm, weight_init=self.weight_init,
                                dtype=self.dtype,
                                name=f"Encode{i + 1}_conv{j + 1}")(x, train=train)
            skips.append(x)
            if self.mid_cat and i == 0:
                x = jnp.concatenate(
                    [x, sp_guide.astype(x.dtype)], axis=-1)
            if i < self.num_down_samples:
                x = max_pool2x2(x, padding="SAME")

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
                x = ConvNormAct(ch, normalizer=norm, weight_init=self.weight_init,
                                dtype=self.dtype,
                                name=f"up_conv{i + 1}_{j + 1}")(x, train=train)

        logits = nn.Conv(self.num_classes, (1, 1), padding="SAME",
                         kernel_init=get_kernel_init(self.weight_init),
                         dtype=self.dtype, name="AdjustChannels")(x)
        return logits.astype(jnp.float32)
