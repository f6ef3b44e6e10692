"""Classic 2D UNet (reference NetworksV2/UNet.py:29-177).

Encoder: num_down_samples stages of [conv3x3+norm+relu]x2 + maxpool2x2,
channels double each stage from init_channels. Bridge: 2 convs. Decoder:
transpose-conv (ReLU, no norm) + skip concat + 2 convs. Final 1x1 conv to
num_classes with no norm/act. Optional image-gradient input concat
(UNet.py:69-73).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from boxsegliver_tpu.models.layers import (ConvNormAct, UpConv, get_kernel_init,
                                           image_gradients, max_pool2x2)
from boxsegliver_tpu.models.packed import (PackedConvNormAct, PackedPointwise,
                                           PackedUpConv, pack_w, packed_concat,
                                           packed_max_pool, unpack_w)


class UNet(nn.Module):
    num_classes: int = 2
    init_channels: int = 64
    num_down_samples: int = 4
    normalizer: str = "batch_norm"
    without_norm: bool = False
    img_grad: bool = False
    weight_init: str = "xavier"
    dtype: Optional[Any] = None
    # lane_pack: run the full-resolution stage in the width-packed layout
    # (models/packed.py) — exact same math, 128-wide lanes instead of 64.
    # Parameter tree is IDENTICAL to the unpacked model, so checkpoints are
    # interchangeable.  Routed on by default on TPU (models.build_model).
    lane_pack: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        images = inputs["images"] if isinstance(inputs, dict) else inputs
        if self.img_grad:
            dy, dx = image_gradients(images)
            x = jnp.concatenate([images, dy, dx], axis=-1)
        else:
            x = images
        if self.dtype is not None:
            x = x.astype(self.dtype)

        norm = None if self.without_norm else self.normalizer
        pack = (self.lane_pack and self.num_down_samples >= 1
                and x.shape[2] % 2 == 0)
        ch = self.init_channels
        skips = []
        for i in range(self.num_down_samples):
            if pack and i == 0:
                xp = pack_w(x)
                for j in range(2):
                    xp = PackedConvNormAct(
                        ch, normalizer=norm, weight_init=self.weight_init,
                        dtype=self.dtype,
                        name=f"Encode1_conv{j + 1}")(xp, train=train)
                skips.append(xp)  # packed skip
                x = packed_max_pool(xp)
            else:
                for j in range(2):
                    x = ConvNormAct(ch, normalizer=norm,
                                    weight_init=self.weight_init,
                                    dtype=self.dtype,
                                    name=f"Encode{i + 1}_conv{j + 1}")(
                                        x, train=train)
                skips.append(x)
                x = max_pool2x2(x)
            ch *= 2

        for j in range(2):
            x = ConvNormAct(ch, normalizer=norm, weight_init=self.weight_init,
                            dtype=self.dtype,
                            name=f"Bridge_conv{j + 1}")(x, train=train)

        for i in reversed(range(self.num_down_samples)):
            ch //= 2
            if pack and i == 0:
                up = PackedUpConv(x.shape[-1] // 2,
                                  weight_init=self.weight_init,
                                  dtype=self.dtype, name="Decode1_up")(x)
                skip_c, up_c = skips[0].shape[-1] // 2, up.shape[-1] // 2
                x = packed_concat(skips[0], up)
                for j in range(2):
                    x = PackedConvNormAct(
                        ch, normalizer=norm, weight_init=self.weight_init,
                        dtype=self.dtype,
                        in_groups=(skip_c, up_c) if j == 0 else None,
                        name=f"Decode1_conv{j + 1}")(x, train=train)
                x = PackedPointwise(self.num_classes,
                                    weight_init=self.weight_init,
                                    dtype=self.dtype, name="AdjustChannels")(x)
                return unpack_w(x).astype(jnp.float32)
            x = UpConv(x.shape[-1] // 2, weight_init=self.weight_init,
                       dtype=self.dtype, name=f"Decode{i + 1}_up")(x)
            x = jnp.concatenate([skips[i], x], axis=-1)
            for j in range(2):
                x = ConvNormAct(ch, normalizer=norm, weight_init=self.weight_init,
                                dtype=self.dtype,
                                name=f"Decode{i + 1}_conv{j + 1}")(x, train=train)

        logits = nn.Conv(self.num_classes, (1, 1), padding="SAME",
                         kernel_init=get_kernel_init(self.weight_init),
                         dtype=self.dtype, name="AdjustChannels")(x)
        return logits.astype(jnp.float32)
