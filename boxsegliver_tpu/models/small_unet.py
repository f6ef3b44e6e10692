"""SmallUNet: 3-pool dilated-bridge UNet from a kernel/stride config table
(reference NetworksV2/SmallUNet.py:28-120). Input = concat(images, sp_guide).

Downsampling is by strided conv (no pools); the bridge and the first decoder
stage run dilated (rate 2) at 1/8 resolution; up stages use bias-free
transpose convs.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from boxsegliver_tpu.models.layers import ConvNormAct, UpConv, get_kernel_init
from boxsegliver_tpu.models.packed import (PackedConvNormAct, PackedPointwise,
                                           PackedStridedConvNormAct,
                                           PackedUpConv, pack_w, packed_concat,
                                           unpack_w)

# reference SmallUNet.py:31-57 (config[3])
_CONFIG3 = {
    "conv_e0": [(64, 1, 1), (64, 1, 1)],
    "conv_e1": [(128, 2, 1), (128, 1, 1)],
    "conv_e2": [(256, 2, 1), (256, 1, 1)],
    "conv_e3": [(512, 2, 1), (512, 1, 1)],
    "bridge": [(1024, 1, 2), (1024, 1, 2)],
    "conv_d3": [(512, 1, 2), (512, 1, 1), (512, 1, 1)],
    "conv_d2": [("up", 256), (256, 1, 1), (256, 1, 1)],
    "conv_d1": [("up", 128), (128, 1, 1), (128, 1, 1)],
    "conv_d0": [("up", 64), (64, 1, 1), (64, 1, 1)],
}


class SmallUNet(nn.Module):
    num_classes: int = 2
    init_channel_factor: float = 1.0
    num_pool_layers: int = 3
    normalizer: str = "instance_norm"
    without_norm: bool = False
    weight_init: str = "xavier"
    dtype: Optional[Any] = None
    # width-packed full-res blocks (models/packed.py; see UNet.lane_pack):
    # conv_e0, the conv_e1 downsampling conv, and conv_d0 run lane-packed
    lane_pack: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        if self.num_pool_layers != 3:
            raise ValueError("SmallUNet only defines num_pool_layers=3 "
                             "(reference SmallUNet.py:31)")
        x = jnp.concatenate([inputs["images"], inputs["sp_guide"]], axis=-1)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        norm = None if self.without_norm else self.normalizer
        c = self.init_channel_factor
        pack = self.lane_pack and x.shape[2] % 2 == 0
        if pack:
            x = pack_w(x)
        skips = {}
        concat_groups = None
        for block, layers in _CONFIG3.items():
            for k, spec in enumerate(layers):
                packed_here = pack and block in ("conv_e0", "conv_d0")
                if spec[0] == "up":
                    enc_key = block.replace("d", "e")
                    if packed_here:
                        x = PackedUpConv(round(spec[1] * c), use_bias=False,
                                         weight_init=self.weight_init,
                                         dtype=self.dtype,
                                         name=f"{block}_up")(x)
                        skip = skips[enc_key]
                        concat_groups = (skip.shape[-1] // 2,
                                         x.shape[-1] // 2)
                        x = packed_concat(skip, x)
                    else:
                        x = UpConv(round(spec[1] * c), use_bias=False,
                                   weight_init=self.weight_init,
                                   dtype=self.dtype,
                                   name=f"{block}_up")(x)
                        x = jnp.concatenate([skips[enc_key], x], axis=-1)
                else:
                    out, stride, dil = spec
                    if packed_here:
                        x = PackedConvNormAct(
                            round(out * c), normalizer=norm,
                            weight_init=self.weight_init, dtype=self.dtype,
                            in_groups=concat_groups,
                            name=f"{block}_conv{k + 1}")(x, train=train)
                        concat_groups = None
                    elif pack and block == "conv_e1" and k == 0:
                        # stride-2 downsampling out of the packed stage
                        x = PackedStridedConvNormAct(
                            round(out * c), normalizer=norm,
                            weight_init=self.weight_init, dtype=self.dtype,
                            name=f"{block}_conv{k + 1}")(x, train=train)
                    else:
                        x = ConvNormAct(round(out * c),
                                        strides=(stride, stride),
                                        dilation=dil, normalizer=norm,
                                        weight_init=self.weight_init,
                                        dtype=self.dtype,
                                        name=f"{block}_conv{k + 1}")(
                                            x, train=train)
            if block.startswith("conv_e") or block == "bridge":
                skips[block] = x
        if pack:
            x = PackedPointwise(self.num_classes,
                                weight_init=self.weight_init,
                                dtype=self.dtype, name="logits")(x)
            return unpack_w(x).astype(jnp.float32)
        logits = nn.Conv(self.num_classes, (1, 1), padding="SAME",
                         kernel_init=get_kernel_init(self.weight_init),
                         dtype=self.dtype, name="logits")(x)
        return logits.astype(jnp.float32)
