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
        skips = {}
        for block, layers in _CONFIG3.items():
            for k, spec in enumerate(layers):
                if spec[0] == "up":
                    enc_key = block.replace("d", "e")
                    x = UpConv(round(spec[1] * c), use_bias=False,
                               weight_init=self.weight_init, dtype=self.dtype,
                               name=f"{block}_up")(x)
                    x = jnp.concatenate([skips[enc_key], x], axis=-1)
                else:
                    out, stride, dil = spec
                    x = ConvNormAct(round(out * c), strides=(stride, stride),
                                    dilation=dil, normalizer=norm,
                                    weight_init=self.weight_init, dtype=self.dtype,
                                    name=f"{block}_conv{k + 1}")(x, train=train)
            if block.startswith("conv_e") or block == "bridge":
                skips[block] = x
            if block == "conv_d3":
                # conv_d3 has no up: concat happens implicitly via bridge skip
                pass
        logits = nn.Conv(self.num_classes, (1, 1), padding="SAME",
                         kernel_init=get_kernel_init(self.weight_init),
                         dtype=self.dtype, name="logits")(x)
        return logits.astype(jnp.float32)
