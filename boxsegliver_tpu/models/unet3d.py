"""UNet3D: nnUNet-style anisotropic 3D UNet with per-block kernel/stride
tables (reference NetworksV2/UNet3D.py:28-187).

Downsampling is by strided convs; early stages use (1,3,3) kernels to avoid
mixing thick-slice z context before feature maps are coarse. Channels double
per stage, capped at max_channels. Decoder transpose-convs are bias-free; each
up stage returns to the matching encoder channel count. Optional sp_guide
concat at the input (UNet3D.py:143-144).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from boxsegliver_tpu.models.layers import ConvNormAct, UpConv, get_kernel_init

# reference UNet3D.py:31-91: per-block (kernel, stride) tables
_CFG = {
    4: {
        "conv_e0": [((1, 3, 3), (1, 1, 1)), ((1, 3, 3), (1, 1, 1))],
        "conv_e1": [((1, 3, 3), (1, 2, 2)), ((1, 3, 3), (1, 1, 1))],
        "conv_e2": [((3, 3, 3), (1, 2, 2)), ((3, 3, 3), (1, 1, 1))],
        "conv_e3": [((3, 3, 3), (1, 2, 2)), ((3, 3, 3), (1, 1, 1))],
        "bridge": [((3, 3, 3), (2, 2, 2)), ((3, 3, 3), (1, 1, 1))],
        "conv_d3": [("up", (2, 2, 2), (2, 2, 2)),
                    ((3, 3, 3), (1, 1, 1)), ((3, 3, 3), (1, 1, 1))],
        "conv_d2": [("up", (1, 2, 2), (1, 2, 2)),
                    ((3, 3, 3), (1, 1, 1)), ((3, 3, 3), (1, 1, 1))],
        "conv_d1": [("up", (1, 2, 2), (1, 2, 2)),
                    ((1, 3, 3), (1, 1, 1)), ((1, 3, 3), (1, 1, 1))],
        "conv_d0": [("up", (1, 2, 2), (1, 2, 2)),
                    ((1, 3, 3), (1, 1, 1)), ((1, 3, 3), (1, 1, 1))],
    },
    5: {
        "conv_e0": [((1, 3, 3), (1, 1, 1)), ((1, 3, 3), (1, 1, 1))],
        "conv_e1": [((1, 3, 3), (1, 2, 2)), ((1, 3, 3), (1, 1, 1))],
        "conv_e2": [((3, 3, 3), (1, 2, 2)), ((3, 3, 3), (1, 1, 1))],
        "conv_e3": [((3, 3, 3), (1, 2, 2)), ((3, 3, 3), (1, 1, 1))],
        "conv_e4": [((3, 3, 3), (1, 2, 2)), ((3, 3, 3), (1, 1, 1))],
        "bridge": [((3, 3, 3), (2, 2, 2)), ((3, 3, 3), (1, 1, 1))],
        "conv_d4": [("up", (2, 2, 2), (2, 2, 2)),
                    ((3, 3, 3), (1, 1, 1)), ((3, 3, 3), (1, 1, 1))],
        "conv_d3": [("up", (1, 2, 2), (1, 2, 2)),
                    ((3, 3, 3), (1, 1, 1)), ((3, 3, 3), (1, 1, 1))],
        "conv_d2": [("up", (1, 2, 2), (1, 2, 2)),
                    ((3, 3, 3), (1, 1, 1)), ((3, 3, 3), (1, 1, 1))],
        "conv_d1": [("up", (1, 2, 2), (1, 2, 2)),
                    ((1, 3, 3), (1, 1, 1)), ((1, 3, 3), (1, 1, 1))],
        "conv_d0": [("up", (1, 2, 2), (1, 2, 2)),
                    ((1, 3, 3), (1, 1, 1)), ((1, 3, 3), (1, 1, 1))],
    },
}


class UNet3D(nn.Module):
    num_classes: int = 2
    init_channels: int = 30
    num_pool_layers: int = 4
    max_channels: int = 320
    use_spatial: bool = False
    img_grad: bool = False
    normalizer: str = "instance_norm"
    without_norm: bool = False
    weight_init: str = "xavier"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = inputs["images"]
        if self.use_spatial:
            x = jnp.concatenate([x, inputs["sp_guide"]], axis=-1)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        norm = None if self.without_norm else self.normalizer
        cfg = _CFG[self.num_pool_layers]
        c = self.init_channels
        end_pts = {}
        for block, layers in cfg.items():
            if block.startswith("conv_e") or block == "bridge":
                for k, (kernel, stride) in enumerate(layers):
                    x = ConvNormAct(c, kernel=kernel, strides=stride,
                                    normalizer=norm, weight_init=self.weight_init,
                                    dtype=self.dtype,
                                    name=f"{block}_conv{k + 1}")(x, train=train)
                end_pts[block] = (x, c)
                c = min(c * 2, self.max_channels)
            else:  # decoder
                for k, spec in enumerate(layers):
                    if spec[0] == "up":
                        _, kernel, stride = spec
                        enc_key = block.replace("d", "e")
                        skip, c = end_pts[enc_key]
                        x = UpConv(c, kernel=kernel, strides=stride,
                                   use_bias=False, weight_init=self.weight_init,
                                   dtype=self.dtype, name=f"{block}_up")(x)
                        x = jnp.concatenate([skip, x], axis=-1)
                    else:
                        kernel, stride = spec
                        x = ConvNormAct(c, kernel=kernel, strides=stride,
                                        normalizer=norm,
                                        weight_init=self.weight_init,
                                        dtype=self.dtype,
                                        name=f"{block}_conv{k}")(x, train=train)

        logits = nn.Conv(self.num_classes, (1, 1, 1), padding="SAME",
                         kernel_init=get_kernel_init(self.weight_init),
                         dtype=self.dtype, name="logits")(x)
        return logits.astype(jnp.float32)
