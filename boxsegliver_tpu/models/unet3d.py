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
from boxsegliver_tpu.models.packed3d import (PackedConvNormAct3D,
                                             PackedPointwise3D, PackedUpConv3D,
                                             fold_schedule, pack_w3, unpack_w3)

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
    # lane_pack: run the shallow (C=30/60) stages width-packed
    # (models/packed3d.py) — exact same math, ~120/128 lanes instead of
    # 30-60/128.  Parameter tree identical to the unpacked model, so
    # checkpoints are interchangeable.  Routed on by default on TPU.
    lane_pack: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = inputs["images"]
        if self.use_spatial:
            x = jnp.concatenate([x, inputs["sp_guide"]], axis=-1)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        norm = None if self.without_norm else self.normalizer
        cfg = _CFG[self.num_pool_layers]
        sched = (fold_schedule(self.init_channels)
                 if self.lane_pack and x.shape[3] % 4 == 0 else ())

        def fold_of(stage: int) -> int:
            return sched[stage] if 0 <= stage < len(sched) else 1

        c = self.init_channels
        end_pts = {}
        cur_fold = fold_of(0)
        if cur_fold > 1:
            x = pack_w3(x, cur_fold)
        groups = None  # packed-concat layout pending for the next conv
        for block, layers in cfg.items():
            if block.startswith("conv_e") or block == "bridge":
                f_out = fold_of(int(block[-1])) if block != "bridge" else 1
                for k, (kernel, stride) in enumerate(layers):
                    f_in = cur_fold if k == 0 else f_out
                    if f_in == 1 and f_out == 1:
                        x = ConvNormAct(c, kernel=kernel, strides=stride,
                                        normalizer=norm,
                                        weight_init=self.weight_init,
                                        dtype=self.dtype,
                                        name=f"{block}_conv{k + 1}")(
                                            x, train=train)
                    else:
                        x = PackedConvNormAct3D(
                            c, kernel=kernel, strides=stride, fold_in=f_in,
                            fold_out=f_out, normalizer=norm,
                            weight_init=self.weight_init, dtype=self.dtype,
                            name=f"{block}_conv{k + 1}")(x, train=train)
                    cur_fold = f_out
                end_pts[block] = (x, c, f_out)
                c = min(c * 2, self.max_channels)
            else:  # decoder
                f_t = fold_of(int(block[-1]))
                for k, spec in enumerate(layers):
                    if spec[0] == "up":
                        _, kernel, stride = spec
                        enc_key = block.replace("d", "e")
                        skip, c, f_skip = end_pts[enc_key]
                        if f_t == 1:
                            x = UpConv(c, kernel=kernel, strides=stride,
                                       use_bias=False,
                                       weight_init=self.weight_init,
                                       dtype=self.dtype,
                                       name=f"{block}_up")(x)
                        else:
                            # fold doubles across the (1,2,2) upconv — the
                            # schedule guarantees f_skip == 2*cur_fold
                            assert kernel == (1, 2, 2) and f_skip == f_t == \
                                2 * cur_fold, (block, f_skip, f_t, cur_fold)
                            x = PackedUpConv3D(c, fold_in=cur_fold,
                                               use_bias=False,
                                               weight_init=self.weight_init,
                                               dtype=self.dtype,
                                               name=f"{block}_up")(x)
                            groups = (c, c)
                        x = jnp.concatenate([skip, x], axis=-1)
                        cur_fold = f_t
                    else:
                        kernel, stride = spec
                        if cur_fold == 1:
                            x = ConvNormAct(c, kernel=kernel, strides=stride,
                                            normalizer=norm,
                                            weight_init=self.weight_init,
                                            dtype=self.dtype,
                                            name=f"{block}_conv{k}")(
                                                x, train=train)
                        else:
                            x = PackedConvNormAct3D(
                                c, kernel=kernel, strides=stride,
                                fold_in=cur_fold, fold_out=cur_fold,
                                normalizer=norm, in_groups=groups,
                                weight_init=self.weight_init,
                                dtype=self.dtype,
                                name=f"{block}_conv{k}")(x, train=train)
                        groups = None

        if cur_fold > 1:
            x = PackedPointwise3D(self.num_classes, fold=cur_fold,
                                  weight_init=self.weight_init,
                                  dtype=self.dtype, name="logits")(x)
            return unpack_w3(x, cur_fold).astype(jnp.float32)
        logits = nn.Conv(self.num_classes, (1, 1, 1), padding="SAME",
                         kernel_init=get_kernel_init(self.weight_init),
                         dtype=self.dtype, name="logits")(x)
        return logits.astype(jnp.float32)
