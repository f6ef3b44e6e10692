"""LGNet: explicit 5-stage UNet with additive spatial-guide modulation at
chosen encoder AND decoder layers (reference NetworksV2/LGNet.py:31-210).

mod_layers = [[encoder layers], [decoder layers]]; spatial subnets are
per-layer 1x1 convs (leaky ReLU, no norm) on an avg-pooled guide pyramid
(LGNet.py:31-54). Stage pattern: conv1(+norm+relu), conv2(+norm), +guide,
relu; decoder: up, concat, conv1(+norm), +guide, relu, conv2(+norm+relu).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from boxsegliver_tpu.models.layers import (ConvNormAct, UpConv,
                                           get_kernel_init, max_pool2x2)
from boxsegliver_tpu.models.packed import (PackedConvNormAct, PackedPointwise,
                                           PackedUpConv, pack_w, packed_concat,
                                           packed_max_pool, unpack_w)

_LAYER_C = (64, 128, 256, 512, 1024)


class LGNet(nn.Module):
    num_classes: int = 2
    mod_layers: Tuple[Tuple[int, ...], Tuple[int, ...]] = ((0, 1), (0, 1))
    use_spatial: bool = True
    guide_channel: int = 1
    normalizer: str = "instance_norm"
    without_norm: bool = False
    img_grad: bool = False
    weight_init: str = "xavier"
    dtype: Optional[Any] = None
    # width-packed stage 0 (models/packed.py; see UNet.lane_pack)
    lane_pack: bool = False

    def _spatial_pyramid(self, sp_guide, layers: Sequence[int], tag: str):
        """1x1 conv per modulated layer over avg-pooled guides (LGNet.py:31-54)."""
        params = []
        sg = sp_guide
        prev = 0
        for ell in layers:
            if ell > 0:
                k = 2 ** (ell - prev)
                sg = nn.avg_pool(sg, (k, k), strides=(k, k), padding="SAME")
            out = nn.Conv(_LAYER_C[ell], (1, 1), padding="SAME",
                          kernel_init=get_kernel_init(self.weight_init),
                          dtype=self.dtype, name=f"spatial_{tag}{ell + 1}")(sg)
            params.append(nn.leaky_relu(out))
            prev = ell
        return params

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        images = inputs["images"]
        norm = None if self.without_norm else self.normalizer

        if self.use_spatial:
            gs = inputs["sp_guide"].astype(self.dtype or jnp.float32)
            enc_params = self._spatial_pyramid(gs, self.mod_layers[0], "e")
            dec_params = self._spatial_pyramid(gs, self.mod_layers[1], "d")
        else:
            enc_params = [None] * len(self.mod_layers[0])
            dec_params = [None] * len(self.mod_layers[1])

        def merge_guide_act(x, layer, params, layers, packed=False):
            if self.use_spatial and layer in layers:
                sp = params[list(layers).index(layer)]
                x = x + (pack_w(sp) if packed else sp)
            return nn.relu(x)

        if self.img_grad:
            from boxsegliver_tpu.models.layers import image_gradients
            dy, dx = image_gradients(images)
            x = jnp.concatenate([images, dy, dx], axis=-1)
        else:
            x = images
        if self.dtype is not None:
            x = x.astype(self.dtype)

        pack = self.lane_pack and x.shape[2] % 2 == 0
        skips = []
        for i in range(5):  # 4 encoder stages + bridge
            ch = _LAYER_C[i]
            if pack and i == 0:
                x = pack_w(x)
                x = PackedConvNormAct(ch, normalizer=norm, act=nn.relu,
                                      weight_init=self.weight_init,
                                      dtype=self.dtype,
                                      name="conv_e0_conv1")(x, train=train)
                x = PackedConvNormAct(ch, normalizer=norm, act=None,
                                      weight_init=self.weight_init,
                                      dtype=self.dtype,
                                      name="conv_e0_conv2")(x, train=train)
                x = merge_guide_act(x, 0, enc_params, self.mod_layers[0],
                                    packed=True)
                skips.append(x)
                x = packed_max_pool(x)
                continue
            x = ConvNormAct(ch, normalizer=norm, act=nn.relu,
                            weight_init=self.weight_init, dtype=self.dtype,
                            name=f"conv_e{i}_conv1")(x, train=train)
            x = ConvNormAct(ch, normalizer=norm, act=None,
                            weight_init=self.weight_init, dtype=self.dtype,
                            name=f"conv_e{i}_conv2")(x, train=train)
            x = merge_guide_act(x, i, enc_params, self.mod_layers[0])
            skips.append(x)
            if i < 4:
                x = max_pool2x2(x, padding="SAME")

        for i in reversed(range(4)):
            ch = _LAYER_C[i]
            if pack and i == 0:
                up = PackedUpConv(ch, weight_init=self.weight_init,
                                  dtype=self.dtype, name="conv_d0_up")(x)
                groups = (skips[0].shape[-1] // 2, up.shape[-1] // 2)
                x = packed_concat(skips[0], up)
                x = PackedConvNormAct(ch, normalizer=norm, act=None,
                                      weight_init=self.weight_init,
                                      dtype=self.dtype, in_groups=groups,
                                      name="conv_d0_conv1")(x, train=train)
                x = merge_guide_act(x, 0, dec_params, self.mod_layers[1],
                                    packed=True)
                x = PackedConvNormAct(ch, normalizer=norm, act=nn.relu,
                                      weight_init=self.weight_init,
                                      dtype=self.dtype,
                                      name="conv_d0_conv2")(x, train=train)
                x = PackedPointwise(self.num_classes,
                                    weight_init=self.weight_init,
                                    dtype=self.dtype, name="logits")(x)
                return unpack_w(x).astype(jnp.float32)
            x = UpConv(ch, weight_init=self.weight_init, dtype=self.dtype,
                       name=f"conv_d{i}_up")(x)
            x = jnp.concatenate([skips[i], x], axis=-1)
            x = ConvNormAct(ch, normalizer=norm, act=None,
                            weight_init=self.weight_init, dtype=self.dtype,
                            name=f"conv_d{i}_conv1")(x, train=train)
            x = merge_guide_act(x, i, dec_params, self.mod_layers[1])
            x = ConvNormAct(ch, normalizer=norm, act=nn.relu,
                            weight_init=self.weight_init, dtype=self.dtype,
                            name=f"conv_d{i}_conv2")(x, train=train)

        logits = nn.Conv(self.num_classes, (1, 1), padding="SAME",
                         kernel_init=get_kernel_init(self.weight_init),
                         dtype=self.dtype, name="logits")(x)
        return logits.astype(jnp.float32)
