"""InterUNet: two-stream encoder (image+guide stream, image(+sobel) stream)
merged at the bottleneck (reference NetworksV2/InterUNet.py:28-170).

Stream x = concat(images, sp_guide); stream y = images (+sobel edges of the
middle channel with --img_grad). Decoder concatenates skips from BOTH streams.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from boxsegliver_tpu.models.layers import (ConvNormAct, UpConv,
                                           get_kernel_init, sobel_edges)
from boxsegliver_tpu.models.packed import (PackedConvNormAct, PackedPointwise,
                                           PackedStridedConvNormAct,
                                           PackedUpConv, pack_w, packed_concat,
                                           unpack_w)

# reference InterUNet.py:28-67 (config[3]): (out, stride, dilation)
_STREAM = {
    "e0": [(32, 1, 1), (32, 1, 1)],
    "e1": [(64, 2, 1), (64, 1, 1)],
    "e2": [(128, 2, 1), (128, 1, 1)],
}
_MERGE = [(512, 2, 1), (512, 1, 1), (1024, 1, 2), (1024, 1, 2)]
_DECODER = {
    "conv_d3": [(512, 1, 2), (512, 1, 1), (512, 1, 1)],
    "conv_d2": [("up", 256), (256, 1, 1), (256, 1, 1)],
    "conv_d1": [("up", 128), (128, 1, 1), (128, 1, 1)],
    "conv_d0": [("up", 64), (64, 1, 1), (64, 1, 1)],
}


class InterUNet(nn.Module):
    num_classes: int = 2
    init_channel_factor: float = 1.0
    num_pool_layers: int = 3
    im_channel: int = 3
    img_grad: bool = False
    normalizer: str = "instance_norm"
    without_norm: bool = False
    weight_init: str = "xavier"
    dtype: Optional[Any] = None
    # width-packed full-res blocks (models/packed.py; see UNet.lane_pack):
    # both e0 streams, the e1 downsampling convs, and conv_d0 run lane-packed
    lane_pack: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        if self.num_pool_layers != 3:
            raise ValueError("InterUNet only defines num_pool_layers=3 "
                             "(reference InterUNet.py:28)")
        images = inputs["images"]
        x = jnp.concatenate([images, inputs["sp_guide"]], axis=-1)
        y = images
        if self.img_grad:
            s = self.im_channel // 2
            sob = sobel_edges(images[..., s:s + 1].astype(jnp.float32))
            y = jnp.concatenate([y, sob.astype(y.dtype)], axis=-1)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            y = y.astype(self.dtype)
        norm = None if self.without_norm else self.normalizer
        c = self.init_channel_factor
        pack = self.lane_pack and images.shape[2] % 2 == 0

        def conv(v, out, stride, dil, name):
            return ConvNormAct(round(out * c), strides=(stride, stride),
                               dilation=dil, normalizer=norm,
                               weight_init=self.weight_init, dtype=self.dtype,
                               name=name)(v, train=train)

        def stream_conv(v, key, k, out, stride, dil, name, in_groups=None):
            """e0 runs packed; e1's stride-2 conv unpacks; deeper = plain."""
            if pack and key == "e0":
                return PackedConvNormAct(
                    round(out * c), normalizer=norm,
                    weight_init=self.weight_init, dtype=self.dtype,
                    in_groups=in_groups, name=name)(v, train=train)
            if pack and key == "e1" and k == 0:
                return PackedStridedConvNormAct(
                    round(out * c), normalizer=norm,
                    weight_init=self.weight_init, dtype=self.dtype,
                    name=name)(v, train=train)
            return conv(v, out, stride, dil, name)

        if pack:
            x, y = pack_w(x), pack_w(y)
        x_skips, y_skips = {}, {}
        for key, layers in _STREAM.items():
            for k, (out, stride, dil) in enumerate(layers):
                x = stream_conv(x, key, k, out, stride, dil,
                                f"image_{key}_conv{k + 1}")
            x_skips[key] = x
        for key, layers in _STREAM.items():
            for k, (out, stride, dil) in enumerate(layers):
                y = stream_conv(y, key, k, out, stride, dil,
                                f"inter_{key}_conv{k + 1}")
            y_skips[key] = y

        z = jnp.concatenate([x_skips["e2"], y_skips["e2"]], axis=-1)
        for k, (out, stride, dil) in enumerate(_MERGE):
            z = conv(z, out, stride, dil, f"merge_e3_conv{k + 1}")

        for block, layers in _DECODER.items():
            packed_here = pack and block == "conv_d0"
            concat_groups = None
            for k, spec in enumerate(layers):
                if spec[0] == "up":
                    ekey = block.replace("conv_d", "e")
                    if packed_here:
                        z = PackedUpConv(round(spec[1] * c), use_bias=False,
                                         weight_init=self.weight_init,
                                         dtype=self.dtype,
                                         name=f"{block}_up")(z)
                        xs, ys = x_skips[ekey], y_skips[ekey]
                        concat_groups = (z.shape[-1] // 2, xs.shape[-1] // 2,
                                         ys.shape[-1] // 2)
                        z = packed_concat(z, xs, ys)
                    else:
                        z = UpConv(round(spec[1] * c), use_bias=False,
                                   weight_init=self.weight_init,
                                   dtype=self.dtype, name=f"{block}_up")(z)
                        z = jnp.concatenate([z, x_skips[ekey], y_skips[ekey]],
                                            axis=-1)
                else:
                    out, stride, dil = spec
                    if packed_here:
                        z = PackedConvNormAct(
                            round(out * c), normalizer=norm,
                            weight_init=self.weight_init, dtype=self.dtype,
                            in_groups=concat_groups,
                            name=f"{block}_conv{k + 1}")(z, train=train)
                        concat_groups = None
                    else:
                        z = conv(z, out, stride, dil, f"{block}_conv{k + 1}")

        if pack:
            z = PackedPointwise(self.num_classes,
                                weight_init=self.weight_init,
                                dtype=self.dtype, name="logits")(z)
            return unpack_w(z).astype(jnp.float32)
        logits = nn.Conv(self.num_classes, (1, 1), padding="SAME",
                         kernel_init=get_kernel_init(self.weight_init),
                         dtype=self.dtype, name="logits")(z)
        return logits.astype(jnp.float32)
