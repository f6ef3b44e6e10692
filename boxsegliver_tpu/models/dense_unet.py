"""DenseUNet: DenseNet-161-backboned UNet (reference NetworksV2/DenseUNet.py).

Encoder is a DenseNet-161 stem + 4 dense blocks (nb_layers (6,12,36,24),
growth 48, compression 0.5, stem 96 channels; DenseUNet.py:70-90); decoder
is nearest-neighbour 2x upsampling with additive skip fusion and
conv3x3+BN+ReLU refinement (DenseUNet.py:96-117).  The reference keeps this
model commented out of its zoo (core/models.py:31,37) but ships the full
implementation plus an ImageNet h5 warm start (core/models.py:188-221); we
register it and support the same h5 import (utils/h5_import.py).

Layer names are kept FLAT and identical to the reference variable scopes
(conv1, conv1_bn, conv{stage}_{branch}_x1, conv{stage}_blk, bn_up0, ...) so
the DenseNet-161 `densenet161_weights_tf.h5` key mapping transfers directly
onto the flax param tree.

Deviations from the reference, on purpose:
- `slim.dropout` after conv_up4 (DenseUNet.py:116) omits the is_training
  flag and would therefore drop at eval time in the reference graph; here
  dropout is deterministic at eval like every other model.
- nearest-neighbour resize uses exact pixel duplication (identical to
  TF's align_corners=True nearest at integer 2x factors).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from boxsegliver_tpu.models.layers import get_kernel_init


def _upsample2x(x):
    """Nearest-neighbour 2x upsample (DenseUNet.py resize_nearest_neighbor)."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class DenseUNet(nn.Module):
    num_classes: int = 3
    stem_channels: int = 96
    growth_rate: int = 48
    nb_layers: Tuple[int, ...] = (6, 12, 36, 24)
    compression: float = 0.5
    dropout: float = 0.0
    weight_init: str = "xavier"
    dtype: Optional[Any] = None

    def _conv(self, features, kernel, name, strides=1):
        # arg_scope at DenseUNet.py:46-52: no bias, no activation, no norm
        return nn.Conv(features, (kernel, kernel), strides=(strides, strides),
                       padding="SAME", use_bias=False,
                       kernel_init=get_kernel_init(self.weight_init),
                       dtype=self.dtype, name=name)

    def _decoder_conv(self, features, kernel, name):
        # decoder convs use weights_initializer="normal" (DenseUNet.py:96-118)
        return nn.Conv(features, (kernel, kernel), padding="SAME",
                       use_bias=False,
                       kernel_init=nn.initializers.truncated_normal(0.01),
                       dtype=self.dtype, name=name)

    def _bn(self, x, name, train, eps=1e-5):
        return nn.relu(nn.BatchNorm(
            use_running_average=not train, momentum=0.999, epsilon=eps,
            dtype=self.dtype, name=name)(x))

    def _drop(self, x, train):
        if self.dropout:
            return nn.Dropout(rate=self.dropout,
                              deterministic=not train)(x)
        return x

    def _conv_block(self, x, stage, branch, train):
        """BN-ReLU-1x1(4g)-BN-ReLU-3x3(g) bottleneck (DenseUNet.py:137-150)."""
        base = f"conv{stage}_{branch}"
        x = self._bn(x, base + "_x1_bn", train)
        x = self._conv(self.growth_rate * 4, 1, base + "_x1")(x)
        x = self._drop(x, train)
        x = self._bn(x, base + "_x2_bn", train)
        x = self._conv(self.growth_rate, 3, base + "_x2")(x)
        return self._drop(x, train)

    def _dense_block(self, x, stage, nb_layers, train):
        """Concatenative dense block (DenseUNet.py:161-169)."""
        for i in range(nb_layers):
            y = self._conv_block(x, stage, i + 1, train)
            x = jnp.concatenate([x, y], axis=-1)
        return x

    def _transition(self, x, stage, train):
        """BN-ReLU-1x1(compress)-avgpool (DenseUNet.py:152-159)."""
        base = f"conv{stage}_blk"
        x = self._bn(x, base + "_bn", train)
        x = self._conv(int(x.shape[-1] * self.compression), 1, base)(x)
        x = self._drop(x, train)
        return nn.avg_pool(x, (2, 2), strides=(2, 2), padding="SAME")

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        if len(self.nb_layers) != 4:
            raise ValueError(
                "DenseUNet's decoder is fixed at 4 dense blocks / 5 skip "
                f"levels (reference DenseUNet.py:96-118); got nb_layers="
                f"{self.nb_layers}")
        x = inputs["images"] if isinstance(inputs, dict) else inputs
        if self.dtype is not None:
            x = x.astype(self.dtype)

        # -- DenseNet-161 encoder (DenseUNet.py:70-90) --
        box = []
        x = self._conv(self.stem_channels, 7, "conv1", strides=2)(x)
        x = self._bn(x, "conv1_bn", train)
        box.append(x)                                       # H/2, 96
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        stage = 1
        for block_idx in range(len(self.nb_layers) - 1):
            stage = block_idx + 2
            x = self._dense_block(x, stage, self.nb_layers[block_idx], train)
            box.append(x)
            x = self._transition(x, stage, train)
        final_stage = stage + 1
        x = self._dense_block(x, final_stage, self.nb_layers[-1], train)
        x = self._bn(x, f"conv{final_stage}_blk_bn", train)
        box.append(x)                                       # H/32, 2208

        # -- additive-skip decoder (DenseUNet.py:96-118).  Refinement widths
        # must equal the next skip's channels for the additive fusion; for
        # the DenseNet-161 config they resolve to the reference's hard-coded
        # 768/384/96 (DenseUNet.py:99-112).
        up0 = _upsample2x(x)
        line0 = self._decoder_conv(box[4].shape[-1], 1, "line0")(box[3])
        x = self._decoder_conv(box[2].shape[-1], 3, "conv_up0")(line0 + up0)
        x = self._bn(x, "bn_up0", train, eps=1e-3)

        x = box[2] + _upsample2x(x)
        x = self._decoder_conv(box[1].shape[-1], 3, "conv_up1")(x)
        x = self._bn(x, "bn_up1", train, eps=1e-3)

        x = box[1] + _upsample2x(x)
        x = self._decoder_conv(box[0].shape[-1], 3, "conv_up2")(x)
        x = self._bn(x, "bn_up2", train, eps=1e-3)

        x = box[0] + _upsample2x(x)
        x = self._decoder_conv(96, 3, "conv_up3")(x)
        x = self._bn(x, "bn_up3", train, eps=1e-3)

        x = _upsample2x(x)
        x = self._decoder_conv(64, 3, "conv_up4")(x)
        # unconditional keep_prob=0.7 on the last decoder features — a fixed
        # rate independent of --dropout, like the reference (DenseUNet.py:116)
        x = nn.Dropout(rate=0.3, deterministic=not train)(x)
        x = self._bn(x, "bn_up4", train, eps=1e-3)

        logits = self._decoder_conv(self.num_classes, 1, "AdjustChannels")(x)
        return logits.astype(jnp.float32)
