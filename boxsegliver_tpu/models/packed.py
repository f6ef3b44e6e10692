"""Width-packed ("lane-packed") full-resolution stage for TPU.

Why this exists (measured, see PERF.md): at 256x256 the UNet family's channel
count is 64, but the TPU vector lanes and MXU columns are 128 wide.  XLA lays
the [32,256,256,64] bf16 activations out as T(8,128) tiles with C=64 in the
lane dimension — every tile is HALF PADDING, capping effective HBM bandwidth
at ~410 GB/s (measured: the full-res ops run at 290-330 GB/s, "HBM-bound" in
the device profile) and the 64-wide convolutions at ~half MXU peak.  48% of
the headline train step is spent at this resolution.

The fix is a layout change, not a kernel: fold adjacent width-pixel PAIRS
into the channel dimension — [B, H, W, C] -> [B, H, W/2, 2C] (phase-major:
channel p*C+c holds pixel phase p of original channel c).  2C = 128 fills the
lanes exactly.  Every stage-1 op has an EXACT packed equivalent:

- 3x3 conv  -> 3x3 packed conv whose [3,3,2Cin,2Cout] kernel is a structured
  zero-scatter of the original [3,3,Cin,Cout] params (50% structural zeros:
  2x the nominal FLOPs at 2x the achievable MXU rate — a wash on compute,
  half the bytes on memory).
- batch/instance norm -> per-channel stats summed across the two phases
  (identical math, reassociated).
- 2x2 maxpool -> height-pool + channel-phase-pair max (output unpacked).
- 2x2 stride-2 transpose conv -> height-only transpose conv with the two
  width taps mapped to output phases.
- 1x1 logits conv -> phase-block-diagonal 1x1 conv + depth-to-width unpack.

Parameters keep their ORIGINAL shapes and names (Conv_0/kernel etc.), so
checkpoints are interchangeable between packed and unpacked models; the
packed kernels are rebuilt from them inside the jitted step (tiny scatters).
Numerics match the unpacked model to float tolerance (tests/test_lane_pack).

Reference counterpart: none — the reference computes the same UNet stage on
CUDA (NetworksV2/UNet.py:75-101); this module is the TPU-native layout of it.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from boxsegliver_tpu.models.layers import get_kernel_init

Dtype = Any


def pack_w(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H, W//2, 2C], phase-major (channel p*C+c = phase p
    of channel c)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def unpack_w(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_w."""
    b, h, w2, c2 = x.shape
    return x.reshape(b, h, w2 * 2, c2 // 2)


def packed_concat(*tensors: jnp.ndarray) -> jnp.ndarray:
    """Channel concat of packed tensors.

    The result is NOT globally phase-major — it is [a_p0|a_p1|b_p0|b_p1|…]
    (group-major).  Reordering the TENSOR into phase-major would slice out
    half-lane (C=64) intermediates whose forward+backward fusions run at
    half bandwidth (measured: ~306 GB/s vs ~600 for full-lane shapes);
    instead the consuming PackedConv bakes the permutation into its kernel
    scatter via in_groups — zero runtime cost."""
    return jnp.concatenate(tensors, axis=-1)


def packed_max_pool(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 maxpool of the unpacked tensor, from packed input:
    height-pool + max over the width-phase channel pair.  Output UNPACKED
    [B, H/2, W/2, C] — exactly the next (128-channel) stage's input.

    The height pool defaults to reduce_window: the reshape+max alternative
    (backward = loop fusion instead of select-and-scatter) MEASURED SLOWER
    in the packed train step (363.7 vs 374.8 slices/s — the reshape breaks
    tiling; see layers.max_pool2x2).  BOXSEG_POOL_IMPL=reshape is the A/B
    arm."""
    b, h, w2, c2 = x.shape
    if h % 2 or os.environ.get("BOXSEG_POOL_IMPL", "window") != "reshape":
        x = nn.max_pool(x, (2, 1), strides=(2, 1))
    else:
        x = x.reshape(b, h // 2, 2, w2, c2).max(axis=2)
    c = x.shape[-1] // 2
    return jnp.maximum(x[..., :c], x[..., c:])


def _packed_conv_kernel(k: jnp.ndarray, in_groups=None) -> jnp.ndarray:
    """[3, 3, Cin, Cout] -> [3, 3, 2Cin, 2Cout] packed-space kernel.

    Output phase p at packed col X is original col x=2X+p; width tap kx
    reads original col x+kx-1 = 2(X+s)+q with s=floor((p+kx-1)/2),
    q=(p+kx-1)%2 — i.e. packed col X+s, phase q, at packed width tap s+1.

    in_groups describes the packed input's channel layout as a sequence of
    phase-major groups (packed_concat output is [g0_p0|g0_p1|g1_p0|g1_p1]):
    original channel ci of group g at phase q sits at packed position
    2*sum(groups[:g]) + q*groups[g] + local.  Default: one group (= plain
    phase-major)."""
    cin, cout = k.shape[2], k.shape[3]
    groups = tuple(in_groups) if in_groups else (cin,)
    assert sum(groups) == cin, (groups, cin)
    k2 = jnp.zeros((3, 3, 2 * cin, 2 * cout), k.dtype)
    for p in range(2):
        for kx in range(3):
            s = (p + kx - 1) // 2 + 1
            q = (p + kx - 1) % 2
            off = c0 = 0
            for size in groups:
                k2 = k2.at[:, s, off + q * size:off + (q + 1) * size,
                           p * cout:(p + 1) * cout].set(k[:, kx, c0:c0 + size])
                off += 2 * size
                c0 += size
    return k2


class PackedConv(nn.Module):
    """3x3 SAME conv in packed space; params identical to nn.Conv's
    ([3,3,Cin,Cout] "kernel" + optional [Cout] "bias")."""
    features: int  # original output channels; packed output is 2x
    use_bias: bool = False
    weight_init: str = "xavier"
    dtype: Optional[Dtype] = None
    in_groups: Optional[tuple] = None  # packed_concat channel layout

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // 2
        k = self.param("kernel", get_kernel_init(self.weight_init),
                       (3, 3, cin, self.features))
        k2 = _packed_conv_kernel(k, self.in_groups)
        if self.dtype is not None:
            x, k2 = x.astype(self.dtype), k2.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x, k2, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + jnp.tile(b, 2).astype(y.dtype)
        return y


class PackedStridedConv(nn.Module):
    """3x3 stride-2 conv from a PACKED input to an UNPACKED output (the
    downsampling convs of the SmallUNet/InterUNet families,
    reference SmallUNet.py:31-57 / InterUNet.py:28-67 config tables).

    With SAME padding at stride 2 over an even axis, lax pads (0, 1) and
    output col x_o reads original cols 2*x_o + kx: width tap kx maps to
    packed col x_o + kx//2, phase kx%2 → a [3, 2, 2Cin, Cout] kernel at
    packed-W stride 1 with padding (0, 1); the height dim keeps kernel 3
    stride 2 with the same (0, 1) padding (even heights).  Params identical
    to nn.Conv ([3,3,Cin,Cout])."""
    features: int
    use_bias: bool = False
    weight_init: str = "xavier"
    dtype: Optional[Dtype] = None
    in_groups: Optional[tuple] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // 2
        groups = tuple(self.in_groups) if self.in_groups else (cin,)
        assert sum(groups) == cin, (groups, cin)
        k = self.param("kernel", get_kernel_init(self.weight_init),
                       (3, 3, cin, self.features))
        k2 = jnp.zeros((3, 2, 2 * cin, self.features), k.dtype)
        for kx in range(3):
            s, q = kx // 2, kx % 2
            off = c0 = 0
            for size in groups:
                k2 = k2.at[:, s, off + q * size:off + (q + 1) * size].set(
                    k[:, kx, c0:c0 + size])
                off += 2 * size
                c0 += size
        if self.dtype is not None:
            x, k2 = x.astype(self.dtype), k2.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x, k2, window_strides=(2, 1), padding=((0, 1), (0, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class PackedBatchNorm(nn.Module):
    """flax BatchNorm semantics on a packed tensor: per-ORIGINAL-channel
    stats over (N, H, W2, phase), running stats/params in original [C]
    shapes under the standard names (scale/bias, batch_stats mean/var)."""
    momentum: float = 0.99
    epsilon: float = 1e-3
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1] // 2
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (c,))
        if train:
            xf = x.astype(jnp.float32)
            s1 = xf.mean(axis=(0, 1, 2))
            s2 = (xf * xf).mean(axis=(0, 1, 2))
            mean = 0.5 * (s1[:c] + s1[c:])
            m2 = 0.5 * (s2[:c] + s2[c:])
            var = jnp.maximum(m2 - mean * mean, 0.0)
            if not self.is_initializing() and \
                    self.is_mutable_collection("batch_stats"):
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        a = jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            a = a * self.param("scale", nn.initializers.ones, (c,))
        b = -mean * a
        if self.use_bias:
            b = b + self.param("bias", nn.initializers.zeros, (c,))
        return x * jnp.tile(a, 2).astype(x.dtype) \
            + jnp.tile(b, 2).astype(x.dtype)


class PackedInstanceNorm(nn.Module):
    """flax InstanceNorm semantics on a packed tensor (eps 1e-6): per
    (sample, original-channel) stats over (H, W2, phase)."""
    epsilon: float = 1e-6
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        c = x.shape[-1] // 2
        xf = x.astype(jnp.float32)
        s1 = xf.mean(axis=(1, 2))          # [B, 2C]
        s2 = (xf * xf).mean(axis=(1, 2))
        mean = 0.5 * (s1[:, :c] + s1[:, c:])
        var = jnp.maximum(0.5 * (s2[:, :c] + s2[:, c:]) - mean * mean, 0.0)
        a = jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            a = a * self.param("scale", nn.initializers.ones, (c,))
        b = -mean * a
        if self.use_bias:
            b = b + self.param("bias", nn.initializers.zeros, (c,))
        a2 = jnp.tile(a, (1, 2))[:, None, None, :].astype(x.dtype)
        b2 = jnp.tile(b, (1, 2))[:, None, None, :].astype(x.dtype)
        return x * a2 + b2


class PackedNorm(nn.Module):
    """Name-compatible twin of layers.Norm for packed tensors."""
    normalizer: str = "batch_norm"
    use_bias: bool = True
    use_scale: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.normalizer == "batch_norm":
            return PackedBatchNorm(use_bias=self.use_bias,
                                   use_scale=self.use_scale,
                                   name="BatchNorm_0")(x, train=train)
        if self.normalizer == "instance_norm":
            return PackedInstanceNorm(use_bias=self.use_bias,
                                      use_scale=self.use_scale,
                                      name="InstanceNorm_0")(x, train=train)
        raise ValueError("Not supported normalization: " + self.normalizer)


class PackedConvNormAct(nn.Module):
    """layers.ConvNormAct twin in packed space with an identical param tree
    (Conv_0 kernel/bias, Norm_0/BatchNorm_0 scale/bias + batch_stats)."""
    features: int
    normalizer: Optional[str] = "batch_norm"
    norm_bias: bool = True
    norm_scale: bool = True
    act: Optional[Callable] = nn.relu
    weight_init: str = "xavier"
    dtype: Optional[Dtype] = None
    in_groups: Optional[tuple] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = PackedConv(self.features, use_bias=self.normalizer is None,
                       weight_init=self.weight_init, dtype=self.dtype,
                       in_groups=self.in_groups, name="Conv_0")(x)
        if self.normalizer is not None:
            x = PackedNorm(self.normalizer, self.norm_bias, self.norm_scale,
                           dtype=self.dtype, name="Norm_0")(x, train=train)
        if self.act is not None:
            x = self.act(x)
        return x


class PackedStridedConvNormAct(nn.Module):
    """ConvNormAct twin for the PACKED→UNPACKED stride-2 downsampling conv
    (param tree Conv_0/Norm_0 like layers.ConvNormAct; the norm runs on the
    unpacked output so the standard layers.Norm applies)."""
    features: int
    normalizer: Optional[str] = "instance_norm"
    act: Optional[Callable] = nn.relu
    weight_init: str = "xavier"
    dtype: Optional[Dtype] = None
    in_groups: Optional[tuple] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from boxsegliver_tpu.models.layers import Norm
        x = PackedStridedConv(self.features,
                              use_bias=self.normalizer is None,
                              weight_init=self.weight_init, dtype=self.dtype,
                              in_groups=self.in_groups, name="Conv_0")(x)
        if self.normalizer is not None:
            x = Norm(self.normalizer, True, True, dtype=self.dtype,
                     name="Norm_0")(x, train=train)
        if self.act is not None:
            x = self.act(x)
        return x


class _PackedConvTranspose(nn.Module):
    """Param-holder twin of nn.ConvTranspose for the packed upconv (kernel
    [2,2,Cin,Cout] + bias [Cout] under the standard names)."""
    features: int
    use_bias: bool
    weight_init: str
    dtype: Optional[Dtype]

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.param("kernel", get_kernel_init(self.weight_init),
                       (2, 2, cin, self.features))
        # [2,1,cin,2*features]: width tap kx of the original 2x2 stride-2
        # transpose conv produces output phase p=1-kx (lax.conv_transpose
        # correlates with the kernel spatially reversed when
        # transpose_kernel=False; verified empirically + pinned by
        # tests/test_lane_pack.py)
        k2 = jnp.concatenate([k[:, 1], k[:, 0]], axis=-1)[:, None]
        if self.dtype is not None:
            x, k2 = x.astype(self.dtype), k2.astype(self.dtype)
        if os.environ.get("BOXSEG_UPCONV_IMPL") == "dts":
            # height-phase matmul + interleave (reverse-free backward; see
            # layers._DtsConvTranspose): out[2i+p] = x[i] @ k2[1-p]
            b, h, w2, _ = x.shape
            k2r = jnp.concatenate([k2[1:, 0], k2[:1, 0]], axis=0)
            y = jnp.einsum("bhwc,pcd->bhpwd", x, k2r)
            y = y.reshape(b, 2 * h, w2, 2 * self.features)
        else:
            y = jax.lax.conv_transpose(
                x, k2, strides=(2, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + jnp.tile(b, 2).astype(y.dtype)
        return y


class PackedUpConv(nn.Module):
    """layers.UpConv twin: 2x2 stride-2 transpose conv from an UNPACKED
    input to a PACKED output, as a height-only transpose conv whose two
    width taps become the output phases."""
    features: int
    use_bias: bool = True
    act: Optional[Callable] = nn.relu
    weight_init: str = "xavier"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = _PackedConvTranspose(self.features, self.use_bias,
                                 self.weight_init, self.dtype,
                                 name="ConvTranspose_0")(x)
        if self.act is not None:
            y = self.act(y)
        return y


def tile_channel(v: jnp.ndarray) -> jnp.ndarray:
    """Per-original-channel vector [..., C] -> packed broadcast [..., 2C]
    (both phases share the channel parameter)."""
    return jnp.concatenate([v, v], axis=-1)


class PackedChannelAffine(nn.Module):
    """layers.ChannelAffine twin for packed tensors (params gamma/beta in
    original [C] shapes)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // 2
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        return x * tile_channel(gamma).astype(x.dtype) \
            + tile_channel(beta).astype(x.dtype)


class PackedPointwise(nn.Module):
    """1x1 conv in packed space (phase-block-diagonal kernel); params match
    nn.Conv ([1,1,Cin,Cout] "kernel" + [Cout] "bias")."""
    features: int
    weight_init: str = "xavier"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // 2
        k = self.param("kernel", get_kernel_init(self.weight_init),
                       (1, 1, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        k2 = jnp.zeros((1, 1, 2 * cin, 2 * self.features), k.dtype)
        for p in range(2):
            k2 = k2.at[:, :, p * cin:(p + 1) * cin,
                       p * self.features:(p + 1) * self.features].set(k[0, 0])
        if self.dtype is not None:
            x, k2 = x.astype(self.dtype), k2.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x, k2, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + jnp.tile(b, 2).astype(y.dtype)
