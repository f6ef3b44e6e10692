"""Width-packed ("lane-packed") shallow stages for UNet3D on TPU.

Same hardware argument as the 2D case (models/packed.py, PERF.md): the TPU
vector lanes and MXU columns are 128 wide, but UNet3D's nnUNet-style channel
schedule starts at C=30 (reference NetworksV2/UNet3D.py:28-187) — the
full-resolution stages run with 30/128 lanes live, and the device profile
shows the 3D forward 78% HBM-bound at only ~100-230 GB/s.  The fix is again
a LAYOUT change: fold F adjacent width pixels into the channel dimension,
[B, D, H, W, C] -> [B, D, H, W/F, F*C] (phase-major: packed channel p*C+c
holds pixel phase p of original channel c), with F=4 for the C=30 stage and
F=2 for the C=60 stage so both run ~120/128 lanes.

Every op of those stages has an exact packed equivalent, generalized here to
arbitrary fold and to the 3D kernel/stride tables:

- k-spatial conv (any (kd,kh,kw), any stride, fold_in -> fold_out) — the
  packed kernel is a structured zero-scatter of the original params; the
  packed width stride is st = sw*Fo/Fi (integer for every transition the
  fold schedule produces).  F× the nominal FLOPs at ~F× the achievable MXU
  rate (columns actually filled) — a wash on compute, ~F× less padded HBM
  traffic.
- instance/batch norm — per-original-channel stats with the phase axis
  folded into the reduction (identical math, reassociated).
- (1,2,2)-stride transpose conv — the two width taps become output phases:
  a width-1 packed transpose conv, fold_out = 2*fold_in.
- 1x1x1 logits conv — phase-block-diagonal kernel + unpack.

Parameters keep their ORIGINAL shapes and names, so checkpoints are
interchangeable between packed and unpacked models (tests/test_lane_pack3d).

Reference counterpart: none — this is the TPU-native layout of the same
computation.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from boxsegliver_tpu.models.layers import Norm, get_kernel_init

Dtype = Any


def pack_w3(x: jnp.ndarray, fold: int) -> jnp.ndarray:
    """[B, D, H, W, C] -> [B, D, H, W/fold, fold*C], phase-major."""
    b, d, h, w, c = x.shape
    return x.reshape(b, d, h, w // fold, fold * c)


def unpack_w3(x: jnp.ndarray, fold: int) -> jnp.ndarray:
    """Inverse of pack_w3."""
    b, d, h, wp, cf = x.shape
    return x.reshape(b, d, h, wp * fold, cf // fold)


def fold_schedule(init_channels: int) -> Tuple[int, ...]:
    """Fold per encoder/decoder stage index (stages beyond the schedule are
    unpacked).  Chosen so consecutive stages halve the fold — exactly what
    the channel-doubling schedule needs, and what makes every strided-conv
    and upconv fold transition expressible as a single packed conv."""
    if init_channels * 4 <= 128:
        return (4, 2)
    if init_channels * 2 <= 128:
        return (2,)
    return ()


def _same_pads(size: int, k: int, s: int) -> Tuple[int, int]:
    """Explicit (lo, hi) padding equal to lax SAME for this dim."""
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    return total // 2, total - total // 2


def _group_offsets(groups: Sequence[int], fold: int):
    """Packed channel offset of each phase-major group in a packed concat
    ([g0_p0..g0_p{F-1} | g1_p0..] — group-major, phases inside)."""
    offs, off = [], 0
    for size in groups:
        offs.append(off)
        off += fold * size
    return offs


class PackedConv3D(nn.Module):
    """SAME conv in packed space, fold_in -> fold_out (params identical to
    nn.Conv: [kd,kh,kw,Cin,Cout] "kernel" + optional [Cout] "bias")."""
    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    fold_in: int = 2
    fold_out: int = 2
    use_bias: bool = False
    weight_init: str = "xavier"
    dtype: Optional[Dtype] = None
    in_groups: Optional[tuple] = None  # packed-concat channel layout

    @nn.compact
    def __call__(self, x):
        fi, fo = self.fold_in, self.fold_out
        kd, kh, kw = self.kernel
        sd, sh, sw = self.strides
        cin = x.shape[-1] // fi
        groups = tuple(self.in_groups) if self.in_groups else (cin,)
        assert sum(groups) == cin, (groups, cin)
        assert (sw * fo) % fi == 0, (self.strides, fi, fo)
        st = sw * fo // fi

        wp = x.shape[3]
        w = wp * fi
        lo_w, _ = _same_pads(w, kw, sw)
        wpo = -(-w // sw) // fo

        # width tap map: orig out col x_o = fo*Xo+po reads orig in col
        # sw*x_o + kx - lo_w = fi*(st*Xo + dX) + qi
        taps = {}
        for po in range(fo):
            for kx in range(kw):
                t = sw * po + kx - lo_w
                taps[(po, kx)] = (t // fi, t % fi)
        d_min = min(d for d, _ in taps.values())
        kwp = max(d for d, _ in taps.values()) - d_min + 1

        k = self.param("kernel", get_kernel_init(self.weight_init),
                       (kd, kh, kw, cin, self.features))
        k2 = jnp.zeros((kd, kh, kwp, fi * cin, fo * self.features), k.dtype)
        offs = _group_offsets(groups, fi)
        for (po, kx), (dx, qi) in taps.items():
            c0 = 0
            for off, size in zip(offs, groups):
                k2 = k2.at[:, :, dx - d_min, off + qi * size:
                           off + (qi + 1) * size,
                           po * self.features:(po + 1) * self.features].set(
                               k[:, :, kx, c0:c0 + size])
                c0 += size

        plo = -d_min
        phi = (wpo - 1) * st + kwp - wp - plo
        pads = [_same_pads(x.shape[1], kd, sd),
                _same_pads(x.shape[2], kh, sh), (plo, max(phi, 0))]
        if self.dtype is not None:
            x, k2 = x.astype(self.dtype), k2.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x, k2, window_strides=(sd, sh, st), padding=pads,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + jnp.tile(b, fo).astype(y.dtype)
        return y


class PackedInstanceNorm3D(nn.Module):
    """flax InstanceNorm semantics (eps 1e-6) on a packed tensor: per
    (sample, original-channel) stats over (D, H, Wp, phase)."""
    fold: int = 2
    epsilon: float = 1e-6
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        f = self.fold
        c = x.shape[-1] // f
        bsz = x.shape[0]
        xf = x.astype(jnp.float32)
        s1 = xf.mean(axis=(1, 2, 3)).reshape(bsz, f, c).mean(axis=1)
        s2 = (xf * xf).mean(axis=(1, 2, 3)).reshape(bsz, f, c).mean(axis=1)
        mean = s1
        var = jnp.maximum(s2 - mean * mean, 0.0)
        a = jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            a = a * self.param("scale", nn.initializers.ones, (c,))
        b = -mean * a
        if self.use_bias:
            b = b + self.param("bias", nn.initializers.zeros, (c,))
        a2 = jnp.tile(a, (1, f))[:, None, None, None, :].astype(x.dtype)
        b2 = jnp.tile(b, (1, f))[:, None, None, None, :].astype(x.dtype)
        return x * a2 + b2


class PackedBatchNorm3D(nn.Module):
    """flax BatchNorm semantics (momentum 0.99, eps 1e-3) on a packed
    tensor; running stats/params in original [C] shapes."""
    fold: int = 2
    momentum: float = 0.99
    epsilon: float = 1e-3
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.fold
        c = x.shape[-1] // f
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (c,))
        if train:
            xf = x.astype(jnp.float32)
            s1 = xf.mean(axis=(0, 1, 2, 3)).reshape(f, c).mean(axis=0)
            s2 = (xf * xf).mean(axis=(0, 1, 2, 3)).reshape(f, c).mean(axis=0)
            mean = s1
            var = jnp.maximum(s2 - mean * mean, 0.0)
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
        return x * jnp.tile(a, f).astype(x.dtype) \
            + jnp.tile(b, f).astype(x.dtype)


class PackedNorm3D(nn.Module):
    """Name-compatible twin of layers.Norm for packed 3D tensors."""
    normalizer: str = "instance_norm"
    fold: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.normalizer == "instance_norm":
            return PackedInstanceNorm3D(self.fold,
                                        name="InstanceNorm_0")(x, train=train)
        if self.normalizer == "batch_norm":
            return PackedBatchNorm3D(self.fold,
                                     name="BatchNorm_0")(x, train=train)
        raise ValueError("Not supported normalization: " + self.normalizer)


class PackedConvNormAct3D(nn.Module):
    """layers.ConvNormAct twin in packed space (param tree Conv_0/Norm_0);
    when fold_out == 1 the norm runs on the unpacked output via the standard
    layers.Norm."""
    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    fold_in: int = 2
    fold_out: int = 2
    normalizer: Optional[str] = "instance_norm"
    act: Optional[Callable] = nn.relu
    weight_init: str = "xavier"
    dtype: Optional[Dtype] = None
    in_groups: Optional[tuple] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = PackedConv3D(self.features, kernel=self.kernel,
                         strides=self.strides, fold_in=self.fold_in,
                         fold_out=self.fold_out,
                         use_bias=self.normalizer is None,
                         weight_init=self.weight_init, dtype=self.dtype,
                         in_groups=self.in_groups, name="Conv_0")(x)
        if self.normalizer is not None:
            if self.fold_out == 1:
                x = Norm(self.normalizer, True, True, dtype=self.dtype,
                         name="Norm_0")(x, train=train)
            else:
                x = PackedNorm3D(self.normalizer, self.fold_out,
                                 dtype=self.dtype,
                                 name="Norm_0")(x, train=train)
        if self.act is not None:
            x = self.act(x)
        return x


class _PackedConvTranspose3D(nn.Module):
    """Param-holder twin of nn.ConvTranspose for the (1,2,2)-stride upconv
    (kernel [1,2,2,Cin,Cout] + optional bias under the standard names).
    Input fold F -> output fold 2F: the two width taps of the stride-2
    transpose conv map to output phases (x_o = 2*x_i + (1-kx), the lax
    SAME convention pinned by tests/test_lane_pack.py for the 2D twin)."""
    features: int
    fold_in: int
    use_bias: bool
    weight_init: str
    dtype: Optional[Dtype]

    @nn.compact
    def __call__(self, x):
        fi = self.fold_in
        cin = x.shape[-1] // fi
        k = self.param("kernel", get_kernel_init(self.weight_init),
                       (1, 2, 2, cin, self.features))
        k2 = jnp.zeros((1, 2, 1, fi * cin, 2 * fi * self.features), k.dtype)
        for qi in range(fi):
            for kx in range(2):
                po = 2 * qi + 1 - kx
                k2 = k2.at[0, :, 0, qi * cin:(qi + 1) * cin,
                           po * self.features:(po + 1) * self.features].set(
                               k[0, :, kx])
        if self.dtype is not None:
            x, k2 = x.astype(self.dtype), k2.astype(self.dtype)
        y = jax.lax.conv_transpose(
            x, k2, strides=(1, 2, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + jnp.tile(b, 2 * fi).astype(y.dtype)
        return y


class PackedUpConv3D(nn.Module):
    """layers.UpConv twin for the (1,2,2) decoder upconvs: transpose conv +
    ReLU (no norm), input fold F -> output fold 2F."""
    features: int
    fold_in: int = 1
    use_bias: bool = True
    act: Optional[Callable] = nn.relu
    weight_init: str = "xavier"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = _PackedConvTranspose3D(self.features, self.fold_in, self.use_bias,
                                   self.weight_init, self.dtype,
                                   name="ConvTranspose_0")(x)
        if self.act is not None:
            y = self.act(y)
        return y


class PackedPointwise3D(nn.Module):
    """1x1x1 conv in packed space (phase-block-diagonal kernel); params
    match nn.Conv ([1,1,1,Cin,Cout] "kernel" + [Cout] "bias")."""
    features: int
    fold: int = 4
    weight_init: str = "xavier"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        f = self.fold
        cin = x.shape[-1] // f
        k = self.param("kernel", get_kernel_init(self.weight_init),
                       (1, 1, 1, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        k2 = jnp.zeros((1, 1, 1, f * cin, f * self.features), k.dtype)
        for p in range(f):
            k2 = k2.at[:, :, :, p * cin:(p + 1) * cin,
                       p * self.features:(p + 1) * self.features].set(
                           k[0, 0, 0])
        if self.dtype is not None:
            x, k2 = x.astype(self.dtype), k2.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x, k2, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y + jnp.tile(b, f).astype(y.dtype)
