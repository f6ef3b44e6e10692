"""Shared Flax building blocks for the UNet model family.

Conventions mirrored from the reference slim usage (NetworksV2/*.py):
- conv 3x3 + normalizer + ReLU is the basic unit (slim.conv2d with arg_scope)
- transpose convs have ReLU but NO normalizer (arg_scope only wraps conv2d)
- normalizer is batch_norm (momentum 0.99, scale=True) or instance_norm,
  selected by --normalizer (reference NetworksV2/base.py:153-169)
- weight init: xavier (glorot uniform) or truncated normal(0.01)
  (reference base.py:137-151); bias init zeros

Compute dtype is configurable (bfloat16 for TPU speed, float32 params); logits
are always cast to float32 before loss/softmax.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def get_kernel_init(weight_init: str = "xavier"):
    if weight_init == "xavier":
        return nn.initializers.glorot_uniform()
    if weight_init == "trunc_norm":
        return nn.initializers.truncated_normal(stddev=0.01)
    raise ValueError("Not supported weight initializer: " + weight_init)


he_normal = nn.initializers.he_normal


def max_pool2x2(x: jnp.ndarray, padding: str = "VALID") -> jnp.ndarray:
    """2x2 stride-2 max pool with a selectable lowering (A/B measured).

    Hypothesis tested round 4: reduce_window's gradient lowers to
    select-and-scatter (1.79 ms/step of the headline train step,
    profiles/packed_v2_r3.txt), so a reshape+max form — whose backward is an
    ordinary compare/select loop fusion — should be faster.  MEASURED FALSE
    on-chip: the reshape form benched 363.7 slices/s vs 374.8 for
    reduce_window (bench.py, 2026-08-18) — the [B,H/2,2,W/2,2,C] reshape
    breaks the T(8,128) tiling of both the forward and the incoming gradient,
    and the forced relayouts cost more than select-and-scatter ever did.
    Default is therefore the reduce_window lowering; set
    BOXSEG_POOL_IMPL=reshape to get the reshape+max form (kept as the A/B
    arm; forward bit-identical, backward differs only on exact in-window
    ties — equal split vs first-wins).  The reference slim.max_pool2d default
    is VALID (NetworksV2/UNet.py:78)."""
    b, h, w, c = x.shape
    if (h % 2 or w % 2
            or os.environ.get("BOXSEG_POOL_IMPL", "window") != "reshape"):
        return nn.max_pool(x, (2, 2), strides=(2, 2), padding=padding)
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.max(axis=(2, 4))


class Norm(nn.Module):
    """Normalizer selected by name with optional affine params.

    batch_norm: momentum 0.99, eps 1e-3 (slim defaults as configured by the
    reference encoder blocks); instance_norm: eps 1e-6 (tf.contrib default).
    """
    normalizer: str = "batch_norm"
    use_bias: bool = True   # 'center'
    use_scale: bool = True  # 'scale'
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.normalizer == "batch_norm":
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                use_bias=self.use_bias, use_scale=self.use_scale,
                dtype=self.dtype)(x)
        if self.normalizer == "instance_norm":
            return nn.InstanceNorm(
                epsilon=1e-6, use_bias=self.use_bias, use_scale=self.use_scale,
                dtype=self.dtype)(x)
        raise ValueError("Not supported normalization function: " + self.normalizer)


class FusedInstanceNormRelu(nn.Module):
    """Instance-norm + ReLU as one op (eps 1e-6, full affine) so XLA fuses
    the normalize/affine/ReLU chain into one epilogue.

    OPT-IN ONLY (BOXSEG_PALLAS_IN_RELU=1 routes ConvNormAct here): measured
    at the flagship shapes, XLA's schedule on the standard Norm+ReLU pair is
    as fast at runtime and compiles ~2x faster on the remote TPU compiler,
    and the two-pass Pallas custom-VJP backward
    (ops/pallas_kernels.fused_instance_norm_relu, numerics verified exact) is
    slower than XLA's joint fwd+bwd (per-grid-step overheads exceed the
    recoverable traffic margin — see PERF.md). Kept as the validated
    experimentation surface."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if x.ndim == 4 and jax.default_backend() == "tpu":
            from boxsegliver_tpu.ops.pallas_kernels import \
                fused_instance_norm_relu
            return fused_instance_norm_relu(x, scale, bias)
        axes = tuple(range(1, x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=axes, keepdims=True)
        # fast variance (E[x²] − E[x]², one fusion — also what flax uses);
        # the naive two-pass var() doubled this model's remote compile time
        var = jnp.maximum((xf * xf).mean(axis=axes, keepdims=True)
                          - mean * mean, 0.0)
        # fold the norm into a per-channel affine and APPLY in x.dtype —
        # an f32 full-resolution apply doubles the HBM traffic of this
        # (bandwidth-bound) op and measurably slows the whole train step
        a = jax.lax.rsqrt(var + 1e-6) * scale
        b = bias - mean * a
        y = x * a.astype(x.dtype) + b.astype(x.dtype)
        return jnp.maximum(y, 0)


class ConvNormAct(nn.Module):
    """slim.conv2d equivalent: conv + (norm) + activation. Works for 2D/3D via
    kernel/stride tuples.  The instance_norm + ReLU pair compiles to the
    fused custom-VJP op (FusedInstanceNormRelu)."""
    features: int
    kernel: Tuple[int, ...] = (3, 3)
    strides: Tuple[int, ...] = (1, 1)
    dilation: int = 1
    normalizer: Optional[str] = "batch_norm"
    norm_bias: bool = True
    norm_scale: bool = True
    act: Optional[Callable] = nn.relu
    use_bias: Optional[bool] = None  # default: bias iff no normalizer
    weight_init: str = "xavier"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = self.use_bias
        if use_bias is None:
            use_bias = self.normalizer is None
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    kernel_dilation=(self.dilation,) * len(self.kernel),
                    padding="SAME", use_bias=use_bias,
                    kernel_init=get_kernel_init(self.weight_init),
                    dtype=self.dtype)(x)
        import os
        if (self.normalizer == "instance_norm" and self.act is nn.relu
                and self.norm_bias and self.norm_scale
                and os.environ.get("BOXSEG_PALLAS_IN_RELU") == "1"):
            # opt-in only: measured on the v5e tunnel, the flax path compiles
            # ~2x faster remotely and runs at the same speed (see PERF.md)
            return FusedInstanceNormRelu(dtype=self.dtype)(x)
        if self.normalizer is not None:
            x = Norm(self.normalizer, self.norm_bias, self.norm_scale,
                     dtype=self.dtype)(x, train=train)
        if self.act is not None:
            x = self.act(x)
        return x


class _DtsConvTranspose(nn.Module):
    """Param-holder twin of nn.ConvTranspose((2,2), strides (2,2), SAME)
    lowered as matmul + depth-to-space — the A/B arm for the upconv-backward
    experiment (BOXSEG_UPCONV_IMPL=dts).

    With kernel 2, stride 2, SAME padding, every output pixel receives
    exactly one kernel tap: out[2i+p, 2j+q] = x[i, j] @ k[1-p, 1-q]
    (lax.conv_transpose pads (1,1) around the 2x-dilated input and correlates
    without flipping — same phase identity _PackedConvTranspose pins).  So
    the transpose conv IS a 1x1 matmul to 4*features channels followed by a
    pixel-shuffle, whose backward is matmuls + one relayout instead of the
    standalone spatial `reverse` of each decode activation that XLA emits
    for the conv_transpose weight gradient (1.42 ms/step of the headline
    profile, profiles/ r4).  Param tree identical to nn.ConvTranspose
    (kernel [2,2,Cin,F] + bias [F])."""
    features: int
    use_bias: bool
    weight_init: str
    dtype: Optional[Dtype]

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        k = self.param("kernel", get_kernel_init(self.weight_init),
                       (2, 2, cin, self.features))
        # tap (1-p, 1-q) serves output phase (p, q); flip the 2x2 tap axes
        # with slice+concat so not even a (tiny) kernel `reverse` op appears
        kr = jnp.concatenate([k[1:], k[:1]], axis=0)
        kr = jnp.concatenate([kr[:, 1:], kr[:, :1]], axis=1)
        if self.dtype is not None:
            x, kr = x.astype(self.dtype), kr.astype(self.dtype)
        y = jnp.einsum("bhwc,pqco->bhpwqo", x, kr)
        y = y.reshape(b, 2 * h, 2 * w, self.features)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class UpConv(nn.Module):
    """slim.conv2d_transpose equivalent: transpose conv + ReLU, no norm
    (reference arg_scopes wrap normalizers around conv2d only)."""
    features: int
    kernel: Tuple[int, ...] = (2, 2)
    strides: Tuple[int, ...] = (2, 2)
    use_bias: bool = True
    act: Optional[Callable] = nn.relu
    weight_init: str = "xavier"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        if (self.kernel == (2, 2) and self.strides == (2, 2)
                and os.environ.get("BOXSEG_UPCONV_IMPL") == "dts"):
            x = _DtsConvTranspose(self.features, self.use_bias,
                                  self.weight_init, self.dtype,
                                  name="ConvTranspose_0")(x)
        else:
            x = nn.ConvTranspose(self.features, self.kernel,
                                 strides=self.strides,
                                 padding="SAME", use_bias=self.use_bias,
                                 kernel_init=get_kernel_init(self.weight_init),
                                 dtype=self.dtype)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class ChannelAffine(nn.Module):
    """Learnable channel-wise affine: x * gamma + beta
    (reference Backbone/slim_nets.py:152-212, alias `affine`)."""

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (ch,))
        beta = self.param("beta", nn.initializers.zeros, (ch,))
        return x * gamma.astype(x.dtype) + beta.astype(x.dtype)


class MLP(nn.Module):
    """slim_nets.mlp: hidden fully-connected+ReLU (+dropout), final linear
    layer with configurable init (reference Backbone/slim_nets.py:34-57)."""
    out_channels: Sequence[int]
    use_dropout: bool = False
    keep_prob: float = 0.5
    final_kernel_init: Callable = he_normal()
    final_bias_init: Callable = nn.initializers.zeros
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for ch in self.out_channels[:-1]:
            x = nn.Dense(ch, dtype=self.dtype)(x)
            x = nn.relu(x)
            if self.use_dropout:
                x = nn.Dropout(rate=1.0 - self.keep_prob,
                               deterministic=not train)(x)
        x = nn.Dense(self.out_channels[-1], kernel_init=self.final_kernel_init,
                     bias_init=self.final_bias_init, dtype=self.dtype)(x)
        return x


class VGG1D(nn.Module):
    """1-D VGG16-{B,C,D} over context vectors (reference slim_nets.py:60-149,
    used with conv1d/max_pooling1d by GUNet._context_subnets)."""
    variant: str  # vgg16B / vgg16C / vgg16D
    first_layer_channel: int
    out_channels: Sequence[int]
    use_dropout: bool = False
    keep_prob: float = 0.5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [bs, length, 1]
        def conv(v, ch, k):
            v = nn.Conv(ch, (k,), padding="SAME", dtype=self.dtype)(v)
            return nn.relu(v)

        def pool(v):
            return nn.max_pool(v, (2,), strides=(2,), padding="SAME")

        reps = {"vgg16B": (2, 2, 2, 2, 2), "vgg16C": (2, 2, 2, 2, 2),
                "vgg16D": (2, 2, 3, 3, 3)}[self.variant]
        mults = (1, 2, 4, 8, 8)
        for stage, (rep, mult) in enumerate(zip(reps, mults)):
            for _ in range(rep):
                x = conv(x, self.first_layer_channel * mult, 3)
            if self.variant == "vgg16C" and stage >= 2:
                x = conv(x, self.first_layer_channel * mult, 1)
            x = pool(x)
        x = x.reshape((x.shape[0], -1))
        # final MLP: zeros final weights + ones final biases → identity-like
        # modulation at init (reference GUNet.py:73-74)
        return MLP(self.out_channels, self.use_dropout, self.keep_prob,
                   final_kernel_init=nn.initializers.zeros,
                   final_bias_init=nn.initializers.ones,
                   dtype=self.dtype)(x, train=train)


class PatchCNN(nn.Module):
    """2-D conv encoder over multi-scale image-patch context pyramids
    [bs, 32, 32, n_scales] — the working consumer for the nf2/iin pipeline's
    patch context (reference DataLoader/NF/input_pipeline_iin.py builds the
    [32, 32, 3] pyramids but the reference model zoo never shipped a rank-4
    context model: GUNet's choices are fc / 1-D vgg / resnet-NotImplemented,
    NetworksV2/GUNet.py:50-78).  Three conv-conv-pool stages (32 -> 4) then
    global average pooling and the same final MLP convention as the fc path
    (he_normal final init, GUNet.py:57-58)."""
    first_layer_channel: int
    out_channels: Sequence[int]
    use_dropout: bool = False
    keep_prob: float = 0.5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for mult in (1, 2, 4):
            for _ in range(2):
                x = nn.Conv(self.first_layer_channel * mult, (3, 3),
                            padding="SAME", dtype=self.dtype)(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        x = jnp.mean(x, axis=(1, 2))
        return MLP(self.out_channels, self.use_dropout, self.keep_prob,
                   final_kernel_init=he_normal(),
                   dtype=self.dtype)(x, train=train)


def image_gradients(images: jnp.ndarray):
    """tf.image.image_gradients semantics for NHWC batches: dy[i]=x[i+1]-x[i]
    with a zero last row; dx analogous (used for --img_grad inputs)."""
    dy = jnp.concatenate(
        [images[:, 1:] - images[:, :-1], jnp.zeros_like(images[:, :1])], axis=1)
    dx = jnp.concatenate(
        [images[:, :, 1:] - images[:, :, :-1], jnp.zeros_like(images[:, :, :1])],
        axis=2)
    return dy, dx


def sobel_edges(images: jnp.ndarray):
    """tf.image.sobel_edges for a single-channel NHWC batch → [bs, h, w, 2]
    (dy, dx order), REFLECT padding like TF."""
    ky = jnp.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], jnp.float32)
    kx = ky.T
    x = jnp.pad(images, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    def conv2(img, k):
        kern = k[:, :, None, None]
        return jax.lax.conv_general_dilated(
            img, kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    gy = conv2(x, ky)
    gx = conv2(x, kx)
    return jnp.concatenate([gy, gx], axis=-1)


def predictions_from_logits(logits: jnp.ndarray, classes: Sequence[str]):
    """Predictions dict contract (reference UNet.py:103-118, GUNet.py:376-392):
    keys '<Class>Prob' (softmax prob) and '<Class>Pred' (prob > 0.5, uint8)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = {}
    for i, cls in enumerate(classes):
        if i == 0:
            continue  # Background
        p = probs[..., i:i + 1]
        out[cls + "Prob"] = p
        out[cls + "Pred"] = (p > 0.5).astype(jnp.uint8)
    return probs, out
