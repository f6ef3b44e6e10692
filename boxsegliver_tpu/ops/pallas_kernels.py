"""Pallas TPU kernels for hot data-path ops.

fused_instance_norm_relu: instance-norm + ReLU with a Pallas BACKWARD —
numerics verified exact against XLA autodiff on the real TPU (dx max err
1.4e-6).  HONEST MEASUREMENT (bench_fused_in_relu, v5e, amortized in-jit
loops): at [32, 256, 256, 64] bf16 the two-pass Pallas backward runs 11.0 ms
vs XLA's 6.8 ms joint fwd+bwd — XLA wins.  Why: the theoretical 3-pass
single-kernel design is blocked by the lane-dim block constraint (c=64 <
128), the legal h-tiled two-kernel scheme pays 5 passes plus ~512 small grid
steps of per-step overhead, and XLA's own schedule is already within ~4.7× of
the traffic bound.  models/layers.FusedInstanceNormRelu therefore defaults to
the XLA path and routes here only under BOXSEG_PALLAS_IN_RELU=1; the kernels
remain as the validated custom-VJP reference pattern.

gaussian_guide_batch: fused max-over-objects Gaussian spatial-guide rendering
(the per-step guide pass of the guided pipelines, reference
utils/image_ops.py:396-434 create_spatial_guide_2d).  The K-object loop runs
in registers over one [H, W] VMEM tile, bounding HBM traffic at O(H·W)
regardless of K.  Honest measurement note: XLA's fusion achieves the same
bound (amortized benchmark shows parity), so this kernel is the repo's Pallas
reference pattern, not a speedup.

Falls back to interpret mode off-TPU so tests run on the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Fused instance-norm + ReLU with Pallas backward
# ---------------------------------------------------------------------------

_IN_EPS = 1e-6  # tf.contrib instance_norm default (models/layers.Norm)


def _in_relu_fwd_impl(x, scale, bias):
    """XLA forward (measured at 0.99 of its bandwidth bound): returns y and
    the residuals (x_hat bf16, rstd f32)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = xf.var(axis=(1, 2), keepdims=True)
    rstd = jax.lax.rsqrt(var + _IN_EPS)
    x_hat = (xf - mean) * rstd
    z = x_hat * scale + bias
    y = jnp.maximum(z, 0.0)
    return y.astype(x.dtype), x_hat.astype(x.dtype), rstd[..., 0, 0, :]


def _bwd_stats_kernel(g_ref, xh_ref, scale_ref, bias_ref, s1_ref, s2_ref):
    """Grid (bs, nh): accumulate per-(sample, channel) Σgz and Σgz·x̂ over
    h-tiles (gz = upstream grad masked by the ReLU, recomputed from x̂)."""
    h = pl.program_id(1)

    @pl.when(h == 0)
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    xh = xh_ref[0].astype(jnp.float32)                      # [TH, W, C]
    g = g_ref[0].astype(jnp.float32)
    z = xh * scale_ref[0, 0] + bias_ref[0, 0]
    gz = jnp.where(z > 0.0, g, 0.0)
    s1_ref[0, 0] += jnp.sum(gz, axis=(0, 1))
    s2_ref[0, 0] += jnp.sum(gz * xh, axis=(0, 1))


def _bwd_apply_kernel(g_ref, xh_ref, scale_ref, bias_ref, rstd_ref,
                      s1_ref, s2_ref, dx_ref, *, hw: int):
    """Grid (bs, nh): dx = γ·rstd·(gz − Σgz/HW − x̂·Σgz·x̂/HW)."""
    xh = xh_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    z = xh * scale_ref[0, 0] + bias_ref[0, 0]
    gz = jnp.where(z > 0.0, g, 0.0)
    m1 = s1_ref[0, 0] * (1.0 / hw)
    m2 = s2_ref[0, 0] * (1.0 / hw)
    dx = (scale_ref[0, 0] * rstd_ref[0, 0]) * (gz - m1 - xh * m2)
    dx_ref[0] = dx.astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _in_relu_bwd_pallas(g, x_hat, rstd, scale, bias, interpret=False):
    """Two Pallas passes (stats reduce, dx apply) = 5 HBM tensor passes.

    The 3-pass single-kernel design (complete stats per channel slice) is
    blocked by the Mosaic constraint that the lane-dim block must equal the
    channel count or a multiple of 128 — a full-channel (h, w) plane plus its
    f32 intermediates does not fit VMEM at the flagship shapes."""
    bs, h, w, c = g.shape
    # ≤ ~512 KB bf16 per operand tile: the kernel's f32 intermediates live on
    # the Mosaic VMEM stack at 2× the tile bytes each, so small tiles keep the
    # double-buffered pipeline + stack inside the 16 MB VMEM budget
    th = max(8, min(h, (512 * 1024) // max(w * c * 2, 1)))
    while h % th:
        th -= 1
    nh = h // th
    tile = pl.BlockSpec((1, th, w, c), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, 1, c), lambda b, i: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    bvec = pl.BlockSpec((1, 1, c), lambda b, i: (b, 0, 0),
                        memory_space=pltpu.VMEM)

    s1, s2 = pl.pallas_call(
        _bwd_stats_kernel,
        grid=(bs, nh),
        in_specs=[tile, tile, vec, vec],
        out_specs=(bvec, bvec),
        out_shape=(jax.ShapeDtypeStruct((bs, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((bs, 1, c), jnp.float32)),
        interpret=interpret,
    )(g, x_hat, scale.reshape(1, 1, c), bias.reshape(1, 1, c))

    dx = pl.pallas_call(
        functools.partial(_bwd_apply_kernel, hw=h * w),
        grid=(bs, nh),
        in_specs=[tile, tile, vec, vec, bvec, bvec, bvec],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct(g.shape, g.dtype),
        interpret=interpret,
    )(g, x_hat, scale.reshape(1, 1, c), bias.reshape(1, 1, c),
      rstd.reshape(bs, 1, c), s1, s2)

    # dγ[c] = Σ_b Σ_hw gz·x̂, dβ[c] = Σ_b Σ_hw gz (tiny [bs, c] reduction)
    return dx, s2[:, 0].sum(axis=0), s1[:, 0].sum(axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_instance_norm_relu(x, scale, bias):
    """relu(instance_norm(x) * scale + bias) over [bs, h, w, c].

    Forward math identical to models/layers.Norm('instance_norm') + ReLU
    (eps 1e-6); backward runs the fused Pallas kernels on TPU (interpret mode
    elsewhere)."""
    y, _, _ = _in_relu_fwd_impl(x, scale, bias)
    return y


def _fused_fwd(x, scale, bias):
    y, x_hat, rstd = _in_relu_fwd_impl(x, scale, bias)
    return y, (x_hat, rstd, scale, bias)


def _fused_bwd(res, g):
    x_hat, rstd, scale, bias = res
    dx, dscale, dbias = _in_relu_bwd_pallas(
        g.astype(x_hat.dtype), x_hat, rstd, scale.astype(jnp.float32),
        bias.astype(jnp.float32), interpret=not _on_tpu())
    return (dx.astype(x_hat.dtype), dscale.astype(scale.dtype),
            dbias.astype(bias.dtype))


fused_instance_norm_relu.defvjp(_fused_fwd, _fused_bwd)


def bench_fused_in_relu(bs: int = 32, h: int = 256, w: int = 256, c: int = 64,
                        iters: int = 24, reps: int = 3) -> dict:
    """Measure XLA vs Pallas-backward instance-norm+ReLU at a given shape on
    the current backend (amortized in-jit chains; run on the real TPU).
    Returns ms/op for both backward paths and the speedup."""
    import time

    import numpy as np

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(bs, h, w, c), jnp.bfloat16)
    g = jnp.asarray(rng.randn(bs, h, w, c), jnp.bfloat16)
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)

    def ref_op(x, scale, bias):
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=(1, 2), keepdims=True)
        var = xf.var(axis=(1, 2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + _IN_EPS) * scale + bias
        return jnp.maximum(y, 0.0).astype(x.dtype)

    def chain(op):
        # NB: g must be an ARGUMENT of the jitted loop — a closure capture
        # becomes a 268 MB HLO constant (rejected by the remote compiler)
        def loss(xx, gg):
            return jnp.sum(op(xx, scale, bias).astype(jnp.float32)
                           * gg.astype(jnp.float32))
        grad = jax.grad(loss, argnums=0)

        @jax.jit
        def loop(xx, gg):
            def body(i, acc):
                return grad(acc, gg).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, iters, body, xx)
        return loop

    def timed(fn):
        out = fn(x, g)
        jax.device_get(out.ravel()[:4])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(x, g)
            jax.device_get(out.ravel()[:4])
            best = min(best, time.perf_counter() - t0)
        return best / iters

    t_xla = timed(chain(ref_op))
    t_pl = timed(chain(fused_instance_norm_relu))
    return {"xla_bwd_ms": round(t_xla * 1e3, 3),
            "pallas_bwd_ms": round(t_pl * 1e3, 3),
            "speedup": round(t_xla / t_pl, 3)}


def _guide_kernel(moments_ref, out_ref, *, max_objs: int):
    """One grid step = one sample.  Block shapes carry a leading 1:
    moments [1, K, 8] = (cy, cx, sy, sx, n_objs, pad...) in VMEM,
    out [1, H, W] in VMEM.  n_objs rides in lane 4 (SMEM scalar blocks must
    tile to (8, 128), so scalars travel in the VMEM block instead)."""
    h, w = out_ref.shape[1], out_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    n = moments_ref[0, 0, 4]

    def body(k, acc):
        cy = moments_ref[0, k, 0]
        cx = moments_ref[0, k, 1]
        sy = moments_ref[0, k, 2]
        sx = moments_ref[0, k, 3]
        inv2sy = 0.5 / jnp.maximum(sy * sy, 1e-12)
        inv2sx = 0.5 / jnp.maximum(sx * sx, 1e-12)
        g = jnp.exp(-((rows - cy) ** 2 * inv2sy + (cols - cx) ** 2 * inv2sx))
        valid = (k.astype(jnp.float32) < n).astype(jnp.float32)
        return jnp.maximum(acc, g * valid)

    out = jax.lax.fori_loop(0, max_objs, body, jnp.zeros((h, w), jnp.float32))
    out_ref[0] = jnp.clip(out, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("height", "width", "interpret"))
def gaussian_guide_batch(centers: jnp.ndarray, stddevs: jnp.ndarray,
                         n_objs: jnp.ndarray, *, height: int, width: int,
                         interpret: bool = False) -> jnp.ndarray:
    """Batched fused guide render.

    centers/stddevs: [bs, K, 2] float32 (ij order), n_objs: [bs] int32.
    Returns [bs, height, width, 1] in [0, 1]; all-zero for samples with
    n_objs == 0 (callers remap to [0.5, 1] via guides.to_guided_range).
    """
    bs, k = centers.shape[0], centers.shape[1]
    nobj = jnp.broadcast_to(
        n_objs.astype(jnp.float32)[:, None, None], (bs, k, 1))
    moments = jnp.concatenate([
        centers.astype(jnp.float32), stddevs.astype(jnp.float32),
        nobj, jnp.zeros((bs, k, 3), jnp.float32)], axis=-1)  # [bs, K, 8]

    out = pl.pallas_call(
        functools.partial(_guide_kernel, max_objs=k),
        grid=(bs,),
        in_specs=[
            pl.BlockSpec((1, k, 8), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, height, width), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, height, width), jnp.float32),
        interpret=interpret,
    )(moments)
    return out[..., None]


def gaussian_guide_auto(centers, stddevs, n_objs, *, height: int, width: int):
    """Dispatch: Pallas on TPU, interpret-mode elsewhere (tests/CPU mesh)."""
    on_tpu = jax.default_backend() == "tpu"
    return gaussian_guide_batch(centers, stddevs, n_objs, height=height,
                                width=width, interpret=not on_tpu)
