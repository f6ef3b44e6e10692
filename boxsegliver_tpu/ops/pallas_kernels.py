"""Pallas TPU kernels for hot data-path ops.

gaussian_guide_batch: fused max-over-objects Gaussian spatial-guide rendering
(the per-step guide pass of the guided pipelines, reference
utils/image_ops.py:396-434 create_spatial_guide_2d).  The K-object loop runs
in registers over one [H, W] VMEM tile, bounding HBM traffic at O(H·W)
regardless of K (the jnp formulation nominally materializes [K, H, W];
XLA's fusion usually also avoids that, and on the dev tunnel the two measure
at parity for K≤128 — this kernel pins the bound explicitly and serves as
the repo's Pallas reference pattern).

Falls back to interpret mode off-TPU so tests run on the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
