"""Spatial-guide rendering: Gaussian / Euclidean distance maps from click or
object-moment priors.

TPU-native re-design of the reference guide ops:
- create_spatial_guide_2d / _3d    reference utils/image_ops.py:396-472
- create_gaussian_distribution(_v2) reference utils/array_kits.py:443-486

The reference uses ragged [n, 2] center lists (n = #tumors in a slice varies).
On TPU we pad to a static maximum object count and mask: padding rows use
center = stddev = -1 exactly like the reference's padding convention
(image_ops.py:417 "-1s in center and stddev are padding value"), but we mask
them out explicitly instead of relying on exp() underflow.
"""

from __future__ import annotations

import jax.numpy as jnp

# Guide images of empty slices are all-background. The guided pipelines remap
# guides into [0.5, 1] with background 0.5 (reference input_pipeline_g.py:382-394).
GUIDE_BG = 0.5


def _coord_grid(shape):
    """Stack of index coordinates, shape [*shape, ndim]."""
    coords = [jnp.arange(s, dtype=jnp.float32) for s in shape]
    return jnp.stack(jnp.meshgrid(*coords, indexing="ij"), axis=-1)


def gaussian_guide(shape, centers, stddevs, mask=None, keepdims: bool = True):
    """Max-over-objects Gaussian guide (reference image_ops.py:396-434, ij indexing).

    Parameters
    ----------
    shape: static tuple of ints, e.g. (h, w) or (d, h, w)
    centers: [n, ndim] float array; padded rows may be -1
    stddevs: [n, ndim] float array; padded rows may be -1 (never 0 for valid rows)
    mask: optional [n] bool array marking valid objects; default: center[:, 0] >= 0

    Returns [*, 1] guide in [0, 1] if keepdims else [*]; all-zero when no object.
    """
    centers = jnp.asarray(centers, jnp.float32)
    stddevs = jnp.asarray(stddevs, jnp.float32)
    if mask is None:
        mask = centers[:, 0] >= 0.0
    ndim = len(shape)
    coords = _coord_grid(shape)                                   # [*shape, ndim]
    c = centers.reshape((-1,) + (1,) * ndim + (ndim,))            # [n, 1.., ndim]
    s = stddevs.reshape((-1,) + (1,) * ndim + (ndim,))
    s = jnp.where(s == 0.0, 1e-6, s)
    normalizer = 2.0 * s * s
    d = jnp.exp(-jnp.sum((coords[None] - c) ** 2 / normalizer, axis=-1))  # [n, *shape]
    d = jnp.where(mask.reshape((-1,) + (1,) * ndim), d, 0.0)
    out = jnp.max(d, axis=0) if centers.shape[0] > 0 else jnp.zeros(shape, jnp.float32)
    out = jnp.clip(out, 0.0, 1.0)
    return out[..., None] if keepdims else out


def euclidean_guide(shape, centers, mask=None, keepdims: bool = True,
                    weights=None):
    """Min-over-objects Euclidean distance map (reference image_ops.py:427-429).

    weights: optional [ndim] per-axis multipliers applied to coordinate
    differences.  The reference renders click guides at the (dynamic) crop
    resolution and bilinear-resizes the distance map to the target size
    (NF/input_pipeline_g_simply.py:435-527); with centers pre-scaled to target
    coordinates and weights = crop/target, this static-shape render reproduces
    those crop-unit distance values exactly.
    """
    centers = jnp.asarray(centers, jnp.float32)
    if mask is None:
        mask = centers[:, 0] >= 0.0
    ndim = len(shape)
    coords = _coord_grid(shape)
    c = centers.reshape((-1,) + (1,) * ndim + (ndim,))
    diff = coords[None] - c
    if weights is not None:
        diff = diff * jnp.asarray(weights, jnp.float32).reshape(
            (1,) + (1,) * ndim + (ndim,))
    d = jnp.sqrt(jnp.sum(diff ** 2, axis=-1))                     # [n, *shape]
    big = jnp.asarray(sum(s**2 for s in shape), jnp.float32)
    d = jnp.where(mask.reshape((-1,) + (1,) * ndim), d, big)
    out = jnp.min(d, axis=0)
    return out[..., None] if keepdims else out


def gaussian_guide_2d(shape, centers, stddevs, mask=None):
    """2D convenience wrapper returning [h, w, 1] (reference image_ops.py:396-434)."""
    return gaussian_guide(tuple(shape), centers, stddevs, mask=mask)


def gaussian_guide_3d(shape, centers, stddevs, mask=None):
    """3D convenience wrapper returning [d, h, w, 1] (reference image_ops.py:437-472)."""
    return gaussian_guide(tuple(shape), centers, stddevs, mask=mask)


def to_guided_range(guide, background: float = GUIDE_BG):
    """Remap a [0,1] guide to [background, 1] (reference input_pipeline_g.py:382-394)."""
    return guide * (1.0 - background) + background


def local_enhance_guide(shape, centers, stddevs, mask=None, enhance: float = 1.0):
    """Gaussian guide used as additive local enhancement (NF pipelines).

    Same rendering as gaussian_guide but scaled by `enhance` instead of being
    remapped to [0.5, 1] (reference NF/input_pipeline_g_simply.py:447-496).
    """
    return gaussian_guide(tuple(shape), centers, stddevs, mask=mask) * enhance


def moments_from_mask(binary: jnp.ndarray, min_std: float = 0.0):
    """Device-side robust moments of a single binary object: median center +
    1.4826*MAD stddev (reference utils/array_kits.py:387-440, indexing='ij').

    Works on a fixed-shape mask; returns (-1, -1) vectors when empty. Medians
    are computed with sort-based quantiles over masked coordinates, keeping the
    whole interactive guide-propagation loop jittable.
    """
    ndim = binary.ndim
    coords = _coord_grid(binary.shape)                            # [*shape, ndim]
    flat_mask = binary.reshape(-1) > 0
    flat_coords = coords.reshape(-1, ndim)
    n = jnp.sum(flat_mask)

    def masked_median(vals, mask_, count):
        # median over selected entries: sort with invalid entries pushed to +inf
        big = jnp.float32(1e9)
        v = jnp.where(mask_, vals, big)
        v = jnp.sort(v)
        lo = jnp.maximum((count - 1) // 2, 0)
        hi = count // 2
        return (v[lo] + v[hi]) / 2.0

    center = jnp.stack([masked_median(flat_coords[:, d], flat_mask, n)
                        for d in range(ndim)])
    diff = jnp.abs(flat_coords - center)
    mad = jnp.stack([masked_median(diff[:, d], flat_mask, n) for d in range(ndim)])
    std = jnp.maximum(1.4826 * mad, min_std)
    empty = n == 0
    center = jnp.where(empty, -jnp.ones(ndim), center)
    std = jnp.where(empty, -jnp.ones(ndim), std)
    return center, std
