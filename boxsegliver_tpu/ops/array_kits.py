"""Host-side numpy/scipy array utilities (sampling-time and eval-time helpers).

Re-implements the reference utils/array_kits.py surface that the pipelines and
evaluators depend on. Device-side twins of the guide renderers live in
ops/guides.py; these host versions are used by offline preprocessing and the
stateful interactive-eval loop.

Citations are reference utils/array_kits.py lines:
- bbox_from_mask            :85-232
- extract_region            :263-329
- find_empty_slices         :332-354
- get_largest_component     :357-384
- compute_robust_moments    :387-440
- create_gaussian_distribution(_v2) :443-486
- get_gd_image_single_obj / multi_objs :489-691
- zscore / augment_gamma numpy twins   :31-53
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Sequence, Tuple

import numpy as np
from scipy import ndimage as ndi


def zscore(img: np.ndarray) -> np.ndarray:
    """Z-score over non-zero region (reference array_kits.py:31-40)."""
    mask = img > 0
    if not np.any(mask):
        return img.astype(np.float32)
    vals = img[mask]
    mean, std = vals.mean(), vals.std()
    out = (img - mask * mean) / (mask * std + 1e-8)
    return out.astype(np.float32)


def augment_gamma(image: np.ndarray, gamma_range: Tuple[float, float],
                  retain_stats: bool = False, p_per_sample: float = 1.0,
                  epsilon: float = 1e-7, rng: Optional[np.random.RandomState] = None):
    """Numpy twin of gamma augmentation (reference array_kits.py:43-53)."""
    rng = rng or np.random
    if retain_stats:
        mn, sd = image.mean(), image.std()
    if rng.uniform() < p_per_sample:
        gamma = rng.uniform(gamma_range[0], 1.0)
    else:
        gamma = rng.uniform(1.0, gamma_range[1])
    minm = image.min()
    rnge = image.max() - minm
    new_image = np.power((image - minm) / (rnge + epsilon), gamma) * rnge + minm
    if retain_stats:
        new_image = (new_image - new_image.mean() + mn) / (new_image.std() + 1e-8) * sd
    return new_image


def merge_labels(labels: np.ndarray, merges: Sequence) -> np.ndarray:
    """Map label values into compact classes (reference array_kits.py:56-82).

    merges[i] is an int or list of ints mapped to output value i. A value of -1
    at position i maps *all remaining* values to i (used by largest-CC).
    """
    out = np.zeros_like(labels, dtype=np.int8)
    remaining = np.ones_like(labels, dtype=bool)
    rest_idx = None
    for i, m in enumerate(merges):
        if isinstance(m, int) and m == -1:
            rest_idx = i
            continue
        vals = [m] if isinstance(m, int) else list(m)
        sel = np.isin(labels, vals)
        out[sel] = i
        remaining &= ~sel
    if rest_idx is not None:
        out[remaining] = rest_idx
    return out


def bbox_from_mask(mask: np.ndarray, mask_values, min_shape=None, padding=None):
    """Bounding box (x1, y1[, z1], x2, y2[, z2]) from mask (reference :85-232).

    Coordinates are in reversed-axis (x first) order and are INCLUSIVE at both
    ends (`x2 - x1 + 1` is the width).
    """
    ndim = mask.ndim
    if not np.count_nonzero(mask):
        return np.zeros(2 * ndim, np.int64)
    if min_shape is not None:
        assert len(min_shape) == ndim
    values = np.atleast_1d(mask_values)

    lo_rev, hi_rev = [], []
    for axis in range(ndim - 1, -1, -1):  # x first
        other = tuple(a for a in range(ndim) if a != axis)
        # reference semantics: a slab counts when its MAX is one of the
        # selected values (a higher label shadows lower ones, :96-99)
        hits = np.flatnonzero(np.isin(mask.max(axis=other), values))
        lo_rev.append(int(hits[0]))
        hi_rev.append(int(hits[-1]))
    bbox = np.asarray(lo_rev + hi_rev, np.int64)

    frame_rev = np.asarray(mask.shape[::-1])
    if padding is not None:
        grow = np.asarray(padding if np.ndim(padding) else [padding] * ndim)
        bbox[:ndim] = np.clip(bbox[:ndim] - grow, 0, None)
        bbox[ndim:] = np.clip(bbox[ndim:] + grow, None, frame_rev - 1)
    elif min_shape is not None:
        deficit = np.clip(np.asarray(min_shape[::-1])
                          - (bbox[ndim:] - bbox[:ndim] + 1), 0, None)
        bbox[:ndim] = np.clip(bbox[:ndim] - deficit // 2, 0, None)
        bbox[ndim:] = np.clip(bbox[ndim:] + (deficit - deficit // 2), None,
                              frame_rev - 1)
    return bbox


def bbox_to_slices(bbox) -> Tuple[slice, ...]:
    """Convert (x1, y1[, z1], x2, y2[, z2]) to numpy slices in array order."""
    bbox = np.asarray(bbox)
    ndim = len(bbox) // 2
    return tuple(slice(int(bbox[ndim - 1 - d]), int(bbox[2 * ndim - 1 - d]) + 1)
                 for d in range(ndim))


def extract_region(mask: np.ndarray, align=1, padding=0, min_bbox_shape=None):
    """Aligned sub-region bbox around a mask (semantics of reference
    array_kits.py:263-329): pad the tight bbox, round its extent up to the
    alignment, center the aligned window on the padded bbox, and shift it
    back inside the frame when it overflows."""
    mask = np.asarray(mask, bool)
    ndim = mask.ndim
    align = np.asarray((align,) * ndim if isinstance(align, int) else align,
                       np.int32)
    tight = bbox_from_mask(mask, mask_values=1,
                           min_shape=((1,) * ndim if min_bbox_shape is None
                                      else min_bbox_shape)[::-1])

    frame_rev = np.asarray(mask.shape[::-1])
    start = np.clip(tight[:ndim] - padding, 0, None).astype(np.int64)
    stop = np.clip(tight[ndim:] + padding, None, frame_rev - 1).astype(np.int64)

    extent = -(-(stop - start + 1) // align) * align   # round up to align
    center = (start + stop) / 2
    a1 = np.clip((center - (extent - 1) / 2).astype(np.int32), 0, None)
    a2 = np.minimum(frame_rev - 1, a1 + extent - 1)
    if ((a2 - a1 + 1) % align).any():                  # overflowed: shift back
        a1 = a2 + 1 - extent
    return np.concatenate((a1, a2))


def find_empty_slices(src_image: np.ndarray, axis: int = 0, empty_value=0):
    """Boolean vector of all-empty slices along axis (reference :332-354)."""
    axes = tuple(a for a in range(src_image.ndim) if a != axis)
    return np.all(src_image == empty_value, axis=axes)


def get_largest_component(inputs: np.ndarray, rank: int, connectivity: int = 1):
    """Largest connected component as int8 mask (reference :357-384)."""
    struct = ndi.generate_binary_structure(rank, connectivity)
    res = inputs.astype(bool)
    if np.count_nonzero(res) == 0:
        return np.zeros_like(inputs, dtype=np.int8)
    labeled_res, _ = ndi.label(res, struct)
    areas = np.bincount(labeled_res.flat)[1:]
    largest = int(np.argmax(areas)) + 1
    return (labeled_res == largest).astype(np.int8)


# MAD → stddev consistency factor for normal data (the reference hard-codes
# the same constant, :387-440); parity pinned by tests/test_golden.py.
_MAD_TO_STD = 1.4826


def compute_robust_moments(binary_image: np.ndarray, isotropic: bool = False,
                           indexing: str = "ij", min_std: float = 0.0):
    """Outlier-robust object moments: median center and MAD-derived stddev
    per axis (semantics of reference :387-440).  Empty masks yield (-1, -1)
    vectors — the padding convention the guide renderers mask out."""
    if indexing not in ("ij", "xy", "", None):
        raise ValueError("Valid values for `indexing` are 'xy' and 'ij'.")
    ndim = binary_image.ndim
    pts = np.argwhere(binary_image).astype(np.float32)      # [n, ndim], ij
    if not len(pts):
        empty = np.full(ndim, -1.0, np.float32)
        return empty, empty.copy()
    center = np.median(pts, axis=0).astype(np.float32)
    if isotropic:
        radial = np.linalg.norm(pts - center, axis=1)
        mad = np.full(ndim, np.median(radial), np.float32)
    else:
        mad = np.median(np.abs(pts - center), axis=0)
    std = np.maximum(_MAD_TO_STD * mad, min_std).astype(np.float32)
    if indexing == "ij":
        return center, std
    return center[::-1], std[::-1]                           # xy order


def _index_grid(shape, indexing: str = "ij") -> np.ndarray:
    """[*shape, ndim] stack of per-axis indices (float32)."""
    axes = [np.arange(s, dtype=np.float32) for s in shape]
    return np.stack(np.meshgrid(*axes, indexing=indexing), axis=-1)


def create_gaussian_distribution(shape, center, stddev):
    """Single Gaussian bump; center/stddev given in xy order
    (semantics of reference :443-449)."""
    center = np.asarray(center, np.float32)[::-1]            # → ij
    stddev = np.asarray(stddev, np.float32)[::-1]
    sq = ((_index_grid(shape) - center) / stddev) ** 2
    return np.clip(np.exp(-0.5 * sq.sum(axis=-1)), 0.0, 1.0).astype(np.float32)


def create_gaussian_distribution_v2(shape, centers, stddevs=None, indexing="ij",
                                    keepdims=False, euclidean=False):
    """Multi-object map: max-over-objects Gaussian, or min-over-objects
    Euclidean distance when `euclidean` (semantics of reference :452-486).
    centers/stddevs: [n, ndim] in `indexing` order."""
    centers = np.asarray(centers, np.float32)
    assert centers.ndim == 2, centers.shape
    n, ndim = centers.shape
    grid = _index_grid(shape, indexing)[None]                # [1, *shape, ndim]
    per_obj = (n,) + (1,) * ndim + (ndim,)
    diff = grid - centers.reshape(per_obj)                   # [n, *shape, ndim]
    if euclidean:
        dist = np.sqrt((diff ** 2).sum(axis=-1, keepdims=keepdims))
        return dist.min(axis=0)
    stddevs = np.asarray(stddevs, np.float32).reshape(per_obj)
    expo = (0.5 * (diff / stddevs) ** 2).sum(axis=-1, keepdims=keepdims)
    return np.exp(-expo).max(axis=0)


def perturbed_moments(mask, rng, center_perturb: float = 0.0,
                      stddev_perturb: float = 0.0, min_std: float = 0.0,
                      indexing: str = "ij"):
    """Robust moments with training-time jitter: the center moves by up to
    ±center_perturb stddevs, the stddev scales within
    [1/(1+p), 1+p] (perturbation model of reference :489-569)."""
    center, std = compute_robust_moments(mask, indexing=indexing,
                                         min_std=min_std)
    ndim = mask.ndim
    jitter = rng.uniform(-center_perturb, center_perturb, ndim)
    scale = rng.uniform(1.0 / (1.0 + stddev_perturb), 1.0 + stddev_perturb,
                        ndim)
    return center + jitter * std, std * scale


def _guide_slice_of(labels, partial_slice: str) -> int:
    """z index carrying the guide when only one slice is annotated."""
    zs = np.flatnonzero(labels.reshape(labels.shape[0], -1).any(axis=1))
    return int(zs[0] if partial_slice == "first" else zs[(len(zs) - 1) // 2])


def get_gd_image_single_obj(labels, center_perturb=0.2, stddev_perturb=0.4,
                            blank_prob=0, partial=False, partial_slice="first",
                            only_moments=False, min_std=0.0, indexing="ij",
                            keepdims=False, rng=None):
    """Perturbed Gaussian guide for one binary object (semantics of reference
    :489-569).  partial=True annotates only the first/middle slice of a 3D
    object.  Returns gd (or (gd, center, std); or (slice_idx, center, std)
    with only_moments)."""
    rng = rng or np.random
    if partial_slice not in ("first", "middle"):
        raise ValueError(f"Only support `first` and `middle`, got {partial_slice}")
    labels = np.asarray(labels, dtype=np.float32)
    if partial and labels.ndim != 3:
        raise ValueError("If `partial` is True, `labels` must have rank 3")
    if not labels.any() or rng.uniform() < blank_prob:
        return np.zeros(labels.shape)

    z = _guide_slice_of(labels, partial_slice) if partial else -1
    plane = labels[z] if partial else labels
    center, std = perturbed_moments(plane, rng, center_perturb,
                                    stddev_perturb, min_std, indexing)
    if only_moments:
        return z, center, std

    bump = create_gaussian_distribution_v2(plane.shape, [center], [std],
                                           indexing=indexing,
                                           keepdims=keepdims)
    if partial:
        out = np.zeros_like(labels, dtype=np.float32)
        out[z] = bump
        return out, center, std
    return bump, center, std


def _random_fake_guides(labels, stds, rng, fake_rate, max_fakes,
                        fake_range_value):
    """Decoy Gaussian bumps over non-object territory (reference :617-640):
    count ∝ fake_rate · #objects, stddevs drawn between min(std)/2 and
    max(std) of the real objects."""
    count = min(int(fake_rate * len(stds)), max_fakes)
    if count <= 0:
        return []
    candidates = np.argwhere(labels == fake_range_value)
    if not len(candidates):
        return []
    lo, hi = np.min(stds) / 2.0, np.max(stds)
    fakes = []
    for _ in range(count):
        center_ij = candidates[rng.randint(0, len(candidates))]
        stddev = (lo + rng.uniform() * (hi - lo), lo + rng.uniform() * (hi - lo))
        fakes.append(create_gaussian_distribution(labels.shape,
                                                  center_ij[::-1], stddev))
    return fakes


def get_gd_image_multi_objs(labels, obj_value=1, center_perturb=0.0,
                            stddev_perturb=0.0, blank_prob=0, connectivity=1,
                            partial=False, with_fake_guides=False, fake_rate=1.0,
                            max_fakes=4, fake_range_value=0, ret_bbox=False,
                            partial_slice="first", keepdims=False, min_std=0.0,
                            rng=None, **kwargs):
    """Max-merged perturbed Gaussian guides over every connected object, with
    optional decoy guides (semantics of reference :572-691)."""
    rng = rng or np.random
    labels = np.asarray(labels, dtype=np.uint32)
    if not labels.any():
        return np.zeros(labels.shape)

    binary = merge_labels(labels, [0, obj_value])
    struct = ndi.generate_binary_structure(labels.ndim, connectivity)
    components, n_objs = ndi.label(binary, structure=struct)

    guides, obj_stds = [], []
    for i in range(1, n_objs + 1):
        gd, _, std = get_gd_image_single_obj(
            components == i, center_perturb, stddev_perturb, blank_prob,
            partial, partial_slice, keepdims=keepdims, min_std=min_std,
            rng=rng)
        guides.append(gd)
        obj_stds.append(std)

    if with_fake_guides:
        guides += _random_fake_guides(labels, obj_stds, rng, fake_rate,
                                      max_fakes, fake_range_value)
    if not guides:
        return np.zeros(labels.shape)
    merged = functools.reduce(np.maximum, guides)

    if ret_bbox:
        bboxes = [bbox_from_mask(components == i, 1, **kwargs)
                  for i in range(1, n_objs + 1)]
        return merged, bboxes
    return merged


def get_moments_multi_objs(labels, obj_value=1, blank_prob=0, connectivity=1,
                           partial=False, partial_slice="middle", indexing="ij",
                           min_std=0.0, rng=None):
    """Moments (center/std) per connected object (semantics of reference
    :694-777)."""
    rng = rng or np.random
    labels = np.asarray(labels, dtype=np.uint32)
    if not labels.any():
        return [], []
    binary = merge_labels(labels, [0, obj_value])
    struct = ndi.generate_binary_structure(labels.ndim, connectivity)
    components, n_objs = ndi.label(binary, structure=struct)
    centers, stds = [], []
    for i in range(1, n_objs + 1):
        res = get_gd_image_single_obj(
            components == i, 0.0, 0.0, blank_prob, partial, partial_slice,
            only_moments=True, min_std=min_std, indexing=indexing, rng=rng)
        if isinstance(res, tuple):
            _, center, std = res
            centers.append(center)
            stds.append(std)
    return centers, stds


def pad_moments(centers: List, stds: List, max_objs: int, ndim: int = 2):
    """Pad ragged moment lists to static [max_objs, ndim] arrays with -1
    (TPU static-shape convention; see ops/guides.py)."""
    c = -np.ones((max_objs, ndim), np.float32)
    s = -np.ones((max_objs, ndim), np.float32)
    n = min(len(centers), max_objs)
    for i in range(n):
        c[i] = centers[i]
        s[i] = stds[i]
    return c, s


# ---------------------------------------------------------------------------
# Guide-aware false-positive filtering (reference utils/array_kits.py:987-1139)
# ---------------------------------------------------------------------------

def xiaolinwu_line(x0: int, y0: int, x1: int, y1: int):
    """Integer pixel chain of Xiaolin Wu's line between two points
    (reference utils/array_kits.py:1078-1139; used by the guide-propagation
    monotone-ascent test).  Returns (xs, ys, forward)."""
    if x0 == x1 and y0 == y1:
        raise ValueError(f"Must be different points, got ({x0},{y0}) twice")
    steep = abs(y1 - y0) > abs(x1 - x0)
    if steep:
        x0, y0, x1, y1 = y0, x0, y1, x1
    forward = True
    if x0 > x1:
        forward = False
        x0, x1 = x1, x0
        y0, y1 = y1, y0
    dx, dy = x1 - x0, y1 - y0
    gradient = dy / dx if dx else 1.0

    xs, ys = [], []

    def emit(px, py):
        if steep:
            xs.append(py)
            ys.append(px)
        else:
            xs.append(px)
            ys.append(py)

    xend = round(x0)
    yend = y0 + gradient * (xend - x0)
    emit(xend, math.floor(yend))
    intery = yend + gradient
    xend2 = round(x1)
    yend2 = y1 + gradient * (xend2 - x1)
    for x in range(round(x0) + 1, xend2):
        emit(x, math.floor(intery))
        intery += gradient
    emit(xend2, math.floor(yend2))
    return xs, ys, forward


def ascent_line(img: np.ndarray, x0: int, y0: int, x1: int, y1: int) -> bool:
    """True when img values along the line (x0,y0)→(x1,y1) are monotonically
    non-decreasing (reference EvalImage3DLoader.ascent_line,
    input_pipeline_g.py:1498-1513)."""
    xs, ys, forward = xiaolinwu_line(x0, y0, x1, y1)
    if not forward:
        xs, ys = xs[::-1], ys[::-1]
    pre = img[ys[0], xs[0]]
    for x, y in zip(xs[1:], ys[1:]):
        cur = img[y, x]
        if cur < pre:
            return False
        pre = cur
    return True


def find_tp_and_fp(result: np.ndarray, reference: np.ndarray,
                   connectivity: int = 1):
    """Split predicted objects into true positives and false positives
    (reference utils/array_kits.py:1008-1035): a predicted object whose Dice
    < 0.1 counts as a false positive.  NB the Dice is computed INSIDE the
    predicted object's bounding-box window against the (undifferentiated)
    reference foreground there — the reference's own windowed formulation
    (``labeled_res[slice_]`` vs ``labeled_ref[slice_]``), pinned by the
    golden fixture.  Returns (tp_mask, fp_mask)."""
    disc = ndi.generate_binary_structure(result.ndim, connectivity)
    labeled, n = ndi.label(result, disc)
    tp = np.zeros_like(result, bool)
    fp = np.zeros_like(result, bool)
    ref = reference.astype(bool)
    for sli, i in zip(ndi.find_objects(labeled), range(1, n + 1)):
        obj = labeled == i
        obj_w = labeled[sli] == i
        ref_w = ref[sli]
        denom = obj_w.sum() + ref_w.sum()
        dice = 2.0 * np.count_nonzero(obj_w & ref_w) / denom if denom else 0.0
        if dice < 0.1:
            fp |= obj
        else:
            tp |= obj
    return tp, fp


def reduce_fp_with_guide(reference: np.ndarray, result: np.ndarray,
                         guide: str = "first") -> np.ndarray:
    """Keep only predicted 3D objects that intersect a reference object's
    guide slice (first or middle slice of each reference object,
    reference utils/array_kits.py:1038-1075)."""
    disc = ndi.generate_binary_structure(3, connectivity=1)
    labeled_result, num_res = ndi.label(result, structure=disc)
    labeled_reference, num_ref = ndi.label(reference, structure=disc)

    guided = set()
    for n in range(num_ref):
        obj_ref = labeled_reference == n + 1
        indices = np.where(np.count_nonzero(obj_ref, axis=(1, 2)) > 0)[0]
        if len(indices) == 0:
            continue
        idx = indices[0] if guide == "first" else indices[(len(indices) - 1) // 2]
        found = np.unique(np.clip(obj_ref[idx], 0, 1) * labeled_result[idx])
        guided.update(int(v) for v in found if v > 0)

    out = np.isin(labeled_result, sorted(guided)) & (labeled_result > 0)
    return out.astype(result.dtype)
