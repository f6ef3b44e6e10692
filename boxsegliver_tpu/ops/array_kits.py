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
    if np.count_nonzero(mask) == 0:
        return np.zeros(shape=(mask.ndim * 2,), dtype=np.int64)
    if min_shape is not None:
        assert len(min_shape) == mask.ndim
    if isinstance(mask_values, int):
        mask_values = [mask_values]
    mask_values = np.array(mask_values).reshape(-1, 1)

    indices = []
    for d in reversed(range(mask.ndim)):
        axes = tuple(a for a in range(mask.ndim) if a != d)
        maxes = np.max(mask, axis=axes)
        indices.append(np.where((maxes == mask_values).any(axis=0))[0])

    coords = []
    for d in range(mask.ndim):
        coords.extend([indices[d][0], indices[d][-1]])
    # coords is (x1, x2, y1, y2, ...) → reorder to (x1, y1, ..., x2, y2, ...)
    coords = np.array(coords, dtype=np.int64)
    bbox = np.concatenate([coords[0::2], coords[1::2]])

    ndim = mask.ndim
    img_shape_rev = np.array(mask.shape[::-1])
    if padding is not None:
        padding = np.asarray(padding if np.ndim(padding) else [padding] * ndim)
        bbox[:ndim] = np.maximum(0, bbox[:ndim] - padding)
        bbox[ndim:] = np.minimum(img_shape_rev - 1, bbox[ndim:] + padding)
    elif min_shape is not None:
        shape = bbox[ndim:] - bbox[:ndim] + 1
        min_shape_rev = np.asarray(min_shape[::-1])
        pad = np.maximum(0, min_shape_rev - shape)
        lo = pad // 2
        hi = pad - lo
        bbox[:ndim] = np.maximum(0, bbox[:ndim] - lo)
        bbox[ndim:] = np.minimum(img_shape_rev - 1, bbox[ndim:] + hi)
    return bbox


def bbox_to_slices(bbox) -> Tuple[slice, ...]:
    """Convert (x1, y1[, z1], x2, y2[, z2]) to numpy slices in array order."""
    bbox = np.asarray(bbox)
    ndim = len(bbox) // 2
    return tuple(slice(int(bbox[ndim - 1 - d]), int(bbox[2 * ndim - 1 - d]) + 1)
                 for d in range(ndim))


def extract_region(mask: np.ndarray, align=1, padding=0, min_bbox_shape=None):
    """Aligned sub-region bbox around a mask (reference array_kits.py:263-329)."""
    mask = np.asarray(mask, bool)
    ndim = mask.ndim
    if isinstance(align, int):
        align = (align,) * ndim
    align = np.array(align, dtype=np.int32)
    if min_bbox_shape is None:
        min_bbox_shape = (1,) * ndim
    pre_bbox = bbox_from_mask(mask, mask_values=1, min_shape=min_bbox_shape[::-1])

    img_shape = np.array(mask.shape)
    pre_bbox = pre_bbox.astype(np.int64)
    pre_bbox[:ndim] = np.maximum(0, pre_bbox[:ndim] - padding)
    pre_bbox[ndim:] = np.minimum(pre_bbox[ndim:] + padding, img_shape[::-1] - 1)

    ctr = (pre_bbox[:ndim] + pre_bbox[ndim:]) / 2
    region_shape = pre_bbox[ndim:] - pre_bbox[:ndim] + 1
    needed_shape = np.ceil(region_shape / align).astype(np.int32) * align
    point1 = np.maximum(0, np.int32(ctr - (needed_shape - 1) / 2))
    point2 = np.minimum(img_shape[::-1] - 1, point1 + needed_shape - 1)
    if not np.all((point2 - point1 + 1) % align == 0):
        point1 = point2 + 1 - needed_shape
    return np.concatenate((point1, point2), axis=0)


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


def compute_robust_moments(binary_image: np.ndarray, isotropic: bool = False,
                           indexing: str = "ij", min_std: float = 0.0):
    """Median center + 1.4826*MAD stddev of a binary object (reference :387-440)."""
    ndim = binary_image.ndim
    coords = np.nonzero(binary_image)
    points = np.asarray(coords).astype(np.float32)
    if points.shape[1] == 0:
        return (np.array([-1.0] * ndim, dtype=np.float32),
                np.array([-1.0] * ndim, dtype=np.float32))
    points = np.transpose(points)
    center = np.median(points, axis=0)
    if isotropic:
        diff = np.linalg.norm(points - center, axis=1)
        mad = np.array([np.median(diff)] * ndim)
    else:
        diff = np.absolute(points - center)
        mad = np.median(diff, axis=0)
    std_dev = np.maximum(1.4826 * mad, [min_std] * ndim)
    if not indexing or indexing == "xy":
        return center[::-1], std_dev[::-1]
    if indexing == "ij":
        return center.astype(np.float32), std_dev.astype(np.float32)
    raise ValueError("Valid values for `indexing` are 'xy' and 'ij'.")


def create_gaussian_distribution(shape, center, stddev):
    """Single-object Gaussian map; center/stddev in xy order (reference :443-449)."""
    stddev = np.asarray(stddev, np.float32)
    center = np.asarray(center, np.float32)
    coords = [np.arange(0, s) for s in shape]
    coords = np.stack(np.meshgrid(*coords, indexing="ij"), axis=-1)
    normalizer = 2 * (stddev * stddev)
    d = np.exp(-np.sum((coords - center[::-1]) ** 2 / normalizer[::-1], axis=-1))
    return np.clip(d, 0, 1).astype(np.float32)


def create_gaussian_distribution_v2(shape, centers, stddevs=None, indexing="ij",
                                    keepdims=False, euclidean=False):
    """Multi-object Gaussian / Euclidean map (reference :452-486)."""
    centers = np.asarray(centers, np.float32)
    assert centers.ndim == 2, centers.shape
    coords = [np.arange(0, s) for s in shape]
    coords = np.stack(np.meshgrid(*coords, indexing=indexing), axis=-1)[None]
    coords = np.tile(coords, [centers.shape[0]] + [1] * (centers.shape[1] + 1))
    coords = coords.astype(np.float32)
    c_sh = centers.shape
    centers = centers.reshape(c_sh[:1] + (1,) * c_sh[-1] + c_sh[-1:])
    if euclidean:
        d = np.sqrt(np.sum((coords - centers) ** 2, axis=-1, keepdims=keepdims))
        return np.min(d, axis=0)
    stddevs = np.asarray(stddevs, np.float32)
    stddevs = stddevs.reshape(c_sh[:1] + (1,) * c_sh[-1] + c_sh[-1:])
    normalizer = 2 * stddevs * stddevs
    d = np.exp(-np.sum((coords - centers) ** 2 / normalizer, axis=-1, keepdims=keepdims))
    return np.max(d, axis=0)


def get_gd_image_single_obj(labels, center_perturb=0.2, stddev_perturb=0.4,
                            blank_prob=0, partial=False, partial_slice="first",
                            only_moments=False, min_std=0.0, indexing="ij",
                            keepdims=False, rng=None):
    """Perturbed Gaussian guide for a single object (reference :489-569)."""
    rng = rng or np.random
    if partial_slice not in ("first", "middle"):
        raise ValueError(f"Only support `first` and `middle`, got {partial_slice}")
    labels = np.asarray(labels, dtype=np.float32)
    ndim = labels.ndim
    if partial and ndim != 3:
        raise ValueError("If `partial` is True, `labels` must have rank 3")
    if not np.any(labels) or rng.uniform() < blank_prob:
        return np.zeros(labels.shape)

    idx = -1
    if partial:
        indices = np.where(np.count_nonzero(labels, axis=(1, 2)) > 0)[0]
        idx = indices[0] if partial_slice == "first" else indices[(len(indices) - 1) // 2]
        obj_lab = labels[idx]
        obj_ndim = ndim - 1
    else:
        obj_lab = labels
        obj_ndim = ndim

    center, std = compute_robust_moments(obj_lab, indexing=indexing, min_std=min_std)
    center_p = rng.uniform(-center_perturb, center_perturb, obj_ndim) * std + center
    std_p = rng.uniform(1.0 / (1 + stddev_perturb), 1.0 + stddev_perturb, obj_ndim) * std
    if only_moments:
        return idx, center_p, std_p

    cur_gd = create_gaussian_distribution_v2(obj_lab.shape, [center_p], [std_p],
                                             indexing=indexing, keepdims=keepdims)
    if partial:
        gd = np.zeros_like(labels, dtype=np.float32)
        gd[idx] = cur_gd
        return gd, center_p, std_p
    return cur_gd, center_p, std_p


def get_gd_image_multi_objs(labels, obj_value=1, center_perturb=0.0,
                            stddev_perturb=0.0, blank_prob=0, connectivity=1,
                            partial=False, with_fake_guides=False, fake_rate=1.0,
                            max_fakes=4, fake_range_value=0, ret_bbox=False,
                            partial_slice="first", keepdims=False, min_std=0.0,
                            rng=None, **kwargs):
    """Perturbed Gaussian guide over all connected objects (reference :572-691)."""
    rng = rng or np.random
    labels = np.asarray(labels, dtype=np.uint32)
    ndim = labels.ndim
    if not np.any(labels):
        return np.zeros(labels.shape)

    obj_labels = merge_labels(labels, [0, obj_value])
    disc = ndi.generate_binary_structure(ndim, connectivity=connectivity)
    labeled_image, num_obj = ndi.label(obj_labels, structure=disc)

    gds, stds = [], []
    for n in range(num_obj):
        gd, _, std = get_gd_image_single_obj(
            labeled_image == n + 1, center_perturb, stddev_perturb, blank_prob,
            partial, partial_slice, keepdims=keepdims, min_std=min_std, rng=rng)
        gds.append(gd)
        stds.append(std)

    fks = []
    if with_fake_guides:
        number_of_fakes = int(fake_rate * num_obj)
        if number_of_fakes > 0:
            search_region = list(zip(*np.where(labels == fake_range_value)))
            if search_region:
                lo_std, hi_std = np.min(stds) / 2, np.max(stds)
                for _ in range(min(number_of_fakes, max_fakes)):
                    center = search_region[rng.randint(0, len(search_region))]
                    stddev = (rng.uniform() * (hi_std - lo_std) + lo_std,
                              rng.uniform() * (hi_std - lo_std) + lo_std)
                    fks.append(create_gaussian_distribution(
                        labels.shape, np.asarray(center)[::-1], stddev))

    if not gds and not fks:
        return np.zeros(labels.shape)
    merged_gd = functools.reduce(np.maximum, gds + fks)

    if ret_bbox:
        bboxes = [bbox_from_mask(labeled_image == n + 1, 1, **kwargs)
                  for n in range(num_obj)]
        return merged_gd, bboxes
    return merged_gd


def get_moments_multi_objs(labels, obj_value=1, blank_prob=0, connectivity=1,
                           partial=False, partial_slice="middle", indexing="ij",
                           min_std=0.0, rng=None):
    """Moments (center/std) per connected object (reference :694-777)."""
    rng = rng or np.random
    labels = np.asarray(labels, dtype=np.uint32)
    ndim = labels.ndim
    if not np.any(labels):
        return [], []
    obj_labels = merge_labels(labels, [0, obj_value])
    disc = ndi.generate_binary_structure(ndim, connectivity=connectivity)
    labeled_image, num_obj = ndi.label(obj_labels, structure=disc)
    centers, stds = [], []
    for n in range(num_obj):
        res = get_gd_image_single_obj(
            labeled_image == n + 1, 0.0, 0.0, blank_prob, partial, partial_slice,
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
    """Split predicted objects into true positives (overlapping a reference
    object) and false positives (reference utils/array_kits.py:987-1036).
    Returns (tp_mask, fp_mask)."""
    disc = ndi.generate_binary_structure(result.ndim, connectivity)
    labeled, n = ndi.label(result, disc)
    tp = np.zeros_like(result, bool)
    fp = np.zeros_like(result, bool)
    ref = reference.astype(bool)
    for i in range(1, n + 1):
        obj = labeled == i
        if (obj & ref).any():
            tp |= obj
        else:
            fp |= obj
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
