"""Iterative interactive refinement loops.

Re-implements the standalone interactive evaluation drivers:
- 2D (reference entry/main_eval.py:43-396): per-volume click loop for
  UNetInter-style models — simulate clicks, render fg/bg guides, predict,
  place the next click at the largest error, repeat until Dice > threshold or
  the interaction budget runs out.
- 3D (reference entry/main_eval_3d.py:152-420): whole-volume loop for UNet3D —
  next click at the center of the largest 3D error component, guide volume
  updated in place, optional 8-way mirror TTA.

Guide rendering supports gaussian / euclidean (inverse-distance) maps
(reference utils/image_ops.py:396-472 semantics); geodesic guides plug in via
boxsegliver_tpu.csrc (fast marching, C++).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import numpy as np

from boxsegliver_tpu.interactive.clicks import next_click_from_error
from boxsegliver_tpu.ops.metrics import ConfusionMatrix


def render_click_guide(shape, clicks: List[Tuple], stddev: float = 5.0,
                       kind: str = "gaussian") -> np.ndarray:
    """Max-over-clicks guide map for 2D or 3D shapes."""
    if not clicks:
        return np.zeros(shape, np.float32)
    coords = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape],
                         indexing="ij")
    coords = np.stack(coords, axis=-1)                       # [*shape, nd]
    pts = np.asarray(clicks, np.float32)                     # [n, nd]
    d2 = np.sum((coords[None] - pts.reshape((-1,) + (1,) * len(shape)
                                            + (len(shape),))) ** 2, axis=-1)
    if kind == "gaussian":
        out = np.exp(-d2 / (2.0 * stddev ** 2)).max(axis=0)
    elif kind == "euclidean":
        dist = np.sqrt(d2.min(axis=0))
        out = np.exp(-dist / max(stddev, 1e-6))
    elif kind == "geodesic":
        from boxsegliver_tpu.csrc import geodesic_available, geodesic_distance
        if not geodesic_available():
            raise RuntimeError("geodesic guide requires the C++ extension "
                               "(build boxsegliver_tpu/csrc)")
        raise ValueError("geodesic guides need an image argument; use "
                         "render_geodesic_guide instead")
    else:
        raise ValueError(f"Unknown guide kind {kind}")
    return out.astype(np.float32)


def render_geodesic_guide(image: np.ndarray, clicks: List[Tuple],
                          lamb: float = 1.0, iterations: int = 4,
                          scale: float = 10.0) -> np.ndarray:
    """exp(-geodesic_distance/scale) guide (reference GeodisTK usage,
    DataLoader/NF/input_pipeline_g_simply.py:476-489)."""
    from boxsegliver_tpu.csrc import geodesic_distance
    seeds = np.zeros(image.shape, np.uint8)
    for c in clicks:
        seeds[tuple(int(x) for x in c)] = 1
    dist = geodesic_distance(image.astype(np.float32), seeds, lamb, iterations)
    return np.exp(-dist / max(scale, 1e-6)).astype(np.float32)


def render_geodesic_eval_guide(image: np.ndarray, clicks: List[Tuple],
                               lamb: float = 1.0, iterations: int = 4
                               ) -> np.ndarray:
    """Raw-distance geodesic guide in the TRAINING convention
    (data/sampler_inter._geodesic_maps; reference data_processing geodesic
    branch, input_pipeline_g_simply.py:478-496): fast marching on the
    2x-downsampled normalized slice, bilinearly upsampled back.  Models
    trained with --geodesic see this map as their guide channel, so the
    interactive eval loop must render the same thing.  Empty clicks ->
    zeros (the pipeline's no-click convention)."""
    import cv2

    from boxsegliver_tpu.csrc import geodesic_distance
    h, w = image.shape
    if not clicks:
        return np.zeros((h, w), np.float32)
    ds = np.ascontiguousarray(image[::2, ::2], np.float32)
    pts = np.asarray(clicks)
    seeds = np.zeros(ds.shape, np.uint8)
    ys = np.clip((pts[:, 0] / 2).astype(np.int32), 0, ds.shape[0] - 1)
    xs = np.clip((pts[:, 1] / 2).astype(np.int32), 0, ds.shape[1] - 1)
    seeds[ys, xs] = 1
    dist = geodesic_distance(ds, seeds, lamb, iterations)
    return cv2.resize(dist, (w, h), interpolation=cv2.INTER_LINEAR)


def interactive_eval_2d(predict_fn: Callable, images: np.ndarray,
                        labels: np.ndarray, *, dice_thresh: float = 0.85,
                        max_iters: int = 10, stddev: float = 5.0,
                        guide_kind: str = "gaussian",
                        guide_channel: int = 2) -> Dict[str, float]:
    """Per-slice interactive refinement (reference entry/main_eval.py loop).

    predict_fn({"images": [1,h,w,c], "sp_guide": [1,h,w,gc]}) → probs
    [1,h,w,nc].  Returns final dice + interaction count per slice, averaged.
    """
    n_slices = images.shape[0]
    shape = labels.shape[1:]
    total_dice, total_clicks = [], []
    for z in range(n_slices):
        lab = labels[z] > 0
        if not lab.any():
            # reference main_eval.py only evaluates lesion-bearing slices
            continue
        fg_clicks: List[Tuple] = []
        bg_clicks: List[Tuple] = []
        pred = np.zeros(shape, np.uint8)
        clicks_used = 0
        dice = 0.0
        for _ in range(max_iters):
            coords, is_fg = next_click_from_error(pred, lab)
            if coords is None:
                break
            (fg_clicks if is_fg else bg_clicks).append(coords)
            clicks_used += 1
            if guide_kind == "geodesic":
                center = images[z][..., images.shape[-1] // 2]
                fg_g = render_geodesic_eval_guide(center, fg_clicks)
                bg_g = render_geodesic_eval_guide(center, bg_clicks)
            else:
                fg_g = render_click_guide(shape, fg_clicks, stddev, guide_kind)
                bg_g = render_click_guide(shape, bg_clicks, stddev, guide_kind)
            if guide_channel == 2:
                guide = np.stack([fg_g, bg_g], axis=-1)
            else:
                guide = (fg_g - bg_g)[..., None]
            feats = {"images": images[z][None],
                     "sp_guide": guide[None].astype(np.float32)}
            probs = np.asarray(predict_fn(feats))[0]
            pred = (probs.argmax(-1) > 0).astype(np.uint8)
            conf = ConfusionMatrix(pred, lab.astype(int))
            dice = conf.global_dice
            if dice > dice_thresh:
                break
        total_dice.append(dice)
        total_clicks.append(clicks_used)
    if not total_dice:  # no lesion-bearing slices in this case
        return {"Dice": 1.0, "clicks": 0.0, "slices": 0.0}
    return {"Dice": float(np.mean(total_dice)),
            "clicks": float(np.mean(total_clicks)),
            "slices": float(len(total_dice))}


def interactive_eval_3d(predict_fn: Callable, volume: np.ndarray,
                        label: np.ndarray, *, dice_thresh: float = 0.85,
                        max_iters: int = 20, stddev: float = 5.0,
                        tta: bool = False, use_cascade: bool = False,
                        cascade_binary: bool = False,
                        guide_channel: int = 1,
                        valid_shape=None) -> Dict[str, float]:
    """Whole-volume interactive loop (reference entry/main_eval_3d.py:326-420):
    click at the largest error component's center, update the 3D Gaussian
    guide, re-predict (optionally with 8-way mirror TTA), until Dice clears
    the threshold or the budget runs out.

    predict_fn({"images": [1,d,h,w,c], "sp_guide": [1,d,h,w,gc]}) → probs
    [1,d,h,w,nc] — the guide travels on the UNet3D use_spatial input
    (guide_channel 1 = fg−bg, 2 = stacked, reference main_eval_3d.py:372-373).
    use_cascade adds the GT-oracle IMAGE channel from the first positive
    click's slice once it exists (reference main_eval_3d.py:348-369).
    """
    shape = label.shape
    fg_clicks: List[Tuple] = []
    bg_clicks: List[Tuple] = []
    pred = np.zeros(shape, np.uint8)
    dice = 0.0
    clicks_used = 0
    cascade_ch = np.zeros(shape + (1,), np.float32) if use_cascade else None
    cascade_set = False
    flips = [()]
    if tta:
        flips = [(), (1,), (2,), (3,), (1, 2), (1, 3), (2, 3), (1, 2, 3)]
    for _ in range(max_iters):
        coords, is_fg = next_click_from_error(pred, label)
        if coords is None:
            break
        (fg_clicks if is_fg else bg_clicks).append(coords)
        clicks_used += 1
        if use_cascade and not cascade_set and fg_clicks:
            from boxsegliver_tpu.interactive.cascade import gt_cascade_channel
            cascade_ch = gt_cascade_channel(
                (label > 0).astype(np.uint8),
                np.asarray(fg_clicks, np.float32),
                binary=cascade_binary)[..., None]
            cascade_set = True
        fg_g = render_click_guide(shape, fg_clicks, stddev)
        bg_g = render_click_guide(shape, bg_clicks, stddev)
        if guide_channel == 2:
            guide = np.stack([fg_g, bg_g], axis=-1)
        else:
            guide = (fg_g - bg_g)[..., None]
        parts = [volume[..., None] if volume.ndim == 3 else volume]
        if use_cascade:
            parts.append(cascade_ch)
        x = np.concatenate(parts, axis=-1)[None].astype(np.float32)
        g = guide[None].astype(np.float32)
        acc = None
        for axes in flips:
            xin, gin = x, g
            for ax in axes:
                xin = np.flip(xin, axis=ax)
                gin = np.flip(gin, axis=ax)
            probs = np.asarray(predict_fn(
                {"images": np.ascontiguousarray(xin),
                 "sp_guide": np.ascontiguousarray(gin)}))
            for ax in axes:
                probs = np.flip(probs, axis=ax)
            acc = probs if acc is None else acc + probs
        probs = acc[0] / len(flips)
        pred = (probs.argmax(-1) > 0).astype(np.uint8)
        if valid_shape is not None:
            # alignment padding is not part of the case: zero predictions
            # there so neither Dice nor click placement sees pad artifacts
            vd, vh, vw = valid_shape
            mask = np.zeros_like(pred)
            mask[:vd, :vh, :vw] = 1
            pred *= mask
        dice = ConfusionMatrix(pred, label.astype(int)).global_dice
        if dice > dice_thresh:
            break
    return {"Dice": float(dice), "clicks": float(clicks_used)}
