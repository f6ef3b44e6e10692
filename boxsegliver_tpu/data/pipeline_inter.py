"""Device-side fused processing for 2D click-simulation training (nf_inter).

TPU-first replacement of the reference's tf.data map stage for the interactive
pipeline (reference DataLoader/NF/input_pipeline_g_simply.py:435-527
``data_processing``): ONE jitted, vmapped function performs nonzero z-score,
per-click guide rendering (Gaussian ``local_enhance`` / Euclidean / precomputed
geodesic maps), joint flips, gamma augmentation, and noise.  Fused into the
compiled train step via trainer ``preprocess_fn`` (one dispatch per step).

Host/device contract (data/sampler_inter.InterSampler): images arrive
host-resized at target size with click coordinates pre-scaled into target
coordinates plus a ``rescale = crop/target`` factor, so guide values keep the
reference's crop-resolution semantics exactly (see ops/guides.euclidean_guide
weights).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from boxsegliver_tpu.ops import image_ops
from boxsegliver_tpu.ops.guides import euclidean_guide, gaussian_guide


def click_guide(shape: Tuple[int, int], pts, n, rescale, *,
                local_enhance: bool, stddev: float):
    """Guide map from up to max_clicks points (reference data_processing,
    input_pipeline_g_simply.py:447-470): Gaussian with constant crop-space
    stddev when local_enhance, else raw Euclidean distance; zeros when there
    are no clicks (the reference's false_fn)."""
    mask = jnp.arange(pts.shape[0]) < n
    if local_enhance:
        # constant stddev in crop pixels → stddev/rescale in target pixels
        stds = jnp.broadcast_to(stddev / rescale, pts.shape)
        g = gaussian_guide(shape, pts, stds, mask=mask)
    else:
        g = euclidean_guide(shape, pts, mask=mask, weights=rescale)
    return jnp.where(n > 0, g, jnp.zeros(shape + (1,), jnp.float32))


def nonzero_zscore(img: jnp.ndarray) -> jnp.ndarray:
    """Z-score over nonzero voxels only; zeros stay zero (reference
    data_processing, input_pipeline_g_simply.py:437-443)."""
    region = (img > 0).astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(region), 1.0)
    mean = jnp.sum(img * region) / cnt
    var = jnp.sum(jnp.square(img - mean) * region) / cnt
    return (img - region * mean) / (region * jnp.sqrt(var) + 1e-8)


def _process_one_inter(img, lab, pad_mask, key, fg_pts, n_fg, bg_pts, n_bg,
                       rescale, fg_gd, bg_gd, *, im_h: int, im_w: int,
                       noise_scale: float, random_flip: int,
                       guide_channel: int, local_enhance: bool,
                       geodesic: bool, stddev: float,
                       gamma_range: Tuple[float, float], use_gamma: bool,
                       train: bool):
    img = nonzero_zscore(img.astype(jnp.float32))
    lab = lab.astype(jnp.int32)

    if geodesic:
        fg_g, bg_g = fg_gd[..., None], bg_gd[..., None]
    else:
        fg_g = click_guide((im_h, im_w), fg_pts, n_fg, rescale,
                           local_enhance=local_enhance, stddev=stddev)
        bg_g = click_guide((im_h, im_w), bg_pts, n_bg, rescale,
                           local_enhance=local_enhance, stddev=stddev)

    k_flip, k_gamma, k_noise = jax.random.split(key, 3)
    joint = jnp.concatenate([img, fg_g, bg_g], axis=-1)
    if train and random_flip:
        joint, lab = image_ops.random_flip(k_flip, joint, lab,
                                           flip=random_flip)
    ch = img.shape[-1]
    img = joint[..., :ch]
    if guide_channel == 2:
        sp_guide = joint[..., ch:ch + 2]
    else:  # 1-channel: fg - bg (input_pipeline_g_simply.py:503-508)
        sp_guide = joint[..., ch:ch + 1] - joint[..., ch + 1:ch + 2]

    if train and use_gamma:
        img = image_ops.augment_gamma(k_gamma, img, gamma_range,
                                      retain_stats=True, p_per_sample=0.3)
    if train and noise_scale > 0:
        img = image_ops.random_noise(k_noise, img, noise_scale)
        img = img * pad_mask[None, None, :]  # no noise on padded z channels

    return {"images": img, "sp_guide": sp_guide}, lab


def _process_batch_inter(batch: Dict[str, jnp.ndarray], key, *, im_h, im_w,
                         noise_scale, random_flip, guide_channel,
                         local_enhance, geodesic, stddev, gamma_range,
                         use_gamma, train):
    bs = batch["names"].shape[0]
    keys = jax.random.split(key, bs)
    fg_gd = batch.get("fg_gd")
    bg_gd = batch.get("bg_gd")
    if fg_gd is None:  # placeholders keep the vmap signature static
        fg_gd = jnp.zeros((bs, 1, 1), jnp.float32)
        bg_gd = fg_gd
    fn = functools.partial(
        _process_one_inter, im_h=im_h, im_w=im_w, noise_scale=noise_scale,
        random_flip=random_flip, guide_channel=guide_channel,
        local_enhance=local_enhance, geodesic=geodesic, stddev=stddev,
        gamma_range=gamma_range, use_gamma=use_gamma, train=train)
    feats, labels = jax.vmap(fn)(
        batch["image"], batch["label"], batch["pad_mask"], keys,
        batch["fg_pts"], batch["n_fg"], batch["bg_pts"], batch["n_bg"],
        batch["rescale"], fg_gd, bg_gd)
    feats["names"] = batch["names"]
    return feats, labels


def make_inter_preprocess_fn(args, train: bool = True):
    """(raw_batch, key) -> (features, labels) closure for the fused train step
    (trainer preprocess_fn) or the online evaluator (train=False disables
    flips/gamma/noise like the reference's data_processing(train=False))."""
    static = dict(
        im_h=int(args.im_height), im_w=int(args.im_width),
        noise_scale=float(args.noise_scale),
        random_flip=int(args.random_flip),
        guide_channel=int(getattr(args, "guide_channel", 2)),
        local_enhance=bool(getattr(args, "local_enhance", False)),
        geodesic=bool(getattr(args, "geodesic", False)),
        stddev=float(getattr(args, "stddev", 3.0)),
        gamma_range=tuple(getattr(args, "gamma_range", (0.7, 1.5))),
        # the reference applies gamma unconditionally in this pipeline
        # (input_pipeline_g_simply.py:510-513); --no_gamma opts out
        use_gamma=not bool(getattr(args, "no_gamma", False)),
        train=train)

    def fn(batch, key):
        return _process_batch_inter(batch, key, **static)

    return fn
