"""Device-side 3D batch processing (UNet3D training path).

Re-implements the reference's 3D tf.data map fn (reference
DataLoader/NF/input_pipeline_3d.py:352-408 ``data_processing``): nonzero
z-score, Gaussian (local-enhance) or normalized-Euclidean click guides,
3-axis flips, gamma augmentation (p=0.3, retain stats) — all in one jitted,
vmapped function so it can also be fused into the train step.
"""

from __future__ import annotations

import functools
import math
from typing import Dict

import jax
import jax.numpy as jnp

from boxsegliver_tpu.ops import image_ops
from boxsegliver_tpu.ops.guides import euclidean_guide, gaussian_guide


def _process_one_3d(patch, label, fg_pts, bg_pts, cascade, key, *,
                    stddev: float, local_enhance: bool, guide_channel: int,
                    random_flip: int, gamma: bool, use_spatial: bool,
                    use_cascade: bool):
    img = image_ops.zscore(patch.astype(jnp.float32))[..., None]  # [d,h,w,1]
    if use_cascade:
        # frozen-2D / GT-oracle channel: travels through flips but is kept
        # out of z-score and gamma (reference data_processing_2c,
        # input_pipeline_3d.py:412-472)
        img = jnp.concatenate([img, cascade[..., None]], axis=-1)
    lab = label.astype(jnp.int32)
    shape = patch.shape                                           # (d, h, w)

    k_flip, k_gamma = jax.random.split(key)
    feats = {}
    if use_spatial:
        def render(pts):
            mask = pts[:, 0] >= 0.0
            if local_enhance:
                stds = jnp.full(pts.shape, stddev, jnp.float32)
                return gaussian_guide(shape, pts, stds, mask=mask)
            gd = euclidean_guide(shape, pts, mask=mask)
            # reference normalization (input_pipeline_3d.py:371-372)
            return gd / (shape[1] * math.sqrt(2) * 0.8)

        fg_guide = jnp.where(jnp.any(fg_pts[:, 0] >= 0), render(fg_pts),
                             jnp.zeros(shape + (1,), jnp.float32))
        bg_guide = jnp.where(jnp.any(bg_pts[:, 0] >= 0), render(bg_pts),
                             jnp.zeros(shape + (1,), jnp.float32))
        if guide_channel == 2:
            guide = jnp.concatenate([fg_guide, bg_guide], axis=-1)
        else:
            guide = fg_guide - bg_guide
        joint = jnp.concatenate([img, guide], axis=-1)
    else:
        joint = img

    if random_flip:
        joint, lab = image_ops.random_flip(k_flip, joint, lab, flip=random_flip)

    n_im = 2 if use_cascade else 1
    img = joint[..., :1]
    if gamma:
        img = image_ops.augment_gamma(k_gamma, img, (0.7, 1.5),
                                      retain_stats=True, p_per_sample=0.3)
    if use_cascade:
        img = jnp.concatenate([img, joint[..., 1:2]], axis=-1)
    feats["images"] = img
    if use_spatial:
        feats["sp_guide"] = joint[..., n_im:]
    return feats, lab


def _process_batch_3d(batch: Dict, key, *, stddev: float, local_enhance: bool,
                      guide_channel: int, random_flip: int, gamma: bool,
                      use_spatial: bool, use_cascade: bool = False):
    bs = batch["patch"].shape[0]
    keys = jax.random.split(key, bs)
    fg = batch.get("fg_pts", jnp.full((bs, 1, 3), -1.0, jnp.float32))
    bg = batch.get("bg_pts", jnp.full((bs, 1, 3), -1.0, jnp.float32))
    cascade = batch.get("cascade")
    if cascade is None:
        cascade = jnp.zeros(batch["patch"].shape, jnp.float32)
    fn = functools.partial(_process_one_3d, stddev=stddev,
                           local_enhance=local_enhance,
                           guide_channel=guide_channel,
                           random_flip=random_flip, gamma=gamma,
                           use_spatial=use_spatial, use_cascade=use_cascade)
    feats, labels = jax.vmap(fn)(batch["patch"], batch["label"], fg, bg,
                                 cascade, keys)
    feats["names"] = batch["names"]
    return feats, labels


process_train_batch_3d = functools.partial(jax.jit, static_argnames=(
    "stddev", "local_enhance", "guide_channel", "random_flip", "gamma",
    "use_spatial", "use_cascade"))(_process_batch_3d)


def make_preprocess_fn_3d(args):
    """Fusable (raw_batch, key) -> (features, labels) closure."""
    def fn(batch, key):
        return _process_batch_3d(
            batch, key, stddev=float(getattr(args, "stddev", 3.0)),
            local_enhance=bool(getattr(args, "local_enhance", True)),
            guide_channel=int(getattr(args, "guide_channel", 2)),
            random_flip=int(args.random_flip),
            gamma=bool(getattr(args, "gamma", False)),
            use_spatial=bool(getattr(args, "use_spatial", False)),
            use_cascade=bool(getattr(args, "use_cascade", False)))
    return fn
