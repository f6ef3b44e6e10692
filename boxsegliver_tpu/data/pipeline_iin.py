"""Device-side fused processing for nf2/iin click-instance training.

TPU-first replacement of the reference's tf.data map stage for the iin
pipeline (reference DataLoader/NF/input_pipeline_iin.py:252-315
``data_processing_cuda``): ONE jitted, vmapped function performs nonzero
z-score or window clip, single-click Gaussian guide rendering, patch-pyramid
context normalization, gamma augmentation, noise, and joint flips — fused
into the compiled train step via trainer ``preprocess_fn``.

Host/device contract (data/sampler_iin.IinSampler): images arrive
host-resized at target size; context pyramids arrive as raw uint16 patches
and are normalized HERE with the image's scheme (the reference crops them out
of the already-normalized image, input_pipeline_iin.py:272-275, so patch
values share the image normalization).

Documented deviations (the reference pipeline is experimental and partially
broken — see sampler_iin module docstring):
- the noise branch multiplies by the z pad mask instead of the reference's
  undefined ``im_files`` expression (input_pipeline_iin.py:297);
- context patches flip together with the image (the reference draws
  independent flip coins for image and context when no seed is pinned,
  :303-310);
- the guide is rendered at target resolution directly (the sampler scales
  the click into target coordinates; exact rather than resampled).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from boxsegliver_tpu.data.pipeline_inter import nonzero_zscore
from boxsegliver_tpu.ops import image_ops
from boxsegliver_tpu.ops.guides import gaussian_guide_2d


def _process_one_iin(img, lab, clip, pad_mask, key, ct_patch, ct_on,
                     sp_center, sp_std, sp_on, *, im_h: int, im_w: int,
                     noise_scale: float, random_flip: int, use_context: bool,
                     use_spatial: bool, zscore: bool, use_gamma: bool,
                     gamma_range: Tuple[float, float], train: bool):
    img = img.astype(jnp.float32)
    lab = lab.astype(jnp.int32)

    if zscore:
        # image_ops.zscore semantics: nonzero-masked z-score (reference
        # utils/image_ops.py:24-31, called at input_pipeline_iin.py:259)
        region = (img > 0).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(region), 1.0)
        mean = jnp.sum(img * region) / cnt
        var = jnp.sum(jnp.square(img - mean) * region) / cnt
        img = (img - region * mean) / (region * jnp.sqrt(var) + 1e-8)
    else:
        lo, hi = clip[0], clip[1]
        img = (jnp.clip(img, lo, hi) - lo) / (hi - lo)

    feats = {}
    if use_context:
        ct = ct_patch.astype(jnp.float32)
        if zscore:
            # share the image's nonzero stats (the reference's patches are
            # cropped from the z-scored image, input_pipeline_iin.py:272-275)
            ct_region = (ct > 0).astype(jnp.float32)
            ct = (ct - ct_region * mean) / (ct_region * jnp.sqrt(var) + 1e-8)
        else:
            ct = (jnp.clip(ct, lo, hi) - lo) / (hi - lo)
        feats["context"] = ct * ct_on
    if use_spatial:
        guide = gaussian_guide_2d((im_h, im_w), sp_center[None, :],
                                  sp_std[None, :])
        feats["sp_guide"] = guide * sp_on  # zeros when no click (:287-289)

    k_noise, k_flip, k_gamma = jax.random.split(key, 3)
    if train and use_gamma:
        # p_per_sample=0.5 for iin (input_pipeline_iin.py:293)
        img = image_ops.augment_gamma(k_gamma, img, tuple(gamma_range),
                                      retain_stats=True, p_per_sample=0.5)
    if train and noise_scale > 0:
        img = image_ops.random_noise(k_noise, img, noise_scale,
                                     ntype="normal")
    if train and (use_gamma or noise_scale > 0):
        # out-of-volume 2.5D channels stay zero through gamma AND noise
        # (gamma's retain_stats rescale would otherwise shift them)
        img = img * pad_mask[None, None, :]

    if train and random_flip:
        joint = (jnp.concatenate([img, feats["sp_guide"]], axis=-1)
                 if use_spatial else img)
        if use_context:
            # flip context with the SAME coins (same key, shape-independent
            # flip decisions)
            feats["context"] = image_ops.random_flip(
                k_flip, feats["context"], flip=random_flip)
        joint, lab = image_ops.random_flip(k_flip, joint, lab,
                                           flip=random_flip)
        if use_spatial:
            img = joint[..., :img.shape[-1]]
            feats["sp_guide"] = joint[..., img.shape[-1]:]
        else:
            img = joint

    feats["images"] = img
    return feats, lab


def _process_batch_iin(batch: Dict[str, jnp.ndarray], key, *, im_h: int,
                       im_w: int, noise_scale: float, random_flip: int,
                       use_context: bool, use_spatial: bool, zscore: bool,
                       use_gamma: bool, gamma_range: Tuple[float, float],
                       train: bool):
    bs = batch["names"].shape[0]
    keys = jax.random.split(key, bs)
    ct_patch = batch.get("ct_patch",
                         jnp.zeros((bs, 1, 1, 1), jnp.uint16))
    ct_on = batch.get("ct_on", jnp.zeros((bs,), jnp.float32))
    sp_center = batch.get("sp_center", jnp.zeros((bs, 2), jnp.float32))
    sp_std = batch.get("sp_std", jnp.ones((bs, 2), jnp.float32))
    sp_on = batch.get("sp_on", jnp.zeros((bs,), jnp.float32))
    fn = functools.partial(
        _process_one_iin, im_h=im_h, im_w=im_w, noise_scale=noise_scale,
        random_flip=random_flip, use_context=use_context,
        use_spatial=use_spatial, zscore=zscore, use_gamma=use_gamma,
        gamma_range=tuple(gamma_range), train=train)
    feats, labels = jax.vmap(fn)(
        batch["image"], batch["label"], batch["clip"], batch["pad_mask"],
        keys, ct_patch, ct_on, sp_center, sp_std, sp_on)
    feats["names"] = batch["names"]
    return feats, labels


def make_iin_preprocess_fn(args, train: bool = True):
    """(raw_batch, key) -> (features, labels) closure for fusing the nf2
    device augmentation into the train step (trainer preprocess_fn)."""

    def fn(batch, key):
        return _process_batch_iin(
            batch, key, im_h=args.im_height, im_w=args.im_width,
            noise_scale=float(args.noise_scale) if train else 0.0,
            random_flip=int(args.random_flip) if train else 0,
            use_context=bool(getattr(args, "use_context", False)),
            use_spatial=bool(getattr(args, "use_spatial", False)),
            zscore=bool(getattr(args, "zscore", False)),
            use_gamma=bool(getattr(args, "gamma", False)),
            gamma_range=tuple(getattr(args, "gamma_range", (0.7, 1.5))),
            train=train)
    return fn
