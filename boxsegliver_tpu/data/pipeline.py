"""Device-side batch processing + prefetching train dataset.

TPU-first replacement for the reference's tf.data map_and_batch stage
(reference DataLoader/Liver/input_pipeline_g.py:347-412 ``data_processing_train``
and :696-768 ``get_dataset_for_train``): the host sampler (sampler.py) emits
fixed-shape uint16 windows + scalars; ONE jitted, vmapped function does
resize / window-normalize / Gaussian-guide render / noise / joint flips on
device.  A background thread pool keeps a prefetch queue of ready host batches
so the accelerator never waits on sampling.
"""

from __future__ import annotations

import functools
import queue
import threading
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from boxsegliver_tpu.ops import image_ops
from boxsegliver_tpu.ops.guides import gaussian_guide_2d, to_guided_range


def _process_one(window, label, crop_hw, clip, pad_mask, key,
                 centers, stddevs, n_objs, context,
                 *, im_h: int, im_w: int, noise_scale: float, random_flip: int,
                 use_spatial: bool, min_std: float, **norm_kw):
    """Per-sample device processing (vmapped).

    Two input layouts (see sampler.TrainSampler resize_on_host):
    - host-resized: window [H, W, C] uint16 already at target size (crop_hw
      is None) — skip the device resize.
    - device-resize: window [C, Hm, Wm] uint16 max-zoom buffer + crop_hw
      scalars → crop_and_resize_2d on device.
    """
    if crop_hw is None:
        img = window.astype(jnp.float32)
        lab = label
    else:
        img = jnp.transpose(window, (1, 2, 0)).astype(jnp.float32)  # [Hm, Wm, C]
        img, lab = image_ops.crop_and_resize_2d(
            img, label, 0.0, 0.0, crop_hw[0], crop_hw[1], im_h, im_w)
    return _augment_tail(img, lab, clip, pad_mask, key, centers, stddevs,
                         n_objs, context, im_h=im_h, im_w=im_w,
                         noise_scale=noise_scale, random_flip=random_flip,
                         use_spatial=use_spatial, min_std=min_std, **norm_kw)


def _process_one_cached(zidx, lab_z, offset, crop_hw, clip, pad_mask, key,
                        centers, stddevs, n_objs, context, vol_cache, lab_cache,
                        *, im_h: int, im_w: int, noise_scale: float,
                        random_flip: int, use_spatial: bool, min_std: float,
                        **norm_kw):
    """Per-sample processing from the HBM-resident volume cache
    (data/device_cache.py): gather the 2.5D slice window by absolute z index,
    then crop/resize/augment — zero pixel bytes cross the host boundary."""
    win = jnp.take(vol_cache, zidx, axis=0)            # [C, H, W] uint16
    img = jnp.transpose(win, (1, 2, 0)).astype(jnp.float32)
    lab = jnp.take(lab_cache, lab_z, axis=0)           # [H, W] uint8
    img, lab = image_ops.crop_and_resize_2d(
        img, lab, offset[0], offset[1], crop_hw[0], crop_hw[1], im_h, im_w)
    # out-of-z-range channels were gathered from the clamped edge slice: zero
    # them to reproduce the zero-pad semantics (normalize maps 0 -> 0)
    img = img * pad_mask[None, None, :]
    return _augment_tail(img, lab, clip, pad_mask, key, centers, stddevs,
                         n_objs, context, im_h=im_h, im_w=im_w,
                         noise_scale=noise_scale, random_flip=random_flip,
                         use_spatial=use_spatial, min_std=min_std, **norm_kw)


def _augment_tail(img, lab, clip, pad_mask, key, centers, stddevs, n_objs,
                  context, *, im_h: int, im_w: int, noise_scale: float,
                  random_flip: int, use_spatial: bool, min_std: float,
                  zscore: bool = False, use_gamma: bool = False,
                  gamma_range: tuple = (0.7, 1.5), guide_bg: float = 0.5,
                  label_mode: str = "none"):
    """Shared per-sample augmentation: normalize (window clip or nonzero
    z-score), guide render, gamma, noise, joint flips (reference
    data_processing_train: Liver input_pipeline_g.py:347-412; NF z-score/gamma
    options NF/input_pipeline_g.py:295-373).

    guide_bg: guide background value — the Liver pipeline remaps guides to
    [0.5, 1] (input_pipeline_g.py:388-391), the NF pipeline keeps raw [0, 1]
    Gaussians on a zero background (NF/input_pipeline_g.py:338-350).
    label_mode: 'liver01' merges tumor into liver (the only_liver task,
    reference Liver/input_pipeline_li.py), 'tumor' keeps only the tumor
    class (reference Tumor/input_pipeline.py)."""
    lab = lab.astype(jnp.int32)
    if label_mode == "liver01":
        lab = jnp.clip(lab, 0, 1)
    elif label_mode == "tumor":
        lab = (lab == 2).astype(jnp.int32)

    if zscore:
        # nonzero z-score replaces window/level (NF/input_pipeline_g.py:310-317)
        region = (img > 0).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(region), 1.0)
        mean = jnp.sum(img * region) / cnt
        var = jnp.sum(jnp.square(img - mean) * region) / cnt
        img = (img - region * mean) / (region * jnp.sqrt(var) + 1e-8)
    else:
        # window-level clip-normalize (input_pipeline_g.py:362-363)
        lo, hi = clip[0], clip[1]
        img = (jnp.clip(img, lo, hi) - lo) / (hi - lo)

    k_noise, k_flip, k_gamma = jax.random.split(key, 3)
    feats = {}
    if use_spatial:
        stds = jnp.maximum(stddevs, min_std)
        valid = (jnp.arange(centers.shape[0]) < n_objs)
        guide = gaussian_guide_2d((im_h, im_w), centers, stds, mask=valid)
        guide = jnp.where(n_objs > 0, to_guided_range(guide, guide_bg),
                          jnp.full((im_h, im_w, 1), guide_bg, jnp.float32))
        feats["sp_guide"] = guide
    if context is not None:
        feats["context"] = context

    if use_gamma:
        img = image_ops.augment_gamma(k_gamma, img, gamma_range,
                                      retain_stats=True, p_per_sample=0.3)
    if noise_scale > 0:
        img = image_ops.random_noise(k_noise, img, noise_scale)
        img = img * pad_mask[None, None, :]  # kill noise in padded z slices

    if random_flip:
        if use_spatial:
            joint = jnp.concatenate([img, feats["sp_guide"]], axis=-1)
            joint, lab = image_ops.random_flip(k_flip, joint, lab, flip=random_flip)
            img = joint[..., :img.shape[-1]]
            feats["sp_guide"] = joint[..., img.shape[-1]:]
        else:
            img, lab = image_ops.random_flip(k_flip, img, lab, flip=random_flip)

    feats["images"] = img
    return feats, lab


def _process_batch(batch: Dict[str, jnp.ndarray], key, *, im_h: int,
                   im_w: int, noise_scale: float, random_flip: int,
                   use_spatial: bool, min_std: float, cache=None,
                   zscore: bool = False, use_gamma: bool = False,
                   gamma_range: tuple = (0.7, 1.5), guide_bg: float = 0.5,
                   label_mode: str = "none"):
    """Whole-batch processing body: returns (features dict, labels[bs,h,w]).

    Three input layouts (sampler.TrainSampler): host-resized pixels,
    device-resize pixel windows, or HBM-cache slice indices (cache given)."""
    bs = batch["names"].shape[0]
    keys = jax.random.split(key, bs)
    centers = batch.get("centers", jnp.full((bs, 1, 2), -1.0, jnp.float32))
    stddevs = batch.get("stddevs", jnp.ones((bs, 1, 2), jnp.float32))
    n_objs = batch.get("n_objs", jnp.zeros((bs,), jnp.int32))
    context = batch.get("context", None)
    ctx_ax = 0 if context is not None else None
    static = dict(im_h=im_h, im_w=im_w, noise_scale=noise_scale,
                  random_flip=random_flip, use_spatial=use_spatial,
                  min_std=min_std, zscore=zscore, use_gamma=use_gamma,
                  gamma_range=tuple(gamma_range), guide_bg=guide_bg,
                  label_mode=label_mode)

    if "zidx" in batch:
        fn = functools.partial(_process_one_cached, **static)
        feats, labels = jax.vmap(
            fn, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, ctx_ax, None, None))(
            batch["zidx"], batch["lab_z"], batch["offset"], batch["crop_hw"],
            batch["clip"], batch["pad_mask"], keys, centers, stddevs, n_objs,
            context, cache.volume, cache.label)
    else:
        host_resized = "image" in batch
        window = batch["image"] if host_resized else batch["window"]
        crop_hw = None if host_resized else batch["crop_hw"]
        fn = functools.partial(_process_one, **static)
        in_axes = (0, 0, None if host_resized else 0, 0, 0, 0, 0, 0, 0, ctx_ax)
        feats, labels = jax.vmap(fn, in_axes=in_axes)(
            window, batch["label"], crop_hw, batch["clip"],
            batch["pad_mask"], keys, centers, stddevs, n_objs, context)
    feats["names"] = batch["names"]
    return feats, labels


process_train_batch = functools.partial(jax.jit, static_argnames=(
    "im_h", "im_w", "noise_scale", "random_flip", "use_spatial", "min_std",
    "zscore", "use_gamma", "gamma_range", "guide_bg",
    "label_mode"))(_process_batch)

_TASK_LABEL_MODES = {"only_liver": "liver01", "tumor": "tumor"}


def norm_statics(args) -> Dict:
    """Modality/task-dependent statics for _process_batch: z-score + gamma
    options (NF, reference NF/input_pipeline_g.py:249 kwargs), the guide
    background value (0.5 Liver remap vs 0.0 NF raw Gaussian), and the task's
    label mapping (only_liver / tumor variants)."""
    task = getattr(args, "task", "liver")
    return dict(zscore=bool(getattr(args, "zscore", False)),
                use_gamma=bool(getattr(args, "gamma", False)),
                gamma_range=tuple(getattr(args, "gamma_range", (0.7, 1.5))),
                guide_bg=0.0 if task.startswith("nf") else 0.5,
                label_mode=_TASK_LABEL_MODES.get(task, "none"))


def make_preprocess_fn(args, cache=None):
    """(raw_batch, key) -> (features, labels) closure for fusing the device
    augmentation into the train step (trainer.make_train_step preprocess_fn):
    one compiled executable does augment + forward + backward per step.

    cache: a data/device_cache.DeviceVolumeCache — its HBM arrays are closed
    over (they keep their replicated sharding as implicit jit operands) and
    the batch is expected in the sampler's index layout."""
    statics = norm_statics(args)

    def fn(batch, key):
        return _process_batch(
            batch, key, im_h=args.im_height, im_w=args.im_width,
            noise_scale=float(args.noise_scale),
            random_flip=int(args.random_flip),
            use_spatial=bool(getattr(args, "use_spatial", False)),
            min_std=float(getattr(args, "min_std", 2.0)),
            cache=cache, **statics)
    return fn


class TrainDataset:
    """Prefetching host-batch iterator (replaces tf.data prefetch(AUTOTUNE),
    reference input_pipeline_g.py:756-766).

    Worker threads run ``sampler.sample_batch`` CONCURRENTLY, each with its
    own ``np.random.RandomState`` (sampling touches only per-call RNG state
    plus GIL-atomic caches, so no lock is needed).

    Two modes:
    - raw=True (product path): ``__next__`` returns the raw numpy batch dict;
      the Trainer device_puts it and the compiled train step performs the
      fused augmentation (trainer preprocess_fn) — ONE dispatch per step.
    - raw=False: ``__next__`` returns device-processed (features, labels) via
      ``process_fn`` (default 2D process_train_batch), for standalone use
      (tests, eval-time batch building).
    """

    def __init__(self, sampler, args, seed: int = 0, prefetch: int = 4,
                 workers: Optional[int] = None, process_fn=None,
                 raw: bool = False):
        """process_fn(raw_batch, key) -> (features, labels); defaults to the
        2D process_train_batch.  Pass pipeline3d.make_preprocess_fn_3d(args)
        (jitted) for the 3D path."""
        self.sampler = sampler
        self.args = args
        self.batch_size = args.batch_size
        self.raw = raw
        self.process_fn = jax.jit(process_fn) if process_fn is not None else None
        self.key = jax.random.PRNGKey(seed)
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads = []
        n_workers = workers if workers is not None else getattr(args, "host_workers", 2)
        for wid in range(max(1, n_workers)):
            rng = np.random.RandomState([seed & 0x7FFFFFFF, 0xB0D5E6, wid])
            t = threading.Thread(target=self._worker, args=(rng,), daemon=True)
            t.start()
            self._threads.append(t)

    def _worker(self, rng):
        while not self._stop.is_set():
            batch = self.sampler.sample_batch(self.batch_size, rng=rng)
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=1.0)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        batch = self._q.get()
        if self.raw:
            return batch
        self.key, sub = jax.random.split(self.key)
        args = self.args
        device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.process_fn is not None:
            return self.process_fn(device_batch, sub)
        return process_train_batch(
            device_batch, sub,
            im_h=args.im_height, im_w=args.im_width,
            noise_scale=float(args.noise_scale),
            random_flip=int(args.random_flip),
            use_spatial=bool(getattr(args, "use_spatial", False)),
            min_std=float(getattr(args, "min_std", 2.0)),
            **norm_statics(args))

    def close(self):
        self._stop.set()
        # drain so workers blocked on put() can exit
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
