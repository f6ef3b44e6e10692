"""Cheap 2D online evaluation: batch-metric averaging over fixed val batches.

Re-implements the reference's default inline eval mode (reference
evaluators/evaluator_liver.py:164-332, 2D branch: average the in-graph batch
metrics over ``--eval_num_batches_per_epoch`` batches of the eval_online
dataset, optionally accumulating a ConfusionMatrix for "global dice" under
``--use_global_dice``) and the interactive pipeline's validation loader
(reference NF/input_pipeline_g_simply.py:668-686 ``get_val_loader``: fixed
numpy seed 1234, fixed zoom).

TPU-first shape: the val batches are sampled ONCE at construction with a fixed
RNG (so every epoch scores the same data), kept as host arrays, and pushed
through the deterministic eval-mode device processing + the trainer's compiled
predict step each epoch.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# surface metrics (ASSD/RMSD/MSD) need full volumes and are only produced by
# the 3D evaluators (reference 2D mode has the same gap) — METRIC_FNS simply
# has no entry for them here
from boxsegliver_tpu.ops.metrics import METRIC_FNS as _METRIC_FNS
from boxsegliver_tpu.ops.metrics import ConfusionMatrix

EVAL_SEED = 1234


class OnlineEval2D:
    """eval_fn(trainer) -> {'<Class>/<Metric>': float} over fixed batches.

    sampler: any sampler with ``sample_batch(bs, rng=...)`` (TrainSampler or
    InterSampler built on the eval split); process_fn(batch, key) -> (features,
    labels) must be the DETERMINISTIC eval-mode processing (train=False).
    """

    def __init__(self, sampler, args, process_fn: Callable,
                 classes: Sequence[str], num_batches: int = 0,
                 use_global_dice: bool = False):
        rng = np.random.RandomState(EVAL_SEED)
        n = num_batches or int(getattr(args, "eval_num_batches_per_epoch", 100))
        self.batches: List[Dict[str, np.ndarray]] = [
            sampler.sample_batch(args.batch_size, rng=rng) for _ in range(n)]
        self.process_fn = jax.jit(process_fn)
        self.classes = list(classes)  # includes Background at index 0
        self.metric_names = list(getattr(args, "metrics_eval", ["Dice"]))
        self.use_global_dice = use_global_dice
        self._key = jax.random.PRNGKey(EVAL_SEED)
        # ALL per-batch metric math happens in ONE jitted call returning a
        # dict of scalars.  The first implementation called the jnp metric
        # fns eagerly on host arrays — on a tunneled TPU backend every eager
        # op is a network round trip, and 100 batches x classes x metrics x
        # ~8 ops made each epoch-end eval cost minutes instead of seconds.
        self._metrics_fn = jax.jit(self._batch_metrics)

    def _batch_metrics(self, probs, labels) -> Dict[str, jnp.ndarray]:
        out: Dict[str, jnp.ndarray] = {}
        for i, cls in enumerate(self.classes):
            if i == 0:
                continue
            pred_i = (probs[..., i] > 0.5).astype(jnp.float32)
            lab_i = (labels == i).astype(jnp.float32)
            for met in self.metric_names:
                fn = _METRIC_FNS.get(met.lower())
                if fn is None:  # surface metrics need volumes, skip in 2D
                    continue
                if met.lower() in ("vd", "rvd"):
                    # Relative volume error is undefined on an empty GT
                    # sample (the formula divides by ~0 and one such sample
                    # makes the epoch mean ~1e7, as observed in the round-5
                    # full-length run).  Deviation from the raw reference
                    # batch mean (loss_metrics.py:323-339 has no guard):
                    # mask empty-GT samples out of the mean — medpy's
                    # offline RVD likewise requires a non-empty reference.
                    per = fn(pred_i[..., None], lab_i[..., None],
                             reduce=False)
                    axes = tuple(range(1, lab_i.ndim))
                    present = (jnp.sum(lab_i, axis=axes) > 0)
                    present = present.astype(jnp.float32)
                    out[f"_masked_sum/{cls}/{met}"] = jnp.sum(per * present)
                    out[f"_masked_n/{cls}/{met}"] = jnp.sum(present)
                else:
                    out[f"{cls}/{met}"] = fn(pred_i[..., None],
                                             lab_i[..., None])
            if self.use_global_dice:
                t, r = pred_i != 0, lab_i != 0
                out[f"_cm/tp/{cls}"] = jnp.sum(t & r)
                out[f"_cm/fp/{cls}"] = jnp.sum(t & ~r)
                out[f"_cm/tn/{cls}"] = jnp.sum(~t & ~r)
                out[f"_cm/fn/{cls}"] = jnp.sum(~t & r)
        return out

    def __call__(self, trainer) -> Dict[str, float]:
        sums: Dict[str, float] = {}
        cms = {cls: ConfusionMatrix() for cls in self.classes[1:]}
        count = 0
        for batch in self.batches:
            features, labels = self.process_fn(batch, self._key)
            probs = trainer.predict(features)
            vals = jax.device_get(self._metrics_fn(probs, labels))
            if count == 0:
                self._image_summaries(trainer, features,
                                      np.asarray(jax.device_get(labels)),
                                      np.asarray(jax.device_get(probs)))
            count += 1
            for key, val in vals.items():
                if key.startswith("_cm/"):
                    _, kind, cls = key.split("/")
                    cm = cms[cls]
                    setattr(cm, kind, getattr(cm, kind) + int(val))
                    if kind == "tp":  # count each batch's pixels once
                        cm.size += int(np.prod(np.shape(labels)))
                else:
                    sums[key] = sums.get(key, 0.0) + float(val)
        out = {k: v / max(count, 1) for k, v in sums.items()
               if not k.startswith("_masked_")}
        # presence-masked means (RVD/VD): sum over contributing samples
        # across ALL batches / number of contributing samples
        for key in [k for k in sums if k.startswith("_masked_sum/")]:
            tail = key[len("_masked_sum/"):]
            n = sums.get(f"_masked_n/{tail}", 0.0)
            out[tail] = sums[key] / n if n > 0 else 0.0
        if self.use_global_dice:
            for cls, cm in cms.items():
                out[f"{cls}/GlobalDice"] = cm.global_dice
        return out

    def _image_summaries(self, trainer, features, labels, probs):
        """Input / label / prediction / guide image summaries of the first
        eval sample each epoch (reference _build_summaries,
        NetworksV2/GUNet.py:435-487 writes the same panels in-graph)."""
        summary = getattr(trainer, "summary", None)
        if summary is None:
            return
        step = trainer.global_step
        img = np.asarray(features["images"][0])
        mid = img[..., img.shape[-1] // 2]
        lo, hi = float(mid.min()), float(mid.max())
        summary.image("eval/image", (mid - lo) / (hi - lo + 1e-8), step)
        nc = probs.shape[-1]
        summary.image("eval/label", np.asarray(labels[0]) / max(nc - 1, 1),
                      step)
        summary.image("eval/pred", probs[0].argmax(-1) / max(nc - 1, 1), step)
        if "sp_guide" in features:
            summary.image("eval/guide",
                          np.asarray(features["sp_guide"][0, ..., 0]), step)
