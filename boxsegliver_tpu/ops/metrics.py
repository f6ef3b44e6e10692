"""In-graph training metrics (Dice/VOE/VD) and the ConfusionMatrix accumulator.

Re-implements reference loss_metrics.py:261-339 (soft per-batch metrics) and
loss_metrics.py:506-580 (tp/fp/tn/fn accumulator used for "global dice").
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

TRAIN_METRIC_CHOICES = ("Dice", "VOE", "VD")
EVAL_METRIC_CHOICES = ("Dice", "VOE", "RVD", "ASSD", "RMSD", "MSD")


def metric_dice(logits, labels, eps: float = 1e-5, reduce: bool = True):
    """Soft dice over all non-batch axes (reference loss_metrics.py:261-301)."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    axes = tuple(range(1, logits.ndim))
    intersection = jnp.sum(logits * labels, axis=axes)
    left = jnp.sum(logits, axis=axes)
    right = jnp.sum(labels, axis=axes)
    dice = (2.0 * intersection + eps) / (left + right + eps)
    return jnp.mean(dice) if reduce else dice


def metric_voe(logits, labels, eps: float = 1e-5, reduce: bool = True):
    """Volumetric overlap error, percent (reference loss_metrics.py:304-320)."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    axes = tuple(range(1, logits.ndim))
    numerator = jnp.sum(logits * labels, axis=axes)
    denominator = jnp.sum(jnp.clip(logits + labels, 0.0, 1.0), axis=axes)
    voe = 100.0 * (1.0 - numerator / (denominator + eps))
    return jnp.mean(voe) if reduce else voe


def metric_vd(logits, labels, eps: float = 1e-5, reduce: bool = True):
    """Relative volume difference, percent (reference loss_metrics.py:323-339)."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    axes = tuple(range(1, logits.ndim))
    a = jnp.sum(logits, axis=axes)
    b = jnp.sum(labels, axis=axes)
    vd = 100.0 * (jnp.abs(a - b) / (b + eps))
    return jnp.mean(vd) if reduce else vd


# 'rvd' aliases metric_vd: the eval-metric surface names it RVD
# (loss_metrics.py:60) while the train-metric surface names it VD
METRIC_FNS = {"dice": metric_dice, "voe": metric_voe, "vd": metric_vd,
              "rvd": metric_vd}


def build_train_metrics(probs, labels, classes, metric_names):
    """Per-foreground-class train metrics dict keyed '<Class>/<Metric>'
    (reference UNet.py:137-155). `classes` includes 'Background' at index 0.
    probs: [bs, ..., c] softmax output; thresholded at 0.5 like the reference
    <Class>Pred tensors (UNet.py:112-118)."""
    num_classes = len(classes)
    one_hot = jnp.stack([(labels == i).astype(jnp.float32)
                         for i in range(num_classes)], axis=-1)
    out = {}
    for i in range(1, num_classes):
        pred_i = (probs[..., i] > 0.5).astype(jnp.float32)
        for met in metric_names:
            fn = METRIC_FNS[met.lower()]
            out[f"{classes[i]}/{met}"] = fn(pred_i[..., None], one_hot[..., i:i + 1])
    return out


class ConfusionMatrix:
    """tp/fp/tn/fn accumulator for global dice (reference loss_metrics.py:506-580).

    Works on numpy arrays host-side; accumulate with `+=` across cases.
    """

    def __init__(self, test=None, reference=None):
        self.tp = self.fp = self.tn = self.fn = 0
        self.size = 0
        if test is not None and reference is not None:
            self.add(test, reference)

    def add(self, test, reference):
        test = np.asarray(test)
        reference = np.asarray(reference)
        assert test.shape == reference.shape, \
            f"Shape mismatch: {test.shape} and {reference.shape}"
        t = test != 0
        r = reference != 0
        self.tp += int(np.count_nonzero(t & r))
        self.fp += int(np.count_nonzero(t & ~r))
        self.tn += int(np.count_nonzero(~t & ~r))
        self.fn += int(np.count_nonzero(~t & r))
        self.size += reference.size
        return self

    def get_matrix(self):
        return self.tp, self.fp, self.tn, self.fn

    @property
    def global_dice(self):
        denom = 2 * self.tp + self.fp + self.fn
        return 2 * self.tp / denom if denom else 0.0

    @property
    def global_voe(self):
        denom = self.tp + self.fp + self.fn
        return 1.0 - self.tp / denom if denom else 0.0

    @property
    def global_rvd(self):
        if self.tp + self.fn == 0:
            return 0.0
        return abs((self.tp + self.fp) - (self.tp + self.fn)) / (self.tp + self.fn)
