"""2D→3D cascade: a frozen 2D model's per-slice predictions become an extra
input channel for the 3D network.

Re-implements reference entry/infer_2d.py:32-128 ``InferenceWithGuide2D`` +
its use in the 3D pipeline (DataLoader/NF/input_pipeline_3d.py:474-539):
the 2D model runs with TTA mirrors over all slices; the resulting 3D binary
mask feeds the 3D net either as a binary channel or as an exp(-EDT/τ)
boundary-distance channel.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
from scipy import ndimage as ndi


class Cascade2D:
    """Wraps a 2D predict_fn into a volume → extra-channel producer."""

    def __init__(self, predict_fn: Callable, batch_size: int = 8,
                 im_channel: int = 3, eval_mirror: bool = True,
                 channel_mode: str = "binary", tau: float = 5.0,
                 fg_index: int = 1):
        self.predict_fn = predict_fn
        self.batch_size = batch_size
        self.im_channel = im_channel
        self.eval_mirror = eval_mirror
        self.channel_mode = channel_mode  # binary | edt
        self.tau = tau
        self.fg_index = fg_index

    def predict_volume(self, volume: np.ndarray) -> np.ndarray:
        """volume: [d, h, w] normalized → binary mask [d, h, w]
        (2.5D channel stacking with edge z-padding + mirror-averaged TTA)."""
        d, h, w = volume.shape
        lh = (self.im_channel - 1) // 2
        rh = self.im_channel - 1 - lh
        padded = np.concatenate([
            np.repeat(volume[:1], lh, axis=0), volume,
            np.repeat(volume[-1:], rh, axis=0)], axis=0)
        mask = np.zeros((d, h, w), np.uint8)
        bs = self.batch_size
        for z0 in range(0, d, bs):
            n = min(bs, d - z0)
            batch = np.zeros((bs, h, w, self.im_channel), np.float32)
            for j in range(n):
                batch[j] = np.transpose(padded[z0 + j:z0 + j + self.im_channel],
                                        (1, 2, 0))
            probs = np.asarray(self.predict_fn({"images": batch}), np.float32)
            count = 1
            if self.eval_mirror:
                for axes in ((2,), (1,), (1, 2)):
                    flipped = np.flip(batch, axis=axes)
                    p = np.asarray(self.predict_fn(
                        {"images": np.ascontiguousarray(flipped)}), np.float32)
                    probs = probs + np.flip(p, axis=axes)
                    count += 1
            probs /= count
            mask[z0:z0 + n] = (probs[:n].argmax(-1) == self.fg_index)
        return mask

    def extra_channel(self, volume: np.ndarray) -> np.ndarray:
        """[d, h, w] float32 cascade channel (binary or exp(-EDT/tau) around
        the predicted boundary, reference input_pipeline_3d.py:474-539)."""
        mask = self.predict_volume(volume)
        if self.channel_mode == "binary":
            return mask.astype(np.float32)
        # boundary-EDT: distance to the predicted boundary, squashed
        inner = ndi.distance_transform_edt(mask)
        outer = ndi.distance_transform_edt(1 - mask)
        dist = np.where(mask > 0, inner, outer)
        return np.exp(-dist / max(self.tau, 1e-6)).astype(np.float32)
