"""2D→3D cascade: a frozen 2D model's per-slice predictions become an extra
input channel for the 3D network.

Re-implements reference entry/infer_2d.py:32-128 ``InferenceWithGuide2D`` +
its use in the 3D pipeline (DataLoader/NF/input_pipeline_3d.py:474-539):
the 2D model runs with TTA mirrors over all slices; the resulting 3D binary
mask feeds the 3D net either as a binary channel or as an exp(-EDT/τ)
boundary-distance channel.  Training-time variants (gen_kernel,
input_pipeline_3d.py:508-534): the click-guided 2D model only runs on slices
that carry foreground clicks (CascadeClick2D), or a GT-oracle channel takes
the label slice at the first click's z (gt_cascade_channel).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
from scipy import ndimage as ndi


def inner_boundaries(mask: np.ndarray) -> np.ndarray:
    """Per-slice inner boundary pixels (skimage find_boundaries(mode='inner')
    equivalent for 2D slices: object pixels with a background 4-neighbor)."""
    mask = mask.astype(bool)
    eroded = ndi.binary_erosion(mask, ndi.generate_binary_structure(2, 1),
                                border_value=1)
    return mask & ~eroded


def edt_cascade_channel(slice_masks: np.ndarray, zs, tau: float = 25.0
                        ) -> np.ndarray:
    """exp(-EDT/τ) around the inner boundaries of the given slices
    (reference gen_kernel, input_pipeline_3d.py:512-519)."""
    boundaries = np.zeros(slice_masks.shape, bool)
    for z in zs:
        z = int(z)
        boundaries[z] = inner_boundaries(slice_masks[z])
    dist = ndi.distance_transform_edt(~boundaries)
    return np.exp(-dist / max(tau, 1e-6)).astype(np.float32)


def gt_cascade_channel(lab_patch: np.ndarray, fg_pts: np.ndarray,
                       binary: bool = True, tau: float = 25.0) -> np.ndarray:
    """GT-oracle cascade channel: the label slice at the FIRST foreground
    click's z, binary or boundary-EDT (reference gen_kernel 'not use_2d'
    branch, input_pipeline_3d.py:521-534)."""
    out = np.zeros(lab_patch.shape, np.float32)
    valid = fg_pts[fg_pts[:, 0] >= 0] if fg_pts.size else fg_pts
    if valid.shape[0] == 0:
        return out
    z = int(valid[0, 0])
    if binary:
        out[z] = (lab_patch[z] > 0).astype(np.float32)
        return out
    masks = np.zeros(lab_patch.shape, np.uint8)
    masks[z] = lab_patch[z] > 0
    return edt_cascade_channel(masks, [z], tau)


class CascadeClick2D:
    """Click-guided frozen-2D cascade for 3D TRAINING patches (reference
    InferenceWithGuide2D.get_pred_2d, entry/infer_2d.py:81-128): the 2D
    interactive model runs only on slices containing foreground clicks, with
    Gaussian click guides (stddev 5) and lr/ud/both mirror TTA.

    predict_fn: {"images": [1, H, W, C], "sp_guide": [1, H, W, 2]} → probs.
    """

    def __init__(self, predict_fn: Callable, im_height: int, im_width: int,
                 im_channel: int = 3, stddev: float = 5.0,
                 fg_index: int = 1, eval_mirror: bool = True):
        self.predict_fn = predict_fn
        self.pshape = (im_height, im_width)
        self.channel = im_channel
        self.stddev = stddev
        self.fg_index = fg_index
        self.eval_mirror = eval_mirror

    def _slice_pred(self, stack: np.ndarray, fg: np.ndarray, bg: np.ndarray
                    ) -> np.ndarray:
        from boxsegliver_tpu.ops.array_kits import \
            create_gaussian_distribution_v2

        h, w = stack.shape[:2]
        nz = stack > 0
        if nz.any():
            vals = stack[nz]
            stack = stack.copy()
            stack[nz] = (vals - vals.mean()) / (vals.std() + 1e-8)

        def guide_of(pts):
            if pts.shape[0] == 0:
                return np.zeros((h, w, 1), np.float32)
            stds = np.full(pts.shape, self.stddev, np.float32)
            return create_gaussian_distribution_v2((h, w), pts, stds,
                                                   keepdims=True)

        guide = np.concatenate([guide_of(fg), guide_of(bg)], axis=-1)
        feats = {"images": stack[None].astype(np.float32),
                 "sp_guide": guide[None].astype(np.float32)}
        probs = np.asarray(self.predict_fn(feats), np.float32)
        count = 1
        if self.eval_mirror:
            for axes in ((2,), (1,), (1, 2)):
                flipped = {k: np.ascontiguousarray(np.flip(v, axis=axes))
                           for k, v in feats.items()}
                p = np.asarray(self.predict_fn(flipped), np.float32)
                probs = probs + np.flip(p, axis=axes)
                count += 1
        return (probs[0] / count).argmax(-1) == self.fg_index

    def pred_from_clicks(self, patch: np.ndarray, fg_pts: np.ndarray,
                         bg_pts: np.ndarray):
        """patch [d, h, w] raw values; fg/bg_pts [n, 3] (z, y, x), -1 padded.
        Returns (mask [d, h, w] uint8, zs of predicted slices)."""
        fg_pts = fg_pts[fg_pts[:, 0] >= 0] if fg_pts.size else fg_pts
        bg_pts = bg_pts[bg_pts[:, 0] >= 0] if bg_pts.size else bg_pts
        d = patch.shape[0]
        scale = np.array([1.0, self.pshape[0] / patch.shape[1],
                          self.pshape[1] / patch.shape[2]])
        zoomed = ndi.zoom(patch.astype(np.float32), scale, order=1)
        fg = fg_pts * scale
        bg = bg_pts * scale if bg_pts.shape[0] else bg_pts
        lh = (self.channel - 1) // 2
        rh = self.channel - 1 - lh
        mask = np.zeros(zoomed.shape, np.uint8)
        zs = np.unique(fg[:, 0].astype(np.int64)) if fg.shape[0] else []
        for z in zs:
            z = int(z)
            stack = np.zeros(self.pshape + (self.channel,), np.float32)
            for k in range(self.channel):
                src = z - lh + k
                if 0 <= src < d:
                    stack[..., k] = zoomed[src]
            fg_z = fg[fg[:, 0].astype(np.int64) == z, 1:]
            bg_z = bg[bg[:, 0].astype(np.int64) == z, 1:] if bg.shape[0] \
                else np.zeros((0, 2), np.float32)
            mask[z] = self._slice_pred(stack, fg_z, bg_z)
        back = ndi.zoom(mask, 1.0 / scale, order=0)
        return back[:d, :patch.shape[1], :patch.shape[2]], zs

    def extra_channel_from_clicks(self, patch: np.ndarray, fg_pts: np.ndarray,
                                  bg_pts: np.ndarray, binary: bool = True,
                                  tau: float = 25.0) -> np.ndarray:
        """Training cascade channel (reference gen_kernel use_2d branch)."""
        mask, zs = self.pred_from_clicks(patch, fg_pts, bg_pts)
        if len(zs) == 0:
            return np.zeros(patch.shape, np.float32)
        if binary:
            return mask.astype(np.float32)
        return edt_cascade_channel(mask, zs, tau)


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
