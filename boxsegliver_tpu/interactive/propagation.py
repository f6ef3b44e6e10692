"""Guide propagation for interactive full-volume evaluation.

Re-implements the reference EvalImage3DLoader state machine (reference
DataLoader/Liver/input_pipeline_g.py:1179-1513): a user prior (ellipse on each
tumor's middle slice + z-range, prior.json) seeds Gaussian spatial guides; the
volume is swept Forward then Backward slice by slice; after each slice the
prediction is filtered (objects without a matching guide are false positives:
guide peak under threshold, or no monotone-ascent line from the object's
guide peak to a guide center) and the surviving objects' robust moments become
the next slice's guides; tumors leaving their user-declared z-range are
terminated.

TPU redesign: the reference feeds batch-size-1 slices plus separate mirror
passes; here one fixed-shape [n_mirrors, ph, pw, c] batch carries all TTA
variants of a slice in a single dispatch.
"""

from __future__ import annotations

import copy
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
from scipy import ndimage as ndi

from boxsegliver_tpu.evaluators.eval_loader import EvalCase
from boxsegliver_tpu.ops import array_kits

GUIDE_BG = 0.5


def mirror_variants(random_flip: int, eval_mirror: bool) -> List[Tuple[int, ...]]:
    """Flip-axis sets for TTA: axis 1 = height, axis 2 = width (of NHWC)."""
    out: List[Tuple[int, ...]] = [()]
    if eval_mirror:
        if random_flip & 1:
            out.append((2,))
        if random_flip & 2:
            out.append((1,))
        if random_flip & 3 == 3:
            out.append((1, 2))
    return out


class GuidePropagationLoader:
    """One case's interactive sweep state (see module docstring)."""

    def __init__(self, case: EvalCase, prior_case: Dict[str, List[Dict]],
                 args, context: Optional[np.ndarray] = None):
        import cv2

        self.case = case
        self.args = args
        self.pshape = (args.im_height, args.im_width)
        self.min_std = float(getattr(args, "min_std", 2.0))
        self.eval_discount = float(getattr(args, "eval_discount", 0.85))
        self.filter_thresh = 0.15 + GUIDE_BG
        self.flips = mirror_variants(getattr(args, "random_flip", 3),
                                     getattr(args, "eval_mirror", False))
        self.context = context
        self.prior = prior_case or {}
        self.disc = ndi.generate_binary_structure(2, connectivity=1)

        # resize the whole cropped volume (with channel padding) once
        vol = np.transpose(case.volume, (1, 2, 0))       # [ch, cw, cz+lhc+rhc]
        if vol.shape[:2] != self.pshape:
            vol = cv2.resize(vol, (self.pshape[1], self.pshape[0]),
                             interpolation=cv2.INTER_LINEAR)
        self.pvol = vol                                   # [ph, pw, z]
        self.channels = case.lhc + case.rhc + 1

        self.direction = "Forward"
        self.last_info: List[Dict] = []
        self.curr_info: List[Dict] = []
        self._last_guide: Optional[np.ndarray] = None
        self._last_pred: Optional[np.ndarray] = None
        self.sid = None
        self.sp_guides: List[np.ndarray] = []

    # ------------------------------------------------------------------
    # slice feature assembly
    # ------------------------------------------------------------------

    def slice_features(self, idx: int) -> Dict[str, np.ndarray]:
        """[n_mirror, ph, pw, c] image stack + guide for cropped slice idx."""
        case = self.case
        self.sid = idx + case.crop[0]

        img = self.pvol[..., idx:idx + self.channels]     # [ph, pw, c]

        # merge user prior at this slice with propagated guides
        self.curr_info = []
        user = self.prior.get(str(self.sid), [])
        z1, _, y1, _, x1, _ = case.crop
        ch, cw = case.volume.shape[1:]
        for obj in copy.deepcopy(user):
            if np.min(obj["stddev"]) > self.min_std:
                obj["center"] = [
                    int((obj["center"][0] - y1) / ch * self.pshape[0]),
                    int((obj["center"][1] - x1) / cw * self.pshape[1])]
                self.curr_info.append(obj)
        self.curr_info.extend(self.last_info)

        if self.curr_info:
            centers = [o["center"] for o in self.curr_info]
            stddevs = [np.maximum(o["stddev"], self.min_std) for o in self.curr_info]
            guide = array_kits.create_gaussian_distribution_v2(
                self.pshape, centers, stddevs) * self.eval_discount
            self._last_guide = guide / 2 + GUIDE_BG
        else:
            self._last_guide = np.full(self.pshape, GUIDE_BG, np.float32)
        self.sp_guides.append(self._last_guide.copy())

        n = len(self.flips)
        images = np.zeros((n,) + self.pshape + (self.channels,), np.float32)
        guides = np.zeros((n,) + self.pshape + (1,), np.float32)
        for i, axes in enumerate(self.flips):
            im, gd = img, self._last_guide[..., None]
            for ax in axes:
                im = np.flip(im, axis=ax - 1)   # slice arrays lack batch dim
                gd = np.flip(gd, axis=ax - 1)
            images[i] = im
            guides[i] = gd
        feats = {"images": images, "sp_guide": guides}
        if self.context is not None:
            feats["context"] = np.tile(self.context[self.sid][None], (n, 1))
        return feats

    def merge_mirrors(self, probs: np.ndarray) -> np.ndarray:
        """Flip back + average the [n_mirror, ph, pw, nc] TTA probs."""
        acc = np.zeros(probs.shape[1:], np.float32)
        for i, axes in enumerate(self.flips):
            p = probs[i]
            for ax in axes:
                p = np.flip(p, axis=ax - 1)
            acc += p
        return acc / len(self.flips)

    # ------------------------------------------------------------------
    # sweeps
    # ------------------------------------------------------------------

    def sweep(self, direction: str) -> Iterator[int]:
        """Yield cropped-slice indices in sweep order, resetting state."""
        self.direction = direction
        self.last_info = []
        self._last_pred = None
        self.sp_guides = []
        idxs = range(self.case.depth)
        return iter(idxs if direction == "Forward" else reversed(idxs))

    def save_guides(self, save_dir):
        """Dump this sweep's propagated guide volume as
        guide-{F|B}-<pid>.nii.gz, rescaled to the original frame with
        GUIDE_BG padding (reference --save_sp_guide,
        input_pipeline_g.py:1478-1496; values stored ×255 int16)."""
        from pathlib import Path

        import cv2

        from boxsegliver_tpu.data import nii as nii_kits

        if not self.sp_guides:
            return None
        case = self.case
        vol = np.stack(self.sp_guides, axis=0)            # [cz, ph, pw]
        if self.direction == "Backward":
            vol = vol[::-1]
        z1, z2, y1, y2, x1, x2 = case.crop
        ch, cw = y2 - y1, x2 - x1
        if vol.shape[1:] != (ch, cw):
            out = np.empty((vol.shape[0], ch, cw), np.float32)
            for z in range(vol.shape[0]):
                out[z] = cv2.resize(vol[z], (cw, ch),
                                    interpolation=cv2.INTER_LINEAR)
            vol = out
        arr = (vol * 255).astype(np.int16)
        d, h, w = case.oshape
        arr = np.pad(arr, ((z1, d - z2), (y1, h - y2), (x1, w - x2)),
                     mode="constant",
                     constant_values=np.int16(GUIDE_BG * 255))
        save_dir = Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        out_path = save_dir / f"guide-{self.direction[0]}-{case.pid}.nii.gz"
        nii_kits.write_nii(arr, out_path, zooms=case.spacing)
        return out_path

    @property
    def forward(self) -> bool:
        return self.direction == "Forward"

    # ------------------------------------------------------------------
    # prediction write-back (the core state machine)
    # ------------------------------------------------------------------

    def set_last_pred(self, new_pred: np.ndarray) -> np.ndarray:
        """Filter the binary [ph, pw] prediction against current guides and
        compute next-slice guide moments (reference last_pred.setter,
        input_pipeline_g.py:1249-1330).  Returns the FILTERED prediction
        (kept objects only) to be stored as this slice's output."""
        self.last_info = []
        if new_pred is None or new_pred.max() == 0:
            self._last_pred = None
            return np.zeros(self.pshape, np.uint8)
        assert self._last_guide is not None
        new_pred = new_pred.astype(np.uint8).copy()
        kept = new_pred.copy()

        labeled, n_objs = ndi.label(new_pred, self.disc)
        for i, slicer in enumerate(ndi.find_objects(labeled)):
            obj = (labeled == i + 1)[slicer]
            masked_guide = obj * self._last_guide[slicer]
            # 1. no guide support → false positive
            if masked_guide.max() < self.filter_thresh:
                kept[slicer][obj] = 0
                continue
            # 2. match object to a guide: its guide-peak must be a center or
            #    connect to the nearest center by a monotone ascent line
            peak = np.asarray(np.unravel_index(masked_guide.argmax(),
                                               masked_guide.shape))
            peak[0] += slicer[0].start
            peak[1] += slicer[1].start
            found = -1
            for j, o in enumerate(self.curr_info):
                if np.all(peak == o["center"]):
                    found = j
                    break
            if found < 0:
                dists = np.sum([(peak - o["center"]) ** 2
                                for o in self.curr_info], axis=1)
                for j in np.argsort(dists):
                    ctr = self.curr_info[j]["center"]
                    if tuple(peak) == tuple(ctr) or array_kits.ascent_line(
                            self._last_guide, peak[1], peak[0], ctr[1], ctr[0]):
                        found = j
                        break
            if found < 0:
                # reference raises here; be permissive: treat as FP
                kept[slicer][obj] = 0
                continue
            # 3. z-range termination: remove finished tumors from the
            #    propagation state (the OUTPUT volume keeps the raw probs;
            #    reference input_pipeline_g.py:1316-1321)
            zr = self.curr_info[found]["z"]
            if (self.forward and self.sid >= zr[1]) or \
                    (not self.forward and self.sid <= zr[0]):
                kept[slicer][obj] = 0
                continue
            # 4. propagate moments to the next slice
            ctr, std = array_kits.compute_robust_moments(
                obj, indexing="ij", min_std=self.min_std)
            ctr = [int(ctr[0] + slicer[0].start), int(ctr[1] + slicer[1].start)]
            self.last_info.append({"z": list(zr), "center": ctr,
                                   "stddev": list(std)})
        self._last_pred = kept
        return kept
