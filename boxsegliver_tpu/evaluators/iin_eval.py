"""nf2/iin per-tumor patch evaluation: loader + volume reassembly.

Re-implements the reference iin eval protocol (reference
DataLoader/NF/input_pipeline_iin.py:698-864 ``get_dataset_for_eval`` and
evaluators/evaluator_nf.py:470-575 ``_predict_case_v2``): for every lesion in
every slice, crop an expanded bbox (min target size, center-clamped), build
the single-lesion Gaussian guide + the multi-scale image-patch context, run
the model per patch (with optional mirror TTA), and max/min-merge the patch
probabilities back into a full-frame volume (foreground max, background min,
background initialized to 1).

Documented deviations from the reference (whose center logic labels the raw
IMAGE crop instead of the lesion mask, input_pipeline_iin.py:749 — the
commented block :763-774 shows the intended object-splitting):
- click centers: the meta robust-moment center when it lies ON the lesion;
  otherwise the lesion mask inside the bbox is connected-component split and
  per-part medians are used (the intended behavior), with a nearest-lesion-
  pixel fallback instead of the reference's random pixel draw (deterministic);
- stale rows of a final partial batch are zeroed rather than carrying the
  previous batch's features (the reference reuses the buffer, :859-862 — the
  padded rows are stripped either way).
"""

from __future__ import annotations

import logging
import time
from collections import defaultdict
from pathlib import Path
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Tuple

import numpy as np
from scipy import ndimage as ndi

from boxsegliver_tpu.data.meta import IM_SCALE
from boxsegliver_tpu.data.sampler import CaseVolumes, compact_case
from boxsegliver_tpu.data.sampler_iin import CT_PATCH, ct_sizes
from boxsegliver_tpu.ops import array_kits

logger = logging.getLogger("boxsegliver")

NF_EVAL_CLIP = 600.0   # raw gray units (reference input_pipeline_iin.py:809)
NF_INFER_CLIP = 850.0  # the infer path uses a THIRD window (reference :929)
_DISC2 = ndi.generate_binary_structure(2, 2)
_DISC3 = ndi.generate_binary_structure(3, 2)


def load_case_arrays(meta: Dict, dataset_dir, filter_size: int = 0
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """(raw uint16 volume, binary uint8 label) with 3D lesions smaller than
    filter_size zeroed (reference get_dataset_for_eval, :719-727)."""
    vols = CaseVolumes(Path(dataset_dir))
    volume = np.asarray(vols.volume(meta["PID"]))
    lab3d = np.asarray(vols.label(meta["PID"])).copy()
    if filter_size > 0:
        labeled, n = ndi.label(lab3d > 0, _DISC3)
        areas = np.bincount(labeled.ravel(), minlength=n + 1)
        small = np.flatnonzero(areas[1:] < filter_size) + 1
        if small.size:
            lab3d[np.isin(labeled, small)] = 0
    return volume, np.clip(lab3d, 0, 1).astype(np.uint8)


def lesion_centers(lab_plane: np.ndarray, center, bb) -> np.ndarray:
    """Click centers for one per-slice lesion: the meta center when it lies
    on the lesion, else per-CC-part medians (see module docstring)."""
    h, w = lab_plane.shape
    cy = int(min(max(round(center[0]), 0), h - 1))
    cx = int(min(max(round(center[1]), 0), w - 1))
    if lab_plane[cy, cx]:
        return np.array([[cy, cx]], np.float32)
    y1, x1, y2, x2 = [int(v) for v in bb]
    patch = lab_plane[y1:y2, x1:x2] > 0
    labeled, n = ndi.label(patch, _DISC2)
    if n > 1:
        pts = []
        for i in range(1, n + 1):
            yy, xx = np.nonzero(labeled == i)
            pts.append((np.median(yy) + y1, np.median(xx) + x1))
        return np.asarray(pts, np.float32)
    ys, xs = np.nonzero(patch)
    if ys.size == 0:
        return np.array([[cy, cx]], np.float32)
    k = np.argmin((ys + y1 - cy) ** 2 + (xs + x1 - cx) ** 2)
    return np.array([[ys[k] + y1, xs[k] + x1]], np.float32)


def expand_bbox(bb, size: Tuple[int, int], target: Tuple[int, int],
                expand: int = 5) -> Tuple[int, int, int, int]:
    """Expand the lesion bbox, then grow each side to at least the target
    size with center clamping (reference :776-794).  Deviation: when the
    frame itself is smaller than the target the window clamps to the frame
    (the reference's center clamp goes negative there and silently mis-slices
    via numpy negative indexing); the downstream resize-to-target handles the
    smaller crop."""
    h, w = size
    th, tw = target
    y1, x1, y2, x2 = [int(v) for v in bb]
    y1, x1 = max(y1 - expand, 0), max(x1 - expand, 0)
    y2, x2 = min(y2 + expand, h), min(x2 + expand, w)
    if y2 - y1 < th:
        lo, hi = th // 2, th - th // 2  # asymmetric halves: exact for odd th
        yc = (y1 + y2 - 1) // 2
        yc = min(h - hi, max(lo, yc))
        y1, y2 = max(yc - lo, 0), min(yc + hi, h)
    if x2 - x1 < tw:
        lo, hi = tw // 2, tw - tw // 2
        xc = (x1 + x2 - 1) // 2
        xc = min(w - hi, max(lo, xc))
        x1, x2 = max(xc - lo, 0), min(xc + hi, w)
    return y1, x1, y2, x2


def _normalize(img: np.ndarray, zscore: bool) -> np.ndarray:
    """Plain (unmasked) z-score or the fixed eval window (reference
    :805-809; note eval uses clip(0, 600), not the train random window)."""
    img = img.astype(np.float32)
    if zscore:
        return (img - img.mean()) / (img.std() + 1e-8)
    hi = NF_EVAL_CLIP * IM_SCALE
    return np.clip(img, 0.0, hi) / hi


def _context_pyramid(img_norm: np.ndarray, centers: np.ndarray,
                     sizes, channel: int) -> np.ndarray:
    """[32, 32, 3] float32 pyramid from the NORMALIZED crop's middle channel
    around the most central click, per-context re-z-scored (reference
    :819-836).

    Note the reference's train/eval inconsistency is reproduced here for
    output parity: TRAIN context keeps the image's normalization (no
    re-norm, :272-275), EVAL context is additionally per-pyramid z-scored
    (:836) — so an eval-time pyramid is zero-mean regardless of --zscore."""
    import cv2

    mid = np.median(centers, axis=0)
    idx = int(np.argmin(np.sum((centers - mid) ** 2, axis=1)))
    yy, xx = centers[idx].astype(np.int32)
    cy, cx = img_norm.shape[:2]
    plane = img_norm[:, :, channel // 2]
    patches = []
    for s in sizes:
        s = min(int(s), cy, cx)
        oy = min(cy - s, max(0, int(yy) - s // 2))
        ox = min(cx - s, max(0, int(xx) - s // 2))
        patch = np.ascontiguousarray(plane[oy:oy + s, ox:ox + s])
        if s != CT_PATCH:
            patch = cv2.resize(patch, (CT_PATCH, CT_PATCH),
                               interpolation=cv2.INTER_LINEAR)
        patches.append(patch)
    ct = np.stack(patches, axis=-1)
    return (ct - ct.mean()) / (ct.std() + 1e-8)


class IinPatchLoader:
    """Per-case patch-batch generator for one NF case (task nf2)."""

    def __init__(self, meta: Dict, dataset_dir, args):
        self.meta = meta
        self.args = args
        self.case = compact_case(meta)
        self.volume, self.lab3d = load_case_arrays(
            meta, dataset_dir, int(getattr(args, "filter_size", 0)))
        self.target = (args.im_height, args.im_width)
        self.channel = args.im_channel
        self.zscore = bool(getattr(args, "zscore", False))
        self.use_context = bool(getattr(args, "use_context", False))
        self.use_spatial = bool(getattr(args, "use_spatial", False))
        self.ct_sizes = ct_sizes(getattr(args, "ct_base", [32]))
        self.guide_scale = float(getattr(args, "guide_scale", 5.0))
        fs = int(getattr(args, "filter_size", 0))
        # per-slice lesions, small ones dropped (reference parse(), :141-150)
        self.items: List[Tuple[int, np.ndarray, np.ndarray]] = []
        ft = meta["tumor_slices_from_to"]
        for ind, sid in enumerate(self.case["tumor_slices_index"]):
            for k, bb in enumerate(self.case["slices"][ind]):
                if fs > 0 and meta["tumor_slices_areas"][ft[ind] + k] <= fs:
                    continue
                self.items.append((int(sid), np.asarray(bb, np.float32),
                                   np.asarray(self.case["centers"][ind][k],
                                              np.float32)))

    def _patch_features(self, sid: int, bb, center):
        """One lesion patch: normalized 2.5D stack resized to target, guide,
        context, and the stitch-back bbox."""
        import cv2

        d, h, w = self.volume.shape
        th, tw = self.target
        y1, x1, y2, x2 = expand_bbox(bb, (h, w), self.target)
        cy, cx = y2 - y1, x2 - x1
        lh = (self.channel - 1) // 2
        stack = np.zeros((cy, cx, self.channel), np.float32)
        for k in range(self.channel):
            z = sid - lh + k
            if 0 <= z < d:
                stack[..., k] = self.volume[z, y1:y2, x1:x2]
        img = _normalize(stack, self.zscore)

        centers = lesion_centers(self.lab3d[sid], center, bb) \
            - np.array([y1, x1], np.float32)
        feats: Dict[str, np.ndarray] = {}
        if self.use_spatial:
            stds = np.full(centers.shape, self.guide_scale, np.float32)
            sp = array_kits.create_gaussian_distribution_v2(
                (cy, cx), centers, stds)
            if (cy, cx) != (th, tw):
                sp = cv2.resize(sp, (tw, th), interpolation=cv2.INTER_LINEAR)
            feats["sp_guide"] = sp[..., None].astype(np.float32)
        if self.use_context:
            feats["context"] = _context_pyramid(img, centers, self.ct_sizes,
                                                self.channel)
        if (cy, cx) != (th, tw):
            img = cv2.resize(img, (tw, th), interpolation=cv2.INTER_LINEAR)
        feats["images"] = img.astype(np.float32)
        return feats, (y1, x1, y2, x2)

    def batches(self, batch_size: int) -> Iterator[Dict[str, np.ndarray]]:
        """Fixed-shape [bs, ...] feature batches with sid/bb/pads metadata."""
        th, tw = self.target
        buf: Optional[Dict[str, np.ndarray]] = None
        bi = 0
        for sid, bb, center in self.items:
            feats, bbe = self._patch_features(sid, bb, center)
            if buf is None:
                buf = {"images": np.zeros((batch_size, th, tw, self.channel),
                                          np.float32),
                       "sid": np.full((batch_size,), -1, np.int32),
                       "bb": np.full((batch_size, 4), -1, np.int32)}
                if self.use_spatial:
                    buf["sp_guide"] = np.zeros((batch_size, th, tw, 1),
                                               np.float32)
                if self.use_context:
                    buf["context"] = np.zeros(
                        (batch_size, CT_PATCH, CT_PATCH, len(self.ct_sizes)),
                        np.float32)
            for k, v in feats.items():
                buf[k][bi] = v
            buf["sid"][bi] = sid
            buf["bb"][bi] = bbe
            bi += 1
            if bi == batch_size:
                buf["pads"] = 0
                yield buf
                buf, bi = None, 0
        if buf is not None and bi > 0:
            buf["pads"] = batch_size - bi
            yield buf


def mirror_axes(random_flip: int) -> List[tuple]:
    """TTA flip-axes variants for a --random_flip bitmask (NHWC batches)."""
    variants = []
    if random_flip & 1:
        variants.append((2,))
    if random_flip & 2:
        variants.append((1,))
    if random_flip & 3 == 3:
        variants.append((1, 2))
    return variants


def make_patch_predict_tta(model, state, random_flip: int):
    """Jitted mirror-TTA patch forward: all flip variants averaged in ONE
    dispatch (the host loop in predict_batch_tta pays one tunnel round trip
    per mirror; this is the device-resident twin, exact same math)."""
    import jax
    import jax.numpy as jnp

    variants = [()] + mirror_axes(random_flip)
    div = float(len(variants))

    def fwd(feats):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        return jax.nn.softmax(model.apply(variables, feats, train=False), -1)

    @jax.jit
    def run(feats):
        acc = None
        for axes in variants:
            f = dict(feats)
            if axes:
                # context flips too: training flips it jointly with the image
                # (pipeline_iin), so flipped-image + unflipped-context would
                # be out-of-distribution (deviation from the reference's
                # eval_batch_generator, which leaves context unflipped while
                # ITS training flips context with independent coins)
                for k in ("images", "sp_guide", "context"):
                    if k in f:
                        f[k] = jnp.flip(feats[k], axis=axes)
            p = fwd(f)
            if axes:
                p = jnp.flip(p, axis=axes)
            acc = p / div if acc is None else acc + p / div
        return acc

    run.in_graph_tta = True
    return run


def predict_batch_tta(predict_fn: Callable, batch: Dict[str, np.ndarray],
                      mirror_div: int, random_flip: int) -> np.ndarray:
    """Mirror-averaged softmax probs for one patch batch (reference
    eval_batch_generator + _predict_case_v2 accumulation,
    input_pipeline_iin.py:966-990 / evaluator_nf.py:529-536)."""
    feats = {k: batch[k] for k in ("images", "sp_guide", "context")
             if k in batch}
    if getattr(predict_fn, "in_graph_tta", False):
        # device-resident TTA (make_patch_predict_tta): one dispatch total
        return np.asarray(predict_fn(feats), np.float32)
    probs = np.asarray(predict_fn(feats), np.float32) / mirror_div
    if mirror_div > 1:
        for axes in mirror_axes(random_flip):
            # all inputs flip jointly — see make_patch_predict_tta
            f = {k: np.flip(v, axis=axes) for k, v in feats.items()}
            out = np.asarray(predict_fn(f), np.float32)
            probs += np.flip(out, axis=axes) / mirror_div
    return probs


def infer_patch_features(meta: Dict, dataset_dir, args,
                         pos: Tuple[int, int, int]) -> Dict[str, np.ndarray]:
    """Single user-position patch (reference get_image_patch,
    input_pipeline_iin.py:867-963): bbox = target//2 around (y, x) with the
    min-size center clamp, guide at the click, context pyramid, bs=1.
    Note the reference's infer window is clip(0, 850) — a third window,
    distinct from train (500-700) and eval (600)."""
    import cv2

    vols = CaseVolumes(Path(dataset_dir))
    pid = int(meta["PID"])
    volume = np.asarray(vols.volume(pid))
    d, h, w = volume.shape
    si, y, x = [int(v) for v in pos]
    th, tw = args.im_height, args.im_width
    expand = th // 2
    bb = (max(y - expand, 0), max(x - expand, 0),
          min(y + expand, h), min(x + expand, w))
    y1, x1, y2, x2 = expand_bbox(bb, (h, w), (th, tw), expand=0)
    cy, cx = y2 - y1, x2 - x1
    lh = (args.im_channel - 1) // 2
    stack = np.zeros((cy, cx, args.im_channel), np.float32)
    for k in range(args.im_channel):
        z = si - lh + k
        if 0 <= z < d:
            stack[..., k] = volume[z, y1:y2, x1:x2]
    if getattr(args, "zscore", False):
        img = (stack - stack.mean()) / (stack.std() + 1e-8)
    else:
        hi = NF_INFER_CLIP * IM_SCALE
        img = np.clip(stack, 0.0, hi) / hi

    centers = np.array([[y - y1, x - x1]], np.float32)
    feats: Dict[str, np.ndarray] = {"bb": np.array([[y1, x1, y2, x2]],
                                                   np.int32)}
    if getattr(args, "use_spatial", False):
        stds = np.full(centers.shape, float(args.guide_scale), np.float32)
        sp = array_kits.create_gaussian_distribution_v2((cy, cx), centers,
                                                        stds)
        if (cy, cx) != (th, tw):
            sp = cv2.resize(sp, (tw, th), interpolation=cv2.INTER_LINEAR)
        feats["sp_guide"] = sp[None, :, :, None].astype(np.float32)
    if getattr(args, "use_context", False):
        feats["context"] = _context_pyramid(
            img, centers, ct_sizes(getattr(args, "ct_base", [32])),
            args.im_channel)[None]
    if (cy, cx) != (th, tw):
        img = cv2.resize(img, (tw, th), interpolation=cv2.INTER_LINEAR)
    feats["images"] = img[None].astype(np.float32)
    return feats


def run_patch_infer(predict_fn: Callable, meta: Dict, dataset_dir, args
                    ) -> Path:
    """Infer one patch at --pos of --case_id and dump the npz the reference
    writes (evaluator_nf._infer_patch, evaluator_nf.py:421-468)."""
    feats = infer_patch_features(meta, dataset_dir, args,
                                 tuple(args.pos))
    model_in = {k: v for k, v in feats.items() if k != "bb"}
    prob = np.asarray(predict_fn(model_in), np.float32)
    save_path = Path(args.model_dir) / "infer"
    save_path.mkdir(parents=True, exist_ok=True)
    save_dict = {"prob": prob[0], "img": feats["images"][0],
                 "bb": feats["bb"][0]}
    if "context" in feats:
        save_dict["ct"] = feats["context"][0]
    if "sp_guide" in feats:
        save_dict["sp"] = feats["sp_guide"][0]
    out = save_path / ("infer-volume-{}-Pos-{}-{}-{}.npz".format(
        int(meta["PID"]), *args.pos))
    np.savez_compressed(out, **save_dict)
    logger.info("Write to %s", out)
    return out


def merge_patch_probs(logits3d: np.ndarray, probs: np.ndarray,
                      sids: np.ndarray, bbs: np.ndarray, pads: int):
    """Stitch patch probs into the full-frame volume: foreground max-merge,
    background min-merge (reference _predict_case_v2,
    evaluator_nf.py:491-554)."""
    import cv2

    n = probs.shape[0] - int(pads)
    for i in range(n):
        y1, x1, y2, x2 = [int(v) for v in bbs[i]]
        im = probs[i]
        if im.shape[:2] != (y2 - y1, x2 - x1):
            im = cv2.resize(im, (x2 - x1, y2 - y1),
                            interpolation=cv2.INTER_LINEAR)
        si = int(sids[i])
        logits3d[si, y1:y2, x1:x2, 1:] = np.maximum(
            logits3d[si, y1:y2, x1:x2, 1:], im[:, :, 1:])
        logits3d[si, y1:y2, x1:x2, 0] = np.minimum(
            logits3d[si, y1:y2, x1:x2, 0], im[:, :, 0])
