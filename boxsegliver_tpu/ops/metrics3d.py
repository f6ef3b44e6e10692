"""Host-side 3D evaluation metrics: Dice/VOE/RVD + symmetric surface distances.

Re-implements reference loss_metrics.py:342-452 (which delegates to medpy and
utils/surface.Surface) in pure numpy/scipy — same math:

- Dice = 2|A∩B| / (|A|+|B|)                 (medpy.metric.dc)
- VOE  = 1 - |A∩B| / |A∪B|                  (1 - medpy.metric.jc)
- RVD  = | |A| - |B| | / |B|                (abs(medpy.metric.ravd))
- ASSD/RMSD/MSD from symmetric surface distances with physical voxel spacing
  (utils/surface.py via scipy EDT of border voxels)

Also: tumor_detection_metrics (loss_metrics.py:455-503) built on distinct
binary object correspondence matching.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Sequence

import numpy as np
from scipy import ndimage as ndi

ALL_METRICS = ("Dice", "VOE", "RVD", "ASSD", "RMSD", "MSD")
_SURFACE_METRICS = frozenset(("ASSD", "RMSD", "MSD"))


def _surface_distances(a: np.ndarray, b: np.ndarray, sampling) -> np.ndarray:
    """Distances from border voxels of `a` to the border of `b` (one direction)."""
    footprint = ndi.generate_binary_structure(a.ndim, 1)
    a_border = a ^ ndi.binary_erosion(a, structure=footprint, border_value=0)
    b_border = b ^ ndi.binary_erosion(b, structure=footprint, border_value=0)
    dt = ndi.distance_transform_edt(~b_border, sampling=sampling)
    return dt[a_border]


def metric_3d(logits3d: np.ndarray, labels3d: np.ndarray,
              required: Optional[Iterable[str]] = None,
              sampling: Sequence[float] = (1.0, 1.0, 1.0),
              **kwargs) -> Dict[str, float]:
    """3D metrics on binary volumes (reference loss_metrics.py:342-452)."""
    sampling = kwargs.get("sampling", sampling)
    if required is None:
        required = list(ALL_METRICS)
    elif isinstance(required, str):
        required = [required]
    else:
        required = list(required)
    for req in required:
        if req not in ALL_METRICS:
            raise ValueError(f"Not supported metric: {req}")

    if logits3d.ndim > 3:
        logits3d = np.squeeze(logits3d)
    if labels3d.ndim > 3:
        labels3d = np.squeeze(labels3d)
    assert logits3d.shape == labels3d.shape, \
        f"Shape mismatch: {logits3d.shape} vs {labels3d.shape}"
    a = logits3d.astype(bool)
    b = labels3d.astype(bool)

    out: Dict[str, float] = {}
    need_dist = any(r in _SURFACE_METRICS for r in required)
    if need_dist:
        if np.count_nonzero(a) == 0 or np.count_nonzero(b) == 0:
            for r in required:
                if r in _SURFACE_METRICS:
                    out[r] = 0.0
        else:
            d_ab = _surface_distances(a, b, sampling)
            d_ba = _surface_distances(b, a, sampling)
            all_d = np.concatenate([d_ab, d_ba])
            if "ASSD" in required:
                out["ASSD"] = float(all_d.mean()) if all_d.size else 0.0
            if "MSD" in required:
                out["MSD"] = float(all_d.max()) if all_d.size else 0.0
            if "RMSD" in required:
                out["RMSD"] = float(np.sqrt((all_d ** 2).mean())) if all_d.size else 0.0

    inter = np.count_nonzero(a & b)
    sa, sb = np.count_nonzero(a), np.count_nonzero(b)
    if "Dice" in required:
        out["Dice"] = 2.0 * inter / (sa + sb) if (sa + sb) else 0.0
    if "VOE" in required:
        union = np.count_nonzero(a | b)
        out["VOE"] = 1.0 - inter / union if union else 0.0
    if "RVD" in required:
        out["RVD"] = abs(sa - sb) / sb if sb else (0.0 if sa == 0 else np.inf)
    return out


def _object_dice(mask_a: np.ndarray, mask_b: np.ndarray) -> float:
    inter = np.count_nonzero(mask_a & mask_b)
    denom = np.count_nonzero(mask_a) + np.count_nonzero(mask_b)
    return 2.0 * inter / denom if denom else 0.0


def distinct_binary_object_correspondences(result: np.ndarray, reference: np.ndarray,
                                           iou_thresh: float = 0.5,
                                           connectivity: int = 1):
    """Match connected components between result and reference
    (reference utils/array_kits.py:883-984 semantics): iterate REFERENCE
    objects; a reference object overlapped by exactly one unused result
    object is matched when their Dice (the reference computes medpy dc, not
    true IoU, despite the flag name) >= iou_thresh; reference objects
    overlapped by several result objects are resolved afterwards —
    fewest-candidates first, candidates tried in descending overlap area.

    Returns (labeled_res, labeled_ref, n_res, n_ref,
    {ref_obj_id: [res_obj_id, dice]}).
    """
    struct = ndi.generate_binary_structure(result.ndim, connectivity)
    labeled_res, n_res = ndi.label(result.astype(bool), struct)
    labeled_ref, n_ref = ndi.label(reference.astype(bool), struct)

    mapping = {}
    used = set()
    deferred = []  # (ref_id, {res_id: overlap_count})
    for sli, ref_id in zip(ndi.find_objects(labeled_ref), range(1, n_ref + 1)):
        obj_mask = labeled_ref[sli] == ref_id
        res_ids, counts = np.unique(labeled_res[sli][obj_mask],
                                    return_counts=True)
        keep = res_ids != 0
        res_ids, counts = res_ids[keep], counts[keep]
        if len(res_ids) == 1:
            res_id = int(res_ids[0])
            if res_id not in used:
                dice = _object_dice(labeled_ref == ref_id,
                                    labeled_res == res_id)
                if dice >= iou_thresh:
                    mapping[ref_id] = [res_id, dice]
                    used.add(res_id)
        elif len(res_ids) > 1:
            deferred.append((ref_id, {int(r): int(c)
                                      for r, c in zip(res_ids, counts)}))

    # one-to-many resolution: fewest remaining candidates first, candidates
    # popped in descending overlap area (reference Jset.pop, :856-862)
    while True:
        deferred = [(rid, {r: c for r, c in cand.items() if r not in used})
                    for rid, cand in deferred]
        deferred = sorted((d for d in deferred if d[1]),
                          key=lambda x: len(x[1]))
        if not deferred:
            break
        ref_id, cand = deferred[0]
        ref_mask = labeled_ref == ref_id
        for res_id, _ in sorted(cand.items(), key=lambda x: -x[1]):
            dice = _object_dice(ref_mask, labeled_res == res_id)
            if dice >= iou_thresh:
                mapping[ref_id] = [res_id, dice]
                used.add(res_id)
                break
        deferred = deferred[1:]
    return labeled_res, labeled_ref, n_res, n_ref, mapping


def tumor_detection_metrics(result: np.ndarray, reference: np.ndarray,
                            iou_thresh: float = 0.5, connectivity: int = 1,
                            verbose: bool = False, logger=None, name: str = ""):
    """Per-lesion detection metrics (reference loss_metrics.py:455-503)."""
    _, _, n_res, n_ref, mapping = distinct_binary_object_correspondences(
        result, reference, iou_thresh, connectivity)
    tp = len(mapping)
    fp = n_res - tp
    precision = tp / n_res if n_res else np.inf
    recall = tp / n_ref if n_ref else np.inf
    ret = {"tp": tp, "fp": fp, "pos": n_ref, "precision": precision, "recall": recall}
    if verbose:
        info = (f"{name} TPs: {tp:3d} FPs: {fp:3d} Pos: {n_ref:3d} "
                f"Precision: {precision:.3f} Recall: {recall:.3f}")
        (logger.info if logger is not None else print)(info)
    return ret
