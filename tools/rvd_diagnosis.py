"""Decompose the band-v3 ladder's elevated NF/RVD into its physical sources.

Round-4 verdict weak #3: the 256² band-v3 ladder's winning rungs carry
NF/RVD ≈ 0.49–0.55 (vs ≈0.23 on the round-3 128² band-v1 ladder) — a ~50%
relative volume error that the Dice-only narrative never explained.  RVD here
is | |pred| − |gt| | / |gt| (ops/metrics3d.py:87, abs(medpy.ravd)).

This tool splits each test case's volume error into its three mechanisms:

  pred_vol − gt_vol =  halo          (matched lesions predicted fat)
                     + fp_volume     (predicted objects matching NO gt lesion
                                      — distractor twins taken for lesions)
                     − miss_volume   (gt lesions with no prediction)

using the reference's own object-correspondence machinery
(ops/metrics3d.distinct_binary_object_correspondences, reference
utils/loss_metrics.py:823-876).

  python tools/rvd_diagnosis.py save <rung> <seed>     # chip: eval with -s
  python tools/rvd_diagnosis.py analyze <rung> <seed>  # host: decompose
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.run_ladder import BASE, DATA_ROOT, DATASET, MODEL_ROOT, RUNGS, run  # noqa: E402


def _model_dir(rung: str, seed: int) -> Path:
    return MODEL_ROOT / (rung if seed == 1 else f"{rung}_s{seed}")


def save(rung: str, seed: int) -> None:
    """Re-run the rung's eval with prediction saving (chip; ~1 min warm)."""
    spec = RUNGS[rung]
    model_dir = _model_dir(rung, seed)
    base = list(BASE) + ([] if seed == 1 else ["--seed", str(seed)])
    run([sys.executable, "-m", "boxsegliver_tpu.cli.main", spec["task"],
         "--mode", "eval", "--tag", model_dir.name, "--model_dir", model_dir,
         "--eval_final", "-s"] + base + spec["flags"], cwd=REPO, check=True)


def analyze(rung: str, seed: int) -> dict:
    from boxsegliver_tpu.data.nii import read_nii
    from boxsegliver_tpu.ops.metrics3d import \
        distinct_binary_object_correspondences

    pred_dir = _model_dir(rung, seed) / "prediction"
    rows, tot = [], dict(gt=0, pred=0, halo=0, fp=0, miss=0)
    for f in sorted(pred_dir.glob("predict-*.nii.gz")):
        pid = int(f.stem.split("-")[1].split(".")[0])
        _, pred = read_nii(f, out_dtype=np.uint8)
        pred = pred >= 1
        gt = np.load(DATA_ROOT / DATASET / f"volume-{pid}" /
                     "segmentation.npy") >= 1
        lab_res, lab_ref, n_res, n_ref, mapping = \
            distinct_binary_object_correspondences(pred, gt)
        matched_res = {int(v[0]) for v in mapping.values()}
        matched_ref = {int(k) for k in mapping}
        vol = dict(
            gt=int(gt.sum()), pred=int(pred.sum()),
            matched_pred=int(np.isin(lab_res, sorted(matched_res)).sum()),
            matched_gt=int(np.isin(lab_ref, sorted(matched_ref)).sum()),
        )
        fp_vol = vol["pred"] - vol["matched_pred"]
        miss_vol = vol["gt"] - vol["matched_gt"]
        halo = vol["matched_pred"] - vol["matched_gt"]
        rvd = abs(vol["pred"] - vol["gt"]) / vol["gt"] if vol["gt"] else 0.0
        rows.append(dict(pid=pid, gt_vox=vol["gt"], pred_vox=vol["pred"],
                         rvd=round(rvd, 3), n_gt=n_ref, n_pred=n_res,
                         tp=len(mapping), fp_objs=n_res - len(mapping),
                         halo_vox=halo, fp_vox=fp_vol, miss_vox=miss_vol))
        tot["gt"] += vol["gt"]; tot["pred"] += vol["pred"]
        tot["halo"] += halo; tot["fp"] += fp_vol; tot["miss"] += miss_vol
    hdr = ("pid  gt_vox pred_vox   RVD  nGT nPred TP FPobj   halo     fp   miss")
    print(hdr)
    for r in rows:
        print(f"{r['pid']:3d} {r['gt_vox']:7d} {r['pred_vox']:8d} "
              f"{r['rvd']:5.3f} {r['n_gt']:4d} {r['n_pred']:5d} "
              f"{r['tp']:2d} {r['fp_objs']:5d} {r['halo_vox']:6d} "
              f"{r['fp_vox']:6d} {r['miss_vox']:6d}")
    net = tot["pred"] - tot["gt"]
    print(f"TOTAL gt={tot['gt']} pred={tot['pred']} net={net:+d} "
          f"(halo {tot['halo']:+d}, fp {tot['fp']:+d}, miss -{tot['miss']})")
    out = dict(rung=rung, seed=seed, cases=rows, total=tot)
    print("RVDDIAG", json.dumps(out))
    return out


if __name__ == "__main__":
    cmd, rung, seed = sys.argv[1], sys.argv[2], int(sys.argv[3])
    (save if cmd == "save" else analyze)(rung, seed)
