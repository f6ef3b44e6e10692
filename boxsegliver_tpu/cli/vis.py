"""Drive an exported model for visualization (reference export_dir/vis.py:
27-110 + vis_nf.py): run the StableHLO serving artifact over a prepared case
and write prediction overlay PNGs + optional guide renders.

    python -m boxsegliver_tpu.cli.vis --export_dir <model_dir>/export \
        --dataset_dir data/synthetic --pid 0 --out vis_out
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from boxsegliver_tpu.utils.compile_cache import ensure_compile_cache

ensure_compile_cache()  # also makes JAX_PLATFORMS authoritative


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--export_dir", required=True)
    parser.add_argument("--dataset_dir", required=True)
    parser.add_argument("--pid", type=int, default=0)
    parser.add_argument("--out", default="vis_out")
    parser.add_argument("--im_channel", type=int, default=3)
    args = parser.parse_args(argv)

    from boxsegliver_tpu.cli.export import load_exported
    from boxsegliver_tpu.data.meta import load_meta
    from boxsegliver_tpu.evaluators.eval_loader import parse_case_eval
    from boxsegliver_tpu.utils.viewer import save_case_overlays

    serve, signature = load_exported(args.export_dir)
    bs, h, w, c = signature["inputs"]["images"][0]

    metas = {int(m["PID"]): m for m in load_meta(args.dataset_dir)}
    case = parse_case_eval(metas[args.pid], args.dataset_dir,
                           im_channel=args.im_channel)
    preds = np.zeros((case.depth,) + case.segmentation.shape[1:], np.uint8)
    stack_c = case.lhc + case.rhc + 1
    for z0 in range(0, case.depth, bs):
        batch = np.zeros((bs, h, w, c), np.float32)
        n = min(bs, case.depth - z0)
        for j in range(n):
            img = np.transpose(case.volume[z0 + j:z0 + j + stack_c], (1, 2, 0))
            batch[j, :img.shape[0], :img.shape[1]] = img[:h, :w, :c]
        feats = {"images": batch}
        for key, (shape, dtype) in signature["inputs"].items():
            if key not in feats:
                feats[key] = (np.full(shape, 0.5, np.float32)
                              if key == "sp_guide"
                              else np.zeros(shape, np.float32))
        probs = np.asarray(serve(feats))
        import cv2
        for j in range(n):
            p = probs[j].argmax(-1).astype(np.uint8)
            preds[z0 + j] = cv2.resize(
                p, case.segmentation.shape[1:][::-1],
                interpolation=cv2.INTER_NEAREST)

    vol = case.volume[case.lhc:case.lhc + case.depth]
    out = save_case_overlays(vol, case.segmentation, preds, args.out,
                             f"case-{args.pid}")
    print(f"Overlays written to {out}")


if __name__ == "__main__":
    main()
