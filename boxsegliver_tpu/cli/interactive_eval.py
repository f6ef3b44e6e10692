"""Standalone interactive evaluation CLI.

Re-implements the reference's interactive drivers as one entry point:
- 2D (reference entry/main_eval.py:43-396): per-slice click refinement with
  a UNetInter-style model until Dice > threshold or the click budget runs out.
- 3D (reference entry/main_eval_3d.py:152-420): whole-volume loop for UNet3D
  (click at the largest 3D error component, optional TTA).

    python -m boxsegliver_tpu.cli.interactive_eval --dim 2 --model UNetInter \
        --tag ... --classes NF --dice_thresh 0.85 --max_iters 10 ...

Reports per-case Dice + interaction counts and the dataset means.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

from boxsegliver_tpu import config as config_mod
from boxsegliver_tpu.utils.logger import setup_logger

from boxsegliver_tpu.utils.compile_cache import ensure_compile_cache

ensure_compile_cache()  # also makes JAX_PLATFORMS authoritative


def build_parser():
    parser = config_mod.build_parser()
    group = parser.add_argument_group(title="Interactive Eval Arguments")
    group.add_argument("--dim", type=int, choices=[2, 3], default=2)
    group.add_argument("--dice_thresh", type=float, default=0.85)
    group.add_argument("--max_iters", type=int, default=10)
    group.add_argument("--guide_stddev", type=float, default=5.0)
    group.add_argument("--guide_kind", type=str, default="gaussian",
                       choices=["gaussian", "euclidean", "geodesic"])
    group.add_argument("--tta", action="store_true",
                       help="8-way mirror TTA in the 3D loop")
    group.add_argument("--device_refine", choices=["on", "off", "auto"],
                       default="auto",
                       help="run the whole click loop on device as ONE "
                            "dispatch per case (interactive/device_refine.py: "
                            "2D = all lesion slices batched, 3D = whole "
                            "volume); off = reference-shaped per-click host "
                            "loop; auto (default) = on except the 2D loop at "
                            ">128^2, where the vmapped in-graph click "
                            "placement measured SLOWER than the host loop "
                            "(round-5 refine_bench: 17.8 vs 6.7 s/case at "
                            "256^2; 0.13-0.26 vs 2.5-6 at 128^2). The 3D "
                            "cascade channel falls back to the host loop "
                            "automatically")
    group.add_argument("--task", type=str, default="synthetic",
                       help="dataset pairing (as in cli.main); 'synthetic' "
                            "auto-generates, anything else resolves "
                            "<data_root>/<dataset>")
    return parser


def build_refiner(args, model, state):
    """Route to the device-resident refinement loop (one dispatch per case)
    or None for the reference-shaped host loop.

    2D: all guide kinds run on device (gaussian/euclidean rendered
    in-graph; geodesic via ops/geodesic.py).  3D: gaussian loop on device;
    the cascade variant keeps the host loop (its GT-oracle channel is
    host-built from the first positive click)."""
    mode = getattr(args, "device_refine", "auto")
    if mode == "off":
        return None
    if mode == "auto" and args.dim == 2 \
            and int(args.im_height) * int(args.im_width) > 128 * 128:
        return None  # measured crossover: host loop wins at 2D >128^2
    mesh = None
    if getattr(args, "num_replicas", 0) and args.num_replicas > 1:
        # multi-chip refinement: shard the slice-batch axis over a data mesh
        # (the reference's interactive eval is single-GPU, entry/main_eval.py)
        from boxsegliver_tpu.parallel import make_mesh
        mesh = make_mesh(args.num_replicas)
    if args.dim == 2:
        from boxsegliver_tpu.interactive.device_refine import DeviceRefiner2D
        return DeviceRefiner2D(
            model, state, dice_thresh=args.dice_thresh,
            max_iters=args.max_iters, stddev=args.guide_stddev,
            guide_kind=args.guide_kind,
            guide_channel=int(args.guide_channel), mesh=mesh)
    if args.dim == 3 and not getattr(args, "use_cascade", False):
        from boxsegliver_tpu.interactive.device_refine import DeviceRefiner3D
        return DeviceRefiner3D(
            model, state, dice_thresh=args.dice_thresh,
            max_iters=args.max_iters, stddev=args.guide_stddev,
            tta=bool(args.tta),
            guide_channel=int(getattr(args, "guide_channel", 1)))
    return None


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    config_mod.check_args(args, parser)
    config_mod.fill_default_args(args)
    logger = setup_logger(args.model_dir, "eval_inter", args.tag)

    from boxsegliver_tpu.cli.main import build_trainer, resolve_dataset_dir
    from boxsegliver_tpu.data.kfold import (LITS_SEED, read_or_create_k_folds,
                                            train_test_split)
    from boxsegliver_tpu.data.meta import load_meta
    from boxsegliver_tpu.interactive.refine import (interactive_eval_2d,
                                                    interactive_eval_3d)
    from boxsegliver_tpu.ops.array_kits import zscore

    dataset_dir = resolve_dataset_dir(args)
    trainer = build_trainer(args, dataset_dir)
    if trainer.ckpt.has_best() and not args.eval_final:
        restored = trainer.ckpt.restore_best(trainer.state)
        if restored is not None:
            trainer.state = restored
    else:
        trainer.restore()

    metas = load_meta(dataset_dir)
    folds = read_or_create_k_folds(
        Path(dataset_dir) / "k_folds.txt", [m["PID"] for m in metas],
        k_split=args.k_folds, seed=LITS_SEED)
    _, test_pids = train_test_split(folds, args.test_fold)
    test_pids = set(int(p) for p in test_pids)
    # only lesion-bearing cases, like the reference drivers' nf_set filter
    # (entry/main_eval_3d.py load_dataset)
    eval_metas = [m for m in metas
                  if int(m["PID"]) in test_pids and m["tumors"]]
    if args.eval_num > 0:
        eval_metas = eval_metas[:args.eval_num]

    refiner = build_refiner(args, trainer.model, trainer.state)
    logger.info("refinement path: %s",
                type(refiner).__name__ if refiner is not None
                else "host loop")

    all_results = []
    for meta in eval_metas:
        t_case = time.perf_counter()
        pid = int(meta["PID"])
        vol = np.load(Path(dataset_dir) / f"volume-{pid}" / "volume.npy")
        lab = np.load(Path(dataset_dir) / f"volume-{pid}" / "segmentation.npy")
        lab = (lab > 0).astype(np.uint8)
        if args.dim == 2:
            # 2.5D slice stacks with edge padding; z-score PER STACK to match
            # the interactive training normalization (pipeline_inter
            # nonzero_zscore per sample, reference g_simply data_processing)
            vol = vol.astype(np.float32)
            d = vol.shape[0]
            lh = (args.im_channel - 1) // 2
            rh = args.im_channel - 1 - lh
            padded = np.concatenate([np.repeat(vol[:1], lh, 0), vol,
                                     np.repeat(vol[-1:], rh, 0)], axis=0)
            images = np.stack([zscore(np.transpose(
                padded[z:z + args.im_channel], (1, 2, 0)))
                for z in range(d)])
            if refiner is not None:
                res = refiner.refine_case(images.astype(np.float32), lab)
            else:
                res = interactive_eval_2d(
                    trainer.predict, images.astype(np.float32), lab,
                    dice_thresh=args.dice_thresh, max_iters=args.max_iters,
                    stddev=args.guide_stddev, guide_kind=args.guide_kind,
                    guide_channel=int(args.guide_channel))
        else:
            from boxsegliver_tpu.evaluators.volume3d import pad_to_multiple
            vol = zscore(vol.astype(np.float32))  # whole-volume (3D conv.)
            pvol, pads = pad_to_multiple(vol[..., None], (2, 16, 16))
            plab = np.pad(lab, [(0, p) for p in pads]) if any(pads) else lab
            if refiner is not None:
                res = refiner.refine_case(pvol[..., 0], plab,
                                          valid_shape=vol.shape)
            else:
                res = interactive_eval_3d(
                    trainer.predict, pvol[..., 0], plab,
                    dice_thresh=args.dice_thresh,
                    max_iters=args.max_iters, stddev=args.guide_stddev,
                    tta=args.tta,
                    use_cascade=bool(getattr(args, "use_cascade", False)),
                    cascade_binary=bool(getattr(args, "cascade_binary", False)),
                    guide_channel=int(getattr(args, "guide_channel", 1)),
                    valid_shape=vol.shape)
        res["sec_per_case"] = time.perf_counter() - t_case
        logger.info("case %s: Dice=%.3f clicks=%.1f (%.2f s)", pid,
                    res["Dice"], res["clicks"], res["sec_per_case"])
        all_results.append(res)

    means = {k: float(np.mean([r[k] for r in all_results]))
             for k in all_results[0]} if all_results else {}
    logger.info("---- %d cases: %s", len(all_results),
                " ".join(f"{k}={v:.3f}" for k, v in means.items()))
    out = Path(args.model_dir) / "eval_results_inter.txt"
    out.write_text(json.dumps(means))
    trainer.ckpt.close()
    return means


if __name__ == "__main__":
    main()
