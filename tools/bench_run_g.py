"""Measure interactive guided eval (run_g) throughput: reference-shaped
host per-slice propagation loop vs the device-resident double sweep
(interactive/device_sweep.py), on the real chip.

Workload: the TRAINED spatial GUNet from the capability ladder
(tools/run_ladder.py rung `gunet_sp`, /tmp/boxseg_ladder) driven through
the guided-propagation evaluator at the flagship 256² resolution with
4-way mirror TTA — real weights, the real simulated-user prior, so the
propagation state machine does real filtering work in both modes.

Prereq (one-time, ~12 min on the chip):
    python tools/run_ladder.py prepare
    python tools/run_ladder.py train gunet_sp

Usage: python tools/bench_run_g.py [--cases 4] [--mode both|host|dev]
                                   [--size 256]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from boxsegliver_tpu.utils.compile_cache import ensure_compile_cache

ensure_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=4)
    ap.add_argument("--mode", choices=["both", "host", "dev"], default="both")
    ap.add_argument("--size", type=int, default=256,
                    help="eval resolution (model is fully convolutional; "
                         "256 = the flagship config)")
    ap.add_argument("--profile", type=str, default=None,
                    help="capture a jax.profiler trace of the device sweep "
                         "into this directory")
    opts = ap.parse_args()

    import run_ladder  # tools/run_ladder.py: flag sets + paths

    from boxsegliver_tpu import config as config_mod
    from boxsegliver_tpu.cli.main import build_trainer
    from boxsegliver_tpu.data.meta import load_meta
    from boxsegliver_tpu.evaluators.eval_loader import parse_case_eval
    from boxsegliver_tpu.evaluators.volume import EvaluateVolume
    from boxsegliver_tpu.interactive.device_sweep import GuidedSweepPredictor

    ds_root = run_ladder.DATA_ROOT / run_ladder.DATASET
    model_dir = run_ladder.MODEL_ROOT / "gunet_sp"
    if not (ds_root / "prior.json").exists() or not model_dir.exists():
        sys.exit("missing trained ladder artifacts; run\n"
                 "  python tools/run_ladder.py prepare\n"
                 "  python tools/run_ladder.py train gunet_sp")

    parser = config_mod.build_parser()
    argv = (["--mode", "eval", "--tag", "gunet_sp", "--model_dir",
             str(model_dir)] + [str(a) for a in run_ladder.BASE]
            + run_ladder.RUNGS["gunet_sp"]["flags"])
    args = parser.parse_args(argv)
    args.task = "nf"
    config_mod.check_args(args, parser)
    config_mod.fill_default_args(args)
    args.im_height = args.im_width = opts.size
    args.eval_mirror = True
    args.sweep_max_objects = 64      # NF is multi-lesion: ~50 CCs/slice real

    trainer = build_trainer(args, ds_root)
    restored = trainer.ckpt.restore_best(trainer.state)
    if restored is not None:
        trainer.state = restored
    else:
        trainer.restore()

    ev = EvaluateVolume(args, ds_root, ["Background", "NF"])
    predictor = GuidedSweepPredictor(trainer.model, trainer.state, args,
                                     num_classes=2, tumor_id=1)
    prior = json.loads((ds_root / "prior.json").read_text())
    metas = load_meta(ds_root)[:opts.cases]
    cases = [parse_case_eval(m, ds_root, im_channel=args.im_channel,
                             parse_label=False, norm=ev.norm,
                             whole_frame=ev.nf)
             for m in metas]
    priors = [prior.get(str(c.pid), {}) for c in cases]
    slices = sum(c.depth for c in cases)

    runs = []
    if opts.mode in ("both", "host"):
        runs.append(("host per-slice loop", lambda c, p:
                     ev._sweep_case_host(predictor, c, p, None, tumor_id=1)))
    if opts.mode in ("both", "dev"):
        def dev(c, p):
            out, n = predictor.sweep_case(c, p, None)
            assert out is not None, f"overflow {n}"
            return out
        runs.append(("device double sweep", dev))

    for name, fn in runs:
        print(f"{name}: compiling...", flush=True)
        t0 = time.perf_counter()
        _ = fn(cases[0], priors[0])
        print(f"  first call {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for case, pc in zip(cases, priors):
            probs = fn(case, pc)
            _ = float(np.asarray(probs).ravel()[0])
        dt = time.perf_counter() - t0
        print(f"{name:22s}: {dt / len(cases):6.2f} s/case "
              f"({slices / dt:6.1f} slices/s)", flush=True)

    if opts.profile and opts.mode in ("both", "dev"):
        import jax
        with jax.profiler.trace(opts.profile):
            for case, pc in zip(cases, priors):
                out, _ = predictor.sweep_case(case, pc, None)
                _ = float(np.asarray(out).ravel()[0])
        print("profile:", opts.profile, flush=True)


if __name__ == "__main__":
    main()
