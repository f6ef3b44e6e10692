"""Interactive 2D refinement timing at the canonical 256² (PERF.md rows).

Round-4 verdict weak #5: PERF's interactive-refinement rows were measured at
128² while the ladder moved to 256² — the committed numbers no longer
described the flagship-resolution path.  This benches the trained ladder
`inter` rung (UNetInter + clicks) on the hard-NF test fold at 256², device
path (interactive/device_refine.DeviceRefiner2D, one dispatch per case) vs
the reference-shaped host loop (interactive/refine.interactive_eval_2d, one
tunnel round trip per click per slice).

Each mode runs TWICE in one process; rep 2 is steady state (per-bucket
executables cached).  Prints one JSON line per (mode, rep).

  python tools/refine_bench.py [--modes on off] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.run_ladder import BASE, MODEL_ROOT, RUNGS  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="+", default=["on", "off"])
    ap.add_argument("--reps", type=int, default=2)
    opts = ap.parse_args()

    from boxsegliver_tpu.cli import interactive_eval

    spec = RUNGS["inter"]
    model_dir = MODEL_ROOT / "inter"
    base = [str(x) for x in BASE]
    for mode in opts.modes:
        argv = (["--task", spec["task"], "--mode", "eval", "--tag",
                 f"refbench_{mode}", "--model_dir", str(model_dir),
                 "--dim", "2", "--max_iters", "5", "--dice_thresh", "0.85",
                 "--eval_final", "--guide_stddev", "5.",
                 "--device_refine", mode]
                + base + [str(x) for x in spec["flags"]])
        for rep in range(opts.reps):
            t0 = time.perf_counter()
            means = interactive_eval.main(argv)
            dt = time.perf_counter() - t0
            print(json.dumps({
                "metric": "interactive_refine_2d_256",
                "mode": f"device_refine={mode}", "rep": rep,
                "wall_s": round(dt, 2),
                "s_per_case": round(means.get("sec_per_case",
                                              float("nan")), 3),
                "Dice": round(means.get("Dice", float("nan")), 4),
                "clicks": round(means.get("clicks", float("nan")), 2),
            }), flush=True)


if __name__ == "__main__":
    main()
