"""Seed-robustness replication for ladder rungs (does NOT touch ladder.json).

The band-v3 ladder's headline ordering (gunet_both 0.7685 > gunet_sp 0.7492)
is a single-seed result with a reference-sized margin (+0.019 vs the
reference's +0.006..+0.021, experiments.md:40-41,120).  This trains + evals
a rung with a different --seed into a sibling model dir and prints the row,
so the ordering claim gets an independent replicate (recorded in
experiments.md, not the ledger — the ledger stays one-canonical-seed).

  python tools/ladder_seed_check.py train <rung> <seed>
  python tools/ladder_seed_check.py eval <rung> <seed>
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.run_ladder import BASE, MODEL_ROOT, RUNGS, run  # noqa: E402


def main():
    cmd, rung, seed = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spec = RUNGS[rung]
    model_dir = MODEL_ROOT / f"{rung}_s{seed}"
    base = list(BASE) + ["--seed", str(seed)]
    if cmd == "train":
        rc = run([sys.executable, "-m", "boxsegliver_tpu.cli.main",
                  spec["task"], "--mode", "train", "--tag", f"{rung}_s{seed}",
                  "--model_dir", model_dir] + base + spec["flags"],
                 cwd=REPO).returncode
        sys.exit(rc)
    run([sys.executable, "-m", "boxsegliver_tpu.cli.main", spec["task"],
         "--mode", "eval", "--tag", f"{rung}_s{seed}", "--model_dir",
         model_dir, "--eval_final"] + base + spec["flags"],
        cwd=REPO, check=True)
    res = json.loads((model_dir / "eval_results_3d.txt").read_text())
    print(f"SEEDCHECK {rung} seed={seed} ->",
          {k: round(float(v), 4) for k, v in res.items()})


if __name__ == "__main__":
    main()
