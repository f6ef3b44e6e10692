"""Full-length FLAGSHIP product training run (round-4 verdict item #3).

Every ladder rung is a 2,000-step fixed-LR sprint; the plateau-LR
controller, best/interval-best checkpoint hooks, and early stop
(train/hooks.py, mirroring reference core/hooks.py:581-723,193-228) had
never governed a real multi-thousand-step run end to end.  This drives the
reference's actual training protocol (run_scripts/template/002_gnet_sp.sh:
plateau LR + eval-per-epoch + best-ckpt + early stop) on the hard band-v3
benchmark with the flagship gunet_both config:

  python tools/run_full_train.py train   # one long process, resumable
  python tools/run_full_train.py report  # summarize curve + decays + best

Protocol: 20k-step budget, epoch = 500 batches, eval-per-epoch (reference
default cheap 2D online eval drives NF/Dice), plateau on the loss EMA
(patience 3 epochs, decay 0.3), early stop 4 epochs after the last decay,
periodic ckpt every 1000 + best-by-NF/Dice line.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.run_ladder import BASE, MODEL_ROOT, RUNGS, run  # noqa: E402

# Default flagship rung; any ladder rung name may be passed as argv[2]
# (e.g. ``python tools/run_full_train.py train gunet_sp``) to run the same
# full-length protocol on an ablation arm — used round 5 to check the
# both>sp ordering under the full 20k-step protocol, not just 2k sprints.
RUNG = sys.argv[2] if len(sys.argv) > 2 else "gunet_both"
MODEL_DIR = MODEL_ROOT / f"{RUNG}_full"
TOTAL_STEPS = 20000

# BASE minus the sprint LR schedule / step budget / ckpt cadence (which we
# override), keeping the benchmark-defining data/loss/normalizer flags.
_DROP = {"--learning_policy": 2, "--lr_decay_step": 2, "--lr_decay_rate": 2,
         "--num_of_total_steps": 2, "--save_ckpt_steps": 2, "--log_step": 2}


def _base_flags():
    out, i = [], 0
    while i < len(BASE):
        tok = str(BASE[i])
        if tok in _DROP:
            i += _DROP[tok]
            continue
        out.append(tok)
        i += 1
    return out


FLAGS = _base_flags() + RUNGS[RUNG]["flags"] + [
    "--num_of_total_steps", str(TOTAL_STEPS),
    "--log_step", "250", "--save_ckpt_steps", "1000",
    "--learning_policy", "plateau", "--lr_patience", "3",
    "--tr_patience", "4", "--lr_decay_rate", "0.3", "--min_delta", "5e-4",
    "--batches_per_epoch", "500", "--eval_per_epoch",
    "--save_best", "--save_interval", "5000",
    "--primary_metric", "NF/Dice",
    # Product HBM volume cache (the bench/CLI composition; ~4.5x wall on the
    # 1-core host, device gathers slices + renders guides) — a 20k-step run
    # must fit the round's chip budget.
    "--device_cache",
]


def train() -> int:
    rc = run([sys.executable, "-m", "boxsegliver_tpu.cli.main",
              RUNGS[RUNG]["task"], "--mode", "train", "--tag",
              MODEL_DIR.name, "--model_dir", MODEL_DIR] + FLAGS,
             cwd=REPO).returncode
    sys.exit(rc)


def final_eval():
    """Full guided volume eval (run_g path) of the BEST checkpoint (the
    default eval source when ckpt_best/best exists) -> eval_results_3d.txt."""
    run([sys.executable, "-m", "boxsegliver_tpu.cli.main",
         RUNGS[RUNG]["task"], "--mode", "eval", "--tag", MODEL_DIR.name,
         "--model_dir", MODEL_DIR] + FLAGS, cwd=REPO, check=True)
    print("FINAL", (MODEL_DIR / "eval_results_3d.txt").read_text())


def evalall():
    """Checkpoint-sweep eval over best + interval-best lines
    (reference run_scripts/eval_all_ckpt.sh) -> eval_sweep.txt."""
    run([sys.executable, "-m", "boxsegliver_tpu.cli.eval_all_ckpt",
         RUNGS[RUNG]["task"], "--mode", "eval", "--tag", MODEL_DIR.name,
         "--model_dir", MODEL_DIR] + FLAGS, cwd=REPO, check=True)
    print("SWEEP", (MODEL_DIR / "eval_sweep.txt").read_text())


def report():
    """Training-curve summary: eval rows, LR decays, best checkpoint."""
    out = {}
    sidecar = MODEL_DIR / "lr_schedule"  # reference sidecar name, no ext
    if sidecar.exists():
        out["lr_schedule"] = json.loads(sidecar.read_text())
    best = MODEL_DIR / "best_result"
    if best.exists():
        out["best_result"] = json.loads(best.read_text())
    evals = []
    metrics = MODEL_DIR / "summaries" / "metrics.jsonl"
    if metrics.exists():
        for line in metrics.read_text().splitlines():
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            # scalar schema: {step, tag, time, value}; eval rows are tagged
            # "<summary_prefix>/eval/<Class>/<Metric>"
            if "/eval/" in str(row.get("tag", "")):
                evals.append(row)
    out["eval_rows"] = evals
    lrs = [r for r in (json.loads(line) for line in
                       metrics.read_text().splitlines())
           if str(r.get("tag", "")).endswith("/learning_rate")] \
        if metrics.exists() else []
    decays = [(b["step"], a["value"], b["value"])
              for a, b in zip(lrs, lrs[1:]) if b["value"] < a["value"] * 0.99]
    out["lr_decays"] = decays
    print("FULLTRAIN", json.dumps(out))


if __name__ == "__main__":
    {"train": train, "final_eval": final_eval, "evalall": evalall,
     "report": report}[sys.argv[1]]()
