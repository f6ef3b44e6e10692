"""Checkpoint-sweep evaluation (reference run_scripts/eval_all_ckpt.sh:
evaluate every ``checkpoint_best_<N>`` interval best plus the overall best,
collect the metrics into one table).

    python -m boxsegliver_tpu.cli.eval_all_ckpt liver --mode eval --tag t \
        --model UNet --classes Liver Tumor [flags]

Writes ``<model_dir>/eval_sweep.txt`` (one JSON line per checkpoint tag).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

from boxsegliver_tpu.utils.compile_cache import ensure_compile_cache

ensure_compile_cache()  # also makes JAX_PLATFORMS authoritative

logger = logging.getLogger("boxsegliver")


def sweep(args, dataset_dir):
    from boxsegliver_tpu.cli.main import (_make_online_eval, _with_blank_guide,
                                          build_eval_cascade, build_trainer,
                                          is_3d)

    trainer = build_trainer(args, dataset_dir)
    best_dir = Path(args.model_dir) / "ckpt_best"
    tags = sorted(p.name for p in best_dir.iterdir() if p.is_dir()) \
        if best_dir.exists() else []
    if not tags:
        raise SystemExit(f"No best checkpoints under {best_dir}")

    if is_3d(args):
        from boxsegliver_tpu.data.kfold import (LITS_SEED,
                                                read_or_create_k_folds,
                                                train_test_split)
        from boxsegliver_tpu.data.meta import load_meta
        from boxsegliver_tpu.evaluators.volume3d import EvaluateVolume3D
        metas = load_meta(dataset_dir)
        folds = read_or_create_k_folds(
            Path(dataset_dir) / "k_folds.txt", [m["PID"] for m in metas],
            k_split=args.k_folds, seed=LITS_SEED)
        _, test_pids = train_test_split(folds, args.test_fold)
        test_pids = set(int(p) for p in test_pids)
        eval_metas = [m for m in metas if int(m["PID"]) in test_pids]
        ev = EvaluateVolume3D(args, dataset_dir,
                              ["Background"] + list(args.classes))
        cascade = build_eval_cascade(args)

        def eval_fn(trainer):
            return ev.run(
                lambda f: trainer.predict(_with_blank_guide(args, f)),
                eval_metas, cascade=cascade)
    else:
        eval_fn = _make_online_eval(args, dataset_dir)

    out_path = Path(args.model_dir) / "eval_sweep.txt"
    rows = []
    for tag in tags:
        restored = trainer.ckpt.restore_best(trainer.state, tag=tag)
        if restored is None:
            logger.warning("Skipping unrestorable checkpoint %s", tag)
            continue
        trainer.state = restored
        results = eval_fn(trainer)
        row = {"ckpt": tag, **{k: float(v) for k, v in results.items()}}
        rows.append(row)
        logger.info("%s: %s", tag,
                    " ".join(f"{k}={v:.4f}" for k, v in results.items()))
    with out_path.open("w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    # summary: best checkpoint by the primary metric
    primary = getattr(args, "primary_metric", None)
    if primary and rows:
        best = max(rows, key=lambda r: r.get(primary, float("-inf")))
        logger.info("Best by %s: %s (%.4f)", primary, best["ckpt"],
                    best.get(primary, float("nan")))
    trainer.ckpt.close()
    return rows


def main(argv=None):
    from boxsegliver_tpu.cli.main import get_args, resolve_dataset_dir
    from boxsegliver_tpu.utils.logger import setup_logger

    args = get_args(argv)
    setup_logger(args.model_dir, "eval_sweep", args.tag, args.out_file)
    return sweep(args, resolve_dataset_dir(args))


if __name__ == "__main__":
    main()
