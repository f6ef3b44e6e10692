#!/usr/bin/env bash
# Sweep all interval-best checkpoints of an experiment and collect metrics
# (mirrors reference run_scripts/eval_all_ckpt.sh: loop checkpoint_best_<N>,
# evaluate, trim the log into one table — here one CLI call does the loop).
#
# usage: eval_all_ckpt.sh <task> <tag> [extra flags...]
#   e.g. eval_all_ckpt.sh liver 001_unet --model UNet --classes Liver Tumor

TASK=${1:?task (liver|only_liver|tumor|nf|nf_inter|synthetic)}
TAG=${2:?experiment tag}
shift 2

PROJECT_DIR=$(dirname $(dirname $(realpath $0)))

PYTHONPATH="${PROJECT_DIR}${PYTHONPATH:+:$PYTHONPATH}" python -m boxsegliver_tpu.cli.eval_all_ckpt "${TASK}" \
    --mode eval \
    --tag "${TAG}" \
    "$@"
