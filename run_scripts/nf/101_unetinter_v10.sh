#!/usr/bin/env bash
# Mirrors reference scripts/101_unetinter_v10.sh (flag-for-flag; see _lib.sh for the
# shared NF base flags).
# usage: 101_unetinter_v10.sh {train|eval} [num_replicas] [extra flags...]
TASK=${1:-train}
REPLICAS=${2:-0}
shift $(( $# >= 2 ? 2 : $# ))
TAG=101_unetinter_v10
source "$(dirname "$(realpath "$0")")/_lib.sh"
MODEL_FLAGS=(--model UNetInter --loss_numeric_w 1 1
    --use_spatial --local_enhance --stddev 5.)
if [[ "$TASK" == "train" ]]; then
    nf_run nf_inter train "${MODEL_FLAGS[@]}" \
        --weight_decay_rate 0.00003 \
        --num_of_total_steps 250000 --eval_per_epoch --save_best \
        --save_interval 50000 "$@"
elif [[ "$TASK" == "inter" ]]; then
    # the reference evaluates this model with the click-refinement driver
    # (entry/main_eval.py); model flags MUST match training so the
    # checkpoint restores (incl. --normalizer from the shared base)
    PYTHONPATH="${PROJECT_DIR}${PYTHONPATH:+:$PYTHONPATH}" python -m boxsegliver_tpu.cli.interactive_eval \
        --mode eval --tag "${TAG}" "${MODEL_FLAGS[@]}" --classes NF \
        --test_fold 0 --im_height 256 --im_width 256 --im_channel 3 \
        --normalizer instance_norm \
        --batch_size 1 --dataset NF --dim 2 "$@"
else
    nf_run nf_inter eval "${MODEL_FLAGS[@]}" "$@"
fi
