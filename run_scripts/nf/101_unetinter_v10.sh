#!/usr/bin/env bash
# Mirrors reference scripts/101_unetinter_v10.sh (flag-for-flag; see _lib.sh for the
# shared NF base flags).
# usage: 101_unetinter_v10.sh {train|eval} [num_replicas] [extra flags...]
TASK=${1:-train}
REPLICAS=${2:-0}
shift $(( $# >= 2 ? 2 : $# ))
TAG=101_unetinter_v10
source "$(dirname "$(realpath "$0")")/_lib.sh"
if [[ "$TASK" == "train" ]]; then
    nf_run nf_inter train --model UNetInter \
        --loss_numeric_w 1 1 --weight_decay_rate 0.00003 \
        --num_of_total_steps 250000 --eval_per_epoch --save_best \
        --use_spatial --local_enhance --stddev 5. --save_interval 50000 "$@"
elif [[ "$TASK" == "inter" ]]; then
    # the reference evaluates this model with the click-refinement driver
    # (entry/main_eval.py)
    PYTHONPATH="${PROJECT_DIR}${PYTHONPATH:+:$PYTHONPATH}" python -m boxsegliver_tpu.cli.interactive_eval \
        --mode eval --tag "${TAG}" --model UNetInter --classes NF \
        --test_fold 0 --im_height 256 --im_width 256 --im_channel 3 \
        --batch_size 1 --dataset NF --dim 2 --local_enhance "$@"
else
    nf_run nf_inter eval --model UNetInter --loss_numeric_w 1 1 \
        --local_enhance --stddev 5. "$@"
fi
