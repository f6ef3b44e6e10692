#!/usr/bin/env bash
# Mirrors reference scripts/102_gnet_v3.sh (flag-for-flag; see _lib.sh for the
# shared NF base flags).
# usage: 102_gnet_v3.sh {train|eval} [num_replicas] [extra flags...]
TASK=${1:-train}
REPLICAS=${2:-0}
shift $(( $# >= 2 ? 2 : $# ))
TAG=102_gnet_v3
source "$(dirname "$(realpath "$0")")/_lib.sh"
MODEL_FLAGS=(--model GUNet --loss_numeric_w 1 1
    --use_spatial --local_enhance --stddev 3.)
if [[ "$TASK" == "train" ]]; then
    nf_run nf_inter train "${MODEL_FLAGS[@]}" \
        --weight_decay_rate 0.00001 \
        --num_of_total_steps 999999 --eval_per_epoch --save_best "$@"
else
    nf_run nf_inter eval "${MODEL_FLAGS[@]}" "$@"
fi
