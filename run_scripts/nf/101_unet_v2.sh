#!/usr/bin/env bash
# Mirrors reference scripts/101_unet_v2.sh (flag-for-flag; see _lib.sh for the
# shared NF base flags).
# usage: 101_unet_v2.sh {train|eval} [num_replicas] [extra flags...]
TASK=${1:-train}
REPLICAS=${2:-0}
shift $(( $# >= 2 ? 2 : $# ))
TAG=101_unet_v2
source "$(dirname "$(realpath "$0")")/_lib.sh"
if [[ "$TASK" == "train" ]]; then
    nf_run nf train --model UNet --filter_size 10 \
        --loss_numeric_w 1 10 --weight_decay_rate 0.00001 \
        --num_of_total_steps 999999 --eval_per_epoch --save_best "$@"
else
    nf_run nf eval --model UNet --loss_numeric_w 1 10 "$@"
fi
