#!/usr/bin/env bash
# Shared launcher for the NF experiment family (mirrors the reference
# scripts/10x_*.sh pattern: one tag = one flag set; the reference's
# --distribution_strategy mirrored --num_gpus N becomes --num_replicas).
#
# usage (from a family script): TASK, REPLICAS and EXTRA set by the caller.

PROJECT_DIR=$(dirname $(dirname $(dirname $(realpath $0))))

NF_BASE_FLAGS=(
    --classes NF
    --test_fold 0
    --im_height 256 --im_width 256 --im_channel 3
    --noise_scale 0 --random_flip 3
    --primary_metric "NF/Dice"
    --loss_weight_type numerical
    --batches_per_epoch 1200
    --batch_size 16
    --learning_policy plateau
    --learning_rate 0.0003
    --lr_end 0.0000005
    --lr_decay_rate 0.2
    --normalizer instance_norm
    --eval_num_batches_per_epoch 120
    --evaluator Volume
    --summary_prefix nf
    --dataset NF
)

nf_run() {  # nf_run <entry_task> <mode> [flags...]
    local entry_task=$1 mode=$2
    shift 2
    PYTHONPATH="${PROJECT_DIR}${PYTHONPATH:+:$PYTHONPATH}" python -m boxsegliver_tpu.cli.main "${entry_task}" \
        --mode "${mode}" \
        --tag "${TAG}" \
        --num_replicas "${REPLICAS}" \
        "${NF_BASE_FLAGS[@]}" \
        "$@"
}
