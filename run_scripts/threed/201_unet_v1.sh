#!/usr/bin/env bash
# Mirrors reference threed_script/201_unet_v1.sh: UNet3D on NF, d=10 patch
# training, whole-volume eval (--im_depth -1).
# usage: 201_unet_v1.sh {train|eval} [num_replicas] [extra flags...]
TASK=${1:-train}
REPLICAS=${2:-0}
shift $(( $# >= 2 ? 2 : $# ))

PROJECT_DIR=$(dirname $(dirname $(dirname $(realpath $0))))
TAG=201_unet_v1

COMMON=(
    --tag "${TAG}"
    --model UNet3D
    --classes NF
    --test_fold 0
    --im_height 256 --im_width 256 --im_channel 1
    --primary_metric "NF/Dice"
    --loss_weight_type numerical --loss_numeric_w 1 1
    --weight_decay_rate 0.00003
    --learning_policy plateau --learning_rate 0.0003
    --lr_end 0.0000005 --lr_decay_rate 0.2
    --normalizer instance_norm
    --evaluator Volume
    --summary_prefix nf
    --num_replicas "${REPLICAS}"
    --dataset NF
)

if [[ "$TASK" == "train" ]]; then
    PYTHONPATH="${PROJECT_DIR}${PYTHONPATH:+:$PYTHONPATH}" python -m boxsegliver_tpu.cli.main nf_3d \
        --mode train "${COMMON[@]}" \
        --im_depth 10 --random_flip 7 \
        --num_of_total_steps 999999 \
        --batches_per_epoch 300 --batch_size 4 \
        --eval_num_batches_per_epoch 30 --eval_per_epoch --save_best \
        --tumor_percent 0.75 --log_step 125 \
        "$@"
else
    PYTHONPATH="${PROJECT_DIR}${PYTHONPATH:+:$PYTHONPATH}" python -m boxsegliver_tpu.cli.main nf_3d \
        --mode eval "${COMMON[@]}" \
        --im_depth -1 --batch_size 1 \
        "$@"
fi
