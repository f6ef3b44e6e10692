#!/usr/bin/env bash
# UNet3D patch training + whole-volume eval (mirrors reference
# threed_script/201_unet_v1.sh: train d=10 patches, eval whole volumes).
#
# usage: 201_unet3d.sh {train|eval} [num_replicas] [extra flags...]

TASK=${1:-train}
REPLICAS=${2:-0}
shift $(( $# >= 2 ? 2 : $# ))

PROJECT_DIR=$(dirname $(dirname $(dirname $(realpath $0))))
BASE_NAME=$(basename $0)

COMMON_FLAGS=(
    --tag "${BASE_NAME%.sh}"
    --model UNet3D
    --classes NF
    --test_fold 0
    --im_height 256 --im_width 256
    --num_replicas "${REPLICAS}"
    --dataset NF
    --normalizer instance_norm
    --zscore --gamma
)

if [[ "$TASK" == "train" ]]; then
    PYTHONPATH="${PROJECT_DIR}${PYTHONPATH:+:$PYTHONPATH}" python -m boxsegliver_tpu.cli.main nf \
        --mode train \
        "${COMMON_FLAGS[@]}" \
        --im_depth 10 \
        --num_of_total_steps 300000 \
        --primary_metric "NF/Dice" \
        --batches_per_epoch 2000 \
        --batch_size 4 \
        --learning_policy plateau \
        --learning_rate 0.001 \
        --eval_per_epoch \
        --save_best \
        "$@"
elif [[ "$TASK" == "eval" ]]; then
    # whole-volume inference (--im_depth -1); add --z_shards N to shard the
    # depth axis across the mesh (sequence-parallel eval over ICI)
    PYTHONPATH="${PROJECT_DIR}${PYTHONPATH:+:$PYTHONPATH}" python -m boxsegliver_tpu.cli.main nf \
        --mode eval \
        "${COMMON_FLAGS[@]}" \
        --im_depth -1 \
        --metrics_eval Dice VOE RVD \
        --primary_metric "NF/Dice" \
        --batch_size 1 \
        "$@"
fi
