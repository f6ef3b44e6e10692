#!/usr/bin/env bash
# DenseUNet-on-LiTS template.  No reference launcher exists (DenseUNet is
# commented out of the reference zoo, core/models.py:31,37) — this template
# pairs the shipped implementation (NetworksV2/DenseUNet.py) with the same
# canonical LiTS flag set as 001_unet.sh.  To warm-start the DenseNet-161
# encoder from the ImageNet file the reference uses (core/models.py:188-221):
#   003_denseunet.sh train 8 --load_weights /path/to/densenet161_weights_tf.h5
#
# usage: 003_denseunet.sh {train|eval} [num_replicas] [extra flags...]

TASK=${1:-train}
REPLICAS=${2:-0}
shift $(( $# >= 2 ? 2 : $# ))

PROJECT_DIR=$(dirname $(dirname $(dirname $(realpath $0))))
BASE_NAME=$(basename $0)

COMMON_FLAGS=(
    --tag "${BASE_NAME%.sh}"
    --model DenseUNet
    --classes Liver Tumor
    --test_fold 2
    --im_height 256 --im_width 256 --im_channel 3
    --random_flip 3
    --num_replicas "${REPLICAS}"
    --dataset LiTS
)

if [[ "$TASK" == "train" ]]; then
    PYTHONPATH="${PROJECT_DIR}${PYTHONPATH:+:$PYTHONPATH}" python -m boxsegliver_tpu.cli.main liver \
        --mode train \
        "${COMMON_FLAGS[@]}" \
        --noise_scale 0.05 \
        --num_of_total_steps 600000 \
        --primary_metric "Tumor/Dice" \
        --secondary_metric "Liver/Dice" \
        --loss_weight_type numerical \
        --loss_numeric_w 0.2 0.4 4.4 \
        --batches_per_epoch 2000 \
        --batch_size 8 \
        --dropout 0.2 \
        --weight_decay_rate 0.000001 \
        --learning_policy plateau \
        --learning_rate 0.001 \
        --lr_end 0.0000005 \
        --lr_decay_rate 0.2 \
        --eval_num_batches_per_epoch 200 \
        --eval_per_epoch \
        --evaluator Volume \
        --save_best \
        "$@"
elif [[ "$TASK" == "eval" ]]; then
    PYTHONPATH="${PROJECT_DIR}${PYTHONPATH:+:$PYTHONPATH}" python -m boxsegliver_tpu.cli.main liver \
        --mode eval \
        "${COMMON_FLAGS[@]}" \
        --metrics_eval Dice VOE RVD \
        --primary_metric "Tumor/Dice" \
        --batch_size 8 \
        --evaluator Volume \
        "$@"
fi
