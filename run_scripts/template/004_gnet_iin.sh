#!/usr/bin/env bash
# nf2/iin: click-instance G-Net with image-patch context + spatial guide
# (reference entry/main_g.py:66 nf2 -> DataLoader/NF/input_pipeline_iin.py;
# the reference ships no launcher for this experimental task — defaults
# follow its flag defaults: zoom (1.0, 1.25), noise 0.1, guide_scale 5,
# ct_base 32, input_pipeline_iin.py:59-98).
#
# usage: 004_gnet_iin.sh {train|eval} [num_replicas] [extra flags...]

TASK=${1:-train}
REPLICAS=${2:-0}
shift $(( $# >= 2 ? 2 : $# ))

PROJECT_DIR=$(dirname $(dirname $(dirname $(realpath $0))))
BASE_NAME=$(basename $0)

COMMON_FLAGS=(
    --tag "${BASE_NAME%.sh}"
    --model GUNet
    --model_config GUNet_IIN.yml
    --classes NF
    --test_fold 2
    --im_height 256 --im_width 256 --im_channel 3
    --random_flip 3
    --num_replicas "${REPLICAS}"
    --dataset NF
    --normalizer instance_norm
    --use_context --ct_base 32
    --use_spatial --spatial_random 1.0
    --guide_scale 5 --min_std 2
    --zscore --gamma
    --zoom_scale 1.0 1.25
)

if [[ "$TASK" == "train" ]]; then
    PYTHONPATH="${PROJECT_DIR}${PYTHONPATH:+:$PYTHONPATH}" python -m boxsegliver_tpu.cli.main nf2 \
        --mode train \
        "${COMMON_FLAGS[@]}" \
        --noise_scale 0.1 \
        --num_of_total_steps 300000 \
        --primary_metric "NF/Dice" \
        --batches_per_epoch 2000 \
        --batch_size 8 \
        --weight_decay_rate 0.000001 \
        --learning_policy plateau \
        --learning_rate 0.001 \
        --lr_end 0.0000005 \
        --lr_decay_rate 0.2 \
        --eval_per_epoch \
        --evaluator Volume \
        --save_best \
        "$@"
elif [[ "$TASK" == "eval" ]]; then
    PYTHONPATH="${PROJECT_DIR}${PYTHONPATH:+:$PYTHONPATH}" python -m boxsegliver_tpu.cli.main nf2 \
        --mode eval \
        "${COMMON_FLAGS[@]}" \
        --metrics_eval Dice VOE RVD \
        --primary_metric "NF/Dice" \
        --batch_size 8 \
        --eval_mirror \
        --evaluator Volume \
        "$@"
fi
