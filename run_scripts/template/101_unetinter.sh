#!/usr/bin/env bash
# Interactive click-simulation training (UNetInter on NF, mirrors reference
# scripts/101_unetinter_v10.sh / entry main_g nf_inter:
# DataLoader/NF/input_pipeline_g_simply.py).
#
# usage: 101_unetinter.sh {train|eval} [num_replicas] [extra flags...]

TASK=${1:-train}
REPLICAS=${2:-0}
shift $(( $# >= 2 ? 2 : $# ))

PROJECT_DIR=$(dirname $(dirname $(dirname $(realpath $0))))
BASE_NAME=$(basename $0)

COMMON_FLAGS=(
    --tag "${BASE_NAME%.sh}"
    --model UNetInter
    --classes NF
    --test_fold 0
    --im_height 256 --im_width 256 --im_channel 3
    --random_flip 3
    --guide_channel 2
    --local_enhance
    --num_replicas "${REPLICAS}"
    --dataset NF
)

if [[ "$TASK" == "train" ]]; then
    PYTHONPATH="${PROJECT_DIR}${PYTHONPATH:+:$PYTHONPATH}" python -m boxsegliver_tpu.cli.main nf_inter \
        --mode train \
        "${COMMON_FLAGS[@]}" \
        --zoom_scale 1.0 1.25 \
        --noise_scale 0.05 \
        --tumor_percent 0.5 \
        --batch_size 8 \
        --num_of_total_steps 600000 \
        --batches_per_epoch 2000 \
        --eval_per_epoch \
        --eval_num_batches_per_epoch 100 \
        --primary_metric "NF/Dice" \
        --learning_policy plateau \
        --learning_rate 0.001 \
        --lr_end 0 --lr_decay_rate 0.2 \
        --save_best \
        "$@"
elif [[ "$TASK" == "eval" ]]; then
    PYTHONPATH="${PROJECT_DIR}${PYTHONPATH:+:$PYTHONPATH}" python -m boxsegliver_tpu.cli.main nf_inter \
        --mode eval \
        "${COMMON_FLAGS[@]}" \
        --batch_size 8 \
        --eval_num_batches_per_epoch 100 \
        "$@"
elif [[ "$TASK" == "inter" ]]; then
    # full click-refinement loop (reference entry/main_eval.py)
    PYTHONPATH="${PROJECT_DIR}${PYTHONPATH:+:$PYTHONPATH}" python -m boxsegliver_tpu.cli.interactive_eval \
        --mode eval \
        "${COMMON_FLAGS[@]}" \
        --dim 2 \
        --dice_thresh 0.85 \
        --max_iters 10 \
        "$@"
fi
