#!/usr/bin/env bash
# Data-parallel UNet training across the full TPU mesh (mirrors reference
# run_scripts/template/001_dist.sh, whose --distribution_strategy mirrored
# --num_gpus N becomes one mesh-size knob here; XLA inserts the gradient
# all-reduce over ICI).
#
# usage: 001_dist.sh {train|eval} [num_replicas=0(all devices)] [extra flags...]

TASK=${1:-train}
REPLICAS=${2:-0}
shift $(( $# >= 2 ? 2 : $# ))

PROJECT_DIR=$(dirname $(dirname $(dirname $(realpath $0))))
BASE_NAME=$(basename $0)

COMMON_FLAGS=(
    --tag "${BASE_NAME%.sh}"
    --model UNet
    --classes Liver Tumor
    --test_fold 2
    --im_height 256 --im_width 256 --im_channel 3
    --random_flip 3
    --num_replicas "${REPLICAS}"
    --dataset LiTS
)

if [[ "$TASK" == "train" ]]; then
    # global batch scales with the mesh (per-device batch 8, reference
    # per_device_batch_size contract, utils/distribution_utils.py:107-134)
    DEVICES=${REPLICAS}
    if [[ "$DEVICES" == "0" ]]; then
        DEVICES=$(python - <<'EOF'
import jax
print(len(jax.devices()))
EOF
)
    fi
    PYTHONPATH="${PROJECT_DIR}${PYTHONPATH:+:$PYTHONPATH}" python -m boxsegliver_tpu.cli.main liver \
        --mode train \
        "${COMMON_FLAGS[@]}" \
        --batch_size $(( 8 * DEVICES )) \
        --noise_scale 0.05 \
        --num_of_total_steps 600000 \
        --primary_metric "Tumor/Dice" \
        --secondary_metric "Liver/Dice" \
        --loss_weight_type numerical \
        --loss_numeric_w 0.2 0.4 4.4 \
        --batches_per_epoch 2000 \
        --learning_policy plateau \
        --learning_rate 0.001 \
        --lr_end 0 \
        --lr_decay_rate 0.2 \
        --eval_per_epoch \
        --evaluator Volume \
        --save_best \
        --device_cache \
        "$@"
elif [[ "$TASK" == "eval" ]]; then
    PYTHONPATH="${PROJECT_DIR}${PYTHONPATH:+:$PYTHONPATH}" python -m boxsegliver_tpu.cli.main liver \
        --mode eval \
        "${COMMON_FLAGS[@]}" \
        --batch_size 8 \
        --evaluator Volume \
        "$@"
fi
