#!/usr/bin/env bash
# Canonical Wan I2V 480p SVG1 config (mirrors /root/reference/scripts/wan/wan_i2v_480p_svg.sh).
# MODEL_DIR: local converted checkpoint dir (see io/checkpoint.py); omit for
# a reduced-size smoke run with random weights.
set -euo pipefail
MODEL_DIR="${MODEL_DIR:-}"
MODEL_ARG=""
if [ -n "$MODEL_DIR" ]; then MODEL_ARG="--model_dir $MODEL_DIR"; fi

python -m sparse_videogen_tpu.cli.wan_i2v $MODEL_ARG \
    --prompt "${PROMPT:-A cat walks on the grass, realistic}" \
    --image_path "${IMAGE:-examples/1/image.jpg}" \
    --resolution 480p --num_frames 81 --num_inference_steps 50 --seed 0 \
    --pattern SVG --sparsity 0.25 --num_sampled_rows 64 \
    --first_times_fp 0.03 --first_layers_fp 0.3
