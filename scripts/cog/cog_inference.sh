#!/usr/bin/env bash
# Canonical CogVideoX 1.5 I2V SVG config (mirrors /root/reference/scripts/cog/cog_inference.sh).
# MODEL_DIR: local converted checkpoint dir (see io/checkpoint.py); omit for
# a reduced-size smoke run with random weights.
set -euo pipefail
MODEL_DIR="${MODEL_DIR:-}"
MODEL_ARG=""
if [ -n "$MODEL_DIR" ]; then MODEL_ARG="--model_dir $MODEL_DIR"; fi

python -m sparse_videogen_tpu.cli.cog_i2v $MODEL_ARG \
    --version v1.5 --seed 0 \
    --prompt "${PROMPT:-A cat walks on the grass, realistic}" \
    --image_path "${IMAGE:-examples/1/image.npy}" \
    --pattern SVG --num_step 50 --sparsity 0.25 --num_sampled_rows 32 \
    --first_layers_fp 0.025 --first_times_fp 0.2
