#!/usr/bin/env bash
# Canonical HunyuanVideo T2V 720p dense config (mirrors /root/reference/scripts/hyvideo/hyvideo_t2v_720p_dense.sh).
# MODEL_DIR: local converted checkpoint dir (see io/checkpoint.py); omit for
# a reduced-size smoke run with random weights.
set -euo pipefail
MODEL_DIR="${MODEL_DIR:-}"
MODEL_ARG=""
if [ -n "$MODEL_DIR" ]; then MODEL_ARG="--model_dir $MODEL_DIR"; fi

python -m sparse_videogen_tpu.cli.hyvideo_t2v $MODEL_ARG \
    --prompt "${PROMPT:-A cat walks on the grass, realistic}" \
    --height 720 --width 1280 --num_frames 129 --num_inference_steps 50 \
    --seed 0 --flow_shift 7.0 \
    --pattern dense
