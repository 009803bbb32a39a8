#!/usr/bin/env bash
# Canonical HunyuanVideo T2V 480p SAP config (mirrors /root/reference/scripts/hyvideo/hyvideo_t2v_480p_sap.sh).
# MODEL_DIR: local converted checkpoint dir (see io/checkpoint.py); omit for
# a reduced-size smoke run with random weights.
set -euo pipefail
MODEL_DIR="${MODEL_DIR:-}"
MODEL_ARG=""
if [ -n "$MODEL_DIR" ]; then MODEL_ARG="--model_dir $MODEL_DIR"; fi

python -m sparse_videogen_tpu.cli.hyvideo_t2v $MODEL_ARG \
    --prompt "${PROMPT:-A cat walks on the grass, realistic}" \
    --height 480 --width 854 --num_frames 129 --num_inference_steps 50 \
    --seed 0 --flow_shift 7.0 \
    --pattern SAP --num_q_centroids 400 --num_k_centroids 1000 \
    --top_p_kmeans 0.9 --min_kc_ratio 0.10 \
    --kmeans_iter_init 50 --kmeans_iter_step 2 \
    --zero_step_kmeans_init \
    --first_times_fp 0.1 --first_layers_fp 0.025
