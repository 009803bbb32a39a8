#!/usr/bin/env bash
# Canonical Cosmos T2V SAP config (mirrors /root/reference/scripts/cosmos/cosmos_t2v_sap.sh).
# MODEL_DIR: local converted checkpoint dir (see io/checkpoint.py); omit for
# a reduced-size smoke run with random weights.
set -euo pipefail
MODEL_DIR="${MODEL_DIR:-}"
MODEL_ARG=""
if [ -n "$MODEL_DIR" ]; then MODEL_ARG="--model_dir $MODEL_DIR"; fi

python -m sparse_videogen_tpu.cli.cosmos_t2v $MODEL_ARG \
    --prompt "${PROMPT:-A cat walks on the grass, realistic}" \
    --height 704 --width 1280 --num_frames 121 --num_inference_steps 35 \
    --guidance_scale 7.0 --fps 30 --seed 0 \
    --pattern SAP --num_q_centroids 300 --num_k_centroids 1000 \
    --top_p_kmeans 0.9 --min_kc_ratio 0.10 \
    --kmeans_iter_init 50 --kmeans_iter_step 2 \
    --first_times_fp 0.3 --first_layers_fp 0.025
