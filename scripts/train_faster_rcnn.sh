#!/bin/bash
# Multi-chip surface-signs Faster R-CNN training.
# Parity: reference scripts/train_faster_rcnn.sh (2xV100, torch DDP) — on TPU
# the data mesh spans every local chip automatically (fsgd_tpu/parallel/mesh.py);
# per-chip batch stays at 12 so IMS_PER_BATCH scales with the slice size.
set -x

model_num=${1:-1}
nchips=$(python -c "import jax; print(jax.device_count())")
python tools/train_net.py \
    --config-file "configs/ssigns/faster_rcnn_R_50_upsample_FPN_${model_num}_1x.yaml" \
    SOLVER.IMS_PER_BATCH $((12 * nchips)) SOLVER.BASE_LR 0.0025 \
    MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS '[[0.5, 0.2, 0.125]]' \
    OUTPUT_DIR "output/surface_signs/faster_rcnn_${model_num}_5"
