#!/bin/bash
# Single-chip surface-signs RetinaNet training on a TPU VM.
# Parity: reference scripts/train.sh (SLURM v100 launch) re-targeted at TPU —
# no scheduler directives; run directly on the TPU VM (or via
# `gcloud compute tpus tpu-vm ssh ... --command="bash scripts/train.sh 0"`).
set -x

model_num=${1:-0}
python tools/train_net.py \
    --config-file "configs/ssigns/simple_retinanet_R_50.yaml" \
    SOLVER.IMS_PER_BATCH 12 SOLVER.BASE_LR 0.0025 \
    OUTPUT_DIR "output/surface_signs/simple_retinanet_${model_num}"

#  --eval_only --resume
# MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS '[[0.5, 0.2, 0.125]]'
