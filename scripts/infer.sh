#!/bin/bash
# Batch inference over an image list with a trained surface-signs model.
# Parity: reference scripts/infer.sh re-targeted at TPU (orbax checkpoint
# instead of .pth; same CLI surface, tools/infer.py).
set -x

python tools/infer.py \
    --config-file configs/ssigns/simple_retinanet_R_50.yaml \
    --input_file image_list_centered_1.txt \
    --output output/surface_signs/simple_retinanet_0/centered_1 \
    --opts MODEL.WEIGHTS output/surface_signs/simple_retinanet_0/model_final
