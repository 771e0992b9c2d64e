#!/bin/bash -e
# Role of reference dev/run_instant_tests.sh: train every
# configs/quick_schedules/*instant_test.yaml for a few iterations on a small
# COCO subset (expects coco_2017_val_100 under $FSGD_DATASETS).
BIN="python tools/train_net.py"
OUTPUT="instant_test_output"
mkdir -p "$OUTPUT"
for cfg in configs/quick_schedules/*instant_test.yaml; do
  echo "========================================================================"
  echo "Running $cfg ..."
  echo "========================================================================"
  $BIN --config-file "$cfg" SOLVER.IMS_PER_BATCH 2 OUTPUT_DIR "$OUTPUT"
  rm -rf "$OUTPUT"/*
done
rm -rf "$OUTPUT"
