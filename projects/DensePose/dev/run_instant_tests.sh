#!/bin/bash -e
# Role of reference projects/DensePose/dev/run_instant_tests.sh: train the
# instant_test config for a few iterations on the densepose minival subset.
BIN="python projects/DensePose/train_net.py"
OUTPUT="instant_test_output"

if [ -z "$FSGD_DATASETS" ] || [ ! -d "$FSGD_DATASETS" ]; then
  echo "!! SKIPPING DensePose instant tests: \$FSGD_DATASETS is not set or missing." >&2
  exit 0
fi

mkdir -p "$OUTPUT"
for cfg in projects/DensePose/configs/quick_schedules/*instant_test.yaml; do
  echo "========================================================================"
  echo "Running $cfg ..."
  echo "========================================================================"
  $BIN --config-file "$cfg" SOLVER.IMS_PER_BATCH 2 OUTPUT_DIR "$OUTPUT"
  rm -rf "$OUTPUT"/*
done
rm -rf "$OUTPUT"
