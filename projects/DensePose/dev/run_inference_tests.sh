#!/bin/bash -e
# Role of reference projects/DensePose/dev/run_inference_tests.sh: --eval-only
# on the inference_acc_test config with zoo weights; verify_results gates on
# TEST.EXPECTED_RESULTS.
BIN="python projects/DensePose/train_net.py"
OUTPUT="inference_test_output"

if [ -z "$FSGD_MODEL_ZOO" ] || [ ! -d "$FSGD_MODEL_ZOO" ]; then
  echo "!! SKIPPING DensePose inference_acc tests: \$FSGD_MODEL_ZOO missing — golden AP unverified." >&2
  exit 0
fi
if [ -z "$FSGD_DATASETS" ] || [ ! -d "$FSGD_DATASETS" ]; then
  echo "!! SKIPPING DensePose inference_acc tests: \$FSGD_DATASETS missing." >&2
  exit 0
fi

mkdir -p "$OUTPUT"
for cfg in projects/DensePose/configs/quick_schedules/*inference_acc_test.yaml; do
  echo "========================================================================"
  echo "Running $cfg ..."
  echo "========================================================================"
  $BIN --eval-only --config-file "$cfg" OUTPUT_DIR "$OUTPUT"
  rm -rf "$OUTPUT"/*
done
rm -rf "$OUTPUT"
