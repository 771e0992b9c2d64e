#!/bin/bash -e
# Role of reference dev/run_inference_tests.sh: --eval-only on every
# *inference_acc_test.yaml with pretrained weights; configs pin expected
# metrics in TEST.EXPECTED_RESULTS and verify_results exits non-zero on
# mismatch.  Set $FSGD_MODEL_ZOO to a local zoo-weight mirror.
BIN="python tools/train_net.py"
OUTPUT="inference_test_output"
mkdir -p "$OUTPUT"
for cfg in configs/quick_schedules/*inference_acc_test.yaml; do
  echo "========================================================================"
  echo "Running $cfg ..."
  echo "========================================================================"
  $BIN --eval-only --config-file "$cfg" OUTPUT_DIR "$OUTPUT"
  rm -rf "$OUTPUT"/*
done
rm -rf "$OUTPUT"
