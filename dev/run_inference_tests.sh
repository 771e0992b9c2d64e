#!/bin/bash -e
# Role of reference dev/run_inference_tests.sh: --eval-only on every
# *inference_acc_test.yaml with pretrained zoo weights; configs pin expected
# metrics in TEST.EXPECTED_RESULTS and verify_results exits non-zero on
# mismatch.
#
# Requirements (skipped loudly when absent — this environment has no network):
#   $FSGD_MODEL_ZOO  - local mirror of the detectron2 zoo (detectron2:// tree)
#   $FSGD_DATASETS   - datasets root containing coco_2017_val_100 annotations
BIN="python tools/train_net.py"
OUTPUT="inference_test_output"

if [ -z "$FSGD_MODEL_ZOO" ] || [ ! -d "$FSGD_MODEL_ZOO" ]; then
  echo "!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!" >&2
  echo "!! SKIPPING inference_acc tests: \$FSGD_MODEL_ZOO is not set or missing." >&2
  echo "!! Golden-AP parity is UNVERIFIED without zoo weights.                  " >&2
  echo "!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!" >&2
  exit 0
fi
if [ -z "$FSGD_DATASETS" ] || [ ! -d "$FSGD_DATASETS" ]; then
  echo "!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!" >&2
  echo "!! SKIPPING inference_acc tests: \$FSGD_DATASETS is not set or missing.  " >&2
  echo "!! Run datasets/prepare_for_tests equivalent to fetch coco_2017_val_100." >&2
  echo "!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!" >&2
  exit 0
fi

mkdir -p "$OUTPUT"
for cfg in configs/quick_schedules/*inference_acc_test.yaml; do
  echo "========================================================================"
  echo "Running $cfg ..."
  echo "========================================================================"
  $BIN --eval-only --config-file "$cfg" OUTPUT_DIR "$OUTPUT"
  rm -rf "$OUTPUT"/*
done
rm -rf "$OUTPUT"
