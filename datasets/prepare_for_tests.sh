#!/bin/bash -e
# Fetch (or synthesize) the tiny COCO fixtures used by dev/run_*_tests.sh and
# the quick_schedules configs.  Role of the reference's
# datasets/prepare_for_tests.sh, which downloads 100-image val2017 annotation
# subsets from dl.fbaipublicfiles.com.
#
# Online:  downloads the same real annotation subsets the reference uses
#          (images must already exist under coco/val2017).
# Offline: falls back to generating the checked-in synthetic micro-COCO
#          (8 real JPEGs + instances/keypoints/panoptic annotations) with
#          dev/make_micro_coco.py, then derives the PanopticFPN semantic PNGs.
#
# Either way, after this script every quick_schedules *_instant_test.yaml can
# run with FSGD_DATASETS pointing at this directory.

cd "${0%/*}"
REPO="$(cd .. && pwd)"

BASE=https://dl.fbaipublicfiles.com/detectron2
mkdir -p coco/annotations

download_ok=1
for anno in instances_val2017_100 person_keypoints_val2017_100; do
  dest=coco/annotations/$anno.json
  if [[ -s $dest ]]; then
    echo "$dest exists. Skipping ..."
  elif ! wget -q --timeout=10 --tries=1 "$BASE/annotations/coco/$anno.json" -O "$dest"; then
    rm -f "$dest"
    download_ok=0
    break
  fi
done

if [[ $download_ok == 0 ]]; then
  echo "download unavailable — generating the synthetic micro-COCO fixture instead"
  python "$REPO/dev/make_micro_coco.py" --dest .
fi

# PanopticFPN semantic PNGs (no-op unless panoptic annotations are present)
python "$REPO/datasets/prepare_panoptic_fpn.py" --root .

echo "done. point FSGD_DATASETS at $(pwd) to use these fixtures."
