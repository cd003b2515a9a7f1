#!/usr/bin/env bash
# One-command reproduction of the reference's published UCCS face-detection
# table (reference README.md:184-215: mAP 23.57, AP50 67.21) — see PARITY.md.
#
# Usage: scripts/reproduce_reference.sh WORKDIR
# WORKDIR must contain:
#   face_detector.h5       trained reference checkpoint (Keras h5), OR a
#                          framework Orbax checkpoint dir named face_detector_tpu
#   validation/            UCCS validation fold: *.jpg + validation.csv
set -euo pipefail

WORKDIR=${1:?usage: reproduce_reference.sh WORKDIR}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$WORKDIR"

MODEL=""
if [ -f face_detector.h5 ]; then
  MODEL=face_detector.h5
elif [ -d face_detector_tpu ]; then
  MODEL=face_detector_tpu
else
  echo "ERROR: no face_detector.h5 or face_detector_tpu/ in $WORKDIR" >&2
  echo "  (train first: put yolov3.weights + the UCCS training fold here and" >&2
  echo "   run the 4-stage scripts/train.sh, or a single mode=train run)" >&2
  exit 2
fi
[ -f validation/validation.csv ] || {
  echo "ERROR: validation/validation.csv missing in $WORKDIR" >&2; exit 2; }

export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

echo "== 1/2 evaluate -> solution_fd.csv (model: $MODEL)"
python -m face_vijnana_yolov3_tpu.api.face_detection \
  --conf "$REPO/face_vijnana_yolov3.json" \
  --set fd_conf.mode=evaluate \
  --set fd_conf.model_loading=true \
  --set "fd_conf.model_path=$MODEL" \
  --set "fd_conf.test_path=$WORKDIR/validation" \
  --set "fd_conf.output_file_path=$WORKDIR/solution_fd.csv" \
  --set fd_conf.hps.face_conf_th=0.5 \
  --set fd_conf.hps.nms_iou_th=0.5 \
  --set fd_conf.hps.num_cands=60

echo "== 2/2 cal_map_fd -> p_r_curve.h5 + AP table"
python -m face_vijnana_yolov3_tpu.api.evaluate -m cal_map_fd \
  -g "$WORKDIR/validation/validation.csv" -s "$WORKDIR/solution_fd.csv"

echo "Done. Compare the table above with reference README.md:184-215"
echo "(mAP 23.57, AP50 67.21)."
