#!/usr/bin/env bash
# Single test run → solution_fd.csv (reference docker/code/test.sh equivalent).
set -euo pipefail
CONF=${1:-face_vijnana_yolov3.json}
python -m face_vijnana_yolov3_tpu.api.face_detection --conf="${CONF}" fd_conf.mode=test
