#!/usr/bin/env bash
# Staged detector fine-tune: the reference's 4-stage lr/epoch schedule
# (reference docker/code/train.sh:7-10 — 1e-3 x 12ep, 1e-3 x 6, 1e-4 x 6,
# 1e-4 x 6, resuming between stages). Resume here is checkpoint-based
# (model_loading=true reloads params + optimizer state).
set -euo pipefail
CONF=${1:-face_vijnana_yolov3.json}
PY="python -m face_vijnana_yolov3_tpu.api.face_detection --conf=${CONF}"

$PY fd_conf.mode=train fd_conf.hps.lr=0.001  fd_conf.hps.epochs=12
$PY fd_conf.mode=train fd_conf.hps.lr=0.001  fd_conf.hps.epochs=6 fd_conf.model_loading=true
$PY fd_conf.mode=train fd_conf.hps.lr=0.0001 fd_conf.hps.epochs=6 fd_conf.model_loading=true
$PY fd_conf.mode=train fd_conf.hps.lr=0.0001 fd_conf.hps.epochs=6 fd_conf.model_loading=true
