"""Distributed execution: mesh construction, sharding rules, SPMD train steps."""

from face_vijnana_yolov3_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    batch_sharded,
    shard_identifier_params,
    build_detector_train_step,
    build_identifier_train_step,
)

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharded",
    "shard_identifier_params",
    "build_detector_train_step",
    "build_identifier_train_step",
]
