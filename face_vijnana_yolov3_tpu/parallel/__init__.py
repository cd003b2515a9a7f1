"""Distributed execution: mesh construction, sharding rules, multi-host init."""

from face_vijnana_yolov3_tpu.parallel.mesh import (
    init_distributed,
    make_mesh,
    replicated,
    batch_sharded,
    shard_identifier_params,
    put_tree,
)
from face_vijnana_yolov3_tpu.parallel.serving import detect_quant_dp

__all__ = [
    "detect_quant_dp",
    "init_distributed",
    "make_mesh",
    "replicated",
    "batch_sharded",
    "shard_identifier_params",
    "put_tree",
]
