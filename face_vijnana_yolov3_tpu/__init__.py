"""face_vijnana_yolov3_tpu — a TPU-native (JAX/XLA/Pallas/pjit) face detection and
open-set face identification framework.

Capability-equivalent rebuild of the `face_vijnana_yolov3` reference (Keras 2.2.4 /
TF 1.13), re-designed TPU-first:

* the Darknet-53 trunk and YOLO heads are pure-functional JAX modules (NHWC, bf16
  compute on the MXU, folded conv+BN inference path),
* letterbox preprocessing, box decode, confidence thresholding, IoU NMS and top-k
  candidate selection fuse into a single jitted on-device program (the reference runs
  these as host numpy loops — reference src/space/face_detection.py:885-949),
* the face-identification embedder and the subject-registry L2 matching run as batched
  on-device matmuls (reference src/space/face_identification.py:915-925 does one
  device round-trip and a python loop per box),
* training is data-parallel `jit` over a `jax.sharding.Mesh` with XLA collectives
  replacing Keras `multi_gpu_model` (reference src/space/face_detection.py:369).

Subpackages
-----------
core      parameter pytrees, darknet weight import, Orbax checkpoints
models    darknet trunk / full YOLOv3 / face detector / face identifier
ops       device kernels: letterbox, decode, NMS, similarity
data      UCCS / VGGFace2 pipelines, subject face DB, triplet sampling
parallel  mesh + sharding rules + distributed train/eval steps
train     optimizers (Keras-semantics Adam), training loops
evals     detection mAP harness, identification VAL/FAR + accuracy
api       config-JSON driven CLIs mirroring the reference entry points
utils     drawing, image IO, profiling helpers
"""

__version__ = "0.1.0"
