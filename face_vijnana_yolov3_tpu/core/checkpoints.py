"""Orbax-backed checkpoints.

The reference's only persistence is whole-model Keras HDF5 at end-of-training
(face_detector.h5 / face_identifier.h5 — reference src/space/face_detection.py:630,
src/space/face_identification.py:643), with no optimizer state and no versioning.
Here checkpoints carry params + BN state + optimizer state + step, so
`model_loading: true` resumes *training* exactly, not just weights.
"""

from __future__ import annotations

import os
from typing import Any


def save_checkpoint(path: str, tree: Any, meta: dict | None = None) -> None:
    """Save a pytree (params/state/opt_state/step) to `path` (a directory).

    meta: optional JSON-able training metadata written to a sidecar file
    (`<path>.trainmeta.json`) — e.g. {"qat": true} for quantization-aware
    runs (pin-less QAT checkpoints serve FULL int8 by default), or the
    measured `int8_tail` serving pin written by update_train_meta /
    scripts/select_serving_tail.py, which calibrate_int8 honors over every
    heuristic (the label-free self-check is measurably blind to the tail
    frontier on QAT artifacts — PROFILE round 5). A sidecar keeps old
    checkpoints loadable unchanged.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    if meta is not None:
        import json

        with open(path + ".trainmeta.json", "w") as f:
            json.dump(meta, f)


def update_train_meta(path: str, **kv) -> dict:
    """Merge keys into a checkpoint's trainmeta sidecar; returns the result.

    Used by release-time tooling to pin MEASURED serving configuration onto
    the artifact — e.g. `int8_tail` from scripts/select_serving_tail.py (the
    label-free calibration self-check cannot resolve the int8 tail frontier
    on QAT checkpoints: measured errs are flat ~0.03-0.05 across tails whose
    held-out AP50 spans 0.35-0.91, PROFILE round 5). Serving honors the pin
    (api/face_detection.calibrate_int8)."""
    import json

    meta = load_train_meta(path)
    meta.update(kv)
    with open(os.path.abspath(path) + ".trainmeta.json", "w") as f:
        json.dump(meta, f)
    return meta


def load_train_meta(path: str) -> dict:
    """Sidecar training metadata for a checkpoint ({} when absent)."""
    import json

    p = os.path.abspath(path) + ".trainmeta.json"
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def load_checkpoint(path: str, target: Any | None = None) -> Any:
    """Restore a pytree saved by `save_checkpoint`.

    With `target` given, array shapes/dtypes restore onto that structure;
    without, the raw saved tree comes back (nested dicts of numpy arrays).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target=target)
    return ckptr.restore(path)


def checkpoint_exists(path: str) -> bool:
    return os.path.isdir(os.path.abspath(path))
