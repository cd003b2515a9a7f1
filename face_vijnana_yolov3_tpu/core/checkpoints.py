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


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree (params/state/opt_state/step) to `path` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


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
