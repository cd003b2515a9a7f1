"""Darknet binary weight importer → JAX param/state pytrees.

Format parity with the reference's WeightReader (reference
src/space/yolov3_detect.py:67-124): 3 int32 header fields (major/minor/revision),
then 8 bytes (seen-images counter) when major*10+minor >= 2 else 4, then a flat
float32 stream. Per conv (in ascending layer index): for BN convs, beta, gamma,
moving mean, moving variance (C floats each), then the kernel as [out,in,k,k]
row-major; for bias convs (heads 81/93/105), bias then kernel. Kernels transpose to
HWIO ([2,3,1,0] of [out,in,k,k] read as the reversed Keras shape — same transform
the reference applies at yolov3_detect.py:112-113).
"""

from __future__ import annotations

import struct

import numpy as np
import jax.numpy as jnp

from face_vijnana_yolov3_tpu.models.darknet import conv_layout


class DarknetWeightStream:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            major = struct.unpack("i", f.read(4))[0]
            minor = struct.unpack("i", f.read(4))[0]
            struct.unpack("i", f.read(4))[0]  # revision
            if (major * 10 + minor) >= 2 and major < 1000 and minor < 1000:
                f.read(8)
            else:
                f.read(4)
            self.data = np.frombuffer(f.read(), dtype=np.float32)
        self.offset = 0

    def take(self, n: int) -> np.ndarray:
        out = self.data[self.offset : self.offset + n]
        if out.shape[0] != n:
            raise ValueError(
                f"darknet weight file exhausted: wanted {n} floats at offset "
                f"{self.offset}, have {self.data.shape[0]}"
            )
        self.offset += n
        return out

    @property
    def remaining(self) -> int:
        return self.data.shape[0] - self.offset


def load_darknet_weights(path: str, ops: list[tuple]):
    """Read a darknet .weights file into (params, state) for the given graph IR.

    Works for both the full YOLOv3 graph and the truncated trunk: the trunk's conv
    sequence (0..73) is a prefix of the full file, exactly like the reference's
    layer-by-layer rebuild reusing the first 74 conv layers
    (face_detection.py:398-600).
    """
    stream = DarknetWeightStream(path)
    params: dict = {}
    state: dict = {}
    for idx, in_c, out_c, k, _stride, bn in conv_layout(ops):
        if bn:
            beta = stream.take(out_c)
            gamma = stream.take(out_c)
            mean = stream.take(out_c)
            var = stream.take(out_c)
            params[f"bnorm_{idx}"] = {
                "gamma": jnp.asarray(gamma),
                "beta": jnp.asarray(beta),
            }
            state[f"bnorm_{idx}"] = {
                "mean": jnp.asarray(mean),
                "var": jnp.asarray(var),
            }
            entry = {}
        else:
            entry = {"bias": jnp.asarray(stream.take(out_c))}
        kernel = stream.take(out_c * in_c * k * k)
        kernel = kernel.reshape(out_c, in_c, k, k).transpose(2, 3, 1, 0)  # HWIO
        entry["kernel"] = jnp.asarray(np.ascontiguousarray(kernel))
        params[f"conv_{idx}"] = entry
    return params, state
