"""Space-to-depth rewrite of the trunk's first two convs (serving fast path).

The stock graph opens with conv_0 (3x3 s1, 3→32 @416²) and conv_1 (3x3 s2,
32→64): tiny contraction dims (27 and 288) that waste the 128-wide MXU at the
largest spatial extent. The classic TPU transform (MLPerf ResNet) re-expresses
them EXACTLY on a 2x space-to-depth input:

  x (B,416,416,3) → X (B,208,208,12)   with channel (u*2+v)*3+c = x[2p+u,2q+v,c]
  conv_0  ≡ 3x3 conv over X, 12→128    (the 4 output phases stack channelwise)
  conv_1  ≡ 2x2 conv over Y, 128→64, padding ((1,0),(1,0))

Kernels are algebraic rearrangements of the pretrained weights — outputs match
the stock folded path to float rounding (tested), so this is a pure layout
optimization: contraction dims become 108 and 512 and all spatial work runs at
208². bias/BN folding and the leaky epilogue apply per 32-channel phase group.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from face_vijnana_yolov3_tpu.models import darknet


def _rearrange_conv0(k0: np.ndarray) -> np.ndarray:
    """(3,3,3,32) stock kernel → (3,3,12,128) phase-stacked s2d kernel."""
    out = np.zeros((3, 3, 12, 32 * 4), k0.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    t, s = a + di, b + dj
                    u, v = t % 2, s % 2
                    P, Q = (t - u) // 2, (s - v) // 2
                    # s2d window offsets span {-1,0,1} → 3x3 kernel positions.
                    out[P + 1, Q + 1, (u * 2 + v) * 3 : (u * 2 + v) * 3 + 3,
                        (a * 2 + b) * 32 : (a * 2 + b) * 32 + 32] = \
                        k0[di + 1, dj + 1, :, :]
    return out


def _rearrange_conv1(k1: np.ndarray) -> np.ndarray:
    """(3,3,32,64) stock stride-2 kernel → (2,2,128,64) s2d kernel."""
    out = np.zeros((2, 2, 32 * 4, 64), k1.dtype)
    for m in range(3):
        for n in range(3):
            t, s = m - 1, n - 1  # offset relative to the even output row 2i
            u, v = t % 2, s % 2
            P, Q = (t - u) // 2, (s - v) // 2  # ∈ {-1, 0}
            out[P + 1, Q + 1,
                (u * 2 + v) * 32 : (u * 2 + v) * 32 + 32, :] = k1[m, n, :, :]
    return out


def build_s2d_folded(folded: dict) -> dict:
    """Extend a folded param dict with the s2d kernels/biases."""
    k0 = np.asarray(folded["conv_0"]["kernel"])
    b0 = np.asarray(folded["conv_0"]["bias"])
    k1 = np.asarray(folded["conv_1"]["kernel"])
    out = dict(folded)
    out["s2d_conv0"] = {
        "kernel": jnp.asarray(_rearrange_conv0(k0)),
        "bias": jnp.asarray(np.tile(b0, 4)),
    }
    out["s2d_conv1"] = {
        "kernel": jnp.asarray(_rearrange_conv1(k1)),
        "bias": folded["conv_1"]["bias"],
    }
    return out


def _space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def apply_graph_folded_s2d(
    folded_s2d: dict, x: jnp.ndarray, ops: list[tuple], *,
    compute_dtype=jnp.bfloat16,
):
    """Folded inference with the s2d front; graphs must open conv_0, conv_1."""
    assert ops[0][:2] == ("conv", 0) and ops[1][:2] == ("conv", 1), (
        "s2d path requires the stock conv_0/conv_1 opening"
    )

    def conv(h, p, pad, stride=1):
        return jax.lax.conv_general_dilated(
            h.astype(compute_dtype),
            p["kernel"].astype(compute_dtype),
            window_strides=(stride, stride),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + p["bias"]

    h = _space_to_depth2(x.astype(compute_dtype))
    h = conv(h, folded_s2d["s2d_conv0"], ((1, 1), (1, 1)))
    h = jnp.where(h > 0, h, darknet.LEAKY_ALPHA * h).astype(compute_dtype)
    h = conv(h, folded_s2d["s2d_conv1"], ((1, 0), (1, 0)))
    h = jnp.where(h > 0, h, darknet.LEAKY_ALPHA * h).astype(compute_dtype)
    # Continue the stock interpreter from op index 2.
    return darknet.apply_graph_folded(
        folded_s2d, h, ops[2:], compute_dtype=compute_dtype
    )
