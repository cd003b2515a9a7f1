"""OpenCV-faithful separable resize on device (cubic a=-0.75 / nearest).

The reference letterboxes with cv2.resize INTER_CUBIC (detector pipeline) and
INTER_NEAREST (face crops). `jax.image`'s cubic is the Keys a=-0.5 kernel, so a
device pipeline built on it diverges from the host/reference math. This module
reproduces OpenCV's semantics exactly:

* cubic kernel with a = -0.75 (OpenCV's interpolateCubic),
* source coordinate mapping x_src = (x_dst + 0.5) * scale - 0.5,
* 4-tap separable filtering with edge replication (BORDER_REPLICATE clamp).

Tap indices/weights are tiny host-side numpy (per output row/col: 4 ints +
4 floats); the device side is two gather+weighted-sum passes, vmappable over a
batch with per-image tap tables — which is what lets letterboxing fuse into the
detect program instead of running on the single host core.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _cubic_weights(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """OpenCV interpolateCubic: weights for taps at offsets -1..2 given the
    fractional coordinate t in [0,1). Returns (..., 4)."""
    # Distances of the 4 taps from the sample point.
    d = np.stack([1.0 + t, t, 1.0 - t, 2.0 - t], axis=-1)
    ad = np.abs(d)
    w_near = ((a + 2.0) * ad - (a + 3.0)) * ad * ad + 1.0          # |d| <= 1
    w_far = a * (((ad - 5.0) * ad + 8.0) * ad - 4.0)               # 1 < |d| < 2
    return np.where(ad <= 1.0, w_near, np.where(ad < 2.0, w_far, 0.0))


def cubic_taps(in_size: int, out_size: int):
    """(indices (out,4) int32, weights (out,4) f32) for one axis, cv2 semantics."""
    scale = in_size / out_size
    x = (np.arange(out_size) + 0.5) * scale - 0.5
    x0 = np.floor(x)
    t = x - x0
    idx = x0[:, None].astype(np.int64) + np.arange(-1, 3)[None, :]
    idx = np.clip(idx, 0, in_size - 1)  # BORDER_REPLICATE
    w = _cubic_weights(t)
    return idx.astype(np.int32), w.astype(np.float32)


def nearest_taps(in_size: int, out_size: int):
    """1-tap tables reproducing cv2 INTER_NEAREST.

    OpenCV's resizeNN maps sx = floor(dx * (1 / inv_scale)) with
    inv_scale = out/in — the double rounding of 1/(out/in) differs from in/out
    exactly where dx*scale lands on an integer, so the reciprocal form is
    load-bearing for bit parity."""
    scale = 1.0 / (out_size / in_size)
    idx = np.clip(np.floor(np.arange(out_size) * scale), 0, in_size - 1)
    idx = idx.astype(np.int32)[:, None]
    w = np.ones((out_size, 1), np.float32)
    return idx, w


def taps_to_matrix(idx: np.ndarray, w: np.ndarray, in_size: int) -> np.ndarray:
    """(out, taps) tap tables → dense (out, in) resize matrix.

    Out-of-image taps were clamped to the edge by `cubic_taps`, so scatter-add
    reproduces BORDER_REPLICATE exactly. Dense is the MXU-friendly form: a
    (416, 720) matrix turns the row pass into one matmul instead of a 4-way
    gather that reads the image four times.
    """
    m = np.zeros((idx.shape[0], in_size), np.float32)
    np.add.at(m, (np.arange(idx.shape[0])[:, None], idx), w)
    return m


def apply_matrices(image: jnp.ndarray, row_m: jnp.ndarray, col_m: jnp.ndarray,
                   precision=None) -> jnp.ndarray:
    """Separable resize as two matmuls: (out_h,H)@(H,W,C) then cols."""
    tmp = jnp.einsum("oh,hwc->owc", row_m, image, precision=precision)
    return jnp.einsum("pw,owc->opc", col_m, tmp, precision=precision)


def apply_taps(image: jnp.ndarray, row_idx, row_w, col_idx, col_w) -> jnp.ndarray:
    """Separable filtering: rows then cols. image (H,W,C) → (out_h,out_w,C)."""
    row_idx = jnp.asarray(row_idx)
    row_w = jnp.asarray(row_w)
    col_idx = jnp.asarray(col_idx)
    col_w = jnp.asarray(col_w)
    # Rows: gather (out_h, taps, W, C) then weight-sum over taps.
    g = image[row_idx]                       # (out_h, T, W, C)
    tmp = jnp.einsum("otwc,ot->owc", g, row_w)
    # Cols.
    g2 = tmp[:, col_idx]                     # (out_h, out_w, T, C)
    return jnp.einsum("owtc,wt->owc", g2, col_w)


def resize_cv2_cubic(image: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv2.resize(image, (out_w, out_h), INTER_CUBIC) equivalent on device."""
    ri, rw = cubic_taps(image.shape[0], out_h)
    ci, cw = cubic_taps(image.shape[1], out_w)
    return apply_taps(image, ri, rw, ci, cw)


def resize_cv2_nearest(image: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    ri, rw = nearest_taps(image.shape[0], out_h)
    ci, cw = nearest_taps(image.shape[1], out_w)
    return apply_taps(image, ri, rw, ci, cw)


# -------------------------------------------------- batched strict letterbox

def letterbox_taps(geom, max_h: int, max_w: int, image_size: int,
                   interpolation: str = "cubic",
                   dec_h: int | None = None, dec_w: int | None = None):
    """Fixed-shape tap tables for one image's strict letterbox.

    Output rows [0, image_size): rows inside the pad band keep weight 0 (output
    exactly 0, the reference's black border); rows inside [pad, pad+new) carry
    the resize taps of the (src → new) mapping. Index tables address the staged
    (max_h, max_w) buffer, so one compiled program serves any image size.

    dec_h/dec_w: actual dims of the staged pixels when they were decoded at a
    reduced DCT scale (native_loader.decode_batch_staged_scaled) — the
    letterbox GEOMETRY (new sizes, pads; and the box un-mapping downstream)
    stays a function of the ORIGINAL dims in `geom`, only the resize source
    changes. Not bit-exact vs a full-res decode; callers gate it.
    """
    make = cubic_taps if interpolation == "cubic" else nearest_taps
    taps = 4 if interpolation == "cubic" else 1

    def one_axis(src, new, pad):
        idx = np.zeros((image_size, taps), np.int32)
        w = np.zeros((image_size, taps), np.float32)
        ti, tw = make(src, new)
        idx[pad : pad + new] = ti
        w[pad : pad + new] = tw
        return idx, w

    ri, rw = one_axis(dec_h or geom.src_h, geom.new_h, geom.pad_t)
    ci, cw = one_axis(dec_w or geom.src_w, geom.new_w, geom.pad_l)
    return ri, rw, ci, cw


def letterbox_device_strict(
    staged: jnp.ndarray,
    row_idx: jnp.ndarray,
    row_w: jnp.ndarray,
    col_idx: jnp.ndarray,
    col_w: jnp.ndarray,
) -> jnp.ndarray:
    """Batched strict letterbox: (B,maxH,maxW,C) + per-image tap tables →
    (B,S,S,C), matching the host cv2 path to float rounding."""
    return jax.vmap(apply_taps)(staged, row_idx, row_w, col_idx, col_w)


def letterbox_matrices(geom, max_h: int, max_w: int, image_size: int,
                       interpolation: str = "cubic",
                       dec_h: int | None = None, dec_w: int | None = None):
    """(row (S,maxH), col (S,maxW)) dense letterbox matrices for one image.

    Pad-band output rows/cols carry all-zero matrix rows, so the black border
    falls out of the matmul. dec_h/dec_w: see letterbox_taps."""
    ri, rw, ci, cw = letterbox_taps(geom, max_h, max_w, image_size,
                                    interpolation, dec_h=dec_h, dec_w=dec_w)
    return taps_to_matrix(ri, rw, max_h), taps_to_matrix(ci, cw, max_w)


def letterbox_device_matmul(
    staged: jnp.ndarray, row_ms: jnp.ndarray, col_ms: jnp.ndarray,
    precision=None,
) -> jnp.ndarray:
    """MXU-form batched strict letterbox: (B,maxH,maxW,C) + per-image dense
    matrices (B,S,maxH)/(B,S,maxW) → (B,S,S,C).

    Identical weights to the gather path — use precision='highest' for f32
    parity with cv2 (the TPU default would round the matmuls to bf16). ~10x
    faster than the gather form on large (720p+) staged inputs.
    """
    return jax.vmap(
        lambda img, rm, cm: apply_matrices(img, rm, cm, precision=precision)
    )(staged, row_ms, col_ms)
