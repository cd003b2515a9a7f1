"""Device ROI pipeline: face-crop + cv2-exact cubic letterbox as MXU matmuls.

The reference identification path crops each detected face from the ORIGINAL
image with an off-by-one numpy slice, /255-normalizes, INTER_CUBIC-letterboxes
to 416², and embeds one crop per device round trip (reference
src/space/face_identification.py:872-915). The repo's host path already
batches the embeds; this module moves the crop+resize on device too:

* The crop window folds into per-ROI letterbox *tap tables* (host work: ~26
  ints/floats per output row — microseconds, and only ~13 KB/ROI shipped to
  the device instead of a 416²×3 f32 crop, 160x less).
* On device the taps expand into dense (S, maxH)/(S, maxW) resize matrices
  (one_hot + reduce — a vectorized scatter) applied as two einsum passes
  against the staged original image: crop, replicate-border cubic resize, pad
  band and /255 all fall out of the same pair of matmuls on the MXU. The crop
  never materializes anywhere.
* Downstream (embed trunk + registry match) fuses into the same jitted
  program — detect boxes in, (best_idx, best_dist) out.

Numeric contract: taps reuse `ops.resize.cubic_taps` (OpenCV a=-0.75 kernel,
reciprocal-scale mapping), and BORDER_REPLICATE clamps at the *crop* edges —
indices clamp within [0, crop-1] before the window offset is added — exactly
like resizing the materialized crop. The host reference path computes in
float64 (uint8/255 → numpy f64 → cv2 f64 resize); this path is f32 at
Precision.HIGHEST, so parity is float-rounding-level, not bit-level.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_geometry
from face_vijnana_yolov3_tpu.ops.resize import apply_matrices, cubic_taps


def roi_window(l: int, t: int, r: int, b: int, src_h: int, src_w: int):
    """Exact reference crop-window semantics (face_identification.py:872-873):
    `image[(t-1):(b-1), (l-1):(r-1)]` with python slice rules.

    The off-by-one makes t==0 / l==0 wrap to a start of src-1 (an empty or
    near-empty slice the reference then skips via the zero-size check), so the
    wrap is reproduced rather than clamped.

    Returns (y0, x0, crop_h, crop_w); crop_h<=0 or crop_w<=0 means an empty
    crop the caller must skip (reference :874-877 `continue`).
    """

    def axis(start: int, stop: int, n: int):
        s = start if start >= 0 else start + n
        s = min(max(s, 0), n)
        e = stop if stop >= 0 else stop + n
        e = min(max(e, 0), n)
        return s, e - s

    y0, crop_h = axis(t - 1, b - 1, src_h)
    x0, crop_w = axis(l - 1, r - 1, src_w)
    return y0, x0, crop_h, crop_w


def roi_letterbox_taps(y0: int, x0: int, crop_h: int, crop_w: int,
                       image_size: int):
    """Cubic letterbox tap tables for one crop window, addressing the FULL
    staged image (row indices offset by y0, col indices by x0).

    Returns (row_idx (S,4) i32, row_w (S,4) f32, col_idx, col_w). Pad-band
    rows/cols carry zero weight (black border). Zero-size windows are the
    caller's responsibility (`roi_window` flags them).
    """
    geom = letterbox_geometry(crop_h, crop_w, image_size)
    if geom.new_h <= 0 or geom.new_w <= 0:
        # A crop thinner than image_size:1 letterboxes to a zero-size resize
        # target (int() truncation). The host path — like the reference,
        # src/space/face_identification.py:893 — crashes in cv2.resize on a
        # zero dsize; refuse here too rather than silently emitting a black
        # crop whose embedding could write a bogus identification row.
        raise ValueError(
            f"degenerate crop aspect {crop_h}x{crop_w}: letterbox target "
            f"{geom.new_h}x{geom.new_w} has a zero dimension (cv2.resize in "
            "the host/reference path rejects this)"
        )

    def one(origin: int, src: int, new: int, pad: int):
        idx = np.zeros((image_size, 4), np.int32)
        w = np.zeros((image_size, 4), np.float32)
        ti, tw = cubic_taps(src, new)  # replicate-clamped to the CROP edges
        idx[pad : pad + new] = ti + origin
        w[pad : pad + new] = tw
        return idx, w

    ri, rw = one(y0, crop_h, geom.new_h, geom.pad_t)
    ci, cw = one(x0, crop_w, geom.new_w, geom.pad_l)
    return ri, rw, ci, cw


_WINDOW_BUCKETS = (128, 256, 512, 1024, 2048)


def window_bucket(need: int, limit: int) -> int:
    """Smallest window bucket covering `need` source rows/cols, capped at the
    staged dimension. Face crops are usually a small fraction of the frame,
    so the resize matmuls sweep a 128-512 window instead of the full staged
    axis — the dense-matrix rows are zero outside the crop's 4-tap span, and
    sweeping provably-zero columns is pure wasted MXU/HBM work."""
    for b in _WINDOW_BUCKETS:
        if b >= need:
            return min(b, limit)
    return limit


def zero_taps(image_size: int):
    """All-zero tap tables (black output) — ROI-chunk padding filler."""
    z_i = np.zeros((image_size, 4), np.int32)
    z_w = np.zeros((image_size, 4), np.float32)
    return z_i, z_w, z_i.copy(), z_w.copy()


def _mat_from_taps(idx: jnp.ndarray, w: jnp.ndarray, in_size: int):
    """(S,T) tap tables → dense (S,in_size) resize matrix on device.

    one_hot + reduce is the vectorized-scatter form: duplicate indices (edge
    replication) sum their weights, matching `resize.taps_to_matrix`'s
    np.add.at exactly.
    """
    oh = jax.nn.one_hot(idx, in_size, dtype=w.dtype)  # (S, T, in)
    return jnp.einsum("st,sti->si", w, oh)


def roi_letterbox_device(
    image: jnp.ndarray,
    row_idx: jnp.ndarray,
    row_w: jnp.ndarray,
    col_idx: jnp.ndarray,
    col_w: jnp.ndarray,
    *,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """All ROIs of ONE staged image → letterboxed crops, on device.

    Args:
      image: (maxH, maxW, 3) staged original — uint8 raw pixels (preferred;
        the /255 fuses into the resize matmul) or float32 already in [0,1].
      row_idx/row_w/col_idx/col_w: (R, S, 4) stacked per-ROI tap tables from
        `roi_letterbox_taps`.
      precision: HIGHEST keeps the f32 resize matmuls cv2-faithful (the TPU
        default would round them to bf16 — CLAUDE.md precision contract).

    Returns:
      (R, S, S, 3) float32 crops in [0,1].
    """
    if image.dtype == jnp.uint8:
        img = image.astype(jnp.float32) * (1.0 / 255.0)
    else:
        img = image.astype(jnp.float32)
    max_h, max_w = image.shape[0], image.shape[1]

    def one(ri, rw, ci, cw):
        rm = _mat_from_taps(ri, rw, max_h)
        cm = _mat_from_taps(ci, cw, max_w)
        return apply_matrices(img, rm, cm, precision=precision)

    return jax.vmap(one)(row_idx, row_w, col_idx, col_w)


def pack_roi_operands(origins: np.ndarray, row_idx: np.ndarray,
                      row_w: np.ndarray, col_idx: np.ndarray,
                      col_w: np.ndarray) -> np.ndarray:
    """Pack per-ROI operands into ONE (R, 3 + 4·S·4) float32 array.

    The tunneled device pays a fixed per-transfer RPC latency (~tens of ms),
    so shipping origins + 4 tap tables as 5 arrays costs 5 round trips per
    call; packed, it is one bulk transfer. Integer fields (origins, tap
    indices — all < 2^24) round-trip exactly through f32.
    """
    r, s, t = row_idx.shape
    flat = lambda a: a.reshape(r, s * t).astype(np.float32)  # noqa: E731
    return np.concatenate(
        [origins.astype(np.float32), flat(row_idx), flat(row_w),
         flat(col_idx), flat(col_w)], axis=1,
    )


def unpack_roi_operands(packed: jnp.ndarray, image_size: int, taps: int = 4):
    """Device-side inverse of `pack_roi_operands`:
    (R, F) → (origins (R,3) i32, row_idx, row_w, col_idx, col_w)."""
    r = packed.shape[0]
    st = image_size * taps
    org = packed[:, :3].astype(jnp.int32)
    cut = lambda j: packed[:, 3 + j * st : 3 + (j + 1) * st].reshape(  # noqa: E731
        r, image_size, taps
    )
    return (org, cut(0).astype(jnp.int32), cut(1),
            cut(2).astype(jnp.int32), cut(3))


def build_roi_windows(boxes: np.ndarray, src_h: int, src_w: int):
    """Crop windows for a batch of detect boxes.

    Args:
      boxes: (N, >=4) float rows [xmin, ymin, xmax, ymax, ...] in original
        image coords (the detect pipeline's un-letterboxed output).

    Returns:
      (keep, wins): `keep` lists the box indices whose crop is non-empty, in
      order; `wins` the matching (y0, x0, crop_h, crop_w) tuples.
    """
    keep: list[int] = []
    wins: list[tuple[int, int, int, int]] = []
    for k in range(boxes.shape[0]):
        l, t, r, b = (int(boxes[k, 0]), int(boxes[k, 1]),
                      int(boxes[k, 2]), int(boxes[k, 3]))
        y0, x0, ch, cw = roi_window(l, t, r, b, src_h, src_w)
        if ch <= 0 or cw <= 0:
            continue
        keep.append(k)
        wins.append((y0, x0, ch, cw))
    return keep, wins


def stack_roi_taps(wins, image_size: int, origins: np.ndarray | None = None):
    """Stacked tap tables for a list of crop windows.

    origins: optional (K, 2) int array of per-ROI (oy, ox) window origins —
    tap indices then address window-relative coordinates (for the
    dynamic-slice fast path `roi_letterbox_device_windowed`); None keeps them
    absolute (full staged image).
    """
    if not wins:
        z = np.zeros((0, image_size, 4), np.int32)
        zw = np.zeros((0, image_size, 4), np.float32)
        return z, zw, z.copy(), zw.copy()
    tabs = []
    for j, (y0, x0, ch, cw) in enumerate(wins):
        oy, ox = (int(origins[j, 0]), int(origins[j, 1])) if origins is not None else (0, 0)
        tabs.append(roi_letterbox_taps(y0 - oy, x0 - ox, ch, cw, image_size))
    return (np.stack([t[0] for t in tabs]), np.stack([t[1] for t in tabs]),
            np.stack([t[2] for t in tabs]), np.stack([t[3] for t in tabs]))


def build_roi_taps(boxes: np.ndarray, src_h: int, src_w: int, image_size: int):
    """Host side for a batch of detect boxes: windows → stacked ABSOLUTE tap
    tables (full-staged-image addressing).

    Returns (keep, row_idx (K,S,4), row_w, col_idx, col_w).
    """
    keep, wins = build_roi_windows(boxes, src_h, src_w)
    return (keep,) + stack_roi_taps(wins, image_size)


def roi_letterbox_device_windowed(
    staged: jnp.ndarray,
    origins: jnp.ndarray,
    row_idx: jnp.ndarray,
    row_w: jnp.ndarray,
    col_idx: jnp.ndarray,
    col_w: jnp.ndarray,
    *,
    window_h: int,
    window_w: int,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Windowed fast path of `roi_letterbox_device`, batched across images:
    each ROI dynamic-slices a (window_h, window_w) region of ITS image at a
    host-precomputed in-bounds origin; the resize matmuls contract over the
    window instead of the full staged axes (identical weights — the skipped
    columns were exact zeros; only f32 summation order differs). ROIs of a
    whole detect chunk therefore run in ONE program call regardless of which
    image each box came from — the per-call dispatch latency (dominant on a
    tunneled device: ~100 ms/call) amortizes over the chunk.

    Args:
      staged: (B, maxH, maxW, C) staged originals — uint8 (the /255 fuses
        into the per-window convert) or float32 in [0,1].
      origins: (R, 3) int32 per-ROI (img_idx, oy, ox), clamped by the caller
        so the window fits: oy <= maxH - window_h, ox <= maxW - window_w.
      row_idx/...: (R, S, 4) tap tables RELATIVE to the window origin
        (`stack_roi_taps(..., origins=...)`).

    Returns:
      (R, S, S, C) float32 letterboxed crops in [0,1].
    """
    c = staged.shape[-1]

    def one(org, ri, rw, ci, cw):
        win = jax.lax.dynamic_slice(
            staged, (org[0], org[1], org[2], 0), (1, window_h, window_w, c)
        )[0]
        if staged.dtype == jnp.uint8:
            win = win.astype(jnp.float32) * (1.0 / 255.0)
        else:
            win = win.astype(jnp.float32)
        rm = _mat_from_taps(ri, rw, window_h)
        cm = _mat_from_taps(ci, cw, window_w)
        return apply_matrices(win, rm, cm, precision=precision)

    return jax.vmap(one)(origins, row_idx, row_w, col_idx, col_w)
