"""Pallas kernel: fused conv_0 → leaky → conv_1 → leaky trunk front.

Why: at batch 128/416² the stock front costs ~8.8 ms — not MXU time but HBM
traffic: conv_0's 416²×32 intermediate is a 1.4 GB round trip per batch that
XLA cannot eliminate (it never fuses conv→conv). This kernel keeps that
intermediate in VMEM: each program DMAs a haloed row-band of the
space-to-depth input, computes both layers as tap matmuls, and writes only the
final 208²×64 output.

Uses the exact s2d kernel rearrangement from models/s2d.py (algebraically
identical to the pretrained conv_0/conv_1), so outputs match the stock folded
path to float rounding.

STATUS — experimental, not wired into the serving path. On a real v5e it
compiles, matches the stock path to bf16 rounding, and realizes the HBM
saving, but runs 3.4x slower end-to-end (29.7 vs 8.7 ms at batch 128): Mosaic
forbids the layout moves (leading-dim collapses, lane-concat of shifted
slices) that would batch the 113 per-tap matmuls each program issues, and
their fixed overheads dominate. Conclusion recorded for future rounds: the
stock front is HBM-bound at ~8.7 ms and XLA's conv lowering is already within
~2x of the bandwidth floor; beating it needs either Mosaic support for
batched tap matmuls or an emit_pipeline formulation.

Mosaic-shaped layout choices (each earned by a compiler error):
  * input layout (B, rows, ch16, width) — channels live in SUBLANES (12→16
    padded) and width in LANES, because HBM slices must be (8,128)-tile
    aligned and a 12-channel lane dim can never be;
  * conv_0 taps are dot_generals contracting the 16-sublane channel dim
    (lhs (16, g+1) · rhs (16, 128));
  * per-row matmuls (no leading-dim collapses, no lane-concats of shifted
    slices — both unsupported);
  * 16-row DMA blocks from 8-aligned starts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from face_vijnana_yolov3_tpu.models.darknet import LEAKY_ALPHA

R_TILE = 8  # output rows per program (208 = 26 * 8)


def _front_kernel(xp_ref, k0_ref, b0_ref, k1_ref, b1_ref, out_ref,
                  xt_ref, y_ref, sem, *, r_tile: int, g: int, compute_dtype):
    b = pl.program_id(0)
    t = pl.program_id(1)

    dma = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(t * r_tile, 16)], xt_ref, sem
    )
    dma.start()
    dma.wait()

    # conv_0': per Y-row, 9 taps contracting the channel sublanes.
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (g + 1, 128), 0)
    dn = (((0,), (0,)), ((), ()))  # contract lhs dim0 with rhs dim0
    for m in range(r_tile + 1):
        y = jnp.zeros((g + 1, 128), jnp.float32)
        for dr in range(3):
            for dc in range(3):
                tap = xt_ref[m + dr, :, dc : dc + g + 1]      # (16, g+1)
                k = k0_ref[dr * 3 + dc]                        # (16, 128)
                y = y + jax.lax.dot_general(
                    tap, k, dn, preferred_element_type=jnp.float32
                )
        y = y + b0_ref[...]
        y = jnp.where(y > 0, y, LEAKY_ALPHA * y)
        # Y index -1 (row 0 of the FIRST tile, col 0 of every tile) is conv_1's
        # zero padding in the stock network — exactly zero, not conv_0
        # evaluated beyond the image.
        phantom = (col_ids == 0) | (
            jnp.full_like(col_ids, (m == 0), dtype=jnp.bool_) & (t == 0)
        )
        y = jnp.where(phantom, 0.0, y)
        y_ref[m, :, :] = y.astype(compute_dtype)

    # conv_1': per z-row, 4 taps at MXU-dense depth 128.
    for p in range(r_tile):
        z = jnp.zeros((g, 64), jnp.float32)
        for r2 in range(2):
            for s2 in range(2):
                tap = y_ref[r2 + p, s2 : s2 + g, :]            # (g, 128)
                k = k1_ref[pl.ds((r2 * 2 + s2) * 128, 128), :]
                z = z + jnp.dot(tap, k, preferred_element_type=jnp.float32)
        z = z + b1_ref[...]
        z = jnp.where(z > 0, z, LEAKY_ALPHA * z)
        out_ref[0, p, :, :] = z.astype(out_ref.dtype)


def fused_front(
    x: jnp.ndarray,
    folded_s2d: dict,
    *,
    compute_dtype=jnp.bfloat16,
    r_tile: int = R_TILE,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B,416,416,3) → conv_1 output (B,208,208,64), post-leaky.

    folded_s2d: params from models.s2d.build_s2d_folded (s2d_conv0/s2d_conv1).
    """
    b, h, w, c = x.shape
    assert h == w and h % 2 == 0 and c == 3
    g = h // 2
    assert g % r_tile == 0
    gp = g + 8                       # rows: 8-aligned + room for 16-row DMAs
    wl = -(-(g + 3) // 128) * 128    # width (lanes): 128-aligned for HBM slices
    # Space-to-depth; pad 2 top/left, rest bottom/right; channels 12→16; then
    # channels into sublanes: (B, rows, 16, width).
    xs = x.reshape(b, g, 2, g, 2, 3).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(b, g, g, 12).astype(compute_dtype)
    xp = jnp.pad(xs, ((0, 0), (2, gp - g - 2), (2, wl - g - 2), (0, 4)))
    xp = xp.transpose(0, 1, 3, 2)  # (B, gp, 16, wl)

    k0 = folded_s2d["s2d_conv0"]["kernel"].reshape(9, 12, 128)
    k0 = jnp.pad(k0, ((0, 0), (0, 4), (0, 0))).astype(compute_dtype)  # (9,16,128)
    b0 = folded_s2d["s2d_conv0"]["bias"].reshape(1, 128).astype(jnp.float32)
    k1 = folded_s2d["s2d_conv1"]["kernel"].reshape(512, 64).astype(compute_dtype)
    b1 = folded_s2d["s2d_conv1"]["bias"].reshape(1, 64).astype(jnp.float32)

    kernel = functools.partial(
        _front_kernel, r_tile=r_tile, g=g, compute_dtype=compute_dtype
    )
    return pl.pallas_call(
        kernel,
        grid=(b, g // r_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # Xp: manual haloed DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k0 taps
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
        ],
        out_specs=pl.BlockSpec(
            (1, r_tile, g, 64), lambda i, j: (i, j, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, g, g, 64), compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((16, 16, wl), compute_dtype),        # x row band
            pltpu.VMEM((r_tile + 1, g + 1, 128), compute_dtype),  # Y (the win)
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, k0, b0, k1, b1)


def apply_graph_folded_front(
    folded_s2d: dict,
    x: jnp.ndarray,
    ops: list[tuple],
    *,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Folded inference with the fused Pallas front; continues the stock
    interpreter from the third op (graph must open conv_0, conv_1)."""
    from face_vijnana_yolov3_tpu.models import darknet

    assert ops[0][:2] == ("conv", 0) and ops[1][:2] == ("conv", 1)
    h = fused_front(
        x, folded_s2d, compute_dtype=compute_dtype, interpret=interpret
    )
    return darknet.apply_graph_folded(
        folded_s2d, h, ops[2:], compute_dtype=compute_dtype
    )
