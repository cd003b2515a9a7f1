"""Pallas kernel: fused int8 Darknet residual block (1x1 -> 3x3 -> add).

Every Darknet residual block in the int8 serving path
(models/quant.apply_graph_quant) runs as two XLA int8 convs with fused
epilogues; the 1x1's output still makes an HBM round trip, and XLA's TPU conv
emitter runs the pair at ~50% of int8 MXU peak (PROFILE.md). This kernel
computes the WHOLE block per grid step with the intermediate resident in
VMEM:

    x_q  --1x1 matmul-->  int32 --epilogue/requant--> y1_q (VMEM only)
    y1_q --9 shifted tap matmuls (the 3x3)--> int32
         --epilogue + skip-add(x_q) + requant--> out_q

Layout is the natural one for Mosaic — channels in LANES (128-multiples:
stage 3/4/5 blocks qualify, 20 of the trunk's 23), flattened H*W spatial in
SUBLANES — so each 3x3 tap is a single [HW, Ch] x [Ch, C] int8 MXU matmul
with the spatial shift expressed as a sublane roll + border mask. This is
exactly the formulation the failed front-pair kernel could not reach
(ops/pallas_front.py: 3/32-channel convs force channels into sublanes and
per-row tap matmuls); with 128..1024 channels the block shapes are
MXU-native.

Numerics are BIT-EXACT vs the stock fused path: identical int32 accumulation
and the same f32 epilogue ops in the same order (dequant * w_scale + bias,
leaky, skip dequant-add, round-half-even, clip) — asserted by
tests/test_pallas_block.py on every eligible trunk shape.

STATUS — measured NEGATIVE result on a real v5e, in BOTH formulations;
kept off by default (FdConf.int8_pallas_blocks). scripts/probe_pallas_block.py
(4 chained blocks, scan-chained timing, bit-exact at every stage; round-5
re-measurement with the roll mode):

    stage3 52^2x256  b128  xla  5.75 ms  concat 10.40 ms  roll 11.31 ms
    stage3 52^2x256  b512  xla 18.34 ms  concat 36.85 ms  roll 40.43 ms
    stage4 26^2x512  b128  xla  4.35 ms  concat  6.96 ms  roll  6.47 ms
    stage4 26^2x512  b512  xla 14.22 ms  concat 21.26 ms  roll 22.62 ms
    stage5 13^2x1024 b128  xla  3.97 ms  concat  5.19 ms  roll  5.24 ms
    stage5 13^2x1024 b512  xla 11.67 ms  concat 17.48 ms  roll 17.75 ms

Why XLA wins: at stage5 b512 the stock int8 program sustains ~289 TOPS
(~73% of v5e int8 MXU peak) — the conv emitter is much closer to peak on
these lane-aligned shapes than the ~50% whole-trunk average in PROFILE.md
suggested (that average is dragged down by the front). The fused kernel's
VMEM-residency saving (skipping one hw*Ch int8 HBM round trip per block)
is small against that, and the per-tap data movement is pure VPU overhead
the stock conv path doesn't pay, worst at stage3 where hw=2704 dominates.
The round-2 postmortem hypothesized a zero-operand-movement formulation
would close the gap; round 5 BUILT it (roll mode: all 9 taps share one
unshifted lhs, the shift becomes a pltpu.roll of the int32 tap product)
and it is NOT faster — rotating the 4-byte int32 product moves 4x the
bytes the int8 operand shift did, a wash at best (stage4 b128) and worse
where hw is large. The inquiry is CLOSED: int8 residual blocks are
MXU-emitter-bound under XLA; a winning kernel would need true strided tap
access with no materialized shift/rotate at all, which Mosaic does not
express today. (Roll mode also needs the raised serving scoped-VMEM
budget — the int32 tap product overflows the 16M default at stage3 b128.)

Reference context: the residual stages come from make_yolov3_model
(reference src/space/yolov3_detect.py:217-311); the int8 scheme quantizing
them is this repo's own (no reference counterpart).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from face_vijnana_yolov3_tpu.models.darknet import LEAKY_ALPHA

# 3x3 taps in kernel order: tap t = (ky, kx), offset (dy, dx) = (ky-1, kx-1).
_TAPS = tuple((ky - 1, kx - 1) for ky in range(3) for kx in range(3))


def block_eligible(in_c: int, mid_c: int) -> bool:
    """Lane-dim constraint: both channel counts must be 128-multiples.

    Stage 1 (64/32) and stage 2 (128/64) blocks fail it — their mid channels
    would waste >=50% of every lane register; XLA keeps those (they are ~3%
    of trunk time). Stages 3/4/5 (256/128, 512/256, 1024/512) qualify.
    """
    return in_c % 128 == 0 and mid_c % 128 == 0


def _block_kernel(x_ref, w1_ref, w2_ref, ws1_ref, b1_ref, ism_ref,
                  ws2_ref, b2_ref, ss_ref, iso_ref, out_ref, *,
                  height: int, width: int, shift_mode: str = "concat"):
    hw = height * width
    x = x_ref[0]  # [HW, C] int8

    # ---- 1x1 conv: one matmul, epilogue, requant to the mid scales.
    acc1 = jax.lax.dot_general(
        x, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h1 = acc1.astype(jnp.float32) * ws1_ref[0] + b1_ref[0]
    h1 = jnp.where(h1 > 0, h1, LEAKY_ALPHA * h1)
    y1 = jnp.clip(jnp.round(h1 * ism_ref[0]), -127, 127).astype(jnp.int8)

    # ---- 3x3 conv as 9 tap matmuls over the VMEM-resident y1.
    row = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    r_h = row // width
    r_w = row % width
    acc = jnp.zeros((hw, x_ref.shape[-1]), jnp.int32)
    for t, (dy, dx) in enumerate(_TAPS):
        off = dy * width + dx
        valid = (
            (r_h + dy >= 0) & (r_h + dy < height)
            & (r_w + dx >= 0) & (r_w + dx < width)
        )
        if shift_mode == "roll":
            # Shift the ACCUMULATOR, not the operand: out[r] += y1[r+off]@K_t
            # is out[r] += Z_t[r+off] with Z_t = y1@K_t computed UNSHIFTED —
            # zero data movement feeds the MXU (all 9 taps share one lhs),
            # and the shift becomes a sublane rotate of the int32 tap
            # product, which Mosaic supports (the int8 operand rotate it
            # refuses is never needed). Wrapped rows land on destinations
            # the border mask zeroes.
            z = jax.lax.dot_general(
                y1, w2_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            if off:
                # roll requires a non-negative shift; -off mod hw is the
                # same circular rotation
                z = pltpu.roll(z, (-off) % hw, axis=0)
            acc = acc + jnp.where(valid, z, 0)
        else:
            # shifted[r] = y1[r + off] as a static slice + zero-fill concat
            # on the sublane dim (Mosaic has no int8 sublane rotate: "Rotate
            # with non-32-bit data"); the border mask re-zeros these rows.
            if off > 0:
                shifted = jnp.concatenate(
                    [y1[off:], jnp.zeros((off, y1.shape[1]), jnp.int8)],
                    axis=0)
            elif off < 0:
                shifted = jnp.concatenate(
                    [jnp.zeros((-off, y1.shape[1]), jnp.int8), y1[:off]],
                    axis=0)
            else:
                shifted = y1
            shifted = jnp.where(valid, shifted, jnp.int8(0))
            acc = acc + jax.lax.dot_general(
                shifted, w2_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

    # ---- epilogue: dequant, leaky, fused skip-add, single requant.
    hf = acc.astype(jnp.float32) * ws2_ref[0] + b2_ref[0]
    hf = jnp.where(hf > 0, hf, LEAKY_ALPHA * hf)
    hf = hf + x.astype(jnp.float32) * ss_ref[0]
    out_ref[0] = jnp.clip(jnp.round(hf * iso_ref[0]), -127, 127).astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "interpret", "shift_mode"),
)
def fused_block_int8(x_q, w1_q, w2_q, ws1, b1, inv_s_mid, ws2, b2,
                     skip_s, inv_s_out, *, height: int, width: int,
                     interpret: bool = False, shift_mode: str = "concat"):
    """One int8 residual block, fused. x_q: [B, H, W, C] int8.

    w1_q: [C, Ch] int8 (1x1 kernel, input scales pre-folded as in
    quantize_folded); w2_q: [9, Ch, C] int8 (3x3 kernel, HWIO taps unrolled);
    the six f32 vectors are the two epilogues' scales/biases and the block's
    skip/output scales ((Ch,) or (C,)).
    Returns [B, H, W, C] int8 at the post-add activation scales — bit-exact
    vs the stock apply_graph_quant fused-residual path.

    shift_mode: "concat" (round-2 kernel: shift the int8 operand by slice+
    concat copies) or "roll" (round-5: unshifted tap matmuls, then rotate
    the int32 product with the sublane roll Mosaic does support — the
    zero-per-tap-data-movement formulation the round-2 postmortem called
    for). Both are bit-exact vs the stock path (int32 adds commute).
    """
    b, h, w, c = x_q.shape
    ch = w1_q.shape[1]
    hw = h * w
    x_flat = x_q.reshape(b, hw, c)
    vec = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)
    kernel = functools.partial(_block_kernel, height=h, width=w,
                               shift_mode=shift_mode)
    flops = 2 * b * hw * (c * ch + 9 * ch * c)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hw, c), jnp.int8),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, ch), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, ch, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * b * hw * c, transcendentals=0
        ),
        interpret=interpret,
    )(
        x_flat, w1_q, w2_q.reshape(9, ch, c), vec(ws1), vec(b1),
        vec(inv_s_mid), vec(ws2), vec(b2), vec(skip_s), vec(inv_s_out),
    )
    return out.reshape(b, h, w, c)
