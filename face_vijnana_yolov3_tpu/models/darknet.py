"""Darknet-53 / YOLOv3 as a declarative graph IR over pure JAX functions.

The reference builds the 106-layer YOLOv3 as a Keras functional graph
(make_yolov3_model, reference src/space/yolov3_detect.py:196-311) and separately
re-builds the truncated trunk layer-by-layer (FaceDetector.YOLOV3Base,
src/space/face_detection.py:384-600). Here both are *generated* from one small IR:
a list of ops (conv / residual / route / upsample / mark), interpreted by

  * `init_graph_params`   — shape-correct zero/random param+state pytrees,
  * `apply_graph`         — training/inference forward with live BatchNorm,
  * `fold_graph_params`   — conv+BN folding for the inference fast path,
  * `apply_graph_folded`  — bf16 MXU-friendly folded forward.

Conv convention: NHWC activations, HWIO kernels, symmetric pad 1 for every 3x3 conv
(the reference applies ZeroPadding2D(1) to all k>1 convs regardless of stride —
yolov3_detect.py:205 — which matches darknet's own symmetric pad=1, so pretrained
weights align). BatchNorm epsilon 1e-3, LeakyReLU alpha 0.1.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3
LEAKY_ALPHA = 0.1
BN_MOMENTUM = 0.99  # Keras 2.2.4 BatchNormalization default


# ------------------------------------------------------------------ graph IR

def _conv(idx, out_c, k=3, stride=1, bn=True, leaky=True):
    return ("conv", idx, out_c, k, stride, bn, leaky)


def _residual_stage(first_idx, n_blocks, c_half, c_full, ops):
    """One darknet residual stage: n_blocks of [1x1 c_half, 3x3 c_full] + add.

    Matches the reference's skip bookkeeping (skip reassigned after each add —
    face_detection.py:481-482 vs :445 for the first stage where it is not; the
    arithmetic is identical because stage 1 has a single block).
    """
    idx = first_idx
    for _ in range(n_blocks):
        ops.append(("save", "skip"))
        ops.append(_conv(idx, c_half, k=1))
        ops.append(_conv(idx + 1, c_full, k=3))
        ops.append(("add", "skip"))
        idx += 3
    return idx


def trunk_graph() -> list[tuple]:
    """Darknet-53 trunk conv_0..conv_73 → 13x13x1024 (the reference's YOLOV3Base)."""
    ops: list[tuple] = []
    ops.append(_conv(0, 32, k=3, stride=1))
    ops.append(_conv(1, 64, k=3, stride=2))
    _residual_stage(2, 1, 32, 64, ops)
    ops.append(_conv(5, 128, k=3, stride=2))
    _residual_stage(6, 2, 64, 128, ops)
    ops.append(_conv(12, 256, k=3, stride=2))
    _residual_stage(13, 8, 128, 256, ops)
    ops.append(("mark", "skip_36"))
    ops.append(_conv(37, 512, k=3, stride=2))
    _residual_stage(38, 8, 256, 512, ops)
    ops.append(("mark", "skip_61"))
    ops.append(_conv(62, 1024, k=3, stride=2))
    _residual_stage(63, 4, 512, 1024, ops)
    ops.append(("output", "trunk"))
    return ops


def yolov3_graph() -> list[tuple]:
    """Full 3-head YOLOv3 (make_yolov3_model parity, yolov3_detect.py:217-311)."""
    ops = trunk_graph()
    ops = [op for op in ops if op[0] != "output"]
    # Layer 75-79.
    for idx, c, k in ((75, 512, 1), (76, 1024, 3), (77, 512, 1), (78, 1024, 3),
                      (79, 512, 1)):
        ops.append(_conv(idx, c, k=k))
    ops.append(("mark", "route_79"))
    # Head at stride 32.
    ops.append(_conv(80, 1024, k=3))
    ops.append(_conv(81, 255, k=1, bn=False, leaky=False))
    ops.append(("output", "yolo_82"))
    # Stride-16 branch.
    ops.append(("restore", "route_79"))
    ops.append(_conv(84, 256, k=1))
    ops.append(("upsample",))
    ops.append(("concat", "skip_61"))
    for idx, c, k in ((87, 256, 1), (88, 512, 3), (89, 256, 1), (90, 512, 3),
                      (91, 256, 1)):
        ops.append(_conv(idx, c, k=k))
    ops.append(("mark", "route_91"))
    ops.append(_conv(92, 512, k=3))
    ops.append(_conv(93, 255, k=1, bn=False, leaky=False))
    ops.append(("output", "yolo_94"))
    # Stride-8 branch.
    ops.append(("restore", "route_91"))
    ops.append(_conv(96, 128, k=1))
    ops.append(("upsample",))
    ops.append(("concat", "skip_36"))
    for idx, c, k in ((99, 128, 1), (100, 256, 3), (101, 128, 1), (102, 256, 3),
                      (103, 128, 1), (104, 256, 3)):
        ops.append(_conv(idx, c, k=k))
    ops.append(_conv(105, 255, k=1, bn=False, leaky=False))
    ops.append(("output", "yolo_106"))
    return ops


def conv_layout(ops: list[tuple]) -> list[tuple[int, int, int, int, int, bool]]:
    """Enumerate convs as (idx, in_c, out_c, k, stride, bnorm) by walking the IR.

    The channel walk is what lets the darknet weight importer read the binary
    sequentially without a Keras model in the loop.
    """
    layout = []
    c = 3
    saved: dict[str, int] = {}
    for op in ops:
        kind = op[0]
        if kind == "conv":
            _, idx, out_c, k, stride, bn, _ = op
            layout.append((idx, c, out_c, k, stride, bn))
            c = out_c
        elif kind in ("save", "mark"):
            saved[op[1]] = c
        elif kind == "restore":
            c = saved[op[1]]
        elif kind == "concat":
            c = c + saved[op[1]]
        # add/upsample/output leave channels unchanged
    return layout


# ------------------------------------------------------------------ params

def init_graph_params(ops: list[tuple], rng: jax.Array | None = None):
    """Build (params, state) pytrees for a graph.

    params[f"conv_{i}"] = {"kernel": (k,k,in,out)[, "bias": (out,)]}
    params[f"bnorm_{i}"] = {"gamma": (out,), "beta": (out,)}      (trainable)
    state[f"bnorm_{i}"]  = {"mean": (out,), "var": (out,)}        (moving stats)
    """
    params: dict[str, Any] = {}
    state: dict[str, Any] = {}
    # Host-side numpy init: building ~150 param arrays as eager device ops costs
    # minutes over a tunneled TPU (each tiny op compiles its own executable);
    # numpy arrays transfer lazily on first real use instead.
    np_rng = None
    if rng is not None:
        seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1]) & 0x7FFFFFFF
        np_rng = np.random.default_rng(seed)
    # Residual-ending convs (the conv immediately before each "add"): their BN
    # gamma initializes to 0 so every residual branch starts as identity —
    # without this, ~20 stacked adds blow random-init activations up by 2^20
    # and the fresh-training path is numerically dead on arrival. Pretrained
    # loads overwrite gamma, so darknet parity is unaffected.
    residual_end: set[int] = set()
    prev_conv_idx = None
    for op in ops:
        if op[0] == "conv":
            prev_conv_idx = op[1]
        elif op[0] == "add" and prev_conv_idx is not None:
            residual_end.add(prev_conv_idx)
    for idx, in_c, out_c, k, _stride, bn in conv_layout(ops):
        shape = (k, k, in_c, out_c)
        if np_rng is None:
            kernel = np.zeros(shape, np.float32)
        else:
            # He-uniform-ish fan-in init (Keras Conv2D default is glorot_uniform;
            # close enough for fresh heads — pretrained paths overwrite anyway).
            fan_in = k * k * in_c
            limit = float(np.sqrt(6.0 / fan_in))
            kernel = np_rng.uniform(-limit, limit, shape).astype(np.float32)
        entry = {"kernel": kernel}
        if not bn:
            entry["bias"] = np.zeros((out_c,), np.float32)
        params[f"conv_{idx}"] = entry
        if bn:
            gamma_init = 0.0 if (rng is not None and idx in residual_end) else 1.0
            params[f"bnorm_{idx}"] = {
                "gamma": np.full((out_c,), gamma_init, np.float32),
                "beta": np.zeros((out_c,), np.float32),
            }
            state[f"bnorm_{idx}"] = {
                "mean": np.zeros((out_c,), np.float32),
                "var": np.ones((out_c,), np.float32),
            }
    return params, state


# ------------------------------------------------------------------ train BN

@jax.custom_vjp
def _bn_train_norm(h, gamma, beta):
    """Batch-norm with batch statistics, hand-fused backward.

    Returns (y_f32, mean, var). Forward is the one-pass E[x²]−E[x]² form
    (see apply_graph train path). The custom backward was an attempt at the
    25%-of-step BN gradient reductions (PROFILE.md): both reductions are
    written as siblings of dy so multi-output reduction fusion reads dy/x̂
    once, and dx is one more elementwise pass:

        dβ = Σdy,  dγ = Σdy·x̂,  dx = (γ·inv/N)·(N·dy − Σdy − x̂·Σdy·x̂)

    MEASURED NEGATIVE RESULT (round 2): 676-679 img/s b128 on the chip vs
    684-691 for plain autodiff of the same forward — XLA already emits the
    fused two-sibling backward from autodiff, and the custom-vjp boundary
    costs a little fusion freedom around the residual saves. Kept opt-in
    (`apply_graph(bn_custom_vjp=True)`), verified gradient-identical to
    autodiff in tests/test_models.py::test_bn_custom_vjp_matches_autodiff.

    The mean/var outputs feed the moving-average state only; their cotangents
    are dropped in the backward (equivalent to stop_gradient on the moving
    stats, which is also what Keras BN does — reference BN never
    backpropagates through running statistics).
    """
    y, _res = _bn_train_norm_fwd(h, gamma, beta)
    return y


def _bn_train_norm_fwd(h, gamma, beta):
    hf = h.astype(jnp.float32)
    mean = jnp.mean(hf, axis=(0, 1, 2))
    var = jnp.maximum(jnp.mean(hf * hf, axis=(0, 1, 2)) - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (hf - mean) * (inv * gamma) + beta
    # Save h in its storage dtype (bf16 on the mixed path — half the residual
    # HBM of saving the f32 upcast) + the per-channel stats to rebuild x̂.
    return (y, mean, var), (h, mean, inv, gamma)


def _bn_train_norm_bwd(res, cts):
    dy, _dmean, _dvar = cts  # moving-stat cotangents dropped (see docstring)
    h, mean, inv, gamma = res
    dy = dy.astype(jnp.float32)
    xhat = (h.astype(jnp.float32) - mean) * inv
    sum_dy = jnp.sum(dy, axis=(0, 1, 2))
    sum_dy_xhat = jnp.sum(dy * xhat, axis=(0, 1, 2))
    n = dy.size // dy.shape[-1]
    dx = (gamma * inv / n) * (n * dy - sum_dy - xhat * sum_dy_xhat)
    return dx.astype(h.dtype), sum_dy_xhat, sum_dy


_bn_train_norm.defvjp(_bn_train_norm_fwd, _bn_train_norm_bwd)


# ------------------------------------------------------------------ QAT fake-quant

def _act_fq(h):
    """Per-channel int8 activation fake-quant with a straight-through gradient.

    Training-time twin of the serving requant (quant._quant): scale =
    per-channel batch maxabs/127 (stop-gradient — the online analog of the
    maxabs-family calibration quantize_folded deploys), value = s*round(h/s)
    clipped to +-127. Returns (fake-quantized f32 value, (C,) scale).
    """
    hf = h.astype(jnp.float32)
    s = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(hf), axis=tuple(range(hf.ndim - 1))),
                    1e-6) / 127.0
    )
    q = jnp.clip(jnp.round(hf / s), -127.0, 127.0) * s
    return hf + jax.lax.stop_gradient(q - hf), s


def _weight_fq(kernel, s_in):
    """Per-out-channel int8 weight fake-quant matching quantize_folded.

    Serving quantizes the FOLDED kernel k*bn_scale[out]*s_in[in] at
    per-out-channel maxabs/127 (quant.quantize_folded). Per-OUT-channel
    scaling commutes with per-out-channel symmetric quantization (the scale
    absorbs |bn_scale| exactly, round is odd-symmetric), so fake-quantizing
    the UNfolded kernel with only the input scales folded produces the same
    relative error pattern the deployed int8 kernel has — the live-BN
    training forward sees serving's weight noise without folding BN.
    STE gradient; s_in of None (input position never requantized) degrades
    to plain per-out-channel quantization.
    """
    k = kernel.astype(jnp.float32)
    k_eff = k * s_in[None, None, :, None] if s_in is not None else k
    w_scale = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(k_eff), axis=(0, 1, 2)), 1e-8) / 127.0
    )
    q = jnp.clip(jnp.round(k_eff / w_scale), -127.0, 127.0) * w_scale
    k_fq = k_eff + jax.lax.stop_gradient(q - k_eff)
    return k_fq / s_in[None, None, :, None] if s_in is not None else k_fq


def fakequant_skip_ops(ops: list[tuple]) -> set[int]:
    """Op indices whose activation requant is deferred (fused-residual rule).

    Mirrors quant.apply_graph_quant(fuse_residual=True) / qat.
    apply_graph_fakequant: a conv immediately followed by an "add" skips its
    own requant — the skip adds in f32 and ONE requant lands after the add —
    so the training-time rounding count equals serving's.
    """
    return {
        i for i, op in enumerate(ops)
        if op[0] == "conv" and i + 1 < len(ops) and ops[i + 1][0] == "add"
    }


# ------------------------------------------------------------------ forward

def _conv2d(x, kernel, stride, k, compute_dtype, precision_override=None):
    if k > 1:
        pad = ((1, 1), (1, 1))
    else:
        pad = ((0, 0), (0, 0))
    # In f32 request HIGHEST precision: on TPU the default lowers f32 convs to
    # bf16 MXU passes (~1e-2 error), which would break parity paths. The bf16
    # path keeps the default single-pass MXU lowering and a bf16 output —
    # requesting an f32 preferred_element_type there breaks the conv transpose
    # (autodiff) with mixed-dtype operands; MXU accumulation is f32 regardless.
    # precision_override: the serving f32-front guard uses HIGH (bf16x3,
    # operand error ~2^-21) — half the MXU passes of HIGHEST for the same
    # input-noise protection the guard needs.
    if compute_dtype == jnp.float32:
        precision = precision_override or jax.lax.Precision.HIGHEST
        preferred = jnp.float32
    else:
        precision = jax.lax.Precision.DEFAULT
        preferred = None
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        kernel.astype(compute_dtype),
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
        precision=precision,
    )


def remat_segments(ops: list[tuple]) -> list[list[tuple]]:
    """Split a linear (trunk-like) graph into remat segments at residual adds.

    Each segment is closed over its own skip bookkeeping, so only the segment
    boundary activation is saved for the backward pass — jax.checkpoint
    recomputes the inside. Residual boundaries are the natural cut: after an
    "add" nothing from inside the block is live. Graphs with cross-segment
    routes (restore/concat — the full YOLOv3 head) are not segmentable.
    """
    if any(op[0] in ("restore", "concat") for op in ops):
        raise ValueError("remat segmentation requires a linear trunk graph")
    segments: list[list[tuple]] = [[]]
    for op in ops:
        segments[-1].append(op)
        if op[0] == "add":
            segments.append([])
    if not segments[-1]:
        segments.pop()
    return segments


def apply_graph(
    params,
    state,
    x,
    ops: list[tuple],
    *,
    train: bool = False,
    compute_dtype=jnp.float32,
    remat: bool | int = False,
    bn_momentum: float | None = None,
    bn_custom_vjp: bool = False,
    fakequant: bool = False,
):
    """Interpret the graph. Returns (outputs, new_state).

    outputs is a dict name→tensor for each ("output", name) op. With train=True,
    BatchNorm normalizes by batch statistics and new_state carries the updated
    moving averages (Keras momentum-0.99 rule); with train=False the moving stats
    are used and new_state is state unchanged.

    fakequant=True runs quantization-aware training: int8 fake-quant (STE)
    of every activation at the serving requant positions (input, post-
    conv/BN/leaky, post-add/concat, fused-residual rule — fakequant_skip_ops)
    and of every conv kernel with the input scales folded (_weight_fq), so
    the training forward carries exactly the noise structure the deployed
    int8 program has (modulo batch-vs-moving BN statistics). Motivation:
    post-training int8 on this architecture accumulates requant error
    through the trunk on brittle checkpoints (PROFILE.md round-4 tables —
    calibration grids, bf16 islands, and post-hoc distillation all measured
    insufficient); training against the noise is the remaining lever. No
    reference counterpart (the reference serves f32 Keras predict,
    src/space/face_detection.py:899).

    remat=True wraps each residual-block segment in jax.checkpoint: backward-pass
    memory drops from O(all activations) to O(segment boundaries), recomputing
    block interiors — the standard TPU HBM/FLOPs trade for big-batch training
    (notably the identifier's 3x-stacked triplet batches). An int N
    checkpoints only the FIRST N segments: the early stride-1..8 segments
    hold the big (416²..52²) activations where saving is expensive, while the
    late 26²/13² activations are cheap to keep — skipping their recompute
    buys back forward FLOPs at little HBM cost (measured sweep in PROFILE.md
    identifier-training section).
    """
    if remat:
        outputs: dict[str, jnp.ndarray] = {}
        new_state = dict(state)
        h = x

        def make_seg(seg_ops, use_ckpt):
            def seg_fn(h, params, state):
                # fakequant crosses segment boundaries cleanly: the segment
                # input is already on the int8 grid of its true scale s, so
                # the sub-call's input fake-quant recomputes s (maxabs of
                # the quantized value = 127*s) and re-rounding is idempotent
                # in f32 (on a bf16 compute path the inter-segment cast adds
                # one bf16 rounding — noise well under the int8 grid step).
                outs, st = apply_graph(
                    params, state, h, seg_ops + [("output", "__h")],
                    train=train, compute_dtype=compute_dtype, remat=False,
                    bn_momentum=bn_momentum, bn_custom_vjp=bn_custom_vjp,
                    fakequant=fakequant,
                )
                return outs["__h"].astype(compute_dtype), st

            return jax.checkpoint(seg_fn) if use_ckpt else seg_fn

        segs = remat_segments(ops)
        n_ckpt = len(segs) if remat is True else int(remat)
        for i, seg_ops in enumerate(segs):
            core = [op for op in seg_ops if op[0] != "output"]
            h, st = make_seg(core, i < n_ckpt)(h, params, state)
            # Each segment's returned state contains ALL bnorm keys (the ones
            # outside the segment are stale pass-throughs of the input state);
            # merge only the keys this segment actually updated, or later
            # segments would overwrite earlier segments' moving-stat updates.
            seg_bn = {
                f"bnorm_{op[1]}" for op in core if op[0] == "conv" and op[5]
            }
            new_state.update({k: st[k] for k in st if k in seg_bn})
            for op in seg_ops:
                if op[0] == "output":
                    outputs[op[1]] = h.astype(jnp.float32)
        return outputs, new_state

    saved: dict[str, jnp.ndarray] = {}
    saved_scale: dict[str, jnp.ndarray | None] = {}
    outputs: dict[str, jnp.ndarray] = {}
    new_state = dict(state)
    h = x
    fq_scale = None
    fq_skip = fakequant_skip_ops(ops) if fakequant else set()
    if fakequant:
        h, fq_scale = _act_fq(h)
    for i, op in enumerate(ops):
        kind = op[0]
        if kind == "conv":
            _, idx, _out_c, k, stride, bn, leaky = op
            p = params[f"conv_{idx}"]
            kernel = (_weight_fq(p["kernel"], fq_scale) if fakequant
                      else p["kernel"])
            h = _conv2d(h, kernel, stride, k, compute_dtype)
            if bn:
                bp = params[f"bnorm_{idx}"]
                bs = state[f"bnorm_{idx}"]
                if train:
                    # One-pass batch stats, var = E[x²]−E[x]² (the fused
                    # batch-norm formulation TF itself lowers to). Both
                    # reductions depend only on h, so XLA's sibling
                    # multi-output reduction fusion reads the activation once;
                    # the sequential mean→jnp.var form forces a SECOND full
                    # HBM pass per layer (BN reductions were 21% of the b128
                    # train step, PROFILE.md). Stats accumulate in f32 even on
                    # the bf16 path. bn_custom_vjp swaps in the hand-fused
                    # backward (_bn_train_norm above) — measured 676 vs 691
                    # img/s b128 on the chip, a ~2% LOSS vs XLA's autodiff
                    # (PROFILE.md), so autodiff is the default; the custom
                    # path stays as the tested fallback/diagnostic.
                    if bn_custom_vjp:
                        h, mean, var = _bn_train_norm(
                            h, bp["gamma"], bp["beta"]
                        )
                    else:
                        hf = h.astype(jnp.float32)
                        mean = jnp.mean(hf, axis=(0, 1, 2))
                        var = jnp.maximum(
                            jnp.mean(hf * hf, axis=(0, 1, 2)) - mean * mean,
                            0.0,
                        )
                        inv = jax.lax.rsqrt(var + BN_EPS)
                        h = (hf - mean) * (inv * bp["gamma"]) + bp["beta"]
                    mom = BN_MOMENTUM if bn_momentum is None else bn_momentum
                    new_state[f"bnorm_{idx}"] = {
                        "mean": bs["mean"] * mom + mean * (1 - mom),
                        "var": bs["var"] * mom + var * (1 - mom),
                    }
                else:
                    mean, var = bs["mean"], bs["var"]
                    inv = jax.lax.rsqrt(var + BN_EPS)
                    h = (h - mean) * (inv * bp["gamma"]) + bp["beta"]
            else:
                h = h + p["bias"]
            if leaky:
                h = jnp.where(h > 0, h, LEAKY_ALPHA * h)
            if fakequant and i not in fq_skip:
                h, fq_scale = _act_fq(h)
            h = h.astype(compute_dtype)
        elif kind in ("save", "mark"):
            saved[op[1]] = h
            saved_scale[op[1]] = fq_scale
        elif kind == "add":
            h = saved[op[1]] + h
            if fakequant:
                h, fq_scale = _act_fq(h)
                h = h.astype(compute_dtype)
        elif kind == "restore":
            h = saved[op[1]]
            fq_scale = saved_scale.get(op[1])
        elif kind == "concat":
            h = jnp.concatenate([h, saved[op[1]]], axis=-1)
            if fakequant:
                h, fq_scale = _act_fq(h)
                h = h.astype(compute_dtype)
        elif kind == "upsample":
            b, hh, ww, c = h.shape
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
        elif kind == "output":
            outputs[op[1]] = h.astype(jnp.float32)
        else:
            raise ValueError(f"unknown op {op}")
    return outputs, new_state


# ------------------------------------------------------------------ folded fast path

def fold_graph_params(params, state, ops: list[tuple]):
    """Fold BatchNorm into conv kernels/biases for inference.

    w' = w * gamma/sqrt(var+eps) (per out-channel), b' = beta - mean*gamma/sqrt(..).
    Numerically identical to conv→BN at inference up to float reassociation.
    """
    folded = {}
    for idx, _in_c, _out_c, k, stride, bn in conv_layout(ops):
        p = params[f"conv_{idx}"]
        if bn:
            bp = params[f"bnorm_{idx}"]
            bs = state[f"bnorm_{idx}"]
            scale = bp["gamma"] / jnp.sqrt(bs["var"] + BN_EPS)
            folded[f"conv_{idx}"] = {
                "kernel": p["kernel"] * scale[None, None, None, :],
                "bias": bp["beta"] - bs["mean"] * scale,
            }
        else:
            folded[f"conv_{idx}"] = {"kernel": p["kernel"], "bias": p["bias"]}
    return folded


def front_end_index(ops: list[tuple], n_blocks: int) -> int:
    """Op index where reduced precision may begin when the FIRST `n_blocks`
    graph segments run f32.

    Segment 1 = the pre-residual front pair (conv_0/conv_1 — everything
    before the first ("save", ...) block opener); each further segment adds
    one residual block. Counterpart of quant.tail_start_index: boundaries sit
    at block openers so no skip bookkeeping crosses them.
    """
    starts = [i for i, op in enumerate(ops) if op[0] == "save"]
    if n_blocks <= 0 or n_blocks > len(starts):
        raise ValueError(f"n_blocks must be in 1..{len(starts)}")
    return starts[n_blocks - 1]


def apply_graph_folded(
    folded_params, x, ops: list[tuple], *, compute_dtype=jnp.bfloat16,
    f32_front_ops: int = 0,
):
    """Inference forward with conv+BN folded; bf16 inputs/weights, f32 accumulation.

    This is the bench/serving path: every conv is a single MXU op with a fused
    bias + leaky epilogue, no BN normalization traffic.

    f32_front_ops: run ops[:N] in strict f32 regardless of compute_dtype.
    Trained checkpoints are input-noise-sensitive in the FIRST two convs on
    specific images: on the bench 400-epoch checkpoint a full-bf16 trunk
    amplifies head logits 2-4x on ~3/160 val images (degenerate ~1.0-score
    boxes, AP50 0.79→0.45) while f32 through the first residual block
    restores head MAE to noise level (scripts/probe_bf16_degen.py,
    scripts/probe_bf16_bisect.py: bf16 conv_0/1 alone = 30 threshold flips,
    f32 front t=7 = 2 flips). Cost is small — the front pair is ~13% of
    serving time and bandwidth-bound.
    """
    saved: dict[str, jnp.ndarray] = {}
    outputs: dict[str, jnp.ndarray] = {}
    h = x
    for i, op in enumerate(ops):
        kind = op[0]
        in_front = i < f32_front_ops
        op_dtype = jnp.float32 if in_front else compute_dtype
        if kind == "conv":
            _, idx, _out_c, k, stride, _bn, leaky = op
            p = folded_params[f"conv_{idx}"]
            h = _conv2d(
                h, p["kernel"], stride, k, op_dtype,
                # Guard convs only need operand-rounding protection, not
                # bit-f32: HIGH = bf16x3 halves the pass count vs HIGHEST.
                precision_override=(
                    jax.lax.Precision.HIGH if in_front else None
                ),
            )
            h = h + p["bias"]
            if leaky:
                h = jnp.where(h > 0, h, LEAKY_ALPHA * h)
            h = h.astype(op_dtype)
        elif kind in ("save", "mark"):
            saved[op[1]] = h
        elif kind == "add":
            h = saved[op[1]] + h
        elif kind == "restore":
            h = saved[op[1]]
        elif kind == "concat":
            h = jnp.concatenate([h, saved[op[1]]], axis=-1)
        elif kind == "upsample":
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
        elif kind == "output":
            outputs[op[1]] = h.astype(jnp.float32)
    return outputs
