"""Distillation QAT: close the int8 PTQ accuracy gap at FULL int8 speed.

TPU-native serving optimization with no reference counterpart (the reference
serves f32 Keras predict, src/space/face_detection.py:899). Post-training
int8 at 99.99-percentile calibration leaves a residual mAP gap on trained
checkpoints (−0.012 vs f32 on the bench checkpoint; the mixed bf16-tail
closes it but costs ~4-9% throughput — PROFILE.md tail table). This module
removes the gap without the tail: a short label-free fine-tune of the FOLDED
conv kernels/biases so that the fake-quantized forward reproduces the f32
teacher's head outputs on a handful of calibration images.

Why distillation instead of task-loss QAT: at serving-setup time there are
images but no labels, and the objective that actually matters is
"int8 outputs == f32 outputs" — matching the teacher is the direct form of
that, and AP parity follows by construction.

The fake-quant forward mirrors models/quant.apply_graph_quant's serving
arithmetic exactly (same per-channel activation scales, same per-out-channel
weight scales with the input scale statically folded, same fused-residual
single-requant-after-add semantics), expressed in f32 with straight-through
estimators through the rounds. On graphs whose int32 accumulations stay under
2^24 the two agree BIT-EXACTLY (tests/test_qat.py); on the full 1024-channel
trunk they differ only by f32-accumulation rounding of integer-valued
products.

Activation scales stay frozen during the fine-tune (they are baked into the
serving program); weight scales are recomputed from the current kernel each
step — exactly what quantize_folded will compute from the refined kernels, so
the deployed program IS the trained program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from face_vijnana_yolov3_tpu.models.darknet import LEAKY_ALPHA, _conv2d


def _ste_round_clip(z):
    """round+clip to [-127,127] with a straight-through gradient."""
    r = jnp.clip(jnp.round(z), -127.0, 127.0)
    return z + jax.lax.stop_gradient(r - z)


def _fq_act(h, scale):
    """Per-channel activation fake-quant with the serving requant's exact
    arithmetic (quant._quant: h * (1/s) — NOT h/s, they differ in f32 — then
    round, clip), dequantized by * s. STE gradient. scale is a fixed (C,)
    calibration vector; the value returned is exactly s * int8 for the same
    int8 the serving path stores between convs.
    """
    # mirror quant._quant bit-for-bit: inv computed in the scale's native
    # (f64) precision THEN cast to f32; dequant multiplies by f32(scale)
    s = jnp.asarray(scale, jnp.float32)
    inv = jnp.asarray(1.0 / np.asarray(scale), jnp.float32)
    return _ste_round_clip(h * inv) * s


def _fq_conv(h_fq, kernel, bias, op, s_in, *, leaky):
    """One fake-quant conv replaying the int8 serving conv's exact arithmetic.

    Serving (quantize_folded + apply_graph_quant):
      k_eff = kernel * s_in (input scales folded), w_scale = maxabs/127 per
      out channel, kernel_q = round(clip(k_eff/w_scale));
      y = conv(x_q, kernel_q) * w_scale + bias,  x_q = round(h/s_in).
    Simulated in INTEGER space: both operands are recovered as exact
    integer-valued f32 tensors (round(h_fq * 1/s) re-yields the serving int8
    bit-for-bit), the contraction runs at Precision.HIGHEST, and the epilogue
    (* w_scale + bias, leaky) repeats the serving epilogue's f32 ops in the
    same order — so whenever the integer accumulation stays below 2^24 the
    result equals apply_graph_quant EXACTLY (tests/test_qat.py asserts it).
    w_scale is recomputed from the LIVE kernel each step (stop-gradient, the
    standard LSQ-free choice), so quantize_folded on the refined kernels
    deploys precisely the program that was trained.
    """
    _, _idx, _out_c, k, stride, _bn, _leaky = op
    # h_fq is s*int8 from the producing _fq_act; recovering the int is exact
    # (|q| <= 127, relative error of s*inv ~2^-22 < 0.5/127)
    inv_in = jnp.asarray(1.0 / np.asarray(s_in), jnp.float32)
    x_int = _ste_round_clip(h_fq * inv_in)
    # input-scale folding mirrors quantize_folded: scales cast f32 first
    s_in = jnp.asarray(np.asarray(s_in).astype(np.float32))
    k_eff = kernel * s_in[None, None, :, None]
    w_scale = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(k_eff), axis=(0, 1, 2)), 1e-8) / 127.0
    )
    k_int = _ste_round_clip(k_eff / w_scale)
    # DEFAULT precision = ONE bf16 MXU pass — and still EXACT here: both
    # operands are integer-valued in [-127,127], exactly representable in
    # bf16, and the MXU accumulates f32, so the contraction equals the
    # serving int32 accumulation wherever it stays below 2^24. HIGHEST would
    # compute the same integers at 6x the passes. (f32 operands keep autodiff
    # happy with preferred_element_type=f32 — the bf16-operand trap in
    # darknet._conv2d's docstring doesn't apply.)
    y = _conv2d(x_int, k_int, stride, k, jnp.float32,
                precision_override=jax.lax.Precision.DEFAULT
                ) * w_scale + bias
    if leaky:
        y = jnp.where(y > 0, y, LEAKY_ALPHA * y)
    return y


def apply_graph_fakequant(folded_params, x, ops: list[tuple], act_scales):
    """Differentiable twin of quant.apply_graph_quant(fuse_residual=True).

    folded_params: f32 folded conv kernels/biases (fold_graph_params output) —
    the TRAINABLE leaves. act_scales: frozen per-position per-channel scale
    vectors (quant.calibrate_folded). Returns the same outputs dict as
    apply_graph_quant (dequantized f32).

    Residual semantics mirror the fused serving path: a conv immediately
    followed by an "add" skips its own requant — the skip (already a
    fake-quant value) adds in f32 and ONE fake-quant lands at the post-add
    position's scale, so the simulated rounding count equals serving's.
    """
    saved: dict[str, jnp.ndarray] = {}
    outputs: dict[str, jnp.ndarray] = {}
    h = _fq_act(jnp.asarray(x, jnp.float32), act_scales[0])
    s = act_scales[0]
    skip_add = False
    for i, op in enumerate(ops):
        kind = op[0]
        s_out = act_scales[i + 1]
        if skip_add:  # consumed by the previous conv's fused epilogue
            skip_add = False
            continue
        if kind == "conv":
            p = folded_params[f"conv_{op[1]}"]
            y = _fq_conv(h, p["kernel"], p["bias"], op, s, leaky=op[6])
            if i + 1 < len(ops) and ops[i + 1][0] == "add":
                y = y + saved[ops[i + 1][1]][0]
                s_out = act_scales[i + 2]
                skip_add = True
            h, s = _fq_act(y, s_out), s_out
        elif kind in ("save", "mark"):
            saved[op[1]] = (h, s)
        elif kind == "add":
            h, s = _fq_act(saved[op[1]][0] + h, s_out), s_out
        elif kind == "restore":
            h, s = saved[op[1]]
        elif kind == "concat":
            h = jnp.concatenate([h, saved[op[1]][0]], axis=-1)
            h, s = _fq_act(h, s_out), s_out
        elif kind == "upsample":
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
        elif kind == "output":
            outputs[op[1]] = h
        else:
            raise ValueError(f"unknown op {op}")
    return outputs


def distill_folded(
    folded_params,
    images,
    ops: list[tuple],
    *,
    act_scales,
    head_fn=None,
    steps: int = 200,
    batch_size: int = 8,
    lr: float = 1e-5,
    seed: int = 0,
    log_every: int = 0,
    student_init=None,
    tail_blocks: int = 0,
):
    """Refine folded params so the fake-quant forward matches the f32 teacher.

    images: (N,S,S,3) f32 letterboxed calibration batch (the same kind of
    batch calibrate_int8 takes; 16-64 images suffice — the objective is
    output reconstruction, not generalization from labels).
    head_fn(feat_f32, folded) -> model output given the trunk feature, or
    None to distill on the raw graph outputs. The teacher is the f32 folded
    forward at Precision.HIGHEST (bit-comparable to the checkpoint's serving
    f32 path); teacher outputs are precomputed once.

    Returns (refined_folded_params, losses list). Plain Adam; every conv
    kernel/bias trains, head params (if present under "head") stay frozen —
    the serving head is f32/bf16 and already exact.

    student_init: optional starting params for the student (defaults to the
    teacher's own folded_params — the QAT-from-PTQ case). The teacher is
    ALWAYS folded_params.

    tail_blocks: train ONLY the convs of the last N residual blocks (and
    anything after them); every earlier conv stays frozen at its start value.
    0 = all convs train. Rationale (scripts/probe_qat.py): on the bench
    checkpoint full-graph distillation COLLAPSES AP (0.80 -> 0.36 at 100
    steps) — near the PTQ noise floor the STE gradient carries little signal,
    so Adam's ~lr-sized normalized updates random-walk every kernel, and the
    first convs are exactly where trained checkpoints are
    perturbation-brittle (the bf16 f32-front evidence, darknet.py). The int8
    gap itself demonstrably lives in the LAST blocks (the bf16-tail closes it,
    models/quant.py) — so that is the only place worth moving weights.
    """
    import optax

    from face_vijnana_yolov3_tpu.models.darknet import apply_graph_folded

    images = jnp.asarray(images, jnp.float32)
    n = images.shape[0]
    batch_size = min(batch_size, n)

    trainable_convs = None  # None = every conv trains
    if tail_blocks:
        from face_vijnana_yolov3_tpu.models.quant import tail_start_index

        t0 = tail_start_index(ops, tail_blocks)
        trainable_convs = {
            f"conv_{op[1]}" for op in ops[t0:] if op[0] == "conv"
        }

    def teacher_out(x):
        outs = apply_graph_folded(folded_params, x, ops,
                                  compute_dtype=jnp.float32)
        if head_fn is None:
            return outs
        return head_fn(outs, folded_params)

    teacher = jax.jit(teacher_out)(images)
    teacher = jax.tree_util.tree_map(jax.lax.stop_gradient, teacher)

    start = folded_params if student_init is None else student_init

    def is_trainable(k):
        return k != "head" and (trainable_convs is None or k in trainable_convs)

    trainable = {k: v for k, v in start.items() if is_trainable(k)}
    frozen = {k: v for k, v in start.items() if not is_trainable(k)}

    opt = optax.adam(lr)
    opt_state = opt.init(trainable)

    def student_out(prm, x):
        full = {**frozen, **prm}
        outs = apply_graph_fakequant(full, x, ops, act_scales)
        if head_fn is None:
            return outs
        return head_fn(outs, full)

    def loss_fn(prm, x, t):
        pred = student_out(prm, x)
        errs = jax.tree_util.tree_map(
            lambda a, b: jnp.mean(jnp.square(a - b)), pred, t
        )
        return sum(jax.tree_util.tree_leaves(errs))

    @jax.jit
    def step(prm, opt_state, x, t):
        loss, grads = jax.value_and_grad(loss_fn)(prm, x, t)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(prm, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    losses = []
    for it in range(steps):
        idx = rng.choice(n, size=batch_size, replace=False)
        xb = images[np.asarray(idx)]
        tb = jax.tree_util.tree_map(lambda t: t[np.asarray(idx)], teacher)
        trainable, opt_state, loss = step(trainable, opt_state, xb, tb)
        losses.append(float(loss))
        if log_every and (it % log_every == 0 or it == steps - 1):
            print(f"[qat] step {it}: distill mse {float(loss):.3e}")

    return {**frozen, **trainable}, losses
