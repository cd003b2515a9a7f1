"""Distillation QAT (models/qat.py).

The fake-quant forward must replay the int8 serving path's arithmetic — on a
small graph whose integer accumulations stay below 2^24 the two must agree
BIT-EXACTLY — and the distillation loop must actually shrink the
student-teacher gap while deploying (via quantize_folded with frozen scales)
precisely the program that was trained.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_vijnana_yolov3_tpu.models import darknet, qat, quant
from face_vijnana_yolov3_tpu.models.darknet import _conv


def _tiny_graph():
    """Small-channel residual graph: worst-case int8 accumulation is
    127*127*9*8 ~ 1.2e6 < 2^24, so f32 accumulation of the integer-valued
    operands is exact and serving-vs-fakequant equality is exact, not
    approximate."""
    return [
        _conv(0, 8),                      # 3->8, bn+leaky
        ("save", "b0"),
        _conv(1, 4, k=1),                 # bottleneck
        _conv(2, 8),
        ("add", "b0"),
        _conv(3, 6, bn=False, leaky=False),
        ("output", "out"),
    ]


@pytest.fixture(scope="module")
def tiny_setup():
    ops = _tiny_graph()
    params, state = darknet.init_graph_params(ops, jax.random.PRNGKey(0))
    # init puts residual-closing gammas at 0 — nudge every BN so no conv
    # folds to a zero kernel and every path carries signal
    for k, v in params.items():
        if k.startswith("bnorm_"):
            v["gamma"] = v["gamma"] + 0.7
    folded = darknet.fold_graph_params(params, state, ops)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3), jnp.float32)
    return ops, folded, x


def test_fakequant_bit_exact_vs_serving(tiny_setup):
    ops, folded, x = tiny_setup
    q = quant.quantize_folded(folded, x, ops)
    out_q = np.asarray(quant.apply_graph_quant(q, x, ops)["out"])
    out_fq = np.asarray(
        qat.apply_graph_fakequant(folded, x, ops, q["act_scales"])["out"]
    )
    assert np.array_equal(out_q, out_fq), (
        f"max |diff| {np.abs(out_q - out_fq).max()}"
    )


def test_fakequant_bit_exact_on_trunk_block_ops(tiny_setup):
    """Same exactness through the stride-2 / concat / upsample op kinds
    (concat consumes a saved tensor at the pre-stride resolution)."""
    ops = [
        _conv(0, 8),
        ("save", "hi"),
        _conv(1, 8, stride=2),
        _conv(2, 4, k=1),
        ("upsample",),
        ("concat", "hi"),
        _conv(3, 6, k=1, bn=False, leaky=False),
        ("output", "out"),
    ]
    params, state = darknet.init_graph_params(ops, jax.random.PRNGKey(2))
    for k, v in params.items():
        if k.startswith("bnorm_"):
            v["gamma"] = v["gamma"] + 0.7
    folded = darknet.fold_graph_params(params, state, ops)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 3), jnp.float32)
    q = quant.quantize_folded(folded, x, ops)
    out_q = np.asarray(quant.apply_graph_quant(q, x, ops)["out"])
    out_fq = np.asarray(
        qat.apply_graph_fakequant(folded, x, ops, q["act_scales"])["out"]
    )
    assert np.array_equal(out_q, out_fq)


def test_fakequant_gradients_flow(tiny_setup):
    ops, folded, x = tiny_setup
    scales = quant.calibrate_folded(folded, x, ops)
    target = qat.apply_graph_fakequant(folded, x, ops, scales)["out"] + 0.1

    def loss(prm):
        out = qat.apply_graph_fakequant(prm, x, ops, scales)["out"]
        return jnp.mean(jnp.square(out - target))

    grads = jax.grad(loss)(folded)
    gnorms = [float(jnp.abs(g).max())
              for g in jax.tree_util.tree_leaves(grads)]
    # STE must pass useful gradient to every conv's kernel AND bias
    assert sum(g > 0 for g in gnorms) >= 7, gnorms


def test_distill_shrinks_gap_and_deploys_trained_program(tiny_setup):
    """On a tiny RANDOM graph plain PTQ error is already at the rounding-noise
    floor (no systematic component to train away), so the training loop is
    exercised on a recoverable gap instead: the student starts from perturbed
    kernels and must climb back toward the f32 teacher THROUGH the fake-quant
    arithmetic. Deployment with the frozen scales must then serve bit-for-bit
    the program that was trained."""
    ops, folded, x = tiny_setup
    images = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(4), (8, 16, 16, 3)), np.float32
    )
    scales = quant.calibrate_folded(folded, images, ops)

    pkeys = jax.random.split(jax.random.PRNGKey(7), 64)
    leaves, treedef = jax.tree_util.tree_flatten(folded)
    perturbed = jax.tree_util.tree_unflatten(treedef, [
        v + 0.05 * jnp.std(v) * jax.random.normal(pkeys[i], v.shape)
        for i, v in enumerate(leaves)
    ])
    refined, losses = qat.distill_folded(
        folded, images, ops, act_scales=scales,
        steps=120, batch_size=8, lr=1e-3, student_init=perturbed,
    )
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])

    # deploy with the frozen scales: the served int8 program equals the
    # trained fake-quant program bit-for-bit
    q = quant.quantize_folded(refined, None, ops, act_scales=scales)
    out_q = np.asarray(quant.apply_graph_quant(q, jnp.asarray(images), ops)["out"])
    out_fq = np.asarray(
        qat.apply_graph_fakequant(refined, images, ops, scales)["out"]
    )
    assert np.array_equal(out_q, out_fq)

    # and the refined int8 program is closer to the f32 teacher than the
    # perturbed start it trained from
    teacher = np.asarray(darknet.apply_graph_folded(
        folded, jnp.asarray(images), ops, compute_dtype=jnp.float32)["out"])
    q_pert = quant.quantize_folded(perturbed, None, ops, act_scales=scales)
    out_pert = np.asarray(
        quant.apply_graph_quant(q_pert, jnp.asarray(images), ops)["out"])
    mse_pert = float(np.mean((out_pert - teacher) ** 2))
    mse_qat = float(np.mean((out_q - teacher) ** 2))
    assert mse_qat < 0.5 * mse_pert, (mse_pert, mse_qat)


def test_distill_tail_blocks_freezes_front(tiny_setup):
    """tail_blocks=1 must train ONLY the convs at/after the last block opener
    (conv_1..3 here — the tiny graph's single "save" precedes conv_1) and
    leave the front conv bit-identical."""
    ops, folded, x = tiny_setup
    images = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(8), (8, 16, 16, 3)), np.float32
    )
    scales = quant.calibrate_folded(folded, images, ops)
    refined, _ = qat.distill_folded(
        folded, images, ops, act_scales=scales,
        steps=5, batch_size=8, lr=1e-3, tail_blocks=1,
    )
    assert np.array_equal(np.asarray(refined["conv_0"]["kernel"]),
                          np.asarray(folded["conv_0"]["kernel"]))
    assert np.array_equal(np.asarray(refined["conv_0"]["bias"]),
                          np.asarray(folded["conv_0"]["bias"]))
    # at least one tail conv moved (the loop really trained something)
    assert not np.array_equal(np.asarray(refined["conv_3"]["kernel"]),
                              np.asarray(folded["conv_3"]["kernel"]))


def test_pipeline_qat_knob(tmp_path):
    """int8_qat_steps plumbs through calibrate_int8 and serving still runs."""
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline

    conf = FdConf(weights_path="missing.weights")
    conf.nn_arch.image_size = 96
    conf.int8_qat_steps = 3
    pipe = FaceDetectorPipeline(conf, precision="int8")
    imgs = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(5), (4, 96, 96, 3)), np.float32
    )
    pipe.calibrate_int8(imgs)
    cands, counts = pipe.detect_batch(imgs)
    assert cands.shape[0] == 4 and counts.shape == (4,)


def test_qat_and_bf16_tail_mutually_exclusive():
    """QAT trains against the FULL-int8 fake-quant program (qat.py has no
    tail cut); deploying its kernels under a bf16 tail would ship a program
    that was never the one trained — the combination must be rejected."""
    import pytest

    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline

    conf = FdConf(weights_path="missing.weights")
    conf.nn_arch.image_size = 96
    conf.int8_qat_steps = 1
    conf.int8_bf16_tail = 2
    pipe = FaceDetectorPipeline(conf, precision="int8")
    imgs = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(5), (2, 96, 96, 3)), np.float32
    )
    with pytest.raises(ValueError, match="mutually exclusive"):
        pipe.calibrate_int8(imgs)
