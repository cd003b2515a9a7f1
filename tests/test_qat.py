"""Distillation QAT (models/qat.py).

The fake-quant forward must replay the int8 serving path's arithmetic — on a
small graph whose integer accumulations stay below 2^24 the two must agree
BIT-EXACTLY — and the distillation loop must actually shrink the
student-teacher gap while deploying (via quantize_folded with frozen scales)
precisely the program that was trained.
"""

import os

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


# ----------------------------------------------------- training-time fakequant
# (darknet.apply_graph(fakequant=True) — QAT during training, round 5)


def test_act_fq_ste_and_idempotent():
    h = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 8), jnp.float32)
    fq, s = darknet._act_fq(h)
    assert s.shape == (8,)
    # idempotent: values already on the grid re-round to themselves and the
    # recomputed scale is identical (max element sits at exactly 127*s)
    fq2, s2 = darknet._act_fq(fq)
    np.testing.assert_array_equal(np.asarray(fq), np.asarray(fq2))
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s2))
    # straight-through: d/dh sum(fq(h)) == 1 everywhere (scale stop-gradded,
    # no element clips since the scale is derived from the batch max)
    g = jax.grad(lambda x: jnp.sum(darknet._act_fq(x)[0]))(h)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_weight_fq_commutes_with_out_channel_scale():
    """Per-out-channel scaling (= BN fold) commutes with the weight fake-quant:
    quantizing the unfolded kernel sees exactly the relative error pattern the
    deployed folded int8 kernel has (darknet._weight_fq docstring)."""
    k = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 4, 6), jnp.float32)
    s_in = jnp.abs(jax.random.normal(jax.random.PRNGKey(5), (4,))) + 0.1
    c = jnp.asarray([0.5, -2.0, 1.0, 3.0, -0.25, 10.0], jnp.float32)
    a = darknet._weight_fq(k * c[None, None, None, :], s_in)
    b = darknet._weight_fq(k, s_in) * c[None, None, None, :]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-7)


def test_train_fakequant_forward_close_not_equal(tiny_setup):
    """Eval-mode fakequant forward carries int8-grid noise: close to the f32
    forward (the whole point of QAT is that this noise is small) but not
    bit-equal (the noise must actually be injected)."""
    ops, _folded, x = tiny_setup
    params, state = darknet.init_graph_params(ops, jax.random.PRNGKey(7))
    for k, v in params.items():
        if k.startswith("bnorm_"):
            v["gamma"] = v["gamma"] + 0.7
    ref, _ = darknet.apply_graph(params, state, x, ops, train=False)
    fq, _ = darknet.apply_graph(params, state, x, ops, train=False,
                                fakequant=True)
    a, b = np.asarray(ref["out"]), np.asarray(fq["out"])
    assert not np.array_equal(a, b)
    nrmse = np.sqrt(np.mean((a - b) ** 2)) / (np.std(a) + 1e-9)
    assert nrmse < 0.1, f"fakequant noise unexpectedly large: NRMSE {nrmse}"


def test_train_fakequant_gradients_flow_and_step_runs(tiny_setup):
    """QAT train-mode: STE gradients reach every conv kernel and BN param,
    and the step is jittable (static fakequant flag, no data-dependent
    control flow)."""
    ops, _folded, x = tiny_setup
    params, state = darknet.init_graph_params(ops, jax.random.PRNGKey(8))
    for k, v in params.items():
        if k.startswith("bnorm_"):
            v["gamma"] = v["gamma"] + 0.7

    @jax.jit
    def loss_fn(p):
        outs, _ = darknet.apply_graph(p, state, x, ops, train=True,
                                      fakequant=True)
        return jnp.mean(jnp.square(outs["out"]))

    grads = jax.grad(loss_fn)(params)
    for k, v in grads.items():
        for name, g in v.items():
            assert np.any(np.asarray(g) != 0.0), f"zero grad at {k}/{name}"


def test_train_fakequant_residual_requant_count(tiny_setup):
    """The fused-residual rule holds in the training fake-quant too: the conv
    feeding an add defers its requant to the post-add position, so the
    rounding count matches serving (fakequant_skip_ops)."""
    ops, _folded, _x = tiny_setup
    skip = darknet.fakequant_skip_ops(ops)
    # in _tiny_graph, conv_2 (op index 3) immediately precedes the add
    assert skip == {3}


def test_qat_checkpoint_quantizes_with_low_error():
    """End-to-end: a few QAT steps on a tiny trunk, then the REAL serving
    chain (fold -> quantize_folded -> apply_graph_quant) — the deployed int8
    output must track the f32 output closely. This is the property the
    400-epoch bench recipe relies on."""
    import optax

    ops = _tiny_graph()
    params, state = darknet.init_graph_params(ops, jax.random.PRNGKey(9))
    for k, v in params.items():
        if k.startswith("bnorm_"):
            v["gamma"] = v["gamma"] + 0.7
    x = jax.random.uniform(jax.random.PRNGKey(10), (4, 16, 16, 3))
    y = jax.random.uniform(jax.random.PRNGKey(11), (4, 16, 16, 6))

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, o, s):
        def loss_fn(p):
            outs, ns = darknet.apply_graph(p, s, x, ops, train=True,
                                           fakequant=True)
            return jnp.mean(jnp.square(outs["out"] - y)), ns

        (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        up, o = opt.update(g, o)
        return optax.apply_updates(p, up), o, ns, l

    losses = []
    for _ in range(10):
        params, opt_state, state, loss = step(params, opt_state, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    folded = darknet.fold_graph_params(params, state, ops)
    q = quant.quantize_folded(folded, x, ops)
    out_q = np.asarray(quant.apply_graph_quant(q, x, ops)["out"])
    out_f = np.asarray(darknet.apply_graph_folded(
        folded, x, ops, compute_dtype=jnp.float32)["out"])
    nrmse = np.sqrt(np.mean((out_q - out_f) ** 2)) / (np.std(out_f) + 1e-9)
    assert nrmse < 0.05, f"PTQ after QAT drifted: NRMSE {nrmse}"


def test_trainer_fakequant_knob(tmp_path):
    """FdConf.train_qat plumbs through FaceDetectorPipeline.train into
    train_detector(fakequant=True)."""
    from face_vijnana_yolov3_tpu.train import trainer as trainer_mod

    seen = {}
    real = trainer_mod.train_detector

    def spy(model, params, state, dataset, hps, **kw):
        seen["fakequant"] = kw.get("fakequant")
        return params, state, [0.0]

    trainer_mod.train_detector = spy
    try:
        from face_vijnana_yolov3_tpu.api.config import FdConf
        from face_vijnana_yolov3_tpu.api.face_detection import (
            FaceDetectorPipeline,
        )

        conf = FdConf(weights_path="missing.weights",
                      model_path=str(tmp_path / "ck"))
        conf.nn_arch.image_size = 96
        conf.train_qat = True
        pipe = FaceDetectorPipeline(conf)
        import face_vijnana_yolov3_tpu.data.uccs as uccs

        class _DS:
            def steps(self, bs):
                return 1

            def batch(self, i, bs):
                return (np.zeros((2, 96, 96, 3), np.float32),
                        np.zeros((2, 3, 3, 6), np.float32))

        real_ds = uccs.DetectionDataset
        uccs.DetectionDataset = lambda *a, **k: _DS()
        try:
            pipe.train()
        finally:
            uccs.DetectionDataset = real_ds
    finally:
        trainer_mod.train_detector = real
    assert seen["fakequant"] is True


def test_identifier_fakequant_passthrough():
    """FaceIdentifierModel.embed/triplet_forward plumb fakequant into the
    trunk walk: the QAT forward differs from the plain one (noise injected)
    but stays L2-normalized."""
    from face_vijnana_yolov3_tpu.models.identifier import FaceIdentifierModel

    m = FaceIdentifierModel(image_size=64, dense1_dim=8)
    params, state = m.init(jax.random.PRNGKey(12))
    x = jax.random.uniform(jax.random.PRNGKey(13), (2, 64, 64, 3))
    e0, _ = m.embed(params, state, x, train=False)
    e1, _ = m.embed(params, state, x, train=False, fakequant=True)
    assert not np.array_equal(np.asarray(e0), np.asarray(e1))
    np.testing.assert_allclose(
        np.sum(np.asarray(e1) ** 2, axis=-1), 1.0, rtol=1e-5)
    out, _ = m.triplet_forward(params, state, x, x, x, train=True,
                               fakequant=True)
    assert out.shape == (2, 24)


def test_qat_checkpoint_serves_full_int8(tmp_path):
    """A checkpoint saved from a QAT run (sidecar trainmeta {"qat": true})
    pins the int8 serving default to FULL int8 — tail escalation measures
    agreement with the off-distribution f32 path on such checkpoints and
    inverts the real accuracy ordering (round-5 frontier)."""
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.core.checkpoints import (
        load_train_meta,
        save_checkpoint,
    )
    from face_vijnana_yolov3_tpu.models import quant as quant_mod
    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel

    m = FaceDetectorModel(image_size=96)
    params, state = m.init(jax.random.PRNGKey(20))
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, {"params": params, "state": state},
                    meta={"qat": True})
    assert load_train_meta(ck) == {"qat": True}
    assert load_train_meta(str(tmp_path / "missing")) == {}

    conf = FdConf(weights_path="missing.weights", model_path=ck,
                  model_loading=True)
    conf.nn_arch.image_size = 96
    pipe = FaceDetectorPipeline(conf, precision="int8")
    assert pipe._ckpt_qat is True

    seen = {}
    real = quant_mod.quantize_autotail

    def spy(model, folded, x, **kw):
        seen["tails"] = kw.get("tails")
        return real(model, folded, x, **kw)

    quant_mod.quantize_autotail = spy
    try:
        imgs = np.asarray(jax.random.uniform(
            jax.random.PRNGKey(21), (4, 96, 96, 3)), np.float32)
        pipe.calibrate_int8(imgs)
    finally:
        quant_mod.quantize_autotail = real
    assert seen["tails"] == (0,)
    assert pipe.int8_tail_chosen == 0

    # a plain (non-QAT) checkpoint keeps the full escalation ladder
    ck2 = str(tmp_path / "ck2")
    save_checkpoint(ck2, {"params": params, "state": state},
                    meta={"qat": False})
    conf2 = FdConf(weights_path="missing.weights", model_path=ck2,
                   model_loading=True)
    conf2.nn_arch.image_size = 96
    pipe2 = FaceDetectorPipeline(conf2, precision="int8")
    assert pipe2._ckpt_qat is False
    quant_mod.quantize_autotail = spy
    try:
        pipe2.calibrate_int8(imgs)
    finally:
        quant_mod.quantize_autotail = real
    assert seen["tails"] == (0, 2, 4, 5, 6, 8)


def test_measured_serving_pin_wins(tmp_path):
    """A measured `int8_tail` pin in the trainmeta sidecar (written by
    scripts/select_serving_tail.py / core.checkpoints.update_train_meta)
    overrides BOTH the QAT full-int8 default and the plain escalation
    ladder — the label-free self-check cannot resolve the tail frontier on
    QAT checkpoints (round-5 measurement: errs flat 0.03-0.05 across tails
    whose held-out AP50 spans 0.35-0.91)."""
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.core.checkpoints import (
        load_train_meta,
        save_checkpoint,
        update_train_meta,
    )
    from face_vijnana_yolov3_tpu.models import quant as quant_mod
    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel

    m = FaceDetectorModel(image_size=96)
    params, state = m.init(jax.random.PRNGKey(30))
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, {"params": params, "state": state},
                    meta={"qat": True})
    meta = update_train_meta(ck, int8_tail=5, int8_tail_table={"0": 0.77})
    assert meta["qat"] is True and meta["int8_tail"] == 5
    assert load_train_meta(ck)["int8_tail"] == 5

    conf = FdConf(weights_path="missing.weights", model_path=ck,
                  model_loading=True)
    conf.nn_arch.image_size = 96
    pipe = FaceDetectorPipeline(conf, precision="int8")
    assert pipe._ckpt_int8_tail == 5

    seen = {}
    real = quant_mod.quantize_autotail

    def spy(model, folded, x, **kw):
        seen["tails"] = kw.get("tails")
        return real(model, folded, x, **kw)

    quant_mod.quantize_autotail = spy
    try:
        imgs = np.asarray(jax.random.uniform(
            jax.random.PRNGKey(31), (4, 96, 96, 3)), np.float32)
        pipe.calibrate_int8(imgs)
    finally:
        quant_mod.quantize_autotail = real
    assert seen["tails"] == (5,)
    assert pipe.int8_tail_chosen == 5


def test_select_tail_rule():
    """select_tail walks candidates fastest-first and stops at the first
    drift-eligible one; with none eligible it falls back to the best."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    import select_serving_tail as st

    aps = {0: 0.776, 3: 0.825, 4: 0.879, 5: 0.911, 6: 0.911, 8: 0.88}
    real = st.measure_tail_ap
    st.measure_tail_ap = lambda w, c, t: aps[t]
    try:
        tail, table = st.select_tail(".", "ck", f32_ap50=0.873,
                                     log=lambda m: None)
        assert tail == 4  # first (fastest) candidate with drift >= -0.02
        assert table == {0: 0.776, 3: 0.825, 4: 0.879}  # early stop
        tail2, table2 = st.select_tail(
            ".", "ck", tails=(0, 3), f32_ap50=0.99, log=lambda m: None)
        assert tail2 == 3  # none eligible -> best-AP fallback
    finally:
        st.measure_tail_ap = real
