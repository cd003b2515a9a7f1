"""Model graph tests: parameter counts vs the darknet binary format, forward
shapes, BN fold parity, weight-importer layout, numeric cross-check vs TF Keras."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from face_vijnana_yolov3_tpu.models import darknet
from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
from face_vijnana_yolov3_tpu.models.identifier import FaceIdentifierModel
from face_vijnana_yolov3_tpu.core.weights import load_darknet_weights


def _float_count(ops):
    n = 0
    for idx, in_c, out_c, k, _s, bn in darknet.conv_layout(ops):
        n += (4 * out_c if bn else out_c) + k * k * in_c * out_c
    return n


def test_full_graph_matches_darknet_file_float_count():
    # yolov3.weights is 248007048 bytes = 20 header + 62001757 float32 weights.
    assert _float_count(darknet.yolov3_graph()) == 62001757


def test_trunk_is_prefix_of_full_graph():
    trunk = darknet.conv_layout(darknet.trunk_graph())
    full = darknet.conv_layout(darknet.yolov3_graph())
    assert full[: len(trunk)] == trunk
    assert [t[0] for t in trunk] == sorted(t[0] for t in trunk)
    assert trunk[-1][0] == 73 and trunk[-1][2] == 1024


def test_trunk_param_count_matches_reference_analysis():
    # Reference analysis reports the base model at ~40.6M params
    # (analysis/facial_idetity_analysis.txt:26-40).
    n = _float_count(darknet.trunk_graph())
    assert 40_500_000 < n < 40_700_000


def test_apply_graph_shapes_small_input():
    ops = darknet.trunk_graph()
    params, state = darknet.init_graph_params(ops, jax.random.PRNGKey(0))
    x = jnp.zeros((2, 64, 64, 3))
    outs, _ = darknet.apply_graph(params, state, x, ops)
    assert outs["trunk"].shape == (2, 2, 2, 1024)


def test_full_graph_head_shapes_small_input():
    ops = darknet.yolov3_graph()
    params, state = darknet.init_graph_params(ops, jax.random.PRNGKey(1))
    x = jnp.zeros((1, 128, 128, 3))
    outs, _ = darknet.apply_graph(params, state, x, ops)
    assert outs["yolo_82"].shape == (1, 4, 4, 255)
    assert outs["yolo_94"].shape == (1, 8, 8, 255)
    assert outs["yolo_106"].shape == (1, 16, 16, 255)


def test_fold_parity_inference():
    # Prefix subgraph (through the first residual stage): deep random-BN stacks
    # amplify activations geometrically, which only obscures the comparison.
    ops = darknet.trunk_graph()[:8] + [("output", "trunk")]
    rng = np.random.default_rng(0)
    params, state = darknet.init_graph_params(ops, jax.random.PRNGKey(2))
    # Randomize BN stats so folding is non-trivial.
    for k in list(state):
        c = state[k]["mean"].shape[0]
        state[k] = {
            "mean": jnp.asarray(rng.normal(0, 0.5, c).astype(np.float32)),
            "var": jnp.asarray(rng.uniform(0.5, 2.0, c).astype(np.float32)),
        }
        params[k] = {
            "gamma": jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32)),
            "beta": jnp.asarray(rng.normal(0, 0.2, c).astype(np.float32)),
        }
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    outs, _ = darknet.apply_graph(params, state, x, ops)
    folded = darknet.fold_graph_params(params, state, ops)
    outs_f = darknet.apply_graph_folded(folded, x, ops, compute_dtype=jnp.float32)
    a, b = np.asarray(outs["trunk"]), np.asarray(outs_f["trunk"])
    scale = np.maximum(np.abs(a), 1.0)
    assert np.max(np.abs(a - b) / scale) < 1e-4


def test_f32_front_blocks_serving_hybrid():
    """f32_front_blocks: boundary indexing + numeric containment.

    The bf16 serving path keeps the first trunk segments in f32 because
    trained checkpoints amplify bf16 rounding of conv_0/1 on rare inputs
    (AP50 0.79->0.45; scripts/probe_bf16_degen.py). Checks: (a) the boundary
    lands on block openers, (b) front=ALL blocks in bf16-mode equals the
    strict-f32 folded forward except the (bf16) head-input cast, (c) a
    partial front matches a manually composed two-segment program.
    """
    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel

    model = FaceDetectorModel(image_size=64)
    ops = model.ops
    starts = [i for i, op in enumerate(ops) if op[0] == "save"]
    assert darknet.front_end_index(ops, 1) == starts[0]
    assert darknet.front_end_index(ops, 2) == starts[1]
    import pytest

    with pytest.raises(ValueError):
        darknet.front_end_index(ops, 0)
    with pytest.raises(ValueError):
        darknet.front_end_index(ops, len(starts) + 1)

    rng = np.random.default_rng(0)
    params, state = model.init(jax.random.PRNGKey(4))
    folded = model.fold(params, state)
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))

    # (b) all-front f32: trunk identical to strict f32, head runs bf16
    t_all = darknet.front_end_index(ops, len(starts))
    full_f32 = darknet.apply_graph_folded(
        folded, x, ops, compute_dtype=jnp.float32
    )["trunk"]
    hybrid_all = darknet.apply_graph_folded(
        folded, x, ops, compute_dtype=jnp.bfloat16, f32_front_ops=len(ops)
    )["trunk"]
    np.testing.assert_allclose(
        np.asarray(full_f32), np.asarray(hybrid_all), rtol=1e-6, atol=1e-6
    )
    assert t_all < len(ops)  # boundary is a real op index

    # (c) partial front == manual two-segment composition
    t = darknet.front_end_index(ops, 2)
    hybrid = model.apply_folded(
        folded, x, compute_dtype=jnp.bfloat16, f32_front_blocks=2
    )
    seg1 = darknet.apply_graph_folded(
        folded, x, list(ops[:t]) + [("output", "cut")],
        compute_dtype=jnp.float32,
    )["cut"]
    seg2 = darknet.apply_graph_folded(
        folded, seg1, list(ops[t:]), compute_dtype=jnp.bfloat16
    )["trunk"]
    from face_vijnana_yolov3_tpu.models.detector import _head_conv

    manual = _head_conv(
        seg2.astype(jnp.bfloat16), folded["head"], jnp.bfloat16
    )
    np.testing.assert_allclose(
        np.asarray(hybrid, np.float32), np.asarray(manual, np.float32),
        rtol=1e-5, atol=1e-5,
    )


def test_bn_train_mode_updates_moving_stats():
    ops = [("conv", 0, 8, 3, 1, True, True), ("output", "y")]
    params, state = darknet.init_graph_params(ops, jax.random.PRNGKey(3))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 8, 8, 3)) * 3,
                    jnp.float32)
    _, new_state = darknet.apply_graph(params, state, x, ops, train=True)
    m, v = new_state["bnorm_0"]["mean"], new_state["bnorm_0"]["var"]
    assert not np.allclose(np.asarray(m), 0.0)
    # momentum 0.99: new = 0.99*old + 0.01*batch
    assert np.all(np.abs(np.asarray(m)) < 1.0)
    _, same_state = darknet.apply_graph(params, state, x, ops, train=False)
    np.testing.assert_array_equal(
        np.asarray(same_state["bnorm_0"]["mean"]), np.zeros(8, np.float32)
    )


def _fake_weights_file(tmp_path, ops):
    n = _float_count(ops)
    rng = np.random.default_rng(7)
    body = rng.normal(size=n).astype(np.float32)
    path = tmp_path / "fake.weights"
    with open(path, "wb") as f:
        f.write(np.array([0, 2, 0], dtype=np.int32).tobytes())  # header: ver 0.2
        f.write(np.zeros(8, dtype=np.uint8).tobytes())          # seen counter
        f.write(body.tobytes())
    return str(path), body


def test_weight_loader_layout(tmp_path):
    ops = darknet.trunk_graph()
    path, body = _fake_weights_file(tmp_path, ops)
    params, state = load_darknet_weights(path, ops)
    # conv_0: beta(32), gamma(32), mean(32), var(32), kernel 32*3*3*3.
    np.testing.assert_array_equal(np.asarray(params["bnorm_0"]["beta"]), body[:32])
    np.testing.assert_array_equal(np.asarray(params["bnorm_0"]["gamma"]), body[32:64])
    np.testing.assert_array_equal(np.asarray(state["bnorm_0"]["mean"]), body[64:96])
    np.testing.assert_array_equal(np.asarray(state["bnorm_0"]["var"]), body[96:128])
    k0 = body[128 : 128 + 32 * 3 * 3 * 3].reshape(32, 3, 3, 3).transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(np.asarray(params["conv_0"]["kernel"]), k0)
    assert params["conv_73"]["kernel"].shape == (3, 3, 512, 1024)


def test_weight_loader_exhaustion_error(tmp_path):
    ops = darknet.trunk_graph()
    path, _ = _fake_weights_file(tmp_path, [("conv", 0, 32, 3, 1, True, True)])
    with pytest.raises(ValueError, match="exhausted"):
        load_darknet_weights(path, ops)


def test_conv_bn_leaky_matches_tf_keras():
    """Numeric cross-check of one conv+BN+leaky stage against TF Keras (the
    reference's runtime), inference mode."""
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    kernel = rng.normal(0, 0.1, size=(3, 3, 3, 8)).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    beta = rng.normal(0, 0.2, 8).astype(np.float32)
    mean = rng.normal(0, 0.5, 8).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 8).astype(np.float32)

    inp = tf.keras.Input((16, 16, 3))
    h = tf.keras.layers.ZeroPadding2D(1)(inp)
    h = tf.keras.layers.Conv2D(8, 3, strides=2, padding="valid", use_bias=False)(h)
    h = tf.keras.layers.BatchNormalization(epsilon=1e-3)(h)
    h = tf.keras.layers.LeakyReLU(0.1)(h)
    model = tf.keras.Model(inp, h)
    model.layers[2].set_weights([kernel])
    model.layers[3].set_weights([gamma, beta, mean, var])
    want = model(x, training=False).numpy()

    ops = [("conv", 0, 8, 3, 2, True, True), ("output", "y")]
    params = {"conv_0": {"kernel": jnp.asarray(kernel)},
              "bnorm_0": {"gamma": jnp.asarray(gamma), "beta": jnp.asarray(beta)}}
    state = {"bnorm_0": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}}
    outs, _ = darknet.apply_graph(params, state, jnp.asarray(x), ops)
    np.testing.assert_allclose(np.asarray(outs["y"]), want, atol=1e-5, rtol=1e-5)


# ------------------------------------------------------------------ task models

def test_detector_forward_and_loss():
    model = FaceDetectorModel(image_size=64)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 64, 64, 3))
    out, _ = model.apply(params, state, x)
    assert out.shape == (2, 2, 2, 6)
    gt = jnp.ones_like(out)
    assert float(model.loss(out, gt)) == pytest.approx(
        float(jnp.mean((out - gt) ** 2))
    )


def test_identifier_embed_normalized_and_triplet_loss():
    model = FaceIdentifierModel(image_size=64, dense1_dim=16)
    params, state = model.init(jax.random.PRNGKey(1))
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 64, 64, 3)).astype(np.float32)
    )
    emb, _ = model.embed(params, state, x)
    assert emb.shape == (2, 16)
    norms = np.linalg.norm(np.asarray(emb), axis=-1)
    # relu can zero everything with random init; norms are 1 or ~0.
    assert np.all((np.abs(norms - 1.0) < 1e-5) | (norms < 1e-3))

    # Handcrafted triplet loss check.
    a = np.zeros((3, 4), np.float32)
    p = np.zeros((3, 4), np.float32)
    n = np.zeros((3, 4), np.float32)
    p[0, 0] = 1.0   # d_ap=1, d_an=0 → 1 - 0 + 0.2 = 1.2
    n[1, 0] = 2.0   # d_ap=0, d_an=2 → max(0-2+0.2, 0) = 0
    y = jnp.asarray(np.concatenate([a, p, n], axis=1))
    loss = FaceIdentifierModel.triplet_loss(y, dim=4)
    assert float(loss) == pytest.approx((1.2 + 0.0 + 0.2) / 3, rel=1e-6)


def test_triplet_forward_stacks_one_batch():
    model = FaceIdentifierModel(image_size=64, dense1_dim=8)
    params, state = model.init(jax.random.PRNGKey(3))
    rng = np.random.default_rng(4)
    a, p, n = (jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
               for _ in range(3))
    out, _ = model.triplet_forward(params, state, a, p, n)
    assert out.shape == (2, 24)
    ea, _ = model.embed(params, state, a)
    np.testing.assert_allclose(np.asarray(out[:, :8]), np.asarray(ea),
                               atol=1e-5, rtol=1e-5)


def test_remat_matches_plain_forward_and_grad():
    ops = darknet.trunk_graph()[:8] + [("output", "trunk")]
    params, state = darknet.init_graph_params(ops, jax.random.PRNGKey(5))
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, 64, 64, 3)).astype(np.float32)
    )

    def loss(p, remat):
        outs, _ = darknet.apply_graph(p, state, x, ops, train=True, remat=remat)
        return jnp.sum(outs["trunk"] ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)
    flat0 = jax.tree.leaves(g0)
    flat1 = jax.tree.leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
    # int granularity (first-N-segments only, FiConf.train_remat) is the
    # same function: gradients must match the full-remat path too.
    l2, g2 = jax.value_and_grad(lambda p: loss(p, 1))(params)
    assert float(l2) == pytest.approx(float(l0), rel=1e-6)
    for a, b in zip(flat0, jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_remat_updates_bn_state_for_all_segments():
    """Regression: the remat path used to merge each segment's returned state
    wholesale — every segment's state contains stale pass-through copies of the
    other segments' bnorm keys, so later segments overwrote earlier segments'
    moving-stat updates with the original values."""
    ops = darknet.trunk_graph()[:8] + [("output", "trunk")]
    params, state = darknet.init_graph_params(ops, jax.random.PRNGKey(5))
    x = jnp.asarray(
        np.random.default_rng(6).normal(size=(2, 64, 64, 3)).astype(np.float32)
    )
    _, st_plain = darknet.apply_graph(params, state, x, ops, train=True,
                                      remat=False)
    _, st_remat = darknet.apply_graph(params, state, x, ops, train=True,
                                      remat=True)
    assert set(st_plain) == set(st_remat)
    for key in st_plain:
        for field in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(st_remat[key][field]),
                np.asarray(st_plain[key][field]),
                atol=1e-5, rtol=1e-4, err_msg=f"{key}.{field}",
            )
        # And the stats actually moved off the init values for every layer.
        assert not np.allclose(
            np.asarray(st_remat[key]["mean"]), np.asarray(state[key]["mean"])
        ), f"{key} moving mean never updated"


def test_remat_segments_structure():
    segs = darknet.remat_segments(darknet.trunk_graph())
    # 23 residual blocks → 23 add-terminated segments + the trailing output seg.
    assert sum(1 for s in segs for op in s if op[0] == "add") == 23
    flat = [op for s in segs for op in s]
    assert flat == darknet.trunk_graph()
    with pytest.raises(ValueError):
        darknet.remat_segments(darknet.yolov3_graph())


def test_s2d_front_matches_stock_folded():
    """Space-to-depth conv0/conv1 rewrite is algebraically exact."""
    from face_vijnana_yolov3_tpu.models.s2d import (
        build_s2d_folded,
        apply_graph_folded_s2d,
    )

    model = FaceDetectorModel(image_size=64)
    params, state = model.init(jax.random.PRNGKey(0))
    folded = darknet.fold_graph_params(params, state, model.ops)
    folded["head"] = params["head"]
    folded_s2d = build_s2d_folded(folded)
    ops2 = model.ops[:2] + [("output", "trunk")]
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(2, 64, 64, 3)).astype(np.float32)
    )
    o1 = darknet.apply_graph_folded(folded, x, ops2, compute_dtype=jnp.float32)
    o2 = apply_graph_folded_s2d(folded_s2d, x, ops2, compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(o1["trunk"]), np.asarray(o2["trunk"]), atol=5e-6
    )


def test_full_trunk_matches_tensorflow_engine():
    """Cross-engine golden: the whole 52-conv trunk (every stride/pad/skip)
    against an independent TF implementation with identical weights."""
    tf = pytest.importorskip("tensorflow")
    ops = darknet.trunk_graph()
    rng = np.random.default_rng(42)
    params, state = darknet.init_graph_params(ops, jax.random.PRNGKey(7))
    for k in list(state):
        c = state[k]["mean"].shape[0]
        state[k] = {
            "mean": rng.normal(0, 0.3, c).astype(np.float32),
            "var": rng.uniform(0.5, 1.5, c).astype(np.float32),
        }
        params[k] = {
            "gamma": rng.uniform(0.8, 1.2, c).astype(np.float32),
            "beta": rng.normal(0, 0.1, c).astype(np.float32),
        }

    x = rng.uniform(size=(1, 128, 128, 3)).astype(np.float32)

    def tf_forward():
        h = tf.constant(x)
        saved = {}
        layout = {t[0]: t for t in darknet.conv_layout(ops)}
        for op in ops:
            kind = op[0]
            if kind == "conv":
                _, idx, _oc, k, stride, bn, leaky = op
                if k > 1:
                    h = tf.pad(h, [[0, 0], [1, 1], [1, 1], [0, 0]])
                h = tf.nn.conv2d(
                    h, np.asarray(params[f"conv_{idx}"]["kernel"]),
                    strides=stride, padding="VALID",
                )
                if bn:
                    bp, bs = params[f"bnorm_{idx}"], state[f"bnorm_{idx}"]
                    h = (h - bs["mean"]) / np.sqrt(bs["var"] + 1e-3) * bp["gamma"] + bp["beta"]
                if leaky:
                    h = tf.nn.leaky_relu(h, alpha=0.1)
            elif kind in ("save", "mark"):
                saved[op[1]] = h
            elif kind == "add":
                h = saved[op[1]] + h
            elif kind == "output":
                return h.numpy()

    want = tf_forward()
    outs, _ = darknet.apply_graph(params, state, jnp.asarray(x), ops)
    got = np.asarray(outs["trunk"])
    assert want.shape == got.shape == (1, 4, 4, 1024)
    # Random-init nets amplify activations ~1e5 over 52 layers, so elementwise
    # max-rel is dominated by cancellation noise; normalized RMS isolates true
    # engine disagreement (measured ~1.5e-6 = pure float drift).
    nrmse = np.sqrt(np.mean((want - got) ** 2)) / np.sqrt(np.mean(want**2))
    assert nrmse < 1e-5


def test_train_mode_gradients_match_tensorflow():
    """Backward-pass golden: conv+BN(train)+leaky MSE gradients vs TF
    GradientTape with identical weights (validates batch-stat BN backprop —
    the semantics Keras fit_generator trains under)."""
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
    target = rng.normal(size=(4, 4, 4, 8)).astype(np.float32)
    kernel = rng.normal(0, 0.2, (3, 3, 3, 8)).astype(np.float32)
    gamma = rng.uniform(0.8, 1.2, 8).astype(np.float32)
    beta = rng.normal(0, 0.1, 8).astype(np.float32)

    # TF side: explicit batch-stat BN (training semantics).
    kt = tf.Variable(kernel)
    gt_ = tf.Variable(gamma)
    bt = tf.Variable(beta)
    with tf.GradientTape() as tape:
        h = tf.pad(tf.constant(x), [[0, 0], [1, 1], [1, 1], [0, 0]])
        h = tf.nn.conv2d(h, kt, strides=2, padding="VALID")
        mean, var = tf.nn.moments(h, axes=[0, 1, 2])
        h = (h - mean) / tf.sqrt(var + 1e-3) * gt_ + bt
        h = tf.nn.leaky_relu(h, alpha=0.1)
        loss_tf = tf.reduce_mean(tf.square(h - target))
    tf_grads = tape.gradient(loss_tf, [kt, gt_, bt])

    ops = [("conv", 0, 8, 3, 2, True, True), ("output", "y")]
    params = {"conv_0": {"kernel": jnp.asarray(kernel)},
              "bnorm_0": {"gamma": jnp.asarray(gamma), "beta": jnp.asarray(beta)}}
    state = {"bnorm_0": {"mean": jnp.zeros(8), "var": jnp.ones(8)}}

    def loss_fn(p):
        outs, _ = darknet.apply_graph(p, state, jnp.asarray(x), ops, train=True)
        return jnp.mean(jnp.square(outs["y"] - target))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert float(loss) == pytest.approx(float(loss_tf), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(grads["conv_0"]["kernel"]), tf_grads[0].numpy(),
        atol=1e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(grads["bnorm_0"]["gamma"]), tf_grads[1].numpy(),
        atol=1e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(grads["bnorm_0"]["beta"]), tf_grads[2].numpy(),
        atol=1e-5, rtol=1e-4,
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_bn_custom_vjp_matches_autodiff(dtype):
    """The hand-fused BN backward (darknet._bn_train_norm custom_vjp —
    opt-in via apply_graph(bn_custom_vjp=True); measured perf-negative vs
    autodiff, PROFILE.md) must be numerically identical to pure autodiff
    through a graph with residual adds (skip-path cotangents sum into dy)."""

    def ref_norm(h, gamma, beta):
        hf = h.astype(jnp.float32)
        mean = jnp.mean(hf, axis=(0, 1, 2))
        var = jnp.maximum(jnp.mean(hf * hf, axis=(0, 1, 2)) - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + darknet.BN_EPS)
        return (hf - mean) * (inv * gamma) + beta

    # conv→BN→leaky ×2 with a residual add, mirroring apply_graph's train path
    ops = [
        ("conv", 0, 8, 3, 1, True, True),
        ("save", "s"),
        ("conv", 1, 4, 1, 1, True, True),
        ("conv", 2, 8, 3, 1, True, True),
        ("add", "s"),
        ("output", "y"),
    ]
    params, state = darknet.init_graph_params(ops, jax.random.PRNGKey(5))
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(4, 8, 8, 3)) * 3, jnp.float32
    )
    target = jnp.asarray(np.random.default_rng(3).normal(size=(4, 8, 8, 8)),
                         jnp.float32)

    def loss_custom(p):
        outs, _ = darknet.apply_graph(p, state, x, ops, train=True,
                                      compute_dtype=dtype,
                                      bn_custom_vjp=True)
        return jnp.mean(jnp.square(outs["y"] - target))

    def loss_ref(p):
        # Same forward written with plain-autodiff BN.
        h = x
        saved = {}
        for op in ops:
            if op[0] == "conv":
                _, idx, _oc, k, stride, _bn, _lk = op
                h = darknet._conv2d(h, p[f"conv_{idx}"]["kernel"], stride, k,
                                    dtype)
                bp = p[f"bnorm_{idx}"]
                h = ref_norm(h, bp["gamma"], bp["beta"])
                h = jnp.where(h > 0, h, darknet.LEAKY_ALPHA * h)
                h = h.astype(dtype)
            elif op[0] == "save":
                saved[op[1]] = h
            elif op[0] == "add":
                h = saved[op[1]] + h
        return jnp.mean(jnp.square(h.astype(jnp.float32) - target))

    g_custom = jax.grad(loss_custom)(params)
    g_ref = jax.grad(loss_ref)(params)
    flat_c, _ = jax.tree_util.tree_flatten(g_custom)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    for a, b in zip(flat_c, flat_r):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=2e-6, rtol=2e-5)


def test_fd_loss_matches_tf_keras():
    """The shipped (reference-unused) fd_loss matches the reference formula
    executed by TF Keras' own binary_crossentropy backend op, including the
    probability-space clip on raw linear-head values and the
    mean(sqrt(square(.))) box term (reference face_detection.py:59-64)."""
    tf = pytest.importorskip("tensorflow")
    from face_vijnana_yolov3_tpu.models.detector import fd_loss

    rng = np.random.default_rng(23)
    y_true = np.zeros((2, 13, 13, 6), np.float32)
    y_true[..., 0] = rng.integers(0, 2, (2, 13, 13))
    y_true[..., 1:5] = rng.uniform(0, 1, (2, 13, 13, 4))
    y_true[..., 5] = y_true[..., 0]
    # raw linear head output: unbounded values, incl. negatives (the clip
    # inside Keras BCE is load-bearing)
    y_pred = rng.normal(0, 1.5, (2, 13, 13, 6)).astype(np.float32)

    # Keras 2.2.4's backend (the reference runtime): clip to [eps, 1-eps],
    # convert to logits, sigmoid_cross_entropy_with_logits. (The modern Keras
    # in this image instead computes log(output + eps) after the clip, which
    # diverges at clipped extremes — the reference semantics are 2.2.4's.)
    def k224_bce(target, output, eps=1e-7):
        output = tf.clip_by_value(output, eps, 1 - eps)
        logits = tf.math.log(output / (1 - output))
        return tf.nn.sigmoid_cross_entropy_with_logits(
            labels=target, logits=logits
        ).numpy()

    o = k224_bce(tf.constant(y_true[..., 0]), tf.constant(y_pred[..., 0]))
    l2 = tf.reduce_mean(
        tf.sqrt(tf.square(y_true[..., 1:5] - y_pred[..., 1:5])), axis=-1
    ).numpy()
    c = k224_bce(tf.constant(y_true[..., 5]), tf.constant(y_pred[..., 5]))
    expected = (o + l2 + c) / 3.0

    got = np.asarray(fd_loss(y_true, y_pred))
    assert got.shape == (2, 13, 13)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)
