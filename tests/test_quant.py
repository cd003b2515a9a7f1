"""int8 post-training quantization (models/quant.py).

The quantized serving path must stay numerically close to the f32 folded
forward (symmetric per-channel weights + calibrated per-position activation
scales) and support every graph op kind, including the full 3-head YOLOv3
graph's restore/concat/upsample routes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_vijnana_yolov3_tpu.models import darknet, quant
from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel


@pytest.fixture(scope="module")
def trunk_setup():
    m = FaceDetectorModel(image_size=96)
    params, state = m.init(jax.random.PRNGKey(0))
    folded = m.fold(params, state)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 96, 96, 3), jnp.float32)
    return m, params, state, folded, x


def test_quant_close_to_f32(trunk_setup):
    m, params, state, folded, x = trunk_setup
    q = m.quantize(folded, x)
    h_f32, _ = m.apply(params, state, x, train=False)
    h_q = m.apply_quant(q, x, head_dtype=jnp.float32)
    err = float(np.max(np.abs(np.asarray(h_q) - np.asarray(h_f32))))
    ref = float(np.max(np.abs(np.asarray(h_f32))))
    # 52 stacked int8 layers on a random-init net: a few percent relative.
    assert err / ref < 0.08, f"rel err {err / ref}"


def test_quant_structure(trunk_setup):
    m, _params, _state, folded, x = trunk_setup
    q = m.quantize(folded, x)
    assert len(q["act_scales"]) == len(m.ops) + 1
    # per-channel vectors: input is (3,), each position matches its C
    assert q["act_scales"][0].shape == (3,)
    assert all((s > 0).all() for s in q["act_scales"])
    assert q["act_scales"][-1].shape == (1024,)  # trunk output
    for op in m.ops:
        if op[0] != "conv":
            continue
        entry = q[f"conv_{op[1]}"]
        assert entry["kernel_q"].dtype == np.int8
        assert int(np.abs(entry["kernel_q"]).max()) <= 127
        # per-out-channel scale
        assert entry["w_scale"].shape == (entry["kernel_q"].shape[-1],)
        # every nonzero channel uses most of the int8 range (residual-end
        # convs fold to all-zero kernels at random init — gamma starts 0)
        maxima = np.abs(entry["kernel_q"]).max(axis=(0, 1, 2))
        assert ((maxima >= 126) | (maxima == 0)).all()


def test_quant_weight_roundtrip(trunk_setup):
    m, _params, _state, folded, x = trunk_setup
    q = m.quantize(folded, x)
    folded_host = jax.device_get(folded)
    k = np.asarray(folded_host["conv_0"]["kernel"], np.float32)
    # the stored kernel carries the folded per-input-channel activation scale
    k = k * q["act_scales"][0][None, None, :, None]
    kq = q["conv_0"]["kernel_q"].astype(np.float32) * q["conv_0"]["w_scale"]
    # dequantized weights within half a quantization step
    assert np.max(np.abs(k - kq)) <= 0.51 * q["conv_0"]["w_scale"].max()


def test_quant_full_yolov3_graph_runs():
    """restore/concat/upsample route coverage via the 3-head demo graph."""
    ops = darknet.yolov3_graph()
    params, state = darknet.init_graph_params(ops, jax.random.PRNGKey(0))
    folded = darknet.fold_graph_params(params, state, ops)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 96, 3), jnp.float32)
    q = quant.quantize_folded(folded, x, ops)
    outs_q = quant.apply_graph_quant(q, x, ops)
    outs_f = darknet.apply_graph_folded(folded, x, ops, compute_dtype=jnp.float32)
    assert set(outs_q) == {"yolo_82", "yolo_94", "yolo_106"}
    for k in outs_q:
        assert outs_q[k].shape == outs_f[k].shape
        ref = float(np.max(np.abs(np.asarray(outs_f[k])))) + 1e-6
        err = float(np.max(np.abs(np.asarray(outs_q[k]) - np.asarray(outs_f[k]))))
        assert err / ref < 0.15, f"{k}: rel err {err / ref}"


def test_percentile_calibration_robust_to_outliers(trunk_setup):
    """percentile=99.9 calibration must (a) still produce a close forward on
    clean data and (b) give tighter input scales than maxabs when the
    calibration batch carries a lone outlier pixel."""
    m, params, state, folded, x = trunk_setup
    q_pct = m.quantize(folded, x, percentile=99.9)
    h_f32, _ = m.apply(params, state, x, train=False)
    h_q = m.apply_quant(q_pct, x, head_dtype=jnp.float32)
    err = float(np.max(np.abs(np.asarray(h_q) - np.asarray(h_f32))))
    ref = float(np.max(np.abs(np.asarray(h_f32))))
    assert err / ref < 0.08, f"rel err {err / ref}"

    x_out = np.asarray(x).copy()
    x_out[0, 0, 0, 0] = 1000.0  # lone hot pixel in channel 0
    s_max = m.quantize(folded, jnp.asarray(x_out))["act_scales"][0]
    s_pct = m.quantize(folded, jnp.asarray(x_out), percentile=99.9)["act_scales"][0]
    assert s_max[0] > 5.0   # maxabs stretched by the outlier
    assert s_pct[0] < 0.1   # percentile ignores it
    # per-channel: the clean channels never saw the outlier even under maxabs
    assert s_max[1] < 0.1 and s_max[2] < 0.1


def test_auto_calibration_picks_min_error_per_channel(trunk_setup):
    """percentile="auto" scores maxabs vs the clip candidates by actual int8
    round-trip MSE per channel: an outlier-poisoned channel gets the clipped
    scale (maxabs would crush its real range), clean channels keep maxabs
    (clipping would only add error) — the checkpoint-adaptive behavior that
    replaced the fragile fixed default (one trained artifact collapsed under
    maxabs, another under p99.99)."""
    m, params, state, folded, x = trunk_setup
    # (a) clean data: auto must match the forward as tightly as maxabs.
    q_auto = m.quantize(folded, x, percentile="auto")
    h_f32, _ = m.apply(params, state, x, train=False)
    h_q = m.apply_quant(q_auto, x, head_dtype=jnp.float32)
    err = float(np.max(np.abs(np.asarray(h_q) - np.asarray(h_f32))))
    ref = float(np.max(np.abs(np.asarray(h_f32))))
    assert err / ref < 0.08, f"rel err {err / ref}"

    # (b) lone hot pixel at a SMALL-N position (2*96*96 samples/channel):
    # clipping it to the bulk costs out^2/N of error while the stretched
    # maxabs grid only costs (out/127)^2/12 — maxabs is MSE-optimal whenever
    # N < 12*127^2 ~ 193k, and auto must agree with it EXACTLY (clean
    # channels trivially so).
    x_out = np.asarray(x).copy()
    x_out[0, 0, 0, 0] = 1000.0
    s_max = m.quantize(folded, jnp.asarray(x_out))["act_scales"][0]
    s_auto = m.quantize(folded, jnp.asarray(x_out),
                        percentile="auto")["act_scales"][0]
    # with the decisive-margin rule, hairline clip wins on clean channels
    # also fall back to maxabs — every channel matches maxabs exactly
    np.testing.assert_allclose(s_auto, s_max)

    # (c) the same lone outlier at a LARGE-N position (1024^2 = 1.05M
    # samples): clip error out^2/N ~ 8e-4 vs the stretched grid's bulk error
    # (out/127)^2/12 ~ 4.7e-3 — ratio ~0.17, past the decisive margin, so
    # auto must clip.
    rng = np.random.default_rng(0)
    a = rng.uniform(0.0, 1.0, (1, 1024, 1024, 3)).astype(np.float32)
    a[0, 0, 0, 0] = 30.0
    s_auto2 = quant.calibrate_folded(
        folded, jnp.asarray(a), [], percentile="auto")[0]
    s_max2 = quant.calibrate_folded(folded, jnp.asarray(a), [])[0]
    assert s_max2[0] > 0.2          # maxabs grid stretched to ~30/127
    assert s_auto2[0] < 0.02        # auto clips to the ~1.0 bulk range
    np.testing.assert_allclose(s_auto2[1:], s_max2[1:])  # clean: exact maxabs


def test_msegrid_calibration_deterministic_and_outlier_robust(trunk_setup):
    """percentile="msegrid" (the deterministic grid-search calibrator,
    quant.calibrate_folded_msegrid): (a) bit-identical scale vectors across
    repeated calibrations, (b) forward as tight as maxabs on clean data,
    (c) clips an outlier-poisoned large-N channel decisively while clean
    channels keep near-maxabs grids (mildest clip inside the tol window)."""
    m, params, state, folded, x = trunk_setup
    # (a) determinism: the VERDICT-r3 requirement behind the scheme
    s1 = quant.calibrate_folded(folded, x, m.ops, percentile="msegrid")
    s2 = quant.calibrate_folded(folded, x, m.ops, percentile="msegrid")
    assert all(np.array_equal(a, b) for a, b in zip(s1, s2))

    # (b) clean data: forward tracks f32 as tightly as the other schemes
    q = m.quantize(folded, x, percentile="msegrid")
    h_f32, _ = m.apply(params, state, x, train=False)
    h_q = m.apply_quant(q, x, head_dtype=jnp.float32)
    err = float(np.max(np.abs(np.asarray(h_q) - np.asarray(h_f32))))
    ref = float(np.max(np.abs(np.asarray(h_f32))))
    assert err / ref < 0.08, f"rel err {err / ref}"

    # (c) lone hot pixel at a LARGE-N position (1.05M samples/channel):
    # clip error out^2/N is far below the stretched grid's bulk error, so
    # msegrid must clip channel 0 to the bulk; clean channels stay within
    # one tol-window step of exact maxabs.
    rng = np.random.default_rng(0)
    a = rng.uniform(0.0, 1.0, (1, 1024, 1024, 3)).astype(np.float32)
    a[0, 0, 0, 0] = 30.0
    s_mse = quant.calibrate_folded(
        folded, jnp.asarray(a), [], percentile="msegrid")[0]
    s_max = quant.calibrate_folded(folded, jnp.asarray(a), [])[0]
    assert s_max[0] > 0.2          # maxabs grid stretched to ~30/127
    # the grid balances bulk rounding vs outlier clip error: a decisive
    # (>3x) clip below maxabs, though not all the way to the bulk (the
    # outlier's clip error keeps the true MSE minimum at a mild clip)
    assert s_mse[0] < 0.3 * s_max[0]
    # clean channels: at most one grid step below maxabs (mildest-clip rule)
    ratios = quant.msegrid_ratios()
    assert (s_mse[1:] >= s_max[1:] * ratios[-2] * 0.999).all()


def test_fused_residual_requant_matches_unfused(trunk_setup):
    """fuse_residual folds the 23 skip adds into conv epilogues with ONE
    requant to the post-add scale (half the rounding of the unfused form) —
    outputs must stay within one quantization step of the unfused path."""
    m, _params, _state, folded, x = trunk_setup
    q = m.quantize(folded, x)
    out_fused = quant.apply_graph_quant(q, x, m.ops, fuse_residual=True)["trunk"]
    out_plain = quant.apply_graph_quant(q, x, m.ops, fuse_residual=False)["trunk"]
    # Both end at the same final requant scale; values may differ by 1 step
    # at the handful of positions where single-vs-double rounding flips a bin.
    final_scale = q["act_scales"][-1]  # (1024,) per-channel
    diff = np.abs(np.asarray(out_fused) - np.asarray(out_plain))
    assert (diff <= 2.01 * final_scale + 1e-9).all(), diff.max()
    assert (diff > 0).mean() < 0.10  # overwhelmingly identical


def test_identifier_quant_embeddings_close():
    """int8 fid-extractor embeddings stay close to the live-BN f32 path
    (unit-norm vectors, so L2 distance is the right closeness measure)."""
    from face_vijnana_yolov3_tpu.models.identifier import FaceIdentifierModel

    m = FaceIdentifierModel(image_size=96)
    params, state = m.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 96, 96, 3), jnp.float32)
    folded = m.fold(params, state)
    q = m.quantize(folded, x)
    e_f32, _ = m.embed(params, state, x, train=False)
    e_q = m.embed_quant(q, x, dense_dtype=jnp.float32)
    e_fold = m.embed_folded(folded, x, compute_dtype=jnp.float32)
    assert np.allclose(np.asarray(e_fold), np.asarray(e_f32), atol=1e-3)
    dist = np.linalg.norm(np.asarray(e_q) - np.asarray(e_f32), axis=-1)
    norms = np.linalg.norm(np.asarray(e_q), axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-4)  # still unit-normalized
    assert dist.max() < 0.2, f"embedding drift {dist.max()}"


def test_identifier_embed_folded_f32_front():
    """bf16 folded embed with the f32-front guard (FiConf.bf16_f32_front)
    stays unit-normalized and close to the f32 folded embedding — the FI
    serving path's counterpart of the detector's bf16 trunk guard
    (models/identifier.embed_folded docstring)."""
    from face_vijnana_yolov3_tpu.models.identifier import FaceIdentifierModel

    m = FaceIdentifierModel(image_size=96)
    params, state = m.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 96, 96, 3), jnp.float32)
    folded = m.fold(params, state)
    e_ref = np.asarray(m.embed_folded(folded, x, compute_dtype=jnp.float32))
    e_guarded = np.asarray(
        m.embed_folded(
            folded, x, compute_dtype=jnp.bfloat16, f32_front_blocks=2
        ),
        np.float32,
    )
    assert np.allclose(np.linalg.norm(e_guarded, axis=-1), 1.0, atol=1e-2)
    dist = np.linalg.norm(e_guarded - e_ref, axis=-1)
    assert dist.max() < 0.2, f"guarded bf16 embedding drift {dist.max()}"


def test_pipeline_int8_auto_calibration(tmp_path):
    """precision='int8' pipeline auto-calibrates on the first batch and
    produces the same candidate contract as the f32 path."""
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline

    conf = FdConf(weights_path=str(tmp_path / "missing.weights"))
    conf.nn_arch.image_size = 96
    fd32 = FaceDetectorPipeline(conf)
    fd8 = FaceDetectorPipeline(conf, precision="int8")
    x = np.random.default_rng(0).uniform(0, 1, (2, 96, 96, 3)).astype(np.float32)
    c32, n32 = fd32.detect_batch(x)
    c8, n8 = fd8.detect_batch(x)
    assert fd8._qparams is not None
    assert c8.shape == c32.shape and n8.shape == n32.shape


def test_pipeline_int8_calibration_percentile_plumbing(tmp_path):
    """conf.int8_calib_percentile reaches model.quantize (default "auto" —
    fixed choices are checkpoint-dependent: maxabs collapsed one trained
    artifact, p99.99 another; scripts/probe_precision_ap.py)."""
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline

    seen = {}
    conf = FdConf(weights_path=str(tmp_path / "missing.weights"))
    conf.nn_arch.image_size = 96
    assert conf.int8_calib_percentile == "auto"  # adaptive default
    fd = FaceDetectorPipeline(conf, precision="int8")
    orig = fd.model.quantize

    def spy(folded, x_calib, *, percentile=None, **kw):
        seen["percentile"] = percentile
        return orig(folded, x_calib, percentile=percentile, **kw)

    fd.model.quantize = spy
    x = np.random.default_rng(1).uniform(0, 1, (2, 96, 96, 3)).astype(np.float32)
    fd.detect_batch(x)
    assert seen["percentile"] == "auto"

    conf.int8_calib_percentile = 0.0  # maxabs opt-out
    fd2 = FaceDetectorPipeline(conf, precision="int8")
    fd2.model.quantize = spy
    fd2.detect_batch(x)
    assert seen["percentile"] is None


def test_bf16_tail_mixed_precision():
    """quantize_folded(bf16_tail_blocks=N): the last N residual blocks run
    folded-bf16; outputs at least as close to f32 as full int8, boundary at a
    block opener, COCO graph rejected."""
    import pytest as _pytest

    from face_vijnana_yolov3_tpu.models import darknet, quant
    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel

    model = FaceDetectorModel(image_size=64)
    params, state = model.init(jax.random.PRNGKey(0))
    # make BN stats/params non-trivial so folding isn't identity
    rng = np.random.default_rng(0)
    for k in list(state):
        c = state[k]["mean"].shape[0]
        state[k] = {"mean": rng.normal(0, 0.2, c).astype(np.float32),
                    "var": rng.uniform(0.6, 1.4, c).astype(np.float32)}
    folded = model.fold(params, state)
    folded["head"] = params["head"]
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))

    want = np.asarray(model.apply_folded(folded, x, compute_dtype=jnp.float32))
    q_full = model.quantize(folded, x)
    got_full = np.asarray(model.apply_quant(q_full, x))
    q_tail = model.quantize(folded, x, bf16_tail_blocks=2)
    got_tail = np.asarray(model.apply_quant(q_tail, x))

    assert "tail_start" in q_tail and q_tail["tail_start"] < len(model.ops)
    # boundary is a block opener
    assert model.ops[q_tail["tail_start"]][0] == "save"
    # the tail convs are NOT in the int8 param set
    tail_convs = {k for k in q_tail["tail"]}
    assert tail_convs and all(k not in q_tail for k in tail_convs)
    err_full = np.abs(got_full - want).mean()
    err_tail = np.abs(got_tail - want).mean()
    assert err_tail <= err_full * 1.05  # tail never hurts

    with _pytest.raises(ValueError):
        quant.tail_start_index(darknet.yolov3_graph(), 1)


def test_pipeline_bf16_int8_front(tmp_path):
    """precision='bfloat16' + conf.bf16_front_mode='int8' (EXPERIMENTAL —
    measured harmful on trained checkpoints, see FdConf.bf16_front_mode):
    mechanism test that the front segments run calibrated int8 via the quant
    mixed-tail machinery, the rest folded bf16, auto-calibrated on the first
    batch like precision='int8'."""
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline

    conf = FdConf(weights_path=str(tmp_path / "missing.weights"))
    conf.nn_arch.image_size = 96
    conf.bf16_front_mode = "int8"
    fd32 = FaceDetectorPipeline(conf)
    fdh = FaceDetectorPipeline(conf, precision="bfloat16")
    assert fdh._hybrid_front
    x = np.random.default_rng(0).uniform(0, 1, (2, 96, 96, 3)).astype(np.float32)
    c32, n32 = fd32.detect_batch(x)
    ch, nh = fdh.detect_batch(x)
    assert fdh._qparams is not None
    assert ch.shape == c32.shape and nh.shape == n32.shape

    q = fdh._qparams
    n_blocks = sum(1 for op in fdh.model.ops if op[0] == "save")
    # default guard scope bf16_f32_front=2 -> int8 covers conv_0/1 + first
    # residual block; everything from the SECOND block opener runs bf16.
    assert q["tail_start"] == [i for i, op in enumerate(fdh.model.ops)
                               if op[0] == "save"][-(n_blocks - 1)]
    # int8 region = everything before the 2nd block opener: conv_0/1 + first
    # residual block (conv_2/3) + the stage-2 downsample conv_5 (conv_4 is an
    # add layer in reference numbering). Same boundary as the f32 guard:
    # quant.tail_start_index(ops, n-(front-1)) == darknet.front_end_index(
    # ops, front) == starts[front-1].
    assert all(f"conv_{i}" in q for i in (0, 1, 2, 3, 5))
    assert "conv_6" in q["tail"] and "conv_6" not in q
    # head runs bf16 from untouched f32 params, same as the f32-guard path
    np.testing.assert_array_equal(
        np.asarray(q["head"]["kernel"]),
        np.asarray(fdh.model.fold(fdh.params, fdh.state)["head"]["kernel"]))

    # hybrid head tracks the f32 head at bf16-tail tolerance on random weights
    folded = fdh.model.fold(fdh.params, fdh.state)
    want = np.asarray(fdh.model.apply_folded(
        folded, jnp.asarray(x), compute_dtype=jnp.float32))
    got = np.asarray(fdh.model.apply_quant(q, jnp.asarray(x)))
    assert np.abs(got - want).mean() < 0.05


def test_pipeline_bf16_int8_front_scope_follows_guard_knob(tmp_path):
    """bf16_f32_front=1 narrows the int8 region to conv_0/1 only."""
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline

    conf = FdConf(weights_path=str(tmp_path / "missing.weights"))
    conf.nn_arch.image_size = 96
    conf.bf16_front_mode = "int8"
    conf.bf16_f32_front = 1
    fdh = FaceDetectorPipeline(conf, precision="bfloat16")
    x = np.random.default_rng(1).uniform(0, 1, (2, 96, 96, 3)).astype(np.float32)
    fdh.detect_batch(x)
    q = fdh._qparams
    first_save = next(i for i, op in enumerate(fdh.model.ops)
                      if op[0] == "save")
    assert q["tail_start"] == first_save
    assert "conv_0" in q and "conv_1" in q
    assert "conv_2" not in q and "conv_2" in q["tail"]


def test_fi_embed_bf16_int8_front():
    """FI mirror of the detector's int8-front hybrid (FiConf.bf16_front_mode):
    bfloat16 embed auto-calibrates an int8 guard + folded-bf16 tail on the
    first batch; embeddings stay L2-normalized and track f32."""
    from face_vijnana_yolov3_tpu.api.config import Conf
    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )

    conf = Conf()
    for c in (conf.fi_conf, conf.fd_conf):
        c.weights_path = "missing.weights"
        c.nn_arch.image_size = 64
    conf.fi_conf.nn_arch.dense1_dim = 8
    conf.fi_conf.bf16_front_mode = "int8"
    fi = FaceIdentifierPipeline(conf, precision="bfloat16")
    assert fi._hybrid_front
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(4, 64, 64, 3)).astype(np.float32)
    e = fi.embed(x)
    assert fi._q_embed is not None and "tail_start" in fi._q_embed
    assert e.shape == (4, 8)
    assert np.allclose(np.linalg.norm(e, axis=-1), 1.0, atol=1e-2)
    e_ref = FaceIdentifierPipeline(conf).embed(x)  # f32 reference
    assert np.linalg.norm(e - e_ref, axis=-1).max() < 0.2


def test_selective_bf16_ops(trunk_setup):
    """quantize_folded(bf16_ops=...): named convs run as folded-bf16 islands
    inside the int8 walk — kernels stay un-quantized for those ops, the
    program still runs at every fuse_residual setting, the output moves vs
    full int8 (the island changes arithmetic), and device_put round-trips
    the index list (the pipeline stores qparams on device)."""
    m, _params, _state, folded, x = trunk_setup
    q0 = m.quantize(folded, x)
    qs = m.quantize(folded, x, bf16_ops=(1, 5, 12))
    assert qs["bf16_ops"] == [1, 5, 12]
    assert set(qs["bf16"]) == {"conv_1", "conv_5", "conv_12"}
    for i in (1, 5, 12):
        assert f"conv_{i}" not in qs  # not in the int8 set
    a = np.asarray(m.apply_quant(q0, x))
    b = np.asarray(m.apply_quant(qs, x))
    assert not np.array_equal(a, b)  # the islands changed the arithmetic
    # still close to f32 (the islands can only help)
    want = np.asarray(m.apply_folded(folded, x, compute_dtype=jnp.float32))
    assert np.abs(b - want).mean() <= np.abs(a - want).mean() * 1.1

    # device_put round-trip (the pipeline path): indices arrive as 0-d
    # device arrays and must still resolve
    qd = jax.device_put(qs)
    c = np.asarray(m.apply_quant(qd, x))
    np.testing.assert_array_equal(b, c)

    # unfused path handles islands too
    o1 = quant.apply_graph_quant(qs, x, m.ops, fuse_residual=False)["trunk"]
    assert np.isfinite(np.asarray(o1, np.float32)).all()

    with pytest.raises(ValueError, match="mutually exclusive"):
        m.quantize(folded, x, bf16_ops=(1,), bias_correct=True)


def test_int8_error_profile(trunk_setup):
    """int8_error_profile returns one finite relative error per int8 conv,
    and a deliberately poisoned kernel shows up as the top error."""
    m, _params, _state, folded, x = trunk_setup
    q = m.quantize(folded, x)
    prof = quant.int8_error_profile(q, folded, x, m.ops)
    n_convs = sum(1 for op in m.ops if op[0] == "conv")
    assert len(prof) == n_convs
    assert all(np.isfinite(v) and v >= 0 for v in prof.values())

    # poison conv_5's quantized kernel: its own error must dominate
    q_bad = {k: (dict(v) if isinstance(v, dict) else v)
             for k, v in q.items()}
    q_bad["conv_5"]["kernel_q"] = np.clip(
        q_bad["conv_5"]["kernel_q"].astype(np.int16) * 8, -127, 127
    ).astype(np.int8)
    prof_bad = quant.int8_error_profile(q_bad, folded, x, m.ops)
    assert max(prof_bad, key=lambda i: prof_bad[i]) == 5


def test_pipeline_bf16_front_auto(tmp_path, monkeypatch):
    """conf.bf16_f32_front="auto": the pipeline probes guard depths {0,1,2}
    on the first detect batch (detection-level self-check) and builds the
    detect program at the chosen depth; when no depth passes, the
    accuracy-safe depth 2 is kept (FaceDetectorPipeline.
    autoselect_bf16_front, VERDICT r3 #7)."""
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.models import quant as quant_mod

    conf = FdConf(weights_path=str(tmp_path / "missing.weights"))
    conf.nn_arch.image_size = 96
    conf.bf16_f32_front = "auto"
    fd = FaceDetectorPipeline(conf, precision="bfloat16")
    # >= 16 images: a smaller batch defers the probe (ADVICE r4). A random
    # checkpoint may yield zero f32 detections (inconclusive scorer), in
    # which case the probe defers up to 3 times before pinning depth 2 —
    # loop so the test pins either way.
    x = np.random.default_rng(0).uniform(
        0, 1, (16, 96, 96, 3)).astype(np.float32)
    for _ in range(3):
        fd.detect_batch(x)
        if hasattr(fd, "bf16_front_chosen"):
            break
    assert fd.bf16_front_chosen in (0, 1, 2)
    assert fd._bf16_front_depth() == fd.bf16_front_chosen
    assert fd.bf16_front_err is not None

    # forced-failure path: a scorer that rejects every depth -> fallback 2
    monkeypatch.setattr(quant_mod, "detection_box_f1_scorer",
                        lambda cfg: (lambda ref, cand: 1.0))
    fd2 = FaceDetectorPipeline(conf, precision="bfloat16")
    fd2.detect_batch(x)
    assert fd2.bf16_front_chosen == 2

    # explicit int depth is honored untouched
    conf.bf16_f32_front = 1
    fd3 = FaceDetectorPipeline(conf, precision="bfloat16")
    assert fd3._bf16_front_depth() == 1


def test_bias_correct_shrinks_mean_error(trunk_setup):
    """PTQ bias correction (quant.bias_correct_quant): the per-channel MEAN
    trunk-output error vs the f32 twin shrinks decisively; only biases change
    (same quantized kernels, scales, and program structure); the calibration
    batch's mean error at the trunk output is near-eliminated."""
    m, _params, _state, folded, x = trunk_setup
    q0 = m.quantize(folded, x)
    q1 = m.quantize(folded, x, bias_correct=True)

    # structure identical, kernels/scales untouched, biases moved
    for k in q0:
        if not k.startswith("conv_"):
            continue
        np.testing.assert_array_equal(q0[k]["kernel_q"], q1[k]["kernel_q"])
        np.testing.assert_array_equal(q0[k]["w_scale"], q1[k]["w_scale"])
    assert any(
        not np.array_equal(q0[k]["bias"], q1[k]["bias"])
        for k in q0 if k.startswith("conv_")
    )

    f = darknet.apply_graph_folded(folded, x, m.ops,
                                   compute_dtype=jnp.float32)["trunk"]
    o0 = quant.apply_graph_quant(q0, x, m.ops)["trunk"]
    o1 = quant.apply_graph_quant(q1, x, m.ops)["trunk"]
    m0 = float(np.abs(np.asarray(jnp.mean(o0 - f, axis=(0, 1, 2)))).mean())
    m1 = float(np.abs(np.asarray(jnp.mean(o1 - f, axis=(0, 1, 2)))).mean())
    assert m1 < 0.5 * m0, f"mean err {m0} -> {m1}: not a decisive shrink"
    # and the overall error must not get worse
    e0 = float(jnp.mean(jnp.square(o0 - f)))
    e1 = float(jnp.mean(jnp.square(o1 - f)))
    assert e1 < 1.1 * e0


def test_bias_correct_with_tail(trunk_setup):
    """Bias correction composes with the bf16 tail: correction covers the
    int8 section, the tail params are untouched, and the program runs."""
    m, _params, _state, folded, x = trunk_setup
    q = m.quantize(folded, x, bf16_tail_blocks=2, bias_correct=True)
    q0 = m.quantize(folded, x, bf16_tail_blocks=2)
    assert q["tail_start"] == q0["tail_start"]
    for k, v in q0["tail"].items():
        np.testing.assert_array_equal(v["bias"], q["tail"][k]["bias"])
    out = quant.apply_graph_quant(q, x, m.ops)["trunk"]
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_pipeline_bias_correct_plumbing(tmp_path):
    """FdConf.int8_bias_correct reaches quantize_folded through the detect
    pipeline's calibrate_int8."""
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline

    conf = FdConf(weights_path="missing.weights")
    conf.nn_arch.image_size = 64
    conf.int8_bias_correct = True
    fd = FaceDetectorPipeline(conf, precision="int8")
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    fd.calibrate_int8(imgs)
    q_bc = jax.device_get(fd._qparams)

    conf2 = FdConf(weights_path="missing.weights")
    conf2.nn_arch.image_size = 64
    fd2 = FaceDetectorPipeline(conf2, precision="int8")
    fd2.params, fd2.state = fd.params, fd.state  # same random trunk
    fd2.calibrate_int8(imgs)
    q_plain = jax.device_get(fd2._qparams)
    # at least one bias differs (the knob took effect), kernels identical
    ks = [k for k in q_bc if k.startswith("conv_")]
    assert any(
        not np.array_equal(q_bc[k]["bias"], q_plain[k]["bias"]) for k in ks
    )
    for k in ks:
        np.testing.assert_array_equal(q_bc[k]["kernel_q"],
                                      q_plain[k]["kernel_q"])


def test_quantize_autotail_selection_logic():
    """Self-checking calibration (models/quant.quantize_autotail): healthy
    checkpoints stay full-int8 after ONE check; collapsed ones escalate the
    bf16 tail, but only while escalation actually helps."""
    import numpy as np

    from face_vijnana_yolov3_tpu.models.quant import quantize_autotail

    class FakeModel:
        def __init__(self, errs):
            self.errs = errs
            self.quantize_calls = []

        def apply_folded(self, folded, x, compute_dtype=None):
            return np.ones((2, 4), np.float32)

        def quantize(self, folded, x, percentile=None, bf16_tail_blocks=0,
                     bias_correct=False):
            self.quantize_calls.append(bf16_tail_blocks)
            return {"tail": bf16_tail_blocks}

        def apply_quant(self, q, x):
            return np.ones((2, 4), np.float32) + self.errs[q["tail"]]

    # Healthy: error under threshold -> full int8, single candidate tried.
    m = FakeModel({0: 0.01, 2: 0.01, 4: 0.01, 5: 0.01, 6: 0.01, 8: 0.01})
    q, tail, err = quantize_autotail(m, None, None)
    assert tail == 0 and m.quantize_calls == [0]
    assert err == pytest.approx(0.01, rel=1e-3)

    # Collapsed full-int8, tail recovers: escalates to the first tail under
    # threshold.
    m = FakeModel({0: 0.5, 2: 0.3, 4: 0.05, 5: 0.2, 6: 0.2, 8: 0.2})
    q, tail, err = quantize_autotail(m, None, None)
    assert tail == 4 and err == pytest.approx(0.05, rel=1e-3)

    # Nothing helps enough: keeps full int8 (no pointless tail tax).
    m = FakeModel({0: 0.5, 2: 0.45, 4: 0.48, 5: 0.47, 6: 0.46, 8: 0.47})
    q, tail, err = quantize_autotail(m, None, None)
    assert tail == 0 and err == pytest.approx(0.5, rel=1e-3)

    # A candidate that MEETS the threshold wins even when it isn't a 30%
    # improvement over the (failing) best — ADVICE r3: the old rule
    # discarded the passing tail2 (0.045 vs 0.06*0.7=0.042) and served the
    # over-threshold tail0, which export_cli then needlessly rejected.
    m = FakeModel({0: 0.06, 2: 0.045, 4: 0.05, 5: 0.05, 6: 0.05, 8: 0.05})
    q, tail, err = quantize_autotail(m, None, None)
    assert tail == 2 and err == pytest.approx(0.045, rel=1e-3)

    # The bench-checkpoint shape (round-4 frontier): everything over
    # threshold, tails 5/6/8 cluster far below 0/2/4 — the margin picks
    # the CHEAPEST of the cluster (tail5), not the deepest.
    m = FakeModel({0: 0.17, 2: 0.17, 4: 0.17, 5: 0.08, 6: 0.08, 8: 0.09})
    q, tail, err = quantize_autotail(m, None, None)
    assert tail == 5 and err == pytest.approx(0.08, rel=1e-3)


def test_detection_box_f1_scorer():
    """Detection-level self-check metric: identical heads score 0; a head
    whose confident cells vanish scores 1 (regardless of raw-tensor
    closeness)."""
    import numpy as np

    from face_vijnana_yolov3_tpu.models.quant import detection_box_f1_scorer
    from face_vijnana_yolov3_tpu.ops.postprocess import FacePostprocessConfig

    cfg = FacePostprocessConfig(image_size=416, grid=13, conf_th=0.5,
                                nms_iou_th=0.5, num_cands=60)
    scorer = detection_box_f1_scorer(cfg)
    head = np.full((2, 13, 13, 6), -6.0, np.float32)  # sigmoid ≈ 0: no boxes
    head[0, 6, 6] = [4.0, 0.5, 0.5, 0.3, 0.3, 4.0]    # one confident cell
    head[1, 2, 9] = [4.0, 0.5, 0.5, 0.2, 0.2, 4.0]
    assert scorer(head, head.copy()) == 0.0

    # tiny raw-tensor change, catastrophic detection change: confidence off
    dead = head.copy()
    dead[0, 6, 6, 0] = -6.0
    dead[1, 2, 9, 0] = -6.0
    assert scorer(head, dead) == 1.0

    # no boxes on either side = agreement, not failure
    none = np.full((2, 13, 13, 6), -6.0, np.float32)
    assert scorer(none, none.copy()) == 0.0


def test_bf16_front_auto_defers_on_small_batch(tmp_path):
    """ADVICE r4 (medium): a single-image / tiny detect call must NOT narrow
    the bf16 accuracy guard — the probe defers (serves depth 2 unpinned) so a
    later representative batch can decide."""
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline

    conf = FdConf(weights_path=str(tmp_path / "missing.weights"))
    conf.nn_arch.image_size = 96
    conf.bf16_f32_front = "auto"
    fd = FaceDetectorPipeline(conf, precision="bfloat16")
    x_small = np.random.default_rng(1).uniform(
        0, 1, (1, 96, 96, 3)).astype(np.float32)
    fd.detect_batch(x_small)
    assert not hasattr(fd, "bf16_front_chosen")  # unpinned
    assert fd._bf16_front_depth() == 2           # conservative while deferred
    # later >=16-image batches run the real probe and pin — either via a
    # conclusive verdict or via the 3-attempt inconclusive cap
    x_big = np.random.default_rng(2).uniform(
        0, 1, (16, 96, 96, 3)).astype(np.float32)
    for _ in range(3):
        fd.detect_batch(x_big)
        if hasattr(fd, "bf16_front_chosen"):
            break
    assert fd.bf16_front_chosen in (0, 1, 2)


def test_bf16_front_auto_inconclusive_scorer_keeps_guard(tmp_path,
                                                         monkeypatch):
    """ADVICE r4 (medium): when the f32 reference finds zero detections the
    scorer falls back to NRMSE and flags itself inconclusive — a vacuous
    NRMSE pass must NOT remove the guard; after 3 such probes the
    conservative depth 2 pins."""
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.models import quant as quant_mod

    def fake_scorer_factory(cfg):
        def scorer(ref, cand):
            scorer.inconclusive = True  # simulate the zero-detection path
            return 0.0                  # vacuous "pass"

        scorer.inconclusive = False
        return scorer

    monkeypatch.setattr(quant_mod, "detection_box_f1_scorer",
                        fake_scorer_factory)
    conf = FdConf(weights_path=str(tmp_path / "missing.weights"))
    conf.nn_arch.image_size = 96
    conf.bf16_f32_front = "auto"
    fd = FaceDetectorPipeline(conf, precision="bfloat16")
    x = np.random.default_rng(3).uniform(
        0, 1, (16, 96, 96, 3)).astype(np.float32)
    for i in range(3):
        d, _ = fd.autoselect_bf16_front(x)
        assert d == 2
    # pinned to the conservative guard after 3 inconclusive attempts
    assert fd.bf16_front_chosen == 2


def test_scorer_sets_inconclusive_flag(trunk_setup):
    """detection_box_f1_scorer flags the NRMSE fallback (zero f32
    detections) as inconclusive and clears the flag on conclusive calls."""
    import warnings

    from face_vijnana_yolov3_tpu.ops.postprocess import FacePostprocessConfig

    m, _params, _state, _folded, _x = trunk_setup
    grid = m.image_size // 32
    cfg = FacePostprocessConfig(image_size=m.image_size, grid=grid)
    scorer = quant.detection_box_f1_scorer(cfg)
    assert scorer.inconclusive is False
    # all-negative heads: no detections anywhere -> NRMSE fallback
    dead = np.full((2, grid, grid, 6), -8.0, np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        scorer(dead, dead)
    assert scorer.inconclusive is True
    # confident center cell in the reference -> conclusive box-F1 path
    live = dead.copy()
    live[:, grid // 2, grid // 2] = [8.0, 0.5, 0.5, 0.5, 0.5, 8.0]
    scorer(live, live)
    assert scorer.inconclusive is False


def test_int8_error_profile_with_islands_and_tail0(trunk_setup):
    """ADVICE r4 (low): the profile must handle qparams built with bf16_ops
    islands (island convs have no conv_i int8 entry — they are dequant-walked
    and excluded from the result) and must read tail_start=0 as a real value,
    not as 'no tail'."""
    m, _params, _state, folded, x = trunk_setup
    q = m.quantize(folded, x, bf16_ops=(5,))
    prof = quant.int8_error_profile(q, folded, x, m.ops)
    n_convs = sum(1 for op in m.ops if op[0] == "conv")
    assert len(prof) == n_convs - 1 and 5 not in prof
    assert all(np.isfinite(v) and v >= 0 for v in prof.values())

    q2 = {k: v for k, v in m.quantize(folded, x).items()}
    q2["tail_start"] = 0  # degenerate: everything is tail
    assert quant.int8_error_profile(q2, folded, x, m.ops) == {}
