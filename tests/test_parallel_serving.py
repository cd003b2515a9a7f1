"""Data-parallel int8 serving: DP-sharded fused detect == single-device.

The int8 trunk is integer arithmetic end-to-end, so the 8-way batch-sharded
program must reproduce the single-device JITTED program's outputs BITWISE on
the virtual CPU mesh — any deviation means GSPMD resharding touched the
values. (The reference is the jitted single-device program, not the eager
one: under jit XLA elides the head's f32→bf16→f32 convert pair into the conv
fusion, so eager differs from ANY jitted run by bf16 rounding — a jit-vs-eager
artifact, not a sharding one.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
from face_vijnana_yolov3_tpu.ops.postprocess import FacePostprocessConfig
from face_vijnana_yolov3_tpu.parallel import mesh as mesh_lib
from face_vijnana_yolov3_tpu.parallel.serving import detect_quant_dp


@pytest.fixture(scope="module")
def setup():
    model = FaceDetectorModel(image_size=64)
    params, state = model.init(jax.random.PRNGKey(0))
    folded = model.fold(params, state)
    rng = np.random.default_rng(3)
    calib = jnp.asarray(rng.uniform(size=(4, 64, 64, 3)), jnp.float32)
    qparams = model.quantize(folded, calib)
    images = jnp.asarray(rng.uniform(size=(8, 64, 64, 3)), jnp.float32)
    return model, qparams, images


def test_dp_int8_head_matches_single_device(setup):
    model, qparams, images = setup
    mesh = mesh_lib.make_mesh(8)
    fn = detect_quant_dp(model, mesh, qparams)
    head_dp = np.asarray(jax.device_get(fn(images)))
    head_1 = np.asarray(
        jax.jit(lambda q, im: model.apply_quant(q, im))(qparams, images)
    )
    np.testing.assert_array_equal(head_dp, head_1)


def test_dp_int8_postprocess_matches_single_device(setup):
    from face_vijnana_yolov3_tpu.ops.postprocess import face_postprocess

    model, qparams, images = setup
    cfg = FacePostprocessConfig(
        image_size=64, grid=2, conf_th=0.05, nms_iou_th=0.5, num_cands=8
    )
    mesh = mesh_lib.make_mesh(8)
    fn = detect_quant_dp(model, mesh, qparams, postprocess_cfg=cfg)
    cands_dp, counts_dp = jax.device_get(fn(images))
    cands_1, counts_1 = jax.device_get(
        jax.jit(
            lambda q, im: jax.vmap(lambda h: face_postprocess(h, cfg))(
                model.apply_quant(q, im)
            )
        )(qparams, images)
    )
    np.testing.assert_array_equal(np.asarray(counts_dp), np.asarray(counts_1))
    np.testing.assert_array_equal(np.asarray(cands_dp), np.asarray(cands_1))


def test_dp_int8_on_data_model_mesh(setup):
    """model_axis>1 meshes still serve DP over 'data' with the trunk
    replicated over 'model' — the layout the FI trainer's mesh uses."""
    model, qparams, images = setup
    mesh = mesh_lib.make_mesh(8, model_axis=2)
    fn = detect_quant_dp(model, mesh, qparams)
    head_dp = np.asarray(jax.device_get(fn(images)))
    head_1 = np.asarray(
        jax.jit(lambda q, im: model.apply_quant(q, im))(qparams, images)
    )
    np.testing.assert_array_equal(head_dp, head_1)


def test_dp_int8_mixed_tail_qparams(setup):
    """Mixed-tail qparams (int8_bf16_tail / hybrid front) carry a static
    tail_start op index; as a jit ARGUMENT it would arrive traced and crash
    (regression: TracerIntegerConversionError at quant.apply_graph_quant).
    detect_quant_dp captures qparams at build time instead."""
    model, _qparams, images = setup
    params, state = model.init(jax.random.PRNGKey(0))
    folded = model.fold(params, state)
    rng = np.random.default_rng(5)
    calib = jnp.asarray(rng.uniform(size=(4, 64, 64, 3)), jnp.float32)
    q_tail = model.quantize(folded, calib, bf16_tail_blocks=2)
    mesh = mesh_lib.make_mesh(8)
    fn = detect_quant_dp(model, mesh, q_tail)
    head_dp = np.asarray(jax.device_get(fn(images)), np.float32)
    head_1 = np.asarray(
        jax.jit(lambda im: model.apply_quant(q_tail, im))(images), np.float32
    )
    # The bf16 TAIL is not integer arithmetic: the partitioned program's
    # f32<->bf16 convert elision differs from the single-device program's
    # fusion choices, so equality here is bf16-drift-bounded, not bitwise
    # (the pure-int8 tests above ARE bitwise).
    np.testing.assert_allclose(head_dp, head_1, atol=0.02)
