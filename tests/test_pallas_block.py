"""Fused Pallas int8 residual block (ops/pallas_block.py) vs the stock
XLA int8 path — bit-exactness contract, eligibility gating, and the
apply_graph_quant integration (interpret mode; CPU backend)."""

import jax.numpy as jnp
import numpy as np
import pytest

from face_vijnana_yolov3_tpu.models import quant
from face_vijnana_yolov3_tpu.ops.pallas_block import block_eligible


def _block_graph(rng, n_blocks, C, CH):
    """n_blocks chained residual blocks (save -> 1x1 -> 3x3 -> add)."""
    ops, folded, idx = [], {}, 0

    def add_conv(out_c, k, in_c):
        nonlocal idx
        ops.append(("conv", idx, out_c, k, 1, True, True))
        folded[f"conv_{idx}"] = {
            "kernel": jnp.asarray(rng.normal(0, 0.06, (k, k, in_c, out_c)),
                                  jnp.float32),
            "bias": jnp.asarray(rng.normal(0, 0.1, (out_c,)), jnp.float32)}
        idx += 1

    for _ in range(n_blocks):
        ops.append(("save", "skip"))
        add_conv(CH, 1, C)
        add_conv(C, 3, CH)
        ops.append(("add", "skip"))
    ops.append(("output", "trunk"))
    return ops, folded


@pytest.mark.parametrize("C,CH,H", [(256, 128, 6), (512, 256, 5), (1024, 512, 4)])
def test_block_bit_exact(C, CH, H):
    rng = np.random.default_rng(C)
    ops, folded = _block_graph(rng, 1, C, CH)
    x = rng.normal(0, 1, (2, H, H, C)).astype(np.float32)
    qp = quant.quantize_folded(folded, x, ops)
    ref = np.asarray(quant.apply_graph_quant(qp, x, ops)["trunk"])
    got = np.asarray(quant.apply_graph_quant(
        qp, x, ops, pallas_blocks=True, pallas_interpret=True)["trunk"])
    np.testing.assert_array_equal(ref, got)


def test_chained_blocks_bit_exact():
    """Two consecutive blocks: the first's int8 output feeds the second."""
    rng = np.random.default_rng(7)
    ops, folded = _block_graph(rng, 2, 256, 128)
    x = rng.normal(0, 1, (2, 6, 6, 256)).astype(np.float32)
    qp = quant.quantize_folded(folded, x, ops)
    ref = np.asarray(quant.apply_graph_quant(qp, x, ops)["trunk"])
    got = np.asarray(quant.apply_graph_quant(
        qp, x, ops, pallas_blocks=True, pallas_interpret=True)["trunk"])
    np.testing.assert_array_equal(ref, got)


def test_rectangular_spatial():
    """H != W exercises the row/col border masks independently."""
    rng = np.random.default_rng(3)
    ops, folded = _block_graph(rng, 1, 256, 128)
    x = rng.normal(0, 1, (2, 4, 7, 256)).astype(np.float32)
    qp = quant.quantize_folded(folded, x, ops)
    ref = np.asarray(quant.apply_graph_quant(qp, x, ops)["trunk"])
    got = np.asarray(quant.apply_graph_quant(
        qp, x, ops, pallas_blocks=True, pallas_interpret=True)["trunk"])
    np.testing.assert_array_equal(ref, got)


def test_full_trunk_bit_exact():
    """The real trunk graph (darknet.trunk_graph) end-to-end: all 20 eligible
    blocks take the Pallas path, interleaved with the stride-2 stage convs
    and the 3 ineligible stage-1/2 blocks, at a 64^2 input."""
    import jax

    from face_vijnana_yolov3_tpu.models import darknet
    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel

    m = FaceDetectorModel(image_size=64)
    params, state = m.init(jax.random.PRNGKey(0))
    folded = m.fold(params, state)
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    qp = m.quantize(folded, x)
    ref = np.asarray(quant.apply_graph_quant(qp, x, m.ops)["trunk"])
    got = np.asarray(quant.apply_graph_quant(
        qp, x, m.ops, pallas_blocks=True, pallas_interpret=True)["trunk"])
    np.testing.assert_array_equal(ref, got)


def test_eligibility():
    # stage-1/2 shapes must NOT take the Pallas path
    assert not block_eligible(64, 32)
    assert not block_eligible(128, 64)
    assert block_eligible(256, 128)
    assert block_eligible(512, 256)
    assert block_eligible(1024, 512)


def test_ineligible_blocks_fall_through():
    """A stage-2 shaped block with pallas_blocks=True must still run (stock
    path) and match exactly."""
    rng = np.random.default_rng(11)
    ops, folded = _block_graph(rng, 1, 128, 64)
    x = rng.normal(0, 1, (2, 6, 6, 128)).astype(np.float32)
    qp = quant.quantize_folded(folded, x, ops)
    ref = np.asarray(quant.apply_graph_quant(qp, x, ops)["trunk"])
    got = np.asarray(quant.apply_graph_quant(
        qp, x, ops, pallas_blocks=True, pallas_interpret=True)["trunk"])
    np.testing.assert_array_equal(ref, got)


def test_roll_shift_mode_bit_exact():
    """The round-5 "roll" formulation (unshifted tap matmuls + int32 sublane
    rotates) must be bit-exact vs both the stock XLA path and the concat
    kernel — int32 tap adds commute, nothing else changes."""
    rng = np.random.default_rng(7)
    ops, folded = _block_graph(rng, 2, 256, 128)
    x = rng.normal(0, 1, (2, 6, 6, 256)).astype(np.float32)
    qp = quant.quantize_folded(folded, x, ops)
    ref = np.asarray(quant.apply_graph_quant(qp, x, ops)["trunk"])
    out = np.asarray(quant.apply_graph_quant(
        qp, x, ops, pallas_blocks=True, pallas_interpret=True,
        pallas_shift_mode="roll")["trunk"])
    np.testing.assert_array_equal(ref, out)
