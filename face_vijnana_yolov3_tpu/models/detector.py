"""Face detector: truncated Darknet-53 trunk + 6-channel linear conv head.

Capability-equivalent to the reference FaceDetector model
(reference src/space/face_detection.py:339-382): 416x416x3 → trunk (conv_0..73,
13x13x1024) → Conv2D(6, 3x3, 'same', linear) → 13x13x6
[obj, bx, by, bw, bh, score] raw logits. Trained with plain MSE against the
13x13x6 GT tensor, exactly as the reference compiles loss='mse'
(face_detection.py:381 — its fd_loss exists but is commented out; the
equivalent `fd_loss` ships below for surface parity, equally unused).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from face_vijnana_yolov3_tpu.models import darknet


def _head_conv(feat, head_params, compute_dtype):
    """3x3 'same' linear head conv, honoring the repo precision contract:
    f32 requests Precision.HIGHEST (the TPU default silently lowers f32
    matmul/conv to bf16, ~1e-2 logit error — enough to flip sigmoid/threshold
    decisions near face_conf_th); bf16 keeps the default single-pass MXU
    lowering with no preferred_element_type (see darknet._conv2d)."""
    if compute_dtype == jnp.float32:
        precision = jax.lax.Precision.HIGHEST
        preferred = jnp.float32
    else:
        precision = jax.lax.Precision.DEFAULT
        preferred = None
    h = jax.lax.conv_general_dilated(
        feat,
        head_params["kernel"].astype(compute_dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
        precision=precision,
    ) + head_params["bias"]
    return h.astype(jnp.float32)


class FaceDetectorModel:
    """Pure-functional face detector; params/state are explicit pytrees."""

    def __init__(self, image_size: int = 416, out_channels: int = 6):
        self.image_size = image_size
        self.out_channels = out_channels
        self.ops = darknet.trunk_graph()

    # -------------------------------------------------------------- params

    def init(self, rng: jax.Array):
        import numpy as np

        trunk_rng, head_rng = jax.random.split(rng)
        params, state = darknet.init_graph_params(self.ops, trunk_rng)
        fan_in = 3 * 3 * 1024
        fan_out = self.out_channels
        limit = float(jnp.sqrt(6.0 / (fan_in + fan_out)))  # glorot_uniform
        seed = int(np.asarray(jax.random.key_data(head_rng)).ravel()[-1]) & 0x7FFFFFFF
        np_rng = np.random.default_rng(seed)
        params["head"] = {
            "kernel": np_rng.uniform(
                -limit, limit, (3, 3, 1024, self.out_channels)
            ).astype(np.float32),
            "bias": np.zeros((self.out_channels,), np.float32),
        }
        return params, state

    def init_from_darknet(self, weights_path: str, rng: jax.Array):
        """Pretrained trunk from yolov3.weights + fresh head (reference __init__
        path when model_loading is false, face_detection.py:339-352)."""
        from face_vijnana_yolov3_tpu.core.weights import load_darknet_weights

        params, state = load_darknet_weights(weights_path, self.ops)
        fresh, _ = self.init(rng)
        params["head"] = fresh["head"]
        return params, state

    # -------------------------------------------------------------- forward

    def apply(self, params, state, x, *, train: bool = False,
              compute_dtype=jnp.float32, remat: bool = False,
              bn_momentum=None, fakequant: bool = False):
        """Returns ((B,13,13,6) head output, new_state).

        fakequant=True trains quantization-aware (darknet.apply_graph): the
        trunk carries int8 fake-quant noise at the serving requant positions;
        the head conv stays full-precision exactly like the deployed int8
        program (apply_quant serves a bf16 head on dequantized trunk
        features)."""
        outs, new_state = darknet.apply_graph(
            params, state, x, self.ops, train=train,
            compute_dtype=compute_dtype, remat=remat, bn_momentum=bn_momentum,
            fakequant=fakequant,
        )
        feat = outs["trunk"].astype(compute_dtype)
        return _head_conv(feat, params["head"], compute_dtype), new_state

    def fold(self, params, state):
        folded = darknet.fold_graph_params(params, state, self.ops)
        folded["head"] = params["head"]
        return folded

    def apply_folded(self, folded, x, *, compute_dtype=jnp.bfloat16,
                     f32_front_blocks: int = 0):
        """f32_front_blocks: keep the first N graph segments (1 = conv_0/1
        front pair, 2 = + first residual block) in strict f32 — the bf16
        trunk's input-noise sensitivity lives there (darknet.apply_graph_folded
        docstring; scripts/probe_bf16_degen.py)."""
        front = (
            darknet.front_end_index(self.ops, f32_front_blocks)
            if f32_front_blocks else 0
        )
        outs = darknet.apply_graph_folded(
            folded, x, self.ops, compute_dtype=compute_dtype,
            f32_front_ops=front,
        )
        feat = outs["trunk"].astype(compute_dtype)
        return _head_conv(feat, folded["head"], compute_dtype)

    # -------------------------------------------------------------- int8 serving

    def quantize(self, folded, x_calib, *, percentile: float | None = None,
                 bf16_tail_blocks: int = 0, act_scales=None,
                 bias_correct: bool = False, bf16_ops: tuple = ()):
        """Calibrated int8 qparams from folded params (models/quant.py).

        TPU-native serving optimization (no reference counterpart): int8 MXU
        is 2x bf16 peak on v5e and int8 activations halve HBM traffic.
        percentile: optional outlier-robust activation calibration.
        bf16_tail_blocks: keep the last N residual blocks in bf16 (mixed
        tail — trained checkpoints' late-layer outliers are the int8 AP
        gap, models/quant.py).
        act_scales: precomputed scale vectors (required after a QAT
        refinement so the deployed scales equal the trained-against ones).
        bias_correct: fold measured per-channel mean quantization error into
        the deployed biases (models/quant.bias_correct_quant).
        bf16_ops: conv indices served as folded-bf16 islands inside the
        int8 walk (selective damage-layer fallback, models/quant.py).
        """
        from face_vijnana_yolov3_tpu.models import quant

        return quant.quantize_folded(
            folded, x_calib, self.ops, percentile=percentile,
            bf16_tail_blocks=bf16_tail_blocks, act_scales=act_scales,
            bias_correct=bias_correct, bf16_ops=bf16_ops,
        )

    def apply_quant(self, qparams, x, *, head_dtype=jnp.bfloat16,
                    pallas_blocks: bool = False):
        """int8 trunk + bf16 head forward; same (B,13,13,6) f32 contract.

        pallas_blocks: run the 20 Pallas-eligible trunk residual blocks as
        fused VMEM-resident kernels (ops/pallas_block.py) — bit-exact vs the
        stock XLA int8 path."""
        from face_vijnana_yolov3_tpu.models import quant

        outs = quant.apply_graph_quant(qparams, x, self.ops,
                                       pallas_blocks=pallas_blocks)
        feat = outs["trunk"].astype(head_dtype)
        return _head_conv(feat, qparams["head"], head_dtype)

    # -------------------------------------------------------------- loss

    @staticmethod
    def loss(pred, gt):
        """Keras loss='mse' (face_detection.py:381): mean squared error over all
        elements (per-sample mean over the 13x13x6 tensor, then batch mean)."""
        return jnp.mean(jnp.square(pred - gt))


_K_EPSILON = 1e-7  # keras.backend.epsilon() in the reference's Keras 2.2.4


def _keras_binary_crossentropy(target, output):
    """K.binary_crossentropy(target, output, from_logits=False): clip the
    (probability-space) output to [eps, 1-eps], elementwise BCE."""
    output = jnp.clip(output, _K_EPSILON, 1.0 - _K_EPSILON)
    return -(target * jnp.log(output)
             + (1.0 - target) * jnp.log(1.0 - output))


def fd_loss(y_true, y_pred):
    """The reference's custom detector loss, defined but commented out of every
    compile (reference src/space/face_detection.py:59-64, :381) — shipped for
    surface parity, NOT used by training (the parity default is loss='mse',
    like the reference).

    Faithful quirks: BCE is applied to the RAW linear head channels as if they
    were probabilities (the clip to [1e-7, 1-1e-7] is what makes negative
    logits 'work'), and the box term is literally mean(sqrt(square(diff)))
    over channels 1:5 — |x| with sqrt's undefined gradient at 0.

    Returns the per-cell (…, 13, 13) loss map, un-reduced, exactly like the
    reference function (Keras applies the final mean in the training loop).
    """
    o_loss = _keras_binary_crossentropy(y_true[..., 0], y_pred[..., 0])
    l2_loss = jnp.mean(
        jnp.sqrt(jnp.square(y_true[..., 1:5] - y_pred[..., 1:5])), axis=-1
    )
    c_loss = _keras_binary_crossentropy(y_true[..., 5], y_pred[..., 5])
    return (o_loss + l2_loss + c_loss) / 3.0
