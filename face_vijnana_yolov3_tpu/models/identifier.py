"""Face identifier: shared-trunk triplet embedder + single-input fid extractor.

Capability-equivalent to the reference FaceIdentifier
(reference src/space/face_identification.py:316-395): three 416² inputs share one
trunk, Flatten (13·13·1024 = 173056) → Dense(dense1_dim=64, relu) → L2 normalize;
triplet outputs concatenate to 192 and train with
triplet_loss = mean(max(‖a−p‖ − ‖a−n‖ + 0.2, 0)) (:72-76).

TPU-first difference: the reference calls the trunk three times per triplet
(three Keras graph branches); here anchor/positive/negative stack into ONE batch of
3B images for a single trunk forward — one big MXU workload instead of three small
ones — then split. The fid extractor is just `embed` with no submodel surgery
(the reference rebuilds a single-input Model by layer reuse, :378-395).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from face_vijnana_yolov3_tpu.models import darknet

TRIPLET_ALPHA = 0.2  # reference ALPHA (face_identification.py:67)
L2_NORM_EPS = 1e-12  # K.l2_normalize epsilon


class FaceIdentifierModel:
    def __init__(self, image_size: int = 416, dense1_dim: int = 64):
        self.image_size = image_size
        self.dense1_dim = dense1_dim
        self.ops = darknet.trunk_graph()
        self.flat_dim = (image_size // 32) ** 2 * 1024

    # -------------------------------------------------------------- params

    def init(self, rng: jax.Array):
        import numpy as np

        trunk_rng, dense_rng = jax.random.split(rng)
        params, state = darknet.init_graph_params(self.ops, trunk_rng)
        limit = float(jnp.sqrt(6.0 / (self.flat_dim + self.dense1_dim)))
        seed = int(np.asarray(jax.random.key_data(dense_rng)).ravel()[-1]) & 0x7FFFFFFF
        np_rng = np.random.default_rng(seed)
        params["dense1"] = {
            "kernel": np_rng.uniform(
                -limit, limit, (self.flat_dim, self.dense1_dim)
            ).astype(np.float32),
            "bias": np.zeros((self.dense1_dim,), np.float32),
        }
        return params, state

    def init_from_darknet(self, weights_path: str, rng: jax.Array):
        from face_vijnana_yolov3_tpu.core.weights import load_darknet_weights

        params, state = load_darknet_weights(weights_path, self.ops)
        fresh, _ = self.init(rng)
        params["dense1"] = fresh["dense1"]
        return params, state

    # -------------------------------------------------------------- forward

    def embed(self, params, state, x, *, train: bool = False,
              compute_dtype=jnp.float32, remat: bool = False,
              bn_momentum=None, fakequant: bool = False):
        """(B,S,S,3) → (B, dense1_dim) L2-normalized embeddings (fid extractor).

        fakequant: quantization-aware trunk forward (darknet.apply_graph) —
        the dense1/L2-normalize head stays full-precision exactly like the
        deployed int8 embed program (embed_quant serves a bf16 dense1 on the
        dequantized trunk feature)."""
        outs, new_state = darknet.apply_graph(
            params, state, x, self.ops, train=train,
            compute_dtype=compute_dtype, remat=remat, bn_momentum=bn_momentum,
            fakequant=fakequant,
        )
        feat = outs["trunk"]
        flat = feat.reshape(feat.shape[0], -1)  # Keras Flatten: (H,W,C) row-major
        precision = (
            jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        h = (
            jnp.dot(
                flat.astype(compute_dtype),
                params["dense1"]["kernel"].astype(compute_dtype),
                preferred_element_type=(
                    jnp.float32 if compute_dtype == jnp.float32 else None
                ),
                precision=precision,
            )
            + params["dense1"]["bias"]
        )
        h = jnp.maximum(h, 0.0)  # relu
        norm = jnp.sqrt(jnp.maximum(jnp.sum(h * h, axis=-1, keepdims=True),
                                    L2_NORM_EPS))
        return (h / norm).astype(jnp.float32), new_state

    # ---------------------------------------------------------- folded / int8

    def fold(self, params, state):
        """conv+BN folding of the trunk for the serving fast path."""
        folded = darknet.fold_graph_params(params, state, self.ops)
        folded["dense1"] = params["dense1"]
        return folded

    def _dense_l2norm(self, dense, feat, compute_dtype):
        flat = feat.reshape(feat.shape[0], -1).astype(compute_dtype)
        h = jnp.dot(
            flat,
            dense["kernel"].astype(compute_dtype),
            preferred_element_type=(
                jnp.float32 if compute_dtype == jnp.float32 else None
            ),
            # f32 precision contract: without HIGHEST the TPU lowers this
            # f32 matmul to bf16 passes (see similarity.match_embeddings).
            precision=(
                jax.lax.Precision.HIGHEST
                if compute_dtype == jnp.float32
                else jax.lax.Precision.DEFAULT
            ),
        ) + dense["bias"]
        h = jnp.maximum(h.astype(jnp.float32), 0.0)
        norm = jnp.sqrt(jnp.maximum(jnp.sum(h * h, axis=-1, keepdims=True),
                                    L2_NORM_EPS))
        return h / norm

    def embed_folded(self, folded, x, *, compute_dtype=jnp.bfloat16,
                     f32_front_blocks: int = 0):
        """f32_front_blocks: same trunk input-noise guard as the detector's
        bf16 serving path (darknet.apply_graph_folded docstring) — trained
        trunks amplify bf16 rounding of conv_0/1 on rare inputs, which here
        rotates the L2-normalized embedding."""
        front = (
            darknet.front_end_index(self.ops, f32_front_blocks)
            if f32_front_blocks else 0
        )
        outs = darknet.apply_graph_folded(
            folded, x, self.ops, compute_dtype=compute_dtype,
            f32_front_ops=front,
        )
        return self._dense_l2norm(folded["dense1"], outs["trunk"], compute_dtype)

    def quantize(self, folded, x_calib, *, percentile: float | None = None,
                 bf16_tail_blocks: int = 0, bias_correct: bool = False):
        """Calibrated int8 qparams for the trunk; dense1 stays bf16 (it is
        ~0.1% of the embed FLOPs and feeds the L2-normalize directly).

        bf16_tail_blocks: keep the LAST N residual blocks folded-bf16
        (quant.quantize_folded) — with N = n_blocks-(front-1) this is the
        bf16-with-int8-front-guard hybrid (FiConf.bf16_front_mode).
        bias_correct: see quant.bias_correct_quant."""
        from face_vijnana_yolov3_tpu.models import quant

        qparams = quant.quantize_folded(
            folded, x_calib, self.ops, percentile=percentile,
            bf16_tail_blocks=bf16_tail_blocks, bias_correct=bias_correct,
        )
        qparams["dense1"] = jax.device_get(folded["dense1"])
        return qparams

    def embed_quant(self, qparams, x, *, dense_dtype=jnp.bfloat16):
        from face_vijnana_yolov3_tpu.models import quant

        outs = quant.apply_graph_quant(qparams, x, self.ops)
        return self._dense_l2norm(qparams["dense1"], outs["trunk"], dense_dtype)

    def triplet_forward(self, params, state, anchors, positives, negatives, *,
                        train: bool = False, compute_dtype=jnp.float32,
                        remat: bool = False, fakequant: bool = False):
        """One fused forward of the [a;p;n] stack → (B, 3*dense1_dim) output."""
        b = anchors.shape[0]
        stacked = jnp.concatenate([anchors, positives, negatives], axis=0)
        emb, new_state = self.embed(
            params, state, stacked, train=train, compute_dtype=compute_dtype,
            remat=remat, fakequant=fakequant,
        )
        ea, ep, en = emb[:b], emb[b : 2 * b], emb[2 * b :]
        return jnp.concatenate([ea, ep, en], axis=-1), new_state

    # -------------------------------------------------------------- loss

    @staticmethod
    def triplet_loss(y_pred, alpha: float = TRIPLET_ALPHA, dim: int = 64):
        """mean(max(‖a−p‖ − ‖a−n‖ + α, 0)) over the batch
        (face_identification.py:72-76)."""
        a = y_pred[:, 0:dim]
        p = y_pred[:, dim : 2 * dim]
        n = y_pred[:, 2 * dim : 3 * dim]
        d_ap = jnp.sqrt(jnp.sum(jnp.square(a - p), axis=-1))
        d_an = jnp.sqrt(jnp.sum(jnp.square(a - n), axis=-1))
        return jnp.mean(jnp.maximum(d_ap - d_an + alpha, 0.0))
