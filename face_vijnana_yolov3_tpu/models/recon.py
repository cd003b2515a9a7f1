"""Face reconstruction decoder (experimental, reference C24 parity).

The reference inverts the identifier: 64-d facial id → l2norm → relu →
dense1ᵀ (with a RANDOM uniform bias — a reference quirk, src/space/
face_identification.py:1179-1180) → reshape 13x13x1024 → a mirrored chain of
Conv2DTranspose layers sharing the trunk conv kernels, each preceded by
leaky→l2norm→a *fresh* BatchNorm clone, with `subtract` skip inversions per
residual block and stride-2 transposes at the five downsampling stages
(face_identification.py:1155-1488). Gated by conf `face_vijana_recon_load`.

Here the decoder graph is *generated* by walking the trunk IR in reverse —
the reference hand-writes ~330 lines of per-stage layer surgery; the walk
reproduces its exact stage order (pairs (i, i-1) inside each block, strided
deconvs between blocks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from face_vijnana_yolov3_tpu.models import darknet


def recon_graph(trunk_ops=None) -> list[tuple]:
    """Reverse-walk the trunk IR into decoder ops.

    Returns ops: ('deconv', conv_idx, stride) | ('subtract',) — deconvs inside a
    residual block appear in (i, i-1) order followed by one subtract, matching
    the reference's reversed ranges.
    """
    trunk_ops = trunk_ops or darknet.trunk_graph()
    layout = {t[0]: t for t in darknet.conv_layout(trunk_ops)}
    out: list[tuple] = []
    block: list[int] | None = None
    for op in reversed(trunk_ops):
        kind = op[0]
        if kind == "add":
            block = []
        elif kind == "conv":
            idx = op[1]
            stride = layout[idx][4]
            if block is not None:
                block.append(idx)
            else:
                out.append(("deconv", idx, stride))
        elif kind == "save" and block is not None:
            for idx in block:
                out.append(("deconv", idx, layout[idx][4]))
            out.append(("subtract",))
            block = None
        # mark/output/restore: no decoder-side effect
    return out


class FaceReconstructionModel:
    def __init__(self, image_size: int = 416, dense1_dim: int = 64):
        self.image_size = image_size
        self.dense1_dim = dense1_dim
        self.trunk_ops = darknet.trunk_graph()
        self.ops = recon_graph(self.trunk_ops)
        self.grid = image_size // 32
        self.flat_dim = self.grid * self.grid * 1024
        self.layout = {t[0]: t for t in darknet.conv_layout(self.trunk_ops)}

    def init(self, rng: jax.Array, identifier_params: dict):
        """Decoder params: trunk kernels shared by reference, dense1ᵀ + random
        bias, fresh BN (gamma=1, beta=0, zero stats) per deconv.

        Host-side numpy init (repo rule): ~4 eager device arrays per deconv
        across ~72 deconvs would cost minutes of tiny-op compiles over a
        tunneled TPU; numpy arrays transfer lazily on first real use.
        """
        import numpy as np

        seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1]) & 0x7FFFFFFF
        np_rng = np.random.default_rng(seed)
        params: dict = {"dense1_t": {
            "kernel": np.asarray(identifier_params["dense1"]["kernel"]).T,
            "bias": np_rng.uniform(0.0, 1.0, (self.flat_dim,)).astype(np.float32),
        }}
        state: dict = {}
        for op in self.ops:
            if op[0] != "deconv":
                continue
            idx = op[1]
            params[f"deconv_{idx}"] = {
                "kernel": identifier_params[f"conv_{idx}"]["kernel"]
            }
            _, in_c, out_c, _k, _s, _bn = self.layout[idx]
            # BN clone normalizes the deconv INPUT (conv output side = out_c).
            params[f"rbnorm_{idx}"] = {
                "gamma": np.ones((out_c,), np.float32),
                "beta": np.zeros((out_c,), np.float32),
            }
            state[f"rbnorm_{idx}"] = {
                "mean": np.zeros((out_c,), np.float32),
                "var": np.ones((out_c,), np.float32),
            }
        return params, state

    def apply(self, params, state, z, *, train: bool = False):
        """(B, dense1_dim) facial ids → (B, image_size, image_size, 3)."""
        h = z.astype(jnp.float32)
        norm = jnp.sqrt(jnp.maximum(jnp.sum(h * h, -1, keepdims=True), 1e-12))
        h = h / norm
        h = jnp.maximum(h, 0.0)
        h = jnp.dot(h, params["dense1_t"]["kernel"],
                    preferred_element_type=jnp.float32,
                    # f32 precision contract (see similarity.match_embeddings)
                    precision=jax.lax.Precision.HIGHEST)
        h = h + params["dense1_t"]["bias"]
        h = h.reshape(-1, self.grid, self.grid, 1024)

        new_state = dict(state)
        skip = h
        for op in self.ops:
            if op[0] == "subtract":
                h = h - skip
                skip = h
                continue
            _, idx, stride = op
            bp, bs = params[f"rbnorm_{idx}"], state[f"rbnorm_{idx}"]
            h = jnp.where(h > 0, h, darknet.LEAKY_ALPHA * h)
            cn = jnp.sqrt(jnp.maximum(jnp.sum(h * h, -1, keepdims=True), 1e-12))
            h = h / cn
            if train:
                mean = jnp.mean(h, axis=(0, 1, 2))
                var = jnp.var(h, axis=(0, 1, 2))
                new_state[f"rbnorm_{idx}"] = {
                    "mean": bs["mean"] * darknet.BN_MOMENTUM
                    + mean * (1 - darknet.BN_MOMENTUM),
                    "var": bs["var"] * darknet.BN_MOMENTUM
                    + var * (1 - darknet.BN_MOMENTUM),
                }
            else:
                mean, var = bs["mean"], bs["var"]
            inv = jax.lax.rsqrt(var + darknet.BN_EPS)
            h = (h - mean) * (inv * bp["gamma"]) + bp["beta"]
            # Conv2DTranspose with the trunk's HWIO kernel: output channels =
            # the conv's input channels (transpose_kernel swaps I/O).
            h = jax.lax.conv_transpose(
                h,
                params[f"deconv_{idx}"]["kernel"],
                strides=(stride, stride),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=True,
            )
            if stride > 1:
                skip = h  # strided stages reset the skip (reference :1242 etc.)
        return h, new_state
