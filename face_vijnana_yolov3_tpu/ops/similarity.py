"""Embedding ↔ subject-registry matching on device.

The reference computes one L2 distance per registered subject in a python loop per
detected box (src/space/face_identification.py:919-925). Here the whole batch of
query embeddings is matched against the full registry with a single distance-matrix
computation (one matmul on the MXU plus row/col norms), then argmin + threshold gate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def match_embeddings(queries: jnp.ndarray, registry: jnp.ndarray):
    """Match query embeddings against registered facial ids.

    Args:
      queries: (Q, D) float32 embeddings (L2-normalized by the model, like the
        reference's l2_norm_layer output).
      registry: (R, D) float32 registered mean embeddings
        (ref_facial_id_db.pickle values).

    Returns:
      best_idx:  (Q,) int32 argmin-distance registry row per query.
      best_dist: (Q,) float32 the min L2 distance (compare against hps['sim_th']).
    """
    q = queries.astype(jnp.float32)
    r = registry.astype(jnp.float32)
    # ||q - r||^2 = ||q||^2 + ||r||^2 - 2 q.r  — the cross term is one MXU matmul.
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)            # (Q,1)
    r2 = jnp.sum(r * r, axis=-1)[None, :]                  # (1,R)
    # Precision contract (CLAUDE.md): f32 matmuls request HIGHEST — the TPU
    # default lowers to bf16 passes, which drifted best-dist by ~1.2e-3 on
    # unit-norm embeddings (enough to flip near-tie argmins/sim_th gates vs
    # the host oracle; parity_gauntlet stage H caught it on-chip). The
    # matrix is tiny, so HIGHEST costs nothing.
    cross = jnp.dot(q, r.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(q2 + r2 - 2.0 * cross, 0.0)
    dist = jnp.sqrt(d2)
    best_idx = jnp.argmin(dist, axis=-1).astype(jnp.int32)
    best_dist = jnp.min(dist, axis=-1)
    return best_idx, best_dist
