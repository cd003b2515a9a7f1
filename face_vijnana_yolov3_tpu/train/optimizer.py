"""Keras-2.2.4-semantics Adam as an optax GradientTransformation.

The reference compiles every model with
`optimizers.Adam(lr, beta_1, beta_2, decay)` (reference
src/space/face_detection.py:331-334, src/space/face_identification.py:308-311).
Keras 2.2.4 Adam differs from optax.adam in two details reproduced here:

* inverse-time decay on the base lr: lr_t = lr / (1 + decay * t);
* epsilon OUTSIDE the bias-corrected rsqrt: p -= a_t * m / (sqrt(v) + eps) with
  a_t = lr_t * sqrt(1 - b2^t) / (1 - b1^t), eps = 1e-7 (K.epsilon()).

optax.adam applies eps after dividing v-hat by its bias correction, which scales
eps by sqrt(1-b2^t) — a ~1e-8-level difference, but exactness is free here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class KerasAdamState(NamedTuple):
    count: jnp.ndarray  # int32 step counter (t-1)
    mu: optax.Updates
    nu: optax.Updates


def coerce_adam_state(obj) -> "KerasAdamState | None":
    """Rebuild a KerasAdamState from a checkpoint-restored plain dict
    (orbax restores NamedTuples as {'count','mu','nu'} without a target)."""
    if obj is None or isinstance(obj, KerasAdamState):
        return obj
    if isinstance(obj, dict) and {"count", "mu", "nu"} <= set(obj):
        return KerasAdamState(
            count=jnp.asarray(obj["count"]), mu=obj["mu"], nu=obj["nu"]
        )
    raise TypeError(f"unrecognized optimizer state: {type(obj)}")


def keras_adam(
    lr: float,
    beta_1: float = 0.99,
    beta_2: float = 0.99,
    decay: float = 0.0,
    epsilon: float = 1e-7,
) -> optax.GradientTransformation:
    def init_fn(params):
        return KerasAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        lr_t = lr / (1.0 + decay * t) if decay > 0 else lr
        a_t = lr_t * jnp.sqrt(1.0 - beta_2**t) / (1.0 - beta_1**t)
        mu = jax.tree.map(
            lambda m, g: beta_1 * m + (1.0 - beta_1) * g, state.mu, updates
        )
        nu = jax.tree.map(
            lambda v, g: beta_2 * v + (1.0 - beta_2) * jnp.square(g),
            state.nu,
            updates,
        )
        new_updates = jax.tree.map(
            lambda m, v: -a_t * m / (jnp.sqrt(v) + epsilon), mu, nu
        )
        return new_updates, KerasAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
