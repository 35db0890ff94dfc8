"""Generalized advantage estimation as a parallel associative scan.

TPU-native equivalent of the reference's `calc_gae` (`dreamer4.py:1566-1600`),
which reaches a CUDA scan through the `assoc_scan` package. On TPU the natural
implementation is `jax.lax.associative_scan`, which XLA lowers to a
log-depth scan entirely on-device.

The recurrence is gae_t = delta_t + gate_t * gae_{t+1} (reverse first-order
linear recurrence), expressed with the associative operator
  (a1, b1) . (a2, b2) = (a1*a2, b2 + a2*b1)
over elements (gate, delta) scanned in reverse.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_recurrence_scan(gates: jax.Array, values: jax.Array, reverse: bool = False, axis: int = -1) -> jax.Array:
    """Solve h_t = gate_t * h_{t-1 (or t+1 if reverse)} + values_t in parallel."""

    def combine(x, y):
        a1, b1 = x
        a2, b2 = y
        return a1 * a2, b2 + a2 * b1

    axis = axis % gates.ndim
    _, out = jax.lax.associative_scan(combine, (gates, values), reverse=reverse, axis=axis)
    return out


def calc_gae(
    rewards: jax.Array,     # (b, t)
    values: jax.Array,      # (b, t)
    masks: jax.Array | None = None,        # (b, t) continuation mask
    learn_masks: jax.Array | None = None,  # (b, t) zero delta outside
    gamma: float = 0.99,
    lam: float = 0.95,
) -> jax.Array:
    """Returns `returns = gae + values` (reference semantics, `dreamer4.py:1566-1600`)."""
    rewards = jax.lax.stop_gradient(rewards)
    values = jax.lax.stop_gradient(values)

    if masks is None:
        masks = jnp.ones_like(values)
    masks = masks.astype(values.dtype)

    values_next = jnp.concatenate([values[..., 1:], jnp.zeros_like(values[..., :1])], axis=-1)

    delta = rewards + gamma * values_next * masks - values

    if learn_masks is not None:
        delta = jnp.where(learn_masks, delta, 0.0)

    gates = gamma * lam * masks

    gae = linear_recurrence_scan(gates, delta, reverse=True, axis=-1)

    return gae + values
