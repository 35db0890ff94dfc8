"""Multi-token-prediction target gathering.

Equivalent of reference `create_multi_token_prediction_targets`
(`dreamer4.py:530-552`): for each position t gather the next `steps_future`
targets t..t+K-1 with a validity mask for positions past the sequence end.
Static shapes; the gather lowers to a single XLA gather.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def create_multi_token_prediction_targets(t: jax.Array, steps_future: int):
    """t: (b, seq, ...) -> targets (b, seq, steps, ...), mask (b, seq, steps)."""
    batch, seq_len = t.shape[:2]

    seq = jnp.arange(seq_len)
    steps = jnp.arange(steps_future)

    indices = seq[:, None] + steps[None, :]          # (seq, steps)
    mask = indices < seq_len
    indices = jnp.where(mask, indices, 0)

    out = t[:, indices]                              # (b, seq, steps, ...)
    mask = jnp.broadcast_to(mask[None], (batch, seq_len, steps_future))
    return out, mask
