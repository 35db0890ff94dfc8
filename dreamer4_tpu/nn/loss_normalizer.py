"""Loss normalizer as a linen state variable (reference `LossNormalizer`,
`dreamer4.py:629-669`). The EMA lives in the 'state' collection; training
applies with mutable=['state'] to thread the update."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.losses import apply_loss_normalizer


class LossNormalizer(nn.Module):
    num_losses: int = 1
    beta: float = 0.95

    @nn.compact
    def __call__(self, losses, update_ema: bool = True):
        state = self.variable('state', 'exp_avg_sq', lambda: jnp.ones((self.num_losses,)))
        normed, new_state = apply_loss_normalizer(state.value, losses, update_ema=update_ema, beta=self.beta)
        if update_ema and not self.is_initializing():
            state.value = new_state
        return normed.reshape(jnp.shape(losses))
