"""EMA shadow parameters (reference dependency `ema_pytorch.EMA`, used for
the tokenizer EMA model, BYOL targets and SelfFlow teachers). A pytree lerp."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def init_ema(params: Any) -> Any:
    return jax.tree.map(lambda p: p, params)


def update_ema(ema_params: Any, params: Any, decay: float = 0.999) -> Any:
    return jax.tree.map(lambda e, p: e * decay + p * (1.0 - decay), ema_params, params)
