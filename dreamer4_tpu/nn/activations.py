"""Activation registry (reference `dreamer4.py:554-576`).

Activations are plain jax functions; `register_activation` is the plugin hook.
`sugar_bsilu` implements B-SiLU with a SUGAR straight-through gradient
(forward ReLU, backward the smooth B-SiLU derivative) via custom_vjp.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

_BSILU_ALPHA = 1.67


def relu_squared(x):
    return jnp.square(jax.nn.relu(x))


@jax.custom_vjp
def sugar_bsilu(x):
    return jax.nn.relu(x)


def _sugar_bsilu_fwd(x):
    return jax.nn.relu(x), x


def _sugar_bsilu_bwd(x, g):
    # derivative of B-SiLU(x) = (x + a) σ(x) − a/2
    s = jax.nn.sigmoid(x)
    dbsilu = s + (x + _BSILU_ALPHA) * s * (1.0 - s)
    return (g * dbsilu,)


sugar_bsilu.defvjp(_sugar_bsilu_fwd, _sugar_bsilu_bwd)

ACTIVATIONS: dict[str, Callable] = {
    'silu': jax.nn.silu,
    'relu_squared': relu_squared,
    'sugar_bsilu': sugar_bsilu,
    'relu': jax.nn.relu,
    'gelu': jax.nn.gelu,
}


def register_activation(name: str, fn: Callable):
    ACTIVATIONS[name] = fn


def get_activation(act) -> Callable:
    if callable(act):
        return act
    assert act in ACTIVATIONS, f'activation {act} not found in {list(ACTIVATIONS)}'
    return ACTIVATIONS[act]
