"""MLP building blocks.

Equivalents of the reference's `x_mlps_pytorch` dependency: `MLP`,
`create_mlp` (RMSNorm-prefixed), and `Ensemble` (vmapped head stacks, used
for the multi-token-prediction reward heads at `dreamer4.py:5072-5075` —
on TPU the ensemble is a single batched einsum over a leading head axis).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .activations import get_activation
from .norms import RMSNorm


class MLP(nn.Module):
    """Linear stack: dim_in -> hidden dims -> dim_out with activation between."""

    hidden_dims: Sequence[int]
    dim_out: int
    activation: str | Callable = 'silu'
    use_rmsnorm: bool = False
    final_bias: bool = True

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        if self.use_rmsnorm:
            x = RMSNorm()(x)
        for h in self.hidden_dims:
            x = nn.Dense(h)(x)
            x = act(x)
        return nn.Dense(self.dim_out, use_bias=self.final_bias)(x)


def create_mlp(dim: int, depth: int, dim_out: int, activation='silu', use_rmsnorm: bool = True,
               name: str | None = None) -> MLP:
    """Normed MLP factory matching x_mlps_pytorch.normed_mlp.create_mlp usage."""
    return MLP(hidden_dims=(dim,) * depth, dim_out=dim_out, activation=activation,
               use_rmsnorm=use_rmsnorm, name=name)


class EnsembleHead(nn.Module):
    """num_heads independent (RMSNorm -> Linear) heads over the same input,
    evaluated as one einsum: out[e] = norm_e(x) @ W_e.

    Output shape: (num_heads, ..., dim_out)."""

    num_heads: int
    dim_out: int
    use_rmsnorm: bool = True

    @nn.compact
    def __call__(self, x):  # (..., d)
        dim = x.shape[-1]
        if self.use_rmsnorm:
            scale = self.param('norm_scale', nn.initializers.ones, (self.num_heads, dim))
            normed = x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-6)
            x_e = normed[None] * scale.reshape(self.num_heads, *(1,) * (x.ndim - 1), dim)
        else:
            x_e = jnp.broadcast_to(x[None], (self.num_heads, *x.shape))
        w = self.param('kernel', nn.initializers.lecun_normal(), (self.num_heads, dim, self.dim_out))
        return jnp.einsum('e...d,edo->e...o', x_e, w)
