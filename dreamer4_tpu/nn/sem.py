"""Simplicial embeddings (reference `SEM`, `dreamer4.py:904-941`;
Lavoie et al, arXiv 2204.00616): grouped softmax bottleneck."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class SEM(nn.Module):
    dim: int
    dim_in: int | None = None
    project_in: bool | None = None
    project_out: bool | None = None
    temperature: float = 0.1
    dim_simplex: int = 8
    pre_layernorm: bool = False

    @nn.compact
    def __call__(self, t):
        assert self.dim % self.dim_simplex == 0
        dim_in = self.dim_in if self.dim_in is not None else self.dim
        project_in = self.project_in if self.project_in is not None else dim_in != self.dim
        project_out = self.project_out if self.project_out is not None else dim_in != self.dim

        if project_in:
            t = nn.Dense(self.dim, use_bias=False, name='embedder')(t)
        if self.pre_layernorm:
            t = nn.LayerNorm(use_bias=False, name='norm')(t)

        shape = t.shape
        t = t.reshape(*shape[:-1], shape[-1] // self.dim_simplex, self.dim_simplex)
        t = jax.nn.softmax(t / self.temperature, axis=-1)
        t = t.reshape(shape)

        if project_out:
            t = nn.Dense(dim_in, use_bias=False, name='project_out')(t)
        return t
