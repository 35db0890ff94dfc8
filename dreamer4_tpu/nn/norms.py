"""Normalization layers."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.utils import l2norm


class RMSNorm(nn.Module):
    """Standard RMSNorm with learned scale (weight-decay friendly: param is
    stored as an offset from 1, matching the reference's MultiHeadRMSNorm
    convention for the per-head variant)."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (dim,))
        normed = x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-6)
        return normed * scale


class MultiHeadRMSNorm(nn.Module):
    """Per-head QK RMSNorm (reference `dreamer4.py:1663-1679`): l2-normalize
    per head then scale by (gamma + 1) * sqrt(dim_head)."""

    dim_head: int
    heads: int

    @nn.compact
    def __call__(self, x):  # (..., h, n, d)
        gamma = self.param('gamma', nn.initializers.zeros, (self.heads, self.dim_head))
        normed = l2norm(x)
        scale = (gamma + 1.0) * (self.dim_head ** 0.5)
        return normed * scale[..., :, None, :]
