"""Normalization layers."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class RMSNorm(nn.Module):
    """Standard RMSNorm with learned scale (weight-decay friendly: param is
    stored as an offset from 1, matching the reference's MultiHeadRMSNorm
    convention for the per-head variant).

    The reduction runs in f32 for stability, but the output is cast back to
    the input dtype: the f32 `scale` param must not promote a bf16 residual
    stream to f32 (that silently doubled training HBM traffic and pushed the
    matmuls off the bf16 MXU path)."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (dim,))
        # f32 statistic, stream-dtype apply: never materializes a bf16
        # stream as f32 (for f32 inputs the casts are no-ops and the op
        # order matches the previous all-f32 form exactly)
        xf = x.astype(jnp.float32)
        inv = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + 1e-6)
        return x * inv.astype(x.dtype) * scale.astype(x.dtype)


class MultiHeadRMSNorm(nn.Module):
    """Per-head QK RMSNorm (reference `dreamer4.py:1663-1679`): l2-normalize
    per head then scale by (gamma + 1) * sqrt(dim_head). f32 internally,
    output in the input dtype (same promotion rule as RMSNorm)."""

    dim_head: int
    heads: int

    @nn.compact
    def __call__(self, x, layout: str = 'hnd'):
        """x: (..., h, n, d) for layout='hnd' (default), or the
        transpose-free (..., n, h, d) used by the small-attention path for
        layout='nhd' — the (h, d) gamma broadcasts over the last two axes
        there directly. Same params either way."""
        gamma = self.param('gamma', nn.initializers.zeros, (self.heads, self.dim_head))
        # f32 statistic, stream-dtype apply (see RMSNorm)
        xf = x.astype(jnp.float32)
        inv = jax.lax.rsqrt(jnp.sum(jnp.square(xf), axis=-1, keepdims=True) + 1e-12)
        scale = (gamma + 1.0) * (self.dim_head ** 0.5)
        if layout == 'nhd':
            return x * inv.astype(x.dtype) * scale.astype(x.dtype)
        return x * inv.astype(x.dtype) * scale[..., :, None, :].astype(x.dtype)
