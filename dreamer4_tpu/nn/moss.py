"""MOSS-style spatial video module with streaming time cache.

Capability equivalent of the reference's `vit_pytorch.vivit_with_moss.MOSS`
spatial modules, spliced into chosen transformer layers with their own caches
(`dreamer4.py:3193-3214`): a grid-shaped mixing block over (t, h, w) —
causal depthwise spatiotemporal conv + gated channel MLP — that refines the
spatial tokens between attention layers. Streaming decode carries the conv's
time cache.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .activations import get_activation
from .conv import CausalDepthwiseConv3d
from .norms import RMSNorm


class MOSS(nn.Module):
    dim: int
    kernel_size: int = 3
    expansion: float = 2.0
    activation: str = 'silu'

    @nn.compact
    def __call__(self, x, cache=None, return_cache: bool = False):
        """x: (b, t, h, w, d); cache: conv time cache."""
        out = CausalDepthwiseConv3d(self.dim, self.kernel_size, name='conv')(
            x, time_cache=cache, return_time_cache=True)
        x, next_cache = out

        # gated channel mixing
        h = RMSNorm(name='norm')(x)
        inner = int(self.dim * self.expansion)
        u = nn.Dense(inner * 2, name='proj_in')(h)
        a, g = jnp.split(u, 2, axis=-1)
        h = a * get_activation(self.activation)(g)
        x = x + nn.Dense(self.dim, name='proj_out')(h)

        if return_cache:
            return x, next_cache
        return x
