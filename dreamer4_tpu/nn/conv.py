"""Causal depthwise 3-D convolution with streaming time cache.

Equivalent of the reference `CausalDepthwiseConv3d` (`dreamer4.py:3269-3330`):
RMSNorm -> depthwise conv3d (causal in time, same-padded in space) ->
activation -> pointwise projection -> residual. The time cache carries the
last (kernel-1) frames for single-frame streaming.

Channels-last layout (b, t, h, w, c) — the TPU-native conv layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .activations import get_activation
from .norms import RMSNorm


class CausalDepthwiseConv3d(nn.Module):
    dim: int
    kernel_size: int = 3
    activation: str = 'silu'

    @nn.compact
    def __call__(self, x, time_cache=None, return_time_cache: bool = False):
        k = self.kernel_size
        assert k % 2 == 1
        causal_pad = k - 1
        spatial_pad = k // 2

        res = x
        x = RMSNorm(name='norm')(x)

        if time_cache is not None:
            x = jnp.concatenate([time_cache, x], axis=1)
        else:
            x = jnp.pad(x, ((0, 0), (causal_pad, 0), (0, 0), (0, 0), (0, 0)))

        next_time_cache = x[:, -causal_pad:] if return_time_cache else None

        # Depthwise conv as an unrolled shift-multiply-accumulate: grouped
        # convolutions lower poorly on TPU (measured ~100x slower), while k^3
        # shifted elementwise FMAs are pure VPU work that XLA fuses.
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (k, k, k, self.dim))
        bias = self.param('bias', nn.initializers.zeros, (self.dim,))

        b, t_pad, h, w, c = x.shape
        t_out = t_pad - causal_pad
        xs = jnp.pad(x, ((0, 0), (0, 0), (spatial_pad, spatial_pad),
                         (spatial_pad, spatial_pad), (0, 0)))
        out = jnp.zeros((b, t_out, h, w, c), x.dtype)
        for dz in range(k):
            for dy in range(k):
                for dx in range(k):
                    window = xs[:, dz:dz + t_out, dy:dy + h, dx:dx + w]
                    out = out + window * kernel[dz, dy, dx]
        x = out + bias

        x = get_activation(self.activation)(x)
        x = nn.Dense(self.dim, name='proj')(x)

        out = x + res
        if return_time_cache:
            return out, next_time_cache
        return out
