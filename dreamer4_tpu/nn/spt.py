"""Shifted patch tokenization with streaming time cache.

Equivalent of the reference `ShiftedPatchTokenization` (`dreamer4.py:3334-3386`):
per patch, concatenate the original plus 4 spatially-shifted copies (and
optionally 1 temporally-shifted copy), then linear-project + layernorm.

Input is channels-last video (b, t, h, w, c); output (b, t, hp, wp, dim).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _shift2d(x, dy, dx):
    """Shift spatial dims (axis 2=h, 3=w) by one pixel with zero padding."""
    h, w = x.shape[2], x.shape[3]
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    return x[:, :, 1 - dy:1 - dy + h, 1 - dx:1 - dx + w]


class ShiftedPatchTokenization(nn.Module):
    dim: int
    patch_size: int
    channels: int = 3
    temporal_shift: bool = True

    @nn.compact
    def __call__(self, video, time_cache=None, return_time_cache: bool = False):
        # video: (b, t, h, w, c)
        b, t, h, w, c = video.shape
        p = self.patch_size

        shifts = [video]
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            shifts.append(_shift2d(video, dy, dx))

        next_time_cache = None
        if self.temporal_shift:
            if time_cache is not None:
                padded = jnp.concatenate([time_cache, video], axis=1)
            else:
                padded = jnp.pad(video, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
            next_time_cache = padded[:, -1:]
            shifts.append(padded[:, :-1])

        x = jnp.concatenate(shifts, axis=-1)  # (b, t, h, w, c * segments)

        cs = x.shape[-1]
        x = x.reshape(b, t, h // p, p, w // p, p, cs)
        x = jnp.transpose(x, (0, 1, 2, 4, 3, 5, 6)).reshape(b, t, h // p, w // p, p * p * cs)

        x = nn.Dense(self.dim, name='proj')(x)
        x = nn.LayerNorm(use_bias=False, name='norm')(x)

        if return_time_cache:
            return x, next_time_cache
        return x
