"""Polar positional embeddings (PoPE) — learned per-head rotary phases.

Capability equivalent of the reference's `PoPE_pytorch` dependency
(`PoPE`, `AxialPoPE`, used at `dreamer4.py:2806-2812, 2039-2040`): rotary
rotations whose frequencies are *learned per attention head* rather than
fixed, for the time axis (1-D) and the spatial grid (2-D axial, half the
head dim per axis). Rotations compose with the fused attention kernel since
they are applied to q/k before attending.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _init_inv_freq(dim_half: int, theta: float = 10000.0) -> jnp.ndarray:
    return 1.0 / (theta ** (jnp.arange(0, dim_half, dtype=jnp.float32) / dim_half))


class PoPE(nn.Module):
    """1-D polar embedding: (heads, seq, dim_head) rotation angles."""

    dim_head: int
    heads: int
    theta: float = 10000.0

    @nn.compact
    def __call__(self, seq_len: int, offset=0) -> jax.Array:
        dim_half = self.dim_head // 2
        inv_freq = self.param(
            'inv_freq',
            lambda rng: jnp.broadcast_to(_init_inv_freq(dim_half, self.theta),
                                         (self.heads, dim_half)).copy())
        t = jnp.arange(seq_len, dtype=jnp.float32) + offset
        freqs = jnp.einsum('n,hf->hnf', t, inv_freq)
        return jnp.concatenate([freqs, freqs], axis=-1)  # (heads, seq, dim_head)


class AxialPoPE(nn.Module):
    """2-D axial polar embedding over an (H, W) grid with trailing identity
    positions for special tokens: (heads, H*W + num_special, dim_head)."""

    dim_head: int
    heads: int
    theta: float = 100.0

    @nn.compact
    def __call__(self, height: int, width: int, num_special: int = 0) -> jax.Array:
        dim_axis = self.dim_head // 4  # per-axis half-dim (duplicated like rotary)
        inv_freq_y = self.param(
            'inv_freq_y',
            lambda rng: jnp.broadcast_to(_init_inv_freq(dim_axis, self.theta),
                                         (self.heads, dim_axis)).copy())
        inv_freq_x = self.param(
            'inv_freq_x',
            lambda rng: jnp.broadcast_to(_init_inv_freq(dim_axis, self.theta),
                                         (self.heads, dim_axis)).copy())

        ys = jnp.arange(height, dtype=jnp.float32)
        xs = jnp.arange(width, dtype=jnp.float32)
        fy = jnp.einsum('n,hf->hnf', ys, inv_freq_y)   # (h, H, da)
        fx = jnp.einsum('n,hf->hnf', xs, inv_freq_x)   # (h, W, da)

        fy = jnp.broadcast_to(fy[:, :, None], (self.heads, height, width, dim_axis))
        fx = jnp.broadcast_to(fx[:, None, :], (self.heads, height, width, dim_axis))
        angles = jnp.concatenate([fy, fx], axis=-1).reshape(self.heads, height * width, -1)
        angles = jnp.concatenate([angles, angles], axis=-1)  # duplicate halves

        pad = self.dim_head - angles.shape[-1]
        if pad > 0:
            angles = jnp.pad(angles, ((0, 0), (0, 0), (0, pad)))
        if num_special > 0:
            # zero angle = identity rotation for non-grid (special) tokens
            angles = jnp.pad(angles, ((0, 0), (0, num_special), (0, 0)))
        return angles
