"""Slot attention / inverted cross-attention.

Equivalents of the reference `InvertedCrossAttention` + `SlotAttention`
(`dreamer4.py:3388-3485`; Locatello et al. arXiv 2006.15055): softmax over
the query axis + L1 normalization, gated output, iterated with a feedforward
(and optional 1x1-conv spatial mixer). Used to initialize encoder latents or
decoder spatial tokens from content.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.utils import l1norm
from .activations import get_activation
from .attention import FeedForward
from .norms import RMSNorm


class InvertedCrossAttention(nn.Module):
    dim: int
    dim_context: int | None = None
    heads: int = 8
    dim_head: int = 64
    inverted_attention: bool = True
    pre_rmsnorm: bool = True

    @nn.compact
    def __call__(self, x, context):  # x: (B, n, d), context: (B, m, dc)
        if self.pre_rmsnorm:
            x = RMSNorm(name='norm')(x)

        inner = self.heads * self.dim_head
        scale = self.dim_head ** -0.5

        qg = nn.Dense(inner * 2, use_bias=False, name='to_qg')(x)
        kv = nn.Dense(inner * 2, use_bias=False, name='to_kv')(context)
        q, gate = jnp.split(qg, 2, axis=-1)
        k, v = jnp.split(kv, 2, axis=-1)

        split = lambda t: t.reshape(*t.shape[:-1], self.heads, self.dim_head).swapaxes(-3, -2)
        q, gate, k, v = split(q), split(gate), split(k), split(v)

        sim = jnp.einsum('...hid,...hjd->...hij', q, k) * scale

        if self.inverted_attention:
            attn = jax.nn.softmax(sim, axis=-2)  # over queries (slots compete)
            attn = l1norm(attn, axis=-1)
        else:
            attn = jax.nn.softmax(sim, axis=-1)

        out = jnp.einsum('...hij,...hjd->...hid', attn, v)
        out = out * jax.nn.sigmoid(gate)
        out = out.swapaxes(-3, -2).reshape(*x.shape[:-1], inner)
        return nn.Dense(self.dim, use_bias=False, name='to_out')(out)


class SlotAttention(nn.Module):
    dim: int
    dim_context: int | None = None
    iters: int = 2
    ff_mult: float = 4.0
    num_slots: int | None = None
    spatial_mix: bool = False
    spatial_mixer_activation: str = 'silu'
    inverted_attention: bool = True
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, latents, context):
        """latents: (..., n, d); context: (..., m, dc)."""
        lead = latents.shape[:-2]
        latents = latents.reshape(-1, *latents.shape[-2:])
        context = context.reshape(-1, *context.shape[-2:])

        attn = InvertedCrossAttention(
            dim=self.dim, dim_context=self.dim_context, heads=self.heads,
            dim_head=self.dim_head, inverted_attention=self.inverted_attention,
            name='attn')
        ff = FeedForward(dim=self.dim, expansion_factor=self.ff_mult, name='ff')

        mixer = None
        if self.spatial_mix:
            assert self.num_slots is not None
            hidden_slots = max(1, int(self.num_slots * 0.5))
            act = get_activation(self.spatial_mixer_activation)

            def make_mixer():
                norm = RMSNorm(name='mixer_norm')
                down = nn.Dense(hidden_slots, name='mixer_down')
                up = nn.Dense(self.num_slots, name='mixer_up')

                def apply(x):
                    # mix across the slot axis with 1x1 convs == dense over slots
                    h = norm(x)
                    h = jnp.swapaxes(h, -1, -2)       # (B, d, n)
                    h = up(act(down(h)))
                    return jnp.swapaxes(h, -1, -2)
                return apply
            mixer = make_mixer()

        for _ in range(self.iters):
            latents = latents + attn(latents, context)
            if mixer is not None:
                latents = latents + mixer(latents)
            latents = latents + ff(latents)

        return latents.reshape(*lead, *latents.shape[-2:])
