"""Hierarchical temporal transformer — TPU-native dynamic-chunking
equivalent.

The reference splices an H-Net (`h_net_dynamic_chunking.HNet` +
x_transformers Decoder) at a chosen layer to compress the time axis with
data-dependent chunk boundaries (`dreamer4.py:2737-2758, 3151-3170`).
Data-dependent ragged chunking is fundamentally hostile to XLA's static-shape
model (SURVEY.md section 7 'hard parts'), so this re-design keeps the
capability — learned, content-dependent temporal compression with an inner
transformer and a ratio auxiliary loss — with static shapes:

- time is divided into fixed-stride chunks of `compression_ratio` frames;
- each chunk is summarized by a *learned content-dependent* soft selection
  (scored softmax pooling within the chunk — the 'dynamic' part);
- a small causal transformer runs over chunk summaries;
- every position receives the summary-transformer output of the latest
  *completed* chunk strictly before it (block-causal), added through a gate;
- the ratio loss keeps selection scores informative (entropy penalty pushing
  within-chunk selection away from uniform), standing in for H-Net's
  boundary-ratio loss.

Streaming decode carries the inner transformer's KV cache plus a partial-
chunk buffer; the inner transformer steps once per completed chunk.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masks import build_attend_mask
from ..ops.rotary import rotary_frequencies
from .attention import Attention, FeedForward, KVCache
from .norms import RMSNorm


class HNetCache(NamedTuple):
    inner_kv: tuple            # per inner layer KVCache over chunk axis
    partial: jax.Array         # (B, R, d) in-progress chunk frames
    partial_count: jax.Array   # scalar int32 — frames in the partial buffer
    last_summary: jax.Array    # (B, d) inner output of the latest completed chunk
    has_summary: jax.Array     # scalar bool-ish float



class HierarchicalTemporalTransformer(nn.Module):
    dim: int
    depth: int = 2
    heads: int = 4
    dim_head: int = 32
    compression_ratio: int = 4

    def init_cache(self, batch: int, max_chunks: int, dtype=jnp.float32) -> HNetCache:
        return HNetCache(
            inner_kv=tuple(
                KVCache.create(batch, self.heads, max_chunks, self.dim_head, dtype=dtype)
                for _ in range(self.depth)),
            partial=jnp.zeros((batch, self.compression_ratio, self.dim), dtype=dtype),
            partial_count=jnp.zeros((), jnp.int32),
            last_summary=jnp.zeros((batch, self.dim), dtype=dtype),
            has_summary=jnp.zeros(()),
        )

    @nn.compact
    def __call__(self, x, cache: HNetCache | None = None):
        """x: (B, T, d) -> (out, ratio_loss, next_cache).

        Without a cache, T may be any length (training / prefill). With a
        cache, T must be 1 (streaming decode).
        """
        B, T, d = x.shape
        R = self.compression_ratio

        score_head = nn.Dense(1, name='to_scores')
        norm = RMSNorm(name='score_norm')
        gate_head = nn.Dense(self.dim, name='out_gate')
        proj_out = nn.Dense(self.dim, name='summary_out')

        def inner_block(i):
            return (
                Attention(dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                          value_residual=False, belief_attn=False,
                          name=f'inner_attn_{i}'),
                FeedForward(dim=self.dim, name=f'inner_ff_{i}'),
            )

        blocks = [inner_block(i) for i in range(self.depth)]

        zero_loss = jnp.zeros(())

        if cache is None:
            # ---------------- parallel path
            pad = (-T) % R
            xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            num_chunks = xp.shape[1] // R
            chunks = xp.reshape(B, num_chunks, R, d)

            scores = score_head(norm(chunks))[..., 0]            # (B, C, R)
            if pad > 0:
                valid = jnp.arange(num_chunks * R).reshape(num_chunks, R) < T
                scores = jnp.where(valid[None], scores, -1e30)
            weights = jax.nn.softmax(scores, axis=-1)
            summaries = jnp.einsum('bcr,bcrd->bcd', weights, chunks)

            # ratio/entropy aux loss: keep selection decisive (dynamic), not uniform
            entropy = -jnp.sum(weights * jnp.log(jnp.maximum(weights, 1e-9)), axis=-1)
            ratio_loss = jnp.mean(entropy) / jnp.log(float(R))

            h = summaries
            rot = rotary_frequencies(self.dim_head, num_chunks)
            mask = build_attend_mask(num_chunks, num_chunks, causal=True)
            for attn, ff in blocks:
                h = h + attn(h, rotary=rot, mask=mask).out
                h = h + ff(h)
            h = proj_out(h)                                       # (B, C, d)

            # each position reads the latest *completed* chunk before it
            pos_chunk = jnp.arange(T) // R                        # chunk of each position
            prev_chunk = pos_chunk - 1
            gathered = jnp.where(
                prev_chunk[None, :, None] >= 0,
                jnp.take_along_axis(
                    h, jnp.maximum(prev_chunk, 0)[None, :, None].repeat(B, 0), axis=1),
                0.0)
            gate = jax.nn.sigmoid(gate_head(x))
            out = x + gate * gathered
            return out, ratio_loss, None

        # ---------------- streaming path (T == 1)
        assert T == 1
        idx = cache.partial_count
        partial = jax.lax.dynamic_update_slice(cache.partial, x, (0, idx, 0))
        count = idx + 1

        complete = count >= R

        # chunk summary from the (possibly just-completed) partial buffer
        scores = score_head(norm(partial))[..., 0]                # (B, R)
        valid = jnp.arange(R)[None, :] < count
        scores = jnp.where(valid, scores, -1e30)
        weights = jax.nn.softmax(scores, axis=-1)
        summary = jnp.einsum('br,brd->bd', weights, partial)      # (B, d)

        # run the inner transformer step on the summary (cheap; its cache and
        # outputs only commit when the chunk completed)
        h = summary[:, None]
        new_inner_kv = []
        chunk_count = cache.inner_kv[0].length
        max_chunks = cache.inner_kv[0].k.shape[-2]
        rot = rotary_frequencies(self.dim_head, 1, offset=chunk_count)
        j = jnp.arange(max_chunks)[None, :]
        mask = j <= chunk_count
        for (attn, ff), kv in zip(blocks, cache.inner_kv):
            a = attn(h, kv_cache=kv, rotary=rot, mask=mask)
            h = h + a.out
            h = h + ff(h)
            # commit the cache write only when the chunk completed
            committed = jax.tree.map(
                lambda new, old: jnp.where(complete, new, old), a.cache, kv)
            committed = committed._replace(
                length=jnp.where(complete, a.cache.length, kv.length))
            new_inner_kv.append(committed)
        h = proj_out(h[:, 0])                                     # (B, d)

        new_summary = jnp.where(complete, h, cache.last_summary)
        new_has = jnp.maximum(cache.has_summary, complete.astype(jnp.float32))

        # output reads the latest completed chunk STRICTLY before this frame
        gathered = cache.last_summary * cache.has_summary
        gate = jax.nn.sigmoid(gate_head(x))
        out = x + gate * gathered[:, None]

        next_cache = HNetCache(
            inner_kv=tuple(new_inner_kv),
            partial=jnp.where(complete, jnp.zeros_like(partial), partial),
            partial_count=jnp.where(complete, 0, count),
            last_summary=new_summary,
            has_summary=new_has,
        )
        return out, zero_loss, next_cache
