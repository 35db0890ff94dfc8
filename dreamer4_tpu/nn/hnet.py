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


class DynamicHNetCache(NamedTuple):
    """Streaming state for `DynamicChunkingTemporalTransformer`. Boundary
    placement is per batch element, so chunk counts and summaries are ragged
    across the batch — every field carries an explicit batch dim and cache
    writes are per-batch masked scatters."""

    inner_k: tuple             # per inner layer (B, H, C_max, dh) chunk keys
    inner_v: tuple
    chunk_counts: jax.Array    # (B,) int32 — completed chunks so far
    mass: jax.Array            # (B,) f32 — cumulative boundary mass
    acc_x: jax.Array           # (B, d) — online-softmax weighted frame sum
    acc_w: jax.Array           # (B,) — online-softmax weight sum
    acc_max: jax.Array         # (B,) — online-softmax running max score
    last_summary: jax.Array    # (B, d) — inner output of the latest chunk
    has_summary: jax.Array     # (B,) f32 0/1


class HNetCache(NamedTuple):
    inner_kv: tuple            # per inner layer KVCache over chunk axis
    partial: jax.Array         # (B, R, d) in-progress chunk frames
    partial_count: jax.Array   # scalar int32 — frames in the partial buffer
    last_summary: jax.Array    # (B, d) inner output of the latest completed chunk
    has_summary: jax.Array     # scalar bool-ish float



class DynamicChunkingTemporalTransformer(nn.Module):
    """H-Net with *learned, data-dependent chunk boundaries* under XLA's
    static-shape model (reference `h_net_dynamic_chunking`,
    `dreamer4.py:2737-2758`).

    Mechanism (all shapes static):
    - a boundary head emits p_t = sigmoid(score(x_t)) per frame; the
      cumulative boundary mass m_t = cumsum(p)_t assigns frame t to chunk
      c_t = floor(m_t) — boundaries move wherever the content pushes mass
      across integers, so placement is learned, per batch element;
    - each chunk is summarized by an exact within-chunk content softmax
      (segment softmax over frames with the same c_t, computed online in
      streaming mode with a running max);
    - gradients reach the boundary probabilities through a straight-through
      term (1 + m_t - stop_grad(m_t)) on each frame's contribution —
      value-neutral, gradient-carrying — plus the ratio loss
      (mean(p) - 1/compression_ratio)^2 that anchors the average chunk rate
      (the reference H-Net's ratio loss);
    - a small causal inner transformer (NoPE over the chunk axis) runs over
      completed-chunk summaries; every frame reads the inner output of the
      latest chunk completed strictly before it, added through a gate.

    Chunk counts are ragged ACROSS THE BATCH (each element places its own
    boundaries); the inner attention masks per-batch validity, and the
    streaming cache commits per-batch with masked scatters. The slot budget
    is `2 * ceil(T / compression_ratio)` — mass is clipped there, which the
    ratio loss keeps far from binding.
    """

    dim: int
    depth: int = 2
    heads: int = 4
    dim_head: int = 32
    compression_ratio: int = 4

    def init_cache(self, batch: int, max_chunks: int, dtype=jnp.float32) -> DynamicHNetCache:
        return DynamicHNetCache(
            inner_k=tuple(
                jnp.zeros((batch, self.heads, max_chunks, self.dim_head), dtype)
                for _ in range(self.depth)),
            inner_v=tuple(
                jnp.zeros((batch, self.heads, max_chunks, self.dim_head), dtype)
                for _ in range(self.depth)),
            chunk_counts=jnp.zeros((batch,), jnp.int32),
            mass=jnp.zeros((batch,), jnp.float32),
            acc_x=jnp.zeros((batch, self.dim), dtype),
            acc_w=jnp.zeros((batch,), jnp.float32),
            acc_max=jnp.full((batch,), -1e30, jnp.float32),
            last_summary=jnp.zeros((batch, self.dim), dtype),
            has_summary=jnp.zeros((batch,), jnp.float32),
        )

    def setup(self):
        self.boundary_head = nn.Dense(1)
        self.score_head = nn.Dense(1)
        self.score_norm = RMSNorm()
        self.gate_head = nn.Dense(self.dim)
        self.proj_out = nn.Dense(self.dim)
        self.inner_layers = [
            dict(
                norm=RMSNorm(),
                to_q=nn.Dense(self.heads * self.dim_head, use_bias=False),
                to_k=nn.Dense(self.heads * self.dim_head, use_bias=False),
                to_v=nn.Dense(self.heads * self.dim_head, use_bias=False),
                to_out=nn.Dense(self.dim, use_bias=False),
                ff=FeedForward(dim=self.dim),
            )
            for _ in range(self.depth)
        ]

    def boundary_probs(self, x) -> jax.Array:
        """(B, T, d) -> (B, T) learned boundary probabilities."""
        return jax.nn.sigmoid(self.boundary_head(self.score_norm(x))[..., 0])

    def _inner_kv(self, layer, h):
        """h: (B, n, d) -> k, v: (B, heads, n, dh)."""
        B, n, _ = h.shape
        hn = layer['norm'](h)
        k = layer['to_k'](hn).reshape(B, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = layer['to_v'](hn).reshape(B, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        return k, v

    def _inner_attend(self, layer, h, k_all, v_all, mask):
        """h: (B, n, d) queries; k/v: (B, heads, m, dh); mask (B, n, m)."""
        B, n, _ = h.shape
        hn = layer['norm'](h)
        q = layer['to_q'](hn).reshape(B, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        s = jnp.einsum('bhnd,bhmd->bhnm', q, k_all) * self.dim_head ** -0.5
        s = jnp.where(mask[:, None], s, -1e30)
        # fully-masked rows (no completed chunks yet) produce zeros
        p = jax.nn.softmax(s, axis=-1)
        p = jnp.where(jnp.any(mask[:, None], axis=-1, keepdims=True), p, 0.0)
        o = jnp.einsum('bhnm,bhmd->bhnd', p, v_all)
        o = o.transpose(0, 2, 1, 3).reshape(B, n, self.heads * self.dim_head)
        return layer['to_out'](o)

    def __call__(self, x, cache: DynamicHNetCache | None = None):
        """x: (B, T, d) -> (out, ratio_loss, next_cache). Without a cache,
        T may be any length (training / prefill); with a cache, T == 1."""
        B, T, d = x.shape
        R = self.compression_ratio
        score_head, norm = self.score_head, self.score_norm
        gate_head, proj_out, inner = self.gate_head, self.proj_out, self.inner_layers

        if cache is None:
            C = 2 * ((T + R - 1) // R)          # slot budget (2x slack)

            p_bound = self.boundary_probs(x)                           # (B, T)
            mass = jnp.cumsum(p_bound, axis=1)
            mass = jnp.minimum(mass, C - 1e-3)
            chunk_id = jnp.floor(mass).astype(jnp.int32)               # (B, T)

            # within-chunk exact segment softmax over content scores, with a
            # straight-through factor carrying gradients to the boundary head
            scores = score_head(norm(x))[..., 0]                       # (B, T)
            onehot = jax.nn.one_hot(chunk_id, C, dtype=x.dtype)        # (B, T, C)
            seg_max = jnp.max(
                jnp.where(onehot > 0, scores[..., None], -1e30), axis=1)  # (B, C)
            e = jnp.exp(scores - jnp.take_along_axis(seg_max, chunk_id, axis=1))
            st = 1.0 + mass - jax.lax.stop_gradient(mass)              # == 1.0
            w = e * st                                                 # (B, T)
            seg_wsum = jnp.einsum('bt,btc->bc', w, onehot)             # (B, C)
            seg_xsum = jnp.einsum('bt,btc,btd->bcd', w, onehot, x)
            # empty slots: a plain max(wsum, eps) clamp sends 1e30-scaled
            # cotangents through the division backward (NaN on 0*inf);
            # `where` keeps both branches finite
            nonempty = (seg_wsum > 0)[..., None]
            denom = jnp.where(nonempty, seg_wsum[..., None], 1.0)
            summaries = jnp.where(nonempty, seg_xsum / denom, 0.0)

            num_chunks = chunk_id[:, -1] + 1                           # (B,)
            chunk_valid = jnp.arange(C)[None, :] < num_chunks[:, None]

            # ratio loss: anchor the mean boundary rate at 1/R
            ratio_loss = jnp.mean((jnp.mean(p_bound, axis=1) - 1.0 / R) ** 2)

            # causal inner transformer over chunk summaries (NoPE chunk axis)
            h = summaries
            causal = (jnp.arange(C)[:, None] >= jnp.arange(C)[None, :])
            mask = causal[None] & chunk_valid[:, None, :]
            for layer in inner:
                k_all, v_all = self._inner_kv(layer, h)
                h = h + self._inner_attend(layer, h, k_all, v_all, mask)
                h = h + layer['ff'](h)
            h = proj_out(h)                                            # (B, C, d)

            # frame t reads the latest chunk completed STRICTLY before it:
            # chunk c_t - 1 (it contains only frames < t)
            prev = chunk_id - 1                                        # (B, T)
            gathered = jnp.where(
                prev[..., None] >= 0,
                jnp.take_along_axis(h, jnp.maximum(prev, 0)[..., None], axis=1),
                0.0)
            gate = jax.nn.sigmoid(gate_head(x))
            return x + gate * gathered, ratio_loss, None

        # ------------------------------------------------ streaming (T == 1)
        assert T == 1
        xt = x[:, 0]                                                   # (B, d)
        C_max = cache.inner_k[0].shape[-2]

        p_t = self.boundary_probs(xt[:, None])[:, 0]                   # (B,)
        mass = jnp.minimum(cache.mass + p_t, C_max - 1e-3)
        c_new = jnp.floor(mass).astype(jnp.int32)                      # (B,)
        c_old = jnp.floor(cache.mass).astype(jnp.int32)
        complete = (c_new > c_old) & (cache.acc_w > 0)                 # (B,)

        # finalize the old chunk's summary from the online-softmax state
        # (guarded division as in the parallel path; unused when acc_w == 0
        # since `complete` requires acc_w > 0)
        has_mass = (cache.acc_w > 0)[:, None]
        finalized = jnp.where(
            has_mass, cache.acc_x / jnp.where(has_mass, cache.acc_w[:, None], 1.0), 0.0)

        # inner transformer step on the finalized summary; commits per batch
        h = finalized[:, None]                                         # (B, 1, d)
        new_inner_k, new_inner_v = [], []
        slot = c_old                                                   # chunk being written
        write_mask = (jnp.arange(C_max)[None, :] == slot[:, None])     # (B, C_max)
        kv_valid = (jnp.arange(C_max)[None, :] <= slot[:, None])       # chunks 0..slot
        for layer, k_buf, v_buf in zip(inner, cache.inner_k, cache.inner_v):
            k_new, v_new = self._inner_kv(layer, h)                    # (B, H, 1, dh)
            commit = complete[:, None, None, None] & write_mask[:, None, :, None]
            k_all = jnp.where(commit, k_new, k_buf)
            v_all = jnp.where(commit, v_new, v_buf)
            att_mask = kv_valid[:, None, :]                            # (B, 1, C_max)
            h = h + self._inner_attend(layer, h, k_all, v_all, att_mask)
            h = h + layer['ff'](h)
            new_inner_k.append(jnp.where(complete[:, None, None, None], k_all, k_buf))
            new_inner_v.append(jnp.where(complete[:, None, None, None], v_all, v_buf))
        h = proj_out(h[:, 0])                                          # (B, d)

        last_summary = jnp.where(complete[:, None], h, cache.last_summary)
        has_summary = jnp.maximum(cache.has_summary, complete.astype(jnp.float32))
        chunk_counts = jnp.where(complete, cache.chunk_counts + 1, cache.chunk_counts)

        # reset or continue the accumulator, then add frame t to chunk c_new
        acc_x = jnp.where(complete[:, None], 0.0, cache.acc_x)
        acc_w = jnp.where(complete, 0.0, cache.acc_w)
        acc_max = jnp.where(complete, -1e30, cache.acc_max)

        score_t = score_head(norm(xt))[..., 0]                         # (B,)
        new_max = jnp.maximum(acc_max, score_t)
        rescale = jnp.exp(acc_max - new_max)
        e_t = jnp.exp(score_t - new_max)
        acc_x = acc_x * rescale[:, None] + e_t[:, None] * xt
        acc_w = acc_w * rescale + e_t
        acc_max = new_max

        # output: latest completed chunk strictly before this frame — chunk
        # c_new - 1, whose inner output is last_summary (fresh if it
        # completed this very frame)
        gathered = last_summary * has_summary[:, None]
        gate = jax.nn.sigmoid(gate_head(xt))
        out = (xt + gate * gathered)[:, None]

        next_cache = DynamicHNetCache(
            inner_k=tuple(new_inner_k), inner_v=tuple(new_inner_v),
            chunk_counts=chunk_counts, mass=mass,
            acc_x=acc_x, acc_w=acc_w, acc_max=acc_max,
            last_summary=last_summary, has_summary=has_summary,
        )
        return out, jnp.zeros(()), next_cache


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
