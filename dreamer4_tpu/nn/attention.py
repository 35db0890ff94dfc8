"""Attention module with static-shape KV caching.

TPU-native re-design of the reference `Attention` (`dreamer4.py:1887-2075`):
same capabilities — GQA, per-head sigmoid output gates, key-only QK-RMSNorm,
learned value-residual mixing, BeliefFormer output-orthogonalization, logit
softclamp, rotary — but the KV cache is a fixed-size preallocated buffer with
a write index instead of a growing `torch.cat`. That keeps every decode step
the same compiled program (one XLA executable for the whole imagination
rollout) and lets the cache live in HBM across `lax.scan`/`fori_loop` steps.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import naive_attend
from ..ops.utils import l2norm
from .norms import MultiHeadRMSNorm, RMSNorm


class KVCache(NamedTuple):
    """Preallocated cache for one attention layer.

    k, v: (B, heads, max_len, dim_head); length: scalar int32 write index.
    """

    k: jax.Array
    v: jax.Array
    length: jax.Array

    @classmethod
    def create(cls, batch: int, heads: int, max_len: int, dim_head: int, dtype=jnp.float32):
        return cls(
            k=jnp.zeros((batch, heads, max_len, dim_head), dtype=dtype),
            v=jnp.zeros((batch, heads, max_len, dim_head), dtype=dtype),
            length=jnp.zeros((), dtype=jnp.int32),
        )

    def append(self, k_new: jax.Array, v_new: jax.Array) -> 'KVCache':
        start = self.length
        k = jax.lax.dynamic_update_slice(self.k, k_new.astype(self.k.dtype), (0, 0, start, 0))
        v = jax.lax.dynamic_update_slice(self.v, v_new.astype(self.v.dtype), (0, 0, start, 0))
        return KVCache(k, v, start + k_new.shape[-2])


class FlashSpec(NamedTuple):
    """Static mask description for the fused Pallas kernel (traced offset /
    kv-length are supplied alongside)."""
    causal: bool = False
    num_special: int = 0
    special_seq_len: int = 0
    special_attend_only_itself: bool = False


class AttentionOut(NamedTuple):
    out: jax.Array
    cache: KVCache | None
    normed_inputs: jax.Array


class Attention(nn.Module):
    """See module docstring. Operates on (B, n, d) token blocks; the axial
    transformer supplies B = b*s (time) or b*t (space) plus masks/rotary."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    query_heads: int | None = None
    dim_kv_input: int | None = None
    pre_rmsnorm: bool = True
    pre_context_rmsnorm: bool = False
    gate_values: bool = True
    rmsnorm_query: bool = False
    rmsnorm_key: bool = True
    value_residual: bool = True
    belief_attn: bool = True
    softclamp_value: float | None = 50.0
    # enable the small-shape fused kernel (ops/small_attention.py) for
    # self-attention calls below the flash gate: q/k/v stay in the
    # projections' natural (B, n, h, dh) layout end-to-end — no per-head
    # relayout copies, scores never touch HBM
    use_fused_small: bool = False
    # efficiency cap for the small kernel: past this many flattened rows
    # (n*heads) its h-fold redundant score FLOPs outweigh the layout-copy
    # savings (nh=640 tokenizer space attention measured slower in r4)
    small_max_nh: int = 512
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,                    # (B, n, d)
        context: jax.Array | None = None,     # (B, m, d) for cross attention
        kv_cache: KVCache | None = None,
        rotary: jax.Array | None = None,      # (n_abs, dim_head) angles
        mask: jax.Array | None = None,        # (n, j) or broadcastable
        residual_values: jax.Array | None = None,  # (B, n, heads, dim_head)
        flash_spec: FlashSpec | None = None,  # use the fused Pallas kernel
        flash_offset: jax.Array | int = 0,    # causal offset (token count)
        ring_axis: str | None = None,         # sequence-parallel ring attention
        ring_use_flash: bool = False,         # Pallas kernels inside the ring
    ) -> AttentionOut:
        q_heads = self.query_heads if self.query_heads is not None else self.heads
        assert q_heads >= self.heads and q_heads % self.heads == 0

        dense = lambda feats, name: nn.Dense(feats, use_bias=False, dtype=self.dtype, name=name)

        if self.pre_rmsnorm:
            tokens = RMSNorm(name='norm')(tokens)
        normed_inputs = tokens

        has_context = context is not None
        if has_context:
            if self.pre_context_rmsnorm:
                context = RMSNorm(name='norm_context')(context)
        else:
            context = tokens

        use_small = (
            self.use_fused_small
            and flash_spec is None and ring_axis is None and kv_cache is None
            and not has_context
            and q_heads == self.heads
            and tokens.ndim == 3
            # static (numpy) 2-D masks only: the kernel's interleaved bias
            # must be a jit CONSTANT (ops/masks.py returns numpy for static
            # configs; traced masks — cached decode — use the generic path)
            and (mask is None or (isinstance(mask, np.ndarray) and mask.ndim == 2))
        )
        if use_small:
            # VMEM- and efficiency-aware shape gate (round 4's fixed
            # n*h <= 2048 cap admitted nh=688, which OOMed scoped vmem in
            # the kernel backward at the 250M scale)
            from ..ops.small_attention import small_attention_viable

            itemsize = jnp.dtype(self.dtype or tokens.dtype).itemsize
            use_small = small_attention_viable(
                tokens.shape[0], tokens.shape[-2], self.heads, self.dim_head,
                itemsize=itemsize, max_nh=self.small_max_nh)
        if use_small:
            return self._small_path(tokens, normed_inputs, mask, rotary,
                                    residual_values)

        q = dense(q_heads * self.dim_head, 'to_q')(tokens)
        k = dense(self.heads * self.dim_head, 'to_k')(context)
        v = dense(self.heads * self.dim_head, 'to_v')(context)

        split = lambda t, h: t.reshape(*t.shape[:-1], h, self.dim_head).swapaxes(-3, -2)
        q, k, v = split(q, q_heads), split(k, self.heads), split(v, self.heads)  # (B, h, n, d)

        # learned value-residual mixing (reference `dreamer4.py:1945-1949, 2005-2012`)
        if residual_values is not None:
            assert self.value_residual
            mix = jax.nn.sigmoid(nn.Dense(self.heads, dtype=self.dtype, name='to_value_residual_mix')(tokens))
            mix = mix.swapaxes(-1, -2)[..., None]  # (B, h, n, 1)
            rv = residual_values.swapaxes(-3, -2)  # (B, h, n, d)
            v = v + (rv - v) * mix

        if self.rmsnorm_query:
            q = MultiHeadRMSNorm(self.dim_head, q_heads, name='q_norm')(q)
        if self.rmsnorm_key:
            k = MultiHeadRMSNorm(self.dim_head, self.heads, name='k_norm')(k)

        if rotary is not None:
            from ..ops.rotary import apply_rotations

            q = apply_rotations(rotary, q)
            k = apply_rotations(rotary, k)

        # belief values are the *current block's* values (pre-cache)
        if self.belief_attn and not has_context:
            v_for_belief = v

        new_cache = None
        kv_len = None
        if kv_cache is not None:
            new_cache = kv_cache.append(k, v)
            k, v = new_cache.k, new_cache.v
            kv_len = new_cache.length

        if ring_axis is not None:
            # sequence-parallel ring attention over the ambient mesh axis
            # (training path; incompatible with KV caches)
            assert kv_cache is None
            from functools import partial as _partial

            from jax.sharding import PartitionSpec as P

            from ..parallel.ring_attention import ring_attend

            spec = P(None, None, ring_axis, None)
            interpret = jax.default_backend() != 'tpu'
            ring = _partial(jax.shard_map, in_specs=(spec, spec, spec), out_specs=spec,
                            check_vma=False)(  # pallas outputs carry no vma

                lambda q_, k_, v_: ring_attend(
                    q_, k_, v_, axis_name=ring_axis, causal=True,
                    softclamp_value=self.softclamp_value,
                    # fused Pallas kernels per ring block once the local
                    # shard is at least one 128-row tile
                    use_flash=ring_use_flash and q_.shape[-2] >= 128,
                    interpret=interpret))
            out = ring(q, k, v)
        elif flash_spec is not None:
            from ..ops.flash_attention import flash_attend, make_config

            config = make_config(
                softclamp_value=self.softclamp_value,
                causal=flash_spec.causal,
                num_special=flash_spec.num_special,
                special_seq_len=flash_spec.special_seq_len,
                special_attend_only_itself=flash_spec.special_attend_only_itself,
                interpret=jax.default_backend() != 'tpu',
            )
            out = flash_attend(
                q, k, v,
                jnp.asarray(flash_offset, jnp.int32),
                jnp.asarray(kv_len if kv_len is not None else k.shape[-2], jnp.int32),
                config)
        else:
            out = naive_attend(q, k, v, mask=mask, softclamp_value=self.softclamp_value)

        # BeliefFormer: remove the component of out parallel to the values
        # (reference `dreamer4.py:2045-2054`)
        if self.belief_attn and not has_context:
            v_normed = l2norm(v_for_belief)
            if q_heads > self.heads:
                v_normed = jnp.repeat(v_normed, q_heads // self.heads, axis=-3)
            parallel = jnp.sum(out * v_normed, axis=-1, keepdims=True) * v_normed
            out = out - parallel

        if self.gate_values:
            gates = jax.nn.sigmoid(nn.Dense(q_heads, use_bias=False, dtype=self.dtype, name='to_gates')(tokens))
            out = out * gates.swapaxes(-1, -2)[..., None]

        out = out.swapaxes(-3, -2).reshape(*out.shape[:-3], -1, q_heads * self.dim_head)
        out = dense(self.dim, 'to_out')(out)

        return AttentionOut(out, new_cache, normed_inputs)

    def _small_path(self, tokens, normed_inputs, mask, rotary, residual_values):
        """Self-attention via the small-shape fused kernel, with EVERY
        tensor op in one flat (B, n*h, dh) layout (row i = position i//h,
        head i%h — the projections' natural memory order, so the reshapes
        are free). Value-residual mix, QK norms, rotary and gates all apply
        in this layout with pre-expanded (n*h, ...) tables; the kernel
        consumes it directly. One canonical layout end-to-end means XLA has
        no reason to insert the per-head relayout copies that dominate
        sub-flash-gate attention on the generic path. Parameter tree and
        math are identical to the generic path (same named submodules;
        parity: tests/test_small_attention.py)."""
        from ..ops.rotary import apply_rotations_flat
        from ..ops.small_attention import build_interleaved_bias, small_attend_flat

        h, dh = self.heads, self.dim_head
        B, n, _ = tokens.shape
        nh = n * h
        dense = lambda feats, name: nn.Dense(feats, use_bias=False, dtype=self.dtype, name=name)
        flat = lambda x: x.reshape(B, nh, dh)

        q = flat(dense(h * dh, 'to_q')(tokens))            # (B, n*h, dh)
        k = flat(dense(h * dh, 'to_k')(tokens))
        v = flat(dense(h * dh, 'to_v')(tokens))

        if residual_values is not None:                    # (B, n, h, dh) in
            assert self.value_residual
            mix = jax.nn.sigmoid(nn.Dense(h, dtype=self.dtype, name='to_value_residual_mix')(tokens))
            v = v + (flat(residual_values) - v) * mix.reshape(B, nh, 1)

        def head_norm(x, name):
            # MultiHeadRMSNorm in the flat layout: f32 statistic,
            # stream-dtype apply, gamma tiled to (n*h, dh) (same param tree
            # as the generic path's MultiHeadRMSNorm)
            gamma = _Gamma(h, dh, name=name)()
            xf = x.astype(jnp.float32)
            inv = jax.lax.rsqrt(jnp.sum(jnp.square(xf), axis=-1, keepdims=True) + 1e-12)
            scale = jnp.tile((gamma + 1.0) * dh ** 0.5, (n, 1)).astype(x.dtype)
            return x * inv.astype(x.dtype) * scale

        if self.rmsnorm_query:
            q = head_norm(q, 'q_norm')
        if self.rmsnorm_key:
            k = head_norm(k, 'k_norm')

        if rotary is not None:
            q = apply_rotations_flat(rotary, q, h)
            k = apply_rotations_flat(rotary, k, h)

        if self.belief_attn:
            v_for_belief = v

        bias = build_interleaved_bias(n, h, mask)
        out = small_attend_flat(q, k, v, bias, softclamp_value=self.softclamp_value,
                                interpret=jax.default_backend() != 'tpu')

        if self.belief_attn:
            v_normed = l2norm(v_for_belief)
            parallel = jnp.sum(out * v_normed, axis=-1, keepdims=True) * v_normed
            out = out - parallel

        if self.gate_values:
            gates = jax.nn.sigmoid(nn.Dense(h, use_bias=False, dtype=self.dtype, name='to_gates')(tokens))
            out = out * gates.reshape(B, nh, 1)

        out = out.reshape(B, n, h * dh)
        out = dense(self.dim, 'to_out')(out)
        return AttentionOut(out, None, normed_inputs)


class FeedForward(nn.Module):
    """Pre-RMSNorm (GLU) feedforward (reference `dreamer4.py:2079-2116`)."""

    dim: int
    expansion_factor: float = 4.0
    activation: str = 'silu'
    use_glu: bool | None = None
    pre_rmsnorm: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        from .activations import get_activation

        act = get_activation(self.activation)
        use_glu = self.use_glu if self.use_glu is not None else self.activation in ('silu', 'gelu')
        dim_inner = int(self.dim * self.expansion_factor * (2 / 3 if use_glu else 1))

        if self.pre_rmsnorm:
            x = RMSNorm(name='norm')(x)

        x = nn.Dense(dim_inner * (2 if use_glu else 1), dtype=self.dtype, name='proj_in')(x)
        if use_glu:
            x, gates = jnp.split(x, 2, axis=-1)
            x = x * act(gates)
        else:
            x = act(x)
        return nn.Dense(self.dim, dtype=self.dtype, name='proj_out')(x)


def rms_normalize(x, eps: float = 1e-6):
    """RMSNorm's normalization step without the learned scale. Only the
    mean-square STATISTIC is computed in f32; the elementwise apply stays in
    the stream dtype so a bf16 tensor is never materialized as f32 — in
    bf16 training XLA otherwise fuses the f32 convert into the producing
    matmul and doubles its HBM write traffic (measured on the pool k/v
    projections). For f32 inputs the casts are no-ops and the math is
    unchanged. The trunk computes this ONCE per layer hidden and shares it
    across every attention pool; each pool folds its own `norm_context`
    scale into its projection weights."""
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return x * inv.astype(x.dtype)


class _Kernel(nn.Module):
    """Param holder that mirrors `nn.Dense(...)`'s param tree ({name}/kernel)
    so the raw weight can participate in folded matmuls while checkpoints
    stay interchangeable with the previous Dense-based pool."""

    features: int

    @nn.compact
    def __call__(self, dim_in: int):
        return self.param('kernel', nn.initializers.lecun_normal(), (dim_in, self.features))


class _Scale(nn.Module):
    """Param holder mirroring RMSNorm's tree ({name}/scale)."""

    @nn.compact
    def __call__(self, dim: int):
        return self.param('scale', nn.initializers.ones, (dim,))


class _Gamma(nn.Module):
    """Param holder mirroring MultiHeadRMSNorm's tree ({name}/gamma)."""

    heads: int
    dim_head: int

    @nn.compact
    def __call__(self):
        return self.param('gamma', nn.initializers.zeros, (self.heads, self.dim_head))


class _StreamingPoolAttention(nn.Module):
    """Single-query attention over the stack of per-layer hiddens.

    Equivalent math to `Attention(queries, context=stack(hiddens))` with
    pre_rmsnorm + pre_context_rmsnorm + key RMSNorm + value gates — same
    parameter tree, so checkpoints are interchangeable (parity test:
    tests/test_transformer.py::test_attention_pool_matches_stacked_attention).

    Implementation history, all measured on a v5e at the b8xT32 world-model
    train step (dim 512, depth 8 => 8 pools over up to 19 hiddens):
    - generic Attention over a (B, L, d) stack: (b, t, s, L, d) relayout
      copies dominated the step;
    - per-hidden streaming projections: no 5-D tensors, but sum(L_i) ~ 82
      (pool, hidden) pairs x ~8 ops each of ~2 us swamped the step with
      dispatch/latency-bound small ops — pools cost 26 ms of a 48.5 ms step
      while their matmul work is <1 ms;
    - this version: the caller passes hiddens ALREADY rms-normalized (one
      shared normalization per hidden for all pools, instead of one per
      (pool, hidden) pair); the pool folds its `norm_context` scale into the
      k/v projection weights (a (d, h*dh) elementwise op per step), stacks
      the normalized hiddens once, and runs ONE wide (L*B, d) matmul per
      projection plus one batched k-norm fusion. ~6 mid-size ops per pool
      instead of ~8*L tiny ones.
    """

    dim: int
    heads: int
    dim_head: int
    softclamp_value: float | None = 50.0
    # measured dead end (round 5): a per-hidden streaming branch for
    # decode-shaped calls (row reads, no prefix-stack materialization)
    # ran the b16 rollout at 59.1 ms vs 53.1 ms for the stacked wide
    # matmul under identical load — the wide form wins at BOTH decode and
    # train shapes with the shared-norm/folded-scale layout. stream_max_
    # tokens is kept only for the branch-parity test.
    stream_max_tokens: int = 0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, normed_hiddens):
        # x: (B, d) residual stream; normed_hiddens: pre-normalized
        # (`rms_normalize`, unscaled) hiddens — either a list of (B, d)
        # or an already-stacked (L, B, d) array (the trunk passes a shared
        # preallocated buffer so hidden i is written ONCE instead of
        # re-stacked by every downstream pool; see AxialSpaceTimeTransformer)
        from ..ops.utils import softclamp

        d, h, dh = self.dim, self.heads, self.dim_head
        cdt = self.dtype if self.dtype is not None else x.dtype
        dense = lambda feats, name: nn.Dense(feats, use_bias=False, dtype=self.dtype, name=name)

        tn = RMSNorm(name='norm')(x)
        q = dense(h * dh, 'to_q')(tn)
        q = q.reshape(-1, h, dh)

        # fold the context-norm scale into the projection weights:
        # (n * s) @ W == n @ (s[:, None] * W). One (d, h*dh) elementwise
        # multiply per step instead of scaling (L, B, d) activations.
        ctx_scale = _Scale(name='norm_context')(d)
        w_k = _Kernel(h * dh, name='to_k')(d)
        w_v = _Kernel(h * dh, name='to_v')(d)
        # cast BEFORE folding: the fold then reads/writes bf16 (half the
        # bytes of the previous f32 multiply + fused convert)
        cscale = ctx_scale.astype(cdt)[:, None]
        w_k = cscale * w_k.astype(cdt)
        w_v = cscale * w_v.astype(cdt)
        gamma = _Gamma(h, dh, name='k_norm')()
        gamma_scale = ((gamma + 1.0) * dh ** 0.5).astype(cdt)

        is_stacked = isinstance(normed_hiddens, jax.Array)
        n_tokens = x.shape[0]

        if n_tokens <= self.stream_max_tokens:
            # decode-shaped: hidden-by-hidden projections — row reads of the
            # shared buffer, no contiguous prefix-stack copy, every
            # intermediate (B, h*dh)
            rows = (list(normed_hiddens) if is_stacked
                    else normed_hiddens)
            ks, vs = [], []
            for c in rows:
                c = c.astype(cdt)
                ki = (c @ w_k).reshape(-1, h, dh)
                kf = ki.astype(jnp.float32)
                inv = jax.lax.rsqrt(
                    jnp.sum(jnp.square(kf), axis=-1, keepdims=True) + 1e-12)
                ks.append(ki * inv.astype(cdt) * gamma_scale)
                vs.append((c @ w_v).reshape(-1, h, dh))
            k = jnp.stack(ks)                             # (L, B, h, dh)
            v = jnp.stack(vs)
        else:
            n = (normed_hiddens if is_stacked
                 else jnp.stack(normed_hiddens))          # (L, B, d)
            # SEPARATE k and v matmuls. The round-4 form concatenated the
            # folded weights into one (d, 2*h*dh) GEMM to "halve the stack
            # reads" — but the weight concat does not constant-fold even
            # under baked serving weights, leaving a runtime concat + output
            # split in every pool call. Bisected as the round-4 decode
            # regression's root cause: splitting recovers the b16 rollout
            # 53.5 -> 49.8 ms and is also neutral-to-faster for training
            # (shortcut 67.7 -> 64.4 ms, plain 44.2 -> 43.9 ms).
            k = (n @ w_k).reshape(*n.shape[:2], h, dh)    # (L, B, h, dh)
            v = (n @ w_v).reshape(*n.shape[:2], h, dh)
            # MultiHeadRMSNorm, batched over (L, B): f32 statistic only,
            # apply in the stream dtype (see rms_normalize — keeps the k
            # projection's output bf16 instead of a convert-fused f32 write)
            kf = k.astype(jnp.float32)
            inv = jax.lax.rsqrt(jnp.sum(jnp.square(kf), axis=-1, keepdims=True) + 1e-12)
            k = k * inv.astype(cdt) * gamma_scale

        scale = dh ** -0.5
        # scores and softmax in f32, matching naive_attend
        sim = jnp.einsum('bhd,lbhd->bhl', q, k,
                         preferred_element_type=jnp.float32) * scale
        if self.softclamp_value is not None:
            sim = softclamp(sim, self.softclamp_value)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum('bhl,lbhd->bhd', attn, v)

        gates = jax.nn.sigmoid(dense(self.heads, 'to_gates')(tn))
        out = out * gates[..., None]
        out = out.reshape(-1, h * dh)
        return dense(self.dim, 'to_out')(out)


class AttentionPool(nn.Module):
    """Each token cross-attends over the stack of its own per-layer hiddens
    ('attention residuals', reference `dreamer4.py:2143-2177`)."""

    dim: int
    heads: int = 4
    dim_head: int = 64
    dtype: jnp.dtype | None = None
    # rematerialize the pool in the backward once the flattened token count
    # is large (long-sequence training): the stacked k/v residuals are
    # O(sum_i L_i * B * heads * dim_head) across pools and OOM a 16 GB chip
    # at T=1024 x 27 tokens/frame if all kept. Small steps keep the residuals
    # (remat measured +4.5 ms on the b8xT32 train step).
    remat_min_tokens: int = 16384

    @nn.compact
    def __call__(self, x, hiddens, normed_hiddens=None):
        # x: (..., d); hiddens: list of (..., d) with identical shapes.
        # Callers that hold many pools (the trunk) pass `normed_hiddens`
        # pre-normalized — as a stacked (L, flat, d) array (preferred: one
        # write per hidden instead of one stack copy per pool) or a list;
        # otherwise it is computed here.
        lead_shape = x.shape[:-1]
        flat = lambda t: t.reshape(-1, t.shape[-1])
        if normed_hiddens is None:
            normed_hiddens = [rms_normalize(h) for h in hiddens]
        if not isinstance(normed_hiddens, jax.Array):
            normed_hiddens = [flat(h) for h in normed_hiddens]
        pool_cls = _StreamingPoolAttention
        if x[..., 0].size >= self.remat_min_tokens:
            pool_cls = nn.remat(pool_cls)
        out = pool_cls(
            dim=self.dim,
            heads=self.heads,
            dim_head=self.dim_head,
            dtype=self.dtype,
            name='attn',
        )(flat(x), normed_hiddens)
        return out.reshape(*lead_shape, x.shape[-1])


class LearnedQueriesAttentionPool(nn.Module):
    """Perceiver-style resampler (reference `dreamer4.py:2179-2210`), used to
    convert between latent-token and spatial-token counts."""

    num_queries: int
    dim: int
    dim_kv_input: int | None = None
    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):  # (..., n, d_in) -> (..., num_queries, dim)
        lead_shape = x.shape[:-2]
        x = x.reshape(-1, x.shape[-2], x.shape[-1])

        queries = self.param('queries', nn.initializers.normal(1e-2), (self.num_queries, self.dim))
        queries = jnp.broadcast_to(queries, (x.shape[0], self.num_queries, self.dim))

        out = Attention(
            dim=self.dim,
            dim_kv_input=self.dim_kv_input,
            heads=self.heads,
            dim_head=self.dim_head,
            gate_values=True,
            value_residual=False,
            belief_attn=False,
            pre_rmsnorm=True,
            pre_context_rmsnorm=True,
            dtype=self.dtype,
            name='attn',
        )(queries, context=x).out

        return out.reshape(*lead_shape, self.num_queries, self.dim)
