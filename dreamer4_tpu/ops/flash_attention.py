"""Pallas TPU fused attention kernel.

The TPU-native equivalent of the reference's flex-attention path
(`dreamer4.py:100-109, 1841-1852`): one fused kernel covering the full mask
family this framework needs —

  - logit softclamp (Gemma-style tanh)
  - block-causal masking with a (traced) KV-cache offset
  - special-tokens-right masking in either direction
  - grouped-query attention (query heads a multiple of kv heads)
  - a KV validity length (cached decode over preallocated buffers)

Design: grid over (batch, q-head, q-blocks); keys/values for the matching kv
head stay VMEM-resident per program (sequence lengths in this framework are
at most a few thousand, far under VMEM), and the kernel runs an online-
softmax loop over k blocks on the MXU. Mask predicates are evaluated from
block iotas inside the kernel — nothing is materialized in HBM.

The public entry `flash_attend` carries a custom VJP whose backward is the
(rematerialized) reference attention — exact gradients, with the fused kernel
on the forward/decode path where the speed matters. `naive_attend` parity is
tested in interpret mode on CPU (the reference's flex-vs-naive invariant,
test_dreamer.py:241-281).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import naive_attend
from .masks import build_attend_mask

NEG_INF = -1e30


def _attn_kernel(
    # scalar prefetch
    offset_ref,      # (1,) int32 — causal offset (query absolute start)
    kv_len_ref,      # (1,) int32 — valid kv length
    # inputs
    q_ref,           # (bq, d)
    k_ref,           # (m_pad, d)
    v_ref,           # (m_pad, d)
    # output
    o_ref,           # (bq, d)
    *,
    scale: float,
    softclamp: float | None,
    causal: bool,
    num_special: int,
    special_seq_len: int,
    special_attend_only_itself: bool,
    block_k: int,
    q_block: int,
    m_pad: int,
):
    i_block = pl.program_id(2)
    offset = offset_ref[0]
    kv_len = kv_len_ref[0]

    q = q_ref[:].astype(jnp.float32)
    bq, d = q.shape

    q_pos = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0) + i_block * q_block

    m_i = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l_i = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)

    num_k_blocks = m_pad // block_k

    def body(j, carry):
        m_i, l_i, acc = carry
        k_blk = k_ref[pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(j * block_k, block_k), :].astype(jnp.float32)

        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale

        if softclamp is not None:
            s = jnp.tanh(s / softclamp) * softclamp

        k_pos = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + j * block_k

        mask = k_pos < kv_len
        if causal:
            mask &= k_pos <= (q_pos + offset)
        if num_special > 0:
            qm = (q_pos + offset) % special_seq_len
            km = k_pos % special_seq_len
            q_sp = qm >= (special_seq_len - num_special)
            k_sp = km >= (special_seq_len - num_special)
            if special_attend_only_itself:
                mask &= ~(q_sp & ~k_sp)
            else:
                mask &= ~(~q_sp & k_sp)

        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new)

        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m_i, l_i, acc = jax.lax.fori_loop(0, num_k_blocks, body, (m_i, l_i, acc))

    o_ref[:] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=('scale', 'softclamp_value', 'causal', 'num_special',
                     'special_seq_len', 'special_attend_only_itself', 'interpret'))
def flash_attend_fwd(
    q: jax.Array,            # (B, Hq, N, D)
    k: jax.Array,            # (B, H,  M, D)
    v: jax.Array,            # (B, H,  M, D)
    offset: jax.Array,       # scalar int32 — causal offset
    kv_len: jax.Array,       # scalar int32 — valid kv length
    *,
    scale: float | None = None,
    softclamp_value: float | None = 50.0,
    causal: bool = False,
    num_special: int = 0,
    special_seq_len: int = 0,
    special_attend_only_itself: bool = False,
    interpret: bool = False,
) -> jax.Array:
    B, Hq, N, D = q.shape
    H, M = k.shape[1], k.shape[2]
    assert Hq % H == 0
    groups = Hq // H

    if scale is None:
        scale = D ** -0.5

    q_block = min(128, _round_up(N, 8))
    block_k = min(128, _round_up(M, 128))

    n_pad = _round_up(N, q_block)
    m_pad = _round_up(M, block_k)
    d_pad = _round_up(D, 128)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, n_pad - N), (0, d_pad - D)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, m_pad - M), (0, d_pad - D)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, m_pad - M), (0, d_pad - D)))

    kernel = functools.partial(
        _attn_kernel,
        scale=scale,
        softclamp=softclamp_value,
        causal=causal,
        num_special=num_special,
        special_seq_len=special_seq_len if special_seq_len > 0 else m_pad,
        special_attend_only_itself=special_attend_only_itself,
        block_k=block_k,
        q_block=q_block,
        m_pad=m_pad,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hq, n_pad // q_block),
        in_specs=[
            pl.BlockSpec((1, 1, q_block, d_pad), lambda b, h, i, *_: (b, h, i, 0)),
            pl.BlockSpec((1, 1, m_pad, d_pad), lambda b, h, i, *_: (b, h // groups, 0, 0)),
            pl.BlockSpec((1, 1, m_pad, d_pad), lambda b, h, i, *_: (b, h // groups, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, q_block, d_pad), lambda b, h, i, *_: (b, h, i, 0)),
    )

    def kernel_wrap(offset_ref, kvlen_ref, q_ref, k_ref, v_ref, o_ref):
        kernel(offset_ref, kvlen_ref,
               q_ref.at[0, 0], k_ref.at[0, 0], v_ref.at[0, 0], o_ref.at[0, 0])

    out = pl.pallas_call(
        kernel_wrap,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, n_pad, d_pad), q.dtype),
        interpret=interpret,
    )(jnp.asarray([offset], jnp.int32), jnp.asarray([kv_len], jnp.int32), qp, kp, vp)

    return out[:, :, :N, :D]


def _reference_attend(q, k, v, offset, kv_len, *, scale, softclamp_value, causal,
                      num_special, special_seq_len, special_attend_only_itself):
    """jnp reference with identical semantics (backward path + parity)."""
    N, M = q.shape[-2], k.shape[-2]
    mask = build_attend_mask(
        N, M,
        causal=causal,
        causal_offset=offset,
        num_special=num_special,
        block_size_per_special=special_seq_len if special_seq_len > 0 else M,
        special_attend_only_itself=special_attend_only_itself,
    )
    valid = jnp.arange(M)[None, :] < kv_len
    mask = valid & (mask if mask is not None else True)
    return naive_attend(q, k, v, mask=mask, softclamp_value=softclamp_value, scale=scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def flash_attend(q, k, v, offset, kv_len, config):
    """config: a `make_config(...)` tuple of the static kwargs."""
    return flash_attend_fwd(q, k, v, offset, kv_len, **dict(config))


def _fwd(q, k, v, offset, kv_len, config):
    out = flash_attend_fwd(q, k, v, offset, kv_len, **dict(config))
    return out, (q, k, v, offset, kv_len)


def _bwd(config, residuals, g):
    q, k, v, offset, kv_len = residuals
    cfg = {k_: v_ for k_, v_ in dict(config).items() if k_ != 'interpret'}

    def f(q, k, v):
        return _reference_attend(q, k, v, offset, kv_len, **cfg)

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


flash_attend.defvjp(_fwd, _bwd)


def make_config(scale=None, softclamp_value=50.0, causal=False, num_special=0,
                special_seq_len=0, special_attend_only_itself=False,
                interpret=False) -> tuple:
    """Hashable config for flash_attend's nondiff arg."""
    return tuple(sorted(dict(
        scale=scale, softclamp_value=softclamp_value, causal=causal,
        num_special=num_special, special_seq_len=special_seq_len,
        special_attend_only_itself=special_attend_only_itself,
        interpret=interpret,
    ).items()))
