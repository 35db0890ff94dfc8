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

The public entry `flash_attend` carries a custom VJP. At training shapes
(q_block == 128) the backward is a pair of fused Pallas kernels — dq gridded
over query blocks, dk/dv gridded over key blocks — that recompute scores
from the forward-saved log-sum-exp (O(N) memory, flash-attention-2 style).
At tiny decode shapes the backward falls back to the rematerialized
reference attention (gradients are rarely needed there). `naive_attend`
parity for values AND gradients is tested in interpret mode on CPU (the
reference's flex-vs-naive invariant, test_dreamer.py:241-281).
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

# Per-row statistics (LSE, delta) are carried with a trailing lane dim of a
# full 128-lane tile (Mosaic requires lane slices aligned to 128); the value
# is broadcast across lanes. Transient memory only — freed after the bwd.
LSE_LANES = 128


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
    lse_ref,         # (bq,) log-sum-exp per query row | None
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
    if lse_ref is not None:
        lse = m_i + jnp.log(jnp.maximum(l_i, 1e-30))        # (bq, 1)
        lse_ref[:] = jnp.broadcast_to(lse, (bq, LSE_LANES))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=('scale', 'softclamp_value', 'causal', 'num_special',
                     'special_seq_len', 'special_attend_only_itself', 'interpret',
                     'return_lse'))
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
    return_lse: bool = False,
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
        out_specs=(
            pl.BlockSpec((1, 1, q_block, d_pad), lambda b, h, i, *_: (b, h, i, 0)),
            pl.BlockSpec((1, 1, q_block, LSE_LANES), lambda b, h, i, *_: (b, h, i, 0)),
        ) if return_lse else
        pl.BlockSpec((1, 1, q_block, d_pad), lambda b, h, i, *_: (b, h, i, 0)),
    )

    if return_lse:
        def kernel_wrap(offset_ref, kvlen_ref, q_ref, k_ref, v_ref, o_ref, lse_ref):
            kernel(offset_ref, kvlen_ref,
                   q_ref.at[0, 0], k_ref.at[0, 0], v_ref.at[0, 0],
                   o_ref.at[0, 0], lse_ref.at[0, 0])

        out_shape = (jax.ShapeDtypeStruct((B, Hq, n_pad, d_pad), q.dtype),
                     jax.ShapeDtypeStruct((B, Hq, n_pad, LSE_LANES), jnp.float32))
    else:
        def kernel_wrap(offset_ref, kvlen_ref, q_ref, k_ref, v_ref, o_ref):
            kernel(offset_ref, kvlen_ref,
                   q_ref.at[0, 0], k_ref.at[0, 0], v_ref.at[0, 0],
                   o_ref.at[0, 0], None)

        out_shape = jax.ShapeDtypeStruct((B, Hq, n_pad, d_pad), q.dtype)

    out = pl.pallas_call(
        kernel_wrap,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray([offset], jnp.int32), jnp.asarray([kv_len], jnp.int32), qp, kp, vp)

    if return_lse:
        out, lse = out
        return out[:, :, :N, :D], lse[..., 0]   # (B, Hq, n_pad)
    return out[:, :, :N, :D]


# ------------------------------------------------------------ fused backward

def _mask_block(q_pos, k_pos, kv_len, offset, *, causal, num_special,
                special_seq_len, special_attend_only_itself):
    """Same predicate family as the forward kernel, evaluated from iotas."""
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
    return mask


def _recompute_p_ds(q, k_blk, v_blk, do, lse, delta, mask, *, scale, softclamp):
    """Recompute probabilities and score gradients for one (q, k) tile.

    `lse`/`delta` are (rows, 1) columns. Returns (p, ds_raw): p = softmax
    probabilities (zero where masked), ds_raw = dL/d(raw scores before
    scale+softclamp) — the scale is folded into the dq/dk matmuls by the
    callers."""
    s_raw = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
    if softclamp is not None:
        t = jnp.tanh(s_raw / softclamp)
        s = t * softclamp
    else:
        s = s_raw
    p = jnp.where(mask, jnp.exp(s - lse), 0.0)

    dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    if softclamp is not None:
        ds = ds * (1.0 - t * t)   # d softclamp / d s_raw
    return p, ds


def _bwd_dq_kernel(offset_ref, kvlen_ref, q_ref, k_ref, v_ref, do_ref,
                   lse_ref, delta_ref, dq_ref, *, scale, softclamp, causal,
                   num_special, special_seq_len, special_attend_only_itself,
                   block_k, q_block, m_pad):
    i_block = pl.program_id(2)
    offset = offset_ref[0]
    kv_len = kvlen_ref[0]

    q = q_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    lse = lse_ref[:, 0:1]       # (bq, 1)
    delta = delta_ref[:, 0:1]   # (bq, 1)
    bq, d = q.shape

    q_pos = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0) + i_block * q_block

    def body(j, dq):
        k_blk = k_ref[pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + j * block_k
        mask = _mask_block(q_pos, k_pos, kv_len, offset, causal=causal,
                           num_special=num_special, special_seq_len=special_seq_len,
                           special_attend_only_itself=special_attend_only_itself)
        _, ds = _recompute_p_ds(q, k_blk, v_blk, do, lse, delta, mask,
                                scale=scale, softclamp=softclamp)
        return dq + jnp.dot(ds, k_blk, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, m_pad // block_k, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[:] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(offset_ref, kvlen_ref, q_ref, k_ref, v_ref, do_ref,
                    lse_ref, delta_ref, dk_ref, dv_ref, *, scale, softclamp,
                    causal, num_special, special_seq_len,
                    special_attend_only_itself, block_k, q_block, n_pad):
    j_block = pl.program_id(2)
    offset = offset_ref[0]
    kv_len = kvlen_ref[0]

    k_blk = k_ref[:].astype(jnp.float32)
    v_blk = v_ref[:].astype(jnp.float32)
    bk, d = k_blk.shape

    k_pos = jax.lax.broadcasted_iota(jnp.int32, (q_block, block_k), 1) + j_block * block_k

    def body(i, carry):
        dk, dv = carry
        q = q_ref[pl.ds(i * q_block, q_block), :].astype(jnp.float32)
        do = do_ref[pl.ds(i * q_block, q_block), :].astype(jnp.float32)
        lse = lse_ref[pl.ds(i * q_block, q_block), 0:1]       # (bq, 1)
        delta = delta_ref[pl.ds(i * q_block, q_block), 0:1]   # (bq, 1)
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (q_block, block_k), 0) + i * q_block
        mask = _mask_block(q_pos, k_pos, kv_len, offset, causal=causal,
                           num_special=num_special, special_seq_len=special_seq_len,
                           special_attend_only_itself=special_attend_only_itself)
        p, ds = _recompute_p_ds(q, k_blk, v_blk, do, lse, delta, mask,
                                scale=scale, softclamp=softclamp)
        dv = dv + jnp.dot(p.T, do, preferred_element_type=jnp.float32)
        dk = dk + jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
        return dk, dv

    dk, dv = jax.lax.fori_loop(
        0, n_pad // q_block, body,
        (jnp.zeros((bk, d), jnp.float32), jnp.zeros((bk, d), jnp.float32)))
    dk_ref[:] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=('scale', 'softclamp_value', 'causal', 'num_special',
                     'special_seq_len', 'special_attend_only_itself', 'interpret'))
def flash_attend_bwd(
    q, k, v, out, lse, g, offset, kv_len, *,
    scale=None, softclamp_value=50.0, causal=False, num_special=0,
    special_seq_len=0, special_attend_only_itself=False, interpret=False,
):
    """Fused flash-attention backward: dq over query blocks, dk/dv over key
    blocks, probabilities recomputed from the saved log-sum-exp (O(N) memory
    vs the round-1 dense remat)."""
    B, Hq, N, D = q.shape
    H, M = k.shape[1], k.shape[2]
    groups = Hq // H
    if scale is None:
        scale = D ** -0.5

    q_block = 128
    block_k = 128
    n_pad = _round_up(N, q_block)
    m_pad = _round_up(M, block_k)
    d_pad = _round_up(D, 128)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, n_pad - N), (0, d_pad - D)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, m_pad - M), (0, d_pad - D)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, m_pad - M), (0, d_pad - D)))
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, n_pad - N), (0, d_pad - D)))

    # delta_i = rowsum(dO * O) — cheap elementwise, fused by XLA
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, n_pad - N)))
    # lse comes padded from the forward already (n_pad rows); both stats are
    # broadcast over the small lane dim for the TPU block-tiling rule
    lse = jnp.broadcast_to(lse[..., None], (*lse.shape, LSE_LANES))
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, LSE_LANES))

    static = dict(scale=scale, softclamp=softclamp_value, causal=causal,
                  num_special=num_special,
                  special_seq_len=special_seq_len if special_seq_len > 0 else m_pad,
                  special_attend_only_itself=special_attend_only_itself,
                  block_k=block_k, q_block=q_block)

    off = jnp.asarray([offset], jnp.int32)
    kvl = jnp.asarray([kv_len], jnp.int32)

    # ---- dq: grid over query blocks
    dq_kernel = functools.partial(_bwd_dq_kernel, m_pad=m_pad, **static)

    def dq_wrap(o_r, kv_r, q_r, k_r, v_r, do_r, lse_r, dl_r, dq_r):
        dq_kernel(o_r, kv_r, q_r.at[0, 0], k_r.at[0, 0], v_r.at[0, 0],
                  do_r.at[0, 0], lse_r.at[0, 0], dl_r.at[0, 0], dq_r.at[0, 0])

    dq = pl.pallas_call(
        dq_wrap,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, Hq, n_pad // q_block),
            in_specs=[
                pl.BlockSpec((1, 1, q_block, d_pad), lambda b, h, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, m_pad, d_pad), lambda b, h, i, *_: (b, h // groups, 0, 0)),
                pl.BlockSpec((1, 1, m_pad, d_pad), lambda b, h, i, *_: (b, h // groups, 0, 0)),
                pl.BlockSpec((1, 1, q_block, d_pad), lambda b, h, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, q_block, LSE_LANES), lambda b, h, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, q_block, LSE_LANES), lambda b, h, i, *_: (b, h, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, q_block, d_pad), lambda b, h, i, *_: (b, h, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, n_pad, d_pad), q.dtype),
        interpret=interpret,
    )(off, kvl, qp, kp, vp, gp, lse, delta)

    # ---- dk/dv: grid over key blocks, one partial per QUERY head (GQA
    # partials are reduced over the group below)
    dkv_kernel = functools.partial(_bwd_dkv_kernel, n_pad=n_pad, **static)

    def dkv_wrap(o_r, kv_r, q_r, k_r, v_r, do_r, lse_r, dl_r, dk_r, dv_r):
        dkv_kernel(o_r, kv_r, q_r.at[0, 0], k_r.at[0, 0], v_r.at[0, 0],
                   do_r.at[0, 0], lse_r.at[0, 0], dl_r.at[0, 0],
                   dk_r.at[0, 0], dv_r.at[0, 0])

    dk, dv = pl.pallas_call(
        dkv_wrap,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, Hq, m_pad // block_k),
            in_specs=[
                pl.BlockSpec((1, 1, n_pad, d_pad), lambda b, h, j, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, block_k, d_pad), lambda b, h, j, *_: (b, h // groups, j, 0)),
                pl.BlockSpec((1, 1, block_k, d_pad), lambda b, h, j, *_: (b, h // groups, j, 0)),
                pl.BlockSpec((1, 1, n_pad, d_pad), lambda b, h, j, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, n_pad, LSE_LANES), lambda b, h, j, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, n_pad, LSE_LANES), lambda b, h, j, *_: (b, h, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_k, d_pad), lambda b, h, j, *_: (b, h, j, 0)),
                pl.BlockSpec((1, 1, block_k, d_pad), lambda b, h, j, *_: (b, h, j, 0)),
            ),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, Hq, m_pad, d_pad), k.dtype),
                   jax.ShapeDtypeStruct((B, Hq, m_pad, d_pad), v.dtype)),
        interpret=interpret,
    )(off, kvl, qp, kp, vp, gp, lse, delta)

    # reduce GQA partials: query head h contributes to kv head h // groups
    dk = dk.reshape(B, H, groups, m_pad, d_pad).sum(axis=2)
    dv = dv.reshape(B, H, groups, m_pad, d_pad).sum(axis=2)

    return (dq[:, :, :N, :D], dk[:, :, :M, :D], dv[:, :, :M, :D])


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


def _use_kernel_bwd(q) -> bool:
    """The fused backward tiles at 128×128; use it at training shapes and
    fall back to the rematerialized reference at tiny decode shapes."""
    return min(128, _round_up(q.shape[-2], 8)) == 128


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def flash_attend(q, k, v, offset, kv_len, config):
    """config: a `make_config(...)` tuple of the static kwargs."""
    return flash_attend_fwd(q, k, v, offset, kv_len, **dict(config))


def _fwd(q, k, v, offset, kv_len, config):
    if _use_kernel_bwd(q):
        out, lse = flash_attend_fwd(q, k, v, offset, kv_len, return_lse=True,
                                    **dict(config))
        return out, (q, k, v, out, lse, offset, kv_len)
    out = flash_attend_fwd(q, k, v, offset, kv_len, **dict(config))
    return out, (q, k, v, None, None, offset, kv_len)


def _bwd(config, residuals, g):
    q, k, v, out, lse, offset, kv_len = residuals

    if lse is not None:
        dq, dk, dv = flash_attend_bwd(q, k, v, out, lse, g, offset, kv_len,
                                      **dict(config))
        return dq, dk, dv, None, None

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
