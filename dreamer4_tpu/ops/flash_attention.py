"""Pallas TPU fused attention kernels.

The TPU-native equivalent of the reference's flex-attention path
(`dreamer4.py:100-109, 1841-1852`): fused kernels covering the full mask
family this framework needs —

  - logit softclamp (Gemma-style tanh)
  - block-causal masking with a (traced) KV-cache offset
  - special-tokens-right masking in either direction
  - grouped-query attention (query heads a multiple of kv heads)
  - a KV validity length (cached decode over preallocated buffers)

Design (flash-attention-2 on the Mosaic pipeline): the grid iterates
(batch, q-head, q-block, KV-block) with the KV-block dimension marked
`arbitrary` (sequential) — online-softmax state lives in VMEM scratch that
persists across KV iterations, so only one KV tile is resident at a time
(O(1) VMEM in sequence length; the round-1 design kept full K/V resident
and hit the 16 MB VMEM wall at N=8192). Mask predicates are evaluated from
block iotas inside the kernel — nothing is materialized in HBM — and
fully-masked KV tiles are skipped via `pl.when` (causal halves the work).
MXU dots run in the input dtype (native bf16 when the model is bf16) with
f32 accumulation.

The public entry `flash_attend` carries a custom VJP. At training shapes
(q_block == 128) the backward is a pair of fused kernels — dq gridded over
(q-block, kv-block), dk/dv gridded over (kv-block, q-block) — recomputing
probabilities from the forward-saved log-sum-exp (O(N) memory). At tiny
decode shapes the backward falls back to the rematerialized reference
attention (gradients are rarely needed there). `naive_attend` parity for
values AND gradients is tested in interpret mode on CPU (the reference's
flex-vs-naive invariant, test_dreamer.py:241-281).
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


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mask_block(q_pos, k_pos, kv_len, offset, *, causal, num_special,
                special_seq_len, special_attend_only_itself):
    """The shared mask-predicate family, evaluated from iotas."""
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


def _block_relevant(q_start, q_block, k_start, block_k, kv_len, offset, causal):
    """Whether any (q, k) pair in this tile can be unmasked — used to skip
    whole KV tiles (the causal lower triangle and invalid cache tail)."""
    relevant = k_start < kv_len
    if causal:
        relevant &= k_start <= q_start + q_block - 1 + offset
    return relevant


# ---------------------------------------------------------------- forward

def _attn_kernel(
    offset_ref, kvlen_ref,          # scalar prefetch: (1,) int32 each
    q_ref,                          # (1, 1, q_block, d_pad)
    k_ref, v_ref,                   # (1, 1, block_k, d_pad)
    o_ref,                          # (1, 1, q_block, d_pad)
    lse_ref,                        # (1, 1, q_block, LSE_LANES) | None
    m_scr, l_scr,                   # (q_block, LSE_LANES) f32 scratch
    acc_scr,                        # (q_block, d_pad) f32 scratch
    *, scale, softclamp, causal, num_special, special_seq_len,
    special_attend_only_itself, block_k, q_block,
):
    i, j = pl.program_id(2), pl.program_id(3)
    nj = pl.num_programs(3)
    offset = offset_ref[0]
    kv_len = kvlen_ref[0]
    q_start = i * q_block
    k_start = j * block_k

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(_block_relevant(q_start, q_block, k_start, block_k, kv_len,
                             offset, causal))
    def _update():
        # MXU dots in the input dtype (native bf16 fast path); f32 accum
        q = q_ref[0, 0]
        k_blk = k_ref[0, 0]
        v_blk = v_ref[0, 0]

        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        if softclamp is not None:
            s = jnp.tanh(s / softclamp) * softclamp

        q_pos = jax.lax.broadcasted_iota(jnp.int32, (q_block, block_k), 0) + q_start
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (q_block, block_k), 1) + k_start
        mask = _mask_block(q_pos, k_pos, kv_len, offset, causal=causal,
                           num_special=num_special, special_seq_len=special_seq_len,
                           special_attend_only_itself=special_attend_only_itself)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)

        l_new = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == nj - 1)
    def _finalize():
        l = jnp.maximum(l_scr[:, 0:1], 1e-30)
        o_ref[0, 0] = (acc_scr[:] / l).astype(o_ref.dtype)
        if lse_ref is not None:
            lse = m_scr[:, 0:1] + jnp.log(l)
            lse_ref[0, 0] = jnp.broadcast_to(lse, (q_block, LSE_LANES))


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
    )

    out_specs = [pl.BlockSpec((1, 1, q_block, d_pad), lambda b, h, i, j, *_: (b, h, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((B, Hq, n_pad, d_pad), q.dtype)]
    if return_lse:
        out_specs.append(pl.BlockSpec((1, 1, q_block, LSE_LANES),
                                      lambda b, h, i, j, *_: (b, h, i, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, Hq, n_pad, LSE_LANES), jnp.float32))

        def kernel_wrap(o_r, kv_r, q_r, k_r, v_r, out_r, lse_r, m_s, l_s, a_s):
            kernel(o_r, kv_r, q_r, k_r, v_r, out_r, lse_r, m_s, l_s, a_s)
    else:
        def kernel_wrap(o_r, kv_r, q_r, k_r, v_r, out_r, m_s, l_s, a_s):
            kernel(o_r, kv_r, q_r, k_r, v_r, out_r, None, m_s, l_s, a_s)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hq, n_pad // q_block, m_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, q_block, d_pad), lambda b, h, i, j, *_: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, d_pad), lambda b, h, i, j, *_: (b, h // groups, j, 0)),
            pl.BlockSpec((1, 1, block_k, d_pad), lambda b, h, i, j, *_: (b, h // groups, j, 0)),
        ],
        out_specs=tuple(out_specs) if return_lse else out_specs[0],
        scratch_shapes=[
            pltpu.VMEM((q_block, LSE_LANES), jnp.float32),
            pltpu.VMEM((q_block, LSE_LANES), jnp.float32),
            pltpu.VMEM((q_block, d_pad), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        kernel_wrap,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape) if return_lse else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel', 'arbitrary')),
        interpret=interpret,
    )(jnp.asarray([offset], jnp.int32), jnp.asarray([kv_len], jnp.int32), qp, kp, vp)

    if return_lse:
        out, lse = out
        return out[:, :, :N, :D], lse[..., 0]   # (B, Hq, n_pad)
    return out[:, :, :N, :D]


# ------------------------------------------------------------ fused backward

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
                   lse_ref, delta_ref, dq_ref, dq_scr, *, scale, softclamp,
                   causal, num_special, special_seq_len,
                   special_attend_only_itself, block_k, q_block):
    i, j = pl.program_id(2), pl.program_id(3)
    nj = pl.num_programs(3)
    offset = offset_ref[0]
    kv_len = kvlen_ref[0]
    q_start = i * q_block
    k_start = j * block_k

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(_block_relevant(q_start, q_block, k_start, block_k, kv_len,
                             offset, causal))
    def _update():
        q = q_ref[0, 0]
        k_blk = k_ref[0, 0]
        v_blk = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, 0:1]
        delta = delta_ref[0, 0][:, 0:1]

        q_pos = jax.lax.broadcasted_iota(jnp.int32, (q_block, block_k), 0) + q_start
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (q_block, block_k), 1) + k_start
        mask = _mask_block(q_pos, k_pos, kv_len, offset, causal=causal,
                           num_special=num_special, special_seq_len=special_seq_len,
                           special_attend_only_itself=special_attend_only_itself)
        _, ds = _recompute_p_ds(q, k_blk, v_blk, do, lse, delta, mask,
                                scale=scale, softclamp=softclamp)
        dq_scr[:] = dq_scr[:] + jnp.dot(ds.astype(k_blk.dtype), k_blk,
                                        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _finalize():
        dq_ref[0, 0] = (dq_scr[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(offset_ref, kvlen_ref, q_ref, k_ref, v_ref, do_ref,
                    lse_ref, delta_ref, dk_ref, dv_ref, dk_scr, dv_scr, *,
                    scale, softclamp, causal, num_special, special_seq_len,
                    special_attend_only_itself, block_k, q_block):
    j, i = pl.program_id(2), pl.program_id(3)   # note: kv block outer, q inner
    ni = pl.num_programs(3)
    offset = offset_ref[0]
    kv_len = kvlen_ref[0]
    q_start = i * q_block
    k_start = j * block_k

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(_block_relevant(q_start, q_block, k_start, block_k, kv_len,
                             offset, causal))
    def _update():
        q = q_ref[0, 0]
        k_blk = k_ref[0, 0]
        v_blk = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, 0:1]
        delta = delta_ref[0, 0][:, 0:1]

        q_pos = jax.lax.broadcasted_iota(jnp.int32, (q_block, block_k), 0) + q_start
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (q_block, block_k), 1) + k_start
        mask = _mask_block(q_pos, k_pos, kv_len, offset, causal=causal,
                           num_special=num_special, special_seq_len=special_seq_len,
                           special_attend_only_itself=special_attend_only_itself)
        p, ds = _recompute_p_ds(q, k_blk, v_blk, do, lse, delta, mask,
                                scale=scale, softclamp=softclamp)
        dv_scr[:] = dv_scr[:] + jnp.dot(p.astype(do.dtype).T, do,
                                        preferred_element_type=jnp.float32)
        dk_scr[:] = dk_scr[:] + jnp.dot(ds.astype(q.dtype).T, q,
                                        preferred_element_type=jnp.float32)

    @pl.when(i == ni - 1)
    def _finalize():
        dk_ref[0, 0] = (dk_scr[:] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=('scale', 'softclamp_value', 'causal', 'num_special',
                     'special_seq_len', 'special_attend_only_itself', 'interpret'))
def flash_attend_bwd(
    q, k, v, out, lse, g, offset, kv_len, *,
    scale=None, softclamp_value=50.0, causal=False, num_special=0,
    special_seq_len=0, special_attend_only_itself=False, interpret=False,
):
    """Fused flash-attention backward: dq over (q-block, kv-block), dk/dv
    over (kv-block, q-block), probabilities recomputed from the saved
    log-sum-exp — O(N) memory vs the round-1 dense remat."""
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
    # broadcast over the lane dim for the TPU block-tiling rule
    lse = jnp.broadcast_to(lse[..., None], (*lse.shape, LSE_LANES))
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, LSE_LANES))

    static = dict(scale=scale, softclamp=softclamp_value, causal=causal,
                  num_special=num_special,
                  special_seq_len=special_seq_len if special_seq_len > 0 else m_pad,
                  special_attend_only_itself=special_attend_only_itself,
                  block_k=block_k, q_block=q_block)

    off = jnp.asarray([offset], jnp.int32)
    kvl = jnp.asarray([kv_len], jnp.int32)
    seq_semantics = ('parallel', 'parallel', 'parallel', 'arbitrary')

    # ---- dq: grid (B, Hq, q-blocks, kv-blocks), kv innermost
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **static),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, Hq, n_pad // q_block, m_pad // block_k),
            in_specs=[
                pl.BlockSpec((1, 1, q_block, d_pad), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_k, d_pad), lambda b, h, i, j, *_: (b, h // groups, j, 0)),
                pl.BlockSpec((1, 1, block_k, d_pad), lambda b, h, i, j, *_: (b, h // groups, j, 0)),
                pl.BlockSpec((1, 1, q_block, d_pad), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, q_block, LSE_LANES), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, q_block, LSE_LANES), lambda b, h, i, j, *_: (b, h, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, q_block, d_pad), lambda b, h, i, j, *_: (b, h, i, 0)),
            scratch_shapes=[pltpu.VMEM((q_block, d_pad), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, n_pad, d_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=seq_semantics),
        interpret=interpret,
    )(off, kvl, qp, kp, vp, gp, lse, delta)

    # ---- dk/dv: grid (B, Hq, kv-blocks, q-blocks), q innermost; one
    # partial per QUERY head (GQA partials reduced over the group below)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **static),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, Hq, m_pad // block_k, n_pad // q_block),
            in_specs=[
                pl.BlockSpec((1, 1, q_block, d_pad), lambda b, h, j, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_k, d_pad), lambda b, h, j, i, *_: (b, h // groups, j, 0)),
                pl.BlockSpec((1, 1, block_k, d_pad), lambda b, h, j, i, *_: (b, h // groups, j, 0)),
                pl.BlockSpec((1, 1, q_block, d_pad), lambda b, h, j, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, q_block, LSE_LANES), lambda b, h, j, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, q_block, LSE_LANES), lambda b, h, j, i, *_: (b, h, i, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_k, d_pad), lambda b, h, j, i, *_: (b, h, j, 0)),
                pl.BlockSpec((1, 1, block_k, d_pad), lambda b, h, j, i, *_: (b, h, j, 0)),
            ),
            scratch_shapes=[pltpu.VMEM((block_k, d_pad), jnp.float32),
                            pltpu.VMEM((block_k, d_pad), jnp.float32)],
        ),
        out_shape=(jax.ShapeDtypeStruct((B, Hq, m_pad, d_pad), k.dtype),
                   jax.ShapeDtypeStruct((B, Hq, m_pad, d_pad), v.dtype)),
        compiler_params=pltpu.CompilerParams(dimension_semantics=seq_semantics),
        interpret=interpret,
    )(off, kvl, qp, kp, vp, gp, lse, delta)

    # reduce GQA partials: query head h contributes to kv head h // groups
    dk = dk.reshape(B, H, groups, m_pad, d_pad).sum(axis=2)
    dv = dv.reshape(B, H, groups, m_pad, d_pad).sum(axis=2)

    return (dq[:, :, :N, :D], dk[:, :, :M, :D], dv[:, :, :M, :D])


def _reference_attend(q, k, v, offset, kv_len, *, scale, softclamp_value, causal,
                      num_special, special_seq_len, special_attend_only_itself):
    """jnp reference with identical semantics (backward fallback + parity)."""
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
