"""Ring attention — sequence/context parallelism over the time axis.

A genuinely new capability vs the reference, which has no sequence
parallelism of any kind (SURVEY.md section 2.8): the time axis is sharded
across mesh devices, each device computes attention of its local queries
against rotating key/value blocks, and blocks travel around the ring via
`jax.lax.ppermute` (lowered onto ICI neighbor links). Online softmax
accumulates across ring steps, so no device ever materializes the full
sequence — context length scales linearly with the ring size.

Usage (inside shard_map over a mesh axis `sp`):

    out = ring_attend(q_local, k_local, v_local, axis_name='sp', causal=True)

with q/k/v sharded on their sequence dim over `sp`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.utils import softclamp as softclamp_fn

NEG_INF = -1e30


def _block_attend(q, k, v, scale, softclamp_value, mask):
    """One (local-q, remote-kv) block: returns (max, sumexp, acc)."""
    s = jnp.einsum('...hid,...hjd->...hij', q, k) * scale
    if softclamp_value is not None:
        s = softclamp_fn(s, softclamp_value)
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum('...hij,...hjd->...hid', p, v)
    return m, l, acc


def ring_attend(
    q: jax.Array,   # (b, h, n_local, d)
    k: jax.Array,   # (b, h, n_local, d)
    v: jax.Array,   # (b, h, n_local, d)
    axis_name: str,
    causal: bool = True,
    softclamp_value: float | None = 50.0,
    scale: float | None = None,
    use_flash: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Must be called inside shard_map with q/k/v time-sharded over
    `axis_name`. GQA is supported (q heads a multiple of kv heads).

    With `use_flash=True` each ring block runs the fused Pallas kernels for
    both forward and backward (`flash_ring_attend`) — the round-1 gap where
    the sequence-parallel path fell back to dense jnp block math."""
    if use_flash:
        return flash_ring_attend(
            q, k, v,
            _make_ring_config(axis_name=axis_name, causal=causal,
                              softclamp_value=softclamp_value, scale=scale,
                              interpret=interpret))
    axis_size = jax.lax.axis_size(axis_name)
    my_idx = jax.lax.axis_index(axis_name)

    hq, hk = q.shape[-3], k.shape[-3]
    assert hq % hk == 0
    groups = hq // hk
    if groups > 1:
        k = jnp.repeat(k, groups, axis=-3)
        v = jnp.repeat(v, groups, axis=-3)

    n_local = q.shape[-2]
    if scale is None:
        scale = q.shape[-1] ** -0.5

    # absolute positions of local queries
    q_pos = my_idx * n_local + jnp.arange(n_local)

    m_i = jnp.full((*q.shape[:-1], 1), NEG_INF, jnp.float32)
    l_i = jnp.zeros((*q.shape[:-1], 1), jnp.float32)
    acc = jnp.zeros(q.shape, jnp.float32)

    def ring_step(step, carry):
        m_i, l_i, acc, k_blk, v_blk = carry

        # the kv block currently held originated at device (my_idx - step) % P
        src = (my_idx - step) % axis_size
        k_pos = src * n_local + jnp.arange(n_local)

        mask = None
        if causal:
            mask = k_pos[None, :] <= q_pos[:, None]

        m_b, l_b, acc_b = _block_attend(
            q.astype(jnp.float32), k_blk.astype(jnp.float32),
            v_blk.astype(jnp.float32), scale, softclamp_value, mask)

        m_new = jnp.maximum(m_i, m_b)
        alpha_i = jnp.exp(m_i - m_new)
        alpha_b = jnp.exp(m_b - m_new)
        l_new = l_i * alpha_i + l_b * alpha_b
        acc_new = acc * alpha_i + acc_b * alpha_b

        # rotate kv around the ring (ICI neighbor exchange)
        perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
        k_next = jax.lax.ppermute(k_blk, axis_name, perm)
        v_next = jax.lax.ppermute(v_blk, axis_name, perm)

        return m_new, l_new, acc_new, k_next, v_next

    carry = (m_i, l_i, acc, k, v)
    for step in range(axis_size):
        carry = ring_step(step, carry)
    m_i, l_i, acc, _, _ = carry

    out = acc / jnp.maximum(l_i, 1e-30)
    return out.astype(q.dtype)


# ----------------------------------------------------- flash-kernel ring path

def _make_ring_config(*, axis_name, causal, softclamp_value, scale, interpret):
    return tuple(sorted(dict(axis_name=axis_name, causal=causal,
                             softclamp_value=softclamp_value, scale=scale,
                             interpret=interpret).items()))


def _ring_offsets(axis_name, step):
    """(my_idx, src, causal offset of local queries vs the held kv block)."""
    axis_size = jax.lax.axis_size(axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    src = (my_idx - step) % axis_size
    return my_idx, src


def _rotate(x, axis_name):
    axis_size = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    return jax.lax.ppermute(x, axis_name, perm)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_ring_attend(q, k, v, config):
    """Ring attention where every (local-q, rotating-kv) block runs the
    fused Pallas attention kernel, forward AND backward. The cross-block
    merge uses the kernels' log-sum-exp outputs; the backward rotates kv
    blocks around the ring again with traveling dk/dv accumulators, calling
    the fused backward kernels with the *global* LSE per block (ring
    attention a la Liu et al., built from the flash-attention-2 kernel
    pieces in ops/flash_attention.py)."""
    out, _ = _flash_ring_fwd_impl(q, k, v, dict(config))
    return out


def _flash_ring_fwd_impl(q, k, v, cfg):
    from ..ops.flash_attention import flash_attend_fwd

    axis_name = cfg['axis_name']
    axis_size = jax.lax.axis_size(axis_name)
    n_local = q.shape[-2]
    B, Hq = q.shape[0], q.shape[1]

    o = jnp.zeros(q.shape, jnp.float32)
    lse = jnp.full((B, Hq, n_local), NEG_INF, jnp.float32)

    k_blk, v_blk = k, v
    for step in range(axis_size):
        my_idx, src = _ring_offsets(axis_name, step)
        offset = (my_idx - src) * n_local

        o_b, lse_b = flash_attend_fwd(
            q, k_blk, v_blk, offset.astype(jnp.int32), jnp.int32(n_local),
            scale=cfg['scale'], softclamp_value=cfg['softclamp_value'],
            causal=cfg['causal'], interpret=cfg['interpret'], return_lse=True)
        lse_b = lse_b[:, :, :n_local]

        lse_new = jnp.logaddexp(lse, lse_b)
        w_old = jnp.exp(lse - lse_new)[..., None]
        w_new = jnp.exp(lse_b - lse_new)[..., None]
        o = o * w_old + o_b.astype(jnp.float32) * w_new
        lse = lse_new

        k_blk = _rotate(k_blk, axis_name)
        v_blk = _rotate(v_blk, axis_name)

    return o.astype(q.dtype), lse


def _flash_ring_fwd(q, k, v, config):
    out, lse = _flash_ring_fwd_impl(q, k, v, dict(config))
    return out, (q, k, v, out, lse)


def _flash_ring_bwd(config, residuals, g):
    from ..ops.flash_attention import _round_up, flash_attend_bwd

    cfg = dict(config)
    q, k, v, out, lse = residuals
    axis_name = cfg['axis_name']
    axis_size = jax.lax.axis_size(axis_name)
    n_local = q.shape[-2]

    # pad the global LSE to the kernel's padded row count with +inf-like
    # values so padded-row probabilities recompute to exactly zero
    n_pad = _round_up(n_local, 128)
    lse_pad = jnp.pad(lse, ((0, 0), (0, 0), (0, n_pad - n_local)),
                      constant_values=-NEG_INF)

    dq = jnp.zeros(q.shape, jnp.float32)
    dk_acc = jnp.zeros(k.shape, jnp.float32)
    dv_acc = jnp.zeros(v.shape, jnp.float32)

    k_blk, v_blk = k, v
    for step in range(axis_size):
        my_idx, src = _ring_offsets(axis_name, step)
        offset = (my_idx - src) * n_local

        dq_b, dk_b, dv_b = flash_attend_bwd(
            q, k_blk, v_blk, out, lse_pad, g,
            offset.astype(jnp.int32), jnp.int32(n_local),
            scale=cfg['scale'], softclamp_value=cfg['softclamp_value'],
            causal=cfg['causal'], interpret=cfg['interpret'])
        dq = dq + dq_b.astype(jnp.float32)
        dk_acc = dk_acc + dk_b.astype(jnp.float32)
        dv_acc = dv_acc + dv_b.astype(jnp.float32)

        # rotate the kv blocks AND their gradient accumulators together;
        # after axis_size rotations each accumulator is home again
        k_blk = _rotate(k_blk, axis_name)
        v_blk = _rotate(v_blk, axis_name)
        dk_acc = _rotate(dk_acc, axis_name)
        dv_acc = _rotate(dv_acc, axis_name)

    return dq.astype(q.dtype), dk_acc.astype(k.dtype), dv_acc.astype(v.dtype)


flash_ring_attend.defvjp(_flash_ring_fwd, _flash_ring_bwd)


def make_ring_attention(mesh, axis_name: str, causal: bool = True,
                        softclamp_value: float | None = 50.0):
    """Convenience wrapper: full (b, h, N, d) arrays in, shard_map over the
    sequence dim, ring-attend, gather back out (output stays sharded)."""
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    spec = P(None, None, axis_name, None)

    @partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    def fn(q, k, v):
        return ring_attend(q, k, v, axis_name=axis_name, causal=causal,
                           softclamp_value=softclamp_value)

    return fn
