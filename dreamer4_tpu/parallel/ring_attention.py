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
) -> jax.Array:
    """Must be called inside shard_map with q/k/v time-sharded over
    `axis_name`. GQA is supported (q heads a multiple of kv heads)."""
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
