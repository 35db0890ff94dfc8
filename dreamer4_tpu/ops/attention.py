"""Attention compute core.

`naive_attend` is the pure-jnp reference implementation (mirrors
`dreamer4.py:1683-1756`: GQA, logit softclamp, boolean masks) used for
correctness tests and as the CPU fallback. The fused Pallas TPU kernel in
`flash_attention.py` must match it to numerical tolerance — the same
invariant the reference enforces between flex and naive attention
(test_dreamer.py:241-281).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .utils import softclamp

NEG_INF = -1e30


def naive_attend(
    q: jax.Array,  # (b, hq, i, d)
    k: jax.Array,  # (b, h,  j, d)
    v: jax.Array,  # (b, h,  j, d)
    mask: jax.Array | None = None,  # broadcastable to (b, h, g, i, j) or (i, j)
    softclamp_value: float | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Grouped-query attention with optional softclamp and boolean mask.
    Causal/special masking is passed in via `mask` (see ops/masks.py)."""
    hq, hk = q.shape[-3], k.shape[-3]
    assert hq % hk == 0
    groups = hq // hk

    if scale is None:
        scale = q.shape[-1] ** -0.5

    q = q.reshape(*q.shape[:-3], hk, groups, *q.shape[-2:])  # (b, h, g, i, d)

    # scores and softmax in f32 (matching the Pallas kernel's accumulator
    # semantics); the PV matmul runs back in the input dtype so a bf16
    # stream stays bf16 end to end
    sim = jnp.einsum('...hgid,...hjd->...hgij', q, k,
                     preferred_element_type=jnp.float32) * scale

    if softclamp_value is not None:
        sim = softclamp(sim, softclamp_value)

    if mask is not None:
        sim = jnp.where(mask, sim, NEG_INF)

    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)

    out = jnp.einsum('...hgij,...hjd->...hgid', attn, v)
    return out.reshape(*out.shape[:-4], hq, *out.shape[-2:])
