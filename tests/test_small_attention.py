"""Parity tests for the small-shape fused attention kernel
(`ops/small_attention.py`) against `naive_attend` — values AND gradients,
in interpret mode on the CPU mesh (the reference's flex-vs-naive invariant,
test_dreamer.py:241-281, at the sub-flash design point)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import pytest

from dreamer4_tpu.ops.attention import naive_attend
from dreamer4_tpu.ops.masks import build_attend_mask
from dreamer4_tpu.ops.small_attention import small_attend


def _ref(q, k, v, mask, softclamp):
    # naive_attend takes (B, h, n, dh)
    to_h = lambda x: x.swapaxes(-3, -2)
    out = naive_attend(to_h(q), to_h(k), to_h(v), mask=mask,
                       softclamp_value=softclamp)
    return out.swapaxes(-3, -2)


@pytest.mark.parametrize('mask_kind', ['none', 'causal', 'special'])
@pytest.mark.parametrize('softclamp', [50.0, None])
def test_small_attend_matches_naive(mask_kind, softclamp):
    B, n, h, dh = 6, 11, 4, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, n, h, dh)) for kk in ks)
    mask = None
    if mask_kind == 'causal':
        mask = build_attend_mask(n, n, causal=True)
    elif mask_kind == 'special':
        mask = build_attend_mask(n, n, num_special=2, block_size_per_special=n,
                                 special_attend_only_itself=True)
    out = small_attend(q, k, v, mask=mask, softclamp_value=softclamp,
                       interpret=True)
    ref = _ref(q, k, v, mask, softclamp)
    assert jnp.allclose(out, ref, atol=1e-5), float(jnp.abs(out - ref).max())


def test_small_attend_grads_match_naive():
    B, n, h, dh = 4, 9, 2, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (B, n, h, dh)) for kk in ks)
    mask = build_attend_mask(n, n, causal=True)

    def loss_kernel(q, k, v):
        out = small_attend(q, k, v, mask=mask, softclamp_value=30.0,
                           interpret=True)
        return jnp.sum(jnp.sin(out))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_ref(q, k, v, mask, 30.0)))

    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gk, gr, name in zip(g_kernel, g_ref, 'qkv'):
        assert jnp.allclose(gk, gr, atol=1e-4), (name, float(jnp.abs(gk - gr).max()))


def test_small_attend_bf16_path():
    B, n, h, dh = 8, 27, 8, 64  # the trunk's space-attention shape
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (jax.random.normal(kk, (B, n, h, dh), jnp.bfloat16) for kk in ks)
    mask = build_attend_mask(n, n, num_special=1, block_size_per_special=n)
    out = small_attend(q, k, v, mask=mask, interpret=True)
    ref = _ref(q, k, v, mask, 50.0)
    assert out.dtype == jnp.bfloat16
    assert jnp.allclose(out.astype(jnp.float32), ref.astype(jnp.float32),
                        atol=3e-2)
