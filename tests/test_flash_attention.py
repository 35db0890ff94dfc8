"""Pallas fused attention vs naive reference — the kernel-parity invariant
(mirrors reference test_dreamer.py:241-281, flex vs naive). Runs in
interpret mode on CPU; the same kernel compiles on TPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer4_tpu.ops.attention import naive_attend
from dreamer4_tpu.ops.flash_attention import flash_attend, make_config
from dreamer4_tpu.ops.masks import build_attend_mask


def run_pair(q, k, v, *, causal=False, softclamp=50.0, num_special=0,
             special_seq_len=0, special_only_itself=False, offset=0, kv_len=None):
    M = k.shape[-2]
    kv_len = kv_len if kv_len is not None else M

    cfg = make_config(softclamp_value=softclamp, causal=causal,
                      num_special=num_special, special_seq_len=special_seq_len,
                      special_attend_only_itself=special_only_itself, interpret=True)
    out_kernel = flash_attend(q, k, v, jnp.int32(offset), jnp.int32(kv_len), cfg)

    mask = build_attend_mask(
        q.shape[-2], M, causal=causal, causal_offset=offset,
        num_special=num_special,
        block_size_per_special=special_seq_len if special_seq_len else M,
        special_attend_only_itself=special_only_itself)
    valid = jnp.arange(M)[None, :] < kv_len
    mask = valid & (mask if mask is not None else True)
    out_ref = naive_attend(q, k, v, mask=mask, softclamp_value=softclamp)
    return out_kernel, out_ref


@pytest.mark.parametrize('causal', [False, True])
@pytest.mark.parametrize('softclamp', [None, 50.0])
@pytest.mark.parametrize('gqa', [False, True])
def test_kernel_matches_naive(causal, softclamp, gqa):
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    hq, h = (8, 4) if gqa else (4, 4)
    q = jax.random.normal(kq, (2, hq, 64, 32))
    k = jax.random.normal(kk, (2, h, 64, 32))
    v = jax.random.normal(kv_, (2, h, 64, 32))

    out_kernel, out_ref = run_pair(q, k, v, causal=causal, softclamp=softclamp)
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize('special_only_itself', [False, True])
def test_kernel_special_token_mask(special_only_itself):
    key = jax.random.PRNGKey(1)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 2, 24, 16))
    k = jax.random.normal(kk, (1, 2, 24, 16))
    v = jax.random.normal(kv_, (1, 2, 24, 16))

    out_kernel, out_ref = run_pair(q, k, v, num_special=3, special_seq_len=24,
                                   special_only_itself=special_only_itself)
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_ref),
                               atol=2e-5, rtol=1e-4)


def test_kernel_cached_decode_semantics():
    """Single query over a partially-filled KV buffer with causal offset."""
    key = jax.random.PRNGKey(2)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 2, 1, 16))
    k = jax.random.normal(kk, (1, 2, 32, 16))   # buffer of 32, only 5 valid
    v = jax.random.normal(kv_, (1, 2, 32, 16))

    out_kernel, out_ref = run_pair(q, k, v, causal=True, offset=4, kv_len=5)
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_ref),
                               atol=2e-5, rtol=1e-4)


def test_kernel_backward_matches_naive():
    key = jax.random.PRNGKey(3)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 2, 16, 16))
    k = jax.random.normal(kk, (1, 2, 16, 16))
    v = jax.random.normal(kv_, (1, 2, 16, 16))

    cfg = make_config(causal=True, interpret=True)

    def f_kernel(q, k, v):
        return flash_attend(q, k, v, jnp.int32(0), jnp.int32(16), cfg).sum()

    def f_ref(q, k, v):
        mask = build_attend_mask(16, 16, causal=True)
        return naive_attend(q, k, v, mask=mask, softclamp_value=50.0).sum()

    g_kernel = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_kernel, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize('causal,softclamp,gqa,num_special', [
    (True, 50.0, False, 0),
    (True, None, True, 0),
    (False, 50.0, False, 4),
    (True, 50.0, True, 4),
])
def test_fused_backward_matches_naive(causal, softclamp, gqa, num_special):
    """At training shapes (N >= 128) the backward runs the fused Pallas
    kernels (dq + dk/dv from saved LSE); gradients must match the dense
    reference across the whole mask family."""
    key = jax.random.PRNGKey(4)
    kq, kk, kv_, kg = jax.random.split(key, 4)
    hq, h = (4, 2) if gqa else (2, 2)
    N = 128
    q = jax.random.normal(kq, (1, hq, N, 32))
    k = jax.random.normal(kk, (1, h, N, 32))
    v = jax.random.normal(kv_, (1, h, N, 32))
    g = jax.random.normal(kg, (1, hq, N, 32))
    special_seq_len = 32 if num_special else 0

    cfg = make_config(causal=causal, softclamp_value=softclamp,
                      num_special=num_special, special_seq_len=special_seq_len,
                      interpret=True)

    def f_kernel(q, k, v):
        return (flash_attend(q, k, v, jnp.int32(0), jnp.int32(N), cfg) * g).sum()

    def f_ref(q, k, v):
        mask = build_attend_mask(N, N, causal=causal, num_special=num_special,
                                 block_size_per_special=special_seq_len or N)
        return (naive_attend(q, k, v, mask=mask, softclamp_value=softclamp) * g).sum()

    g_kernel = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_kernel, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3)


def test_fused_backward_unaligned_and_kv_len():
    """N not a multiple of 128 (padded rows) + a kv validity length shorter
    than the buffer + a causal offset — the cached-training corner cases."""
    key = jax.random.PRNGKey(5)
    kq, kk, kv_, kg = jax.random.split(key, 4)
    N, M, kv_len, offset = 130, 192, 150, 20
    q = jax.random.normal(kq, (1, 2, N, 16))
    k = jax.random.normal(kk, (1, 2, M, 16))
    v = jax.random.normal(kv_, (1, 2, M, 16))
    g = jax.random.normal(kg, (1, 2, N, 16))

    cfg = make_config(causal=True, interpret=True)

    def f_kernel(q, k, v):
        return (flash_attend(q, k, v, jnp.int32(offset), jnp.int32(kv_len), cfg) * g).sum()

    def f_ref(q, k, v):
        mask = build_attend_mask(N, M, causal=True, causal_offset=offset)
        valid = jnp.arange(M)[None, :] < kv_len
        return (naive_attend(q, k, v, mask=mask & valid, softclamp_value=50.0) * g).sum()

    g_kernel = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_kernel, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3)


def test_transformer_flash_matches_naive():
    """Full transformer forward with the fused kernel (interpret mode on CPU)
    equals the dense-mask jnp path."""
    from dreamer4_tpu.models.transformer import AxialSpaceTimeTransformer

    kwargs = dict(dim=16, depth=2, attn_heads=2, attn_dim_head=8,
                  time_block_every=2, num_special_tokens=2)
    model = AxialSpaceTimeTransformer(**kwargs)
    model_flash = AxialSpaceTimeTransformer(**kwargs, use_flash_attention=True, flash_min_scores=0)

    tokens = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 5, 16))
    params = model.init(jax.random.PRNGKey(1), tokens)

    out, _ = model.apply(params, tokens)
    out_flash, _ = model_flash.apply(params, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_flash),
                               atol=2e-5, rtol=1e-4)


def test_transformer_flash_cached_decode():
    from dreamer4_tpu.models.transformer import AxialSpaceTimeTransformer

    model = AxialSpaceTimeTransformer(
        dim=16, depth=2, attn_heads=2, attn_dim_head=8, time_block_every=2,
        num_special_tokens=1, use_flash_attention=True, flash_min_scores=0)
    tokens = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 16))
    params = model.init(jax.random.PRNGKey(1), tokens)

    parallel_out, _ = model.apply(params, tokens)
    cache = model.init_cache(2, 4, max_time=4)
    outs = []
    for i in range(4):
        out_i, cache = model.apply(params, tokens[:, i:i + 1], cache=cache)
        outs.append(out_i)
    sequential = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(parallel_out), np.asarray(sequential),
                               atol=2e-5, rtol=1e-4)
