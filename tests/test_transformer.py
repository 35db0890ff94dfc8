"""AxialSpaceTimeTransformer tests.

The central invariant (mirroring reference test_dreamer.py:1209-1296): a full
parallel forward must match the frame-by-frame KV-cached forward to numerical
tolerance, for every cache-bearing configuration.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer4_tpu.models.transformer import AxialSpaceTimeTransformer


def build(model, b=2, t=5, s=7, d=32, seed=0):
    key = jax.random.PRNGKey(seed)
    tokens = jax.random.normal(key, (b, t, s, d))
    params = model.init(jax.random.PRNGKey(1), tokens)
    return params, tokens


@pytest.mark.parametrize('time_block_every', [1, 2])
@pytest.mark.parametrize('query_heads', [None, 8])
@pytest.mark.parametrize('use_attn_pool', [False, True])
def test_parallel_matches_cached(time_block_every, query_heads, use_attn_pool):
    model = AxialSpaceTimeTransformer(
        dim=32,
        depth=2,
        attn_heads=4,
        attn_dim_head=8,
        query_heads=query_heads,
        time_block_every=time_block_every,
        num_special_tokens=2,
        use_attn_pool=use_attn_pool,
    )
    params, tokens = build(model)
    b, t, s, d = tokens.shape

    parallel_out, _ = model.apply(params, tokens)

    cache = model.init_cache(b, s, max_time=t)
    outs = []
    for i in range(t):
        out_i, cache = model.apply(params, tokens[:, i : i + 1], cache=cache)
        outs.append(out_i)
    sequential_out = jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(
        np.asarray(parallel_out), np.asarray(sequential_out), atol=2e-5, rtol=1e-4
    )


def test_parallel_pass_builds_usable_cache():
    """Parallel prompt pass with max_time builds a cache that continues
    identically to having decoded the prompt frame by frame."""
    model = AxialSpaceTimeTransformer(
        dim=32, depth=2, attn_heads=4, attn_dim_head=8, time_block_every=2,
        num_special_tokens=1,
    )
    params, tokens = build(model, t=6)
    b, t, s, d = tokens.shape
    prompt, rest = tokens[:, :3], tokens[:, 3:]

    parallel_out, _ = model.apply(params, tokens)

    # prompt processed in parallel, building the cache
    _, cache = model.apply(params, prompt, max_time=t)
    outs = []
    for i in range(rest.shape[1]):
        out_i, cache = model.apply(params, rest[:, i : i + 1], cache=cache)
        outs.append(out_i)
    decoded = jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(
        np.asarray(parallel_out[:, 3:]), np.asarray(decoded), atol=2e-5, rtol=1e-4
    )


def test_cached_forward_with_history_processes_last_frame():
    """Passing the full history plus cache only computes the newest frame and
    returns earlier frames untouched (reference `dreamer4.py:2956-2962`)."""
    model = AxialSpaceTimeTransformer(
        dim=16, depth=1, attn_heads=2, attn_dim_head=8, time_block_every=1,
        num_special_tokens=0,
    )
    params, tokens = build(model, t=4, s=3, d=16)
    b, t, s, d = tokens.shape

    cache = model.init_cache(b, s, max_time=t)
    out_full = None
    for i in range(t):
        history = tokens[:, : i + 1]
        out_full, cache = model.apply(params, history, cache=cache)
    # earlier frames are the raw inputs
    np.testing.assert_allclose(np.asarray(out_full[:, :-1]), np.asarray(tokens[:, :-1]))


def test_special_tokens_do_not_leak_to_modality():
    """With num_special_tokens, modality outputs must be invariant to special
    token contents (default masking direction)."""
    model = AxialSpaceTimeTransformer(
        dim=16, depth=1, attn_heads=2, attn_dim_head=8, time_block_every=2,
        num_special_tokens=2, use_attn_pool=False, final_norm=False,
    )
    params, tokens = build(model, t=2, s=6, d=16)

    out1, _ = model.apply(params, tokens)
    perturbed = tokens.at[:, :, -2:].add(10.0)
    out2, _ = model.apply(params, perturbed)

    # modality tokens (first 4) see no difference; special tokens do
    np.testing.assert_allclose(np.asarray(out1[:, :, :4]), np.asarray(out2[:, :, :4]), atol=1e-5)
    assert not np.allclose(np.asarray(out1[:, :, 4:]), np.asarray(out2[:, :, 4:]), atol=1e-3)


def test_special_attend_only_itself_direction():
    """Decoder direction: special (latent) outputs invariant to modality
    contents is NOT expected; instead modality may read special, and special
    cannot read modality."""
    model = AxialSpaceTimeTransformer(
        dim=16, depth=1, attn_heads=2, attn_dim_head=8, time_block_every=2,
        num_special_tokens=2, special_attend_only_itself=True,
        use_attn_pool=False, final_norm=False,
    )
    params, tokens = build(model, t=2, s=6, d=16)

    out1, _ = model.apply(params, tokens)
    perturbed = tokens.at[:, :, :4].add(10.0)
    out2, _ = model.apply(params, perturbed)

    # special tokens (last 2) cannot see modality changes
    np.testing.assert_allclose(np.asarray(out1[:, :, 4:]), np.asarray(out2[:, :, 4:]), atol=1e-5)
    assert not np.allclose(np.asarray(out1[:, :, :4]), np.asarray(out2[:, :, :4]), atol=1e-3)


def test_rnn_time_cached_equivalence():
    model = AxialSpaceTimeTransformer(
        dim=16, depth=2, attn_heads=2, attn_dim_head=8, time_block_every=2,
        num_special_tokens=1, rnn_time=True,
    )
    params, tokens = build(model, t=4, s=4, d=16)
    b, t, s, d = tokens.shape

    parallel_out, _ = model.apply(params, tokens)

    cache = model.init_cache(b, s, max_time=t)
    outs = []
    for i in range(t):
        out_i, cache = model.apply(params, tokens[:, i : i + 1], cache=cache)
        outs.append(out_i)
    sequential_out = jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(
        np.asarray(parallel_out), np.asarray(sequential_out), atol=2e-5, rtol=1e-4
    )


def test_intermediates_shapes():
    model = AxialSpaceTimeTransformer(
        dim=16, depth=4, attn_heads=2, attn_dim_head=8, time_block_every=2,
        num_special_tokens=1,
    )
    params, tokens = build(model, t=3, s=4, d=16)
    out, interm = model.apply(params, tokens, return_intermediates=True)
    assert out.shape == tokens.shape
    assert interm.normed_time_inputs.shape[0] == 2    # 2 time layers
    assert interm.normed_space_inputs.shape[0] == 2   # 2 space layers
    assert len(interm.layer_hiddens) == 1 + 2 * 4


def test_attention_pool_matches_stacked_attention():
    """The streaming AttentionPool (per-hidden projections, batched score/out
    einsums — no (B, L, d) context stack) is numerically identical to the
    generic Attention module run over the stacked hiddens with the same
    params (the two share a parameter tree by construction)."""
    import jax.numpy as jnp

    from dreamer4_tpu.nn.attention import Attention, AttentionPool

    pool = AttentionPool(dim=64, heads=4, dim_head=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 5, 64))
    hiddens = [jax.random.normal(jax.random.PRNGKey(i + 1), (2, 3, 5, 64))
               for i in range(7)]
    vs = pool.init(jax.random.PRNGKey(42), x, hiddens)
    out_pool = pool.apply(vs, x, hiddens)

    attn = Attention(dim=64, heads=4, dim_head=16, gate_values=True,
                     value_residual=False, belief_attn=False,
                     pre_rmsnorm=True, pre_context_rmsnorm=True)
    ctx = jnp.stack(hiddens, axis=-2).reshape(-1, 7, 64)
    out_ref = attn.apply({'params': vs['params']['attn']},
                         x.reshape(-1, 1, 64), context=ctx).out.reshape(x.shape)
    assert jnp.allclose(out_pool, out_ref, atol=1e-5)


def test_pool_streaming_matches_stacked_branch():
    """_StreamingPoolAttention's decode branch (per-hidden projections) and
    train branch (stacked wide matmul) are the same math on the same params;
    both must also accept list and stacked inputs."""
    import numpy as np

    from dreamer4_tpu.nn.attention import (_StreamingPoolAttention,
                                           rms_normalize)

    B, d, L = 24, 32, 5
    x = jax.random.normal(jax.random.PRNGKey(0), (B, d))
    hiddens = [jax.random.normal(jax.random.PRNGKey(i + 1), (B, d))
               for i in range(L)]
    normed = [rms_normalize(h) for h in hiddens]
    stacked = jnp.stack(normed)

    stream = _StreamingPoolAttention(dim=d, heads=2, dim_head=8,
                                     stream_max_tokens=10_000)
    wide = _StreamingPoolAttention(dim=d, heads=2, dim_head=8,
                                   stream_max_tokens=0)
    params = stream.init(jax.random.PRNGKey(9), x, normed)
    outs = [stream.apply(params, x, normed),
            stream.apply(params, x, stacked),
            wide.apply(params, x, normed),
            wide.apply(params, x, stacked)]
    for o in outs[1:]:
        np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(o),
                                   atol=2e-5, rtol=1e-4)
