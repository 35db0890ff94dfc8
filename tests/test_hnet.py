"""Hierarchical temporal transformer (H-Net equivalent): parallel vs
streaming cache equivalence (mirrors reference test_dreamer.py:1520-1599)."""
import jax
import jax.numpy as jnp
import numpy as np

from dreamer4_tpu.models.transformer import AxialSpaceTimeTransformer
from dreamer4_tpu.nn.hnet import HierarchicalTemporalTransformer


def test_hnet_parallel_matches_streaming():
    m = HierarchicalTemporalTransformer(dim=16, depth=1, heads=2, dim_head=8,
                                        compression_ratio=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 16))
    params = m.init(jax.random.PRNGKey(1), x)

    out_par, ratio_loss, _ = m.apply(params, x)
    assert jnp.isfinite(ratio_loss)

    cache = m.init_cache(3, max_chunks=4)
    outs = []
    for i in range(8):
        o, _, cache = m.apply(params, x[:, i:i + 1], cache=cache)
        outs.append(o)
    out_seq = jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(np.asarray(out_par), np.asarray(out_seq),
                               atol=2e-5, rtol=1e-4)


def test_hnet_compresses_time():
    """Positions in the same chunk must read the same (previous-chunk) summary."""
    m = HierarchicalTemporalTransformer(dim=8, depth=1, heads=2, dim_head=4,
                                        compression_ratio=4)
    x = jnp.zeros((1, 8, 8))
    params = m.init(jax.random.PRNGKey(0), x)
    out, _, _ = m.apply(params, x)
    # with identical inputs, outputs within a chunk are identical
    np.testing.assert_allclose(np.asarray(out[0, 4]), np.asarray(out[0, 7]), atol=1e-6)


def test_dynamic_hnet_parallel_matches_streaming():
    """Learned-boundary chunking: the parallel segment-softmax path must
    equal the streaming online-softmax path frame by frame, including the
    per-batch ragged chunk completions."""
    from dreamer4_tpu.nn.hnet import DynamicChunkingTemporalTransformer

    m = DynamicChunkingTemporalTransformer(dim=16, depth=2, heads=2, dim_head=8,
                                           compression_ratio=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 16))
    params = m.init(jax.random.PRNGKey(1), x)

    out_par, ratio_loss, _ = m.apply(params, x)
    assert jnp.isfinite(ratio_loss)

    cache = m.apply(params, 3, 2 * 4, method=m.init_cache)
    outs = []
    for i in range(8):
        o, _, cache = m.apply(params, x[:, i:i + 1], cache=cache)
        outs.append(o)
    out_seq = jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(np.asarray(out_par), np.asarray(out_seq),
                               atol=2e-5, rtol=1e-4)


def test_dynamic_hnet_boundaries_are_data_dependent():
    """Different content must place different boundaries (chunk ids differ
    across inputs), and the ratio loss must pull the boundary rate toward
    1/compression_ratio."""
    from dreamer4_tpu.nn.hnet import DynamicChunkingTemporalTransformer

    m = DynamicChunkingTemporalTransformer(dim=16, depth=1, heads=2, dim_head=8,
                                           compression_ratio=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16))
    params = m.init(jax.random.PRNGKey(1), x)

    def chunk_ids(inp):
        p = m.apply(params, inp, method=m.boundary_probs)
        return jnp.floor(jnp.cumsum(p, axis=1)).astype(jnp.int32)

    y = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16))
    p_a = m.apply(params, x, method=m.boundary_probs)
    p_b = m.apply(params, y, method=m.boundary_probs)
    assert float(jnp.max(jnp.abs(p_a - p_b))) > 1e-4, 'boundary probs ignore content'
    assert not jnp.array_equal(chunk_ids(x), chunk_ids(y)), 'boundaries ignore content'

    # ratio loss decreases as mean boundary prob approaches 1/R
    _, loss, _ = m.apply(params, x)
    assert jnp.isfinite(loss)

    # gradients reach the boundary head (straight-through + ratio loss)
    def total(params):
        out, rloss, _ = m.apply(params, x)
        return jnp.sum(out ** 2) + rloss

    grads = jax.grad(total)(params)
    gb = grads['params']['boundary_head']['kernel']
    assert float(jnp.abs(gb).sum()) > 0, 'no gradient to boundary placement'


def test_transformer_with_dynamic_hnet_layer():
    model = AxialSpaceTimeTransformer(
        dim=16, depth=2, attn_heads=2, attn_dim_head=8, time_block_every=2,
        num_special_tokens=1, h_net_layer=0, h_net_depth=1, h_net_heads=2,
        h_net_dim_head=8, h_net_compression_ratio=2, h_net_dynamic=True,
    )
    tokens = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 16))
    params = model.init(jax.random.PRNGKey(1), tokens)

    parallel_out, interm = model.apply(params, tokens, return_intermediates=True)
    assert jnp.isfinite(interm.h_net_loss)

    cache = model.init_cache(2, 4, max_time=4)
    outs = []
    for i in range(4):
        out_i, cache = model.apply(params, tokens[:, i:i + 1], cache=cache)
        outs.append(out_i)
    sequential = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(parallel_out), np.asarray(sequential),
                               atol=2e-5, rtol=1e-4)


def test_transformer_with_hnet_layer():
    model = AxialSpaceTimeTransformer(
        dim=16, depth=2, attn_heads=2, attn_dim_head=8, time_block_every=2,
        num_special_tokens=1, h_net_layer=0, h_net_depth=1, h_net_heads=2,
        h_net_dim_head=8, h_net_compression_ratio=2,
    )
    tokens = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 16))
    params = model.init(jax.random.PRNGKey(1), tokens)

    out, interm = model.apply(params, tokens, return_intermediates=True)
    assert out.shape == tokens.shape
    assert jnp.isfinite(interm.h_net_loss)

    # parallel == streaming through the full trunk with the h-net cache
    parallel_out, _ = model.apply(params, tokens)
    cache = model.init_cache(2, 4, max_time=4)
    outs = []
    for i in range(4):
        out_i, cache = model.apply(params, tokens[:, i:i + 1], cache=cache)
        outs.append(out_i)
    sequential = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(parallel_out), np.asarray(sequential),
                               atol=2e-5, rtol=1e-4)
