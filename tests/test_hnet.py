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
