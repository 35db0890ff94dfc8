"""MoT (mixture of transformers) tests — parallel vs cached equivalence with
split special-token weights (mirrors reference test_dreamer.py:1601-1716)."""
import jax
import jax.numpy as jnp
import numpy as np

from dreamer4_tpu.models.transformer import AxialSpaceTimeTransformer


def test_mot_parallel_matches_cached():
    model = AxialSpaceTimeTransformer(
        dim=16, depth=2, attn_heads=2, attn_dim_head=8, time_block_every=2,
        num_special_tokens=2, mot_temporal=True,
    )
    tokens = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 5, 16))
    params = model.init(jax.random.PRNGKey(1), tokens)

    parallel_out, _ = model.apply(params, tokens)

    cache = model.init_cache(2, 5, max_time=4)
    outs = []
    for i in range(4):
        out_i, cache = model.apply(params, tokens[:, i:i + 1], cache=cache)
        outs.append(out_i)
    sequential = jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(np.asarray(parallel_out), np.asarray(sequential),
                               atol=2e-5, rtol=1e-4)


def test_mot_uses_separate_weights():
    model = AxialSpaceTimeTransformer(
        dim=16, depth=2, attn_heads=2, attn_dim_head=8, time_block_every=2,
        num_special_tokens=2, mot_temporal=True,
    )
    tokens = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 5, 16))
    params = model.init(jax.random.PRNGKey(1), tokens)
    names = set(params['params'].keys())
    assert 'special_attn_1' in names and 'special_ff_1' in names
