"""MOSS spatial-module tests: cache streaming equivalence in the transformer
(mirrors reference test_dreamer.py:1369-1412)."""
import jax
import jax.numpy as jnp
import numpy as np

from dreamer4_tpu.models.tokenizer import VideoTokenizer
from dreamer4_tpu.models.transformer import AxialSpaceTimeTransformer


def test_moss_parallel_matches_cached():
    model = AxialSpaceTimeTransformer(
        dim=16, depth=2, attn_heads=2, attn_dim_head=8, time_block_every=2,
        num_special_tokens=2, space_height=2, space_width=2,
        spatial_module_layers=(0,),
    )
    tokens = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 6, 16))  # 2x2 grid + 2 special
    params = model.init(jax.random.PRNGKey(1), tokens)

    parallel_out, _ = model.apply(params, tokens)

    cache = model.init_cache(2, 6, max_time=4)
    outs = []
    for i in range(4):
        out_i, cache = model.apply(params, tokens[:, i:i + 1], cache=cache)
        outs.append(out_i)
    sequential = jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(np.asarray(parallel_out), np.asarray(sequential),
                               atol=2e-5, rtol=1e-4)


def test_tokenizer_with_moss_layers():
    model = VideoTokenizer(
        dim=16, dim_latent=8, patch_size=8, image_height=16, image_width=16,
        num_latent_tokens=2, encoder_depth=2, decoder_depth=2, time_block_every=2,
        attn_dim_head=8, attn_heads=2, use_loss_normalization=False,
        encoder_moss_layers=(0,), decoder_moss_layers=(0,))
    video = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 2, 16, 16))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    variables = model.init(rngs, video)
    loss = model.apply(variables, video, rngs={'sample': jax.random.PRNGKey(2)})
    assert jnp.isfinite(loss)
    assert 'spatial_module_0' in variables['params']['encoder_transformer']
