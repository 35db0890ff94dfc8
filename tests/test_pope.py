"""PoPE (learned per-head rotary) tests — time + axial space, parallel vs
cached equivalence with PoPE on (mirrors reference PoPE parametrization of
test_e2e and the pope block-mask test at test_dreamer.py:1901-1952)."""
import jax
import jax.numpy as jnp
import numpy as np

from dreamer4_tpu.models.tokenizer import VideoTokenizer
from dreamer4_tpu.models.transformer import AxialSpaceTimeTransformer
from dreamer4_tpu.models.world_model import DynamicsWorldModel
from dreamer4_tpu.nn.pope import AxialPoPE, PoPE


def test_pope_shapes():
    m = PoPE(dim_head=8, heads=2)
    params = m.init(jax.random.PRNGKey(0), 5)
    rot = m.apply(params, 5, offset=3)
    assert rot.shape == (2, 5, 8)

    m2 = AxialPoPE(dim_head=8, heads=2)
    params2 = m2.init(jax.random.PRNGKey(0), 2, 3)
    rot2 = m2.apply(params2, 2, 3, num_special=2)
    assert rot2.shape == (2, 8, 8)
    # special positions are identity rotations (zero angle)
    np.testing.assert_allclose(np.asarray(rot2[:, -2:]), 0.0)


def test_transformer_pope_parallel_matches_cached():
    model = AxialSpaceTimeTransformer(
        dim=16, depth=2, attn_heads=2, attn_dim_head=8, time_block_every=2,
        num_special_tokens=2, time_attention_use_pope=True,
        space_attention_use_pope=True, space_height=2, space_width=2,
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


def test_pope_positions_matter():
    """With PoPE on, permuting time order changes outputs (position-aware)."""
    model = AxialSpaceTimeTransformer(
        dim=16, depth=1, attn_heads=2, attn_dim_head=8, time_block_every=1,
        num_special_tokens=0, time_attention_use_pope=True, use_attn_pool=False)
    tokens = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 3, 16))
    params = model.init(jax.random.PRNGKey(1), tokens)
    out1, _ = model.apply(params, tokens)
    out2, _ = model.apply(params, tokens[:, ::-1])
    assert not np.allclose(np.asarray(out1[:, -1]), np.asarray(out2[:, 0]), atol=1e-4)


def test_tokenizer_and_wm_with_pope():
    tok = VideoTokenizer(
        dim=16, dim_latent=8, patch_size=8, image_height=16, image_width=16,
        num_latent_tokens=2, encoder_depth=2, decoder_depth=1, time_block_every=2,
        attn_dim_head=8, attn_heads=2, use_loss_normalization=False,
        time_attention_use_pope=True, space_attention_use_pope=True)
    video = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 2, 16, 16))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    tv = tok.init(rngs, video)
    loss = tok.apply(tv, video, rngs={'sample': jax.random.PRNGKey(2)})
    assert jnp.isfinite(loss)

    wm = DynamicsWorldModel(
        dim=16, dim_latent=8, num_latent_tokens=2, num_spatial_tokens=2,
        max_steps=8, depth=1, time_block_every=1, attn_heads=2, attn_dim_head=8,
        num_discrete_actions=(3,), multi_token_pred_len=2, num_register_tokens=2,
        time_attention_use_pope=True)
    latents = jnp.zeros((1, 3, 2, 8))
    wv = wm.init(rngs, latents=latents, shortcut_train=False)
    loss = wm.apply(wv, latents=latents, shortcut_train=False,
                    rngs={'sample': jax.random.PRNGKey(2)})
    assert jnp.isfinite(loss)
