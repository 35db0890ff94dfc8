"""VideoTokenizer tests (mirrors reference test_dreamer.py e2e tokenizer
sections and the streaming-cache equivalence idiom)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer4_tpu.models.tokenizer import VideoTokenizer


def make_tokenizer(**kwargs):
    defaults = dict(
        dim=16,
        dim_latent=16,
        patch_size=16,
        image_height=32,
        image_width=32,
        num_latent_tokens=4,
        encoder_depth=1,
        decoder_depth=1,
        time_block_every=1,
        attn_dim_head=8,
        attn_heads=2,
    )
    defaults.update(kwargs)
    return VideoTokenizer(**defaults)


def init_tokenizer(model, video):
    return model.init({'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}, video)


def test_tokenizer_loss_and_roundtrip():
    model = make_tokenizer(encoder_add_decorr_aux_loss=True, decorr_sample_frac=1.0)
    video = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 32, 32))
    variables = init_tokenizer(model, video)

    loss, state = model.apply(
        variables, video, rngs={'sample': jax.random.PRNGKey(2)}, mutable=['state']
    )
    assert loss.shape == ()
    assert jnp.isfinite(loss)

    latents = model.apply(variables, video, return_latents=True, rngs={'sample': jax.random.PRNGKey(3)})
    assert latents.shape == (2, 4, 4, 16)
    assert jnp.abs(latents).max() <= 1.0  # tanh bottleneck

    recon = model.apply(variables, latents, method=model.decode, rngs={'sample': jax.random.PRNGKey(4)})
    assert recon.shape == video.shape


def test_tokenizer_latent_ar_and_sigreg():
    model = make_tokenizer(
        latent_ar_loss_weight=1.0,
        latent_sigreg_loss_weight=0.1,
        latent_ar_num_slices=2,
        latent_sigreg_num_slices=2,
    )
    video = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 32, 32))
    variables = init_tokenizer(model, video)
    (loss, interm), _ = model.apply(
        variables, video, return_intermediates=True,
        rngs={'sample': jax.random.PRNGKey(2)}, mutable=['state'],
    )
    assert jnp.isfinite(loss)
    assert jnp.isfinite(interm.losses.latent_ar)
    assert jnp.isfinite(interm.losses.latent_sigreg)
    assert interm.recon.shape[0] == 2


def test_streaming_encode_matches_parallel():
    """Frame-by-frame cached tokenize == full-sequence tokenize
    (reference test_dreamer.py:1209-1296 invariant)."""
    model = make_tokenizer(encoder_depth=2, time_block_every=2)
    video = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 32, 32))
    variables = init_tokenizer(model, video)

    parallel = model.apply(variables, video, return_latents=True)

    cache = None
    outs = []
    for i in range(4):
        frame = video[:, :, i : i + 1]
        if cache is None:
            latents_i, cache = model.apply(
                variables, frame, method=model.encode,
                mask_patches=False, max_time=4, return_cache=True,
            )
        else:
            latents_i, cache = model.apply(
                variables, frame, method=model.encode,
                mask_patches=False, cache=cache, return_cache=True,
            )
        outs.append(latents_i)
    sequential = jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(np.asarray(parallel), np.asarray(sequential), atol=2e-5, rtol=1e-4)


def test_image_pretraining_path():
    model = make_tokenizer()
    image = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32))
    variables = init_tokenizer(model, image)
    loss, _ = model.apply(image_or_video := variables, image, rngs={'sample': jax.random.PRNGKey(2)}, mutable=['state'])
    assert jnp.isfinite(loss)
    latents = model.apply(variables, image, return_latents=True)
    assert latents.shape == (2, 4, 16)


def test_var_len_masking():
    model = make_tokenizer()
    video = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 32, 32))
    variables = init_tokenizer(model, video)
    time_lens = jnp.array([2, 4])
    loss, _ = model.apply(
        variables, video, time_lens=time_lens,
        rngs={'sample': jax.random.PRNGKey(2)}, mutable=['state'],
    )
    assert jnp.isfinite(loss)


def test_latent_disagreement():
    model = make_tokenizer()
    video = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 2, 32, 32))
    variables = init_tokenizer(model, video)
    latents = model.apply(variables, video, return_latents=True)
    disagreement = model.apply(
        variables, latents, method=model.latent_disagreement,
        rngs={'sample': jax.random.PRNGKey(5)},
    )
    assert disagreement.shape == (2, 2)
    assert (disagreement >= 0).all()
