"""Optional tokenizer subsystems: aug conditioning, BYOL, causal conv3d, SPT,
slot attention, separate flow decoder, latent consistency, temporal diff,
latent-init patches (reference test_dreamer.py feature sections)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer4_tpu.models.tokenizer import (VideoTokenizer, latent_consistency_loss,
                                           video_to_internal)


def make_tokenizer(**kwargs):
    defaults = dict(
        dim=16,
        dim_latent=8,
        patch_size=8,
        image_height=16,
        image_width=16,
        num_latent_tokens=2,
        encoder_depth=1,
        decoder_depth=1,
        time_block_every=1,
        attn_dim_head=8,
        attn_heads=2,
        use_loss_normalization=False,
    )
    defaults.update(kwargs)
    return VideoTokenizer(**defaults)


def run_loss(model, video=None, **kwargs):
    if video is None:
        video = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 3, 16, 16))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    variables = model.init(rngs, video, **kwargs)
    loss = model.apply(variables, video, rngs={'sample': jax.random.PRNGKey(2)}, **kwargs)
    return loss, variables, video


@pytest.mark.parametrize('feature_kwargs', [
    dict(has_aug_conditioning=True),
    dict(use_causal_conv3d=True),
    dict(use_shifted_patch_tokenization=True),
    dict(encode_temporal_diff=True),
    dict(slot_attention_initted_latents=True),
    dict(decoder_slot_attention_initted_spatial_tokens=True),
    dict(latent_init_patch_size=4, slot_attention_initted_latents=True),
    dict(decoder_flow_times_beta=(2.0, 1.0), decoder_flow_steps=4),
    dict(latent_grad_only_at_noise=True, decoder_flow_steps=2),
])
def test_feature_losses_finite(feature_kwargs):
    model = make_tokenizer(**feature_kwargs)
    loss, variables, video = run_loss(model)
    assert jnp.isfinite(loss), feature_kwargs

    # latents + decode still work
    latents = model.apply(variables, video, return_latents=True)
    assert latents.shape == (2, 3, 2, 8)
    recon = model.apply(variables, latents, method=model.decode,
                        rngs={'sample': jax.random.PRNGKey(3)})
    assert recon.shape == video.shape


def test_aug_conditioning_changes_output():
    # needs a space-attention layer for the aug token to reach the latents
    model = make_tokenizer(has_aug_conditioning=True, encoder_depth=2, time_block_every=2)
    video = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 2, 16, 16))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    variables = model.init(rngs, video)

    l0 = model.apply(variables, video, return_latents=True, aug_id=0)
    l2 = model.apply(variables, video, return_latents=True, aug_id=True)  # bool -> 2
    assert not np.allclose(np.asarray(l0), np.asarray(l2), atol=1e-5)


def test_separate_flow_decoder_branches():
    model = make_tokenizer(separate_flow_decoder=True, decoder_flow_steps=4)
    video = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 2, 16, 16))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    variables = model.init(rngs, video)
    assert 'flow_decoder' in variables['params']

    (l_base, interm_b) = model.apply(variables, video, train_flow_decoder=False,
                                     return_intermediates=True,
                                     rngs={'sample': jax.random.PRNGKey(2)})
    (l_flow, interm_f) = model.apply(variables, video, train_flow_decoder=True,
                                     return_intermediates=True,
                                     rngs={'sample': jax.random.PRNGKey(2)})
    assert float(interm_b.losses.recon) != 0.0 and float(interm_b.losses.flow_recon) == 0.0
    assert float(interm_f.losses.flow_recon) != 0.0 and float(interm_f.losses.recon) == 0.0


def test_byol_loss():
    model = make_tokenizer(has_byol=True, byol_use_sem=True)
    video = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 2, 16, 16))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    variables = model.init(rngs, video)

    teacher_latents = jax.random.uniform(jax.random.PRNGKey(5), (2, 2, 2, 8), minval=-1, maxval=1)
    loss, interm = model.apply(variables, video, byol_target_latents=teacher_latents,
                               return_intermediates=True,
                               rngs={'sample': jax.random.PRNGKey(2)})
    assert float(interm.losses.byol) > 0.0


def test_latent_consistency_freezes_encoder():
    model = make_tokenizer(latent_consistency_loss_weight=1.0)
    video = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 2, 16, 16))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    variables = model.init(rngs, video)

    def loss_fn(params):
        v = {'params': params}
        latents = model.apply(v, video, return_latents=True)
        recon = model.apply(v, latents, method=model.decode,
                            rngs={'sample': jax.random.PRNGKey(3)})
        return latent_consistency_loss(model, v, video_to_internal(recon), latents)

    grads = jax.grad(loss_fn)(variables['params'])
    g_enc = jax.tree.reduce(lambda a, b: a + float(jnp.abs(b).sum()),
                            grads['encoder_transformer'], 0.0)
    g_dec = jax.tree.reduce(lambda a, b: a + float(jnp.abs(b).sum()),
                            grads['decoder'], 0.0)
    # gradient flows to the decoder through the recon, but latents themselves
    # also feed the decoder, so encoder grads flow only via the decode path —
    # the consistency-term encoder path is frozen
    assert g_dec > 0


def test_streaming_with_conv_and_spt_caches():
    """parallel == sequential with the full 4-part time cache."""
    model = make_tokenizer(use_causal_conv3d=True, use_shifted_patch_tokenization=True,
                           encoder_depth=2, time_block_every=2)
    video = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 4, 16, 16))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    variables = model.init(rngs, video)

    parallel = model.apply(variables, video, return_latents=True)

    cache = None
    outs = []
    for i in range(4):
        frame = video[:, :, i:i + 1]
        kwargs = dict(mask_patches=False, return_cache=True)
        if cache is None:
            kwargs['max_time'] = 4
        else:
            kwargs['cache'] = cache
        latents_i, cache = model.apply(variables, frame, method=model.encode, **kwargs)
        outs.append(latents_i)
    sequential = jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(np.asarray(parallel), np.asarray(sequential),
                               atol=2e-5, rtol=1e-4)
