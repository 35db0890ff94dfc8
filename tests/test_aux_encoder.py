"""aux_image_encoder through the whole loop (reference `dreamer4.py:5386-5404,
5587-5601, 5914-5921`): a caller-supplied encoder contributes EXTRA latent
tokens, appended to the tokenizer latents along the token axis, in
- BC training (BehaviorCloneTrainer tokenizes video + appends aux tokens),
- env interaction (EnvInteractor.obs_to_latents), and
- imagination (generate on the widened latent space).
The world model is built with num_latent_tokens = tokenizer tokens + aux."""
import jax
import jax.numpy as jnp
import numpy as np

from dreamer4_tpu.envs.interact import EnvInteractor
from dreamer4_tpu.envs.mocks import MockEnv
from dreamer4_tpu.models.generate import generate
from dreamer4_tpu.models.tokenizer import VideoTokenizer
from dreamer4_tpu.models.world_model import DynamicsWorldModel
from dreamer4_tpu.train.trainers import BehaviorCloneTrainer

N_TOK, N_AUX = 2, 3  # deliberately different counts
DIM_LATENT = 8


def make_aux_encoder_fn():
    """A fixed (non-trainable here) conv-free encoder: mean-pool the frame
    into N_AUX tokens via a frozen random projection."""
    w = jax.random.normal(jax.random.PRNGKey(42), (3, N_AUX * DIM_LATENT)) * 0.1

    @jax.jit
    def encode(video):  # (b, c, t, h, w) -> (b, t, N_AUX, DIM_LATENT)
        pooled = jnp.mean(video, axis=(-2, -1))          # (b, c, t)
        pooled = jnp.moveaxis(pooled, 1, 2)              # (b, t, c)
        return jnp.tanh(pooled @ w).reshape(*pooled.shape[:2], N_AUX, DIM_LATENT)

    return encode


def build_models():
    tokenizer = VideoTokenizer(
        dim=16, dim_latent=DIM_LATENT, patch_size=8, image_height=16, image_width=16,
        num_latent_tokens=N_TOK, encoder_depth=1, decoder_depth=1, time_block_every=1,
        attn_dim_head=8, attn_heads=2, use_loss_normalization=False)
    video = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 2, 16, 16))
    tok_vars = tokenizer.init(
        {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}, video)

    model = DynamicsWorldModel(
        dim=16, dim_latent=DIM_LATENT, num_latent_tokens=N_TOK + N_AUX,
        max_steps=8, depth=1, time_block_every=1, num_spatial_tokens=4,
        num_discrete_actions=(4,), attn_dim_head=8, attn_heads=2,
        multi_token_pred_len=2, num_register_tokens=2, predict_terminals=True,
        use_loss_normalization=False)
    latents = jnp.zeros((2, 3, N_TOK + N_AUX, DIM_LATENT))
    wm_vars = model.init(
        {'params': jax.random.PRNGKey(2), 'sample': jax.random.PRNGKey(3)},
        latents=latents, shortcut_train=False, rewards=jnp.zeros((2, 3)),
        terminals=jnp.zeros((2,), bool),
        discrete_actions=jnp.zeros((2, 2, 1), jnp.int32))
    return tokenizer, tok_vars, model, wm_vars


def test_bc_interact_dream_with_aux_encoder():
    tokenizer, tok_vars, model, wm_vars = build_models()
    aux_fn = make_aux_encoder_fn()

    # ---- BC training on video: tokenizer latents (2) + aux tokens (3)
    trainer = BehaviorCloneTrainer(model, wm_vars, tokenizer=tokenizer,
                                   tokenizer_variables=tok_vars,
                                   aux_image_encoder_fn=aux_fn,
                                   learning_rate=1e-3, with_ema=False)
    batch = dict(
        video=jax.random.uniform(jax.random.PRNGKey(4), (2, 3, 4, 16, 16)),
        rewards=jnp.zeros((2, 4)),
        discrete_actions=jnp.zeros((2, 3, 1), jnp.int32),
    )
    loss, _ = trainer.train_on_batch(batch)
    assert jnp.isfinite(loss)

    # aux tokens really matter: a shifted video changes the combined latents
    parts = [trainer._tokenize(tok_vars, batch['video']), aux_fn(batch['video'])]
    combined = jnp.concatenate(parts, axis=-2)
    assert combined.shape == (2, 4, N_TOK + N_AUX, DIM_LATENT)
    combined2 = jnp.concatenate(
        [trainer._tokenize(tok_vars, batch['video']),
         aux_fn(batch['video'] + 0.3)], axis=-2)
    assert not np.allclose(np.asarray(combined[..., N_TOK:, :]),
                           np.asarray(combined2[..., N_TOK:, :]))

    # ---- interaction: obs -> tokenizer+aux latents -> policy step
    env = MockEnv(image_size=(16, 16), num_actions=4)
    interactor = EnvInteractor(model, tokenizer=tokenizer,
                               aux_image_encoder_fn=aux_fn)
    exp = interactor(wm_vars, env, jax.random.PRNGKey(5),
                     tokenizer_variables=tok_vars, max_timesteps=3, num_steps=2)
    assert exp.latents.shape[-2:] == (N_TOK + N_AUX, DIM_LATENT)
    assert np.isfinite(np.asarray(exp.values)).all()

    # ---- imagination on the widened latent space, prompted by real latents
    dream = generate(model, wm_vars, jax.random.PRNGKey(6),
                     time_steps=4, num_steps=2, batch_size=2,
                     prompt_latents=jnp.asarray(exp.latents[:, :2]),
                     hard_terminals=False)
    assert dream.latents.shape[-2:] == (N_TOK + N_AUX, DIM_LATENT)
    assert np.isfinite(np.asarray(dream.latents)).all()
