"""Full-pipeline integration (mirrors reference tests/test_e2e.py): Snake ->
record to replay buffer -> tokenizer training -> BC dynamics training ->
world-model-as-env -> DreamTrainer -> buffer.clear + FIRE -> SimTrainer.
Everything tiny, CPU, one test."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'examples'))


def test_full_pipeline(tmp_path):
    from train_snake_ppo import collect

    from dreamer4_tpu.data.datasets import VideoDatasetFromReplayBuffer, batch_iterator
    from dreamer4_tpu.envs.snake import SnakeEnv
    from dreamer4_tpu.envs.world_model_env import DynamicsWorldModelWrapper
    from dreamer4_tpu.models.tokenizer import VideoTokenizer
    from dreamer4_tpu.models.world_model import DynamicsWorldModel
    from dreamer4_tpu.ops.fire import apply_fire
    from dreamer4_tpu.train.trainers import (BehaviorCloneTrainer, DreamTrainer,
                                             SimTrainer, TokenizerTrainer)

    # 1. collect experience with the scripted snake policy
    buffer = collect(tmp_path / 'buf', num_episodes=6, grid_size=4, max_steps=8, target_apples=1.0)
    assert len(buffer) == 6

    # 2. tokenizer training on recorded video
    ds = VideoDatasetFromReplayBuffer(buffer, num_frames=4)
    it = batch_iterator(ds, batch_size=2, rng=np.random.default_rng(0))

    tokenizer = VideoTokenizer(
        dim=16, dim_latent=8, patch_size=4, image_height=8, image_width=8,
        num_latent_tokens=2, encoder_depth=1, decoder_depth=1, time_block_every=1,
        attn_dim_head=8, attn_heads=2)
    batch = next(it)
    video = jnp.asarray(batch['video'])
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    tok_vars = tokenizer.init(rngs, video)
    tok_trainer = TokenizerTrainer(tokenizer, tok_vars, with_ema=False)
    for _ in range(3):
        batch = next(it)
        loss, _ = tok_trainer.train_on_batch(jnp.asarray(batch['video']),
                                             time_lens=jnp.asarray(batch['lens']))
    assert jnp.isfinite(loss)
    tok_vars = {'params': tok_trainer.ts.params, 'state': tok_trainer.ts.state}

    # 3. behavior-clone the dynamics model
    model = DynamicsWorldModel(
        dim=16, dim_latent=8, num_latent_tokens=2, num_spatial_tokens=2,
        max_steps=8, depth=1, time_block_every=1, attn_heads=2, attn_dim_head=8,
        num_discrete_actions=(4,), multi_token_pred_len=2, num_register_tokens=2,
        predict_terminals=True)

    tokenize = jax.jit(lambda v: tokenizer.apply(tok_vars, v, return_latents=True))

    def prep(batch):
        return dict(
            latents=tokenize(jnp.asarray(batch['video'])),
            rewards=jnp.asarray(batch['rewards']),
            terminals=jnp.asarray(batch['terminated']),
            discrete_actions=jnp.asarray(batch['actions'], jnp.int32)[..., None],
            lens=jnp.asarray(batch['lens']),
        )

    first = prep(next(it))
    wm_vars = model.init({'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)},
                         shortcut_train=False, **first)
    bc = BehaviorCloneTrainer(model, wm_vars)
    for _ in range(3):
        loss, _ = bc.train_on_batch(prep(next(it)))
    assert jnp.isfinite(loss)
    wm_vars = {'params': bc.ts.params, 'state': bc.ts.state}

    # 4. the world model as an env
    wm_env = DynamicsWorldModelWrapper(model, wm_vars, tokenizer=tokenizer,
                                       tokenizer_variables=tok_vars,
                                       num_steps=2, max_timesteps=3)
    obs, _ = wm_env.reset(seed=0)
    assert obs.shape == (1, 3, 8, 8)
    obs, reward, terminated, truncated, _ = wm_env.step(1)
    assert np.isfinite(reward)

    # 5. RL purely in imagination
    dream = DreamTrainer(model, wm_vars, time_steps=4, num_steps=2, batch_size=2)
    logs = dream(2)
    assert len(logs) == 2

    # 6. continual learning: clear the buffer, FIRE-reinit, then online RL
    buffer.clear()
    assert len(buffer) == 0
    fired = apply_fire(wm_vars['params'], key=jax.random.PRNGKey(7))
    wm_vars = {'params': fired, 'state': wm_vars.get('state', {})}

    env = SnakeEnv(grid_size=4, max_steps=6, image_size=8)
    sim = SimTrainer(model, wm_vars, env, tokenizer=tokenizer,
                     tokenizer_variables=tok_vars, max_timesteps=6, num_steps=2,
                     update_epochs=1)
    returns = sim(1)
    assert np.isfinite(returns[0])

    # 7. retrain the tokenizer on fresh data (same trainer continues)
    collect(tmp_path / 'buf', num_episodes=2, grid_size=4, max_steps=8, target_apples=1.0)
    batch = next(batch_iterator(VideoDatasetFromReplayBuffer(buffer, num_frames=4), 2,
                                rng=np.random.default_rng(1)))
    loss, _ = tok_trainer.train_on_batch(jnp.asarray(batch['video']),
                                         time_lens=jnp.asarray(batch['lens']))
    assert jnp.isfinite(loss)
