"""Trainer-layer tests: tokenizer/world-model train steps decrease loss,
DreamTrainer updates only heads, SimTrainer runs the full online loop."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer4_tpu.envs.mocks import MockStateEnv
from dreamer4_tpu.models.tokenizer import VideoTokenizer
from dreamer4_tpu.models.world_model import DynamicsWorldModel
from dreamer4_tpu.train.trainers import (BehaviorCloneTrainer, DreamTrainer,
                                         SimTrainer, TokenizerTrainer)


def test_tokenizer_trainer_reduces_loss():
    model = VideoTokenizer(
        dim=16, dim_latent=8, patch_size=8, image_height=16, image_width=16,
        num_latent_tokens=2, encoder_depth=1, decoder_depth=1, time_block_every=1,
        attn_dim_head=8, attn_heads=2, use_loss_normalization=False)
    video = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 2, 16, 16))
    variables = model.init({'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}, video)

    trainer = TokenizerTrainer(model, variables, learning_rate=3e-3, with_ema=True)
    first_loss, _ = trainer.train_on_batch(video)
    for _ in range(10):
        loss, _ = trainer.train_on_batch(video)
    assert float(loss) < float(first_loss)
    assert int(trainer.ts.step) == 11
    # EMA params track
    diff = jax.tree.reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree.map(lambda p, e: p - e, trainer.ts.params, trainer.ts.ema_params), 0.0)
    assert diff > 0


def make_wm(**kwargs):
    defaults = dict(
        dim=16, dim_latent=8, num_latent_tokens=4, max_steps=8, depth=1,
        time_block_every=1, num_spatial_tokens=4, num_discrete_actions=(3,),
        attn_dim_head=8, attn_heads=2, multi_token_pred_len=2, num_register_tokens=2,
        predict_terminals=True)
    defaults.update(kwargs)
    return DynamicsWorldModel(**defaults)


def init_wm(model, b=2, t=4):
    latents = jnp.zeros((b, t, model.num_latent_tokens, model.dim_latent))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    return model.init(rngs, latents=latents, shortcut_train=False,
                      rewards=jnp.zeros((b, t)), terminals=jnp.zeros((b,), bool),
                      discrete_actions=jnp.zeros((b, t - 1, 1), jnp.int32))


def test_bc_trainer_step():
    model = make_wm()
    variables = init_wm(model)
    trainer = BehaviorCloneTrainer(model, variables, learning_rate=1e-3)

    batch = dict(
        latents=jnp.clip(jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8)), -1, 1),
        rewards=jax.random.normal(jax.random.PRNGKey(1), (2, 4)),
        terminals=jnp.zeros((2,), bool),
        discrete_actions=jax.random.randint(jax.random.PRNGKey(2), (2, 3, 1), 0, 3),
    )
    losses = [float(trainer.train_on_batch(batch)[0]) for _ in range(8)]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_dream_trainer_updates_heads_only():
    model = make_wm()
    variables = init_wm(model)
    trainer = DreamTrainer(model, variables, time_steps=4, num_steps=2, batch_size=2)

    before = jax.tree.map(lambda x: x.copy(), trainer.rl_state.params)
    trainer(2)
    after = trainer.rl_state.params

    def delta(sub):
        return jax.tree.reduce(lambda a, b: a + float(jnp.abs(b).sum()),
                               jax.tree.map(lambda x, y: x - y, before[sub], after[sub]), 0.0)

    assert delta('policy_head') > 0
    assert delta('value_head') > 0
    assert delta('transformer') == 0.0  # trunk frozen in heads-only RL


def test_sim_trainer_online_loop():
    model = make_wm(dim_state=4, dim_critic_state=4)
    variables = init_wm(model)
    env = MockStateEnv(dim_state=4, num_actions=3, max_steps=5)
    trainer = SimTrainer(model, variables, env, max_timesteps=5, num_steps=2,
                         update_epochs=1)
    returns = trainer(2)
    assert len(returns) == 2
    assert all(np.isfinite(returns))

def test_sim_trainer_static_update_shapes():
    """Variable-length env episodes must hit ONE compiled update program:
    SimTrainer pads every rollout to max_timesteps+1 (pad_experience_time)
    before the jitted RL/world-model steps. Without the pad, each new
    longest-episode-in-batch length retraces the update (~20 s on CPU) and
    leaks LLVM-JIT mmaps until the process dies on vm.max_map_count —
    observed killing the CartPole expert phase after ~20 iterations."""
    model = make_wm(dim_state=4, dim_critic_state=4)
    variables = init_wm(model)
    # terminate_prob 0.05/step across batch 4 -> the longest episode varies
    # from trainer-step to trainer-step
    env = MockStateEnv(dim_state=4, num_actions=3, max_steps=7, batch=4, seed=3)
    trainer = SimTrainer(model, variables, env, max_timesteps=7, num_steps=2,
                         update_epochs=1)
    seen_t = set()
    for i in range(4):
        experience, _ = trainer.step(jax.random.fold_in(jax.random.PRNGKey(0), i))
        seen_t.add(experience.time_steps)
    assert seen_t == {8}, f'expected static padded time dim 8, saw {seen_t}'
    # the jitted update traced exactly once across all episode lengths
    assert trainer._update._cache_size() == 1


def test_sim_trainer_minibatched_epochs():
    """reference-style minibatched PPO epochs (trainers.py:1529-1539):
    each epoch shuffles rows and updates per fixed-size minibatch."""
    model = make_wm(dim_state=4, dim_critic_state=4)
    variables = init_wm(model)
    env = MockStateEnv(dim_state=4, num_actions=3, max_steps=5, batch=4)
    trainer = SimTrainer(model, variables, env, max_timesteps=5, num_steps=2,
                         update_epochs=2, minibatch_size=2)
    experience, outs = trainer.step(jax.random.PRNGKey(0))
    # 4 rows / mb 2 = 2 minibatches x 2 epochs = 4 updates
    assert len(outs) == 4
    assert all(np.isfinite(float(o.policy_loss)) for o in outs)


def test_index_experience():
    from dreamer4_tpu.data.experience import index_experience

    model = make_wm(dim_state=4, dim_critic_state=4)
    variables = init_wm(model)
    env = MockStateEnv(dim_state=4, num_actions=3, max_steps=5, batch=4)
    from dreamer4_tpu.envs.interact import EnvInteractor

    exp = EnvInteractor(model)(variables, env, jax.random.PRNGKey(0),
                               num_steps=2, max_timesteps=5)
    sub = index_experience(exp, np.array([2, 0]))
    assert sub.batch_size == 2
    np.testing.assert_array_equal(np.asarray(sub.latents),
                                  np.asarray(exp.latents)[[2, 0]])
    np.testing.assert_array_equal(np.asarray(sub.lens), np.asarray(exp.lens)[[2, 0]])
    assert sub.step_size == exp.step_size and sub.prompt_len == exp.prompt_len


def test_sim_trainer_full_model_rl():
    """rl_trunk_lr switches SimTrainer to full-model RL: the PPO update
    re-forwards the trunk and a third optimizer group moves it (the
    reference's image-mode agent trains encoder features from the RL signal,
    `train_cartpole_with_dynamics_rl.py:379-403`)."""
    model = make_wm(dim_state=4, dim_critic_state=4)
    variables = init_wm(model)
    env = MockStateEnv(dim_state=4, num_actions=3, max_steps=5)
    trainer = SimTrainer(model, variables, env, max_timesteps=5, num_steps=2,
                         update_epochs=1, rl_trunk_lr=1e-3,
                         train_dynamics=False)  # isolate the RL path
    before = jax.tree.map(lambda x: x.copy(), trainer.rl_state.params)
    trainer(1)
    after = trainer.rl_state.params
    d_trunk = jax.tree.reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree.map(lambda x, y: x - y, before['transformer'], after['transformer']), 0.0)
    assert d_trunk > 0.0
