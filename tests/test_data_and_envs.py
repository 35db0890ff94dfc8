"""Replay buffer, experience combine, mock envs and the interact loop
(mirrors reference test_env_wrapper.py + interact sections of test_dreamer.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer4_tpu.data.experience import Experience, combine_experiences
from dreamer4_tpu.data.replay_buffer import ReplayBuffer
from dreamer4_tpu.envs.interact import EnvInteractor
from dreamer4_tpu.envs.mocks import MockDictEnv, MockEnv, MockStateEnv
from dreamer4_tpu.models.world_model import DynamicsWorldModel
from dreamer4_tpu.models.tokenizer import VideoTokenizer


def test_replay_buffer_roundtrip(tmp_path):
    buf = ReplayBuffer(
        tmp_path / 'buf', max_episodes=4, max_timesteps=10,
        fields=dict(obs=('float', (3,)), reward='float', action='int', terminated='bool'),
        meta_fields=dict(agent_index='int'),
    )
    rng = np.random.default_rng(0)

    for ep in range(3):
        with buf.one_episode(agent_index=ep):
            for t in range(5 + ep):
                buf.store(obs=rng.random(3), reward=float(t), action=t % 2, terminated=t == 4 + ep)

    assert len(buf) == 3
    ep = buf.get_episode(1)
    assert ep['obs'].shape == (6, 3)
    assert ep['agent_index'] == 1
    np.testing.assert_allclose(ep['reward'], np.arange(6))

    batch = buf.sample_batch(rng, batch_size=2, seq_len=4)
    assert batch['obs'].shape == (2, 4, 3)
    assert (batch['lens'] <= 4).all()

    # persistence: reopen reads the same data
    buf2 = ReplayBuffer(
        tmp_path / 'buf', max_episodes=4, max_timesteps=10,
        fields=dict(obs=('float', (3,)), reward='float', action='int', terminated='bool'),
        meta_fields=dict(agent_index='int'),
    )
    assert len(buf2) == 3
    np.testing.assert_allclose(buf2.get_episode(1)['reward'], np.arange(6))

    buf2.clear()
    assert len(buf2) == 0


def test_replay_buffer_batched_episode(tmp_path):
    buf = ReplayBuffer(
        tmp_path / 'buf2', max_episodes=8, max_timesteps=6,
        fields=dict(latents=('float', (2, 4)), reward='float'),
        meta_fields=dict(is_truncated='bool'),
    )
    with buf.batched_episode(batch_size=3, is_truncated=np.array([True, False, True])):
        for t in range(4):
            buf.store_batch(latents=np.ones((3, 2, 4)) * t, reward=np.full((3,), t, np.float32))
    assert len(buf) == 3
    ep = buf.get_episode(2)
    assert ep['latents'].shape == (4, 2, 4)
    assert ep['is_truncated'] == True  # noqa: E712


def test_combine_experiences():
    def exp(b, t):
        return Experience(
            latents=jnp.ones((b, t, 2, 4)),
            rewards=jnp.ones((b, t)),
            lens=jnp.full((b,), t),
            step_size=4,
        )
    combined = combine_experiences([exp(2, 3), exp(1, 5)])
    assert combined.latents.shape == (3, 5, 2, 4)
    assert combined.lens.tolist() == [3, 3, 5]
    assert combined.step_size == 4


def make_wm(**kwargs):
    defaults = dict(
        dim=16, dim_latent=8, num_latent_tokens=4, max_steps=8, depth=1,
        time_block_every=1, num_spatial_tokens=4, num_discrete_actions=(4,),
        attn_dim_head=8, attn_heads=2, multi_token_pred_len=2, num_register_tokens=2,
    )
    defaults.update(kwargs)
    return DynamicsWorldModel(**defaults)


def test_interact_with_state_env():
    model = make_wm(dim_state=4, dim_critic_state=4)
    latents = jnp.zeros((2, 3, 4, 8))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    variables = model.init(rngs, latents=latents, shortcut_train=False,
                           rewards=jnp.zeros((2, 3)),
                           discrete_actions=jnp.zeros((2, 2, 1), jnp.int32))

    env = MockStateEnv(dim_state=4, num_actions=4, max_steps=6)
    interactor = EnvInteractor(model)
    exp = interactor(variables, env, jax.random.PRNGKey(0), max_timesteps=6, num_steps=2)

    assert exp.latents.shape[0] == 1
    assert exp.latents.shape[2:] == (4, 8)
    assert exp.rewards is not None and exp.values is not None
    assert exp.actions.discrete is not None
    assert not exp.is_from_world_model
    assert (exp.lens >= 1).all()
    assert exp.critic_state is not None


def test_interact_state_entropy_bonus():
    """With `state_entropy_bonus_weight` > 0 the recorded rewards include the
    mean Beta entropy of the state-prediction head (reference
    `dreamer4.py:4705, 5735-5740`); the raw env rewards stay recoverable by
    running the same rollout without the bonus."""
    base = dict(dim_state=4, add_state_pred_head=True)
    kwargs = dict(latents=jnp.zeros((2, 3, 4, 8)), shortcut_train=False,
                  rewards=jnp.zeros((2, 3)),
                  discrete_actions=jnp.zeros((2, 2, 1), jnp.int32))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}

    model_plain = make_wm(**base)
    model_bonus = make_wm(**base, state_entropy_bonus_weight=0.5)
    variables = model_plain.init(rngs, **kwargs)

    env_kwargs = dict(dim_state=4, num_actions=4, max_steps=6)
    exp_plain = EnvInteractor(model_plain)(
        variables, MockStateEnv(**env_kwargs), jax.random.PRNGKey(0),
        max_timesteps=6, num_steps=2)
    exp_bonus = EnvInteractor(model_bonus)(
        variables, MockStateEnv(**env_kwargs), jax.random.PRNGKey(0),
        max_timesteps=6, num_steps=2)

    delta = np.asarray(exp_bonus.rewards) - np.asarray(exp_plain.rewards)
    valid = np.arange(delta.shape[1])[None] < np.asarray(exp_plain.lens)[:, None]
    assert np.abs(delta[valid]).max() > 1e-6  # bonus actually applied
    assert np.isfinite(np.asarray(exp_bonus.rewards)).all()


def test_interact_with_image_env():
    tokenizer = VideoTokenizer(
        dim=16, dim_latent=8, patch_size=16, image_height=32, image_width=32,
        num_latent_tokens=4, encoder_depth=1, decoder_depth=1, time_block_every=1,
        attn_dim_head=8, attn_heads=2)
    video = jnp.zeros((1, 3, 2, 32, 32))
    tok_vars = tokenizer.init(
        {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}, video)

    model = make_wm()
    latents = jnp.zeros((2, 3, 4, 8))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    variables = model.init(rngs, latents=latents, shortcut_train=False,
                           rewards=jnp.zeros((2, 3)),
                           discrete_actions=jnp.zeros((2, 2, 1), jnp.int32))

    env = MockEnv(image_size=(32, 32), num_actions=4, batch=2, seed=1)
    interactor = EnvInteractor(model, tokenizer=tokenizer)
    exp = interactor(variables, env, jax.random.PRNGKey(0),
                     tokenizer_variables=tok_vars, max_timesteps=4, num_steps=2)

    assert exp.latents.shape[0] == 2
    assert exp.video is not None
    assert exp.video.shape[0] == 2 and exp.video.shape[1] == 3
    assert exp.episode_return.shape == (2,)


def test_experience_buffer_roundtrip(tmp_path):
    from dreamer4_tpu.data.experience import (add_experience_to_buffer,
                                              create_experience_replay_buffer,
                                              experience_from_batch)
    from dreamer4_tpu.nn.action_embedder import Actions as A

    rng = np.random.default_rng(0)
    exp = Experience(
        latents=jnp.asarray(rng.random((3, 5, 2, 4)), jnp.float32),
        rewards=jnp.asarray(rng.random((3, 5)), jnp.float32),
        actions=A(jnp.asarray(rng.integers(0, 4, (3, 5, 1))), None),
        log_probs=A(jnp.asarray(rng.random((3, 5, 1)), jnp.float32), None),
        values=jnp.asarray(rng.random((3, 5)), jnp.float32),
        step_size=4,
        lens=jnp.array([5, 3, 4]),
        is_truncated=jnp.array([True, False, True]),
        terminals=jnp.array([False, True, False]),
        episode_return=jnp.array([1.0, 2.0, 3.0]),
    )

    buf = create_experience_replay_buffer(exp, tmp_path / 'expbuf',
                                          max_episodes=8, max_timesteps=10)
    add_experience_to_buffer(exp, buf)
    assert len(buf) == 3
    assert buf.episode_length(1) == 3

    batch = buf.sample_batch(np.random.default_rng(1), batch_size=2)
    restored = experience_from_batch(batch, step_size=4)
    assert restored.latents.shape[2:] == (2, 4)
    assert restored.actions.discrete is not None
    assert restored.step_size == 4
    assert restored.lens is not None
