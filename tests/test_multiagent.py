"""Multi-agent completion: per-agent action/reward learned embeds selected by
`agent_index`, action MTP loss with num_agents > 1, and generate/interact/RL
driven as agent 1 (the reference allocates (num_agents, dim) embeds,
`dreamer4.py:4934-4937`, but its token build only ever adds row 0 and its
action loss is gated on num_agents == 1, `dreamer4.py:7521` — this framework
indexes the agent throughout)."""
import jax
import jax.numpy as jnp
import numpy as np

from dreamer4_tpu.models.generate import generate
from dreamer4_tpu.models.rl import ReturnStats, rl_losses
from dreamer4_tpu.models.world_model import DynamicsWorldModel


def make_two_agent_model(**kwargs):
    defaults = dict(
        dim=16, dim_latent=8, num_latent_tokens=4, max_steps=8, depth=1,
        time_block_every=1, num_spatial_tokens=4, num_discrete_actions=(3,),
        attn_dim_head=8, attn_heads=2, multi_token_pred_len=2,
        num_register_tokens=2, num_agents=2, predict_terminals=True,
        add_reward_embed_to_agent_token=True,
        use_loss_normalization=False)
    defaults.update(kwargs)
    return DynamicsWorldModel(**defaults)


def init_two_agent(model):
    latents = jnp.zeros((2, 4, model.num_latent_tokens, model.dim_latent))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    return model.init(rngs, latents=latents, shortcut_train=False,
                      rewards=jnp.zeros((2, 4)),
                      terminals=jnp.zeros((2,), bool),
                      discrete_actions=jnp.zeros((2, 3, 1), jnp.int32))


def _loss_kwargs(key):
    return dict(
        latents=jax.random.uniform(key, (2, 4, 4, 8), minval=-1, maxval=1),
        rewards=jax.random.normal(jax.random.fold_in(key, 1), (2, 4)),
        terminals=jnp.zeros((2,), bool),
        discrete_actions=jax.random.randint(jax.random.fold_in(key, 2), (2, 3, 1), 0, 3),
    )


def test_agent_index_selects_per_agent_embeds():
    """The same actions/rewards produce different token streams (and losses)
    under agent 0 vs agent 1 — the learned embeds are per-agent rows."""
    model = make_two_agent_model()
    variables = init_two_agent(model)
    kwargs = _loss_kwargs(jax.random.PRNGKey(3))

    losses = {}
    for idx in (0, 1):
        (loss, _, _), _ = model.apply(
            variables, shortcut_train=False, agent_index=idx,
            return_intermediates=True, mutable=['state'],
            rngs={'sample': jax.random.PRNGKey(4)}, **kwargs)
        assert jnp.isfinite(loss)
        losses[idx] = float(loss)
    assert losses[0] != losses[1]


def test_action_mtp_loss_multi_agent():
    """num_agents=2 no longer zeroes the autoregressive action loss, and the
    loss reads the indexed agent's actor token."""
    model = make_two_agent_model(discrete_action_loss_weight=1.0)
    variables = init_two_agent(model)
    kwargs = _loss_kwargs(jax.random.PRNGKey(5))

    per_agent = {}
    for idx in (0, 1):
        (_, losses, _), _ = model.apply(
            variables, shortcut_train=False, agent_index=idx,
            return_intermediates=True, mutable=['state'],
            rngs={'sample': jax.random.PRNGKey(6)}, **kwargs)
        d_loss = jnp.sum(losses.discrete_actions)
        assert jnp.isfinite(d_loss) and float(d_loss) != 0.0
        per_agent[idx] = float(d_loss)
    assert per_agent[0] != per_agent[1]

    # gradient reaches the indexed agent's learned embeds
    def loss_fn(params, idx):
        loss, _ = model.apply({'params': params}, shortcut_train=False,
                              agent_index=idx, mutable=['state'],
                              rngs={'sample': jax.random.PRNGKey(6)}, **kwargs)
        return loss

    g = jax.grad(loss_fn)(variables['params'], 1)
    g_action = np.asarray(g['action_learned_embed'])
    assert np.abs(g_action[1]).sum() > 0.0


def test_generate_and_rl_as_agent_one():
    model = make_two_agent_model()
    variables = init_two_agent(model)

    exps = {}
    for idx in (0, 1):
        exps[idx] = generate(model, variables, jax.random.PRNGKey(7),
                             time_steps=4, num_steps=2, batch_size=2,
                             agent_index=idx, hard_terminals=False)
    assert exps[1].agent_index == 1
    # different agent rows -> different reward/value reads under the same key
    # (latents stay identical in this depth-1 all-time-layer toy config: the
    # action token has no pathway into the latent columns without a space
    # layer — see docs/evidence/dream_rl_round2.md)
    assert not np.allclose(np.asarray(exps[0].rewards), np.asarray(exps[1].rewards))
    assert not np.allclose(np.asarray(exps[0].values), np.asarray(exps[1].values))

    out = rl_losses(model, variables, exps[1], objective='ppo',
                    return_stats=ReturnStats.create())
    assert jnp.isfinite(out.policy_loss) and jnp.isfinite(out.value_loss)

    # the replay-forward path (no stored embeds) honors agent_index too
    out2 = rl_losses(model, variables, exps[1].replace(agent_embed=None),
                     objective='ppo', return_stats=ReturnStats.create())
    assert jnp.isfinite(out2.policy_loss) and jnp.isfinite(out2.value_loss)


def test_interact_as_agent_one():
    from dreamer4_tpu.envs.interact import EnvInteractor
    from dreamer4_tpu.envs.mocks import MockStateEnv

    model = make_two_agent_model(dim_state=4, add_reward_embed_to_agent_token=False)
    variables = init_two_agent(model)
    env = MockStateEnv(dim_state=4, num_actions=3, max_steps=6)
    interactor = EnvInteractor(model)
    exp = interactor(variables, env, jax.random.PRNGKey(8),
                     max_timesteps=4, num_steps=2, agent_index=1)
    assert exp.agent_index == 1
    assert np.isfinite(np.asarray(exp.values)).all()
    assert np.isfinite(np.asarray(exp.log_probs.discrete)).all()
