"""learn-from-experience tests: generate -> rl_losses -> gradient step moves
the policy (mirrors reference e2e RL sections)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer4_tpu.models.generate import generate
from dreamer4_tpu.models.rl import ReturnStats, rl_losses
from dreamer4_tpu.models.world_model import DynamicsWorldModel


def make_model(**kwargs):
    defaults = dict(
        dim=16,
        dim_latent=8,
        num_latent_tokens=4,
        max_steps=16,
        depth=1,
        time_block_every=1,
        num_spatial_tokens=4,
        num_discrete_actions=(4,),
        attn_dim_head=8,
        attn_heads=2,
        multi_token_pred_len=2,
        num_register_tokens=2,
        predict_terminals=True,
    )
    defaults.update(kwargs)
    return DynamicsWorldModel(**defaults)


def init_model(model):
    latents = jnp.zeros((2, 3, model.num_latent_tokens, model.dim_latent))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    kwargs = {}
    if len([n for n in model.num_discrete_actions if n > 0]) > 0:
        kwargs['discrete_actions'] = jnp.zeros((2, 2, 1), jnp.int32)
    if model.num_continuous_actions:
        kwargs['continuous_actions'] = jnp.full((2, 2, model.num_continuous_actions), 0.5)
    return model.init(rngs, latents=latents, shortcut_train=False,
                      rewards=jnp.zeros((2, 3)), terminals=jnp.zeros((2,), bool), **kwargs)


@pytest.fixture(scope='module')
def model_and_experience():
    model = make_model()
    variables = init_model(model)
    exp = generate(model, variables, jax.random.PRNGKey(0),
                   time_steps=6, num_steps=2, batch_size=2)
    return model, variables, exp


@pytest.mark.parametrize('objective', ['ppo', 'pmpo', 'spo'])
def test_rl_losses(model_and_experience, objective):
    model, variables, exp = model_and_experience
    out = rl_losses(model, variables, exp, objective=objective,
                    return_stats=ReturnStats.create())
    assert jnp.isfinite(out.policy_loss)
    assert jnp.isfinite(out.value_loss)
    for v in out.stats.values():
        assert jnp.isfinite(v)


def test_rl_gradient_flows_to_heads(model_and_experience):
    model, variables, exp = model_and_experience

    def loss_fn(params):
        out = rl_losses(model, {'params': params}, exp, objective='ppo')
        return out.policy_loss + out.value_loss

    grads = jax.grad(loss_fn)(variables['params'])

    g_policy = jax.tree.reduce(lambda a, b: a + float(jnp.abs(b).sum()),
                               grads['policy_head'], 0.0)
    g_value = jax.tree.reduce(lambda a, b: a + float(jnp.abs(b).sum()),
                              grads['value_head'], 0.0)
    g_unembed = float(jnp.abs(grads['action_embedder']['discrete_action_unembed']).sum())
    assert g_policy > 0
    assert g_value > 0
    assert g_unembed > 0

    # with only_learn_policy_value_heads the trunk receives no gradient
    g_trunk = jax.tree.reduce(lambda a, b: a + float(jnp.abs(b).sum()),
                              grads['transformer'], 0.0)
    assert g_trunk == 0.0


def test_return_ema_stats():
    model = make_model(keep_reward_ema_stats=True)
    variables = init_model(model)
    exp = generate(model, variables, jax.random.PRNGKey(0),
                   time_steps=4, num_steps=2, batch_size=2)
    stats = ReturnStats.create()
    out = rl_losses(model, variables, exp, objective='ppo', return_stats=stats)
    # stats moved
    assert float(out.return_stats.mean) != 0.0 or float(out.return_stats.var) != 1.0


def test_rl_continuous(model_and_experience):
    model = make_model(num_discrete_actions=(), num_continuous_actions=2,
                       predict_terminals=False)
    variables = init_model(model)
    exp = generate(model, variables, jax.random.PRNGKey(0),
                   time_steps=4, num_steps=2, batch_size=2)
    out = rl_losses(model, variables, exp, objective='pmpo')
    assert jnp.isfinite(out.policy_loss) and jnp.isfinite(out.value_loss)


def test_soft_continuation_discounts_gae(model_and_experience):
    """Terminal probability of 1 at frame k must cut all influence of frames
    >k on the advantages at <=k (DreamerV3 soft continuation)."""
    model, variables, _ = model_and_experience
    exp = generate(model, variables, jax.random.PRNGKey(2),
                   time_steps=6, num_steps=2, batch_size=2,
                   hard_terminals=False)
    b, t = exp.rewards.shape

    # frame 2 certainly terminal -> frames 3+ cannot affect returns at <=2
    probs = jnp.zeros((b, t)).at[:, 2].set(1.0)
    exp_soft = exp.replace(terminal_probs=probs)

    out1 = rl_losses(model, variables, exp_soft, objective='ppo',
                     return_stats=ReturnStats.create())

    # perturb rewards strictly after the terminal frame
    exp_pert = exp_soft.replace(rewards=exp_soft.rewards.at[:, 4:].add(100.0))
    out2 = rl_losses(model, variables, exp_pert, objective='ppo',
                     return_stats=ReturnStats.create())

    # policy loss is weighted by alive-prob, which is 0 after frame 2: the
    # huge reward perturbation after the terminal cannot change it
    np.testing.assert_allclose(float(out1.policy_loss), float(out2.policy_loss),
                               rtol=1e-5)
    assert jnp.isfinite(out1.value_loss)
    assert float(out1.stats['mean_alive']) < 1.0


def test_prompt_frames_not_learned(model_and_experience):
    """Frames before prompt_len carry replayed actions with zeroed
    values/log-probs — they must not contribute to the losses."""
    model, variables, _ = model_and_experience
    exp = generate(model, variables, jax.random.PRNGKey(4),
                   time_steps=6, num_steps=2, batch_size=2,
                   hard_terminals=False)
    exp_p = exp.replace(prompt_len=2)

    out1 = rl_losses(model, variables, exp_p, objective='ppo',
                     return_stats=ReturnStats.create())

    # corrupt old log-probs at prompt frames only: loss must not move
    lp = exp_p.log_probs
    lp2 = lp._replace(discrete=lp.discrete.at[:, :2].add(3.21))
    out2 = rl_losses(model, variables, exp_p.replace(log_probs=lp2),
                     objective='ppo', return_stats=ReturnStats.create())
    np.testing.assert_allclose(float(out1.policy_loss), float(out2.policy_loss),
                               rtol=1e-6)

    # but corrupting a learnable frame does move it
    lp3 = lp._replace(discrete=lp.discrete.at[:, 3].add(3.21))
    out3 = rl_losses(model, variables, exp_p.replace(log_probs=lp3),
                     objective='ppo', return_stats=ReturnStats.create())
    assert abs(float(out1.policy_loss) - float(out3.policy_loss)) > 1e-6


def test_actor_critic_latent_input_path():
    """Drift-free head inputs: policy/value read latents through RL-owned
    encoders (actor_critic_latent_input). The full loop — generate ->
    rl_losses grads -> interactor — must run, gradients must reach the
    latent encoders + heads and NOTHING else, and dreams must carry
    finite log-probs/values."""
    import numpy as np

    from dreamer4_tpu.envs.interact import EnvInteractor
    from dreamer4_tpu.envs.mocks import MockStateEnv
    from dreamer4_tpu.models.generate import generate
    from dreamer4_tpu.train.trainers import rl_param_labels

    model = DynamicsWorldModel(
        dim=16, dim_latent=8, num_latent_tokens=4, max_steps=8, depth=1,
        time_block_every=1, num_spatial_tokens=4, num_discrete_actions=(3,),
        attn_dim_head=8, attn_heads=2, multi_token_pred_len=2,
        num_register_tokens=2, dim_state=4, predict_terminals=True,
        actor_critic_latent_input=True, use_loss_normalization=False)
    latents = jnp.zeros((2, 3, 4, 8))
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)},
        latents=latents, shortcut_train=False, rewards=jnp.zeros((2, 3)),
        terminals=jnp.zeros((2,), bool),
        discrete_actions=jnp.zeros((2, 2, 1), jnp.int32))
    assert 'actor_latent_encoder' in variables['params']

    labels = rl_param_labels(variables['params'], model)
    assert labels['actor_latent_encoder'] is not None

    exp = generate(model, variables, jax.random.PRNGKey(2), time_steps=5,
                   num_steps=2, batch_size=2, hard_terminals=False)
    assert np.isfinite(np.asarray(exp.values)).all()
    assert np.isfinite(np.asarray(exp.log_probs.discrete)).all()

    def loss_fn(params):
        out = rl_losses(model, {'params': params}, exp, objective='ppo')
        return out.policy_loss + out.value_loss

    grads = jax.grad(loss_fn)(variables['params'])

    def gnorm(tree):
        return float(sum(jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(tree)))

    assert gnorm(grads['actor_latent_encoder']) > 0
    assert gnorm(grads['critic_latent_encoder']) > 0
    assert gnorm(grads['policy_head']) > 0
    assert gnorm(grads['value_head']) > 0
    # the trunk gets nothing: the latent inputs fully decouple the heads
    assert gnorm(grads['transformer']) == 0

    env = MockStateEnv(dim_state=4, num_actions=3, batch=2, max_steps=4)
    roll = EnvInteractor(model)(variables, env, jax.random.PRNGKey(3),
                                num_steps=2, max_timesteps=4)
    assert np.isfinite(np.asarray(roll.values)).all()


def test_full_model_rl_reforwards_trunk(model_and_experience):
    """only_learn_policy_value_heads=False must re-forward the trunk with
    gradients even when agent embeds were stored with the experience
    (reference `dreamer4.py:6048-6070`); heads-only keeps the trunk frozen."""
    model, variables, exp = model_and_experience
    assert exp.agent_embed is not None  # stored embeds present

    def loss_fn(params, heads_only):
        out = rl_losses(model, {'params': params}, exp, objective='ppo',
                        only_learn_policy_value_heads=heads_only)
        return out.policy_loss + out.value_loss

    g_full = jax.grad(lambda p: loss_fn(p, False))(variables['params'])
    g_trunk = jax.tree.reduce(lambda a, b: a + float(jnp.abs(b).sum()),
                              g_full['transformer'], 0.0)
    assert g_trunk > 0.0

    g_heads = jax.grad(lambda p: loss_fn(p, True))(variables['params'])
    g_trunk_frozen = jax.tree.reduce(lambda a, b: a + float(jnp.abs(b).sum()),
                                     g_heads['transformer'], 0.0)
    assert g_trunk_frozen == 0.0


def test_image_encoder_rl_path(model_and_experience):
    """experience without latents: video -> encode_video_fn(encoder_params, v)
    inside the loss; full-model RL trains the encoder, heads-only freezes it
    (reference `dreamer4.py:5914-5921, 5335-5374`)."""
    model, variables, exp = model_and_experience
    b, t = exp.rewards.shape
    n, d = model.num_latent_tokens, model.dim_latent

    video = jax.random.uniform(jax.random.PRNGKey(9), (b, 3, t, 8, 8))
    enc_params = {'w': jax.random.normal(jax.random.PRNGKey(10), (3 * 8 * 8, n * d)) * 0.05}

    def encode(p, vid):
        x = jnp.moveaxis(vid, 2, 1).reshape(vid.shape[0], vid.shape[2], -1)
        return jnp.tanh(x @ p['w']).reshape(vid.shape[0], vid.shape[2], n, d)

    exp_v = exp.replace(latents=None, video=video, agent_embed=None)

    def loss_fn(p_enc, params, heads_only):
        out = rl_losses(model, {'params': params}, exp_v, objective='ppo',
                        only_learn_policy_value_heads=heads_only,
                        encode_video_fn=encode, encoder_params=p_enc)
        return out.policy_loss + out.value_loss

    g_enc = jax.grad(lambda p: loss_fn(p, variables['params'], False))(enc_params)
    assert float(jnp.abs(g_enc['w']).sum()) > 0.0

    g_enc_frozen = jax.grad(lambda p: loss_fn(p, variables['params'], True))(enc_params)
    assert float(jnp.abs(g_enc_frozen['w']).sum()) == 0.0


def test_make_rl_optimizer_trunk_mode(model_and_experience):
    """trunk_lr wires a 'trunk' group: a full-model update step moves trunk
    params; the heads-only optimizer keeps them bit-identical."""
    from dreamer4_tpu.train.trainers import (RLState, make_rl_optimizer,
                                             make_rl_update_step)

    model, variables, exp = model_and_experience

    def run(trunk_lr, heads_only):
        tx = make_rl_optimizer(model, policy_lr=1e-3, value_lr=1e-3,
                               trunk_lr=trunk_lr)(variables['params'])
        step = make_rl_update_step(model, tx, 'ppo',
                                   only_learn_policy_value_heads=heads_only)
        state = RLState(params=variables['params'],
                        opt_state=tx.init(variables['params']),
                        return_stats=ReturnStats.create(),
                        step=jnp.zeros((), jnp.int32))
        new_state, _ = step(state, exp)
        before = jnp.concatenate([x.ravel() for x in
                                  jax.tree_util.tree_leaves(variables['params']['transformer'])])
        after = jnp.concatenate([x.ravel() for x in
                                 jax.tree_util.tree_leaves(new_state.params['transformer'])])
        return float(jnp.abs(after - before).max())

    assert run(trunk_lr=1e-3, heads_only=False) > 0.0
    assert run(trunk_lr=None, heads_only=True) == 0.0


def test_soft_continuation_flag(model_and_experience):
    """soft_continuation=False ignores terminal_probs for the GAE discount
    and the alive weights (single hard-terminal mechanism, see rl_losses
    docstring on the double-discount bias)."""
    model, variables, _ = model_and_experience
    exp = generate(model, variables, jax.random.PRNGKey(11),
                   time_steps=6, num_steps=2, batch_size=2,
                   hard_terminals=False)
    assert exp.terminal_probs is not None
    out_soft = rl_losses(model, variables, exp, objective='ppo',
                         return_stats=ReturnStats.create())
    out_hard = rl_losses(model, variables, exp, objective='ppo',
                         soft_continuation=False,
                         return_stats=ReturnStats.create())
    assert 'mean_alive' in out_soft.stats and 'mean_alive' not in out_hard.stats
    assert float(out_soft.policy_loss) != float(out_hard.policy_loss)


def test_latent_input_full_model_rl_semantics():
    """actor_critic_latent_input heads never give the trunk RL gradients, so
    only_learn_policy_value_heads=False must either raise (ambiguous ask) or,
    when acknowledged via latent_input_full_model_ok, train the latent
    encoders + heads while the trunk provably stays gradient-free
    (VERDICT r3: rl.py previously disabled full-model RL silently here)."""
    model = make_model(actor_critic_latent_input=True)
    variables = init_model(model)
    exp = generate(model, variables, jax.random.PRNGKey(3),
                   time_steps=6, num_steps=2, batch_size=2)

    with pytest.raises(ValueError, match='latent_input_full_model_ok'):
        rl_losses(model, variables, exp, objective='ppo',
                  only_learn_policy_value_heads=False)

    def loss_fn(params):
        out = rl_losses(model, {'params': params}, exp, objective='ppo',
                        only_learn_policy_value_heads=False,
                        latent_input_full_model_ok=True)
        return out.policy_loss + out.value_loss

    grads = jax.grad(loss_fn)(variables['params'])
    g_actor_enc = jax.tree.reduce(lambda a, b: a + float(jnp.abs(b).sum()),
                                  grads['actor_latent_encoder'], 0.0)
    g_critic_enc = jax.tree.reduce(lambda a, b: a + float(jnp.abs(b).sum()),
                                   grads['critic_latent_encoder'], 0.0)
    g_trunk = jax.tree.reduce(lambda a, b: a + float(jnp.abs(b).sum()),
                              grads['transformer'], 0.0)
    assert g_actor_enc > 0.0
    assert g_critic_enc > 0.0
    assert g_trunk == 0.0
