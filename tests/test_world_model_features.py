"""World-model optional subsystems: actor/critic transformers, pre-encoders,
LAPO/TEM SSL, aug conditioning, multi-view, actor-SPR, SelfFlow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer4_tpu.models.generate import generate
from dreamer4_tpu.models.rl import rl_losses
from dreamer4_tpu.models.self_flow import SelfFlowHead, self_flow_loss
from dreamer4_tpu.models.world_model import DynamicsWorldModel


def make_model(**kwargs):
    defaults = dict(
        dim=16, dim_latent=8, num_latent_tokens=4, max_steps=8, depth=1,
        time_block_every=1, num_spatial_tokens=4, num_discrete_actions=(3,),
        attn_dim_head=8, attn_heads=2, multi_token_pred_len=2, num_register_tokens=2)
    defaults.update(kwargs)
    return DynamicsWorldModel(**defaults)


def init_and_loss(model, v=1, **extra):
    t = 4
    latents_shape = (2, t, v, 4, 8) if v > 1 else (2, t, 4, 8)
    latents = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), latents_shape), -1, 1)
    kwargs = dict(
        latents=latents,
        rewards=jax.random.normal(jax.random.PRNGKey(1), (2, t)),
        terminals=jnp.zeros((2,), bool),
        discrete_actions=jax.random.randint(jax.random.PRNGKey(2), (2, t - 1, 1), 0, 3),
        latent_has_view_dim=v > 1,
        **extra,
    )
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    variables = model.init(rngs, shortcut_train=False, **kwargs)
    out = model.apply(variables, shortcut_train=True, return_intermediates=True,
                      rngs={'sample': jax.random.PRNGKey(3)}, **kwargs)
    return out, variables, kwargs


def test_actor_critic_transformers():
    model = make_model(actor_depth=1, critic_depth=1)
    (loss, losses, embeds), variables, kwargs = init_and_loss(model)
    assert jnp.isfinite(loss)
    # actor/critic embeds differ from the main agent embed
    assert not np.allclose(np.asarray(embeds.actor), np.asarray(embeds.agent), atol=1e-5)
    assert not np.allclose(np.asarray(embeds.critic), np.asarray(embeds.agent), atol=1e-5)

    exp = generate(model, variables, jax.random.PRNGKey(0), time_steps=3,
                   num_steps=2, batch_size=2)
    assert exp.latents.shape == (2, 3, 4, 8)


def test_pre_encoders_and_ssl():
    model = make_model(spatial_pre_encoder_depth=1, action_pre_encoder_depth=1,
                       ssl_lapo=True, ssl_tem=True)
    (loss, losses, embeds), variables, kwargs = init_and_loss(model)
    assert jnp.isfinite(loss)
    assert float(losses.lapo_fdm) > 0.0
    assert float(losses.tem) > 0.0
    assert jnp.isfinite(losses.lapo_action)


def test_aug_conditioning_wm():
    model = make_model(has_aug_conditioning=True, depth=2, time_block_every=2)
    (loss, losses, embeds), variables, kwargs = init_and_loss(model)
    assert jnp.isfinite(loss)

    # the aug token is a special token: like the reference masking, it reaches
    # the agent embeds (special sees everything) but not the modality tokens
    fw = {k: v for k, v in kwargs.items() if k != 'terminals'}
    _, (emb0, _) = model.apply(variables, signal_levels=7, step_sizes=4, latent_is_noised=True,
                               aug_id=0, return_intermediates=True,
                               rngs={'sample': jax.random.PRNGKey(5)}, **fw)
    _, (emb2, _) = model.apply(variables, signal_levels=7, step_sizes=4, latent_is_noised=True,
                               aug_id=True, return_intermediates=True,
                               rngs={'sample': jax.random.PRNGKey(5)}, **fw)
    assert not np.allclose(np.asarray(emb0.agent), np.asarray(emb2.agent), atol=1e-5)


def test_multi_view():
    model = make_model(num_video_views=2, predict_terminals=True,
                       add_state_pred_head=False)
    (loss, losses, embeds), variables, kwargs = init_and_loss(model, v=2)
    assert jnp.isfinite(loss)

    pred = model.apply(variables, signal_levels=7, step_sizes=4, latent_is_noised=True,
                       rngs={'sample': jax.random.PRNGKey(5)},
                       **{k: v for k, v in kwargs.items() if k != 'terminals'})
    assert pred.flow.shape == (2, 4, 2, 4, 8)


def test_actor_spr_in_rl():
    model = make_model(actor_spr=True, max_steps=8, predict_terminals=False)
    latents = jnp.zeros((2, 3, 4, 8))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    variables = model.init(rngs, latents=latents, shortcut_train=False,
                           rewards=jnp.zeros((2, 3)),
                           discrete_actions=jnp.zeros((2, 2, 1), jnp.int32))
    exp = generate(model, variables, jax.random.PRNGKey(0), time_steps=5,
                   num_steps=2, batch_size=2)
    out = rl_losses(model, variables, exp, objective='ppo')
    assert jnp.isfinite(out.policy_loss)

    # gradient reaches the SPR dynamics MLP
    def loss_fn(params):
        return rl_losses(model, {'params': params}, exp, objective='ppo').policy_loss

    grads = jax.grad(loss_fn)(variables['params'])
    g = jax.tree.reduce(lambda a, b: a + float(jnp.abs(b).sum()),
                        grads['actor_spr_module'], 0.0)
    assert g > 0


def test_self_flow():
    model = make_model(depth=2, time_block_every=2, predict_terminals=False)
    latents = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8)), -1, 1)
    kwargs = dict(latents=latents, shortcut_train=False)
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    variables = model.init(rngs, **kwargs)

    head = SelfFlowHead(dim=16)
    hv = head.init(jax.random.PRNGKey(2), jnp.zeros((2, 4, 3, 16)), jnp.zeros((2, 4, 3, 16)))

    # teacher = slightly perturbed params
    ema_vars = jax.tree.map(lambda x: x * 0.99, variables)
    loss = self_flow_loss(model, head, hv, variables, ema_vars, kwargs, jax.random.PRNGKey(3))
    assert jnp.isfinite(loss)

    # identical params & seed at matching layers -> near-zero distance
    loss_same = self_flow_loss(model, head, hv, variables, variables, kwargs,
                               jax.random.PRNGKey(3), student_layer=-1, teacher_layer=-1)
    # head transforms student, so not exactly zero, but finite and smaller scale
    assert jnp.isfinite(loss_same)


@pytest.mark.parametrize('dynamic', [False, True])
def test_world_model_hnet_trunk(dynamic):
    """H-Net chunking on the dynamics trunk (reference splices the
    hierarchical temporal transformer into any AxialSpaceTimeTransformer,
    `dreamer4.py:3151-3170`): forward carries the ratio loss and `generate`
    still dreams through the chunked trunk."""
    model = make_model(depth=2, time_block_every=2, h_net_layer=1,
                       h_net_depth=1, h_net_compression_ratio=2,
                       h_net_dynamic=dynamic)
    (loss, losses, embeds), variables, kwargs = init_and_loss(model)
    assert jnp.isfinite(loss)
    assert jnp.isfinite(jnp.asarray(losses.h_net))
    if dynamic:
        # the ratio loss is live only for learned boundaries
        g = jax.grad(lambda p: model.apply(
            {**variables, 'params': p}, shortcut_train=False,
            rngs={'sample': jax.random.PRNGKey(3)}, **kwargs))(variables['params'])
        bh = g['transformer']['h_net']['boundary_head']['kernel']
        assert float(jnp.abs(bh).sum()) > 0

    exp = generate(model, variables, jax.random.PRNGKey(0), time_steps=3,
                   num_steps=2, batch_size=2)
    assert exp.latents.shape == (2, 3, 4, 8)
    assert bool(jnp.all(jnp.isfinite(exp.latents)))
