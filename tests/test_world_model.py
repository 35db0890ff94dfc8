"""DynamicsWorldModel forward/loss tests (mirrors reference test_e2e
parametrizations at test_dreamer.py:8-165, on tokenizer latents)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer4_tpu.models.world_model import DynamicsWorldModel


def make_model(**kwargs):
    defaults = dict(
        dim=16,
        dim_latent=16,
        num_latent_tokens=4,
        max_steps=64,
        num_tasks=2,
        depth=1,
        time_block_every=1,
        num_spatial_tokens=4,
        num_discrete_actions=(4,),
        attn_dim_head=8,
        attn_heads=2,
        multi_token_pred_len=4,
        num_register_tokens=2,
    )
    defaults.update(kwargs)
    return DynamicsWorldModel(**defaults)


def init_model(model, **kwargs):
    latents = jnp.zeros((2, 4, model.num_latent_tokens, model.dim_latent))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    return model.init(rngs, latents=latents, shortcut_train=False, **kwargs)


@pytest.mark.parametrize('pred_orig_latent', [True, False])
@pytest.mark.parametrize('shortcut_train', [False, True])
def test_flow_loss(pred_orig_latent, shortcut_train):
    model = make_model(pred_orig_latent=pred_orig_latent)
    variables = init_model(model)
    latents = jax.random.uniform(jax.random.PRNGKey(0), (2, 4, 4, 16), minval=-1, maxval=1)
    loss = model.apply(variables, latents=latents, shortcut_train=shortcut_train,
                       rngs={'sample': jax.random.PRNGKey(2)})
    assert loss.shape == () and jnp.isfinite(loss)


@pytest.mark.parametrize('num_spatial_tokens', [2, 8])
def test_spatial_resampling(num_spatial_tokens):
    model = make_model(num_spatial_tokens=num_spatial_tokens)
    variables = init_model(model)
    latents = jax.random.uniform(jax.random.PRNGKey(0), (2, 4, 4, 16), minval=-1, maxval=1)
    loss = model.apply(variables, latents=latents, shortcut_train=False,
                       rngs={'sample': jax.random.PRNGKey(2)})
    assert jnp.isfinite(loss)


def test_full_conditioning():
    model = make_model(
        add_reward_embed_to_agent_token=True,
        add_state_pred_head=True,
        agent_predicts_state=True,
        predict_terminals=True,
        latent_ar=True,
        latent_ar_layer=0,
        latent_ar_loss_weight=1.0,
        latent_ar_num_slices=2,
        latent_ar_action_conditioned=True,
        use_loss_normalization=True,
    )
    latents = jax.random.uniform(jax.random.PRNGKey(0), (2, 4, 4, 16), minval=-1, maxval=1)
    rewards = jax.random.normal(jax.random.PRNGKey(1), (2, 4))
    terminals = jnp.array([True, False])
    actions = jax.random.randint(jax.random.PRNGKey(2), (2, 3, 1), 0, 4)
    tasks = jnp.array([0, 1])
    lens = jnp.array([3, 4])

    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    kwargs = dict(latents=latents, rewards=rewards, terminals=terminals,
                  discrete_actions=actions, tasks=tasks, lens=lens)
    variables = model.init(rngs, shortcut_train=True, **kwargs)

    (loss, losses, embeds), state = model.apply(
        variables, shortcut_train=True, return_intermediates=True,
        rngs={'sample': jax.random.PRNGKey(3)}, mutable=['state'], **kwargs)

    assert jnp.isfinite(loss)
    for name, val in losses._asdict().items():
        assert jnp.isfinite(jnp.sum(val)), f'{name} not finite'
    assert losses.rewards.shape == (4,)           # per-MTP-step
    assert embeds.agent.shape == (2, 4, 1, 16)
    # shortcut loss is active
    assert float(losses.shortcut) != 0.0


def test_signal_levels_passed_in():
    model = make_model()
    variables = init_model(model)
    latents = jax.random.uniform(jax.random.PRNGKey(0), (2, 4, 4, 16), minval=-1, maxval=1)
    signal_levels = jax.random.randint(jax.random.PRNGKey(1), (2, 4), 0, 32)
    step_sizes_log2 = jnp.array([2, 3])
    pred = model.apply(variables, latents=latents, signal_levels=signal_levels,
                       step_sizes_log2=step_sizes_log2, latent_is_noised=True,
                       rngs={'sample': jax.random.PRNGKey(2)})
    assert pred.flow.shape == (2, 4, 1, 4, 16)  # (b, t, views, n, d)


def test_inference_pred_with_cache():
    """Cached single-frame prediction == parallel prediction on the same
    prefix (core invariant, over the dynamics stack)."""
    model = make_model(depth=2, time_block_every=2)
    variables = init_model(model)
    latents = jax.random.uniform(jax.random.PRNGKey(0), (2, 5, 4, 16), minval=-1, maxval=1)
    signal = jnp.full((2, 5), 63)

    pred_par, (embeds_par, _) = model.apply(
        variables, latents=latents, signal_levels=signal, step_sizes=16,
        latent_is_noised=True, return_intermediates=True,
        rngs={'sample': jax.random.PRNGKey(2)})

    cache = model.apply(variables, 2, 5, method=model.init_cache)
    preds = []
    for i in range(5):
        pred_i, (embeds_i, cache) = model.apply(
            variables, latents=latents[:, i:i+1], signal_levels=jnp.full((2, 1), 63),
            step_sizes=16, latent_is_noised=True, cache=cache, return_intermediates=True,
            rngs={'sample': jax.random.PRNGKey(2)})
        preds.append(pred_i.flow)
    seq = jnp.concatenate(preds, axis=1)

    np.testing.assert_allclose(np.asarray(pred_par.flow), np.asarray(seq), atol=2e-5, rtol=1e-4)


def test_proprio_and_state_env():
    model = make_model(dim_proprio=3, dim_state=5, dim_critic_state=5,
                       num_discrete_actions=(), num_continuous_actions=2)
    latents = jnp.zeros((2, 4, 4, 16))
    proprio = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 3))
    cont_actions = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 2))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    variables = model.init(rngs, latents=latents, proprio=proprio,
                           continuous_actions=cont_actions, shortcut_train=False)

    loss = model.apply(variables, latents=latents, proprio=proprio,
                       continuous_actions=cont_actions, shortcut_train=True,
                       rngs={'sample': jax.random.PRNGKey(2)})
    assert jnp.isfinite(loss)

    # state-vector env -> latents
    state = jax.random.normal(jax.random.PRNGKey(3), (2, 5))
    lat = model.apply(variables, state, method=model.state_to_latents)
    assert lat.shape == (2, 4, 16)


def test_gene_and_task_conditioning():
    model = make_model(num_latent_genes=4)
    variables = init_model(model)
    latents = jax.random.uniform(jax.random.PRNGKey(0), (2, 4, 4, 16), minval=-1, maxval=1)
    loss = model.apply(variables, latents=latents, tasks=jnp.array([0, 1]),
                       latent_gene_ids=jnp.array([1, 3]), shortcut_train=False,
                       rngs={'sample': jax.random.PRNGKey(2)})
    assert jnp.isfinite(loss)
