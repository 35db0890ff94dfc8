"""Imagination rollout tests (reference test_dreamer.py generate paths)."""
import jax
import jax.numpy as jnp
import numpy as np

from dreamer4_tpu.models.generate import generate
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
    return model.init(rngs, latents=latents, shortcut_train=False,
                      rewards=jnp.zeros((2, 3)), terminals=jnp.zeros((2,), bool),
                      discrete_actions=jnp.zeros((2, 2, 1), jnp.int32))


def test_generate_rollout():
    model = make_model()
    variables = init_model(model)

    exp = generate(model, variables, jax.random.PRNGKey(0),
                   time_steps=5, num_steps=4, batch_size=2)

    assert exp.latents.shape == (2, 5, 4, 8)
    assert jnp.abs(exp.latents).max() <= 1.0
    assert exp.rewards.shape == (2, 5)
    assert exp.actions.discrete.shape == (2, 5, 1)
    assert exp.log_probs.discrete.shape == (2, 5, 1)
    assert exp.values.shape == (2, 5)
    assert exp.agent_embed.shape == (2, 5, 16)
    assert exp.terminals.shape == (2,)
    assert exp.lens.shape == (2,)
    assert exp.step_size == 4
    assert (exp.lens <= 5).all()
    assert jnp.isfinite(exp.episode_return).all()
    # unembeds present for PMPO KL
    d_logits, c_params = exp.old_action_unembeds
    assert d_logits[0].shape == (2, 5, 4)
    assert c_params is None


def test_generate_with_prompt():
    model = make_model(predict_terminals=False)
    variables = init_model(model)

    prompt = jnp.clip(jax.random.normal(jax.random.PRNGKey(1), (2, 2, 4, 8)), -1, 1)
    prompt_actions = jax.random.randint(jax.random.PRNGKey(2), (2, 2, 1), 0, 4)

    exp = generate(model, variables, jax.random.PRNGKey(0),
                   time_steps=4, num_steps=2, batch_size=2,
                   prompt_latents=prompt, prompt_discrete_actions=prompt_actions)

    assert exp.latents.shape == (2, 4, 4, 8)
    # prompt preserved
    np.testing.assert_allclose(np.asarray(exp.latents[:, :2]), np.asarray(prompt), atol=1e-6)
    # generated frames differ from zero
    assert float(jnp.abs(exp.latents[:, 2:]).sum()) > 0


def test_generate_jits_once():
    """The whole rollout is one compiled program; different keys reuse it."""
    model = make_model(predict_terminals=False)
    variables = init_model(model)

    fn = jax.jit(lambda v, k: generate(model, v, k, time_steps=4, num_steps=2, batch_size=2))
    e1 = fn(variables, jax.random.PRNGKey(0))
    e2 = fn(variables, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(e1.latents[:, -1]), np.asarray(e2.latents[:, -1]))


def test_generate_continuous_actions():
    model = make_model(num_discrete_actions=(), num_continuous_actions=2,
                       predict_terminals=False)
    latents = jnp.zeros((2, 3, 4, 8))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    variables = model.init(rngs, latents=latents, shortcut_train=False,
                           continuous_actions=jnp.full((2, 2, 2), 0.5))

    exp = generate(model, variables, jax.random.PRNGKey(0),
                   time_steps=3, num_steps=2, batch_size=2)
    assert exp.actions.continuous.shape == (2, 3, 2)
    assert (exp.actions.continuous >= 0).all() and (exp.actions.continuous <= 1).all()  # beta native
