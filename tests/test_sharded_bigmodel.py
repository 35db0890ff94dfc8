"""Driver config 5: the 256x256 tokenizer + dynamics training programs
compile and run sharded over a (data, model) mesh.

Small depth/dim (CPU CI budget) but the REAL 256x256 image pipeline:
patchify at 256x256 -> 256 spatial tokens/frame through the axial trunk,
params FSDP-sharded over the model axis, batch sharded over data.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dreamer4_tpu.parallel.mesh import DATA_AXIS, create_mesh, shard_batch, shard_params


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs the 8-device CPU mesh')
def test_tokenizer_256_sharded_train_step():
    from dreamer4_tpu.models.tokenizer import VideoTokenizer

    mesh = create_mesh(num_data=4, num_model=2)
    model = VideoTokenizer(
        dim=64, dim_latent=16, patch_size=16, image_height=256, image_width=256,
        num_latent_tokens=8, encoder_depth=2, decoder_depth=2, time_block_every=2)

    b, t = 4, 2
    video = jnp.zeros((b, 3, t, 256, 256))
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'sample': jax.random.PRNGKey(1)}, video)

    tx = optax.adam(1e-4)
    params = shard_params(variables['params'], mesh)
    state = jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())),
                         variables.get('state', {}))
    opt_state = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())) if hasattr(x, 'shape') else x,
        tx.init(variables['params']))
    video = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(2), (b, 3, t, 256, 256)),
        NamedSharding(mesh, P(DATA_AXIS)))

    @jax.jit
    def train_step(params, state, opt_state, video, key):
        def loss_fn(p):
            (loss, _interm), new_vars = model.apply(
                {'params': p, 'state': state}, video,
                return_intermediates=True, rngs={'sample': key},
                mutable=['state'])
            return loss, new_vars.get('state', {})

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state, new_opt_state, loss

    with mesh:
        params, state, opt_state, loss = train_step(
            params, state, opt_state, video, jax.random.PRNGKey(3))
        loss = float(jax.block_until_ready(loss))
    assert np.isfinite(loss)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs the 8-device CPU mesh')
def test_dynamics_256latents_sharded_with_dreams():
    """dynamics over the 256-config's latent shapes (16 latent tokens),
    sharded train step + data-sharded generate in one mesh."""
    from dreamer4_tpu.models.generate import generate
    from dreamer4_tpu.models.world_model import DynamicsWorldModel

    mesh = create_mesh(num_data=4, num_model=2)
    model = DynamicsWorldModel(
        dim=64, dim_latent=16, num_latent_tokens=16, num_spatial_tokens=16,
        max_steps=16, depth=2, time_block_every=2, attn_heads=4, attn_dim_head=16,
        num_discrete_actions=(4,), multi_token_pred_len=4, num_register_tokens=4,
        predict_terminals=False, add_action_embed_to_spatial=True)

    b, t = 4, 3
    latents = jnp.zeros((b, t, 16, 16))
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'sample': jax.random.PRNGKey(1)},
                           latents=latents, shortcut_train=False,
                           rewards=jnp.zeros((b, t)),
                           discrete_actions=jnp.zeros((b, t - 1, 1), jnp.int32))

    params = shard_params(variables['params'], mesh)
    state = jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())),
                         variables.get('state', {}))
    batch = shard_batch(dict(
        latents=jax.random.normal(jax.random.PRNGKey(2), (b, t, 16, 16)) * 0.3,
        rewards=jnp.zeros((b, t)),
        actions=jnp.zeros((b, t - 1, 1), jnp.int32)), mesh)

    @jax.jit
    def loss_fn(params, state, batch, key):
        loss, _ = model.apply({'params': params, 'state': state},
                              latents=batch['latents'], rewards=batch['rewards'],
                              discrete_actions=batch['actions'],
                              shortcut_train=True, rngs={'sample': key},
                              mutable=['state'])
        return loss

    @jax.jit
    def dream(params, state, p_lat, key):
        exp = generate(model, {'params': params, 'state': state}, key,
                       time_steps=3, num_steps=2, batch_size=b,
                       prompt_latents=p_lat)
        return exp.latents

    with mesh:
        loss = float(jax.block_until_ready(
            loss_fn(params, state, batch, jax.random.PRNGKey(3))))
        p_lat = jax.device_put(jnp.zeros((b, 1, 16, 16)),
                               NamedSharding(mesh, P(DATA_AXIS)))
        lat = jax.block_until_ready(dream(params, state, p_lat, jax.random.PRNGKey(4)))
    assert np.isfinite(loss)
    assert np.isfinite(np.asarray(lat)).all()
