"""Optimizer tests: Newton-Schulz orthogonalization, Muon/Adam label routing,
adam-atan2 updates, FIRE, EPO evolve."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dreamer4_tpu.ops.fire import apply_fire, evolve_latent_genes, evolve_params
from dreamer4_tpu.train.optim import (adam_atan2, muon, muon_adam_atan2,
                                      muon_label_fn, newton_schulz_orthogonalize)


def test_newton_schulz_orthogonalizes():
    key = jax.random.PRNGKey(0)
    g = jax.random.normal(key, (64, 32))
    o = newton_schulz_orthogonalize(g, steps=10)
    gram = np.asarray(o.T @ o)
    np.testing.assert_allclose(gram, np.eye(32), atol=0.35)  # Muon NS is loosely orthogonal by design


def test_muon_label_routing():
    params = {
        'attn': {'to_v': {'kernel': jnp.zeros((8, 8))},
                 'to_q': {'kernel': jnp.zeros((8, 8))}},
        'ff': {'proj_in': {'kernel': jnp.zeros((8, 16)), 'bias': jnp.zeros((16,))}},
        'head': {'kernel': jnp.zeros((8, 4))},
    }
    labels = jax.tree_util.tree_map_with_path(muon_label_fn, params)
    assert labels['attn']['to_v']['kernel'] == 'muon'
    assert labels['attn']['to_q']['kernel'] == 'adam'   # q/k excluded (Kimi-2)
    assert labels['ff']['proj_in']['kernel'] == 'muon'
    assert labels['ff']['proj_in']['bias'] == 'adam'    # non-2D
    assert labels['head']['kernel'] == 'adam'


def test_optimizer_reduces_quadratic():
    def loss_fn(params):
        return jnp.sum(jnp.square(params['ff']['proj_in']['kernel'] - 1.0)) + \
               jnp.sum(jnp.square(params['head']['kernel'] + 2.0))

    params = {'ff': {'proj_in': {'kernel': jnp.zeros((8, 8))}},
              'head': {'kernel': jnp.zeros((4,))}}
    tx = muon_adam_atan2(learning_rate=0.05, muon_learning_rate=0.05, clip_grad_norm=10.0)
    opt_state = tx.init(params)

    first = float(loss_fn(params))
    for _ in range(50):
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    assert float(loss_fn(params)) < first * 0.5


def test_adam_atan2_no_eps_blowup():
    tx = adam_atan2(learning_rate=0.1)
    params = {'w': jnp.zeros((4,))}
    state = tx.init(params)
    # tiny gradients: atan2 formulation stays bounded without an eps
    grads = {'w': jnp.full((4,), 1e-12)}
    updates, state = tx.update(grads, state, params)
    assert jnp.isfinite(updates['w']).all()
    assert float(jnp.abs(updates['w']).max()) < 0.2


def test_fire_preserves_norm_and_orthogonalizes():
    key = jax.random.PRNGKey(0)
    params = {'w': jax.random.normal(key, (32, 16)), 'b': jnp.ones((16,))}
    out = apply_fire(params)
    # frobenius norm preserved
    np.testing.assert_allclose(float(jnp.linalg.norm(out['w'])),
                               float(jnp.linalg.norm(params['w'])), rtol=1e-3)
    # more orthogonal than before (smaller off-diagonal energy of normalized gram)
    def off_diag_energy(w):
        w = w / jnp.linalg.norm(w)
        g = np.asarray(w.T @ w)
        return float(np.square(g - np.diag(np.diag(g))).sum())
    assert off_diag_energy(out['w']) < off_diag_energy(params['w'])
    # non-2D untouched
    np.testing.assert_allclose(np.asarray(out['b']), 1.0)


def test_evolve_latent_genes():
    key = jax.random.PRNGKey(0)
    genes = jax.random.normal(key, (8, 4))
    fitness = jnp.arange(8.0)
    new = evolve_latent_genes(key, genes, fitness)
    assert new.shape == genes.shape
    # best gene survives
    assert any(np.allclose(np.asarray(new[i]), np.asarray(genes[7])) for i in range(8))

    params = {'latent_genes': genes, 'other': jnp.zeros((2,))}
    out = evolve_params(key, params, fitness)
    assert out['latent_genes'].shape == genes.shape
    np.testing.assert_allclose(np.asarray(out['other']), 0.0)
