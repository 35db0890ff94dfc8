"""ActionEmbedder tests (mirrors reference test_dreamer.py:344-518)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer4_tpu.nn.action_embedder import ActionEmbedder


def make(**kwargs):
    defaults = dict(
        dim=16,
        num_discrete_actions=(4, 6),
        num_continuous_actions=2,
        can_unembed=True,
        unembed_dim=32,
        num_unembed_preds=3,
    )
    defaults.update(kwargs)
    return ActionEmbedder(**defaults)


def test_embed_pool():
    model = make()
    disc = jnp.array([[1, 5], [3, 0]])
    cont = jnp.array([[0.3, -0.2], [0.9, 0.1]])
    params = model.init(jax.random.PRNGKey(0), discrete_actions=disc, continuous_actions=cont)
    pooled = model.apply(params, discrete_actions=disc, continuous_actions=cont)
    assert pooled.shape == (2, 16)

    # different discrete values for the second action type map to different
    # rows of the shared table (offset check)
    p1 = model.apply(params, discrete_actions=jnp.array([[0, 0]]))
    p2 = model.apply(params, discrete_actions=jnp.array([[0, 1]]))
    assert not np.allclose(np.asarray(p1), np.asarray(p2))


@pytest.mark.parametrize('dist_type', ['beta', 'gaussian', 'squashed_gaussian'])
def test_sample_and_log_probs(dist_type):
    model = make(continuous_dist_type=dist_type)
    embeds = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    disc = jnp.zeros((1, 2), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), discrete_actions=disc)

    sampled_d, sampled_c = model.apply(
        params, jax.random.PRNGKey(1), embeds, method=model.sample)
    assert sampled_d.shape == (2, 5, 2)
    assert sampled_c.shape == (2, 5, 2)
    assert int(sampled_d[..., 0].max()) < 4 and int(sampled_d[..., 1].max()) < 6

    lp, ent = model.apply(
        params, embeds,
        discrete_targets=sampled_d, continuous_targets=sampled_c,
        pred_head_index=0, return_entropies=True, method=model.log_probs)
    assert lp.discrete.shape == (2, 5, 2)
    assert lp.continuous.shape == (2, 5, 2)
    assert jnp.isfinite(lp.continuous).all()
    assert ent.discrete.shape == (2, 5, 2)

    if dist_type in ('beta', 'squashed_gaussian'):
        scaled = model.apply(params, sampled_c, method=model.rescale_for_env)
        assert float(scaled.min()) >= -1.0 and float(scaled.max()) <= 1.0


def test_multi_head_unembed_and_broadcast():
    model = make()
    embeds = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    disc = jnp.zeros((1, 2), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), discrete_actions=disc)

    logits, cont = model.apply(params, embeds, method=model.unembed)
    assert logits[0].shape == (3, 2, 5, 4)   # (mtp, b, t, n_actions)
    assert logits[1].shape == (3, 2, 5, 6)
    assert cont.shape == (3, 2, 5, 2, 2)

    # single head squeezes
    logits0, cont0 = model.apply(params, embeds, pred_head_index=1, method=model.unembed)
    assert logits0[0].shape == (2, 5, 4)
    np.testing.assert_allclose(np.asarray(logits0[0]), np.asarray(logits[0][1]), atol=1e-6)

    # multi-head log prob broadcasting of unsqueezed targets
    targets_d = jnp.zeros((2, 5, 2), jnp.int32)
    targets_c = jnp.full((2, 5, 2), 0.5)
    lp = model.apply(params, embeds, discrete_targets=targets_d,
                     continuous_targets=targets_c, method=model.log_probs)
    assert lp.discrete.shape == (3, 2, 5, 2)
    assert lp.continuous.shape == (3, 2, 5, 2)


def test_kl_div_self_zero():
    model = make()
    embeds = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    disc = jnp.zeros((1, 2), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), discrete_actions=disc)
    out = model.apply(params, embeds, pred_head_index=0, method=model.unembed)
    d_kl, c_kl = model.apply(params, out, out, method=model.kl_div)
    np.testing.assert_allclose(np.asarray(d_kl), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_kl), 0.0, atol=1e-5)


def test_parallel_vs_sequential_log_prob_equivalence():
    """Per-head log prob == slice of multi-head log prob (the reference's
    parallel-vs-sequential idiom for action readout)."""
    model = make()
    embeds = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    disc = jnp.zeros((1, 2), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), discrete_actions=disc)

    targets_d = jnp.ones((2, 5, 2), jnp.int32)
    targets_c = jnp.full((2, 5, 2), 0.3)

    lp_all = model.apply(params, embeds, discrete_targets=targets_d,
                         continuous_targets=targets_c, method=model.log_probs)
    for head in range(3):
        lp_h = model.apply(params, embeds, discrete_targets=targets_d,
                           continuous_targets=targets_c, pred_head_index=head,
                           method=model.log_probs)
        np.testing.assert_allclose(np.asarray(lp_h.discrete), np.asarray(lp_all.discrete[head]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(lp_h.continuous), np.asarray(lp_all.continuous[head]), atol=1e-5)
