"""Substrate-layer tests: codecs round-trip (mirrors reference
test_dreamer.py:167-213), distributions, GAE scan, MTP targets, loss
normalizer fixed point (test_dreamer.py:558-569)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer4_tpu.ops import (
    SymExpTwoHot,
    HLGauss,
    calc_gae,
    create_multi_token_prediction_targets,
    init_loss_normalizer,
    apply_loss_normalizer,
    sigreg,
    masked_mean,
    lens_to_mask,
)
from dreamer4_tpu.ops import dists


def test_symexp_two_hot_roundtrip():
    codec = SymExpTwoHot((-3.0, 3.0), num_bins=20)
    values = jax.random.normal(jax.random.PRNGKey(0), (10,))
    encoded = codec.encode(values)
    assert encoded.shape == (10, 20)
    recon = codec.decode(encoded, normalize=False)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(values), atol=1e-5)


def test_symexp_two_hot_clamps():
    codec = SymExpTwoHot((-3.0, 3.0), num_bins=21)
    values = jnp.array([-1e6, 1e6])
    recon = codec.decode(codec.encode(values), normalize=False)
    lo, hi = float(codec.bin_values[0]), float(codec.bin_values[-1])
    np.testing.assert_allclose(np.asarray(recon), [lo, hi], rtol=1e-5)


def test_hl_gauss_roundtrip():
    codec = HLGauss((-3.0, 3.0), num_bins=20)
    values = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), (10,)), -3.0, 3.0)
    probs = codec.encode(values)
    assert probs.shape == (10, 20)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    recon = codec.decode(probs, normalize=False)
    assert recon.min() >= -3.0 and recon.max() <= 3.0
    # hl-gauss is smooth, not exact; tolerance reflects sigma smoothing
    np.testing.assert_allclose(np.asarray(recon), np.asarray(values), atol=0.2)

    empty = codec.encode(jnp.zeros((2, 0)))
    assert empty.shape == (2, 0, 20)


def test_gae_matches_sequential():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    b, t = 3, 12
    rewards = jax.random.normal(k1, (b, t))
    values = jax.random.normal(k2, (b, t))
    masks = jnp.ones((b, t)).at[:, -3:].set(0.0)

    gamma, lam = 0.99, 0.95
    returns = calc_gae(rewards, values, masks=masks, gamma=gamma, lam=lam)

    # sequential reference
    values_np = np.asarray(values)
    rewards_np = np.asarray(rewards)
    masks_np = np.asarray(masks)
    v_next = np.concatenate([values_np[:, 1:], np.zeros((b, 1))], axis=1)
    delta = rewards_np + gamma * v_next * masks_np - values_np
    gae = np.zeros((b,))
    out = np.zeros((b, t))
    for i in reversed(range(t)):
        gae = delta[:, i] + gamma * lam * masks_np[:, i] * gae
        out[:, i] = gae
    np.testing.assert_allclose(np.asarray(returns), out + values_np, atol=1e-5)


def test_mtp_targets():
    b, t, steps = 2, 5, 3
    x = jnp.arange(b * t).reshape(b, t).astype(jnp.float32)
    targets, mask = create_multi_token_prediction_targets(x, steps)
    assert targets.shape == (b, t, steps)
    assert mask.shape == (b, t, steps)
    # position 0 sees steps 0,1,2; last position only itself
    np.testing.assert_allclose(np.asarray(targets[0, 0]), [0, 1, 2])
    assert bool(mask[0, -1, 0]) and not bool(mask[0, -1, 1])


def test_loss_normalizer_fixed_point():
    state = init_loss_normalizer(1)
    loss = jnp.array(4.0)
    for _ in range(2000):
        normed, state = apply_loss_normalizer(state, loss)
    # at fixed point the normalized loss approaches 1
    np.testing.assert_allclose(float(normed[0]), 1.0, atol=1e-2)


def test_sigreg_prefers_gaussian():
    key = jax.random.PRNGKey(0)
    gaussian = jax.random.normal(key, (1, 256, 16))
    shifted = gaussian * 4.0 + 3.0
    loss_g = sigreg(jax.random.PRNGKey(1), gaussian, num_slices=64)
    loss_s = sigreg(jax.random.PRNGKey(1), shifted, num_slices=64)
    assert float(loss_g) < float(loss_s)


def test_multi_categorical():
    key = jax.random.PRNGKey(0)
    logits = (jax.random.normal(key, (4, 3)), jax.random.normal(key, (4, 5)))
    samples = dists.multi_categorical_sample(key, logits)
    assert samples.shape == (4, 2)
    assert samples[:, 0].max() < 3 and samples[:, 1].max() < 5

    lp = dists.multi_categorical_log_prob(logits, samples)
    assert lp.shape == (4, 2)
    assert (lp <= 0).all()

    ent = dists.multi_categorical_entropy(logits)
    assert ent.shape == (4, 2)
    assert (ent >= 0).all()

    kl_self = dists.multi_categorical_kl(logits, logits)
    np.testing.assert_allclose(np.asarray(kl_self), 0.0, atol=1e-6)


@pytest.mark.parametrize('dist_type', ['gaussian', 'squashed_gaussian', 'beta'])
def test_continuous_dists(dist_type):
    key = jax.random.PRNGKey(0)
    params = jax.random.normal(key, (64, 2, 2)) * 0.5
    samples = dists.continuous_sample(key, params, dist_type)
    assert samples.shape == (64, 2)

    rng = dists.native_range(dist_type)
    if rng is not None:
        lo, hi = rng
        assert samples.min() >= lo and samples.max() <= hi
        scaled = dists.rescale_from_native(samples, dist_type, (-2.0, 2.0))
        assert scaled.min() >= -2.0 and scaled.max() <= 2.0

    lp = dists.continuous_log_prob(params, samples, dist_type)
    assert lp.shape == (64, 2)
    assert jnp.isfinite(lp).all()

    ent = dists.continuous_entropy(params, dist_type)
    assert jnp.isfinite(ent).all()

    kl_self = dists.continuous_kl(params, params, dist_type)
    np.testing.assert_allclose(np.asarray(kl_self), 0.0, atol=1e-5)

    other = params + 1.0
    kl = dists.continuous_kl(params, other, dist_type)
    assert (kl > -1e-6).all()


def test_masked_mean_and_lens():
    x = jnp.array([[1.0, 2.0, 100.0], [3.0, 100.0, 100.0]])
    mask = lens_to_mask(jnp.array([2, 1]), 3)
    out = masked_mean(x, mask, axis=-1)
    np.testing.assert_allclose(np.asarray(out), [1.5, 3.0])
