"""Action distribution library.

TPU-native equivalent of the reference's `discrete_continuous_embed_readout`
dependency (`MultiCategorical`, `Readout`, `BetaDist`, `rescale` — used at
`dreamer4.py:45-46, 1357-1499`). Pure jnp, explicit PRNG keys, analytic
log-probs / entropies / KLs so everything jits.

Conventions
-----------
- Discrete: a tuple of logits arrays, one per action type, shapes
  (..., n_i). `targets` are (..., na) integer indices.
- Continuous: params (..., na, 2) raw outputs per action type, interpreted per
  dist type:
    gaussian / squashed_gaussian : (mean, log_var)
    beta (unimodal)              : alpha = 1+softplus(p0), beta = 1+softplus(p1)
  Native supports: gaussian = R, squashed_gaussian = (-1, 1), beta = (0, 1).
"""
from __future__ import annotations

from typing import Literal, Sequence

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln

ContinuousDistType = Literal['gaussian', 'squashed_gaussian', 'beta']

LOG_2PI = 1.8378770664093453


# ------------------------------------------------------------------ discrete

def multi_categorical_sample(key, logits: Sequence[jax.Array], temperature: float = 1.0) -> jax.Array:
    """Sample each action type independently -> (..., na) ints."""
    keys = jax.random.split(key, len(logits))
    samples = []
    for k, l in zip(keys, logits):
        scaled = l / jnp.maximum(temperature, 1e-10)
        samples.append(jax.random.categorical(k, scaled, axis=-1))
    return jnp.stack(samples, axis=-1)


def multi_categorical_log_prob(logits: Sequence[jax.Array], targets: jax.Array) -> jax.Array:
    """-> (..., na) per-action-type log probs."""
    out = []
    for i, l in enumerate(logits):
        logp = jax.nn.log_softmax(l, axis=-1)
        tgt = targets[..., i]
        out.append(jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0])
    return jnp.stack(out, axis=-1)


def multi_categorical_entropy(logits: Sequence[jax.Array]) -> jax.Array:
    """-> (..., na) per-action-type entropies."""
    out = []
    for l in logits:
        logp = jax.nn.log_softmax(l, axis=-1)
        out.append(-jnp.sum(jnp.exp(logp) * logp, axis=-1))
    return jnp.stack(out, axis=-1)


def multi_categorical_kl(src_logits: Sequence[jax.Array], tgt_logits: Sequence[jax.Array]) -> jax.Array:
    """KL(src || tgt) -> (..., na)."""
    out = []
    for s, t in zip(src_logits, tgt_logits):
        sp = jax.nn.log_softmax(s, axis=-1)
        tp = jax.nn.log_softmax(t, axis=-1)
        out.append(jnp.sum(jnp.exp(sp) * (sp - tp), axis=-1))
    return jnp.stack(out, axis=-1)


# ---------------------------------------------------------------- continuous

def _gaussian_params(params):
    mean, log_var = params[..., 0], params[..., 1]
    std = jnp.exp(0.5 * log_var)
    return mean, std


def _beta_params(params):
    alpha = 1.0 + jax.nn.softplus(params[..., 0])
    beta = 1.0 + jax.nn.softplus(params[..., 1])
    return alpha, beta


def continuous_sample(
    key,
    params: jax.Array,  # (..., na, 2)
    dist_type: ContinuousDistType,
    temperature: float = 1.0,
) -> jax.Array:
    if dist_type in ('gaussian', 'squashed_gaussian'):
        mean, std = _gaussian_params(params)
        eps = jax.random.normal(key, mean.shape, dtype=mean.dtype)
        sample = mean + std * temperature * eps
        if dist_type == 'squashed_gaussian':
            sample = jnp.tanh(sample)
        return sample
    elif dist_type == 'beta':
        alpha, beta = _beta_params(params)
        if temperature != 1.0:
            # sharpen/flatten around the mode by scaling the excess concentration
            alpha = 1.0 + (alpha - 1.0) / jnp.maximum(temperature, 1e-10)
            beta = 1.0 + (beta - 1.0) / jnp.maximum(temperature, 1e-10)
        return jax.random.beta(key, alpha, beta)
    raise ValueError(f'unknown continuous dist type {dist_type}')


def continuous_log_prob(
    params: jax.Array,
    targets: jax.Array,
    dist_type: ContinuousDistType,
    eps: float = 1e-5,
) -> jax.Array:
    if dist_type == 'gaussian':
        mean, std = _gaussian_params(params)
        var = jnp.square(std)
        return -0.5 * (jnp.square(targets - mean) / var + 2.0 * jnp.log(std) + LOG_2PI)
    elif dist_type == 'squashed_gaussian':
        mean, std = _gaussian_params(params)
        var = jnp.square(std)
        t = jnp.clip(targets, -1.0 + eps, 1.0 - eps)
        u = jnp.arctanh(t)
        base = -0.5 * (jnp.square(u - mean) / var + 2.0 * jnp.log(std) + LOG_2PI)
        return base - jnp.log(1.0 - jnp.square(t))
    elif dist_type == 'beta':
        alpha, beta = _beta_params(params)
        t = jnp.clip(targets, eps, 1.0 - eps)
        return (
            (alpha - 1.0) * jnp.log(t)
            + (beta - 1.0) * jnp.log1p(-t)
            - (gammaln(alpha) + gammaln(beta) - gammaln(alpha + beta))
        )
    raise ValueError(f'unknown continuous dist type {dist_type}')


def continuous_entropy(params: jax.Array, dist_type: ContinuousDistType) -> jax.Array:
    if dist_type in ('gaussian', 'squashed_gaussian'):
        # squashed gaussian has no closed form; base-gaussian entropy is the
        # standard surrogate used for entropy bonuses
        _, std = _gaussian_params(params)
        return 0.5 * (1.0 + LOG_2PI) + jnp.log(std)
    elif dist_type == 'beta':
        alpha, beta = _beta_params(params)
        lnB = gammaln(alpha) + gammaln(beta) - gammaln(alpha + beta)
        return (
            lnB
            - (alpha - 1.0) * digamma(alpha)
            - (beta - 1.0) * digamma(beta)
            + (alpha + beta - 2.0) * digamma(alpha + beta)
        )
    raise ValueError(f'unknown continuous dist type {dist_type}')


def continuous_kl(src_params: jax.Array, tgt_params: jax.Array, dist_type: ContinuousDistType) -> jax.Array:
    if dist_type in ('gaussian', 'squashed_gaussian'):
        # KL is invariant under the shared tanh bijection, so base KL is exact
        m0, s0 = _gaussian_params(src_params)
        m1, s1 = _gaussian_params(tgt_params)
        v0, v1 = jnp.square(s0), jnp.square(s1)
        return jnp.log(s1 / s0) + (v0 + jnp.square(m0 - m1)) / (2.0 * v1) - 0.5
    elif dist_type == 'beta':
        a0, b0 = _beta_params(src_params)
        a1, b1 = _beta_params(tgt_params)
        lnB0 = gammaln(a0) + gammaln(b0) - gammaln(a0 + b0)
        lnB1 = gammaln(a1) + gammaln(b1) - gammaln(a1 + b1)
        return (
            lnB1
            - lnB0
            + (a0 - a1) * digamma(a0)
            + (b0 - b1) * digamma(b0)
            + (a1 - a0 + b1 - b0) * digamma(a0 + b0)
        )
    raise ValueError(f'unknown continuous dist type {dist_type}')


def native_range(dist_type: ContinuousDistType) -> tuple[float, float] | None:
    if dist_type == 'beta':
        return (0.0, 1.0)
    if dist_type == 'squashed_gaussian':
        return (-1.0, 1.0)
    return None  # unbounded gaussian


def rescale(t: jax.Array, src_range: tuple[float, float], tgt_range: tuple[float, float]) -> jax.Array:
    """Linear map from src_range to tgt_range (reference `rescale`)."""
    (s_lo, s_hi), (t_lo, t_hi) = src_range, tgt_range
    return (t - s_lo) / (s_hi - s_lo) * (t_hi - t_lo) + t_lo


def rescale_from_native(t: jax.Array, dist_type: ContinuousDistType, target_range: tuple[float, float]) -> jax.Array:
    src = native_range(dist_type)
    assert src is not None, f'{dist_type} is unbounded and cannot be rescaled'
    return rescale(t, src, target_range)
