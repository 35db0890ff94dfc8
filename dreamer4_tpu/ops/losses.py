"""Loss-side utilities: EMA loss normalization and signature regularization.

- LossNormalizer: functional port of the reference's RMS-EMA loss normalizer
  (`dreamer4.py:629-669`, paper section 3). State is an explicit array threaded
  through the train step (no module buffers).
- sigreg: LeJEPA signature regularization (`dreamer4.py:726-767`): sliced
  empirical characteristic function matched to the N(0,1) CF with a Gaussian
  window, trapezoid-integrated.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .utils import l2norm, masked_mean


def init_loss_normalizer(num_losses: int = 1) -> jax.Array:
    """EMA of squared losses; ones at init (reference `dreamer4.py:640`)."""
    return jnp.ones((num_losses,))


def apply_loss_normalizer(
    state: jax.Array,
    losses: jax.Array,
    update_ema: bool = True,
    beta: float = 0.95,
    eps: float = 1e-6,
):
    """-> (normalized_losses, new_state). Normalizes by the EMA RMS *before*
    folding the current value in, matching the reference ordering."""
    losses = jnp.reshape(losses, state.shape)
    rms = jnp.sqrt(state)
    if update_ema:
        new_state = state + (1.0 - beta) * (jax.lax.stop_gradient(jnp.square(losses)) - state)
    else:
        new_state = state
    normed = losses / jnp.maximum(rms, eps)
    return normed, new_state


def sigreg(
    key: jax.Array,
    x: jax.Array,              # (k, ..., d) — leading dim indexes subspaces
    num_slices: int = 1024,
    domain: tuple[float, float] = (-5.0, 5.0),
    num_knots: int = 17,
    mask: jax.Array | None = None,  # (k, ...)
) -> jax.Array:
    dim = x.shape[-1]

    projs = jax.random.normal(key, (num_slices, dim), dtype=x.dtype)
    projs = l2norm(projs)

    t = jnp.linspace(domain[0], domain[1], num_knots, dtype=x.dtype)
    exp_f = jnp.exp(-0.5 * jnp.square(t))  # CF of N(0,1) = Gaussian window

    k = x.shape[0]
    x_flat = x.reshape(k, -1, dim)
    x_t = jnp.einsum('knd,md->knm', x_flat, projs)
    x_t = x_t[..., None] * t  # (k, n, m, t)

    ecf = jnp.exp(1j * x_t.astype(jnp.float32))

    if mask is not None:
        mask_flat = mask.reshape(k, -1)[:, :, None, None]
        ecf = masked_mean(ecf, mask_flat, axis=1)
    else:
        ecf = jnp.mean(ecf, axis=1)  # (k, m, t)

    err = jnp.square(jnp.abs(ecf - exp_f)) * exp_f
    return jnp.mean(jnp.trapezoid(err, t, axis=-1))


def decorrelation_loss(
    key: jax.Array,
    x: jax.Array,              # (..., d) token features (e.g. normed attn inputs)
    sample_frac: float = 0.25,
) -> jax.Array:
    """Feature-decorrelation auxiliary loss (capability match for the
    reference's vit_pytorch `DecorrelationLoss`, used at `dreamer4.py:3998-4003,
    4534-4539`): sample a fraction of token rows, standardize features, and
    penalize squared off-diagonal correlations."""
    d = x.shape[-1]
    rows = x.reshape(-1, d)
    n = rows.shape[0]
    num_sampled = max(2, int(n * sample_frac))

    idx = jax.random.permutation(key, n)[:num_sampled]
    sampled = rows[idx]

    sampled = sampled - jnp.mean(sampled, axis=0, keepdims=True)
    std = jnp.sqrt(jnp.mean(jnp.square(sampled), axis=0, keepdims=True) + 1e-6)
    sampled = sampled / std

    corr = (sampled.T @ sampled) / num_sampled
    off_diag = corr - jnp.diag(jnp.diag(corr))
    return jnp.mean(jnp.square(off_diag))
