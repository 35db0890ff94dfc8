"""Optimizers: Muon (Newton-Schulz orthogonalized momentum) for the 2-D trunk
weights + Adam-atan2 for everything else.

TPU-native equivalent of the reference's `MuonAdamAtan2` dependency
(`trainers.py:525-535, 942-947`). The Newton-Schulz iteration is 5 fused
matmuls per 2-D weight — pure MXU work, and trivially shardable since each
weight's orthogonalization is independent.

Muon params follow the reference's `muon_parameters()` selection
(`dreamer4.py:1960-1966, 2099-2103`): attention value/out projections and
feedforward weights; q/k and everything else go to Adam-atan2.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

NS_COEFFS = (3.4445, -4.7750, 2.0315)


def newton_schulz_orthogonalize(g: jax.Array, steps: int = 5, eps: float = 1e-7) -> jax.Array:
    """Quintic Newton-Schulz iteration producing an approximate orthogonal
    factor of g (Jordan et al; matches the reference dependency's scheme)."""
    assert g.ndim == 2
    a, b, c = NS_COEFFS
    X = g.astype(jnp.float32)
    transposed = X.shape[0] > X.shape[1]
    if transposed:
        X = X.T
    X = X / (jnp.linalg.norm(X) + eps)

    def body(_, X):
        A = X @ X.T
        B = b * A + c * (A @ A)
        return a * X + B @ X

    X = jax.lax.fori_loop(0, steps, body, X)
    if transposed:
        X = X.T
    return X.astype(g.dtype)


class MuonState(NamedTuple):
    momentum: Any


def muon(learning_rate: float = 0.02, momentum: float = 0.95, nesterov: bool = True,
         ns_steps: int = 5) -> optax.GradientTransformation:
    def init_fn(params):
        return MuonState(momentum=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        new_momentum = jax.tree.map(lambda m, g: momentum * m + g, state.momentum, updates)
        use = (jax.tree.map(lambda m, g: momentum * m + g, new_momentum, updates)
               if nesterov else new_momentum)

        def orth(u):
            if u.ndim != 2:
                return u  # safety; labeler should route non-2D elsewhere
            o = newton_schulz_orthogonalize(u, steps=ns_steps)
            # scale so update RMS matches adam-style magnitudes
            scale = jnp.sqrt(jnp.maximum(1.0, u.shape[0] / u.shape[1]))
            return o * scale

        new_updates = jax.tree.map(lambda u: -learning_rate * orth(u), use)
        return new_updates, MuonState(momentum=new_momentum)

    return optax.GradientTransformation(init_fn, update_fn)


class AdamAtan2State(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def adam_atan2(learning_rate: float = 3e-4, b1: float = 0.9, b2: float = 0.99,
               a: float = 1.27, b: float = 1.0) -> optax.GradientTransformation:
    """Adam-atan2 (Everett et al): update = a * atan2(m_hat, b * sqrt(v_hat)),
    removing the eps hyperparameter and making updates scale-invariant."""

    def init_fn(params):
        return AdamAtan2State(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * jnp.square(g), state.nu, updates)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)

        def u(m, v):
            m_hat = m / c1
            v_hat = v / c2
            return -learning_rate * a * jnp.arctan2(m_hat, b * jnp.sqrt(v_hat))

        return jax.tree.map(u, mu, nu), AdamAtan2State(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def muon_label_fn(path: tuple, param) -> str:
    """'muon' for 2-D trunk weights (attention v/out + ff projections),
    'adam' otherwise — the reference's muon_parameters() split."""
    names = {getattr(p, 'key', getattr(p, 'name', str(p))) for p in path}
    is_trunk_2d = getattr(param, 'ndim', 0) == 2 and bool(
        names & {'to_v', 'to_out', 'proj_in', 'proj_out'})
    return 'muon' if is_trunk_2d else 'adam'


def muon_adam_atan2(
    learning_rate: float = 3e-4,
    muon_learning_rate: float | None = None,
    weight_decay: float = 0.0,
    clip_grad_norm: float | None = None,
    b1: float = 0.9,
    b2: float = 0.99,
    momentum: float = 0.95,
) -> optax.GradientTransformation:
    """The hybrid optimizer used by every reference trainer
    (`trainers.py:525-535`)."""
    muon_lr = muon_learning_rate if muon_learning_rate is not None else learning_rate * 10.0

    def label_tree(params):
        return jax.tree_util.tree_map_with_path(lambda p, x: muon_label_fn(p, x), params)

    tx = optax.multi_transform(
        {'muon': muon(muon_lr, momentum=momentum),
         'adam': adam_atan2(learning_rate, b1=b1, b2=b2)},
        label_tree,
    )

    chain = []
    if clip_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(clip_grad_norm))
    if weight_decay > 0.0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(tx)
    return optax.chain(*chain)
