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

# The Newton-Schulz iterates are Frobenius-normalized up front, so bf16 is
# plenty of precision for the iteration itself (the official Muon runs NS in
# bf16); it halves the optimizer's HBM traffic and keeps the matmuls on the
# bf16 MXU path.
NS_DTYPE = jnp.bfloat16


def _ns_iterate(X: jax.Array, steps: int) -> jax.Array:
    """Quintic NS body shared by the single and batched paths. X: (..., m, n)
    with m <= n, rows Frobenius-normalized per matrix. The step count is
    static and tiny (5), so unroll in Python: a `fori_loop` here compiled to
    4 `while` ops that cost ~1.8 ms/step of loop/dispatch overhead on a v5e
    and blocked cross-iteration fusion."""
    a, b, c = NS_COEFFS

    for _ in range(steps):
        A = X @ X.swapaxes(-1, -2)
        B = b * A + c * (A @ A)
        X = a * X + B @ X
    return X


def newton_schulz_orthogonalize(g: jax.Array, steps: int = 5, eps: float = 1e-7,
                                ns_dtype=NS_DTYPE) -> jax.Array:
    """Quintic Newton-Schulz iteration producing an approximate orthogonal
    factor of g (Jordan et al; matches the reference dependency's scheme)."""
    assert g.ndim == 2
    X = g.astype(jnp.float32)
    transposed = X.shape[0] > X.shape[1]
    if transposed:
        X = X.T
    X = (X / (jnp.linalg.norm(X) + eps)).astype(ns_dtype)
    X = _ns_iterate(X, steps)
    if transposed:
        X = X.T
    return X.astype(g.dtype)


def _batched_orthogonalize(leaves: list, steps: int, eps: float, ns_dtype=NS_DTYPE) -> list:
    """Orthogonalize a list of 2-D arrays, batching the NS iteration across
    same-shaped weights. A 57M-param trunk has ~50 muon weights in only a
    handful of distinct shapes; per-weight `fori_loop`s produced ~750 tiny
    sequential matmuls (measured ~10 ms/step of pure dispatch/op overhead on
    a v5e), while batching runs 15 batched matmuls per shape group."""
    # normalize orientation (m <= n) and bucket by resulting shape
    groups: dict[tuple, list[int]] = {}
    oriented = []
    for i, g in enumerate(leaves):
        transposed = g.shape[0] > g.shape[1]
        X = g.T if transposed else g
        oriented.append((X, transposed))
        groups.setdefault(X.shape, []).append(i)

    out: list = [None] * len(leaves)
    for shape, idxs in groups.items():
        X = jnp.stack([oriented[i][0] for i in idxs]).astype(jnp.float32)  # (k, m, n)
        norm = jnp.sqrt(jnp.sum(jnp.square(X), axis=(-2, -1), keepdims=True))
        X = (X / (norm + eps)).astype(ns_dtype)
        X = _ns_iterate(X, steps)
        for pos, i in enumerate(idxs):
            o = X[pos]
            if oriented[i][1]:
                o = o.T
            out[i] = o.astype(leaves[i].dtype)
    return out


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

        # batch the NS iteration across same-shaped weights (one stacked
        # 5-step iteration per distinct shape instead of one per weight)
        leaves, treedef = jax.tree_util.tree_flatten(use)
        two_d = [i for i, u in enumerate(leaves) if u.ndim == 2]
        orthed = _batched_orthogonalize([leaves[i] for i in two_d], ns_steps, 1e-7)
        new_leaves = [-learning_rate * u for u in leaves]  # non-2D safety path
        for i, o in zip(two_d, orthed):
            u = leaves[i]
            # scale so update RMS matches adam-style magnitudes
            scale = jnp.sqrt(jnp.maximum(1.0, u.shape[0] / u.shape[1]))
            new_leaves[i] = -learning_rate * scale * o
        new_updates = jax.tree_util.tree_unflatten(treedef, new_leaves)
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


def clip_by_global_norm_bucketed(
    max_norm: float, small_leaf_size: int = 262144,
) -> optax.GradientTransformation:
    """`optax.clip_by_global_norm` with the norm computed from bucketed
    leaves: every leaf up to `small_leaf_size` elements is raveled into one
    concatenated vector reduced by a single fusion; only the big matrices
    keep per-leaf sum-of-squares. A 57M world model has ~200 sub-256k leaves;
    optax's per-leaf reduction compiled to ~130 scalar fusions totalling
    ~3.4 ms/step (latency-bound at <100 GB/s) where the actual bytes need
    <0.3 ms."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        leaves = jax.tree_util.tree_leaves(updates)
        small = [l.reshape(-1).astype(jnp.float32) for l in leaves
                 if l.size <= small_leaf_size]
        big = [l for l in leaves if l.size > small_leaf_size]
        parts = [jnp.sum(jnp.square(jnp.concatenate(small)))] if small else []
        parts += [jnp.sum(jnp.square(l.astype(jnp.float32))) for l in big]
        g_norm = jnp.sqrt(jnp.sum(jnp.stack(parts)))
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(g_norm, 1e-16))
        return jax.tree.map(lambda g: (g * scale).astype(g.dtype), updates), state

    return optax.GradientTransformation(init_fn, update_fn)


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
        chain.append(clip_by_global_norm_bucketed(clip_grad_norm))
    if weight_decay > 0.0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(tx)
    return optax.chain(*chain)
