"""FIRE — Frobenius-Isometry Reinitialization + shrink-and-perturb.

Pure-pytree equivalent of the reference `apply_fire` (`dreamer4.py:578-625`,
Han et al. arXiv 2602.08040; Ash et al. arXiv 1910.08475): Newton-Schulz-like
orthogonalization of every 2-D weight, preserving its Frobenius norm —
a continual-learning plasticity reset applied between training phases
(`DynamicsWorldModel.apply_fire_`, `dreamer4.py:6776-6790`).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp


def _fire_matrix(t: jax.Array, num_iters: int, coefs: tuple[float, float]) -> jax.Array:
    a, b = coefs
    norm = jnp.linalg.norm(t)

    def apply(t):
        t = t / norm
        transposed = t.shape[0] < t.shape[1]
        x = t.T if transposed else t

        def body(_, x):
            A = x.T @ x
            return a * x + b * (x @ A)

        x = jax.lax.fori_loop(0, num_iters, body, x)
        x = x.T if transposed else x
        return x * (norm / jnp.maximum(jnp.linalg.norm(x), 1e-12))

    return jnp.where(norm == 0.0, t, apply(t))


def apply_fire(
    params: Any,
    key: jax.Array | None = None,
    num_iters: int = 20,
    coefs: tuple[float, float] = (1.5, -0.5),
    shrink_perturb: bool = False,
    shrink_perturb_factors: tuple[float, float] = (0.5, 0.01),
) -> Any:
    """Re-initialize all 2-D weights in a param pytree. Returns new params."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = (jax.random.split(key, len(leaves)) if key is not None
            else [None] * len(leaves))

    new_leaves = []
    for leaf, k in zip(leaves, keys):
        if not hasattr(leaf, 'ndim') or leaf.ndim != 2:
            new_leaves.append(leaf)
            continue
        t = _fire_matrix(leaf, num_iters, coefs)
        if shrink_perturb:
            scale, noise_scale = shrink_perturb_factors
            assert k is not None, 'shrink_perturb requires a PRNG key'
            noise = jax.random.normal(k, t.shape, t.dtype)
            t = t * (1.0 - scale) + noise * noise_scale
        new_leaves.append(t)

    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def evolve_latent_genes(
    key: jax.Array,
    genes: jax.Array,      # (pop, dim)
    fitness: jax.Array,    # (pop,)
    select_frac: float = 0.5,
    tournament_frac: float = 0.5,
) -> jax.Array:
    """Evolutionary policy optimization over latent genes: tournament
    selection + crossover by random interpolation (reference `evolve_`,
    `dreamer4.py:5423-5466`; arXiv 2503.19037)."""
    pop_size, dim_gene = genes.shape
    num_selected = max(1, math.ceil(pop_size * select_frac))
    num_children = pop_size - num_selected

    fitness_sel, sel_idx = jax.lax.top_k(fitness, num_selected)
    selected = genes[sel_idx]

    tournament_size = min(max(2, math.ceil(num_selected * tournament_frac)), num_selected)

    k1, k2 = jax.random.split(key)
    # one tournament per child: random subset of the selected pool
    scores = jax.random.normal(k1, (num_children, num_selected))
    tournaments = jnp.argsort(scores, axis=-1)[:, :tournament_size]
    parent_ids = jax.lax.top_k(fitness_sel[tournaments], 2)[1]  # (children, 2)
    parents = selected[jnp.take_along_axis(tournaments, parent_ids, axis=-1)]

    mix = jax.nn.sigmoid(jax.random.normal(k2, (num_children, dim_gene)))
    children = parents[:, 0] + (parents[:, 1] - parents[:, 0]) * mix

    return jnp.concatenate([selected, children], axis=0)


def evolve_params(key: jax.Array, params, fitness: jax.Array,
                  gene_key: str = 'latent_genes', **kwargs):
    """Apply `evolve_latent_genes` to the world model's latent-gene parameter
    (reference `DynamicsWorldModel.evolve_`, `dreamer4.py:5423-5466`).
    Returns a new param tree."""
    new_genes = evolve_latent_genes(key, params[gene_key], fitness, **kwargs)
    out = dict(params)
    out[gene_key] = new_genes
    return out
