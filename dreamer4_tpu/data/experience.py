"""Experience — the universal trajectory record.

Pytree port of the reference `Experience` dataclass (`dreamer4.py:136-246`).
All tensors are padded to static max lengths with `lens` carrying validity —
the XLA-native replacement for the reference's variable-length episode
handling (`combine_experiences` padding, `dreamer4.py:248-309`).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..nn.action_embedder import Actions


@struct.dataclass
class Experience:
    latents: jax.Array | None = None            # (b, t, n, d)
    video: jax.Array | None = None              # (b, c, t, h, w)
    proprio: jax.Array | None = None            # (b, t, dp)
    critic_state: jax.Array | None = None       # (b, t, ds)
    agent_embed: jax.Array | None = None        # (b, t, d)
    rewards: jax.Array | None = None            # (b, t)
    terminals: jax.Array | None = None          # (b,) or (b, t)
    actions: Actions | None = None
    log_probs: Actions | None = None
    old_action_unembeds: Any | None = None      # (discrete_logits_tuple, cont_params)
    values: jax.Array | None = None             # (b, t)
    step_size: int | None = struct.field(pytree_node=False, default=None)
    lens: jax.Array | None = None               # (b,)
    is_truncated: jax.Array | None = None       # (b,)
    agent_index: int = struct.field(pytree_node=False, default=0)
    is_from_world_model: bool = struct.field(pytree_node=False, default=True)
    episode_return: jax.Array | None = None     # (b,)

    @property
    def payload(self):
        for t in (self.latents, self.video, self.critic_state):
            if t is not None:
                return t
        return None

    @property
    def batch_size(self):
        return self.payload.shape[0]

    @property
    def time_steps(self):
        return self.payload.shape[1]


def _pad_to(t: jax.Array, length: int, axis: int) -> jax.Array:
    amount = length - t.shape[axis]
    if amount <= 0:
        return t
    pads = [(0, 0)] * t.ndim
    pads[axis] = (0, amount)
    return jnp.pad(t, pads)


def combine_experiences(exps: list[Experience]) -> Experience:
    """Pad time dims to the max then concatenate along batch (reference
    `combine_experiences`, `dreamer4.py:248-309`)."""
    assert len(exps) > 0

    # normalize lens / truncation flags
    normed = []
    for exp in exps:
        b, t = exp.batch_size, exp.time_steps
        if exp.lens is None:
            exp = exp.replace(lens=jnp.full((b,), t))
        if exp.is_truncated is None:
            exp = exp.replace(is_truncated=jnp.ones((b,), bool))
        normed.append(exp)
    exps = normed

    max_t = max(e.time_steps for e in exps)

    def pad_tree(exp):
        def pad_leaf(x):
            if not isinstance(x, (jax.Array, np.ndarray)) or x.ndim < 2:
                return x
            x = _pad_to(x, max_t, axis=1)
            if x.ndim >= 3 and any(e.time_steps != max_t for e in exps):
                pass
            return x
        return jax.tree.map(pad_leaf, exp)

    exps = [pad_tree(e) for e in exps]

    def cat_leaves(*leaves):
        first = leaves[0]
        if isinstance(first, (jax.Array, np.ndarray)):
            if first.ndim == 0:
                return jnp.stack(leaves)
            return jnp.concatenate(leaves, axis=0)
        return first

    return jax.tree.map(cat_leaves, *exps)
