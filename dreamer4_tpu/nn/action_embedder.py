"""ActionEmbedder — embedding and unembedding of mixed discrete/continuous
actions, with multi-token-prediction heads and full distribution machinery.

TPU-native re-design of the reference `ActionEmbedder` (`dreamer4.py:1119-1562`):
- discrete action types share one embedding table, indexed with per-type
  offsets (`dreamer4.py:1519-1526`)
- continuous actions embed as type-embedding x (normalized) scalar
  (`dreamer4.py:1539-1545`)
- all action embeddings sum-pool into a single token (`dreamer4.py:1554-1562`)
- unembedding produces per-type logits / (mean, log-var) with
  `num_unembed_preds` multi-token-prediction heads (`dreamer4.py:1280-1355`)
- sample / log_probs / entropy / kl_div over MultiCategorical +
  beta / gaussian / squashed-gaussian readouts (ops/dists.py)

Discrete logits are always returned split per action type (a tuple of arrays
with static sizes) — the XLA-friendly equivalent of the reference's
`return_split_discrete`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import dists


class Actions(NamedTuple):
    discrete: jax.Array | None
    continuous: jax.Array | None


class ActionEmbedder(nn.Module):
    dim: int
    num_discrete_actions: tuple[int, ...] = ()
    num_continuous_actions: int = 0
    continuous_norm_stats: tuple[tuple[float, float], ...] | None = None
    continuous_dist_type: str = 'beta'
    continuous_target_action_range: tuple[float, float] | None = None
    can_unembed: bool = False
    unembed_dim: int | None = None
    num_unembed_preds: int = 1
    beta_log_prob_eps: float = 1e-5

    @property
    def discrete_sizes(self) -> tuple[int, ...]:
        return tuple(n for n in self.num_discrete_actions if n > 0)

    @property
    def num_discrete_action_types(self) -> int:
        return len(self.discrete_sizes)

    @property
    def total_discrete_actions(self) -> int:
        return sum(self.discrete_sizes)

    @property
    def has_discrete(self) -> bool:
        return self.num_discrete_action_types > 0

    @property
    def has_continuous(self) -> bool:
        return self.num_continuous_actions > 0

    @property
    def has_actions(self) -> bool:
        return self.has_discrete or self.has_continuous

    @property
    def discrete_offsets(self) -> np.ndarray:
        return np.concatenate([[0], np.cumsum(self.discrete_sizes)[:-1]]).astype(np.int64)

    @property
    def target_action_range(self) -> tuple[float, float] | None:
        if self.continuous_dist_type in ('beta', 'squashed_gaussian'):
            return self.continuous_target_action_range or (-1.0, 1.0)
        return None

    def setup(self):
        if self.has_discrete:
            self.discrete_action_embed = nn.Embed(self.total_discrete_actions, self.dim,
                                                  name='discrete_action_embed')
        if self.has_continuous:
            self.continuous_action_embed = nn.Embed(self.num_continuous_actions, self.dim,
                                                    name='continuous_action_embed')

        if self.can_unembed:
            udim = self.unembed_dim if self.unembed_dim is not None else self.dim
            if self.has_discrete:
                self.discrete_action_unembed = self.param(
                    'discrete_action_unembed', nn.initializers.normal(1e-2),
                    (self.total_discrete_actions, self.num_unembed_preds, udim))
            if self.has_continuous:
                self.continuous_action_unembed = self.param(
                    'continuous_action_unembed', nn.initializers.normal(1e-2),
                    (self.num_continuous_actions, self.num_unembed_preds, udim, 2))

    # ---------------------------------------------------------------- embed

    def __call__(self, discrete_actions=None, continuous_actions=None):
        """-> (..., dim) sum-pooled action token."""
        pooled = 0.0

        if discrete_actions is not None and self.has_discrete:
            offsets = jnp.asarray(self.discrete_offsets)
            emb = self.discrete_action_embed(discrete_actions + offsets)
            pooled = pooled + jnp.sum(emb, axis=-2)

        if continuous_actions is not None and self.has_continuous:
            type_emb = self.continuous_action_embed(jnp.arange(self.num_continuous_actions))
            scaled = continuous_actions
            if self.continuous_norm_stats is not None:
                stats = jnp.asarray(self.continuous_norm_stats)  # (na, 2)
                mean, std = stats[:, 0], stats[:, 1]
                scaled = (scaled - mean) / jnp.maximum(std, 1e-6)
            emb = type_emb * scaled[..., None]
            pooled = pooled + jnp.sum(emb, axis=-2)

        return pooled

    embed = __call__

    # -------------------------------------------------------------- unembed

    def unembed(self, embeds, pred_head_index: int | None = None):
        """embeds (..., udim) -> (discrete_logits_tuple, continuous_params).

        With pred_head_index=None and num_unembed_preds > 1, outputs carry a
        leading mtp axis; with an int index that axis is squeezed out.
        """
        assert self.can_unembed

        discrete_logits = None
        if self.has_discrete:
            w = self.discrete_action_unembed  # (total, mtp, udim)
            if pred_head_index is not None:
                w = w[:, pred_head_index]
                flat = jnp.einsum('...d,nd->...n', embeds, w)
            else:
                flat = jnp.einsum('...d,nmd->m...n', embeds, w)
                if self.num_unembed_preds == 1:
                    flat = flat[0]
            sizes = self.discrete_sizes
            splits = np.cumsum(sizes)[:-1].tolist()
            discrete_logits = tuple(jnp.split(flat, splits, axis=-1)) if len(sizes) > 1 else (flat,)

        continuous_params = None
        if self.has_continuous:
            w = self.continuous_action_unembed  # (na, mtp, udim, 2)
            if pred_head_index is not None:
                w = w[:, pred_head_index]
                continuous_params = jnp.einsum('...d,ndp->...np', embeds, w)
            else:
                continuous_params = jnp.einsum('...d,nmdp->m...np', embeds, w)
                if self.num_unembed_preds == 1:
                    continuous_params = continuous_params[0]

        return discrete_logits, continuous_params

    # --------------------------------------------------------------- sample

    def sample(self, key, embeds, pred_head_index: int = 0,
               discrete_temperature: float = 1.0, continuous_temperature: float = 1.0):
        discrete_logits, continuous_params = self.unembed(embeds, pred_head_index=pred_head_index)

        sampled_discrete = sampled_continuous = None
        k1, k2 = jax.random.split(key)
        if discrete_logits is not None:
            sampled_discrete = dists.multi_categorical_sample(k1, discrete_logits, discrete_temperature)
        if continuous_params is not None:
            sampled_continuous = dists.continuous_sample(
                k2, continuous_params, self.continuous_dist_type, continuous_temperature)
        return sampled_discrete, sampled_continuous

    def rescale_for_env(self, actions):
        """Native distribution range -> target env range (reference
        `dreamer4.py:1387-1389`)."""
        rng = self.target_action_range
        assert rng is not None
        return dists.rescale_from_native(actions, self.continuous_dist_type, rng)

    # ------------------------------------------------------------ log probs

    def log_probs(self, embeds, discrete_targets=None, continuous_targets=None,
                  pred_head_index: int | None = None, return_entropies: bool = False,
                  soft_validate_range: bool = False):
        discrete_logits, continuous_params = self.unembed(embeds, pred_head_index=pred_head_index)

        multi_head = pred_head_index is None and self.num_unembed_preds > 1

        discrete_log_probs = discrete_entropies = None
        if discrete_targets is not None and discrete_logits is not None:
            tgt = discrete_targets
            if multi_head and tgt.ndim == discrete_logits[0].ndim - 1:
                tgt = tgt[None]
            discrete_log_probs = dists.multi_categorical_log_prob(discrete_logits, tgt)
            if return_entropies:
                discrete_entropies = dists.multi_categorical_entropy(discrete_logits)

        continuous_log_probs = continuous_entropies = None
        if continuous_targets is not None and continuous_params is not None:
            tgt = continuous_targets
            if multi_head and tgt.ndim == continuous_params.ndim - 2:
                tgt = tgt[None]
            if soft_validate_range and self.continuous_dist_type == 'beta':
                tgt = jnp.clip(tgt, self.beta_log_prob_eps, 1.0 - self.beta_log_prob_eps)
            continuous_log_probs = dists.continuous_log_prob(
                continuous_params, tgt, self.continuous_dist_type, eps=self.beta_log_prob_eps)
            if return_entropies:
                continuous_entropies = dists.continuous_entropy(continuous_params, self.continuous_dist_type)

        log_probs = Actions(discrete_log_probs, continuous_log_probs)
        if not return_entropies:
            return log_probs
        return log_probs, Actions(discrete_entropies, continuous_entropies)

    # ------------------------------------------------------------------ kl

    def kl_div(self, src, tgt, reduce_across_num_actions: bool = True):
        """src/tgt: (discrete_logits_tuple|None, continuous_params|None)."""
        src_logits, src_params = src
        tgt_logits, tgt_params = tgt

        discrete_kl = None
        if src_logits is not None and tgt_logits is not None:
            discrete_kl = dists.multi_categorical_kl(src_logits, tgt_logits)
            if reduce_across_num_actions:
                discrete_kl = jnp.sum(discrete_kl, axis=-1)

        continuous_kl = None
        if src_params is not None and tgt_params is not None:
            continuous_kl = dists.continuous_kl(src_params, tgt_params, self.continuous_dist_type)
            if reduce_across_num_actions:
                continuous_kl = jnp.sum(continuous_kl, axis=-1)

        return discrete_kl, continuous_kl
