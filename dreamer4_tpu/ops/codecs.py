"""Scalar <-> distribution codecs for rewards and values.

TPU-native equivalents of the reference's reward encoders
(`dreamer4.py:947-1117`): SymExpTwoHot and HLGauss. These are pure-math,
embedding-free codecs; the (optional) learned bin embeddings live in the
model layer (`nn/embeds.py`) so these stay stateless and jit-trivial.

Both codecs expose:
  encode(values)              -> (..., num_bins) target distribution
  decode(logits_or_probs)     -> (...,) scalar expectation
  bin_values                  -> (num_bins,) support
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property

import jax
import jax.numpy as jnp

from .utils import symexp


@dataclass(frozen=True)
class SymExpTwoHot:
    """Two-hot encoding over a symexp-spaced support (reference
    `dreamer4.py:947-1039`). Encode is exact: decode(encode(v)) == clamp(v)."""

    reward_range: tuple[float, float] = (-20.0, 20.0)
    num_bins: int = 255

    @cached_property
    def bin_values(self) -> jax.Array:
        lo, hi = self.reward_range
        values = jnp.linspace(lo, hi, self.num_bins)
        return symexp(values)

    def encode(self, values: jax.Array) -> jax.Array:
        bins = self.bin_values
        lo, hi = bins[0], bins[-1]
        values = jnp.clip(values, lo, hi)

        # index of the first bin >= value (same as torch.searchsorted left)
        idx = jnp.searchsorted(bins, values)
        left = jnp.clip(idx - 1, 0, self.num_bins - 1)
        right = jnp.clip(left + 1, 0, self.num_bins - 1)

        left_val = bins[left]
        right_val = bins[right]
        total = jnp.maximum(right_val - left_val, 1e-20)

        left_weight = (right_val - values) / total
        right_weight = 1.0 - left_weight

        onehot_left = jax.nn.one_hot(left, self.num_bins, dtype=values.dtype)
        onehot_right = jax.nn.one_hot(right, self.num_bins, dtype=values.dtype)
        return onehot_left * left_weight[..., None] + onehot_right * right_weight[..., None]

    def decode(self, logits: jax.Array, normalize: bool = True) -> jax.Array:
        probs = jax.nn.softmax(logits, axis=-1) if normalize else logits
        return jnp.einsum('...l,l->...', probs, self.bin_values)

    # aliases matching the reference API surface
    def __call__(self, values):
        return self.encode(values)

    def bins_to_scalar_value(self, logits, normalize: bool = True):
        return self.decode(logits, normalize=normalize)


@dataclass(frozen=True)
class HLGauss:
    """Histogram-Gaussian codec (reference `dreamer4.py:1041-1105`, after
    hl_gauss_pytorch / Imani & White 2018). A scalar is encoded as the
    probability mass a Gaussian centered at it assigns to each bin."""

    reward_range: tuple[float, float] = (-20.0, 20.0)
    num_bins: int = 255
    sigma: float | None = None
    sigma_to_bin_ratio: float = 2.0
    clamp_to_range: bool = True
    eps: float = 1e-10

    @cached_property
    def support(self) -> jax.Array:
        lo, hi = self.reward_range
        return jnp.linspace(lo, hi, self.num_bins + 1)

    @cached_property
    def bin_values(self) -> jax.Array:
        support = self.support
        return (support[:-1] + support[1:]) * 0.5

    @cached_property
    def _sigma(self) -> float:
        if self.sigma is not None:
            return float(self.sigma)
        lo, hi = self.reward_range
        bin_width = (hi - lo) / self.num_bins
        return self.sigma_to_bin_ratio * bin_width

    def encode(self, values: jax.Array) -> jax.Array:
        if self.clamp_to_range:
            lo, hi = self.reward_range
            values = jnp.clip(values, lo, hi)
        support = self.support
        cdf = jax.scipy.stats.norm.cdf(support, loc=values[..., None], scale=self._sigma)
        z = jnp.maximum(cdf[..., -1] - cdf[..., 0], self.eps)
        return (cdf[..., 1:] - cdf[..., :-1]) / z[..., None]

    def decode(self, logits: jax.Array, normalize: bool = True) -> jax.Array:
        probs = jax.nn.softmax(logits, axis=-1) if normalize else logits
        return jnp.einsum('...l,l->...', probs, self.bin_values)

    def __call__(self, values):
        return self.encode(values)

    def bins_to_scalar_value(self, logits, normalize: bool = True):
        return self.decode(logits, normalize=normalize)


REWARD_ENCODERS = {
    'symexp_two_hot': SymExpTwoHot,
    'hl_gauss': HLGauss,
}


def register_reward_encoder(name: str, klass):
    """Plugin hook mirroring reference `dreamer4.py:1112-1113`."""
    REWARD_ENCODERS[name] = klass


def get_reward_encoder(name: str, **kwargs):
    assert name in REWARD_ENCODERS, f'unknown reward encoder type {name}'
    return REWARD_ENCODERS[name](**kwargs)
