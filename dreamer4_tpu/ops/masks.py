"""Attention mask builders.

The reference builds these as flex-attention mask closures
(`dreamer4.py:1760-1865`). Here they are dense boolean arrays with static
shapes. When every input is static (python ints) they are built with
NUMPY, so inside a jit trace they are embedded as true constants — relying
on XLA to fold jnp iota-comparison graphs is not reliable (measured: a
65k-element pred fusion rebuilt the mask every step at ~0.7 ms). Traced
inputs (KV-cache offsets) fall back to jnp. On the Pallas flash path the
same predicates are evaluated blockwise inside the kernel instead of
materialized.

Mask convention: True = may attend.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _is_static(x) -> bool:
    return isinstance(x, (int, np.integer))


def causal_mask(q_len: int, k_len: int, block_size: int = 1, offset: jax.Array | int = 0):
    """Block-causal mask. `offset` shifts query positions (KV-cache decode):
    query i is at absolute position offset + i."""
    xp = np if _is_static(offset) else jnp
    q_pos = (xp.arange(q_len) + offset) // block_size
    k_pos = xp.arange(k_len) // block_size
    return q_pos[:, None] >= k_pos[None, :]


def special_token_mask(
    q_len: int,
    k_len: int,
    seq_len: int,
    num_special: int,
    special_attend_only_itself: bool = False,
):
    """Special tokens (latents / agents) sit on the right of each `seq_len`
    block (reference `special_token_mask`, `dreamer4.py:1769-1783`).

    Default: modality tokens cannot attend to special tokens (special sees
    everything). With `special_attend_only_itself` the inverse holds: special
    tokens only attend among themselves (tokenizer decoder pattern).
    """
    q_pos = np.arange(q_len) % seq_len
    k_pos = np.arange(k_len) % seq_len

    special_start = seq_len - num_special
    q_is_special = q_pos >= special_start
    k_is_special = k_pos >= special_start

    if special_attend_only_itself:
        return ~(q_is_special[:, None] & ~k_is_special[None, :])
    return ~(~q_is_special[:, None] & k_is_special[None, :])


def build_attend_mask(
    q_len: int,
    k_len: int,
    causal: bool = False,
    causal_block_size: int = 1,
    causal_offset: jax.Array | int = 0,
    num_special: int = 0,
    block_size_per_special: int | None = None,
    special_attend_only_itself: bool = False,
):
    """Compose causal and special-token masks (reference `get_attend_fn`,
    `dreamer4.py:1826-1865`). Returns None when unmasked (fast path); a
    numpy array (jit-constant) when all inputs are static."""
    mask = None
    if causal:
        mask = causal_mask(q_len, k_len, block_size=causal_block_size, offset=causal_offset)
    if num_special > 0:
        seq_len = block_size_per_special if block_size_per_special is not None else k_len
        sp = special_token_mask(q_len, k_len, seq_len, num_special, special_attend_only_itself)
        mask = sp if mask is None else (mask & sp)
    return mask
