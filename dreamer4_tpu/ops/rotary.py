"""1-D rotary position embeddings for the time axis.

Equivalent of the reference's `Rotary1D` / `apply_rotations`
(`dreamer4.py:1604-1659`). Pure functions; frequencies are recomputed at
trace time (constant-folded by XLA).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rotary_frequencies(dim_head: int, seq_len: int, offset: jax.Array | int = 0, theta: float = 10000.0) -> jax.Array:
    """-> (seq_len, dim_head) angles, duplicated across the two halves."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, dim_head, 2, dtype=jnp.float32) / dim_head))
    t = jnp.arange(seq_len, dtype=jnp.float32) + offset
    freqs = jnp.einsum('i,j->ij', t, inv_freq)
    return jnp.concatenate([freqs, freqs], axis=-1)


def apply_rotations(rotations: jax.Array, t: jax.Array) -> jax.Array:
    """rotations: (n, d) or (heads, n, d); t: (..., h, n, d). When the rotation
    table is longer than the sequence, the tail is used (KV-cache decode,
    reference `dreamer4.py:1636-1639`); per-head rotations with fewer heads
    than t are group-repeated (GQA, reference `dreamer4.py:1646-1651`)."""
    seq_len = t.shape[-2]
    if rotations.shape[-2] > seq_len:
        rotations = rotations[..., -seq_len:, :]

    if rotations.ndim == 3 and rotations.shape[0] != t.shape[-3]:
        heads = t.shape[-3]
        assert heads % rotations.shape[0] == 0
        rotations = jnp.repeat(rotations, heads // rotations.shape[0], axis=0)

    # angles/tables are f32; the elementwise multiply-add runs in the stream
    # dtype so a bf16 attention path stays bf16 (upcasting here doubled the
    # q/k traffic and left f32 slice/negate fusions in the backward)
    cos = jnp.cos(rotations).astype(t.dtype)
    sin = jnp.sin(rotations).astype(t.dtype)

    half = t.shape[-1] // 2
    x1, x2 = t[..., :half], t[..., half:]
    rotated_half = jnp.concatenate([-x2, x1], axis=-1)

    return t * cos + rotated_half * sin


def apply_rotations_flat(rotations: jax.Array, t: jax.Array, heads: int) -> jax.Array:
    """`apply_rotations` for the flattened (..., n*h, d) layout used by the
    small-attention kernel path (row i is position i // heads, head
    i % heads). The tiny rotation table is expanded to (n*h, d) so the
    multiply-add runs directly in the flat layout — no per-head relayout.
    Same table semantics as `apply_rotations`: (n, d) shared across heads or
    (heads, n, d) per-head (PoPE), tail-aligned when the table is longer
    than the sequence."""
    n = t.shape[-2] // heads
    if rotations.shape[-2] > n:
        rotations = rotations[..., -n:, :]

    if rotations.ndim == 3:                             # (h', n, d) per-head
        if rotations.shape[0] != heads:
            assert heads % rotations.shape[0] == 0
            rotations = jnp.repeat(rotations, heads // rotations.shape[0], axis=0)
        rot = rotations.swapaxes(0, 1).reshape(n * heads, rotations.shape[-1])
    else:                                               # (n, d) shared
        rot = jnp.repeat(rotations, heads, axis=0)

    cos = jnp.cos(rot).astype(t.dtype)
    sin = jnp.sin(rot).astype(t.dtype)
    half = t.shape[-1] // 2
    x1, x2 = t[..., :half], t[..., half:]
    rotated_half = jnp.concatenate([-x2, x1], axis=-1)
    return t * cos + rotated_half * sin
