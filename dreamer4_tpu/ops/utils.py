"""Small pure helpers shared across the framework.

TPU-native reimplementation of the helper layer the reference keeps in
`dreamer4/dreamer4.py:311-552` (exists/default/masked_mean/lens_to_mask/...),
expressed over jax.numpy with static shapes.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp


def exists(v: Any) -> bool:
    return v is not None


def default(*args):
    for arg in args:
        if exists(arg):
            return arg
    return None


def divisible_by(num: int, den: int) -> bool:
    return (num % den) == 0


def is_power_two(num: int) -> bool:
    return num > 0 and (num & (num - 1)) == 0


def l2norm(t: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return t * jax.lax.rsqrt(jnp.sum(jnp.square(t), axis=axis, keepdims=True) + eps)


def l1norm(t: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    denom = jnp.sum(jnp.abs(t), axis=axis, keepdims=True)
    return t / jnp.maximum(denom, eps)


def softclamp(t: jax.Array, value: float = 50.0) -> jax.Array:
    """Gemma-style logit soft clamp (reference `dreamer4.py:527-528`)."""
    return jnp.tanh(t / value) * value


def safe_log(t: jax.Array, eps: float = 1e-20) -> jax.Array:
    return jnp.log(jnp.maximum(t, eps))


def lens_to_mask(lens: jax.Array, total_len: int) -> jax.Array:
    """(b,) lengths -> (b, total_len) bool mask, True inside the length."""
    seq = jnp.arange(total_len)
    return seq[None, :] < lens[..., None]


def masked_mean(t: jax.Array, mask: jax.Array | None = None, axis=None) -> jax.Array:
    """Mean over `axis` (or all) counting only positions where mask is True.

    Mirrors torch_einops_utils.masked_mean used throughout the reference.
    `mask` broadcasts against `t`.
    """
    if mask is None:
        return jnp.mean(t, axis=axis)

    mask = jnp.broadcast_to(mask, t.shape)
    maskf = mask.astype(t.dtype)
    num = jnp.sum(t * maskf, axis=axis)
    den = jnp.sum(maskf, axis=axis)
    return num / jnp.maximum(den, 1.0)


def z_score(t: jax.Array, mask: jax.Array | None = None, eps: float = 1e-5) -> jax.Array:
    """Standardize with optional mask (reference `dreamer4.py:404-410`)."""
    mean = masked_mean(t, mask)
    var = masked_mean(jnp.square(t - mean), mask)
    return (t - mean) / jnp.sqrt(jnp.maximum(var, eps))


def straight_through(src: jax.Array, tgt: jax.Array) -> jax.Array:
    return tgt + src - jax.lax.stop_gradient(src)


def frac_gradient(t: jax.Array, frac) -> jax.Array:
    """Let only a fraction of the gradient flow (reference `dreamer4.py:419-420`)."""
    sg = jax.lax.stop_gradient(t)
    return sg + (t - sg) * frac


def flags_to_sequence(flags: jax.Array, positions: jax.Array, seq_len: int) -> jax.Array:
    """Scatter per-batch boolean flags onto their per-batch position in a
    (b, seq_len) grid (reference `dreamer4.py:412-414`)."""
    seq = jnp.arange(seq_len)
    return (seq[None, :] == positions[:, None]) & flags[:, None]


def pad_at_dim(t: jax.Array, pad: tuple[int, int], axis: int = -1, value=0.0) -> jax.Array:
    """Pad (possibly negatively = slice) at a single axis."""
    axis = axis % t.ndim
    left, right = pad
    # negative pads are slices
    if left < 0 or right < 0:
        slices = [slice(None)] * t.ndim
        start = -left if left < 0 else 0
        stop = t.shape[axis] + right if right < 0 else None
        slices[axis] = slice(start, stop)
        t = t[tuple(slices)]
        left, right = max(left, 0), max(right, 0)
    if left == 0 and right == 0:
        return t
    pads = [(0, 0, 0)] * t.ndim
    pads[axis] = (left, right, 0)
    return jax.lax.pad(t, jnp.asarray(value, dtype=t.dtype), pads)


def pad_right_to(t: jax.Array, length: int, axis: int = 1, value=0.0) -> jax.Array:
    axis = axis % t.ndim
    amount = length - t.shape[axis]
    if amount <= 0:
        return t
    return pad_at_dim(t, (0, amount), axis=axis, value=value)


def orthogonal_loss(x: jax.Array) -> jax.Array:
    """Push the rows of x (over dim -2) towards orthogonality
    (reference `dreamer4.py:389-402`)."""
    n = x.shape[-2]
    if n == 1:
        return jnp.zeros(())
    x = x - jnp.mean(x, axis=-2, keepdims=True)
    x = l2norm(x)
    sim = jnp.einsum('...id,...jd->...ij', x, x)
    eye = jnp.eye(n, dtype=bool)
    sim = jnp.where(eye, 0.0, sim)
    return jnp.mean(jnp.sum(jnp.square(sim), axis=(-1, -2)))


def cosine_sim_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(l2norm(x) - l2norm(y)))


def cosine_distance(x: jax.Array, y: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    num = jnp.sum(x * y, axis=-1)
    den = jnp.linalg.norm(x, axis=-1) * jnp.linalg.norm(y, axis=-1)
    dist = 1.0 - num / jnp.maximum(den, 1e-12)
    return masked_mean(dist, mask)


def smooth_l1_loss(pred: jax.Array, target: jax.Array, beta: float = 1.0) -> jax.Array:
    """Elementwise huber/smooth-l1 matching F.smooth_l1_loss(reduction='none')."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * jnp.square(diff) / beta, diff - 0.5 * beta)


def symlog(x: jax.Array) -> jax.Array:
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def symexp(x: jax.Array) -> jax.Array:
    return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1.0)


def tree_stack(trees: Sequence[Any]):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def ramp_weight(times: jax.Array, slope: float = 0.9, intercept: float = 0.1) -> jax.Array:
    """Ramp loss weighting, eq (8) of the paper (reference `dreamer4.py:897-899`)."""
    return slope * times + intercept


def cast_params_for_inference(variables: Any, dtype=jnp.bfloat16) -> Any:
    """Cast float32 leaves of a variables pytree to `dtype` for serving.

    Autoregressive decode on TPU is parameter-bandwidth-bound at small
    batch: every denoise forward streams the whole parameter set from HBM,
    so f32 weights cost 2x the bytes of bf16 for the same matmuls (flax
    modules cast to the compute dtype AFTER the HBM read). Training keeps
    f32 master weights; this is inference-only (mirrors standard bf16
    serving; reference decode runs whatever dtype the torch module holds).
    Non-float leaves (ints, bools, rng state) pass through unchanged.
    """
    def cast(x):
        if isinstance(x, jax.Array) and x.dtype == jnp.float32:
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, variables)
