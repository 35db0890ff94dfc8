"""Pallas TPU fused attention for SMALL score matrices (decode-era shapes).

The flash-2 kernel in `flash_attention.py` wins above ~128x128 score
matrices but loses to plain XLA below that gate (measured +11-14% step
time when forced on). This kernel is the other design point the trunk
needs: the axial transformer's space attention (27-80 tokens) and time
attention (T=16-32) spend more time in LAYOUT COPIES than in math on the
XLA path — per-head (B, n, h, dh) -> (B, h, n, dh) relayouts around every
projection cost ~3.5 ms of a 38 ms b8xT32 train step, and the f32
softmax/probs round-trip HBM.

Design — one MXU matmul computes ALL heads, zero transposes:
  - q, k, v stay in the projection's natural (B, n, h, dh) layout and are
    viewed as (B, n*h, dh) — a free reshape of contiguous memory.
  - scores = Qf @ Kf^T is (n*h, n*h): the cross-head blocks are garbage,
    but an additive bias with -inf wherever `i % h != j % h` (plus the
    user mask on `i // h` vs `j // h`) removes them in the same softmax
    that applies the attention mask. 8x redundant score FLOPs, but the
    whole score matrix lives in VMEM (216x216 f32 = 186 KB) and never
    touches HBM, and the matmul feeds the MXU with a 216-wide operand
    instead of 8 separate 27-wide ones.
  - grid is (B / rows_per_program,); each program loops over its rows with
    everything resident in VMEM. HBM traffic = q, k, v in + out out.
  - backward recomputes scores from q/k/v (they are tiny) in one kernel
    producing dq, dk, dv — no saved probabilities, no LSE.

Reference semantics: `naive_attend` (scale -> softclamp -> mask -> f32
softmax -> PV in stream dtype), reference `dreamer4.py:1683-1756`. Parity
for values and grads is tested in interpret mode on CPU
(tests/test_small_attention.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def build_interleaved_bias(n: int, heads: int, mask) -> jax.Array:
    """(n*h, n*h) f32 additive bias for the flattened (n*h) layout: 0 where
    row/col share a head AND the (n, n) `mask` allows the pair, NEG_INF
    elsewhere. Built with NUMPY so it embeds as a jit constant — a traced
    jnp construction re-ran as a ~0.7 ms pred fusion every step (measured);
    `mask` must therefore be a numpy array or None (ops/masks.py returns
    numpy for static configs)."""
    import numpy as np

    assert mask is None or isinstance(mask, np.ndarray), (
        'small_attend needs a static (numpy) mask — traced masks would '
        'rebuild the (n*h)^2 bias on device every step')
    nh = n * heads
    i = np.arange(nh)
    same_head = (i[:, None] % heads) == (i[None, :] % heads)
    allowed = same_head
    if mask is not None:
        qi = i // heads
        allowed = allowed & mask[qi[:, None], qi[None, :]]
    return jnp.asarray(np.where(allowed, 0.0, NEG_INF).astype('float32'))


def _softclamp_fwd(s, c):
    if c is None:
        return s, None
    t = jnp.tanh(s / c)
    return t * c, t


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, rows, scale, softclamp):
    bias = bias_ref[...]
    for r in range(rows):
        qf = q_ref[r]
        s = jax.lax.dot_general(
            qf, k_ref[r], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s, _ = _softclamp_fwd(s, softclamp)
        s = s + bias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o_ref[r] = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[r], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, bias_ref, dq_ref, dk_ref, dv_ref,
                *, rows, scale, softclamp):
    bias = bias_ref[...]
    for r in range(rows):
        qf, kf, vf, do = q_ref[r], k_ref[r], v_ref[r], do_ref[r]
        s_raw = jax.lax.dot_general(
            qf, kf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s, t = _softclamp_fwd(s_raw, softclamp)
        s = s + bias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)

        dp = jax.lax.dot_general(
            do, vf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        if softclamp is not None:
            ds = ds * (1.0 - t * t)
        ds = (ds * scale).astype(q_ref.dtype)
        p_c = p.astype(v_ref.dtype)
        dq_ref[r] = jax.lax.dot_general(
            ds, kf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[r] = jax.lax.dot_general(
            ds, qf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        dv_ref[r] = jax.lax.dot_general(
            p_c, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)


# Scoped-VMEM budget for one program's live set. The chip limit is ~16 MB;
# leave headroom for Mosaic's own buffers (the round-4 big250M backward was
# rejected at 18.14 MB with an 8-row unrolled loop at nh=688 — see
# estimate_vmem_bytes, which reproduces that number to ~5%).
VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def estimate_vmem_bytes(nh: int, dh: int, rows: int, itemsize: int = 2) -> int:
    """Scoped-VMEM footprint of one backward program: the (nh, nh) f32 bias,
    one live (nh, nh) f32 score/prob pipeline buffer per unrolled row, and
    ~6 (nh, dh) operand blocks (q/k/v/do + dq/dk/dv) per row. Validated
    against the compiler's rejection of rows=8, nh=688, dh=64 bf16
    (estimate 19.1 MB vs reported 18.14 MB)."""
    bias = 4 * nh * nh
    scores = rows * 4 * nh * nh
    operands = rows * nh * dh * itemsize * 6
    return bias + scores + operands


def _pick_rows(batch: int, nh: int, dh: int, itemsize: int = 2) -> int:
    """Largest per-program row count that divides the batch AND keeps the
    estimated scoped-VMEM footprint under budget (the round-4 kernel used a
    fixed 8 and OOMed scoped vmem at nh=688)."""
    for r in (8, 4, 2):
        if batch % r == 0 and estimate_vmem_bytes(nh, dh, r, itemsize) <= VMEM_BUDGET_BYTES:
            return r
    return 1


def small_attention_viable(batch: int, n: int, heads: int, dim_head: int,
                           itemsize: int = 2, max_nh: int = 512) -> bool:
    """Static gate for the fused small-attention path.

    Bounds BOTH failure modes found in round 4:
    - VMEM: even at rows=1 the footprint must fit the scoped budget;
    - efficiency: the kernel pays h-fold redundant score FLOPs, so past
      `max_nh` flattened rows the redundancy outweighs the layout-copy
      savings (tokenizer-scale space attention, nh=640, measured slower).
    """
    nh = n * heads
    if nh > max_nh:
        return False
    return estimate_vmem_bytes(nh, dim_head, 1, itemsize) <= VMEM_BUDGET_BYTES


def _fwd_host(q, k, v, bias, *, scale, softclamp, interpret):
    # NO host-side padding: Mosaic DMAs non-tile-aligned blocks and pads
    # VMEM internally. An explicit jnp.pad of q/k/v to (nh_pad, 128) here
    # materialized 2.3x-sized HBM copies around every call and made the
    # kernel perf-neutral (measured).
    B, NH, D = q.shape
    rows = _pick_rows(B, NH, D, q.dtype.itemsize)
    spec = pl.BlockSpec((rows, NH, D), lambda g: (g, 0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, rows=rows, scale=scale, softclamp=softclamp),
        grid=(B // rows,),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec(bias.shape, lambda g: (0, 0))],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, NH, D), v.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(q, k, v, bias)


def _bwd_host(q, k, v, do, bias, *, scale, softclamp, interpret):
    B, NH, D = q.shape
    rows = _pick_rows(B, NH, D, q.dtype.itemsize)
    spec = pl.BlockSpec((rows, NH, D), lambda g: (g, 0, 0))
    shp = jax.ShapeDtypeStruct((B, NH, D), q.dtype)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, rows=rows, scale=scale, softclamp=softclamp),
        grid=(B // rows,),
        in_specs=[spec, spec, spec, spec,
                  pl.BlockSpec(bias.shape, lambda g: (0, 0))],
        out_specs=(spec, spec, spec),
        out_shape=(shp, shp, shp),
        compiler_params=pltpu.CompilerParams(dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(q, k, v, do, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _small_attend_flat(q, k, v, bias, params):
    scale, softclamp, interpret = params
    return _fwd_host(q, k, v, bias, scale=scale, softclamp=softclamp,
                     interpret=interpret)


def _vjp_fwd(q, k, v, bias, params):
    out = _small_attend_flat(q, k, v, bias, params)
    return out, (q, k, v, bias)


def _vjp_bwd(params, res, g):
    scale, softclamp, interpret = params
    q, k, v, bias = res
    dq, dk, dv = _bwd_host(q, k, v, g.astype(v.dtype), bias, scale=scale,
                           softclamp=softclamp, interpret=interpret)
    return dq, dk, dv, jnp.zeros_like(bias)


_small_attend_flat.defvjp(_vjp_fwd, _vjp_bwd)


def small_attend(q, k, v, mask=None, softclamp_value: float | None = 50.0,
                 scale: float | None = None, interpret: bool = False):
    """Fused all-heads-in-one-matmul attention for small (n, n) scores.

    q, k, v: (B, n, h, dh) — the projections' NATURAL layout (no head
    transpose). mask: None or (n, n) bool. Returns (B, n, h, dh).
    Semantics match `naive_attend` (scale -> softclamp -> mask -> f32
    softmax -> PV in the value dtype)."""
    B, n, h, dh = q.shape
    if scale is None:
        scale = dh ** -0.5
    nh = n * h
    bias = build_interleaved_bias(n, h, mask)
    flat = lambda x: x.reshape(B, nh, dh)
    out = _small_attend_flat(flat(q), flat(k), flat(v), bias,
                             (scale, softclamp_value, interpret))
    return out.reshape(B, n, h, dh)


def small_attend_flat(q, k, v, bias, softclamp_value: float | None = 50.0,
                      scale: float | None = None, interpret: bool = False):
    """Flat-layout entry: q, k, v already (B, n*h, dh) with a prebuilt
    (n*h, n*h) bias (see `build_interleaved_bias`). Lets the caller run the
    ENTIRE attention block — projections, norms, rotary, gates — in the one
    flat layout so XLA never has a reason to relayout around the kernel."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _small_attend_flat(q, k, v, bias, (scale, softclamp_value, interpret))
