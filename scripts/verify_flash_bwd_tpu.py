"""Drive the fused flash-attention backward on the real TPU.

Checks (scalar-only fetches, axon transfer rules):
  1. fwd+bwd of the Pallas path vs the dense reference at seq 1024 — max
     gradient deviation as a single scalar.
  2. wall time of grad(flash) vs grad(dense reference) at seq 1024/2048,
     anchored by data-dependent scalar fetch (see bench.py / verify skill).
"""
import time

import jax
import jax.numpy as jnp

from dreamer4_tpu.ops.attention import naive_attend
from dreamer4_tpu.ops.flash_attention import flash_attend, make_config
from dreamer4_tpu.ops.masks import build_attend_mask

print('devices:', jax.devices(), flush=True)

B, H, D = 2, 8, 64
SOFTCLAMP = 50.0


def make_fns(N):
    cfg = make_config(causal=True, softclamp_value=SOFTCLAMP)
    mask = build_attend_mask(N, N, causal=True)

    def loss_flash(q, k, v, g):
        return (flash_attend(q, k, v, jnp.int32(0), jnp.int32(N), cfg) * g).sum()

    def loss_ref(q, k, v, g):
        return (naive_attend(q, k, v, mask=mask, softclamp_value=SOFTCLAMP) * g).sum()

    grad_flash = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))
    grad_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))
    return grad_flash, grad_ref


def timed(fn, args, iters=20):
    # chain iterations via scan: each step's dq feeds the next step's q, so
    # nothing can be CSE'd or dead-code-eliminated and the final scalar
    # fetch is data-dependent on every iteration. The runtime appears to
    # cache identical remote executions, so every call perturbs the input
    # with a fresh key.
    def step(c, _):
        q, k, v, g = c
        out = fn(q, k, v, g)
        return (q + 1e-12 * out[0], k, v, g), out[0][0, 0, 0, 0]

    def chained(c, key):
        q, k, v, g = c
        # perturbation must survive bf16 rounding or the runtime's
        # identical-execution cache returns instantly
        q = q + jax.random.normal(key, q.shape, q.dtype) * 0.01
        carry, taps = jax.lax.scan(step, (q, k, v, g), None, length=iters)
        return jnp.sum(taps) + jnp.sum(carry[0][0, 0, 0, :1].astype(jnp.float32))

    cfn = jax.jit(chained)
    _ = float(cfn(args, jax.random.PRNGKey(0)))   # compile + warm anchors
    _ = float(cfn(args, jax.random.PRNGKey(1)))   # warm steady-state
    t0 = time.time()
    anchor = float(cfn(args, jax.random.PRNGKey(2)))
    t1 = time.time()
    fetch_fn = jax.jit(lambda x: x + 1.0)
    _ = float(fetch_fn(jnp.zeros(())))
    t2 = time.time()
    _ = float(fetch_fn(jnp.float32(3.0)))
    fetch = time.time() - t2
    return (t1 - t0 - fetch) / iters, anchor


key = jax.random.PRNGKey(0)

ITERS_BY_N = {1024: 200, 2048: 60, 4096: 20, 8192: 8}

for dtype_name, dtype in (('bf16', jnp.bfloat16), ('f32', jnp.float32)):
    for N in (1024, 2048, 4096):
        kq, kk, kv_, kg = jax.random.split(jax.random.fold_in(key, N), 4)
        q = jax.random.normal(kq, (B, H, N, D)).astype(dtype)
        k = jax.random.normal(kk, (B, H, N, D)).astype(dtype)
        v = jax.random.normal(kv_, (B, H, N, D)).astype(dtype)
        g = jax.random.normal(kg, (B, H, N, D)).astype(dtype)

        grad_flash, grad_ref = make_fns(N)

        if N == 1024:
            t0 = time.time()
            gf = grad_flash(q, k, v, g)
            gr = grad_ref(q, k, v, g)
            to32 = lambda t: jnp.asarray(t, jnp.float32)
            err = jnp.max(jnp.stack([jnp.max(jnp.abs(to32(a) - to32(b)))
                                     for a, b in zip(gf, gr)]))
            rel = err / jnp.max(jnp.stack([jnp.max(jnp.abs(to32(b))) for b in gr]))
            print(f'{dtype_name} N={N}: compile+run {time.time()-t0:.1f}s  '
                  f'max_abs_grad_err={float(err):.3e}  rel={float(rel):.3e}',
                  flush=True)

        tf, _ = timed(grad_flash, (q, k, v, g), iters=ITERS_BY_N[N])
        try:
            tr, _ = timed(grad_ref, (q, k, v, g), iters=ITERS_BY_N[N])
            print(f'{dtype_name} N={N}: grad(flash) {tf*1e3:.2f} ms   '
                  f'grad(dense-ref) {tr*1e3:.2f} ms   speedup {tr/tf:.2f}x',
                  flush=True)
        except Exception as e:
            print(f'{dtype_name} N={N}: grad(flash) {tf*1e3:.2f} ms   '
                  f'dense-ref failed: {type(e).__name__}', flush=True)
