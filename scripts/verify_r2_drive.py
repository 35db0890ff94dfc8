"""Drive the round-2 WIP surfaces on the real TPU: fused flash fwd+bwd at a
training shape, and the dynamic-chunking H-Net inside the public
AxialSpaceTimeTransformer. Scalar-fetch anchored; prints a tiny summary."""
import time

import jax
import jax.numpy as jnp

t0 = time.time()
print('devices:', jax.devices(), flush=True)

from dreamer4_tpu.ops.flash_attention import flash_attend, make_config
from dreamer4_tpu.models.transformer import AxialSpaceTimeTransformer

# ---- flash attention fwd+bwd on TPU (bf16, special-token mask family)
B, H, N, D = 2, 4, 1024, 64
keys = jax.random.split(jax.random.PRNGKey(0), 4)
q, k, v, g = (jax.random.normal(ki, (B, H, N, D), jnp.bfloat16) for ki in keys)
cfg = make_config(causal=True, num_special=2, special_seq_len=16,
                  softclamp_value=50.0)
off = jnp.asarray(0, jnp.int32)
kvl = jnp.asarray(N, jnp.int32)


def loss(q, k, v):
    o = flash_attend(q, k, v, off, kvl, cfg)
    return jnp.sum((o.astype(jnp.float32)) * g.astype(jnp.float32))


gfn = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
t1 = time.time()
dq, dk, dv = gfn(q, k, v)
s = float(jnp.sum(dq.astype(jnp.float32)) + jnp.sum(dk.astype(jnp.float32))
          + jnp.sum(dv.astype(jnp.float32)))
print(f'flash fwd+bwd bf16 N={N}: compile+run {time.time()-t1:.1f}s '
      f'grad-sum {s:.3e} finite={s == s}', flush=True)

# ---- dynamic H-Net inside the public transformer, parallel + cached decode
model = AxialSpaceTimeTransformer(
    dim=64, depth=2, attn_heads=4, attn_dim_head=16, time_block_every=2,
    num_special_tokens=1, h_net_layer=0, h_net_depth=1, h_net_heads=2,
    h_net_dim_head=16, h_net_compression_ratio=2, h_net_dynamic=True,
)
tokens = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 4, 64))
cpu = jax.devices('cpu')[0]
with jax.default_device(cpu):
    params = model.init(jax.random.PRNGKey(2), tokens)
params = jax.device_put(params)

t1 = time.time()
par = jax.jit(lambda p, t: model.apply(p, t, return_intermediates=True)[0])(
    params, tokens)


def decode_step(p, tok, cache):
    return model.apply(p, tok, cache=cache)


cache = model.init_cache(2, 4, max_time=8)
step = jax.jit(decode_step)
outs = []
for i in range(8):
    o, cache = step(params, tokens[:, i:i + 1], cache)
    outs.append(o)
seq = jnp.concatenate(outs, axis=1)
err = float(jnp.max(jnp.abs(par - seq)))
print(f'dynamic-hnet transformer: compile+run {time.time()-t1:.1f}s '
      f'parallel-vs-cached max_err {err:.3e}', flush=True)
assert err < 3e-2, err  # bf16-free f32 path on TPU; loose for TPU matmul
print(f'total {time.time()-t0:.1f}s OK', flush=True)
