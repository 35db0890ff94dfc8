"""Benchmark: imagined env-steps/s/chip for the KV-cached batched decode
(`generate`) — the north-star metric (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement notes (this environment):
- `block_until_ready` on the tunneled TPU runtime acknowledges before device
  completion, so wall timing must be anchored by a data-dependent scalar
  fetch. The bench chains `ITERS` rollouts inside one `lax.scan` program and
  fetches a single reduced scalar; the separately-measured fetch latency is
  subtracted.
- params are initialized on the local CPU backend and transferred (remote-
  compiling the init program is slower than the transfer by an order of
  magnitude).

vs_baseline is measured against a conservative estimate of the PyTorch
reference's imagined env-steps/s on an A100 for a comparable config
(python-loop decode with growing torch.cat KV caches; reference
`dreamer4.py:6307-6774`). Re-measured when a GPU reference run is available.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_A100_ENV_STEPS_PER_S = 400.0

BATCH, TIME_STEPS, NUM_STEPS = 16, 16, 4
ITERS = 10


def main():
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
        use_flash_attention=True,
        dtype=jnp.bfloat16,
    )

    t0 = time.perf_counter()
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        latents = jnp.zeros((2, 2, 16, 32))
        rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
        variables = jax.jit(lambda: model.init(
            rngs, latents=latents, shortcut_train=False,
            rewards=jnp.zeros((2, 2)),
            discrete_actions=jnp.zeros((2, 1, 1), jnp.int32)))()
        jax.block_until_ready(variables)
    variables = jax.device_put(variables, jax.devices()[0])
    jax.block_until_ready(variables)
    print(f'# init done in {time.perf_counter()-t0:.1f}s', file=sys.stderr)

    def chained(v, key):
        def body(carry, k):
            exp = generate(model, v, k, time_steps=TIME_STEPS,
                           num_steps=NUM_STEPS, batch_size=BATCH)
            return carry + jnp.sum(exp.latents) + jnp.sum(exp.rewards), None

        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jax.random.split(key, ITERS))
        return out

    fn = jax.jit(chained)
    fetch_fn = jax.jit(lambda x: x + 1.0)

    t0 = time.perf_counter()
    _ = float(fn(variables, jax.random.PRNGKey(0)))
    print(f'# compile+first-run in {time.perf_counter()-t0:.1f}s', file=sys.stderr)

    # scalar fetch latency to subtract
    warm = fetch_fn(jnp.zeros(()))
    t0 = time.perf_counter()
    for i in range(5):
        _ = float(fetch_fn(jnp.float32(i)))
    fetch_latency = (time.perf_counter() - t0) / 5

    t0 = time.perf_counter()
    _ = float(fn(variables, jax.random.PRNGKey(1)))
    total = time.perf_counter() - t0

    per_rollout = (total - fetch_latency) / ITERS
    env_steps_per_s = BATCH * TIME_STEPS / per_rollout
    print(f'# fetch latency {fetch_latency*1e3:.1f}ms, per-rollout {per_rollout*1e3:.1f}ms',
          file=sys.stderr)

    print(json.dumps({
        'metric': 'imagined_env_steps_per_s_per_chip',
        'value': round(env_steps_per_s, 2),
        'unit': 'env_steps/s',
        'vs_baseline': round(env_steps_per_s / REFERENCE_A100_ENV_STEPS_PER_S, 2),
    }))


if __name__ == '__main__':
    main()
