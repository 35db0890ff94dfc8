"""Where does the imagination-rollout time go at large batch?

Times `generate` variants on the bench flagship config (bench.py) at
batch 256, isolating: denoise-forward count, time-layer count (KV-cache
traffic), rollout length, terminal/value head work. Run on the TPU when
it is free; each variant costs one ~60s compile (persistent cache
applies) + a few seconds of measurement.

Usage: python scripts/bisect_generate_cost.py [--batch 256]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=256)
    p.add_argument('--iters', type=int, default=5)
    args = p.parse_args()

    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from bench import build_model, init_on_cpu, timed_scan
    from dreamer4_tpu.models.generate import generate
    from dreamer4_tpu.models.world_model import DynamicsWorldModel

    base = build_model()
    variables, _ = init_on_cpu(base)

    def model_with(**over):
        # clone keeps every other field in lockstep with the bench config
        return base.clone(**over)

    variants = [
        ('baseline T16 K4', base, dict(time_steps=16, num_steps=4)),
        ('num_steps=1', base, dict(time_steps=16, num_steps=1)),
        ('T=8', base, dict(time_steps=8, num_steps=4)),
        ('no agent heads', base, dict(time_steps=16, num_steps=4,
                                      return_agent_actions=False)),
        ('time_block_every=8 (1 time layer)',
         model_with(time_block_every=8), dict(time_steps=16, num_steps=4)),
    ]

    for name, model, gkw in variants:
        def rollout(v, key, _m=model, _g=dict(gkw)):
            exp = generate(_m, v, key, batch_size=args.batch, **_g)
            return jnp.sum(exp.latents) + jnp.sum(exp.rewards)

        try:
            per, _ = timed_scan(rollout, (variables,), name, iters=args.iters)
            print(f'{name}: {per*1e3:.1f} ms/rollout', flush=True)
        except Exception as e:  # noqa: BLE001
            print(f'{name}: FAILED {type(e).__name__}: {e}', flush=True)


if __name__ == '__main__':
    main()
