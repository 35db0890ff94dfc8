"""Fast, repeatable wall-clock timing of the world-model train step on the
current backend (TPU by default) — the A/B harness for training-throughput
work. Prints ms/step over a chained `lax.scan` so host/tunnel latency is
amortized out (same methodology as bench.py's timed_scan).

Usage: python scripts/time_train_step.py [--batch 8] [--time 32]
       [--iters 20] [--shortcut] [--cpu]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--time', type=int, default=32)
    p.add_argument('--iters', type=int, default=20)
    p.add_argument('--shortcut', action='store_true')
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--flash-min', type=int, default=None,
                   help='override flash_min_scores (q_len*k_len gate)')
    p.add_argument('--no-attn-pool', action='store_true',
                   help='ablate the per-layer attention pools')
    p.add_argument('--fused-small', action='store_true',
                   help='opt in to the small-attention kernel')
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import jax.numpy as jnp

    from bench import build_model, init_on_cpu
    from dreamer4_tpu.train.optim import muon_adam_atan2
    from dreamer4_tpu.train.trainers import TrainState, make_world_model_train_step

    overrides = {} if args.flash_min is None else dict(flash_min_scores=args.flash_min)
    if args.no_attn_pool:
        overrides['use_attn_pool'] = False
    if args.fused_small:
        overrides['use_fused_small'] = True
    model = build_model(**overrides)
    tx = muon_adam_atan2(learning_rate=3e-4, clip_grad_norm=1.0)
    variables, opt_state = init_on_cpu(model, tx)
    n_params = sum(int(jnp.size(x)) for x in jax.tree_util.tree_leaves(variables['params']))

    ts = TrainState(params=variables['params'], state=variables.get('state', {}),
                    opt_state=opt_state, ema_params=None,
                    step=jnp.zeros((), jnp.int32))
    step = make_world_model_train_step(model, tx)
    b, t = args.batch, args.time
    batch = jax.device_put(dict(
        latents=jax.random.normal(jax.random.PRNGKey(2), (b, t, 16, 32)) * 0.5,
        rewards=jnp.zeros((b, t)),
        discrete_actions=jnp.zeros((b, t, 1), jnp.int32)), jax.devices()[0])

    def chained(ts0, batch_in, key):
        def body(carry, k):
            new_ts, loss, _ = step(carry, batch_in, k, shortcut_train=args.shortcut)
            return new_ts, loss

        keys = jax.random.split(key, args.iters)
        ts1, losses = jax.lax.scan(body, ts0, keys)
        return ts1, losses[-1]

    chained = jax.jit(chained)
    t0 = time.perf_counter()
    out_ts, loss = chained(ts, batch, jax.random.PRNGKey(0))
    loss.block_until_ready()
    print(f'# warmup (compile + {args.iters} steps): {time.perf_counter()-t0:.1f} s '
          f'(loss {float(loss):.3f})', flush=True)

    best = float('inf')
    for rep in range(3):
        t0 = time.perf_counter()
        out_ts, loss = chained(ts, batch, jax.random.PRNGKey(rep + 1))
        loss.block_until_ready()
        wall = time.perf_counter() - t0
        per = wall / args.iters
        best = min(best, per)
        print(f'# rep{rep}: {per*1e3:.2f} ms/step', flush=True)

    flops = 6.0 * n_params * model.tokens_per_frame * b * t
    peak = 197e12 if jax.default_backend() != 'cpu' else 1e12
    print(f'ms_per_step={best*1e3:.2f} mfu_pct={100*flops/best/peak:.2f} '
          f'params={n_params} shortcut={args.shortcut}', flush=True)


if __name__ == '__main__':
    main()
