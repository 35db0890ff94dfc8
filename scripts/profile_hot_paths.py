"""Capture and summarize TPU profiles of the two hot paths.

Traces `generate` (imagination decode) and the world-model train step with
jax.profiler, then aggregates device-plane op durations with
jax.profiler.ProfileData (no TensorBoard needed) and prints the top ops —
the ground truth for where decode/train time actually goes.

Usage: python scripts/profile_hot_paths.py [--what generate|train|both]
       [--batch 256]
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def summarize_trace(trace_dir: str, top: int = 35):
    from jax.profiler import ProfileData

    paths = sorted(glob.glob(os.path.join(trace_dir, '**', '*.xplane.pb'),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print(f'no xplane.pb under {trace_dir}', flush=True)
        return
    data = ProfileData.from_file(paths[-1])
    totals: dict[str, float] = collections.defaultdict(float)
    counts: dict[str, int] = collections.defaultdict(int)
    plane_names = []
    for plane in data.planes:
        plane_names.append(plane.name)
        if 'TPU' not in plane.name and 'device' not in plane.name.lower():
            continue
        for line in plane.lines:
            for event in line.events:
                name = event.name
                totals[name] += event.duration_ns
                counts[name] += 1
    print(f'planes: {plane_names}', flush=True)
    grand = sum(totals.values())
    print(f'total device event time: {grand/1e6:.1f} ms (overlapping lines counted)',
          flush=True)
    for name, ns in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f'  {ns/1e6:9.2f} ms  x{counts[name]:<6} {name[:110]}', flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--what', choices=('generate', 'train', 'both'), default='both')
    p.add_argument('--batch', type=int, default=256)
    p.add_argument('--out', type=str, default='/tmp/jax_profiles')
    args = p.parse_args()

    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from bench import build_model, init_on_cpu
    from dreamer4_tpu.models.generate import generate
    from dreamer4_tpu.train.optim import muon_adam_atan2
    from dreamer4_tpu.train.trainers import TrainState, make_world_model_train_step

    model = build_model()
    tx = muon_adam_atan2(learning_rate=3e-4, clip_grad_norm=1.0)
    variables, opt_state = init_on_cpu(model, tx)

    if args.what in ('generate', 'both'):
        roll = jax.jit(lambda v, key: jnp.sum(generate(
            model, v, key, time_steps=16, num_steps=4,
            batch_size=args.batch).latents))
        out = roll(variables, jax.random.PRNGKey(0))
        print('warmup:', float(out), flush=True)
        d = os.path.join(args.out, 'generate')
        jax.profiler.start_trace(d)
        t0 = time.perf_counter()
        val = float(roll(variables, jax.random.PRNGKey(1)))
        wall = time.perf_counter() - t0
        jax.profiler.stop_trace()
        print(f'== generate b{args.batch}: wall {wall*1e3:.1f} ms (val {val:.1f})',
              flush=True)
        summarize_trace(d)

    if args.what in ('train', 'both'):
        ts = TrainState(params=variables['params'], state=variables.get('state', {}),
                        opt_state=opt_state, ema_params=None,
                        step=jnp.zeros((), jnp.int32))
        step = make_world_model_train_step(model, tx)
        batch = jax.device_put(dict(
            latents=jax.random.normal(jax.random.PRNGKey(2), (8, 32, 16, 32)) * 0.5,
            rewards=jnp.zeros((8, 32)),
            discrete_actions=jnp.zeros((8, 32, 1), jnp.int32)), jax.devices()[0])
        ts, loss, _ = step(ts, batch, jax.random.PRNGKey(3), shortcut_train=False)
        print('warmup loss:', float(loss), flush=True)
        d = os.path.join(args.out, 'train')
        jax.profiler.start_trace(d)
        t0 = time.perf_counter()
        ts, loss, _ = step(ts, batch, jax.random.PRNGKey(4), shortcut_train=False)
        loss = float(loss)
        wall = time.perf_counter() - t0
        jax.profiler.stop_trace()
        print(f'== train step b8 T32: wall {wall*1e3:.1f} ms (loss {loss:.3f})',
              flush=True)
        summarize_trace(d)


if __name__ == '__main__':
    main()
