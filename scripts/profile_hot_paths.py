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


def _op_category(name: str) -> str:
    """Rough XLA-op category. Profile event names carry the op's full HLO
    text (operands included), so match on the *instruction name* only — the
    token before '=' — otherwise every fusion consuming a %copy-done operand
    is miscounted as a copy (this inflated an earlier 'the step is 55%
    copies' readout; the honest split was ~43% fusions / ~25% copies)."""
    head = name.split('=', 1)[0].lower()
    if not head.strip():
        head = name.lower()
    if 'convolution' in head or 'dot' in head or 'matmul' in head:
        return 'matmul/conv'
    if 'all-reduce' in head or 'all-gather' in head or 'collective' in head:
        return 'collective'
    if 'copy' in head or 'slice' in head or 'transpose' in head:
        return 'copy/slice/transpose'
    if 'fusion' in head:
        return 'fusion (elementwise/reduce)'
    if 'custom-call' in head or 'tpu_custom_call' in head:
        return 'custom-call (pallas)'
    if 'infeed' in head or 'outfeed' in head or 'host' in head:
        return 'host'
    return 'other'


def summarize_trace(trace_dir: str, top: int = 35):
    from jax.profiler import ProfileData

    paths = sorted(glob.glob(os.path.join(trace_dir, '**', '*.xplane.pb'),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print(f'no xplane.pb under {trace_dir}', flush=True)
        return
    data = ProfileData.from_file(paths[-1])
    # device-plane XLA ops only, bucketed per line so queue/step lines don't
    # double-count compute; category roll-up for the headline breakdown
    totals: dict[str, float] = collections.defaultdict(float)
    counts: dict[str, int] = collections.defaultdict(int)
    # the sync 'XLA Ops' line is the serial device timeline; 'Async XLA Ops'
    # (DMA prefetch etc.) overlaps it and must be reported separately
    cats: dict[tuple, float] = collections.defaultdict(float)
    line_totals: dict[str, float] = collections.defaultdict(float)
    for plane in data.planes:
        is_device = plane.name.startswith('/device:TPU') or plane.name.startswith('/device:CUSTOM')
        for line in plane.lines:
            key = f'{plane.name} :: {line.name}'
            for event in line.events:
                line_totals[key] += event.duration_ns
                if is_device and 'XLA Op' in line.name:
                    which = 'async' if 'Async' in line.name else 'sync'
                    if which == 'sync':
                        totals[event.name] += event.duration_ns
                        counts[event.name] += 1
                    cats[(which, _op_category(event.name))] += event.duration_ns
    print('per-line totals:', flush=True)
    for key, ns in sorted(line_totals.items(), key=lambda kv: -kv[1])[:12]:
        print(f'  {ns/1e6:10.2f} ms  {key}', flush=True)
    grand = sum(totals.values())
    if grand:
        for which in ('sync', 'async'):
            sub = {c: ns for (w, c), ns in cats.items() if w == which}
            tot = sum(sub.values())
            if not tot:
                continue
            print(f'{which} XLA-op time: {tot/1e6:.1f} ms — by category:', flush=True)
            for cat, ns in sorted(sub.items(), key=lambda kv: -kv[1]):
                print(f'  {ns/1e6:9.2f} ms ({100*ns/tot:5.1f}%)  {cat}', flush=True)
        print('top sync ops:', flush=True)
        for name, ns in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
            print(f'  {ns/1e6:9.2f} ms  x{counts[name]:<6} {name[:110]}', flush=True)
    else:
        # fall back to everything on device planes
        print('no XLA Ops line found; dumping device planes', flush=True)
        for plane in data.planes:
            for line in plane.lines:
                print(f'  plane={plane.name!r} line={line.name!r} '
                      f'events={sum(1 for _ in line.events)}', flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--what', choices=('generate', 'train', 'both', 'shortcut',
                                      'decode16'), default='both')
    p.add_argument('--batch', type=int, default=256)
    p.add_argument('--train-batch', type=int, default=8)
    p.add_argument('--train-time', type=int, default=32)
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

    if args.what == 'decode16':
        # the HEADLINE path: b16 baked bf16 serving weights (bench.py decode)
        from dreamer4_tpu.ops.utils import cast_params_for_inference
        serve = cast_params_for_inference(variables, jnp.bfloat16)
        roll = jax.jit(lambda key: jnp.sum(generate(
            model, serve, key, time_steps=16, num_steps=4,
            batch_size=16).latents))
        print('warmup:', float(roll(jax.random.PRNGKey(0))), flush=True)
        d = os.path.join(args.out, 'decode16')
        jax.profiler.start_trace(d)
        t0 = time.perf_counter()
        val = float(roll(jax.random.PRNGKey(1)))
        wall = time.perf_counter() - t0
        jax.profiler.stop_trace()
        print(f'== decode16 baked: wall {wall*1e3:.1f} ms (val {val:.1f})', flush=True)
        summarize_trace(d, top=45)

    if args.what == 'shortcut':
        ts = TrainState(params=variables['params'], state=variables.get('state', {}),
                        opt_state=opt_state, ema_params=None,
                        step=jnp.zeros((), jnp.int32))
        step = make_world_model_train_step(model, tx)
        tb, tt = args.train_batch, args.train_time
        batch = jax.device_put(dict(
            latents=jax.random.normal(jax.random.PRNGKey(2), (tb, tt, 16, 32)) * 0.5,
            rewards=jnp.zeros((tb, tt)),
            discrete_actions=jnp.zeros((tb, tt, 1), jnp.int32)), jax.devices()[0])
        ts, loss, _ = step(ts, batch, jax.random.PRNGKey(3), shortcut_train=True)
        print('warmup loss:', float(loss), flush=True)
        d = os.path.join(args.out, 'shortcut')
        jax.profiler.start_trace(d)
        t0 = time.perf_counter()
        ts, loss, _ = step(ts, batch, jax.random.PRNGKey(4), shortcut_train=True)
        loss = float(loss)
        wall = time.perf_counter() - t0
        jax.profiler.stop_trace()
        print(f'== SHORTCUT train step b{tb} T{tt}: wall {wall*1e3:.1f} ms (loss {loss:.3f})',
              flush=True)
        summarize_trace(d, top=45)

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
        tb, tt = args.train_batch, args.train_time
        batch = jax.device_put(dict(
            latents=jax.random.normal(jax.random.PRNGKey(2), (tb, tt, 16, 32)) * 0.5,
            rewards=jnp.zeros((tb, tt)),
            discrete_actions=jnp.zeros((tb, tt, 1), jnp.int32)), jax.devices()[0])
        ts, loss, _ = step(ts, batch, jax.random.PRNGKey(3), shortcut_train=False)
        print('warmup loss:', float(loss), flush=True)
        d = os.path.join(args.out, 'train')
        jax.profiler.start_trace(d)
        t0 = time.perf_counter()
        ts, loss, _ = step(ts, batch, jax.random.PRNGKey(4), shortcut_train=False)
        loss = float(loss)
        wall = time.perf_counter() - t0
        jax.profiler.stop_trace()
        print(f'== train step b{tb} T{tt}: wall {wall*1e3:.1f} ms (loss {loss:.3f})',
              flush=True)
        summarize_trace(d)


if __name__ == '__main__':
    main()
