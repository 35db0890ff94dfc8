"""Decode/train perf tripwire for the small-attention kernel.

Times the four workloads the round-4 regression touched — baked-weights
generate, the world-model train step (plain + shortcut), and tokenizer
encode / encode+decode — with the small kernel in its configured state vs
force-disabled (`use_fused_small=False`). Run this ON THE CHIP before
shipping any kernel-gating change (VERDICT r4: the kernel landed
unbenchmarked on the decode path and regressed the headline 23%).

Usage: python scripts/compare_small_attention.py [--iters 10]
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp


def timed(fn, label, iters):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    jax.block_until_ready(jfn(jax.random.PRNGKey(0)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(jfn(jax.random.PRNGKey(1)))
    per = (time.perf_counter() - t0) / iters
    print(f'{label:48s} {per*1e3:8.2f} ms/iter   (compile {compile_s:.1f}s)',
          flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=10)
    args = ap.parse_args()

    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    sys.path.insert(0, '.')
    from bench import build_model, init_on_cpu
    from dreamer4_tpu.models.generate import generate
    from dreamer4_tpu.models.tokenizer import VideoTokenizer
    from dreamer4_tpu.ops.utils import cast_params_for_inference
    from dreamer4_tpu.train.optim import muon_adam_atan2
    from dreamer4_tpu.train.trainers import (TrainState,
                                             make_world_model_train_step)

    results = {}
    for fused in (None, False):
        tag = 'auto' if fused is None else 'off'
        model = build_model(use_fused_small=fused)
        tx = muon_adam_atan2(learning_rate=3e-4, clip_grad_norm=1.0)
        variables, opt_state = init_on_cpu(model, tx)
        serve_vars = cast_params_for_inference(variables, jnp.bfloat16)

        def rollout(key, _m=model, _v=serve_vars):
            def body(c, k):
                exp = generate(_m, _v, k, time_steps=16, num_steps=4,
                               batch_size=16)
                return c + jnp.sum(exp.rewards), None
            out, _ = jax.lax.scan(body, jnp.zeros(()),
                                  jax.random.split(key, args.iters))
            return out
        results[f'generate_b16_{tag}'] = timed(
            rollout, f'generate b16 T16 baked [{tag}]', args.iters)

        ts = TrainState(params=variables['params'],
                        state=variables.get('state', {}), opt_state=opt_state,
                        ema_params=None, step=jnp.zeros((), jnp.int32))
        step = make_world_model_train_step(model, tx)
        batch = jax.device_put(dict(
            latents=jax.random.normal(jax.random.PRNGKey(2), (8, 32, 16, 32)) * 0.5,
            rewards=jnp.zeros((8, 32)),
            discrete_actions=jnp.zeros((8, 32, 1), jnp.int32)),
            jax.devices()[0])

        for shortcut in (False, True):
            def train(key, _ts=ts, _b=batch, _sc=shortcut, _step=step):
                def body(c, k):
                    new_ts, loss, _ = _step(c, _b, k, shortcut_train=_sc)
                    return new_ts, loss
                ts_out, losses = jax.lax.scan(body, _ts,
                                              jax.random.split(key, 5))
                return (jnp.sum(losses)
                        + jnp.sum(ts_out.params['register_tokens'].astype(jnp.float32)))
            sc = 'shortcut' if shortcut else 'plain'
            results[f'train_{sc}_{tag}'] = timed(
                train, f'train b8 T32 {sc} [{tag}]', 5)

        tok = VideoTokenizer(
            dim=512, dim_latent=32, patch_size=8, image_height=64,
            image_width=64, num_latent_tokens=16, encoder_depth=4,
            decoder_depth=4, time_block_every=4, decoder_flow_steps=4,
            use_flash_attention=True, use_fused_small=fused,
            dtype=jnp.bfloat16)
        cpu = jax.devices('cpu')[0]
        with jax.default_device(cpu):
            tok_vars = jax.jit(lambda: tok.init(
                {'params': jax.random.PRNGKey(7), 'sample': jax.random.PRNGKey(8)},
                jnp.zeros((2, 3, 2, 64, 64))))()
            jax.block_until_ready(tok_vars)
        tok_vars = jax.device_put(tok_vars, jax.devices()[0])
        video = jax.device_put(
            jax.random.uniform(jax.random.PRNGKey(9), (8, 3, 16, 64, 64)),
            jax.devices()[0])

        def encode(key, _v=tok_vars, _vid=video, _tok=tok):
            def body(c, k):
                vid = _vid + jax.random.uniform(k, (), maxval=1e-6)
                lat = _tok.apply(_v, vid, return_latents=True,
                                 rngs={'sample': k})
                return c + jnp.sum(lat), None
            out, _ = jax.lax.scan(body, jnp.zeros(()),
                                  jax.random.split(key, args.iters * 5))
            return out
        results[f'tok_encode_{tag}'] = timed(
            encode, f'tokenizer encode b8 T16 [{tag}]', args.iters * 5)

        def encdec(key, _v=tok_vars, _vid=video, _tok=tok):
            def body(c, k):
                vid = _vid + jax.random.uniform(k, (), maxval=1e-6)
                lat = _tok.apply(_v, vid, return_latents=True,
                                 rngs={'sample': k})
                out = _tok.apply(_v, lat, method=_tok.decode,
                                 rngs={'sample': k})
                return c + jnp.sum(out), None
            out, _ = jax.lax.scan(body, jnp.zeros(()),
                                  jax.random.split(key, args.iters))
            return out
        results[f'tok_encdec_{tag}'] = timed(
            encdec, f'tokenizer encode+decode b8 T16 [{tag}]', args.iters)

    print('\nsummary (auto vs off, negative = auto faster):')
    for base in ('generate_b16', 'train_plain', 'train_shortcut',
                 'tok_encode', 'tok_encdec'):
        a, o = results[f'{base}_auto'], results[f'{base}_off']
        print(f'  {base:24s} auto {a*1e3:8.2f} ms  off {o*1e3:8.2f} ms '
              f'  delta {100*(a-o)/o:+6.1f}%')


if __name__ == '__main__':
    main()
