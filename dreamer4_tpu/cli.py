"""Command-line interface.

Equivalent of the reference fire CLI (`cli.py:352-358`) with the same four
commands, on argparse (no extra deps):

  python -m dreamer4_tpu.cli train-video-tokenizer --dataset <folder|buffer> ...
  python -m dreamer4_tpu.cli train-dynamics --tokenizer-checkpoint <dir> ...
  python -m dreamer4_tpu.cli serve-world-model --checkpoint <dir> ...
  python -m dreamer4_tpu.cli inspect-replay-buffer --buffer <dir>
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def _add_tokenizer_model_args(p):
    p.add_argument('--dim', type=int, default=512)
    p.add_argument('--dim-latent', type=int, default=32)
    p.add_argument('--patch-size', type=int, default=8)
    p.add_argument('--image-size', type=int, default=64)
    p.add_argument('--num-latent-tokens', type=int, default=16)
    p.add_argument('--encoder-depth', type=int, default=4)
    p.add_argument('--decoder-depth', type=int, default=4)
    p.add_argument('--time-block-every', type=int, default=4)
    p.add_argument('--channels', type=int, default=3)


def _build_tokenizer(args):
    from .models.tokenizer import VideoTokenizer

    return VideoTokenizer(
        dim=args.dim,
        dim_latent=args.dim_latent,
        patch_size=args.patch_size,
        image_height=args.image_size,
        image_width=args.image_size,
        channels=args.channels,
        num_latent_tokens=args.num_latent_tokens,
        encoder_depth=args.encoder_depth,
        decoder_depth=args.decoder_depth,
        time_block_every=args.time_block_every,
    )


def _resolve_video_dataset(spec: str, image_size, num_frames, seed: int,
                           with_trajectories: bool = False):
    """Dataset resolution (reference `cli.py:65-96`): `spec` is a replay
    buffer directory (contains buffer_meta.json), a folder of .gif/.npy
    videos (with optional `<stem>.<key>.npy` trajectory sidecars), or a glob
    pattern."""
    from .data.datasets import (VideoDataset, VideoDatasetFromReplayBuffer,
                                VideoTrajectoryDataset)

    path = Path(spec)
    if path.is_dir() and (path / 'buffer_meta.json').exists():
        from .data.replay_buffer import ReplayBuffer

        buf = ReplayBuffer.open(path)
        return VideoDatasetFromReplayBuffer(buf, num_frames=num_frames, seed=seed)
    cls = VideoTrajectoryDataset if with_trajectories else VideoDataset
    return cls(spec, image_size=image_size, num_frames=num_frames, seed=seed)


def _batch_video(batch) -> 'np.ndarray':
    """collated 'video' is already (b, c, t, h, w) float in [0, 1]."""
    import jax.numpy as jnp

    return jnp.asarray(batch['video'], jnp.float32)


def cmd_train_video_tokenizer(argv):
    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser(prog='train-video-tokenizer')
    p.add_argument('--dataset', '--replay-buffer', dest='dataset', type=str,
                   required=True,
                   help='replay-buffer dir | folder of gif/npy videos | glob')
    p.add_argument('--output', type=str, default='./checkpoints/tokenizer')
    p.add_argument('--num-steps', type=int, default=100_000)
    p.add_argument('--batch-size', type=int, default=8)
    p.add_argument('--grad-accum', type=int, default=8,
                   help='micro-batches per optimizer step (reference default)')
    p.add_argument('--seq-len', type=int, default=8)
    p.add_argument('--learning-rate', type=float, default=3e-4)
    p.add_argument('--checkpoint-every', type=int, default=1000)
    p.add_argument('--log-every', type=int, default=50)
    p.add_argument('--sample-every', type=int, default=1000,
                   help='write original|recon sample gifs every N steps')
    p.add_argument('--aug-prob', type=float, default=0.0,
                   help='pixel-shift augmentation probability')
    p.add_argument('--no-resume', action='store_true')
    p.add_argument('--seed', type=int, default=0)
    _add_tokenizer_model_args(p)
    args = p.parse_args(argv)

    from .data.datasets import batch_iterator, prefetch_batches, randomly_apply_aug
    from .train.logging import MetricLogger
    from .train.trainers import TokenizerTrainer

    dataset = _resolve_video_dataset(args.dataset, (args.image_size, args.image_size),
                                     args.seq_len, args.seed)
    batches = prefetch_batches(batch_iterator(dataset, args.batch_size,
                                              rng=np.random.default_rng(args.seed)))
    model = _build_tokenizer(args)
    logger = MetricLogger(Path(args.output) / 'logs')

    first = next(batches)
    variables = model.init({'params': jax.random.PRNGKey(args.seed),
                            'sample': jax.random.PRNGKey(args.seed + 1)},
                           _batch_video(first))
    trainer = TokenizerTrainer(model, variables, learning_rate=args.learning_rate,
                               grad_accum=args.grad_accum, seed=args.seed)

    start_step = 0
    if not args.no_resume and (Path(args.output) / 'latest').exists():
        trainer.restore(args.output)
        start_step = int(trainer.ts.step)
        print(f'resumed from {args.output} at step {start_step}', flush=True)

    aug_rng = np.random.default_rng(args.seed + 23)
    reconstruct = jax.jit(lambda v, video: model.apply(
        v, model.apply(v, video, return_latents=True,
                       rngs={'sample': jax.random.PRNGKey(0)}),
        method=model.decode, rngs={'sample': jax.random.PRNGKey(1)}))

    step = start_step
    while step < args.num_steps:
        for _ in range(args.grad_accum):
            batch = next(batches)
            video = np.asarray(batch['video'], np.float32)
            if args.aug_prob > 0.0:
                video, _aug_id = randomly_apply_aug(aug_rng, video, prob=args.aug_prob)
            loss, _ = trainer.train_on_batch(jnp.asarray(video),
                                             time_lens=jnp.asarray(batch['lens']))
        step = int(trainer.ts.step)
        if step % args.log_every == 0:
            logger.log(step, loss=float(loss))
            print(f'step {step}: loss {float(loss):.4f}', flush=True)
        if step % args.sample_every == 0:
            clean = _batch_video(batch)[:4]
            recon = reconstruct({'params': trainer.ts.params, 'state': trainer.ts.state},
                                clean)
            side = np.concatenate([np.asarray(clean), np.clip(np.asarray(recon), 0, 1)],
                                  axis=-1)  # widthwise original|recon
            logger.log_video(step, 'recon', side)
        if step % args.checkpoint_every == 0:
            trainer.save_checkpoint(args.output)
    trainer.save_checkpoint(args.output)
    logger.close()
    print(f'saved tokenizer to {args.output}')


def _resolve_model_checkpoint(path: str, prefer_ema: bool = True) -> Path:
    """Resolve a checkpoint dir that may be a trainer output dir with a
    floating `latest` and optional `ema/` subcheckpoint (reference EMA
    checkpoint resolution, `cli.py:207-211`)."""
    p = Path(path)
    if (p / 'latest').exists():
        p = (p / 'latest').resolve()
    if prefer_ema and (p / 'ema' / 'config.json').exists():
        p = p / 'ema'
    return p


def cmd_train_dynamics(argv):
    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser(prog='train-dynamics')
    p.add_argument('--dataset', '--replay-buffer', dest='dataset', type=str,
                   required=True,
                   help='replay-buffer dir | folder of videos+sidecars | glob')
    p.add_argument('--tokenizer-checkpoint', type=str, required=True)
    p.add_argument('--output', type=str, default='./checkpoints/dynamics')
    p.add_argument('--num-steps', type=int, default=100_000)
    p.add_argument('--batch-size', type=int, default=8)
    p.add_argument('--grad-accum', type=int, default=1)
    p.add_argument('--seq-len', type=int, default=8)
    p.add_argument('--dim', type=int, default=512)
    p.add_argument('--depth', type=int, default=8)
    p.add_argument('--num-spatial-tokens', type=int, default=16)
    p.add_argument('--num-discrete-actions', type=int, default=0)
    p.add_argument('--num-continuous-actions', type=int, default=0)
    p.add_argument('--learning-rate', type=float, default=3e-4)
    p.add_argument('--checkpoint-every', type=int, default=1000)
    p.add_argument('--log-every', type=int, default=50)
    p.add_argument('--sample-every', type=int, default=0,
                   help='write prompted-dream gifs every N steps (0 = off)')
    p.add_argument('--no-resume', action='store_true')
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args(argv)

    from .data.datasets import batch_iterator, prefetch_batches
    from .models.tokenizer import VideoTokenizer
    from .models.world_model import DynamicsWorldModel
    from .train.checkpoint import load_model
    from .train.logging import MetricLogger
    from .train.trainers import BehaviorCloneTrainer

    tokenizer, tok_vars = load_model(
        _resolve_model_checkpoint(args.tokenizer_checkpoint), VideoTokenizer)
    dataset = _resolve_video_dataset(
        args.dataset, (tokenizer.image_height, tokenizer.image_width),
        args.seq_len, args.seed, with_trajectories=True)
    batches = prefetch_batches(batch_iterator(dataset, args.batch_size,
                                              rng=np.random.default_rng(args.seed)))
    logger = MetricLogger(Path(args.output) / 'logs')

    model = DynamicsWorldModel(
        dim=args.dim,
        dim_latent=tokenizer.dim_latent,
        num_latent_tokens=tokenizer.num_latent_tokens,
        num_spatial_tokens=args.num_spatial_tokens,
        depth=args.depth,
        num_discrete_actions=(args.num_discrete_actions,) if args.num_discrete_actions else (),
        num_continuous_actions=args.num_continuous_actions,
    )

    tokenize = jax.jit(lambda v: tokenizer.apply(
        tok_vars, v, return_latents=True, rngs={'sample': jax.random.PRNGKey(0)}))

    def prep(batch):
        out = dict(latents=tokenize(_batch_video(batch)))
        if 'rewards' in batch:
            out['rewards'] = jnp.asarray(batch['rewards'], jnp.float32)
        if 'terminated' in batch:
            out['terminals'] = jnp.asarray(batch['terminated'], bool)
        actions = batch.get('actions')
        if actions is not None and np.issubdtype(np.asarray(actions).dtype, np.integer):
            da = jnp.asarray(actions, jnp.int32)
            out['discrete_actions'] = da if da.ndim == 3 else da[..., None]
        elif actions is not None:
            out['continuous_actions'] = jnp.asarray(actions, jnp.float32)
        if 'continuous_actions' in batch:
            out['continuous_actions'] = jnp.asarray(batch['continuous_actions'], jnp.float32)
        out['lens'] = jnp.asarray(batch['lens'])
        return out

    first = prep(next(batches))
    variables = model.init({'params': jax.random.PRNGKey(args.seed),
                            'sample': jax.random.PRNGKey(args.seed + 1)},
                           shortcut_train=False, **first)
    trainer = BehaviorCloneTrainer(model, variables, tokenizer=tokenizer,
                                   tokenizer_variables=tok_vars,
                                   grad_accum=args.grad_accum,
                                   learning_rate=args.learning_rate, seed=args.seed)

    start_step = 0
    if not args.no_resume and (Path(args.output) / 'latest').exists():
        trainer.restore(args.output)
        start_step = int(trainer.ts.step)
        print(f'resumed from {args.output} at step {start_step}', flush=True)

    decode = jax.jit(lambda v, latents: tokenizer.apply(
        v, latents, method=tokenizer.decode, rngs={'sample': jax.random.PRNGKey(1)}))

    step = start_step
    while step < args.num_steps:
        for _ in range(args.grad_accum):
            batch = prep(next(batches))
            loss, _ = trainer.train_on_batch(batch)
        step = int(trainer.ts.step)
        if step % args.log_every == 0:
            logger.log(step, loss=float(loss))
            print(f'step {step}: loss {float(loss):.4f}', flush=True)
        if args.sample_every and step % args.sample_every == 0:
            # prompted dream continuation gif (reference sampling,
            # `trainers.py:1104-1185`): first half of the batch sequence
            # prompts the rollout, the dreamed second half is decoded
            from .models.generate import generate

            prompt_t = max(1, batch['latents'].shape[1] // 2)
            gen_kwargs = dict(prompt_latents=batch['latents'][:4, :prompt_t])
            if 'discrete_actions' in batch:
                gen_kwargs['prompt_discrete_actions'] = batch['discrete_actions'][:4, :prompt_t]
            if 'continuous_actions' in batch:
                gen_kwargs['prompt_continuous_actions'] = batch['continuous_actions'][:4, :prompt_t]
            exp = generate(model,
                           {'params': trainer.ts.params, 'state': trainer.ts.state},
                           jax.random.PRNGKey(step),
                           time_steps=batch['latents'].shape[1],
                           num_steps=4, batch_size=min(4, batch['latents'].shape[0]),
                           **gen_kwargs)
            dreamed = decode(tok_vars, exp.latents)
            logger.log_video(step, 'dream', np.clip(np.asarray(dreamed), 0, 1))
        if step % args.checkpoint_every == 0:
            trainer.save_checkpoint(args.output)
    trainer.save_checkpoint(args.output)
    logger.close()
    print(f'saved dynamics model to {args.output}')


def cmd_serve_world_model(argv):
    p = argparse.ArgumentParser(prog='serve-world-model')
    p.add_argument('--checkpoint', type=str, default=None,
                   help='dynamics checkpoint; omit for ground-truth Snake')
    p.add_argument('--tokenizer-checkpoint', type=str, default=None)
    p.add_argument('--port', type=int, default=8000)
    p.add_argument('--grid-size', type=int, default=4)
    args = p.parse_args(argv)

    from .serve.server import WebEnvServer

    if args.checkpoint is None:
        from .envs.snake import SnakeEnv
        env = SnakeEnv(grid_size=args.grid_size)
    else:
        from .models.tokenizer import VideoTokenizer
        from .models.world_model import DynamicsWorldModel
        from .train.checkpoint import load_model
        from .envs.world_model_env import DynamicsWorldModelWrapper

        model, variables = load_model(
            _resolve_model_checkpoint(args.checkpoint), DynamicsWorldModel)
        tokenizer = tok_vars = None
        if args.tokenizer_checkpoint:
            tokenizer, tok_vars = load_model(
                _resolve_model_checkpoint(args.tokenizer_checkpoint), VideoTokenizer)
        env = DynamicsWorldModelWrapper(model, variables, tokenizer=tokenizer,
                                        tokenizer_variables=tok_vars)

    WebEnvServer(env, port=args.port).serve_forever()


def cmd_inspect_replay_buffer(argv):
    p = argparse.ArgumentParser(prog='inspect-replay-buffer')
    p.add_argument('--buffer', type=str, required=True)
    p.add_argument('--serve', action='store_true', help='start the web inspector')
    p.add_argument('--port', type=int, default=8001)
    args = p.parse_args(argv)

    from .data.replay_buffer import ReplayBuffer

    buf = ReplayBuffer.open(args.buffer)

    if args.serve:
        from .serve.server import InspectReplayBufferServer

        InspectReplayBufferServer(buf, port=args.port).serve_forever()
        return
    lengths = [buf.episode_length(i) for i in range(buf.num_episodes)]
    print(json.dumps(dict(
        folder=str(args.buffer),
        num_episodes=buf.num_episodes,
        max_episodes=buf.max_episodes,
        max_timesteps=buf.max_timesteps,
        fields={k: [str(np.dtype(d)), list(s)] for k, (d, s) in buf.fields.items()},
        mean_episode_length=float(np.mean(lengths)) if lengths else 0.0,
    ), indent=2))


COMMANDS = {
    'train-video-tokenizer': cmd_train_video_tokenizer,
    'train-dynamics': cmd_train_dynamics,
    'serve-world-model': cmd_serve_world_model,
    'inspect-replay-buffer': cmd_inspect_replay_buffer,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ('-h', '--help'):
        print('usage: python -m dreamer4_tpu.cli <command> [args]\ncommands:',
              *('  ' + c for c in COMMANDS), sep='\n')
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f'unknown command {cmd!r}; available: {list(COMMANDS)}', file=sys.stderr)
        return 1
    return COMMANDS[cmd](argv[1:])


if __name__ == '__main__':
    sys.exit(main() or 0)
