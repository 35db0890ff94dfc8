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


def cmd_train_video_tokenizer(argv):
    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser(prog='train-video-tokenizer')
    p.add_argument('--replay-buffer', type=str, required=True,
                   help='folder of a ReplayBuffer with a video field')
    p.add_argument('--output', type=str, default='./checkpoints/tokenizer')
    p.add_argument('--num-steps', type=int, default=100_000)
    p.add_argument('--batch-size', type=int, default=8)
    p.add_argument('--seq-len', type=int, default=8)
    p.add_argument('--learning-rate', type=float, default=3e-4)
    p.add_argument('--checkpoint-every', type=int, default=1000)
    p.add_argument('--log-every', type=int, default=50)
    p.add_argument('--seed', type=int, default=0)
    _add_tokenizer_model_args(p)
    args = p.parse_args(argv)

    from .data.replay_buffer import ReplayBuffer
    from .train.checkpoint import save_model
    from .train.trainers import TokenizerTrainer

    buf = ReplayBuffer.open(args.replay_buffer)
    model = _build_tokenizer(args)

    rng = np.random.default_rng(args.seed)
    sample = buf.sample_batch(rng, args.batch_size, args.seq_len)
    video = jnp.asarray(sample['video'], jnp.float32)
    if video.dtype == jnp.uint8:
        video = video / 255.0
    video = jnp.moveaxis(video, 1, 2) if video.shape[1] != args.channels else video

    variables = model.init({'params': jax.random.PRNGKey(args.seed),
                            'sample': jax.random.PRNGKey(args.seed + 1)},
                           _to_video(sample, args))
    trainer = TokenizerTrainer(model, variables, learning_rate=args.learning_rate,
                               seed=args.seed)

    for step in range(args.num_steps):
        batch = buf.sample_batch(rng, args.batch_size, args.seq_len)
        loss, _ = trainer.train_on_batch(_to_video(batch, args),
                                         time_lens=jnp.asarray(batch['lens']))
        if step % args.log_every == 0:
            print(f'step {step}: loss {float(loss):.4f}', flush=True)
        if step > 0 and step % args.checkpoint_every == 0:
            save_model(args.output, model,
                       {'params': trainer.ts.params, 'state': trainer.ts.state},
                       extra={'step': step})
    save_model(args.output, model,
               {'params': trainer.ts.params, 'state': trainer.ts.state},
               extra={'step': args.num_steps})
    print(f'saved tokenizer to {args.output}')


def _to_video(batch, args):
    import jax.numpy as jnp

    video = jnp.asarray(batch['video'], jnp.float32)
    if batch['video'].dtype == np.uint8:
        video = video / 255.0
    # buffer layout (b, t, c, h, w) -> api layout (b, c, t, h, w)
    if video.shape[2] == args.channels:
        video = jnp.moveaxis(video, 2, 1)
    return video


def cmd_train_dynamics(argv):
    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser(prog='train-dynamics')
    p.add_argument('--replay-buffer', type=str, required=True)
    p.add_argument('--tokenizer-checkpoint', type=str, required=True)
    p.add_argument('--output', type=str, default='./checkpoints/dynamics')
    p.add_argument('--num-steps', type=int, default=100_000)
    p.add_argument('--batch-size', type=int, default=8)
    p.add_argument('--seq-len', type=int, default=8)
    p.add_argument('--dim', type=int, default=512)
    p.add_argument('--depth', type=int, default=8)
    p.add_argument('--num-spatial-tokens', type=int, default=16)
    p.add_argument('--num-discrete-actions', type=int, default=0)
    p.add_argument('--num-continuous-actions', type=int, default=0)
    p.add_argument('--learning-rate', type=float, default=3e-4)
    p.add_argument('--checkpoint-every', type=int, default=1000)
    p.add_argument('--log-every', type=int, default=50)
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args(argv)

    from .data.replay_buffer import ReplayBuffer
    from .models.tokenizer import VideoTokenizer
    from .models.world_model import DynamicsWorldModel
    from .train.checkpoint import load_model, save_model
    from .train.trainers import BehaviorCloneTrainer

    tokenizer, tok_vars = load_model(args.tokenizer_checkpoint, VideoTokenizer)
    buf = ReplayBuffer.open(args.replay_buffer)

    model = DynamicsWorldModel(
        dim=args.dim,
        dim_latent=tokenizer.dim_latent,
        num_latent_tokens=tokenizer.num_latent_tokens,
        num_spatial_tokens=args.num_spatial_tokens,
        depth=args.depth,
        num_discrete_actions=(args.num_discrete_actions,) if args.num_discrete_actions else (),
        num_continuous_actions=args.num_continuous_actions,
    )

    rng = np.random.default_rng(args.seed)
    tokenize = jax.jit(lambda v: tokenizer.apply(tok_vars, v, return_latents=True))

    def prep(batch):
        out = dict(latents=tokenize(_to_video(batch, argparse.Namespace(channels=tokenizer.channels))))
        if 'rewards' in batch:
            out['rewards'] = jnp.asarray(batch['rewards'])
        if 'terminated' in batch:
            out['terminals'] = jnp.asarray(batch['terminated'])
        if 'discrete_actions' in batch:
            da = jnp.asarray(batch['discrete_actions'], jnp.int32)
            out['discrete_actions'] = da if da.ndim == 3 else da[..., None]
        if 'continuous_actions' in batch:
            out['continuous_actions'] = jnp.asarray(batch['continuous_actions'])
        out['lens'] = jnp.asarray(batch['lens'])
        return out

    first = prep(buf.sample_batch(rng, args.batch_size, args.seq_len))
    variables = model.init({'params': jax.random.PRNGKey(args.seed),
                            'sample': jax.random.PRNGKey(args.seed + 1)},
                           shortcut_train=False, **first)
    trainer = BehaviorCloneTrainer(model, variables, tokenizer=tokenizer,
                                   tokenizer_variables=tok_vars,
                                   learning_rate=args.learning_rate, seed=args.seed)

    for step in range(args.num_steps):
        batch = prep(buf.sample_batch(rng, args.batch_size, args.seq_len))
        loss, _ = trainer.train_on_batch(batch)
        if step % args.log_every == 0:
            print(f'step {step}: loss {float(loss):.4f}', flush=True)
        if step > 0 and step % args.checkpoint_every == 0:
            save_model(args.output, model,
                       {'params': trainer.ts.params, 'state': trainer.ts.state},
                       extra={'step': step})
    save_model(args.output, model,
               {'params': trainer.ts.params, 'state': trainer.ts.state},
               extra={'step': args.num_steps})
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

        model, variables = load_model(args.checkpoint, DynamicsWorldModel)
        tokenizer = tok_vars = None
        if args.tokenizer_checkpoint:
            tokenizer, tok_vars = load_model(args.tokenizer_checkpoint, VideoTokenizer)
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
