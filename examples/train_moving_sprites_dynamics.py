"""Moving-sprites action-conditioned dynamics training
(reference `train_moving_mnist_dynamics.py`): behavior-clone the world model
on velocity-conditioned sprite trajectories, then sample velocity-controlled
generations on a 3x3 grid of actions.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--data', type=str, default='./data/moving_sprites')
    p.add_argument('--tokenizer-checkpoint', type=str, default='./checkpoints/sprites_tokenizer')
    p.add_argument('--output', type=str, default='./checkpoints/sprites_dynamics')
    p.add_argument('--num-steps', type=int, default=20_000)
    p.add_argument('--batch-size', type=int, default=8)
    p.add_argument('--num-frames', type=int, default=8)
    p.add_argument('--dim', type=int, default=128)
    p.add_argument('--depth', type=int, default=4)
    p.add_argument('--log-every', type=int, default=100)
    p.add_argument('--sample-every', type=int, default=5000)
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dreamer4_tpu.data.datasets import VideoTrajectoryDataset, batch_iterator
    from dreamer4_tpu.data.video_io import save_gif, video_grid
    from dreamer4_tpu.models.generate import generate
    from dreamer4_tpu.models.tokenizer import VideoTokenizer
    from dreamer4_tpu.models.world_model import DynamicsWorldModel
    from dreamer4_tpu.train.checkpoint import load_model, save_model
    from dreamer4_tpu.train.trainers import BehaviorCloneTrainer

    tokenizer, tok_vars = load_model(args.tokenizer_checkpoint, VideoTokenizer)
    ds = VideoTrajectoryDataset(args.data, num_frames=args.num_frames, seed=args.seed)
    it = batch_iterator(ds, args.batch_size, rng=np.random.default_rng(args.seed))

    model = DynamicsWorldModel(
        dim=args.dim,
        dim_latent=tokenizer.dim_latent,
        num_latent_tokens=tokenizer.num_latent_tokens,
        num_spatial_tokens=tokenizer.num_latent_tokens,
        max_steps=16,
        depth=args.depth,
        time_block_every=2,
        attn_heads=4,
        attn_dim_head=32,
        num_discrete_actions=(9,),  # 3x3 velocity grid
        multi_token_pred_len=4,
        predict_terminals=False,
    )

    tokenize = jax.jit(lambda v: tokenizer.apply(tok_vars, v, return_latents=True))

    def prep(batch):
        video = jnp.asarray(batch['video'])
        out = dict(latents=tokenize(video), lens=jnp.asarray(batch['lens']))
        if 'actions' in batch:
            out['discrete_actions'] = jnp.asarray(batch['actions'], jnp.int32)[..., None]
        return out

    first = prep(next(it))
    rngs = {'params': jax.random.PRNGKey(args.seed), 'sample': jax.random.PRNGKey(args.seed + 1)}
    variables = model.init(rngs, shortcut_train=False, **first)
    trainer = BehaviorCloneTrainer(model, variables, tokenizer=tokenizer,
                                   tokenizer_variables=tok_vars, seed=args.seed)

    t0 = time.time()
    for step in range(args.num_steps):
        loss, _ = trainer.train_on_batch(prep(next(it)))
        if step % args.log_every == 0:
            print(f'step {step}: loss {float(loss):.4f} [{time.time()-t0:.0f}s]', flush=True)

        if step > 0 and step % args.sample_every == 0:
            # velocity-grid conditioned sampling: one dream per action id
            vars_now = {'params': trainer.ts.params, 'state': trainer.ts.state}
            actions = jnp.arange(9)[:, None, None]  # (9, t=1, na=1) sticky prompt actions
            exp = generate(model, vars_now, jax.random.PRNGKey(step),
                           time_steps=args.num_frames, num_steps=4, batch_size=9,
                           prompt_discrete_actions=jnp.broadcast_to(
                               actions, (9, args.num_frames - 1, 1)))
            video = tokenizer.apply(tok_vars, exp.latents, method=tokenizer.decode,
                                    rngs={'sample': jax.random.PRNGKey(1)})
            grid = video_grid(np.asarray(video), columns=3)
            save_gif(Path(args.output).parent / f'sample_{step}.gif', grid)

    save_model(args.output, model, {'params': trainer.ts.params, 'state': trainer.ts.state})
    print(f'saved to {args.output}')


if __name__ == '__main__':
    main()
