"""Moving-sprites tokenizer training (reference `train_moving_mnist_tokenizer.py`).

Usage:
  python examples/dataset_moving_sprites.py ./data/moving_sprites
  python examples/train_moving_sprites_tokenizer.py --data ./data/moving_sprites
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
    p.add_argument('--output', type=str, default='./checkpoints/sprites_tokenizer')
    p.add_argument('--num-steps', type=int, default=20_000)
    p.add_argument('--batch-size', type=int, default=8)
    p.add_argument('--num-frames', type=int, default=8)
    p.add_argument('--dim', type=int, default=128)
    p.add_argument('--log-every', type=int, default=100)
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dreamer4_tpu.data.datasets import VideoTrajectoryDataset, batch_iterator
    from dreamer4_tpu.models.tokenizer import VideoTokenizer
    from dreamer4_tpu.train.checkpoint import save_model
    from dreamer4_tpu.train.trainers import TokenizerTrainer

    ds = VideoTrajectoryDataset(args.data, num_frames=args.num_frames, seed=args.seed)
    it = batch_iterator(ds, args.batch_size, rng=np.random.default_rng(args.seed))

    model = VideoTokenizer(
        dim=args.dim, dim_latent=16, patch_size=8,
        image_height=32, image_width=32, channels=1,
        num_latent_tokens=8, encoder_depth=2, decoder_depth=2, time_block_every=2,
        attn_dim_head=32, attn_heads=4)

    first = next(it)
    video = jnp.asarray(first['video'])
    rngs = {'params': jax.random.PRNGKey(args.seed), 'sample': jax.random.PRNGKey(args.seed + 1)}
    variables = model.init(rngs, video)
    trainer = TokenizerTrainer(model, variables, seed=args.seed)

    t0 = time.time()
    for step in range(args.num_steps):
        batch = next(it)
        loss, _ = trainer.train_on_batch(jnp.asarray(batch['video']),
                                         time_lens=jnp.asarray(batch['lens']))
        if step % args.log_every == 0:
            print(f'step {step}: loss {float(loss):.4f} [{time.time()-t0:.0f}s]', flush=True)

    save_model(args.output, model, {'params': trainer.ts.params, 'state': trainer.ts.state})
    print(f'saved to {args.output}')


if __name__ == '__main__':
    main()
