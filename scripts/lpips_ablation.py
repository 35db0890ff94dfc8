"""LPIPS ablation: random-VGG perceptual loss vs none (VERDICT item 10).

No pretrained VGG16 weights exist in this image (no torchvision, no cached
checkpoints, zero egress), so real LPIPS is environmentally impossible. The
decision this script informs: is the random-feature VGG (an untrained LPIPS
trunk — known to still provide useful structural gradients, cf. the
'deep image prior'/random-feature-metric literature) worth enabling by
default, or should the perceptual term stay off until real weights can be
provided via `lpips_weights_path`?

Protocol: identical tiny tokenizers trained on procedural moving sprites for
N steps, one with lpips_loss_weight=0 and one with random-VGG LPIPS; report
final reconstruction MSE (the quantity LPIPS is supposed to help) and
per-step wall time. Appends a JSON line to results for STATUS.md.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'examples'))

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

STEPS = 300
BATCH = 8
FRAMES = 4
SIZE = 32


def make_videos(n, key):
    """Procedural bouncing-square videos (c, t, h, w) in [0,1]."""
    rng = np.random.default_rng(key)
    videos = np.zeros((n, 3, FRAMES, SIZE, SIZE), np.float32)
    for i in range(n):
        x, y = rng.integers(4, SIZE - 10, 2)
        vx, vy = rng.integers(1, 4, 2) * rng.choice([-1, 1], 2)
        color = rng.random(3) * 0.8 + 0.2
        for t in range(FRAMES):
            videos[i, :, t, y:y + 6, x:x + 6] = color[:, None, None]
            x = int(np.clip(x + vx, 0, SIZE - 7))
            y = int(np.clip(y + vy, 0, SIZE - 7))
    return videos


def run(use_lpips: bool, seed=0):
    from dreamer4_tpu.models.tokenizer import VideoTokenizer
    from dreamer4_tpu.train.trainers import TokenizerTrainer

    model = VideoTokenizer(
        dim=32, dim_latent=8, patch_size=8, image_height=SIZE, image_width=SIZE,
        num_latent_tokens=4, encoder_depth=2, decoder_depth=2, time_block_every=2,
        attn_dim_head=8, attn_heads=4,
        lpips_loss_weight=0.3 if use_lpips else 0.0)

    data = make_videos(64, seed)
    video0 = jnp.asarray(data[:BATCH])
    variables = model.init({'params': jax.random.PRNGKey(seed),
                            'sample': jax.random.PRNGKey(seed + 1)}, video0)
    trainer = TokenizerTrainer(model, variables, learning_rate=1e-3, seed=seed,
                               use_lpips=use_lpips)

    rng = np.random.default_rng(seed + 5)
    t0 = time.time()
    for step in range(STEPS):
        idx = rng.integers(0, len(data), BATCH)
        trainer.train_on_batch(jnp.asarray(data[idx]))
    wall = time.time() - t0

    # held-out recon MSE with the trained params
    test = jnp.asarray(make_videos(16, seed + 999))
    vars_final = {'params': trainer.ts.params, 'state': trainer.ts.state}
    latents = model.apply(vars_final, test, return_latents=True,
                          rngs={'sample': jax.random.PRNGKey(2)})
    recon = model.apply(vars_final, latents, method=model.decode,
                        rngs={'sample': jax.random.PRNGKey(3)})
    mse = float(jnp.mean((recon - test) ** 2))
    return dict(use_lpips=use_lpips, recon_mse=mse,
                ms_per_step=round(wall / STEPS * 1e3, 1))


if __name__ == '__main__':
    results = [run(False), run(True)]
    print(json.dumps(results))
