"""Continuous-action + proprioception dynamics (driver config 4).

A procedural 2-joint "reacher" arm renders 32x32 videos; actions are 6-dim
continuous in [-1, 1] (dims 0-1 drive the joint velocities, dims 2-5 are
nuisance channels the model must learn to ignore); proprio is the 4-dim
(sin/cos of both joint angles). Trajectories are written as
`<stem>.video.npy` + `.actions.npy` + `.rewards.npy` + `.proprio.npy`
sidecars (the reference's `.action.npy` conditioning pattern,
`trainers.py:255-340`), loaded back with `VideoTrajectoryDataset`, and a
DynamicsWorldModel with `num_continuous_actions=6` + `dim_proprio=4` is
behavior-cloned on latents, then dreamed with forced constant actions to
verify the rollout responds to continuous control.

Usage: python examples/train_reacher_proprio_dynamics.py --steps 300
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

IMAGE = 32
T = 24


def render_arm(theta1: float, theta2: float) -> np.ndarray:
    """2-link arm on a 32x32x3 canvas, drawn with anti-aliased line stamps."""
    img = np.zeros((IMAGE, IMAGE, 3), np.float32)
    cx, cy = IMAGE / 2, IMAGE / 2
    l1, l2 = IMAGE * 0.28, IMAGE * 0.22
    x1, y1 = cx + l1 * np.cos(theta1), cy + l1 * np.sin(theta1)
    x2, y2 = x1 + l2 * np.cos(theta1 + theta2), y1 + l2 * np.sin(theta1 + theta2)

    def stamp_line(x0, y0, x1, y1, channel, width=1.1):
        n = 24
        xs = np.linspace(x0, x1, n)
        ys = np.linspace(y0, y1, n)
        yy, xx = np.mgrid[0:IMAGE, 0:IMAGE]
        for px, py in zip(xs, ys):
            d2 = (xx - px) ** 2 + (yy - py) ** 2
            img[..., channel] += np.exp(-d2 / (2 * width ** 2))

    stamp_line(cx, cy, x1, y1, 0)
    stamp_line(x1, y1, x2, y2, 1)
    img[..., 2] += np.exp(-(((np.mgrid[0:IMAGE, 0:IMAGE][1] - x2) ** 2
                             + (np.mgrid[0:IMAGE, 0:IMAGE][0] - y2) ** 2)
                            / (2 * 1.5 ** 2)))
    return np.clip(img, 0.0, 1.0)


def make_dataset(folder: Path, num_trajs: int, seed: int):
    rng = np.random.default_rng(seed)
    folder.mkdir(parents=True, exist_ok=True)
    for i in range(num_trajs):
        theta = rng.uniform(-np.pi, np.pi, size=2)
        frames, acts, proprio = [], [], []
        for t in range(T):
            frames.append(render_arm(*theta))
            proprio.append(np.concatenate([np.sin(theta), np.cos(theta)]))
            a = rng.uniform(-1.0, 1.0, size=6).astype(np.float32)
            if t < T - 1:
                acts.append(a)
            theta = theta + 0.35 * a[:2]  # dims 2-5 do nothing
        video = np.stack(frames).transpose(3, 0, 1, 2)  # (c, t, h, w)
        stem = folder / f'traj_{i:03d}'
        np.save(f'{stem}.video.npy', video.astype(np.float32))
        np.save(f'{stem}.actions.npy', np.stack(acts))
        np.save(f'{stem}.rewards.npy', np.zeros((T,), np.float32))
        np.save(f'{stem}.proprio.npy', np.stack(proprio).astype(np.float32))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--data', type=str, default='/tmp/reacher_trajs')
    p.add_argument('--num-trajs', type=int, default=24)
    p.add_argument('--steps', type=int, default=300)
    p.add_argument('--tokenizer-steps', type=int, default=200)
    p.add_argument('--batch-size', type=int, default=8)
    p.add_argument('--seq-len', type=int, default=8)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    import jax.numpy as jnp

    from dreamer4_tpu.data.datasets import VideoTrajectoryDataset, batch_iterator
    from dreamer4_tpu.models.generate import generate
    from dreamer4_tpu.models.tokenizer import VideoTokenizer
    from dreamer4_tpu.models.world_model import DynamicsWorldModel
    from dreamer4_tpu.train.trainers import BehaviorCloneTrainer, TokenizerTrainer

    data_dir = Path(args.data)
    if not any(data_dir.glob('*.video.npy')):
        print('generating procedural reacher trajectories...', flush=True)
        make_dataset(data_dir, args.num_trajs, args.seed)

    ds = VideoTrajectoryDataset(args.data, image_size=(IMAGE, IMAGE),
                                num_frames=args.seq_len, seed=args.seed)
    batches = batch_iterator(ds, args.batch_size, rng=np.random.default_rng(args.seed))

    # ---- tokenizer
    tokenizer = VideoTokenizer(
        dim=64, dim_latent=16, patch_size=8, image_height=IMAGE, image_width=IMAGE,
        num_latent_tokens=8, encoder_depth=2, decoder_depth=2, time_block_every=2)
    first = next(batches)
    video0 = jnp.asarray(first['video'], jnp.float32)
    tok_vars = tokenizer.init({'params': jax.random.PRNGKey(args.seed),
                               'sample': jax.random.PRNGKey(args.seed + 1)}, video0)
    tok_trainer = TokenizerTrainer(tokenizer, tok_vars, seed=args.seed)
    t0 = time.time()
    for step in range(args.tokenizer_steps):
        batch = next(batches)
        loss, _ = tok_trainer.train_on_batch(jnp.asarray(batch['video'], jnp.float32),
                                             time_lens=jnp.asarray(batch['lens']))
        if step % 50 == 0:
            print(f'tokenizer step {step}: loss {float(loss):.4f} [{time.time()-t0:.0f}s]',
                  flush=True)

    # ---- dynamics: continuous 6-dim actions + 4-dim proprio
    model = DynamicsWorldModel(
        dim=64, dim_latent=16, num_latent_tokens=8, num_spatial_tokens=8,
        max_steps=16, depth=2, time_block_every=2, attn_heads=4, attn_dim_head=16,
        num_continuous_actions=6, continuous_dist_type='beta',
        continuous_target_action_range=(-1.0, 1.0),
        dim_proprio=4, multi_token_pred_len=4, num_register_tokens=4,
        predict_terminals=False, add_action_embed_to_spatial=True)

    latents0 = jnp.zeros((1, 4, 8, 16))
    wm_vars = model.init({'params': jax.random.PRNGKey(args.seed + 2),
                          'sample': jax.random.PRNGKey(args.seed + 3)},
                         latents=latents0, shortcut_train=False,
                         rewards=jnp.zeros((1, 4)),
                         proprio=jnp.zeros((1, 4, 4)),
                         continuous_actions=jnp.full((1, 3, 6), 0.1))
    bc = BehaviorCloneTrainer(model, wm_vars, tokenizer=tokenizer,
                              tokenizer_variables={'params': tok_trainer.ts.params,
                                                   'state': tok_trainer.ts.state},
                              seed=args.seed)

    t0 = time.time()
    for step in range(args.steps):
        batch = next(batches)
        wm_batch = dict(
            video=jnp.asarray(batch['video'], jnp.float32),
            continuous_actions=jnp.asarray(batch['actions'], jnp.float32),
            rewards=jnp.asarray(batch['rewards'], jnp.float32),
            proprio=jnp.asarray(batch['proprio'], jnp.float32),
            lens=jnp.asarray(batch['lens']),
        )
        loss, _ = bc.train_on_batch(wm_batch)
        if step % 50 == 0:
            print(f'dynamics step {step}: loss {float(loss):.4f} [{time.time()-t0:.0f}s]',
                  flush=True)

    # ---- action-conditioned dreams: constant +torque vs -torque must diverge
    variables = {'params': bc.ts.params, 'state': bc.ts.state}
    item = ds[0]
    tokenize = jax.jit(lambda v: tokenizer.apply(
        {'params': tok_trainer.ts.params, 'state': tok_trainer.ts.state},
        v, return_latents=True, rngs={'sample': jax.random.PRNGKey(0)}))
    p_lat = tokenize(jnp.asarray(item['video'][None, :, :3], jnp.float32))
    # P prompt frames need P actions: actions[i] is taken FROM frame i, and
    # the first generated frame (i=P) conditions on actions[P-1]
    p_act = jnp.asarray(item['actions'][None, :3], jnp.float32)
    p_prop = jnp.asarray(item['proprio'][None, :3], jnp.float32)

    outs = {}
    for name, val in (('pos', 0.9), ('neg', -0.9)):
        forced = jnp.full((1, 10, 6), val)
        exp = jax.jit(lambda v, f, k: generate(
            model, v, k, time_steps=10, num_steps=4, batch_size=1,
            prompt_latents=p_lat, prompt_continuous_actions=p_act,
            prompt_proprio=p_prop, forced_continuous_actions=f))(
                variables, forced, jax.random.PRNGKey(42))
        outs[name] = exp
    lat_div = float(jnp.abs(outs['pos'].latents - outs['neg'].latents)[:, 3:].mean())
    lat_scale = float(jnp.abs(outs['pos'].latents)[:, 3:].mean())
    prop_div = float(jnp.abs(outs['pos'].proprio - outs['neg'].proprio)[:, 3:].mean())
    print(f'forced-action dream divergence: latents {lat_div:.4f} '
          f'(scale {lat_scale:.4f}), proprio {prop_div:.4f}', flush=True)
    ok = lat_div > 0.01 * max(lat_scale, 1e-6)
    print('PASS' if ok else 'WEAK', flush=True)
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
