"""CartPole from PIXELS: policy learned purely in imagination, with the
VideoTokenizer in the loop — the paper's actual setting (video world models).

This is the pixel-input counterpart of `train_cartpole_offline_dream_rl.py`
and the equivalent of the reference flagship example's image mode
(`/root/reference/train_cartpole_with_dynamics_rl.py:162-204` builds a
VideoTokenizer for 64x64 RGB CartPole renders; `:66-84` wraps the env with an
image-observation wrapper). Six phases, each cached in --workdir so restarts
are cheap:

  1. EXPERT   (cpu): state-vector online RL (the proven SimTrainer recipe)
               until avg return >= --expert-target. Exists only to MAKE the
               offline dataset, standing in for the paper's human/VPT data.
  2. COLLECT  (cpu): expert + random rollouts on RENDERED CartPole; frames
               (64x64 RGB), actions, rewards, terminals recorded.
  3. TOKENIZER(tpu): VideoTokenizer trained on the collected frames (MAE
               masking + flow decoder, mirroring the reference pixel config).
  4. TOKENIZE (tpu): every episode's frame sequence -> causal latents with
               the frozen EMA tokenizer (parallel encode == the streaming
               cache used at eval; the parity invariant is tested in
               tests/test_tokenizer.py).
  5. WORLD MODEL (tpu): dynamics model trained offline on tokenizer latents
               (policy/value heads frozen).
  6. DREAM RL (cpu): fresh policy/value heads optimized with PPO on
               imagination rollouts only; the real env is used strictly for
               EVALUATION, observed THROUGH the tokenizer's streaming encode.

Success = eval return >= --target-return (reference gate: 70.0 at
max_timesteps 150) with zero real-env policy updates after phase 2.

Device strategy (this axon/TPU runtime): phases that step a host env (1, 2,
6) run on the CPU backend; the batch-training phases (3, 4, 5) run on the
accelerator — host->device feeding is fast here, device->host is fetched
once per phase. `--cpu` forces everything onto the CPU backend.

Usage: python examples/train_cartpole_pixels_dream_rl.py --workdir /tmp/cartpole_pixels
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from train_cartpole_with_dynamics_rl import GymnasiumVectorAdapter

T0 = time.time()


def log(msg):
    print(f'[{time.time() - T0:7.0f}s] {msg}', flush=True)


# --------------------------------------------------------------------- envs

FRAME_HW = 64


def render_small(env) -> np.ndarray:
    """600x400 rgb_array -> 64x64 uint8. Crop the vertical band that contains
    the track, cart and pole (rows ~80..360 of the 400-row frame) so the
    downsampled pixels spend resolution on the dynamics, not the empty sky."""
    import cv2

    f = env.render()
    f = f[80:360]
    return cv2.resize(f, (FRAME_HW, FRAME_HW), interpolation=cv2.INTER_AREA)


class RenderingCartPoleAdapter(GymnasiumVectorAdapter):
    """State-obs adapter that also renders every observation to a side
    buffer — the expert acts from state while the dataset records pixels."""

    def __init__(self, n_envs=16, max_timesteps=150, seed=0, record=True):
        import gymnasium

        self.envs = [gymnasium.make('CartPole-v1', render_mode='rgb_array')
                     for _ in range(n_envs)]
        self.n_envs = n_envs
        self.max_timesteps = max_timesteps
        self._seed = seed
        self.record = record
        self.frame_log: list[np.ndarray] = []

    def _snap(self):
        if self.record:
            self.frame_log.append(
                np.stack([render_small(e) for e in self.envs]))

    def reset(self, seed=None):
        out = super().reset(seed=seed)
        self.frame_log = []
        self._snap()
        return out

    def step(self, actions):
        out = super().step(actions)
        self._snap()
        return out

    def take_frames(self) -> np.ndarray:
        """(n_envs, steps+1, 64, 64, 3) uint8, aligned so frames[:, t] is the
        observation the agent saw at step t."""
        frames = np.stack(self.frame_log, axis=1)
        self.frame_log = []
        return frames


class PixelCartPoleAdapter:
    """Image-obs adapter for evaluation: obs = {'image': (n, 3, 64, 64)
    float32 in [0, 1]}. Finished envs latch until the batch rollout ends."""

    def __init__(self, n_envs=16, max_timesteps=150, seed=0):
        import gymnasium

        self.envs = [gymnasium.make('CartPole-v1', render_mode='rgb_array')
                     for _ in range(n_envs)]
        self.n_envs = n_envs
        self.max_timesteps = max_timesteps
        self._seed = seed

    def _obs(self):
        frames = np.stack([render_small(e) for e in self.envs])  # (n,h,w,3)
        img = frames.astype(np.float32).transpose(0, 3, 1, 2) / 255.0
        return {'image': img}

    def reset(self, seed=None):
        base = seed if seed is not None else self._seed
        self._seed += self.n_envs
        for i, env in enumerate(self.envs):
            env.reset(seed=base + i)
        self._done = np.zeros((self.n_envs,), bool)
        return self._obs(), {}

    def step(self, actions):
        actions = np.asarray(actions).reshape(self.n_envs)
        rewards = np.zeros((self.n_envs,), np.float32)
        terminated = np.zeros((self.n_envs,), bool)
        truncated = np.zeros((self.n_envs,), bool)
        for i, env in enumerate(self.envs):
            if self._done[i]:
                terminated[i] = True
                continue
            _, r, term, trunc, _ = env.step(int(actions[i]))
            rewards[i] = r
            terminated[i] = term
            truncated[i] = trunc
            self._done[i] |= term or trunc
        return self._obs(), rewards, terminated, truncated, {}


# --------------------------------------------------------------------- main

def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--workdir', type=str, default='/tmp/cartpole_pixels')
    p.add_argument('--target-return', type=float, default=70.0)
    p.add_argument('--max-timesteps', type=int, default=150)
    p.add_argument('--n-envs', type=int, default=16)
    # phase 1
    p.add_argument('--expert-iterations', type=int, default=60)
    p.add_argument('--expert-target', type=float, default=80.0)
    p.add_argument('--expert-extend', action='store_true',
                   help='when an expert checkpoint exists, keep training it '
                        'toward --expert-target instead of using it as-is. '
                        'The offline state-vector gate was solved with an '
                        '~80-return expert dataset; a weaker expert caps the '
                        'world model (and thus the dream policy) below the '
                        'gate.')
    # phase 2
    p.add_argument('--batches-expert', type=int, default=30)
    p.add_argument('--batches-random', type=int, default=30)
    # phase 3
    p.add_argument('--tok-steps', type=int, default=4000)
    p.add_argument('--tok-lr', type=float, default=3e-4)
    p.add_argument('--tok-batch', type=int, default=8)
    p.add_argument('--tok-clip-t', type=int, default=8)
    # phase 5
    p.add_argument('--wm-steps', type=int, default=4000)
    p.add_argument('--wm-lr', type=float, default=3e-4)
    p.add_argument('--terminal-pos-weight', type=float, default=30.0)
    p.add_argument('--latched-terminal-frames', type=int, default=6,
                   help='post-termination latched frames (fallen pole, '
                        'reward 0) included in WM training; see the wm_lens '
                        'comment')
    # phase 6 (the proven offline dream-RL hyperparameters)
    p.add_argument('--dream-updates', type=int, default=3000)
    p.add_argument('--dream-batch', type=int, default=128)
    p.add_argument('--dream-timesteps', type=int, default=25)
    p.add_argument('--num-denoise-steps', type=int, default=4)
    p.add_argument('--prompt-len', type=int, default=3)
    p.add_argument('--ppo-epochs', type=int, default=2)
    p.add_argument('--policy-lr', type=float, default=6e-4)
    p.add_argument('--value-lr', type=float, default=6e-4)
    # 0.01 matches the solved ONLINE recipe (train_cartpole_dream_rl.py);
    # 0.001 collapsed to H~0.2 by update ~2500 in the first pixel run, so the
    # online rounds collected near-deterministic data and stopped climbing
    p.add_argument('--entropy-weight', type=float, default=0.01)
    p.add_argument('--eval-every', type=int, default=25)
    p.add_argument('--window', type=int, default=3)
    # phase 7: iterated online rounds — the full Dreamer recipe. The offline
    # dataset bounds what the world model knows; when the dream-trained
    # policy plateaus at the dataset's support, collect fresh rollouts WITH
    # the current policy (acting only — every policy-gradient update stays
    # inside imagination), fine-tune the world model on the extended dataset,
    # and keep dreaming (reference online loop,
    # `train_cartpole_with_dynamics_rl.py:427-560`).
    p.add_argument('--online-rounds', type=int, default=0)
    p.add_argument('--online-collect-batches', type=int, default=8)
    p.add_argument('--online-wm-steps', type=int, default=1500)
    p.add_argument('--online-dream-updates', type=int, default=600)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--cpu', action='store_true', help='run every phase on CPU')
    p.add_argument('--env-device', choices=('cpu', 'accel'), default='cpu',
                   help='device for the env-stepping phases (1, 2, 6). The '
                        'default keeps them on the host CPU; "accel" runs the '
                        'per-frame policy steps on the accelerator (slower '
                        'per step over this tunnel, but reproduces the '
                        'committed online-gate trajectories, which were '
                        'measured on the TPU backend)')
    p.add_argument('--stop-after', choices=('expert', 'dataset', 'tokenizer',
                                            'tokenize', 'wm'), default=None,
                   help='exit after this phase (stage the pipeline across '
                        'processes so the TPU backend — exclusive on this '
                        'runtime — is held only during the training phases)')
    p.add_argument('--smoke', action='store_true',
                   help='tiny end-to-end pipeline check (minutes, no gate)')
    args = p.parse_args(argv)

    if args.smoke:
        args.n_envs, args.max_timesteps = 4, 20
        args.expert_iterations, args.expert_target = 2, 1e9
        args.batches_expert = args.batches_random = 2
        args.tok_steps, args.tok_clip_t, args.tok_batch = 20, 4, 4
        args.wm_steps = 20
        args.dream_updates, args.dream_timesteps = 4, 8
        args.dream_batch, args.eval_every, args.window = 8, 2, 1

    import jax

    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    # No persistent compilation cache for CPU-forced runs: XLA:CPU AOT
    # entries fail the host-feature check even on the machine that wrote
    # them (the compile feature string carries pseudo-features like
    # +prefer-no-scatter that never appear in the host feature list), and
    # every failed per-entry load leaks LLVM section memory until the
    # process aborts (observed: crash after ~20 minutes of env phases).
    # TPU executables have no such check, so accelerator stages keep a
    # machine-local cache to make stage restarts cheap.
    if not args.cpu:
        jax.config.update('jax_compilation_cache_dir',
                          str(Path(args.workdir).parent / 'jax_cache_local'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import jax.numpy as jnp
    import optax

    from dreamer4_tpu.envs.interact import EnvInteractor
    from dreamer4_tpu.models.tokenizer import VideoTokenizer
    from dreamer4_tpu.models.world_model import DynamicsWorldModel
    from dreamer4_tpu.train.checkpoint import load_model, save_model
    from dreamer4_tpu.train.optim import muon_adam_atan2
    from dreamer4_tpu.train.trainers import (DreamTrainer, SimTrainer,
                                             TokenizerTrainer, TrainState,
                                             make_world_model_train_step,
                                             rl_param_labels)

    cpu0 = jax.devices('cpu')[0]
    accel = jax.devices()[0]  # TPU under axon, else CPU
    if args.env_device == 'accel':
        cpu0 = accel
    log(f'devices: env/RL phases on {cpu0}, training phases on {accel}')

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    T_fixed = args.max_timesteps + 1
    N_LAT, D_LAT = 4, 16

    def build_state_model():
        """The proven state-vector recipe (train_cartpole_offline_dream_rl)."""
        return DynamicsWorldModel(
            dim=64, dim_latent=D_LAT, num_latent_tokens=N_LAT,
            num_spatial_tokens=4, max_steps=16, depth=2, time_block_every=2,
            attn_heads=4, attn_dim_head=16, num_discrete_actions=(2,),
            multi_token_pred_len=4, num_register_tokens=4,
            dim_state=4, dim_critic_state=4, predict_terminals=True,
            policy_entropy_weight=0.01, keep_reward_ema_stats=True,
            reward_range=(-args.max_timesteps * 1.2, args.max_timesteps * 1.2))

    def build_pixel_model():
        """Same trunk, but latents come from the tokenizer: no state input,
        no asymmetric critic (pure pixels), action injection on so dreams are
        action-sensitive (the round-2 root-cause fix)."""
        return DynamicsWorldModel(
            dim=64, dim_latent=D_LAT, num_latent_tokens=N_LAT,
            num_spatial_tokens=4, max_steps=16, depth=2, time_block_every=2,
            attn_heads=4, attn_dim_head=16, num_discrete_actions=(2,),
            multi_token_pred_len=4, num_register_tokens=4,
            dim_state=None, dim_critic_state=None, predict_terminals=True,
            add_action_embed_to_spatial=True,
            # ~1/positive-rate: without it the terminal head converges to
            # the base rate (p_term 0.033 at TRUE terminal frames), dreams
            # never fail, the dream value saturates at the horizon ceiling,
            # and the policy plateaus at ~35 real return (measured; see
            # terminal_pos_weight in models/world_model.py)
            terminal_pos_weight=args.terminal_pos_weight,
            policy_entropy_weight=args.entropy_weight,
            keep_reward_ema_stats=True,
            reward_range=(-args.max_timesteps * 1.2, args.max_timesteps * 1.2))

    def init_wm_variables(model, seed):
        latents0 = jnp.zeros((1, 4, N_LAT, D_LAT))
        rngs = {'params': jax.random.PRNGKey(seed),
                'sample': jax.random.PRNGKey(seed + 1)}
        return model.init(rngs, latents=latents0, shortcut_train=False,
                          rewards=jnp.zeros((1, 4)),
                          terminals=jnp.zeros((1,), bool),
                          discrete_actions=jnp.zeros((1, 3, 1), jnp.int32))

    # ------------------------------------------------------ 1. expert (cpu)
    expert_dir = work / 'expert_ckpt'
    with jax.default_device(cpu0):
        expert_model = build_state_model()
        expert_variables = None
        if (expert_dir / 'config.json').exists():
            expert_model, expert_variables = load_model(expert_dir, DynamicsWorldModel)
            log(f'[expert] loaded checkpoint from {expert_dir}')
        if expert_variables is None or args.expert_extend:
            env = RenderingCartPoleAdapter(
                n_envs=args.n_envs, max_timesteps=args.max_timesteps,
                seed=args.seed, record=False)
            expert_vars = (expert_variables if expert_variables is not None
                           else init_wm_variables(expert_model, args.seed))
            sim = SimTrainer(expert_model, expert_vars, env, policy_lr=3e-4,
                             value_lr=3e-4, num_steps=args.num_denoise_steps,
                             max_timesteps=args.max_timesteps, update_epochs=4,
                             dynamics_lr=1e-4)
            key = jax.random.PRNGKey(args.seed)

            # held-out verification: the in-training 20-episode window is a
            # noisy overestimate while the policy is still moving (measured:
            # window 82.1 at the stop iteration, but the SAME policy
            # collected only 53.8 afterwards). Only stop once a no-update
            # eval on a fresh env seed confirms the target — the dataset
            # quality is what bounds the downstream dream policy.
            eval_interactor = EnvInteractor(expert_model)

            def held_out_eval(variables, it):
                env_eval = RenderingCartPoleAdapter(
                    n_envs=args.n_envs, max_timesteps=args.max_timesteps,
                    seed=args.seed + 777 + it, record=False)
                rets: list[float] = []
                for bi in range(2):
                    exp = eval_interactor(
                        variables, env_eval,
                        jax.random.fold_in(jax.random.PRNGKey(args.seed + 555), 100 * it + bi),
                        num_steps=args.num_denoise_steps,
                        max_timesteps=args.max_timesteps)
                    rets.extend(np.asarray(exp.episode_return).tolist())
                return float(np.mean(rets))

            # PPO on CartPole oscillates (windows can swing 30..85 between
            # iterations), so "params at the stop iteration" is an arbitrary
            # draw. Keep the BEST held-out-evaluated policy seen and save
            # that — the dataset quality bounds everything downstream.
            best_ev, best_params = -np.inf, None
            returns: list[float] = []
            for it in range(args.expert_iterations):
                experience, _ = sim.step(jax.random.fold_in(key, it))
                returns.extend(np.asarray(experience.episode_return).tolist())
                window = returns[-20:]
                avg = float(np.mean(window))
                if it % 5 == 0:
                    log(f'[expert] iter {it}: avg return {avg:.1f}')
                if len(window) >= 20 and avg >= args.expert_target:
                    ev = held_out_eval(sim.variables, it)
                    log(f'[expert] window {avg:.1f} at iter {it}; held-out '
                        f'eval {ev:.1f} (target {args.expert_target}, '
                        f'best so far {best_ev:.1f})')
                    if ev > best_ev:
                        best_ev = ev
                        best_params = jax.tree.map(np.asarray, sim.variables)
                    if ev >= args.expert_target:
                        break
            if best_params is not None:
                log(f'[expert] using best held-out policy ({best_ev:.1f})')
                expert_variables = jax.tree.map(jnp.asarray, best_params)
            else:
                expert_variables = sim.variables
            save_model(expert_dir, expert_model, expert_variables)
            log(f'[expert] saved checkpoint to {expert_dir}')
    if args.stop_after == 'expert':
        log('[stage] stop-after expert')
        return 0

    # ------------------------------------------- 2. pixel dataset (cpu)
    frames_cache = work / 'frames_dataset.npz'
    if not frames_cache.exists():
        with jax.default_device(cpu0):
            env = RenderingCartPoleAdapter(
                n_envs=args.n_envs, max_timesteps=args.max_timesteps,
                seed=args.seed + 1000, record=True)
            random_model = build_pixel_model()
            # the random collector acts through the fresh state-model policy
            # (= random at init), like the offline example's random phase
            rand_state_model = build_state_model()
            rand_vars = init_wm_variables(rand_state_model, args.seed + 5)

            items: list[dict] = []

            def collect(model, variables, n_batches, tag, key0):
                interactor = EnvInteractor(model)
                eps_returns = []
                for bi in range(n_batches):
                    exp = interactor(variables, env, jax.random.fold_in(key0, bi),
                                     num_steps=args.num_denoise_steps,
                                     max_timesteps=args.max_timesteps)
                    frames = env.take_frames()  # (n, steps+1, 64, 64, 3) u8
                    pad = T_fixed - frames.shape[1]
                    if pad > 0:
                        frames = np.pad(frames, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
                    frames = frames[:, :T_fixed]

                    def pad_t(x):
                        p_ = T_fixed - x.shape[1]
                        if p_ <= 0:
                            return np.asarray(x)[:, :T_fixed]
                        w = [(0, 0)] * x.ndim
                        w[1] = (0, p_)
                        return np.pad(np.asarray(x), w)

                    items.append(dict(
                        frames=frames,
                        rewards=pad_t(np.asarray(exp.rewards)),
                        terminals=np.asarray(exp.terminals),
                        discrete_actions=pad_t(np.asarray(exp.actions.discrete)),
                        lens=np.asarray(exp.lens)))
                    eps_returns.extend(np.asarray(exp.episode_return).tolist())
                log(f'[dataset] {tag}: {n_batches * args.n_envs} episodes, '
                    f'avg return {np.mean(eps_returns):.1f}')

            collect(expert_model, expert_variables, args.batches_expert,
                    'expert', jax.random.PRNGKey(args.seed + 100))
            collect(rand_state_model, rand_vars, args.batches_random,
                    'random', jax.random.PRNGKey(args.seed + 200))

        np.savez_compressed(
            frames_cache, n_items=len(items),
            **{f'{k}_{i}': item[k] for i, item in enumerate(items) for k in item})
        log(f'[dataset] cached {len(items)} batches to {frames_cache}')

    if args.stop_after == 'dataset':
        log('[stage] stop-after dataset')
        return 0

    blob = np.load(frames_cache)
    n_items = int(blob['n_items'])
    keys = ('frames', 'rewards', 'terminals', 'discrete_actions', 'lens')
    items = [{k: blob[f'{k}_{i}'] for k in keys} for i in range(n_items)]
    all_lens = np.concatenate([it['lens'] for it in items])
    log(f'[dataset] {n_items} batches, {len(all_lens)} episodes, '
        f'mean len {all_lens.mean():.1f}, frames '
        f'{sum(int(l) for l in all_lens)}')

    # WM-training lens: include the latched POST-termination frames. The env
    # adapter latches a finished env's render, so frames[lens..] show the
    # fallen pole with reward 0 — but with lens as-is every loss masks them
    # out, and the world model learns "+1 reward forever" from episodes
    # whose every VISIBLE frame paid +1. Dreams then pay out the full
    # horizon for any policy (measured: dream value saturated at the
    # 25-step ceiling for good and bad policies alike, real eval stuck at
    # ~35). Extending terminated episodes by a few latched frames teaches
    # the reward head fallen->0 and the flow model that fallen is
    # absorbing, which is what makes imagined failure costly. Prompting and
    # tokenizer clips keep the ORIGINAL lens (don't start dreams inside a
    # fallen state).
    for it in items:
        avail = int(it['lens'].max()) + 1          # snaps recorded per row
        ext = np.minimum(it['lens'] + args.latched_terminal_frames,
                         min(avail, T_fixed))
        it['wm_lens'] = np.where(it['terminals'], ext, it['lens'])

    rng = np.random.default_rng(args.seed)

    # --------------------------------------------- 3. tokenizer (accel)
    # Mirrors the reference pixel-CartPole tokenizer
    # (`train_cartpole_with_dynamics_rl.py:173-190`): 64x64 RGB, patch 8,
    # causal conv3d + shifted patch tokenization, 2 flow decode steps, no
    # LPIPS; sized to the proven WM latent space (4 tokens x 16 dims).
    tokenizer = VideoTokenizer(
        dim=64, dim_latent=D_LAT, patch_size=8, image_height=FRAME_HW,
        image_width=FRAME_HW, channels=3, num_latent_tokens=N_LAT,
        encoder_depth=3, decoder_depth=3, time_block_every=2,
        attn_heads=4, attn_dim_head=16, decoder_flow_steps=2,
        use_causal_conv3d=True, use_shifted_patch_tokenization=True,
        lpips_loss_weight=0.0)

    tok_dir = work / 'tokenizer_ckpt'
    # valid (item, row, start) index for clip sampling
    clip_index = []
    for ii, it in enumerate(items):
        for r, ln in enumerate(it['lens']):
            n_frames = min(int(ln), T_fixed)
            for s in range(0, max(n_frames - args.tok_clip_t, 0) + 1):
                clip_index.append((ii, r, s))
    clip_index = np.asarray(clip_index, np.int64)
    log(f'[tokenizer] {len(clip_index)} clips of T={args.tok_clip_t}')

    def sample_clips(batch):
        rows = clip_index[rng.integers(0, len(clip_index), size=batch)]
        clips = np.stack([
            items[ii]['frames'][r, s:s + args.tok_clip_t] for ii, r, s in rows])
        # (b, t, h, w, c) u8 -> (b, c, t, h, w) f32 in [0, 1]
        return clips.astype(np.float32).transpose(0, 4, 1, 2, 3) / 255.0

    if (tok_dir / 'config.json').exists():
        tokenizer, tok_ema_vars = load_model(tok_dir, VideoTokenizer)
        log(f'[tokenizer] loaded checkpoint from {tok_dir}')
    else:
        video0 = jnp.asarray(sample_clips(2))
        tok_vars = tokenizer.init({'params': jax.random.PRNGKey(args.seed + 21),
                                   'sample': jax.random.PRNGKey(args.seed + 22)},
                                  video0)
        trainer = TokenizerTrainer(tokenizer, tok_vars, learning_rate=args.tok_lr,
                                   with_ema=True, seed=args.seed)
        for step in range(args.tok_steps):
            video = jnp.asarray(sample_clips(args.tok_batch))
            loss, _ = trainer.train_on_batch(video)
            if step % 500 == 0 or step == args.tok_steps - 1:
                log(f'[tokenizer] step {step}: loss {float(loss):.4f}')
        tok_ema_vars = {'params': trainer.ts.ema_params, 'state': trainer.ts.state}
        save_model(tok_dir, tokenizer, tok_ema_vars)
        log(f'[tokenizer] saved EMA checkpoint to {tok_dir}')

        # reconstruction sample for the evidence record
        try:
            import cv2

            sample = jnp.asarray(sample_clips(1))
            lat = tokenizer.apply(tok_ema_vars, sample, return_latents=True)
            recon = tokenizer.apply(tok_ema_vars, lat, method=tokenizer.decode,
                                    rngs={'sample': jax.random.PRNGKey(0)})
            orig = np.asarray(sample[0]).transpose(1, 2, 3, 0)    # (t,h,w,c)
            rec = np.asarray(recon[0]).transpose(1, 2, 3, 0)
            grid = np.concatenate([
                np.concatenate(list(orig), axis=1),
                np.concatenate(list(np.clip(rec, 0, 1)), axis=1)], axis=0)
            cv2.imwrite(str(work / 'tokenizer_recon.png'),
                        (grid[..., ::-1] * 255).astype(np.uint8))
            log(f'[tokenizer] recon grid -> {work / "tokenizer_recon.png"}')
        except Exception as e:  # evidence only — never fail the run
            log(f'[tokenizer] recon grid failed: {e}')

    if args.stop_after == 'tokenizer':
        log('[stage] stop-after tokenizer')
        return 0

    # --------------------------------------------- 4. tokenize (accel)
    latents_cache = work / 'latents_dataset.npz'
    if not latents_cache.exists():
        encode_fn = jax.jit(lambda tv, video: tokenizer.apply(
            tv, video, return_latents=True))
        lat_items = []
        for ii, it in enumerate(items):
            video = jnp.asarray(
                it['frames'].astype(np.float32).transpose(0, 4, 1, 2, 3) / 255.0)
            lat = np.asarray(encode_fn(tok_ema_vars, video), np.float32)
            lat_items.append(lat)
            if ii % 10 == 0:
                log(f'[tokenize] batch {ii}/{n_items}')
        np.savez_compressed(latents_cache,
                            **{f'latents_{i}': lt for i, lt in enumerate(lat_items)})
        log(f'[tokenize] cached latents to {latents_cache}')
    lat_blob = np.load(latents_cache)
    for i, it in enumerate(items):
        it['latents'] = lat_blob[f'latents_{i}']
    log(f'[tokenize] latents ready: {items[0]["latents"].shape} per batch, '
        f'std {np.concatenate([i_["latents"] for i_ in items]).std():.3f}')

    if args.stop_after == 'tokenize':
        log('[stage] stop-after tokenize')
        return 0

    # --------------------------------------------- 5. world model (accel)
    model = build_pixel_model()
    wm_dir = work / 'wm_ckpt'
    if (wm_dir / 'config.json').exists():
        model, frozen_vars = load_model(wm_dir, DynamicsWorldModel)
        # RL-phase hyperparameters live on the model config but must track
        # the FLAGS, not the checkpoint: --entropy-weight on a resumed run
        # was silently ignored (the round-4 entropy-collapse debug loop)
        model = model.clone(policy_entropy_weight=args.entropy_weight,
                            terminal_pos_weight=args.terminal_pos_weight)
        log(f'[wm] loaded checkpoint from {wm_dir} '
            f'(entropy weight {args.entropy_weight}, terminal pos weight '
            f'{args.terminal_pos_weight})')
    else:
        variables = init_wm_variables(model, args.seed)
        base_tx = muon_adam_atan2(learning_rate=args.wm_lr, clip_grad_norm=1.0)
        wm_tx = optax.multi_transform(
            {'frozen': base_tx, 'policy': optax.set_to_zero(),
             'value': optax.set_to_zero()},
            lambda params: rl_param_labels(params, model))
        wm_step = make_world_model_train_step(model, wm_tx)
        wm_ts = TrainState(params=variables['params'],
                           state=variables.get('state', {}),
                           opt_state=wm_tx.init(variables['params']),
                           ema_params=None, step=jnp.zeros((), jnp.int32))

        def sample_wm_batch():
            it = items[rng.integers(n_items)]
            return dict(latents=jnp.asarray(it['latents']),
                        rewards=jnp.asarray(it['rewards']),
                        terminals=jnp.asarray(it['terminals']),
                        discrete_actions=jnp.asarray(it['discrete_actions']),
                        lens=jnp.asarray(it['wm_lens']))

        wm_key = jax.random.PRNGKey(args.seed + 7)
        for step in range(args.wm_steps):
            wm_key, sub = jax.random.split(wm_key)
            shortcut = bool(rng.random() < model.prob_shortcut_train)
            wm_ts, wm_loss, _ = wm_step(wm_ts, sample_wm_batch(), sub,
                                        shortcut_train=shortcut)
            if step % 500 == 0 or step == args.wm_steps - 1:
                log(f'[wm] step {step}: loss {float(wm_loss):.3f}')
        frozen_vars = {'params': wm_ts.params, 'state': wm_ts.state}
        save_model(wm_dir, model, frozen_vars)
        log(f'[wm] saved checkpoint to {wm_dir}')

    if args.stop_after == 'wm':
        log('[stage] stop-after wm')
        return 0

    # ------------------------------- 6 + 7. dream RL + eval (+online rounds)
    def pad_item_t(x, t_axis=1):
        p_ = T_fixed - x.shape[t_axis]
        if p_ <= 0:
            return np.asarray(x)[tuple(slice(None) if a != t_axis else slice(T_fixed)
                                       for a in range(x.ndim))]
        w = [(0, 0)] * x.ndim
        w[t_axis] = (0, p_)
        return np.pad(np.asarray(x), w)

    fresh_items: list[dict] = []  # on-policy rounds, upweighted in fine-tuning

    with jax.default_device(cpu0):
        frozen_vars = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), frozen_vars)
        tok_ema_cpu = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), tok_ema_vars)

        def prompt_fn(key_):
            # on-policy rounds are prompt-relevant: draw from them half the
            # time once they exist
            pool = (fresh_items if fresh_items and rng.random() < 0.5 else items)
            it = pool[rng.integers(len(pool))]
            b = args.dream_batch
            ok = np.nonzero(it['lens'] >= args.prompt_len + 1)[0]
            if len(ok) == 0:
                ok = np.arange(it['latents'].shape[0])
            rows = ok[rng.integers(0, len(ok), size=b)]
            lens = it['lens'][rows]
            starts = (rng.random(b) * np.maximum(lens - args.prompt_len - 1, 1)).astype(int)
            idx_t = starts[:, None] + np.arange(args.prompt_len)[None]
            return dict(
                prompt_latents=jnp.asarray(it['latents'][rows[:, None], idx_t]),
                prompt_discrete_actions=jnp.asarray(
                    it['discrete_actions'][rows[:, None], idx_t]),
                prompt_rewards=jnp.asarray(it['rewards'][rows[:, None], idx_t]))

        dream_trainer = DreamTrainer(
            model, frozen_vars,
            time_steps=args.dream_timesteps, num_steps=args.num_denoise_steps,
            batch_size=args.dream_batch, objective='ppo',
            policy_lr=args.policy_lr, value_lr=args.value_lr,
            update_epochs=args.ppo_epochs, prompt_fn=prompt_fn,
            generate_kwargs=dict(hard_terminals=False))

        eval_env = PixelCartPoleAdapter(n_envs=args.n_envs,
                                        max_timesteps=args.max_timesteps,
                                        seed=args.seed + 9000)
        interactor = EnvInteractor(model, tokenizer=tokenizer)

    eval_history: list[float] = []
    dkey = jax.random.PRNGKey(args.seed + 31)
    update_no = 0

    def dream_phase(budget: int) -> bool:
        nonlocal update_no
        with jax.default_device(cpu0):
            for _ in range(budget):
                update_no += 1
                _, out = dream_trainer.step(jax.random.fold_in(dkey, update_no))
                if update_no % args.eval_every == 0:
                    exp = interactor(dream_trainer.variables, eval_env,
                                     jax.random.fold_in(dkey, 10_000_000 + update_no),
                                     tokenizer_variables=tok_ema_cpu,
                                     num_steps=args.num_denoise_steps,
                                     max_timesteps=args.max_timesteps)
                    ret = float(np.mean(np.asarray(exp.episode_return)))
                    eval_history.append(ret)
                    window = eval_history[-args.window:]
                    avg = float(np.mean(window))
                    log(f'[dream] update {update_no}: PIXEL eval return {ret:.1f} '
                        f'(window {avg:.1f}) H {float(out.stats["entropy"]):.2f} '
                        f'V {float(out.stats["mean_value"]):.1f}')
                    (work / 'eval_history.json').write_text(json.dumps(eval_history))
                    if len(window) >= args.window and avg >= args.target_return:
                        log(f'SOLVED FROM PIXELS IN IMAGINATION after {update_no} '
                            f'dream updates: eval return {avg:.1f} >= '
                            f'{args.target_return} (zero real-env policy updates; '
                            f'observations reach the policy only through the '
                            f'VideoTokenizer)')
                        return True
        return False

    if dream_phase(args.dream_updates):
        return 0

    # ---- phase 7: iterated rounds (policy acts in the real env to collect;
    # ALL policy/value updates remain on imagined experience)
    for rnd in range(1, args.online_rounds + 1):
        with jax.default_device(cpu0):
            collect_env = PixelCartPoleAdapter(
                n_envs=args.n_envs, max_timesteps=args.max_timesteps,
                seed=args.seed + 20_000 * rnd)
            rets = []
            for bi in range(args.online_collect_batches):
                exp = interactor(dream_trainer.variables, collect_env,
                                 jax.random.fold_in(dkey, 20_000_000 + 1000 * rnd + bi),
                                 tokenizer_variables=tok_ema_cpu,
                                 num_steps=args.num_denoise_steps,
                                 max_timesteps=args.max_timesteps)
                # streaming tokenizer latents ARE the dataset latents (the
                # parallel==streaming encode parity is tested)
                fresh_items.append(dict(
                    latents=pad_item_t(exp.latents),
                    rewards=pad_item_t(exp.rewards),
                    terminals=np.asarray(exp.terminals),
                    discrete_actions=pad_item_t(exp.actions.discrete),
                    lens=np.asarray(exp.lens)))
                rets.extend(np.asarray(exp.episode_return).tolist())
            log(f'[online {rnd}] collected {args.online_collect_batches * args.n_envs} '
                f'episodes with the dream policy, avg return {np.mean(rets):.1f}')

        # WM fine-tune on the extended dataset (accel), heads frozen; the
        # trunk continues from its current weights
        base_tx = muon_adam_atan2(learning_rate=args.wm_lr, clip_grad_norm=1.0)
        ft_tx = optax.multi_transform(
            {'frozen': base_tx, 'policy': optax.set_to_zero(),
             'value': optax.set_to_zero()},
            lambda params: rl_param_labels(params, model))
        ft_step = make_world_model_train_step(model, ft_tx)
        ft_params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                                 dream_trainer.rl_state.params)
        ft_state = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                                dream_trainer.state_collection)
        ft_ts = TrainState(params=ft_params, state=ft_state,
                           opt_state=ft_tx.init(ft_params),
                           ema_params=None, step=jnp.zeros((), jnp.int32))

        def sample_ft_batch():
            pool = fresh_items if rng.random() < 0.5 else items
            it = pool[rng.integers(len(pool))]
            # fresh (interactor-collected) items have no latched frames ->
            # no 'wm_lens'; fall back to lens
            return dict(latents=jnp.asarray(it['latents']),
                        rewards=jnp.asarray(it['rewards']),
                        terminals=jnp.asarray(it['terminals']),
                        discrete_actions=jnp.asarray(it['discrete_actions']),
                        lens=jnp.asarray(it.get('wm_lens', it['lens'])))

        ft_key = jax.random.PRNGKey(args.seed + 900 + rnd)
        for step in range(args.online_wm_steps):
            ft_key, sub = jax.random.split(ft_key)
            shortcut = bool(rng.random() < model.prob_shortcut_train)
            ft_ts, ft_loss, _ = ft_step(ft_ts, sample_ft_batch(), sub,
                                        shortcut_train=shortcut)
            if step % 500 == 0 or step == args.online_wm_steps - 1:
                log(f'[online {rnd}] wm fine-tune step {step}: loss {float(ft_loss):.3f}')

        with jax.default_device(cpu0):
            new_params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), ft_ts.params)
            new_state = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), ft_ts.state)
            dream_trainer.rl_state = dream_trainer.rl_state._replace(params=new_params)
            dream_trainer.state_collection = new_state

        if dream_phase(args.online_dream_updates):
            return 0

    final = float(np.mean(eval_history[-args.window:])) if eval_history else 0.0
    log(f'final pixel-dream eval avg {final:.1f} (random baseline ~22)')
    return 1


if __name__ == '__main__':
    sys.exit(main())
