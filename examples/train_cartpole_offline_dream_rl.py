"""CartPole policy learned PURELY IN IMAGINATION from OFFLINE data.

The Dreamer-4 paper's headline setting ("Training Agents Inside of Scalable
World Models"): learn a world model from a FIXED offline dataset, then train
the policy entirely inside it — zero real-environment policy updates.

Four phases:
  1. ONLINE expert: the proven SimTrainer recipe runs until the reference
     gate (avg return >= 70) to obtain an expert policy (this phase only
     exists to MAKE the offline dataset, as the paper uses human/VPT data).
  2. DATASET: mixed expert + random rollouts are collected once. Both use
     the same (untrained, frozen) `state_to_latents` projection, so the
     latents live in one consistent space.
  3. OFFLINE WM: a world model is trained from init on that fixed dataset
     (policy/value heads frozen).
  4. DREAM RL: a fresh policy/value head pair is optimized with PPO on
     imagination rollouts of the frozen WM only. The real env is used
     strictly for EVALUATION.

Success = eval return >= --target-return with zero real-env policy updates
after phase 1's dataset collection.

Usage: python examples/train_cartpole_offline_dream_rl.py
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from train_cartpole_with_dynamics_rl import GymnasiumVectorAdapter


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--target-return', type=float, default=70.0)
    p.add_argument('--max-timesteps', type=int, default=150)
    p.add_argument('--n-envs', type=int, default=16)
    p.add_argument('--expert-iterations', type=int, default=60)
    p.add_argument('--expert-target', type=float, default=80.0)
    p.add_argument('--dataset-batches-expert', type=int, default=40)
    p.add_argument('--dataset-batches-random', type=int, default=40)
    p.add_argument('--wm-steps', type=int, default=4000)
    p.add_argument('--wm-lr', type=float, default=3e-4)
    p.add_argument('--wm-batch', type=int, default=16)
    p.add_argument('--dream-updates', type=int, default=3000)
    p.add_argument('--dream-batch', type=int, default=128)
    p.add_argument('--dream-timesteps', type=int, default=25)
    p.add_argument('--num-denoise-steps', type=int, default=4)
    p.add_argument('--prompt-len', type=int, default=3)
    p.add_argument('--ppo-epochs', type=int, default=2)
    p.add_argument('--policy-lr', type=float, default=6e-4)
    p.add_argument('--value-lr', type=float, default=6e-4)
    p.add_argument('--entropy-weight', type=float, default=0.001)
    p.add_argument('--eval-every', type=int, default=25,
                   help='dream updates between real-env evaluations')
    p.add_argument('--window', type=int, default=3,
                   help='eval rounds averaged for the success check '
                        '(each round is n_envs episodes)')
    p.add_argument('--expert-checkpoint', type=str, default='',
                   help='save the phase-1 expert here / reuse it on restart')
    p.add_argument('--dataset-cache', type=str, default='',
                   help='save the collected offline dataset here (.npz) / '
                        'reuse it on restart')
    p.add_argument('--collect-only', action='store_true',
                   help='run phases 1-2 (expert + dataset), write the caches, '
                        'and exit — lets collection run on CPU while the TPU '
                        'is busy/unavailable')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    else:
        # TPU-only: XLA:CPU AOT cache entries fail their own machine-feature
        # check on reload and leak LLVM memory (see perf notes, known-bad)
        jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import jax.numpy as jnp
    import optax

    from dreamer4_tpu.envs.interact import EnvInteractor
    from dreamer4_tpu.models.world_model import DynamicsWorldModel
    from dreamer4_tpu.train.optim import muon_adam_atan2
    from dreamer4_tpu.train.trainers import (DreamTrainer, SimTrainer, TrainState,
                                             make_world_model_train_step,
                                             rl_param_labels)

    env = GymnasiumVectorAdapter(n_envs=args.n_envs,
                                 max_timesteps=args.max_timesteps, seed=args.seed)

    def build_model(entropy_weight, action_inject):
        # the ONLINE expert uses the proven round-1 recipe exactly (no
        # action injection — it changes what the agent embeds encode and
        # measurably slows online policy learning); the OFFLINE WM turns
        # injection on for action-sensitive dreams
        return DynamicsWorldModel(
            dim=64, dim_latent=16, num_latent_tokens=4, num_spatial_tokens=4,
            max_steps=16, depth=2, time_block_every=2, attn_heads=4,
            attn_dim_head=16, num_discrete_actions=(env.num_actions,),
            multi_token_pred_len=4, num_register_tokens=4,
            dim_state=env.dim_state, dim_critic_state=env.dim_state,
            predict_terminals=True, add_action_embed_to_spatial=action_inject,
            policy_entropy_weight=entropy_weight, keep_reward_ema_stats=True,
            reward_range=(-args.max_timesteps * 1.2, args.max_timesteps * 1.2))

    def init_variables(model):
        latents0 = jnp.zeros((1, 4, 4, 16))
        rngs = {'params': jax.random.PRNGKey(args.seed),
                'sample': jax.random.PRNGKey(args.seed + 1)}
        return model.init(rngs, latents=latents0, shortcut_train=False,
                          rewards=jnp.zeros((1, 4)),
                          terminals=jnp.zeros((1,), bool),
                          discrete_actions=jnp.zeros((1, 3, 1), jnp.int32))

    t0 = time.time()

    # ------------------------------------------------ 1. online expert
    expert_model = build_model(0.01, action_inject=False)
    ckpt_dir = Path(args.expert_checkpoint) if args.expert_checkpoint else None
    if ckpt_dir is not None and (ckpt_dir / 'config.json').exists():
        from dreamer4_tpu.train.checkpoint import load_model
        expert_model, expert_variables = load_model(ckpt_dir, DynamicsWorldModel)
        print(f'[expert] loaded checkpoint from {ckpt_dir}', flush=True)
    else:
        expert_vars = init_variables(expert_model)
        sim = SimTrainer(expert_model, expert_vars, env, policy_lr=3e-4,
                         value_lr=3e-4, num_steps=args.num_denoise_steps,
                         max_timesteps=args.max_timesteps, update_epochs=4,
                         dynamics_lr=1e-4)  # the proven online-recipe settings
        key = jax.random.PRNGKey(args.seed)
        returns: list[float] = []
        for it in range(args.expert_iterations):
            experience, _ = sim.step(jax.random.fold_in(key, it))
            returns.extend(np.asarray(experience.episode_return).tolist())
            window = returns[-20:]
            avg = float(np.mean(window))
            if it % 5 == 0:
                print(f'[expert] iter {it}: avg return {avg:.1f} '
                      f'[{time.time()-t0:.0f}s]', flush=True)
            if len(window) >= 20 and avg >= args.expert_target:
                print(f'[expert] reached {avg:.1f} at iter {it}', flush=True)
                break
        expert_variables = sim.variables
        if ckpt_dir is not None:
            from dreamer4_tpu.train.checkpoint import save_model
            save_model(ckpt_dir, expert_model, expert_variables)
            print(f'[expert] saved checkpoint to {ckpt_dir}', flush=True)

    # ------------------------------------------------ 2. offline dataset
    # fresh model, SAME init seed: the (untrained) state_to_latents
    # projection is identical, so expert- and random-collected latents live
    # in the new WM's own latent space
    model = build_model(args.entropy_weight, action_inject=True)
    variables = init_variables(model)
    # graft the expert's (untrained, frozen) state->latents projection into
    # the fresh WM so every collector writes latents in the SAME space —
    # the projection receives no gradients anywhere (observations are
    # encoded host-side; latents enter training as data)
    params = dict(variables['params'])
    params['state_to_latents'] = jax.tree.map(
        jnp.array, expert_variables['params']['state_to_latents'])
    variables = {**variables, 'params': params}

    interactor = EnvInteractor(model)
    T_fixed = args.max_timesteps + 1
    replay: list[dict] = []
    rng = np.random.default_rng(args.seed)

    def pad_t(x, t_axis=1):
        pad = T_fixed - x.shape[t_axis]
        if pad <= 0:
            return x[tuple(slice(None) if a != t_axis else slice(T_fixed)
                           for a in range(x.ndim))]
        widths = [(0, 0)] * x.ndim
        widths[t_axis] = (0, pad)
        return np.pad(x, widths)

    # the expert's episodes must be collected through the EXPERT MODEL's
    # forward — running its params through the injection-enabled fresh model
    # perturbs the trunk and degrades the policy (measured: return 46 -> 26)
    expert_interactor = EnvInteractor(expert_model)

    def collect(actor, policy_vars, n_batches, tag, key0):
        eps_returns = []
        for b in range(n_batches):
            exp = actor(policy_vars, env, jax.random.fold_in(key0, b),
                        num_steps=args.num_denoise_steps,
                        max_timesteps=args.max_timesteps)
            replay.append(dict(
                latents=pad_t(np.asarray(exp.latents)),
                rewards=pad_t(np.asarray(exp.rewards)),
                terminals=np.asarray(exp.terminals),
                discrete_actions=pad_t(np.asarray(exp.actions.discrete)),
                lens=np.asarray(exp.lens)))
            eps_returns.extend(np.asarray(exp.episode_return).tolist())
        print(f'[dataset] {tag}: {n_batches * args.n_envs} episodes, '
              f'avg return {np.mean(eps_returns):.1f} [{time.time()-t0:.0f}s]',
              flush=True)

    cache = Path(args.dataset_cache) if args.dataset_cache else None
    if cache is not None and cache.exists():
        blob = np.load(cache)
        n_items = int(blob['n_items'])
        keys = ('latents', 'rewards', 'terminals', 'discrete_actions', 'lens')
        replay.extend({k: blob[f'{k}_{i}'] for k in keys}
                      for i in range(n_items))
        print(f'[dataset] loaded {n_items} batches from {cache}', flush=True)
    else:
        collect(expert_interactor, expert_variables,
                args.dataset_batches_expert, 'expert',
                jax.random.PRNGKey(args.seed + 100))
        collect(interactor, {'params': variables['params'],
                             'state': variables.get('state', {})},
                args.dataset_batches_random, 'random',
                jax.random.PRNGKey(args.seed + 200))
        if cache is not None:
            np.savez_compressed(
                cache, n_items=len(replay),
                **{f'{k}_{i}': item[k] for i, item in enumerate(replay)
                   for k in item})
            print(f'[dataset] cached to {cache}', flush=True)

    if args.collect_only:
        print('[collect-only] expert + dataset cached; exiting', flush=True)
        return 0

    # ------------------------------------------------ 3. offline WM training
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
        item = replay[rng.integers(len(replay))]  # one 16-episode batch
        return {k: jnp.asarray(v) for k, v in item.items()}

    wm_key = jax.random.PRNGKey(args.seed + 7)
    for step in range(args.wm_steps):
        wm_key, sub = jax.random.split(wm_key)
        shortcut = bool(rng.random() < model.prob_shortcut_train)
        wm_ts, wm_loss, _ = wm_step(wm_ts, sample_wm_batch(), sub,
                                    shortcut_train=shortcut)
        if step % 500 == 0:
            print(f'[wm] step {step}: loss {float(wm_loss):.3f} '
                  f'[{time.time()-t0:.0f}s]', flush=True)

    # ------------------------------------------------ 4. dream-only RL
    frozen_vars = {'params': wm_ts.params, 'state': wm_ts.state}

    def prompt_fn(key_):
        item = replay[rng.integers(len(replay))]
        b = args.dream_batch
        # only rows long enough for a fully-real prompt window (see the
        # online example's prompt_fn)
        ok = np.nonzero(item['lens'] >= args.prompt_len + 1)[0]
        if len(ok) == 0:
            ok = np.arange(item['latents'].shape[0])
        rows = ok[rng.integers(0, len(ok), size=b)]
        lens = item['lens'][rows]
        starts = (rng.random(b) * np.maximum(lens - args.prompt_len - 1, 1)).astype(int)
        idx_t = starts[:, None] + np.arange(args.prompt_len)[None]
        return dict(
            prompt_latents=jnp.asarray(item['latents'][rows[:, None], idx_t]),
            prompt_discrete_actions=jnp.asarray(
                item['discrete_actions'][rows[:, None], idx_t]),
            prompt_rewards=jnp.asarray(item['rewards'][rows[:, None], idx_t]))

    dream_trainer = DreamTrainer(
        model, frozen_vars,
        time_steps=args.dream_timesteps, num_steps=args.num_denoise_steps,
        batch_size=args.dream_batch, objective='ppo',
        policy_lr=args.policy_lr, value_lr=args.value_lr,
        update_epochs=args.ppo_epochs, prompt_fn=prompt_fn,
        generate_kwargs=dict(hard_terminals=False))

    eval_history: list[float] = []
    dkey = jax.random.PRNGKey(args.seed + 31)
    for u in range(args.dream_updates):
        _, out = dream_trainer.step(jax.random.fold_in(dkey, u))
        if (u + 1) % args.eval_every == 0:
            exp = interactor(dream_trainer.variables, env,
                             jax.random.fold_in(dkey, 10_000_000 + u),
                             num_steps=args.num_denoise_steps,
                             max_timesteps=args.max_timesteps)
            ret = float(np.mean(np.asarray(exp.episode_return)))
            eval_history.append(ret)
            window = eval_history[-args.window:]
            avg = float(np.mean(window))
            print(f'[dream] update {u+1}: eval return {ret:.1f} '
                  f'(window {avg:.1f}) H {float(out.stats["entropy"]):.2f} '
                  f'V {float(out.stats["mean_value"]):.1f} '
                  f'[{time.time()-t0:.0f}s]', flush=True)
            if len(window) >= args.window and avg >= args.target_return:
                print(f'SOLVED OFFLINE IN IMAGINATION after {u+1} dream '
                      f'updates: eval return {avg:.1f} >= {args.target_return} '
                      f'(zero real-env policy updates)', flush=True)
                return 0

    final = float(np.mean(eval_history[-args.window:])) if eval_history else 0.0
    print(f'final offline-dream eval avg {final:.1f} (random baseline ~22)')
    return 1


if __name__ == '__main__':
    sys.exit(main())
