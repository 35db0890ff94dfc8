"""CartPole learned PURELY IN IMAGINATION — the Dreamer loop.

The policy is never updated on real experience: real CartPole rollouts (with
the current policy) only feed world-model training; all policy/value-head
updates come from PPO on dreamed rollouts (`generate` -> heads-only
`learn_from_experience`). Real-env returns are the *evaluation*, not a
training signal. This is the reference's DreamTrainer capability
(`trainers.py:1330-1468`) driven to an actual result, with the terminal-head
calibration (`terminal_logit_offset`, `min_dream_length`) found necessary in
round 1.

Success bar (VERDICT round 1): the dream-trained policy measurably beats the
random-policy baseline (~20-25 return) on real CartPole; the reference
online-RL gate is 70.

Usage: python examples/train_cartpole_dream_rl.py --target-return 70
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
    p.add_argument('--max-iterations', type=int, default=200)
    p.add_argument('--objective', choices=('ppo', 'pmpo', 'spo'), default='ppo')
    p.add_argument('--dim', type=int, default=64)
    p.add_argument('--depth', type=int, default=2)
    p.add_argument('--n-envs', type=int, default=16)
    p.add_argument('--wm-lr', type=float, default=3e-4)
    p.add_argument('--policy-lr', type=float, default=3e-4)
    p.add_argument('--value-lr', type=float, default=3e-4)
    p.add_argument('--wm-updates-per-iter', type=int, default=8)
    p.add_argument('--dream-updates-per-iter', type=int, default=4)
    p.add_argument('--freeze-wm-after', type=int, default=0,
                   help='if >0, stop world-model training after this many '
                        'iterations and multiply dream updates by '
                        '--frozen-dream-mult: pure dream-RL against a FIXED '
                        'world model (removes the moving-representation '
                        'problem of heads-only RL under a trunk that keeps '
                        'training)')
    p.add_argument('--frozen-dream-mult', type=int, default=4)
    p.add_argument('--wm-refresh-every', type=int, default=0,
                   help='during the frozen phase, every K iterations run a '
                        'burst of WM updates on fresh replay (and re-sync '
                        'the dream model) — the iterated Dyna scheme: the '
                        'policy improves against a fixed WM, then the WM '
                        'catches up to the states the better policy reaches')
    p.add_argument('--wm-refresh-updates', type=int, default=32)
    p.add_argument('--warmup-iters', type=int, default=5,
                   help='iterations of WM-only training before dream RL starts')
    p.add_argument('--dream-batch', type=int, default=32)
    p.add_argument('--dream-timesteps', type=int, default=17,
                   help='16 learnable + 1 bootstrap frame (reference DreamTrainer)')
    p.add_argument('--num-denoise-steps', type=int, default=4)
    p.add_argument('--prompt-len', type=int, default=3)
    p.add_argument('--hard-terminals', action='store_true',
                   help='Bernoulli-cut dreams at sampled terminals instead of '
                        'soft continuation discounting (DreamerV3-style, the '
                        'default: dreams run full length, GAE discount is '
                        'scaled by 1 - p_terminal each frame)')
    p.add_argument('--terminal-logit-offset', type=float, default=0.0)
    p.add_argument('--min-dream-length', type=int, default=0)
    p.add_argument('--entropy-weight', type=float, default=0.01)
    p.add_argument('--ppo-epochs', type=int, default=2,
                   help='PPO updates per dream (generate dominates cost; the '
                        'clip objective handles the off-policy drift)')
    p.add_argument('--diag-every', type=int, default=25,
                   help='every N iters, probe WM action-sensitivity: dream '
                        'with forced constant-left/right vs alternating '
                        'actions from one prompt and compare mean p_term — '
                        'if these match, the WM carries no action signal and '
                        'policy learning cannot work')
    p.add_argument('--replay-iters', type=int, default=20,
                   help='how many recent collection iterations stay in replay')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--window', type=int, default=20)
    p.add_argument('--no-state-pred', action='store_true',
                   help='disable the action-conditioned next-latent '
                        'prediction heads. These matter: the flow loss alone '
                        'lets the WM average over actions (measured: flow '
                        'action-sensitivity collapses 0.045->0.009 in 250 '
                        'steps), and an action-blind WM gives dream-RL a '
                        'pure-noise policy gradient')
    p.add_argument('--state-pred-frac-grad', type=float, default=0.5)
    p.add_argument('--no-action-inject', action='store_true',
                   help='disable add_action_embed_to_spatial (measured 10x '
                        'stronger flow action-sensitivity through early '
                        'training when on)')
    p.add_argument('--latent-actor', action='store_true',
                   help='actor_critic_latent_input: policy/value read the '
                        '(stable) latents through RL-owned encoders instead '
                        'of the trunk agent embeds — immune to the '
                        'representation drift that reset the policy every '
                        'time the WM trained (runs v3/v5)')
    p.add_argument('--log-dir', type=str, default='',
                   help='if set, write metrics.jsonl (+TB) learning curves '
                        'via MetricLogger')
    p.add_argument('--save-dir', type=str, default='',
                   help='if set, save the final WM+policy checkpoint there')
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

    from dreamer4_tpu.envs.interact import EnvInteractor
    from dreamer4_tpu.models.world_model import DynamicsWorldModel
    from dreamer4_tpu.train.trainers import (DreamTrainer, TrainState,
                                             make_world_model_train_step)
    from dreamer4_tpu.train.optim import muon_adam_atan2

    env = GymnasiumVectorAdapter(n_envs=args.n_envs,
                                 max_timesteps=args.max_timesteps, seed=args.seed)

    model = DynamicsWorldModel(
        dim=args.dim,
        dim_latent=16,
        num_latent_tokens=4,
        num_spatial_tokens=4,
        max_steps=16,
        depth=args.depth,
        time_block_every=2,
        attn_heads=4,
        attn_dim_head=16,
        num_discrete_actions=(env.num_actions,),
        multi_token_pred_len=4,
        num_register_tokens=4,
        dim_state=env.dim_state,
        actor_critic_latent_input=args.latent_actor,
        add_action_embed_to_spatial=not args.no_action_inject,
        add_state_pred_head=not args.no_state_pred,
        agent_predicts_state=not args.no_state_pred,
        agent_predicts_state_frac_gradient=args.state_pred_frac_grad,
        predict_terminals=True,
        policy_entropy_weight=args.entropy_weight,
        keep_reward_ema_stats=True,
        reward_range=(-args.max_timesteps * 1.2, args.max_timesteps * 1.2),
    )

    latents0 = jnp.zeros((1, 4, 4, 16))
    rngs = {'params': jax.random.PRNGKey(args.seed),
            'sample': jax.random.PRNGKey(args.seed + 1)}
    variables = model.init(rngs, latents=latents0, shortcut_train=False,
                           rewards=jnp.zeros((1, 4)), terminals=jnp.zeros((1,), bool),
                           discrete_actions=jnp.zeros((1, 3, 1), jnp.int32))

    # --- world-model optimizer: trains everything EXCEPT the policy/value
    # heads — those belong to dream RL alone, otherwise the WM's
    # behavior-cloning action loss drags the policy back toward the replayed
    # behavior every iteration (reference DreamTrainer trains heads only,
    # `trainers.py:1375-1376`)
    import optax

    from dreamer4_tpu.train.trainers import rl_param_labels

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

    # --- replay of real experience (host side, fixed shapes)
    replay: list[dict] = []
    rng = np.random.default_rng(args.seed)

    T_fixed = args.max_timesteps + 1  # pad to one static shape: one jit program

    def pad_t(x, t_axis=1):
        pad = T_fixed - x.shape[t_axis]
        if pad <= 0:
            return x[tuple(slice(None) if a != t_axis else slice(T_fixed)
                           for a in range(x.ndim))]
        widths = [(0, 0)] * x.ndim
        widths[t_axis] = (0, pad)
        return np.pad(x, widths)

    def add_to_replay(exp):
        item = dict(
            latents=pad_t(np.asarray(exp.latents)),
            rewards=pad_t(np.asarray(exp.rewards)),
            terminals=np.asarray(exp.terminals),
            discrete_actions=pad_t(np.asarray(exp.actions.discrete)),
            lens=np.asarray(exp.lens),
        )
        replay.append(item)
        if len(replay) > args.replay_iters:
            replay.pop(0)

    def sample_wm_batch():
        item = replay[rng.integers(len(replay))]
        return {k: jnp.asarray(v) for k, v in item.items()}

    # prompts: random real-latent windows anchor the dreams in-distribution
    prompt_len = args.prompt_len

    def prompt_fn(key):
        item = replay[rng.integers(len(replay))]
        b = args.dream_batch
        # only rows long enough to supply a fully-real prompt window —
        # clamping short episodes upward would prompt from zero padding
        ok = np.nonzero(item['lens'] >= prompt_len + 1)[0]
        if len(ok) == 0:
            ok = np.arange(item['latents'].shape[0])
        rows = ok[rng.integers(0, len(ok), size=b)]
        lens = item['lens'][rows]
        starts = (rng.random(b) * np.maximum(lens - prompt_len - 1, 1)).astype(int)
        idx_t = starts[:, None] + np.arange(prompt_len)[None]
        lat = item['latents'][rows[:, None], idx_t]
        act = item['discrete_actions'][rows[:, None], idx_t]
        rew = item['rewards'][rows[:, None], idx_t]
        return dict(prompt_latents=jnp.asarray(lat),
                    prompt_discrete_actions=jnp.asarray(act),
                    prompt_rewards=jnp.asarray(rew))

    dream_trainer = DreamTrainer(
        model, variables,
        time_steps=args.dream_timesteps,
        num_steps=args.num_denoise_steps,
        batch_size=args.dream_batch,
        objective=args.objective,
        policy_lr=args.policy_lr, value_lr=args.value_lr,
        update_epochs=args.ppo_epochs,
        prompt_fn=prompt_fn,
        generate_kwargs=dict(
            hard_terminals=args.hard_terminals,
            terminal_logit_offset=args.terminal_logit_offset,
            min_dream_length=args.min_dream_length,
        ))

    interactor = EnvInteractor(model)

    # --- WM action-sensitivity probe: same prompt + key, three forced action
    # policies; if mean p_term does not separate, dreams carry no
    # action->outcome signal and the policy gradient is pure noise
    from dreamer4_tpu.models.generate import generate as wm_generate

    @jax.jit
    def _forced_dream(params, key, forced, p_lat, p_act, p_rew):
        return wm_generate(
            model, {'params': params, 'state': dream_trainer.state_collection},
            key, time_steps=args.dream_timesteps, num_steps=args.num_denoise_steps,
            batch_size=args.dream_batch,
            prompt_latents=p_lat, prompt_discrete_actions=p_act,
            prompt_rewards=p_rew, forced_discrete_actions=forced,
            hard_terminals=False)

    def action_sensitivity(key):
        prompt = prompt_fn(key)
        b, T = args.dream_batch, args.dream_timesteps
        t_idx = np.broadcast_to(np.arange(T)[None, :, None], (b, T, 1))
        out, exps = {}, {}
        for name, acts in (('L', np.zeros((b, T, 1))), ('R', np.ones((b, T, 1))),
                           ('alt', t_idx % 2)):
            exp = _forced_dream(dream_trainer.rl_state.params, key,
                                jnp.asarray(acts, jnp.int32),
                                prompt['prompt_latents'],
                                prompt['prompt_discrete_actions'],
                                prompt['prompt_rewards'])
            exps[name] = exp
            tp = np.asarray(exp.terminal_probs)[:, prompt_len:]
            out[name] = float(tp.mean())
        lat_L = np.asarray(exps['L'].latents)[:, prompt_len:]
        lat_R = np.asarray(exps['R'].latents)[:, prompt_len:]
        # where in the chain does the action signal die? latent divergence
        # (dreamed trajectories L vs R) vs the terminal-prob divergence
        out['lat_div'] = float(np.abs(lat_L - lat_R).mean())
        out['lat_scale'] = float(np.abs(lat_L).mean())
        out['tp_last'] = (float(np.asarray(exps['L'].terminal_probs)[:, -1].mean()),
                          float(np.asarray(exps['R'].terminal_probs)[:, -1].mean()))
        return out

    key = jax.random.PRNGKey(args.seed)
    wm_key = jax.random.PRNGKey(args.seed + 7)
    returns: list[float] = []
    logger = None
    if args.log_dir:
        from dreamer4_tpu.train.logging import MetricLogger
        logger = MetricLogger(args.log_dir)
    t0 = time.time()

    for it in range(args.max_iterations):
        # ---- 1. collect real experience with the CURRENT policy (eval only)
        exp = interactor({'params': dream_trainer.rl_state.params,
                          'state': dream_trainer.state_collection},
                         env, jax.random.fold_in(key, it),
                         num_steps=args.num_denoise_steps,
                         max_timesteps=args.max_timesteps)
        add_to_replay(exp)
        batch_returns = np.asarray(exp.episode_return).tolist()
        returns.extend(batch_returns)

        # ---- 2. world-model training on replayed real experience
        def run_wm_updates(n):
            nonlocal wm_ts, wm_key
            wm_ts = wm_ts._replace(params=dream_trainer.rl_state.params,
                                   state=dream_trainer.state_collection)
            losses = []
            for _ in range(n):
                wm_key, sub = jax.random.split(wm_key)
                shortcut = bool(rng.random() < model.prob_shortcut_train)
                wm_ts, wm_loss, _ = wm_step(wm_ts, sample_wm_batch(), sub,
                                            shortcut_train=shortcut)
                losses.append(float(wm_loss))
            dream_trainer.rl_state = dream_trainer.rl_state._replace(params=wm_ts.params)
            dream_trainer.state_collection = wm_ts.state
            return losses

        wm_frozen = args.freeze_wm_after > 0 and it >= args.freeze_wm_after
        wm_losses: list[float] = []
        if (wm_frozen and args.wm_refresh_every > 0
                and (it - args.freeze_wm_after) % args.wm_refresh_every == 0
                and it > args.freeze_wm_after):
            wm_losses = run_wm_updates(args.wm_refresh_updates)
            print(f'  [wm refresh at iter {it}: loss '
                  f'{np.mean(wm_losses):.3f}]', flush=True)
        elif not wm_frozen:
            wm_losses = run_wm_updates(args.wm_updates_per_iter)

        # ---- 3. policy/value updates purely from dreams
        dream_lens = []
        dream_rewards = []
        rl_stats: dict[str, list[float]] = {}
        dream_updates = args.dream_updates_per_iter * (
            args.frozen_dream_mult if wm_frozen else 1)
        if it >= args.warmup_iters:
            for u in range(dream_updates):
                dream, out = dream_trainer.step(
                    jax.random.fold_in(jax.random.fold_in(key, it), 1000 + u))
                dream_lens.append(float(np.mean(np.asarray(dream.lens))))
                dream_rewards.append(float(np.mean(np.asarray(dream.rewards))))
                for k, v in out.stats.items():
                    rl_stats.setdefault(k, []).append(float(v))

        window = returns[-args.window:]
        avg = float(np.mean(window))
        extra = ''
        if (args.diag_every and it >= args.warmup_iters
                and (it - args.warmup_iters) % args.diag_every == 0):
            sens = action_sensitivity(jax.random.fold_in(key, 999_000 + it))
            extra += (f" | diag p_term L {sens['L']:.3f} R {sens['R']:.3f}"
                      f" alt {sens['alt']:.3f}"
                      f" lat_div {sens['lat_div']:.4f}/{sens['lat_scale']:.3f}"
                      f" tp_last L {sens['tp_last'][0]:.3f} R {sens['tp_last'][1]:.3f}")
        if rl_stats:
            extra += (f" V {np.mean(rl_stats['mean_value']):.1f}"
                     f" adv_std {np.mean(rl_stats['adv_std']):.2f}"
                     f" H {np.mean(rl_stats['entropy']):.2f}")
            if 'mean_terminal_prob' in rl_stats:
                extra += (f" p_term {np.mean(rl_stats['mean_terminal_prob']):.3f}"
                          f" alive {np.mean(rl_stats['mean_alive']):.2f}")
        wm_loss_str = f'{np.mean(wm_losses):.3f}' if wm_losses else 'frozen'
        print(f'iter {it}: real return {np.mean(batch_returns):.1f} '
              f'(window avg {avg:.1f}) wm_loss {wm_loss_str} '
              f'dream_len {np.mean(dream_lens) if dream_lens else 0:.1f} '
              f'dream_r {np.mean(dream_rewards) if dream_rewards else 0:.2f}'
              f'{extra} [{time.time() - t0:.0f}s]', flush=True)
        if logger is not None:
            scalars = dict(real_return=float(np.mean(batch_returns)),
                           window_avg=avg)
            if wm_losses:  # omit while frozen — NaN is not valid strict JSON
                scalars['wm_loss'] = float(np.mean(wm_losses))
            if rl_stats:
                scalars.update(entropy=float(np.mean(rl_stats['entropy'])),
                               value=float(np.mean(rl_stats['mean_value'])))
            logger.log(it, **scalars)

        if len(window) >= args.window and avg >= args.target_return:
            print(f'SOLVED IN IMAGINATION at iteration {it}: '
                  f'avg real return {avg:.1f} >= {args.target_return}')
            _maybe_save(args, model, dream_trainer)
            return 0

    print(f'final window avg {float(np.mean(returns[-args.window:])):.1f} '
          f'(random baseline ~22)')
    _maybe_save(args, model, dream_trainer)
    return 1


def _maybe_save(args, model, dream_trainer):
    if not args.save_dir:
        return
    from dreamer4_tpu.train.checkpoint import save_model
    save_model(args.save_dir, model,
               {'params': dream_trainer.rl_state.params,
                'state': dream_trainer.state_collection})
    print(f'saved WM+policy checkpoint to {args.save_dir}', flush=True)


if __name__ == '__main__':
    sys.exit(main())
