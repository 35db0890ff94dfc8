"""CartPole online RL through the dynamics world model.

Equivalent of the reference `train_cartpole_with_dynamics_rl.py`: state-vector
CartPole (gymnasium), DynamicsWorldModel with `dim_state` -> latents and an
asymmetric critic over the raw state, online SimTrainer loop
(interact_with_env -> learn_from_experience) with PPO/PMPO/SPO, stopping when
the 20-episode average return reaches `target_return` (the reference gate is
70.0 at max_timesteps 150).

Usage: python examples/train_cartpole_with_dynamics_rl.py --target-return 70
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


class GymnasiumVectorAdapter:
    """N parallel gymnasium envs as one batched env with dict state obs.
    Finished envs latch (zero reward, terminated=True) until the batch
    rollout ends — the interactor's `lens` bookkeeping masks them."""

    def __init__(self, name: str = 'CartPole-v1', n_envs: int = 16,
                 max_timesteps: int = 150, seed: int = 0):
        import gymnasium

        self.envs = [gymnasium.make(name) for _ in range(n_envs)]
        self.n_envs = n_envs
        self.max_timesteps = max_timesteps
        self._seed = seed

    @property
    def dim_state(self):
        return int(np.prod(self.envs[0].observation_space.shape))

    @property
    def num_actions(self):
        return int(self.envs[0].action_space.n)

    def reset(self, seed=None):
        base = seed if seed is not None else self._seed
        self._seed += self.n_envs
        obs = []
        for i, env in enumerate(self.envs):
            o, _ = env.reset(seed=base + i)
            obs.append(np.asarray(o, np.float32))
        self._done = np.zeros((self.n_envs,), bool)
        self._last_obs = np.stack(obs)
        return {'state': self._last_obs.copy()}, {}

    def step(self, actions):
        actions = np.asarray(actions).reshape(self.n_envs)
        rewards = np.zeros((self.n_envs,), np.float32)
        terminated = np.zeros((self.n_envs,), bool)
        truncated = np.zeros((self.n_envs,), bool)
        for i, env in enumerate(self.envs):
            if self._done[i]:
                terminated[i] = True
                continue
            o, r, term, trunc, _ = env.step(int(actions[i]))
            self._last_obs[i] = np.asarray(o, np.float32)
            rewards[i] = r
            terminated[i] = term
            truncated[i] = trunc
            self._done[i] |= term or trunc
        return ({'state': self._last_obs.copy()}, rewards, terminated, truncated, {})


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--target-return', type=float, default=70.0)
    p.add_argument('--max-timesteps', type=int, default=150)
    p.add_argument('--max-iterations', type=int, default=300)
    p.add_argument('--objective', choices=('ppo', 'pmpo', 'spo'), default='ppo')
    p.add_argument('--dim', type=int, default=64)
    p.add_argument('--depth', type=int, default=2)
    p.add_argument('--policy-lr', type=float, default=3e-4)
    p.add_argument('--value-lr', type=float, default=3e-4)
    p.add_argument('--update-epochs', type=int, default=4)
    p.add_argument('--rollouts-per-step', type=int, default=1)
    p.add_argument('--n-envs', type=int, default=16)
    p.add_argument('--dynamics-lr', type=float, default=1e-4)
    p.add_argument('--delight', action='store_true',
                   help='enable delight gating (measured to slow CartPole: the '
                        'gate sigmoid(-logpi*A) dampens positive-advantage '
                        'updates ~3x for near-uniform policies; without it the '
                        '70-return gate is hit in ~9 iterations, with it the '
                        'policy plateaus near 35)')
    p.add_argument('--entropy-weight', type=float, default=0.01)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--window', type=int, default=20)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dreamer4_tpu.models.world_model import DynamicsWorldModel
    from dreamer4_tpu.train.trainers import SimTrainer

    env = GymnasiumVectorAdapter(n_envs=args.n_envs, max_timesteps=args.max_timesteps, seed=args.seed)

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
        dim_critic_state=env.dim_state,
        predict_terminals=True,
        use_delight_gating=args.delight,
        policy_entropy_weight=args.entropy_weight,
        keep_reward_ema_stats=True,
        reward_range=(-args.max_timesteps * 1.2, args.max_timesteps * 1.2),
    )

    latents = jnp.zeros((1, 4, 4, 16))
    rngs = {'params': jax.random.PRNGKey(args.seed), 'sample': jax.random.PRNGKey(args.seed + 1)}
    variables = model.init(rngs, latents=latents, shortcut_train=False,
                           rewards=jnp.zeros((1, 4)), terminals=jnp.zeros((1,), bool),
                           discrete_actions=jnp.zeros((1, 3, 1), jnp.int32))

    trainer = SimTrainer(model, variables, env,
                         objective=args.objective,
                         policy_lr=args.policy_lr, value_lr=args.value_lr,
                         num_steps=4, max_timesteps=args.max_timesteps,
                         num_rollouts_per_step=args.rollouts_per_step,
                         update_epochs=args.update_epochs,
                         dynamics_lr=args.dynamics_lr)

    key = jax.random.PRNGKey(args.seed)
    returns = []
    t0 = time.time()
    for it in range(args.max_iterations):
        experience, _ = trainer.step(jax.random.fold_in(key, it))
        batch_returns = np.asarray(experience.episode_return)
        returns.extend(batch_returns.tolist())

        window = returns[-args.window:]
        avg = float(np.mean(window))
        if it % 5 == 0:
            print(f'iter {it}: avg return (last {len(window)}) = {avg:.1f} '
                  f'[{time.time() - t0:.0f}s]', flush=True)
        if len(window) >= args.window and avg >= args.target_return:
            print(f'SOLVED at iteration {it}: avg return {avg:.1f} >= {args.target_return}')
            return 0

    print(f'did not reach target_return={args.target_return}; final avg '
          f'{float(np.mean(returns[-args.window:])):.1f}')
    return 1


if __name__ == '__main__':
    sys.exit(main())
