"""Multi-process (multi-host) training dryrun — CI-able on CPU.

Two modes:
  --role single               : one process, full global batch -> reference
  --role worker --process-id i: one of N processes, local half of the batch,
                                joined via jax.distributed + a global mesh

Both print `loss=<x> checksum=<y>` after ONE world-model train step. If
gradient averaging across processes works, every worker's post-update param
checksum equals the single-process full-batch reference (SPMD equivalence).

Usage (the test in tests/test_multihost.py drives this):
  python scripts/multihost_dryrun.py --role single
  python scripts/multihost_dryrun.py --role worker --process-id 0 --num-processes 2 --port 9876 &
  python scripts/multihost_dryrun.py --role worker --process-id 1 --num-processes 2 --port 9876
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

LOCAL_DEVICES = 4

p = argparse.ArgumentParser()
p.add_argument('--role', choices=('single', 'worker', 'rl-single', 'rl-worker'),
               required=True)
p.add_argument('--process-id', type=int, default=0)
p.add_argument('--num-processes', type=int, default=2)
p.add_argument('--port', type=int, default=9876)
p.add_argument('--seed', type=int, default=0)
args = p.parse_args()

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + f' --xla_force_host_platform_device_count={LOCAL_DEVICES}')

import jax

jax.config.update('jax_platforms', 'cpu')

if args.role in ('worker', 'rl-worker'):
    from dreamer4_tpu.parallel import distributed as dist

    dist.initialize(coordinator_address=f'localhost:{args.port}',
                    num_processes=args.num_processes,
                    process_id=args.process_id)

import jax.numpy as jnp
import numpy as np

from dreamer4_tpu.models.world_model import DynamicsWorldModel
from dreamer4_tpu.parallel import distributed as dist
from dreamer4_tpu.train.optim import muon_adam_atan2
from dreamer4_tpu.train.trainers import TrainState, make_world_model_train_step


def run_rl_fanout():
    """Per-host actor fleet: each process steps ITS OWN envs with
    EnvInteractor, the host-local Experiences assemble into one global
    sharded batch, and a single SPMD `learn_from_experience` update runs with
    gradients averaged across processes — the reference's host<->env boundary
    (`dreamer4.py:5683-5693`) as a host-sharded fleet (SURVEY §7 stage 9).
    `rl-single` replays every host's interaction in one process as the
    equivalence reference."""
    from dreamer4_tpu.data.experience import combine_experiences
    from dreamer4_tpu.envs.interact import EnvInteractor
    from dreamer4_tpu.envs.mocks import MockStateEnv
    from dreamer4_tpu.train.trainers import (RLState, ReturnStats,
                                             make_rl_optimizer,
                                             make_rl_update_step)

    rl_model = DynamicsWorldModel(
        dim=16, dim_latent=8, num_latent_tokens=4, max_steps=8, depth=1,
        time_block_every=1, num_spatial_tokens=4, num_discrete_actions=(3,),
        attn_dim_head=8, attn_heads=2, multi_token_pred_len=2,
        num_register_tokens=2, dim_state=4, predict_terminals=True,
        use_loss_normalization=False)
    lat0 = jnp.zeros((1, 3, 4, 8))
    variables = rl_model.init(
        {'params': jax.random.PRNGKey(args.seed),
         'sample': jax.random.PRNGKey(args.seed + 1)},
        latents=lat0, shortcut_train=False, rewards=jnp.zeros((1, 3)),
        terminals=jnp.zeros((1,), bool),
        discrete_actions=jnp.zeros((1, 2, 1), jnp.int32))

    interactor = EnvInteractor(rl_model)

    def collect(host_id: int):
        env = MockStateEnv(dim_state=4, num_actions=3, batch=LOCAL_DEVICES,
                           max_steps=6, seed=500 + host_id)
        return interactor(variables, env, jax.random.PRNGKey(900 + host_id),
                          num_steps=2, max_timesteps=6)

    tx = make_rl_optimizer(rl_model, policy_lr=1e-3, value_lr=1e-3)(
        variables['params'])
    rl_state = RLState(params=variables['params'],
                       opt_state=tx.init(variables['params']),
                       return_stats=ReturnStats.create(),
                       step=jnp.zeros((), jnp.int32))
    update = make_rl_update_step(rl_model, tx)

    if args.role == 'rl-worker':
        mesh = dist.create_global_mesh(data=-1, model=1)
        local_exp = collect(args.process_id)
        experience = dist.host_local_batch_to_global(mesh, ('data',), local_exp)
    else:
        experience = combine_experiences(
            [collect(i) for i in range(args.num_processes)])

    rl_state, out = update(rl_state, experience)

    heads = {k: rl_state.params[k] for k in ('policy_head', 'value_head')}
    checksum = float(jax.tree.reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b).astype(jnp.float64))),
        heads, 0.0))
    print(f'loss={float(out.policy_loss) + float(out.value_loss):.6f} '
          f'checksum={checksum:.6f}', flush=True)


if args.role in ('rl-single', 'rl-worker'):
    run_rl_fanout()
    sys.exit(0)


model = DynamicsWorldModel(
    dim=16, dim_latent=8, num_latent_tokens=4, max_steps=8, depth=1,
    time_block_every=1, num_spatial_tokens=4, num_discrete_actions=(3,),
    attn_dim_head=8, attn_heads=2, multi_token_pred_len=2,
    num_register_tokens=2, use_loss_normalization=False)

GLOBAL_BATCH = 8
rng = np.random.default_rng(args.seed)
batch_np = dict(
    latents=rng.standard_normal((GLOBAL_BATCH, 3, 1, 4, 8)).astype(np.float32) * 0.5,
    rewards=rng.standard_normal((GLOBAL_BATCH, 3)).astype(np.float32),
    terminals=np.zeros((GLOBAL_BATCH, 3), bool),
    discrete_actions=rng.integers(0, 3, (GLOBAL_BATCH, 3, 1)).astype(np.int32),
)

variables = model.init({'params': jax.random.PRNGKey(args.seed),
                        'sample': jax.random.PRNGKey(args.seed + 1)},
                       shortcut_train=False,
                       **{k: jnp.asarray(v) for k, v in batch_np.items()})

tx = muon_adam_atan2(learning_rate=1e-3, clip_grad_norm=1.0)
ts = TrainState(params=variables['params'], state=variables.get('state', {}),
                opt_state=tx.init(variables['params']),
                ema_params=None, step=jnp.zeros((), jnp.int32))
train_step = make_world_model_train_step(model, tx)

if args.role == 'worker':
    mesh = dist.create_global_mesh(data=-1, model=1)
    per = GLOBAL_BATCH // args.num_processes
    local = {k: v[args.process_id * per:(args.process_id + 1) * per]
             for k, v in batch_np.items()}
    batch = dist.host_local_batch_to_global(
        mesh, ('data',), local)
else:
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

ts, loss, _ = train_step(ts, batch, jax.random.PRNGKey(args.seed + 2),
                         shortcut_train=False)

checksum = float(jax.tree.reduce(
    lambda a, b: a + float(jnp.sum(jnp.abs(b).astype(jnp.float64))),
    ts.params, 0.0))
print(f'loss={float(loss):.6f} checksum={checksum:.6f}', flush=True)
