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
p.add_argument('--role', choices=('single', 'worker'), required=True)
p.add_argument('--process-id', type=int, default=0)
p.add_argument('--num-processes', type=int, default=2)
p.add_argument('--port', type=int, default=9876)
p.add_argument('--seed', type=int, default=0)
args = p.parse_args()

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + f' --xla_force_host_platform_device_count={LOCAL_DEVICES}')

import jax

jax.config.update('jax_platforms', 'cpu')

if args.role == 'worker':
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
