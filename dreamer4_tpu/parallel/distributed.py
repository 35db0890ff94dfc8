"""Multi-host (multi-process) scaffolding.

The reference delegates all distribution to HF Accelerate DDP
(`trainers.py:466-469`) and acknowledges a per-rank-stats gap
(`dreamer4.py:5999`). Here distribution is JAX-native single-controller
SPMD: every host runs the same program, `jax.distributed.initialize` wires
the processes together, and one global `Mesh` spans all hosts' devices —
gradients are averaged by GSPMD collectives (over ICI within a slice, DCN
across slices), not by an external DDP wrapper.

Typical multi-host entry:

    from dreamer4_tpu.parallel import distributed as dist
    dist.initialize()                       # env-driven on TPU pods
    mesh = dist.create_global_mesh(data=-1) # data axis over every chip
    batch = dist.host_local_batch_to_global(mesh, ('data',), local_batch)
    ... jit train step with sharded inputs; collectives are inserted by XLA

Per-host env interaction: each host runs its own `EnvInteractor` over its
local envs, converts the host-local Experience to a global array with
`host_local_batch_to_global`, and the learner consumes the global batch —
the reference's host<->env boundary (`dreamer4.py:5683-5693`) becomes a
host-sharded actor fleet.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids: Any | None = None) -> None:
    """`jax.distributed.initialize` with explicit-args support for CPU/GPU
    fleets and env-driven autodetection on TPU pods (where all args are
    discovered from the metadata server)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    if local_device_ids is not None:
        kwargs['local_device_ids'] = local_device_ids
    jax.distributed.initialize(**kwargs)


def create_global_mesh(data: int = -1, model: int = 1,
                       axis_names: tuple[str, str] = ('data', 'model'),
                       devices=None) -> Mesh:
    """A (data, model) mesh over ALL processes' devices. `data=-1` absorbs
    the remaining devices. On multi-slice TPU, pass `devices` from
    `mesh_utils.create_hybrid_device_mesh` to keep the model axis on ICI
    and the data axis across DCN."""
    devices = np.asarray(jax.devices() if devices is None else devices)
    n = devices.size
    if data == -1:
        assert n % model == 0
        data = n // model
    assert data * model == n, f'{data}x{model} != {n} devices'
    return Mesh(devices.reshape(data, model), axis_names)


def host_local_batch_to_global(mesh: Mesh, pspec: PartitionSpec | tuple,
                               local_batch: Any) -> Any:
    """Assemble per-process host-local arrays into global sharded arrays:
    each process contributes its local shard of the leading (batch) dim.
    Works on any pytree."""
    if not isinstance(pspec, PartitionSpec):
        pspec = PartitionSpec(*pspec)

    def convert(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, pspec)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(convert, local_batch)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0
