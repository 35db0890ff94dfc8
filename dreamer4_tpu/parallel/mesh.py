"""Device mesh + sharding rules.

The reference delegates all parallelism to HF Accelerate DDP
(SURVEY.md section 2.8); here parallelism is a first-class subsystem:
a (data, model) mesh where batches shard over `data` and large weights shard
over `model` (FSDP-style), with XLA GSPMD inserting the collectives over ICI.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def create_mesh(num_data: int | None = None, num_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if num_data is None:
        num_data = n // num_model
    assert num_data * num_model == n, f'{num_data}x{num_model} != {n} devices'
    dev_array = mesh_utils.create_device_mesh((num_data, num_model), devices=devices)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def param_sharding_rule(path: tuple, param: jax.Array, mesh: Mesh) -> NamedSharding:
    """FSDP-style rule: shard the largest dim of big 2-D+ weights over the
    model axis when divisible; replicate the rest."""
    model_size = mesh.shape[MODEL_AXIS]
    spec = [None] * param.ndim
    if model_size > 1 and param.ndim >= 2 and param.size >= 2 ** 16:
        # shard the last dim if divisible, else the first divisible dim
        for axis in reversed(range(param.ndim)):
            if param.shape[axis] % model_size == 0:
                spec[axis] = MODEL_AXIS
                break
    return NamedSharding(mesh, P(*spec))


def shard_params(params: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda p, x: jax.device_put(x, param_sharding_rule(p, x, mesh)), params)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    def put(x):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))))
    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding) if x is not None else None, tree)
