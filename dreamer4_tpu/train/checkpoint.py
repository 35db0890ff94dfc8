"""Checkpoint / resume.

Equivalent of the reference's `@save_load` decorator (config pickling +
`init_and_load`, `torch_einops_utils.save_load`, used on VideoTokenizer /
VideoDecoderNetwork / DynamicsWorldModel at `dreamer4.py:3489, 3684, 4660`)
plus the trainers' checkpoint policy (`trainers.py:792-820`).

A checkpoint is a directory:
  config.json   — the linen module's constructor config (module attrs),
                  encoded with tagged values so every field (incl. jnp dtypes
                  and nested tuples) round-trips exactly
  state/        — orbax checkpoint of the variables / train-state pytree

The config encoding is a small tagged scheme rather than `str(value)`:
non-JSON values become {"__kind__": ..., ...} objects, so a bf16-configured
model reloads as bf16 (the reference gets this for free by pickling the
kwargs; pickle is avoided here so checkpoints stay portable/inspectable).
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Type

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

# dtypes that may appear in module configs, keyed by canonical name
_DTYPES = {
    name: getattr(jnp, name)
    for name in ('bfloat16', 'float16', 'float32', 'float64',
                 'int8', 'int16', 'int32', 'int64',
                 'uint8', 'uint16', 'uint32', 'uint64', 'bool_')
}


def _dtype_name(value) -> str | None:
    """Canonical name if `value` is a dtype-like (np.dtype, jnp scalar type,
    python type like jnp.bfloat16), else None."""
    try:
        return np.dtype(value).name if np.dtype(value).name != 'bool' else 'bool_'
    except TypeError:
        return None


def _encode(value):
    if value is None or isinstance(value, (int, float, str)):
        return value
    if isinstance(value, (bool, np.bool_)):
        return bool(value)
    if isinstance(value, (np.integer,)):
        return int(value)
    if isinstance(value, (np.floating,)):
        return float(value)
    if isinstance(value, tuple):
        return {'__kind__': 'tuple', 'items': [_encode(v) for v in value]}
    if isinstance(value, list):
        return {'__kind__': 'list', 'items': [_encode(v) for v in value]}
    if isinstance(value, dict):
        return {'__kind__': 'dict',
                'items': {str(k): _encode(v) for k, v in value.items()}}
    name = _dtype_name(value)
    if name is not None:
        return {'__kind__': 'dtype', 'name': name}
    raise TypeError(
        f'cannot serialize config value {value!r} of type {type(value)}; '
        'add a tagged encoding for it in train/checkpoint.py')


def _decode(value):
    if isinstance(value, dict) and '__kind__' in value:
        kind = value['__kind__']
        if kind == 'tuple':
            return tuple(_decode(v) for v in value['items'])
        if kind == 'list':
            return [_decode(v) for v in value['items']]
        if kind == 'dict':
            return {k: _decode(v) for k, v in value['items'].items()}
        if kind == 'dtype':
            return _DTYPES[value['name']]
        raise ValueError(f'unknown config tag {kind!r}')
    if isinstance(value, list):  # legacy (round-1) checkpoints: tuples as lists
        return tuple(_decode(v) for v in value)
    return value


def _module_config(module) -> dict:
    """Extract the dataclass-style attrs of a linen module, tagged-encoded."""
    cfg = {}
    for field in dataclasses.fields(module):
        if field.name in ('parent', 'name'):
            continue
        cfg[field.name] = _encode(getattr(module, field.name))
    return cfg


def save_model(path: str | Path, module, variables: Any, extra: dict | None = None):
    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)

    config = dict(
        module_class=type(module).__name__,
        config=_module_config(module),
        extra=extra or {},
    )
    (path / 'config.json').write_text(json.dumps(config, indent=2))

    ckptr = ocp.StandardCheckpointer()
    state_path = path / 'state'
    if state_path.exists():
        import shutil
        shutil.rmtree(state_path)
    ckptr.save(state_path, variables)
    ckptr.wait_until_finished()


def load_config(path: str | Path) -> dict:
    return json.loads((Path(path) / 'config.json').read_text())


def decode_config(meta: dict) -> dict:
    """Decode the tagged `config` section of a checkpoint's config.json."""
    return {k: _decode(v) for k, v in meta['config'].items()}


def load_model(path: str | Path, module_class: Type, abstract_variables: Any | None = None):
    """Reconstruct (module, variables) from a checkpoint directory — the
    `Model.init_and_load(path)` equivalent (reference
    `test_dreamer.py:2242-2255`)."""
    path = Path(path).absolute()
    meta = load_config(path)
    config = decode_config(meta)
    known = {f.name for f in dataclasses.fields(module_class)}
    module = module_class(**{k: v for k, v in config.items() if k in known})

    ckptr = ocp.StandardCheckpointer()
    if abstract_variables is not None:
        variables = ckptr.restore(path / 'state', abstract_variables)
    else:
        try:
            variables = ckptr.restore(path / 'state')
        except ValueError:
            # the checkpoint carries sharding metadata for devices that no
            # longer exist (e.g. saved on TPU, restored on CPU) — restore
            # device-agnostically as host numpy arrays instead
            pt = ocp.PyTreeCheckpointer()
            meta = pt.metadata(path / 'state')
            meta_tree = getattr(meta, 'item_metadata', None) or getattr(meta, 'tree')
            restore_args = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree)
            variables = pt.restore(
                path / 'state', args=ocp.args.PyTreeRestore(
                    restore_args=restore_args))
    return module, variables


# ------------------------------------------------------- train-state resume

def save_train_state(path: str | Path, ts, extra: dict | None = None):
    """Checkpoint a trainer's full TrainState (params, loss-normalizer state,
    optimizer state, EMA params, step) for exact resumption — the reference
    saves {model-state, step} plus a separate `-ema.pt`
    (`trainers.py:792-820`); here everything lives in one orbax tree."""
    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    tree = {'params': ts.params, 'state': ts.state, 'opt_state': ts.opt_state,
            'step': ts.step}
    if ts.ema_params is not None:
        tree['ema_params'] = ts.ema_params
    (path / 'train_meta.json').write_text(json.dumps(
        dict(step=int(ts.step), has_ema=ts.ema_params is not None,
             extra=extra or {}), indent=2))
    ckptr = ocp.StandardCheckpointer()
    state_path = path / 'train_state'
    if state_path.exists():
        import shutil
        shutil.rmtree(state_path)
    ckptr.save(state_path, tree)
    ckptr.wait_until_finished()


def load_train_state(path: str | Path, abstract_ts=None):
    """Restore a TrainState saved by `save_train_state`. With `abstract_ts`
    (a freshly-constructed TrainState of the same model/optimizer) the
    restored arrays adopt its exact structure/dtypes; without it, orbax's
    raw restore is returned. Returns (TrainState, meta_extra_dict)."""
    from .trainers import TrainState

    path = Path(path).absolute()
    meta = json.loads((path / 'train_meta.json').read_text())
    ckptr = ocp.StandardCheckpointer()
    if abstract_ts is not None:
        target = {'params': abstract_ts.params, 'state': abstract_ts.state,
                  'opt_state': abstract_ts.opt_state, 'step': abstract_ts.step}
        if meta['has_ema']:
            ema = (abstract_ts.ema_params if abstract_ts.ema_params is not None
                   else abstract_ts.params)
            target['ema_params'] = ema
        tree = ckptr.restore(path / 'train_state', target)
    else:
        tree = ckptr.restore(path / 'train_state')
    ts = TrainState(
        params=tree['params'], state=tree['state'], opt_state=tree['opt_state'],
        ema_params=tree.get('ema_params'), step=jnp.asarray(tree['step']))
    return ts, meta.get('extra', {})
