"""Checkpoint / resume.

Equivalent of the reference's `@save_load` decorator (config pickling +
`init_and_load`, `torch_einops_utils.save_load`, used on VideoTokenizer /
VideoDecoderNetwork / DynamicsWorldModel at `dreamer4.py:3489, 3684, 4660`)
plus the trainers' checkpoint policy (`trainers.py:792-820`).

A checkpoint is a directory:
  config.json   — the linen module's constructor config (module attrs)
  state/        — orbax checkpoint of the variables / train-state pytree
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Type

import jax
import orbax.checkpoint as ocp


def _module_config(module) -> dict:
    """Extract the dataclass-style attrs of a linen module as JSON."""
    cfg = {}
    for field in dataclasses.fields(module):
        if field.name in ('parent', 'name'):
            continue
        value = getattr(module, field.name)
        if isinstance(value, tuple):
            value = list(value)
        if value is not None and not isinstance(value, (int, float, str, bool, list)):
            value = str(value)
        cfg[field.name] = value
    return cfg


def save_model(path: str | Path, module, variables: Any, extra: dict | None = None):
    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)

    config = dict(
        module_class=type(module).__name__,
        config=_module_config(module),
        extra=extra or {},
    )
    (path / 'config.json').write_text(json.dumps(config, indent=2, default=str))

    ckptr = ocp.StandardCheckpointer()
    state_path = path / 'state'
    if state_path.exists():
        import shutil
        shutil.rmtree(state_path)
    ckptr.save(state_path, variables)
    ckptr.wait_until_finished()


def load_config(path: str | Path) -> dict:
    return json.loads((Path(path) / 'config.json').read_text())


def load_model(path: str | Path, module_class: Type, abstract_variables: Any | None = None):
    """Reconstruct (module, variables) from a checkpoint directory — the
    `Model.init_and_load(path)` equivalent."""
    path = Path(path).absolute()
    meta = load_config(path)
    config = dict(meta['config'])

    # tuple-typed fields were serialized as lists
    for k, v in config.items():
        if isinstance(v, list):
            config[k] = tuple(tuple(x) if isinstance(x, list) else x for x in v)
    module = module_class(**{k: v for k, v in config.items() if v is not None or True})

    ckptr = ocp.StandardCheckpointer()
    if abstract_variables is not None:
        variables = ckptr.restore(path / 'state', abstract_variables)
    else:
        variables = ckptr.restore(path / 'state')
    return module, variables
