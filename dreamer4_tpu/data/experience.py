"""Experience — the universal trajectory record.

Pytree port of the reference `Experience` dataclass (`dreamer4.py:136-246`).
All tensors are padded to static max lengths with `lens` carrying validity —
the XLA-native replacement for the reference's variable-length episode
handling (`combine_experiences` padding, `dreamer4.py:248-309`).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..nn.action_embedder import Actions


@struct.dataclass
class Experience:
    latents: jax.Array | None = None            # (b, t, n, d)
    video: jax.Array | None = None              # (b, c, t, h, w)
    proprio: jax.Array | None = None            # (b, t, dp)
    critic_state: jax.Array | None = None       # (b, t, ds)
    agent_embed: jax.Array | None = None        # (b, t, d)
    rewards: jax.Array | None = None            # (b, t)
    terminals: jax.Array | None = None          # (b,) or (b, t)
    terminal_probs: jax.Array | None = None     # (b, t) — soft continuation source
    actions: Actions | None = None
    log_probs: Actions | None = None
    old_action_unembeds: Any | None = None      # (discrete_logits_tuple, cont_params)
    values: jax.Array | None = None             # (b, t)
    step_size: int | None = struct.field(pytree_node=False, default=None)
    lens: jax.Array | None = None               # (b,)
    is_truncated: jax.Array | None = None       # (b,)
    agent_index: int = struct.field(pytree_node=False, default=0)
    is_from_world_model: bool = struct.field(pytree_node=False, default=True)
    prompt_len: int = struct.field(pytree_node=False, default=0)
    episode_return: jax.Array | None = None     # (b,)

    @property
    def payload(self):
        for t in (self.latents, self.video, self.critic_state):
            if t is not None:
                return t
        return None

    @property
    def batch_size(self):
        return self.payload.shape[0]

    @property
    def time_steps(self):
        return self.payload.shape[1]


def _pad_to(t: jax.Array, length: int, axis: int) -> jax.Array:
    amount = length - t.shape[axis]
    if amount <= 0:
        return t
    pads = [(0, 0)] * t.ndim
    pads[axis] = (0, amount)
    return jnp.pad(t, pads)


def index_experience(exp: Experience, idx) -> Experience:
    """Row-select every array leaf (all leaves are batch-first; static
    fields pass through) — minibatch slicing for epoch-based RL updates
    (the reference's TensorDataset minibatching, `trainers.py:1529-1539`)."""
    return jax.tree_util.tree_map(lambda x: x[idx], exp)


def pad_experience_time(exp: Experience, length: int) -> Experience:
    """Zero-pad every time-indexed leaf to a FIXED `length` (time axis 1;
    `video` at axis 2) and normalize `lens`/`is_truncated` so the padding is
    masked out downstream.

    Jitted consumers (SimTrainer's RL/world-model update steps) call this so
    env rollouts of any episode length hit ONE compiled program. Without it,
    every distinct longest-episode-in-batch length recompiles the update
    step — measured on CPU: ~20 s per recompile plus ~3.2k LLVM-JIT mmaps
    that are never unmapped, so a CartPole SimTrainer run dies on
    vm.max_map_count (ENOMEM in the LLVM execution engine) after ~20
    iterations. The reference never hits this because PyTorch is not traced
    by shape; under XLA the static pad is the idiomatic form (masking via
    `lens` is already how every loss handles ragged episodes).
    """
    t = exp.time_steps
    if t > length:
        raise ValueError(f'experience time dim {t} exceeds pad length {length}')
    b = exp.batch_size
    if exp.lens is None:
        exp = exp.replace(lens=jnp.full((b,), t))
    if exp.is_truncated is None:
        exp = exp.replace(is_truncated=jnp.ones((b,), bool))
    if t == length:
        return exp

    video, exp = exp.video, exp.replace(video=None)

    def pad_leaf(x):
        if not isinstance(x, (jax.Array, np.ndarray)) or x.ndim < 2:
            return x
        return _pad_to(x, length, axis=1)

    exp = jax.tree.map(pad_leaf, exp)
    if video is not None:
        exp = exp.replace(video=_pad_to(video, length, axis=2))
    return exp


def combine_experiences(exps: list[Experience]) -> Experience:
    """Pad time dims to the max then concatenate along batch (reference
    `combine_experiences`, `dreamer4.py:248-309`)."""
    assert len(exps) > 0

    # normalize lens / truncation flags
    normed = []
    for exp in exps:
        b, t = exp.batch_size, exp.time_steps
        if exp.lens is None:
            exp = exp.replace(lens=jnp.full((b,), t))
        if exp.is_truncated is None:
            exp = exp.replace(is_truncated=jnp.ones((b,), bool))
        normed.append(exp)
    exps = normed

    max_t = max(e.time_steps for e in exps)

    def pad_tree(exp):
        def pad_leaf(x):
            if not isinstance(x, (jax.Array, np.ndarray)) or x.ndim < 2:
                return x
            x = _pad_to(x, max_t, axis=1)
            if x.ndim >= 3 and any(e.time_steps != max_t for e in exps):
                pass
            return x
        return jax.tree.map(pad_leaf, exp)

    exps = [pad_tree(e) for e in exps]

    def cat_leaves(*leaves):
        first = leaves[0]
        if isinstance(first, (jax.Array, np.ndarray)):
            if first.ndim == 0:
                return jnp.stack(leaves)
            return jnp.concatenate(leaves, axis=0)
        return first

    return jax.tree.map(cat_leaves, *exps)


# ------------------------------------------------------- replay-buffer bridge

BUFFER_META_FIELDS = ('step_size', 'lens', 'is_truncated', 'terminals',
                      'agent_index', 'is_from_world_model', 'episode_return')


def experience_buffer_fields(exp: Experience) -> tuple[dict, dict]:
    """Infer (fields, meta_fields) specs for `ReplayBuffer` from a template
    experience (reference `Experience.create_memmap_replay_buffer`,
    `dreamer4.py:187-205`)."""
    def dtype_str(x):
        if x.dtype == np.bool_ or x.dtype == jnp.bool_:
            return 'bool'
        if jnp.issubdtype(x.dtype, jnp.floating):
            return 'float'
        return 'int'

    fields, meta = {}, {}
    data_dict, meta_dict = _experience_dicts(exp)
    for k, v in data_dict.items():
        fields[k] = (dtype_str(v), tuple(v.shape[2:]))
    for k, v in meta_dict.items():
        if hasattr(v, 'shape'):
            meta[k] = (dtype_str(v), tuple(v.shape[1:]))
        else:
            meta[k] = ('int', ())
    return fields, meta


def _experience_dicts(exp: Experience) -> tuple[dict, dict]:
    data, meta = {}, {}
    for name in ('latents', 'video', 'proprio', 'critic_state', 'agent_embed',
                 'rewards', 'values'):
        v = getattr(exp, name)
        if v is not None:
            data[name] = v
    for pair_name in ('actions', 'log_probs'):
        pair = getattr(exp, pair_name)
        if pair is not None:
            if pair.discrete is not None:
                data[f'{pair_name}_discrete'] = pair.discrete
            if pair.continuous is not None:
                data[f'{pair_name}_continuous'] = pair.continuous
    for name in BUFFER_META_FIELDS:
        v = getattr(exp, name)
        if v is not None:
            meta[name] = v
    return data, meta


def create_experience_replay_buffer(template: Experience, folder, max_episodes,
                                    max_timesteps, **kwargs):
    from .replay_buffer import ReplayBuffer

    fields, meta = experience_buffer_fields(template)
    return ReplayBuffer(folder, max_episodes, max_timesteps,
                        fields=fields, meta_fields=meta, **kwargs)


def add_experience_to_buffer(exp: Experience, buffer):
    """Store each batch row as one episode (reference `add_to_memmap_buffer`,
    `dreamer4.py:207-215`); video stored as (t, c, h, w)."""
    data, meta = _experience_dicts(exp)
    data = {k: np.asarray(v) for k, v in data.items()}
    if 'video' in data:  # (b, c, t, h, w) -> (b, t, c, h, w)
        data['video'] = np.moveaxis(data['video'], 1, 2)

    b = exp.batch_size
    lens = np.asarray(exp.lens) if exp.lens is not None else np.full((b,), exp.time_steps)

    meta_np = {}
    for k, v in meta.items():
        meta_np[k] = np.asarray(v) if hasattr(v, 'shape') or isinstance(v, (list, tuple)) \
            else np.full((b,), v)
        if meta_np[k].ndim == 0:
            meta_np[k] = np.full((b,), meta_np[k])

    with buffer.batched_episode(batch_size=b, **meta_np) as slots:
        for t in range(int(lens.max())):
            buffer.store_batch(**{k: v[:, t] for k, v in data.items()})
    # correct per-episode lengths (batched_episode records the common count)
    buffer._lengths[slots] = lens
    buffer._flush()


def experience_from_batch(batch: dict, step_size: int | None = None) -> Experience:
    """Rebuild an Experience from a `ReplayBuffer.sample_batch` dict
    (reference `from_buffer_dict`, `dreamer4.py:217-236`)."""
    def get(k):
        v = batch.get(k)
        return jnp.asarray(v) if v is not None else None

    actions = None
    if 'actions_discrete' in batch or 'actions_continuous' in batch:
        actions = Actions(get('actions_discrete'), get('actions_continuous'))
    log_probs = None
    if 'log_probs_discrete' in batch or 'log_probs_continuous' in batch:
        log_probs = Actions(get('log_probs_discrete'), get('log_probs_continuous'))

    video = get('video')
    if video is not None and video.ndim == 5:
        video = jnp.moveaxis(video, 1, 2)  # (b, t, c, h, w) -> (b, c, t, h, w)

    ss = batch.get('step_size', step_size)
    if ss is not None and hasattr(ss, '__len__'):
        ss = int(np.asarray(ss).reshape(-1)[0])

    return Experience(
        latents=get('latents'),
        video=video,
        proprio=get('proprio'),
        critic_state=get('critic_state'),
        agent_embed=get('agent_embed'),
        rewards=get('rewards'),
        terminals=get('terminals'),
        actions=actions,
        log_probs=log_probs,
        values=get('values'),
        step_size=int(ss) if ss is not None else None,
        lens=get('lens'),
        is_truncated=get('is_truncated'),
        episode_return=get('episode_return'),
    )
