"""Trainers — jit-compiled train steps plus thin host loops.

TPU-native equivalents of the reference trainers (`trainers.py:419-1727`):
- VideoTokenizerTrainer   -> tokenizer_train_step + TokenizerTrainer loop
- BehaviorCloneTrainer    -> world_model_train_step + BehaviorCloneTrainer
- DreamTrainer            -> dream_update (generate -> rl_losses -> head update)
- SimTrainer              -> SimTrainer (interact -> combine -> minibatch updates)

Where the reference wraps torch DDP via Accelerate (`trainers.py:466-469`),
these steps are pure functions: run them under `jax.jit` with a Mesh and
data-sharded batches and GSPMD inserts the gradient collectives.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.experience import Experience
from ..models.generate import generate
from ..models.rl import ReturnStats, rl_losses
from ..models.tokenizer import VideoTokenizer
from ..models.world_model import DynamicsWorldModel
from .ema import update_ema
from .optim import muon_adam_atan2


class TrainState(NamedTuple):
    params: Any
    state: Any            # linen 'state' collection (loss normalizers etc)
    opt_state: Any
    ema_params: Any | None
    step: jax.Array


def create_train_state(variables, tx, with_ema: bool = False) -> TrainState:
    params = variables['params']
    return TrainState(
        params=params,
        state=variables.get('state', {}),
        opt_state=tx.init(params),
        ema_params=params if with_ema else None,
        step=jnp.zeros((), jnp.int32),
    )


def _applied_update(opt_state):
    """Whether this tx.update actually changed params. Always true for plain
    optimizers; under `optax.MultiSteps` (grad accumulation, reference
    `trainers.py:648-682`) only the boundary micro-step applies, detected by
    the accumulator wrapping back to mini_step == 0."""
    mini_step = getattr(opt_state, 'mini_step', None)
    return None if mini_step is None else (mini_step == 0)


def _gated_ema(ema_params, new_params, decay, applied):
    """EMA lerp, frozen on accumulation-only micro-steps (the reference
    updates EMA once per optimizer step, `trainers.py:694`)."""
    if ema_params is None:
        return None
    new = update_ema(ema_params, new_params, decay)
    if applied is None:
        return new
    return jax.tree.map(lambda n, e: jnp.where(applied, n, e), new, ema_params)


def _step_increment(step, applied):
    if applied is None:
        return step + 1
    return step + applied.astype(jnp.int32)


def with_grad_accum(tx, grad_accum: int):
    """Wrap an optimizer to average gradients over `grad_accum` micro-batches
    before applying (the reference's default tokenizer recipe is batch 8 x
    grad-accum 8, `cli.py:41-43`)."""
    if grad_accum <= 1:
        return tx
    return optax.MultiSteps(tx, every_k_schedule=grad_accum)


# ---------------------------------------------------------------- tokenizer

def make_tokenizer_train_step(model: VideoTokenizer, tx, ema_decay: float = 0.999,
                              lpips_fn=None):
    """`lpips_fn(recon, clean, key, time_lens)` is a fixed closure built once
    (see nn/lpips.py) so the jit cache is stable."""
    from ..models.tokenizer import latent_consistency_loss, video_to_internal

    @partial(jax.jit, static_argnames=('train_flow_decoder',))
    def train_step(ts: TrainState, video, time_lens, key, train_flow_decoder: bool = False):
        byol_targets = None
        if model.has_byol and ts.ema_params is not None:
            byol_targets = model.apply(
                {'params': ts.ema_params, 'state': ts.state}, video, return_latents=True)

        def loss_fn(params):
            variables = {'params': params, 'state': ts.state}
            (loss, interm), new_vars = model.apply(
                variables, video, time_lens=time_lens, return_intermediates=True,
                byol_target_latents=byol_targets, lpips_fn=lpips_fn,
                train_flow_decoder=train_flow_decoder,
                rngs={'sample': key}, mutable=['state'])

            if model.latent_consistency_loss_weight > 0.0:
                lc = latent_consistency_loss(model, variables, interm.recon,
                                             interm.latents, time_lens=time_lens)
                loss = loss + lc * model.latent_consistency_loss_weight

            return loss, (new_vars.get('state', {}), interm.losses)

        (loss, (new_state, losses)), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        updates, new_opt_state = tx.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        applied = _applied_update(new_opt_state)
        new_ema = _gated_ema(ts.ema_params, new_params, ema_decay, applied)
        new_ts = TrainState(new_params, new_state, new_opt_state, new_ema,
                            _step_increment(ts.step, applied))
        return new_ts, loss, losses

    return train_step


# --------------------------------------------------------------- dynamics

def make_world_model_train_step(model: DynamicsWorldModel, tx, ema_decay: float = 0.999,
                                self_flow_cfg: dict | None = None):
    """`self_flow_cfg`: dict(head=SelfFlowHead, student_layer=int,
    teacher_layer=int, weight=float) — head params live under the reserved
    'self_flow_head' key of the param tree."""

    # NOTE: the TrainState is deliberately NOT donated — ema_params aliases
    # params at init and several callers (dream/sim trainers, examples) hold
    # references across steps; donation broke both (buffer-donated-twice /
    # deleted-array errors).
    @partial(jax.jit, static_argnames=('shortcut_train',))
    def train_step(ts: TrainState, batch: dict, key, shortcut_train: bool):
        def loss_fn(params):
            sf_params = params.get('self_flow_head') if self_flow_cfg is not None else None
            model_params = {k: v for k, v in params.items() if k != 'self_flow_head'}

            batch_kwargs = dict(
                latents=batch['latents'],
                rewards=batch.get('rewards'),
                terminals=batch.get('terminals'),
                discrete_actions=batch.get('discrete_actions'),
                continuous_actions=batch.get('continuous_actions'),
                proprio=batch.get('proprio'),
                lens=batch.get('lens'),
                tasks=batch.get('tasks'),
                shortcut_train=shortcut_train,
            )

            (loss, losses, _), new_vars = model.apply(
                {'params': model_params, 'state': ts.state},
                return_intermediates=True,
                rngs={'sample': key}, mutable=['state'], **batch_kwargs)

            if self_flow_cfg is not None and ts.ema_params is not None:
                from ..models.self_flow import self_flow_loss

                ema_model_params = {k: v for k, v in ts.ema_params.items()
                                    if k != 'self_flow_head'}
                sf = self_flow_loss(
                    model, self_flow_cfg['head'], {'params': sf_params},
                    {'params': model_params, 'state': ts.state},
                    {'params': ema_model_params, 'state': ts.state},
                    batch_kwargs, jax.random.fold_in(key, 17),
                    student_layer=self_flow_cfg.get('student_layer', -3),
                    teacher_layer=self_flow_cfg.get('teacher_layer', -1),
                    lens=batch.get('lens'))
                loss = loss + sf * self_flow_cfg.get('weight', 1.0)

            return loss, (new_vars.get('state', {}), losses)

        (loss, (new_state, losses)), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        updates, new_opt_state = tx.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        applied = _applied_update(new_opt_state)
        new_ema = _gated_ema(ts.ema_params, new_params, ema_decay, applied)
        new_ts = TrainState(new_params, new_state, new_opt_state, new_ema,
                            _step_increment(ts.step, applied))
        return new_ts, loss, losses

    return train_step


# ---------------------------------------------------------------------- RL

def rl_param_labels(params, model: DynamicsWorldModel, full_model: bool = False) -> Any:
    """'policy' for policy-head + action unembeds, 'value' for the value head;
    everything else is 'frozen' in heads-only RL (reference
    `dreamer4.py:5343-5363`) or 'trunk' when fine-tuning the full model
    (reference's `only_learn_policy_value_heads=False` mode, where the
    re-forwarded transformer gets its own optimizer group)."""
    rest = 'trunk' if full_model else 'frozen'

    def label(path, x):
        top = path[0].key if hasattr(path[0], 'key') else str(path[0])
        if top in ('policy_head', 'actor_latent_encoder'):
            return 'policy'
        if top in ('value_head', 'critic_latent_encoder'):
            return 'value'
        if top == 'action_embedder':
            name = path[1].key if len(path) > 1 and hasattr(path[1], 'key') else ''
            if 'unembed' in name:
                return 'policy'
        if top == 'critic_state_embedder':
            return 'value'
        return rest
    return jax.tree_util.tree_map_with_path(label, params)


def make_rl_optimizer(model: DynamicsWorldModel, policy_lr=1e-4, value_lr=1e-4,
                      trunk_lr: float | None = None):
    """trunk_lr=None -> heads-only RL (trunk frozen); a float fine-tunes the
    whole world model at that rate (pair with
    `rl_losses(only_learn_policy_value_heads=False)` so trunk grads exist)."""
    full_model = trunk_lr is not None
    transforms = {'policy': optax.adamw(policy_lr),
                  'value': optax.adamw(value_lr)}
    if full_model:
        transforms['trunk'] = optax.adamw(trunk_lr)
    else:
        transforms['frozen'] = optax.set_to_zero()
    return lambda params: optax.multi_transform(
        transforms, rl_param_labels(params, model, full_model=full_model))


class RLState(NamedTuple):
    params: Any
    opt_state: Any
    return_stats: ReturnStats
    step: jax.Array


def make_rl_update_step(model: DynamicsWorldModel, tx, objective: str = 'ppo',
                        only_learn_policy_value_heads: bool = True,
                        **rl_loss_kwargs):
    """Pass `only_learn_policy_value_heads=False` (with a `make_rl_optimizer`
    built with `trunk_lr=`) for full-model RL — the loss then re-forwards the
    trunk with gradients (reference `dreamer4.py:6048-6070`)."""
    @jax.jit
    def update_step(rl_state: RLState, experience: Experience):
        def loss_fn(params):
            out = rl_losses(model, {'params': params}, experience,
                            objective=objective,
                            only_learn_policy_value_heads=only_learn_policy_value_heads,
                            return_stats=rl_state.return_stats,
                            **rl_loss_kwargs)
            return out.policy_loss + out.value_loss, out

        (total, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(rl_state.params)
        updates, new_opt_state = tx.update(grads, rl_state.opt_state, rl_state.params)
        new_params = optax.apply_updates(rl_state.params, updates)
        return RLState(new_params, new_opt_state, out.return_stats, rl_state.step + 1), out

    return update_step


# --------------------------------------------------------------- dream loop

class DreamTrainer:
    """RL purely in imagination (reference `DreamTrainer`,
    `trainers.py:1330-1468`): generate -> learn_from_experience."""

    def __init__(self, model: DynamicsWorldModel, variables, *,
                 time_steps: int = 16, num_steps: int = 4, batch_size: int = 8,
                 objective: str = 'ppo', policy_lr: float = 1e-4, value_lr: float = 1e-4,
                 update_epochs: int = 1,
                 prompt_fn=None, generate_kwargs: dict | None = None):
        """`prompt_fn(key) -> dict of prompt_* arrays` (fixed shapes) lets
        dreams start from real experience latents instead of nothing;
        `generate_kwargs` passes terminal calibration etc. through to
        `generate` (e.g. terminal_logit_offset, min_dream_length);
        `update_epochs` reuses each (expensive) dream for several PPO
        updates — the importance ratio/clip in the objective handles the
        off-policy drift, and generate dominates the step cost."""
        self.model = model
        self.time_steps = time_steps
        self.num_steps = num_steps
        self.batch_size = batch_size
        self.objective = objective
        self.update_epochs = update_epochs
        self.prompt_fn = prompt_fn

        params = variables['params']
        self.tx = make_rl_optimizer(model, policy_lr, value_lr)(params)
        self.rl_state = RLState(params=params, opt_state=self.tx.init(params),
                                return_stats=ReturnStats.create(),
                                step=jnp.zeros((), jnp.int32))
        self.state_collection = variables.get('state', {})

        gen_kwargs = dict(generate_kwargs or {})

        # `state` is an explicit jit argument — a closure capture would be
        # baked into the trace as constants and silently ignore later
        # assignments to self.state_collection (e.g. after WM refreshes)
        @partial(jax.jit, static_argnames=('prompt_keys',))
        def _generate(params, state, key, prompt_keys=(), prompt_values=()):
            return generate(
                model, {'params': params, 'state': state}, key,
                time_steps=time_steps, num_steps=num_steps, batch_size=batch_size,
                **dict(zip(prompt_keys, prompt_values)), **gen_kwargs)

        self._generate = _generate
        self._update = make_rl_update_step(model, self.tx, objective)

    @property
    def variables(self):
        return {'params': self.rl_state.params, 'state': self.state_collection}

    def dream(self, key) -> Experience:
        prompt = self.prompt_fn(key) if self.prompt_fn is not None else {}
        return self._generate(self.rl_state.params, self.state_collection, key,
                              prompt_keys=tuple(sorted(prompt)),
                              prompt_values=tuple(v for _, v in sorted(prompt.items())))

    def step(self, key):
        experience = self.dream(key)
        for _ in range(self.update_epochs):
            self.rl_state, out = self._update(self.rl_state, experience)
        return experience, out

    def __call__(self, num_steps: int, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        logs = []
        for i in range(num_steps):
            _, out = self.step(jax.random.fold_in(key, i))
            logs.append({k: float(v) for k, v in out.stats.items()})
        return logs


class SimTrainer:
    """Online RL: interact with a real env, accumulate experience, then run
    epochs of minibatched updates (reference `SimTrainer`,
    `trainers.py:1472-1727`)."""

    def __init__(self, model: DynamicsWorldModel, variables, env, *,
                 tokenizer=None, tokenizer_variables=None,
                 objective: str = 'ppo', policy_lr: float = 1e-4, value_lr: float = 1e-4,
                 rl_trunk_lr: float | None = None,
                 num_steps: int = 4, max_timesteps: int = 16,
                 num_rollouts_per_step: int = 1, update_epochs: int = 2,
                 minibatch_size: int | None = None,
                 train_dynamics: bool = True, dynamics_lr: float = 3e-4,
                 dynamics_epochs: int = 1, seed: int = 0):
        """`rl_trunk_lr` switches to full-model RL: the policy/value losses
        re-forward the trunk with gradients and a third optimizer group
        fine-tunes it at that rate (the reference's image-mode agent trains
        its encoder features directly from the PPO signal,
        `train_cartpole_with_dynamics_rl.py:379-403`; heads-only RL leaves
        trunk features to the dynamics loss alone, which is too weak a
        signal for sparse-reward tasks)."""
        from ..envs.interact import EnvInteractor

        self.model = model
        self.env = env
        self.num_steps = num_steps
        self.max_timesteps = max_timesteps
        self.num_rollouts_per_step = num_rollouts_per_step
        self.update_epochs = update_epochs
        self.minibatch_size = minibatch_size
        self.tokenizer_variables = tokenizer_variables

        params = variables['params']
        self.state_collection = variables.get('state', {})
        self.tx = make_rl_optimizer(model, policy_lr, value_lr,
                                    trunk_lr=rl_trunk_lr)(params)
        self.rl_state = RLState(params=params, opt_state=self.tx.init(params),
                                return_stats=ReturnStats.create(),
                                step=jnp.zeros((), jnp.int32))
        self.interactor = EnvInteractor(model, tokenizer=tokenizer)
        self._update = make_rl_update_step(
            model, self.tx, objective,
            only_learn_policy_value_heads=rl_trunk_lr is None)

        # interleaved world-model learning on collected experience (the
        # reference cartpole recipe trains the dynamics alongside RL so the
        # frozen-trunk agent embeds become predictive)
        self.train_dynamics = train_dynamics
        self.dynamics_epochs = dynamics_epochs
        self.rng = np.random.default_rng(seed)
        if train_dynamics:
            self.wm_tx = muon_adam_atan2(learning_rate=dynamics_lr, clip_grad_norm=1.0)
            self.wm_opt_state = self.wm_tx.init(params)
            self._wm_step = make_world_model_train_step(model, self.wm_tx)
            self.wm_key = jax.random.PRNGKey(seed + 13)

    @property
    def variables(self):
        return {'params': self.rl_state.params, 'state': self.state_collection}

    def step(self, key):
        from ..data.experience import combine_experiences, pad_experience_time

        exps = []
        for r in range(self.num_rollouts_per_step):
            exp = self.interactor(
                self.variables, self.env, jax.random.fold_in(key, r),
                tokenizer_variables=self.tokenizer_variables,
                num_steps=self.num_steps, max_timesteps=self.max_timesteps)
            exps.append(exp)
        experience = combine_experiences(exps) if len(exps) > 1 else exps[0]
        # Static time dim: the interactor trims to this batch's longest
        # episode, which would recompile _update/_wm_step on every new
        # length (and leak LLVM-JIT mmaps until ENOMEM — see
        # pad_experience_time). The +1 covers the truncation-bootstrap frame.
        experience = pad_experience_time(experience, self.max_timesteps + 1)

        # interleaved dynamics learning on the fresh experience
        if self.train_dynamics and experience.time_steps > 1:
            batch = dict(
                latents=experience.latents,
                rewards=experience.rewards,
                terminals=experience.terminals,
                lens=experience.lens,
            )
            if experience.actions is not None:
                if experience.actions.discrete is not None:
                    batch['discrete_actions'] = experience.actions.discrete
                if experience.actions.continuous is not None:
                    batch['continuous_actions'] = experience.actions.continuous

            ts = TrainState(params=self.rl_state.params, state=self.state_collection,
                            opt_state=self.wm_opt_state, ema_params=None,
                            step=self.rl_state.step)
            for _ in range(self.dynamics_epochs):
                shortcut = bool(self.rng.random() < self.model.prob_shortcut_train)
                self.wm_key, sub = jax.random.split(self.wm_key)
                ts, wm_loss, _ = self._wm_step(ts, batch, sub, shortcut_train=shortcut)
            self.wm_opt_state = ts.opt_state
            self.state_collection = ts.state
            self.rl_state = self.rl_state._replace(params=ts.params)

        from ..data.experience import index_experience

        b = experience.batch_size
        mb = min(max(self.minibatch_size or b, 1), b)
        outs = []
        for e in range(self.update_epochs):
            if mb == b:
                self.rl_state, out = self._update(self.rl_state, experience)
                outs.append(out)
                continue
            # reference-style minibatched epochs (trainers.py:1529-1539);
            # fixed minibatch shape keeps one compiled update program. A
            # non-divisible tail is dropped — each epoch draws a fresh
            # permutation, so every row is trained with equal probability in
            # expectation (wrapping the tail would train those rows twice
            # per epoch, over-weighting them).
            perm = self.rng.permutation(b)
            for s in range(0, b - mb + 1, mb):
                idx = perm[s:s + mb]
                self.rl_state, out = self._update(
                    self.rl_state, index_experience(experience, jnp.asarray(idx)))
                outs.append(out)
        return experience, outs

    def __call__(self, num_steps: int, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        returns = []
        for i in range(num_steps):
            experience, _ = self.step(jax.random.fold_in(key, i))
            returns.append(float(np.mean(np.asarray(experience.episode_return))))
        return returns


# --------------------------------------------------------- behavior cloning

class _CheckpointableTrainer:
    """Save/resume for trainers: full TrainState (params, loss-normalizer
    state, optimizer state, EMA params, step) plus the model config, written
    as step-tagged directories with a floating `latest` copy — the reference's
    `tokenizer-{step}.pt` + `-ema.pt` + `latest` policy
    (`trainers.py:792-820`) and `load` resumption (`trainers.py:599-624`)."""

    model = None  # type: ignore[assignment]
    ts: TrainState

    def save_checkpoint(self, path, extra: dict | None = None, tag_step: bool = True):
        from pathlib import Path

        from .checkpoint import save_model, save_train_state

        path = Path(path)
        step = int(self.ts.step)
        target = path / f'ckpt-{step}' if tag_step else path
        # capture the host-loop RNG so resumption is bit-exact (the branch
        # draws and per-step keys continue where they left off)
        extra = dict(extra or {})
        if getattr(self, 'key', None) is not None:
            key = self.key
            if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
                # record the impl so restore() re-wraps to a typed key of the
                # same flavor instead of silently downgrading to a raw
                # uint32 key array
                extra['_jax_key_impl'] = str(jax.random.key_impl(key))
                key = jax.random.key_data(key)
            extra['_jax_key'] = np.asarray(key).tolist()
        if getattr(self, 'rng', None) is not None:
            extra['_np_rng'] = self.rng.bit_generator.state
        save_model(target, self.model,
                   {'params': self.ts.params, 'state': self.ts.state},
                   extra=dict(step=step, **(extra or {})))
        if self.ts.ema_params is not None:
            # EMA weights as a standalone loadable model checkpoint
            save_model(target / 'ema', self.model,
                       {'params': self.ts.ema_params, 'state': self.ts.state},
                       extra=dict(step=step, ema=True))
        save_train_state(target, self.ts, extra=extra)
        if tag_step:
            latest = path / 'latest'
            latest_tmp = path / '.latest.tmp'
            if latest_tmp.is_symlink() or latest_tmp.exists():
                latest_tmp.unlink()
            latest_tmp.symlink_to(target.name)
            if latest.exists() and not latest.is_symlink():
                # `latest` materialized as a real directory (e.g. a
                # checkpoint tree copied with symlink dereferencing) —
                # replace() would raise IsADirectoryError
                import shutil
                shutil.rmtree(latest)
            latest_tmp.replace(latest)
        return target

    def restore(self, path) -> dict:
        """Restore TrainState in place from a checkpoint dir (or a dir
        containing `latest`). Returns the checkpoint's extra metadata."""
        from pathlib import Path

        from .checkpoint import load_train_state

        path = Path(path)
        if (path / 'latest').exists():
            path = (path / 'latest').resolve()
        self.ts, extra = load_train_state(path, abstract_ts=self.ts)
        if '_jax_key' in extra and getattr(self, 'key', None) is not None:
            key = jnp.asarray(extra.pop('_jax_key'), jnp.uint32)
            impl = extra.pop('_jax_key_impl', None)
            if impl is not None:
                # the key was typed at save time — re-wrap so its type
                # survives the resume round-trip
                key = jax.random.wrap_key_data(key, impl=impl)
            self.key = key
        if '_np_rng' in extra and getattr(self, 'rng', None) is not None:
            self.rng.bit_generator.state = extra.pop('_np_rng')
        return extra


class BehaviorCloneTrainer(_CheckpointableTrainer):
    """Dynamics-model training over offline batches (reference
    `BehaviorCloneTrainer`, `trainers.py:828-1326`). Host loop: sample batch
    from the replay buffer / dataset, tokenize video if needed, call the
    jitted train step; the shortcut branch is a host-side bernoulli
    (two compiled variants)."""

    def __init__(self, model: DynamicsWorldModel, variables, *,
                 tokenizer: VideoTokenizer | None = None, tokenizer_variables=None,
                 aux_image_encoder_fn=None,
                 learning_rate: float = 3e-4, clip_grad_norm: float = 1.0,
                 grad_accum: int = 1,
                 with_ema: bool = True, ema_decay: float = 0.999, seed: int = 0,
                 use_self_flow: bool = False, self_flow_weight: float = 1.0,
                 self_flow_student_layer: int = -3, self_flow_teacher_layer: int = -1):
        """`aux_image_encoder_fn(video) -> (b, t, n_aux, d_latent)` tokens are
        appended to the tokenizer latents along the token axis (reference
        aux_image_encoder, `dreamer4.py:5386-5404, 5914-5921`); construct the
        model with `num_latent_tokens = tokenizer tokens + n_aux`."""
        self.model = model
        self.tokenizer = tokenizer
        self.tokenizer_variables = tokenizer_variables
        self.aux_image_encoder_fn = aux_image_encoder_fn
        self.tx = with_grad_accum(
            muon_adam_atan2(learning_rate=learning_rate, clip_grad_norm=clip_grad_norm),
            grad_accum)

        self_flow_cfg = None
        if use_self_flow:
            from ..models.self_flow import SelfFlowHead

            head = SelfFlowHead(dim=model.dim)
            dummy = jnp.zeros((1, 2, 3, model.dim))
            head_vars = head.init(jax.random.PRNGKey(seed + 11), dummy, dummy)
            variables = dict(variables)
            variables['params'] = dict(variables['params'])
            variables['params']['self_flow_head'] = head_vars['params']
            self_flow_cfg = dict(head=head, weight=self_flow_weight,
                                 student_layer=self_flow_student_layer,
                                 teacher_layer=self_flow_teacher_layer)

        self.ts = create_train_state(variables, self.tx, with_ema=with_ema or use_self_flow)
        self._train_step = make_world_model_train_step(self.model, self.tx, ema_decay,
                                                       self_flow_cfg=self_flow_cfg)
        self._tokenize = None
        if tokenizer is not None:
            self._tokenize = jax.jit(lambda tv, video: tokenizer.apply(
                tv, video, return_latents=True))
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)

    def train_on_batch(self, batch: dict):
        batch = dict(batch)
        if 'latents' not in batch:
            assert (self._tokenize is not None or self.aux_image_encoder_fn is not None) \
                and 'video' in batch
            parts = []
            if self._tokenize is not None:
                parts.append(self._tokenize(self.tokenizer_variables, batch['video']))
            if self.aux_image_encoder_fn is not None:
                parts.append(self.aux_image_encoder_fn(batch['video']))
            batch['latents'] = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-2)
        batch.pop('video', None)

        shortcut = bool(self.rng.random() < self.model.prob_shortcut_train)
        self.key, sub = jax.random.split(self.key)
        self.ts, loss, losses = self._train_step(self.ts, batch, sub, shortcut_train=shortcut)
        return loss, losses


class TokenizerTrainer(_CheckpointableTrainer):
    """Tokenizer training loop core (reference `VideoTokenizerTrainer`,
    `trainers.py:419-824`)."""

    def __init__(self, model: VideoTokenizer, variables, *,
                 learning_rate: float = 3e-4, clip_grad_norm: float = 1.0,
                 grad_accum: int = 1,
                 with_ema: bool = True, ema_decay: float = 0.999, seed: int = 0,
                 use_lpips: bool = False, lpips_weights_path: str | None = None):
        self.model = model
        self.tx = with_grad_accum(
            muon_adam_atan2(learning_rate=learning_rate, clip_grad_norm=clip_grad_norm),
            grad_accum)
        self.ts = create_train_state(variables, self.tx, with_ema=with_ema)

        lpips_fn = None
        if use_lpips and model.lpips_loss_weight > 0.0:
            from ..nn.lpips import init_lpips, lpips_loss as _lpips_loss

            lpips_module, lpips_vars = init_lpips(jax.random.PRNGKey(seed + 7),
                                                  weights_path=lpips_weights_path)

            def lpips_fn(recon, clean, key, time_lens):  # noqa: F811
                return _lpips_loss(lpips_module, lpips_vars, recon, clean, key,
                                   time_lens=time_lens)

        self._train_step = make_tokenizer_train_step(model, self.tx, ema_decay,
                                                     lpips_fn=lpips_fn)
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)

    def train_on_batch(self, video, time_lens=None):
        self.key, sub = jax.random.split(self.key)
        train_flow = (self.model.has_separate_flow_decoder
                      and bool(self.rng.random() < self.model.flow_decoder_train_prob))
        self.ts, loss, losses = self._train_step(self.ts, video, time_lens, sub,
                                                 train_flow_decoder=train_flow)
        return loss, losses
