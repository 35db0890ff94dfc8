"""Real-environment rollout: the host-side actor loop.

TPU-native re-design of the reference `interact_with_env`
(`dreamer4.py:5470-5889`). The env steps on the host (process boundary);
everything per frame on the device is ONE compiled step — tokenize frame →
world-model forward (KV cache) → value head → policy sample → log probs —
so the host↔device boundary carries only the observation in and the action
out. Multi-host scaling runs one interactor per host feeding a sharded
learner (SURVEY.md section 5 'distributed communication backend').
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..data.experience import Experience
from ..nn.action_embedder import Actions
from ..models.world_model import DynamicsWorldModel


def _parse_step_out(env_step_out, batch):
    """Robustly parse 2/3/4/5-tuple env.step returns (reference
    `env.py:167-211`)."""
    n = len(env_step_out)
    obs = env_step_out[0]
    reward = env_step_out[1] if n >= 2 else 0.0
    terminated = env_step_out[2] if n >= 3 else np.zeros((batch,), bool)
    truncated = env_step_out[3] if n >= 4 else np.zeros((batch,), bool)
    return obs, reward, terminated, truncated


def _normalize_obs(obs):
    if isinstance(obs, tuple):
        obs = obs[0]
    if not isinstance(obs, dict):
        obs = np.asarray(obs, np.float32)
        obs = {'image': obs} if obs.ndim >= 3 else {'state': obs}
    return obs


class EnvInteractor:
    """Holds the jitted per-frame step functions for a (model, tokenizer)
    pair so repeated interactions reuse the compiled programs."""

    def __init__(self, model: DynamicsWorldModel, tokenizer=None,
                 obs_to_latents_fn: Callable | None = None,
                 aux_image_encoder_fn: Callable | None = None):
        self.model = model
        self.tokenizer = tokenizer
        self.obs_to_latents_fn = obs_to_latents_fn
        # optional aux image encoder: extra latent tokens concatenated after
        # the tokenizer's (reference aux_image_encoder, `dreamer4.py:5386-5404`;
        # size them into the model's num_latent_tokens)
        self.aux_image_encoder_fn = aux_image_encoder_fn

        self.na_d = len([n for n in model.num_discrete_actions if n > 0])
        self.na_c = model.num_continuous_actions

        self._tokenize_step = None
        if tokenizer is not None:
            @partial(jax.jit, static_argnames=('max_time',))
            def tokenize_step(tok_vars, frame, cache, max_time=None):
                # frame: (b, c, 1, h, w)
                if cache is None:
                    return tokenizer.apply(tok_vars, frame, method=tokenizer.encode,
                                           mask_patches=False, max_time=max_time,
                                           return_cache=True)
                return tokenizer.apply(tok_vars, frame, method=tokenizer.encode,
                                       mask_patches=False, cache=cache, return_cache=True)
            self._tokenize_step = tokenize_step

        @partial(jax.jit, static_argnames=('first', 'num_steps', 'agent_index'))
        def policy_step(variables, latents, prev_disc, prev_cont, prev_reward,
                        critic_state, cache, key, first, num_steps, agent_index=0):
            b = latents.shape[0]
            step_size = model.max_steps // num_steps
            valid = jnp.zeros((b, 1)) if first else jnp.ones((b, 1))

            kwargs: dict[str, Any] = {}
            if self.na_d > 0:
                kwargs['discrete_actions'] = prev_disc
            if self.na_c > 0:
                kwargs['continuous_actions'] = prev_cont
            if model.has_actions:
                kwargs['action_token_mask'] = valid
            if model.add_reward_embed_to_agent_token:
                kwargs['rewards'] = prev_reward
                kwargs['reward_token_mask'] = valid

            pred, (embeds, new_cache) = model.apply(
                variables, rngs={'sample': key},
                latents=latents,
                signal_levels=model.max_steps - 1,
                step_sizes=step_size,
                cache=cache,
                latent_is_noised=True, is_training=False,
                return_pred_only=True, return_intermediates=True,
                agent_index=agent_index,
                **kwargs)

            agent_embed = embeds.agent[:, -1, agent_index]  # (b, d)

            # state-entropy exploration bonus (reference `dreamer4.py:5735-5740`)
            state_entropy = None
            if model.add_state_entropy_bonus and pred.state is not None:
                from ..ops import dists as _dists
                ent = _dists.continuous_entropy(pred.state[:, -1], 'beta')
                state_entropy = jnp.mean(ent.reshape(b, -1), axis=-1)  # (b,)

            actor_src = agent_embed
            value_embed = agent_embed
            if model.actor_critic_latent_input:
                actor_src, value_embed = model.apply(
                    variables, latents[:, -1],
                    method=lambda m, l: m.latent_actor_inputs(l))
            if model.dim_critic_state is not None and critic_state is not None:
                critic_embed = model.apply(variables, critic_state,
                                           method=lambda m, s: m.critic_state_embedder(s))
                value_embed = value_embed + critic_embed

            value_bins = model.apply(variables, value_embed, method=lambda m, e: m.value_head(e))
            value = model.value_encoder.decode(value_bins)

            policy_embed = model.apply(variables, actor_src, method=lambda m, e: m.policy_head(e))
            k_act, _ = jax.random.split(jax.random.fold_in(key, 1))
            sampled_d, sampled_c = model.apply(
                variables, k_act, policy_embed,
                method=lambda m, k, e: m.action_embedder.sample(k, e, pred_head_index=0))
            lp = model.apply(
                variables, policy_embed,
                method=lambda m, e: m.action_embedder.log_probs(
                    e, discrete_targets=sampled_d, continuous_targets=sampled_c,
                    pred_head_index=0))

            env_cont = None
            if self.na_c > 0 and model.action_embedder.target_action_range is not None:
                env_cont = model.apply(variables, sampled_c,
                                       method=lambda m, a: m.action_embedder.rescale_for_env(a))
            elif self.na_c > 0:
                env_cont = sampled_c

            return dict(value=value, agent_embed=agent_embed, policy_embed=policy_embed,
                        sampled_d=sampled_d, sampled_c=sampled_c, env_cont=env_cont,
                        log_probs=lp, cache=new_cache, state_entropy=state_entropy)

        self._policy_step = policy_step

    # ------------------------------------------------------------------ run

    def obs_to_latents(self, variables, tok_vars, obs, tok_cache, max_time):
        if self.obs_to_latents_fn is not None:
            return self.obs_to_latents_fn(obs, tok_cache)
        if 'image' in obs:
            assert self.tokenizer is not None or self.aux_image_encoder_fn is not None, \
                'tokenizer or aux encoder required for image observations'
            frame = jnp.asarray(obs['image'], jnp.float32)[:, :, None]  # (b, c, 1, h, w)
            latents, new_cache = None, tok_cache
            if self.tokenizer is not None:
                latents, new_cache = self._tokenize_step(
                    tok_vars, frame, tok_cache,
                    max_time=max_time if tok_cache is None else None)
            if self.aux_image_encoder_fn is not None:
                aux = self.aux_image_encoder_fn(frame)
                latents = aux if latents is None else jnp.concatenate([latents, aux], axis=-2)
            return latents, new_cache
        assert self.model.dim_state is not None, 'dim_state required for state observations'
        state = jnp.asarray(obs['state'], jnp.float32)
        latents = self.model.apply(variables, state, method=self.model.state_to_latents)
        return latents[:, None], tok_cache

    def __call__(
        self,
        variables,
        env,
        key: jax.Array,
        tokenizer_variables=None,
        seed: int | None = None,
        num_steps: int = 4,
        max_timesteps: int = 16,
        env_is_vectorized: bool | None = None,
        agent_index: int = 0,
        store_agent_embed: bool = True,
        store_old_action_unembeds: bool = True,
    ) -> Experience:
        model = self.model
        T = max_timesteps

        init_obs = _normalize_obs(env.reset(seed=seed) if seed is not None else env.reset())
        if env_is_vectorized is None:
            probe = init_obs.get('image', init_obs.get('state'))
            env_is_vectorized = (probe.ndim == 4) if 'image' in init_obs else (probe.ndim == 2)

        def batchify(obs):
            if env_is_vectorized:
                return obs
            return {k: np.asarray(v)[None] for k, v in obs.items()}

        obs = batchify(init_obs)
        b = next(iter(obs.values())).shape[0]

        n, d_lat = model.latent_shape
        latents_buf = np.zeros((b, T + 1, n, d_lat), np.float32)
        rewards_buf = np.zeros((b, T + 1), np.float32)
        values_buf = np.zeros((b, T + 1), np.float32)
        disc_buf = np.zeros((b, T + 1, max(self.na_d, 1)), np.int64)
        cont_buf = np.zeros((b, T + 1, max(self.na_c, 1)), np.float32)
        d_lp_buf = np.zeros((b, T + 1, max(self.na_d, 1)), np.float32)
        c_lp_buf = np.zeros((b, T + 1, max(self.na_c, 1)), np.float32)
        agent_embed_buf = np.zeros((b, T + 1, model.dim), np.float32)
        policy_embed_buf = np.zeros((b, T + 1, model.dim * 4), np.float32)
        proprio_buf = (np.zeros((b, T + 1, model.dim_proprio), np.float32)
                       if model.has_proprio else None)
        critic_state_buf = (np.zeros((b, T + 1, model.dim_critic_state), np.float32)
                            if model.dim_critic_state is not None else None)
        video_frames = []

        is_terminated = np.zeros((b,), bool)
        is_truncated = np.zeros((b,), bool)
        done = np.zeros((b,), bool)
        episode_lens = np.zeros((b,), np.int64)

        cache = model.apply(variables, b, T + 1, method=model.init_cache)
        tok_cache = None

        prev_disc = jnp.zeros((b, 1, max(self.na_d, 1)), jnp.int32)
        prev_cont = jnp.zeros((b, 1, max(self.na_c, 1)), jnp.float32)
        prev_reward = jnp.zeros((b, 1), jnp.float32)

        step_idx = 0
        while not done.all() and step_idx < T:
            k_step = jax.random.fold_in(key, step_idx)

            latents, tok_cache = self.obs_to_latents(
                variables, tokenizer_variables, obs, tok_cache, max_time=T + 1)
            latents_np = np.asarray(latents[:, 0])
            latents_buf[:, step_idx] = latents_np
            if model.has_proprio and 'proprio' in obs:
                proprio_buf[:, step_idx] = obs['proprio']
            if critic_state_buf is not None and 'state' in obs:
                critic_state_buf[:, step_idx] = obs['state']
            if 'image' in obs:
                video_frames.append(np.asarray(obs['image'], np.float32))

            critic_state = (jnp.asarray(obs['state'], jnp.float32)
                            if 'state' in obs and model.dim_critic_state is not None else None)

            out = self._policy_step(variables, latents, prev_disc, prev_cont, prev_reward,
                                    critic_state, cache, k_step,
                                    first=(step_idx == 0), num_steps=num_steps,
                                    agent_index=agent_index)
            cache = out['cache']

            values_buf[:, step_idx] = np.asarray(out['value'])[:, 0] if np.asarray(out['value']).ndim > 1 else np.asarray(out['value'])
            agent_embed_buf[:, step_idx] = np.asarray(out['agent_embed'])
            policy_embed_buf[:, step_idx] = np.asarray(out['policy_embed'])

            action_out = None
            if self.na_d > 0:
                sd = np.asarray(out['sampled_d'])
                disc_buf[:, step_idx] = sd
                d_lp_buf[:, step_idx] = np.asarray(out['log_probs'].discrete)
                action_out = sd
            if self.na_c > 0:
                sc = np.asarray(out['sampled_c'])
                cont_buf[:, step_idx] = sc
                c_lp_buf[:, step_idx] = np.asarray(out['log_probs'].continuous)
                env_cont = np.asarray(out['env_cont'])
                action_out = (action_out, env_cont) if action_out is not None else env_cont

            # device -> host -> env boundary
            env_action = action_out
            if not env_is_vectorized:
                env_action = (jax.tree.map(lambda a: a[0], env_action)
                              if isinstance(env_action, tuple) else env_action[0])
                if self.na_d == 1 and self.na_c == 0:
                    env_action = int(np.asarray(env_action).reshape(-1)[0])

            step_out = env.step(env_action)
            next_obs, reward, terminated, truncated = _parse_step_out(step_out, b)
            next_obs = batchify(_normalize_obs(next_obs))

            reward = np.asarray(reward, np.float32).reshape(b)
            if out['state_entropy'] is not None:
                reward = reward + (np.asarray(out['state_entropy']).reshape(b)
                                   * model.state_entropy_bonus_weight)
            terminated = np.asarray(terminated).reshape(b).astype(bool)
            truncated = np.asarray(truncated).reshape(b).astype(bool)

            episode_lens = np.where(done, episode_lens, episode_lens + 1)
            is_terminated |= terminated & ~done
            is_truncated |= truncated & ~done
            if step_idx + 1 >= max_timesteps:
                is_truncated |= ~is_terminated
            done |= is_terminated | is_truncated

            rewards_buf[:, step_idx] = reward

            prev_reward = jnp.asarray(rewards_buf[:, step_idx:step_idx + 1])
            if self.na_d > 0:
                prev_disc = jnp.asarray(disc_buf[:, step_idx:step_idx + 1], jnp.int32)
            if self.na_c > 0:
                prev_cont = jnp.asarray(cont_buf[:, step_idx:step_idx + 1], jnp.float32)

            obs = next_obs
            step_idx += 1

        # bootstrap value for truncated-but-not-terminated episodes
        # (reference `dreamer4.py:5787-5854`)
        need_bootstrap = is_truncated & ~is_terminated
        time_dim = step_idx
        if need_bootstrap.any():
            k_boot = jax.random.fold_in(key, 10_000)
            latents, tok_cache = self.obs_to_latents(
                variables, tokenizer_variables, obs, tok_cache, max_time=T + 1)
            critic_state = (jnp.asarray(obs['state'], jnp.float32)
                            if 'state' in obs and model.dim_critic_state is not None else None)
            out = self._policy_step(variables, latents, prev_disc, prev_cont, prev_reward,
                                    critic_state, cache, k_boot,
                                    first=False, num_steps=num_steps,
                                    agent_index=agent_index)
            latents_buf[:, step_idx] = np.asarray(latents[:, 0])
            values_buf[:, step_idx] = np.asarray(out['value']).reshape(b)
            agent_embed_buf[:, step_idx] = np.asarray(out['agent_embed'])
            policy_embed_buf[:, step_idx] = np.asarray(out['policy_embed'])
            if model.has_proprio and 'proprio' in obs:
                proprio_buf[:, step_idx] = obs['proprio']
            if critic_state_buf is not None and 'state' in obs:
                critic_state_buf[:, step_idx] = obs['state']
            episode_lens = np.where(need_bootstrap, episode_lens + 1, episode_lens)
            time_dim = step_idx + 1

        step_mask = np.arange(time_dim)[None, :] < episode_lens[:, None]
        episode_return = (rewards_buf[:, :time_dim] * step_mask).sum(axis=1)

        def cut(x):
            return jnp.asarray(x[:, :time_dim]) if x is not None else None

        old_action_unembeds = None
        if store_old_action_unembeds and model.has_actions:
            old_action_unembeds = model.apply(
                variables, cut(policy_embed_buf),
                method=lambda m, e: m.action_embedder.unembed(e, pred_head_index=0))

        video = None
        if video_frames:
            video = jnp.asarray(np.stack(video_frames, axis=2)[:, :, :time_dim])

        return Experience(
            latents=cut(latents_buf),
            video=video,
            proprio=cut(proprio_buf),
            critic_state=cut(critic_state_buf),
            rewards=cut(rewards_buf),
            actions=Actions(
                cut(disc_buf) if self.na_d > 0 else None,
                cut(cont_buf) if self.na_c > 0 else None),
            log_probs=Actions(
                cut(d_lp_buf) if self.na_d > 0 else None,
                cut(c_lp_buf) if self.na_c > 0 else None),
            values=cut(values_buf),
            agent_embed=cut(agent_embed_buf) if store_agent_embed else None,
            old_action_unembeds=old_action_unembeds,
            step_size=model.max_steps // num_steps,
            agent_index=agent_index,
            is_truncated=jnp.asarray(is_truncated),
            terminals=jnp.asarray(is_terminated),
            lens=jnp.asarray(episode_lens),
            is_from_world_model=False,
            episode_return=jnp.asarray(episode_return),
        )


def interact_with_env(model, variables, env, key, tokenizer=None,
                      tokenizer_variables=None, **kwargs) -> Experience:
    """One-shot convenience wrapper (compiles fresh; hold an `EnvInteractor`
    for repeated rollouts)."""
    interactor = EnvInteractor(model, tokenizer=tokenizer)
    return interactor(variables, env, key, tokenizer_variables=tokenizer_variables, **kwargs)
