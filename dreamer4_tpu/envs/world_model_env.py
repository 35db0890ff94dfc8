"""The world model exposed as a gym-style environment.

Equivalent of the reference `DynamicsWorldModelWrapper` (`env.py:353-552`):
`reset()` dreams frame 0 with a fresh KV cache; `step(action)` conditions on
the action and dreams the next frame, returning
(obs, reward, terminated, truncated, info). Each step is one compiled
single-frame denoise program reusing the static cache.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.world_model import DynamicsWorldModel


class DynamicsWorldModelWrapper:
    def __init__(
        self,
        model: DynamicsWorldModel,
        variables: Any,
        tokenizer=None,
        tokenizer_variables=None,
        *,
        batch_size: int = 1,
        num_steps: int = 4,
        max_timesteps: int = 64,
        return_latents_obs: bool | None = None,
        seed: int = 0,
    ):
        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.tokenizer_variables = tokenizer_variables
        self.batch_size = batch_size
        self.num_steps = num_steps
        self.max_timesteps = max_timesteps
        self.return_latents_obs = (return_latents_obs if return_latents_obs is not None
                                   else tokenizer is None)
        self.key = jax.random.PRNGKey(seed)

        K = model.max_steps
        assert K % num_steps == 0
        self.step_size = K // num_steps

        na_d = len([n for n in model.num_discrete_actions if n > 0])
        na_c = model.num_continuous_actions
        self.na_d, self.na_c = na_d, na_c

        # serving mode: `variables` is captured as a compile-time constant so
        # XLA bakes every weight pre-laid-out for the decode matmuls (measured
        # ~26% faster than passing the pytree as a runtime argument)
        @partial(jax.jit, static_argnames=('first',))
        def dream_frame(cache, prev_disc, prev_cont, prev_reward, key, first):
            b = batch_size
            n, d_lat = model.latent_shape
            k_noise, k_fwd, k_term = jax.random.split(key, 3)
            noised = jax.random.normal(k_noise, (b, 1, n, d_lat))

            valid = jnp.zeros((b, 1)) if first else jnp.ones((b, 1))
            kwargs: dict[str, Any] = {}
            if na_d > 0:
                kwargs['discrete_actions'] = prev_disc
            if na_c > 0:
                kwargs['continuous_actions'] = prev_cont
            if model.has_actions:
                kwargs['action_token_mask'] = valid
            if model.add_reward_embed_to_agent_token:
                kwargs['rewards'] = prev_reward
                kwargs['reward_token_mask'] = valid

            for s in range(num_steps):
                signal_val = s * self.step_size
                pred = model.apply(
                    variables, rngs={'sample': jax.random.fold_in(k_fwd, s)},
                    latents=noised,
                    signal_levels=jnp.full((b, 1), signal_val, jnp.int32),
                    step_sizes=jnp.full((b,), self.step_size, jnp.int32),
                    cache=cache, latent_is_noised=True, is_training=False,
                    return_pred_only=True, **kwargs)
                t_frac = signal_val / K
                flow_pred = pred.flow[:, :, 0]
                if model.pred_orig_latent:
                    flow = (flow_pred - noised) / (1.0 - t_frac)
                else:
                    flow = flow_pred
                noised = noised + flow * (self.step_size / K)

            denoised = jnp.clip(noised, -1.0, 1.0)

            _, (embeds, new_cache) = model.apply(
                variables, rngs={'sample': jax.random.fold_in(k_fwd, num_steps)},
                latents=denoised,
                signal_levels=jnp.full((b, 1), K - 1, jnp.int32),
                step_sizes=jnp.full((b,), self.step_size, jnp.int32),
                cache=cache, latent_is_noised=True, is_training=False,
                return_pred_only=True, return_intermediates=True, **kwargs)

            agent_embed = embeds.agent[:, 0, 0]
            reward_logits = model.apply(variables, agent_embed,
                                        method=lambda m, e: m.to_reward_pred(e))[0]
            reward = model.reward_encoder.decode(reward_logits)

            if model.predict_terminals:
                pooled = jnp.mean(denoised[:, 0], axis=-2)
                term_logits = model.apply(variables, pooled,
                                          method=lambda m, e: m.to_state_terminal_pred(e))[..., 0]
                terminated = jax.random.bernoulli(k_term, jax.nn.sigmoid(term_logits))
            else:
                terminated = jnp.zeros((b,), bool)

            return denoised, reward, terminated, new_cache

        self._dream_frame = dream_frame

        self._decode = None
        if tokenizer is not None:
            self._decode = jax.jit(lambda lat, key: tokenizer.apply(
                tokenizer_variables, lat, method=tokenizer.decode,
                rngs={'sample': key}))

    # ------------------------------------------------------------------ api

    def _obs(self, latents):
        if self.return_latents_obs:
            return np.asarray(latents[:, 0])
        self.key, sub = jax.random.split(self.key)
        video = self._decode(latents, sub)  # (b, c, 1, h, w)
        return np.asarray(video[:, :, 0])

    def reset(self, seed: int | None = None):
        if seed is not None:
            self.key = jax.random.PRNGKey(seed)
        self.key, sub = jax.random.split(self.key)

        self.cache = self.model.apply(self.variables, self.batch_size,
                                      self.max_timesteps + 1, method=self.model.init_cache)
        self._t = 0
        zero_d = jnp.zeros((self.batch_size, 1, max(self.na_d, 1)), jnp.int32)
        zero_c = jnp.zeros((self.batch_size, 1, max(self.na_c, 1)), jnp.float32)
        zero_r = jnp.zeros((self.batch_size, 1))
        latents, reward, terminated, self.cache = self._dream_frame(
            self.cache, zero_d, zero_c, zero_r, sub, first=True)
        self._last_reward = reward
        return self._obs(latents), {}

    def step(self, action):
        self.key, sub = jax.random.split(self.key)
        self._t += 1

        disc = jnp.zeros((self.batch_size, 1, max(self.na_d, 1)), jnp.int32)
        cont = jnp.zeros((self.batch_size, 1, max(self.na_c, 1)), jnp.float32)
        if isinstance(action, tuple):
            d, c = action
            disc = jnp.asarray(np.asarray(d).reshape(self.batch_size, 1, -1), jnp.int32)
            cont = jnp.asarray(np.asarray(c).reshape(self.batch_size, 1, -1), jnp.float32)
        elif self.na_d > 0:
            disc = jnp.asarray(np.asarray(action).reshape(self.batch_size, 1, -1), jnp.int32)
        else:
            cont = jnp.asarray(np.asarray(action).reshape(self.batch_size, 1, -1), jnp.float32)

        latents, reward, terminated, self.cache = self._dream_frame(
            self.cache,
            disc, cont, self._last_reward[:, None], sub, first=False)
        self._last_reward = reward

        truncated = np.full((self.batch_size,), self._t >= self.max_timesteps)
        reward_np = np.asarray(reward)
        terminated_np = np.asarray(terminated)
        if self.batch_size == 1:
            return self._obs(latents), float(reward_np[0]), bool(terminated_np[0]), bool(truncated[0]), {}
        return self._obs(latents), reward_np, terminated_np, truncated, {}
