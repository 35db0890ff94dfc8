"""Imagination rollout — the decode hot path, as one compiled program.

TPU-native re-design of the reference `DynamicsWorldModel.generate`
(`dreamer4.py:6307-6774`). The reference runs a python while-loop growing
tensors with `torch.cat`; here the whole rollout is a single
`lax.while_loop` over frames with an unrolled inner denoise loop, fixed-size
output buffers and the static-shape KV cache — so thousands of dreams run in
lockstep from one XLA executable, shardable over the data axis of a mesh.

Semantics preserved per frame (reference line refs inline):
  - `num_steps` Euler denoise steps + one extra clean step that (a) refreshes
    the KV cache and (b) yields the agent embedding (`dreamer4.py:6484-6551`)
  - reward decode (head 0), terminal Bernoulli, action sampling + log probs +
    value off the agent embedding (`dreamer4.py:6592-6662`)
  - past-context noising happens where context is actually recomputed — the
    prompt pass (`context_signal_noise`, paragraph after eq (8))
  - early stop on all-terminal via the while condition (`dreamer4.py:6679-6682`)
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..data.experience import Experience
from ..nn.action_embedder import Actions
from .world_model import DynamicsWorldModel


def generate(
    model: DynamicsWorldModel,
    variables: Any,
    key: jax.Array,
    *,
    time_steps: int,
    num_steps: int = 4,
    batch_size: int = 1,
    agent_index: int = 0,
    tasks: jax.Array | None = None,
    latent_gene_ids: jax.Array | None = None,
    context_signal_noise: float = 0.1,
    prompt_latents: jax.Array | None = None,        # (b, p, n, d)
    prompt_discrete_actions: jax.Array | None = None,
    prompt_continuous_actions: jax.Array | None = None,
    prompt_rewards: jax.Array | None = None,
    prompt_proprio: jax.Array | None = None,
    discrete_temperature: float = 1.0,
    continuous_temperature: float = 1.0,
    forced_discrete_actions: jax.Array | None = None,   # (b, T, na_d)
    forced_continuous_actions: jax.Array | None = None, # (b, T, na_c)
    return_agent_actions: bool | None = None,
    predict_terminals: bool | None = None,
    terminal_logit_offset: float = 0.0,
    min_dream_length: int = 0,
    hard_terminals: bool = True,
) -> Experience:
    """Fully traceable; wrap in jax.jit with static `model`/`time_steps`/
    `num_steps` (trainers do). Returns an `Experience` with padded buffers
    and `lens` marking validity."""
    K = model.max_steps
    assert num_steps > 0 and K % num_steps == 0
    step_size = K // num_steps

    T = time_steps
    b = batch_size
    n, d_lat = model.latent_shape
    V = model.num_video_views
    dim = model.dim

    if return_agent_actions is None:
        return_agent_actions = model.has_actions
    if predict_terminals is None:
        predict_terminals = model.predict_terminals

    has_proprio = model.has_proprio
    na_d = len([n for n in model.num_discrete_actions if n > 0])
    na_c = model.num_continuous_actions

    P = prompt_latents.shape[1] if prompt_latents is not None else 0
    assert P < T, 'prompt must be shorter than requested time_steps'

    # standardize prompt latents to carry the view axis (b, p, v, n, d) — the
    # reference rolls out with the view dimension throughout
    # (`dreamer4.py:6475, 6846-6885`)
    if prompt_latents is not None and prompt_latents.ndim == 4:
        assert V == 1, 'multi-view models need (b, p, v, n, d) prompt latents'
        prompt_latents = prompt_latents[:, :, None]

    key, k_init = jax.random.split(key)

    # ------------------------------------------------------------- buffers
    latents_buf = jnp.zeros((b, T, V, n, d_lat))
    if P > 0:
        latents_buf = latents_buf.at[:, :P].set(prompt_latents)

    proprio_buf = jnp.zeros((b, T, model.dim_proprio)) if has_proprio else None
    if has_proprio and prompt_proprio is not None:
        proprio_buf = proprio_buf.at[:, :P].set(prompt_proprio)

    rewards_buf = jnp.zeros((b, T))
    if prompt_rewards is not None:
        rewards_buf = rewards_buf.at[:, :prompt_rewards.shape[1]].set(prompt_rewards)

    disc_buf = jnp.zeros((b, T, max(na_d, 1)), jnp.int32)
    cont_buf = jnp.zeros((b, T, max(na_c, 1)))
    if prompt_discrete_actions is not None:
        disc_buf = disc_buf.at[:, :prompt_discrete_actions.shape[1]].set(prompt_discrete_actions)
    if prompt_continuous_actions is not None:
        cont_buf = cont_buf.at[:, :prompt_continuous_actions.shape[1]].set(prompt_continuous_actions)

    d_logprob_buf = jnp.zeros((b, T, max(na_d, 1)))
    c_logprob_buf = jnp.zeros((b, T, max(na_c, 1)))
    values_buf = jnp.zeros((b, T))
    agent_embed_buf = jnp.zeros((b, T, dim))
    policy_embed_buf = jnp.zeros((b, T, dim * 4))

    terminals = jnp.zeros((b,), bool)
    lens = jnp.full((b,), T)
    term_prob_buf = jnp.zeros((b, T))

    # ------------------------------------------------- prompt pass -> cache
    def apply_forward(frame_key, **kwargs):
        return model.apply(variables, rngs={'sample': frame_key},
                           latent_is_noised=True, is_training=False,
                           return_pred_only=True, latent_has_view_dim=True,
                           agent_index=agent_index,
                           **kwargs)

    cache = model.apply(variables, b, T, method=model.init_cache)

    if P > 0:
        k_ctx, k_prompt = jax.random.split(k_init)
        ctx_noise = jax.random.normal(k_ctx, (b, P, V, n, d_lat))
        noised_prompt = prompt_latents + (ctx_noise - prompt_latents) * context_signal_noise

        prompt_kwargs: dict[str, Any] = dict(
            latents=noised_prompt,
            signal_levels=K - 1,
            step_sizes=step_size,
        )
        if model.has_actions and prompt_discrete_actions is not None:
            prompt_kwargs['discrete_actions'] = prompt_discrete_actions[:, :P]
        if model.has_actions and prompt_continuous_actions is not None:
            prompt_kwargs['continuous_actions'] = prompt_continuous_actions[:, :P]
        if model.add_reward_embed_to_agent_token and prompt_rewards is not None:
            prompt_kwargs['rewards'] = prompt_rewards[:, :P]
        if has_proprio:
            pp = prompt_proprio if prompt_proprio is not None else jnp.zeros((b, P, model.dim_proprio))
            ctx_pnoise = jax.random.normal(jax.random.fold_in(k_ctx, 1), pp.shape)
            prompt_kwargs['proprio'] = pp + (ctx_pnoise - pp) * context_signal_noise

        _, (_, cache) = model.apply(
            variables, rngs={'sample': k_prompt}, latent_is_noised=True, is_training=False,
            return_pred_only=True, return_intermediates=True, max_time=T,
            latent_has_view_dim=True, agent_index=agent_index,
            tasks=tasks, latent_gene_ids=latent_gene_ids, **prompt_kwargs)

    # ------------------------------------------------------ frame loop body
    def frame_body(state):
        (i, key, latents_buf, proprio_buf, rewards_buf, disc_buf, cont_buf,
         d_logprob_buf, c_logprob_buf, values_buf, agent_embed_buf,
         policy_embed_buf, term_prob_buf, terminals, lens, cache) = state

        fkey = jax.random.fold_in(key, i)
        k_noise, k_pnoise, k_term, k_act, k_fwd = jax.random.split(fkey, 5)

        noised = jax.random.normal(k_noise, (b, 1, V, n, d_lat))
        noised_proprio = (jax.random.normal(k_pnoise, (b, 1, model.dim_proprio))
                          if has_proprio else None)

        # previous-step conditioning (valid when i > 0; masked otherwise)
        prev = jnp.maximum(i - 1, 0)
        prev_valid = (i > 0).astype(jnp.float32)[None, None] * jnp.ones((b, 1))

        cond_kwargs: dict[str, Any] = dict(
            tasks=tasks, latent_gene_ids=latent_gene_ids,
        )
        if model.has_actions:
            if na_d > 0:
                cond_kwargs['discrete_actions'] = jax.lax.dynamic_slice_in_dim(disc_buf, prev, 1, axis=1)
            if na_c > 0:
                cond_kwargs['continuous_actions'] = jax.lax.dynamic_slice_in_dim(cont_buf, prev, 1, axis=1)
            cond_kwargs['action_token_mask'] = prev_valid
        if model.add_reward_embed_to_agent_token:
            cond_kwargs['rewards'] = jax.lax.dynamic_slice_in_dim(rewards_buf, prev, 1, axis=1)
            cond_kwargs['reward_token_mask'] = prev_valid

        # denoise: num_steps Euler iterations (static unroll)
        for s in range(num_steps):
            signal_val = s * step_size
            pred = apply_forward(
                jax.random.fold_in(k_fwd, s),
                latents=noised,
                proprio=noised_proprio,
                signal_levels=jnp.full((b, 1), signal_val, jnp.int32),
                step_sizes=jnp.full((b,), step_size, jnp.int32),
                cache=cache,
                **cond_kwargs,
            )
            flow_pred = pred.flow  # (b, 1, v, n, d) — all views roll forward
            t_frac = signal_val / K
            if model.pred_orig_latent:
                flow = (flow_pred - noised) / (1.0 - t_frac)
                if has_proprio:
                    pflow = (pred.proprio - noised_proprio) / (1.0 - t_frac)
            else:
                flow = flow_pred
                if has_proprio:
                    pflow = pred.proprio
            noised = noised + flow * (step_size / K)
            if has_proprio:
                noised_proprio = noised_proprio + pflow * (step_size / K)

        denoised = noised
        denoised_proprio = noised_proprio

        # extra clean step: refresh cache + agent embedding
        _, (embeds, new_cache) = model.apply(
            variables, rngs={'sample': jax.random.fold_in(k_fwd, num_steps)},
            latent_is_noised=True, is_training=False, latent_has_view_dim=True,
            return_pred_only=True, return_intermediates=True, agent_index=agent_index,
            latents=denoised,
            proprio=denoised_proprio,
            signal_levels=jnp.full((b, 1), K - 1, jnp.int32),
            step_sizes=jnp.full((b,), step_size, jnp.int32),
            cache=cache,
            **cond_kwargs,
        )
        cache = new_cache

        one_agent_embed = embeds.agent[:, 0, agent_index]  # (b, dim)

        # reward decode (head 0)
        reward_logits = model.apply(variables, one_agent_embed,
                                    method=lambda m, e: m.to_reward_pred(e))[0]
        pred_reward = model.reward_encoder.decode(reward_logits)
        rewards_buf = rewards_buf.at[:, i].set(jnp.where(i >= P, pred_reward, rewards_buf[:, i]))

        # terminal prediction off pooled denoised latents
        if predict_terminals:
            # pool over views and latent tokens -> (b, d_latent)
            pooled = jnp.mean(denoised[:, 0].reshape(b, V * n, d_lat), axis=-2)
            term_logits = model.apply(variables, pooled,
                                      method=lambda m, e: m.to_state_terminal_pred(e))[..., 0]
            # raw (uncalibrated) terminal probability — recorded for soft
            # continuation discounting in GAE (DreamerV3-style: the learner
            # scales gamma by (1 - p_terminal) instead of trusting hard
            # Bernoulli cuts; see rl_losses)
            term_prob_buf = term_prob_buf.at[:, i].set(jax.nn.sigmoid(term_logits))
            if hard_terminals:
                # calibration for slightly-OOD dreamed latents: a logit margin
                # (raises the bar for terminating) and a minimum dream length
                # (the terminal head over-fires early in WM training; see
                # STATUS round-1 findings / reference Bernoulli sampling at
                # `dreamer4.py:6597-6616`)
                offs_logits = term_logits - terminal_logit_offset
                is_terminal = jax.random.bernoulli(k_term, jax.nn.sigmoid(offs_logits))
                is_terminal &= (i - P) >= (min_dream_length - 1)
                just_terminated = is_terminal & ~terminals
                lens = jnp.where(just_terminated, i + 1, lens)
                terminals = terminals | is_terminal

        agent_embed_buf = agent_embed_buf.at[:, i].set(one_agent_embed)

        if return_agent_actions and model.has_actions:
            actor_src = one_agent_embed
            critic_src = one_agent_embed
            if model.actor_critic_latent_input:
                # multi-view models pass (b, v, n, d) — the encoders run per
                # view and mean-pool; single-view keeps the squeezed (b, n, d)
                lat_in = (denoised[:, 0] if model.num_video_views > 1
                          else denoised[:, 0, 0])
                actor_src, critic_src = model.apply(
                    variables, lat_in,
                    method=lambda m, l: m.latent_actor_inputs(l))
            policy_embed = model.apply(variables, actor_src,
                                       method=lambda m, e: m.policy_head(e))
            policy_embed_buf = policy_embed_buf.at[:, i].set(policy_embed)

            sampled_d, sampled_c = model.apply(
                variables, k_act, policy_embed,
                discrete_temperature=discrete_temperature,
                continuous_temperature=continuous_temperature,
                method=lambda m, k, e, **kw: m.action_embedder.sample(k, e, **kw))
            # action-conditioned rollout: caller-provided actions override the
            # policy's samples (log-probs/values still evaluated at the
            # executed action) — enables counterfactual probes and
            # teacher-forced video prediction (extends the reference's
            # prompt-only action conditioning, dreamer4.py:6333-6334)
            if forced_discrete_actions is not None and na_d > 0:
                sampled_d = jax.lax.dynamic_slice_in_dim(
                    forced_discrete_actions, i, 1, axis=1)[:, 0]
            if forced_continuous_actions is not None and na_c > 0:
                sampled_c = jax.lax.dynamic_slice_in_dim(
                    forced_continuous_actions, i, 1, axis=1)[:, 0]
            if na_d > 0:
                disc_buf = disc_buf.at[:, i].set(sampled_d)
            if na_c > 0:
                cont_buf = cont_buf.at[:, i].set(sampled_c)

            lp = model.apply(
                variables, policy_embed,
                method=lambda m, e: m.action_embedder.log_probs(
                    e, discrete_targets=sampled_d if na_d > 0 else None,
                    continuous_targets=sampled_c if na_c > 0 else None,
                    pred_head_index=0))
            if na_d > 0:
                d_logprob_buf = d_logprob_buf.at[:, i].set(lp.discrete)
            if na_c > 0:
                c_logprob_buf = c_logprob_buf.at[:, i].set(lp.continuous)

            value_bins = model.apply(variables, critic_src,
                                     method=lambda m, e: m.value_head(e))
            values_buf = values_buf.at[:, i].set(model.value_encoder.decode(value_bins))

        latents_buf = latents_buf.at[:, i].set(denoised[:, 0])
        if has_proprio:
            proprio_buf = proprio_buf.at[:, i].set(denoised_proprio[:, 0])

        return (i + 1, key, latents_buf, proprio_buf, rewards_buf, disc_buf, cont_buf,
                d_logprob_buf, c_logprob_buf, values_buf, agent_embed_buf,
                policy_embed_buf, term_prob_buf, terminals, lens, cache)

    def frame_cond(state):
        i, *_, terminals, lens, cache = state[0], state[-3], state[-2], state[-1]
        not_done = (~jnp.all(terminals) if predict_terminals and hard_terminals
                    else jnp.array(True))
        return (i < T) & not_done

    state = (jnp.asarray(P), key, latents_buf, proprio_buf, rewards_buf, disc_buf, cont_buf,
             d_logprob_buf, c_logprob_buf, values_buf, agent_embed_buf,
             policy_embed_buf, term_prob_buf, terminals, lens, cache)

    state = jax.lax.while_loop(frame_cond, frame_body, state)

    (i_final, _, latents_buf, proprio_buf, rewards_buf, disc_buf, cont_buf,
     d_logprob_buf, c_logprob_buf, values_buf, agent_embed_buf,
     policy_embed_buf, term_prob_buf, terminals, lens, cache) = state

    latents_buf = jnp.clip(latents_buf, -1.0, 1.0)
    if V == 1:
        latents_buf = latents_buf[:, :, 0]  # single-view consumers take (b,t,n,d)
    lens = jnp.minimum(lens, i_final)

    step_mask = (jnp.arange(T)[None] < lens[:, None]).astype(jnp.float32)
    episode_return = jnp.sum(rewards_buf * step_mask, axis=1)

    old_action_unembeds = None
    if return_agent_actions and model.has_actions:
        old_action_unembeds = model.apply(
            variables, policy_embed_buf,
            method=lambda m, e: m.action_embedder.unembed(e, pred_head_index=0))

    return Experience(
        latents=latents_buf,
        proprio=proprio_buf,
        agent_embed=agent_embed_buf,
        rewards=rewards_buf,
        terminals=terminals,
        terminal_probs=term_prob_buf if predict_terminals else None,
        prompt_len=P,
        actions=Actions(disc_buf if na_d > 0 else None, cont_buf if na_c > 0 else None)
        if return_agent_actions and model.has_actions else None,
        log_probs=Actions(d_logprob_buf if na_d > 0 else None, c_logprob_buf if na_c > 0 else None)
        if return_agent_actions and model.has_actions else None,
        old_action_unembeds=old_action_unembeds,
        values=values_buf if return_agent_actions and model.has_actions else None,
        step_size=step_size,
        lens=lens,
        is_truncated=~terminals,
        agent_index=agent_index,
        is_from_world_model=True,
        episode_return=episode_return,
    )
