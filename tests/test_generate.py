"""Imagination rollout tests (reference test_dreamer.py generate paths)."""
import jax
import jax.numpy as jnp
import numpy as np

from dreamer4_tpu.models.generate import generate
from dreamer4_tpu.models.world_model import DynamicsWorldModel


def make_model(**kwargs):
    defaults = dict(
        dim=16,
        dim_latent=8,
        num_latent_tokens=4,
        max_steps=16,
        depth=1,
        time_block_every=1,
        num_spatial_tokens=4,
        num_discrete_actions=(4,),
        attn_dim_head=8,
        attn_heads=2,
        multi_token_pred_len=2,
        num_register_tokens=2,
        predict_terminals=True,
    )
    defaults.update(kwargs)
    return DynamicsWorldModel(**defaults)


def init_model(model):
    latents = jnp.zeros((2, 3, model.num_latent_tokens, model.dim_latent))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    return model.init(rngs, latents=latents, shortcut_train=False,
                      rewards=jnp.zeros((2, 3)), terminals=jnp.zeros((2,), bool),
                      discrete_actions=jnp.zeros((2, 2, 1), jnp.int32))


def test_generate_rollout():
    model = make_model()
    variables = init_model(model)

    exp = generate(model, variables, jax.random.PRNGKey(0),
                   time_steps=5, num_steps=4, batch_size=2)

    assert exp.latents.shape == (2, 5, 4, 8)
    assert jnp.abs(exp.latents).max() <= 1.0
    assert exp.rewards.shape == (2, 5)
    assert exp.actions.discrete.shape == (2, 5, 1)
    assert exp.log_probs.discrete.shape == (2, 5, 1)
    assert exp.values.shape == (2, 5)
    assert exp.agent_embed.shape == (2, 5, 16)
    assert exp.terminals.shape == (2,)
    assert exp.lens.shape == (2,)
    assert exp.step_size == 4
    assert (exp.lens <= 5).all()
    assert jnp.isfinite(exp.episode_return).all()
    # unembeds present for PMPO KL
    d_logits, c_params = exp.old_action_unembeds
    assert d_logits[0].shape == (2, 5, 4)
    assert c_params is None


def test_generate_with_prompt():
    model = make_model(predict_terminals=False)
    variables = init_model(model)

    prompt = jnp.clip(jax.random.normal(jax.random.PRNGKey(1), (2, 2, 4, 8)), -1, 1)
    prompt_actions = jax.random.randint(jax.random.PRNGKey(2), (2, 2, 1), 0, 4)

    exp = generate(model, variables, jax.random.PRNGKey(0),
                   time_steps=4, num_steps=2, batch_size=2,
                   prompt_latents=prompt, prompt_discrete_actions=prompt_actions)

    assert exp.latents.shape == (2, 4, 4, 8)
    # prompt preserved
    np.testing.assert_allclose(np.asarray(exp.latents[:, :2]), np.asarray(prompt), atol=1e-6)
    # generated frames differ from zero
    assert float(jnp.abs(exp.latents[:, 2:]).sum()) > 0


def test_generate_jits_once():
    """The whole rollout is one compiled program; different keys reuse it."""
    model = make_model(predict_terminals=False)
    variables = init_model(model)

    fn = jax.jit(lambda v, k: generate(model, v, k, time_steps=4, num_steps=2, batch_size=2))
    e1 = fn(variables, jax.random.PRNGKey(0))
    e2 = fn(variables, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(e1.latents[:, -1]), np.asarray(e2.latents[:, -1]))


def eager_generate(model, variables, key, *, time_steps, num_steps, batch_size,
                   prompt_latents=None, prompt_discrete_actions=None,
                   context_signal_noise=0.1, predict_terminals=True):
    """Straight-line python re-implementation of `generate` with a FRESH
    parallel forward per step (no while_loop, no KV cache): at frame i every
    denoise step runs the full prefix 0..i in parallel and takes the last
    frame's prediction. Mirrors `generate`'s key discipline exactly, so any
    index/bookkeeping bug in the compiled program shows up as divergence
    (the reference tests repeated cached generate the same way,
    `test_dreamer.py:763-783`)."""
    K = model.max_steps
    step_size = K // num_steps
    b, T = batch_size, time_steps
    n, d = model.latent_shape
    V = model.num_video_views
    na_d = len([x for x in model.num_discrete_actions if x > 0])

    key, k_init = jax.random.split(key)

    P = 0
    if prompt_latents is not None:
        P = prompt_latents.shape[1]
        if prompt_latents.ndim == 4:
            prompt_latents = prompt_latents[:, :, None]
        k_ctx, _ = jax.random.split(k_init)
        ctx_noise = jax.random.normal(k_ctx, (b, P, V, n, d))
        noised_prompt = prompt_latents + (ctx_noise - prompt_latents) * context_signal_noise

    # histories (python lists of per-frame arrays)
    lat_hist = [noised_prompt[:, j] for j in range(P)] if P else []   # context latents as cached
    clean_hist = [prompt_latents[:, j] for j in range(P)] if P else []  # what generate stores
    act_hist = ([prompt_discrete_actions[:, j] for j in range(P)]
                if prompt_discrete_actions is not None else
                [jnp.zeros((b, max(na_d, 1)), jnp.int32)] * P)
    rewards, values, lps, terminals = [], [], [], jnp.zeros((b,), bool)
    lens = jnp.full((b,), T)

    def fwd(latents_seq, signal_levels, k, actions_seq):
        kwargs = {}
        if model.has_actions and na_d > 0:
            kwargs['discrete_actions'] = jnp.stack(actions_seq, axis=1)
        pred, (embeds, _) = model.apply(
            variables, rngs={'sample': k}, latent_is_noised=True,
            is_training=False, return_pred_only=True, return_intermediates=True,
            latent_has_view_dim=True,
            latents=jnp.stack(latents_seq, axis=1),
            signal_levels=signal_levels,
            step_sizes=jnp.full((b,), step_size, jnp.int32), **kwargs)
        return pred, embeds

    for i in range(P, T):
        fkey = jax.random.fold_in(key, i)
        k_noise, k_pnoise, k_term, k_act, k_fwd = jax.random.split(fkey, 5)
        noised = jax.random.normal(k_noise, (b, V, n, d))

        dummy_act = jnp.zeros((b, max(na_d, 1)), jnp.int32)
        for s in range(num_steps):
            signal_val = s * step_size
            sig = jnp.concatenate([
                jnp.full((b, i), K - 1, jnp.int32),
                jnp.full((b, 1), signal_val, jnp.int32)], axis=1)
            pred, _ = fwd(lat_hist + [noised], sig, jax.random.fold_in(k_fwd, s),
                          act_hist + [dummy_act])
            flow_pred = pred.flow[:, -1]
            t_frac = signal_val / K
            if model.pred_orig_latent:
                flow = (flow_pred - noised) / (1.0 - t_frac)
            else:
                flow = flow_pred
            noised = noised + flow * (step_size / K)
        denoised = noised

        sig = jnp.full((b, i + 1), K - 1, jnp.int32)
        _, embeds = fwd(lat_hist + [denoised], sig,
                        jax.random.fold_in(k_fwd, num_steps), act_hist + [dummy_act])
        one_agent_embed = embeds.agent[:, -1, 0]

        reward_logits = model.apply(variables, one_agent_embed,
                                    method=lambda m, e: m.to_reward_pred(e))[0]
        rewards.append(model.reward_encoder.decode(reward_logits))

        if predict_terminals:
            pooled = jnp.mean(denoised.reshape(b, V * n, d), axis=-2)
            term_logits = model.apply(variables, pooled,
                                      method=lambda m, e: m.to_state_terminal_pred(e))[..., 0]
            is_terminal = jax.random.bernoulli(k_term, jax.nn.sigmoid(term_logits))
            just = is_terminal & ~terminals
            lens = jnp.where(just, i + 1, lens)
            terminals = terminals | is_terminal

        policy_embed = model.apply(variables, one_agent_embed,
                                   method=lambda m, e: m.policy_head(e))
        sampled_d, _ = model.apply(
            variables, k_act, policy_embed,
            method=lambda m, k, e, **kw: m.action_embedder.sample(k, e, **kw))
        lp = model.apply(
            variables, policy_embed,
            method=lambda m, e: m.action_embedder.log_probs(
                e, discrete_targets=sampled_d, pred_head_index=0))
        value_bins = model.apply(variables, one_agent_embed,
                                 method=lambda m, e: m.value_head(e))

        act_hist.append(sampled_d)
        lps.append(lp.discrete)
        values.append(model.value_encoder.decode(value_bins))
        lat_hist.append(denoised)
        clean_hist.append(denoised)

        if predict_terminals and bool(jnp.all(terminals)):
            break

    out = dict(
        latents=jnp.clip(jnp.stack(clean_hist, axis=1), -1, 1),
        rewards=jnp.stack(rewards, axis=1),
        actions=jnp.stack(act_hist[P:], axis=1),
        log_probs=jnp.stack(lps, axis=1),
        values=jnp.stack(values, axis=1),
        terminals=terminals,
        lens=jnp.minimum(lens, len(clean_hist)),
    )
    if V == 1:
        out['latents'] = out['latents'][:, :, 0]
    return out


def test_generate_matches_eager_reference():
    """Numerical cross-check of the compiled while_loop+cache rollout against
    the eager fresh-cache python rollout — same keys, same math."""
    model = make_model(predict_terminals=True)
    variables = init_model(model)
    key = jax.random.PRNGKey(3)

    exp = generate(model, variables, key, time_steps=4, num_steps=2, batch_size=2)
    ref = eager_generate(model, variables, key, time_steps=4, num_steps=2,
                         batch_size=2, predict_terminals=True)

    m = int(min(exp.lens.max(), 4))  # frames actually generated by both
    np.testing.assert_allclose(np.asarray(exp.latents[:, :m]),
                               np.asarray(ref['latents'][:, :m]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(exp.rewards[:, :m]),
                               np.asarray(ref['rewards'][:, :m]), atol=2e-3)
    np.testing.assert_array_equal(np.asarray(exp.actions.discrete[:, :m]),
                                  np.asarray(ref['actions'][:, :m]))
    np.testing.assert_allclose(np.asarray(exp.values[:, :m]),
                               np.asarray(ref['values'][:, :m]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(exp.log_probs.discrete[:, :m]),
                               np.asarray(ref['log_probs'][:, :m]), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(exp.terminals), np.asarray(ref['terminals']))
    np.testing.assert_array_equal(np.asarray(exp.lens), np.asarray(ref['lens']))


def test_generate_matches_eager_with_prompt():
    model = make_model(predict_terminals=False)
    variables = init_model(model)
    key = jax.random.PRNGKey(5)
    prompt = jnp.clip(jax.random.normal(jax.random.PRNGKey(1), (2, 2, 4, 8)), -1, 1)
    prompt_actions = jax.random.randint(jax.random.PRNGKey(2), (2, 2, 1), 0, 4)

    exp = generate(model, variables, key, time_steps=4, num_steps=2, batch_size=2,
                   prompt_latents=prompt, prompt_discrete_actions=prompt_actions)
    ref = eager_generate(model, variables, key, time_steps=4, num_steps=2,
                         batch_size=2, prompt_latents=prompt,
                         prompt_discrete_actions=prompt_actions,
                         predict_terminals=False)

    np.testing.assert_allclose(np.asarray(exp.latents), np.asarray(ref['latents']),
                               atol=2e-4)
    np.testing.assert_array_equal(np.asarray(exp.actions.discrete[:, 2:]),
                                  np.asarray(ref['actions']))


def test_generate_multiview():
    """A num_video_views=2 model dreams with the view dimension; per-view
    latents differ (reference `dreamer4.py:6475, 6846-6885`)."""
    model = make_model(num_video_views=2, predict_terminals=False)
    latents = jnp.zeros((2, 3, 2, model.num_latent_tokens, model.dim_latent))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    variables = model.init(rngs, latents=latents, latent_has_view_dim=True,
                           shortcut_train=False,
                           rewards=jnp.zeros((2, 3)),
                           discrete_actions=jnp.zeros((2, 2, 1), jnp.int32))

    exp = generate(model, variables, jax.random.PRNGKey(0),
                   time_steps=4, num_steps=2, batch_size=2)
    assert exp.latents.shape == (2, 4, 2, 4, 8)
    # the two views evolve differently
    assert float(jnp.abs(exp.latents[:, :, 0] - exp.latents[:, :, 1]).max()) > 1e-4
    assert jnp.isfinite(exp.latents).all()

    # multi-view prompt path
    prompt = jnp.clip(jax.random.normal(jax.random.PRNGKey(1), (2, 2, 2, 4, 8)), -1, 1)
    exp2 = generate(model, variables, jax.random.PRNGKey(0),
                    time_steps=4, num_steps=2, batch_size=2, prompt_latents=prompt)
    np.testing.assert_allclose(np.asarray(exp2.latents[:, :2]), np.asarray(prompt),
                               atol=1e-6)


def test_generate_continuous_actions():
    model = make_model(num_discrete_actions=(), num_continuous_actions=2,
                       predict_terminals=False)
    latents = jnp.zeros((2, 3, 4, 8))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    variables = model.init(rngs, latents=latents, shortcut_train=False,
                           continuous_actions=jnp.full((2, 2, 2), 0.5))

    exp = generate(model, variables, jax.random.PRNGKey(0),
                   time_steps=3, num_steps=2, batch_size=2)
    assert exp.actions.continuous.shape == (2, 3, 2)
    assert (exp.actions.continuous >= 0).all() and (exp.actions.continuous <= 1).all()  # beta native


def test_generate_soft_terminals():
    """hard_terminals=False: dreams run full length, terminal probabilities
    are recorded per generated frame for soft continuation in the learner."""
    model = make_model(predict_terminals=True)
    variables = init_model(model)

    exp = generate(model, variables, jax.random.PRNGKey(11), time_steps=5,
                   num_steps=2, batch_size=3, hard_terminals=False)

    assert np.all(np.asarray(exp.lens) == 5)
    assert not np.any(np.asarray(exp.terminals))
    tp = np.asarray(exp.terminal_probs)
    assert tp.shape == (3, 5)
    assert np.all((tp >= 0) & (tp <= 1))
    assert np.all(tp > 0)  # every generated frame got a real sigmoid prob

    # prompt frames keep prob 0 (real context is alive with certainty)
    prompt = jnp.clip(jax.random.normal(jax.random.PRNGKey(1), (3, 2, 4, 8)), -1, 1)
    prompt_actions = jax.random.randint(jax.random.PRNGKey(2), (3, 2, 1), 0, 4)
    exp_p = generate(model, variables, jax.random.PRNGKey(12), time_steps=5,
                     num_steps=2, batch_size=3, hard_terminals=False,
                     prompt_latents=prompt, prompt_discrete_actions=prompt_actions)
    assert exp_p.prompt_len == 2
    tp = np.asarray(exp_p.terminal_probs)
    assert np.all(tp[:, :2] == 0)
    assert np.all(tp[:, 2:] > 0)


def test_generate_bf16_model_bf16_cache():
    """a bf16-configured model rolls out with a bf16 KV cache (init_cache
    defaults to the trunk compute dtype — halves decode HBM traffic) and
    still produces finite, in-range latents."""
    model = make_model(dtype=jnp.bfloat16)
    variables = init_model(model)

    cache = model.apply(variables, 2, 4, method=model.init_cache)
    assert cache.main.kv[0].k.dtype == jnp.bfloat16

    exp = generate(model, variables, jax.random.PRNGKey(3),
                   time_steps=4, num_steps=2, batch_size=2)
    assert np.isfinite(np.asarray(exp.latents)).all()
    assert float(jnp.abs(exp.latents[:, 1:]).sum()) > 0


def test_generate_forced_actions():
    """forced_discrete_actions overrides the policy's samples (action-
    conditioned rollout); different forced sequences diverge the dream.

    Uses add_action_embed_to_spatial: with the attention-only pathway a
    depth-1 all-time-layer toy trunk is structurally action-blind (actions
    live in their own axial column), which is itself part of what this
    config guards against."""
    model = make_model(predict_terminals=False, add_action_embed_to_spatial=True)
    variables = init_model(model)

    def dream(val):
        forced = jnp.full((2, 5, 1), val, jnp.int32)
        return generate(model, variables, jax.random.PRNGKey(0), time_steps=5,
                        num_steps=2, batch_size=2, forced_discrete_actions=forced)

    exp0, exp1 = dream(0), dream(1)
    assert np.all(np.asarray(exp0.actions.discrete) == 0)
    assert np.all(np.asarray(exp1.actions.discrete) == 1)
    # same key, different actions -> trajectories must not be identical
    assert float(jnp.abs(exp0.latents - exp1.latents).sum()) > 0
    # log-probs are evaluated at the executed (forced) action
    assert np.isfinite(np.asarray(exp0.log_probs.discrete)).all()


def test_generate_with_bf16_serve_params():
    """Serving path: f32-trained params cast to bf16
    (`cast_params_for_inference`) must produce a structurally identical,
    finite rollout — the param-bandwidth-bound decode reads half the HBM
    bytes this way (bench.py headline runs it)."""
    from dreamer4_tpu.ops.utils import cast_params_for_inference

    model = make_model(dtype=jnp.bfloat16)
    variables = init_model(model)
    served = cast_params_for_inference(variables, jnp.bfloat16)
    # float leaves cast, int leaves untouched
    assert all(x.dtype != jnp.float32
               for x in jax.tree.leaves(served['params'])
               if jnp.issubdtype(x.dtype, jnp.floating))

    exp = generate(model, served, jax.random.PRNGKey(0),
                   time_steps=4, num_steps=2, batch_size=2)
    assert exp.latents.shape == (2, 4, 4, 8)
    assert np.isfinite(np.asarray(exp.latents, np.float32)).all()
    assert np.isfinite(np.asarray(exp.values, np.float32)).all()
    assert exp.actions.discrete.shape == (2, 4, 1)
