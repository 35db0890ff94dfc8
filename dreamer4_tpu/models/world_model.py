"""DynamicsWorldModel — interleaved-modality axial space/time transformer
trained with shortcut flow matching over tokenizer latents.

TPU-native re-design of the reference `DynamicsWorldModel`
(`dreamer4.py:4660-7743`). Core structure:

- Per-frame token layout:
  [flow token][latent spatial tokens][proprio][state-pred][registers]
  [action][reward][agent tokens]
  with agent tokens as the transformer's special tokens.
- Diffusion forcing: per-(batch, frame) signal levels; shortcut
  self-consistency training (two extra half-step forwards under
  stop-gradient, eq (4)/(5) of the paper; reference `dreamer4.py:7353-7406`).
- Reward / terminal / action multi-token-prediction heads off the (shifted)
  agent tokens (`dreamer4.py:7436-7598`).

XLA-specific deviations from the reference (semantics preserved):
- `shortcut_train` is a static flag chosen by the trainer per step (the
  reference draws it inside forward, `dreamer4.py:6965`); two jit variants
  instead of a data-dependent branch.
- the reward-embed CFG dropout zeroes the reward token instead of removing it
  from the sequence (`dreamer4.py:7040-7052`), keeping shapes static.
- decode caches are fixed-size KV buffers (see models/transformer.py).

Stochasticity uses the linen 'sample' rng collection.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.action_embedder import ActionEmbedder, Actions
from ..nn.attention import LearnedQueriesAttentionPool
from ..nn.latent_ar import LatentAutoregressiveLoss
from ..nn.loss_normalizer import LossNormalizer
from ..nn.mlp import EnsembleHead, create_mlp
from ..nn.norms import RMSNorm
from ..ops import dists
from ..ops.codecs import get_reward_encoder
from ..ops.mtp import create_multi_token_prediction_targets
from ..ops.utils import lens_to_mask, masked_mean, ramp_weight
from .transformer import AxialSpaceTimeTransformer, TransformerCache


class WorldModelLosses(NamedTuple):
    flow: jax.Array
    shortcut: jax.Array
    rewards: jax.Array
    terminals: jax.Array
    discrete_actions: jax.Array
    continuous_actions: jax.Array
    state_pred: jax.Array
    agent_state_pred: jax.Array
    latent_ar: jax.Array
    latent_ar_sigreg: jax.Array
    lapo_action: jax.Array
    lapo_fdm: jax.Array
    lapo_raw_latent_fdm: jax.Array
    tem: jax.Array
    h_net: jax.Array | float = 0.0


class Predictions(NamedTuple):
    flow: jax.Array
    proprio: jax.Array | None
    state: jax.Array | None


class Embeds(NamedTuple):
    agent: jax.Array           # (b, t, num_agents, d)
    state_pred: jax.Array | None
    actor: jax.Array | None
    critic: jax.Array | None


class DynamicsCache(NamedTuple):
    main: TransformerCache
    actor: TransformerCache | None = None
    critic: TransformerCache | None = None
    spatial: TransformerCache | None = None
    action: TransformerCache | None = None


class DynamicsWorldModel(nn.Module):
    dim: int
    dim_latent: int
    num_latent_tokens: int
    max_steps: int = 64                    # K_max, power of 2
    num_register_tokens: int = 8
    num_spatial_tokens: int = 4
    num_agents: int = 1
    num_tasks: int = 0
    num_latent_genes: int = 0
    num_video_views: int = 1
    depth: int = 4
    actor_depth: int = 0
    critic_depth: int = 0
    spatial_pre_encoder_depth: int = 0
    action_pre_encoder_depth: int = 0
    time_block_every: int = 4
    attn_heads: int = 8
    attn_dim_head: int = 64
    query_heads: int | None = None
    attn_softclamp_value: float = 50.0
    pred_orig_latent: bool = True          # x-space (True) vs v-space
    identity_latents_to_spatial: bool = False
    # proprio / state
    dim_proprio: int | None = None
    dim_state: int | None = None
    dim_critic_state: int | None = None
    # rewards / values
    reward_encoder_type: str = 'hl_gauss'
    reward_range: tuple[float, float] = (-20.0, 20.0)
    reward_num_bins: int = 255
    value_num_bins: int | None = None
    add_reward_embed_to_agent_token: bool = False
    add_reward_embed_dropout: float = 0.1
    predict_terminals: bool = True
    # actions
    num_discrete_actions: tuple[int, ...] = ()
    num_continuous_actions: int = 0
    continuous_norm_stats: tuple[tuple[float, float], ...] | None = None
    continuous_dist_type: str = 'beta'
    continuous_target_action_range: tuple[float, float] | None = None
    multi_token_pred_len: int = 8
    # Δ TPU-framework extension (not in the reference): additively inject the
    # (shifted) action embedding into every spatial token of its frame group,
    # the way flow models inject their conditioning. The reference conditions
    # on actions only through one attendable token per frame
    # (dreamer4.py:7088-7130), and we measured that pathway to be weak: at
    # init a flipped action moves the same-frame flow pred by <1%, and early
    # flow training suppresses it further (the model first learns
    # action-averaged dynamics) — an action-blind WM makes imagination RL
    # impossible on action-critical tasks. Off by default for reference
    # parity.
    add_action_embed_to_spatial: bool = False
    # heads
    policy_head_mlp_depth: int = 3
    value_head_mlp_depth: int = 3
    # Δ TPU-framework extension: feed the policy/value heads from dedicated
    # latent encoders (trained by RL only) instead of the trunk's agent
    # embeds. Latents are stable data, so heads-only RL no longer chases a
    # moving representation while the WM keeps training — measured in the
    # round-2 dream-RL runs: every WM update/refresh shifted the agent
    # embeds and re-randomized the policy (entropy snapped back to uniform).
    actor_critic_latent_input: bool = False
    # state pred
    add_state_pred_head: bool = False
    agent_predicts_state: bool = False
    agent_predicts_state_frac_gradient: float = 0.0
    eps_latent_pred: float = 1e-6
    # latent AR
    latent_ar: bool = False
    latent_ar_layer: int | tuple[int, int] | None = None
    latent_ar_action_conditioned: bool = False
    latent_ar_num_slices: int = 256
    # aug conditioning
    has_aug_conditioning: bool = False
    aug_cfg_dropout_prob: float = 0.1
    # SSL
    ssl_lapo: bool = False
    lapo_pred_actions: bool = True
    lapo_use_fdm: bool = True
    ssl_tem: bool = False
    tem_first_state_as_init_hidden: bool = True
    tem_learn_relative_actions: bool = False
    actor_spr: bool = False
    actor_spr_num_rollouts: int = 1
    lapo_action_loss_weight: float = 1.0
    lapo_fdm_loss_weight: float = 1.0
    lapo_raw_latent_fdm_loss_weight: float = 1.0
    tem_loss_weight: float = 1.0
    # loss weights
    latent_flow_loss_weight: float = 1.0
    shortcut_loss_weight: float = 1.0
    reward_loss_weight: float = 1.0
    terminal_loss_weight: float = 1.0
    # Weighted BCE for the terminal head: positives (terminal frames) are
    # ~1-per-episode, so at 150-step episodes they carry ~0.7% of the mean
    # BCE gradient and the head converges to the base rate without ever
    # using its input (measured on the pixel-CartPole pipeline: p_term 0.033
    # at true terminal frames AND mid-episode, while a linear probe on the
    # same pooled latents reaches AUC 0.72 — the signal is there, the
    # gradient pressure is not). 1.0 = reference parity (plain BCE,
    # `dreamer4.py:7466-7490`); episodic pixel tasks want ~1/positive-rate.
    terminal_pos_weight: float = 1.0
    discrete_action_loss_weight: float = 1.0
    continuous_action_loss_weight: float = 1.0
    state_pred_loss_weight: float = 0.1
    agent_state_pred_loss_weight: float = 0.1
    # exploration bonus: mean Beta entropy of the state prediction added to
    # real-env rewards during interaction (reference `dreamer4.py:4705,
    # 5735-5740`)
    state_entropy_bonus_weight: float = 0.0
    latent_ar_loss_weight: float = 0.0
    latent_ar_sigreg_loss_weight: float = 0.05
    use_loss_normalization: bool = False
    use_flash_attention: bool = False
    flash_min_scores: int = 128 * 128   # min q_len*k_len before the fused kernel engages
    # small-shape fused kernel for sub-flash-gate attention — experimental
    # opt-in, default off (see AxialSpaceTimeTransformer.use_fused_small for
    # the round-5 measurements that retired it from the default path)
    use_fused_small: bool | None = None
    time_attention_use_pope: bool = False
    use_time_rnn: bool = False
    mot_temporal: bool = False
    # per-layer attention pools over the hidden stack (reference
    # `dreamer4.py:2785, 2870-2878`); exposed for parity and for the
    # measured pool-cost ablation in docs/tpu_performance_notes.md
    use_attn_pool: bool = True
    # H-Net temporal chunking on the MAIN trunk (reference splices the
    # hierarchical temporal transformer into the dynamics trunk the same
    # way as the tokenizer's, `dreamer4.py:3151-3170`)
    h_net_layer: int | None = None
    h_net_depth: int = 2
    h_net_compression_ratio: int = 4
    h_net_dynamic: bool = False
    h_net_loss_weight: float = 1.0
    # RL hyperparameters (consumed by models/rl.py)
    gae_discount_factor: float = 0.997
    gae_lambda: float = 0.95
    ppo_eps_clip: float = 0.2
    pmpo_pos_to_neg_weight: float = 0.5
    pmpo_reverse_kl: bool = True
    pmpo_kl_div_loss_weight: float = 0.3
    use_delight_gating: bool = True
    delight_temperature: float = 1.0
    value_clip: float = 0.4
    clip_values: bool = False
    policy_entropy_weight: float = 0.01
    agent_policy_gradient_frac: float = 1.0
    agent_value_gradient_frac: float = 1.0
    keep_reward_ema_stats: bool = False
    reward_ema_decay: float = 0.998
    reward_quantile_filter: tuple[float, float] = (0.05, 0.95)
    normalize_advantages: bool | None = None
    dtype: jnp.dtype | None = None

    # ------------------------------------------------------------ properties

    @property
    def num_step_sizes_log2(self) -> int:
        assert self.max_steps & (self.max_steps - 1) == 0
        return int(math.log2(self.max_steps))

    @property
    def prob_shortcut_train(self) -> float:
        return 1.0 - 1.0 / self.num_step_sizes_log2

    @property
    def latent_shape(self) -> tuple[int, int]:
        return (self.num_latent_tokens, self.dim_latent)

    @property
    def has_proprio(self) -> bool:
        return self.dim_proprio is not None

    @property
    def should_pred_state(self) -> bool:
        return self.add_state_pred_head and self.state_pred_loss_weight > 0.0

    @property
    def add_state_entropy_bonus(self) -> bool:
        return self.should_pred_state and self.state_entropy_bonus_weight > 0.0

    @property
    def has_actions(self) -> bool:
        return len([n for n in self.num_discrete_actions if n > 0]) > 0 or self.num_continuous_actions > 0

    @property
    def reward_encoder(self):
        return get_reward_encoder(self.reward_encoder_type,
                                  reward_range=self.reward_range, num_bins=self.reward_num_bins)

    @property
    def value_encoder(self):
        bins = self.value_num_bins if self.value_num_bins is not None else self.reward_num_bins
        return get_reward_encoder(self.reward_encoder_type,
                                  reward_range=self.reward_range, num_bins=bins)

    @property
    def video_has_multi_view(self) -> bool:
        return self.num_video_views > 1

    # tokens per frame: flow + spatial (per view) + proprio + state_pred +
    #                   registers + action + reward + aug + agents
    @property
    def tokens_per_frame(self) -> int:
        return (
            1
            + self.num_spatial_tokens * self.num_video_views
            + int(self.has_proprio)
            + int(self.should_pred_state)
            + self.num_register_tokens
            + int(self.has_actions)
            + int(self.add_reward_embed_to_agent_token)
            + int(self.has_aug_conditioning)
            + self.num_agents
        )

    # ---------------------------------------------------------------- setup

    def setup(self):
        dim, dim_latent = self.dim, self.dim_latent
        same_len = self.num_spatial_tokens == self.num_latent_tokens

        if self.identity_latents_to_spatial:
            assert dim == dim_latent and same_len
            self.latents_to_spatial_tokens = None
        elif same_len:
            self.latents_to_spatial_tokens = nn.Dense(dim, name='latents_to_spatial_tokens')
        else:
            self.latents_to_spatial_tokens = LearnedQueriesAttentionPool(
                self.num_spatial_tokens, dim, dim_kv_input=dim_latent,
                heads=self.attn_heads, dim_head=self.attn_dim_head,
                name='latents_to_spatial_tokens')

        self.latent_pred_norm = RMSNorm(name='latent_pred_norm')
        self.latent_pred_pool = None if same_len else LearnedQueriesAttentionPool(
            self.num_latent_tokens, dim, heads=self.attn_heads, dim_head=self.attn_dim_head,
            name='latent_pred_pool')
        self.to_latent_pred = nn.Dense(dim_latent, use_bias=False, name='to_latent_pred')

        if self.has_proprio:
            self.to_proprio_token = nn.Dense(dim, name='to_proprio_token')
            self.proprio_pred_norm = RMSNorm(name='proprio_pred_norm')
            self.to_proprio_pred = nn.Dense(self.dim_proprio, name='to_proprio_pred')

        if self.dim_state is not None:
            self.state_to_latents_proj = nn.Dense(self.num_latent_tokens * dim_latent,
                                                  use_bias=False, name='state_to_latents')

        if self.dim_critic_state is not None:
            self.critic_state_embedder = nn.Dense(dim, name='critic_state_embedder')

        self.register_tokens = self.param('register_tokens', nn.initializers.normal(1e-2),
                                          (self.num_register_tokens, dim))

        # shortcut flow embeddings (reference `dreamer4.py:4886-4898`)
        assert dim % 2 == 0
        self.signal_levels_embed = nn.Embed(self.max_steps, dim // 2, name='signal_levels_embed')
        self.step_size_embed = nn.Embed(self.num_step_sizes_log2 + 1, dim // 2, name='step_size_embed')

        self.agent_learned_embed = self.param('agent_learned_embed', nn.initializers.normal(1.0),
                                              (self.num_agents, dim))
        self.action_learned_embed = self.param('action_learned_embed', nn.initializers.normal(1.0),
                                               (self.num_agents, dim))
        self.reward_learned_embed = self.param('reward_learned_embed', nn.initializers.normal(1.0),
                                               (self.num_agents, dim))

        if self.num_tasks > 0:
            self.task_embed = nn.Embed(self.num_tasks, dim, name='task_embed')
        if self.num_latent_genes > 0:
            self.latent_genes = self.param('latent_genes', nn.initializers.normal(1.0),
                                           (self.num_latent_genes, dim))

        self.policy_head = create_mlp(dim * 4, self.policy_head_mlp_depth, dim * 4, name='policy_head')

        self.action_embedder = ActionEmbedder(
            dim=dim,
            num_discrete_actions=self.num_discrete_actions,
            num_continuous_actions=self.num_continuous_actions,
            continuous_norm_stats=self.continuous_norm_stats,
            continuous_dist_type=self.continuous_dist_type,
            continuous_target_action_range=self.continuous_target_action_range,
            can_unembed=True,
            unembed_dim=dim * 4,
            num_unembed_preds=self.multi_token_pred_len,
            name='action_embedder',
        )

        if self.add_reward_embed_to_agent_token:
            self.reward_bin_embed = nn.Embed(self.reward_num_bins, dim, name='reward_bin_embed')

        self.to_reward_pred = EnsembleHead(self.multi_token_pred_len, self.reward_num_bins,
                                           name='to_reward_pred')

        if self.predict_terminals:
            self.to_state_terminal_pred = create_mlp(dim_latent * 4, 1, 1, name='to_state_terminal_pred')

        value_bins = self.value_num_bins if self.value_num_bins is not None else self.reward_num_bins
        self.value_head = create_mlp(dim * 4, self.value_head_mlp_depth, value_bins, name='value_head')

        if self.actor_critic_latent_input:
            # multi-view: the shared encoders run per view and the outputs are
            # mean-pooled (see latent_actor_inputs)
            self.actor_latent_encoder = create_mlp(dim, 2, dim,
                                                   name='actor_latent_encoder')
            self.critic_latent_encoder = create_mlp(dim, 2, dim,
                                                    name='critic_latent_encoder')

        if self.should_pred_state:
            self.state_pred_token = self.param('state_pred_token', nn.initializers.normal(1e-2), (dim,))
            self.state_pred_norm = RMSNorm(name='state_pred_norm')
            # per-view Beta params: (v, n, d_latent, 2) flattened
            self.to_state_pred = nn.Dense(
                self.num_video_views * self.num_latent_tokens * dim_latent * 2,
                name='to_state_pred')

        if self.agent_predicts_state:
            dim_in = dim * 2 if self.has_actions else dim
            self.agent_state_pred_net = create_mlp(
                dim_in, 2,
                self.num_video_views * self.num_latent_tokens * dim_latent * 2,
                name='agent_state_pred_net')

        if self.latent_ar:
            assert self.latent_ar_layer is not None
            self.latent_ar_module = LatentAutoregressiveLoss(
                dim=dim,
                dim_in=dim * 2 if self.latent_ar_action_conditioned else dim,
                sigreg_num_slices=self.latent_ar_num_slices,
                name='latent_ar_module',
            )

        num_special = self.num_agents + int(self.has_aug_conditioning)
        trunk_kwargs = dict(
            dim=dim,
            attn_heads=self.attn_heads,
            attn_dim_head=self.attn_dim_head,
            query_heads=self.query_heads,
            attn_softclamp_value=self.attn_softclamp_value,
            time_block_every=self.time_block_every,
            num_special_tokens=num_special,
            final_norm=False,
            use_flash_attention=self.use_flash_attention,
            flash_min_scores=self.flash_min_scores,
            use_fused_small=self.use_fused_small,
            time_attention_use_pope=self.time_attention_use_pope,
            rnn_time=self.use_time_rnn,
            mot_temporal=self.mot_temporal,
            use_attn_pool=self.use_attn_pool,
            dtype=self.dtype,
        )
        # H-Net applies to the main trunk only (actor/critic heads are
        # shallow refinement stacks; chunking them buys nothing)
        self.transformer = AxialSpaceTimeTransformer(
            depth=self.depth, h_net_layer=self.h_net_layer,
            h_net_depth=self.h_net_depth,
            h_net_compression_ratio=self.h_net_compression_ratio,
            h_net_dynamic=self.h_net_dynamic,
            **trunk_kwargs, name='transformer')
        if self.actor_depth > 0:
            self.actor_transformer = AxialSpaceTimeTransformer(
                depth=self.actor_depth, **trunk_kwargs, name='actor_transformer')
        if self.critic_depth > 0:
            self.critic_transformer = AxialSpaceTimeTransformer(
                depth=self.critic_depth, **trunk_kwargs, name='critic_transformer')

        if self.spatial_pre_encoder_depth > 0:
            self.spatial_pre_encoder = AxialSpaceTimeTransformer(
                dim=dim, depth=self.spatial_pre_encoder_depth,
                attn_heads=self.attn_heads, attn_dim_head=self.attn_dim_head,
                query_heads=self.query_heads,
                attn_softclamp_value=self.attn_softclamp_value,
                time_block_every=self.time_block_every,
                num_special_tokens=0, final_norm=False, dtype=self.dtype,
                name='spatial_pre_encoder')
        if self.action_pre_encoder_depth > 0:
            assert self.has_actions
            self.action_pre_encoder = AxialSpaceTimeTransformer(
                dim=dim, depth=self.action_pre_encoder_depth,
                attn_heads=self.attn_heads, attn_dim_head=self.attn_dim_head,
                query_heads=self.query_heads,
                attn_softclamp_value=self.attn_softclamp_value,
                time_block_every=1,  # every layer over time (reference `dreamer4.py:5136`)
                num_special_tokens=0, final_norm=False, dtype=self.dtype,
                name='action_pre_encoder')

        if self.has_aug_conditioning:
            self.aug_cond_embedding = nn.Embed(3, dim, name='aug_cond_embedding')
        if self.video_has_multi_view:
            self.view_emb = self.param('view_emb', nn.initializers.normal(1e-2),
                                       (self.num_video_views, dim))

        if self.ssl_lapo:
            from ..nn.ssl import LAPO
            assert self.spatial_pre_encoder_depth > 0, 'LAPO requires the spatial pre-encoder'
            self.ssl_lapo_module = LAPO(
                dim_embed=dim, dim_latent_action=dim,
                num_discrete_actions=self.num_discrete_actions,
                num_continuous_actions=self.num_continuous_actions,
                dim_raw_latent=self.dim_latent,
                num_raw_latent_tokens=self.num_latent_tokens,
                pred_actions=self.lapo_pred_actions, use_fdm=self.lapo_use_fdm,
                name='ssl_lapo_module')
        if self.ssl_tem:
            from ..nn.ssl import TEM
            assert self.action_pre_encoder_depth > 0, 'TEM requires the action pre-encoder'
            self.ssl_tem_module = TEM(
                dim_action_embed=dim, dim_raw_latent=self.dim_latent,
                num_raw_latent_tokens=self.num_latent_tokens,
                first_state_as_init_hidden=self.tem_first_state_as_init_hidden,
                learn_relative_actions=self.tem_learn_relative_actions,
                name='ssl_tem_module')
        if self.actor_spr:
            from ..nn.ssl import ActorSPR
            self.actor_spr_module = ActorSPR(
                dim=dim * 4, num_rollouts=self.actor_spr_num_rollouts,
                name='actor_spr_module')

        if self.use_loss_normalization:
            self.flow_loss_normalizer = LossNormalizer(name='flow_loss_normalizer')
            self.shortcut_loss_normalizer = LossNormalizer(name='shortcut_loss_normalizer')
            self.reward_loss_normalizer = LossNormalizer(self.multi_token_pred_len, name='reward_loss_normalizer')
            if self.predict_terminals:
                self.terminal_loss_normalizer = LossNormalizer(name='terminal_loss_normalizer')
            self.discrete_actions_loss_normalizer = LossNormalizer(self.multi_token_pred_len,
                                                                   name='discrete_actions_loss_normalizer')
            self.continuous_actions_loss_normalizer = LossNormalizer(self.multi_token_pred_len,
                                                                     name='continuous_actions_loss_normalizer')

    # -------------------------------------------------------------- helpers

    def get_times_from_signal_level(self, signal_levels):
        return signal_levels.astype(jnp.float32) / self.max_steps

    def _touch_all_params(self):
        """Exercise every optional head once at init time so all params exist
        regardless of which inputs the init call provided (linen submodules
        materialize lazily; the reference creates everything in __init__)."""
        d = self.dim
        e = jnp.zeros((1, d))
        e4 = jnp.zeros((1, d * 4))
        self.policy_head(e)
        self.value_head(e)
        self.to_reward_pred(e)
        if self.actor_critic_latent_input:
            flat = jnp.zeros((1, self.num_latent_tokens * self.dim_latent))
            self.actor_latent_encoder(flat)
            self.critic_latent_encoder(flat)
        if self.predict_terminals:
            self.to_state_terminal_pred(jnp.zeros((1, self.dim_latent)))
        if self.dim_state is not None:
            self.state_to_latents_proj(jnp.zeros((1, self.dim_state)))
        if self.dim_critic_state is not None:
            self.critic_state_embedder(jnp.zeros((1, self.dim_critic_state)))
        if self.has_actions:
            na_d = len([x for x in self.num_discrete_actions if x > 0])
            self.action_embedder(
                discrete_actions=jnp.zeros((1, na_d), jnp.int32) if na_d > 0 else None,
                continuous_actions=jnp.zeros((1, self.num_continuous_actions))
                if self.num_continuous_actions > 0 else None)
            self.action_embedder.unembed(e4)
        if self.add_reward_embed_to_agent_token:
            self.reward_bin_embed(jnp.zeros((1,), jnp.int32))
        if self.num_tasks > 0:
            self.task_embed(jnp.zeros((1,), jnp.int32))
        if self.action_pre_encoder_depth > 0:
            self.action_pre_encoder(jnp.zeros((1, 1, 1, d)))
        if self.actor_spr:
            self.actor_spr_module(jnp.zeros((1, 3, d * 4)), jnp.zeros((1, 3, d)))
        if self.agent_predicts_state:
            dim_in = d * 2 if self.has_actions else d
            self.agent_state_pred_net(jnp.zeros((1, dim_in)))

    def state_to_latents(self, state):
        """(..., dim_state) -> (..., n, d_latent) for state-vector envs
        (reference `dreamer4.py:4855-4862`)."""
        out = self.state_to_latents_proj(state)
        return out.reshape(*state.shape[:-1], self.num_latent_tokens, self.dim_latent)

    def latent_actor_inputs(self, latents):
        """(..., n, d_latent) -> (actor_in, critic_in), each (..., dim) — the
        drift-free policy/value inputs (see actor_critic_latent_input).

        With `num_video_views > 1` pass (..., v, n, d_latent): the shared
        encoders run per view and the outputs are mean-pooled over views."""
        flat = latents.reshape(*latents.shape[:-2], -1)
        a = self.actor_latent_encoder(flat)
        c = self.critic_latent_encoder(flat)
        if self.num_video_views > 1:
            a, c = a.mean(axis=-2), c.mean(axis=-2)
        return a, c

    def init_cache(self, batch: int, max_time: int, dtype=None) -> DynamicsCache:
        # KV caches default to the trunk's compute dtype: a bf16 model keeps a
        # bf16 cache (half the HBM traffic of f32 — decode is bandwidth-bound;
        # the cached values are produced in bf16 anyway, so no extra loss)
        if dtype is None:
            dtype = self.dtype if self.dtype is not None else jnp.float32
        s = self.tokens_per_frame
        return DynamicsCache(
            main=self.transformer.init_cache(batch, s, max_time, dtype=dtype),
            actor=(self.actor_transformer.init_cache(batch, s, max_time, dtype=dtype)
                   if self.actor_depth > 0 else None),
            critic=(self.critic_transformer.init_cache(batch, s, max_time, dtype=dtype)
                    if self.critic_depth > 0 else None),
            spatial=(self.spatial_pre_encoder.init_cache(
                batch, self.num_spatial_tokens * self.num_video_views, max_time, dtype=dtype)
                if self.spatial_pre_encoder_depth > 0 else None),
            action=(self.action_pre_encoder.init_cache(batch, 1, max_time, dtype=dtype)
                    if self.action_pre_encoder_depth > 0 else None),
        )

    def _reward_tokens(self, rewards, time, is_training: bool, reward_token_mask=None,
                       agent_index: int = 0):
        """(b, t') rewards -> (b, t, 1, d) shifted reward tokens, or None.

        `reward_token_mask` (b, t) zeroes the reward *embedding* (not the
        learned embed) where False — used by `generate` for the first frame,
        matching the reference's left-pad-with-zero (`dreamer4.py:7052`)."""
        if not self.add_reward_embed_to_agent_token or rewards is None:
            return None
        b = rewards.shape[0]
        two_hot = self.reward_encoder.encode(rewards)  # (b, t', bins)
        embeds = jnp.einsum('...l,ld->...d', two_hot, self.reward_bin_embed.embedding)

        is_sequential = time == 1 and embeds.shape[1] == 1
        if not is_sequential:
            # shift right so each agent token sees the previous reward
            # (reference `dreamer4.py:7047-7052`)
            pop_last = 1 if embeds.shape[1] == time else 0
            embeds = jnp.pad(embeds[:, : embeds.shape[1] - pop_last], ((0, 0), (1, 0), (0, 0)))
            embeds = embeds[:, :time]

        if is_training and self.add_reward_embed_dropout > 0.0:
            keep = jax.random.bernoulli(self.make_rng('sample'), 1.0 - self.add_reward_embed_dropout)
            embeds = jnp.where(keep, embeds, 0.0)

        if reward_token_mask is not None:
            embeds = embeds * reward_token_mask[..., None]

        # per-agent learned embed: rewards/actions supplied to the forward
        # belong to `agent_index`'s stream (the reference allocates
        # (num_agents, dim) embeds, `dreamer4.py:4934-4937`, but its token
        # build only ever adds row 0; here the row is selected)
        tokens = embeds + self.reward_learned_embed[agent_index]
        return tokens[:, :, None, :]

    def _action_tokens(self, discrete_actions, continuous_actions, time, shift: bool,
                       is_sequential: bool, action_token_mask=None,
                       agent_index: int = 0):
        """-> (action_tokens (b,t,1,d) | None, next_action_tokens | None).

        `action_token_mask` (b, t) zeroes the whole action token where False —
        the static-shape equivalent of the reference's zero action token when
        no action history exists yet (`dreamer4.py:7125`)."""
        if not self.has_actions:
            return None, None

        if discrete_actions is None and continuous_actions is None:
            return None, None  # caller substitutes zeros

        tokens = self.action_embedder(discrete_actions=discrete_actions,
                                      continuous_actions=continuous_actions)
        tokens = tokens + self.action_learned_embed[agent_index]
        action_len = tokens.shape[1]

        if action_len == time and shift and not is_sequential:
            # replay-buffer pairing: action at t is taken *from* state t, so the
            # token paired with state t is the previous action
            # (reference `dreamer4.py:7105-7110`)
            next_action_tokens = tokens
            tokens = jnp.pad(tokens[:, :-1], ((0, 0), (1, 0), (0, 0)))
        elif action_len == time - 1:
            next_action_tokens = tokens
            tokens = jnp.pad(tokens, ((0, 0), (1, 0), (0, 0)))
        else:
            next_action_tokens = tokens

        if action_token_mask is not None:
            tokens = tokens * action_token_mask[..., None]

        return tokens[:, :, None, :], next_action_tokens

    # ---------------------------------------------------------- prediction

    def _predict(
        self,
        noised_latents,          # (b, t, v, n, d_latent)
        noised_proprio,          # (b, t, dp) | None
        signal_levels,           # (b, t) ints
        step_sizes_log2,         # (b,) ints
        action_tokens,           # (b, t, 1, d) | None
        reward_tokens,           # (b, t, 1, d) | None
        aug_token,               # (b, t, 1, d) | None
        agent_tokens,            # (b, t, num_agents, d)
        cache: DynamicsCache | None = None,
        max_time: int | None = None,
    ):
        b, t, v = noised_latents.shape[:3]
        dim = self.dim
        s_per_view = self.num_spatial_tokens

        if self.latents_to_spatial_tokens is None:
            space_tokens = noised_latents
        else:
            space_tokens = self.latents_to_spatial_tokens(noised_latents)  # (b, t, v, s, d)

        if self.video_has_multi_view:
            space_tokens = space_tokens + self.view_emb[None, None, :, None, :]

        space_tokens = space_tokens.reshape(b, t, v * s_per_view, dim)

        # first-class action conditioning (see add_action_embed_to_spatial):
        # (b, t, 1, d) action tokens broadcast-add over the frame's spatial
        # tokens, so the denoising target depends on the action directly
        # instead of only through attention to one maskable token
        if self.add_action_embed_to_spatial and action_tokens is not None:
            space_tokens = space_tokens + action_tokens

        # spatial pre-encoding (reference `dreamer4.py:7212-7213`)
        pre_encoded_spatial = None
        spatial_interm = None
        if self.spatial_pre_encoder_depth > 0:
            space_tokens, spatial_interm = self.spatial_pre_encoder(
                space_tokens, cache=cache.spatial if cache is not None else None,
                max_time=max_time, return_intermediates=True,
                collect_normed_inputs=False)
            pre_encoded_spatial = space_tokens

        # action pre-encoding (reference `dreamer4.py:7217-7218`)
        action_interm = None
        if self.action_pre_encoder_depth > 0 and action_tokens is not None:
            action_tokens, action_interm = self.action_pre_encoder(
                action_tokens, cache=cache.action if cache is not None else None,
                max_time=max_time, return_intermediates=True,
                collect_normed_inputs=False)

        registers = jnp.broadcast_to(self.register_tokens[None, None], (b, t, self.num_register_tokens, dim))

        parts = []

        signal_emb = self.signal_levels_embed(signal_levels)           # (b, t, dim/2)
        step_emb = self.step_size_embed(step_sizes_log2)               # (b, dim/2)
        step_emb = jnp.broadcast_to(step_emb[:, None], (b, t, dim // 2))
        flow_token = jnp.concatenate([signal_emb, step_emb], axis=-1)  # (b, t, dim)
        parts.append(flow_token[:, :, None, :])

        parts.append(space_tokens)

        if self.has_proprio:
            assert noised_proprio is not None
            parts.append(self.to_proprio_token(noised_proprio)[:, :, None, :])

        if self.should_pred_state:
            parts.append(jnp.broadcast_to(self.state_pred_token[None, None, None], (b, t, 1, dim)))

        parts.append(registers)

        if self.has_actions:
            if action_tokens is None:
                action_tokens = jnp.zeros((b, t, 1, dim))
            parts.append(action_tokens)

        if self.add_reward_embed_to_agent_token:
            if reward_tokens is None:
                reward_tokens = jnp.broadcast_to(self.reward_learned_embed[0][None, None, None],
                                                 (b, t, 1, dim)) * 0.0
            parts.append(reward_tokens)

        if self.has_aug_conditioning:
            if aug_token is None:
                aug_token = jnp.broadcast_to(
                    self.aug_cond_embedding(jnp.zeros((b,), jnp.int32))[:, None, None, :],
                    (b, t, 1, dim))
            parts.append(aug_token)

        parts.append(agent_tokens)

        sizes = [p.shape[2] for p in parts]
        tokens = jnp.concatenate(parts, axis=2)
        assert tokens.shape[2] == self.tokens_per_frame

        main_cache = cache.main if cache is not None else None
        tokens, interm = self.transformer(tokens, cache=main_cache, max_time=max_time,
                                          return_intermediates=True,
                                          collect_normed_inputs=False)

        # actor / critic transformer heads (reference `dreamer4.py:7230-7238`)
        actor_tokens = critic_tokens = None
        actor_interm = critic_interm = None
        if self.actor_depth > 0:
            actor_tokens, actor_interm = self.actor_transformer(
                tokens, cache=cache.actor if cache is not None else None,
                max_time=max_time, return_intermediates=True,
                collect_normed_inputs=False)
        if self.critic_depth > 0:
            critic_tokens, critic_interm = self.critic_transformer(
                tokens, cache=cache.critic if cache is not None else None,
                max_time=max_time, return_intermediates=True,
                collect_normed_inputs=False)

        # unpack
        offsets = [0]
        for s in sizes:
            offsets.append(offsets[-1] + s)
        idx = 0
        idx += 1  # flow token
        space_out = tokens[:, :, offsets[idx]:offsets[idx + 1]]; idx += 1
        proprio_out = None
        if self.has_proprio:
            proprio_out = tokens[:, :, offsets[idx]:offsets[idx + 1]]; idx += 1
        state_pred_out = None
        if self.should_pred_state:
            state_pred_out = tokens[:, :, offsets[idx]:offsets[idx + 1]]; idx += 1
        idx += 1  # registers
        if self.has_actions:
            idx += 1
        if self.add_reward_embed_to_agent_token:
            idx += 1
        if self.has_aug_conditioning:
            idx += 1
        agent_slice = slice(offsets[idx], offsets[idx + 1])
        agent_out = tokens[:, :, agent_slice]
        actor_agent = actor_tokens[:, :, agent_slice] if actor_tokens is not None else agent_out
        critic_agent = critic_tokens[:, :, agent_slice] if critic_tokens is not None else agent_out

        # latent prediction head (per view)
        space_per_view = space_out.reshape(b, t, v, s_per_view, dim)
        h = self.latent_pred_norm(space_per_view)
        if self.latent_pred_pool is not None:
            h = self.latent_pred_pool(h)
        pred = self.to_latent_pred(h)  # (b, t, v, n, d_latent)

        pred_proprio = None
        if self.has_proprio:
            pred_proprio = self.to_proprio_pred(self.proprio_pred_norm(proprio_out[:, :, 0]))

        pred_state = None
        if self.should_pred_state:
            s = self.to_state_pred(self.state_pred_norm(state_pred_out[:, :, 0]))
            pred_state = s.reshape(b, t, v, self.num_latent_tokens, self.dim_latent, 2)
            if v == 1:
                pred_state = pred_state[:, :, 0]  # single-view callers keep (b, t, n, d, 2)

        predictions = Predictions(flow=pred, proprio=pred_proprio, state=pred_state)
        embeds = Embeds(agent=agent_out, state_pred=state_pred_out,
                        actor=actor_agent, critic=critic_agent)
        new_cache = None
        if interm.cache is not None:
            new_cache = DynamicsCache(
                main=interm.cache,
                actor=actor_interm.cache if actor_interm is not None else None,
                critic=critic_interm.cache if critic_interm is not None else None,
                spatial=spatial_interm.cache if spatial_interm is not None else None,
                action=action_interm.cache if action_interm is not None else None,
            )
        aux = dict(interm=interm, pre_encoded_spatial=pre_encoded_spatial,
                   space_out=space_out)
        return predictions, embeds, aux, new_cache

    # -------------------------------------------------------------- forward

    def __call__(
        self,
        *,
        latents=None,                 # (b, t, n, d_latent)
        signal_levels=None,           # int | (b,) | (b, t)
        step_sizes=None,              # int | (b,)
        step_sizes_log2=None,         # int | (b,)
        rewards=None,                 # (b, t) | (b, t-1)
        terminals=None,               # (b,) | (b, t)
        discrete_actions=None,        # (b, t, na) | (b, t-1, na)
        continuous_actions=None,
        shift_action_tokens: bool = True,
        proprio=None,                 # (b, t, dp)
        tasks=None,                   # (b,)
        latent_gene_ids=None,         # (b,)
        lens=None,                    # (b,)
        agent_token_cond=None,        # (b, t, d)
        action_token_mask=None,       # (b, t) — see _action_tokens
        reward_token_mask=None,       # (b, t) — see _reward_tokens
        aug_id=None,
        cfg_dropout_aug: bool | None = None,
        latent_has_view_dim: bool = False,
        agent_index: int = 0,         # which agent's stream the actions/rewards belong to (static)
        cache: DynamicsCache | None = None,
        max_time: int | None = None,
        latent_is_noised: bool = False,
        return_pred_only: bool = False,
        return_intermediates: bool = False,
        return_layer_hiddens: bool = False,
        shortcut_train: bool | None = None,
        update_loss_ema: bool = True,
        is_training: bool = True,
    ):
        assert latents is not None, 'pass tokenizer latents (tokenize video on the host side or via WorldModel.tokenize)'
        if self.is_initializing():
            self._touch_all_params()
        b, time = latents.shape[:2]

        # standardize the view dimension: (b, t, v, n, d)
        if latents.ndim == 4 and not latent_has_view_dim:
            latents = latents[:, :, None]
        assert latents.shape[2] == self.num_video_views
        assert latents.shape[-2:] == self.latent_shape

        # ---- align rewards/terminals left-padded to states
        if rewards is not None and rewards.shape[1] == time - 1:
            rewards = jnp.pad(rewards, ((0, 0), (1, 0)))
        if terminals is not None and terminals.ndim == 2 and terminals.shape[1] == time - 1:
            terminals = jnp.pad(terminals, ((0, 0), (1, 0)))
        if discrete_actions is not None and discrete_actions.ndim == 2:
            discrete_actions = discrete_actions[..., None]
        if continuous_actions is not None and continuous_actions.ndim == 2:
            continuous_actions = continuous_actions[..., None]

        # ---- conform signal levels / step sizes
        def conform(x, dtype=jnp.int32):
            if x is None:
                return None
            x = jnp.asarray(x, dtype)
            if x.ndim == 0:
                x = jnp.broadcast_to(x, (b,))
            return x

        signal_levels = conform(signal_levels)
        if signal_levels is not None and signal_levels.ndim == 1:
            signal_levels = jnp.broadcast_to(signal_levels[:, None], (b, time))
        step_sizes = conform(step_sizes)
        step_sizes_log2 = conform(step_sizes_log2)

        if step_sizes is not None:
            assert step_sizes_log2 is None
            step_sizes_log2 = jnp.round(jnp.log2(step_sizes)).astype(jnp.int32)

        is_inference = signal_levels is not None
        return_pred_only = return_pred_only or latent_is_noised

        # ---- training-time signal sampling (diffusion forcing, eq (4))
        if not is_inference:
            assert shortcut_train is not None, (
                'training forward requires the trainer to choose shortcut_train '
                '(host-side bernoulli with p=model.prob_shortcut_train)')
            key = self.make_rng('sample')
            k_step, k_sig = jax.random.split(key)
            if shortcut_train:
                step_sizes_log2 = jax.random.randint(k_step, (b,), 1, self.num_step_sizes_log2)
                num_steps = 2 ** step_sizes_log2
                raw = jax.random.randint(k_sig, (b, time), 0, self.max_steps)
                signal_levels = raw // num_steps[:, None] * num_steps[:, None]
            else:
                step_sizes_log2 = jnp.zeros((b,), jnp.int32)
                signal_levels = jax.random.randint(k_sig, (b, time), 0, self.max_steps)

        times = self.get_times_from_signal_level(signal_levels)

        # ---- noising (diffusion forcing; reference `dreamer4.py:6989-6997`)
        if not latent_is_noised:
            key = self.make_rng('sample')
            k_l, k_p = jax.random.split(key)
            noise = jax.random.normal(k_l, latents.shape)
            t_aligned = times[..., None, None, None]
            noised_latents = noise + (latents - noise) * t_aligned
            proprio_noise = None
            noised_proprio = None
            if self.has_proprio:
                assert proprio is not None
                proprio_noise = jax.random.normal(k_p, proprio.shape)
                noised_proprio = proprio_noise + (proprio - proprio_noise) * times[..., None]
        else:
            noised_latents = latents
            noised_proprio = proprio

        # ---- agent tokens
        agent_tokens = jnp.broadcast_to(self.agent_learned_embed[None], (b, self.num_agents, self.dim))
        if tasks is not None:
            assert self.num_tasks > 0
            agent_tokens = agent_tokens + self.task_embed(tasks)[:, None, :]
        if latent_gene_ids is not None:
            assert self.num_latent_genes > 0
            agent_tokens = agent_tokens + self.latent_genes[latent_gene_ids][:, None, :]
        agent_tokens = jnp.broadcast_to(agent_tokens[:, None], (b, time, self.num_agents, self.dim))
        if agent_token_cond is not None:
            agent_tokens = agent_tokens + agent_token_cond[:, :, None, :]

        # ---- reward / action tokens
        is_sequential = cache is not None and time == 1
        reward_tokens = self._reward_tokens(rewards, time,
                                            is_training=is_training and not is_inference,
                                            reward_token_mask=reward_token_mask,
                                            agent_index=agent_index)
        action_tokens, next_action_tokens = self._action_tokens(
            discrete_actions, continuous_actions, time,
            shift=shift_action_tokens, is_sequential=is_sequential,
            action_token_mask=action_token_mask,
            agent_index=agent_index)

        # ---- aug conditioning token (reference `dreamer4.py:7134-7157`)
        aug_token = None
        if self.has_aug_conditioning:
            if cfg_dropout_aug is None:
                cfg_dropout_aug = is_training and not is_inference
            if aug_id is None:
                aug_id = 0
            if isinstance(aug_id, bool):
                aug_id = int(aug_id) + 1
            aug_ids = jnp.asarray(aug_id)
            if aug_ids.dtype == jnp.bool_:
                aug_ids = aug_ids.astype(jnp.int32) + 1
            aug_ids = jnp.broadcast_to(aug_ids, (b,)).astype(jnp.int32)
            if cfg_dropout_aug and self.aug_cfg_dropout_prob > 0.0:
                drop = jax.random.bernoulli(self.make_rng('sample'),
                                            self.aug_cfg_dropout_prob, (b,))
                aug_ids = jnp.where(drop, 0, aug_ids)
            aug_token = jnp.broadcast_to(
                self.aug_cond_embedding(aug_ids)[:, None, None, :], (b, time, 1, self.dim))

        # ---- main forward
        pred, embeds, aux, new_cache = self._predict(
            noised_latents, noised_proprio, signal_levels, step_sizes_log2,
            action_tokens, reward_tokens, aug_token, agent_tokens,
            cache=cache, max_time=max_time)
        interm = aux['interm']

        if return_pred_only:
            if not return_intermediates:
                return pred
            return pred, (embeds, new_cache)

        # ================================================================
        # losses
        # ================================================================
        zero = jnp.zeros(())
        is_x_space = self.pred_orig_latent
        h_net_loss = getattr(interm, 'h_net_loss', 0.0)

        # pack latents (+proprio) for unified flow math
        def pack_modalities(lat, prop):
            flat = lat.reshape(b, time, -1)
            if self.has_proprio:
                flat = jnp.concatenate([flat, prop], axis=-1)
            return flat

        packed_pred = pack_modalities(pred.flow, pred.proprio)
        noised = pack_modalities(noised_latents, noised_proprio)
        data = pack_modalities(latents, proprio)
        noise_packed = pack_modalities(noise, proprio_noise) if not latent_is_noised else None

        if is_x_space:
            pred_target = data
        else:
            pred_target = data - noise_packed

        flow_losses = jnp.square(packed_pred - pred_target)

        # ---- shortcut self-consistency (reference `dreamer4.py:7353-7406`)
        if shortcut_train:
            half_log2 = step_sizes_log2 - 1
            half_step = 2 ** half_log2

            lat_size = self.num_video_views * self.num_latent_tokens * self.dim_latent

            def run_frozen(noised_flat, sig, sl2):
                lat = noised_flat[..., :lat_size].reshape(
                    b, time, self.num_video_views, self.num_latent_tokens, self.dim_latent)
                prop = noised_flat[..., lat_size:] if self.has_proprio else None
                p, _, _, _ = self._predict(lat, prop, sig, sl2, action_tokens, reward_tokens,
                                           aug_token, agent_tokens)
                return pack_modalities(p.flow, p.proprio)

            first_pred = jax.lax.stop_gradient(run_frozen(noised, signal_levels, half_log2))

            first_times = times[..., None]
            if is_x_space:
                first_flow = (first_pred - noised) / (1.0 - first_times)
            else:
                first_flow = first_pred

            denoised = noised + first_flow * (half_step[:, None, None].astype(jnp.float32) / self.max_steps)
            signal_plus_half = signal_levels + half_step[:, None]
            second_pred = jax.lax.stop_gradient(run_frozen(denoised, signal_plus_half, half_log2))

            if is_x_space:
                second_times = self.get_times_from_signal_level(signal_plus_half)[..., None]
                second_flow = (second_pred - denoised) / (1.0 - second_times)
            else:
                second_flow = second_pred

            shortcut_target = jax.lax.stop_gradient((first_flow + second_flow) / 2.0)
            shortcut_pred = packed_pred
            shortcut_weight = 1.0
            if is_x_space:
                shortcut_pred = (shortcut_pred - noised) / (1.0 - first_times)
                shortcut_weight = jnp.square(1.0 - first_times)
            shortcut_losses = jnp.square(shortcut_pred - shortcut_target) * shortcut_weight
        else:
            shortcut_losses = jnp.zeros_like(flow_losses)

        # ramp loss weighting, eq (8)
        loss_weight = ramp_weight(times)[..., None]
        flow_losses = flow_losses * loss_weight

        is_var_len = lens is not None
        loss_mask = lens_to_mask(lens, time) if is_var_len else None
        loss_mask_without_last = loss_mask[:, :-1] if is_var_len else None

        if is_var_len:
            flow_loss = masked_mean(flow_losses, loss_mask[..., None])
            shortcut_loss = masked_mean(shortcut_losses, loss_mask[..., None]) if shortcut_train else zero
        else:
            flow_loss = jnp.mean(flow_losses)
            shortcut_loss = jnp.mean(shortcut_losses) if shortcut_train else zero

        # ---- reward loss (CE over MTP targets from shifted agent tokens)
        reward_loss = jnp.zeros((self.multi_token_pred_len,))
        if rewards is not None and time > 1:
            agent_mean = jnp.mean(embeds.agent, axis=2)  # (b, t, d)
            agent_shifted = agent_mean[:, :-1]
            reward_logits = self.to_reward_pred(agent_shifted)  # (mtp, b, t-1, bins)

            two_hot = self.reward_encoder.encode(rewards)
            reward_targets, reward_mask = create_multi_token_prediction_targets(
                two_hot[:, 1:], self.multi_token_pred_len)  # (b, t-1, mtp, bins)

            logp = jax.nn.log_softmax(reward_logits, axis=-1)
            logp = jnp.moveaxis(logp, 0, 2)               # (b, t-1, mtp, bins)
            ce = -jnp.sum(reward_targets * logp, axis=-1)  # (b, t-1, mtp)
            ce = jnp.where(reward_mask, ce, 0.0)

            if is_var_len:
                denom_mask = loss_mask_without_last[..., None] & reward_mask
                reward_loss = jnp.sum(jnp.where(denom_mask, ce, 0.0), axis=(0, 1)) / jnp.maximum(
                    jnp.sum(denom_mask, axis=(0, 1)), 1.0)
            else:
                reward_loss = jnp.mean(ce, axis=(0, 1))

        # ---- terminal loss (BCE with DreamerV3 label smoothing)
        terminal_loss = zero
        if terminals is not None and self.predict_terminals and time > 1:
            pooled = jnp.mean(latents[:, 1:], axis=(-3, -2))  # (b, t-1, d_latent)
            logits = self.to_state_terminal_pred(pooled)[..., 0]

            if terminals.ndim == 1:
                last_transition = jnp.maximum((lens - 2) if is_var_len else jnp.full((b,), time - 2), 0)
                seq = jnp.arange(time - 1)
                terminals_seq = (seq[None, :] == last_transition[:, None]) & terminals[:, None]
            else:
                terminals_seq = terminals[:, 1:]
            terminals_seq = terminals_seq.astype(jnp.float32)

            eps = 1.0 - self.gae_discount_factor
            terminals_seq = jnp.clip(terminals_seq, eps, 1.0 - eps)

            bce = jnp.maximum(logits, 0) - logits * terminals_seq + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            if self.terminal_pos_weight != 1.0:
                # upweight the (smoothed) positive frames; see
                # terminal_pos_weight in the config block
                bce = bce * (1.0 + (self.terminal_pos_weight - 1.0) * terminals_seq)
            terminal_loss = masked_mean(bce, loss_mask_without_last) if is_var_len else jnp.mean(bce)

        # ---- autoregressive state prediction (Beta NLL); per-view heads
        latents0 = latents[:, :, 0]
        multi_view = self.num_video_views > 1
        state_pred_loss = zero
        if self.should_pred_state and time > 1:
            pred_latent = pred.state[:, :-1]           # (b, t-1, [v,] n, d, 2)
            target = latents[:, 1:] if multi_view else latents0[:, 1:]
            latent_to_pred = (target + 1.0) / 2.0
            latent_to_pred = jnp.clip(latent_to_pred, self.eps_latent_pred, 1.0 - self.eps_latent_pred)
            nll = -dists.continuous_log_prob(pred_latent, latent_to_pred, 'beta')
            if is_var_len:
                mask = loss_mask_without_last.reshape(
                    *loss_mask_without_last.shape, *([1] * (nll.ndim - 2)))
                state_pred_loss = masked_mean(nll, mask)
            else:
                state_pred_loss = jnp.mean(nll)

        # ---- agent predicts state (Beta NLL off agent embed + next action)
        agent_state_pred_loss = zero
        if self.agent_predicts_state and time > 1:
            agent_embeds_in = jnp.mean(embeds.agent[:, :-1], axis=2)
            from ..ops.utils import frac_gradient
            agent_embeds_in = frac_gradient(agent_embeds_in, self.agent_predicts_state_frac_gradient)
            if self.has_actions:
                nat = next_action_tokens
                if nat is None:
                    nat = jnp.zeros((b, time, self.dim))
                seq_len = min(agent_embeds_in.shape[1], nat.shape[1])
                agent_embeds_in = jnp.concatenate(
                    [agent_embeds_in[:, :seq_len], nat[:, :seq_len]], axis=-1)
            s = self.agent_state_pred_net(agent_embeds_in)
            seq_len = s.shape[1]
            s = s.reshape(b, seq_len, self.num_video_views,
                          self.num_latent_tokens, self.dim_latent, 2)
            target = latents[:, 1:1 + seq_len] if multi_view else latents0[:, 1:1 + seq_len, None]
            latent_to_pred = (target + 1.0) / 2.0
            latent_to_pred = jnp.clip(latent_to_pred, self.eps_latent_pred, 1.0 - self.eps_latent_pred)
            nll = -dists.continuous_log_prob(s, latent_to_pred, 'beta')
            agent_state_pred_loss = (
                masked_mean(nll, loss_mask_without_last[:, :seq_len][..., None, None, None])
                if is_var_len else jnp.mean(nll))

        # ---- autoregressive action MTP loss (reference `dreamer4.py:7513-7598`)
        discrete_action_loss = jnp.zeros((self.multi_token_pred_len,))
        continuous_action_loss = jnp.zeros((self.multi_token_pred_len,))

        # (the reference gates this loss on num_agents == 1, `dreamer4.py:7521`;
        # here the loss reads the indexed agent's actor token so num_agents > 1
        # trains the per-agent policy whose actions were supplied)
        has_action_loss = (self.discrete_action_loss_weight + self.continuous_action_loss_weight) > 0
        if (has_action_loss and time > 1
                and (discrete_actions is not None or continuous_actions is not None)):
            da, ca = discrete_actions, continuous_actions
            if da is not None and shift_action_tokens:
                da = jnp.pad(da, ((0, 0), (1, 0), (0, 0)), constant_values=0)
            if ca is not None and shift_action_tokens:
                ca = jnp.pad(ca, ((0, 0), (1, 0), (0, 0)))

            first = da if da is not None else ca
            pred_len = first.shape[1]
            num_targets = pred_len - 1 if shift_action_tokens else pred_len

            if self.actor_critic_latent_input:
                # BC trains the policy head on the same input distribution
                # RL uses: the latent-encoder path, on clean latents
                actor_tokens, _ = self.latent_actor_inputs(
                    latents if multi_view else latents0)
            else:
                actor_tokens = embeds.actor[:, :, agent_index]  # (b, t, d)
            policy_embed = self.policy_head(actor_tokens[:, :num_targets])

            def make_mtp(actions):
                targets, mask = create_multi_token_prediction_targets(actions, self.multi_token_pred_len)
                if shift_action_tokens:
                    targets, mask = targets[:, 1:], mask[:, 1:]
                targets = jnp.moveaxis(targets, 2, 0)  # (mtp, b, t, na)
                mask = jnp.moveaxis(mask, 2, 0)        # (mtp, b, t)
                return targets, mask

            d_targets = c_targets = None
            if da is not None:
                d_targets, d_mask = make_mtp(da)
            if ca is not None:
                c_targets, c_mask = make_mtp(ca)

            lp = self.action_embedder.log_probs(
                policy_embed, discrete_targets=d_targets, continuous_targets=c_targets,
                soft_validate_range=True)

            if is_var_len:
                action_loss_mask = (loss_mask_without_last if pred_len == time - 1 else loss_mask)

            if lp.discrete is not None:
                nld = jnp.where(d_mask[..., None], -lp.discrete, 0.0)
                if is_var_len:
                    m = action_loss_mask[None, :, :num_targets, None] & d_mask[..., None]
                    discrete_action_loss = jnp.sum(jnp.where(m, nld, 0.0), axis=(1, 2, 3)) / jnp.maximum(
                        jnp.sum(m, axis=(1, 2, 3)), 1.0)
                else:
                    discrete_action_loss = jnp.mean(nld, axis=(1, 2, 3))

            if lp.continuous is not None:
                nlc = jnp.where(c_mask[..., None], -lp.continuous, 0.0)
                if is_var_len:
                    m = action_loss_mask[None, :, :num_targets, None] & c_mask[..., None]
                    continuous_action_loss = jnp.sum(jnp.where(m, nlc, 0.0), axis=(1, 2, 3)) / jnp.maximum(
                        jnp.sum(m, axis=(1, 2, 3)), 1.0)
                else:
                    continuous_action_loss = jnp.mean(nlc, axis=(1, 2, 3))

        # ---- latent AR (+sigreg) on trunk hiddens
        latent_ar_loss = latent_ar_sigreg_loss = zero
        if self.latent_ar and time > 1:
            layer_hiddens = interm.layer_hiddens
            if isinstance(self.latent_ar_layer, tuple):
                src_layer, tgt_layer = self.latent_ar_layer
            else:
                src_layer = tgt_layer = self.latent_ar_layer
            num_space = self.num_spatial_tokens * self.num_video_views
            src_h = layer_hiddens[src_layer][:, :, 1:1 + num_space]
            tgt_h = layer_hiddens[tgt_layer][:, :, 1:1 + num_space]

            cond = None
            if self.latent_ar_action_conditioned:
                nat = next_action_tokens
                if nat is None:
                    nat = jnp.zeros((b, time, self.dim))
                if nat.shape[1] == time - 1:
                    nat = jnp.pad(nat, ((0, 0), (0, 1), (0, 0)))
                cond = jnp.broadcast_to(nat[:, :, None, :], (*src_h.shape[:-1], self.dim))

            latent_ar_loss, latent_ar_sigreg_loss, _ = self.latent_ar_module(
                src_h, target=None if src_layer == tgt_layer else tgt_h,
                mask=loss_mask, cond=cond)

        # ---- SSL losses (reference `dreamer4.py:7684-7706`)
        lapo_action_loss = lapo_fdm_loss = lapo_raw_fdm_loss = zero
        if self.ssl_lapo and time > 1:
            lapo_action_loss, lapo_fdm_loss, lapo_raw_fdm_loss = self.ssl_lapo_module(
                aux['space_out'],
                discrete_actions=discrete_actions,
                continuous_actions=continuous_actions,
                raw_latents=latents0)

        tem_loss = zero
        if self.ssl_tem:
            nat = next_action_tokens
            if nat is None:
                nat = jnp.zeros((b, time, self.dim))
            tem_loss = self.ssl_tem_module(nat, latents0)

        # ---- normalization
        if self.use_loss_normalization:
            flow_loss = self.flow_loss_normalizer(flow_loss, update_ema=update_loss_ema)
            shortcut_loss = self.shortcut_loss_normalizer(shortcut_loss, update_ema=update_loss_ema)
            if rewards is not None:
                reward_loss = self.reward_loss_normalizer(reward_loss, update_ema=update_loss_ema)
            if terminals is not None and self.predict_terminals:
                terminal_loss = self.terminal_loss_normalizer(terminal_loss, update_ema=update_loss_ema)
            if discrete_actions is not None:
                discrete_action_loss = self.discrete_actions_loss_normalizer(
                    discrete_action_loss, update_ema=update_loss_ema)
            if continuous_actions is not None:
                continuous_action_loss = self.continuous_actions_loss_normalizer(
                    continuous_action_loss, update_ema=update_loss_ema)

        total_loss = (
            flow_loss * self.latent_flow_loss_weight
            + shortcut_loss * self.shortcut_loss_weight
            + jnp.sum(reward_loss * self.reward_loss_weight)
            + terminal_loss * self.terminal_loss_weight
            + jnp.sum(discrete_action_loss * self.discrete_action_loss_weight)
            + jnp.sum(continuous_action_loss * self.continuous_action_loss_weight)
            + state_pred_loss * self.state_pred_loss_weight
            + agent_state_pred_loss * self.agent_state_pred_loss_weight
            + latent_ar_loss * self.latent_ar_loss_weight
            + latent_ar_sigreg_loss * self.latent_ar_sigreg_loss_weight
            + lapo_action_loss * self.lapo_action_loss_weight
            + lapo_fdm_loss * self.lapo_fdm_loss_weight
            + lapo_raw_fdm_loss * self.lapo_raw_latent_fdm_loss_weight
            + tem_loss * self.tem_loss_weight
            + h_net_loss * self.h_net_loss_weight
        )

        if not return_intermediates:
            return total_loss

        losses = WorldModelLosses(
            flow=flow_loss,
            shortcut=shortcut_loss,
            rewards=reward_loss,
            terminals=terminal_loss,
            discrete_actions=discrete_action_loss,
            continuous_actions=continuous_action_loss,
            state_pred=state_pred_loss,
            agent_state_pred=agent_state_pred_loss,
            latent_ar=latent_ar_loss,
            latent_ar_sigreg=latent_ar_sigreg_loss,
            lapo_action=lapo_action_loss,
            lapo_fdm=lapo_fdm_loss,
            lapo_raw_latent_fdm=lapo_raw_fdm_loss,
            tem=tem_loss,
            h_net=h_net_loss,
        )
        out = (total_loss, losses, embeds)
        if return_layer_hiddens:
            out = out + (interm.layer_hiddens,)
        return out
