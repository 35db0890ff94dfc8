"""Self-supervised auxiliary modules: LAPO, TEM, ActorSPR.

TPU-native equivalents of the reference SSL stack:
- LAPO (`dreamer4.py:2379-2494`, Schmidt arXiv 2312.10812): inverse dynamics
  (state, next-state) -> SEM-bottlenecked latent action, with action
  prediction and forward-dynamics losses in projected and raw-latent space.
- TEM (`dreamer4.py:2498-2733`, Whittington arXiv 2112.04035): GRU path
  integration over action embeds -> structural codes; 2-layer implicit
  attention memory (shifted K/V with dummy first tokens, talking heads)
  decoding raw latents.
- ActorSPR (`dreamer4.py:2216-2375`): K-step MLP dynamics rollout of the
  policy embedding, smooth-L1 vs future policy embeds + frozen-unembed KL +
  sigreg.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import dists
from ..ops.attention import naive_attend
from ..ops.losses import sigreg
from ..ops.masks import causal_mask
from ..ops.utils import l2norm, masked_mean, smooth_l1_loss
from .mlp import MLP
from .norms import RMSNorm
from .sem import SEM


class LAPO(nn.Module):
    dim_embed: int
    dim_latent_action: int
    num_discrete_actions: tuple[int, ...] = ()
    num_continuous_actions: int = 0
    dim_raw_latent: int | None = None
    num_raw_latent_tokens: int | None = None
    sem_dim_simplex: int = 4
    sem_temperature: float = 0.1
    expansion_factor: float = 4.0
    pred_actions: bool = True
    use_fdm: bool = True

    @property
    def has_raw_latent_fdm(self) -> bool:
        return (self.use_fdm and self.dim_raw_latent is not None
                and self.num_raw_latent_tokens is not None)

    @nn.compact
    def __call__(self, space_tokens, discrete_actions=None, continuous_actions=None,
                 raw_latents=None):
        """space_tokens: (b, t, s, d). Returns (action_loss, fdm_loss,
        raw_latent_fdm_loss)."""
        zero = jnp.zeros(())
        dim_hidden = int(self.dim_embed * self.expansion_factor)

        state_embed = jnp.mean(space_tokens, axis=2)  # (b, t, d)
        state = RMSNorm(name='state_norm')(state_embed[:, :-1])
        next_state = RMSNorm(name='state_norm_next')(state_embed[:, 1:])

        # inverse dynamics model -> SEM-bottlenecked latent action
        idm_in = jnp.concatenate([state, next_state], axis=-1)
        latent_action = MLP(hidden_dims=(dim_hidden,), dim_out=self.dim_latent_action,
                            name='to_latent_action')(idm_in)
        latent_action = SEM(self.dim_latent_action, temperature=self.sem_temperature,
                            dim_simplex=self.sem_dim_simplex, name='sem')(latent_action)

        # action prediction loss (per-type categorical CE + continuous MSE)
        action_loss = zero
        if self.pred_actions:
            seq = latent_action.shape[1]
            n_losses = 0
            for i, n in enumerate(self.num_discrete_actions):
                if n <= 0 or discrete_actions is None:
                    continue
                logits = nn.Dense(n, name=f'action_readout_d{i}')(latent_action)
                tgt = discrete_actions[:, :seq, i]
                logp = jax.nn.log_softmax(logits, axis=-1)
                action_loss = action_loss - jnp.mean(
                    jnp.take_along_axis(logp, tgt[..., None], axis=-1))
                n_losses += 1
            if self.num_continuous_actions > 0 and continuous_actions is not None:
                pred_c = nn.Dense(self.num_continuous_actions, name='action_readout_c')(latent_action)
                action_loss = action_loss + jnp.mean(
                    jnp.square(pred_c - continuous_actions[:, :latent_action.shape[1]]))
                n_losses += 1
            if n_losses:
                action_loss = action_loss / n_losses

        # forward dynamics — projected space
        fdm_loss = zero
        if self.use_fdm:
            fdm_in = jnp.concatenate([state, latent_action], axis=-1)
            pred_next = MLP(hidden_dims=(dim_hidden,), dim_out=self.dim_embed,
                            name='to_pred_next_state')(fdm_in)
            fdm_loss = jnp.mean(jnp.square(
                l2norm(pred_next) - jax.lax.stop_gradient(l2norm(next_state))))

        # forward dynamics — raw latent space
        raw_fdm_loss = zero
        if self.has_raw_latent_fdm and raw_latents is not None:
            b, t = raw_latents.shape[:2]
            raw_flat = raw_latents.reshape(b, t, -1)
            target_raw = raw_flat[:, 1:]
            fdm_in = jnp.concatenate([state, latent_action], axis=-1)
            pred_raw = MLP(hidden_dims=(dim_hidden, dim_hidden),
                           dim_out=self.dim_raw_latent * self.num_raw_latent_tokens,
                           name='to_pred_raw_latent')(fdm_in)
            raw_fdm_loss = jnp.mean(jnp.square(pred_raw - jax.lax.stop_gradient(target_raw)))

        return action_loss, fdm_loss, raw_fdm_loss


class TEM(nn.Module):
    dim_action_embed: int
    dim_raw_latent: int
    num_raw_latent_tokens: int
    dim_structure: int | None = None
    heads: int = 8
    dim_head: int = 64
    talking_heads: bool = True
    first_state_as_init_hidden: bool = True
    learn_relative_actions: bool = False

    @nn.compact
    def __call__(self, next_action_tokens, raw_latents, return_preds: bool = False):
        """next_action_tokens: (b, t', d) or (b, t', 1, d);
        raw_latents: (b, t, n, dl)."""
        dim_structure = self.dim_structure or self.dim_action_embed
        b, t = raw_latents.shape[:2]

        pooled = jnp.mean(raw_latents.reshape(b, t, -1, raw_latents.shape[-1]), axis=2)
        encoded_sensory = MLP(hidden_dims=(dim_structure,), dim_out=dim_structure,
                              name='sensory_encoder')(pooled)

        if self.first_state_as_init_hidden:
            init_hidden = MLP(hidden_dims=(dim_structure,), dim_out=dim_structure,
                              name='to_init_hiddens')(encoded_sensory[:, 0])
        else:
            init_hidden = jnp.broadcast_to(
                self.param('init_hiddens', nn.initializers.normal(1e-2), (dim_structure,)),
                (b, dim_structure))

        actions = next_action_tokens
        if actions.ndim == 4:
            actions = actions[:, :, 0]
        actions = actions[:, : t - 1]

        if self.learn_relative_actions and actions.shape[1] > 0:
            past = jnp.pad(actions[:, :-1], ((0, 0), (1, 0), (0, 0)))
            actions = MLP(hidden_dims=(self.dim_action_embed * 2,),
                          dim_out=self.dim_action_embed,
                          name='learned_relative_encode')(
                jnp.concatenate([actions, past], axis=-1))

        if actions.shape[1] > 0:
            rnn = nn.RNN(nn.GRUCell(dim_structure), return_carry=True, name='gru')
            _, gru_out = rnn(actions, initial_carry=init_hidden)
            structural = jnp.concatenate([init_hidden[:, None], gru_out], axis=1)
        else:
            structural = init_hidden[:, None]

        structural = RMSNorm(name='structural_norm')(structural)
        encoded_sensory = RMSNorm(name='sensory_norm')(encoded_sensory)

        inner = self.heads * self.dim_head
        split = lambda x: x.reshape(b, -1, self.heads, self.dim_head).swapaxes(1, 2)

        q = split(nn.Dense(inner, use_bias=False, name='to_q')(structural))
        k1 = nn.Dense(inner, use_bias=False, name='to_k1')(structural)
        v1 = nn.Dense(inner, use_bias=False, name='to_v1')(encoded_sensory)
        k2 = nn.Dense(inner, use_bias=False, name='to_k2')(encoded_sensory)
        v2 = nn.Dense(inner, use_bias=False, name='to_v2')(encoded_sensory)

        # prepend dummies and shift to mask the diagonal
        def shift(x, name):
            dummy = self.param(f'dummy_{name}', nn.initializers.normal(1e-2), (inner,))
            dummy = jnp.broadcast_to(dummy, (b, 1, inner))
            return jnp.concatenate([dummy, x[:, :-1]], axis=1)

        k1, v1 = split(shift(k1, 'k1')), split(shift(v1, 'v1'))
        k2, v2 = split(shift(k2, 'k2')), split(shift(v2, 'v2'))

        mask = causal_mask(q.shape[2], k1.shape[2])
        out = naive_attend(q, k1, v1, mask=mask)

        if self.talking_heads:
            mix = self.param('talking_heads',
                             lambda rng, shape: jnp.eye(self.heads), (self.heads, self.heads))
            out = jnp.einsum('bhtd,hg->bgtd', out, mix)
        out = jax.nn.silu(out)

        out = naive_attend(out, k2, v2, mask=mask)

        gates = jax.nn.sigmoid(nn.Dense(self.heads, use_bias=False, name='to_gates')(structural))
        out = out * gates.swapaxes(1, 2)[..., None]

        out = out.swapaxes(1, 2).reshape(b, -1, inner)
        out = nn.Dense(dim_structure, use_bias=False, name='to_out')(out)

        pred_raw = MLP(hidden_dims=(dim_structure,),
                       dim_out=self.dim_raw_latent * self.num_raw_latent_tokens,
                       name='sensory_decoder')(out)

        target_raw = raw_latents.reshape(b, t, -1)
        loss = jnp.zeros(())
        if t > 1:
            loss = jnp.mean(jnp.square(pred_raw[:, 1:] - jax.lax.stop_gradient(target_raw[:, 1:])))

        if not return_preds:
            return loss
        pred_latents = pred_raw.reshape(b, t, self.num_raw_latent_tokens, self.dim_raw_latent)
        return loss, pred_latents


class ActorSPR(nn.Module):
    """Self-predictive rollout on the policy embedding. The action-embedder
    interaction (embed + frozen unembed/KL) is injected as callables so this
    module composes with the world model's embedder without parameter
    duplication."""

    dim: int                       # policy embed dim (dim * 4 in the world model)
    num_rollouts: int = 1
    spr_loss_weight: float = 1.0
    kl_loss_weight: float = 1.0
    sigreg_loss_weight: float = 0.0
    dynamics_num_layers: int = 3
    dim_action_embed: int | None = None

    @nn.compact
    def __call__(self, policy_embed, action_embeds, unembed_fn=None, kl_fn=None, mask=None):
        """policy_embed: (b, t, dim); action_embeds: (b, t, da).
        unembed_fn(embeds) -> (discrete_logits, cont_params) with frozen
        params; kl_fn(src, tgt) -> (d_kl, c_kl)."""
        zero = jnp.zeros(())
        b, seq = policy_embed.shape[:2]
        R = self.num_rollouts
        assert seq > R

        policy_embed = RMSNorm(name='norm')(policy_embed)
        if mask is None:
            mask = jnp.ones((b, seq), bool)

        da = action_embeds.shape[-1]
        dyn = MLP(hidden_dims=(self.dim,) * self.dynamics_num_layers, dim_out=self.dim,
                  use_rmsnorm=True, name='dynamics_mlp')

        # K-step rollout
        preds = []
        pred = policy_embed[:, :-1]
        for step in range(R):
            # action taken at position i+step, padded right
            a = action_embeds[:, step:]
            a = jnp.pad(a, ((0, 0), (0, step + (seq - 1) - a.shape[1] + 1), (0, 0)))[:, : seq - 1]
            pred = pred + dyn(jnp.concatenate([pred, jax.lax.stop_gradient(a)], axis=-1))
            preds.append(pred)
        preds = jnp.stack(preds)  # (R, b, seq-1, dim)

        # targets: policy embed at i+1+step, padded
        targets = []
        target_masks = []
        for step in range(R):
            tgt = policy_embed[:, 1 + step:]
            m = mask[:, 1 + step:]
            pad = (seq - 1) - tgt.shape[1]
            tgt = jnp.pad(tgt, ((0, 0), (0, pad), (0, 0)))
            m = jnp.pad(m, ((0, 0), (0, pad)))
            targets.append(tgt)
            target_masks.append(m)
        targets = jnp.stack(targets)
        target_masks = jnp.stack(target_masks)

        weights = jnp.full((R,), 1.0 / R)

        spr_loss = zero
        if self.spr_loss_weight > 0.0:
            l1 = smooth_l1_loss(preds, jax.lax.stop_gradient(targets))
            l1 = l1 * weights[:, None, None, None]
            spr_loss = jnp.sum(masked_mean(l1, target_masks[..., None], axis=(1, 2, 3)))

        kl_loss = zero
        if self.kl_loss_weight > 0.0 and unembed_fn is not None and kl_fn is not None:
            tgt_un = jax.tree.map(jax.lax.stop_gradient,
                                  unembed_fn(jax.lax.stop_gradient(targets)))
            pred_un = unembed_fn(preds)
            d_kl, c_kl = kl_fn(tgt_un, pred_un)
            step_kl = 0.0
            if d_kl is not None:
                step_kl = step_kl + d_kl
            if c_kl is not None:
                step_kl = step_kl + c_kl
            step_kl = step_kl * weights[:, None, None]
            kl_loss = jnp.sum(masked_mean(step_kl, target_masks, axis=(1, 2)))

        sigreg_loss = zero
        if self.sigreg_loss_weight > 0.0:
            sigreg_loss = sigreg(self.make_rng('sample'), policy_embed[None],
                                 mask=mask[None], num_slices=256)

        total = (spr_loss * self.spr_loss_weight
                 + kl_loss * self.kl_loss_weight
                 + sigreg_loss * self.sigreg_loss_weight)
        return total, (spr_loss, kl_loss, sigreg_loss)
