"""Latent autoregressive loss with attached sigreg (reference
`LatentAutoregressiveLoss`, `dreamer4.py:769-895`), reused by both the
tokenizer and the dynamics model: an MLP predicts the next-timestep latent
(optionally residual / action-conditioned / cross-layer), with smooth-L1 or
cosine loss plus LeJEPA signature regularization on the targets."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.losses import sigreg
from ..ops.utils import l2norm, masked_mean, smooth_l1_loss
from .mlp import MLP
from .norms import RMSNorm


class LatentAutoregressiveLoss(nn.Module):
    dim: int
    dim_in: int | None = None
    use_rmsnorm: bool = False
    loss_type: str = 'smooth_l1'  # 'smooth_l1' | 'cosine'
    detach_target: bool = True
    predict_residual: bool = False
    mlp_activation: str = 'silu'
    sigreg_num_slices: int = 256
    sigreg_num_subspaces: int | None = None

    @nn.compact
    def __call__(self, x, target=None, mask=None, cond=None):
        """x: (b, t, ..., d_in). Returns (loss, sigreg_loss, pred)."""
        dim_in = self.dim_in if self.dim_in is not None else self.dim
        is_same_layer = target is None
        if target is None:
            target = x

        latents_input = x[:, :-1]
        target_output = target[:, 1:]

        pred_input = latents_input
        if cond is not None:
            pred_input = jnp.concatenate([pred_input, cond[:, :-1]], axis=-1)

        h = pred_input
        if dim_in != self.dim or cond is not None:
            h = nn.Dense(self.dim, name='project_in')(h)
        if self.use_rmsnorm:
            h = RMSNorm(name='norm')(h)
        pred = MLP(hidden_dims=(self.dim * 4,), dim_out=self.dim, activation=self.mlp_activation,
                   use_rmsnorm=True, name='net')(h)

        if self.predict_residual:
            pred = pred + latents_input

        target_loss = jax.lax.stop_gradient(target_output) if self.detach_target else target_output

        if self.loss_type == 'smooth_l1':
            losses = smooth_l1_loss(pred, target_loss)
        elif self.loss_type == 'cosine':
            losses = jnp.square(l2norm(pred) - l2norm(target_loss))
        else:
            raise ValueError(self.loss_type)

        loss_mask = mask[:, 1:] if mask is not None else None
        if loss_mask is not None:
            bmask = loss_mask.reshape(*loss_mask.shape, *(1,) * (losses.ndim - loss_mask.ndim))
            loss = masked_mean(losses, bmask)
        else:
            loss = jnp.mean(losses)

        # sigreg on the (sub)space of targets (Sub-JEPA when num_subspaces > 1)
        if is_same_layer:
            sig_input, sig_mask = target_output, loss_mask
        else:
            sig_input = jnp.concatenate([x[:, :-1], target_output], axis=0)
            sig_mask = jnp.concatenate([loss_mask, loss_mask], axis=0) if loss_mask is not None else None

        key = self.make_rng('sample')
        if self.sigreg_num_subspaces is not None and self.sigreg_num_subspaces > 1:
            k = self.sigreg_num_subspaces
            d = sig_input.shape[-1]
            assert d % k == 0
            projs = self.param(
                'subspace_projs',
                lambda rng: jnp.stack([
                    jax.nn.initializers.orthogonal()(r, (d // k, d)) for r in jax.random.split(rng, k)
                ]),
            )
            projs = jax.lax.stop_gradient(projs)
            sig_input = jnp.einsum('...d,ksd->k...s', sig_input, projs)
            if sig_mask is not None:
                sig_mask = jnp.broadcast_to(sig_mask[None], (k, *sig_mask.shape))
        else:
            sig_input = sig_input[None]
            if sig_mask is not None:
                sig_mask = sig_mask[None]

        # broadcast mask over any token dims between (b, t) and features
        if sig_mask is not None:
            extra = sig_input.ndim - 1 - sig_mask.ndim
            sig_mask = sig_mask.reshape(*sig_mask.shape, *(1,) * extra)
            sig_mask = jnp.broadcast_to(sig_mask, sig_input.shape[:-1])

        sig_loss = sigreg(key, sig_input, num_slices=self.sigreg_num_slices, mask=sig_mask)

        return loss, sig_loss, pred
