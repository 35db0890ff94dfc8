"""Self-flow distillation (reference `SelfFlow`, `dreamer4.py:4605-4656`;
Chefer et al. arXiv 2603.06507): a shallow student layer hidden + FF head
predicts the EMA teacher's deep-layer hidden on an identically-seeded batch.

The reference reaches same-noise replays through `with_seed` RNG state
save/restore (`dreamer4.py:430-466`); here both forwards simply receive the
same 'sample' PRNG key — exact by construction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.attention import FeedForward
from ..ops.utils import cosine_distance, lens_to_mask


class SelfFlowHead(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, student_hidden, teacher_hidden, mask=None):
        pred = FeedForward(dim=self.dim, name='student_predict_head')(student_hidden)
        target = jax.lax.stop_gradient(teacher_hidden)
        if mask is not None:
            extra = pred.ndim - 1 - mask.ndim
            mask = mask.reshape(*mask.shape, *(1,) * extra)
        return cosine_distance(pred, target, mask=mask)


def self_flow_loss(
    model,
    head: SelfFlowHead,
    head_variables,
    variables,
    ema_variables,
    batch_kwargs: dict,
    key: jax.Array,
    student_layer: int = -3,
    teacher_layer: int = -1,
    lens: jax.Array | None = None,
):
    """Run student (trainable params) and EMA teacher on the SAME key and
    match hidden states across depths. `batch_kwargs` are forward kwargs
    (latents, rewards, actions, ...)."""
    *_, student_hiddens = model.apply(
        variables, rngs={'sample': key}, return_intermediates=True,
        return_layer_hiddens=True, **batch_kwargs)
    *_, teacher_hiddens = model.apply(
        ema_variables, rngs={'sample': key}, return_intermediates=True,
        return_layer_hiddens=True, **batch_kwargs)

    student_hidden = student_hiddens[student_layer]
    teacher_hidden = jax.lax.stop_gradient(teacher_hiddens[teacher_layer])

    mask = None
    if lens is not None:
        mask = lens_to_mask(lens, student_hidden.shape[1])[:, :, None]

    return head.apply(head_variables, student_hidden, teacher_hidden, mask=mask)
