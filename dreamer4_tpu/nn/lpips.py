"""Perceptual (LPIPS-style) loss.

Equivalent of the reference `LPIPSLoss` (`dreamer4.py:671-724`): VGG16
features of prediction vs target, MSE in feature space, with random frame
subsampling for video and time-length masking.

This environment has no torchvision / no egress, so pretrained VGG16 weights
cannot be downloaded. The feature network is a faithful VGG16 trunk in flax:
- load real weights via `load_vgg16_npz(path)` when a local file exists
  (keys: features.{i}.weight/bias in torchvision layout), or
- fall back to fixed random features (seeded init) — random VGG features are
  a known functioning perceptual-loss variant and keep the training recipe
  intact until real weights are provided.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 conv plan: (out_channels, num_convs) per stage
VGG16_PLAN = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class VGG16Features(nn.Module):
    """Conv trunk of VGG16; returns feature maps after each stage."""

    @nn.compact
    def __call__(self, x):  # (b, h, w, 3) in [0, 1]
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        x = (x - mean) / std

        feats = []
        layer_idx = 0
        for out_ch, n_convs in VGG16_PLAN:
            for _ in range(n_convs):
                x = nn.Conv(out_ch, (3, 3), padding='SAME', name=f'conv_{layer_idx}')(x)
                x = jax.nn.relu(x)
                layer_idx += 1
            feats.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


def load_vgg16_npz(path: str) -> dict:
    """Convert a torchvision-layout npz (features.N.weight OIHW) into flax
    params for VGG16Features."""
    raw = np.load(path)
    params = {}
    conv_idx = 0
    torch_layer = 0
    for out_ch, n_convs in VGG16_PLAN:
        for _ in range(n_convs):
            w = raw[f'features.{torch_layer}.weight']  # (O, I, kh, kw)
            b = raw[f'features.{torch_layer}.bias']
            params[f'conv_{conv_idx}'] = {
                'kernel': jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # HWIO
                'bias': jnp.asarray(b),
            }
            conv_idx += 1
            torch_layer += 2  # conv + relu
        torch_layer += 1      # maxpool
    return {'params': params}


def init_lpips(key: jax.Array | None = None, weights_path: str | None = None):
    """-> (module, variables). Random features unless a weights file exists."""
    module = VGG16Features()
    if weights_path is not None:
        return module, load_vgg16_npz(weights_path)
    key = key if key is not None else jax.random.PRNGKey(0)
    variables = module.init(key, jnp.zeros((1, 32, 32, 3)))
    return module, variables


def lpips_loss(
    module: VGG16Features,
    variables,
    pred: jax.Array,          # (b, t, h, w, c) internal video layout
    target: jax.Array,
    key: jax.Array,
    sampled_frames: int = 1,
    time_lens: jax.Array | None = None,
    feature_layers: Sequence[int] = (1, 2, 3),
) -> jax.Array:
    """MSE between VGG features of randomly sampled frames (reference
    `dreamer4.py:687-724`). Frames past `time_lens` are excluded by resampling
    valid indices."""
    b, t = pred.shape[:2]
    num = b * sampled_frames

    k_b, k_t = jax.random.split(key)
    batch_idx = jax.random.randint(k_b, (num,), 0, b)
    if time_lens is not None:
        lens = jnp.maximum(time_lens[batch_idx], 1)
        u = jax.random.uniform(k_t, (num,))
        time_idx = jnp.minimum((u * lens).astype(jnp.int32), lens - 1)
    else:
        time_idx = jax.random.randint(k_t, (num,), 0, t)

    pred_frames = pred[batch_idx, time_idx]
    target_frames = target[batch_idx, time_idx]

    if pred_frames.shape[-1] == 1:
        pred_frames = jnp.repeat(pred_frames, 3, axis=-1)
        target_frames = jnp.repeat(target_frames, 3, axis=-1)

    pred_feats = module.apply(variables, pred_frames)
    target_feats = module.apply(variables, jax.lax.stop_gradient(target_frames))

    loss = 0.0
    for i in feature_layers:
        loss = loss + jnp.mean(jnp.square(pred_feats[i] - target_feats[i]))
    return loss / len(feature_layers)
