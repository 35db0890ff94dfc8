"""VideoTokenizer — causal spacetime-transformer autoencoder.

TPU-native re-design of the reference `VideoTokenizer` + `VideoDecoderNetwork`
(`dreamer4.py:3489-4603`):

- Encoder: patchify -> per-frame MAE masking (per-(b,t) mask prob ~ U(lo,hi))
  -> learned latent query tokens appended on the right -> axial space/time
  transformer (special tokens = latents) -> linear bottleneck -> tanh.
- Decoder: spatial tokens synthesized from a 2-D coordinate MLP positional
  embedding (+ noised image tokens for flow steps), packed with latents as
  special tokens where latents attend only to themselves, then unpatchified.
- Flow decoding (RAC-style): the decoder is trained as an x-prediction flow
  model over `decoder_flow_steps`; inference runs Euler steps
  flow = (pred - x_t) / (1 - t).
- Streaming encode via the transformer's static-shape KV cache.

Internal video layout is channels-last (b, t, h, w, c) — the natural layout
for TPU convolutions/reshapes; the public API accepts the reference's
(b, c, t, h, w).

Stochasticity (MAE masks, flow noise, step indices) is drawn from the linen
'sample' rng collection — pass `rngs={'sample': key}` to `.apply`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.latent_ar import LatentAutoregressiveLoss
from ..nn.loss_normalizer import LossNormalizer
from ..nn.mlp import MLP
from ..ops.losses import decorrelation_loss, sigreg
from ..ops.utils import lens_to_mask, masked_mean, orthogonal_loss
from .transformer import AxialSpaceTimeTransformer, TransformerCache


class TokenizerLosses(NamedTuple):
    recon: jax.Array
    lpips: jax.Array
    time_decorr: jax.Array
    space_decorr: jax.Array
    latent_ortho: jax.Array
    latent_ar: jax.Array
    latent_ar_sigreg: jax.Array
    latent_sigreg: jax.Array


class TokenizerIntermediates(NamedTuple):
    losses: TokenizerLosses
    recon: jax.Array
    latents: jax.Array


def video_to_internal(video: jax.Array) -> jax.Array:
    """(b, c, t, h, w) [reference layout] -> (b, t, h, w, c)."""
    return jnp.transpose(video, (0, 2, 3, 4, 1))


def video_to_external(video: jax.Array) -> jax.Array:
    return jnp.transpose(video, (0, 4, 1, 2, 3))


class VideoDecoderNetwork(nn.Module):
    """Reference `VideoDecoderNetwork` (`dreamer4.py:3489-3682`)."""

    dim: int
    dim_latent: int
    patch_size: int
    channels: int
    depth: int
    time_block_every: int
    attn_dim_head: int
    attn_heads: int
    query_heads: int | None = None
    num_latent_tokens: int = 64
    full_spatial_attn: bool = False
    pos_mlp_depth: int = 2
    pos_mlp_activation: str = 'silu'
    dtype: jnp.dtype | None = None

    def setup(self):
        self.to_pos_emb = MLP(
            hidden_dims=(self.dim * 2,) * self.pos_mlp_depth,
            dim_out=self.dim,
            activation=self.pos_mlp_activation,
            name='to_pos_emb',
        )
        self.transformer = AxialSpaceTimeTransformer(
            dim=self.dim,
            depth=self.depth,
            attn_dim_head=self.attn_dim_head,
            attn_heads=self.attn_heads,
            query_heads=self.query_heads,
            time_block_every=self.time_block_every,
            num_special_tokens=self.num_latent_tokens,
            special_attend_only_itself=True,  # latents attend only to themselves
            full_spatial_attn=self.full_spatial_attn,
            dtype=self.dtype,
            name='transformer',
        )
        self.tokens_to_patch = nn.Dense(self.channels * self.patch_size ** 2, name='tokens_to_patch')

    def __call__(
        self,
        latent_tokens: jax.Array,               # (b, t, n, dim)
        height: int,
        width: int,
        noised_image_tokens: jax.Array | None = None,  # (b, t, hp, wp, dim)
    ) -> jax.Array:                              # (b, t, h, w, c)
        b, t = latent_tokens.shape[:2]
        p = self.patch_size
        hp, wp = height // p, width // p

        # 2-D coordinate MLP positional embedding (reference `dreamer4.py:3617-3625`)
        ys = jnp.linspace(-1.0, 1.0, hp)
        xs = jnp.linspace(-1.0, 1.0, wp)
        coords = jnp.stack(jnp.meshgrid(ys, xs, indexing='ij'), axis=-1)  # (hp, wp, 2)
        pos_emb = self.to_pos_emb(coords)
        spatial = jnp.broadcast_to(pos_emb[None, None], (b, t, hp, wp, self.dim))

        if noised_image_tokens is not None:
            spatial = spatial + noised_image_tokens

        spatial = spatial.reshape(b, t, hp * wp, self.dim)
        tokens = jnp.concatenate([spatial, latent_tokens], axis=2)

        tokens, _ = self.transformer(tokens)

        spatial = tokens[:, :, : hp * wp]
        patches = self.tokens_to_patch(spatial)  # (b, t, hp*wp, p*p*c)
        patches = patches.reshape(b, t, hp, wp, p, p, self.channels)
        video = jnp.transpose(patches, (0, 1, 2, 4, 3, 5, 6)).reshape(b, t, hp * p, wp * p, self.channels)
        return video


class VideoTokenizer(nn.Module):
    """See module docstring. Reference: `dreamer4.py:3684-4603`."""

    dim: int
    dim_latent: int
    patch_size: int
    image_height: int
    image_width: int
    channels: int = 3
    num_latent_tokens: int = 64
    encoder_depth: int = 4
    decoder_depth: int = 4
    time_block_every: int = 4
    attn_dim_head: int = 64
    attn_heads: int = 8
    query_heads: int | None = None
    attn_softclamp_value: float = 50.0
    encoder_full_spatial_attn: bool = False
    decoder_full_spatial_attn: bool = False
    per_image_patch_mask_prob: tuple[float, float] = (0.0, 0.9)
    decoder_flow_steps: int = 1
    decoder_v_space_loss: bool = True
    pos_mlp_depth: int = 2
    # loss config
    use_loss_normalization: bool = True
    lpips_loss_weight: float = 0.2
    encoder_add_decorr_aux_loss: bool = False
    time_decorr_loss_weight: float = 4e-3
    space_decorr_loss_weight: float = 4e-3
    decorr_sample_frac: float = 0.25
    latent_ortho_loss_weight: float = 0.0
    latent_ar_loss_weight: float = 0.0
    latent_ar_sigreg_loss_weight: float = 0.05
    latent_ar_num_slices: int = 256
    latent_sigreg_loss_weight: float = 0.0
    latent_sigreg_num_slices: int = 256
    dtype: jnp.dtype | None = None

    @property
    def has_flow(self) -> bool:
        return self.decoder_flow_steps > 0

    @property
    def latent_shape(self) -> tuple[int, int]:
        return (self.num_latent_tokens, self.dim_latent)

    def setup(self):
        p = self.patch_size
        assert self.image_height % p == 0 and self.image_width % p == 0

        self.patch_proj = nn.Dense(self.dim, name='patch_proj')
        self.patch_norm = nn.LayerNorm(use_bias=False, name='patch_norm')

        self.mask_token = self.param('mask_token', nn.initializers.normal(1e-2), (self.dim,))
        self.latent_tokens = self.param('latent_tokens', nn.initializers.normal(1e-2), (self.num_latent_tokens, self.dim))

        self.encoder_transformer = AxialSpaceTimeTransformer(
            dim=self.dim,
            depth=self.encoder_depth,
            attn_dim_head=self.attn_dim_head,
            attn_heads=self.attn_heads,
            query_heads=self.query_heads,
            attn_softclamp_value=self.attn_softclamp_value,
            time_block_every=self.time_block_every,
            num_special_tokens=self.num_latent_tokens,
            full_spatial_attn=self.encoder_full_spatial_attn,
            final_norm=True,
            dtype=self.dtype,
            name='encoder_transformer',
        )

        self.encoded_to_latents = nn.Dense(self.dim_latent, use_bias=False, name='encoded_to_latents')
        self.latents_to_decoder = nn.Dense(self.dim, use_bias=False, name='latents_to_decoder')

        self.decoder = VideoDecoderNetwork(
            dim=self.dim,
            dim_latent=self.dim_latent,
            patch_size=p,
            channels=self.channels,
            depth=self.decoder_depth,
            time_block_every=self.time_block_every,
            attn_dim_head=self.attn_dim_head,
            attn_heads=self.attn_heads,
            query_heads=self.query_heads,
            num_latent_tokens=self.num_latent_tokens,
            full_spatial_attn=self.decoder_full_spatial_attn,
            pos_mlp_depth=self.pos_mlp_depth,
            dtype=self.dtype,
            name='decoder',
        )

        if self.has_flow:
            self.time_embed = nn.Embed(self.decoder_flow_steps, self.dim, name='time_embed')
            self.noised_patch_proj = nn.Dense(self.dim, name='noised_patch_proj')
            self.noised_patch_norm = nn.LayerNorm(use_bias=False, name='noised_patch_norm')

        if self.latent_ar_loss_weight > 0.0:
            self.latent_ar = LatentAutoregressiveLoss(
                dim=self.dim,
                use_rmsnorm=True,
                predict_residual=True,
                sigreg_num_slices=self.latent_ar_num_slices,
                name='latent_ar',
            )

        if self.use_loss_normalization:
            self.recon_loss_normalizer = LossNormalizer(name='recon_loss_normalizer')
            if self.encoder_add_decorr_aux_loss:
                self.time_decorr_loss_normalizer = LossNormalizer(name='time_decorr_loss_normalizer')
                self.space_decorr_loss_normalizer = LossNormalizer(name='space_decorr_loss_normalizer')
            if self.latent_ar_loss_weight > 0.0:
                self.latent_ar_loss_normalizer = LossNormalizer(name='latent_ar_loss_normalizer')
            if self.latent_ortho_loss_weight > 0.0:
                self.latent_ortho_loss_normalizer = LossNormalizer(name='latent_ortho_loss_normalizer')
            if self.latent_sigreg_loss_weight > 0.0:
                self.latent_sigreg_loss_normalizer = LossNormalizer(name='latent_sigreg_loss_normalizer')

    # ------------------------------------------------------------- helpers

    def _patchify(self, video: jax.Array, noised: bool = False) -> jax.Array:
        """(b, t, h, w, c) -> (b, t, hp, wp, dim)."""
        b, t, h, w, c = video.shape
        p = self.patch_size
        x = video.reshape(b, t, h // p, p, w // p, p, c)
        x = jnp.transpose(x, (0, 1, 2, 4, 3, 5, 6)).reshape(b, t, h // p, w // p, p * p * c)
        if noised:
            return self.noised_patch_norm(self.noised_patch_proj(x))
        return self.patch_norm(self.patch_proj(x))

    # ------------------------------------------------------------- encode

    def encode(
        self,
        video: jax.Array,                     # (b, c, t, h, w) or (b, c, h, w)
        mask_patches: bool = False,
        patch_mask: jax.Array | None = None,
        cache: TransformerCache | None = None,
        max_time: int | None = None,
        return_cache: bool = False,
        return_pre_bottleneck: bool = False,
    ):
        is_image = video.ndim == 4
        if is_image:
            video = video[:, :, None]
        video = video_to_internal(video)

        b, t = video.shape[:2]

        tokens = self._patchify(video)
        hp, wp = tokens.shape[2], tokens.shape[3]

        if mask_patches or patch_mask is not None:
            if patch_mask is None:
                key = self.make_rng('sample')
                k1, k2 = jax.random.split(key)
                lo, hi = self.per_image_patch_mask_prob
                mask_prob = jax.random.uniform(k1, (b, t), minval=lo, maxval=hi)
                patch_mask = jax.random.bernoulli(k2, mask_prob[..., None, None], (b, t, hp, wp))
            tokens = jnp.where(patch_mask[..., None], self.mask_token, tokens)

        tokens = tokens.reshape(b, t, hp * wp, self.dim)

        latents = jnp.broadcast_to(self.latent_tokens[None, None], (b, t, self.num_latent_tokens, self.dim))
        tokens = jnp.concatenate([tokens, latents], axis=2)

        tokens, interm = self.encoder_transformer(
            tokens, cache=cache, max_time=max_time, return_intermediates=True
        )

        latent_hiddens = tokens[:, :, -self.num_latent_tokens:]
        latents = jnp.tanh(self.encoded_to_latents(latent_hiddens))

        if is_image:
            latents = latents[:, 0]

        out = (latents,)
        if return_pre_bottleneck:
            out = out + (latent_hiddens, interm)
        if return_cache:
            out = out + (interm.cache,)
        return out[0] if len(out) == 1 else out

    # -------------------------------------------------------------- decode

    def decode_step(
        self,
        latents: jax.Array,                   # (b, t, n, d_latent)
        noised_video: jax.Array | None = None,  # internal layout (b, t, h, w, c)
        time_indices: jax.Array | None = None,  # (b,)
        height: int | None = None,
        width: int | None = None,
    ) -> jax.Array:
        height = height if height is not None else self.image_height
        width = width if width is not None else self.image_width

        latent_tokens = self.latents_to_decoder(latents)

        if self.has_flow:
            if time_indices is None:
                time_indices = jnp.zeros((latents.shape[0],), jnp.int32)
            emb = self.time_embed(time_indices)
            latent_tokens = latent_tokens + emb[:, None, None, :]

        image_tokens = None
        if noised_video is not None:
            image_tokens = self._patchify(noised_video, noised=True)

        return self.decoder(latent_tokens, height, width, noised_image_tokens=image_tokens)

    def decode(
        self,
        latents: jax.Array,                   # (b, t, n, d_latent)
        height: int | None = None,
        width: int | None = None,
    ) -> jax.Array:                           # (b, c, t, h, w)
        """Euler flow sampling (reference `decode`, `dreamer4.py:4186-4237`)."""
        height = height if height is not None else self.image_height
        width = width if width is not None else self.image_width
        b, t = latents.shape[:2]

        if not self.has_flow:
            recon = self.decode_step(latents, height=height, width=width)
            return video_to_external(recon)

        key = self.make_rng('sample')
        video = jax.random.normal(key, (b, t, height, width, self.channels))

        steps = self.decoder_flow_steps
        delta = 1.0 / steps
        for i in range(steps):
            t_frac = i * delta
            time_indices = jnp.full((b,), i, jnp.int32)
            pred = self.decode_step(latents, noised_video=video, time_indices=time_indices,
                                    height=height, width=width)
            flow = (pred - video) / (1.0 - t_frac)
            video = video + flow * delta

        return video_to_external(video)

    # ------------------------------------------------------------ training

    def __call__(
        self,
        video: jax.Array,                     # (b, c, t, h, w) or (b, c, h, w)
        return_latents: bool = False,
        mask_patches: bool | None = None,
        patch_mask: jax.Array | None = None,
        time_lens: jax.Array | None = None,
        update_loss_ema: bool = True,
        return_intermediates: bool = False,
        is_training: bool = True,
    ):
        if return_latents:
            return self.encode(video, mask_patches=False)

        if mask_patches is None:
            mask_patches = is_training

        is_image = video.ndim == 4
        if is_image:
            video = video[:, :, None]

        video_internal = video_to_internal(video)
        b, t, height, width, _ = video_internal.shape

        latents, latent_hiddens, interm = self.encode(
            video, mask_patches=mask_patches, patch_mask=patch_mask, return_pre_bottleneck=True
        )
        if latents.ndim == 3:  # image path squeezed
            latents = latents[:, None]

        zero = jnp.zeros(())

        # latent AR (+ sigreg) on pre-bottleneck latent hiddens (encoder placement)
        latent_ar_loss = latent_ar_sigreg_loss = zero
        if self.latent_ar_loss_weight > 0.0 and t > 1:
            time_mask = lens_to_mask(time_lens, t) if time_lens is not None else None
            latent_ar_loss, latent_ar_sigreg_loss, _ = self.latent_ar(latent_hiddens, mask=time_mask)

        latent_sigreg_loss = zero
        if self.latent_sigreg_loss_weight > 0.0:
            latent_sigreg_loss = sigreg(
                self.make_rng('sample'), latents[None], num_slices=self.latent_sigreg_num_slices
            )

        # flow-noised decoding (reference `dreamer4.py:4440-4479`)
        if self.has_flow:
            key = self.make_rng('sample')
            k_time, k_noise = jax.random.split(key)
            time_indices = jax.random.randint(k_time, (b,), 0, self.decoder_flow_steps)
            noise = jax.random.normal(k_noise, video_internal.shape)
            t_frac = (time_indices.astype(jnp.float32) / self.decoder_flow_steps)[:, None, None, None, None]
            noised_video = noise + (video_internal - noise) * t_frac

            recon_video = self.decode_step(latents, noised_video=noised_video, time_indices=time_indices,
                                           height=height, width=width)

            if self.decoder_v_space_loss:
                target = video_internal - noise
                pred = (recon_video - noised_video) / (1.0 - t_frac)
            else:
                target = video_internal
                pred = recon_video
        else:
            recon_video = self.decode_step(latents, height=height, width=width)
            target = video_internal
            pred = recon_video

        # recon loss with optional variable-length masking
        recon_err = jnp.square(pred - target)
        if time_lens is not None:
            time_mask = lens_to_mask(time_lens, t)[:, :, None, None, None]
            recon_loss = masked_mean(recon_err, time_mask)
        else:
            recon_loss = jnp.mean(recon_err)

        # decorrelation on normed attention inputs (reference `dreamer4.py:4534-4539`)
        time_decorr_loss = space_decorr_loss = zero
        if self.encoder_add_decorr_aux_loss:
            key = self.make_rng('sample')
            k1, k2 = jax.random.split(key)
            if interm.normed_time_inputs is not None:
                time_decorr_loss = decorrelation_loss(k1, interm.normed_time_inputs, self.decorr_sample_frac)
            if interm.normed_space_inputs is not None:
                space_decorr_loss = decorrelation_loss(k2, interm.normed_space_inputs, self.decorr_sample_frac)

        latent_ortho_loss = zero
        if self.latent_ortho_loss_weight > 0.0:
            latent_ortho_loss = orthogonal_loss(latents)

        lpips_loss = zero  # LPIPS lands with the pretrained-VGG port (stage 8)

        if self.use_loss_normalization:
            recon_loss = self.recon_loss_normalizer(recon_loss, update_ema=update_loss_ema)
            if self.encoder_add_decorr_aux_loss:
                time_decorr_loss = self.time_decorr_loss_normalizer(time_decorr_loss, update_ema=update_loss_ema)
                space_decorr_loss = self.space_decorr_loss_normalizer(space_decorr_loss, update_ema=update_loss_ema)
            if self.latent_ar_loss_weight > 0.0:
                latent_ar_loss = self.latent_ar_loss_normalizer(latent_ar_loss, update_ema=update_loss_ema)
            if self.latent_ortho_loss_weight > 0.0:
                latent_ortho_loss = self.latent_ortho_loss_normalizer(latent_ortho_loss, update_ema=update_loss_ema)
            if self.latent_sigreg_loss_weight > 0.0:
                latent_sigreg_loss = self.latent_sigreg_loss_normalizer(latent_sigreg_loss, update_ema=update_loss_ema)

        total_loss = (
            recon_loss
            + lpips_loss * self.lpips_loss_weight
            + time_decorr_loss * self.time_decorr_loss_weight
            + space_decorr_loss * self.space_decorr_loss_weight
            + latent_ortho_loss * self.latent_ortho_loss_weight
            + latent_ar_loss * self.latent_ar_loss_weight
            + latent_ar_sigreg_loss * self.latent_ar_sigreg_loss_weight
            + latent_sigreg_loss * self.latent_sigreg_loss_weight
        )

        if not return_intermediates:
            return total_loss

        losses = TokenizerLosses(
            recon=recon_loss,
            lpips=lpips_loss,
            time_decorr=time_decorr_loss,
            space_decorr=space_decorr_loss,
            latent_ortho=latent_ortho_loss,
            latent_ar=latent_ar_loss,
            latent_ar_sigreg=latent_ar_sigreg_loss,
            latent_sigreg=latent_sigreg_loss,
        )
        recon_out = recon_video if not is_image else recon_video[:, 0]
        return total_loss, TokenizerIntermediates(losses=losses, recon=recon_out, latents=latents)

    def latent_disagreement(self, latents: jax.Array, clip_decoded: bool = False) -> jax.Array:
        """Hallucination metric: decode -> re-encode -> per-frame MSE
        (reference `dreamer4.py:4115-4135`)."""
        recon = self.decode(latents)
        if clip_decoded:
            recon = jnp.clip(recon, 0.0, 1.0)
        recon_latents = self.encode(recon, mask_patches=False)
        err = jnp.square(recon_latents - latents)
        return jnp.mean(err, axis=tuple(range(2, err.ndim)))
