"""VideoTokenizer — causal spacetime-transformer autoencoder.

TPU-native re-design of the reference `VideoTokenizer` + `VideoDecoderNetwork`
(`dreamer4.py:3489-4603`):

- Encoder: patchify (linear or shifted-patch tokenization, optional temporal
  difference channels, optional pre/post causal conv3d) -> per-frame MAE
  masking (per-(b,t) mask prob ~ U(lo,hi)) -> learned latent query tokens
  appended on the right (optionally slot-attention-initialized) -> optional
  aug-conditioning token with CFG dropout -> axial space/time transformer
  (special tokens = latents + aug) -> linear bottleneck -> tanh.
- Decoder: spatial tokens synthesized from a 2-D coordinate MLP positional
  embedding (+ noised image tokens for flow steps, optional slot-attention
  init from latents), packed with latents as special tokens where latents
  attend only to themselves, then unpatchified. Optional separate flow
  decoder (step-0 decoder vs step>0 flow decoder).
- Flow decoding (RAC-style): x-prediction flow over `decoder_flow_steps`;
  inference runs Euler steps flow = (pred - x_t) / (1 - t). Optional Beta
  distribution over training flow times; optional latent-gradient gating by
  timestep (`latent_grad_only_at_noise`).
- BYOL: EMA-teacher latents (passed in by the trainer) + predictor MLP
  (optionally SEM-bottlenecked).
- Streaming encode via a 4-part time cache (spt, pre-conv, transformer,
  post-conv — reference `dreamer4.py:4301-4306`).

Note on decoder masking: the reference constructs the decoder transformer
with its default num_special_tokens=1 (`dreamer4.py:3582-3594`), which masks
only the last latent token; this implementation follows the stated design
intent (`dreamer4.py:2775`) instead — all latents are special and attend only
to themselves.

Internal video layout is channels-last (b, t, h, w, c); the public API
accepts the reference's (b, c, t, h, w). Stochasticity uses the linen
'sample' rng collection.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.conv import CausalDepthwiseConv3d
from ..nn.latent_ar import LatentAutoregressiveLoss
from ..nn.loss_normalizer import LossNormalizer
from ..nn.mlp import MLP, create_mlp
from ..nn.sem import SEM
from ..nn.slot_attention import SlotAttention
from ..nn.spt import ShiftedPatchTokenization
from ..ops.losses import decorrelation_loss, sigreg
from ..ops.utils import frac_gradient, lens_to_mask, masked_mean, orthogonal_loss, smooth_l1_loss
from .transformer import AxialSpaceTimeTransformer, TransformerCache


class TokenizerLosses(NamedTuple):
    recon: jax.Array
    flow_recon: jax.Array
    lpips: jax.Array
    time_decorr: jax.Array
    space_decorr: jax.Array
    latent_ortho: jax.Array
    latent_ar: jax.Array
    latent_ar_sigreg: jax.Array
    latent_sigreg: jax.Array
    byol: jax.Array


class TokenizerIntermediates(NamedTuple):
    losses: TokenizerLosses
    recon: jax.Array
    latents: jax.Array


class TokenizerCache(NamedTuple):
    """4-part streaming cache (reference `dreamer4.py:4301-4306`)."""
    spt: jax.Array | None
    pre_conv: jax.Array | None
    transformer: TransformerCache
    post_conv: jax.Array | None


def video_to_internal(video: jax.Array) -> jax.Array:
    """(b, c, t, h, w) [reference layout] -> (b, t, h, w, c)."""
    return jnp.transpose(video, (0, 2, 3, 4, 1))


def video_to_external(video: jax.Array) -> jax.Array:
    return jnp.transpose(video, (0, 4, 1, 2, 3))


def _sample_beta(key, a: float, b: float, shape):
    ga = jax.random.gamma(key, a, shape)
    gb = jax.random.gamma(jax.random.fold_in(key, 1), b, shape)
    return ga / (ga + gb)


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
    has_aug_conditioning: bool = False
    use_causal_conv3d: bool = False
    causal_conv3d_kernel_size: int = 3
    slot_attention_initted_spatial_tokens: bool = False
    slot_attention_iters: int = 2
    slot_attention_inverted: bool = True
    slot_spatial_mix: bool = False
    num_spatial_tokens: int | None = None
    use_flash_attention: bool = False
    use_fused_small: bool | None = None  # see AxialSpaceTimeTransformer.use_fused_small
    time_attention_use_pope: bool = False
    space_attention_use_pope: bool = False
    moss_layers: tuple = ()
    image_height: int | None = None
    image_width: int | None = None
    dtype: jnp.dtype | None = None

    def setup(self):
        self.to_pos_emb = MLP(
            hidden_dims=(self.dim * 2,) * self.pos_mlp_depth,
            dim_out=self.dim,
            activation=self.pos_mlp_activation,
            name='to_pos_emb',
        )
        if self.slot_attention_initted_spatial_tokens:
            self.slot_attention = SlotAttention(
                dim=self.dim, iters=self.slot_attention_iters,
                heads=self.attn_heads, dim_head=self.attn_dim_head,
                inverted_attention=self.slot_attention_inverted,
                num_slots=self.num_spatial_tokens,
                spatial_mix=self.slot_spatial_mix, name='slot_attention')
        if self.has_aug_conditioning:
            self.aug_cond_embedding = nn.Embed(3, self.dim, name='aug_cond_embedding')
        if self.use_causal_conv3d:
            self.pre_causal_conv3d = CausalDepthwiseConv3d(
                self.dim, self.causal_conv3d_kernel_size, name='pre_causal_conv3d')
            self.post_causal_conv3d = CausalDepthwiseConv3d(
                self.dim, self.causal_conv3d_kernel_size, name='post_causal_conv3d')
        self.transformer = AxialSpaceTimeTransformer(
            dim=self.dim,
            depth=self.depth,
            attn_dim_head=self.attn_dim_head,
            attn_heads=self.attn_heads,
            query_heads=self.query_heads,
            time_block_every=self.time_block_every,
            num_special_tokens=self.num_latent_tokens + int(self.has_aug_conditioning),
            special_attend_only_itself=True,  # latents attend only to themselves
            full_spatial_attn=self.full_spatial_attn,
            use_flash_attention=self.use_flash_attention,
            use_fused_small=self.use_fused_small,
            time_attention_use_pope=self.time_attention_use_pope,
            space_attention_use_pope=self.space_attention_use_pope,
            space_height=(self.image_height // self.patch_size
                          if self.image_height is not None else None),
            space_width=(self.image_width // self.patch_size
                         if self.image_width is not None else None),
            spatial_module_layers=tuple(self.moss_layers),
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
        aug_id: jax.Array | None = None,        # (b,) ints
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

        spatial4 = spatial  # (b, t, hp, wp, d)
        spatial = spatial.reshape(b, t, hp * wp, self.dim)

        if self.slot_attention_initted_spatial_tokens:
            spatial = self.slot_attention(spatial, latent_tokens)
            spatial4 = spatial.reshape(b, t, hp, wp, self.dim)

        if self.use_causal_conv3d:
            spatial4 = self.pre_causal_conv3d(spatial4)
            spatial = spatial4.reshape(b, t, hp * wp, self.dim)

        parts = [spatial]
        if self.has_aug_conditioning:
            if aug_id is None:
                aug_id = jnp.zeros((b,), jnp.int32)
            aug_token = self.aug_cond_embedding(aug_id)[:, None, None, :]
            parts.append(jnp.broadcast_to(aug_token, (b, t, 1, self.dim)))
        parts.append(latent_tokens)
        tokens = jnp.concatenate(parts, axis=2)

        tokens, _ = self.transformer(tokens)

        spatial = tokens[:, :, : hp * wp]

        if self.use_causal_conv3d:
            spatial4 = spatial.reshape(b, t, hp, wp, self.dim)
            spatial4 = self.post_causal_conv3d(spatial4)
            spatial = spatial4.reshape(b, t, hp * wp, self.dim)

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
    # encoder options
    encode_temporal_diff: bool = False
    use_causal_conv3d: bool = False
    causal_conv3d_kernel_size: int = 3
    use_shifted_patch_tokenization: bool = False
    spt_temporal_shift: bool = True
    latent_init_patch_size: int | None = None
    slot_attention_initted_latents: bool = False
    slot_attention_iters: int = 2
    encoder_slot_spatial_mix: bool = True
    slot_attention_inverted: bool = True
    # decoder options
    decoder_slot_attention_initted_spatial_tokens: bool = False
    decoder_slot_attention_iters: int = 2
    decoder_slot_spatial_mix: bool = False
    separate_flow_decoder: bool = False
    flow_decoder_train_prob: float = 0.5
    latent_grad_only_at_noise: bool = False
    decoder_flow_times_beta: tuple[float, float] = (1.0, 1.0)
    # aug conditioning
    has_aug_conditioning: bool = False
    aug_cfg_dropout_prob: float = 0.1
    # byol
    has_byol: bool = False
    byol_loss_weight: float = 1.0
    byol_use_sem: bool = False
    byol_sem_simplex_dim: int = 8
    byol_sem_temperature: float = 0.1
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
    latent_consistency_loss_weight: float = 0.0
    use_flash_attention: bool = False
    use_fused_small: bool | None = None  # see AxialSpaceTimeTransformer.use_fused_small
    time_attention_use_pope: bool = False
    space_attention_use_pope: bool = False
    encoder_moss_layers: tuple = ()
    decoder_moss_layers: tuple = ()
    use_time_rnn: bool = False
    h_net_layer: int | None = None
    h_net_depth: int = 2
    h_net_compression_ratio: int = 4
    h_net_dynamic: bool = False
    h_net_loss_weight: float = 1.0
    dtype: jnp.dtype | None = None

    @property
    def has_flow(self) -> bool:
        return self.decoder_flow_steps > 0

    @property
    def has_separate_flow_decoder(self) -> bool:
        return self.separate_flow_decoder and self.has_flow

    @property
    def latent_shape(self) -> tuple[int, int]:
        return (self.num_latent_tokens, self.dim_latent)

    @property
    def encoder_channels(self) -> int:
        return self.channels * (2 if self.encode_temporal_diff else 1)

    def setup(self):
        p = self.patch_size
        assert self.image_height % p == 0 and self.image_width % p == 0

        if self.use_shifted_patch_tokenization:
            self.patch_to_tokens = ShiftedPatchTokenization(
                dim=self.dim, patch_size=p, channels=self.encoder_channels,
                temporal_shift=self.spt_temporal_shift, name='patch_to_tokens')
        else:
            self.patch_proj = nn.Dense(self.dim, name='patch_proj')
            self.patch_norm = nn.LayerNorm(use_bias=False, name='patch_norm')

        if self.latent_init_patch_size is not None:
            assert self.latent_init_patch_size <= p and p % self.latent_init_patch_size == 0
            self.latent_init_patch_proj = nn.Dense(self.dim, name='latent_init_patch_proj')
            self.latent_init_patch_norm = nn.LayerNorm(use_bias=False, name='latent_init_patch_norm')
            self.latent_init_mask_token = self.param(
                'latent_init_mask_token', nn.initializers.normal(1e-2), (self.dim,))

        self.mask_token = self.param('mask_token', nn.initializers.normal(1e-2), (self.dim,))
        self.latent_tokens = self.param('latent_tokens', nn.initializers.normal(1e-2),
                                        (self.num_latent_tokens, self.dim))

        if self.slot_attention_initted_latents:
            self.slot_attention = SlotAttention(
                dim=self.dim, iters=self.slot_attention_iters,
                heads=self.attn_heads, dim_head=self.attn_dim_head,
                inverted_attention=self.slot_attention_inverted,
                num_slots=self.num_latent_tokens,
                spatial_mix=self.encoder_slot_spatial_mix, name='slot_attention')

        if self.has_aug_conditioning:
            self.aug_cond_embedding = nn.Embed(3, self.dim, name='aug_cond_embedding')

        if self.use_causal_conv3d:
            self.encoder_pre_causal_conv3d = CausalDepthwiseConv3d(
                self.dim, self.causal_conv3d_kernel_size, name='encoder_pre_causal_conv3d')
            self.encoder_post_causal_conv3d = CausalDepthwiseConv3d(
                self.dim, self.causal_conv3d_kernel_size, name='encoder_post_causal_conv3d')

        self.encoder_transformer = AxialSpaceTimeTransformer(
            dim=self.dim,
            depth=self.encoder_depth,
            attn_dim_head=self.attn_dim_head,
            attn_heads=self.attn_heads,
            query_heads=self.query_heads,
            attn_softclamp_value=self.attn_softclamp_value,
            time_block_every=self.time_block_every,
            num_special_tokens=self.num_latent_tokens + int(self.has_aug_conditioning),
            full_spatial_attn=self.encoder_full_spatial_attn,
            final_norm=True,
            use_flash_attention=self.use_flash_attention,
            use_fused_small=self.use_fused_small,
            time_attention_use_pope=self.time_attention_use_pope,
            space_attention_use_pope=self.space_attention_use_pope,
            space_height=self.image_height // p,
            space_width=self.image_width // p,
            spatial_module_layers=tuple(self.encoder_moss_layers),
            rnn_time=self.use_time_rnn,
            h_net_layer=self.h_net_layer,
            h_net_depth=self.h_net_depth,
            h_net_compression_ratio=self.h_net_compression_ratio,
            h_net_dynamic=self.h_net_dynamic,
            dtype=self.dtype,
            name='encoder_transformer',
        )

        self.encoded_to_latents = nn.Dense(self.dim_latent, use_bias=False, name='encoded_to_latents')
        self.latents_to_decoder = nn.Dense(self.dim, use_bias=False, name='latents_to_decoder')

        decoder_kwargs = dict(
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
            has_aug_conditioning=self.has_aug_conditioning,
            use_causal_conv3d=self.use_causal_conv3d,
            causal_conv3d_kernel_size=self.causal_conv3d_kernel_size,
            slot_attention_initted_spatial_tokens=self.decoder_slot_attention_initted_spatial_tokens,
            slot_attention_iters=self.decoder_slot_attention_iters,
            slot_attention_inverted=self.slot_attention_inverted,
            slot_spatial_mix=self.decoder_slot_spatial_mix,
            num_spatial_tokens=(self.image_height // p) * (self.image_width // p),
            use_flash_attention=self.use_flash_attention,
            use_fused_small=self.use_fused_small,
            time_attention_use_pope=self.time_attention_use_pope,
            space_attention_use_pope=self.space_attention_use_pope,
            moss_layers=tuple(self.decoder_moss_layers),
            image_height=self.image_height,
            image_width=self.image_width,
            dtype=self.dtype,
        )
        self.decoder = VideoDecoderNetwork(**decoder_kwargs, name='decoder')
        if self.has_separate_flow_decoder:
            self.flow_decoder = VideoDecoderNetwork(**decoder_kwargs, name='flow_decoder')

        if self.has_flow:
            self.time_embed = nn.Embed(self.decoder_flow_steps, self.dim, name='time_embed')
            self.noised_patch_proj = nn.Dense(self.dim, name='noised_patch_proj')
            self.noised_patch_norm = nn.LayerNorm(use_bias=False, name='noised_patch_norm')

        if self.has_byol:
            self.byol_predictor = create_mlp(self.dim_latent, 3, self.dim_latent,
                                             name='byol_predictor')
            if self.byol_use_sem:
                self.byol_sem = SEM(self.dim_latent, temperature=self.byol_sem_temperature,
                                    dim_simplex=self.byol_sem_simplex_dim,
                                    pre_layernorm=True, name='byol_sem')

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
            if self.has_separate_flow_decoder:
                self.flow_recon_loss_normalizer = LossNormalizer(name='flow_recon_loss_normalizer')
            if self.lpips_loss_weight > 0.0:
                self.lpips_loss_normalizer = LossNormalizer(name='lpips_loss_normalizer')
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

    def _prep_aug_id(self, aug_id, batch, cfg_dropout: bool):
        """Normalize aug ids to (b,) ints in {0: none, 1: no-aug, 2: augmented}
        with CFG dropout to 0 (reference `dreamer4.py:4281-4299`)."""
        if aug_id is None:
            aug_id = 0
        if isinstance(aug_id, bool):
            aug_id = int(aug_id) + 1
        aug_id = jnp.asarray(aug_id)
        if aug_id.dtype == jnp.bool_:
            aug_id = aug_id.astype(jnp.int32) + 1
        aug_id = jnp.broadcast_to(aug_id, (batch,)).astype(jnp.int32)
        if cfg_dropout and self.aug_cfg_dropout_prob > 0.0:
            drop = jax.random.bernoulli(self.make_rng('sample'), self.aug_cfg_dropout_prob, (batch,))
            aug_id = jnp.where(drop, 0, aug_id)
        return aug_id

    def _patchify(self, video: jax.Array, patch_size: int | None = None, noised: bool = False,
                  latent_init: bool = False, spt_cache=None, return_spt_cache: bool = False):
        """(b, t, h, w, c) -> (b, t, hp, wp, dim)."""
        p = patch_size if patch_size is not None else self.patch_size
        if not noised and not latent_init and self.use_shifted_patch_tokenization:
            return self.patch_to_tokens(video, time_cache=spt_cache,
                                        return_time_cache=return_spt_cache)

        b, t, h, w, c = video.shape
        x = video.reshape(b, t, h // p, p, w // p, p, c)
        x = jnp.transpose(x, (0, 1, 2, 4, 3, 5, 6)).reshape(b, t, h // p, w // p, p * p * c)
        if noised:
            out = self.noised_patch_norm(self.noised_patch_proj(x))
        elif latent_init:
            out = self.latent_init_patch_norm(self.latent_init_patch_proj(x))
        else:
            out = self.patch_norm(self.patch_proj(x))
        if return_spt_cache:
            return out, None
        return out

    def _encoder_input(self, video_internal, is_image: bool):
        if self.encode_temporal_diff and not is_image:
            diff = video_internal[:, 1:] - video_internal[:, :-1]
            diff = jnp.pad(diff, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
            return jnp.concatenate([video_internal, diff], axis=-1)
        if self.encode_temporal_diff and is_image:
            zeros = jnp.zeros_like(video_internal)
            return jnp.concatenate([video_internal, zeros], axis=-1)
        return video_internal

    # ------------------------------------------------------------- encode

    def encode(
        self,
        video: jax.Array,                     # (b, c, t, h, w) or (b, c, h, w)
        mask_patches: bool = False,
        patch_mask: jax.Array | None = None,
        aug_id=None,
        cfg_dropout_aug: bool = False,
        cache: TokenizerCache | None = None,
        max_time: int | None = None,
        return_cache: bool = False,
        return_pre_bottleneck: bool = False,
    ):
        is_image = video.ndim == 4
        if is_image:
            video = video[:, :, None]
        video = video_to_internal(video)
        video = self._encoder_input(video, is_image)

        b, t = video.shape[:2]
        ns_extra = int(self.has_aug_conditioning)

        spt_cache = pre_conv_cache = tfm_cache = post_conv_cache = None
        if cache is not None:
            spt_cache, pre_conv_cache, tfm_cache, post_conv_cache = cache

        want_cache = return_cache

        tokens, next_spt_cache = self._patchify(video, spt_cache=spt_cache, return_spt_cache=True)
        hp, wp = tokens.shape[2], tokens.shape[3]

        next_pre_conv_cache = None
        if self.use_causal_conv3d:
            tokens, next_pre_conv_cache = self.encoder_pre_causal_conv3d(
                tokens, time_cache=pre_conv_cache, return_time_cache=True)

        latent_init_tokens = None
        if self.latent_init_patch_size is not None:
            latent_init_tokens = self._patchify(video, patch_size=self.latent_init_patch_size,
                                                latent_init=True)

        if mask_patches or patch_mask is not None:
            if patch_mask is None:
                key = self.make_rng('sample')
                k1, k2 = jax.random.split(key)
                lo, hi = self.per_image_patch_mask_prob
                mask_prob = jax.random.uniform(k1, (b, t), minval=lo, maxval=hi)
                patch_mask = jax.random.bernoulli(k2, mask_prob[..., None, None], (b, t, hp, wp))
            tokens = jnp.where(patch_mask[..., None], self.mask_token, tokens)

            if latent_init_tokens is not None:
                scale = self.patch_size // self.latent_init_patch_size
                fine_mask = jnp.repeat(jnp.repeat(patch_mask, scale, axis=2), scale, axis=3)
                latent_init_tokens = jnp.where(fine_mask[..., None],
                                               self.latent_init_mask_token, latent_init_tokens)

        tokens = tokens.reshape(b, t, hp * wp, self.dim)

        latents = jnp.broadcast_to(self.latent_tokens[None, None],
                                   (b, t, self.num_latent_tokens, self.dim))
        if self.slot_attention_initted_latents:
            init_src = (latent_init_tokens.reshape(b, t, -1, self.dim)
                        if latent_init_tokens is not None else tokens)
            latents = self.slot_attention(latents, init_src)

        parts = [tokens]
        aug_ids = None
        if self.has_aug_conditioning:
            aug_ids = self._prep_aug_id(aug_id, b, cfg_dropout_aug)
            aug_token = self.aug_cond_embedding(aug_ids)[:, None, None, :]
            parts.append(jnp.broadcast_to(aug_token, (b, t, 1, self.dim)))
        parts.append(latents)
        tokens = jnp.concatenate(parts, axis=2)

        tokens, interm = self.encoder_transformer(
            tokens, cache=tfm_cache, max_time=max_time if want_cache else None,
            return_intermediates=True)

        next_post_conv_cache = None
        if self.use_causal_conv3d:
            spatial = tokens[:, :, : hp * wp].reshape(b, t, hp, wp, self.dim)
            spatial, next_post_conv_cache = self.encoder_post_causal_conv3d(
                spatial, time_cache=post_conv_cache, return_time_cache=True)
            tokens = jnp.concatenate([spatial.reshape(b, t, hp * wp, self.dim),
                                      tokens[:, :, hp * wp:]], axis=2)

        latent_hiddens = tokens[:, :, -self.num_latent_tokens:]
        latents = jnp.tanh(self.encoded_to_latents(latent_hiddens))

        if is_image:
            latents = latents[:, 0]

        out = (latents,)
        if return_pre_bottleneck:
            out = out + (latent_hiddens, interm, aug_ids)
        if return_cache:
            next_cache = TokenizerCache(next_spt_cache, next_pre_conv_cache,
                                        interm.cache, next_post_conv_cache)
            out = out + (next_cache,)
        return out[0] if len(out) == 1 else out

    # -------------------------------------------------------------- decode

    def decode_step(
        self,
        latents: jax.Array,                   # (b, t, n, d_latent)
        noised_video: jax.Array | None = None,  # internal layout (b, t, h, w, c)
        time_indices: jax.Array | None = None,  # (b,)
        height: int | None = None,
        width: int | None = None,
        aug_id=None,
        use_flow_decoder: bool = False,
    ) -> jax.Array:
        height = height if height is not None else self.image_height
        width = width if width is not None else self.image_width
        b = latents.shape[0]

        latent_tokens = self.latents_to_decoder(latents)

        if self.has_flow:
            if time_indices is None:
                time_indices = jnp.zeros((b,), jnp.int32)
            emb = self.time_embed(time_indices)
            latent_tokens = latent_tokens + emb[:, None, None, :]

        image_tokens = None
        if noised_video is not None:
            image_tokens = self._patchify(noised_video, noised=True)

        aug_ids = None
        if self.has_aug_conditioning:
            aug_ids = self._prep_aug_id(aug_id, b, cfg_dropout=False)

        decoder = self.flow_decoder if (use_flow_decoder and self.has_separate_flow_decoder) \
            else self.decoder
        return decoder(latent_tokens, height, width,
                       noised_image_tokens=image_tokens, aug_id=aug_ids)

    def decode(
        self,
        latents: jax.Array,                   # (b, t, n, d_latent)
        height: int | None = None,
        width: int | None = None,
        aug_id=None,
    ) -> jax.Array:                           # (b, c, t, h, w)
        """Euler flow sampling (reference `decode`, `dreamer4.py:4186-4237`)."""
        height = height if height is not None else self.image_height
        width = width if width is not None else self.image_width
        b, t = latents.shape[:2]

        if not self.has_flow:
            recon = self.decode_step(latents, height=height, width=width, aug_id=aug_id)
            return video_to_external(recon)

        key = self.make_rng('sample')
        video = jax.random.normal(key, (b, t, height, width, self.channels))

        steps = self.decoder_flow_steps
        delta = 1.0 / steps
        for i in range(steps):
            t_frac = i * delta
            time_indices = jnp.full((b,), i, jnp.int32)
            pred = self.decode_step(latents, noised_video=video, time_indices=time_indices,
                                    height=height, width=width, aug_id=aug_id,
                                    use_flow_decoder=i > 0)
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
        aug_id=None,
        cfg_dropout_aug: bool | None = None,
        byol_target_latents: jax.Array | None = None,
        lpips_fn: Callable | None = None,
        update_loss_ema: bool = True,
        return_intermediates: bool = False,
        train_flow_decoder: bool | None = None,
        is_training: bool = True,
    ):
        if self.is_initializing():
            # materialize params of branches the init call may not exercise
            if self.has_separate_flow_decoder:
                self.flow_decoder(jnp.zeros((1, 1, self.num_latent_tokens, self.dim)),
                                  self.patch_size, self.patch_size)
            if self.has_byol:
                h = jnp.zeros((1, self.dim_latent))
                if self.byol_use_sem:
                    h = self.byol_sem(h)
                self.byol_predictor(h)

        if return_latents:
            return self.encode(video, mask_patches=False, aug_id=aug_id)

        if mask_patches is None:
            mask_patches = is_training
        if cfg_dropout_aug is None:
            cfg_dropout_aug = is_training

        is_image = video.ndim == 4
        if is_image:
            video = video[:, :, None]

        video_internal = video_to_internal(video)
        b, t, height, width, _ = video_internal.shape

        latents, latent_hiddens, interm, aug_ids = self.encode(
            video, mask_patches=mask_patches, patch_mask=patch_mask,
            aug_id=aug_id, cfg_dropout_aug=cfg_dropout_aug,
            return_pre_bottleneck=True)
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
                self.make_rng('sample'), latents[None], num_slices=self.latent_sigreg_num_slices)

        h_net_loss = getattr(interm, 'h_net_loss', 0.0)

        # ---- flow-noised decoding (reference `dreamer4.py:4440-4479`)
        use_flow_decoder = False
        if self.has_flow:
            key = self.make_rng('sample')
            k_time, k_noise = jax.random.split(key)

            if self.has_separate_flow_decoder and self.decoder_flow_steps > 1:
                # trainer chooses which decoder trains this step (host bernoulli)
                use_flow_decoder = bool(train_flow_decoder) if train_flow_decoder is not None else False
                low, high = (1, self.decoder_flow_steps) if use_flow_decoder else (0, 1)
                time_indices = jax.random.randint(k_time, (b,), low, high)
            elif self.decoder_flow_times_beta != (1.0, 1.0):
                a, bb = self.decoder_flow_times_beta
                u = _sample_beta(k_time, a, bb, (b,))
                time_indices = jnp.clip((u * self.decoder_flow_steps).astype(jnp.int32),
                                        0, self.decoder_flow_steps - 1)
            else:
                time_indices = jax.random.randint(k_time, (b,), 0, self.decoder_flow_steps)

            noise = jax.random.normal(k_noise, video_internal.shape[:4] + (self.channels,))
            t_frac = (time_indices.astype(jnp.float32) / self.decoder_flow_steps)[:, None, None, None, None]
            clean = video_internal[..., : self.channels]
            noised_video = noise + (clean - noise) * t_frac

            # latent gradient gating by timestep (reference `dreamer4.py:3879-3886`)
            dec_latents = latents
            if self.latent_grad_only_at_noise or self.has_separate_flow_decoder:
                frac = (time_indices == 0).astype(jnp.float32)[:, None, None, None]
                dec_latents = frac_gradient(latents, frac)

            recon_video = self.decode_step(dec_latents, noised_video=noised_video,
                                           time_indices=time_indices,
                                           height=height, width=width, aug_id=aug_ids,
                                           use_flow_decoder=use_flow_decoder)

            if self.decoder_v_space_loss:
                target = clean - noise
                pred = (recon_video - noised_video) / (1.0 - t_frac)
            else:
                target = clean
                pred = recon_video
        else:
            clean = video_internal[..., : self.channels]
            recon_video = self.decode_step(latents, height=height, width=width, aug_id=aug_ids)
            target = clean
            pred = recon_video

        # recon loss with optional variable-length masking
        recon_err = jnp.square(pred - target)
        if time_lens is not None:
            time_mask = lens_to_mask(time_lens, t)[:, :, None, None, None]
            recon_loss = masked_mean(recon_err, time_mask)
        else:
            recon_loss = jnp.mean(recon_err)

        flow_recon_loss = zero
        if use_flow_decoder:
            flow_recon_loss, recon_loss = recon_loss, zero

        # perceptual loss (injected by the trainer; see nn/lpips.py)
        lpips_loss = zero
        if lpips_fn is not None and self.lpips_loss_weight > 0.0:
            lpips_loss = lpips_fn(recon_video, clean, self.make_rng('sample'), time_lens)

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

        # BYOL (EMA-teacher latents provided by the trainer;
        # reference `dreamer4.py:4544-4547`)
        byol_loss = zero
        if self.has_byol and byol_target_latents is not None:
            h = latents
            if self.byol_use_sem:
                h = self.byol_sem(h)
            pred_latents = self.byol_predictor(h)
            byol_loss = jnp.mean(smooth_l1_loss(
                pred_latents, jax.lax.stop_gradient(byol_target_latents)))

        if self.use_loss_normalization:
            if use_flow_decoder:
                flow_recon_loss = self.flow_recon_loss_normalizer(flow_recon_loss, update_ema=update_loss_ema)
            else:
                recon_loss = self.recon_loss_normalizer(recon_loss, update_ema=update_loss_ema)
            if lpips_fn is not None and self.lpips_loss_weight > 0.0:
                lpips_loss = self.lpips_loss_normalizer(lpips_loss, update_ema=update_loss_ema)
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
            + flow_recon_loss
            + lpips_loss * self.lpips_loss_weight
            + time_decorr_loss * self.time_decorr_loss_weight
            + space_decorr_loss * self.space_decorr_loss_weight
            + latent_ortho_loss * self.latent_ortho_loss_weight
            + latent_ar_loss * self.latent_ar_loss_weight
            + latent_ar_sigreg_loss * self.latent_ar_sigreg_loss_weight
            + latent_sigreg_loss * self.latent_sigreg_loss_weight
            + byol_loss * self.byol_loss_weight
            + h_net_loss * self.h_net_loss_weight
        )

        if not return_intermediates:
            return total_loss

        losses = TokenizerLosses(
            recon=recon_loss,
            flow_recon=flow_recon_loss,
            lpips=lpips_loss,
            time_decorr=time_decorr_loss,
            space_decorr=space_decorr_loss,
            latent_ortho=latent_ortho_loss,
            latent_ar=latent_ar_loss,
            latent_ar_sigreg=latent_ar_sigreg_loss,
            latent_sigreg=latent_sigreg_loss,
            byol=byol_loss,
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


ENCODER_PARAM_KEYS = (
    'patch_to_tokens', 'patch_proj', 'patch_norm', 'mask_token', 'latent_tokens',
    'encoder_transformer', 'encoded_to_latents', 'slot_attention',
    'encoder_pre_causal_conv3d', 'encoder_post_causal_conv3d',
    'latent_init_patch_proj', 'latent_init_patch_norm', 'latent_init_mask_token',
    'aug_cond_embedding',
)


def freeze_encoder_params(params):
    """Stop gradients to the encoder subtree (reference uses
    temp_requires_grad for the latent-consistency loss, `dreamer4.py:4494`)."""
    out = dict(params)
    for k in ENCODER_PARAM_KEYS:
        if k in out:
            out[k] = jax.lax.stop_gradient(out[k])
    return out


def latent_consistency_loss(model: VideoTokenizer, variables, recon_video_internal,
                            latents, time_lens=None):
    """Re-encode the reconstruction with a gradient-frozen encoder and match
    the original latents (reference `dreamer4.py:4491-4507`). Called by the
    trainer inside the loss function so decoder gradients flow through the
    reconstruction while the encoder stays fixed."""
    frozen = dict(variables)
    frozen['params'] = freeze_encoder_params(variables['params'])
    recon_ext = video_to_external(recon_video_internal)
    recon_latents = model.apply(frozen, recon_ext, method=model.encode, mask_patches=False)
    err = jnp.square(recon_latents - jax.lax.stop_gradient(latents))
    if time_lens is not None:
        t = latents.shape[1]
        mask = lens_to_mask(time_lens, t)[:, :, None, None]
        return masked_mean(err, mask)
    return jnp.mean(err)
