"""Checkpoint correctness + trainer resume (round-2 fixes).

Covers the round-1 gaps: bf16 (non-primitive) config fields must round-trip
through save_model/load_model (reference `@save_load` reconstruction,
`test_dreamer.py:2242-2255`), trainers must support grad accumulation
(reference `trainers.py:648-682`) and exact save/resume including EMA params
and step (reference `trainers.py:599-624, 792-820`).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer4_tpu.models.tokenizer import VideoTokenizer
from dreamer4_tpu.models.world_model import DynamicsWorldModel
from dreamer4_tpu.train.trainers import BehaviorCloneTrainer, TokenizerTrainer


def tiny_tokenizer(**kwargs):
    cfg = dict(dim=16, dim_latent=8, patch_size=8, image_height=16, image_width=16,
               num_latent_tokens=2, encoder_depth=1, decoder_depth=1,
               time_block_every=1, attn_dim_head=8, attn_heads=2,
               use_loss_normalization=False)
    cfg.update(kwargs)
    return VideoTokenizer(**cfg)


def tree_allclose(a, b, atol=0.0):
    ok = jax.tree.map(lambda x, y: bool(jnp.allclose(x, y, atol=atol)), a, b)
    return all(jax.tree.leaves(ok))


def test_bf16_config_roundtrip(tmp_path):
    """A bf16-configured model must save and reload with a real dtype (the
    round-1 bug stringified it) and run a forward after reload."""
    from dreamer4_tpu.train.checkpoint import load_model, save_model

    model = tiny_tokenizer(dtype=jnp.bfloat16)
    video = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 2, 16, 16))
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'sample': jax.random.PRNGKey(1)}, video)

    save_model(tmp_path / 'ckpt', model, variables, extra={'step': 3})
    model2, variables2 = load_model(tmp_path / 'ckpt', VideoTokenizer)

    assert model2.dtype == jnp.bfloat16, f'dtype came back as {model2.dtype!r}'
    assert model2 == model  # full config equality, incl. tuples
    latents = model2.apply(variables2, video, return_latents=True,
                           rngs={'sample': jax.random.PRNGKey(2)})
    assert jnp.isfinite(latents.astype(jnp.float32)).all()


def test_config_tuple_and_dict_roundtrip(tmp_path):
    """Tuple-typed fields (nested) must come back as tuples, not lists."""
    from dreamer4_tpu.train.checkpoint import load_model, save_model

    model = tiny_tokenizer(encoder_moss_layers=(1,), decoder_moss_layers=())
    video = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 2, 16, 16))
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'sample': jax.random.PRNGKey(1)}, video)
    save_model(tmp_path / 'ckpt', model, variables)
    model2, _ = load_model(tmp_path / 'ckpt', VideoTokenizer)
    assert model2.encoder_moss_layers == (1,)
    assert isinstance(model2.encoder_moss_layers, tuple)


def test_grad_accum_tokenizer():
    """With grad_accum=k: params frozen for k-1 micro-steps, EMA frozen with
    them, ts.step counts optimizer (not micro) steps, and the applied update
    uses the averaged gradient (== a k-times-larger batch)."""
    model = tiny_tokenizer()
    video = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 2, 16, 16))
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'sample': jax.random.PRNGKey(1)}, video)

    trainer = TokenizerTrainer(model, variables, learning_rate=1e-3,
                               grad_accum=2, with_ema=True, seed=0)
    p0, e0 = trainer.ts.params, trainer.ts.ema_params

    trainer.train_on_batch(video)  # micro-step 1: accumulate only
    assert tree_allclose(trainer.ts.params, p0)
    assert tree_allclose(trainer.ts.ema_params, e0)
    assert int(trainer.ts.step) == 0

    trainer.train_on_batch(video)  # micro-step 2: apply
    assert not tree_allclose(trainer.ts.params, p0)
    assert not tree_allclose(trainer.ts.ema_params, e0)
    assert int(trainer.ts.step) == 1


def test_tokenizer_trainer_save_resume_exact(tmp_path):
    """Kill/restart semantics: save mid-run, keep training; a fresh trainer
    restored from the checkpoint and fed the same batches must reproduce the
    original params, EMA params and step bit-for-bit."""
    model = tiny_tokenizer()
    videos = [jax.random.uniform(jax.random.PRNGKey(i), (2, 3, 2, 16, 16))
              for i in range(6)]
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'sample': jax.random.PRNGKey(1)}, videos[0])

    kw = dict(learning_rate=3e-3, with_ema=True, seed=0)
    trainer = TokenizerTrainer(model, variables, **kw)
    for v in videos[:3]:
        trainer.train_on_batch(v)
    trainer.save_checkpoint(tmp_path)
    for v in videos[3:]:
        trainer.train_on_batch(v)

    trainer2 = TokenizerTrainer(model, variables, **kw)
    extra = trainer2.restore(tmp_path)
    assert int(trainer2.ts.step) == 3
    assert extra == {} or isinstance(extra, dict)
    for v in videos[3:]:
        trainer2.train_on_batch(v)

    assert int(trainer2.ts.step) == int(trainer.ts.step) == 6
    assert tree_allclose(trainer2.ts.params, trainer.ts.params)
    assert tree_allclose(trainer2.ts.ema_params, trainer.ts.ema_params)


def test_ema_checkpoint_is_loadable_model(tmp_path):
    """The EMA weights are saved as a standalone model checkpoint (reference
    `-ema.pt`, `cli.py:207-211`) that load_model can open directly."""
    from dreamer4_tpu.train.checkpoint import load_model

    model = tiny_tokenizer()
    video = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 2, 16, 16))
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'sample': jax.random.PRNGKey(1)}, video)
    trainer = TokenizerTrainer(model, variables, with_ema=True, seed=0)
    trainer.train_on_batch(video)
    target = trainer.save_checkpoint(tmp_path)

    ema_model, ema_vars = load_model(target / 'ema', VideoTokenizer)
    assert tree_allclose(ema_vars['params'], trainer.ts.ema_params)
    latents = ema_model.apply(ema_vars, video, return_latents=True,
                              rngs={'sample': jax.random.PRNGKey(2)})
    assert jnp.isfinite(latents).all()


def test_bc_trainer_save_resume_exact(tmp_path):
    """Same exact-resume invariant for the dynamics trainer, whose host loop
    additionally draws the shortcut branch from a numpy rng."""
    model = DynamicsWorldModel(
        dim=16, dim_latent=8, num_latent_tokens=4, max_steps=8, depth=1,
        time_block_every=1, num_spatial_tokens=4, num_discrete_actions=(3,),
        attn_dim_head=8, attn_heads=2, multi_token_pred_len=2,
        num_register_tokens=2, use_loss_normalization=False)

    def batch(i):
        k = jax.random.PRNGKey(100 + i)
        return dict(
            latents=jax.random.normal(k, (2, 3, 1, 4, 8)) * 0.5,
            rewards=jax.random.normal(jax.random.fold_in(k, 1), (2, 3)),
            terminals=jnp.zeros((2, 3), bool),
            discrete_actions=jax.random.randint(jax.random.fold_in(k, 2), (2, 3, 1), 0, 3),
        )

    variables = model.init({'params': jax.random.PRNGKey(0),
                            'sample': jax.random.PRNGKey(1)},
                           shortcut_train=False, **batch(0))
    kw = dict(learning_rate=1e-3, with_ema=True, seed=0)
    trainer = BehaviorCloneTrainer(model, variables, **kw)
    for i in range(3):
        trainer.train_on_batch(batch(i))
    trainer.save_checkpoint(tmp_path)
    for i in range(3, 5):
        trainer.train_on_batch(batch(i))

    trainer2 = BehaviorCloneTrainer(model, variables, **kw)
    trainer2.restore(tmp_path)
    for i in range(3, 5):
        trainer2.train_on_batch(batch(i))

    assert tree_allclose(trainer2.ts.params, trainer.ts.params)
    assert tree_allclose(trainer2.ts.ema_params, trainer.ts.ema_params)
