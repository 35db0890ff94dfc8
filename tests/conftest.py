import os

# Tests always run on a virtual 8-device CPU mesh so multi-chip sharding paths
# are exercised without TPU hardware (SURVEY.md section 4 test strategy).
#
# Note: this environment force-registers an `axon` TPU platform at interpreter
# start (JAX_PLATFORMS=axon via sitecustomize), so the env var is already
# consumed by the time conftest runs — the platform must be switched through
# jax.config instead. XLA_FLAGS is still read lazily at CPU-client creation.
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# persistent compilation cache — first full run is slow on the small CPU host,
# subsequent runs hit the cache
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import pytest  # noqa: E402

# Tests measured >~20s cold (compile-dominated) are tagged `slow` centrally so
# the quick tier (`-m "not slow"`) finishes in one CI window; timings from a
# cold full-suite run with `--durations`. New tests default to the quick tier —
# re-measure and add here if they exceed ~20s.
_SLOW = {
    'test_bc_interact_dream_with_aux_encoder',
    'test_bc_trainer_save_resume_exact',
    'test_bf16_config_roundtrip',
    'test_tokenizer_trainer_save_resume_exact',
    'test_cli_dynamics_from_folder_with_sidecars',
    'test_cli_tokenizer_folder_dataset_resume_and_logging',
    'test_interact_state_entropy_bonus',
    'test_interact_with_image_env',
    'test_full_pipeline',
    'test_transformer_flash_cached_decode',
    'test_generate_bf16_model_bf16_cache',
    'test_generate_matches_eager_reference',
    'test_generate_multiview',
    'test_generate_soft_terminals',
    'test_dynamic_hnet_boundaries_are_data_dependent',
    'test_moss_parallel_matches_cached',
    'test_mot_parallel_matches_cached',
    'test_action_mtp_loss_multi_agent',
    'test_agent_index_selects_per_agent_embeds',
    'test_two_process_env_fanout_rl_matches_single',
    'test_two_process_training_matches_single',
    'test_tokenizer_and_wm_with_pope',
    'test_trunk_time_ring_matches_dense',
    'test_actor_critic_latent_input_path',
    'test_full_model_rl_reforwards_trunk',
    'test_image_encoder_rl_path',
    'test_checkpoint_roundtrip',
    'test_dynamics_256latents_sharded_with_dreams',
    'test_tokenizer_256_sharded_train_step',
    'test_latent_disagreement',
    'test_streaming_encode_matches_parallel',
    'test_aug_conditioning_changes_output',
    'test_feature_losses_finite',
    'test_latent_consistency_freezes_encoder',
    'test_separate_flow_decoder_branches',
    'test_streaming_with_conv_and_spt_caches',
    'test_bc_trainer_self_flow',
    'test_lpips_real_weights_path',
    'test_tokenizer_trainer_full_features',
    'test_bc_trainer_step',
    'test_sim_trainer_minibatched_epochs',
    'test_sim_trainer_online_loop',
    'test_parallel_matches_cached',
    'test_parallel_pass_builds_usable_cache',
    'test_rnn_time_cached_equivalence',
    'test_full_conditioning',
    'test_inference_pred_with_cache',
    'test_proprio_and_state_env',
    'test_actor_spr_in_rl',
    'test_pre_encoders_and_ssl',
    'test_world_model_hnet_trunk',
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.originalname in _SLOW or item.name in _SLOW:
            item.add_marker(pytest.mark.slow)
