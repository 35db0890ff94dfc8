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
