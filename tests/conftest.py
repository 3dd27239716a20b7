"""Test configuration: force an 8-device CPU mesh so sharding logic is
exercised without TPU hardware (the SURVEY §4 strategy for multi-chip
testing).

The environment's axon sitecustomize registers the TPU backend and
overrides JAX_PLATFORMS in every interpreter, so the platform must be
forced through jax.config *after* import; the host-device-count flag
must still be set before the backend initializes."""
import os
import sys

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# persistent compilation cache: repeat suite runs skip XLA recompiles
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_test_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    assert jax.devices()[0].platform == 'cpu', jax.devices()
