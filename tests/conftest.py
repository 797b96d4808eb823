"""Test configuration: run on a virtual 8-device CPU mesh with float64 enabled.

Mirrors the reference test strategy (tenpy ``tests/``, see SURVEY.md §4) of verifying the
block-sparse engine against dense numpy; here additionally the multi-chip sharding paths are
exercised on a virtual CPU mesh (``xla_force_host_platform_device_count``).
"""
import os

# Force CPU for tests even if the ambient environment points JAX at a TPU tunnel:
# unit tests need fast dispatch + float64; the TPU path is exercised by bench.py.
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The env var alone is not enough when a TPU PJRT plugin (axon) is installed; the config
# update reliably pins the backend to CPU for the test suite.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
