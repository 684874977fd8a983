"""Test harness: force an 8-device virtual CPU mesh (the fake-backend
capability the reference lacks — its tests hardcode device='cuda').

Note: the env var JAX_PLATFORMS alone is not enough on machines where a TPU
PJRT plugin (e.g. 'axon') is registered — jax.config.update after import is
authoritative.
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)
# CPU default matmul precision is reduced (bf16-like); oracle comparisons
# need true f32 matmuls.
jax.config.update('jax_default_matmul_precision', 'highest')


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == 'cpu', jax.devices()
