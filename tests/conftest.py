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


import pytest  # noqa: E402

_last_module = [None]


@pytest.fixture(autouse=True)
def _bounded_compile_state(request):
    """Drop JAX's cached executables/traces at every test-MODULE boundary.

    Single-process full-suite runs (~280 tests, 8 virtual devices)
    nondeterministically segfault the XLA CPU compiler around ~78% of
    the suite (observed 2026-08 at different tests on different runs,
    always inside backend_compile; fine in isolation and under
    xdist -n 4). Bounding accumulated compile state per module keeps
    the single-process run green; within-module compile reuse — where
    nearly all sharing happens — is preserved."""
    mod = request.node.nodeid.split('::', 1)[0]
    if _last_module[0] not in (None, mod):
        jax.clear_caches()
    _last_module[0] = mod
    yield
