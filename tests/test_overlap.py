"""Ring-overlapped collective matmuls (parallel/overlap.py): the manual
ag-matmul / matmul-rs decompositions must match the plain (XLA-inserted
collective) forms exactly — overlap is a schedule change, not a math
change."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spt_proto_tpu.parallel.mesh import make_mesh
from spt_proto_tpu.parallel.overlap import (ag_matmul_local,
                                            matmul_rs_local,
                                            tp_ffn_overlapped)
from jax.sharding import PartitionSpec as P


@pytest.fixture(scope='module')
def mesh():
    return make_mesh(1, 8)


def test_ag_matmul_matches_plain(mesh):
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(2, 64, 32), jnp.float32)   # M=64 over 8
    w = jnp.asarray(r.randn(32, 48), jnp.float32)      # N=48 over 8
    ref = x @ w
    fn = jax.shard_map(
        functools.partial(ag_matmul_local, axis_name='model'),
        mesh=mesh, in_specs=(P(None, 'model', None), P(None, 'model')),
        out_specs=P(None, None, 'model'))
    got = fn(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_matmul_rs_matches_plain(mesh):
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(2, 64, 40), jnp.float32)   # K=40 over 8
    w = jnp.asarray(r.randn(40, 24), jnp.float32)
    ref = x @ w                                        # [2, 64, 24]
    fn = jax.shard_map(
        functools.partial(matmul_rs_local, axis_name='model'),
        mesh=mesh, in_specs=(P(None, None, 'model'), P('model', None)),
        out_specs=P(None, 'model', None))
    got = fn(x, w)                                     # M scattered
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tp_ffn_overlapped_matches_plain(mesh):
    r = np.random.RandomState(2)
    x = jnp.asarray(r.randn(2, 16, 32), jnp.float32)
    w1 = jnp.asarray(r.randn(32, 64), jnp.float32)
    w2 = jnp.asarray(r.randn(64, 32), jnp.float32)
    ref = jax.nn.relu(x @ w1) @ w2
    got = tp_ffn_overlapped(x, w1, w2, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
