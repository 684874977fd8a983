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


def test_tp_ffn_overlapped_biased_matches_plain(mesh):
    from spt_proto_tpu.parallel.overlap import tp_ffn_overlapped_biased
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(2, 16, 32), jnp.float32)
    w1 = jnp.asarray(r.randn(32, 64) * 0.1, jnp.float32)
    b1 = jnp.asarray(r.randn(64), jnp.float32)
    w2 = jnp.asarray(r.randn(64, 32) * 0.1, jnp.float32)
    b2 = jnp.asarray(r.randn(32), jnp.float32)
    ref = jax.nn.relu(x @ w1 + b1) @ w2 + b2
    got = tp_ffn_overlapped_biased(x, w1, b1, w2, b2, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # 2-D form (serving decode rows)
    got2 = tp_ffn_overlapped_biased(x[0], w1, b1, w2, b2, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref[0]),
                               rtol=1e-4, atol=1e-4)


def test_tp_ffn_overlapped_gated_matches_plain(mesh):
    from spt_proto_tpu.parallel.overlap import tp_ffn_overlapped_gated
    r = np.random.RandomState(2)
    x = jnp.asarray(r.randn(2, 16, 32), jnp.float32)
    wg = jnp.asarray(r.randn(32, 64) * 0.1, jnp.float32)
    ws = jnp.asarray(r.randn(32, 64) * 0.1, jnp.float32)
    wd = jnp.asarray(r.randn(64, 32) * 0.1, jnp.float32)
    ref = (jax.nn.silu(x @ wg) * (x @ ws)) @ wd
    got = tp_ffn_overlapped_gated(x, wg, ws, wd, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_tp_overlap_generate_matches_plain(mesh):
    """cfg.tp_overlap serving: generate() under a TP mesh with the
    ring-overlapped FFN must be token-for-token identical to the plain
    pjit path (VERDICT r4 item 7: the flag must be production-wired)."""
    from spt_proto_tpu.config import tiny_config
    from spt_proto_tpu.inference.engine import generate
    from spt_proto_tpu.inference.weights import InferenceWeights
    from spt_proto_tpu.tuning import surgery
    mesh2 = make_mesh(2, 4)
    for arch in ('opt', 'llama'):
        cfg = tiny_config(arch, d_model=64, n_heads=4,
                          d_feedforward=128).replace(dtype=jnp.float32)
        params = surgery.init_params(cfg, jax.random.PRNGKey(0))
        iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
        iw_o = InferenceWeights.from_params(
            cfg.replace(tp_overlap=True), params, dtype=jnp.float32)
        p = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 1,
                               cfg.vocab_size)
        ref = np.asarray(generate(iw, p, 6, max_len=32, mesh=mesh2))
        got = np.asarray(generate(iw_o, p, 6, max_len=32, mesh=mesh2))
        np.testing.assert_array_equal(ref, got)


def test_tp_overlap_train_step_matches_plain(mesh):
    """cfg.tp_overlap training: one dense train step under tp_mesh
    matches the plain step's loss/grads (overlap is a schedule change,
    not a math change)."""
    from spt_proto_tpu.config import tiny_config
    from spt_proto_tpu.parallel.overlap import tp_mesh
    from spt_proto_tpu.parallel.sharding import shard_params
    from spt_proto_tpu.tuning import surgery
    from spt_proto_tpu.tuning.trainer import (TrainState, make_optimizer,
                                              make_train_step)
    mesh2 = make_mesh(2, 4)
    cfg = tiny_config('opt', d_model=64, n_heads=4, d_feedforward=128)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    batch = {
        'inputs': np.random.RandomState(0).randint(
            0, cfg.vocab_size, (4, 16)).astype(np.int32),
        'targets': np.random.RandomState(1).randint(
            0, cfg.vocab_size, (4, 16)).astype(np.int32)}

    def run(cfg_run, use_ctx):
        tx = make_optimizer(params, lr=1e-3)
        import contextlib
        ctx = tp_mesh(mesh2) if use_ctx else contextlib.nullcontext()
        with mesh2, ctx:
            ps = shard_params(mesh2, params)
            state = TrainState(ps, tx.init(ps), jnp.zeros((), jnp.int32))
            step = jax.jit(make_train_step(cfg_run, tx))
            state, metrics = step(state, batch)
            jax.block_until_ready(metrics)
        return float(metrics['loss']), state

    loss_ref, st_ref = run(cfg, False)
    loss_ov, st_ov = run(cfg.replace(tp_overlap=True), True)
    assert abs(loss_ref - loss_ov) < 1e-5, (loss_ref, loss_ov)
    # parameters after one step agree too (grads flowed through the ring)
    fr = jax.tree.leaves(st_ref.params)
    fo = jax.tree.leaves(st_ov.params)
    for a, b in zip(fr, fo):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
