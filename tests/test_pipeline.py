"""Pipeline parallelism (GPipe over the 'pipe' mesh axis) tests.

The reference has no pipeline mode (SURVEY §2.8 marks PP optional; its
DeepSpeed config covers memory with ZeRO-3 instead). These tests prove the
TPU-native PP step — stacked-layer params sharded P('pipe', ...), batch
microbatched through lax.ppermute — is numerically equivalent to the plain
single-device train step, and that per-stage param memory actually shrinks.
"""
import jax
import jax.numpy as jnp
import numpy as np

from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.tuning import surgery
from spt_proto_tpu.tuning.trainer import (TrainState, make_optimizer,
                                          make_train_step,
                                          make_pp_train_step)
from spt_proto_tpu.utils.tree import flatten

from tests.test_train_e2e import make_batches


def _setup(n_layers=4, batch=8):
    cfg = tiny_config('opt', vocab_size=64, n_layers=n_layers)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    batch = next(make_batches(cfg, 1, batch=batch))
    return cfg, params, batch


def test_pp_matches_single_device():
    from spt_proto_tpu.parallel.mesh import make_mesh
    from spt_proto_tpu.parallel.sharding import batch_sharding, shard_params
    cfg, params, batch = _setup()
    tx = make_optimizer(params)

    step1 = make_train_step(cfg, tx, train_quantizer=False)
    state1 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    state1, m1 = jax.jit(step1)(state1, batch)

    mesh = make_mesh(2, 1, 1, 4)  # 2-way DP x 4-stage PP
    with mesh:
        sp = shard_params(mesh, params, pp=True)
        step2 = make_pp_train_step(cfg, tx, mesh, n_micro=2,
                                   train_quantizer=False)
        state2 = TrainState(sp, tx.init(sp), jnp.zeros((), jnp.int32))
        sb = jax.device_put(batch, batch_sharding(mesh))
        state2, m2 = jax.jit(step2)(state2, sb)
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=2e-5)
    a = flatten(jax.device_get(state1.params))
    b = flatten(jax.device_get(state2.params))
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=3e-5, err_msg=k)


def test_pp_sparse_model_with_aux_loss():
    """PP step on the full_upgrade (sparse+LoRA) flagship config: pq aux
    loss flows and matches the plain step."""
    from spt_proto_tpu.parallel.mesh import make_mesh
    from spt_proto_tpu.parallel.sharding import batch_sharding, shard_params
    cfg = tiny_config('opt', vocab_size=64, n_layers=2)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    cfg, params = surgery.full_upgrade(cfg, params, jax.random.PRNGKey(1),
                                       d_lora=4, ffn_block_size=32)
    batch = next(make_batches(cfg, 1, batch=8))
    tx = make_optimizer(params)

    step1 = make_train_step(cfg, tx, train_quantizer=True)
    state1 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    _, m1 = jax.jit(step1)(state1, batch)

    mesh = make_mesh(4, 1, 1, 2)
    with mesh:
        sp = shard_params(mesh, params, pp=True)
        step2 = make_pp_train_step(cfg, tx, mesh, n_micro=2,
                                   train_quantizer=True)
        state2 = TrainState(sp, tx.init(sp), jnp.zeros((), jnp.int32))
        sb = jax.device_put(batch, batch_sharding(mesh))
        _, m2 = jax.jit(step2)(state2, sb)
    assert float(m2['pq_loss']) > 0.0
    np.testing.assert_allclose(float(m1['pq_loss']), float(m2['pq_loss']),
                               rtol=2e-5)
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=2e-5)


def test_pp_tp_composes():
    """PP x TP x DP on one mesh (2 data x 2 model x 2 pipe): the pipeline
    region is manual only over (data, pipe), 'model' stays a shard_map
    AUTO axis, so XLA partitions each stage's block math over heads/FFN
    blocks per the params' 'model' shardings. Step must match the plain
    single-device step, and per-device block shards must shrink by BOTH
    the pipe and model factors."""
    from spt_proto_tpu.parallel.mesh import make_mesh
    from spt_proto_tpu.parallel.sharding import batch_sharding, shard_params
    cfg, params, batch = _setup()
    tx = make_optimizer(params)

    step1 = make_train_step(cfg, tx, train_quantizer=False)
    state1 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    state1, m1 = jax.jit(step1)(state1, batch)

    mesh = make_mesh(2, 2, 1, 2)  # DP x TP x PP
    with mesh:
        sp = shard_params(mesh, params, pp=True)
        # q kernel [L, d_model, d_model]: pipe on L, model on the head dim
        qk = flatten(sp)['blocks/mha/q/kernel']
        shard = qk.sharding.shard_shape(qk.shape)
        assert shard[0] == qk.shape[0] // 2 and shard[2] == qk.shape[2] // 2
        step2 = make_pp_train_step(cfg, tx, mesh, n_micro=2,
                                   train_quantizer=False)
        state2 = TrainState(sp, tx.init(sp), jnp.zeros((), jnp.int32))
        sb = jax.device_put(batch, batch_sharding(mesh))
        state2, m2 = jax.jit(step2)(state2, sb)
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=2e-5)
    a = flatten(jax.device_get(state1.params))
    b = flatten(jax.device_get(state2.params))
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=3e-5, err_msg=k)


def test_tune_cli_pipeline_mode(tmp_path, capsys):
    """tune CLI drives PP end-to-end: --mesh_pipe 2 on the 8-device
    virtual mesh (4 data x 2 pipe), full surgery pipeline."""
    from spt_proto_tpu.cli import tune
    from spt_proto_tpu.config import tiny_config
    from spt_proto_tpu.utils import checkpoint as ckpt_io
    ck = str(tmp_path / 'base')
    cfg = tiny_config('opt', vocab_size=64)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    ckpt_io.save_checkpoint(ck, cfg, params)
    out = str(tmp_path / 'tuned')
    tune.main(['--ckpt', ck, '--out', out, '--steps', '3',
               '--d_lora', '4', '--seq_length', '33', '--batch_size', '8',
               '--mesh_data', '4', '--mesh_pipe', '2', '--pp_micro', '2',
               '--stages', 'lora'])
    import json
    lines = capsys.readouterr().out.strip().splitlines()
    final = json.loads(lines[-1])
    assert final['delta_params'] > 0
    step0 = json.loads(lines[0])
    assert np.isfinite(step0['loss'])


def test_train_loop_ep_mode():
    """train_loop auto-enters the ep_mesh context for cfg.ffn_impl='ep'."""
    from spt_proto_tpu.parallel.mesh import make_mesh
    from spt_proto_tpu.tuning.trainer import train_loop
    cfg = tiny_config('opt', vocab_size=64, d_feedforward=128)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    cfg, params = surgery.full_upgrade(cfg, params, jax.random.PRNGKey(1),
                                       d_lora=4, ffn_block_size=16)
    cfg = cfg.replace(ffn_impl='ep')
    mesh = make_mesh(8, 1)
    with mesh:
        params, history = train_loop(
            cfg, params, make_batches(cfg, 3, batch=8, seq=33),
            lr=1e-3, max_steps=3, log_every=1, mesh=mesh)
    assert all(np.isfinite(m['loss']) for _, m in history)


def test_pp_param_memory_shrinks_per_stage():
    """Each pipe rank stores only n_layers/n_pipe of the stacked params."""
    from spt_proto_tpu.parallel.mesh import make_mesh
    from spt_proto_tpu.parallel.sharding import shard_params
    cfg, params, _ = _setup()
    mesh = make_mesh(2, 1, 1, 4)
    with mesh:
        sp = shard_params(mesh, params, pp=True)
    blocks = flatten(sp)
    stacked = {k: v for k, v in blocks.items() if k.startswith('blocks')}
    assert stacked
    for k, v in stacked.items():
        local = v.sharding.shard_shape(v.shape)
        assert local[0] == v.shape[0] // 4, (k, v.shape, local)
