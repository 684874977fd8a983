"""End-to-end training tests: loss decreases on the full SPT pipeline,
frozen params stay frozen, sharded training matches single-device."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.tuning import surgery
from spt_proto_tpu.tuning.partition import trainable_mask
from spt_proto_tpu.tuning.trainer import (TrainState, make_optimizer,
                                          make_train_step, train_loop)
from spt_proto_tpu.utils.tree import flatten


def make_batches(cfg, n, batch=4, seq=32, seed=0):
    r = np.random.RandomState(seed)
    # a learnable synthetic language: token t+1 = (t*3+1) % V with noise
    for _ in range(n):
        x = np.zeros((batch, seq), np.int32)
        x[:, 0] = r.randint(0, cfg.vocab_size, size=batch)
        for j in range(1, seq):
            x[:, j] = (x[:, j - 1] * 3 + 1) % cfg.vocab_size
        yield {'inputs': x[:, :-1], 'targets': x[:, 1:]}


def test_sparse_training_loss_decreases():
    cfg = tiny_config('opt', vocab_size=64)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    cfg, params = surgery.full_upgrade(cfg, params, jax.random.PRNGKey(1),
                                       d_lora=4, ffn_block_size=32)
    params, history = train_loop(cfg, params, make_batches(cfg, 60),
                                 lr=3e-3, max_steps=60, log_every=1)
    losses = [m['ce'] for _, m in history]
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])
    assert all(np.isfinite(l) for l in losses)


def test_frozen_params_unchanged_lora_trained():
    cfg = tiny_config('opt', vocab_size=64)
    params0 = surgery.init_params(cfg, jax.random.PRNGKey(0))
    cfg, params = surgery.full_upgrade(cfg, params0, jax.random.PRNGKey(1),
                                       d_lora=4, ffn_block_size=32)
    before = flatten(jax.device_get(params))
    params, _ = train_loop(cfg, params, make_batches(cfg, 10), lr=1e-2,
                           max_steps=10)
    after = flatten(jax.device_get(params))
    mask = flatten(trainable_mask(params))
    changed = {k for k in before
               if not np.allclose(before[k], after[k])}
    for k in before:
        if mask[k]:
            continue
        assert k not in changed, f'frozen param {k} changed'
    # at least lora_right and router and codebook actually trained
    assert any('lora_right' in k for k in changed)
    assert any('router' in k for k in changed)
    assert any('codebook' in k for k in changed)


def test_pq_aux_loss_flows():
    cfg = tiny_config('opt', vocab_size=64)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    cfg, params = surgery.full_upgrade(cfg, params, jax.random.PRNGKey(1),
                                       d_lora=4, ffn_block_size=32)
    tx = make_optimizer(params)
    step = jax.jit(make_train_step(cfg, tx, train_quantizer=True))
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    batch = next(make_batches(cfg, 1))
    state, metrics = step(state, batch)
    assert float(metrics['pq_loss']) > 0.0
    # trigger off => no aux loss
    step0 = jax.jit(make_train_step(cfg, tx, train_quantizer=False))
    _, metrics0 = step0(state, batch)
    assert float(metrics0['pq_loss']) == 0.0


def test_sharded_training_matches_single_device():
    """pjit with the canonical shardings must be numerically identical to
    single-device training (collectives are an implementation detail)."""
    from spt_proto_tpu.parallel.mesh import make_mesh
    from spt_proto_tpu.parallel.sharding import batch_sharding, shard_params
    cfg = tiny_config('opt', vocab_size=64).replace(
        attention='sparse_v2', d_codeword=4, n_codewords=8, sparse_coeff=4,
        ffn='routed', ffn_block_size=32, d_lora=4)
    cfg.validate()
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(params)
    batch = next(make_batches(cfg, 1))
    step = make_train_step(cfg, tx, train_quantizer=True)

    state1 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    state1, m1 = jax.jit(step)(state1, batch)

    mesh = make_mesh(2, 4)
    with mesh:
        sp = shard_params(mesh, params)
        state2 = TrainState(sp, tx.init(sp), jnp.zeros((), jnp.int32))
        sb = jax.device_put(batch, batch_sharding(mesh))
        state2, m2 = jax.jit(step)(state2, sb)
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=2e-5)
    a = flatten(jax.device_get(state1.params))
    b = flatten(jax.device_get(state2.params))
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=2e-5, err_msg=k)


def test_grad_accumulation_matches_large_batch():
    """accumulate=A on an A*B batch produces the SAME parameter update as
    a single A*B-batch step (equal unmasked micro-batches => mean-of-means
    is exact), at 1/A the activation memory. Ref: Lightning
    accumulate_grad_batches (4-sparse-tuning-0.py:186)."""
    cfg = tiny_config('opt', vocab_size=64)
    params0 = surgery.init_params(cfg, jax.random.PRNGKey(0))
    cfg, params = surgery.full_upgrade(cfg, params0, jax.random.PRNGKey(1),
                                       d_lora=4, ffn_block_size=32)
    batch = next(make_batches(cfg, 1, batch=8, seq=24))
    # SGD: the update is LINEAR in the grads, so update-equivalence tests
    # grad-equivalence directly (Adam's first step is ±lr·sign(grad) and
    # amplifies fp summation-order noise on near-zero grads)
    import optax
    tx = optax.sgd(1e-2)
    mask = trainable_mask(params)
    f0 = flatten(jax.device_get(params))

    def run(accumulate):
        p = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        step = jax.jit(make_train_step(cfg, tx, trainable=mask,
                                       accumulate=accumulate))
        st = TrainState(p, tx.init(p), jnp.zeros((), jnp.int32))
        st, metrics = step(st, batch)
        return flatten(jax.device_get(st.params)), \
            {k: float(v) for k, v in metrics.items()}

    f1, m1 = run(1)
    f4, m4 = run(4)
    assert np.isclose(m1['ce'], m4['ce'], rtol=1e-5), (m1, m4)
    for k in f1:
        d1 = np.asarray(f1[k], np.float64) - np.asarray(f0[k], np.float64)
        d4 = np.asarray(f4[k], np.float64) - np.asarray(f0[k], np.float64)
        scale = max(np.abs(d1).max(), 1e-12)
        np.testing.assert_allclose(d1 / scale, d4 / scale, atol=1e-4,
                                   err_msg=k)


def test_grad_accumulation_train_loop_mesh():
    """train_loop(accumulate=A) under a DP mesh: runs, loss finite, and
    matches the unaccumulated loop's first-step CE (same effective
    batch)."""
    if len(jax.devices()) < 2:
        pytest.skip('needs multi-device CPU mesh')
    from spt_proto_tpu.parallel.mesh import make_mesh
    cfg = tiny_config('opt', vocab_size=64)
    params0 = surgery.init_params(cfg, jax.random.PRNGKey(0))
    cfg, params = surgery.full_upgrade(cfg, params0, jax.random.PRNGKey(1),
                                       d_lora=4, ffn_block_size=32)
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    _, hist_acc = train_loop(cfg, params,
                             make_batches(cfg, 4, batch=8, seq=24),
                             lr=1e-3, max_steps=4, log_every=1,
                             mesh=mesh, accumulate=2)
    _, hist_ref = train_loop(cfg, params,
                             make_batches(cfg, 4, batch=8, seq=24),
                             lr=1e-3, max_steps=4, log_every=1, mesh=mesh)
    assert np.isclose(hist_acc[0][1]['ce'], hist_ref[0][1]['ce'],
                      rtol=1e-5)
    assert all(np.isfinite(m['ce']) for _, m in hist_acc)
