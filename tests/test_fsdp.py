"""ZeRO-3-equivalent (FSDP) sharding: params + optimizer state partitioned
across the 'data' axis. Counterpart of the reference's DeepSpeed ZeRO-3
training mode (script/4-sparse-tuning-1.py:172-175): per-device parameter
and optimizer-state memory must shrink ~linearly with DP width while the
training step stays numerically identical to single-device."""
import jax
import jax.numpy as jnp
import numpy as np

from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.parallel.mesh import make_mesh
from spt_proto_tpu.parallel.sharding import (batch_sharding, param_specs,
                                             shard_params)
from spt_proto_tpu.tuning import surgery
from spt_proto_tpu.tuning.trainer import (TrainState, make_optimizer,
                                          make_train_step)
from spt_proto_tpu.utils.tree import flatten
from tests.test_train_e2e import make_batches


def _shard_bytes(tree) -> int:
    """Per-device addressable bytes of every leaf (shard 0)."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        shape = leaf.sharding.shard_shape(leaf.shape)
        total += int(np.prod(shape)) * leaf.dtype.itemsize
    return total


def _total_bytes(tree) -> int:
    return sum(int(np.prod(l.shape)) * l.dtype.itemsize
               for l in jax.tree.leaves(tree))


def test_fsdp_specs_use_data_axis():
    cfg = tiny_config('opt', n_layers=4)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    specs = flatten(param_specs(params, fsdp=True))
    # every stacked block param shards its layer axis on 'data'
    for path, spec in specs.items():
        if path.startswith('blocks/'):
            assert spec[0] == 'data', (path, spec)
    assert specs['lm_head/kernel'][0] == 'data'
    # plain mode never mentions 'data'
    for path, spec in flatten(param_specs(params, fsdp=False)).items():
        assert 'data' not in tuple(spec), (path, spec)


def test_fsdp_memory_shrinks_with_dp_width():
    cfg = tiny_config('opt', n_layers=8, vocab_size=64)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(params, freeze_base=False)
    mesh = make_mesh(4, 2)      # data=4, model=2
    with mesh:
        sp = shard_params(mesh, params, fsdp=True)
        opt = tx.init(sp)
    # per-device param + opt-state memory ~ total / (data * model) for the
    # block-dominated tree; allow slack for replicated norms/bias leaves
    total = _total_bytes(sp) + _total_bytes(opt)
    per_dev = _shard_bytes(sp) + _shard_bytes(opt)
    assert per_dev < total / 4, (per_dev, total)
    # and strictly smaller than TP-only sharding (the ZeRO win itself)
    with mesh:
        sp_tp = shard_params(mesh, params, fsdp=False)
        opt_tp = tx.init(sp_tp)
    per_dev_tp = _shard_bytes(sp_tp) + _shard_bytes(opt_tp)
    assert per_dev < 0.5 * per_dev_tp, (per_dev, per_dev_tp)
    # the stacked-layer axis is the shard axis: 8 layers over 4 ranks -> 2
    leaf = sp['blocks']['mha']['q']['kernel']
    assert leaf.sharding.shard_shape(leaf.shape)[0] == 2
    mu = opt[1][0].mu if hasattr(opt[1][0], 'mu') else None
    if mu is not None:
        m = mu['blocks']['mha']['q']['kernel']
        assert m.sharding.shard_shape(m.shape)[0] == 2


def test_fsdp_training_matches_single_device():
    """The FSDP-sharded step must be numerically identical to the
    single-device step — sharding is an implementation detail."""
    cfg = tiny_config('opt', vocab_size=64, n_layers=4).replace(
        attention='sparse_v2', d_codeword=4, n_codewords=8, sparse_coeff=4,
        ffn='routed', ffn_block_size=32, d_lora=4)
    cfg.validate()
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(params)
    batch = next(make_batches(cfg, 1))
    step = make_train_step(cfg, tx, train_quantizer=True)

    state1 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    state1, m1 = jax.jit(step)(state1, batch)

    mesh = make_mesh(4, 2)
    with mesh:
        sp = shard_params(mesh, params, fsdp=True)
        state2 = TrainState(sp, tx.init(sp), jnp.zeros((), jnp.int32))
        sb = jax.device_put(batch, batch_sharding(mesh))
        state2, m2 = jax.jit(step)(state2, sb)
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=2e-5)
    a = flatten(jax.device_get(state1.params))
    b = flatten(jax.device_get(state2.params))
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=2e-5, err_msg=k)


def test_fsdp_non_divisible_layers_still_shards():
    """12 layers over 8-way DP (the flagship OPT-125M shape): the layer
    axis can't shard, so 'data' must fall back to a dividing feature dim
    — per-device memory still shrinks instead of silently replicating."""
    cfg = tiny_config('opt', n_layers=3, vocab_size=64)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(2, 4)          # data=2 does not divide n_layers=3
    with mesh:
        sp = shard_params(mesh, params, fsdp=True)
    leaf = sp['blocks']['mha']['q']['kernel']      # [3, D, D]
    spec = leaf.sharding.spec
    assert 'data' in jax.tree.leaves(tuple(spec)), spec
    assert leaf.sharding.shard_shape(leaf.shape) != leaf.shape
    # parity: the fallback sharding is still numerically a no-op
    tx = make_optimizer(params, freeze_base=False)
    batch = next(make_batches(cfg, 1))
    step = make_train_step(cfg, tx)
    s1 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    s1, m1 = jax.jit(step)(s1, batch)
    with mesh:
        s2 = TrainState(sp, tx.init(sp), jnp.zeros((), jnp.int32))
        sb = jax.device_put(batch, batch_sharding(mesh))
        s2, m2 = jax.jit(step)(s2, sb)
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=2e-5)


def test_fsdp_warns_when_nothing_shards():
    """If a requested shard axis can't land anywhere, the user hears
    about it instead of silently training replicated."""
    import warnings
    cfg = tiny_config('opt', n_layers=3, vocab_size=63)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    # prime-ish dims: 'data'=5 divides nothing in the tiny tree
    mesh = make_mesh(5, 1, devices=np.asarray(jax.devices()[:5]))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        with mesh:
            shard_params(mesh, params, fsdp=True)
    msgs = [str(x.message) for x in w
            if issubclass(x.category, RuntimeWarning)]
    assert any('could not be sharded' in m for m in msgs), msgs
