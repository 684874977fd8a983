"""Training checkpoint/resume tests: save/restore full train state,
resume continues from the saved step and matches uninterrupted training."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.tuning import surgery
from spt_proto_tpu.tuning.trainer import (TrainState, load_train_state,
                                          make_optimizer, make_train_step,
                                          save_train_state, train_loop)
from spt_proto_tpu.utils.tree import flatten


def batches(cfg, n, seed=0):
    r = np.random.RandomState(seed)
    for _ in range(n):
        x = r.randint(0, cfg.vocab_size, size=(4, 16)).astype(np.int32)
        yield {'inputs': x[:, :-1], 'targets': x[:, 1:]}


def test_save_restore_roundtrip(tmp_path):
    cfg = tiny_config('opt', vocab_size=64)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(params, freeze_base=False)
    step = jax.jit(make_train_step(cfg, tx, train_quantizer=False))
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    for b in batches(cfg, 3):
        state, _ = step(state, b)
    save_train_state(str(tmp_path / 'ck'), state)
    template = TrainState(params, tx.init(params),
                          jnp.zeros((), jnp.int32))
    restored = load_train_state(str(tmp_path / 'ck'), template)
    assert int(restored.step) == 3
    a = flatten(jax.device_get(state.params))
    b = flatten(jax.device_get(restored.params))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_resume_matches_uninterrupted(tmp_path):
    cfg = tiny_config('opt', vocab_size=64)
    params0 = surgery.init_params(cfg, jax.random.PRNGKey(0))
    ck = str(tmp_path / 'ck')

    # uninterrupted: 6 steps
    p_full, _ = train_loop(cfg, params0, batches(cfg, 6), lr=1e-3,
                           max_steps=6, freeze_base=False)

    # interrupted: 3 steps + checkpoint, then resume for 3 more on the
    # remaining data
    p_a, _ = train_loop(cfg, params0, batches(cfg, 6), lr=1e-3, max_steps=3,
                        freeze_base=False, checkpoint_dir=ck,
                        checkpoint_every=3)
    rest = list(batches(cfg, 6))[3:]
    p_b, _ = train_loop(cfg, params0, iter(rest), lr=1e-3, max_steps=3,
                        freeze_base=False, checkpoint_dir=ck, resume=True)

    a = flatten(jax.device_get(p_full))
    b = flatten(jax.device_get(p_b))
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)
