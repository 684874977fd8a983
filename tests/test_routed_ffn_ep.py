"""Expert-parallel routed FFN: distributed dispatch == single-device math.

The EP path (ops/routed_ffn_ep.py) exchanges routed tokens over a mesh
axis with all_to_all; with no capacity overflow it must match the masked
oracle (ops/routed_ffn.py) exactly, values and gradients, and the full
model must train identically with ffn_impl='ep'.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spt_proto_tpu.ops import routed_ffn as rops
from spt_proto_tpu.ops import routed_ffn_ep as eps
from spt_proto_tpu.parallel.mesh import make_mesh

T, D, N, BS = 64, 16, 8, 12   # tokens, d_model, blocks, block hidden
TOPK = 3
R = 4                         # lora rank


def _inputs(seed=0):
    r = np.random.RandomState(seed)
    f = lambda *s: jnp.asarray(r.randn(*s).astype(np.float32))
    x = f(T, D)
    probs = jax.nn.sigmoid(f(T, N))
    w1, b1, w2, b2 = f(N, D, BS), f(N, BS) * 0.1, f(N, BS, D), f(D) * 0.1
    lora = (f(D, R) * 0.3, f(N, BS, R) * 0.3, f(N, BS, R) * 0.3,
            f(D, R) * 0.3)
    return x, probs, (w1, b1, w2, b2), lora


def test_ep_matches_masked_oracle():
    x, probs, (w1, b1, w2, b2), _ = _inputs()
    mesh = make_mesh(8, 1)
    ref = rops.routed_ffn_masked(x, probs, TOPK, w1, b1, w2, b2,
                                 jax.nn.relu)
    with mesh:
        got = jax.jit(lambda *a: eps.routed_ffn_ep(
            a[0], a[1], TOPK, *a[2:], jax.nn.relu, mesh=mesh, axis='data',
            capacity_factor=4.0))(x, probs, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5)


def test_ep_lora_matches_oracle_and_grads():
    x, probs, (w1, b1, w2, b2), (l1, r1, l2, r2) = _inputs(1)
    mesh = make_mesh(8, 1)

    def loss_ref(w1, r1):
        y = rops.routed_ffn_lora(x, probs, TOPK, w1, b1, w2, b2,
                                 l1, r1, l2, r2, jax.nn.relu)
        return jnp.sum(y ** 2), y

    def loss_ep(w1, r1):
        y = eps.routed_ffn_lora_ep(x, probs, TOPK, w1, b1, w2, b2,
                                   l1, r1, l2, r2, jax.nn.relu,
                                   mesh=mesh, axis='data',
                                   capacity_factor=4.0)
        return jnp.sum(y ** 2), y

    (lr, yr), gr = jax.value_and_grad(loss_ref, argnums=(0, 1),
                                      has_aux=True)(w1, r1)
    with mesh:
        (le, ye), ge = jax.jit(jax.value_and_grad(
            loss_ep, argnums=(0, 1), has_aux=True))(w1, r1)
    np.testing.assert_allclose(np.asarray(ye), np.asarray(yr), atol=2e-5)
    np.testing.assert_allclose(float(le), float(lr), rtol=1e-5)
    for a, b in zip(ge, gr):
        # grads reach ~1e3 magnitude (sum-of-squares loss); scatter-add
        # ordering differs across devices, so compare relative
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=2e-3)


def test_ep_capacity_overflow_drops_gracefully():
    """All tokens route to block 0 with capacity_factor 1 — output must
    stay finite (dropped slots contribute zero, loudly)."""
    x, _, (w1, b1, w2, b2), _ = _inputs(2)
    probs = jnp.zeros((T, N)).at[:, 0].set(1.0) + 1e-4
    mesh = make_mesh(8, 1)
    with mesh:
        y = jax.jit(lambda *a: eps.routed_ffn_ep(
            a[0], a[1], 1, *a[2:], jax.nn.relu, mesh=mesh, axis='data',
            capacity_factor=1.0))(x, probs, w1, b1, w2, b2)
    assert np.all(np.isfinite(np.asarray(y)))


def test_ep_model_train_step_matches_plain():
    """Full model with ffn_impl='ep' trains identically to the masked
    impl (one step, sparse+LoRA flagship config)."""
    from spt_proto_tpu.config import tiny_config
    from spt_proto_tpu.parallel.sharding import batch_sharding
    from spt_proto_tpu.tuning import surgery
    from spt_proto_tpu.tuning.trainer import (TrainState, make_optimizer,
                                              make_train_step)
    from spt_proto_tpu.utils.tree import flatten
    from tests.test_train_e2e import make_batches

    cfg = tiny_config('opt', vocab_size=64, d_feedforward=128)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    cfg, params = surgery.full_upgrade(cfg, params, jax.random.PRNGKey(1),
                                       d_lora=4, ffn_block_size=16)
    batch = next(make_batches(cfg, 1, batch=8, seq=33))  # T=8*32 % 8 == 0
    tx = make_optimizer(params)

    step1 = make_train_step(cfg, tx, train_quantizer=True)
    state1 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    state1, m1 = jax.jit(step1)(state1, batch)

    cfg_ep = cfg.replace(ffn_impl='ep')
    mesh = make_mesh(8, 1)
    with mesh, eps.ep_mesh(mesh, axis='data'):
        step2 = make_train_step(cfg_ep, tx, train_quantizer=True)
        state2 = TrainState(params, tx.init(params),
                            jnp.zeros((), jnp.int32))
        sb = jax.device_put(batch, batch_sharding(mesh))
        state2, m2 = jax.jit(step2)(state2, sb)
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=2e-5)
    a = flatten(jax.device_get(state1.params))
    b = flatten(jax.device_get(state2.params))
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=5e-5, err_msg=k)


def test_ep_gated_matches_oracle():
    x, probs, (w1, _, w2, _), (l1, r1, l2, r2) = _inputs(3)
    wg, ws, wd = w1, w1 * 0.7 + 0.1, w2      # [N,D,BS]x2, [N,BS,D]
    mesh = make_mesh(8, 1)
    ref = rops.routed_ffn_gated_masked(x, probs, TOPK, wg, ws, wd,
                                       jax.nn.silu)
    with mesh:
        got = jax.jit(lambda *a: eps.routed_ffn_gated_ep(
            a[0], a[1], TOPK, *a[2:], jax.nn.silu, mesh=mesh,
            axis='data', capacity_factor=4.0))(x, probs, wg, ws, wd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    # LoRA gated variant
    lora6 = (l1, r1, l1 * 0.5, r1 * 0.5, l2, r2)
    ref2 = rops.routed_ffn_gated_lora(x, probs, TOPK, wg, ws, wd,
                                      *lora6, jax.nn.silu)
    with mesh:
        got2 = jax.jit(lambda *a: eps.routed_ffn_gated_lora_ep(
            a[0], a[1], TOPK, *a[2:], jax.nn.silu, mesh=mesh,
            axis='data', capacity_factor=4.0))(x, probs, wg, ws, wd,
                                               *lora6)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               atol=1e-4, rtol=1e-4)


def test_ep_llama_model_matches_plain():
    """LLaMA (gated) model with ffn_impl='ep' forward-matches masked."""
    from spt_proto_tpu.config import tiny_config
    from spt_proto_tpu.models.decoder import DecoderLM
    from spt_proto_tpu.parallel.sharding import batch_sharding
    from spt_proto_tpu.tuning import surgery

    cfg = tiny_config('llama', vocab_size=64, d_feedforward=128).replace(
        ffn='routed', ffn_block_size=16, d_lora=4)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    tokens = jnp.asarray(
        np.random.RandomState(0).randint(0, 64, (8, 32)), jnp.int32)
    ref = DecoderLM(cfg=cfg).apply({'params': params}, tokens)

    mesh = make_mesh(8, 1)
    cfg_ep = cfg.replace(ffn_impl='ep')
    with mesh, eps.ep_mesh(mesh, axis='data'):
        st = jax.device_put(tokens, batch_sharding(mesh))
        got = jax.jit(lambda p, t: DecoderLM(cfg=cfg_ep).apply(
            {'params': p}, t))(params, st)
    np.testing.assert_allclose(np.asarray(got['logits']),
                               np.asarray(ref['logits']), atol=2e-5)


def test_ep_requires_context():
    from spt_proto_tpu.config import tiny_config
    from spt_proto_tpu.tuning import surgery
    cfg = tiny_config('opt', vocab_size=64, d_feedforward=128).replace(
        ffn='routed', ffn_block_size=16, ffn_impl='ep')
    with pytest.raises(RuntimeError, match='ep_mesh'):
        surgery.init_params(cfg, jax.random.PRNGKey(0))
