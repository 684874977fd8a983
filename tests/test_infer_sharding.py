"""Tensor-parallel serving tests: sharded prefill/decode numerically match
single-device, across dense and PQ-sparse configs, on a 2x4 virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.inference.engine import KVCache, decode_step, prefill
from spt_proto_tpu.inference.weights import InferenceWeights
from spt_proto_tpu.parallel.infer_sharding import (shard_cache,
                                                   shard_inference_weights)
from spt_proto_tpu.parallel.mesh import make_mesh
from spt_proto_tpu.tuning import surgery


@pytest.mark.parametrize('attention', ['dense', 'sparse_v2'])
def test_sharded_serving_matches_single_device(attention):
    kw = {}
    if attention == 'sparse_v2':
        kw = dict(attention='sparse_v2', d_codeword=4, n_codewords=8,
                  sparse_coeff=4)
    cfg = tiny_config('opt', **kw).replace(dtype=jnp.float32)
    cfg.validate()
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0,
                                cfg.vocab_size)

    # single device
    cache1 = KVCache.create(cfg, 4, 16, dtype=jnp.float32)
    lg1, cache1 = jax.jit(prefill)(iw, tokens, cache1)
    step = jax.jit(decode_step)
    tok = jnp.argmax(lg1[:, -1], -1).astype(jnp.int32)
    dec1, cache1 = step(iw, tok, cache1)

    # 2x4 mesh (data=2, model=4): heads 4 % 4 == 0
    mesh = make_mesh(2, 4)
    with mesh:
        iw_s = shard_inference_weights(mesh, iw)
        cache2 = shard_cache(mesh, KVCache.create(cfg, 4, 16,
                                                  dtype=jnp.float32))
        lg2, cache2 = jax.jit(prefill)(iw_s, tokens, cache2)
        dec2, cache2 = jax.jit(decode_step)(iw_s, tok, cache2)
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dec1), np.asarray(dec2),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(cache1.k), np.asarray(cache2.k),
                               atol=1e-5)


def test_weight_shardings_place_heads_on_model_axis():
    cfg = tiny_config('opt').replace(dtype=jnp.float32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    mesh = make_mesh(1, 8)
    iw_s = shard_inference_weights(mesh, iw)
    q = iw_s.params['blocks']['mha']['qkv']['kernel']   # fused [L,3,D,O]
    # output dim sharded 8-way (head-aligned for each of q/k/v)
    assert q.sharding.spec == jax.sharding.PartitionSpec(
        None, None, None, 'model')
    shard_shape = q.sharding.shard_shape(q.shape)
    assert shard_shape[-1] == q.shape[-1] // 8


def test_generate_mesh_matches_single_device():
    """generate(mesh=...) on a 2x4 mesh is token-for-token identical to
    single-device generate (TP sharding is an implementation detail)."""
    from spt_proto_tpu.inference.engine import generate
    cfg = tiny_config('opt').replace(dtype=jnp.float32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    prompts = jax.random.randint(jax.random.PRNGKey(2), (4, 6), 1,
                                 cfg.vocab_size)
    ref = np.asarray(generate(iw, prompts, 8, max_len=64))
    mesh = make_mesh(2, 4)
    got = np.asarray(generate(iw, prompts, 8, max_len=64, mesh=mesh))
    np.testing.assert_array_equal(ref, got)


@pytest.mark.parametrize('attention', ['dense', 'sparse_v2'])
def test_engine_mesh_matches_single_device(attention):
    """ContinuousBatchingEngine(mesh=...): completions on a 2x4 mesh are
    token-for-token identical to the unsharded engine, including cache
    growth and mixed admission order (the north-star 'continuous
    batching with tensor-sharded KV' wiring)."""
    from spt_proto_tpu.inference.batching import ContinuousBatchingEngine
    kw = {}
    if attention == 'sparse_v2':
        kw = dict(attention='sparse_v2', d_codeword=4, n_codewords=8,
                  sparse_coeff=4)
    cfg = tiny_config('opt', **kw).replace(dtype=jnp.float32)
    cfg.validate()
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    rng = np.random.RandomState(5)
    prompts = [list(map(int, rng.randint(1, cfg.vocab_size, size=n)))
               for n in (5, 9, 3)]

    def run(mesh):
        eng = ContinuousBatchingEngine(iw, n_slots=2, max_len=64,
                                       prefill_bucket=16, mesh=mesh)
        rids = [eng.submit(p, max_new_tokens=6) for p in prompts]
        done = {c.request_id: c.tokens for c in eng.run_until_done()}
        return [done[r] for r in rids]

    ref = run(None)
    got = run(make_mesh(2, 4))
    assert ref == got, (ref, got)


@pytest.mark.parametrize('attention', ['dense', 'sparse_v2'])
def test_engine_paged_mesh_matches_single_device(attention):
    """Paged cache x TP mesh: the page pools shard their head axis on
    'model' (shard_paged_cache); completions must be token-for-token
    identical to the unsharded paged engine, including lazy page growth
    (the 13B-rung composition VERDICT r4 flags as untested)."""
    from spt_proto_tpu.inference.batching import ContinuousBatchingEngine
    kw = {}
    if attention == 'sparse_v2':
        kw = dict(attention='sparse_v2', d_codeword=4, n_codewords=8,
                  sparse_coeff=4)
    cfg = tiny_config('opt', **kw).replace(dtype=jnp.float32)
    cfg.validate()
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    rng = np.random.RandomState(6)
    prompts = [list(map(int, rng.randint(1, cfg.vocab_size, size=n)))
               for n in (5, 9, 3)]

    def run(mesh):
        eng = ContinuousBatchingEngine(iw, n_slots=2, max_len=64,
                                       prefill_bucket=16, paged=True,
                                       page_size=16, mesh=mesh)
        rids = [eng.submit(p, max_new_tokens=6) for p in prompts]
        done = {c.request_id: c.tokens for c in eng.run_until_done()}
        return [done[r] for r in rids]

    ref = run(None)
    got = run(make_mesh(2, 4))
    assert ref == got, (ref, got)


@pytest.mark.parametrize('attention', ['dense', 'sparse_v2'])
def test_engine_speculative_mesh_matches_single_device(attention):
    """Speculative (n-gram propose + block verify) x TP mesh: lossless
    greedy completions must match the unsharded speculative engine
    (the other 13B-rung composition VERDICT r4 flags as untested)."""
    from spt_proto_tpu.inference.batching import ContinuousBatchingEngine
    kw = {}
    if attention == 'sparse_v2':
        kw = dict(attention='sparse_v2', d_codeword=4, n_codewords=8,
                  sparse_coeff=4)
    cfg = tiny_config('opt', **kw).replace(dtype=jnp.float32)
    cfg.validate()
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    rng = np.random.RandomState(7)
    base = list(map(int, rng.randint(1, cfg.vocab_size, size=4)))
    # repetitive prompts so n-gram proposals actually get accepted
    prompts = [base * 3, base * 2, list(map(
        int, rng.randint(1, cfg.vocab_size, size=5)))]

    def run(mesh):
        eng = ContinuousBatchingEngine(iw, n_slots=2, max_len=64,
                                       prefill_bucket=16, speculative=3,
                                       mesh=mesh)
        rids = [eng.submit(p, max_new_tokens=8) for p in prompts]
        done = {c.request_id: c.tokens for c in eng.run_until_done()}
        return [done[r] for r in rids], dict(eng.spec_stats)

    ref, st_ref = run(None)
    got, st_got = run(make_mesh(2, 4))
    assert ref == got, (ref, got)
    assert st_ref == st_got, (st_ref, st_got)


def test_generate_mesh_fused_front_matches_single_device():
    """The fused decode-front/tail/lm_head kernels under the TP mesh
    (GSPMD partitioning of pallas_call): token-for-token identical to
    single-device. Uses an l2-metric sparse model inside the fused-front
    envelope (the flagship serving config shape)."""
    from spt_proto_tpu.inference.engine import generate
    cfg = tiny_config('opt', d_model=128, n_heads=2, d_feedforward=256,
                      vocab_size=256, max_length=512).replace(
        dtype=jnp.float32, pq_metric='l2')
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    cfg, params = surgery.upgrade(cfg, params, 'mha_v1',
                                  jax.random.PRNGKey(1))
    cfg, params = surgery.upgrade(cfg, params, 'mha_v2',
                                  jax.random.PRNGKey(2))
    iw = InferenceWeights.from_params(cfg, params, dtype=jnp.float32)
    prompts = jax.random.randint(jax.random.PRNGKey(3), (4, 200), 1,
                                 cfg.vocab_size)
    ref = np.asarray(generate(iw, prompts, 6, max_len=256))
    mesh = make_mesh(4, 2)   # heads 2 % 2 == 0, batch 4 % 4 == 0
    got = np.asarray(generate(iw, prompts, 6, max_len=256, mesh=mesh))
    np.testing.assert_array_equal(ref, got)
