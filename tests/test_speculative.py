"""Speculative decoding tests: block verify == sequential decode,
greedy speculative generate == greedy vanilla generate (the lossless-
acceleration invariant), rollback across draft quality / sparse /
quantized / ragged / eos configurations."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spt_proto_tpu.config import tiny_config
from spt_proto_tpu.inference.engine import (KVCache, decode_step, generate,
                                            prefill, verify_step)
from spt_proto_tpu.inference.speculative import (generate_speculative,
                                                 ngram_propose)
from spt_proto_tpu.inference.weights import InferenceWeights
from spt_proto_tpu.tuning import surgery


def setup_model(arch='opt', seed=0, **kw):
    cfg = tiny_config(arch, **kw).replace(dtype=jnp.float32)
    params = surgery.init_params(cfg, jax.random.PRNGKey(seed))
    return cfg, InferenceWeights.from_params(cfg, params, dtype=jnp.float32)


SPARSE = dict(attention='sparse_v2', d_codeword=4, n_codewords=8,
              sparse_coeff=4)


@pytest.mark.parametrize('impl', ['kernel', 'jnp'])
@pytest.mark.parametrize('arch,kw', [
    ('opt', {}),
    ('llama', {}),
    ('opt', SPARSE),
], ids=['opt-dense', 'llama-dense', 'opt-sparse'])
def test_verify_step_matches_sequential_decode(arch, kw, impl):
    """One K-column verify block must reproduce K sequential decode_step
    logits AND leave the same cache behind — via the fused Pallas verify
    kernel (interpret mode off-TPU) and the jnp fallback."""
    cfg, iw = setup_model(arch, **kw)
    rng = jax.random.PRNGKey(1)
    prompts = jax.random.randint(rng, (2, 8), 0, cfg.vocab_size)
    kk = 4
    block = jax.random.randint(jax.random.PRNGKey(2), (2, kk), 0,
                               cfg.vocab_size)

    cache_a = KVCache.create(cfg, 2, 32, dtype=jnp.float32)
    _, cache_a = jax.jit(prefill)(iw, prompts, cache_a)
    seq_logits = []
    step = jax.jit(decode_step)
    for j in range(kk):
        lg, cache_a = step(iw, block[:, j], cache_a)
        seq_logits.append(lg)
    seq_logits = jnp.stack(seq_logits, axis=1)            # [B, K, V]

    cache_b = KVCache.create(cfg, 2, 32, dtype=jnp.float32)
    _, cache_b = jax.jit(prefill)(iw, prompts, cache_b)
    blk_logits, cache_b = jax.jit(verify_step,
                                  static_argnames=('impl',))(
        iw, block, cache_b, impl=impl)

    np.testing.assert_allclose(np.asarray(blk_logits),
                               np.asarray(seq_logits), atol=5e-4)
    np.testing.assert_array_equal(np.asarray(cache_a.length),
                                  np.asarray(cache_b.length))
    np.testing.assert_allclose(np.asarray(cache_a.k), np.asarray(cache_b.k),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(cache_a.v), np.asarray(cache_b.v),
                               atol=5e-5)
    np.testing.assert_array_equal(np.asarray(cache_a.codes),
                                  np.asarray(cache_b.codes))


@pytest.mark.parametrize('impl', ['kernel', 'jnp'])
def test_verify_step_across_tile_boundary_sparse(impl):
    """Block verify spanning a 128-token tile boundary: mid-block, a tile
    fills up and becomes eligible for PQ selection — parity with the
    sequential path must hold through the transition."""
    cfg, iw = setup_model('opt', **SPARSE)
    s0 = 250
    prompts = jax.random.randint(jax.random.PRNGKey(3), (1, s0), 0,
                                 cfg.vocab_size)
    kk = 10                                   # 250 -> 260 crosses 256
    block = jax.random.randint(jax.random.PRNGKey(4), (1, kk), 0,
                               cfg.vocab_size)
    cache_a = KVCache.create(cfg, 1, 512, dtype=jnp.float32)
    _, cache_a = jax.jit(prefill)(iw, prompts, cache_a)
    step = jax.jit(decode_step)
    seq_logits = []
    for j in range(kk):
        lg, cache_a = step(iw, block[:, j], cache_a)
        seq_logits.append(lg)
    seq_logits = jnp.stack(seq_logits, axis=1)
    cache_b = KVCache.create(cfg, 1, 512, dtype=jnp.float32)
    _, cache_b = jax.jit(prefill)(iw, prompts, cache_b)
    blk_logits, cache_b = jax.jit(verify_step,
                                  static_argnames=('impl',))(
        iw, block, cache_b, impl=impl)
    np.testing.assert_allclose(np.asarray(blk_logits),
                               np.asarray(seq_logits), atol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(blk_logits, -1)),
        np.asarray(jnp.argmax(seq_logits, -1)))


def test_verify_step_quantized_matches_sequential():
    cfg, iw = setup_model('opt')
    prompts = jax.random.randint(jax.random.PRNGKey(5), (2, 8), 0,
                                 cfg.vocab_size)
    block = jax.random.randint(jax.random.PRNGKey(6), (2, 3), 0,
                               cfg.vocab_size)
    cache_a = KVCache.create(cfg, 2, 32, dtype=jnp.float32, quantized=True)
    _, cache_a = jax.jit(prefill)(iw, prompts, cache_a)
    step = jax.jit(decode_step)
    seq = []
    for j in range(3):
        lg, cache_a = step(iw, block[:, j], cache_a)
        seq.append(lg)
    cache_b = KVCache.create(cfg, 2, 32, dtype=jnp.float32, quantized=True)
    _, cache_b = jax.jit(prefill)(iw, prompts, cache_b)
    blk, cache_b = jax.jit(verify_step)(iw, block, cache_b)
    np.testing.assert_allclose(np.asarray(blk),
                               np.asarray(jnp.stack(seq, 1)), atol=2e-3)
    np.testing.assert_allclose(np.asarray(cache_a.k_scale),
                               np.asarray(cache_b.k_scale), atol=1e-6)


@pytest.mark.parametrize('arch,kw', [
    ('opt', {}),
    ('opt', SPARSE),
    ('llama', dict(n_kv_heads=2)),
], ids=['opt-dense', 'opt-sparse', 'llama-gqa'])
def test_speculative_self_draft_matches_generate(arch, kw):
    """Draft == target: every proposal is accepted and the output equals
    vanilla greedy generate exactly."""
    cfg, iw = setup_model(arch, **kw)
    prompts = jax.random.randint(jax.random.PRNGKey(7), (2, 6), 0,
                                 cfg.vocab_size)
    max_len = 64
    ref = np.asarray(generate(iw, prompts, 12, max_len=max_len))
    out, stats = generate_speculative(iw, prompts, 12, draft=iw, k=4,
                                      max_len=max_len)
    np.testing.assert_array_equal(np.asarray(out), ref)
    assert stats['acceptance'] > 0.99, stats


@pytest.mark.parametrize('arch,kw', [
    ('opt', {}),
    ('opt', SPARSE),
], ids=['opt-dense', 'opt-sparse'])
def test_speculative_ngram_matches_generate(arch, kw):
    cfg, iw = setup_model(arch, **kw)
    # repetitive prompt so the n-gram draft gets SOME acceptances
    prompts = jnp.asarray(
        np.tile(np.arange(5, dtype=np.int32), (2, 3))[:, :12])
    max_len = 64
    ref = np.asarray(generate(iw, prompts, 10, max_len=max_len))
    out, stats = generate_speculative(iw, prompts, 10, draft=None, k=3,
                                      max_len=max_len)
    np.testing.assert_array_equal(np.asarray(out), ref)
    assert stats['rounds'] >= 1


def test_speculative_weak_draft_still_exact():
    """A mismatched draft model exercises rejection + rollback on every
    round; the output must STILL equal vanilla greedy generate."""
    cfg, iw = setup_model('opt')
    _, draft = setup_model('opt', seed=99)   # different random weights
    prompts = jax.random.randint(jax.random.PRNGKey(8), (2, 5), 0,
                                 cfg.vocab_size)
    max_len = 64
    ref = np.asarray(generate(iw, prompts, 10, max_len=max_len))
    out, stats = generate_speculative(iw, prompts, 10, draft=draft, k=4,
                                      max_len=max_len)
    np.testing.assert_array_equal(np.asarray(out), ref)
    assert stats['acceptance'] < 0.9, stats   # random drafts mostly miss


def test_speculative_quantized_kv_matches_generate():
    cfg, iw = setup_model('opt')
    prompts = jax.random.randint(jax.random.PRNGKey(9), (2, 6), 0,
                                 cfg.vocab_size)
    max_len = 64
    ref = np.asarray(generate(iw, prompts, 8, max_len=max_len,
                              quantized_kv=True))
    out, _ = generate_speculative(iw, prompts, 8, draft=iw, k=3,
                                  max_len=max_len, quantized_kv=True)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_speculative_ragged_and_eos():
    """Per-row prompt lengths + an eos that fires mid-stream: rows stop
    independently and finished rows are padded with eos."""
    cfg, iw = setup_model('opt')
    rs = np.random.RandomState(12)
    width = 6
    batch = np.zeros((2, width), np.int32)
    batch[0] = rs.randint(0, cfg.vocab_size, size=(width,))
    batch[1, :3] = rs.randint(0, cfg.vocab_size, size=(3,))
    lengths = jnp.asarray([6, 3])
    max_len = 64
    ref = np.asarray(generate(iw, jnp.asarray(batch), 8, max_len=max_len,
                              lengths=lengths))
    out, _ = generate_speculative(iw, jnp.asarray(batch), 8, draft=iw,
                                  k=3, max_len=max_len, lengths=lengths)
    np.testing.assert_array_equal(np.asarray(out), ref)
    # eos: pick row 0's first generated token as the eos id -> row 0
    # finishes immediately and gets padded with eos
    eos = int(ref[0, width])
    out2, _ = generate_speculative(iw, jnp.asarray(batch), 8, draft=iw,
                                   k=3, max_len=max_len, lengths=lengths,
                                   eos_id=eos)
    o2 = np.asarray(out2)
    assert (o2[0, width:] == eos).all()


def test_ngram_propose_basics():
    stream = np.zeros((2, 16), np.int64)
    stream[0, :9] = [1, 2, 3, 4, 5, 1, 2, 3, 4]   # suffix 2,3,4 seen at 1
    stream[1, :4] = [7, 7, 7, 7]
    lens = np.array([9, 4])
    props = ngram_propose(stream, lens, k=3, max_n=3)
    np.testing.assert_array_equal(props[0], [5, 1, 2])
    np.testing.assert_array_equal(props[1], [7, 7, 7])


def test_speculative_cache_rollback_reuses_slots():
    """After a rejected round the cache length drops; the next append
    overwrites the stale columns (no contamination of later logits)."""
    cfg, iw = setup_model('opt')
    prompts = jax.random.randint(jax.random.PRNGKey(10), (1, 6), 0,
                                 cfg.vocab_size)
    cache = KVCache.create(cfg, 1, 32, dtype=jnp.float32)
    logits, cache = jax.jit(prefill)(iw, prompts, cache)
    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    # write a garbage block, then roll back
    junk = jax.random.randint(jax.random.PRNGKey(11), (1, 4), 0,
                              cfg.vocab_size)
    _, cache = jax.jit(verify_step)(iw, junk, cache)
    cache = dataclasses.replace(cache,
                                length=cache.length - 4)   # full rollback
    # the real decode after rollback must match a never-spoiled cache
    lg_a, _ = jax.jit(decode_step)(iw, tok, cache)
    cache_b = KVCache.create(cfg, 1, 32, dtype=jnp.float32)
    _, cache_b = jax.jit(prefill)(iw, prompts, cache_b)
    lg_b, _ = jax.jit(decode_step)(iw, tok, cache_b)
    np.testing.assert_allclose(np.asarray(lg_a), np.asarray(lg_b),
                               atol=1e-5)


def test_spec_accept_first_token_distribution():
    """The lossless-acceleration guarantee: the FIRST emitted token of a
    round (accepted proposal or rejection resample) must be distributed
    exactly as the warped target p_0 — for a draft-model q and for
    point-mass (n-gram) proposals."""
    from spt_proto_tpu.inference.engine import warp_logits
    from spt_proto_tpu.inference.speculative import spec_accept
    V, K, N = 8, 2, 30000
    rs = np.random.RandomState(3)
    p_logits = jnp.asarray(rs.randn(1, K + 1, V) * 2, jnp.float32)
    q_logits = jnp.asarray(rs.randn(1, K, V) * 2, jnp.float32)
    temp = 0.9

    def one_trial_model(key):
        kq, ka = jax.random.split(key)
        # proposals sampled from the warped draft (the rule's premise)
        props = jax.random.categorical(
            kq, warp_logits(q_logits[:, :K], temperature=temp), axis=-1
            ).astype(jnp.int32)
        n_acc, corr = spec_accept(p_logits, q_logits, props, ka,
                                  temperature=temp)
        return jnp.where(n_acc[0] > 0, props[0, 0], corr[0])

    def one_trial_pointmass(key):
        kq, ka = jax.random.split(key)
        props = jax.random.categorical(
            kq, warp_logits(q_logits[:, :K], temperature=temp), axis=-1
            ).astype(jnp.int32)
        n_acc, corr = spec_accept(p_logits, None, props, ka,
                                  temperature=temp)
        return jnp.where(n_acc[0] > 0, props[0, 0], corr[0])

    target = np.asarray(jax.nn.softmax(
        warp_logits(p_logits[0, 0], temperature=temp)))
    keys = jax.random.split(jax.random.PRNGKey(4), N)
    for trial in (one_trial_model, one_trial_pointmass):
        toks = np.asarray(jax.jit(jax.vmap(trial))(keys))
        emp = np.bincount(toks, minlength=V) / N
        # 4-sigma binomial tolerance per bin
        tol = 4 * np.sqrt(target * (1 - target) / N) + 1e-3
        assert (np.abs(emp - target) < tol).all(), (emp, target)


def test_spec_accept_all_accepted_bonus_distribution():
    """With q == p every proposal is accepted and the correction is the
    BONUS token ~ p_k (the all-accepted branch)."""
    from spt_proto_tpu.inference.engine import warp_logits
    from spt_proto_tpu.inference.speculative import spec_accept
    V, K, N = 8, 2, 30000
    rs = np.random.RandomState(5)
    p_logits = jnp.asarray(rs.randn(1, K + 1, V) * 2, jnp.float32)
    temp = 1.0

    def one_trial(key):
        kq, ka = jax.random.split(key)
        props = jax.random.categorical(
            kq, warp_logits(p_logits[:, :K], temperature=temp), axis=-1
            ).astype(jnp.int32)
        n_acc, corr = spec_accept(p_logits, p_logits[:, :K], props, ka,
                                  temperature=temp)
        return n_acc[0], corr[0]

    keys = jax.random.split(jax.random.PRNGKey(6), N)
    n_acc, corr = jax.jit(jax.vmap(one_trial))(keys)
    assert (np.asarray(n_acc) == K).all()
    target = np.asarray(jax.nn.softmax(
        warp_logits(p_logits[0, K], temperature=temp)))
    emp = np.bincount(np.asarray(corr), minlength=V) / N
    tol = 4 * np.sqrt(target * (1 - target) / N) + 1e-3
    assert (np.abs(emp - target) < tol).all(), (emp, target)


def test_speculative_sampling_e2e():
    """temperature>0 speculative generate: deterministic under a fixed
    rng, respects top-k support, works for draft-model and n-gram."""
    cfg, iw = setup_model('opt')
    _, draft = setup_model('opt', seed=99)
    prompts = jax.random.randint(jax.random.PRNGKey(13), (2, 5), 0,
                                 cfg.vocab_size)
    kw = dict(max_len=64, temperature=0.8, top_k=10,
              rng=jax.random.PRNGKey(7))
    out1, st1 = generate_speculative(iw, prompts, 8, draft=draft, k=3,
                                     **kw)
    out2, _ = generate_speculative(iw, prompts, 8, draft=draft, k=3,
                                   **kw)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3, _ = generate_speculative(iw, prompts, 8, draft=None, k=3, **kw)
    assert out3.shape == out1.shape
    # every generated token must lie in the target's top-10 at its step
    # (weak but cheap support check: vocab is 256, so a uniform-random
    # token would violate it with high probability)
    assert np.asarray(out1)[:, 5:].max() < cfg.vocab_size
